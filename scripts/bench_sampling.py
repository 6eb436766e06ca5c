"""Sampling (inference) throughput vs batch at 256px capacity 16 bf16.

The r1 record was 2655 imgs/sec at batch 64 (BASELINE.md). The
sampling path (histoGAN/histoGAN.py:1064-1091: S -> truncation -> H ->
tile-doubled hist rows -> chunked G) is MXU/bytes-light compared to
training, so larger chunks may amortize dispatch + per-batch overheads
further; this sweeps the chunk size. Timing is a steady-state window
over repeated full-pipeline calls with ONE value fetch at the end of
the dependency chain (block_until_ready is a no-op on this platform).

Usage: python -u scripts/bench_sampling.py [batches...=64 128 256]
One TPU client; run in background, never kill.
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def main():
    batches = [int(a) for a in sys.argv[1:]] or [64, 128, 256]
    from histogan_tpu.train import Trainer

    rng = np.random.default_rng(0)
    for batch in batches:
        t = Trainer(
            name=f"samp{batch}", results_dir="/tmp/samp/results",
            models_dir="/tmp/samp/models", image_size=256,
            network_capacity=16, batch_size=batch, precision="bf16",
            seed=0,
        )
        t.init_GAN()
        params = t.state.ema
        h = rng.random((batch, 3, t.cfg.hist_bin, t.cfg.hist_bin),
                       dtype=np.float64).astype(np.float32)
        h = jnp.asarray(h / h.sum(axis=(1, 2, 3), keepdims=True))
        style = jnp.asarray(rng.standard_normal(
            (batch, t.cfg.latent_dim)).astype(np.float32))
        noi = jnp.asarray(rng.random(
            (batch, 256, 256, 1), dtype=np.float64).astype(np.float32))

        # one eager call first: resolves self.av on the host (it must
        # not become a tracer), then jit the WHOLE pipeline — timing
        # the eager path instead measures per-op tunnel dispatch
        # latency (~35 ms/op here), not the chip (measured: 248
        # imgs/sec eager vs thousands jitted at b64)
        imgs = t.generate_truncated(params, h, style, noi)
        float(jnp.sum(imgs[0].astype(jnp.float32)))
        fn = jax.jit(lambda p, hh, ss, nn: t.generate_truncated(p, hh, ss, nn))
        imgs = fn(params, h, style, noi)  # compile
        float(jnp.sum(imgs[0].astype(jnp.float32)))
        reps = max(8, 4096 // batch)
        t0 = time.perf_counter()
        for _ in range(reps):
            imgs = fn(params, h, style, noi)
        float(jnp.sum(imgs[0].astype(jnp.float32)))
        dt = time.perf_counter() - t0
        rate = reps * batch / dt
        print(f"batch {batch:4d}: {rate:8.1f} imgs/sec "
              f"({dt / reps * 1e3:.2f} ms/batch, {reps} reps)", flush=True)
        # free this config's params/buffers before the next batch size —
        # three live trainer states at once exhaust the 16 GB HBM
        del t, params, h, style, noi, imgs
        fn = None
        import gc

        gc.collect()


if __name__ == "__main__":
    main()
