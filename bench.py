"""Benchmark: HistoGAN training throughput at the reference's flagship
config (256px, capacity 16, effective batch 16) on the available
accelerator. Prints ONE JSON line.

Protocol: device-resident synthetic batches (measures the compute path,
not host JPEG decode), 32 timed steps covering the full regularizer
schedule (GP every 4th step, path-length every 32nd —
histoGAN/histoGAN.py:882-883), after warmup of each jit variant.

``vs_baseline``: the reference publishes no numbers (BASELINE.md). The
denominator is the throughput of this framework's round-1 fp32
implementation on TPU v5e-1, recorded below once measured; >1.0 means
faster than round 1.
"""

from __future__ import annotations

import json
import os
import time

import jax

# persistent compile cache: the remote TPU compiler on this tunnel takes
# minutes per program; cached runs start in seconds
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

# Round-1 measured reference point (imgs/sec, v5e-1, fp32, batch 16).
# Established by the first run of this script on real hardware; see
# BASELINE.md "measured" table. The headline metric runs the bf16 policy;
# vs_baseline is the speedup over the round-1 fp32 implementation
# (bf16 r1: ~179 imgs/sec -> vs_baseline ~1.47).
BASELINE_IMGS_PER_SEC = 121.48  # round-1 fp32, TPU v5e-1, 2026-08-16


def measure(precision: str = "bf16", n_steps: int = 32) -> float:
    from histogan_tpu.models import (
        Discriminator, Generator, HistVectorizer, StyleVectorizer,
    )
    from histogan_tpu.optim import diffgrad
    from histogan_tpu.parallel import make_mesh, replicate, shard_batch
    from histogan_tpu.train.state import HistoGANState
    from histogan_tpu.train.steps import Models, make_train_step
    from histogan_tpu.utils.config import HistoGANConfig

    cfg = HistoGANConfig(
        image_size=256, network_capacity=16, batch_size=16,
        gradient_accumulate_every=1, precision=precision,
    )
    mesh = make_mesh()
    S = StyleVectorizer(cfg.latent_dim, cfg.style_depth)
    H = HistVectorizer(cfg.hist_bin, cfg.latent_dim, cfg.style_depth)
    G = Generator(cfg.image_size, cfg.latent_dim, cfg.network_capacity)
    D = Discriminator(cfg.image_size, cfg.network_capacity)
    models = Models(S, H, G, D)

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    nl = cfg.num_layers
    params_g = {
        "S": S.init(ks[0], jnp.zeros((1, cfg.latent_dim)))["params"],
        "H": H.init(ks[1], jnp.zeros((1, 3, cfg.hist_bin, cfg.hist_bin)))["params"],
        "G": G.init(
            ks[2],
            jnp.zeros((1, nl - 2, cfg.latent_dim)),
            jnp.zeros((1, 2, cfg.latent_dim)),
            jnp.zeros((1, cfg.image_size, cfg.image_size, 1)),
        )["params"],
    }
    params_d = D.init(ks[3], jnp.zeros((1, cfg.image_size, cfg.image_size, 3)))["params"]
    g_tx = diffgrad(cfg.learning_rate, 0.5, 0.9)
    d_tx = diffgrad(cfg.learning_rate, 0.5, 0.9)
    state = HistoGANState(
        step=jnp.zeros((), jnp.int32),
        params_g=params_g, params_d=params_d,
        ema=jax.tree_util.tree_map(jnp.copy, params_g),
        opt_g=g_tx.init(params_g), opt_d=d_tx.init(params_d),
        pl_mean=jnp.zeros(()),
    )
    state = replicate(state, mesh)

    a, b = cfg.gradient_accumulate_every, cfg.batch_size
    rng = np.random.default_rng(0)
    batch = {
        "d_images": rng.random((a, b, cfg.image_size, cfg.image_size, 3), np.float32),
        "d_hists": (lambda h: h / h.sum((2, 3, 4), keepdims=True))(
            rng.random((a, b, 3, cfg.hist_bin, cfg.hist_bin), np.float32)
        ),
        "g_hists": (lambda h: h / h.sum((2, 3, 4), keepdims=True))(
            rng.random((a, b, 3, cfg.hist_bin, cfg.hist_bin), np.float32)
        ),
    }
    batch = shard_batch(batch, mesh, batch_axis=1)
    step_fn = make_train_step(models, g_tx, d_tx, cfg)

    def flags(i):
        return dict(apply_gp=i % 4 == 0, apply_pl=i % 32 == 0)

    # warmup: compile all three variants (value fetch actually synchronizes;
    # block_until_ready is a no-op on the tunneled axon platform)
    for i in (0, 1, 4):
        state, metrics = step_fn(state, batch, jax.random.fold_in(key, i), **flags(i))
        float(metrics["d_loss"])

    t0 = time.perf_counter()
    for i in range(n_steps):
        state, metrics = step_fn(state, batch, jax.random.fold_in(key, 100 + i), **flags(i))
    float(metrics["d_loss"])  # one sync at the end of the dependent chain
    dt = time.perf_counter() - t0
    return n_steps * a * b / dt


def main():
    import os

    precision = os.environ.get("BENCH_PRECISION", "bf16")
    imgs_per_sec = measure(precision)
    vs = (imgs_per_sec / BASELINE_IMGS_PER_SEC) if BASELINE_IMGS_PER_SEC else 1.0
    print(json.dumps({
        "metric": f"histogan_train_imgs_per_sec_256px_cap16_{precision}",
        "value": round(imgs_per_sec, 2),
        "unit": "imgs/sec",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
