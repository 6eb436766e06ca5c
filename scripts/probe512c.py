"""Probe round 3: run bench.measure's exact 512/cap16/b2 split path with
full traceback + per-phase sync, to find where the bench run OOMs while
the identical probe512b sequence succeeds (suspects: the plain+ema
warmup variant's program, or the unsynced 16-step timed loop queueing
buffers over the tunnel).

Run: `python -u scripts/probe512c.py [sync|nosync]`
"""
from __future__ import annotations

import sys
import time
import traceback

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "sync"
    # replicate bench.measure() exactly, but instrument each warmup/timed step
    from histogan_tpu.models import (
        Discriminator, Generator, HistVectorizer, StyleVectorizer,
    )
    from histogan_tpu.optim import diffgrad
    from histogan_tpu.parallel import make_mesh, replicate, shard_batch
    from histogan_tpu.train.state import HistoGANState
    from histogan_tpu.train.steps import Models, make_train_step
    from histogan_tpu.utils.config import HistoGANConfig
    import jax.numpy as jnp

    cfg = HistoGANConfig(image_size=512, network_capacity=16,
                         batch_size=2, gradient_accumulate_every=1,
                         precision="bf16")
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
    params_d = D.init(
        ks[3], jnp.zeros((1, cfg.image_size, cfg.image_size, 3)))["params"]
    g_tx = diffgrad(cfg.learning_rate, 0.5, 0.9, state_dtype=jnp.bfloat16)
    d_tx = diffgrad(cfg.learning_rate, 0.5, 0.9, state_dtype=jnp.bfloat16)
    state = HistoGANState(
        step=jnp.zeros((), jnp.int32),
        params_g=params_g, params_d=params_d,
        ema=jax.tree_util.tree_map(jnp.copy, params_g),
        opt_g=g_tx.init(params_g), opt_d=d_tx.init(params_d),
        pl_mean=jnp.zeros(()),
    )
    state = replicate(state, mesh)

    a, b = 1, cfg.batch_size
    rng = np.random.default_rng(0)
    norm = lambda h: h / h.sum((2, 3, 4), keepdims=True)
    batch = shard_batch({
        "d_images": rng.random((a, b, 512, 512, 3), np.float32),
        "d_hists": norm(rng.random((a, b, 3, cfg.hist_bin, cfg.hist_bin),
                                   np.float32)),
        "g_hists": norm(rng.random((a, b, 3, cfg.hist_bin, cfg.hist_bin),
                                   np.float32)),
    }, mesh, batch_axis=1)
    step_fn = make_train_step(models, g_tx, d_tx, cfg, split=True)

    def flags(i):
        return dict(apply_gp=i % 4 == 0, apply_pl=i % 32 == 0,
                    apply_ema=i % 10 == 0)

    try:
        for i in (0, 1, 4, 10, 20):
            t0 = time.time()
            state, metrics = step_fn(
                state, batch, jax.random.fold_in(key, i), **flags(i))
            v = float(metrics["d_loss"])
            print(f"warm {i} {flags(i)}: OK {time.time()-t0:.1f}s "
                  f"d_loss={v:.4g}", flush=True)
        t0 = time.perf_counter()
        for i in range(16):
            state, metrics = step_fn(
                state, batch, jax.random.fold_in(key, 100 + i), **flags(i))
            if mode == "sync":
                float(metrics["d_loss"])
                print(f"timed {i}: ok", flush=True)
        float(metrics["d_loss"])
        dt = time.perf_counter() - t0
        print(f"RESULT imgs/sec={16 * b / dt:.2f} mode={mode}", flush=True)
    except Exception:
        traceback.print_exc()
        print(f"FAILED at phase above (mode={mode})", flush=True)


if __name__ == "__main__":
    main()
