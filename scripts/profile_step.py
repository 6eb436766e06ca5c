"""Ablation profiling of the training step on real hardware.

Times isolated sub-computations (chained dispatches, one sync fetch — see
BASELINE.md timing note) to attribute the step budget: G fwd, G fwd+bwd,
D fwd, D fwd+bwd, GP step, histogram loss fwd+bwd, optimizer update.

Usage: python scripts/profile_step.py [bf16|fp32]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=10, label=""):
    out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    # chained timing with single fetch (tunnel: block_until_ready no-op)
    r = fn(*args)
    s = float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    s = float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    dt = (time.perf_counter() - t0) / n
    print(f"{label::<40} {dt * 1e3:8.2f} ms")
    return dt


def main():
    precision = sys.argv[1] if len(sys.argv) > 1 else "bf16"
    from histogan_tpu.models import (
        Discriminator, Generator, HistVectorizer, StyleVectorizer,
    )
    from histogan_tpu.ops import losses
    from histogan_tpu.ops.histogram import histogram_feature
    from histogan_tpu.optim import diffgrad
    from histogan_tpu.utils.config import HistoGANConfig

    cfg = HistoGANConfig(image_size=256, network_capacity=16, batch_size=16,
                         precision=precision)
    dt = jnp.bfloat16 if precision == "bf16" else jnp.float32
    b = cfg.batch_size
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)

    G = Generator(cfg.image_size, cfg.latent_dim, cfg.network_capacity)
    D = Discriminator(cfg.image_size, cfg.network_capacity)
    nl = cfg.num_layers
    w = jax.random.normal(ks[0], (b, nl - 2, cfg.latent_dim), dt)
    h = jax.random.normal(ks[1], (b, 2, cfg.latent_dim), dt)
    noise = jax.random.uniform(ks[2], (b, cfg.image_size, cfg.image_size, 1), dt)
    gp32 = G.init(ks[3], w[:1].astype(jnp.float32), h[:1].astype(jnp.float32),
                  noise[:1].astype(jnp.float32))["params"]
    gp = jax.tree_util.tree_map(lambda x: x.astype(dt), gp32)
    img = jax.random.uniform(ks[4], (b, cfg.image_size, cfg.image_size, 3), dt)
    dp32 = D.init(ks[5], img.astype(jnp.float32))["params"]
    dp = jax.tree_util.tree_map(lambda x: x.astype(dt), dp32)
    hist = jnp.full((b, 3, 64, 64), 1 / (3 * 64 * 64), jnp.float32)

    g_fwd = jax.jit(lambda p, w, h, n: G.apply({"params": p}, w, h, n))
    timeit(g_fwd, gp, w, h, noise, label=f"G fwd ({precision})")

    g_loss = jax.jit(jax.grad(
        lambda p: jnp.mean(G.apply({"params": p}, w, h, noise).astype(jnp.float32))
    ))
    timeit(g_loss, gp, label=f"G fwd+bwd ({precision})")

    d_fwd = jax.jit(lambda p, x: D.apply({"params": p}, x)[0])
    timeit(d_fwd, dp, img, label=f"D fwd ({precision})")

    d_loss = jax.jit(jax.grad(
        lambda p: jnp.mean(D.apply({"params": p}, img)[0].astype(jnp.float32))
    ))
    timeit(d_loss, dp, label=f"D fwd+bwd ({precision})")

    gp_fn = jax.jit(jax.grad(lambda p: losses.gradient_penalty(
        lambda x: D.apply({"params": p}, x)[0].astype(jnp.float32), img)))
    timeit(gp_fn, dp, label=f"GP grad (2nd order, {precision})")

    hist_fn = jax.jit(jax.grad(lambda x: losses.hellinger_histogram_loss(
        hist, histogram_feature(jax.nn.relu(x.astype(jnp.float32)),
                                resizing="sampling"))))
    timeit(hist_fn, img, label="hist loss fwd+bwd (sampling)")

    hist_fn2 = jax.jit(jax.grad(lambda x: losses.hellinger_histogram_loss(
        hist, histogram_feature(jax.nn.relu(x.astype(jnp.float32)),
                                resizing="interpolation"))))
    timeit(hist_fn2, img, label="hist loss fwd+bwd (interpolation)")

    tx = diffgrad(2e-4, 0.5, 0.9)
    opt = tx.init(gp32)
    grads = jax.tree_util.tree_map(jnp.ones_like, gp32)
    upd = jax.jit(lambda g, o, p: tx.update(g, o, p))
    timeit(upd, grads, opt, gp32, label="DiffGrad update (G params)")

    # bilinear upsample cost check (7 upsamples per G fwd)
    x128 = jax.random.uniform(ks[6], (b, 128, 128, 64), dt)
    up = jax.jit(lambda x: jax.image.resize(
        x, (b, 256, 256, 64), "bilinear", antialias=False))
    timeit(up, x128, label=f"bilinear up 128->256 c64 ({precision})")


if __name__ == "__main__":
    main()
