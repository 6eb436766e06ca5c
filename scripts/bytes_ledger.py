"""Per-piece bytes/FLOP ledger of the train step (VERDICT r3 #1).

Lowers each sub-computation of the flagship step (256px cap16 bf16) on
the real backend and prints XLA's flops + bytes accessed next to the
measured time, attributing the step's ~50 GiB/step HBM traffic
(scripts/roofline.py) piece by piece. Also lowers the FULL step at tiny
batches (2, 4) to pin the batch-independent traffic by linear fit.

Usage: python -u scripts/bytes_ledger.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

GIB = float(2 ** 30)


def cost_of(compiled):
    c = compiled.cost_analysis()
    c = c[0] if isinstance(c, (list, tuple)) else c
    return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))


def row(label, jitted, *args, measure=True):
    """ONE compile per row: cost AND timing come from the same
    AOT-compiled executable (the jit call path does not share the
    persistent-cache entry on this platform — r3 lesson)."""
    try:
        compiled = jitted.lower(*args).compile()
        flops, nbytes = cost_of(compiled)
        if measure:
            out = compiled(*args)
            float(jnp.sum(jax.tree_util.tree_leaves(out)[0])
                  .astype(jnp.float32))
            t0 = time.perf_counter()
            for _ in range(8):
                out = compiled(*args)
            float(jnp.sum(jax.tree_util.tree_leaves(out)[0])
                  .astype(jnp.float32))
            ms = (time.perf_counter() - t0) / 8 * 1e3
        else:
            ms = float("nan")
        print(f"{label:<38} {ms:8.2f} ms  {flops/1e9:9.1f} GF  "
              f"{nbytes/GIB:7.3f} GiB", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{label:<38} FAILED {type(e).__name__}: {e}"[:160], flush=True)


def main():
    from histogan_tpu.models import (
        Discriminator, Generator, HistVectorizer, StyleVectorizer,
    )
    from histogan_tpu.ops import losses
    from histogan_tpu.ops.histogram import histogram_feature
    from histogan_tpu.optim import diffgrad
    from histogan_tpu.train.steps import cast_tree
    from histogan_tpu.utils.config import HistoGANConfig

    print("devices:", jax.devices(), flush=True)
    cfg = HistoGANConfig(image_size=256, network_capacity=16, batch_size=16,
                         gradient_accumulate_every=1, precision="bf16")
    b = 16
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)

    S = StyleVectorizer(cfg.latent_dim, cfg.style_depth)
    H = HistVectorizer(cfg.hist_bin, cfg.latent_dim, cfg.style_depth)
    G = Generator(cfg.image_size, cfg.latent_dim, cfg.network_capacity)
    D = Discriminator(cfg.image_size, cfg.network_capacity)
    nl = cfg.num_layers

    w = jax.random.normal(ks[0], (b, nl - 2, cfg.latent_dim), dt)
    h2 = jax.random.normal(ks[1], (b, 2, cfg.latent_dim), dt)
    noise = jax.random.uniform(ks[2], (b, 256, 256, 1), dt)
    gp32 = G.init(ks[3], w[:1].astype(jnp.float32), h2[:1].astype(jnp.float32),
                  noise[:1].astype(jnp.float32))["params"]
    img = jax.random.uniform(ks[4], (b, 256, 256, 3), dt)
    dp32 = D.init(ks[5], img.astype(jnp.float32))["params"]
    hist = jnp.full((b, 3, 64, 64), 1 / (3 * 64 * 64), jnp.float32)

    print("\n---- forward/backward pieces (bf16, b16) ----", flush=True)
    gp = cast_tree(gp32, dt)
    dp = cast_tree(dp32, dt)
    row("G fwd", jax.jit(lambda p: G.apply({"params": p}, w, h2, noise)), gp)
    row("G fwd+bwd (wrt params)", jax.jit(jax.grad(
        lambda p: jnp.mean(G.apply({"params": p}, w, h2, noise)
                           .astype(jnp.float32)))), gp32)
    row("D fwd (b16)", jax.jit(lambda p, x: D.apply({"params": p}, x)[0]),
        dp, img)
    img2 = jnp.concatenate([img, img], axis=0)
    row("D fwd (merged b32)", jax.jit(lambda p, x: D.apply({"params": p}, x)[0]),
        dp, img2)
    row("D fwd+bwd (wrt params)", jax.jit(jax.grad(
        lambda p: jnp.mean(D.apply({"params": p}, img)[0]
                           .astype(jnp.float32)))), dp32)
    row("GP step (2nd order)", jax.jit(jax.grad(
        lambda p: losses.gradient_penalty(
            lambda x: D.apply({"params": p}, x)[0].astype(jnp.float32),
            img))), dp32)
    row("hist loss fwd+bwd", jax.jit(jax.grad(
        lambda x: losses.hellinger_histogram_loss(
            hist, histogram_feature(jax.nn.relu(x.astype(jnp.float32)),
                                    resizing=cfg.hist_resizing)))), img)
    row("cast params_g fp32->bf16",
        jax.jit(lambda p: cast_tree(p, dt)), gp32)

    print("\n---- optimizer / moving-average pieces ----", flush=True)
    params_g = {"S": S.init(ks[6], jnp.zeros((1, cfg.latent_dim)))["params"],
                "H": H.init(ks[6], jnp.zeros((1, 3, 64, 64)))["params"],
                "G": gp32}
    tx = diffgrad(2e-4, 0.5, 0.9)
    opt = tx.init(params_g)
    grads = jax.tree_util.tree_map(jnp.ones_like, params_g)
    row("DiffGrad update (params_g 99.8M)",
        jax.jit(lambda g, o: tx.update(g, o, None)), grads, opt)
    row("DiffGrad update (params_d 90.9M)",
        jax.jit(lambda g, o: diffgrad(2e-4, 0.5, 0.9).update(g, o, None)),
        jax.tree_util.tree_map(jnp.ones_like, dp32),
        diffgrad(2e-4, 0.5, 0.9).init(dp32))
    row("param add (params_g)",
        jax.jit(lambda p, u: jax.tree_util.tree_map(jnp.add, p, u)),
        params_g, grads)
    row("EMA pass (params_g)",
        jax.jit(lambda e, p: jax.tree_util.tree_map(
            lambda a, c: a * 0.995 + 0.005 * c, e, p)), params_g, grads)
    row("grad-accum plumbing (zeros+add+div)",
        jax.jit(lambda g: jax.tree_util.tree_map(
            lambda z, x: (z + x) / 1.0,
            jax.tree_util.tree_map(jnp.zeros_like, g), g)), grads)

    print("\n---- full step at tiny batches (fixed-traffic fit) ----",
          flush=True)
    from histogan_tpu.parallel import make_mesh, replicate, shard_batch
    from histogan_tpu.train.state import HistoGANState
    from histogan_tpu.train.steps import Models, make_train_step

    models = Models(S, H, G, D)
    mesh = make_mesh()
    d_tx = diffgrad(2e-4, 0.5, 0.9)

    for bs in (2, 4):
        cfg_b = HistoGANConfig(image_size=256, network_capacity=16,
                               batch_size=bs, gradient_accumulate_every=1,
                               precision="bf16")
        rng = np.random.default_rng(0)
        norm = lambda x: x / x.sum((2, 3, 4), keepdims=True)
        batch = shard_batch({
            "d_images": rng.random((1, bs, 256, 256, 3), np.float32),
            "d_hists": norm(rng.random((1, bs, 3, 64, 64), np.float32)),
            "g_hists": norm(rng.random((1, bs, 3, 64, 64), np.float32)),
        }, mesh, batch_axis=1)
        state = replicate(HistoGANState(
            step=jnp.zeros((), jnp.int32), params_g=params_g, params_d=dp32,
            ema=jax.tree_util.tree_map(jnp.copy, params_g),
            opt_g=tx.init(params_g), opt_d=d_tx.init(dp32),
            pl_mean=jnp.zeros(()),
        ), mesh)
        step = make_train_step(models, tx, d_tx, cfg_b)
        try:
            flops, nbytes = cost_of(step.lower(
                state, batch, ks[7], apply_gp=False, apply_pl=False
            ).compile())
            print(f"plain step b{bs}: {flops/1e9:9.1f} GF  "
                  f"{nbytes/GIB:7.3f} GiB", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"plain step b{bs} FAILED: {e}"[:160], flush=True)


if __name__ == "__main__":
    main()
