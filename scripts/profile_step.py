"""Ablation profiling of the training step on real hardware.

Times isolated sub-computations (chained dispatches, one sync fetch — see
BASELINE.md timing note) to attribute the step budget: G fwd, G fwd+bwd,
D fwd, D fwd+bwd, GP step, histogram loss fwd+bwd, optimizer update.

Usage: python scripts/profile_step.py [bf16|fp32]
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
    print(f"{label:<40} {dt * 1e3:8.2f} ms", flush=True)
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
                         gradient_accumulate_every=1, precision=precision)
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

    # ---- full-step ablation: where does the 256px step budget go?
    # Times the real make_train_step under flag/config variants; the
    # difference between variants attributes the cost of each term.
    from histogan_tpu.parallel import make_mesh, replicate, shard_batch
    from histogan_tpu.train.state import HistoGANState
    from histogan_tpu.train.steps import Models, make_train_step
    from histogan_tpu.models import StyleVectorizer

    S = StyleVectorizer(cfg.latent_dim, cfg.style_depth)
    H = HistVectorizer(cfg.hist_bin, cfg.latent_dim, cfg.style_depth)
    models = Models(S, H, G, D)
    mesh = make_mesh()
    sp = S.init(ks[7], jnp.zeros((1, cfg.latent_dim)))["params"]
    hp = H.init(ks[7], jnp.zeros((1, 3, cfg.hist_bin, cfg.hist_bin)))["params"]
    params_g = {"S": sp, "H": hp, "G": gp32}
    g_tx = diffgrad(2e-4, 0.5, 0.9)
    d_tx = diffgrad(2e-4, 0.5, 0.9)

    rng = np.random.default_rng(0)
    a = 1
    norm = lambda x: x / x.sum((2, 3, 4), keepdims=True)
    batch = shard_batch({
        "d_images": rng.random((a, b, cfg.image_size, cfg.image_size, 3), np.float32),
        "d_hists": norm(rng.random((a, b, 3, cfg.hist_bin, cfg.hist_bin), np.float32)),
        "g_hists": norm(rng.random((a, b, 3, cfg.hist_bin, cfg.hist_bin), np.float32)),
    }, mesh, batch_axis=1)

    def time_step(cfg_v, label, apply_gp, apply_pl, n=10):
        def fresh_state():
            # device_get first: the step donates its state buffers and
            # replicate() may alias already-placed arrays across calls
            return replicate(jax.device_get(HistoGANState(
                step=jnp.zeros((), jnp.int32), params_g=params_g,
                params_d=dp32, ema=jax.tree_util.tree_map(jnp.copy, params_g),
                opt_g=g_tx.init(params_g), opt_d=d_tx.init(dp32),
                pl_mean=jnp.zeros(()),
            )), mesh)

        state = fresh_state()
        step = make_train_step(models, g_tx, d_tx, cfg_v)
        # XLA's own FLOP count of this exact program -> honest MFU
        # (BASELINE.md: vs the chip's measured 145.8 TF/s sustained matmul)
        try:
            lowered = step.lower(fresh_state(), batch, ks[6],
                                 apply_gp=apply_gp, apply_pl=apply_pl)
            cost = lowered.compile().cost_analysis()
            cost = cost[0] if isinstance(cost, (list, tuple)) else cost
            tflops = float(cost.get("flops", 0.0)) / 1e12
        except Exception as e:  # noqa: BLE001
            print(f"  (cost_analysis unavailable: {e})", flush=True)
            tflops = 0.0
        state, m = step(state, batch, ks[6], apply_gp=apply_gp, apply_pl=apply_pl)
        float(m["d_loss"])
        t0 = time.perf_counter()
        for i in range(n):
            state, m = step(state, batch, jax.random.fold_in(key, i),
                            apply_gp=apply_gp, apply_pl=apply_pl)
        float(m["d_loss"])
        dt_s = (time.perf_counter() - t0) / n
        eff = tflops / dt_s if tflops else 0.0
        print(f"{label:<40} {dt_s * 1e3:8.2f} ms  "
              f"({b / dt_s:7.1f} imgs/s)  "
              f"[{tflops * 1e3:7.1f} GFLOP -> {eff:6.1f} TF/s]", flush=True)
        return dt_s

    print("\n---- full-step ablation (256px cap16 batch16) ----", flush=True)
    time_step(cfg, "step: plain (no gp, no pl)", False, False)
    time_step(cfg, "step: +gp", True, False)
    time_step(cfg, "step: +pl", False, True)
    time_step(cfg, "step: +gp +pl", True, True)

    # attribution of the merged fake+real D forward (steps.MERGE_D_FORWARD)
    from histogan_tpu.train import steps as steps_mod

    steps_mod.MERGE_D_FORWARD = False
    try:
        time_step(cfg, "step: plain, UNMERGED d fwd", False, False)
    finally:
        steps_mod.MERGE_D_FORWARD = True


if __name__ == "__main__":
    main()
