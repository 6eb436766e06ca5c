"""Bytes-based roofline of the train step (VERDICT r2, next-round #1).

For each (batch, flags) variant of the REAL jitted train step this
prints XLA's own cost model numbers — FLOPs AND bytes accessed — next
to the measured wall time, so the HBM-bound claim is measured in bytes,
not inferred from FLOPs:

    min_time_flops = flops / 145.8 TF/s   (chip's measured sustained matmul)
    min_time_bytes = bytes / 819 GB/s     (v5e HBM bandwidth)

Whichever bound is larger is the roofline; measured/bound is the
efficiency against it. Also probes the batch-size knee (16/32/64/128)
and the optimizer-update traffic in isolation (a VERDICT candidate).

Usage: python -u scripts/roofline.py   (TPU; ~minutes of cold compiles
for the new batch-64/128 shapes, cached afterwards)
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

SUSTAINED_TFLOPS = 145.8  # chip sanity row, BASELINE.md
HBM_GBPS = 819.0          # v5e HBM spec


def get_cost(compiled):
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops = float(cost.get("flops", 0.0))
    nbytes = float(cost.get("bytes accessed", 0.0))
    return flops, nbytes


def build(batch_size, precision="bf16"):
    from histogan_tpu.models import (
        Discriminator, Generator, HistVectorizer, StyleVectorizer,
    )
    from histogan_tpu.optim import diffgrad
    from histogan_tpu.parallel import make_mesh, replicate, shard_batch
    from histogan_tpu.train.state import HistoGANState
    from histogan_tpu.train.steps import Models, make_train_step
    from histogan_tpu.utils.config import HistoGANConfig

    cfg = HistoGANConfig(
        image_size=256, network_capacity=16, batch_size=batch_size,
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

    def fresh_state():
        return replicate(HistoGANState(
            step=jnp.zeros((), jnp.int32),
            params_g=jax.device_get(params_g), params_d=jax.device_get(params_d),
            ema=jax.tree_util.tree_map(np.copy, jax.device_get(params_g)),
            opt_g=jax.device_get(g_tx.init(params_g)),
            opt_d=jax.device_get(d_tx.init(params_d)),
            pl_mean=jnp.zeros(()),
        ), mesh)

    a, b = 1, batch_size
    rng = np.random.default_rng(0)
    norm = lambda h: h / h.sum((2, 3, 4), keepdims=True)
    batch = shard_batch({
        "d_images": rng.random((a, b, 256, 256, 3), np.float32),
        "d_hists": norm(rng.random((a, b, 3, cfg.hist_bin, cfg.hist_bin), np.float32)),
        "g_hists": norm(rng.random((a, b, 3, cfg.hist_bin, cfg.hist_bin), np.float32)),
    }, mesh, batch_axis=1)
    step = make_train_step(models, g_tx, d_tx, cfg)
    return cfg, step, fresh_state, batch, (params_g, g_tx)


def probe(step, fresh_state, batch, b, label, apply_gp, apply_pl, n=10):
    key = jax.random.PRNGKey(7)
    try:
        lowered = step.lower(fresh_state(), batch, key,
                             apply_gp=apply_gp, apply_pl=apply_pl)
        flops, nbytes = get_cost(lowered.compile())
    except Exception as e:  # noqa: BLE001
        print(f"{label:<34} FAILED: {type(e).__name__}: {e}"[:180], flush=True)
        return None
    state = fresh_state()
    try:
        state, m = step(state, batch, key, apply_gp=apply_gp, apply_pl=apply_pl)
        float(m["d_loss"])
        t0 = time.perf_counter()
        for i in range(n):
            state, m = step(state, batch, jax.random.fold_in(key, i),
                            apply_gp=apply_gp, apply_pl=apply_pl)
        float(m["d_loss"])
        dt = (time.perf_counter() - t0) / n
    except Exception as e:  # noqa: BLE001
        print(f"{label:<34} RUN FAILED: {type(e).__name__}: {e}"[:180], flush=True)
        return None
    t_flops = flops / (SUSTAINED_TFLOPS * 1e12)
    t_bytes = nbytes / (HBM_GBPS * 1e9)
    bound = "HBM" if t_bytes > t_flops else "MXU"
    roof = max(t_bytes, t_flops)
    print(f"{label:<34} {dt*1e3:8.2f} ms  {b/dt:7.1f} imgs/s  "
          f"{flops/1e9:8.1f} GF  {nbytes/2**30:6.2f} GiB  "
          f"minF={t_flops*1e3:6.2f}ms minB={t_bytes*1e3:6.2f}ms  "
          f"bound={bound} eff={roof/dt*100:5.1f}%", flush=True)
    return dict(ms=dt * 1e3, imgs_s=b / dt, flops=flops, nbytes=nbytes)


def main():
    print("devices:", jax.devices(), flush=True)

    # ---- flag-variant bytes table at the flagship batch 16 ------------
    print("\n==== flag variants, batch 16 (bytes attribution) ====", flush=True)
    cfg, step, fresh, batch, (params_g, g_tx) = build(16)
    probe(step, fresh, batch, 16, "b16 plain", False, False)
    probe(step, fresh, batch, 16, "b16 +gp", True, False)
    probe(step, fresh, batch, 16, "b16 +pl", False, True)

    # ---- optimizer update in isolation (VERDICT candidate) ------------
    print("\n==== DiffGrad G update in isolation ====", flush=True)
    grads = jax.tree_util.tree_map(jnp.ones_like, params_g)
    opt = g_tx.init(params_g)
    upd = jax.jit(lambda g, o, p: g_tx.update(g, o, p))
    lowered = upd.lower(grads, opt, params_g)
    flops, nbytes = get_cost(lowered.compile())
    out = upd(grads, opt, params_g)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(10):
        out = upd(grads, opt, params_g)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    dt = (time.perf_counter() - t0) / 10
    print(f"diffgrad update: {dt*1e3:.2f} ms, {flops/1e9:.2f} GF, "
          f"{nbytes/2**30:.3f} GiB accessed "
          f"(minB={nbytes/(HBM_GBPS*1e9)*1e3:.2f} ms)", flush=True)

    # ---- batch knee: plain step at 32/64/128 --------------------------
    for b in (32, 64, 128):
        print(f"\n==== batch {b} ====", flush=True)
        try:
            cfg, step, fresh, batch, _ = build(b)
        except Exception as e:  # noqa: BLE001
            print(f"build({b}) failed: {e}", flush=True)
            continue
        r = probe(step, fresh, batch, b, f"b{b} plain", False, False)
        if r is None:
            continue
        probe(step, fresh, batch, b, f"b{b} +gp", True, False)
        probe(step, fresh, batch, b, f"b{b} +pl", False, True)

    # ---- full-schedule throughput at the knee candidates --------------
    print("\n==== full-schedule throughput (gp/4, pl/32, ema/10) ====",
          flush=True)
    for b in (32, 64, 128):
        try:
            cfg, step, fresh, batch, _ = build(b)
            state = fresh()
            key = jax.random.PRNGKey(0)
            flags = lambda i: dict(apply_gp=i % 4 == 0, apply_pl=i % 32 == 0,
                                   apply_ema=i % 10 == 0)
            for i in (0, 1, 4, 10):
                state, m = step(state, batch, jax.random.fold_in(key, i), **flags(i))
                float(m["d_loss"])
            n = 32
            t0 = time.perf_counter()
            for i in range(n):
                state, m = step(state, batch, jax.random.fold_in(key, 100 + i),
                                **flags(i))
            float(m["d_loss"])
            dt = time.perf_counter() - t0
            print(f"b{b} full schedule: {n*b/dt:7.1f} imgs/s "
                  f"({dt/n*1e3:.1f} ms/step)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"b{b} full schedule FAILED: {type(e).__name__}: {e}"[:180],
                  flush=True)


if __name__ == "__main__":
    main()
