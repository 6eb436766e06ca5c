"""512px capacity-16 train-step measurement with knee.py's memory
hygiene (one AOT compile per variant, state threaded via donation).

Why this exists (r3 probe scripts, removed r5 — findings recorded in
docs/DESIGN.md + BASELINE.md 512px notes): the 512/cap16 model is
680.5M params; with `opt_state_dtype='bf16'` its training state (~8 GB)
fits one v5e chip at batch 2 and every step variant compiles AND runs —
but bench.py's JIT-path protocol OOMs from HBM fragmentation after
cycling 5 warmup variants of an 8 GB donated state. AOT per-variant
timing (knee.py's protocol, used for the b64/b128 rows) sidesteps that:
one executable at a time, explicit deletes between variants.

Usage: python -u scripts/knee512.py [batch] [precision]
       (default: 2 bf16; a second fp32 numeric-sanity section runs a
        short plain-step loop and reports loss finiteness)
"""

import gc
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

HBM_GBPS = 819.0
GIB = float(2 ** 30)


def build(batch_size, precision, split, remat=False, ema_dtype=None):
    from histogan_tpu.models import (
        Discriminator, Generator, HistVectorizer, StyleVectorizer,
    )
    from histogan_tpu.optim import diffgrad
    from histogan_tpu.parallel import make_mesh, replicate, shard_batch
    from histogan_tpu.train.state import HistoGANState
    from histogan_tpu.train.steps import Models, make_train_step
    from histogan_tpu.utils.config import HistoGANConfig

    cfg = HistoGANConfig(image_size=512, network_capacity=16,
                         batch_size=batch_size, gradient_accumulate_every=1,
                         precision=precision, remat=remat)
    mesh = make_mesh()
    S = StyleVectorizer(cfg.latent_dim, cfg.style_depth)
    H = HistVectorizer(cfg.hist_bin, cfg.latent_dim, cfg.style_depth)
    G = Generator(cfg.image_size, cfg.latent_dim, cfg.network_capacity,
                  remat=cfg.remat)
    D = Discriminator(cfg.image_size, cfg.network_capacity, remat=cfg.remat)
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
    state = replicate(HistoGANState(
        step=jnp.zeros((), jnp.int32), params_g=params_g, params_d=params_d,
        ema=jax.tree_util.tree_map(
            (lambda x: x.astype(jnp.bfloat16)) if ema_dtype == 'bf16'
            else jnp.copy, params_g),
        opt_g=g_tx.init(params_g), opt_d=d_tx.init(params_d),
        pl_mean=jnp.zeros(()),
    ), mesh)
    rng = np.random.default_rng(0)
    norm = lambda h: h / h.sum((2, 3, 4), keepdims=True)
    batch = shard_batch({
        "d_images": rng.random((1, batch_size, 512, 512, 3), np.float32),
        "d_hists": norm(rng.random((1, batch_size, 3, 64, 64), np.float32)),
        "g_hists": norm(rng.random((1, batch_size, 3, 64, 64), np.float32)),
    }, mesh, batch_axis=1)
    step = make_train_step(models, g_tx, d_tx, cfg, split=split)
    return step, state, batch, key


def aot_section(batch_size, precision, remat=False, ema_dtype=None):
    """Fused-step AOT timing, one variant at a time."""
    step, state, batch, key = build(batch_size, precision, split=False,
                                    remat=remat, ema_dtype=ema_dtype)
    ks = jax.random.fold_in(key, 4)
    results = {}
    for label, gp, pl in (("plain", False, False), ("+gp", True, False),
                          ("+pl", False, True), ("+gp+pl", True, True)):
        try:
            t0 = time.time()
            lowered = step.lower(state, batch, ks, apply_gp=gp, apply_pl=pl,
                                 apply_ema=(label == "plain"))
            compiled = lowered.compile()
            c = compiled.cost_analysis()
            c = c[0] if isinstance(c, (list, tuple)) else c
            flops = float(c.get("flops", 0))
            nbytes = float(c.get("bytes accessed", 0))
            state, m = compiled(state, batch, ks)
            float(m["d_loss"])
            t0 = time.perf_counter()
            for i in range(6):
                state, m = compiled(state, batch, jax.random.fold_in(key, i))
            dl = float(m["d_loss"])
            dt = (time.perf_counter() - t0) / 6
            t_b = nbytes / (HBM_GBPS * 1e9)
            print(f"512 b{batch_size} {precision} {label:<7} {dt*1e3:8.2f} ms  "
                  f"{batch_size/dt:6.2f} imgs/s  {flops/1e9:9.1f} GF  "
                  f"{nbytes/GIB:6.2f} GiB  minB={t_b*1e3:7.2f}ms  "
                  f"eff={t_b/dt*100:5.1f}%  d_loss={dl:.4g}", flush=True)
            results[label] = dt
            del compiled, lowered
        except Exception as e:  # noqa: BLE001
            print(f"512 b{batch_size} {precision} {label:<7} FAILED "
                  f"{type(e).__name__}: {e}"[:200], flush=True)
        gc.collect()
    if all(k in results for k in ("plain", "+gp", "+gp+pl")):
        est = (24 * results["plain"] + 7 * results["+gp"]
               + results["+gp+pl"]) / 32 + 1e-3
        print(f"512 b{batch_size} {precision} SCHEDULE EST: "
              f"{batch_size/est:6.2f} imgs/s ({est*1e3:.1f} ms/step)",
              flush=True)
    del step, state, batch
    gc.collect()
    return results


def split_section(batch_size, precision, remat=False, ema_dtype=None):
    """Fallback when the fused AOT compile trips the remote helper:
    split-form JIT path, ONE variant per fresh state (probe512c showed
    the 8 GB donated state fragments HBM after ~5 variant switches —
    rebuild between variants keeps the allocator clean). Per-step sync
    (~31 ms/fetch on this tunnel) is included in the printed times."""
    results = {}
    key = jax.random.PRNGKey(0)
    for label, gp, pl in (("plain", False, False), ("+gp", True, False),
                          ("+pl", False, True), ("+gp+pl", True, True)):
        try:
            step, state, batch, key = build(batch_size, precision, split=True,
                                            remat=remat, ema_dtype=ema_dtype)
            state, m = step(state, batch, jax.random.fold_in(key, 99),
                            apply_gp=gp, apply_pl=pl, apply_ema=False)
            float(m["d_loss"])
            t0 = time.perf_counter()
            for i in range(6):
                state, m = step(state, batch, jax.random.fold_in(key, i),
                                apply_gp=gp, apply_pl=pl, apply_ema=False)
                float(m["d_loss"])
            dt = (time.perf_counter() - t0) / 6
            print(f"512 b{batch_size} {precision} {label:<7} {dt*1e3:8.2f} ms "
                  f"(split, synced)  {batch_size/dt:6.2f} imgs/s", flush=True)
            results[label] = dt
            del step, state, batch
        except Exception as e:  # noqa: BLE001
            print(f"512 b{batch_size} {precision} {label:<7} SPLIT FAILED "
                  f"{type(e).__name__}: {e}"[:200], flush=True)
        gc.collect()
    if all(k in results for k in ("plain", "+gp", "+gp+pl")):
        est = (24 * results["plain"] + 7 * results["+gp"]
               + results["+gp+pl"]) / 32 + 1e-3
        print(f"512 b{batch_size} {precision} SCHEDULE EST (split): "
              f"{batch_size/est:6.2f} imgs/s ({est*1e3:.1f} ms/step)",
              flush=True)
    return results


def numeric_section(batch_size, precision, n_steps=20):
    """Short plain-step loop: is the loss finite at this config?"""
    try:
        step, state, batch, key = build(batch_size, precision, split=False)
        lowered = step.lower(state, batch, key, apply_gp=False,
                             apply_pl=False, apply_ema=False)
        compiled = lowered.compile()
        losses = []
        for i in range(n_steps):
            state, m = compiled(state, batch, jax.random.fold_in(key, i))
            if i % 5 == 4 or i == 0:
                losses.append((i, float(m["d_loss"]), float(m["g_loss"])))
        finite = all(np.isfinite(d) and np.isfinite(g) for _, d, g in losses)
        print(f"512 b{batch_size} {precision} NUMERIC: finite={finite} "
              f"{losses}", flush=True)
        del compiled, lowered, step, state, batch
    except Exception as e:  # noqa: BLE001
        print(f"512 b{batch_size} {precision} NUMERIC FAILED "
              f"{type(e).__name__}: {e}"[:200], flush=True)
    gc.collect()


def main():
    args = [a for a in sys.argv[1:] if a != "remat"]
    remat = "remat" in sys.argv[1:]
    bs = int(args[0]) if args else 2
    precision = args[1] if len(args) > 1 else "bf16"
    ema = os.environ.get("KNEE512_EMA") or None  # "bf16": EMA stored
    # bf16 w/ stochastic rounding (-1.4 GiB state; DESIGN.md r4b)
    print("devices:", jax.devices(), "remat:", remat, "ema:", ema,
          flush=True)
    if not aot_section(bs, precision, remat=remat, ema_dtype=ema):
        split_section(bs, precision, remat=remat, ema_dtype=ema)
    # numeric sanity: bf16 went NaN in the probe at this tiny batch;
    # check fp32 (the known-clean precision for small-config smokes,
    # CLAUDE.md) on the same shapes
    if not remat:  # numerics are remat-independent (tests/test_remat.py)
        numeric_section(bs, "fp32")
        numeric_section(bs, "bf16")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
