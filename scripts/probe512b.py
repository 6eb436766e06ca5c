"""Probe round 2: reproduce the REAL 512px cap-16 train-step compile
failure (BASELINE.md 512px note) with controlled escalation.

probe512.py established that the G-only backward at 512/cap16 (the
4096-lane convs) compiles and runs fine — so the old "4096-lane weight
tensors" correlation is wrong. This probe drives the actual
make_train_step(split=True) programs variant by variant (plain -> gp ->
gp+pl) and batch by batch (2 -> 8) to find which program, if any, still
trips the remote compile helper, with `opt_state_dtype='bf16'` keeping
the 680.5M-param state inside one chip's HBM.

Run: `python -u scripts/probe512b.py` (single TPU process).
"""
from __future__ import annotations

import time
import traceback

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def build(batch_size, split=True, capacity=16, image_size=512):
    from histogan_tpu.models import (
        Discriminator, Generator, HistVectorizer, StyleVectorizer,
    )
    from histogan_tpu.optim import diffgrad
    from histogan_tpu.parallel import make_mesh, replicate, shard_batch
    from histogan_tpu.train.state import HistoGANState
    from histogan_tpu.train.steps import Models, make_train_step
    from histogan_tpu.utils.config import HistoGANConfig

    cfg = HistoGANConfig(
        image_size=image_size, network_capacity=capacity,
        batch_size=batch_size, gradient_accumulate_every=1,
        precision="bf16",
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

    rng = np.random.default_rng(0)
    batch = {
        "d_images": rng.random(
            (1, batch_size, image_size, image_size, 3), np.float32),
        "d_hists": (lambda h: h / h.sum((2, 3, 4), keepdims=True))(
            rng.random((1, batch_size, 3, cfg.hist_bin, cfg.hist_bin),
                       np.float32)),
        "g_hists": (lambda h: h / h.sum((2, 3, 4), keepdims=True))(
            rng.random((1, batch_size, 3, cfg.hist_bin, cfg.hist_bin),
                       np.float32)),
    }
    batch = shard_batch(batch, mesh, batch_axis=1)
    step_fn = make_train_step(models, g_tx, d_tx, cfg, split=split)
    return step_fn, state, batch, key


def try_variant(name, step_fn, state, batch, key, **flags):
    t0 = time.time()
    try:
        new_state, metrics = step_fn(state, batch, key, **flags)
        v = float(metrics["d_loss"])
        print(f"PROBE {name}: OK ({time.time()-t0:.1f}s) d_loss={v:.4g}",
              flush=True)
        return new_state, True
    except Exception as e:  # noqa: BLE001
        msg = " / ".join(str(e).splitlines()[:2])[:300]
        print(f"PROBE {name}: FAIL ({time.time()-t0:.1f}s) "
              f"{type(e).__name__}: {msg}", flush=True)
        return state, False


def run_config(tag, batch_size, split, escalate_flags):
    print(f"=== {tag}: batch={batch_size} split={split}", flush=True)
    try:
        step_fn, state, batch, key = build(batch_size, split=split)
    except Exception as e:  # noqa: BLE001
        print(f"PROBE {tag}-build: FAIL {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)
        return False
    k = jax.random.fold_in(key, 7)
    state, ok = try_variant(
        f"{tag}-plain", step_fn, state, batch, k,
        apply_gp=False, apply_pl=False, apply_ema=False)
    if ok and escalate_flags:
        state, ok_gp = try_variant(
            f"{tag}-gp", step_fn, state, batch, k,
            apply_gp=True, apply_pl=False, apply_ema=False)
        state, ok_pl = try_variant(
            f"{tag}-gp+pl+ema", step_fn, state, batch, k,
            apply_gp=True, apply_pl=True, apply_ema=True)
        ok = ok and ok_gp and ok_pl
    return ok


def main():
    print(f"devices: {jax.devices()}", flush=True)
    ok2 = run_config("split-b2", 2, True, escalate_flags=True)
    if ok2:
        ok8 = run_config("split-b8", 8, True, escalate_flags=True)
        if ok8:
            run_config("fused-b8", 8, False, escalate_flags=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
