"""Execute ONE fused 512px capacity-16 train step FSDP-sharded over an
8-device mesh (virtual CPU devices) — the designed multi-chip path for
the model whose fp32 training state (680.5M params ≈ 12.5 GB) sits at
the edge of a single 16 GB v5e chip (BASELINE.md 512px note,
docs/DESIGN.md "FSDP state layout").

This is the capability proof the single-chip environment cannot give:
the full 512/cap16 step program, jitted with the FSDP out_shardings,
compiles and EXECUTES with the state laid out 1/8-per-device. Run:

    python -u scripts/dryrun512_fsdp.py [batch=8]

Takes several minutes on a 1-core host (the step is ~10 TFLOP of fp32
conv work); prints per-device state bytes and the step metrics.
"""
from __future__ import annotations

import sys
import time

import os

# same pattern as tests/conftest.py: the axon sitecustomize imports jax
# at startup, so force the platform through jax.config too; XLA_FLAGS is
# read lazily when the CPU backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    # "remat" anywhere on the command line: verify the 512px multi-chip
    # recipe (--remat --param_sharding fsdp) at full size
    args = [a for a in sys.argv[1:] if a != "remat"]
    remat = "remat" in sys.argv[1:]
    batch = int(args[0]) if args else 8
    from histogan_tpu.models import (
        Discriminator, Generator, HistVectorizer, StyleVectorizer,
    )
    from histogan_tpu.optim import diffgrad
    from histogan_tpu.parallel import make_mesh, shard_batch
    from histogan_tpu.parallel.fsdp import (
        shard_state, sharded_bytes_per_device, state_shardings,
    )
    from histogan_tpu.train.state import HistoGANState
    from histogan_tpu.train.steps import Models, make_train_step
    from histogan_tpu.utils.config import HistoGANConfig

    assert len(jax.devices()) == 8, jax.devices()
    cfg = HistoGANConfig(image_size=512, network_capacity=16,
                         batch_size=batch, gradient_accumulate_every=1,
                         precision="fp32", remat=remat)
    mesh = make_mesh()
    S = StyleVectorizer(cfg.latent_dim, cfg.style_depth)
    H = HistVectorizer(cfg.hist_bin, cfg.latent_dim, cfg.style_depth)
    G = Generator(cfg.image_size, cfg.latent_dim, cfg.network_capacity,
                  remat=remat)
    D = Discriminator(cfg.image_size, cfg.network_capacity, remat=remat)
    models = Models(S, H, G, D)

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    nl = cfg.num_layers
    t0 = time.time()
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
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(
        {"g": params_g, "d": params_d}))
    print(f"init: {n_params/1e6:.1f}M params ({time.time()-t0:.0f}s)",
          flush=True)

    g_tx = diffgrad(cfg.learning_rate, 0.5, 0.9)
    d_tx = diffgrad(cfg.learning_rate, 0.5, 0.9)
    state = HistoGANState(
        step=jnp.zeros((), jnp.int32),
        params_g=params_g, params_d=params_d,
        ema=jax.tree_util.tree_map(jnp.copy, params_g),
        opt_g=g_tx.init(params_g), opt_d=d_tx.init(params_d),
        pl_mean=jnp.zeros(()),
    )
    shardings = state_shardings(state, mesh)
    state = shard_state(state, mesh, shardings)
    per_dev = sharded_bytes_per_device(state)
    total = sum(x.nbytes for x in jax.tree_util.tree_leaves(state))
    print(f"state: {total/2**30:.2f} GiB total, "
          f"{per_dev/2**30:.2f} GiB/device "
          f"({8*per_dev/total:.2f}x ideal 1/8)", flush=True)
    assert per_dev < 0.20 * total, "FSDP layout did not shard the state"

    rng = np.random.default_rng(0)
    norm = lambda h: h / h.sum((2, 3, 4), keepdims=True)
    b = shard_batch({
        "d_images": rng.random((1, batch, 512, 512, 3), np.float32),
        "d_hists": norm(rng.random((1, batch, 3, cfg.hist_bin,
                                    cfg.hist_bin), np.float32)),
        "g_hists": norm(rng.random((1, batch, 3, cfg.hist_bin,
                                    cfg.hist_bin), np.float32)),
    }, mesh, batch_axis=1)
    step_fn = make_train_step(models, g_tx, d_tx, cfg,
                              state_shardings=shardings)

    t0 = time.time()
    state, metrics = step_fn(state, b, jax.random.fold_in(key, 1),
                             apply_gp=False, apply_pl=False, apply_ema=True)
    metrics = {k: float(v) for k, v in metrics.items()}
    assert all(np.isfinite(v) for v in metrics.values()), metrics
    post_dev = sharded_bytes_per_device(state)
    print(f"step OK ({time.time()-t0:.0f}s): {metrics}", flush=True)
    print(f"post-step state still sharded: {post_dev/2**30:.2f} GiB/device",
          flush=True)
    assert post_dev < 0.20 * total
    print("DRYRUN512 FSDP OK", flush=True)


if __name__ == "__main__":
    main()
