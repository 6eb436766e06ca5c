"""Distributed-correctness tests (SURVEY.md §4): the same training step
on a 1-device mesh and a sharded multi-device mesh must produce the SAME
losses in fp32 — XLA collectives make the gradient psum deterministic."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from histogan_tpu.models import Discriminator, Generator, HistVectorizer, StyleVectorizer
from histogan_tpu.optim import diffgrad
from histogan_tpu.parallel import make_mesh, replicate, shard_batch
from histogan_tpu.train.state import HistoGANState
from histogan_tpu.train.steps import Models, make_train_step
from histogan_tpu.utils.config import HistoGANConfig


def _setup(batch):
    cfg = HistoGANConfig(image_size=32, network_capacity=4, latent_dim=32,
                         style_depth=2, hist_bin=16, batch_size=batch,
                         gradient_accumulate_every=1)
    S = StyleVectorizer(cfg.latent_dim, cfg.style_depth)
    H = HistVectorizer(cfg.hist_bin, cfg.latent_dim, cfg.style_depth)
    G = Generator(cfg.image_size, cfg.latent_dim, cfg.network_capacity)
    D = Discriminator(cfg.image_size, cfg.network_capacity)
    models = Models(S, H, G, D)
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    nl = cfg.num_layers
    params_g = {
        "S": S.init(ks[0], jnp.zeros((1, cfg.latent_dim)))["params"],
        "H": H.init(ks[1], jnp.zeros((1, 3, cfg.hist_bin, cfg.hist_bin)))["params"],
        "G": G.init(ks[2], jnp.zeros((1, nl - 2, cfg.latent_dim)),
                    jnp.zeros((1, 2, cfg.latent_dim)),
                    jnp.zeros((1, cfg.image_size, cfg.image_size, 1)))["params"],
    }
    params_d = D.init(ks[3], jnp.zeros((1, cfg.image_size, cfg.image_size, 3)))["params"]
    g_tx = diffgrad(cfg.learning_rate, 0.5, 0.9)
    d_tx = diffgrad(cfg.learning_rate, 0.5, 0.9)
    state = HistoGANState(
        step=jnp.zeros((), jnp.int32), params_g=params_g, params_d=params_d,
        ema=jax.tree_util.tree_map(jnp.copy, params_g),
        opt_g=g_tx.init(params_g), opt_d=d_tx.init(params_d),
        pl_mean=jnp.zeros(()),
    )
    step = make_train_step(models, g_tx, d_tx, cfg)
    return cfg, state, step


def _batch(cfg):
    rng = np.random.default_rng(7)
    a, b = cfg.gradient_accumulate_every, cfg.batch_size
    return {
        "d_images": rng.random((a, b, cfg.image_size, cfg.image_size, 3), np.float32),
        "d_hists": rng.random((a, b, 3, cfg.hist_bin, cfg.hist_bin), np.float32),
        "g_hists": rng.random((a, b, 3, cfg.hist_bin, cfg.hist_bin), np.float32),
    }


@pytest.mark.parametrize("n_devices", [2, 4, 8])
def test_sharded_step_matches_single_device(n_devices):
    """Identical inputs, identical RNG: per-step metrics must agree
    between a replicated 1-device run and a batch-sharded n-device run."""
    cfg, state, step = _setup(batch=8)
    batch = _batch(cfg)
    key = jax.random.PRNGKey(42)

    mesh1 = make_mesh(1)
    s1 = replicate(jax.device_get(state), mesh1)
    b1 = shard_batch(batch, mesh1, batch_axis=1)
    _, m1 = step(s1, b1, key, apply_gp=True, apply_pl=True)

    meshn = make_mesh(n_devices)
    sn = replicate(jax.device_get(state), meshn)
    bn = shard_batch(batch, meshn, batch_axis=1)
    _, mn = step(sn, bn, key, apply_gp=True, apply_pl=True)

    for k in m1:
        np.testing.assert_allclose(
            float(m1[k]), float(mn[k]), rtol=2e-5, atol=1e-6,
            err_msg=f"metric {k} diverges on {n_devices}-device mesh",
        )


def test_sharded_params_stay_in_sync():
    """After a sharded step, parameters must remain replicated-identical
    across devices (gradient psum, no per-device drift)."""
    cfg, state, step = _setup(batch=8)
    mesh = make_mesh(4)
    s = replicate(jax.device_get(state), mesh)
    b = shard_batch(_batch(cfg), mesh, batch_axis=1)
    s2, _ = step(s, b, jax.random.PRNGKey(1), apply_gp=False, apply_pl=False)
    leaf = s2.params_g["G"]["initial_block"]
    shards = [np.asarray(x.data) for x in leaf.addressable_shards]
    for other in shards[1:]:
        np.testing.assert_array_equal(shards[0], other)


def test_shard_batch_rejects_non_divisible():
    """A config typo (batch not divisible by the mesh) must raise, not
    silently replicate into an n-fold throughput cliff (r1 weak #5)."""
    import pytest
    from histogan_tpu.parallel import make_mesh, shard_batch

    mesh = make_mesh(4)
    with pytest.raises(ValueError, match="not divisible"):
        shard_batch({"x": np.zeros((6, 3))}, mesh)
    with pytest.raises(ValueError, match="not divisible"):
        shard_batch({"x": np.zeros((2, 6, 3))}, mesh, batch_axis=1)
    # scalars can't be batch-sharded either
    with pytest.raises(ValueError):
        shard_batch({"x": np.zeros(())}, mesh)


def test_merged_d_forward_matches_unmerged():
    """The non-GP D phase runs fake+real through ONE batch-2B forward
    (steps.MERGE_D_FORWARD). Without VQ that must be numerically
    identical to the two-call form — pinned by flipping the switch and
    re-tracing the step on identical state/batch/key."""
    from histogan_tpu.train import steps as steps_mod

    batch = _batch(_setup(batch=8)[0])
    key = jax.random.PRNGKey(3)
    mesh = make_mesh(1)

    results = {}
    for merged in (True, False):
        old = steps_mod.MERGE_D_FORWARD
        steps_mod.MERGE_D_FORWARD = merged
        try:
            cfg, state, step = _setup(batch=8)  # fresh jit per variant
            s = replicate(jax.device_get(state), mesh)
            b = shard_batch(batch, mesh, batch_axis=1)
            s2, m = step(s, b, key, apply_gp=False, apply_pl=False)
            results[merged] = (
                {k: float(v) for k, v in m.items()},
                np.asarray(jax.device_get(
                    jax.tree_util.tree_leaves(s2.params_d)[0])),
            )
        finally:
            steps_mod.MERGE_D_FORWARD = old

    m_t, leaf_t = results[True]
    m_f, leaf_f = results[False]
    for k in m_t:
        np.testing.assert_allclose(m_t[k], m_f[k], rtol=1e-6, atol=1e-7,
                                   err_msg=f"metric {k}")
    np.testing.assert_allclose(leaf_t, leaf_f, rtol=1e-6, atol=1e-7)


def test_merged_d_forward_sharded():
    """The merged concat runs under the mesh: a non-GP sharded step must
    reproduce the 1-device metrics (concat axis is the sharded batch)."""
    cfg, state, step = _setup(batch=8)
    batch = _batch(cfg)
    key = jax.random.PRNGKey(11)

    s1 = replicate(jax.device_get(state), make_mesh(1))
    _, m1 = step(s1, shard_batch(batch, make_mesh(1), batch_axis=1), key,
                 apply_gp=False, apply_pl=False)
    s4 = replicate(jax.device_get(state), make_mesh(4))
    _, m4 = step(s4, shard_batch(batch, make_mesh(4), batch_axis=1), key,
                 apply_gp=False, apply_pl=False)
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m4[k]),
                                   rtol=2e-5, atol=1e-6, err_msg=k)


def test_fsdp_step_matches_replicated():
    """FSDP (ZeRO-3-style sharded params/opt/EMA over the 'data' axis,
    parallel/fsdp.py) must reproduce the replicated DP step: identical
    inputs/RNG -> identical metrics AND identical post-step parameters.
    The step code is shared; only the layout (and therefore the
    collectives XLA inserts) differs."""
    from histogan_tpu.parallel import shard_state, state_shardings, unshard
    from histogan_tpu.train.steps import make_train_step

    cfg, state, step_rep = _setup(batch=8)
    batch = _batch(cfg)
    key = jax.random.PRNGKey(42)
    mesh = make_mesh(8)
    host_state = jax.device_get(state)

    s_rep = replicate(host_state, mesh)
    b = shard_batch(batch, mesh, batch_axis=1)
    s_rep2, m_rep = step_rep(s_rep, b, key, apply_gp=True, apply_pl=True)

    # fresh setup for an independent jit with pinned out_shardings
    cfg2, state2, _ = _setup(batch=8)
    models, g_tx, d_tx = _models_and_tx(cfg2)
    sh = state_shardings(host_state, mesh)
    step_fsdp = make_train_step(models, g_tx, d_tx, cfg2,
                                state_shardings=sh)
    s_fsdp = shard_state(host_state, mesh, sh)
    s_fsdp2, m_fsdp = step_fsdp(s_fsdp, shard_batch(batch, mesh, batch_axis=1),
                                key, apply_gp=True, apply_pl=True)

    for k in m_rep:
        np.testing.assert_allclose(
            float(m_rep[k]), float(m_fsdp[k]), rtol=5e-5, atol=1e-6,
            err_msg=f"metric {k} diverges under FSDP layout",
        )
    # post-step params: gather the sharded tree and compare leaf-wise
    gathered = jax.device_get(unshard(s_fsdp2.params_g, mesh))
    ref = jax.device_get(s_rep2.params_g)
    flat_f, _ = jax.tree_util.tree_flatten(gathered)
    flat_r, _ = jax.tree_util.tree_flatten(ref)
    for a, b_ in zip(flat_f, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-5, atol=1e-6)


def _models_and_tx(cfg, remat=False):
    S = StyleVectorizer(cfg.latent_dim, cfg.style_depth)
    H = HistVectorizer(cfg.hist_bin, cfg.latent_dim, cfg.style_depth)
    G = Generator(cfg.image_size, cfg.latent_dim, cfg.network_capacity,
                  remat=remat)
    D = Discriminator(cfg.image_size, cfg.network_capacity, remat=remat)
    return Models(S, H, G, D), diffgrad(cfg.learning_rate, 0.5, 0.9), \
        diffgrad(cfg.learning_rate, 0.5, 0.9)


def test_fsdp_state_is_actually_sharded():
    """The FSDP layout must hold ~1/n of the sharded leaves per device —
    the memory win is the point (512px cap-16 = 12.5 GB state; BASELINE
    512px note). Also checks the spec rule picks a divisible axis."""
    from histogan_tpu.parallel import fsdp_spec, shard_state, state_shardings
    from histogan_tpu.parallel.fsdp import sharded_bytes_per_device
    from jax.sharding import PartitionSpec as P

    assert fsdp_spec((3, 3, 64, 128), 8) == P(None, None, None, "data")
    assert fsdp_spec((128, 64), 8) == P("data", None)  # largest dim wins
    assert fsdp_spec((64, 64), 8) == P(None, "data")   # tie -> trailing
    assert fsdp_spec((3,), 8) == P()                   # no divisible dim
    assert fsdp_spec((), 8) == P()

    _, state, _ = _setup(batch=8)
    mesh = make_mesh(8)
    host_state = jax.device_get(state)
    sharded = shard_state(host_state, mesh)
    total = sum(l.nbytes for l in jax.tree_util.tree_leaves(host_state))
    per_dev = sharded_bytes_per_device(sharded)
    # most bytes live in n-divisible kernels: per-device must be well
    # under the replicated total (ideal 1/8 plus replicated odd leaves)
    assert per_dev < 0.3 * total, (per_dev, total)

    # params stay correct end-to-end: sharding spec of a conv kernel leaf
    leaf = sharded.params_g["G"]["blocks_0"]
    specs = {tuple(l.sharding.spec)
             for l in jax.tree_util.tree_leaves(leaf)
             if hasattr(l, "sharding")}
    assert any("data" in s for s in specs), specs


def test_rehisto_fsdp_step_matches_replicated():
    """FSDP layout on the recoloring family: identical inputs/RNG must
    give identical metrics vs the replicated step (GP on — the
    second-order path must also survive the sharded-weight layout)."""
    from histogan_tpu.models import (
        HistVectorizer, RecoloringEncoderDecoder, RecoloringGAN,
    )
    from histogan_tpu.parallel import shard_state, state_shardings
    from histogan_tpu.train.rehisto_steps import (
        RecolorModels, make_rehisto_train_step,
    )
    from histogan_tpu.train.state import ReHistoGANState
    from histogan_tpu.utils.config import ReHistoGANConfig

    cfg = ReHistoGANConfig(
        image_size=32, network_capacity=4, latent_dim=32, style_depth=2,
        hist_bin=16, batch_size=8, gradient_accumulate_every=1,
        variance_loss=True,
    )
    ED = RecoloringEncoderDecoder(cfg.image_size, cfg.network_capacity,
                                  cfg.hist_bin, cfg.latent_dim,
                                  cfg.style_depth)
    H = HistVectorizer(cfg.hist_bin, cfg.latent_dim, cfg.style_depth)
    G = RecoloringGAN(cfg.image_size, cfg.latent_dim, cfg.network_capacity)
    D = Discriminator(cfg.image_size, cfg.network_capacity)
    models = RecolorModels(ED, H, G, D)

    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    img = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
    hist = jnp.zeros((1, 3, cfg.hist_bin, cfg.hist_bin))
    ed_vars = ED.init(ks[0], img, hist)
    latent, rgb = ED.apply(ed_vars, img, hist)
    params_g = {
        "ED": ed_vars["params"],
        "H": H.init(ks[1], hist)["params"],
        "G": G.init(ks[2], latent, rgb, jnp.zeros((1, cfg.latent_dim)),
                    jnp.zeros((1, cfg.image_size, cfg.image_size, 1)))["params"],
    }
    params_d = D.init(ks[3], img)["params"]
    g_tx = diffgrad(cfg.learning_rate, 0.5, 0.9)
    d_tx = diffgrad(cfg.learning_rate, 0.5, 0.9)
    host_state = jax.device_get(ReHistoGANState(
        step=jnp.zeros((), jnp.int32), params_g=params_g,
        params_d=params_d, opt_g=g_tx.init(params_g),
        opt_d=d_tx.init(params_d),
    ))

    rng = np.random.default_rng(5)
    b = cfg.batch_size
    batch = {
        "d_images": rng.random((1, b, 32, 32, 3), np.float32),
        "d_hists": rng.random((1, b, 3, 16, 16), np.float32),
        "g_images": rng.random((1, b, 32, 32, 3), np.float32),
        "g_hists": rng.random((1, b, 3, 16, 16), np.float32),
    }
    mesh = make_mesh(8)
    key = jax.random.PRNGKey(9)
    hyper = dict(apply_gp=True, alpha=32.0, beta=1.5, gamma=4.0)

    step_rep = make_rehisto_train_step(models, g_tx, d_tx, cfg)
    s_rep2, m_rep = step_rep(replicate(host_state, mesh),
                             shard_batch(batch, mesh, batch_axis=1), key,
                             **hyper)

    sh = state_shardings(host_state, mesh)
    step_fsdp = make_rehisto_train_step(models, g_tx, d_tx, cfg,
                                        state_shardings=sh)
    s_fsdp2, m_fsdp = step_fsdp(shard_state(host_state, mesh, sh),
                                shard_batch(batch, mesh, batch_axis=1), key,
                                **hyper)

    # The recoloring losses at random init are O(5e3) sums with heavy
    # internal cancellation (variance + rec terms), so the different
    # fp32 reduction order of the FSDP collective schedule shows up at
    # ~1e-3 relative (measured 1.3e-3) — vs 5e-5 for the O(1..100)
    # histoGAN metrics above.
    for k in m_rep:
        np.testing.assert_allclose(
            float(m_rep[k]), float(m_fsdp[k]), rtol=5e-3, atol=1e-4,
            err_msg=f"rehisto metric {k} diverges under FSDP layout",
        )
    # Parameter check, in units of the update quantum: at step 1
    # DiffGrad's bias corrections cancel exactly —
    # |update| = lr * dfc * |m_hat|/(sqrt(v_hat)+eps) = lr * dfc <= lr —
    # so even a reduction-order SIGN flip of a near-zero gradient moves
    # an element by at most 2 quanta of lr (measured: 13/9216 elements
    # at up to 1.6 quanta, rest <= 1e-5). A real layout bug
    # (wrong/missing collective) shifts most elements, which the
    # fraction assertion catches.
    from histogan_tpu.parallel import unshard
    quantum = cfg.learning_rate
    got = jax.device_get(unshard(s_fsdp2.params_g, mesh))
    want = jax.device_get(s_rep2.params_g)
    n_total = n_off = 0
    for (path, a), b_ in zip(
            jax.tree_util.tree_leaves_with_path(got),
            jax.tree_util.tree_leaves(want)):
        diff = np.abs(np.asarray(a) - np.asarray(b_))
        assert diff.max() <= 2.05 * quantum, (
            f"{jax.tree_util.keystr(path)}: max diff {diff.max():.3e} "
            f"exceeds 2 update quanta ({2.05 * quantum:.3e})")
        n_total += diff.size
        n_off += int(np.sum(diff > 1e-5))
    # pooled across the whole tree (small leaves make per-leaf fractions
    # noisy): measured 0.1–0.3%; systematic divergence would be ~100%
    assert n_off / n_total < 0.01, (
        f"{n_off}/{n_total} = {n_off / n_total:.1%} of parameters differ "
        f"beyond noise — systematic layout divergence")


def test_fsdp_rejects_split_step():
    from histogan_tpu.parallel import state_shardings
    cfg, state, _ = _setup(batch=8)
    models, g_tx, d_tx = _models_and_tx(cfg)
    sh = state_shardings(jax.device_get(state), make_mesh(2))
    with pytest.raises(ValueError, match="fused step"):
        make_train_step(models, g_tx, d_tx, cfg, split=True,
                        state_shardings=sh)


def test_uint8_feed_matches_float_feed():
    """The loader ships images as uint8 (4x less H2D traffic) and the
    step dequantizes on device; both paths compute float32(u8)/255, so a
    uint8-fed step must match a float-fed step exactly (fp32 CPU)."""
    cfg, state, step = _setup(batch=8)
    rng = np.random.default_rng(13)
    a, b = 1, 8
    u8 = rng.integers(0, 256, size=(a, b, 32, 32, 3), dtype=np.uint8)
    hists = {
        "d_hists": rng.random((a, b, 3, 16, 16), np.float32),
        "g_hists": rng.random((a, b, 3, 16, 16), np.float32),
    }
    key = jax.random.PRNGKey(21)
    mesh = make_mesh(1)

    outs = {}
    for tag, imgs in (("u8", u8), ("f32", u8.astype(np.float32) / 255.0)):
        s = replicate(jax.device_get(state), mesh)
        bt = shard_batch({"d_images": imgs, **hists}, mesh, batch_axis=1)
        _, m = step(s, bt, key, apply_gp=True, apply_pl=False)
        outs[tag] = {k: float(v) for k, v in m.items()}
    for k in outs["u8"]:
        np.testing.assert_allclose(outs["u8"][k], outs["f32"][k],
                                   rtol=0, atol=0, err_msg=k)


def test_fsdp_remat_step_matches_replicated():
    """remat composes with the FSDP layout (the 512px multi-chip recipe:
    `--remat --param_sharding fsdp`): the lifted checkpoint must not
    perturb numerics or break GSPMD partitioning of the sharded
    params/opt trees. Compared against the REPLICATED NON-REMAT step —
    one test pins both axes at once."""
    from histogan_tpu.parallel import shard_state, state_shardings, unshard
    from histogan_tpu.train.steps import make_train_step

    cfg, state, step_rep = _setup(batch=8)
    batch = _batch(cfg)
    key = jax.random.PRNGKey(21)
    mesh = make_mesh(8)
    host_state = jax.device_get(state)

    s_rep = replicate(host_state, mesh)
    b = shard_batch(batch, mesh, batch_axis=1)
    s_rep2, m_rep = step_rep(s_rep, b, key, apply_gp=True, apply_pl=True)

    # remat models (same param tree — the host_state is reused verbatim)
    import dataclasses
    cfg2 = dataclasses.replace(cfg, remat=True)
    models, g_tx, d_tx = _models_and_tx(cfg2, remat=True)
    sh = state_shardings(host_state, mesh)
    step_fsdp = make_train_step(models, g_tx, d_tx, cfg2,
                                state_shardings=sh)
    s_fsdp = shard_state(host_state, mesh, sh)
    s_fsdp2, m_fsdp = step_fsdp(s_fsdp, shard_batch(batch, mesh, batch_axis=1),
                                key, apply_gp=True, apply_pl=True)

    for k in m_rep:
        np.testing.assert_allclose(
            float(m_rep[k]), float(m_fsdp[k]), rtol=5e-5, atol=1e-6,
            err_msg=f"metric {k} diverges under FSDP+remat",
        )
    # post-step params via global-norm relative error: remat recompute
    # reassociates fp32 reductions, and DiffGrad's sign-like update turns
    # a near-zero gradient element's float-noise sign flip into a full
    # +-lr difference — elementwise rtol is the wrong metric for that
    # (cf. tests/test_remat.py _grads_close)
    gathered = jax.device_get(unshard(s_fsdp2.params_g, mesh))
    ref = jax.device_get(s_rep2.params_g)
    va = np.concatenate([np.asarray(x, np.float64).ravel()
                         for x in jax.tree_util.tree_leaves(gathered)])
    vb = np.concatenate([np.asarray(x, np.float64).ravel()
                         for x in jax.tree_util.tree_leaves(ref)])
    err = np.linalg.norm(va - vb) / (np.linalg.norm(vb) + 1e-12)
    assert err < 1e-5, f"post-step param divergence {err:.3e}"
