"""Block-boundary rematerialization is numerics- and param-tree-neutral.

``remat=True`` (utils/config.py) wraps model blocks in nn.remat
(jax.checkpoint): same forward values, same gradients, same parameter
tree — only the backward-pass activation memory changes. This is a
TPU-native addition with no reference analogue, so the contract is
equality with the non-remat path, which IS reference-parity-tested
elsewhere (tests/test_models.py, test_convert*.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from histogan_tpu.models import Discriminator, Generator
from histogan_tpu.models.rehisto import RecoloringEncoderDecoder, RecoloringGAN

SIZE = 32
CAP = 4
LATENT = 32


def _tree_allclose(a, b, rtol=1e-6, atol=1e-6):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol)


def _grads_close(a, b, tol=1e-5):
    """Global-norm relative error: immune to per-element catastrophic
    cancellation in tiny bias leaves (remat recompute reassociates fp32
    reductions; a structural bug would show O(1) error here)."""
    va = np.concatenate([np.asarray(x, np.float64).ravel()
                         for x in jax.tree_util.tree_leaves(a)])
    vb = np.concatenate([np.asarray(x, np.float64).ravel()
                         for x in jax.tree_util.tree_leaves(b)])
    err = np.linalg.norm(va - vb) / (np.linalg.norm(vb) + 1e-12)
    assert err < tol, f"relative grad error {err:.3e}"


def test_generator_remat_equivalence():
    g0 = Generator(SIZE, LATENT, CAP)
    g1 = Generator(SIZE, LATENT, CAP, remat=True)
    k = jax.random.PRNGKey(0)
    nl = g0.num_layers
    w = jax.random.normal(k, (2, nl - 2, LATENT))
    h = jax.random.normal(jax.random.fold_in(k, 1), (2, 2, LATENT))
    noise = jax.random.uniform(jax.random.fold_in(k, 2), (2, SIZE, SIZE, 1))
    params = g0.init(jax.random.PRNGKey(3), w, h, noise)["params"]
    # identical param tree -> remat weights are interchangeable
    p1 = g1.init(jax.random.PRNGKey(3), w, h, noise)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p1)

    out0 = g0.apply({"params": params}, w, h, noise)
    out1 = g1.apply({"params": params}, w, h, noise)
    _tree_allclose(out0, out1)

    def loss(m):
        def f(p):
            return jnp.mean(m.apply({"params": p}, w, h, noise) ** 2)
        return f

    _grads_close(jax.grad(loss(g1))(params), jax.grad(loss(g0))(params))


def test_discriminator_remat_equivalence():
    # include attention + VQ layers: they stay OUTSIDE the remat
    # boundary (mutable vq_stats) but must compose with rematted blocks
    d0 = Discriminator(SIZE, CAP, fq_layers=(2,), attn_layers=(1,))
    d1 = Discriminator(SIZE, CAP, fq_layers=(2,), attn_layers=(1,), remat=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, SIZE, SIZE, 3))
    v = d0.init(jax.random.PRNGKey(1), x)
    v1 = d1.init(jax.random.PRNGKey(1), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v1)

    out0 = d0.apply(v, x, train=True, mutable=["vq_stats"])
    out1 = d1.apply(v, x, train=True, mutable=["vq_stats"])
    _tree_allclose(out0[0], out1[0])  # (logits, qloss)
    _tree_allclose(out0[1], out1[1])  # updated vq_stats

    def loss(m):
        def f(p):
            (logits, qloss), _ = m.apply(
                {"params": p, "vq_stats": v["vq_stats"]}, x,
                train=True, mutable=["vq_stats"])
            return jnp.mean(logits ** 2) + qloss
        return f

    _grads_close(jax.grad(loss(d1))(v["params"]), jax.grad(loss(d0))(v["params"]))


@pytest.mark.parametrize("skip_conn", [False, True])
def test_rehisto_remat_equivalence(skip_conn):
    ed0 = RecoloringEncoderDecoder(SIZE, CAP, 16, LATENT, 2,
                                   skip_conn_to_GAN=skip_conn)
    ed1 = RecoloringEncoderDecoder(SIZE, CAP, 16, LATENT, 2,
                                   skip_conn_to_GAN=skip_conn, remat=True)
    img = jax.random.uniform(jax.random.PRNGKey(0), (2, SIZE, SIZE, 3))
    hist = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 16, 16))
    hist = hist / hist.sum(axis=(1, 2, 3), keepdims=True)
    params = ed0.init(jax.random.PRNGKey(2), img, hist)["params"]
    p1 = ed1.init(jax.random.PRNGKey(2), img, hist)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p1)

    out0 = ed0.apply({"params": params}, img, hist)
    out1 = ed1.apply({"params": params}, img, hist)
    _tree_allclose(out0, out1)

    def ed_loss(m):
        def f(p):
            outs = m.apply({"params": p}, img, hist)
            return sum(jnp.mean(o ** 2) for o in jax.tree_util.tree_leaves(outs))
        return f

    _grads_close(jax.grad(ed_loss(ed1))(params), jax.grad(ed_loss(ed0))(params))

    # GAN head on the ED's latent output
    g0 = RecoloringGAN(SIZE, LATENT, CAP)
    g1 = RecoloringGAN(SIZE, LATENT, CAP, remat=True)
    latent, rgb = out0[0], out0[1]
    h_w = jax.random.normal(jax.random.PRNGKey(3), (2, LATENT))
    noise = jax.random.uniform(jax.random.PRNGKey(4), (2, SIZE, SIZE, 1))
    l1 = out0[2] if skip_conn else None
    l2 = out0[3] if skip_conn else None
    gp = g0.init(jax.random.PRNGKey(5), latent, rgb, h_w, noise, l1, l2)["params"]
    gp1 = g1.init(jax.random.PRNGKey(5), latent, rgb, h_w, noise, l1, l2)["params"]
    assert jax.tree_util.tree_structure(gp) == jax.tree_util.tree_structure(gp1)
    _tree_allclose(
        g0.apply({"params": gp}, latent, rgb, h_w, noise, l1, l2),
        g1.apply({"params": gp}, latent, rgb, h_w, noise, l1, l2),
    )

    def g_loss(m):
        def f(p):
            return jnp.mean(
                m.apply({"params": p}, latent, rgb, h_w, noise, l1, l2) ** 2)
        return f

    _grads_close(jax.grad(g_loss(g1))(gp), jax.grad(g_loss(g0))(gp))


def test_trainer_remat_step(tmp_path):
    """One real train step with remat on: finite metrics, second-order
    gp/pl grads work through the checkpointed blocks."""
    from PIL import Image

    from histogan_tpu.train import Trainer

    root = tmp_path / "data"
    root.mkdir()
    rng = np.random.RandomState(0)
    for i in range(4):
        Image.fromarray((rng.rand(SIZE, SIZE, 3) * 255).astype(np.uint8)).save(
            root / f"{i}.jpg")

    t = Trainer(
        name="remat_smoke", results_dir=str(tmp_path / "r"),
        models_dir=str(tmp_path / "m"), image_size=SIZE,
        network_capacity=CAP, latent_dim=LATENT, style_depth=2,
        batch_size=2, gradient_accumulate_every=1, hist_bin=16,
        num_devices=2, seed=0, remat=True,
    )
    assert t.cfg.remat
    t.init_GAN()
    assert t.G.remat and t.D.remat
    t.set_data_src(str(root))
    t.train(alpha=2)  # step 0 exercises gp + pl (second-order)
    assert np.isfinite(t.d_loss) and np.isfinite(t.g_loss)
    assert np.isfinite(t.h_loss)


def test_rehisto_trainer_remat_step(tmp_path):
    """One real recoloring train step with remat on: the ED/G/D remat
    plumbing works through RecoloringTrainer's jitted step (gp included
    at step 0)."""
    from PIL import Image

    from histogan_tpu.train.rehisto_trainer import RecoloringTrainer

    root = tmp_path / "data"
    root.mkdir()
    rng = np.random.RandomState(0)
    for i in range(4):
        Image.fromarray((rng.rand(SIZE, SIZE, 3) * 255).astype(np.uint8)).save(
            root / f"{i}.jpg")

    t = RecoloringTrainer(
        name="remat_re", results_dir=str(tmp_path / "r"),
        models_dir=str(tmp_path / "m"), image_size=SIZE,
        network_capacity=CAP, latent_dim=LATENT, style_depth=2,
        batch_size=2, gradient_accumulate_every=1, hist_bin=16,
        skip_conn_to_GAN=True, num_devices=2, seed=0, remat=True,
    )
    assert t.cfg.remat
    t.init_GAN()
    assert t.ED.remat and t.G.remat and t.D.remat
    t.set_data_src(str(root), sampling=True)
    t.train(alpha=32, beta=1.5, gamma=4)
    for v in (t.d_loss, t.g_loss, t.h_loss, t.r_loss):
        assert np.isfinite(v)
