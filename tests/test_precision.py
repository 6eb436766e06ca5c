"""bf16 mixed-precision policy: compute in bf16, fp32 masters/losses."""

import numpy as np
import pytest
from PIL import Image

from histogan_tpu.train import Trainer


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    rng = np.random.RandomState(0)
    for i in range(6):
        arr = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(root / f"{i}.jpg")
    return str(root)


def test_bf16_train_step(tiny_dataset, tmp_path_factory):
    import jax

    out = tmp_path_factory.mktemp("bf16")
    t = Trainer(
        name="bf16", results_dir=str(out / "r"), models_dir=str(out / "m"),
        image_size=32, network_capacity=4, latent_dim=32, style_depth=2,
        batch_size=2, gradient_accumulate_every=1, hist_bin=16,
        num_devices=1, seed=0, precision="bf16",
    )
    t.init_GAN()
    t.set_data_src(tiny_dataset)
    for _ in range(2):
        t.train()
    assert np.isfinite(t.d_loss) and np.isfinite(t.g_loss)
    assert np.isfinite(t.h_loss) and t.h_loss > 0
    # master params remain fp32
    leaves = jax.tree_util.tree_leaves(t.state.params_g)
    assert all(x.dtype == np.float32 for x in leaves)
    # step 0 covered gp+pl paths under bf16 (no dtype crashes)


def test_bf16_pl_reg_degenerate_config_stays_finite():
    """Regression: cap-4 + latent-512 bf16 NaN'd at step 0 (CLAUDE.md
    "Known numeric", bisected r4 to the PL reg's std(w) backward —
    bf16 w-coordinate collisions across the batch make sigma exactly 0,
    whose sqrt backward is 0/0 while the forward stays finite). The
    safe-variance form in train/steps.py g_loss_fn must keep the whole
    step finite at the exact degenerate config + key schedule."""
    import jax
    import jax.numpy as jnp

    from histogan_tpu.models import (
        Discriminator, Generator, HistVectorizer, StyleVectorizer,
    )
    from histogan_tpu.optim import diffgrad
    from histogan_tpu.parallel import make_mesh, replicate, shard_batch
    from histogan_tpu.train.state import HistoGANState
    from histogan_tpu.train.steps import Models, make_train_step
    from histogan_tpu.utils.config import HistoGANConfig

    size = 64
    cfg = HistoGANConfig(
        image_size=size, network_capacity=4, latent_dim=512,
        style_depth=8, hist_bin=64, batch_size=2,
        gradient_accumulate_every=1, precision="bf16",
    )
    mesh = make_mesh(1)
    S = StyleVectorizer(cfg.latent_dim, cfg.style_depth)
    H = HistVectorizer(cfg.hist_bin, cfg.latent_dim, cfg.style_depth)
    G = Generator(cfg.image_size, cfg.latent_dim, cfg.network_capacity)
    D = Discriminator(cfg.image_size, cfg.network_capacity)
    models = Models(S, H, G, D)
    key = jax.random.PRNGKey(42)
    ks = jax.random.split(key, 4)
    nl = cfg.num_layers
    params_g = {
        "S": S.init(ks[0], jnp.zeros((1, cfg.latent_dim)))["params"],
        "H": H.init(ks[1], jnp.zeros((1, 3, 64, 64)))["params"],
        "G": G.init(ks[2], jnp.zeros((1, nl - 2, cfg.latent_dim)),
                    jnp.zeros((1, 2, cfg.latent_dim)),
                    jnp.zeros((1, size, size, 1)))["params"],
    }
    params_d = D.init(ks[3], jnp.zeros((1, size, size, 3)))["params"]
    g_tx = diffgrad(cfg.learning_rate, 0.5, 0.9)
    d_tx = diffgrad(cfg.learning_rate * 1.5, 0.5, 0.9)
    state = replicate(HistoGANState(
        step=jnp.zeros((), jnp.int32),
        params_g=params_g, params_d=params_d,
        ema=jax.tree_util.tree_map(jnp.copy, params_g),
        opt_g=g_tx.init(params_g), opt_d=d_tx.init(params_d),
        pl_mean=jnp.zeros(()),
    ), mesh)
    rng = np.random.RandomState(0)
    norm = lambda h: h / h.sum((2, 3, 4), keepdims=True)
    batch = shard_batch({
        "d_images": rng.rand(1, 2, size, size, 3).astype(np.float32),
        "d_hists": norm(rng.rand(1, 2, 3, 64, 64).astype(np.float32)),
        "g_hists": norm(rng.rand(1, 2, 3, 64, 64).astype(np.float32)),
    }, mesh, batch_axis=1)
    step = make_train_step(models, g_tx, d_tx, cfg, split=False)
    # the exact key schedule that reproduced the NaN (fold_in(key, 100))
    state, m = step(state, batch, jax.random.fold_in(key, 100),
                    apply_gp=True, apply_pl=True, apply_ema=False)
    for name, tree in (("opt_g", state.opt_g), ("params_g", state.params_g)):
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            arr = np.asarray(leaf, np.float32)
            assert np.isfinite(arr).all(), (
                f"non-finite {name} leaf {jax.tree_util.keystr(path)}")
    assert all(np.isfinite(float(v)) for v in m.values()), m
