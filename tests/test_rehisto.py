"""ReHistoGAN end-to-end smoke: recoloring trainer steps, eval,
head-transplant, checkpoint round-trip."""

import numpy as np
import pytest
from PIL import Image

from histogan_tpu.train.rehisto_trainer import RecoloringTrainer


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    rng = np.random.RandomState(0)
    for i in range(6):
        arr = np.zeros((64, 64, 3), np.uint8)
        arr[..., i % 3] = 180
        arr += rng.randint(0, 60, (64, 64, 3)).astype(np.uint8)
        Image.fromarray(arr).save(root / f"{i}.jpg")
    return str(root)


@pytest.fixture(scope="module")
def trainer(tiny_dataset, tmp_path_factory):
    out = tmp_path_factory.mktemp("run")
    t = RecoloringTrainer(
        name="smoke_re",
        results_dir=str(out / "results"),
        models_dir=str(out / "models"),
        image_size=64, network_capacity=4, latent_dim=32, style_depth=2,
        batch_size=2, gradient_accumulate_every=1, hist_bin=16,
        save_every=2, skip_conn_to_GAN=True, num_devices=2, seed=0,
    )
    t.init_GAN()
    t.set_data_src(tiny_dataset, sampling=True)
    return t


def test_rehisto_smoke_train(trainer):
    for _ in range(2):
        trainer.train(alpha=32, beta=1.5, gamma=4)
    for v in (trainer.d_loss, trainer.g_loss, trainer.h_loss,
              trainer.r_loss, trainer.var_loss):
        assert np.isfinite(v)
    assert trainer.r_loss > 0
    assert trainer.var_loss <= 0  # negative variance term


def test_rehisto_eval_grids(trainer):
    out = trainer.evaluate(num=42, triple_hist=True)
    assert out.shape[0] == 12  # 4 images x 3 hists
    assert (trainer.results_dir / "smoke_re" / "42-generated.jpg").exists()
    assert (trainer.results_dir / "smoke_re" / "42-input.jpg").exists()


def test_rehisto_checkpoint_roundtrip(trainer):
    trainer.save(3)
    before = np.asarray(
        next(iter(trainer.state.params_g["ED"].values()))
        if isinstance(trainer.state.params_g["ED"], dict) else None
    )
    trainer.load(3)
    assert trainer.steps == 3 * trainer.cfg.save_every


def test_head_transplant(tiny_dataset, tmp_path_factory):
    from histogan_tpu.train import Trainer

    out = tmp_path_factory.mktemp("hg")
    hg = Trainer(
        name="donor", results_dir=str(out / "r"), models_dir=str(out / "m"),
        image_size=64, network_capacity=4, latent_dim=32, style_depth=2,
        batch_size=2, hist_bin=16, num_devices=1, seed=1,
    )
    hg.init_GAN()
    re = RecoloringTrainer(
        name="rx", results_dir=str(out / "r2"), models_dir=str(out / "m2"),
        image_size=64, network_capacity=4, latent_dim=32, style_depth=2,
        batch_size=2, hist_bin=16, num_devices=1, seed=2,
    )
    re.init_GAN()
    re.load_histogan_head(hg)
    import jax

    n = hg.cfg.num_layers
    donor = jax.device_get(hg.state.ema["G"][f"blocks_{n-2}"])
    got = jax.device_get(re.state.params_g["G"]["blocks_0"])
    a = donor["conv1"]["weight"]
    b = got["conv1"]["weight"]
    np.testing.assert_array_equal(a, b)


def test_fixed_gan_weights_freezes_head(tiny_dataset, tmp_path_factory):
    out = tmp_path_factory.mktemp("fx")
    t = RecoloringTrainer(
        name="fx", results_dir=str(out / "r"), models_dir=str(out / "m"),
        image_size=64, network_capacity=4, latent_dim=32, style_depth=2,
        batch_size=2, gradient_accumulate_every=1, hist_bin=16,
        fixed_gan_weights=True, num_devices=1, seed=3,
    )
    t.init_GAN()
    t.set_data_src(tiny_dataset, sampling=True)
    import jax

    g_before = jax.device_get(t.state.params_g["G"])
    h_before = jax.device_get(t.state.params_g["H"])
    ed_before = jax.device_get(t.state.params_g["ED"])
    t.train()
    g_after = jax.device_get(t.state.params_g["G"])
    h_after = jax.device_get(t.state.params_g["H"])
    ed_after = jax.device_get(t.state.params_g["ED"])

    def max_delta(a, b):
        import jax.tree_util as jtu

        return max(
            float(np.abs(x - y).max())
            for x, y in zip(jtu.tree_leaves(a), jtu.tree_leaves(b))
        )

    assert max_delta(g_before, g_after) == 0.0
    assert max_delta(h_before, h_after) == 0.0
    assert max_delta(ed_before, ed_after) > 0.0


def test_rehisto_bf16_and_sync_every(tiny_dataset, tmp_path_factory):
    """bf16 compute policy + async metrics on the recoloring trainer
    (r1 weak #4: neither was wired for RecoloringTrainer)."""
    out = tmp_path_factory.mktemp("run_bf16")
    t = RecoloringTrainer(
        name="bf16_re", results_dir=str(out / "results"),
        models_dir=str(out / "models"), image_size=32, network_capacity=4,
        latent_dim=32, style_depth=2, batch_size=2,
        gradient_accumulate_every=1, hist_bin=16, save_every=100,
        num_devices=1, seed=0, precision="bf16", sync_every=3,
    )
    assert t.cfg.precision == "bf16" and t.sync_every == 3
    t.init_GAN()
    t.set_data_src(tiny_dataset, sampling=True)
    t.train(alpha=32, beta=1.5, gamma=4)  # step 0: syncs (0 % 3 == 0)
    first = (t.d_loss, t.g_loss)
    assert all(np.isfinite(v) for v in first)
    t.train(alpha=32, beta=1.5, gamma=4)  # step 1: no sync
    assert (t.d_loss, t.g_loss) == first  # metrics not fetched
    t.train(alpha=32, beta=1.5, gamma=4)  # step 2: no sync (2 % 3 != 0)
    t.train(alpha=32, beta=1.5, gamma=4)  # step 3: syncs
    assert all(np.isfinite(v) for v in (t.d_loss, t.g_loss, t.r_loss))


def test_rehisto_merged_d_forward_matches_unmerged(tmp_path_factory):
    """Non-GP D phase: merged batch-2B forward (steps.MERGE_D_FORWARD)
    must match the reference-shaped two-call form exactly."""
    import jax

    from histogan_tpu.models import (
        Discriminator, HistVectorizer, RecoloringEncoderDecoder,
        RecoloringGAN,
    )
    from histogan_tpu.optim import diffgrad
    from histogan_tpu.parallel import make_mesh, replicate, shard_batch
    from histogan_tpu.train import steps as steps_mod
    from histogan_tpu.train.rehisto_steps import (
        RecolorModels, make_rehisto_train_step,
    )
    from histogan_tpu.train.state import ReHistoGANState
    from histogan_tpu.utils.config import ReHistoGANConfig

    import jax.numpy as jnp

    cfg = ReHistoGANConfig(
        image_size=32, network_capacity=4, latent_dim=32, style_depth=2,
        hist_bin=16, batch_size=4, gradient_accumulate_every=1,
        variance_loss=True,
    )
    ED = RecoloringEncoderDecoder(cfg.image_size, cfg.network_capacity,
                                  cfg.hist_bin, cfg.latent_dim,
                                  cfg.style_depth)
    H = HistVectorizer(cfg.hist_bin, cfg.latent_dim, cfg.style_depth)
    G = RecoloringGAN(cfg.image_size, cfg.latent_dim, cfg.network_capacity)
    D = Discriminator(cfg.image_size, cfg.network_capacity)
    models = RecolorModels(ED, H, G, D)

    ks = jax.random.split(jax.random.PRNGKey(0), 6)
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

    rng = np.random.default_rng(5)
    b = cfg.batch_size
    batch = {
        "d_images": rng.random((1, b, cfg.image_size, cfg.image_size, 3), np.float32),
        "d_hists": rng.random((1, b, 3, cfg.hist_bin, cfg.hist_bin), np.float32),
        "g_images": rng.random((1, b, cfg.image_size, cfg.image_size, 3), np.float32),
        "g_hists": rng.random((1, b, 3, cfg.hist_bin, cfg.hist_bin), np.float32),
    }
    mesh = make_mesh(1)
    key = jax.random.PRNGKey(9)

    results = {}
    for merged in (True, False):
        old = steps_mod.MERGE_D_FORWARD
        steps_mod.MERGE_D_FORWARD = merged
        try:
            # device_get first: the step donates its state buffers, and
            # replicate() may alias already-placed arrays — a donated
            # alias poisons the second iteration's params
            state = replicate(jax.device_get(ReHistoGANState(
                step=jnp.zeros((), jnp.int32), params_g=params_g,
                params_d=params_d, opt_g=g_tx.init(params_g),
                opt_d=d_tx.init(params_d),
            )), mesh)
            step = make_rehisto_train_step(models, g_tx, d_tx, cfg)
            _, m = step(state, shard_batch(batch, mesh, batch_axis=1), key,
                        apply_gp=False, alpha=32.0, beta=1.5, gamma=4.0)
            results[merged] = {k: float(v) for k, v in m.items()}
        finally:
            steps_mod.MERGE_D_FORWARD = old

    for k in results[True]:
        np.testing.assert_allclose(results[True][k], results[False][k],
                                   rtol=1e-6, atol=1e-7, err_msg=k)


def test_rehisto_vq_discriminator_trains(tiny_dataset, tmp_path_factory):
    """fq_layers on the recoloring D: the step must bind the vq_stats
    collection, apply the quantize loss, and update the codebook (this
    crashed with ScopeCollectionNotFound before the r2 fix)."""
    import jax

    out = tmp_path_factory.mktemp("run_vq")
    t = RecoloringTrainer(
        name="vq_re", results_dir=str(out / "results"),
        models_dir=str(out / "models"), image_size=32, network_capacity=4,
        latent_dim=32, style_depth=2, batch_size=2,
        gradient_accumulate_every=1, hist_bin=16, save_every=100,
        num_devices=1, seed=0, fq_layers=(1,), fq_dict_size=32,
    )
    t.init_GAN()
    assert t.state.vq_stats, "VQ codebook stats must be initialized"
    before = np.asarray(jax.device_get(
        jax.tree_util.tree_leaves(t.state.vq_stats)[0]))
    t.set_data_src(tiny_dataset, sampling=True)
    for _ in range(2):
        t.train(alpha=32, beta=1.5, gamma=4)
    assert np.isfinite(t.d_loss) and np.isfinite(t.q_loss)
    after = np.asarray(jax.device_get(
        jax.tree_util.tree_leaves(t.state.vq_stats)[0]))
    assert not np.array_equal(before, after), "codebook EMA must update"


def test_evaluate_post_processing_branches(trainer, tmp_path):
    """Integration coverage for the recoloring evaluate's post-processing
    glue (VERDICT r2 weak #2 / next #3): the BGU-upscale, pyramid-upscale,
    PIL-downscale and MKL-post-recoloring branches
    (rehisto_trainer.py evaluate; reference ReHistoGAN/rehistoGAN.py:1139-1165)
    each drive `generated[0]` through the real file round-trip.

    save_image_grid uses the torchvision layout (2px padding), so a
    single S-px image lands as an (S+4)-px file."""
    rng = np.random.RandomState(5)
    big = (rng.rand(96, 96, 3) * 255).astype(np.uint8)
    big_path = tmp_path / "big.png"
    Image.fromarray(big).save(big_path)

    img = np.asarray(
        Image.open(big_path).resize((64, 64)), np.float32)[None] / 255.0
    hist = np.asarray(
        trainer.pool.sample_interpolated(np.random.default_rng(0), 1),
        np.float32)
    out_dir = trainer.results_dir / "smoke_re"

    # no post-processing: the plain 64px grid (64 + 2*2 padding)
    trainer.evaluate(num=900, image_batch=img, hist_batch=hist,
                     save_input=False)
    assert Image.open(out_dir / "900-generated.jpg").size == (68, 68)

    # upscaling via BGU: output replaced by the reference-resolution image
    trainer.evaluate(num=901, image_batch=img, hist_batch=hist,
                     resizing="upscaling", resizing_method="BGU",
                     input_image_name=str(big_path), save_input=False)
    g = Image.open(out_dir / "901-generated.jpg")
    assert g.size == (100, 100)  # 96 + padding
    assert np.asarray(g).std() > 0  # finite, non-degenerate content

    # upscaling via pyramid (with level blending)
    trainer.evaluate(num=902, image_batch=img, hist_batch=hist,
                     resizing="upscaling", resizing_method="pyramid",
                     pyramid_levels=3, swapping_levels=1, level_blending=True,
                     input_image_name=str(big_path), save_input=False)
    g = Image.open(out_dir / "902-generated.jpg")
    assert g.size == (100, 100)
    assert np.asarray(g).std() > 0

    # downscaling: the saved grid is PIL-resized to the original size
    trainer.evaluate(num=903, image_batch=img, hist_batch=hist,
                     resizing="downscaling", original_size=[32, 48],
                     save_input=False)
    assert Image.open(out_dir / "903-generated.jpg").size == (32, 48)

    # MKL post-recoloring: original-resolution color transfer
    orig = np.asarray(big, np.float32) / 255.0
    trainer.evaluate(num=904, image_batch=img, hist_batch=hist,
                     post_recoloring=True, original_image=orig,
                     save_input=False)
    g = Image.open(out_dir / "904-generated.jpg")
    assert g.size == (100, 100)
    assert np.asarray(g).std() > 0


def test_rehisto_accum1_fast_path_equals_scan(tmp_path_factory):
    """ReHistoGAN accum==1 fast path (no accumulation scan) equals the
    forced-scan path to fp32 tolerance — one step, same fresh state."""
    import jax
    import jax.numpy as jnp

    from histogan_tpu.models import (
        Discriminator, HistVectorizer, RecoloringEncoderDecoder,
        RecoloringGAN,
    )
    from histogan_tpu.optim import diffgrad
    from histogan_tpu.parallel import make_mesh, replicate, shard_batch
    from histogan_tpu.train import steps as steps_mod
    from histogan_tpu.train.rehisto_steps import (
        RecolorModels, make_rehisto_train_step,
    )
    from histogan_tpu.train.state import ReHistoGANState
    from histogan_tpu.utils.config import ReHistoGANConfig

    cfg = ReHistoGANConfig(
        image_size=32, network_capacity=4, latent_dim=32, style_depth=2,
        hist_bin=16, batch_size=2, gradient_accumulate_every=1,
        skip_conn_to_GAN=True, variance_loss=True,
    )
    mesh = make_mesh(2)
    ED = RecoloringEncoderDecoder(cfg.image_size, cfg.network_capacity,
                                  cfg.hist_bin, cfg.latent_dim,
                                  cfg.style_depth, cfg.skip_conn_to_GAN)
    H = HistVectorizer(cfg.hist_bin, cfg.latent_dim, cfg.style_depth)
    G = RecoloringGAN(cfg.image_size, cfg.latent_dim, cfg.network_capacity)
    D = Discriminator(cfg.image_size, cfg.network_capacity)
    models = RecolorModels(ED, H, G, D)
    key = jax.random.PRNGKey(5)
    ks = jax.random.split(key, 5)
    img = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
    hist = jnp.zeros((1, 3, cfg.hist_bin, cfg.hist_bin))
    ed_vars = ED.init(ks[0], img, hist)
    latent, rgb, pl1, pl2 = ED.apply(ed_vars, img, hist)
    params_g = {
        "ED": ed_vars["params"],
        "H": H.init(ks[1], hist)["params"],
        "G": G.init(ks[2], latent, rgb, jnp.zeros((1, cfg.latent_dim)),
                    jnp.zeros((1, cfg.image_size, cfg.image_size, 1)),
                    pl1, pl2)["params"],
    }
    params_d = D.init(ks[3], img)["params"]
    g_tx = diffgrad(cfg.learning_rate, 0.5, 0.9)
    d_tx = diffgrad(cfg.learning_rate, 0.5, 0.9)

    def fresh_state():
        return replicate(ReHistoGANState(
            step=jnp.zeros((), jnp.int32),
            params_g=jax.device_get(params_g),
            params_d=jax.device_get(params_d),
            opt_g=jax.device_get(g_tx.init(params_g)),
            opt_d=jax.device_get(d_tx.init(params_d)),
        ), mesh)

    rng = np.random.RandomState(2)
    norm = lambda h: h / h.sum((2, 3, 4), keepdims=True)
    batch = shard_batch({
        "d_images": rng.rand(1, 2, 32, 32, 3).astype(np.float32),
        "d_hists": norm(rng.rand(1, 2, 3, 16, 16).astype(np.float32)),
        "g_images": rng.rand(1, 2, 32, 32, 3).astype(np.float32),
        "g_hists": norm(rng.rand(1, 2, 3, 16, 16).astype(np.float32)),
    }, mesh, batch_axis=1)

    def run_one(force_scan, gp):
        steps_mod.FORCE_SCAN_ACCUM = force_scan
        try:
            step = make_rehisto_train_step(models, g_tx, d_tx, cfg)
            s, m = step(fresh_state(), batch, ks[4], apply_gp=gp,
                        alpha=32.0, beta=1.5, gamma=4.0)
            return jax.device_get(s), {k: np.asarray(v) for k, v in m.items()}
        finally:
            steps_mod.FORCE_SCAN_ACCUM = False

    # first-order variant: tight state equality (fusion-order epsilon)
    s_fast, m_fast = run_one(False, gp=False)
    s_scan, m_scan = run_one(True, gp=False)
    for k in m_fast:
        np.testing.assert_allclose(m_fast[k], m_scan[k], rtol=2e-5,
                                   atol=1e-5, err_msg=k)
    for a, b in zip(jax.tree_util.tree_leaves(s_fast),
                    jax.tree_util.tree_leaves(s_scan)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = max(float(np.max(np.abs(b))), 1e-6)
        # DiffGrad's first update is sign-sensitive at g~0 (upd ~
        # +/-0.79*lr*sign(g)), so epsilon-level gradient differences
        # legally produce ~lr-sized jumps on isolated entries; anything
        # structural would violate the lr bound everywhere
        tol = max(1e-4 * scale, 2.5 * cfg.learning_rate)
        assert float(np.max(np.abs(a - b))) <= tol

    # second-order (GP) variant amplifies the epsilon: metrics-level
    # agreement is the meaningful check there
    _, m_fast_gp = run_one(False, gp=True)
    _, m_scan_gp = run_one(True, gp=True)
    for k in m_fast_gp:
        np.testing.assert_allclose(m_fast_gp[k], m_scan_gp[k], rtol=1e-4,
                                   atol=1e-4, err_msg=f"{k} (gp)")
