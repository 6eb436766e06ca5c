"""End-to-end smoke train: 8 tiny images, a few steps, finite losses,
checkpoint round-trip, eval grid — the SURVEY.md §4 test plan's
integration slice. Runs on the virtual 8-device CPU mesh (conftest)."""

import os

import numpy as np
import pytest
from PIL import Image

from histogan_tpu.train import NanException, Trainer


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    rng = np.random.RandomState(0)
    for i in range(8):
        arr = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(root / f"{i}.jpg")
    return str(root)


@pytest.fixture(scope="module")
def trainer(tiny_dataset, tmp_path_factory):
    out = tmp_path_factory.mktemp("run")
    t = Trainer(
        name="smoke",
        results_dir=str(out / "results"),
        models_dir=str(out / "models"),
        image_size=32,
        network_capacity=4,
        latent_dim=32,
        style_depth=2,
        batch_size=2,
        gradient_accumulate_every=2,
        hist_bin=16,
        save_every=2,
        num_devices=2,
        seed=0,
    )
    t.init_GAN()
    t.set_data_src(tiny_dataset)
    return t


def test_smoke_train_two_steps(trainer):
    for _ in range(3):  # step 0 exercises gp+pl (second-order grad)
        trainer.train(alpha=2)
    assert np.isfinite(trainer.d_loss)
    assert np.isfinite(trainer.g_loss)
    assert np.isfinite(trainer.h_loss)
    assert trainer.h_loss > 0
    assert trainer.steps == 3


def test_eval_grid_written(trainer):
    imgs = trainer.evaluate(num=99, num_image_tiles=2)
    assert imgs.shape == (4, 32, 32, 3)
    assert (imgs >= 0).all() and (imgs <= 1).all()
    assert (trainer.results_dir / "smoke" / "99-ema.jpg").exists()


def test_checkpoint_roundtrip(trainer):
    trainer.save(7)
    step_before = int(trainer.state.step)
    g_before = np.asarray(
        trainer.state.params_g["G"]["initial_block"]
    ).copy()

    trainer.load(7)
    assert trainer.steps == 7 * trainer.cfg.save_every
    np.testing.assert_array_equal(
        np.asarray(trainer.state.params_g["G"]["initial_block"]), g_before
    )
    assert int(trainer.state.step) == step_before

    # load(-1) picks the max checkpoint number
    trainer.save(9)
    trainer.load(-1)
    assert trainer.steps == 9 * trainer.cfg.save_every


def test_config_json_contract(trainer):
    trainer.write_config()
    cfg_path = trainer.store.config_path
    assert cfg_path.exists()
    import json

    cfg = json.loads(cfg_path.read_text())
    assert set(cfg) == {
        "image_size", "network_capacity", "transparent",
        "fq_layers", "fq_dict_size", "attn_layers",
    }


def test_params_replicated_and_batch_sharded(trainer):
    # parameters live replicated over the mesh; a fresh batch is sharded
    leaf = trainer.state.params_g["G"]["initial_block"]
    assert len(leaf.sharding.device_set) == 2
    assert leaf.sharding.is_fully_replicated

    from histogan_tpu.parallel import shard_batch

    batch = next(trainer.loader)
    sharded = shard_batch(batch, trainer.mesh, batch_axis=1)
    img = sharded["d_images"]
    assert not img.sharding.is_fully_replicated


def test_fid_tracking_wired(trainer):
    """calculate_fid + the calculate_fid_every train hook (VERDICT r1
    item 1): cheap injected extractor proves the wiring; the inception
    extractor itself is oracle-tested in tests/test_inception.py."""

    def cheap_extractor(images):
        x = np.asarray(images, np.float32).reshape(len(images), -1, 3)
        return np.concatenate([x.mean(1), x.std(1), x.max(1)], axis=1)

    trainer._fid_extractor = cheap_extractor
    trainer._fid_scorer = None
    trainer.fid_num_samples = 4
    fid = trainer.calculate_fid()
    assert np.isfinite(fid) and fid >= 0.0
    assert trainer.last_fid == fid
    # real features cached, generated recomputed
    assert trainer._fid_scorer.num_real == 4

    # the train-loop hook: every step with calculate_fid_every=1
    trainer.calculate_fid_every = 1
    # avoid colliding with save/eval cadence oddities: just run one step
    trainer.train(alpha=2)
    scores_file = trainer.results_dir / "smoke" / "fid_scores.txt"
    assert scores_file.exists()
    line = scores_file.read_text().strip().splitlines()[-1]
    step, val, provenance = line.split(",")
    assert np.isfinite(float(val))
    # provenance column (VERDICT r2 missing #3): injected callables are
    # 'custom'; the stock extractors label 'pretrained'/'random-features'
    assert provenance == "custom"
    trainer.calculate_fid_every = None

    from histogan_tpu.metrics.fid import (
        default_extractor, random_inception_extractor,
    )

    assert random_inception_extractor().provenance == "random-features"
    assert default_extractor().provenance in ("random-features", "pretrained")


def test_evaluate_latents_without_noise(trainer):
    """r1 weak #7: evaluate(latents=...) without n crashed; latents and
    noise must default independently (histoGAN/histoGAN.py:1040-1048)."""
    latents = np.random.RandomState(5).randn(4, 32).astype(np.float32)
    imgs = trainer.evaluate(num=None, latents=latents, num_image_tiles=2)
    assert imgs.shape == (4, 32, 32, 3)
    assert np.isfinite(imgs).all()

    noise = np.random.RandomState(6).rand(4, 32, 32, 1).astype(np.float32)
    imgs2 = trainer.evaluate(num=None, n=noise, num_image_tiles=2)
    assert imgs2.shape == (4, 32, 32, 3)


def test_ema_schedule_static_flags(trainer):
    """EMA updates only on-schedule (>20000, every 10th), passes through
    untouched otherwise, and the <=25000 every-1000(+2) reset copies the
    post-update params (histoGAN/histoGAN.py:996-1000) — now host-static
    flags instead of traced where()s."""
    import jax

    leaf = lambda t: np.asarray(jax.device_get(t["G"]["initial_block"]))

    trainer.steps = 20011  # off-schedule
    ema_before = leaf(trainer.state.ema)
    trainer.train(alpha=2)
    np.testing.assert_array_equal(ema_before, leaf(trainer.state.ema))

    trainer.steps = 20020  # on-schedule (and not a reset step)
    ema_pre = leaf(trainer.state.ema)
    trainer.train(alpha=2)
    want = ema_pre * 0.995 + 0.005 * leaf(trainer.state.params_g)
    np.testing.assert_allclose(leaf(trainer.state.ema), want, atol=1e-7)

    trainer.steps = 1002  # reset window
    trainer.train(alpha=2)
    np.testing.assert_array_equal(leaf(trainer.state.ema),
                                  leaf(trainer.state.params_g))


def test_evaluate_latent_file_sizes_noise(trainer, tmp_path):
    """A latent FILE whose row count differs from num_image_tiles**2 must
    size the generated noise to match (r2 review: the r1 fix only
    covered directly-passed latents)."""
    lat = np.random.RandomState(8).randn(3, 32).astype(np.float32)
    f = tmp_path / "lat.npy"
    np.save(f, lat)
    imgs = trainer.evaluate(num=None, load_latent_file=str(f),
                            num_image_tiles=2)
    assert imgs.shape == (3, 32, 32, 3)
    assert np.isfinite(imgs).all()


def test_fid_extractor_missing_weights_raises(monkeypatch):
    """INCEPTION_WEIGHTS pointing at a missing file must raise, not
    silently fall back to random-feature FID."""
    import pytest

    from histogan_tpu.metrics import fid

    monkeypatch.setenv("INCEPTION_WEIGHTS", "/nonexistent/weights.npz")
    with pytest.raises(FileNotFoundError, match="missing file"):
        fid.default_extractor()


def test_split_step_equals_fused():
    """split=True (two XLA programs, the 512px compile fallback —
    VERDICT r2 #2) must reproduce the fused one-program step exactly:
    same key schedule, same metrics, bit-identical parameters, across
    every flag variant including the second-order GP and PL steps."""
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

    cfg = HistoGANConfig(
        image_size=32, network_capacity=4, latent_dim=32, style_depth=2,
        hist_bin=16, batch_size=2, gradient_accumulate_every=2,
    )
    mesh = make_mesh(2)
    S = StyleVectorizer(cfg.latent_dim, cfg.style_depth)
    H = HistVectorizer(cfg.hist_bin, cfg.latent_dim, cfg.style_depth)
    G = Generator(cfg.image_size, cfg.latent_dim, cfg.network_capacity)
    D = Discriminator(cfg.image_size, cfg.network_capacity)
    models = Models(S, H, G, D)
    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 4)
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

    def fresh_state():
        return replicate(HistoGANState(
            step=jnp.zeros((), jnp.int32),
            params_g=jax.device_get(params_g), params_d=jax.device_get(params_d),
            ema=jax.tree_util.tree_map(np.copy, jax.device_get(params_g)),
            opt_g=jax.device_get(g_tx.init(params_g)),
            opt_d=jax.device_get(d_tx.init(params_d)),
            pl_mean=jnp.zeros(()),
        ), mesh)

    rng = np.random.RandomState(0)
    a, b = cfg.gradient_accumulate_every, cfg.batch_size
    norm = lambda h: h / h.sum((2, 3, 4), keepdims=True)
    batch = shard_batch({
        "d_images": rng.rand(a, b, 32, 32, 3).astype(np.float32),
        "d_hists": norm(rng.rand(a, b, 3, 16, 16).astype(np.float32)),
        "g_hists": norm(rng.rand(a, b, 3, 16, 16).astype(np.float32)),
    }, mesh, batch_axis=1)

    fused = make_train_step(models, g_tx, d_tx, cfg, split=False)
    split = make_train_step(models, g_tx, d_tx, cfg, split=True)

    sf, ss = fresh_state(), fresh_state()
    for i, (gp, pl, ema) in enumerate(
            [(True, True, False), (False, False, True), (True, False, False)]):
        k = jax.random.fold_in(key, 10 + i)
        sf, mf = fused(sf, batch, k, apply_gp=gp, apply_pl=pl, apply_ema=ema)
        ss, ms = split(ss, batch, k, apply_gp=gp, apply_pl=pl, apply_ema=ema)
        assert set(mf) == set(ms)
        for name in mf:
            np.testing.assert_allclose(
                np.asarray(mf[name]), np.asarray(ms[name]), rtol=0, atol=0,
                err_msg=f"metric {name} step {i}")
    for pf, ps in zip(jax.tree_util.tree_leaves(jax.device_get(sf)),
                      jax.tree_util.tree_leaves(jax.device_get(ss))):
        np.testing.assert_array_equal(pf, ps)


def test_accum1_fast_path_equals_scan():
    """accum==1 skips the accumulation scan (a while-loop whose carry is
    the full gradient tree — pure HBM traffic); must equal the forced
    scan path exactly, for BOTH step families."""
    import jax
    import jax.numpy as jnp

    from histogan_tpu.models import (
        Discriminator, Generator, HistVectorizer, StyleVectorizer,
    )
    from histogan_tpu.optim import diffgrad
    from histogan_tpu.parallel import make_mesh, replicate, shard_batch
    from histogan_tpu.train import steps as steps_mod
    from histogan_tpu.train.state import HistoGANState
    from histogan_tpu.train.steps import Models, make_train_step
    from histogan_tpu.utils.config import HistoGANConfig

    cfg = HistoGANConfig(
        image_size=32, network_capacity=4, latent_dim=32, style_depth=2,
        hist_bin=16, batch_size=2, gradient_accumulate_every=1,
    )
    mesh = make_mesh(2)
    S = StyleVectorizer(cfg.latent_dim, cfg.style_depth)
    H = HistVectorizer(cfg.hist_bin, cfg.latent_dim, cfg.style_depth)
    G = Generator(cfg.image_size, cfg.latent_dim, cfg.network_capacity)
    D = Discriminator(cfg.image_size, cfg.network_capacity)
    models = Models(S, H, G, D)
    key = jax.random.PRNGKey(9)
    ks = jax.random.split(key, 4)
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

    def fresh_state():
        return replicate(HistoGANState(
            step=jnp.zeros((), jnp.int32),
            params_g=jax.device_get(params_g), params_d=jax.device_get(params_d),
            ema=jax.tree_util.tree_map(np.copy, jax.device_get(params_g)),
            opt_g=jax.device_get(g_tx.init(params_g)),
            opt_d=jax.device_get(d_tx.init(params_d)),
            pl_mean=jnp.zeros(()),
        ), mesh)

    rng = np.random.RandomState(1)
    norm = lambda h: h / h.sum((2, 3, 4), keepdims=True)
    batch = shard_batch({
        "d_images": rng.rand(1, 2, 32, 32, 3).astype(np.float32),
        "d_hists": norm(rng.rand(1, 2, 3, 16, 16).astype(np.float32)),
        "g_hists": norm(rng.rand(1, 2, 3, 16, 16).astype(np.float32)),
    }, mesh, batch_axis=1)

    def run_one(force_scan, gp, pl):
        """ONE step from the same fresh state — no trajectory
        compounding (any epsilon diverges chaotically over steps)."""
        steps_mod.FORCE_SCAN_ACCUM = force_scan
        try:
            step = make_train_step(models, g_tx, d_tx, cfg)
            s, m = step(fresh_state(), batch, jax.random.fold_in(key, 3),
                        apply_gp=gp, apply_pl=pl)
            return jax.device_get(s), {k: np.asarray(v) for k, v in m.items()}
        finally:
            steps_mod.FORCE_SCAN_ACCUM = False

    # the math is identical ((0+g)/1 == g); XLA fuses the while-loop body
    # differently than inline code, so reductions differ at fp32 epsilon
    # (amplified by the second-order GP term)
    for gp, pl in [(True, True), (False, False)]:
        s_fast, m_fast = run_one(False, gp, pl)
        s_scan, m_scan = run_one(True, gp, pl)
        for k in m_fast:
            np.testing.assert_allclose(m_fast[k], m_scan[k], rtol=2e-5,
                                       atol=1e-6, err_msg=f"{k} gp={gp}")
        for a, b in zip(jax.tree_util.tree_leaves(s_fast),
                        jax.tree_util.tree_leaves(s_scan)):
            a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
            scale = max(float(np.max(np.abs(b))), 1e-6)
            # DiffGrad's first update is sign-sensitive at g~0 (upd ~
            # +/-0.79*lr*sign(g)): epsilon gradient differences legally
            # make ~lr-sized jumps on isolated entries
            tol = max(1e-4 * scale, 2.5 * cfg.learning_rate)
            assert float(np.max(np.abs(a - b))) <= tol, (
                f"leaf mismatch gp={gp}: max|d|={np.max(np.abs(a-b))}, "
                f"scale={scale}")


def test_compile_failure_heuristic_matches_observed_errors():
    """The split-step fallback heuristic must match the error the dev
    tunnel's compile helper ACTUALLY raises on this jaxlib — a
    JaxRuntimeError (older jaxlibs: XlaRuntimeError), observed live at
    512px b16 fused +gp (scripts/probe512_ema.py) — and must NOT match
    ordinary runtime errors."""
    import jax

    from histogan_tpu.train.trainer import _looks_like_compile_failure

    real = jax.errors.JaxRuntimeError(
        "INTERNAL: http://127.0.0.1:8113/remote_compile: HTTP 500: "
        "tpu_compile_helper subprocess exit code 1")
    assert _looks_like_compile_failure(real)
    oom = jax.errors.JaxRuntimeError(
        "RESOURCE_EXHAUSTED: Error allocating device buffer: out of memory")
    assert _looks_like_compile_failure(oom)
    # wrong type: never matches even with compile-ish words
    assert not _looks_like_compile_failure(ValueError("internal http 500"))
    # right type, runtime-shaped message: no match
    assert not _looks_like_compile_failure(
        jax.errors.JaxRuntimeError("INVALID_ARGUMENT: shapes differ"))
