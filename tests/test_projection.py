"""Projection (GAN inversion) tests: loss decreases, artifacts written,
recolor path renders with a swapped histogram."""

import numpy as np
import pytest
from PIL import Image

from histogan_tpu import projection
from histogan_tpu.train import Trainer


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    out = tmp_path_factory.mktemp("proj")
    rng = np.random.RandomState(0)
    img_path = out / "input.jpg"
    arr = np.zeros((64, 64, 3), np.uint8)
    arr[:, :32] = [200, 80, 40]
    arr[:, 32:] = [40, 80, 200]
    arr = np.clip(arr + rng.randint(0, 30, arr.shape), 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(img_path)

    t = Trainer(
        name="proj", results_dir=str(out / "results"),
        models_dir=str(out / "models"), image_size=32, network_capacity=4,
        latent_dim=32, style_depth=2, batch_size=2, hist_bin=16,
        num_devices=1, seed=0,
    )
    t.init_GAN()
    return t, str(img_path), out


@pytest.mark.parametrize("mode", ["gaussian", "latent"])
def test_projection_improves_and_saves(setup, mode, capsys):
    t, img_path, out = setup
    fn = projection.project_gaussian if mode == "gaussian" else projection.project_to_latent
    out_dir = fn(
        t, img_path, results_dir=str(out / f"res_{mode}"),
        num_train_steps=20, learning_rate=0.05, save_every=10,
        vgg_loss_weight=0.0, seed=0, log_every=0,
    )
    assert (out_dir / "input_start.jpg").exists()
    assert (out_dir / "input_final.jpg").exists()
    assert (out_dir / "input_final.npz").exists()

    # loss should decrease: compare start/final renders against the target
    target = np.asarray(Image.open(img_path).resize((32, 32)), np.float32) / 255
    start = np.asarray(Image.open(out_dir / "input_start.jpg"), np.float32) / 255
    final = np.asarray(Image.open(out_dir / "input_final.jpg"), np.float32) / 255
    assert np.abs(final - target).mean() < np.abs(start - target).mean()


@pytest.mark.parametrize("mode", ["gaussian", "latent"])
def test_recolor_projected(setup, mode):
    t, img_path, out = setup
    hist = np.full((1, 3, 16, 16), 1.0 / (3 * 16 * 16), np.float32)
    out_name = projection.recolor_projected(
        t, img_path, hist, "uniform.npy",
        results_dir=str(out / f"res_{mode}"), mode=mode,
        random_styles=[1], seed=2,
    )
    assert out_name.exists()


def test_latent_noise_mode(setup):
    t, img_path, out = setup
    out_dir = projection.project_gaussian(
        t, img_path, results_dir=str(out / "res_ln"),
        latent_noise=True, num_train_steps=4, save_every=4,
        vgg_loss_weight=0.0, seed=0, log_every=0,
    )
    data = np.load(out_dir / "input_final.npz")
    assert "noise1_0" in data and "styles" in data
    out_name = projection.recolor_projected(
        t, img_path, np.full((1, 3, 16, 16), 1 / 768, np.float32), "u.npy",
        results_dir=str(out / "res_ln"), mode="gaussian",
        latent_noise=True, seed=1,
    )
    assert out_name.exists()


def test_run_optimization_masked_chunks_match_per_step():
    """The fixed-length masked-chunk loop (ADVICE r2: one compiled scan
    length instead of one per distinct log/save gap) must reproduce the
    naive per-step loop exactly, including log/save cadence, for a
    deliberately MISALIGNED log_every/save_every pair."""
    import jax
    import jax.numpy as jnp
    import optax

    from histogan_tpu.projection import _run_optimization

    tx = optax.adam(0.1)
    target = jnp.arange(4.0)

    # frozen arrays ride through the jit as the ``consts`` argument
    # (not closure constants — the r3 413 fix)
    def loss_fn(v, c):
        loss = jnp.sum((v["x"] - c["target"]) ** 2)
        return loss, {"loss": loss}

    v0 = {"x": jnp.zeros(4)}
    s0 = tx.init(v0)
    logs, saves = [], []
    v, _ = _run_optimization(
        loss_fn, tx, v0, s0, {"target": target},
        num_train_steps=10, log_every=3, save_every=4,
        on_log=lambda i, aux: logs.append((i, float(aux["loss"]))),
        on_save=lambda i, vv: saves.append(i),
    )

    vr, sr = v0, s0
    ref_losses = []
    for _ in range(10):
        (loss, _aux), g = jax.value_and_grad(
            lambda vv: loss_fn(vv, {"target": target}), has_aux=True)(vr)
        ref_losses.append(float(loss))
        upd, sr = tx.update(g, sr, vr)
        vr = optax.apply_updates(vr, upd)

    np.testing.assert_allclose(np.asarray(v["x"]), np.asarray(vr["x"]),
                               rtol=0, atol=1e-6)
    assert [i for i, _ in logs] == [0, 3, 6, 9]
    for i, loss in logs:
        assert loss == pytest.approx(ref_losses[i], rel=1e-6)
    assert saves == [3, 7]


def test_projection_cli_accepts_full_reference_flag_surface():
    # Every flag of reference projection_gaussian.py:573-712 parses,
    # including --aug_prob (accepted for script compat; .config.json
    # governs model reconstruction here).
    from histogan_tpu.cli.projection_common import build_parser

    args = build_parser("./res").parse_args([
        "--input_image", "a.jpg", "--target_hist", "t.jpg",
        "--aug_prob", "0.5", "--latent_noise", "True",
        "--random_styles", "3", "4", "--vgg_loss_weight", "0.01",
    ])
    assert args.aug_prob == 0.5
    assert args.random_styles == [3, 4]


def test_projection_cli_defaults_match_each_reference_script():
    # ADVICE r4: a migrating user running a BARE projection command must
    # get the reference script's behavior — including where the two
    # reference scripts disagree with each other. Defaults pinned from
    # projection_gaussian.py:587-659 / projection_to_latent.py:632-704.
    from histogan_tpu.cli import projection_gaussian, projection_to_latent
    from histogan_tpu.cli.projection_common import build_parser

    g = build_parser("./res",
                     defaults=projection_gaussian.REFERENCE_DEFAULTS
                     ).parse_args([])
    assert (g.num_train_steps, g.learning_rate) == (1000, 0.1)
    assert (g.save_every, g.style_reg_weight) == (2, 10.0)
    assert g.optimize_noise is False
    assert g.vgg_loss_weight == 0.001
    assert g.hist_resizing == "interpolation"
    assert g.pyramid_levels == 6

    l = build_parser("./res",
                     defaults=projection_to_latent.REFERENCE_DEFAULTS
                     ).parse_args([])
    assert (l.num_train_steps, l.learning_rate) == (2000, 0.1)
    assert (l.save_every, l.style_reg_weight) == (100, 0.0)
    assert l.optimize_noise is False
    assert l.vgg_loss_weight == 0.001


def test_run_optimization_chunk_steps_and_perf_window():
    """r5 load-immune bench protocol: event-free ``chunk_steps``
    boundaries must not change the optimization trajectory or the
    log/save cadence, and ``perf_out`` must report a steady-state window
    covering every step after the first chunk."""
    import jax
    import jax.numpy as jnp
    import optax

    from histogan_tpu.projection import _run_optimization

    tx = optax.adam(0.1)
    target = jnp.arange(4.0)

    def loss_fn(v, c):
        loss = jnp.sum((v["x"] - c["target"]) ** 2)
        return loss, {"loss": loss}

    v0 = {"x": jnp.zeros(4)}
    s0 = tx.init(v0)

    def run(**kw):
        logs, saves = [], []
        v, _ = _run_optimization(
            loss_fn, tx, v0, s0, {"target": target},
            num_train_steps=10, log_every=3, save_every=4,
            on_log=lambda i, aux: logs.append(i),
            on_save=lambda i, vv: saves.append(i), **kw)
        return v, logs, saves

    base_v, base_logs, base_saves = run()
    perf = {}
    v, logs, saves = run(chunk_steps=2, perf_out=perf)
    np.testing.assert_allclose(np.asarray(v["x"]), np.asarray(base_v["x"]),
                               rtol=0, atol=1e-6)
    assert logs == base_logs and saves == base_saves
    # chunk 1 covers step 0 only (log boundary at 0), so the window is
    # the remaining 9 steps
    assert perf["opt_window_steps"] == 9
    assert perf["opt_window_seconds"] > 0
    assert perf["opt_steps_per_sec"] > 0

    # pure chunking, no host events: window = steps after chunk 1
    perf2 = {}
    _run_optimization(
        loss_fn, tx, v0, s0, {"target": target},
        num_train_steps=10, log_every=0, save_every=10,
        on_log=lambda i, aux: None, on_save=lambda i, vv: None,
        chunk_steps=2, perf_out=perf2)
    assert perf2["opt_window_steps"] == 8
