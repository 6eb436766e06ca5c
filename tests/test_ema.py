"""ema_dtype='bf16' EMA storage knob.

Covers: the stochastic-rounding primitive (ops/rounding.py), the
truncation-stall failure mode SR exists to avoid, and the Trainer
integration — bf16 EMA through step / schedule / reset / eval /
checkpoint, plus the pin that the knob leaves the parameter key stream
untouched (steps.py derives the SR key via fold_in, not split).

The reference keeps every buffer fp32 (EMA_k, histoGAN/histoGAN.py:
996-1000); this knob is a TPU HBM-residency/traffic option with
documented quantization cost.
"""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from histogan_tpu.ops.rounding import (
    stochastic_round_bf16,
    tree_stochastic_round_bf16,
)
from histogan_tpu.train import Trainer

ULP_REL = 2.0 ** -7  # bf16 ulp(x) <= |x| * 2^-7 for normal x


# --------------------------------------------------------- primitive
def test_sr_exact_for_bf16_representable():
    vals = jnp.array([0.0, 1.0, -1.0, 2.5, -0.15625, 384.0], jnp.float32)
    assert np.all(np.asarray(vals.astype(jnp.bfloat16), jnp.float32) ==
                  np.asarray(vals))  # all exactly representable
    for s in range(5):
        out = stochastic_round_bf16(vals, jax.random.PRNGKey(s))
        np.testing.assert_array_equal(
            np.asarray(out, jnp.float32), np.asarray(vals))


def test_sr_rejects_non_fp32():
    with pytest.raises(TypeError):
        stochastic_round_bf16(jnp.zeros((3,), jnp.bfloat16),
                              jax.random.PRNGKey(0))


def test_sr_lands_on_neighbours_and_is_unbiased():
    # x sits 30% of the way between bf16 neighbours 1.0 and 1.0078125
    lo, hi = 1.0, 1.0 + 2.0 ** -7
    x = np.float32(lo + 0.3 * (hi - lo))
    keys = jax.random.split(jax.random.PRNGKey(42), 20000)
    outs = jax.vmap(
        lambda k: stochastic_round_bf16(jnp.full((1,), x), k)[0]
    )(keys)
    outs = np.asarray(outs, np.float32)
    assert set(np.unique(outs)) == {np.float32(lo), np.float32(hi)}
    # E[out] == x; se(mean) ~ ulp*sqrt(p(1-p)/n) ~ 2.5e-5
    assert abs(outs.mean() - float(x)) < 2e-4


def test_sr_carry_across_binade():
    # just below 2.0: neighbours are 1.9921875 and 2.0 — the mantissa
    # carry must bump the exponent, not wrap
    x = np.float32(2.0 - 0.25 * 2.0 ** -7)
    keys = jax.random.split(jax.random.PRNGKey(7), 4000)
    outs = np.asarray(jax.vmap(
        lambda k: stochastic_round_bf16(jnp.full((1,), x), k)[0]
    )(keys), np.float32)
    assert set(np.unique(outs)) == {np.float32(1.9921875), np.float32(2.0)}
    assert abs(outs.mean() - float(x)) < 2e-4


def test_sr_negative_unbiased():
    x = np.float32(-(1.0 + 0.7 * 2.0 ** -7))
    keys = jax.random.split(jax.random.PRNGKey(3), 20000)
    outs = np.asarray(jax.vmap(
        lambda k: stochastic_round_bf16(jnp.full((1,), x), k)[0]
    )(keys), np.float32)
    assert abs(outs.mean() - float(x)) < 2e-4


def test_tree_sr_distinct_keys_per_leaf():
    tree = {"a": jnp.full((64,), 1.001, jnp.float32),
            "b": jnp.full((64,), 1.001, jnp.float32)}
    out = tree_stochastic_round_bf16(tree, jax.random.PRNGKey(0))
    a = np.asarray(out["a"], np.float32)
    b = np.asarray(out["b"], np.float32)
    assert out["a"].dtype == jnp.bfloat16
    # same values, different per-leaf keys -> different rounding draws
    assert not np.array_equal(a, b)


# ------------------------------------------------- why SR (stall mode)
def _ema_loop(n, store):
    e = np.float32(1.0)
    for i in range(n):
        e = store(np.float32(e * 0.995 + 0.005 * 1.3), i)
    return float(e)


def test_bf16_truncation_ema_stalls():
    """Round-to-nearest bf16 EMA parks at its start: the 0.5% increment
    toward the target is under bf16's half-ulp at this distance, so the
    store rounds it away EVERY step — the documented reason ema_dtype
    uses stochastic rounding (ops/rounding.py docstring)."""
    def rtn(x, _):
        return np.float32(jnp.asarray(x).astype(jnp.bfloat16))

    assert _ema_loop(500, rtn) == 1.0  # never moved


def test_bf16_sr_ema_converges():
    """The SR store is unbiased, so the same EMA reaches its target; the
    stationary jitter is ~5 ulp (documented in ops/rounding.py), so we
    check the time-average of the tail."""
    tail = []

    def sr(x, i):
        v = stochastic_round_bf16(jnp.full((1,), x),
                                  jax.random.PRNGKey(i))[0]
        v = np.float32(v)
        if i >= 2000:
            tail.append(float(v))
        return v

    _ema_loop(4000, sr)
    assert abs(np.mean(tail) - 1.3) < 0.08  # vs the RTN stall at 1.0


# ---------------------------------------------------------- Trainer
@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    rng = np.random.RandomState(0)
    for i in range(6):
        arr = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(root / f"{i}.jpg")
    return str(root)


def _make_trainer(tmp, tiny_dataset, **kw):
    t = Trainer(
        name="ema", results_dir=str(tmp / "results"),
        models_dir=str(tmp / f"models_{kw.get('ema_dtype')}"),
        image_size=32, network_capacity=4, latent_dim=32, style_depth=2,
        batch_size=2, gradient_accumulate_every=1, hist_bin=16,
        save_every=1000, num_devices=1, seed=0, **kw,
    )
    t.init_GAN()
    t.set_data_src(tiny_dataset)
    return t


@pytest.fixture(scope="module")
def trainers(tiny_dataset, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("run")
    return (_make_trainer(tmp, tiny_dataset, ema_dtype="bf16"),
            _make_trainer(tmp, tiny_dataset))


def test_ema_dtype_validated():
    with pytest.raises(ValueError):
        Trainer(name="x", results_dir="/tmp/x", models_dir="/tmp/x",
                ema_dtype="fp16")


def _leaves(tree):
    return jax.tree_util.tree_leaves(tree)


def test_bf16_ema_init_and_on_schedule_step(trainers):
    t, _ = trainers
    assert all(x.dtype == jnp.bfloat16 for x in _leaves(t.state.ema))

    t.steps = 20020  # on-schedule, not a reset step
    ema_pre = jax.device_get(
        jax.tree_util.tree_map(lambda x: np.asarray(x, np.float32),
                               t.state.ema))
    t.train(alpha=2)
    assert np.isfinite(t.d_loss) and np.isfinite(t.g_loss)
    assert all(x.dtype == jnp.bfloat16 for x in _leaves(t.state.ema))
    # each stored leaf is a bf16 NEIGHBOUR of the exact fp32 EMA value
    params = jax.device_get(t.state.params_g)
    got = jax.tree_util.tree_map(lambda x: np.asarray(x, np.float32),
                                 jax.device_get(t.state.ema))
    moved = 0
    for e0, p, g in zip(_leaves(ema_pre), _leaves(params), _leaves(got)):
        want = e0 * 0.995 + 0.005 * np.asarray(p, np.float32)
        assert np.all(np.abs(g - want) <= np.abs(want) * ULP_REL + 1e-6)
        moved += int(not np.array_equal(g, e0))
    assert moved > 0  # the EMA actually progressed despite bf16 storage


def test_bf16_ema_off_schedule_untouched(trainers):
    t, _ = trainers
    t.steps = 20011
    before = jax.device_get(
        jax.tree_util.tree_map(np.asarray, t.state.ema))
    t.train(alpha=2)
    after = jax.device_get(jax.tree_util.tree_map(np.asarray, t.state.ema))
    for a, b in zip(_leaves(before), _leaves(after)):
        np.testing.assert_array_equal(a, b)


def test_bf16_ema_reset_is_cast_of_params(trainers):
    t, _ = trainers
    t.steps = 1002  # reset window (<=25000, %1000==2)
    t.train(alpha=2)
    params = jax.device_get(t.state.params_g)
    ema = jax.device_get(t.state.ema)
    for p, e in zip(_leaves(params), _leaves(ema)):
        assert np.asarray(e).dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(e), np.asarray(jnp.asarray(p).astype(jnp.bfloat16)))


def test_param_stream_unchanged_by_ema_dtype(trainers, tiny_dataset):
    """The SR key is fold_in-derived, so params after an on-schedule
    step are BIT-IDENTICAL between ema_dtype fp32 and bf16 — the knob
    cannot perturb training itself (regression pin for the key
    plumbing in steps.py run_g_phase)."""
    t_bf16, t_fp32 = trainers
    # fresh states, identical keys, and a RESET data source (the bf16
    # trainer's loader was advanced by earlier tests in this module)
    for t in (t_bf16, t_fp32):
        t.steps = 20020
        t._key = jax.random.PRNGKey(123)
        t.init_GAN()
        t.set_data_src(tiny_dataset)
        t.train(alpha=2)
    for a, b in zip(_leaves(jax.device_get(t_bf16.state.params_g)),
                    _leaves(jax.device_get(t_fp32.state.params_g))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bf16_ema_eval_and_checkpoint_roundtrip(trainers, tmp_path):
    t, _ = trainers
    # _ema_params upcasts for the eval path
    up = t._ema_params()
    assert all(x.dtype == jnp.float32 for x in _leaves(up))
    imgs = t.evaluate(num=7, num_image_tiles=2)
    assert imgs.shape == (4, 32, 32, 3)
    assert np.isfinite(np.asarray(imgs)).all()

    t.save(3)
    restored = t.store.restore(3, t.state)
    for a, b in zip(_leaves(restored.ema), _leaves(t.state.ema)):
        assert np.asarray(a).dtype == jnp.bfloat16
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fp32_checkpoint_loads_into_bf16_trainer(trainers):
    """Resuming an fp32-EMA checkpoint with --ema_dtype bf16 casts on
    restore (orbax restore_args carry the template dtype)."""
    t_bf16, t_fp32 = trainers
    t_fp32.save(5)
    restored = t_fp32.store.restore(5, t_bf16.state)
    for x in _leaves(restored.ema):
        assert np.asarray(x).dtype == jnp.bfloat16
