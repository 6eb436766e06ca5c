"""Tests for DiffAugment, DiffGrad, filters and loss formulas."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from histogan_tpu.ops import filters, losses
from histogan_tpu.ops.diffaugment import (
    aug_wrapper,
    diff_augment,
    rand_brightness,
    rand_cutout,
    rand_offset,
    rand_translation,
)
from histogan_tpu.optim import diffgrad


# ------------------------------------------------------------- filters
def _torch_conv(x_nhwc, w_oihw, padding, groups=1):
    import torch
    import torch.nn.functional as F

    x = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))
    out = F.conv2d(x, torch.from_numpy(w_oihw), padding=padding, groups=groups)
    return np.transpose(out.numpy(), (0, 2, 3, 1))


def test_laplacian_matches_reference_conv():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 10, 12, 3).astype(np.float32)
    got = np.asarray(filters.laplacian_op(x))
    lap = np.array([[0, 1, 0], [1, -4, 1], [0, 1, 0]], np.float32)
    w = np.broadcast_to(lap, (1, 3, 3, 3)).copy()  # (1,C,3,3) summed-channel quirk
    want = _torch_conv(x, w, padding=1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sobel_matches_reference_conv():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 8, 8, 3).astype(np.float32)
    sx = np.array([[1, 0, -1], [2, 0, -2], [1, 0, -1]], np.float32)
    w = np.broadcast_to(sx, (1, 3, 3, 3)).copy()
    np.testing.assert_allclose(
        np.asarray(filters.sobel_op(x, 0)), _torch_conv(x, w, padding=1), atol=1e-5
    )


def test_gaussian_blur_depthwise_valid():
    rng = np.random.RandomState(2)
    x = rng.randn(1, 20, 20, 3).astype(np.float32)
    k = np.asarray(filters.gaussian_kernel(15, 5.0))
    got = np.asarray(filters.gaussian_op(x, jnp.asarray(k)))
    assert got.shape == (1, 6, 6, 3)  # VALID padding shrink, reference quirk
    w = np.broadcast_to(k, (3, 1, 15, 15)).copy().astype(np.float32)
    want = _torch_conv(x, w, padding=0, groups=3)
    np.testing.assert_allclose(got, want, atol=1e-5)
    np.testing.assert_allclose(k.sum(), 1.0, atol=1e-6)


# ---------------------------------------------------------- diffaugment
def test_diffaugment_deterministic_given_key():
    x = jnp.asarray(np.random.RandomState(0).rand(4, 16, 16, 3), jnp.float32)
    k = jax.random.PRNGKey(3)
    a = diff_augment(k, x, ("color", "translation", "cutout"))
    b = diff_augment(k, x, ("color", "translation", "cutout"))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = diff_augment(jax.random.PRNGKey(4), x, ("color", "translation", "cutout"))
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 0


def test_translation_preserves_content():
    x = jnp.asarray(np.random.RandomState(1).rand(2, 8, 8, 3), jnp.float32)
    out = np.asarray(rand_translation(jax.random.PRNGKey(0), x))
    assert out.shape == x.shape
    # translated content is a subset of original values plus zero padding
    orig = set(np.round(np.asarray(x).ravel(), 6))
    new = set(np.round(out.ravel(), 6)) - {0.0}
    assert new.issubset(orig)


def test_cutout_zeroes_half_size_box():
    x = jnp.ones((3, 16, 16, 3))
    out = np.asarray(rand_cutout(jax.random.PRNGKey(1), x))
    zeros_per_sample = (out[..., 0] == 0).sum(axis=(1, 2))
    assert (zeros_per_sample > 0).all()
    assert (zeros_per_sample <= 8 * 8).all()


def test_offset_rolls_content():
    x = jnp.asarray(np.random.RandomState(2).rand(2, 8, 8, 3), jnp.float32)
    out = np.asarray(rand_offset(jax.random.PRNGKey(2), x))
    np.testing.assert_allclose(
        np.sort(out.ravel()), np.sort(np.asarray(x).ravel()), atol=1e-6
    )


def test_brightness_per_sample():
    x = jnp.zeros((4, 4, 4, 3))
    out = np.asarray(rand_brightness(jax.random.PRNGKey(5), x))
    per_sample = out.reshape(4, -1)
    assert len(np.unique(per_sample[:, 0])) == 4  # independent per sample
    assert (per_sample.std(axis=1) < 1e-6).all()  # constant within sample


def test_aug_wrapper_prob_zero_identity():
    x = jnp.asarray(np.random.RandomState(3).rand(2, 8, 8, 3), jnp.float32)
    out = aug_wrapper(jax.random.PRNGKey(0), x, 0.0, ("color",))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


# ------------------------------------------------------------- diffgrad
def test_diffgrad_matches_numpy_oracle():
    lr, b1, b2, eps = 1e-2, 0.5, 0.9, 1e-8
    tx = diffgrad(lr, b1, b2, eps)
    rng = np.random.RandomState(0)
    p = jnp.asarray(rng.randn(5), jnp.float32)
    state = tx.init(p)

    # numpy oracle of torch_optimizer's diffgrad update rule
    m = np.zeros(5)
    v = np.zeros(5)
    prev = np.zeros(5)
    p_np = np.asarray(p, np.float64)

    for step in range(1, 4):
        g = rng.randn(5).astype(np.float32)
        updates, state = tx.update(jnp.asarray(g), state, p)
        p = p + updates

        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        dfc = 1.0 / (1.0 + np.exp(-np.abs(prev - g)))
        prev = g.astype(np.float64)
        step_size = lr * np.sqrt(1 - b2 ** step) / (1 - b1 ** step)
        p_np = p_np - step_size * dfc * m / (np.sqrt(v) + eps)

    np.testing.assert_allclose(np.asarray(p), p_np, rtol=1e-5)


def test_diffgrad_first_step_half_adam():
    """With zero previous grad and |g| large, dfc->1 (adam-like); with g
    tiny, dfc->0.5 (half step)."""
    tx = diffgrad(1.0, 0.5, 0.9, 0.0)
    p = jnp.zeros(2)
    state = tx.init(p)
    g = jnp.asarray([100.0, 1e-9])
    updates, _ = tx.update(g, state, p)
    u = np.asarray(updates)
    # direction: -lr * dfc * mhat/sqrt(vhat) = -lr*dfc (adam ratio 1 at step 1)
    assert abs(u[0] + 1.0) < 1e-3       # dfc ~ 1
    assert abs(u[1] + 0.5) < 1e-3       # dfc ~ 0.5


def test_diffgrad_bf16_state_tracks_fp32():
    """state_dtype=bf16 stores the moment/previous-grad trees in bf16
    (the HBM-traffic knob, optim/diffgrad.py) but keeps update math
    fp32: updates must stay within bf16 rounding (~0.5%) of the fp32-
    state run, state leaves must actually be bf16, and the flat and
    per-leaf forms must agree with each other exactly."""
    import jax
    import jax.numpy as jnp

    from histogan_tpu.optim import diffgrad

    params = {
        "a": jnp.asarray(np.random.RandomState(0).randn(4, 6), jnp.float32),
        "b": jnp.asarray(np.random.RandomState(1).randn(9), jnp.float32),
    }
    tx32 = diffgrad(1e-2, 0.5, 0.9)
    tx16 = diffgrad(1e-2, 0.5, 0.9, state_dtype=jnp.bfloat16)
    tx16f = diffgrad(1e-2, 0.5, 0.9, state_dtype=jnp.bfloat16, flat=True)
    s32, s16, s16f = tx32.init(params), tx16.init(params), tx16f.init(params)

    for leaf in jax.tree_util.tree_leaves(
            (s16.exp_avg, s16.exp_avg_sq, s16.previous_grad)):
        assert leaf.dtype == jnp.bfloat16
    assert s16f.exp_avg.dtype == jnp.bfloat16

    p32 = p16 = p16f = params
    for i in range(5):
        g = jax.tree_util.tree_map(
            lambda x: jnp.asarray(np.random.RandomState(20 + i).randn(*x.shape),
                                  jnp.float32), params)
        u32, s32 = tx32.update(g, s32, p32)
        u16, s16 = tx16.update(g, s16, p16)
        u16f, s16f = tx16f.update(g, s16f, p16f)
        for a, b in zip(jax.tree_util.tree_leaves(u16),
                        jax.tree_util.tree_leaves(u32)):
            # update magnitudes are lr-scaled; bf16 moments cost ~8
            # mantissa bits of the stored state, not of the math
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0.05, atol=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(u16),
                        jax.tree_util.tree_leaves(u16f)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-6, atol=1e-8)
        assert all(leaf.dtype == jnp.float32
                   for leaf in jax.tree_util.tree_leaves(u16))
        p32 = jax.tree_util.tree_map(jnp.add, p32, u32)
        p16 = jax.tree_util.tree_map(jnp.add, p16, u16)
        p16f = jax.tree_util.tree_map(jnp.add, p16f, u16f)

    for a, b in zip(jax.tree_util.tree_leaves(p16),
                    jax.tree_util.tree_leaves(p32)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0.02, atol=2e-4)


# --------------------------------------------------------------- losses
def test_hellinger_formula():
    rng = np.random.RandomState(0)
    t = rng.rand(3, 3, 8, 8).astype(np.float32)
    g = rng.rand(3, 3, 8, 8).astype(np.float32)
    got = float(losses.hellinger_histogram_loss(t, g, alpha=2.0))
    want = 2.0 / np.sqrt(2.0) * np.sqrt(((np.sqrt(t) - np.sqrt(g)) ** 2).sum()) / 3
    assert abs(got - want) < 1e-5


def test_hellinger_per_image_weight_shrinks_as_inv_sqrt_batch():
    """Documents the reference loss's batch-scaling hazard (DESIGN.md
    "Hellinger loss batch scaling"): sqrt-of-batch-sum / B means a batch
    of B identical pairs scores 1/sqrt(B) of the single-pair loss, so
    the per-image hist gradient dilutes at large batch while rec/adv
    (means) do not. quality_run_rehisto.py::hist_alpha_for_batch
    compensates with alpha * sqrt(B / 2)."""
    rng = np.random.RandomState(1)
    t = rng.rand(1, 3, 8, 8).astype(np.float32)
    g = rng.rand(1, 3, 8, 8).astype(np.float32)
    one = float(losses.hellinger_histogram_loss(t, g, alpha=32.0))
    for b in (2, 16, 32):
        rep = float(losses.hellinger_histogram_loss(
            np.repeat(t, b, 0), np.repeat(g, b, 0), alpha=32.0))
        np.testing.assert_allclose(rep, one / np.sqrt(b), rtol=1e-5)
    # the compensation restores the single-pair magnitude up to the
    # reference's own B=2 baseline factor
    comp = float(losses.hellinger_histogram_loss(
        np.repeat(t, 32, 0), np.repeat(g, 32, 0),
        alpha=32.0 * np.sqrt(32 / 2)))
    np.testing.assert_allclose(
        comp, one / np.sqrt(2), rtol=1e-5)


def test_hinge_divergence():
    real = jnp.asarray([-2.0, 0.5])
    fake = jnp.asarray([3.0, 0.0])
    got = float(losses.hinge_divergence(real, fake))
    want = np.mean([0.0 + 0.0, 1.5 + 1.0])
    assert abs(got - want) < 1e-6


def test_gradient_penalty_linear_function():
    # D(x) = 2*sum(x) -> grad norm = 2*sqrt(N); penalty = 10*(2sqrtN-1)^2
    x = jnp.ones((2, 4, 4, 3))
    gp = float(losses.gradient_penalty(lambda im: 2.0 * im.sum(axis=(1, 2, 3)), x))
    n = 4 * 4 * 3
    want = 10.0 * (2 * np.sqrt(n) - 1) ** 2
    assert abs(gp - want) / want < 1e-5


def test_variance_loss_quirk_shapes():
    rng = np.random.RandomState(0)
    hist = jnp.asarray(rng.rand(2, 3, 16, 16), jnp.float32)
    hist_of_hist = jnp.asarray(rng.rand(2, 3, 16, 16), jnp.float32)
    xin = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)
    xgen = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)
    k = filters.gaussian_kernel(15, 5.0)
    v = float(losses.variance_loss(hist, hist_of_hist, xin, xgen, k, beta=1.5))
    assert np.isfinite(v)
    assert v <= 0  # negative sign encourages color change


def test_diffgrad_flat_matches_per_leaf():
    """flat=True (single-fusion state layout) must be numerically
    identical to the per-leaf form on a real pytree over several steps."""
    import jax
    import jax.numpy as jnp

    from histogan_tpu.optim import diffgrad

    params = {
        "a": jnp.asarray(np.random.RandomState(0).randn(3, 5), jnp.float32),
        "b": {"w": jnp.asarray(np.random.RandomState(1).randn(7), jnp.float32),
              "x": jnp.asarray(np.random.RandomState(2).randn(2, 2, 2), jnp.float32)},
    }
    tx_f = diffgrad(1e-2, 0.5, 0.9, flat=True)
    tx_l = diffgrad(1e-2, 0.5, 0.9, flat=False)
    sf, sl = tx_f.init(params), tx_l.init(params)
    pf = pl = params
    for i in range(4):
        g = jax.tree_util.tree_map(
            lambda x: jnp.asarray(np.random.RandomState(10 + i).randn(*x.shape),
                                  jnp.float32), params)
        uf, sf = tx_f.update(g, sf, pf)
        ul, sl = tx_l.update(g, sl, pl)
        for a, b in zip(jax.tree_util.tree_leaves(uf),
                        jax.tree_util.tree_leaves(ul)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        pf = jax.tree_util.tree_map(jnp.add, pf, uf)
        pl = jax.tree_util.tree_map(jnp.add, pl, ul)
