"""Pallas histogram kernel vs the XLA reference path (interpret mode on
CPU; the same kernel compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from histogan_tpu.ops.histogram import histogram_feature
from histogan_tpu.ops.histogram_pallas import histogram_feature_pallas
from histogan_tpu.ops.losses import hellinger_histogram_loss


def _img(b=2, s=64, seed=0):
    return jnp.asarray(np.random.RandomState(seed).rand(b, s, s, 3), jnp.float32)


def test_forward_matches_xla():
    x = _img()
    want = histogram_feature(x, resizing="sampling")
    got = histogram_feature_pallas(x, resizing="sampling", interpret=True)
    assert float(jnp.abs(want - got).max()) < 1e-6


def test_forward_with_resize_and_padding():
    # 90x70 -> interpolation resize quirk + non-TILE-multiple pixel count
    x = jnp.asarray(np.random.RandomState(1).rand(1, 170, 190, 3), jnp.float32)
    want = histogram_feature(x, resizing="interpolation")
    got = histogram_feature_pallas(x, resizing="interpolation", interpret=True)
    assert float(jnp.abs(want - got).max()) < 1e-6


def test_gradient_matches_xla():
    x = _img(1, 48, seed=2)
    target = histogram_feature(_img(1, 48, seed=3))

    def loss_xla(x):
        return hellinger_histogram_loss(
            target, histogram_feature(jax.nn.relu(x)))

    def loss_pl(x):
        return hellinger_histogram_loss(
            target, histogram_feature_pallas(jax.nn.relu(x), interpret=True))

    g_xla = jax.grad(loss_xla)(x)
    g_pl = jax.grad(loss_pl)(x)
    denom = float(jnp.abs(g_xla).max())
    assert float(jnp.abs(g_xla - g_pl).max()) / denom < 1e-4
