"""BGU (bilateral guided upsampling) correctness tests."""

import numpy as np

from histogan_tpu.post.bgu import (
    bgu_fit,
    bgu_slice,
    bgu_upsample,
    default_grid_size,
    rgb2luminance,
)
from histogan_tpu.post.imresize import imresize


def _image(h=96, w=80):
    rng = np.random.RandomState(0)
    y, x = np.mgrid[0:h, 0:w]
    img = np.stack(
        [np.sin(x / 9.0) * 0.5 + 0.5,
         (y / h) * 0.8 + 0.1,
         ((x + y) % 17) / 17.0],
        axis=-1,
    )
    return np.clip(img + rng.rand(h, w, 3) * 0.05, 0, 1)


def test_default_grid_size():
    img = np.zeros((160, 320, 3))
    out = np.zeros((160, 320, 3))
    assert default_grid_size(img, out) == (10, 20, 8, 3, 4)


def test_luminance():
    img = np.ones((4, 4, 3)) * np.array([0.2, 0.4, 0.8])
    np.testing.assert_allclose(rgb2luminance(img), 0.25 * 0.2 + 0.5 * 0.4 + 0.25 * 0.8)


def test_identity_operator_recovered():
    img = _image()
    ds = imresize(img, output_shape=(32, 28))
    out = bgu_upsample(img, ds)
    assert np.abs(out - img).max() < 1e-6


def test_affine_operator_recovered():
    """A global affine color transform should be fit (near-)exactly."""
    img = _image()
    m = np.array([[0.7, 0.1, 0.0], [0.0, 0.8, 0.1], [0.2, 0.0, 0.6]])
    bias = np.array([0.05, 0.0, 0.1])
    ds_in = imresize(img, output_shape=(32, 28))
    ds_out = np.clip(ds_in @ m.T + bias, 0, 1)
    out = bgu_upsample(img, ds_out)
    want = np.clip(img @ m.T + bias, 0, 1)
    assert np.abs(out - want).mean() < 1e-3


def test_fit_slice_shapes():
    img = _image(64, 64)
    edge = rgb2luminance(img)
    gamma = bgu_fit(img, edge, img * 0.5)
    assert gamma.shape == (4, 4, 8, 3, 4)
    out = bgu_slice(gamma, img, edge)
    assert out.shape == img.shape
    assert np.isfinite(out).all()


def test_weighted_fit():
    img = _image(48, 48)
    edge = rgb2luminance(img)
    w = np.ones_like(img)
    g1 = bgu_fit(img, edge, img, weight_ds=w)
    g2 = bgu_fit(img, edge, img)
    np.testing.assert_allclose(g1, g2, atol=1e-8)
