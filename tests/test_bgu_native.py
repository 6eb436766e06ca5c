"""Native (C++) BGU solver: parity with the scipy path and operator
recovery."""

import shutil

import numpy as np
import pytest

if shutil.which("g++") is None:
    pytest.skip("g++ not available", allow_module_level=True)

from histogan_tpu.post.bgu import bgu_fit, bgu_slice, bgu_upsample, rgb2luminance
from histogan_tpu.post.bgu_native import (
    bgu_fit_native,
    bgu_slice_native,
    bgu_upsample_native,
)
from histogan_tpu.post.imresize import imresize


def _image(h=96, w=80):
    rng = np.random.RandomState(0)
    y, x = np.mgrid[0:h, 0:w]
    img = np.stack([np.sin(x / 9.0) * 0.5 + 0.5, (y / h) * 0.8 + 0.1,
                    ((x + y) % 17) / 17.0], axis=-1)
    return np.clip(img + rng.rand(h, w, 3) * 0.05, 0, 1)


def test_native_affine_recovery():
    img = _image()
    m = np.array([[0.7, 0.1, 0.0], [0.0, 0.8, 0.1], [0.2, 0.0, 0.6]])
    bias = np.array([0.05, 0.0, 0.1])
    ds_in = imresize(img, output_shape=(32, 28))
    ds_out = np.clip(ds_in @ m.T + bias, 0, 1)
    out = bgu_upsample_native(img, ds_out)
    want = np.clip(img @ m.T + bias, 0, 1)
    assert np.abs(out - want).mean() < 1e-3


def test_native_matches_scipy_on_sliced_output():
    """gamma may differ in weakly-constrained voxels (CG vs direct
    solve), but the sliced image must agree."""
    img = _image(64, 64)
    ds_in = imresize(img, output_shape=(32, 32))
    ds_out = np.clip(ds_in * 0.6 + 0.2, 0, 1)
    edge = rgb2luminance(ds_in)
    g1 = bgu_fit(ds_in, edge, ds_out)
    g2 = bgu_fit_native(ds_in, edge, ds_out)
    o1 = bgu_slice(g1, img, rgb2luminance(img))
    o2 = bgu_slice_native(g2, img, rgb2luminance(img))
    assert np.abs(o1 - o2).max() < 5e-3


def test_backend_dispatch():
    img = _image(48, 48)
    ds = imresize(img, output_shape=(24, 24))
    a = bgu_upsample(img, ds, backend="scipy")
    b = bgu_upsample(img, ds, backend="native")
    assert np.abs(a - b).max() < 5e-3
