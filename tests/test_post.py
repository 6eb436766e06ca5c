"""Parity tests for post-processing vs goldens from the reference utils."""

import os

import numpy as np

from histogan_tpu.post import color_transfer_MKL, imresize, pyramid_upsampling

GOLDEN = np.load(os.path.join(os.path.dirname(__file__), "golden", "post_golden.npz"))


def test_imresize_upscale_bicubic():
    got = imresize(GOLDEN["img"], scalar_scale=2.0, method="bicubic")
    np.testing.assert_allclose(got, GOLDEN["up_bicubic"], atol=1e-12)


def test_imresize_downscale_bicubic_antialias():
    got = imresize(GOLDEN["img"], scalar_scale=0.4, method="bicubic")
    np.testing.assert_allclose(got, GOLDEN["down_bicubic"], atol=1e-12)


def test_imresize_shape_bilinear():
    got = imresize(GOLDEN["img"], output_shape=(64, 48), method="bilinear")
    np.testing.assert_allclose(got, GOLDEN["shape_bilinear"], atol=1e-12)


def test_imresize_uint8_roundtrip():
    got = imresize(GOLDEN["img_u8"], scalar_scale=0.5, method="bicubic")
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got, GOLDEN["u8_down"])


def test_mkl_color_transfer():
    got = color_transfer_MKL(GOLDEN["src"], GOLDEN["tgt"])
    np.testing.assert_allclose(got, GOLDEN["mkl"], atol=1e-10)


def test_mkl_moves_statistics():
    rng = np.random.RandomState(1)
    src = rng.rand(32, 32, 3) * 0.3
    tgt = np.clip(rng.rand(32, 32, 3) * 0.5 + 0.5, 0, 1)
    out = color_transfer_MKL(src, tgt)
    # output mean should land on target mean (linear map is exact on moments)
    np.testing.assert_allclose(out.mean((0, 1)), tgt.mean((0, 1)), atol=2e-2)


def test_pyramid_upsampling_shapes_and_detail():
    rng = np.random.RandomState(2)
    # reference full-res with structure; target = recolored low-res
    ref = rng.rand(100, 90, 3)
    tgt = np.clip(ref[::4, ::4] + 0.3, 0, 1)  # recolored, quarter res
    out = pyramid_upsampling(tgt, ref, levels=3, swapping_levels=1)
    assert out.shape[0] % 8 == 0 and out.shape[1] % 8 == 0
    assert np.isfinite(out).all()
    # coarse color should follow the (shifted) target, not the reference
    assert out.mean() > ref.mean() + 0.1


def test_pyramid_blending_path():
    rng = np.random.RandomState(3)
    ref = rng.rand(64, 64, 3)
    tgt = rng.rand(16, 16, 3)
    out = pyramid_upsampling(tgt, ref, levels=2, swapping_levels=1, blending=True)
    assert np.isfinite(out).all()
