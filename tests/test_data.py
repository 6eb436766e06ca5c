"""Data pipeline tests: histogram pool vs direct computation, mixed-size
shape grouping, interpolation distribution, loader batch contract."""

import numpy as np
import pytest
from PIL import Image

from histogan_tpu.data.dataset import HistogramPool, ImageFolderDataset, TrainLoader
from histogan_tpu.ops.histogram import histogram_feature


@pytest.fixture(scope="module")
def mixed_dataset(tmp_path_factory):
    """Images of several sizes, some above and some below hist_insz."""
    root = tmp_path_factory.mktemp("mixed")
    rng = np.random.RandomState(0)
    sizes = [(40, 40), (40, 40), (80, 60), (200, 180), (200, 180), (64, 128)]
    for i, (h, w) in enumerate(sizes):
        Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(
            root / f"{i}.jpg"
        )
    return root


@pytest.mark.parametrize("resizing", ["sampling", "interpolation"])
def test_pool_matches_direct_histogram(mixed_dataset, resizing):
    """The pool's host-side resize + batched device hist must equal
    feeding the raw image through histogram_feature directly."""
    from histogan_tpu.data.dataset import list_images, load_rgb

    paths = list_images(mixed_dataset)
    pool = HistogramPool(paths, hist_insz=64, hist_bin=16,
                         hist_resizing=resizing)
    for i, p in enumerate(paths):
        img = load_rgb(p)
        want = np.asarray(histogram_feature(
            img[None], h=16, insz=64, resizing=resizing))
        got = pool.pool[i]
        # host cv2/PIL resize vs jax resize differ at float level only
        assert np.abs(got - want[0]).max() < 2e-3, f"image {i} ({img.shape})"


def test_interpolated_hist_is_convex_combination(mixed_dataset):
    from histogan_tpu.data.dataset import list_images

    pool = HistogramPool(list_images(mixed_dataset), hist_insz=64, hist_bin=16)
    rng = np.random.default_rng(0)
    h = pool.sample_interpolated(rng, 16)
    assert h.shape == (16, 3, 16, 16)
    np.testing.assert_allclose(h.sum(axis=(1, 2, 3)), 1.0, atol=1e-3)
    assert (h >= 0).all()


def test_loader_batch_contract(mixed_dataset):
    ds = ImageFolderDataset(str(mixed_dataset), image_size=32)
    from histogan_tpu.data.dataset import list_images

    pool = HistogramPool(list_images(mixed_dataset), hist_insz=64, hist_bin=16)
    loader = TrainLoader(ds, pool, batch_size=2, accum=3, seed=0)
    batch = next(loader)
    loader.close()
    assert batch["d_images"].shape == (3, 2, 32, 32, 3)
    assert batch["d_hists"].shape == (3, 2, 3, 16, 16)
    assert batch["g_hists"].shape == (3, 2, 3, 16, 16)
    assert batch["d_images"].min() >= 0 and batch["d_images"].max() <= 1


def test_pool_disk_cache(mixed_dataset, tmp_path):
    from histogan_tpu.data.dataset import list_images

    paths = list_images(mixed_dataset)
    p1 = HistogramPool(paths, hist_insz=64, hist_bin=16,
                       cache_dir=str(tmp_path))
    cached = list(tmp_path.glob("hist_pool_*.npy"))
    assert len(cached) == 1
    p2 = HistogramPool(paths, hist_insz=64, hist_bin=16,
                       cache_dir=str(tmp_path))
    np.testing.assert_array_equal(p1.pool, p2.pool)
    # different config -> different cache entry
    HistogramPool(paths, hist_insz=64, hist_bin=16, hist_sigma=0.05,
                  cache_dir=str(tmp_path))
    assert len(list(tmp_path.glob("hist_pool_*.npy"))) == 2


def test_loader_rehisto_contract(mixed_dataset):
    ds = ImageFolderDataset(str(mixed_dataset), image_size=32)
    from histogan_tpu.data.dataset import list_images

    pool = HistogramPool(list_images(mixed_dataset), hist_insz=64, hist_bin=16)
    loader = TrainLoader(ds, pool, batch_size=2, accum=1, seed=0,
                         include_g_images=True, self_hist=True)
    batch = next(loader)
    loader.close()
    assert batch["g_images"].shape == (1, 2, 32, 32, 3)
    # self_hist: g_hists are pool entries (no interpolation)
    dists = np.abs(batch["g_hists"][0, 0][None] - pool.pool).sum(axis=(1, 2, 3))
    assert dists.min() < 1e-6


def test_image_cache_lossless_and_served(tmp_path):
    """The decoded-image cache must serve byte-identical arrays to the
    decode path (the decode path's output is exactly uint8/255), and
    augmented draws must still go through the real decode."""
    from PIL import Image

    from histogan_tpu.data.dataset import ImageFolderDataset

    root = tmp_path / "imgs"
    root.mkdir()
    rng0 = np.random.RandomState(7)
    # mixed sizes: downscale, exact, upscale paths
    for i, s in enumerate((50, 32, 20)):
        Image.fromarray((rng0.rand(s, s + 4, 3) * 255).astype(np.uint8)).save(
            root / f"{i}.jpg")

    plain = ImageFolderDataset(str(root), image_size=32)
    cached = ImageFolderDataset(str(root), image_size=32,
                                cache_dir=str(tmp_path / "cache"))
    assert cached._cache is not None and cached._cache.dtype == np.uint8
    rng = np.random.default_rng(0)
    for i in range(3):
        a = plain.get_image(i, rng)
        b = cached.get_image(i, rng)
        np.testing.assert_array_equal(a, b)

    # second construction loads the same file (no rebuild)
    f = cached._cache_file(str(tmp_path / "cache"))
    assert f.exists()
    mtime = f.stat().st_mtime_ns
    again = ImageFolderDataset(str(root), image_size=32,
                               cache_dir=str(tmp_path / "cache"))
    assert f.stat().st_mtime_ns == mtime
    np.testing.assert_array_equal(np.asarray(again._cache),
                                  np.asarray(cached._cache))

    # augmented draws diverge from the center-crop cache with aug_prob=1
    aug = ImageFolderDataset(str(root), image_size=32, aug_prob=1.0,
                             cache_dir=str(tmp_path / "cache"))
    out = aug.get_image(0, np.random.default_rng(3))
    assert out.shape == (32, 32, 3)
    assert not np.array_equal(out, cached.get_image(0, rng))
