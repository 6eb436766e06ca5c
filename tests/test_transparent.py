"""RGBA (transparent) mode coverage."""

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from histogan_tpu.models import Discriminator, Generator


def test_generator_rgba_output():
    g = Generator(image_size=32, latent_dim=16, network_capacity=4,
                  transparent=True)
    nl = g.num_layers
    styles = jnp.zeros((1, nl - 2, 16))
    hists = jnp.zeros((1, 2, 16))
    noise = jnp.zeros((1, 32, 32, 1))
    p = g.init(jax.random.PRNGKey(0), styles, hists, noise)
    out = g.apply(p, styles, hists, noise)
    assert out.shape == (1, 32, 32, 4)


def test_discriminator_rgba_input():
    d = Discriminator(image_size=32, network_capacity=4, transparent=True)
    x = jnp.zeros((2, 32, 32, 4))
    v = d.init(jax.random.PRNGKey(0), x)
    logits, _ = d.apply(v, x)
    assert logits.shape == (2,)


def test_dataset_transparent_loading(tmp_path):
    from histogan_tpu.data.dataset import ImageFolderDataset, load_rgb

    rng = np.random.RandomState(0)
    Image.fromarray((rng.rand(40, 40, 3) * 255).astype(np.uint8)).save(
        tmp_path / "a.png"
    )
    arr = load_rgb(tmp_path / "a.png", transparent=True)
    assert arr.shape == (40, 40, 4)
    assert np.allclose(arr[..., 3], 1.0)  # opaque alpha

    ds = ImageFolderDataset(str(tmp_path), image_size=32, transparent=True)
    img = ds.get_image(0, np.random.default_rng(0))
    assert img.shape == (32, 32, 4)


def test_histogram_rgba_drops_alpha(tmp_path):
    from histogan_tpu.ops.histogram import histogram_feature

    rng = np.random.RandomState(1)
    rgba = rng.rand(1, 40, 40, 4).astype(np.float32)
    a = np.asarray(histogram_feature(rgba, h=16))
    b = np.asarray(histogram_feature(rgba[..., :3], h=16))
    np.testing.assert_array_equal(a, b)


def test_fid_on_transparent_model(tmp_path):
    """calculate_fid must feed 3-channel images to the extractor even
    for RGBA models (the inception stem is RGB; r2 review fix), and real
    draws must be deterministic center-crops (no augmentation)."""
    import numpy as np
    from PIL import Image

    from histogan_tpu.train import Trainer

    rng = np.random.RandomState(2)
    for i in range(4):
        Image.fromarray((rng.rand(40, 40, 4) * 255).astype(np.uint8),
                        "RGBA").save(tmp_path / f"{i}.png")

    seen = []

    def probe_extractor(images):
        x = np.asarray(images, np.float32)
        seen.append(x.shape)
        return x.reshape(len(x), -1)[:, :8]

    t = Trainer(
        name="rgba_fid", results_dir=str(tmp_path / "r"),
        models_dir=str(tmp_path / "m"), image_size=32, network_capacity=4,
        latent_dim=32, style_depth=2, batch_size=2, hist_bin=16,
        transparent=True, dataset_aug_prob=0.9, num_devices=1, seed=0,
        fid_num_samples=2, fid_extractor=probe_extractor,
    )
    t.init_GAN()
    t.set_data_src(str(tmp_path))
    fid = t.calculate_fid()
    assert np.isfinite(fid)
    assert seen and all(s[-1] == 3 for s in seen), seen
