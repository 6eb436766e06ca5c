"""bf16 mixed-precision policy: compute in bf16, fp32 masters/losses."""

import numpy as np
import pytest
from PIL import Image

from histogan_tpu.train import Trainer


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    rng = np.random.RandomState(0)
    for i in range(6):
        arr = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(root / f"{i}.jpg")
    return str(root)


def test_bf16_train_step(tiny_dataset, tmp_path_factory):
    import jax

    out = tmp_path_factory.mktemp("bf16")
    t = Trainer(
        name="bf16", results_dir=str(out / "r"), models_dir=str(out / "m"),
        image_size=32, network_capacity=4, latent_dim=32, style_depth=2,
        batch_size=2, gradient_accumulate_every=1, hist_bin=16,
        num_devices=1, seed=0, precision="bf16",
    )
    t.init_GAN()
    t.set_data_src(tiny_dataset)
    for _ in range(2):
        t.train()
    assert np.isfinite(t.d_loss) and np.isfinite(t.g_loss)
    assert np.isfinite(t.h_loss) and t.h_loss > 0
    # master params remain fp32
    leaves = jax.tree_util.tree_leaves(t.state.params_g)
    assert all(x.dtype == np.float32 for x in leaves)
    # step 0 covered gp+pl paths under bf16 (no dtype crashes)
