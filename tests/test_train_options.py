"""Train-step coverage for the optional discriminator features
(vector-quantize layers with EMA stat threading, linear attention) and
larger image sizes."""

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


def test_train_with_vq_and_attention(tiny_dataset, tmp_path_factory):
    import jax

    out = tmp_path_factory.mktemp("vqattn")
    t = Trainer(
        name="vq", results_dir=str(out / "r"), models_dir=str(out / "m"),
        image_size=32, network_capacity=4, latent_dim=32, style_depth=2,
        batch_size=2, gradient_accumulate_every=1, hist_bin=16,
        fq_layers=(2,), fq_dict_size=32, attn_layers=(1,),
        num_devices=1, seed=0,
    )
    t.init_GAN()
    t.set_data_src(tiny_dataset)

    stats_before = jax.device_get(t.state.vq_stats)
    t.train()
    t.train()
    stats_after = jax.device_get(t.state.vq_stats)

    assert np.isfinite(t.d_loss) and np.isfinite(t.g_loss)
    # VQ EMA stats must move during training (threaded through both
    # phases like the reference's in-forward buffer updates)
    moved = any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree_util.tree_leaves(stats_before),
                        jax.tree_util.tree_leaves(stats_after))
    )
    assert moved

    # checkpoint roundtrip preserves vq stats
    t.save(1)
    t.load(1)
    restored = jax.device_get(t.state.vq_stats)
    for a, b in zip(jax.tree_util.tree_leaves(stats_after),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_opt_state_dtype_bf16(tiny_dataset, tmp_path_factory):
    """opt_state_dtype='bf16' must reach the optimizer (moment trees
    stored bf16), train finite, and round-trip through a checkpoint."""
    import jax
    import jax.numpy as jnp

    out = tmp_path_factory.mktemp("optbf16")
    t = Trainer(
        name="ob", results_dir=str(out / "r"), models_dir=str(out / "m"),
        image_size=32, network_capacity=4, latent_dim=32, style_depth=2,
        batch_size=2, gradient_accumulate_every=1, hist_bin=16,
        num_devices=1, seed=0, opt_state_dtype="bf16",
    )
    t.init_GAN()
    t.set_data_src(tiny_dataset)

    opt = t.state.opt_g  # DiffGradState (diffgrad is the whole tx)
    for leaf in jax.tree_util.tree_leaves(
            (opt.exp_avg, opt.exp_avg_sq, opt.previous_grad)):
        assert leaf.dtype == jnp.bfloat16
    # masters stay fp32
    assert all(l.dtype == jnp.float32
               for l in jax.tree_util.tree_leaves(t.state.params_g))

    t.train()
    t.train()
    assert np.isfinite(t.d_loss) and np.isfinite(t.g_loss)

    t.save(1)
    t.load(1)
    opt2 = t.state.opt_g
    assert all(l.dtype == jnp.bfloat16 for l in jax.tree_util.tree_leaves(
        (opt2.exp_avg, opt2.exp_avg_sq, opt2.previous_grad)))

    with pytest.raises(ValueError, match="opt_state_dtype"):
        Trainer(name="bad", results_dir=str(out / "r2"),
                models_dir=str(out / "m2"), opt_state_dtype="fp16")


def test_trainer_fsdp_end_to_end(tiny_dataset, tmp_path_factory):
    """param_sharding='fsdp' through the full Trainer surface: the state
    must actually live sharded over the 8-device mesh, training must
    stay finite, and the checkpoint round-trip (which all-gathers on
    save and re-shards on load) must be exact."""
    import jax

    from histogan_tpu.parallel.fsdp import sharded_bytes_per_device

    out = tmp_path_factory.mktemp("fsdp")
    t = Trainer(
        name="fsdp", results_dir=str(out / "r"), models_dir=str(out / "m"),
        image_size=32, network_capacity=4, latent_dim=32, style_depth=2,
        batch_size=8, gradient_accumulate_every=1, hist_bin=16,
        num_devices=8, seed=0, param_sharding="fsdp",
    )
    t.init_GAN()
    t.set_data_src(tiny_dataset)

    total = sum(l.nbytes for l in jax.tree_util.tree_leaves(
        jax.device_get(t.state)))
    assert sharded_bytes_per_device(t.state) < 0.5 * total

    t.train()   # step 0: gp + pl flags on
    t.train()
    assert np.isfinite(t.d_loss) and np.isfinite(t.g_loss)

    before = t._host_state()
    t.save(1)
    t.load(1)
    after = t._host_state()
    for a, b in zip(jax.tree_util.tree_leaves(before.params_g),
                    jax.tree_util.tree_leaves(after.params_g)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the re-placed state is sharded again, not replicated
    assert sharded_bytes_per_device(t.state) < 0.5 * total


def test_generator_512_schedule():
    from histogan_tpu.models.generator import generator_filters

    pairs = generator_filters(512, 16)
    # 8 blocks: 4*16=64 initial channels, descending from 16*2^8
    assert len(pairs) == 8
    assert pairs[0] == (64, 4096)
    assert pairs[-1] == (64, 32)


def test_generator_512_forward_tiny_capacity():
    import jax
    import jax.numpy as jnp

    from histogan_tpu.models import Generator

    g = Generator(image_size=512, latent_dim=16, network_capacity=1)
    nl = g.num_layers
    styles = jnp.zeros((1, nl - 2, 16))
    hists = jnp.zeros((1, 2, 16))
    noise = jnp.zeros((1, 512, 512, 1))
    params = g.init(jax.random.PRNGKey(0), styles, hists, noise)
    out = g.apply(params, styles, hists, noise)
    assert out.shape == (1, 512, 512, 3)
