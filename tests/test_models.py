"""Shape / math tests for the model zoo (SURVEY.md §4 test plan)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from histogan_tpu.models import (
    Discriminator,
    Generator,
    HistVectorizer,
    RecoloringEncoderDecoder,
    RecoloringGAN,
    StyleVectorizer,
    generator_filters,
)
from histogan_tpu.ops.conv2dmod import conv2d_mod


def test_conv2d_mod_matches_per_sample_conv():
    """The input-scale/output-demod factorization must equal explicit
    per-sample modulated weights (the reference's groups trick,
    histoGAN/histoGAN.py:420-440)."""
    rng = np.random.RandomState(0)
    b, h, w, cin, cout, k = 3, 8, 8, 5, 7, 3
    x = jnp.asarray(rng.randn(b, h, w, cin), jnp.float32)
    wgt = jnp.asarray(rng.randn(k, k, cin, cout), jnp.float32) * 0.1
    style = jnp.asarray(rng.randn(b, cin), jnp.float32)

    got = conv2d_mod(x, wgt, style, demod=True)

    # brute force: one conv per sample with explicitly modulated+demodulated weights
    outs = []
    for i in range(b):
        wmod = wgt * (style[i] + 1.0)[None, None, :, None]
        d = jax.lax.rsqrt(jnp.sum(jnp.square(wmod), axis=(0, 1, 2)) + 1e-8)
        wmod = wmod * d[None, None, None, :]
        o = jax.lax.conv_general_dilated(
            x[i : i + 1], wmod, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        outs.append(o)
    want = jnp.concatenate(outs, axis=0)
    assert float(jnp.abs(got - want).max()) < 1e-5


def test_conv2d_mod_no_demod():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 4, 4, 3), jnp.float32)
    wgt = jnp.asarray(rng.randn(1, 1, 3, 3), jnp.float32)
    style = jnp.asarray(rng.randn(2, 3), jnp.float32)
    got = conv2d_mod(x, wgt, style, demod=False)
    want = jnp.einsum("bhwi,io,bi->bhwo", x, wgt[0, 0], style + 1.0)
    assert float(jnp.abs(got - want).max()) < 1e-5


@pytest.mark.parametrize("image_size,capacity", [(64, 16), (128, 12)])
def test_generator_shapes(image_size, capacity):
    gen = Generator(image_size=image_size, latent_dim=64, network_capacity=capacity)
    num_layers = gen.num_layers
    b = 2
    styles = jnp.zeros((b, num_layers - 2, 64))
    hists = jnp.zeros((b, 2, 64))
    noise = jnp.zeros((b, image_size, image_size, 1))
    params = gen.init(jax.random.PRNGKey(0), styles, hists, noise)
    out = gen.apply(params, styles, hists, noise)
    assert out.shape == (b, image_size, image_size, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_generator_filter_schedule():
    # reference schedule for 256/cap16 (histoGAN/histoGAN.py:537-541)
    pairs = generator_filters(256, 16)
    assert pairs == [
        (64, 2048), (2048, 1024), (1024, 512), (512, 256),
        (256, 128), (128, 64), (64, 32),
    ]


@pytest.mark.parametrize("attn,fq", [((), ()), ((1,), (2,))])
def test_discriminator_shapes(attn, fq):
    disc = Discriminator(image_size=64, network_capacity=8,
                         attn_layers=attn, fq_layers=fq)
    x = jnp.zeros((2, 64, 64, 3))
    variables = disc.init(jax.random.PRNGKey(0), x)
    logits, qloss = disc.apply(variables, x)
    assert logits.shape == (2,)
    assert qloss.shape == ()


def test_vq_updates_stats():
    disc = Discriminator(image_size=32, network_capacity=4, fq_layers=(1,))
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
    variables = disc.init(jax.random.PRNGKey(0), x)
    (logits, qloss), updates = disc.apply(variables, x, train=True, mutable=["vq_stats"])
    old = jax.tree_util.tree_leaves(variables["vq_stats"])
    new = jax.tree_util.tree_leaves(updates["vq_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(old, new)
    )


def test_vectorizers():
    sv = StyleVectorizer(emb=32, depth=8)
    z = jnp.zeros((4, 32))
    p = sv.init(jax.random.PRNGKey(0), z)
    assert sv.apply(p, z).shape == (4, 32)
    # 8 layers: fc0..fc7
    assert len(p["params"]) == 8

    hv = HistVectorizer(insize=16, emb=32, depth=8)
    hist = jnp.zeros((4, 3, 16, 16))
    p = hv.init(jax.random.PRNGKey(0), hist)
    assert hv.apply(p, hist).shape == (4, 32)
    # first layer width 2*emb, then emb (histoGAN/histoGAN.py:339-348)
    assert p["params"]["fc0"]["kernel"].shape == (3 * 16 * 16, 64)
    assert p["params"]["fc1"]["kernel"].shape == (64, 32)


def test_init_statistics():
    """Weights must follow kaiming N(0, 2/fan_in) like the reference
    (histoGAN/histoGAN.py:686-690); noise projections zeroed (:692-696)."""
    gen = Generator(image_size=64, latent_dim=512, network_capacity=16)
    styles = jnp.zeros((1, gen.num_layers - 2, 512))
    hists = jnp.zeros((1, 2, 512))
    noise = jnp.zeros((1, 64, 64, 1))
    params = gen.init(jax.random.PRNGKey(0), styles, hists, noise)["params"]

    w = np.asarray(params["blocks_1"]["conv1"]["weight"])  # (3,3,in,out)
    fan_in = w.shape[0] * w.shape[1] * w.shape[2]
    assert abs(w.std() - np.sqrt(2.0 / fan_in)) < 0.15 * np.sqrt(2.0 / fan_in)

    tn = np.asarray(params["blocks_0"]["to_noise1"]["kernel"])
    assert np.all(tn == 0)

    init_blk = np.asarray(params["initial_block"])
    assert init_blk.shape == (4, 4, 64)
    assert abs(init_blk.std() - 1.0) < 0.2


@pytest.mark.parametrize("skip,internal", [(False, False), (True, False), (True, True)])
def test_rehisto_encoder_decoder(skip, internal):
    size, cap = 64, 8
    ed = RecoloringEncoderDecoder(
        image_size=size, network_capacity=cap, hist=16, latent_dim=64,
        style_depth=2, skip_conn_to_GAN=skip, internal_hist=internal,
    )
    x = jnp.zeros((2, size, size, 3))
    hist_arg = jnp.zeros((2, 64)) if internal else jnp.zeros((2, 3, 16, 16))
    variables = ed.init(jax.random.PRNGKey(0), x, hist_arg)
    out = ed.apply(variables, x, hist_arg)
    if skip:
        latent, rgb, pl1, pl2 = out
        assert pl1.shape[-1] == 4 * cap
        assert pl2.shape[-1] == 2 * cap
    else:
        latent, rgb = out
    # decoder upsamples dec_layers times from size/2^enc_layers
    assert latent.shape == (2, size // 4, size // 4, 8 * cap)
    assert rgb.shape == (2, size // 4, size // 4, 3)


def test_rehisto_full_pipeline_shapes():
    size, cap, latent_dim = 64, 8, 64
    ed = RecoloringEncoderDecoder(image_size=size, network_capacity=cap,
                                  hist=16, latent_dim=latent_dim, style_depth=2,
                                  skip_conn_to_GAN=True)
    g = RecoloringGAN(image_size=size, latent_dim=latent_dim, network_capacity=cap)
    x = jnp.asarray(np.random.RandomState(0).rand(2, size, size, 3), jnp.float32)
    hist = jnp.zeros((2, 3, 16, 16))
    hw = jnp.zeros((2, latent_dim))
    noise = jnp.zeros((2, size, size, 1))
    edv = ed.init(jax.random.PRNGKey(0), x, hist)
    latent, rgb, pl1, pl2 = ed.apply(edv, x, hist)
    gv = g.init(jax.random.PRNGKey(1), latent, rgb, hw, noise, pl1, pl2)
    out = g.apply(gv, latent, rgb, hw, noise, pl1, pl2)
    assert out.shape == (2, size, size, 3)
    assert np.isfinite(np.asarray(out)).all()
