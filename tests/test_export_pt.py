"""Reference-format export + full-shape converter round trip
(VERDICT r4 #4: "converters known-good at size, not just toy shapes").

The bundles here are built at the FLAGSHIP shapes (256px, capacity 16,
latent 512, style depth 8, hist_bin 64, one attention + one VQ layer,
EMA copies; both families) with the tree structure taken from the real
models via ``jax.eval_shape`` — so the round trip pins that
``export_*_checkpoint`` emits exactly the reference state-dict layout
(histoGAN/histoGAN.py:634-715 save contract at :1121;
ReHistoGAN/rehistoGAN.py:637-718) that ``convert_*_checkpoint`` consumes,
bitwise, at real size. The .pt file itself round-trips through
``save_pt_file`` + ``load_torch_state_dict`` (plain ``torch.save``/
``torch.load``, the reference's own (de)serializer).
"""

from math import log2

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from histogan_tpu.train import convert

IMAGE_SIZE, CAP, LATENT, DEPTH, HIST_BIN = 256, 16, 512, 8, 64


def _rand_like(tree, seed):
    """Random fp32 bundle matching an eval_shape tree (tiny values keep
    the .pt file writable quickly; content is irrelevant to layout)."""
    rng = np.random.RandomState(seed)
    leaves, treedef = jax.tree_util.tree_flatten(
        tree, is_leaf=lambda x: hasattr(x, "shape"))
    out = [rng.standard_normal(l.shape).astype(np.float32) for l in leaves]
    return jax.tree_util.tree_unflatten(treedef, out)


def _assert_bitwise(a, b):
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.fixture(scope="module")
def histogan_bundle():
    from histogan_tpu.models import (Discriminator, Generator,
                                     HistVectorizer, StyleVectorizer)

    num_layers = int(log2(IMAGE_SIZE) - 1)
    key = jax.random.PRNGKey(0)
    g_shapes = jax.eval_shape(
        Generator(IMAGE_SIZE, LATENT, CAP).init, key,
        jax.ShapeDtypeStruct((1, num_layers - 2, LATENT), jnp.float32),
        jax.ShapeDtypeStruct((1, 2, LATENT), jnp.float32),
        jax.ShapeDtypeStruct((1, IMAGE_SIZE, IMAGE_SIZE, 1), jnp.float32),
    )["params"]
    d_shapes = jax.eval_shape(
        Discriminator(IMAGE_SIZE, CAP, attn_layers=[1], fq_layers=[1],
                      fq_dict_size=512).init, key,
        jax.ShapeDtypeStruct((1, IMAGE_SIZE, IMAGE_SIZE, 3), jnp.float32),
    )
    s_shapes = jax.eval_shape(
        StyleVectorizer(LATENT, DEPTH).init, key,
        jax.ShapeDtypeStruct((1, LATENT), jnp.float32))["params"]
    h_shapes = jax.eval_shape(
        HistVectorizer(HIST_BIN, LATENT, DEPTH).init, key,
        jax.ShapeDtypeStruct((1, 3, HIST_BIN, HIST_BIN), jnp.float32),
    )["params"]
    return {
        "params_g": {"S": _rand_like(s_shapes, 1),
                     "H": _rand_like(h_shapes, 2),
                     "G": _rand_like(g_shapes, 3)},
        "params_d": _rand_like(d_shapes["params"], 4),
        "ema": {"S": _rand_like(s_shapes, 5),
                "H": _rand_like(h_shapes, 6),
                "G": _rand_like(g_shapes, 7)},
        "vq_stats": _rand_like(d_shapes["vq_stats"], 8),
    }


def test_histogan_flagship_roundtrip(histogan_bundle):
    sd = convert.export_histogan_checkpoint(histogan_bundle)
    # reference layout sanity at size: EMA copies present, attn + VQ keys
    assert "GE.initial_block" in sd and sd["G.initial_block"].shape == (64, 4, 4)
    # attn_layers/fq_layers are 1-based num_layer values (reference
    # convention); [1] lands on block index 0 in the state-dict layout
    assert "D.attn_blocks.0.0.fn.g" in sd
    assert "D.quantize_blocks.0.fn.embed" in sd
    assert sd["G.blocks.0.conv1.weight"].shape == (2048, 64, 3, 3)  # OIHW

    back = convert.convert_histogan_checkpoint(sd, IMAGE_SIZE, DEPTH)
    for part in ("params_g", "params_d", "ema", "vq_stats"):
        _assert_bitwise(histogan_bundle[part], back[part])


def test_histogan_pt_file_roundtrip(histogan_bundle, tmp_path):
    torch = pytest.importorskip("torch")  # noqa: F841

    sd = convert.export_histogan_checkpoint(histogan_bundle)
    path = tmp_path / "model_flagship.pt"
    convert.save_pt_file(sd, str(path))
    back = convert.convert_pt_file(str(path), IMAGE_SIZE, DEPTH)
    for part in ("params_g", "params_d", "ema", "vq_stats"):
        _assert_bitwise(histogan_bundle[part], back[part])


@pytest.fixture(scope="module")
def rehisto_bundle():
    from histogan_tpu.models import (Discriminator, HistVectorizer,
                                     RecoloringEncoderDecoder, RecoloringGAN)
    from histogan_tpu.models.generator import generator_filters

    key = jax.random.PRNGKey(0)
    ed_shapes = jax.eval_shape(
        RecoloringEncoderDecoder(IMAGE_SIZE, CAP, HIST_BIN, LATENT, DEPTH,
                                 skip_conn_to_GAN=True).init, key,
        jax.ShapeDtypeStruct((1, IMAGE_SIZE, IMAGE_SIZE, 3), jnp.float32),
        jax.ShapeDtypeStruct((1, 3, HIST_BIN, HIST_BIN), jnp.float32),
    )["params"]
    pairs = generator_filters(IMAGE_SIZE, CAP)[-2:]
    g_shapes = jax.eval_shape(
        RecoloringGAN(IMAGE_SIZE, LATENT, CAP).init, key,
        jax.ShapeDtypeStruct(
            (1, IMAGE_SIZE // 4, IMAGE_SIZE // 4, pairs[0][0]), jnp.float32),
        None,
        jax.ShapeDtypeStruct((1, LATENT), jnp.float32),
        jax.ShapeDtypeStruct((1, IMAGE_SIZE, IMAGE_SIZE, 1), jnp.float32),
    )["params"]
    d_shapes = jax.eval_shape(
        Discriminator(IMAGE_SIZE, CAP).init, key,
        jax.ShapeDtypeStruct((1, IMAGE_SIZE, IMAGE_SIZE, 3), jnp.float32),
    )["params"]
    h_shapes = jax.eval_shape(
        HistVectorizer(HIST_BIN, LATENT, DEPTH).init, key,
        jax.ShapeDtypeStruct((1, 3, HIST_BIN, HIST_BIN), jnp.float32),
    )["params"]
    return {
        "params_g": {"ED": _rand_like(ed_shapes, 11),
                     "H": _rand_like(h_shapes, 12),
                     "G": _rand_like(g_shapes, 13)},
        "params_d": _rand_like(d_shapes, 14),
    }


def test_rehistogan_flagship_roundtrip(rehisto_bundle):
    sd = convert.export_rehistogan_checkpoint(rehisto_bundle)
    assert "ED.conv_latent_1.weight" in sd          # skip_conn_to_GAN keys
    assert "ED.decoder_blocks.0.to_latent.weight" not in sd  # not internal_hist
    assert "ED.encoder_blocks.0.net.3.weight" in sd  # InstanceNorm offsets

    back = convert.convert_rehistogan_checkpoint(sd, IMAGE_SIZE, DEPTH)
    assert back["skip_conn_to_GAN"] and not back["internal_hist"]
    _assert_bitwise(rehisto_bundle["params_g"], back["params_g"])
    _assert_bitwise(rehisto_bundle["params_d"], back["params_d"])


def test_rehistogan_internal_hist_roundtrip():
    """The OTHER reference recoloring variant (internal_hist: per-block
    to_latent/conv_latent + ED.hist_projection, no skip-latent heads) —
    toy shapes; the flagship test covers the skip_conn variant at size.
    Pins that export emits the variant's keys and the importer
    auto-detects it back."""
    from histogan_tpu.models import (Discriminator, HistVectorizer,
                                     RecoloringEncoderDecoder, RecoloringGAN)
    from histogan_tpu.models.generator import generator_filters

    size, cap, latent, depth, hist_bin = 32, 4, 32, 2, 16
    key = jax.random.PRNGKey(0)
    # internal_hist quirk: `hists` is the PRE-projected latent vector
    # (models/rehisto.py:150), not the raw (B,3,h,h) feature
    ed_shapes = jax.eval_shape(
        RecoloringEncoderDecoder(size, cap, hist_bin, latent, depth,
                                 skip_conn_to_GAN=False,
                                 internal_hist=True).init, key,
        jax.ShapeDtypeStruct((1, size, size, 3), jnp.float32),
        jax.ShapeDtypeStruct((1, latent), jnp.float32),
    )["params"]
    pairs = generator_filters(size, cap)[-2:]
    g_shapes = jax.eval_shape(
        RecoloringGAN(size, latent, cap).init, key,
        jax.ShapeDtypeStruct((1, size // 4, size // 4, pairs[0][0]),
                             jnp.float32),
        None,
        jax.ShapeDtypeStruct((1, latent), jnp.float32),
        jax.ShapeDtypeStruct((1, size, size, 1), jnp.float32),
    )["params"]
    d_shapes = jax.eval_shape(
        Discriminator(size, cap).init, key,
        jax.ShapeDtypeStruct((1, size, size, 3), jnp.float32),
    )["params"]
    h_shapes = jax.eval_shape(
        HistVectorizer(hist_bin, latent, depth).init, key,
        jax.ShapeDtypeStruct((1, 3, hist_bin, hist_bin), jnp.float32),
    )["params"]
    bundle = {
        "params_g": {"ED": _rand_like(ed_shapes, 21),
                     "H": _rand_like(h_shapes, 22),
                     "G": _rand_like(g_shapes, 23)},
        "params_d": _rand_like(d_shapes, 24),
    }
    sd = convert.export_rehistogan_checkpoint(bundle)
    assert "ED.decoder_blocks.0.to_latent.weight" in sd   # internal_hist
    assert "ED.conv_latent_1.weight" not in sd            # no skip heads
    assert "ED.hist_projection.fcs.0.weight" not in sd    # skip-only module

    back = convert.convert_rehistogan_checkpoint(sd, size, depth)
    assert back["internal_hist"] and not back["skip_conn_to_GAN"]
    _assert_bitwise(bundle["params_g"], back["params_g"])
    _assert_bitwise(bundle["params_d"], back["params_d"])


def test_rehistogan_pt_file_roundtrip(rehisto_bundle, tmp_path):
    torch = pytest.importorskip("torch")  # noqa: F841

    sd = convert.export_rehistogan_checkpoint(rehisto_bundle)
    path = tmp_path / "rehisto_flagship.pt"
    convert.save_pt_file(sd, str(path))
    back = convert.convert_rehistogan_pt_file(str(path), IMAGE_SIZE, DEPTH)
    _assert_bitwise(rehisto_bundle["params_g"], back["params_g"])
    _assert_bitwise(rehisto_bundle["params_d"], back["params_d"])
