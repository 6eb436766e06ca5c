"""ReHistoGAN checkpoint-converter parity + attention/VQ discriminator
conversion (VERDICT r1 items 2/3).

Torch oracles implement the reference module math with the reference's
state-dict layout (ReHistoGAN/rehistoGAN.py:485-718 for ED/G bundle;
histoGAN/histoGAN.py:90-118, 572-631 + the third-party
ImageLinearAttention / vector_quantize_pytorch layouts for the optional
D blocks), with RANDOM weights — the random-weight oracle technique of
tests/test_convert.py.
"""

from pathlib import Path

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from histogan_tpu.models import (
    Discriminator,
    HistVectorizer,
    RecoloringEncoderDecoder,
    RecoloringGAN,
)
from histogan_tpu.train import convert
from histogan_tpu.train.rehisto_steps import RecolorModels, recolor_forward
from histogan_tpu.utils.config import ReHistoGANConfig

from tests.test_convert import TorchConv2DMod, TorchGeneratorBlock


# ------------------------------------------------ torch oracle modules
class TorchHistVectorizer(nn.Module):
    def __init__(self, insize, emb, depth):
        super().__init__()
        fcs = []
        for i in range(depth):
            if i == 0:
                fcs += [nn.Linear(insize * insize * 3, emb * 2), nn.LeakyReLU(0.2)]
            elif i == 1:
                fcs += [nn.Linear(emb * 2, emb), nn.LeakyReLU(0.2)]
            else:
                fcs += [nn.Linear(emb, emb), nn.LeakyReLU(0.2)]
        self.fcs = nn.Sequential(*fcs)

    def forward(self, x):
        return self.fcs(x.reshape(x.shape[0], -1))


class TorchEncoderBlock(nn.Module):
    def __init__(self, cin, filters):
        super().__init__()
        self.conv_res = nn.Conv2d(cin, filters, 1)
        self.net = nn.Sequential(
            nn.Conv2d(cin, filters, 3, padding=1), nn.InstanceNorm2d(filters),
            nn.LeakyReLU(0.2),
            nn.Conv2d(filters, filters, 3, padding=1), nn.InstanceNorm2d(filters),
            nn.LeakyReLU(0.2),
        )
        self.downsample = nn.Conv2d(filters, filters, 3, padding=1, stride=2)

    def forward(self, x):
        res = self.conv_res(x)
        x = self.net(x) + res
        return self.downsample(x), x


class TorchDecoderBlock(nn.Module):
    def __init__(self, cin, filters, internal_hist=False, latent_dim=None):
        super().__init__()
        self.conv_res = nn.Conv2d(cin, filters, 1)
        self.block1 = nn.Sequential(nn.Conv2d(cin, cin, 3, padding=1),
                                    nn.LeakyReLU(0.2))
        self.block2 = nn.Sequential(nn.Conv2d(cin * 2, filters, 3, padding=1),
                                    nn.LeakyReLU(0.2))
        self.conv_out_latent = nn.Sequential(
            nn.Conv2d(filters, filters, 3, padding=1), nn.LeakyReLU(0.2))
        self.conv_out_rgb = nn.Conv2d(filters, 3, 1)
        if internal_hist:
            self.to_latent = nn.Linear(latent_dim, cin)
            self.conv_latent = TorchConv2DMod(cin, cin, 3)

    def forward(self, x, prev_rgb, prev_latent, h=None):
        curr_latent = self.block1(x)
        if hasattr(self, "to_latent"):
            prev_latent = self.conv_latent(prev_latent, self.to_latent(h))
        processed = self.block2(torch.cat((curr_latent, prev_latent), dim=1))
        x = self.conv_out_latent(self.conv_res(x) + processed)
        rgb = self.conv_out_rgb(x)
        if prev_rgb is not None:
            rgb = rgb + prev_rgb
        up = lambda t: F.interpolate(t, scale_factor=2, mode="bilinear",
                                     align_corners=False)
        return up(x), up(rgb)


class TorchED(nn.Module):
    """RecoloringEncoderDecoder oracle incl. the reference's in-place
    filter-list reverse quirk (rehistoGAN.py:565-580)."""

    def __init__(self, image_size, cap, hist, latent_dim, style_depth,
                 skip_conn_to_GAN, internal_hist):
        super().__init__()
        from math import log2

        enc_layers = int(log2(image_size) - 2)
        dec_layers = int(log2(image_size) - 4)
        self.skip = skip_conn_to_GAN
        self.internal = internal_hist
        encoder_filters = [cap] + [cap * 2 ** (i + 1) for i in range(enc_layers)]
        enc_pairs = list(zip(encoder_filters[:-1], encoder_filters[1:]))
        rev = encoder_filters[::-1]
        decoder_filters = rev[: len(rev) - (enc_layers - dec_layers)]
        dec_pairs = list(zip(decoder_filters[:-1], decoder_filters[1:]))

        self.mapping = nn.Conv2d(3, cap, 3, padding=1)
        self.decoder_mapping = nn.Conv2d(decoder_filters[-1], 8 * cap, 1)
        if skip_conn_to_GAN:
            if not internal_hist:
                self.hist_projection = TorchHistVectorizer(hist, latent_dim,
                                                           style_depth)
            self.to_latent_1 = nn.Linear(latent_dim, rev[-3])
            self.to_latent_2 = nn.Linear(latent_dim, rev[-2])
            self.conv_latent_1 = TorchConv2DMod(rev[-3], 4 * cap, 3)
            self.conv_latent_2 = TorchConv2DMod(rev[-2], 2 * cap, 3)
        self.encoder_blocks = nn.ModuleList(
            [TorchEncoderBlock(i, o) for i, o in enc_pairs])
        self.decoder_blocks = nn.ModuleList(
            [TorchDecoderBlock(i, o, internal_hist, latent_dim)
             for i, o in dec_pairs])

    def forward(self, x, hists=None):
        if self.skip:
            h_w = hists if self.internal else self.hist_projection(hists)
            h1, h2 = self.to_latent_1(h_w), self.to_latent_2(h_w)
        x = self.mapping(x)
        x_list, x_list_up = [], []
        for block in self.encoder_blocks:
            x, xup = block(x)
            x_list.append(x)
            x_list_up.append(xup)
        x_list = x_list[::-1]
        x_list_e = x_list[:-2]
        pl1 = pl2 = None
        if self.skip:
            pl1 = self.conv_latent_1(x_list_up[1], h1)
            pl2 = self.conv_latent_2(x_list_up[0], h2)
        rgb = None
        for prev_latent, block in zip(x_list_e, self.decoder_blocks):
            x, rgb = block(x, rgb, prev_latent, h=hists)
        x = self.decoder_mapping(x)
        return x, rgb, pl1, pl2


def _nchw(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


def _nhwc(x):
    return np.transpose(np.asarray(x), (0, 2, 3, 1))


# ----------------------------------------------------------- the tests
def test_rehistogan_bundle_parity():
    """Full converted ED+H+G forward == torch oracle (the published
    recoloring checkpoints' configuration: skip_conn_to_GAN)."""
    torch.manual_seed(0)
    image_size, cap, latent, depth, hist_bin = 64, 4, 32, 2, 16

    ed_t = TorchED(image_size, cap, hist_bin, latent, depth,
                   skip_conn_to_GAN=True, internal_hist=False)
    h_t = TorchHistVectorizer(hist_bin, latent, depth)
    g0_t = TorchGeneratorBlock(latent, 8 * cap, 4 * cap, upsample=True,
                               upsample_rgb=True)
    g1_t = TorchGeneratorBlock(latent, 4 * cap, 2 * cap, upsample=True,
                               upsample_rgb=False)
    for m in (ed_t, h_t, g0_t, g1_t):
        m.eval()

    rng = np.random.RandomState(0)
    img = rng.rand(2, image_size, image_size, 3).astype(np.float32)
    hist = rng.rand(2, 3, hist_bin, hist_bin).astype(np.float32)
    hist /= hist.sum((1, 2, 3), keepdims=True)
    noise = rng.rand(2, image_size, image_size, 1).astype(np.float32)

    with torch.no_grad():
        t_img = torch.from_numpy(_nchw(img))
        t_hist = torch.from_numpy(hist)
        t_noise = torch.from_numpy(noise)
        h_w = h_t(t_hist)
        lat, _rgb_ed, pl1, pl2 = ed_t(t_img, t_hist)
        x, rgb = g0_t(lat, None, h_w, t_noise, latent=pl1)
        _, want = g1_t(x, rgb, h_w, t_noise, latent=pl2)
    want = want.numpy()

    # reference-layout flat state dict (rehistoGAN.py:1207 save format)
    td, _ = _torch_discriminator(image_size, cap)
    sd = {}
    for prefix, mod in (("ED", ed_t), ("H", h_t), ("D", td)):
        sd.update({f"{prefix}.{k}": v for k, v in mod.state_dict().items()})
    sd.update({f"G.blocks.0.{k}": v for k, v in g0_t.state_dict().items()})
    sd.update({f"G.blocks.1.{k}": v for k, v in g1_t.state_dict().items()})
    sd = {k: v.numpy() for k, v in sd.items()}

    assert convert.detect_rehistogan_variant(sd) == {
        "skip_conn_to_GAN": True, "internal_hist": False,
    }
    converted = convert.convert_rehistogan_checkpoint(
        {k: v for k, v in sd.items()}, image_size, depth)
    assert converted["skip_conn_to_GAN"] and not converted["internal_hist"]

    cfg = ReHistoGANConfig(
        image_size=image_size, network_capacity=cap, latent_dim=latent,
        style_depth=depth, hist_bin=hist_bin, skip_conn_to_GAN=True,
    )
    ED = RecoloringEncoderDecoder(image_size, cap, hist_bin, latent, depth,
                                  skip_conn_to_GAN=True)
    H = HistVectorizer(hist_bin, latent, depth)
    G = RecoloringGAN(image_size, latent, cap)
    models = RecolorModels(ED, H, G, None)

    got = recolor_forward(
        models, converted["params_g"], jnp.asarray(img), jnp.asarray(hist),
        jnp.asarray(noise), cfg,
    )
    np.testing.assert_allclose(_nchw(got), want, atol=2e-4, rtol=1e-3)


def test_rehistogan_internal_hist_variant_shapes():
    """internal_hist variant: converted tree must init-match the flax
    modules (treedef + shapes); detection flags both."""
    torch.manual_seed(1)
    image_size, cap, latent, depth, hist_bin = 64, 4, 32, 2, 16
    ed_t = TorchED(image_size, cap, hist_bin, latent, depth,
                   skip_conn_to_GAN=True, internal_hist=True)
    sd = {f"ED.{k}": v.numpy() for k, v in ed_t.state_dict().items()}

    assert convert.detect_rehistogan_variant(sd) == {
        "skip_conn_to_GAN": True, "internal_hist": True,
    }
    got = convert.convert_encoder_decoder(sd, "ED", image_size, depth,
                                          skip_conn_to_GAN=True,
                                          internal_hist=True)

    ED = RecoloringEncoderDecoder(image_size, cap, hist_bin, latent, depth,
                                  skip_conn_to_GAN=True, internal_hist=True)
    ref = ED.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, image_size, image_size, 3)), jnp.zeros((1, latent)),
    )["params"]
    assert (jax.tree_util.tree_map(lambda a: a.shape, ref)
            == jax.tree_util.tree_map(lambda a: np.asarray(a).shape, got))


# --------------------------------------- D attention / VQ conversion
class TorchImageLinearAttention(nn.Module):
    """Third-party linear_attention_transformer.ImageLinearAttention
    layout (imported at histoGAN/histoGAN.py:33)."""

    def __init__(self, chan, key_dim=64, value_dim=64, heads=8,
                 norm_queries=True):
        super().__init__()
        self.chan = chan
        self.key_dim, self.value_dim, self.heads = key_dim, value_dim, heads
        self.norm_queries = norm_queries
        self.to_q = nn.Conv2d(chan, key_dim * heads, 1, bias=False)
        self.to_k = nn.Conv2d(chan, key_dim * heads, 1, bias=False)
        self.to_v = nn.Conv2d(chan, value_dim * heads, 1, bias=False)
        self.to_out = nn.Conv2d(value_dim * heads, chan, 1)

    def forward(self, x):
        b, c, h, w = x.shape
        q, k, v = self.to_q(x), self.to_k(x), self.to_v(x)
        q, k, v = map(lambda t: t.reshape(b, self.heads, -1, h * w), (q, k, v))
        q = q * self.key_dim ** -0.25
        k = k * self.key_dim ** -0.25
        k = k.softmax(dim=-1)
        if self.norm_queries:
            q = q.softmax(dim=-2)
        context = torch.einsum("bhdn,bhen->bhde", k, v)
        out = torch.einsum("bhdn,bhde->bhen", q, context)
        return self.to_out(out.reshape(b, -1, h, w))


class TorchRezero(nn.Module):
    def __init__(self, fn):
        super().__init__()
        self.fn = fn
        self.g = nn.Parameter(torch.zeros(1))

    def forward(self, x):
        return self.fn(x) * self.g


class TorchResidual(nn.Module):
    def __init__(self, fn):
        super().__init__()
        self.fn = fn

    def forward(self, x):
        return self.fn(x) + x


class TorchVQ(nn.Module):
    """vector_quantize_pytorch.VectorQuantize buffer layout + eval-mode
    forward (embed (dim, n_embed), EMA buffers; histoGAN.py:600-601)."""

    def __init__(self, dim, n_embed, commitment=1.0):
        super().__init__()
        self.dim, self.n_embed, self.commitment = dim, n_embed, commitment
        embed = torch.randn(dim, n_embed)
        self.register_buffer("embed", embed)
        self.register_buffer("cluster_size", torch.zeros(n_embed))
        self.register_buffer("embed_avg", embed.clone())

    def forward(self, x):  # NHWC (PermuteToFrom wraps)
        flatten = x.reshape(-1, self.dim)
        dist = (flatten.pow(2).sum(1, keepdim=True)
                - 2 * flatten @ self.embed
                + self.embed.pow(2).sum(0, keepdim=True))
        _, idx = (-dist).max(1)
        quantize = F.embedding(idx, self.embed.transpose(0, 1)).view(*x.shape)
        diff = self.commitment * (quantize.detach() - x).pow(2).mean()
        quantize = x + (quantize - x).detach()
        return quantize, diff


class TorchPermuteToFrom(nn.Module):
    def __init__(self, fn):
        super().__init__()
        self.fn = fn

    def forward(self, x):
        out, loss = self.fn(x.permute(0, 2, 3, 1))
        return out.permute(0, 3, 1, 2), loss


class TorchDBlock(nn.Module):
    def __init__(self, cin, cout, down):
        super().__init__()
        self.conv_res = nn.Conv2d(cin, cout, 1)
        self.net = nn.Sequential(
            nn.Conv2d(cin, cout, 3, padding=1), nn.LeakyReLU(0.2),
            nn.Conv2d(cout, cout, 3, padding=1), nn.LeakyReLU(0.2))
        self.downsample = (nn.Conv2d(cout, cout, 3, padding=1, stride=2)
                           if down else None)

    def forward(self, x):
        x = self.net(x) + self.conv_res(x)
        return self.downsample(x) if self.downsample is not None else x


def _torch_discriminator(image_size, cap, attn_layers=(), fq_layers=(),
                         fq_dict_size=16):
    from math import log2

    num_layers = int(log2(image_size) - 1)
    filters = [3] + [cap * 2 ** i for i in range(num_layers + 1)]
    pairs = list(zip(filters[:-1], filters[1:]))

    class TD(nn.Module):
        def __init__(self):
            super().__init__()
            blocks, attns, quants = [], [], []
            for ind, (cin, cout) in enumerate(pairs):
                num_layer = ind + 1
                blocks.append(TorchDBlock(cin, cout, ind != len(pairs) - 1))
                attns.append(nn.Sequential(*[
                    TorchResidual(TorchRezero(TorchImageLinearAttention(cout)))
                    for _ in range(2)
                ]) if num_layer in attn_layers else None)
                quants.append(TorchPermuteToFrom(TorchVQ(cout, fq_dict_size))
                              if num_layer in fq_layers else None)
            self.blocks = nn.ModuleList(blocks)
            self.attn_blocks = nn.ModuleList(attns)
            self.quantize_blocks = nn.ModuleList(quants)
            self.to_logit = nn.Linear(2 * 2 * filters[-1], 1)

        def forward(self, x):
            qloss = torch.zeros(1)
            for b, a, q in zip(self.blocks, self.attn_blocks,
                               self.quantize_blocks):
                x = b(x)
                if a is not None:
                    x = a(x)
                if q is not None:
                    x, l = q(x)
                    qloss = qloss + l
            return self.to_logit(x.reshape(x.shape[0], -1)).squeeze(-1), qloss

    return TD(), len(pairs)


def test_discriminator_attention_parity():
    torch.manual_seed(2)
    image_size, cap = 16, 4
    td, num_blocks = _torch_discriminator(image_size, cap, attn_layers=(2,))
    # rezero gains init to 0 -> attention would be a no-op; randomize them
    with torch.no_grad():
        for m in td.modules():
            if isinstance(m, TorchRezero):
                m.g.copy_(torch.randn(1))
    td.eval()

    x = np.random.RandomState(5).rand(2, 3, image_size, image_size).astype(np.float32)
    with torch.no_grad():
        want, _ = td(torch.from_numpy(x))

    sd = {f"D.{k}": v.numpy() for k, v in td.state_dict().items()}
    params = convert.convert_discriminator(sd, "D", num_blocks)

    dj = Discriminator(image_size, cap, attn_layers=(2,))
    logits, _ = dj.apply({"params": params}, jnp.asarray(_nhwc(x)))
    np.testing.assert_allclose(np.asarray(logits), want.numpy(), atol=2e-5)


def test_discriminator_vq_parity():
    torch.manual_seed(3)
    image_size, cap = 16, 4
    td, num_blocks = _torch_discriminator(image_size, cap, fq_layers=(2,),
                                          fq_dict_size=16)
    td.eval()

    x = np.random.RandomState(6).rand(2, 3, image_size, image_size).astype(np.float32)
    with torch.no_grad():
        want, want_q = td(torch.from_numpy(x))

    sd = {f"D.{k}": v.numpy() for k, v in td.state_dict().items()}
    params = convert.convert_discriminator(sd, "D", num_blocks)
    vq_stats = convert.convert_vq_stats(sd, "D", num_blocks)
    assert set(vq_stats) == {"vq_1"}
    np.testing.assert_array_equal(vq_stats["vq_1"]["embed"],
                                  sd["D.quantize_blocks.1.fn.embed"])

    dj = Discriminator(image_size, cap, fq_layers=(2,), fq_dict_size=16)
    logits, qloss = dj.apply(
        {"params": params, "vq_stats": vq_stats}, jnp.asarray(_nhwc(x)))
    np.testing.assert_allclose(np.asarray(logits), want.numpy(), atol=2e-5)
    np.testing.assert_allclose(float(qloss), float(want_q), atol=2e-5)


def test_discriminator_rejects_unknown_keys():
    """A checkpoint with D keys this converter doesn't understand must
    fail loudly, not convert to a silently-wrong model (r1 finding 3)."""
    torch.manual_seed(4)
    td, num_blocks = _torch_discriminator(16, 4)
    sd = {f"D.{k}": v.numpy() for k, v in td.state_dict().items()}
    sd["D.mystery_module.weight"] = np.zeros((3, 3), np.float32)
    with pytest.raises(ValueError, match="mystery_module"):
        convert.convert_discriminator(sd, "D", num_blocks)


def test_install_into_rehisto_trainer(tmp_path):
    """Converted bundle -> RecoloringTrainer -> recolor forward; flag
    mismatch must raise."""
    torch.manual_seed(5)
    image_size, cap, latent, depth, hist_bin = 16, 4, 32, 2, 16

    ed_t = TorchED(image_size, cap, hist_bin, latent, depth,
                   skip_conn_to_GAN=False, internal_hist=False)
    h_t = TorchHistVectorizer(hist_bin, latent, depth)
    g0_t = TorchGeneratorBlock(latent, 8 * cap, 4 * cap, True, True)
    g1_t = TorchGeneratorBlock(latent, 4 * cap, 2 * cap, True, False)
    td, num_blocks = _torch_discriminator(image_size, cap)
    sd = {}
    for prefix, mod in (("ED", ed_t), ("H", h_t), ("D", td)):
        sd.update({f"{prefix}.{k}": v.numpy()
                   for k, v in mod.state_dict().items()})
    sd.update({f"G.blocks.0.{k}": v.numpy()
               for k, v in g0_t.state_dict().items()})
    sd.update({f"G.blocks.1.{k}": v.numpy()
               for k, v in g1_t.state_dict().items()})

    converted = convert.convert_rehistogan_checkpoint(sd, image_size, depth)
    assert not converted["skip_conn_to_GAN"]

    from histogan_tpu.train.rehisto_trainer import RecoloringTrainer

    wrong = RecoloringTrainer(
        name="conv-wrong", results_dir=str(tmp_path / "r"),
        models_dir=str(tmp_path / "m"), image_size=image_size,
        network_capacity=cap, latent_dim=latent, style_depth=depth,
        hist_bin=hist_bin, batch_size=2, num_devices=1, seed=0,
        skip_conn_to_GAN=True,
    )
    wrong.init_GAN()
    with pytest.raises(ValueError, match="skip_conn_to_GAN"):
        convert.install_into_rehisto_trainer(wrong, converted)

    t = RecoloringTrainer(
        name="conv", results_dir=str(tmp_path / "r2"),
        models_dir=str(tmp_path / "m2"), image_size=image_size,
        network_capacity=cap, latent_dim=latent, style_depth=depth,
        hist_bin=hist_bin, batch_size=2, num_devices=1, seed=0,
    )
    t.init_GAN()
    convert.install_into_rehisto_trainer(t, converted)
    got = np.asarray(jax.device_get(
        t.state.params_g["H"]["fc0"]["bias"]))
    np.testing.assert_allclose(got, sd["H.fcs.0.bias"], atol=1e-7)

    rng = np.random.RandomState(7)
    img = jnp.asarray(rng.rand(2, image_size, image_size, 3).astype(np.float32))
    hist = rng.rand(2, 3, hist_bin, hist_bin).astype(np.float32)
    hist = jnp.asarray(hist / hist.sum((1, 2, 3), keepdims=True))
    out = t.evaluate(num=None, image_batch=img, hist_batch=hist,
                     save_input=False)
    assert np.asarray(out).shape == (2, image_size, image_size, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_rehistogan_cli_load_pt(tmp_path, monkeypatch):
    """Published-checkpoint workflow end-to-end: reference-layout .pt on
    disk -> `rehistogan --load_pt ... --generate` recolors an image
    (README.md:458-467 demo, previously unreachable — r1 missing #1)."""
    from PIL import Image

    torch.manual_seed(6)
    image_size, cap, latent, depth, hist_bin = 16, 4, 512, 8, 16
    ed_t = TorchED(image_size, cap, hist_bin, latent, depth,
                   skip_conn_to_GAN=False, internal_hist=False)
    h_t = TorchHistVectorizer(hist_bin, latent, depth)
    g0_t = TorchGeneratorBlock(latent, 8 * cap, 4 * cap, True, True)
    g1_t = TorchGeneratorBlock(latent, 4 * cap, 2 * cap, True, False)
    td, _ = _torch_discriminator(image_size, cap)
    sd = {}
    for prefix, mod in (("ED", ed_t), ("H", h_t), ("D", td)):
        sd.update({f"{prefix}.{k}": v for k, v in mod.state_dict().items()})
    sd.update({f"G.blocks.0.{k}": v for k, v in g0_t.state_dict().items()})
    sd.update({f"G.blocks.1.{k}": v for k, v in g1_t.state_dict().items()})
    pt_path = tmp_path / "rehisto.pt"
    torch.save(sd, pt_path)

    rng = np.random.RandomState(8)
    img_path = tmp_path / "input.jpg"
    Image.fromarray((rng.rand(16, 16, 3) * 255).astype(np.uint8)).save(img_path)
    tgt_path = tmp_path / "target.jpg"
    Image.fromarray((rng.rand(16, 16, 3) * 255).astype(np.uint8)).save(tgt_path)

    monkeypatch.chdir(tmp_path)
    from histogan_tpu.cli import rehistogan as cli

    cli.main([
        "--generate", "True", "--load_pt", str(pt_path),
        "--input_image", str(img_path), "--target_hist", str(tgt_path),
        "--image_size", "16", "--network_capacity", "4",
        "--hist_bin", "16", "--name", "pt", "--results_dir", "res",
        "--models_dir", "mod", "--skip_conn_to_GAN", "False",
        "--load_histoGAN_weights", "False", "--initialize_gan", "False",
    ])
    outs = list(Path("res/pt").glob("output-target-*.jpg"))
    assert outs, "recolored output grid must be written"

