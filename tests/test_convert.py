"""Checkpoint-converter parity: a torch oracle implementing the
reference's module math (Conv2DMod groups trick, noise permute quirk,
bilinear upsample — histoGAN/histoGAN.py:368-502) must match our flax
modules after weight conversion."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from histogan_tpu.models.blocks import GeneratorBlock
from histogan_tpu.models.vectorizers import StyleVectorizer
from histogan_tpu.models.discriminator import Discriminator
from histogan_tpu.train import convert


# ------------------------------------------------ torch oracle modules
class TorchConv2DMod(nn.Module):
    def __init__(self, in_chan, out_chan, kernel, demod=True):
        super().__init__()
        self.filters = out_chan
        self.demod = demod
        self.kernel = kernel
        self.weight = nn.Parameter(torch.randn(out_chan, in_chan, kernel, kernel))

    def forward(self, x, y):
        b, c, h, w = x.shape
        w1 = y[:, None, :, None, None]
        w2 = self.weight[None]
        weights = w2 * (w1 + 1)
        if self.demod:
            d = torch.rsqrt((weights ** 2).sum(dim=(2, 3, 4), keepdim=True) + 1e-8)
            weights = weights * d
        x = x.reshape(1, -1, h, w)
        weights = weights.reshape(b * self.filters, c, self.kernel, self.kernel)
        x = F.conv2d(x, weights, padding=(self.kernel - 1) // 2, groups=b)
        return x.reshape(-1, self.filters, h, w)


class TorchRGBBlock(nn.Module):
    def __init__(self, latent_dim, input_channel, upsample):
        super().__init__()
        self.to_style = nn.Linear(latent_dim, input_channel)
        self.conv = TorchConv2DMod(input_channel, 3, 1, demod=False)
        self.upsample = upsample

    def forward(self, x, prev_rgb, istyle):
        x = self.conv(x, self.to_style(istyle))
        if prev_rgb is not None:
            x = x + prev_rgb
        if self.upsample:
            x = F.interpolate(x, scale_factor=2, mode="bilinear",
                              align_corners=False)
        return x


class TorchGeneratorBlock(nn.Module):
    def __init__(self, latent_dim, input_channels, filters, upsample,
                 upsample_rgb):
        super().__init__()
        self.upsample = upsample
        self.to_style1 = nn.Linear(latent_dim, input_channels)
        self.to_noise1 = nn.Linear(1, filters)
        self.conv1 = TorchConv2DMod(input_channels, filters, 3)
        self.to_style2 = nn.Linear(latent_dim, filters)
        self.to_noise2 = nn.Linear(1, filters)
        self.conv2 = TorchConv2DMod(filters, filters, 3)
        self.to_rgb = TorchRGBBlock(latent_dim, filters, upsample_rgb)

    def forward(self, x, prev_rgb, istyle, inoise, latent=None):
        if self.upsample:
            x = F.interpolate(x, scale_factor=2, mode="bilinear",
                              align_corners=False)
        inoise = inoise[:, : x.shape[2], : x.shape[3], :]
        noise1 = self.to_noise1(inoise).permute((0, 3, 2, 1))
        noise2 = self.to_noise2(inoise).permute((0, 3, 2, 1))
        x = self.conv1(x, self.to_style1(istyle))
        x = F.leaky_relu(x + noise1, 0.2)
        if latent is not None:  # skip-latent add (histoGAN.py:472-473)
            x = x + latent
        x = self.conv2(x, self.to_style2(istyle))
        x = F.leaky_relu(x + noise2, 0.2)
        rgb = self.to_rgb(x, prev_rgb, istyle)
        return x, rgb


def test_generator_block_parity():
    torch.manual_seed(0)
    latent, cin, cout = 16, 8, 12
    blk_t = TorchGeneratorBlock(latent, cin, cout, upsample=True,
                                upsample_rgb=True)
    rng = np.random.RandomState(0)
    x = rng.randn(2, cin, 6, 6).astype(np.float32)
    istyle = rng.randn(2, latent).astype(np.float32)
    inoise = rng.rand(2, 12, 12, 1).astype(np.float32)

    with torch.no_grad():
        want_x, want_rgb = blk_t(torch.from_numpy(x), None,
                                 torch.from_numpy(istyle),
                                 torch.from_numpy(inoise))

    sd = {f"blocks.0.{k}": v for k, v in blk_t.state_dict().items()}
    params = convert.convert_generator_block(sd, "blocks.0")

    blk_j = GeneratorBlock(latent, cin, cout, upsample=True, upsample_rgb=True)
    got_x, got_rgb = blk_j.apply(
        {"params": params},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))), None,
        jnp.asarray(istyle), jnp.asarray(inoise),
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(got_x), (0, 3, 1, 2)), want_x.numpy(), atol=2e-5
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(got_rgb), (0, 3, 1, 2)), want_rgb.numpy(), atol=2e-5
    )


def test_style_vectorizer_parity():
    torch.manual_seed(1)
    layers = []
    for _ in range(3):
        layers += [nn.Linear(8, 8), nn.LeakyReLU(0.2)]
    net_t = nn.Sequential(*layers)
    sd = {f"S.net.{i}.{k}": v for i, m in enumerate(net_t)
          for k, v in m.state_dict().items()}
    params = convert.convert_style_vectorizer(sd, "S", 3)

    z = np.random.RandomState(2).randn(4, 8).astype(np.float32)
    with torch.no_grad():
        want = net_t(torch.from_numpy(z)).numpy()
    sv = StyleVectorizer(emb=8, depth=3)
    got = sv.apply({"params": params}, jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_discriminator_parity():
    """Full reference-shaped D oracle vs converted flax Discriminator,
    including the NCHW->NHWC flatten permutation at to_logit."""
    torch.manual_seed(3)
    image_size, cap = 16, 4
    from math import log2

    num_layers = int(log2(image_size) - 1)
    filters = [3] + [cap * (2 ** i) for i in range(num_layers + 1)]
    pairs = list(zip(filters[:-1], filters[1:]))

    mods = {}
    class TBlock(nn.Module):
        def __init__(self, cin, cout, down):
            super().__init__()
            self.conv_res = nn.Conv2d(cin, cout, 1)
            self.net = nn.Sequential(
                nn.Conv2d(cin, cout, 3, padding=1), nn.LeakyReLU(0.2),
                nn.Conv2d(cout, cout, 3, padding=1), nn.LeakyReLU(0.2))
            self.downsample = (nn.Conv2d(cout, cout, 3, padding=1, stride=2)
                               if down else None)

        def forward(self, x):
            res = self.conv_res(x)
            x = self.net(x) + res
            if self.downsample is not None:
                x = self.downsample(x)
            return x

    class TD(nn.Module):
        def __init__(self):
            super().__init__()
            self.blocks = nn.ModuleList([
                TBlock(cin, cout, i != len(pairs) - 1)
                for i, (cin, cout) in enumerate(pairs)
            ])
            self.to_logit = nn.Linear(2 * 2 * filters[-1], 1)

        def forward(self, x):
            for b in self.blocks:
                x = b(x)
            return self.to_logit(x.reshape(x.shape[0], -1)).squeeze(-1)

    td = TD()
    x = np.random.RandomState(4).rand(2, 3, image_size, image_size).astype(np.float32)
    with torch.no_grad():
        want = td(torch.from_numpy(x)).numpy()

    sd2 = {f"D.{k}": v for k, v in td.state_dict().items()}
    params = convert.convert_discriminator(sd2, "D", len(pairs))

    dj = Discriminator(image_size=image_size, network_capacity=cap)
    logits, _ = dj.apply({"params": params},
                         jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(logits), want, atol=2e-5)


def test_full_bundle_conversion_shapes():
    """Reference-shaped random state dict -> converted tree must init-match
    our models exactly (treedef + shapes)."""
    from math import log2

    image_size, cap, latent, depth, hist_bin = 32, 4, 32, 2, 16
    num_layers = int(log2(image_size) - 1)

    # build the reference-shaped state dict procedurally
    sd = {}

    def lin(prefix, i, o):
        sd[f"{prefix}.weight"] = torch.randn(o, i)
        sd[f"{prefix}.bias"] = torch.randn(o)

    def conv(prefix, i, o, k):
        sd[f"{prefix}.weight"] = torch.randn(o, i, k, k)
        sd[f"{prefix}.bias"] = torch.randn(o)

    for name in ("S", "SE"):
        for d in range(depth):
            lin(f"{name}.net.{2*d}", latent, latent)
    for name in ("H", "HE"):
        lin(f"{name}.fcs.0", hist_bin * hist_bin * 3, 2 * latent)
        lin(f"{name}.fcs.2", 2 * latent, latent)
    from histogan_tpu.models.generator import generator_filters

    for name in ("G", "GE"):
        sd[f"{name}.initial_block"] = torch.randn(4 * cap, 4, 4)
        for i, (cin, cout) in enumerate(generator_filters(image_size, cap)):
            p = f"{name}.blocks.{i}"
            lin(f"{p}.to_style1", latent, cin)
            lin(f"{p}.to_style2", latent, cout)
            lin(f"{p}.to_noise1", 1, cout)
            lin(f"{p}.to_noise2", 1, cout)
            sd[f"{p}.conv1.weight"] = torch.randn(cout, cin, 3, 3)
            sd[f"{p}.conv2.weight"] = torch.randn(cout, cout, 3, 3)
            lin(f"{p}.to_rgb.to_style", latent, cout)
            sd[f"{p}.to_rgb.conv.weight"] = torch.randn(3, cout, 1, 1)
    filters = [3] + [cap * (2 ** i) for i in range(num_layers + 1)]
    for i, (cin, cout) in enumerate(zip(filters[:-1], filters[1:])):
        p = f"D.blocks.{i}"
        conv(f"{p}.conv_res", cin, cout, 1)
        conv(f"{p}.net.0", cin, cout, 3)
        conv(f"{p}.net.2", cout, cout, 3)
        if i != num_layers:
            conv(f"{p}.downsample", cout, cout, 3)
    lin("D.to_logit", 2 * 2 * filters[-1], 1)

    sd = {k: v.numpy() for k, v in sd.items()}
    converted = convert.convert_histogan_checkpoint(sd, image_size, depth)

    from histogan_tpu.models import Generator, HistVectorizer
    from histogan_tpu.models import StyleVectorizer as SV

    G = Generator(image_size, latent, cap)
    ref = G.init(jax.random.PRNGKey(0),
                 jnp.zeros((1, num_layers - 2, latent)),
                 jnp.zeros((1, 2, latent)),
                 jnp.zeros((1, image_size, image_size, 1)))["params"]
    got = converted["params_g"]["G"]
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref)
    got_shapes = jax.tree_util.tree_map(lambda a: a.shape, got)
    assert ref_shapes == got_shapes

    D = Discriminator(image_size, cap)
    ref_d = D.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, image_size, image_size, 3)))["params"]
    assert (jax.tree_util.tree_map(lambda a: a.shape, ref_d)
            == jax.tree_util.tree_map(lambda a: a.shape, converted["params_d"]))

    # end-to-end: install into a Trainer and sample (the pretrained-
    # sampling workflow, BASELINE.json config 3)
    import tempfile

    from histogan_tpu.train import Trainer, convert as conv_mod

    with tempfile.TemporaryDirectory() as td:
        t = Trainer(name="conv", results_dir=f"{td}/r", models_dir=f"{td}/m",
                    image_size=image_size, network_capacity=cap,
                    latent_dim=latent, style_depth=depth, hist_bin=hist_bin,
                    batch_size=2, num_devices=1, seed=0)
        t.init_GAN()
        conv_mod.install_into_trainer(t, converted)
        # EMA params must now be the converted ones
        got = np.asarray(jax.device_get(t.state.ema["G"]["initial_block"]))
        np.testing.assert_array_equal(got, converted["ema"]["G"]["initial_block"])
        hist = jnp.full((4, 3, hist_bin, hist_bin), 1.0 / (3 * hist_bin ** 2))
        imgs = t.evaluate(num=None, hist_batch=hist, num_image_tiles=2)
        assert imgs.shape == (4, image_size, image_size, 3)
        assert np.isfinite(imgs).all()
