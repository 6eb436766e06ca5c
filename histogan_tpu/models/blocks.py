"""Generator / discriminator building blocks (NHWC flax modules).

Reference: histoGAN/histoGAN.py:368-526. Style/noise override kwargs
reproduce the reference's ``forward_`` paths used by the projection
tools (histoGAN/histoGAN.py:392-401, 481-502).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from histogan_tpu.ops.conv2dmod import conv2d_mod
from histogan_tpu.ops.resize import upsample2x
from histogan_tpu.models.layers import TorchLinear, leaky_relu
from histogan_tpu.utils import inits


class Conv2DMod(nn.Module):
    """Modulated conv parameter holder (histoGAN/histoGAN.py:404-440).

    ``style`` here is the already-projected per-channel modulation
    (B, Cin), matching the reference where to_style lives in the caller.
    """

    filters: int
    kernel: int
    demod: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, style: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        weight = self.param(
            "weight", inits.kaiming_normal, (self.kernel, self.kernel, in_ch, self.filters)
        )
        return conv2d_mod(x, weight, style, demod=self.demod)


class RGBBlock(nn.Module):
    """Per-resolution to-RGB head (histoGAN/histoGAN.py:368-401)."""

    latent_dim: int
    upsample: bool
    rgba: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        prev_rgb: Optional[jnp.ndarray],
        istyle: Optional[jnp.ndarray] = None,
        *,
        style: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        if style is None:
            style = TorchLinear(x.shape[-1], name="to_style")(istyle)
        out_filters = 4 if self.rgba else 3
        x = Conv2DMod(out_filters, 1, demod=False, name="conv")(x, style)
        if prev_rgb is not None:
            x = x + prev_rgb
        if self.upsample:
            x = upsample2x(x)
        return x


class GeneratorBlock(nn.Module):
    """StyleGAN2-style synthesis block (histoGAN/histoGAN.py:443-502).

    Noise quirk kept: the reference permutes the projected noise to
    (B, F, W, H) before adding to the NCHW activation
    (histoGAN/histoGAN.py:466-467), i.e. the noise value at spatial (i, j)
    is sampled at (j, i). We reproduce this with a swapaxes so saved
    noise files render identically.
    """

    latent_dim: int
    input_channels: int
    filters: int
    upsample: bool = True
    upsample_rgb: bool = True
    rgba: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        prev_rgb: Optional[jnp.ndarray],
        istyle: Optional[jnp.ndarray] = None,
        inoise: Optional[jnp.ndarray] = None,
        latent: Optional[jnp.ndarray] = None,
        *,
        style1: Optional[jnp.ndarray] = None,
        style2: Optional[jnp.ndarray] = None,
        rgb_style: Optional[jnp.ndarray] = None,
        noise1: Optional[jnp.ndarray] = None,
        noise2: Optional[jnp.ndarray] = None,
    ):
        if self.upsample:
            x = upsample2x(x)

        if noise1 is None or noise2 is None:
            if inoise is None:
                raise ValueError("No noise is given")
            h, w = x.shape[1], x.shape[2]
            # quirk transpose applied to the 1-channel noise BEFORE the
            # per-pixel Linear: numerically identical to transposing the
            # (B, h, w, F) projection afterwards, but the relayout moves
            # F x less data (measured: the post-Linear swap was one of
            # the larger HBM consumers of the G fwd+bwd at 256px)
            crop = jnp.swapaxes(inoise[:, :h, :w, :], 1, 2)
            noise1 = TorchLinear(self.filters, zero_init=True, name="to_noise1")(crop)
            noise2 = TorchLinear(self.filters, zero_init=True, name="to_noise2")(crop)
        else:
            # keep param structure stable even when noise is overridden
            TorchLinear(self.filters, zero_init=True, name="to_noise1")
            TorchLinear(self.filters, zero_init=True, name="to_noise2")

        if style1 is None:
            style1 = TorchLinear(x.shape[-1], name="to_style1")(istyle)
        x = Conv2DMod(self.filters, 3, name="conv1")(x, style1)
        x = leaky_relu(x + noise1)
        if latent is not None:
            x = x + latent
        if style2 is None:
            style2 = TorchLinear(self.filters, name="to_style2")(istyle)
        x = Conv2DMod(self.filters, 3, name="conv2")(x, style2)
        x = leaky_relu(x + noise2)

        rgb = RGBBlock(self.latent_dim, self.upsample_rgb, self.rgba, name="to_rgb")(
            x, prev_rgb, istyle, style=rgb_style
        )
        return x, rgb


class DiscriminatorBlock(nn.Module):
    """Residual downsampling block (histoGAN/histoGAN.py:505-526)."""

    filters: int
    downsample: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from histogan_tpu.models.layers import TorchConv

        res = TorchConv(self.filters, 1, name="conv_res")(x)
        x = leaky_relu(TorchConv(self.filters, 3, padding=1, name="net0")(x))
        x = leaky_relu(TorchConv(self.filters, 3, padding=1, name="net1")(x))
        x = x + res
        if self.downsample:
            x = TorchConv(self.filters, 3, stride=2, padding=1, name="down")(x)
        return x
