"""ReHistoGAN: recoloring encoder-decoder + 2-block GAN head.

Reference: ReHistoGAN/rehistoGAN.py:449-718. Faithful quirks:

- ``RecoloringGAN.forward`` discards the passed ``rgb`` and starts from
  None (rehistoGAN.py:479) — kept.
- The reference aliases ``decoder_filters = encoder_filters`` and
  reverses IN PLACE (rehistoGAN.py:565-566), so the later
  ``encoder_filters[-3]`` / ``[-2]`` reads (rehistoGAN.py:579-580) hit the
  REVERSED list: to_latent_1 projects to reversed[-3] (= cap*2 for the
  default depth) and to_latent_2 to reversed[-2] (= cap). We compute those
  sizes from the reversed list explicitly.
- Skip-latent ordering: ED returns (processed_latent_1, processed_latent_2)
  and the trainer swaps names twice (rehistoGAN.py:940-944), so the head's
  latent1 is conv_latent_1's output. We return them in direct order and
  pass them straight through.
"""

from __future__ import annotations

from math import log2
from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from histogan_tpu.models.blocks import Conv2DMod, GeneratorBlock
from histogan_tpu.models.layers import InstanceNorm, TorchConv, TorchLinear, leaky_relu
from histogan_tpu.models.vectorizers import HistVectorizer
from histogan_tpu.ops.resize import upsample2x
from histogan_tpu.models.generator import generator_filters


class RecoloringGAN(nn.Module):
    """The last-two-generator-blocks head (rehistoGAN.py:449-482)."""

    image_size: int
    latent_dim: int = 512
    network_capacity: int = 16
    transparent: bool = False
    # TPU-native addition: block-boundary remat (models/generator.py note)
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        rgb: Optional[jnp.ndarray],
        hists: jnp.ndarray,
        input_noise: jnp.ndarray,
        latent1: Optional[jnp.ndarray] = None,
        latent2: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        pairs = generator_filters(self.image_size, self.network_capacity)[-2:]
        block_cls = nn.remat(GeneratorBlock) if self.remat else GeneratorBlock
        rgb = None  # reference quirk: passed rgb is ignored (rehistoGAN.py:479)
        # latent passed positionally: the lifted checkpoint is kept to
        # positional pytree args (None is a valid empty-pytree leaf)
        x, rgb = block_cls(
            self.latent_dim, pairs[0][0], pairs[0][1], upsample=True,
            upsample_rgb=True, rgba=self.transparent, name="blocks_0",
        )(x, rgb, hists, input_noise, latent1)
        x, rgb = block_cls(
            self.latent_dim, pairs[1][0], pairs[1][1], upsample=True,
            upsample_rgb=False, rgba=self.transparent, name="blocks_1",
        )(x, rgb, hists, input_noise, latent2)
        return rgb


class EncoderBlock(nn.Module):
    """Residual conv block with InstanceNorm (rehistoGAN.py:485-504)."""

    filters: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        res = TorchConv(self.filters, 1, name="conv_res")(x)
        y = leaky_relu(InstanceNorm()(TorchConv(self.filters, 3, padding=1, name="net0")(x)))
        y = leaky_relu(InstanceNorm()(TorchConv(self.filters, 3, padding=1, name="net1")(y)))
        y = y + res
        y_down = TorchConv(self.filters, 3, stride=2, padding=1, name="down")(y)
        return y_down, y


class DecoderBlock(nn.Module):
    """U-Net style decoder block (rehistoGAN.py:507-546)."""

    filters: int
    internal_hist: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        prev_rgb: Optional[jnp.ndarray],
        prev_latent: jnp.ndarray,
        h: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        in_ch = x.shape[-1]
        curr_latent = leaky_relu(TorchConv(in_ch, 3, padding=1, name="block1")(x))
        if self.internal_hist:
            style = TorchLinear(prev_latent.shape[-1], name="to_latent")(h)
            prev_latent = Conv2DMod(prev_latent.shape[-1], 3, name="conv_latent")(
                prev_latent, style
            )
        processed = leaky_relu(
            TorchConv(self.filters, 3, padding=1, name="block2")(
                jnp.concatenate([curr_latent, prev_latent], axis=-1)
            )
        )
        x_res = TorchConv(self.filters, 1, name="conv_res")(x)
        x = leaky_relu(TorchConv(self.filters, 3, padding=1, name="conv_out_latent")(
            x_res + processed
        ))
        rgb = TorchConv(3, 1, name="conv_out_rgb")(x)
        if prev_rgb is not None:
            rgb = rgb + prev_rgb
        return upsample2x(x), upsample2x(rgb)


class RecoloringEncoderDecoder(nn.Module):
    """Encoder-decoder producing (latent, rgb[, skip latents])
    (rehistoGAN.py:549-634)."""

    image_size: int
    network_capacity: int = 16
    hist: int = 64
    latent_dim: int = 512
    style_depth: int = 8
    skip_conn_to_GAN: bool = False
    internal_hist: bool = False
    # TPU-native addition: block-boundary remat (models/generator.py note)
    remat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, hists: Optional[jnp.ndarray] = None):
        enc_layers = int(log2(self.image_size) - 2)
        dec_layers = int(log2(self.image_size) - 4)
        cap = self.network_capacity
        encoder_filters = [cap] + [cap * (2 ** (i + 1)) for i in range(enc_layers)]
        enc_pairs = list(zip(encoder_filters[:-1], encoder_filters[1:]))
        rev = encoder_filters[::-1]  # the reference's in-place reverse
        decoder_filters = rev[: len(rev) - (enc_layers - dec_layers)]
        dec_pairs = list(zip(decoder_filters[:-1], decoder_filters[1:]))

        h1 = h2 = None
        if self.skip_conn_to_GAN:
            if self.internal_hist:
                h_w = hists  # hists is already the projected latent vector
            else:
                h_w = HistVectorizer(
                    self.hist, self.latent_dim, self.style_depth, name="hist_projection"
                )(hists)
            # sizes read from the REVERSED list (reference alias quirk)
            h1 = TorchLinear(rev[-3], name="to_latent_1")(h_w)
            h2 = TorchLinear(rev[-2], name="to_latent_2")(h_w)

        enc_cls = nn.remat(EncoderBlock) if self.remat else EncoderBlock
        dec_cls = nn.remat(DecoderBlock) if self.remat else DecoderBlock

        x = TorchConv(cap, 3, padding=1, name="mapping")(x)
        x_list = []
        x_list_up = []
        for ind, (_, out_chan) in enumerate(enc_pairs):
            x, xup = enc_cls(out_chan, name=f"encoder_{ind}")(x)
            x_list.append(x)
            x_list_up.append(xup)

        x_list = x_list[::-1]
        x_list_e = x_list[:-2]

        processed_latent_1 = processed_latent_2 = None
        if self.skip_conn_to_GAN:
            processed_latent_1 = Conv2DMod(
                (2 ** 2) * cap, 3, name="conv_latent_1"
            )(x_list_up[1], h1)
            processed_latent_2 = Conv2DMod(
                (2 ** 1) * cap, 3, name="conv_latent_2"
            )(x_list_up[0], h2)

        rgb = None
        for ind, ((_, out_chan), prev_latent) in enumerate(zip(dec_pairs, x_list_e)):
            # h passed positionally (remat-friendly; see RecoloringGAN)
            x, rgb = dec_cls(
                out_chan, internal_hist=self.internal_hist, name=f"decoder_{ind}"
            )(x, rgb, prev_latent, hists)

        x = TorchConv(8 * cap, 1, name="decoder_mapping")(x)
        if self.skip_conn_to_GAN:
            return x, rgb, processed_latent_1, processed_latent_2
        return x, rgb
