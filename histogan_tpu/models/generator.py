"""HistoGAN generator (histoGAN/histoGAN.py:529-568).

StyleGAN2-style synthesis where the LAST TWO blocks are driven by the
histogram projection instead of the style mapping (histoGAN.py:563,
paper §3.1). ``num_layers = log2(image_size) - 1``; filter schedule
``[4c, c*2^n, ..., 2c]``.
"""

from __future__ import annotations

from math import log2
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from histogan_tpu.models.blocks import GeneratorBlock
from histogan_tpu.utils import inits
from flax.linen import initializers as flax_inits


def generator_filters(image_size: int, network_capacity: int) -> List[Tuple[int, int]]:
    """(in, out) channel pairs per block (histoGAN/histoGAN.py:537-541)."""
    num_layers = int(log2(image_size) - 1)
    init_channels = 4 * network_capacity
    filters = [init_channels] + [
        network_capacity * (2 ** (i + 1)) for i in range(num_layers)
    ][::-1]
    return list(zip(filters[:-1], filters[1:]))


class Generator(nn.Module):
    image_size: int
    latent_dim: int = 512
    network_capacity: int = 16
    transparent: bool = False
    # TPU-native addition (no reference analogue): rematerialize each
    # synthesis block on the backward pass (jax.checkpoint at block
    # boundaries). Trades recompute FLOPs — cheap, the train step is
    # HBM-bound (DESIGN.md r3 roofline) — for activation memory,
    # unlocking larger batches / resolutions. Param tree and numerics
    # are unchanged (tests/test_remat.py).
    remat: bool = False

    @property
    def num_layers(self) -> int:
        return int(log2(self.image_size) - 1)

    @nn.compact
    def __call__(
        self,
        styles: jnp.ndarray,
        hists: jnp.ndarray,
        input_noise: jnp.ndarray,
        *,
        block_styles: Optional[Sequence[Optional[Tuple]]] = None,
        block_noises: Optional[Sequence[Optional[Tuple]]] = None,
    ) -> jnp.ndarray:
        """Synthesize images.

        Args:
          styles: (B, num_layers-2, latent) per-block w vectors.
          hists: (B, 2, latent) histogram projection rows, driving the
            final two blocks (histoGAN/histoGAN.py:563).
          input_noise: (B, image_size, image_size, 1) uniform noise.
          block_styles / block_noises: optional per-block overrides
            ((style1, style2, rgb_style) / (noise1, noise2) tuples) for
            the projection tools' manual unroll (projection_to_latent.py:
            434-467). None entries fall back to the standard path.

        Returns: (B, image_size, image_size, 3|4) rgb.
        """
        b = styles.shape[0]
        init_channels = 4 * self.network_capacity
        initial = self.param(
            "initial_block", flax_inits.normal(1.0), (4, 4, init_channels)
        )  # reference: torch.randn (histoGAN/histoGAN.py:538), NHWC layout
        x = jnp.broadcast_to(initial[None], (b, 4, 4, init_channels))

        all_styles = jnp.concatenate([styles, hists], axis=1)  # (B, L, latent)

        rgb = None
        pairs = generator_filters(self.image_size, self.network_capacity)
        for ind, (in_chan, out_chan) in enumerate(pairs):
            overrides = {}
            if block_styles is not None and block_styles[ind] is not None:
                s1, s2, rs = block_styles[ind]
                overrides.update(style1=s1, style2=s2, rgb_style=rs)
            if block_noises is not None and block_noises[ind] is not None:
                n1, n2 = block_noises[ind]
                overrides.update(noise1=n1, noise2=n2)
            # remat only the override-free path (positional args keep the
            # lifted checkpoint simple; the override path is the
            # projection tools' inference-only unroll, which never needs
            # activation memory savings).
            block_cls = (
                nn.remat(GeneratorBlock) if self.remat and not overrides
                else GeneratorBlock
            )
            block = block_cls(
                self.latent_dim,
                in_chan,
                out_chan,
                upsample=ind != 0,
                upsample_rgb=ind != (self.num_layers - 1),
                rgba=self.transparent,
                name=f"blocks_{ind}",
            )
            x, rgb = block(x, rgb, all_styles[:, ind], input_noise, **overrides)
        return rgb
