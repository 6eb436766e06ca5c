"""Latent mapping networks.

- StyleVectorizer: z -> w MLP (histoGAN/histoGAN.py:354-365).
- HistVectorizer: flattened histogram -> latent MLP
  (histoGAN/histoGAN.py:335-351).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from histogan_tpu.models.layers import TorchLinear, leaky_relu


class StyleVectorizer(nn.Module):
    emb: int = 512
    depth: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.depth):
            x = leaky_relu(TorchLinear(self.emb, name=f"fc{i}")(x))
        return x


class HistVectorizer(nn.Module):
    """Input: histogram feature (B, 3, h, h) (or pre-flattened (B, 3*h*h)).

    Layer widths follow the reference exactly: 3*h*h -> 2*emb -> emb ->
    emb ... (depth layers total), LeakyReLU(0.2) after each
    (histoGAN/histoGAN.py:339-348).
    """

    insize: int = 64  # histogram bins per axis (hist feature is 3 x h x h)
    emb: int = 512
    depth: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.reshape(x.shape[0], -1)
        widths = [2 * self.emb] + [self.emb] * (self.depth - 1)
        for i, w in enumerate(widths):
            x = leaky_relu(TorchLinear(w, name=f"fc{i}")(x))
        return x
