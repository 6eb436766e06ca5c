"""Linear image attention for the discriminator.

Replicates the third-party ``ImageLinearAttention`` used by the reference
(imported at histoGAN/histoGAN.py:33, wired at :594-598 as
Residual(Rezero(attn)) x2 per selected layer): 1x1 convs to q/k/v,
softmax(k over pixels) / softmax(q over key dim), linear-attention
contraction, 1x1 conv out. NHWC throughout; the two contractions are
plain MXU einsums.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from histogan_tpu.models.layers import TorchConv
from histogan_tpu.utils import inits


class ImageLinearAttention(nn.Module):
    chan: int
    key_dim: int = 64
    value_dim: int = 64
    heads: int = 8
    norm_queries: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, _ = x.shape
        n = h * w
        q = TorchConv(self.key_dim * self.heads, 1, use_bias=False, name="to_q")(x)
        k = TorchConv(self.key_dim * self.heads, 1, use_bias=False, name="to_k")(x)
        v = TorchConv(self.value_dim * self.heads, 1, use_bias=False, name="to_v")(x)

        def split(t, dim):
            return t.reshape(b, n, self.heads, dim)

        q = split(q, self.key_dim) * (self.key_dim ** -0.25)
        k = split(k, self.key_dim) * (self.key_dim ** -0.25)
        v = split(v, self.value_dim)

        k = jax.nn.softmax(k, axis=1)  # over pixels
        if self.norm_queries:
            q = jax.nn.softmax(q, axis=-1)  # over key dim

        context = jnp.einsum("bnhd,bnhe->bhde", k, v)
        out = jnp.einsum("bnhd,bhde->bnhe", q, context)
        out = out.reshape(b, h, w, self.heads * self.value_dim)
        return TorchConv(self.chan, 1, name="to_out")(out)


class RezeroResidual(nn.Module):
    """Residual(Rezero(fn)) from the reference helper classes
    (histoGAN/histoGAN.py:90-106): x + g * fn(x), g initialized to 0."""

    chan: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        g = self.param("g", inits.zeros, (1,))
        return x + g * ImageLinearAttention(self.chan, name="attn")(x)
