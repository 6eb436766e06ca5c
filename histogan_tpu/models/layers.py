"""Torch-init-compatible primitive layers (NHWC).

Thin wrappers over flax that reproduce the reference's initialization
scheme (see histogan_tpu.utils.inits) so converted checkpoints and
from-scratch training match the reference's statistics.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from histogan_tpu.utils import inits


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.2) -> jnp.ndarray:
    """Reference default activation (histoGAN/histoGAN.py:192-193)."""
    return jax.nn.leaky_relu(x, negative_slope)


class TorchLinear(nn.Module):
    """nn.Linear with kaiming-normal weight and torch-default uniform bias.

    ``zero_init`` reproduces the zeroed noise projections
    (histoGAN/histoGAN.py:692-696).
    """

    features: int
    use_bias: bool = True
    zero_init: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        w_init = inits.zeros if self.zero_init else inits.kaiming_normal
        kernel = self.param("kernel", w_init, (in_features, self.features))
        y = x @ kernel
        if self.use_bias:
            b_init = inits.zeros if self.zero_init else inits.torch_default_bias(in_features)
            y = y + self.param("bias", b_init, (self.features,))
        return y


class TorchConv(nn.Module):
    """nn.Conv2d (NHWC/HWIO) with kaiming weight + torch-default bias."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        k = self.kernel_size
        kernel = self.param("kernel", inits.kaiming_normal, (k, k, in_ch, self.features))
        p = self.padding
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(self.stride, self.stride),
            padding=[(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            fan_in = in_ch * k * k
            y = y + self.param("bias", inits.torch_default_bias(fan_in), (self.features,))
        return y


class InstanceNorm(nn.Module):
    """nn.InstanceNorm2d with default torch args: no affine params, no
    running stats, eps=1e-5 (used by ReHistoGAN EncoderBlock,
    ReHistoGAN/rehistoGAN.py:490-495). NHWC: normalize over H, W."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.eps)
