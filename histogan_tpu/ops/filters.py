"""Fixed-kernel image filters used by ReHistoGAN losses.

Reference semantics (ReHistoGAN/rehistoGAN.py:207-254), quirks kept:
- Gaussian blur is depthwise, VALID padding (the reference nn.Conv2d has
  padding=0, so the blurred image shrinks by kernel_size-1).
- Laplacian/Sobel use a (1, C, 3, 3) kernel — ONE output channel that
  SUMS the response over all input channels, with SAME padding.

All functions are NHWC.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

_LAPLACIAN = np.array([[0.0, 1.0, 0.0], [1.0, -4.0, 1.0], [0.0, 1.0, 0.0]], np.float32)
_SOBEL_X = np.array([[1.0, 0.0, -1.0], [2.0, 0.0, -2.0], [1.0, 0.0, -1.0]], np.float32)
_SOBEL_Y = np.array([[1.0, 2.0, 1.0], [0.0, 0.0, 0.0], [-1.0, -2.0, -1.0]], np.float32)


def gaussian_kernel(kernel_size: int = 15, sigma: float = 3.0) -> jnp.ndarray:
    """2-D Gaussian normalized to sum 1 (ReHistoGAN/rehistoGAN.py:207-216)."""
    coords = np.arange(kernel_size, dtype=np.float32)
    xg, yg = np.meshgrid(coords, coords, indexing="xy")
    mean = (kernel_size - 1) / 2.0
    var = sigma ** 2
    k = (1.0 / (2.0 * math.pi * var)) * np.exp(
        -((xg - mean) ** 2 + (yg - mean) ** 2) / (2.0 * var)
    )
    return jnp.asarray(k / k.sum())


def gaussian_op(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Depthwise Gaussian blur, VALID padding (output shrinks), NHWC."""
    c = x.shape[-1]
    w = jnp.tile(kernel[:, :, None, None], (1, 1, 1, c))  # HWIO depthwise
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )


def _sum_channel_conv(x: jnp.ndarray, k3: np.ndarray) -> jnp.ndarray:
    """Apply a 3x3 kernel to every channel and SUM into one output channel,
    SAME padding — the reference's (1, C, 3, 3) expanded-kernel conv
    (ReHistoGAN/rehistoGAN.py:235-254)."""
    c = x.shape[-1]
    w = jnp.broadcast_to(jnp.asarray(k3)[:, :, None, None], (3, 3, c, 1))
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def laplacian_op(x: jnp.ndarray) -> jnp.ndarray:
    return _sum_channel_conv(x, _LAPLACIAN)


def sobel_op(x: jnp.ndarray, direction: int = 0) -> jnp.ndarray:
    return _sum_channel_conv(x, _SOBEL_X if direction == 0 else _SOBEL_Y)
