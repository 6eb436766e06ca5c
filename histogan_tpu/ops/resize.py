"""Image resizing helpers with torch-interpolate semantics.

torch F.interpolate(mode='bilinear', align_corners=False) and
jax.image.resize(method='bilinear', antialias=False) both use half-pixel
sample centers; parity is verified at float precision in tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """2x bilinear upsample, NHWC (reference nn.Upsample(scale_factor=2,
    mode='bilinear', align_corners=False), histoGAN/histoGAN.py:447)."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear", antialias=False)


def resize_bilinear(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize to (H, W), NHWC, no antialias (torch semantics)."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, size[0], size[1], c), method="bilinear", antialias=False)
