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
    mode='bilinear', align_corners=False), histoGAN/histoGAN.py:447).

    Perf note: a closed-form shifted-add + interleave formulation was
    tried and measured SLOWER than jax.image.resize's lowering on TPU
    v5e (4.9ms vs 2.8ms at (16,128,128,64)->2x bf16) — the sublane
    interleave forces relayouts. Keeping the XLA path."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear", antialias=False)


def resize_bilinear(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize to (H, W), NHWC, no antialias (torch semantics)."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, size[0], size[1], c), method="bilinear", antialias=False)
