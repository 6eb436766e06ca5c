"""StyleGAN2 modulated convolution, TPU-first.

The reference (histoGAN/histoGAN.py:404-440) materializes per-sample
weights ``W * (s+1)`` and runs a grouped conv with ``groups=batch`` — a
CUDA-friendly trick that is hostile to the TPU MXU (tiny per-group
contractions, weight tensor of size B*O*I*k*k rebuilt every call).

Here we use the algebraically identical factorization (used by the
official StyleGAN2 "fused=False" path):

    conv(x_b, W * (s_b+1))            == conv(x_b * (s_b+1), W)
    demod d_b[o] = rsqrt(sum_{i,k,k} (W[o,i]*(s_b[i]+1))^2 + eps)
                 == rsqrt(einsum(W^2, (s_b+1)^2) + eps)

i.e. scale the input channels per sample, run ONE shared-weight batched
convolution (perfect MXU shape), then rescale output channels per sample.
Exact same math, no per-sample weight tensor, no grouped conv.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-8  # reference histoGAN/histoGAN.py:53, used in demod at :428


def same_padding(size: int, kernel: int, stride: int = 1, dilation: int = 1) -> int:
    """Reference padding rule (histoGAN/histoGAN.py:417-418); for the
    stride/dilation actually used (1/1) this is (kernel-1)//2."""
    return ((size - 1) * (stride - 1) + dilation * (kernel - 1)) // 2


def conv2d_mod(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    style: jnp.ndarray,
    *,
    demod: bool = True,
    eps: float = EPS,
) -> jnp.ndarray:
    """Modulated conv2d.

    Args:
      x: (B, H, W, Cin) NHWC input.
      weight: (kh, kw, Cin, Cout) HWIO shared filter.
      style: (B, Cin) per-sample modulation; the effective filter for
        sample b is ``weight * (style[b] + 1)`` per input channel.
      demod: apply weight demodulation (histoGAN/histoGAN.py:427-429).

    Returns: (B, H, W, Cout).
    """
    kh = weight.shape[0]
    pad = same_padding(x.shape[1], kh)
    s = style + 1.0  # (B, Cin)
    out = jax.lax.conv_general_dilated(
        x * s[:, None, None, :],
        weight,
        window_strides=(1, 1),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if demod:
        d = jax.lax.rsqrt(
            jnp.einsum("hwio,bi->bo", jnp.square(weight), jnp.square(s)) + eps
        )
        out = out * d[:, None, None, :]
    return out
