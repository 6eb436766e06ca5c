"""Differentiable color-histogram features, TPU-first.

Re-implements the behavior of the reference's histogram blocks
(/root/reference/histogram_classes/RGBuvHistBlock.py:28-228,
rgChromaHistBlock.py, LabHistBlock.py) as a single vectorized JAX
function.  Design differences from the reference (deliberate, TPU-first):

- **No per-image Python loop.** The reference unbinds the batch and runs
  one (N, h) x (N, h) matmul chain per image (RGBuvHistBlock.py:103-222).
  Here the whole batch is one batched contraction
  ``einsum('bnu,bnv->buv')`` that XLA tiles onto the MXU.
- **NHWC native.** TPU convolutions and image ops are NHWC; the
  functional core takes (B, H, W, 3).  The class wrappers accept NCHW for
  reference-API familiarity.
- **fp32 throughout.** The reference mixes float64 bin centers
  (np.linspace via torch.tensor, RGBuvHistBlock.py:117-119) with fp32
  images, computing kernels in f64 and casting back.  We stay in fp32
  with ``Precision.HIGHEST`` matmuls; measured parity vs the reference is
  well under the 1e-5 L1 target (see tests/test_histogram.py).
- Explicit, jit-stable config: every option is a static kwarg, so each
  (shape, config) pair compiles once and is cached.

Output layout matches the reference exactly: (B, C, h, h) with C = 3 for
RGB-uv (or 1 when ``green_only``), C = 1 for rg-chroma and Lab, L1-
normalized over all bins per image (RGBuvHistBlock.py:224-227).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

EPS = 1e-6  # reference: histogram_classes/RGBuvHistBlock.py:25

_SPACES = ("rgb-uv", "rg-chroma", "lab")
_METHODS = ("thresholding", "RBF", "inverse-quadratic")
_RESIZINGS = ("interpolation", "sampling")


def _resize_if_needed(x: jnp.ndarray, insz: int, h: int, resizing: str) -> jnp.ndarray:
    """Reference resize semantics (RGBuvHistBlock.py:77-95).

    - Only resizes when H > insz or W > insz (both dims forced to insz,
      aspect be damned — reference quirk, kept).
    - 'interpolation': bilinear, half-pixel centers, no antialias
      (matches torch F.interpolate align_corners=False).
    - 'sampling': picks ``h`` (NOT insz — reference quirk, kept) rows/cols
      at floor(linspace(0, dim, h, endpoint=False)).
    """
    b, hh, ww, c = x.shape
    if hh <= insz and ww <= insz:
        return x
    if resizing == "interpolation":
        return jax.image.resize(x, (b, insz, insz, c), method="bilinear", antialias=False)
    if resizing == "sampling":
        rows = np.linspace(0, hh, num=h, endpoint=False).astype(np.int64)
        cols = np.linspace(0, ww, num=h, endpoint=False).astype(np.int64)
        return x[:, rows][:, :, cols]
    raise ValueError(
        f"Wrong resizing method. It should be: interpolation or sampling. "
        f"But the given value is {resizing}."
    )


def _bin_kernel(diff: jnp.ndarray, method: str, sigma: float, thresh_eps: float) -> jnp.ndarray:
    """Per-bin soft assignment kernel (RGBuvHistBlock.py:124-144)."""
    if method == "thresholding":
        return (diff <= thresh_eps / 2).astype(jnp.float32)
    d2 = jnp.square(diff) / (sigma ** 2)
    if method == "RBF":
        return jnp.exp(-d2)
    if method == "inverse-quadratic":
        return 1.0 / (1.0 + d2)
    raise ValueError(
        f"Wrong kernel method. It should be either thresholding, RBF, "
        f"inverse-quadratic. But the given value is {method}."
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "space",
        "h",
        "insz",
        "resizing",
        "method",
        "sigma",
        "intensity_scale",
        "boundary",
        "green_only",
    ),
)
def histogram_feature(
    x: jnp.ndarray,
    *,
    space: str = "rgb-uv",
    h: int = 64,
    insz: int = 150,
    resizing: str = "interpolation",
    method: str = "inverse-quadratic",
    sigma: float = 0.02,
    intensity_scale: bool = True,
    boundary: Tuple[float, float] = (-3.0, 3.0),
    green_only: bool = False,
) -> jnp.ndarray:
    """Differentiable color histogram of an NHWC image batch.

    Args:
      x: (B, H, W, 3+) float array; values clamped to [0, 1]. Extra
        channels beyond 3 (RGBA) are dropped, like the reference
        (RGBuvHistBlock.py:98-99).
      space: 'rgb-uv' (log-chroma, the HistoGAN feature), 'rg-chroma', or
        'lab' (input already Lab-encoded in [0,1]).
      h: histogram bins per axis.
      insz: resize threshold/target (see _resize_if_needed).
      resizing: 'interpolation' | 'sampling'.
      method: 'thresholding' | 'RBF' | 'inverse-quadratic'.
      sigma: kernel bandwidth for RBF / inverse-quadratic.
      intensity_scale: weight pixels by intensity (I_y in Eq. 2 of the
        paper). Reference defaults: True for rgb-uv, False otherwise.
      boundary: histogram boundary; reference defaults (-3, 3) for rgb-uv
        and (0, 1) for rg-chroma / lab.
      green_only: rgb-uv only — emit just the g-chroma plane (B,1,h,h).

    Returns:
      (B, C, h, h) float32, L1-normalized over all C*h*h bins per image.
    """
    if space not in _SPACES:
        raise ValueError(f"unknown space {space!r}; expected one of {_SPACES}")
    lo, hi = float(boundary[0]), float(boundary[1])
    if lo > hi:
        lo, hi = hi, lo
    thresh_eps = (abs(lo) + abs(hi)) / h

    x = jnp.clip(x.astype(jnp.float32), 0.0, 1.0)
    x = _resize_if_needed(x, insz, h, resizing)
    if x.shape[-1] > 3:
        x = x[..., :3]
    b = x.shape[0]
    flat = x.reshape(b, -1, 3)  # (B, N, 3) — row-major pixel order, same as ref
    r, g, bl = flat[..., 0], flat[..., 1], flat[..., 2]

    centers = jnp.asarray(np.linspace(lo, hi, num=h), dtype=jnp.float32)

    if space == "rgb-uv":
        log_r = jnp.log(r + EPS)
        log_g = jnp.log(g + EPS)
        log_b = jnp.log(bl + EPS)
        if green_only:
            pairs = [(log_g - log_r, log_g - log_b)]
        else:
            pairs = [
                (log_r - log_g, log_r - log_b),
                (log_g - log_r, log_g - log_b),
                (log_b - log_r, log_b - log_g),
            ]
        if intensity_scale:
            iy = jnp.sqrt(r * r + g * g + bl * bl + EPS)
        else:
            iy = jnp.ones_like(r)
    elif space == "rg-chroma":
        s = r + g + bl + EPS
        pairs = [(r / s, g / s)]
        if intensity_scale:
            iy = jnp.sqrt(r * r + g * g + bl * bl + EPS)
        else:
            iy = jnp.ones_like(r)
    else:  # lab: channels are (L, a, b); chroma planes over (a, b)
        pairs = [(g, bl)]  # I[:, 1], I[:, 2] — LabHistBlock.py:110-112
        iy = r if intensity_scale else jnp.ones_like(r)  # I_l = L channel

    planes = []
    for u, v in pairs:
        ku = _bin_kernel(jnp.abs(u[..., None] - centers), method, sigma, thresh_eps)
        kv = _bin_kernel(jnp.abs(v[..., None] - centers), method, sigma, thresh_eps)
        # hist[b, i, j] = sum_n Iy[b,n] * ku[b,n,i] * kv[b,n,j] — one batched
        # MXU contraction instead of the reference's per-image torch.mm
        # (RGBuvHistBlock.py:147-148).
        plane = jnp.einsum(
            "bnu,bnv->buv",
            iy[..., None] * ku,
            kv,
            precision=jax.lax.Precision.HIGHEST,
        )
        planes.append(plane)

    hists = jnp.stack(planes, axis=1)  # (B, C, h, h)
    total = jnp.sum(hists, axis=(1, 2, 3), keepdims=True)
    return hists / (total + EPS)


@dataclasses.dataclass(frozen=True)
class HistBlock:
    """Reference-shaped wrapper around :func:`histogram_feature`.

    Mirrors the constructor surface of the reference blocks
    (histogram_classes/*.py) so configs port 1:1. ``data_format`` selects
    the input layout; the reference is NCHW, the TPU-native core is NHWC.
    """

    space: str = "rgb-uv"
    h: int = 64
    insz: int = 150
    resizing: str = "interpolation"
    method: str = "inverse-quadratic"
    sigma: float = 0.02
    intensity_scale: bool = True
    hist_boundary: Optional[Sequence[float]] = None
    green_only: bool = False
    data_format: str = "NHWC"

    def _boundary(self) -> Tuple[float, float]:
        if self.hist_boundary is not None:
            b = sorted(float(v) for v in self.hist_boundary)
            return (b[0], b[-1])
        return (-3.0, 3.0) if self.space == "rgb-uv" else (0.0, 1.0)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = jnp.asarray(x)
        if x.ndim == 3:
            x = x[None]
        if self.data_format == "NCHW":
            x = jnp.transpose(x, (0, 2, 3, 1))
        return histogram_feature(
            x,
            space=self.space,
            h=self.h,
            insz=self.insz,
            resizing=self.resizing,
            method=self.method,
            sigma=self.sigma,
            intensity_scale=self.intensity_scale,
            boundary=self._boundary(),
            green_only=self.green_only,
        )


def RGBuvHistBlock(**kwargs) -> HistBlock:
    """RGB-uv log-chroma histogram (reference RGBuvHistBlock.py:28)."""
    kwargs.setdefault("intensity_scale", True)
    kwargs.pop("device", None)  # reference API compat; meaningless under JAX
    return HistBlock(space="rgb-uv", **kwargs)


def rgChromaHistBlock(**kwargs) -> HistBlock:
    """rg-chroma histogram (reference rgChromaHistBlock.py:28)."""
    kwargs.setdefault("intensity_scale", False)
    kwargs.pop("device", None)
    kwargs.pop("green_only", None)
    return HistBlock(space="rg-chroma", **kwargs)


def LabHistBlock(**kwargs) -> HistBlock:
    """Lab a/b histogram (reference LabHistBlock.py:29). Input must already
    be Lab-encoded and scaled to [0, 1]."""
    kwargs.setdefault("intensity_scale", False)
    kwargs.pop("device", None)
    kwargs.pop("green_only", None)
    return HistBlock(space="lab", **kwargs)
