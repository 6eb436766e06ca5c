"""Fused Pallas TPU kernel for the RGB-uv histogram feature.

The XLA path (ops/histogram.py) materializes six (B, N, 64) kernel
tensors in HBM per call. This kernel streams pixel tiles through VMEM,
builds the per-tile bin kernels on the VPU and accumulates the three
64x64 histogram planes on the MXU — HBM traffic drops from
O(B*N*64*6) to O(B*N*8) + O(B*3*64*64).

Covers the training-loss configuration: rgb-uv space,
inverse-quadratic kernel, intensity scale on (the reference's defaults,
RGBuvHistBlock.py:29-31). Other configs fall back to the XLA path.

Layout: chroma/intensity are packed OUTSIDE the kernel as
(B, N, 8) = [u0, v0, u1, v1, u2, v2, iy, 0] — the packing is pure
elementwise JAX (autodiff'd normally); only the big contraction carries
a custom VJP (Pallas backward kernel, derivatives derived in
_bwd_kernel's docstring).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-6
H_BINS = 64
TILE = 512


def _centers() -> np.ndarray:
    return np.linspace(-3.0, 3.0, H_BINS).astype(np.float32)


def _fwd_kernel(packed_ref, centers_ref, out_ref, *, inv_sigma2: float):
    t = pl.program_id(1)
    data = packed_ref[0]  # (TILE, 8)
    centers = centers_ref[:]  # (1, 64)
    iy = data[:, 6:7]

    for c in range(3):
        u = data[:, 2 * c : 2 * c + 1]
        v = data[:, 2 * c + 1 : 2 * c + 2]
        ku = 1.0 / (1.0 + jnp.square(u - centers) * inv_sigma2)
        kv = 1.0 / (1.0 + jnp.square(v - centers) * inv_sigma2)
        plane = jax.lax.dot_general(
            iy * ku, kv, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (64, 64)

        @pl.when(t == 0)
        def _():
            out_ref[0, c] = plane

        @pl.when(t != 0)
        def _():
            out_ref[0, c] += plane


def _bwd_kernel(packed_ref, centers_ref, g_ref, dpacked_ref, *, inv_sigma2: float):
    """Gradient w.r.t. the packed tile.

    For one plane with g = dL/dhist (64, 64):
      dku[n,i] = iy_n * (kv @ g^T)[n,i]
      dkv[n,j] = ((iy*ku) @ g)[n,j]
      du[n]    = sum_i dku[n,i] * (-2 (u_n - c_i) inv_sigma2 * ku[n,i]^2)
      dv[n]    = sum_j dkv[n,j] * (-2 (v_n - c_j) inv_sigma2 * kv[n,j]^2)
      diy[n]   = sum_i ku[n,i] * (kv @ g^T)[n,i]
    """
    data = packed_ref[0]  # (TILE, 8)
    centers = centers_ref[:]  # (1, 64)
    iy = data[:, 6:7]

    outs = []
    diy_total = jnp.zeros((data.shape[0], 1), jnp.float32)
    for c in range(3):
        u = data[:, 2 * c : 2 * c + 1]
        v = data[:, 2 * c + 1 : 2 * c + 2]
        du_arg = u - centers
        dv_arg = v - centers
        ku = 1.0 / (1.0 + jnp.square(du_arg) * inv_sigma2)
        kv = 1.0 / (1.0 + jnp.square(dv_arg) * inv_sigma2)
        g = g_ref[0, c]  # (64, 64)

        kvg = jax.lax.dot_general(  # (TILE, 64) = kv @ g^T
            kv, g, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        kug = jax.lax.dot_general(  # (TILE, 64) = (iy*ku) @ g
            iy * ku, g, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dku = iy * kvg
        du = jnp.sum(dku * (-2.0 * du_arg * inv_sigma2) * jnp.square(ku),
                     axis=1, keepdims=True)
        dv = jnp.sum(kug * (-2.0 * dv_arg * inv_sigma2) * jnp.square(kv),
                     axis=1, keepdims=True)
        diy_total += jnp.sum(ku * kvg, axis=1, keepdims=True)
        outs.extend([du, dv])

    zero = jnp.zeros_like(diy_total)
    dpacked_ref[0] = jnp.concatenate(outs + [diy_total, zero], axis=1)


def _pad_pixels(packed: jnp.ndarray) -> jnp.ndarray:
    n = packed.shape[1]
    pad = (-n) % TILE
    if pad:
        packed = jnp.pad(packed, ((0, 0), (0, pad), (0, 0)))
    return packed


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _hist_core(packed: jnp.ndarray, inv_sigma2: float, interpret: bool):
    return _hist_core_fwd_call(packed, inv_sigma2, interpret)


def _hist_core_fwd_call(packed, inv_sigma2, interpret):
    b, n, _ = packed.shape
    grid = (b, n // TILE)
    centers = jnp.asarray(_centers())[None, :]
    return pl.pallas_call(
        functools.partial(_fwd_kernel, inv_sigma2=inv_sigma2),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TILE, 8), lambda i, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H_BINS), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, H_BINS, H_BINS),
                               lambda i, t: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 3, H_BINS, H_BINS), jnp.float32),
        interpret=interpret,
    )(packed, centers)


def _hist_core_fwd(packed, inv_sigma2, interpret):
    return _hist_core_fwd_call(packed, inv_sigma2, interpret), packed


def _hist_core_bwd(inv_sigma2, interpret, packed, g):
    b, n, _ = packed.shape
    grid = (b, n // TILE)
    centers = jnp.asarray(_centers())[None, :]
    dpacked = pl.pallas_call(
        functools.partial(_bwd_kernel, inv_sigma2=inv_sigma2),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TILE, 8), lambda i, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H_BINS), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, H_BINS, H_BINS), lambda i, t: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE, 8), lambda i, t: (i, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(packed.shape, jnp.float32),
        interpret=interpret,
    )(packed, centers, g)
    return (dpacked,)


_hist_core.defvjp(_hist_core_fwd, _hist_core_bwd)


def pack_pixels(x: jnp.ndarray) -> jnp.ndarray:
    """(B, N, 3) clamped pixels -> (B, N_padded, 8) [u0 v0 u1 v1 u2 v2 iy 0].

    Log-chroma projections per RGBuvHistBlock.py:112-115/150-153/190-193;
    intensity per :106-108. Pure elementwise (autodiff flows through)."""
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    lr, lg, lb = jnp.log(r + EPS), jnp.log(g + EPS), jnp.log(b + EPS)
    iy = jnp.sqrt(r * r + g * g + b * b + EPS)
    packed = jnp.stack(
        [lr - lg, lr - lb, lg - lr, lg - lb, lb - lr, lb - lg,
         iy, jnp.zeros_like(iy)],
        axis=-1,
    )
    return _pad_pixels(packed)


def histogram_feature_pallas(
    x: jnp.ndarray,
    *,
    h: int = 64,
    insz: int = 150,
    resizing: str = "interpolation",
    sigma: float = 0.02,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for histogram_feature(space='rgb-uv',
    method='inverse-quadratic', intensity_scale=True, h=64)."""
    assert h == H_BINS, "pallas kernel is specialized for 64 bins"
    from histogan_tpu.ops.histogram import _resize_if_needed

    x = jnp.clip(x.astype(jnp.float32), 0.0, 1.0)
    x = _resize_if_needed(x, insz, h, resizing)
    if x.shape[-1] > 3:
        x = x[..., :3]
    bsz = x.shape[0]
    flat = x.reshape(bsz, -1, 3)
    packed = pack_pixels(flat)
    hists = _hist_core(packed, float(1.0 / (sigma * sigma)), interpret)
    total = jnp.sum(hists, axis=(1, 2, 3), keepdims=True)
    return hists / (total + EPS)
