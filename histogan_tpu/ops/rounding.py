"""Stochastic rounding fp32 -> bf16 for long-horizon accumulators.

Why this exists: an EMA with decay 0.995 adds increments of ~0.5% of
the running value per application. bf16 keeps 8 bits of precision, so
round-to-nearest kills any increment below ~half an ulp (~0.2-0.4%
relative) — a plain-truncated bf16 EMA *stalls* up to ~40% away from
the value it is tracking (measured in tests/test_ema.py::
test_bf16_truncation_ema_stalls). Stochastic rounding keeps the store
unbiased (E[round(x)] == x), so sub-ulp increments land with
probability increment/ulp and the EMA converges in expectation.

This is the standard large-scale-training fix for low-precision state
(TPU hardware has SR in some matmul paths; XLA exposes no SR convert,
so we roll it in-fusion): add uniform random bits below the bf16
mantissa cutoff, then truncate. The RNG + integer ops fuse into the
same elementwise pass as the store, so on a bytes-bound step the cost
is zero — the win is the halved HBM read+write of the accumulator.

No reference counterpart (torch reference keeps every buffer fp32);
used by the opt-in ``ema_dtype='bf16'`` knob (train/steps.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def stochastic_round_bf16(x: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """Unbiasedly round an fp32 array to bf16.

    bf16 is fp32 with the low 16 mantissa bits dropped. Adding uniform
    random bits in [0, 2^16) to the raw fp32 bit pattern and masking
    the low 16 bits rounds down with probability (1 - frac) and up with
    probability frac, where frac is the position of x between its two
    neighbouring bf16 values — i.e. E[result] == x exactly.

    Properties (pinned in tests/test_ema.py):
    - values already representable in bf16 pass through EXACTLY
      (low bits are zero; the added bits mask away, no carry);
    - the carry from mantissa overflow correctly bumps the exponent
      (IEEE754 bit patterns are monotonic in magnitude);
    - sign untouched (sign-magnitude layout): rounding is unbiased
      per-magnitude, hence unbiased overall.

    Not meaningful for NaN/inf inputs (a NaN stays NaN-like; training
    NaN handling lives upstream in the trainer's rollback).
    """
    if x.dtype != jnp.float32:
        raise TypeError(f"stochastic_round_bf16 expects float32, got {x.dtype}")
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    rnd = jax.random.bits(key, x.shape, jnp.uint32) & jnp.uint32(0xFFFF)
    rounded = (bits + rnd) & jnp.uint32(0xFFFF0000)
    # the masked pattern is exactly bf16-representable -> astype is exact
    return jax.lax.bitcast_convert_type(rounded, jnp.float32).astype(jnp.bfloat16)


def tree_stochastic_round_bf16(tree, key: jax.Array):
    """Stochastically round every fp32 leaf of a pytree to bf16, one
    derived key per leaf (leaf order is the tree-flatten order, so the
    stream is deterministic for a fixed tree structure)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    keys = jax.random.split(key, len(leaves))
    return jax.tree_util.tree_unflatten(
        treedef,
        [stochastic_round_bf16(x, k) for x, k in zip(leaves, keys)],
    )
