"""DiffGrad optimizer as an optax GradientTransformation.

The reference trains both G and D with torch_optimizer.DiffGrad
(lr, betas=(0.5, 0.9)) (histoGAN/histoGAN.py:28, 670-671;
ReHistoGAN/rehistoGAN.py:677-678). DiffGrad is Adam with the first
moment scaled by a "friction" coefficient
``dfc = sigmoid(|g_prev - g|)`` (Dubey et al., 2019): updates shrink
toward half-size where the gradient is locally stable.

Update rule (matching torch_optimizer's implementation):

    m_t = b1 m + (1-b1) g           v_t = b2 v + (1-b2) g^2
    dfc = 1 / (1 + exp(-|g_prev - g|))
    p  -= lr * sqrt(1-b2^t)/(1-b1^t) * dfc * m_t / (sqrt(v_t) + eps)

TPU layout: one fusion per parameter leaf (default). A flat layout
(``flat=True``: ONE contiguous vector per moment via ravel_pytree, one
fusion total) was hypothesized faster but MEASURED SLOWER on v5e-1
(99.8M params / 124 leaves, fp32: per-leaf 10.25 ms vs flat 13.98 ms —
the ravel concat + unravel split copies cost more than the per-fusion
overhead they remove). Kept as an option with an exact-equality test;
the element math is identical either way.
"""

from __future__ import annotations

from typing import NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree


class DiffGradState(NamedTuple):
    count: chex.Array
    exp_avg: optax.Updates
    exp_avg_sq: optax.Updates
    previous_grad: optax.Updates


def diffgrad(
    learning_rate: float,
    b1: float = 0.5,
    b2: float = 0.9,
    eps: float = 1e-8,
    flat: bool = False,
    state_dtype=None,
) -> optax.GradientTransformation:
    """``state_dtype=jnp.bfloat16`` stores the three optimizer trees
    (m, v, previous_grad) in bf16 while keeping ALL update math and the
    master params fp32 — the update reads+writes 6 tree-sized buffers
    per phase, ~4.6 GiB/step of the flagship step's HBM traffic
    (docs/DESIGN.md r3 roofline), and bf16 state halves it. Opt-in perf
    knob: the stored moments lose ~8 mantissa bits (bf16 keeps fp32's
    exponent range, so no clipping), which perturbs sqrt(v)-normalized
    update magnitudes by ~0.4% — default stays fp32 (reference
    numerics)."""
    sdt = state_dtype

    def _state_zeros(x):
        return jnp.zeros(x.shape, sdt or x.dtype)

    def init_fn(params):
        if flat:
            flat0, _ = ravel_pytree(params)
            return DiffGradState(
                count=jnp.zeros([], jnp.int32),
                exp_avg=_state_zeros(flat0),
                exp_avg_sq=_state_zeros(flat0),
                previous_grad=_state_zeros(flat0),
            )
        zeros = jax.tree_util.tree_map(_state_zeros, params)
        return DiffGradState(
            count=jnp.zeros([], jnp.int32),
            exp_avg=zeros,
            exp_avg_sq=jax.tree_util.tree_map(_state_zeros, params),
            previous_grad=jax.tree_util.tree_map(_state_zeros, params),
        )

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        b1c = 1.0 - b1 ** count.astype(jnp.float32)
        b2c = 1.0 - b2 ** count.astype(jnp.float32)
        step_size = learning_rate * jnp.sqrt(b2c) / b1c

        if flat:
            g, unravel = ravel_pytree(updates)
            m2 = b1 * state.exp_avg.astype(g.dtype) + (1 - b1) * g
            v2 = b2 * state.exp_avg_sq.astype(g.dtype) + (1 - b2) * g * g
            dfc = jax.nn.sigmoid(
                jnp.abs(state.previous_grad.astype(g.dtype) - g))
            upd = -step_size * dfc * m2 / (jnp.sqrt(v2) + eps)
            return unravel(upd), DiffGradState(
                count=count,
                exp_avg=m2.astype(sdt or m2.dtype),
                exp_avg_sq=v2.astype(sdt or v2.dtype),
                previous_grad=g.astype(sdt or g.dtype),
            )

        # single pass per leaf (one XLA fusion each) — measured ~4x faster
        # than chained tree_maps on TPU (kernel-launch bound over many
        # small parameter leaves). With state_dtype the casts fuse into
        # the same pass: fp32 math, narrow loads/stores.
        def _leaf(g, m, v, gp):
            m2 = b1 * m.astype(g.dtype) + (1 - b1) * g
            v2 = b2 * v.astype(g.dtype) + (1 - b2) * g * g
            dfc = jax.nn.sigmoid(jnp.abs(gp.astype(g.dtype) - g))
            upd = -step_size * dfc * m2 / (jnp.sqrt(v2) + eps)
            return upd, m2.astype(sdt or m2.dtype), v2.astype(sdt or v2.dtype)

        flat_g, treedef = jax.tree_util.tree_flatten(updates)
        flat_m = treedef.flatten_up_to(state.exp_avg)
        flat_v = treedef.flatten_up_to(state.exp_avg_sq)
        flat_p = treedef.flatten_up_to(state.previous_grad)
        outs = [_leaf(g, m, v, gp)
                for g, m, v, gp in zip(flat_g, flat_m, flat_v, flat_p)]
        new_updates = jax.tree_util.tree_unflatten(treedef, [o[0] for o in outs])
        exp_avg = jax.tree_util.tree_unflatten(treedef, [o[1] for o in outs])
        exp_avg_sq = jax.tree_util.tree_unflatten(treedef, [o[2] for o in outs])
        prev = updates if sdt is None else jax.tree_util.tree_map(
            lambda g: g.astype(sdt), updates)
        return new_updates, DiffGradState(
            count=count,
            exp_avg=exp_avg,
            exp_avg_sq=exp_avg_sq,
            previous_grad=prev,
        )

    return optax.GradientTransformation(init_fn, update_fn)
