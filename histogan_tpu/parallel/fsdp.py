"""ZeRO-3-style fully-sharded training state over the 'data' mesh axis.

The reference is single-GPU (histoGAN/histoGAN.py:46-47, CUDA assert) so
it has no analogue; this is the TPU-native scaling path for models whose
training state outgrows one chip's HBM. The concrete customer is the
512px capacity-16 histoGAN: 680.5M params ≈ 12.5 GB of fp32 training
state (BASELINE.md 512px note) — at the edge of one 16 GB v5e chip, but
~1.6 GB/chip sharded over an 8-chip slice.

Design: pure GSPMD, no hand-written collectives. Every state leaf
(master params, DiffGrad moments & previous-grad copies, EMA copies) is
laid out sharded along ONE dimension over the 'data' mesh axis, and the
train step is jitted with matching ``out_shardings``. XLA's SPMD
partitioner then inserts the all-gathers (weights, at each use) and
reduce-scatters (gradients) over ICI on its own. The step code is
IDENTICAL to the replicated path — which is what makes the
sharded-vs-replicated equality tests meaningful
(tests/test_parallel.py::test_fsdp_*).

Leaf rule (``fsdp_spec``): shard the largest dimension divisible by the
mesh axis size, ties broken toward the trailing axis — the feature axis,
the natural layout for HWIO conv kernels and (I, O) dense kernels.
Leaves with no divisible dimension (odd-width biases, scalars, step
counters) stay replicated; their bytes are negligible next to the
kernels.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def fsdp_spec(shape, n: int, axis_name: str = "data") -> P:
    """PartitionSpec sharding the largest ``n``-divisible dim of ``shape``
    (trailing dim wins ties); fully replicated if none divides."""
    best = None
    for i, d in enumerate(shape):
        if d % n == 0 and d > 0 and (best is None or d >= shape[best]):
            best = i
    if best is None:
        return P()
    spec = [None] * len(shape)
    spec[best] = axis_name
    return P(*spec)


def state_shardings(tree: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """Pytree of NamedShardings mirroring ``tree`` under the FSDP rule."""
    n = mesh.shape[axis_name]

    def one(x):
        return NamedSharding(mesh, fsdp_spec(tuple(x.shape), n, axis_name))

    return jax.tree_util.tree_map(one, tree)


def shard_state(tree: Any, mesh: Mesh,
                shardings: Optional[Any] = None,
                axis_name: str = "data") -> Any:
    """Place a (host or replicated) state pytree sharded per the FSDP rule."""
    if shardings is None:
        shardings = state_shardings(tree, mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), tree, shardings
    )


def unshard(tree: Any, mesh: Mesh) -> Any:
    """All-gather a sharded pytree back to fully replicated.

    Runs as a jitted identity with replicated out_shardings — a device-
    side collective, so it also works on multi-host meshes where
    ``jax.device_get`` of a sharded array would touch non-addressable
    shards. Used by checkpoint save/restore templating."""
    target = jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P()), tree
    )
    return jax.jit(lambda t: t, out_shardings=target)(tree)


def sharded_bytes_per_device(tree: Any) -> int:
    """Bytes of ``tree`` held by THIS process's first addressable device
    (diagnostic for the memory win; replicated leaves count in full)."""
    total = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        shards = getattr(leaf, "addressable_shards", None)
        if shards:
            dev0 = [s for s in shards if s.device == shards[0].device]
            total += sum(s.data.nbytes for s in dev0)
        else:
            total += leaf.nbytes
    return total
