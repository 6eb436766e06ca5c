"""Device-resident dataset: the decoded uint8 image cache and the
histogram pool live in HBM; per-step batches are device gathers.

Why: the reference streams JPEG decodes from host workers every step
(histoGAN/histoGAN.py:827-851). On TPU the steady-state host->device
feed is pure overhead — measured on this dev tunnel at 22 MB/s with a
35 ms latency floor and NO compute overlap, a 256px/batch-16 fp32 batch
costs 642 ms against an 83 ms step (docs/DESIGN.md round-2 e2e
attribution). HistoGAN-scale datasets are small (the reference's
landscape set, 4319 images @256px uint8, is ~850 MB), so the TPU-native
answer is to park the WHOLE dataset in HBM once and ship only ~100
bytes of indices + lerp ratios per step.

Sampling distribution is identical to TrainLoader: uniform image draws,
target hists = r*pool[i] + (1-r)*pool[j] with r ~ U[0,1)
(histoGAN/histoGAN.py:296-302, 179-181), or self-hist lookups for the
ReHistoGAN hist_sampling=False mode. Images stay uint8 on device; the
train step dequantizes (steps.dequantize_batch), which matches the host
float path bit-for-bit.

Not applicable when per-item augmentation needs host decode
(dataset_aug_prob > 0) — the Trainer's auto mode falls back to the
streaming TrainLoader then, or when the cache exceeds the HBM budget.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from histogan_tpu.parallel import batch_spec, replicate


# HBM budget for the auto mode (images + pool); the flagship model /
# optimizer / activations need the rest of the chip's 16 GB. The budget
# is PER DEVICE: a replicated cache must fit it outright, a sharded
# cache (shard_cache=True, 1/n of the rows per device) must fit it
# after division by the mesh size — an 8-chip slice holds 8x the data.
DEVICE_DATASET_BUDGET = 2 << 30


def device_dataset_mode(flag, dataset, pool, mesh,
                        dataset_aug_prob: float = 0.0):
    """Resolve the device-dataset flag to a cache placement:
    ``None`` (stream from host) | ``"replicated"`` | ``"sharded"``.

    Auto policy: replicate when the whole cache fits one device's budget
    (no per-step communication), shard across the mesh when it only
    fits collectively (VERDICT r2 #8 — the replicated design capped the
    dataset at 2 GiB regardless of mesh size)."""
    use = should_use_device_dataset(flag, dataset, pool, dataset_aug_prob,
                                    _budget_scale=mesh.shape["data"])
    if not use:
        return None
    nbytes = dataset._cache.nbytes + pool.pool.nbytes
    if nbytes <= DEVICE_DATASET_BUDGET:
        return "replicated"
    return "sharded"


def should_use_device_dataset(flag, dataset, pool,
                              dataset_aug_prob: float = 0.0,
                              _budget_scale: int = 1) -> bool:
    """Resolve the Trainer's device_dataset flag ("auto" | True | False).

    Eligible iff the decoded uint8 cache exists (cache_dir was set),
    per-item augmentation doesn't need host decode, and images + pool
    fit the HBM budget. True with an ineligible dataset raises.

    String flags are normalized ("true"/"false"/"auto", any case) and
    unknown strings raise — ``bool("false")`` is True, so passing the
    CLI's own surface value straight through would silently ENABLE the
    device dataset (ADVICE r2)."""
    if isinstance(flag, str):
        norm = flag.strip().lower()
        if norm in ("true", "1", "yes"):
            flag = True
        elif norm in ("false", "0", "no"):
            flag = False
        elif norm == "auto":
            flag = "auto"
        else:
            raise ValueError(
                f"device_dataset={flag!r}: expected True/False/'auto' "
                "(or the strings 'true'/'false'/'auto')"
            )
    if flag is False:
        return False
    cache = getattr(dataset, "_cache", None)
    eligible = (
        cache is not None
        and dataset_aug_prob == 0.0
        and (cache.nbytes + pool.pool.nbytes
             <= DEVICE_DATASET_BUDGET * _budget_scale)
    )
    if flag == "auto":
        return eligible
    if flag is True and not eligible:
        raise ValueError(
            "device_dataset=True but the dataset is not eligible (needs "
            "a decoded cache, dataset_aug_prob=0, and <= "
            f"{(DEVICE_DATASET_BUDGET * _budget_scale) >> 20} MiB of "
            f"images + pool across the {_budget_scale}-device mesh)"
        )
    return bool(flag)


def take_batch(loader, mesh, staged):
    """The per-step batch for a trainer: DeviceDataSource batches are
    already mesh-sharded device gathers; streaming loaders consume the
    previously staged (double-buffered) transfer, or shard one now."""
    from histogan_tpu.parallel import shard_batch

    if isinstance(loader, DeviceDataSource):
        return next(loader)
    if staged is not None:
        return staged
    return shard_batch(next(loader), mesh, batch_axis=1)


def stage_next_batch(loader, mesh):
    """Enqueue the NEXT batch's host->device transfer right after the
    async step dispatch (overlaps compute on DMA-capable hosts); no-op
    for DeviceDataSource."""
    from histogan_tpu.parallel import shard_batch

    if isinstance(loader, DeviceDataSource):
        return None
    return shard_batch(next(loader), mesh, batch_axis=1)


class DeviceDataSource:
    """Iterator yielding mesh-sharded device batches with the TrainLoader
    contract: {'d_images' (A,B,S,S,C) uint8, 'd_hists'/'g_hists'
    (A,B,3,h,h) f32, optional 'g_images'}.

    ``images`` must be the dataset's decoded uint8 cache (N,S,S,C) and
    ``pool`` the (N,3,h,h) float32 histogram pool.
    """

    def __init__(self, images: np.ndarray, pool: np.ndarray, mesh,
                 batch_size: int, accum: int, seed: int = 0,
                 self_hist: bool = False, include_g_images: bool = False,
                 shard_cache: bool = False):
        assert images.dtype == np.uint8, "expects the decoded uint8 cache"
        n_dev = mesh.shape["data"]
        if batch_size % n_dev != 0:
            # same actionable contract as parallel/mesh.py shard_batch —
            # without this the jitted gather's out_shardings fail with an
            # opaque GSPMD error (ADVICE r2)
            raise ValueError(
                f"batch_size {batch_size} is not divisible by the "
                f"{n_dev}-device 'data' mesh axis; pick a per-step batch "
                f"that is a multiple of {n_dev} (or shrink the mesh)"
            )
        self.n = images.shape[0]
        self.mesh = mesh
        self.batch_size = batch_size
        self.accum = accum
        self.self_hist = self_hist
        self.include_g_images = include_g_images
        self._rng = np.random.default_rng(seed)
        if shard_cache:
            # each device holds 1/n of the rows (budget scales with the
            # mesh); the jitted gather below reads across shards and
            # XLA's SPMD partitioner inserts the collective — indices
            # stay global, so the sampling distribution is IDENTICAL to
            # the replicated mode (pinned by tests/test_data.py). Rows
            # are zero-padded to a multiple of n; padding is never drawn
            # (self.n keeps the true count).
            import jax.sharding as shd

            n_dev = mesh.shape["data"]
            pad = (-images.shape[0]) % n_dev
            if pad:
                images = np.concatenate(
                    [images, np.zeros((pad, *images.shape[1:]), images.dtype)])
                pool = np.concatenate(
                    [pool, np.zeros((pad, *pool.shape[1:]), pool.dtype)])
            row_sharded = shd.NamedSharding(
                mesh, shd.PartitionSpec("data"))
            # device_put from HOST numpy: each device receives only its
            # own shard. jnp.asarray first would stage the WHOLE cache
            # on one device — an instant OOM in exactly the over-budget
            # regime this mode exists for (r3 review)
            self._images = jax.device_put(images, row_sharded)
            self._pool = jax.device_put(
                np.asarray(pool, np.float32), row_sharded)
        else:
            # one-time H2D push, replicated over the data mesh
            self._images = replicate(jnp.asarray(images), mesh)
            self._pool = replicate(jnp.asarray(pool, jnp.float32), mesh)

        a, b = accum, batch_size
        # outputs land batch-axis-sharded over the mesh directly (the
        # gather runs replicated; XLA scatters the result over ICI)
        sharded = jax.sharding.NamedSharding(mesh, batch_spec(5, 1))

        def gather_images(images, idx):
            return images[idx].reshape(a, b, *images.shape[1:])

        def interp_hists(pool, idx2, r):
            h = r[:, None, None, None] * pool[idx2[0]] \
                + (1.0 - r[:, None, None, None]) * pool[idx2[1]]
            return h.reshape(a, b, *pool.shape[1:])

        def self_hists(pool, idx):
            return pool[idx].reshape(a, b, *pool.shape[1:])

        # key layout of the packed upload (below): draw ORDER matches
        # _draws exactly; offsets are trace-time constants
        n_items = accum * batch_size
        self._int_layout, self._float_layout = [], []

        def _lay(layout, key, size):
            off = sum(s for _, s in layout)
            layout.append((key, size))
            return off

        _lay(self._int_layout, "d_idx", n_items)
        if not self_hist:
            _lay(self._int_layout, "d_pair", 2 * n_items)
            _lay(self._float_layout, "d_r", n_items)
        if include_g_images:
            _lay(self._int_layout, "g_idx", n_items)
            if not self_hist:
                _lay(self._int_layout, "g_pair", 2 * n_items)
                _lay(self._float_layout, "g_r", n_items)
        else:
            _lay(self._int_layout, "g_pair", 2 * n_items)
            _lay(self._float_layout, "g_r", n_items)

        def unpack(ints, floats):
            d, off = {}, 0
            for k, size in self._int_layout:  # static offsets/sizes
                v = ints[off:off + size]
                d[k] = v.reshape(2, n_items) if k.endswith("pair") else v
                off += size
            off = 0
            for k, size in self._float_layout:
                d[k] = floats[off:off + size]
                off += size
            return d

        # ONE jitted dispatch builds the whole batch dict (self_hist /
        # include_g_images are trace-time constants) from TWO packed
        # uploads (one int, one float): per-transfer/dispatch latency is
        # the dominant cost on RPC-attached devices, and even locally one
        # program beats 3-4
        def make_batch(images, pool, ints, floats):
            draws = unpack(ints, floats)
            batch = {"d_images": gather_images(images, draws["d_idx"])}
            if self_hist:
                batch["d_hists"] = self_hists(pool, draws["d_idx"])
            else:
                batch["d_hists"] = interp_hists(pool, draws["d_pair"],
                                                draws["d_r"])
            if include_g_images:
                batch["g_images"] = gather_images(images, draws["g_idx"])
                if self_hist:
                    batch["g_hists"] = self_hists(pool, draws["g_idx"])
                else:
                    batch["g_hists"] = interp_hists(pool, draws["g_pair"],
                                                    draws["g_r"])
            else:
                # images-less G phase interpolates even in self_hist mode
                # (TrainLoader._make_batch's branch structure)
                batch["g_hists"] = interp_hists(pool, draws["g_pair"],
                                                draws["g_r"])
            return batch

        self._make_batch = jax.jit(
            make_batch, out_shardings={
                k: sharded for k in
                (["d_images", "d_hists", "g_hists"]
                 + (["g_images"] if include_g_images else []))
            },
        )

    def _draws(self) -> Dict[str, np.ndarray]:
        """Host-side index/ratio draws, same rng ORDER as the previous
        per-array dispatch form (pinned by tests/test_data.py)."""
        n_items = self.accum * self.batch_size
        rng = self._rng
        d = {"d_idx": rng.integers(0, self.n, size=n_items)}
        if not self.self_hist:
            d["d_pair"] = rng.integers(0, self.n, size=(2, n_items))
            d["d_r"] = rng.random((n_items,), dtype=np.float32)
        if self.include_g_images:
            d["g_idx"] = rng.integers(0, self.n, size=n_items)
            if not self.self_hist:
                d["g_pair"] = rng.integers(0, self.n, size=(2, n_items))
                d["g_r"] = rng.random((n_items,), dtype=np.float32)
        else:
            d["g_pair"] = rng.integers(0, self.n, size=(2, n_items))
            d["g_r"] = rng.random((n_items,), dtype=np.float32)
        return d

    def __next__(self) -> Dict[str, jnp.ndarray]:
        d = self._draws()
        ints = np.concatenate(
            [np.ravel(d[k]) for k, _ in self._int_layout]).astype(np.int32)
        if self._float_layout:
            floats = np.concatenate(
                [d[k] for k, _ in self._float_layout]).astype(np.float32)
        else:
            floats = np.zeros((0,), np.float32)
        return self._make_batch(self._images, self._pool,
                                jnp.asarray(ints), jnp.asarray(floats))

    def __iter__(self):
        return self

    def close(self) -> None:  # TrainLoader API parity
        pass
