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

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from histogan_tpu.parallel import batch_spec, replicate


# HBM budget for the auto mode (images + pool); the flagship model /
# optimizer / activations need the rest of the chip's 16 GB
DEVICE_DATASET_BUDGET = 2 << 30


def should_use_device_dataset(flag, dataset, pool,
                              dataset_aug_prob: float = 0.0) -> bool:
    """Resolve the Trainer's device_dataset flag ("auto" | True | False).

    Eligible iff the decoded uint8 cache exists (cache_dir was set),
    per-item augmentation doesn't need host decode, and images + pool
    fit the HBM budget. True with an ineligible dataset raises."""
    if flag is False:
        return False
    cache = getattr(dataset, "_cache", None)
    eligible = (
        cache is not None
        and dataset_aug_prob == 0.0
        and cache.nbytes + pool.pool.nbytes <= DEVICE_DATASET_BUDGET
    )
    if flag == "auto":
        return eligible
    if flag is True and not eligible:
        raise ValueError(
            "device_dataset=True but the dataset is not eligible (needs "
            "a decoded cache, dataset_aug_prob=0, and <= "
            f"{DEVICE_DATASET_BUDGET >> 20} MiB of images + pool)"
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
                 self_hist: bool = False, include_g_images: bool = False):
        assert images.dtype == np.uint8, "expects the decoded uint8 cache"
        self.n = images.shape[0]
        self.mesh = mesh
        self.batch_size = batch_size
        self.accum = accum
        self.self_hist = self_hist
        self.include_g_images = include_g_images
        self._rng = np.random.default_rng(seed)
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

        self._gather_images = jax.jit(gather_images, out_shardings=sharded)
        self._interp_hists = jax.jit(interp_hists, out_shardings=sharded)
        self._self_hists = jax.jit(self_hists, out_shardings=sharded)

    # TrainLoader-compatible surface -----------------------------------
    def _hists(self, idx: Optional[np.ndarray]) -> jnp.ndarray:
        """self_hist ties hists to image indices; hists with no image
        (idx=None, the g_hists of an images-less G phase) interpolate —
        exactly TrainLoader._make_batch's branch structure."""
        n_items = self.accum * self.batch_size
        if self.self_hist and idx is not None:
            return self._self_hists(self._pool, jnp.asarray(idx))
        pair = self._rng.integers(0, self.n, size=(2, n_items))
        r = self._rng.random((n_items,), dtype=np.float32)
        return self._interp_hists(self._pool, jnp.asarray(pair),
                                  jnp.asarray(r))

    def __next__(self) -> Dict[str, jnp.ndarray]:
        n_items = self.accum * self.batch_size
        idx = self._rng.integers(0, self.n, size=n_items)
        batch = {
            "d_images": self._gather_images(self._images, jnp.asarray(idx)),
            "d_hists": self._hists(idx),
        }
        if self.include_g_images:
            g_idx = self._rng.integers(0, self.n, size=n_items)
            batch["g_images"] = self._gather_images(
                self._images, jnp.asarray(g_idx))
            batch["g_hists"] = self._hists(g_idx)
        else:
            batch["g_hists"] = self._hists(None)
        return batch

    def __iter__(self):
        return self

    def close(self) -> None:  # TrainLoader API parity
        pass
