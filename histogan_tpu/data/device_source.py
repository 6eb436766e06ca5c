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

Dataset augmentation: the reference applies RandomResizedCrop
(scale 0.5-1.0, ratio 0.98-1.02) with prob ``dataset_aug_prob`` at host
decode time (histoGAN/histoGAN.py:276-278). The "auto" mode stays
faithful and falls back to the streaming TrainLoader then (the crop is
taken from the aspect-preserved pre-crop image, which only the host
has). An EXPLICIT ``device_dataset=True`` instead runs the crop+resize
ON DEVICE from the cached center-crop square (``aug_prob`` arg below):
crop boxes are drawn on host with the reference's exact algorithm and
shipped in the packed float upload; the resize is a vmapped separable
clamped bilinear that matches PIL crop+resize to <=1 uint8 level (PIL's
fixed-point bilinear coefficients account for the 1-level worst case;
tests/test_data.py device-aug tests). Documented deviation: the crop
window is limited
to the cached SxS center square rather than the reference's full
shorter-side-resized image — identical for square sources, a slightly
narrower content distribution for non-square ones. In exchange the fast
HBM-resident path composes with the README's own anti-divergence recipe
(--dataset_aug_prob, /root/reference/README.md:98) at full speed.
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

    "auto" is eligible iff the decoded uint8 cache exists (cache_dir was
    set), per-item augmentation doesn't need host decode
    (dataset_aug_prob == 0 — the faithful crop needs the pre-crop
    pixels), and images + pool fit the HBM budget. An EXPLICIT True
    additionally accepts dataset_aug_prob > 0 by running the
    RandomResizedCrop on device (see module docstring for the
    documented center-square deviation); True with no cache or an
    over-budget cache still raises.

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
    fits = (
        cache is not None
        and (cache.nbytes + pool.pool.nbytes
             <= DEVICE_DATASET_BUDGET * _budget_scale)
    )
    if flag == "auto":
        return fits and dataset_aug_prob == 0.0
    if flag is True and not fits:
        raise ValueError(
            "device_dataset=True but the dataset is not eligible (needs "
            "a decoded cache and <= "
            f"{(DEVICE_DATASET_BUDGET * _budget_scale) >> 20} MiB of "
            f"images + pool across the {_budget_scale}-device mesh)"
        )
    return bool(flag)


def sample_crop_boxes(rng: np.random.Generator, n: int, size: int,
                      aug_prob: float) -> np.ndarray:
    """Host-side RandomResizedCrop parameter draws, the reference's exact
    algorithm (torchvision get_params as mirrored in
    dataset.ImageFolderDataset._decode: scale U(0.5,1.0) of the area,
    log-uniform ratio in (0.98,1.02), 10 attempts, center fallback)
    applied to the cached (size, size) square. Returns (n, 4) float32
    rows (y0, x0, ch, cw); non-augmented draws (prob 1-aug_prob, one
    rng.random() per item like RandomApply) are the identity box."""
    boxes = np.empty((n, 4), np.float32)
    boxes[:, :2] = 0.0
    boxes[:, 2:] = size
    area = float(size * size)
    for k in range(n):
        if rng.random() >= aug_prob:
            continue
        for _ in range(10):
            target_area = area * rng.uniform(0.5, 1.0)
            ar = np.exp(rng.uniform(np.log(0.98), np.log(1.02)))
            cw = int(round(np.sqrt(target_area * ar)))
            ch = int(round(np.sqrt(target_area / ar)))
            if 0 < cw <= size and 0 < ch <= size:
                i = rng.integers(0, size - ch + 1)
                j = rng.integers(0, size - cw + 1)
                boxes[k] = (i, j, ch, cw)
                break
        # all 10 attempts out of bounds -> identity (center crop of the
        # already-square cache IS the identity)
    return boxes


def crop_resize_u8(img: jnp.ndarray, box: jnp.ndarray) -> jnp.ndarray:
    """Crop ``box`` = (y0, x0, ch, cw) out of a (S, S, C) uint8 image and
    bilinearly resize it back to (S, S) — PIL crop+resize semantics
    (half-pixel centers, sampling clamped at the crop edges), matched to
    <=1 uint8 level in tests/test_data.py (PIL's fixed-point bilinear
    coefficients produce a 1-level worst case); the identity box is an
    exact passthrough. Separable: two batched 1-D lerps of gathered
    rows/cols, XLA-friendly static shapes (boxes are data, not shapes)."""
    size = img.shape[0]
    f = img.astype(jnp.float32)

    def axis_interp(f, start, extent, axis):
        i = jnp.arange(size, dtype=jnp.float32)
        p = start + (i + 0.5) * extent / size - 0.5
        p = jnp.clip(p, start, start + extent - 1.0)
        lo = jnp.floor(p)
        w = p - lo
        lo_i = jnp.clip(lo.astype(jnp.int32), 0, size - 1)
        hi_i = jnp.clip(lo_i + 1, 0, size - 1)
        a = jnp.take(f, lo_i, axis=axis)
        b = jnp.take(f, hi_i, axis=axis)
        shape = [1] * f.ndim
        shape[axis] = size
        w = w.reshape(shape)
        return a * (1.0 - w) + b * w

    f = axis_interp(f, box[0], box[2], 0)
    f = axis_interp(f, box[1], box[3], 1)
    # the host aug path round-trips through PIL uint8 (dataset
    # get_image_u8: rint(float*255)); keep the same wire contract
    return jnp.clip(jnp.rint(f), 0.0, 255.0).astype(jnp.uint8)


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
                 shard_cache: bool = False, aug_prob: float = 0.0):
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
        self.aug_prob = float(aug_prob)
        if self.aug_prob > 0.0:
            # runtime signal for the documented deviation (ADVICE r3):
            # the device-side RandomResizedCrop windows the cached SxS
            # center square, not the reference's full shorter-side-
            # resized image — identical for square sources, slightly
            # narrower content for non-square ones (module docstring)
            print(
                "DeviceDataSource: device-side dataset augmentation "
                f"(dataset_aug_prob={self.aug_prob:g}) crops the cached "
                "center square — for non-square sources this narrows the "
                "crop distribution vs the reference's host path "
                "(device_dataset='auto' keeps the faithful host crop).",
                flush=True,
            )
        self.image_size = int(images.shape[1])
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

        aug = self.aug_prob > 0.0  # trace-time constant: aug off keeps
        # the compiled program (and its cache entry) byte-identical to r2

        def gather_images(images, idx, boxes=None):
            rows = images[idx]
            if aug:
                rows = jax.vmap(crop_resize_u8)(rows, boxes)
            return rows.reshape(a, b, *images.shape[1:])

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
        if aug:
            _lay(self._float_layout, "d_crop", 4 * n_items)
            if include_g_images:
                _lay(self._float_layout, "g_crop", 4 * n_items)

        def unpack(ints, floats):
            d, off = {}, 0
            for k, size in self._int_layout:  # static offsets/sizes
                v = ints[off:off + size]
                d[k] = v.reshape(2, n_items) if k.endswith("pair") else v
                off += size
            off = 0
            for k, size in self._float_layout:
                v = floats[off:off + size]
                d[k] = v.reshape(n_items, 4) if k.endswith("crop") else v
                off += size
            return d

        # ONE jitted dispatch builds the whole batch dict (self_hist /
        # include_g_images are trace-time constants) from TWO packed
        # uploads (one int, one float): per-transfer/dispatch latency is
        # the dominant cost on RPC-attached devices, and even locally one
        # program beats 3-4
        def make_batch(images, pool, ints, floats):
            draws = unpack(ints, floats)
            batch = {"d_images": gather_images(images, draws["d_idx"],
                                               draws.get("d_crop"))}
            if self_hist:
                batch["d_hists"] = self_hists(pool, draws["d_idx"])
            else:
                batch["d_hists"] = interp_hists(pool, draws["d_pair"],
                                                draws["d_r"])
            if include_g_images:
                batch["g_images"] = gather_images(images, draws["g_idx"],
                                                  draws.get("g_crop"))
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
        if self.aug_prob > 0.0:
            # crop draws come LAST so the aug_prob=0 rng stream (pinned
            # by the replay tests above) is untouched
            d["d_crop"] = sample_crop_boxes(
                rng, n_items, self.image_size, self.aug_prob)
            if self.include_g_images:
                d["g_crop"] = sample_crop_boxes(
                    rng, n_items, self.image_size, self.aug_prob)
        return d

    def __next__(self) -> Dict[str, jnp.ndarray]:
        d = self._draws()
        ints = np.concatenate(
            [np.ravel(d[k]) for k, _ in self._int_layout]).astype(np.int32)
        if self._float_layout:
            floats = np.concatenate(
                [np.ravel(d[k]) for k, _ in self._float_layout]
            ).astype(np.float32)
        else:
            floats = np.zeros((0,), np.float32)
        return self._make_batch(self._images, self._pool,
                                jnp.asarray(ints), jnp.asarray(floats))

    def __iter__(self):
        return self

    def close(self) -> None:  # TrainLoader API parity
        pass
