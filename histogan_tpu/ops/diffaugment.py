"""DiffAugment with explicit PRNG keys (jit-safe).

Re-implements the reference's differentiable D-augmentations
(utils/diff_augment.py, vendored there from mit-han-lab
data-efficient-gans) for NHWC under functional randomness. Randomness
granularity matches the reference: per-SAMPLE factors for color /
translation / cutout / offset, per-BATCH coin flips in the wrapper
(histoGAN/histoGAN.py:312-331).

All ops are implemented with static shapes and coordinate arithmetic
(no data-dependent shapes), so they fuse cleanly under jit on TPU.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def rand_brightness(key, x):
    b = x.shape[0]
    f = jax.random.uniform(key, (b, 1, 1, 1), x.dtype) - 0.5
    return x + f


def rand_saturation(key, x):
    b = x.shape[0]
    mean = x.mean(axis=-1, keepdims=True)
    f = jax.random.uniform(key, (b, 1, 1, 1), x.dtype) * 2.0
    return (x - mean) * f + mean


def rand_contrast(key, x):
    b = x.shape[0]
    mean = x.mean(axis=(1, 2, 3), keepdims=True)
    f = jax.random.uniform(key, (b, 1, 1, 1), x.dtype) + 0.5
    return (x - mean) * f + mean


def rand_translation(key, x, ratio: float = 0.125):
    """Random per-sample integer shift with zero padding
    (diff_augment.py:33-50)."""
    b, h, w, _ = x.shape
    sh = int(h * ratio + 0.5)
    sw = int(w * ratio + 0.5)
    kx, ky = jax.random.split(key)
    tx = jax.random.randint(kx, (b, 1, 1), -sh, sh + 1)
    ty = jax.random.randint(ky, (b, 1, 1), -sw, sw + 1)
    grid_x = jnp.clip(jnp.arange(h)[None, :, None] + tx + 1, 0, h + 1)
    grid_y = jnp.clip(jnp.arange(w)[None, None, :] + ty + 1, 0, w + 1)
    x_pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    batch_idx = jnp.arange(b)[:, None, None]
    return x_pad[batch_idx, grid_x, grid_y]


def rand_cutout(key, x, ratio: float = 0.5):
    """Random per-sample zeroed rectangle (diff_augment.py:79-98).
    Expressed as a coordinate-range mask (equivalent to the reference's
    clamped scatter)."""
    b, h, w, _ = x.shape
    ch = int(h * ratio + 0.5)
    cw = int(w * ratio + 0.5)
    kx, ky = jax.random.split(key)
    ox = jax.random.randint(kx, (b, 1, 1), 0, h + (1 - ch % 2))
    oy = jax.random.randint(ky, (b, 1, 1), 0, w + (1 - cw % 2))
    lo_x = jnp.clip(ox - ch // 2, 0, h - 1)
    hi_x = jnp.clip(ox - ch // 2 + ch - 1, 0, h - 1)
    lo_y = jnp.clip(oy - cw // 2, 0, w - 1)
    hi_y = jnp.clip(oy - cw // 2 + cw - 1, 0, w - 1)
    ii = jnp.arange(h)[None, :, None]
    jj = jnp.arange(w)[None, None, :]
    cut = ((ii >= lo_x) & (ii <= hi_x)) & ((jj >= lo_y) & (jj <= hi_y))
    return x * (~cut)[..., None].astype(x.dtype)


def rand_offset(key, x, ratio: float = 1.0, ratio_h: float = 1.0, ratio_v: float = 1.0):
    """Random per-sample circular roll (diff_augment.py:52-71). The
    reference names are swapped vs intuition: value_h rolls the W axis,
    value_v rolls the H axis (torch dims 2/1 of a CHW image)."""
    b, h, w, _ = x.shape
    max_h = int(h * ratio * ratio_h)  # reference: w * ratio * ratio_h on NCHW dims
    max_v = int(w * ratio * ratio_v)
    kh, kv = jax.random.split(key)
    val_h = (
        jax.random.randint(kh, (b,), 0, max_h + 1) * 2 - max_h
        if max_h > 0
        else jnp.zeros((b,), jnp.int32)
    )
    val_v = (
        jax.random.randint(kv, (b,), 0, max_v + 1) * 2 - max_v
        if max_v > 0
        else jnp.zeros((b,), jnp.int32)
    )

    def roll_one(img, vh, vv):
        img = jnp.roll(img, vh, axis=1)  # W axis
        return jnp.roll(img, vv, axis=0)  # H axis

    return jax.vmap(roll_one)(x, val_h, val_v)


def rand_offset_h(key, x, ratio: float = 1.0):
    return rand_offset(key, x, ratio=1.0, ratio_h=ratio, ratio_v=0.0)


def rand_offset_v(key, x, ratio: float = 1.0):
    return rand_offset(key, x, ratio=1.0, ratio_h=0.0, ratio_v=ratio)


AUGMENT_FNS = {
    "color": [rand_brightness, rand_saturation, rand_contrast],
    "offset": [rand_offset],
    "offset_h": [rand_offset_h],
    "offset_v": [rand_offset_v],
    "translation": [rand_translation],
    "cutout": [rand_cutout],
}


def diff_augment(key, x, types: Sequence[str] = ()):
    for p in types:
        for f in AUGMENT_FNS[p]:
            key, sub = jax.random.split(key)
            x = f(sub, x)
    return x


def random_hflip(key, x, prob: float = 0.5):
    """Whole-batch horizontal flip. Reference quirk kept: flips when
    random() >= prob (histoGAN/histoGAN.py:312-315)."""
    flip = jax.random.uniform(key, ()) >= prob
    return jax.lax.cond(flip, lambda t: jnp.flip(t, axis=2), lambda t: t, x)


def aug_wrapper(key, images, prob: float, types: Sequence[str]):
    """AugWrapper semantics (histoGAN/histoGAN.py:318-331): with
    probability ``prob`` apply random-hflip + DiffAugment to the whole
    batch, else pass through."""
    k_gate, k_flip, k_aug = jax.random.split(key, 3)
    apply = jax.random.uniform(k_gate, ()) < prob

    def do_aug(t):
        return diff_augment(k_aug, random_hflip(k_flip, t, 0.5), types)

    return jax.lax.cond(apply, do_aug, lambda t: t, images)
