"""InceptionV3 pool3 feature extractor (the standard FID backbone).

The reference has no FID code; its README recommends computing FID
manually per checkpoint (/root/reference/README.md:96). The de-facto
standard extractor is torchvision's ``inception_v3`` truncated at the
final average pool (2048-d "pool3" features), with pytorch-fid's
preprocessing: bilinear resize to 299x299 (align_corners=False, no
antialias) and normalization to [-1, 1].

This module implements that graph natively in JAX, NHWC, with every
BatchNorm (eval mode, eps=1e-3) folded into a per-channel scale/shift at
load time — the forward pass is pure conv + affine + relu, which XLA
fuses onto the MXU.

Weights: load a torchvision ``inception_v3`` state_dict exported as
.pt/.pth (via torch) or .npz (``load_torchvision_state_dict`` /
``load_weights_file``). This zero-egress environment cannot download
them, so a documented self-contained fallback is provided:
``random_params(seed)`` builds a deterministic He-initialized network —
FID computed with a fixed random-feature Inception is a valid relative
quality signal (random-weight CNN features are an established perceptual
metric family), while absolute parity with published FID numbers
requires the pretrained weights.

Architecture spec (channels/kernels/strides/pads) follows torchvision's
``torchvision.models.inception.Inception3`` exactly, so a real exported
state dict loads key-for-key; parity is oracle-tested against a
reference torch implementation in tests/test_inception.py.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-3  # torchvision BasicConv2d: BatchNorm2d(eps=0.001)

# ---------------------------------------------------------------- spec
# name -> (in_ch, out_ch, (kh, kw), (sh, sw), (ph, pw))
ConvSpec = Tuple[int, int, Tuple[int, int], Tuple[int, int], Tuple[int, int]]


def _build_specs() -> Dict[str, ConvSpec]:
    s: Dict[str, ConvSpec] = {}

    def c(name, cin, cout, k, stride=(1, 1), pad=(0, 0)):
        s[name] = (cin, cout, k, stride, pad)

    # stem
    c("Conv2d_1a_3x3", 3, 32, (3, 3), (2, 2))
    c("Conv2d_2a_3x3", 32, 32, (3, 3))
    c("Conv2d_2b_3x3", 32, 64, (3, 3), pad=(1, 1))
    c("Conv2d_3b_1x1", 64, 80, (1, 1))
    c("Conv2d_4a_3x3", 80, 192, (3, 3))

    def block_a(m, cin, pf):
        c(f"{m}.branch1x1", cin, 64, (1, 1))
        c(f"{m}.branch5x5_1", cin, 48, (1, 1))
        c(f"{m}.branch5x5_2", 48, 64, (5, 5), pad=(2, 2))
        c(f"{m}.branch3x3dbl_1", cin, 64, (1, 1))
        c(f"{m}.branch3x3dbl_2", 64, 96, (3, 3), pad=(1, 1))
        c(f"{m}.branch3x3dbl_3", 96, 96, (3, 3), pad=(1, 1))
        c(f"{m}.branch_pool", cin, pf, (1, 1))
        return 64 + 64 + 96 + pf

    def block_b(m, cin):
        c(f"{m}.branch3x3", cin, 384, (3, 3), (2, 2))
        c(f"{m}.branch3x3dbl_1", cin, 64, (1, 1))
        c(f"{m}.branch3x3dbl_2", 64, 96, (3, 3), pad=(1, 1))
        c(f"{m}.branch3x3dbl_3", 96, 96, (3, 3), (2, 2))
        return 384 + 96 + cin

    def block_c(m, cin, c7):
        c(f"{m}.branch1x1", cin, 192, (1, 1))
        c(f"{m}.branch7x7_1", cin, c7, (1, 1))
        c(f"{m}.branch7x7_2", c7, c7, (1, 7), pad=(0, 3))
        c(f"{m}.branch7x7_3", c7, 192, (7, 1), pad=(3, 0))
        c(f"{m}.branch7x7dbl_1", cin, c7, (1, 1))
        c(f"{m}.branch7x7dbl_2", c7, c7, (7, 1), pad=(3, 0))
        c(f"{m}.branch7x7dbl_3", c7, c7, (1, 7), pad=(0, 3))
        c(f"{m}.branch7x7dbl_4", c7, c7, (7, 1), pad=(3, 0))
        c(f"{m}.branch7x7dbl_5", c7, 192, (1, 7), pad=(0, 3))
        c(f"{m}.branch_pool", cin, 192, (1, 1))
        return 192 * 4

    def block_d(m, cin):
        c(f"{m}.branch3x3_1", cin, 192, (1, 1))
        c(f"{m}.branch3x3_2", 192, 320, (3, 3), (2, 2))
        c(f"{m}.branch7x7x3_1", cin, 192, (1, 1))
        c(f"{m}.branch7x7x3_2", 192, 192, (1, 7), pad=(0, 3))
        c(f"{m}.branch7x7x3_3", 192, 192, (7, 1), pad=(3, 0))
        c(f"{m}.branch7x7x3_4", 192, 192, (3, 3), (2, 2))
        return 320 + 192 + cin

    def block_e(m, cin):
        c(f"{m}.branch1x1", cin, 320, (1, 1))
        c(f"{m}.branch3x3_1", cin, 384, (1, 1))
        c(f"{m}.branch3x3_2a", 384, 384, (1, 3), pad=(0, 1))
        c(f"{m}.branch3x3_2b", 384, 384, (3, 1), pad=(1, 0))
        c(f"{m}.branch3x3dbl_1", cin, 448, (1, 1))
        c(f"{m}.branch3x3dbl_2", 448, 384, (3, 3), pad=(1, 1))
        c(f"{m}.branch3x3dbl_3a", 384, 384, (1, 3), pad=(0, 1))
        c(f"{m}.branch3x3dbl_3b", 384, 384, (3, 1), pad=(1, 0))
        c(f"{m}.branch_pool", cin, 192, (1, 1))
        return 320 + 768 + 768 + 192

    ch = block_a("Mixed_5b", 192, 32)   # 256
    ch = block_a("Mixed_5c", ch, 64)    # 288
    ch = block_a("Mixed_5d", ch, 64)    # 288
    ch = block_b("Mixed_6a", ch)        # 768
    ch = block_c("Mixed_6b", ch, 128)
    ch = block_c("Mixed_6c", ch, 160)
    ch = block_c("Mixed_6d", ch, 160)
    ch = block_c("Mixed_6e", ch, 192)
    ch = block_d("Mixed_7a", ch)        # 1280
    ch = block_e("Mixed_7b", ch)        # 2048
    ch = block_e("Mixed_7c", ch)        # 2048
    assert ch == 2048
    return s


CONV_SPECS: Dict[str, ConvSpec] = _build_specs()
FEATURE_DIM = 2048


# ------------------------------------------------------------- loading
def fold_bn(kernel_oihw: np.ndarray, gamma, beta, mean, var,
            eps: float = BN_EPS) -> Dict[str, np.ndarray]:
    """Conv (no bias) + eval-mode BatchNorm -> HWIO kernel + per-channel
    scale/shift: y = conv(x) * scale + shift."""
    scale = np.asarray(gamma, np.float32) / np.sqrt(
        np.asarray(var, np.float32) + eps
    )
    shift = np.asarray(beta, np.float32) - np.asarray(mean, np.float32) * scale
    return {
        "kernel": np.transpose(np.asarray(kernel_oihw, np.float32), (2, 3, 1, 0)),
        "scale": scale,
        "shift": shift,
    }


def load_torchvision_state_dict(raw: Mapping[str, np.ndarray]) -> Dict:
    """torchvision inception_v3 state dict (numpy values) -> params.
    AuxLogits/fc keys are ignored (pool3 features don't use them)."""
    params = {}
    for name, (cin, cout, k, _, _) in CONV_SPECS.items():
        w = raw[f"{name}.conv.weight"]
        assert tuple(w.shape) == (cout, cin, k[0], k[1]), (
            f"{name}: expected {(cout, cin, *k)}, got {tuple(w.shape)}"
        )
        params[name] = fold_bn(
            w,
            raw[f"{name}.bn.weight"],
            raw[f"{name}.bn.bias"],
            raw[f"{name}.bn.running_mean"],
            raw[f"{name}.bn.running_var"],
        )
    return params


def load_weights_file(path: str) -> Dict:
    """Load params from a .npz (torchvision key names) or a torch .pt/.pth
    state dict file."""
    if path.endswith(".npz"):
        raw = dict(np.load(path))
    else:
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        raw = {k: v.numpy() for k, v in sd.items()}
    return load_torchvision_state_dict(raw)


def random_params(seed: int = 0) -> Dict:
    """Deterministic He-normal random network (the documented fallback
    extractor for environments without the pretrained weights). BN folds
    to identity (scale=1, shift=0)."""
    rng = np.random.default_rng(seed)
    params = {}
    for name, (cin, cout, k, _, _) in CONV_SPECS.items():
        fan_in = cin * k[0] * k[1]
        kernel = rng.normal(0.0, np.sqrt(2.0 / fan_in),
                            (k[0], k[1], cin, cout)).astype(np.float32)
        params[name] = {
            "kernel": kernel,
            "scale": np.ones((cout,), np.float32),
            "shift": np.zeros((cout,), np.float32),
        }
    return params


# ------------------------------------------------------------- forward
def _bc(params, name: str, x: jnp.ndarray) -> jnp.ndarray:
    """BasicConv2d: conv (BN folded) + relu."""
    _, _, _, stride, pad = CONV_SPECS[name]
    p = params[name]
    y = jax.lax.conv_general_dilated(
        x, p["kernel"], stride, [(pad[0], pad[0]), (pad[1], pad[1])],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jax.nn.relu(y * p["scale"] + p["shift"])


def _maxpool3s2(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )


def _avgpool3s1p1(x: jnp.ndarray) -> jnp.ndarray:
    # torch F.avg_pool2d(k=3, s=1, p=1) with count_include_pad=True:
    # divisor is always 9, including at the zero-padded borders
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    return s / 9.0


def _block_a(params, m, x):
    b1 = _bc(params, f"{m}.branch1x1", x)
    b5 = _bc(params, f"{m}.branch5x5_2", _bc(params, f"{m}.branch5x5_1", x))
    b3 = _bc(params, f"{m}.branch3x3dbl_1", x)
    b3 = _bc(params, f"{m}.branch3x3dbl_2", b3)
    b3 = _bc(params, f"{m}.branch3x3dbl_3", b3)
    bp = _bc(params, f"{m}.branch_pool", _avgpool3s1p1(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _block_b(params, m, x):
    b3 = _bc(params, f"{m}.branch3x3", x)
    bd = _bc(params, f"{m}.branch3x3dbl_1", x)
    bd = _bc(params, f"{m}.branch3x3dbl_2", bd)
    bd = _bc(params, f"{m}.branch3x3dbl_3", bd)
    return jnp.concatenate([b3, bd, _maxpool3s2(x)], axis=-1)


def _block_c(params, m, x):
    b1 = _bc(params, f"{m}.branch1x1", x)
    b7 = _bc(params, f"{m}.branch7x7_1", x)
    b7 = _bc(params, f"{m}.branch7x7_2", b7)
    b7 = _bc(params, f"{m}.branch7x7_3", b7)
    bd = _bc(params, f"{m}.branch7x7dbl_1", x)
    for i in (2, 3, 4, 5):
        bd = _bc(params, f"{m}.branch7x7dbl_{i}", bd)
    bp = _bc(params, f"{m}.branch_pool", _avgpool3s1p1(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _block_d(params, m, x):
    b3 = _bc(params, f"{m}.branch3x3_2", _bc(params, f"{m}.branch3x3_1", x))
    b7 = _bc(params, f"{m}.branch7x7x3_1", x)
    b7 = _bc(params, f"{m}.branch7x7x3_2", b7)
    b7 = _bc(params, f"{m}.branch7x7x3_3", b7)
    b7 = _bc(params, f"{m}.branch7x7x3_4", b7)
    return jnp.concatenate([b3, b7, _maxpool3s2(x)], axis=-1)


def _block_e(params, m, x):
    b1 = _bc(params, f"{m}.branch1x1", x)
    b3 = _bc(params, f"{m}.branch3x3_1", x)
    b3 = jnp.concatenate(
        [_bc(params, f"{m}.branch3x3_2a", b3), _bc(params, f"{m}.branch3x3_2b", b3)],
        axis=-1,
    )
    bd = _bc(params, f"{m}.branch3x3dbl_1", x)
    bd = _bc(params, f"{m}.branch3x3dbl_2", bd)
    bd = jnp.concatenate(
        [_bc(params, f"{m}.branch3x3dbl_3a", bd), _bc(params, f"{m}.branch3x3dbl_3b", bd)],
        axis=-1,
    )
    bp = _bc(params, f"{m}.branch_pool", _avgpool3s1p1(x))
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def inception_body(params, x: jnp.ndarray) -> jnp.ndarray:
    """(B, 299, 299, 3) in [-1, 1] -> (B, 2048) pool3 features."""
    x = _bc(params, "Conv2d_1a_3x3", x)
    x = _bc(params, "Conv2d_2a_3x3", x)
    x = _bc(params, "Conv2d_2b_3x3", x)
    x = _maxpool3s2(x)
    x = _bc(params, "Conv2d_3b_1x1", x)
    x = _bc(params, "Conv2d_4a_3x3", x)
    x = _maxpool3s2(x)
    for m in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        x = _block_a(params, m, x)
    x = _block_b(params, "Mixed_6a", x)
    for m in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        x = _block_c(params, m, x)
    x = _block_d(params, "Mixed_7a", x)
    x = _block_e(params, "Mixed_7b", x)
    x = _block_e(params, "Mixed_7c", x)
    return jnp.mean(x, axis=(1, 2))  # adaptive avg pool to 1x1


def preprocess(images: jnp.ndarray, size: int = 299) -> jnp.ndarray:
    """pytorch-fid preprocessing: NHWC [0,1] -> bilinear resize to
    size x size (align_corners=False, no antialias — torch
    F.interpolate defaults) -> [-1, 1]."""
    images = images.astype(jnp.float32)
    if images.shape[1] != size or images.shape[2] != size:
        images = jax.image.resize(
            images, (images.shape[0], size, size, images.shape[-1]),
            "bilinear", antialias=False,
        )
    return images * 2.0 - 1.0


def pool3_features(params, images: jnp.ndarray, resize: bool = True) -> jnp.ndarray:
    """Full extractor: NHWC [0,1] images -> (B, 2048)."""
    x = preprocess(images) if resize else images
    return inception_body(params, x)


def make_extractor(params, resize: bool = True):
    """Jitted callable (B, H, W, 3)[0,1] -> np.ndarray (B, 2048) for
    FIDScorer. Input spatial dims must be consistent across calls to
    avoid recompiles."""
    fn = jax.jit(lambda imgs: pool3_features(params, imgs, resize=resize))

    def extract(images) -> np.ndarray:
        return np.asarray(fn(jnp.asarray(images)))

    return extract
