"""VGG16 perceptual loss (reference utils/vggloss.py:5-51).

Feature blocks are torchvision VGG16 ``features`` slices [:4], [4:9],
[9:16], [16:23] (conv+relu stacks up to relu1_2 / relu2_2 / relu3_3 /
relu4_3), ImageNet normalization, bilinear resize to 224, L1 over
feature maps; optional Gram-matrix style terms.

Weights: this environment has no torchvision and no network egress, so
pretrained weights must be provided as a file — either a torchvision
``vgg16`` state_dict (.pth, loaded via torch) or an .npz with the same
keys. Set ``VGG16_WEIGHTS`` or pass ``weights_path``. Without weights the
loss is unavailable and callers should run with vgg_loss_weight=0.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# torchvision vgg16.features conv layer indices per block slice
_BLOCK_CONVS = [
    [0, 2],            # features[:4]   conv1_1, conv1_2
    [5, 7],            # features[4:9]  conv2_1, conv2_2
    [10, 12, 14],      # features[9:16] conv3_*
    [17, 19, 21],      # features[16:23] conv4_*
]
_POOL_AFTER_BLOCK = [True, True, True, False]  # maxpool at 4, 9, 16; none before 23

_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


# torchvision vgg16 'features' conv (index, in_channels, out_channels)
# up to relu4_3 — the slice the perceptual loss consumes
_VGG16_CONVS = [
    (0, 3, 64), (2, 64, 64),
    (5, 64, 128), (7, 128, 128),
    (10, 128, 256), (12, 256, 256), (14, 256, 256),
    (17, 256, 512), (19, 512, 512), (21, 512, 512),
]


def random_vgg16_state(seed: int = 0) -> dict:
    """Random He-init weights in torchvision's vgg16 ``features``
    state-dict layout, at the REAL shapes. For perf measurement and
    dress rehearsals in this zero-egress environment: the compiled
    program — and therefore steps/sec — is identical for random and
    pretrained values (weights are threaded through the jit as
    arguments, see VGGPerceptualLoss._loss)."""
    rng = np.random.RandomState(seed)
    out = {}
    for idx, cin, cout in _VGG16_CONVS:
        out[f"features.{idx}.weight"] = (
            rng.standard_normal((cout, cin, 3, 3)) * np.sqrt(2.0 / (cin * 9))
        ).astype(np.float32)
        out[f"features.{idx}.bias"] = np.zeros(cout, np.float32)
    return out


def load_vgg16_weights(weights_path: Optional[str] = None) -> dict:
    """Load {conv_idx: (kernel_hwio, bias)} from a .pth state_dict or .npz."""
    path = weights_path or os.environ.get("VGG16_WEIGHTS")
    if not path or not os.path.exists(path or ""):
        raise FileNotFoundError(
            "VGG16 weights not found. Download torchvision's vgg16 state "
            "dict on a machine with network access and point VGG16_WEIGHTS "
            "at the .pth/.npz file."
        )
    if path.endswith(".npz"):
        raw = dict(np.load(path))
    else:
        import torch

        sd = torch.load(path, map_location="cpu")
        raw = {k: v.numpy() for k, v in sd.items()}
    out = {}
    for block in _BLOCK_CONVS:
        for idx in block:
            w = raw[f"features.{idx}.weight"]  # (O, I, kh, kw)
            b = raw[f"features.{idx}.bias"]
            out[idx] = (np.transpose(w, (2, 3, 1, 0)).astype(np.float32),
                        b.astype(np.float32))
    return out


class VGGPerceptualLoss:
    """Callable (input, target) -> scalar; images NHWC in [0,1]."""

    def __init__(self, weights_path: Optional[str] = None, resize: bool = True):
        self.weights = load_vgg16_weights(weights_path)
        self.resize = resize
        self._fn = jax.jit(
            self._loss, static_argnames=("feature_layers", "style_layers")
        )

    def _features(self, x: jnp.ndarray, weights=None) -> List[jnp.ndarray]:
        weights = self.weights if weights is None else weights
        feats = []
        for bi, block in enumerate(_BLOCK_CONVS):
            for idx in block:
                k, b = weights[idx]
                x = jax.lax.conv_general_dilated(
                    x, jnp.asarray(k), (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ) + jnp.asarray(b)
                x = jax.nn.relu(x)
            feats.append(x)
            if _POOL_AFTER_BLOCK[bi]:
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
                )
        return feats

    def _prep(self, x: jnp.ndarray) -> jnp.ndarray:
        x = (x - _MEAN) / _STD
        if self.resize:
            x = jax.image.resize(
                x, (x.shape[0], 224, 224, x.shape[-1]), "bilinear", antialias=False
            )
        return x

    def _loss(self, input_img, target_img, feature_layers=(0, 1, 2, 3),
              style_layers=(), weights=None):
        """``weights`` lets a caller thread the conv weights through a jit
        as ARGUMENTS instead of closure constants — embedding the ~56 MB
        of VGG weights as HLO literals overflows the remote compile
        helper's request-body limit (HTTP 413, measured r3)."""
        fx = self._features(self._prep(input_img), weights)
        fy = self._features(self._prep(target_img), weights)
        loss = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            if i in feature_layers:
                loss += jnp.mean(jnp.abs(a - b))
            if i in style_layers:
                am = a.reshape(a.shape[0], -1, a.shape[-1])
                bm = b.reshape(b.shape[0], -1, b.shape[-1])
                ga = jnp.einsum("bnc,bnd->bcd", am, am)
                gb = jnp.einsum("bnc,bnd->bcd", bm, bm)
                loss += jnp.mean(jnp.square(ga - gb))
        return loss

    def __call__(self, input_img, target_img, feature_layers=(0, 1, 2, 3),
                 style_layers=()):
        return self._fn(input_img, target_img,
                        feature_layers=tuple(feature_layers),
                        style_layers=tuple(style_layers))
