"""Convert reference PyTorch HistoGAN checkpoints (.pt state_dict) to
this framework's parameter trees.

The reference publishes 9 histoGAN + 7 reHistoGAN pretrained .pt files
(README.md:306-317, 458-467) whose state dicts follow the module layout
of histoGAN/histoGAN.py:634-715 ('S.net.0.weight', 'G.blocks.0.conv1
.weight', 'GE...', 'HE...', ...). Layout mapping to our NHWC flax trees:

- Linear (out, in) -> kernel (in, out): transpose.
- Conv2d (O, I, kh, kw) -> HWIO (kh, kw, I, O): transpose (2, 3, 1, 0).
- Conv2DMod weight: same OIHW -> HWIO transpose.
- initial_block (C, 4, 4) -> (4, 4, C).
- D.to_logit: torch flattens NCHW (C,2,2); we flatten NHWC (2,2,C) — the
  input-dim permutation is baked into the converted kernel.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _t(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _linear(sd: Mapping, prefix: str) -> Dict:
    return {"kernel": _t(sd[f"{prefix}.weight"]).T,
            "bias": _t(sd[f"{prefix}.bias"])}


def _conv(sd: Mapping, prefix: str, bias: bool = True) -> Dict:
    out = {"kernel": np.transpose(_t(sd[f"{prefix}.weight"]), (2, 3, 1, 0))}
    if bias:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def _conv2dmod(sd: Mapping, prefix: str) -> Dict:
    return {"weight": np.transpose(_t(sd[f"{prefix}.weight"]), (2, 3, 1, 0))}


def convert_style_vectorizer(sd: Mapping, prefix: str, depth: int) -> Dict:
    # torch Sequential: Linear at even indices (Linear, LeakyReLU) pairs
    return {f"fc{i}": _linear(sd, f"{prefix}.net.{2 * i}") for i in range(depth)}


def convert_hist_vectorizer(sd: Mapping, prefix: str, depth: int) -> Dict:
    return {f"fc{i}": _linear(sd, f"{prefix}.fcs.{2 * i}") for i in range(depth)}


def convert_generator_block(sd: Mapping, prefix: str) -> Dict:
    return {
        "to_style1": _linear(sd, f"{prefix}.to_style1"),
        "to_style2": _linear(sd, f"{prefix}.to_style2"),
        "to_noise1": _linear(sd, f"{prefix}.to_noise1"),
        "to_noise2": _linear(sd, f"{prefix}.to_noise2"),
        "conv1": _conv2dmod(sd, f"{prefix}.conv1"),
        "conv2": _conv2dmod(sd, f"{prefix}.conv2"),
        "to_rgb": {
            "to_style": _linear(sd, f"{prefix}.to_rgb.to_style"),
            "conv": _conv2dmod(sd, f"{prefix}.to_rgb.conv"),
        },
    }


def convert_generator(sd: Mapping, prefix: str, num_layers: int) -> Dict:
    out = {
        "initial_block": np.transpose(_t(sd[f"{prefix}.initial_block"]), (1, 2, 0))
    }
    for i in range(num_layers):
        out[f"blocks_{i}"] = convert_generator_block(sd, f"{prefix}.blocks.{i}")
    return out


def convert_discriminator(sd: Mapping, prefix: str, num_blocks: int) -> Dict:
    out = {}
    for i in range(num_blocks):
        b = f"{prefix}.blocks.{i}"
        blk = {
            "conv_res": _conv(sd, f"{b}.conv_res"),
            "net0": _conv(sd, f"{b}.net.0"),
            "net1": _conv(sd, f"{b}.net.2"),
        }
        if f"{b}.downsample.weight" in sd:
            blk["down"] = _conv(sd, f"{b}.downsample")
        out[f"blocks_{i}"] = blk
    # to_logit: permute input dim from (C, 2, 2) order to (2, 2, C)
    w = _t(sd[f"{prefix}.to_logit.weight"])  # (1, C*2*2)
    c = w.shape[1] // 4
    w = w.reshape(1, c, 2, 2).transpose(0, 2, 3, 1).reshape(1, -1)
    out["to_logit"] = {"kernel": w.T, "bias": _t(sd[f"{prefix}.to_logit.bias"])}
    return out


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu")
    return {k: v.detach().cpu().numpy() for k, v in sd.items()
            if hasattr(v, "detach")}


def convert_histogan_checkpoint(sd: Mapping, image_size: int,
                                style_depth: int = 8) -> Dict:
    """Full reference HistoGAN bundle -> {'params_g', 'params_d', 'ema'}."""
    from math import log2

    num_layers = int(log2(image_size) - 1)
    num_d_blocks = num_layers + 1
    return {
        "params_g": {
            "S": convert_style_vectorizer(sd, "S", style_depth),
            "H": convert_hist_vectorizer(sd, "H", style_depth),
            "G": convert_generator(sd, "G", num_layers),
        },
        "params_d": convert_discriminator(sd, "D", num_d_blocks),
        "ema": {
            "S": convert_style_vectorizer(sd, "SE", style_depth),
            "H": convert_hist_vectorizer(sd, "HE", style_depth),
            "G": convert_generator(sd, "GE", num_layers),
        },
    }


def convert_pt_file(path: str, image_size: int, style_depth: int = 8) -> Dict:
    return convert_histogan_checkpoint(load_torch_state_dict(path),
                                       image_size, style_depth)


def install_into_trainer(trainer, converted: Dict) -> None:
    """Load converted params into a Trainer (optimizer state stays fresh)."""
    import jax

    from histogan_tpu.parallel import replicate

    state = jax.device_get(trainer.state)
    state = state.replace(
        params_g=converted["params_g"],
        params_d=converted["params_d"],
        ema=converted["ema"],
    )
    trainer.state = replicate(state, trainer.mesh)
    trainer.av = None
