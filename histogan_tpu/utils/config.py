"""Dataclass config layer replacing the reference's giant-kwarg argparse
surface (histoGAN.py:205-263, rehistoGAN.py:460-574). Flag names and
semantics follow the documented README surface; the reference's
``type=bool`` truthiness wart ('--new False' being truthy) is NOT
replicated — booleans are real booleans here.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import List, Optional, Sequence, Tuple


@dataclasses.dataclass
class HistoGANConfig:
    # model
    image_size: int = 256
    network_capacity: int = 16
    latent_dim: int = 512
    style_depth: int = 8
    transparent: bool = False
    fq_layers: Tuple[int, ...] = ()
    fq_dict_size: int = 256
    attn_layers: Tuple[int, ...] = ()
    # histogram
    hist_bin: int = 64
    hist_insz: int = 150
    hist_method: str = "inverse-quadratic"
    hist_resizing: str = "sampling"
    hist_sigma: float = 0.02
    # training
    batch_size: int = 2
    gradient_accumulate_every: int = 8
    learning_rate: float = 2e-4
    mixed_prob: float = 0.9
    alpha: float = 2.0
    aug_prob: float = 0.0
    aug_types: Tuple[str, ...] = ("translation", "cutout")
    dataset_aug_prob: float = 0.0
    save_every: int = 1000
    trunc_psi: float = 0.75
    # precision policy: 'fp32' or 'bf16' compute (params stay fp32)
    precision: str = "fp32"
    # compile the D and G phases as two separate XLA programs instead of
    # one fused step (numerically identical; steps.py). The escape hatch
    # when the fused program exceeds a compiler resource limit — the
    # observed failure mode for the 512px train step on the dev tunnel's
    # remote compile helper (BASELINE.md). The Trainer also falls back to
    # this automatically when the fused compile fails.
    split_step: bool = False
    # rematerialize model blocks on the backward pass (jax.checkpoint at
    # block boundaries, models/*.py). TPU-native addition: trades cheap
    # recompute FLOPs (the step is HBM-bound, DESIGN.md r3) for
    # activation memory — the lever for larger batches and 512px.
    # Numerics and the param tree are unchanged (tests/test_remat.py).
    remat: bool = False

    @property
    def num_layers(self) -> int:
        from math import log2

        assert log2(self.image_size).is_integer(), (
            "image size must be a power of 2 (64, 128, 256, 512, 1024)"
        )
        return int(log2(self.image_size) - 1)

    # ---- the reference's persisted .config.json contract
    # (histoGAN/histoGAN.py:806-825): architecture keys are trusted over
    # CLI flags on load.
    PERSISTED_KEYS = (
        "image_size",
        "network_capacity",
        "transparent",
        "fq_layers",
        "fq_dict_size",
        "attn_layers",
    )

    def persisted(self) -> dict:
        d = {k: getattr(self, k) for k in self.PERSISTED_KEYS}
        d["fq_layers"] = list(d["fq_layers"])
        d["attn_layers"] = list(d["attn_layers"])
        return d

    def write_config(self, path: Path) -> None:
        Path(path).write_text(json.dumps(self.persisted()))

    def load_config(self, path: Path) -> "HistoGANConfig":
        p = Path(path)
        if not p.exists():
            return self
        cfg = json.loads(p.read_text())
        changes = {
            "image_size": cfg["image_size"],
            "network_capacity": cfg["network_capacity"],
            "transparent": cfg["transparent"],
            "fq_layers": tuple(cfg["fq_layers"]),
            "fq_dict_size": cfg["fq_dict_size"],
            "attn_layers": tuple(cfg.get("attn_layers", [])),
        }
        return dataclasses.replace(self, **changes)


@dataclasses.dataclass
class ReHistoGANConfig(HistoGANConfig):
    # recoloring-specific (ReHistoGAN/rehistoGAN.py:721-733)
    rec_loss: str = "laplacian"  # None->'L1', 'sobel', 'laplacian'
    variance_loss: bool = True
    internal_hist: bool = False
    skip_conn_to_GAN: bool = False
    fixed_gan_weights: bool = False
    initialize_gan: bool = False
    change_hyperparameters: bool = False
    change_hyperparameters_after: int = 100000
    alpha: float = 32.0
    beta: float = 1.5
    gamma: float = 4.0
    hist_sampling: bool = True
