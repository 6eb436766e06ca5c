"""Training state pytrees."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct


class HistoGANState(struct.PyTreeNode):
    """Everything that must round-trip through a checkpoint
    (reference saves the whole-GAN state_dict incl. EMA copies and both
    optimizers are re-created — we persist optimizer state too, which the
    reference loses on resume; documented improvement)."""

    step: jnp.ndarray                 # int32 scalar
    params_g: Any                     # {'S', 'H', 'G'}
    params_d: Any
    ema: Any                          # {'S', 'H', 'G'} (SE/HE/GE)
    opt_g: Any
    opt_d: Any
    pl_mean: jnp.ndarray              # float32 scalar
    vq_stats: Any = struct.field(default_factory=dict)


class ReHistoGANState(struct.PyTreeNode):
    """State for the recoloring trainer (no EMA / path-length in the
    reference recoloringTrainer)."""

    step: jnp.ndarray
    params_g: Any                     # {'ED', 'H', 'G'}
    params_d: Any
    opt_g: Any
    opt_d: Any
    vq_stats: Any = struct.field(default_factory=dict)
