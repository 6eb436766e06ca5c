"""HistoGAN discriminator (histoGAN/histoGAN.py:572-631).

Residual conv downsampling stack with optional linear-attention and
vector-quantize blocks per layer index, flatten, single logit.
"""

from __future__ import annotations

from math import log2
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from histogan_tpu.models.blocks import DiscriminatorBlock
from histogan_tpu.models.attention import RezeroResidual
from histogan_tpu.models.layers import TorchLinear
from histogan_tpu.models.vq import VectorQuantize


class Discriminator(nn.Module):
    image_size: int
    network_capacity: int = 16
    fq_layers: Sequence[int] = ()
    fq_dict_size: int = 256
    attn_layers: Sequence[int] = ()
    transparent: bool = False
    # TPU-native addition: rematerialize conv blocks on backward (see
    # models/generator.py remat note). Attention/VQ blocks stay
    # un-rematted (VQ carries a mutable 'vq_stats' collection).
    remat: bool = False
    # TPU-native addition: optional NamedSharding pinned onto the
    # flattened (B, 2*2*C) activation. Under ZeRO-3 FSDP the backward
    # cotangent of the flatten otherwise inherits the all-gathered
    # to_logit weight's layout and GSPMD resolves the reshape transpose
    # by replicate-then-repartition ("Involuntary full rematerialization",
    # MULTICHIP_r03 / VERDICT r3 weak #2). Constraining the forward
    # tensor to batch sharding pins the cotangent too
    # (with_sharding_constraint transposes to itself), so the backward
    # reshape is a local no-op. None (the default, and always on the
    # single-chip / replicated path) leaves the HLO byte-identical.
    flatten_sharding: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        num_layers = int(log2(self.image_size) - 1)
        filters = [3 if not self.transparent else 4] + [
            self.network_capacity * (2 ** i) for i in range(num_layers + 1)
        ]
        pairs = list(zip(filters[:-1], filters[1:]))
        block_cls = nn.remat(DiscriminatorBlock) if self.remat else DiscriminatorBlock

        quantize_loss = jnp.zeros((), dtype=x.dtype)
        for ind, (_, out_chan) in enumerate(pairs):
            num_layer = ind + 1
            is_not_last = ind != (len(pairs) - 1)
            x = block_cls(out_chan, downsample=is_not_last, name=f"blocks_{ind}")(x)
            if num_layer in self.attn_layers:
                x = RezeroResidual(out_chan, name=f"attn_{ind}_0")(x)
                x = RezeroResidual(out_chan, name=f"attn_{ind}_1")(x)
            if num_layer in self.fq_layers:
                x, qloss = VectorQuantize(out_chan, self.fq_dict_size, name=f"vq_{ind}")(
                    x, train=train
                )
                quantize_loss = quantize_loss + qloss

        x = x.reshape(x.shape[0], -1)  # (B, 2*2*filters[-1])
        if self.flatten_sharding is not None:
            x = jax.lax.with_sharding_constraint(x, self.flatten_sharding)
        logits = TorchLinear(1, name="to_logit")(x)
        return jnp.squeeze(logits, axis=-1), quantize_loss
