"""Parameter initializers matching the reference's torch init scheme.

The reference initializes every nn.Conv2d / nn.Linear weight with
kaiming_normal_(a=0, mode='fan_in', nonlinearity='leaky_relu')
(histoGAN/histoGAN.py:686-690) — i.e. N(0, 2/fan_in) — while biases keep
torch's default U(-1/sqrt(fan_in), 1/sqrt(fan_in)). Conv2DMod weights get
the same kaiming init in their own ctor (histoGAN/histoGAN.py:414);
noise projections are zeroed (histoGAN/histoGAN.py:692-696).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

# N(0, sqrt(2/fan_in)) — torch kaiming_normal_ with leaky_relu gain sqrt(2).
kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_in", "normal")

zeros = nn.initializers.zeros


def torch_default_bias(fan_in: int):
    """torch nn.Linear / nn.Conv2d default bias: U(-1/sqrt(fan_in), +)."""
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init
