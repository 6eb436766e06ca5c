"""EMA vector quantization for discriminator feature maps.

Replicates the third-party ``vector_quantize_pytorch.VectorQuantize``
used by the reference (histoGAN/histoGAN.py:32, :600-601): nearest-
codebook lookup, EMA codebook updates (decay 0.8), straight-through
estimator, commitment loss. The codebook lives in a mutable
``vq_stats`` flax collection (the torch version uses non-gradient
buffers); pass ``train=True`` with ``mutable=['vq_stats']`` to update.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class VectorQuantize(nn.Module):
    dim: int
    n_embed: int
    decay: float = 0.8
    commitment: float = 1.0
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        embed = self.variable(
            "vq_stats",
            "embed",
            lambda: jax.random.normal(self.make_rng("params"), (self.dim, self.n_embed)),
        )
        cluster_size = self.variable(
            "vq_stats", "cluster_size", lambda: jnp.zeros((self.n_embed,))
        )
        # jnp.copy: embed_avg must be a distinct buffer from embed, or
        # donating the train state donates the same buffer twice
        embed_avg = self.variable("vq_stats", "embed_avg",
                                  lambda: jnp.copy(embed.value))

        flat = x.reshape(-1, self.dim)
        # negative squared distance to each code
        dist = (
            -jnp.sum(jnp.square(flat), axis=1, keepdims=True)
            + 2.0 * flat @ embed.value
            - jnp.sum(jnp.square(embed.value), axis=0, keepdims=True)
        )
        idx = jnp.argmax(dist, axis=1)
        onehot = jax.nn.one_hot(idx, self.n_embed, dtype=flat.dtype)
        quantized = embed.value.T[idx].reshape(x.shape)

        if train:
            new_cluster = self.decay * cluster_size.value + (1 - self.decay) * onehot.sum(0)
            new_avg = self.decay * embed_avg.value + (1 - self.decay) * (flat.T @ onehot)
            n = new_cluster.sum()
            smoothed = (new_cluster + self.eps) / (n + self.n_embed * self.eps) * n
            cluster_size.value = new_cluster
            embed_avg.value = new_avg
            embed.value = new_avg / smoothed[None, :]

        commit_loss = self.commitment * jnp.mean(
            jnp.square(jax.lax.stop_gradient(quantized) - x)
        )
        quantized = x + jax.lax.stop_gradient(quantized - x)
        return quantized, commit_loss
