"""histogan_tpu — a TPU-native JAX/Pallas rebuild of HistoGAN.

A standalone framework with the capabilities of mahmoudnafifi/HistoGAN
(CVPR 2021), redesigned TPU-first:

- Compute path in JAX/XLA with Pallas kernels for the hot ops.
- Data parallelism over a ``jax.sharding.Mesh`` (the reference is
  single-GPU only; see /root/reference/histoGAN/histoGAN.py:46-47).
- Functional training steps under ``jax.jit`` with explicit PRNG keys
  (the reference uses impure ``random()`` / ``torch.rand`` throughout).

Public surface mirrors the reference's capabilities:

- :mod:`histogan_tpu.ops` — differentiable histogram features
  (RGB-uv / rg-chroma / Lab), modulated conv, DiffAugment, losses.
- :mod:`histogan_tpu.models` — HistoGAN generator/discriminator,
  style/histogram vectorizers, ReHistoGAN encoder-decoder.
- :mod:`histogan_tpu.train` — trainers, EMA, checkpointing.
- :mod:`histogan_tpu.data` — folder dataset with histogram pool.
- :mod:`histogan_tpu.post` — pyramid upsampling, MKL color transfer,
  MATLAB-semantics imresize, bilateral guided upsampling (BGU).
- :mod:`histogan_tpu.cli` — entry points matching the 6 reference scripts.
"""

__version__ = "0.1.0"

from histogan_tpu.ops.histogram import (  # noqa: F401
    HistBlock,
    RGBuvHistBlock,
    rgChromaHistBlock,
    LabHistBlock,
    histogram_feature,
)
from histogan_tpu.ops.losses import hellinger_histogram_loss  # noqa: F401


def __getattr__(name):
    # lazy heavyweight exports (mirror the reference package surface,
    # histoGAN/__init__.py:1-3 / ReHistoGAN/__init__.py:1)
    if name in ("Trainer", "NanException"):
        from histogan_tpu import train

        return getattr(train, name)
    if name == "RecoloringTrainer":
        from histogan_tpu.train.rehisto_trainer import RecoloringTrainer

        return RecoloringTrainer
    if name in ("Generator", "Discriminator", "StyleVectorizer",
                "HistVectorizer", "Conv2DMod", "GeneratorBlock", "RGBBlock",
                "DiscriminatorBlock"):
        from histogan_tpu import models

        return getattr(models, name)
    raise AttributeError(f"module 'histogan_tpu' has no attribute {name!r}")
