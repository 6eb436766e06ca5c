"""End-to-end real-data training throughput at the flagship config.

Measures the full product path — JPEG folder -> ImageFolderDataset
(decoded-image cache) -> HistogramPool -> TrainLoader prefetch thread ->
Trainer.train() with async metrics — at 256px / capacity 16 / effective
batch 16, the reference's released-model config (README.md:307,
histoGAN.py:219-221). Contrast with bench.py, which feeds
device-resident synthetic batches (compute path only).

A synthetic dataset (default 256 random-field JPEGs at 320px) is
generated under --data on first use; pass a real folder to measure
against real images. The first run also builds the decoded-image cache
and the histogram pool (one-time cost, reported separately); the steady
state is what BASELINE.md records.

Usage: python scripts/bench_e2e.py [--steps 48] [--sync-every 25]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
# the axon sitecustomize registers the TPU plugin at startup; honor
# JAX_PLATFORMS=cpu explicitly so CPU smoke runs work (CLAUDE.md)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np


def make_synthetic_dataset(folder: str, n: int = 256, size: int = 320,
                           seed: int = 0) -> None:
    """Random smooth color fields saved as JPEG — exercises the real
    decode path (PIL JPEG decode + two resizes) with nontrivial
    histograms."""
    from PIL import Image

    out = Path(folder)
    out.mkdir(parents=True, exist_ok=True)
    if len(list(out.glob("*.jpg"))) >= n:
        return
    rng = np.random.default_rng(seed)
    for i in range(n):
        low = rng.random((8, 8, 3), np.float32)
        img = Image.fromarray((low * 255).astype(np.uint8)).resize(
            (size, size), Image.BILINEAR)
        img.save(out / f"synth_{i:04d}.jpg", quality=92)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/tmp/e2e_data")
    ap.add_argument("--steps", type=int, default=48)
    ap.add_argument("--warmup", type=int, default=8)
    ap.add_argument("--sync-every", type=int, default=25)
    ap.add_argument("--precision", default="bf16")
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--models-dir", default="/tmp/e2e_models")
    ap.add_argument("--rehisto", action="store_true",
                    help="Measure the ReHistoGAN (recoloring) trainer "
                         "instead: real images on BOTH phases.")
    args = ap.parse_args()

    make_synthetic_dataset(args.data)

    t0 = time.perf_counter()
    if args.rehisto:
        from histogan_tpu.train.rehisto_trainer import RecoloringTrainer

        tr = RecoloringTrainer(
            name="bench_e2e_re", results_dir="/tmp/e2e_results",
            models_dir=args.models_dir,
            image_size=args.image_size, network_capacity=16,
            batch_size=args.batch_size, gradient_accumulate_every=1,
            precision=args.precision, sync_every=args.sync_every,
            save_every=100000, skip_conn_to_GAN=True, variance_loss=True,
        )
        tr.set_data_src(args.data, sampling=True)
    else:
        from histogan_tpu.train.trainer import Trainer

        tr = Trainer(
            name="bench_e2e", results_dir="/tmp/e2e_results",
            models_dir=args.models_dir,
            image_size=args.image_size, network_capacity=16,
            batch_size=args.batch_size, gradient_accumulate_every=1,
            precision=args.precision, sync_every=args.sync_every,
            save_every=100000,
        )
        tr.set_data_src(args.data)
    setup_s = time.perf_counter() - t0
    print(f"setup (decode cache + hist pool): {setup_s:.1f}s", flush=True)

    # warmup covers every jit variant on the step schedule (gp %4, pl %32)
    # plus the step-0 save/evaluate
    t0 = time.perf_counter()
    for _ in range(args.warmup):
        tr.train()
    # force a sync so compile time stays out of the timed window
    print(f"warmup {args.warmup} steps: {time.perf_counter() - t0:.1f}s "
          f"(d_loss={tr.d_loss:.3f})", flush=True)

    import jax
    import jax.numpy as jnp

    imgs_per_step = args.batch_size
    t0 = time.perf_counter()
    start = tr.steps
    while tr.steps < start + args.steps:
        tr.train()
    # the trainer's own sync cadence already fetched metrics inside the
    # window; one final fetch closes the dependency chain
    float(jnp.sum(jax.tree_util.tree_leaves(tr.state.params_d)[0]
                  .astype(jnp.float32)))
    dt = time.perf_counter() - t0
    rate = args.steps * imgs_per_step / dt
    family = "rehistogan" if args.rehisto else "histogan"
    print(json.dumps({
        "metric": f"{family}_e2e_train_imgs_per_sec_{args.image_size}px_"
                  f"cap16_{args.precision}",
        "value": round(rate, 2),
        "unit": "imgs/sec",
        "steps": args.steps,
        "sync_every": args.sync_every,
        "setup_s": round(setup_s, 1),
    }), flush=True)
    tr.loader.close()


if __name__ == "__main__":
    main()
