"""Small real-training demonstration on TPU: train histoGAN on the
reference's sample images for a few hundred steps and report the loss
trajectory + sample grids. Artifacts under /tmp/train_demo.

Usage: python scripts/train_demo.py [steps] [image_size]
"""

import json
import sys
import time
from pathlib import Path

import numpy as np


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    image_size = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from PIL import Image

    from histogan_tpu.train import Trainer

    # dataset: the reference's bundled sample images, downscaled
    data_dir = Path("/tmp/train_demo/data")
    data_dir.mkdir(parents=True, exist_ok=True)
    srcs = sorted(Path("/root/reference/input_images").glob("*.jpg"))
    for i, p in enumerate(srcs):
        img = Image.open(p).convert("RGB").resize((image_size, image_size))
        img.save(data_dir / f"{i}.jpg")
    print(f"dataset: {len(srcs)} images at {image_size}px", flush=True)

    t = Trainer(
        name="demo", results_dir="/tmp/train_demo/results",
        models_dir="/tmp/train_demo/models", image_size=image_size,
        network_capacity=16, batch_size=8, gradient_accumulate_every=1,
        save_every=max(100, steps), precision="bf16", seed=0,
        sync_every=25, calculate_fid_every=max(100, steps // 4),
        # >= 128: the measured FID-estimator noise floor (real-vs-real
        # disjoint halves) is 0.26-0.30 at n=128 vs 0.6-2.1 at n<=32
        # (scripts/fid_variance.py, DESIGN.md "FID gate trust")
        fid_num_samples=128,
    )
    t.init_GAN()
    t.set_data_src(str(data_dir))

    hist = []
    t0 = time.time()
    for i in range(steps):
        t.train(alpha=2)
        if i % 25 == 0 or i == steps - 1:
            hist.append({"step": i, "d": round(t.d_loss, 3),
                         "g": round(t.g_loss, 3), "h": round(t.h_loss, 3)})
            print(json.dumps(hist[-1]), flush=True)
    dt = time.time() - t0
    print(f"{steps} steps in {dt:.1f}s -> {steps * 8 / dt:.1f} imgs/sec "
          f"end-to-end (incl. host data pipeline)", flush=True)
    t.evaluate(num="final")
    print("losses first/last:", hist[0], hist[-1], flush=True)
    scores = Path("/tmp/train_demo/results/demo/fid_scores.txt")
    if scores.exists():
        print("fid trajectory (random-feature extractor):", flush=True)
        print(scores.read_text().strip(), flush=True)


if __name__ == "__main__":
    main()
