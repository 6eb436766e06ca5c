"""Sustained training on a crop-augmented corpus — the round-4 answer
to the r4 quality run's honest caveat.

The first sustained run (scripts/quality_run.py, docs/quality/) trained
on the only real corpus in this zero-egress env — the reference's 60
bundled photos — and, exactly as a GAN must on 60 uniques, memorized
them by ~24.5k steps (d_loss pins at 0, FID climbs). This run
multiplies the corpus ~32x WITHOUT new data: random square crops
(side uniform in [256, 1024], any position, 50% hflip) of the same
1024px sources, resized to 128px — ~1950 distinct views. Same trainer
config as the first run (128px cap16 bf16 b64, reference optimizer
numerics). Expected signature: the FID band holds/keeps improving well
past 24.5k and d_loss does NOT pin at 0 — evidence the earlier tail
was corpus-scale, not framework, behavior (docs/quality/README.md).

Usage: python -u scripts/quality_run_xl.py [steps=30000] [batch=64] [--resume]
Artifacts land in /tmp/quality_run_xl; curated evidence goes to
docs/quality/ afterwards. One TPU client; run in background, never kill.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

CROPS_PER_SOURCE = 32
MIN_SIDE, MAX_SIDE = 256, 1024


def build_corpus(data_dir: Path, image_size: int) -> int:
    from PIL import Image

    data_dir.mkdir(parents=True, exist_ok=True)
    srcs = sorted(Path("/root/reference/input_images").glob("*.jpg"))
    n = len(srcs) * CROPS_PER_SOURCE
    if len(list(data_dir.glob("*.jpg"))) == n:
        return n  # already built (resume path)
    rng = np.random.default_rng(42)
    k = 0
    for p in srcs:
        im = Image.open(p).convert("RGB")
        w, h = im.size
        for _ in range(CROPS_PER_SOURCE):
            # some bundled sources are smaller than MIN_SIDE on a side —
            # clamp the crop range to what the image actually has
            s_max = min(MAX_SIDE, w, h)
            s_min = min(MIN_SIDE, s_max)
            side = int(rng.integers(s_min, s_max + 1))
            x = int(rng.integers(0, w - side + 1))
            y = int(rng.integers(0, h - side + 1))
            crop = im.crop((x, y, x + side, y + side)).resize(
                (image_size, image_size), Image.LANCZOS)
            if rng.random() < 0.5:
                crop = crop.transpose(Image.FLIP_LEFT_RIGHT)
            crop.save(data_dir / f"{k}.jpg", quality=95)
            k += 1
    return k


def main():
    argv = [a for a in sys.argv[1:] if a != "--resume"]
    resume = "--resume" in sys.argv
    steps = int(argv[0]) if len(argv) > 0 else 30000
    batch = int(argv[1]) if len(argv) > 1 else 64
    image_size = 128

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from histogan_tpu.train import NanException, Trainer

    data_dir = Path("/tmp/quality_run_xl/data")
    n = build_corpus(data_dir, image_size)
    print(f"dataset: {n} crop-augmented images at {image_size}px", flush=True)

    t = Trainer(
        name="quality128xl",
        results_dir="/tmp/quality_run_xl/results",
        models_dir="/tmp/quality_run_xl/models",
        image_size=image_size, network_capacity=16, batch_size=batch,
        gradient_accumulate_every=1, precision="bf16", seed=0,
        sync_every=25, save_every=2000,
        calculate_fid_every=500, fid_num_samples=128,
    )
    if resume:
        t.load(-1)
        print(f"resumed at step {t.steps}", flush=True)
    else:
        t.init_GAN()
    t.set_data_src(str(data_dir))

    t0 = time.time()
    last = t0
    nan_retries = 0
    start_step = t.steps
    for i in range(start_step, steps):
        try:
            t.train()
        except NanException:
            nan_retries += 1
            print(json.dumps({"step": i, "nan_rollback": nan_retries}),
                  flush=True)
            continue
        if i % 200 == 0 or i == steps - 1:
            now = time.time()
            rate = 200 * batch / (now - last) if i else 0.0
            last = now
            print(json.dumps({
                "step": i, "d": round(t.d_loss, 4), "g": round(t.g_loss, 4),
                "h": round(t.h_loss, 4), "gp": round(t.last_gp_loss, 4),
                "pl": round(t.pl_mean, 4),
                "imgs_per_sec": round(rate, 1),
                "elapsed_s": round(now - t0, 1)}), flush=True)
    dt = time.time() - t0
    done = steps - start_step
    print(f"{done} steps in {dt / 60:.1f} min -> "
          f"{done * batch / dt:.1f} imgs/sec end-to-end", flush=True)
    t.evaluate(num="final")
    t.save(steps // t.cfg.save_every)

    scores = Path("/tmp/quality_run_xl/results/quality128xl/fid_scores.txt")
    if scores.exists():
        print("FID trajectory:", flush=True)
        print(scores.read_text().strip(), flush=True)


if __name__ == "__main__":
    main()
