"""Sustained reHistoGAN training + recoloring demo — quality evidence
for the SECOND flagship capability (the reference's marquee use case:
recolor a real photo toward a target histogram, rehistoGAN.py sampling
regime, /root/reference/README.md "Image Recoloring").

The histoGAN quality runs (scripts/quality_run*.py, docs/quality/)
prove the adversarial+histogram dynamics learn; this run proves the
recoloring encoder-decoder stack learns too: reconstruction loss falls,
hist loss falls (output palette matches the requested histogram), and
the final demo recolors 4 REAL reference input images toward the 6
bundled reference target_images' histograms — the exact workflow of the
reference's recoloring README examples.

Config mirrors the reference recoloring regime (rehistoGAN.py defaults:
skip_conn_to_GAN, laplacian rec loss, variance loss, sampling mode) at
128px cap16 with the production bf16 policy; corpus is the same
crop-augmented set as quality_run_xl (built here if absent).

Usage: python -u scripts/quality_run_rehisto.py [steps=10000] [batch=32] [--resume]
Artifacts land in /tmp/quality_run_rehisto; curated evidence goes to
docs/quality_rehisto/. One TPU client; run in background, never kill.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

OUT = Path("/tmp/quality_run_rehisto")
ALPHA, BETA, GAMMA = 32.0, 1.5, 2.0  # rehistoGAN.py CLI defaults
REF_BATCH = 2  # rehistoGAN.py --batch_size default (micro-batch, accum 8)


def hist_alpha_for_batch(alpha: float, batch: int, ref_batch: int = REF_BATCH):
    """Batch-compensated Hellinger weight.

    The reference's histogram loss (rehistoGAN.py:1011-1014) is
    ``alpha * (1/sqrt(2)) * sqrt(sum over the WHOLE batch) / B`` — the
    per-image gradient therefore scales as ``alpha / sqrt(B)``, while the
    reconstruction and adversarial terms are batch-invariant means. The
    reference regime is B=2 micro-batches; at a TPU-efficient B=32 the
    hist term is 4x weaker relative to rec/adv, and the r5 10k run showed
    exactly that failure: h_loss fell 4.38->2.05 by step 1.2k, then
    adv+rec reclaimed it (h->2.8) and conditioning sensitivity collapsed
    to 0.01 (vs 0.46 at init). ``alpha * sqrt(B/2)`` restores the
    reference's per-image hist:rec:adv gradient balance at any batch.
    """
    return alpha * float(np.sqrt(batch / ref_batch))


def make_conditioning_probe(t, image_size):
    """Closure logging output sensitivity to the target histogram.

    Recolors 4 fixed reference inputs toward the two most-different
    bundled targets and reports (a) mean |out_t1 - out_t6| — zero means
    the net ignores its hist input — and (b) Hellinger(hist(out), target)
    vs Hellinger(hist(input), target) — below-input means the palette
    actually moved toward the request.
    """
    import jax.numpy as jnp
    from PIL import Image

    from histogan_tpu.cli.histogan import load_target_hist
    from histogan_tpu.ops.histogram import RGBuvHistBlock

    cfg = t.cfg
    block = RGBuvHistBlock(insz=cfg.hist_insz, h=cfg.hist_bin,
                           resizing=cfg.hist_resizing, method=cfg.hist_method,
                           sigma=cfg.hist_sigma)
    srcs = sorted(Path("/root/reference/input_images").glob("*.jpg"))[:4]
    imgs = np.stack([
        np.asarray(Image.open(p).convert("RGB").resize(
            (image_size, image_size), Image.LANCZOS), np.float32) / 255.0
        for p in srcs])
    tdir = Path("/root/reference/target_images")
    h1 = np.repeat(load_target_hist(str(tdir / "1.jpg"), block), 4, axis=0)
    h6 = np.repeat(load_target_hist(str(tdir / "6.jpg"), block), 4, axis=0)

    def hell(a_hist, b_hist):  # mean per-image Hellinger/sqrt(2) in [0,1]
        d = np.sqrt(np.maximum(a_hist, 0)) - np.sqrt(np.maximum(b_hist, 0))
        return float(np.mean(np.sqrt((d ** 2).sum(axis=(1, 2, 3)) / 2.0)))

    in_hists = np.asarray(block(imgs))
    base = {"hell_in_t1": hell(in_hists, h1), "hell_in_t6": hell(in_hists, h6)}

    def probe(step):
        # float32 BEFORE any reduction: _recolor returns bf16, and
        # numpy reduces bf16 arrays with a bf16 accumulator — the sum
        # saturates at ~256, so np.mean over a (4,128,128,3) grid
        # reports ~256/196608 = 0.0013 REGARDLESS of content (measured
        # r5; the r5 15k run's in-run sens_L1 column shows exactly
        # that constant and is invalid — true final sens was 0.187).
        o1 = np.asarray(jnp.clip(t._recolor(jnp.asarray(imgs),
                                            jnp.asarray(h1)), 0, 1),
                        np.float32)
        o6 = np.asarray(jnp.clip(t._recolor(jnp.asarray(imgs),
                                            jnp.asarray(h6)), 0, 1),
                        np.float32)
        rec = {
            "probe_step": step,
            "sens_L1": round(float(np.mean(np.abs(o1 - o6))), 4),
            "hell_out_t1": round(hell(np.asarray(block(o1)), h1), 4),
            "hell_out_t6": round(hell(np.asarray(block(o6)), h6), 4),
            **{k: round(v, 4) for k, v in base.items()},
        }
        print(json.dumps(rec), flush=True)
        return rec

    return probe


def final_demo(t, image_size):
    """Recolor 4 real reference inputs toward each bundled target
    histogram — the reference README's recoloring workflow."""
    from PIL import Image

    from histogan_tpu.cli.histogan import load_target_hist
    from histogan_tpu.ops.histogram import RGBuvHistBlock

    cfg = t.cfg
    block = RGBuvHistBlock(insz=cfg.hist_insz, h=cfg.hist_bin,
                           resizing=cfg.hist_resizing, method=cfg.hist_method,
                           sigma=cfg.hist_sigma)
    srcs = sorted(Path("/root/reference/input_images").glob("*.jpg"))[:4]
    imgs = np.stack([
        np.asarray(Image.open(p).convert("RGB").resize(
            (image_size, image_size), Image.LANCZOS), np.float32) / 255.0
        for p in srcs])
    demo_dir = Path(t.results_dir) / t.name
    for tgt in sorted(Path("/root/reference/target_images").glob("*.jpg")):
        h = load_target_hist(str(tgt), block)           # (1,3,h,h)
        hists = np.repeat(h, len(imgs), axis=0)
        t.evaluate(num=f"demo-{tgt.stem}", image_batch=imgs,
                   hist_batch=hists, save_input=(tgt.stem == "1"))
        # keep the target alongside for the side-by-side
        Image.open(tgt).convert("RGB").resize((image_size, image_size)).save(
            demo_dir / f"demo-{tgt.stem}-target.jpg")
    print(f"demo grids written to {demo_dir}", flush=True)


def main():
    argv = [a for a in sys.argv[1:]
            if a not in ("--resume", "--ref_alpha")]
    resume = "--resume" in sys.argv
    # --ref_alpha: use the raw reference alpha (the r5 10k run showed it
    # under-weights the hist term ~4x at batch 32; see hist_alpha_for_batch)
    ref_alpha = "--ref_alpha" in sys.argv
    steps = int(argv[0]) if len(argv) > 0 else 10000
    batch = int(argv[1]) if len(argv) > 1 else 32
    image_size = 128

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from histogan_tpu.train import NanException
    from histogan_tpu.train.rehisto_trainer import RecoloringTrainer

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from quality_run_xl import build_corpus

    data_dir = Path("/tmp/quality_run_xl/data")
    n = build_corpus(data_dir, image_size)
    print(f"dataset: {n} crop-augmented images at {image_size}px", flush=True)

    t = RecoloringTrainer(
        name="rehisto128",
        results_dir=str(OUT / "results"),
        models_dir=str(OUT / "models"),
        image_size=image_size, network_capacity=16, batch_size=batch,
        gradient_accumulate_every=1, precision="bf16", seed=0,
        sync_every=25, save_every=2000,
        skip_conn_to_GAN=True, initialize_gan=True, variance_loss=True,
        rec_loss="laplacian", internal_hist=False,
    )
    t.init_GAN()
    if resume:
        t.load(-1)
        print(f"resumed at step {t.steps}", flush=True)
    t.set_data_src(str(data_dir), sampling=True)

    alpha = ALPHA if ref_alpha else hist_alpha_for_batch(ALPHA, batch)
    print(json.dumps({"alpha": alpha, "beta": BETA, "gamma": GAMMA,
                      "batch": batch,
                      "alpha_batch_compensated": not ref_alpha}), flush=True)
    probe = make_conditioning_probe(t, image_size)

    t0 = time.time()
    last = t0
    nan_retries = 0
    start_step = t.steps
    for i in range(start_step, steps):
        try:
            t.train(alpha=alpha, beta=BETA, gamma=GAMMA)
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
                "h": round(t.h_loss, 4), "rec": round(t.r_loss, 4),
                "var": round(t.var_loss, 4), "gp": round(t.last_gp_loss, 4),
                "imgs_per_sec": round(rate, 1),
                "elapsed_s": round(now - t0, 1)}), flush=True)
        if i and i % 2000 == 0:
            probe(i)
    dt = time.time() - t0
    done = steps - start_step
    if done:
        print(f"{done} steps in {dt / 60:.1f} min -> "
              f"{done * batch / dt:.1f} imgs/sec end-to-end", flush=True)
    t.save(steps // t.cfg.save_every)
    probe(steps)
    final_demo(t, image_size)


if __name__ == "__main__":
    main()
