"""FID estimator repeatability study (VERDICT r2 #7).

Quantifies the variance of the FID gate as a function of sample count so
`fid_num_samples` has a measured basis:

1. noise floor: FID between two DISJOINT halves of the same real
   dataset (identical distribution -> ideal FID 0; the measured value is
   pure estimator noise) at several n;
2. seed sensitivity: FID(real, generated) computed twice with different
   generation seeds at several n — the spread is what a regression gate
   must tolerate.

Runs with the same extractor the environment uses (pretrained if
INCEPTION_WEIGHTS is set, else the seeded random-features fallback —
provenance is printed). CPU-friendly; pass --device tpu to run there.

Usage: python -u scripts/fid_variance.py [--n-images 256] [--sizes 16 32 64 128]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-images", type=int, default=256)
    ap.add_argument("--sizes", type=int, nargs="+",
                    default=[16, 32, 64, 128])
    ap.add_argument("--image-size", type=int, default=64)
    ap.add_argument("--device", default="cpu", choices=("cpu", "default"))
    args = ap.parse_args()
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    else:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jax_cache"))

    import numpy as np

    from histogan_tpu.metrics.fid import (
        FIDScorer, compute_statistics, default_extractor, frechet_distance,
    )

    rng = np.random.default_rng(0)
    s = args.image_size
    # smooth random color fields: structured enough that inception
    # features vary; two draws from the SAME process = same distribution
    def make_images(n, seed):
        r = np.random.default_rng(seed)
        low = r.random((n, 8, 8, 3)).astype(np.float32)
        out = np.empty((n, s, s, 3), np.float32)
        import jax.image

        out[:] = np.asarray(jax.image.resize(low, (n, s, s, 3), "bilinear"))
        return np.clip(out, 0, 1)

    extractor = default_extractor()
    prov = getattr(extractor, "provenance", "custom")
    print(f"extractor provenance: {prov}", flush=True)

    pool = make_images(args.n_images * 2, seed=1)
    feats = []
    bs = 32
    for i in range(0, len(pool), bs):
        feats.append(np.asarray(extractor(pool[i:i + bs])))
    feats = np.concatenate(feats)
    print(f"features: {feats.shape}", flush=True)

    results = {"provenance": prov, "noise_floor": {}, "seed_spread": {}}
    print("\n-- noise floor: FID(real_A_n, real_B_n), disjoint halves --",
          flush=True)
    for n in args.sizes:
        if 2 * n > len(feats):
            continue
        vals = []
        for trial in range(4):
            idx = np.random.default_rng(100 + trial).permutation(len(feats))
            fa, fb = feats[idx[:n]], feats[idx[n:2 * n]]
            vals.append(frechet_distance(*compute_statistics(fa),
                                         *compute_statistics(fb)))
        vals = np.asarray(vals)
        results["noise_floor"][n] = [round(float(v), 3) for v in vals]
        print(f"n={n:4d}: FID {vals.mean():9.3f} +/- {vals.std():7.3f} "
              f"(4 trials; ideal 0)", flush=True)

    print("\n-- seed spread: FID(real, fake_seed_k) over two seeds --",
          flush=True)
    # 'generated': a different random-field process (different smoothness)
    def make_fake(n, seed):
        r = np.random.default_rng(seed)
        low = r.random((n, 16, 16, 3)).astype(np.float32)
        import jax.image

        out = np.asarray(jax.image.resize(low, (n, s, s, 3), "bilinear"))
        return np.clip(out, 0, 1).astype(np.float32)

    for n in args.sizes:
        if n > len(feats) // 2:
            continue
        real_mu_sig = compute_statistics(feats[:n])
        vals = []
        for seed in (7, 8):
            fake = make_fake(n, seed)
            ff = []
            for i in range(0, n, bs):
                ff.append(np.asarray(extractor(fake[i:i + bs])))
            ff = np.concatenate(ff)
            vals.append(frechet_distance(*real_mu_sig,
                                         *compute_statistics(ff)))
        spread = abs(vals[0] - vals[1])
        rel = spread / max(np.mean(vals), 1e-9)
        results["seed_spread"][n] = {
            "fids": [round(float(v), 3) for v in vals],
            "rel_spread": round(float(rel), 4),
        }
        print(f"n={n:4d}: FID {vals[0]:9.3f} vs {vals[1]:9.3f} "
              f"(rel spread {rel*100:.1f}%)", flush=True)

    print("\n" + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
