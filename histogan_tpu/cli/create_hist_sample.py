"""Single-image histogram -> ./histograms/<name>.npy.

Reference: create_hist_sample.py:25-44.
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description="Create a target histogram.")
    parser.add_argument("--image", required=True)
    parser.add_argument("--output_dir", default="./histograms/")
    parser.add_argument("--hist_bin", type=int, default=64)
    parser.add_argument("--hist_insz", type=int, default=150)
    parser.add_argument("--hist_method", default="inverse-quadratic")
    parser.add_argument("--hist_resizing", default="interpolation")
    parser.add_argument("--hist_sigma", type=float, default=0.02)
    args = parser.parse_args(argv)

    from histogan_tpu.data.dataset import load_rgb
    from histogan_tpu.ops.histogram import RGBuvHistBlock

    block = RGBuvHistBlock(
        insz=args.hist_insz, h=args.hist_bin, resizing=args.hist_resizing,
        method=args.hist_method, sigma=args.hist_sigma,
    )
    hist = np.asarray(block(load_rgb(args.image)[None]))
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    name = os.path.splitext(os.path.basename(args.image))[0]
    out = out_dir / f"{name}.npy"
    np.save(out, hist)
    print(f"saved histogram {hist.shape} to {out}")


if __name__ == "__main__":
    main()
