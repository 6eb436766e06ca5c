"""Build the recoloring sampling pool: RGB-uv histogram (insz=250,
sampling resize) of every image in ./histogram_data/, stacked and saved
as histograms.npy with shape (N, 1, 3, h, h).

Reference: create_hist_data.py:33-55.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description="Create histogram pool data.")
    parser.add_argument("--input_dir", default="./histogram_data/")
    parser.add_argument("--output", default=None,
                        help="default: <input_dir>/histograms.npy")
    parser.add_argument("--hist_bin", type=int, default=64)
    parser.add_argument("--hist_insz", type=int, default=250)
    parser.add_argument("--hist_method", default="inverse-quadratic")
    parser.add_argument("--hist_resizing", default="sampling")
    parser.add_argument("--hist_sigma", type=float, default=0.02)
    args = parser.parse_args(argv)

    from histogan_tpu.data.dataset import list_images, load_rgb
    from histogan_tpu.ops.histogram import RGBuvHistBlock

    block = RGBuvHistBlock(
        insz=args.hist_insz, h=args.hist_bin, resizing=args.hist_resizing,
        method=args.hist_method, sigma=args.hist_sigma,
    )
    paths = list_images(args.input_dir)
    if not paths:
        raise FileNotFoundError(f"no images under {args.input_dir}")
    hists = []
    for p in paths:
        img = load_rgb(p)
        hists.append(np.asarray(block(img[None]))[None])  # (1, 1, 3, h, h)
    out = np.concatenate(hists, axis=0)
    out_path = Path(args.output or (Path(args.input_dir) / "histograms.npy"))
    out_path.parent.mkdir(parents=True, exist_ok=True)
    np.save(out_path, out)
    print(f"saved {out.shape} histogram pool to {out_path}")


if __name__ == "__main__":
    main()
