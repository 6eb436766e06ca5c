"""Executable histogram-loss example.

Equivalent of the reference's Histogram_loss.ipynb (the de-facto numeric
spec of the histogram feature + Hellinger loss): compute the RGB-uv
histogram of an input and a target image, print the loss, and save the
histogram visualizations.

Usage: python examples/histogram_loss.py <input.jpg> <target.jpg> [out_dir]
"""

import sys
from pathlib import Path

import numpy as np

from histogan_tpu.data.dataset import load_rgb
from histogan_tpu.ops.histogram import RGBuvHistBlock
from histogan_tpu.ops.losses import hellinger_histogram_loss
from histogan_tpu.utils.image_io import save_image


def main():
    input_path = sys.argv[1] if len(sys.argv) > 1 else None
    target_path = sys.argv[2] if len(sys.argv) > 2 else None
    out_dir = Path(sys.argv[3] if len(sys.argv) > 3 else "./histogram_example")
    if not input_path or not target_path:
        print(__doc__)
        sys.exit(1)

    block = RGBuvHistBlock(insz=150, h=64, resizing="interpolation",
                           method="inverse-quadratic", sigma=0.02)
    input_hist = block(load_rgb(input_path)[None])
    target_hist = block(load_rgb(target_path)[None])

    loss = float(hellinger_histogram_loss(target_hist, input_hist, alpha=1.0))
    print(f"histogram loss = {loss:.6f}")

    out_dir.mkdir(parents=True, exist_ok=True)
    for name, h in (("input", input_hist), ("target", target_hist)):
        vis = np.asarray(h[0]).transpose(1, 2, 0)  # (h, h, 3)
        vis = vis / (vis.max() + 1e-8)
        save_image(np.sqrt(vis), out_dir / f"{name}_hist.png")  # sqrt for display
        np.save(out_dir / f"{name}_hist.npy", np.asarray(h))
    print(f"histograms saved under {out_dir}/")


if __name__ == "__main__":
    main()
