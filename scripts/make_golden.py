"""Generate golden test vectors by running the REFERENCE histogram blocks
(torch, CPU) on fixed random inputs. Run once; outputs are committed under
tests/golden/. The reference code itself is never imported at test time.

Usage: python scripts/make_golden.py
"""

import sys

import numpy as np
import torch

sys.path.insert(0, "/root/reference")
from histogram_classes.RGBuvHistBlock import RGBuvHistBlock  # noqa: E402
from histogram_classes.rgChromaHistBlock import rgChromaHistBlock  # noqa: E402
from histogram_classes.LabHistBlock import LabHistBlock  # noqa: E402

OUT = "tests/golden/hist_golden.npz"


def main():
    rng = np.random.RandomState(0)
    # image larger than insz in one config, smaller in another, non-square
    img_big = rng.rand(2, 3, 200, 180).astype(np.float32)
    img_small = rng.rand(2, 3, 96, 96).astype(np.float32)
    # include values slightly out of range to exercise the clamp
    img_big[0, 0, :5, :5] = 1.3
    img_big[1, 2, :5, :5] = -0.2

    out = {"img_big": img_big, "img_small": img_small}

    for method in ("inverse-quadratic", "RBF", "thresholding"):
        for resizing in ("interpolation", "sampling"):
            key = f"rgbuv_{method}_{resizing}"
            blk = RGBuvHistBlock(h=64, insz=150, resizing=resizing,
                                 method=method, sigma=0.02, device="cpu")
            with torch.no_grad():
                out[key + "_big"] = blk(torch.from_numpy(img_big)).numpy()
                out[key + "_small"] = blk(torch.from_numpy(img_small)).numpy()

    blk = RGBuvHistBlock(h=32, insz=150, resizing="interpolation",
                         method="inverse-quadratic", sigma=0.02,
                         green_only=True, device="cpu")
    with torch.no_grad():
        out["rgbuv_green_big"] = blk(torch.from_numpy(img_big)).numpy()

    blk = RGBuvHistBlock(h=64, insz=150, resizing="interpolation",
                         method="inverse-quadratic", sigma=0.02,
                         intensity_scale=False, device="cpu")
    with torch.no_grad():
        out["rgbuv_noscale_small"] = blk(torch.from_numpy(img_small)).numpy()

    blk = rgChromaHistBlock(h=64, insz=150, resizing="interpolation",
                            method="inverse-quadratic", sigma=0.02, device="cpu")
    with torch.no_grad():
        out["rgchroma_big"] = blk(torch.from_numpy(img_big)).numpy()

    blk = LabHistBlock(h=64, insz=150, resizing="interpolation",
                       method="inverse-quadratic", sigma=0.02, device="cpu")
    with torch.no_grad():
        out["lab_big"] = blk(torch.from_numpy(img_big)).numpy()

    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT} with {len(out)} arrays")


if __name__ == "__main__":
    main()
