"""Golden vectors for post-processing ops, generated from the reference
utils (torch-free numpy code). Run once; committed under tests/golden/."""

import sys

import numpy as np

sys.path.insert(0, "/root/reference")
from utils.imresize import imresize as ref_imresize  # noqa: E402
from utils.color_transfer_MKL import color_transfer_MKL as ref_mkl  # noqa: E402

OUT = "tests/golden/post_golden.npz"


def main():
    rng = np.random.RandomState(0)
    img = rng.rand(37, 53, 3)
    img_u8 = (rng.rand(24, 31, 3) * 255).astype(np.uint8)
    src = rng.rand(40, 30, 3)
    tgt = rng.rand(25, 35, 3)

    out = {
        "img": img,
        "img_u8": img_u8,
        "src": src,
        "tgt": tgt,
        "up_bicubic": ref_imresize(img, scalar_scale=2.0, method="bicubic"),
        "down_bicubic": ref_imresize(img, scalar_scale=0.4, method="bicubic"),
        "shape_bilinear": ref_imresize(img, output_shape=(64, 48), method="bilinear"),
        "u8_down": ref_imresize(img_u8, scalar_scale=0.5, method="bicubic"),
        "mkl": ref_mkl(src, tgt),
    }
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT} with {len(out)} arrays")


if __name__ == "__main__":
    main()
