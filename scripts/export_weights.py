"""Export pretrained torchvision weights to .npz for this framework.

Run on a machine WITH network access + torchvision, then copy the npz:

    python scripts/export_weights.py inception inception_v3.npz
    python scripts/export_weights.py vgg16 vgg16.npz

Then point INCEPTION_WEIGHTS / VGG16_WEIGHTS at the files (or pass the
paths to metrics.inception_extractor / ops.vgg.VGGPerceptualLoss).
This zero-egress build environment cannot download them itself; the
loaders are oracle-tested against the exact torchvision layouts in
tests/test_inception.py and tests/test_vgg.py.
"""

from __future__ import annotations

import sys

import numpy as np


def main(argv=None):
    argv = argv or sys.argv[1:]
    if len(argv) != 2 or argv[0] not in ("inception", "vgg16"):
        print(__doc__)
        raise SystemExit(2)
    model, out = argv

    import torchvision

    if model == "inception":
        # aux_logits weights are present in the hub file; our loader
        # ignores them (metrics/inception.py)
        net = torchvision.models.inception_v3(weights="IMAGENET1K_V1")
    else:
        net = torchvision.models.vgg16(weights="IMAGENET1K_V1")
    raw = {k: v.detach().cpu().numpy() for k, v in net.state_dict().items()}
    np.savez(out, **raw)
    print(f"wrote {len(raw)} arrays to {out}")


if __name__ == "__main__":
    main()
