"""Export pretrained torchvision weights to .npz for this framework.

Two modes:

1. On a machine WITH network access + torchvision (downloads the hub
   checkpoint, then converts):

       python scripts/export_weights.py inception inception_v3.npz
       python scripts/export_weights.py vgg16 vgg16.npz

2. TORCH-ONLY (no torchvision needed): if you already have the raw
   torchvision state-dict .pth — e.g. downloaded directly from
   https://download.pytorch.org/models/vgg16-397923af.pth or
   .../inception_v3_google-0cc3c7bd.pth — convert it with plain
   ``torch.load`` (VERDICT r3 next #4):

       python scripts/export_weights.py vgg16 vgg16.npz --from-pth vgg16-397923af.pth
       python scripts/export_weights.py inception inception_v3.npz \
           --from-pth inception_v3_google-0cc3c7bd.pth

   (Conversion is optional: metrics.inception.load_weights_file and
   ops.vgg.load_vgg16_weights accept the .pth directly. The .npz form
   just drops the torch dependency at load time.)

Then point INCEPTION_WEIGHTS / VGG16_WEIGHTS at the file (or pass the
path to metrics.inception_extractor / ops.vgg.VGGPerceptualLoss).
This zero-egress build environment cannot download weights itself; the
loaders are oracle-tested against the exact torchvision layouts in
tests/test_inception.py / tests/test_vgg.py, and the .pth->.npz round
trip in tests/test_weights_ingest.py.
"""

from __future__ import annotations

import sys

import numpy as np

# minimal layout check so a wrong file fails at export, not at load time
_REQUIRED_PREFIX = {
    "vgg16": "features.0.weight",
    "inception": "Conv2d_1a_3x3.conv.weight",
}


def main(argv=None):
    argv = list(argv if argv is not None else sys.argv[1:])
    from_pth = None
    if "--from-pth" in argv:
        i = argv.index("--from-pth")
        from_pth = argv[i + 1]
        del argv[i:i + 2]
    if len(argv) != 2 or argv[0] not in ("inception", "vgg16"):
        print(__doc__)
        raise SystemExit(2)
    model, out = argv

    if from_pth is not None:
        # torch-only path: the hub .pth IS the state_dict
        import torch

        sd = torch.load(from_pth, map_location="cpu", weights_only=True)
        raw = {k: np.asarray(v.detach().cpu().numpy()) for k, v in sd.items()}
    else:
        import torchvision

        if model == "inception":
            # aux_logits weights are present in the hub file; our loader
            # ignores them (metrics/inception.py)
            net = torchvision.models.inception_v3(weights="IMAGENET1K_V1")
        else:
            net = torchvision.models.vgg16(weights="IMAGENET1K_V1")
        raw = {k: v.detach().cpu().numpy() for k, v in net.state_dict().items()}

    need = _REQUIRED_PREFIX[model]
    if need not in raw:
        raise SystemExit(
            f"{out}: state dict does not look like a torchvision {model} "
            f"(missing key {need!r}); got keys like "
            f"{sorted(raw)[:3]}"
        )
    np.savez(out, **raw)
    print(f"wrote {len(raw)} arrays to {out}")


if __name__ == "__main__":
    main()
