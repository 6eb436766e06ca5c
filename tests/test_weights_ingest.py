"""Torch-only pretrained-weights ingestion round trip (VERDICT r3 #4).

The reference loads torchvision's pretrained VGG16 at import
(/root/reference/utils/vggloss.py:5-10) and the published workflow
downloads hub .pth files. This environment has torch but NO torchvision
and no egress, so the framework's ingestion contract is: a raw
torchvision-format state-dict .pth (what download.pytorch.org serves)
must work end-to-end via plain ``torch.load`` — both loaded directly by
the extractors and converted to .npz by scripts/export_weights.py
--from-pth. These tests round-trip RANDOM state dicts with the exact
torchvision layouts through the real files, so the day a genuine
weights file exists the pipeline is known-good.
"""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _export_weights_main():
    spec = importlib.util.spec_from_file_location(
        "export_weights",
        Path(__file__).resolve().parent.parent / "scripts" / "export_weights.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.main


def _random_vgg16_state_dict(seed=0):
    """Full torchvision ``vgg16`` state-dict layout (features + classifier
    keys; the loader only consumes the features convs), random values."""
    # torchvision vgg16 'D' config conv channels, keyed by features index
    convs = {0: (64, 3), 2: (64, 64), 5: (128, 64), 7: (128, 128),
             10: (256, 128), 12: (256, 256), 14: (256, 256),
             17: (512, 256), 19: (512, 512), 21: (512, 512),
             24: (512, 512), 26: (512, 512), 28: (512, 512)}
    g = torch.Generator().manual_seed(seed)
    sd = {}
    for idx, (o, i) in convs.items():
        sd[f"features.{idx}.weight"] = torch.randn(o, i, 3, 3, generator=g)
        sd[f"features.{idx}.bias"] = torch.randn(o, generator=g)
    for j, (o, i) in enumerate(((4096, 25088), (4096, 4096), (1000, 4096))):
        sd[f"classifier.{j * 3}.weight"] = torch.randn(o, i, generator=g)
        sd[f"classifier.{j * 3}.bias"] = torch.randn(o, generator=g)
    return sd


def test_vgg16_pth_direct_and_npz_roundtrip(tmp_path):
    from histogan_tpu.ops.vgg import load_vgg16_weights

    sd = _random_vgg16_state_dict(0)
    pth = tmp_path / "vgg16_hub.pth"
    torch.save(sd, pth)

    # 1) the extractor loads the raw .pth directly (torch-only)
    direct = load_vgg16_weights(str(pth))
    assert set(direct) == {0, 2, 5, 7, 10, 12, 14, 17, 19, 21}
    assert direct[10][0].shape == (3, 3, 128, 256)

    # 2) export_weights --from-pth converts it without torchvision
    npz = tmp_path / "vgg16.npz"
    _export_weights_main()(["vgg16", str(npz), "--from-pth", str(pth)])
    via_npz = load_vgg16_weights(str(npz))
    for idx in direct:
        np.testing.assert_array_equal(direct[idx][0], via_npz[idx][0])
        np.testing.assert_array_equal(direct[idx][1], via_npz[idx][1])

    # 3) and the loss actually runs off the converted file
    from histogan_tpu.ops.vgg import VGGPerceptualLoss

    loss = VGGPerceptualLoss(weights_path=str(npz), resize=False)
    rng = np.random.RandomState(0)
    a = rng.rand(1, 32, 32, 3).astype(np.float32)
    b = rng.rand(1, 32, 32, 3).astype(np.float32)
    assert np.isfinite(float(loss(a, b)))


def test_inception_pth_direct_and_npz_roundtrip(tmp_path):
    # reuse the randomized torch InceptionV3 oracle (exact torchvision
    # key layout incl. BN running stats and AuxLogits-free variant)
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    try:
        from test_inception import _randomized_oracle
    finally:
        sys.path.pop(0)
    from histogan_tpu.metrics import inception as jinc

    net = _randomized_oracle(0)
    sd = {k: v for k, v in net.state_dict().items()}
    pth = tmp_path / "inception_hub.pth"
    torch.save(sd, pth)

    # 1) direct .pth load (torch-only)
    direct = jinc.load_weights_file(str(pth))

    # 2) --from-pth conversion to .npz, loaded by the same entry point
    npz = tmp_path / "inception_v3.npz"
    _export_weights_main()(["inception", str(npz), "--from-pth", str(pth)])
    via_npz = jinc.load_weights_file(str(npz))
    da = jax_tree_flatten_np(direct)
    na = jax_tree_flatten_np(via_npz)
    assert len(da) == len(na)
    for x, y in zip(da, na):
        np.testing.assert_array_equal(x, y)

    # 3) the pool3 extractor runs off the converted file
    import jax.numpy as jnp

    extract = jinc.make_extractor(via_npz, resize=True)
    feats = np.asarray(extract(jnp.zeros((2, 64, 64, 3))))
    assert feats.shape == (2, 2048) and np.isfinite(feats).all()


def jax_tree_flatten_np(tree):
    import jax

    return [np.asarray(l) for l in jax.tree_util.tree_leaves(tree)]


def test_export_rejects_wrong_layout(tmp_path):
    sd = {"not.a.vgg.key": torch.zeros(1)}
    pth = tmp_path / "junk.pth"
    torch.save(sd, pth)
    with pytest.raises(SystemExit):
        _export_weights_main()(["vgg16", str(tmp_path / "o.npz"),
                                "--from-pth", str(pth)])
