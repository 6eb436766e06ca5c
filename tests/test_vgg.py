"""VGG16 perceptual-loss parity vs a torch oracle replicating
utils/vggloss.py:5-51 (feature L1 + Gram MSE over the four torchvision
``features`` block slices), with RANDOM weights in torchvision's
state-dict layout — closing the r1 "dead code" gap (VERDICT item 6)."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from histogan_tpu.ops.vgg import VGGPerceptualLoss, load_vgg16_weights

# torchvision vgg16 'features' layout up to relu4_3 (index 22)
_CFG = [  # (index, in, out) for convs; pools at 4, 9, 16
    (0, 3, 64), (2, 64, 64),
    (5, 64, 128), (7, 128, 128),
    (10, 128, 256), (12, 256, 256), (14, 256, 256),
    (17, 256, 512), (19, 512, 512), (21, 512, 512),
]


def _torch_features(seed=0) -> nn.Sequential:
    torch.manual_seed(seed)
    layers = []
    conv_at = {i: (cin, cout) for i, cin, cout in _CFG}
    for i in range(23):
        if i in conv_at:
            cin, cout = conv_at[i]
            layers.append(nn.Conv2d(cin, cout, 3, padding=1))
        elif i in (4, 9, 16):
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.ReLU(inplace=False))
    return nn.Sequential(*layers)


class TorchVGGLoss(nn.Module):
    """Oracle forward replicating reference utils/vggloss.py exactly."""

    def __init__(self, features, resize=True):
        super().__init__()
        self.blocks = nn.ModuleList([
            features[:4], features[4:9], features[9:16], features[16:23],
        ])
        self.mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
        self.std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
        self.resize = resize

    def forward(self, input, target, feature_layers=(0, 1, 2, 3),
                style_layers=()):
        input = (input - self.mean) / self.std
        target = (target - self.mean) / self.std
        if self.resize:
            input = F.interpolate(input, mode="bilinear", size=(224, 224),
                                  align_corners=False)
            target = F.interpolate(target, mode="bilinear", size=(224, 224),
                                   align_corners=False)
        loss, x, y = 0.0, input, target
        for i, block in enumerate(self.blocks):
            x, y = block(x), block(y)
            if i in feature_layers:
                loss = loss + F.l1_loss(x, y)
            if i in style_layers:
                ax = x.reshape(x.shape[0], x.shape[1], -1)
                ay = y.reshape(y.shape[0], y.shape[1], -1)
                loss = loss + F.mse_loss(ax @ ax.permute(0, 2, 1),
                                         ay @ ay.permute(0, 2, 1))
        return loss


@pytest.fixture(scope="module")
def vgg_npz(tmp_path_factory):
    """Random torchvision-layout weights on disk + the torch modules."""
    features = _torch_features(0)
    path = tmp_path_factory.mktemp("vgg") / "vgg16_random.npz"
    raw = {f"features.{k}": v.numpy() for k, v in features.state_dict().items()}
    np.savez(path, **raw)
    return str(path), features


def _pair(seed, size):
    rng = np.random.RandomState(seed)
    a = rng.rand(2, size, size, 3).astype(np.float32)
    b = rng.rand(2, size, size, 3).astype(np.float32)
    return a, b


def test_weight_loader_layout(vgg_npz):
    path, features = vgg_npz
    w = load_vgg16_weights(path)
    assert set(w) == {i for i, _, _ in _CFG}
    k, b = w[10]
    assert k.shape == (3, 3, 128, 256) and b.shape == (256,)


def test_random_vgg16_state_layout(tmp_path):
    """random_vgg16_state (bench's VGG-on projection row + dress
    rehearsals) emits the exact torchvision layout at the REAL shapes —
    pinned against the same loader that consumes downloaded weights."""
    from histogan_tpu.ops.vgg import random_vgg16_state

    raw = random_vgg16_state(0)
    assert raw["features.0.weight"].shape == (64, 3, 3, 3)
    assert raw["features.21.weight"].shape == (512, 512, 3, 3)
    path = tmp_path / "vgg16_random.npz"
    np.savez(path, **raw)
    w = load_vgg16_weights(str(path))
    assert set(w) == {i for i, _, _ in _CFG}
    for i, cin, cout in _CFG:
        k, b = w[i]
        assert k.shape == (3, 3, cin, cout) and b.shape == (cout,)


def test_feature_loss_parity_noresize(vgg_npz):
    path, features = vgg_npz
    jl = VGGPerceptualLoss(weights_path=path, resize=False)
    to = TorchVGGLoss(features, resize=False).eval()
    a, b = _pair(1, 64)
    with torch.no_grad():
        want = to(torch.from_numpy(np.transpose(a, (0, 3, 1, 2))),
                  torch.from_numpy(np.transpose(b, (0, 3, 1, 2))))
    got = float(jl(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, float(want), rtol=2e-4)


def test_style_gram_parity(vgg_npz):
    path, features = vgg_npz
    jl = VGGPerceptualLoss(weights_path=path, resize=False)
    to = TorchVGGLoss(features, resize=False).eval()
    a, b = _pair(2, 32)
    with torch.no_grad():
        want = to(torch.from_numpy(np.transpose(a, (0, 3, 1, 2))),
                  torch.from_numpy(np.transpose(b, (0, 3, 1, 2))),
                  feature_layers=(), style_layers=(0, 1))
    got = float(jl(jnp.asarray(a), jnp.asarray(b), feature_layers=(),
                   style_layers=(0, 1)))
    np.testing.assert_allclose(got, float(want), rtol=1e-3)


def test_resize_path_parity(vgg_npz):
    path, features = vgg_npz
    jl = VGGPerceptualLoss(weights_path=path, resize=True)
    to = TorchVGGLoss(features, resize=True).eval()
    a, b = _pair(3, 64)
    a, b = a[:1], b[:1]
    with torch.no_grad():
        want = to(torch.from_numpy(np.transpose(a, (0, 3, 1, 2))),
                  torch.from_numpy(np.transpose(b, (0, 3, 1, 2))))
    got = float(jl(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, float(want), rtol=2e-4)


def test_projection_with_vgg_loss_executes(vgg_npz, tmp_path, monkeypatch,
                                           capsys):
    """A projection run with vgg_loss_weight > 0 through the injected
    weights: the VGG term must be live (nonzero) inside the jitted
    gradient step — previously zero-weighted in every test (r1 item 6)."""
    from PIL import Image

    from histogan_tpu import projection
    from histogan_tpu.train import Trainer

    path, _ = vgg_npz
    monkeypatch.setenv("VGG16_WEIGHTS", path)

    rng = np.random.RandomState(4)
    img_path = tmp_path / "in.jpg"
    Image.fromarray((rng.rand(32, 32, 3) * 255).astype(np.uint8)).save(img_path)

    t = Trainer(
        name="projvgg", results_dir=str(tmp_path / "results"),
        models_dir=str(tmp_path / "models"), image_size=32,
        network_capacity=4, latent_dim=32, style_depth=2, batch_size=2,
        hist_bin=16, num_devices=1, seed=0,
    )
    t.init_GAN()
    out_dir = projection.project_gaussian(
        t, str(img_path), results_dir=str(tmp_path / "res"),
        num_train_steps=2, save_every=2, vgg_loss_weight=0.01,
        seed=0, log_every=1,
    )
    assert (out_dir / "in_final.jpg").exists()
    logged = capsys.readouterr().out
    vgg_vals = [float(l.split("vgg loss = ")[1].split(",")[0])
                for l in logged.splitlines() if "vgg loss = " in l]
    assert vgg_vals and all(np.isfinite(v) for v in vgg_vals)
    assert max(vgg_vals) > 0.0
