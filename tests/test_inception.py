"""InceptionV3-pool3 extractor parity vs a torch oracle.

The oracle reimplements torchvision's ``Inception3`` module structure
(same attribute names, BasicConv2d = conv(bias=False)+BN(eps=1e-3)+relu)
with RANDOM weights and randomized BN running stats, exactly the
random-weight oracle technique of tests/test_convert.py — layout and
arithmetic are what can break, not the weight values. Its state_dict
keys match a real torchvision export key-for-key, so passing here means
a downloaded pretrained file loads correctly too.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from histogan_tpu.metrics import inception as jinc


# ------------------------------------------------ torch oracle modules
class BasicConv2d(nn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = nn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class InceptionA(nn.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch5x5_1 = BasicConv2d(cin, 48, kernel_size=1)
        self.branch5x5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = BasicConv2d(cin, pool_features, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        b3 = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(F.avg_pool2d(x, kernel_size=3, stride=1, padding=1))
        return torch.cat([b1, b5, b3, bp], 1)


class InceptionB(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = BasicConv2d(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3(x)
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        return torch.cat([b3, bd, F.max_pool2d(x, kernel_size=3, stride=2)], 1)


class InceptionC(nn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7_1 = BasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = BasicConv2d(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = BasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = BasicConv2d(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_1(x)
        for m in (self.branch7x7dbl_2, self.branch7x7dbl_3,
                  self.branch7x7dbl_4, self.branch7x7dbl_5):
            bd = m(bd)
        bp = self.branch_pool(F.avg_pool2d(x, kernel_size=3, stride=1, padding=1))
        return torch.cat([b1, b7, bd, bp], 1)


class InceptionD(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch3x3_2 = BasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = BasicConv2d(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = BasicConv2d(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = BasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(
            self.branch7x7x3_3(self.branch7x7x3_2(self.branch7x7x3_1(x)))
        )
        return torch.cat([b3, b7, F.max_pool2d(x, kernel_size=3, stride=2)], 1)


class InceptionE(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch1x1 = BasicConv2d(cin, 320, kernel_size=1)
        self.branch3x3_1 = BasicConv2d(cin, 384, kernel_size=1)
        self.branch3x3_2a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = BasicConv2d(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        bp = self.branch_pool(F.avg_pool2d(x, kernel_size=3, stride=1, padding=1))
        return torch.cat([b1, b3, bd, bp], 1)


class TorchInception3(nn.Module):
    """torchvision Inception3 body up to pool3 (no AuxLogits/fc)."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = InceptionA(192, pool_features=32)
        self.Mixed_5c = InceptionA(256, pool_features=64)
        self.Mixed_5d = InceptionA(288, pool_features=64)
        self.Mixed_6a = InceptionB(288)
        self.Mixed_6b = InceptionC(768, c7=128)
        self.Mixed_6c = InceptionC(768, c7=160)
        self.Mixed_6d = InceptionC(768, c7=160)
        self.Mixed_6e = InceptionC(768, c7=192)
        self.Mixed_7a = InceptionD(768)
        self.Mixed_7b = InceptionE(1280)
        self.Mixed_7c = InceptionE(2048)

    def forward(self, x):
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, kernel_size=3, stride=2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, kernel_size=3, stride=2)
        for m in (self.Mixed_5b, self.Mixed_5c, self.Mixed_5d, self.Mixed_6a,
                  self.Mixed_6b, self.Mixed_6c, self.Mixed_6d, self.Mixed_6e,
                  self.Mixed_7a, self.Mixed_7b, self.Mixed_7c):
            x = m(x)
        return torch.flatten(F.adaptive_avg_pool2d(x, (1, 1)), 1)


def _randomized_oracle(seed: int = 0) -> TorchInception3:
    torch.manual_seed(seed)
    net = TorchInception3()
    # randomize BN running stats too, so the scale/shift fold is exercised
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(
                    torch.rand_like(m.running_var) + 0.5
                )
    net.eval()
    return net


def test_state_dict_keys_cover_specs():
    """Every spec'd conv exists in the oracle state dict with the spec'd
    shape, and nothing in the body is left unconverted."""
    net = _randomized_oracle(1)
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    for name, (cin, cout, k, _, _) in jinc.CONV_SPECS.items():
        assert sd[f"{name}.conv.weight"].shape == (cout, cin, k[0], k[1])
    conv_keys = {k for k in sd if k.endswith(".conv.weight")}
    assert conv_keys == {f"{n}.conv.weight" for n in jinc.CONV_SPECS}


def test_pool3_parity_vs_torch_oracle():
    net = _randomized_oracle(0)
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    params = jinc.load_torchvision_state_dict(sd)

    rng = np.random.RandomState(0)
    x = rng.rand(2, 299, 299, 3).astype(np.float32) * 2.0 - 1.0
    with torch.no_grad():
        want = net(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()

    got = np.asarray(jinc.pool3_features(params, jnp.asarray(x), resize=False))
    assert got.shape == (2, jinc.FEATURE_DIM)
    # ~94 chained convs in fp32: allow accumulated rounding
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_preprocess_matches_torch_interpolate():
    rng = np.random.RandomState(1)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    want = F.interpolate(
        torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), size=(299, 299),
        mode="bilinear", align_corners=False,
    ).numpy() * 2.0 - 1.0
    got = np.transpose(np.asarray(jinc.preprocess(jnp.asarray(x))), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_random_extractor_deterministic_and_finite():
    from histogan_tpu.metrics import random_inception_extractor

    ex1 = random_inception_extractor(seed=7)
    ex2 = random_inception_extractor(seed=7)
    imgs = np.random.RandomState(2).rand(2, 75, 75, 3).astype(np.float32)
    f1, f2 = ex1(imgs), ex2(imgs)
    assert f1.shape == (2, 2048)
    assert np.isfinite(f1).all()
    np.testing.assert_array_equal(f1, f2)


def test_fid_with_inception_separates_distributions():
    """End-to-end: random-weight inception FID must rank a matched pair
    below a mismatched pair."""
    from histogan_tpu.metrics import FIDScorer, random_inception_extractor

    ex = random_inception_extractor(seed=3)
    rng = np.random.RandomState(3)
    base = rng.rand(16, 75, 75, 3).astype(np.float32)

    matched = FIDScorer(ex)
    matched.add_real(base[:8])
    matched.add_generated(base[8:])

    mismatched = FIDScorer(ex)
    mismatched.add_real(base[:8])
    mismatched.add_generated((base[8:] * 0.25).astype(np.float32))

    assert mismatched.score() > matched.score()
