"""FID math tests (closed-form Gaussian cases + scorer pipeline)."""

import numpy as np

from histogan_tpu.metrics import FIDScorer, compute_statistics, frechet_distance


def test_identical_distributions_zero():
    rng = np.random.RandomState(0)
    x = rng.randn(5000, 8)
    mu, s = compute_statistics(x)
    # the eps*I regularization offset biases by ~2*eps*D
    assert abs(frechet_distance(mu, s, mu, s)) < 1e-4
    assert abs(frechet_distance(mu, s, mu, s, eps=0.0)) < 1e-10


def test_mean_shift_closed_form():
    # same covariance, mean shift d: FID = ||d||^2
    rng = np.random.RandomState(1)
    x = rng.randn(200000, 4)
    y = x + np.array([1.0, 0.0, 2.0, 0.0])
    mu1, s1 = compute_statistics(x)
    mu2, s2 = compute_statistics(y)
    fid = frechet_distance(mu1, s1, mu2, s2)
    assert abs(fid - 5.0) < 0.05


def test_variance_scale_closed_form():
    # N(0, I) vs N(0, 4I) in D dims: Tr(I + 4I - 2*2I) = D
    d = 3
    mu = np.zeros(d)
    fid = frechet_distance(mu, np.eye(d), mu, 4 * np.eye(d), eps=0.0)
    assert abs(fid - d) < 1e-9


def test_nondiagonal_case_matches_scipy():
    import scipy.linalg

    rng = np.random.RandomState(2)
    a = rng.randn(6, 6)
    s1 = a @ a.T + np.eye(6)
    b = rng.randn(6, 6)
    s2 = b @ b.T + np.eye(6)
    mu1 = rng.randn(6)
    mu2 = rng.randn(6)
    want = (np.sum((mu1 - mu2) ** 2) + np.trace(s1) + np.trace(s2)
            - 2 * np.trace(scipy.linalg.sqrtm(s1 @ s2).real))
    got = frechet_distance(mu1, s1, mu2, s2, eps=0.0)
    assert abs(got - want) < 1e-6


def test_scorer_pipeline():
    rng = np.random.RandomState(3)

    def extractor(images):  # mean/std per channel as toy features
        x = np.asarray(images).reshape(len(images), -1, 3)
        return np.concatenate([x.mean(1), x.std(1)], axis=1)

    scorer = FIDScorer(extractor)
    for _ in range(4):
        scorer.add_real(rng.rand(32, 8, 8, 3))
        scorer.add_generated(rng.rand(32, 8, 8, 3) * 0.5)
    assert scorer.score() > 0.01  # clearly different distributions

    scorer2 = FIDScorer(extractor)
    base = rng.rand(512, 8, 8, 3)
    scorer2.add_real(base[:256])
    scorer2.add_generated(base[256:])
    assert scorer2.score() < scorer.score()
