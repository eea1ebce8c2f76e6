"""k-NN parity vs exact numpy reference (the nanoflann-replacement bar:
SURVEY.md hard part #4 — the TPU search must return the same neighbor sets
as a KD-tree or parity drifts through the data graph)."""

import numpy as np

from dynfu_tpu.ops import knn


def numpy_knn(q, p, k, mask=None):
    d = ((q[:, None, :] - p[None, :, :]) ** 2).sum(-1)
    if mask is not None:
        d = np.where(mask[None, :], d, np.inf)
    idx = np.argsort(d, axis=1, kind="stable")[:, :k]
    return idx, np.take_along_axis(d, idx, axis=1)


def test_knn_matches_exact():
    rng = np.random.RandomState(0)
    q = rng.randn(257, 3).astype(np.float32)
    p = rng.randn(123, 3).astype(np.float32)
    idx, sqd = knn.knn_brute(q, p, 8)
    ridx, rsqd = numpy_knn(q, p, 8)
    np.testing.assert_array_equal(np.asarray(idx), ridx)
    np.testing.assert_allclose(np.asarray(sqd), rsqd, rtol=1e-5, atol=1e-6)


def test_knn_sorted_ascending():
    rng = np.random.RandomState(1)
    q = rng.randn(50, 3).astype(np.float32)
    p = rng.randn(64, 3).astype(np.float32)
    _, sqd = knn.knn_brute(q, p, 8)
    s = np.asarray(sqd)
    assert (np.diff(s, axis=1) >= -1e-7).all()


def test_knn_mask():
    rng = np.random.RandomState(2)
    q = rng.randn(20, 3).astype(np.float32)
    p = rng.randn(40, 3).astype(np.float32)
    mask = np.arange(40) < 25
    idx, sqd = knn.knn_brute(q, p, 8, mask)
    assert (np.asarray(idx) < 25).all()
    ridx, _ = numpy_knn(q, p, 8, mask)
    np.testing.assert_array_equal(np.asarray(idx), ridx)


def test_knn_fewer_points_than_k():
    rng = np.random.RandomState(3)
    q = rng.randn(5, 3).astype(np.float32)
    p = rng.randn(10, 3).astype(np.float32)
    mask = np.arange(10) < 4  # only 4 valid, k=8
    _, sqd = knn.knn_brute(q, p, 8, mask)
    s = np.asarray(sqd)
    assert np.isfinite(s[:, :4]).all()
    assert np.isinf(s[:, 4:]).all()


def test_nn1_matches():
    rng = np.random.RandomState(4)
    q = rng.randn(100, 3).astype(np.float32)
    p = rng.randn(77, 3).astype(np.float32)
    idx, _ = knn.nn1(q, p)
    ridx, _ = numpy_knn(q, p, 1)
    np.testing.assert_array_equal(np.asarray(idx), ridx[:, 0])


def test_knn_blocked_equals_brute():
    rng = np.random.RandomState(5)
    q = rng.randn(1000, 3).astype(np.float32)
    p = rng.randn(333, 3).astype(np.float32)
    i1, d1 = knn.knn_brute(q, p, 8)
    i2, d2 = knn.knn_blocked(q, p, 8, block=256)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-5, atol=1e-6)
