import numpy as np
import torch

from shardmerge_tpu.ops.pairing import (
    correlated_pairs,
    cosine_correlation,
    norm_product_matrix,
)

from . import oracle_torch as oracle


def test_norm_product_matrix():
    m = norm_product_matrix([1.0, 2.0, 3.0])
    expect = np.array(
        [[0, 2, 3], [0, 0, 6], [0, 0, 0]], dtype=np.float32
    )
    np.testing.assert_allclose(m, expect)


def test_cosine_correlation_matches_torch(rng):
    stack = rng.standard_normal((4, 12, 8)).astype(np.float32)
    ours = cosine_correlation(stack)
    theirs = oracle.cosine_correlation(torch.from_numpy(stack)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_cosine_correlation_1d_stack(rng):
    stack = rng.standard_normal((3, 16)).astype(np.float32)
    ours = cosine_correlation(stack)
    theirs = oracle.cosine_correlation(torch.from_numpy(stack)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_correlated_pairs_least():
    m = np.array(
        [
            [0.0, 0.9, 0.1, 0.5],
            [0.9, 0.0, 0.6, 0.2],
            [0.1, 0.6, 0.0, 0.8],
            [0.5, 0.2, 0.8, 0.0],
        ],
        dtype=np.float32,
    )
    pairs = list(correlated_pairs(m, way="least"))
    # least |corr| is (0,2)=0.1, then remaining pair (1,3)=0.2
    assert pairs[0][:2] == (0, 2)
    assert pairs[1][:2] == (1, 3)
    assert len(pairs) == 2


def test_correlated_pairs_most():
    m = np.array(
        [[0.0, 0.9, 0.1], [0.9, 0.0, 0.6], [0.1, 0.6, 0.0]], dtype=np.float32
    )
    pairs = list(correlated_pairs(m, way="most"))
    assert pairs[0][:2] == (0, 1)
    # leftover odd item yielded with -1 and diagonal value
    assert pairs[1] == (2, -1, 0.0)


def test_correlated_pairs_odd_and_single():
    m = np.zeros((1, 1), dtype=np.float32)
    assert list(correlated_pairs(m)) == [(0, -1, 0.0)]

    m5 = np.abs(np.random.default_rng(3).standard_normal((5, 5))).astype(np.float32)
    m5 = (m5 + m5.T) / 2
    np.fill_diagonal(m5, 0)
    pairs = list(correlated_pairs(m5, way="least"))
    used = [p[0] for p in pairs] + [p[1] for p in pairs if p[1] >= 0]
    assert sorted(used) == [0, 1, 2, 3, 4]
    assert sum(1 for p in pairs if p[1] == -1) == 1


def test_correlated_pairs_negative_correlation_uses_abs():
    m = np.array(
        [[0.0, -0.05, 0.9], [-0.05, 0.0, 0.5], [0.9, 0.5, 0.0]], dtype=np.float32
    )
    pairs = list(correlated_pairs(m, way="least"))
    assert pairs[0][:2] == (0, 1)
    assert np.isclose(pairs[0][2], -0.05)
