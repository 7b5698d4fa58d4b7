"""NumPy kernel parity: formulas vs naive re-derivations.

The smooth-Chamfer reference semantics under test:
`/root/reference/src/multivector_reranker.cpp:330-430` (T=16, s=1, den=2,
both terms divided by the QUERY cardinality).
"""

import math

import numpy as np
import pytest

from cross_modal_multivector_search_spark.functions import metrics as M


def naive_smooth_chamfer(q, d, T=16.0, s=1.0, den=2.0):
    m = q.shape[0]
    sim = q @ d.T
    term1 = sum(
        math.log(sum(math.exp(T * s * sim[i, j]) for j in range(d.shape[0])))
        for i in range(m)) / (m * T * s)
    term2 = sum(
        math.log(sum(math.exp(T * sim[i, j]) for i in range(m)))
        for j in range(d.shape[0])) / (m * T)
    return (term1 + term2) / den


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def test_smooth_chamfer_matches_naive(rng):
    q = M.normalize_rows(rng.normal(size=(5, 16)))
    d = M.normalize_rows(rng.normal(size=(3, 16)))
    assert M.smooth_chamfer(q, d) == pytest.approx(
        naive_smooth_chamfer(q, d), abs=1e-12)


def test_smooth_chamfer_batch_matches_single(rng):
    q = M.normalize_rows(rng.normal(size=(5, 16)))
    cards = np.array([3, 5, 1, 7])
    data = M.normalize_rows(rng.normal(size=(int(cards.sum()), 16)))
    batch = M.smooth_chamfer_batch(q, data, cards)
    off = 0
    for i, c in enumerate(cards):
        single = M.smooth_chamfer(q, data[off:off + c])
        assert batch[i] == pytest.approx(single, abs=1e-12)
        off += c


def test_maxsim_matches_naive(rng):
    q = M.normalize_rows(rng.normal(size=(4, 8)))
    d = M.normalize_rows(rng.normal(size=(6, 8)))
    naive = sum(max(float(q[i] @ d[j]) for j in range(6)) for i in range(4))
    assert M.summed_max_similarity(q, d) == pytest.approx(naive, abs=1e-12)
    batch = M.summed_max_similarity_batch(
        q, d, np.array([2, 4]))
    assert batch[0] == pytest.approx(
        M.summed_max_similarity(q, d[:2]), abs=1e-12)


def test_identical_set_is_top_score(rng):
    """A set scored against itself beats any random other set (sanity)."""
    q = M.normalize_rows(rng.normal(size=(5, 16)))
    other = M.normalize_rows(rng.normal(size=(5, 16)))
    assert M.smooth_chamfer(q, q) > M.smooth_chamfer(q, other)
    assert M.summed_max_similarity(q, q) > M.summed_max_similarity(q, other)


def test_normalize_rows_zero_guard():
    m = np.array([[0.0, 0.0], [3.0, 4.0]])
    out = M.normalize_rows(m)
    assert np.allclose(out[0], [0.0, 0.0])
    assert np.allclose(np.linalg.norm(out[1]), 1.0)
