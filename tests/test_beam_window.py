"""Bit-equality pins for the windowed-pool search engine.

`operators/_beam_window.py` re-represents the sequential BeamQueue
pool (reference `include/efanna2e/neighbor.h:137-226`) as per-member
cur_size-sized windows + spill archive, cutting the wave kernel's
O(max_pq)-per-expansion cost to O(cur_size) — the r12 iso-recall
kernel gap (VERDICT directive #2). These tests pin it bit-for-bit
against BOTH twins: the sequential `multivector_search` and the
full-width sorted kernel (`engine="sorted"`), across adaptive
trajectories, per-set budgets, duplicate-vector exact ties (the
taint-and-fallback path), and the capped dispatch shapes
(non-adaptive budget//m >= max_pq, min_pq >= max_pq).
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cross_modal_multivector_search_spark.operators import _roar_core as core


def _norm_rows(x):
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _rand_graph(rng, n, max_deg=8):
    adj = [np.unique(rng.integers(0, n, size=rng.integers(1, max_deg)))
           for _ in range(n)]
    return [a[a != i] for i, a in enumerate(adj)]


@given(st.integers(0, 2 ** 31), st.booleans())
@settings(max_examples=40, deadline=None)
def test_window_engine_equals_sequential_property(seed, adaptive):
    rng = np.random.default_rng(seed)
    n, d = int(rng.integers(20, 120)), 8
    vecs = _norm_rows(rng.normal(size=(n, d)))
    adj = _rand_graph(rng, n)
    sets = [_norm_rows(rng.normal(size=(int(rng.integers(1, 6)), d)))
            for _ in range(int(rng.integers(2, 12)))]
    ep = int(rng.integers(0, n))
    budget = int(rng.integers(5, 40))
    batch = core.batch_multivector_search(
        adj, vecs, sets, ep, 3, 20, budget, adaptive,
        mem_budget_bytes=3 * (n + 1), engine="window")
    for qi, q in enumerate(sets):
        seq = core.multivector_search(adj, vecs, q, ep, 3, 20, budget,
                                      adaptive)
        for (si, sd), (bi, bd) in zip(seq, batch[qi]):
            assert np.array_equal(si, bi)
            assert np.allclose(sd, bd, atol=1e-12)


@given(st.integers(0, 2 ** 31), st.booleans())
@settings(max_examples=40, deadline=None)
def test_window_engine_duplicate_vector_ties(seed, adaptive):
    """Duplicate vectors produce EXACT negated-IP ties: the engine's
    duplicate-distance taint scan must catch every such set and the
    sorted-kernel fallback must reproduce the sequential queue's tie
    layout and full-beam tail-tie rejection bit-for-bit."""
    rng = np.random.default_rng(seed)
    d = 4
    pool = _norm_rows(rng.normal(size=(int(rng.integers(2, 6)), d)))
    n = int(rng.integers(20, 60))
    vecs = pool[rng.integers(0, len(pool), size=n)]
    adj = _rand_graph(rng, n)
    sets = [pool[rng.integers(0, len(pool), size=int(rng.integers(1, 4)))]
            for _ in range(int(rng.integers(1, 6)))]
    ep = int(rng.integers(0, n))
    max_pq, budget = int(rng.integers(5, 15)), int(rng.integers(4, 30))
    batch = core.batch_multivector_search(
        adj, vecs, sets, ep, 2, max_pq, budget, adaptive,
        mem_budget_bytes=3 * (n + 1), engine="window")
    for qi, q in enumerate(sets):
        seq = core.multivector_search(adj, vecs, q, ep, 2, max_pq, budget,
                                      adaptive)
        for (si, sd), (bi, bd) in zip(seq, batch[qi]):
            assert np.array_equal(si, bi)
            assert np.allclose(sd, bd, atol=1e-12)


@given(st.integers(0, 2 ** 31))
@settings(max_examples=30, deadline=None)
def test_window_engine_per_set_budgets_and_capped_dispatch(seed):
    """Per-set (max_pq, budget) arrays including capped shapes the
    dispatcher must route to the sorted kernel (non-adaptive
    budget//m >= max_pq; adaptive min_pq >= max_pq), and the three-way
    cross pin: window == sorted == sequential."""
    rng = np.random.default_rng(seed)
    n, d = int(rng.integers(30, 100)), 8
    vecs = _norm_rows(rng.normal(size=(n, d)))
    adj = _rand_graph(rng, n)
    n_sets = int(rng.integers(2, 10))
    sets = [_norm_rows(rng.normal(size=(int(rng.integers(1, 5)), d)))
            for _ in range(n_sets)]
    ep = int(rng.integers(0, n))
    max_pqs = rng.integers(3, 40, size=n_sets)
    budgets = rng.integers(5, 80, size=n_sets)
    for adaptive in (True, False):
        wn = core.batch_multivector_search(
            adj, vecs, sets, ep, 3, max_pqs, budgets, adaptive,
            mem_budget_bytes=4 * (n + 1), engine="window")
        so = core.batch_multivector_search(
            adj, vecs, sets, ep, 3, max_pqs, budgets, adaptive,
            mem_budget_bytes=4 * (n + 1), engine="sorted")
        for qi, q in enumerate(sets):
            seq = core.multivector_search(
                adj, vecs, q, ep, 3, int(max_pqs[qi]), int(budgets[qi]),
                adaptive)
            for (si, sd), (wi, wd), (oi, od) in zip(seq, wn[qi], so[qi]):
                assert np.array_equal(si, wi)
                assert np.array_equal(si, oi)
                assert np.allclose(sd, wd, atol=1e-12)
                assert np.allclose(sd, od, atol=1e-12)


def test_window_engine_big_budget_matches_sorted():
    """The iso-recall sweep regime the engine exists for: wide beam,
    multi-round adaptive growth (window rebuilds from the archive),
    window vs sorted bit-for-bit."""
    rng = np.random.default_rng(99)
    n, d = 3000, 16
    vecs = _norm_rows(rng.normal(size=(n, d)))
    adj = _rand_graph(rng, n, max_deg=14)
    sets = [_norm_rows(rng.normal(size=(3, d))) for _ in range(6)]
    wn = core.batch_multivector_search(
        adj, vecs, sets, 11, 5, 800, 800, True, engine="window")
    so = core.batch_multivector_search(
        adj, vecs, sets, 11, 5, 800, 800, True, engine="sorted")
    for a, b in zip(wn, so):
        for (ai, ad), (bi, bd) in zip(a, b):
            assert np.array_equal(ai, bi)
            assert np.allclose(ad, bd, atol=1e-12)


def test_auto_engine_dispatch():
    """auto == sorted below the threshold, window above; unknown
    engine raises."""
    rng = np.random.default_rng(5)
    n, d = 200, 8
    vecs = _norm_rows(rng.normal(size=(n, d)))
    adj = _rand_graph(rng, n)
    sets = [_norm_rows(rng.normal(size=(2, d)))]
    small = core.batch_multivector_search(adj, vecs, sets, 0, 3, 20, 30)
    win = core.batch_multivector_search(adj, vecs, sets, 0, 3, 20, 30,
                                        engine="window")
    for (ai, ad), (bi, bd) in zip(small[0], win[0]):
        assert np.array_equal(ai, bi)
    # above the threshold auto routes to the window engine — pin it
    # against the sorted kernel at identical params
    big_pq = core.WINDOW_ENGINE_MIN_PQ + 1
    wide = core.batch_multivector_search(adj, vecs, sets, 0, 3, big_pq, 30)
    wide_sorted = core.batch_multivector_search(
        adj, vecs, sets, 0, 3, big_pq, 30, engine="sorted")
    for (ai, ad), (bi, bd) in zip(wide_sorted[0], wide[0]):
        assert np.array_equal(ai, bi)
    with pytest.raises(ValueError, match="unknown engine"):
        core.batch_multivector_search(adj, vecs, sets, 0, 3, 20, 30,
                                      engine="quantum")
