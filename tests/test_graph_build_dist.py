"""Distributed LinkProjection (`build_roargraph_dist`) vs the one-task
pipeline (`build_roargraph`): BIT-IDENTICAL adjacency and entry point.

The reference parallelizes the same passes over 64 OpenMP threads
(`src/index_bipartite.cpp:1061,1194`); there thread interleaving makes
graphs run-to-run unstable. The Spark reformulation is functional, so
the distributed build must reproduce the one-task graph exactly — a
much stronger pin than equal recall.
"""

import numpy as np
import pytest

from cross_modal_multivector_search_spark.operators.graph_build import (
    RoarGraphParams, build_roargraph, build_roargraph_dist,
)
from cross_modal_multivector_search_spark.operators.sampling import (
    generate_crossmodal_queries, generate_clustered_vectors,
    generate_random_vectors,
)


def _assert_same(one, dist):
    assert np.array_equal(one.ids, dist.ids)
    assert one.entry_point == dist.entry_point
    assert len(one.adj) == len(dist.adj)
    for i, (a, b) in enumerate(zip(one.adj, dist.adj)):
        assert np.array_equal(a, b), f"node {i}: {a} != {b}"


def test_dist_build_bit_equal_self_trained(spark):
    base = generate_random_vectors(spark, 600, 16, seed=3)
    p = RoarGraphParams(m_sq=10, m_pjbp=6, l_pjpq=20)
    one = build_roargraph(base, base, p)
    dist = build_roargraph_dist(base, base, p, n_batches=8)
    _assert_same(one, dist)


def test_dist_build_bit_equal_ood_train(spark):
    """Separate (distribution-shifted) training queries — the
    cross-modal shape; also exercises non-self kNN lists."""
    base = generate_clustered_vectors(spark, 500, 16, 8, seed=5) \
        .select("vec_id", "vec")
    train = generate_crossmodal_queries(spark, 400, 16, 8, seed=5)
    p = RoarGraphParams(m_sq=8, m_pjbp=5, l_pjpq=16)
    one = build_roargraph(base, train, p)
    dist = build_roargraph_dist(base, train, p, n_batches=8)
    _assert_same(one, dist)


def test_dist_build_bit_equal_mmap_snapshot(spark):
    """snapshot='mmap' (node-local addFile + np.load(mmap_mode='r') —
    the 10M single-index memory layout, one page-cache copy per machine
    instead of one unpickled copy per worker) must produce the SAME
    graph as snapshot='broadcast' and as the one-task build: the mmap
    path feeds the identical float64 bytes to the identical kernels,
    including the pre-extended (n+1, d) matrix pass-3 gathers from."""
    base = generate_clustered_vectors(spark, 500, 16, 8, seed=11) \
        .select("vec_id", "vec")
    train = generate_crossmodal_queries(spark, 400, 16, 8, seed=11)
    p = RoarGraphParams(m_sq=8, m_pjbp=5, l_pjpq=16)
    one = build_roargraph(base, train, p)
    mm = build_roargraph_dist(base, train, p, n_batches=8,
                              snapshot="mmap")
    bc = build_roargraph_dist(base, train, p, n_batches=8,
                              snapshot="broadcast")
    _assert_same(one, mm)
    _assert_same(one, bc)


def test_dist_build_search_recall(spark):
    """The distributed graph serves the same saturating-budget search
    (exact-equivalence regime) as the one-task graph."""
    from cross_modal_multivector_search_spark.operators import _roar_core

    base = generate_random_vectors(spark, 400, 16, seed=9)
    p = RoarGraphParams(m_sq=10, m_pjbp=6, l_pjpq=20)
    dist = build_roargraph_dist(base, base, p, n_batches=4)
    q0 = dist.vecs[7]
    ids, _ = _roar_core.beam_search(
        dist.adj, dist.vecs, q0, dist.entry_point, 400, 10)
    exact = np.argsort(-(dist.vecs @ q0), kind="stable")[:10]
    assert set(int(x) for x in ids) == set(int(x) for x in exact)
