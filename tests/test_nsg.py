"""NSG baseline (`operators/nsg.py`) — reference
`thirdparty/nsg/src/index_nsg.cpp`, params
`scripts/nsg/build_nsg_index.sh:26-35`."""

import numpy as np
import pytest

from cross_modal_multivector_search_spark.operators import (
    _roar_core as core, nsg,
)
from cross_modal_multivector_search_spark.operators.sampling import (
    generate_clustered_vectors, generate_random_vectors,
)


def _build(spark, n=400, dim=16, seed=3, **kw):
    base = generate_random_vectors(spark, n, dim, seed=seed)
    p = nsg.NsgParams(l_build=20, r_degree=8, c_pool=100, knn_k=10)
    return nsg.build_nsg(base, p, n_batches=4, **kw)


def test_nsg_prune_mrng_rule():
    """sync_prune semantics (index_nsg.cpp:264-287): nearest kept
    unconditionally; a candidate is occluded iff a chosen r satisfies
    d(r, p) < d(q, p); caps honored; self and duplicates dropped."""
    vecs = np.array([[1.0, 0.0], [0.99, 0.14], [0.97, 0.24],
                     [0.7, -0.7], [-1.0, 0.0]])
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    q = 0
    cand = np.array([1, 2, 3, 4, 0, 1])
    d = np.array([-(vecs[c] @ vecs[q]) for c in cand])
    sel = nsg.nsg_prune(cand, d, vecs, r_degree=8, c_pool=100,
                        exclude=q)
    # 1 kept (nearest); 2 occluded by 1 (d(1,2) < d(q,2)); 3 kept (on
    # q's other side: d(1,3) > d(q,3)); 4 occluded by 3
    assert sel == [1, 3]
    # degree cap
    assert nsg.nsg_prune(cand, d, vecs, 1, 100, exclude=q) == [1]
    # pool scan cap: C=1 scans only the nearest
    assert nsg.nsg_prune(cand, d, vecs, 8, 1, exclude=q) == [1]


def test_nsg_build_reachable_and_deterministic(spark):
    idx = _build(spark)
    idx2 = _build(spark)
    assert idx.entry_point == idx2.entry_point
    assert all(np.array_equal(a, b) for a, b in zip(idx.adj, idx2.adj))
    # every node reachable from the navigating node (tree_grow's
    # contract, index_nsg.cpp:737-753)
    n = len(idx.adj)
    reached = np.zeros(n, dtype=bool)
    stack = [idx.entry_point]
    reached[idx.entry_point] = True
    while stack:
        u = stack.pop()
        for w in idx.adj[u]:
            if not reached[w]:
                reached[w] = True
                stack.append(int(w))
    assert reached.all()
    # medoid entry point (exact argmin to the centroid)
    cent = idx.vecs.mean(axis=0)
    assert idx.entry_point == int(
        np.argmin(((idx.vecs - cent) ** 2).sum(axis=1)))


def test_nsg_saturating_search_exact(spark):
    """Saturating-budget beam search over the built NSG returns the
    exact top-k — the accepted ANN oracle regime."""
    idx = _build(spark, n=300, seed=9)
    for qi in (3, 77, 150):
        q = idx.vecs[qi]
        ids, _ = core.beam_search(idx.adj, idx.vecs, q,
                                  idx.entry_point, 300, 10)
        exact = np.argsort(-(idx.vecs @ q), kind="stable")[:10]
        assert set(map(int, ids)) == set(map(int, exact))


def test_nsg_accepts_precomputed_knn_table(spark):
    """The init kNN graph is a first-class DataFrame input (the
    reference reads the efanna file from disk); supplying the same
    exact table must reproduce the default build bit-for-bit."""
    from pyspark.sql import functions as F
    from cross_modal_multivector_search_spark.operators.brute_force \
        import knn_exact_gemm

    base = generate_clustered_vectors(spark, 300, 16, 8, seed=5) \
        .select("vec_id", "vec")
    p = nsg.NsgParams(l_build=20, r_degree=8, c_pool=100, knn_k=10)
    tbl = knn_exact_gemm(
        base.select(F.col("vec_id").alias("query_id"), "vec"),
        base.select(F.col("vec_id").alias("base_id"), "vec"),
        p.knn_k, metric="ip")
    a = nsg.build_nsg(base, p, n_batches=4)
    b = nsg.build_nsg(base, p, n_batches=4, knn=tbl)
    assert a.entry_point == b.entry_point
    assert all(np.array_equal(x, y) for x, y in zip(a.adj, b.adj))


def test_nsg_build_bit_equal_mmap_snapshot(spark):
    """snapshot='mmap' (node-local .npy, the reference-10M-config
    enabler) must build the exact graph snapshot='broadcast' builds —
    same bytes reach the Link/InterInsert workers either way."""
    a = _build(spark, n=250, seed=5, snapshot="broadcast")
    b = _build(spark, n=250, seed=5, snapshot="mmap")
    assert a.entry_point == b.entry_point
    assert all(np.array_equal(x, y) for x, y in zip(a.adj, b.adj))
    with pytest.raises(ValueError, match="unknown snapshot"):
        _build(spark, n=50, seed=5, snapshot="zerocopy")


def test_tree_grow_vectorized_bit_equal_seq():
    """The r14 frontier-vectorized `_tree_grow` must produce the exact
    adjacency of the sequential stack walk (`_tree_grow_seq`, the spec
    twin) — including the repair-edge targets and their append order —
    on disconnected graphs with multiple stranded components."""
    rng = np.random.default_rng(11)
    for trial in range(6):
        n = int(rng.integers(30, 120))
        vecs = rng.normal(size=(n, 8))
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        # sparse random digraph: ~half the nodes get 0-3 out-edges, so
        # several components are unreachable from the entry point
        adj = []
        for i in range(n):
            deg = int(rng.integers(0, 4)) if rng.random() < 0.6 else 0
            nbrs = rng.choice(n, size=deg, replace=False) if deg else \
                np.empty(0, dtype=np.int64)
            adj.append(np.asarray(nbrs, dtype=np.int64))
        ep = int(rng.integers(0, n))
        a = nsg._tree_grow([x.copy() for x in adj], vecs, ep, beam=12)
        b = nsg._tree_grow_seq([x.copy() for x in adj], vecs, ep,
                               beam=12)
        assert all(np.array_equal(x, y) for x, y in zip(a, b)), trial
        # and the result is actually fully reachable from ep
        pad = core.pad_adjacency(a, n)
        reached = np.zeros(n + 1, dtype=bool)
        reached[[ep, n]] = True
        frontier = np.array([ep])
        while len(frontier):
            nxt = pad[frontier].ravel()
            nxt = np.unique(nxt[~reached[nxt]])
            reached[nxt] = True
            frontier = nxt
        assert reached[:n].all()


def test_assemble_knn_pad_dedup_and_id_gate(spark, tmp_path):
    """User-supplied knn tables (r13 ADVICE): duplicate (query_id,
    base_id) rows must land ONCE in the padded adjacency (first
    (rank, base_id) occurrence — the wave kernel's pre-padded rows
    contract), and ids absent from the base id vector must fail
    loudly instead of aliasing a sorted slot."""
    ids = np.array([10, 20, 30, 40], dtype=np.int64)
    rows = [(10, 1, 20), (10, 2, 30), (10, 3, 20),   # dup of (10,20)
            (20, 1, 10), (20, 2, 20),                # self edge
            (30, 1, 40)]
    knn = spark.createDataFrame(rows, "query_id long, rank long, "
                                      "base_id long")
    path = str(tmp_path / "pad.npy")
    nsg._assemble_knn_pad(knn, ids, len(ids), path)
    pad = np.load(path)
    assert pad[0].tolist()[:2] == [1, 2] and (pad[0][2:] == 4).all()
    assert pad[1].tolist()[0] == 0 and (pad[1][1:] == 4).all()
    assert pad[2].tolist()[0] == 3 and (pad[2][1:] == 4).all()
    bad = spark.createDataFrame([(99, 1, 10)],
                                "query_id long, rank long, base_id long")
    with pytest.raises(ValueError, match="query_id"):
        nsg._assemble_knn_pad(bad, ids, len(ids), str(tmp_path / "b.npy"))
    bad2 = spark.createDataFrame([(10, 1, 99)],
                                 "query_id long, rank long, base_id long")
    with pytest.raises(ValueError, match="base_id"):
        nsg._assemble_knn_pad(bad2, ids, len(ids),
                              str(tmp_path / "c.npy"))
