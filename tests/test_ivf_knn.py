"""ivf_knn — the ANN-bootstrapped train-kNN table (VERDICT r10 #2).

Pins the contract that lets the approximate table replace the exact
GEMM stage as a `build_roargraph_dist(train_knn=)` input: saturating
nprobe == n_cells is EXACTLY the exact table (ids, ranks, and scores),
exclude_self matches `knn_exact_gemm(exclude_self=True)`, lower nprobe
is measured by `knn_table_recall`, and the bootstrapped build at
saturating nprobe is bit-identical to the exact-kNN build.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cross_modal_multivector_search_spark.operators import (
    brute_force, graph_build, simsearch,
)
from cross_modal_multivector_search_spark.operators.sampling import (
    generate_clustered_vectors,
)


@pytest.fixture(scope="module")
def fixture(spark):
    v = generate_clustered_vectors(spark, 1500, 16, 8, sigma=0.15,
                                   seed=3).drop("cluster").cache()
    cb = simsearch.train_codebook(v, 8, iters=5, sample_n=1500)
    return v, cb


def _rows(df):
    return [(r["query_id"], r["rank"], r["base_id"], round(r["score"], 10))
            for r in df.orderBy("query_id", "rank").collect()]


def test_saturating_nprobe_equals_exact(spark, fixture):
    v, cb = fixture
    q = v.filter(F.col("vec_id") < 60).select(
        F.col("vec_id").alias("query_id"), "vec")
    b = v.select(F.col("vec_id").alias("base_id"), "vec")
    exact = brute_force.knn_exact_gemm(q, b, 10, metric="ip")
    sat = simsearch.ivf_knn(q, b, cb, 10, nprobe=8)
    assert _rows(sat) == _rows(exact)


def test_exclude_self_matches_exact(spark, fixture):
    v, cb = fixture
    q = v.filter(F.col("vec_id") < 60).select(
        F.col("vec_id").alias("query_id"), "vec")
    b = v.select(F.col("vec_id").alias("base_id"), "vec")
    exact = brute_force.knn_exact_gemm(q, b, 10, metric="ip",
                                       exclude_self=True)
    sat = simsearch.ivf_knn(q, b, cb, 10, nprobe=8, exclude_self=True)
    er, sr = _rows(exact), _rows(sat)
    assert er == sr
    assert all(r[0] != r[2] for r in sr)      # no self matches


def test_recall_gate(spark, fixture):
    """knn_table_recall: 1.0 at saturation by construction; defined
    (and here, high — clustered data, trained codebook) at nprobe=2."""
    v, cb = fixture
    q = v.filter(F.col("vec_id") < 60).select(
        F.col("vec_id").alias("query_id"), "vec")
    b = v.select(F.col("vec_id").alias("base_id"), "vec")
    exact = brute_force.knn_exact_gemm(q, b, 10, metric="ip").cache()
    sat = simsearch.ivf_knn(q, b, cb, 10, nprobe=8)
    assert simsearch.knn_table_recall(sat, exact, 10) \
        .collect()[0]["mean_recall"] == pytest.approx(1.0)
    lo = simsearch.ivf_knn(q, b, cb, 10, nprobe=2)
    r = simsearch.knn_table_recall(lo, exact, 10) \
        .collect()[0]["mean_recall"]
    assert 0.5 <= r <= 1.0


def test_bootstrap_build_bit_equal_at_saturation(spark, fixture):
    """build_roargraph_dist(train_knn=ivf_knn@saturating) produces the
    SAME graph as the in-build exact kNN stage — adjacency rows and
    entry point identical."""
    v, cb = fixture
    base = v.filter(F.col("vec_id") < 500)
    params = graph_build.RoarGraphParams(m_sq=10, m_pjbp=6, l_pjpq=20)
    tk = simsearch.ivf_knn(
        base.select(F.col("vec_id").alias("query_id"), "vec"),
        base.select(F.col("vec_id").alias("base_id"), "vec"),
        cb, params.m_sq, nprobe=8)
    gx = graph_build.build_roargraph_dist(base, base, params, n_batches=4)
    gb = graph_build.build_roargraph_dist(base, base, params, n_batches=4,
                                          train_knn=tk)
    assert gx.entry_point == gb.entry_point
    assert len(gx.adj) == len(gb.adj)
    for a, b_ in zip(gx.adj, gb.adj):
        assert np.array_equal(a, b_)


def test_foreign_train_knn_fails_loudly(spark, fixture):
    """ADVICE r10: a train_knn with base_ids absent from base must
    raise, not silently corrupt the graph."""
    v, cb = fixture
    base = v.filter(F.col("vec_id") < 300)
    params = graph_build.RoarGraphParams(m_sq=10, m_pjbp=6, l_pjpq=20)
    bad = simsearch.ivf_knn(
        base.select(F.col("vec_id").alias("query_id"), "vec"),
        v.select(F.col("vec_id").alias("base_id"), "vec"),  # superset!
        cb, params.m_sq, nprobe=8)
    with pytest.raises(Exception) as ei:
        graph_build.build_roargraph_dist(base, base, params, n_batches=4,
                                         train_knn=bad)
    assert "train_knn" in str(ei.value) or "KeyError" in str(ei.value)
