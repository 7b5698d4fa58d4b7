"""TSV sinks, npy ingest, instrumented-search diagnostics."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cross_modal_multivector_search_spark import testdata as TD
from cross_modal_multivector_search_spark.operators import _roar_core as core
from cross_modal_multivector_search_spark.sources import fbin, sinks

from conftest import SF_SMOKE


def test_write_tsv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, [10, 11], 0.5), (2, [12], 1.0)],
        "query_set_id long, reranked_ids array<long>, recall double")
    p = str(tmp_path / "out_tsv")
    sinks.write_tsv(df, p)
    back = spark.read.option("sep", "\t").option("header", "true").csv(p)
    rows = {r["query_set_id"]: r for r in back.collect()}
    assert rows["1"]["reranked_ids"] == "10,11"
    assert float(rows["2"]["recall"]) == 1.0


def test_aggregated_tuple(spark):
    recalls = spark.createDataFrame(
        [(0, 1.0), (1, 0.5)], "query_set_id long, recall double")
    t = sinks.aggregated_tuple(recalls, n_queries=2, search_sec=1.5,
                               rerank_sec=0.5, budget=100)
    assert t == {"budget": 100, "recall": 0.75, "qps": 1.0,
                 "rerank_fraction": 0.25}


def test_read_npy_dir(spark, tmp_path):
    a = np.random.default_rng(0).normal(size=(7, 4)).astype(np.float32)
    b = np.random.default_rng(1).normal(size=(5, 4)).astype(np.float32)
    pa, pb = str(tmp_path / "a.npy"), str(tmp_path / "b.npy")
    np.save(pa, a)
    np.save(pb, b)
    df = fbin.read_npy_dir(spark, [pa, pb])
    rows = {r["vec_id"]: r["vec"] for r in df.collect()}
    assert len(rows) == 12
    assert np.allclose(rows[0], a[0], atol=1e-6)
    assert np.allclose(rows[7], b[0], atol=1e-6)   # shard offset continues


def test_vector_gt_ibin_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(q, r, q * 10 + r, 0.5 * r) for q in range(3) for r in range(4)],
        "query_id long, rank int, neighbor_id long, dist float")
    p = str(tmp_path / "vgt.ibin")
    fbin.write_vector_gt_ibin(df, p)
    back = fbin.read_vector_gt_ibin(spark, p)
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, back.collect()))
    for x, y in zip(a, b):
        assert x[:3] == y[:3]
        assert abs(x[3] - y[3]) < 1e-6


def test_set_gt_generation_end_to_end(spark, tmp_path):
    """RerankAllAndGenerateSetGroundTruth semantics: exact full-scan
    set ranking -> set-GT ibin sink -> reload -> self-recall is 1."""
    from cross_modal_multivector_search_spark.operators import (
        recall, set_search)
    from pyspark.sql import functions as F
    v = TD.embeddings_norm(spark, SF_SMOKE)
    q = v.filter(F.col("set_id") < 5)
    gt = set_search.set_topk_sql(q, v, 10).select(
        F.col("query_set_id").alias("query_id"), "rank",
        F.col("data_set_id").alias("neighbor_id"))
    p = str(tmp_path / "set_gt.ibin")
    fbin.write_set_gt_ibin(gt, p)   # writer normalizes 1-based ranks
    back = fbin.read_set_gt_ibin(spark, p).select(
        F.col("query_id").alias("query_set_id"),
        F.col("neighbor_id").alias("data_set_id"))
    mr = recall.mean_recall(
        gt.select(F.col("query_id").alias("query_set_id"),
                  F.col("neighbor_id").alias("data_set_id")),
        back, 10).collect()[0]["mean_recall"]
    assert mr == 1.0


def test_instrumented_search_overlap(spark):
    vecs_df = TD.embeddings_norm(spark, SF_SMOKE)
    rows = vecs_df.orderBy("vec_id").collect()
    vecs = np.array([r["vec"] for r in rows])
    # trivial ring graph so the search has something to walk
    n = len(vecs)
    adj = [np.array([(i + 1) % n, (i - 1) % n, (i + 7) % n])
           for i in range(n)]
    q = vecs[:5]
    res, stats = core.multivector_search_instrumented(
        adj, vecs, q, ep=0, min_pq=5, max_pq=50, budget=50)
    assert len(res) == 5
    assert stats["total_visited"] >= stats["unique_visited"] > 0
    assert 1.0 / 5 <= stats["unique_ratio"] <= 1.0


def test_graph_connectivity_directed_vs_weak(spark):
    """reachable_from_ep is DIRECTED reachability: a graph that is one
    weak component but has a one-way edge into the entry side must
    report fewer reachable nodes than n_nodes; local union-find gate and
    the distributed BFS path must agree."""
    from cross_modal_multivector_search_spark.operators import stats
    # 0 -> 1 -> 2, and 3 -> 1 (3 unreachable FROM 1's side; weakly joined)
    g = spark.createDataFrame(
        [(0, [1]), (1, [2]), (2, []), (3, [1])],
        "src long, nbrs array<long>")
    local = stats.graph_connectivity(g, entry_point=0).collect()[0]
    assert (local["n_nodes"], local["n_components"],
            local["reachable_from_ep"]) == (4, 1, 3)
    dist = stats.graph_connectivity(
        g, entry_point=0, local_threshold=0).collect()[0]
    assert (dist["n_nodes"], dist["n_components"],
            dist["reachable_from_ep"]) == (4, 1, 3)


def test_sink_row_guard(spark, tmp_path):
    """The driver-side binary sinks refuse tables above max_rows with a
    pointer to parquet (no silent driver-OOM path)."""
    import pytest
    df = spark.range(10).selectExpr(
        "id AS vec_id", "array(float(id), float(id)) AS vec")
    with pytest.raises(ValueError, match="parquet"):
        fbin.write_fbin(df, str(tmp_path / "x.fbin"), max_rows=5)
    gt = spark.range(10).selectExpr(
        "id AS query_id", "1 AS rank", "id AS neighbor_id",
        "float(id) AS dist")
    with pytest.raises(ValueError, match="parquet"):
        fbin.write_set_gt_ibin(gt, str(tmp_path / "x.ibin"), max_rows=5)
    with pytest.raises(ValueError, match="parquet"):
        fbin.write_vector_gt_ibin(gt, str(tmp_path / "y.ibin"), max_rows=5)
    # at or below the bound the sinks still work
    fbin.write_fbin(df, str(tmp_path / "ok.fbin"), max_rows=10)
    assert fbin.read_meta(str(tmp_path / "ok.fbin")) == (10, 2)


def test_iso_recall_qps_interpolation():
    """The probe's QPS@recall interpolator (ANN_PROTOCOL iso lines):
    linear between straddling budget rows, measured-QPS lower bound
    when the smallest budget already meets the target, None when the
    target is never reached."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    from hnsw_compare_probe import iso_recall_qps
    pts = [(0.4, 100.0), (0.6, 50.0), (0.8, 25.0), (0.9, 10.0)]
    assert iso_recall_qps(pts, 0.80) == 25.0        # exact hit
    assert abs(iso_recall_qps(pts, 0.70) - 37.5) < 1e-9   # mid 50..25
    assert abs(iso_recall_qps(pts, 0.85) - 17.5) < 1e-9   # mid 25..10
    assert iso_recall_qps(pts, 0.95) is None        # never reached
    assert iso_recall_qps(pts, 0.30) == 100.0       # lower bound
    assert iso_recall_qps([], 0.5) is None
