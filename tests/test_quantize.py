"""Quantization operators: scalar int8 (SQ) and product quantization.

Correctness strategy mirrors the ANN operators: exactness where it is
guaranteed by construction (SQ reconstruction error bound; PQ with a
saturating k >= #distinct-subvectors codebook equals exact kNN), plus
recall gates against the exact GEMM oracle for the genuinely lossy
configurations.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cross_modal_multivector_search_spark.operators import (brute_force,
                                                            quantize)

DIM = 16


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(11)
    X = rng.standard_normal((120, DIM))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    return spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(len(X))],
        "vec_id long, vec array<double>").cache()


@pytest.fixture(scope="module")
def clustered(spark):
    """Mixture-of-Gaussians: the regime PQ codebooks are trained for."""
    rng = np.random.default_rng(5)
    centers = rng.standard_normal((8, DIM)) * 2.0
    X = np.vstack([centers[i % 8] + 0.15 * rng.standard_normal(DIM)
                   for i in range(240)])
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    return spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(len(X))],
        "vec_id long, vec array<double>").cache()


def _recall_at(res, exact, k):
    got = {}
    for r in res.collect():
        got.setdefault(r["query_id"], set()).add(r["base_id"])
    want = {}
    for r in exact.collect():
        want.setdefault(r["query_id"], set()).add(r["base_id"])
    return np.mean([len(got[q] & want[q]) / k for q in want])


def test_sq_reconstruction_error_bounded(vecs):
    lo, hi = quantize.sq_minmax(vecs, DIM)
    coded = quantize.sq_encode(vecs, lo, hi)
    dq = coded.select("vec_id", "vec",
                      quantize.sq_dequantize_expr(lo, hi).alias("dqv"))
    for r in dq.collect():
        err = np.abs(np.asarray(r["vec"]) - np.asarray(r["dqv"]))
        scales = (np.asarray(hi) - np.asarray(lo)) / 255.0
        assert np.all(err <= scales / 2 + 1e-12)


def test_sq_codes_in_range_and_deterministic(vecs):
    lo, hi = quantize.sq_minmax(vecs, DIM)
    rows = quantize.sq_encode(vecs, lo, hi).collect()
    for r in rows:
        assert all(0 <= c <= 255 for c in r["codes"])
    again = quantize.sq_encode(vecs, lo, hi).collect()
    assert {r["vec_id"]: r["codes"] for r in rows} \
        == {r["vec_id"]: r["codes"] for r in again}


def test_sq_constant_dimension(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.5]), (1, [1.0, -0.5])],
        "vec_id long, vec array<double>")
    lo, hi = quantize.sq_minmax(df, 2)
    assert lo[0] == hi[0] == 1.0
    rows = {r["vec_id"]: r for r in
            quantize.sq_encode(df, lo, hi)
            .select("vec_id", "codes",
                    quantize.sq_dequantize_expr(lo, hi).alias("dqv"))
            .collect()}
    assert rows[0]["codes"][0] == 0
    assert rows[0]["dqv"][0] == 1.0       # exact for constant dims


def test_sq_adc_topk_high_recall(vecs):
    q = vecs.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "vec")
    b = vecs.select(F.col("vec_id").alias("base_id"), "vec")
    res = quantize.sq_adc_topk(q, b, DIM, 10)
    exact = brute_force.knn_exact_gemm(q, b, 10, metric="ip")
    # int8 per-dim error ~2e-3 on unit vectors: near-lossless ranking
    assert _recall_at(res, exact, 10) >= 0.95


def test_sq_adc_topk_broadcast_pinned_and_warm_start(vecs):
    """The query×corpus cross join must plan as BroadcastNestedLoopJoin
    (query side pinned), never a CartesianProduct over the corpus —
    auto-planning flips silently once the query side outgrows
    autoBroadcastJoinThreshold (VERDICT r5 #1). A precomputed
    ``minmax`` must reproduce the trained result with no sq_minmax
    jobs."""
    from cross_modal_multivector_search_spark.plans import plan_text

    q = vecs.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "vec")
    b = vecs.select(F.col("vec_id").alias("base_id"), "vec")
    res = quantize.sq_adc_topk(q, b, DIM, 5)
    text = plan_text(res, "simple")
    assert "BroadcastNestedLoopJoin" in text
    assert "CartesianProduct" not in text
    # encode-once/search-many: stored range, identical output
    lo, hi = quantize.sq_minmax(b, DIM)
    warm = quantize.sq_adc_topk(q, b, DIM, 5, minmax=(lo, hi))
    assert sorted(map(tuple, res.collect())) \
        == sorted(map(tuple, warm.collect()))


def test_sq_minmax_wide_dim(spark):
    """dim-512 encode fixture: the posexplode aggregation must return
    all 512 ranges (the old 2*dim-expression agg blew codegen here) and
    the encode expression must stay evaluable at that width."""
    dim = 512
    rng = np.random.default_rng(3)
    X = rng.standard_normal((40, dim))
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(len(X))],
        "vec_id long, vec array<double>")
    lo, hi = quantize.sq_minmax(df, dim)
    assert len(lo) == len(hi) == dim
    assert np.allclose(lo, X.min(axis=0)) and np.allclose(hi, X.max(axis=0))
    rows = quantize.sq_encode(df, lo, hi).limit(3).collect()
    assert all(len(r["codes"]) == dim for r in rows)


def test_pq_encode_codes_in_range(clustered):
    book = quantize.pq_train(clustered, m_sub=4, k=16, sample_n=240)
    codes = quantize.pq_encode(clustered, book).collect()
    assert len(codes) == 240
    for r in codes:
        assert len(r["codes"]) == 4
        assert all(0 <= c < 16 for c in r["codes"])


def test_pq_saturating_codebook_equals_exact_knn(vecs):
    """k = n distinct subvectors per subspace -> identity quantizer ->
    ADC == exact kNN (the driver query's oracle construction)."""
    n = vecs.count()
    book = quantize.pq_train(vecs, m_sub=4, k=n, sample_n=n)
    codes = quantize.pq_encode(vecs, book)
    q = vecs.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "vec")
    res = quantize.pq_adc_topk(q, codes, book, 10)
    b = vecs.select(F.col("vec_id").alias("base_id"), "vec")
    exact = brute_force.knn_exact_gemm(q, b, 10, metric="ip")
    got = {(r["query_id"], r["rank"]): r["base_id"] for r in res.collect()}
    want = {(r["query_id"], r["rank"]): r["base_id"]
            for r in exact.collect()}
    assert got == want
    for r, e in zip(sorted(res.collect(), key=lambda r: (r["query_id"],
                                                         r["rank"])),
                    sorted(exact.collect(), key=lambda r: (r["query_id"],
                                                           r["rank"]))):
        assert abs(r["score"] - e["score"]) < 1e-9


def test_pq_shortlist_contains_exact_topk(clustered):
    """PQ's production contract is shortlist-then-rerank: the lossy ADC
    top-3k shortlist must contain the exact top-k, which an exact
    rerank of 3k codes then recovers. (Ranking near-identical
    within-cluster neighbors purely by 16-bit codes is NOT the
    contract — that needs the rerank phase, same as the reference's
    two-phase search.)"""
    book = quantize.pq_train(clustered, m_sub=4, k=16, sample_n=240)
    codes = quantize.pq_encode(clustered, book)
    q = clustered.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "vec")
    short = quantize.pq_adc_topk(q, codes, book, 30)
    b = clustered.select(F.col("vec_id").alias("base_id"), "vec")
    exact = brute_force.knn_exact_gemm(q, b, 10, metric="ip")
    assert _recall_at(short, exact, 10) >= 0.9


def test_pq_train_validates_divisibility(vecs):
    with pytest.raises(ValueError, match="not divisible"):
        quantize.pq_train(vecs, m_sub=5, k=8, sample_n=50)


def test_ivfpq_saturating_equals_exact(vecs):
    """Residual PQ with k=n distinct residual subvectors is the
    identity quantizer over residuals -> ADC == exact kNN."""
    from cross_modal_multivector_search_spark.operators import simsearch
    n = vecs.count()
    coarse = simsearch.train_codebook(vecs, k=4, iters=5, sample_n=n)
    book = quantize.ivfpq_train(vecs, coarse, m_sub=4, k=n, sample_n=n)
    codes = quantize.ivfpq_encode(vecs, coarse, book)
    q = vecs.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "vec")
    res = quantize.ivfpq_adc_topk(q, codes, coarse, book, 10)
    b = vecs.select(F.col("vec_id").alias("base_id"), "vec")
    exact = brute_force.knn_exact_gemm(q, b, 10, metric="ip")
    got = {(r["query_id"], r["rank"]): r["base_id"] for r in res.collect()}
    want = {(r["query_id"], r["rank"]): r["base_id"]
            for r in exact.collect()}
    assert got == want


def test_ivfpq_beats_plain_pq_at_shallow_shortlist(clustered):
    """The residual payoff: at the same bit budget, residual codes
    resolve within-cluster structure plain PQ cannot (deterministic
    seeds, measured gap also holds at 1M in SCALE_PROBE.md)."""
    from cross_modal_multivector_search_spark.operators import simsearch
    coarse = simsearch.train_codebook(clustered, k=8, iters=10,
                                      sample_n=240)
    plain = quantize.pq_train(clustered, m_sub=4, k=16, sample_n=240)
    resid = quantize.ivfpq_train(clustered, coarse, m_sub=4, k=16,
                                 sample_n=240)
    pcodes = quantize.pq_encode(clustered, plain)
    rcodes = quantize.ivfpq_encode(clustered, coarse, resid)
    q = clustered.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "vec")
    b = clustered.select(F.col("vec_id").alias("base_id"), "vec")
    exact = brute_force.knn_exact_gemm(q, b, 10, metric="ip")
    r_plain = _recall_at(quantize.pq_adc_topk(q, pcodes, plain, 10),
                         exact, 10)
    r_resid = _recall_at(
        quantize.ivfpq_adc_topk(q, rcodes, coarse, resid, 10), exact, 10)
    assert r_resid >= r_plain
    # and the shortlist contract holds at the same depth as plain PQ
    short = quantize.ivfpq_adc_topk(q, rcodes, coarse, resid, 30)
    assert _recall_at(short, exact, 10) >= 0.9


def test_ivfpq_cell_matches_assign_cells(clustered):
    from cross_modal_multivector_search_spark.operators import simsearch
    coarse = simsearch.train_codebook(clustered, k=8, iters=5,
                                      sample_n=240)
    book = quantize.ivfpq_train(clustered, coarse, m_sub=4, k=16,
                                sample_n=240)
    codes = {r["vec_id"]: r["cell"] for r in
             quantize.ivfpq_encode(clustered, coarse, book).collect()}
    cells = {r["vec_id"]: r["cell"] for r in
             simsearch.assign_cells(clustered, coarse).collect()}
    assert codes == cells


def test_ivfpq_search_saturating_nprobe_equals_full_scan(clustered):
    """nprobe = n_cells scans everything: cell-pruned search must equal
    the full ADC scan exactly."""
    from cross_modal_multivector_search_spark.operators import simsearch
    coarse = simsearch.train_codebook(clustered, k=8, iters=5,
                                      sample_n=240)
    book = quantize.ivfpq_train(clustered, coarse, m_sub=4, k=16,
                                sample_n=240)
    codes = quantize.ivfpq_encode(clustered, coarse, book).cache()
    q = clustered.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "vec")
    full = quantize.ivfpq_adc_topk(q, codes, coarse, book, 10)
    pruned = quantize.ivfpq_search(q, codes, coarse, book, nprobe=8, k=10)
    a = {(r["query_id"], r["rank"]): (r["base_id"], round(r["score"], 9))
         for r in full.collect()}
    b = {(r["query_id"], r["rank"]): (r["base_id"], round(r["score"], 9))
         for r in pruned.collect()}
    assert a == b


def test_ivfpq_search_prunes_scan_and_keeps_recall(clustered):
    """nprobe=2 of 8 cells: the scan shrinks ~4x while the query's own
    cluster (and its shortlist) stays covered."""
    from cross_modal_multivector_search_spark.operators import (brute_force,
                                                                simsearch)
    coarse = simsearch.train_codebook(clustered, k=8, iters=10,
                                      sample_n=240)
    book = quantize.ivfpq_train(clustered, coarse, m_sub=4, k=16,
                                sample_n=240)
    codes = quantize.ivfpq_encode(clustered, coarse, book).cache()
    q = clustered.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "vec")
    b = clustered.select(F.col("vec_id").alias("base_id"), "vec")
    exact = brute_force.knn_exact_gemm(q, b, 10, metric="ip")
    short = quantize.ivfpq_search(q, codes, coarse, book, nprobe=2, k=30)
    assert _recall_at(short, exact, 10) >= 0.85


def test_sq_minmax_dim512_single_pass(spark):
    """The encode path at a width where per-dim scalar aggregates would
    be a 1000+-expression codegen unit (VERDICT r4 #6): posexplode-based
    minmax + encode must work and reconstruct within the SQ bound."""
    dim = 512
    rng = np.random.default_rng(7)
    X = rng.standard_normal((40, dim))
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(len(X))],
        "vec_id long, vec array<double>")
    lo, hi = quantize.sq_minmax(df, dim)
    assert lo == pytest.approx(X.min(axis=0).tolist())
    assert hi == pytest.approx(X.max(axis=0).tolist())
    coded = quantize.sq_encode(df, lo, hi)
    row = coded.filter(F.col("vec_id") == 3).select("codes").first()
    scales = (X.max(axis=0) - X.min(axis=0)) / 255.0
    dq = X.min(axis=0) + np.array(row[0]) * scales
    assert np.abs(dq - X[3]).max() <= scales.max() / 2 + 1e-9


def test_sq_encode_clamps_below_trained_lo(spark):
    """Build-once/encode-later: vectors below the trained lo must
    saturate at code 0, never go negative (ADVICE r4)."""
    train = spark.createDataFrame(
        [(0, [1.0, 5.0]), (1, [2.0, 9.0])], "vec_id long, vec array<double>")
    lo, hi = quantize.sq_minmax(train, 2)
    newer = spark.createDataFrame(
        [(2, [-3.0, 20.0])], "vec_id long, vec array<double>")
    codes = quantize.sq_encode(newer, lo, hi).select("codes").first()[0]
    assert codes == [0, 255]


def test_train_subspace_books_empty_sample_raises(spark):
    empty = spark.createDataFrame([], "vec_id long, vec array<double>")
    with pytest.raises(ValueError, match="no rows"):
        quantize.pq_train(empty, m_sub=2, k=4, sample_n=10)


def test_ivfpq_search_partition_prunes_at_rest(spark, clustered, tmp_path):
    """With codes stored partitioned by `cell`, the probed-cell union
    (driver-known from the routing rule) must reach the scan as a
    STATIC partition filter — the storage layer skips unprobed cells
    entirely — and results must equal the unpartitioned search."""
    from cross_modal_multivector_search_spark.plans.audit import plan_text

    coarse = quantize.pq_train(clustered, m_sub=1, k=8, sample_n=240,
                               seed=3)[0]
    book = quantize.ivfpq_train(clustered, coarse, m_sub=4, k=16,
                                sample_n=240)
    codes = quantize.ivfpq_encode(clustered, coarse, book)
    p = str(tmp_path / "codes")
    codes.write.partitionBy("cell").parquet(p)
    stored = spark.read.parquet(p)
    q = clustered.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "vec")
    out = quantize.ivfpq_search(q, stored, coarse, book, nprobe=2, k=5)
    txt = plan_text(out)
    assert "PartitionFilters: [" in txt
    assert "cell" in txt.split("PartitionFilters: [", 1)[1][:200]
    ref = quantize.ivfpq_search(q, codes, coarse, book, nprobe=2, k=5)
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(map(tuple, out.collect())) \
        == sorted(map(tuple, ref.collect()))
