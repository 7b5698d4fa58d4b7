"""PQ memory-path probe: encode 1M vectors, ADC shortlist + exact
rerank vs the exact GEMM oracle.

Measures the two costs that matter for the 10^9-vector memory story:
one-time encode throughput, and per-query ADC scan + rerank wall at a
recall the two-phase contract must hold (shortlist 3k -> exact top-k).

Usage: python tools/pq_probe.py [n] [dim] [m_sub] [k_centroids] [out_md]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from cross_modal_multivector_search_spark.functions import vector as V
from cross_modal_multivector_search_spark.operators import (brute_force,
                                                            quantize,
                                                            simsearch)
from cross_modal_multivector_search_spark.operators.sampling import (
    generate_clustered_vectors,
)
from cross_modal_multivector_search_spark.operators.topk import grouped_topk
from cross_modal_multivector_search_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    m_sub = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    kc = int(sys.argv[4]) if len(sys.argv) > 4 else 256
    out = sys.argv[5] if len(sys.argv) > 5 else "PQ_PROBE.md"
    spark = get_spark("pq-probe")
    spark.sparkContext.setLogLevel("ERROR")

    v = generate_clustered_vectors(spark, n, dim, n_clusters=256,
                                   sigma=0.1).select("vec_id", "vec") \
        .repartition(64).cache()
    v.count()
    q = v.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "vec")

    t0 = time.time()
    book = quantize.pq_train(v, m_sub, kc, sample_n=100_000)
    t_train = time.time() - t0

    t0 = time.time()
    codes = quantize.pq_encode(v, book).cache()
    codes.count()
    t_enc = time.time() - t0

    gt = brute_force.knn_exact_gemm(q, v.select(
        F.col("vec_id").alias("base_id"), "vec"), 10, metric="ip").cache()
    want = {}
    for r in gt.collect():
        want.setdefault(r["query_id"], set()).add(r["base_id"])

    ratio = dim * 4 / m_sub
    lines = [
        "## PQ memory path at n = 1,000,000 (tools/pq_probe.py)",
        "",
        f"n={n:,} clustered vectors (256 clusters, sigma 0.1), dim={dim},"
        f" m_sub={m_sub}, k={kc} centroids/subspace -> {m_sub} B/vector"
        f" ({ratio:.0f}x vs float32).",
        "",
        "| stage | wall | note |",
        "|---|---|---|",
        f"| codebook train | {t_train:.1f}s | 100k sample, driver-bounded |",
        f"| encode {n:,} rows | {t_enc:.1f}s | "
        f"{n / t_enc / 1e3:.0f}k vec/s, one GEMM pass |",
    ]

    # shortlist depth is the recall knob: with ~n/256 near-identical
    # within-cluster neighbors, code-level ranking needs depth
    # proportional to cluster density; the exact rerank of even 1000
    # rows is microscopic next to the scan
    for fetch in (30, 300, 1000, 3000):
        t0 = time.time()
        short = quantize.pq_adc_topk(q, codes, book, fetch)
        res = (short.select("query_id", "base_id")
               .join(v.select(F.col("vec_id").alias("base_id"),
                              F.col("vec").alias("bvec")), "base_id")
               .join(q.select(F.col("query_id"),
                              F.col("vec").alias("qvec")), "query_id")
               .select("query_id", "base_id",
                       V.dot(V.to_double(F.col("qvec")),
                             V.to_double(F.col("bvec"))).alias("score")))
        res = grouped_topk(
            res, ["query_id"],
            [F.col("score").desc(), F.col("base_id").asc()], 10).cache()
        res.count()
        dt = time.time() - t0
        got = {}
        for r in res.collect():
            got.setdefault(r["query_id"], set()).add(r["base_id"])
        rec = sum(len(got[k] & want[k]) / 10 for k in want) / len(want)
        lines.append(
            f"| ADC shortlist top-{fetch} + exact rerank -> top-10 "
            f"| {dt:.1f}s | recall@10 **{rec:.2f}** |")

    # residual (IVF-PQ) codes: same bit budget, coarse centroid
    # subtracted first so the codes spend their resolution on the
    # within-cluster offsets the shortlist depth was compensating for
    t0 = time.time()
    coarse = simsearch.train_codebook(v, k=256, iters=10,
                                      sample_n=100_000)
    rbook = quantize.ivfpq_train(v, coarse, m_sub, kc,
                                 sample_n=100_000)
    t_rtrain = time.time() - t0
    t0 = time.time()
    rcodes = quantize.ivfpq_encode(v, coarse, rbook).cache()
    rcodes.count()
    t_renc = time.time() - t0
    lines.append(f"| IVF-PQ residual train (coarse k=256 + PQ) "
                 f"| {t_rtrain:.1f}s | 100k sample |")
    lines.append(f"| IVF-PQ residual encode | {t_renc:.1f}s | "
                 f"fused assign+encode, one pass |")
    for fetch in (30, 300):
        t0 = time.time()
        short = quantize.ivfpq_adc_topk(q, rcodes, coarse, rbook, fetch)
        res = (short.select("query_id", "base_id")
               .join(v.select(F.col("vec_id").alias("base_id"),
                              F.col("vec").alias("bvec")), "base_id")
               .join(q.select(F.col("query_id"),
                              F.col("vec").alias("qvec")), "query_id")
               .select("query_id", "base_id",
                       V.dot(V.to_double(F.col("qvec")),
                             V.to_double(F.col("bvec"))).alias("score")))
        res = grouped_topk(
            res, ["query_id"],
            [F.col("score").desc(), F.col("base_id").asc()], 10).cache()
        res.count()
        dt = time.time() - t0
        got = {}
        for r in res.collect():
            got.setdefault(r["query_id"], set()).add(r["base_id"])
        rec = sum(len(got[k_] & want[k_]) / 10 for k_ in want) / len(want)
        lines.append(
            f"| IVF-PQ shortlist top-{fetch} + exact rerank -> top-10 "
            f"| {dt:.1f}s | recall@10 **{rec:.2f}** |")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    spark.stop()


if __name__ == "__main__":
    main()
