"""Distributed vs one-task single-index RoarGraph build.

Phase 1 (n_equal): one-task `build_roargraph` vs task-parallel
`build_roargraph_dist` on the SAME materialized train-kNN table —
asserts the graphs are BIT-IDENTICAL and records the pass-pipeline
speedup (the kNN stage is shared/distributed in both, so it is timed
once, separately).

Phase 2 (n_big): distributed build only — the scale the one-task
pipeline cannot reach in reasonable time (reference: ONE 10M-node
index, 64 OpenMP threads, `src/index_bipartite.cpp:1061,1194`).
Recall sampled against an exact driver-side GEMM oracle.

Usage: python tools/dist_build_probe.py [n_equal] [n_big] [dim]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from cross_modal_multivector_search_spark.operators import _roar_core as core
from cross_modal_multivector_search_spark.operators.brute_force import (
    knn_exact_gemm,
)
from cross_modal_multivector_search_spark.operators.graph_build import (
    RoarGraphParams, build_roargraph, build_roargraph_dist,
)
from cross_modal_multivector_search_spark.operators.sampling import (
    generate_random_vectors,
)
from cross_modal_multivector_search_spark.session import get_spark
from pyspark.sql import functions as F

import os

P = RoarGraphParams(
    m_sq=int(os.environ.get("ROAR_MSQ", 20)),
    m_pjbp=int(os.environ.get("ROAR_M", 12)),
    l_pjpq=int(os.environ.get("ROAR_L", 40)))


def _knn(base, k):
    q = base.select(F.col("vec_id").alias("query_id"), "vec")
    b = base.select(F.col("vec_id").alias("base_id"), "vec")
    return knn_exact_gemm(q, b, k, metric="ip")


def main() -> None:
    n_eq = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_big = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    spark = get_spark("dist-build-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # ---- phase 1: equality + speedup at n_eq ------------------------
    if n_eq > 0:
        base = generate_random_vectors(spark, n_eq, dim) \
            .repartition(32).cache()
        base.count()
        t0 = time.time()
        knn = _knn(base, P.m_sq).cache()
        knn.count()
        t_knn = time.time() - t0

        t0 = time.time()
        one = build_roargraph(base, base, P, train_knn=knn)
        t_one = time.time() - t0
        t0 = time.time()
        dist = build_roargraph_dist(base, base, P, train_knn=knn)
        t_dist = time.time() - t0

        assert np.array_equal(one.ids, dist.ids)
        assert one.entry_point == dist.entry_point
        n_diff = sum(0 if np.array_equal(a, b) else 1
                     for a, b in zip(one.adj, dist.adj))
        print(f"[n={n_eq:,}] knn {t_knn:.1f}s | one-task passes "
              f"{t_one:.1f}s | dist passes {t_dist:.1f}s "
              f"(speedup {t_one / t_dist:.1f}x) | "
              f"diff-nodes {n_diff} (must be 0)", flush=True)
        assert n_diff == 0
        base.unpersist()
        knn.unpersist()

    # ---- phase 2: distributed-only at n_big -------------------------
    if n_big > 0:
        base = generate_random_vectors(spark, n_big, dim) \
            .repartition(64).cache()
        base.count()
        t0 = time.time()
        knn = _knn(base, P.m_sq).cache()
        knn.count()
        t_knn = time.time() - t0
        t0 = time.time()
        idx = build_roargraph_dist(base, base, P, train_knn=knn)
        t_dist = time.time() - t0
        degs = np.array([len(a) for a in idx.adj])
        print(f"[n={n_big:,}] knn {t_knn:.1f}s | dist passes "
              f"{t_dist:.1f}s = {n_big / t_dist / 1000:.1f}k nodes/s | "
              f"degree mean {degs.mean():.1f} max {degs.max()}",
              flush=True)

        # recall sample: 20 held-out queries, exact GT on the driver
        rng = np.random.default_rng(123)
        qs = rng.standard_normal((20, dim))
        qs /= np.linalg.norm(qs, axis=1, keepdims=True)
        for budget in (400, 1000):
            hits = 0
            t0 = time.time()
            for q in qs:
                ids, _ = core.beam_search(
                    idx.adj, idx.vecs, q, idx.entry_point, budget, 10)
                exact = np.argsort(-(idx.vecs @ q), kind="stable")[:10]
                hits += len(set(map(int, ids)) & set(map(int, exact)))
            print(f"  beam {budget}: recall@10 {hits / 200:.4f} "
                  f"({time.time() - t0:.1f}s incl exact oracle)",
                  flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
