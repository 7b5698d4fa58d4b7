"""Bootstrap-vs-exact single-index build on UNIFORM data — the
adversarial case for `simsearch.ivf_knn` (no cluster structure for the
codebook to find, so the train-kNN table recall gate reads its worst
value) — answering whether the RoarGraph build survives an imperfect
kNN input where it matters most.

Protocol: one n-vector uniform unit-norm base, self-trained (the
dist_build_probe shape, SCALE_PROBE.md r10); build once from the exact
GEMM table and once from `ivf_knn` (gate recall printed); compare
sampled beam-search recall@10 of both graphs against the exact
driver-side oracle at several budgets.

Usage: python tools/bootstrap_uniform_probe.py [n] [dim] [cells] [nprobe]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
from pyspark.sql import functions as F

from cross_modal_multivector_search_spark.operators import _roar_core as core
from cross_modal_multivector_search_spark.operators import simsearch
from cross_modal_multivector_search_spark.operators.brute_force import (
    knn_exact_gemm,
)
from cross_modal_multivector_search_spark.operators.graph_build import (
    RoarGraphParams, build_roargraph_dist,
)
from cross_modal_multivector_search_spark.operators.sampling import (
    generate_random_vectors,
)
from cross_modal_multivector_search_spark.session import get_spark

P = RoarGraphParams(m_sq=20, m_pjbp=12, l_pjpq=40)


def sampled_recall(idx, budgets, n_queries: int, dim: int) -> dict:
    rng = np.random.default_rng(123)
    qs = rng.standard_normal((n_queries, dim))
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    out = {}
    for budget in budgets:
        hits = 0
        for q in qs:
            ids, _ = core.beam_search(
                idx.adj, idx.vecs, q, idx.entry_point, budget, 10)
            exact = np.argsort(-(idx.vecs @ q), kind="stable")[:10]
            hits += len(set(map(int, ids)) & set(map(int, exact)))
        out[budget] = hits / (10 * n_queries)
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    cells = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    nprobe = int(sys.argv[4]) if len(sys.argv) > 4 else 8

    spark = get_spark("bootstrap-uniform-probe")
    spark.sparkContext.setLogLevel("ERROR")

    base = generate_random_vectors(spark, n, dim).repartition(32).cache()
    base.count()
    q = base.select(F.col("vec_id").alias("query_id"), "vec")
    b = base.select(F.col("vec_id").alias("base_id"), "vec")

    # ---- bootstrap path first (cheap) -------------------------------
    t0 = time.time()
    cb = simsearch.train_codebook(base, cells, iters=10, sample_n=100_000)
    t_cb = time.time() - t0
    t0 = time.time()
    knn_boot = simsearch.ivf_knn(q, b, cb, P.m_sq, nprobe=nprobe).cache()
    knn_boot.count()
    t_boot = time.time() - t0
    print(f"[n={n:,} uniform] ivf_knn cells={cells} nprobe={nprobe}: "
          f"codebook {t_cb:.1f}s + table {t_boot:.1f}s", flush=True)

    step = max(1, n // 2000)
    sq = q.filter(F.col("query_id") % step == 0).cache()
    gate_exact = knn_exact_gemm(sq, b, P.m_sq, metric="ip")
    gate = simsearch.knn_table_recall(
        knn_boot.join(sq.select("query_id"), "query_id", "semi"),
        gate_exact, P.m_sq).collect()[0]["mean_recall"]
    print(f"train-kNN recall gate (sampled, @{P.m_sq}): {gate:.4f}",
          flush=True)

    t0 = time.time()
    idx_boot = build_roargraph_dist(base, base, P, train_knn=knn_boot)
    t_pass_boot = time.time() - t0
    print(f"bootstrap build passes {t_pass_boot:.1f}s", flush=True)
    knn_boot.unpersist()

    # ---- exact path -------------------------------------------------
    t0 = time.time()
    knn_exact = knn_exact_gemm(q, b, P.m_sq, metric="ip").cache()
    knn_exact.count()
    t_exact = time.time() - t0
    print(f"exact kNN table {t_exact:.1f}s "
          f"({t_exact / max(t_cb + t_boot, 1e-9):.1f}x the bootstrap)",
          flush=True)
    t0 = time.time()
    idx_exact = build_roargraph_dist(base, base, P, train_knn=knn_exact)
    t_pass_exact = time.time() - t0
    print(f"exact build passes {t_pass_exact:.1f}s", flush=True)
    knn_exact.unpersist()

    budgets = (400, 1000)
    r_exact = sampled_recall(idx_exact, budgets, 100, dim)
    r_boot = sampled_recall(idx_boot, budgets, 100, dim)
    for bud in budgets:
        print(f"beam {bud}: exact-build recall@10 {r_exact[bud]:.4f} | "
              f"bootstrap-build {r_boot[bud]:.4f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
