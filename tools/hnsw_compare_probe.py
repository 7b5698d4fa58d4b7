"""RoarGraph vs HNSW head-to-head at probe scale — the reference's
flagship experiment (`tests/test_search_multivector_rerank.cpp` vs
`tests/hnsw/search_rerank_hnsw.cpp`): same data, same budget sweep,
same k, same smooth-Chamfer rerank, recall@10 + single-thread QPS
(the reference runs search with `-T 1`; kernel-level timing here has
no Spark job floor, so the two systems' numbers are comparable to each
other and to the reference's own protocol).

Per budget B: RoarGraph searches with the adaptive allocation
(min_pq=5, max_pq=B, budget=B); HNSW searches each member with
ef = B / m (the fixed split its driver hard-codes). Both candidate
lists rerank with `smooth_chamfer_batch`.

Usage: python tools/hnsw_compare_probe.py [n] [dim] [out_md]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
from pyspark.sql import functions as F

from cross_modal_multivector_search_spark.functions import metrics
from cross_modal_multivector_search_spark.operators import (
    _roar_core as core, graph_build, hnsw, set_search,
)
from cross_modal_multivector_search_spark.operators.sampling import (
    generate_random_vectors,
)
from cross_modal_multivector_search_spark.session import get_spark

M = 5
N_QUERY_SETS = 20
K = 10
BUDGETS = (100, 200, 400, 1000)


def _rerank_numpy(cand_vids: np.ndarray, qmat: np.ndarray,
                  vecs: np.ndarray) -> np.ndarray:
    """Candidate vector ids -> top-K set ids by smooth-Chamfer
    (the reference's `MultiVectorReranker::Rerank` inner loop)."""
    sets = np.unique(cand_vids // M)
    rows = (sets[:, None] * M + np.arange(M)[None, :]).ravel()
    scores = metrics.smooth_chamfer_batch(
        qmat, vecs[rows], np.full(len(sets), M, dtype=np.int64))
    order = np.argsort(-scores, kind="stable")[:K]
    return sets[order]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    out = sys.argv[3] if len(sys.argv) > 3 else "ANN_PROTOCOL.md"

    spark = get_spark("hnsw-compare")
    spark.sparkContext.setLogLevel("ERROR")

    v = generate_random_vectors(spark, n, dim).withColumn(
        "set_id", (F.col("vec_id") / M).cast("long"))
    v = v.repartition(32).cache()
    v.count()
    base = v.select("vec_id", "vec")
    qsets = v.filter(F.col("set_id") < N_QUERY_SETS)

    # exact set-level ground truth (distributed GEMM oracle)
    gt_rows = set_search.set_topk_gemm(qsets, v, K).select(
        "query_set_id", "data_set_id").collect()
    gt: dict[int, set] = {}
    for r in gt_rows:
        gt.setdefault(r["query_set_id"], set()).add(r["data_set_id"])

    # --- builds (each timed; roar's kNN stage runs distributed) -----
    p = graph_build.RoarGraphParams(m_sq=20, m_pjbp=12, l_pjpq=40)
    t0 = time.time()
    roar = graph_build.build_roargraph(base, base, p)
    t_roar_build = time.time() - t0
    print(f"roar build {t_roar_build:.1f}s", flush=True)

    t0 = time.time()
    hidx = hnsw.build_hnsw(base, hnsw.HnswParams(m=12, ef_construction=60,
                                                 seed=7))
    t_hnsw_build = time.time() - t0
    print(f"hnsw build {t_hnsw_build:.1f}s", flush=True)

    # query matrices, local
    qpdf = qsets.orderBy("vec_id").toPandas()
    qmats = [np.vstack(qpdf[qpdf.set_id == s]["vec"].to_numpy())
             .astype(np.float64) for s in range(N_QUERY_SETS)]
    vecs = roar.vecs            # same matrix both systems (sorted ids)
    assert np.array_equal(roar.ids, hidx.ids)

    lines = [
        "",
        f"## RoarGraph vs HNSW head-to-head at n = {n:,} "
        f"(single index, single-thread kernel QPS)",
        "",
        f"Same data ({n:,} unit-norm uniform Gaussians d={dim}, "
        f"{n // M:,} sets), same budget, k={K}, same smooth-Chamfer "
        f"rerank — the reference's comparison protocol "
        "(`tests/hnsw/search_rerank_hnsw.cpp` vs "
        "`tests/test_search_multivector_rerank.cpp`, `-T 1`). "
        f"RoarGraph: adaptive allocation (min_pq=5), build "
        f"{t_roar_build:.1f}s incl. the distributed exact-kNN stage; "
        f"HNSW: fixed ef=budget/m, build {t_hnsw_build:.1f}s "
        "(sequential insert — the per-index serial baseline; the "
        "engine's scale path shards and builds many in parallel). "
        "NOTE uniform self-trained data is the setting where the "
        "RoarGraph paper expects NO advantage — its gains come from "
        "cross-modal train-query distribution shift (OOD queries), "
        "absent here by construction; this table checks protocol "
        "parity and kernel throughput, not the paper's headline claim.",
        "",
        "| budget | roar recall@10 | roar QPS | hnsw recall@10 "
        "| hnsw QPS |",
        "|---|---|---|---|---|",
    ]
    for b in BUDGETS:
        # RoarGraph kernel path (the wave-vectorized engine kernel the
        # Spark search stage runs — pinned bit-equal to the sequential
        # reference trajectory by tests/test_roargraph.py)
        t0 = time.time()
        roar_hits = 0
        all_res = core.batch_multivector_search(
            roar.adj, vecs, qmats, roar.entry_point, 5, b, b, True)
        for s, (qm, res) in enumerate(zip(qmats, all_res)):
            cands = np.concatenate([ids for ids, _ in res])
            top = _rerank_numpy(roar.ids[cands], qm, vecs)
            roar_hits += len(set(top.tolist()) & gt[s])
        t_roar = time.time() - t0

        # HNSW kernel path
        ef = max(1, b // M)
        t0 = time.time()
        hnsw_hits = 0
        for s, qm in enumerate(qmats):
            cands = np.concatenate([
                hnsw.search_knn_local(hidx, qm[j], ef, ef)[0]
                for j in range(M)])
            top = _rerank_numpy(hidx.ids[cands], qm, vecs)
            hnsw_hits += len(set(top.tolist()) & gt[s])
        t_hnsw = time.time() - t0

        lines.append(
            f"| {b} | {roar_hits / (N_QUERY_SETS * K):.4f} "
            f"| {N_QUERY_SETS / t_roar:.2f} "
            f"| {hnsw_hits / (N_QUERY_SETS * K):.4f} "
            f"| {N_QUERY_SETS / t_hnsw:.2f} |")
        print(lines[-1], flush=True)

    if out == "-":
        print("\n".join(lines))
    else:
        with open(out, "a") as f:
            f.write("\n".join(lines) + "\n")
        print(f"appended to {out}")
    spark.stop()


if __name__ == "__main__":
    main()
