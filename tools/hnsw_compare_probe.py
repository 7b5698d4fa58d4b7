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

Two data modes:
  uniform — base = unit-norm uniform Gaussians, train queries = the
      base itself (in-distribution by construction; the setting where
      the RoarGraph paper expects NO advantage — protocol parity +
      kernel throughput check only).
  ood — base = clustered Gaussians ("image" modality), train + search
      queries = `generate_crossmodal_queries` (modality gap +
      cross-cluster mixing — the t2i/laion/webvid shape,
      `/root/reference/prepare_data.sh:23-79`, with train/search
      drawn from the same shifted distribution like the reference's
      query.train/query.10k split). This is the regime RoarGraph was
      built for (paper's 3.56x claim): the projection graph inherits
      train-query co-retrieval edges that cross base clusters, which
      a base-only HNSW lacks.

Usage: python tools/hnsw_compare_probe.py [n] [dim] [out_md] [mode]
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
    generate_clustered_vectors, generate_crossmodal_queries,
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


import os

N_CLUSTERS = int(os.environ.get("OOD_CLUSTERS", 64))
SIGMA_BASE = float(os.environ.get("OOD_SIGMA_BASE", 0.15))
SIGMA_Q = float(os.environ.get("OOD_SIGMA_Q", 0.10))
GAP = float(os.environ.get("OOD_GAP", 0.8))
MIX = float(os.environ.get("OOD_MIX", 0.35))
BUDGETS = tuple(int(x) for x in os.environ.get(
    "OOD_BUDGETS", "").split(",")) if os.environ.get("OOD_BUDGETS") \
    else BUDGETS
M_SQ = int(os.environ.get("OOD_M_SQ", 20))
N_QUERY_SETS = int(os.environ.get("OOD_QSETS", N_QUERY_SETS))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    out = sys.argv[3] if len(sys.argv) > 3 else "ANN_PROTOCOL.md"
    mode = sys.argv[4] if len(sys.argv) > 4 else "uniform"
    assert mode in ("uniform", "ood"), mode

    spark = get_spark("hnsw-compare")
    spark.sparkContext.setLogLevel("ERROR")

    if mode == "uniform":
        v = generate_random_vectors(spark, n, dim).withColumn(
            "set_id", (F.col("vec_id") / M).cast("long"))
        v = v.repartition(32).cache()
        v.count()
        base = v.select("vec_id", "vec")
        qsets = v.filter(F.col("set_id") < N_QUERY_SETS)
        train = base
    else:
        v = generate_clustered_vectors(
            spark, n, dim, N_CLUSTERS, sigma=SIGMA_BASE) \
            .select("vec_id", "vec") \
            .withColumn("set_id", (F.col("vec_id") / M).cast("long"))
        v = v.repartition(32).cache()
        v.count()
        base = v.select("vec_id", "vec")
        # train + search queries from ONE shifted distribution,
        # disjoint id ranges (the query.train / query.10k split)
        q_all = generate_crossmodal_queries(
            spark, n + N_QUERY_SETS * M, dim, N_CLUSTERS,
            sigma=SIGMA_Q, gap=GAP, mix=MIX) \
            .repartition(32).cache()
        q_all.count()
        qsets = q_all.filter(F.col("vec_id") < N_QUERY_SETS * M) \
            .withColumn("set_id", (F.col("vec_id") / M).cast("long"))
        train = q_all.filter(F.col("vec_id") >= N_QUERY_SETS * M)

    # exact set-level ground truth (distributed GEMM oracle)
    gt_rows = set_search.set_topk_gemm(qsets, v, K).select(
        "query_set_id", "data_set_id").collect()
    gt: dict[int, set] = {}
    for r in gt_rows:
        gt.setdefault(r["query_set_id"], set()).add(r["data_set_id"])

    # --- builds (each timed; roar's kNN stage runs distributed) -----
    p = graph_build.RoarGraphParams(m_sq=M_SQ, m_pjbp=12, l_pjpq=40)
    t0 = time.time()
    # task-parallel build — bit-identical to build_roargraph
    # (tests/test_graph_build_dist), so the recall axis is unchanged
    roar = graph_build.build_roargraph_dist(base, train, p)
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

    if mode == "uniform":
        data_desc = (
            f"Same data ({n:,} unit-norm uniform Gaussians d={dim}, "
            f"{n // M:,} sets), same budget, k={K}, same smooth-Chamfer "
            "rerank")
        note = (
            "NOTE uniform self-trained data is the setting where the "
            "RoarGraph paper expects NO advantage — its gains come from "
            "cross-modal train-query distribution shift (OOD queries), "
            "absent here by construction; this table checks protocol "
            "parity and kernel throughput, not the paper's headline "
            "claim.")
    else:
        data_desc = (
            f"OOD cross-modal-shaped data: base = {n:,} clustered "
            f"Gaussians (d={dim}, {N_CLUSTERS} clusters, "
            f"sigma={SIGMA_BASE}, {n // M:,} sets); train ({n:,}) and "
            f"search ({N_QUERY_SETS} sets) queries drawn from ONE "
            f"shifted distribution (modality gap {GAP} + cross-cluster "
            f"mix {MIX}, sigma={SIGMA_Q} — "
            "`operators/sampling.py:generate_crossmodal_queries`, "
            "modeling the t2i/laion/webvid text-query→image-base shape, "
            "`prepare_data.sh:23-79`); same budget, "
            f"k={K}, same smooth-Chamfer rerank")
        note = (
            "This is the regime the reference index exists for (paper "
            "§1: OOD train-query projection): RoarGraph's graph "
            "inherits train-query co-retrieval edges that cross base "
            "clusters, which a base-only HNSW lacks.")
    lines = [
        "",
        f"## RoarGraph vs HNSW head-to-head at n = {n:,} "
        f"({mode} data, single index, single-thread kernel QPS)",
        "",
        data_desc + " — the reference's comparison protocol "
        "(`tests/hnsw/search_rerank_hnsw.cpp` vs "
        "`tests/test_search_multivector_rerank.cpp`, `-T 1`). "
        f"RoarGraph: adaptive allocation (min_pq=5), build "
        f"{t_roar_build:.1f}s incl. the distributed exact-kNN stage; "
        f"HNSW: fixed ef=budget/m, build {t_hnsw_build:.1f}s "
        "(sequential insert — the per-index serial baseline; the "
        "engine's scale path shards and builds many in parallel). "
        + note,
        "",
        "| budget | roar recall@10 | roar QPS | hnsw recall@10 "
        "| hnsw QPS |",
        "|---|---|---|---|---|",
    ]
    for b in BUDGETS:
        # RoarGraph kernel path (the wave-vectorized engine kernel the
        # Spark search stage runs — pinned bit-equal to the sequential
        # reference trajectory by tests/test_roargraph.py).
        # One untimed warmup per budget: the first call at a new batch
        # shape absorbs one-time NumPy allocator/BLAS setup that
        # otherwise lands entirely on the first budget row.
        core.batch_multivector_search(
            roar.adj, vecs, qmats[:2], roar.entry_point, 5, b, b, True)
        t0 = time.time()
        roar_hits = 0
        all_res = core.batch_multivector_search(
            roar.adj, vecs, qmats, roar.entry_point, 5, b, b, True)
        for s, (qm, res) in enumerate(zip(qmats, all_res)):
            cands = np.concatenate([ids for ids, _ in res])
            top = _rerank_numpy(roar.ids[cands], qm, vecs)
            roar_hits += len(set(top.tolist()) & gt[s])
        t_roar = time.time() - t0

        # HNSW kernel path (same warmup treatment)
        ef = max(1, b // M)
        for qm in qmats[:2]:
            for j in range(M):
                hnsw.search_knn_local(hidx, qm[j], ef, ef)
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
