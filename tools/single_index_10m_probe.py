"""The reference-scale SINGLE-index build: one RoarGraph over 10M
vectors (the reference's headline artifact — T2I-10M / LAION-10M,
`/root/reference/prepare_data.sh:23-79`, built by
`src/index_bipartite.cpp:1061,1194` with `-T 64`,
`scripts/roargraph/build_roargraph_index.sh:26-28`).

Composition (VERDICT r11 directive #1): the ANN-bootstrapped
train-kNN stage (`simsearch.ivf_knn`, recall-gated) feeds the
task-parallel `build_roargraph_dist` with the node-local mmap
snapshot (`snapshot='auto'` -> mmap above 512 MB), which removes the
last 10M wall named in SCALE_PROBE.md: per-worker broadcast copies
(32 x ~6 GB) become ONE page-cache copy per machine.

OOD cross-modal fixture (same generator/params as the 1M head-to-head
table in ANN_PROTOCOL.md): clustered base, train + search queries
from one shifted distribution.

Phased so the timed kernel sweep can run on an idle box:
  gen     — generate the fixture ONCE and stage it to parquet
            (SI_DATA_DIR); build/search scan the staged tables, the
            shape a real pipeline has (indexes build from storage,
            not from a generator re-run).
  build   — read staged parquet, codebook, ivf_knn (+ sampled recall
            gate), dist build, save_graph; stage times printed.
  search  — read staged parquet, load_graph, exact set-level GT,
            budget sweep: recall@10 + single-thread kernel QPS
            (+ iso-recall interpolation).

Usage: python tools/single_index_10m_probe.py <gen|build|search> [n] [dim]
Env: SI_CELLS (1024) SI_NPROBE (8) SI_MSQ (20) SI_M (12) SI_L (40)
     SI_QSETS (100) SI_BUDGETS SI_INDEX_DIR (/tmp/roar10m_index)
     SI_DATA_DIR (/tmp/si10m_data)
     SI_OUT (SCALE_PROBE.md section appended on search)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")

import numpy as np
from pyspark.sql import functions as F

from cross_modal_multivector_search_spark.functions import metrics
from cross_modal_multivector_search_spark.operators import (
    _roar_core as core, graph_build, set_search, simsearch,
)
from cross_modal_multivector_search_spark.operators.brute_force import (
    knn_exact_gemm,
)
from cross_modal_multivector_search_spark.operators.sampling import (
    generate_clustered_vectors, generate_crossmodal_queries,
)
from cross_modal_multivector_search_spark.session import get_spark

M = 5                       # set cardinality (reference m=5 headline)
K = 10
CELLS = int(os.environ.get("SI_CELLS", 1024))
NPROBE = int(os.environ.get("SI_NPROBE", 8))
N_CLUSTERS = 64
P = graph_build.RoarGraphParams(
    m_sq=int(os.environ.get("SI_MSQ", 20)),
    m_pjbp=int(os.environ.get("SI_M", 12)),
    l_pjpq=int(os.environ.get("SI_L", 40)))
N_QUERY_SETS = int(os.environ.get("SI_QSETS", 100))
BUDGETS = tuple(int(x) for x in os.environ.get(
    "SI_BUDGETS", "1000,2000,4000,8000").split(","))
INDEX_DIR = os.environ.get("SI_INDEX_DIR", "/tmp/roar10m_index")
DATA_DIR = os.environ.get("SI_DATA_DIR", "/tmp/si10m_data")
OUT = os.environ.get("SI_OUT", "SCALE_PROBE.md")


def phase_gen(spark, n: int, dim: int) -> None:
    """Generate the OOD fixture (identical params to the 1M
    head-to-head, ANN_PROTOCOL.md) and stage it to parquet — the real
    pipeline shape: downstream stages scan storage, not a generator."""
    t0 = time.time()
    generate_clustered_vectors(
        spark, n, dim, N_CLUSTERS, sigma=0.15) \
        .select("vec_id", "vec").repartition(64) \
        .write.mode("overwrite").parquet(f"{DATA_DIR}/base.parquet")
    generate_crossmodal_queries(
        spark, n + N_QUERY_SETS * M, dim, N_CLUSTERS,
        sigma=0.10, gap=0.8, mix=0.35).repartition(64) \
        .write.mode("overwrite").parquet(f"{DATA_DIR}/queries.parquet")
    print(f"gen+stage {time.time() - t0:.1f}s -> {DATA_DIR}",
          flush=True)


def fixture(spark, n: int, dim: int):
    """The staged fixture tables (run the gen phase first)."""
    base = spark.read.parquet(f"{DATA_DIR}/base.parquet")
    q_all = spark.read.parquet(f"{DATA_DIR}/queries.parquet")
    qsets = q_all.filter(F.col("vec_id") < N_QUERY_SETS * M) \
        .withColumn("set_id", (F.col("vec_id") / M).cast("long"))
    train = q_all.filter(F.col("vec_id") >= N_QUERY_SETS * M)
    return base, train, qsets


def phase_build(spark, n: int, dim: int) -> None:
    stage_t: dict[str, float] = {}
    base, train, _ = fixture(spark, n, dim)
    tq = train.select(F.col("vec_id").alias("query_id"), "vec")
    tb = base.select(F.col("vec_id").alias("base_id"), "vec")

    t0 = time.time()
    cb = simsearch.train_codebook(base, CELLS, iters=10,
                                  sample_n=100_000)
    stage_t["codebook"] = time.time() - t0
    print(f"codebook {CELLS} cells {stage_t['codebook']:.1f}s",
          flush=True)

    # Chunk the train queries through ivf_knn, staging each chunk's
    # table to parquet: the merge stage shuffles n_q * nprobe * k rows
    # (3.2B at 10M/16/20 — ~75 GB of shuffle spill, more than this
    # box's free disk), so bounding the in-flight query count bounds
    # the spill at 1/chunks while total FLOPs are unchanged. Chunking
    # is also the 100 TB shape: a bounded-footprint pass per query
    # partition, results landing in storage, downstream reading the
    # union.
    t0 = time.time()
    chunks = int(os.environ.get("SI_KNN_CHUNKS", 5))
    knn_dir = f"{DATA_DIR}/knn_boot.parquet"
    for c in range(chunks):
        simsearch.ivf_knn(
            tq.filter(F.col("query_id") % chunks == c), tb, cb,
            P.m_sq, nprobe=NPROBE) \
            .write.mode("overwrite" if c == 0 else "append") \
            .parquet(knn_dir)
        print(f"  ivf_knn chunk {c + 1}/{chunks} done "
              f"[{time.time() - t0:.1f}s]", flush=True)
        # drop the chunk's lineage so ContextCleaner frees its shuffle
        # files before the next chunk writes its own
        import gc
        gc.collect()
        spark.sparkContext._jvm.System.gc()
    knn_boot = spark.read.parquet(knn_dir)
    stage_t["ivf_knn"] = time.time() - t0
    print(f"ivf_knn table {stage_t['ivf_knn']:.1f}s "
          f"({chunks} staged chunks)", flush=True)

    # sampled recall gate (~2k queries, exact table on the sample only)
    t0 = time.time()
    step = max(1, n // 2000)
    sq = tq.filter(F.col("query_id") % step == 0).cache()
    gate_exact = knn_exact_gemm(sq, tb, P.m_sq, metric="ip")
    gate_boot = knn_boot.join(sq.select("query_id"), "query_id", "semi")
    gate = simsearch.knn_table_recall(
        gate_boot, gate_exact, P.m_sq).collect()[0]["mean_recall"]
    stage_t["gate"] = time.time() - t0
    print(f"train-kNN recall gate (sampled, @{P.m_sq}): {gate:.4f} "
          f"[{stage_t['gate']:.1f}s]", flush=True)

    t0 = time.time()
    idx = graph_build.build_roargraph_dist(
        base, train, P, train_knn=knn_boot, n_batches=256)
    stage_t["build_passes"] = time.time() - t0
    print(f"LinkProjection passes (dist, mmap snapshot) "
          f"{stage_t['build_passes']:.1f}s", flush=True)

    t0 = time.time()
    graph_build.save_graph(idx, spark, INDEX_DIR)
    stage_t["save"] = time.time() - t0
    degs = np.fromiter((len(a) for a in idx.adj), dtype=np.int64)
    total = sum(stage_t.values())
    print(f"saved to {INDEX_DIR} [{stage_t['save']:.1f}s]; degree "
          f"mean {degs.mean():.1f} max {degs.max()}; "
          f"TOTAL {total:.1f}s ({n / total / 1000:.1f}k nodes/s "
          f"end-to-end incl. codebook+kNN+save)", flush=True)
    with open("/tmp/si10m_build_stages.txt", "w") as f:
        f.write(repr((n, dim, gate, stage_t)) + "\n")


def _rerank_numpy(cand_vids, qmat, vecs):
    sets = np.unique(cand_vids // M)
    rows = (sets[:, None] * M + np.arange(M)[None, :]).ravel()
    scores = metrics.smooth_chamfer_batch(
        qmat, vecs[rows], np.full(len(sets), M, dtype=np.int64))
    order = np.argsort(-scores, kind="stable")[:K]
    return sets[order]


def phase_search(spark, n: int, dim: int) -> None:
    from hnsw_compare_probe import iso_recall_qps

    base, _, qsets = fixture(spark, n, dim)
    v = base.withColumn("set_id", (F.col("vec_id") / M).cast("long"))

    t0 = time.time()
    idx = graph_build.load_graph(spark, INDEX_DIR, base)
    print(f"load_graph {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    gt_path = f"{DATA_DIR}/gt_k{K}_q{N_QUERY_SETS}.parquet"
    if not os.path.exists(gt_path):
        set_search.set_topk_gemm(qsets, v, K).select(
            "query_set_id", "data_set_id") \
            .write.mode("overwrite").parquet(gt_path)
    gt_rows = spark.read.parquet(gt_path).collect()
    gt: dict[int, set] = {}
    for r in gt_rows:
        gt.setdefault(r["query_set_id"], set()).add(r["data_set_id"])
    print(f"exact set-level GT {time.time() - t0:.1f}s "
          f"(staged at {gt_path})", flush=True)

    qpdf = qsets.orderBy("vec_id").toPandas()
    qmats = [np.vstack(qpdf[qpdf.set_id == s]["vec"].to_numpy())
             .astype(np.float64) for s in range(N_QUERY_SETS)]
    vecs = idx.vecs

    lines = [
        "",
        f"## 10M SINGLE-index RoarGraph (n = {n:,}, OOD fixture, "
        f"m={M}, {N_QUERY_SETS} query sets)", "",
    ]
    try:
        with open("/tmp/si10m_build_stages.txt") as f:
            bn, bd, gate, stage_t = eval(f.read())  # noqa: S307 (own file)
        total = sum(stage_t.values())
        lines += [
            "Build (one index, ANN-bootstrapped train-kNN + node-local "
            "mmap pass-3 snapshot — VERDICT r11 directive #1): "
            + ", ".join(f"{k} {v:.1f}s" for k, v in stage_t.items())
            + f"; TOTAL {total:.1f}s ({bn / total / 1000:.1f}k nodes/s "
            f"end-to-end). Sampled train-kNN recall gate @{P.m_sq}: "
            f"{gate:.4f} ({CELLS} cells, nprobe={NPROBE}). Params "
            f"m_sq={P.m_sq} M_pjbp={P.m_pjbp} L_pjpq={P.l_pjpq}, "
            f"same OOD generator/params as the 1M head-to-head "
            "(ANN_PROTOCOL.md).", "",
        ]
    except OSError:
        pass
    lines += ["| budget | recall@10 | QPS (1-thread kernel) |",
              "|---|---|---|"]

    sweep = []
    for b in BUDGETS:
        core.batch_multivector_search(
            idx.adj, vecs, qmats[:2], idx.entry_point, 5, b, b, True)
        t0 = time.time()
        hits = 0
        all_res = core.batch_multivector_search(
            idx.adj, vecs, qmats, idx.entry_point, 5, b, b, True)
        for s, (qm, res) in enumerate(zip(qmats, all_res)):
            cands = np.concatenate([ids for ids, _ in res])
            top = _rerank_numpy(idx.ids[cands], qm, vecs)
            hits += len(set(top.tolist()) & gt[s])
        t_r = time.time() - t0
        rec, qps = hits / (N_QUERY_SETS * K), N_QUERY_SETS / t_r
        sweep.append((rec, qps))
        lines.append(f"| {b} | {rec:.4f} | {qps:.2f} |")
        print(lines[-1], flush=True)

    iso = []
    for target in (0.80, 0.90):
        q = iso_recall_qps(sweep, target)
        iso.append(f"QPS@recall{target:.2f}: "
                   + (f"{q:.2f}" if q is not None else "n/r"))
    lines += ["", "**" + " — ".join(iso) + "**", ""]
    print(lines[-2], flush=True)
    with open(OUT, "a") as f:
        f.write("\n".join(lines) + "\n")
    print(f"appended to {OUT}", flush=True)

    # machine-readable twin (ANN_PROTOCOL.json)
    import ann_protocol_json
    ann_protocol_json.record(
        tool="single_index_10m_probe", engine="roar", shape="single",
        qps_basis="kernel-1thread",
        fixture={"n": n, "dim": dim, "mode": "ood", "m": M,
                 "n_query_sets": N_QUERY_SETS, "k": K, "m_sq": P.m_sq,
                 "m_pjbp": P.m_pjbp, "l_pjpq": P.l_pjpq,
                 "cells": CELLS, "nprobe": NPROBE,
                 "index_dir": INDEX_DIR},
        sweep=[(b, r, q) for b, (r, q) in zip(BUDGETS, sweep)],
        iso={f"{t:.2f}": iso_recall_qps(sweep, t)
             for t in (0.80, 0.90)})


def main() -> None:
    phase = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    assert n % M == 0
    spark = get_spark("single-index-10m")
    spark.sparkContext.setLogLevel("ERROR")
    if phase == "gen":
        phase_gen(spark, n, dim)
    elif phase == "build":
        phase_build(spark, n, dim)
    elif phase == "search":
        phase_search(spark, n, dim)
    else:
        raise SystemExit(f"unknown phase {phase}")
    spark.stop()


if __name__ == "__main__":
    main()
