"""10M OOD head-to-head: the reference's headline claim at its
headline scale (BASELINE.md: RoarGraph 3.56x QPS @ 0.90 recall over
HNSW on 10M cross-modal data, `tests/test_search_multivector_rerank
.cpp` vs `tests/hnsw/search_rerank_hnsw.cpp`).

Composes the round's pieces: the staged 10M OOD fixture
(`single_index_10m_probe.py gen`), the saved single RoarGraph index
(`... build` — ANN-bootstrapped kNN + mmap snapshot), the staged exact
set-level GT, and a SHARDED HNSW baseline (the sequential single-index
insert extrapolates to ~6.6 h at 10M; the sharded builder is the
engine's measured 10M HNSW shape — SCALE_PROBE.md — and is labeled as
such). Search shapes differ and are labeled: RoarGraph runs the
single-thread kernel (the reference's `-T 1` protocol); sharded HNSW
runs the Spark fan-out fixed-split search (ef = budget/m per shard,
every shard searched), whose wall time includes the job floor —
recall is the directly comparable axis, QPS columns are per-shape.

Usage: python tools/ann_10m_headtohead.py [n] [dim] [n_shards] [out]
Env: SI_DATA_DIR SI_INDEX_DIR SI_QSETS SI_BUDGETS (shared with
     single_index_10m_probe.py) HH_SKIP_ROAR=1 (hnsw rows only)
     HH_ROAR_BUDGETS / HH_HNSW_BUDGETS — per-engine budget lists
     (default SI_BUDGETS). The two shapes need different ranges: the
     single index must scale its beam with n to hold recall, while the
     sharded fan-out explores budget x n_shards total work per row and
     saturates recall (and wall) at far smaller per-shard budgets.
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

from cross_modal_multivector_search_spark.operators import (
    _roar_core as core, graph_build, hnsw, recall, rerank,
)
from cross_modal_multivector_search_spark.session import get_spark

import single_index_10m_probe as SI
from hnsw_compare_probe import iso_recall_qps

M, K = SI.M, SI.K
BUDGETS = tuple(int(x) for x in os.environ.get(
    "SI_BUDGETS", "1000,2000,4000,8000").split(","))
ROAR_BUDGETS = tuple(int(x) for x in os.environ.get(
    "HH_ROAR_BUDGETS", "").split(",")) if os.environ.get(
    "HH_ROAR_BUDGETS") else BUDGETS
HNSW_BUDGETS = tuple(int(x) for x in os.environ.get(
    "HH_HNSW_BUDGETS", "").split(",")) if os.environ.get(
    "HH_HNSW_BUDGETS") else BUDGETS


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_shards = int(sys.argv[3]) if len(sys.argv) > 3 else 640
    out = sys.argv[4] if len(sys.argv) > 4 else "ANN_PROTOCOL.md"

    spark = get_spark("ann-10m-headtohead")
    spark.sparkContext.setLogLevel("ERROR")
    base, _, qsets = SI.fixture(spark, n, dim)
    qsets = qsets.cache()
    v = base.withColumn("set_id", (F.col("vec_id") / M).cast("long"))

    gt_path = f"{SI.DATA_DIR}/gt_k{K}_q{SI.N_QUERY_SETS}.parquet"
    gt_df = spark.read.parquet(gt_path).cache()
    gt_df.count()
    gt: dict[int, set] = {}
    for r in gt_df.collect():
        gt.setdefault(r["query_set_id"], set()).add(r["data_set_id"])

    # ---- sharded HNSW baseline (build timed) ------------------------
    t0 = time.time()
    g = hnsw.build_hnsw_sharded(base, n_shards).cache()
    g.count()
    t_hnsw = time.time() - t0
    print(f"sharded hnsw build {t_hnsw:.1f}s "
          f"({n / t_hnsw / 1e3:.1f}k nodes/s, {n_shards} shards)",
          flush=True)
    work = hnsw.prepare_hnsw_work(g, base, n_shards).cache()
    work.count()

    roar_rows, hnsw_rows = [], []
    if not int(os.environ.get("HH_SKIP_ROAR", 0)):
        idx = graph_build.load_graph(spark, SI.INDEX_DIR, base)
        qpdf = qsets.orderBy("vec_id").toPandas()
        qmats = [np.vstack(qpdf[qpdf.set_id == s]["vec"].to_numpy())
                 .astype(np.float64) for s in range(SI.N_QUERY_SETS)]
        for b in ROAR_BUDGETS:
            core.batch_multivector_search(
                idx.adj, idx.vecs, qmats[:2], idx.entry_point, 5, b, b,
                True)
            t0 = time.time()
            hits = 0
            res_all = core.batch_multivector_search(
                idx.adj, idx.vecs, qmats, idx.entry_point, 5, b, b,
                True)
            for s, (qm, res) in enumerate(zip(qmats, res_all)):
                cands = np.concatenate([ids for ids, _ in res])
                top = SI._rerank_numpy(idx.ids[cands], qm, idx.vecs)
                hits += len(set(top.tolist()) & gt[s])
            t_r = time.time() - t0
            roar_rows.append((hits / (SI.N_QUERY_SETS * K),
                              SI.N_QUERY_SETS / t_r))
            print(f"roar b={b}: recall {roar_rows[-1][0]:.4f} "
                  f"QPS {roar_rows[-1][1]:.2f}", flush=True)
        del idx

    for b in HNSW_BUDGETS:
        t0 = time.time()
        cands = hnsw.search_hnsw_sharded(work, qsets, budget=b).cache()
        cands.count()
        t_search = time.time() - t0
        t0 = time.time()
        res = rerank.rerank(cands.select("query_set_id", "base_vec_id"),
                            qsets, v, K, m=M)
        mr = recall.mean_recall(
            res.select("query_set_id", "data_set_id"), gt_df, K
        ).collect()[0]["mean_recall"]
        t_rr = time.time() - t0
        hnsw_rows.append((mr, SI.N_QUERY_SETS / (t_search + t_rr)))
        print(f"hnsw-sharded b={b}: recall {mr:.4f} "
              f"QPS {hnsw_rows[-1][1]:.2f}", flush=True)
        cands.unpersist()

    lines = [
        "",
        f"## 10M OOD head-to-head: single RoarGraph vs SHARDED HNSW "
        f"(n = {n:,}, m={M}, {SI.N_QUERY_SETS} query sets)", "",
        "Same staged OOD fixture, same exact set-level GT, same "
        "smooth-Chamfer rerank, k=10. RoarGraph: the round's single "
        "10M index (ANN-bootstrapped train-kNN + mmap-snapshot "
        "distributed build, SCALE_PROBE.md), single-thread kernel "
        "QPS (the reference's `-T 1` protocol). HNSW: "
        f"{n_shards}-shard parallel build ({t_hnsw:.1f}s — the "
        "sequential single-index insert extrapolates to ~6.6 h at "
        "10M, so the engine's sharded shape is the baseline, labeled) "
        "searched by Spark fan-out, ef=budget/m per shard, EVERY "
        "shard searched; its QPS includes the Spark job floor and is "
        "not kernel-comparable — recall at equal budget is the "
        "comparable axis.", "",
        "| budget | roar recall@10 | roar QPS (kernel) "
        "| hnsw-sharded recall@10 | hnsw-sharded QPS (spark fan-out) |",
        "|---|---|---|---|---|",
    ]
    roar_by_b = dict(zip(ROAR_BUDGETS, roar_rows))
    hnsw_by_b = dict(zip(HNSW_BUDGETS, hnsw_rows))
    for b in sorted(set(ROAR_BUDGETS if roar_rows else ())
                    | set(HNSW_BUDGETS)):
        rr = (f"{roar_by_b[b][0]:.4f} | {roar_by_b[b][1]:.2f}"
              if b in roar_by_b else "- | -")
        hh = (f"{hnsw_by_b[b][0]:.4f} | {hnsw_by_b[b][1]:.2f}"
              if b in hnsw_by_b else "- | -")
        lines.append(f"| {b} | {rr} | {hh} |")
    iso = []
    for target in (0.80, 0.90):
        qr = iso_recall_qps(roar_rows, target) if roar_rows else None
        qh = iso_recall_qps(hnsw_rows, target)
        iso.append(
            f"QPS@recall{target:.2f}: roar "
            + (f"{qr:.2f}" if qr is not None else "n/r")
            + ", hnsw-sharded "
            + (f"{qh:.2f}" if qh is not None else "n/r"))
    lines += ["", "**" + " — ".join(iso)
              + "** (per-shape QPS as labeled above).", ""]
    with open(out, "a") as f:
        f.write("\n".join(lines) + "\n")
    print(f"appended to {out}", flush=True)

    # machine-readable twin (ANN_PROTOCOL.json) — one record per
    # engine SHAPE, with the qps basis labeled (the roar column is
    # single-thread kernel time; the sharded-HNSW column is a Spark
    # fan-out wall that includes the per-job floor)
    import ann_protocol_json
    fixture = {"n": n, "dim": dim, "mode": "ood", "m": M,
               "n_query_sets": SI.N_QUERY_SETS, "k": K,
               "index_dir": SI.INDEX_DIR, "n_shards": n_shards}
    if roar_rows:
        ann_protocol_json.record(
            tool="ann_10m_headtohead", fixture=fixture, engine="roar",
            shape="single", qps_basis="kernel-1thread",
            sweep=[(b, r, q) for b, (r, q) in zip(ROAR_BUDGETS,
                                                  roar_rows)],
            iso={f"{t:.2f}": iso_recall_qps(roar_rows, t)
                 for t in (0.80, 0.90)})
    ann_protocol_json.record(
        tool="ann_10m_headtohead", fixture=fixture, engine="hnsw",
        shape="sharded", qps_basis="spark-jobs", build_s=t_hnsw,
        sweep=[(b, r, q) for b, (r, q) in zip(HNSW_BUDGETS, hnsw_rows)],
        iso={f"{t:.2f}": iso_recall_qps(hnsw_rows, t)
             for t in (0.80, 0.90)})
    spark.stop()


if __name__ == "__main__":
    main()
