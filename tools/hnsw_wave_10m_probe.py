"""Single-index HNSW at 10M via the wave-parallel build (VERDICT r13
directive #3): the reference's own comparison index is ONE hnswlib
graph (`tests/hnsw/search_rerank_hnsw.cpp`), but the serial insert
loop extrapolates to ~7-10h at 10M (measured 2555s at 1M). The
labeled wave-parallel shape (`hnsw.build_hnsw_wave` — frozen-snapshot
distributed wave searches + deterministic id-order commits + layer-0
closure repair; validated by saturating-exactness and recall parity
vs the serial build in tests/test_hnsw.py) makes the column
buildable. Shares the staged fixture + GT of the roar/NSG 10M probes
so the iso-recall table stays like-for-like.

  build   — read staged parquet, build_hnsw_wave at the probe-scale
            params (m=12, efc=60 — the same scaled regime every
            engine's probe rows use), save_hnsw.
  search  — shared-GT budget sweep, fixed per-member ef = budget/m
            (the reference HNSW driver's split), recall@10 +
            single-thread kernel QPS + iso-recall interpolation,
            recorded to ANN_PROTOCOL.json with shape
            "single-wave" (labeled).

Usage: python tools/hnsw_wave_10m_probe.py <build|search> [n] [dim]
Env: HW_BUDGETS (2000,8000,16000,32000,48000) HW_M (12) HW_EFC (60)
     HW_WAVE0 (4096) HW_INDEX_DIR (/tmp/hnsw10m_wave)
     SI_DATA_DIR (/tmp/si10m_dense) SI_OUT (SCALE_PROBE.md)
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
    graph_build, hnsw, set_search,
)
from cross_modal_multivector_search_spark.session import get_spark

M = 5
K = 10
N_QUERY_SETS = 100
BUDGETS = tuple(int(x) for x in os.environ.get(
    "HW_BUDGETS", "2000,8000,16000,32000,48000").split(","))
P = hnsw.HnswParams(m=int(os.environ.get("HW_M", 12)),
                    ef_construction=int(os.environ.get("HW_EFC", 60)),
                    seed=7)
WAVE0 = int(os.environ.get("HW_WAVE0", 4096))
INDEX_DIR = os.environ.get("HW_INDEX_DIR", "/tmp/hnsw10m_wave")
DATA_DIR = os.environ.get("SI_DATA_DIR", "/tmp/si10m_dense")
OUT = os.environ.get("SI_OUT", "SCALE_PROBE.md")


def phase_build(spark, n: int, dim: int) -> None:
    base = spark.read.parquet(f"{DATA_DIR}/base.parquet")
    t0 = time.time()
    idx = hnsw.build_hnsw_wave(base, P, wave0=WAVE0, n_batches=256)
    t_build = time.time() - t0
    print(f"hnsw wave build {t_build:.1f}s", flush=True)
    t0 = time.time()
    hnsw.save_hnsw(idx, spark, INDEX_DIR)
    degs = np.fromiter((len(a) for a in idx.adj[0]), dtype=np.int64)
    print(f"saved to {INDEX_DIR} [{time.time() - t0:.1f}s]; layer-0 "
          f"degree mean {degs.mean():.1f} max {degs.max()}; "
          f"max_level {idx.max_level}", flush=True)
    with open("/tmp/hnsw10m_build_stages.txt", "w") as f:
        f.write(repr((n, dim, t_build, float(degs.mean()),
                      int(degs.max()))) + "\n")


def phase_search(spark, n: int, dim: int) -> None:
    from hnsw_compare_probe import _rerank_numpy, iso_recall_qps

    base = spark.read.parquet(f"{DATA_DIR}/base.parquet")
    q_all = spark.read.parquet(f"{DATA_DIR}/queries.parquet")
    qsets = q_all.filter(F.col("vec_id") < N_QUERY_SETS * M) \
        .withColumn("set_id", (F.col("vec_id") / M).cast("long"))
    v = base.withColumn("set_id", (F.col("vec_id") / M).cast("long"))

    t0 = time.time()
    idx = hnsw.load_hnsw(spark, INDEX_DIR, base)
    print(f"load_hnsw {time.time() - t0:.1f}s", flush=True)

    gt_path = f"{DATA_DIR}/gt_k{K}_q{N_QUERY_SETS}.parquet"
    if not os.path.exists(gt_path):
        set_search.set_topk_gemm(qsets, v, K).select(
            "query_set_id", "data_set_id") \
            .write.mode("overwrite").parquet(gt_path)
    gt_rows = spark.read.parquet(gt_path).collect()
    gt: dict[int, set] = {}
    for r in gt_rows:
        gt.setdefault(r["query_set_id"], set()).add(r["data_set_id"])

    qpdf = qsets.orderBy("vec_id").toPandas()
    qmats = [np.vstack(qpdf[qpdf.set_id == s]["vec"].to_numpy())
             .astype(np.float64) for s in range(N_QUERY_SETS)]
    vecs = idx.vecs

    lines = [
        "",
        f"## 10M SINGLE-index HNSW via the wave-parallel build "
        f"(n = {n:,}, shared OOD fixture, m={M}, {N_QUERY_SETS} query "
        "sets — r13 directive #3, LABELED build shape)", "",
    ]
    try:
        with open("/tmp/hnsw10m_build_stages.txt") as f:
            _, _, t_build, dmean, dmax = eval(f.read())  # noqa: S307
        lines += [
            f"Build: wave-parallel (`hnsw.build_hnsw_wave`, wave0="
            f"{WAVE0}, growth 2 — frozen-snapshot distributed wave "
            "searches, id-order commits, layer-0 closure repair; NOT "
            "serial-equal, validated by saturating exactness + recall "
            "parity vs the serial build in tests/test_hnsw.py), "
            f"params m={P.m} efc={P.ef_construction}: "
            f"{t_build:.1f}s. Layer-0 degree mean {dmean:.1f} max "
            f"{dmax}.", "",
        ]
    except OSError:
        pass
    lines += ["| budget | recall@10 | QPS (1-thread kernel) |",
              "|---|---|---|"]

    sweep = []
    for b in BUDGETS:
        ef = max(1, b // M)
        for qm in qmats[:2]:
            for j in range(M):
                hnsw.search_knn_local(idx, qm[j], ef, ef)
        t0 = time.time()
        hits = 0
        for s, qm in enumerate(qmats):
            cands = np.concatenate([
                hnsw.search_knn_local(idx, qm[j], ef, ef)[0]
                for j in range(M)])
            top = _rerank_numpy(idx.ids[cands], qm, vecs)
            hits += len(set(top.tolist()) & gt[s])
        t_r = time.time() - t0
        rec, qps = hits / (N_QUERY_SETS * K), N_QUERY_SETS / t_r
        sweep.append((rec, qps))
        lines.append(f"| {b} | {rec:.4f} | {qps:.2f} |")
        print(lines[-1], flush=True)
        with open("/tmp/hnsw10m_sweep.txt", "w") as f:
            f.write(repr(list(zip(BUDGETS, sweep))) + "\n")

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

    import ann_protocol_json
    ann_protocol_json.record(
        tool="hnsw_wave_10m_probe", engine="hnsw", shape="single-wave",
        qps_basis="kernel-1thread",
        fixture={"n": n, "dim": dim, "mode": "ood", "m": M,
                 "n_query_sets": N_QUERY_SETS, "k": K, "hnsw_m": P.m,
                 "efc": P.ef_construction, "wave0": WAVE0,
                 "index_dir": INDEX_DIR},
        sweep=[(b, r, q) for b, (r, q) in zip(BUDGETS, sweep)],
        iso={f"{t:.2f}": iso_recall_qps(sweep, t)
             for t in (0.80, 0.90)},
        notes="LABELED build shape: wave-parallel single index "
              "(build_hnsw_wave), not serial-equal — validated by "
              "saturating exactness + recall parity vs serial in "
              "tests/test_hnsw.py")


def main() -> None:
    phase = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    spark = get_spark("hnsw-wave-10m")
    spark.sparkContext.setLogLevel("ERROR")
    if phase == "build":
        phase_build(spark, n, dim)
    elif phase == "search":
        phase_search(spark, n, dim)
    else:
        raise SystemExit(f"unknown phase {phase}")
    spark.stop()


if __name__ == "__main__":
    main()
