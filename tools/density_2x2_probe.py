"""Density attribution probe (VERDICT r13 directive #2): is the dense
10M RoarGraph's degree cap (mean 5.0 against M_pjbp=35, and with it
the 64000-budget iso-recall operating point) the co-retrieval TABLE
WIDTH (m_sq) or the FIXTURE GEOMETRY (concentrated Gaussian-mixture
co-retrieval pools collapsing onto cluster centers)?

2x2 at 1M — both levers, each alone and together, same build params
as the reference's 10M config (M_pjbp=35, L_pjpq=100,
`scripts/roargraph/build_roargraph_index.sh:26-28`):

  cell A  m_sq=100, baseline geometry (sigma_base 0.15, sigma_q 0.10
          — the 1M/10M protocol fixture)
  cell B  m_sq=200, baseline geometry      (the table-width lever)
  cell C  m_sq=100, dispersed geometry (sigma_base 0.30, sigma_q 0.30
          — lower cluster concentration, pass-1 pools stop collapsing
          onto cluster centers)                (the geometry lever)
  cell D  m_sq=200, dispersed geometry             (interaction)

Per cell: ivf-bootstrapped train-kNN (gate printed — the table-recall
confounder is measured, not assumed), build, mean/max degree, exact
set-level GT, recall@budget sweep + iso-recall interpolation.

Degree and recall are DETERMINISTIC (bit-exact kernels) and valid
under box contention; QPS columns are labeled indicative when the
probe shares the box with a build (the intended r14 run overlaps the
10M NSG build — attribution needs the deterministic columns only).

Usage: python tools/density_2x2_probe.py [n] [dim] [cells]
Env: DX_BUDGETS (1000,4000,16000,32000) DX_CONTENDED (1 -> label QPS)
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
    _roar_core as core, graph_build, set_search, simsearch,
)
from cross_modal_multivector_search_spark.operators.brute_force import (
    knn_exact_gemm,
)
from cross_modal_multivector_search_spark.operators.sampling import (
    generate_clustered_vectors, generate_crossmodal_queries,
)
from cross_modal_multivector_search_spark.session import get_spark

M = 5
K = 10
N_QUERY_SETS = 100
N_CLUSTERS = 64
BUDGETS = tuple(int(x) for x in os.environ.get(
    "DX_BUDGETS", "1000,4000,16000,32000").split(","))
CONTENDED = bool(int(os.environ.get("DX_CONTENDED", "1")))
CELLS = [
    ("A", 100, 0.15, 0.10, "baseline"),
    ("B", 200, 0.15, 0.10, "baseline"),
    ("C", 100, 0.30, 0.30, "dispersed"),
    ("D", 200, 0.30, 0.30, "dispersed"),
]


def run_cell(spark, n, dim, ivf_cells, m_sq, sigma_b, sigma_q, label):
    p = graph_build.RoarGraphParams(m_sq=m_sq, m_pjbp=35, l_pjpq=100)
    v = generate_clustered_vectors(spark, n, dim, N_CLUSTERS,
                                   sigma=sigma_b) \
        .select("vec_id", "vec") \
        .withColumn("set_id", (F.col("vec_id") / M).cast("long")) \
        .repartition(32).cache()
    v.count()
    base = v.select("vec_id", "vec")
    q_all = generate_crossmodal_queries(
        spark, n + N_QUERY_SETS * M, dim, N_CLUSTERS,
        sigma=sigma_q, gap=0.8, mix=0.35).repartition(32).cache()
    q_all.count()
    qsets = q_all.filter(F.col("vec_id") < N_QUERY_SETS * M) \
        .withColumn("set_id", (F.col("vec_id") / M).cast("long"))
    train = q_all.filter(F.col("vec_id") >= N_QUERY_SETS * M)
    tq = train.select(F.col("vec_id").alias("query_id"), "vec")
    tb = base.select(F.col("vec_id").alias("base_id"), "vec")

    t0 = time.time()
    cb = simsearch.train_codebook(base, ivf_cells, iters=10,
                                  sample_n=100_000)
    knn_boot = simsearch.ivf_knn(tq, tb, cb, m_sq, nprobe=8).cache()
    knn_boot.count()
    # sampled gate: the table-recall confounder, measured per cell
    step = max(1, n // 2000)
    sq = tq.filter(F.col("query_id") % step == 0).cache()
    gate_exact = knn_exact_gemm(sq, tb, m_sq, metric="ip")
    gate_boot = knn_boot.join(sq.select("query_id"), "query_id", "semi")
    gate = simsearch.knn_table_recall(
        gate_boot, gate_exact, m_sq).collect()[0]["mean_recall"]
    t_knn = time.time() - t0

    t0 = time.time()
    idx = graph_build.build_roargraph_dist(base, train, p,
                                           train_knn=knn_boot,
                                           n_batches=64)
    t_build = time.time() - t0
    degs = np.fromiter((len(a) for a in idx.adj), dtype=np.int64)

    gt_rows = set_search.set_topk_gemm(qsets, v, K).select(
        "query_set_id", "data_set_id").collect()
    gt: dict[int, set] = {}
    for r in gt_rows:
        gt.setdefault(r["query_set_id"], set()).add(r["data_set_id"])

    from hnsw_compare_probe import _rerank_numpy, iso_recall_qps
    qpdf = qsets.orderBy("vec_id").toPandas()
    qmats = [np.vstack(qpdf[qpdf.set_id == s]["vec"].to_numpy())
             .astype(np.float64) for s in range(N_QUERY_SETS)]
    vecs = idx.vecs

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
        sweep.append((hits / (N_QUERY_SETS * K), N_QUERY_SETS / t_r))
        print(f"    budget {b}: recall {sweep[-1][0]:.4f}", flush=True)
    iso = {f"{t:.2f}": iso_recall_qps(sweep, t) for t in (0.80, 0.90)}

    v.unpersist()
    q_all.unpersist()
    knn_boot.unpersist()
    return dict(m_sq=m_sq, geometry=label, sigma_b=sigma_b,
                sigma_q=sigma_q, gate=gate, t_knn=t_knn,
                t_build=t_build, deg_mean=float(degs.mean()),
                deg_max=int(degs.max()), sweep=sweep, iso=iso)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    ivf_cells = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    spark = get_spark("density-2x2")
    spark.sparkContext.setLogLevel("ERROR")

    want = os.environ.get("DX_CELLS", "ABCD")
    results = []
    for tag, m_sq, sb, sq_, label in CELLS:
        if tag not in want:
            continue
        print(f"cell {tag}: m_sq={m_sq} geometry={label} "
              f"(sigma_base={sb}, sigma_q={sq_})", flush=True)
        r = run_cell(spark, n, dim, ivf_cells, m_sq, sb, sq_, label)
        r["tag"] = tag
        results.append(r)
        print(f"  -> degree mean {r['deg_mean']:.1f} max "
              f"{r['deg_max']}, gate {r['gate']:.4f}, build "
              f"{r['t_build']:.1f}s", flush=True)
        # crash-safe checkpoint: a deadline mid-run keeps finished cells
        import json
        with open("/tmp/density_cells.json", "w") as f:
            json.dump(results, f, indent=1, default=float)

    qps_note = (" (QPS indicative only — contended box, concurrent "
                "build; recall/degree are deterministic)"
                if CONTENDED else "")
    lines = [
        "",
        f"## Density attribution 2x2 at n = {n:,} "
        "(r13 directive #2: table width vs fixture geometry)", "",
        "Build params fixed at the reference's dense 10M config "
        "(M_pjbp=35, L_pjpq=100); the two levers are the train-kNN "
        "width m_sq (100 vs 200) and the fixture geometry (baseline "
        "sigma_base/sigma_q 0.15/0.10 vs dispersed 0.30/0.30 — lower "
        "cluster concentration). Recall columns are @10 over the "
        "exact set-level GT of each cell's own fixture" + qps_note
        + ".", "",
        "| cell | m_sq | geometry | boot gate | deg mean | deg max | "
        + " | ".join(f"r@{b}" for b in BUDGETS) + " |",
        "|---|---|---|---|---|---|" + "---|" * len(BUDGETS),
    ]
    for r in results:
        lines.append(
            f"| {r['tag']} | {r['m_sq']} | {r['geometry']} | "
            f"{r['gate']:.3f} | {r['deg_mean']:.1f} | {r['deg_max']} | "
            + " | ".join(f"{rec:.4f}" for rec, _ in r["sweep"]) + " |")
    with open("SCALE_PROBE.md", "a") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines[-6:]), flush=True)
    print("appended to SCALE_PROBE.md", flush=True)

    import ann_protocol_json
    for r in results:
        ann_protocol_json.record(
            tool="density_2x2_probe", engine="roar",
            shape=f"single-cell{r['tag']}", qps_basis="kernel-1thread",
            fixture={"n": n, "dim": dim, "mode": "ood", "m": M,
                     "n_query_sets": N_QUERY_SETS, "k": K,
                     "m_sq": r["m_sq"], "m_pjbp": 35, "l_pjpq": 100,
                     "clusters": N_CLUSTERS,
                     "sigma_base": r["sigma_b"], "sigma_q": r["sigma_q"],
                     "gap": 0.8, "mix": 0.35, "geometry": r["geometry"],
                     "deg_mean": round(r["deg_mean"], 1),
                     "deg_max": r["deg_max"],
                     "boot_gate": round(r["gate"], 4)},
            sweep=[(b, rec, q)
                   for b, (rec, q) in zip(BUDGETS, r["sweep"])],
            iso=r["iso"], build_s=r["t_build"],
            notes="density 2x2 attribution cell" + qps_note)
    spark.stop()


if __name__ == "__main__":
    main()
