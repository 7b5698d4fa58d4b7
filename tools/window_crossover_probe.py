"""Window-vs-sorted beam-engine crossover on the REAL 1M OOD fixture
(VERDICT r13 directive #5): the 512 auto-dispatch threshold
(`_roar_core.WINDOW_ENGINE_MIN_PQ`) was measured on a synthetic
100k random graph (tools/beam_engine_probe.py); this probe re-measures
the crossover on the same 1M clustered-OOD fixture + ivf-bootstrapped
RoarGraph the head-to-head tables use, so the constant is justified on
the engine's own operating regime, not just the synthetic probe graph.

Per budget b: `batch_multivector_search` (adaptive, min_pq=5,
max_pq=b, budget=b) timed with engine="sorted" and engine="window"
(one untimed warmup each), results asserted BIT-EQUAL cell by cell,
recall computed once against the exact set-level GT. Appends a table
to ANN_PROTOCOL.md and records both engines in ANN_PROTOCOL.json.

Usage: python tools/window_crossover_probe.py [n] [dim]
Env: WX_BUDGETS (300,400,512,640,800,1024,1600,2560)
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
from cross_modal_multivector_search_spark.operators.sampling import (
    generate_clustered_vectors, generate_crossmodal_queries,
)
from cross_modal_multivector_search_spark.session import get_spark

M = 5
K = 10
N_QUERY_SETS = 100
N_CLUSTERS = 64
BUDGETS = tuple(int(x) for x in os.environ.get(
    "WX_BUDGETS", "300,400,512,640,800,1024,1600,2560").split(","))
P = graph_build.RoarGraphParams(m_sq=20, m_pjbp=12, l_pjpq=40)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark("window-crossover")
    spark.sparkContext.setLogLevel("ERROR")

    # the 1M head-to-head fixture (ANN_PROTOCOL.md params, verbatim)
    v = generate_clustered_vectors(spark, n, dim, N_CLUSTERS,
                                   sigma=0.15) \
        .select("vec_id", "vec") \
        .withColumn("set_id", (F.col("vec_id") / M).cast("long")) \
        .repartition(32).cache()
    v.count()
    base = v.select("vec_id", "vec")
    q_all = generate_crossmodal_queries(
        spark, n + N_QUERY_SETS * M, dim, N_CLUSTERS,
        sigma=0.10, gap=0.8, mix=0.35).repartition(32).cache()
    q_all.count()
    qsets = q_all.filter(F.col("vec_id") < N_QUERY_SETS * M) \
        .withColumn("set_id", (F.col("vec_id") / M).cast("long"))
    train = q_all.filter(F.col("vec_id") >= N_QUERY_SETS * M)

    t0 = time.time()
    tq = train.select(F.col("vec_id").alias("query_id"), "vec")
    tb = base.select(F.col("vec_id").alias("base_id"), "vec")
    cb = simsearch.train_codebook(base, 256, iters=10, sample_n=100_000)
    knn_boot = simsearch.ivf_knn(tq, tb, cb, P.m_sq, nprobe=8).cache()
    knn_boot.count()
    idx = graph_build.build_roargraph_dist(base, train, P,
                                           train_knn=knn_boot)
    print(f"roar build {time.time() - t0:.1f}s", flush=True)

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

    lines = [
        "",
        f"## Window-engine crossover on the REAL {n:,} OOD fixture "
        "(r13 directive #5)", "",
        "Same fixture/generator/build as the 1M head-to-head table; "
        "per budget, `batch_multivector_search` (adaptive, min_pq=5, "
        "max_pq=budget) timed under engine='sorted' vs 'window', one "
        "untimed warmup each, outputs asserted bit-equal per cell. "
        f"{N_QUERY_SETS} query sets, m={M}, single-thread kernel.", "",
        "| budget | recall@10 | sorted s | window s | speedup |",
        "|---|---|---|---|---|",
    ]
    sweeps = {"sorted": [], "window": []}
    for b in BUDGETS:
        res = {}
        t_cell = {}
        for eng in ("sorted", "window"):
            core.batch_multivector_search(
                idx.adj, vecs, qmats[:2], idx.entry_point, 5, b, b,
                True, engine=eng)
            t0 = time.time()
            res[eng] = core.batch_multivector_search(
                idx.adj, vecs, qmats, idx.entry_point, 5, b, b, True,
                engine=eng)
            t_cell[eng] = time.time() - t0
        for rs, rw in zip(res["sorted"], res["window"]):
            assert len(rs) == len(rw)
            for (i1, d1), (i2, d2) in zip(rs, rw):
                assert np.array_equal(i1, i2) and np.array_equal(d1, d2)
        hits = 0
        for s, (qm, r) in enumerate(zip(qmats, res["sorted"])):
            cands = np.concatenate([ids for ids, _ in r])
            top = _rerank_numpy(idx.ids[cands], qm, vecs)
            hits += len(set(top.tolist()) & gt[s])
        rec = hits / (N_QUERY_SETS * K)
        for eng in ("sorted", "window"):
            sweeps[eng].append((rec, N_QUERY_SETS / t_cell[eng]))
        lines.append(
            f"| {b} | {rec:.4f} | {t_cell['sorted']:.2f} | "
            f"{t_cell['window']:.2f} | "
            f"{t_cell['sorted'] / t_cell['window']:.2f}x |")
        print(lines[-1], flush=True)

    with open("ANN_PROTOCOL.md", "a") as f:
        f.write("\n".join(lines) + "\n")
    print("appended to ANN_PROTOCOL.md", flush=True)

    import ann_protocol_json
    for eng in ("sorted", "window"):
        ann_protocol_json.record(
            tool="window_crossover_probe", engine=f"roar-{eng}",
            shape="single", qps_basis="kernel-1thread",
            fixture={"n": n, "dim": dim, "mode": "ood", "m": M,
                     "n_query_sets": N_QUERY_SETS, "k": K,
                     "m_sq": P.m_sq, "clusters": N_CLUSTERS,
                     "sigma_base": 0.15, "sigma_q": 0.10, "gap": 0.8,
                     "mix": 0.35},
            sweep=[(b, r, q) for b, (r, q) in zip(BUDGETS, sweeps[eng])],
            iso={f"{t:.2f}": iso_recall_qps(sweeps[eng], t)
                 for t in (0.80, 0.90)},
            notes="engine crossover pair — outputs asserted bit-equal "
                  "cell by cell; compare roar-sorted vs roar-window "
                  "QPS at the same budget")
    spark.stop()


if __name__ == "__main__":
    main()
