"""NSG at the reference's own 10M scale — the one unbuilt column of
its three-engine experiment (`scripts/nsg/build_nsg_index.sh` runs NSG
on the 10M datasets; VERDICT r13 directive #1).

Same staged-fixture protocol as `single_index_10m_probe.py` (shares
its DATA_DIR tables, GT, and query sets so the 10M iso-recall table is
like-for-like across engines):

  knn     — the init SELF-kNN graph as a staged ivf_knn table
            (exclude_self, k=100, chunked so per-chunk shuffle spill
            stays bounded — the identical staged-chunk protocol the
            dense roar rebuild used). The reference's efanna stage
            builds K=400 (`build_nsg_index.sh:26-29`); k=100 is the
            same SCALED init the measured 1M column used (labeled —
            the padded K=400 table alone would be 32 GB).
  build   — `nsg.build_nsg(snapshot='mmap', knn=staged)` at the
            reference's NSG params L=60 R=70 C=500
            (`build_nsg_index.sh:33-35`), init table streamed to the
            padded memmap (never collected), tree_grow
            frontier-vectorized (r14). Saved via save_graph.
  search  — the shared-GT budget sweep: NSG fixed per-member beam
            ef = budget/m via the batch kernel's non-adaptive mode
            (one BeamQueue(ef) per member — the same protocol as the
            1M NSG column), recall@10 + single-thread kernel QPS +
            iso-recall interpolation, recorded to ANN_PROTOCOL.json.

Usage: python tools/nsg_10m_probe.py <knn|build|search> [n] [dim]
Env: NSG_CELLS (2048) NSG_NPROBE (16) NSG_K (100) NSG_KNN_CHUNKS (20)
     NSG_BUDGETS NSG_INDEX_DIR (/tmp/nsg10m_index)
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
    _roar_core as core, graph_build, nsg, set_search, simsearch,
)
from cross_modal_multivector_search_spark.operators.brute_force import (
    knn_exact_gemm,
)
from cross_modal_multivector_search_spark.session import get_spark

M = 5
K = 10
CELLS = int(os.environ.get("NSG_CELLS", 2048))
NPROBE = int(os.environ.get("NSG_NPROBE", 16))
KNN_K = int(os.environ.get("NSG_K", 100))
CHUNKS = int(os.environ.get("NSG_KNN_CHUNKS", 20))
N_QUERY_SETS = int(os.environ.get("NSG_QSETS", 100))
BUDGETS = tuple(int(x) for x in os.environ.get(
    "NSG_BUDGETS", "2000,8000,16000,32000,48000").split(","))
INDEX_DIR = os.environ.get("NSG_INDEX_DIR", "/tmp/nsg10m_index")
DATA_DIR = os.environ.get("SI_DATA_DIR", "/tmp/si10m_dense")
OUT = os.environ.get("SI_OUT", "SCALE_PROBE.md")
PARAMS = nsg.NsgParams(l_build=60, r_degree=70, c_pool=500, knn_k=KNN_K)


def phase_knn(spark, n: int, dim: int) -> None:
    """Stage the init self-kNN table: ivf_knn(exclude_self) chunked by
    query id so each chunk's top-k merge spill stays ~1/CHUNKS of the
    whole (the rule of thumb from SCALE_PROBE.md: ~75 GB per 3.2B
    merge rows — k=100 at 10M/16 is 16B rows unchunked)."""
    base = spark.read.parquet(f"{DATA_DIR}/base.parquet")
    tb = base.select(F.col("vec_id").alias("base_id"), "vec")
    tq = base.select(F.col("vec_id").alias("query_id"), "vec")
    stage_t: dict[str, float] = {}

    t0 = time.time()
    cb = simsearch.train_codebook(base, CELLS, iters=10,
                                  sample_n=100_000)
    stage_t["codebook"] = time.time() - t0
    print(f"codebook {CELLS} cells {stage_t['codebook']:.1f}s",
          flush=True)

    t0 = time.time()
    knn_dir = f"{DATA_DIR}/nsg_selfknn.parquet"
    for c in range(CHUNKS):
        simsearch.ivf_knn(
            tq.filter(F.col("query_id") % CHUNKS == c), tb, cb,
            KNN_K, nprobe=NPROBE, exclude_self=True) \
            .write.mode("overwrite" if c == 0 else "append") \
            .parquet(knn_dir)
        print(f"  self-kNN chunk {c + 1}/{CHUNKS} done "
              f"[{time.time() - t0:.1f}s]", flush=True)
        import gc
        gc.collect()
        spark.sparkContext._jvm.System.gc()
    stage_t["ivf_selfknn"] = time.time() - t0
    print(f"self-kNN table {stage_t['ivf_selfknn']:.1f}s "
          f"({CHUNKS} staged chunks) -> {knn_dir}", flush=True)

    # sampled recall gate (~2k queries) against the exact table
    t0 = time.time()
    step = max(1, n // 2000)
    sq = tq.filter(F.col("query_id") % step == 0).cache()
    gate_exact = knn_exact_gemm(sq, tb, KNN_K + 1, metric="ip") \
        .filter(F.col("query_id") != F.col("base_id"))
    gate_boot = spark.read.parquet(knn_dir) \
        .join(sq.select("query_id"), "query_id", "semi")
    gate = simsearch.knn_table_recall(
        gate_boot, gate_exact, KNN_K).collect()[0]["mean_recall"]
    stage_t["gate"] = time.time() - t0
    print(f"self-kNN recall gate (sampled, @{KNN_K}): {gate:.4f} "
          f"[{stage_t['gate']:.1f}s]", flush=True)
    with open("/tmp/nsg10m_knn_stages.txt", "w") as f:
        f.write(repr((n, dim, gate, stage_t)) + "\n")


def phase_build(spark, n: int, dim: int) -> None:
    base = spark.read.parquet(f"{DATA_DIR}/base.parquet")
    knn = spark.read.parquet(f"{DATA_DIR}/nsg_selfknn.parquet")
    pin_path = os.environ.get("NSG_PIN_TREE")
    orig = nsg._tree_grow_seq
    if pin_path:
        # capture the pre-tree_grow state (flat adjacency + ep/beam)
        # so the pintree phase can replay BOTH tree_grow engines on
        # the REAL 10M input and pin them bit-equal offline.
        # (build_nsg dispatches to _tree_grow_seq since r15 — the
        # measured-faster walk — so that is the hook point now.)

        def capture(adj, vecs, ep, beam):
            lens = np.fromiter((len(a) for a in adj), dtype=np.int64,
                               count=len(adj))
            flat = (np.concatenate([a for a in adj if len(a)])
                    if lens.sum() else np.empty(0, dtype=np.int64))
            np.savez(pin_path, lens=lens, flat=flat,
                     ep=np.int64(ep), beam=np.int64(beam))
            print(f"pre-tree state captured -> {pin_path}", flush=True)
            return orig(adj, vecs, ep, beam)

        nsg._tree_grow_seq = capture
    t0 = time.time()
    try:
        idx = nsg.build_nsg(base, PARAMS, knn=knn, n_batches=256,
                            snapshot="mmap")
    finally:
        nsg._tree_grow_seq = orig
    t_build = time.time() - t0
    print(f"nsg build {t_build:.1f}s", flush=True)
    t0 = time.time()
    graph_build.save_graph(idx, spark, INDEX_DIR)
    degs = np.fromiter((len(a) for a in idx.adj), dtype=np.int64)
    print(f"saved to {INDEX_DIR} [{time.time() - t0:.1f}s]; degree "
          f"mean {degs.mean():.1f} max {degs.max()}", flush=True)
    with open("/tmp/nsg10m_build_stages.txt", "w") as f:
        f.write(repr((n, dim, t_build,
                      float(degs.mean()), int(degs.max()))) + "\n")


def phase_search(spark, n: int, dim: int) -> None:
    from hnsw_compare_probe import iso_recall_qps
    from single_index_10m_probe import _rerank_numpy

    base = spark.read.parquet(f"{DATA_DIR}/base.parquet")
    q_all = spark.read.parquet(f"{DATA_DIR}/queries.parquet")
    qsets = q_all.filter(F.col("vec_id") < N_QUERY_SETS * M) \
        .withColumn("set_id", (F.col("vec_id") / M).cast("long"))
    v = base.withColumn("set_id", (F.col("vec_id") / M).cast("long"))

    t0 = time.time()
    idx = graph_build.load_graph(spark, INDEX_DIR, base)
    print(f"load_graph {time.time() - t0:.1f}s", flush=True)

    # the staged GT covers the full 100 query sets; a smaller
    # NSG_QSETS run reads the same file and subsets. ALWAYS compute
    # the staging over all 100 sets (not the current subset) so a
    # subset-first run can never stage a partial table under the
    # full-set name (r14 ADVICE).
    gt_path = f"{DATA_DIR}/gt_k{K}_q100.parquet"
    if not os.path.exists(gt_path):
        q100 = q_all.filter(F.col("vec_id") < 100 * M) \
            .withColumn("set_id", (F.col("vec_id") / M).cast("long"))
        set_search.set_topk_gemm(q100, v, K).select(
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
        f"## 10M SINGLE-index NSG (n = {n:,}, shared OOD fixture, "
        f"m={M}, {N_QUERY_SETS} query sets — r13 directive #1)", "",
    ]
    try:
        with open("/tmp/nsg10m_knn_stages.txt") as f:
            _, _, gate, knn_t = eval(f.read())  # noqa: S307 (own file)
        with open("/tmp/nsg10m_build_stages.txt") as f:
            _, _, t_build, dmean, dmax = eval(f.read())  # noqa: S307
        lines += [
            "Build (reference NSG params L=60 R=70 C=500, "
            f"`build_nsg_index.sh:33-35`; init self-kNN k={KNN_K} — "
            "the reference's K=400 efanna stage SCALED, same k as the "
            "measured 1M column — staged as "
            f"{CHUNKS} ivf_knn chunks, streamed to the padded memmap, "
            "mmap Link snapshot, frontier-vectorized tree_grow): "
            + ", ".join(f"{k} {x:.1f}s" for k, x in knn_t.items())
            + f", passes+tree {t_build:.1f}s; sampled init-table "
            f"recall gate @{KNN_K}: {gate:.4f} ({CELLS} cells, "
            f"nprobe={NPROBE}). Degree mean {dmean:.1f} max {dmax}.",
            "",
        ]
    except OSError:
        pass
    lines += ["| budget | recall@10 | QPS (1-thread kernel) |",
              "|---|---|---|"]

    sweep = []
    for b in BUDGETS:
        ef = max(1, b // M)
        core.batch_multivector_search(
            idx.adj, vecs, qmats[:1], idx.entry_point, ef, ef, ef * M,
            adaptive=False)
        t0 = time.time()
        hits = 0
        all_res = core.batch_multivector_search(
            idx.adj, vecs, qmats, idx.entry_point, ef, ef, ef * M,
            adaptive=False)
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

    import ann_protocol_json
    ann_protocol_json.record(
        tool="nsg_10m_probe", engine="nsg", shape="single",
        qps_basis="kernel-1thread",
        fixture={"n": n, "dim": dim, "mode": "ood", "m": M,
                 "n_query_sets": N_QUERY_SETS, "k": K,
                 "l_build": PARAMS.l_build, "r_degree": PARAMS.r_degree,
                 "c_pool": PARAMS.c_pool, "knn_k": KNN_K,
                 "cells": CELLS, "nprobe": NPROBE,
                 "index_dir": INDEX_DIR},
        sweep=[(b, r, q) for b, (r, q) in zip(BUDGETS, sweep)],
        iso={f"{t:.2f}": iso_recall_qps(sweep, t)
             for t in (0.80, 0.90)},
        notes="init self-kNN k=100 (reference efanna K=400, scaled — "
              "same init as the 1M NSG column)")


def phase_pintree(spark, n: int, dim: int) -> None:
    """Replay BOTH tree_grow engines on the captured pre-tree state of
    the real build (NSG_PIN_TREE during phase build) and pin them
    bit-equal — the directive's 1M pin, run at the build's own scale.
    Contention-safe: the comparison is deterministic; only the printed
    walls depend on box state."""
    pin_path = os.environ.get("NSG_PIN_TREE", "/tmp/nsg10m_pretree.npz")
    z = np.load(pin_path)
    lens, flat = z["lens"], z["flat"]
    ep, beam = int(z["ep"]), int(z["beam"])
    offs = np.concatenate([[0], np.cumsum(lens)])
    base = spark.read.parquet(f"{DATA_DIR}/base.parquet")
    from cross_modal_multivector_search_spark.operators.graph_build \
        import _collect_matrix
    _, vecs = _collect_matrix(base, "vec_id", "vec")
    assert len(lens) == len(vecs)

    def mk_adj():
        return [flat[offs[i]:offs[i + 1]].copy()
                for i in range(len(lens))]

    t0 = time.time()
    a = nsg._tree_grow(mk_adj(), vecs, ep, beam)
    t_vec = time.time() - t0
    t0 = time.time()
    b = nsg._tree_grow_seq(mk_adj(), vecs, ep, beam)
    t_seq = time.time() - t0
    equal = all(np.array_equal(x, y) for x, y in zip(a, b))
    msg = (f"tree_grow pin at n={len(lens):,}: bit_equal={equal}, "
           f"vectorized {t_vec:.1f}s vs sequential walk {t_seq:.1f}s "
           f"({t_seq / max(t_vec, 1e-9):.1f}x)")
    print(msg, flush=True)
    assert equal, "tree_grow engines diverged on the real build state"
    with open(OUT, "a") as f:
        f.write(f"\n{msg} (replayed on the captured pre-tree state of "
                "the real build — NSG_PIN_TREE capture in "
                "tools/nsg_10m_probe.py).\n")


def main() -> None:
    phase = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    spark = get_spark("nsg-10m")
    spark.sparkContext.setLogLevel("ERROR")
    if phase == "knn":
        phase_knn(spark, n, dim)
    elif phase == "build":
        phase_build(spark, n, dim)
    elif phase == "search":
        phase_search(spark, n, dim)
    elif phase == "pintree":
        phase_pintree(spark, n, dim)
    else:
        raise SystemExit(f"unknown phase {phase}")
    spark.stop()


if __name__ == "__main__":
    main()
