"""Pre-gate the ivf_knn (cells, nprobe) choice for a big single-index
build WITHOUT paying the full train-kNN table: run `simsearch.ivf_knn`
on a ~2k-query SAMPLE of the staged train set against the FULL staged
base for each candidate config, compare to the exact sampled table,
and report gate recall + measured sample wall. The printed full-table
extrapolation is a LOOSE UPPER BOUND: with ~2k queries spread over
cells x nprobe cell-groups, per-cell GEMM batches are degenerate (a
handful of queries each) and per-task overhead dominates, so the
per-query cost is far above the full run's (measured r12 at 10M:
sample extrapolation said 1745 min, the real chunked table took 45
min — 39x less). Use the gate RECALL from this probe and estimate
wall from FLOPs against a measured run instead: t ~= n_q * nprobe *
(n_base / cells) * dim / 1.15e13 FLOPs/s on this box.

Usage: python tools/ivf_pregate_probe.py [n_sample] [cfg1 cfg2 ...]
       cfg = cells:nprobe, e.g. 1024:8 2048:12
Env: SI_DATA_DIR (staged fixture, see single_index_10m_probe.py),
     SI_MSQ (k for the table, default 20)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")

from pyspark.sql import functions as F

from cross_modal_multivector_search_spark.operators import simsearch
from cross_modal_multivector_search_spark.operators.brute_force import (
    knn_exact_gemm,
)
from cross_modal_multivector_search_spark.session import get_spark

DATA_DIR = os.environ.get("SI_DATA_DIR", "/tmp/si10m_data")
K = int(os.environ.get("SI_MSQ", 20))


def main() -> None:
    n_sample = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    cfgs = [tuple(int(x) for x in c.split(":")) for c in sys.argv[2:]] \
        or [(1024, 8), (2048, 8), (2048, 16), (4096, 16)]

    spark = get_spark("ivf-pregate")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(f"{DATA_DIR}/base.parquet")
    q_all = spark.read.parquet(f"{DATA_DIR}/queries.parquet")
    tb = base.select(F.col("vec_id").alias("base_id"), "vec").cache()
    n = tb.count()
    n_q_total = q_all.count()
    step = max(1, n_q_total // n_sample)
    sq = q_all.select(F.col("vec_id").alias("query_id"), "vec") \
        .filter(F.col("query_id") % step == 0).cache()
    n_sq = sq.count()
    print(f"base n={n:,}; sampled {n_sq:,} of {n_q_total:,} train "
          f"queries (step {step})", flush=True)

    t0 = time.time()
    exact = knn_exact_gemm(sq, tb, K, metric="ip").cache()
    exact.count()
    print(f"exact sampled table {time.time() - t0:.1f}s", flush=True)
    dim = len(tb.select("vec").head()["vec"])

    for cells, nprobe in cfgs:
        t0 = time.time()
        cb = simsearch.train_codebook(base, cells, iters=10,
                                      sample_n=100_000)
        t_cb = time.time() - t0
        t0 = time.time()
        boot = simsearch.ivf_knn(sq, tb, cb, K, nprobe=nprobe).cache()
        boot.count()
        t_boot = time.time() - t0
        gate = simsearch.knn_table_recall(boot, exact, K) \
            .collect()[0]["mean_recall"]
        est_full = t_boot * n_q_total / n_sq
        flops = n_q_total * nprobe * (n / cells) * dim
        print(f"cells={cells:5d} nprobe={nprobe:3d}: gate@{K} "
              f"{gate:.4f}  codebook {t_cb:.1f}s  sample table "
              f"{t_boot:.1f}s  -> full-table <= {est_full / 60:.0f} "
              f"min (loose; FLOPs-based ~{flops / 1.15e13 / 60:.0f} "
              "min — see module docstring)", flush=True)
        boot.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
