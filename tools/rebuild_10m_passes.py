"""Rebuild the 10M single index's LinkProjection passes from the
STAGED train-kNN table with different graph-density params — the
cheap half of the build (the staged `ivf_knn` chunks are the ~45 min
stage; the passes are minutes), so the density → recall@budget lever
can be measured without re-paying the kNN stage.

Why: the engine's cross-scale probe params (m_sq=20, M_pjbp=12,
L_pjpq=40) produce a sparse projection graph (10M build: mean degree
2.3), while the reference builds its 10M headline index denser
(`scripts/roargraph/build_roargraph_index.sh:26-28`: M_SQ=100,
M_PJBP=35, L_PJPQ=100). M_pjbp/L_pjpq only shape the prune passes —
they can be raised over the same k=20 co-retrieval table; M_SQ=100
would need a 5x wider kNN table (re-run the staged chunks to widen).

Usage: python tools/rebuild_10m_passes.py [m_pjbp] [l_pjpq] [out_index_dir]
Env: SI_DATA_DIR (staged fixture + knn_boot.parquet), SI_MSQ (20)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")

import numpy as np

from cross_modal_multivector_search_spark.operators import graph_build
from cross_modal_multivector_search_spark.session import get_spark

import single_index_10m_probe as SI


def main() -> None:
    m_pjbp = int(sys.argv[1]) if len(sys.argv) > 1 else 35
    l_pjpq = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    out_dir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/roar10m_dense"

    spark = get_spark("rebuild-10m-passes")
    spark.sparkContext.setLogLevel("ERROR")
    base, train, _ = SI.fixture(spark, 0, 0)
    knn_boot = spark.read.parquet(f"{SI.DATA_DIR}/knn_boot.parquet")
    p = graph_build.RoarGraphParams(
        m_sq=SI.P.m_sq, m_pjbp=m_pjbp, l_pjpq=l_pjpq)

    t0 = time.time()
    idx = graph_build.build_roargraph_dist(
        base, train, p, train_knn=knn_boot, n_batches=256)
    t_passes = time.time() - t0
    degs = np.fromiter((len(a) for a in idx.adj), dtype=np.int64)
    print(f"passes {t_passes:.1f}s (m_pjbp={m_pjbp} l_pjpq={l_pjpq}); "
          f"degree mean {degs.mean():.1f} max {degs.max()}",
          flush=True)
    t0 = time.time()
    graph_build.save_graph(idx, spark, out_dir)
    print(f"saved to {out_dir} [{time.time() - t0:.1f}s]", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
