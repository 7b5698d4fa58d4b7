"""Trained-quantizer IVF probe at 1M vectors.

The round-3 IVF probe swept untrained random-hyperplane cells over
uniform Gaussians — the worst case twice over (no cluster structure to
find, and no training to find it with), giving recall@10 0.18-0.43.
This probe runs the realistic configuration: mixture-of-Gaussians data
(real embedding corpora cluster) and a k-means codebook trained on a
bounded sample (`train_codebook`), assigned distributively
(`assign_cells`), then the same declarative `ivf_search` sweep.

Appends the result table to SCALE_PROBE.md (or prints with out='-').
Usage: python tools/ivf_trained_probe.py [n] [dim] [cells] [out_md] [sigma]

sigma is the mixture's per-dim noise scale: at dim=64, sigma=0.2 gives
noise norm ~1.6 vs ~1.41 expected center separation (clusters overlap —
barely-clustered data), sigma=0.1 gives ~0.8 (clearly clustered).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from cross_modal_multivector_search_spark.operators import (
    brute_force, simsearch,
)
from cross_modal_multivector_search_spark.operators.sampling import (
    generate_clustered_vectors,
)
from cross_modal_multivector_search_spark.session import get_spark

N_QUERIES = 100
K = 10


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_cells = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    out = sys.argv[4] if len(sys.argv) > 4 else "SCALE_PROBE.md"
    sigma = float(sys.argv[5]) if len(sys.argv) > 5 else 0.2
    mixture_k = n_cells  # as many true clusters as codebook cells

    spark = get_spark("ivf-trained-probe")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    v = generate_clustered_vectors(spark, n, dim, mixture_k,
                                   sigma=sigma).drop("cluster")
    v = v.repartition(32).cache()
    v.count()
    t_gen = time.time() - t0

    t0 = time.time()
    codebook = simsearch.train_codebook(v, n_cells, iters=10,
                                        sample_n=100_000)
    t_train = time.time() - t0

    t0 = time.time()
    assigned = v.join(simsearch.assign_cells(v, codebook), "vec_id") \
        .select("vec_id", "cell", "vec").cache()
    assigned.count()
    t_assign = time.time() - t0

    cents = simsearch.codebook_df(spark, codebook)

    q = v.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "vec")
    b = v.select(F.col("vec_id").alias("base_id"), "vec")
    gt = brute_force.knn_exact_gemm(q, b, K, metric="ip").select(
        "query_id", "base_id").cache()
    gt.count()

    lines = [
        "",
        f"## IVF with a TRAINED codebook at n = {n:,} "
        f"(mixture-of-Gaussians data, sigma={sigma})",
        "",
        f"{mixture_k}-component seeded mixture (`generate_clustered_"
        f"vectors`), k-means codebook trained on a 100k sample in "
        f"{t_train:.1f}s (`train_codebook` — bounded driver work, "
        f"corpus-size-independent), full corpus assigned by one "
        f"distributed GEMM pass in {t_assign:.1f}s (`assign_cells`); "
        f"data generated in {t_gen:.1f}s. Recall vs exact GEMM kNN over "
        f"{N_QUERIES} queries:",
        "",
        "| nprobe | wall | recall@10 |",
        "|---|---|---|",
    ]
    for nprobe in (4, 8, 16, 32):
        t0 = time.time()
        res = simsearch.ivf_search(q, assigned, cents, nprobe, K,
                                   cell_col="cell", base_id="vec_id")
        res = res.select("query_id", F.col("vec_id").alias("base_id"))
        hits = res.join(gt, ["query_id", "base_id"]).count()
        dt = time.time() - t0
        rec = hits / (N_QUERIES * K)
        lines.append(f"| {nprobe} | {dt:.1f}s | {rec:.2f} |")
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
