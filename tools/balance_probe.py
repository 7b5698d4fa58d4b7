"""Balanced vs plain spatial sharding under real cell-size skew.

Corpus: few well-separated Gaussian blobs, codebook trained with MORE
cells than blobs — the trained cells carve the blobs unevenly, so
plain `spatial_shards` produces the population skew whose quadratic
per-shard build work was the 10M run's residual critical path
(ANN_PROTOCOL 10M section). `spatial_shards_balanced` splits the
oversized cells; this probe measures both builds wall-clock and pins
routed-recall parity.

Usage: python tools/balance_probe.py [n] [dim] [n_cells] [out_md]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
from pyspark.sql import functions as F

from cross_modal_multivector_search_spark.operators import (
    graph_build, recall, rerank, set_search, sharded, simsearch,
)
from cross_modal_multivector_search_spark.operators.sampling import (
    generate_clustered_vectors,
)
from cross_modal_multivector_search_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_cells = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    out = sys.argv[4] if len(sys.argv) > 4 else "SPATIAL_PROBE.md"
    spark = get_spark("balance-probe")
    spark.sparkContext.setLogLevel("ERROR")

    v = (generate_clustered_vectors(spark, n, dim, n_clusters=2,
                                    sigma=0.1)
         .withColumn("set_id", (F.col("vec_id") / 5).cast("long"))
         .repartition(64).cache())
    v.count()
    base = v.select("vec_id", "vec")
    book = simsearch.train_codebook(v, k=n_cells, iters=10,
                                    sample_n=100_000)
    p = graph_build.RoarGraphParams(m_sq=20, m_pjbp=12, l_pjpq=40)

    sb = sharded.spatial_shards(base, book).cache()
    pops = [r["n"] for r in sb.groupBy("shard")
            .agg(F.count("*").alias("n")).collect()]
    t0 = time.time()
    sharded.build_sharded(sb, n_cells, p, shard_col="shard").count()
    t_plain = time.time() - t0

    cap = int(np.median(pops))
    bal, c2s, tot = sharded.spatial_shards_balanced(base, book,
                                                    max_pop=cap)
    bal = bal.cache()
    bal_pops = [r["n"] for r in bal.groupBy("shard")
                .agg(F.count("*").alias("n")).collect()]
    t0 = time.time()
    gb = sharded.build_sharded(bal, tot, p, shard_col="shard").cache()
    gb.count()
    t_bal = time.time() - t0

    # parity at equal routing: a query routed to the same CELLS must
    # recover the same data sets whether the cells are split or not
    # (the generated sets mix blobs, so absolute recall-vs-exact here
    # measures set construction, not sharding — parity is the claim)
    members = base.filter(F.col("vec_id") < 50) \
        .withColumn("set_id", (F.col("vec_id") / 5).cast("long"))
    nprobe = max(1, n_cells // 2)
    work = sharded.prepare_search_work(gb, bal, tot,
                                       shard_col="shard").cache()
    work.count()
    work_p = sharded.prepare_search_work(
        sharded.build_sharded(sb, n_cells, p, shard_col="shard"),
        sb, n_cells, shard_col="shard").cache()
    work_p.count()

    def topsets(wrk, nsh, routes, basedf):
        cands = sharded.search_sharded(None, basedf, members, min_pq=5,
                                       max_pq=1000, budget=1000,
                                       n_shards=nsh, work=wrk,
                                       routes=routes)
        res = rerank.rerank(cands.select("query_set_id", "base_vec_id"),
                            members, v, 10, m=5)
        return {(r["query_set_id"], r["data_set_id"])
                for r in res.select("query_set_id",
                                    "data_set_id").collect()}

    bal_sets = topsets(work, tot,
                       sharded.route_query_sets(members, book,
                                                nprobe=nprobe,
                                                cell_to_shards=c2s),
                       bal.select("vec_id", "vec"))
    plain_sets = topsets(work_p, n_cells,
                         sharded.route_query_sets(members, book,
                                                  nprobe=nprobe),
                         sb.select("vec_id", "vec"))
    inter = len(bal_sets & plain_sets)
    parity = inter / max(len(plain_sets), 1)

    lines = [
        "",
        f"## Balanced vs plain spatial shards (n={n:,}, {n_cells} "
        "trained cells over 2 blobs)",
        "",
        f"Plain cell populations min/median/max = {min(pops):,}/"
        f"{int(np.median(pops)):,}/{max(pops):,} "
        f"(skew {max(pops) / np.median(pops):.1f}x median) -> build "
        f"{t_plain:.1f}s, critical path = the largest cell's quadratic "
        "kNN. Balanced at max_pop=median: "
        f"{tot} sub-shards, max population {max(bal_pops):,} -> build "
        f"{t_bal:.1f}s (**{t_plain / t_bal:.1f}x faster**). Routed top-10 "
        f"data-set overlap plain-vs-balanced at nprobe={nprobe}: "
        f"{parity:.2f} (same cells probed -> same reachable vectors; "
        "exact parity at saturating budget is unit-pinned).",
    ]
    with open(out, "a") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    spark.stop()


if __name__ == "__main__":
    main()
