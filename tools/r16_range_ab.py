"""Interleaved in-session A/B of the search-input partitioning
(VERDICT r15 #3): the probed collision-free slot key ("slot") vs the
r15 plain hash-on-set_id shape ("hash"). Flips
graph_search._balanced_grouped between rounds, clearing the
prepared-plan caches so each arm rebuilds its own plan; warm pass
after each flip is untimed.

Usage: python tools/r16_range_ab.py [sf_dir] [rounds] row1 row2 ...
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E
from pyspark.sql import functions as F
from cross_modal_multivector_search_spark.session import get_spark
from cross_modal_multivector_search_spark.operators import graph_search
from tools.r16_time import timed_rows


def _hash_grouped(query_vecs, set_id):
    """The r15 shape: plain hash repartition on set_id (the __slotkey
    copy keeps the groupBy signature identical)."""
    spark = query_vecs.sparkSession
    p = spark.sparkContext.defaultParallelism
    return query_vecs \
        .withColumn("__slotkey", F.col(set_id)) \
        .repartition(p, F.col("__slotkey"))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else \
        "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        args = args[1:]
    rounds = int(args[0]) if args and args[0].isdigit() else 4
    if args and args[0].isdigit():
        args = args[1:]
    names = args or ["ann_multivector_search", "hnsw_search_b400",
                     "ann_window_search_b1600"]
    spark = get_spark("cmms-range-ab")
    spark.sparkContext.setLogLevel("ERROR")
    timed = timed_rows()
    E.queries()["token_stats"](spark, sf_dir).count()
    E._roar_index(spark, sf_dir)
    E._hnsw_index(spark, sf_dir)

    orig = graph_search._balanced_grouped
    results: dict[str, dict[str, list]] = {
        n: {"slot": [], "hash": []} for n in names}
    for rnd in range(rounds):
        for arm in ("slot", "hash"):
            graph_search._balanced_grouped = (
                orig if arm == "slot" else _hash_grouped)
            E._PLAN_CACHE.clear()
            for n in names:
                timed[n](spark, sf_dir).count()     # warm (plan rebuild)
                t0 = time.time()
                timed[n](spark, sf_dir).count()
                results[n][arm].append(round(time.time() - t0, 3))
    graph_search._balanced_grouped = orig
    for n in names:
        r, h = sorted(results[n]["slot"]), sorted(results[n]["hash"])
        print(json.dumps({"row": n, "slot": results[n]["slot"],
                          "hash": results[n]["hash"],
                          "slot_min": r[0], "hash_min": h[0],
                          "slot_med": r[len(r) // 2],
                          "hash_med": h[len(h) // 2]}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
