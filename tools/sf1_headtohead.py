"""Spark-vs-DuckDB warm head-to-head timing of the headline oracle
twins at an arbitrary sf dir — built for the staged sf1.0 scale-up
(`tools/make_sf1.py`; VERDICT r11 directive #7: the sf0.1 >2x rows are
dominated by Spark's ~0.3-0.5 s/job floor, which amortizes with data
volume — measure the ratio at 10x instead of arguing it).

Per query: 1 warm-up pass then min of N timed reps on each engine,
engines run sequentially (Spark first, all queries; then DuckDB, all
queries) so neither contends with the other. Prints a markdown table
plus totals.

Usage: python tools/sf1_headtohead.py [sf_dir] [reps] [q ...]
Default queries: the bench HEADLINE list minus ANN rows whose oracle
twins are sf0.01-calibrated (verify_oracle.SF001_CALIBRATED).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")

import duckdb

import __spark_entry__ as E
from bench import HEADLINE
from cross_modal_multivector_search_spark.session import get_spark
from verify_oracle import SF001_CALIBRATED, TABLES


def main() -> None:
    qs, oracles = E.queries(), E.oracle_sql()
    args = sys.argv[1:]
    if args and os.path.isdir(args[0]):
        sf_dir = args[0]
        args = args[1:]
    else:
        sf_dir = "/tmp/sf1_data"
        # any first arg that is not a directory must be a rep count or
        # a known query name — a typo'd sf_dir (with or without a '/')
        # errors instead of silently timing the default fixture
        if args and not args[0].isdigit() and args[0] not in oracles:
            raise SystemExit(
                f"first arg {args[0]!r} is not a directory, a rep "
                "count, or a query name")
    reps = int(args[0]) if args and args[0].isdigit() else 3
    if args and args[0].isdigit():
        args = args[1:]
    names = args or [q for q in HEADLINE
                     if q in oracles and q not in SF001_CALIBRATED]
    missing = [q for q in names if q not in oracles]
    assert not missing, f"no oracle twin for {missing}"

    spark = get_spark("sf1-headtohead")
    spark.sparkContext.setLogLevel("ERROR")
    spark_t: dict[str, float] = {}
    qs["token_stats"](spark, sf_dir).count()      # py-worker warmup
    for name in names:
        qs[name](spark, sf_dir).count()           # plan/codegen warmup
        ts = []
        for _ in range(reps):
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            ts.append(time.time() - t0)
        spark_t[name] = min(ts)
        print(f"spark {name}: {spark_t[name]:.2f}s "
              f"(reps {[round(t, 2) for t in ts]})", flush=True)
    spark.stop()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    duck_t: dict[str, float] = {}
    for name in names:
        sql = oracles[name]
        con.execute(sql).fetchall()               # warmup
        ts = []
        for _ in range(reps):
            t0 = time.time()
            con.execute(sql).fetchall()
            ts.append(time.time() - t0)
        duck_t[name] = min(ts)
        print(f"duckdb {name}: {duck_t[name]:.2f}s "
              f"(reps {[round(t, 2) for t in ts]})", flush=True)

    print(f"\n| query | spark s | duckdb s | ratio |")
    print("|---|---|---|---|")
    for name in names:
        s, d = spark_t[name], duck_t[name]
        print(f"| {name} | {s:.2f} | {d:.2f} | "
              f"{s / d if d > 0 else float('inf'):.2f}x |")
    ts_sum, td_sum = sum(spark_t.values()), sum(duck_t.values())
    print(f"| **total ({len(names)} queries)** | **{ts_sum:.2f}** | "
          f"**{td_sum:.2f}** | **{ts_sum / td_sum:.2f}x** |")
    print("\nMethodology note: Spark is timed via .count() (the final "
          "projection can be pruned), DuckDB via fetchall() (full "
          "materialization) — a mild pro-Spark asymmetry; the result "
          "rows here are aggregate-sized, so the materialization "
          "delta is per-query small, but read the ratio with it in "
          "mind (also noted beside the BASELINE.md table).")


if __name__ == "__main__":
    main()
