"""Ad-hoc per-query warm timing: 1 warm pass + N timed reps.

Usage: python tools/quick_time.py [sf_dir] [reps] q1 q2 ...
Prints one JSON line per query with all rep timings (min/median visible)
— the VERDICT r4 protocol for interpreting this box's 2-4x noise.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E
from cross_modal_multivector_search_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else \
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if args and os.path.isdir(args[0]):
        args = args[1:]
    reps = int(args[0]) if args and args[0].isdigit() else 3
    if args and args[0].isdigit():
        args = args[1:]
    names = args
    spark = get_spark("cmms-quicktime")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    qs["token_stats"](spark, sf_dir).count()   # py-worker warmup
    for name in names:
        qs[name](spark, sf_dir).count()        # plan/codegen warmup
        ts = []
        for _ in range(reps):
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            ts.append(round(time.time() - t0, 3))
        srt = sorted(ts)
        print(json.dumps({"query": name, "reps": ts,
                          "min": srt[0], "median": srt[len(srt) // 2]}),
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
