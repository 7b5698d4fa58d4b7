"""Per-query Spark job/stage counts + warm timing — the floor
decomposition tool (VERDICT r4 directive #5).

Usage: python tools/job_count.py [sf_dir] q1 q2 ...
One JSON line per query: jobs launched, stages, warm seconds.
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
    spark = get_spark("cmms-jobcount")
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker()
    qs = E.queries()
    qs["token_stats"](spark, sf_dir).count()
    for name in args:
        qs[name](spark, sf_dir).count()      # warm pass
        before_jobs = len(tracker.getJobIdsForGroup(None))
        t0 = time.time()
        qs[name](spark, sf_dir).count()
        sec = round(time.time() - t0, 3)
        job_ids = tracker.getJobIdsForGroup(None)
        new_jobs = len(job_ids) - before_jobs
        n_stages = 0
        for jid in sorted(job_ids)[-new_jobs:] if new_jobs else []:
            info = tracker.getJobInfo(jid)
            if info is not None:
                n_stages += len(info.stageIds)
        print(json.dumps({"query": name, "jobs": new_jobs,
                          "stages": n_stages, "sec": sec}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
