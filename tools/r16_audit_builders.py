"""Plan-cache leak audit over every declared query builder (r16,
VERDICT r15 directive #2).

For each `queries()` row: warm once (wrapped — populates the accepted
build-artifact caches), then invoke the RAW builder (`fn.__wrapped__`)
under a unique job group and record
  * jobs_during_build  — Spark jobs the builder itself executed
    (eager work; its output may be folded into the returned plan),
  * eager_plan_nodes   — LocalRelation / LogicalRDD / ExistingRDD
    leaves in the analyzed plan (embedded driver-computed data),
  * skip               — whether the row is on _PLAN_CACHE_SKIP.

A row with eager evidence that is neither skip-listed nor an accepted
declared artifact (index/codebook/PQ/qsets handles, built once per
process like the reference's offline build) is a plan-cache leak.
Prints one JSON line per row plus a summary line.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E
from cross_modal_multivector_search_spark.session import get_spark

EAGER_TOKENS = ("LocalRelation", "LogicalRDD", "ExistingRDD",
                "Scan ExistingRDD")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("cmms-r16-audit")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    qs = E.queries()
    flagged = []
    for name, fn in qs.items():
        raw = getattr(fn, "__wrapped__", fn)
        try:
            fn(spark, sf_dir)          # warm: artifact caches build here
        except Exception as ex:        # noqa: BLE001 — audit must go on
            print(json.dumps({"query": name,
                              "error": f"warm: {ex}"[:200]}), flush=True)
            continue
        group = f"audit-{name}"
        sc.setJobGroup(group, name)
        try:
            df = raw(spark, sf_dir)
        except Exception as ex:        # noqa: BLE001
            print(json.dumps({"query": name,
                              "error": f"build: {ex}"[:200]}), flush=True)
            sc.setLocalProperty("spark.jobGroup.id", None)
            continue
        try:
            sc._jsc.sc().listenerBus().waitUntilEmpty()
        except Exception:
            pass
        sc.setLocalProperty("spark.jobGroup.id", None)
        jobs = len(tracker.getJobIdsForGroup(group))
        try:
            plan = df._jdf.queryExecution().analyzed().toString()
        except Exception:
            plan = ""
        nodes = sorted({t for t in EAGER_TOKENS if t in plan})
        skip = name in E._PLAN_CACHE_SKIP
        rec = {"query": name, "jobs_during_build": jobs,
               "eager_plan_nodes": nodes, "skip": skip}
        print(json.dumps(rec), flush=True)
        if (jobs > 0 or nodes) and not skip:
            flagged.append(name)
    print(json.dumps({"summary_flagged_not_skiplisted": flagged}),
          flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
