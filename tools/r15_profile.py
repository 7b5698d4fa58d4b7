"""Per-query stage-level profile: where does each bench row's wall go?

Usage: python tools/r15_profile.py [sf_dir] q1 q2 ...
       (no names = the full bench timed set incl. hnsw_b400 /
        ann_window_b1600)

For each query: one warm pass, one timed pass under a unique job group,
then the Spark UI REST API is read for every job/stage of that group.
Prints one JSON line per query:
  {"query", "sec", "n_jobs", "stages": [{"id", "name", "tasks",
   "run_ms", "wall_ms", "in_mb", "sh_r_mb", "sh_w_mb"}, ...]}
run_ms = summed executor task time (CPU-ish), wall_ms = stage
submission->completion. A stage with tasks=1 and large run_ms on a
32-core box is a serialization point (guide §2.5/§2.6).
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E
from cross_modal_multivector_search_spark.session import get_spark


def _rest(path: str):
    url = f"http://localhost:4040/api/v1{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else \
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if args and os.path.isdir(args[0]):
        args = args[1:]
    spark = get_spark("cmms-r15-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    qs = E.queries()

    from cross_modal_multivector_search_spark.operators import hnsw as _h
    from cross_modal_multivector_search_spark.operators import (
        graph_search as _gs,
    )

    def hnsw_b400(spark, sf_dir):
        index = E._hnsw_index(spark, sf_dir)
        q, v = E._queries_norm(spark, sf_dir)
        return _h.search_and_rerank_hnsw(index, q, v, E.K, budget=400,
                                         m=E.M)

    def ann_window_b1600(spark, sf_dir):
        index = E._roar_index(spark, sf_dir)
        q, v = E._queries_norm(spark, sf_dir)
        return _gs.search_and_rerank(
            index, q, v, E.K,
            _gs.SearchParams(min_pq=5, max_pq=1600, budget=1600), m=E.M)

    import bench
    timed = {name: qs[name] for name in bench.HEADLINE}
    timed["hnsw_search_b400"] = hnsw_b400
    timed["ann_window_search_b1600"] = ann_window_b1600
    names = args or list(timed)

    qs["token_stats"](spark, sf_dir).count()
    qs["knn_ip_topk_gemm"](spark, sf_dir).count()
    # build/load the indexes outside any timed group (bench does the same)
    E._roar_index(spark, sf_dir)
    E._sharded_work(spark, sf_dir)
    E._hnsw_index(spark, sf_dir)

    app_id = sc.applicationId
    for name in names:
        fn = timed[name]
        fn(spark, sf_dir).count()          # warm pass
        group = f"prof-{name}"
        sc.setJobGroup(group, name)
        t0 = time.time()
        fn(spark, sf_dir).count()
        sec = round(time.time() - t0, 3)
        try:
            sc._jsc.sc().listenerBus().waitUntilEmpty()
        except Exception:
            pass
        sc.setLocalProperty("spark.jobGroup.id", None)
        jobs = [j for j in _rest(f"/applications/{app_id}/jobs")
                if j.get("jobGroup") == group]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        stages = []
        for sid in stage_ids:
            try:
                infos = _rest(f"/applications/{app_id}/stages/{sid}")
            except Exception:
                continue
            for si in infos:
                if si.get("status") not in ("COMPLETE", "SKIPPED"):
                    continue
                wall = 0
                try:
                    from datetime import datetime
                    fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                    sub = datetime.strptime(si["submissionTime"], fmt)
                    comp = datetime.strptime(si["completionTime"], fmt)
                    wall = int((comp - sub).total_seconds() * 1000)
                except Exception:
                    pass
                stages.append({
                    "id": sid,
                    "name": si.get("name", "")[:60],
                    "tasks": si.get("numCompleteTasks", 0),
                    "run_ms": si.get("executorRunTime", 0),
                    "wall_ms": wall,
                    "in_mb": round(si.get("inputBytes", 0) / 1e6, 2),
                    "sh_r_mb": round(si.get("shuffleReadBytes", 0) / 1e6, 2),
                    "sh_w_mb": round(si.get("shuffleWriteBytes", 0) / 1e6, 2),
                })
        stages.sort(key=lambda s: -s["wall_ms"])
        print(json.dumps({"query": name, "sec": sec, "n_jobs": len(jobs),
                          "stages": stages}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
