"""Run bench.py three times and append a builder-side min/median record
to PROGRESS.jsonl (VERDICT r4 directive #8: make round-over-round BENCH
deltas interpretable against this box's 2-4x per-query noise).

Usage: python tools/bench3.py [n_reps]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    runs = []
    for n in range(reps):
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, text=True, cwd=REPO)
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("{")][-1]
        parsed = json.loads(line)
        runs.append(parsed)
        print(f"run {n}: total={parsed['value']} "
              f"canary={parsed['canary_nation_revenue_sec']}", flush=True)
    totals = sorted(r["value"] for r in runs)
    rec = {
        "ts": time.time(),
        "kind": "builder_bench_3run",
        "totals": [r["value"] for r in runs],
        "min": totals[0],
        "median": totals[len(totals) // 2],
        "canaries": [r["canary_nation_revenue_sec"] for r in runs],
        "per_query_min": {
            q: min(r["queries"][q] for r in runs)
            for q in runs[0]["queries"]
        },
        # r11: per-query Spark job counts (plan drift vs box noise —
        # VERDICT r10 #3); identical across reps unless a plan changed
        "job_counts": runs[-1].get("job_counts", {}),
    }
    with open(os.path.join(REPO, "PROGRESS.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps({k: rec[k] for k in
                      ("totals", "min", "median", "canaries")}))


if __name__ == "__main__":
    main()
