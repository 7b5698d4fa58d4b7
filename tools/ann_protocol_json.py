"""Machine-readable twin of the ANN_PROTOCOL.md tables (VERDICT r12
directive #5): every sweep a head-to-head tool publishes as markdown
also lands as a structured record in ANN_PROTOCOL.json, so rounds can
diff sweeps the way BENCH_r{N}.json is diffed.

File format: one JSON object {"records": [...]} — each record is one
(engine x table) sweep with the fixture parameters, build wall,
(budget, recall, qps) points, iso-recall interpolations, and the QPS
basis ("kernel-1thread" for single-thread kernel timing, "spark-jobs"
for fan-out walls that include the per-job floor — the label the md
tables carry in prose).
"""

from __future__ import annotations

import json
import os
import time

PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "ANN_PROTOCOL.json")


def record(tool: str, fixture: dict, engine: str, shape: str,
           qps_basis: str, sweep: list, iso: dict,
           build_s: float | None = None, notes: str = "",
           path: str | None = None) -> None:
    """Append one sweep record.

    sweep: [(budget, recall, qps), ...] in budget order.
    iso:   {"0.80": qps_or_None, "0.90": qps_or_None}.
    """
    path = path or PATH
    doc = {"records": []}
    if os.path.exists(path):
        # a concurrent writer mid-os.replace (or a truncated file from
        # a killed run) must not be clobbered: keep the unreadable file
        # and fail loudly instead of overwriting it with a fresh doc
        with open(path) as f:
            raw = f.read()
        try:
            doc = json.loads(raw)
        except ValueError as e:
            raise RuntimeError(
                f"{path} exists but is not parseable JSON ({e}); "
                "refusing to overwrite — inspect/repair it first") from e
    doc["records"].append({
        "ts": round(time.time(), 1),
        "tool": tool,
        "fixture": fixture,
        "engine": engine,
        "shape": shape,
        "qps_basis": qps_basis,
        "build_s": None if build_s is None else round(build_s, 1),
        "sweep": [{"budget": int(b), "recall": round(float(r), 4),
                   "qps": round(float(q), 3)} for b, r, q in sweep],
        "iso_recall_qps": {k: (None if v is None else round(float(v), 3))
                           for k, v in iso.items()},
        "notes": notes,
    })
    # atomic publish: a reader (or concurrent recorder) never sees a
    # partially written file — write a sibling temp then os.replace
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(doc, f, indent=1)
    os.replace(tmp, path)
    print(f"recorded {tool}/{engine} sweep -> {path}", flush=True)
