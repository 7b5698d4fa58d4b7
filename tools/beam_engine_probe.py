"""Measure the sorted-pool vs window-pool kernel crossover that sets
`_roar_core.WINDOW_ENGINE_MIN_PQ` (the engine="auto" dispatch).

Both engines are bit-equal to the sequential queue (pinned by
tests/test_beam_window.py); this probe is purely a cost-model
measurement: per-budget wall time of `batch_multivector_search` on a
fixed synthetic graph, one process, single-threaded NumPy kernels.

The fixture is a degree-bounded random graph over clustered unit
vectors — the cost drivers (pool width L, wave count, neighbor fan)
match the real RoarGraph shape; recall itself is irrelevant here.
The 1M/10M iso-recall QPS claims are NOT taken from this probe; they
come from the real-fixture sweeps (tools/ann_protocol_1m.py,
single_index_10m_probe.py).

Usage: python tools/beam_engine_probe.py [n] [budgets_csv]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from cross_modal_multivector_search_spark.operators import (  # noqa: E402
    _roar_core as core,
)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    budgets = [int(x) for x in (sys.argv[2].split(",") if len(sys.argv) > 2
               else (100, 200, 400, 800, 1600, 3200, 6400, 12800))]
    d, deg, n_sets, m = 64, 16, 20, 5
    rng = np.random.default_rng(1234)
    centers = rng.standard_normal((64, d))
    vecs = centers[rng.integers(0, 64, size=n)] \
        + 0.15 * rng.standard_normal((n, d))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    adj = [rng.choice(n, size=deg, replace=False) for i in range(n)]
    adj = [a[a != i] for i, a in enumerate(adj)]
    sets = [vecs[rng.integers(0, n, size=m)] + 0.05
            * rng.standard_normal((m, d)) for _ in range(n_sets)]
    sets = [q / np.linalg.norm(q, axis=1, keepdims=True) for q in sets]

    rows = []
    print(f"n={n} deg={deg} {n_sets} sets x m={m}  "
          f"(one warm + one timed pass per cell)")
    print("| budget | sorted s | window s | window speedup |")
    print("|---|---|---|---|")
    for b in budgets:
        cell = {"budget": b}
        for eng in ("sorted", "window"):
            core.batch_multivector_search(adj, vecs, sets[:2], 3, 5, b, b,
                                          True, engine=eng)
            t0 = time.time()
            res = core.batch_multivector_search(adj, vecs, sets, 3, 5, b,
                                                b, True, engine=eng)
            cell[eng] = time.time() - t0
            cell[f"emitted_{eng}"] = int(
                sum(len(ids) for s_ in res for ids, _ in s_))
        assert cell["emitted_sorted"] == cell["emitted_window"]
        rows.append(cell)
        print(f"| {b} | {cell['sorted']:.2f} | {cell['window']:.2f} | "
              f"{cell['sorted'] / cell['window']:.2f}x |", flush=True)
    print(json.dumps({"probe": "beam_engine_crossover", "n": n,
                      "rows": rows}))


if __name__ == "__main__":
    main()
