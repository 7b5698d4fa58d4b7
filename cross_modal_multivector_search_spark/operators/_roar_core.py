"""Pure-NumPy core of the RoarGraph algorithms (no Spark imports).

These functions run *inside* Arrow-batched UDFs; Spark parallelizes across
queries / build nodes / shards, never across graph hops (traversal is
inherently sequential — SURVEY §7 "what's hard" #1).

Parity targets (semantics, not line-by-line translation):
  * bounded sorted beam queue with dup rejection + closest-unexpanded
    cursor: `/root/reference/include/efanna2e/neighbor.h:137-226`
  * RNG-style occlusion prune, 2 passes + backfill:
    `/root/reference/src/index_bipartite.cpp:1614-1696`
    (pass-3 variant without backfill: `:1848-1942`)
  * single-vector beam search: `/root/reference/src/index_bipartite.cpp:2313-2422`
  * multi-vector search with adaptive beam-budget allocation:
    `/root/reference/src/index_bipartite.cpp:2424-2544` (gap heuristic
    `:2491-2519`; equal split `:2454-2457`)
  * pass-3 internal search over the supply graph (records every expanded
    node): `/root/reference/src/index_bipartite.cpp:1281-1352`

Distances are negated inner products on normalized rows (smaller=closer),
the reference's convention (`include/efanna2e/distance.h:222`).
"""

from __future__ import annotations

import numpy as np


class BeamQueue:
    """Bounded sorted candidate list with an unexpanded-node cursor."""

    __slots__ = ("cap", "ids", "dists", "expanded", "size", "cur")

    def __init__(self, capacity: int):
        self.cap = capacity
        self.ids = np.empty(capacity + 1, dtype=np.int64)
        self.dists = np.empty(capacity + 1, dtype=np.float64)
        self.expanded = np.zeros(capacity + 1, dtype=bool)
        self.size = 0
        self.cur = 0

    def insert(self, nid: int, dist: float) -> None:
        if self.size == self.cap and dist >= self.dists[self.size - 1]:
            return
        lo = int(np.searchsorted(self.dists[:self.size], dist, side="left"))
        # dup-id rejection anywhere in the equal-distance run / whole list
        if nid in self.ids[:self.size]:
            return
        hi = min(self.size + 1, self.cap)
        self.ids[lo + 1:hi + 1] = self.ids[lo:hi]
        self.dists[lo + 1:hi + 1] = self.dists[lo:hi]
        self.expanded[lo + 1:hi + 1] = self.expanded[lo:hi]
        self.ids[lo] = nid
        self.dists[lo] = dist
        self.expanded[lo] = False
        if self.size < self.cap:
            self.size += 1
        if lo < self.cur:
            self.cur = lo

    def has_unexpanded(self, k: int | None = None) -> bool:
        lim = self.size if k is None else min(k, self.size)
        return self.cur < lim

    def closest_unexpanded(self) -> tuple[int, float]:
        pre = self.cur
        self.expanded[pre] = True
        while self.cur < self.size and self.expanded[self.cur]:
            self.cur += 1
        return int(self.ids[pre]), float(self.dists[pre])


def neg_ip(vecs: np.ndarray, ids, query: np.ndarray) -> np.ndarray:
    """Negated inner-product distances of vecs[ids] vs query."""
    return -(vecs[ids] @ query)


def occlusion_prune(cand_ids: np.ndarray, cand_dists: np.ndarray,
                    vecs: np.ndarray, m_degree: int,
                    exclude: int = -1, backfill: bool = True,
                    seed_skip: set | None = None) -> list[int]:
    """RNG-style occlusion prune of a candidate pool.

    Candidates sorted by distance-to-target; p is occluded if some chosen
    r satisfies d(p, r) < d(p, target). Two passes (the second identical
    with slack 1.0 — kept for parity), then optional nearest-first
    backfill to reach m_degree. ``seed_skip``: ids the first seed pick
    must skip (pass-3 skips existing neighbors for the seed only).

    NOTE both scan passes start at index 1 (`++start` in the reference,
    `:1640/:1662`), so a seed-skipped ids[0] is never re-examined as a
    non-seed pick — this mirrors the reference exactly; graph quality is
    judged by search recall, not by re-including it.
    """
    order = np.argsort(cand_dists, kind="stable")
    ids = np.asarray(cand_ids)[order]
    dists = np.asarray(cand_dists)[order]
    keep = ids != exclude
    ids, dists = ids[keep], dists[keep]
    if len(ids) == 0:
        return []
    # dedup keeping nearest occurrence
    _, first_idx = np.unique(ids, return_index=True)
    mask = np.zeros(len(ids), dtype=bool)
    mask[first_idx] = True
    ids, dists = ids[mask], dists[mask]
    order = np.argsort(dists, kind="stable")
    ids, dists = ids[order], dists[order]

    start = 0
    if seed_skip:
        while start < len(ids) and int(ids[start]) in seed_skip:
            start += 1
        if start == len(ids):
            return []
    result = [int(ids[start])]
    for two_pass in range(2):
        i = start
        while len(result) < m_degree and i + 1 < len(ids):
            i += 1
            pid, pdist = int(ids[i]), dists[i]
            if pid in result:
                continue
            d_to_chosen = -(vecs[result] @ vecs[pid])
            if not np.any(d_to_chosen < pdist):
                result.append(pid)
        if len(result) >= m_degree:
            break
        start = 0  # second pass rescans from the head (slack 1.0)
    if backfill:
        for j in range(len(ids)):
            if len(result) >= m_degree:
                break
            if int(ids[j]) not in result:
                result.append(int(ids[j]))
    return result


def _expand(q: BeamQueue, visited: np.ndarray, nbrs: np.ndarray,
            vecs: np.ndarray, query: np.ndarray) -> None:
    """Visit a node's unvisited neighbors: one batched GEMV per hop
    (the vectorized analog of the reference's per-neighbor SIMD compare)."""
    fresh = nbrs[~visited[nbrs]]
    if len(fresh) == 0:
        return
    visited[fresh] = True
    dists = -(vecs[fresh] @ query)
    for nid, d in zip(fresh, dists):
        q.insert(int(nid), float(d))


def beam_search(adj: list, vecs: np.ndarray, query: np.ndarray,
                ep: int, beam_width: int, k: int | None = None):
    """Single-vector best-first beam search (`SearchRoarGraph`).

    Returns (ids, dists) of the queue's best min(k, size) entries,
    ascending by negated-IP distance.
    """
    q = BeamQueue(beam_width)
    q.insert(ep, float(-(vecs[ep] @ query)))
    visited = np.zeros(len(vecs), dtype=bool)
    visited[ep] = True
    while q.has_unexpanded():
        cur_id, _ = q.closest_unexpanded()
        _expand(q, visited, adj[cur_id], vecs, query)
    lim = q.size if k is None else min(k, q.size)
    return q.ids[:lim].copy(), q.dists[:lim].copy()


def supply_search_collect(adj: list, vecs: np.ndarray, query: np.ndarray,
                          tgt: int, ep: int, beam_width: int):
    """Pass-3 internal search: records EVERY expanded node (full_retset).

    Mirrors `SearchProjectionGraphInternal`: neighbors equal to the target
    node are skipped; the visited set includes the init id.
    """
    q = BeamQueue(beam_width)
    q.insert(ep, float(-(vecs[ep] @ query)))
    visited = np.zeros(len(vecs), dtype=bool)
    visited[ep] = True
    ret_ids, ret_dists = [], []
    visited[tgt] = True  # target skipped exactly like `nbr == tgt` check
    while q.has_unexpanded():
        cur_id, cur_dist = q.closest_unexpanded()
        ret_ids.append(cur_id)
        ret_dists.append(cur_dist)
        _expand(q, visited, adj[cur_id], vecs, query)
    return np.array(ret_ids, dtype=np.int64), np.array(ret_dists)


def multivector_search(adj: list, vecs: np.ndarray, queries: np.ndarray,
                       ep: int, min_pq: int, max_pq: int, budget: int,
                       adaptive: bool = True,
                       visited_out: list | None = None):
    """m member beam searches under a shared beam-size budget.

    Phase 1: each member searches with beam ``min_pq`` (or budget/m when
    adaptive expansion is off). Then the member with the largest
    normalized head-tail gap (d[cur-1]-d[0])/cur grows its beam by
    0.1*budget and re-searches, until the budget is exhausted. Emits each
    member's first current_pq_size (id, dist) entries.
    """
    m = queries.shape[0]
    queues = [BeamQueue(max_pq) for _ in range(m)]
    visited = [np.zeros(len(vecs), dtype=bool) for _ in range(m)]
    if visited_out is not None:
        visited_out.extend(visited)
    for i in range(m):
        queues[i].insert(ep, float(-(vecs[ep] @ queries[i])))
        visited[i][ep] = True

    cur_size = [min_pq] * m
    sum_size = min_pq * m
    if not adaptive:
        cur_size = [max(1, budget // m)] * m
        sum_size = budget

    def run(i: int) -> None:
        q, vis, qv = queues[i], visited[i], queries[i]
        while q.has_unexpanded(cur_size[i]):
            cur_id, _ = q.closest_unexpanded()
            _expand(q, vis, adj[cur_id], vecs, qv)

    for i in range(m):
        run(i)

    step = max(1, int(0.1 * budget))
    while adaptive and sum_size < budget:
        pick, max_gap = -1, 0.0
        for i in range(m):
            q = queues[i]
            if q.size < cur_size[i]:
                continue
            gap = (q.dists[cur_size[i] - 1] - q.dists[0]) / cur_size[i]
            grown = cur_size[i] + step
            if gap > max_gap and grown < max_pq \
                    and sum_size + step <= budget:
                max_gap, pick = gap, i
        if pick < 0:
            break
        sum_size += step
        cur_size[pick] += step
        run(pick)

    out = []
    for i in range(m):
        lim = min(cur_size[i], queues[i].size)
        out.append((queues[i].ids[:lim].copy(),
                    queues[i].dists[:lim].copy()))
    return out


def multivector_search_instrumented(adj: list, vecs: np.ndarray,
                                    queries: np.ndarray, ep: int,
                                    min_pq: int, max_pq: int, budget: int,
                                    adaptive: bool = True):
    """Search + visited-overlap diagnostics
    (`TestOverlap_SearchMultivectorOnRoarGraph`,
    `/root/reference/src/index_bipartite.cpp:2546-2666`): how much do the
    m members' visited sets overlap? unique/total -> 1 means disjoint
    searches; -> 1/m means the members retread the same region (the
    motivation for the shared-visited variant).

    Returns (results, stats) where stats = {unique_visited,
    total_visited, unique_ratio}.
    """
    visited_sets: list = []
    results = multivector_search(adj, vecs, queries, ep, min_pq, max_pq,
                                 budget, adaptive, visited_sets)
    total = sum(int(v.sum()) for v in visited_sets)
    union = np.zeros(len(vecs), dtype=bool)
    for v in visited_sets:
        union |= v
    unique = int(union.sum())
    return results, {
        "unique_visited": unique,
        "total_visited": total,
        "unique_ratio": unique / max(total, 1),
    }


def multivector_search_shared_visited(adj: list, vecs: np.ndarray,
                                      queries: np.ndarray, ep: int,
                                      min_pq: int, max_pq: int,
                                      budget: int):
    """Shared-visited-list variant
    (`SearchMultivectorOnRoarGraphWithSharedVisitedList`,
    `/root/reference/src/index_bipartite.cpp:2668-2764`).

    One shared visited set and one shared checked set across the m
    member searches: each round-robins expansion of its own queue, a
    node's neighborhood is expanded at most once globally (checked set),
    and every newly visited node is scored against ALL m members — each
    distance batch is one small GEMM here. Beam sizes are the equal
    split budget/m (the reference hard-disables adaptive expansion in
    this variant — the `if` is commented out at `:2699-2702`).
    """
    m = queries.shape[0]
    queues = [BeamQueue(max_pq) for _ in range(m)]
    d0 = -(vecs[ep] @ queries.T)                 # score ep vs all members
    for i in range(m):
        queues[i].insert(ep, float(d0[i]))
    cur_size = [max(1, budget // m)] * m
    visited = np.zeros(len(vecs), dtype=bool)
    checked = np.zeros(len(vecs), dtype=bool)
    visited[ep] = True

    while True:
        idle = True
        for i in range(m):
            q = queues[i]
            if not q.has_unexpanded(cur_size[i]):
                continue
            idle = False
            cur_id, _ = q.closest_unexpanded()
            if checked[cur_id]:
                continue
            checked[cur_id] = True
            fresh = adj[cur_id][~visited[adj[cur_id]]]
            if len(fresh) == 0:
                continue
            visited[fresh] = True
            dists = -(vecs[fresh] @ queries.T)   # (|fresh|, m) one GEMM
            for row, nid in enumerate(fresh):
                for j in range(m):
                    queues[j].insert(int(nid), float(dists[row, j]))
        if idle:
            break

    out = []
    for i in range(m):
        lim = min(cur_size[i], queues[i].size)
        out.append((queues[i].ids[:lim].copy(),
                    queues[i].dists[:lim].copy()))
    return out
