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


def pad_adjacency(adj: list, n: int) -> np.ndarray:
    """Dense (n, max_degree) int64 adjacency, padded with the sentinel
    index ``n`` (callers append a zero row / extra visited column at n so
    padded gathers never collide with a real node).

    Rows are normalized to first-occurrence order with duplicates
    dropped: graphs built in-repo already emit unique rows, but
    ``load_graph`` accepts arbitrary parquet adjacency, and a duplicated
    id inside one row would otherwise be inserted twice by the wave
    kernels (the visited bitmap is read before it is written within a
    wave) where the sequential queue's dup check admits it once.

    Vectorized fill (r10): the former per-row python loop
    (dict.fromkeys per node) was 65% of a whole
    ``batch_multivector_search`` call in profile — the pad runs on
    EVERY search/build-sweep invocation, so it must be flat NumPy.
    Duplicate handling stays exact: a vectorized per-row sorted-adjacent
    scan finds the (rare) rows that need the first-occurrence rewrite
    and only those pay the python path."""
    lens = np.fromiter((len(a) for a in adj), dtype=np.int64,
                       count=len(adj))
    dmax = int(lens.max(initial=0))
    out = np.full((n, max(dmax, 1)), n, dtype=np.int64)
    total = int(lens.sum())
    if total == 0:
        return out
    flat = np.concatenate(
        [np.asarray(a, dtype=np.int64) for a in adj if len(a)])
    # id-contract gate: load_graph accepts arbitrary parquet adjacency,
    # and an out-of-range id (>= n, or negative) would silently alias
    # the zero sentinel row / wrap the gather — fail loudly instead
    if flat.max(initial=-1) >= n or flat.min(initial=0) < 0:
        bad = flat[(flat >= n) | (flat < 0)]
        raise ValueError(
            f"adjacency ids out of range [0, {n}): e.g. {bad[:5].tolist()}")
    nz = lens > 0
    rows = np.repeat(np.arange(len(adj), dtype=np.int64)[nz], lens[nz])
    starts = np.cumsum(lens) - lens
    cols = np.arange(total, dtype=np.int64) - np.repeat(starts[nz],
                                                        lens[nz])
    out[rows, cols] = flat
    if dmax > 1:
        srt = np.sort(out, axis=1)
        dup = ((srt[:, 1:] == srt[:, :-1]) & (srt[:, 1:] < n)).any(axis=1)
        for i in np.nonzero(dup)[0]:
            u = np.fromiter(dict.fromkeys(int(x) for x in adj[i]),
                            dtype=np.int64)
            out[i] = n
            out[i, :len(u)] = u
    return out


def _merge_wave(ids: np.ndarray, dists: np.ndarray, expanded: np.ndarray,
                rows: np.ndarray, nbr: np.ndarray, fresh: np.ndarray,
                nd: np.ndarray, cap_r: np.ndarray, n: int) -> None:
    """Merge one wave of neighbor candidates into the beams at ``rows``,
    bit-equal to calling ``BeamQueue.insert`` per candidate in forward
    neighbor order with per-row capacity ``cap_r``.

    Fast path (no distance ties): one stable sort of [reversed new |
    old pool]. With all-distinct distances this is exactly the
    sequential result — membership is "the cap smallest", and the
    reversed-new-first concat order only matters under ties.

    Tie rows are replayed sequentially: the queue's tie rules are
    order-dependent in a way no single sort reproduces — a newcomer
    tying the tail of a FULL queue is rejected (incumbent wins), the
    tail itself shrinks as the wave's earlier candidates are accepted,
    yet an accepted newcomer lands BEFORE equal-distance incumbents
    (insert at ``searchsorted(side="left")``) and so outlives them under
    later eviction. Duplicate vectors produce exact negated-IP ties, so
    real corpora hit this path; it is exact by construction (same
    insert semantics as BeamQueue), and rare enough to stay off the
    vectorized path's cost."""
    L = ids.shape[1]
    new_d = np.where(fresh, nd, np.inf)
    new_i = np.where(fresh, nbr, n)
    cat_i = np.concatenate([new_i[:, ::-1], ids[rows]], axis=1)
    cat_d = np.concatenate([new_d[:, ::-1], dists[rows]], axis=1)
    cat_e = np.concatenate([~fresh[:, ::-1], expanded[rows]], axis=1)
    order = np.argsort(cat_d, axis=1, kind="stable")
    # direct fancy indexing == take_along_axis here (2-D, axis 1) but
    # skips its per-call python dispatch — measurable at wave rates
    rix = np.arange(cat_d.shape[0])[:, None]
    d_s = cat_d[rix, order]
    tie = ((d_s[:, 1:] == d_s[:, :-1]) & (d_s[:, 1:] < np.inf)).any(axis=1)
    ids_m = cat_i[rix, order[:, :L]]
    d_m = d_s[:, :L]
    e_m = cat_e[rix, order[:, :L]]
    # entries past the row's queue capacity do not exist sequentially
    over = np.arange(L)[None, :] >= cap_r[:, None]
    if over.any():
        ids_m[over] = n
        d_m[over] = np.inf
        e_m[over] = True
    for r in np.nonzero(tie)[0]:
        cap = int(cap_r[r])
        ri = ids[rows[r]].copy()
        rd = dists[rows[r]].copy()
        re_ = expanded[rows[r]].copy()
        sz = int((rd < np.inf).sum())
        for j in range(nbr.shape[1]):
            if not fresh[r, j]:
                continue
            d = nd[r, j]
            if sz == cap and d >= rd[sz - 1]:
                continue
            lo = int(np.searchsorted(rd[:sz], d, side="left"))
            end = min(sz, cap - 1)
            ri[lo + 1:end + 1] = ri[lo:end]
            rd[lo + 1:end + 1] = rd[lo:end]
            re_[lo + 1:end + 1] = re_[lo:end]
            ri[lo] = nbr[r, j]
            rd[lo] = d
            re_[lo] = False
            if sz < cap:
                sz += 1
        ri[sz:] = n
        rd[sz:] = np.inf
        re_[sz:] = True
        ids_m[r], d_m[r], e_m[r] = ri, rd, re_
    ids[rows] = ids_m
    dists[rows] = d_m
    expanded[rows] = e_m


def batch_supply_search_collect(adj: list, vecs: np.ndarray,
                                query_nodes: np.ndarray, ep: int,
                                beam_width: int,
                                batch_rows: int | None = None,
                                vecs_ext: np.ndarray | None = None,
                                collect: str = "expanded") -> list:
    """Wave-vectorized twin of ``supply_search_collect`` over many target
    nodes at once: per wave, every still-active query expands its closest
    unexpanded candidate, all neighbor gathers / distance dots / beam
    merges run as single NumPy ops across the batch.

    Exact-equivalence argument (pinned by tests): queries are independent
    (snapshot graph, private visited sets), so interleaving them by waves
    cannot change any one query's trajectory; within a query,
    ``_merge_wave`` reproduces the beam queue's insert semantics exactly
    (including full-queue tail-tie rejection and the
    ``searchsorted(left)`` equal-distance layout, via sequential replay
    on the rare tie rows). The visited bitmap makes duplicate-id
    rejection structural.

    Returns [(ret_ids, ret_dists), ...] aligned with ``query_nodes`` —
    every expanded node in expansion order, exactly like the sequential
    function.

    ``collect="visited"`` returns every FRESH-VISITED node with its
    distance instead (wave order; the entry point and the target are
    excluded like seeds are excluded from NSG's fullset) — the pool
    NSG's ``get_neighbors`` accumulates for ``sync_prune``
    (`thirdparty/nsg/src/index_nsg.cpp:135-146`). Opt-in: the default
    path is byte-identical to the pinned expanded-trace contract.
    """
    if collect not in ("expanded", "visited"):
        raise ValueError(f"unknown collect mode {collect!r}")
    n = len(vecs)
    nq = len(query_nodes)
    L = beam_width
    # an ndarray adj is accepted as ALREADY padded (the distributed
    # build broadcasts one driver-padded matrix so each task skips the
    # O(n) python pad loop). Contract: padded for THIS n — one row per
    # node, sentinel == n, ids in [0, n], rows first-occurrence-unique
    # (pad_adjacency's output). A matrix padded for a different n would
    # double-insert or index the wrong zero row, so gate it here.
    if isinstance(adj, np.ndarray):
        if adj.shape[0] != n:
            raise ValueError(
                f"pre-padded adjacency has {adj.shape[0]} rows for n={n}")
        if adj.max(initial=n) > n or adj.min(initial=0) < 0:
            raise ValueError(
                f"pre-padded adjacency ids outside [0, n={n}] — "
                "padded for a different n?")
        adj_pad = adj
    else:
        adj_pad = pad_adjacency(adj, n)
    dmax = adj_pad.shape[1]
    if vecs_ext is None:
        vecs_ext = np.vstack([vecs, np.zeros((1, vecs.shape[1]))])
    elif vecs_ext.shape != (n + 1, vecs.shape[1]):
        # callers hand a PRE-extended (n+1, d) matrix (last row zeros)
        # so a node-local mmap snapshot is gathered from directly — the
        # per-task vstack above copies the full matrix, which at 10M
        # nodes is ~5 GB per concurrent worker (SCALE_PROBE's pass-3
        # wall). A wrong-shape matrix would silently misalign gathers.
        raise ValueError(
            f"vecs_ext shape {vecs_ext.shape} != {(n + 1, vecs.shape[1])}")
    if batch_rows is None:
        # visited bitmap is the footprint: B*(n+1) bytes; cap ~256 MB
        batch_rows = int(np.clip(256_000_000 // max(n + 1, 1), 32, 8192))
    results: list = [None] * nq

    # ONE visited buffer reused across node blocks, clearing only the
    # entries each block actually set: a fresh zeros((B, n+1)) per block
    # totals n/B blocks x B*(n+1) bytes = O(n^2) memset — ~100 TB of
    # pure zeroing at n=10M — while the touched set is O(expansions).
    visited = None
    for s in range(0, nq, batch_rows):
        qn = np.asarray(query_nodes[s:s + batch_rows], dtype=np.int64)
        B = len(qn)
        qmat = vecs[qn]                                   # (B, d)
        ids = np.full((B, L), n, dtype=np.int64)
        dists = np.full((B, L), np.inf)
        expanded = np.ones((B, L), dtype=bool)            # padding: True
        if visited is None:
            visited = np.zeros((B, n + 1), dtype=bool)
        bidx = np.arange(B)
        ids[:, 0] = ep
        dists[:, 0] = -(qmat @ vecs[ep])
        expanded[:, 0] = False
        visited[:B, ep] = True
        visited[bidx, qn] = True                          # target skip
        trace_b, trace_id, trace_d = [], [], []
        marks: list = []              # (rows, cols) set this block

        while True:
            un = ~expanded
            act = un.any(axis=1)
            if not act.any():
                break
            rows = np.nonzero(act)[0]
            fidx = un[rows].argmax(axis=1)
            cur = ids[rows, fidx]
            if collect == "expanded":
                trace_b.append(rows)
                trace_id.append(cur)
                trace_d.append(dists[rows, fidx])
            expanded[rows, fidx] = True

            nbr = adj_pad[cur]                            # (A, dmax)
            fresh = ~visited[rows[:, None], nbr]
            fresh &= nbr < n                              # drop padding
            cols = np.where(fresh, nbr, n)
            visited[rows[:, None], cols] = True
            marks.append((rows, cols))
            nd = -np.einsum("and,ad->an", vecs_ext[nbr], qmat[rows])
            if collect == "visited":
                trace_b.append(
                    np.broadcast_to(rows[:, None], nbr.shape)[fresh])
                trace_id.append(nbr[fresh])
                trace_d.append(nd[fresh])
            _merge_wave(ids, dists, expanded, rows, nbr, fresh, nd,
                        np.full(len(rows), L, dtype=np.int64), n)

        # un-mark this block's writes (exactly the fancy-index sets
        # above, replayed with False) so the buffer is all-False again
        for rows_m, cols_m in marks:
            visited[rows_m[:, None], cols_m] = False
        visited[:B, ep] = False
        visited[bidx, qn] = False

        if trace_b:
            tb = np.concatenate(trace_b)
            ti = np.concatenate(trace_id)
            td = np.concatenate(trace_d)
            # stable sort by query keeps per-query wave (=expansion) order
            o = np.argsort(tb, kind="stable")
            tb, ti, td = tb[o], ti[o], td[o]
            bounds = np.searchsorted(tb, np.arange(B + 1))
            for b in range(B):
                lo, hi = bounds[b], bounds[b + 1]
                results[s + b] = (ti[lo:hi].copy(), td[lo:hi].copy())
        else:
            for b in range(B):
                results[s + b] = (np.empty(0, dtype=np.int64),
                                  np.empty(0))
    return results


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
    # dedup keeping nearest occurrence; masking a dist-sorted array
    # leaves it dist-sorted, so no re-sort is needed
    _, first_idx = np.unique(ids, return_index=True)
    mask = np.zeros(len(ids), dtype=bool)
    mask[first_idx] = True
    ids, dists = ids[mask], dists[mask]

    start = 0
    if seed_skip:
        while start < len(ids) and int(ids[start]) in seed_skip:
            start += 1
        if start == len(ids):
            return []
    # Running occlusion mask updated only when a member is chosen:
    # candidate p is occluded iff some chosen r has d(p, r) < d(p,
    # target) — monotone in the chosen set, so one gemv of
    # everyone-vs-the-new-member per choose (<= m_degree gemvs total)
    # maintains exactly the reference's per-examination predicate at
    # ~1/8th the FLOPs of a full pairwise GEMM.
    cand_vecs = vecs[ids]
    occluded = np.zeros(len(ids), dtype=bool)
    taken = np.zeros(len(ids), dtype=bool)

    def choose(j: int) -> None:
        taken[j] = True
        occluded[:] |= -(cand_vecs @ cand_vecs[j]) < dists

    result = [int(ids[start])]
    choose(start)
    for two_pass in range(2):
        i = start
        while len(result) < m_degree and i + 1 < len(ids):
            i += 1
            if taken[i] or occluded[i]:
                continue
            result.append(int(ids[i]))
            choose(i)
        if len(result) >= m_degree:
            break
        start = 0  # second pass rescans from the head (slack 1.0)
    if backfill:
        for j in range(len(ids)):
            if len(result) >= m_degree:
                break
            if not taken[j]:
                taken[j] = True
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


# engine="auto" switches to the windowed pool at this max_pq: below it
# the full-width sorted kernel's O(L) ops are cheap enough that its
# lower fixed overhead wins; above it the O(L)-per-expansion terms
# dominate. r13 set 512 from the synthetic 100k probe graph
# (tools/beam_engine_probe.py: window 0.98x at 400, >=1.07x from 800);
# r14 re-measured on the REAL 1M OOD fixture
# (tools/window_crossover_probe.py, outputs asserted bit-equal): the
# window engine wins at EVERY swept budget — 1.17x at 300, 1.66x at
# 400, 1.42x at 512, 1.6x at 1600-2560 — so the threshold drops to
# the measured floor of that sweep (300); smaller beams keep the
# sorted kernel, unmeasured on the real fixture and sub-5s absolute.
WINDOW_ENGINE_MIN_PQ = 300


def batch_multivector_search(adj: list, vecs: np.ndarray,
                             query_sets: list, ep: int,
                             min_pq, max_pq, budget,
                             adaptive: bool = True,
                             mem_budget_bytes: int = 200_000_000,
                             engine: str = "auto") -> list:
    """Wave-vectorized twin of ``multivector_search`` across MANY query
    sets at once: all sets' member beam searches advance one expansion
    per wave, with neighbor gathers / distance dots / beam merges as
    single NumPy ops over the whole batch (the same mechanics as
    ``batch_supply_search_collect``).

    Exact-equivalence argument (pinned by tests): sets are independent
    (private queues/visited), so wave interleaving cannot change any
    set's trajectory; within a set the adaptive loop picks at most one
    member per round exactly like the sequential `while` (strict-gt gap
    comparison in ascending member order == masked argmax), and beam
    insertion is exact via ``_merge_wave`` (single stable sort off the
    tie path, sequential replay on rows holding distance ties, per-row
    capacity = the set's own max_pq).

    ``min_pq`` / ``max_pq`` / ``budget`` are scalars or per-set arrays
    (aligned with ``query_sets``) — per-set budgets let one pass serve a
    whole budget sweep (each set follows exactly the trajectory the
    sequential call with its own scalars would take).

    Returns a list aligned with ``query_sets``; each element is the
    per-member [(ids, dists), ...] like ``multivector_search``.

    ``engine`` picks the pool representation — bit-identical results
    either way (both are pinned against the sequential twin):
      * "sorted": the wave kernel below (sorted-array pool at the full
        max_pq width L, O(L) per expansion — the reference's own
        NeighborPriorityQueue cost class). Lower constant at small
        beams.
      * "window": `_beam_window.window_multivector_search` — the same
        pool windowed at each member's own cur_size-driven width, the
        overflow archived; per-wave work ~ budget instead of
        m x budget (the r12 1M sweep's named kernel gap). Sets whose
        cur_size can reach max_pq (non-adaptive budget//m >= max_pq,
        or min_pq >= max_pq) fall back to "sorted" — the windowed
        uncapped-pool equivalence (see `_beam_window`) needs
        cur_size < max_pq.
      * "auto": "window" when the widest max_pq >=
        WINDOW_ENGINE_MIN_PQ.
    """
    n = len(vecs)
    nq = len(query_sets)
    adj_pad = pad_adjacency(adj, n)
    dmax = adj_pad.shape[1]
    vecs_ext = np.vstack([vecs, np.zeros((1, vecs.shape[1]))])
    min_pq_a = np.broadcast_to(np.asarray(min_pq, dtype=np.int64), (nq,))
    max_pq_a = np.broadcast_to(np.asarray(max_pq, dtype=np.int64), (nq,))
    budget_a = np.broadcast_to(np.asarray(budget, dtype=np.int64), (nq,))
    L = int(max_pq_a.max()) if nq else 1
    if engine not in ("auto", "sorted", "window"):
        raise ValueError(f"unknown engine {engine!r}")
    use_window = engine == "window" or (
        engine == "auto" and L >= WINDOW_ENGINE_MIN_PQ)
    if use_window and nq:
        # the windowed equivalence requires cur_size < max_pq forever
        # (see _beam_window docstring); route capped-shape sets back
        # through this kernel
        m_all = np.array([len(q) for q in query_sets], dtype=np.int64)
        cs0 = min_pq_a if adaptive else np.maximum(1, budget_a // m_all)
        capped = cs0 >= max_pq_a
        if capped.any():
            out: list = [None] * nq
            for mask, eng in ((capped, "sorted"), (~capped, "window")):
                idx = np.nonzero(mask)[0]
                if len(idx) == 0:
                    continue
                sub = batch_multivector_search(
                    adj, vecs, [query_sets[i] for i in idx], ep,
                    min_pq_a[idx], max_pq_a[idx], budget_a[idx],
                    adaptive, mem_budget_bytes, engine=eng)
                for i, r in zip(idx, sub):
                    out[i] = r
            return out
    results: list = [None] * nq
    # sub-batch whole sets so the visited bitmap stays bounded
    max_members = max(1, mem_budget_bytes // max(n + 1, 1))
    col = np.arange(L)[None, :]

    s = 0
    while s < nq:
        e = s
        members = 0
        while e < nq and (
                members + len(query_sets[e]) <= max_members or e == s):
            members += len(query_sets[e])
            e += 1
        batch = query_sets[s:e]
        if use_window:
            from . import _beam_window
            out_sets, tainted = _beam_window.window_multivector_search(
                adj_pad, vecs, vecs_ext, batch, ep, min_pq_a[s:e],
                max_pq_a[s:e], budget_a[s:e], adaptive)
            results[s:e] = out_sets
            if len(tainted):
                # duplicate-distance sets: the windowed uncapped-pool
                # equivalence doesn't hold under exact ties — recompute
                # exactly with the capped kernel (incl. its tie replay)
                idx = np.asarray(tainted) + s
                redo = batch_multivector_search(
                    adj, vecs, [query_sets[i] for i in idx], ep,
                    min_pq_a[idx], max_pq_a[idx], budget_a[idx],
                    adaptive, mem_budget_bytes, engine="sorted")
                for i, r in zip(idx, redo):
                    results[i] = r
            s = e
            continue
        m_of = np.array([len(q) for q in batch])
        F_ = int(m_of.sum())
        qmat = np.vstack(batch)
        set_of = np.repeat(np.arange(len(batch)), m_of)
        b_min = min_pq_a[s:e]
        b_max = max_pq_a[s:e]
        b_budget_set = budget_a[s:e]
        # per-set growth step, exactly the sequential max(1, 0.1*budget)
        b_step = np.maximum(1, (0.1 * b_budget_set).astype(np.int64))

        ids = np.full((F_, L), n, dtype=np.int64)
        dists = np.full((F_, L), np.inf)
        expanded = np.ones((F_, L), dtype=bool)
        size = np.ones(F_, dtype=np.int64)
        visited = np.zeros((F_, n + 1), dtype=bool)
        ids[:, 0] = ep
        dists[:, 0] = -(qmat @ vecs[ep])
        expanded[:, 0] = False
        visited[:, ep] = True
        if adaptive:
            cur_size = b_min[set_of].copy()
            sum_size = m_of * b_min
        else:
            cur_size = np.maximum(1, b_budget_set // m_of)[set_of]
            sum_size = b_budget_set.copy()

        def run_waves():
            # rows leave the wave front monotonically inside one call
            # (expansion only consumes unexpanded slots; cur_size is
            # frozen here), so the O(F x L) candidacy mask only ever
            # needs the rows still alive — finished rows would
            # otherwise be rescanned every wave for the whole batch's
            # longest straggler chain (budget-many waves at L = budget
            # columns: the dominant fixed cost of big-budget sweeps)
            alive = np.arange(F_)
            while True:
                un = ~expanded[alive] & (col < cur_size[alive, None])
                act = un.any(axis=1)
                if not act.any():
                    return
                alive = alive[act]
                rows = alive
                fidx = un[act].argmax(axis=1)
                cur = ids[rows, fidx]
                expanded[rows, fidx] = True
                nbr = adj_pad[cur]
                fresh = ~visited[rows[:, None], nbr]
                fresh &= nbr < n
                visited[rows[:, None], np.where(fresh, nbr, n)] = True
                nd = -np.einsum("and,ad->an", vecs_ext[nbr], qmat[rows])
                # per-row capacity = the member's OWN set max_pq: the
                # sequential twin's BeamQueue never holds more, so
                # neither may the batch beam (emit and tie/eviction
                # behavior both depend on it)
                _merge_wave(ids, dists, expanded, rows, nbr, fresh, nd,
                            b_max[set_of[rows]], n)
                size[rows] = (dists[rows] < np.inf).sum(axis=1)

        run_waves()
        while adaptive:
            # one pick per set, mirroring the sequential strict-gt scan:
            # ineligible members get -inf, argmax takes the first max
            ok = size >= cur_size
            grown_ok = cur_size + b_step[set_of] < b_max[set_of]
            budget_ok = (sum_size + b_step <= b_budget_set)[set_of]
            head = dists[np.arange(F_),
                         np.minimum(cur_size, L) - 1]
            gap = np.where(ok & grown_ok & budget_ok,
                           (head - dists[:, 0]) / cur_size, -np.inf)
            picked = False
            for b in range(len(batch)):
                sel = np.nonzero(set_of == b)[0]
                g = gap[sel]
                j = int(np.argmax(g))
                if g[j] > 0.0:
                    cur_size[sel[j]] += b_step[b]
                    sum_size[b] += b_step[b]
                    picked = True
            if not picked:
                break
            run_waves()

        flat = 0
        for b in range(len(batch)):
            out = []
            for _ in range(m_of[b]):
                lim = int(min(cur_size[flat], size[flat]))
                out.append((ids[flat, :lim].copy(),
                            dists[flat, :lim].copy()))
                flat += 1
            results[s + b] = out
        s = e
    return results


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
