"""Windowed-pool engine for the batched multivector search.

The sorted-array wave kernel in `_roar_core.batch_multivector_search`
allocates every member's pool at the full ``max_pq`` width L and pays
O(L) per expansion (candidacy mask, pool re-sort, size recount) — the
same O(budget^2)-class cost as the reference's own
`NeighborPriorityQueue` (`/root/reference/include/efanna2e/
neighbor.h:137-226`: O(L) insert memmove + sorted-pool cursor
rescans), the measured cause of the 1M/10M iso-recall QPS gap vs
HNSW's heap (ANN_PROTOCOL.md kernel cost model; VERDICT r12
directive #2). Under the adaptive allocator the width is mostly
waste: an m-member set splits ``budget`` across members
(sum cur_size = budget), yet every member's pool is budget-wide.

This engine keeps each member's pool in a WINDOW of its own
power-of-two width w_r >= cur_size_r (so same-width rows share one
vectorized merge op), with everything pushed past the window spilled
to an append-only archive, and the window rebuilt from the archive on
the rare adaptive growth steps. Per-wave work drops from
sum_rows(max_pq) to sum_rows(w_r) ~ budget + slack.

Exactness (pinned bit-equal to the sequential `multivector_search`
by tests/test_beam_window.py and the tests/test_properties.py
fixtures run through engine="window"):

  * The TRUE pool is the capped BeamQueue: reject a newcomer iff full
    (accepted == max_pq) and dist >= the tail distance; eviction
    drops the sorted tail. This engine instead accepts EVERYTHING
    (window + archive = the UNCAPPED pool). With all of a row's
    scored distances DISTINCT, divergence is confined to pool ranks
    >= max_pq - 1: a rejected entry had d strictly above the tail of
    a full true pool, i.e. >= max_pq strictly-better keys, an evicted
    entry was the true rank-(max_pq - 1), entries never leave the
    uncapped pool, and inserts only push ranks DOWN — so divergent
    entries never reach a read rank. The distinct-distance premise is
    CHECKED, not assumed: every reject/evict decision that depends on
    a tie (d_new == tail_d; evict choosing among equal-d tails) puts
    both tied entries in the uncapped pool, the pool is append-only,
    so one duplicate-d scan of each row's final pool catches every
    tie that could ever have mattered. Tied rows are returned as
    TAINTED and the dispatcher re-runs their whole sets through the
    capped sorted kernel (exact, including the sequential tie
    replay). Exact negated-IP ties come from duplicate vectors —
    present in the pinned tie fixtures, vanishingly rare in real
    float64 corpora — so the fallback costs nothing on the sweeps
    this engine exists for.
  * Every read touches ranks < cur_size only — selection and
    termination scan the first cur_size window slots, the gap head is
    rank cur_size - 1, emission stops at min(cur_size, size) <=
    cur_size — and the engine only accepts sets whose cur_size stays
    < max_pq FOREVER (adaptive sets with min_pq < max_pq: growth
    requires ``cur_size + step < max_pq``). Sets that can reach
    cur_size >= max_pq (non-adaptive budget//m >= max_pq, or min_pq
    >= max_pq) are routed to the capped sorted kernel by the
    dispatcher. Hence reads never see the divergent ranks.
  * ``size`` (the sequential queue fill) is min(scored, max_pq)
    exactly: the capped queue only rejects when already full, so its
    fill equals the uncapped acceptance count until it saturates.
  * Tie layout. `BeamQueue.insert` places a newcomer at
    searchsorted-left of its distance run, so the pool is laid out by
    the key (dist asc, insert_seq desc). The merge concatenates
    [reversed new | old] and stable-sorts — within a wave the
    reversed block orders later columns (higher seq) first, across
    waves newer blocks precede equal-distance incumbents, so the
    layout IS the key order; with no cap there is no full-queue
    tail-tie reject, so no sequential tie replay is needed (the
    sorted kernel's `_merge_wave` replay exists only for that rule).
    Seq values ride along explicitly so growth rebuilds (lexsort by
    (d asc, seq desc) over window + archive) reproduce the exact
    layout.
  * dists[0] is the window head (the pool minimum never spills).

Dispatch: `_roar_core.batch_multivector_search(engine="auto")` uses
this engine when max_pq >= WINDOW_ENGINE_MIN_PQ (crossover measured
by tools/beam_engine_probe.py); "sorted" keeps the L-wide kernel
whose constant wins at small beams.
"""

from __future__ import annotations

import numpy as np


def _pow2ceil(x: np.ndarray, lo: int) -> np.ndarray:
    out = np.maximum(np.asarray(x, dtype=np.int64), lo)
    return 1 << np.ceil(np.log2(out)).astype(np.int64)


class _Archive:
    """Append-only spill store per row: (d, id, seq, expanded)."""

    def __init__(self, F: int, cap0: int = 64):
        self.d = np.empty((F, cap0))
        self.i = np.empty((F, cap0), dtype=np.int64)
        self.q = np.empty((F, cap0), dtype=np.int64)
        self.e = np.empty((F, cap0), dtype=bool)
        self.len = np.zeros(F, dtype=np.int64)

    def _grow(self, need: int) -> None:
        cap = self.d.shape[1]
        if need <= cap:
            return
        new = max(need, cap * 2)
        pad = new - cap
        F = self.d.shape[0]
        self.d = np.concatenate([self.d, np.empty((F, pad))], axis=1)
        self.i = np.concatenate(
            [self.i, np.empty((F, pad), dtype=np.int64)], axis=1)
        self.q = np.concatenate(
            [self.q, np.empty((F, pad), dtype=np.int64)], axis=1)
        self.e = np.concatenate(
            [self.e, np.empty((F, pad), dtype=bool)], axis=1)

    def append(self, rows: np.ndarray, k_of: np.ndarray, d: np.ndarray,
               i: np.ndarray, q: np.ndarray, e: np.ndarray) -> None:
        """Append k_of[j] entries to row rows[j]; d/i/q/e are flat,
        grouped by row in order."""
        if len(rows) == 0:
            return
        start = self.len[rows]
        self._grow(int((start + k_of).max()))
        rr = np.repeat(rows, k_of)
        cc = np.arange(len(d)) - np.repeat(
            np.cumsum(k_of) - k_of, k_of) + np.repeat(start, k_of)
        self.d[rr, cc] = d
        self.i[rr, cc] = i
        self.q[rr, cc] = q
        self.e[rr, cc] = e
        self.len[rows] = start + k_of


def window_multivector_search(adj_pad: np.ndarray, vecs: np.ndarray,
                              vecs_ext: np.ndarray, batch: list,
                              ep: int, b_min: np.ndarray,
                              b_max: np.ndarray, b_budget: np.ndarray,
                              adaptive: bool) -> tuple[list, np.ndarray]:
    """One sub-batch of whole query sets through the windowed engine.
    Callers guarantee every set's cur_size stays < its max_pq (the
    dispatcher routes the capped shapes to the sorted kernel).

    Returns (results, tainted): ``tainted`` holds batch-local indexes
    of sets where some member's pool held an exact duplicate distance
    — their results must be recomputed by the capped sorted kernel
    (module docstring: the uncapped-pool equivalence needs distinct
    distances)."""
    n = len(vecs)
    m_of = np.array([len(q) for q in batch])
    F = int(m_of.sum())
    qmat = np.vstack(batch)
    set_of = np.repeat(np.arange(len(batch)), m_of)
    b_step = np.maximum(1, (0.1 * b_budget).astype(np.int64))
    cap_row = b_max[set_of].astype(np.int64)
    dmax = adj_pad.shape[1]

    if adaptive:
        cur_size = b_min[set_of].astype(np.int64).copy()
        sum_size = (m_of * b_min).astype(np.int64)
    else:
        cur_size = np.maximum(1, b_budget // m_of)[set_of].astype(np.int64)
        sum_size = b_budget.astype(np.int64).copy()

    w_r = np.minimum(_pow2ceil(cur_size, 32), _pow2ceil(cap_row, 32))
    Wmax = int(w_r.max())
    wd = np.full((F, Wmax), np.inf)
    wi = np.full((F, Wmax), n, dtype=np.int64)
    wq = np.zeros((F, Wmax), dtype=np.int64)
    we = np.ones((F, Wmax), dtype=bool)
    arch = _Archive(F)
    scored = np.ones(F, dtype=np.int64)

    wd[:, 0] = -(qmat @ vecs[ep])
    wi[:, 0] = ep
    we[:, 0] = False
    visited = np.zeros((F, n + 1), dtype=bool)
    visited[:, ep] = True

    def _ensure_wmax(need: int) -> None:
        nonlocal Wmax, wd, wi, wq, we
        if need <= Wmax:
            return
        pad = need - Wmax
        wd = np.concatenate([wd, np.full((F, pad), np.inf)], axis=1)
        wi = np.concatenate([wi, np.full((F, pad), n, dtype=np.int64)],
                            axis=1)
        wq = np.concatenate([wq, np.zeros((F, pad), dtype=np.int64)],
                            axis=1)
        we = np.concatenate([we, np.ones((F, pad), dtype=bool)], axis=1)
        Wmax = need

    def run_waves() -> None:
        alive = np.arange(F)
        while len(alive):
            w_hi = int(w_r[alive].max())
            col = np.arange(w_hi)[None, :]
            un = ~we[alive, :w_hi] & (col < cur_size[alive, None])
            act = un.any(axis=1)
            if not act.any():
                return
            alive = alive[act]
            rows = alive
            fidx = un[act].argmax(axis=1)
            cur = wi[rows, fidx]
            we[rows, fidx] = True

            nbr = adj_pad[cur]
            fresh = ~visited[rows[:, None], nbr]
            fresh &= nbr < n
            visited[rows[:, None], np.where(fresh, nbr, n)] = True
            nd = -np.einsum("and,ad->an", vecs_ext[nbr], qmat[rows])

            # seq in the sequential twin's order: wave, then forward
            # neighbor column (reversed-block stable sort lays equal
            # distances out newest-first, the searchsorted-left layout)
            k_of = fresh.sum(axis=1)
            seq = scored[rows, None] + np.cumsum(fresh, axis=1) - 1
            scored[rows] += k_of

            # direct spill: with the window full, a candidate with d
            # STRICTLY above the window's last slot sorts past rank w
            # no matter what (its key is larger; an equal-d newcomer's
            # key is SMALLER — seq desc — so ties must merge). An
            # unfilled window has inf in that slot, disabling the
            # test. Near convergence this skips the whole merge for
            # most rows — archive order is free (rebuilds lexsort).
            tail_w = wd[rows, w_r[rows] - 1]
            direct = fresh & (nd > tail_w[:, None])
            k_dir = direct.sum(axis=1)
            has_dir = k_dir > 0
            if has_dir.any():
                flat = direct[has_dir]
                arch.append(rows[has_dir], k_dir[has_dir],
                            nd[has_dir][flat], nbr[has_dir][flat],
                            seq[has_dir][flat],
                            np.zeros(int(flat.sum()), dtype=bool))
            fresh_m = fresh & ~direct
            m_rows = fresh_m.any(axis=1)
            if not m_rows.any():
                continue
            rows_m = rows[m_rows]
            fresh_m = fresh_m[m_rows]
            new_d = np.where(fresh_m, nd[m_rows], np.inf)
            new_i = np.where(fresh_m, nbr[m_rows], n)
            new_q = np.where(fresh_m, seq[m_rows], -1)

            # merge per width class so each row pays only its own w_r
            widths = w_r[rows_m]
            for w in np.unique(widths):
                sel = widths == w
                r_c = rows_m[sel]
                cat_d = np.concatenate(
                    [new_d[sel][:, ::-1], wd[r_c, :w]], axis=1)
                cat_i = np.concatenate(
                    [new_i[sel][:, ::-1], wi[r_c, :w]], axis=1)
                cat_q = np.concatenate(
                    [new_q[sel][:, ::-1], wq[r_c, :w]], axis=1)
                cat_e = np.concatenate(
                    [~fresh_m[sel][:, ::-1], we[r_c, :w]], axis=1)
                order = np.argsort(cat_d, axis=1, kind="stable")
                rix = np.arange(len(r_c))[:, None]
                d_s = cat_d[rix, order]
                i_s = cat_i[rix, order]
                q_s = cat_q[rix, order]
                e_s = cat_e[rix, order]
                wd[r_c, :w] = d_s[:, :w]
                wi[r_c, :w] = i_s[:, :w]
                wq[r_c, :w] = q_s[:, :w]
                we[r_c, :w] = e_s[:, :w]
                # spill real entries pushed past the window
                sp = d_s[:, w:] < np.inf
                k_sp = sp.sum(axis=1)
                has = k_sp > 0
                if has.any():
                    flat = sp[has]
                    arch.append(r_c[has], k_sp[has], d_s[has, w:][flat],
                                i_s[has, w:][flat], q_s[has, w:][flat],
                                e_s[has, w:][flat])

    def rebuild(r: int) -> None:
        """Re-rank window + archive after w_r[r] grew: lexsort by the
        pool key (d asc, seq desc), refill the window, re-archive the
        tail."""
        w_new = int(w_r[r])
        _ensure_wmax(w_new)
        m = int(arch.len[r])
        live = wd[r] < np.inf
        d = np.concatenate([wd[r][live], arch.d[r, :m]])
        i = np.concatenate([wi[r][live], arch.i[r, :m]])
        q = np.concatenate([wq[r][live], arch.q[r, :m]])
        e = np.concatenate([we[r][live], arch.e[r, :m]])
        order = np.lexsort((-q, d))
        d, i, q, e = d[order], i[order], q[order], e[order]
        k = min(len(d), w_new)
        wd[r] = np.inf
        wi[r] = n
        we[r] = True
        wd[r, :k] = d[:k]
        wi[r, :k] = i[:k]
        wq[r, :k] = q[:k]
        we[r, :k] = e[:k]
        rest = len(d) - k
        arch.len[r] = 0
        if rest > 0:
            arch._grow(rest)
            arch.d[r, :rest] = d[k:]
            arch.i[r, :rest] = i[k:]
            arch.q[r, :rest] = q[k:]
            arch.e[r, :rest] = e[k:]
            arch.len[r] = rest

    run_waves()
    while adaptive:
        size = np.minimum(scored, cap_row)
        ok = size >= cur_size
        grown_ok = cur_size + b_step[set_of] < cap_row
        budget_ok = (sum_size + b_step <= b_budget)[set_of]
        head = wd[np.arange(F), np.minimum(cur_size, Wmax) - 1]
        gap = np.where(ok & grown_ok & budget_ok,
                       (head - wd[:, 0]) / cur_size, -np.inf)
        picked = []
        for b in range(len(batch)):
            sel = np.nonzero(set_of == b)[0]
            g = gap[sel]
            j = int(np.argmax(g))
            if g[j] > 0.0:
                cur_size[sel[j]] += b_step[b]
                sum_size[b] += b_step[b]
                picked.append(sel[j])
        if not picked:
            break
        for r in picked:
            need = _pow2ceil(cur_size[r], 32)
            cap_w = _pow2ceil(cap_row[r], 32)
            new_w = int(min(need, cap_w))
            if new_w > w_r[r]:
                w_r[r] = new_w
                rebuild(r)
        run_waves()

    # duplicate-distance taint scan: the pool is append-only, so the
    # final pool contains every distance ever scored — one sorted
    # adjacent-equality pass per row is a sound detector for every
    # tie any reject/evict decision could have depended on
    tainted_rows = np.zeros(F, dtype=bool)
    for r in range(F):
        live = wd[r][wd[r] < np.inf]
        d_all = np.concatenate([live, arch.d[r, :int(arch.len[r])]])
        d_all.sort()
        if len(d_all) > 1 and (d_all[1:] == d_all[:-1]).any():
            tainted_rows[r] = True
    tainted = np.unique(set_of[tainted_rows])

    results = []
    flat = 0
    for b in range(len(batch)):
        out = []
        for _ in range(m_of[b]):
            lim = int(min(cur_size[flat],
                          min(scored[flat], cap_row[flat])))
            out.append((wi[flat, :lim].copy(), wd[flat, :lim].copy()))
            flat += 1
        results.append(out)
    return results, tainted
