"""RoarGraph construction, re-expressed as functional Spark passes.

Reference pipeline: `BuildRoarGraph`
(`/root/reference/src/index_bipartite.cpp:145-235`) = normalize ->
`CalculateProjectionep` (`:2006-2043`) -> `LinkProjection` (`:1045-1279`):

  pass 1   per training query: truncate its base-kNN list to M_sq, take
           the nearest base as the projection target, occlusion-prune the
           rest into that target's neighbor list (`:1061-1099`);
  reverse  add src into each chosen neighbor's list (`:1393-1434`), then
           re-prune any node whose degree exceeds M_pjbp (`:1109-1138`);
  pass 3   per base node: beam search from the entry point over the
           supply-graph snapshot, occlusion-prune the expanded pool into
           supply neighbors (`:1185-1222`), add+cap reverse supply edges
           (`:1354-1391`, cap 2*M_pjbp), and merge up to 2*M_pjbp novel
           supply edges into the projection graph (`:1253-1271`).

Spark reformulation (SURVEY §7 Phase 3): every pass is a *functional*
explode -> groupBy -> prune-UDF rebuild over a broadcast snapshot — no
shared mutable graph, no locks. The C++ version reads neighbor lists
mutated by concurrent threads; any fixed snapshot ordering is an equally
valid instance of the algorithm (quality is judged by search recall, not
graph equality).

Scale notes (100 TB): the per-pass shape is groupBy(node) + Arrow UDF,
which shards freely; the *snapshot broadcast* (graph + vectors) bounds a
single index at executor memory (a few GB = tens of millions of vectors).
Within that bound, ``build_roargraph_dist`` runs every pass
task-parallel (the SURVEY §7 Phase-3 sketch realized; bit-identical to
the one-task pipeline). Above it, shard the base table and build one
sub-index per shard (`build_sharded` pattern, SURVEY §7 Phase 5) —
searches fan out per shard and merge on (query, dist), the classic
partial/final top-k.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, LongType, StructField, StructType)

from . import _roar_core as core
from .brute_force import knn_exact_gemm

_GRAPH_SCHEMA = StructType([
    StructField("src", LongType()),
    StructField("nbrs", ArrayType(LongType())),
])


@dataclass
class RoarGraphParams:
    """Build knobs; defaults are the repo's experiment configuration
    (`/root/reference/scripts/roargraph/build_roargraph_index.sh:26-28`)."""
    m_sq: int = 100      # kNN kept per training query
    m_pjbp: int = 35     # projection-graph degree bound
    l_pjpq: int = 100    # pass-3 beam width


@dataclass
class RoarGraphIndex:
    """In-memory index handle: contiguous-index adjacency + vectors."""
    ids: np.ndarray            # index -> original vec_id
    vecs: np.ndarray           # (n, d) normalized float64
    adj: list                  # index -> np.ndarray of neighbor indexes
    entry_point: int           # index (not vec_id)

    def to_dataframe(self, spark: SparkSession) -> DataFrame:
        rows = [(int(self.ids[i]),
                 [int(self.ids[j]) for j in self.adj[i]])
                for i in range(len(self.ids))]
        return spark.createDataFrame(rows, schema=_GRAPH_SCHEMA)


def _collect_matrix(base: DataFrame, id_col: str, vec_col: str):
    # Arrow fetch, not collect(): no per-row Row objects, ~5-10x faster
    # materialization of the broadcast payload. (The single-index path
    # is bounded by one machine's memory by design — the index must fit
    # wherever it is searched; the sharded path is the beyond-memory
    # shape.)
    pdf = base.select(id_col, vec_col).orderBy(id_col).toPandas()
    ids = pdf[id_col].to_numpy(dtype=np.int64)
    mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
    return ids, mat


def _pipeline_build_arrays(vecs: np.ndarray, nn_locals: list,
                           params: RoarGraphParams) -> tuple[list, int]:
    """The full LinkProjection pass pipeline (module docstring) over
    local contiguous indexes, pure NumPy — runs inside ONE Spark task so
    neither the vector matrix nor any pass state ever transits the
    driver. ``nn_locals``: one array per training query, local base
    indexes nearest-first (pass 1's kNN lists).

    This is bit-identical to the former driver-orchestrated pass chain
    in its single-partition regime (pinned by the ANN oracle constants):
    same pool-set construction, same np.unique candidate normalization,
    same supply reverse edges + 2*M_pjbp cap + novel-edge merge.

    NOTE — deliberate divergence from ``sharded._build_one_shard``:
    this pipeline is the reference's full three-pass LinkProjection
    (reverse merge + re-prune between passes), while the shard variant
    is the simplified single-sweep build (pass 1 + one enhancement
    sweep with a bounded reverse append). The two serve different
    regimes (one big broadcastable index vs many small sub-indexes)
    and are each pinned by their own oracle rows; a connectivity or
    pruning fix must be considered for BOTH.
    """
    n = len(vecs)
    m_deg = params.m_pjbp
    if n == 0:
        return [], 0

    # ---- pass 1: per training query -> occlusion-pruned target lists
    # Array-backed pool grouping (r9): the former dict-of-set pools
    # cost ~64 B per candidate id in interpreter overhead and OOM-killed
    # a 100k-node one-task build; packed (tgt, member) keys + np.unique
    # hold the same multiset in ~8 B/id. Candidate ORDER within a pool
    # becomes sorted-ascending (was: set iteration order), which only
    # matters under exact distance ties inside occlusion_prune's stable
    # argsort — the pinned ANN oracle rows verify the graphs unchanged.
    pair_t, pair_m = [], []
    for nn in nn_locals:
        if nn is None or len(nn) < 2:
            continue
        pair_t.append(np.full(len(nn) - 1, int(nn[0]), dtype=np.int64))
        pair_m.append(np.asarray(nn[1:], dtype=np.int64))

    def _grouped_unique(tgts: np.ndarray, mems: np.ndarray):
        """Yield (tgt, unique members ascending) per distinct tgt."""
        key = tgts * np.int64(n) + mems
        ukey = np.unique(key)
        ut, um = ukey // n, ukey % n
        bounds = np.flatnonzero(np.diff(ut)) + 1
        for lo, hi in zip(np.concatenate(([0], bounds)),
                          np.concatenate((bounds, [len(ut)]))):
            yield int(ut[lo]), um[lo:hi]

    fwd: dict[int, list] = {}
    if pair_t:
        for tgt, pool in _grouped_unique(np.concatenate(pair_t),
                                         np.concatenate(pair_m)):
            cand = pool[pool != tgt]
            if len(cand) == 0:
                continue
            dists = -(vecs[cand] @ vecs[tgt])
            fwd[tgt] = core.occlusion_prune(cand, dists, vecs, m_deg,
                                            exclude=tgt)

    # ---- reverse edges + degree-overflow re-prune (same array form)
    rev_s, rev_d = [], []
    for src, nbrs in fwd.items():
        a = np.asarray(nbrs, dtype=np.int64)
        rev_s.append(np.full(len(a), src, dtype=np.int64))
        rev_d.append(a)
        rev_s.append(a)                       # reverse direction
        rev_d.append(np.full(len(a), src, dtype=np.int64))
    adj = [np.empty(0, dtype=np.int64)] * n
    if rev_s:
        for src, cands in _grouped_unique(np.concatenate(rev_s),
                                          np.concatenate(rev_d)):
            cand = cands[cands != src]
            if len(cand) <= m_deg:
                adj[src] = cand
            else:
                dists = -(vecs[cand] @ vecs[src])
                adj[src] = np.asarray(
                    core.occlusion_prune(cand, dists, vecs, m_deg,
                                         exclude=src),
                    dtype=np.int64)

    # ---- entry point: centroid -> nearest base (CalculateProjectionep)
    centroid = vecs.mean(axis=0)
    ep = int(np.argmin(((vecs - centroid) ** 2).sum(axis=1)))

    # ---- pass 3: connectivity enhancement over the pass-2 snapshot
    traces = core.batch_supply_search_collect(
        adj, vecs, np.arange(n, dtype=np.int64), ep, params.l_pjpq)
    supply: dict[int, list] = {}
    for node in range(n):
        ret_ids, ret_dists = traces[node]
        keep = ret_ids != node
        ret_ids, ret_dists = ret_ids[keep], ret_dists[keep]
        if len(ret_ids) == 0:
            continue
        pruned = core.occlusion_prune(
            ret_ids, ret_dists, vecs, m_deg, exclude=node, backfill=False,
            seed_skip=set(int(x) for x in adj[node]))
        if pruned:
            supply[node] = pruned

    cap2 = 2 * m_deg
    s_sets: dict[int, set] = {}
    for src, nbrs in supply.items():
        s_sets.setdefault(src, set()).update(nbrs)
        for d in nbrs:
            s_sets.setdefault(d, set()).add(src)
    supply_map: dict[int, list] = {}
    for src, cands in s_sets.items():
        cand = np.unique(np.fromiter(cands, dtype=np.int64))
        cand = cand[cand != src]
        if len(cand) > cap2:
            dists = -(vecs[cand] @ vecs[src])
            cand = np.asarray(
                core.occlusion_prune(cand, dists, vecs, cap2, exclude=src),
                dtype=np.int64)
        supply_map[src] = [int(x) for x in cand]

    # ---- merge <= 2*M_pjbp novel supply edges into the projection graph
    final_adj = []
    for node in range(n):
        base_nbrs = [int(x) for x in adj[node]]
        have = set(base_nbrs)
        added = 0
        for s in supply_map.get(node, []):
            if added >= cap2:
                break
            if s not in have:
                base_nbrs.append(s)
                have.add(s)
                added += 1
        final_adj.append(np.asarray(base_nbrs, dtype=np.int64))
    return final_adj, ep


def build_roargraph_df(base: DataFrame, train_queries: DataFrame,
                       params: RoarGraphParams = RoarGraphParams(),
                       id_col: str = "vec_id", vec_col: str = "vec",
                       train_knn: DataFrame | None = None) -> DataFrame:
    """Task-side single-index build: (src, nbrs, is_entry) adjacency.

    The kNN stage runs distributed (blocked GEMM); the pass pipeline
    runs inside ONE Spark task fed by a union of the base vectors and
    the per-query kNN lists — the driver never materializes the vector
    matrix or any pass state, only the plan. Peak driver memory for a
    build is therefore O(1); callers that want the broadcastable
    in-memory handle pay O(adjacency + vectors) at assembly time
    (``build_roargraph``), which is the handle's own size, not the
    build's. A single index must fit one task's memory by construction
    (it is searched from one memory); beyond that, ``build_sharded``.
    """
    spark = base.sparkSession
    if train_knn is None:
        train_knn = knn_exact_gemm(
            train_queries.select(F.col(id_col).alias("query_id"), vec_col),
            base.select(F.col(id_col).alias("base_id"), vec_col),
            params.m_sq, metric="ip")
    knn_lists = (
        train_knn.groupBy("query_id")
        .agg(F.sort_array(F.collect_list(F.struct("rank", "base_id")))
             .alias("l"))
        .select(F.col("l.base_id").alias("nn_base"))
    )
    vec_t = base.schema[vec_col].dataType.simpleString()
    payload = (
        base.select(F.lit(0).alias("_kind"),
                    F.col(id_col).cast("long").alias("_id"),
                    F.col(vec_col).alias("_vec"),
                    F.lit(None).cast("array<long>").alias("_nn"))
        .unionByName(knn_lists.select(
            F.lit(1).alias("_kind"),
            # -1 sentinel, NOT null: a nullable long column converts to
            # float64 in Arrow->pandas, silently rounding ids > 2^53
            F.lit(-1).cast("long").alias("_id"),
            F.lit(None).cast(vec_t).alias("_vec"),
            F.col("nn_base").alias("_nn")))
        .repartition(1))

    schema = StructType(_GRAPH_SCHEMA.fields + [
        StructField("is_entry", LongType())])

    def build(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_l, vec_l, nn_l = [], [], []
        for pdf in it:
            kind = pdf["_kind"].to_numpy()
            ids_l.append(pdf["_id"].to_numpy()[kind == 0])
            vec_l.extend(pdf["_vec"][kind == 0])
            nn_l.extend(pdf["_nn"][kind == 1])
        ids = np.concatenate(ids_l).astype(np.int64) if ids_l \
            else np.empty(0, dtype=np.int64)
        if len(ids) == 0:
            return
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        vecs = np.vstack([np.asarray(v, dtype=np.float64)
                          for v in vec_l])[order]
        ix = {int(v): i for i, v in enumerate(ids)}
        nn_locals = [np.array([ix[int(x)] for x in nn], dtype=np.int64)
                     for nn in nn_l if nn is not None and len(nn)]
        adj, ep = _pipeline_build_arrays(vecs, nn_locals, params)
        yield pd.DataFrame({
            "src": ids,
            "nbrs": [[int(ids[j]) for j in adj[i]]
                     for i in range(len(ids))],
            "is_entry": [1 if i == ep else 0 for i in range(len(ids))],
        })

    return payload.mapInPandas(build, schema=schema)


def build_roargraph(base: DataFrame, train_queries: DataFrame,
                    params: RoarGraphParams = RoarGraphParams(),
                    id_col: str = "vec_id", vec_col: str = "vec",
                    train_knn: DataFrame | None = None) -> RoarGraphIndex:
    """Build the projected bipartite graph over ``base`` guided by
    ``train_queries`` (both (id, vec) DataFrames, rows pre-normalized),
    returning the broadcastable in-memory handle.

    ``train_knn`` (query_id, rank, base_id) can be supplied (e.g. loaded
    from a previous exact-kNN materialization); otherwise it is computed
    here with the blocked-GEMM exact kNN — in Spark the offline oracle
    the reference reads from disk becomes a first-class stage
    (SURVEY §3.2 note).

    The build itself runs task-side (``build_roargraph_df``); this
    wrapper only assembles the handle, whose O(vectors + adjacency)
    driver footprint is the handle's own broadcast payload — callers
    that persist straight to parquet can use ``build_roargraph_df`` and
    never materialize either.
    """
    rows = build_roargraph_df(base, train_queries, params,
                              id_col, vec_col, train_knn).toPandas()
    ids, vecs = _collect_matrix(base, id_col, vec_col)
    ix = {int(v): i for i, v in enumerate(ids)}
    adj = [np.empty(0, dtype=np.int64)] * len(ids)
    ep = 0
    for src, nbrs, is_ep in zip(rows["src"].to_numpy(),
                                rows["nbrs"].to_numpy(),
                                rows["is_entry"].to_numpy()):
        i = ix[int(src)]
        adj[i] = np.array([ix[int(x)] for x in nbrs], dtype=np.int64)
        if is_ep:
            ep = i
    return RoarGraphIndex(ids=ids, vecs=vecs, adj=adj, entry_point=ep)


def build_roargraph_dist(base: DataFrame, train_queries: DataFrame,
                         params: RoarGraphParams = RoarGraphParams(),
                         id_col: str = "vec_id", vec_col: str = "vec",
                         train_knn: DataFrame | None = None,
                         n_batches: int = 64) -> RoarGraphIndex:
    """Task-parallel single-index build — the Spark answer to the
    reference's 64-OpenMP-thread LinkProjection
    (`src/index_bipartite.cpp:1061,1194`, driver flag `-T 64`), which
    the one-task ``build_roargraph_df`` pipeline serializes.

    Every LinkProjection pass becomes a distributed stage over ONE
    broadcast of the vector matrix (and, for pass 3, the pass-2
    adjacency snapshot, padded once on the driver):

      pass 1   explode train-kNN lists -> (target, member) pairs ->
               groupBy(target) + occlusion-prune UDF;
      pass 2   explode forward edges both directions -> groupBy(node)
               + degree-cap prune UDF;
      pass 3   spark.range(n) node batches -> wave-vectorized beam
               search over the broadcast snapshot + per-node prune;
      pass 3b  explode supply edges both directions -> groupBy(node)
               + 2*M_pjbp cap prune UDF.

    Output is BIT-IDENTICAL to ``build_roargraph`` (pinned by
    tests/test_graph_build_dist.py): each pass's per-node candidate
    pool is the same sorted-unique set the one-task ``_grouped_unique``
    produces (collect_set + ascending sort over the monotone
    original-id -> local-index map), distances are the same float64
    GEMVs, pass 3 runs the same kernel over the same padded snapshot
    and entry point, and the final merge reuses the one-task code
    shape verbatim on the driver.

    Memory shape: the DRIVER holds O(index) — vectors + adjacency —
    exactly like the in-memory handle it returns (a single index must
    fit one memory because it is searched from one memory); each
    EXECUTOR holds the broadcast snapshot plus one batch of pass
    state. CPU, the one-task bottleneck (SCALE_PROBE: 186.7 s @ 100k
    nodes, all in one core), spreads across all cores/executors.
    """
    spark = base.sparkSession
    sc = spark.sparkContext
    m_deg = params.m_pjbp
    cap2 = 2 * m_deg

    ids, vecs = _collect_matrix(base, id_col, vec_col)
    n = len(ids)
    if n == 0:
        return RoarGraphIndex(ids=ids, vecs=vecs, adj=[], entry_point=0)
    # float64 broadcast: callers may feed float64-normalized vectors,
    # so no float32 round-trip (a float32-sourced matrix would survive
    # one, but bit-equality with the one-task build must hold for any
    # input dtype)
    bc = sc.broadcast((ids, vecs))

    if train_knn is None:
        train_knn = knn_exact_gemm(
            train_queries.select(F.col(id_col).alias("query_id"), vec_col),
            base.select(F.col(id_col).alias("base_id"), vec_col),
            params.m_sq, metric="ip")

    prune_schema = StructType([
        StructField("src", LongType()),
        StructField("nbrs", ArrayType(LongType())),
    ])

    def prune_pools(cap: int):
        """groupBy(collect_set) rows -> occlusion-pruned (src, nbrs):
        the shared shape of passes 1, 2, and 3b. Keeps a <=cap pool
        as-is only when ``keep_small`` (passes 2/3b); pass 1 always
        prunes. All ids local; pools sorted ascending (the
        ``_grouped_unique`` order)."""

        def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            v64 = bc.value[1]
            for pdf in it:
                srcs, outs = [], []
                for src, cands in zip(pdf["src"].to_numpy(),
                                      pdf["cands"].to_numpy()):
                    src = int(src)
                    cand = np.unique(np.asarray(cands, dtype=np.int64))
                    cand = cand[cand != src]
                    if len(cand) == 0:
                        continue
                    if cap < 0 or len(cand) > abs(cap):
                        dists = -(v64[cand] @ v64[src])
                        nbrs = core.occlusion_prune(
                            cand, dists, v64, abs(cap), exclude=src)
                        out = [int(x) for x in nbrs]
                    else:
                        out = [int(x) for x in cand]
                    srcs.append(src)
                    outs.append(out)
                yield pd.DataFrame({"src": srcs, "nbrs": outs})

        return fn

    # ---- pass 1: one prune per training-query target --------------
    knn_lists = (
        train_knn.groupBy("query_id")
        .agg(F.sort_array(F.collect_list(F.struct("rank", "base_id")))
             .alias("l"))
        .select(F.col("l.base_id").alias("nn_base"))
        .filter(F.size("nn_base") >= 2))

    def to_local_pairs(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_b = bc.value[0]
        for pdf in it:
            t, m = [], []
            for nn in pdf["nn_base"]:
                nn = np.asarray(nn, dtype=np.int64)
                loc = np.searchsorted(ids_b, nn)
                # membership gate: a stale/foreign train_knn whose
                # base_id is absent from `base` would otherwise resolve
                # to a wrong (or out-of-range) local index and silently
                # corrupt the graph — the one-task path's dict lookup
                # raises KeyError; fail the same way here
                if (loc >= len(ids_b)).any() or (ids_b[loc.clip(
                        max=len(ids_b) - 1)] != nn).any():
                    missing = nn[(loc >= len(ids_b)) | (ids_b[loc.clip(
                        max=len(ids_b) - 1)] != nn)]
                    raise KeyError(
                        f"train_knn base_ids not in base: "
                        f"{missing[:5].tolist()}")
                t.append(np.full(len(loc) - 1, loc[0], dtype=np.int64))
                m.append(loc[1:])
            if t:
                yield pd.DataFrame({"src": np.concatenate(t),
                                    "member": np.concatenate(m)})

    pair_schema = StructType([StructField("src", LongType()),
                              StructField("member", LongType())])
    # cached: e1 references fwd twice (forward + reverse legs), and an
    # uncached fwd would re-run the whole kNN GEMM + pass-1 DAG per leg
    fwd = (knn_lists.mapInPandas(to_local_pairs, schema=pair_schema)
           .groupBy("src").agg(F.collect_set("member").alias("cands"))
           .mapInPandas(prune_pools(-m_deg), schema=prune_schema)
           .cache())

    # ---- pass 2: reverse edges + degree-cap re-prune ---------------
    e1 = fwd.select("src", F.explode("nbrs").alias("dst"))
    adj_df = (e1.unionByName(e1.select(F.col("dst").alias("src"),
                                       F.col("src").alias("dst")))
              .groupBy("src").agg(F.collect_set("dst").alias("cands"))
              .mapInPandas(prune_pools(m_deg), schema=prune_schema))

    pdf2 = adj_df.toPandas()
    adj = [np.empty(0, dtype=np.int64)] * n
    for src, nbrs in zip(pdf2["src"].to_numpy(), pdf2["nbrs"].to_numpy()):
        adj[int(src)] = np.asarray(nbrs, dtype=np.int64)

    # ---- entry point (bit-equal to the one-task np.mean/argmin) ----
    centroid = vecs.mean(axis=0)
    ep = int(np.argmin(((vecs - centroid) ** 2).sum(axis=1)))

    # ---- pass 3: batched beam searches over the broadcast snapshot -
    bc_pad = sc.broadcast(core.pad_adjacency(adj, n))
    l_pjpq = params.l_pjpq

    def pass3(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        v64 = bc.value[1]
        pad = bc_pad.value
        nn = len(v64)
        for pdf in it:
            nodes = pdf["id"].to_numpy(dtype=np.int64)
            if len(nodes) == 0:
                continue
            traces = core.batch_supply_search_collect(
                pad, v64, nodes, ep, l_pjpq)
            srcs, outs = [], []
            for node, (ret_ids, ret_dists) in zip(nodes, traces):
                node = int(node)
                keep = ret_ids != node
                ret_ids, ret_dists = ret_ids[keep], ret_dists[keep]
                if len(ret_ids) == 0:
                    continue
                row = pad[node]
                seed_skip = set(int(x) for x in row[row < nn])
                pruned = core.occlusion_prune(
                    ret_ids, ret_dists, v64, m_deg, exclude=node,
                    backfill=False, seed_skip=seed_skip)
                if pruned:
                    srcs.append(node)
                    outs.append([int(x) for x in pruned])
            yield pd.DataFrame({"src": srcs, "nbrs": outs})

    # cached for the same two-leg reason as fwd (pass 3 is the most
    # expensive stage — one beam search per node)
    supply = spark.range(n).repartition(n_batches) \
        .mapInPandas(pass3, schema=prune_schema).cache()

    # ---- pass 3b: reverse supply edges + 2*M_pjbp cap ---------------
    e3 = supply.select("src", F.explode("nbrs").alias("dst"))
    supply_map_df = (
        e3.unionByName(e3.select(F.col("dst").alias("src"),
                                 F.col("src").alias("dst")))
        .groupBy("src").agg(F.collect_set("dst").alias("cands"))
        .mapInPandas(prune_pools(cap2), schema=prune_schema))
    pdf3 = supply_map_df.toPandas()
    supply_map = {int(s): [int(x) for x in nb]
                  for s, nb in zip(pdf3["src"].to_numpy(),
                                   pdf3["nbrs"].to_numpy())}

    # ---- merge (the one-task code shape, driver-side, no numpy) ----
    final_adj = []
    for node in range(n):
        base_nbrs = [int(x) for x in adj[node]]
        have = set(base_nbrs)
        added = 0
        for s in supply_map.get(node, []):
            if added >= cap2:
                break
            if s not in have:
                base_nbrs.append(s)
                have.add(s)
                added += 1
        final_adj.append(np.asarray(base_nbrs, dtype=np.int64))
    fwd.unpersist()
    supply.unpersist()
    bc.destroy()
    bc_pad.destroy()
    return RoarGraphIndex(ids=ids, vecs=vecs, adj=final_adj,
                          entry_point=ep)


def save_graph(index: RoarGraphIndex, spark: SparkSession,
               path: str) -> None:
    """Parquet adjacency + a one-row metadata table (entry point).

    Mirrors `SaveProjectionGraph`
    (`/root/reference/src/index_bipartite.cpp:3095-3108`): adjacency +
    entry point id; Parquet replaces the packed binary format.
    """
    index.to_dataframe(spark).write.mode("overwrite") \
        .parquet(f"{path}/adjacency.parquet")
    spark.createDataFrame(
        [(int(index.ids[index.entry_point]), len(index.ids))],
        "entry_point long, n_nodes long"
    ).write.mode("overwrite").parquet(f"{path}/meta.parquet")


def load_graph(spark: SparkSession, path: str,
               base: DataFrame, id_col: str = "vec_id",
               vec_col: str = "vec") -> RoarGraphIndex:
    ids, vecs = _collect_matrix(base, id_col, vec_col)
    id_to_ix = {int(v): i for i, v in enumerate(ids)}
    adj_pdf = spark.read.parquet(f"{path}/adjacency.parquet").toPandas()
    adj = [np.empty(0, dtype=np.int64)] * len(ids)
    for src, nbrs in zip(adj_pdf["src"].to_numpy(),
                         adj_pdf["nbrs"].to_numpy()):
        # normalize to first-occurrence order: arbitrary parquet may
        # duplicate ids within a row; in-repo builds never do, and the
        # search kernels (sequential and batch) assume unique rows
        adj[id_to_ix[int(src)]] = np.fromiter(
            dict.fromkeys(id_to_ix[int(x)] for x in nbrs), dtype=np.int64)
    meta = spark.read.parquet(f"{path}/meta.parquet").collect()[0]
    return RoarGraphIndex(ids=ids, vecs=vecs, adj=adj,
                          entry_point=id_to_ix[int(meta["entry_point"])])
