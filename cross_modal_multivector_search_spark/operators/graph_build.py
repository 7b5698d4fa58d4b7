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
Above that, shard the base table and build one sub-index per shard
(`build_sharded` pattern, SURVEY §7 Phase 5) — searches fan out per shard
and merge on (query, dist), the classic partial/final top-k.
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


def build_roargraph(base: DataFrame, train_queries: DataFrame,
                    params: RoarGraphParams = RoarGraphParams(),
                    id_col: str = "vec_id", vec_col: str = "vec",
                    train_knn: DataFrame | None = None) -> RoarGraphIndex:
    """Build the projected bipartite graph over ``base`` guided by
    ``train_queries`` (both (id, vec) DataFrames, rows pre-normalized).

    ``train_knn`` (query_id, rank, base_id) can be supplied (e.g. loaded
    from a previous exact-kNN materialization); otherwise it is computed
    here with the blocked-GEMM exact kNN — in Spark the offline oracle
    the reference reads from disk becomes a first-class stage
    (SURVEY §3.2 note).
    """
    spark = base.sparkSession
    ids, vecs = _collect_matrix(base, id_col, vec_col)
    n = len(ids)
    m_deg = params.m_pjbp

    if train_knn is None:
        train_knn = knn_exact_gemm(
            train_queries.select(F.col(id_col).alias("query_id"), vec_col),
            base.select(F.col(id_col).alias("base_id"), vec_col),
            params.m_sq, metric="ip")

    # ---- pass 1: per training query -> occlusion-pruned target lists.
    # groupBy(target) merges the pools of all training queries that chose
    # the same nearest base — a deterministic snapshot-merge of the
    # reference's per-thread overwrites.
    knn_lists = (
        train_knn.groupBy("query_id")
        .agg(F.sort_array(F.collect_list(F.struct("rank", "base_id")))
             .alias("l"))
        .select(F.col("l.base_id").alias("nn_base"))
    )
    bc = spark.sparkContext.broadcast((ids, vecs))

    def pass1(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        g_ids, g_vecs = bc.value
        g_map = {int(v): i for i, v in enumerate(g_ids)}
        pools: dict[int, set] = {}
        for pdf in it:
            for nn in pdf["nn_base"]:
                nn = [g_map[int(x)] for x in nn]
                tgt, rest = nn[0], nn[1:]
                pools.setdefault(tgt, set()).update(rest)
        out_src, out_nbrs = [], []
        for tgt, pool in pools.items():
            cand = np.fromiter((p for p in pool if p != tgt),
                               dtype=np.int64)
            if len(cand) == 0:
                continue
            dists = -(g_vecs[cand] @ g_vecs[tgt])
            pruned = core.occlusion_prune(cand, dists, g_vecs, m_deg,
                                          exclude=tgt)
            out_src.append(tgt)
            out_nbrs.append(pruned)
        yield pd.DataFrame({"src": out_src, "nbrs": out_nbrs})

    fwd = knn_lists.mapInPandas(pass1, schema=_GRAPH_SCHEMA)
    # merge pools for targets that landed in different partitions
    fwd = (fwd.select("src", F.explode("nbrs").alias("dst"))
           .groupBy("src").agg(F.collect_set("dst").alias("nbrs")))

    # ---- reverse edges + degree-overflow re-prune (one functional pass)
    edges = fwd.select("src", F.explode("nbrs").alias("dst"))
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    merged = (edges.unionByName(rev).distinct()
              .groupBy("src").agg(F.collect_list("dst").alias("cands")))

    def reprune(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        g_ids, g_vecs = bc.value
        for pdf in it:
            out_src, out_nbrs = [], []
            for src, cands in zip(pdf["src"], pdf["cands"]):
                src = int(src)
                cand = np.unique(np.asarray(cands, dtype=np.int64))
                cand = cand[cand != src]
                if len(cand) <= m_deg:
                    out_src.append(src)
                    out_nbrs.append([int(x) for x in cand])
                    continue
                dists = -(g_vecs[cand] @ g_vecs[src])
                pruned = core.occlusion_prune(cand, dists, g_vecs, m_deg,
                                              exclude=src)
                out_src.append(src)
                out_nbrs.append(pruned)
            yield pd.DataFrame({"src": out_src, "nbrs": out_nbrs})

    # Arrow fetch of the re-pruned graph (no per-row Row objects): the
    # adjacency is the one payload the driver must hold — it is the next
    # pass's broadcast snapshot
    graph1 = merged.mapInPandas(reprune, schema=_GRAPH_SCHEMA).toPandas()
    adj = [np.empty(0, dtype=np.int64)] * n
    for src, nbrs in zip(graph1["src"].to_numpy(),
                         graph1["nbrs"].to_numpy()):
        adj[int(src)] = np.asarray(nbrs, dtype=np.int64)

    # ---- entry point: centroid -> nearest base (CalculateProjectionep)
    centroid = vecs.mean(axis=0)
    ep = int(np.argmin(((vecs - centroid) ** 2).sum(axis=1)))

    # ---- pass 3: connectivity enhancement over a broadcast snapshot
    bc_graph = spark.sparkContext.broadcast((adj, ep))
    node_df = spark.range(n).select(F.col("id").alias("node"))

    def pass3(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        g_ids, g_vecs = bc.value
        snap_adj, snap_ep = bc_graph.value
        for pdf in it:
            nodes = pdf["node"].to_numpy(dtype=np.int64)
            # all of this partition's node searches in one batched pass
            traces = core.batch_supply_search_collect(
                snap_adj, g_vecs, nodes, snap_ep, params.l_pjpq)
            out_src, out_nbrs = [], []
            for node, (ret_ids, ret_dists) in zip(nodes, traces):
                node = int(node)
                keep = ret_ids != node
                ret_ids, ret_dists = ret_ids[keep], ret_dists[keep]
                if len(ret_ids) == 0:
                    out_src.append(node)
                    out_nbrs.append([])
                    continue
                pruned = core.occlusion_prune(
                    ret_ids, ret_dists, g_vecs, m_deg, exclude=node,
                    backfill=False,
                    seed_skip=set(int(x) for x in snap_adj[node]))
                out_src.append(node)
                out_nbrs.append(pruned)
            yield pd.DataFrame({"src": out_src, "nbrs": out_nbrs})

    supply = node_df.mapInPandas(pass3, schema=_GRAPH_SCHEMA)
    s_edges = supply.select("src", F.explode("nbrs").alias("dst"))
    s_rev = s_edges.select(F.col("dst").alias("src"),
                           F.col("src").alias("dst"))
    s_merged = (s_edges.unionByName(s_rev).distinct()
                .groupBy("src").agg(F.collect_list("dst").alias("cands")))

    cap2 = 2 * m_deg

    def reprune2(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        g_ids, g_vecs = bc.value
        for pdf in it:
            out_src, out_nbrs = [], []
            for src, cands in zip(pdf["src"], pdf["cands"]):
                src = int(src)
                cand = np.unique(np.asarray(cands, dtype=np.int64))
                cand = cand[cand != src]
                if len(cand) > cap2:
                    dists = -(g_vecs[cand] @ g_vecs[src])
                    cand = np.array(core.occlusion_prune(
                        cand, dists, g_vecs, cap2, exclude=src),
                        dtype=np.int64)
                out_src.append(src)
                out_nbrs.append([int(x) for x in cand])
            yield pd.DataFrame({"src": out_src, "nbrs": out_nbrs})

    supply_final = s_merged.mapInPandas(reprune2, schema=_GRAPH_SCHEMA) \
        .toPandas()

    # ---- merge <= 2*M_pjbp novel supply edges into the projection graph
    final_adj = []
    supply_map = {int(s): nb for s, nb in
                  zip(supply_final["src"].to_numpy(),
                      supply_final["nbrs"].to_numpy())}
    for node in range(n):
        base_nbrs = list(int(x) for x in adj[node])
        have = set(base_nbrs)
        added = 0
        for s in supply_map.get(node, []):
            if added >= cap2:
                break
            s = int(s)
            if s not in have:
                base_nbrs.append(s)
                have.add(s)
                added += 1
        final_adj.append(np.asarray(base_nbrs, dtype=np.int64))

    bc.destroy()
    bc_graph.destroy()
    return RoarGraphIndex(ids=ids, vecs=vecs, adj=final_adj, entry_point=ep)


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
