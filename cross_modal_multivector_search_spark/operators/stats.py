"""Diagnostic aggregations from the reference's build/eval tooling.

  * centroid entry point: `CalculateProjectionep`
    (`/root/reference/src/index_bipartite.cpp:2006-2043`) — column-wise
    mean of all base vectors, then the id of the row nearest (L2) to it.
  * degree statistics (`/root/reference/src/index_bipartite.cpp:107-141`).
  * cosine-similarity histogram, 200 bins over [-1, 1]
    (`/root/reference/src/utility_methods.cpp:156-249`).
  * kNN-significance: how often vector-level kNN hits land in set-level
    top-k (`/root/reference/src/utility_methods.cpp:8-103`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import vector as V


def centroid(vecs: DataFrame, vec_col: str = "vec") -> DataFrame:
    """(pos, mean) — column-wise mean via posexplode + groupBy(pos).

    Scales to any row count: the shuffle is dim-wide, the aggregation is
    map-side partial. (The alternative — aggregate over zipped arrays —
    keeps a dim-length state per partition; posexplode parallelizes over
    both rows AND dimensions, which matters at dim=512+.)
    """
    return (
        vecs.select(F.posexplode(V.to_double(F.col(vec_col)))
                    .alias("pos", "x"))
        .groupBy("pos").agg(F.avg("x").alias("mean"))
    )


def entry_point(vecs: DataFrame, id_col: str = "vec_id",
                vec_col: str = "vec") -> DataFrame:
    """Graph entry point: id of the vector closest (L2) to the centroid."""
    # sort_array(collect_list(struct)) — collect_list order after a sort
    # is an implementation detail, not a contract
    c = centroid(vecs, vec_col).agg(
        F.array_sort(F.collect_list(F.struct("pos", "mean"))).alias("s")
    ).select(F.col("s.mean").alias("c"))
    with_dist = vecs.crossJoin(F.broadcast(c)).select(
        F.col(id_col),
        V.l2_sq(V.to_double(F.col(vec_col)), F.col("c")).alias("dist"))
    # min_by with id tiebreak via struct ordering (dist, id)
    return with_dist.agg(
        F.min(F.struct("dist", id_col)).alias("s")
    ).select(F.col(f"s.{id_col}").alias("entry_point"),
             F.round(F.col("s.dist"), 6).alias("dist"))


def graph_connectivity(graph: DataFrame, entry_point: int | None = None,
                       src_col: str = "src",
                       nbrs_col: str = "nbrs") -> DataFrame:
    """Connectivity diagnostic of an adjacency-list graph.

    Re-expresses the reference's `CollectPoints`/`dfs`/`findroot` check
    (`/root/reference/src/index_bipartite.cpp:3010-3093`) via the
    existing connected_components operator: (n_nodes, n_components[,
    reachable_from_ep] ). ``reachable_from_ep`` counts the entry point's
    weakly-connected component — equal to the reference's dfs-reachable
    set once the build's reverse-edge supply passes have run (RoarGraph
    materializes reverse edges, so weak == strong connectivity there).
    """
    from .dedup import connected_components
    edges = graph.select(F.col(src_col).alias("a"),
                         F.explode(F.col(nbrs_col)).alias("b"))
    comp = connected_components(edges)
    # nodes with no edges at all never reach the edge list: they are
    # their own singleton components
    comp_full = (graph.select(F.col(src_col).alias("node"))
                 .join(comp, "node", "left")
                 .select("node", F.coalesce("component", F.col("node"))
                         .alias("component")))
    agg = comp_full.agg(
        F.count("*").alias("n_nodes"),
        F.countDistinct("component").alias("n_components"))
    if entry_point is None:
        return agg
    ep_comp = comp_full.filter(F.col("node") == entry_point) \
        .select(F.col("component").alias("_epc"))
    reach = (comp_full.join(F.broadcast(ep_comp),
                            comp_full.component == F.col("_epc"))
             .agg(F.count("*").alias("reachable_from_ep")))
    return agg.crossJoin(reach)


def degree_stats(graph: DataFrame, nbrs_col: str = "nbrs") -> DataFrame:
    """avg/max/min out-degree of an adjacency-list graph."""
    return graph.agg(
        F.avg(F.size(nbrs_col)).alias("avg_degree"),
        F.max(F.size(nbrs_col)).alias("max_degree"),
        F.min(F.size(nbrs_col)).alias("min_degree"),
        F.count("*").alias("n_nodes"))


def cosine_histogram(queries: DataFrame, base: DataFrame, bins: int = 200,
                     vec_col: str = "vec") -> DataFrame:
    """Histogram of pairwise cosine over normalized rows: bin = floor((c+1)/2*bins).

    The reference clamps the last bin (cos == 1.0 -> bins-1).
    """
    q = V.with_l2_normalized(queries, vec_col, "_q").select("_q")
    b = V.with_l2_normalized(base, vec_col, "_b").select("_b")
    cos = V.dot(F.col("_q"), F.col("_b"))
    bucket = F.least(
        F.floor((cos + 1.0) / 2.0 * bins).cast("long"), F.lit(bins - 1))
    return (F.broadcast(q).crossJoin(b)
            .select(bucket.alias("bucket"))
            .groupBy("bucket").agg(F.count("*").alias("cnt")))


def knn_significance(vector_gt: DataFrame, set_gt: DataFrame,
                     m: int) -> DataFrame:
    """Per vector-kNN rank: fraction of hits whose set is set-level relevant.

    vector_gt(query_vec_id, rank, base_vec_id); set_gt(query_set_id,
    data_set_id). Joins via the fixed-m id projections.
    """
    v = vector_gt.select(
        (F.col("query_vec_id") / m).cast("long").alias("query_set_id"),
        F.col("rank"),
        (F.col("base_vec_id") / m).cast("long").alias("data_set_id"))
    hit = v.join(set_gt, ["query_set_id", "data_set_id"], "semi") \
        .groupBy("rank").agg(F.count("*").alias("hits"))
    total = v.groupBy("rank").agg(F.count("*").alias("total"))
    return total.join(hit, "rank", "left").select(
        "rank", "total", F.coalesce(F.col("hits"), F.lit(0)).alias("hits"),
        F.round(F.coalesce(F.col("hits"), F.lit(0)) / F.col("total"), 6)
        .alias("hit_rate"))
