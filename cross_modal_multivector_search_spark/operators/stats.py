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
                       nbrs_col: str = "nbrs",
                       max_bfs_rounds: int = 64,
                       local_threshold: int = 5_000_000) -> DataFrame:
    """Connectivity diagnostic of an adjacency-list graph.

    Re-expresses the reference's `CollectPoints`/`dfs`/`findroot` check
    (`/root/reference/src/index_bipartite.cpp:3010-3093`):
    (n_nodes, n_components[, reachable_from_ep]). Components are the
    weakly-connected partition; ``reachable_from_ep`` is TRUE directed
    reachability — a frontier-expansion BFS over the src->nbr edges
    (degree-bounded re-pruning can drop a reverse edge, so the entry
    point's weak component may overstate what a directed search can
    actually reach; the search path follows directed edges).

    Size gate (same rationale as connected_components): an edge list
    under ``local_threshold`` is resolved by ONE executor task — the
    task streams the checkpointed edge blocks plus the tagged node
    rows, union-finds components and runs the plain BFS in-memory —
    instead of ~3 Spark jobs per BFS round on a graph that fits in one
    task. r16: this used to fetch every edge to the driver (guide §5);
    now nothing but the 1-row result leaves the executors. The
    distributed path (join-per-round frontier expansion; RoarGraph
    diameters are O(log n)) is the beyond-memory shape.
    """
    spark = graph.sparkSession
    edges = graph.select(F.col(src_col).alias("a"),
                         F.explode(F.col(nbrs_col)).alias("b")) \
        .localCheckpoint()
    if local_threshold and edges.count() <= local_threshold:
        import pandas as pd
        # node rows ride along tagged with a NULL b so isolated nodes
        # (and the true node count) reach the same single task
        tagged = edges.select(F.col("a").cast("long"),
                              F.col("b").cast("long")) \
            .unionByName(graph.select(
                F.col(src_col).cast("long").alias("a"),
                F.lit(None).cast("long").alias("b")))
        ep = None if entry_point is None else int(entry_point)
        schema = ("n_nodes long, n_components long"
                  if ep is None else
                  "n_nodes long, n_components long, reachable_from_ep long")

        def resolve(it):
            parent: dict = {}
            adj: dict[int, list] = {}

            def find(v):
                r = v
                while parent[r] != r:
                    r = parent[r]
                while parent[v] != r:
                    parent[v], v = r, parent[v]
                return r

            for pdf in it:
                for x, y in zip(pdf["a"].to_numpy(), pdf["b"]):
                    x = int(x)
                    parent.setdefault(x, x)
                    if pd.isna(y):
                        continue
                    y = int(y)
                    parent.setdefault(y, y)
                    if ep is not None:
                        adj.setdefault(x, []).append(y)
                    rx, ry = find(x), find(y)
                    if rx != ry:
                        parent[max(rx, ry)] = min(rx, ry)
            n_nodes = len(parent)
            n_comp = sum(1 for v in parent if find(v) == v)
            if ep is None:
                yield pd.DataFrame({"n_nodes": [n_nodes],
                                    "n_components": [n_comp]})
                return
            seen = {ep}
            stack = [ep]
            while stack:
                for nb in adj.get(stack.pop(), ()):
                    if nb not in seen:
                        seen.add(nb)
                        stack.append(nb)
            yield pd.DataFrame({"n_nodes": [n_nodes],
                                "n_components": [n_comp],
                                "reachable_from_ep": [len(seen)]})

        return tagged.coalesce(1).mapInPandas(resolve, schema)

    from .dedup import connected_components
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
    reached = spark.createDataFrame([(int(entry_point),)], "node long") \
        .localCheckpoint()
    frontier = reached
    for _ in range(max_bfs_rounds):
        new = (frontier.join(edges, frontier.node == edges.a)
               .select(F.col("b").alias("node")).distinct()
               .join(reached, "node", "left_anti")
               .localCheckpoint())
        if new.limit(1).count() == 0:
            break
        reached = reached.unionByName(new).localCheckpoint()
        frontier = new
    else:
        raise RuntimeError(
            f"graph_connectivity: BFS frontier still growing after "
            f"{max_bfs_rounds} rounds — implausible diameter, inspect "
            "the graph")
    reach = reached.agg(F.count("*").alias("reachable_from_ep"))
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
