"""Embedding similarity search beyond the RoarGraph path.

North-star extras: brute-force cosine top-k is operators/brute_force.py;
here are the bucketed scale paths:

  * IVF (inverted file): coarse-quantize vectors to centroid cells, probe
    the nprobe nearest cells per query. Declarative: two joins + window
    top-k, fully oracle-checkable. At 100 TB the cell id is the partition
    key — each query's candidate scan prunes to nprobe cells
    (partition pruning on disk, no full scan).
  * random-hyperplane LSH bucketing for cosine: sign-bit signatures via
    a deterministic seeded projection matrix; near-dup joins then run
    within buckets only.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vector as V
from .topk import grouped_topk


def ivf_centroids(vecs: DataFrame, cell_col: str = "label",
                  vec_col: str = "vec", dim: int | None = None) -> DataFrame:
    """Per-cell mean vector in ONE shuffle: dim scalar `avg` aggregates
    (one per component) with map-side partial aggregation, reassembled
    into an array. Scale-safe: aggregation state is dim doubles per cell,
    never a collected vector list.

    Cells can come from any coarse quantizer; the driver tables ship a
    `label` column which we treat as the trained cell assignment.
    """
    if dim is None:
        dim = len(vecs.select(vec_col).head()[0])
    # cast the extracted element, NOT element_at(to_double(vec), i): the
    # latter re-evaluates the full-array transform per component (O(dim^2))
    return (vecs.groupBy(F.col(cell_col).alias("cell"))
            .agg(*[F.avg(F.element_at(F.col(vec_col), i + 1).cast("double"))
                   .alias(f"_m{i}") for i in range(dim)])
            .select("cell", F.array(*[F.col(f"_m{i}")
                                      for i in range(dim)]).alias("centroid")))


def ivf_search(queries: DataFrame, vecs: DataFrame,
               centroids: DataFrame, nprobe: int, k: int,
               cell_col: str = "label", query_id: str = "query_id",
               base_id: str = "base_id", vec_col: str = "vec") -> DataFrame:
    """IVF top-k: probe the nprobe best cells, exact search within them.

    Both joins broadcast the small side (queries, centroids); the base
    scan prunes to probed cells before any distance math.
    """
    q = queries.select(F.col(query_id), F.col(vec_col).alias("_qv"))
    cell_score = V.dot(V.to_double(F.col("_qv")), F.col("centroid"))
    probed = grouped_topk(
        F.broadcast(q).crossJoin(F.broadcast(centroids))
        .select(query_id, "cell", cell_score.alias("cscore")),
        [query_id], [F.col("cscore").desc(), F.col("cell").asc()], nprobe,
        rank_col="cell_rank").select(query_id, "cell")
    b = vecs.select(F.col(base_id), F.col(cell_col).alias("cell"),
                    F.col(vec_col).alias("_bv"))
    pairs = probed.join(b, "cell").join(F.broadcast(q), query_id).select(
        query_id, base_id,
        V.dot(V.to_double(F.col("_qv")), V.to_double(F.col("_bv")))
        .alias("score"))
    return grouped_topk(
        pairs, [query_id], [F.col("score").desc(), F.col(base_id).asc()],
        k).select(query_id, "rank", base_id, "score")


def kmeans(vecs: DataFrame, k: int, iters: int = 3,
           id_col: str = "vec_id", vec_col: str = "vec") -> DataFrame:
    """Deterministic Lloyd's k-means, pure DataFrame ops.

    Init = the k lowest-id vectors (deterministic, no RNG); each
    iteration is one broadcast nested-loop assign (argmin via min_by
    over the k centroids) + one posexplode mean. Returns the final
    assignment (id, cell). The per-iteration shuffle is the centroid
    recompute — O(rows x dim) exploded, map-side combined — so the loop
    scales like any aggregation; k centroids always broadcast.
    """
    cents = (vecs.orderBy(id_col).limit(k)
             .select(F.col(id_col), V.to_double(F.col(vec_col))
                     .alias("centroid"))
             .withColumn("cell", F.row_number().over(
                 Window.orderBy(id_col)) - 1)
             .select("cell", "centroid"))
    assign = None
    for _ in range(iters):
        # expansion form |v|^2 - 2 v.c + |c|^2 rather than sum((x-y)^2):
        # left-to-right dots + left-assoc combination match the ANSI
        # twin's FP sequence exactly, so a near-tie argmin can't assign
        # different cells across engines
        vv = V.to_double(F.col(vec_col))
        dist = (V.dot(vv, vv) - 2 * V.dot(vv, F.col("centroid"))) \
            + V.dot(F.col("centroid"), F.col("centroid"))
        assign = (vecs.crossJoin(F.broadcast(cents))
                  .groupBy(id_col)
                  .agg(F.min(F.struct(dist.alias("d"),
                                      F.col("cell"))).alias("s"))
                  .select(id_col, F.col("s.cell").alias("cell")))
        cents = (assign.join(vecs, id_col)
                 .select("cell", F.posexplode(V.to_double(F.col(vec_col)))
                         .alias("pos", "x"))
                 .groupBy("cell", "pos").agg(F.avg("x").alias("m"))
                 .groupBy("cell")
                 .agg(F.array_sort(F.collect_list(F.struct("pos", "m")))
                      .alias("s"))
                 .select("cell", F.col("s.m").alias("centroid")))
        cents = cents.cache()
        cents.count()   # materialize per iteration (truncates lineage)
    return assign


def train_codebook(vecs: DataFrame, k: int, iters: int = 10,
                   sample_n: int = 100_000, seed: int = 42,
                   id_col: str = "vec_id",
                   vec_col: str = "vec") -> np.ndarray:
    """Train a k-cell coarse quantizer: deterministic sample to the
    driver, NumPy Lloyd's on the sample, unit-normalized codebook out.

    The 100 TB shape of IVF training: the codebook is learned from a
    BOUNDED sample (sample_n x dim floats, independent of corpus size)
    and the full corpus is only ever touched by the distributed
    `assign_cells` pass. Sampling is md5-ordered (seeded shuffle any
    engine reproduces); init is seeded k-means++ (first-k init collapses
    on clustered data — dense mixture components grab many seeds, rival
    components none, and Lloyd's cannot split a merged cell afterwards);
    assignment is argmax dot against unit-norm centroids, consistent
    with `ivf_search`'s probe rule.
    """
    from . import _kmeans
    X = _kmeans.seeded_sample_matrix(vecs, sample_n, seed, id_col,
                                     vec_col)
    if len(X) < k:
        raise ValueError(f"train_codebook: sample ({len(X)}) < k ({k})")
    rng = np.random.default_rng([seed, k, len(X)])
    C = _kmeans.kmeanspp_init(X, k, rng)
    return _kmeans.lloyd_ip_normalized(X, C, iters)


def assign_cells(vecs: DataFrame, codebook: np.ndarray,
                 id_col: str = "vec_id",
                 vec_col: str = "vec",
                 keep_vec: bool = False) -> DataFrame:
    """(id, cell): nearest-codebook-cell assignment as one distributed
    GEMM pass — the scale path for k in the hundreds/thousands where
    the expression-based `kmeans` crossJoin argmin would emit k dot
    products per row in codegen.

    The codebook (k x dim, unit-norm rows) rides in the closure
    (broadcast once per executor); each Arrow batch does a single
    X @ C.T and argmax. Cell rule = argmax dot, the same rule
    `ivf_search` probes with, so assignment and probe can never
    disagree about a cell boundary.

    ``keep_vec=True`` retains the vector column in the output — the
    spatial-sharding caller (`sharded.spatial_shards`) needs (id, vec,
    cell) from the same single pass, with no join to recover vectors.
    """
    from typing import Iterator

    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    C = np.ascontiguousarray(codebook, dtype=np.float64).T  # (dim, k)
    fields = [StructField("vec_id", LongType(), False)]
    if keep_vec:
        fields.append(vecs.select(F.col(vec_col)).schema.fields[0])
    fields.append(StructField("cell", LongType(), False))
    schema = StructType(fields)

    def assign(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            X = np.asarray([np.asarray(v, dtype=np.float64)
                            for v in pdf[vec_col]])
            cells = np.argmax(X @ C, axis=1).astype(np.int64)
            out = {"vec_id": pdf[id_col].to_numpy()}
            if keep_vec:
                out[vec_col] = pdf[vec_col]
            out["cell"] = cells
            yield pd.DataFrame(out)

    return vecs.select(id_col, vec_col).mapInPandas(assign, schema=schema)


def codebook_df(spark, codebook: np.ndarray) -> DataFrame:
    """Codebook as the (cell, centroid) DataFrame `ivf_search` expects
    (LocalRelation — k x dim doubles, always broadcastable)."""
    return spark.createDataFrame(
        [(int(i), [float(x) for x in row])
         for i, row in enumerate(codebook)],
        "cell long, centroid array<double>")


def lsh_bucket_col(dim: int, n_planes: int = 8, seed: int = 42,
                   vec_col: str = "vec"):
    """Sign-bit LSH signature as a plain Column expression.

    The projection matrix is generated on the driver (seeded, tiny:
    n_planes x dim) and folded into a JVM-side expression — no UDF, no
    join: callers attach the bucket with a select, so bucketing adds
    zero shuffles of its own.
    """
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_planes, dim))
    sig = None
    for i in range(n_planes):
        plane = F.array(*[F.lit(float(x)) for x in planes[i]])
        bit = (V.dot(V.to_double(F.col(vec_col)), plane) > 0).cast("long")
        term = bit * (2 ** i)
        sig = term if sig is None else sig + term
    return sig


def lsh_buckets(vecs: DataFrame, n_planes: int = 8, seed: int = 42,
                id_col: str = "vec_id", vec_col: str = "vec") -> DataFrame:
    """(id, bucket): sign-bit signature under seeded random hyperplanes.
    Used to pre-bucket cosine near-dup joins."""
    first = vecs.select(vec_col).first()
    if first is None:
        raise ValueError("lsh_buckets: empty input DataFrame")
    dim = len(first[0])
    return vecs.select(
        F.col(id_col),
        lsh_bucket_col(dim, n_planes, seed, vec_col).alias("bucket"))
