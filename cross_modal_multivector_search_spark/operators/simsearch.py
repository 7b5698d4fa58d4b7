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


def ivf_knn(queries: DataFrame, base: DataFrame, codebook: np.ndarray,
            k: int, nprobe: int,
            query_id: str = "query_id", base_id: str = "base_id",
            vec_col: str = "vec", exclude_self: bool = False,
            block_bytes: int = 200_000_000) -> DataFrame:
    """GEMM-blocked approximate kNN TABLE: each query searched exactly
    within its ``nprobe`` nearest codebook cells only. Returns
    (query_id, rank, base_id, score) — the same schema, score math
    (double-precision IP) and (score desc, id asc) determinism as
    ``knn_exact_gemm``, so the output drops into
    ``build_roargraph_dist(train_knn=)`` unchanged.

    This is the ANN bootstrap for the reference's build-input kNN file
    (`/root/reference/src/index_bipartite.cpp:3111-3150` —
    `LoadLearnBaseKNN` reads an OFFLINE table produced by brute-force
    tooling; generating it approximately with the engine's own IVF
    machinery replaces the O(|Q|·|base|·d) exact stage that dominates
    single-index builds past ~1M nodes). Gate it with
    ``knn_table_recall`` on a sampled exact table before trusting a
    configuration.

    Scale shape: one distributed assign pass over base (broadcast
    codebook), one map-only routing pass over queries, ONE
    cogroup-by-cell shuffle of each side, per-cell blocked GEMM bounded
    by ``block_bytes``, then the global per-query top-k merge (same
    shuffle `knn_exact_gemm` already pays). Nothing is ever |Q| x |base|;
    FLOPs shrink by ~n_cells/nprobe. At ``nprobe >= len(codebook)``
    the result is EXACTLY the exact table (cells partition the base) —
    the saturating-equivalence row the oracle checks.
    """
    from .brute_force import topk_cols_ascending

    n_cells = len(codebook)
    if nprobe < 1:
        raise ValueError(f"ivf_knn: nprobe must be >= 1, got {nprobe}")
    nprobe = min(nprobe, n_cells)
    C = np.ascontiguousarray(codebook, dtype=np.float64)

    assigned = assign_cells(
        base.select(F.col(base_id).alias("vec_id"), vec_col),
        codebook, keep_vec=True)

    from typing import Iterator

    import pandas as pd
    from pyspark.sql.types import (DoubleType, IntegerType, LongType,
                                   StructField, StructType)

    route_schema = StructType([
        StructField("query_id", LongType(), False),
        StructField(vec_col, queries.select(
            F.col(vec_col)).schema.fields[0].dataType, False),
        StructField("cell", LongType(), False),
    ])

    def route(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per query: nprobe best cells by (affinity desc, cell asc) —
        # topk_cols_ascending on the negated affinity gives the same
        # deterministic tiebreak every top-k in the engine uses
        cell_ids = np.arange(n_cells, dtype=np.int64)
        for pdf in it:
            if not len(pdf):
                continue
            X = np.asarray([np.asarray(v, dtype=np.float64)
                            for v in pdf[vec_col]])
            aff = -(X @ C.T)
            cols = topk_cols_ascending(aff, cell_ids, nprobe)
            qid = pdf[query_id].to_numpy(dtype=np.int64)
            rows = np.repeat(np.arange(len(pdf)), nprobe)
            yield pd.DataFrame({
                "query_id": qid[rows],
                vec_col: pdf[vec_col].to_numpy()[rows],
                "cell": cell_ids[cols.ravel()],
            })

    routed = queries.select(F.col(query_id), vec_col) \
        .mapInPandas(route, schema=route_schema)

    part_schema = StructType([
        StructField("query_id", LongType()),
        StructField("base_id", LongType()),
        StructField("score", DoubleType()),
    ])

    def per_cell(bpdf: pd.DataFrame, qpdf: pd.DataFrame) -> pd.DataFrame:
        if not len(bpdf) or not len(qpdf):
            return pd.DataFrame({"query_id": [], "base_id": [],
                                 "score": []}).astype(
                {"query_id": np.int64, "base_id": np.int64,
                 "score": np.float64})
        bids = bpdf["vec_id"].to_numpy(dtype=np.int64)
        bmat = np.vstack(bpdf[vec_col].to_numpy()).astype(np.float64)
        qids = qpdf["query_id"].to_numpy(dtype=np.int64)
        qmat = np.vstack(qpdf[vec_col].to_numpy()).astype(np.float64)
        # with exclude_self fetch one extra slot: the self match (if
        # present in this cell) is masked to inf and dropped AFTER the
        # partial top-k, so every query still surfaces its k best
        # non-self candidates of the cell
        kk = min(k + 1 if exclude_self else k, len(bids))
        if kk <= 0:
            return pd.DataFrame({"query_id": [], "base_id": [],
                                 "score": []}).astype(
                {"query_id": np.int64, "base_id": np.int64,
                 "score": np.float64})
        blk = max(1, int(block_bytes / (8 * len(bids))))
        frames = []
        for s in range(0, len(qids), blk):
            qi, qm = qids[s:s + blk], qmat[s:s + blk]
            sims = -(qm @ bmat.T)              # negated IP: asc = closest
            if exclude_self:
                sims[qi[:, None] == bids[None, :]] = np.inf
            order = topk_cols_ascending(sims, bids, kk)
            rows = np.repeat(np.arange(sims.shape[0]), kk)
            cols = order.ravel()
            scores = -sims[rows, cols]
            out_q, out_b = qi[rows], bids[cols]
            if exclude_self:
                keep = np.isfinite(scores)     # drop self slots
                out_q, out_b, scores = out_q[keep], out_b[keep], scores[keep]
            frames.append(pd.DataFrame({"query_id": out_q,
                                        "base_id": out_b,
                                        "score": scores}))
        return pd.concat(frames)

    partials = assigned.groupby("cell").cogroup(
        routed.groupby("cell")).applyInPandas(per_cell, schema=part_schema)
    order = [F.col("score").desc(), F.col("base_id").asc()]
    out = grouped_topk(partials, ["query_id"], order, k)
    return out.select(F.col("query_id").alias(query_id), "rank",
                      F.col("base_id").alias(base_id), "score")


def knn_table_recall(approx: DataFrame, exact: DataFrame, k: int,
                     query_id: str = "query_id",
                     base_id: str = "base_id") -> DataFrame:
    """One-row mean recall@k of an approximate kNN table against the
    exact table on the same queries — the measured gate an
    ANN-bootstrapped build input must pass before replacing the exact
    stage (`ivf_knn` docstring)."""
    from .recall import mean_recall
    return mean_recall(
        approx.filter(F.col("rank") <= k).select(query_id, base_id),
        exact.filter(F.col("rank") <= k).select(query_id, base_id),
        k, query_col=query_id, id_col=base_id)


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
