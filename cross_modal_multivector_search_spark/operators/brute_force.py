"""Exact brute-force kNN (vector level) — the engine's oracle + GT generator.

Reference semantics: `RankAllVectorsBySequentialScan`
(`/root/reference/src/multivector_reranker.cpp:183-230`): queries x data
GEMM per data batch, partial top-k per batch, merge. Also the producer of
the RoarGraph build input `learn_base_knn`
(`/root/reference/src/index_bipartite.cpp:3111-3131`).

Two physical strategies:

  * ``knn_exact_sql`` — declarative: broadcast the (small) query side into
    a nested-loop join with JVM-side distance expressions, then windowed
    top-k. Fully Catalyst-visible (column pruning + codegen); the DuckDB
    oracle runs the literally-equivalent SQL.
  * ``knn_exact_gemm`` — scale path: queries collected to a NumPy matrix,
    broadcast to executors; ``mapInPandas`` computes a BLAS GEMM per Arrow
    batch of base vectors and emits only each batch's per-query top-k
    (the Spark analog of the reference's per-batch partial_sort at
    `:217-229`); a final grouped top-k merges. Shuffle volume is
    O(#batches * q * k), never O(n * q). Base side scales to any size —
    it is never collected, only scanned partition-parallel.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, LongType, StructField, StructType)

from ..functions import vector as V
from .topk import grouped_topk

#: metric name -> (column-expression builder, ascending?)  — ascending=True
#: means smaller = closer (distances); False means similarities rank desc.
_SQL_METRICS = {
    "ip": (lambda a, b: V.dot(a, b), False),        # similarity (dot)
    "cosine": (lambda a, b: V.dot(a, b), False),    # on pre-normalized rows
    "l2": (lambda a, b: V.l2_sq(a, b), True),       # squared L2 distance
}


def topk_cols_ascending(sims: np.ndarray, bids: np.ndarray,
                        kk: int) -> np.ndarray:
    """(n_rows, kk) column indices of each row's kk smallest values,
    ordered by (value asc, id asc) — BIT-deterministic.

    Fast path: argpartition to the kk smallest, then sort only those —
    O(n + k log k) per row instead of the O(n log n) full-row lexsort
    that dominated shard-sized kernels (a 15k-node shard spends more
    time sorting than in the GEMM). Boundary ties (several columns
    sharing the kk-th value, e.g. duplicate vectors) fall back to the
    full lexsort for just those rows, so the (value, id) order is
    always exactly the one the full sort would produce.
    """
    n = sims.shape[1]
    ids_b = np.broadcast_to(bids, sims.shape)
    if kk >= n:
        return np.lexsort((ids_b, sims), axis=1)[:, :kk]
    part = np.argpartition(sims, kk - 1, axis=1)[:, :kk]
    rr = np.arange(sims.shape[0])[:, None]
    sub_vals = sims[rr, part]
    vk = sub_vals.max(axis=1)
    sub_order = np.lexsort((bids[part], sub_vals), axis=1)
    out = part[rr, sub_order]
    # a row where more than kk columns are <= its kk-th value has a
    # tie straddling the partition boundary: the id-tiebreak may need
    # a column argpartition dropped
    ties = (sims <= vk[:, None]).sum(axis=1) != kk
    if ties.any():
        out[ties] = np.lexsort(
            (ids_b[ties], sims[ties]), axis=1)[:, :kk]
    return out


def knn_exact_sql(queries: DataFrame, base: DataFrame, k: int,
                  metric: str = "ip",
                  query_id: str = "query_id", base_id: str = "base_id",
                  vec_col: str = "vec") -> DataFrame:
    """Declarative exact kNN: broadcast(queries) NLJ base -> window top-k.

    Returns (query_id, rank, base_id, score) where score is the raw
    similarity (ip/cosine) or squared distance (l2), double precision.
    """
    expr_fn, asc = _SQL_METRICS[metric]
    q = queries.select(F.col(query_id), F.col(vec_col).alias("_qv"))
    b = base.select(F.col(base_id), F.col(vec_col).alias("_bv"))
    score = expr_fn(V.to_double(F.col("_qv")), V.to_double(F.col("_bv")))
    pairs = F.broadcast(q).crossJoin(b).select(
        query_id, base_id, score.alias("score"))
    order = [F.col("score").asc() if asc else F.col("score").desc(),
             F.col(base_id).asc()]
    return grouped_topk(pairs, [query_id], order, k).select(
        query_id, "rank", base_id, "score")


def knn_exact_gemm(queries, base: DataFrame, k: int,
                   metric: str = "ip",
                   query_id: str = "query_id", base_id: str = "base_id",
                   vec_col: str = "vec",
                   exclude_self: bool = False) -> DataFrame:
    """BLAS-blocked exact kNN with per-batch partial top-k.

    ``queries`` is a DataFrame, or a pre-fetched ``(ids, matrix)`` tuple.
    The query side must fit on the driver/executors (it is the small side
    of a cross-modal workload: |Q| << |base|). The base side streams
    through ``mapInPandas`` one Arrow batch at a time — O(batch) memory.

    ``exclude_self=True`` masks query_id == base_id matches inside the
    kernel (the reference's fill-diagonal for self-kNN build inputs) —
    cheaper and cleaner than fetching k+1 and re-ranking after a filter.
    """
    from ..util import cached_broadcast

    if metric not in _SQL_METRICS:
        raise ValueError(f"unknown metric {metric!r}")
    spark = base.sparkSession
    if isinstance(queries, tuple):
        # pre-fetched (ids, matrix) — callers that slice one Arrow fetch
        # into many kNN invocations (shard_self_knn) skip per-call jobs;
        # the cached tuple broadcasts once per session, knobs ride in
        # the closure
        bc = cached_broadcast(spark, queries)
    else:
        # Arrow fetch: the query side can be a whole shard's worth of
        # rows, where per-row Row objects are the slow path
        q_pdf = queries.select(query_id, vec_col).toPandas()
        q_ids = q_pdf[query_id].to_numpy(dtype=np.int64)
        q_mat = (np.vstack(q_pdf[vec_col].to_numpy()).astype(np.float64)
                 if len(q_pdf) else np.empty((0, 0)))
        bc = spark.sparkContext.broadcast((q_ids, q_mat))

    schema = StructType([
        StructField("query_id", LongType()),
        StructField("base_id", LongType()),
        StructField("score", DoubleType()),
    ])

    # Bound the sims matrix at (query block x Arrow batch): a
    # self-kNN-style caller makes |Q| == |base| (e.g. the 100k
    # single-index build), where an unchunked qm @ batch.T is
    # |Q| x 10k float64 = GBs PER TASK x 32 tasks. Query chunking
    # changes nothing about results — per-query rows are independent
    # and the per-batch partial top-k is already per query row.
    Q_BLOCK = 4096

    def score_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_ids, all_qm = bc.value
        met, kk, excl = metric, k, exclude_self
        if len(all_ids) == 0:
            return
        for pdf in it:
            bids = pdf.iloc[:, 0].to_numpy(dtype=np.int64)
            bmat = np.vstack(pdf.iloc[:, 1].to_numpy()).astype(np.float64)
            for q0 in range(0, len(all_ids), Q_BLOCK):
                ids = all_ids[q0:q0 + Q_BLOCK]
                qm = all_qm[q0:q0 + Q_BLOCK]
                if met == "l2":
                    # ||q-b||^2 = ||q||^2 - 2 q.b + ||b||^2 (FastL2)
                    sims = (
                        (qm * qm).sum(axis=1)[:, None]
                        - 2.0 * (qm @ bmat.T)
                        + (bmat * bmat).sum(axis=1)[None, :]
                    )
                    sign = 1.0  # ascending
                else:
                    sims = -(qm @ bmat.T)  # negated IP: asc = closest
                    sign = 1.0
                if excl:
                    sims[ids[:, None] == bids[None, :]] = np.inf
                kk_eff = min(kk, sims.shape[1])
                # per-batch partial top-k with the SAME deterministic
                # tiebreak as the global merge (dist asc, id asc) — a
                # bare argpartition drops an arbitrary member of a tie
                # straddling the k-th boundary, which the merge can
                # never recover; topk_cols_ascending partitions fast and
                # falls back to the full lexsort exactly on tie rows
                order = topk_cols_ascending(sims, bids, kk_eff)
                rows = np.repeat(np.arange(sims.shape[0]), kk_eff)
                cols = order.ravel()
                out_scores = sims[rows, cols] * sign
                if met != "l2":
                    out_scores = -out_scores  # report raw similarity
                out_q, out_b = ids[rows], bids[cols]
                if excl:
                    keep = np.isfinite(out_scores)  # drop self slots
                    out_q, out_b = out_q[keep], out_b[keep]
                    out_scores = out_scores[keep]
                yield pd.DataFrame({
                    "query_id": out_q,
                    "base_id": out_b,
                    "score": out_scores,
                })

    partials = base.select(
        F.col(base_id).cast("long"), vec_col
    ).mapInPandas(score_batches, schema=schema)
    asc = _SQL_METRICS[metric][1]
    order = [F.col("score").asc() if asc else F.col("score").desc(),
             F.col("base_id").asc()]
    out = grouped_topk(partials, ["query_id"], order, k)
    return out.select(F.col("query_id").alias(query_id), "rank",
                      F.col("base_id").alias(base_id), "score")
