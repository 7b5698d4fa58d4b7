"""Recall evaluation operators.

Reference: `RecallCalculator::ComputeRecall`
(`/root/reference/src/multivector_reranker.cpp:610-643`): |results ∩ GT|/k
per query, averaged. `ComputePairedRecall` (`:645-669`): hit@k — 1 if any
result id falls in the query's paired id range [start, end), else 0
(t2i: gt = qid/5; i2t: [qid*5, qid*5+5)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def recall_at_k(results: DataFrame, gt: DataFrame, k: int,
                query_col: str = "query_set_id",
                id_col: str = "data_set_id") -> DataFrame:
    """Per-query recall@k: results and gt both (query, id) with rank<=k.

    Left join from the per-query universe of GT rows so queries with zero
    hits still report 0.0.
    """
    hits = results.join(gt, [query_col, id_col], "semi") \
        .groupBy(query_col).agg(F.count("*").alias("n_hits"))
    universe = gt.select(query_col).distinct()
    return universe.join(hits, query_col, "left").select(
        query_col,
        (F.coalesce(F.col("n_hits"), F.lit(0)) / F.lit(float(k))
         ).alias("recall"))


def mean_recall(results: DataFrame, gt: DataFrame, k: int,
                **kw) -> DataFrame:
    return recall_at_k(results, gt, k, **kw).agg(
        F.avg("recall").alias("mean_recall"))


def paired_recall(results: DataFrame, pairs: DataFrame,
                  query_col: str = "query_set_id",
                  id_col: str = "data_set_id") -> DataFrame:
    """Hit@k under range-pairing: pairs(query, gt_start, gt_end).

    A range join (the reference's `res >= start && res < end` membership
    test): broadcast the (small) pairing table.
    """
    j = results.join(
        F.broadcast(pairs), on=query_col, how="inner"
    ).filter((F.col(id_col) >= F.col("gt_start"))
             & (F.col(id_col) < F.col("gt_end")))
    hits = j.select(query_col).distinct().withColumn("hit", F.lit(1))
    return pairs.select(query_col).distinct().join(hits, query_col, "left") \
        .select(query_col, F.coalesce(F.col("hit"), F.lit(0)).alias("hit"))
