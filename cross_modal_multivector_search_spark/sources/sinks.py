"""Result sinks mirroring the reference's experiment outputs.

  * per-query TSV rows (times, per-member candidate lists, recall,
    reranked ids): `tests/test_search_multivector_rerank.cpp:322-338`
  * aggregated tuple `(budget, recall@k, QPS, rerank_fraction)` appended
    to aggregated_results.txt: `:341-347`

Parquet is the engine's canonical sink; TSV exists for compatibility
with the reference's downstream scripts
(`scripts/utils/get_pair_recall_from_tsv.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_tsv(df: DataFrame, path: str, coalesce: bool = True) -> None:
    """Tab-separated sink; array columns serialized as comma lists."""
    out = df
    for name, dtype in df.dtypes:
        if dtype.startswith("array"):
            out = out.withColumn(name, F.concat_ws(",", F.col(name)))
    writer = out.coalesce(1) if coalesce else out
    writer.write.mode("overwrite").option("sep", "\t") \
        .option("header", "true").csv(path)


def per_query_report(results: DataFrame, recalls: DataFrame,
                     query_col: str = "query_set_id") -> DataFrame:
    """One row per query: reranked top-k ids + recall (the reference's
    per-query TSV row, minus wall-times which belong to bench)."""
    ranked = (results.groupBy(query_col)
              .agg(F.array_sort(F.collect_list(F.struct(
                  "rank", F.col("data_set_id").alias("id")))).alias("s"))
              .select(query_col, F.col("s.id").alias("reranked_ids")))
    return ranked.join(recalls, query_col, "left")


def aggregated_tuple(recalls: DataFrame, n_queries: int,
                     search_sec: float, rerank_sec: float,
                     budget: int) -> dict:
    """The reference's aggregate line: QPS = queries / (search + rerank)
    wall time, rerank_fraction = rerank share of that time."""
    mean_recall = recalls.agg(F.avg("recall")).first()[0]
    total = max(search_sec + rerank_sec, 1e-9)
    return {
        "budget": budget,
        "recall": round(float(mean_recall), 5),
        "qps": round(n_queries / total, 2),
        "rerank_fraction": round(rerank_sec / total, 4),
    }
