"""Partitioning strategies for the 100 TB deployment.

Two techniques the engine's big joins/aggregations rely on at scale,
packaged with their plan-level guarantees (pinned in tests/test_plans.py):

  * bucketed co-located joins — write both sides bucketed by the join
    key; Spark's bucketed scan makes the sort-merge join shuffle-free
    (no Exchange on either side). This is how the vectors table and the
    candidate/set-mapping tables should be laid out at rest so the
    rerank gather join never reshuffles 100 TB of vectors.
  * salted aggregation — for skewed keys (one mega-document, one hot
    user), split each key into ``n_salts`` sub-keys, partially aggregate
    per sub-key, then finish per key. Two small shuffles instead of one
    skew-bound shuffle. (AQE's skew-join handling covers joins; salting
    covers aggregations, which AQE does not rebalance.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def ensure_parallelism(df: DataFrame,
                       min_partitions: int | None = None) -> DataFrame:
    """Repartition small inputs up to cluster parallelism.

    A small parquet file with one row group scans as ONE task, which
    serializes every CPU-heavy map stage built on it (shingle+md5
    pipelines) at test scale. At production scale a 100 TB scan already
    carries >= cluster-parallelism partitions, so this returns the input
    untouched — the round-robin shuffle only ever happens on inputs small
    enough for it to be trivial.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def write_bucketed(df: DataFrame, table: str, bucket_cols: Sequence[str],
                   n_buckets: int, sort_cols: Sequence[str] | None = None,
                   mode: str = "overwrite") -> None:
    """Persist as a bucketed (+optionally sorted) managed table.

    Drops any stale table AND its warehouse location first — a dangling
    location from a previous session makes saveAsTable fail even with
    mode=overwrite (the catalog entry is gone but the directory remains).
    """
    import shutil

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse").removeprefix("file:")
    shutil.rmtree(f"{warehouse}/{table.lower()}", ignore_errors=True)
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: Sequence[str], how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs Spark
    plans a shuffle-free sort-merge join (no Exchange above the scans).

    The merge hint keeps small tables off the broadcast path — a
    BroadcastExchange would defeat the co-location demonstration (and at
    real scale neither side broadcasts anyway).
    """
    return (spark.table(left_table).hint("merge")
            .join(spark.table(right_table).hint("merge"), list(on), how))


def salted_agg(df: DataFrame, key_cols: Sequence[str],
               aggs: dict[str, str], n_salts: int = 16) -> DataFrame:
    """Skew-proof groupBy for algebraic aggregates.

    aggs maps column -> fn in {sum, count, min, max}. Phase 1 groups on
    (key, salt) — the hot key's rows spread over n_salts reducers —
    phase 2 re-combines per key (n_salts rows per key, trivial).
    """
    combine = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    phase1_aggs: list[Column] = []
    for col, fn in aggs.items():
        out = f"{fn}_{col}"
        phase1_aggs.append(
            {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
            [fn](col).alias(out))
    salted = df.withColumn(
        "_salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(),
                        F.lit(n_salts)))
    phase1 = salted.groupBy(*key_cols, "_salt").agg(*phase1_aggs)
    phase2_aggs = [
        combine[fn](f"{fn}_{col}").alias(f"{fn}_{col}")
        for col, fn in aggs.items()
    ]
    return phase1.groupBy(*key_cols).agg(*phase2_aggs)
