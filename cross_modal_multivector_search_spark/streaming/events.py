"""Structured-Streaming variants of the pipeline operators.

The reference is pure batch (SURVEY §2.10) — these are north-star
extensions for the streaming half of a training-data platform: windowed
event aggregation with watermarks, and gap-based sessionization.

Every streaming transform here is defined once and reused by the batch
path (the classic "one query, two runners" layout): the *logic* functions
take any DataFrame — batch or streaming — and the `stream_*` wrappers
attach source/sink/watermark. Tests run the stream with
``trigger(availableNow=True)`` over the events parquet and assert the
result equals the batch run of the same logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_MIN = 30


def windowed_event_counts(events: DataFrame,
                          window: str = "1 hour") -> DataFrame:
    """Tumbling-window counts + value sums per event_type.

    Batch and streaming share this plan; streaming adds a watermark
    upstream. The aggregation is partial-aggregatable (map-side combine).
    """
    return (events
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 5).alias("sum_value"))
            .select(F.col("w.start").alias("window_start"),
                    "event_type", "n_events", "sum_value"))


def sessionize(events: DataFrame,
               gap_min: int = SESSION_GAP_MIN) -> DataFrame:
    """Gap-based sessions per user (batch formulation).

    A new session starts when the gap to the previous event exceeds
    ``gap_min``. Window-function formulation: lag -> boundary flag ->
    running sum = session index. Shuffles once on user_id; session ids
    are deterministic (user_id, session_idx).
    """
    w = Window.partitionBy("user_id").orderBy("ts")
    # gap arithmetic in integer microseconds: exact, and identical to an
    # ANSI-SQL oracle's epoch_us() (second-level truncation would flip
    # boundaries on sub-second gaps)
    boundary = (
        F.when(F.col("prev_ts").isNull(), 1)
        .when((F.unix_micros("ts") - F.unix_micros("prev_ts"))
              > gap_min * 60 * 1_000_000, 1).otherwise(0))
    with_flag = (events
                 .withColumn("prev_ts", F.lag("ts").over(w))
                 .withColumn("is_new", boundary))
    w2 = (Window.partitionBy("user_id").orderBy("ts")
          .rowsBetween(Window.unboundedPreceding, 0))
    return (with_flag
            .withColumn("session_idx", F.sum("is_new").over(w2))
            .groupBy("user_id", "session_idx")
            .agg(F.min("ts").alias("session_start"),
                 F.max("ts").alias("session_end"),
                 F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 5).alias("sum_value")))


def stream_dedup(stream: DataFrame, key_cols: list[str],
                 watermark_col: str = "ts",
                 watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup: first occurrence per key wins.

    dropDuplicates under a watermark bounds state to the watermark
    horizon — the streaming twin of dedup.dedup_exact for continuous
    ingestion (late duplicates beyond the watermark pass through; exact
    global dedup is the batch operator's job).
    """
    return (stream.withWatermark(watermark_col, watermark)
            .dropDuplicates(key_cols))


def stream_windowed_counts(spark, parquet_dir: str, schema,
                           window: str = "1 hour",
                           watermark: str = "2 hours") -> DataFrame:
    """File-source streaming runner for windowed_event_counts.

    The watermark bounds state: late events beyond it are dropped, so
    executor state is O(active windows), not O(history) — the property
    that makes this run forever at 100 TB/day.
    """
    src = (spark.readStream.schema(schema).parquet(parquet_dir)
           .withWatermark("ts", watermark))
    return windowed_event_counts(src, window)
