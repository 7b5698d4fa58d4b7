"""Structured Streaming: the streaming runner must agree with batch.

One logic, two runners (streaming/events.py design): the windowed
aggregation executed via readStream + availableNow over the same parquet
must produce exactly the batch result.
"""

import tempfile

import pandas as pd
from pyspark.sql import functions as F

from cross_modal_multivector_search_spark import testdata as TD
from cross_modal_multivector_search_spark.streaming import events as SE

from conftest import SF_SMOKE


def test_stream_windowed_counts_equals_batch(spark):
    ev = TD.load_events(spark, SF_SMOKE)
    batch = SE.windowed_event_counts(ev, "1 hour").toPandas()

    # stream the same rows from a temp micro-batched parquet copy
    with tempfile.TemporaryDirectory() as d:
        src = f"{d}/events"
        ev.write.parquet(src)
        schema = spark.read.parquet(src).schema
        stream_df = SE.stream_windowed_counts(
            spark, src, schema, "1 hour", watermark="100 days")
        q = (stream_df.writeStream
             .format("memory").queryName("win_counts")
             .outputMode("complete")
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = spark.sql("SELECT * FROM win_counts").toPandas()

    key = ["window_start", "event_type"]
    pd.testing.assert_frame_equal(
        batch.sort_values(key).reset_index(drop=True),
        got.sort_values(key).reset_index(drop=True),
        check_dtype=False, atol=1e-9)


def test_stream_dedup_first_wins(spark):
    rows = [(1, "2024-01-01 10:00:00", "a"),
            (1, "2024-01-01 10:05:00", "b"),   # dup key 1 -> dropped
            (2, "2024-01-01 10:01:00", "c")]
    df = spark.createDataFrame(rows, "k long, ts_s string, payload string") \
        .select("k", F.to_timestamp("ts_s").alias("ts"), "payload")
    with tempfile.TemporaryDirectory() as d:
        src = f"{d}/src"
        df.write.parquet(src)
        schema = spark.read.parquet(src).schema
        stream = spark.readStream.schema(schema).parquet(src)
        out = SE.stream_dedup(stream, ["k"])
        q = (out.writeStream.format("memory").queryName("dedup_out")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(60)
        got = spark.sql("SELECT k FROM dedup_out").toPandas()
    assert sorted(got["k"].tolist()) == [1, 2]


def test_stateful_running_totals_match_batch(spark):
    """applyInPandasWithState running totals == batch groupBy at stream
    end (availableNow drains the whole source; last update per user is
    the final total)."""
    ev = TD.load_events(spark, SF_SMOKE)
    batch = {r["user_id"]: (r["n"], round(r["s"], 6))
             for r in ev.groupBy("user_id")
             .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
             .collect()}

    from cross_modal_multivector_search_spark.streaming import stateful
    with tempfile.TemporaryDirectory() as d:
        src = f"{d}/events"
        ev.write.parquet(src)
        schema = spark.read.parquet(src).schema
        stream = spark.readStream.schema(schema).parquet(src)
        out = stateful.running_user_totals(stream)
        q = (out.writeStream.format("memory").queryName("user_totals")
             .outputMode("update").trigger(availableNow=True).start())
        q.awaitTermination(120)
        got_df = spark.sql("SELECT * FROM user_totals").toPandas()
    # keep each user's LAST emitted update (cumulative => max n_events)
    got_df = got_df.sort_values("n_events").groupby("user_id").tail(1)
    got = {int(r.user_id): (int(r.n_events), round(float(r.sum_value), 6))
           for r in got_df.itertuples()}
    assert got == batch


def test_sessionize_gap_semantics(spark):
    rows = [
        (1, "2024-01-01 10:00:00"), (1, "2024-01-01 10:10:00"),
        (1, "2024-01-01 11:00:00"),            # 50 min gap -> new session
        (2, "2024-01-01 09:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts_s string") \
        .select("user_id", F.to_timestamp("ts_s").alias("ts"),
                F.lit(1.0).alias("value"))
    out = SE.sessionize(df, gap_min=30).orderBy("user_id", "session_idx")
    got = [(r["user_id"], r["session_idx"], r["n_events"])
           for r in out.collect()]
    assert got == [(1, 1, 2), (1, 2, 1), (2, 1, 1)]
