"""Adapters from the driver's synthetic tables to the engine's schemas.

The driver materializes TPC-H-ish tables plus `embeddings(vec_id,
embedding: array<float>, label)` and `documents(doc_id, text, lang,
source, n_chars)` at /root/testdata/sf*/ (see TESTDATA.md). The vector
surface of the engine works on (set_id, vec_id, vec) tables; we derive
multivector sets from `embeddings` with the reference's fixed-m id
projection (vsid = vid / m,
`/root/reference/tests/test_search_multivector_rerank.cpp:241-244`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import vector as V

M_FIXED = 5           # DIVE embeddings: 5 member vectors per set
N_QUERY_SETS = 10     # first 10 sets act as the query side
N_QUERY_VECS = 20     # first 20 vectors act as vector-level queries


# Plan-construction cache: building the same DataFrame for every query
# invocation costs ~0.1 s of py4j/parquet-footer round-trips per
# spark.read.parquet and ~0.3 s for the normalized-embeddings chain
# (measured round 15, cProfile: 2232 socket round-trips per 3 builds).
# A DataFrame is an immutable plan handle, so reusing one per
# (session, sf_dir, table) changes neither the physical plan nor any
# result — it only skips rebuilding identical plan trees. Keyed by
# applicationId so a stopped session (tests) never leaks stale handles.
_DF_CACHE: dict[tuple, DataFrame] = {}


def _session_key(spark: SparkSession) -> str:
    return spark.sparkContext.applicationId


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (_session_key(spark), sf_dir, name)
    if key not in _DF_CACHE:
        _DF_CACHE[key] = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    return _DF_CACHE[key]


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ts as a proper (UTC-interpreted) timestamp.

    The driver's parquet encoding has varied across rounds: TIMESTAMP
    (NANOS) — which Spark's vectorized reader only accepts as long via
    the nanosAsLong flag — and plain timestamp[us], which Spark reads as
    TIMESTAMP_NTZ. Handle both: longs are nanos truncated to micros;
    NTZ is cast to the session timestamp under a pinned UTC session
    timezone so epoch extraction agrees with DuckDB's naive epoch_us.
    """
    # nanosAsLong must be live BEFORE the parquet read that infers the
    # schema, so this reader never goes through the plain load() cache.
    # Both confs are (re)applied on cache HITS too: a sibling
    # newSession() shares the applicationId cache key but NOT the
    # session conf, so a hit must not skip the conf pins (r16 advice).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    key = (_session_key(spark), sf_dir, "__events_ts")
    hit = _DF_CACHE.get(key)
    if hit is not None:
        out, needs_utc = hit
        if needs_utc:
            spark.conf.set("spark.sql.session.timeZone", "UTC")
        return out
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    dt = dict(e.dtypes)["ts"]
    if dt.startswith("timestamp"):
        # naive wall-clock == UTC so both engines see identical epochs
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        out, needs_utc = e.withColumn(
            "ts", F.col("ts").cast("timestamp")), True
    else:
        # integer DIV, not /: float division of int64 nanos loses
        # precision (2^63-scale values exceed double's 53-bit mantissa)
        # and rounds the microsecond up
        out, needs_utc = e.withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000"))), False
    _DF_CACHE[key] = (out, needs_utc)
    return out


# row counts of driver parquet tables never change within a round, so the
# "is n > gate" decisions (e.g. embedding_near_dup's auto impl) can reuse
# one count per (sf_dir, table) instead of paying a Spark job per call
_NROWS_CACHE: dict[tuple[str, str], int] = {}


def n_rows(spark: SparkSession, sf_dir: str, name: str) -> int:
    key = (sf_dir, name)
    if key not in _NROWS_CACHE:
        _NROWS_CACHE[key] = load(spark, sf_dir, name).count()
    return _NROWS_CACHE[key]


def embeddings_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, set_id, vec) with L2-normalized double vectors.

    Normalization mirrors the reference's cosine->IP reduction applied at
    load time (`/root/reference/src/index_bipartite.cpp:73-79`).
    """
    key = (_session_key(spark), sf_dir, "__embeddings_norm")
    if key not in _DF_CACHE:
        e = load(spark, sf_dir, "embeddings")
        _DF_CACHE[key] = V.with_l2_normalized(e, "embedding", "vec").select(
            F.col("vec_id").cast("long").alias("vec_id"),
            (F.col("vec_id") / M_FIXED).cast("long").alias("set_id"),
            "vec",
        )
    return _DF_CACHE[key]


def embeddings_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, vec) double vectors without normalization (l2 metric)."""
    key = (_session_key(spark), sf_dir, "__embeddings_raw")
    if key not in _DF_CACHE:
        e = load(spark, sf_dir, "embeddings")
        _DF_CACHE[key] = e.select(
            F.col("vec_id").cast("long").alias("vec_id"),
            V.to_double(F.col("embedding")).alias("vec"),
        )
    return _DF_CACHE[key]


# DuckDB SQL fragments matching the above (the oracle side of the contract).
SQL_NORM_VECS = """
  SELECT vec_id,
         vec_id // 5 AS set_id,
         list_transform(embedding::DOUBLE[],
                        x -> x / sqrt(list_dot_product(embedding::DOUBLE[],
                                                       embedding::DOUBLE[]))) AS vec
  FROM embeddings
"""

SQL_RAW_VECS = """
  SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
"""
