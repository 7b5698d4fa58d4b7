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


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ts as a proper (UTC-interpreted) timestamp.

    The driver's parquet encoding has varied across rounds: TIMESTAMP
    (NANOS) — which Spark's vectorized reader only accepts as long via
    the nanosAsLong flag — and plain timestamp[us], which Spark reads as
    TIMESTAMP_NTZ. Handle both: longs are nanos truncated to micros;
    NTZ is cast to the session timestamp under a pinned UTC session
    timezone so epoch extraction agrees with DuckDB's naive epoch_us.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    e = load(spark, sf_dir, "events")
    dt = dict(e.dtypes)["ts"]
    if dt.startswith("timestamp"):
        # naive wall-clock == UTC so both engines see identical epochs
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        return e.withColumn("ts", F.col("ts").cast("timestamp"))
    # integer DIV, not /: float division of int64 nanos loses precision
    # (2^63-scale values exceed double's 53-bit mantissa) and rounds the
    # microsecond up
    return e.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))


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
    e = load(spark, sf_dir, "embeddings")
    return V.with_l2_normalized(e, "embedding", "vec").select(
        F.col("vec_id").cast("long").alias("vec_id"),
        (F.col("vec_id") / M_FIXED).cast("long").alias("set_id"),
        "vec",
    )


def embeddings_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, vec) double vectors without normalization (l2 metric)."""
    e = load(spark, sf_dir, "embeddings")
    return e.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        V.to_double(F.col("embedding")).alias("vec"),
    )


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
