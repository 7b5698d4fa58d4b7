"""Pure-SQL surface for the engine.

Registers the vector kernels as Spark SQL scalar functions (SQL-body
functions — JVM-side, codegen-friendly, no Python) plus the driver
tables as temp views, so every exact-path query the engine answers can
be written in plain ``spark.sql`` — the same dialect family as the
DuckDB oracles. Mirrors the reference's "expression library"
(`/root/reference/include/efanna2e/distance.h`) as a SQL vocabulary.

PERF NOTE: ``vec_normalize``/``vec_cos`` inline the norm aggregate into
per-element lambdas / both CASE branches — the O(dim^2) pitfall
``vector.with_l2_normalized`` stages away (SQL function bodies are
single expressions, so they cannot stage columns). For bulk
normalization in pure SQL, compute the norm once as its own projection:

    SELECT vec_scale(v, 1.0 / n) FROM (SELECT v, vec_norm(v) AS n ...)
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_FUNCTIONS = {
    "vec_dot": """
        CREATE OR REPLACE TEMPORARY FUNCTION vec_dot(
            a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE
        RETURN aggregate(zip_with(a, b, (x, y) -> x * y), 0D,
                         (s, x) -> s + x)""",
    "vec_norm": """
        CREATE OR REPLACE TEMPORARY FUNCTION vec_norm(a ARRAY<DOUBLE>)
        RETURNS DOUBLE
        RETURN sqrt(aggregate(zip_with(a, a, (x, y) -> x * y), 0D,
                              (s, x) -> s + x))""",
    "vec_l2sq": """
        CREATE OR REPLACE TEMPORARY FUNCTION vec_l2sq(
            a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE
        RETURN aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0D,
                         (s, x) -> s + x)""",
    "vec_normalize": """
        CREATE OR REPLACE TEMPORARY FUNCTION vec_normalize(
            a ARRAY<DOUBLE>) RETURNS ARRAY<DOUBLE>
        RETURN transform(a, x -> x / CASE WHEN vec_norm(a) > 0D
                                     THEN vec_norm(a) ELSE 1D END)""",
    "vec_scale": """
        CREATE OR REPLACE TEMPORARY FUNCTION vec_scale(
            a ARRAY<DOUBLE>, s DOUBLE) RETURNS ARRAY<DOUBLE>
        RETURN transform(a, x -> x * s)""",
    "vec_cos": """
        CREATE OR REPLACE TEMPORARY FUNCTION vec_cos(
            a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE
        RETURN vec_dot(a, b) / (CASE WHEN vec_norm(a) > 0D
                                THEN vec_norm(a) ELSE 1D END
                                * CASE WHEN vec_norm(b) > 0D
                                  THEN vec_norm(b) ELSE 1D END)""",
}

TABLES = ("region nation customer supplier part orders lineitem "
          "documents embeddings").split()


def register(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register the SQL vocabulary (+ the driver tables as views when
    ``sf_dir`` is given)."""
    for ddl in _FUNCTIONS.values():
        spark.sql(ddl)
    if sf_dir:
        for t in TABLES:
            spark.read.parquet(f"{sf_dir}/{t}.parquet") \
                .createOrReplaceTempView(t)
