"""Pure-SQL surface: spark.sql queries over the registered vocabulary
must match the DataFrame-API operators."""

import pandas as pd
from pyspark.sql import functions as F

from cross_modal_multivector_search_spark import sql_interface, testdata as TD
from cross_modal_multivector_search_spark.operators import brute_force

from conftest import SF_SMOKE


def test_sql_knn_matches_dataframe_api(spark):
    sql_interface.register(spark, SF_SMOKE)
    got = spark.sql("""
        WITH v AS (
          SELECT vec_id,
                 vec_normalize(transform(embedding, x -> CAST(x AS DOUBLE)))
                   AS vec
          FROM embeddings),
        scored AS (
          SELECT q.vec_id AS query_id, b.vec_id AS base_id,
                 vec_dot(q.vec, b.vec) AS score,
                 ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                    ORDER BY vec_dot(q.vec, b.vec) DESC,
                                             b.vec_id) AS rank
          FROM v q CROSS JOIN v b WHERE q.vec_id < 20)
        SELECT query_id, CAST(rank AS INT) AS rank, base_id,
               ROUND(score, 5) AS score
        FROM scored WHERE rank <= 10
    """).toPandas()

    v = TD.embeddings_norm(spark, SF_SMOKE)
    q = v.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "vec")
    b = v.select(F.col("vec_id").alias("base_id"), "vec")
    want = brute_force.knn_exact_sql(q, b, 10, metric="ip") \
        .withColumn("score", F.round("score", 5)).toPandas()

    key = ["query_id", "rank"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True)[want.columns],
        want.sort_values(key).reset_index(drop=True),
        check_dtype=False, atol=1e-9)


def test_sql_vocabulary_basics(spark):
    sql_interface.register(spark)
    row = spark.sql("""
        SELECT vec_dot(array(1D,2D), array(3D,4D)) AS d,
               vec_l2sq(array(0D,0D), array(3D,4D)) AS l2,
               vec_cos(array(1D,0D), array(1D,0D)) AS c,
               vec_norm(vec_normalize(array(3D,4D))) AS n
    """).collect()[0]
    assert row["d"] == 11.0
    assert row["l2"] == 25.0
    assert abs(row["c"] - 1.0) < 1e-12
    assert abs(row["n"] - 1.0) < 1e-12
