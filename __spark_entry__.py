"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Every query delegates to the engine package
(``cross_modal_multivector_search_spark``); see SURVEY.md §2 for the
operator inventory each entry covers. Scores are rounded to 5 decimals in
the *output only* (ranking happens on unrounded doubles in both engines)
so the value-hash is robust to summation-order float noise.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cross_modal_multivector_search_spark import testdata as TD
from cross_modal_multivector_search_spark.functions import vector as V
from cross_modal_multivector_search_spark.operators import (
    brute_force, graph_build, graph_search, mapping, recall, rerank,
    set_search, stats, topk,
)

K = 10
M = TD.M_FIXED


def _r(df: DataFrame, *cols: str, nd: int = 5) -> DataFrame:
    for c in cols:
        df = df.withColumn(c, F.round(F.col(c), nd))
    return df


def _queries_norm(spark, sf_dir):
    v = TD.embeddings_norm(spark, sf_dir)
    return v.filter(F.col("set_id") < TD.N_QUERY_SETS), v


# --------------------------------------------------------------------------
# vector-level exact kNN  (SURVEY §2.9 RankAllVectorsBySequentialScan,
# §2.3 distance kernels)
# --------------------------------------------------------------------------

def q_knn_ip(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = TD.embeddings_norm(spark, sf_dir)
    q = v.filter(F.col("vec_id") < TD.N_QUERY_VECS) \
         .select(F.col("vec_id").alias("query_id"), "vec")
    b = v.select(F.col("vec_id").alias("base_id"), "vec")
    out = brute_force.knn_exact_sql(q, b, K, metric="ip")
    return _r(out, "score").withColumn("rank", F.col("rank").cast("long"))


SQL_KNN_IP = f"""
WITH v AS ({TD.SQL_NORM_VECS}),
q AS (SELECT vec_id AS query_id, vec FROM v WHERE vec_id < {TD.N_QUERY_VECS}),
b AS (SELECT vec_id AS base_id, vec FROM v),
scored AS (
  SELECT q.query_id, b.base_id, list_dot_product(q.vec, b.vec) AS s,
         ROW_NUMBER() OVER (PARTITION BY q.query_id
                            ORDER BY list_dot_product(q.vec, b.vec) DESC,
                                     b.base_id) AS rank
  FROM q CROSS JOIN b)
SELECT query_id, rank, base_id, ROUND(s, 5) AS score
FROM scored WHERE rank <= {K}
"""


def q_knn_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = TD.embeddings_raw(spark, sf_dir)
    q = v.filter(F.col("vec_id") < TD.N_QUERY_VECS) \
         .select(F.col("vec_id").alias("query_id"), "vec")
    b = v.select(F.col("vec_id").alias("base_id"), "vec")
    out = brute_force.knn_exact_sql(q, b, K, metric="l2")
    return _r(out, "score").withColumn("rank", F.col("rank").cast("long"))


SQL_KNN_L2 = f"""
WITH v AS ({TD.SQL_RAW_VECS}),
q AS (SELECT vec_id AS query_id, vec FROM v WHERE vec_id < {TD.N_QUERY_VECS}),
b AS (SELECT vec_id AS base_id, vec FROM v),
scored AS (
  SELECT q.query_id, b.base_id,
         list_dot_product(q.vec, q.vec) - 2*list_dot_product(q.vec, b.vec)
           + list_dot_product(b.vec, b.vec) AS s
  FROM q CROSS JOIN b),
ranked AS (
  SELECT query_id, base_id, s,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY s ASC, base_id) AS rank
  FROM scored)
SELECT query_id, rank, base_id, ROUND(s, 5) AS score
FROM ranked WHERE rank <= {K}
"""


def q_knn_gemm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same result as q_knn_ip via the BLAS mapInPandas scale path."""
    v = TD.embeddings_norm(spark, sf_dir)
    q = v.filter(F.col("vec_id") < TD.N_QUERY_VECS) \
         .select(F.col("vec_id").alias("query_id"), "vec")
    b = v.select(F.col("vec_id").alias("base_id"), "vec")
    out = brute_force.knn_exact_gemm(q, b, K, metric="ip")
    return _r(out, "score").withColumn("rank", F.col("rank").cast("long"))


# --------------------------------------------------------------------------
# set-level exact top-k  (SURVEY §2.9 RerankAllBySequentialScan; §2.3
# smooth-Chamfer / MaxSim)
# --------------------------------------------------------------------------

_SQL_CHAMFER_SCORES = f"""
pairs AS (
  SELECT q.set_id AS q_set, q.vec_id AS q_vec,
         d.set_id AS d_set, d.vec_id AS d_vec,
         list_dot_product(q.vec, d.vec) AS sim
  FROM (SELECT * FROM v WHERE set_id < {TD.N_QUERY_SETS}) q CROSS JOIN v d),
lse1 AS (SELECT q_set, d_set, q_vec, ln(sum(exp(16.0 * sim))) AS l
         FROM pairs GROUP BY q_set, d_set, q_vec),
t1 AS (SELECT q_set, d_set, sum(l) AS s1, count(*) AS m
       FROM lse1 GROUP BY q_set, d_set),
lse2 AS (SELECT q_set, d_set, d_vec, ln(sum(exp(16.0 * sim))) AS l
         FROM pairs GROUP BY q_set, d_set, d_vec),
t2 AS (SELECT q_set, d_set, sum(l) AS s2 FROM lse2 GROUP BY q_set, d_set),
scores AS (
  SELECT t1.q_set, t1.d_set,
         (s1 / (m * 16.0) + s2 / (m * 16.0)) / 2.0 AS score
  FROM t1 JOIN t2 USING (q_set, d_set))
"""


def q_chamfer_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    q, v = _queries_norm(spark, sf_dir)
    out = set_search.set_topk_sql(q, v, K, metric="smooth_chamfer")
    return _r(out, "score").withColumn("rank", F.col("rank").cast("long"))


SQL_CHAMFER_TOPK = f"""
WITH v AS ({TD.SQL_NORM_VECS}),
{_SQL_CHAMFER_SCORES},
ranked AS (
  SELECT q_set AS query_set_id, d_set AS data_set_id, score,
         ROW_NUMBER() OVER (PARTITION BY q_set ORDER BY score DESC, d_set) AS rank
  FROM scores)
SELECT query_set_id, rank, data_set_id, ROUND(score, 5) AS score
FROM ranked WHERE rank <= {K}
"""


def q_chamfer_gemm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same result as q_chamfer_topk via the batched-GEMM scale path."""
    q, v = _queries_norm(spark, sf_dir)
    out = set_search.set_topk_gemm(q, v, K, metric="smooth_chamfer")
    return _r(out, "score").withColumn("rank", F.col("rank").cast("long"))


def q_maxsim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    q, v = _queries_norm(spark, sf_dir)
    out = set_search.set_topk_sql(q, v, K, metric="summed_max_similarity")
    return _r(out, "score").withColumn("rank", F.col("rank").cast("long"))


SQL_MAXSIM_TOPK = f"""
WITH v AS ({TD.SQL_NORM_VECS}),
pairs AS (
  SELECT q.set_id AS q_set, q.vec_id AS q_vec, d.set_id AS d_set,
         list_dot_product(q.vec, d.vec) AS sim
  FROM (SELECT * FROM v WHERE set_id < {TD.N_QUERY_SETS}) q CROSS JOIN v d),
best AS (SELECT q_set, d_set, q_vec, max(sim) AS b
         FROM pairs GROUP BY q_set, d_set, q_vec),
scores AS (SELECT q_set, d_set, sum(b) AS score FROM best GROUP BY q_set, d_set),
ranked AS (
  SELECT q_set AS query_set_id, d_set AS data_set_id, score,
         ROW_NUMBER() OVER (PARTITION BY q_set ORDER BY score DESC, d_set) AS rank
  FROM scores)
SELECT query_set_id, rank, data_set_id, ROUND(score, 5) AS score
FROM ranked WHERE rank <= {K}
"""


# --------------------------------------------------------------------------
# two-phase rerank  (SURVEY §2.9 MultiVectorReranker::Rerank)
# --------------------------------------------------------------------------

N_CAND = 30


def q_rerank_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    q, v = _queries_norm(spark, sf_dir)
    members = q.select(F.col("vec_id").alias("query_id"), "vec")
    b = v.select(F.col("vec_id").alias("base_id"), "vec")
    cands = brute_force.knn_exact_sql(members, b, N_CAND, metric="ip") \
        .select((F.col("query_id") / M).cast("long").alias("query_set_id"),
                F.col("base_id").alias("base_vec_id"))
    out = rerank.rerank(cands, q, v, K, metric="smooth_chamfer", m=M)
    return _r(out, "score").withColumn("rank", F.col("rank").cast("long"))


SQL_RERANK_TWO_PHASE = f"""
WITH v AS ({TD.SQL_NORM_VECS}),
members AS (SELECT vec_id AS query_id, set_id AS q_set, vec FROM v
            WHERE set_id < {TD.N_QUERY_SETS}),
knn AS (
  SELECT query_id, q_set, base_id, rank FROM (
    SELECT m.query_id, m.q_set, b.vec_id AS base_id,
           ROW_NUMBER() OVER (PARTITION BY m.query_id
                              ORDER BY list_dot_product(m.vec, b.vec) DESC,
                                       b.vec_id) AS rank
    FROM members m CROSS JOIN v b)
  WHERE rank <= {N_CAND}),
cand_sets AS (SELECT DISTINCT q_set, base_id // 5 AS d_set FROM knn),
pairs AS (
  SELECT cs.q_set, q.vec_id AS q_vec, cs.d_set, d.vec_id AS d_vec,
         list_dot_product(q.vec, d.vec) AS sim
  FROM cand_sets cs
  JOIN v q ON q.set_id = cs.q_set
  JOIN v d ON d.set_id = cs.d_set),
lse1 AS (SELECT q_set, d_set, q_vec, ln(sum(exp(16.0 * sim))) AS l
         FROM pairs GROUP BY q_set, d_set, q_vec),
t1 AS (SELECT q_set, d_set, sum(l) AS s1, count(*) AS m
       FROM lse1 GROUP BY q_set, d_set),
lse2 AS (SELECT q_set, d_set, d_vec, ln(sum(exp(16.0 * sim))) AS l
         FROM pairs GROUP BY q_set, d_set, d_vec),
t2 AS (SELECT q_set, d_set, sum(l) AS s2 FROM lse2 GROUP BY q_set, d_set),
scores AS (
  SELECT t1.q_set, t1.d_set,
         (s1 / (m * 16.0) + s2 / (m * 16.0)) / 2.0 AS score
  FROM t1 JOIN t2 USING (q_set, d_set)),
ranked AS (
  SELECT q_set AS query_set_id, d_set AS data_set_id, score,
         ROW_NUMBER() OVER (PARTITION BY q_set ORDER BY score DESC, d_set) AS rank
  FROM scores)
SELECT query_set_id, rank, data_set_id, ROUND(score, 5) AS score
FROM ranked WHERE rank <= {K}
"""


# --------------------------------------------------------------------------
# recall operators  (SURVEY §2.9 RecallCalculator)
# --------------------------------------------------------------------------

def q_recall_maxsim_vs_chamfer(spark: SparkSession, sf_dir: str) -> DataFrame:
    q, v = _queries_norm(spark, sf_dir)
    gt = set_search.set_topk_sql(q, v, K, metric="smooth_chamfer")
    res = set_search.set_topk_sql(q, v, K, metric="summed_max_similarity")
    out = recall.recall_at_k(res, gt, K)
    return _r(out, "recall").orderBy("query_set_id")


SQL_RECALL_MAXSIM_VS_CHAMFER = f"""
WITH v AS ({TD.SQL_NORM_VECS}),
{_SQL_CHAMFER_SCORES},
gt AS (
  SELECT q_set AS query_set_id, d_set AS data_set_id FROM (
    SELECT q_set, d_set,
           ROW_NUMBER() OVER (PARTITION BY q_set ORDER BY score DESC, d_set) AS rank
    FROM scores) WHERE rank <= {K}),
best AS (SELECT q_set, d_set, q_vec, max(sim) AS b
         FROM pairs GROUP BY q_set, d_set, q_vec),
mscores AS (SELECT q_set, d_set, sum(b) AS score FROM best GROUP BY q_set, d_set),
res AS (
  SELECT q_set AS query_set_id, d_set AS data_set_id FROM (
    SELECT q_set, d_set,
           ROW_NUMBER() OVER (PARTITION BY q_set ORDER BY score DESC, d_set) AS rank
    FROM mscores) WHERE rank <= {K}),
hits AS (
  SELECT res.query_set_id, count(*) AS n FROM res
  JOIN gt USING (query_set_id, data_set_id)
  GROUP BY res.query_set_id)
SELECT u.query_set_id,
       ROUND(COALESCE(n, 0) / {K}.0, 5) AS recall
FROM (SELECT DISTINCT query_set_id FROM gt) u
LEFT JOIN hits USING (query_set_id)
ORDER BY query_set_id
"""


def q_paired_recall_sibling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hit@k of same-set sibling vectors in self-excluded vector kNN."""
    v = TD.embeddings_norm(spark, sf_dir)
    q = v.filter(F.col("vec_id") < TD.N_QUERY_VECS) \
         .select(F.col("vec_id").alias("query_id"), "vec")
    b = v.select(F.col("vec_id").alias("base_id"), "vec")
    knn = brute_force.knn_exact_sql(q, b, K + 1, metric="ip") \
        .filter(F.col("query_id") != F.col("base_id"))
    knn = topk.grouped_topk(
        knn.drop("rank"), ["query_id"],
        [F.col("score").desc(), F.col("base_id").asc()], K)
    pairs = v.filter(F.col("vec_id") < TD.N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"),
        (F.col("set_id") * M).alias("gt_start"),
        (F.col("set_id") * M + M).alias("gt_end"))
    out = recall.paired_recall(knn, pairs, query_col="query_id",
                               id_col="base_id")
    return out.orderBy("query_id").withColumn("hit", F.col("hit").cast("long"))


SQL_PAIRED_RECALL_SIBLING = f"""
WITH v AS ({TD.SQL_NORM_VECS}),
q AS (SELECT vec_id AS query_id, set_id, vec FROM v
      WHERE vec_id < {TD.N_QUERY_VECS}),
knn AS (
  SELECT query_id, base_id FROM (
    SELECT q.query_id, b.vec_id AS base_id,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
                              ORDER BY list_dot_product(q.vec, b.vec) DESC,
                                       b.vec_id) AS rank
    FROM q CROSS JOIN v b WHERE q.query_id <> b.vec_id)
  WHERE rank <= {K}),
hits AS (
  SELECT DISTINCT k.query_id FROM knn k
  JOIN q ON k.query_id = q.query_id
  WHERE k.base_id >= q.set_id * {M} AND k.base_id < q.set_id * {M} + {M})
SELECT q.query_id, CASE WHEN hits.query_id IS NULL THEN 0 ELSE 1 END AS hit
FROM q LEFT JOIN hits ON q.query_id = hits.query_id
ORDER BY q.query_id
"""


# --------------------------------------------------------------------------
# build/eval aggregations  (SURVEY §2.5)
# --------------------------------------------------------------------------

def q_entry_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = TD.embeddings_norm(spark, sf_dir).select(F.col("vec_id"), "vec")
    return stats.entry_point(v)


SQL_ENTRY_POINT = f"""
WITH v AS ({TD.SQL_NORM_VECS}),
exploded AS (
  SELECT unnest(vec) AS x,
         unnest(range(1, len(vec) + 1)) AS pos
  FROM v),
c AS (SELECT list(mean ORDER BY pos) AS cv FROM
      (SELECT pos, avg(x) AS mean FROM exploded GROUP BY pos)),
dists AS (
  SELECT v.vec_id,
         list_dot_product(v.vec, v.vec)
           - 2 * list_dot_product(v.vec, c.cv)
           + list_dot_product(c.cv, c.cv) AS dist
  FROM v CROSS JOIN c)
SELECT vec_id AS entry_point, ROUND(dist, 6) AS dist
FROM dists ORDER BY dist ASC, vec_id ASC LIMIT 1
"""


def q_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-degree stats of the exact kNN graph over all vectors."""
    v = TD.embeddings_norm(spark, sf_dir)
    q = v.select(F.col("vec_id").alias("query_id"), "vec")
    b = v.select(F.col("vec_id").alias("base_id"), "vec")
    knn = brute_force.knn_exact_sql(q, b, K + 1, metric="ip") \
        .filter(F.col("query_id") != F.col("base_id"))
    knn = topk.grouped_topk(
        knn.drop("rank"), ["query_id"],
        [F.col("score").desc(), F.col("base_id").asc()], K)
    indeg = knn.groupBy("base_id").agg(F.count("*").alias("d"))
    allv = v.select(F.col("vec_id").alias("base_id"))
    deg = allv.join(indeg, "base_id", "left") \
        .select(F.coalesce(F.col("d"), F.lit(0)).alias("d"))
    return deg.agg(
        F.round(F.avg("d"), 5).alias("avg_indegree"),
        F.max("d").cast("long").alias("max_indegree"),
        F.min("d").cast("long").alias("min_indegree"),
        F.count("*").alias("n_nodes"))


SQL_DEGREE_STATS = f"""
WITH v AS ({TD.SQL_NORM_VECS}),
knn AS (
  SELECT query_id, base_id FROM (
    SELECT q.vec_id AS query_id, b.vec_id AS base_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY list_dot_product(q.vec, b.vec) DESC,
                                       b.vec_id) AS rank
    FROM v q CROSS JOIN v b WHERE q.vec_id <> b.vec_id)
  WHERE rank <= {K}),
deg AS (
  SELECT COALESCE(i.d, 0) AS d FROM v
  LEFT JOIN (SELECT base_id, count(*) AS d FROM knn GROUP BY base_id) i
    ON v.vec_id = i.base_id)
SELECT ROUND(avg(d), 5) AS avg_indegree, max(d) AS max_indegree,
       min(d) AS min_indegree, count(*) AS n_nodes
FROM deg
"""


def q_sim_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = TD.embeddings_norm(spark, sf_dir)
    q = v.filter(F.col("vec_id") < TD.N_QUERY_VECS)
    out = stats.cosine_histogram(q, v, bins=200)
    return out.orderBy("bucket")


SQL_SIM_HISTOGRAM = f"""
WITH v AS ({TD.SQL_NORM_VECS}),
q AS (SELECT * FROM v WHERE vec_id < {TD.N_QUERY_VECS}),
cos AS (
  SELECT list_dot_product(q.vec, b.vec) AS c FROM q CROSS JOIN v b)
SELECT LEAST(CAST(floor((c + 1.0) / 2.0 * 200) AS BIGINT), 199) AS bucket,
       count(*) AS cnt
FROM cos GROUP BY bucket ORDER BY bucket
"""


def q_cardinality_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variable-cardinality VID<->VSID mapping via window prefix-sum."""
    v = TD.embeddings_norm(spark, sf_dir)
    cards = v.select("set_id").distinct().withColumn(
        "cardinality", (F.col("set_id") % 5 + 1).cast("long"))
    return mapping.cardinality_mapping(cards).orderBy("set_id")


SQL_CARDINALITY_MAPPING = """
WITH s AS (SELECT DISTINCT vec_id // 5 AS set_id FROM embeddings),
c AS (SELECT set_id, (set_id % 5 + 1)::BIGINT AS cardinality FROM s)
SELECT set_id, cardinality,
       COALESCE(SUM(cardinality) OVER (ORDER BY set_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS first_vid
FROM c ORDER BY set_id
"""


def q_knn_significance(spark: SparkSession, sf_dir: str) -> DataFrame:
    q, v = _queries_norm(spark, sf_dir)
    members = q.select(F.col("vec_id").alias("query_id"), "vec")
    b = v.select(F.col("vec_id").alias("base_id"), "vec")
    vgt = brute_force.knn_exact_sql(members, b, K, metric="ip").select(
        F.col("query_id").alias("query_vec_id"), "rank",
        F.col("base_id").alias("base_vec_id"))
    sgt = set_search.set_topk_sql(q, v, K, metric="smooth_chamfer") \
        .select("query_set_id", "data_set_id")
    out = stats.knn_significance(vgt, sgt, M)
    return out.orderBy("rank").withColumn("rank", F.col("rank").cast("long"))


SQL_KNN_SIGNIFICANCE = f"""
WITH v AS ({TD.SQL_NORM_VECS}),
members AS (SELECT vec_id AS query_id, vec FROM v
            WHERE set_id < {TD.N_QUERY_SETS}),
vgt AS (
  SELECT query_id // 5 AS query_set_id, rank, base_id // 5 AS data_set_id
  FROM (
    SELECT m.query_id, b.vec_id AS base_id,
           ROW_NUMBER() OVER (PARTITION BY m.query_id
                              ORDER BY list_dot_product(m.vec, b.vec) DESC,
                                       b.vec_id) AS rank
    FROM members m CROSS JOIN v b)
  WHERE rank <= {K}),
{_SQL_CHAMFER_SCORES},
sgt AS (
  SELECT q_set AS query_set_id, d_set AS data_set_id FROM (
    SELECT q_set, d_set,
           ROW_NUMBER() OVER (PARTITION BY q_set ORDER BY score DESC, d_set) AS rank
    FROM scores) WHERE rank <= {K}),
hits AS (
  SELECT g.rank, count(*) AS hits FROM vgt g
  JOIN sgt s ON g.query_set_id = s.query_set_id
            AND g.data_set_id = s.data_set_id
  GROUP BY g.rank),
totals AS (SELECT rank, count(*) AS total FROM vgt GROUP BY rank)
SELECT t.rank, t.total, COALESCE(h.hits, 0) AS hits,
       ROUND(COALESCE(h.hits, 0) / t.total::DOUBLE, 6) AS hit_rate
FROM totals t LEFT JOIN hits h ON t.rank = h.rank
ORDER BY t.rank
"""


# --------------------------------------------------------------------------
# ANN path: RoarGraph build + adaptive multi-vector beam search + rerank
# (SURVEY §2.7, §2.8 — not SQL-expressible; driver records rows-only checks,
# the strong recall gate lives in tests/test_roargraph.py)
# --------------------------------------------------------------------------

_INDEX_CACHE: dict[str, graph_build.RoarGraphIndex] = {}


def _roar_index(spark: SparkSession, sf_dir: str) -> graph_build.RoarGraphIndex:
    if sf_dir not in _INDEX_CACHE:
        v = TD.embeddings_norm(spark, sf_dir)
        base = v.select("vec_id", "vec")
        params = graph_build.RoarGraphParams(m_sq=20, m_pjbp=12, l_pjpq=40)
        _INDEX_CACHE[sf_dir] = graph_build.build_roargraph(base, base, params)
    return _INDEX_CACHE[sf_dir]


def q_ann_multivector_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship ANN pipeline: graph search -> smooth-Chamfer rerank."""
    index = _roar_index(spark, sf_dir)
    q, v = _queries_norm(spark, sf_dir)
    out = graph_search.search_and_rerank(
        index, q, v, K,
        graph_search.SearchParams(min_pq=5, max_pq=400, budget=400), m=M)
    return _r(out, "score").withColumn("rank", F.col("rank").cast("long"))


def q_ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(budget, mean recall@10 vs exact oracle) — the reference's own
    reporting tuple (`tests/test_search_multivector_rerank.cpp:341-347`)."""
    index = _roar_index(spark, sf_dir)
    q, v = _queries_norm(spark, sf_dir)
    gt = set_search.set_topk_sql(q, v, K).select(
        "query_set_id", "data_set_id")
    rows = []
    for budget in (50, 100, 400):
        res = graph_search.search_and_rerank(
            index, q, v, K,
            graph_search.SearchParams(min_pq=5, max_pq=budget,
                                      budget=budget), m=M)
        mr = recall.mean_recall(
            res.select("query_set_id", "data_set_id"), gt, K
        ).collect()[0]["mean_recall"]
        rows.append((budget, round(float(mr), 5)))
    return spark.createDataFrame(rows, "budget long, mean_recall double")


# --------------------------------------------------------------------------
# generic relational path (engine completeness demo on the TPC-H-ish tables)
# --------------------------------------------------------------------------

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = TD.load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
             F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
             F.round(F.sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount"))), 4).alias("sum_disc_price"),
             F.round(F.avg("l_discount"), 6).alias("avg_disc"),
             F.count("*").alias("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       ROUND(sum(l_quantity), 4) AS sum_qty,
       ROUND(sum(l_extendedprice), 4) AS sum_base_price,
       ROUND(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       ROUND(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# driver contract
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: exact smooth-Chamfer set-level top-k at sf0.001."""
    return q_chamfer_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "knn_ip_topk": q_knn_ip,
        "knn_l2_topk": q_knn_l2,
        "knn_ip_topk_gemm": q_knn_gemm,
        "chamfer_topk": q_chamfer_topk,
        "chamfer_topk_gemm": q_chamfer_gemm,
        "maxsim_topk": q_maxsim_topk,
        "rerank_two_phase": q_rerank_two_phase,
        "recall_maxsim_vs_chamfer": q_recall_maxsim_vs_chamfer,
        "paired_recall_sibling": q_paired_recall_sibling,
        "entry_point": q_entry_point,
        "degree_stats": q_degree_stats,
        "sim_histogram": q_sim_histogram,
        "cardinality_mapping": q_cardinality_mapping,
        "knn_significance": q_knn_significance,
        "pricing_summary": q_pricing_summary,
        "ann_multivector_search": q_ann_multivector_search,
        "ann_recall_report": q_ann_recall_report,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "knn_ip_topk": SQL_KNN_IP,
        "knn_l2_topk": SQL_KNN_L2,
        "knn_ip_topk_gemm": SQL_KNN_IP,       # same semantics, GEMM path
        "chamfer_topk": SQL_CHAMFER_TOPK,
        "chamfer_topk_gemm": SQL_CHAMFER_TOPK,
        "maxsim_topk": SQL_MAXSIM_TOPK,
        "rerank_two_phase": SQL_RERANK_TWO_PHASE,
        "recall_maxsim_vs_chamfer": SQL_RECALL_MAXSIM_VS_CHAMFER,
        "paired_recall_sibling": SQL_PAIRED_RECALL_SIBLING,
        "entry_point": SQL_ENTRY_POINT,
        "degree_stats": SQL_DEGREE_STATS,
        "sim_histogram": SQL_SIM_HISTOGRAM,
        "cardinality_mapping": SQL_CARDINALITY_MAPPING,
        "knn_significance": SQL_KNN_SIGNIFICANCE,
        "pricing_summary": SQL_PRICING_SUMMARY,
    }
