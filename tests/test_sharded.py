"""Sharded build + fan-out search: the 100 TB execution shape.

Gate: sharded ANN recall vs the exact set-level oracle must match the
single-index quality bar at equal budget (each shard searches fully, so
sharding can only add candidates).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cross_modal_multivector_search_spark import testdata as TD
from cross_modal_multivector_search_spark.operators import (
    graph_build, recall, rerank, set_search, sharded,
)

from conftest import SF_SMOKE

N_SHARDS = 4


@pytest.fixture(scope="module")
def shard_graph(spark):
    vecs = TD.embeddings_norm(spark, SF_SMOKE)
    base = vecs.select("vec_id", "vec")
    g = sharded.build_sharded(
        base, N_SHARDS,
        graph_build.RoarGraphParams(m_sq=20, m_pjbp=12, l_pjpq=40)).cache()
    g.count()
    return g


def test_shard_graph_shape(spark, shard_graph):
    rows = shard_graph.collect()
    assert len(rows) == 500                      # every vector has a row
    shards = {r["shard"] for r in rows}
    assert shards == set(range(N_SHARDS))
    eps = [r for r in rows if r["is_entry"] == 1]
    assert len(eps) == N_SHARDS                  # one entry point per shard


def test_shard_assignment_matches_spark(spark, shard_graph):
    """Neighbor locality: edges never cross shards, checked against
    Spark's own hash assignment."""
    vecs = TD.embeddings_norm(spark, SF_SMOKE)
    assign = {r["vec_id"]: r["shard"] for r in
              vecs.withColumn(
                  "shard",
                  F.pmod(F.hash("vec_id"), F.lit(N_SHARDS)).cast("int"))
              .select("vec_id", "shard").collect()}
    for r in shard_graph.collect():
        assert assign[r["src"]] == r["shard"]
        for x in r["nbrs"]:
            assert assign[x] == r["shard"]


def test_build_from_knn_table_equals_in_task_knn(spark, shard_graph):
    """build_sharded(train_knn=shard_self_knn(...)) — the distributed
    kNN-as-build-input path (reference: the kNN file IS the build input)
    — must produce the same graph as the in-task blocked kNN fallback."""
    vecs = TD.embeddings_norm(spark, SF_SMOKE)
    base = vecs.select("vec_id", "vec")
    p = graph_build.RoarGraphParams(m_sq=20, m_pjbp=12, l_pjpq=40)
    knn = sharded.shard_self_knn(base, N_SHARDS, p.m_sq)
    g2 = sharded.build_sharded(base, N_SHARDS, p, train_knn=knn)
    ref = {r["src"]: (r["shard"], sorted(r["nbrs"]), r["is_entry"])
           for r in shard_graph.collect()}
    got = {r["src"]: (r["shard"], sorted(r["nbrs"]), r["is_entry"])
           for r in g2.collect()}
    assert got == ref


def test_sharded_search_recall(spark, shard_graph):
    vecs = TD.embeddings_norm(spark, SF_SMOKE)
    queries = vecs.filter(F.col("set_id") < 10)
    gt = set_search.set_topk_sql(queries, vecs, 10).select(
        "query_set_id", "data_set_id")
    cands = sharded.search_sharded(
        shard_graph, vecs.select("vec_id", "vec"), queries,
        min_pq=5, max_pq=100, budget=100, n_shards=N_SHARDS)
    out = rerank.rerank(cands.select("query_set_id", "base_vec_id"),
                        queries, vecs, 10, m=TD.M_FIXED)
    mr = recall.mean_recall(
        out.select("query_set_id", "data_set_id"), gt, 10
    ).collect()[0]["mean_recall"]
    assert mr >= 0.95, f"sharded recall {mr}"


def test_shard_self_knn_grouped_fetch_equivalence(spark):
    """A tiny driver_bytes_budget forces the multi-group sliced fetch;
    output must equal the single-fetch fast path, and empty input must
    raise loudly instead of TypeError-ing inside reduce()."""
    vecs = TD.embeddings_norm(spark, SF_SMOKE)
    base = vecs.select("vec_id", "vec")
    one = sharded.shard_self_knn(base, N_SHARDS, 5).collect()
    grouped = sharded.shard_self_knn(
        base, N_SHARDS, 5, driver_bytes_budget=10_000).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(one, key=key) == sorted(grouped, key=key)
    with pytest.raises(ValueError, match="empty"):
        sharded.shard_self_knn(base.filter(F.col("vec_id") < 0),
                               N_SHARDS, 5)
