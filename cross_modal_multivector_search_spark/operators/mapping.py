"""VectorID <-> VectorSetID mappings.

Reference: fixed cardinality vsid = vid / m
(`/root/reference/tests/test_search_multivector_rerank.cpp:241-244`);
variable cardinality loaded from a cardinality file and turned into both
closures via a running offset
(`/root/reference/src/multivector_reranker.cpp:767-809`). The prefix sum
becomes a window cumulative sum here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def vid_to_vsid_fixed(df: DataFrame, m: int, vec_id: str = "vec_id",
                      out: str = "set_id") -> DataFrame:
    return df.withColumn(out, (F.col(vec_id) / m).cast("long"))


def cardinality_mapping(cards: DataFrame, set_id: str = "set_id",
                        cardinality: str = "cardinality") -> DataFrame:
    """cards(set_id, cardinality) -> + first_vid (exclusive prefix sum).

    NOTE the single unbounded window: correct but single-task over the
    mapping table — the mapping is set-count-sized (small; one row per
    *set*, not per vector), so this is deliberately not sharded.
    """
    w = (Window.orderBy(F.col(set_id))
         .rowsBetween(Window.unboundedPreceding, -1))
    return cards.withColumn(
        "first_vid", F.coalesce(F.sum(cardinality).over(w), F.lit(0)))


def vid_to_vsid_variable(vecs: DataFrame, mapping: DataFrame,
                         vec_id: str = "vec_id") -> DataFrame:
    """Range-join each vector id into its owning set's [first_vid, +card)."""
    m = mapping.select("set_id", "first_vid", "cardinality")
    return vecs.join(
        F.broadcast(m),
        (vecs[vec_id] >= m.first_vid)
        & (vecs[vec_id] < m.first_vid + m.cardinality),
    ).drop("first_vid", "cardinality")
