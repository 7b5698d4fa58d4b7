"""Per-group top-k — the workhorse primitive of the whole engine.

Replaces the reference's bounded priority queues / partial_sort
(`/root/reference/include/efanna2e/neighbor.h:137-226`,
`/root/reference/src/multivector_reranker.cpp:88-97`). Spark shapes:

  * per-group top-k  -> window row_number + filter (Catalyst turns the
    sort into a per-partition top-k with `WindowGroupLimit` pushdown);
  * global top-k     -> orderBy().limit(k) (`TakeOrderedAndProject`).

Ties are broken by an explicit deterministic tiebreaker column so results
are oracle-reproducible (the reference's partial_sort is *not*
deterministic under ties; we strengthen the contract).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def grouped_topk(df: DataFrame, group_cols: Sequence[str],
                 order_by: Sequence[Column], k: int,
                 rank_col: str = "rank") -> DataFrame:
    """Keep the k best rows per group; rank_col is 1-based rank."""
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= F.lit(k))
    )
