"""Custom stateful streaming: per-user running aggregates with
``applyInPandasWithState`` (the north-star "custom stateful operator"
slot — the reference itself has no streaming surface, SURVEY §2.10).

State design for unbounded streams: one fixed-size state row per user
(counts + sums + last-seen), updated per micro-batch; a processing-time
timeout evicts idle users, so state is O(active users) — the property
that keeps executors alive at 100 TB/day.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (DoubleType, LongType, StructField, StructType)

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("sum_value", DoubleType()),
])

STATE_SCHEMA = StructType([
    StructField("n_events", LongType()),
    StructField("sum_value", DoubleType()),
])


def _update_user(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
                 state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        state.remove()
        return
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    state.setTimeoutDuration(60 * 60 * 1000)   # evict after 1h idle
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n],
                        "sum_value": [s]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming DataFrame -> per-user running (n_events, sum_value).

    Emits one updated row per user per micro-batch (update output mode).
    """
    return (events.select("user_id", "value")
            .groupBy("user_id")
            .applyInPandasWithState(
                _update_user, OUTPUT_SCHEMA, STATE_SCHEMA,
                "update", GroupStateTimeout.ProcessingTimeTimeout))
