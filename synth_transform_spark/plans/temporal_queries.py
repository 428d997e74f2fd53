"""Temporal-join queries: as-of join and bucketed range join (q49, q50).

The Spark implementations (operators/temporal.py) never use inequality
joins — as-of is a tagged-union window pass, range is a bucketed
equi-join. The oracles express the same SEMANTICS in the clearest SQL
(correlated max / inequality join): the driver compares results, not
plans, so the oracle can be naive where the engine must scale.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators import temporal
from ..sources.readers import load_table
from .registry import register


@register(
    "q49_asof_join",
    oracle="""
WITH c AS (
    SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
    FROM events WHERE event_type = 'click'
),
p AS (
    SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
    FROM events WHERE event_type = 'purchase'
),
m AS (
    SELECT p.event_id, MAX(c.ts) AS asof_ts
    FROM p JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts
    GROUP BY p.event_id
)
SELECT p.event_id, p.user_id, p.ts AS purchase_ts, m.asof_ts,
       CAST(EPOCH(DATE_TRUNC('second', p.ts)) AS BIGINT)
         - CAST(EPOCH(DATE_TRUNC('second', m.asof_ts)) AS BIGINT) AS lag_sec
FROM p LEFT JOIN m USING (event_id)
""",
    tags=("asof-join", "J14", "temporal"),
    bench=True,
)
def q49_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase joined to the user's latest click at-or-before it.

    Engine path: tagged union + one window pass (operators/temporal.asof_join)
    — one shuffle on user_id, no inequality join. Purchases with no prior
    click keep NULL asof_ts/lag_sec (left-outer as-of semantics).
    """
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    out = temporal.asof_join(purchases, clicks, key="user_id")
    return out.select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "asof_ts",
        (F.col("ts").cast("long") - F.col("asof_ts").cast("long")).alias("lag_sec"),
    )


@register(
    "q50_range_join",
    oracle="""
WITH e AS (
    SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
    FROM events WHERE event_type = 'error'
),
c AS (
    SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
    FROM events WHERE event_type = 'click'
)
SELECT e.event_id, e.user_id,
       CAST(COUNT(c.ts) AS BIGINT) AS n_in_range
FROM e LEFT JOIN c
  ON c.user_id = e.user_id
 AND ABS(CAST(EPOCH(DATE_TRUNC('second', c.ts)) AS BIGINT)
       - CAST(EPOCH(DATE_TRUNC('second', e.ts)) AS BIGINT)) <= 600
GROUP BY e.event_id, e.user_id
""",
    tags=("range-join", "J14", "temporal"),
    bench=True,
)
def q50_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per error event, the same user's clicks within +/- 10 minutes.

    Engine path: bucketed range join (operators/temporal.range_join_count)
    — constant 3x explode fan-out + equi-join on (user_id, bucket); the
    oracle states the same semantics as a naive inequality join.
    """
    events = load_table(spark, sf_dir, "events")
    errors = events.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select("user_id", "ts")
    out = temporal.range_join_count(errors, clicks, key="user_id", window_sec=600)
    return out.select("event_id", "user_id", "n_in_range")
