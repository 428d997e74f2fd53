"""Window-shaped operators: z-score outliers and sessionization.

Reference lineage: z-score outlier detection (SURVEY.md §2.5 W4,
/root/reference/notebooks/outliers.ipynb cell 5 — scipy zscore ⇒ population
std-dev, ddof=0). Sessionization is the batch twin of the streaming
session-window operator (streaming/events.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def zscore_outliers(
    df: DataFrame, value_col: str, id_cols: list[str], threshold: float = 2.0
) -> DataFrame:
    """|z| > threshold rows, z = (x - mean) / stddev_pop over the whole input.

    The two corpus scalars come from a partial-aggregated ``agg`` (one
    distributed pass) broadcast-cross-joined back as a single row — NOT an
    empty-partition window, which would move the ENTIRE input to one
    partition (WindowExec warns exactly that) and serialize the scan.
    """
    stats = df.agg(
        F.avg(value_col).alias("_mu"), F.stddev_pop(value_col).alias("_sigma")
    )
    z = (F.col(value_col) - F.col("_mu")) / F.col("_sigma")
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn("z_score", F.round(z, 4))
        .filter(F.abs(F.col("z_score")) > threshold)
        .select(*id_cols, value_col, "z_score")
    )


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign session ids: a new session starts when the gap since the
    previous event of the same user exceeds ``gap_minutes``.

    lag + cumulative-sum over (user, ts, id) — one shuffle on user_col.
    Returns events + session_id (1-based per user).
    """
    order = [F.col(ts_col).asc(), F.col(id_col).asc()]
    w = Window.partitionBy(user_col).orderBy(*order)
    gap = F.col(ts_col).cast("long") - F.lag(F.col(ts_col).cast("long")).over(w)
    new_sess = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    wsum = (
        Window.partitionBy(user_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.withColumn("session_id", F.sum(new_sess).over(wsum))


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-user session profile: n_sessions, events/session, max session span."""
    s = sessionize(events, user_col, ts_col, id_col, gap_minutes)
    per_sess = s.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(F.col(ts_col).cast("long")) - F.min(F.col(ts_col).cast("long"))).alias(
            "span_sec"
        ),
    )
    return per_sess.groupBy(user_col).agg(
        F.max("session_id").alias("n_sessions"),
        F.round(F.avg(F.col("n_events").cast("double")), 4).alias("avg_events_per_session"),
        F.max("span_sec").alias("max_span_sec"),
    )
