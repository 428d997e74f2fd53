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


def sharded_gaps(
    df: DataFrame,
    key_cols: list[str],
    sec_col: str = "sec",
    id_col: str | None = None,
    shard_seconds: int = 86400,
    keep_id: bool = False,
) -> DataFrame:
    """Per-event previous/next arrival seconds under the per-key global
    ``(sec, id)`` total order — WITHOUT a per-key (or global) window funnel.

    Semantically identical to::

        w = Window.partitionBy(*key_cols).orderBy(sec_col, id_col)
        df.select(..., F.lag(sec_col).over(w), F.lead(sec_col).over(w))

    but executed as a day-shard-and-stitch plan that survives 100 TB:

    1. shard every event by ``floor(sec / shard_seconds)`` (a pure
       function of the sort key, so same-second ties never straddle a
       shard boundary and within-shard order IS the global order
       restricted to the shard);
    2. lag/lead inside ``(key, shard)`` window partitions — the big
       window is hash-partitioned by (key, shard): per-reducer width is
       one key-day, not one key-stream;
    3. stitch the one boundary gap per adjacent shard pair from the
       per-shard (min_sec, max_sec) summary — a calendar-bounded
       relation (|keys| x |days| rows), windowed by key and broadcast
       back onto the shard join.

    The stitch window over the summary is the only non-sharded pass; its
    input is bounded by the calendar, never the corpus (for an empty
    ``key_cols`` it is the declared single-partition-over-|days|-rows
    exception). The stitch relation has |keys| x |active days| rows, so
    it is only *broadcast* back onto the events when ``key_cols`` is
    empty (|days| rows, trivially bounded); with keys present the join
    reuses the (key, shard) hash partitioning the window pass already
    paid for, so a shuffled join is near-free and safe at any key
    cardinality (per-user keys over a year would blow the 8 GB broadcast
    cap otherwise). Returns ``(*key_cols, sec_col, prv_sec, nxt_sec)``
    (plus ``id_col`` when ``keep_id``, so tests can compare row-level
    against the naive window) with nulls exactly at the per-key stream
    ends.
    """
    shard = F.floor(F.col(sec_col) / F.lit(shard_seconds)).cast("long")
    ev = df.withColumn("_shard", shard)
    order = [F.col(sec_col)] + ([F.col(id_col)] if id_col else [])
    w_in = Window.partitionBy(*key_cols, "_shard").orderBy(*order)
    id_out = [F.col(id_col)] if (keep_id and id_col) else []
    within = ev.select(
        *key_cols,
        "_shard",
        F.col(sec_col),
        *id_out,
        F.lag(sec_col).over(w_in).alias("_prv_in"),
        F.lead(sec_col).over(w_in).alias("_nxt_in"),
    )
    summary = ev.groupBy(*key_cols, "_shard").agg(
        F.min(sec_col).alias("_first"), F.max(sec_col).alias("_last")
    )
    w_sh = (
        Window.partitionBy(*key_cols).orderBy("_shard")
        if key_cols
        else Window.orderBy("_shard")
    )
    stitched = summary.select(
        *key_cols,
        "_shard",
        F.lag("_last").over(w_sh).alias("_prev_last"),
        F.lead("_first").over(w_sh).alias("_next_first"),
    )
    if not key_cols:
        stitched = F.broadcast(stitched)
    return within.join(stitched, [*key_cols, "_shard"]).select(
        *key_cols,
        F.col(sec_col),
        *id_out,
        F.coalesce("_prv_in", "_prev_last").alias("prv_sec"),
        F.coalesce("_nxt_in", "_next_first").alias("nxt_sec"),
    )
