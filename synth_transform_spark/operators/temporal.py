"""Temporal join operators Spark lacks natively: as-of join and range join.

Both are expressed as compositions of existing DataFrame ops (no UDFs, no
nested-loop joins), per the engine's custom-operator policy:

- **as-of join** — for each left row (key, ts), the latest right row with
  the same key and ts_right <= ts. Implemented as a tagged UNION + one
  window pass: one shuffle on key, one sort within partitions — the same
  physical work a sort-merge join would do, but with NO inequality join
  (Spark would otherwise fall back to BroadcastNestedLoopJoin, the O(n*m)
  100 TB killer).

- **range join** — join left rows to right rows within a time window
  |ts_l - ts_r| <= w, equality on a key. Implemented by bucketing: each
  right row lands in one bucket of width >= w; each left row explodes to
  the (at most 3) buckets its window overlaps; the join is then a pure
  equi-join on (key, bucket) plus an exact range filter. Fan-out is
  bounded and constant, never O(n*m). This is the standard bucketed
  range-join strategy (cf. Databricks range-join hints / Flink interval
  joins) re-expressed with sequence + explode.

Reference lineage: the reference has no temporal joins (its closest shape
is the (guid, round)->age join, SURVEY.md §2.3 J14); these are north-star
operators for event-stream analytics at scale.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_left: str = "ts",
    ts_right: str = "ts",
    right_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Left as-of join: latest right row per key with ts_right <= ts_left.

    Returns all left columns plus ``asof_<c>`` for each requested right
    column and ``asof_ts`` (null when no right row precedes). Ties on the
    timestamp resolve to the right side (a right row AT ts_left matches).

    Scale: one hash shuffle on ``key`` + one in-partition sort over the
    union — no inequality join, no per-key collect. Skewed keys behave
    exactly like a skewed window partition (AQE-visible).
    """
    lcols = left.columns
    tagged_r = right.select(
        F.col(key),
        F.col(ts_right).alias("_ts"),
        F.lit(0).alias("_side"),  # right sorts first at equal ts => inclusive
        *[F.col(c).alias(f"asof_{c}") for c in right_cols],
        *[F.lit(None).alias(c) for c in lcols if c != key],
    )
    tagged_l = left.select(
        F.col(key),
        F.col(ts_left).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(tagged_r.schema[f"asof_{c}"].dataType).alias(f"asof_{c}")
          for c in right_cols],
        *[F.col(c) for c in lcols if c != key],
    )
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [
        F.last(F.when(F.col("_side") == 0, F.col(f"asof_{c}")), ignorenulls=True)
        .over(w)
        .alias(f"asof_{c}")
        for c in right_cols
    ]
    asof_ts = (
        F.last(F.when(F.col("_side") == 0, F.col("_ts")), ignorenulls=True)
        .over(w)
        .alias("asof_ts")
    )
    return (
        tagged_r.unionByName(tagged_l)
        .select(
            F.col(key),
            F.col("_ts"),
            F.col("_side"),
            *[F.col(c) for c in lcols if c != key],
            asof_ts,
            *carried,
        )
        .filter(F.col("_side") == 1)
        .select(
            *[F.col(c) if c != ts_left else F.col("_ts").alias(ts_left) for c in lcols],
            "asof_ts",
            *[F.col(f"asof_{c}") for c in right_cols],
        )
    )


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    key: str,
    window_sec: int,
    ts_left: str = "ts",
    ts_right: str = "ts",
) -> DataFrame:
    """Per left row, the COUNT of right rows with the same key within
    ``|ts_l - ts_r| <= window_sec`` (left outer: zero-match rows kept).

    Bucket width == window: a left row's window spans at most 3 buckets
    (prev, own, next), so the explode fan-out is exactly 3 regardless of
    data volume, and the join is an equi-join on (key, bucket). Time math is
    on second-truncated epochs (``ts.cast("long")``, the engine's session
    idiom), matching the oracle's ``EPOCH(DATE_TRUNC('second', ts))``.
    """
    lsec = F.col(ts_left).cast("long")
    rsec = F.col(ts_right).cast("long")
    r_b = right.select(
        F.col(key),
        rsec.alias("_rsec"),
        F.floor(rsec / window_sec).alias("_bucket"),
    )
    l_b = left.withColumn("_lsec", lsec).withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor((F.col("_lsec") - window_sec) / window_sec),
                F.floor((F.col("_lsec") + window_sec) / window_sec),
            )
        ),
    )
    matched = (
        l_b.join(r_b, [key, "_bucket"], "left")
        .withColumn(
            "_hit",
            F.when(
                F.abs(F.col("_rsec") - F.col("_lsec")) <= window_sec, F.lit(1)
            ).otherwise(F.lit(0)),
        )
    )
    return (
        matched.groupBy(*[F.col(c) for c in left.columns])
        .agg(F.sum("_hit").cast("long").alias("n_in_range"))
        .na.fill({"n_in_range": 0})
    )


def scd2_history(
    changes: DataFrame,
    key: str,
    ts_col: str,
    state_cols: tuple[str, ...],
    tiebreak: str | None = None,
) -> DataFrame:
    """Slowly-changing-dimension type-2 history from a change-event stream.

    Compresses per-key event streams into versioned validity intervals:
    one row per (key, state run) with ``valid_from`` (first ts observing the
    state), ``valid_to`` (ts of the next state change; NULL for the current
    row), and ``version`` (1-based per key). Consecutive events with an
    unchanged state merge into one interval; any change in ANY state column
    opens a new one.

    Ordering is (ts_col, tiebreak) so equal-timestamp events resolve
    deterministically; pass a unique event id as ``tiebreak``.

    Scale: two window passes, both ``partitionBy(key)`` — one shuffle on the
    key, two in-partition sorts (Spark reuses the sort for same-spec
    windows). State comparison is null-safe via a concat fingerprint, so
    wide state tuples compare one string. This is the standard
    change-data-capture → dimension-table build.
    """
    order = [F.col(ts_col).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    fp = F.concat_ws(
        "\x01",
        *[F.coalesce(F.col(c).cast("string"), F.lit("\x00null")) for c in state_cols],
    )
    marked = changes.withColumn("_fp", fp).withColumn(
        "_changed",
        F.when(
            F.lag("_fp").over(w).isNull() | (F.lag("_fp").over(w) != F.col("_fp")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    runs = marked.filter(F.col("_changed") == 1)
    w2 = Window.partitionBy(key).orderBy(*order)
    return runs.select(
        F.col(key),
        *[F.col(c) for c in state_cols],
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.row_number().over(w2).cast("long").alias("version"),
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str = "l_start",
    l_end: str = "l_end",
    r_start: str = "r_start",
    r_end: str = "r_end",
    bucket_sec: int = 3600,
) -> DataFrame:
    """Interval × interval overlap join WITHOUT a nested loop and WITHOUT
    a dedup shuffle.

    Each side explodes its [start, end] span onto fixed-width time
    buckets and the join is an equi-join on the bucket. A pair that
    overlaps several buckets would match several times — instead of
    `distinct`, each pair is KEPT exactly once, in the first bucket both
    intervals occupy: bucket == max(⌊l_start/w⌋, ⌊r_start/w⌋). That
    bucket always exists for a genuinely overlapping pair, so the filter
    is exact and the plan has no post-join dedup exchange.

    Fan-out per row is span/bucket_sec + 1 — bounded when interval
    lengths are (choose the width ≳ typical span). Overlap predicate is
    half-open-free: a.start <= b.end AND b.start <= a.end on
    second-truncated epochs (the engine's session idiom).
    Emits all left+right columns (callers project).
    """
    ls, le = F.col(l_start).cast("long"), F.col(l_end).cast("long")
    rs, re_ = F.col(r_start).cast("long"), F.col(r_end).cast("long")
    lb = left.withColumn("_lb0", F.floor(ls / bucket_sec)).withColumn(
        "_bucket", F.explode(F.sequence(F.col("_lb0"), F.floor(le / bucket_sec)))
    )
    rb = right.withColumn("_rb0", F.floor(rs / bucket_sec)).withColumn(
        "_bucket", F.explode(F.sequence(F.col("_rb0"), F.floor(re_ / bucket_sec)))
    )
    return (
        lb.join(rb, "_bucket")
        .filter(
            (ls <= re_)
            & (rs <= le)
            & (F.col("_bucket") == F.greatest(F.col("_lb0"), F.col("_rb0")))
        )
        .drop("_bucket", "_lb0", "_rb0")
    )


def cooldown_alerts(
    events: DataFrame,
    value_threshold: float = 15.0,
    cooldown_sec: int = 1800,
) -> DataFrame:
    """Threshold alerts with a per-user cooldown: an event fires iff its
    value exceeds the threshold AND the last FIRED alert for that user is
    more than ``cooldown_sec`` old.

    This is the canonical sequential recurrence a window CANNOT express:
    whether row t fires depends on which earlier rows FIRED, not merely on
    their values (contrast q205's CUSUM, which rewrites to running-min).
    So this is a declared Python stage — applyInPandas per user, sorted
    scan bounded by the user's candidate count; the grouping key bounds
    both memory and skew (a hot user is one pandas group, not a cluster
    straggler). Returns (user_id, event_id, alert_sec), deterministic via
    the (sec, event_id) scan order. user_id/event_id keep the INPUT column
    types (string ids work); alert_sec is always bigint.
    """
    import pandas as pd

    cand = events.filter(F.col("value") > value_threshold).select(
        "user_id",
        "event_id",
        F.col("ts").cast("long").alias("sec"),
    )
    # applyInPandas needs a declared output schema — derive the id column
    # types from the input so non-bigint (e.g. string) ids round-trip
    # instead of silently miscasting.
    id_types = {f.name: f.dataType.simpleString() for f in cand.schema.fields}
    out_schema = (
        f"user_id {id_types['user_id']}, event_id {id_types['event_id']}, "
        "alert_sec bigint"
    )

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["sec", "event_id"])
        users, ids, secs = [], [], []
        last = None
        for row in pdf.itertuples(index=False):
            if last is None or row.sec - last > cooldown_sec:
                users.append(row.user_id)
                ids.append(row.event_id)
                secs.append(row.sec)
                last = row.sec
        return pd.DataFrame(
            {"user_id": users, "event_id": ids, "alert_sec": secs}
        )

    return cand.groupBy("user_id").applyInPandas(scan, out_schema)
