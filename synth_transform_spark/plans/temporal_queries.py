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


@register(
    "q143_interval_overlap",
    # Interval × interval overlap join (q50's range join generalised to
    # two interval sides): per-user-day activity spans vs twice-daily
    # maintenance windows. The engine never writes the inequality join —
    # both sides explode onto hour buckets, the equi-join matches
    # buckets, and each overlapping pair is kept exactly once in the
    # first bucket both intervals occupy (no dedup shuffle). The oracle
    # is the naive inequality join (plans aren't compared, results are).
    oracle="""
WITH act AS (
    SELECT user_id, CAST(ts AS DATE) AS day,
           MIN(ts) AS a_start, MAX(ts) AS a_end
    FROM events GROUP BY user_id, day
),
days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
wins AS (
    SELECT day, w.tag AS window_id,
           CAST(day AS TIMESTAMP) + w.off AS w_start,
           CAST(day AS TIMESTAMP) + w.off + INTERVAL 2 HOUR AS w_end
    FROM days,
         (VALUES ('am', INTERVAL 2 HOUR), ('pm', INTERVAL 14 HOUR)) AS w(tag, off)
)
SELECT a.user_id, CAST(a.day AS TIMESTAMP) AS day, w.window_id,
       CAST(EPOCH(DATE_TRUNC('second', LEAST(a.a_end, w.w_end))) AS BIGINT)
       - CAST(EPOCH(DATE_TRUNC('second', GREATEST(a.a_start, w.w_start))) AS BIGINT)
           AS overlap_sec
FROM act a
JOIN wins w
  ON w.day = a.day
 AND a.a_start <= w.w_end AND w.w_start <= a.a_end
""",
    tags=("temporal", "interval-join"),
)
def q143_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which users were active during maintenance windows, and for how
    long: bucketed interval-overlap join + overlap duration."""
    events = load_table(spark, sf_dir, "events")
    act = events.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(F.min("ts").alias("a_start"), F.max("ts").alias("a_end"))
    days = events.select(F.to_date("ts").alias("w_day")).distinct()
    wins = (
        days.select(
            "w_day",
            F.explode(
                F.array(
                    F.struct(F.lit("am").alias("tag"), F.lit(2).alias("off")),
                    F.struct(F.lit("pm").alias("tag"), F.lit(14).alias("off")),
                )
            ).alias("_w"),
        )
        .select(
            "w_day",
            F.col("_w.tag").alias("window_id"),
            (F.col("w_day").cast("timestamp") + F.col("_w.off") * F.expr("INTERVAL 1 HOUR")).alias("w_start"),
        )
        .withColumn("w_end", F.col("w_start") + F.expr("INTERVAL 2 HOURS"))
    )
    joined = temporal.interval_overlap_join(
        act, wins,
        l_start="a_start", l_end="a_end",
        r_start="w_start", r_end="w_end",
        bucket_sec=3600,
    ).filter(F.col("day") == F.col("w_day"))
    return joined.select(
        "user_id",
        F.col("day").cast("timestamp").alias("day"),
        "window_id",
        (
            F.least("a_end", "w_end").cast("long")
            - F.greatest("a_start", "w_start").cast("long")
        ).alias("overlap_sec"),
    )


# --------------------------------------------------------------------------
# q409 - as-of join WITH TOLERANCE (pandas merge_asof's `tolerance`):
# each purchase takes the user's latest click at-or-before it ONLY if
# that click is within the 30-minute staleness budget; older matches
# null out (attribution windows, sensor staleness caps). Composition:
# the q49 tagged-union as-of pass + a tolerance post-filter - correct
# because the latest click <= t is in [t - tol, t] iff ANY click is
# (it is the maximum), so no second join is needed.
# Parity: lag is an exact integer of truncated-second epochs; the
# tolerance compare is integer; stale matches null both asof columns.
# Scale: identical to q49 (one hash shuffle on user_id + one window
# pass; no inequality join) plus a row-local filter.
# --------------------------------------------------------------------------
_ASOF_TOL_SEC = 1800


@register(
    "q409_asof_tolerance_join",
    oracle=f"""
WITH c AS (
    SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
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
),
j AS (
    SELECT p.event_id, p.user_id, p.ts AS purchase_ts, m.asof_ts,
           CAST(EPOCH(DATE_TRUNC('second', p.ts)) AS BIGINT)
             - CAST(EPOCH(DATE_TRUNC('second', m.asof_ts)) AS BIGINT)
               AS raw_lag
    FROM p LEFT JOIN m USING (event_id)
)
SELECT event_id, user_id, purchase_ts,
       CASE WHEN raw_lag <= {_ASOF_TOL_SEC} THEN asof_ts END AS asof_ts,
       CASE WHEN raw_lag <= {_ASOF_TOL_SEC} THEN raw_lag END AS lag_sec,
       CAST(CASE WHEN raw_lag <= {_ASOF_TOL_SEC} THEN 1 ELSE 0 END
            AS BIGINT) AS matched,
       CAST(CASE WHEN raw_lag > {_ASOF_TOL_SEC} THEN 1 ELSE 0 END
            AS BIGINT) AS stale
FROM j
""",
    tags=("asof-join", "J14", "temporal"),
)
def q409_asof_tolerance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance-capped as-of join: (event_id, user_id, purchase_ts,
    asof_ts, lag_sec, matched, stale)."""
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    out = temporal.asof_join(purchases, clicks, key="user_id")
    raw_lag = F.col("ts").cast("timestamp").cast("long") - F.col(
        "asof_ts"
    ).cast("timestamp").cast("long")
    in_tol = raw_lag <= _ASOF_TOL_SEC
    return out.select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.when(in_tol, F.col("asof_ts")).alias("asof_ts"),
        F.when(in_tol, raw_lag).alias("lag_sec"),
        F.coalesce(in_tol.cast("long"), F.lit(0)).alias("matched"),
        F.coalesce((raw_lag > _ASOF_TOL_SEC).cast("long"), F.lit(0)).alias(
            "stale"
        ),
    )
