"""Event-stream queries (batch twins of streaming/events.py jobs).

Tumbling-window aggregation and sessionization over the `events` table.
The same logic runs as Structured Streaming with watermarks in
streaming/events.py; batch evaluation here gives the oracle-checkable twin
(stream-batch equivalence is asserted in tests/test_streaming.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..operators import windows
from ..sources.readers import load_table
from .registry import register


@register(
    "q21_tumbling_window",
    oracle="""
SELECT TIME_BUCKET(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS total_value
FROM events
GROUP BY window_start, event_type
""",
    tags=("streaming-tumbling", "A1"),
    bench=True,
)
def q21_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "1 hour").getField("start").alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


@register(
    "q39_sliding_window",
    oracle="""
WITH slots AS (
    SELECT TIME_BUCKET(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)) AS slot,
           event_type, value
    FROM events
),
both_windows AS (
    SELECT slot AS window_start, event_type, value FROM slots
    UNION ALL
    SELECT slot - INTERVAL '30 minutes' AS window_start, event_type, value FROM slots
)
SELECT window_start, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 4) AS total_value
FROM both_windows
GROUP BY window_start, event_type
""",
    tags=("streaming-sliding", "A1"),
    bench=True,
)
def q39_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 min (each event lands in exactly 2).

    The oracle derives both containing windows per event from its 30-minute
    slot — the relational identity behind Spark's sliding window expansion.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "1 hour", "30 minutes").getField("start").alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


@register(
    "q40_first_event_dedup",
    oracle="""
WITH ranked AS (
    SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts,
           ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                              ORDER BY ts, event_id) AS rk,
           COUNT(*) OVER (PARTITION BY user_id, event_type) AS n_total
    FROM events
)
SELECT user_id, event_type, event_id AS first_event_id,
       ts AS first_ts, CAST(n_total - 1 AS BIGINT) AS n_dropped
FROM ranked WHERE rk = 1
""",
    tags=("streaming-dedup", "dedup-exact", "W1"),
)
def q40_first_event_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup keeping the first event per (user, type) — the batch twin
    of streaming dropDuplicatesWithinWatermark on the same keys."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        events.withColumn("rk", F.row_number().over(w))
        .withColumn(
            "n_total",
            F.count(F.lit(1)).over(Window.partitionBy("user_id", "event_type")),
        )
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("first_event_id"),
            F.col("ts").alias("first_ts"),
            (F.col("n_total") - 1).cast("long").alias("n_dropped"),
        )
    )


@register(
    "q22_session_stats",
    oracle="""
WITH ordered AS (
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events
),
flagged AS (
    SELECT user_id, event_id, ts,
           CASE WHEN LAG(ts) OVER w IS NULL
                  OR CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT)
                     - CAST(EPOCH(DATE_TRUNC('second', LAG(ts) OVER w)) AS BIGINT) > 1800
                THEN 1 ELSE 0 END AS new_sess
    FROM ordered
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
    SELECT user_id, event_id, ts,
           SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
    FROM flagged
),
per AS (
    SELECT user_id, session_id,
           COUNT(*) AS n_events,
           CAST(EPOCH(DATE_TRUNC('second', MAX(ts))) AS BIGINT)
             - CAST(EPOCH(DATE_TRUNC('second', MIN(ts))) AS BIGINT) AS span_sec
    FROM sess GROUP BY user_id, session_id
)
SELECT user_id,
       CAST(MAX(session_id) AS BIGINT) AS n_sessions,
       ROUND(AVG(CAST(n_events AS DOUBLE)), 4) AS avg_events_per_session,
       MAX(span_sec) AS span_max_sec
FROM per
GROUP BY user_id
""",
    tags=("streaming-session", "W-frame"),
    bench=True,
)
def q22_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    out = windows.session_stats(events, gap_minutes=30)
    return out.select(
        "user_id",
        F.col("n_sessions").cast("long").alias("n_sessions"),
        "avg_events_per_session",
        F.col("max_span_sec").alias("span_max_sec"),
    )


# --------------------------------------------------------------------------
# q57 — the streaming family inside the driver's hash gate (SURVEY §2.9):
# this query EXECUTES the custom stateful streaming job (applyInPandasWithState
# running totals, availableNow replay, update mode), reduces the per-batch
# emissions to each user's final state, and hash-matches the batch-twin
# oracle. Stream-batch equivalence is thereby driver-verified, not only
# pytest-verified. 4dp rounding is safe here: values carry 2 decimals, so
# the exact total sits ~0.005 from any rounding boundary — micro-batch
# accumulation order cannot flip the hash.
# --------------------------------------------------------------------------
@register(
    "q57_streaming_running_totals",
    oracle="""
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(CAST(SUM(value) AS DOUBLE), 4) AS total_value
FROM events
GROUP BY user_id
""",
    tags=("streaming-stateful",),
)
def q57_streaming_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming import events as se
    from ..streaming.stateful import running_user_totals

    stream = se.read_events_stream(spark, sf_dir)
    out = se.run_available_now(
        running_user_totals(stream), "q57_sink", output_mode="update"
    )
    # final state per user = the emission with the highest running count
    # (monotone per user; a user absent from later batches simply has no
    # later emission, so the max is unique)
    return out.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("total_value", "n_events").alias("total_value"),
    )


# --------------------------------------------------------------------------
# q67 — the stream-stream interval join EXECUTED as a streaming job
# (availableNow → memory sink), like q57. The oracle is the batch twin: a
# watermarked stream-stream inner join over fully-arrived data emits
# exactly the rows the static inequality join produces (the watermark only
# bounds buffered state, it drops nothing under availableNow replay) —
# the equivalence pytest pins this; the driver gate now re-proves it
# against DuckDB every round.
# --------------------------------------------------------------------------
@register(
    "q67_streaming_interval_join",
    oracle="""
SELECT l.event_id, l.user_id,
       DATE_TRUNC('second', l.ts) AS ts,
       DATE_TRUNC('second', r.ts) AS matched_ts
FROM events l
JOIN events r
  ON r.user_id = l.user_id
 AND DATE_TRUNC('second', r.ts)
     BETWEEN DATE_TRUNC('second', l.ts) - INTERVAL 600 SECONDS
         AND DATE_TRUNC('second', l.ts) + INTERVAL 600 SECONDS
WHERE l.event_type = 'error' AND r.event_type = 'click'
""",
    tags=("streaming-interval-join",),
)
def q67_streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming import events as se

    stream = se.read_events_stream(spark, sf_dir)
    errors = stream.filter(F.col("event_type") == "error")
    clicks = stream.filter(F.col("event_type") == "click")
    return se.run_available_now(
        se.interval_join(errors, clicks, window_sec=600), "q67_sink"
    )


# --------------------------------------------------------------------------
# q70 — hypertable-style continuous aggregate: one pass produces the
# day+hour, day, and grand-total resolutions via ROLLUP on the time-bucket
# hierarchy (TimescaleDB's continuous-aggregate shape, re-expressed as a
# Catalyst grouping-sets aggregation — partial aggs absorb the fan-in and
# each resolution is a grouping set, not a second scan).
# --------------------------------------------------------------------------
@register(
    "q70_hypertable_rollup",
    oracle="""
SELECT DATE_TRUNC('day', CAST(ts AS TIMESTAMP))  AS day_bucket,
       DATE_TRUNC('hour', CAST(ts AS TIMESTAMP)) AS hour_bucket,
       CAST(GROUPING(DATE_TRUNC('day', CAST(ts AS TIMESTAMP))) * 2
            + GROUPING(DATE_TRUNC('hour', CAST(ts AS TIMESTAMP))) AS BIGINT)
           AS lvl,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS total_value,
       ROUND(AVG(value), 4) AS avg_value
FROM events
GROUP BY ROLLUP (DATE_TRUNC('day', CAST(ts AS TIMESTAMP)),
                 DATE_TRUNC('hour', CAST(ts AS TIMESTAMP)))
""",
    tags=("hypertable-rollup", "A9", "A1"),
)
def q70_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").alias("day_bucket")
    hour = F.date_trunc("hour", "ts").alias("hour_bucket")
    return events.rollup(day, hour).agg(
        F.grouping_id().cast("long").alias("lvl"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
        F.round(F.avg("value"), 4).alias("avg_value"),
    )


# --------------------------------------------------------------------------
# q73 — time-RANGE rolling aggregates: trailing 1-hour event count/average
# per user at every event (the feature-engineering window shape; q30's
# running total is the ROWS sibling). The frame is defined by the epoch
# VALUE range, so same-second ties contribute identically in both engines
# regardless of intra-tie ordering.
# --------------------------------------------------------------------------
@register(
    "q73_rolling_time_window",
    oracle="""
SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
       ROUND(AVG(value) OVER w, 4) AS avg_1h
FROM events
WINDOW w AS (PARTITION BY user_id
             ORDER BY EPOCH(DATE_TRUNC('second', CAST(ts AS TIMESTAMP)))
             RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
""",
    tags=("W-frame", "A1"),
)
def q73_rolling_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-3599, 0)
    )
    return events.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.round(F.avg("value").over(w), 4).alias("avg_1h"),
    )


# --------------------------------------------------------------------------
# q87 — funnel analysis: strictly-ordered view → click → purchase stages
# per user (the product-analytics staple). Each stage is one keyed
# min-aggregate over rows after the previous stage's timestamp — three
# shuffles, all on user_id, no window over the event stream and no
# self-join fan-out. Strict `>` ordering makes the result independent of
# intra-second event order.
# --------------------------------------------------------------------------
@register(
    "q87_funnel",
    oracle="""
WITH t1 AS (
    SELECT user_id, MIN(ts) AS t_view FROM events
    WHERE event_type = 'view' GROUP BY user_id
),
t2 AS (
    SELECT e.user_id, MIN(e.ts) AS t_click
    FROM events e JOIN t1 ON t1.user_id = e.user_id
    WHERE e.event_type = 'click' AND e.ts > t1.t_view
    GROUP BY e.user_id
),
t3 AS (
    SELECT e.user_id, MIN(e.ts) AS t_purchase
    FROM events e JOIN t2 ON t2.user_id = e.user_id
    WHERE e.event_type = 'purchase' AND e.ts > t2.t_click
    GROUP BY e.user_id
)
SELECT t1.user_id, t1.t_view, t2.t_click, t3.t_purchase,
       CAST(1 + (t2.user_id IS NOT NULL)::INT
              + (t3.user_id IS NOT NULL)::INT AS BIGINT) AS stage
FROM t1
LEFT JOIN t2 ON t2.user_id = t1.user_id
LEFT JOIN t3 ON t3.user_id = t1.user_id
""",
    tags=("funnel", "A1", "J2"),
)
def q87_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    t1 = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    t2 = (
        events.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    t3 = (
        events.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        t1.join(t2, "user_id", "left")
        .join(t3, "user_id", "left")
        .select(
            "user_id",
            "t_view",
            "t_click",
            "t_purchase",
            (
                F.lit(1)
                + F.when(F.col("t_click").isNotNull(), 1).otherwise(0)
                + F.when(F.col("t_purchase").isNotNull(), 1).otherwise(0)
            )
            .cast("long")
            .alias("stage"),
        )
    )


# --------------------------------------------------------------------------
# q88 — cohort retention: users bucketed by first-activity week, counted in
# each later activity week. Two keyed aggregates (first-touch per user,
# distinct user-week activity) and one join — the standard retention
# matrix. Both engines truncate weeks to Monday, and the offset is whole
# days // 7, so bucket boundaries agree exactly.
# --------------------------------------------------------------------------
@register(
    "q88_cohort_retention",
    oracle="""
WITH first_touch AS (
    SELECT user_id, DATE_TRUNC('week', MIN(ts)) AS cohort_week
    FROM events GROUP BY user_id
),
activity AS (
    SELECT DISTINCT user_id, DATE_TRUNC('week', ts) AS wk FROM events
)
SELECT f.cohort_week,
       CAST(FLOOR(DATE_DIFF('day', f.cohort_week, a.wk) / 7.0) AS BIGINT)
           AS week_offset,
       CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
FROM first_touch f JOIN activity a ON a.user_id = f.user_id
GROUP BY f.cohort_week, week_offset
""",
    tags=("cohort", "A1", "A10"),
)
def q88_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    first_touch = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = events.select(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    ).distinct()
    return (
        first_touch.join(activity, "user_id")
        .select(
            "cohort_week",
            F.floor(F.datediff("wk", "cohort_week") / 7)
            .cast("long")
            .alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").cast("long").alias("n_users"))
    )


# --------------------------------------------------------------------------
# q89 — streaming CDC apply: the event stream merged into a keyed state
# table via foreachBatch (streaming/cdc.py), availableNow-executed inside
# the gate like q57/q67. The merge is last-writer-wins BY EVENT TIME
# (idempotent + commutative across micro-batches), so the final state
# provably equals the batch "latest event per user" — which is the oracle.
# --------------------------------------------------------------------------
@register(
    "q89_streaming_cdc_apply",
    oracle="""
SELECT user_id, event_type AS last_type,
       ROUND(value, 4) AS last_value, ts AS last_ts
FROM events
QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC) = 1
""",
    tags=("streaming-cdc", "S12", "W3"),
)
def q89_streaming_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..streaming import events as se
    from ..streaming.cdc import apply_cdc_stream

    stream = se.read_events_stream(spark, sf_dir).select(
        "user_id", "event_type", "value", "ts", "event_id"
    )
    state = apply_cdc_stream(
        stream,
        key_cols=["user_id"],
        order_cols=["ts", "event_id"],
        state_dir=tempfile.mkdtemp(prefix="q89_cdc_"),
        query_name="q89_sink",
    )
    return state.select(
        "user_id",
        F.col("event_type").alias("last_type"),
        F.round("value", 4).alias("last_value"),
        F.col("ts").alias("last_ts"),
    )


# --------------------------------------------------------------------------
# q99 — rolling (cumulative) HLL distinct users per day: the continuous-
# aggregate use the mergeable sketch exists for. Daily registers are built
# once (O(256) state per day); the day-d cumulative registers are the
# running register-wise MAX over days ≤ d — no rescan of history, which is
# the whole point at 100 TB (the exact twin needs every historic user id;
# the sketch needs 256 bytes per day). The exact cumulative count rides
# along via the linear first-day trick (min day per user → running sum of
# new-user counts), documenting the sketch error per day.
# The day-axis running windows are single-partition by construction —
# bounded by calendar days in history (thousands), not data volume.
# --------------------------------------------------------------------------
@register(
    "q99_rolling_hll",
    oracle="""
WITH ev AS (SELECT DATE_TRUNC('day', ts) AS day, user_id FROM events),
h AS (
    SELECT day,
           CAST(('0x' || SUBSTR(MD5(CAST(user_id AS VARCHAR)), 1, 8))::UBIGINT
                AS BIGINT) AS hv
    FROM ev
),
tagged AS (SELECT day, hv // 16777216 AS bucket, hv % 16777216 AS w FROM h),
regs AS (
    SELECT day, bucket,
           MAX(CASE WHEN w = 0 THEN 25 ELSE 25 - LENGTH(BIN(w)) END) AS r
    FROM tagged GROUP BY day, bucket
),
days AS (SELECT DISTINCT day FROM ev),
buckets AS (SELECT DISTINCT bucket FROM regs),
cum AS (
    SELECT g.day, g.bucket,
           MAX(r.r) OVER (PARTITION BY g.bucket ORDER BY g.day
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS rr
    FROM (SELECT d.day, b.bucket FROM days d CROSS JOIN buckets b) g
    LEFT JOIN regs r ON r.day = g.day AND r.bucket = g.bucket
),
per AS (
    SELECT day, SUM(POWER(2.0, -rr)) AS sum_obs, COUNT(*) AS n_obs
    FROM cum WHERE rr IS NOT NULL GROUP BY day
),
est AS (
    SELECT day,
           CASE WHEN (47072.71267120224 / (sum_obs + (256 - n_obs))) <= 640.0
                     AND (256 - n_obs) > 0
                THEN 256.0 * LN(256.0 / (256 - n_obs))
                ELSE 47072.71267120224 / (sum_obs + (256 - n_obs)) END AS hll
    FROM per
),
fst AS (SELECT user_id, MIN(day) AS day FROM ev GROUP BY user_id),
nnew AS (SELECT day, COUNT(*) AS n_new FROM fst GROUP BY day),
exact AS (
    SELECT d.day,
           SUM(COALESCE(n.n_new, 0)) OVER (ORDER BY d.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS exact_cum
    FROM days d LEFT JOIN nnew n ON n.day = d.day
)
SELECT e.day, CAST(x.exact_cum AS BIGINT) AS exact_cum_distinct,
       ROUND(e.hll, 4) AS hll_cum_distinct
FROM est e JOIN exact x ON x.day = e.day
""",
    tags=("sketch-hll", "hypertable-rollup", "streaming-stateful"),
)
def q99_rolling_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators import sketches

    events = load_table(spark, sf_dir, "events")
    ev = events.select(F.date_trunc("day", "ts").alias("day"), "user_id")
    regs = sketches.hll_registers(ev, ["day"], "user_id")
    days = ev.select("day").distinct()
    buckets = regs.select("bucket").distinct()
    grid = days.crossJoin(F.broadcast(buckets))
    w = (
        Window.partitionBy("bucket")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        grid.join(regs, ["day", "bucket"], "left")
        .withColumn("rr", F.max("r").over(w))
        .filter(F.col("rr").isNotNull())
        .select("day", "bucket", F.col("rr").alias("r"))
    )
    est = sketches.hll_estimate_from_registers(cum, ["day"])
    first = ev.groupBy("user_id").agg(F.min("day").alias("day"))
    nnew = first.groupBy("day").agg(F.count(F.lit(1)).alias("n_new"))
    wd = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    exact = (
        days.join(nnew, "day", "left")
        .withColumn(
            "exact_cum_distinct",
            F.sum(F.coalesce("n_new", F.lit(0))).over(wd).cast("long"),
        )
        .select("day", "exact_cum_distinct")
    )
    return exact.join(est, "day").select(
        "day", "exact_cum_distinct", F.col("hll_distinct").alias("hll_cum_distinct")
    )


# --------------------------------------------------------------------------
# q107/q108 — the tumbling and sliding window jobs EXECUTED AS STREAMS
# inside the gate (availableNow → memory sink, like q57/q67/q89): over
# fully-arrived data a watermarked streaming window aggregation emits
# exactly the batch GROUP BY result, so each reuses its batch twin's
# oracle. This puts the whole windowed-streaming family under the driver's
# hash gate rather than only the pytest equivalence tests. (Session
# windows joined them in round 4: q134 pins the exact boundary rule —
# merge iff [ts, ts+gap) windows overlap — with a gaps-and-islands
# oracle, so all three window families now run in-gate as streams.)
# --------------------------------------------------------------------------
@register(
    "q107_streaming_tumbling",
    oracle="""
SELECT TIME_BUCKET(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS total_value
FROM events
GROUP BY window_start, event_type
""",
    tags=("streaming-tumbling", "A1"),
)
def q107_streaming_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming import events as se

    stream = se.read_events_stream(spark, sf_dir)
    return se.run_available_now(
        se.tumbling_counts(stream), "q107_sink", output_mode="complete"
    )


@register(
    "q108_streaming_sliding",
    oracle="""
WITH slots AS (
    SELECT TIME_BUCKET(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)) AS slot,
           event_type, value
    FROM events
),
both_windows AS (
    SELECT slot AS window_start, event_type, value FROM slots
    UNION ALL
    SELECT slot - INTERVAL '30 minutes' AS window_start, event_type, value FROM slots
)
SELECT window_start, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 4) AS total_value
FROM both_windows
GROUP BY window_start, event_type
""",
    tags=("streaming-sliding", "A1"),
)
def q108_streaming_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming import events as se

    stream = se.read_events_stream(spark, sf_dir)
    job = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(
            F.window("ts", "1 hour", "30 minutes")
            .getField("start")
            .alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )
    return se.run_available_now(job, "q108_sink", output_mode="complete")


@register(
    "q119_activity_streaks",
    oracle="""
WITH days AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
flagged AS (
    SELECT user_id, d,
           CASE WHEN d - LAG(d) OVER (PARTITION BY user_id ORDER BY d) = 1
                THEN 0 ELSE 1 END AS is_new
    FROM days
),
islands AS (
    SELECT user_id, d,
           SUM(is_new) OVER (PARTITION BY user_id ORDER BY d
                             ROWS UNBOUNDED PRECEDING) AS island
    FROM flagged
),
streaks AS (
    SELECT user_id, island, CAST(COUNT(*) AS BIGINT) AS streak_len,
           MIN(d) AS streak_start
    FROM islands GROUP BY user_id, island
)
SELECT user_id,
       CAST(SUM(streak_len) AS BIGINT) AS n_active_days,
       CAST(COUNT(*) AS BIGINT) AS n_streaks,
       CAST(MAX(streak_len) AS BIGINT) AS longest_streak,
       CAST(MIN(streak_start) FILTER (
           WHERE streak_len = (SELECT MAX(s2.streak_len) FROM streaks s2
                               WHERE s2.user_id = streaks.user_id)
       ) AS TIMESTAMP) AS longest_start
FROM streaks
GROUP BY user_id
ORDER BY user_id
""",
    tags=("W2", "gaps-and-islands"),
)
def q119_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: longest consecutive-active-day streak per user.

    The classic lag → new-island flag → running-sum island id → double
    rollup, every window PARTITIONED BY user_id (no global window
    anywhere; the per-user day list is bounded by the calendar).  The
    earliest start among equal-longest streaks breaks ties
    deterministically — computed with a max_by over (streak_len, negated
    start) so the final rollup stays one pass.
    """
    from pyspark.sql import Window

    days = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    ).distinct()
    w_seq = Window.partitionBy("user_id").orderBy("d")
    flagged = days.withColumn(
        "is_new",
        F.when(
            F.datediff(F.col("d"), F.lag("d").over(w_seq)) == 1, F.lit(0)
        ).otherwise(F.lit(1)),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("is_new").over(w_seq.rowsBetween(Window.unboundedPreceding, 0)),
    )
    streaks = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("streak_len"),
        F.min("d").alias("streak_start"),
    )
    # argmax (longest streak, earliest start): lexicographic max over
    # (len, -days_since_epoch) recovers the earliest start among ties
    best = F.max(
        F.struct(
            F.col("streak_len"),
            (-F.unix_date(F.col("streak_start"))).alias("neg_start"),
        )
    )
    return (
        streaks.groupBy("user_id")
        .agg(
            F.sum("streak_len").alias("n_active_days"),
            F.count(F.lit(1)).alias("n_streaks"),
            best.getField("streak_len").alias("longest_streak"),
            F.date_from_unix_date(-best.getField("neg_start"))
            .cast("timestamp")
            .alias("longest_start"),
        )
        .orderBy("user_id")
    )


@register(
    "q120_interarrival_gaps",
    oracle="""
WITH seq AS (
    SELECT user_id, event_type,
           EPOCH_US(ts) - LAG(EPOCH_US(ts)) OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id
           ) AS gap_us
    FROM events
)
SELECT event_type,
       CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
       ROUND(CAST(SUM(gap_us) AS DOUBLE) / COUNT(gap_us) / 1000000.0, 4) AS avg_gap_s,
       ROUND(CAST(MIN(gap_us) AS DOUBLE) / 1000000.0, 6) AS min_gap_s,
       ROUND(CAST(MAX(gap_us) AS DOUBLE) / 1000000.0, 6) AS max_gap_s
FROM seq
WHERE gap_us IS NOT NULL
GROUP BY event_type
ORDER BY event_type
""",
    tags=("W2", "lead-lag"),
)
def q120_interarrival_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival gap statistics per event type.

    lag() over (user_id, event_type) sequences — partitioned windows whose
    per-partition size is a single user's history, never the corpus.  Gaps
    stay in EXACT integer microseconds through the aggregation (sum of
    longs is order-independent); the single float division happens on the
    already-exact totals, so both engines round identically.  (event_id
    breaks ts ties in the ordering — same-timestamp events would otherwise
    make lag nondeterministic.)
    """
    from pyspark.sql import Window

    w_seq = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    seq = load_table(spark, sf_dir, "events").withColumn(
        "gap_us", us - F.lag(us).over(w_seq)
    )
    return (
        seq.filter(F.col("gap_us").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("gap_us").alias("n_gaps"),
            F.round(
                F.sum("gap_us").cast("double") / F.count("gap_us") / F.lit(1000000.0), 4
            ).alias("avg_gap_s"),
            F.round(F.min("gap_us").cast("double") / F.lit(1000000.0), 6).alias("min_gap_s"),
            F.round(F.max("gap_us").cast("double") / F.lit(1000000.0), 6).alias("max_gap_s"),
        )
        .orderBy("event_type")
    )


_HLL_EST_SQL = """
    SELECT {keys},
           ROUND(CASE WHEN (47072.71267120224 / (SUM(POWER(2.0, -r)) + (256 - COUNT(*)))) <= 640.0
                           AND (256 - COUNT(*)) > 0
                      THEN 256.0 * LN(256.0 / (256 - COUNT(*)))
                      ELSE 47072.71267120224 / (SUM(POWER(2.0, -r)) + (256 - COUNT(*))) END,
                 4) AS {out}
    FROM {src} GROUP BY {keys}
"""


@register(
    "q133_hll_set_ops",
    # Register-wise-max union + inclusion-exclusion intersection over the
    # q71 deterministic HLL construction — the oracle rebuilds identical
    # registers per event_type, merges them per pair with MAX, and applies
    # the same estimator CASE, so the sketch algebra hash-matches exactly.
    # Operands are rounded to 4dp before the subtraction on both engines.
    oracle=f"""
WITH vals AS (
    SELECT event_type,
           CAST(user_id AS VARCHAR) || ':' ||
           CAST(CAST(ts AS DATE) AS VARCHAR) AS v
    FROM events
),
h AS (
    SELECT event_type,
           CAST(('0x' || SUBSTR(MD5(v), 1, 8))::UBIGINT AS BIGINT) AS hv
    FROM vals
),
tagged AS (
    SELECT event_type, hv // 16777216 AS bucket, hv % 16777216 AS w FROM h
),
regs AS (
    SELECT event_type, bucket,
           MAX(CASE WHEN w = 0 THEN 25 ELSE 25 - LENGTH(BIN(w)) END) AS r
    FROM tagged GROUP BY event_type, bucket
),
ests AS ({_HLL_EST_SQL.format(keys="event_type", out="est", src="regs")}),
pairs AS (
    SELECT a.event_type AS key_a, b.event_type AS key_b
    FROM (SELECT DISTINCT event_type FROM regs) a
    JOIN (SELECT DISTINCT event_type FROM regs) b ON a.event_type < b.event_type
),
union_regs AS (
    SELECT p.key_a, p.key_b, g.bucket, MAX(g.r) AS r
    FROM pairs p
    JOIN regs g ON g.event_type = p.key_a OR g.event_type = p.key_b
    GROUP BY p.key_a, p.key_b, g.bucket
),
uests AS ({_HLL_EST_SQL.format(keys="key_a, key_b", out="est_union", src="union_regs")})
SELECT u.key_a, u.key_b,
       ea.est AS est_a, eb.est AS est_b, u.est_union,
       ROUND(ea.est + eb.est - u.est_union, 4) AS est_intersection
FROM uests u
JOIN ests ea ON ea.event_type = u.key_a
JOIN ests eb ON eb.event_type = u.key_b
""",
    tags=("sketch-hll", "set-ops"),
)
def q133_hll_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL set algebra over per-event-type user-day sketches: union by
    register-wise max merge, intersection by inclusion-exclusion — the
    mergeable-sketch answer to 'how much do two segments overlap' without
    rescanning either segment."""
    from ..operators import sketches

    events = load_table(spark, sf_dir, "events").withColumn(
        "_v",
        F.concat_ws(
            ":", F.col("user_id").cast("string"), F.to_date("ts").cast("string")
        ),
    )
    return sketches.hll_set_estimates(events, "event_type", "_v")


@register(
    "q134_streaming_session",
    # Runs the session_window job AS A STREAM (availableNow, complete
    # mode) under the hash gate — the sixth in-gate streaming execution.
    # The oracle is the gaps-and-islands sessionizer with Spark's exact
    # boundary rule: event windows [ts, ts+gap) merge iff they OVERLAP,
    # so an event at exactly prev_ts + gap starts a NEW session
    # (`ts >= prev_ts + INTERVAL 30 MINUTE`), and the merged window's end
    # is last_ts + gap. Equal-timestamp events always co-session, so LAG
    # order among ties cannot change the grouping.
    oracle="""
WITH ordered AS (
    SELECT user_id, ts, value,
           LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
    FROM events
),
flagged AS (
    SELECT user_id, ts, value,
           CASE WHEN prev_ts IS NULL
                     OR ts >= prev_ts + INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS new_s
    FROM ordered
),
sess AS (
    SELECT user_id, ts, value,
           SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
    FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS total_value
FROM sess
GROUP BY user_id, sid
""",
    tags=("streaming-session", "A1"),
)
def q134_streaming_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming import events as se

    stream = se.read_events_stream(spark, sf_dir)
    return se.run_available_now(
        se.session_windows(stream), "q134_sink", output_mode="complete"
    )


@register(
    "q142_kmv_set_ops",
    # Theta/KMV sketch algebra over the same user-day segments as q133:
    # the oracle rebuilds the identical k-minima (first-8-md5-hex + 1),
    # merged union minima, and the Jaccard-scaled intersection, so the
    # sketch state and every estimate hash-match exactly. Division and
    # multiplication order mirrors the Spark expression (x/ku * est_u).
    oracle="""
WITH vals AS (
    SELECT event_type,
           CAST(user_id AS VARCHAR) || ':' ||
           CAST(CAST(ts AS DATE) AS VARCHAR) AS v
    FROM events
),
h AS (
    SELECT DISTINCT event_type,
           CAST(('0x' || SUBSTR(MD5(v), 1, 8))::UBIGINT AS BIGINT) + 1 AS hv
    FROM vals
),
mins AS (
    SELECT event_type, hv FROM (
        SELECT event_type, hv,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv ASC) AS rn
        FROM h) t
    WHERE rn <= 256
),
ests AS (
    SELECT event_type,
           ROUND(CASE WHEN COUNT(*) < 256 THEN CAST(COUNT(*) AS DOUBLE)
                      ELSE 255.0 * 4294967296.0 / MAX(hv) END, 4) AS est
    FROM mins GROUP BY event_type
),
pairs AS (
    SELECT a.event_type AS key_a, b.event_type AS key_b
    FROM (SELECT DISTINCT event_type FROM mins) a
    JOIN (SELECT DISTINCT event_type FROM mins) b ON a.event_type < b.event_type
),
union_mins AS (
    SELECT key_a, key_b, hv FROM (
        SELECT u.key_a, u.key_b, u.hv,
               ROW_NUMBER() OVER (PARTITION BY u.key_a, u.key_b
                                  ORDER BY u.hv ASC) AS rn
        FROM (
            SELECT DISTINCT p.key_a, p.key_b, m.hv
            FROM pairs p JOIN mins m
              ON m.event_type = p.key_a OR m.event_type = p.key_b
        ) u) t
    WHERE rn <= 256
),
uests AS (
    SELECT key_a, key_b,
           ROUND(CASE WHEN COUNT(*) < 256 THEN CAST(COUNT(*) AS DOUBLE)
                      ELSE 255.0 * 4294967296.0 / MAX(hv) END, 4) AS est_union
    FROM union_mins GROUP BY key_a, key_b
),
tagged AS (
    SELECT u.key_a, u.key_b, COUNT(*) AS ku,
           SUM(CASE WHEN ia.hv IS NOT NULL AND ib.hv IS NOT NULL
                    THEN 1 ELSE 0 END) AS x
    FROM union_mins u
    LEFT JOIN mins ia ON ia.event_type = u.key_a AND ia.hv = u.hv
    LEFT JOIN mins ib ON ib.event_type = u.key_b AND ib.hv = u.hv
    GROUP BY u.key_a, u.key_b
)
SELECT t.key_a, t.key_b, ea.est AS est_a, eb.est AS est_b, u.est_union,
       ROUND(t.x * 1.0 / t.ku * u.est_union, 4) AS est_intersection
FROM tagged t
JOIN uests u ON u.key_a = t.key_a AND u.key_b = t.key_b
JOIN ests ea ON ea.event_type = t.key_a
JOIN ests eb ON eb.event_type = t.key_b
""",
    tags=("sketch-kmv", "set-ops"),
)
def q142_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV/theta-sketch segment overlap: union from merged k-minima,
    intersection from the union sample's Jaccard — the direct-sample
    estimator q133's inclusion-exclusion caveat points to."""
    from ..operators import sketches

    events = load_table(spark, sf_dir, "events").withColumn(
        "_v",
        F.concat_ws(
            ":", F.col("user_id").cast("string"), F.to_date("ts").cast("string")
        ),
    )
    return sketches.kmv_set_estimates(events, "event_type", "_v", k=256)


@register(
    "q145_streaming_first_event",
    # q40's keyed first-event dedup executed AS A STREAM (7th in-gate
    # streaming execution) — as a watermarked min-struct AGGREGATION, not
    # dropDuplicatesWithinWatermark: the dedup operator keeps the
    # first-ARRIVED row (file order, not event time), which no batch
    # oracle can pin; min(struct(ts, event_id)) is arrival-order-proof.
    oracle="""
WITH ranked AS (
    SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts,
           ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                              ORDER BY ts, event_id) AS rk,
           COUNT(*) OVER (PARTITION BY user_id, event_type) AS n_total
    FROM events
)
SELECT user_id, event_type, event_id AS first_event_id,
       ts AS first_ts, CAST(n_total - 1 AS BIGINT) AS n_dropped
FROM ranked WHERE rk = 1
""",
    tags=("streaming-dedup", "W1"),
)
def q145_streaming_first_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming import events as se

    stream = se.read_events_stream(spark, sf_dir)
    return se.run_available_now(
        se.first_event_agg(stream), "q145_sink", output_mode="complete"
    )


@register(
    "q150_running_distinct",
    # Exact CUMULATIVE distinct users per day WITHOUT a per-day rescan:
    # the first-touch trick — distinct-to-date(d) = |{users whose FIRST
    # day <= d}| — turns an O(days × corpus) running COUNT(DISTINCT)
    # into one min-aggregate plus arithmetic over the day relation. The
    # exact twin of what q99 answers with mergeable HLL registers.
    oracle="""
WITH days AS (
    SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS daily_active
    FROM events GROUP BY day
),
firsts AS (
    SELECT user_id, MIN(CAST(CAST(ts AS DATE) AS TIMESTAMP)) AS first_day
    FROM events GROUP BY user_id
),
news AS (
    SELECT first_day AS day, CAST(COUNT(*) AS BIGINT) AS n_new
    FROM firsts GROUP BY first_day
)
SELECT d.day, d.daily_active,
       CAST(SUM(COALESCE(n.n_new, 0)) AS BIGINT) AS cum_distinct
FROM days d
LEFT JOIN news n ON n.day <= d.day
GROUP BY d.day, d.daily_active
""",
    tags=("A10", "first-touch", "continuous-aggregate"),
)
def q150_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active + cumulative distinct users. The cumulative sum runs
    as a triangle join over the CALENDAR-bounded day relation (30 rows
    here, thousands at any horizon) — bounded broadcast, preserving the
    engine's zero-global-window invariant instead of an unpartitioned
    running-sum window."""
    events = load_table(spark, sf_dir, "events")
    day = F.to_date("ts").cast("timestamp")
    days = events.groupBy(day.alias("day")).agg(
        F.countDistinct("user_id").cast("long").alias("daily_active")
    )
    firsts = events.groupBy("user_id").agg(F.min(day).alias("first_day"))
    news = firsts.groupBy(F.col("first_day").alias("n_day")).agg(
        F.count(F.lit(1)).cast("long").alias("n_new")
    )
    return (
        days.join(F.broadcast(news), F.col("n_day") <= F.col("day"), "left")
        .groupBy("day", "daily_active")
        .agg(F.sum(F.coalesce("n_new", F.lit(0))).cast("long").alias("cum_distinct"))
    )


@register(
    "q153_seasonal_anomalies",
    # Deseasonalised anomaly detection: each hour's event volume scored
    # against the hour-of-day baseline (mean/std over the 30-day month).
    # The baseline relation is 24 rows → broadcast back; z-scores divide
    # pre-rounded operands (q122's contract) so the flag threshold can't
    # knife-edge. Population std as exact arithmetic: σ² = Σn²/k − μ²
    # over integer counts.
    oracle="""
WITH hourly AS (
    SELECT TIME_BUCKET(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS hr,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY hr
),
base AS (
    SELECT CAST(EXTRACT(HOUR FROM hr) AS INT) AS hod,
           ROUND(AVG(n), 4) AS mu,
           ROUND(SQRT(AVG(n * n) - AVG(n) * AVG(n)), 4) AS sigma
    FROM hourly GROUP BY hod
)
SELECT h.hr, b.hod, h.n, b.mu,
       ROUND((h.n - b.mu) / b.sigma, 4) AS z
FROM hourly h JOIN base b ON b.hod = CAST(EXTRACT(HOUR FROM h.hr) AS INT)
WHERE b.sigma > 0 AND ABS(ROUND((h.n - b.mu) / b.sigma, 4)) >= 2.0
""",
    tags=("A12", "anomaly", "W4"),
)
def q153_seasonal_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hours whose event volume deviates ≥2σ from their hour-of-day
    baseline — W4's z-score pattern applied after deseasonalisation.
    One keyed aggregate builds the 720-row hourly relation; the 24-row
    baseline broadcasts back (never a global window)."""
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        F.window("ts", "1 hour").getField("start").alias("hr")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    base = hourly.groupBy(F.hour("hr").alias("hod")).agg(
        F.round(F.avg("n"), 4).alias("mu"),
        F.round(
            F.sqrt(F.avg(F.col("n") * F.col("n")) - F.avg("n") * F.avg("n")), 4
        ).alias("sigma"),
    )
    z = F.round((F.col("n") - F.col("mu")) / F.col("sigma"), 4)
    return (
        hourly.withColumn("hod", F.hour("hr"))
        .join(F.broadcast(base), "hod")
        .filter((F.col("sigma") > 0) & (F.abs(z) >= 2.0))
        .select("hr", "hod", "n", "mu", z.alias("z"))
    )


@register(
    "q154_transition_matrix",
    # Per-user event-type Markov transitions: LEAD over (user, ts,
    # event_id) sequences, counts row-normalised into probabilities.
    # n/total divides a BIGINT by a BIGINT cast double — exact operands,
    # deterministic quotient.
    oracle="""
WITH seq AS (
    SELECT user_id, event_type,
           LEAD(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS next_type
    FROM events
),
trans AS (
    SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY from_type, to_type
),
tot AS (
    SELECT from_type, SUM(n) AS total FROM trans GROUP BY from_type
)
SELECT t.from_type, t.to_type, CAST(t.n AS BIGINT) AS n,
       ROUND(t.n / CAST(tt.total AS DOUBLE), 4) AS p
FROM trans t JOIN tot tt ON tt.from_type = t.from_type
""",
    tags=("W2", "sequence", "markov"),
)
def q154_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix (counts + row-normalised
    probabilities) over per-user sequences. The LEAD window partitions by
    user (uniform); the matrix is ≤ |types|² rows; totals broadcast
    back."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    trans = seq.groupBy(
        F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = trans.groupBy("from_type").agg(F.sum("n").alias("total"))
    return (
        trans.join(F.broadcast(tot), "from_type")
        .select(
            "from_type",
            "to_type",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("n") / F.col("total").cast("double"), 4).alias("p"),
        )
    )


@register(
    "q158_window_showcase",
    # The ranking/distribution window-function family in one relation
    # (ntile, percent_rank, cume_dist, lag, nth_value, explicit frames)
    # over per-(type, day) totals — every window partitioned by
    # event_type; the base relation is |types|·|days| (150 rows here),
    # never the event stream. value totals pre-rounded to 4dp so every
    # rank/lag result compares identical doubles.
    oracle="""
WITH daily AS (
    SELECT event_type, CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
           ROUND(SUM(value), 4) AS total
    FROM events GROUP BY event_type, day
)
SELECT event_type, day, total,
       CAST(NTILE(4) OVER w_ord AS INT) AS quartile,
       ROUND(PERCENT_RANK() OVER w_ord, 4) AS pct_rank,
       ROUND(CUME_DIST() OVER w_ord, 4) AS cume,
       LAG(total, 1) OVER w_time AS prev_day_total,
       NTH_VALUE(total, 2) OVER (
           PARTITION BY event_type ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       ) AS second_day_total,
       LAST_VALUE(total) OVER (
           PARTITION BY event_type ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       ) AS last_day_total
FROM daily
WINDOW w_ord AS (PARTITION BY event_type ORDER BY total ASC, day ASC),
       w_time AS (PARTITION BY event_type ORDER BY day)
""",
    tags=("W2", "W3", "window-family"),
)
def q158_window_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking/distribution/navigation window functions over per-type
    daily totals, all partitioned by event_type."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.to_date("ts").cast("timestamp").alias("day")
    ).agg(F.round(F.sum("value"), 4).alias("total"))
    w_ord = Window.partitionBy("event_type").orderBy(F.asc("total"), F.asc("day"))
    w_time = Window.partitionBy("event_type").orderBy("day")
    w_full = w_time.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return daily.select(
        "event_type",
        "day",
        "total",
        F.ntile(4).over(w_ord).alias("quartile"),
        F.round(F.percent_rank().over(w_ord), 4).alias("pct_rank"),
        F.round(F.cume_dist().over(w_ord), 4).alias("cume"),
        F.lag("total", 1).over(w_time).alias("prev_day_total"),
        F.nth_value("total", 2).over(w_full).alias("second_day_total"),
        F.last_value("total").over(w_full).alias("last_day_total"),
    )


@register(
    "q160_variant_props",
    # Spark 4 VARIANT surface: parse_json the event props into a variant
    # column, extract typed fields with variant_get, aggregate. The
    # oracle reads the same JSON relationally (DuckDB json_extract) —
    # semantics, not storage, are compared.
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(CAST(props ->> '$.k' AS INT)) AS INT) AS min_k,
       CAST(MAX(CAST(props ->> '$.k' AS INT)) AS INT) AS max_k,
       ROUND(AVG(CAST(props ->> '$.k' AS INT)), 4) AS avg_k
FROM events
GROUP BY event_type
""",
    tags=("S7", "variant", "F21"),
)
def q160_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed extraction from semi-structured props via the VARIANT type
    (parse_json → variant_get) — the Spark-4 path for schema-on-read
    columns that keeps extraction in codegen instead of per-row JSON
    string parsing at every reference."""
    events = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.try_variant_get(v, "$.k", "int")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.round(F.avg("k"), 4).alias("avg_k"),
        )
    )


@register(
    "q164_time_weighted_avg",
    # TWAP over irregular samples (the timescale time_weight shape):
    # each observation holds until the next one; weight = seconds to the
    # next sample (last sample weightless). Integer second deltas are
    # exact; the weighted sum rounds to 4dp before the divide by the
    # exact integer span.
    oracle="""
WITH seq AS (
    SELECT user_id, value,
           CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) AS sec,
           LEAD(CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
    FROM events
),
w AS (
    SELECT user_id, value, nxt - sec AS dt FROM seq WHERE nxt IS NOT NULL
)
SELECT user_id,
       CAST(SUM(dt) AS BIGINT) AS span_sec,
       ROUND(ROUND(SUM(value * dt), 4) / SUM(dt), 4) AS twap
FROM w
GROUP BY user_id
HAVING SUM(dt) > 0
""",
    tags=("temporal", "timeseries", "W4"),
)
def q164_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user over irregular event
    samples — LEAD deltas (user-partitioned window), one keyed
    aggregate."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    sec = F.col("ts").cast("long")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "user_id", "value", sec.alias("sec"), F.lead(sec).over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    return (
        seq.withColumn("dt", F.col("nxt") - F.col("sec"))
        .groupBy("user_id")
        .agg(
            F.sum("dt").cast("long").alias("span_sec"),
            F.round(
                F.round(F.sum(F.col("value") * F.col("dt")), 4) / F.sum("dt"), 4
            ).alias("twap"),
        )
        .filter(F.col("span_sec") > 0)
    )


@register(
    "q165_ohlc_bars",
    # OHLC candlesticks per (type, hour): open/close via min_by/max_by
    # on (ts, event_id) — the tie-break rides inside the ordering struct
    # so simultaneous events can't flip open/close between engines.
    oracle="""
WITH ranked AS (
    SELECT event_type,
           TIME_BUCKET(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS bar,
           value, ts, event_id,
           ROW_NUMBER() OVER (PARTITION BY event_type,
                              TIME_BUCKET(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))
                              ORDER BY ts ASC, event_id ASC) AS rk_o,
           ROW_NUMBER() OVER (PARTITION BY event_type,
                              TIME_BUCKET(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))
                              ORDER BY ts DESC, event_id DESC) AS rk_c
    FROM events
),
agg AS (
    SELECT event_type, bar,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MAX(value), 4) AS high,
           ROUND(MIN(value), 4) AS low
    FROM ranked GROUP BY event_type, bar
)
SELECT a.event_type, a.bar, a.n,
       ROUND(o.value, 4) AS open, a.high, a.low, ROUND(c.value, 4) AS close
FROM agg a
JOIN ranked o ON o.event_type = a.event_type AND o.bar = a.bar AND o.rk_o = 1
JOIN ranked c ON c.event_type = a.event_type AND c.bar = a.bar AND c.rk_c = 1
""",
    tags=("temporal", "timeseries", "A1"),
)
def q165_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event type in ONE keyed aggregate —
    open/close are min_by/max_by over (ts, event_id) structs, high/low
    plain min/max; no rank windows, no self-joins (the oracle spells the
    rank form for clarity; same semantics)."""
    events = load_table(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        events.groupBy(
            "event_type",
            F.window("ts", "1 hour").getField("start").alias("bar"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.max("value"), 4).alias("high"),
            F.round(F.min("value"), 4).alias("low"),
            F.round(F.min_by("value", key), 4).alias("open"),
            F.round(F.max_by("value", key), 4).alias("close"),
        )
        .select("event_type", "bar", "n", "open", "high", "low", "close")
    )


@register(
    "q166_gap_fill_locf",
    # Calendar gap filling + last-observation-carried-forward: the
    # standard timeseries densification. Spark's last(ignoreNulls) over
    # an unbounded-preceding frame == DuckDB's LAST_VALUE IGNORE NULLS.
    # Rows before a user's first observation keep NULL (no fabrication).
    oracle="""
WITH cal AS (
    SELECT u.user_id, d.day
    FROM (SELECT DISTINCT user_id FROM events) u,
         (SELECT UNNEST(GENERATE_SERIES(TIMESTAMP '2024-01-01',
                                        TIMESTAMP '2024-01-30',
                                        INTERVAL 1 DAY)) AS day) d
),
daily AS (
    SELECT user_id, CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
           ROUND(SUM(value), 4) AS obs
    FROM events GROUP BY user_id, day
)
SELECT c.user_id, c.day, d.obs,
       LAST_VALUE(d.obs IGNORE NULLS) OVER (
           PARTITION BY c.user_id ORDER BY c.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
FROM cal c LEFT JOIN daily d ON d.user_id = c.user_id AND d.day = c.day
""",
    tags=("temporal", "timeseries", "gap-fill"),
)
def q166_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Densify each user's daily series over the January calendar and
    carry the last observation forward. The calendar is a 30-row
    sequence cross-joined against the user dim (broadcast — calendar ×
    users is the output size by definition); the LOCF window partitions
    by user."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    users = events.select("user_id").distinct()
    cal = users.join(
        F.broadcast(
            events.sparkSession.range(1).select(
                F.explode(
                    F.sequence(
                        F.lit("2024-01-01").cast("timestamp"),
                        F.lit("2024-01-30").cast("timestamp"),
                        F.expr("INTERVAL 1 DAY"),
                    )
                ).alias("day")
            )
        )
    )
    daily = events.groupBy(
        "user_id", F.to_date("ts").cast("timestamp").alias("day")
    ).agg(F.round(F.sum("value"), 4).alias("obs"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        cal.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            "obs",
            F.last("obs", ignorenulls=True).over(w).alias("filled"),
        )
    )


@register(
    "q167_since_last_error",
    # Resettable per-key counter — "events since the user's last error"
    # — the gaps-and-islands family's running variant (q119 counts
    # streaks, q120 measures gaps; this numbers WITHIN segments).
    # Segment id = running count of errors INCLUSIVE of the current row;
    # position = row_number within (user, segment); events before any
    # error report NULL (no segment to count from).
    oracle="""
WITH seq AS (
    SELECT user_id, event_id, ts, event_type,
           SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS seg
    FROM events
)
SELECT user_id, event_id,
       CASE WHEN seg = 0 THEN NULL
            ELSE CAST(ROW_NUMBER() OVER (PARTITION BY user_id, seg
                                         ORDER BY ts, event_id) - 1 AS BIGINT)
       END AS since_error
FROM seq
""",
    tags=("W2", "sequence", "gaps-islands"),
)
def q167_since_last_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event: how many events this user has logged since their last
    'error' (the error itself counts 0; pre-first-error rows are NULL).
    Both windows partition by user (uniform); segment boundaries come
    from one running conditional sum — no self-join against the error
    subset."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seq = events.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .over(w_run)
        .alias("seg"),
    )
    w_seg = Window.partitionBy("user_id", "seg").orderBy("ts", "event_id")
    return seq.select(
        "user_id",
        "event_id",
        F.when(
            F.col("seg") > 0, (F.row_number().over(w_seg) - 1).cast("long")
        ).alias("since_error"),
    )


@register(
    "q168_cluster_sample",
    # Cluster (group-level) sampling: sample whole USERS, keep all their
    # events — the leakage-safe unit for training splits (row sampling
    # splits a user's history across train/test; cluster sampling
    # doesn't). Deterministic md5 draw on the cluster key.
    oracle="""
WITH picked AS (
    SELECT user_id FROM (SELECT DISTINCT user_id FROM events) u
    WHERE CAST(('0x' || SUBSTR(MD5(CAST(user_id AS VARCHAR)), 1, 8))::UBIGINT
               AS BIGINT) % 10 = 0
)
SELECT e.user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT e.event_type) AS BIGINT) AS n_types,
       ROUND(SUM(e.value), 4) AS total_value
FROM events e JOIN picked p ON p.user_id = e.user_id
GROUP BY e.user_id
""",
    tags=("A13", "sampling-cluster"),
)
def q168_cluster_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% cluster sample of users (md5 draw), rolled up per sampled
    user. The picked set is a broadcast semi-join side; the md5 draw is
    a pure function of the key, so resampling is reproducible across
    runs, engines, and partitionings."""
    events = load_table(spark, sf_dir, "events")
    draw = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 10
    )
    picked = events.select("user_id").distinct().filter(draw == 0)
    return (
        events.join(F.broadcast(picked), "user_id", "left_semi")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


@register(
    "q169_basket_pairs",
    # Market-basket lite: event-type pairs co-occurring within the same
    # user-day basket, with support and lift. Pair counts come from the
    # distinct basket-item relation self-joined on the basket key (types
    # per basket ≤ 5 here — the classic a<b pair enumeration with
    # bounded fan-out); lift divides pre-rounded doubles.
    oracle="""
WITH items AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type
    FROM events
),
n_baskets AS (
    SELECT CAST(COUNT(DISTINCT (user_id, day)) AS DOUBLE) AS nb FROM items
),
supp AS (
    SELECT event_type, COUNT(*) AS s FROM items GROUP BY event_type
),
pairs AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n_pair
    FROM items a
    JOIN items b ON b.user_id = a.user_id AND b.day = a.day
                AND a.event_type < b.event_type
    GROUP BY type_a, type_b
)
SELECT p.type_a, p.type_b, CAST(p.n_pair AS BIGINT) AS n_pair,
       ROUND(ROUND(p.n_pair * nb.nb, 4) / (sa.s * sb.s), 4) AS lift
FROM pairs p
JOIN supp sa ON sa.event_type = p.type_a
JOIN supp sb ON sb.event_type = p.type_b
CROSS JOIN n_baskets nb
""",
    tags=("A1", "basket", "association"),
)
def q169_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type co-occurrence within user-day baskets: pair support +
    lift. The distinct item relation shuffles once on the basket key;
    supports and the basket count are broadcast scalars."""
    events = load_table(spark, sf_dir, "events")
    items = events.select(
        "user_id", F.to_date("ts").alias("day"), "event_type"
    ).distinct()
    nb = items.select("user_id", "day").distinct().agg(
        F.count(F.lit(1)).cast("double").alias("nb")
    )
    supp = items.groupBy("event_type").agg(F.count(F.lit(1)).alias("s"))
    a = items.select("user_id", "day", F.col("event_type").alias("type_a"))
    b = items.select("user_id", "day", F.col("event_type").alias("type_b"))
    pairs = (
        a.join(b, ["user_id", "day"])
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_pair"))
    )
    sa = supp.select(F.col("event_type").alias("type_a"), F.col("s").alias("sa"))
    sb = supp.select(F.col("event_type").alias("type_b"), F.col("s").alias("sb"))
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .join(F.broadcast(nb))
        .select(
            "type_a",
            "type_b",
            F.col("n_pair").cast("long").alias("n_pair"),
            F.round(
                F.round(F.col("n_pair") * F.col("nb"), 4)
                / (F.col("sa") * F.col("sb")),
                4,
            ).alias("lift"),
        )
    )


@register(
    "q170_user_entropy",
    # Behavioural diversity: Shannon entropy of each user's event-type
    # mix, normalised by ln(|types present|) (1.0 = uniform usage,
    # 0 = single-type user, NULL for one-type denominators). Each
    # ln term is rounded to 6dp before the Σ p·ln(p) (identical
    # operands cross-engine), the sum before the normalising divide.
    oracle="""
WITH counts AS (
    SELECT user_id, event_type, COUNT(*) AS n FROM events
    GROUP BY user_id, event_type
),
tot AS (
    SELECT user_id, SUM(n) AS nt, COUNT(*) AS k FROM counts GROUP BY user_id
),
terms AS (
    SELECT c.user_id, t.k,
           (c.n / CAST(t.nt AS DOUBLE))
           * ROUND(LN(c.n / CAST(t.nt AS DOUBLE)), 6) AS term
    FROM counts c JOIN tot t ON t.user_id = c.user_id
)
SELECT user_id,
       CAST(k AS BIGINT) AS n_types,
       ROUND(-SUM(term), 4) AS entropy,
       CASE WHEN k > 1
            THEN ROUND(ROUND(-SUM(term), 4) / ROUND(LN(k), 6), 4)
       END AS norm_entropy
FROM terms
GROUP BY user_id, k
""",
    tags=("A12", "behavioral"),
)
def q170_user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalised event-mix entropy per user — two keyed aggregates and
    a broadcast-back of the per-user totals; all math on count ratios."""
    events = load_table(spark, sf_dir, "events")
    counts = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = counts.groupBy("user_id").agg(
        F.sum("n").alias("nt"), F.count(F.lit(1)).alias("k")
    )
    p = F.col("n") / F.col("nt").cast("double")
    terms = counts.join(tot, "user_id").select(
        "user_id", "k", (p * F.round(F.log(p), 6)).alias("term")
    )
    return (
        terms.groupBy("user_id", "k")
        .agg(F.round(-F.sum("term"), 4).alias("entropy"))
        .select(
            "user_id",
            F.col("k").cast("long").alias("n_types"),
            "entropy",
            F.when(
                F.col("k") > 1,
                F.round(
                    F.col("entropy") / F.round(F.log(F.col("k").cast("double")), 6), 4
                ),
            ).alias("norm_entropy"),
        )
    )


@register(
    "q172_dead_letter_routing",
    # The validate-and-route pattern: every record gets a disposition
    # ('ok' or a FIRST-failing-rule reason, priority-ordered) — the
    # single-pass CASE ladder that fans a pipeline into main/dead-letter
    # sinks without a second scan. Rules (tight enough that the synthetic
    # corpus actually routes to several sinks): parseable props,
    # k < 90, known event_type, value >= 1.
    oracle="""
SELECT CASE
         WHEN TRY_CAST(props ->> '$.k' AS INT) IS NULL THEN 'bad_props'
         WHEN TRY_CAST(props ->> '$.k' AS INT) NOT BETWEEN 0 AND 89 THEN 'k_range'
         WHEN event_type NOT IN ('click','view','purchase','signup','error')
           THEN 'unknown_type'
         WHEN value < 1 THEN 'low_value'
         ELSE 'ok'
       END AS disposition,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY disposition
""",
    tags=("P1", "data-quality", "routing"),
)
def q172_dead_letter_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disposition counts for the validate-and-route stage. One CASE
    ladder in codegen; a real pipeline writes the same expression to two
    sinks with a persisted scan (rule priority = first match, so
    multi-fault rows route deterministically)."""
    events = load_table(spark, sf_dir, "events")
    k = F.expr("try_cast(get_json_object(props, '$.k') AS INT)")
    disposition = (
        F.when(k.isNull(), "bad_props")
        .when(~k.between(0, 89), "k_range")
        .when(
            ~F.col("event_type").isin("click", "view", "purchase", "signup", "error"),
            "unknown_type",
        )
        .when(F.col("value") < 1, "low_value")
        .otherwise("ok")
    )
    return (
        events.groupBy(disposition.alias("disposition"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@register(
    "q174_rolling_correlation",
    # Rolling 24-hour Pearson correlation between two event types'
    # hourly volumes — joint sufficient statistics (Σx, Σy, Σxy, Σx²,
    # Σy²) over a frame of EXACT INTEGER counts, so every operand is
    # order-proof int64 arithmetic and only the final quotient is
    # floating. Window over the calendar-bounded hour relation (720
    # rows), disclosed like q150/q158. Windows with <2 points or zero
    # variance yield NULL.
    oracle="""
WITH hours AS (
    SELECT TIME_BUCKET(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS hr,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
    FROM events GROUP BY hr
),
win AS (
    SELECT hr, x, y,
           COUNT(*) OVER w AS n,
           SUM(x) OVER w AS sx, SUM(y) OVER w AS sy,
           SUM(x * y) OVER w AS sxy,
           SUM(x * x) OVER w AS sxx, SUM(y * y) OVER w AS syy
    FROM hours
    WINDOW w AS (ORDER BY hr ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
)
SELECT hr, x, y,
       CASE WHEN n >= 2 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
            THEN ROUND((n * sxy - sx * sy)
                       / SQRT(CAST((n * sxx - sx * sx) AS DOUBLE)
                              * (n * syy - sy * sy)), 4)
       END AS corr_24h
FROM win
""",
    tags=("A12", "timeseries", "W4"),
)
def q174_rolling_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    hours = events.groupBy(
        F.window("ts", "1 hour").getField("start").alias("hr")
    ).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("y"),
    )
    w = Window.partitionBy(F.lit(1)).orderBy("hr").rowsBetween(-23, 0)
    win = hours.select(
        "hr",
        "x",
        "y",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("syy"),
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return win.select(
        "hr",
        "x",
        "y",
        F.when(
            (F.col("n") >= 2) & (vx > 0) & (vy > 0),
            F.round(cov / F.sqrt(vx.cast("double") * vy), 4),
        ).alias("corr_24h"),
    )


@register(
    "q175_ab_test",
    # Two-sample z: doc-parity cohorts of purchase values, pooled
    # standard error, z statistic. Means divide pre-rounded sums by
    # exact counts; variances come from (Σv, Σv², n) with Σ's rounded
    # before the algebra — both engines run identical-operand math.
    oracle="""
WITH tagged AS (
    SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS cohort, value
    FROM events WHERE event_type = 'purchase'
),
stats AS (
    SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 4) AS sv,
           ROUND(SUM(value * value), 4) AS svv
    FROM tagged GROUP BY cohort
),
wide AS (
    SELECT
      MAX(CASE WHEN cohort = 'A' THEN n END) AS na,
      MAX(CASE WHEN cohort = 'A' THEN sv END) AS sva,
      MAX(CASE WHEN cohort = 'A' THEN svv END) AS svva,
      MAX(CASE WHEN cohort = 'B' THEN n END) AS nb,
      MAX(CASE WHEN cohort = 'B' THEN sv END) AS svb,
      MAX(CASE WHEN cohort = 'B' THEN svv END) AS svvb
    FROM stats
)
SELECT na, nb,
       ROUND(sva / na, 4) AS mean_a,
       ROUND(svb / nb, 4) AS mean_b,
       ROUND((sva / na - svb / nb)
             / SQRT((svva / na - (sva / na) * (sva / na)) / na
                    + (svvb / nb - (svb / nb) * (svb / nb)) / nb), 4) AS z_stat
FROM wide
""",
    tags=("A12", "ab-test"),
)
def q175_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    tagged = events.select(
        F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("cohort"),
        "value",
    )
    stats = tagged.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 4).alias("sv"),
        F.round(F.sum(F.col("value") * F.col("value")), 4).alias("svv"),
    )
    wide = stats.agg(
        F.max(F.when(F.col("cohort") == "A", F.col("n"))).alias("na"),
        F.max(F.when(F.col("cohort") == "A", F.col("sv"))).alias("sva"),
        F.max(F.when(F.col("cohort") == "A", F.col("svv"))).alias("svva"),
        F.max(F.when(F.col("cohort") == "B", F.col("n"))).alias("nb"),
        F.max(F.when(F.col("cohort") == "B", F.col("sv"))).alias("svb"),
        F.max(F.when(F.col("cohort") == "B", F.col("svv"))).alias("svvb"),
    )
    ma = F.col("sva") / F.col("na")
    mb = F.col("svb") / F.col("nb")
    va = (F.col("svva") / F.col("na") - ma * ma) / F.col("na")
    vb = (F.col("svvb") / F.col("nb") - mb * mb) / F.col("nb")
    return wide.select(
        "na",
        "nb",
        F.round(ma, 4).alias("mean_a"),
        F.round(mb, 4).alias("mean_b"),
        F.round((ma - mb) / F.sqrt(va + vb), 4).alias("z_stat"),
    )


@register(
    "q176_time_to_convert",
    # Signup→first-purchase latency distribution: per converting user
    # the exact integer-second delta between first signup and first
    # subsequent purchase, then exact quantiles over integer seconds
    # (q136's exactness argument: quartile interpolation on integers is
    # dyadic — no ulp knife-edge).
    oracle="""
WITH first_signup AS (
    SELECT user_id, MIN(ts) AS s_ts FROM events
    WHERE event_type = 'signup' GROUP BY user_id
),
first_purchase AS (
    SELECT e.user_id, MIN(e.ts) AS p_ts
    FROM events e JOIN first_signup s
      ON s.user_id = e.user_id AND e.ts > s.s_ts
    WHERE e.event_type = 'purchase'
    GROUP BY e.user_id
),
deltas AS (
    SELECT CAST(EPOCH(DATE_TRUNC('second', p.p_ts)) AS BIGINT)
           - CAST(EPOCH(DATE_TRUNC('second', s.s_ts)) AS BIGINT) AS dt
    FROM first_signup s JOIN first_purchase p ON p.user_id = s.user_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
       QUANTILE_CONT(dt, 0.25) AS p25_sec,
       QUANTILE_CONT(dt, 0.50) AS p50_sec,
       QUANTILE_CONT(dt, 0.75) AS p75_sec
FROM deltas
""",
    tags=("temporal", "funnel", "A12"),
)
def q176_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    fs = events.filter(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min("ts").alias("s_ts")
    )
    fp = (
        events.filter(F.col("event_type") == "purchase")
        .join(fs, "user_id")
        .filter(F.col("ts") > F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    deltas = fs.join(fp, "user_id").select(
        (F.col("p_ts").cast("long") - F.col("s_ts").cast("long")).alias("dt")
    )
    pct = F.expr("percentile(dt, array(0.25D, 0.5D, 0.75D))")
    return deltas.agg(
        F.count(F.lit(1)).alias("n_converted"),
        pct[0].alias("p25_sec"),
        pct[1].alias("p50_sec"),
        pct[2].alias("p75_sec"),
    )


@register(
    "q179_top_event_paths",
    # Top-10 three-step behavioural paths: double LEAD over per-user
    # sequences, counted and ranked with a lexicographic tie-break —
    # the path-mining extension of q154's transition matrix.
    oracle="""
WITH seq AS (
    SELECT event_type AS e1,
           LEAD(event_type, 1) OVER w AS e2,
           LEAD(event_type, 2) OVER w AS e3
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
paths AS (
    SELECT e1, e2, e3, COUNT(*) AS n
    FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
    GROUP BY e1, e2, e3
)
SELECT e1, e2, e3, CAST(n AS BIGINT) AS n
FROM (
    SELECT e1, e2, e3, n,
           ROW_NUMBER() OVER (ORDER BY n DESC, e1 ASC, e2 ASC, e3 ASC) AS rk
    FROM paths) t
WHERE rk <= 10
""",
    tags=("W2", "sequence", "path-mining"),
)
def q179_top_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most common 3-event paths across all user sequences. The final
    top-10 ranks the ≤|types|³ path relation (125 rows) — bounded, like
    every model-table window in this family."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    paths = seq.groupBy("e1", "e2", "e3").agg(F.count(F.lit(1)).alias("n"))
    return (
        paths.orderBy(F.desc("n"), F.asc("e1"), F.asc("e2"), F.asc("e3"))
        .limit(10)
        .select("e1", "e2", "e3", F.col("n").cast("long").alias("n"))
    )


@register(
    "q189_activity_islands",
    # Gaps-and-islands: each event opens a 300 s activity interval; merge
    # overlapping intervals per user via the running-max-end flag, then
    # count islands and total covered seconds. Integer epoch arithmetic
    # end to end — no float in sight. Identical (s, e) ties cannot change
    # the flagged count (the first of a tie group inherits the pre-group
    # max; every later one sees an end >= its own start).
    oracle="""
WITH iv AS (
    SELECT user_id,
           CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) AS s,
           CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) + 300 AS e
    FROM events
),
marked AS (
    SELECT user_id, s, e,
           CASE WHEN s > COALESCE(
               MAX(e) OVER (
                   PARTITION BY user_id ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), -1) THEN 1 ELSE 0 END AS new_island
    FROM iv
),
islands AS (
    SELECT user_id, s, e,
           SUM(new_island) OVER (
               PARTITION BY user_id ORDER BY s, e ROWS UNBOUNDED PRECEDING
           ) AS island_id
    FROM marked
),
agg AS (
    SELECT user_id, island_id, MIN(s) AS start_s, MAX(e) AS end_s
    FROM islands GROUP BY user_id, island_id
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_islands,
       CAST(SUM(end_s - start_s) AS BIGINT) AS covered_sec
FROM agg GROUP BY user_id
""",
    tags=("temporal", "W2", "gaps-islands"),
)
def q189_activity_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged activity intervals per user (5-minute inactivity closes an
    island): the classic gaps-and-islands pattern as two per-user windows
    (bounded by a user's event count) and a keyed rollup."""
    events = load_table(spark, sf_dir, "events")
    iv = events.select(
        "user_id",
        F.col("ts").cast("long").alias("s"),
        (F.col("ts").cast("long") + 300).alias("e"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = iv.withColumn(
        "new_island",
        F.when(
            F.col("s") > F.coalesce(F.max("e").over(w_prev), F.lit(-1)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    islands = marked.withColumn("island_id", F.sum("new_island").over(w_run))
    agg = islands.groupBy("user_id", "island_id").agg(
        F.min("s").alias("start_s"), F.max("e").alias("end_s")
    )
    return agg.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum(F.col("end_s") - F.col("start_s")).alias("covered_sec"),
    )


@register(
    "q190_stream_static_enrich",
    # Stream-static broadcast join — the standard streaming-enrichment
    # pattern (dimension snapshot joined into every micro-batch without
    # state). Executed as a real streaming job (availableNow -> memory
    # sink, complete mode) like q107/q108; the oracle is the batch twin.
    oracle="""
SELECT n.n_name,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(e.value), 4) AS total_value
FROM events e
JOIN nation n ON CAST(n.n_nationkey AS BIGINT) = e.user_id % 25
GROUP BY n.n_name
""",
    tags=("streaming-enrich", "J1"),
)
def q190_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming events enriched with the static nation dim (broadcast —
    no stream-side state, re-read per micro-batch) and rolled up per
    nation in complete mode."""
    from ..streaming import events as se

    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("nk"), "n_name"
    )
    stream = se.read_events_stream(spark, sf_dir)
    enriched = stream.withColumn("nk", F.col("user_id") % 25).join(
        F.broadcast(nation), "nk"
    )
    agg = enriched.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )
    return se.run_available_now(agg, "q190_sink", output_mode="complete")


@register(
    "q197_streaming_watermark_dedup",
    # dropDuplicatesWithinWatermark EXECUTED as a streaming job. Which
    # duplicate survives follows processing order, so the declared output
    # is the key set (exact and deterministic); the oracle is the batch
    # DISTINCT. q40 stays the path when the surviving payload matters.
    oracle="""
SELECT DISTINCT user_id, event_type FROM events
""",
    tags=("streaming-dedup", "U4"),
)
def q197_streaming_watermark_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-arrival key dedup with watermark-bounded state
    (streaming/events.dedup_within_watermark), availableNow replay."""
    from ..streaming import events as se

    stream = se.read_events_stream(spark, sf_dir)
    out = se.run_available_now(
        se.dedup_within_watermark(stream), "q197_sink", output_mode="append"
    )
    return out.select("user_id", "event_type").distinct()


@register(
    "q206_cooldown_alerts",
    # The sequential-recurrence case: firing depends on which earlier rows
    # FIRED (not their values), so no window rewrite exists — Spark runs a
    # declared per-user applyInPandas scan; the oracle walks the same
    # recurrence with a linear recursive CTE over each user's candidate
    # sequence.
    oracle="""
WITH RECURSIVE cand AS (
    SELECT user_id, event_id,
           CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) AS sec,
           ROW_NUMBER() OVER (
               PARTITION BY user_id
               ORDER BY CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT), event_id
           ) AS rn
    FROM events WHERE value > 15.0
),
walk(user_id, rn, event_id, sec, fired, last_alert) AS (
    SELECT user_id, rn, event_id, sec, TRUE, sec FROM cand WHERE rn = 1
    UNION ALL
    SELECT c.user_id, c.rn, c.event_id, c.sec,
           c.sec - w.last_alert > 1800,
           CASE WHEN c.sec - w.last_alert > 1800 THEN c.sec ELSE w.last_alert END
    FROM walk w JOIN cand c ON c.user_id = w.user_id AND c.rn = w.rn + 1
)
SELECT user_id, event_id, sec AS alert_sec
FROM walk WHERE fired
""",
    tags=("temporal", "stateful", "mapInPandas"),
)
def q206_cooldown_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user threshold alerts with a 30-minute cooldown
    (operators/temporal.cooldown_alerts — declared Python stage)."""
    from ..operators import temporal

    events = load_table(spark, sf_dir, "events")
    return temporal.cooldown_alerts(events)


# ---------------------------------------------------------------------------
# q219 — MAD robust outliers (Iglewicz–Hoaglin modified z-score): the
# robust sibling of the W4 z-score family (q14/q91/...). Per event_type:
# med = median(value), mad = median(|value - med|), modified z =
# 0.6745*(value - med)/mad, outlier when |z| > 3.5. Medians resist the
# very outliers being hunted — the reason production monitoring uses MAD
# where plain z-scores mask heavy tails.
# Scale: two per-type aggregates (type-keyed, 5..thousands of groups —
# uniform) broadcast back; the detail side never shuffles twice for the
# same key thanks to the broadcast joins; no global window. Median
# interpolation is identical IEEE arithmetic in both engines (the proven
# percentile==QUANTILE_CONT contract), boundaries rounded 4dp.
# ---------------------------------------------------------------------------
@register(
    "q219_mad_outliers",
    oracle="""
WITH med AS (
    SELECT event_type, ROUND(QUANTILE_CONT(value, 0.5), 4) AS med
    FROM events GROUP BY event_type
),
mad AS (
    SELECT e.event_type,
           ROUND(QUANTILE_CONT(ABS(e.value - m.med), 0.5), 4) AS mad
    FROM events e JOIN med m ON m.event_type = e.event_type
    GROUP BY e.event_type
),
scored AS (
    SELECT e.event_id, e.event_type, ROUND(e.value, 4) AS value,
           ROUND(0.6745 * (e.value - m.med) / d.mad, 4) AS mod_z
    FROM events e
    JOIN med m ON m.event_type = e.event_type
    JOIN mad d ON d.event_type = e.event_type
    WHERE d.mad > 0
)
SELECT event_id, event_type, value, mod_z
FROM scored WHERE ABS(mod_z) > 3.5
""",
    tags=("W4", "robust-stats", "quality"),
)
def q219_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type MAD modified z-score outliers: (event_id, event_type,
    value, mod_z) where |mod_z| > 3.5 — median/MAD computed as two
    broadcast per-type aggregates, no global window."""
    events = load_table(spark, sf_dir, "events")
    med = events.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("med")
    )
    mad = (
        events.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(
                F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)), 4
            ).alias("mad")
        )
    )
    return (
        events.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .filter(F.col("mad") > 0)
        .select(
            "event_id",
            "event_type",
            F.round("value", 4).alias("value"),
            F.round(
                F.lit(0.6745) * (F.col("value") - F.col("med")) / F.col("mad"), 4
            ).alias("mod_z"),
        )
        .filter(F.abs("mod_z") > 3.5)
    )


# ---------------------------------------------------------------------------
# q220 — STL-style seasonal decomposition of the daily event-value series
# per event_type: trend = centered 7-day moving average of the daily mean,
# seasonal = day-of-week mean of the detrended series, residual = daily -
# trend - seasonal, anomaly when |residual| > 2 * stddev_pop(residual).
# The monitoring decomposition behind "is today actually unusual, or is it
# just Sunday" — composes with q205's CUSUM (level shifts) and q219's MAD
# (point outliers).
# Scale: the raw corpus collapses FIRST to (type, day) daily means — one
# type+day-keyed aggregate — so every window below runs over #types ×
# #days rows, bounded by the calendar, never by event volume. Windows are
# partitioned by event_type (no global window); the anomaly gate is a
# per-type 1-row broadcast.
# Parity: EVERYTHING is exact integer deci-milli units from the first
# aggregate on (per-event values quantized to ints, then FLOOR means —
# 4dp-rounding ANY cross-row average lands on .00005 half-boundaries
# where the engines' ROUND semantics diverge, the q216 lesson):
# integer window sums, FLOOR averages, and the 2-sigma gate as
# the all-integer inequality r²·n² > 4·(n·Σr² − (Σr)²) — no sqrt, no
# stddev implementation differences. DuckDB DAYOFWEEK is Sunday=0 → +1
# matches Spark's Sunday=1.
# ---------------------------------------------------------------------------
@register(
    "q220_seasonal_decompose",
    oracle="""
WITH daily AS (
    SELECT event_type, DATE_TRUNC('day', ts) AS day,
           DAYOFWEEK(ts) + 1 AS dow,
           CAST(FLOOR(CAST(SUM(CAST(ROUND(value * 10000.0) AS BIGINT))
                           AS DOUBLE) / COUNT(*)) AS BIGINT) AS d_int
    FROM events GROUP BY event_type, DATE_TRUNC('day', ts), DAYOFWEEK(ts)
),
trended AS (
    SELECT event_type, day, dow, d_int,
           CAST(ROUND(CAST(SUM(d_int) OVER w AS DOUBLE)
                      / COUNT(*) OVER w) AS BIGINT) AS t_int
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
seas AS (
    SELECT event_type, dow,
           CAST(FLOOR(CAST(SUM(d_int - t_int) AS DOUBLE) / COUNT(*)) AS BIGINT)
               AS s_int
    FROM trended GROUP BY event_type, dow
),
resid AS (
    SELECT t.event_type, t.day, t.d_int, t.t_int, s.s_int,
           t.d_int - t.t_int - s.s_int AS r_int
    FROM trended t JOIN seas s ON s.event_type = t.event_type AND s.dow = t.dow
),
gate AS (
    SELECT event_type, COUNT(*) AS n, SUM(r_int) AS s1,
           SUM(r_int * r_int) AS s2
    FROM resid GROUP BY event_type
)
SELECT r.event_type, STRFTIME(r.day, '%Y-%m-%d') AS day,
       r.d_int / 10000.0 AS daily_avg,
       r.t_int / 10000.0 AS trend,
       r.s_int / 10000.0 AS seasonal,
       r.r_int / 10000.0 AS residual,
       CAST(CASE WHEN r.r_int * r.r_int * g.n * g.n
                      > 4 * (g.n * g.s2 - g.s1 * g.s1)
                 THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
FROM resid r JOIN gate g ON g.event_type = r.event_type
""",
    tags=("temporal", "W4", "quality"),
)
def q220_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily trend/seasonal/residual decomposition per event_type with
    2-sigma residual anomaly flags: (event_type, day, daily_avg, trend,
    seasonal, residual, is_anomaly). Exact-integer pipeline after the
    daily mean (see the registration comment)."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type",
        F.date_trunc("day", "ts").alias("day"),
        F.dayofweek("ts").alias("dow"),
    ).agg(
        F.floor(
            F.sum(F.round(F.col("value") * F.lit(10000.0)).cast("long")).cast(
                "double"
            )
            / F.count(F.lit(1))
        )
        .cast("long")
        .alias("d_int")
    )
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    trended = daily.withColumn(
        "t_int",
        F.round(
            F.sum("d_int").over(w).cast("double") / F.count(F.lit(1)).over(w)
        ).cast("long"),
    )
    seas = trended.groupBy("event_type", "dow").agg(
        F.floor(
            F.sum(F.col("d_int") - F.col("t_int")).cast("double")
            / F.count(F.lit(1))
        )
        .cast("long")
        .alias("s_int")
    )
    resid = trended.join(F.broadcast(seas), ["event_type", "dow"]).withColumn(
        "r_int", F.col("d_int") - F.col("t_int") - F.col("s_int")
    )
    gate = resid.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("r_int").alias("s1"),
        F.sum(F.col("r_int") * F.col("r_int")).alias("s2"),
    )
    return resid.join(F.broadcast(gate), "event_type").select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        (F.col("d_int") / F.lit(10000.0)).alias("daily_avg"),
        (F.col("t_int") / F.lit(10000.0)).alias("trend"),
        (F.col("s_int") / F.lit(10000.0)).alias("seasonal"),
        (F.col("r_int") / F.lit(10000.0)).alias("residual"),
        (
            F.col("r_int") * F.col("r_int") * F.col("n") * F.col("n")
            > 4 * (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"))
        )
        .cast("long")
        .alias("is_anomaly"),
    )


# ---------------------------------------------------------------------------
# q227 — split-conformal outlier detection (Vovk et al.; the
# distribution-free calibration tier modern monitoring stacks put on top
# of raw scores): calibration half (even event_id) fits per-type centres;
# nonconformity = |value − centre|; the per-type threshold is the
# ⌈(n+1)·0.9⌉-th smallest calibration score (the finite-sample correction
# that makes the 90% coverage guarantee EXACT, not asymptotic); the test
# half (odd event_id) is flagged where its score exceeds the threshold.
# Everything is exact integers: 1e4-quantised values, FLOOR means,
# integer rank arithmetic k = (9·(n+1)+9) div 10, and the threshold is an
# ORDER STATISTIC (a value that exists in the data — no interpolation).
# Scale: per-type aggregates broadcast back; the rank window partitions by
# event_type over the calibration half only. No global window.
# ---------------------------------------------------------------------------
@register(
    "q227_conformal_outliers",
    oracle="""
WITH vint AS (
    SELECT event_id, event_type,
           CAST(ROUND(value * 10000.0) AS BIGINT) AS v
    FROM events
),
cal AS (SELECT * FROM vint WHERE event_id % 2 = 0),
centre AS (
    SELECT event_type,
           CAST(FLOOR(CAST(SUM(v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS mu,
           COUNT(*) AS n_cal
    FROM cal GROUP BY event_type
),
cal_scored AS (
    SELECT c.event_type, ABS(c.v - ct.mu) AS score,
           ROW_NUMBER() OVER (PARTITION BY c.event_type
                              ORDER BY ABS(c.v - ct.mu) ASC, c.event_id ASC) AS rk,
           ct.n_cal
    FROM cal c JOIN centre ct ON ct.event_type = c.event_type
),
thr AS (
    SELECT event_type, score AS thr
    FROM cal_scored
    WHERE rk = LEAST((9 * (n_cal + 1) + 9) // 10, n_cal)
)
SELECT t.event_id, t.event_type,
       ABS(t.v - ct.mu) AS score_milli,
       CAST(CASE WHEN ABS(t.v - ct.mu) > th.thr THEN 1 ELSE 0 END AS BIGINT)
           AS is_outlier
FROM vint t
JOIN centre ct ON ct.event_type = t.event_type
JOIN thr th ON th.event_type = t.event_type
WHERE t.event_id % 2 = 1
""",
    tags=("quality", "W4", "robust-stats"),
)
def q227_conformal_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal 90% outlier flags on the odd-event half, calibrated
    on the even half: (event_id, event_type, score_milli, is_outlier)."""
    events = load_table(spark, sf_dir, "events")
    vint = events.select(
        "event_id",
        "event_type",
        F.round(F.col("value") * F.lit(10000.0)).cast("long").alias("v"),
    )
    cal = vint.filter(F.col("event_id") % 2 == 0)
    centre = cal.groupBy("event_type").agg(
        F.floor(F.sum("v").cast("double") / F.count(F.lit(1)))
        .cast("long")
        .alias("mu"),
        F.count(F.lit(1)).alias("n_cal"),
    )
    cal_scored = cal.join(F.broadcast(centre), "event_type").select(
        "event_type",
        "n_cal",
        F.abs(F.col("v") - F.col("mu")).alias("score"),
        "event_id",
    )
    rk = F.row_number().over(
        Window.partitionBy("event_type").orderBy(F.asc("score"), F.asc("event_id"))
    )
    thr = (
        cal_scored.withColumn("rk", rk)
        .filter(
            F.col("rk")
            == F.least((9 * (F.col("n_cal") + 1) + 9).cast("long") / 10, F.col("n_cal"))
            .cast("long")
        )
        .select("event_type", F.col("score").alias("thr"))
    )
    return (
        vint.filter(F.col("event_id") % 2 == 1)
        .join(F.broadcast(centre), "event_type")
        .join(F.broadcast(thr), "event_type")
        .select(
            "event_id",
            "event_type",
            F.abs(F.col("v") - F.col("mu")).alias("score_milli"),
            (F.abs(F.col("v") - F.col("mu")) > F.col("thr")).cast("long").alias("is_outlier"),
        )
    )


# ---------------------------------------------------------------------------
# q229 — CUPED variance reduction (Deng et al. 2013, "Improving the
# Sensitivity of Online Controlled Experiments"): the standard trick every
# experimentation platform applies before the t-test — adjust each user's
# experiment-period metric by their PRE-period metric,
# adjusted = post − θ·(pre − mean(pre)), θ = cov(pre, post)/var(pre),
# which strips the between-user variance the pre-period explains. Pre =
# first 15 days, post = rest; variant = user parity (the q175 A/B frame).
# θ and mean come from EXACT integer moments across users (cov·n² =
# n·Σxy − Σx·Σy); the adjustment is identical-operand double algebra
# rounded 4dp.
# Scale: one user-keyed conditional aggregate builds (pre, post); the
# moment aggregate is one 1-row broadcast. No window at all.
# ---------------------------------------------------------------------------
@register(
    "q229_cuped_adjustment",
    oracle="""
WITH per_user AS (
    SELECT user_id,
           CAST(user_id % 2 AS BIGINT) AS variant,
           SUM(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                    THEN CAST(ROUND(value * 10000.0) AS BIGINT) ELSE 0 END) AS pre_v,
           SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
                    THEN CAST(ROUND(value * 10000.0) AS BIGINT) ELSE 0 END) AS post_v
    FROM events GROUP BY user_id
),
mom AS (
    SELECT COUNT(*) AS n, SUM(pre_v) AS sx, SUM(post_v) AS sy,
           SUM(pre_v * pre_v) AS sxx, SUM(pre_v * post_v) AS sxy
    FROM per_user
),
theta AS (
    SELECT CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE) AS th,
           CAST(sx AS DOUBLE) / n AS mu_pre
    FROM mom
)
SELECT u.user_id, u.variant,
       CAST(u.pre_v AS BIGINT) AS pre_milli, CAST(u.post_v AS BIGINT) AS post_milli,
       ROUND((u.post_v - t.th * (u.pre_v - t.mu_pre)) / 10000.0, 4) AS adjusted
FROM per_user u CROSS JOIN theta t
""",
    tags=("A12", "quality", "W4"),
)
def q229_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user CUPED-adjusted experiment metric:
    (user_id, variant, pre_milli, post_milli, adjusted)."""
    events = load_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-16 00:00:00").cast("timestamp")
    v = F.round(F.col("value") * F.lit(10000.0)).cast("long")
    per_user = events.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < cutoff, v).otherwise(F.lit(0))).alias("pre_v"),
        F.sum(F.when(F.col("ts") >= cutoff, v).otherwise(F.lit(0))).alias("post_v"),
    ).withColumn("variant", (F.col("user_id") % 2).cast("long"))
    # moments in DECIMAL(38,0): n·Σxx on milli-quantised values exceeds
    # int64 around 1.5k users × 1e7-scale sums (a silent long wrap in
    # non-ANSI Spark — DuckDB's HUGEINT doesn't wrap, so the hash gate
    # caught it at sf0.1); θ then derives driver-side in Python bigints,
    # exactly the float(int)/float(int) single ops the oracle performs.
    mom = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("pre_v").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("post_v").cast("decimal(38,0)")).alias("sy"),
        F.sum((F.col("pre_v") * F.col("pre_v")).cast("decimal(38,0)")).alias("sxx"),
        F.sum((F.col("pre_v") * F.col("post_v")).cast("decimal(38,0)")).alias("sxy"),
    ).first()
    n = int(mom["n"])
    sx, sy, sxx, sxy = (int(mom[c]) for c in ("sx", "sy", "sxx", "sxy"))
    th = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
    mu_pre = float(sx) / float(n)
    return per_user.select(
        "user_id",
        "variant",
        F.col("pre_v").alias("pre_milli"),
        F.col("post_v").alias("post_milli"),
        F.round(
            (F.col("post_v") - F.lit(th) * (F.col("pre_v") - F.lit(mu_pre)))
            / F.lit(10000.0),
            4,
        ).alias("adjusted"),
    )


# --------------------------------------------------------------------------
# q241 — Kaplan–Meier survival curves per signup cohort. Unit = user;
# duration = days between first and last event; a user whose last event
# falls within 12 hours of the corpus end is CENSORED (might still be
# active), otherwise the last event marks observed churn. (The horizon
# is 12 hours because this corpus is a dense 30-day burst — median
# last-event gap ≈ 7 h; a calendar-weekly horizon censors everyone.) S(t) is the
# product-limit estimator over churn days; the per-step log factor is
# frozen to an exact micro-integer so the running product is an integer
# cumsum (the q216/q221 device), and a step where every at-risk user
# churns pins the sentinel -100e6 (exp → 0 after rounding) instead of
# ln(0).
#
# 100 TB posture: one user-keyed aggregate collapses the corpus; the two
# cumulative windows partition by cohort over DISTINCT DURATION rows
# (bounded by the observation horizon in days — a calendar-bounded
# relation, same exception class as q220), never over raw events.
# --------------------------------------------------------------------------
_KM_CENSOR_HOURS = 12


@register(
    "q241_km_survival",
    oracle=f"""
WITH users AS (
    SELECT user_id,
           MIN(ts) AS first_ts,
           MAX(ts) AS last_ts,
           CASE WHEN SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) > 0
                THEN 'registered' ELSE 'guest' END AS cohort
    FROM events GROUP BY user_id
),
horizon AS (SELECT MAX(ts) AS max_ts FROM events),
durs AS (
    SELECT u.cohort,
           CAST(FLOOR(EPOCH(u.last_ts - u.first_ts) / 3600.0) AS BIGINT) AS dur,
           CASE WHEN u.last_ts <= h.max_ts - INTERVAL {_KM_CENSOR_HOURS} HOUR
                THEN 1 ELSE 0 END AS churn
    FROM users u CROSS JOIN horizon h
),
steps AS (
    SELECT cohort, dur,
           CAST(COUNT(*) AS BIGINT) AS n_all,
           CAST(SUM(churn) AS BIGINT) AS d
    FROM durs GROUP BY cohort, dur
),
risked AS (
    SELECT cohort, dur, d,
           SUM(n_all) OVER (
               PARTITION BY cohort ORDER BY dur DESC
           ) AS at_risk
    FROM steps
),
logged AS (
    SELECT cohort, dur, d, at_risk,
           CASE WHEN d = 0 THEN 0
                WHEN d < at_risk
                THEN CAST(ROUND(LN(1.0 - CAST(d AS DOUBLE) / at_risk)
                                * 1000000.0) AS BIGINT)
                ELSE -100000000 END AS li
    FROM risked
)
SELECT cohort,
       CAST(dur AS BIGINT) AS dur_hours,
       CAST(at_risk AS BIGINT) AS at_risk,
       d AS churns,
       ROUND(EXP(CAST(SUM(li) OVER (
           PARTITION BY cohort ORDER BY dur ASC
       ) AS DOUBLE) / 1000000.0), 4) AS survival
FROM logged
WHERE d > 0
ORDER BY cohort, dur_hours
""",
    tags=("survival", "A12", "W2"),
)
def q241_km_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-limit survival per cohort: (cohort, dur_hours, at_risk,
    churns, survival) — duration = whole elapsed hours between a user's
    first and last event. Censoring = last event within 12 hours of
    corpus end; survival via exact micro-integer log cumsum."""
    events = load_table(spark, sf_dir, "events")
    users = events.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.when(
            F.sum((F.col("event_type") == "signup").cast("int")) > 0,
            F.lit("registered"),
        )
        .otherwise(F.lit("guest"))
        .alias("cohort"),
    )
    horizon = events.agg(F.max("ts").alias("max_ts"))
    durs = users.crossJoin(F.broadcast(horizon)).select(
        "cohort",
        F.floor(
            (
                F.col("last_ts").cast("double")
                - F.col("first_ts").cast("double")
            )
            / 3600.0
        )
        .cast("long")
        .alias("dur"),
        (
            F.col("last_ts")
            <= F.col("max_ts") - F.expr(f"INTERVAL {_KM_CENSOR_HOURS} HOURS")
        )
        .cast("long")
        .alias("churn"),
    )
    steps = durs.groupBy("cohort", "dur").agg(
        F.count(F.lit(1)).alias("n_all"), F.sum("churn").alias("d")
    )
    w_risk = Window.partitionBy("cohort").orderBy(F.desc("dur"))
    risked = steps.withColumn("at_risk", F.sum("n_all").over(w_risk))
    li = (
        F.when(F.col("d") == 0, F.lit(0))
        .when(
            F.col("d") < F.col("at_risk"),
            F.round(
                F.log(1.0 - F.col("d").cast("double") / F.col("at_risk"))
                * 1000000.0
            ).cast("long"),
        )
        .otherwise(F.lit(-100000000))
    )
    w_surv = Window.partitionBy("cohort").orderBy(F.asc("dur"))
    return (
        risked.withColumn("li", li)
        .withColumn(
            "survival",
            F.round(
                F.exp(F.sum("li").over(w_surv).cast("double") / 1000000.0), 4
            ),
        )
        .filter(F.col("d") > 0)
        .select(
            "cohort",
            F.col("dur").cast("long").alias("dur_hours"),
            F.col("at_risk").cast("long").alias("at_risk"),
            F.col("d").alias("churns"),
            "survival",
        )
        .orderBy("cohort", "dur_hours")
    )


# --------------------------------------------------------------------------
# q246 — recency-decayed engagement score: Σ value·e^(−age/τ) per user
# (τ = 7 days), the standard feature-store freshness weighting next to
# q164's interval-weighted average. Each event's term is a pure function
# of (ts, value, corpus max ts) frozen to an integer micro-unit before
# the user-keyed sum — exact across partitionings. One 1-row horizon
# broadcast + one user-keyed aggregate; embarrassingly parallel.
# --------------------------------------------------------------------------
_DECAY_TAU_DAYS = 7.0


@register(
    "q246_decay_engagement",
    oracle=f"""
WITH horizon AS (SELECT MAX(ts) AS max_ts FROM events),
terms AS (
    SELECT e.user_id,
           CAST(ROUND(e.value
                      * EXP(-(EPOCH(h.max_ts - e.ts) / 86400.0)
                            / {_DECAY_TAU_DAYS})
                      * 10000) AS BIGINT) AS li
    FROM events e CROSS JOIN horizon h
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(li) / 10000.0, 4) AS decay_score
FROM terms
GROUP BY user_id
ORDER BY user_id
""",
    tags=("feature-store", "A5", "W4"),
)
def q246_decay_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential recency-decay engagement per user:
    (user_id, n_events, decay_score), τ = 7 days, exact micro-integer
    term sums."""
    events = load_table(spark, sf_dir, "events")
    horizon = events.agg(F.max("ts").alias("max_ts"))
    age_days = (
        F.col("max_ts").cast("double") - F.col("ts").cast("double")
    ) / 86400.0
    terms = events.crossJoin(F.broadcast(horizon)).select(
        "user_id",
        F.round(
            F.col("value") * F.exp(-age_days / _DECAY_TAU_DAYS) * 10000
        )
        .cast("long")
        .alias("li"),
    )
    return (
        terms.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("li") / 10000.0, 4).alias("decay_score"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# q247 — autocorrelation function (ACF) of the per-type daily event-count
# series at lags 1..7: the diagnostic behind "does volume have weekly
# memory", feeding seasonality choices (q220's period) and anomaly-window
# sizing. Standard estimator r_k = Σ_{t>k}(c_t−μ)(c_{t−k}−μ) / Σ(c_t−μ)².
# Parity: multiply through by n² so every term is integer — with
# a_t = n·c_t − S (S = Σc, both integers) r_k = Σ a_t·a_{t−k} / Σ a_t²
# exactly, no float mean, no summation-order ulps; the single division
# happens once at the end on integer operands.
# Scale: the corpus collapses FIRST to (type, day) counts — one bounded
# aggregate (#types × #days rows ≤ calendar); per-type row numbers are
# per-type-partitioned windows; the lag alignment is an equi-join of the
# tiny series to itself on (type, rn−k); (n, S) ride a per-type broadcast.
# Nothing downstream of the first aggregate scales with event volume.
# ---------------------------------------------------------------------------
_ACF_MAX_LAG = 7


@register(
    "q247_acf",
    oracle=f"""
WITH daily AS (
    SELECT event_type, DATE_TRUNC('day', ts) AS day, COUNT(*) AS c
    FROM events GROUP BY event_type, DATE_TRUNC('day', ts)
),
numbered AS (
    SELECT event_type, c,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn
    FROM daily
),
stats AS (
    SELECT event_type, COUNT(*) AS n, SUM(c) AS s FROM numbered
    GROUP BY event_type
),
centered AS (
    SELECT nb.event_type, nb.rn, st.n, nb.c * st.n - st.s AS a
    FROM numbered nb JOIN stats st ON st.event_type = nb.event_type
),
dens AS (
    SELECT event_type, MAX(n) AS n_days, SUM(a * a) AS den FROM centered
    GROUP BY event_type
),
nums AS (
    SELECT cur.event_type, lg.lag, SUM(cur.a * prev.a) AS num
    FROM centered cur
    JOIN (SELECT UNNEST(GENERATE_SERIES(1, {_ACF_MAX_LAG})) AS lag) lg ON TRUE
    JOIN centered prev
      ON prev.event_type = cur.event_type AND prev.rn = cur.rn - lg.lag
    GROUP BY cur.event_type, lg.lag
)
SELECT nm.event_type, CAST(nm.lag AS BIGINT) AS lag,
       ROUND(CAST(nm.num AS DOUBLE) / dn.den, 4) AS acf,
       CAST(dn.n_days AS BIGINT) AS n_days
FROM nums nm JOIN dens dn ON dn.event_type = nm.event_type
ORDER BY nm.event_type, lag
""",
    tags=("temporal", "W4", "A5"),
)
def q247_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type daily-count autocorrelation at lags 1..7:
    (event_type, lag, acf, n_days). Exact n²-scaled integer algebra — see
    the registration comment."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    numbered = daily.withColumn(
        "rn", F.row_number().over(Window.partitionBy("event_type").orderBy("day"))
    ).select("event_type", "rn", "c")
    stats = numbered.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("c").alias("s")
    )
    centered = numbered.join(F.broadcast(stats), "event_type").select(
        "event_type", "rn", "n", (F.col("c") * F.col("n") - F.col("s")).alias("a")
    )
    dens = centered.groupBy("event_type").agg(
        F.max("n").alias("n_days"), F.sum(F.col("a") * F.col("a")).alias("den")
    )
    lags = spark.range(1, _ACF_MAX_LAG + 1).select(F.col("id").alias("lag"))
    cur = centered.crossJoin(F.broadcast(lags))
    prev = centered.select(
        F.col("event_type").alias("p_type"),
        F.col("rn").alias("p_rn"),
        F.col("a").alias("p_a"),
    )
    nums = (
        cur.join(
            prev,
            (F.col("p_type") == F.col("event_type"))
            & (F.col("p_rn") == F.col("rn") - F.col("lag")),
        )
        .groupBy("event_type", "lag")
        .agg(F.sum(F.col("a") * F.col("p_a")).alias("num"))
    )
    return (
        nums.join(F.broadcast(dens), "event_type")
        .select(
            "event_type",
            F.col("lag").cast("long").alias("lag"),
            F.round(F.col("num").cast("double") / F.col("den"), 4).alias("acf"),
            F.col("n_days").cast("long").alias("n_days"),
        )
        .orderBy("event_type", "lag")
    )


# ---------------------------------------------------------------------------
# q248 — EWMA control chart over the per-type daily mean value: smooth the
# PRIOR 7 days with exponentially-decaying weights (α = 0.3) and flag days
# whose deviation from that forecast exceeds 2σ of the per-type deviation
# distribution — the classic monitoring chart next to q205's CUSUM (level
# shifts) and q220's STL residuals (seasonality-aware). Excluding the
# current day from the smoother is what makes it a forecast residual.
# Parity: daily means are FLOOR'd micro-ints (q220 discipline); the decay
# weights are integer literals round(0.7^j·10⁶) inlined IDENTICALLY in
# both engines (no pow() at runtime); the smoother is an integer
# weighted-sum ratio FLOOR'd once; the 2σ gate is the all-integer
# inequality d²·n² > 4·(n·Σd² − (Σd)²) — no sqrt anywhere.
# Scale: collapses to (type, day) first (bounded by the calendar); lag
# windows are per-type partitioned; the σ gate is a per-type 1-row
# broadcast. Nothing downstream scales with event volume.
# ---------------------------------------------------------------------------
_EWMA_W = [1000000, 700000, 490000, 343000, 240100, 168070, 117649]


def _ewma_oracle() -> str:
    lag_cols = ",\n           ".join(
        f"LAG(x_int, {j + 1}) OVER w AS l{j}" for j in range(len(_EWMA_W))
    )
    num = " + ".join(
        f"COALESCE(l{j} * {w}, 0)" for j, w in enumerate(_EWMA_W)
    )
    den = " + ".join(
        f"CASE WHEN l{j} IS NULL THEN 0 ELSE {w} END"
        for j, w in enumerate(_EWMA_W)
    )
    return f"""
WITH daily AS (
    SELECT event_type, DATE_TRUNC('day', ts) AS day,
           CAST(FLOOR(CAST(SUM(CAST(ROUND(value * 10000.0) AS BIGINT))
                           AS DOUBLE) / COUNT(*)) AS BIGINT) AS x_int
    FROM events GROUP BY event_type, DATE_TRUNC('day', ts)
),
lagged AS (
    SELECT event_type, day, x_int,
           {lag_cols}
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day)
),
smoothed AS (
    SELECT event_type, day, x_int,
           CAST(FLOOR(CAST({num} AS DOUBLE) / ({den})) AS BIGINT) AS e_int
    FROM lagged WHERE l0 IS NOT NULL
),
devs AS (
    SELECT event_type, day, x_int, e_int, x_int - e_int AS d_int
    FROM smoothed
),
gate AS (
    SELECT event_type, COUNT(*) AS n, SUM(d_int) AS s1,
           SUM(d_int * d_int) AS s2
    FROM devs GROUP BY event_type
)
SELECT d.event_type, STRFTIME(d.day, '%Y-%m-%d') AS day,
       d.x_int / 10000.0 AS daily_avg,
       d.e_int / 10000.0 AS ewma,
       d.d_int / 10000.0 AS dev,
       CAST(CASE WHEN d.d_int * d.d_int * g.n * g.n
                      > 4 * (g.n * g.s2 - g.s1 * g.s1)
                 THEN 1 ELSE 0 END AS BIGINT) AS alert
FROM devs d JOIN gate g ON g.event_type = d.event_type
ORDER BY d.event_type, day
"""


@register(
    "q248_ewma_control",
    oracle=_ewma_oracle(),
    tags=("temporal", "W4", "quality"),
)
def q248_ewma_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prior-7-day EWMA forecast residual chart per event_type:
    (event_type, day, daily_avg, ewma, dev, alert). Integer decay weights,
    integer 2σ gate — see the registration comment."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.floor(
            F.sum(F.round(F.col("value") * F.lit(10000.0)).cast("long")).cast(
                "double"
            )
            / F.count(F.lit(1))
        )
        .cast("long")
        .alias("x_int")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        "day",
        "x_int",
        *[
            F.lag("x_int", j + 1).over(w).alias(f"l{j}")
            for j in range(len(_EWMA_W))
        ],
    )
    num = None
    den = None
    for j, wt in enumerate(_EWMA_W):
        t_num = F.coalesce(F.col(f"l{j}") * F.lit(wt), F.lit(0))
        t_den = F.when(F.col(f"l{j}").isNull(), F.lit(0)).otherwise(F.lit(wt))
        num = t_num if num is None else num + t_num
        den = t_den if den is None else den + t_den
    devs = (
        lagged.filter(F.col("l0").isNotNull())
        .withColumn(
            "e_int", F.floor(num.cast("double") / den).cast("long")
        )
        .withColumn("d_int", F.col("x_int") - F.col("e_int"))
    )
    gate = devs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("d_int").alias("s1"),
        F.sum(F.col("d_int") * F.col("d_int")).alias("s2"),
    )
    return (
        devs.join(F.broadcast(gate), "event_type")
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            (F.col("x_int") / F.lit(10000.0)).alias("daily_avg"),
            (F.col("e_int") / F.lit(10000.0)).alias("ewma"),
            (F.col("d_int") / F.lit(10000.0)).alias("dev"),
            (
                F.col("d_int") * F.col("d_int") * F.col("n") * F.col("n")
                > 4 * (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"))
            )
            .cast("long")
            .alias("alert"),
        )
        .orderBy("event_type", "day")
    )


# --------------------------------------------------------------------------
# q255 — item-item collaborative filtering over order baskets: cosine
# similarity on the order-incidence vectors (cos = cooc/√(n_i·n_j)) with
# the top-3 neighbours per part — the classic "customers who bought X
# also bought Y" precompute (Amazon item-to-item CF), upgrading q169's
# raw pair counts with normalisation + ranked neighbour lists.
# Parity: cooc/n_i/n_j are exact integers; the cosine is ONE double
# division of integers (no cross-row float accumulation), so the rank
# comparison is on identical doubles in both engines; ties break on
# neighbour id. 4dp round on output only.
# Scale: the pair blow-up is per-order and bounded by lines-per-order
# (≤ 13 here ⇒ ≤ 78 pairs/order) — map-side, then one partial-agg
# shuffle on the pair key; supports broadcast; the top-3 window is
# partitioned per item and gets WindowGroupLimit pushdown on Spark 4.
# --------------------------------------------------------------------------
@register(
    "q255_item_item_cf",
    oracle="""
WITH items AS (
    SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
),
supp AS (SELECT pk, COUNT(*) AS s FROM items GROUP BY pk),
pairs AS (
    SELECT a.pk AS pa, b.pk AS pb, COUNT(*) AS cooc
    FROM items a JOIN items b ON b.ok = a.ok AND a.pk < b.pk
    GROUP BY a.pk, b.pk
),
both_dir AS (
    SELECT pa AS item, pb AS neighbor, cooc FROM pairs
    UNION ALL
    SELECT pb AS item, pa AS neighbor, cooc FROM pairs
),
scored AS (
    SELECT d.item, d.neighbor, d.cooc,
           d.cooc / SQRT(CAST(si.s AS DOUBLE) * sj.s) AS cosine
    FROM both_dir d
    JOIN supp si ON si.pk = d.item
    JOIN supp sj ON sj.pk = d.neighbor
    WHERE d.cooc >= 2
),
ranked AS (
    SELECT item, neighbor, cooc, cosine,
           ROW_NUMBER() OVER (PARTITION BY item
                              ORDER BY cosine DESC, neighbor ASC) AS rnk
    FROM scored
)
SELECT CAST(item AS BIGINT) AS item, CAST(neighbor AS BIGINT) AS neighbor,
       CAST(cooc AS BIGINT) AS cooc, ROUND(cosine, 4) AS cosine,
       CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= 3
ORDER BY item, rnk
""",
    tags=("recsys", "A5", "W2", "O4"),
)
def q255_item_item_cf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item CF neighbour lists: (item, neighbor, cooc, cosine, rnk)
    — top-3 cosine neighbours per part over order-basket co-occurrence
    (cooc ≥ 2). Exact-integer counts, one-division cosine."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    items = lineitem.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    supp = items.groupBy("pk").agg(F.count(F.lit(1)).alias("s"))
    a = items.select("ok", F.col("pk").alias("pa"))
    b = items.select("ok", F.col("pk").alias("pb"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("cooc"))
    )
    both_dir = pairs.select(
        F.col("pa").alias("item"), F.col("pb").alias("neighbor"), "cooc"
    ).unionByName(
        pairs.select(
            F.col("pb").alias("item"), F.col("pa").alias("neighbor"), "cooc"
        )
    )
    si = supp.select(F.col("pk").alias("item"), F.col("s").alias("si"))
    sj = supp.select(F.col("pk").alias("neighbor"), F.col("s").alias("sj"))
    scored = (
        both_dir.filter(F.col("cooc") >= 2)
        .join(si, "item")
        .join(sj, "neighbor")
        .select(
            "item",
            "neighbor",
            "cooc",
            (
                F.col("cooc")
                / F.sqrt(F.col("si").cast("double") * F.col("sj"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("item").orderBy(
        F.col("cosine").desc(), F.col("neighbor").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            F.col("item").cast("long").alias("item"),
            F.col("neighbor").cast("long").alias("neighbor"),
            F.col("cooc").cast("long").alias("cooc"),
            F.round("cosine", 4).alias("cosine"),
            F.col("rnk").cast("long").alias("rnk"),
        )
        .orderBy("item", "rnk")
    )


# --------------------------------------------------------------------------
# q259 — behavioural sequence-pattern mining: each user's event history
# becomes a character string (one char per event, time-ordered) and a
# regex counts non-overlapping view→click→purchase funnels with no
# intervening purchase — the MATCH_RECOGNIZE-style pattern query, as a
# regex over materialised sequences.
# Parity: the sequence string is built from an array_sort over
# (ts, event_id, chr) structs — a total order, so both engines emit the
# identical string; regex counting is leftmost non-overlapping greedy in
# both Java regex and RE2 for this pattern class. All outputs integers.
# Scale: one groupBy(user) collecting per-user events — bounded by
# per-user history length (the same contract as sessionization); the
# regex scan is linear per user. No joins, no windows.
# --------------------------------------------------------------------------
@register(
    "q259_sequence_patterns",
    oracle="""
WITH seqs AS (
    SELECT user_id,
           COUNT(*) AS n_events,
           STRING_AGG(SUBSTR(event_type, 1, 1), ''
                      ORDER BY ts, event_id) AS seq
    FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(LEN(REGEXP_EXTRACT_ALL(seq, 'v[^p]*c[^p]*p')) AS BIGINT)
           AS n_funnels
FROM seqs
WHERE LEN(REGEXP_EXTRACT_ALL(seq, 'v[^p]*c[^p]*p')) >= 1
ORDER BY user_id
""",
    tags=("sequence", "A5", "F23"),
)
def q259_sequence_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex funnel counting over per-user event-character sequences:
    (user_id, n_events, n_funnels) for users with ≥1 non-overlapping
    view→click→purchase (no intervening purchase) match."""
    events = load_table(spark, sf_dir, "events")
    seqs = (
        events.select(
            "user_id",
            F.struct(
                F.col("ts"),
                F.col("event_id"),
                F.substring("event_type", 1, 1).alias("chr"),
            ).alias("ev"),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("ev")), lambda x: x["chr"]
                ),
                "",
            ).alias("seq"),
        )
    )
    counted = seqs.select(
        "user_id",
        F.col("n_events").cast("long").alias("n_events"),
        F.size(F.regexp_extract_all("seq", F.lit("v[^p]*c[^p]*p"), F.lit(0)))
        .cast("long")
        .alias("n_funnels"),
    )
    return counted.filter(F.col("n_funnels") >= 1).orderBy("user_id")


# --------------------------------------------------------------------------
# q264 — group-sequential A/B monitoring: the cumulative two-proportion
# z statistic of purchase rate (cohort = user parity) recomputed after
# every day of data, with a crossing flag against a ±2.7 boundary (an
# O'Brien–Fleming-style conservative constant) — the "peek every day
# without lying to yourself" relation a continuous experimentation
# pipeline materialises. q175 is the one-shot end-of-test z; this is its
# sequential-monitoring sibling.
# Parity: daily and cumulative counts are integers (conditional sums +
# a cumulative window over the bounded day series); each day's z is one
# closed-form double expression over 4 integers — identical operands and
# operation order in both engines; 4dp on output.
# Scale: corpus collapses FIRST to per-(day, cohort) counts (one keyed
# aggregate with map-side partials); every window after runs over
# calendar-bounded rows (the declared bounded-window exception).
# --------------------------------------------------------------------------
@register(
    "q264_sequential_ab",
    oracle="""
WITH daily AS (
    SELECT DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS day,
           CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
           CAST(SUM(CASE WHEN user_id % 2 = 0 AND event_type = 'purchase'
                         THEN 1 ELSE 0 END) AS BIGINT) AS ca,
           CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
           CAST(SUM(CASE WHEN user_id % 2 = 1 AND event_type = 'purchase'
                         THEN 1 ELSE 0 END) AS BIGINT) AS cb
    FROM events GROUP BY DATE_TRUNC('day', CAST(ts AS TIMESTAMP))
),
cum AS (
    SELECT day,
           CAST(SUM(na) OVER w AS BIGINT) AS cna,
           CAST(SUM(ca) OVER w AS BIGINT) AS cca,
           CAST(SUM(nb) OVER w AS BIGINT) AS cnb,
           CAST(SUM(cb) OVER w AS BIGINT) AS ccb
    FROM daily
    WINDOW w AS (ORDER BY day)
),
scored AS (
    SELECT day, cna, cnb, cca, ccb,
           (CAST(cca AS DOUBLE) / cna - CAST(ccb AS DOUBLE) / cnb)
           / SQRT((CAST(cca + ccb AS DOUBLE) / (cna + cnb))
                  * (1 - CAST(cca + ccb AS DOUBLE) / (cna + cnb))
                  * (1.0 / cna + 1.0 / cnb)) AS z
    FROM cum
)
SELECT day, cna, cnb, cca, ccb,
       ROUND(z, 4) AS z_stat,
       CAST(CASE WHEN ABS(z) > 2.7 THEN 1 ELSE 0 END AS BIGINT) AS crossed
FROM scored
ORDER BY day
""",
    tags=("ab-test", "A12", "W2"),
)
def q264_sequential_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily cumulative two-proportion z monitoring of purchase rate:
    (day, cna, cnb, cca, ccb, z_stat, crossed) — crossed = |z| > 2.7."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum((F.col("user_id") % 2 == 0).cast("long")).alias("na"),
        F.sum(
            ((F.col("user_id") % 2 == 0) & (F.col("event_type") == "purchase"))
            .cast("long")
        ).alias("ca"),
        F.sum((F.col("user_id") % 2 == 1).cast("long")).alias("nb"),
        F.sum(
            ((F.col("user_id") % 2 == 1) & (F.col("event_type") == "purchase"))
            .cast("long")
        ).alias("cb"),
    )
    wd = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = daily.select(
        "day",
        F.sum("na").over(wd).alias("cna"),
        F.sum("ca").over(wd).alias("cca"),
        F.sum("nb").over(wd).alias("cnb"),
        F.sum("cb").over(wd).alias("ccb"),
    )
    p = (F.col("cca") + F.col("ccb")).cast("double") / (
        F.col("cna") + F.col("cnb")
    )
    z = (
        F.col("cca").cast("double") / F.col("cna")
        - F.col("ccb").cast("double") / F.col("cnb")
    ) / F.sqrt(p * (1 - p) * (1.0 / F.col("cna") + 1.0 / F.col("cnb")))
    return cum.select(
        "day",
        F.col("cna").cast("long").alias("cna"),
        F.col("cnb").cast("long").alias("cnb"),
        F.col("cca").cast("long").alias("cca"),
        F.col("ccb").cast("long").alias("ccb"),
        F.round(z, 4).alias("z_stat"),
        (F.abs(z) > 2.7).cast("long").alias("crossed"),
    ).orderBy("day")


# --------------------------------------------------------------------------
# q271 - Theil-Sen robust trend per event type: the median of all pairwise
# slopes of the daily-count series - the robust regression line a
# monitoring pipeline fits when spikes would wreck OLS (up to ~29%
# contamination tolerated vs 0 for q144's least squares).
# Parity: day indices are exact DATEDIFF integers; every pairwise slope
# is frozen to round(10^6 * (c_j - c_i)/(j - i)) BEFORE the median, so
# the median is over integers; even counts average two integers (exact
# .5 halves); one /10^6 + 4dp at the end.
# Scale: the corpus collapses first to per-(type, day) counts (one keyed
# aggregate); the pairwise self-join runs on the calendar-bounded daily
# series (30 rows -> <=435 pairs per type, the q247 bounded-series
# exception); the median is a per-type window over those bounded pairs.
# --------------------------------------------------------------------------
@register(
    "q271_theil_sen",
    oracle="""
WITH daily AS (
    SELECT event_type,
           DATEDIFF('day', DATE '2024-01-01',
                    CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS DATE))
               AS t,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2
),
slopes AS (
    SELECT a.event_type,
           CAST(ROUND(1000000.0 * (b.c - a.c) / (b.t - a.t)) AS BIGINT)
               AS s
    FROM daily a JOIN daily b
      ON b.event_type = a.event_type AND b.t > a.t
),
ranked AS (
    SELECT event_type, s,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY s) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM slopes
)
SELECT event_type,
       CAST(MAX(n) AS BIGINT) AS n_pairs,
       ROUND(AVG(s) / 1000000.0, 4) AS sen_slope
FROM ranked
WHERE rn IN ((n + 1) // 2, (n + 2) // 2)
GROUP BY event_type
ORDER BY event_type
""",
    tags=("robust-stats", "A12", "W2"),
)
def q271_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen slope of the daily event-count series per type:
    (event_type, n_pairs, sen_slope)."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type",
        F.datediff(
            F.date_trunc("day", "ts").cast("date"), F.lit("2024-01-01").cast("date")
        ).alias("t"),
    ).agg(F.count(F.lit(1)).alias("c"))
    a = daily.select("event_type", F.col("t").alias("ta"), F.col("c").alias("ca"))
    b = daily.select("event_type", F.col("t").alias("tb"), F.col("c").alias("cb"))
    slopes = (
        a.join(b, "event_type")
        .filter(F.col("tb") > F.col("ta"))
        .select(
            "event_type",
            F.round(
                1000000.0
                * (F.col("cb") - F.col("ca"))
                / (F.col("tb") - F.col("ta"))
            )
            .cast("long")
            .alias("s"),
        )
    )
    wr = Window.partitionBy("event_type").orderBy("s")
    wn = Window.partitionBy("event_type")
    ranked = slopes.select(
        "event_type",
        "s",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    mid = ranked.filter(
        (F.col("rn") == F.floor((F.col("n") + 1) / 2))
        | (F.col("rn") == F.floor((F.col("n") + 2) / 2))
    )
    return (
        mid.groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n_pairs"),
            F.round(F.avg("s") / 1000000.0, 4).alias("sen_slope"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# q272 - rolling-origin forecast backtest: evaluate the two standard
# zero-parameter baselines (seasonal-naive "same day last week" and
# naive-1 "yesterday") on every day of the series, per event type - the
# relation a forecasting pipeline materialises to decide whether a model
# beats the naives at all (and the denominator of every MASE).
# Parity: forecasts are equi-joins on (type, day - 7)/(type, day - 1);
# absolute errors are integer; the MAEs are single divisions and skill is
# one arithmetic expression over them, 4dp.
# Scale: corpus -> per-(type, day) counts first (one keyed aggregate with
# map-side partials); both forecast joins and the eval aggregate run on
# the calendar-bounded daily relation.
# --------------------------------------------------------------------------
@register(
    "q272_forecast_backtest",
    oracle="""
WITH daily AS (
    SELECT event_type,
           CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2
),
eval AS (
    SELECT d.event_type,
           ABS(d.c - s.c) AS e_snaive,
           ABS(d.c - n.c) AS e_naive1
    FROM daily d
    JOIN daily s ON s.event_type = d.event_type AND s.day + 7 = d.day
    JOIN daily n ON n.event_type = d.event_type AND n.day + 1 = d.day
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_eval,
       ROUND(CAST(SUM(e_snaive) AS DOUBLE) / COUNT(*), 4) AS mae_snaive,
       ROUND(CAST(SUM(e_naive1) AS DOUBLE) / COUNT(*), 4) AS mae_naive1,
       ROUND(1.0 - (CAST(SUM(e_snaive) AS DOUBLE) / COUNT(*))
                   / (CAST(SUM(e_naive1) AS DOUBLE) / COUNT(*)), 4)
           AS skill_vs_naive1
FROM eval
GROUP BY event_type
ORDER BY event_type
""",
    tags=("forecast-eval", "A12", "J14"),
)
def q272_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive vs naive-1 backtest of daily counts per type:
    (event_type, n_eval, mae_snaive, mae_naive1, skill_vs_naive1)."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    d = daily.select("event_type", "day", F.col("c").alias("c"))
    s = daily.select(
        "event_type", F.date_add("day", 7).alias("day"), F.col("c").alias("cs")
    )
    n = daily.select(
        "event_type", F.date_add("day", 1).alias("day"), F.col("c").alias("cn")
    )
    ev = (
        d.join(s, ["event_type", "day"])
        .join(n, ["event_type", "day"])
        .select(
            "event_type",
            F.abs(F.col("c") - F.col("cs")).alias("e_snaive"),
            F.abs(F.col("c") - F.col("cn")).alias("e_naive1"),
        )
    )
    mae_s = F.sum("e_snaive").cast("double") / F.count(F.lit(1))
    mae_n = F.sum("e_naive1").cast("double") / F.count(F.lit(1))
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_eval"),
            F.round(mae_s, 4).alias("mae_snaive"),
            F.round(mae_n, 4).alias("mae_naive1"),
            F.round(1.0 - mae_s / mae_n, 4).alias("skill_vs_naive1"),
        )
        .select(
            "event_type",
            F.col("n_eval").cast("long").alias("n_eval"),
            "mae_snaive",
            "mae_naive1",
            "skill_vs_naive1",
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# q273 - randomized-response local-DP frequency estimation: simulate the
# classic k-ary randomized-response mechanism (report the true category
# with p = 3/4, otherwise a uniform category) over the event stream, then
# invert the mechanism to recover unbiased frequency estimates - the
# local-differential-privacy counting pattern (Warner 1965; RAPPOR's
# ancestor), with the privatised report the ONLY thing the aggregate ever
# reads. Completes the privacy family (q232 k-anonymity, q240
# l-diversity, q253 t-closeness) with the local model.
# Parity: the mechanism's randomness is the deterministic md5(event_id)
# stream (two independent hex slices: keep/flip draw and replacement
# draw), so reported counts are exact integers in both engines; the
# debiasing estimate n_hat = (c_t - n/(4*5)) * (4/3) is spelled with the
# identical literal arithmetic on both sides; 4dp.
# Scale: one narrow map (two hash slices + a 5-row broadcast join for
# the replacement category) and one per-category aggregate.
# --------------------------------------------------------------------------
@register(
    "q273_randomized_response",
    oracle="""
WITH cats AS (
    SELECT event_type AS cat,
           ROW_NUMBER() OVER (ORDER BY event_type) - 1 AS idx,
           CAST(COUNT(*) AS BIGINT) AS n_true
    FROM events GROUP BY event_type
),
k AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM cats),
draws AS (
    SELECT e.event_type,
           ('0x' || SUBSTR(MD5(CAST(e.event_id AS VARCHAR)), 1, 8))::UBIGINT
               % 100 AS keep_draw,
           CAST(('0x' || SUBSTR(MD5(CAST(e.event_id AS VARCHAR)), 9, 8))::UBIGINT
               % (SELECT k FROM k) AS BIGINT) AS repl_idx
    FROM events e
),
reported AS (
    SELECT CASE WHEN d.keep_draw < 75 THEN d.event_type ELSE c.cat END
               AS report
    FROM draws d JOIN cats c ON c.idx = d.repl_idx
),
rc AS (
    SELECT report, CAST(COUNT(*) AS BIGINT) AS n_reported
    FROM reported GROUP BY report
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events)
SELECT c.cat AS event_type,
       c.n_true,
       COALESCE(rc.n_reported, 0) AS n_reported,
       ROUND((COALESCE(rc.n_reported, 0)
              - CAST(n.n AS DOUBLE) * (1.0 - 0.75) / (SELECT k FROM k))
             / 0.75, 4) AS n_hat,
       ROUND(ABS((COALESCE(rc.n_reported, 0)
                  - CAST(n.n AS DOUBLE) * (1.0 - 0.75) / (SELECT k FROM k))
                 / 0.75 - c.n_true) / c.n_true, 4) AS rel_err
FROM cats c
LEFT JOIN rc ON rc.report = c.cat
CROSS JOIN n
ORDER BY event_type
""",
    tags=("privacy", "A5", "F21"),
)
def q273_randomized_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-ary randomized response + unbiased debiasing per event type:
    (event_type, n_true, n_reported, n_hat, rel_err)."""
    events = load_table(spark, sf_dir, "events")
    cats = (
        events.groupBy(F.col("event_type").alias("cat"))
        .agg(F.count(F.lit(1)).alias("n_true"))
        .withColumn(
            "idx", F.row_number().over(Window.orderBy("cat")) - 1
        )
    )
    k = cats.count()
    n_total = events.count()
    md5 = F.md5(F.col("event_id").cast("string"))
    draws = events.select(
        "event_type",
        (F.conv(F.substring(md5, 1, 8), 16, 10).cast("long") % 100).alias(
            "keep_draw"
        ),
        (F.conv(F.substring(md5, 9, 8), 16, 10).cast("long") % k).alias(
            "repl_idx"
        ),
    )
    reported = draws.join(
        F.broadcast(cats.select("idx", F.col("cat").alias("repl_cat"))),
        F.col("repl_idx") == F.col("idx"),
    ).select(
        F.when(F.col("keep_draw") < 75, F.col("event_type"))
        .otherwise(F.col("repl_cat"))
        .alias("report")
    )
    rc = reported.groupBy("report").agg(F.count(F.lit(1)).alias("n_reported"))
    est = (
        F.coalesce(F.col("n_reported"), F.lit(0)).cast("double")
        - F.lit(float(n_total)) * (1.0 - 0.75) / k
    ) / 0.75
    return (
        cats.join(rc, cats["cat"] == rc["report"], "left")
        .select(
            F.col("cat").alias("event_type"),
            F.col("n_true").cast("long").alias("n_true"),
            F.coalesce("n_reported", F.lit(0)).cast("long").alias(
                "n_reported"
            ),
            F.round(est, 4).alias("n_hat"),
            F.round(F.abs(est - F.col("n_true")) / F.col("n_true"), 4).alias(
                "rel_err"
            ),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# q278 - Benjamini-Hochberg FDR control over a 35-test family: for every
# (event_type, ISO weekday) cell, a binomial z-test of whether that type
# concentrates on that weekday beyond the calendar share of such
# weekdays, then the BH step-up procedure at alpha = 0.10 across all 35
# p-values - multiple-testing discipline for metric sweeps, where
# uncorrected per-cell tests would flag ~3.5 false positives by chance.
# Parity: counts and calendar day-shares are exact integers; z is one
# closed-form double expression; the normal CDF is the Abramowitz-Stegun
# 7.1.26 polynomial with identical literal coefficients on both sides
# (exp()'s sub-ulp engine variance is ~1e-16 relative, far below the 4dp
# round); the BH threshold comparison and rejection flags are computed
# over the bounded 35-row relation.
# Scale: corpus -> per-(type, weekday) counts in one keyed aggregate;
# everything after runs on 35 rows (the bounded-window exception).
# --------------------------------------------------------------------------
_BH_ALPHA = 0.10



@register(
    "q278_bh_fdr",
    oracle=f"""
WITH ev AS (
    SELECT event_type,
           CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day
    FROM events
),
days AS (
    SELECT DISTINCT day FROM ev
),
wd_share AS (
    SELECT ISODOW(day) AS wd, CAST(COUNT(*) AS BIGINT) AS n_days,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM days) AS total_days
    FROM days GROUP BY ISODOW(day)
),
cells AS (
    SELECT event_type, ISODOW(day) AS wd, CAST(COUNT(*) AS BIGINT) AS k
    FROM ev GROUP BY event_type, ISODOW(day)
),
totals AS (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM ev GROUP BY event_type
),
zed AS (
    SELECT c.event_type, c.wd, c.k, t.n,
           (c.k - t.n * (CAST(w.n_days AS DOUBLE) / w.total_days))
           / SQRT(t.n * (CAST(w.n_days AS DOUBLE) / w.total_days)
                  * (1.0 - CAST(w.n_days AS DOUBLE) / w.total_days)) AS z
    FROM cells c
    JOIN totals t ON t.event_type = c.event_type
    JOIN wd_share w ON w.wd = c.wd
),
pv AS (
    SELECT event_type, wd, k, n, z,
           1.0 / (1.0 + 0.2316419 * ABS(z)) AS t_as,
           ABS(z) AS az
    FROM zed
),
pvals AS (
    SELECT event_type, wd, k, n, z,
           2.0 * (0.3989422804014327 * EXP(-(az * az) / 2.0)
                  * (0.319381530 * t_as
                     - 0.356563782 * t_as * t_as
                     + 1.781477937 * t_as * t_as * t_as
                     - 1.821255978 * t_as * t_as * t_as * t_as
                     + 1.330274429 * t_as * t_as * t_as * t_as * t_as)) AS p
    FROM pv
),
ranked AS (
    SELECT event_type, wd, k, n, z, p,
           ROW_NUMBER() OVER (ORDER BY p, event_type, wd) AS rk,
           COUNT(*) OVER () AS m
    FROM pvals
),
kmax AS (
    SELECT COALESCE(MAX(CASE WHEN p <= rk * {_BH_ALPHA} / m THEN rk END), 0)
               AS kmax
    FROM ranked
)
SELECT event_type, CAST(wd AS BIGINT) AS weekday, k AS n_cell, n AS n_type,
       ROUND(z, 4) AS z_stat, ROUND(p, 4) AS p_value,
       CAST(CASE WHEN rk <= km.kmax THEN 1 ELSE 0 END AS BIGINT) AS rejected
FROM ranked CROSS JOIN kmax km
ORDER BY event_type, weekday
""",
    tags=("ab-test", "A12", "W2"),
)
def q278_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(type, weekday) binomial z-tests with Benjamini-Hochberg FDR
    control at alpha=0.10: (event_type, weekday, n_cell, n_type, z_stat,
    p_value, rejected)."""
    events = load_table(spark, sf_dir, "events")
    ev = events.select(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    )
    days = ev.select("day").distinct()
    wd_share = (
        days.groupBy((F.weekday("day") + 1).alias("wd"))
        .agg(F.count(F.lit(1)).alias("n_days"))
        .crossJoin(F.broadcast(days.agg(F.count(F.lit(1)).alias("total_days"))))
    )
    cells = ev.groupBy(
        "event_type", (F.weekday("day") + 1).alias("wd")
    ).agg(F.count(F.lit(1)).alias("k"))
    totals = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    p0 = F.col("n_days").cast("double") / F.col("total_days")
    zed = (
        cells.join(F.broadcast(totals), "event_type")
        .join(F.broadcast(wd_share), "wd")
        .select(
            "event_type",
            "wd",
            "k",
            "n",
            (
                (F.col("k") - F.col("n") * p0)
                / F.sqrt(F.col("n") * p0 * (1.0 - p0))
            ).alias("z"),
        )
    )
    az = F.abs(F.col("z"))
    t_as = 1.0 / (1.0 + 0.2316419 * az)
    phi_tail = (
        0.3989422804014327
        * F.exp(-(az * az) / 2.0)
        * (
            0.319381530 * t_as
            - 0.356563782 * t_as * t_as
            + 1.781477937 * t_as * t_as * t_as
            - 1.821255978 * t_as * t_as * t_as * t_as
            + 1.330274429 * t_as * t_as * t_as * t_as * t_as
        )
    )
    pvals = zed.withColumn("p", 2.0 * phi_tail)
    w_rk = Window.orderBy("p", "event_type", "wd")
    w_all = Window.partitionBy()
    ranked = pvals.select(
        "event_type",
        "wd",
        "k",
        "n",
        "z",
        "p",
        F.row_number().over(w_rk).alias("rk"),
        F.count(F.lit(1)).over(w_all).alias("m"),
    )
    kmax = ranked.agg(
        F.coalesce(
            F.max(
                F.when(
                    F.col("p") <= F.col("rk") * _BH_ALPHA / F.col("m"),
                    F.col("rk"),
                )
            ),
            F.lit(0),
        ).alias("kmax")
    )
    return (
        ranked.crossJoin(F.broadcast(kmax))
        .select(
            "event_type",
            F.col("wd").cast("long").alias("weekday"),
            F.col("k").cast("long").alias("n_cell"),
            F.col("n").cast("long").alias("n_type"),
            F.round("z", 4).alias("z_stat"),
            F.round("p", 4).alias("p_value"),
            (F.col("rk") <= F.col("kmax")).cast("long").alias("rejected"),
        )
        .orderBy("event_type", "weekday")
    )


# --------------------------------------------------------------------------
# q279 - next-event prediction accuracy of the Markov baseline: train the
# global argmax-next-state predictor from the q154 transition matrix and
# evaluate it in-corpus - per state, how often does the most common
# successor actually follow? The sanity floor any sequence model must
# beat before it earns its training cost.
# Parity: transitions come from the (ts, event_id)-ordered per-user walk
# (the sessionization contract); counts/argmax/hit sums are exact
# integers; hit_rate is one division, 4dp.
# Scale: one per-user window for successor pairs, one keyed aggregate to
# the bounded |states|^2 matrix, argmax over it, and one broadcast join
# back for scoring.
# --------------------------------------------------------------------------
@register(
    "q279_next_event_accuracy",
    oracle="""
WITH walk AS (
    SELECT user_id, event_type,
           LEAD(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS nxt
    FROM events
),
trans AS (
    SELECT event_type AS s, nxt AS t, CAST(COUNT(*) AS BIGINT) AS c
    FROM walk WHERE nxt IS NOT NULL
    GROUP BY event_type, nxt
),
top AS (
    SELECT s, t AS top_next
    FROM (SELECT s, t, ROW_NUMBER() OVER (PARTITION BY s
                                          ORDER BY c DESC, t ASC) AS rk
          FROM trans)
    WHERE rk = 1
)
SELECT tr.s AS state,
       CAST(SUM(tr.c) AS BIGINT) AS n_trans,
       MAX(tp.top_next) AS top_next,
       ROUND(CAST(SUM(CASE WHEN tr.t = tp.top_next THEN tr.c ELSE 0 END)
                  AS DOUBLE) / SUM(tr.c), 4) AS hit_rate
FROM trans tr JOIN top tp ON tp.s = tr.s
GROUP BY tr.s
ORDER BY state
""",
    tags=("sequence", "W2", "W3"),
)
def q279_next_event_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov argmax next-event predictor and its in-corpus accuracy:
    (state, n_trans, top_next, hit_rate)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    walk = events.select(
        "event_type", F.lead("event_type").over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    trans = walk.groupBy(
        F.col("event_type").alias("s"), F.col("nxt").alias("t")
    ).agg(F.count(F.lit(1)).alias("c"))
    w_top = Window.partitionBy("s").orderBy(F.col("c").desc(), F.col("t").asc())
    top = (
        trans.withColumn("rk", F.row_number().over(w_top))
        .filter(F.col("rk") == 1)
        .select("s", F.col("t").alias("top_next"))
    )
    return (
        trans.join(F.broadcast(top), "s")
        .groupBy(F.col("s").alias("state"))
        .agg(
            F.sum("c").cast("long").alias("n_trans"),
            F.max("top_next").alias("top_next"),
            F.round(
                F.sum(
                    F.when(F.col("t") == F.col("top_next"), F.col("c")).otherwise(0)
                ).cast("double")
                / F.sum("c"),
                4,
            ).alias("hit_rate"),
        )
        .orderBy("state")
    )


# --------------------------------------------------------------------------
# q277 - Markov removal-effect attribution (Anderl et al. 2014): build
# the first-order journey chain per user (START -> events -> first
# purchase absorbs, otherwise END), estimate transition probabilities,
# and credit each non-conversion channel by how much total conversion
# probability disappears when walks through it are removed - the
# principled alternative to q184's heuristic multi-touch rules.
# Parity: transition probs are floor((n_st * 10^6) / n_s) integers; the
# chain recurrence (12 unrolled steps) moves floor(m * p / 10^6) integer
# mass per edge from B = 10^11 starting units, so conversion masses are
# exact integers; the oracle unrolls the identical integer algebra per
# scenario (the q267/q270 device); ratios are single double divisions,
# 4dp.
# Scale: corpus work is one per-user ordering window + one keyed count
# aggregate to the <=49-row matrix; the 5-scenario recurrence runs on
# that bounded relation (driver-side, bpe.train argmax pattern).
# --------------------------------------------------------------------------
_MK_CHANNELS = ("click", "error", "signup", "view")
_MK_ITERS = 12
_MK_B = 100_000_000_000


def _markov_oracle(n_iter: int = _MK_ITERS) -> str:
    scen = {"full": None}
    for c in _MK_CHANNELS:
        scen[c] = c
    ctes = []
    for name, removed in scen.items():
        not_in = "'purchase', '_END'" + (f", '{removed}'" if removed else "")
        ctes.append(
            f"v_{name}_0 AS MATERIALIZED (SELECT '_START' AS state,"
            f" CAST({_MK_B} AS BIGINT) AS m)"
        )
        for k in range(1, n_iter + 1):
            ctes.append(
                f"""g_{name}_{k} AS MATERIALIZED (
    SELECT CAST(COALESCE(SUM((v.m * p.p) // 1000000), 0) AS BIGINT) AS g
    FROM v_{name}_{k - 1} v JOIN p ON p.s = v.state AND p.t = 'purchase'
)"""
            )
            ctes.append(
                f"""v_{name}_{k} AS MATERIALIZED (
    SELECT p.t AS state, CAST(SUM((v.m * p.p) // 1000000) AS BIGINT) AS m
    FROM v_{name}_{k - 1} v JOIN p ON p.s = v.state
    WHERE p.t NOT IN ({not_in})
    GROUP BY p.t
)"""
            )
        gsum = " + ".join(
            f"(SELECT g FROM g_{name}_{k})" for k in range(1, n_iter + 1)
        )
        ctes.append(
            f"conv_{name} AS MATERIALIZED (SELECT CAST({gsum} AS BIGINT) AS conv)"
        )
    eff_terms = " + ".join(
        f"((SELECT conv FROM conv_full) - (SELECT conv FROM conv_{c}))"
        for c in _MK_CHANNELS
    )
    ctes.append(f"te AS (SELECT CAST({eff_terms} AS BIGINT) AS te)")
    selects = []
    for c in _MK_CHANNELS:
        selects.append(
            f"""SELECT '{c}' AS channel,
       ROUND(CAST((SELECT conv FROM conv_full) AS DOUBLE) / {_MK_B}, 4)
           AS p_full,
       ROUND(CAST((SELECT conv FROM conv_{c}) AS DOUBLE) / {_MK_B}, 4)
           AS p_removed,
       ROUND(CASE WHEN (SELECT conv FROM conv_full) > 0 THEN
           CAST((SELECT conv FROM conv_full) - (SELECT conv FROM conv_{c})
                AS DOUBLE) / (SELECT conv FROM conv_full) END, 4)
           AS removal_effect,
       ROUND(CASE WHEN (SELECT te FROM te) > 0 THEN
           CAST((SELECT conv FROM conv_full) - (SELECT conv FROM conv_{c})
                AS DOUBLE) / (SELECT te FROM te) END, 4) AS attribution"""
        )
    union = "\nUNION ALL\n".join(selects)
    joined_ctes = ",\n".join(ctes)
    return f"""
WITH walk AS MATERIALIZED (
    SELECT user_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
    FROM events
),
fp AS (
    SELECT user_id, MIN(rn) AS fp_rn FROM walk
    WHERE event_type = 'purchase' GROUP BY user_id
),
kept AS MATERIALIZED (
    SELECT w.user_id, w.event_type, w.rn
    FROM walk w LEFT JOIN fp ON fp.user_id = w.user_id
    WHERE fp.fp_rn IS NULL OR w.rn <= fp.fp_rn
),
mx AS (SELECT user_id, MAX(rn) AS mxr FROM kept GROUP BY user_id),
steps AS (
    SELECT a.event_type AS s, b.event_type AS t
    FROM kept a JOIN kept b ON b.user_id = a.user_id AND b.rn = a.rn + 1
    UNION ALL
    SELECT '_START' AS s, event_type AS t FROM kept WHERE rn = 1
    UNION ALL
    SELECT k.event_type AS s, '_END' AS t
    FROM kept k
    JOIN mx ON mx.user_id = k.user_id AND k.rn = mx.mxr
    LEFT JOIN fp ON fp.user_id = k.user_id
    WHERE fp.user_id IS NULL
),
cnt AS (SELECT s, t, CAST(COUNT(*) AS BIGINT) AS c FROM steps GROUP BY s, t),
outd AS (SELECT s, CAST(SUM(c) AS BIGINT) AS n FROM cnt GROUP BY s),
p AS MATERIALIZED (
    SELECT c.s, c.t, CAST((c.c * 1000000) // o.n AS BIGINT) AS p
    FROM cnt c JOIN outd o ON o.s = c.s
),
{joined_ctes}
SELECT * FROM ({union})
ORDER BY channel
"""


@register(
    "q277_markov_attribution",
    oracle=_markov_oracle(),
    tags=("attribution", "W2", "J10"),
)
def q277_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Removal-effect channel attribution from the user-journey Markov
    chain: (channel, p_full, p_removed, removal_effect, attribution) -
    operators/graph.removal_effect_attribution."""
    from ..operators import graph

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    walk = events.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    )
    fp = (
        walk.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("rn").alias("fp_rn"))
    )
    kept = (
        walk.join(fp, "user_id", "left")
        .filter(F.col("fp_rn").isNull() | (F.col("rn") <= F.col("fp_rn")))
        .select("user_id", "event_type", "rn")
    )
    mx = kept.groupBy("user_id").agg(F.max("rn").alias("mxr"))
    a = kept.select("user_id", F.col("event_type").alias("s"), "rn")
    b = kept.select(
        "user_id", F.col("event_type").alias("t"), (F.col("rn") - 1).alias("rn")
    )
    internal = a.join(b, ["user_id", "rn"]).select("s", "t")
    starts = kept.filter(F.col("rn") == 1).select(
        F.lit("_START").alias("s"), F.col("event_type").alias("t")
    )
    ends = (
        kept.join(mx, "user_id")
        .filter(F.col("rn") == F.col("mxr"))
        .join(fp, "user_id", "left_anti")
        .select(F.col("event_type").alias("s"), F.lit("_END").alias("t"))
    )
    steps = internal.unionByName(starts).unionByName(ends)
    cnt = steps.groupBy("s", "t").agg(F.count(F.lit(1)).alias("c"))
    outd = cnt.groupBy("s").agg(F.sum("c").alias("n"))
    probs = cnt.join(outd, "s").select(
        "s", "t", F.expr("(c * 1000000) div n").cast("long").alias("p")
    )
    return graph.removal_effect_attribution(
        probs, channels=_MK_CHANNELS, n_iter=_MK_ITERS, B=_MK_B
    ).orderBy("channel")


# --------------------------------------------------------------------------
# q283 - exact ROC-AUC from score-domain count algebra: AUC of the event
# `value` as a purchase-vs-rest classifier, computed WITHOUT a global
# row sort: collapse to per-distinct-score (pos, neg) counts, one cum
# window over the score domain, then the tie-corrected Mann-Whitney U.
# 2U = sum_i(2 * p_i * negs_below_i + p_i * n_i) keeps everything
# integer (ties contribute exact halves), so AUC = 2U / (2 * P * N) is
# one division - no rank averaging, no float accumulation.
# Parity: scores frozen to round(10^4 * value); all counts/U integer.
# Scale: the corpus collapses to the score-domain relation first (one
# keyed aggregate); the cum window runs over distinct scores, not rows
# (range-partitioned two-pass at 100 TB, the ids.py pattern - declared
# bounded-domain exception at test scale).
# --------------------------------------------------------------------------
@register(
    "q283_roc_auc",
    oracle="""
WITH scored AS (
    SELECT CAST(ROUND(10000.0 * value) AS BIGINT) AS v,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
    FROM events
),
g AS (
    SELECT v,
           CAST(SUM(pos) AS BIGINT) AS p,
           CAST(SUM(1 - pos) AS BIGINT) AS n
    FROM scored GROUP BY v
),
cum AS (
    SELECT v, p, n,
           CAST(COALESCE(SUM(n) OVER (ORDER BY v
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING), 0) AS BIGINT)
               AS neg_below
    FROM g
),
u AS (
    SELECT CAST(SUM(2 * p * neg_below + p * n) AS BIGINT) AS two_u,
           CAST(SUM(p) AS BIGINT) AS n_pos,
           CAST(SUM(n) AS BIGINT) AS n_neg,
           CAST(COUNT(*) AS BIGINT) AS n_scores
    FROM cum
)
SELECT n_pos, n_neg, n_scores,
       ROUND(CAST(two_u AS DOUBLE) / (2.0 * n_pos * n_neg), 4) AS auc
FROM u
""",
    tags=("ml-eval", "A12", "W4"),
)
def q283_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tie-corrected ROC-AUC of `value` predicting purchase:
    (n_pos, n_neg, n_scores, auc)."""
    events = load_table(spark, sf_dir, "events")
    scored = events.select(
        F.round(10000.0 * F.col("value")).cast("long").alias("v"),
        (F.col("event_type") == "purchase").cast("long").alias("pos"),
    )
    g = scored.groupBy("v").agg(
        F.sum("pos").alias("p"), F.sum(1 - F.col("pos")).alias("n")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cum = g.select(
        "p", "n", F.coalesce(F.sum("n").over(w), F.lit(0)).alias("neg_below")
    )
    u = cum.agg(
        F.sum(2 * F.col("p") * F.col("neg_below") + F.col("p") * F.col("n"))
        .alias("two_u"),
        F.sum("p").alias("n_pos"),
        F.sum("n").alias("n_neg"),
        F.count(F.lit(1)).alias("n_scores"),
    )
    return u.select(
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
        F.col("n_scores").cast("long").alias("n_scores"),
        F.round(
            F.col("two_u").cast("double") / (2.0 * F.col("n_pos") * F.col("n_neg")),
            4,
        ).alias("auc"),
    )


# --------------------------------------------------------------------------
# q284 - difference-in-differences: the 2x2 (treated x pre/post) design
# over event values with the mid-month cutover - treated cohort = odd
# user ids, outcome = mean event value. DID = (T_post - T_pre) -
# (C_post - C_pre), with the classical unpooled SE and t statistic. The
# before/after-with-control estimator that survives level differences
# between cohorts (complements q229 CUPED and q242 IPW).
# Parity: values frozen to round(10^4 * value); the 12 sufficient
# statistics (n, sum, sum-of-squares per cell) are exact integers from
# ONE conditional-aggregation pass; means/vars/did/se/t are a fixed
# double expression tree over them, 4dp. Values freeze at 10^2 units
# (the data's native 2 decimals), keeping sum(x^2) < 2^63 even at
# 10^9+ rows.
# Scale: a single full-table aggregate with map-side partials; zero
# joins, zero windows, 1 output row.
# --------------------------------------------------------------------------
_DID_CUT = "2024-01-16"


def _did_cells() -> list[tuple[str, str]]:
    return [("t", "post"), ("t", "pre"), ("c", "post"), ("c", "pre")]


def _did_oracle() -> str:
    aggs = []
    for co, pe in _did_cells():
        cond = (
            f"user_id % 2 = {1 if co == 't' else 0} AND "
            + (
                f"CAST(ts AS TIMESTAMP) >= TIMESTAMP '{_DID_CUT} 00:00:00'"
                if pe == "post"
                else f"CAST(ts AS TIMESTAMP) < TIMESTAMP '{_DID_CUT} 00:00:00'"
            )
        )
        aggs.append(
            f"CAST(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS n_{co}_{pe},"
        )
        aggs.append(
            f"CAST(SUM(CASE WHEN {cond} THEN x ELSE 0 END) AS BIGINT)"
            f" AS s1_{co}_{pe},"
        )
        aggs.append(
            f"CAST(SUM(CASE WHEN {cond} THEN x * x ELSE 0 END) AS BIGINT)"
            f" AS s2_{co}_{pe},"
        )
    agg_sql = "\n           ".join(aggs).rstrip(",")
    mean = {
        f"{co}_{pe}": f"(CAST(s1_{co}_{pe} AS DOUBLE) / n_{co}_{pe})"
        for co, pe in _did_cells()
    }
    var = {
        f"{co}_{pe}": (
            f"((s2_{co}_{pe} - CAST(s1_{co}_{pe} AS DOUBLE)"
            f" * s1_{co}_{pe} / n_{co}_{pe}) / (n_{co}_{pe} - 1))"
        )
        for co, pe in _did_cells()
    }
    did = (
        f"(({mean['t_post']} - {mean['t_pre']})"
        f" - ({mean['c_post']} - {mean['c_pre']}))"
    )
    se = (
        "SQRT("
        + " + ".join(f"{var[k]} / n_{k}" for k in mean)
        + ")"
    )
    return f"""
WITH s AS (
    SELECT user_id, ts, CAST(ROUND(100.0 * value) AS BIGINT) AS x
    FROM events
),
cells AS (
    SELECT {agg_sql}
    FROM s
)
SELECT n_t_pre, n_t_post, n_c_pre, n_c_post,
       ROUND({did} / 100.0, 4) AS did,
       ROUND({se} / 100.0, 4) AS se,
       ROUND({did} / {se}, 4) AS t_stat
FROM cells
"""


@register(
    "q284_diff_in_diff",
    oracle=_did_oracle(),
    tags=("causal", "A12"),
)
def q284_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2x2 difference-in-differences on event values:
    (n_t_pre, n_t_post, n_c_pre, n_c_post, did, se, t_stat)."""
    events = load_table(spark, sf_dir, "events")
    s = events.select(
        "user_id",
        "ts",
        F.round(100.0 * F.col("value")).cast("long").alias("x"),
    )
    cut = F.lit(f"{_DID_CUT} 00:00:00").cast("timestamp")
    conds = {}
    for co, pe in _did_cells():
        c = F.col("user_id") % 2 == (1 if co == "t" else 0)
        c = c & (
            (F.col("ts") >= cut) if pe == "post" else (F.col("ts") < cut)
        )
        conds[f"{co}_{pe}"] = c
    aggs = []
    for k, c in conds.items():
        aggs.append(F.sum(F.when(c, 1).otherwise(0)).alias(f"n_{k}"))
        aggs.append(
            F.sum(F.when(c, F.col("x")).otherwise(0)).alias(f"s1_{k}")
        )
        aggs.append(
            F.sum(F.when(c, F.col("x") * F.col("x")).otherwise(0)).alias(
                f"s2_{k}"
            )
        )
    cells = s.agg(*aggs)

    def mean(k):
        return F.col(f"s1_{k}").cast("double") / F.col(f"n_{k}")

    def var(k):
        return (
            F.col(f"s2_{k}")
            - F.col(f"s1_{k}").cast("double")
            * F.col(f"s1_{k}")
            / F.col(f"n_{k}")
        ) / (F.col(f"n_{k}") - 1)

    did = (mean("t_post") - mean("t_pre")) - (mean("c_post") - mean("c_pre"))
    se = F.sqrt(
        sum(var(k) / F.col(f"n_{k}") for k in ("t_post", "t_pre", "c_post", "c_pre"))
    )
    return cells.select(
        F.col("n_t_pre").cast("long").alias("n_t_pre"),
        F.col("n_t_post").cast("long").alias("n_t_post"),
        F.col("n_c_pre").cast("long").alias("n_c_pre"),
        F.col("n_c_post").cast("long").alias("n_c_post"),
        F.round(did / 100.0, 4).alias("did"),
        F.round(se / 100.0, 4).alias("se"),
        F.round(did / se, 4).alias("t_stat"),
    )


# --------------------------------------------------------------------------
# q285 - recommender coverage / novelty audit of the q255 neighbour
# lists: what share of the catalogue ever gets recommended (coverage),
# how popular the recommended items are (mean self-information,
# -ln(popularity share), in nats - low = rich-get-richer lists), plus
# list-size and co-occurrence diagnostics. The offline health check that
# catches popularity collapse before an A/B does.
# Parity: the rec lists are q255's exact relation (its oracle text is
# embedded as a MATERIALIZED CTE); popularity shares and their frozen
# round(10^6 * -ln(share)) self-information are per-item integers; the
# final means divide integer sums, 4dp.
# Scale: q255's budget plus one broadcast join of the rec list to the
# per-item popularity relation and two tiny aggregates.
# --------------------------------------------------------------------------
def _q285_oracle() -> str:
    from .registry import REGISTRY as _R

    q255 = _R["q255_item_item_cf"].oracle
    return f"""
WITH recs AS MATERIALIZED ({q255}),
catalog AS (
    SELECT l_partkey AS pk, CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS s
    FROM lineitem GROUP BY l_partkey
),
n_orders AS (
    SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n FROM lineitem
),
info AS (
    SELECT c.pk,
           CAST(ROUND(1000000.0 * -LN(CAST(c.s AS DOUBLE)
                                      / (SELECT n FROM n_orders)))
                AS BIGINT) AS si
    FROM catalog c
),
per_rec AS (
    SELECT r.item, r.neighbor, r.cooc, i.si
    FROM recs r JOIN info i ON i.pk = r.neighbor
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM catalog) AS n_catalog,
       CAST(COUNT(DISTINCT neighbor) AS BIGINT) AS n_recommended,
       ROUND(CAST(COUNT(DISTINCT neighbor) AS DOUBLE)
             / (SELECT COUNT(*) FROM catalog), 4) AS coverage,
       CAST(COUNT(*) AS BIGINT) AS n_list_rows,
       ROUND(AVG(CAST(cooc AS DOUBLE)), 4) AS mean_cooc,
       ROUND(CAST(SUM(si) AS DOUBLE) / COUNT(*) / 1000000.0, 4)
           AS mean_novelty_nats
FROM per_rec
"""


@register(
    "q285_rec_coverage_novelty",
    oracle=_q285_oracle(),
    tags=("recsys", "A12", "A10"),
)
def q285_rec_coverage_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coverage/novelty audit of q255's item-item lists: (n_catalog,
    n_recommended, coverage, n_list_rows, mean_cooc, mean_novelty_nats)."""
    recs = q255_item_item_cf(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    catalog = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.countDistinct("l_orderkey").alias("s")
    )
    n_orders = li.agg(F.countDistinct("l_orderkey").alias("n"))
    info = catalog.crossJoin(F.broadcast(n_orders)).select(
        "pk",
        F.round(
            1000000.0
            * -F.log(F.col("s").cast("double") / F.col("n"))
        )
        .cast("long")
        .alias("si"),
    )
    per_rec = recs.join(
        info.withColumnRenamed("pk", "neighbor"), "neighbor"
    )
    n_cat = catalog.agg(F.count(F.lit(1)).alias("n_catalog"))
    return (
        per_rec.agg(
            F.countDistinct("neighbor").alias("n_recommended"),
            F.count(F.lit(1)).alias("n_list_rows"),
            F.round(F.avg(F.col("cooc").cast("double")), 4).alias("mean_cooc"),
            F.sum("si").alias("si_sum"),
        )
        .crossJoin(F.broadcast(n_cat))
        .select(
            F.col("n_catalog").cast("long").alias("n_catalog"),
            F.col("n_recommended").cast("long").alias("n_recommended"),
            F.round(
                F.col("n_recommended").cast("double") / F.col("n_catalog"), 4
            ).alias("coverage"),
            F.col("n_list_rows").cast("long").alias("n_list_rows"),
            "mean_cooc",
            F.round(
                F.col("si_sum").cast("double") / F.col("n_list_rows") / 1000000.0,
                4,
            ).alias("mean_novelty_nats"),
        )
    )


# --------------------------------------------------------------------------
# q288 - linear-interpolation gap fill: simulate sensor dropout (every
# 3rd calendar day per type is missing) over the daily mean-value series
# and reconstruct interior gaps by linear interpolation between the
# surrounding present days - the numeric upgrade of q166's LOCF
# (which repeats the last value; interpolation follows the trend).
# Parity: daily means are frozen floor(sum(100x)/n) integers; the
# interpolation v_prev + (v_next - v_prev) * (d - d_prev) / (d_next -
# d_prev) is ONE double expression over 5 integers; 4dp.
# Scale: corpus -> per-(type, day) aggregate first; gap detection and
# both neighbour lookups are windows over the calendar-bounded daily
# series (the q166 contract). Boundary gaps (no neighbour on one side)
# are dropped, not extrapolated.
# --------------------------------------------------------------------------
@register(
    "q288_linear_interp",
    oracle="""
WITH daily AS (
    SELECT event_type,
           DATEDIFF('day', DATE '2024-01-01',
                    CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS DATE))
               AS d,
           CAST(SUM(CAST(ROUND(100.0 * value) AS BIGINT)) // COUNT(*)
                AS BIGINT) AS x
    FROM events GROUP BY 1, 2
),
present AS (SELECT * FROM daily WHERE d % 3 <> 0),
missing AS (SELECT event_type, d FROM daily WHERE d % 3 = 0),
prevn AS (
    SELECT m.event_type, m.d,
           MAX(p.d) AS pd
    FROM missing m JOIN present p
      ON p.event_type = m.event_type AND p.d < m.d
    GROUP BY m.event_type, m.d
),
nextn AS (
    SELECT m.event_type, m.d,
           MIN(p.d) AS nd
    FROM missing m JOIN present p
      ON p.event_type = m.event_type AND p.d > m.d
    GROUP BY m.event_type, m.d
)
SELECT m.event_type, m.d AS day_idx,
       ROUND((pv.x + (nv.x - pv.x) * CAST(m.d - pn.pd AS DOUBLE)
              / (nn.nd - pn.pd)) / 100.0, 4) AS value_interp,
       CAST(nn.nd - pn.pd AS BIGINT) AS gap_span
FROM missing m
JOIN prevn pn ON pn.event_type = m.event_type AND pn.d = m.d
JOIN nextn nn ON nn.event_type = m.event_type AND nn.d = m.d
JOIN present pv ON pv.event_type = m.event_type AND pv.d = pn.pd
JOIN present nv ON nv.event_type = m.event_type AND nv.d = nn.nd
ORDER BY m.event_type, day_idx
""",
    tags=("timeseries", "J14", "F19"),
)
def q288_linear_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of simulated every-3rd-day gaps in the daily
    mean-value series: (event_type, day_idx, value_interp, gap_span)."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type",
        F.datediff(
            F.date_trunc("day", "ts").cast("date"),
            F.lit("2024-01-01").cast("date"),
        ).alias("d"),
    ).agg(
        F.sum(F.round(100.0 * F.col("value")).cast("long")).alias("_s"),
        F.count(F.lit(1)).alias("_c"),
    ).select(
        "event_type", "d",
        # exact integer floor division (sums are non-negative): a double
        # divide would round the numerator past 2^53 and break the
        # integer-parity contract at extreme scale
        F.expr("_s div _c").cast("long").alias("x"),
    )
    present = daily.filter(F.col("d") % 3 != 0)
    missing = daily.filter(F.col("d") % 3 == 0).select("event_type", "d")
    p = present.select("event_type", F.col("d").alias("pd"), F.col("x").alias("px"))
    n = present.select("event_type", F.col("d").alias("nd"), F.col("x").alias("nx"))
    prevn = (
        missing.join(p, "event_type")
        .filter(F.col("pd") < F.col("d"))
        .groupBy("event_type", "d")
        .agg(F.max("pd").alias("pd"))
        .join(p, ["event_type", "pd"])
    )
    nextn = (
        missing.join(n, "event_type")
        .filter(F.col("nd") > F.col("d"))
        .groupBy("event_type", "d")
        .agg(F.min("nd").alias("nd"))
        .join(n, ["event_type", "nd"])
    )
    joined = prevn.join(nextn, ["event_type", "d"])
    interp = (
        F.col("px")
        + (F.col("nx") - F.col("px"))
        * (F.col("d") - F.col("pd")).cast("double")
        / (F.col("nd") - F.col("pd"))
    ) / 100.0
    return joined.select(
        "event_type",
        F.col("d").cast("long").alias("day_idx"),
        F.round(interp, 4).alias("value_interp"),
        (F.col("nd") - F.col("pd")).cast("long").alias("gap_span"),
    ).orderBy("event_type", "day_idx")


# --------------------------------------------------------------------------
# q289 - cumulative gain / lift decile table for the q283 classifier
# (event value predicting purchase): rank the population by score,
# decile it WITHOUT a row-level ntile (ties share a decile: decile =
# floor(10 * rows_above / N) at score granularity - deterministic where
# ntile's tie-splitting is not), and report per-decile capture and lift.
# The targeting curve every uplift/propensity model ships with.
# Parity: deciles, counts and cumulative positives are exact integers on
# the score-domain relation; capture/lift are single divisions, 4dp.
# Scale: same collapse-first shape as q283 - one keyed aggregate to
# score-domain counts, one cum window over distinct scores, one 10-row
# aggregate. No row sort, no ntile.
# --------------------------------------------------------------------------
@register(
    "q289_gain_chart",
    oracle="""
WITH scored AS (
    SELECT CAST(ROUND(10000.0 * value) AS BIGINT) AS v,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
    FROM events
),
g AS (
    SELECT v, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(pos) AS BIGINT) AS p
    FROM scored GROUP BY v
),
tot AS (
    SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(p) AS BIGINT) AS pp FROM g
),
cum AS (
    SELECT v, n, p,
           CAST(COALESCE(SUM(n) OVER (ORDER BY v DESC
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING), 0) AS BIGINT)
               AS rows_above
    FROM g
),
dec AS (
    SELECT CAST(LEAST(10 * c.rows_above // t.nn, 9) AS BIGINT) AS decile,
           c.n, c.p
    FROM cum c CROSS JOIN tot t
),
agg AS (
    SELECT decile, CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST(SUM(p) AS BIGINT) AS n_pos
    FROM dec GROUP BY decile
),
run AS (
    SELECT decile, n_rows, n_pos,
           CAST(SUM(n_pos) OVER (ORDER BY decile
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum_pos
    FROM agg
)
SELECT r.decile, r.n_rows, r.n_pos,
       ROUND(CAST(r.cum_pos AS DOUBLE) / t.pp, 4) AS capture,
       ROUND((CAST(r.n_pos AS DOUBLE) / r.n_rows)
             / (CAST(t.pp AS DOUBLE) / t.nn), 4) AS lift
FROM run r CROSS JOIN tot t
ORDER BY r.decile
""",
    tags=("ml-eval", "A12", "W2"),
)
def q289_gain_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile gain/lift table of value-as-propensity for purchase:
    (decile, n_rows, n_pos, capture, lift)."""
    events = load_table(spark, sf_dir, "events")
    scored = events.select(
        F.round(10000.0 * F.col("value")).cast("long").alias("v"),
        (F.col("event_type") == "purchase").cast("long").alias("pos"),
    )
    g = scored.groupBy("v").agg(
        F.count(F.lit(1)).alias("n"), F.sum("pos").alias("p")
    )
    tot = g.agg(F.sum("n").alias("nn"), F.sum("p").alias("pp"))
    w = Window.orderBy(F.col("v").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = g.select(
        "n", "p", F.coalesce(F.sum("n").over(w), F.lit(0)).alias("rows_above")
    )
    dec = cum.crossJoin(F.broadcast(tot)).select(
        F.least(
            F.expr("(10 * rows_above) div nn").cast("long"),
            F.lit(9).cast("long"),
        ).alias("decile"),
        "n",
        "p",
    )
    agg = dec.groupBy("decile").agg(
        F.sum("n").alias("n_rows"), F.sum("p").alias("n_pos")
    )
    wd = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    run = agg.select(
        "decile",
        "n_rows",
        "n_pos",
        F.sum("n_pos").over(wd).alias("cum_pos"),
    )
    return (
        run.crossJoin(F.broadcast(tot))
        .select(
            F.col("decile").cast("long").alias("decile"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("n_pos").cast("long").alias("n_pos"),
            F.round(F.col("cum_pos").cast("double") / F.col("pp"), 4).alias(
                "capture"
            ),
            F.round(
                (F.col("n_pos").cast("double") / F.col("n_rows"))
                / (F.col("pp").cast("double") / F.col("nn")),
                4,
            ).alias("lift"),
        )
        .orderBy("decile")
    )


# --------------------------------------------------------------------------
# q291 - covariate balance table (standardized mean differences): before
# trusting q284's DID or q242's IPW, check whether treated (odd user
# ids) and control actually look alike on pre-treatment covariates -
# event value, hour-of-day, ISO weekday. |SMD| < 0.1 is the conventional
# "balanced" bar; this is the diagnostics relation every causal report
# leads with.
# Parity: the three covariates are frozen integers (value x100, hour,
# weekday); per-arm n / sum / sum-of-squares come from ONE conditional
# aggregation; mean/var/SMD are a fixed double expression, 4dp.
# Scale: a single full-table aggregate with map-side partials (all three
# covariates share the scan), then three bounded output rows.
# --------------------------------------------------------------------------
def _q291_covs() -> list[tuple[str, str]]:
    return [
        ("value_x100", "CAST(ROUND(100.0 * value) AS BIGINT)"),
        ("hour_of_day", "CAST(EXTRACT(HOUR FROM CAST(ts AS TIMESTAMP)) AS BIGINT)"),
        ("iso_weekday", "CAST(ISODOW(CAST(ts AS TIMESTAMP)) AS BIGINT)"),
    ]


def _q291_oracle() -> str:
    aggs = []
    for name, expr in _q291_covs():
        for arm, cond in (("t", "user_id % 2 = 1"), ("c", "user_id % 2 = 0")):
            aggs.append(
                f"CAST(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT)"
                f" AS n_{arm}_{name},"
            )
            aggs.append(
                f"CAST(SUM(CASE WHEN {cond} THEN {expr} ELSE 0 END) AS BIGINT)"
                f" AS s1_{arm}_{name},"
            )
            aggs.append(
                f"CAST(SUM(CASE WHEN {cond} THEN {expr} * {expr} ELSE 0 END)"
                f" AS BIGINT) AS s2_{arm}_{name},"
            )
    agg_sql = "\n           ".join(aggs).rstrip(",")
    rows = []
    for name, _ in _q291_covs():

        def m(arm: str) -> str:
            return f"(CAST(s1_{arm}_{name} AS DOUBLE) / n_{arm}_{name})"

        def v(arm: str) -> str:
            return (
                f"((s2_{arm}_{name} - CAST(s1_{arm}_{name} AS DOUBLE)"
                f" * s1_{arm}_{name} / n_{arm}_{name})"
                f" / (n_{arm}_{name} - 1))"
            )

        smd = f"(({m('t')} - {m('c')}) / SQRT(({v('t')} + {v('c')}) / 2.0))"
        rows.append(
            f"""SELECT '{name}' AS covariate,
       ROUND({m('t')}, 4) AS mean_treated,
       ROUND({m('c')}, 4) AS mean_control,
       ROUND({smd}, 4) AS smd,
       CAST(CASE WHEN ABS({smd}) < 0.1 THEN 1 ELSE 0 END AS BIGINT)
           AS balanced
FROM cells"""
        )
    union = "\nUNION ALL\n".join(rows)
    return f"""
WITH cells AS (
    SELECT {agg_sql}
    FROM events
)
SELECT * FROM ({union})
ORDER BY covariate
"""


@register(
    "q291_covariate_balance",
    oracle=_q291_oracle(),
    tags=("causal", "A12"),
)
def q291_covariate_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standardized-mean-difference balance table for the odd/even user
    cohorts: (covariate, mean_treated, mean_control, smd, balanced)."""
    events = load_table(spark, sf_dir, "events")
    covs = {
        "value_x100": F.round(100.0 * F.col("value")).cast("long"),
        "hour_of_day": F.hour("ts").cast("long"),
        "iso_weekday": (F.weekday("ts") + 1).cast("long"),
    }
    t_cond = F.col("user_id") % 2 == 1
    aggs = []
    for name, expr in covs.items():
        for arm, cond in (("t", t_cond), ("c", ~t_cond)):
            aggs.append(F.sum(F.when(cond, 1).otherwise(0)).alias(f"n_{arm}_{name}"))
            aggs.append(
                F.sum(F.when(cond, expr).otherwise(0)).alias(f"s1_{arm}_{name}")
            )
            aggs.append(
                F.sum(F.when(cond, expr * expr).otherwise(0)).alias(
                    f"s2_{arm}_{name}"
                )
            )
    cells = events.agg(*aggs)
    out = None
    for name in covs:

        def m(arm: str):
            return F.col(f"s1_{arm}_{name}").cast("double") / F.col(
                f"n_{arm}_{name}"
            )

        def v(arm: str):
            return (
                F.col(f"s2_{arm}_{name}")
                - F.col(f"s1_{arm}_{name}").cast("double")
                * F.col(f"s1_{arm}_{name}")
                / F.col(f"n_{arm}_{name}")
            ) / (F.col(f"n_{arm}_{name}") - 1)

        smd = (m("t") - m("c")) / F.sqrt((v("t") + v("c")) / 2.0)
        row = cells.select(
            F.lit(name).alias("covariate"),
            F.round(m("t"), 4).alias("mean_treated"),
            F.round(m("c"), 4).alias("mean_control"),
            F.round(smd, 4).alias("smd"),
            (F.abs(smd) < 0.1).cast("long").alias("balanced"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("covariate")


# --------------------------------------------------------------------------
# q292 - broadcast-strategy advisor: per dimension table, the row count
# and a deterministic size estimate (8 bytes per numeric/date column +
# OCTET_LENGTH of every string column), with the broadcast verdict at
# the conventional 10 MB threshold - q266's skew audit answered the
# OTHER planning question (how to shuffle); this one answers whether to
# shuffle at all. The relation an engine's join planner consults, made
# queryable.
# Parity: byte estimates are exact integer sums over the same column
# lists; the verdict is an integer comparison.
# Scale: one aggregate per dimension table (map-side partials); output
# is |tables| rows.
# --------------------------------------------------------------------------
_Q292_TABLES: dict[str, tuple[tuple[str, ...], tuple[str, ...]]] = {
    # table -> (string columns, fixed-width columns)
    "region": (("r_name",), ("r_regionkey",)),
    "nation": (("n_name",), ("n_nationkey", "n_regionkey")),
    "supplier": (("s_name",), ("s_suppkey", "s_nationkey", "s_acctbal")),
    "customer": (
        ("c_name", "c_mktsegment"),
        ("c_custkey", "c_nationkey", "c_acctbal"),
    ),
    "part": (
        ("p_name", "p_brand", "p_type"),
        ("p_partkey", "p_size", "p_retailprice"),
    ),
}
_Q292_THRESHOLD = 10 * 1024 * 1024


def _q292_oracle() -> str:
    parts = []
    for t, (strs, fixed) in _Q292_TABLES.items():
        str_sum = " + ".join(f"STRLEN({c})" for c in strs)
        per_row = f"{str_sum} + {8 * len(fixed)}"
        parts.append(
            f"""SELECT '{t}' AS table_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM({per_row}) AS BIGINT) AS est_bytes,
       CAST(CASE WHEN SUM({per_row}) < {_Q292_THRESHOLD} THEN 1 ELSE 0 END
            AS BIGINT) AS broadcastable
FROM {t}"""
        )
    return "\nUNION ALL\n".join(parts) + "\nORDER BY table_name"


@register(
    "q292_broadcast_advisor",
    oracle=_q292_oracle(),
    tags=("ops-audit", "A12", "J1"),
)
def q292_broadcast_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension-table broadcast verdicts at the 10 MB bar:
    (table_name, n_rows, est_bytes, broadcastable)."""
    out = None
    for t, (strs, fixed) in _Q292_TABLES.items():
        per_row = None
        for c in strs:
            term = F.octet_length(F.col(c)).cast("long")
            per_row = term if per_row is None else per_row + term
        per_row = per_row + F.lit(8 * len(fixed)).cast("long")
        row = (
            load_table(spark, sf_dir, t)
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(per_row).alias("est_bytes"),
            )
            .select(
                F.lit(t).alias("table_name"),
                F.col("n_rows").cast("long").alias("n_rows"),
                F.col("est_bytes").cast("long").alias("est_bytes"),
                (F.col("est_bytes") < _Q292_THRESHOLD).cast("long").alias(
                    "broadcastable"
                ),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("table_name")


# --------------------------------------------------------------------------
# q294 - Mann-Kendall trend test per event type: the nonparametric
# monotone-trend test (S = sum of pairwise sign comparisons of the daily
# count series, tie-corrected variance, continuity-corrected z, two-
# sided p) - the significance companion to q271's Theil-Sen slope (MK
# says WHETHER the trend is real, Sen says how steep).
# Parity: S and the x18 variance numerator are exact integers (pairwise
# signs + tie-group algebra); z is one closed-form double; p reuses the
# q278 Abramowitz-Stegun polynomial with identical literals; 4dp.
# Scale: collapse-first to per-(type, day) counts; the pairwise
# self-join and tie groups run on the calendar-bounded daily series
# (<= 435 pairs/type - the q247 bounded-series exception).
# --------------------------------------------------------------------------
@register(
    "q294_mann_kendall",
    oracle="""
WITH daily AS (
    SELECT event_type,
           DATEDIFF('day', DATE '2024-01-01',
                    CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS DATE))
               AS t,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2
),
s_stat AS (
    SELECT a.event_type,
           CAST(SUM(CASE WHEN b.c > a.c THEN 1
                         WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT) AS s,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM daily a JOIN daily b
      ON b.event_type = a.event_type AND b.t > a.t
    GROUP BY a.event_type
),
nn AS (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM daily GROUP BY event_type
),
ties AS (
    SELECT event_type,
           CAST(COALESCE(SUM(tg * (tg - 1) * (2 * tg + 5)), 0) AS BIGINT)
               AS tie_term
    FROM (SELECT event_type, c, CAST(COUNT(*) AS BIGINT) AS tg
          FROM daily GROUP BY event_type, c)
    WHERE tg > 1
    GROUP BY event_type
),
var18 AS (
    SELECT n.event_type,
           CAST(n.n * (n.n - 1) * (2 * n.n + 5)
                - COALESCE(t.tie_term, 0) AS BIGINT) AS v18,
           n.n
    FROM nn n LEFT JOIN ties t ON t.event_type = n.event_type
),
zed AS (
    SELECT s.event_type, s.s, s.n_pairs, v.n, v.v18,
           CASE WHEN s.s > 0 THEN (s.s - 1) / SQRT(v.v18 / 18.0)
                WHEN s.s < 0 THEN (s.s + 1) / SQRT(v.v18 / 18.0)
                ELSE 0.0 END AS z
    FROM s_stat s JOIN var18 v ON v.event_type = s.event_type
),
pv AS (
    SELECT event_type, s, n_pairs, z, ABS(z) AS az,
           1.0 / (1.0 + 0.2316419 * ABS(z)) AS t_as
    FROM zed
)
SELECT event_type, s AS s_stat, n_pairs,
       ROUND(z, 4) AS z_stat,
       ROUND(2.0 * (0.3989422804014327 * EXP(-(az * az) / 2.0)
                    * (0.319381530 * t_as
                       - 0.356563782 * t_as * t_as
                       + 1.781477937 * t_as * t_as * t_as
                       - 1.821255978 * t_as * t_as * t_as * t_as
                       + 1.330274429 * t_as * t_as * t_as * t_as * t_as)),
             4) AS p_value
FROM pv
ORDER BY event_type
""",
    tags=("robust-stats", "A12", "W2"),
)
def q294_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend test of the daily count series:
    (event_type, s_stat, n_pairs, z_stat, p_value)."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type",
        F.datediff(
            F.date_trunc("day", "ts").cast("date"),
            F.lit("2024-01-01").cast("date"),
        ).alias("t"),
    ).agg(F.count(F.lit(1)).alias("c"))
    a = daily.select("event_type", F.col("t").alias("ta"), F.col("c").alias("ca"))
    b = daily.select("event_type", F.col("t").alias("tb"), F.col("c").alias("cb"))
    s_stat = (
        a.join(b, "event_type")
        .filter(F.col("tb") > F.col("ta"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("cb") > F.col("ca"), 1)
                .when(F.col("cb") < F.col("ca"), -1)
                .otherwise(0)
            ).alias("s"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
    )
    nn = daily.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    ties = (
        daily.groupBy("event_type", "c")
        .agg(F.count(F.lit(1)).alias("tg"))
        .filter(F.col("tg") > 1)
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("tg") * (F.col("tg") - 1) * (2 * F.col("tg") + 5)
            ).alias("tie_term")
        )
    )
    var18 = nn.join(ties, "event_type", "left").select(
        "event_type",
        "n",
        (
            F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
            - F.coalesce("tie_term", F.lit(0))
        ).alias("v18"),
    )
    zed = s_stat.join(var18, "event_type").select(
        "event_type",
        "s",
        "n_pairs",
        F.when(F.col("s") > 0, (F.col("s") - 1) / F.sqrt(F.col("v18") / 18.0))
        .when(F.col("s") < 0, (F.col("s") + 1) / F.sqrt(F.col("v18") / 18.0))
        .otherwise(F.lit(0.0))
        .alias("z"),
    )
    az = F.abs(F.col("z"))
    t_as = 1.0 / (1.0 + 0.2316419 * az)
    p = 2.0 * (
        0.3989422804014327
        * F.exp(-(az * az) / 2.0)
        * (
            0.319381530 * t_as
            - 0.356563782 * t_as * t_as
            + 1.781477937 * t_as * t_as * t_as
            - 1.821255978 * t_as * t_as * t_as * t_as
            + 1.330274429 * t_as * t_as * t_as * t_as * t_as
        )
    )
    return zed.select(
        "event_type",
        F.col("s").cast("long").alias("s_stat"),
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.round("z", 4).alias("z_stat"),
        F.round(p, 4).alias("p_value"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# q295 - USER-level differential privacy via contribution bounding: cap
# every user at 5 events per type (first 5 by time - the clipping step
# that turns event-level sensitivity into user-level sensitivity), then
# release the capped histogram with seeded Laplace(5/eps) noise at
# eps = 0.5. q287 protects EVENTS; this protects USERS - the distinction
# that decides whether a power user can be singled out.
# Parity: the cap is a per-(user, type) row_number window with the
# deterministic (ts, event_id) order; capped counts are exact; the noise
# draw is the q287 seeded inverse-CDF on md5(event_type || ':u'); 4dp on
# the one ratio.
# Scale: one per-(user, type) window (the sessionization contract) +
# one keyed count; noise is a narrow map on |categories| rows.
# --------------------------------------------------------------------------
_Q295_CAP = 5
_Q295_B = 10  # b = cap / eps = 5 / 0.5


@register(
    "q295_userlevel_dp",
    oracle=f"""
WITH ranked AS (
    SELECT event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                              ORDER BY ts, event_id) AS rn
    FROM events
),
capped AS (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_capped
    FROM ranked WHERE rn <= {_Q295_CAP} GROUP BY event_type
),
truec AS (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_true
    FROM events GROUP BY event_type
),
draw AS (
    SELECT c.event_type, t.n_true, c.n_capped,
           (('0x' || SUBSTR(MD5(c.event_type || ':u'), 1, 8))::UBIGINT
            % 1000000 + 0.5) / 1000000.0 AS u
    FROM capped c JOIN truec t ON t.event_type = c.event_type
),
noised AS (
    SELECT event_type, n_true, n_capped,
           CAST(ROUND(CASE WHEN u < 0.5 THEN 1.0 ELSE -1.0 END
                      * {_Q295_B} * LN(1.0 - 2.0 * ABS(u - 0.5)))
                AS BIGINT) AS noise
    FROM draw
)
SELECT event_type, n_true, n_capped,
       n_capped + noise AS n_noisy,
       noise AS noise_added,
       ROUND(CAST(n_true - n_capped AS DOUBLE) / n_true, 4) AS clipped_frac
FROM noised
ORDER BY event_type
""",
    tags=("privacy", "W2", "A5"),
)
def q295_userlevel_dp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-level DP release with per-user contribution cap 5:
    (event_type, n_true, n_capped, n_noisy, noise_added, clipped_frac)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    capped = (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _Q295_CAP)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_capped"))
    )
    truec = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_true")
    )
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.col("event_type"), F.lit(":u"))), 1, 8),
            16,
            10,
        ).cast("long")
        % 1000000
        + 0.5
    ) / 1000000.0
    noise = (
        F.round(
            F.when(u < 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
            * _Q295_B
            * F.log(1.0 - 2.0 * F.abs(u - 0.5))
        )
    ).cast("long")
    return (
        capped.join(truec, "event_type")
        .select(
            "event_type",
            F.col("n_true").cast("long").alias("n_true"),
            F.col("n_capped").cast("long").alias("n_capped"),
            (F.col("n_capped") + noise).cast("long").alias("n_noisy"),
            noise.alias("noise_added"),
            F.round(
                (F.col("n_true") - F.col("n_capped")).cast("double")
                / F.col("n_true"),
                4,
            ).alias("clipped_frac"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# q296 - self-join-size estimation audit: the exact fan-out sum(n_k^2)
# of a key (what a self-join on it would produce - and exactly the
# quadratic term the LSH max_bucket cap bounds) versus the 10% hash-
# sampled estimate a planner would compute without touching every key.
# Run for the three hot keys; the relation that tells you whether
# sampling is good enough to size a dedup/blocking job.
# Parity: exact sums and sampled sums are integers (hash-deterministic
# key sample, x10 scale-up); rel_err is one division, 4dp.
# Scale: one keyed count per audited key (same budget as q266); the
# estimate aggregates the 10% key slice of the SAME relation - the
# audit shares the scan.
# --------------------------------------------------------------------------
_Q296_KEYS = (
    ("lineitem", "l_partkey"),
    ("lineitem", "l_suppkey"),
    ("orders", "o_custkey"),
)


def _q296_part(table: str, col: str) -> str:
    return f"""
SELECT '{table}.{col}' AS key_col,
       CAST(SUM(n * n) AS BIGINT) AS exact_size,
       CAST(10 * SUM(CASE WHEN ('0x' || SUBSTR(MD5(CAST(k AS VARCHAR)), 1, 8))
                               ::UBIGINT % 10 = 0
                          THEN n * n ELSE 0 END) AS BIGINT) AS est_size,
       ROUND(ABS(10.0 * SUM(CASE WHEN ('0x' || SUBSTR(MD5(CAST(k AS VARCHAR)), 1, 8))
                                      ::UBIGINT % 10 = 0
                                 THEN n * n ELSE 0 END)
                 - SUM(n * n)) / SUM(n * n), 4) AS rel_err
FROM (SELECT {col} AS k, CAST(COUNT(*) AS BIGINT) AS n
      FROM {table} GROUP BY {col})
"""


@register(
    "q296_joinsize_estimate",
    oracle="\nUNION ALL\n".join(_q296_part(t, c) for t, c in _Q296_KEYS)
    + "\nORDER BY key_col",
    tags=("ops-audit", "A5", "A12"),
)
def q296_joinsize_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact vs 10%-key-sampled self-join size per hot key:
    (key_col, exact_size, est_size, rel_err)."""
    out = None
    for table, col in _Q296_KEYS:
        counts = (
            load_table(spark, sf_dir, table)
            .groupBy(F.col(col).alias("k"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        in_sample = (
            F.conv(
                F.substring(F.md5(F.col("k").cast("string")), 1, 8), 16, 10
            ).cast("long")
            % 10
            == 0
        )
        row = counts.agg(
            F.sum(F.col("n") * F.col("n")).alias("exact_size"),
            (
                10
                * F.sum(
                    F.when(in_sample, F.col("n") * F.col("n")).otherwise(0)
                )
            ).alias("est_size"),
        ).select(
            F.lit(f"{table}.{col}").alias("key_col"),
            F.col("exact_size").cast("long").alias("exact_size"),
            F.col("est_size").cast("long").alias("est_size"),
            F.round(
                F.abs(
                    F.col("est_size").cast("double") - F.col("exact_size")
                )
                / F.col("exact_size"),
                4,
            ).alias("rel_err"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("key_col")


# --------------------------------------------------------------------------
# q297 - dynamic time warping between event-type series: DTW distance on
# the 10-bucket (3-day) mean-value series for every type pair, with the
# lock-step L1 distance as the baseline it improves on. DTW is the
# classic alignment-tolerant series similarity (shifted-but-same-shape
# series score close; L1 punishes the shift).
# Parity: bucket means are frozen floor(sum(100x)/n) integers, so every
# DP cell is an exact integer; the oracle unrolls the recurrence over
# the 19 anti-diagonals (each cell needs only the two previous
# diagonals - the wavefront schedule) as MATERIALIZED CTEs; the Spark
# side runs the identical integer DP driver-side over the BOUNDED
# collected series (the q277 kernel pattern - a relational wavefront
# paid a scheduler round trip per diagonal for constant-size data).
# Scale: the corpus collapses to |types| x 10 bucket means first (the
# only corpus-sized work); everything after touches <= |types| x 10
# rows. DP depth is fixed by series length, not data size.
# --------------------------------------------------------------------------
_DTW_N = 10
_DTW_BIG = 1 << 60


def _dtw_oracle(n: int = _DTW_N) -> str:
    ctes = [
        """d2 AS MATERIALIZED (
    SELECT pair, i, j, c AS d FROM cost WHERE i = 1 AND j = 1
)""",
        # diagonal 1 is out of grid - empty relation so k=3's dg join resolves
        "d1 AS (SELECT pair, i, j, d FROM d2 WHERE FALSE)",
    ]
    for k in range(3, 2 * n + 1):
        ctes.append(
            f"""d{k} AS MATERIALIZED (
    SELECT t.pair, t.i, t.j,
           t.c + LEAST(COALESCE(up.d, {_DTW_BIG}),
                       COALESCE(lf.d, {_DTW_BIG}),
                       COALESCE(dg.d, {_DTW_BIG})) AS d
    FROM cost t
    LEFT JOIN d{k - 1} up ON up.pair = t.pair AND up.i = t.i - 1 AND up.j = t.j
    LEFT JOIN d{k - 1} lf ON lf.pair = t.pair AND lf.i = t.i AND lf.j = t.j - 1
    LEFT JOIN d{k - 2} dg ON dg.pair = t.pair AND dg.i = t.i - 1
                          AND dg.j = t.j - 1
    WHERE t.i + t.j = {k}
)"""
        )
    joined = ",\n".join(ctes)
    return f"""
WITH daily AS (
    SELECT event_type,
           DATEDIFF('day', DATE '2024-01-01',
                    CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS DATE))
               // 3 AS b,
           CAST(SUM(CAST(ROUND(100.0 * value) AS BIGINT)) // COUNT(*)
                AS BIGINT) AS x
    FROM events
    GROUP BY 1, 2
),
series0 AS (SELECT event_type, b + 1 AS i, x FROM daily WHERE b < {n}),
complete AS (
    SELECT event_type FROM series0 GROUP BY event_type
    HAVING COUNT(*) = {n}
),
series AS (
    SELECT s.* FROM series0 s JOIN complete c USING (event_type)
),
cost AS MATERIALIZED (
    SELECT a.event_type || '|' || b.event_type AS pair,
           a.i AS i, b.i AS j, ABS(a.x - b.x) AS c
    FROM series a JOIN series b ON a.event_type < b.event_type
),
lock AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(SUM(ABS(a.x - b.x)) AS BIGINT) AS l1
    FROM series a
    JOIN series b ON b.event_type > a.event_type AND b.i = a.i
    GROUP BY a.event_type, b.event_type
),
{joined}
SELECT l.type_a, l.type_b,
       ROUND(d.d / 100.0, 4) AS dtw,
       ROUND(l.l1 / 100.0, 4) AS l1_lockstep
FROM d{2 * n} d
JOIN lock l ON l.type_a || '|' || l.type_b = d.pair
ORDER BY type_a, type_b
"""


@register(
    "q297_dtw_distance",
    oracle=_dtw_oracle(),
    tags=("timeseries", "J13", "W2"),
)
def q297_dtw_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DTW vs lock-step L1 distance between every pair of event-type
    series (10 x 3-day buckets): (type_a, type_b, dtw, l1_lockstep)."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type",
        F.expr(
            "datediff(cast(date_trunc('day', ts) as date),"
            " cast('2024-01-01' as date)) div 3"
        ).alias("b"),
    ).agg(
        F.sum(F.round(100.0 * F.col("value")).cast("long")).alias("_s"),
        F.count(F.lit(1)).alias("_c"),
    ).select(
        "event_type", "b", F.expr("_s div _c").cast("long").alias("x")
    )
    series = daily.filter(F.col("b") < _DTW_N).select(
        "event_type", (F.col("b") + 1).alias("i"), "x"
    )
    # The DP depth is fixed (19 wavefronts) but each relational step costs
    # a scheduler round trip; the series relation is BOUNDED (|types| x 10
    # calendar buckets), so the exact-integer DP runs driver-side on the
    # collected rows instead (the q277 kernel pattern). The corpus-sized
    # work - the bucket aggregate - stays distributed.
    rows = series.collect()
    ser: dict[str, dict[int, int]] = {}
    for r in rows:
        ser.setdefault(r["event_type"], {})[r["i"]] = r["x"]
    types = sorted(t for t, m in ser.items() if len(m) == _DTW_N)
    out = []
    for ai in range(len(types)):
        for bi in range(ai + 1, len(types)):
            a = [ser[types[ai]][k] for k in range(1, _DTW_N + 1)]
            b = [ser[types[bi]][k] for k in range(1, _DTW_N + 1)]
            D = [[_DTW_BIG] * (_DTW_N + 1) for _ in range(_DTW_N + 1)]
            D[0][0] = 0
            for i in range(1, _DTW_N + 1):
                for j in range(1, _DTW_N + 1):
                    D[i][j] = abs(a[i - 1] - b[j - 1]) + min(
                        D[i - 1][j], D[i][j - 1], D[i - 1][j - 1]
                    )
            l1 = sum(abs(x - y) for x, y in zip(a, b))
            out.append((types[ai], types[bi], D[_DTW_N][_DTW_N], l1))
    return (
        spark.createDataFrame(
            out, "type_a string, type_b string, d long, l1 long"
        )
        .select(
            "type_a",
            "type_b",
            F.round(F.col("d") / 100.0, 4).alias("dtw"),
            F.round(F.col("l1") / 100.0, 4).alias("l1_lockstep"),
        )
        .orderBy("type_a", "type_b")
    )


# --------------------------------------------------------------------------
# q299 - stratified uplift (post-stratification ATE): purchase-rate
# uplift of the odd-user cohort within fixed value bands, then the
# stratum-size-weighted pooled effect - the estimator that removes
# stratum-composition bias a raw A/B difference keeps (the bridge
# between q175's one-shot z and q242's IPW).
# Parity: per-(stratum, arm) counts are exact integers from one keyed
# aggregate; uplifts/weights/ATE are fixed double expressions, 4dp; the
# pooled ATE is replicated per row from a 1-row broadcast whose
# summation is over the frozen 5-row relation in stratum order (an
# ordered integer-weighted sum, not a float reduce over rows -
# ate terms are micro-int-frozen before summing).
# Scale: one conditional aggregate to the bounded strata relation; all
# algebra on <= 5 rows.
# --------------------------------------------------------------------------
_Q299_BANDS = (0, 100, 200, 300, 400)


@register(
    "q299_stratified_uplift",
    oracle="""
WITH tagged AS (
    SELECT CASE WHEN value < 100 THEN 0 WHEN value < 200 THEN 1
                WHEN value < 300 THEN 2 WHEN value < 400 THEN 3
                ELSE 4 END AS stratum,
           CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS treated,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
    FROM events
),
cells AS (
    SELECT stratum,
           CAST(SUM(treated) AS BIGINT) AS n_t,
           CAST(SUM(treated * conv) AS BIGINT) AS c_t,
           CAST(SUM(1 - treated) AS BIGINT) AS n_c,
           CAST(SUM((1 - treated) * conv) AS BIGINT) AS c_c
    FROM tagged GROUP BY stratum
    HAVING SUM(treated) > 0 AND SUM(1 - treated) > 0
),
scored AS (
    SELECT stratum, n_t, c_t, n_c, c_c,
           CAST(n_t + n_c AS BIGINT) AS n_s,
           (CAST(c_t AS DOUBLE) / n_t - CAST(c_c AS DOUBLE) / n_c) AS uplift,
           CAST(ROUND(1000000.0 * (n_t + n_c)
                      * (CAST(c_t AS DOUBLE) / n_t
                         - CAST(c_c AS DOUBLE) / n_c)) AS BIGINT) AS term
    FROM cells
),
pooled AS (
    SELECT CAST(SUM(term) AS BIGINT) AS tsum, CAST(SUM(n_s) AS BIGINT) AS nn
    FROM scored
)
SELECT CAST(s.stratum AS BIGINT) AS stratum, s.n_t, s.n_c,
       ROUND(CAST(s.c_t AS DOUBLE) / s.n_t, 4) AS rate_treated,
       ROUND(CAST(s.c_c AS DOUBLE) / s.n_c, 4) AS rate_control,
       ROUND(s.uplift, 4) AS uplift,
       ROUND(CAST(p.tsum AS DOUBLE) / (1000000.0 * p.nn), 4) AS pooled_ate
FROM scored s CROSS JOIN pooled p
ORDER BY s.stratum
""",
    tags=("causal", "A12", "A9"),
)
def q299_stratified_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase-rate uplift by value stratum with size-weighted pooled
    ATE: (stratum, n_t, n_c, rate_treated, rate_control, uplift,
    pooled_ate)."""
    events = load_table(spark, sf_dir, "events")
    stratum = (
        F.when(F.col("value") < 100, 0)
        .when(F.col("value") < 200, 1)
        .when(F.col("value") < 300, 2)
        .when(F.col("value") < 400, 3)
        .otherwise(4)
    )
    tagged = events.select(
        stratum.alias("stratum"),
        (F.col("user_id") % 2 == 1).cast("long").alias("treated"),
        (F.col("event_type") == "purchase").cast("long").alias("conv"),
    )
    cells = (
        tagged.groupBy("stratum")
        .agg(
            F.sum("treated").alias("n_t"),
            F.sum(F.col("treated") * F.col("conv")).alias("c_t"),
            F.sum(1 - F.col("treated")).alias("n_c"),
            F.sum((1 - F.col("treated")) * F.col("conv")).alias("c_c"),
        )
        # strata missing either arm have no defined uplift - dropped from
        # the table AND the pooled sum on both engines
        .filter((F.col("n_t") > 0) & (F.col("n_c") > 0))
    )
    uplift = (
        F.col("c_t").cast("double") / F.col("n_t")
        - F.col("c_c").cast("double") / F.col("n_c")
    )
    scored = cells.select(
        "stratum",
        "n_t",
        "c_t",
        "n_c",
        "c_c",
        (F.col("n_t") + F.col("n_c")).alias("n_s"),
        uplift.alias("uplift"),
        F.round(1000000.0 * (F.col("n_t") + F.col("n_c")) * uplift)
        .cast("long")
        .alias("term"),
    )
    pooled = scored.agg(
        F.sum("term").alias("tsum"), F.sum("n_s").alias("nn")
    )
    return (
        scored.crossJoin(F.broadcast(pooled))
        .select(
            F.col("stratum").cast("long").alias("stratum"),
            F.col("n_t").cast("long").alias("n_t"),
            F.col("n_c").cast("long").alias("n_c"),
            F.round(F.col("c_t").cast("double") / F.col("n_t"), 4).alias(
                "rate_treated"
            ),
            F.round(F.col("c_c").cast("double") / F.col("n_c"), 4).alias(
                "rate_control"
            ),
            F.round("uplift", 4).alias("uplift"),
            F.round(
                F.col("tsum").cast("double") / (1000000.0 * F.col("nn")), 4
            ).alias("pooled_ate"),
        )
        .orderBy("stratum")
    )


# --------------------------------------------------------------------------
# q300 - power-law (Zipf tail) MLE on the user-activity degree
# distribution: the Clauset-Shalizi-Newman closed form
# alpha = 1 + n / sum(ln(k_i / (kmin - 1/2))) over per-user event
# counts - the "is this graph/usage heavy-tailed" diagnostic that
# decides whether mean-based capacity planning is even valid. kmin = 1.
# Parity: the corpus collapses to the DEGREE DOMAIN (distinct count
# values with multiplicities); each ln(k/0.5) term is frozen to
# round(10^6 * ln) per distinct degree and weighted by its multiplicity,
# so the denominator is an integer sum; alpha is one division, 4dp.
# Scale: one per-user count, one degree-domain aggregate (bounded by
# max activity, not user count), 1 output row.
# --------------------------------------------------------------------------
@register(
    "q300_powerlaw_alpha",
    oracle="""
WITH deg AS (
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS k FROM events GROUP BY user_id
),
dom AS (
    SELECT k, CAST(COUNT(*) AS BIGINT) AS m,
           CAST(ROUND(1000000.0 * LN(CAST(k AS DOUBLE) / 0.5)) AS BIGINT)
               AS lnk
    FROM deg GROUP BY k
),
agg AS (
    SELECT CAST(SUM(m) AS BIGINT) AS n,
           CAST(SUM(m * lnk) AS BIGINT) AS denom,
           CAST(MAX(k) AS BIGINT) AS kmax,
           CAST(MIN(k) AS BIGINT) AS kmin
    FROM dom
)
SELECT n AS n_users, kmin AS min_degree, kmax AS max_degree,
       ROUND(1.0 + CAST(n AS DOUBLE) * 1000000.0 / denom, 4) AS alpha
FROM agg
""",
    tags=("graph", "A12", "A5"),
)
def q300_powerlaw_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSN power-law exponent of user activity degrees:
    (n_users, min_degree, max_degree, alpha)."""
    events = load_table(spark, sf_dir, "events")
    deg = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("k"))
    dom = deg.groupBy("k").agg(F.count(F.lit(1)).alias("m")).select(
        "k",
        "m",
        F.round(1000000.0 * F.log(F.col("k").cast("double") / 0.5))
        .cast("long")
        .alias("lnk"),
    )
    agg = dom.agg(
        F.sum("m").alias("n"),
        F.sum(F.col("m") * F.col("lnk")).alias("denom"),
        F.max("k").alias("kmax"),
        F.min("k").alias("kmin"),
    )
    return agg.select(
        F.col("n").cast("long").alias("n_users"),
        F.col("kmin").cast("long").alias("min_degree"),
        F.col("kmax").cast("long").alias("max_degree"),
        F.round(
            1.0 + F.col("n").cast("double") * 1000000.0 / F.col("denom"), 4
        ).alias("alpha"),
    )


# --------------------------------------------------------------------------
# q301 - chained streaming aggregations (multiple stateful operators in
# ONE query, Spark 3.4+): hourly per-type counts re-aggregated into an
# hourly shape summary (n_types, total, max) - the two-level rollup that
# previously required two jobs and an intermediate sink, executed AS A
# STREAM through the availableNow gate. Append mode (mandatory for
# chained state) emits exactly the windows the final watermark closed:
# window_end <= max(ts) - 2h - the oracle reproduces that boundary, so
# the check pins BOTH the aggregation algebra and the emission contract.
# Parity: counts are exact integers; no floats anywhere.
# Scale: two shuffle stages keyed by (window[, type]) with watermark-
# bounded state - the streaming twin of a two-level batch rollup; state
# size is windows-in-flight, not history.
# --------------------------------------------------------------------------
@register(
    "q301_streaming_two_level",
    oracle="""
WITH e AS (
    SELECT CAST(ts AS TIMESTAMP) AS ts, event_type FROM events
),
mx AS (SELECT MAX(ts) AS m FROM e),
l1 AS (
    SELECT TIME_BUCKET(INTERVAL '1 hour', ts) AS w, event_type,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM e GROUP BY 1, 2
),
l2 AS (
    SELECT w, CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(n) AS BIGINT) AS total_events,
           CAST(MAX(n) AS BIGINT) AS max_type_n
    FROM l1 GROUP BY w
)
SELECT l2.w AS window_start, n_types, total_events, max_type_n
FROM l2 CROSS JOIN mx
WHERE l2.w + INTERVAL '1 hour' <= mx.m - INTERVAL '2 hours'
ORDER BY window_start
""",
    tags=("streaming-tumbling", "A9", "A1"),
)
def q301_streaming_two_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained two-level streaming rollup through the availableNow gate:
    (window_start, n_types, total_events, max_type_n) for every window
    the final watermark closed."""
    from ..streaming import events as se

    stream = se.read_events_stream(spark, sf_dir)
    return se.run_available_now(
        se.two_level_hourly(stream), "q301_sink", output_mode="append"
    ).orderBy("window_start")


# --------------------------------------------------------------------------
# q302 - population stability index (PSI) per event type: the standard
# model-monitoring drift score between the first and second half of the
# month over 10 fixed value bands, with the conventional 0.1/0.25
# watch/alert verdicts. q156 measures corpus drift in KL over tokens;
# PSI is its banded, score-distribution sibling every scoring pipeline
# reports.
# Parity: band counts are exact integers; each PSI term
# (p_i - q_i) * ln(p_i / q_i) is frozen to round(10^9 * term) BEFORE the
# cross-band sum (Laplace +1 smoothing keeps every band populated so the
# log never sees zero); one /10^9 + 4dp at the end.
# Scale: one conditional aggregate to the (type, band) relation; all
# algebra on <= |types| x 10 rows.
# --------------------------------------------------------------------------
@register(
    "q302_psi_drift",
    oracle="""
WITH tagged AS (
    SELECT event_type,
           CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16 00:00:00'
                THEN 0 ELSE 1 END AS half,
           LEAST(CAST(FLOOR(value / 50.0) AS BIGINT), 9) AS band
    FROM events
),
cells AS (
    SELECT event_type, band,
           CAST(SUM(1 - half) + 1 AS BIGINT) AS a,
           CAST(SUM(half) + 1 AS BIGINT) AS b
    FROM tagged GROUP BY event_type, band
),
tot AS (
    SELECT event_type, CAST(SUM(a) AS BIGINT) AS ta,
           CAST(SUM(b) AS BIGINT) AS tb
    FROM cells GROUP BY event_type
),
terms AS (
    SELECT c.event_type,
           CAST(ROUND(1000000000.0
                * (CAST(c.a AS DOUBLE) / t.ta - CAST(c.b AS DOUBLE) / t.tb)
                * LN((CAST(c.a AS DOUBLE) / t.ta)
                     / (CAST(c.b AS DOUBLE) / t.tb))) AS BIGINT) AS term
    FROM cells c JOIN tot t ON t.event_type = c.event_type
)
SELECT event_type,
       ROUND(CAST(SUM(term) AS DOUBLE) / 1000000000.0, 4) AS psi,
       CAST(CASE WHEN SUM(term) >= 250000000 THEN 2
                 WHEN SUM(term) >= 100000000 THEN 1 ELSE 0 END AS BIGINT)
           AS drift_level
FROM terms
GROUP BY event_type
ORDER BY event_type
""",
    tags=("ml-monitoring", "A6", "A12"),
)
def q302_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI between month halves over 10 value bands per type:
    (event_type, psi, drift_level) - 0 ok / 1 watch / 2 alert."""
    events = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    tagged = events.select(
        "event_type",
        (F.col("ts") >= cut).cast("long").alias("half"),
        F.least(
            F.floor(F.col("value") / 50.0).cast("long"), F.lit(9).cast("long")
        ).alias("band"),
    )
    cells = tagged.groupBy("event_type", "band").agg(
        (F.sum(1 - F.col("half")) + 1).alias("a"),
        (F.sum("half") + 1).alias("b"),
    )
    tot = cells.groupBy("event_type").agg(
        F.sum("a").alias("ta"), F.sum("b").alias("tb")
    )
    pa = F.col("a").cast("double") / F.col("ta")
    pb = F.col("b").cast("double") / F.col("tb")
    terms = cells.join(tot, "event_type").select(
        "event_type",
        F.round(1000000000.0 * (pa - pb) * F.log(pa / pb))
        .cast("long")
        .alias("term"),
    )
    return (
        terms.groupBy("event_type")
        .agg(F.sum("term").alias("tsum"))
        .select(
            "event_type",
            F.round(F.col("tsum").cast("double") / 1000000000.0, 4).alias("psi"),
            F.when(F.col("tsum") >= 250000000, 2)
            .when(F.col("tsum") >= 100000000, 1)
            .otherwise(0)
            .cast("long")
            .alias("drift_level"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# q303 - activity-segment migration matrix: classify each user by fixed
# spend bands (summed event value: low < $1300, mid < $1900, high)
# in each month half, then the transition matrix between halves including 'new' /
# 'churned' edge states - the cohort-migration relation a retention
# dashboard is built on (q88 tracks cohorts over time; this tracks
# SEGMENT MOVEMENT between periods).
# Parity: per-half spend is an exact x100-frozen integer sum; segment
# assignment is integer thresholding on it; matrix cells and row shares
# are integers + one division, 4dp.
# Scale: two keyed per-(user, half) aggregates -> full-outer join on
# user -> one (from, to) aggregate; the matrix is bounded (4 x 4).
# --------------------------------------------------------------------------
@register(
    "q303_segment_migration",
    oracle="""
WITH perhalf AS (
    SELECT user_id,
           CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16 00:00:00'
                THEN 0 ELSE 1 END AS half,
           CAST(SUM(CAST(ROUND(100.0 * value) AS BIGINT)) AS BIGINT) AS s
    FROM events GROUP BY 1, 2
),
seg AS (
    SELECT user_id, half,
           CASE WHEN s < 130000 THEN 'low' WHEN s < 190000 THEN 'mid'
                ELSE 'high' END AS segment
    FROM perhalf
),
joined AS (
    SELECT COALESCE(a.user_id, b.user_id) AS user_id,
           COALESCE(a.segment, 'new') AS from_seg,
           COALESCE(b.segment, 'churned') AS to_seg
    FROM (SELECT * FROM seg WHERE half = 0) a
    FULL JOIN (SELECT * FROM seg WHERE half = 1) b
      ON b.user_id = a.user_id
),
cells AS (
    SELECT from_seg, to_seg, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM joined GROUP BY from_seg, to_seg
),
rows_ AS (
    SELECT from_seg, CAST(SUM(n_users) AS BIGINT) AS row_n FROM cells
    GROUP BY from_seg
)
SELECT c.from_seg, c.to_seg, c.n_users,
       ROUND(CAST(c.n_users AS DOUBLE) / r.row_n, 4) AS row_share
FROM cells c JOIN rows_ r ON r.from_seg = c.from_seg
ORDER BY c.from_seg, c.to_seg
""",
    tags=("cohort", "A6", "J8"),
)
def q303_segment_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Half-to-half activity segment transition matrix:
    (from_seg, to_seg, n_users, row_share)."""
    events = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    perhalf = events.groupBy(
        "user_id", (F.col("ts") >= cut).cast("long").alias("half")
    ).agg(F.sum(F.round(100.0 * F.col("value")).cast("long")).alias("s"))
    seg = perhalf.select(
        "user_id",
        "half",
        F.when(F.col("s") < 130000, "low")
        .when(F.col("s") < 190000, "mid")
        .otherwise("high")
        .alias("segment"),
    )
    a = seg.filter(F.col("half") == 0).select(
        "user_id", F.col("segment").alias("from_seg")
    )
    b = seg.filter(F.col("half") == 1).select(
        "user_id", F.col("segment").alias("to_seg")
    )
    joined = a.join(b, "user_id", "full").select(
        F.coalesce("from_seg", F.lit("new")).alias("from_seg"),
        F.coalesce("to_seg", F.lit("churned")).alias("to_seg"),
    )
    cells = joined.groupBy("from_seg", "to_seg").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    rows_ = cells.groupBy("from_seg").agg(F.sum("n_users").alias("row_n"))
    return (
        cells.join(rows_, "from_seg")
        .select(
            "from_seg",
            "to_seg",
            F.col("n_users").cast("long").alias("n_users"),
            F.round(
                F.col("n_users").cast("double") / F.col("row_n"), 4
            ).alias("row_share"),
        )
        .orderBy("from_seg", "to_seg")
    )


# --------------------------------------------------------------------------
# q304 - exact distributed quantiles from value-domain counts: p50 /
# p90 / p99 of `value` per event type WITHOUT any row sort - collapse to
# per-(type, frozen value) counts, one cumulative window over the
# bounded value DOMAIN, then pick the lower-nearest order statistic at
# ceil(p * n). This is the scale path q64's sort-based percentile()
# cannot take at 100 TB (its per-group sort is row-scaled; this window
# is domain-scaled), and unlike t-digest it is EXACT.
# Parity: k-th order statistics are integer selections (value = smallest
# v with cum >= ceil(p*n), via integer arithmetic (p*n + 99) // 100);
# the only double is the final /100 display scaling, 4dp.
# Scale: one keyed aggregate to the (type, value-domain) relation; the
# cum window partitions per type over distinct values; three broadcast-
# joined threshold lookups.
# --------------------------------------------------------------------------
_Q304_PCTS = (50, 90, 99)


def _q304_pick(p: int) -> str:
    return f"""(
    SELECT event_type, MIN(v) AS v FROM cum
    JOIN nn USING (event_type)
    WHERE cum >= ({p} * n + 99) // 100
    GROUP BY event_type
)"""


@register(
    "q304_domain_quantiles",
    oracle=f"""
WITH frozen AS (
    SELECT event_type, CAST(ROUND(100.0 * value) AS BIGINT) AS v
    FROM events
),
g AS (
    SELECT event_type, v, CAST(COUNT(*) AS BIGINT) AS c
    FROM frozen GROUP BY event_type, v
),
nn AS (
    SELECT event_type, CAST(SUM(c) AS BIGINT) AS n FROM g GROUP BY event_type
),
cum AS (
    SELECT event_type, v, c,
           CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY v
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
    FROM g
)
SELECT n.event_type, n.n,
       ROUND(p50.v / 100.0, 4) AS p50,
       ROUND(p90.v / 100.0, 4) AS p90,
       ROUND(p99.v / 100.0, 4) AS p99
FROM nn n
JOIN {_q304_pick(50)} p50 ON p50.event_type = n.event_type
JOIN {_q304_pick(90)} p90 ON p90.event_type = n.event_type
JOIN {_q304_pick(99)} p99 ON p99.event_type = n.event_type
ORDER BY n.event_type
""",
    tags=("quantiles", "A12", "W2"),
)
def q304_domain_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90/p99 per type from value-domain counts (no row
    sort): (event_type, n, p50, p90, p99)."""
    events = load_table(spark, sf_dir, "events")
    g = events.groupBy(
        "event_type",
        F.round(100.0 * F.col("value")).cast("long").alias("v"),
    ).agg(F.count(F.lit(1)).alias("c"))
    nn = g.groupBy("event_type").agg(F.sum("c").alias("n"))
    w = Window.partitionBy("event_type").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = g.select("event_type", "v", F.sum("c").over(w).alias("cum")).join(
        F.broadcast(nn), "event_type"
    )
    out = nn
    for p in _Q304_PCTS:
        pick = (
            cum.filter(
                F.col("cum") >= F.expr(f"({p} * n + 99) div 100")
            )
            .groupBy("event_type")
            .agg(F.min("v").alias(f"v{p}"))
        )
        out = out.join(pick, "event_type")
    return out.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        *[
            F.round(F.col(f"v{p}") / 100.0, 4).alias(f"p{p}")
            for p in _Q304_PCTS
        ],
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# q305 - two-sample Kolmogorov-Smirnov test (treated vs control value
# distributions): the max CDF gap computed on the value DOMAIN (merged
# distinct values, two cumulative counts, one argmax) - no row sort -
# with the asymptotic two-sided p approximation
# p = 2 exp(-2 D^2 n_e), n_e = n1 n2 / (n1 + n2). The distribution-free
# "did the whole shape move" test the mean-based q284/q291 cannot see.
# Parity: CDF gaps are compared as INTEGER cross-products
# |c1 * n2 - c2 * n1| (never a float CDF), so D's argmax is exact; D and
# p are closed-form doubles from three integers; 4dp.
# Scale: one keyed aggregate to the value domain, two domain-window
# cumsums, one 1-row argmax aggregate.
# --------------------------------------------------------------------------
@register(
    "q305_ks_test",
    oracle="""
WITH frozen AS (
    SELECT CAST(ROUND(100.0 * value) AS BIGINT) AS v,
           CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS t
    FROM events
),
g AS (
    SELECT v, CAST(SUM(t) AS BIGINT) AS c1, CAST(SUM(1 - t) AS BIGINT) AS c2
    FROM frozen GROUP BY v
),
nn AS (
    SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
    FROM g
),
cum AS (
    SELECT v,
           CAST(SUM(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS k1,
           CAST(SUM(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS k2
    FROM g
),
gap AS (
    SELECT CAST(MAX(ABS(k1 * (SELECT n2 FROM nn) - k2 * (SELECT n1 FROM nn)))
                AS BIGINT) AS num
    FROM cum
)
SELECT n.n1, n.n2,
       ROUND(CAST(g.num AS DOUBLE) / (CAST(n.n1 AS DOUBLE) * n.n2), 4) AS d_stat,
       ROUND(2.0 * EXP(-2.0
             * (CAST(g.num AS DOUBLE) / (CAST(n.n1 AS DOUBLE) * n.n2))
             * (CAST(g.num AS DOUBLE) / (CAST(n.n1 AS DOUBLE) * n.n2))
             * (CAST(n.n1 AS DOUBLE) * n.n2 / (n.n1 + n.n2))), 4) AS p_value
FROM gap g CROSS JOIN nn n
""",
    tags=("ab-test", "A12", "W2"),
)
def q305_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS test of treated vs control values on the value
    domain: (n1, n2, d_stat, p_value)."""
    events = load_table(spark, sf_dir, "events")
    frozen = events.select(
        F.round(100.0 * F.col("value")).cast("long").alias("v"),
        (F.col("user_id") % 2 == 1).cast("long").alias("t"),
    )
    g = frozen.groupBy("v").agg(
        F.sum("t").alias("c1"), F.sum(1 - F.col("t")).alias("c2")
    )
    nn = g.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = g.select(
        F.sum("c1").over(w).alias("k1"), F.sum("c2").over(w).alias("k2")
    ).crossJoin(F.broadcast(nn))
    gap = cum.agg(
        F.max(
            F.abs(F.col("k1") * F.col("n2") - F.col("k2") * F.col("n1"))
        ).alias("num")
    )
    d = F.col("num").cast("double") / (F.col("n1").cast("double") * F.col("n2"))
    ne = F.col("n1").cast("double") * F.col("n2") / (F.col("n1") + F.col("n2"))
    return (
        gap.crossJoin(F.broadcast(nn))
        .select(
            F.col("n1").cast("long").alias("n1"),
            F.col("n2").cast("long").alias("n2"),
            F.round(d, 4).alias("d_stat"),
            F.round(2.0 * F.exp(-2.0 * d * d * ne), 4).alias("p_value"),
        )
    )


# --------------------------------------------------------------------------
# q306 - Spearman rank correlation between event types' daily count
# series: average-rank rho over the 30-day calendar for every type pair
# - the monotone-association complement to q174's rolling Pearson
# (Spearman survives outlier days and nonlinear coupling).
# Parity: average ranks are exact rationals frozen as 2x-integers
# (2*rank is integer even for tied halves); rho's numerator/denominator
# are integer sums over the bounded series; one division, 4dp.
# Scale: collapse-first to daily counts; ranking windows partition per
# type over the calendar-bounded series; the pair join is |types|^2 x 30.
# --------------------------------------------------------------------------
@register(
    "q306_spearman_daily",
    oracle="""
WITH daily AS (
    SELECT event_type,
           CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2
),
ranked AS (
    SELECT event_type, day,
           CAST(2 * RANK() OVER (PARTITION BY event_type ORDER BY c)
                + COUNT(*) OVER (PARTITION BY event_type, c) - 1 AS BIGINT)
               AS r2
    FROM daily
),
pairs AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           a.r2 AS ra, b.r2 AS rb
    FROM ranked a
    JOIN ranked b ON b.day = a.day AND a.event_type < b.event_type
),
stats AS (
    SELECT type_a, type_b,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(ra) AS BIGINT) AS sa, CAST(SUM(rb) AS BIGINT) AS sb,
           CAST(SUM(ra * rb) AS BIGINT) AS sab,
           CAST(SUM(ra * ra) AS BIGINT) AS saa,
           CAST(SUM(rb * rb) AS BIGINT) AS sbb
    FROM pairs GROUP BY type_a, type_b
)
SELECT type_a, type_b, n,
       ROUND((n * sab - CAST(sa AS DOUBLE) * sb)
             / SQRT((n * saa - CAST(sa AS DOUBLE) * sa)
                    * (n * sbb - CAST(sb AS DOUBLE) * sb)), 4) AS rho
FROM stats
ORDER BY type_a, type_b
""",
    tags=("robust-stats", "A12", "W2"),
)
def q306_spearman_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rho between daily count series for every type pair:
    (type_a, type_b, n, rho)."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    wr = Window.partitionBy("event_type").orderBy("c")
    wt = Window.partitionBy("event_type", "c")
    ranked = daily.select(
        "event_type",
        "day",
        (
            2 * F.rank().over(wr) + F.count(F.lit(1)).over(wt) - 1
        ).cast("long").alias("r2"),
    )
    a = ranked.select(
        F.col("event_type").alias("type_a"), "day", F.col("r2").alias("ra")
    )
    b = ranked.select(
        F.col("event_type").alias("type_b"), "day", F.col("r2").alias("rb")
    )
    pairs = a.join(b, "day").filter(F.col("type_a") < F.col("type_b"))
    stats = pairs.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("ra").alias("sa"),
        F.sum("rb").alias("sb"),
        F.sum(F.col("ra") * F.col("rb")).alias("sab"),
        F.sum(F.col("ra") * F.col("ra")).alias("saa"),
        F.sum(F.col("rb") * F.col("rb")).alias("sbb"),
    )
    num = F.col("n") * F.col("sab") - F.col("sa").cast("double") * F.col("sb")
    den = F.sqrt(
        (F.col("n") * F.col("saa") - F.col("sa").cast("double") * F.col("sa"))
        * (F.col("n") * F.col("sbb") - F.col("sb").cast("double") * F.col("sb"))
    )
    return stats.select(
        "type_a",
        "type_b",
        F.col("n").cast("long").alias("n"),
        F.round(num / den, 4).alias("rho"),
    ).orderBy("type_a", "type_b")


# --------------------------------------------------------------------------
# q307 - lead-lag cross-correlation: Pearson correlation of daily count
# series at every shift in [-3, +3] days for each type pair, and the
# best lag by |r| - "does error activity LEAD purchases by two days?",
# the question q306's same-day rho cannot answer.
# Parity: per-(pair, lag) sums over the aligned overlap are exact
# integers (the overlap set is a deterministic day join); r is the
# closed-form expression over 6 integers; the argmax lag orders by
# (round(|r|, 4) desc, lag asc) so ties are deterministic; 4dp.
# Scale: collapse-first to daily counts; the lag join is |types|^2 x 7
# x 30 bounded rows; one (pair, lag) aggregate + one tiny argmax window.
# --------------------------------------------------------------------------
@register(
    "q307_lead_lag",
    oracle="""
WITH daily AS (
    SELECT event_type,
           DATEDIFF('day', DATE '2024-01-01',
                    CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS DATE))
               AS t,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2
),
lags AS (SELECT UNNEST(GENERATE_SERIES(-3, 3)) AS lag),
pairs AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b, l.lag,
           a.c AS ca, b.c AS cb
    FROM daily a
    CROSS JOIN lags l
    JOIN daily b ON b.event_type <> a.event_type
               AND a.event_type < b.event_type
               AND b.t = a.t + l.lag
),
stats AS (
    SELECT type_a, type_b, lag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(ca) AS BIGINT) AS sa, CAST(SUM(cb) AS BIGINT) AS sb,
           CAST(SUM(ca * cb) AS BIGINT) AS sab,
           CAST(SUM(ca * ca) AS BIGINT) AS saa,
           CAST(SUM(cb * cb) AS BIGINT) AS sbb
    FROM pairs GROUP BY type_a, type_b, lag
),
scored AS (
    SELECT type_a, type_b, CAST(lag AS BIGINT) AS lag, n,
           ROUND((n * sab - CAST(sa AS DOUBLE) * sb)
                 / SQRT((n * saa - CAST(sa AS DOUBLE) * sa)
                        * (n * sbb - CAST(sb AS DOUBLE) * sb)), 4) AS r
    FROM stats
),
best AS (
    SELECT type_a, type_b, lag AS best_lag, r AS best_r,
           ROW_NUMBER() OVER (PARTITION BY type_a, type_b
                              ORDER BY ABS(r) DESC, lag ASC) AS rk
    FROM scored
)
SELECT type_a, type_b, best_lag, best_r
FROM best WHERE rk = 1
ORDER BY type_a, type_b
""",
    tags=("timeseries", "A12", "W3"),
)
def q307_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best lead-lag (by |r|, lags -3..3) between daily count series:
    (type_a, type_b, best_lag, best_r)."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type",
        F.datediff(
            F.date_trunc("day", "ts").cast("date"),
            F.lit("2024-01-01").cast("date"),
        ).alias("t"),
    ).agg(F.count(F.lit(1)).alias("c"))
    lags = spark.createDataFrame([(l,) for l in range(-3, 4)], "lag long")
    a = daily.select(
        F.col("event_type").alias("type_a"), F.col("t").alias("ta"),
        F.col("c").alias("ca"),
    )
    b = daily.select(
        F.col("event_type").alias("type_b"), F.col("t").alias("tb"),
        F.col("c").alias("cb"),
    )
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            (F.col("type_a") < F.col("type_b"))
            & (F.col("tb") == F.col("ta") + F.col("lag")),
        )
    )
    stats = pairs.groupBy("type_a", "type_b", "lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("ca").alias("sa"),
        F.sum("cb").alias("sb"),
        F.sum(F.col("ca") * F.col("cb")).alias("sab"),
        F.sum(F.col("ca") * F.col("ca")).alias("saa"),
        F.sum(F.col("cb") * F.col("cb")).alias("sbb"),
    )
    num = F.col("n") * F.col("sab") - F.col("sa").cast("double") * F.col("sb")
    den = F.sqrt(
        (F.col("n") * F.col("saa") - F.col("sa").cast("double") * F.col("sa"))
        * (F.col("n") * F.col("sbb") - F.col("sb").cast("double") * F.col("sb"))
    )
    scored = stats.select(
        "type_a",
        "type_b",
        F.col("lag").cast("long").alias("lag"),
        F.round(num / den, 4).alias("r"),
    )
    w = Window.partitionBy("type_a", "type_b").orderBy(
        F.abs(F.col("r")).desc(), F.col("lag").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "type_a",
            "type_b",
            F.col("lag").alias("best_lag"),
            F.col("r").alias("best_r"),
        )
        .orderBy("type_a", "type_b")
    )


# --------------------------------------------------------------------------
# q308 - greedy maximum-coverage source selection: pick 5 sources whose
# union covers the most distinct word trigrams, one greedy step at a time
# (the classic (1 - 1/e) submodular algorithm - budgeted data
# acquisition: "which 5 corpora buy the most vocabulary"). Each step is
# RELATIONAL: marginal gain = per-source count of tokens not yet
# covered (anti-join), argmax with source tie-break.
# Parity: token sets and marginal counts are exact; the oracle unrolls
# the 5 greedy steps as MATERIALIZED CTEs (the q270 device).
# Scale: the (source, token) distinct relation is the only corpus-sized
# object (one keyed distinct); each greedy step is one anti-join + one
# per-source count over it - 5 fixed rounds, no driver state beyond the
# picked source ids.
# --------------------------------------------------------------------------
_Q308_K = 5


def _q308_oracle(k: int = _Q308_K) -> str:
    ctes = [
        "cov0 AS (SELECT DISTINCT tok FROM st WHERE FALSE)",
    ]
    for i in range(1, k + 1):
        ctes.append(
            f"""gain{i} AS MATERIALIZED (
    SELECT s.source, CAST(COUNT(*) AS BIGINT) AS gain
    FROM st s
    WHERE NOT EXISTS (SELECT 1 FROM cov{i - 1} c WHERE c.tok = s.tok)
      AND s.source NOT IN (SELECT source FROM picked{i - 1})
    GROUP BY s.source
)"""
        )
        ctes.append(
            f"""sel{i} AS MATERIALIZED (
    SELECT source, gain FROM gain{i}
    ORDER BY gain DESC, source ASC LIMIT 1
)"""
        )
        ctes.append(
            f"""picked{i} AS MATERIALIZED (
    SELECT source FROM picked{i - 1} UNION ALL SELECT source FROM sel{i}
)"""
        )
        ctes.append(
            f"""cov{i} AS MATERIALIZED (
    SELECT DISTINCT tok FROM st
    WHERE source IN (SELECT source FROM picked{i})
)"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS BIGINT) AS step, source, gain AS new_tokens,"
        f" (SELECT CAST(COUNT(*) AS BIGINT) FROM cov{i}) AS covered_total"
        f" FROM sel{i}"
        for i in range(1, k + 1)
    )
    joined = ",\n".join(ctes)
    return f"""
WITH dw AS (
    SELECT source, LIST_FILTER(STRING_SPLIT(text, ' '), t -> t <> '') AS w
    FROM documents
),
st AS MATERIALIZED (
    SELECT DISTINCT source, ARRAY_TO_STRING(w[i + 1 : i + 3], ' ') AS tok
    FROM dw, UNNEST(GENERATE_SERIES(0, LEN(w) - 3)) AS t(i)
    WHERE LEN(w) >= 3
),
picked0 AS (SELECT source FROM st WHERE FALSE),
{joined}
SELECT * FROM ({union})
ORDER BY step
"""


@register(
    "q308_greedy_coverage",
    oracle=_q308_oracle(),
    tags=("training-mix", "P5", "W3"),
)
def q308_greedy_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy 5-source maximum vocabulary coverage:
    (step, source, new_tokens, covered_total)."""
    from ..caching import persist_tracked

    docs = load_table(spark, sf_dir, "documents")
    w = F.filter(F.split("text", " "), lambda t: t != "")
    st = persist_tracked(
        docs.select("source", w.alias("w"))
        .filter(F.size("w") >= 3)
        .select(
            "source",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("w") - 3),
                    lambda i: F.concat_ws(" ", F.slice(F.col("w"), i + 1, 3)),
                )
            ).alias("tok"),
        )
        .distinct()
    )
    picked: list[str] = []
    out = []
    covered = st.filter(F.lit(False)).select("tok")
    for step in range(1, _Q308_K + 1):
        gains = (
            st.filter(~F.col("source").isin(picked) if picked else F.lit(True))
            .join(covered, "tok", "left_anti")
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("gain"))
            .orderBy(F.col("gain").desc(), F.col("source").asc())
            .limit(1)
            .collect()
        )
        if not gains:  # every remaining source adds zero coverage - the
            break      # oracle's sel CTE goes empty at the same step
        src, gain = gains[0]["source"], gains[0]["gain"]
        picked.append(src)
        covered = (
            st.filter(F.col("source").isin(picked)).select("tok").distinct()
        ).localCheckpoint(eager=True)
        out.append((step, src, gain, covered.count()))
    return spark.createDataFrame(
        out, "step long, source string, new_tokens long, covered_total long"
    ).orderBy("step")


# --------------------------------------------------------------------------
# q309 - entropy rate of the user-journey Markov chain: H = -sum_s pi_s
# sum_t p(s,t) ln p(s,t), with pi the empirical state frequencies and p
# the q154/q279 transition matrix - how predictable the NEXT event is
# given the current one, in nats (0 = deterministic journeys; ln|S| =
# uniform chaos). Also reports each state's conditional entropy, giving
# the per-state predictability profile q279's argmax accuracy only
# scratches.
# Parity: transition counts are exact; each -c_st * ln(c_st / c_s) term
# is frozen to round(10^6 * term) per matrix cell before ANY cross-cell
# sum; pi weighting happens in exact integer arithmetic (term sums are
# divided by the GLOBAL transition count once at the end); 4dp.
# Scale: one per-user successor window + one keyed aggregate to the
# bounded |states|^2 matrix; everything after is algebra on it.
# --------------------------------------------------------------------------
@register(
    "q309_entropy_rate",
    oracle="""
WITH walk AS (
    SELECT user_id, event_type,
           LEAD(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS nxt
    FROM events
),
trans AS (
    SELECT event_type AS s, nxt AS t, CAST(COUNT(*) AS BIGINT) AS c
    FROM walk WHERE nxt IS NOT NULL GROUP BY event_type, nxt
),
outd AS (SELECT s, CAST(SUM(c) AS BIGINT) AS n FROM trans GROUP BY s),
terms AS (
    SELECT tr.s, o.n,
           CAST(ROUND(1000000.0 * tr.c
                      * LN(CAST(o.n AS DOUBLE) / tr.c)) AS BIGINT) AS term
    FROM trans tr JOIN outd o ON o.s = tr.s
),
per_state AS (
    SELECT s, CAST(MAX(n) AS BIGINT) AS n_out,
           CAST(SUM(term) AS BIGINT) AS tsum
    FROM terms GROUP BY s
),
tot AS (
    SELECT CAST(SUM(n_out) AS BIGINT) AS nn,
           CAST(SUM(tsum) AS BIGINT) AS all_terms
    FROM per_state
)
SELECT p.s AS state, p.n_out,
       ROUND(CAST(p.tsum AS DOUBLE) / (1000000.0 * p.n_out), 4)
           AS h_conditional,
       ROUND(CAST(t.all_terms AS DOUBLE) / (1000000.0 * t.nn), 4)
           AS entropy_rate
FROM per_state p CROSS JOIN tot t
ORDER BY state
""",
    tags=("sequence", "A12", "W2"),
)
def q309_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-chain entropy rate + per-state conditional entropy:
    (state, n_out, h_conditional, entropy_rate)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    walk = events.select(
        "event_type", F.lead("event_type").over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    trans = walk.groupBy(
        F.col("event_type").alias("s"), F.col("nxt").alias("t")
    ).agg(F.count(F.lit(1)).alias("c"))
    outd = trans.groupBy("s").agg(F.sum("c").alias("n"))
    terms = trans.join(outd, "s").select(
        "s",
        "n",
        F.round(
            1000000.0
            * F.col("c")
            * F.log(F.col("n").cast("double") / F.col("c"))
        )
        .cast("long")
        .alias("term"),
    )
    per_state = terms.groupBy("s").agg(
        F.max("n").alias("n_out"), F.sum("term").alias("tsum")
    )
    tot = per_state.agg(
        F.sum("n_out").alias("nn"), F.sum("tsum").alias("all_terms")
    )
    return (
        per_state.crossJoin(F.broadcast(tot))
        .select(
            F.col("s").alias("state"),
            F.col("n_out").cast("long").alias("n_out"),
            F.round(
                F.col("tsum").cast("double") / (1000000.0 * F.col("n_out")), 4
            ).alias("h_conditional"),
            F.round(
                F.col("all_terms").cast("double") / (1000000.0 * F.col("nn")),
                4,
            ).alias("entropy_rate"),
        )
        .orderBy("state")
    )


# --------------------------------------------------------------------------
# q310 - histogram planning audit (Freedman-Diaconis): per event type,
# the IQR from exact domain quantiles (the q304 machinery at p25/p75),
# the FD bin width 2*IQR/n^(1/3), and the implied bin count over the
# observed range - the relation a profiling UI consults before drawing
# anything, computed the domain-scaled way.
# Parity: IQR and range are exact integer differences of order
# statistics; cbrt is frozen to round(10^6 * cbrt(n)) (engines' cbrt may
# differ in the last ulp - the freeze absorbs it); width and bins are
# fixed double expressions, 4dp / exact integer ceil.
# Scale: the q304 budget - value-domain counts + per-type cum window.
# --------------------------------------------------------------------------
@register(
    "q310_fd_histogram_plan",
    oracle="""
WITH frozen AS (
    SELECT event_type, CAST(ROUND(100.0 * value) AS BIGINT) AS v
    FROM events
),
g AS (
    SELECT event_type, v, CAST(COUNT(*) AS BIGINT) AS c
    FROM frozen GROUP BY event_type, v
),
nn AS (
    SELECT event_type, CAST(SUM(c) AS BIGINT) AS n,
           CAST(MIN(v) AS BIGINT) AS vmin, CAST(MAX(v) AS BIGINT) AS vmax
    FROM g GROUP BY event_type
),
cum AS (
    SELECT event_type, v,
           CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY v
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
    FROM g
),
p25 AS (
    SELECT c.event_type, MIN(c.v) AS v FROM cum c JOIN nn USING (event_type)
    WHERE c.cum >= (25 * n + 99) // 100 GROUP BY c.event_type
),
p75 AS (
    SELECT c.event_type, MIN(c.v) AS v FROM cum c JOIN nn USING (event_type)
    WHERE c.cum >= (75 * n + 99) // 100 GROUP BY c.event_type
),
planned AS (
    SELECT n.event_type, n.n,
           CAST(p75.v - p25.v AS BIGINT) AS iqr,
           CAST(n.vmax - n.vmin AS BIGINT) AS rng,
           CAST(ROUND(1000000.0 * CBRT(CAST(n.n AS DOUBLE))) AS BIGINT)
               AS cbrt_n
    FROM nn n
    JOIN p25 ON p25.event_type = n.event_type
    JOIN p75 ON p75.event_type = n.event_type
)
SELECT event_type, n, ROUND(iqr / 100.0, 4) AS iqr,
       ROUND(2.0 * iqr * 1000000.0 / cbrt_n / 100.0, 4) AS fd_width,
       CAST(CEIL(CAST(rng AS DOUBLE) * cbrt_n / (2.0 * iqr * 1000000.0))
            AS BIGINT) AS n_bins
FROM planned
ORDER BY event_type
""",
    tags=("quantiles", "A12", "F19"),
)
def q310_fd_histogram_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freedman-Diaconis histogram plan per type: (event_type, n, iqr,
    fd_width, n_bins)."""
    events = load_table(spark, sf_dir, "events")
    g = events.groupBy(
        "event_type",
        F.round(100.0 * F.col("value")).cast("long").alias("v"),
    ).agg(F.count(F.lit(1)).alias("c"))
    nn = g.groupBy("event_type").agg(
        F.sum("c").alias("n"),
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
    )
    w = Window.partitionBy("event_type").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = g.select("event_type", "v", F.sum("c").over(w).alias("cum")).join(
        F.broadcast(nn.select("event_type", "n")), "event_type"
    )
    picks = {}
    for p in (25, 75):
        picks[p] = (
            cum.filter(F.col("cum") >= F.expr(f"({p} * n + 99) div 100"))
            .groupBy("event_type")
            .agg(F.min("v").alias(f"v{p}"))
        )
    planned = (
        nn.join(picks[25], "event_type")
        .join(picks[75], "event_type")
        .select(
            "event_type",
            "n",
            (F.col("v75") - F.col("v25")).alias("iqr_i"),
            (F.col("vmax") - F.col("vmin")).alias("rng"),
            F.round(1000000.0 * F.cbrt(F.col("n").cast("double")))
            .cast("long")
            .alias("cbrt_n"),
        )
    )
    return planned.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("iqr_i") / 100.0, 4).alias("iqr"),
        F.round(
            2.0 * F.col("iqr_i") * 1000000.0 / F.col("cbrt_n") / 100.0, 4
        ).alias("fd_width"),
        F.ceil(
            F.col("rng").cast("double")
            * F.col("cbrt_n")
            / (2.0 * F.col("iqr_i") * 1000000.0)
        )
        .cast("long")
        .alias("n_bins"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# q312 - delete-one-day jackknife SE of the coefficient of variation:
# the resampling standard error for a NONLINEAR statistic (cv = sd/mean,
# where no closed-form iid SE exists), computed without replicate scans:
# each delete-one cv falls out of (s - x_i, ss - x_i^2, n - 1) on the
# bounded daily relation, so the whole jackknife is algebra over 30 rows
# per type (vs q237's bootstrap, which re-aggregates B replicates).
# Parity: daily means are exact _s div _c integers; every delete-one cv
# is frozen to round(10^8 * cv) BEFORE the cross-day sums (a float sum
# over rows would be order-sensitive); the final SE is one double
# expression over two integer sums; 4dp.
# Scale: collapse-first to daily means; everything after is a
# calendar-bounded per-type aggregate.
# --------------------------------------------------------------------------
@register(
    "q312_jackknife_cv_se",
    oracle="""
WITH daily AS (
    SELECT event_type,
           CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
           CAST(SUM(CAST(ROUND(100.0 * value) AS BIGINT)) // COUNT(*)
                AS BIGINT) AS x
    FROM events GROUP BY 1, 2
),
stats AS (
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS s,
           CAST(SUM(x * x) AS BIGINT) AS ss
    FROM daily GROUP BY event_type
),
loo AS (
    SELECT d.event_type, t.n,
           CAST(ROUND(100000000.0
                * SQRT(((t.ss - d.x * d.x)
                        - CAST(t.s - d.x AS DOUBLE) * (t.s - d.x) / (t.n - 1))
                       / (t.n - 2))
                / (CAST(t.s - d.x AS DOUBLE) / (t.n - 1))) AS BIGINT) AS cvi
    FROM daily d JOIN stats t ON t.event_type = d.event_type
),
jack AS (
    SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
           CAST(SUM(cvi) AS BIGINT) AS sc,
           CAST(SUM(cvi * cvi) AS BIGINT) AS scc
    FROM loo GROUP BY event_type
)
SELECT j.event_type, j.n,
       ROUND(SQRT((CAST(t.ss AS DOUBLE) - CAST(t.s AS DOUBLE) * t.s / t.n)
                  / (t.n - 1))
             / (CAST(t.s AS DOUBLE) / t.n), 4) AS cv,
       ROUND(SQRT(CAST(j.n - 1 AS DOUBLE) / j.n
                  * (j.scc - CAST(j.sc AS DOUBLE) * j.sc / j.n))
             / 100000000.0, 4) AS jackknife_se
FROM jack j JOIN stats t ON t.event_type = j.event_type
ORDER BY j.event_type
""",
    tags=("robust-stats", "A12", "J14"),
)
def q312_jackknife_cv_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-day jackknife SE of the daily-mean CV:
    (event_type, n, cv, jackknife_se)."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(
        F.sum(F.round(100.0 * F.col("value")).cast("long")).alias("_s"),
        F.count(F.lit(1)).alias("_c"),
    ).select("event_type", "day", F.expr("_s div _c").cast("long").alias("x"))
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("ss"),
    )
    sm = F.col("s") - F.col("x")
    ssm = F.col("ss") - F.col("x") * F.col("x")
    cvi = F.round(
        100000000.0
        * F.sqrt(
            (ssm - sm.cast("double") * sm / (F.col("n") - 1)) / (F.col("n") - 2)
        )
        / (sm.cast("double") / (F.col("n") - 1))
    ).cast("long")
    loo = daily.join(F.broadcast(stats), "event_type").select(
        "event_type", F.col("n").alias("n"), cvi.alias("cvi")
    )
    jack = loo.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.sum("cvi").alias("sc"),
        F.sum(F.col("cvi") * F.col("cvi")).alias("scc"),
    )
    cv_full = F.sqrt(
        (F.col("ss").cast("double") - F.col("s").cast("double") * F.col("s") / F.col("n"))
        / (F.col("n") - 1)
    ) / (F.col("s").cast("double") / F.col("n"))
    se = (
        F.sqrt(
            (F.col("n") - 1).cast("double")
            / F.col("n")
            * (F.col("scc") - F.col("sc").cast("double") * F.col("sc") / F.col("n"))
        )
        / 100000000.0
    )
    return (
        jack.join(
            stats.select("event_type", F.col("s"), F.col("ss"), F.col("n").alias("n2")),
            "event_type",
        )
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.round(
                F.sqrt(
                    (
                        F.col("ss").cast("double")
                        - F.col("s").cast("double") * F.col("s") / F.col("n2")
                    )
                    / (F.col("n2") - 1)
                )
                / (F.col("s").cast("double") / F.col("n2")),
                4,
            ).alias("cv"),
            F.round(se, 4).alias("jackknife_se"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# q313 - unseen-vocabulary estimation per source: Chao1 richness
# (V + F1^2 / (2 F2)) and the Good-Turing unseen probability mass
# (P0 = F1 / N) from each source's token frequency-of-frequencies - "how
# much vocabulary does this source still hide", the coverage diagnostic
# behind crawl-more/stop decisions (complements q173 Heaps growth and
# q141 OOV, which only measure what was SEEN).
# Parity: V, F1, F2, N are exact integers from two nested keyed
# aggregates; chao1/p0 are single-expression doubles, 4dp; sources
# with F2 = 0 use the bias-corrected Chao1 form F1*(F1-1)/2 (identical
# CASE on both sides, no division by zero).
# Scale: (source, token) counts -> frequency-of-frequencies (two keyed
# aggregates with map-side partials); output is |sources| rows.
# --------------------------------------------------------------------------
@register(
    "q313_chao1_richness",
    oracle="""
WITH tok AS (
    SELECT source, UNNEST(LIST_FILTER(STRING_SPLIT(text, ' '), t -> t <> ''))
               AS tok
    FROM documents
),
tf AS (
    SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
    FROM tok GROUP BY source, tok
),
fof AS (
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS v,
           CAST(SUM(c) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
           CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
    FROM tf GROUP BY source
)
SELECT source, n AS n_tokens, v AS vocab, f1, f2,
       ROUND(v + CASE WHEN f2 > 0
                      THEN CAST(f1 AS DOUBLE) * f1 / (2.0 * f2)
                      ELSE CAST(f1 AS DOUBLE) * (f1 - 1) / 2.0 END, 4)
           AS chao1,
       ROUND(CAST(f1 AS DOUBLE) / n, 4) AS p_unseen_gt
FROM fof
ORDER BY source
""",
    tags=("text-diversity", "A5", "A12"),
)
def q313_chao1_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 vocabulary richness + Good-Turing unseen mass per source:
    (source, n_tokens, vocab, f1, f2, chao1, p_unseen_gt)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source",
        F.explode(F.filter(F.split("text", " "), lambda t: t != "")).alias(
            "tok"
        ),
    )
    tf = tok.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    fof = tf.groupBy("source").agg(
        F.count(F.lit(1)).alias("v"),
        F.sum("c").alias("n"),
        F.sum((F.col("c") == 1).cast("long")).alias("f1"),
        F.sum((F.col("c") == 2).cast("long")).alias("f2"),
    )
    chao1 = F.col("v") + F.when(
        F.col("f2") > 0,
        F.col("f1").cast("double") * F.col("f1") / (2.0 * F.col("f2")),
    ).otherwise(
        F.col("f1").cast("double") * (F.col("f1") - 1) / 2.0
    )
    return fof.select(
        "source",
        F.col("n").cast("long").alias("n_tokens"),
        F.col("v").cast("long").alias("vocab"),
        F.col("f1").cast("long").alias("f1"),
        F.col("f2").cast("long").alias("f2"),
        F.round(chao1, 4).alias("chao1"),
        F.round(F.col("f1").cast("double") / F.col("n"), 4).alias(
            "p_unseen_gt"
        ),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# q351 — exact Shapley-value channel attribution: each user's coalition
# is the SET of channels (non-purchase event types) touched before their
# first purchase (all their channels for non-converters); the coalition
# value v(S) is the observed conversion rate of users whose touched-set
# is exactly S (0 for unseen coalitions, v(∅)=0); each channel's credit
# is the exact Shapley sum φ_c = Σ_{S∌c} |S|!(u−|S|−1)!/u! · (v(S∪c)−v(S))
# over ALL 2^(u−1) coalitions. The game-theoretic attribution that q184's
# first/last/linear heuristics and q277's Markov model approximate —
# tractable exactly here because the channel universe is the event-type
# dim (u ≤ a handful), so the subset lattice is 2^u rows, not 2^users.
# Parity: coalitions are bitmasks built from a rank-indexed channel dim;
# per-coalition (users, conversions) are exact integers; factorial
# weights are exact integers ≤ u!; each Shapley term is frozen to
# round(1e8·w·Δv) before the cross-coalition sum. 4dp.
# Scale: one user-keyed aggregate builds masks (shuffle on uniform
# user_id); everything after runs on the 2^u × u lattice (≤ a few
# hundred rows) with broadcast joins. Efficiency identity Σφ = v(full)
# is asserted in tests.
# ---------------------------------------------------------------------------
@register(
    "q351_shapley_attribution",
    oracle="""
WITH fp AS (
    SELECT user_id, MIN(ts) AS fpts
    FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
touched AS (
    SELECT DISTINCT e.user_id, e.event_type AS ch,
           CASE WHEN f.user_id IS NULL THEN 0 ELSE 1 END AS conv
    FROM events e LEFT JOIN fp f ON f.user_id = e.user_id
    WHERE e.event_type <> 'purchase'
      AND (f.user_id IS NULL OR e.ts < f.fpts)
),
chan AS (
    SELECT ch, CAST(ROW_NUMBER() OVER (ORDER BY ch) - 1 AS BIGINT) AS idx
    FROM (SELECT DISTINCT ch FROM touched)
),
uu AS (SELECT CAST(COUNT(*) AS BIGINT) AS u,
              CAST(1 AS BIGINT) << COUNT(*) AS tu
       FROM chan),
umask AS (
    SELECT t.user_id, MAX(t.conv) AS conv,
           CAST(SUM(CAST(1 AS BIGINT) << c.idx) AS BIGINT) AS mask
    FROM touched t JOIN chan c ON c.ch = t.ch
    GROUP BY t.user_id
),
vm AS (
    SELECT mask, CAST(COUNT(*) AS BIGINT) AS nu,
           CAST(SUM(conv) AS BIGINT) AS nc
    FROM umask GROUP BY mask
),
masks AS (
    SELECT UNNEST(RANGE(0, (SELECT tu FROM uu))) AS m
),
terms AS (
    SELECT c.ch, c.idx,
           CAST(ROUND(100000000.0
               * (CAST(FACTORIAL(CAST(BIT_COUNT(m.m) AS INTEGER)) AS DOUBLE)
                  * FACTORIAL(CAST(u.u - BIT_COUNT(m.m) - 1 AS INTEGER))
                  / FACTORIAL(CAST(u.u AS INTEGER)))
               * (COALESCE(CAST(vc.nc AS DOUBLE) / vc.nu, 0.0)
                  - COALESCE(CAST(vs.nc AS DOUBLE) / vs.nu, 0.0)))
               AS BIGINT) AS term
    FROM masks m
    CROSS JOIN uu u
    JOIN chan c ON (m.m & (CAST(1 AS BIGINT) << c.idx)) = 0
    LEFT JOIN vm vs ON vs.mask = m.m AND m.m > 0
    LEFT JOIN vm vc ON vc.mask = m.m + (CAST(1 AS BIGINT) << c.idx)
),
touch_n AS (
    SELECT c.ch, CAST(COUNT(*) AS BIGINT) AS n_touched
    FROM umask um JOIN chan c
      ON (um.mask & (CAST(1 AS BIGINT) << c.idx)) <> 0
    GROUP BY c.ch
)
SELECT t.ch AS channel, tn.n_touched,
       ROUND(CAST(SUM(t.term) AS BIGINT) / 100000000.0, 4) AS phi
FROM terms t JOIN touch_n tn ON tn.ch = t.ch
GROUP BY t.ch, tn.n_touched
ORDER BY channel
""",
    tags=("attribution", "A12", "W2"),
)
def q351_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley channel attribution over pre-purchase touch sets:
    (channel, n_touched, phi)."""
    events = load_table(spark, sf_dir, "events")
    fp = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("fpts"))
    )
    touched = (
        events.filter(F.col("event_type") != "purchase")
        .join(fp, "user_id", "left")
        .filter(F.col("fpts").isNull() | (F.col("ts") < F.col("fpts")))
        .select(
            "user_id",
            F.col("event_type").alias("ch"),
            F.col("fpts").isNotNull().cast("long").alias("conv"),
        )
        .distinct()
    )
    # bounded dim (≤ #event types): the global rank window is fine here
    chan = (
        touched.select("ch")
        .distinct()
        .select(
            "ch",
            (F.row_number().over(Window.orderBy("ch")) - 1)
            .cast("long")
            .alias("idx"),
        )
    )
    uu = chan.agg(
        F.count(F.lit(1)).cast("long").alias("u"),
        F.expr("CAST(1 AS BIGINT) << COUNT(*)").cast("long").alias("tu"),
    )
    umask = (
        touched.join(F.broadcast(chan), "ch")
        .groupBy("user_id")
        .agg(
            F.max("conv").alias("conv"),
            F.sum(F.expr("CAST(1 AS BIGINT) << idx")).alias("mask"),
        )
    )
    vm = umask.groupBy("mask").agg(
        F.count(F.lit(1)).alias("nu"),
        F.sum("conv").cast("long").alias("nc"),
    )
    masks = uu.select(
        F.explode(F.sequence(F.lit(0).cast("long"), F.col("tu") - 1)).alias(
            "m"
        )
    )
    vs = vm.select(
        F.col("mask").alias("s_mask"),
        F.col("nu").alias("s_nu"),
        F.col("nc").alias("s_nc"),
    )
    vc = vm.select(
        F.col("mask").alias("c_mask"),
        F.col("nu").alias("c_nu"),
        F.col("nc").alias("c_nc"),
    )
    terms = (
        masks.crossJoin(F.broadcast(uu))
        .join(
            F.broadcast(chan),
            F.expr("(m & (CAST(1 AS BIGINT) << idx)) = 0"),
        )
        .join(
            F.broadcast(vs),
            (F.col("s_mask") == F.col("m")) & (F.col("m") > 0),
            "left",
        )
        .join(
            F.broadcast(vc),
            F.col("c_mask")
            == F.col("m") + F.expr("CAST(1 AS BIGINT) << idx"),
            "left",
        )
        .select(
            "ch",
            F.round(
                100000000.0
                * (
                    F.factorial(F.bit_count("m")).cast("double")
                    * F.factorial(
                        (F.col("u") - F.bit_count("m") - 1).cast("int")
                    )
                    / F.factorial(F.col("u").cast("int"))
                )
                * (
                    F.coalesce(
                        F.col("c_nc").cast("double") / F.col("c_nu"),
                        F.lit(0.0),
                    )
                    - F.coalesce(
                        F.col("s_nc").cast("double") / F.col("s_nu"),
                        F.lit(0.0),
                    )
                )
            )
            .cast("long")
            .alias("term"),
        )
    )
    touch_n = (
        umask.join(
            F.broadcast(chan),
            F.expr("(mask & (CAST(1 AS BIGINT) << idx)) <> 0"),
        )
        .groupBy("ch")
        .agg(F.count(F.lit(1)).alias("n_touched"))
    )
    return (
        terms.groupBy("ch")
        .agg(
            F.round(F.sum("term").cast("long") / 100000000.0, 4).alias("phi")
        )
        .join(F.broadcast(touch_n), "ch")
        .select(
            F.col("ch").alias("channel"),
            F.col("n_touched").cast("long").alias("n_touched"),
            "phi",
        )
        .orderBy("channel")
    )


# ---------------------------------------------------------------------------
# q355 — funnel conversion rates with Wilson 95% score intervals: per
# step (click → signup-after-first-click → purchase-after-first-signup),
# the conversion rate out of the previous step's population plus the
# Wilson lower/upper bounds — the uncertainty-aware funnel read that
# q87's point estimates and q237's bootstrap (expensive) bracket. Wilson
# is closed-form: center (p + z²/2n)/(1 + z²/n), half-width
# z·sqrt(p(1−p)/n + z²/4n²)/(1 + z²/n) at z = 1.96.
# Parity: step populations are exact integer counts from min-ts
# chaining (q201's discipline); every bound is a single double
# expression over (k, n). 4dp.
# Scale: three user-keyed min aggregates (uniform user_id shuffles) and
# 1-row count reduces; the CI algebra runs on 3 rows.
# ---------------------------------------------------------------------------
@register(
    "q355_funnel_wilson_ci",
    oracle="""
WITH c AS (
    SELECT user_id, MIN(ts) AS cts FROM events
    WHERE event_type = 'click' GROUP BY user_id
),
s AS (
    SELECT e.user_id, MIN(e.ts) AS sts
    FROM events e JOIN c ON c.user_id = e.user_id
    WHERE e.event_type = 'signup' AND e.ts > c.cts
    GROUP BY e.user_id
),
p AS (
    SELECT e.user_id, MIN(e.ts) AS pts
    FROM events e JOIN s ON s.user_id = e.user_id
    WHERE e.event_type = 'purchase' AND e.ts > s.sts
    GROUP BY e.user_id
),
tot AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n0 FROM events),
steps AS (
    SELECT 1 AS step, 'click' AS name,
           (SELECT n0 FROM tot) AS n,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS k
    UNION ALL
    SELECT 2, 'signup_after_click',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM c),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM s)
    UNION ALL
    SELECT 3, 'purchase_after_signup',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM s),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM p)
)
SELECT CAST(step AS BIGINT) AS step, name, n, k,
       ROUND(CAST(k AS DOUBLE) / n, 4) AS rate,
       ROUND(((CAST(k AS DOUBLE) / n + 1.96 * 1.96 / (2.0 * n))
              - 1.96 * SQRT((CAST(k AS DOUBLE) / n)
                            * (1.0 - CAST(k AS DOUBLE) / n) / n
                            + 1.96 * 1.96 / (4.0 * n * n)))
             / (1.0 + 1.96 * 1.96 / n), 4) AS wilson_lo,
       ROUND(((CAST(k AS DOUBLE) / n + 1.96 * 1.96 / (2.0 * n))
              + 1.96 * SQRT((CAST(k AS DOUBLE) / n)
                            * (1.0 - CAST(k AS DOUBLE) / n) / n
                            + 1.96 * 1.96 / (4.0 * n * n)))
             / (1.0 + 1.96 * 1.96 / n), 4) AS wilson_hi
FROM steps ORDER BY step
""",
    tags=("attribution", "inferential", "A2"),
)
def q355_funnel_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel step conversions with Wilson 95% intervals:
    (step, name, n, k, rate, wilson_lo, wilson_hi)."""
    events = load_table(spark, sf_dir, "events")
    c = (
        events.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("cts"))
    )
    s = (
        events.filter(F.col("event_type") == "signup")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("cts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("sts"))
    )
    p = (
        events.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("sts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("pts"))
    )
    n0 = events.agg(F.countDistinct("user_id").alias("n0"))
    nc = c.agg(F.count(F.lit(1)).alias("nc"))
    ns = s.agg(F.count(F.lit(1)).alias("ns"))
    np_ = p.agg(F.count(F.lit(1)).alias("np"))
    base = (
        n0.crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(ns))
        .crossJoin(F.broadcast(np_))
    )
    steps = (
        base.select(
            F.lit(1).cast("long").alias("step"),
            F.lit("click").alias("name"),
            F.col("n0").cast("long").alias("n"),
            F.col("nc").cast("long").alias("k"),
        )
        .unionByName(
            base.select(
                F.lit(2).cast("long").alias("step"),
                F.lit("signup_after_click").alias("name"),
                F.col("nc").cast("long").alias("n"),
                F.col("ns").cast("long").alias("k"),
            )
        )
        .unionByName(
            base.select(
                F.lit(3).cast("long").alias("step"),
                F.lit("purchase_after_signup").alias("name"),
                F.col("ns").cast("long").alias("n"),
                F.col("np").cast("long").alias("k"),
            )
        )
    )
    z = F.lit(1.96)
    pr = F.col("k").cast("double") / F.col("n")
    center = pr + z * z / (2.0 * F.col("n"))
    half = z * F.sqrt(
        pr * (F.lit(1.0) - pr) / F.col("n")
        + z * z / (4.0 * F.col("n") * F.col("n"))
    )
    denom = F.lit(1.0) + z * z / F.col("n")
    return steps.select(
        "step",
        "name",
        "n",
        "k",
        F.round(pr, 4).alias("rate"),
        F.round((center - half) / denom, 4).alias("wilson_lo"),
        F.round((center + half) / denom, 4).alias("wilson_hi"),
    ).orderBy("step")


# ---------------------------------------------------------------------------
# q358 — stream-stream LEFT OUTER interval join EXECUTED AS A STREAM
# (q67's inner join answers "which errors had a nearby click"; this one
# also answers "which errors had NONE" — the alerting shape). Unmatched
# rows are only emitted once the watermark passes l_ts + window and join
# state is evicted, and under availableNow rows younger than the final
# watermark never emit — so the DECLARED relation post-filters unmatched
# rows to the provably-flushed region l_ts + 600s ≤ W − 1h, where
# W = min(max error ts, max click ts) − 2h. The 1-hour margin keeps the
# declared boundary strictly inside Spark's eviction boundary, so the
# engine's internal >-vs-≥ eviction detail can never surface (empirical
# check: at sf0.001 the stream emits exactly the batch-flushed set).
# Parity: the batch oracle replicates the join and the same W cutoff on
# raw µs timestamps; outputs truncate to seconds; matched flag integer.
# Scale: watermark bounds join state to ±window + delay per user; the
# post-filter is a broadcast of a 1-row aggregate.
# ---------------------------------------------------------------------------
@register(
    "q358_streaming_outer_join",
    oracle="""
WITH l AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
),
r AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
m AS (
    SELECT l.event_id, l.user_id, l.ts, r.ts AS matched_ts
    FROM l JOIN r ON r.user_id = l.user_id
       AND r.ts BETWEEN l.ts - INTERVAL 600 SECONDS
                    AND l.ts + INTERVAL 600 SECONDS
),
wm AS (
    SELECT LEAST((SELECT MAX(ts) FROM l), (SELECT MAX(ts) FROM r))
           - INTERVAL 2 HOURS - INTERVAL 1 HOUR AS w
)
SELECT event_id, user_id, DATE_TRUNC('second', ts) AS ts,
       DATE_TRUNC('second', matched_ts) AS matched_ts,
       CAST(1 AS BIGINT) AS matched
FROM m
UNION ALL
SELECT l.event_id, l.user_id, DATE_TRUNC('second', l.ts) AS ts,
       NULL AS matched_ts, CAST(0 AS BIGINT) AS matched
FROM l CROSS JOIN wm
WHERE l.event_id NOT IN (SELECT event_id FROM m)
  AND l.ts + INTERVAL 600 SECONDS <= wm.w
""",
    tags=("streaming-interval-join", "J8"),
)
def q358_streaming_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer stream-stream interval join with a watermark-safe
    declared region: (event_id, user_id, ts, matched_ts, matched)."""
    from ..streaming import events as se

    stream = se.read_events_stream(spark, sf_dir)
    out = se.run_available_now(
        se.interval_join_outer(stream, "error", "click", window_sec=600),
        "q358_sink",
    )
    batch = load_table(spark, sf_dir, "events")
    wm = (
        batch.filter(F.col("event_type") == "error")
        .agg(F.max("ts").alias("ml"))
        .crossJoin(
            batch.filter(F.col("event_type") == "click").agg(
                F.max("ts").alias("mr")
            )
        )
        .select(
            (
                F.least("ml", "mr") - F.expr("INTERVAL 3 HOURS")
            ).alias("w")
        )
    )
    return out.crossJoin(F.broadcast(wm)).filter(
        F.col("matched_ts").isNotNull()
        | (F.col("ts") + F.expr("INTERVAL 600 SECONDS") <= F.col("w"))
    ).select(
        "event_id",
        "user_id",
        F.date_trunc("second", "ts").alias("ts"),
        F.date_trunc("second", "matched_ts").alias("matched_ts"),
        F.col("matched_ts").isNotNull().cast("long").alias("matched"),
    )


# ---------------------------------------------------------------------------
# q374 — session-gap parameter sweep: sessionize every user's event
# stream under FOUR candidate inactivity gaps (60s, 300s, 1800s, 7200s)
# in one job and report, per gap, the session count, mean events per
# session, and the median/max session duration — the relation consulted
# before committing q22/q134's 30-minute constant ("how sensitive is our
# session definition to the gap"). Sessions per gap: a session starts
# where the same-user inter-event delta exceeds the gap; the session id
# is the running count of starts (q189's islands construction,
# parameterized).
# Parity: timestamps reduce to exact epoch seconds; deltas/flags/ids are
# integer window algebra; durations are integer seconds; the median of
# integers is an exact multiple of 0.5 on both engines. 4dp.
# Scale: one 4× gap explode of the events relation; all windows
# partition by (gap, user) — uniform keys, never global; per-session
# reduce is keyed by (gap, user, session).
# ---------------------------------------------------------------------------
_GAPS = (60, 300, 1800, 7200)


@register(
    "q374_session_gap_sweep",
    oracle=f"""
WITH ev AS (
    SELECT user_id,
           CAST(FLOOR(EPOCH(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec
    FROM events
),
g AS (
    SELECT e.user_id, e.sec, gap.gap
    FROM ev e CROSS JOIN (SELECT UNNEST([{", ".join(str(g) for g in _GAPS)}]) AS gap) gap
),
flagged AS (
    SELECT user_id, gap, sec,
           CASE WHEN sec - LAG(sec) OVER (PARTITION BY gap, user_id
                                          ORDER BY sec) > gap
                     OR LAG(sec) OVER (PARTITION BY gap, user_id
                                       ORDER BY sec) IS NULL
                THEN 1 ELSE 0 END AS start
    FROM g
),
sess AS (
    SELECT user_id, gap, sec,
           CAST(SUM(start) OVER (PARTITION BY gap, user_id ORDER BY sec
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
    FROM flagged
),
per_sess AS (
    SELECT gap, user_id, sid, CAST(COUNT(*) AS BIGINT) AS n_ev,
           CAST(MAX(sec) - MIN(sec) AS BIGINT) AS dur
    FROM sess GROUP BY gap, user_id, sid
)
SELECT CAST(gap AS BIGINT) AS gap_sec,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       ROUND(CAST(SUM(n_ev) AS DOUBLE) / COUNT(*), 4) AS mean_events,
       ROUND(QUANTILE_CONT(CAST(dur AS DOUBLE), 0.5), 4)
           AS p50_duration_sec,
       CAST(MAX(dur) AS BIGINT) AS max_duration_sec
FROM per_sess GROUP BY gap ORDER BY gap_sec
""",
    tags=("sessionization", "capacity", "W2"),
)
def q374_session_gap_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session statistics under four candidate inactivity gaps:
    (gap_sec, n_sessions, mean_events, p50_duration_sec,
    max_duration_sec)."""
    events = load_table(spark, sf_dir, "events")
    ev = events.select(
        "user_id", F.unix_timestamp("ts").alias("sec")
    )
    g = ev.select(
        "user_id",
        "sec",
        F.explode(F.array(*[F.lit(x) for x in _GAPS])).alias("gap"),
    )
    w = Window.partitionBy("gap", "user_id").orderBy("sec")
    flagged = g.select(
        "user_id",
        "gap",
        "sec",
        F.when(
            (F.col("sec") - F.lag("sec").over(w) > F.col("gap"))
            | F.lag("sec").over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("start"),
    )
    sess = flagged.select(
        "user_id",
        "gap",
        "sec",
        F.sum("start")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("sid"),
    )
    per_sess = sess.groupBy("gap", "user_id", "sid").agg(
        F.count(F.lit(1)).alias("n_ev"),
        (F.max("sec") - F.min("sec")).cast("long").alias("dur"),
    )
    return (
        per_sess.groupBy("gap")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.round(
                F.sum("n_ev").cast("double") / F.count(F.lit(1)), 4
            ).alias("mean_events"),
            F.round(
                F.expr("percentile(CAST(dur AS DOUBLE), 0.5)"), 4
            ).alias("p50_duration_sec"),
            F.max("dur").cast("long").alias("max_duration_sec"),
        )
        .select(
            F.col("gap").cast("long").alias("gap_sec"),
            F.col("n_sessions").cast("long").alias("n_sessions"),
            "mean_events",
            "p50_duration_sec",
            "max_duration_sec",
        )
        .orderBy("gap_sec")
    )


# ---------------------------------------------------------------------------
# q376 — frequent itemsets via distributed FP-Growth (spark.ml): baskets
# are each user-day's distinct event-type set; report every itemset of
# size ≥ 2 with support ≥ 5% of baskets. FP-Growth's OUTPUT is an exact
# function of (baskets, minSupport) — the algorithm is approximate in
# nothing — so unlike the gradient-descent models (q41, rows-only) this
# MLlib pipeline hash-matches a pure-SQL oracle: with the item universe
# being the bounded event-type dim, the oracle enumerates all subsets
# via the q351 bitmask lattice and counts basket containment directly.
# Parity: itemsets are canonicalized to a sorted comma-joined string;
# supports are exact integer counts. 4dp rate.
# Scale: FP-Growth shards baskets and mines conditional FP-trees per
# partition (the parallel-FP design) — no candidate-generation blowup;
# basket building is one (user, day) distinct + collect_set keyed by
# uniform user-day keys.
# ---------------------------------------------------------------------------
_FPG_MINSUP = 0.05


@register(
    "q376_fpgrowth_itemsets",
    oracle=f"""
WITH items AS (
    SELECT DISTINCT user_id,
           CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
           event_type
    FROM events
),
chan AS (
    SELECT event_type,
           CAST(ROW_NUMBER() OVER (ORDER BY event_type) - 1 AS BIGINT)
               AS idx
    FROM (SELECT DISTINCT event_type FROM items)
),
baskets AS (
    SELECT i.user_id, i.day,
           CAST(SUM(CAST(1 AS BIGINT) << c.idx) AS BIGINT) AS mask
    FROM items i JOIN chan c ON c.event_type = i.event_type
    GROUP BY i.user_id, i.day
),
nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM baskets),
uu AS (SELECT CAST(1 AS BIGINT) << COUNT(*) AS tu FROM chan),
masks AS (SELECT UNNEST(RANGE(1, (SELECT tu FROM uu))) AS m),
sup AS (
    SELECT m.m, CAST(COUNT(*) AS BIGINT) AS sup
    FROM masks m JOIN baskets b ON (b.mask & m.m) = m.m
    GROUP BY m.m
),
named AS (
    SELECT s.m, s.sup,
           STRING_AGG(c.event_type, ',' ORDER BY c.event_type) AS itemset,
           CAST(COUNT(*) AS BIGINT) AS sz
    FROM sup s JOIN chan c ON (s.m & (CAST(1 AS BIGINT) << c.idx)) <> 0
    GROUP BY s.m, s.sup
)
SELECT n.itemset, n.sz AS n_items, n.sup AS support,
       ROUND(CAST(n.sup AS DOUBLE) / b.n, 4) AS support_rate
FROM named n CROSS JOIN nb b
WHERE n.sz >= 2 AND CAST(n.sup AS DOUBLE) / b.n >= {_FPG_MINSUP}
ORDER BY itemset
""",
    tags=("ml-prep", "A4", "A5"),
)
def q376_fpgrowth_itemsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent event-type itemsets (size ≥ 2, support ≥ 5%) mined with
    spark.ml FP-Growth over user-day baskets:
    (itemset, n_items, support, support_rate)."""
    from pyspark.ml.fpm import FPGrowth

    events = load_table(spark, sf_dir, "events")
    baskets = (
        events.select(
            "user_id",
            F.date_trunc("day", "ts").cast("date").alias("day"),
            "event_type",
        )
        .distinct()
        .groupBy("user_id", "day")
        .agg(F.collect_set("event_type").alias("items"))
    )
    nb = baskets.count()
    model = FPGrowth(
        itemsCol="items", minSupport=_FPG_MINSUP, minConfidence=0.1
    ).fit(baskets)
    freq = model.freqItemsets  # (items array<string>, freq long)
    return (
        freq.filter(F.size("items") >= 2)
        .select(
            F.array_join(F.array_sort("items"), ",").alias("itemset"),
            F.size("items").cast("long").alias("n_items"),
            F.col("freq").cast("long").alias("support"),
            F.round(F.col("freq").cast("double") / nb, 4).alias(
                "support_rate"
            ),
        )
        .orderBy("itemset")
    )


# ---------------------------------------------------------------------------
# q375 — ALS implicit-feedback recommender (spark.ml): factorize the
# customer × part purchase-count matrix (rank 8, implicitPrefs, fixed
# seed) and emit each customer's top-2 parts by predicted preference,
# excluding parts already purchased (the part dim is large, so unseen
# items exist at every SF — an event-type item dim saturates). Covers the
# distributed-recommender surface next to the item-item CF twin (q255,
# relational cosine): ALS is the shape that survives when the item dim
# stops being enumerable. ROWS-ONLY by design (q41's contract): least-
# squares factor values depend on float reduction order across
# partitions, so exact values are not engine-portable — the pytest
# floor pins schema, coverage, exclusion, and recommendation sanity
# instead.
# Scale: ALS shuffles by user/item blocks (the standard block
# factorization); recommendForAllUsers is a rank-4 broadcast matmul —
# item dim is tiny here, user dim shards.
# ---------------------------------------------------------------------------
@register(
    "q375_als_recommend",
    oracle=None,  # non-portable float fixpoint — rows-only by design
    tags=("ml-recsys", "iterative"),
)
def q375_als_recommend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 unseen part recommendations per customer from implicit ALS
    over order history: (c_custkey, l_partkey, rank)."""
    from pyspark.ml.recommendation import ALS

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    inter = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("o_custkey").cast("int").alias("cust"),
            F.col("l_partkey").cast("int").alias("part"),
        )
        .agg(F.count(F.lit(1)).cast("float").alias("strength"))
    )
    als = ALS(
        rank=8,
        maxIter=5,
        seed=7,
        implicitPrefs=True,
        userCol="cust",
        itemCol="part",
        ratingCol="strength",
        coldStartStrategy="drop",
    )
    model = als.fit(inter)
    recs = model.recommendForAllUsers(10).select(
        "cust", F.explode("recommendations").alias("r")
    ).select("cust", F.col("r.part").alias("part"))
    seen = inter.select("cust", "part")
    unseen = recs.join(seen, ["cust", "part"], "left_anti")
    w = Window.partitionBy("cust").orderBy("part")
    # rank by part id among the ALS-surfaced unseen items: the SET of
    # surfaced items is stable far beyond their float scores, and a
    # deterministic secondary order keeps the rows-only check stable
    # across runs of the same build.
    return (
        unseen.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 2)
        .select(
            F.col("cust").cast("long").alias("c_custkey"),
            F.col("part").cast("long").alias("l_partkey"),
            F.col("rank").cast("long").alias("rank"),
        )
        .orderBy("c_custkey", "rank")
    )


# ---------------------------------------------------------------------------
# q377 — DYNAMIC-gap session windows EXECUTED AS A STREAM: error events
# cool off in 5 minutes, everything else keeps q134's 30-minute gap
# (session_window with a gap EXPRESSION — the Spark 3.2+ feature q134's
# static form can't express). The oracle is the running-max islands
# construction: an event starts a new session iff its ts reaches the
# MAX end (ts_i + gap_i) of all earlier events in the user's stream —
# a LAG against just the previous row is wrong once a long-gap event
# can outlast several short-gap successors. Session end = max per-event
# end. Equal-ts events always co-session (every window end exceeds its
# own ts), so tie order cannot move the partition.
# Parity: gaps are exact second constants; boundaries are integer
# timestamp comparisons; value sums rounded 4dp.
# Scale: streaming state is bounded by the watermark; the batch oracle
# is one user-partitioned running-max window — uniform keys.
# ---------------------------------------------------------------------------
@register(
    "q377_streaming_dynamic_session",
    oracle="""
WITH gapped AS (
    SELECT user_id, ts, value,
           CASE WHEN event_type = 'error' THEN 300 ELSE 1800 END AS gap
    FROM events
),
walled AS (
    SELECT user_id, ts, value, gap,
           MAX(ts + gap * INTERVAL 1 SECOND) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ) AS prev_wall
    FROM gapped
),
flagged AS (
    SELECT user_id, ts, value, gap,
           CASE WHEN prev_wall IS NULL OR ts >= prev_wall
                THEN 1 ELSE 0 END AS new_s
    FROM walled
),
sess AS (
    SELECT user_id, ts, value, gap,
           CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
    FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts + gap * INTERVAL 1 SECOND) AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 4) AS total_value
FROM sess GROUP BY user_id, sid
""",
    tags=("streaming-session", "W2"),
)
def q377_streaming_dynamic_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-gap session windows run as a stream:
    (user_id, session_start, session_end, n_events, total_value)."""
    from ..streaming import events as se

    stream = se.read_events_stream(spark, sf_dir)
    return se.run_available_now(
        se.session_windows_dynamic(stream),
        "q377_sink",
        output_mode="complete",
    )


# ---------------------------------------------------------------------------
# q384 — event-sequence sanity audit: per ordering rule, how many users
# violate it — purchase before ever clicking, signup after already
# purchasing, error-only activity, purchase without any view. The
# event-log DQ gate that catches instrumentation bugs (a funnel read
# like q87/q355 silently absorbs these; this surfaces them) — the
# sequence-level complement of q96's row-level audit.
# Parity: per-user min timestamps and type sets are exact aggregates;
# every rule is a boolean over them; counts exact, rates 4dp.
# Scale: ONE user-keyed conditional aggregate computes all per-user
# min-ts/type facts; the four rules evaluate on that relation; output
# unpivots from a 1-row total.
# ---------------------------------------------------------------------------
@register(
    "q384_sequence_sanity",
    oracle="""
WITH per_user AS (
    SELECT user_id,
           MIN(CASE WHEN event_type = 'click' THEN ts END) AS c0,
           MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS p0,
           MIN(CASE WHEN event_type = 'signup' THEN ts END) AS s0,
           MIN(CASE WHEN event_type = 'view' THEN ts END) AS v0,
           CAST(COUNT(*) AS BIGINT) AS n_ev,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_err
    FROM events GROUP BY user_id
),
tot AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN p0 IS NOT NULL
                          AND (c0 IS NULL OR p0 < c0)
                     THEN 1 ELSE 0 END) AS BIGINT) AS v_pbc,
           CAST(SUM(CASE WHEN s0 IS NOT NULL AND p0 IS NOT NULL
                          AND s0 > p0
                     THEN 1 ELSE 0 END) AS BIGINT) AS v_sap,
           CAST(SUM(CASE WHEN n_err = n_ev THEN 1 ELSE 0 END) AS BIGINT)
               AS v_eo,
           CAST(SUM(CASE WHEN p0 IS NOT NULL AND v0 IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS v_pwv
    FROM per_user
)
SELECT r.rule, r.n_violations, t.n_users,
       ROUND(CAST(r.n_violations AS DOUBLE) / t.n_users, 4) AS rate
FROM tot t,
LATERAL (
    SELECT 'purchase_before_click' AS rule, t.v_pbc AS n_violations
    UNION ALL SELECT 'signup_after_purchase', t.v_sap
    UNION ALL SELECT 'error_only_user', t.v_eo
    UNION ALL SELECT 'purchase_without_view', t.v_pwv
) r
ORDER BY rule
""",
    tags=("quality", "P1", "A2"),
)
def q384_sequence_sanity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordering-rule violation counts over user event sequences:
    (rule, n_violations, n_users, rate)."""
    events = load_table(spark, sf_dir, "events")
    per_user = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias(
            "c0"
        ),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("p0"),
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "s0"
        ),
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "v0"
        ),
        F.count(F.lit(1)).alias("n_ev"),
        F.sum(
            (F.col("event_type") == "error").cast("long")
        ).alias("n_err"),
    )
    tot = per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(
            (
                F.col("p0").isNotNull()
                & (F.col("c0").isNull() | (F.col("p0") < F.col("c0")))
            ).cast("long")
        ).alias("v_pbc"),
        F.sum(
            (
                F.col("s0").isNotNull()
                & F.col("p0").isNotNull()
                & (F.col("s0") > F.col("p0"))
            ).cast("long")
        ).alias("v_sap"),
        F.sum((F.col("n_err") == F.col("n_ev")).cast("long")).alias(
            "v_eo"
        ),
        F.sum(
            (F.col("p0").isNotNull() & F.col("v0").isNull()).cast("long")
        ).alias("v_pwv"),
    )
    out = None
    for rule, col in (
        ("purchase_before_click", "v_pbc"),
        ("signup_after_purchase", "v_sap"),
        ("error_only_user", "v_eo"),
        ("purchase_without_view", "v_pwv"),
    ):
        r = tot.select(
            F.lit(rule).alias("rule"),
            F.col(col).cast("long").alias("n_violations"),
            F.col("n_users").cast("long").alias("n_users"),
            F.round(
                F.col(col).cast("double") / F.col("n_users"), 4
            ).alias("rate"),
        )
        out = r if out is None else out.unionByName(r)
    return out.orderBy("rule")


# ---------------------------------------------------------------------------
# q385 — LTV cohort curves: users are cohorted by first-activity week;
# per (cohort, weeks-since-first-activity), the cumulative purchase
# value PER COHORT USER — the lifetime-value read that q88's retention
# (activity yes/no) doesn't price. Ages with no purchases still emit
# (zero increment) via the cohort × age grid so every curve is complete
# and monotone.
# Parity: cohort/age are integer week arithmetic on epoch days; values
# are frozen to cents per event and integer-summed; the running
# cumulative is a cohort-partitioned ordered window over the bounded
# age range; per-user normalization is one double. 4dp.
# Scale: one user-keyed min aggregate (cohort assignment, broadcast
# back), one (cohort, age) keyed aggregate, windows partitioned by
# cohort over calendar-bounded ages.
# ---------------------------------------------------------------------------
@register(
    "q385_ltv_cohort",
    oracle="""
WITH firsts AS (
    SELECT user_id, MIN(CAST(FLOOR(EPOCH(CAST(ts AS TIMESTAMP))
                                   / 604800) AS BIGINT)) AS cw
    FROM events GROUP BY user_id
),
cohort_n AS (
    SELECT cw, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM firsts GROUP BY cw
),
purchases AS (
    SELECT f.cw,
           CAST(FLOOR(EPOCH(CAST(e.ts AS TIMESTAMP)) / 604800) AS BIGINT)
               - f.cw AS age_w,
           CAST(ROUND(100.0 * e.value) AS BIGINT) AS cents
    FROM events e JOIN firsts f ON f.user_id = e.user_id
    WHERE e.event_type = 'purchase'
),
ages AS (SELECT DISTINCT age_w FROM purchases
         UNION SELECT 0 AS age_w),
grid AS (
    SELECT c.cw, a.age_w FROM cohort_n c CROSS JOIN ages a
),
inc AS (
    SELECT g.cw, g.age_w,
           CAST(COALESCE(SUM(p.cents), 0) AS BIGINT) AS cents
    FROM grid g
    LEFT JOIN purchases p ON p.cw = g.cw AND p.age_w = g.age_w
    GROUP BY g.cw, g.age_w
),
cum AS (
    SELECT cw, age_w,
           CAST(SUM(cents) OVER (PARTITION BY cw ORDER BY age_w
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
    FROM inc
)
SELECT c.cw - (SELECT MIN(cw) FROM cohort_n) AS cohort,
       c.age_w AS age_weeks, n.n_users,
       ROUND(c.cum_cents / 100.0, 4) AS cum_value,
       ROUND(c.cum_cents / 100.0 / n.n_users, 4) AS ltv_per_user
FROM cum c JOIN cohort_n n ON n.cw = c.cw
WHERE c.age_w >= 0
ORDER BY cohort, age_weeks
""",
    tags=("analytics", "A2", "W2"),
)
def q385_ltv_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative purchase value per cohort user by age week:
    (cohort, age_weeks, n_users, cum_value, ltv_per_user)."""
    events = load_table(spark, sf_dir, "events")
    week = (F.unix_timestamp("ts") / 604800).cast("long")
    firsts = events.groupBy("user_id").agg(F.min(week).alias("cw"))
    cohort_n = firsts.groupBy("cw").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .select(
            "cw",
            (week - F.col("cw")).alias("age_w"),
            F.round(100.0 * F.col("value")).cast("long").alias("cents"),
        )
    )
    ages = purchases.select("age_w").union(
        purchases.sparkSession.createDataFrame([(0,)], "age_w long")
    ).distinct()
    grid = cohort_n.select("cw").crossJoin(F.broadcast(ages))
    inc = (
        grid.join(purchases, ["cw", "age_w"], "left")
        .groupBy("cw", "age_w")
        .agg(F.coalesce(F.sum("cents"), F.lit(0)).cast("long").alias("cents"))
    )
    wc = Window.partitionBy("cw").orderBy("age_w").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = inc.select(
        "cw",
        "age_w",
        F.sum("cents").over(wc).cast("long").alias("cum_cents"),
    )
    min_cw = cohort_n.agg(F.min("cw").alias("min_cw"))
    return (
        cum.join(F.broadcast(cohort_n), "cw")
        .crossJoin(F.broadcast(min_cw))
        .filter(F.col("age_w") >= 0)
        .select(
            (F.col("cw") - F.col("min_cw")).cast("long").alias("cohort"),
            F.col("age_w").cast("long").alias("age_weeks"),
            F.col("n_users").cast("long").alias("n_users"),
            F.round(F.col("cum_cents") / 100.0, 4).alias("cum_value"),
            F.round(
                F.col("cum_cents") / 100.0 / F.col("n_users"), 4
            ).alias("ltv_per_user"),
        )
        .orderBy("cohort", "age_weeks")
    )


# ---------------------------------------------------------------------------
# q389 — stationary distribution of the user-journey Markov chain: the
# row-normalized event-type transition matrix (q154's relation), iterated
# π' = πP for 6 frozen-integer rounds from the uniform start, next to
# the EMPIRICAL long-run state mix — "where do user journeys spend their
# time at equilibrium, and does the chain model match reality". The
# dynamics companion to q154 (one-step) and q309 (entropy rate).
# Parity: transition counts are exact; each iterate freezes every
# π_j = Σ_i round(π_i·c_ij/r_i) to micro-ints before the next round
# (the q347 damped-iteration discipline, undamped here since the chain
# is finite and irreducible over observed types); the empirical mix is
# exact counts. 4dp.
# Scale: the chain lives on the bounded type dim (k ≤ a handful): the
# per-user transition extraction is the only corpus-scale pass (q154's
# lag window on uniform user keys); iterations run on k² rows.
# ---------------------------------------------------------------------------
_MSTAT_ITERS = 6


def _mstat_ctes() -> str:
    parts = [
        "pi0 AS (SELECT idx AS j, CAST(ROUND(1000000.0 / (SELECT k FROM kk))"
        " AS BIGINT) AS p FROM chan)"
    ]
    for i in range(1, _MSTAT_ITERS + 1):
        parts.append(f"""pi{i} AS (
    SELECT t.j_to AS j,
           CAST(SUM(CAST(ROUND(CAST(p.p AS DOUBLE) * t.c / t.r)
                         AS BIGINT)) AS BIGINT) AS p
    FROM trans t JOIN pi{i - 1} p ON p.j = t.j_from
    GROUP BY t.j_to
)""")
    return ",\n".join(parts)


@register(
    "q389_markov_stationary",
    oracle=f"""
WITH seq AS (
    SELECT user_id, event_type, ts, event_id,
           LEAD(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS nxt
    FROM events
),
chan AS (
    SELECT event_type AS et,
           CAST(ROW_NUMBER() OVER (ORDER BY event_type) - 1 AS BIGINT)
               AS idx
    FROM (SELECT DISTINCT event_type FROM events)
),
kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM chan),
counts AS (
    SELECT cf.idx AS j_from, ct.idx AS j_to,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM seq s
    JOIN chan cf ON cf.et = s.event_type
    JOIN chan ct ON ct.et = s.nxt
    WHERE s.nxt IS NOT NULL
    GROUP BY cf.idx, ct.idx
),
rowsum AS (
    SELECT j_from, CAST(SUM(c) AS BIGINT) AS r FROM counts GROUP BY j_from
),
trans AS (
    SELECT c.j_from, c.j_to, c.c, r.r
    FROM counts c JOIN rowsum r ON r.j_from = c.j_from
),
emp AS (
    SELECT cf.idx AS j, CAST(COUNT(*) AS BIGINT) AS n
    FROM events e JOIN chan cf ON cf.et = e.event_type
    GROUP BY cf.idx
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM emp),
{_mstat_ctes()}
SELECT ch.et AS event_type,
       ROUND(pi.p / 1000000.0, 4) AS stationary_pi,
       ROUND(CAST(e.n AS DOUBLE) / t.nn, 4) AS empirical_share,
       ROUND(ABS(pi.p / 1000000.0 - CAST(e.n AS DOUBLE) / t.nn), 4)
           AS abs_gap
FROM pi{_MSTAT_ITERS} pi
JOIN chan ch ON ch.idx = pi.j
JOIN emp e ON e.j = pi.j
CROSS JOIN tot t
ORDER BY event_type
""",
    tags=("graph", "timeseries", "A6"),
)
def q389_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six frozen power-iteration rounds of the journey transition
    matrix vs the empirical state mix:
    (event_type, stationary_pi, empirical_share, abs_gap)."""
    events = load_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type", F.lead("event_type").over(wu).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    chan = (
        events.select(F.col("event_type").alias("et"))
        .distinct()
        .select(
            "et",
            (F.row_number().over(Window.orderBy("et")) - 1)
            .cast("long")
            .alias("idx"),
        )
    )
    kk = chan.agg(F.count(F.lit(1)).alias("k"))
    counts = (
        seq.join(
            F.broadcast(chan.select(F.col("et"), F.col("idx").alias("j_from"))),
            F.col("et") == F.col("event_type"),
        )
        .drop("et")
        .join(
            F.broadcast(
                chan.select(F.col("et"), F.col("idx").alias("j_to"))
            ),
            F.col("et") == F.col("nxt"),
        )
        .groupBy("j_from", "j_to")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    rowsum = counts.groupBy("j_from").agg(F.sum("c").alias("r"))
    trans = counts.join(rowsum, "j_from")
    from ..caching import persist_tracked

    trans = persist_tracked(trans)
    pi = chan.crossJoin(F.broadcast(kk)).select(
        F.col("idx").alias("j"),
        F.round(1000000.0 / F.col("k")).cast("long").alias("p"),
    )
    for _ in range(_MSTAT_ITERS):
        pi = (
            trans.join(pi.withColumnRenamed("j", "j_from"), "j_from")
            .select(
                F.col("j_to").alias("j"),
                F.round(
                    F.col("p").cast("double") * F.col("c") / F.col("r")
                )
                .cast("long")
                .alias("contrib"),
            )
            .groupBy("j")
            .agg(F.sum("contrib").cast("long").alias("p"))
        )
    emp = (
        events.join(
            F.broadcast(chan), F.col("et") == F.col("event_type")
        )
        .groupBy(F.col("idx").alias("j"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = emp.agg(F.sum("n").alias("nn"))
    return (
        pi.join(
            F.broadcast(chan.select(F.col("idx").alias("j"), "et")), "j"
        )
        .join(F.broadcast(emp), "j")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("et").alias("event_type"),
            F.round(F.col("p") / 1000000.0, 4).alias("stationary_pi"),
            F.round(
                F.col("n").cast("double") / F.col("nn"), 4
            ).alias("empirical_share"),
            F.round(
                F.abs(
                    F.col("p") / 1000000.0
                    - F.col("n").cast("double") / F.col("nn")
                ),
                4,
            ).alias("abs_gap"),
        )
        .orderBy("event_type")
    )
