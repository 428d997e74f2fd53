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
# q430 - log-rank test between the q241 survival cohorts: do registered
# and guest users have the SAME retention curve, or is the separation
# KM plots show statistically real? The standard two-sample censored
# survival test: at every distinct churn day, compare cohort 1's
# observed churns d1 against its expectation d*n1/n under the null,
# accumulate, normalise by the hypergeometric variance. Duration/censor
# definitions are exactly q241's (first->last event, day grain, 24h
# censor window) so the two queries read as one analysis.
# Parity: the life table (n1, n2, d1, d2 per day) is exact integers;
# each day's E and V terms are micro-scaled to BIGINT before the final
# sum (the established micro-integer trick), so summation order cannot
# diverge; z is one double expression over exact integer sums.
# Scale: one user-keyed aggregate; everything after lives on the
# day-grain life table (calendar-bounded). The at-risk cumsum windows
# partition by cohort over that bounded relation - never the corpus.
# The V term is computed in doubles (n^4 would overflow BIGINT at
# billion-user scale); micro-rounding keeps it engine-exact.
# --------------------------------------------------------------------------
@register(
    "q430_logrank_test",
    oracle="""
WITH users AS (
    SELECT user_id, MIN(ts) AS first_ts, MAX(ts) AS last_ts,
           CASE WHEN SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) > 0
                THEN 'registered' ELSE 'guest' END AS cohort
    FROM events GROUP BY user_id
),
horizon AS (SELECT MAX(ts) AS max_ts FROM events),
durs AS (
    SELECT u.cohort,
           CAST(FLOOR(EPOCH(u.last_ts - u.first_ts) / 86400.0) AS BIGINT) AS dur,
           CASE WHEN u.last_ts <= h.max_ts - INTERVAL 24 HOUR
                THEN 1 ELSE 0 END AS churn
    FROM users u CROSS JOIN horizon h
),
steps AS (
    SELECT cohort, dur, CAST(COUNT(*) AS BIGINT) AS n_all,
           CAST(SUM(churn) AS BIGINT) AS d
    FROM durs GROUP BY cohort, dur
),
grid AS (
    SELECT g.dur, c.cohort
    FROM (SELECT DISTINCT dur FROM steps) g
    CROSS JOIN (SELECT DISTINCT cohort FROM steps) c
),
full_tab AS (
    SELECT g.dur, g.cohort,
           COALESCE(s.n_all, 0) AS n_all, COALESCE(s.d, 0) AS d
    FROM grid g LEFT JOIN steps s
      ON s.dur = g.dur AND s.cohort = g.cohort
),
risked AS (
    SELECT dur, cohort, d,
           SUM(n_all) OVER (PARTITION BY cohort ORDER BY dur DESC) AS at_risk
    FROM full_tab
),
perday AS (
    SELECT dur,
           SUM(CASE WHEN cohort = 'registered' THEN d ELSE 0 END) AS d1,
           SUM(d) AS d,
           SUM(CASE WHEN cohort = 'registered' THEN at_risk ELSE 0 END) AS n1,
           SUM(CASE WHEN cohort = 'guest' THEN at_risk ELSE 0 END) AS n2,
           SUM(at_risk) AS n
    FROM risked GROUP BY dur
),
terms AS (
    SELECT d1,
           CAST(ROUND(1000000.0 * d * n1 / n) AS BIGINT) AS eu,
           CAST(ROUND(1000000.0 * d * (n - d) / n * n1 / n * n2 / (n - 1))
                AS BIGINT) AS vu
    FROM perday WHERE d > 0 AND n > 1
)
SELECT CAST(SUM(d1) AS BIGINT) AS observed_1,
       ROUND(CAST(SUM(eu) AS DOUBLE) / 1000000.0, 4) AS expected_1,
       ROUND(CAST(SUM(vu) AS DOUBLE) / 1000000.0, 4) AS var_1,
       ROUND((SUM(d1) - CAST(SUM(eu) AS DOUBLE) / 1000000.0)
             / SQRT(CAST(SUM(vu) AS DOUBLE) / 1000000.0), 4) AS z_logrank
FROM terms
""",
    tags=("survival", "ab-test", "A12"),
)
def q430_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample log-rank on the q241 cohorts: (observed_1, expected_1,
    var_1, z_logrank), cohort 1 = registered."""
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
            (F.col("last_ts").cast("double") - F.col("first_ts").cast("double"))
            / 86400.0
        )
        .cast("long")
        .alias("dur"),
        (F.col("last_ts") <= F.col("max_ts") - F.expr("INTERVAL 24 HOURS"))
        .cast("long")
        .alias("churn"),
    )
    steps = durs.groupBy("cohort", "dur").agg(
        F.count(F.lit(1)).alias("n_all"), F.sum("churn").alias("d")
    )
    grid = steps.select("dur").distinct().crossJoin(
        F.broadcast(steps.select("cohort").distinct())
    )
    full_tab = grid.join(F.broadcast(steps), ["dur", "cohort"], "left").select(
        "dur",
        "cohort",
        F.coalesce("n_all", F.lit(0)).alias("n_all"),
        F.coalesce("d", F.lit(0)).alias("d"),
    )
    w_risk = Window.partitionBy("cohort").orderBy(F.desc("dur"))
    risked = full_tab.select(
        "dur", "cohort", "d", F.sum("n_all").over(w_risk).alias("at_risk")
    )
    reg = F.when(F.col("cohort") == "registered", F.col("d")).otherwise(0)
    reg_r = F.when(F.col("cohort") == "registered", F.col("at_risk")).otherwise(0)
    gst_r = F.when(F.col("cohort") == "guest", F.col("at_risk")).otherwise(0)
    perday = risked.groupBy("dur").agg(
        F.sum(reg).alias("d1"),
        F.sum("d").alias("d"),
        F.sum(reg_r).alias("n1"),
        F.sum(gst_r).alias("n2"),
        F.sum("at_risk").alias("n"),
    )
    d, n, n1, n2 = (F.col(c).cast("double") for c in ("d", "n", "n1", "n2"))
    terms = perday.filter((F.col("d") > 0) & (F.col("n") > 1)).select(
        "d1",
        F.round(1000000.0 * F.col("d") * F.col("n1") / F.col("n"))
        .cast("long")
        .alias("eu"),
        F.round(
            F.lit(1000000.0) * d * (n - d) / n * n1 / n * n2 / (n - F.lit(1.0))
        )
        .cast("long")
        .alias("vu"),
    )
    e_dbl = F.sum("eu").cast("double") / 1000000.0
    v_dbl = F.sum("vu").cast("double") / 1000000.0
    return terms.agg(
        F.sum("d1").cast("long").alias("observed_1"),
        F.round(e_dbl, 4).alias("expected_1"),
        F.round(v_dbl, 4).alias("var_1"),
        F.round((F.sum("d1") - e_dbl) / F.sqrt(v_dbl), 4).alias("z_logrank"),
    )


# --------------------------------------------------------------------------
# q442 - restricted mean survival time (RMST at tau = 30 days): the area
# under each cohort's KM curve up to 30 days - "expected days retained
# in the first month". THE recommended effect size when hazards are not
# proportional (where q430's log-rank loses power), and the third leg
# of the survival family: q241 draws the curve, q430 tests it, q442
# prices it. Day-grain life table, censoring and cohorts exactly q241's.
# Construction: survival after each churn day via the q241 micro-log
# cumsum; the step-function integral is a lag over the per-cohort churn
# days (keeping dur <= tau keeps a PREFIX of the order, so the lag is
# unaffected by the filter); each rectangle is micro-rounded to BIGINT
# before summing (order-safe); the tail rectangle uses MAX_BY.
# Scale: one user-keyed aggregate; all windows partition by cohort over
# the day-grain calendar-bounded life table, never the corpus.
# --------------------------------------------------------------------------
_RMST_TAU = 30


@register(
    "q442_rmst",
    oracle=f"""
WITH users AS (
    SELECT user_id, MIN(ts) AS first_ts, MAX(ts) AS last_ts,
           CASE WHEN SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) > 0
                THEN 'registered' ELSE 'guest' END AS cohort
    FROM events GROUP BY user_id
),
horizon AS (SELECT MAX(ts) AS max_ts FROM events),
durs AS (
    SELECT u.cohort,
           CAST(FLOOR(EPOCH(u.last_ts - u.first_ts) / 86400.0) AS BIGINT) AS dur,
           CASE WHEN u.last_ts <= h.max_ts - INTERVAL 24 HOUR
                THEN 1 ELSE 0 END AS churn
    FROM users u CROSS JOIN horizon h
),
steps AS (
    SELECT cohort, dur, CAST(COUNT(*) AS BIGINT) AS n_all,
           CAST(SUM(churn) AS BIGINT) AS d
    FROM durs GROUP BY cohort, dur
),
risked AS (
    SELECT cohort, dur, d,
           SUM(n_all) OVER (PARTITION BY cohort ORDER BY dur DESC) AS at_risk
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
),
surv AS (
    SELECT cohort, dur,
           EXP(CAST(SUM(li) OVER (PARTITION BY cohort ORDER BY dur ASC)
                    AS DOUBLE) / 1000000.0) AS s_after
    FROM logged WHERE d > 0
),
pre AS (
    SELECT cohort, dur, s_after,
           LAG(dur, 1, 0) OVER (PARTITION BY cohort ORDER BY dur) AS prev_dur,
           LAG(s_after, 1, 1.0) OVER (PARTITION BY cohort ORDER BY dur)
               AS s_prev
    FROM surv WHERE dur <= {_RMST_TAU}
),
area AS (
    SELECT cohort,
           CAST(SUM(CAST(ROUND(1000000.0 * s_prev * (dur - prev_dur))
                         AS BIGINT)) AS BIGINT) AS area_u,
           MAX_BY(s_after, dur) AS s_last,
           MAX(dur) AS last_dur
    FROM pre GROUP BY cohort
),
counts AS (SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n_users FROM users GROUP BY cohort)
SELECT a.cohort, c.n_users,
       ROUND((a.area_u
              + ROUND(1000000.0 * a.s_last * ({_RMST_TAU} - a.last_dur)))
             / 1000000.0, 4) AS rmst_30,
       ROUND(a.s_last, 4) AS surv_30
FROM area a JOIN counts c ON c.cohort = a.cohort
ORDER BY a.cohort
""",
    tags=("survival", "A12", "W2"),
)
def q442_rmst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RMST at 30 days per cohort: (cohort, n_users, rmst_30, surv_30)."""
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
            (F.col("last_ts").cast("double") - F.col("first_ts").cast("double"))
            / 86400.0
        )
        .cast("long")
        .alias("dur"),
        (F.col("last_ts") <= F.col("max_ts") - F.expr("INTERVAL 24 HOURS"))
        .cast("long")
        .alias("churn"),
    )
    steps = durs.groupBy("cohort", "dur").agg(
        F.count(F.lit(1)).alias("n_all"), F.sum("churn").alias("d")
    )
    w_desc = Window.partitionBy("cohort").orderBy(F.desc("dur"))
    risked = steps.select(
        "cohort", "dur", "d", F.sum("n_all").over(w_desc).alias("at_risk")
    )
    li = (
        F.when(F.col("d") == 0, F.lit(0))
        .when(
            F.col("d") < F.col("at_risk"),
            F.round(
                F.log(F.lit(1.0) - F.col("d").cast("double") / F.col("at_risk"))
                * 1000000.0
            ).cast("long"),
        )
        .otherwise(F.lit(-100000000))
    )
    logged = risked.select("cohort", "dur", "d", li.alias("li"))
    w_asc = Window.partitionBy("cohort").orderBy("dur")
    surv = (
        logged.filter(F.col("d") > 0)
        .select(
            "cohort",
            "dur",
            F.exp(F.sum("li").over(w_asc).cast("double") / 1000000.0).alias(
                "s_after"
            ),
        )
    )
    pre = surv.filter(F.col("dur") <= _RMST_TAU).select(
        "cohort",
        "dur",
        "s_after",
        F.lag("dur", 1, 0).over(w_asc).alias("prev_dur"),
        F.lag("s_after", 1, 1.0).over(w_asc).alias("s_prev"),
    )
    area = pre.groupBy("cohort").agg(
        F.sum(
            F.round(
                1000000.0 * F.col("s_prev") * (F.col("dur") - F.col("prev_dur"))
            ).cast("long")
        ).alias("area_u"),
        F.expr("MAX_BY(s_after, dur)").alias("s_last"),
        F.max("dur").alias("last_dur"),
    )
    counts = users.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    return (
        area.join(counts, "cohort")
        .select(
            "cohort",
            "n_users",
            F.round(
                (
                    F.col("area_u")
                    + F.round(
                        1000000.0
                        * F.col("s_last")
                        * (F.lit(_RMST_TAU) - F.col("last_dur"))
                    )
                )
                / 1000000.0,
                4,
            ).alias("rmst_30"),
            F.round("s_last", 4).alias("surv_30"),
        )
        .orderBy("cohort")
    )
