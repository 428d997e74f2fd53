"""Round-8 classical-inference wave: reliability, unit roots, robust
t-tests, hazards, shrinkage, goodness-of-fit, sequential testing.

The reference's statistics surface is score aggregation + duplicate
profiling (/root/reference/synth/etl.py:96-133, notebooks/*.ipynb); these
queries extend the engine's A12 summary-statistics family with the
classical-inference tests an analytics platform is expected to ship and
that the existing waves (q294-q456) do not yet cover: Cronbach's alpha,
the ADF unit-root test, Yuen's trimmed-mean t, the Nelson-Aalen
cumulative hazard, beta-binomial empirical-Bayes shrinkage, the two-sample
Cramer-von Mises statistic, the mSPRT always-valid p-value sequence, and
the KPSS stationarity test.

House parity discipline throughout: freeze measurements to integer
cents/micro units, accumulate EXACT integer (or DECIMAL(38,0)/HUGEINT)
moments so partitioned Spark and single-node DuckDB cannot diverge on
float summation order, then compute the statistic as ONE fixed double
expression evaluated identically by both engines, rounded 4dp.

Scale discipline: every query collapses the corpus with one keyed
map-side-combined aggregate (users / value domain / calendar days);
windows only ever run on the collapsed bounded relation (see
tests/test_plans.py BOUNDED_WINDOW_OK and SCALE.md).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..sources.readers import load_table
from .registry import register

_DEC = "decimal(38,0)"

#: The generator's closed event-type set (stable across SFs) — the "items"
#: of the reliability analysis. A literal list in BOTH engines so the
#: pivot never needs a distinct-scan.
_ITEMS = ("click", "error", "purchase", "signup", "view")


# --------------------------------------------------------------------------
# q457 - Cronbach's alpha over the per-user spend-by-event-type item
# matrix: do the five event-type "items" measure one underlying
# engagement trait? alpha = k/(k-1) * (1 - sum_i var(item_i)/var(total)).
# The internal-consistency coefficient every survey/metrics platform
# reports; complements q324 (Krippendorff, rater agreement) and q280
# (Cohen's kappa, 2-rater) with the item-reliability read.
# Parity: per-user item spends are exact integer cents; population
# variances use the n-scaled numerator n*sum(x^2) - sum(x)^2 accumulated
# in DECIMAL(38,0)/HUGEINT, and the 1/n^2 factor cancels in the ratio,
# so alpha is ONE double ratio of exact integers. 4dp.
# Scale: one user-keyed conditional aggregate (map-side combined), then
# one 1-row moment reduce. No windows, no joins.
# Headroom: per-user cents <= ~1e7 at 100 TB (1e3 events x 1e4 cents);
# x^2 <= 1e14, times 1e9 users = 1e23, times n = 1e32 < 1e38. DECIMAL(38)
# holds through the declared scale.
# --------------------------------------------------------------------------
def _q457_oracle() -> str:
    item_cols = ",\n           ".join(
        f"SUM(CASE WHEN event_type = '{it}' THEN c ELSE 0 END) AS x{i}"
        for i, it in enumerate(_ITEMS)
    )
    moments = ",\n           ".join(
        f"CAST(SUM(CAST(x{i} AS HUGEINT) * x{i}) AS HUGEINT) AS q{i},"
        f" CAST(SUM(x{i}) AS HUGEINT) AS s{i}"
        for i in range(len(_ITEMS))
    )
    item_num = " + ".join(
        f"CAST(n * q{i} - s{i} * s{i} AS DOUBLE)" for i in range(len(_ITEMS))
    )
    k = len(_ITEMS)
    return f"""
WITH per_user AS (
    SELECT user_id,
           {item_cols},
           SUM(c) AS xt
    FROM (SELECT user_id, event_type,
                 CAST(ROUND(100.0 * value) AS BIGINT) AS c
          FROM events) e
    GROUP BY user_id
),
mom AS (
    SELECT CAST(COUNT(*) AS HUGEINT) AS n,
           {moments},
           CAST(SUM(CAST(xt AS HUGEINT) * xt) AS HUGEINT) AS qt,
           CAST(SUM(xt) AS HUGEINT) AS st
    FROM per_user
)
SELECT CAST(n AS BIGINT) AS n_users,
       CAST({k} AS BIGINT) AS k_items,
       ROUND(({item_num}) / CAST(n * qt - st * st AS DOUBLE), 4)
           AS item_total_ratio,
       ROUND({k}.0 / {k - 1}.0
             * (1.0 - ({item_num}) / CAST(n * qt - st * st AS DOUBLE)), 4)
           AS alpha
FROM mom
"""


@register(
    "q457_cronbach_alpha",
    oracle=_q457_oracle(),
    tags=("A12", "reliability", "ab-test"),
)
def q457_cronbach_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cronbach's alpha of the user x event-type spend item matrix:
    (n_users, k_items, item_total_ratio, alpha)."""
    events = load_table(spark, sf_dir, "events")
    c = F.round(100.0 * F.col("value")).cast("long")
    per_user = events.groupBy("user_id").agg(
        *[
            F.sum(F.when(F.col("event_type") == it, c).otherwise(F.lit(0)))
            .alias(f"x{i}")
            for i, it in enumerate(_ITEMS)
        ],
        F.sum(c).alias("xt"),
    )
    k = len(_ITEMS)
    mom = per_user.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        *[
            F.sum(F.col(f"x{i}").cast(_DEC) * F.col(f"x{i}")).alias(f"q{i}")
            for i in range(k)
        ],
        *[F.sum(f"x{i}").cast(_DEC).alias(f"s{i}") for i in range(k)],
        F.sum(F.col("xt").cast(_DEC) * F.col("xt")).alias("qt"),
        F.sum("xt").cast(_DEC).alias("st"),
    )
    item_num = None
    for i in range(k):
        term = (
            F.col("n") * F.col(f"q{i}") - F.col(f"s{i}") * F.col(f"s{i}")
        ).cast("double")
        item_num = term if item_num is None else item_num + term
    tot_num = (F.col("n") * F.col("qt") - F.col("st") * F.col("st")).cast(
        "double"
    )
    ratio = item_num / tot_num
    return mom.select(
        F.col("n").cast("long").alias("n_users"),
        F.lit(k).cast("long").alias("k_items"),
        F.round(ratio, 4).alias("item_total_ratio"),
        F.round(float(k) / (k - 1) * (1.0 - ratio), 4).alias("alpha"),
    )


# --------------------------------------------------------------------------
# q458 - Augmented Dickey-Fuller unit-root test (constant, one lagged
# difference) on the daily event-count series: regress dy_t on
# [1, y_{t-1}, dy_{t-1}] and report gamma (the y_{t-1} coefficient) and
# its t statistic — the "is this series a random walk" gate that tells
# q341/q393/q433's forecasters whether to difference first, and the
# pre-test every cointegration / spurious-regression check starts with.
# KPSS (q464) is the complementary null (stationary vs unit root).
# Parity: q348's discipline exactly — daily counts are exact integers,
# centering uses d = n*v - S so every sufficient statistic is an exact
# integer accumulated in DECIMAL(38,0)/HUGEINT; gamma / RSS / t are one
# fixed double expression over those integers. The n-scaling cancels:
# b is scale-free, and t = b_u / sqrt(RSS_s * Svv_s / ((n-3) * den_s))
# with every _s the n^2-scaled integer. 4dp.
# Scale: one corpus aggregate to the calendar-bounded daily relation;
# lag joins and the moment reduce run on ~thousands of rows max.
# --------------------------------------------------------------------------
@register(
    "q458_adf_test",
    oracle="""
WITH daily AS (
    SELECT CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS x
    FROM events GROUP BY 1
),
ranked AS (
    SELECT x, CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t
    FROM daily
),
rows_ AS (
    SELECT a.x - b.x AS w, b.x AS u, b.x - c.x AS v
    FROM ranked a
    JOIN ranked b ON b.t = a.t - 1
    JOIN ranked c ON c.t = a.t - 2
),
raw AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(w) AS BIGINT) AS sw,
           CAST(SUM(u) AS BIGINT) AS su,
           CAST(SUM(v) AS BIGINT) AS sv
    FROM rows_
),
cent AS (
    SELECT r.n,
           CAST(SUM(CAST(r.n * x.u - r.su AS HUGEINT)
                    * CAST(r.n * x.u - r.su AS HUGEINT)) AS HUGEINT) AS suu,
           CAST(SUM(CAST(r.n * x.v - r.sv AS HUGEINT)
                    * CAST(r.n * x.v - r.sv AS HUGEINT)) AS HUGEINT) AS svv,
           CAST(SUM(CAST(r.n * x.u - r.su AS HUGEINT)
                    * CAST(r.n * x.v - r.sv AS HUGEINT)) AS HUGEINT) AS suv,
           CAST(SUM(CAST(r.n * x.w - r.sw AS HUGEINT)
                    * CAST(r.n * x.u - r.su AS HUGEINT)) AS HUGEINT) AS swu,
           CAST(SUM(CAST(r.n * x.w - r.sw AS HUGEINT)
                    * CAST(r.n * x.v - r.sv AS HUGEINT)) AS HUGEINT) AS swv,
           CAST(SUM(CAST(r.n * x.w - r.sw AS HUGEINT)
                    * CAST(r.n * x.w - r.sw AS HUGEINT)) AS HUGEINT) AS sww
    FROM rows_ x CROSS JOIN raw r
    GROUP BY r.n
),
fit AS (
    SELECT n,
           CAST(suu AS DOUBLE) AS suu, CAST(svv AS DOUBLE) AS svv,
           CAST(suv AS DOUBLE) AS suv, CAST(swu AS DOUBLE) AS swu,
           CAST(swv AS DOUBLE) AS swv, CAST(sww AS DOUBLE) AS sww
    FROM cent
)
SELECT n,
       ROUND((swu * svv - swv * suv) / (suu * svv - suv * suv), 4) AS gamma,
       ROUND((swv * suu - swu * suv) / (suu * svv - suv * suv), 4)
           AS b_dlag,
       ROUND((swu * svv - swv * suv) / (suu * svv - suv * suv)
             / SQRT((sww - (swu * (swu * svv - swv * suv)
                            + swv * (swv * suu - swu * suv))
                           / (suu * svv - suv * suv))
                    * svv / ((n - 3) * (suu * svv - suv * suv))), 4)
           AS t_adf
FROM fit
""",
    tags=("timeseries", "A12"),
)
def q458_adf_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADF unit-root test (constant, 1 lagged diff) on daily event
    counts: (n, gamma, b_dlag, t_adf)."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("x"))
    ranked = daily.select(
        "x", F.row_number().over(Window.orderBy("day")).alias("t")
    )
    a = ranked.select(F.col("t").alias("ta"), F.col("x").alias("xa"))
    b = ranked.select(F.col("t").alias("tb"), F.col("x").alias("xb"))
    c = ranked.select(F.col("t").alias("tc"), F.col("x").alias("xc"))
    rows = (
        a.join(b, F.col("tb") == F.col("ta") - 1)
        .join(c, F.col("tc") == F.col("ta") - 2)
        .select(
            (F.col("xa") - F.col("xb")).alias("w"),
            F.col("xb").alias("u"),
            (F.col("xb") - F.col("xc")).alias("v"),
        )
    )
    raw = rows.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("w").alias("sw"),
        F.sum("u").alias("su"),
        F.sum("v").alias("sv"),
    )
    u = (F.col("n") * F.col("u") - F.col("su")).cast(_DEC)
    v = (F.col("n") * F.col("v") - F.col("sv")).cast(_DEC)
    w = (F.col("n") * F.col("w") - F.col("sw")).cast(_DEC)
    cent = (
        rows.crossJoin(F.broadcast(raw))
        .groupBy("n")
        .agg(
            F.sum(u * u).alias("suu"),
            F.sum(v * v).alias("svv"),
            F.sum(u * v).alias("suv"),
            F.sum(w * u).alias("swu"),
            F.sum(w * v).alias("swv"),
            F.sum(w * w).alias("sww"),
        )
    )
    suu, svv, suv = (
        F.col("suu").cast("double"),
        F.col("svv").cast("double"),
        F.col("suv").cast("double"),
    )
    swu, swv, sww = (
        F.col("swu").cast("double"),
        F.col("swv").cast("double"),
        F.col("sww").cast("double"),
    )
    den = suu * svv - suv * suv
    gamma = (swu * svv - swv * suv) / den
    b_dlag = (swv * suu - swu * suv) / den
    rss = sww - (swu * (swu * svv - swv * suv)
                 + swv * (swv * suu - swu * suv)) / den
    t_adf = gamma / F.sqrt(rss * svv / ((F.col("n") - 3) * den))
    return cent.select(
        F.col("n").cast("long").alias("n"),
        F.round(gamma, 4).alias("gamma"),
        F.round(b_dlag, 4).alias("b_dlag"),
        F.round(t_adf, 4).alias("t_adf"),
    )


# --------------------------------------------------------------------------
# q459 - Yuen's trimmed-mean t-test (20% trim) comparing weekend vs
# weekday purchase values: trimmed means + winsorized variances, the
# outlier-robust alternative to q175's z/t that stays valid under the
# heavy-tailed spend distributions q387/q440 document. Trimming runs in
# the FREQUENCY DOMAIN: collapse to (group, cent-value, count), cumulate
# over the bounded value domain, and compute each value's surviving
# multiplicity with rank clamps — never a corpus-wide sort.
# Parity: kept counts, trimmed sums, winsorized sums/squares are exact
# integers (q318's domain-collapse discipline); t and the Welch-
# Satterthwaite df are one double expression. 4dp.
# Scale: one (group, value) aggregate; the cumulative window runs on
# the bounded distinct-cents domain (q283's audited class).
# Headroom: win_ss <= n * max_cents^2 = 1e12 * 1e10 = 1e22 -> DECIMAL(38)
# (HUGEINT) accumulators on the squared sums.
# --------------------------------------------------------------------------
@register(
    "q459_yuen_trimmed_t",
    oracle="""
WITH base AS (
    SELECT CASE WHEN (CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 86400 + 3) % 7 >= 5
                THEN 'weekend' ELSE 'weekday' END AS g,
           CAST(ROUND(100.0 * value) AS BIGINT) AS v
    FROM events WHERE event_type = 'purchase'
),
freq AS (
    SELECT g, v, CAST(COUNT(*) AS BIGINT) AS c FROM base GROUP BY g, v
),
cum AS (
    SELECT g, v, c,
           CAST(COALESCE(SUM(c) OVER (PARTITION BY g ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS below,
           CAST(SUM(c) OVER (PARTITION BY g ORDER BY v
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS upto
    FROM freq
),
sizes AS (
    SELECT g, CAST(SUM(c) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) // 5 AS k
    FROM freq GROUP BY g
),
bounds AS (
    SELECT c.g,
           MAX(CASE WHEN c.below <= s.k AND s.k < c.upto THEN c.v END) AS lo,
           MAX(CASE WHEN c.below <= s.n - s.k - 1 AND s.n - s.k - 1 < c.upto
                    THEN c.v END) AS hi
    FROM cum c JOIN sizes s ON s.g = c.g
    GROUP BY c.g
),
gstat AS (
    SELECT c.g, s.n, s.k, s.n - 2 * s.k AS h, b.lo, b.hi,
           CAST(SUM(c.v * GREATEST(CAST(0 AS BIGINT),
                    LEAST(c.upto, s.n - s.k) - GREATEST(c.below, s.k)))
                AS BIGINT) AS trim_sum,
           CAST(SUM(CAST(c.v AS HUGEINT) * c.v
                    * GREATEST(CAST(0 AS BIGINT),
                      LEAST(c.upto, s.n - s.k) - GREATEST(c.below, s.k)))
                AS HUGEINT) AS trim_ss
    FROM cum c JOIN sizes s ON s.g = c.g JOIN bounds b ON b.g = c.g
    GROUP BY c.g, s.n, s.k, b.lo, b.hi
),
wide AS (
    SELECT g, n, k, h,
           CAST(trim_sum + k * (lo + hi) AS DOUBLE) AS wsum,
           CAST(trim_ss + CAST(k AS HUGEINT) * (CAST(lo AS HUGEINT) * lo
                + CAST(hi AS HUGEINT) * hi) AS DOUBLE) AS wss,
           CAST(trim_sum AS DOUBLE) AS tsum
    FROM gstat
),
d AS (
    SELECT g, n, h, tsum / h / 100.0 AS tmean,
           (wss - wsum * wsum / n) / (n - 1) * (n - 1) / (h * (h - 1.0))
               / 10000.0 AS dg
    FROM wide
),
two AS (
    SELECT MAX(CASE WHEN g = 'weekday' THEN n END) AS n_wd,
           MAX(CASE WHEN g = 'weekend' THEN n END) AS n_we,
           MAX(CASE WHEN g = 'weekday' THEN h END) AS h_wd,
           MAX(CASE WHEN g = 'weekend' THEN h END) AS h_we,
           MAX(CASE WHEN g = 'weekday' THEN tmean END) AS tm_wd,
           MAX(CASE WHEN g = 'weekend' THEN tmean END) AS tm_we,
           MAX(CASE WHEN g = 'weekday' THEN dg END) AS d_wd,
           MAX(CASE WHEN g = 'weekend' THEN dg END) AS d_we
    FROM d
)
SELECT n_wd, n_we, h_wd, h_we,
       ROUND(tm_wd, 4) AS tmean_wd,
       ROUND(tm_we, 4) AS tmean_we,
       ROUND((tm_wd - tm_we) / SQRT(d_wd + d_we), 4) AS t_yuen,
       ROUND((d_wd + d_we) * (d_wd + d_we)
             / (d_wd * d_wd / (h_wd - 1) + d_we * d_we / (h_we - 1)), 4)
           AS df
FROM two
""",
    tags=("ab-test", "A12", "robust"),
)
def q459_yuen_trimmed_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yuen's 20%-trimmed t-test of weekend vs weekday purchase values:
    (n_wd, n_we, h_wd, h_we, tmean_wd, tmean_we, t_yuen, df)."""
    events = load_table(spark, sf_dir, "events")
    base = events.filter(F.col("event_type") == "purchase").select(
        F.when(
            (F.expr("CAST(FLOOR(CAST(ts AS DOUBLE)) AS BIGINT) DIV 86400")
             + 3) % 7 >= 5,
            "weekend",
        )
        .otherwise("weekday")
        .alias("g"),
        F.round(100.0 * F.col("value")).cast("long").alias("v"),
    )
    freq = base.groupBy("g", "v").agg(F.count(F.lit(1)).alias("c"))
    wv = Window.partitionBy("g").orderBy("v")
    cum = freq.select(
        "g",
        "v",
        "c",
        F.coalesce(
            F.sum("c").over(wv.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("below"),
        F.sum("c").over(wv.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "upto"
        ),
    )
    sizes = freq.groupBy("g").agg(
        F.sum("c").alias("n"), (F.sum("c") / 5).cast("long").alias("k")
    )
    cs = cum.join(F.broadcast(sizes), "g")
    bounds = cs.groupBy("g").agg(
        F.max(
            F.when(
                (F.col("below") <= F.col("k")) & (F.col("k") < F.col("upto")),
                F.col("v"),
            )
        ).alias("lo"),
        F.max(
            F.when(
                (F.col("below") <= F.col("n") - F.col("k") - 1)
                & (F.col("n") - F.col("k") - 1 < F.col("upto")),
                F.col("v"),
            )
        ).alias("hi"),
    )
    kept = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("upto"), F.col("n") - F.col("k"))
        - F.greatest(F.col("below"), F.col("k")),
    )
    gstat = (
        cs.join(F.broadcast(bounds), "g")
        .groupBy("g", "n", "k", "lo", "hi")
        .agg(
            F.sum(F.col("v") * kept).alias("trim_sum"),
            F.sum(F.col("v").cast(_DEC) * F.col("v") * kept).alias("trim_ss"),
        )
        .withColumn("h", F.col("n") - 2 * F.col("k"))
    )
    wsum = (F.col("trim_sum") + F.col("k") * (F.col("lo") + F.col("hi"))).cast(
        "double"
    )
    wss = (
        F.col("trim_ss")
        + F.col("k").cast(_DEC)
        * (
            F.col("lo").cast(_DEC) * F.col("lo")
            + F.col("hi").cast(_DEC) * F.col("hi")
        )
    ).cast("double")
    d = gstat.select(
        "g",
        "n",
        "h",
        (F.col("trim_sum").cast("double") / F.col("h") / 100.0).alias("tmean"),
        (
            (wss - wsum * wsum / F.col("n"))
            / (F.col("n") - 1)
            * (F.col("n") - 1)
            / (F.col("h") * (F.col("h") - F.lit(1.0)))
            / 10000.0
        ).alias("dg"),
    )
    two = d.agg(
        F.max(F.when(F.col("g") == "weekday", F.col("n"))).alias("n_wd"),
        F.max(F.when(F.col("g") == "weekend", F.col("n"))).alias("n_we"),
        F.max(F.when(F.col("g") == "weekday", F.col("h"))).alias("h_wd"),
        F.max(F.when(F.col("g") == "weekend", F.col("h"))).alias("h_we"),
        F.max(F.when(F.col("g") == "weekday", F.col("tmean"))).alias("tm_wd"),
        F.max(F.when(F.col("g") == "weekend", F.col("tmean"))).alias("tm_we"),
        F.max(F.when(F.col("g") == "weekday", F.col("dg"))).alias("d_wd"),
        F.max(F.when(F.col("g") == "weekend", F.col("dg"))).alias("d_we"),
    )
    dsum = F.col("d_wd") + F.col("d_we")
    return two.select(
        "n_wd",
        "n_we",
        "h_wd",
        "h_we",
        F.round(F.col("tm_wd"), 4).alias("tmean_wd"),
        F.round(F.col("tm_we"), 4).alias("tmean_we"),
        F.round((F.col("tm_wd") - F.col("tm_we")) / F.sqrt(dsum), 4).alias(
            "t_yuen"
        ),
        F.round(
            dsum
            * dsum
            / (
                F.col("d_wd") * F.col("d_wd") / (F.col("h_wd") - 1)
                + F.col("d_we") * F.col("d_we") / (F.col("h_we") - 1)
            ),
            4,
        ).alias("df"),
    )


# --------------------------------------------------------------------------
# q460 - Nelson-Aalen cumulative-hazard estimator over user lifetimes
# (q430's survival frame: duration = last - first event in days,
# censored when the last event falls within 24h of corpus end):
# H(t) = sum_{t_i <= t} d_i / n_i with the Aalen variance
# sum d_i / n_i^2. The nonparametric hazard twin of q241's Kaplan-Meier
# survival curve (KM multiplies survival factors; NA sums hazard
# increments — the estimator of record for H(t) and the input to any
# proportional-hazards read on top of q430's log-rank).
# Parity: the life table (d_i, n_i) is exact integers; each increment is
# frozen (round(1e8 * d/n), round(1e12 * d/n^2)) so the cumulative sums
# are exact integer window sums; the output divides back. 4dp.
# Scale: one user-keyed aggregate, then windows over the DISTINCT
# duration relation (value-domain bounded — days, q283's class).
# At 1e9+ users d/n^2 underflows the 1e12 freeze to 0 — the variance
# column is documented as a small-n diagnostic (SCALE.md).
# --------------------------------------------------------------------------
@register(
    "q460_nelson_aalen",
    oracle="""
WITH users AS (
    SELECT user_id, MIN(ts) AS first_ts, MAX(ts) AS last_ts
    FROM events GROUP BY user_id
),
horizon AS (SELECT MAX(ts) AS max_ts FROM events),
durs AS (
    SELECT CAST(FLOOR(EPOCH(u.last_ts - u.first_ts) / 86400.0) AS BIGINT)
               AS dur,
           CASE WHEN u.last_ts <= h.max_ts - INTERVAL 24 HOUR
                THEN 1 ELSE 0 END AS churn
    FROM users u CROSS JOIN horizon h
),
steps AS (
    SELECT dur, CAST(COUNT(*) AS BIGINT) AS n_all,
           CAST(SUM(churn) AS BIGINT) AS d
    FROM durs GROUP BY dur
),
risked AS (
    SELECT dur, d,
           CAST(SUM(n_all) OVER (ORDER BY dur DESC
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_risk
    FROM steps
),
terms AS (
    SELECT dur, d, n_risk,
           CAST(ROUND(100000000.0 * d / n_risk) AS BIGINT) AS hz,
           CAST(ROUND(1000000000000.0 * d / n_risk / n_risk) AS BIGINT) AS vz
    FROM risked WHERE d > 0
)
SELECT dur, n_risk, d,
       ROUND(CAST(SUM(hz) OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING)
             AS DOUBLE) / 100000000.0, 4) AS na_cumhaz,
       ROUND(CAST(SUM(vz) OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING)
             AS DOUBLE) / 1000000000000.0, 4) AS na_var
FROM terms
ORDER BY dur
""",
    tags=("survival", "A12", "W2"),
)
def q460_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard of user lifetime (days):
    (dur, n_risk, d, na_cumhaz, na_var)."""
    events = load_table(spark, sf_dir, "events")
    users = events.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts")
    )
    horizon = events.agg(F.max("ts").alias("max_ts"))
    durs = users.crossJoin(F.broadcast(horizon)).select(
        F.floor(
            (
                F.col("last_ts").cast("double")
                - F.col("first_ts").cast("double")
            )
            / 86400.0
        )
        .cast("long")
        .alias("dur"),
        F.when(
            F.col("last_ts") <= F.col("max_ts") - F.expr("INTERVAL 24 HOUR"),
            1,
        )
        .otherwise(0)
        .alias("churn"),
    )
    steps = durs.groupBy("dur").agg(
        F.count(F.lit(1)).alias("n_all"), F.sum("churn").alias("d")
    )
    w_desc = Window.orderBy(F.col("dur").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risked = steps.select(
        "dur", "d", F.sum("n_all").over(w_desc).alias("n_risk")
    )
    terms = risked.filter(F.col("d") > 0).select(
        "dur",
        "d",
        "n_risk",
        F.round(1e8 * F.col("d") / F.col("n_risk")).cast("long").alias("hz"),
        F.round(1e12 * F.col("d") / F.col("n_risk") / F.col("n_risk"))
        .cast("long")
        .alias("vz"),
    )
    w_asc = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
    return terms.select(
        "dur",
        "n_risk",
        "d",
        F.round(F.sum("hz").over(w_asc).cast("double") / 1e8, 4).alias(
            "na_cumhaz"
        ),
        F.round(F.sum("vz").over(w_asc).cast("double") / 1e12, 4).alias(
            "na_var"
        ),
    ).orderBy("dur")


# --------------------------------------------------------------------------
# q461 - beta-binomial empirical-Bayes shrinkage of per-brand return
# rates: estimate a prior strength K from the between-brand rate
# variance by method of moments (K = m*(1-m)/v - 1, the beta prior whose
# variance matches the observed spread), then shrink each brand's raw
# rate toward the pooled mean: shrunk = (x + K*m)/(n + K). The
# small-sample-brand stabiliser q425's Wilson bounds bracket but do not
# fix — classic James-Stein-flavored partial pooling, fully closed-form.
# Parity: counts exact; each raw rate is frozen to round(1e8*x/n) so the
# cross-brand mean is an exact integer sum; per-brand variance terms are
# frozen to round(1e12*(r - m)^2); K and shrunk rates are one double
# expression. 4dp.
# Scale: one brand-keyed aggregate (broadcast part dim); the prior fit
# is a |brands|-row reduce broadcast back. No windows.
# --------------------------------------------------------------------------
@register(
    "q461_eb_shrinkage",
    oracle="""
WITH j AS (
    SELECT p.p_brand AS brand,
           CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
g AS (
    SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(ret) AS BIGINT) AS x,
           CAST(ROUND(100000000.0 * SUM(ret) / COUNT(*)) AS BIGINT) AS r8
    FROM j GROUP BY brand
),
prior AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS b,
           CAST(SUM(r8) AS BIGINT) AS sr8
    FROM g
),
m AS (
    SELECT b, CAST(sr8 AS DOUBLE) / b / 100000000.0 AS mbar FROM prior
),
vterms AS (
    SELECT CAST(ROUND(1000000000000.0
                * (g.r8 / 100000000.0 - m.mbar)
                * (g.r8 / 100000000.0 - m.mbar)) AS BIGINT) AS vt
    FROM g CROSS JOIN m
),
kfit AS (
    SELECT m.b, m.mbar,
           GREATEST(0.0, m.mbar * (1.0 - m.mbar)
               / (CAST(SUM(vt) AS DOUBLE) / 1000000000000.0 / m.b) - 1.0)
               AS kp
    FROM vterms CROSS JOIN m GROUP BY m.b, m.mbar
)
SELECT g.brand, g.n AS n_lines, g.x AS n_returned,
       ROUND(CAST(g.x AS DOUBLE) / g.n, 4) AS raw_rate,
       ROUND((g.x + k.kp * k.mbar) / (g.n + k.kp), 4) AS shrunk_rate,
       ROUND(k.kp, 4) AS k_prior
FROM g CROSS JOIN kfit k
ORDER BY g.brand
""",
    tags=("A12", "quality", "shrinkage"),
)
def q461_eb_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes shrunk brand return rates: (brand, n_lines,
    n_returned, raw_rate, shrunk_rate, k_prior)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = lineitem.join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        F.col("p_partkey") == F.col("l_partkey"),
    ).select(
        F.col("p_brand").alias("brand"),
        (F.col("l_returnflag") == "R").cast("long").alias("ret"),
    )
    g = j.groupBy("brand").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("ret").cast("long").alias("x"),
        F.round(1e8 * F.sum("ret") / F.count(F.lit(1)))
        .cast("long")
        .alias("r8"),
    )
    prior = g.agg(
        F.count(F.lit(1)).cast("long").alias("b"),
        F.sum("r8").cast("long").alias("sr8"),
    )
    m = prior.select(
        "b", (F.col("sr8").cast("double") / F.col("b") / 1e8).alias("mbar")
    )
    vterms = g.crossJoin(F.broadcast(m)).select(
        "b",
        "mbar",
        F.round(
            1e12
            * (F.col("r8") / 1e8 - F.col("mbar"))
            * (F.col("r8") / 1e8 - F.col("mbar"))
        )
        .cast("long")
        .alias("vt"),
    )
    kfit = vterms.groupBy("b", "mbar").agg(
        F.greatest(
            F.lit(0.0),
            F.col("mbar")
            * (1.0 - F.col("mbar"))
            / (F.sum("vt").cast("double") / 1e12 / F.col("b"))
            - 1.0,
        ).alias("kp")
    )
    return (
        g.crossJoin(F.broadcast(kfit))
        .select(
            "brand",
            F.col("n").alias("n_lines"),
            F.col("x").alias("n_returned"),
            F.round(F.col("x").cast("double") / F.col("n"), 4).alias(
                "raw_rate"
            ),
            F.round(
                (F.col("x") + F.col("kp") * F.col("mbar"))
                / (F.col("n") + F.col("kp")),
                4,
            ).alias("shrunk_rate"),
            F.round(F.col("kp"), 4).alias("k_prior"),
        )
        .orderBy("brand")
    )


# --------------------------------------------------------------------------
# q462 - two-sample Cramer-von Mises statistic between weekend and
# weekday purchase-value distributions: T = (n1*n2/N^2) * sum over all N
# observations of (F1(x) - F2(x))^2. The whole-distribution companion to
# q305's KS (max gap — one point) and q318's Wasserstein (mass transport
# — physical units): CvM weights EVERY quantile's discrepancy, so it
# catches distributional drift KS misses when the gap is broad but
# shallow.
# Parity: the value domain is collapsed to (cents, c1, c2) with exact
# cumulative counts; F1 - F2 = k1/n1 - k2/n2 is the identical double
# expression on both engines from exact integers; each value's
# contribution is frozen to round(1e9*(c1+c2)*(F1-F2)^2) so the final
# sum is an exact integer. 4dp.
# Scale: one (group, value) aggregate; cumulative windows on the bounded
# distinct-cents domain (q283's audited class). Headroom: the frozen
# term sum is <= 1e9*N -> DECIMAL(38) beyond ~4.6e9 purchase rows
# (ledger entry; int64 holds through every tested SF).
# --------------------------------------------------------------------------
@register(
    "q462_cramer_von_mises",
    oracle="""
WITH base AS (
    SELECT CAST(ROUND(100.0 * value) AS BIGINT) AS v,
           CASE WHEN (CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 86400 + 3) % 7 >= 5
                THEN 1 ELSE 0 END AS t
    FROM events WHERE event_type = 'purchase'
),
g AS (
    SELECT v, CAST(SUM(t) AS BIGINT) AS c1,
           CAST(SUM(1 - t) AS BIGINT) AS c2
    FROM base GROUP BY v
),
cum AS (
    SELECT v, c1, c2,
           CAST(SUM(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS k1,
           CAST(SUM(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS k2
    FROM g
),
nn AS (
    SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
    FROM g
),
terms AS (
    SELECT CAST(ROUND(1000000000.0 * (c.c1 + c.c2)
               * (CAST(c.k1 AS DOUBLE) / n.n1 - CAST(c.k2 AS DOUBLE) / n.n2)
               * (CAST(c.k1 AS DOUBLE) / n.n1 - CAST(c.k2 AS DOUBLE) / n.n2))
               AS BIGINT) AS z
    FROM cum c CROSS JOIN nn n
)
SELECT n.n1 AS n_weekend, n.n2 AS n_weekday,
       ROUND(CAST(n.n1 AS DOUBLE) * n.n2
             / ((n.n1 + n.n2) * CAST(n.n1 + n.n2 AS DOUBLE))
             * (CAST(SUM(t.z) AS DOUBLE) / 1000000000.0), 4) AS t_cvm
FROM terms t CROSS JOIN nn n
GROUP BY n.n1, n.n2
""",
    tags=("ab-test", "A12", "W2"),
)
def q462_cramer_von_mises(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramer-von Mises statistic, weekend vs weekday purchase
    values: (n_weekend, n_weekday, t_cvm)."""
    events = load_table(spark, sf_dir, "events")
    base = events.filter(F.col("event_type") == "purchase").select(
        F.round(100.0 * F.col("value")).cast("long").alias("v"),
        (
            (
                F.expr("CAST(FLOOR(CAST(ts AS DOUBLE)) AS BIGINT) DIV 86400")
                + 3
            )
            % 7
            >= 5
        )
        .cast("long")
        .alias("t"),
    )
    g = base.groupBy("v").agg(
        F.sum("t").alias("c1"), F.sum(1 - F.col("t")).alias("c2")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = g.select(
        "v",
        "c1",
        "c2",
        F.sum("c1").over(w).alias("k1"),
        F.sum("c2").over(w).alias("k2"),
    )
    nn = g.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    fg = F.col("k1").cast("double") / F.col("n1") - F.col("k2").cast(
        "double"
    ) / F.col("n2")
    terms = cum.crossJoin(F.broadcast(nn)).select(
        "n1",
        "n2",
        F.round(1e9 * (F.col("c1") + F.col("c2")) * fg * fg)
        .cast("long")
        .alias("z"),
    )
    return terms.groupBy("n1", "n2").agg(
        F.round(
            F.col("n1").cast("double")
            * F.col("n2")
            / (
                (F.col("n1") + F.col("n2"))
                * (F.col("n1") + F.col("n2")).cast("double")
            )
            * (F.sum("z").cast("double") / 1e9),
            4,
        ).alias("t_cvm")
    ).select(
        F.col("n1").alias("n_weekend"),
        F.col("n2").alias("n_weekday"),
        "t_cvm",
    )


# --------------------------------------------------------------------------
# q463 - mSPRT always-valid p-value sequence (mixture sequential
# probability ratio test, the "peeking-safe" A/B monitor): daily
# spend-difference increments d_t between the even/odd user cohorts,
# cumulative S_n, and per day the normal-mixture likelihood ratio
#   ln L_n = 0.5*ln(s2/(s2 + n*tau2)) + S_n^2*tau2/(2*s2*(s2 + n*tau2))
# with declared variance s2 and mixture width tau2; the always-valid
# p at day n is min(1, exp(-max_{m<=n} ln L_m)). The sequential monitor
# q264's group-sequential bounds approximate — this one is valid at
# EVERY look with no alpha-spending schedule.
# Parity: daily cohort cents are exact integers, S_n an exact integer
# cumulative; ln L is one double expression per day; the running max is
# an ordered window on the daily relation. 4dp.
# Scale: one (day, cohort) aggregate; all windows on the calendar-
# bounded daily relation.
# --------------------------------------------------------------------------
_MSPRT_S2 = 4.0e8  # declared daily-diff variance, cents^2 (sigma = $200)
_MSPRT_TAU2 = 4.0e8  # mixture width = the declared variance


@register(
    "q463_msprt",
    oracle=f"""
WITH daily AS (
    SELECT CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
           CAST(SUM(CASE WHEN user_id % 2 = 0
                    THEN CAST(ROUND(100.0 * value) AS BIGINT)
                    ELSE -CAST(ROUND(100.0 * value) AS BIGINT) END)
                AS BIGINT) AS d
    FROM events WHERE event_type = 'purchase' GROUP BY 1
),
ranked AS (
    SELECT day, d, CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t,
           CAST(SUM(d) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS s_cum
    FROM daily
),
ll AS (
    SELECT day, t, s_cum,
           0.5 * LN({_MSPRT_S2!r} / ({_MSPRT_S2!r} + t * {_MSPRT_TAU2!r}))
           + CAST(s_cum AS DOUBLE) * s_cum * {_MSPRT_TAU2!r}
             / (2.0 * {_MSPRT_S2!r} * ({_MSPRT_S2!r} + t * {_MSPRT_TAU2!r}))
               AS log_lr
    FROM ranked
)
SELECT t, STRFTIME(day, '%Y-%m-%d') AS day,
       CAST(s_cum AS BIGINT) AS s_cum_cents,
       ROUND(log_lr, 4) AS log_lr,
       ROUND(LEAST(1.0, EXP(-MAX(log_lr) OVER (ORDER BY t
             ROWS UNBOUNDED PRECEDING))), 4) AS p_always_valid
FROM ll
ORDER BY t
""",
    tags=("ab-test", "A12", "W2", "sequential"),
)
def q463_msprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mSPRT always-valid p sequence over daily cohort spend diffs:
    (t, day, s_cum_cents, log_lr, p_always_valid)."""
    events = load_table(spark, sf_dir, "events")
    c = F.round(100.0 * F.col("value")).cast("long")
    daily = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(
            F.sum(
                F.when(F.col("user_id") % 2 == 0, c).otherwise(-c)
            ).alias("d")
        )
    )
    wd = Window.orderBy("day")
    ranked = daily.select(
        "day",
        F.row_number().over(wd).cast("long").alias("t"),
        F.sum("d").over(wd.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "s_cum"
        ),
    )
    s2, tau2 = _MSPRT_S2, _MSPRT_TAU2
    log_lr = 0.5 * F.log(F.lit(s2) / (s2 + F.col("t") * tau2)) + F.col(
        "s_cum"
    ).cast("double") * F.col("s_cum") * tau2 / (
        2.0 * s2 * (s2 + F.col("t") * tau2)
    )
    ll = ranked.select("day", "t", "s_cum", log_lr.alias("log_lr"))
    wt = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    return ll.select(
        "t",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("s_cum").cast("long").alias("s_cum_cents"),
        F.round("log_lr", 4).alias("log_lr"),
        F.round(
            F.least(F.lit(1.0), F.exp(-F.max("log_lr").over(wt))), 4
        ).alias("p_always_valid"),
    ).orderBy("t")


# --------------------------------------------------------------------------
# q464 - KPSS level-stationarity test on the daily event-count series:
# eta = n^-2 * sum_t S_t^2 / s2_lr, where S_t are partial sums of the
# demeaned series and s2_lr is the Bartlett-kernel long-run variance
# with L = 4 lags (weights 1 - l/(L+1)). The complementary null to
# q458's ADF: ADF's H0 is a unit root, KPSS's H0 is stationarity — the
# standard practice is to run both and read the 2x2 verdict.
# Parity: with D_t = n*x_t - S (exact integers), partial sums P_t are
# exact integer window sums; sum P^2 and the lag products D_t*D_{t+l}
# accumulate in DECIMAL(38,0)/HUGEINT; eta = sumP2 / (n * s2_scaled)
# after the n-power bookkeeping (sum S^2 = sumP2/n^2, gamma_l =
# sumDD_l/n^3) collapses to one double ratio. 4dp.
# Scale: one corpus aggregate to the calendar-bounded daily relation;
# windows and lag joins on ~thousands of rows max. P_t <= n^2 * xbar ~
# 4e15 at 100 TB; P^2 sums ~ 6e34 < 1e38.
# --------------------------------------------------------------------------
@register(
    "q464_kpss",
    oracle="""
WITH daily AS (
    SELECT CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS x
    FROM events GROUP BY 1
),
ranked AS (
    SELECT x, CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t
    FROM daily
),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx
      FROM ranked),
d AS (
    SELECT r.t, s.n, CAST(r.x * s.n - s.sx AS BIGINT) AS dv
    FROM ranked r CROSS JOIN s
),
p AS (
    SELECT t, n, dv,
           CAST(SUM(CAST(dv AS HUGEINT)) OVER (ORDER BY t
                ROWS UNBOUNDED PRECEDING) AS HUGEINT) AS pt
    FROM d
),
lagd AS (
    SELECT t, n, dv,
           LAG(dv, 1) OVER (ORDER BY t) AS l1,
           LAG(dv, 2) OVER (ORDER BY t) AS l2,
           LAG(dv, 3) OVER (ORDER BY t) AS l3,
           LAG(dv, 4) OVER (ORDER BY t) AS l4
    FROM d
),
moms AS (
    SELECT MAX(n) AS n,
           CAST(SUM(CAST(dv AS HUGEINT) * dv) AS HUGEINT) AS g0,
           CAST(SUM(CAST(dv AS HUGEINT) * l1) AS HUGEINT) AS g1,
           CAST(SUM(CAST(dv AS HUGEINT) * l2) AS HUGEINT) AS g2,
           CAST(SUM(CAST(dv AS HUGEINT) * l3) AS HUGEINT) AS g3,
           CAST(SUM(CAST(dv AS HUGEINT) * l4) AS HUGEINT) AS g4
    FROM lagd
),
psum AS (
    SELECT CAST(SUM(pt * pt) AS HUGEINT) AS sp2 FROM p
)
SELECT m.n,
       ROUND((CAST(m.g0 AS DOUBLE) + 2.0 * (0.8 * CAST(m.g1 AS DOUBLE)
              + 0.6 * CAST(m.g2 AS DOUBLE) + 0.4 * CAST(m.g3 AS DOUBLE)
              + 0.2 * CAST(m.g4 AS DOUBLE)))
             / (CAST(m.n AS DOUBLE) * m.n * m.n), 4) AS s2_longrun,
       ROUND(CAST(p.sp2 AS DOUBLE)
             / (CAST(m.n AS DOUBLE)
                * (CAST(m.g0 AS DOUBLE) + 2.0 * (0.8 * CAST(m.g1 AS DOUBLE)
                   + 0.6 * CAST(m.g2 AS DOUBLE) + 0.4 * CAST(m.g3 AS DOUBLE)
                   + 0.2 * CAST(m.g4 AS DOUBLE)))), 4) AS kpss_level
FROM moms m CROSS JOIN psum p
""",
    tags=("timeseries", "A12", "W2"),
)
def q464_kpss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPSS level-stationarity statistic of daily event counts (Bartlett
    L=4): (n, s2_longrun, kpss_level)."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("x"))
    ranked = daily.select(
        "x", F.row_number().over(Window.orderBy("day")).alias("t")
    )
    s = ranked.agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx")
    )
    d = ranked.crossJoin(F.broadcast(s)).select(
        "t", "n", (F.col("x") * F.col("n") - F.col("sx")).alias("dv")
    )
    wt = Window.orderBy("t")
    p = d.select(
        "t",
        "n",
        "dv",
        F.sum(F.col("dv").cast(_DEC))
        .over(wt.rowsBetween(Window.unboundedPreceding, 0))
        .alias("pt"),
    )
    lagd = d.select(
        "n",
        "dv",
        *[F.lag("dv", k).over(wt).alias(f"l{k}") for k in range(1, 5)],
    )
    moms = lagd.agg(
        F.max("n").alias("n"),
        F.sum(F.col("dv").cast(_DEC) * F.col("dv")).alias("g0"),
        *[
            F.sum(F.col("dv").cast(_DEC) * F.col(f"l{k}")).alias(f"g{k}")
            for k in range(1, 5)
        ],
    )
    psum = p.agg(F.sum(F.col("pt") * F.col("pt")).alias("sp2"))
    nD = F.col("n").cast("double")
    s2s = F.col("g0").cast("double") + 2.0 * (
        0.8 * F.col("g1").cast("double")
        + 0.6 * F.col("g2").cast("double")
        + 0.4 * F.col("g3").cast("double")
        + 0.2 * F.col("g4").cast("double")
    )
    return moms.crossJoin(F.broadcast(psum)).select(
        F.col("n").cast("long").alias("n"),
        F.round(s2s / (nD * F.col("n") * F.col("n")), 4).alias("s2_longrun"),
        F.round(
            F.col("sp2").cast("double") / (nD * s2s), 4
        ).alias("kpss_level"),
    )
