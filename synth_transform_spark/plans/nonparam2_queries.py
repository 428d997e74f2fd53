"""Round-9 wave: the remaining classical two-/k-sample nonparametrics
(Conover squared ranks, Brunner-Munzel, Kuiper, tie-exact two-sample
Anderson-Darling) plus the two classical association coefficients the
registry lacked (Hoeffding's D independence, Theil's U uncertainty
coefficient).

Same parity discipline as plans/nonparam_queries.py: every rank
statistic runs in the FREQUENCY DOMAIN (collapse to the distinct-value
relation; doubled mid-ranks / quartered placements are exact integers);
wide products accumulate in DECIMAL(38,0)/HUGEINT; per-domain-row double
terms are frozen to an integer grid before the final sum; outputs 4dp.
Every query here carries an independent pure-python recomputation in
tests/test_round9_math.py (required by the round-9 verification
inventory for A12 tags).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..sources.readers import load_table
from .nonparam_queries import _DEC, _DUCK_WEEKEND, _SPARK_WEEKEND
from .registry import register


# --------------------------------------------------------------------------
# q491 - Conover squared-ranks test (Conover 1999 §5.3): do the event
# types differ in SPREAD? Deviations u = |2*cents - 2*median_type| are
# exact integers (doubled so the .5-cent medians stay integral); pooled
# doubled mid-ranks of u are exact; scores = (doubled mid-rank)^2 — a
# constant 4x the classical squared rank, which cancels in T. The
# k-sample scale counterpart of q471's two-sample Ansari-Bradley (and
# the robust alternative to variance-based q333 Brown-Forsythe).
# Parity: group medians are the same linear-interpolation quantile on
# both engines, doubled+rounded to exact integers; score sums and the
# squared-score sum accumulate in DECIMAL(38,0)/HUGEINT; T is one double
# expression. 4dp.
# Scale: one (type, cents) aggregate -> one (type, u) aggregate ->
# cumulative window on the bounded distinct-u domain -> 1-row reduce.
# Ledger: score^2 <= 16*N^4 exceeds DECIMAL(38) at ~4e9 rows — halve
# the doubled-rank grid beyond (documented in plans/headroom.py).
# --------------------------------------------------------------------------
@register(
    "q491_conover_squared_ranks",
    oracle=f"""
WITH base AS (
    SELECT event_type AS t, CAST(ROUND(200.0 * value) AS BIGINT) AS v2
    FROM events
),
med AS (
    SELECT t, CAST(ROUND(MEDIAN(v2)) AS BIGINT) AS m2 FROM base GROUP BY t
),
dev AS (
    SELECT b.t, ABS(b.v2 - m.m2) AS u
    FROM base b JOIN med m ON m.t = b.t
),
g AS (SELECT t, u, CAST(COUNT(*) AS BIGINT) AS c FROM dev GROUP BY t, u),
pool AS (SELECT u, CAST(SUM(c) AS BIGINT) AS cu FROM g GROUP BY u),
cum AS (
    SELECT u, cu,
           CAST(COALESCE(SUM(cu) OVER (ORDER BY u
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS lo1
    FROM pool
),
scored AS (
    SELECT c.u,
           CAST(2 * c.lo1 + c.cu + 1 AS HUGEINT)
           * CAST(2 * c.lo1 + c.cu + 1 AS HUGEINT) AS s4
    FROM cum c
),
grp AS (
    SELECT g.t, CAST(SUM(g.c) AS BIGINT) AS n_i,
           CAST(SUM(CAST(g.c AS HUGEINT) * s.s4) AS HUGEINT) AS s_i,
           CAST(SUM(CAST(g.c AS HUGEINT) * s.s4 * s.s4) AS HUGEINT) AS q_i
    FROM g JOIN scored s ON s.u = g.u
    GROUP BY g.t
),
tot AS (
    SELECT CAST(SUM(n_i) AS BIGINT) AS n,
           CAST(SUM(s_i) AS HUGEINT) AS s1,
           CAST(SUM(q_i) AS HUGEINT) AS s2,
           SUM(CAST(s_i AS DOUBLE) * s_i / n_i) AS swn
    FROM grp
)
SELECT g.t AS event_type, g.n_i AS n,
       ROUND(CAST(g.s_i AS DOUBLE) / g.n_i / 4.0, 4) AS mean_sq_rank,
       ROUND((t.swn - CAST(t.s1 AS DOUBLE) * t.s1 / t.n)
             / ((CAST(t.s2 AS DOUBLE) - CAST(t.s1 AS DOUBLE) * t.s1 / t.n)
                / (t.n - 1)), 4) AS t_conover
FROM grp g CROSS JOIN tot t
ORDER BY event_type
""",
    tags=("ab-test", "A12", "W2", "robust"),
)
def q491_conover_squared_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conover squared-ranks k-sample scale test across event types:
    (event_type, n, mean_sq_rank, t_conover)."""
    events = load_table(spark, sf_dir, "events")
    base = events.select(
        F.col("event_type").alias("t"),
        F.round(200.0 * F.col("value")).cast("long").alias("v2"),
    )
    med = base.groupBy("t").agg(
        F.round(F.expr("percentile(v2, 0.5)")).cast("long").alias("m2")
    )
    dev = base.join(F.broadcast(med), "t").select(
        "t", F.abs(F.col("v2") - F.col("m2")).alias("u")
    )
    g = dev.groupBy("t", "u").agg(F.count(F.lit(1)).alias("c"))
    pool = g.groupBy("u").agg(F.sum("c").alias("cu"))
    w = Window.orderBy("u").rowsBetween(Window.unboundedPreceding, -1)
    cum = pool.select(
        "u", "cu", F.coalesce(F.sum("cu").over(w), F.lit(0)).alias("lo1")
    )
    dm = (2 * F.col("lo1") + F.col("cu") + 1).cast(_DEC)
    scored = cum.select("u", (dm * dm).alias("s4"))
    grp = (
        g.join(scored, "u")
        .groupBy("t")
        .agg(
            F.sum("c").alias("n_i"),
            F.sum(F.col("c").cast(_DEC) * F.col("s4")).alias("s_i"),
            F.sum(
                F.col("c").cast(_DEC) * F.col("s4") * F.col("s4")
            ).alias("q_i"),
        )
    )
    tot = grp.agg(
        F.sum("n_i").alias("n"),
        F.sum("s_i").alias("s1"),
        F.sum("q_i").alias("s2"),
        F.sum(
            F.col("s_i").cast("double") * F.col("s_i") / F.col("n_i")
        ).alias("swn"),
    )
    out = grp.crossJoin(F.broadcast(tot))
    nD = F.col("n").cast("double")
    sbar2 = F.col("s1").cast("double") * F.col("s1") / nD
    d2 = (F.col("s2").cast("double") - sbar2) / (nD - 1)
    return out.select(
        F.col("t").alias("event_type"),
        F.col("n_i").alias("n"),
        F.round(F.col("s_i").cast("double") / F.col("n_i") / 4.0, 4).alias(
            "mean_sq_rank"
        ),
        F.round((F.col("swn") - sbar2) / d2, 4).alias("t_conover"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# q492 - Brunner-Munzel test (Brunner & Munzel 2000), weekend vs weekday
# purchase values: the modern replacement for Mann-Whitney when the two
# groups may differ in SHAPE/variance (the "nonparametric Behrens-Fisher
# problem") — q314's rank-sum assumes exchangeability under H0, BM does
# not. Reports the relative effect p_hat = P(X_we < X_wd) + 0.5*P(=) and
# the scipy-convention studentised W.
# Parity: pooled and within-group doubled mid-ranks are exact integers
# on the collapsed cents domain; the placement differences d = 2R_pool -
# 2R_within and their first/second moments accumulate in DECIMAL(38,0)/
# HUGEINT (d <= 2N -> sum d^2 <= 4N^3, inside DECIMAL(38) at 1e12 rows);
# p_hat and W are single double expressions. 4dp.
# Scale: q471's frame — one (group, cents) aggregate, cumulative windows
# on the bounded distinct-cents domain, a 1-row reduce.
# --------------------------------------------------------------------------
@register(
    "q492_brunner_munzel",
    oracle=f"""
WITH base AS (
    SELECT CAST(ROUND(100.0 * value) AS BIGINT) AS v,
           CASE WHEN {_DUCK_WEEKEND} THEN 1 ELSE 0 END AS t
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
pl AS (
    SELECT c.c1, c.c2,
           2 * (c.k1 - c.c1 + c.k2 - c.c2) + (c.c1 + c.c2) + 1 AS ap,
           2 * (c.k1 - c.c1) + c.c1 + 1 AS b1,
           2 * (c.k2 - c.c2) + c.c2 + 1 AS b2
    FROM cum c
),
mom AS (
    SELECT CAST(SUM(CAST(c1 AS HUGEINT) * ap) AS HUGEINT) AS r21,
           CAST(SUM(CAST(c2 AS HUGEINT) * ap) AS HUGEINT) AS r22,
           CAST(SUM(CAST(c1 AS HUGEINT) * (ap - b1)) AS HUGEINT) AS d11,
           CAST(SUM(CAST(c1 AS HUGEINT) * (ap - b1) * (ap - b1))
                AS HUGEINT) AS d21,
           CAST(SUM(CAST(c2 AS HUGEINT) * (ap - b2)) AS HUGEINT) AS d12,
           CAST(SUM(CAST(c2 AS HUGEINT) * (ap - b2) * (ap - b2))
                AS HUGEINT) AS d22
    FROM pl
)
SELECT nn.n1 AS n_weekend, nn.n2 AS n_weekday,
       ROUND((CAST(m.r22 AS DOUBLE) / (2.0 * nn.n2)
              - (nn.n2 + 1) / 2.0) / nn.n1, 4) AS p_hat,
       ROUND(CAST(nn.n1 AS DOUBLE) * nn.n2
             * (CAST(m.r22 AS DOUBLE) / (2.0 * nn.n2)
                - CAST(m.r21 AS DOUBLE) / (2.0 * nn.n1))
             / (nn.n1 + nn.n2)
             / SQRT(CAST(nn.n1 AS DOUBLE)
                    * ((CAST(m.d21 AS DOUBLE)
                        - CAST(m.d11 AS DOUBLE) * m.d11 / nn.n1)
                       / (4.0 * (nn.n1 - 1)))
                    + CAST(nn.n2 AS DOUBLE)
                    * ((CAST(m.d22 AS DOUBLE)
                        - CAST(m.d12 AS DOUBLE) * m.d12 / nn.n2)
                       / (4.0 * (nn.n2 - 1)))), 4) AS w_bm
FROM mom m CROSS JOIN nn
""",
    tags=("ab-test", "A12", "W2", "robust"),
)
def q492_brunner_munzel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brunner-Munzel nonparametric Behrens-Fisher test, weekend vs
    weekday purchases: (n_weekend, n_weekday, p_hat, w_bm)."""
    events = load_table(spark, sf_dir, "events")
    base = events.filter(F.col("event_type") == "purchase").select(
        F.round(100.0 * F.col("value")).cast("long").alias("v"),
        F.expr(_SPARK_WEEKEND).cast("long").alias("t"),
    )
    g = base.groupBy("v").agg(
        F.sum("t").alias("c1"), F.sum(1 - F.col("t")).alias("c2")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = g.select(
        "c1",
        "c2",
        F.sum("c1").over(w).alias("k1"),
        F.sum("c2").over(w).alias("k2"),
    )
    nn = g.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    ap = (
        2 * (F.col("k1") - F.col("c1") + F.col("k2") - F.col("c2"))
        + (F.col("c1") + F.col("c2"))
        + 1
    )
    b1 = 2 * (F.col("k1") - F.col("c1")) + F.col("c1") + 1
    b2 = 2 * (F.col("k2") - F.col("c2")) + F.col("c2") + 1
    pl = cum.select(
        "c1", "c2", ap.alias("ap"), b1.alias("b1"), b2.alias("b2")
    )
    c1d = F.col("c1").cast(_DEC)
    c2d = F.col("c2").cast(_DEC)
    mom = pl.agg(
        F.sum(c1d * F.col("ap")).alias("r21"),
        F.sum(c2d * F.col("ap")).alias("r22"),
        F.sum(c1d * (F.col("ap") - F.col("b1"))).alias("d11"),
        F.sum(
            c1d * (F.col("ap") - F.col("b1")) * (F.col("ap") - F.col("b1"))
        ).alias("d21"),
        F.sum(c2d * (F.col("ap") - F.col("b2"))).alias("d12"),
        F.sum(
            c2d * (F.col("ap") - F.col("b2")) * (F.col("ap") - F.col("b2"))
        ).alias("d22"),
    )
    out = mom.crossJoin(F.broadcast(nn))
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    rb1 = F.col("r21").cast("double") / (2.0 * F.col("n1"))
    rb2 = F.col("r22").cast("double") / (2.0 * F.col("n2"))
    v1 = (
        F.col("d21").cast("double")
        - F.col("d11").cast("double") * F.col("d11") / F.col("n1")
    ) / (4.0 * (F.col("n1") - 1))
    v2 = (
        F.col("d22").cast("double")
        - F.col("d12").cast("double") * F.col("d12") / F.col("n2")
    ) / (4.0 * (F.col("n2") - 1))
    return out.select(
        F.col("n1").alias("n_weekend"),
        F.col("n2").alias("n_weekday"),
        F.round((rb2 - (F.col("n2") + 1) / 2.0) / F.col("n1"), 4).alias(
            "p_hat"
        ),
        F.round(
            n1d
            * n2d
            * (rb2 - rb1)
            / (F.col("n1") + F.col("n2"))
            / F.sqrt(n1d * v1 + n2d * v2),
            4,
        ).alias("w_bm"),
    )


# --------------------------------------------------------------------------
# q493 - Kuiper two-sample test, weekend vs weekday purchase values:
# V = D+ + D- (sup of F1-F2 plus sup of F2-F1). Unlike q305's KS it is
# equally sensitive in the tails and at the median, and invariant under
# cyclic shifts — the standard test for distribution equality when the
# drift may live anywhere in the support.
# Parity: D+ and D- are maxima of EXACT integer cross products
# k1*n2 - k2*n1 on the cumulative cents domain (DECIMAL(38,0)/HUGEINT:
# the product reaches N^2), divided once at the end. 4dp.
# Scale: q471's frame — one (group, cents) aggregate, one cumulative
# window, a 1-row max reduce.
# --------------------------------------------------------------------------
@register(
    "q493_kuiper_test",
    oracle=f"""
WITH base AS (
    SELECT CAST(ROUND(100.0 * value) AS BIGINT) AS v,
           CASE WHEN {_DUCK_WEEKEND} THEN 1 ELSE 0 END AS t
    FROM events WHERE event_type = 'purchase'
),
g AS (
    SELECT v, CAST(SUM(t) AS BIGINT) AS c1,
           CAST(SUM(1 - t) AS BIGINT) AS c2
    FROM base GROUP BY v
),
cum AS (
    SELECT CAST(SUM(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS k1,
           CAST(SUM(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS k2
    FROM g
),
nn AS (
    SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
    FROM g
),
mx AS (
    SELECT GREATEST(MAX(CAST(c.k1 AS HUGEINT) * n.n2
                        - CAST(c.k2 AS HUGEINT) * n.n1), 0) AS dplus_x,
           GREATEST(MAX(CAST(c.k2 AS HUGEINT) * n.n1
                        - CAST(c.k1 AS HUGEINT) * n.n2), 0) AS dminus_x
    FROM cum c CROSS JOIN nn n
)
SELECT n.n1 AS n_weekend, n.n2 AS n_weekday,
       ROUND(CAST(m.dplus_x AS DOUBLE) / n.n1 / n.n2, 4) AS d_plus,
       ROUND(CAST(m.dminus_x AS DOUBLE) / n.n1 / n.n2, 4) AS d_minus,
       ROUND(CAST(m.dplus_x AS DOUBLE) / n.n1 / n.n2
             + CAST(m.dminus_x AS DOUBLE) / n.n1 / n.n2, 4) AS v_kuiper
FROM mx m CROSS JOIN nn n
""",
    tags=("ab-test", "A12", "W2"),
)
def q493_kuiper_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kuiper two-sample test, weekend vs weekday purchases:
    (n_weekend, n_weekday, d_plus, d_minus, v_kuiper)."""
    events = load_table(spark, sf_dir, "events")
    base = events.filter(F.col("event_type") == "purchase").select(
        F.round(100.0 * F.col("value")).cast("long").alias("v"),
        F.expr(_SPARK_WEEKEND).cast("long").alias("t"),
    )
    g = base.groupBy("v").agg(
        F.sum("t").alias("c1"), F.sum(1 - F.col("t")).alias("c2")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = g.select(
        F.sum("c1").over(w).alias("k1"), F.sum("c2").over(w).alias("k2")
    )
    nn = g.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    x = cum.crossJoin(F.broadcast(nn))
    cross1 = F.col("k1").cast(_DEC) * F.col("n2")
    cross2 = F.col("k2").cast(_DEC) * F.col("n1")
    mx = x.agg(
        F.greatest(F.max(cross1 - cross2), F.lit(0).cast(_DEC)).alias(
            "dplus_x"
        ),
        F.greatest(F.max(cross2 - cross1), F.lit(0).cast(_DEC)).alias(
            "dminus_x"
        ),
    )
    out = mx.crossJoin(F.broadcast(nn))
    dp = F.col("dplus_x").cast("double") / F.col("n1") / F.col("n2")
    dm = F.col("dminus_x").cast("double") / F.col("n1") / F.col("n2")
    return out.select(
        F.col("n1").alias("n_weekend"),
        F.col("n2").alias("n_weekday"),
        F.round(dp, 4).alias("d_plus"),
        F.round(dm, 4).alias("d_minus"),
        F.round(dp + dm, 4).alias("v_kuiper"),
    )


# --------------------------------------------------------------------------
# q494 - two-sample Anderson-Darling, tie-exact midrank version (Scholz
# & Stephens 1987, A2_akN with k=2), weekend vs weekday purchase values:
# the variance-weighted ECDF distance — (N*M_ij - n_i*B_j)^2 terms are
# weighted by 1/(B(N-B) - N*l/4), so tail discrepancies count where
# q462's CvM and q305's KS underweight them. Completes the classical
# two-sample GOF triple (KS / CvM / AD) plus q493's Kuiper.
# Parity: 2B_j and 2M_ij are exact integers on the collapsed cents
# domain; the inner products run in DECIMAL(38,0)/HUGEINT and each
# per-value term is frozen to round(1e9 * term) before the final sum
# (q462's freeze pattern). 4dp.
# Scale: q471's frame — one (group, cents) aggregate, one cumulative
# window, a 1-row reduce. Degenerate den<=0 rows (single-value corpus)
# are excluded on both engines.
# --------------------------------------------------------------------------
@register(
    "q494_anderson_darling_2s",
    oracle=f"""
WITH base AS (
    SELECT CAST(ROUND(100.0 * value) AS BIGINT) AS v,
           CASE WHEN {_DUCK_WEEKEND} THEN 1 ELSE 0 END AS t
    FROM events WHERE event_type = 'purchase'
),
g AS (
    SELECT v, CAST(SUM(t) AS BIGINT) AS c1,
           CAST(SUM(1 - t) AS BIGINT) AS c2
    FROM base GROUP BY v
),
cum AS (
    SELECT c1, c2,
           CAST(SUM(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS k1,
           CAST(SUM(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS k2
    FROM g
),
nn AS (
    SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2,
           CAST(SUM(c1 + c2) AS BIGINT) AS n
    FROM g
),
terms AS (
    SELECT c.c1 + c.c2 AS l,
           CAST(n.n AS HUGEINT) * (2 * c.k1 - c.c1)
               - CAST(n.n1 AS HUGEINT) * (2 * (c.k1 + c.k2) - (c.c1 + c.c2))
               AS q1,
           CAST(n.n AS HUGEINT) * (2 * c.k2 - c.c2)
               - CAST(n.n2 AS HUGEINT) * (2 * (c.k1 + c.k2) - (c.c1 + c.c2))
               AS q2,
           CAST(2 * (c.k1 + c.k2) - (c.c1 + c.c2) AS HUGEINT)
               * (2 * n.n - (2 * (c.k1 + c.k2) - (c.c1 + c.c2)))
               - CAST(n.n AS HUGEINT) * (c.c1 + c.c2) AS den4
    FROM cum c CROSS JOIN nn n
),
frz AS (
    SELECT CAST(SUM(CAST(ROUND(1000000000.0 * l
                * (CAST(q1 AS DOUBLE) * q1) / CAST(den4 AS DOUBLE))
                AS HUGEINT)) AS HUGEINT) AS z1,
           CAST(SUM(CAST(ROUND(1000000000.0 * l
                * (CAST(q2 AS DOUBLE) * q2) / CAST(den4 AS DOUBLE))
                AS HUGEINT)) AS HUGEINT) AS z2
    FROM terms WHERE den4 > 0
)
SELECT n.n1 AS n_weekend, n.n2 AS n_weekday,
       ROUND((CAST(n.n AS DOUBLE) - 1) / n.n / n.n
             * (CAST(f.z1 AS DOUBLE) / 1000000000.0 / n.n1
                + CAST(f.z2 AS DOUBLE) / 1000000000.0 / n.n2)
             / n.n, 4) AS a2_akn
FROM frz f CROSS JOIN nn n
""",
    tags=("ab-test", "A12", "W2"),
)
def q494_anderson_darling_2s(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-exact two-sample Anderson-Darling (Scholz-Stephens A2_akN),
    weekend vs weekday purchases: (n_weekend, n_weekday, a2_akn)."""
    events = load_table(spark, sf_dir, "events")
    base = events.filter(F.col("event_type") == "purchase").select(
        F.round(100.0 * F.col("value")).cast("long").alias("v"),
        F.expr(_SPARK_WEEKEND).cast("long").alias("t"),
    )
    g = base.groupBy("v").agg(
        F.sum("t").alias("c1"), F.sum(1 - F.col("t")).alias("c2")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = g.select(
        "c1",
        "c2",
        F.sum("c1").over(w).alias("k1"),
        F.sum("c2").over(w).alias("k2"),
    )
    nn = g.agg(
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        F.sum(F.col("c1") + F.col("c2")).alias("n"),
    )
    x = cum.crossJoin(F.broadcast(nn))
    l = F.col("c1") + F.col("c2")
    tb2 = 2 * (F.col("k1") + F.col("k2")) - l  # doubled midpoint cumulative
    q1 = F.col("n").cast(_DEC) * (2 * F.col("k1") - F.col("c1")) - F.col(
        "n1"
    ).cast(_DEC) * tb2
    q2 = F.col("n").cast(_DEC) * (2 * F.col("k2") - F.col("c2")) - F.col(
        "n2"
    ).cast(_DEC) * tb2
    den4 = tb2.cast(_DEC) * (2 * F.col("n") - tb2) - F.col("n").cast(
        _DEC
    ) * l
    terms = x.select(
        l.alias("l"), q1.alias("q1"), q2.alias("q2"), den4.alias("den4")
    ).filter(F.col("den4") > 0)
    frz = terms.agg(
        F.sum(
            F.round(
                1e9
                * F.col("l")
                * (F.col("q1").cast("double") * F.col("q1"))
                / F.col("den4").cast("double")
            ).cast(_DEC)
        ).alias("z1"),
        F.sum(
            F.round(
                1e9
                * F.col("l")
                * (F.col("q2").cast("double") * F.col("q2"))
                / F.col("den4").cast("double")
            ).cast(_DEC)
        ).alias("z2"),
    )
    out = frz.crossJoin(F.broadcast(nn))
    nD = F.col("n").cast("double")
    return out.select(
        F.col("n1").alias("n_weekend"),
        F.col("n2").alias("n_weekday"),
        F.round(
            (nD - 1)
            / nD
            / nD
            * (
                F.col("z1").cast("double") / 1e9 / F.col("n1")
                + F.col("z2").cast("double") / 1e9 / F.col("n2")
            )
            / nD,
            4,
        ).alias("a2_akn"),
    )


# --------------------------------------------------------------------------
# q497 - Hoeffding's D independence test (Hoeffding 1948, the
# tie-adjusted Hollander-Wolfe form) between daily order count and
# daily revenue: detects ARBITRARY dependence (U-shapes, circles) that
# q431's Kendall tau and q306's Spearman — both monotone-only — miss;
# the rank-based sibling of q487's Chatterjee xi with a symmetric
# statistic and a classical null distribution.
# Parity: doubled mid-ranks 2R, 2S and quartered joint placements 4Q
# are exact integers from one bounded pair join; the three moment sums
# T1/T2/T3 are exact BIGINT (daily relation is calendar-bounded: terms
# <= (2*4e3)^4 ~ 4e15); D is one double expression. 4dp.
# Scale: the pair join is on the CALENDAR-BOUNDED daily relation
# (<= ~4e3 rows at any corpus size — q431's audited frame), broadcast
# nested-loop, never on corpus rows.
# --------------------------------------------------------------------------
@register(
    "q497_hoeffdings_d",
    oracle="""
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS x,
           CAST(SUM(CAST(ROUND(100.0 * o_totalprice) AS BIGINT)) AS BIGINT)
               AS y
    FROM orders GROUP BY 1
),
pl AS (
    SELECT a.day,
           CAST(2 * SUM(CASE WHEN b.x < a.x THEN 1 ELSE 0 END)
                + SUM(CASE WHEN b.x = a.x THEN 1 ELSE 0 END) + 1
                AS BIGINT) AS r2,
           CAST(2 * SUM(CASE WHEN b.y < a.y THEN 1 ELSE 0 END)
                + SUM(CASE WHEN b.y = a.y THEN 1 ELSE 0 END) + 1
                AS BIGINT) AS s2,
           CAST(4 + SUM(CASE WHEN b.day <> a.day THEN
                  4 * CASE WHEN b.x < a.x AND b.y < a.y THEN 1 ELSE 0 END
                + CASE WHEN b.x = a.x AND b.y = a.y THEN 1 ELSE 0 END
                + 2 * CASE WHEN b.x = a.x AND b.y < a.y THEN 1 ELSE 0 END
                + 2 * CASE WHEN b.x < a.x AND b.y = a.y THEN 1 ELSE 0 END
              ELSE 0 END) AS BIGINT) AS q4
    FROM daily a CROSS JOIN daily b
    GROUP BY a.day
),
mom AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM((q4 - 4) * (q4 - 8)) AS BIGINT) AS t1,
           CAST(SUM(CAST(r2 - 2 AS HUGEINT) * (r2 - 4) * (s2 - 2)
                    * (s2 - 4)) AS HUGEINT) AS t2,
           CAST(SUM((r2 - 4) * (s2 - 4) * (q4 - 4)) AS BIGINT) AS t3
    FROM pl
)
SELECT n AS n_days,
       ROUND(30.0 * ((n - 2.0) * (n - 3.0) * t1 + t2 - 2.0 * (n - 2.0) * t3)
             / (16.0 * n * (n - 1.0) * (n - 2.0) * (n - 3.0) * (n - 4.0)),
             4) AS d_stat
FROM mom
""",
    tags=("timeseries", "A12", "W2", "robust"),
)
def q497_hoeffdings_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hoeffding's D between daily order count and daily revenue:
    (n_days, d_stat). Pair join on the calendar-bounded daily relation."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("x"),
        F.sum(F.round(100.0 * F.col("o_totalprice")).cast("long")).alias(
            "y"
        ),
    )
    a = daily.select(
        F.col("day").alias("da"), F.col("x").alias("xa"), F.col("y").alias("ya")
    )
    b = daily.select(
        F.col("day").alias("db"), F.col("x").alias("xb"), F.col("y").alias("yb")
    )
    # bounded pair join: daily is calendar-bounded (q431's frame)
    pairs = a.join(F.broadcast(b), F.lit(True))
    lt_x = (F.col("xb") < F.col("xa")).cast("long")
    eq_x = (F.col("xb") == F.col("xa")).cast("long")
    lt_y = (F.col("yb") < F.col("ya")).cast("long")
    eq_y = (F.col("yb") == F.col("ya")).cast("long")
    off_diag = (F.col("db") != F.col("da")).cast("long")
    pl = pairs.groupBy("da").agg(
        (2 * F.sum(lt_x) + F.sum(eq_x) + 1).alias("r2"),
        (2 * F.sum(lt_y) + F.sum(eq_y) + 1).alias("s2"),
        (
            4
            + F.sum(
                off_diag
                * (4 * lt_x * lt_y + eq_x * eq_y + 2 * eq_x * lt_y + 2 * lt_x * eq_y)
            )
        ).alias("q4"),
    )
    mom = pl.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("q4") - 4) * (F.col("q4") - 8)).alias("t1"),
        # T2 <= days*(2*days)^4 wraps int64 past ~3e3 days — wide by
        # construction on both engines (ledger: q497)
        F.sum(
            (F.col("r2") - 2).cast(_DEC)
            * (F.col("r2") - 4)
            * (F.col("s2") - 2)
            * (F.col("s2") - 4)
        ).alias("t2"),
        F.sum(
            (F.col("r2") - 4) * (F.col("s2") - 4) * (F.col("q4") - 4)
        ).alias("t3"),
    )
    nD = F.col("n").cast("double")
    return mom.select(
        F.col("n").alias("n_days"),
        F.round(
            30.0
            * (
                (nD - 2.0) * (nD - 3.0) * F.col("t1")
                + F.col("t2")
                - 2.0 * (nD - 2.0) * F.col("t3")
            )
            / (
                16.0
                * nD
                * (nD - 1.0)
                * (nD - 2.0)
                * (nD - 3.0)
                * (nD - 4.0)
            ),
            4,
        ).alias("d_stat"),
    )


# --------------------------------------------------------------------------
# q498 - Theil's U (uncertainty coefficient) of document language given
# source: U(lang|source) = (H(lang) - H(lang|source)) / H(lang) — the
# NORMALISED, asymmetric mutual-information association ([0,1], 1 =
# source determines language), completing q250's Cramer's V (symmetric,
# chi2-based) and q438's raw MI with the directed curation read "how
# much does knowing the source tell us about language?".
# Parity: all entropies are sums of per-cell c*ln(ratio) terms over the
# BOUNDED (source x lang) grid, each frozen to round(1e6 * term) —
# exact-integer summation (q234's micro-nat discipline), one double
# ratio at the end. 4dp.
# Scale: one (source, lang) corpus aggregate to a bounded grid; all
# downstream arithmetic is grid-sized.
# --------------------------------------------------------------------------
@register(
    "q498_theils_u",
    oracle="""
WITH cells AS (
    SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c
    FROM documents GROUP BY source, lang
),
srcs AS (SELECT source, CAST(SUM(c) AS BIGINT) AS r FROM cells GROUP BY source),
langs AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS m FROM cells GROUP BY lang),
nn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells),
hy AS (
    SELECT CAST(SUM(CAST(ROUND(1000000.0 * l.m * LN(CAST(n.n AS DOUBLE) / l.m))
                AS BIGINT)) AS BIGINT) AS h6
    FROM langs l CROSS JOIN nn n
),
hyx AS (
    SELECT CAST(SUM(CAST(ROUND(1000000.0 * c.c * LN(CAST(s.r AS DOUBLE) / c.c))
                AS BIGINT)) AS BIGINT) AS h6
    FROM cells c JOIN srcs s ON s.source = c.source
)
SELECT n.n AS n_docs,
       ROUND(hy.h6 / 1000000.0 / n.n, 4) AS h_lang,
       ROUND(hyx.h6 / 1000000.0 / n.n, 4) AS h_lang_given_source,
       CASE WHEN hy.h6 = 0 THEN 0.0
            ELSE ROUND((hy.h6 - hyx.h6) / CAST(hy.h6 AS DOUBLE), 4)
       END AS theils_u
FROM hy CROSS JOIN hyx CROSS JOIN nn n
""",
    tags=("A12", "A6", "quality", "corpus-analytics"),
)
def q498_theils_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil's uncertainty coefficient U(lang|source) over documents:
    (n_docs, h_lang, h_lang_given_source, theils_u)."""
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("c"))
    srcs = cells.groupBy("source").agg(F.sum("c").alias("r"))
    langs = cells.groupBy("lang").agg(F.sum("c").alias("m"))
    nn = cells.agg(F.sum("c").alias("n"))
    hy = (
        langs.crossJoin(F.broadcast(nn))
        .select(
            F.round(
                1e6
                * F.col("m")
                * F.log(F.col("n").cast("double") / F.col("m"))
            )
            .cast("long")
            .alias("z")
        )
        .agg(F.sum("z").alias("h6"))
    )
    hyx = (
        cells.join(F.broadcast(srcs), "source")
        .select(
            F.round(
                1e6
                * F.col("c")
                * F.log(F.col("r").cast("double") / F.col("c"))
            )
            .cast("long")
            .alias("z")
        )
        .agg(F.sum("z").alias("h6"))
    )
    out = (
        hy.select(F.col("h6").alias("hy6"))
        .crossJoin(F.broadcast(hyx.select(F.col("h6").alias("hyx6"))))
        .crossJoin(F.broadcast(nn))
    )
    return out.select(
        F.col("n").alias("n_docs"),
        F.round(F.col("hy6") / 1e6 / F.col("n"), 4).alias("h_lang"),
        F.round(F.col("hyx6") / 1e6 / F.col("n"), 4).alias(
            "h_lang_given_source"
        ),
        # U := 0 on a single-language corpus (H(lang)=0 would give 0/0,
        # whose NaN/NULL rendering differs between engines — round-9 advice)
        F.when(F.col("hy6") == 0, F.lit(0.0))
        .otherwise(
            F.round(
                (F.col("hy6") - F.col("hyx6")) / F.col("hy6").cast("double"),
                4,
            )
        )
        .alias("theils_u"),
    )
