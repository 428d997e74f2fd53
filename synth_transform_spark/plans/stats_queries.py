"""Inferential-statistics and evaluation queries (round 5, q314+).

Rank-based tests, paired-classifier comparison, and precision/recall
evaluation — all computed on collapsed value DOMAINS (never a global row
sort), with integer sufficient statistics frozen before any cross-group
float sum so Spark's partitioned accumulation and DuckDB's single-node
accumulation hash identically.

Reference provenance: the reference repo's analysis notebooks compute
group comparisons and classifier evaluations with scipy/sklearn over
pandas frames (reference notebooks/classifiers.ipynb, outliers.ipynb);
here the same statistics are exact relational algebra.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..sources.readers import load_table
from .registry import register


# --------------------------------------------------------------------------
# q314 - Mann-Whitney rank-sum significance test per event type: does the
# value distribution differ between the odd-user and even-user cohorts?
# Complements q283 (the AUC effect size = U/n1n2, global) and q305 (KS on
# the pooled table) with the per-type tie-corrected z statistic.
# Computed WITHOUT a row sort: collapse to per-distinct-score cohort
# counts, one cum window over the score domain, then
#   2*R1 = sum_v a_v * (2*below_v + t_v + 1)        (exact integer)
#   2*U1 = 2*R1 - n1*(n1+1)                          (exact integer)
#   var  = n1*n2/12 * ((N+1) - T/(N*(N-1))),  T = sum_v (t_v^3 - t_v)
#   z    = (2*U1 - n1*n2) / (2*sqrt(var))
# Parity: scores frozen to round(1e4*value); 2R1/2U1/T are exact integers;
# z is one double expression over five integers, 4dp.
# Scale: one keyed aggregate to the (type, score) domain, one per-type
# domain window, one per-type aggregate. Domain-scaled, not row-scaled.
# --------------------------------------------------------------------------
@register(
    "q314_rank_sum_test",
    oracle="""
WITH frozen AS (
    SELECT event_type,
           CAST(ROUND(10000.0 * value) AS BIGINT) AS v,
           CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS t
    FROM events
),
g AS (
    SELECT event_type, v,
           CAST(SUM(t) AS BIGINT) AS a,
           CAST(SUM(1 - t) AS BIGINT) AS b
    FROM frozen GROUP BY event_type, v
),
cum AS (
    SELECT event_type, v, a, b, a + b AS t,
           CAST(COALESCE(SUM(a + b) OVER (PARTITION BY event_type ORDER BY v
                                          ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING), 0) AS BIGINT)
               AS below
    FROM g
),
s AS (
    SELECT event_type,
           CAST(SUM(a) AS BIGINT) AS n1,
           CAST(SUM(b) AS BIGINT) AS n2,
           CAST(SUM(a * (2 * below + t + 1)) AS BIGINT) AS two_r1,
           CAST(SUM(t * t * t - t) AS BIGINT) AS ties
    FROM cum GROUP BY event_type
)
SELECT event_type, n1, n2,
       two_r1 - n1 * (n1 + 1) AS two_u,
       ROUND((CAST(two_r1 - n1 * (n1 + 1) AS DOUBLE) - CAST(n1 AS DOUBLE) * n2)
             / (2.0 * SQRT(CAST(n1 AS DOUBLE) * n2 / 12.0
                           * ((n1 + n2 + 1)
                              - CAST(ties AS DOUBLE)
                                / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1))))),
             4) AS z
FROM s
ORDER BY event_type
""",
    tags=("ab-test", "A12", "W2"),
)
def q314_rank_sum_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected Mann-Whitney rank-sum z per event type, odd vs even
    user cohorts: (event_type, n1, n2, two_u, z)."""
    events = load_table(spark, sf_dir, "events")
    frozen = events.select(
        "event_type",
        F.round(10000.0 * F.col("value")).cast("long").alias("v"),
        (F.col("user_id") % 2 == 1).cast("long").alias("t"),
    )
    g = frozen.groupBy("event_type", "v").agg(
        F.sum("t").alias("a"), F.sum(1 - F.col("t")).alias("b")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = g.select(
        "event_type",
        "a",
        "b",
        (F.col("a") + F.col("b")).alias("t"),
        F.coalesce(F.sum(F.col("a") + F.col("b")).over(w), F.lit(0)).alias(
            "below"
        ),
    )
    s = cum.groupBy("event_type").agg(
        F.sum("a").alias("n1"),
        F.sum("b").alias("n2"),
        F.sum(
            F.col("a") * (2 * F.col("below") + F.col("t") + 1)
        ).alias("two_r1"),
        F.sum(
            F.col("t") * F.col("t") * F.col("t") - F.col("t")
        ).alias("ties"),
    )
    two_u = F.col("two_r1") - F.col("n1") * (F.col("n1") + 1)
    n1d = F.col("n1").cast("double")
    var = (
        n1d
        * F.col("n2")
        / 12.0
        * (
            (F.col("n1") + F.col("n2") + 1)
            - F.col("ties").cast("double")
            / (
                (F.col("n1") + F.col("n2")).cast("double")
                * (F.col("n1") + F.col("n2") - 1)
            )
        )
    )
    return s.select(
        "event_type",
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        two_u.cast("long").alias("two_u"),
        F.round(
            (two_u.cast("double") - n1d * F.col("n2")) / (2.0 * F.sqrt(var)), 4
        ).alias("z"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# q315 - Kruskal-Wallis H test per language: does document length
# (n_chars) differ across the 20 sources within each language? The k-group
# generalisation of q314 (and the rank-based alternative to a one-way
# ANOVA), again on the collapsed length domain:
#   2*R_j = sum_v c_jv * (2*below_v + t_v + 1)      (exact integer)
#   H     = 12/(N(N+1)) * sum_j R_j^2/n_j - 3(N+1)
#   H'    = H / (1 - T/(N^3 - N))                    (tie corrected)
# Parity: ranks and T are exact integers; each group's R_j^2/(4 n_j) term
# is computed as an identical double expression and frozen to
# round(1e4 * term) BEFORE the cross-group sum (a raw float sum over 20
# groups would be order-sensitive between engines); H, H' 4dp.
# Scale: two keyed aggregates ((lang, source, len) then (lang, len)), one
# per-lang domain window, one per-lang aggregate over <= |sources| rows.
# --------------------------------------------------------------------------
@register(
    "q315_kruskal_wallis",
    oracle="""
WITH g AS (
    SELECT lang, source, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
    FROM documents GROUP BY lang, source, n_chars
),
dom AS (
    SELECT lang, v, CAST(SUM(c) AS BIGINT) AS t
    FROM g GROUP BY lang, v
),
cum AS (
    SELECT lang, v, t,
           CAST(COALESCE(SUM(t) OVER (PARTITION BY lang ORDER BY v
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING), 0) AS BIGINT) AS below
    FROM dom
),
rj AS (
    SELECT g.lang, g.source,
           CAST(SUM(g.c) AS BIGINT) AS nj,
           CAST(SUM(g.c * (2 * cum.below + cum.t + 1)) AS BIGINT) AS two_r
    FROM g JOIN cum ON cum.lang = g.lang AND cum.v = g.v
    GROUP BY g.lang, g.source
),
terms AS (
    SELECT lang, nj, two_r,
           CAST(ROUND(10000.0 * (CAST(two_r AS DOUBLE) * two_r
                                 / (4.0 * nj))) AS BIGINT) AS term
    FROM rj
),
tt AS (
    SELECT lang, CAST(SUM(t * t * t - t) AS BIGINT) AS ties,
           CAST(SUM(t) AS BIGINT) AS n
    FROM dom GROUP BY lang
),
h AS (
    SELECT t.lang, t.n, CAST(COUNT(*) AS BIGINT) AS k,
           12.0 / (CAST(t.n AS DOUBLE) * (t.n + 1))
               * (CAST(SUM(term) AS DOUBLE) / 10000.0)
               - 3.0 * (t.n + 1) AS h_raw,
           CAST(MAX(t.ties) AS DOUBLE) AS ties
    FROM terms JOIN tt t ON t.lang = terms.lang
    GROUP BY t.lang, t.n
)
SELECT lang, n, k, ROUND(h_raw, 4) AS h,
       ROUND(h_raw / (1.0 - ties
                      / (CAST(n AS DOUBLE) * n * n - n)), 4) AS h_tie_corr
FROM h
ORDER BY lang
""",
    tags=("robust-stats", "A12", "W2"),
)
def q315_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H of n_chars across sources, per language:
    (lang, n, k, h, h_tie_corr)."""
    docs = load_table(spark, sf_dir, "documents")
    g = docs.groupBy(
        "lang", "source", F.col("n_chars").alias("v")
    ).agg(F.count(F.lit(1)).alias("c"))
    dom = g.groupBy("lang", "v").agg(F.sum("c").alias("t"))
    w = (
        Window.partitionBy("lang")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = dom.select(
        "lang",
        "v",
        "t",
        F.coalesce(F.sum("t").over(w), F.lit(0)).alias("below"),
    )
    rj = (
        g.join(cum, ["lang", "v"])
        .groupBy("lang", "source")
        .agg(
            F.sum("c").alias("nj"),
            F.sum(
                F.col("c") * (2 * F.col("below") + F.col("t") + 1)
            ).alias("two_r"),
        )
    )
    terms = rj.select(
        "lang",
        "nj",
        F.round(
            10000.0
            * (
                F.col("two_r").cast("double")
                * F.col("two_r")
                / (4.0 * F.col("nj"))
            )
        )
        .cast("long")
        .alias("term"),
    )
    tt = dom.groupBy("lang").agg(
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias(
            "ties"
        ),
        F.sum("t").alias("n"),
    )
    h = (
        terms.join(F.broadcast(tt), "lang")
        .groupBy("lang", "n")
        .agg(
            F.count(F.lit(1)).alias("k"),
            (
                12.0
                / (F.col("n").cast("double") * (F.col("n") + 1))
                * (F.sum("term").cast("double") / 10000.0)
                - 3.0 * (F.col("n") + 1)
            ).alias("h_raw"),
            F.max("ties").cast("double").alias("ties"),
        )
    )
    nd = F.col("n").cast("double")
    return h.select(
        "lang",
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("k"),
        F.round(F.col("h_raw"), 4).alias("h"),
        F.round(
            F.col("h_raw") / (1.0 - F.col("ties") / (nd * nd * nd - nd)), 4
        ).alias("h_tie_corr"),
    ).orderBy("lang")


# --------------------------------------------------------------------------
# q316 - exact average precision (area under the precision-recall curve,
# step-wise, sklearn's average_precision definition) of `value` ranking
# purchases: AP = sum_i (R_i - R_{i-1}) * P_i over distinct score
# thresholds descending = (1/P) * sum_v p_v * cumpos_v / cumall_v.
# The PR-curve companion to q283's ROC-AUC — the metric that matters when
# positives are rare (class-imbalanced quality classifiers).
# Parity: scores frozen to round(1e4*value); p_v, cumpos_v, cumall_v are
# exact integers; each threshold's term is an identical double expression
# frozen to round(1e6 * term) before the cross-threshold sum; 4dp.
# Scale: one keyed aggregate to the score domain, one domain window
# (descending), one 1-row aggregate.
# --------------------------------------------------------------------------
@register(
    "q316_average_precision",
    oracle="""
WITH scored AS (
    SELECT CAST(ROUND(10000.0 * value) AS BIGINT) AS v,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
    FROM events
),
g AS (
    SELECT v, CAST(SUM(pos) AS BIGINT) AS p, CAST(COUNT(*) AS BIGINT) AS c
    FROM scored GROUP BY v
),
cum AS (
    SELECT v, p,
           CAST(SUM(p) OVER (ORDER BY v DESC ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS cumpos,
           CAST(SUM(c) OVER (ORDER BY v DESC ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS cumall
    FROM g
),
s AS (
    SELECT CAST(SUM(CAST(ROUND(1000000.0 * (CAST(p AS DOUBLE) * cumpos
                                            / cumall)) AS BIGINT))
                AS BIGINT) AS num,
           CAST(SUM(p) AS BIGINT) AS n_pos,
           CAST(MAX(cumall) AS BIGINT) AS n
    FROM cum
)
SELECT n, n_pos,
       ROUND(CAST(n_pos AS DOUBLE) / n, 4) AS prevalence,
       ROUND(CAST(num AS DOUBLE) / 1000000.0 / n_pos, 4) AS avg_precision
FROM s
""",
    tags=("ml-eval", "A12", "W4"),
)
def q316_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Step-exact average precision of `value` ranking purchases:
    (n, n_pos, prevalence, avg_precision)."""
    events = load_table(spark, sf_dir, "events")
    scored = events.select(
        F.round(10000.0 * F.col("value")).cast("long").alias("v"),
        (F.col("event_type") == "purchase").cast("long").alias("pos"),
    )
    g = scored.groupBy("v").agg(
        F.sum("pos").alias("p"), F.count(F.lit(1)).alias("c")
    )
    w = Window.orderBy(F.desc("v")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = g.select(
        "p",
        F.sum("p").over(w).alias("cumpos"),
        F.sum("c").over(w).alias("cumall"),
    )
    s = cum.agg(
        F.sum(
            F.round(
                1000000.0
                * (
                    F.col("p").cast("double")
                    * F.col("cumpos")
                    / F.col("cumall")
                )
            ).cast("long")
        ).alias("num"),
        F.sum("p").alias("n_pos"),
        F.max("cumall").alias("n"),
    )
    return s.select(
        F.col("n").cast("long").alias("n"),
        F.col("n_pos").cast("long").alias("n_pos"),
        F.round(F.col("n_pos").cast("double") / F.col("n"), 4).alias(
            "prevalence"
        ),
        F.round(
            F.col("num").cast("double") / 1000000.0 / F.col("n_pos"), 4
        ).alias("avg_precision"),
    )


# --------------------------------------------------------------------------
# q317 - McNemar's paired test: do two rule-based is-English classifiers
# disagree more than chance on the SAME documents? Classifier A: the
# token 'the' appears in the text; classifier B: mean token length < 5.5
# chars. Ground truth: lang = 'en'. The paired design uses only the
# discordant counts b (A right, B wrong) and c (B right, A wrong):
# chi2_cc = (|b - c| - 1)^2 / (b + c), the continuity-corrected form —
# the right test for "is the new heuristic actually better on the same
# eval set", where two independent accuracy CIs (q175-style) are wrong.
# Parity: predictions are deterministic string algebra; all four
# concordance counts are exact integers from one conditional aggregate;
# chi2 is one double expression, 4dp; b + c = 0 yields chi2 = 0.0 via an
# identical CASE on both sides.
# Scale: one full-table conditional aggregate with map-side partials;
# zero joins, zero windows, 1 output row.
# --------------------------------------------------------------------------
@register(
    "q317_mcnemar",
    oracle="""
WITH preds AS (
    SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
           CASE WHEN ' ' || LOWER(text) || ' ' LIKE '% the %'
                THEN 1 ELSE 0 END AS pa,
           CASE WHEN CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
                     / LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                                       t -> t <> '')) < 5.5
                THEN 1 ELSE 0 END AS pb
    FROM documents
),
cc AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN pa = y AND pb = y THEN 1 ELSE 0 END)
                AS BIGINT) AS both_right,
           CAST(SUM(CASE WHEN pa = y AND pb <> y THEN 1 ELSE 0 END)
                AS BIGINT) AS b,
           CAST(SUM(CASE WHEN pa <> y AND pb = y THEN 1 ELSE 0 END)
                AS BIGINT) AS c,
           CAST(SUM(CASE WHEN pa <> y AND pb <> y THEN 1 ELSE 0 END)
                AS BIGINT) AS both_wrong,
           CAST(SUM(CASE WHEN pa = y THEN 1 ELSE 0 END) AS BIGINT) AS a_right,
           CAST(SUM(CASE WHEN pb = y THEN 1 ELSE 0 END) AS BIGINT) AS b_right
    FROM preds
)
SELECT n, both_right, b, c, both_wrong,
       ROUND(CAST(a_right AS DOUBLE) / n, 4) AS acc_a,
       ROUND(CAST(b_right AS DOUBLE) / n, 4) AS acc_b,
       CASE WHEN b + c = 0 THEN 0.0
            ELSE ROUND((ABS(CAST(b AS DOUBLE) - c) - 1)
                       * (ABS(CAST(b AS DOUBLE) - c) - 1) / (b + c), 4)
       END AS chi2_cc
FROM cc
""",
    tags=("ml-eval", "A12", "P12"),
)
def q317_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar continuity-corrected chi-square for two paired is-English
    heuristics: (n, both_right, b, c, both_wrong, acc_a, acc_b, chi2_cc)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda t: t != "")
    preds = docs.select(
        (F.col("lang") == "en").cast("int").alias("y"),
        F.concat(F.lit(" "), F.lower("text"), F.lit(" "))
        .contains(" the ")
        .cast("int")
        .alias("pa"),
        (
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
            .cast("double")
            / F.size(toks)
            < 5.5
        )
        .cast("int")
        .alias("pb"),
    )
    cc = preds.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            ((F.col("pa") == F.col("y")) & (F.col("pb") == F.col("y"))).cast(
                "long"
            )
        ).alias("both_right"),
        F.sum(
            ((F.col("pa") == F.col("y")) & (F.col("pb") != F.col("y"))).cast(
                "long"
            )
        ).alias("b"),
        F.sum(
            ((F.col("pa") != F.col("y")) & (F.col("pb") == F.col("y"))).cast(
                "long"
            )
        ).alias("c"),
        F.sum(
            ((F.col("pa") != F.col("y")) & (F.col("pb") != F.col("y"))).cast(
                "long"
            )
        ).alias("both_wrong"),
        F.sum((F.col("pa") == F.col("y")).cast("long")).alias("a_right"),
        F.sum((F.col("pb") == F.col("y")).cast("long")).alias("b_right"),
    )
    bd = F.col("b").cast("double")
    chi2 = F.when(F.col("b") + F.col("c") == 0, F.lit(0.0)).otherwise(
        F.round(
            (F.abs(bd - F.col("c")) - 1)
            * (F.abs(bd - F.col("c")) - 1)
            / (F.col("b") + F.col("c")),
            4,
        )
    )
    return cc.select(
        F.col("n").cast("long").alias("n"),
        F.col("both_right").cast("long").alias("both_right"),
        F.col("b").cast("long").alias("b"),
        F.col("c").cast("long").alias("c"),
        F.col("both_wrong").cast("long").alias("both_wrong"),
        F.round(F.col("a_right").cast("double") / F.col("n"), 4).alias(
            "acc_a"
        ),
        F.round(F.col("b_right").cast("double") / F.col("n"), 4).alias(
            "acc_b"
        ),
        chi2.alias("chi2_cc"),
    )


# --------------------------------------------------------------------------
# q318 - 1-D Wasserstein (earth mover's) distance per event type between
# the odd-user and even-user value distributions: W1 = integral
# |F1 - F2| dv on the collapsed value domain. The magnitude-aware drift
# measure in PHYSICAL units that q305's KS (max gap) and q302's PSI
# (binned, unitless) cannot give.
# Parity: values frozen to cents; per-segment terms are exact integer
# cross-products |k1*n2 - k2*n1| * (v_next - v); one bigint sum per type;
# W1 = sum / (n1*n2) / 100 back in value units, 4dp. (Integer bound:
# n1*n2*range(cents) per term — exact through ~1e9 rows/type at this
# value range; beyond that the term drops to the identical double
# expression both engines share.)
# Scale: one keyed aggregate to the (type, value) domain, one per-type
# domain window (cum counts + lead), one per-type reduce.
# --------------------------------------------------------------------------
@register(
    "q318_wasserstein",
    oracle="""
WITH frozen AS (
    SELECT event_type, CAST(ROUND(100.0 * value) AS BIGINT) AS v,
           CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS t
    FROM events
),
g AS (
    SELECT event_type, v,
           CAST(SUM(t) AS BIGINT) AS c1,
           CAST(SUM(1 - t) AS BIGINT) AS c2
    FROM frozen GROUP BY event_type, v
),
cum AS (
    SELECT event_type, v,
           CAST(SUM(c1) OVER w AS BIGINT) AS k1,
           CAST(SUM(c2) OVER w AS BIGINT) AS k2,
           LEAD(v, 1, v) OVER (PARTITION BY event_type ORDER BY v) AS v_next
    FROM g
    WINDOW w AS (PARTITION BY event_type ORDER BY v ROWS UNBOUNDED PRECEDING)
),
nn AS (
    SELECT event_type,
           CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
    FROM g GROUP BY event_type
),
s AS (
    SELECT c.event_type,
           CAST(SUM(ABS(c.k1 * n.n2 - c.k2 * n.n1) * (c.v_next - c.v))
                AS BIGINT) AS num
    FROM cum c JOIN nn n ON n.event_type = c.event_type
    GROUP BY c.event_type
)
SELECT s.event_type, n.n1, n.n2,
       ROUND(CAST(s.num AS DOUBLE)
             / (CAST(n.n1 AS DOUBLE) * n.n2) / 100.0, 4) AS w1
FROM s JOIN nn n ON n.event_type = s.event_type
ORDER BY s.event_type
""",
    tags=("ab-test", "A12", "W2"),
)
def q318_wasserstein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Earth mover's distance between odd/even cohort value distributions
    per event type: (event_type, n1, n2, w1)."""
    events = load_table(spark, sf_dir, "events")
    frozen = events.select(
        "event_type",
        F.round(100.0 * F.col("value")).cast("long").alias("v"),
        (F.col("user_id") % 2 == 1).cast("long").alias("t"),
    )
    g = frozen.groupBy("event_type", "v").agg(
        F.sum("t").alias("c1"), F.sum(1 - F.col("t")).alias("c2")
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wlead = Window.partitionBy("event_type").orderBy("v")
    cum = g.select(
        "event_type",
        "v",
        F.sum("c1").over(wcum).alias("k1"),
        F.sum("c2").over(wcum).alias("k2"),
        F.lead("v", 1).over(wlead).alias("v_next"),
    ).withColumn("v_next", F.coalesce("v_next", F.col("v")))
    nn = g.groupBy("event_type").agg(
        F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
    )
    s = (
        cum.join(F.broadcast(nn), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(
                F.abs(
                    F.col("k1") * F.col("n2") - F.col("k2") * F.col("n1")
                )
                * (F.col("v_next") - F.col("v"))
            ).alias("num")
        )
    )
    return (
        s.join(F.broadcast(nn), "event_type")
        .select(
            "event_type",
            F.col("n1").cast("long").alias("n1"),
            F.col("n2").cast("long").alias("n2"),
            F.round(
                F.col("num").cast("double")
                / (F.col("n1").cast("double") * F.col("n2"))
                / 100.0,
                4,
            ).alias("w1"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# q319 - isotonic calibration curve (pool-adjacent-violators) of `value`
# as a purchase-probability score, on 20 equal-width score bins: the
# monotone-nondecreasing fit via the exact minimax identity
#   iso_k = max_{i<=k} min_{j>=k} (pos_{i..j}) / (n_{i..j}),
# computed relationally from bin prefix sums (no sequential PAVA loop).
# The calibrated-probability companion to q249's ECE: q249 measures
# miscalibration, this produces the monotone recalibration map itself.
# Parity: bin edges from exact integer min/max; pooled rates are
# identical double divisions of exact integer prefix differences; the
# minimax is over identical values on both engines; 4dp.
# Scale: corpus collapses to <= 20 bin rows in one keyed aggregate (plus
# a 1-row min/max broadcast); the O(bins^3) minimax expansion is algebra
# over a bounded relation that never touches the corpus again.
# --------------------------------------------------------------------------
_ISO_BINS = 20


@register(
    "q319_isotonic_calibration",
    oracle=f"""
WITH scored AS (
    SELECT CAST(ROUND(100.0 * value) AS BIGINT) AS v,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
    FROM events
),
mm AS (
    SELECT MIN(v) AS vmin, MAX(v) AS vmax FROM scored
),
binned AS (
    SELECT CAST(((s.v - m.vmin) * {_ISO_BINS})
                // (m.vmax - m.vmin + 1) AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(s.pos) AS BIGINT) AS pos
    FROM scored s CROSS JOIN mm m
    GROUP BY 1
),
idx AS (
    SELECT bin, n, pos,
           CAST(SUM(n) OVER w AS BIGINT) AS cn,
           CAST(SUM(pos) OVER w AS BIGINT) AS cp
    FROM binned
    WINDOW w AS (ORDER BY bin ROWS UNBOUNDED PRECEDING)
),
pairs AS (
    SELECT i.bin AS i, j.bin AS j,
           CAST(j.cp - i.cp + i.pos AS DOUBLE)
               / (j.cn - i.cn + i.n) AS ratio
    FROM idx i JOIN idx j ON i.bin <= j.bin
),
mins AS (
    SELECT p.i, k.bin AS k, MIN(p.ratio) AS lo
    FROM pairs p JOIN idx k ON p.i <= k.bin AND k.bin <= p.j
    GROUP BY p.i, k.bin
),
iso AS (
    SELECT k, MAX(lo) AS iso_rate FROM mins GROUP BY k
)
SELECT b.bin, b.n, b.pos,
       ROUND(CAST(b.pos AS DOUBLE) / b.n, 4) AS raw_rate,
       ROUND(i.iso_rate, 4) AS iso_rate
FROM binned b JOIN iso i ON i.k = b.bin
ORDER BY b.bin
""",
    tags=("ml-eval", "A12", "W2"),
)
def q319_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAVA isotonic calibration of value->purchase on 20 score bins:
    (bin, n, pos, raw_rate, iso_rate)."""
    events = load_table(spark, sf_dir, "events")
    scored = events.select(
        F.round(100.0 * F.col("value")).cast("long").alias("v"),
        (F.col("event_type") == "purchase").cast("long").alias("pos"),
    )
    mm = scored.agg(
        F.min("v").alias("vmin"), F.max("v").alias("vmax")
    )
    binned = (
        scored.crossJoin(F.broadcast(mm))
        .groupBy(
            F.expr(
                f"CAST(((v - vmin) * {_ISO_BINS})"
                " div (vmax - vmin + 1) AS BIGINT)"
            ).alias("bin")
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("pos").alias("pos"))
    )
    w = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    idx = binned.select(
        "bin",
        "n",
        "pos",
        F.sum("n").over(w).alias("cn"),
        F.sum("pos").over(w).alias("cp"),
    )
    i = idx.select(
        F.col("bin").alias("i"),
        F.col("n").alias("ni"),
        F.col("pos").alias("pi"),
        F.col("cn").alias("cni"),
        F.col("cp").alias("cpi"),
    )
    j = idx.select(
        F.col("bin").alias("j"),
        F.col("cn").alias("cnj"),
        F.col("cp").alias("cpj"),
    )
    pairs = i.join(j, F.col("i") <= F.col("j")).select(
        "i",
        "j",
        (
            (F.col("cpj") - F.col("cpi") + F.col("pi")).cast("double")
            / (F.col("cnj") - F.col("cni") + F.col("ni"))
        ).alias("ratio"),
    )
    k = idx.select(F.col("bin").alias("k"))
    mins = (
        pairs.join(
            k, (F.col("i") <= F.col("k")) & (F.col("k") <= F.col("j"))
        )
        .groupBy("i", "k")
        .agg(F.min("ratio").alias("lo"))
    )
    iso = mins.groupBy("k").agg(F.max("lo").alias("iso_rate"))
    return (
        binned.join(iso, binned["bin"] == iso["k"])
        .select(
            "bin",
            F.col("n").cast("long").alias("n"),
            F.col("pos").cast("long").alias("pos"),
            F.round(F.col("pos").cast("double") / F.col("n"), 4).alias(
                "raw_rate"
            ),
            F.round(F.col("iso_rate"), 4).alias("iso_rate"),
        )
        .orderBy("bin")
    )


# --------------------------------------------------------------------------
# q320 - peak concurrency per event type (sweep line over the interval
# domain): each event holds a resource for 60*(1 + user_id % 5) seconds;
# the peak number of simultaneously-open intervals and the earliest
# instant it is reached. Classic capacity-planning output (max concurrent
# sessions/connections) computed WITHOUT pairwise interval joins: +1/-1
# deltas collapse per instant, one cum window over the per-type time
# domain, one argmax. Half-open [s, e) semantics: an interval ending at t
# frees its slot before one starting at t takes it (both engines collapse
# the instant to one net row, so the within-instant order is identity).
# Parity: all counts exact integers; peak_at is an exact timestamp.
# Scale: 2 narrow rows per event -> one keyed aggregate to the (type,
# instant) domain -> per-type cum window -> 1-row-per-type argmax.
# --------------------------------------------------------------------------
@register(
    "q320_peak_concurrency",
    oracle="""
WITH deltas AS (
    SELECT event_type, CAST(ts AS TIMESTAMP) AS t, 1 AS d FROM events
    UNION ALL
    SELECT event_type,
           CAST(ts AS TIMESTAMP)
               + INTERVAL (60 * (1 + user_id % 5)) SECOND AS t,
           -1 AS d
    FROM events
),
net AS (
    SELECT event_type, t, CAST(SUM(d) AS BIGINT) AS net
    FROM deltas GROUP BY event_type, t
),
cum AS (
    SELECT event_type, t,
           CAST(SUM(net) OVER (PARTITION BY event_type ORDER BY t
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS open
    FROM net
),
peak AS (
    SELECT event_type, CAST(MAX(open) AS BIGINT) AS peak
    FROM cum GROUP BY event_type
)
SELECT p.event_type, p.peak, MIN(c.t) AS peak_at
FROM peak p JOIN cum c ON c.event_type = p.event_type AND c.open = p.peak
GROUP BY p.event_type, p.peak
ORDER BY p.event_type
""",
    tags=("capacity", "A1", "W2"),
)
def q320_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line peak concurrent intervals per event type:
    (event_type, peak, peak_at)."""
    events = load_table(spark, sf_dir, "events")
    starts = events.select(
        "event_type", F.col("ts").alias("t"), F.lit(1).alias("d")
    )
    ends = events.select(
        "event_type",
        F.expr("timestampadd(SECOND, 60 * (1 + user_id % 5), ts)").alias(
            "t"
        ),
        F.lit(-1).alias("d"),
    )
    net = (
        starts.unionByName(ends)
        .groupBy("event_type", "t")
        .agg(F.sum("d").alias("net"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = net.select(
        "event_type", "t", F.sum("net").over(w).alias("open")
    )
    peak = cum.groupBy("event_type").agg(F.max("open").alias("peak"))
    return (
        cum.join(
            F.broadcast(peak),
            ["event_type"],
        )
        .filter(F.col("open") == F.col("peak"))
        .groupBy("event_type", "peak")
        .agg(F.min("t").alias("peak_at"))
        .select(
            "event_type",
            F.col("peak").cast("long").alias("peak"),
            "peak_at",
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# q321 - shard-rebalancing audit: when the cluster grows from 8 to 9
# shards, what fraction of keys move under (a) mod-N assignment vs (b) a
# consistent-hash ring with 16 virtual nodes per shard? The infra-planning
# companion to q292 (broadcast advisor) and q266 (skew audit): mod-N
# reshuffles ~8/9 of the corpus, the ring only the ~1/9 arc the new
# shard claims — this query measures both exactly on the real key set.
# The ring points are md5 digests precomputed at plan-build time and
# embedded as SORTED literal arrays on BOTH engines; a key's shard is the
# first ring point >= md5(key) (wrapping to the smallest point), so the
# whole assignment is narrow JVM array algebra — no join, no explode.
# Ring growth only ADDS points, so a key moved <=> its successor point
# changed.
# Parity: md5 hex strings compare identically everywhere; counts exact.
# Scale: one narrow map over the keys + one 2-row aggregate. O(|ring|)
# comparisons per key, zero shuffles beyond the final reduce.
# --------------------------------------------------------------------------
import hashlib as _hashlib

_RING_VNODES = 16


def _ring_points(n_shards: int) -> list[str]:
    pts = [
        _hashlib.md5(f"node{n}:{r}".encode()).hexdigest()
        for n in range(n_shards)
        for r in range(_RING_VNODES)
    ]
    return sorted(pts)


_RING8 = _ring_points(8)
_RING9 = _ring_points(9)


def _succ_sql(ring: list[str], h: str) -> str:
    lit = "[" + ", ".join(f"'{p}'" for p in ring) + "]"
    return (
        f"COALESCE(LIST_MIN(LIST_FILTER({lit}, p -> p >= {h})),"
        f" '{ring[0]}')"
    )


@register(
    "q321_rebalance_audit",
    oracle=f"""
WITH keys AS (
    SELECT doc_id, MD5(CAST(doc_id AS VARCHAR)) AS h FROM documents
),
flags AS (
    SELECT CASE WHEN doc_id % 8 <> doc_id % 9 THEN 1 ELSE 0 END AS mod_moved,
           CASE WHEN {_succ_sql(_RING8, "h")} <> {_succ_sql(_RING9, "h")}
                THEN 1 ELSE 0 END AS ring_moved
    FROM keys
)
SELECT 'mod' AS strategy,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(mod_moved) AS BIGINT) AS n_moved,
       ROUND(CAST(SUM(mod_moved) AS DOUBLE) / COUNT(*), 4) AS moved_frac
FROM flags
UNION ALL
SELECT 'ring' AS strategy,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(ring_moved) AS BIGINT) AS n_moved,
       ROUND(CAST(SUM(ring_moved) AS DOUBLE) / COUNT(*), 4) AS moved_frac
FROM flags
ORDER BY strategy
""",
    tags=("capacity", "A12", "P12"),
)
def q321_rebalance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moved-key fraction growing 8->9 shards, mod-N vs consistent-hash
    ring: (strategy, n_keys, n_moved, moved_frac)."""
    docs = load_table(spark, sf_dir, "documents")

    def succ(ring: list[str]):
        arr = F.array(*[F.lit(p) for p in ring])
        return F.coalesce(
            F.array_min(F.filter(arr, lambda p: p >= F.col("h"))),
            F.lit(ring[0]),
        )

    flags = docs.select(
        "doc_id", F.md5(F.col("doc_id").cast("string")).alias("h")
    ).select(
        (F.col("doc_id") % 8 != F.col("doc_id") % 9)
        .cast("long")
        .alias("mod_moved"),
        (succ(_RING8) != succ(_RING9)).cast("long").alias("ring_moved"),
    )
    agg = flags.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("mod_moved").alias("mod_moved"),
        F.sum("ring_moved").alias("ring_moved"),
    )
    out = agg.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("mod").alias("strategy"),
                    F.col("n_keys").cast("long").alias("n_keys"),
                    F.col("mod_moved").cast("long").alias("n_moved"),
                    F.round(
                        F.col("mod_moved").cast("double") / F.col("n_keys"),
                        4,
                    ).alias("moved_frac"),
                ),
                F.struct(
                    F.lit("ring").alias("strategy"),
                    F.col("n_keys").cast("long").alias("n_keys"),
                    F.col("ring_moved").cast("long").alias("n_moved"),
                    F.round(
                        F.col("ring_moved").cast("double") / F.col("n_keys"),
                        4,
                    ).alias("moved_frac"),
                ),
            )
        ).alias("r")
    ).select("r.*")
    return out.orderBy("strategy")


# --------------------------------------------------------------------------
# q322 - cross-split contamination audit: how many EXACT near-duplicate
# pairs (shingle Jaccard >= 0.5, the q182 prefix-filter truth) straddle
# the q104 train/val/test split? Near-dups of a test document sitting in
# train are silent eval leakage — the #1 "my benchmark is inflated"
# failure in LLM data pipelines. Composes the two proven operators: the
# PPJoin-family exact set-similarity join and the md5-percentile split.
# Parity: both components already hash-match individually; the composite
# adds one split lookup per pair endpoint and a bounded (split, split)
# rollup, with (sa, sb) ordered lexicographically so the pair direction
# is canonical.
# Scale: the prefix-filter join bounds the candidate space (q182's
# posture); split assignment is a narrow md5 map joined onto the pair
# endpoints (two hash joins on doc id); the rollup is <= 9 rows.
# --------------------------------------------------------------------------
def _q322_oracle() -> str:
    from .dedup_queries import _SHINGLES_CTE

    return f"""
WITH {_SHINGLES_CTE},
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS ov
    FROM sh a JOIN sh b ON b.shingle = a.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
pairs AS (
    SELECT ia, ib
    FROM inter
    JOIN sizes sa ON sa.doc_id = ia
    JOIN sizes sb ON sb.doc_id = ib
    WHERE ROUND(CAST(ov AS DOUBLE) / (sa.sz + sb.sz - ov), 4) >= 0.5
),
splits AS (
    SELECT doc_id,
           CASE WHEN u < 80 THEN 'train' WHEN u < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM (
        SELECT doc_id,
               CAST(('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 8))
                    ::UBIGINT AS BIGINT) % 100 AS u
        FROM documents
    ) t
)
SELECT LEAST(x.split, y.split) AS split_a,
       GREATEST(x.split, y.split) AS split_b,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN x.split <> y.split THEN 1 ELSE 0 END) AS BIGINT)
           AS n_leaky
FROM pairs p
JOIN splits x ON x.doc_id = p.ia
JOIN splits y ON y.doc_id = p.ib
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register("q322_split_leakage", oracle=_q322_oracle(), tags=("training-prep", "dedup-setsim", "A4"))
def q322_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs straddling the train/val/test split:
    (split_a, split_b, n_pairs, n_leaky)."""
    from ..operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.prefix_jaccard_join(docs, threshold=0.5).select(
        "id_a", "id_b"
    )
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    splits = docs.select(
        "doc_id",
        F.when(u < 80, F.lit("train"))
        .when(u < 90, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )
    joined = (
        pairs.join(
            splits.select(
                F.col("doc_id").alias("id_a"), F.col("split").alias("sa")
            ),
            "id_a",
        )
        .join(
            splits.select(
                F.col("doc_id").alias("id_b"), F.col("split").alias("sb")
            ),
            "id_b",
        )
    )
    return (
        joined.groupBy(
            F.least("sa", "sb").alias("split_a"),
            F.greatest("sa", "sb").alias("split_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum((F.col("sa") != F.col("sb")).cast("long")).alias(
                "n_leaky"
            ),
        )
        .orderBy("split_a", "split_b")
    )


# --------------------------------------------------------------------------
# q323 - seeded sign-permutation test for the odd-vs-even cohort daily
# effect, per event type: the exact-resampling alternative to q314's
# asymptotic z when the day count is small. The statistic is the sum of
# per-day cohort mean differences; the null distribution comes from B=199
# deterministic sign flips s(b, day) = md5 parity, so BOTH engines
# enumerate the identical permutation set:
#   p = (1 + #{b : |T_b| >= |T_obs|}) / (B + 1).
# Parity: daily means are exact `div` integers (the q312 freeze), so
# every T_b is an exact integer and the |T_b| >= |T_obs| comparisons are
# integer — no float anywhere until the final p.
# Scale: the corpus collapses to the (type, day) relation FIRST (one
# keyed aggregate); the B-fold expansion runs on the bounded daily
# relation (|types| x days x B rows), never on raw events.
# --------------------------------------------------------------------------
_PERM_B = 199


@register(
    "q323_permutation_test",
    oracle=f"""
WITH daily AS (
    SELECT event_type,
           CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
           CAST(SUM(CASE WHEN user_id % 2 = 1
                         THEN CAST(ROUND(100.0 * value) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS s1,
           CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS c1,
           CAST(SUM(CASE WHEN user_id % 2 = 0
                         THEN CAST(ROUND(100.0 * value) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS s0,
           CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS c0
    FROM events GROUP BY 1, 2
),
diffs AS (
    SELECT event_type, day, (s1 // c1) - (s0 // c0) AS d
    FROM daily WHERE c1 > 0 AND c0 > 0
),
obs AS (
    SELECT event_type, CAST(SUM(d) AS BIGINT) AS t_obs,
           CAST(COUNT(*) AS BIGINT) AS n_days
    FROM diffs GROUP BY event_type
),
perms AS (
    SELECT d.event_type, b.b,
           CAST(SUM(CASE WHEN CAST(('0x' || SUBSTR(
                         MD5(CAST(b.b AS VARCHAR) || ':'
                             || CAST(d.day AS VARCHAR)), 1, 8))::UBIGINT
                         AS BIGINT) % 2 = 0
                    THEN d.d ELSE -d.d END) AS BIGINT) AS t_b
    FROM diffs d CROSS JOIN (SELECT UNNEST(RANGE(1, {_PERM_B} + 1)) AS b) b
    GROUP BY 1, 2
)
SELECT o.event_type, o.n_days, o.t_obs,
       ROUND((1.0 + SUM(CASE WHEN ABS(p.t_b) >= ABS(o.t_obs)
                             THEN 1 ELSE 0 END))
             / ({_PERM_B} + 1.0), 4) AS p_value
FROM obs o JOIN perms p ON p.event_type = o.event_type
GROUP BY o.event_type, o.n_days, o.t_obs
ORDER BY o.event_type
""",
    tags=("ab-test", "A12", "J14"),
)
def q323_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded sign-permutation test of the daily cohort effect per type:
    (event_type, n_days, t_obs, p_value)."""
    events = load_table(spark, sf_dir, "events")
    x = F.round(100.0 * F.col("value")).cast("long")
    odd = (F.col("user_id") % 2 == 1).cast("long")
    daily = events.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(
        F.sum(x * odd).alias("s1"),
        F.sum(odd).alias("c1"),
        F.sum(x * (1 - odd)).alias("s0"),
        F.sum(1 - odd).alias("c0"),
    )
    diffs = daily.filter((F.col("c1") > 0) & (F.col("c0") > 0)).select(
        "event_type",
        "day",
        (F.expr("s1 div c1") - F.expr("s0 div c0")).alias("d"),
    )
    obs = diffs.groupBy("event_type").agg(
        F.sum("d").alias("t_obs"), F.count(F.lit(1)).alias("n_days")
    )
    b = spark.range(1, _PERM_B + 1).select(F.col("id").alias("b"))
    sign = F.when(
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("b").cast("string"),
                        F.lit(":"),
                        F.col("day").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 2
        == 0,
        F.col("d"),
    ).otherwise(-F.col("d"))
    perms = (
        diffs.crossJoin(F.broadcast(b))
        .groupBy("event_type", "b")
        .agg(F.sum(sign).alias("t_b"))
    )
    return (
        perms.join(F.broadcast(obs), "event_type")
        .groupBy("event_type", "n_days", "t_obs")
        .agg(
            F.round(
                (
                    1.0
                    + F.sum(
                        (F.abs(F.col("t_b")) >= F.abs(F.col("t_obs"))).cast(
                            "long"
                        )
                    )
                )
                / (_PERM_B + 1.0),
                4,
            ).alias("p_value")
        )
        .select(
            "event_type",
            F.col("n_days").cast("long").alias("n_days"),
            F.col("t_obs").cast("long").alias("t_obs"),
            "p_value",
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# q324 - Krippendorff's alpha (nominal, binary) for three rule-based
# is-English raters with MISSING ratings: rater A (has-'the') rates every
# document, rater B (short mean token) abstains below 150 chars, rater C
# (short-word fraction) abstains below 30 tokens. The chance-corrected
# agreement coefficient that q280's kappa cannot give once raters abstain
# (kappa needs a complete 2-rater grid); units with < 2 ratings drop out,
# exactly per the coincidence-matrix definition:
#   alpha = 1 - (n-1) * q01 / (2 * nc1 * nc0)
# with q01 = sum_u 2*n1u*n0u/(m_u - 1), o_cc = sum_u n_cu(n_cu-1)/(m_u-1),
# nc = o_cc + q01/2, n = total pairable ratings.
# Parity: with m_u <= 3 every coincidence term is an exact integer (the
# /(m_u-1) divisions cancel), so alpha is ONE double division; 4dp.
# Scale: one narrow per-document projection + one 1-row conditional
# aggregate with map-side partials; no joins, no windows.
# --------------------------------------------------------------------------
@register(
    "q324_krippendorff_alpha",
    oracle="""
WITH rated AS (
    SELECT CASE WHEN ' ' || LOWER(text) || ' ' LIKE '% the %'
                THEN 1 ELSE 0 END AS ra,
           CASE WHEN n_chars >= 150 THEN
                CASE WHEN CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
                          / LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                                            t -> t <> '')) < 5.5
                     THEN 1 ELSE 0 END
           END AS rb,
           CASE WHEN LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                                     t -> t <> '')) >= 30 THEN
                CASE WHEN CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                                   t -> t <> '' AND LENGTH(t) <= 2))
                               AS DOUBLE)
                          / LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                                            t -> t <> '')) >= 0.15
                     THEN 1 ELSE 0 END
           END AS rc
    FROM documents
),
units AS (
    SELECT (ra IS NOT NULL)::INT + (rb IS NOT NULL)::INT
               + (rc IS NOT NULL)::INT AS m,
           COALESCE(ra, 0) + COALESCE(rb, 0) + COALESCE(rc, 0) AS n1
    FROM rated
),
coin AS (
    SELECT CAST(SUM(m) AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) AS n_units,
           CAST(SUM(2 * n1 * (m - n1) / (m - 1)) AS BIGINT) AS q01,
           CAST(SUM(n1 * (n1 - 1) / (m - 1)) AS BIGINT) AS o11,
           CAST(SUM((m - n1) * (m - n1 - 1) / (m - 1)) AS BIGINT) AS o00
    FROM units WHERE m >= 2
)
SELECT n_units, n, o11, o00, q01,
       ROUND(1.0 - CAST(n - 1 AS DOUBLE) * q01
             / (2.0 * (o11 + q01 / 2) * (o00 + q01 / 2)), 4) AS alpha
FROM coin
""",
    tags=("ml-eval", "A12", "P12"),
)
def q324_krippendorff_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha over three partially-abstaining raters:
    (n_units, n, o11, o00, q01, alpha)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda t: t != "")
    short = F.filter(
        F.split("text", " "), lambda t: (t != "") & (F.length(t) <= 2)
    )
    ra = (
        F.concat(F.lit(" "), F.lower("text"), F.lit(" "))
        .contains(" the ")
        .cast("int")
    )
    rb = F.when(
        F.col("n_chars") >= 150,
        (
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
            .cast("double")
            / F.size(toks)
            < 5.5
        ).cast("int"),
    )
    rc = F.when(
        F.size(toks) >= 30,
        (F.size(short).cast("double") / F.size(toks) >= 0.15).cast("int"),
    )
    units = docs.select(
        (
            ra.isNotNull().cast("int")
            + rb.isNotNull().cast("int")
            + rc.isNotNull().cast("int")
        ).alias("m"),
        (
            F.coalesce(ra, F.lit(0))
            + F.coalesce(rb, F.lit(0))
            + F.coalesce(rc, F.lit(0))
        ).alias("n1"),
    ).filter(F.col("m") >= 2)
    coin = units.agg(
        F.sum("m").alias("n"),
        F.count(F.lit(1)).alias("n_units"),
        F.sum(
            F.expr("2 * n1 * (m - n1) div (m - 1)")
        ).alias("q01"),
        F.sum(F.expr("n1 * (n1 - 1) div (m - 1)")).alias("o11"),
        F.sum(
            F.expr("(m - n1) * (m - n1 - 1) div (m - 1)")
        ).alias("o00"),
    )
    return coin.select(
        F.col("n_units").cast("long").alias("n_units"),
        F.col("n").cast("long").alias("n"),
        F.col("o11").cast("long").alias("o11"),
        F.col("o00").cast("long").alias("o00"),
        F.col("q01").cast("long").alias("q01"),
        F.round(
            1.0
            - (F.col("n") - 1).cast("double")
            * F.col("q01")
            / (
                2.0
                * (F.col("o11") + F.col("q01") / 2)
                * (F.col("o00") + F.col("q01") / 2)
            ),
            4,
        ).alias("alpha"),
    )


# --------------------------------------------------------------------------
# q325 - multimodal near-duplicate pairs by byte-histogram shape: two
# media payloads are near-dups when their per-mille 16-bin byte
# histograms differ by L1 <= 60 (6% total mass). Candidate generation is
# BANDED, never all-pairs: the coarse signature (each per-mille share
# quantized to 2.5% steps, present buckets only, bucket-ordered) must
# match exactly, so candidates come from one equi-join on the signature
# string — the multimodal sibling of q56's banded SimHash. Feature
# extraction runs through the Arrow mapInPandas byte-histogram operator
# (operators/multimodal.py), i.e. the REAL media plumbing, then
# everything downstream is relational.
# Parity: per-mille shares are exact `div` integers; signatures are
# deterministic strings; L1 is an exact integer sum (same-signature pairs
# provably share the same present-bucket set, so an inner bucket join is
# total). Oracle rebuilds the identical histogram from ASCII codes.
# Scale: histogram is narrow per-doc work (no shuffle); one signature
# equi-join bounds the pair space by bucket co-membership (Σ bucket²,
# same argument as q27/q56); the verify join is candidate-driven.
# --------------------------------------------------------------------------
@register(
    "q325_media_histogram_dups",
    oracle="""
WITH chars AS (
    SELECT doc_id, ASCII(UNNEST(STRING_SPLIT_REGEX(text, ''))) % 16 AS b
    FROM documents
),
hist AS (
    SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS c FROM chars
    WHERE b IS NOT NULL GROUP BY 1, 2
),
tot AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS t FROM hist GROUP BY 1),
h AS (
    SELECT hist.doc_id, hist.b, (hist.c * 1000) // tot.t AS p
    FROM hist JOIN tot USING (doc_id)
),
sig AS (
    SELECT doc_id,
           STRING_AGG(CAST(b AS VARCHAR) || ':' || CAST(p // 25 AS VARCHAR),
                      ',' ORDER BY b) AS s
    FROM h GROUP BY doc_id
),
cand AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM sig a JOIN sig b ON b.s = a.s AND a.doc_id < b.doc_id
),
l1 AS (
    SELECT c.id_a, c.id_b, CAST(SUM(ABS(ha.p - hb.p)) AS BIGINT) AS l1
    FROM cand c
    JOIN h ha ON ha.doc_id = c.id_a
    JOIN h hb ON hb.doc_id = c.id_b AND hb.b = ha.b
    GROUP BY c.id_a, c.id_b
)
SELECT id_a, id_b, l1 FROM l1 WHERE l1 <= 60
ORDER BY id_a, id_b
""",
    tags=("multimodal-features", "dedup-setsim", "mapInPandas"),
)
def q325_media_histogram_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded byte-histogram near-dup media pairs: (id_a, id_b, l1)."""
    from ..operators import multimodal

    media = multimodal.attach_media(load_table(spark, sf_dir, "documents"))
    hist = multimodal.byte_histogram(media, n_bins=16)
    tot = hist.groupBy("doc_id").agg(F.sum("n").alias("t"))
    h = hist.join(tot, "doc_id").select(
        "doc_id",
        F.col("bucket").alias("b"),
        F.expr("(n * 1000) div t").alias("p"),
    )
    sig = h.groupBy("doc_id").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct("b", F.expr("p div 25").alias("q"))
                    )
                ),
                lambda r: F.concat(
                    r["b"].cast("string"), F.lit(":"), r["q"].cast("string")
                ),
            ),
        ).alias("s")
    )
    cand = (
        sig.alias("a")
        .join(
            sig.alias("x").select(
                F.col("doc_id").alias("doc_b"), F.col("s").alias("sb")
            ),
            (F.col("s") == F.col("sb")) & (F.col("doc_id") < F.col("doc_b")),
        )
        .select(
            F.col("doc_id").alias("id_a"), F.col("doc_b").alias("id_b")
        )
    )
    l1 = (
        cand.join(
            h.select(
                F.col("doc_id").alias("id_a"), "b", F.col("p").alias("pa")
            ),
            "id_a",
        )
        .join(
            h.select(
                F.col("doc_id").alias("id_b"), "b", F.col("p").alias("pb")
            ),
            ["id_b", "b"],
        )
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.abs(F.col("pa") - F.col("pb"))).alias("l1"))
    )
    return (
        l1.filter(F.col("l1") <= 60)
        .select("id_a", "id_b", F.col("l1").cast("long").alias("l1"))
        .orderBy("id_a", "id_b")
    )


# --------------------------------------------------------------------------
# q326 - Lomb-lite periodogram over the daily event-count series per
# type: spectral power at candidate periods 2..10 days from the
# mean-centered counts,
#   A_p = sum_d X_d cos(2*pi*t_d/p),  B_p = ... sin ...,
#   power_p = (A_p^2 + B_p^2) / (n_days * sum_d X_d^2)   (in [0, 1]-ish)
# with X_d = n_days*c_d - S (exact integer mean-centering, scaled by
# n_days to avoid fractions). The "is there a weekly cadence" detector
# complementing q247's ACF (lag domain) with the frequency domain.
# Parity: X_d and t_d are exact integers; cos/sin are frozen to
# round(1e6 * trig) per (day, period) BEFORE the cross-day sums (the
# q310 cbrt treatment — absorbs engines' last-ulp libm drift); A/B are
# exact integers of the frozen trig; power is one double expression, 4dp.
# Scale: collapse-first to the (type, day) calendar-bounded relation; the
# 9-period expansion and all trig run on that bounded relation only.
# --------------------------------------------------------------------------
_PGRAM_PERIODS = list(range(2, 11))


@register(
    "q326_periodogram",
    oracle=f"""
WITH daily AS (
    SELECT event_type,
           CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2
),
base AS (
    SELECT event_type, CAST(MIN(day) AS DATE) AS d0,
           CAST(COUNT(*) AS BIGINT) AS nd, CAST(SUM(c) AS BIGINT) AS s
    FROM daily GROUP BY event_type
),
x AS (
    SELECT d.event_type, b.nd,
           DATEDIFF('day', b.d0, d.day) AS t,
           d.c * b.nd - b.s AS xd
    FROM daily d JOIN base b ON b.event_type = d.event_type
),
terms AS (
    SELECT x.event_type, x.nd, p.p,
           x.xd * CAST(ROUND(1000000.0 * COS(2 * PI() * x.t / p.p))
                       AS BIGINT) AS ct,
           x.xd * CAST(ROUND(1000000.0 * SIN(2 * PI() * x.t / p.p))
                       AS BIGINT) AS st,
           x.xd * x.xd AS x2
    FROM x CROSS JOIN (SELECT UNNEST({_PGRAM_PERIODS}) AS p) p
),
pw AS (
    SELECT event_type, p, CAST(MAX(nd) AS BIGINT) AS nd,
           CAST(SUM(ct) AS BIGINT) AS a, CAST(SUM(st) AS BIGINT) AS b,
           CAST(SUM(x2) AS BIGINT) AS sx2
    FROM terms GROUP BY event_type, p
)
SELECT event_type, CAST(p AS BIGINT) AS period,
       ROUND((CAST(a AS DOUBLE) * a + CAST(b AS DOUBLE) * b)
             / 1000000000000.0 / (CAST(nd AS DOUBLE) * sx2), 4) AS power
FROM pw
ORDER BY event_type, period
""",
    tags=("timeseries", "A12", "J14"),
)
def q326_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-count spectral power at periods 2..10 days per type:
    (event_type, period, power)."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    base = daily.groupBy("event_type").agg(
        F.min("day").alias("d0"),
        F.count(F.lit(1)).alias("nd"),
        F.sum("c").alias("s"),
    )
    x = daily.join(F.broadcast(base), "event_type").select(
        "event_type",
        "nd",
        F.datediff("day", "d0").alias("t"),
        (F.col("c") * F.col("nd") - F.col("s")).alias("xd"),
    )
    p = spark.range(2, 11).select(F.col("id").alias("p"))
    two_pi = 2.0 * 3.141592653589793
    ct = F.round(
        1000000.0 * F.cos(two_pi * F.col("t") / F.col("p"))
    ).cast("long")
    st = F.round(
        1000000.0 * F.sin(two_pi * F.col("t") / F.col("p"))
    ).cast("long")
    terms = x.crossJoin(F.broadcast(p)).select(
        "event_type",
        "nd",
        "p",
        (F.col("xd") * ct).alias("ct"),
        (F.col("xd") * st).alias("st"),
        (F.col("xd") * F.col("xd")).alias("x2"),
    )
    pw = terms.groupBy("event_type", "p").agg(
        F.max("nd").alias("nd"),
        F.sum("ct").alias("a"),
        F.sum("st").alias("b"),
        F.sum("x2").alias("sx2"),
    )
    return pw.select(
        "event_type",
        F.col("p").cast("long").alias("period"),
        F.round(
            (
                F.col("a").cast("double") * F.col("a")
                + F.col("b").cast("double") * F.col("b")
            )
            / 1.0e12
            / (F.col("nd").cast("double") * F.col("sx2")),
            4,
        ).alias("power"),
    ).orderBy("event_type", "period")


# --------------------------------------------------------------------------
# q327 - Cochran-Armitage trend test: does the high-price-order rate
# (o_totalprice > 250000) TREND monotonically across the five ordered
# priority classes (score = leading digit of o_orderpriority)? The
# ordered-dose test that q250's unordered chi-square association cannot
# express:
#   Z = sum_i s_i (r_i - n_i R/N)
#       / sqrt(R/N (1-R/N) [sum_i s_i^2 n_i - (sum_i s_i n_i)^2 / N]).
# Parity: the five (n_i, r_i) cells and all score moments are exact
# integers from one conditional aggregate; Z is one double expression
# over seven integers (the numerator is scaled by N to stay integer:
# num*N = N sum s_i r_i - R sum s_i n_i); 4dp.
# Scale: one full-table aggregate with map-side partials over orders;
# the five-row cell relation reduces on the driver-free single row.
# --------------------------------------------------------------------------
@register(
    "q327_trend_test",
    oracle="""
WITH cells AS (
    SELECT CAST(SUBSTR(o_orderpriority, 1, 1) AS BIGINT) AS s,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN o_totalprice > 250000 THEN 1 ELSE 0 END)
                AS BIGINT) AS r
    FROM orders GROUP BY 1
),
tot AS (
    SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(r) AS BIGINT) AS rr,
           CAST(SUM(s * n) AS BIGINT) AS sn,
           CAST(SUM(s * s * n) AS BIGINT) AS ssn,
           CAST(SUM(s * r) AS BIGINT) AS sr,
           CAST(COUNT(*) AS BIGINT) AS k
    FROM cells
)
SELECT nn AS n, rr AS n_high, k,
       ROUND((CAST(nn AS DOUBLE) * sr - CAST(rr AS DOUBLE) * sn)
             / (CAST(nn AS DOUBLE)
                * SQRT((CAST(rr AS DOUBLE) / nn) * (1.0 - CAST(rr AS DOUBLE) / nn)
                       * (ssn - CAST(sn AS DOUBLE) * sn / nn))), 4) AS z
FROM tot
""",
    tags=("ab-test", "A12", "P12"),
)
def q327_trend_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage trend of high-price rate across ordered priority
    scores: (n, n_high, k, z)."""
    orders = load_table(spark, sf_dir, "orders")
    cells = orders.groupBy(
        F.substring("o_orderpriority", 1, 1).cast("long").alias("s")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("o_totalprice") > 250000).cast("long")).alias("r"),
    )
    tot = cells.agg(
        F.sum("n").alias("nn"),
        F.sum("r").alias("rr"),
        F.sum(F.col("s") * F.col("n")).alias("sn"),
        F.sum(F.col("s") * F.col("s") * F.col("n")).alias("ssn"),
        F.sum(F.col("s") * F.col("r")).alias("sr"),
        F.count(F.lit(1)).alias("k"),
    )
    nnd = F.col("nn").cast("double")
    rrd = F.col("rr").cast("double")
    z = (nnd * F.col("sr") - rrd * F.col("sn")) / (
        nnd
        * F.sqrt(
            (rrd / F.col("nn"))
            * (1.0 - rrd / F.col("nn"))
            * (F.col("ssn") - F.col("sn").cast("double") * F.col("sn") / F.col("nn"))
        )
    )
    return tot.select(
        F.col("nn").cast("long").alias("n"),
        F.col("rr").cast("long").alias("n_high"),
        F.col("k").cast("long").alias("k"),
        F.round(z, 4).alias("z"),
    )


# --------------------------------------------------------------------------
# q328 - Mantel-Haenszel stratified odds ratio: the odd-user cohort's
# odds of a high-value event (value >= 50) vs the even cohort, adjusted
# for day-of-week strata — the confounder-adjusted effect the crude 2x2
# odds ratio conflates when traffic mix shifts by weekday:
#   OR_MH = sum_k (a_k d_k / n_k) / sum_k (b_k c_k / n_k),
# reported next to the crude OR so the confounding gap is visible.
# Parity: the 7x4 cell counts are exact integers from one conditional
# aggregate; each stratum's a*d/n and b*c/n are identical double
# expressions frozen to round(1e6 * term) before the cross-stratum sum;
# ORs are single double divisions, 4dp.
# Scale: one full-table aggregate to the 7-stratum relation; everything
# after is algebra on 7 rows.
# --------------------------------------------------------------------------
@register(
    "q328_mantel_haenszel",
    oracle="""
WITH cells AS (
    SELECT DAYOFWEEK(CAST(ts AS TIMESTAMP)) AS dow,
           CAST(SUM(CASE WHEN user_id % 2 = 1 AND value >= 50
                    THEN 1 ELSE 0 END) AS BIGINT) AS a,
           CAST(SUM(CASE WHEN user_id % 2 = 1 AND value < 50
                    THEN 1 ELSE 0 END) AS BIGINT) AS b,
           CAST(SUM(CASE WHEN user_id % 2 = 0 AND value >= 50
                    THEN 1 ELSE 0 END) AS BIGINT) AS c,
           CAST(SUM(CASE WHEN user_id % 2 = 0 AND value < 50
                    THEN 1 ELSE 0 END) AS BIGINT) AS d
    FROM events GROUP BY 1
),
terms AS (
    SELECT a, b, c, d, a + b + c + d AS n,
           CAST(ROUND(1000000.0 * (CAST(a AS DOUBLE) * d / (a + b + c + d)))
                AS BIGINT) AS ad_n,
           CAST(ROUND(1000000.0 * (CAST(b AS DOUBLE) * c / (a + b + c + d)))
                AS BIGINT) AS bc_n
    FROM cells
),
agg AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
           CAST(SUM(a) AS BIGINT) AS sa, CAST(SUM(b) AS BIGINT) AS sb,
           CAST(SUM(c) AS BIGINT) AS sc, CAST(SUM(d) AS BIGINT) AS sd,
           CAST(SUM(ad_n) AS BIGINT) AS num, CAST(SUM(bc_n) AS BIGINT) AS den
    FROM terms
)
SELECT n_strata,
       ROUND(CAST(sa AS DOUBLE) * sd / (CAST(sb AS DOUBLE) * sc), 4)
           AS or_crude,
       ROUND(CAST(num AS DOUBLE) / den, 4) AS or_mh
FROM agg
""",
    tags=("ab-test", "A12", "P12"),
)
def q328_mantel_haenszel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week-stratified Mantel-Haenszel odds ratio vs the crude OR:
    (n_strata, or_crude, or_mh)."""
    events = load_table(spark, sf_dir, "events")
    odd = F.col("user_id") % 2 == 1
    hi = F.col("value") >= 50
    cells = events.groupBy(F.dayofweek("ts").alias("dow")).agg(
        F.sum((odd & hi).cast("long")).alias("a"),
        F.sum((odd & ~hi).cast("long")).alias("b"),
        F.sum((~odd & hi).cast("long")).alias("c"),
        F.sum((~odd & ~hi).cast("long")).alias("d"),
    )
    n = F.col("a") + F.col("b") + F.col("c") + F.col("d")
    terms = cells.select(
        "a",
        "b",
        "c",
        "d",
        F.round(1000000.0 * (F.col("a").cast("double") * F.col("d") / n))
        .cast("long")
        .alias("ad_n"),
        F.round(1000000.0 * (F.col("b").cast("double") * F.col("c") / n))
        .cast("long")
        .alias("bc_n"),
    )
    agg = terms.agg(
        F.count(F.lit(1)).alias("n_strata"),
        F.sum("a").alias("sa"),
        F.sum("b").alias("sb"),
        F.sum("c").alias("sc"),
        F.sum("d").alias("sd"),
        F.sum("ad_n").alias("num"),
        F.sum("bc_n").alias("den"),
    )
    return agg.select(
        F.col("n_strata").cast("long").alias("n_strata"),
        F.round(
            F.col("sa").cast("double")
            * F.col("sd")
            / (F.col("sb").cast("double") * F.col("sc")),
            4,
        ).alias("or_crude"),
        F.round(F.col("num").cast("double") / F.col("den"), 4).alias(
            "or_mh"
        ),
    )


# --------------------------------------------------------------------------
# q329 - LATERAL correlated subquery surface (Spark 4 / ANSI): richest
# three customers per nation via a LATERAL per-nation top-k — the
# SQL-surface twin of q15's per-key limit, exercising the correlated
# LATERAL planner path (decorrelates to a ranked window, not a per-row
# re-scan). Deterministic tie-break on (c_acctbal DESC, c_custkey).
# Parity: pure SQL on both engines; balances rounded 4dp.
# Scale: Catalyst rewrites the lateral to a partitioned window with
# WindowGroupLimit pushdown — no per-nation re-scan of customer.
# --------------------------------------------------------------------------
@register(
    "q329_lateral_topk",
    oracle="""
SELECT n.n_name, c.c_name, ROUND(c.c_acctbal, 4) AS acctbal
FROM nation n,
     LATERAL (SELECT c_name, c_acctbal FROM customer
              WHERE c_nationkey = n.n_nationkey
              ORDER BY c_acctbal DESC, c_custkey LIMIT 3) c
ORDER BY n.n_name, acctbal DESC, c.c_name
""",
    tags=("sql-surface", "O4", "J1"),
)
def q329_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation lateral top-3 customers by balance:
    (n_name, c_name, acctbal)."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("q329_nation")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "q329_customer"
    )
    return spark.sql(
        """
        SELECT n.n_name, c.c_name, ROUND(c.c_acctbal, 4) AS acctbal
        FROM q329_nation n,
             LATERAL (SELECT c_name, c_acctbal FROM q329_customer
                      WHERE c_nationkey = n.n_nationkey
                      ORDER BY c_acctbal DESC, c_custkey LIMIT 3) c
        ORDER BY n.n_name, acctbal DESC, c.c_name
        """
    )


# --------------------------------------------------------------------------
# q330 - bag-semantics set operations (INTERSECT ALL / EXCEPT ALL): the
# multiplicity-preserving variants q100's set-semantics INTERSECT/EXCEPT
# cannot express. Which (custkey, month) purchase-activity pairs recur in
# BOTH eras (pre/post 1998), counted WITH multiplicity (a customer ordering twice
# in March of both eras contributes two intersect rows), and how many
# pre-1998 activity rows have no post-1998 counterpart (EXCEPT ALL keeps the excess
# copies). Output is the per-month rollup of both bag results.
# Parity: bag semantics are engine-portable (min/greatest-of-difference
# on per-key multiplicities); both engines run the literal INTERSECT ALL
# / EXCEPT ALL SQL; counts exact.
# Scale: two keyed aggregates + one equi-join on the (custkey, month)
# key (Spark plans INTERSECT/EXCEPT ALL as a single shuffle + generate);
# rollup is 12 rows.
# --------------------------------------------------------------------------
@register(
    "q330_set_ops_all",
    oracle="""
WITH h1 AS (
    SELECT o_custkey, MONTH(o_orderdate) AS m FROM orders
    WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
),
h2 AS (
    SELECT o_custkey, MONTH(o_orderdate) AS m FROM orders
    WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
),
both_all AS (SELECT * FROM h1 INTERSECT ALL SELECT * FROM h2),
only1_all AS (SELECT * FROM h1 EXCEPT ALL SELECT * FROM h2)
SELECT m AS month,
       CAST(SUM(CASE WHEN src = 'both' THEN 1 ELSE 0 END) AS BIGINT) AS n_recurring,
       CAST(SUM(CASE WHEN src = 'only1' THEN 1 ELSE 0 END) AS BIGINT) AS n_h1_excess
FROM (
    SELECT m, 'both' AS src FROM both_all
    UNION ALL
    SELECT m, 'only1' AS src FROM only1_all
)
GROUP BY m
ORDER BY month
""",
    tags=("sql-surface", "U3", "A10"),
)
def q330_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL multiplicity rollup by month:
    (month, n_recurring, n_h1_excess)."""
    orders = load_table(spark, sf_dir, "orders")
    h1 = orders.filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    ).select("o_custkey", F.month("o_orderdate").alias("m"))
    h2 = orders.filter(
        F.col("o_orderdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp")
    ).select("o_custkey", F.month("o_orderdate").alias("m"))
    both_all = h1.intersectAll(h2).select("m", F.lit("both").alias("src"))
    only1_all = h1.exceptAll(h2).select("m", F.lit("only1").alias("src"))
    return (
        both_all.unionByName(only1_all)
        .groupBy(F.col("m").cast("long").alias("month"))
        .agg(
            F.sum((F.col("src") == "both").cast("long")).alias(
                "n_recurring"
            ),
            F.sum((F.col("src") == "only1").cast("long")).alias(
                "n_h1_excess"
            ),
        )
        .orderBy("month")
    )


# --------------------------------------------------------------------------
# q331 - weekly top-k churn: the overlap (set Jaccard) between each
# week's top-20 parts by shipped quantity and the previous week's — the
# "how fast does the head of the distribution rotate" ops metric that
# distribution-level drift (q156 KL, q302 PSI) hides: two weeks can have
# identical histograms with a fully-rotated top set.
# Parity: weekly quantity sums are exact integer cents; the top-20 rank
# is deterministic (qty DESC, partkey ASC); overlap/Jaccard are exact
# integers per consecutive-week pair, 4dp on the final ratio.
# Scale: one keyed (week, part) aggregate; per-week top-20 via a
# partitioned rank window (WindowGroupLimit pushdown); the week-to-week
# self-join carries 20 rows per week. Calendar-bounded tail.
# --------------------------------------------------------------------------
@register(
    "q331_topk_churn",
    oracle="""
WITH wk AS (
    SELECT DATE_TRUNC('week', CAST(l_shipdate AS TIMESTAMP)) AS week,
           l_partkey,
           CAST(SUM(CAST(ROUND(100.0 * l_quantity) AS BIGINT)) AS BIGINT)
               AS qty
    FROM lineitem GROUP BY 1, 2
),
ranked AS (
    SELECT week, l_partkey,
           ROW_NUMBER() OVER (PARTITION BY week
                              ORDER BY qty DESC, l_partkey) AS rk
    FROM wk
),
top AS (SELECT week, l_partkey FROM ranked WHERE rk <= 20),
weeks AS (
    SELECT week, LAG(week) OVER (ORDER BY week) AS prev_week
    FROM (SELECT DISTINCT week FROM top)
),
ov AS (
    SELECT w.week, w.prev_week, CAST(COUNT(*) AS BIGINT) AS overlap
    FROM weeks w
    JOIN top a ON a.week = w.week
    JOIN top b ON b.week = w.prev_week AND b.l_partkey = a.l_partkey
    GROUP BY w.week, w.prev_week
),
sizes AS (SELECT week, CAST(COUNT(*) AS BIGINT) AS sz FROM top GROUP BY week)
SELECT w.week, COALESCE(o.overlap, 0) AS overlap,
       ROUND(CAST(COALESCE(o.overlap, 0) AS DOUBLE)
             / (sa.sz + sb.sz - COALESCE(o.overlap, 0)), 4) AS jaccard
FROM weeks w
JOIN sizes sa ON sa.week = w.week
JOIN sizes sb ON sb.week = w.prev_week
LEFT JOIN ov o ON o.week = w.week
WHERE w.prev_week IS NOT NULL
ORDER BY w.week
""",
    tags=("ops-drift", "O6", "W2"),
)
def q331_topk_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week top-20 part churn: (week, overlap, jaccard)."""
    li = load_table(spark, sf_dir, "lineitem")
    wk = li.groupBy(
        F.date_trunc("week", "l_shipdate").alias("week"),
        "l_partkey",
    ).agg(
        F.sum(F.round(100.0 * F.col("l_quantity")).cast("long")).alias("qty")
    )
    rw = Window.partitionBy("week").orderBy(
        F.desc("qty"), F.asc("l_partkey")
    )
    top = (
        wk.select("week", "l_partkey", F.row_number().over(rw).alias("rk"))
        .filter(F.col("rk") <= 20)
        .select("week", "l_partkey")
    )
    weeks = (
        top.select("week")
        .distinct()
        .select(
            "week", F.lag("week").over(Window.orderBy("week")).alias("prev_week")
        )
    )
    ov = (
        weeks.join(top.alias("a"), "week")
        .join(
            top.alias("b").select(
                F.col("week").alias("prev_week"),
                F.col("l_partkey").alias("pk_b"),
            ),
            ["prev_week"],
        )
        .filter(F.col("l_partkey") == F.col("pk_b"))
        .groupBy("week", "prev_week")
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    sizes = top.groupBy("week").agg(F.count(F.lit(1)).alias("sz"))
    return (
        weeks.filter(F.col("prev_week").isNotNull())
        .join(sizes.select(F.col("week"), F.col("sz").alias("sza")), "week")
        .join(
            sizes.select(
                F.col("week").alias("prev_week"), F.col("sz").alias("szb")
            ),
            "prev_week",
        )
        .join(ov, ["week", "prev_week"], "left")
        .select(
            "week",
            F.coalesce("overlap", F.lit(0)).cast("long").alias("overlap"),
            F.round(
                F.coalesce("overlap", F.lit(0)).cast("double")
                / (
                    F.col("sza")
                    + F.col("szb")
                    - F.coalesce("overlap", F.lit(0))
                ),
                4,
            ).alias("jaccard"),
        )
        .orderBy("week")
    )


# --------------------------------------------------------------------------
# q332 - one-way ANOVA F per language: document length across the 20
# sources, the parametric twin of q315's Kruskal-Wallis (mean-based vs
# rank-based, reported from the same design so the two tests can be read
# together):
#   SSB = sum_j n_j (mean_j - mean)^2 = sum_j S_j^2/n_j - S^2/N
#   SSW = SS - sum_j S_j^2/n_j
#   F   = (SSB / (k-1)) / (SSW / (N-k))
# Parity: N, S, SS and the per-group (n_j, S_j) are exact integers from
# one keyed aggregate; each group's S_j^2/n_j is an identical double
# expression frozen to round(1e4 * term) before the cross-group sum;
# F and the eta^2 effect size are single double expressions, 4dp.
# Scale: one (lang, source) keyed aggregate with map-side partials; the
# cross-group reduce runs on <= |langs| x |sources| rows.
# --------------------------------------------------------------------------
@register(
    "q332_anova_f",
    oracle="""
WITH g AS (
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS nj,
           CAST(SUM(n_chars) AS BIGINT) AS sj,
           CAST(SUM(n_chars * n_chars) AS BIGINT) AS ssj
    FROM documents GROUP BY lang, source
),
terms AS (
    SELECT lang, nj, sj, ssj,
           CAST(ROUND(10000.0 * (CAST(sj AS DOUBLE) * sj / nj)) AS BIGINT)
               AS t
    FROM g
),
agg AS (
    SELECT lang,
           CAST(SUM(nj) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS k,
           CAST(SUM(sj) AS BIGINT) AS s, CAST(SUM(ssj) AS BIGINT) AS ss,
           CAST(SUM(t) AS BIGINT) AS st
    FROM terms GROUP BY lang
)
SELECT lang, n, k,
       ROUND(((CAST(st AS DOUBLE) / 10000.0 - CAST(s AS DOUBLE) * s / n)
              / (k - 1))
             / ((CAST(ss AS DOUBLE) - CAST(st AS DOUBLE) / 10000.0)
                / (n - k)), 4) AS f,
       ROUND((CAST(st AS DOUBLE) / 10000.0 - CAST(s AS DOUBLE) * s / n)
             / (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n), 4)
           AS eta_sq
FROM agg
ORDER BY lang
""",
    tags=("robust-stats", "A12", "W4"),
)
def q332_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of n_chars across sources per language:
    (lang, n, k, f, eta_sq)."""
    docs = load_table(spark, sf_dir, "documents")
    g = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("nj"),
        F.sum("n_chars").alias("sj"),
        F.sum(F.col("n_chars") * F.col("n_chars")).alias("ssj"),
    )
    terms = g.select(
        "lang",
        "nj",
        "sj",
        "ssj",
        F.round(
            10000.0 * (F.col("sj").cast("double") * F.col("sj") / F.col("nj"))
        )
        .cast("long")
        .alias("t"),
    )
    agg = terms.groupBy("lang").agg(
        F.sum("nj").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.sum("sj").alias("s"),
        F.sum("ssj").alias("ss"),
        F.sum("t").alias("st"),
    )
    ssb = F.col("st").cast("double") / 10000.0 - F.col("s").cast(
        "double"
    ) * F.col("s") / F.col("n")
    ssw = F.col("ss").cast("double") - F.col("st").cast("double") / 10000.0
    sst = F.col("ss").cast("double") - F.col("s").cast("double") * F.col(
        "s"
    ) / F.col("n")
    return agg.select(
        "lang",
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("k"),
        F.round(
            (ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k"))), 4
        ).alias("f"),
        F.round(ssb / sst, 4).alias("eta_sq"),
    ).orderBy("lang")


# --------------------------------------------------------------------------
# q333 - Brown-Forsythe robust variance-homogeneity test per language:
# are the SPREADS of document length equal across sources? (ANOVA/KW
# compare locations; pipelines also need "did one source's variance
# blow up".) The Levene statistic on absolute deviations from the GROUP
# MEDIAN: z_ij = |x_ij - med_j|, then the one-way ANOVA F over z.
# Two exact passes: (1) per-(lang, source) median via the q304 domain
# collapse (cum counts over the distinct n_chars domain, integer
# order-statistic pick — lower median, an identical convention on both
# engines); (2) the q332 sufficient-statistics F over z.
# Parity: medians and z are exact integers; per-group Sz_j^2/n_j terms
# frozen to round(1e4 * term) before the cross-group sum; F 4dp.
# Scale: both passes are keyed aggregates / bounded-domain windows; the
# corpus is touched twice, never sorted globally.
# --------------------------------------------------------------------------
@register(
    "q333_brown_forsythe",
    oracle="""
WITH dom AS (
    SELECT lang, source, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
    FROM documents GROUP BY 1, 2, 3
),
cum AS (
    SELECT lang, source, v, c,
           CAST(SUM(c) OVER (PARTITION BY lang, source ORDER BY v
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS k,
           CAST(SUM(c) OVER (PARTITION BY lang, source) AS BIGINT) AS n
    FROM dom
),
med AS (
    SELECT lang, source, CAST(MIN(v) AS BIGINT) AS m
    FROM cum WHERE k >= (n + 1) // 2
    GROUP BY lang, source
),
z AS (
    SELECT d.lang, d.source,
           CAST(COUNT(*) AS BIGINT) AS nj,
           CAST(SUM(ABS(d.n_chars - m.m)) AS BIGINT) AS sj,
           CAST(SUM((d.n_chars - m.m) * (d.n_chars - m.m)) AS BIGINT) AS ssj
    FROM documents d JOIN med m ON m.lang = d.lang AND m.source = d.source
    GROUP BY d.lang, d.source
),
terms AS (
    SELECT lang, nj, sj, ssj,
           CAST(ROUND(10000.0 * (CAST(sj AS DOUBLE) * sj / nj)) AS BIGINT)
               AS t
    FROM z
),
agg AS (
    SELECT lang,
           CAST(SUM(nj) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS k,
           CAST(SUM(sj) AS BIGINT) AS s, CAST(SUM(ssj) AS BIGINT) AS ss,
           CAST(SUM(t) AS BIGINT) AS st
    FROM terms GROUP BY lang
)
SELECT lang, n, k,
       ROUND(((CAST(st AS DOUBLE) / 10000.0 - CAST(s AS DOUBLE) * s / n)
              / (k - 1))
             / ((CAST(ss AS DOUBLE) - CAST(st AS DOUBLE) / 10000.0)
                / (n - k)), 4) AS f
FROM agg
ORDER BY lang
""",
    tags=("robust-stats", "A12", "W2"),
)
def q333_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe spread-homogeneity F across sources per language:
    (lang, n, k, f)."""
    docs = load_table(spark, sf_dir, "documents")
    dom = docs.groupBy(
        "lang", "source", F.col("n_chars").alias("v")
    ).agg(F.count(F.lit(1)).alias("c"))
    wcum = (
        Window.partitionBy("lang", "source")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("lang", "source")
    cum = dom.select(
        "lang",
        "source",
        "v",
        F.sum("c").over(wcum).alias("k"),
        F.sum("c").over(wtot).alias("n"),
    )
    med = (
        cum.filter(F.col("k") >= F.expr("(n + 1) div 2"))
        .groupBy("lang", "source")
        .agg(F.min("v").alias("m"))
    )
    z = (
        docs.join(F.broadcast(med), ["lang", "source"])
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("nj"),
            F.sum(F.abs(F.col("n_chars") - F.col("m"))).alias("sj"),
            F.sum(
                (F.col("n_chars") - F.col("m"))
                * (F.col("n_chars") - F.col("m"))
            ).alias("ssj"),
        )
    )
    terms = z.select(
        "lang",
        "nj",
        "sj",
        "ssj",
        F.round(
            10000.0 * (F.col("sj").cast("double") * F.col("sj") / F.col("nj"))
        )
        .cast("long")
        .alias("t"),
    )
    agg = terms.groupBy("lang").agg(
        F.sum("nj").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.sum("sj").alias("s"),
        F.sum("ssj").alias("ss"),
        F.sum("t").alias("st"),
    )
    ssb = F.col("st").cast("double") / 10000.0 - F.col("s").cast(
        "double"
    ) * F.col("s") / F.col("n")
    ssw = F.col("ss").cast("double") - F.col("st").cast("double") / 10000.0
    return agg.select(
        "lang",
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("k"),
        F.round(
            (ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k"))), 4
        ).alias("f"),
    ).orderBy("lang")


# --------------------------------------------------------------------------
# q334 - partial correlation of daily purchase and error counts
# CONTROLLING for total daily traffic: does the purchase-error link
# survive once "busy days are busy everywhere" is partialled out?
#   r_xy.z = (r_xy - r_xz r_yz) / sqrt((1 - r_xz^2)(1 - r_yz^2))
# from the three pairwise Pearson correlations of the bounded daily
# series — the confounder-adjusted companion to q306's raw Spearman and
# q328's stratified OR.
# Parity: daily counts are exact integers; each pairwise r is one double
# expression over six integer sufficient statistics (computed on the
# SAME 30-row relation on both engines); r_xy, r_xz, r_yz and the
# partial r are 4dp.
# Scale: one conditional keyed aggregate to the calendar-bounded daily
# relation; one 1-row reduce. Nothing row-scaled after the collapse.
# --------------------------------------------------------------------------
@register(
    "q334_partial_correlation",
    oracle="""
WITH daily AS (
    SELECT CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS x,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                AS BIGINT) AS y,
           CAST(COUNT(*) AS BIGINT) AS z
    FROM events GROUP BY 1
),
s AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
           CAST(SUM(z) AS BIGINT) AS sz,
           CAST(SUM(x * x) AS BIGINT) AS sxx,
           CAST(SUM(y * y) AS BIGINT) AS syy,
           CAST(SUM(z * z) AS BIGINT) AS szz,
           CAST(SUM(x * y) AS BIGINT) AS sxy,
           CAST(SUM(x * z) AS BIGINT) AS sxz,
           CAST(SUM(y * z) AS BIGINT) AS syz
    FROM daily
),
r AS (
    SELECT n,
           (n * sxy - CAST(sx AS DOUBLE) * sy)
               / (SQRT(n * sxx - CAST(sx AS DOUBLE) * sx)
                  * SQRT(n * syy - CAST(sy AS DOUBLE) * sy)) AS rxy,
           (n * sxz - CAST(sx AS DOUBLE) * sz)
               / (SQRT(n * sxx - CAST(sx AS DOUBLE) * sx)
                  * SQRT(n * szz - CAST(sz AS DOUBLE) * sz)) AS rxz,
           (n * syz - CAST(sy AS DOUBLE) * sz)
               / (SQRT(n * syy - CAST(sy AS DOUBLE) * sy)
                  * SQRT(n * szz - CAST(sz AS DOUBLE) * sz)) AS ryz
    FROM s
)
SELECT n AS n_days, ROUND(rxy, 4) AS r_xy, ROUND(rxz, 4) AS r_xz,
       ROUND(ryz, 4) AS r_yz,
       ROUND((rxy - rxz * ryz)
             / SQRT((1.0 - rxz * rxz) * (1.0 - ryz * ryz)), 4)
           AS r_partial
FROM r
""",
    tags=("timeseries", "A12", "J14"),
)
def q334_partial_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial correlation of daily purchases vs errors given traffic:
    (n_days, r_xy, r_xz, r_yz, r_partial)."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(
        F.sum((F.col("event_type") == "purchase").cast("long")).alias("x"),
        F.sum((F.col("event_type") == "error").cast("long")).alias("y"),
        F.count(F.lit(1)).alias("z"),
    )
    s = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum("z").alias("sz"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("z") * F.col("z")).alias("szz"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("z")).alias("sxz"),
        F.sum(F.col("y") * F.col("z")).alias("syz"),
    )

    def corr(sab, sa, sb, saa, sbb):
        n = F.col("n")
        return (n * F.col(sab) - F.col(sa).cast("double") * F.col(sb)) / (
            F.sqrt(n * F.col(saa) - F.col(sa).cast("double") * F.col(sa))
            * F.sqrt(n * F.col(sbb) - F.col(sb).cast("double") * F.col(sb))
        )

    rxy = corr("sxy", "sx", "sy", "sxx", "syy")
    rxz = corr("sxz", "sx", "sz", "sxx", "szz")
    ryz = corr("syz", "sy", "sz", "syy", "szz")
    return s.select(
        F.col("n").cast("long").alias("n_days"),
        F.round(rxy, 4).alias("r_xy"),
        F.round(rxz, 4).alias("r_xz"),
        F.round(ryz, 4).alias("r_yz"),
        F.round(
            (rxy - rxz * ryz)
            / F.sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz)),
            4,
        ).alias("r_partial"),
    )


# --------------------------------------------------------------------------
# q335 - simplified silhouette of the label clustering over the
# embeddings table: a_i = euclidean distance to the OWN label centroid,
# b_i = distance to the nearest OTHER centroid, s_i = (b-a)/max(a,b);
# reported as the per-label mean — the cluster-quality score that reads
# q147/q202's geometry as one number per class (near 1 = compact and
# separated, near 0 = overlapping, negative = misassigned).
# Parity: embedding values are frozen to round(1e6*val) + 1e6 (the
# offset keeps every working value positive so DuckDB's floor `//` and
# Spark's truncating `div` agree on the centroid mean; the offset cancels
# in every distance); centroids are exact integer means; squared
# distances are exact integers; s_i is one double expression frozen to
# round(1e6*s) before the per-label mean; 4dp.
# Scale: posexplode is a narrow constant-factor (d=64) expansion;
# centroids are one (label, dim) keyed aggregate broadcast back (k*d
# rows); per-point work is O(k*d) with no shuffle beyond the final
# per-label reduce.
# --------------------------------------------------------------------------
@register(
    "q335_silhouette",
    oracle="""
WITH pts AS (
    SELECT vec_id, label, GENERATE_SUBSCRIPTS(embedding, 1) AS dim,
           CAST(ROUND(1000000.0 * UNNEST(embedding)) AS BIGINT) + 1000000
               AS v
    FROM embeddings
),
cent AS (
    SELECT label AS clabel, dim,
           CAST(SUM(v) // COUNT(*) AS BIGINT) AS c
    FROM pts GROUP BY label, dim
),
d2 AS (
    SELECT p.vec_id, p.label, c.clabel,
           CAST(SUM((p.v - c.c) * (p.v - c.c)) AS BIGINT) AS dd
    FROM pts p JOIN cent c ON c.dim = p.dim
    GROUP BY p.vec_id, p.label, c.clabel
),
ab AS (
    SELECT vec_id, label,
           CAST(MAX(CASE WHEN clabel = label THEN dd END) AS BIGINT) AS a2,
           CAST(MIN(CASE WHEN clabel <> label THEN dd END) AS BIGINT) AS b2
    FROM d2 GROUP BY vec_id, label
),
s AS (
    SELECT label,
           CAST(ROUND(1000000.0 * ((SQRT(CAST(b2 AS DOUBLE)) - SQRT(CAST(a2 AS DOUBLE)))
                 / GREATEST(SQRT(CAST(a2 AS DOUBLE)), SQRT(CAST(b2 AS DOUBLE)))))
               AS BIGINT) AS si
    FROM ab
)
SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(si) AS DOUBLE) / 1000000.0 / COUNT(*), 4)
           AS mean_silhouette
FROM s GROUP BY label
ORDER BY label
""",
    tags=("ml-eval", "similarity", "A12"),
)
def q335_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified silhouette per label cluster over embeddings:
    (label, n, mean_silhouette)."""
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("dim0", "raw"),
    ).select(
        "vec_id",
        "label",
        (F.col("dim0") + 1).alias("dim"),
        (F.round(1000000.0 * F.col("raw")).cast("long") + 1000000).alias(
            "v"
        ),
    )
    cent = pts.groupBy(F.col("label").alias("clabel"), "dim").agg(
        F.expr("sum(v) div count(*)").cast("long").alias("c")
    )
    d2 = (
        pts.join(F.broadcast(cent), "dim")
        .groupBy("vec_id", "label", "clabel")
        .agg(
            F.sum(
                (F.col("v") - F.col("c")) * (F.col("v") - F.col("c"))
            ).alias("dd")
        )
    )
    ab = d2.groupBy("vec_id", "label").agg(
        F.max(
            F.when(F.col("clabel") == F.col("label"), F.col("dd"))
        ).alias("a2"),
        F.min(
            F.when(F.col("clabel") != F.col("label"), F.col("dd"))
        ).alias("b2"),
    )
    sa = F.sqrt(F.col("a2").cast("double"))
    sb = F.sqrt(F.col("b2").cast("double"))
    s = ab.select(
        "label",
        F.round(1000000.0 * ((sb - sa) / F.greatest(sa, sb)))
        .cast("long")
        .alias("si"),
    )
    return (
        s.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum("si").cast("double") / 1000000.0 / F.count(F.lit(1)),
                4,
            ).alias("mean_silhouette"),
        )
        .select(
            "label",
            F.col("n").cast("long").alias("n"),
            "mean_silhouette",
        )
        .orderBy("label")
    )


# --------------------------------------------------------------------------
# q336 - MinHash-LSH parameter planner: for each target Jaccard
# threshold, score every (bands b, rows r) layout with b*r <= 64 hash
# budget by detection probability p(t) = 1 - (1 - t^r)^b at the target
# minus the false-candidate probability at j = 0.3, and rank layouts per
# target (score DESC, b ASC). The design-time relation behind q27/q195's
# chosen 4x3 layout — what a data engineer consults before committing a
# signature budget.
# Parity: the (b, r, t) grid is generated identically on both engines
# (range cross products); p and the score are closed-form double
# expressions of small integers (no cross-row accumulation, so no
# freezing needed); rank is deterministic. 4dp.
# Scale: a constant ~dozens-row relation; no input tables at all.
# --------------------------------------------------------------------------
@register(
    "q336_lsh_planner",
    oracle="""
WITH grid AS (
    SELECT b.b, r.r
    FROM (SELECT UNNEST([2, 4, 8, 16, 32]) AS b) b
    CROSS JOIN (SELECT UNNEST([2, 3, 4, 8, 16]) AS r) r
    WHERE b.b * r.r <= 64
),
targets AS (SELECT UNNEST([0.5, 0.7, 0.8, 0.9]) AS t),
scored AS (
    SELECT g.b, g.r, tt.t,
           1.0 - POW(1.0 - POW(tt.t, g.r), g.b) AS p_detect,
           1.0 - POW(1.0 - POW(0.3, g.r), g.b) AS p_fp
    FROM grid g CROSS JOIN targets tt
),
ranked AS (
    SELECT t, b, r, p_detect, p_fp, p_detect - p_fp AS score,
           ROW_NUMBER() OVER (PARTITION BY t
                              ORDER BY p_detect - p_fp DESC, b, r) AS rk
    FROM scored
)
SELECT t AS target_j, CAST(b AS BIGINT) AS bands, CAST(r AS BIGINT) AS rows_per_band,
       ROUND(p_detect, 4) AS p_detect, ROUND(p_fp, 4) AS p_fp,
       ROUND(score, 4) AS score, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= 3
ORDER BY target_j, rk
""",
    tags=("dedup-setsim", "capacity", "O6"),
)
def q336_lsh_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 (bands, rows) LSH layouts per target Jaccard threshold:
    (target_j, bands, rows_per_band, p_detect, p_fp, score, rk)."""
    # The design lattice is a CONSTANT: enumerate the (b, r, t) rows as
    # one single-partition literal frame. A crossJoin of literal frames
    # both sprays 18 rows over defaultParallelism^2 tasks and trips the
    # no-cartesian plan pin; there is nothing to distribute here.
    rows = [
        (b, r, t)
        for b in [2, 4, 8, 16, 32]
        for r in [2, 3, 4, 8, 16]
        if b * r <= 64
        for t in [0.5, 0.7, 0.8, 0.9]
    ]
    grid = spark.createDataFrame(
        rows, "b long, r long, t double"
    ).coalesce(1)
    p_detect = 1.0 - F.pow(
        1.0 - F.pow(F.col("t"), F.col("r")), F.col("b")
    )
    p_fp = 1.0 - F.pow(1.0 - F.pow(F.lit(0.3), F.col("r")), F.col("b"))
    scored = grid.select(
        "b",
        "r",
        "t",
        p_detect.alias("p_detect"),
        p_fp.alias("p_fp"),
        (p_detect - p_fp).alias("score"),
    )
    w = Window.partitionBy("t").orderBy(
        F.desc("score"), F.asc("b"), F.asc("r")
    )
    return (
        scored.select(
            F.col("t").alias("target_j"),
            F.col("b").alias("bands"),
            F.col("r").alias("rows_per_band"),
            F.round("p_detect", 4).alias("p_detect"),
            F.round("p_fp", 4).alias("p_fp"),
            F.round("score", 4).alias("score"),
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 3)
        .select(
            "target_j",
            "bands",
            "rows_per_band",
            "p_detect",
            "p_fp",
            F.col("score"),
            F.col("rk").cast("long").alias("rk"),
        )
        .orderBy("target_j", "rk")
    )


# --------------------------------------------------------------------------
# q337 - filter-cascade ordering audit: measure each curation filter's
# real selectivity on the corpus, price it with its relative per-doc
# cost, and rank the cascade by drop-per-cost (1 - sel)/cost DESC — the
# ordering that minimises expected work for independent AND-filters.
# The cost-based-optimizer view of q106/q230's curation funnels: the
# funnels apply stages in a fixed order; this query says what order the
# measured selectivities actually justify.
# Filters: length (n_chars >= 100, cost 1), lang-id table check
# (lang = 'en', cost 1), stopword scan ('the' containment, cost 5),
# tokenize+count (>= 20 tokens, cost 10).
# Parity: pass counts are exact integers from one conditional aggregate;
# selectivity and drop-per-cost are single double expressions, 4dp;
# the rank's tie-break is the filter name.
# Scale: ONE full-table conditional aggregate; the 4-row planning
# relation does everything else.
# --------------------------------------------------------------------------
@register(
    "q337_filter_cascade",
    oracle="""
WITH counts AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN n_chars >= 100 THEN 1 ELSE 0 END) AS BIGINT)
               AS p_len,
           CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS p_lang,
           CAST(SUM(CASE WHEN ' ' || LOWER(text) || ' ' LIKE '% the %'
                    THEN 1 ELSE 0 END) AS BIGINT) AS p_stop,
           CAST(SUM(CASE WHEN LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                                              x -> x <> '')) >= 20
                    THEN 1 ELSE 0 END) AS BIGINT) AS p_tok
    FROM documents
),
f AS (
    SELECT 'length' AS filter, p_len AS n_pass, 1 AS cost, n FROM counts
    UNION ALL
    SELECT 'lang', p_lang, 1, n FROM counts
    UNION ALL
    SELECT 'stopword', p_stop, 5, n FROM counts
    UNION ALL
    SELECT 'tokens', p_tok, 10, n FROM counts
)
SELECT filter, n_pass,
       ROUND(CAST(n_pass AS DOUBLE) / n, 4) AS sel,
       CAST(cost AS BIGINT) AS cost,
       ROUND((1.0 - CAST(n_pass AS DOUBLE) / n) / cost, 4) AS drop_per_cost,
       CAST(ROW_NUMBER() OVER (
           ORDER BY (1.0 - CAST(n_pass AS DOUBLE) / n) / cost DESC, filter)
           AS BIGINT) AS opt_rank
FROM f
ORDER BY opt_rank
""",
    tags=("training-prep", "capacity", "P12"),
)
def q337_filter_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selectivity-measured cascade ordering for four curation filters:
    (filter, n_pass, sel, cost, drop_per_cost, opt_rank)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda t: t != "")
    counts = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("n_chars") >= 100).cast("long")).alias("p_len"),
        F.sum((F.col("lang") == "en").cast("long")).alias("p_lang"),
        F.sum(
            F.concat(F.lit(" "), F.lower("text"), F.lit(" "))
            .contains(" the ")
            .cast("long")
        ).alias("p_stop"),
        F.sum((F.size(toks) >= 20).cast("long")).alias("p_tok"),
    )
    f = counts.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("length").alias("filter"),
                    F.col("p_len").alias("n_pass"),
                    F.lit(1).cast("long").alias("cost"),
                    F.col("n"),
                ),
                F.struct(
                    F.lit("lang").alias("filter"),
                    F.col("p_lang").alias("n_pass"),
                    F.lit(1).cast("long").alias("cost"),
                    F.col("n"),
                ),
                F.struct(
                    F.lit("stopword").alias("filter"),
                    F.col("p_stop").alias("n_pass"),
                    F.lit(5).cast("long").alias("cost"),
                    F.col("n"),
                ),
                F.struct(
                    F.lit("tokens").alias("filter"),
                    F.col("p_tok").alias("n_pass"),
                    F.lit(10).cast("long").alias("cost"),
                    F.col("n"),
                ),
            )
        ).alias("r")
    ).select("r.*")
    dpc = (1.0 - F.col("n_pass").cast("double") / F.col("n")) / F.col("cost")
    w = Window.orderBy(F.desc(dpc), F.asc("filter"))
    return (
        f.select(
            "filter",
            F.col("n_pass").cast("long").alias("n_pass"),
            F.round(F.col("n_pass").cast("double") / F.col("n"), 4).alias(
                "sel"
            ),
            "cost",
            F.round(dpc, 4).alias("drop_per_cost"),
            F.row_number().over(w).cast("long").alias("opt_rank"),
        )
        .orderBy("opt_rank")
    )


# --------------------------------------------------------------------------
# q338 - Jarque-Bera normality test of the value distribution per event
# type: skewness, excess kurtosis, and JB = n/6 * (g1^2 + g2^2/4) from
# exact integer power sums. The distribution-shape gate behind q144's
# summary stats — "is this metric even plausibly normal before anyone
# runs a t-test on it?"
# Parity: values frozen to round(100*value) (<= ~5e4 here, so v^4 fits a
# 64-bit per-row product); power sums accumulate exactly (Spark
# DECIMAL(38,0), DuckDB HUGEINT) and cast to double once; every moment /
# statistic is a single double expression over (n, s1..s4), 4dp.
# Scale: one map-side-combinable keyed aggregate; nothing row-scaled
# afterwards.
# --------------------------------------------------------------------------
@register(
    "q338_jarque_bera",
    oracle="""
WITH frozen AS (
    SELECT event_type, CAST(ROUND(100.0 * value) AS BIGINT) AS v
    FROM events
),
s AS (
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(v) AS DOUBLE) AS s1,
           CAST(SUM(v * v) AS DOUBLE) AS s2,
           CAST(SUM(v * v * v) AS DOUBLE) AS s3,
           CAST(SUM((v * v) * (v * v)) AS DOUBLE) AS s4
    FROM frozen GROUP BY event_type
),
m AS (
    SELECT event_type, n,
           s2 / n - (s1 / n) * (s1 / n) AS m2,
           s3 / n - 3.0 * (s1 / n) * (s2 / n)
               + 2.0 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
           s4 / n - 4.0 * (s1 / n) * (s3 / n)
               + 6.0 * (s1 / n) * (s1 / n) * (s2 / n)
               - 3.0 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
    FROM s
),
g AS (
    SELECT event_type, n,
           m3 / (m2 * SQRT(m2)) AS g1,
           m4 / (m2 * m2) - 3.0 AS g2
    FROM m
)
SELECT event_type, n,
       ROUND(g1, 4) AS skewness,
       ROUND(g2, 4) AS ex_kurtosis,
       ROUND(CAST(n AS DOUBLE) / 6.0 * (g1 * g1 + g2 * g2 / 4.0), 4) AS jb
FROM g
ORDER BY event_type
""",
    tags=("ab-test", "A12"),
)
def q338_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality statistic per event type from exact integer
    power sums: (event_type, n, skewness, ex_kurtosis, jb)."""
    events = load_table(spark, sf_dir, "events")
    frozen = events.select(
        "event_type",
        F.round(100.0 * F.col("value")).cast("long").alias("v"),
    )
    v = F.col("v")
    v2 = v * v
    s = frozen.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v.cast("decimal(38,0)")).cast("double").alias("s1"),
        F.sum(v2.cast("decimal(38,0)")).cast("double").alias("s2"),
        F.sum((v2 * v).cast("decimal(38,0)")).cast("double").alias("s3"),
        F.sum(
            (v2.cast("decimal(19,0)") * v2.cast("decimal(19,0)")).cast(
                "decimal(38,0)"
            )
        )
        .cast("double")
        .alias("s4"),
    )
    n = F.col("n")
    mu = F.col("s1") / n
    m2 = F.col("s2") / n - mu * mu
    m3 = F.col("s3") / n - 3.0 * mu * (F.col("s2") / n) + 2.0 * mu * mu * mu
    m4 = (
        F.col("s4") / n
        - 4.0 * mu * (F.col("s3") / n)
        + 6.0 * mu * mu * (F.col("s2") / n)
        - 3.0 * mu * mu * mu * mu
    )
    g = s.select(
        "event_type",
        n.cast("long").alias("n"),
        (m3 / (m2 * F.sqrt(m2))).alias("g1"),
        (m4 / (m2 * m2) - 3.0).alias("g2"),
    )
    return g.select(
        "event_type",
        "n",
        F.round("g1", 4).alias("skewness"),
        F.round("g2", 4).alias("ex_kurtosis"),
        F.round(
            F.col("n").cast("double")
            / 6.0
            * (
                F.col("g1") * F.col("g1")
                + F.col("g2") * F.col("g2") / 4.0
            ),
            4,
        ).alias("jb"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# q339 - Ljung-Box portmanteau test of the daily event-count series:
# autocorrelation rho_k at lags 1..7 plus the cumulative Q_k statistic
# (n(n+2) * sum_{i<=k} rho_i^2/(n-i)). The "is this series white noise"
# gate that decides whether q272's backtests / q307's lead-lag reads are
# structure or nothing.
# Parity: daily counts are exact integers; centering uses d_t = n*x_t - S
# (exact, no rational mean); lag products and the denominator are exact
# integer sums; each rho is one double ratio; the cumulative sum is
# frozen per term (round(1e8 * rho^2/(n-k))) so the 7-term accumulation
# is integer, then Q is one double expression, 4dp.
# Scale: one keyed aggregate to the calendar-bounded daily relation
# (~tens of rows at any SF); the lag windows run on that bounded series.
# --------------------------------------------------------------------------
@register(
    "q339_ljung_box",
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
tot AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s
    FROM ranked
),
d AS (
    SELECT r.t, tot.n, tot.n * r.x - tot.s AS dv
    FROM ranked r CROSS JOIN tot
),
den AS (
    SELECT CAST(SUM(dv * dv) AS BIGINT) AS dd FROM d
),
lagged AS (
    SELECT t, n, dv,
           LAG(dv, 1) OVER (ORDER BY t) AS l1,
           LAG(dv, 2) OVER (ORDER BY t) AS l2,
           LAG(dv, 3) OVER (ORDER BY t) AS l3,
           LAG(dv, 4) OVER (ORDER BY t) AS l4,
           LAG(dv, 5) OVER (ORDER BY t) AS l5,
           LAG(dv, 6) OVER (ORDER BY t) AS l6,
           LAG(dv, 7) OVER (ORDER BY t) AS l7
    FROM d
),
nums AS (
    SELECT k, num, n FROM (
        SELECT 1 AS k, CAST(SUM(dv * l1) AS BIGINT) AS num, MAX(n) AS n FROM lagged
        UNION ALL
        SELECT 2, CAST(SUM(dv * l2) AS BIGINT), MAX(n) FROM lagged
        UNION ALL
        SELECT 3, CAST(SUM(dv * l3) AS BIGINT), MAX(n) FROM lagged
        UNION ALL
        SELECT 4, CAST(SUM(dv * l4) AS BIGINT), MAX(n) FROM lagged
        UNION ALL
        SELECT 5, CAST(SUM(dv * l5) AS BIGINT), MAX(n) FROM lagged
        UNION ALL
        SELECT 6, CAST(SUM(dv * l6) AS BIGINT), MAX(n) FROM lagged
        UNION ALL
        SELECT 7, CAST(SUM(dv * l7) AS BIGINT), MAX(n) FROM lagged
    ) u
),
rho AS (
    SELECT k, n,
           CAST(num AS DOUBLE) / den.dd AS r,
           CAST(ROUND(100000000.0 * (CAST(num AS DOUBLE) / den.dd)
                      * (CAST(num AS DOUBLE) / den.dd) / (n - k))
                AS BIGINT) AS term
    FROM nums CROSS JOIN den
),
cum AS (
    SELECT k, n, r,
           CAST(SUM(term) OVER (ORDER BY k
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS BIGINT) AS cterm
    FROM rho
)
SELECT CAST(k AS BIGINT) AS lag, ROUND(r, 4) AS rho,
       ROUND(CAST(n AS DOUBLE) * (n + 2) * (cterm / 100000000.0), 4) AS q_stat
FROM cum
ORDER BY lag
""",
    tags=("timeseries", "A12", "W2"),
)
def q339_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box autocorrelation test of daily event counts, lags 1-7:
    (lag, rho, q_stat)."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("x"))
    # Bounded calendar series (~tens of rows at any SF): the global
    # window runs on the post-aggregate relation, never raw rows.
    ranked = daily.select(
        "x", F.row_number().over(Window.orderBy("day")).alias("t")
    )
    tot = ranked.agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("s")
    )
    d = ranked.crossJoin(F.broadcast(tot)).select(
        "t", "n", (F.col("n") * F.col("x") - F.col("s")).alias("dv")
    )
    den = d.agg(F.sum(F.col("dv") * F.col("dv")).alias("dd"))
    wt = Window.orderBy("t")
    lag_cols = [
        F.lag("dv", k).over(wt).alias(f"l{k}") for k in range(1, 8)
    ]
    lagged = d.select("t", "n", "dv", *lag_cols)
    nums = None
    for k in range(1, 8):
        part = lagged.agg(
            F.lit(k).alias("k"),
            F.sum(F.col("dv") * F.col(f"l{k}")).alias("num"),
            F.max("n").alias("n"),
        )
        nums = part if nums is None else nums.unionByName(part)
    r = F.col("num").cast("double") / F.col("dd")
    rho = nums.crossJoin(F.broadcast(den)).select(
        "k",
        "n",
        r.alias("r"),
        F.round(100000000.0 * r * r / (F.col("n") - F.col("k")))
        .cast("long")
        .alias("term"),
    )
    wk = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    cum = rho.select(
        "k", "n", "r", F.sum("term").over(wk).cast("long").alias("cterm")
    )
    return cum.select(
        F.col("k").cast("long").alias("lag"),
        F.round("r", 4).alias("rho"),
        F.round(
            F.col("n").cast("double")
            * (F.col("n") + 2)
            * (F.col("cterm") / 100000000.0),
            4,
        ).alias("q_stat"),
    ).orderBy("lag")


# --------------------------------------------------------------------------
# q340 - Durbin-Watson autocorrelation-of-residuals statistic for the
# daily event-count linear trend: fit count ~ a + b*t by exact OLS
# (q298's integer sufficient statistics), then DW = sum (e_t - e_{t-1})^2
# / sum e_t^2 over the residual series. DW ~ 2 means the trend residuals
# are independent; DW << 2 means q294/q271's trend reads ride on serial
# correlation the OLS standard errors ignore.
# Parity: OLS slope/intercept are single double expressions over exact
# integer sums; residuals are frozen to round(1e6*e) per row (identical
# expression both engines), so both DW sums are exact integers; the final
# ratio is one double, 4dp.
# Scale: one keyed aggregate to the bounded daily relation; residual
# algebra runs on ~tens of rows.
# --------------------------------------------------------------------------
@register(
    "q340_durbin_watson",
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
s AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(t) AS BIGINT) AS st,
           CAST(SUM(x) AS BIGINT) AS sx,
           CAST(SUM(t * t) AS BIGINT) AS stt,
           CAST(SUM(t * x) AS BIGINT) AS stx
    FROM ranked
),
fit AS (
    SELECT n,
           CAST(n * stx - st * sx AS DOUBLE)
               / CAST(n * stt - st * st AS DOUBLE) AS slope,
           (CAST(sx AS DOUBLE)
            - (CAST(n * stx - st * sx AS DOUBLE)
               / CAST(n * stt - st * st AS DOUBLE)) * st) / n AS icept
    FROM s
),
resid AS (
    SELECT r.t,
           CAST(ROUND(1000000.0 * (r.x - (f.icept + f.slope * r.t)))
                AS BIGINT) AS e
    FROM ranked r CROSS JOIN fit f
),
lagged AS (
    SELECT e, LAG(e, 1) OVER (ORDER BY t) AS ep FROM resid
),
dw AS (
    SELECT CAST(SUM(CASE WHEN ep IS NOT NULL
                         THEN (e - ep) * (e - ep) END) AS BIGINT) AS num,
           CAST(SUM(e * e) AS BIGINT) AS den
    FROM lagged
)
SELECT f.n AS n_days, ROUND(f.slope, 4) AS slope,
       ROUND(CAST(d.num AS DOUBLE) / d.den, 4) AS dw,
       ROUND(1.0 - (CAST(d.num AS DOUBLE) / d.den) / 2.0, 4) AS rho1_approx
FROM fit f CROSS JOIN dw d
""",
    tags=("timeseries", "A12"),
)
def q340_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson statistic of daily-count trend residuals:
    (n_days, slope, dw, rho1_approx)."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("x"))
    ranked = daily.select(
        "x", F.row_number().over(Window.orderBy("day")).alias("t")
    )
    s = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t").alias("st"),
        F.sum("x").alias("sx"),
        F.sum(F.col("t") * F.col("t")).alias("stt"),
        F.sum(F.col("t") * F.col("x")).alias("stx"),
    )
    slope = (
        F.col("n") * F.col("stx") - F.col("st") * F.col("sx")
    ).cast("double") / (
        F.col("n") * F.col("stt") - F.col("st") * F.col("st")
    ).cast("double")
    fit = s.select(
        "n",
        slope.alias("slope"),
        (
            (F.col("sx").cast("double") - slope * F.col("st")) / F.col("n")
        ).alias("icept"),
    )
    resid = ranked.crossJoin(F.broadcast(fit)).select(
        "t",
        F.round(
            1000000.0
            * (F.col("x") - (F.col("icept") + F.col("slope") * F.col("t")))
        )
        .cast("long")
        .alias("e"),
    )
    lagged = resid.select(
        "e", F.lag("e", 1).over(Window.orderBy("t")).alias("ep")
    )
    dw = lagged.agg(
        F.sum(
            F.when(
                F.col("ep").isNotNull(),
                (F.col("e") - F.col("ep")) * (F.col("e") - F.col("ep")),
            )
        ).alias("num"),
        F.sum(F.col("e") * F.col("e")).alias("den"),
    )
    ratio = F.col("num").cast("double") / F.col("den")
    return (
        fit.select("n", "slope")
        .crossJoin(F.broadcast(dw))
        .select(
            F.col("n").cast("long").alias("n_days"),
            F.round("slope", 4).alias("slope"),
            F.round(ratio, 4).alias("dw"),
            F.round(1.0 - ratio / 2.0, 4).alias("rho1_approx"),
        )
    )


# --------------------------------------------------------------------------
# q341 - simple-exponential-smoothing one-step-ahead forecast of the
# daily event-count series with alpha = 0.5: for each day t >= 2 the
# forecast is the smoothed level of days 1..t-1, unrolled to the closed
# form l_m = sum_j w_{m,j} x_j with w_{m,1} = 0.5^(m-1) and
# w_{m,j>=2} = 0.5^(m-j+1). The monitooring baseline q272's backtest
# compares against.
# Parity: alpha = 0.5 makes every weight an exact power of two, so each
# term x_j * w is an exact double; terms are frozen to round(1e6*term)
# and integer-summed (no cross-row float accumulation); the forecast and
# error are rationals over those integers, 4dp.
# Scale: the pair join is over the bounded daily relation (~tens of
# rows) — quadratic in days, constant in corpus size.
# --------------------------------------------------------------------------
@register(
    "q341_ses_forecast",
    oracle="""
WITH daily AS (
    SELECT CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS x
    FROM events GROUP BY 1
),
ranked AS (
    SELECT day, x, CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t
    FROM daily
),
levels AS (
    SELECT a.t AS m,
           CAST(SUM(CAST(ROUND(1000000.0 * b.x *
                CASE WHEN b.t = 1 THEN POW(0.5, a.t - 1)
                     ELSE POW(0.5, a.t - b.t + 1) END) AS BIGINT))
                AS BIGINT) AS l_int
    FROM ranked a JOIN ranked b ON b.t <= a.t
    GROUP BY a.t
)
SELECT r.t, CAST(r.day AS VARCHAR) AS day, r.x,
       CAST(ROUND(l.l_int / 100.0) AS BIGINT) / 10000.0 AS forecast,
       CAST(ROUND((r.x * 1000000 - l.l_int) / 100.0) AS BIGINT) / 10000.0
           AS err
FROM ranked r
JOIN levels l ON l.m = r.t - 1
ORDER BY r.t
""",
    tags=("timeseries", "W2", "A12"),
)
def q341_ses_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential-smoothing (alpha=0.5) one-step daily-count forecasts:
    (t, day, x, forecast, err)."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("x"))
    ranked = daily.select(
        "day",
        "x",
        F.row_number().over(Window.orderBy("day")).cast("long").alias("t"),
    )
    a = ranked.select(F.col("t").alias("m"))
    b = ranked.select(F.col("t").alias("j"), F.col("x").alias("xj"))
    w = F.when(
        F.col("j") == 1, F.pow(F.lit(0.5), F.col("m") - 1)
    ).otherwise(F.pow(F.lit(0.5), F.col("m") - F.col("j") + 1))
    levels = (
        a.join(b, F.col("j") <= F.col("m"))
        .groupBy("m")
        .agg(
            F.sum(
                F.round(1000000.0 * F.col("xj") * w).cast("long")
            ).alias("l_int")
        )
    )
    return (
        ranked.join(
            levels, F.col("m") == F.col("t") - 1
        )
        .select(
            "t",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "x",
            # round at integer scale: l_int/100 lands exactly on .5 at
            # half-way cases (exactly representable), so both engines
            # agree; rounding l_int/1e6 to 4dp does not.
            (
                F.round(F.col("l_int") / 100.0).cast("long") / 10000.0
            ).alias("forecast"),
            (
                F.round(
                    (F.col("x") * 1000000 - F.col("l_int")) / 100.0
                ).cast("long")
                / 10000.0
            ).alias("err"),
        )
        .orderBy("t")
    )


# --------------------------------------------------------------------------
# q342 - Hampel filter over the daily event-count series: rolling
# (+-3 day) median and MAD, flagging days where |x - med| exceeds
# 3 * 1.4826 * MAD — the robust outlier detector that q153's z-score
# anomalies can't be (one wild day drags a mean; it barely moves a
# median). The frame is ROWS-based so series edges use their truncated
# neighborhoods.
# Parity: counts are integers, so the interpolated rolling median is an
# exact multiple of 0.5 and the MAD an exact multiple of 0.25 (linear
# interpolation over exact values on both engines); the outlier
# comparison is made on round(1e4*...) frozen sides so a last-ulp
# difference in the 1.4826 product cannot flip a flag.
# Scale: the +-3 neighborhood pair join runs on the bounded daily
# relation (~tens of rows) — constant work regardless of corpus size.
# --------------------------------------------------------------------------
@register(
    "q342_hampel_filter",
    oracle="""
WITH daily AS (
    SELECT CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS x
    FROM events GROUP BY 1
),
ranked AS (
    SELECT day, x, CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t
    FROM daily
),
med AS (
    SELECT a.t, QUANTILE_CONT(CAST(b.x AS DOUBLE), 0.5) AS med
    FROM ranked a JOIN ranked b ON b.t BETWEEN a.t - 3 AND a.t + 3
    GROUP BY a.t
),
mad AS (
    SELECT a.t, QUANTILE_CONT(ABS(CAST(b.x AS DOUBLE) - m.med), 0.5) AS mad
    FROM ranked a
    JOIN med m ON m.t = a.t
    JOIN ranked b ON b.t BETWEEN a.t - 3 AND a.t + 3
    GROUP BY a.t
)
SELECT r.t, CAST(r.day AS VARCHAR) AS day, r.x,
       ROUND(m.med, 4) AS med, ROUND(d.mad, 4) AS mad,
       CAST(CASE WHEN CAST(ROUND(10000.0 * ABS(r.x - m.med)) AS BIGINT)
                      > CAST(ROUND(10000.0 * (3.0 * 1.4826 * d.mad))
                             AS BIGINT)
                 THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
FROM ranked r
JOIN med m ON m.t = r.t
JOIN mad d ON d.t = r.t
ORDER BY r.t
""",
    tags=("timeseries", "W4", "A12"),
)
def q342_hampel_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel rolling-median/MAD outlier flags on daily counts:
    (t, day, x, med, mad, is_outlier)."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("x"))
    ranked = daily.select(
        "day",
        "x",
        F.row_number().over(Window.orderBy("day")).cast("long").alias("t"),
    )
    a = ranked.select(F.col("t").alias("ct"))
    b = ranked.select(F.col("t").alias("j"), F.col("x").alias("xj"))
    nbr = a.join(
        b,
        (F.col("j") >= F.col("ct") - 3) & (F.col("j") <= F.col("ct") + 3),
    )
    med = nbr.groupBy("ct").agg(
        F.expr("percentile(CAST(xj AS DOUBLE), 0.5)").alias("med")
    )
    mad = (
        nbr.join(med, "ct")
        .groupBy("ct")
        .agg(
            F.expr(
                "percentile(ABS(CAST(xj AS DOUBLE) - med), 0.5)"
            ).alias("mad")
        )
    )
    flag = (
        F.round(10000.0 * F.abs(F.col("x") - F.col("med"))).cast("long")
        > F.round(10000.0 * (3.0 * 1.4826 * F.col("mad"))).cast("long")
    ).cast("long")
    return (
        ranked.join(med, F.col("ct") == F.col("t"))
        .drop("ct")
        .join(mad, F.col("ct") == F.col("t"))
        .drop("ct")
        .select(
            "t",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "x",
            F.round("med", 4).alias("med"),
            F.round("mad", 4).alias("mad"),
            flag.alias("is_outlier"),
        )
        .orderBy("t")
    )


# --------------------------------------------------------------------------
# q348 - pairwise Granger-causality screen over the daily event-count
# series: does yesterday's CLICK count improve the prediction of today's
# PURCHASE count beyond purchase's own lag? Unrestricted OLS
# y_t ~ 1 + y_{t-1} + x_{t-1} vs restricted y_t ~ 1 + y_{t-1}; the
# F statistic ((RSS_r - RSS_u)/1) / (RSS_u/(n-3)) is the Granger test.
# The causal-screen companion to q307's lead-lag correlations (which
# measure association at a lag; this one tests incremental predictive
# value).
# Parity: both daily series are exact integers; centering uses the
# n-scaled d = n*v - S trick (q339), so every sufficient statistic
# (Suu, Svv, Suv, Swu, Swv, Sww) is an exact integer accumulated in
# DECIMAL(38,0)/HUGEINT (n-scaled squares pass 2^63 at large SF);
# b1/b2/RSS/F are one fixed double expression over those integers -
# identical IEEE op sequence on both engines. 4dp.
# Scale: one conditional aggregate collapses the corpus to the
# calendar-bounded daily relation; everything after runs on ~tens of
# rows and three 1-row broadcasts.
# --------------------------------------------------------------------------
@register(
    "q348_granger_causality",
    oracle="""
WITH daily AS (
    SELECT CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
           CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
               AS y,
           CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT)
               AS x
    FROM events GROUP BY 1
),
ranked AS (
    SELECT y, x, CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t
    FROM daily
),
rows_ AS (
    SELECT a.y AS yt, b.y AS yl, b.x AS xl
    FROM ranked a JOIN ranked b ON b.t = a.t - 1
),
raw AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(yt) AS BIGINT) AS sw,
           CAST(SUM(yl) AS BIGINT) AS su,
           CAST(SUM(xl) AS BIGINT) AS sv
    FROM rows_
),
cent AS (
    SELECT r.n,
           CAST(SUM(CAST(r.n * w.yl - r.su AS HUGEINT)
                    * CAST(r.n * w.yl - r.su AS HUGEINT)) AS HUGEINT)
               AS suu,
           CAST(SUM(CAST(r.n * w.xl - r.sv AS HUGEINT)
                    * CAST(r.n * w.xl - r.sv AS HUGEINT)) AS HUGEINT)
               AS svv,
           CAST(SUM(CAST(r.n * w.yl - r.su AS HUGEINT)
                    * CAST(r.n * w.xl - r.sv AS HUGEINT)) AS HUGEINT)
               AS suv,
           CAST(SUM(CAST(r.n * w.yt - r.sw AS HUGEINT)
                    * CAST(r.n * w.yl - r.su AS HUGEINT)) AS HUGEINT)
               AS swu,
           CAST(SUM(CAST(r.n * w.yt - r.sw AS HUGEINT)
                    * CAST(r.n * w.xl - r.sv AS HUGEINT)) AS HUGEINT)
               AS swv,
           CAST(SUM(CAST(r.n * w.yt - r.sw AS HUGEINT)
                    * CAST(r.n * w.yt - r.sw AS HUGEINT)) AS HUGEINT)
               AS sww
    FROM rows_ w CROSS JOIN raw r
    GROUP BY r.n
)
SELECT n,
       ROUND((CAST(swu AS DOUBLE) * CAST(svv AS DOUBLE)
              - CAST(swv AS DOUBLE) * CAST(suv AS DOUBLE))
             / (CAST(suu AS DOUBLE) * CAST(svv AS DOUBLE)
                - CAST(suv AS DOUBLE) * CAST(suv AS DOUBLE)), 4) AS b_ylag,
       ROUND((CAST(swv AS DOUBLE) * CAST(suu AS DOUBLE)
              - CAST(swu AS DOUBLE) * CAST(suv AS DOUBLE))
             / (CAST(suu AS DOUBLE) * CAST(svv AS DOUBLE)
                - CAST(suv AS DOUBLE) * CAST(suv AS DOUBLE)), 4) AS b_xlag,
       ROUND(((CAST(sww AS DOUBLE)
               - CAST(swu AS DOUBLE) * CAST(swu AS DOUBLE)
                 / CAST(suu AS DOUBLE))
              - (CAST(sww AS DOUBLE)
                 - (CAST(swu AS DOUBLE)
                    * (CAST(swu AS DOUBLE) * CAST(svv AS DOUBLE)
                       - CAST(swv AS DOUBLE) * CAST(suv AS DOUBLE))
                    + CAST(swv AS DOUBLE)
                      * (CAST(swv AS DOUBLE) * CAST(suu AS DOUBLE)
                         - CAST(swu AS DOUBLE) * CAST(suv AS DOUBLE)))
                   / (CAST(suu AS DOUBLE) * CAST(svv AS DOUBLE)
                      - CAST(suv AS DOUBLE) * CAST(suv AS DOUBLE))))
             / ((CAST(sww AS DOUBLE)
                 - (CAST(swu AS DOUBLE)
                    * (CAST(swu AS DOUBLE) * CAST(svv AS DOUBLE)
                       - CAST(swv AS DOUBLE) * CAST(suv AS DOUBLE))
                    + CAST(swv AS DOUBLE)
                      * (CAST(swv AS DOUBLE) * CAST(suu AS DOUBLE)
                         - CAST(swu AS DOUBLE) * CAST(suv AS DOUBLE)))
                   / (CAST(suu AS DOUBLE) * CAST(svv AS DOUBLE)
                      - CAST(suv AS DOUBLE) * CAST(suv AS DOUBLE)))
                / (n - 3)), 4) AS f_stat
FROM cent
""",
    tags=("timeseries", "ml-eval", "A12"),
)
def q348_granger_causality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Granger F-test: does the lagged click count improve next-day
    purchase-count prediction? (n, b_ylag, b_xlag, f_stat)."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("y"),
        F.count(F.when(F.col("event_type") == "click", 1)).alias("x"),
    )
    ranked = daily.select(
        "y", "x", F.row_number().over(Window.orderBy("day")).alias("t")
    )
    a = ranked.select(F.col("t").alias("ta"), F.col("y").alias("yt"))
    b = ranked.select(
        F.col("t").alias("tb"), F.col("y").alias("yl"), F.col("x").alias("xl")
    )
    rows = a.join(b, F.col("tb") == F.col("ta") - 1).select("yt", "yl", "xl")
    raw = rows.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("yt").alias("sw"),
        F.sum("yl").alias("su"),
        F.sum("xl").alias("sv"),
    )
    dec = "decimal(38,0)"
    u = (F.col("n") * F.col("yl") - F.col("su")).cast(dec)
    v = (F.col("n") * F.col("xl") - F.col("sv")).cast(dec)
    w = (F.col("n") * F.col("yt") - F.col("sw")).cast(dec)
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
    b1 = (swu * svv - swv * suv) / den
    b2 = (swv * suu - swu * suv) / den
    rss_u = sww - (swu * (swu * svv - swv * suv)
                   + swv * (swv * suu - swu * suv)) / den
    rss_r = sww - swu * swu / suu
    return cent.select(
        F.col("n").cast("long").alias("n"),
        F.round(b1, 4).alias("b_ylag"),
        F.round(b2, 4).alias("b_xlag"),
        F.round((rss_r - rss_u) / (rss_u / (F.col("n") - 3)), 4).alias(
            "f_stat"
        ),
    )


# --------------------------------------------------------------------------
# q349 - partial autocorrelation (PACF) of the daily event-count series
# at lags 1..5 via the Durbin-Levinson recursion, unrolled to a fixed
# chain of scalar transforms on a 1-row relation. The AR-order
# diagnostic that reads q247's ACF correctly ("is lag 3 real signal or
# just lag-1 echo") - the standard Box-Jenkins identification plot.
# Parity: each rho_k is frozen to round(1e8*num/den) over the exact
# n-scaled integer lag sums (q339's centering), so both engines start
# from identical doubles; the recursion itself is the SAME generated
# arithmetic string evaluated as a Spark expression and as DuckDB SQL -
# a fixed IEEE op sequence, bit-identical on identical inputs. 4dp.
# Scale: one aggregate to the calendar-bounded daily relation; the
# recursion runs on one row.
# --------------------------------------------------------------------------
_PACF_LAGS = 5


def _durbin_levinson_selects() -> list[list[tuple[str, str]]]:
    """Unrolled Durbin-Levinson: per level k, the (column, expression)
    pairs computing phi_k1..phi_kk and sig_k from level k-1 and the
    frozen rho columns r1..r5. The SAME strings drive Spark's F.expr and
    the DuckDB CTE chain, so the engines execute identical arithmetic."""
    levels = []
    # level 1
    levels.append([("p1_1", "r1"), ("sig1", "1.0 - r1 * r1")])
    for k in range(2, _PACF_LAGS + 1):
        cols = []
        num = f"r{k} - (" + " + ".join(
            f"p{k - 1}_{j} * r{k - j}" for j in range(1, k)
        ) + ")"
        cols.append((f"p{k}_{k}", f"({num}) / sig{k - 1}"))
        for j in range(1, k):
            cols.append(
                (f"p{k}_{j}", f"p{k - 1}_{j} - (({num}) / sig{k - 1}) * p{k - 1}_{k - j}")
            )
        cols.append(
            (f"sig{k}",
             f"sig{k - 1} * (1.0 - (({num}) / sig{k - 1}) * (({num}) / sig{k - 1}))")
        )
        levels.append(cols)
    return levels


def _pacf_oracle() -> str:
    lag_nums = ",\n".join(
        f"""nums{k} AS (
    SELECT CAST(SUM(a.dv * b.dv) AS BIGINT) AS num
    FROM d a JOIN d b ON b.t = a.t + {k}
)""" for k in range(1, _PACF_LAGS + 1)
    )
    rho_cols = ", ".join(
        f"CAST(ROUND(100000000.0 * nums{k}.num / den.dd) AS BIGINT)"
        f" / 100000000.0 AS r{k}"
        for k in range(1, _PACF_LAGS + 1)
    )
    rho_from = " CROSS JOIN ".join(
        ["den"] + [f"nums{k}" for k in range(1, _PACF_LAGS + 1)]
    )
    lev_ctes = []
    prev = "rho"
    for i, cols in enumerate(_durbin_levinson_selects(), start=1):
        exprs = ", ".join(f"{e} AS {c}" for c, e in cols)
        lev_ctes.append(f"lev{i} AS (SELECT *, {exprs} FROM {prev})")
        prev = f"lev{i}"
    pacf_rows = "\nUNION ALL\n".join(
        f"SELECT CAST({k} AS BIGINT) AS lag, ROUND(r{k}, 4) AS rho,"
        f" ROUND(p{k}_{k}, 4) AS pacf FROM lev{_PACF_LAGS}"
        for k in range(1, _PACF_LAGS + 1)
    )
    return f"""
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
    SELECT r.t, r.x * s.n - s.sx AS dv FROM ranked r CROSS JOIN s
),
den AS (SELECT CAST(SUM(dv * dv) AS BIGINT) AS dd FROM d),
{lag_nums},
rho AS (SELECT {rho_cols} FROM {rho_from}),
{", ".join(lev_ctes)}
{pacf_rows}
ORDER BY lag
"""


@register(
    "q349_pacf",
    oracle=_pacf_oracle(),
    tags=("timeseries", "A12", "W2"),
)
def q349_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation of daily event counts, lags 1-5 via
    unrolled Durbin-Levinson: (lag, rho, pacf)."""
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
        "t", (F.col("x") * F.col("n") - F.col("sx")).alias("dv")
    )
    den = d.agg(F.sum(F.col("dv") * F.col("dv")).alias("dd"))
    wt = Window.orderBy("t")
    lagged = d.select(
        "dv",
        *[F.lead("dv", k).over(wt).alias(f"l{k}")
          for k in range(1, _PACF_LAGS + 1)],
    )
    nums = lagged.agg(
        *[F.sum(F.col("dv") * F.col(f"l{k}")).alias(f"num{k}")
          for k in range(1, _PACF_LAGS + 1)]
    )
    rho = nums.crossJoin(F.broadcast(den)).select(
        *[
            (
                F.round(100000000.0 * F.col(f"num{k}") / F.col("dd"))
                .cast("long")
                / 100000000.0
            ).alias(f"r{k}")
            for k in range(1, _PACF_LAGS + 1)
        ]
    )
    lev = rho
    for cols in _durbin_levinson_selects():
        lev = lev.select("*", *[F.expr(e).alias(c) for c, e in cols])
    out = None
    for k in range(1, _PACF_LAGS + 1):
        row = lev.select(
            F.lit(k).cast("long").alias("lag"),
            F.round(F.col(f"r{k}"), 4).alias("rho"),
            F.round(F.col(f"p{k}_{k}"), 4).alias("pacf"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("lag")


# --------------------------------------------------------------------------
# q353 - Tukey HSD post-hoc pairwise comparisons after q332's one-way
# ANOVA (n_chars by lang): for every language pair, the studentized-range
# statistic q = |mean_i - mean_j| / sqrt(MSW/2 * (1/n_i + 1/n_j)) with
# the pooled within-group mean square. The "WHICH groups differ" readout
# an omnibus F can't give.
# Parity: per-group n/Sx/Sxx are exact integers; SSW uses the exact
# identity SSW = sum_i (Sxx_i - Sx_i^2/n_i) evaluated as one double
# expression per group frozen to round(1e4*term) before the cross-group
# sum; means, MSW and q are single double expressions. 4dp.
# Scale: one (lang) keyed aggregate; the pair lattice is the bounded
# lang dim squared (~tens of rows) with the 1-row MSW broadcast.
# --------------------------------------------------------------------------
@register(
    "q353_tukey_hsd",
    oracle="""
WITH g AS (
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS sx,
           CAST(SUM(n_chars * n_chars) AS BIGINT) AS sxx
    FROM documents GROUP BY lang
),
ssw AS (
    SELECT CAST(SUM(CAST(ROUND(10000.0 *
               (sxx - CAST(sx AS DOUBLE) * sx / n)) AS BIGINT)) AS BIGINT)
               AS ssw_t,
           CAST(SUM(n) AS BIGINT) AS nn,
           CAST(COUNT(*) AS BIGINT) AS k
    FROM g
),
msw AS (
    SELECT ssw_t / 10000.0 / (nn - k) AS msw FROM ssw
)
SELECT a.lang AS lang_a, b.lang AS lang_b, a.n AS n_a, b.n AS n_b,
       ROUND(CAST(a.sx AS DOUBLE) / a.n
             - CAST(b.sx AS DOUBLE) / b.n, 4) AS mean_diff,
       ROUND(ABS(CAST(a.sx AS DOUBLE) / a.n - CAST(b.sx AS DOUBLE) / b.n)
             / SQRT(m.msw / 2.0 * (1.0 / a.n + 1.0 / b.n)), 4) AS q_stat
FROM g a JOIN g b ON a.lang < b.lang
CROSS JOIN msw m
ORDER BY lang_a, lang_b
""",
    tags=("inferential", "A12", "J15"),
)
def q353_tukey_hsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey HSD pairwise studentized-range statistics for n_chars by
    lang: (lang_a, lang_b, n_a, n_b, mean_diff, q_stat)."""
    docs = load_table(spark, sf_dir, "documents")
    g = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("sx"),
        F.sum(F.col("n_chars") * F.col("n_chars")).alias("sxx"),
    )
    ssw = g.agg(
        F.sum(
            F.round(
                10000.0
                * (
                    F.col("sxx")
                    - F.col("sx").cast("double") * F.col("sx") / F.col("n")
                )
            ).cast("long")
        ).alias("ssw_t"),
        F.sum("n").alias("nn"),
        F.count(F.lit(1)).alias("k"),
    )
    msw = ssw.select(
        (F.col("ssw_t") / 10000.0 / (F.col("nn") - F.col("k"))).alias("msw")
    )
    a = g.select(
        F.col("lang").alias("lang_a"),
        F.col("n").alias("n_a"),
        F.col("sx").alias("sx_a"),
    )
    b = g.select(
        F.col("lang").alias("lang_b"),
        F.col("n").alias("n_b"),
        F.col("sx").alias("sx_b"),
    )
    mean_a = F.col("sx_a").cast("double") / F.col("n_a")
    mean_b = F.col("sx_b").cast("double") / F.col("n_b")
    return (
        a.join(F.broadcast(b), F.col("lang_a") < F.col("lang_b"))
        .crossJoin(F.broadcast(msw))
        .select(
            "lang_a",
            "lang_b",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.round(mean_a - mean_b, 4).alias("mean_diff"),
            F.round(
                F.abs(mean_a - mean_b)
                / F.sqrt(
                    F.col("msw")
                    / 2.0
                    * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
                ),
                4,
            ).alias("q_stat"),
        )
        .orderBy("lang_a", "lang_b")
    )


# --------------------------------------------------------------------------
# q354 - Poisson overdispersion test of per-type daily event counts: the
# dispersion index D = (n-1)*s^2/mean against its chi-square null, with
# the normal-approximation z = (D - (n-1)) / sqrt(2*(n-1)). "Is this
# arrival process Poisson or bursty" - the capacity-planning gate that
# decides whether mean-based provisioning (q320 peak concurrency reads
# the other side) is even meaningful.
# Parity: daily counts are exact integers; n/Sx/Sxx are exact; s^2, D
# and z are single double expressions over them. 4dp.
# Scale: one (type, day) keyed aggregate then a (type) keyed reduce over
# the calendar-bounded relation.
# --------------------------------------------------------------------------
@register(
    "q354_dispersion_test",
    oracle="""
WITH daily AS (
    SELECT event_type,
           CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS x
    FROM events GROUP BY 1, 2
),
s AS (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS sx,
           CAST(SUM(x * x) AS BIGINT) AS sxx
    FROM daily GROUP BY event_type
)
SELECT event_type, n,
       ROUND(CAST(sx AS DOUBLE) / n, 4) AS mean_daily,
       ROUND((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
             / (CAST(n AS DOUBLE) * (n - 1)), 4) AS var_daily,
       ROUND(((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
              / (CAST(n AS DOUBLE) * (n - 1))) * (n - 1)
             / (CAST(sx AS DOUBLE) / n), 4) AS dispersion,
       ROUND((((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
               / (CAST(n AS DOUBLE) * (n - 1))) * (n - 1)
              / (CAST(sx AS DOUBLE) / n) - (n - 1))
             / SQRT(2.0 * (n - 1)), 4) AS z,
       CAST(CASE WHEN (((n * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * sx)
                        / (CAST(n AS DOUBLE) * (n - 1))) * (n - 1)
                       / (CAST(sx AS DOUBLE) / n) - (n - 1))
                      / SQRT(2.0 * (n - 1)) > 2.0
                 THEN 1 ELSE 0 END AS BIGINT) AS overdispersed
FROM s ORDER BY event_type
""",
    tags=("timeseries", "capacity", "A12"),
)
def q354_dispersion_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson dispersion index of daily counts per event type:
    (event_type, n, mean_daily, var_daily, dispersion, z,
    overdispersed)."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("x"))
    s = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    var = (
        F.col("n") * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx")
    ) / (F.col("n").cast("double") * (F.col("n") - 1))
    disp = var * (F.col("n") - 1) / (F.col("sx").cast("double") / F.col("n"))
    z = (disp - (F.col("n") - 1)) / F.sqrt(2.0 * (F.col("n") - 1))
    return s.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("sx").cast("double") / F.col("n"), 4).alias(
            "mean_daily"
        ),
        F.round(var, 4).alias("var_daily"),
        F.round(disp, 4).alias("dispersion"),
        F.round(z, 4).alias("z"),
        (z > 2.0).cast("long").alias("overdispersed"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# q359 - forecast-accuracy scorecard: MAE / MAPE / sMAPE / MASE of the
# q341 exponential-smoothing one-step forecasts NEXT TO the naive-1
# (yesterday's value) baseline over the daily event-count series. MASE
# (error scaled by the naive MAE) is the metric that makes the two rows
# directly comparable - MASE < 1 means the model beats persistence.
# Parity: the SES level is q341's exact integer recurrence (frozen
# per-term weights summed as integers); every per-day ratio term
# (|e|/x, 2|e|/(x+f)) is frozen to round(1e8*term) before the per-model
# sum; MAE sums are exact micro-integers; MASE is one double ratio. 4dp.
# Scale: collapse-first to the calendar-bounded daily relation; the SES
# pair join is quadratic in DAYS, constant in corpus size.
# --------------------------------------------------------------------------
@register(
    "q359_forecast_eval",
    oracle="""
WITH daily AS (
    SELECT CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS x
    FROM events GROUP BY 1
),
ranked AS (
    SELECT day, x, CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t
    FROM daily
),
levels AS (
    SELECT a.t AS m,
           CAST(SUM(CAST(ROUND(1000000.0 * b.x *
                CASE WHEN b.t = 1 THEN POW(0.5, a.t - 1)
                     ELSE POW(0.5, a.t - b.t + 1) END) AS BIGINT))
                AS BIGINT) AS l_int
    FROM ranked a JOIN ranked b ON b.t <= a.t
    GROUP BY a.t
),
fc AS (
    SELECT 'ses' AS model, r.t, r.x,
           ABS(r.x * 1000000 - l.l_int) AS ae_micro,
           CAST(ROUND(100000000.0 * ABS(r.x * 1000000 - l.l_int)
                / (1000000.0 * r.x)) AS BIGINT) AS ape_t,
           CAST(ROUND(100000000.0 * 2.0 * ABS(r.x * 1000000 - l.l_int)
                / (1000000.0 * r.x + l.l_int)) AS BIGINT) AS sape_t
    FROM ranked r JOIN levels l ON l.m = r.t - 1
    UNION ALL
    SELECT 'naive', r.t, r.x,
           ABS(r.x - p.x) * 1000000 AS ae_micro,
           CAST(ROUND(100000000.0 * ABS(r.x - p.x)
                / CAST(r.x AS DOUBLE)) AS BIGINT) AS ape_t,
           CAST(ROUND(100000000.0 * 2.0 * ABS(r.x - p.x)
                / CAST(r.x + p.x AS DOUBLE)) AS BIGINT) AS sape_t
    FROM ranked r JOIN ranked p ON p.t = r.t - 1
),
agg AS (
    SELECT model, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(ae_micro) AS BIGINT) AS sae,
           CAST(SUM(ape_t) AS BIGINT) AS sape_sum,
           CAST(SUM(sape_t) AS BIGINT) AS ssape_sum
    FROM fc GROUP BY model
),
nmae AS (
    SELECT CAST(sae AS DOUBLE) / n AS naive_mae FROM agg
    WHERE model = 'naive'
)
SELECT a.model, a.n,
       ROUND(a.sae / 1000000.0 / a.n, 4) AS mae,
       ROUND(a.sape_sum / 100000000.0 / a.n, 4) AS mape,
       ROUND(a.ssape_sum / 100000000.0 / a.n, 4) AS smape,
       ROUND((CAST(a.sae AS DOUBLE) / a.n) / nm.naive_mae, 4) AS mase
FROM agg a CROSS JOIN nmae nm
ORDER BY a.model
""",
    tags=("timeseries", "ml-eval", "A12"),
)
def q359_forecast_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAE/MAPE/sMAPE/MASE of SES vs naive-1 daily-count forecasts:
    (model, n, mae, mape, smape, mase)."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("x"))
    ranked = daily.select(
        "day",
        "x",
        F.row_number().over(Window.orderBy("day")).cast("long").alias("t"),
    )
    a = ranked.select(F.col("t").alias("m"))
    b = ranked.select(F.col("t").alias("j"), F.col("x").alias("xj"))
    w = F.when(
        F.col("j") == 1, F.pow(F.lit(0.5), F.col("m") - 1)
    ).otherwise(F.pow(F.lit(0.5), F.col("m") - F.col("j") + 1))
    levels = (
        a.join(b, F.col("j") <= F.col("m"))
        .groupBy("m")
        .agg(
            F.sum(
                F.round(1000000.0 * F.col("xj") * w).cast("long")
            ).alias("l_int")
        )
    )
    ses = ranked.join(levels, F.col("m") == F.col("t") - 1).select(
        F.lit("ses").alias("model"),
        "x",
        F.abs(F.col("x") * 1000000 - F.col("l_int")).alias("ae_micro"),
        F.round(
            100000000.0
            * F.abs(F.col("x") * 1000000 - F.col("l_int"))
            / (1000000.0 * F.col("x"))
        )
        .cast("long")
        .alias("ape_t"),
        F.round(
            100000000.0
            * 2.0
            * F.abs(F.col("x") * 1000000 - F.col("l_int"))
            / (1000000.0 * F.col("x") + F.col("l_int"))
        )
        .cast("long")
        .alias("sape_t"),
    )
    prev = ranked.select(
        (F.col("t") + 1).alias("t"), F.col("x").alias("px")
    )
    naive = ranked.join(prev, "t").select(
        F.lit("naive").alias("model"),
        "x",
        (F.abs(F.col("x") - F.col("px")) * 1000000).alias("ae_micro"),
        F.round(
            100000000.0
            * F.abs(F.col("x") - F.col("px"))
            / F.col("x").cast("double")
        )
        .cast("long")
        .alias("ape_t"),
        F.round(
            100000000.0
            * 2.0
            * F.abs(F.col("x") - F.col("px"))
            / (F.col("x") + F.col("px")).cast("double")
        )
        .cast("long")
        .alias("sape_t"),
    )
    agg = (
        ses.unionByName(naive)
        .groupBy("model")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("ae_micro").alias("sae"),
            F.sum("ape_t").alias("sape_sum"),
            F.sum("sape_t").alias("ssape_sum"),
        )
    )
    nmae = agg.filter(F.col("model") == "naive").select(
        (F.col("sae").cast("double") / F.col("n")).alias("naive_mae")
    )
    return (
        agg.crossJoin(F.broadcast(nmae))
        .select(
            "model",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("sae") / 1000000.0 / F.col("n"), 4).alias("mae"),
            F.round(
                F.col("sape_sum") / 100000000.0 / F.col("n"), 4
            ).alias("mape"),
            F.round(
                F.col("ssape_sum") / 100000000.0 / F.col("n"), 4
            ).alias("smape"),
            F.round(
                (F.col("sae").cast("double") / F.col("n"))
                / F.col("naive_mae"),
                4,
            ).alias("mase"),
        )
        .orderBy("model")
    )


# --------------------------------------------------------------------------
# q360 - A/B sample-size / MDE planner anchored to the OBSERVED
# conversion baseline: with p0 = the measured click->purchase rate, for
# each candidate per-arm sample size n, the minimum detectable absolute
# effect at alpha = 0.05 (two-sided), power = 0.80 under the two-
# proportion normal approximation: MDE solves
# mde = (z_a*sqrt(2*p0(1-p0)) + z_b*sqrt(p0(1-p0) + p(1-p)))/sqrt(n)
# iterated twice from p = p0 (the standard fixed-point refinement,
# unrolled so both engines run the identical two steps). The design
# relation consulted BEFORE q175's test readout and q264's sequential
# monitor.
# Parity: p0 is one ratio of exact integer counts; the candidate grid is
# a literal single-partition frame; the MDE is a fixed unrolled double
# expression. 4dp.
# Scale: two user-keyed aggregates for the baseline; the planner runs on
# a 6-row constant grid.
# --------------------------------------------------------------------------
@register(
    "q360_power_planner",
    oracle="""
WITH clickers AS (
    SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
),
buyers AS (
    SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
),
base AS (
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM clickers) AS n_click,
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM clickers c JOIN buyers b ON b.user_id = c.user_id)
               AS n_conv
),
grid AS (SELECT UNNEST([1000, 5000, 10000, 50000, 100000, 500000]) AS n),
p0 AS (SELECT CAST(n_conv AS DOUBLE) / n_click AS p, n_click, n_conv
       FROM base),
step1 AS (
    SELECT g.n, p0.p, p0.n_click, p0.n_conv,
           (1.959964 * SQRT(2.0 * p0.p * (1.0 - p0.p))
            + 0.841621 * SQRT(2.0 * p0.p * (1.0 - p0.p))) / SQRT(g.n)
               AS mde1
    FROM grid g CROSS JOIN p0
)
SELECT CAST(n AS BIGINT) AS n_per_arm, n_click, n_conv,
       ROUND(p, 4) AS baseline_rate,
       ROUND((1.959964 * SQRT(2.0 * p * (1.0 - p))
              + 0.841621 * SQRT(p * (1.0 - p)
                                + (p + mde1) * (1.0 - p - mde1)))
             / SQRT(n), 4) AS mde_abs
FROM step1
ORDER BY n_per_arm
""",
    tags=("inferential", "capacity", "A12"),
)
def q360_power_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum detectable effect per candidate A/B arm size at the
    observed click->purchase baseline:
    (n_per_arm, n_click, n_conv, baseline_rate, mde_abs)."""
    events = load_table(spark, sf_dir, "events")
    clickers = (
        events.filter(F.col("event_type") == "click")
        .select("user_id")
        .distinct()
    )
    buyers = (
        events.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
    )
    base = clickers.agg(F.count(F.lit(1)).alias("n_click")).crossJoin(
        clickers.join(buyers, "user_id")
        .agg(F.count(F.lit(1)).alias("n_conv"))
    )
    grid = spark.createDataFrame(
        [(n,) for n in (1000, 5000, 10000, 50000, 100000, 500000)],
        "n long",
    ).coalesce(1)
    za, zb = 1.959964, 0.841621
    p = F.col("n_conv").cast("double") / F.col("n_click")
    mde1 = (
        za * F.sqrt(2.0 * p * (1.0 - p)) + zb * F.sqrt(2.0 * p * (1.0 - p))
    ) / F.sqrt(F.col("n"))
    step1 = grid.crossJoin(F.broadcast(base)).select(
        "n", "n_click", "n_conv", p.alias("p"), mde1.alias("mde1")
    )
    mde = (
        za * F.sqrt(2.0 * F.col("p") * (1.0 - F.col("p")))
        + zb
        * F.sqrt(
            F.col("p") * (1.0 - F.col("p"))
            + (F.col("p") + F.col("mde1"))
            * (1.0 - F.col("p") - F.col("mde1"))
        )
    ) / F.sqrt(F.col("n"))
    return step1.select(
        F.col("n").alias("n_per_arm"),
        "n_click",
        "n_conv",
        F.round("p", 4).alias("baseline_rate"),
        F.round(mde, 4).alias("mde_abs"),
    ).orderBy("n_per_arm")


# --------------------------------------------------------------------------
# q362 - anomaly-vote ensemble over the per-type daily count series: the
# z-score detector (|z| > 2, q153's family), the Hampel/MAD detector
# (|x - med| > 3*1.4826*MAD, q342's), and the Tukey-fence detector
# (outside [q1 - 1.5*IQR, q3 + 1.5*IQR], q219's) each vote per
# (type, day); the ensemble flags days with >= 2 votes. Single detectors
# disagree exactly where anomalies are ambiguous - the vote is what a
# production alerting pipeline actually pages on.
# Parity: counts are integers; mean/std votes compare round(1e4*|z|)
# (the q342 freezing discipline); medians/quartiles of integer counts
# are exact multiples of 0.25 on both engines; every fence comparison is
# made on frozen integer sides. Output is all-integer votes.
# Scale: one (type, day) aggregate; per-type stats are keyed aggregates
# over the calendar-bounded relation broadcast back.
# --------------------------------------------------------------------------
@register(
    "q362_anomaly_ensemble",
    oracle="""
WITH daily AS (
    SELECT event_type,
           CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS x
    FROM events GROUP BY 1, 2
),
st AS (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS sx,
           CAST(SUM(x * x) AS BIGINT) AS sxx,
           QUANTILE_CONT(CAST(x AS DOUBLE), 0.5) AS med,
           QUANTILE_CONT(CAST(x AS DOUBLE), 0.25) AS q1,
           QUANTILE_CONT(CAST(x AS DOUBLE), 0.75) AS q3
    FROM daily GROUP BY event_type
),
mad AS (
    SELECT d.event_type,
           QUANTILE_CONT(ABS(CAST(d.x AS DOUBLE) - s.med), 0.5) AS mad
    FROM daily d JOIN st s ON s.event_type = d.event_type
    GROUP BY d.event_type
),
votes AS (
    SELECT d.event_type, CAST(d.day AS VARCHAR) AS day, d.x,
           CAST(CASE WHEN CAST(ROUND(10000.0 * ABS(d.x - CAST(s.sx AS DOUBLE) / s.n)
                     / SQRT((s.n * CAST(s.sxx AS DOUBLE) - CAST(s.sx AS DOUBLE) * s.sx)
                            / (CAST(s.n AS DOUBLE) * (s.n - 1)))) AS BIGINT)
                     > 20000 THEN 1 ELSE 0 END AS BIGINT) AS v_z,
           CAST(CASE WHEN CAST(ROUND(10000.0 * ABS(d.x - s.med)) AS BIGINT)
                     > CAST(ROUND(10000.0 * (3.0 * 1.4826 * m.mad)) AS BIGINT)
                     THEN 1 ELSE 0 END AS BIGINT) AS v_mad,
           CAST(CASE WHEN CAST(ROUND(10000.0 * d.x) AS BIGINT)
                       < CAST(ROUND(10000.0 * (s.q1 - 1.5 * (s.q3 - s.q1))) AS BIGINT)
                     OR CAST(ROUND(10000.0 * d.x) AS BIGINT)
                       > CAST(ROUND(10000.0 * (s.q3 + 1.5 * (s.q3 - s.q1))) AS BIGINT)
                     THEN 1 ELSE 0 END AS BIGINT) AS v_iqr
    FROM daily d
    JOIN st s ON s.event_type = d.event_type
    JOIN mad m ON m.event_type = d.event_type
)
SELECT event_type, day, x, v_z, v_mad, v_iqr,
       CAST(CASE WHEN v_z + v_mad + v_iqr >= 2 THEN 1 ELSE 0 END AS BIGINT)
           AS is_anomaly
FROM votes
WHERE v_z + v_mad + v_iqr >= 1
ORDER BY event_type, day
""",
    tags=("timeseries", "W4", "A12"),
)
def q362_anomaly_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-of-three anomaly vote (z / MAD / Tukey fence) on per-type
    daily counts: (event_type, day, x, v_z, v_mad, v_iqr, is_anomaly);
    only voted days are emitted."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.count(F.lit(1)).alias("x"))
    st = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.expr("percentile(CAST(x AS DOUBLE), 0.5)").alias("med"),
        F.expr("percentile(CAST(x AS DOUBLE), 0.25)").alias("q1"),
        F.expr("percentile(CAST(x AS DOUBLE), 0.75)").alias("q3"),
    )
    mad = (
        daily.join(st.select("event_type", "med"), "event_type")
        .groupBy("event_type")
        .agg(
            F.expr(
                "percentile(ABS(CAST(x AS DOUBLE) - med), 0.5)"
            ).alias("mad")
        )
    )
    j = daily.join(F.broadcast(st), "event_type").join(
        F.broadcast(mad), "event_type"
    )
    std = F.sqrt(
        (
            F.col("n") * F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx")
        )
        / (F.col("n").cast("double") * (F.col("n") - 1))
    )
    v_z = (
        F.round(
            10000.0
            * F.abs(
                F.col("x") - F.col("sx").cast("double") / F.col("n")
            )
            / std
        ).cast("long")
        > 20000
    ).cast("long")
    v_mad = (
        F.round(10000.0 * F.abs(F.col("x") - F.col("med"))).cast("long")
        > F.round(10000.0 * (3.0 * 1.4826 * F.col("mad"))).cast("long")
    ).cast("long")
    iqr = F.col("q3") - F.col("q1")
    v_iqr = (
        (
            F.round(10000.0 * F.col("x")).cast("long")
            < F.round(10000.0 * (F.col("q1") - 1.5 * iqr)).cast("long")
        )
        | (
            F.round(10000.0 * F.col("x")).cast("long")
            > F.round(10000.0 * (F.col("q3") + 1.5 * iqr)).cast("long")
        )
    ).cast("long")
    votes = j.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "x",
        v_z.alias("v_z"),
        v_mad.alias("v_mad"),
        v_iqr.alias("v_iqr"),
    )
    return (
        votes.withColumn(
            "is_anomaly",
            (
                F.col("v_z") + F.col("v_mad") + F.col("v_iqr") >= 2
            ).cast("long"),
        )
        .filter(F.col("v_z") + F.col("v_mad") + F.col("v_iqr") >= 1)
        .orderBy("event_type", "day")
    )


# --------------------------------------------------------------------------
# q366 - circular time-of-day statistics per event type: map each event
# to its angle on the 24h circle (theta = 2*pi*sec_of_day/86400) and
# report the circular mean hour and the resultant length
# R = |sum e^{i*theta}|/n - the statistics that get "mean hour of
# activity" RIGHT when activity straddles midnight (a linear mean of
# 23:00 and 01:00 says noon; the circular mean says midnight). R near 1
# = concentrated daily peak, near 0 = uniform around the clock.
# Parity: sec_of_day is exact integer arithmetic on epoch seconds (UTC-
# pinned reader); cos/sin are frozen per event to round(1e6*trig) (the
# q326 libm-ulp treatment) so C and S are exact integer sums; mean hour
# and R are single double expressions with the SAME atan2 branch handling
# ((atan2 + 2*pi) fmod 2*pi) on both engines. 4dp.
# Scale: one narrow map + one (type) keyed aggregate with map-side
# partials. Nothing downstream of the reduce exceeds the type dim.
# --------------------------------------------------------------------------
@register(
    "q366_circular_stats",
    oracle="""
WITH ang AS (
    SELECT event_type,
           2.0 * PI()
           * (CAST(FLOOR(EPOCH(CAST(ts AS TIMESTAMP))) AS BIGINT) % 86400)
               / 86400.0 AS theta
    FROM events
),
frozen AS (
    SELECT event_type,
           CAST(ROUND(1000000.0 * COS(theta)) AS BIGINT) AS c,
           CAST(ROUND(1000000.0 * SIN(theta)) AS BIGINT) AS s
    FROM ang
),
agg AS (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(c) AS BIGINT) AS sc, CAST(SUM(s) AS BIGINT) AS ss
    FROM frozen GROUP BY event_type
)
SELECT event_type, n,
       ROUND(FMOD(ATAN2(CAST(ss AS DOUBLE), CAST(sc AS DOUBLE))
                  + 2.0 * PI(), 2.0 * PI()) / (2.0 * PI()) * 24.0, 4)
           AS mean_hour,
       ROUND(SQRT(CAST(sc AS DOUBLE) * sc + CAST(ss AS DOUBLE) * ss)
             / (1000000.0 * n), 4) AS resultant_r
FROM agg ORDER BY event_type
""",
    tags=("timeseries", "A12"),
)
def q366_circular_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Circular mean hour + resultant length per event type:
    (event_type, n, mean_hour, resultant_r)."""
    import math as _m

    events = load_table(spark, sf_dir, "events")
    theta = (
        2.0
        * _m.pi
        * (F.unix_timestamp("ts") % 86400).cast("double")
        / 86400.0
    )
    frozen = events.select(
        "event_type",
        F.round(1000000.0 * F.cos(theta)).cast("long").alias("c"),
        F.round(1000000.0 * F.sin(theta)).cast("long").alias("s"),
    )
    agg = frozen.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("sc"),
        F.sum("s").alias("ss"),
    )
    two_pi = 2.0 * _m.pi
    # atan2 ∈ [−π, π], so +2π is strictly positive and a single
    # positive-operand remainder equals fmod on both engines.
    mean_hour = (
        F.expr(
            f"((ATAN2(CAST(ss AS DOUBLE), CAST(sc AS DOUBLE))"
            f" + {two_pi!r}) % {two_pi!r})"
        )
        / two_pi
        * 24.0
    )
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round(mean_hour, 4).alias("mean_hour"),
        F.round(
            F.sqrt(
                F.col("sc").cast("double") * F.col("sc")
                + F.col("ss").cast("double") * F.col("ss")
            )
            / (1000000.0 * F.col("n")),
            4,
        ).alias("resultant_r"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# q368 - Friedman test over the (day x event type) block design: within
# each day, rank the k event types by their daily counts (average ranks
# on ties, zero-filled missing cells so every block is complete);
# Q = 12/(n*k*(k+1)) * sum R_j^2 - 3n(k+1), with the tie-corrected
# Q_c = Q / (1 - sum_b T_b / (n*k*(k^2-1))), T_b = sum(t^3 - t) over each
# block's tie groups. The within-block companion to q315's
# Kruskal-Wallis (between-group): "do event types keep a consistent
# volume ORDERING day after day".
# Parity: average ranks are exact multiples of 0.5 - doubled ranks are
# exact integers (min-rank window + tie-group size), so rank sums, tie
# terms and Q are integer algebra with one double expression at the end.
# 4dp.
# Scale: one (type, day) aggregate, a day-dim x type-dim zero-fill grid
# (calendar x type bounded), partitioned rank windows per day - never a
# global sort.
# --------------------------------------------------------------------------
@register(
    "q368_friedman_test",
    oracle="""
WITH daily AS (
    SELECT event_type,
           CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS x
    FROM events GROUP BY 1, 2
),
grid AS (
    SELECT d.day, t.event_type, COALESCE(c.x, 0) AS x
    FROM (SELECT DISTINCT day FROM daily) d
    CROSS JOIN (SELECT DISTINCT event_type FROM daily) t
    LEFT JOIN daily c ON c.day = d.day AND c.event_type = t.event_type
),
ranked AS (
    SELECT day, event_type, x,
           CAST(RANK() OVER (PARTITION BY day ORDER BY x) AS BIGINT)
               AS min_rk,
           CAST(COUNT(*) OVER (PARTITION BY day, x) AS BIGINT) AS tie_n
    FROM grid
),
r2 AS (
    SELECT day, event_type,
           2 * min_rk + tie_n - 1 AS dbl_rank, tie_n
    FROM ranked
),
dims AS (
    SELECT CAST(COUNT(DISTINCT day) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k
    FROM grid
),
rsums AS (
    SELECT event_type, CAST(SUM(dbl_rank) AS BIGINT) AS r2sum
    FROM r2 GROUP BY event_type
),
tt AS (
    SELECT CAST(SUM(tie_n * tie_n * tie_n - tie_n) AS BIGINT) AS t_sum
    FROM (SELECT DISTINCT day, x, tie_n FROM ranked) g
),
q AS (
    SELECT d.n, d.k,
           12.0 / (d.n * d.k * (d.k + 1))
               * SUM((CAST(r.r2sum AS DOUBLE) / 2)
                     * (CAST(r.r2sum AS DOUBLE) / 2))
               - 3.0 * d.n * (d.k + 1) AS q_stat,
           MAX(t.t_sum) AS t_sum
    FROM rsums r CROSS JOIN dims d CROSS JOIN tt t
    GROUP BY d.n, d.k
)
SELECT r.event_type, r.r2sum / 2.0 AS rank_sum,
       ROUND(r.r2sum / 2.0 / q.n, 4) AS mean_rank,
       ROUND(q.q_stat, 4) AS q_stat,
       ROUND(q.q_stat
             / (1.0 - CAST(q.t_sum AS DOUBLE)
                      / (q.n * q.k * (q.k * q.k - 1))), 4) AS q_corrected
FROM rsums r CROSS JOIN q
ORDER BY event_type
""",
    tags=("inferential", "W2", "A12"),
)
def q368_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman within-day rank test of event-type volumes:
    (event_type, rank_sum, mean_rank, q_stat, q_corrected)."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.count(F.lit(1)).alias("x"))
    days = daily.select("day").distinct()
    types = daily.select("event_type").distinct()
    grid = (
        days.crossJoin(F.broadcast(types))
        .join(daily, ["day", "event_type"], "left")
        .select(
            "day", "event_type", F.coalesce("x", F.lit(0)).alias("x")
        )
    )
    wday = Window.partitionBy("day").orderBy("x")
    wtie = Window.partitionBy("day", "x")
    ranked = grid.select(
        "day",
        "event_type",
        "x",
        F.rank().over(wday).cast("long").alias("min_rk"),
        F.count(F.lit(1)).over(wtie).cast("long").alias("tie_n"),
    )
    r2 = ranked.select(
        "day",
        "event_type",
        (2 * F.col("min_rk") + F.col("tie_n") - 1).alias("dbl_rank"),
        "tie_n",
        "x",
    )
    dims = grid.agg(
        F.countDistinct("day").alias("n"),
        F.countDistinct("event_type").alias("k"),
    )
    rsums = r2.groupBy("event_type").agg(
        F.sum("dbl_rank").alias("r2sum")
    )
    tsum = (
        ranked.select("day", "x", "tie_n")
        .distinct()
        .agg(
            F.sum(
                F.col("tie_n") * F.col("tie_n") * F.col("tie_n")
                - F.col("tie_n")
            ).alias("t_sum")
        )
    )
    qrow = (
        rsums.crossJoin(F.broadcast(dims))
        .crossJoin(F.broadcast(tsum))
        .groupBy("n", "k", "t_sum")
        .agg(
            (
                12.0
                / (F.col("n") * F.col("k") * (F.col("k") + 1))
                * F.sum(
                    (F.col("r2sum").cast("double") / 2)
                    * (F.col("r2sum").cast("double") / 2)
                )
                - 3.0 * F.col("n") * (F.col("k") + 1)
            ).alias("q_stat")
        )
    )
    return (
        rsums.crossJoin(F.broadcast(qrow))
        .select(
            "event_type",
            (F.col("r2sum") / 2.0).alias("rank_sum"),
            F.round(F.col("r2sum") / 2.0 / F.col("n"), 4).alias(
                "mean_rank"
            ),
            F.round("q_stat", 4).alias("q_stat"),
            F.round(
                F.col("q_stat")
                / (
                    1.0
                    - F.col("t_sum").cast("double")
                    / (
                        F.col("n")
                        * F.col("k")
                        * (F.col("k") * F.col("k") - 1)
                    )
                ),
                4,
            ).alias("q_corrected"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# q378 - Hurst exponent by rescaled-range (R/S) analysis of the daily
# event-count series: split the series into consecutive blocks of
# n ∈ {8, 16, 32} days, compute each block's rescaled range
# R/S = (max cum-dev - min cum-dev) / (n·std), average per n, and fit
# ln(R/S) ~ H·ln(n) by exact 3-point OLS. H ≈ 0.5 = memoryless, > 0.5 =
# persistent trends (q294 Mann-Kendall's monotone cousin), < 0.5 =
# mean-reverting. The long-range-dependence read none of the lag-k
# statistics (q247/q339/q349) can give.
# Parity: with d_j = n_b·x_j - S_b (the q339 exact centering), block
# cumulative deviations are exact integer running sums and
# R/S = (max cum - min cum) / sqrt(n_b·Σx² - S_b²) is one double from
# integers, frozen to round(1e8·rs) before the per-n mean; the 3-point
# slope is a fixed closed form. 4dp.
# Scale: one events aggregate to the daily relation; block windows
# partition by (n, block) over the calendar-bounded series.
# --------------------------------------------------------------------------
@register(
    "q378_hurst_exponent",
    oracle="""
WITH daily AS (
    SELECT CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS x
    FROM events GROUP BY 1
),
ranked AS (
    SELECT x, CAST(ROW_NUMBER() OVER (ORDER BY day) - 1 AS BIGINT) AS t
    FROM daily
),
sizes AS (SELECT UNNEST([8, 16, 32]) AS n),
blocks AS (
    SELECT s.n, r.t // s.n AS blk, r.t, r.x
    FROM ranked r CROSS JOIN sizes s
),
bstat AS (
    SELECT n, blk, CAST(COUNT(*) AS BIGINT) AS nb,
           CAST(SUM(x) AS BIGINT) AS sx,
           CAST(SUM(x * x) AS BIGINT) AS sxx
    FROM blocks GROUP BY n, blk
),
full_b AS (SELECT * FROM bstat WHERE nb = n),
dev AS (
    SELECT b.n, b.blk, b.t,
           CAST(SUM(f.nb * b.x - f.sx) OVER (
               PARTITION BY b.n, b.blk ORDER BY b.t
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
    FROM blocks b JOIN full_b f ON f.n = b.n AND f.blk = b.blk
),
rng AS (
    SELECT n, blk, CAST(MAX(cum) - MIN(LEAST(cum, 0)) AS BIGINT) AS r_int
    FROM (SELECT n, blk, t, cum FROM dev) GROUP BY n, blk
),
rs AS (
    SELECT r.n, r.blk,
           CAST(ROUND(100000000.0 * r.r_int /
                SQRT(CAST(f.nb AS DOUBLE) * f.sxx
                     - CAST(f.sx AS DOUBLE) * f.sx)) AS BIGINT) AS rs_t
    FROM rng r JOIN full_b f ON f.n = r.n AND f.blk = r.blk
    WHERE f.nb * f.sxx > f.sx * f.sx
),
mrs AS (
    SELECT n, CAST(COUNT(*) AS BIGINT) AS n_blocks,
           CAST(SUM(rs_t) AS BIGINT) AS s_rs
    FROM rs GROUP BY n
),
pts AS (
    SELECT n, n_blocks, s_rs,
           LN(CAST(n AS DOUBLE)) AS lx,
           LN(CAST(s_rs AS DOUBLE) / 100000000.0 / n_blocks) AS ly
    FROM mrs
),
fit AS (
    SELECT (COUNT(*) * SUM(lx * ly) - SUM(lx) * SUM(ly))
           / (COUNT(*) * SUM(lx * lx) - SUM(lx) * SUM(lx)) AS h
    FROM pts
)
SELECT CAST(p.n AS BIGINT) AS n, p.n_blocks,
       ROUND(p.s_rs / 100000000.0 / p.n_blocks, 4) AS mean_rs,
       ROUND(f.h, 4) AS hurst
FROM pts p CROSS JOIN fit f
ORDER BY n
""",
    tags=("timeseries", "A12", "W2"),
)
def q378_hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rescaled-range Hurst exponent of daily event counts:
    (n, n_blocks, mean_rs, hurst)."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("x"))
    ranked = daily.select(
        "x",
        (F.row_number().over(Window.orderBy("day")) - 1)
        .cast("long")
        .alias("t"),
    )
    sizes = spark.createDataFrame(
        [(n,) for n in (8, 16, 32)], "n long"
    ).coalesce(1)
    blocks = ranked.crossJoin(F.broadcast(sizes)).select(
        "n", (F.col("t") / F.col("n")).cast("long").alias("blk"), "t", "x"
    )
    bstat = blocks.groupBy("n", "blk").agg(
        F.count(F.lit(1)).alias("nb"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    full_b = bstat.filter(F.col("nb") == F.col("n"))
    wb = Window.partitionBy("n", "blk").orderBy("t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    dev = (
        blocks.join(full_b, ["n", "blk"])
        .select(
            "n",
            "blk",
            "t",
            F.sum(F.col("nb") * F.col("x") - F.col("sx"))
            .over(wb)
            .cast("long")
            .alias("cum"),
        )
    )
    rng = dev.groupBy("n", "blk").agg(
        (
            F.max("cum") - F.least(F.min("cum"), F.lit(0).cast("long"))
        ).cast("long").alias("r_int")
    )
    rs = (
        rng.join(full_b, ["n", "blk"])
        .filter(
            F.col("nb") * F.col("sxx") > F.col("sx") * F.col("sx")
        )
        .select(
            "n",
            F.round(
                100000000.0
                * F.col("r_int")
                / F.sqrt(
                    F.col("nb").cast("double") * F.col("sxx")
                    - F.col("sx").cast("double") * F.col("sx")
                )
            )
            .cast("long")
            .alias("rs_t"),
        )
    )
    mrs = rs.groupBy("n").agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum("rs_t").alias("s_rs"),
    )
    pts = mrs.select(
        "n",
        "n_blocks",
        "s_rs",
        F.log(F.col("n").cast("double")).alias("lx"),
        F.log(
            F.col("s_rs").cast("double") / 100000000.0 / F.col("n_blocks")
        ).alias("ly"),
    )
    fit = pts.agg(
        (
            (
                F.count(F.lit(1)) * F.sum(F.col("lx") * F.col("ly"))
                - F.sum("lx") * F.sum("ly")
            )
            / (
                F.count(F.lit(1)) * F.sum(F.col("lx") * F.col("lx"))
                - F.sum("lx") * F.sum("lx")
            )
        ).alias("h")
    )
    return (
        pts.crossJoin(F.broadcast(fit))
        .select(
            F.col("n").cast("long").alias("n"),
            F.col("n_blocks").cast("long").alias("n_blocks"),
            F.round(
                F.col("s_rs") / 100000000.0 / F.col("n_blocks"), 4
            ).alias("mean_rs"),
            F.round("h", 4).alias("hurst"),
        )
        .orderBy("n")
    )


# --------------------------------------------------------------------------
# q381 - burstiness and memory of inter-event times (Goh & Barabasi
# 2008): per event type, order events by (second, event_id), take the
# consecutive inter-arrival gaps tau_i, and report
# B = (sigma - mu)/(sigma + mu) (-1 = perfectly regular, 0 = Poisson,
# -> 1 = extreme bursts) and the memory coefficient
# M = corr(tau_i, tau_{i+1}). The arrival-process fingerprint that
# q354's dispersion (a DAILY-bucket read) cannot see - bursts inside a
# day are invisible to per-day counts.
# Parity: gaps are exact integer seconds under a deterministic total
# order ((sec, event_id) - same-second order pinned by id); mu/sigma/M
# are single double expressions over exact integer sums (n, S, S2,
# and the lag-1 cross sums). 4dp.
# Scale: gaps come from the day-shard-and-stitch kernel
# (operators/windows.py sharded_gaps) — the big window hash-partitions
# by (event_type, day) so per-reducer width is one type-day; boundary
# gaps stitch through the calendar-bounded per-shard summary. Then one
# keyed reduce.
# --------------------------------------------------------------------------
@register(
    "q381_burstiness",
    oracle="""
WITH ev AS (
    SELECT event_type, event_id,
           CAST(FLOOR(EPOCH(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec
    FROM events
),
ordered AS (
    SELECT e.event_type,
           e.sec - LAG(e.sec) OVER (PARTITION BY e.event_type
                                    ORDER BY e.sec, e.event_id) AS tau,
           LEAD(e.sec) OVER (PARTITION BY e.event_type
                             ORDER BY e.sec, e.event_id) AS nxt_sec,
           e.sec,
           LAG(e.sec) OVER (PARTITION BY e.event_type
                            ORDER BY e.sec, e.event_id) AS prv_sec
    FROM ev e
),
pairs AS (
    SELECT event_type,
           sec - prv_sec AS tau_i,
           nxt_sec - sec AS tau_j
    FROM ordered
    WHERE prv_sec IS NOT NULL AND nxt_sec IS NOT NULL
),
taus AS (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(tau) AS BIGINT) AS s,
           CAST(SUM(tau * tau) AS BIGINT) AS s2
    FROM (SELECT event_type, sec - prv_sec AS tau FROM ordered
          WHERE prv_sec IS NOT NULL)
    GROUP BY event_type
),
mstat AS (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS m,
           CAST(SUM(tau_i) AS BIGINT) AS sx,
           CAST(SUM(tau_j) AS BIGINT) AS sy,
           CAST(SUM(tau_i * tau_i) AS BIGINT) AS sxx,
           CAST(SUM(tau_j * tau_j) AS BIGINT) AS syy,
           CAST(SUM(tau_i * tau_j) AS BIGINT) AS sxy
    FROM pairs GROUP BY event_type
)
SELECT t.event_type, t.n,
       ROUND(CAST(t.s AS DOUBLE) / t.n, 4) AS mean_gap_sec,
       ROUND((SQRT((t.n * CAST(t.s2 AS DOUBLE) - CAST(t.s AS DOUBLE) * t.s)
                   / (CAST(t.n AS DOUBLE) * t.n))
              - CAST(t.s AS DOUBLE) / t.n)
             / (SQRT((t.n * CAST(t.s2 AS DOUBLE) - CAST(t.s AS DOUBLE) * t.s)
                     / (CAST(t.n AS DOUBLE) * t.n))
                + CAST(t.s AS DOUBLE) / t.n), 4) AS burstiness,
       ROUND((m.m * CAST(m.sxy AS DOUBLE) - CAST(m.sx AS DOUBLE) * m.sy)
             / (SQRT(m.m * CAST(m.sxx AS DOUBLE)
                     - CAST(m.sx AS DOUBLE) * m.sx)
                * SQRT(m.m * CAST(m.syy AS DOUBLE)
                       - CAST(m.sy AS DOUBLE) * m.sy)), 4) AS memory_coef
FROM taus t JOIN mstat m ON m.event_type = t.event_type
ORDER BY t.event_type
""",
    tags=("timeseries", "W2", "A12"),
)
def q381_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival burstiness B and memory M per event type:
    (event_type, n, mean_gap_sec, burstiness, memory_coef)."""
    from ..operators.windows import sharded_gaps

    events = load_table(spark, sf_dir, "events")
    ev = events.select(
        "event_type",
        "event_id",
        F.unix_timestamp("ts").alias("sec"),
    )
    # day-shard-and-stitch: hash-partitioned by (event_type, day), the
    # per-reducer width is one type-day — never 1/|types| of the stream
    ordered = sharded_gaps(ev, ["event_type"], sec_col="sec", id_col="event_id")
    taus = (
        ordered.filter(F.col("prv_sec").isNotNull())
        .select("event_type", (F.col("sec") - F.col("prv_sec")).alias("tau"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("tau").alias("s"),
            F.sum(F.col("tau") * F.col("tau")).alias("s2"),
        )
    )
    pairs = ordered.filter(
        F.col("prv_sec").isNotNull() & F.col("nxt_sec").isNotNull()
    ).select(
        "event_type",
        (F.col("sec") - F.col("prv_sec")).alias("tau_i"),
        (F.col("nxt_sec") - F.col("sec")).alias("tau_j"),
    )
    mstat = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("tau_i").alias("sx"),
        F.sum("tau_j").alias("sy"),
        F.sum(F.col("tau_i") * F.col("tau_i")).alias("sxx"),
        F.sum(F.col("tau_j") * F.col("tau_j")).alias("syy"),
        F.sum(F.col("tau_i") * F.col("tau_j")).alias("sxy"),
    )
    mu = F.col("s").cast("double") / F.col("n")
    sigma = F.sqrt(
        (
            F.col("n") * F.col("s2").cast("double")
            - F.col("s").cast("double") * F.col("s")
        )
        / (F.col("n").cast("double") * F.col("n"))
    )
    mcorr = (
        F.col("m").cast("double") * F.col("sxy")
        - F.col("sx").cast("double") * F.col("sy")
    ) / (
        F.sqrt(
            F.col("m") * F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx")
        )
        * F.sqrt(
            F.col("m") * F.col("syy").cast("double")
            - F.col("sy").cast("double") * F.col("sy")
        )
    )
    return (
        taus.join(mstat, "event_type")
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.round(mu, 4).alias("mean_gap_sec"),
            F.round((sigma - mu) / (sigma + mu), 4).alias("burstiness"),
            F.round(mcorr, 4).alias("memory_coef"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# q386 - survey raking (iterative proportional fitting): weight an
# md5-half-sample of documents so its (source, lang) cell estimates hit
# the FULL corpus margins - 3 IPF rounds, each scaling weights to the
# source margins then the lang margins. The calibration tool behind
# every "reweight the sample to the population" ask (q216's DSIR is the
# importance-sampling cousin; this is the classic two-margin version).
# Parity: cell counts and targets are exact integers; weights live as
# micro-ints, rescaled once per margin pass with a single double ratio
# and refrozen (round(w * T/cur)) - both engines walk identical weight
# vectors; fit errors are exact integer differences of frozen masses.
# Scale: the sample is a hash predicate (no shuffle); cells are a
# (source, lang) aggregate (~100 rows); every IPF round is two keyed
# scalings of that bounded relation with 1-row broadcast margins.
# --------------------------------------------------------------------------
_IPF_ROUNDS = 3


def _ipf_ctes() -> str:
    parts = []
    prev = "cells0"
    for i in range(1, _IPF_ROUNDS + 1):
        parts.append(f"""rmar{i} AS (
    SELECT source, CAST(SUM(n * w) AS BIGINT) AS cur
    FROM {prev} GROUP BY source
),
rstep{i} AS (
    SELECT c.source, c.lang, c.n,
           CAST(ROUND(CAST(c.w AS DOUBLE) * ts.t / rm.cur)
                AS BIGINT) AS w
    FROM {prev} c
    JOIN rmar{i} rm ON rm.source = c.source
    JOIN tsrc ts ON ts.source = c.source
),
cmar{i} AS (
    SELECT lang, CAST(SUM(n * w) AS BIGINT) AS cur
    FROM rstep{i} GROUP BY lang
),
cells{i} AS (
    SELECT c.source, c.lang, c.n,
           CAST(ROUND(CAST(c.w AS DOUBLE) * tl.t / cm.cur)
                AS BIGINT) AS w
    FROM rstep{i} c
    JOIN cmar{i} cm ON cm.lang = c.lang
    JOIN tlang tl ON tl.lang = c.lang
)""")
        prev = f"cells{i}"
    return ",\n".join(parts)


@register(
    "q386_ipf_raking",
    oracle=f"""
WITH sample AS (
    SELECT source, lang FROM documents
    WHERE ('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
          % 2 = 0
),
cells0 AS (
    SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(1000000 AS BIGINT) AS w
    FROM sample GROUP BY source, lang
),
tsrc AS (
    SELECT source, CAST(COUNT(*) * 1000000 AS BIGINT) AS t
    FROM documents
    WHERE lang IN (SELECT DISTINCT lang FROM sample)
      AND source IN (SELECT DISTINCT source FROM sample)
    GROUP BY source
),
tlang AS (
    SELECT lang, CAST(COUNT(*) * 1000000 AS BIGINT) AS t
    FROM documents
    WHERE lang IN (SELECT DISTINCT lang FROM sample)
      AND source IN (SELECT DISTINCT source FROM sample)
    GROUP BY lang
),
{_ipf_ctes()}
SELECT c.source, c.lang, c.n AS n_sample,
       ROUND(c.w / 1000000.0, 4) AS weight,
       ROUND(c.n * c.w / 1000000.0, 4) AS est_mass
FROM cells{_IPF_ROUNDS} c
ORDER BY source, lang
""",
    tags=("inferential", "training-prep", "A13"),
)
def q386_ipf_raking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPF/raking weights calibrating an md5-half-sample to full-corpus
    (source, lang) margins: (source, lang, n_sample, weight,
    est_mass)."""
    docs = load_table(spark, sf_dir, "documents")
    half = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 2
        == 0
    )
    sample = docs.filter(half).select("source", "lang")
    cells = sample.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n")
    ).withColumn("w", F.lit(1000000).cast("long"))
    from ..caching import persist_tracked

    s_src = sample.select("source").distinct()
    s_lang = sample.select("lang").distinct()
    pop = docs.join(F.broadcast(s_src), "source").join(
        F.broadcast(s_lang), "lang"
    )
    tsrc = pop.groupBy("source").agg(
        (F.count(F.lit(1)) * 1000000).cast("long").alias("t_s")
    )
    tlang = pop.groupBy("lang").agg(
        (F.count(F.lit(1)) * 1000000).cast("long").alias("t_l")
    )
    cur = cells
    for _ in range(_IPF_ROUNDS):
        rmar = cur.groupBy("source").agg(
            F.sum(F.col("n") * F.col("w")).cast("long").alias("cur_s")
        )
        cur = (
            cur.join(F.broadcast(rmar), "source")
            .join(F.broadcast(tsrc), "source")
            .select(
                "source",
                "lang",
                "n",
                F.round(
                    F.col("w").cast("double")
                    * F.col("t_s")
                    / F.col("cur_s")
                )
                .cast("long")
                .alias("w"),
            )
        )
        cmar = cur.groupBy("lang").agg(
            F.sum(F.col("n") * F.col("w")).cast("long").alias("cur_l")
        )
        cur = (
            cur.join(F.broadcast(cmar), "lang")
            .join(F.broadcast(tlang), "lang")
            .select(
                "source",
                "lang",
                "n",
                F.round(
                    F.col("w").cast("double")
                    * F.col("t_l")
                    / F.col("cur_l")
                )
                .cast("long")
                .alias("w"),
            )
        )
    return cur.select(
        "source",
        "lang",
        F.col("n").cast("long").alias("n_sample"),
        F.round(F.col("w") / 1000000.0, 4).alias("weight"),
        F.round(F.col("n") * F.col("w") / 1000000.0, 4).alias("est_mass"),
    ).orderBy("source", "lang")


# --------------------------------------------------------------------------
# q387 - extreme-value tail estimate (peaks-over-threshold): take the
# inter-event gaps of the whole event stream, set the threshold at the
# exact p90 gap, fit a generalized Pareto to the exceedances by method
# of moments (xi = (1 - mean^2/var)/2, beta = mean*(1 - xi)... the
# standard MoM pair), and report the implied p99.9 gap - the
# "how long can the pipeline stall" tail read that empirical quantiles
# can't extrapolate past the sample. Return level:
# q_p = u + beta/xi * ((n/n_u * (1-p))^(-xi) - 1).
# Parity: gaps are exact integer seconds under the (sec, event_id)
# total order; u is an exact integer-multiple-of-0.5 percentile;
# exceedance mean/var come from exact integer sums; xi/beta/q_p are one
# fixed double expression. 4dp.
# Scale: gaps via the day-shard-and-stitch kernel (hash-partitioned by
# day-shard; stitch window sees only the |days|-row summary), one
# filter + one reduce over exceedances.
# --------------------------------------------------------------------------
@register(
    "q387_tail_gpd",
    oracle="""
WITH ev AS (
    SELECT event_id,
           CAST(FLOOR(EPOCH(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec
    FROM events
),
gaps AS (
    SELECT sec - LAG(sec) OVER (ORDER BY sec, event_id) AS tau
    FROM ev QUALIFY tau IS NOT NULL
),
thr AS (SELECT QUANTILE_CONT(CAST(tau AS DOUBLE), 0.9) AS u,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM gaps),
exc AS (
    SELECT g.tau - t.u AS y, t.u, t.n
    FROM gaps g CROSS JOIN thr t
    WHERE g.tau > t.u
),
s AS (
    SELECT MAX(u) AS u, MAX(n) AS n, CAST(COUNT(*) AS BIGINT) AS nu,
           SUM(y) AS sy, SUM(y * y) AS syy
    FROM exc
),
fit AS (
    SELECT u, n, nu,
           sy / nu AS mu,
           (nu * syy - sy * sy) / (CAST(nu AS DOUBLE) * (nu - 1)) AS v
    FROM s
)
SELECT ROUND(u, 4) AS threshold, nu AS n_exceed,
       ROUND(mu, 4) AS mean_excess,
       ROUND(0.5 * (1.0 - mu * mu / v), 4) AS xi,
       ROUND(mu * (1.0 - 0.5 * (1.0 - mu * mu / v)), 4) AS beta,
       ROUND(u + (mu * (1.0 - 0.5 * (1.0 - mu * mu / v)))
                 / (0.5 * (1.0 - mu * mu / v))
                 * (POW(CAST(n AS DOUBLE) / nu * 0.001,
                        -(0.5 * (1.0 - mu * mu / v))) - 1.0), 4)
           AS p999_gap_sec
FROM fit
""",
    tags=("timeseries", "capacity", "A12"),
)
def q387_tail_gpd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPD peaks-over-threshold tail fit of inter-event gaps:
    (threshold, n_exceed, mean_excess, xi, beta, p999_gap_sec)."""
    events = load_table(spark, sf_dir, "events")
    from ..operators.windows import sharded_gaps

    ev = events.select(
        "event_id", F.unix_timestamp("ts").alias("sec")
    )
    # day-shard-and-stitch (operators/windows.py sharded_gaps): the gap
    # sequence is a TOTAL order, but the big window hash-partitions by
    # day-shard; only the |days|-row per-shard summary sees a single
    # partition (the declared calendar-bounded stitch)
    gaps = (
        sharded_gaps(ev, [], sec_col="sec", id_col="event_id")
        .select((F.col("sec") - F.col("prv_sec")).alias("tau"))
        .filter(F.col("tau").isNotNull())
    )
    from ..caching import persist_tracked

    gaps = persist_tracked(gaps)
    thr = gaps.agg(
        F.expr("percentile(CAST(tau AS DOUBLE), 0.9)").alias("u"),
        F.count(F.lit(1)).alias("n"),
    )
    exc = (
        gaps.crossJoin(F.broadcast(thr))
        .filter(F.col("tau") > F.col("u"))
        .select((F.col("tau") - F.col("u")).alias("y"), "u", "n")
    )
    s = exc.agg(
        F.max("u").alias("u"),
        F.max("n").alias("n"),
        F.count(F.lit(1)).alias("nu"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    mu = F.col("sy") / F.col("nu")
    v = (F.col("nu") * F.col("syy") - F.col("sy") * F.col("sy")) / (
        F.col("nu").cast("double") * (F.col("nu") - 1)
    )
    xi = 0.5 * (F.lit(1.0) - mu * mu / v)
    beta = mu * (F.lit(1.0) - xi)
    q999 = F.col("u") + beta / xi * (
        F.pow(F.col("n").cast("double") / F.col("nu") * 0.001, -xi) - 1.0
    )
    return s.select(
        F.round("u", 4).alias("threshold"),
        F.col("nu").cast("long").alias("n_exceed"),
        F.round(mu, 4).alias("mean_excess"),
        F.round(xi, 4).alias("xi"),
        F.round(beta, 4).alias("beta"),
        F.round(q999, 4).alias("p999_gap_sec"),
    )


# --------------------------------------------------------------------------
# q388 - capture-recapture population estimate (Chapman's
# Lincoln-Petersen): two deterministic md5 "captures" of the user
# population from DIFFERENT event-type windows (capture 1 = users with
# clicks, capture 2 = users with views), estimate total users as
# (n1+1)(n2+1)/(m+1) - 1 from the overlap m, next to the true count.
# The abundance-estimation companion to q313's Chao1 (which uses
# frequency-of-frequencies; this uses two lists) - the technique behind
# "how many total entities exist given two incomplete extractions".
# Parity: all counts exact; the estimator and its Seber variance are
# single double expressions. 4dp.
# Scale: two distinct aggregates + one semi-join overlap count; 1-row
# output.
# --------------------------------------------------------------------------
@register(
    "q388_capture_recapture",
    oracle="""
WITH c1 AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
c2 AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m
      FROM c1 JOIN c2 ON c2.user_id = c1.user_id),
s AS (
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM c1) AS n1,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM c2) AS n2,
           (SELECT m FROM m) AS m,
           (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events)
               AS truth
)
SELECT n1, n2, m, truth,
       ROUND((CAST(n1 + 1 AS DOUBLE)) * (n2 + 1) / (m + 1) - 1.0, 4)
           AS chapman_est,
       ROUND(SQRT((CAST(n1 + 1 AS DOUBLE)) * (n2 + 1) * (n1 - m) * (n2 - m)
                  / ((CAST(m + 1 AS DOUBLE)) * (m + 1) * (m + 2))), 4)
           AS se,
       ROUND(((CAST(n1 + 1 AS DOUBLE)) * (n2 + 1) / (m + 1) - 1.0 - truth)
             / truth, 4) AS rel_err
FROM s
""",
    tags=("inferential", "A10", "P4"),
)
def q388_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chapman capture-recapture estimate of the user population from
    the click and view capture lists:
    (n1, n2, m, truth, chapman_est, se, rel_err)."""
    events = load_table(spark, sf_dir, "events")
    c1 = (
        events.filter(F.col("event_type") == "click")
        .select("user_id")
        .distinct()
    )
    c2 = (
        events.filter(F.col("event_type") == "view")
        .select("user_id")
        .distinct()
    )
    s = (
        c1.agg(F.count(F.lit(1)).alias("n1"))
        .crossJoin(c2.agg(F.count(F.lit(1)).alias("n2")))
        .crossJoin(
            c1.join(c2, "user_id").agg(F.count(F.lit(1)).alias("m"))
        )
        .crossJoin(
            events.agg(F.countDistinct("user_id").alias("truth"))
        )
    )
    est = (F.col("n1") + 1).cast("double") * (F.col("n2") + 1) / (
        F.col("m") + 1
    ) - 1.0
    se = F.sqrt(
        (F.col("n1") + 1).cast("double")
        * (F.col("n2") + 1)
        * (F.col("n1") - F.col("m"))
        * (F.col("n2") - F.col("m"))
        / (
            (F.col("m") + 1).cast("double")
            * (F.col("m") + 1)
            * (F.col("m") + 2)
        )
    )
    return s.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.col("m").cast("long").alias("m"),
        F.col("truth").cast("long").alias("truth"),
        F.round(est, 4).alias("chapman_est"),
        F.round(se, 4).alias("se"),
        F.round((est - F.col("truth")) / F.col("truth"), 4).alias(
            "rel_err"
        ),
    )


# --------------------------------------------------------------------------
# q390 - sample-ratio-mismatch (SRM) guard: assign users to two arms by
# the md5 split that a real experiment would use, then chi-square the
# observed arm counts against the designed 50/50 - overall AND per
# signup-week cohort (a per-cohort SRM with a clean overall is the
# classic symptom of a broken assignment cache). The pre-readout gate
# that q175's A/B analysis assumes has already passed.
# Parity: assignment is the shared md5 convention; counts exact;
# chi-square for 2 cells reduces to (n0 - n1)^2 / n - one double; the
# flag compares a frozen round(1e4*chi2) against the 3.841 critical
# value. 4dp.
# Scale: one user-keyed min aggregate (cohort) + one (cohort, arm)
# count; the overall row is a 2-value reduce.
# --------------------------------------------------------------------------
@register(
    "q390_srm_guard",
    oracle="""
WITH users AS (
    SELECT user_id,
           MIN(CAST(FLOOR(EPOCH(CAST(ts AS TIMESTAMP)) / 604800) AS BIGINT))
               AS cw
    FROM events GROUP BY user_id
),
assigned AS (
    SELECT cw,
           CAST(('0x' || SUBSTR(MD5(CAST(user_id AS VARCHAR)), 1, 8))
                ::UBIGINT AS BIGINT) % 2 AS arm
    FROM users
),
base AS (SELECT MIN(cw) AS cw0 FROM users),
cells AS (
    SELECT a.cw - b.cw0 AS cohort, a.arm, CAST(COUNT(*) AS BIGINT) AS n
    FROM assigned a CROSS JOIN base b
    GROUP BY a.cw - b.cw0, a.arm
),
per_cohort AS (
    SELECT cohort,
           CAST(SUM(CASE WHEN arm = 0 THEN n ELSE 0 END) AS BIGINT) AS n0,
           CAST(SUM(CASE WHEN arm = 1 THEN n ELSE 0 END) AS BIGINT) AS n1
    FROM cells GROUP BY cohort
),
rows_ AS (
    SELECT CAST(cohort AS VARCHAR) AS scope, n0, n1 FROM per_cohort
    UNION ALL
    SELECT 'overall', CAST(SUM(n0) AS BIGINT), CAST(SUM(n1) AS BIGINT)
    FROM per_cohort
)
SELECT scope, n0, n1,
       ROUND(CAST((n0 - n1) * (n0 - n1) AS DOUBLE) / (n0 + n1), 4)
           AS chi2,
       CAST(CASE WHEN CAST(ROUND(10000.0 * CAST((n0 - n1) * (n0 - n1)
                                                AS DOUBLE) / (n0 + n1))
                      AS BIGINT) > 38410
                 THEN 1 ELSE 0 END AS BIGINT) AS srm_flag
FROM rows_
ORDER BY scope
""",
    tags=("inferential", "quality", "A13"),
)
def q390_srm_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square sample-ratio-mismatch check of the md5 50/50 split,
    overall and per signup-week cohort: (scope, n0, n1, chi2,
    srm_flag)."""
    events = load_table(spark, sf_dir, "events")
    week = (F.unix_timestamp("ts") / 604800).cast("long")
    users = events.groupBy("user_id").agg(F.min(week).alias("cw"))
    assigned = users.select(
        "cw",
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("long")
            % 2
        ).alias("arm"),
    )
    base = users.agg(F.min("cw").alias("cw0"))
    per_cohort = (
        assigned.crossJoin(F.broadcast(base))
        .groupBy((F.col("cw") - F.col("cw0")).alias("cohort"))
        .agg(
            F.sum((F.col("arm") == 0).cast("long")).alias("n0"),
            F.sum((F.col("arm") == 1).cast("long")).alias("n1"),
        )
    )
    overall = per_cohort.agg(
        F.lit("overall").alias("scope"),
        F.sum("n0").cast("long").alias("n0"),
        F.sum("n1").cast("long").alias("n1"),
    )
    rows = per_cohort.select(
        F.col("cohort").cast("string").alias("scope"),
        F.col("n0").cast("long").alias("n0"),
        F.col("n1").cast("long").alias("n1"),
    ).unionByName(overall)
    chi2 = ((F.col("n0") - F.col("n1")) * (F.col("n0") - F.col("n1"))).cast(
        "double"
    ) / (F.col("n0") + F.col("n1"))
    return rows.select(
        "scope",
        "n0",
        "n1",
        F.round(chi2, 4).alias("chi2"),
        (F.round(10000.0 * chi2).cast("long") > 38410)
        .cast("long")
        .alias("srm_flag"),
    ).orderBy("scope")


# --------------------------------------------------------------------------
# q391 - robust location trio per event type: the plain mean of `value`
# next to the 10%-trimmed mean (drop values outside the exact
# [p10, p90] band) and the winsorized mean (clamp to that band) - the
# side-by-side that shows how much tail mass is steering the plain mean
# (q86 winsorizes rows; this reports the ESTIMATORS).
# Parity: values are frozen to cents; the p10/p90 bounds are exact
# interpolated percentiles of integers (multiples of lcm denominators
# on both engines); trim membership and clamping compare integers
# against frozen round(1e4*bound) edges; each estimator is one double
# ratio of exact integer sums. 4dp.
# Scale: one (type) percentile aggregate broadcast back, one
# conditional-aggregate pass. No window.
# --------------------------------------------------------------------------
@register(
    "q391_robust_location",
    oracle="""
WITH v AS (
    SELECT event_type, CAST(ROUND(100.0 * value) AS BIGINT) AS c
    FROM events
),
b AS (
    SELECT event_type,
           CAST(ROUND(100.0 * QUANTILE_CONT(CAST(c AS DOUBLE), 0.1))
                AS BIGINT) AS lo4,
           CAST(ROUND(100.0 * QUANTILE_CONT(CAST(c AS DOUBLE), 0.9))
                AS BIGINT) AS hi4
    FROM v GROUP BY event_type
),
j AS (
    SELECT v.event_type, v.c, b.lo4, b.hi4,
           CASE WHEN 100 * v.c < b.lo4 THEN b.lo4
                WHEN 100 * v.c > b.hi4 THEN b.hi4
                ELSE 100 * v.c END AS w4,
           CASE WHEN 100 * v.c >= b.lo4 AND 100 * v.c <= b.hi4
                THEN 1 ELSE 0 END AS inband
    FROM v JOIN b ON b.event_type = v.event_type
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(c) AS DOUBLE) / 100.0 / COUNT(*), 4) AS mean,
       ROUND(CAST(SUM(CASE WHEN inband = 1 THEN c ELSE 0 END) AS DOUBLE)
             / 100.0 / SUM(inband), 4) AS trimmed_mean,
       ROUND(CAST(SUM(w4) AS DOUBLE) / 10000.0 / COUNT(*), 4)
           AS winsorized_mean,
       CAST(COUNT(*) - SUM(inband) AS BIGINT) AS n_clamped
FROM j GROUP BY event_type ORDER BY event_type
""",
    tags=("robust-stats", "A12", "P10"),
)
def q391_robust_location(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean vs 10%-trimmed vs winsorized mean of event values per type:
    (event_type, n, mean, trimmed_mean, winsorized_mean, n_clamped)."""
    events = load_table(spark, sf_dir, "events")
    v = events.select(
        "event_type",
        F.round(100.0 * F.col("value")).cast("long").alias("c"),
    )
    b = v.groupBy("event_type").agg(
        F.round(100.0 * F.expr("percentile(CAST(c AS DOUBLE), 0.1)"))
        .cast("long")
        .alias("lo4"),
        F.round(100.0 * F.expr("percentile(CAST(c AS DOUBLE), 0.9)"))
        .cast("long")
        .alias("hi4"),
    )
    j = v.join(F.broadcast(b), "event_type").select(
        "event_type",
        "c",
        F.when(100 * F.col("c") < F.col("lo4"), F.col("lo4"))
        .when(100 * F.col("c") > F.col("hi4"), F.col("hi4"))
        .otherwise(100 * F.col("c"))
        .alias("w4"),
        (
            (100 * F.col("c") >= F.col("lo4"))
            & (100 * F.col("c") <= F.col("hi4"))
        )
        .cast("long")
        .alias("inband"),
    )
    return (
        j.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum("c").cast("double") / 100.0 / F.count(F.lit(1)), 4
            ).alias("mean"),
            F.round(
                F.sum(
                    F.when(F.col("inband") == 1, F.col("c")).otherwise(0)
                ).cast("double")
                / 100.0
                / F.sum("inband"),
                4,
            ).alias("trimmed_mean"),
            F.round(
                F.sum("w4").cast("double") / 10000.0 / F.count(F.lit(1)),
                4,
            ).alias("winsorized_mean"),
            (F.count(F.lit(1)) - F.sum("inband"))
            .cast("long")
            .alias("n_clamped"),
        )
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            "mean",
            "trimmed_mean",
            "winsorized_mean",
            "n_clamped",
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# q392 - Page-Hinkley drift detector over the daily event-count series:
# the sequential change-of-mean test ops teams run where q205's CUSUM
# needs a known baseline - PH tracks x_t against the RUNNING mean of its
# own history (no training window), alarms when the cumulative positive
# deviation since the best (minimum) point exceeds lambda. Reported per
# day: the running mean, the PH statistic, and the alarm flag.
# Parity: daily counts are exact integers; the running mean S_t/t is
# frozen per day to micro-units (round(1e6*S/t)) so the deviation
# cumsum is an exact integer walk on both engines; the running min and
# the lambda comparison happen on those integers. 4dp.
# Scale: corpus collapses FIRST to the calendar-bounded daily relation;
# all windows run on ~tens of rows (declared bounded exception,
# lint-allowlisted).
# --------------------------------------------------------------------------
_PH_LAMBDA_MICRO = 25 * 1000000  # lambda = 25 events of cumulative drift


@register(
    "q392_page_hinkley",
    oracle=f"""
WITH daily AS (
    SELECT CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS x
    FROM events GROUP BY 1
),
ranked AS (
    SELECT day, x,
           CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t,
           CAST(SUM(x) OVER (ORDER BY day) AS BIGINT) AS s
    FROM daily
),
dev AS (
    SELECT day, t, x,
           CAST(ROUND(1000000.0 * s / t) AS BIGINT) AS mean_micro,
           x * 1000000 - CAST(ROUND(1000000.0 * s / t) AS BIGINT)
               AS dev_micro
    FROM ranked
),
cum AS (
    SELECT day, t, x, mean_micro,
           CAST(SUM(dev_micro) OVER (ORDER BY t) AS BIGINT) AS m_t
    FROM dev
),
walk AS (
    SELECT day, t, x, mean_micro, m_t,
           CAST(MIN(m_t) OVER (ORDER BY t) AS BIGINT) AS m_min
    FROM cum
)
SELECT t, CAST(day AS VARCHAR) AS day, x,
       ROUND(mean_micro / 1000000.0, 4) AS running_mean,
       ROUND((m_t - m_min) / 1000000.0, 4) AS ph_stat,
       CAST(CASE WHEN m_t - m_min > {_PH_LAMBDA_MICRO} THEN 1 ELSE 0 END
            AS BIGINT) AS alarm
FROM walk ORDER BY t
""",
    tags=("timeseries", "drift", "W2"),
)
def q392_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley mean-shift walk over daily counts:
    (t, day, x, running_mean, ph_stat, alarm)."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("x"))
    w = Window.orderBy("day")
    ranked = daily.select(
        "day",
        "x",
        F.row_number().over(w).cast("long").alias("t"),
        F.sum("x").over(w).cast("long").alias("s"),
    )
    dev = ranked.select(
        "day",
        "t",
        "x",
        F.round(1000000.0 * F.col("s") / F.col("t"))
        .cast("long")
        .alias("mean_micro"),
    ).withColumn(
        "dev_micro", F.col("x") * 1000000 - F.col("mean_micro")
    )
    wt = Window.orderBy("t")
    walk = dev.select(
        "day",
        "t",
        "x",
        "mean_micro",
        F.sum("dev_micro").over(wt).cast("long").alias("m_t"),
    ).withColumn("m_min", F.min("m_t").over(wt).cast("long"))
    return walk.select(
        "t",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "x",
        F.round(F.col("mean_micro") / 1000000.0, 4).alias("running_mean"),
        F.round((F.col("m_t") - F.col("m_min")) / 1000000.0, 4).alias(
            "ph_stat"
        ),
        (F.col("m_t") - F.col("m_min") > _PH_LAMBDA_MICRO)
        .cast("long")
        .alias("alarm"),
    ).orderBy("t")


# --------------------------------------------------------------------------
# q393 - Brown's double exponential smoothing (linear-trend forecast)
# of the daily event-count series: SES applied twice (alpha = 0.5),
# level a = 2s' - s'', trend b = (alpha/(1-alpha))(s' - s'') = s' - s'',
# one-step forecast = a + b = 3s' - 2s''. The trend-aware upgrade of
# q341's SES (which lags any drifting series by design).
# Parity: the q341 freezing discipline applied twice - the first-pass
# smoothed values are frozen to micro-ints (round(1e6*x*w) summed over
# the closed-form SES weights), the second pass smooths THOSE integers
# (round(w*s1)), so both engines walk identical integer vectors; the
# final /100-then-/1e4 rounding lands half-way cases on exactly
# representable values.
# Scale: corpus collapses to the daily relation; both smoothing passes
# are pair joins quadratic in DAYS (30^2 rows), constant in corpus size.
# --------------------------------------------------------------------------
@register(
    "q393_brown_double_smoothing",
    oracle="""
WITH daily AS (
    SELECT CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS x
    FROM events GROUP BY 1
),
ranked AS (
    SELECT day, x, CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t
    FROM daily
),
s1 AS (
    SELECT a.t AS m,
           CAST(SUM(CAST(ROUND(1000000.0 * b.x *
                CASE WHEN b.t = 1 THEN POW(0.5, a.t - 1)
                     ELSE POW(0.5, a.t - b.t + 1) END) AS BIGINT))
                AS BIGINT) AS s1_int
    FROM ranked a JOIN ranked b ON b.t <= a.t
    GROUP BY a.t
),
s2 AS (
    SELECT a.m AS m,
           CAST(SUM(CAST(ROUND(b.s1_int *
                CASE WHEN b.m = 1 THEN POW(0.5, a.m - 1)
                     ELSE POW(0.5, a.m - b.m + 1) END) AS BIGINT))
                AS BIGINT) AS s2_int
    FROM s1 a JOIN s1 b ON b.m <= a.m
    GROUP BY a.m
)
SELECT r.t, CAST(r.day AS VARCHAR) AS day, r.x,
       CAST(ROUND((2 * s1.s1_int - s2.s2_int) / 100.0) AS BIGINT) / 10000.0
           AS level,
       CAST(ROUND((s1.s1_int - s2.s2_int) / 100.0) AS BIGINT) / 10000.0
           AS trend,
       CAST(ROUND((3 * s1.s1_int - 2 * s2.s2_int) / 100.0) AS BIGINT)
           / 10000.0 AS forecast,
       CAST(ROUND((r.x * 1000000 - (3 * prev1.s1_int - 2 * prev2.s2_int))
                  / 100.0) AS BIGINT) / 10000.0 AS err
FROM ranked r
JOIN s1 ON s1.m = r.t
JOIN s2 ON s2.m = r.t
JOIN s1 prev1 ON prev1.m = r.t - 1
JOIN s2 prev2 ON prev2.m = r.t - 1
ORDER BY r.t
""",
    tags=("timeseries", "forecast", "A12"),
)
def q393_brown_double_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown's linear (double) exponential smoothing of daily counts:
    (t, day, x, level, trend, forecast, err) - forecast is one-step-ahead
    (from t-1), so err rows need t >= 2."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("x"))
    ranked = daily.select(
        "day",
        "x",
        F.row_number().over(Window.orderBy("day")).cast("long").alias("t"),
    )

    def _ses_weight(m, j):
        return F.when(j == 1, F.pow(F.lit(0.5), m - 1)).otherwise(
            F.pow(F.lit(0.5), m - j + 1)
        )

    a = ranked.select(F.col("t").alias("m"))
    b = ranked.select(F.col("t").alias("j"), F.col("x").alias("xj"))
    s1 = (
        a.join(b, F.col("j") <= F.col("m"))
        .groupBy("m")
        .agg(
            F.sum(
                F.round(
                    1000000.0
                    * F.col("xj")
                    * _ses_weight(F.col("m"), F.col("j"))
                ).cast("long")
            ).alias("s1_int")
        )
    )
    a2 = s1.select(F.col("m").alias("m2"))
    b2 = s1.select(F.col("m").alias("j2"), F.col("s1_int").alias("s1j"))
    s2 = (
        a2.join(b2, F.col("j2") <= F.col("m2"))
        .groupBy("m2")
        .agg(
            F.sum(
                F.round(
                    F.col("s1j") * _ses_weight(F.col("m2"), F.col("j2"))
                ).cast("long")
            ).alias("s2_int")
        )
    )
    cur = ranked.join(s1, F.col("m") == F.col("t")).join(
        s2, F.col("m2") == F.col("t")
    )
    prev = (
        s1.select(F.col("m").alias("pm"), F.col("s1_int").alias("p1"))
        .join(
            s2.select(F.col("m2").alias("pm2"), F.col("s2_int").alias("p2")),
            F.col("pm") == F.col("pm2"),
        )
        .select("pm", "p1", "p2")
    )

    def _q4(col):
        # /100 then /1e4: half-way cases land on exactly representable
        # values (the q341 rounding discipline)
        return F.round(col / 100.0).cast("long") / 10000.0

    return (
        cur.join(prev, F.col("pm") == F.col("t") - 1)
        .select(
            "t",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "x",
            _q4(2 * F.col("s1_int") - F.col("s2_int")).alias("level"),
            _q4(F.col("s1_int") - F.col("s2_int")).alias("trend"),
            _q4(3 * F.col("s1_int") - 2 * F.col("s2_int")).alias("forecast"),
            _q4(
                F.col("x") * 1000000 - (3 * F.col("p1") - 2 * F.col("p2"))
            ).alias("err"),
        )
        .orderBy("t")
    )


# --------------------------------------------------------------------------
# q400 - A/B conversion comparison with P(B > A) under the normal
# approximation: per user-parity arm, the share of "high spenders"
# (users whose total purchase value exceeds the global median per-user
# purchase spend - a median split so the rate is non-degenerate at
# every SF), the relative lift, the two-proportion z, and P(B beats A)
# = Phi(z) evaluated with the Abramowitz-Stegun 7.1.26 polynomial - the
# closed-form stand-in for the Beta-posterior Monte Carlo readout
# dashboards report (q175 tests significance; q264 runs the sequential
# boundary; this answers "what's the probability B is better TODAY").
# Parity: per-user spends are frozen to cents; the median is an exact
# interpolated percentile of integers; counts are exact integers;
# p/z/Phi are ONE double expression tree written identically on both
# engines (A-S constants as literals, EXP/SQRT the only libm calls)
# under the final 4dp round.
# Scale: one user-keyed aggregate, one 1-row percentile broadcast, one
# arm aggregate; 1-row output.
# --------------------------------------------------------------------------
_AS_T = "1.0 / (1.0 + 0.2316419 * ABS(z))"
_AS_PHI = (
    "1.0 - EXP(-z * z / 2.0) / SQRT(2.0 * PI()) * "
    "(t * (0.319381530 + t * (-0.356563782 + t * (1.781477937 + "
    "t * (-1.821255978 + 1.330274429 * t)))))"
)


@register(
    "q400_bayes_ab",
    oracle=f"""
WITH spend AS (
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'purchase'
                         THEN CAST(ROUND(100.0 * value) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS cents
    FROM events GROUP BY user_id
),
med AS (
    SELECT QUANTILE_CONT(CAST(cents AS DOUBLE), 0.5) AS med FROM spend
),
arms AS (
    SELECT s.user_id % 2 AS arm,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN s.cents > m.med THEN 1 ELSE 0 END)
                AS BIGINT) AS conv
    FROM spend s CROSS JOIN med m GROUP BY 1
),
w AS (
    SELECT MAX(CASE WHEN arm = 0 THEN n END) AS na,
           MAX(CASE WHEN arm = 0 THEN conv END) AS ca,
           MAX(CASE WHEN arm = 1 THEN n END) AS nb,
           MAX(CASE WHEN arm = 1 THEN conv END) AS cb
    FROM arms
),
zc AS (
    SELECT na, ca, nb, cb,
           (CAST(cb AS DOUBLE) / nb - CAST(ca AS DOUBLE) / na)
           / SQRT((CAST(ca AS DOUBLE) / na) * (1.0 - CAST(ca AS DOUBLE) / na)
                      / na
                  + (CAST(cb AS DOUBLE) / nb)
                      * (1.0 - CAST(cb AS DOUBLE) / nb) / nb) AS z
    FROM w
),
tc AS (SELECT *, {_AS_T} AS t FROM zc)
SELECT na AS n_a, ca AS conv_a, nb AS n_b, cb AS conv_b,
       ROUND((CAST(cb AS DOUBLE) / nb - CAST(ca AS DOUBLE) / na)
             / (CAST(ca AS DOUBLE) / na), 4) AS rel_lift,
       ROUND(z, 4) AS z,
       ROUND(CASE WHEN z >= 0 THEN {_AS_PHI}
                  ELSE 1.0 - ({_AS_PHI.replace('-z * z', '-z * z')}) END,
             4) AS prob_b_beats_a
FROM tc
""",
    tags=("inferential", "abtest", "A10"),
)
def q400_bayes_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion conversion readout with P(B>A):
    (n_a, conv_a, n_b, conv_b, rel_lift, z, prob_b_beats_a)."""
    events = load_table(spark, sf_dir, "events")
    spend = events.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(100.0 * F.col("value")).cast("long"),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("cents")
    )
    med = spend.agg(
        F.expr("percentile(CAST(cents AS DOUBLE), 0.5)").alias("med")
    )
    arms = (
        spend.crossJoin(F.broadcast(med))
        .groupBy((F.col("user_id") % 2).alias("arm"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum((F.col("cents") > F.col("med")).cast("long"))
            .cast("long")
            .alias("conv"),
        )
    )
    w = arms.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("na"),
        F.max(F.when(F.col("arm") == 0, F.col("conv"))).alias("ca"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("nb"),
        F.max(F.when(F.col("arm") == 1, F.col("conv"))).alias("cb"),
    )
    pa = F.col("ca").cast("double") / F.col("na")
    pb = F.col("cb").cast("double") / F.col("nb")
    zc = w.withColumn(
        "z",
        (pb - pa)
        / F.sqrt(
            pa * (F.lit(1.0) - pa) / F.col("na")
            + pb * (F.lit(1.0) - pb) / F.col("nb")
        ),
    )
    tc = zc.withColumn("t", F.expr(_AS_T))
    phi = F.expr(_AS_PHI)
    return tc.select(
        F.col("na").alias("n_a"),
        F.col("ca").alias("conv_a"),
        F.col("nb").alias("n_b"),
        F.col("cb").alias("conv_b"),
        F.round((pb - pa) / pa, 4).alias("rel_lift"),
        F.round("z", 4).alias("z"),
        F.round(
            F.when(F.col("z") >= 0, phi).otherwise(F.lit(1.0) - phi), 4
        ).alias("prob_b_beats_a"),
    )
