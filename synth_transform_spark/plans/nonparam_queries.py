"""Round-8 second wave: rank-based and categorical nonparametric tests,
omnibus normality, stratified-odds homogeneity, and iterative outlier
screening.

Fills the remaining holes in the classical nonparametric battery around
the existing q305 (KS) / q314 (rank-sum) / q315 (Kruskal-Wallis) / q368
(Friedman) / q446 (signed-rank) family: Ansari-Bradley (scale
alternative), Jonckheere-Terpstra (ordered alternative), Wald-Wolfowitz
runs (randomness), Mood's median (k-sample location), Cochran's Q
(k related binaries), D'Agostino's K^2 (omnibus normality — the moment
transforms Jarque-Bera q338 approximates), Breslow-Day (homogeneity of
the odds ratios q328's Mantel-Haenszel pools), and a 3-round
generalized-ESD outlier screen (the iterative version of q14/q91).

Parity discipline: all rank statistics run in the FREQUENCY DOMAIN
(collapse to the distinct-value relation, exact integer block ranks and
closed-form block score sums); moment tests center on a frozen integer
pseudo-mean so the power sums stay exact in DECIMAL(38,0)/HUGEINT at any
SF; every per-domain-row double term is frozen to an integer grid before
the final sum. 4dp.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..sources.readers import load_table
from .registry import register

_DEC = "decimal(38,0)"


def _tri(engine: str, x: str) -> str:
    """Exact triangular number T(x) = x*(x+1)/2 in wide integers.

    Parity-split halving — (x DIV 2)*(x+1) when x is even, else
    x*((x+1) DIV 2) — so the division is exact BEFORE the wide product
    (round-8 advice: double-divide-then-cast broke exactness past 2^53,
    and a BIGINT product wraps/errs past x ~ 3e9). The half factor fits
    BIGINT (x <= N <= 1e12); the product runs in HUGEINT/DECIMAL(38,0).
    """
    w, dv = ("HUGEINT", "//") if engine == "duck" else (_DEC, "DIV")
    return (
        f"(CASE WHEN {x} % 2 = 0 THEN CAST({x} {dv} 2 AS {w}) * ({x} + 1) "
        f"ELSE CAST({x} AS {w}) * (({x} + 1) {dv} 2) END)"
    )


def _ab_t(engine: str, x: str) -> str:
    """Ansari-Bradley cumulative score sum T(x) = sum_{r<=x} min(r, N+1-r)
    in wide integers; ``h``/``n`` are the half-point and total columns in
    scope. Above the half-point, T(x) = 2*T(h) + (x-h)*(N+1) - TRI(x)
    (algebraically identical to the round-8 form, restructured so every
    product is wide and every halving exact)."""
    w = "HUGEINT" if engine == "duck" else _DEC
    return (
        f"(CASE WHEN {x} <= h THEN {_tri(engine, x)} "
        f"ELSE 2 * {_tri(engine, 'h')} + CAST({x} - h AS {w}) * (n + 1) "
        f"- {_tri(engine, x)} END)"
    )


#: Epoch-day weekend flag ((d + 3) % 7 >= 5), the q450 convention.
_DUCK_WEEKEND = "(CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 86400 + 3) % 7 >= 5"
_SPARK_WEEKEND = (
    "(CAST(FLOOR(CAST(ts AS DOUBLE)) AS BIGINT) DIV 86400 + 3) % 7 >= 5"
)


# --------------------------------------------------------------------------
# q471 - Ansari-Bradley scale test, weekend vs weekday purchase values:
# ranks assigned from BOTH ends (score(r) = min(r, N+1-r), ties get the
# block-average score), small scores at the extremes — so a group with
# larger dispersion collects smaller scores. The SCALE counterpart of
# q314's location rank-sum: together they read "same center, different
# spread" drifts that either test alone misses.
# Parity: the score sum over a tied block [lo, hi] has the closed form
# T(hi) - T(lo-1) with T(x) = sum_{r<=x} min(r, N+1-r) — exact integer
# arithmetic on the collapsed value domain (parity-split halving, wide
# HUGEINT/DECIMAL(38,0) products — see _tri/_ab_t); group score sums and
# the squared-score sum (for the tie-exact variance) are frozen to
# round(1e8 * term) and ACCUMULATED IN HUGEINT/DECIMAL(38,0) (round-8
# advice: the BIGINT sum wrapped at ~1e6 purchase rows — the lowest
# threshold in the ledger; promoted, entry retained as documentation).
# z is one double expression. 4dp.
# Scale: one (group, cents) aggregate; cumulative window on the bounded
# distinct-cents domain (q283's class).
# --------------------------------------------------------------------------
@register(
    "q471_ansari_bradley",
    oracle=f"""
WITH base AS (
    SELECT CAST(ROUND(100.0 * value) AS BIGINT) AS v,
           CASE WHEN {_DUCK_WEEKEND} THEN 1 ELSE 0 END AS t
    FROM events WHERE event_type = 'purchase'
),
g AS (
    SELECT v, CAST(SUM(t) AS BIGINT) AS c1,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM base GROUP BY v
),
nn AS (
    SELECT CAST(SUM(c1) AS BIGINT) AS n1,
           CAST(SUM(c - c1) AS BIGINT) AS n2,
           CAST(SUM(c) AS BIGINT) AS n,
           CAST((SUM(c) + 1) // 2 AS BIGINT) AS h
    FROM g
),
cum AS (
    SELECT v, c1, c,
           CAST(SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS hi,
           CAST(COALESCE(SUM(c) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS lo1
    FROM g
),
blocks AS (
    SELECT c1, c,
           {_ab_t("duck", "hi")} - {_ab_t("duck", "lo1")} AS bs
    FROM cum CROSS JOIN nn
),
terms AS (
    SELECT CAST(SUM(CAST(ROUND(100000000.0 * c1 * bs / c) AS HUGEINT))
                AS HUGEINT) AS a8,
           CAST(SUM(bs) AS HUGEINT) AS sa,
           CAST(SUM(CAST(ROUND(100000000.0 * bs / c * bs) AS HUGEINT))
                AS HUGEINT) AS q8
    FROM blocks
)
SELECT nn.n1 AS n_weekend, nn.n2 AS n_weekday,
       ROUND(t.a8 / 100000000.0, 4) AS ab_stat,
       ROUND((t.a8 / 100000000.0 - CAST(nn.n1 AS DOUBLE) * t.sa / nn.n)
             / SQRT(CAST(nn.n1 AS DOUBLE) * nn.n2
                    * (nn.n * (t.q8 / 100000000.0)
                       - CAST(t.sa AS DOUBLE) * t.sa)
                    / (CAST(nn.n AS DOUBLE) * nn.n * (nn.n - 1))), 4) AS z
FROM terms t CROSS JOIN nn
""",
    tags=("ab-test", "A12", "W2", "robust"),
)
def q471_ansari_bradley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ansari-Bradley scale test, weekend vs weekday purchase values:
    (n_weekend, n_weekday, ab_stat, z)."""
    events = load_table(spark, sf_dir, "events")
    base = events.filter(F.col("event_type") == "purchase").select(
        F.round(100.0 * F.col("value")).cast("long").alias("v"),
        F.expr(_SPARK_WEEKEND).cast("long").alias("t"),
    )
    g = base.groupBy("v").agg(
        F.sum("t").alias("c1"), F.count(F.lit(1)).alias("c")
    )
    nn = g.agg(
        F.sum("c1").alias("n1"),
        F.sum(F.col("c") - F.col("c1")).alias("n2"),
        F.sum("c").alias("n"),
        F.expr("(SUM(c) + 1) DIV 2").alias("h"),
    )
    w = Window.orderBy("v")
    cum = g.select(
        "c1",
        "c",
        F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "hi"
        ),
        F.coalesce(
            F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("lo1"),
    )
    # Same wide-integer T(x) text as the oracle (DECIMAL(38,0) vs
    # HUGEINT) — exact at any SF, not just below 2^53 (round-8 advice).
    blocks = cum.crossJoin(F.broadcast(nn)).select(
        "c1",
        "c",
        (F.expr(_ab_t("spark", "hi")) - F.expr(_ab_t("spark", "lo1"))).alias(
            "bs"
        ),
    )
    terms = blocks.agg(
        F.sum(
            F.round(1e8 * F.col("c1") * F.col("bs") / F.col("c")).cast(_DEC)
        ).alias("a8"),
        F.sum("bs").alias("sa"),
        F.sum(
            F.round(1e8 * F.col("bs") / F.col("c") * F.col("bs")).cast(_DEC)
        ).alias("q8"),
    )
    out = terms.crossJoin(F.broadcast(nn))
    a = F.col("a8") / 1e8
    ea = F.col("n1").cast("double") * F.col("sa") / F.col("n")
    var = (
        F.col("n1").cast("double")
        * F.col("n2")
        * (
            F.col("n") * (F.col("q8") / 1e8)
            - F.col("sa").cast("double") * F.col("sa")
        )
        / (F.col("n").cast("double") * F.col("n") * (F.col("n") - 1))
    )
    return out.select(
        F.col("n1").alias("n_weekend"),
        F.col("n2").alias("n_weekday"),
        F.round(a, 4).alias("ab_stat"),
        F.round((a - ea) / F.sqrt(var), 4).alias("z"),
    )


# --------------------------------------------------------------------------
# q472 - Jonckheere-Terpstra ordered-alternative test: does order
# totalprice shift MONOTONICALLY across the ordered priority classes
# (1-URGENT < ... < 5-LOW)? JT = sum over ordered group pairs i<j of the
# Mann-Whitney count U_ij, computed tie-aware in the frequency domain:
# 2*U_ij = sum_v [2*c_j(v)*cumlt_i(v) + c_j(v)*c_i(v)]. The trend
# counterpart of q315's Kruskal-Wallis (which ignores the ordering) and
# q327's two-group trend test.
# Parity: 2*JT is an exact integer (DECIMAL(38,0)/HUGEINT — pair
# products pass 2^62 once a group exceeds ~2e9 rows at one value);
# mean/variance use the standard no-tie normal approximation (documented)
# as one double expression. 4dp.
# Scale: one (priority, cents) aggregate; per-group cumulative windows
# on the bounded distinct-cents domain; a 1-row reduce.
# --------------------------------------------------------------------------
def _jt_pair_terms(engine: str) -> str:
    # groups indexed 1..5 in priority order; c{i} per-value counts,
    # k{i} strictly-below cumulatives
    pairs = [(i, j) for i in range(1, 6) for j in range(i + 1, 6)]
    if engine == "duck":
        return " + ".join(
            f"2 * CAST(c{j} AS HUGEINT) * k{i} + CAST(c{j} AS HUGEINT) * c{i}"
            for i, j in pairs
        )
    return " + ".join(
        f"2 * CAST(c{j} AS {_DEC}) * k{i} + CAST(c{j} AS {_DEC}) * c{i}"
        for i, j in pairs
    )


_PRIOS = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")


@register(
    "q472_jonckheere_terpstra",
    oracle=f"""
WITH base AS (
    SELECT CAST(ROUND(100.0 * o_totalprice) AS BIGINT) AS v,
           o_orderpriority AS p
    FROM orders
),
g AS (
    SELECT v,
           {", ".join(f"CAST(COUNT(*) FILTER (WHERE p = '{p}') AS BIGINT) AS c{i}" for i, p in enumerate(_PRIOS, 1))}
    FROM base GROUP BY v
),
cum AS (
    SELECT v, {", ".join(f"c{i}" for i in range(1, 6))},
           {", ".join(f"CAST(COALESCE(SUM(c{i}) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS k{i}" for i in range(1, 6))}
    FROM g
),
jt AS (
    SELECT CAST(SUM({_jt_pair_terms("duck")}) AS HUGEINT) AS jt2
    FROM cum
),
sizes AS (
    SELECT {", ".join(f"CAST(SUM(c{i}) AS BIGINT) AS n{i}" for i in range(1, 6))},
           CAST({" + ".join(f"SUM(c{i})" for i in range(1, 6))} AS BIGINT) AS n
    FROM g
)
SELECT s.n,
       CAST(j.jt2 AS VARCHAR) AS jt2,
       ROUND((CAST(j.jt2 AS DOUBLE) / 2.0
              - (CAST(s.n AS DOUBLE) * s.n
                 - ({" + ".join(f"CAST(s.n{i} AS DOUBLE) * s.n{i}" for i in range(1, 6))})) / 4.0)
             / SQRT((CAST(s.n AS DOUBLE) * s.n * (2.0 * s.n + 3)
                     - ({" + ".join(f"CAST(s.n{i} AS DOUBLE) * s.n{i} * (2.0 * s.n{i} + 3)" for i in range(1, 6))}))
                    / 72.0), 4) AS z
FROM jt j CROSS JOIN sizes s
""",
    tags=("A12", "W2", "trend"),
)
def q472_jonckheere_terpstra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheere-Terpstra trend of order totalprice across ordered
    priorities: (n, jt2, z)."""
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        F.round(100.0 * F.col("o_totalprice")).cast("long").alias("v"),
        F.col("o_orderpriority").alias("p"),
    )
    g = base.groupBy("v").agg(
        *[
            F.count(F.when(F.col("p") == p, 1)).alias(f"c{i}")
            for i, p in enumerate(_PRIOS, 1)
        ]
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cum = g.select(
        "v",
        *[F.col(f"c{i}") for i in range(1, 6)],
        *[
            F.coalesce(F.sum(f"c{i}").over(w), F.lit(0)).alias(f"k{i}")
            for i in range(1, 6)
        ],
    )
    jt = cum.agg(F.sum(F.expr(_jt_pair_terms("spark"))).alias("jt2"))
    sizes = g.agg(
        *[F.sum(f"c{i}").alias(f"n{i}") for i in range(1, 6)],
        sum(
            (F.sum(f"c{i}") for i in range(2, 6)), F.sum("c1")
        ).alias("n"),
    )
    out = jt.crossJoin(F.broadcast(sizes))
    nD = F.col("n").cast("double")
    sum_n2 = None
    sum_nv = None
    for i in range(1, 6):
        ni = F.col(f"n{i}").cast("double")
        t2 = ni * F.col(f"n{i}")
        tv = ni * F.col(f"n{i}") * (2.0 * F.col(f"n{i}") + 3)
        sum_n2 = t2 if sum_n2 is None else sum_n2 + t2
        sum_nv = tv if sum_nv is None else sum_nv + tv
    mean = (nD * F.col("n") - sum_n2) / 4.0
    var = (nD * F.col("n") * (2.0 * F.col("n") + 3) - sum_nv) / 72.0
    return out.select(
        "n",
        # exact wide output (round-9 advice): the accumulator has been
        # HUGEINT/DECIMAL(38,0) since round 8, but the OUTPUT cast was still
        # BIGINT — past ~4.3e9 orders 2*JT ~ N^2/2 wraps int64 (ANSI Spark
        # errors, DuckDB errors, non-ANSI Spark nulls: divergence, not
        # parity). Both engines now emit the exact integer as a decimal
        # string, the only pandas-roundtrip-exact encoding at this width
        # (DuckDB .df() collapses HUGEINT/DECIMAL(38) to float64).
        F.col("jt2").cast("decimal(38,0)").cast("string").alias("jt2"),
        F.round(
            (F.col("jt2").cast("double") / 2.0 - mean) / F.sqrt(var), 4
        ).alias("z"),
    )


# --------------------------------------------------------------------------
# q473 - Wald-Wolfowitz runs test on the daily event-count series:
# dichotomise each day as above/below the interpolated median, count
# runs, and read the randomness z — too few runs = trending/clustered
# days, too many = oscillation. The model-free randomness gate next to
# q339's parametric Ljung-Box.
# Parity: the median is the same linear-interpolation quantile on both
# engines; run boundaries come from an ordered lag on the daily
# relation; counts are exact integers and z one double expression. 4dp.
# Scale: one corpus aggregate to the calendar-bounded daily relation.
# --------------------------------------------------------------------------
@register(
    "q473_runs_test",
    oracle="""
WITH daily AS (
    SELECT CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS x
    FROM events GROUP BY 1
),
med AS (SELECT MEDIAN(x) AS m FROM daily),
lab AS (
    SELECT day, CASE WHEN x > med.m THEN 1 ELSE 0 END AS b
    FROM daily CROSS JOIN med
),
runs AS (
    SELECT b, LAG(b) OVER (ORDER BY day) AS pb FROM lab
),
agg AS (
    SELECT CAST(SUM(b) AS BIGINT) AS n1,
           CAST(SUM(1 - b) AS BIGINT) AS n2,
           CAST(1 + SUM(CASE WHEN pb IS NOT NULL AND b <> pb
                        THEN 1 ELSE 0 END) AS BIGINT) AS r
    FROM runs
)
SELECT n1 AS n_above, n2 AS n_below, r AS runs,
       ROUND((r - (2.0 * n1 * n2 / (n1 + n2) + 1))
             / SQRT(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                    / ((CAST(n1 + n2 AS DOUBLE)) * (n1 + n2)
                       * (n1 + n2 - 1))), 4) AS z
FROM agg
""",
    tags=("timeseries", "A12", "W2"),
)
def q473_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test of daily counts about their median:
    (n_above, n_below, runs, z)."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("x"))
    med = daily.agg(F.expr("percentile(x, 0.5)").alias("m"))
    lab = daily.crossJoin(F.broadcast(med)).select(
        "day", (F.col("x") > F.col("m")).cast("long").alias("b")
    )
    runs = lab.select(
        "b", F.lag("b").over(Window.orderBy("day")).alias("pb")
    )
    agg = runs.agg(
        F.sum("b").alias("n1"),
        F.sum(1 - F.col("b")).alias("n2"),
        (
            1
            + F.sum(
                F.when(
                    F.col("pb").isNotNull() & (F.col("b") != F.col("pb")), 1
                ).otherwise(0)
            )
        ).alias("r"),
    )
    n1, n2, r = (
        F.col("n1").cast("double"),
        F.col("n2").cast("double"),
        F.col("r").cast("double"),
    )
    mu = 2.0 * n1 * n2 / (n1 + n2) + 1
    var = (
        2.0
        * n1
        * n2
        * (2.0 * n1 * n2 - n1 - n2)
        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1))
    )
    return agg.select(
        F.col("n1").alias("n_above"),
        F.col("n2").alias("n_below"),
        F.col("r").alias("runs"),
        F.round((r - mu) / F.sqrt(var), 4).alias("z"),
    )


# --------------------------------------------------------------------------
# q474 - D'Agostino's K^2 omnibus normality test on purchase cents:
# exact skewness/kurtosis transforms Z1 (D'Agostino 1970) and Z2
# (Anscombe-Glynn 1983), K^2 = Z1^2 + Z2^2 ~ chi2(2). The finite-sample-
# calibrated omnibus test whose large-n limit is q338's Jarque-Bera.
# Parity: power sums about a FROZEN integer pseudo-mean mu0 = round(S/n)
# (so sum e^4 <= 1e20/row stays inside DECIMAL(38)/HUGEINT at any SF —
# the n-scaled centering of q348 would overflow 4th moments); central
# moments are recovered with the exact binomial shift (delta = mean-mu0,
# |delta| <= 0.5), and Z1/Z2 are THE SAME generated arithmetic string
# run by both engines (q349's shared-expression discipline). K^2 squares
# the 4dp-FROZEN z's: Java and C libm POW/LN differ in the last ulp and
# squaring ~25-sigma z's amplifies that past the 4dp grid. 4dp.
# Scale: two map-side-combined corpus aggregates (mean, then shifted
# power sums with the 1-row mu0 broadcast). No windows.
# --------------------------------------------------------------------------
def _k2_exprs() -> tuple[str, str]:
    """(z1, z2) expressions over columns n, m2, m3, m4 (doubles)."""
    g1 = "(m3 / POW(m2, 1.5))"
    y = f"({g1} * SQRT((n + 1.0) * (n + 3.0) / (6.0 * (n - 2.0))))"
    b2 = (
        "(3.0 * (n * n + 27.0 * n - 70.0) * (n + 1.0) * (n + 3.0)"
        " / ((n - 2.0) * (n + 5.0) * (n + 7.0) * (n + 9.0)))"
    )
    w2 = f"(SQRT(2.0 * ({b2} - 1.0)) - 1.0)"
    delta = f"(1.0 / SQRT(LN(SQRT({w2}))))"
    alpha = f"(SQRT(2.0 / ({w2} - 1.0)))"
    z1 = (
        f"({delta} * LN({y} / {alpha}"
        f" + SQRT(({y} / {alpha}) * ({y} / {alpha}) + 1.0)))"
    )
    g2 = "(m4 / (m2 * m2))"
    eg = "(3.0 * (n - 1.0) / (n + 1.0))"
    vg = (
        "(24.0 * n * (n - 2.0) * (n - 3.0)"
        " / ((n + 1.0) * (n + 1.0) * (n + 3.0) * (n + 5.0)))"
    )
    x = f"(({g2} - {eg}) / SQRT({vg}))"
    b1 = (
        "(6.0 * (n * n - 5.0 * n + 2.0) / ((n + 7.0) * (n + 9.0))"
        " * SQRT(6.0 * (n + 3.0) * (n + 5.0)"
        " / (n * (n - 2.0) * (n - 3.0))))"
    )
    a = (
        f"(6.0 + 8.0 / {b1} * (2.0 / {b1}"
        f" + SQRT(1.0 + 4.0 / ({b1} * {b1}))))"
    )
    z2 = (
        f"(((1.0 - 2.0 / (9.0 * {a}))"
        f" - POW((1.0 - 2.0 / {a}) / (1.0 + {x} * SQRT(2.0 / ({a} - 4.0))),"
        f" 1.0 / 3.0)) / SQRT(2.0 / (9.0 * {a})))"
    )
    return z1, z2


_K2_Z1, _K2_Z2 = _k2_exprs()


@register(
    "q474_dagostino_k2",
    oracle=f"""
WITH base AS (
    SELECT CAST(ROUND(100.0 * value) AS BIGINT) AS x
    FROM events WHERE event_type = 'purchase'
),
m0 AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n0,
           CAST(ROUND(CAST(SUM(x) AS DOUBLE) / COUNT(*)) AS BIGINT) AS mu0
    FROM base
),
pows AS (
    SELECT m0.n0 AS nn, m0.mu0,
           CAST(SUM(CAST(x - m0.mu0 AS HUGEINT)) AS HUGEINT) AS s1,
           CAST(SUM(CAST(x - m0.mu0 AS HUGEINT) * (x - m0.mu0)) AS HUGEINT)
               AS s2,
           CAST(SUM(CAST(x - m0.mu0 AS HUGEINT) * (x - m0.mu0)
                    * (x - m0.mu0)) AS HUGEINT) AS s3,
           CAST(SUM(CAST(x - m0.mu0 AS HUGEINT) * (x - m0.mu0)
                    * (x - m0.mu0) * (x - m0.mu0)) AS HUGEINT) AS s4
    FROM base CROSS JOIN m0
    GROUP BY m0.n0, m0.mu0
),
cm AS (
    SELECT CAST(nn AS DOUBLE) AS n,
           CAST(s1 AS DOUBLE) / nn AS d1,
           CAST(s2 AS DOUBLE) / nn AS p2,
           CAST(s3 AS DOUBLE) / nn AS p3,
           CAST(s4 AS DOUBLE) / nn AS p4
    FROM pows
),
mom AS (
    SELECT n,
           p2 - d1 * d1 AS m2,
           p3 - 3.0 * d1 * p2 + 2.0 * d1 * d1 * d1 AS m3,
           p4 - 4.0 * d1 * p3 + 6.0 * d1 * d1 * p2
              - 3.0 * d1 * d1 * d1 * d1 AS m4
    FROM cm
)
SELECT CAST(n AS BIGINT) AS n,
       ROUND(m3 / POW(m2, 1.5), 4) AS skew_g1,
       ROUND(m4 / (m2 * m2), 4) AS kurt_g2,
       ROUND({_K2_Z1}, 4) AS z_skew,
       ROUND({_K2_Z2}, 4) AS z_kurt,
       ROUND(ROUND({_K2_Z1}, 4) * ROUND({_K2_Z1}, 4) + ROUND({_K2_Z2}, 4) * ROUND({_K2_Z2}, 4), 4) AS k2
FROM mom
""",
    tags=("A12", "quality"),
)
def q474_dagostino_k2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D'Agostino's K^2 omnibus normality of purchase cents:
    (n, skew_g1, kurt_g2, z_skew, z_kurt, k2)."""
    events = load_table(spark, sf_dir, "events")
    base = events.filter(F.col("event_type") == "purchase").select(
        F.round(100.0 * F.col("value")).cast("long").alias("x")
    )
    m0 = base.agg(
        F.count(F.lit(1)).alias("n0"),
        F.round(F.sum("x").cast("double") / F.count(F.lit(1)))
        .cast("long")
        .alias("mu0"),
    )
    e = (F.col("x") - F.col("mu0")).cast(_DEC)
    pows = (
        base.crossJoin(F.broadcast(m0))
        .groupBy("n0", "mu0")
        .agg(
            F.sum(e).alias("s1"),
            F.sum(e * (F.col("x") - F.col("mu0"))).alias("s2"),
            F.sum(
                e * (F.col("x") - F.col("mu0")) * (F.col("x") - F.col("mu0"))
            ).alias("s3"),
            F.sum(
                e
                * (F.col("x") - F.col("mu0"))
                * (F.col("x") - F.col("mu0"))
                * (F.col("x") - F.col("mu0"))
            ).alias("s4"),
        )
    )
    cm = pows.select(
        F.col("n0").cast("double").alias("n"),
        (F.col("s1").cast("double") / F.col("n0")).alias("d1"),
        (F.col("s2").cast("double") / F.col("n0")).alias("p2"),
        (F.col("s3").cast("double") / F.col("n0")).alias("p3"),
        (F.col("s4").cast("double") / F.col("n0")).alias("p4"),
    )
    d1 = F.col("d1")
    mom = cm.select(
        "n",
        (F.col("p2") - d1 * d1).alias("m2"),
        (F.col("p3") - 3.0 * d1 * F.col("p2") + 2.0 * d1 * d1 * d1).alias(
            "m3"
        ),
        (
            F.col("p4")
            - 4.0 * d1 * F.col("p3")
            + 6.0 * d1 * d1 * F.col("p2")
            - 3.0 * d1 * d1 * d1 * d1
        ).alias("m4"),
    )
    return mom.selectExpr(
        "CAST(n AS BIGINT) AS n",
        "ROUND(m3 / POW(m2, 1.5), 4) AS skew_g1",
        "ROUND(m4 / (m2 * m2), 4) AS kurt_g2",
        f"ROUND({_K2_Z1}, 4) AS z_skew",
        f"ROUND({_K2_Z2}, 4) AS z_kurt",
        f"ROUND(ROUND({_K2_Z1}, 4) * ROUND({_K2_Z1}, 4) + ROUND({_K2_Z2}, 4) * ROUND({_K2_Z2}, 4), 4) AS k2",
    )


# --------------------------------------------------------------------------
# q475 - Breslow-Day homogeneity of odds ratios across ship-year strata:
# exposure = deep discount (l_discount >= 0.06), outcome = returned
# line, strata = YEAR(l_shipdate). Computes the Mantel-Haenszel common
# OR and then BD = sum_k (a_k - a~_k)^2 / Var(a~_k), where a~_k is the
# expected exposed-returned cell under the common OR (the valid root of
# the OR quadratic). The diagnostic that says whether q328's
# Mantel-Haenszel pooling is even licensed — a large BD means the
# strata have genuinely different odds ratios and one pooled OR lies.
# Parity: all cells are exact integers; per-stratum MH terms and BD
# terms are identical double expressions frozen to round(1e6/1e8 *
# term) so the (year-bounded) sums are exact; the quadratic root is one
# fixed expression (linear fallback when |OR-1| < 1e-12). 4dp.
# Scale: one (year, exposed, returned) corpus aggregate to a <=
# |years|x4 relation; everything downstream is grid arithmetic.
# --------------------------------------------------------------------------
_BD_ROOT = (
    "(CASE WHEN ABS(orr - 1.0) < 1e-12 THEN r1 * c1 / CAST(nn AS DOUBLE) "
    "ELSE (orr * (r1 + c1) + (nn - r1 - c1) "
    "- SQRT((orr * (r1 + c1) + (nn - r1 - c1))"
    " * (orr * (r1 + c1) + (nn - r1 - c1)) "
    "- 4.0 * (orr - 1.0) * orr * r1 * c1)) / (2.0 * (orr - 1.0)) END)"
)


@register(
    "q475_breslow_day",
    oracle=f"""
WITH cells AS (
    SELECT CAST(YEAR(l_shipdate) AS BIGINT) AS yr,
           CAST(COUNT(*) FILTER (WHERE l_discount >= 0.06
                AND l_returnflag = 'R') AS BIGINT) AS a,
           CAST(COUNT(*) FILTER (WHERE l_discount >= 0.06
                AND l_returnflag <> 'R') AS BIGINT) AS b,
           CAST(COUNT(*) FILTER (WHERE l_discount < 0.06
                AND l_returnflag = 'R') AS BIGINT) AS c,
           CAST(COUNT(*) FILTER (WHERE l_discount < 0.06
                AND l_returnflag <> 'R') AS BIGINT) AS d
    FROM lineitem GROUP BY 1
),
mh AS (
    SELECT CAST(SUM(CAST(ROUND(1000000.0 * a * d / (a + b + c + d))
                    AS BIGINT)) AS BIGINT) AS num6,
           CAST(SUM(CAST(ROUND(1000000.0 * b * c / (a + b + c + d))
                    AS BIGINT)) AS BIGINT) AS den6,
           CAST(COUNT(*) AS BIGINT) AS k
    FROM cells
),
fit AS (
    SELECT c.yr, c.a,
           CAST(c.a + c.b AS DOUBLE) AS r1,
           CAST(c.a + c.c AS DOUBLE) AS c1,
           c.a + c.b + c.c + c.d AS nn,
           CAST(m.num6 AS DOUBLE) / m.den6 AS orr,
           m.k
    FROM cells c CROSS JOIN mh m
),
terms AS (
    SELECT k,
           CAST(ROUND(100000000.0 * (a - {_BD_ROOT}) * (a - {_BD_ROOT})
                * (1.0 / {_BD_ROOT} + 1.0 / (r1 - {_BD_ROOT})
                   + 1.0 / (c1 - {_BD_ROOT})
                   + 1.0 / (nn - r1 - c1 + {_BD_ROOT}))) AS BIGINT) AS t8
    FROM fit
)
SELECT MAX(k) AS k_strata,
       ROUND((SELECT CAST(num6 AS DOUBLE) / den6 FROM mh), 4) AS or_mh,
       ROUND(CAST(SUM(t8) AS DOUBLE) / 100000000.0, 4) AS bd_stat
FROM terms
""",
    tags=("A12", "ab-test", "causal"),
)
def q475_breslow_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breslow-Day homogeneity of discount->return odds ratios across
    ship years: (k_strata, or_mh, bd_stat)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    exp_ = F.col("l_discount") >= 0.06
    ret = F.col("l_returnflag") == "R"
    cells = lineitem.groupBy(
        F.year("l_shipdate").cast("long").alias("yr")
    ).agg(
        F.count(F.when(exp_ & ret, 1)).alias("a"),
        F.count(F.when(exp_ & ~ret, 1)).alias("b"),
        F.count(F.when(~exp_ & ret, 1)).alias("c"),
        F.count(F.when(~exp_ & ~ret, 1)).alias("d"),
    )
    n_all = F.col("a") + F.col("b") + F.col("c") + F.col("d")
    mh = cells.agg(
        F.sum(
            F.round(1e6 * F.col("a") * F.col("d") / n_all).cast("long")
        ).alias("num6"),
        F.sum(
            F.round(1e6 * F.col("b") * F.col("c") / n_all).cast("long")
        ).alias("den6"),
        F.count(F.lit(1)).alias("k"),
    )
    fit = cells.crossJoin(F.broadcast(mh)).select(
        "a",
        (F.col("a") + F.col("b")).cast("double").alias("r1"),
        (F.col("a") + F.col("c")).cast("double").alias("c1"),
        n_all.alias("nn"),
        (F.col("num6").cast("double") / F.col("den6")).alias("orr"),
        "k",
        "num6",
        "den6",
    )
    terms = fit.selectExpr(
        "k",
        "num6",
        "den6",
        f"CAST(ROUND(100000000.0 * (a - {_BD_ROOT}) * (a - {_BD_ROOT})"
        f" * (1.0 / {_BD_ROOT} + 1.0 / (r1 - {_BD_ROOT})"
        f" + 1.0 / (c1 - {_BD_ROOT})"
        f" + 1.0 / (nn - r1 - c1 + {_BD_ROOT}))) AS BIGINT) AS t8",
    )
    return terms.groupBy("num6", "den6").agg(
        F.max("k").alias("k_strata"),
        F.sum("t8").alias("s8"),
    ).select(
        "k_strata",
        F.round(F.col("num6").cast("double") / F.col("den6"), 4).alias(
            "or_mh"
        ),
        F.round(F.col("s8").cast("double") / 1e8, 4).alias("bd_stat"),
    )


# --------------------------------------------------------------------------
# q479 - generalized-ESD outlier screen (3 rounds) on purchase cents:
# each round computes the max studentised deviation R_i = max|x - mean|/s
# on the CURRENT set, reports the offending observation, removes it
# (closed-form moment downdate — n, S, Q minus the removed value), and
# repeats. The iterative screen q14's one-shot z-score can't do: a big
# outlier inflates s and masks the next one; ESD unmasks round by round.
# The 3 rounds are a FIXED unrolled lazy plan — no driver loop, no
# collect; each round is one corpus aggregate + one TakeOrdered(1) +
# one broadcast anti-join.
# Parity: moments are exact (DECIMAL(38,0)/HUGEINT squares); the argmax
# tie-break is (|dev| DESC, x DESC, event_id ASC) on identical doubles;
# R_i is one double expression. 4dp.
# Scale: 3 corpus passes; the removed set is 3 broadcast rows.
# --------------------------------------------------------------------------
@register(
    "q479_grubbs_esd",
    oracle="""
WITH base AS (
    SELECT event_id, CAST(ROUND(100.0 * value) AS BIGINT) AS x
    FROM events WHERE event_type = 'purchase'
),
s1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS HUGEINT) AS s,
              CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS q FROM base),
c1 AS (
    SELECT b.event_id, b.x,
           ABS(b.x - CAST(s.s AS DOUBLE) / s.n)
           / SQRT((CAST(s.q AS DOUBLE) - CAST(s.s AS DOUBLE) * s.s / s.n)
                  / (s.n - 1)) AS r
    FROM base b CROSS JOIN s1 s
    ORDER BY r DESC, b.x DESC, b.event_id ASC LIMIT 1
),
b2 AS (SELECT * FROM base WHERE event_id NOT IN (SELECT event_id FROM c1)),
s2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS HUGEINT) AS s,
              CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS q FROM b2),
c2 AS (
    SELECT b.event_id, b.x,
           ABS(b.x - CAST(s.s AS DOUBLE) / s.n)
           / SQRT((CAST(s.q AS DOUBLE) - CAST(s.s AS DOUBLE) * s.s / s.n)
                  / (s.n - 1)) AS r
    FROM b2 b CROSS JOIN s2 s
    ORDER BY r DESC, b.x DESC, b.event_id ASC LIMIT 1
),
b3 AS (SELECT * FROM b2 WHERE event_id NOT IN (SELECT event_id FROM c2)),
s3 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS HUGEINT) AS s,
              CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS q FROM b3),
c3 AS (
    SELECT b.event_id, b.x,
           ABS(b.x - CAST(s.s AS DOUBLE) / s.n)
           / SQRT((CAST(s.q AS DOUBLE) - CAST(s.s AS DOUBLE) * s.s / s.n)
                  / (s.n - 1)) AS r
    FROM b3 b CROSS JOIN s3 s
    ORDER BY r DESC, b.x DESC, b.event_id ASC LIMIT 1
)
SELECT CAST(1 AS BIGINT) AS round, event_id, x AS x_cents,
       ROUND(r, 4) AS r_stat FROM c1
UNION ALL
SELECT CAST(2 AS BIGINT), event_id, x, ROUND(r, 4) FROM c2
UNION ALL
SELECT CAST(3 AS BIGINT), event_id, x, ROUND(r, 4) FROM c3
ORDER BY round
""",
    tags=("A12", "quality", "O3"),
)
def q479_grubbs_esd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-round generalized-ESD outlier screen on purchase cents:
    (round, event_id, x_cents, r_stat)."""
    events = load_table(spark, sf_dir, "events")
    base = events.filter(F.col("event_type") == "purchase").select(
        "event_id", F.round(100.0 * F.col("value")).cast("long").alias("x")
    )
    out = None
    cur = base
    for i in range(1, 4):
        stats = cur.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").cast(_DEC).alias("s"),
            F.sum(F.col("x").cast(_DEC) * F.col("x")).alias("q"),
        )
        mean = F.col("s").cast("double") / F.col("n")
        sd = F.sqrt(
            (
                F.col("q").cast("double")
                - F.col("s").cast("double") * F.col("s") / F.col("n")
            )
            / (F.col("n") - 1)
        )
        cand = (
            cur.crossJoin(F.broadcast(stats))
            .select(
                "event_id",
                "x",
                (F.abs(F.col("x") - mean) / sd).alias("r"),
            )
            .orderBy(
                F.col("r").desc(), F.col("x").desc(), F.col("event_id").asc()
            )
            .limit(1)
        )
        row = cand.select(
            F.lit(i).cast("long").alias("round"),
            "event_id",
            F.col("x").alias("x_cents"),
            F.round("r", 4).alias("r_stat"),
        )
        out = row if out is None else out.unionByName(row)
        cur = cur.join(
            F.broadcast(cand.select("event_id")), "event_id", "left_anti"
        )
    return out.orderBy("round")


# --------------------------------------------------------------------------
# q481 - Mood's median test across the five event types: dichotomise
# every value at the pooled interpolated median (computed in the
# FREQUENCY DOMAIN — rank clamps on the distinct-cents relation, never a
# corpus sort) and chi-square the k x 2 above/below table. The k-sample
# location test with minimal assumptions — the coarse cousin of q315's
# Kruskal-Wallis, robust to any monotone transform.
# Parity: the median is (v_lo + v_hi)/2 at ranks floor/ceil((N+1)/2)
# from exact cumulative counts; cells are exact integers; per-cell
# chi-square terms frozen to round(1e8 * term). 4dp.
# Scale: one (type, cents) aggregate; the median lookup and the k x 2
# table live on the bounded value domain.
# --------------------------------------------------------------------------
@register(
    "q481_mood_median",
    oracle="""
WITH base AS (
    SELECT event_type AS t, CAST(ROUND(100.0 * value) AS BIGINT) AS v
    FROM events
),
g AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM base GROUP BY v),
nn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM g),
cum AS (
    SELECT v, c,
           CAST(SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS upto,
           CAST(COALESCE(SUM(c) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS below
    FROM g
),
med AS (
    SELECT (MAX(CASE WHEN below < (n + 1) // 2 AND (n + 1) // 2 <= upto
                     THEN v END)
            + MAX(CASE WHEN below < (n + 2) // 2 AND (n + 2) // 2 <= upto
                       THEN v END)) / 2.0 AS m
    FROM cum CROSS JOIN nn
),
cells AS (
    SELECT b.t,
           CAST(COUNT(*) FILTER (WHERE b.v > med.m) AS BIGINT) AS above,
           CAST(COUNT(*) FILTER (WHERE b.v <= med.m) AS BIGINT) AS beloweq
    FROM base b CROSS JOIN med GROUP BY b.t
),
tots AS (
    SELECT CAST(SUM(above) AS BIGINT) AS ta,
           CAST(SUM(beloweq) AS BIGINT) AS tb,
           CAST(SUM(above + beloweq) AS BIGINT) AS n
    FROM cells
),
scored AS (
    SELECT c.t, c.above, c.beloweq,
           ROUND(CAST(c.above + c.beloweq AS DOUBLE) * t.ta / t.n, 4)
               AS e_above,
           CAST(ROUND(100000000.0 *
                ((c.above - CAST(c.above + c.beloweq AS DOUBLE)
                  * t.ta / t.n)
                 * (c.above - CAST(c.above + c.beloweq AS DOUBLE)
                    * t.ta / t.n)
                 / (CAST(c.above + c.beloweq AS DOUBLE) * t.ta / t.n)
                 + (c.beloweq - CAST(c.above + c.beloweq AS DOUBLE)
                    * t.tb / t.n)
                   * (c.beloweq - CAST(c.above + c.beloweq AS DOUBLE)
                      * t.tb / t.n)
                   / (CAST(c.above + c.beloweq AS DOUBLE) * t.tb / t.n)))
                AS BIGINT) AS chi8
    FROM cells c CROSS JOIN tots t
),
tot_chi AS (SELECT CAST(SUM(chi8) AS BIGINT) AS s8 FROM scored)
SELECT s.t AS event_type, s.above, s.beloweq, s.e_above,
       ROUND(s.chi8 / 100000000.0, 4) AS contrib,
       ROUND(tc.s8 / 100000000.0, 4) AS chi2_total
FROM scored s CROSS JOIN tot_chi tc
ORDER BY s.t
""",
    tags=("A12", "W2", "robust"),
)
def q481_mood_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test across event types: (event_type, above,
    beloweq, e_above, contrib, chi2_total)."""
    events = load_table(spark, sf_dir, "events")
    base = events.select(
        F.col("event_type").alias("t"),
        F.round(100.0 * F.col("value")).cast("long").alias("v"),
    )
    g = base.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    nn = g.agg(F.sum("c").alias("n"))
    w = Window.orderBy("v")
    cum = g.select(
        "v",
        F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "upto"
        ),
        F.coalesce(
            F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("below"),
    )
    # integral halving (DIV) — exact past 2^53, matching the oracle's //
    lo = F.expr("(n + 1) DIV 2")
    hi = F.expr("(n + 2) DIV 2")
    med = (
        cum.crossJoin(F.broadcast(nn))
        .agg(
            (
                (
                    F.max(
                        F.when(
                            (F.col("below") < lo) & (lo <= F.col("upto")),
                            F.col("v"),
                        )
                    )
                    + F.max(
                        F.when(
                            (F.col("below") < hi) & (hi <= F.col("upto")),
                            F.col("v"),
                        )
                    )
                )
                / 2.0
            ).alias("m")
        )
    )
    cells = (
        base.crossJoin(F.broadcast(med))
        .groupBy("t")
        .agg(
            F.count(F.when(F.col("v") > F.col("m"), 1)).alias("above"),
            F.count(F.when(F.col("v") <= F.col("m"), 1)).alias("beloweq"),
        )
    )
    tots = cells.agg(
        F.sum("above").alias("ta"),
        F.sum("beloweq").alias("tb"),
        F.sum(F.col("above") + F.col("beloweq")).alias("n"),
    )
    nt = (F.col("above") + F.col("beloweq")).cast("double")
    ea = nt * F.col("ta") / F.col("n")
    eb = nt * F.col("tb") / F.col("n")
    scored = cells.crossJoin(F.broadcast(tots)).select(
        "t",
        "above",
        "beloweq",
        F.round(ea, 4).alias("e_above"),
        F.round(
            1e8
            * (
                (F.col("above") - ea) * (F.col("above") - ea) / ea
                + (F.col("beloweq") - eb) * (F.col("beloweq") - eb) / eb
            )
        )
        .cast("long")
        .alias("chi8"),
    )
    tot_chi = scored.agg(F.sum("chi8").alias("s8"))
    return (
        scored.crossJoin(F.broadcast(tot_chi))
        .select(
            F.col("t").alias("event_type"),
            "above",
            "beloweq",
            "e_above",
            F.round(F.col("chi8") / 1e8, 4).alias("contrib"),
            F.round(F.col("s8") / 1e8, 4).alias("chi2_total"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# q482 - Cochran's Q over three related binary treatments per USER-DAY
# block (did the user click / purchase / hit an error that day):
# Q = (k-1) * [k*sum C_j^2 - (sum C_j)^2] / [k*sum R_i - sum R_i^2]
# ~ chi2(k-1). The k-related-binaries agreement test completing the
# family: q317 McNemar is its k=2 special case, q368 Friedman its
# ordinal generalisation. Blocks are user-days, not users: this
# generator's users are dense enough that per-user indicators are all-1
# (R_i = k for every row makes Q 0/0 — the classic degenerate case).
# Parity: column sums C_j, row sums R_i, and both quadratic forms are
# exact integers; Q is one double ratio. 4dp.
# Scale: one (user, day)-keyed conditional aggregate, one 1-row moment
# reduce.
# --------------------------------------------------------------------------
@register(
    "q482_cochran_q",
    oracle="""
WITH per_user AS (
    SELECT user_id, CAST(ts AS DATE) AS d,
           MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x1,
           MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS x2,
           MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS x3
    FROM events GROUP BY user_id, 2
),
mom AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x1) AS BIGINT) AS c1,
           CAST(SUM(x2) AS BIGINT) AS c2,
           CAST(SUM(x3) AS BIGINT) AS c3,
           CAST(SUM(x1 + x2 + x3) AS BIGINT) AS sr,
           CAST(SUM((x1 + x2 + x3) * (x1 + x2 + x3)) AS BIGINT) AS sr2
    FROM per_user
)
SELECT n, c1 AS n_click, c2 AS n_purchase, c3 AS n_error,
       ROUND(2.0 * (3.0 * (CAST(c1 AS DOUBLE) * c1
                           + CAST(c2 AS DOUBLE) * c2
                           + CAST(c3 AS DOUBLE) * c3)
                    - CAST(sr AS DOUBLE) * sr)
             / (3.0 * sr - sr2), 4) AS q_stat
FROM mom
""",
    tags=("A12", "ab-test"),
)
def q482_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q over per-user-day click/purchase/error indicators:
    (n, n_click, n_purchase, n_error, q_stat)."""
    events = load_table(spark, sf_dir, "events")
    per_user = events.groupBy(
        "user_id", F.col("ts").cast("date").alias("d")
    ).agg(
        F.max(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).alias("x1"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("x2"),
        F.max(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).alias("x3"),
    )
    rsum = F.col("x1") + F.col("x2") + F.col("x3")
    mom = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x1").alias("c1"),
        F.sum("x2").alias("c2"),
        F.sum("x3").alias("c3"),
        F.sum(rsum).alias("sr"),
        F.sum(rsum * rsum).alias("sr2"),
    )
    csq = (
        F.col("c1").cast("double") * F.col("c1")
        + F.col("c2").cast("double") * F.col("c2")
        + F.col("c3").cast("double") * F.col("c3")
    )
    return mom.select(
        "n",
        F.col("c1").alias("n_click"),
        F.col("c2").alias("n_purchase"),
        F.col("c3").alias("n_error"),
        F.round(
            2.0
            * (3.0 * csq - F.col("sr").cast("double") * F.col("sr"))
            / (3.0 * F.col("sr") - F.col("sr2")),
            4,
        ).alias("q_stat"),
    )


# --------------------------------------------------------------------------
# q484 - Lepage joint location-scale test (Lepage 1971): L = Z_W^2 +
# Z_AB^2, the standardized Wilcoxon rank-sum (location) plus the
# standardized Ansari-Bradley (scale), both tie-exact in the frequency
# domain. THE classical omnibus two-sample test when either the center
# or the spread may have moved — q314 and q471 fused into one chi2(2)
# read.
# Parity: 2*W1 (doubled mid-rank sum) is an exact integer; the AB sums
# reuse q471's closed-form block scores; everything accumulates in
# HUGEINT/DECIMAL(38,0) with exact parity-split halving (round-8 advice
# — same promotion as q471); tie corrections are exact integer sums;
# both z's and L are one double expression. 4dp.
# Scale: one (group, cents) aggregate; cumulative windows on the
# bounded distinct-cents domain (q283's class).
# --------------------------------------------------------------------------
@register(
    "q484_lepage",
    oracle=f"""
WITH base AS (
    SELECT CAST(ROUND(100.0 * value) AS BIGINT) AS v,
           CASE WHEN {_DUCK_WEEKEND} THEN 1 ELSE 0 END AS t
    FROM events WHERE event_type = 'purchase'
),
g AS (
    SELECT v, CAST(SUM(t) AS BIGINT) AS c1,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM base GROUP BY v
),
nn AS (
    SELECT CAST(SUM(c1) AS BIGINT) AS n1,
           CAST(SUM(c - c1) AS BIGINT) AS n2,
           CAST(SUM(c) AS BIGINT) AS n,
           CAST((SUM(c) + 1) // 2 AS BIGINT) AS h
    FROM g
),
cum AS (
    SELECT v, c1, c,
           CAST(SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS hi,
           CAST(COALESCE(SUM(c) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS lo1
    FROM g
),
blocks AS (
    SELECT c1, c, hi, lo1,
           {_ab_t("duck", "hi")} - {_ab_t("duck", "lo1")} AS bs
    FROM cum CROSS JOIN nn
),
terms AS (
    SELECT CAST(SUM(CAST(c1 AS HUGEINT) * (lo1 + hi + 1)) AS HUGEINT) AS w2,
           CAST(SUM(CAST(c AS HUGEINT) * c * c - c) AS HUGEINT) AS ties3,
           CAST(SUM(CAST(ROUND(100000000.0 * c1 * bs / c) AS HUGEINT))
                AS HUGEINT) AS a8,
           CAST(SUM(bs) AS HUGEINT) AS sa,
           CAST(SUM(CAST(ROUND(100000000.0 * bs / c * bs) AS HUGEINT))
                AS HUGEINT) AS q8
    FROM blocks
),
zs AS (
    SELECT nn.n1, nn.n2,
           (CAST(t.w2 AS DOUBLE) / 2.0
            - CAST(nn.n1 AS DOUBLE) * (nn.n + 1) / 2.0)
           / SQRT(CAST(nn.n1 AS DOUBLE) * nn.n2 * (nn.n + 1) / 12.0
                  - CAST(nn.n1 AS DOUBLE) * nn.n2 * CAST(t.ties3 AS DOUBLE)
                    / (12.0 * nn.n * (nn.n - 1))) AS z_w,
           (t.a8 / 100000000.0 - CAST(nn.n1 AS DOUBLE) * t.sa / nn.n)
           / SQRT(CAST(nn.n1 AS DOUBLE) * nn.n2
                  * (nn.n * (t.q8 / 100000000.0)
                     - CAST(t.sa AS DOUBLE) * t.sa)
                  / (CAST(nn.n AS DOUBLE) * nn.n * (nn.n - 1))) AS z_ab
    FROM terms t CROSS JOIN nn
)
SELECT n1 AS n_weekend, n2 AS n_weekday,
       ROUND(z_w, 4) AS z_wilcoxon,
       ROUND(z_ab, 4) AS z_ansari,
       ROUND(ROUND(z_w, 4) * ROUND(z_w, 4)
             + ROUND(z_ab, 4) * ROUND(z_ab, 4), 4) AS lepage_l
FROM zs
""",
    tags=("ab-test", "A12", "W2", "robust"),
)
def q484_lepage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lepage joint location-scale test, weekend vs weekday purchases:
    (n_weekend, n_weekday, z_wilcoxon, z_ansari, lepage_l)."""
    events = load_table(spark, sf_dir, "events")
    base = events.filter(F.col("event_type") == "purchase").select(
        F.round(100.0 * F.col("value")).cast("long").alias("v"),
        F.expr(_SPARK_WEEKEND).cast("long").alias("t"),
    )
    g = base.groupBy("v").agg(
        F.sum("t").alias("c1"), F.count(F.lit(1)).alias("c")
    )
    nn = g.agg(
        F.sum("c1").alias("n1"),
        F.sum(F.col("c") - F.col("c1")).alias("n2"),
        F.sum("c").alias("n"),
        F.expr("(SUM(c) + 1) DIV 2").alias("h"),
    )
    w = Window.orderBy("v")
    cum = g.select(
        "c1",
        "c",
        F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "hi"
        ),
        F.coalesce(
            F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("lo1"),
    )
    # q471's wide-integer T(x) (DECIMAL(38,0), exact halving — round-8
    # advice closed the BIGINT-wrap and 2^53 double-divide holes).
    blocks = cum.crossJoin(F.broadcast(nn)).select(
        "c1",
        "c",
        "hi",
        "lo1",
        (F.expr(_ab_t("spark", "hi")) - F.expr(_ab_t("spark", "lo1"))).alias(
            "bs"
        ),
    )
    terms = blocks.agg(
        F.sum(
            F.col("c1").cast(_DEC) * (F.col("lo1") + F.col("hi") + 1)
        ).alias("w2"),
        F.sum(
            F.col("c").cast(_DEC) * F.col("c") * F.col("c") - F.col("c")
        ).alias("ties3"),
        F.sum(
            F.round(1e8 * F.col("c1") * F.col("bs") / F.col("c")).cast(_DEC)
        ).alias("a8"),
        F.sum("bs").alias("sa"),
        F.sum(
            F.round(1e8 * F.col("bs") / F.col("c") * F.col("bs")).cast(_DEC)
        ).alias("q8"),
    )
    out = terms.crossJoin(F.broadcast(nn))
    n1d = F.col("n1").cast("double")
    z_w = (
        F.col("w2").cast("double") / 2.0 - n1d * (F.col("n") + 1) / 2.0
    ) / F.sqrt(
        n1d * F.col("n2") * (F.col("n") + 1) / 12.0
        - n1d
        * F.col("n2")
        * F.col("ties3").cast("double")
        / (12.0 * F.col("n") * (F.col("n") - 1))
    )
    z_ab = (F.col("a8") / 1e8 - n1d * F.col("sa") / F.col("n")) / F.sqrt(
        n1d
        * F.col("n2")
        * (
            F.col("n") * (F.col("q8") / 1e8)
            - F.col("sa").cast("double") * F.col("sa")
        )
        / (F.col("n").cast("double") * F.col("n") * (F.col("n") - 1))
    )
    return out.select(
        F.col("n1").alias("n_weekend"),
        F.col("n2").alias("n_weekday"),
        F.round(z_w, 4).alias("z_wilcoxon"),
        F.round(z_ab, 4).alias("z_ansari"),
        F.round(
            F.round(z_w, 4) * F.round(z_w, 4)
            + F.round(z_ab, 4) * F.round(z_ab, 4),
            4,
        ).alias("lepage_l"),
    )


# --------------------------------------------------------------------------
# q485 - Cucconi joint location-scale test (Cucconi 1968 — predates
# Lepage, rediscovered in the 2000s): U standardises the sum of SQUARED
# mid-ranks of the weekend sample, V the sum of squared CONTRARY ranks
# (N + 1 - R), and C = (U^2 + V^2 - 2*rho*U*V) / (2*(1 - rho^2)) with
# the exact correlation rho = 2*(N^2 - 4)/((2N+1)*(8N+11)) - 1. The
# other classical location-scale omnibus, a power-competitor to q484
# with a genuinely different construction (squared ranks, not scores).
# Parity: doubled mid-ranks are integers, so 4*sum R^2 = sum c*(2m)^2 is
# an exact integer (DECIMAL(38,0)/HUGEINT); U, V, rho, C are one double
# expression. 4dp.
# Scale: same frequency-domain shape as q484 — one (group, cents)
# aggregate, bounded-domain windows, a 1-row reduce.
# --------------------------------------------------------------------------
@register(
    "q485_cucconi",
    oracle=f"""
WITH base AS (
    SELECT CAST(ROUND(100.0 * value) AS BIGINT) AS v,
           CASE WHEN {_DUCK_WEEKEND} THEN 1 ELSE 0 END AS t
    FROM events WHERE event_type = 'purchase'
),
g AS (
    SELECT v, CAST(SUM(t) AS BIGINT) AS c1,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM base GROUP BY v
),
nn AS (
    SELECT CAST(SUM(c1) AS BIGINT) AS n1,
           CAST(SUM(c - c1) AS BIGINT) AS n2,
           CAST(SUM(c) AS BIGINT) AS n
    FROM g
),
cum AS (
    SELECT c1, c,
           CAST(SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS hi,
           CAST(COALESCE(SUM(c) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS lo1
    FROM g
),
sums AS (
    SELECT CAST(SUM(CAST(c1 AS HUGEINT) * (lo1 + hi + 1) * (lo1 + hi + 1))
                AS HUGEINT) AS r2_4,
           CAST(SUM(CAST(c1 AS HUGEINT)
                    * (2 * (n.n + 1) - (lo1 + hi + 1))
                    * (2 * (n.n + 1) - (lo1 + hi + 1))) AS HUGEINT) AS s2_4
    FROM cum CROSS JOIN nn n
),
uv AS (
    SELECT n.n1, n.n2, n.n,
           (6.0 * (CAST(s.r2_4 AS DOUBLE) / 4.0)
            - CAST(n.n1 AS DOUBLE) * (n.n + 1) * (2 * n.n + 1))
           / SQRT(CAST(n.n1 AS DOUBLE) * n.n2 * (n.n + 1)
                  * (2.0 * n.n + 1) * (8.0 * n.n + 11) / 5.0) AS u,
           (6.0 * (CAST(s.s2_4 AS DOUBLE) / 4.0)
            - CAST(n.n1 AS DOUBLE) * (n.n + 1) * (2 * n.n + 1))
           / SQRT(CAST(n.n1 AS DOUBLE) * n.n2 * (n.n + 1)
                  * (2.0 * n.n + 1) * (8.0 * n.n + 11) / 5.0) AS vv,
           2.0 * (CAST(n.n AS DOUBLE) * n.n - 4)
           / ((2.0 * n.n + 1) * (8.0 * n.n + 11)) - 1.0 AS rho
    FROM sums s CROSS JOIN nn n
)
SELECT n1 AS n_weekend, n2 AS n_weekday,
       ROUND(u, 4) AS u_stat, ROUND(vv, 4) AS v_stat,
       ROUND((u * u + vv * vv - 2.0 * rho * u * vv)
             / (2.0 * (1.0 - rho * rho)), 4) AS cucconi_c
FROM uv
""",
    tags=("ab-test", "A12", "W2", "robust"),
)
def q485_cucconi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cucconi joint location-scale test, weekend vs weekday purchases:
    (n_weekend, n_weekday, u_stat, v_stat, cucconi_c)."""
    events = load_table(spark, sf_dir, "events")
    base = events.filter(F.col("event_type") == "purchase").select(
        F.round(100.0 * F.col("value")).cast("long").alias("v"),
        F.expr(_SPARK_WEEKEND).cast("long").alias("t"),
    )
    g = base.groupBy("v").agg(
        F.sum("t").alias("c1"), F.count(F.lit(1)).alias("c")
    )
    nn = g.agg(
        F.sum("c1").alias("n1"),
        F.sum(F.col("c") - F.col("c1")).alias("n2"),
        F.sum("c").alias("n"),
    )
    w = Window.orderBy("v")
    cum = g.select(
        "c1",
        F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "hi"
        ),
        F.coalesce(
            F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("lo1"),
    )
    dec = "decimal(38,0)"
    two_m = F.col("lo1") + F.col("hi") + 1
    contrary = 2 * (F.col("n") + 1) - two_m
    sums = cum.crossJoin(F.broadcast(nn)).agg(
        F.sum(F.col("c1").cast(dec) * two_m * two_m).alias("r2_4"),
        F.sum(F.col("c1").cast(dec) * contrary * contrary).alias("s2_4"),
    )
    out = sums.crossJoin(F.broadcast(nn))
    n1d, n2d, nd = (
        F.col("n1").cast("double"),
        F.col("n2").cast("double"),
        F.col("n").cast("double"),
    )
    denom = F.sqrt(
        n1d * n2d * (F.col("n") + 1) * (2.0 * F.col("n") + 1)
        * (8.0 * F.col("n") + 11) / 5.0
    )
    u = (
        6.0 * (F.col("r2_4").cast("double") / 4.0)
        - n1d * (F.col("n") + 1) * (2 * F.col("n") + 1)
    ) / denom
    vv = (
        6.0 * (F.col("s2_4").cast("double") / 4.0)
        - n1d * (F.col("n") + 1) * (2 * F.col("n") + 1)
    ) / denom
    rho = 2.0 * (nd * F.col("n") - 4) / (
        (2.0 * F.col("n") + 1) * (8.0 * F.col("n") + 11)
    ) - 1.0
    return out.select(
        F.col("n1").alias("n_weekend"),
        F.col("n2").alias("n_weekday"),
        F.round(u, 4).alias("u_stat"),
        F.round(vv, 4).alias("v_stat"),
        F.round(
            (u * u + vv * vv - 2.0 * rho * u * vv)
            / (2.0 * (1.0 - rho * rho)),
            4,
        ).alias("cucconi_c"),
    )


# --------------------------------------------------------------------------
# q486 - Page's L trend test across the days of the week: rank each
# complete ISO-style week's 7 daily counts within the week (midranks for
# ties), then L = sum_j j * R_j over the weekday positions (the q450
# epoch-day convention, weekend = positions 6-7). Page's L is the
# ordered-alternative Friedman (q368): it asks not "do weekdays differ"
# but "do counts follow the hypothesised weekday ORDER".
# Parity: doubled midranks 2r = 2*rank_min + tie - 1 are exact integers,
# so 2L is an exact integer; z uses the standard no-tie normal
# approximation (documented; daily-count ties within a week are rare).
# 4dp.
# Scale: one corpus aggregate to the daily relation; ranks are 7-row
# windows partitioned by week (calendar-bounded).
# --------------------------------------------------------------------------
@register(
    "q486_page_trend",
    oracle="""
WITH daily AS (
    SELECT CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 86400 AS d,
           CAST(COUNT(*) AS BIGINT) AS x
    FROM events GROUP BY 1
),
lab AS (
    SELECT (d + 3) // 7 AS wk, (d + 3) % 7 + 1 AS pos, x FROM daily
),
full_wk AS (
    SELECT wk FROM lab GROUP BY wk HAVING COUNT(*) = 7
),
ranked AS (
    SELECT l.wk, l.pos,
           2 * RANK() OVER (PARTITION BY l.wk ORDER BY l.x)
           + COUNT(*) OVER (PARTITION BY l.wk, l.x) - 1 AS r2
    FROM lab l JOIN full_wk f ON f.wk = l.wk
),
rj AS (
    SELECT pos, CAST(SUM(r2) AS BIGINT) AS r2sum FROM ranked GROUP BY pos
),
agg AS (
    SELECT CAST(SUM(pos * r2sum) AS BIGINT) AS l2,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM full_wk) AS b
    FROM rj
)
SELECT b AS n_weeks,
       ROUND(l2 / 2.0, 4) AS l_stat,
       ROUND((l2 / 2.0 - b * 7.0 * 64 / 4.0)
             / SQRT(b * 49.0 * 8 * 48 / 144.0), 4) AS z
FROM agg
""",
    tags=("timeseries", "A12", "W2", "trend"),
)
def q486_page_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's L for weekday-ordered trend in daily counts:
    (n_weeks, l_stat, z)."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.expr("CAST(FLOOR(CAST(ts AS DOUBLE)) AS BIGINT) DIV 86400").alias(
            "d"
        )
    ).agg(F.count(F.lit(1)).alias("x"))
    lab = daily.select(
        ((F.col("d") + 3) / 7).cast("long").alias("wk"),
        ((F.col("d") + 3) % 7 + 1).alias("pos"),
        "x",
    )
    full_wk = lab.groupBy("wk").agg(F.count(F.lit(1)).alias("nd")).filter(
        F.col("nd") == 7
    ).select("wk")
    wr = Window.partitionBy("wk").orderBy("x")
    wt = Window.partitionBy("wk", "x")
    ranked = lab.join(full_wk, "wk").select(
        "pos",
        (2 * F.rank().over(wr) + F.count(F.lit(1)).over(wt) - 1).alias("r2"),
    )
    rj = ranked.groupBy("pos").agg(F.sum("r2").alias("r2sum"))
    b = full_wk.agg(F.count(F.lit(1)).alias("b"))
    agg = rj.agg(F.sum(F.col("pos") * F.col("r2sum")).alias("l2")).crossJoin(
        F.broadcast(b)
    )
    l_stat = F.col("l2") / 2.0
    e = F.col("b") * 7.0 * 64 / 4.0
    sd = F.sqrt(F.col("b") * 49.0 * 8 * 48 / 144.0)
    return agg.select(
        F.col("b").alias("n_weeks"),
        F.round(l_stat, 4).alias("l_stat"),
        F.round((l_stat - e) / sd, 4).alias("z"),
    )


# --------------------------------------------------------------------------
# q487 - Chatterjee's xi correlation (Chatterjee, JASA 2020) between
# daily click and purchase counts: sort days by clicks (deterministic
# day-index tie-break — the paper's uniform tie-break, derandomised),
# walk the purchase ranks, xi = 1 - n * sum|r_{i+1} - r_i| /
# (2 * sum l_i * (n - l_i)) with the general tie-aware denominator.
# The modern rank correlation that detects ARBITRARY functional
# dependence (not just monotone like q306 Spearman / q431 Kendall):
# xi -> 0 iff independent, -> 1 iff y is a measurable function of x.
# Parity: ranks r_i (#{y_j <= y_i}) and l_i (#{y_j >= y_i}) come from
# exact cumulative counts on the y-value domain; S1 is an exact integer
# window sum over the x-ordered daily relation; xi is one double ratio.
# 4dp.
# Scale: one corpus aggregate to the daily relation; value-domain joins
# and one ordered lag on ~4e3 rows.
# --------------------------------------------------------------------------
@register(
    "q487_xi_correlation",
    oracle="""
WITH daily AS (
    SELECT CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
           CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS x,
           CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
               AS y
    FROM events GROUP BY 1
),
ydom AS (
    SELECT y AS yv, CAST(COUNT(*) AS BIGINT) AS c FROM daily GROUP BY y
),
ycum AS (
    SELECT yv, CAST(SUM(c) OVER (ORDER BY yv ROWS UNBOUNDED PRECEDING)
               AS BIGINT) AS r
    FROM ydom
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
lab AS (
    SELECT d.day, d.x, yc.r, nn.n,
           nn.n - yc.r + (SELECT c FROM ydom WHERE yv = d.y) AS l
    FROM daily d JOIN ycum yc ON yc.yv = d.y CROSS JOIN nn
),
walk AS (
    SELECT r - LAG(r) OVER (ORDER BY x, day) AS dr FROM lab
),
agg AS (
    SELECT (SELECT CAST(SUM(ABS(dr)) AS BIGINT) FROM walk
            WHERE dr IS NOT NULL) AS s1,
           (SELECT CAST(SUM(l * (n - l)) AS BIGINT) FROM lab) AS denom,
           (SELECT n FROM nn) AS n
    FROM nn
)
SELECT n AS n_days, s1,
       ROUND(1.0 - CAST(n AS DOUBLE) * s1 / (2.0 * denom), 4) AS xi
FROM agg
""",
    tags=("timeseries", "A12", "W2"),
)
def q487_xi_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chatterjee's xi (clicks -> purchases, daily): (n_days, s1, xi)."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("x"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("y"),
    )
    ydom = daily.groupBy(F.col("y").alias("yv")).agg(
        F.count(F.lit(1)).alias("c")
    )
    ycum = ydom.select(
        "yv",
        "c",
        F.sum("c")
        .over(Window.orderBy("yv").rowsBetween(Window.unboundedPreceding, 0))
        .alias("r"),
    )
    nn = daily.agg(F.count(F.lit(1)).alias("n"))
    lab = (
        daily.join(ycum, daily["y"] == ycum["yv"])
        .crossJoin(F.broadcast(nn))
        .select(
            "day",
            "x",
            "r",
            "n",
            (F.col("n") - F.col("r") + F.col("c")).alias("l"),
        )
    )
    walk = lab.select(
        (F.col("r") - F.lag("r").over(Window.orderBy("x", "day"))).alias(
            "dr"
        )
    )
    s1 = walk.agg(F.sum(F.abs("dr")).alias("s1"))
    den = lab.agg(
        F.sum(F.col("l") * (F.col("n") - F.col("l"))).alias("denom"),
        F.max("n").alias("n"),
    )
    return s1.crossJoin(F.broadcast(den)).select(
        F.col("n").alias("n_days"),
        "s1",
        F.round(
            1.0
            - F.col("n").cast("double") * F.col("s1") / (2.0 * F.col("denom")),
            4,
        ).alias("xi"),
    )


# --------------------------------------------------------------------------
# q488 - Hopkins statistic of clustering tendency over the embedding
# space (first 8 dims): m = 32 deterministically-sampled real vectors
# (md5 order, the A13 discipline) and 32 synthetic uniform probes
# (hash-derived coordinates inside the per-dim bounding box); H =
# sum(u) / (sum(u) + sum(w)) where u = each synthetic probe's
# nearest-real distance and w = each real probe's nearest-OTHER-real
# distance. H near 0.5 = uniform, near 1 = clustered — the "should I
# even run q147's k-means" pre-test, and the missing companion to q335
# (silhouette scores a GIVEN clustering; Hopkins asks if any exists).
# Parity: probe coordinates are exact (floats or integer-hash-scaled
# doubles from exact min/max); squared distances and MIN are identical
# doubles; each NN distance is frozen to round(1e8 * d) before the
# 32-term sums. 4dp.
# Scale: corpus x 64 broadcast probe join (one projection, map-side min
# combine) — the probe count is FIXED, so the pass is linear at any
# corpus size. No corpus pair join.
# --------------------------------------------------------------------------
_HOP_D = 8
_HOP_M = 32


def _hop_oracle() -> str:
    d, m = _HOP_D, _HOP_M
    mins = ", ".join(f"MIN(e[{j}]) AS mn{j}, MAX(e[{j}]) AS mx{j}"
                     for j in range(1, d + 1))
    syn_coords = ", ".join(
        f"b.mn{j} + (b.mx{j} - b.mn{j}) * (('0x' || SUBSTR(MD5('hop_' || i || '_' || {j}), 1, 8))::UBIGINT::DOUBLE / 4294967296.0) AS p{j}"
        for j in range(1, d + 1)
    )
    real_coords = ", ".join(f"e[{j}] AS p{j}" for j in range(1, d + 1))
    d2 = " + ".join(
        f"(c.e[{j}] - p.p{j}) * (c.e[{j}] - p.p{j})" for j in range(1, d + 1)
    )
    return f"""
WITH base AS (
    SELECT vec_id, list_transform(embedding[1:{d}],
           x -> CAST(x AS DOUBLE)) AS e
    FROM embeddings
),
bounds AS (SELECT {mins} FROM base),
real_p AS (
    SELECT vec_id AS pid, 1 AS is_real, {real_coords}
    FROM base ORDER BY MD5(CAST(vec_id AS VARCHAR)) LIMIT {m}
),
syn_p AS (
    SELECT -i AS pid, 0 AS is_real, {syn_coords}
    FROM (SELECT UNNEST(range(1, {m + 1})) AS i) g CROSS JOIN bounds b
),
probes AS (SELECT * FROM real_p UNION ALL SELECT * FROM syn_p),
dists AS (
    SELECT p.pid, p.is_real, MIN({d2}) AS d2
    FROM base c CROSS JOIN probes p
    WHERE NOT (p.is_real = 1 AND c.vec_id = p.pid)
    GROUP BY p.pid, p.is_real
),
terms AS (
    SELECT is_real, CAST(ROUND(100000000.0 * SQRT(d2)) AS BIGINT) AS r8
    FROM dists
),
agg AS (
    SELECT CAST(SUM(CASE WHEN is_real = 0 THEN r8 ELSE 0 END) AS BIGINT)
               AS su,
           CAST(SUM(CASE WHEN is_real = 1 THEN r8 ELSE 0 END) AS BIGINT)
               AS sw
    FROM terms
)
SELECT CAST({m} AS BIGINT) AS m,
       ROUND(su / 100000000.0, 4) AS sum_u,
       ROUND(sw / 100000000.0, 4) AS sum_w,
       ROUND(CAST(su AS DOUBLE) / (su + sw), 4) AS hopkins
FROM agg
"""


@register(
    "q488_hopkins",
    oracle=_hop_oracle(),
    tags=("embedding", "A12", "clustering"),
)
def q488_hopkins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopkins clustering-tendency statistic over embeddings (8 dims,
    m=32): (m, sum_u, sum_w, hopkins)."""
    d, m = _HOP_D, _HOP_M
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id",
        *[
            F.element_at("embedding", j).cast("double").alias(f"x{j}")
            for j in range(1, d + 1)
        ],
    )
    bounds = base.agg(
        *[F.min(f"x{j}").alias(f"mn{j}") for j in range(1, d + 1)],
        *[F.max(f"x{j}").alias(f"mx{j}") for j in range(1, d + 1)],
    )
    real_p = (
        base.orderBy(F.md5(F.col("vec_id").cast("string")))
        .limit(m)
        .select(
            F.col("vec_id").alias("pid"),
            F.lit(1).alias("is_real"),
            *[F.col(f"x{j}").alias(f"p{j}") for j in range(1, d + 1)],
        )
    )
    syn_p = (
        emb.sparkSession.range(1, m + 1)
        .crossJoin(F.broadcast(bounds))
        .select(
            (-F.col("id")).cast("long").alias("pid"),
            F.lit(0).alias("is_real"),
            *[
                (
                    F.col(f"mn{j}")
                    + (F.col(f"mx{j}") - F.col(f"mn{j}"))
                    * (
                        F.conv(
                            F.substring(
                                F.md5(
                                    F.concat(
                                        F.lit("hop_"),
                                        F.col("id").cast("string"),
                                        F.lit(f"_{j}"),
                                    )
                                ),
                                1,
                                8,
                            ),
                            16,
                            10,
                        ).cast("double")
                        / 4294967296.0
                    )
                ).alias(f"p{j}")
                for j in range(1, d + 1)
            ],
        )
    )
    probes = real_p.unionByName(syn_p)
    d2 = None
    for j in range(1, d + 1):
        term = (F.col(f"x{j}") - F.col(f"p{j}")) * (
            F.col(f"x{j}") - F.col(f"p{j}")
        )
        d2 = term if d2 is None else d2 + term
    dists = (
        base.crossJoin(F.broadcast(probes))
        .filter(
            ~((F.col("is_real") == 1) & (F.col("vec_id") == F.col("pid")))
        )
        .groupBy("pid", "is_real")
        .agg(F.min(d2).alias("d2"))
    )
    terms = dists.select(
        "is_real",
        F.round(1e8 * F.sqrt("d2")).cast("long").alias("r8"),
    )
    agg = terms.agg(
        F.sum(F.when(F.col("is_real") == 0, F.col("r8")).otherwise(0)).alias(
            "su"
        ),
        F.sum(F.when(F.col("is_real") == 1, F.col("r8")).otherwise(0)).alias(
            "sw"
        ),
    )
    return agg.select(
        F.lit(m).cast("long").alias("m"),
        F.round(F.col("su") / 1e8, 4).alias("sum_u"),
        F.round(F.col("sw") / 1e8, 4).alias("sum_w"),
        F.round(
            F.col("su").cast("double") / (F.col("su") + F.col("sw")), 4
        ).alias("hopkins"),
    )
