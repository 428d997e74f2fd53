"""Multi-way star-join analytics (TPC-H Q3/Q5 shapes, round 4).

The engine's other relational queries pin single-join plans (q08 broadcast
denorm, q09/q10 semi/anti); these two exercise Catalyst's MULTI-join
planning — join ordering, mixed broadcast + shuffle strategies, pushdown
through a 6-table chain — the bread-and-butter shape of warehouse analytics
at 100 TB. Plan expectations (dims broadcast, facts shuffle on join keys,
filters reach the scans) are pinned in tests/test_plans.py.

Determinism: revenues are ROUND-ed to 4dp BEFORE the top-k ordering in q83,
so both engines rank on identical values and the orderkey tie-break makes
the LIMIT cut deterministic.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources.readers import load_table
from .registry import register


@register(
    "q83_shipping_priority",
    oracle="""
SELECT l.l_orderkey, o.o_orderdate,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-07-01'
  AND l.l_shipdate > TIMESTAMP '1998-07-01'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l.l_orderkey ASC
LIMIT 10
""",
    tags=("J1", "A1", "O6", "star-join"),
)
def q83_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 unshipped-revenue orders for one segment.

    customer is the selective dim (one segment) → broadcast into orders;
    orders→lineitem shuffles on the orderkey; the top-10 executes as
    TakeOrderedAndProject (no global sort materialisation).
    """
    cutoff = F.lit("1998-07-01").cast("timestamp")
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < cutoff
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > cutoff
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    return (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(l, l["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q84_local_supplier_volume",
    oracle="""
SELECT n.n_name, ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1999-01-01'
GROUP BY n.n_name
""",
    tags=("J1", "A1", "star-join"),
)
def q84_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue from local-supplier orders per nation of one
    region — a 6-table chain with the classic c_nationkey = s_nationkey
    "local" constraint.

    region→nation→supplier collapse to one small broadcast side; the only
    shuffles are the two fact joins (orders⨝customer on custkey,
    ⨝lineitem on orderkey). The nation-level aggregate is fully map-side
    partial before the final 25-row exchange.
    """
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_nationkey", "n_name")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(l, l["l_orderkey"] == o["o_orderkey"])
        .join(
            F.broadcast(s),
            (s["s_suppkey"] == l["l_suppkey"])
            & (s["s_nationkey"] == c["c_nationkey"]),
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


# --------------------------------------------------------------------------
# q266 — join-key skew audit across the schema's hot shuffle keys: for
# each fact-table key a big join or aggregation would shuffle on
# (lineitem.l_partkey, lineitem.l_suppkey, orders.o_custkey,
# events.user_id), the cardinality, the heaviest key's share, the top-10
# concentration, and the skew ratio max_n·n_keys/n_rows (1.0 = perfectly
# uniform). This is the relation an engine operator consults BEFORE
# picking a shuffle strategy — salting, AQE skew-join thresholds,
# broadcast cutoffs — made queryable.
# Parity: per-key counts, maxima and top-10 sums are exact integers; the
# three ratios are single divisions at the end, 4dp.
# Scale: one keyed partial-agg per column (the audit costs what ONE
# aggregation on that key costs); the top-10 is TakeOrderedAndProject
# (never a global sort); the final row is a crossJoin of 1-row aggregates.
# --------------------------------------------------------------------------
def _skew_oracle_part(table: str, col: str) -> str:
    return f"""
SELECT '{table}.{col}' AS key_col,
       CAST(SUM(n) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(MAX(n) AS BIGINT) AS max_key_n,
       ROUND(CAST(MAX(n) AS DOUBLE) / SUM(n), 4) AS max_share,
       ROUND((SELECT CAST(SUM(n) AS DOUBLE) FROM (
            SELECT n FROM (SELECT {col} AS k, COUNT(*) AS n FROM {table}
                           GROUP BY {col})
            ORDER BY n DESC, k ASC LIMIT 10)) / SUM(n), 4) AS top10_share,
       ROUND(CAST(MAX(n) AS DOUBLE) * COUNT(*) / SUM(n), 4) AS skew_ratio
FROM (SELECT {col} AS k, COUNT(*) AS n FROM {table} GROUP BY {col})
"""


_Q266_KEYS = (
    ("lineitem", "l_partkey"),
    ("lineitem", "l_suppkey"),
    ("orders", "o_custkey"),
    ("events", "user_id"),
)


@register(
    "q266_key_skew_audit",
    oracle="\nUNION ALL\n".join(
        _skew_oracle_part(t, c) for t, c in _Q266_KEYS
    )
    + "\nORDER BY key_col",
    tags=("ops-audit", "A5", "O6"),
)
def q266_key_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew audit: (key_col, n_rows, n_keys, max_key_n,
    max_share, top10_share, skew_ratio) for every hot join/agg key."""
    out = None
    for table, col in _Q266_KEYS:
        counts = (
            load_table(spark, sf_dir, table)
            .groupBy(F.col(col).alias("k"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        overall = counts.agg(
            F.sum("n").alias("n_rows"),
            F.count(F.lit(1)).alias("n_keys"),
            F.max("n").alias("max_key_n"),
        )
        top10 = (
            counts.orderBy(F.col("n").desc(), F.col("k").asc())
            .limit(10)
            .agg(F.sum("n").alias("t10"))
        )
        row = (
            overall.crossJoin(F.broadcast(top10))
            .select(
                F.lit(f"{table}.{col}").alias("key_col"),
                F.col("n_rows").cast("long").alias("n_rows"),
                F.col("n_keys").cast("long").alias("n_keys"),
                F.col("max_key_n").cast("long").alias("max_key_n"),
                F.round(
                    F.col("max_key_n").cast("double") / F.col("n_rows"), 4
                ).alias("max_share"),
                F.round(
                    F.col("t10").cast("double") / F.col("n_rows"), 4
                ).alias("top10_share"),
                F.round(
                    F.col("max_key_n").cast("double")
                    * F.col("n_keys")
                    / F.col("n_rows"),
                    4,
                ).alias("skew_ratio"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("key_col")


# --------------------------------------------------------------------------
# q275 - zone-map pruning audit: simulate parquet/Delta data skipping for
# the predicate l_shipdate IN [1996-01-01, 1996-03-31] under two physical
# layouts - natural order (blocks of contiguous l_orderkey ranges, i.e.
# insertion order) vs date-clustered (blocks of 4-week l_shipdate
# ranges, what q90's z-order/sort-before-write produces) - by building
# each layout's per-block (min, max) zone map and counting which blocks
# a reader must scan. The relation that justifies a re-clustering job:
# it prices the layout change in scanned-row terms before anyone runs it.
# Parity: block ids are integer floor-divisions of exact day/key values;
# zone maps are min/max/count aggregates; overlap flags are integer
# comparisons; the two fractions are single divisions, 4dp.
# Scale: one keyed aggregate per layout (blocks are data-independent
# ranges, so the group-by keys never concentrate); the audit costs two
# scans - strictly cheaper than the full-table scan it prevents.
# --------------------------------------------------------------------------
_Q275_LO = "1996-01-01"
_Q275_HI = "1996-03-31"


@register(
    "q275_zonemap_audit",
    oracle=f"""
WITH keyed AS (
    SELECT l_orderkey // 4096 AS nat_block,
           DATEDIFF('day', DATE '1995-01-01', CAST(l_shipdate AS DATE)) // 28
               AS clu_block,
           CAST(l_shipdate AS DATE) AS sd
    FROM lineitem
),
layouts AS (
    SELECT 'natural' AS layout, nat_block AS block, sd FROM keyed
    UNION ALL
    SELECT 'date_clustered' AS layout, clu_block AS block, sd FROM keyed
),
zones AS (
    SELECT layout, block,
           MIN(sd) AS lo, MAX(sd) AS hi,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM layouts GROUP BY layout, block
),
flagged AS (
    SELECT layout, n,
           CASE WHEN lo <= DATE '{_Q275_HI}' AND hi >= DATE '{_Q275_LO}'
                THEN 1 ELSE 0 END AS scanned
    FROM zones
)
SELECT layout,
       CAST(COUNT(*) AS BIGINT) AS n_blocks,
       CAST(SUM(scanned) AS BIGINT) AS n_scanned,
       CAST(SUM(n) AS BIGINT) AS rows_total,
       CAST(SUM(CASE WHEN scanned = 1 THEN n ELSE 0 END) AS BIGINT)
           AS rows_scanned,
       ROUND(CAST(SUM(scanned) AS DOUBLE) / COUNT(*), 4) AS block_scan_frac,
       ROUND(CAST(SUM(CASE WHEN scanned = 1 THEN n ELSE 0 END) AS DOUBLE)
             / SUM(n), 4) AS row_scan_frac
FROM flagged
GROUP BY layout
ORDER BY layout
""",
    tags=("storage-ops", "A1", "P10"),
)
def q275_zonemap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (min/max data-skipping) effectiveness of natural vs
    date-clustered block layouts for a shipdate range predicate:
    (layout, n_blocks, n_scanned, rows_total, rows_scanned,
    block_scan_frac, row_scan_frac)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.floor(F.col("l_orderkey") / 4096).alias("nat_block"),
        F.floor(
            F.datediff(
                F.col("l_shipdate").cast("date"),
                F.lit("1995-01-01").cast("date"),
            )
            / 28
        ).alias("clu_block"),
        F.col("l_shipdate").cast("date").alias("sd"),
    )
    layouts = li.select(
        F.lit("natural").alias("layout"), F.col("nat_block").alias("block"), "sd"
    ).unionByName(
        li.select(
            F.lit("date_clustered").alias("layout"),
            F.col("clu_block").alias("block"),
            "sd",
        )
    )
    zones = layouts.groupBy("layout", "block").agg(
        F.min("sd").alias("lo"),
        F.max("sd").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    flagged = zones.select(
        "layout",
        "n",
        (
            (F.col("lo") <= F.lit(_Q275_HI).cast("date"))
            & (F.col("hi") >= F.lit(_Q275_LO).cast("date"))
        )
        .cast("long")
        .alias("scanned"),
    )
    return (
        flagged.groupBy("layout")
        .agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.sum("scanned").alias("n_scanned"),
            F.sum("n").alias("rows_total"),
            F.sum(F.when(F.col("scanned") == 1, F.col("n")).otherwise(0)).alias(
                "rows_scanned"
            ),
            F.round(
                F.sum("scanned").cast("double") / F.count(F.lit(1)), 4
            ).alias("block_scan_frac"),
            F.round(
                F.sum(F.when(F.col("scanned") == 1, F.col("n")).otherwise(0))
                .cast("double")
                / F.sum("n"),
                4,
            ).alias("row_scan_frac"),
        )
        .select(
            "layout",
            F.col("n_blocks").cast("long").alias("n_blocks"),
            F.col("n_scanned").cast("long").alias("n_scanned"),
            F.col("rows_total").cast("long").alias("rows_total"),
            F.col("rows_scanned").cast("long").alias("rows_scanned"),
            "block_scan_frac",
            "row_scan_frac",
        )
        .orderBy("layout")
    )


# --------------------------------------------------------------------------
# q281 - ABC (Pareto) inventory classification per brand: parts ranked by
# revenue within their brand, cumulative-share cutoffs at 80%/95% assign
# classes A/B/C, and the output aggregates each (brand, class) cell -
# the classic 80/20 working-capital analysis, here keyed so every window
# is brand-partitioned (never a global sort).
# Parity: per-part revenue is frozen to round(10^4 * price*(1-disc))
# integers before summation; the two cutoff comparisons are INTEGER
# cross-multiplications (5*cum <= 4*tot, 20*cum <= 19*tot), so no float
# sits anywhere near a class boundary; the two output ratios divide
# frozen integers, 4dp.
# Scale: one (brand, part) keyed aggregate; the rank/cumsum window
# partitions by brand (the W2 contract - sortWithinPartitions per key,
# no single-reducer funnel); output is |brands| x 3 rows.
# --------------------------------------------------------------------------
@register(
    "q281_abc_classes",
    oracle="""
WITH rev AS (
    SELECT p.p_brand, l.l_partkey,
           CAST(SUM(CAST(ROUND(10000.0 * l.l_extendedprice
                               * (1.0 - l.l_discount)) AS BIGINT))
                AS BIGINT) AS r
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY p.p_brand, l.l_partkey
),
ranked AS (
    SELECT p_brand, l_partkey, r,
           SUM(r) OVER (PARTITION BY p_brand
                        ORDER BY r DESC, l_partkey ASC
                        ROWS UNBOUNDED PRECEDING) AS cum,
           SUM(r) OVER (PARTITION BY p_brand) AS tot
    FROM rev
),
classed AS (
    SELECT p_brand, r, tot,
           CASE WHEN 5 * cum <= 4 * tot THEN 'A'
                WHEN 20 * cum <= 19 * tot THEN 'B'
                ELSE 'C' END AS abc_class
    FROM ranked
)
SELECT p_brand, abc_class,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       ROUND(CAST(SUM(r) AS DOUBLE) / MAX(tot), 4) AS rev_share
FROM classed
GROUP BY p_brand, abc_class
ORDER BY p_brand, abc_class
""",
    tags=("analytics", "W2", "A9"),
)
def q281_abc_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC Pareto classes of parts by revenue within brand:
    (p_brand, abc_class, n_parts, rev_share)."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = (
        li.join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            li["l_partkey"] == part["p_partkey"],
        )
        .groupBy("p_brand", "l_partkey")
        .agg(
            F.sum(
                F.round(
                    10000.0
                    * F.col("l_extendedprice")
                    * (1.0 - F.col("l_discount"))
                ).cast("long")
            ).alias("r")
        )
    )
    w_cum = (
        Window.partitionBy("p_brand")
        .orderBy(F.col("r").desc(), F.col("l_partkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("p_brand")
    ranked = rev.select(
        "p_brand",
        "r",
        F.sum("r").over(w_cum).alias("cum"),
        F.sum("r").over(w_tot).alias("tot"),
    )
    classed = ranked.select(
        "p_brand",
        "r",
        "tot",
        F.when(5 * F.col("cum") <= 4 * F.col("tot"), F.lit("A"))
        .when(20 * F.col("cum") <= 19 * F.col("tot"), F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("abc_class"),
    )
    return (
        classed.groupBy("p_brand", "abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(
                F.sum("r").cast("double") / F.max("tot"), 4
            ).alias("rev_share"),
        )
        .orderBy("p_brand", "abc_class")
    )


# --------------------------------------------------------------------------
# q286 - declarative expectation suite (the Great-Expectations pattern):
# a battery of data-contract rules - not-null, domain range, value-set,
# cross-column ordering, referential integrity - evaluated over the
# order/lineitem tables with per-rule checked/failed counts and pass
# rates, ALL single-pass per table plus one anti-join for the FK rule.
# The relation a pipeline gates deploys on; q96's dq_audit generalised
# to a rule catalogue.
# Parity: every rule is an integer conditional count; pass_rate is one
# division, 4dp.
# Scale: one conditional-aggregation pass over each fact table (rules
# share the scan - the point of the suite); the FK rule is a broadcast
# anti-join counted in the same style.
# --------------------------------------------------------------------------
@register(
    "q286_expectation_suite",
    oracle="""
WITH li AS (
    SELECT COUNT(*) AS n,
           SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS f_qty_null,
           SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END)
               AS f_disc_range,
           SUM(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R') THEN 1 ELSE 0 END)
               AS f_flag_set,
           SUM(CASE WHEN l_tax < 0 OR l_tax > 1 THEN 1 ELSE 0 END)
               AS f_tax_range
    FROM lineitem
),
shiporder AS (
    SELECT COUNT(*) AS n,
           SUM(CASE WHEN l.l_shipdate < o.o_orderdate THEN 1 ELSE 0 END) AS f
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
o AS (
    SELECT COUNT(*) AS n,
           SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS f_price_pos
    FROM orders
),
fk AS (
    SELECT (SELECT COUNT(*) FROM lineitem) AS n,
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey)) AS f
)
SELECT rule, CAST(n_checked AS BIGINT) AS n_checked,
       CAST(n_failed AS BIGINT) AS n_failed,
       ROUND(1.0 - CAST(n_failed AS DOUBLE) / n_checked, 4) AS pass_rate
FROM (
    SELECT 'lineitem.l_quantity not_null' AS rule, n AS n_checked,
           f_qty_null AS n_failed FROM li
    UNION ALL
    SELECT 'lineitem.l_discount in [0,1]', n, f_disc_range FROM li
    UNION ALL
    SELECT 'lineitem.l_returnflag in (A,N,R)', n, f_flag_set FROM li
    UNION ALL
    SELECT 'lineitem.l_tax in [0,1]', n, f_tax_range FROM li
    UNION ALL
    SELECT 'lineitem.l_shipdate >= orders.o_orderdate', n, f FROM shiporder
    UNION ALL
    SELECT 'orders.o_totalprice > 0', n, f_price_pos FROM o
    UNION ALL
    SELECT 'lineitem.l_orderkey fk orders', n, f FROM fk
)
ORDER BY rule
""",
    tags=("data-quality", "P1", "P10", "P5"),
)
def q286_expectation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-contract rule battery with per-rule pass rates:
    (rule, n_checked, n_failed, pass_rate)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    li_stats = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").isNull().cast("long")).alias("f_qty_null"),
        F.sum(
            ((F.col("l_discount") < 0) | (F.col("l_discount") > 1)).cast("long")
        ).alias("f_disc_range"),
        F.sum(
            (~F.col("l_returnflag").isin("A", "N", "R")).cast("long")
        ).alias("f_flag_set"),
        F.sum(
            ((F.col("l_tax") < 0) | (F.col("l_tax") > 1)).cast("long")
        ).alias("f_tax_range"),
    ).collect()[0]
    ship = (
        li.join(
            # orders is a FACT table - no broadcast hint (AQE may still
            # choose one at test SF, but pinning it would OOM at scale)
            orders.select("o_orderkey", "o_orderdate"),
            li["l_orderkey"] == F.col("o_orderkey"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("l_shipdate") < F.col("o_orderdate")).cast("long")
            ).alias("f"),
        )
        .collect()[0]
    )
    o_stats = orders.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("o_totalprice") <= 0).cast("long")).alias("f_price_pos"),
    ).collect()[0]
    fk_failed = li.join(
        orders.select("o_orderkey"),
        li["l_orderkey"] == F.col("o_orderkey"),
        "left_anti",
    ).count()
    rows = [
        ("lineitem.l_quantity not_null", li_stats["n"], li_stats["f_qty_null"]),
        ("lineitem.l_discount in [0,1]", li_stats["n"], li_stats["f_disc_range"]),
        ("lineitem.l_returnflag in (A,N,R)", li_stats["n"], li_stats["f_flag_set"]),
        ("lineitem.l_tax in [0,1]", li_stats["n"], li_stats["f_tax_range"]),
        (
            "lineitem.l_shipdate >= orders.o_orderdate",
            ship["n"],
            ship["f"],
        ),
        ("orders.o_totalprice > 0", o_stats["n"], o_stats["f_price_pos"]),
        ("lineitem.l_orderkey fk orders", li_stats["n"], fk_failed),
    ]
    return (
        spark.createDataFrame(
            [(r, int(n), int(f)) for r, n, f in rows],
            "rule string, n_checked long, n_failed long",
        )
        .select(
            "rule",
            "n_checked",
            "n_failed",
            F.round(
                1.0 - F.col("n_failed").cast("double") / F.col("n_checked"), 4
            ).alias("pass_rate"),
        )
        .orderBy("rule")
    )


# --------------------------------------------------------------------------
# q287 - central-DP histogram via deterministic inverse-CDF Laplace
# noise: per-event-type counts released with Laplace(1/eps) noise at
# eps = 0.5, the uniform draw coming from the md5(event_type) hash
# stream so the release is reproducible and oracle-checkable (a seeded
# DP release - the mechanism is real, the randomness is pinned).
# Complements q273's LOCAL model with the central model.
# Parity: u = (hash % 10^6 + 0.5) / 10^6 is exact; the Laplace quantile
# sign * b * ln(1 - 2|u - 0.5|) is frozen to an integer noise term
# before addition, so noisy counts are exact integers; errors are
# integer differences, 4dp on the one ratio.
# Scale: one keyed count aggregate; noise is a narrow map on the
# |categories|-row relation.
# --------------------------------------------------------------------------
_DP_EPS_INV = 2  # b = 1/eps = 2  (eps = 0.5)


@register(
    "q287_dp_histogram",
    oracle=f"""
WITH counts AS (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_true
    FROM events GROUP BY event_type
),
draw AS (
    SELECT event_type, n_true,
           (('0x' || SUBSTR(MD5(event_type), 1, 8))::UBIGINT % 1000000
            + 0.5) / 1000000.0 AS u
    FROM counts
),
noised AS (
    SELECT event_type, n_true,
           CAST(ROUND(CASE WHEN u < 0.5 THEN 1.0 ELSE -1.0 END
                      * {_DP_EPS_INV} * LN(1.0 - 2.0 * ABS(u - 0.5)))
                AS BIGINT) AS noise
    FROM draw
)
SELECT event_type, n_true,
       n_true + noise AS n_noisy,
       noise AS noise_added,
       ROUND(ABS(CAST(noise AS DOUBLE)) / n_true, 4) AS rel_err
FROM noised
ORDER BY event_type
""",
    tags=("privacy", "A5"),
)
def q287_dp_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded central-DP Laplace release of the event-type histogram at
    eps=0.5: (event_type, n_true, n_noisy, noise_added, rel_err)."""
    events = load_table(spark, sf_dir, "events")
    counts = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_true")
    )
    u = (
        F.conv(F.substring(F.md5("event_type"), 1, 8), 16, 10).cast("long")
        % 1000000
        + 0.5
    ) / 1000000.0
    noise = (
        F.round(
            F.when(u < 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
            * _DP_EPS_INV
            * F.log(1.0 - 2.0 * F.abs(u - 0.5))
        )
    ).cast("long")
    return (
        counts.select(
            "event_type",
            F.col("n_true").cast("long").alias("n_true"),
            (F.col("n_true") + noise).cast("long").alias("n_noisy"),
            noise.alias("noise_added"),
            F.round(F.abs(noise.cast("double")) / F.col("n_true"), 4).alias(
                "rel_err"
            ),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# q298 - exact closed-form multiple regression (distributed normal
# equations): fit dollars(l_extendedprice) ~ 1 + l_quantity +
# discount_pct across the whole fact table by reducing it to 12 integer
# sufficient statistics (X'X and X'y) in ONE aggregate pass, then
# solving the 3x3 system by Cramer's rule on EXACT integers - DuckDB in
# HUGEINT, the driver in Python bignums - so the betas agree to the last
# bit before the one double division. The multi-feature upgrade of
# q144's slope/intercept, done the way distributed OLS actually works
# (statistics, not rows, cross the wire).
# Parity: all minors/determinants are exact integer arithmetic (magnitude
# < 1e33, inside HUGEINT); beta = det_num/det double division; R^2 is a
# fixed double expression over the same integers; 4dp.
# Scale: one conditional-aggregation pass with map-side partials; the
# 3x3 solve touches 12 scalars.
# --------------------------------------------------------------------------
def _q298_det_sql(c1: str, c2: str, c3: str) -> str:
    """3x3 determinant of columns (c1,c2,c3) stacked as rows r1..r3 of
    the symmetric system; each cN is a tuple of three stat names."""
    a, b, c = c1
    d, e, f = c2
    g, h, i = c3
    def H(x: str) -> str:
        return f"CAST({x} AS HUGEINT)"
    return (
        f"({H(a)} * ({H(e)} * {H(i)} - {H(f)} * {H(h)})"
        f" - {H(b)} * ({H(d)} * {H(i)} - {H(f)} * {H(g)})"
        f" + {H(c)} * ({H(d)} * {H(h)} - {H(e)} * {H(g)}))"
    )


def _q298_oracle() -> str:
    # symmetric X'X rows: [n, sq, sd], [sq, sqq, sqd], [sd, sqd, sdd]
    rows = [("n", "sq", "sd"), ("sq", "sqq", "sqd"), ("sd", "sqd", "sdd")]
    det = _q298_det_sql(*rows)
    bcol = ("sy", "sqy", "sdy")
    nums = []
    for j in range(3):
        rep = [tuple(bcol[r] if k == j else rows[r][k] for k in range(3))
               for r in range(3)]
        nums.append(_q298_det_sql(*rep))
    betas = [f"(CAST({n} AS DOUBLE) / CAST({det} AS DOUBLE))" for n in nums]
    sse = (
        f"(CAST(syy AS DOUBLE) - ({betas[0]} * sy + {betas[1]} * sqy"
        f" + {betas[2]} * sdy))"
    )
    sst = "(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n)"
    return f"""
WITH s AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(l_quantity) AS BIGINT) AS sq,
           CAST(SUM(CAST(ROUND(100.0 * l_discount) AS BIGINT)) AS BIGINT) AS sd,
           CAST(SUM(l_quantity * l_quantity) AS BIGINT) AS sqq,
           CAST(SUM(l_quantity * CAST(ROUND(100.0 * l_discount) AS BIGINT))
                AS BIGINT) AS sqd,
           CAST(SUM(CAST(ROUND(100.0 * l_discount) AS BIGINT)
                    * CAST(ROUND(100.0 * l_discount) AS BIGINT)) AS BIGINT)
               AS sdd,
           CAST(SUM(CAST(ROUND(l_extendedprice) AS BIGINT)) AS BIGINT) AS sy,
           CAST(SUM(l_quantity * CAST(ROUND(l_extendedprice) AS BIGINT))
                AS BIGINT) AS sqy,
           CAST(SUM(CAST(ROUND(100.0 * l_discount) AS BIGINT)
                    * CAST(ROUND(l_extendedprice) AS BIGINT)) AS BIGINT)
               AS sdy,
           CAST(SUM(CAST(ROUND(l_extendedprice) AS BIGINT)
                    * CAST(ROUND(l_extendedprice) AS BIGINT)) AS BIGINT)
               AS syy
    FROM lineitem
)
SELECT f.feature,
       ROUND(CASE f.feature
             WHEN 'intercept' THEN {betas[0]}
             WHEN 'quantity' THEN {betas[1]}
             ELSE {betas[2]} END, 4) AS beta,
       ROUND(1.0 - {sse} / {sst}, 4) AS r_squared
FROM s, (VALUES ('discount_pct'), ('intercept'), ('quantity')) AS f(feature)
ORDER BY f.feature
"""


@register(
    "q298_exact_ols",
    oracle=_q298_oracle(),
    tags=("ml-train", "A12"),
)
def q298_exact_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-feature OLS via integer sufficient statistics + Cramer:
    (feature, beta, r_squared)."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("long")
    d = F.round(100.0 * F.col("l_discount")).cast("long")
    y = F.round(F.col("l_extendedprice")).cast("long")
    stats = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("sq"),
        F.sum(d).alias("sd"),
        F.sum(q * q).alias("sqq"),
        F.sum(q * d).alias("sqd"),
        F.sum(d * d).alias("sdd"),
        F.sum(y).alias("sy"),
        F.sum(q * y).alias("sqy"),
        F.sum(d * y).alias("sdy"),
        F.sum(y * y).alias("syy"),
    ).collect()[0]

    def det3(r1, r2, r3):
        (a, b, c), (d_, e, f), (g, h, i) = r1, r2, r3
        return a * (e * i - f * h) - b * (d_ * i - f * g) + c * (d_ * h - e * g)

    n, sq, sd = stats["n"], stats["sq"], stats["sd"]
    sqq, sqd, sdd = stats["sqq"], stats["sqd"], stats["sdd"]
    sy, sqy, sdy, syy = stats["sy"], stats["sqy"], stats["sdy"], stats["syy"]
    A = [(n, sq, sd), (sq, sqq, sqd), (sd, sqd, sdd)]
    bv = (sy, sqy, sdy)
    det = det3(*A)
    betas = []
    for j in range(3):
        rep = [
            tuple(bv[r] if k == j else A[r][k] for k in range(3))
            for r in range(3)
        ]
        betas.append(det3(*rep) / det)  # exact-int / exact-int -> double
    sse = syy - (betas[0] * sy + betas[1] * sqy + betas[2] * sdy)
    sst = syy - sy * sy / n
    r2 = 1.0 - sse / sst
    rows = [
        ("discount_pct", betas[2]),
        ("intercept", betas[0]),
        ("quantity", betas[1]),
    ]
    return (
        spark.createDataFrame(
            [(f, b, r2) for f, b in rows],
            "feature string, beta_raw double, r2_raw double",
        )
        .select(
            "feature",
            F.round("beta_raw", 4).alias("beta"),
            F.round("r2_raw", 4).alias("r_squared"),
        )
        .orderBy("feature")
    )


# --------------------------------------------------------------------------
# q311 - order/line financial reconciliation: recompute every order's
# total from its lines (sum of extendedprice * (1 - discount) *
# (1 + tax), frozen to cents per line) and reconcile against
# o_totalprice at a 1-dollar tolerance, reported per order priority -
# the invariant check a billing pipeline runs nightly (and the audit
# that catches silent line-loss after a bad join).
# Parity: per-line charges are round-to-cents integers, per-order sums
# and gaps are exact integers, the tolerance test is an integer
# comparison; the two ratios are single divisions, 4dp.
# Scale: one keyed per-order aggregate over lineitem + one broadcast-
# free equi-join to orders + one per-priority rollup; the audit costs
# one pass of each table.
# --------------------------------------------------------------------------
@register(
    "q311_order_reconciliation",
    oracle="""
WITH line_tot AS (
    SELECT l_orderkey,
           CAST(SUM(CAST(ROUND(100.0 * l_extendedprice * (1.0 - l_discount)
                               * (1.0 + l_tax)) AS BIGINT)) AS BIGINT)
               AS computed_cents,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem GROUP BY l_orderkey
),
recon AS (
    SELECT o.o_orderpriority,
           ABS(CAST(ROUND(100.0 * o.o_totalprice) AS BIGINT)
               - COALESCE(lt.computed_cents, 0)) AS gap_cents,
           CASE WHEN lt.l_orderkey IS NULL THEN 1 ELSE 0 END AS lineless
    FROM orders o LEFT JOIN line_tot lt ON lt.l_orderkey = o.o_orderkey
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN gap_cents > 100 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_mismatched,
       CAST(SUM(lineless) AS BIGINT) AS n_lineless,
       CAST(MAX(gap_cents) AS BIGINT) AS max_gap_cents,
       ROUND(CAST(SUM(CASE WHEN gap_cents > 100 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 4) AS mismatch_rate
FROM recon
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    tags=("data-quality", "A1", "J8"),
)
def q311_order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-total vs line-sum reconciliation per priority:
    (o_orderpriority, n_orders, n_mismatched, n_lineless, max_gap_cents,
    mismatch_rate)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    line_tot = li.groupBy("l_orderkey").agg(
        F.sum(
            F.round(
                100.0
                * F.col("l_extendedprice")
                * (1.0 - F.col("l_discount"))
                * (1.0 + F.col("l_tax"))
            ).cast("long")
        ).alias("computed_cents"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    recon = orders.join(
        line_tot, orders["o_orderkey"] == line_tot["l_orderkey"], "left"
    ).select(
        "o_orderpriority",
        F.abs(
            F.round(100.0 * F.col("o_totalprice")).cast("long")
            - F.coalesce("computed_cents", F.lit(0))
        ).alias("gap_cents"),
        F.col("l_orderkey").isNull().cast("long").alias("lineless"),
    )
    return (
        recon.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum((F.col("gap_cents") > 100).cast("long")).alias(
                "n_mismatched"
            ),
            F.sum("lineless").alias("n_lineless"),
            F.max("gap_cents").alias("max_gap_cents"),
            F.round(
                F.sum((F.col("gap_cents") > 100).cast("long")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("mismatch_rate"),
        )
        .select(
            "o_orderpriority",
            F.col("n_orders").cast("long").alias("n_orders"),
            F.col("n_mismatched").cast("long").alias("n_mismatched"),
            F.col("n_lineless").cast("long").alias("n_lineless"),
            F.col("max_gap_cents").cast("long").alias("max_gap_cents"),
            "mismatch_rate",
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# q435 - tail-risk of order spend per market segment: 95% VaR (the
# quantile) and 95% CVaR / expected shortfall (mean spend GIVEN spend is
# at or above the VaR), plus how many orders sit in the tail. CVaR is
# the coherent risk measure (subadditive, unlike VaR) used wherever the
# tail cost - not the typical cost - is what hurts: revenue-at-risk,
# worst-case fulfilment load, budget planning.
# Parity: q391's quantised-quantile pattern - cents as exact BIGINT,
# threshold = ROUND(100*QUANTILE_CONT(cents, .95)) compared at integer
# scale (100*c >= hi4), so engine quantile interpolation lands on the
# same integer both sides; tail mean is exact-integer-sum / count.
# Scale: broadcast customer-dim join for the segment, ONE exact
# per-segment quantile aggregate (5 groups), one tail aggregate. No
# windows, no corpus sort.
# --------------------------------------------------------------------------
@register(
    "q435_cvar_spend",
    oracle="""
WITH v AS (
    SELECT c.c_mktsegment AS segment,
           CAST(ROUND(100.0 * o.o_totalprice) AS BIGINT) AS c
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
),
b AS (
    SELECT segment,
           CAST(ROUND(100.0 * QUANTILE_CONT(CAST(c AS DOUBLE), 0.95))
                AS BIGINT) AS hi4
    FROM v GROUP BY segment
)
SELECT v.segment,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(MAX(b.hi4) AS DOUBLE) / 10000.0, 4) AS var95,
       ROUND(CAST(SUM(CASE WHEN 100 * v.c >= b.hi4 THEN v.c ELSE 0 END)
                  AS DOUBLE)
             / 100.0 / SUM(CASE WHEN 100 * v.c >= b.hi4 THEN 1 ELSE 0 END),
             4) AS cvar95,
       CAST(SUM(CASE WHEN 100 * v.c >= b.hi4 THEN 1 ELSE 0 END) AS BIGINT)
           AS tail_n
FROM v JOIN b ON b.segment = v.segment
GROUP BY v.segment ORDER BY v.segment
""",
    tags=("risk", "A12", "J1"),
)
def q435_cvar_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spend tail risk per segment: (segment, n, var95, cvar95, tail_n)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    v = orders.join(
        F.broadcast(cust.select("c_custkey", "c_mktsegment")),
        orders.o_custkey == F.col("c_custkey"),
    ).select(
        F.col("c_mktsegment").alias("segment"),
        F.round(100.0 * F.col("o_totalprice")).cast("long").alias("c"),
    )
    b = v.groupBy("segment").agg(
        F.round(100.0 * F.expr("percentile(CAST(c AS DOUBLE), 0.95)"))
        .cast("long")
        .alias("hi4")
    )
    intail = (100 * F.col("c") >= F.col("hi4")).cast("long")
    return (
        v.join(F.broadcast(b), "segment")
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.max("hi4").cast("double") / 10000.0, 4).alias("var95"),
            F.round(
                F.sum(F.when(intail == 1, F.col("c")).otherwise(0)).cast("double")
                / 100.0
                / F.sum(intail),
                4,
            ).alias("cvar95"),
            F.sum(intail).cast("long").alias("tail_n"),
        )
        .orderBy("segment")
    )


# --------------------------------------------------------------------------
# q436 - OLS influence diagnostics: fit price ~ quantity on lineitem
# (q298's regression family), then for every line item compute leverage
# h_ii, the residual, and Cook's distance - and return the 10 most
# influential observations. The closed-form simple-regression case:
# h = 1/n + (x - xbar)^2/Sxx, D = e^2 h / (p s^2 (1-h)^2), p = 2 -
# influence = outlying-in-x AND poorly-fit-in-y, which neither residual
# (q14 z-scores) nor leverage alone captures.
# Parity: moments are exact integer sums (whole dollars / unit
# quantities); SSE comes from the moment identity Syy - b*Sxy (never a
# per-row float sum, so no summation-order risk); b, s2, and each row's
# (h, e, D) are the same double expression texts both engines; the
# top-10 cut ranks on ROUND(D, 6) with (orderkey, linenumber)
# tie-break, so the LIMIT edge is deterministic.
# Scale: ONE map-side-combined corpus aggregate for the moments (1-row
# broadcast), one scan computing per-row diagnostics, TakeOrdered(10).
# No windows, no corpus sort.
# --------------------------------------------------------------------------
@register(
    "q436_ols_influence",
    oracle="""
WITH v AS (
    SELECT l_orderkey, l_linenumber,
           CAST(ROUND(l_quantity) AS BIGINT) AS x,
           CAST(ROUND(l_extendedprice) AS BIGINT) AS y
    FROM lineitem
),
m AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
           CAST(SUM(x * x) AS BIGINT) AS sxx,
           CAST(SUM(x * y) AS BIGINT) AS sxy,
           CAST(SUM(y * y) AS BIGINT) AS syy
    FROM v
),
fit AS (
    SELECT n, sx, sy,
           CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n AS ssx,
           CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n AS spxy,
           CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n AS ssy
    FROM m
),
par AS (
    SELECT n, sx, sy, ssx,
           spxy / ssx AS b,
           (ssy - spxy / ssx * spxy) / (n - 2) AS s2
    FROM fit
),
diag AS (
    SELECT v.l_orderkey, v.l_linenumber, v.x, v.y,
           1.0 / p.n + (v.x - CAST(p.sx AS DOUBLE) / p.n)
                       * (v.x - CAST(p.sx AS DOUBLE) / p.n) / p.ssx AS h,
           v.y - (CAST(p.sy AS DOUBLE) / p.n
                  - p.b * (CAST(p.sx AS DOUBLE) / p.n)) - p.b * v.x AS e,
           p.s2 AS s2
    FROM v CROSS JOIN par p
)
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
       x AS quantity, y AS price,
       ROUND(h, 6) AS leverage,
       ROUND(e * e * h / (2.0 * s2 * (1.0 - h) * (1.0 - h)), 6) AS cook_d
FROM diag
ORDER BY cook_d DESC, l_orderkey, l_linenumber LIMIT 10
""",
    tags=("stats", "regression", "O6"),
)
def q436_ols_influence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 Cook's-distance line items for price ~ quantity:
    (l_orderkey, l_linenumber, quantity, price, leverage, cook_d)."""
    li = load_table(spark, sf_dir, "lineitem")
    v = li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_quantity").cast("long").alias("x"),
        F.round("l_extendedprice").cast("long").alias("y"),
    )
    m = v.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    fit = m.select(
        "n",
        "sx",
        "sy",
        (F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx") / F.col("n")).alias("ssx"),
        (F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy") / F.col("n")).alias("spxy"),
        (F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy") / F.col("n")).alias("ssy"),
    )
    par = fit.select(
        "n",
        "sx",
        "sy",
        "ssx",
        (F.col("spxy") / F.col("ssx")).alias("b"),
        (
            (F.col("ssy") - F.col("spxy") / F.col("ssx") * F.col("spxy"))
            / (F.col("n") - 2)
        ).alias("s2"),
    )
    xbar = F.col("sx").cast("double") / F.col("n")
    ybar = F.col("sy").cast("double") / F.col("n")
    diag = v.crossJoin(F.broadcast(par)).select(
        "l_orderkey",
        "l_linenumber",
        "x",
        "y",
        (
            F.lit(1.0) / F.col("n")
            + (F.col("x") - xbar) * (F.col("x") - xbar) / F.col("ssx")
        ).alias("h"),
        (F.col("y") - (ybar - F.col("b") * xbar) - F.col("b") * F.col("x")).alias("e"),
        "s2",
    )
    return (
        diag.select(
            "l_orderkey",
            F.col("l_linenumber").cast("long").alias("l_linenumber"),
            F.col("x").alias("quantity"),
            F.col("y").alias("price"),
            F.round("h", 6).alias("leverage"),
            F.round(
                F.col("e") * F.col("e") * F.col("h")
                / (
                    F.lit(2.0)
                    * F.col("s2")
                    * (F.lit(1.0) - F.col("h"))
                    * (F.lit(1.0) - F.col("h"))
                ),
                6,
            ).alias("cook_d"),
        )
        .orderBy(F.desc("cook_d"), "l_orderkey", "l_linenumber")
        .limit(10)
    )


# --------------------------------------------------------------------------
# q456 - Breusch-Pagan heteroscedasticity test, completing the OLS
# diagnostics suite (q298 fit, q436 influence, q340 autocorrelation):
# does the variance of price ~ quantity residuals grow with quantity?
# Auxiliary regression of the squared residual on x; LM = n * R^2 of
# that regression is asymptotically chi-square(1). Heteroscedastic
# errors don't bias beta but invalidate its plain standard errors -
# the test tells you whether q298's SEs can be trusted.
# Parity: first-stage moments are exact integer sums; per-row squared
# residuals are frozen to WHOLE-dollar^2 integers (the statistic is
# DEFINED on that grid, deterministically on both engines), so the
# auxiliary moments are again exact integer sums; LM and R2 are single
# double expressions.
# Scale: two map-side-combined corpus aggregates (one for the fit, one
# for the auxiliary moments with the 1-row params broadcast in
# between). No windows, no corpus joins.
# --------------------------------------------------------------------------
@register(
    "q456_breusch_pagan",
    oracle="""
WITH v AS (
    SELECT CAST(ROUND(l_quantity) AS BIGINT) AS x,
           CAST(ROUND(l_extendedprice) AS BIGINT) AS y
    FROM lineitem
),
m AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
           CAST(SUM(x * x) AS BIGINT) AS sxx,
           CAST(SUM(x * y) AS BIGINT) AS sxy
    FROM v
),
par AS (
    SELECT n, sx,
           (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
           / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) AS b,
           CAST(sy AS DOUBLE) / n
           - (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
             / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n)
             * (CAST(sx AS DOUBLE) / n) AS a
    FROM m
),
aux AS (
    SELECT v.x,
           CAST(ROUND((v.y - p.a - p.b * v.x) * (v.y - p.a - p.b * v.x)
                      / 1000000.0) AS BIGINT) AS z
    FROM v CROSS JOIN par p
),
am AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(z) AS BIGINT) AS sz,
           CAST(SUM(x * x) AS BIGINT) AS sxx,
           CAST(SUM(x * z) AS BIGINT) AS sxz,
           CAST(SUM(z * z) AS BIGINT) AS szz
    FROM aux
)
SELECT n,
       ROUND((CAST(sxz AS DOUBLE) - CAST(sx AS DOUBLE) * sz / n)
             * (CAST(sxz AS DOUBLE) - CAST(sx AS DOUBLE) * sz / n)
             / ((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n)
                * (CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * sz / n)),
             6) AS r2_aux,
       ROUND(n * ((CAST(sxz AS DOUBLE) - CAST(sx AS DOUBLE) * sz / n)
             * (CAST(sxz AS DOUBLE) - CAST(sx AS DOUBLE) * sz / n)
             / ((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n)
                * (CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * sz / n))),
             4) AS lm_stat
FROM am
""",
    tags=("stats", "regression", "A12"),
)
def q456_breusch_pagan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breusch-Pagan LM test for heteroscedasticity of price ~ quantity:
    (n, r2_aux, lm_stat)."""
    li = load_table(spark, sf_dir, "lineitem")
    v = li.select(
        F.round("l_quantity").cast("long").alias("x"),
        F.round("l_extendedprice").cast("long").alias("y"),
    )
    m = v.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    b = (
        F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy") / F.col("n")
    ) / (
        F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx") / F.col("n")
    )
    par = m.select("n", "sx", b.alias("b"), (
        F.col("sy").cast("double") / F.col("n")
        - b * (F.col("sx").cast("double") / F.col("n"))
    ).alias("a"))
    e = F.col("y") - F.col("a") - F.col("b") * F.col("x")
    aux = v.crossJoin(F.broadcast(par)).select(
        "x", F.round(e * e / 1000000.0).cast("long").alias("z")
    )
    am = aux.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("z").alias("sz"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("z")).alias("sxz"),
        F.sum(F.col("z") * F.col("z")).alias("szz"),
    )
    cov = F.col("sxz").cast("double") - F.col("sx").cast("double") * F.col("sz") / F.col("n")
    vx = F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx") / F.col("n")
    vz = F.col("szz").cast("double") - F.col("sz").cast("double") * F.col("sz") / F.col("n")
    r2 = cov * cov / (vx * vz)
    return am.select(
        F.col("n").cast("long").alias("n"),
        F.round(r2, 6).alias("r2_aux"),
        F.round(F.col("n") * r2, 4).alias("lm_stat"),
    )
