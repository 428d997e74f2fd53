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
