"""Incremental processing: snapshot diff (q66).

Both engines derive the two snapshots deterministically from the same
``orders`` table (the derived-input oracle pattern of q51-q53/q58-q61),
so the diff semantics — not the derivation — are what the hash-match
verifies.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.delta import snapshot_diff
from ..sources.readers import load_table
from .registry import register


def _old(orders: DataFrame) -> DataFrame:
    return orders.filter(F.col("o_orderkey") % 11 != 0).select(
        "o_orderkey",
        F.col("o_totalprice").alias("price"),
        F.col("o_orderstatus").alias("stat"),
    )


def _new(orders: DataFrame) -> DataFrame:
    # +10.0 is exact in double — no rounding-mode hazard in the comparison.
    return orders.filter(F.col("o_orderkey") % 13 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + F.lit(10.0)
        )
        .otherwise(F.col("o_totalprice"))
        .alias("price"),
        F.when(F.col("o_orderkey") % 19 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("stat"),
    )


@register(
    "q66_snapshot_diff",
    oracle="""
WITH old AS (
    SELECT o_orderkey, o_totalprice AS price, o_orderstatus AS stat
    FROM orders WHERE o_orderkey % 11 <> 0
),
new AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 10.0
                ELSE o_totalprice END AS price,
           CASE WHEN o_orderkey % 19 = 0 THEN 'X' ELSE o_orderstatus END AS stat
    FROM orders WHERE o_orderkey % 13 <> 0
)
SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
       CASE WHEN o.o_orderkey IS NULL THEN 'added'
            WHEN n.o_orderkey IS NULL THEN 'removed'
            ELSE 'changed' END AS status
FROM old o FULL OUTER JOIN new n ON n.o_orderkey = o.o_orderkey
WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
   OR o.price <> n.price OR o.stat <> n.stat
""",
    tags=("incremental", "S12", "U3"),
)
def q66_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed delta between two table snapshots: added/removed/changed.

    Engine path: map-side md5 value fingerprint + one full-outer equi-join
    (operators/delta.snapshot_diff) — wide tables compare one 32-char
    column through the shuffle, and bucketed snapshots make it
    shuffle-free. The oracle states the same semantics with direct value
    comparison.
    """
    orders = load_table(spark, sf_dir, "orders")
    return snapshot_diff(
        _old(orders), _new(orders), ["o_orderkey"], ["price", "stat"]
    )


@register(
    "q137_incremental_join",
    # Join-view maintenance identity (the join sibling of q97's aggregate
    # maintenance): with O = O_base ∪ ΔO and L = L_base ∪ ΔL,
    #   O ⋈ L  =  O_base⋈L_base  ∪  ΔO⋈L_base  ∪  O_base⋈ΔL  ∪  ΔO⋈ΔL
    # — the engine maintains the materialized join view from the three
    # delta terms (each a delta-driven join, never a rescan of the old
    # view's join), and the oracle states the FULL recompute over the
    # unioned inputs. Hash-match proves the maintenance algebra.
    oracle="""
SELECT o.o_orderkey,
       COUNT(*) AS n_lines,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderkey
""",
    tags=("incremental", "S12", "J1"),
)
def q137_incremental_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally maintained join view: revenue + line count per order.

    Deterministic base/delta split (orderkey mod): the 'stored' view is
    the base⋈base aggregate; an update batch folds in the three delta
    joins keyed on the same orderkey, then a final keyed merge. At 100 TB
    the delta terms scan |Δ|-proportional data — the entire point of
    maintenance over recompute; every join and the merge shuffle on the
    same uniform orderkey."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey")
    lines = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", rev.alias("rev")
    )
    o_base = orders.filter(F.col("o_orderkey") % 7 != 0)
    o_delta = orders.filter(F.col("o_orderkey") % 7 == 0)
    l_base = lines.filter(F.col("l_orderkey") % 5 != 0)
    l_delta = lines.filter(F.col("l_orderkey") % 5 == 0)

    def grouped(o: DataFrame, l: DataFrame) -> DataFrame:
        return (
            o.join(l, o["o_orderkey"] == l["l_orderkey"])
            .groupBy("o_orderkey")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("rev").alias("r"))
        )

    mv = grouped(o_base, l_base)  # the stored view
    deltas = (
        grouped(o_delta, l_base)
        .union(grouped(o_base, l_delta))
        .union(grouped(o_delta, l_delta))
    )
    return (
        mv.union(deltas)
        .groupBy("o_orderkey")
        .agg(
            F.sum("n").cast("long").alias("n_lines"),
            F.round(F.sum("r"), 4).alias("revenue"),
        )
    )
