"""Nested / semi-structured data queries.

Covers the reference's semi-structured surface on driver tables:
- Crossref author formatting F7 (etl.py:393-404): filter entries with
  missing fields → format → '; ' join, as higher-order array functions;
- first-element preference picks F8/F18 (etl.py:398-402, journal-analysis
  cell 2): first entry matching a predicate else first overall;
- JSON payload extraction F21/S7 (resources.py:268, 73-76): typed access
  into a JSON string column;
- A12 describe()-style summary statistics as a deterministic relation.

All JVM-side (no UDFs): collect_list(struct) + transform/filter/array_join
stay inside codegen; from_json is Catalyst-native.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources.readers import load_table
from .registry import register


@register(
    "q44_summary_stats",
    oracle="""
WITH src AS (SELECT l_quantity, l_extendedprice, l_discount FROM lineitem)
SELECT 'l_quantity' AS col_name,
       CAST(COUNT(l_quantity) AS BIGINT) AS n,
       ROUND(AVG(l_quantity), 4) AS mean,
       ROUND(STDDEV_SAMP(l_quantity), 4) AS std,
       ROUND(MIN(l_quantity), 4) AS min_v,
       ROUND(MAX(l_quantity), 4) AS max_v
FROM src
UNION ALL
SELECT 'l_extendedprice',
       CAST(COUNT(l_extendedprice) AS BIGINT),
       ROUND(AVG(l_extendedprice), 4),
       ROUND(STDDEV_SAMP(l_extendedprice), 4),
       ROUND(MIN(l_extendedprice), 4),
       ROUND(MAX(l_extendedprice), 4)
FROM src
UNION ALL
SELECT 'l_discount',
       CAST(COUNT(l_discount) AS BIGINT),
       ROUND(AVG(l_discount), 4),
       ROUND(STDDEV_SAMP(l_discount), 4),
       ROUND(MIN(l_discount), 4),
       ROUND(MAX(l_discount), 4)
FROM src
""",
    tags=("A12",),
)
def q44_summary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """describe()/summary() as a deterministic typed relation (A12).

    One pass over the fact table: all per-column aggregates compute in a
    single agg, then unpivot to (col_name, stats) rows — no per-column scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    aggs = []
    for c in cols:
        aggs += [
            F.count(c).alias(f"{c}__n"),
            F.round(F.avg(c), 4).alias(f"{c}__mean"),
            F.round(F.stddev_samp(c), 4).alias(f"{c}__std"),
            F.round(F.min(c), 4).alias(f"{c}__min_v"),
            F.round(F.max(c), 4).alias(f"{c}__max_v"),
        ]
    wide = li.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"{c}__n").cast("long").alias("n"),
                F.col(f"{c}__mean").alias("mean"),
                F.col(f"{c}__std").alias("std"),
                F.col(f"{c}__min_v").alias("min_v"),
                F.col(f"{c}__max_v").alias("max_v"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(rows).alias("r")).select("r.*")


@register(
    "q45_nested_item_rollup",
    oracle="""
WITH nested AS (
    SELECT o_orderkey,
           LIST(struct_pack(
                    ln := l_linenumber,
                    flag := l_returnflag,
                    qty := l_quantity)
                -- full-field order: Spark's sort_array sorts structs by
                -- every field, so ties on linenumber must break identically
                ORDER BY l_linenumber, l_returnflag, l_quantity) AS items
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE o_orderkey % 50 = 0
    GROUP BY o_orderkey
)
SELECT o_orderkey,
       LEN(items) AS n_items,
       -- DuckDB yields NULL for the no-match case where Spark's array_join
       -- yields '' — coalesce to the Spark semantics
       COALESCE(ARRAY_TO_STRING(
           LIST_TRANSFORM(
               LIST_FILTER(items, s -> s.qty > 25),
               s -> s.flag || ':' || CAST(s.ln AS VARCHAR)),
           '; '), '') AS big_items,
       COALESCE(
           LIST_FILTER(items, s -> s.flag = 'R')[1].ln,
           items[1].ln) AS pick_ln
FROM nested
""",
    tags=("F7", "F8", "F18", "F23"),
)
def q45_nested_item_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-of-structs pipeline: the Crossref author-formatting shape (F7)
    and first-match-else-first preference picks (F8/F18) over nested order
    items. collect_list(struct) → sort_array gives a deterministic nested
    column; the string formatting never leaves codegen."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 50 == 0)
    nested = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("l_linenumber").alias("ln"),
                        F.col("l_returnflag").alias("flag"),
                        F.col("l_quantity").alias("qty"),
                    )
                )
            ).alias("items")
        )
    )
    big = F.array_join(
        F.transform(
            F.filter(F.col("items"), lambda s: s.qty > 25),
            lambda s: F.concat_ws(":", s.flag, s.ln.cast("string")),
        ),
        "; ",
    )
    pick = F.coalesce(
        F.element_at(F.filter(F.col("items"), lambda s: s.flag == "R"), 1).ln,
        F.element_at(F.col("items"), 1).ln,
    )
    return nested.select(
        "o_orderkey",
        F.size("items").cast("long").alias("n_items"),
        big.alias("big_items"),
        pick.alias("pick_ln"),
    )


@register(
    "q46_json_props",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(props->>'k' AS INT)) AS BIGINT) AS k_sum,
       CAST(MAX(CAST(props->>'k' AS INT)) AS BIGINT) AS k_max
FROM events
GROUP BY event_type
""",
    tags=("F21", "S7"),
)
def q46_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed extraction from a JSON string column (from_json, no UDF)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "struct<k:int>").getField("k")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("long").alias("k_sum"),
            F.max("k").cast("long").alias("k_max"),
        )
    )
