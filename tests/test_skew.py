"""Skew-mitigation operators: salted join / salted aggregate must be
semantically identical to their unsalted forms."""

from __future__ import annotations

import pyspark.sql.functions as F

from conftest import SF_DIR
from synth_transform_spark.operators.skew import salted_aggregate, salted_join
from synth_transform_spark.sources.readers import load_table


def test_salted_join_equals_plain_join(spark):
    orders = load_table(spark, SF_DIR, "orders")
    cust = load_table(spark, SF_DIR, "customer").select("c_custkey", "c_nationkey")
    plain = orders.join(cust, orders.o_custkey == cust.c_custkey).drop("c_custkey")
    salted = salted_join(
        orders.withColumnRenamed("o_custkey", "c_custkey"), cust, ["c_custkey"], n_salts=8
    )
    a = sorted((r.o_orderkey, r.c_nationkey) for r in plain.collect())
    b = sorted((r.o_orderkey, r.c_nationkey) for r in salted.collect())
    assert a == b


def test_salted_join_left_keeps_misses(spark):
    ev = load_table(spark, SF_DIR, "events").limit(200)
    dim = spark.createDataFrame([(0, "zero"), (1, "one")], ["user_id", "label"])
    plain = ev.join(dim, "user_id", "left")
    salted = salted_join(ev, dim, ["user_id"], n_salts=4, how="left")
    assert salted.count() == plain.count()
    assert (
        salted.filter(F.col("label").isNull()).count()
        == plain.filter(F.col("label").isNull()).count()
    )


def test_salted_join_spreads_hot_key(spark):
    """A single hot key must land in >1 salt bucket (the whole point)."""
    hot = spark.range(10000).select(F.lit(7).alias("k"), F.col("id"))
    salt = F.pmod(F.xxhash64("k", "id"), F.lit(8))
    n_buckets = hot.withColumn("s", salt).select("s").distinct().count()
    assert n_buckets == 8


def test_salted_aggregate_matches_groupby(spark):
    ev = load_table(spark, SF_DIR, "events")
    plain = (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("count_value"),
            F.round(F.sum("value"), 3).alias("sum_value"),
            F.min("user_id").alias("min_user_id"),
        )
        .collect()
    )
    salted = salted_aggregate(
        ev,
        ["event_type"],
        {"value": "sum", "user_id": "min"},
        n_salts=8,
    ).collect()
    p = {r.event_type: (round(r.sum_value, 3), r.min_user_id) for r in plain}
    s = {r.event_type: (round(r.sum_value, 3), r.min_user_id) for r in salted}
    assert p == s
