"""Bucketed co-located joins: the write-once / shuffle-never layout must
actually elide the Exchange, produce exactly n files per table, and return
the same rows as the shuffle join it replaces."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from conftest import SF_DIR
from synth_transform_spark.sources.bucketed import bucketed_join, write_bucketed
from synth_transform_spark.sources.readers import load_table


@pytest.fixture
def no_broadcast(spark):
    """Force SMJ so the Exchange assertion is about bucketing, not size."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange_and_matches_shuffle_join(
    spark, tmp_path, no_broadcast
):
    orders = load_table(spark, SF_DIR, "orders")
    lineitem = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    write_bucketed(orders, "b_orders", "o_orderkey", 8, path=f"{tmp_path}/bo")
    write_bucketed(lineitem, "b_lineitem", "l_orderkey", 8, path=f"{tmp_path}/bl")
    try:
        joined = bucketed_join(
            spark, "b_orders", "b_lineitem", ("o_orderkey", "l_orderkey")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # co-located: no shuffle
        # same rows as the plain shuffle join over the raw parquet
        want = orders.join(
            lineitem, F.col("o_orderkey") == F.col("l_orderkey")
        ).count()
        assert joined.count() == want
        # file-per-bucket layout (writer repartitions first): n files, not
        # tasks × buckets
        files = [f for f in os.listdir(f"{tmp_path}/bo") if f.endswith(".parquet")]
        assert len(files) == 8
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_mismatched_bucket_counts_fall_back_to_shuffle(spark, tmp_path, no_broadcast):
    orders = load_table(spark, SF_DIR, "orders")
    customer = load_table(spark, SF_DIR, "customer")
    write_bucketed(orders, "b_o8", "o_custkey", 8, path=f"{tmp_path}/o8")
    write_bucketed(customer, "b_c4", "c_custkey", 4, path=f"{tmp_path}/c4")
    try:
        joined = bucketed_join(spark, "b_o8", "b_c4", ("o_custkey", "c_custkey"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # documented contract: mismatched counts mean at least one side
        # re-shuffles — the join still works, just not exchange-free
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" in plan
        n = joined.count()
        want = orders.join(
            customer, F.col("o_custkey") == F.col("c_custkey")
        ).count()
        assert n == want
    finally:
        spark.sql("DROP TABLE IF EXISTS b_o8")
        spark.sql("DROP TABLE IF EXISTS b_c4")
