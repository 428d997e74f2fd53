"""JDBC source/sink round-trip against embedded Derby (ships with Spark).

Stands in for the reference's MySQL databases (SURVEY §2.1 S1/S11): write a
table over JDBC, read it back partitioned, verify fidelity + parallel scan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from conftest import SF_DIR
from synth_transform_spark.sources.readers import load_jdbc, load_table, write_jdbc

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "testdb"
    return f"jdbc:derby:{db};create=true"


def test_jdbc_roundtrip_partitioned(spark, derby_url):
    cust = load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal"
    )
    write_jdbc(cust, derby_url, "customer", driver=DRIVER)

    hi = cust.agg(F.max("c_custkey")).first()[0]
    back = load_jdbc(
        spark,
        derby_url,
        "customer",
        partition_column="c_custkey",
        num_partitions=4,
        lower_bound=0,
        upper_bound=int(hi) + 1,
        driver=DRIVER,
    )
    assert back.rdd.getNumPartitions() == 4  # parallel ingest, not 1 connection
    a = sorted((r.c_custkey, r.c_name, round(r.c_acctbal, 2)) for r in back.collect())
    b = sorted((r.c_custkey, r.c_name, round(r.c_acctbal, 2)) for r in cust.collect())
    assert a == b


def test_jdbc_predicate_pushdown(spark, derby_url):
    back = load_jdbc(
        spark, derby_url, "customer", driver=DRIVER, predicate="c_nationkey = 3"
    )
    plan = back._jdf.queryExecution().executedPlan().toString()
    # the filter must reach the JDBC scan as a PushedFilters entry
    assert "PushedFilters" in plan and "c_nationkey" in plan
    direct = load_table(spark, SF_DIR, "customer").filter(F.col("c_nationkey") == 3)
    assert back.count() == direct.count()
