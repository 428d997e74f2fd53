"""Z-order layout (sources/zorder.py): write → box-query pruning proof.

The q90 key is only useful if the LAYOUT it feeds actually prunes: these
tests write a Z-ordered table and assert (1) the box query reads fewer
files than the table has (directory pruning really happened), (2) the
pruned read returns exactly the rows a full-scan filter returns (pruning
is sound — zbuckets_for_box misses nothing)."""

from __future__ import annotations

import pyspark.sql.functions as F

from synth_transform_spark.sources import zorder


def _table(spark):
    # x spans 0..9999, y spans 0..4999 → multiple bucket prefixes per dim
    return spark.range(20000).select(
        F.col("id").alias("rid"),
        ((F.col("id") * 7) % 10000).alias("x"),
        ((F.col("id") * 13) % 5000).alias("y"),
    )


def test_box_query_prunes_files_and_is_exact(spark, tmp_path):
    import os

    path = str(tmp_path / "zt")
    df = _table(spark)
    zorder.write_zordered(df, path, "x", "y")

    # directory pruning: the box's bucket list must be a strict subset of
    # the bucket directories on disk (inputFiles() reflects the unpruned
    # relation, so the file count is asserted at the listing level; the
    # PartitionFilters plan assertion below proves Spark applies it)
    on_disk = {d for d in os.listdir(path) if d.startswith("zbucket=")}
    wanted = {
        f"zbucket={b}"
        for b in zorder.zbuckets_for_box(100, 1500, 200, 1800)
    } & on_disk
    assert 0 < len(wanted) < len(on_disk)

    got = zorder.read_box(spark, path, "x", "y", 100, 1500, 200, 1800)

    want = df.filter(
        (F.col("x") >= 100) & (F.col("x") <= 1500)
        & (F.col("y") >= 200) & (F.col("y") <= 1800)
    )
    assert got.count() == want.count()
    assert (
        got.select("rid").exceptAll(want.select("rid")).count() == 0
        and want.select("rid").exceptAll(got.select("rid")).count() == 0
    )


def test_partition_filter_appears_in_plan(spark, tmp_path):
    path = str(tmp_path / "zt2")
    zorder.write_zordered(_table(spark), path, "x", "y")
    plan = (
        zorder.read_box(spark, path, "x", "y", 0, 999, 0, 999)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "zbucket" in plan


def test_bucket_enumeration_covers_every_point(spark):
    # any (x, y) inside the box must land in an enumerated bucket
    buckets = set(zorder.zbuckets_for_box(3000, 9000, 1000, 4500))
    for x, y in [(3000, 1000), (9000, 4500), (5000, 2048), (4095, 4096)]:
        zb = zorder._interleave_prefix(x >> 11, y >> 11)
        assert zb in buckets, (x, y)


def test_out_of_domain_coordinates_are_rejected(spark, tmp_path):
    import pytest

    df = spark.createDataFrame([(1, 70000, 5)], ["rid", "x", "y"])  # x >= 2^16
    with pytest.raises(ValueError, match="outside"):
        zorder.write_zordered(df, str(tmp_path / "bad"), "x", "y")
    neg = spark.createDataFrame([(1, -3, 5)], ["rid", "x", "y"])
    with pytest.raises(ValueError, match="outside"):
        zorder.write_zordered(neg, str(tmp_path / "bad2"), "x", "y")


def test_read_box_rejects_wrapped_bounds(spark, tmp_path):
    import pytest

    path = str(tmp_path / "zt3")
    zorder.write_zordered(_table(spark), path, "x", "y")
    with pytest.raises(ValueError, match="bounds"):
        zorder.read_box(spark, path, "x", "y", 60000, 70000, 0, 10)
