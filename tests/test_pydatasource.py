"""Custom Python DataSource (sources/pydatasource.py): partition
planning, deterministic content, and the writer commit protocol."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from synth_transform_spark.sources.pydatasource import (
    SyntheticEventsDataSource,
    synth_row,
)


def _registered(spark):
    spark.dataSource.register(SyntheticEventsDataSource)
    return spark


def test_reader_partitions_and_determinism(spark):
    df = (
        _registered(spark)
        .read.format("synthetic_events")
        .option("rows", "1000")
        .option("partitions", "4")
        .load()
    )
    assert df.count() == 1000
    assert [f.name for f in df.schema.fields] == [
        "event_id", "ts", "user_id", "event_type", "value",
    ]
    # real partition planning: 4 InputPartitions → 4 scan tasks
    assert df.select(F.spark_partition_id()).distinct().count() == 4
    # deterministic generation: row 7 matches the pure function
    got = df.filter("event_id = 7").collect()[0]
    want = synth_row(7)
    assert (got.event_id, got.user_id, got.event_type, got.value) == (
        want[0], want[2], want[3], want[4],
    )
    # two independent reads are identical
    again = (
        spark.read.format("synthetic_events")
        .option("rows", "1000").option("partitions", "8").load()
    )
    assert again.exceptAll(df).count() == 0 and df.exceptAll(again).count() == 0


def test_writer_commit_protocol(spark, tmp_path):
    out = str(tmp_path / "sink")
    df = (
        _registered(spark)
        .read.format("synthetic_events")
        .option("rows", "200").option("partitions", "3").load()
    )
    df.write.format("synthetic_events").option("path", out).mode("append").save()
    manifest = os.path.join(out, "_SUCCESS")
    assert os.path.exists(manifest)
    listed = [l.split("\t") for l in open(manifest).read().splitlines()]
    assert sum(int(n) for _, n in listed) == 200
    total = sum(1 for p, _ in listed for _ in open(p))
    assert total == 200


def test_stream_reader_offsets_and_replay(spark, tmp_path):
    """The streaming reader must deliver exactly the batch-read rows
    across micro-batches (offset bookkeeping). availableNow snapshots
    only the first prefetched batch for simple stream readers, so this
    drives a continuous trigger and waits for the drain."""
    import time

    _registered(spark)
    q = (
        spark.readStream.format("synthetic_events")
        .option("rows", "350").option("rows_per_batch", "100")
        .load()
        .writeStream.format("memory").queryName("pyds_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.table("pyds_stream").count() >= 350:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    got = spark.table("pyds_stream")
    assert got.count() == 350  # 4 micro-batches drained, no dupes/losses
    batch = (
        spark.read.format("synthetic_events")
        .option("rows", "350").option("partitions", "2").load()
    )
    assert got.exceptAll(batch).count() == 0 and batch.exceptAll(got).count() == 0
