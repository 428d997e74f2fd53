"""Deterministic surrogate-ID assignment.

Reference: every ``Fill*Table`` step assigns ids from ``itertools.count(1)``
while iterating the 4 sources in round order (SURVEY.md §2.5 W1;
/root/reference/synth/etl.py:215-223, 348-354, 461-488). Two modes:

- ``assign_ids_window``   — correctness mode: ``row_number`` over a global
  ``Window.orderBy(...)``. Exact, but the window forces a single-partition
  sort — fine at test scale, not at 10^11 rows.
- ``assign_ids_scalable`` — scale mode: range-repartition by the order key,
  sort within partitions, then add per-partition cumulative offsets computed
  from partition counts (two passes, no global single-partition stage).
  Produces the identical dense 1..N numbering.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.types import LongType, StructField, StructType


def assign_ids_window(df: DataFrame, order_cols: list, id_name: str = "new_id") -> DataFrame:
    """Dense 1..N ids by global order. Single-partition sort — test scale."""
    w = Window.orderBy(*order_cols)
    return df.withColumn(id_name, F.row_number().over(w).cast("long"))


def assign_ids_scalable(df: DataFrame, order_cols: list[str], id_name: str = "new_id") -> DataFrame:
    """Dense 1..N ids by global order without a global sort bottleneck.

    1. ``repartitionByRange`` on the order key → partitions are ordered
       ranges (Spark samples the key distribution — handles skew).
    2. ``sortWithinPartitions`` → total order across partition index.
    3. size each partition, broadcast cumulative offsets, add local
       row_number within partition.

    The only driver-side data is one count per partition. ``with_pid`` is
    persisted BEFORE the size pass: ``repartitionByRange`` samples its
    boundaries per execution, and the size job and the final job are two
    executions — without pinning the computed partitions, boundary drift
    between them would corrupt the offsets (the same reason
    ``RDD.zipWithIndex`` materialises before its count pass). The persist
    is registered with ``caching.persist_tracked`` so hosts can release it
    after consuming the result; on a real multi-executor cluster pass
    ``checkpoint=True`` there instead — persist alone does not survive
    executor loss, and a recompute would resample the range boundaries
    (see caching.py docstring).
    """
    from ..caching import persist_tracked

    parted = df.repartitionByRange(*[F.col(c) for c in order_cols]).sortWithinPartitions(
        *order_cols
    )
    pid = F.spark_partition_id()
    with_pid = persist_tracked(parted.withColumn("_pid", pid))
    sizes = with_pid.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n")).collect()
    offsets = {}
    acc = 0
    for row in sorted(sizes, key=lambda r: r["_pid"]):
        offsets[row["_pid"]] = acc
        acc += row["_n"]
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()],
        StructType(
            [StructField("_pid", LongType()), StructField("_offset", LongType())]
        ),
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        with_pid.withColumn("_local", F.row_number().over(w).cast("long"))
        .join(F.broadcast(off_df), "_pid")
        .withColumn(id_name, F.col("_offset") + F.col("_local"))
        .drop("_pid", "_local", "_offset")
    )
