"""HLL sketch (operators/sketches.py): accuracy, determinism, mergeability."""

from __future__ import annotations

import pyspark.sql.functions as F

from synth_transform_spark.operators.sketches import hll_distinct, hll_registers


def test_error_within_sketch_bound(spark):
    # 1.04/sqrt(256) ≈ 6.5 % standard error; assert a generous 3-sigma 20 %
    # band on a known cardinality (deterministic — no flake margin needed,
    # the "random" input is md5).
    df = spark.range(5000).select(
        F.lit("g").alias("g"), (F.col("id") % 3000).alias("v")
    )
    [(est,)] = hll_distinct(df, ["g"], "v").select("hll_distinct").collect()
    assert abs(est - 3000) / 3000 < 0.20


def test_duplicates_do_not_move_the_estimate(spark):
    base = spark.range(1000).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    dup = base.union(base).union(base)
    [(e1,)] = hll_distinct(base, ["g"], "v").select("hll_distinct").collect()
    [(e3,)] = hll_distinct(dup, ["g"], "v").select("hll_distinct").collect()
    assert e1 == e3  # registers are max-based: insert-count invariant


def test_registers_merge_by_max(spark):
    # Sketch of a union == register-wise max of the parts' sketches — the
    # property that makes HLL a partial-agg / continuous-rollup primitive.
    left = spark.range(0, 2000).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    right = spark.range(1500, 3500).select(
        F.lit("g").alias("g"), F.col("id").alias("v")
    )
    whole = hll_registers(left.union(right), ["g"], "v")
    merged = (
        hll_registers(left, ["g"], "v")
        .union(hll_registers(right, ["g"], "v"))
        .groupBy("g", "bucket")
        .agg(F.max("r").alias("r"))
    )
    assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))
