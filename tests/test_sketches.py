"""HLL sketch (operators/sketches.py): accuracy, determinism, mergeability."""

from __future__ import annotations

import pyspark.sql.functions as F

from conftest import SF_DIR
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


def test_hll_union_merge_equals_union_sketch(spark):
    """Register-wise max merge must give EXACTLY the sketch of the unioned
    stream — the defining mergeability property (not approximately: the
    registers are identical by construction)."""
    import pyspark.sql.functions as F

    from synth_transform_spark.operators import sketches
    from synth_transform_spark.sources.readers import load_table

    ev = load_table(spark, SF_DIR, "events").withColumn(
        "_v",
        F.concat_ws(":", F.col("user_id").cast("string"), F.to_date("ts").cast("string")),
    )
    two = ev.filter(F.col("event_type").isin("click", "view"))
    merged = (
        sketches.hll_set_estimates(two, "event_type", "_v")
        .filter((F.col("key_a") == "click") & (F.col("key_b") == "view"))
        .select("est_union")
        .collect()[0][0]
    )
    direct = (
        sketches.hll_distinct(two.withColumn("g", F.lit(1)), ["g"], "_v")
        .collect()[0]["hll_distinct"]
    )
    assert merged == direct


def test_hll_intersection_accuracy(spark):
    """Inclusion-exclusion intersections on the sf events corpus: within
    ±50% of exact (m=256 error compounds across three estimates — loose
    bound by design; measured max ~35% on the shipped corpora)."""
    import pyspark.sql.functions as F

    from synth_transform_spark.plans import REGISTRY
    from synth_transform_spark.sources.readers import load_table

    est = REGISTRY["q133_hll_set_ops"].spark(spark, SF_DIR).toPandas()
    ev = (
        load_table(spark, SF_DIR, "events")
        .select(
            "event_type",
            F.concat_ws(
                ":", F.col("user_id").cast("string"), F.to_date("ts").cast("string")
            ).alias("v"),
        )
        .distinct()
    )
    a = ev.select(F.col("event_type").alias("key_a"), "v")
    b = ev.select(F.col("event_type").alias("key_b"), "v")
    exact = (
        a.join(b, "v")
        .filter(F.col("key_a") < F.col("key_b"))
        .groupBy("key_a", "key_b")
        .count()
        .toPandas()
    )
    joined = est.merge(exact, on=["key_a", "key_b"])
    assert len(joined) == len(est)
    rel = ((joined.est_intersection - joined["count"]) / joined["count"]).abs()
    assert rel.max() <= 0.5


def test_kmv_intersection_beats_hll_inclusion_exclusion(spark):
    """The whole point of the theta/KMV sketch (q142) next to HLL (q133):
    direct-sample Jaccard intersections don't compound three estimates.
    Measured on sf0.01 (k=256 vs m=256): KMV max rel err 0.225 / mean
    0.095 vs HLL 0.342 / 0.141. Pin the ordering on the mean plus an
    absolute ceiling with regeneration margin."""
    import pyspark.sql.functions as F

    from synth_transform_spark.plans import REGISTRY
    from synth_transform_spark.sources.readers import load_table

    ev = (
        load_table(spark, SF_DIR, "events")
        .select(
            "event_type",
            F.concat_ws(
                ":", F.col("user_id").cast("string"), F.to_date("ts").cast("string")
            ).alias("v"),
        )
        .distinct()
    )
    a = ev.select(F.col("event_type").alias("key_a"), "v")
    b = ev.select(F.col("event_type").alias("key_b"), "v")
    exact = (
        a.join(b, "v")
        .filter(F.col("key_a") < F.col("key_b"))
        .groupBy("key_a", "key_b")
        .count()
        .toPandas()
    )

    def errs(name):
        est = REGISTRY[name].spark(spark, SF_DIR).toPandas()
        j = est.merge(exact, on=["key_a", "key_b"])
        assert len(j) == len(est)
        return ((j.est_intersection - j["count"]) / j["count"]).abs()

    kmv, hll = errs("q142_kmv_set_ops"), errs("q133_hll_set_ops")
    assert kmv.mean() <= hll.mean()
    assert kmv.max() <= 0.35
