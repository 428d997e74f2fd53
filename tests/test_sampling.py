"""weighted_sample (operators/sampling.py): proportionality + determinism."""

from __future__ import annotations

import pyspark.sql.functions as F

from synth_transform_spark.operators.sampling import weighted_sample


def _pop(spark):
    # 60 heavy items (weight 50) among 540 light ones (weight 1), spread
    # over 3 strata by id; the md5-seeded draw is a fixed function of ids.
    return spark.range(600).select(
        (F.col("id") % 3).alias("stratum"),
        F.col("id").alias("item"),
        F.when(F.col("id") % 10 == 0, F.lit(50.0)).otherwise(F.lit(1.0)).alias("w"),
    )


def test_heavy_items_dominate_the_sample(spark):
    out = weighted_sample(_pop(spark), ["stratum"], "item", "w", k=10).collect()
    assert len(out) == 30  # k per stratum
    heavy = sum(1 for r in out if r["item"] % 10 == 0)
    # heavy items hold ~85% of the probability mass; with 30 draws the
    # deterministic md5 draw lands far above a uniform sample's ~3
    assert heavy >= 15


def test_rank_is_dense_and_bounded(spark):
    out = weighted_sample(_pop(spark), ["stratum"], "item", "w", k=7).collect()
    by_stratum: dict[int, list[int]] = {}
    for r in out:
        by_stratum.setdefault(r["stratum"], []).append(r["sample_rank"])
    assert all(sorted(v) == list(range(1, 8)) for v in by_stratum.values())


def test_draw_is_reproducible(spark):
    a = weighted_sample(_pop(spark), ["stratum"], "item", "w", k=10)
    b = weighted_sample(_pop(spark), ["stratum"], "item", "w", k=10)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_q237_bootstrap_ci_brackets_point_and_is_deterministic(spark):
    """The trimmed replica-mean interval must bracket the half-sample
    means' spread around the point estimate, and rerunning must be
    bit-identical (hash-seeded membership, no RNG)."""
    from synth_transform_spark.plans.analytics_queries import q237_bootstrap_ci

    sf = "/root/testdata/sf0.001"
    a = q237_bootstrap_ci(spark, sf).collect()[0]
    b = q237_bootstrap_ci(spark, sf).collect()[0]
    assert a == b
    assert a["n_replicas"] == 40
    assert a["ci_lo"] <= a["point_mean"] <= a["ci_hi"]
    assert a["ci_lo"] < a["ci_hi"]
