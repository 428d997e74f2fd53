"""bench.py self-description: plan fingerprints must be stable across
re-buildings of the same logical plan (expression ids differ every
time — canonicalisation must erase them) and must differ when the plan
shape genuinely changes."""

from __future__ import annotations

import sys
import pathlib

import pyspark.sql.functions as F

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from bench import plan_fingerprint  # noqa: E402

from conftest import SF_DIR  # noqa: E402


def _plan(spark, flag):
    from synth_transform_spark.sources.readers import load_table

    df = load_table(spark, SF_DIR, "lineitem")
    out = df.filter(F.col("l_quantity") > 10).groupBy("l_returnflag").agg(
        F.sum("l_extendedprice").alias("s")
    )
    if flag:
        out = out.filter(F.col("s") > 0)
    return out


def test_fingerprint_stable_across_rebuilds(spark):
    a = plan_fingerprint(_plan(spark, False))
    b = plan_fingerprint(_plan(spark, False))
    assert a == b
    assert len(a) == 12


def test_fingerprint_changes_with_plan_shape(spark):
    a = plan_fingerprint(_plan(spark, False))
    b = plan_fingerprint(_plan(spark, True))
    assert a != b


def test_fingerprint_on_registry_headline(spark):
    # a real headline query fingerprints deterministically
    from synth_transform_spark.plans import REGISTRY

    q = next(q for q in REGISTRY.values() if q.bench)
    a = plan_fingerprint(q.spark(spark, SF_DIR))
    b = plan_fingerprint(q.spark(spark, SF_DIR))
    assert a == b
