"""Observation-based side-band metrics: values must equal a literal
recomputation, ride a single action, and gate on violations."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pytest

from synth_transform_spark.operators.observability import (
    assert_clean,
    dq_metrics,
    observe_stage,
    violations,
)
from synth_transform_spark.sources.readers import load_table

from conftest import SF_DIR


def test_metrics_match_literal_recount(spark):
    ev = load_table(spark, SF_DIR, "events")
    observed, obs = observe_stage(
        ev,
        "events_ingest",
        dq_metrics(
            not_null=["user_id", "event_type"],
            positive=["value"],
            extra={"n_purchases": F.sum((F.col("event_type") == "purchase").cast("long"))},
        ),
    )
    n = observed.count()  # the ONE action; metrics ride it
    got = obs.get
    pdf = pd.read_parquet(f"{SF_DIR}/events.parquet")
    assert got["n_rows"] == n == len(pdf)
    assert got["nulls_user_id"] == int(pdf["user_id"].isna().sum())
    assert got["nulls_event_type"] == int(pdf["event_type"].isna().sum())
    assert got["nonpos_value"] == int((pdf["value"] <= 0).sum())
    assert got["n_purchases"] == int((pdf["event_type"] == "purchase").sum())


def test_metrics_survive_downstream_transforms(spark):
    """Observing an upstream stage still counts the upstream rows even
    when the action runs on a filtered downstream frame."""
    ev = load_table(spark, SF_DIR, "events")
    observed, obs = observe_stage(ev, "pre_filter", dq_metrics())
    kept = observed.filter(F.col("event_type") == "purchase").count()
    total = obs.get["n_rows"]
    assert kept < total
    pdf = pd.read_parquet(f"{SF_DIR}/events.parquet")
    assert total == len(pdf)
    assert kept == int((pdf["event_type"] == "purchase").sum())


def test_gate_raises_on_violations(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, -5.0)], "id long, v double"
    )
    observed, obs = observe_stage(
        df, "gate", dq_metrics(not_null=["v"], positive=["v"])
    )
    observed.count()
    got = obs.get
    assert violations(got) == {"nulls_v": 1, "nonpos_v": 2}
    with pytest.raises(ValueError, match="nulls_v"):
        assert_clean(got)


def test_gate_passes_clean(spark):
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "id long, v double")
    observed, obs = observe_stage(
        df, "gate_ok", dq_metrics(not_null=["v"], positive=["v"])
    )
    observed.count()
    assert_clean(obs.get)  # no raise
    assert violations(obs.get) == {}
