"""Randomized equivalence tests for the temporal join operators.

Each case generates a seeded random event set, runs the Spark operator,
and compares against a naive pandas reference — covering tie timestamps,
keys with no matches, and empty sides, which the single-oracle dataset
(q49/q50 on `events`) may not exercise.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from synth_transform_spark.operators import temporal


def _random_side(rng, n, n_keys, t_max):
    return pd.DataFrame(
        {
            "key": rng.integers(0, n_keys, n),
            "sec": rng.integers(0, t_max, n),
        }
    )


def _to_sdf(spark, pdf, with_id=False, name="x"):
    pdf = pdf.copy()
    pdf["ts"] = pd.to_datetime(pdf["sec"], unit="s")
    if with_id:
        pdf[f"{name}_id"] = np.arange(len(pdf), dtype="int64")
    return spark.createDataFrame(pdf.drop(columns=["sec"]))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_asof_join_matches_naive(spark, seed):
    rng = np.random.default_rng(seed)
    lp = _random_side(rng, 120, 8, 5000)
    rp = _random_side(rng, 90, 8, 5000)
    left = _to_sdf(spark, lp, with_id=True, name="l")
    right = _to_sdf(spark, rp)

    out = temporal.asof_join(left, right, key="key").toPandas()
    got = {
        int(r.l_id): (None if pd.isnull(r.asof_ts) else int(r.asof_ts.timestamp()))
        for r in out.itertuples()
    }

    expected = {}
    for i, (k, s) in enumerate(zip(lp.key, lp.sec)):
        prior = rp.sec[(rp.key == k) & (rp.sec <= s)]
        expected[i] = int(prior.max()) if len(prior) else None
    assert got == expected
    assert len(out) == len(lp)  # left-outer: every left row exactly once


@pytest.mark.parametrize("seed", [0, 1])
def test_range_join_count_matches_naive(spark, seed):
    rng = np.random.default_rng(100 + seed)
    lp = _random_side(rng, 100, 6, 3000)
    rp = _random_side(rng, 150, 6, 3000)
    w = 137  # deliberately not a divisor of anything
    left = _to_sdf(spark, lp, with_id=True, name="l")
    right = _to_sdf(spark, rp)

    out = temporal.range_join_count(left, right, key="key", window_sec=w).toPandas()
    got = dict(zip(out.l_id.astype(int), out.n_in_range.astype(int)))

    expected = {
        i: int(((rp.key == k) & ((rp.sec - s).abs() <= w)).sum())
        for i, (k, s) in enumerate(zip(lp.key, lp.sec))
    }
    assert got == expected


def test_asof_join_empty_right_keeps_all_left_rows(spark):
    rng = np.random.default_rng(7)
    lp = _random_side(rng, 20, 3, 100)
    left = _to_sdf(spark, lp, with_id=True, name="l")
    right = spark.createDataFrame([], "key bigint, ts timestamp")
    out = temporal.asof_join(left, right, key="key").toPandas()
    assert len(out) == 20 and out.asof_ts.isnull().all()


def test_cooldown_alerts_recurrence(spark):
    """Crafted sequence: value-qualified events at t=0, 600, 2000, 2100,
    4000 with 1800 s cooldown fire at 0, 2000, 4000 — the 600 and 2100
    candidates are suppressed by the PREVIOUS FIRED alert, which is the
    semantics a plain window cannot express."""
    import datetime as dt

    from synth_transform_spark.operators.temporal import cooldown_alerts

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=s), 1, "click", v, "{}")
        for i, (s, v) in enumerate(
            [(0, 20.0), (600, 20.0), (2000, 20.0), (2100, 20.0), (4000, 20.0),
             (300, 1.0)]  # below threshold: never a candidate
        )
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = sorted(r.event_id for r in cooldown_alerts(events).collect())
    assert got == [0, 2, 4]
