"""Semantic unit tests for the round-5 additions (q247-q252): ACF algebra,
EWMA forecast bounds, calibration-bin identities, association-statistic
ranges, banded levenshtein completeness, HITS normalisation."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from synth_transform_spark.operators import graph
from synth_transform_spark.functions import fuzzy
from synth_transform_spark.plans import REGISTRY

from conftest import SF_DIR


def test_acf_bounds_and_shape(spark):
    rows = REGISTRY["q247_acf"].spark(spark, SF_DIR).collect()
    assert len(rows) == 5 * 7  # 5 types x lags 1..7
    for r in rows:
        # Cauchy-Schwarz: |r_k| <= 1 for the full-denominator estimator
        assert -1.0 <= r["acf"] <= 1.0, r
        assert r["n_days"] == 30


def test_ewma_matches_naive_recompute(spark):
    from synth_transform_spark.plans.events_queries import _EWMA_W
    from synth_transform_spark.sources.readers import load_table

    rows = REGISTRY["q248_ewma_control"].spark(spark, SF_DIR).collect()
    # first day per type has no history -> dropped: 29 rows per type
    assert len(rows) == 5 * 29

    ev = (
        load_table(spark, SF_DIR, "events")
        .groupBy("event_type", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"))
        .agg(
            F.floor(
                F.sum(F.round(F.col("value") * 10000.0).cast("long")).cast("double")
                / F.count(F.lit(1))
            ).cast("long").alias("x_int")
        )
        .collect()
    )
    series: dict[str, list] = {}
    for r in sorted(ev, key=lambda r: (r["event_type"], r["day"])):
        series.setdefault(r["event_type"], []).append((r["day"], r["x_int"]))
    expect = {}
    for et, days in series.items():
        for t in range(1, len(days)):
            num = den = 0
            for j, w in enumerate(_EWMA_W):
                if t - 1 - j >= 0:
                    num += days[t - 1 - j][1] * w
                    den += w
            expect[(et, days[t][0])] = (days[t][1], num // den)
    for r in rows:
        x_int, e_int = expect[(r["event_type"], r["day"])]
        assert r["daily_avg"] == x_int / 10000.0, r
        assert r["ewma"] == e_int / 10000.0, r
        assert r["dev"] == pytest.approx(r["daily_avg"] - r["ewma"], abs=1e-9)


def test_calibration_bins_sum_to_ece(spark):
    rows = REGISTRY["q249_calibration_ece"].spark(spark, SF_DIR).collect()
    assert {r["bin"] for r in rows} <= set(range(10))
    n_total = sum(r["n"] for r in rows)
    # ECE must equal the n-weighted mean of the per-bin gaps (4dp slack
    # because gap/ece are independently rounded)
    recon = sum(r["gap"] * r["n"] for r in rows) / n_total
    assert rows[0]["ece"] == pytest.approx(recon, abs=2e-4)
    eces = {r["ece"] for r in rows}
    assert len(eces) == 1  # replicated total is identical on every row


def test_association_stat_ranges(spark):
    row = REGISTRY["q250_categorical_association"].spark(spark, SF_DIR).collect()[0]
    assert row["dof"] == (5 - 1) * (4 - 1)
    assert row["chi2"] >= 0.0
    assert 0.0 <= row["cramers_v"] <= 1.0
    assert row["mi_nats"] >= 0.0


def test_levenshtein_band_pairs_complete_vs_bruteforce(spark):
    vals = [
        "small ring", "smalll ring", "small rng", "red widget",
        "red gadget", "blue bolt", "blu bolt", "totally different",
    ]
    df = spark.createDataFrame([(v,) for v in vals], ["name"])
    got = {
        (r["name_a"], r["name_b"], r["dist"])
        for r in fuzzy.levenshtein_band_pairs(df, "name", max_dist=2).collect()
    }

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    want = {
        (a, b, lev(a, b))
        for a in vals
        for b in vals
        if a < b and lev(a, b) <= 2
    }
    assert got == want


def test_hits_max_normalised(spark):
    edges = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (3, 12), (3, 10)], ["s", "d"]
    )
    rows = graph.hits(edges, n_iter=2).collect()
    hubs = {r["node"]: r["score"] for r in rows if r["side"] == "hub"}
    auths = {r["node"]: r["score"] for r in rows if r["side"] == "auth"}
    assert max(hubs.values()) == 1.0 and max(auths.values()) == 1.0
    assert all(0.0 < v <= 1.0 for v in list(hubs.values()) + list(auths.values()))
    # node 10 has the most in-links from the best hubs -> top authority
    assert auths[10] == 1.0
