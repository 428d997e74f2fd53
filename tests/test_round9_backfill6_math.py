"""Round-9 backfill, part 6 (last formula-bearing waivers): Kaplan-Meier
product-limit + RMST on the user life table, Brown double exponential
smoothing, and hierarchical forecast reconciliation — each rebuilt as a
sequential pure-python recursion/walk (vs the engines' window/self-join
algebra). Leaves the waiver list to operator-rollups only.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from conftest import SF_DIR


def _rnd(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else int(math.ceil(v - 0.5))


def _run(spark, name):
    from synth_transform_spark.plans import REGISTRY

    return REGISTRY[name].spark(spark, SF_DIR).toPandas()


def _events():
    return pd.read_parquet(SF_DIR + "/events.parquet")


def _life_table(unit_sec, censor_sec):
    """(cohort -> sorted [(dur, n_at_dur, churns_at_dur)]) walk."""
    ev = _events()
    u = ev.groupby("user_id").agg(
        first=("ts", "min"),
        last=("ts", "max"),
        reg=("event_type", lambda s: int((s == "signup").any())),
    )
    max_ts = ev["ts"].max()
    u["cohort"] = np.where(u["reg"] > 0, "registered", "guest")
    u["dur"] = (
        (u["last"] - u["first"]) // pd.Timedelta(seconds=1) // unit_sec
    ).astype("int64")
    u["churn"] = (
        u["last"] <= max_ts - pd.Timedelta(seconds=censor_sec)
    ).astype(int)
    tables = {}
    for cohort, g in u.groupby("cohort"):
        steps = (
            g.groupby("dur")
            .agg(n_all=("churn", "size"), d=("churn", "sum"))
            .sort_index()
        )
        tables[cohort] = steps
    return tables, u


def _km_curve(steps):
    """KM product-limit with the 1e6-frozen log trick: dur -> (at_risk,
    d, survival-after)."""
    total = int(steps["n_all"].sum())
    out = []
    at_risk = total
    li_cum = 0
    for dur, row in steps.iterrows():
        d, n_all = int(row["d"]), int(row["n_all"])
        if d > 0:
            if d < at_risk:
                li = _rnd(1e6 * math.log(1.0 - d / at_risk))
            else:
                li = -100000000
            li_cum += li
            out.append((dur, at_risk, d, math.exp(li_cum / 1e6)))
        at_risk -= n_all
    return out


def test_km_survival_matches_walk(spark):
    df = _run(spark, "q241_km_survival").set_index(["cohort", "dur_hours"])
    tables, _ = _life_table(3600, 12 * 3600)
    for cohort, steps in tables.items():
        for dur, at_risk, d, s in _km_curve(steps):
            row = df.loc[(cohort, dur)]
            assert int(row["at_risk"]) == at_risk, (cohort, dur)
            assert int(row["churns"]) == d
            assert row["survival"] == pytest.approx(s, abs=2e-4)
    assert len(df) == sum(len(_km_curve(s)) for s in tables.values())


def test_rmst_matches_rectangle_walk(spark):
    df = _run(spark, "q442_rmst").set_index("cohort")
    tables, u = _life_table(86400, 24 * 3600)
    for cohort, steps in tables.items():
        curve = [(d, s) for d, _, _, s in _km_curve(steps) if d <= 30]
        area_u, prev_dur, s_prev = 0, 0, 1.0
        for dur, s_after in curve:
            area_u += _rnd(1e6 * s_prev * (dur - prev_dur))
            prev_dur, s_prev = dur, s_after
        rmst = (area_u + _rnd(1e6 * s_prev * (30 - prev_dur))) / 1e6
        row = df.loc[cohort]
        assert int(row["n_users"]) == int((u["cohort"] == cohort).sum())
        assert row["rmst_30"] == pytest.approx(rmst, abs=2e-3)
        assert row["surv_30"] == pytest.approx(s_prev, abs=2e-4)


def test_brown_double_smoothing_matches_recursion(spark):
    df = _run(spark, "q393_brown_double_smoothing").sort_values("t")
    ev = _events()
    daily = ev.groupby(ev["ts"].dt.floor("D")).size().sort_index()
    x = daily.to_numpy(float)
    n = len(x)
    # dyadic-decay "SES" as the engines define it: weight 0.5^(t-1) on
    # the first point, 0.5^(t-b+1) on later ones — frozen to 1e6 ints
    s1 = []
    for t in range(1, n + 1):
        tot = 0
        for b in range(1, t + 1):
            w = 0.5 ** (t - 1) if b == 1 else 0.5 ** (t - b + 1)
            tot += _rnd(1e6 * x[b - 1] * w)
        s1.append(tot)
    s2 = []
    for m in range(1, n + 1):
        tot = 0
        for b in range(1, m + 1):
            w = 0.5 ** (m - 1) if b == 1 else 0.5 ** (m - b + 1)
            tot += _rnd(s1[b - 1] * w)
        s2.append(tot)
    for _, row in df.iterrows():
        t = int(row["t"])
        level = _rnd((2 * s1[t - 1] - s2[t - 1]) / 100.0) / 1e4
        trend = _rnd((s1[t - 1] - s2[t - 1]) / 100.0) / 1e4
        fcast = _rnd((3 * s1[t - 1] - 2 * s2[t - 1]) / 100.0) / 1e4
        err = _rnd(
            (x[t - 1] * 1e6 - (3 * s1[t - 2] - 2 * s2[t - 2])) / 100.0
        ) / 1e4
        assert row["level"] == pytest.approx(level, abs=2e-4), t
        assert row["trend"] == pytest.approx(trend, abs=2e-4), t
        assert row["forecast"] == pytest.approx(fcast, abs=2e-4), t
        assert row["err"] == pytest.approx(err, abs=2e-4), t


def test_forecast_reconciliation_matches_walk(spark):
    df = _run(spark, "q445_forecast_reconciliation").set_index("segment")
    od = pd.read_parquet(SF_DIR + "/orders.parquet")
    cu = pd.read_parquet(SF_DIR + "/customer.parquet")
    j = od.merge(cu, left_on="o_custkey", right_on="c_custkey")
    j["cents"] = (100.0 * j["o_totalprice"]).round().astype("int64")
    maxd = j["o_orderdate"].max()
    days = [maxd - pd.Timedelta(days=28 - t) for t in range(1, 29)]
    dly = j.groupby(["c_mktsegment", "o_orderdate"])["cents"].sum()

    def ses(series):
        tot = 0
        for t, xu in enumerate(series, 1):
            w = 0.5 ** (28 - 1) if t == 1 else 0.5 ** (28 - t + 1)
            tot += _rnd(1e6 * xu * w)
        return tot

    segs = sorted(j["c_mktsegment"].unique())
    per = {
        s: [int(dly.get((s, d), 0)) for d in days] for s in segs
    }
    fu = {s: ses(xs) for s, xs in per.items()}
    hist = {s: sum(xs) for s, xs in per.items()}
    hist_tot = sum(hist.values())
    bu_total = sum(fu.values())
    tot_series = [sum(per[s][i] for s in segs) for i in range(28)]
    ftu = ses(tot_series)
    for s in segs:
        row = df.loc[s]
        f_base = fu[s] / 1e8
        f_td = ftu / 1e8 * (hist[s] / hist_tot)
        assert row["f_base"] == pytest.approx(f_base, abs=2e-3)
        assert row["f_topdown"] == pytest.approx(f_td, abs=2e-3)
        assert row["td_gap"] == pytest.approx(f_base - f_td, abs=3e-3)
        assert row["bu_total"] == pytest.approx(bu_total / 1e8, abs=2e-3)
        assert row["f_total"] == pytest.approx(ftu / 1e8, abs=2e-3)
