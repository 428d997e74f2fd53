"""Round-9 backfill, part 3: FORMULA(low)/ORDER-STAT waivers whose
recomputation is cheap enough that a waiver is no longer justified —
ten more independent recomputations, shrinking the inventory's waiver
list further. Pure pandas/numpy/python third implementations.
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


# ---------------------------------------------------------------------------
# q170: per-user Shannon entropy over event types.
# ---------------------------------------------------------------------------
def test_user_entropy_matches_counters(spark):
    from collections import Counter

    df = _run(spark, "q170_user_entropy").set_index("user_id")
    for uid, g in _events().groupby("user_id"):
        c = Counter(g["event_type"])
        n = sum(c.values())
        h = -sum(k / n * math.log(k / n) for k in c.values())
        row = df.loc[uid]
        assert int(row["n_types"]) == len(c)
        assert row["entropy"] == pytest.approx(h, abs=2e-4)
        if len(c) > 1:
            assert row["norm_entropy"] == pytest.approx(
                h / math.log(len(c)), abs=2e-3
            )
        else:
            assert pd.isna(row["norm_entropy"])


# ---------------------------------------------------------------------------
# q309: Markov entropy rate of the per-user event walk.
# ---------------------------------------------------------------------------
def test_entropy_rate_matches_counters(spark):
    from collections import Counter, defaultdict

    df = _run(spark, "q309_entropy_rate").set_index("state")
    ev = _events().sort_values(["user_id", "ts", "event_id"])
    trans = Counter()
    for _, g in ev.groupby("user_id"):
        seq = g["event_type"].to_list()
        for a, b in zip(seq, seq[1:]):
            trans[(a, b)] += 1
    out = defaultdict(Counter)
    for (a, b), c in trans.items():
        out[a][b] = c
    total_n = sum(trans.values())
    total_h = 0.0
    for a, cs in out.items():
        n = sum(cs.values())
        h = -sum(c / n * math.log(c / n) for c in cs.values())
        row = df.loc[a]
        assert int(row["n_out"]) == n
        assert row["h_conditional"] == pytest.approx(h, abs=2e-4), a
        total_h += n * h
    assert df["entropy_rate"].iloc[0] == pytest.approx(
        total_h / total_n, abs=2e-4
    )


# ---------------------------------------------------------------------------
# q354: daily-count dispersion (variance/mean) per event type.
# ---------------------------------------------------------------------------
def test_dispersion_test_matches_numpy(spark):
    df = _run(spark, "q354_dispersion_test").set_index("event_type")
    ev = _events()
    daily = ev.groupby([ev["event_type"], ev["ts"].dt.floor("D")]).size()
    for et, g in daily.groupby(level=0):
        x = g.to_numpy(float)
        n = len(x)
        mean, var = x.mean(), x.var(ddof=1)
        disp = var * (n - 1) / mean
        z = (disp - (n - 1)) / math.sqrt(2.0 * (n - 1))
        row = df.loc[et]
        assert int(row["n"]) == n
        assert row["mean_daily"] == pytest.approx(mean, abs=1e-3)
        assert row["var_daily"] == pytest.approx(var, abs=1e-3)
        assert row["dispersion"] == pytest.approx(disp, rel=1e-4, abs=1e-2)
        assert row["z"] == pytest.approx(z, abs=2e-3)
        assert int(row["overdispersed"]) == int(z > 2.0)


# ---------------------------------------------------------------------------
# q357: per-dimension median-split Gini impurity top-10.
# ---------------------------------------------------------------------------
def test_gini_stump_scan_matches_numpy(spark):
    from collections import Counter

    df = _run(spark, "q357_gini_stump_scan")
    em = pd.read_parquet(SF_DIR + "/embeddings.parquet")
    mat = np.round(1e6 * np.stack(em["embedding"].to_numpy()).astype(float))
    labels = em["label"].to_numpy()
    ginis = []
    for d in range(mat.shape[1]):
        v = mat[:, d]
        thr = np.quantile(v, 0.5, method="linear")
        impur = 0.0
        n = len(v)
        for side_mask in (v <= thr, v > thr):
            ns = int(side_mask.sum())
            if ns == 0:
                continue
            sc2 = sum(c * c for c in Counter(labels[side_mask]).values())
            impur += ns - sc2 / ns
        ginis.append((round(impur / n, 4), d + 1))
    want = sorted(ginis)[:10]
    assert len(df) == 10
    for (_, row), (g, d) in zip(df.iterrows(), want):
        assert int(row["dim"]) == d
        assert row["gini_split"] == pytest.approx(g, abs=2e-4)


# ---------------------------------------------------------------------------
# q362: 3-voter anomaly ensemble (z / MAD / IQR) on daily counts.
# ---------------------------------------------------------------------------
def test_anomaly_ensemble_matches_voters(spark):
    df = _run(spark, "q362_anomaly_ensemble")
    ev = _events()
    daily = ev.groupby([ev["event_type"], ev["ts"].dt.floor("D")]).size()
    want = {}
    for et, g in daily.groupby(level=0):
        x = g.to_numpy(float)
        mean, sd = x.mean(), x.std(ddof=1)
        med = np.quantile(x, 0.5, method="linear")
        q1 = np.quantile(x, 0.25, method="linear")
        q3 = np.quantile(x, 0.75, method="linear")
        mad = np.quantile(np.abs(x - med), 0.5, method="linear")
        for (_, day), xv in g.items():
            v_z = int(_rnd(1e4 * abs(xv - mean) / sd) > 20000)
            v_mad = int(
                _rnd(1e4 * abs(xv - med)) > _rnd(1e4 * 3.0 * 1.4826 * mad)
            )
            v_iqr = int(
                _rnd(1e4 * xv) < _rnd(1e4 * (q1 - 1.5 * (q3 - q1)))
                or _rnd(1e4 * xv) > _rnd(1e4 * (q3 + 1.5 * (q3 - q1)))
            )
            if v_z + v_mad + v_iqr >= 1:
                want[(et, str(day.date()))] = (
                    int(xv),
                    v_z,
                    v_mad,
                    v_iqr,
                    int(v_z + v_mad + v_iqr >= 2),
                )
    got = {
        (r["event_type"], r["day"]): (
            int(r["x"]),
            int(r["v_z"]),
            int(r["v_mad"]),
            int(r["v_iqr"]),
            int(r["is_anomaly"]),
        )
        for _, r in df.iterrows()
    }
    assert got == want


# ---------------------------------------------------------------------------
# q381: inter-event gap burstiness + memory coefficient per type.
# ---------------------------------------------------------------------------
def test_burstiness_matches_numpy(spark):
    df = _run(spark, "q381_burstiness").set_index("event_type")
    ev = _events()
    ev["sec"] = (
        (ev["ts"] - pd.Timestamp("1970-01-01")) // pd.Timedelta(seconds=1)
    ).astype("int64")
    for et, g in ev.groupby("event_type"):
        g = g.sort_values(["sec", "event_id"])
        sec = g["sec"].to_numpy()
        tau = np.diff(sec).astype(float)
        mu, sd = tau.mean(), tau.std()  # population
        b = (sd - mu) / (sd + mu)
        mem = np.corrcoef(tau[:-1], tau[1:])[0, 1]
        row = df.loc[et]
        assert int(row["n"]) == len(tau)
        assert row["mean_gap_sec"] == pytest.approx(mu, abs=1e-3)
        assert row["burstiness"] == pytest.approx(b, abs=2e-4)
        assert row["memory_coef"] == pytest.approx(mem, abs=2e-4)


# ---------------------------------------------------------------------------
# q418: 2-state burst HMM segmentation — pure-python forward/backward
# min-cost recursion over the same 1e6-frozen costs.
# ---------------------------------------------------------------------------
def test_burst_detection_matches_python_dp(spark):
    df = _run(spark, "q418_burst_detection").sort_values("t")
    ev = _events()
    day = ev["ts"].dt.floor("D")
    daily = (
        ev.assign(p=(ev["event_type"] == "purchase").astype(int))
        .groupby(day)
        .agg(r=("p", "sum"), d=("p", "size"))
        .sort_index()
    )
    rr, dd, tt = daily["r"].sum(), daily["d"].sum(), len(daily)
    p0, p1 = rr / dd, 3.0 * rr / dd
    gam = _rnd(1e6 * math.log(tt))
    c0 = [
        _rnd(-1e6 * (r * math.log(p0) + (d - r) * math.log(1 - p0)))
        for r, d in zip(daily["r"], daily["d"])
    ]
    c1 = [
        _rnd(-1e6 * (r * math.log(p1) + (d - r) * math.log(1 - p1)))
        for r, d in zip(daily["r"], daily["d"])
    ]
    f0, f1 = [c0[0]], [c1[0] + gam]
    for t in range(1, tt):
        p0f, p1f = f0[-1], f1[-1]  # previous row BEFORE appending
        f0.append(c0[t] + min(p0f, p1f))
        f1.append(c1[t] + min(p1f, p0f + gam))
    b0, b1 = [0] * tt, [0] * tt
    for t in range(tt - 2, -1, -1):
        b0[t] = min(c0[t + 1] + b0[t + 1], gam + c1[t + 1] + b1[t + 1])
        b1[t] = min(c1[t + 1] + b1[t + 1], c0[t + 1] + b0[t + 1])
    assert list(df["t"]) == list(range(1, tt + 1))
    for i, (_, row) in enumerate(df.iterrows()):
        burst = int(f1[i] + b1[i] < f0[i] + b0[i])
        margin = ((f0[i] + b0[i]) - (f1[i] + b1[i])) / 1e6
        assert int(row["burst"]) == burst, i
        assert row["burst_margin"] == pytest.approx(margin, abs=2e-4)


# ---------------------------------------------------------------------------
# q419: Lorenz decile table — per-user expansion instead of the
# frequency-domain proration the engines share.
# ---------------------------------------------------------------------------
def test_lorenz_table_matches_user_expansion(spark):
    df = _run(spark, "q419_lorenz_table").set_index("decile")
    ev = _events()
    spend = (
        ev.assign(
            c=np.where(
                ev["event_type"] == "purchase",
                (100.0 * ev["value"]).round(),
                0.0,
            ).astype("int64")
        )
        .groupby("user_id")["c"]
        .sum()
        .sort_values(kind="stable")
        .to_numpy()
    )
    users = len(spend)
    mass = spend.sum()
    cum = 0
    for dec in range(1, 11):
        lo = ((dec - 1) * users + 9) // 10
        hi = (dec * users + 9) // 10
        seg = spend[lo:hi]
        cum += seg.sum()
        row = df.loc[dec]
        assert int(row["n_users"]) == len(seg)
        assert row["spend"] == pytest.approx(seg.sum() / 100.0, abs=1e-3)
        assert row["spend_share"] == pytest.approx(
            seg.sum() / mass, abs=2e-4
        )
        assert row["cum_share"] == pytest.approx(cum / mass, abs=2e-4)


# ---------------------------------------------------------------------------
# q424: supplier revenue HHI per nation.
# ---------------------------------------------------------------------------
def test_supplier_hhi_matches_numpy(spark):
    df = _run(spark, "q424_supplier_hhi").set_index("nation")
    li = pd.read_parquet(SF_DIR + "/lineitem.parquet")
    sup = pd.read_parquet(SF_DIR + "/supplier.parquet")
    # half-away-from-zero (engine ROUND), not pandas' banker's rounding
    li["cents"] = np.floor(
        100.0 * li["l_extendedprice"] * (1 - li["l_discount"]) + 0.5
    ).astype("int64")
    rev = li.groupby("l_suppkey")["cents"].sum().reset_index()
    j = rev.merge(sup, left_on="l_suppkey", right_on="s_suppkey")
    for nk, g in j.groupby("s_nationkey"):
        shares = g["cents"].to_numpy(float) / g["cents"].sum()
        hhi = float(np.sum(shares**2))
        row = df.loc[nk]
        assert int(row["n_suppliers"]) == len(g)
        assert row["revenue"] == pytest.approx(g["cents"].sum() / 100.0, abs=1e-2)
        assert row["hhi"] == pytest.approx(hhi, abs=2e-4)
        assert row["effective_suppliers"] == pytest.approx(1.0 / hhi, abs=2e-3)
        assert int(row["concentrated"]) == int(_rnd(1e4 * hhi) > 2500)


# ---------------------------------------------------------------------------
# q432: pinball loss of train-half quantile forecasts on the test half.
# ---------------------------------------------------------------------------
def test_pinball_loss_matches_numpy(spark):
    df = _run(spark, "q432_pinball_loss").set_index(["event_type", "q"])
    ev = _events()
    ev["c"] = (100.0 * ev["value"]).round().astype("int64")
    ev["odd"] = ev["event_id"] % 2
    for et, g in ev.groupby("event_type"):
        train = g[g["odd"] == 0]["c"].to_numpy(float)
        test = g[g["odd"] == 1]["c"].to_numpy(float)
        for qn in (1, 5, 9):
            yhat4 = _rnd(100.0 * np.quantile(train, qn / 10.0, method="linear"))
            diff = 100 * test - yhat4
            loss = np.where(diff >= 0, qn * diff, (qn - 10) * diff)
            row = df.loc[(et, qn / 10.0)]
            assert int(row["n_test"]) == len(test)
            assert row["forecast"] == pytest.approx(yhat4 / 1e4, abs=1e-3)
            assert row["pinball"] == pytest.approx(
                loss.sum() / 1e5 / len(test), abs=2e-3
            )
