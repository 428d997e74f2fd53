"""Round-9 independent-math BACKFILL (verification-inventory gap).

The 19 A12-tagged queries that had oracle-hash coverage only (see
plans/verification.py). Every test recomputes the statistic from raw
parquet with pandas / numpy / pure Python — a third implementation
independent of the shared Spark/DuckDB formula text — so a wrong
formula both engines share cannot hide behind the hash gate.

Deliberate semantics replicated from the query contracts (not re-derived):
integer freezing grids (round(k*x) inputs), DuckDB/Spark ROUND =
half-away-from-zero, QUANTILE_CONT = linear interpolation. The
*statistic* around those contracts is recomputed independently.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from conftest import SF_DIR


def _rnd(v: float) -> int:
    """round-half-away-from-zero (DuckDB ROUND / Spark F.round)."""
    return int(math.floor(v + 0.5)) if v >= 0 else int(math.ceil(v - 0.5))


def _li():
    return pd.read_parquet(SF_DIR + "/lineitem.parquet")


def _orders():
    return pd.read_parquet(SF_DIR + "/orders.parquet")


def _events():
    return pd.read_parquet(SF_DIR + "/events.parquet")


def _docs():
    return pd.read_parquet(SF_DIR + "/documents.parquet")


def _emb():
    return pd.read_parquet(SF_DIR + "/embeddings.parquet")


def _run(spark, name):
    from synth_transform_spark.plans import REGISTRY

    return REGISTRY[name].spark(spark, SF_DIR).toPandas()


# ---------------------------------------------------------------------------
# q64: per-(returnflag, linestatus) linear-interpolation percentiles must
# equal numpy's independent quantile implementation.
# ---------------------------------------------------------------------------
def test_group_percentiles_match_numpy(spark):
    df = _run(spark, "q64_group_percentiles").set_index(
        ["l_returnflag", "l_linestatus"]
    )
    for (rf, ls), g in _li().groupby(["l_returnflag", "l_linestatus"]):
        row = df.loc[(rf, ls)]
        v = g["l_extendedprice"].to_numpy(float)
        assert int(row["n"]) == len(v)
        for col, q in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
            assert row[col] == pytest.approx(
                np.quantile(v, q, method="linear"), abs=1e-3
            ), (rf, ls, col)
        assert row["disc_p50"] == pytest.approx(
            np.quantile(g["l_discount"].to_numpy(float), 0.5), abs=1e-3
        )


# ---------------------------------------------------------------------------
# q86: winsorized price must equal clip(np-p01, np-p99) row by row.
# ---------------------------------------------------------------------------
def test_winsorize_matches_numpy_clip(spark):
    df = _run(spark, "q86_winsorize").set_index("o_orderkey")
    od = _orders()
    for pr, g in od.groupby("o_orderpriority"):
        v = g["o_totalprice"].to_numpy(float)
        p01 = np.quantile(v, 0.01, method="linear")
        p99 = np.quantile(v, 0.99, method="linear")
        want = np.clip(v, p01, p99)
        got = df.loc[g["o_orderkey"]]["price_w"].to_numpy(float)
        assert np.allclose(got, want, atol=1e-3), pr
    assert len(df) == len(od)


# ---------------------------------------------------------------------------
# q91: robust z via median/MAD — recomputed with np.median; the 0.6745
# scale and 3.5 fence are the documented Iglewicz-Hoaglin constants.
# ---------------------------------------------------------------------------
def test_mad_outliers_match_numpy(spark):
    df = _run(spark, "q91_mad_outliers").set_index("o_orderkey")
    for pr, g in _orders().groupby("o_orderpriority"):
        v = g["o_totalprice"].to_numpy(float)
        med = np.median(v)
        mad = np.median(np.abs(v - med))
        sub = df.loc[g["o_orderkey"]]
        if mad == 0:
            assert sub["robust_z"].isna().all()
            assert not sub["is_outlier"].any()
            continue
        z = 0.6745 * (v - med) / mad
        assert np.allclose(sub["robust_z"].to_numpy(float), z, atol=1e-3)
        assert (sub["is_outlier"].to_numpy(bool) == (np.abs(z) > 3.5)).all()


# ---------------------------------------------------------------------------
# q103: Pearson correlations via np.corrcoef (a different accumulation
# than the sums-of-products form).
# ---------------------------------------------------------------------------
def test_corr_matrix_matches_numpy(spark):
    df = _run(spark, "q103_corr_matrix").set_index("pair")["corr"]
    li = _li()
    pairs = {
        "quantity_price": ("l_quantity", "l_extendedprice"),
        "quantity_discount": ("l_quantity", "l_discount"),
        "price_discount": ("l_extendedprice", "l_discount"),
        "price_tax": ("l_extendedprice", "l_tax"),
    }
    for name, (a, b) in pairs.items():
        want = np.corrcoef(li[a].to_numpy(float), li[b].to_numpy(float))[0, 1]
        assert df[name] == pytest.approx(want, abs=1e-3), name


# ---------------------------------------------------------------------------
# q136: equi-depth octile histogram — bins from numpy octile bounds on
# the cents domain, counts by independent digitize.
# ---------------------------------------------------------------------------
def test_equidepth_histogram_matches_numpy(spark):
    df = _run(spark, "q136_equidepth_histogram")
    li = _li()
    li["vc"] = (100.0 * li["l_extendedprice"]).round().astype("int64")
    for rf, g in li.groupby("l_returnflag"):
        vc = g["vc"].to_numpy(float)
        bs = [np.quantile(vc, q, method="linear") for q in
              (0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875)]
        bins = 1 + np.array([(v > np.array(bs)).sum() for v in vc])
        sub = df[df["l_returnflag"] == rf].set_index("bin")
        for b in sub.index:
            assert int(sub.loc[b, "n_rows"]) == int((bins == b).sum()), (rf, b)
            lo = vc.min() if b == 1 else bs[b - 2]
            hi = vc.max() if b == 8 else bs[b - 1]
            assert sub.loc[b, "bin_lo"] == pytest.approx(lo / 100.0, abs=1e-3)
            assert sub.loc[b, "bin_hi"] == pytest.approx(hi / 100.0, abs=1e-3)
        assert int(sub["n_rows"].sum()) == len(g)


# ---------------------------------------------------------------------------
# q144: grouped OLS slope/intercept vs np.polyfit (QR-based, not the
# normal-equation sums the engines share).
# ---------------------------------------------------------------------------
def test_grouped_ols_matches_polyfit(spark):
    df = _run(spark, "q144_grouped_ols").set_index("event_type")
    ev = _events()
    # unit-safe epoch seconds (parquet is datetime64[us], not ns)
    sec = (ev["ts"].dt.floor("s") - pd.Timestamp("1970-01-01")) // pd.Timedelta(
        seconds=1
    )
    ev["x"] = (sec - 1704067200) // 3600
    for et, g in ev.groupby("event_type"):
        slope, intercept = np.polyfit(
            g["x"].to_numpy(float), g["value"].to_numpy(float), 1
        )
        row = df.loc[et]
        assert int(row["n"]) == len(g)
        assert row["slope"] == pytest.approx(slope, abs=1e-3)
        assert row["intercept"] == pytest.approx(intercept, abs=1e-3)


# ---------------------------------------------------------------------------
# q151: Zipf log-log fit vs np.polyfit over independently built ranks.
# ---------------------------------------------------------------------------
def test_zipf_fit_matches_polyfit(spark):
    from collections import Counter

    row = _run(spark, "q151_zipf_fit").iloc[0]
    cnt = Counter(
        t for text in _docs()["text"] for t in text.split(" ") if t
    )
    ordered = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    lx = np.array([round(math.log(r), 6) for r in range(1, len(ordered) + 1)])
    ly = np.array([round(math.log(n), 6) for _, n in ordered])
    slope, intercept = np.polyfit(lx, ly, 1)
    assert int(row["n"]) == len(ordered)
    assert row["zipf_slope"] == pytest.approx(slope, abs=1e-3)
    assert row["zipf_intercept"] == pytest.approx(intercept, abs=1e-3)


# ---------------------------------------------------------------------------
# q153: hour-of-day z anomalies — population std via np.std; the 4dp
# mu/sigma freeze is part of the query contract and replicated.
# ---------------------------------------------------------------------------
def test_seasonal_anomalies_match_numpy(spark):
    df = _run(spark, "q153_seasonal_anomalies")
    ev = _events()
    hourly = ev.groupby(ev["ts"].dt.floor("h")).size()
    hod = hourly.index.hour
    z = {}
    for h in range(24):
        n = hourly[hod == h].to_numpy(float)
        if not len(n):
            continue
        mu = round(float(n.mean()), 4)
        sigma = round(float(np.std(n)), 4)  # population
        if sigma <= 0:
            continue
        for hr, v in hourly[hod == h].items():
            z[hr] = round((v - mu) / sigma, 4)
    want = {hr: zz for hr, zz in z.items() if abs(zz) >= 2.0}
    got = {r["hr"]: r["z"] for _, r in df.iterrows()}
    assert set(got) == set(want)
    for hr in want:
        assert got[hr] == pytest.approx(want[hr], abs=2e-4), hr


# ---------------------------------------------------------------------------
# q174: 24h rolling correlation of hourly click/purchase counts vs
# pandas' rolling corr (Welford-style, not the integer-sum identity).
# ---------------------------------------------------------------------------
def test_rolling_correlation_matches_pandas(spark):
    df = _run(spark, "q174_rolling_correlation").sort_values("hr")
    ev = _events()
    hr = ev["ts"].dt.floor("h")
    x = (ev["event_type"] == "click").groupby(hr).sum()
    y = (ev["event_type"] == "purchase").groupby(hr).sum()
    # all hours with any event (oracle buckets all events)
    idx = ev.groupby(hr).size().index
    x, y = x.reindex(idx, fill_value=0), y.reindex(idx, fill_value=0)
    want = x.rolling(24, min_periods=2).corr(y)
    got = df.set_index("hr")["corr_24h"]
    assert list(got.index) == list(want.index)
    for hridx in got.index:
        w, g = want[hridx], got[hridx]
        if pd.isna(g):
            # oracle nulls on n<2 or zero variance; pandas yields nan/inf
            assert pd.isna(w) or not np.isfinite(w) or abs(w) > 0.99999, hridx
        else:
            assert g == pytest.approx(w, abs=1e-3), hridx


# ---------------------------------------------------------------------------
# q196: quantity-weighted median price — independent cumsum walk.
# ---------------------------------------------------------------------------
def test_weighted_median_matches_walk(spark):
    df = _run(spark, "q196_weighted_median").set_index("l_returnflag")
    li = _li().sort_values(
        ["l_extendedprice", "l_orderkey", "l_linenumber"]
    )
    for rf, g in li.groupby("l_returnflag"):
        w = g["l_quantity"].to_numpy(float)
        tot = w.sum()
        cum = np.cumsum(w)
        pos = int(np.searchsorted(cum, tot / 2.0, side="left"))
        want = float(g["l_extendedprice"].to_numpy(float)[pos])
        row = df.loc[rf]
        assert row["weighted_median_price"] == pytest.approx(want, abs=1e-3)
        assert row["total_weight"] == pytest.approx(tot, abs=1e-3)


# ---------------------------------------------------------------------------
# q226: per-dim frechet-style drift between vec_id halves — numpy
# mean/std over the 1e4-frozen component grid.
# ---------------------------------------------------------------------------
def test_embedding_drift_matches_numpy(spark):
    df = _run(spark, "q226_embedding_drift").set_index("dim")
    em = _emb()
    mat = np.round(np.stack(em["embedding"].to_numpy()).astype(float) * 1e4)
    halves = (em["vec_id"] % 2).to_numpy()
    for d in df.index:
        col = mat[:, d - 1]  # dims are 1-based
        a, b = col[halves == 0], col[halves == 1]
        mu_a, mu_b = a.mean() / 1e4, b.mean() / 1e4
        sd_a, sd_b = np.std(a) / 1e4, np.std(b) / 1e4  # population
        row = df.loc[d]
        assert row["mu_a"] == pytest.approx(mu_a, abs=1e-5)
        assert row["mu_b"] == pytest.approx(mu_b, abs=1e-5)
        assert row["sigma_a"] == pytest.approx(sd_a, abs=1e-5)
        assert row["sigma_b"] == pytest.approx(sd_b, abs=1e-5)
        assert row["fid_contrib"] == pytest.approx(
            (mu_a - mu_b) ** 2 + (sd_a - sd_b) ** 2, abs=1e-5
        )


# ---------------------------------------------------------------------------
# q242: IPW ATE — float Horvitz-Thompson recomputation (no freezing).
# The synthetic generator is dense (every user has a signup), so the
# parquet fixtures only ever exercise q242's degenerate no-qualifying-
# band path; the weighting math is driven on a CONSTRUCTED events table
# where treatment genuinely varies within activity bands.
# ---------------------------------------------------------------------------
def test_ipw_effect_matches_float_ht(spark, tmp_path):
    import random

    rng = random.Random(42)
    rows = []
    eid = 0
    for user in range(120):
        n_ev = rng.choice([10, 30, 40, 60, 80])
        treated = rng.random() < 0.5
        for k in range(n_ev):
            eid += 1
            is_signup = treated and k == 0
            is_purchase = rng.random() < 0.4
            rows.append(
                {
                    "event_id": eid,
                    "ts": pd.Timestamp("2024-01-01")
                    + pd.Timedelta(minutes=eid),
                    "user_id": user,
                    "event_type": "signup"
                    if is_signup
                    else ("purchase" if is_purchase else "click"),
                    "value": round(rng.uniform(1, 50), 2)
                    + (3.0 if treated else 0.0),
                    "props": "{}",
                }
            )
    ev = pd.DataFrame(rows)
    ev.to_parquet(tmp_path / "events.parquet")

    from synth_transform_spark.plans import REGISTRY

    row = REGISTRY["q242_ipw_effect"].spark(spark, str(tmp_path)).toPandas().iloc[0]

    u = ev.groupby("user_id").agg(
        cnt=("event_id", "size"),
        t=("event_type", lambda s: int((s == "signup").any())),
    )
    y = (
        ev[ev["event_type"] == "purchase"]
        .assign(ym=lambda d: (1e4 * d["value"]).round())
        .groupby("user_id")["ym"]
        .sum()
    )
    u["y"] = y.reindex(u.index, fill_value=0.0) / 1e4
    u["band"] = u["cnt"] // 25
    bands = u.groupby("band").agg(nb=("t", "size"), nt=("t", "sum"))
    bands = bands[(bands["nt"] > 0) & (bands["nt"] < bands["nb"])]
    assert len(bands) >= 2, "constructed input must have qualifying bands"
    sub = u[u["band"].isin(bands.index)].join(bands, on="band")
    w = np.where(
        sub["t"] == 1,
        sub["nb"] / sub["nt"],
        sub["nb"] / (sub["nb"] - sub["nt"]),
    )
    t = sub["t"].to_numpy()
    yv = sub["y"].to_numpy(float)
    mu_t = (yv * w)[t == 1].sum() / w[t == 1].sum()
    mu_c = (yv * w)[t == 0].sum() / w[t == 0].sum()
    assert int(row["n_users"]) == len(sub)
    assert int(row["n_treated"]) == int(t.sum())
    assert row["mu_treated"] == pytest.approx(mu_t, abs=1e-3)
    assert row["mu_control"] == pytest.approx(mu_c, abs=1e-3)
    assert row["ate"] == pytest.approx(mu_t - mu_c, abs=2e-3)
    # the treated lift planted in the generator must be visible
    assert row["ate"] > 0


# ---------------------------------------------------------------------------
# q431: Kendall tau-b over daily (orders, revenue) — O(n^2) pure-python
# pair loop (the engines use a self-join of the same algebra; this is a
# from-scratch count).
# ---------------------------------------------------------------------------
def test_kendall_tau_matches_pair_loop(spark):
    row = _run(spark, "q431_kendall_tau_daily").iloc[0]
    od = _orders()
    od["rev"] = (100.0 * od["o_totalprice"]).round().astype("int64")
    daily = od.groupby("o_orderdate").agg(
        n=("o_orderkey", "size"), rev=("rev", "sum")
    )
    xs = daily["n"].to_list()
    ys = daily["rev"].to_list()
    c = d = tx = ty = 0
    m = len(xs)
    for i in range(m):
        for j in range(i + 1, m):
            dx = xs[i] - xs[j]
            dy = ys[i] - ys[j]
            if dx == 0:
                tx += 1
            if dy == 0:
                ty += 1
            if dx * dy > 0:
                c += 1
            elif dx * dy < 0:
                d += 1
    n0 = m * (m - 1) // 2
    tau = (c - d) / math.sqrt((n0 - tx) * (n0 - ty))
    assert int(row["n_days"]) == m
    assert int(row["concordant"]) == c
    assert int(row["discordant"]) == d
    assert row["tau_b"] == pytest.approx(tau, abs=2e-4)


# ---------------------------------------------------------------------------
# q433: additive Holt-Winters (alpha=1/2, beta=1/4, gamma=1/4, m=7) on
# the 63-day tail — pure-python integer recursion, third implementation
# next to the Spark iterative plan and the DuckDB recursive CTE.
# ---------------------------------------------------------------------------
# slow tier (round-12 verdict #1): multi-minute independent-recompute
# redundancy; run with -m "" (see pytest.ini)
@pytest.mark.slow
def test_holt_winters_matches_python_recursion(spark):
    df = _run(spark, "q433_holt_winters").set_index("t")
    od = _orders()
    od["cents"] = (100.0 * od["o_totalprice"]).round().astype("int64")
    daily = od.groupby("o_orderdate")["cents"].sum()
    maxd = od["o_orderdate"].max()
    x = []
    for t in range(1, 64):
        day = maxd - pd.Timedelta(days=63 - t)
        x.append(int(daily.get(day, 0)) * 100)
    lu = _rnd(sum(x[0:7]) / 7.0)
    bu = _rnd((sum(x[7:14]) - sum(x[0:7])) / 49.0)
    s = [x[7 + i] - lu for i in range(7)]  # s1..s7 for t=8..14
    rows = {}
    for t in range(15, 64):
        xu = x[t - 1]
        fu = lu + bu + s[0]
        lu2 = _rnd((xu - s[0] + lu + bu) / 2.0)
        bu2 = _rnd((lu2 - lu + 3 * bu) / 4.0)
        s7 = _rnd((xu - lu2 + 3 * s[0]) / 4.0)
        s = s[1:] + [s7]
        lu, bu = lu2, bu2
        rows[t] = (xu / 1e4, fu / 1e4, (xu - fu) / 1e4)
    assert sorted(df.index) == sorted(rows)
    for t, (xv, fv, ev_) in rows.items():
        assert df.loc[t, "x"] == pytest.approx(xv, abs=1e-4), t
        assert df.loc[t, "forecast"] == pytest.approx(fv, abs=1e-4), t
        assert df.loc[t, "err"] == pytest.approx(ev_, abs=1e-4), t


# ---------------------------------------------------------------------------
# q434: Cochran-Armitage trend z — direct float covariance form.
# ---------------------------------------------------------------------------
def test_cochran_armitage_matches_float(spark):
    row = _run(spark, "q434_cochran_armitage").iloc[0]
    li = _li()
    s = (100.0 * li["l_discount"]).round().to_numpy(float)
    r = (li["l_returnflag"] == "R").to_numpy(float)
    n = len(li)
    p = r.mean()
    num = (r * s).sum() - r.sum() * s.mean()
    den = math.sqrt(p * (1 - p) * ((s**2).sum() - s.sum() ** 2 / n))
    assert int(row["n"]) == n
    assert int(row["returns"]) == int(r.sum())
    assert row["z_trend"] == pytest.approx(num / den, abs=1e-3)


# ---------------------------------------------------------------------------
# q441: AIPW vs IPW vs naive — float recomputation over the quantity
# strata (no freezing).
# ---------------------------------------------------------------------------
def test_aipw_effect_matches_float(spark):
    row = _run(spark, "q441_aipw_effect").iloc[0]
    li = _li()
    x = (li["l_quantity"].round().astype("int64") // 10).to_numpy()
    t = (li["l_discount"] >= 0.05).to_numpy(int)
    y = (li["l_returnflag"] == "R").to_numpy(int)
    strata = {}
    for xi, ti, yi in zip(x, t, y):
        st = strata.setdefault(xi, [0, 0, 0, 0, 0])  # n_x, n1, r1, n0, r0
        st[0] += 1
        if ti:
            st[1] += 1
            st[2] += yi
        else:
            st[3] += 1
            st[4] += yi
    n = sum(s[0] for s in strata.values())
    m1 = sum(s[2] for s in strata.values()) / sum(s[1] for s in strata.values())
    m0 = sum(s[4] for s in strata.values()) / sum(s[3] for s in strata.values())
    ipw = aipw = 0.0
    for n_x, n1, r1, n0, r0 in strata.values():
        if n1 == 0 or n0 == 0:
            continue
        e = n1 / n_x
        ipw += r1 / e - r0 / (n0 / n_x)
        aipw += (
            n_x * (m1 - m0)
            + (r1 - n1 * m1) / e
            - (r0 - n0 * m0) / (n0 / n_x)
        )
    assert int(row["n"]) == n
    assert row["psi_naive"] == pytest.approx(m1 - m0, abs=1e-3)
    assert row["psi_ipw"] == pytest.approx(ipw / n, abs=1e-3)
    assert row["psi_aipw"] == pytest.approx(aipw / n, abs=1e-3)


# ---------------------------------------------------------------------------
# q444: alignment & uniformity (Wang-Isola) — numpy pair loops over the
# strided pair sets, cosine from float dots of the frozen grid.
# ---------------------------------------------------------------------------
def test_alignment_uniformity_matches_numpy(spark):
    row = _run(spark, "q444_alignment_uniformity").iloc[0]
    em = _emb().sort_values("vec_id").reset_index(drop=True)
    mat = np.round(np.stack(em["embedding"].to_numpy()).astype(float) * 1e4)
    ids = em["vec_id"].to_numpy()
    labels = em["label"].to_numpy()
    norms = np.sqrt((mat**2).sum(axis=1))

    def dist(i, j):
        return 2.0 - 2.0 * float(mat[i] @ mat[j]) / (norms[i] * norms[j])

    pos, uni = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = int(ids[i]), int(ids[j])
            lo, hi = min(a, b), max(a, b)
            if labels[i] == labels[j] and (lo + hi) % 3 == 0:
                pos.append(_rnd(1e6 * dist(i, j)))
            if a % 4 == 0 and b % 4 == 0:
                uni.append(_rnd(1e6 * math.exp(-2.0 * dist(i, j))))
    assert int(row["n_pos_pairs"]) == len(pos)
    assert int(row["n_unif_pairs"]) == len(uni)
    assert row["alignment"] == pytest.approx(
        sum(pos) / 1e6 / len(pos), abs=2e-4
    )
    assert row["uniformity"] == pytest.approx(
        math.log(sum(uni) / 1e6 / len(uni)), abs=2e-4
    )


# ---------------------------------------------------------------------------
# q447: Burrows' Delta — pandas grid recomputation of the top-30 z-score
# stylometry with population std over sources.
# ---------------------------------------------------------------------------
def test_burrows_delta_matches_pandas(spark):
    from collections import Counter, defaultdict

    df = _run(spark, "q447_burrows_delta")
    docs = _docs()
    per_src = defaultdict(Counter)
    tot = Counter()
    for r in docs.itertuples():
        toks = [t for t in r.text.split(" ") if t]
        per_src[r.source].update(toks)
        tot.update(toks)
    top = [w for w, _ in sorted(tot.items(), key=lambda kv: (-kv[1], kv[0]))[:30]]
    sources = sorted(per_src)
    k = len(sources)
    zmat = {}
    for w in top:
        fu = np.array(
            [
                _rnd(1e6 * per_src[s][w] / sum(per_src[s].values()))
                for s in sources
            ],
            dtype=float,
        )
        sd = np.std(fu)  # population
        if sd <= 0:
            continue
        zmat[w] = (fu - fu.mean()) / sd
    want = {}
    for i in range(k):
        for j in range(i + 1, k):
            du = sum(
                _rnd(1e6 * abs(z[i] - z[j])) for z in zmat.values()
            )
            want[(sources[i], sources[j])] = du / 1e6 / len(zmat)
    got = {
        (r["source_a"], r["source_b"]): r["delta"] for _, r in df.iterrows()
    }
    assert set(got) == set(want)
    for pair in want:
        assert got[pair] == pytest.approx(want[pair], abs=2e-4), pair


# ---------------------------------------------------------------------------
# q456: Breusch-Pagan LM — main OLS via np.polyfit, aux R^2 via
# np.corrcoef (not the moment-sum identity).
# ---------------------------------------------------------------------------
def test_breusch_pagan_matches_numpy(spark):
    row = _run(spark, "q456_breusch_pagan").iloc[0]
    li = _li()
    x = li["l_quantity"].round().to_numpy(float)
    y = li["l_extendedprice"].round().to_numpy(float)
    b, a = np.polyfit(x, y, 1)
    e = y - a - b * x
    z = np.array([_rnd(v) for v in (e**2) / 1e6], dtype=float)
    r2 = np.corrcoef(x, z)[0, 1] ** 2
    n = len(x)
    assert int(row["n"]) == n
    assert row["r2_aux"] == pytest.approx(r2, abs=1e-4)
    assert row["lm_stat"] == pytest.approx(n * r2, rel=1e-3, abs=0.05)
