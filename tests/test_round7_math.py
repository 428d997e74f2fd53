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


# slow tier (round-12 verdict #1): multi-minute independent-recompute
# redundancy; run with -m "" (see pytest.ini)
@pytest.mark.slow
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


# ===========================================================================
# _prior_waves — independent recomputation extended BACKWARDS to the
# highest-risk pre-round-7 statistics (round-7 verdict item 3). Each test
# recomputes the statistic from the raw parquet with numpy / pure Python
# (np.linalg.lstsq, a Yule-Walker solve, a hand Levenshtein DP), never the
# shared SQL formula, so a formula both engines implement identically-but-
# wrong cannot hide behind the DuckDB-parity gate.
# ===========================================================================
def _daily_counts(which=None):
    import pandas as pd

    from conftest import SF_DIR

    ev = pd.read_parquet(SF_DIR + "/events.parquet")
    day = ev["ts"].dt.floor("D")
    if which is None:
        return ev.groupby(day).size().sort_index().to_numpy(dtype=float)
    out = (
        ev.assign(day=day)
        .pivot_table(index="day", columns="event_type", values="event_id",
                     aggfunc="count", fill_value=0)
        .sort_index()
    )
    return [out.get(w, 0 * out.iloc[:, 0]).to_numpy(dtype=float) for w in which]


# ---------------------------------------------------------------------------
# q348 Granger: the closed-form Cramer solution over exact integer moments
# must equal numpy lstsq on the raw lagged design, and the F statistic the
# textbook (RSS_r - RSS_u) / (RSS_u / (n - 3)) from those residuals.
# ---------------------------------------------------------------------------
def test_granger_matches_lstsq(spark):
    from synth_transform_spark.plans import REGISTRY

    from conftest import SF_DIR

    got = REGISTRY["q348_granger_causality"].spark(spark, SF_DIR).collect()[0]
    y, x = _daily_counts(["purchase", "click"])
    yt, yl, xl = y[1:], y[:-1], x[:-1]
    n = len(yt)
    du = np.column_stack([np.ones(n), yl, xl])
    cu, rss_u = np.linalg.lstsq(du, yt, rcond=None)[:2]
    dr = np.column_stack([np.ones(n), yl])
    rss_r = np.linalg.lstsq(dr, yt, rcond=None)[1]
    f = float((rss_r[0] - rss_u[0]) / (rss_u[0] / (n - 3)))
    assert got["n"] == n
    assert got["b_ylag"] == pytest.approx(cu[1], abs=2e-4)
    assert got["b_xlag"] == pytest.approx(cu[2], abs=2e-4)
    assert got["f_stat"] == pytest.approx(f, abs=2e-3)


# ---------------------------------------------------------------------------
# q339 Ljung-Box: the n-scaled integer centering must equal the textbook
# rho_k = sum (x_t-xbar)(x_{t+k}-xbar) / sum (x_t-xbar)^2 and
# Q_k = n(n+2) sum_{i<=k} rho_i^2 / (n-i) on the raw daily series.
# ---------------------------------------------------------------------------
def test_ljung_box_matches_direct_acf(spark):
    from synth_transform_spark.plans import REGISTRY

    from conftest import SF_DIR

    rows = sorted(
        REGISTRY["q339_ljung_box"].spark(spark, SF_DIR).collect(),
        key=lambda r: r["lag"],
    )
    xs = _daily_counts()
    d = xs - xs.mean()
    den = (d * d).sum()
    n = len(xs)
    q = 0.0
    for k, row in enumerate(rows, start=1):
        rho = (d[:-k] * d[k:]).sum() / den
        q += rho * rho / (n - k)
        assert row["lag"] == k
        assert row["rho"] == pytest.approx(rho, abs=2e-4)
        assert row["q_stat"] == pytest.approx(n * (n + 2) * q, abs=2e-3)


# ---------------------------------------------------------------------------
# q349 PACF: the unrolled Durbin-Levinson must equal a Yule-Walker solve
# (toeplitz(rho) @ phi = rho-vector, pacf_k = phi_k) — a genuinely
# different algorithm for the same quantity. Inputs use the query's own
# 1e-8-frozen rhos so only the recursion algebra is under test.
# ---------------------------------------------------------------------------
def test_pacf_matches_yule_walker(spark):
    from synth_transform_spark.plans import REGISTRY

    from conftest import SF_DIR

    rows = sorted(
        REGISTRY["q349_pacf"].spark(spark, SF_DIR).collect(),
        key=lambda r: r["lag"],
    )
    xs = _daily_counts()
    n = len(xs)
    dv = n * xs - xs.sum()  # the query's exact integer centering
    den = (dv * dv).sum()
    rho = [
        round(1e8 * (dv[:-k] * dv[k:]).sum() / den) / 1e8
        for k in range(1, len(rows) + 1)
    ]
    for k, row in enumerate(rows, start=1):
        r = np.array(rho[:k])
        toep = np.array(
            [[1.0 if i == j else rho[abs(i - j) - 1] for j in range(k)]
             for i in range(k)]
        )
        phi = np.linalg.solve(toep, r)
        assert row["lag"] == k
        assert row["rho"] == pytest.approx(rho[k - 1], abs=2e-4)
        assert row["pacf"] == pytest.approx(phi[-1], abs=2e-4)


# ---------------------------------------------------------------------------
# q378 Hurst: block R/S recomputed directly from the raw series (float
# cumulative deviations, population std), 3-point log-log OLS via polyfit.
# ---------------------------------------------------------------------------
def test_hurst_matches_direct_rs(spark):
    from synth_transform_spark.plans import REGISTRY

    from conftest import SF_DIR

    rows = sorted(
        REGISTRY["q378_hurst_exponent"].spark(spark, SF_DIR).collect(),
        key=lambda r: r["n"],
    )
    xs = _daily_counts()
    pts = []
    for row, nb in zip(rows, (8, 16, 32)):
        rss = []
        for b in range(len(xs) // nb):
            blk = xs[b * nb : (b + 1) * nb]
            cum = np.cumsum(blk - blk.mean())
            s = blk.std()  # population
            if s <= 0:
                continue
            r = cum.max() - min(cum.min(), 0.0)
            rss.append(round(1e8 * r / s) / 1e8)  # the query's freeze grid
        mean_rs = float(np.mean(rss))
        pts.append((math.log(nb), math.log(mean_rs)))
        assert row["n"] == nb
        assert row["n_blocks"] == len(rss)
        assert row["mean_rs"] == pytest.approx(mean_rs, abs=2e-4)
    h = np.polyfit([p[0] for p in pts], [p[1] for p in pts], 1)[0]
    for row in rows:
        assert row["hurst"] == pytest.approx(h, abs=2e-4)


# ---------------------------------------------------------------------------
# q229 CUPED: theta and the per-user adjusted metric recomputed with
# pandas groupby + np.polyfit (cov/var IS the OLS slope of post on pre).
# ---------------------------------------------------------------------------
def test_cuped_matches_numpy(spark):
    import pandas as pd

    from synth_transform_spark.plans import REGISTRY

    from conftest import SF_DIR

    got = (
        REGISTRY["q229_cuped_adjustment"].spark(spark, SF_DIR)
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    ev = pd.read_parquet(SF_DIR + "/events.parquet")
    v = (ev["value"] * 10000.0).round()
    cut = pd.Timestamp("2024-01-16")
    per = (
        ev.assign(pre=v.where(ev["ts"] < cut, 0.0), post=v.where(ev["ts"] >= cut, 0.0))
        .groupby("user_id")[["pre", "post"]]
        .sum()
        .sort_index()
    )
    theta = float(np.polyfit(per["pre"], per["post"], 1)[0])
    adjusted = (per["post"] - theta * (per["pre"] - per["pre"].mean())) / 10000.0
    assert len(got) == len(per)
    assert got["pre_milli"].to_numpy().tolist() == per["pre"].astype(int).tolist()
    np.testing.assert_allclose(
        got["adjusted"].to_numpy(), adjusted.to_numpy(), atol=2e-4
    )


# ---------------------------------------------------------------------------
# q180 Fellegi-Sunter: decisions recomputed with a hand Levenshtein DP and
# math.log2 weights from the declared m/u priors — independent of both
# engines' levenshtein() builtins and of the literal-weight plumbing.
# ---------------------------------------------------------------------------
def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_fellegi_sunter_matches_hand_scoring(spark):
    import pandas as pd

    from synth_transform_spark.operators import linkage
    from synth_transform_spark.plans import REGISTRY

    from conftest import SF_DIR

    got = {
        (r["id_a"], r["id_b"]): (r["name_agree"], r["bal_agree"], r["score"], r["decision"])
        for r in REGISTRY["q180_record_linkage"].spark(spark, SF_DIR).collect()
    }
    cust = pd.read_parquet(SF_DIR + "/customer.parquet")
    want = {}
    for _, blk in cust.groupby(["c_nationkey", "c_mktsegment"]):
        recs = blk.sort_values("c_custkey").to_dict("records")
        for i in range(len(recs)):
            for j in range(i + 1, len(recs)):
                a, b = recs[i], recs[j]
                na = int(_lev(a["c_name"], b["c_name"]) <= 2)
                ba = int(abs(a["c_acctbal"] - b["c_acctbal"]) < 100.0)
                score = round(
                    (math.log2(0.95 / 0.02) if na else math.log2(0.05 / 0.98))
                    + (math.log2(0.80 / 0.10) if ba else math.log2(0.20 / 0.90)),
                    4,
                )
                if score >= linkage.POSSIBLE_THRESHOLD:
                    dec = (
                        "match" if score >= linkage.MATCH_THRESHOLD else "possible"
                    )
                    want[(a["c_custkey"], b["c_custkey"])] = (na, ba, score, dec)
    assert set(got) == set(want)
    for k, (na, ba, score, dec) in want.items():
        gna, gba, gscore, gdec = got[k]
        assert (gna, gba, gdec) == (na, ba, dec)
        assert gscore == pytest.approx(score, abs=2e-4)
