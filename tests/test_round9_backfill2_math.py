"""Round-9 backfill, part 2: the FORMULA backlog from the verification
inventory (plans/verification.py WAIVERS) — every remaining "BACKLOG"
waiver gets an independent recomputation here, emptying the explicit
formula-risk backlog. Same discipline as test_round9_backfill_math.py:
pandas / numpy / pure Python third implementations, never the shared
frequency-domain identity.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from conftest import SF_DIR


def _run(spark, name):
    from synth_transform_spark.plans import REGISTRY

    return REGISTRY[name].spark(spark, SF_DIR).toPandas()


def _events():
    return pd.read_parquet(SF_DIR + "/events.parquet")


def _docs():
    return pd.read_parquet(SF_DIR + "/documents.parquet")


# ---------------------------------------------------------------------------
# q213: per-nation spend Gini — sorted-cumulative formula via numpy.
# ---------------------------------------------------------------------------
def test_spend_gini_matches_sorted_form(spark):
    df = _run(spark, "q213_spend_gini").set_index("nationkey")
    cust = pd.read_parquet(SF_DIR + "/customer.parquet")
    orders = pd.read_parquet(SF_DIR + "/orders.parquet")
    spend = (
        orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
        .groupby(["c_nationkey", "c_custkey"])["o_totalprice"]
        .sum()
    )
    for nk, g in spend.groupby(level=0):
        x = np.sort(g.to_numpy(float))
        n = len(x)
        gini = 2.0 * np.sum(np.arange(1, n + 1) * x) / (n * x.sum()) - (
            n + 1.0
        ) / n
        assert int(df.loc[nk, "n_customers"]) == n
        assert df.loc[nk, "gini"] == pytest.approx(gini, abs=2e-4), nk


# ---------------------------------------------------------------------------
# q397: pairwise source Jensen-Shannon divergence — plain float
# KL(p||m)/KL(q||m) over Counter unigram distributions.
# ---------------------------------------------------------------------------
def test_source_jsd_matches_counters(spark):
    from collections import Counter

    df = _run(spark, "q397_source_jsd")
    dists, sources = {}, []
    for src, g in _docs().groupby("source"):
        c = Counter(t for text in g["text"] for t in text.split(" ") if t)
        n = sum(c.values())
        dists[src] = {w: k / n for w, k in c.items()}
        sources.append(src)
    got = {(r["source_a"], r["source_b"]): r for _, r in df.iterrows()}
    for i, sa in enumerate(sorted(sources)):
        for sb in sorted(sources)[i + 1 :]:
            p, q = dists[sa], dists[sb]
            jsd = 0.0
            for w in set(p) | set(q):
                pw, qw = p.get(w, 0.0), q.get(w, 0.0)
                m = (pw + qw) / 2.0
                if pw > 0:
                    jsd += 0.5 * pw * math.log(pw / m)
                if qw > 0:
                    jsd += 0.5 * qw * math.log(qw / m)
            row = got[(sa, sb)]
            assert int(row["shared_types"]) == len(set(p) & set(q))
            assert row["jsd"] == pytest.approx(jsd, abs=2e-3), (sa, sb)


# ---------------------------------------------------------------------------
# q428: Good-Turing count-of-counts — Counter-of-Counter recompute.
# ---------------------------------------------------------------------------
def test_good_turing_matches_counters(spark):
    from collections import Counter

    df = _run(spark, "q428_good_turing").set_index("r")
    toks = Counter(
        t for text in _docs()["text"] for t in text.split(" ") if t
    )
    coc = Counter(toks.values())
    total = sum(toks.values())
    low = sorted(coc)[:8]
    assert sorted(df.index) == low
    for r in low:
        row = df.loc[r]
        assert int(row["n_types"]) == coc[r]
        assert row["r_star"] == pytest.approx(
            (r + 1) * coc.get(r + 1, 0) / coc[r], abs=2e-4
        )
        assert row["mass"] == pytest.approx(r * coc[r] / total, abs=2e-4)


# ---------------------------------------------------------------------------
# q417: binary segmentation — brute-force best SSE split over the daily
# series (replicating the 1e4 freeze + smallest-t tie-break contract).
# ---------------------------------------------------------------------------
def test_binary_segmentation_matches_brute_force(spark):
    row = _run(spark, "q417_binary_segmentation").iloc[0]
    ev = _events()
    daily = ev.groupby(ev["ts"].dt.floor("D")).size().sort_index()
    x = daily.to_numpy(float)
    n = len(x)

    def sse(seg):
        return float(np.sum((seg - seg.mean()) ** 2))

    cands = [
        (round(1e4 * (sse(x[:t]) + sse(x[t:]))), t) for t in range(1, n)
    ]
    best4, best_t = min(cands)
    assert int(row["split_t"]) == best_t
    assert row["sse"] == pytest.approx(best4 / 1e4, abs=2e-3)
    assert row["mean_left"] == pytest.approx(x[:best_t].mean(), abs=1e-3)
    assert row["mean_right"] == pytest.approx(x[best_t:].mean(), abs=1e-3)
    assert row["sse_reduction"] == pytest.approx(
        sse(x) - best4 / 1e4, rel=1e-4, abs=2e-2
    )


# ---------------------------------------------------------------------------
# q420: geometric adstock (lambda=0.5, 1e3-frozen) — pandas recursion +
# np.corrcoef.
# ---------------------------------------------------------------------------
def test_adstock_matches_recursion(spark):
    row = _run(spark, "q420_adstock").iloc[0]
    ev = _events()
    day = ev["ts"].dt.floor("D")
    x = (ev["event_type"] == "click").groupby(day).sum().sort_index()
    y = (ev["event_type"] == "purchase").groupby(day).sum().sort_index()
    idx = ev.groupby(day).size().sort_index().index
    x = x.reindex(idx, fill_value=0).to_numpy(float)
    y = y.reindex(idx, fill_value=0).to_numpy(float)
    n = len(x)
    a = np.array(
        [
            sum(round(1000.0 * x[b] * 0.5 ** (t - b)) for b in range(t + 1))
            for t in range(n)
        ],
        dtype=float,
    )
    assert int(row["n"]) == n
    assert row["corr_raw"] == pytest.approx(
        np.corrcoef(x, y)[0, 1], abs=2e-4
    )
    assert row["corr_adstock"] == pytest.approx(
        np.corrcoef(a, y)[0, 1], abs=2e-4
    )


# ---------------------------------------------------------------------------
# q438: discrete mutual information per feature — Counter joint/marginal
# recompute in nats.
# ---------------------------------------------------------------------------
def test_mi_feature_rank_matches_counters(spark):
    from collections import Counter

    df = _run(spark, "q438_mi_feature_rank").set_index("feature")
    li = pd.read_parquet(SF_DIR + "/lineitem.parquet")
    y = (li["l_returnflag"] == "R").astype(int)
    feats = {
        "discount": (100.0 * li["l_discount"]).round().astype("int64"),
        "qty_decile": li["l_quantity"].round().astype("int64") // 10,
        "status": (li["l_linestatus"] == "F").astype(int),
        "tax": (100.0 * li["l_tax"]).round().astype("int64"),
    }
    n = len(li)
    for name, xv in feats.items():
        joint = Counter(zip(xv, y))
        mx = Counter(xv)
        my = Counter(y)
        mi = sum(
            c / n * math.log(c * n / (mx[a] * my[b]))
            for (a, b), c in joint.items()
        )
        assert int(df.loc[name, "n_levels"]) == len(mx)
        assert df.loc[name, "mi_nats"] == pytest.approx(mi, abs=2e-3), name


# ---------------------------------------------------------------------------
# q440: weekly block maxima + Gumbel MoM — recompute with the published
# constants (beta = s*sqrt(6)/pi, mu = mean - gamma*beta, 10-block
# return level) instead of the oracle's frozen literals.
# ---------------------------------------------------------------------------
def test_block_maxima_matches_gumbel_mom(spark):
    row = _run(spark, "q440_block_maxima").iloc[0]
    ev = _events()
    sec = (ev["ts"] - pd.Timestamp("1970-01-01")) // pd.Timedelta(seconds=1)
    ev["wk"] = sec // 604800
    ev["cents"] = (100.0 * ev["value"]).round().astype("int64")
    mx = ev.groupby("wk")["cents"].max().to_numpy(float)
    mean, sd = mx.mean() / 100.0, mx.std(ddof=1) / 100.0
    beta = sd * math.sqrt(6.0) / math.pi
    mu = mean - 0.5772156649015329 * beta
    rl = mu - beta * math.log(-math.log(1 - 1.0 / 10))
    assert int(row["n_blocks"]) == len(mx)
    assert row["mean_max"] == pytest.approx(mean, abs=1e-3)
    assert row["sd_max"] == pytest.approx(sd, abs=1e-3)
    assert row["gumbel_mu"] == pytest.approx(mu, abs=1e-3)
    assert row["gumbel_beta"] == pytest.approx(beta, abs=1e-3)
    assert row["rl_10wk"] == pytest.approx(rl, abs=2e-3)


# ---------------------------------------------------------------------------
# q448: temperature-scaling NLL/Brier sweep — numpy sigmoid grid.
# ---------------------------------------------------------------------------
def test_temperature_scaling_matches_numpy(spark):
    df = _run(spark, "q448_temperature_scaling").set_index("temperature")
    ev = _events()
    c = (100.0 * ev["value"]).round().to_numpy(float)
    y = (ev["event_type"] == "purchase").to_numpy(float)
    z = (c - c.mean()) / c.std()  # population std
    nlls = {}
    for t in (0.5, 1.0, 2.0, 4.0, 8.0):
        p = np.clip(1.0 / (1.0 + np.exp(-z / t)), 1e-12, 1 - 1e-12)
        nll = float(np.mean(-(y * np.log(p) + (1 - y) * np.log(1 - p))))
        brier = float(np.mean((p - y) ** 2))
        row = df.loc[t]
        assert row["nll"] == pytest.approx(nll, abs=2e-3), t
        assert row["brier"] == pytest.approx(brier, abs=2e-3), t
        nlls[t] = nll
    best = min(nlls, key=nlls.get)
    assert int(df.loc[best, "is_best"]) == 1
    assert int(df["is_best"].sum()) == 1


# ---------------------------------------------------------------------------
# q463: mSPRT always-valid p — row-wise mixture likelihood recursion.
# ---------------------------------------------------------------------------
def test_msprt_matches_rowwise(spark):
    df = _run(spark, "q463_msprt").sort_values("t")
    ev = _events()
    p = ev[ev["event_type"] == "purchase"].copy()
    p["cents"] = (100.0 * p["value"]).round().astype("int64")
    p["signed"] = np.where(p["user_id"] % 2 == 0, p["cents"], -p["cents"])
    daily = p.groupby(p["ts"].dt.floor("D"))["signed"].sum().sort_index()
    s_cum = daily.cumsum().to_numpy(float)
    tau2 = sig2 = 4.0e8
    run_max, want_p = -np.inf, []
    for t, s in enumerate(s_cum, 1):
        llr = 0.5 * math.log(sig2 / (sig2 + t * tau2)) + s * s * tau2 / (
            2.0 * sig2 * (sig2 + t * tau2)
        )
        run_max = max(run_max, llr)
        want_p.append(min(1.0, math.exp(-run_max)))
    assert list(df["t"]) == list(range(1, len(s_cum) + 1))
    for (_, row), s, wp in zip(df.iterrows(), s_cum, want_p):
        assert int(row["s_cum_cents"]) == int(s)
        assert row["p_always_valid"] == pytest.approx(wp, abs=2e-4)
