"""Independent math tests for the round-8 wave (q457-q470): every check
recomputes the statistic from the raw parquet with numpy / pure Python /
an independent third implementation — never the shared oracle formula —
so a both-engines-wrong formula cannot hide behind the DuckDB gate.
Highlights: the Jaro-Winkler Catalyst expression is property-fuzzed
against DuckDB's C++ builtin (two independent implementations of the
full greedy algorithm), and the zlib signal is pinned against direct
python zlib."""

from __future__ import annotations

import math

import numpy as np
import pytest

from conftest import SF_DIR


def _events():
    import pandas as pd

    return pd.read_parquet(SF_DIR + "/events.parquet")


def _daily_counts():
    ev = _events()
    return ev.groupby(ev["ts"].dt.floor("D")).size().sort_index().to_numpy(float)


def _docs():
    import pandas as pd

    return pd.read_parquet(SF_DIR + "/documents.parquet")


# ---------------------------------------------------------------------------
# q457 Cronbach's alpha vs the direct item-matrix formula (numpy, ddof=0).
# ---------------------------------------------------------------------------
def test_cronbach_matches_item_matrix(spark):
    from synth_transform_spark.plans import REGISTRY

    got = REGISTRY["q457_cronbach_alpha"].spark(spark, SF_DIR).collect()[0]
    ev = _events()
    ev = ev.assign(c=(100.0 * ev["value"]).round())
    mat = ev.pivot_table(
        index="user_id", columns="event_type", values="c",
        aggfunc="sum", fill_value=0.0,
    )
    k = mat.shape[1]
    item_vars = mat.to_numpy().var(axis=0, ddof=0).sum()
    total_var = mat.sum(axis=1).to_numpy().var(ddof=0)
    alpha = k / (k - 1) * (1 - item_vars / total_var)
    assert got["n_users"] == len(mat)
    assert got["k_items"] == k
    assert got["alpha"] == pytest.approx(alpha, abs=2e-4)


# ---------------------------------------------------------------------------
# q458 ADF: gamma and its t statistic via numpy lstsq + (X'X)^-1 — the
# textbook OLS covariance route, independent of the Cramer closed form.
# ---------------------------------------------------------------------------
def test_adf_matches_lstsq(spark):
    from synth_transform_spark.plans import REGISTRY

    got = REGISTRY["q458_adf_test"].spark(spark, SF_DIR).collect()[0]
    ev = _events()
    y = ev.groupby(ev["ts"].dt.floor("D")).size().sort_index().to_numpy(float)
    dy = np.diff(y)
    w, u, v = dy[1:], y[1:-1], dy[:-1]
    n = len(w)
    X = np.column_stack([np.ones(n), u, v])
    coef, rss, *_ = np.linalg.lstsq(X, w, rcond=None)
    s2 = rss[0] / (n - 3)
    cov = s2 * np.linalg.inv(X.T @ X)
    assert got["n"] == n
    assert got["gamma"] == pytest.approx(coef[1], abs=2e-4)
    assert got["b_dlag"] == pytest.approx(coef[2], abs=2e-4)
    assert got["t_adf"] == pytest.approx(coef[1] / math.sqrt(cov[1, 1]), abs=2e-3)


# ---------------------------------------------------------------------------
# q459 Yuen: trimmed means / winsorized variances via SORTED-SLICE numpy —
# the rank definition the frequency-domain clamps must reproduce.
# ---------------------------------------------------------------------------
def test_yuen_matches_sorted_slices(spark):
    from synth_transform_spark.plans import REGISTRY

    got = REGISTRY["q459_yuen_trimmed_t"].spark(spark, SF_DIR).collect()[0]
    ev = _events()
    p = ev[ev["event_type"] == "purchase"]
    day = p["ts"].to_numpy().astype("datetime64[s]").astype("int64") // 86400
    weekend = ((day + 3) % 7) >= 5
    out = {}
    for label, mask in (("wd", ~weekend), ("we", weekend)):
        x = np.sort((100.0 * p.loc[mask, "value"]).round().to_numpy())
        n = len(x)
        k = n // 5
        h = n - 2 * k
        tmean = x[k : n - k].mean() / 100.0
        ywin = x.copy()
        ywin[:k] = x[k]
        ywin[n - k :] = x[n - k - 1]
        s2w = ywin.var(ddof=1)
        out[label] = (n, h, tmean, s2w * (n - 1) / (h * (h - 1)) / 1e4)
    assert got["n_wd"] == out["wd"][0] and got["n_we"] == out["we"][0]
    assert got["h_wd"] == out["wd"][1] and got["h_we"] == out["we"][1]
    assert got["tmean_wd"] == pytest.approx(out["wd"][2], abs=2e-4)
    assert got["tmean_we"] == pytest.approx(out["we"][2], abs=2e-4)
    d1, d2 = out["wd"][3], out["we"][3]
    t = (out["wd"][2] - out["we"][2]) / math.sqrt(d1 + d2)
    df = (d1 + d2) ** 2 / (d1**2 / (out["wd"][1] - 1) + d2**2 / (out["we"][1] - 1))
    assert got["t_yuen"] == pytest.approx(t, abs=2e-3)
    assert got["df"] == pytest.approx(df, abs=2e-2)


# ---------------------------------------------------------------------------
# q460 Nelson-Aalen: hand life-table loop over user durations.
# ---------------------------------------------------------------------------
def test_nelson_aalen_matches_hand_life_table(spark):
    import pandas as pd

    from synth_transform_spark.plans import REGISTRY

    rows = sorted(
        REGISTRY["q460_nelson_aalen"].spark(spark, SF_DIR).collect(),
        key=lambda r: r["dur"],
    )
    ev = _events()
    g = ev.groupby("user_id")["ts"].agg(["min", "max"])
    horizon = ev["ts"].max()
    dur = ((g["max"] - g["min"]).dt.total_seconds() // 86400).astype(int)
    churn = g["max"] <= horizon - pd.Timedelta(hours=24)
    tab = pd.DataFrame({"dur": dur, "churn": churn})
    H = V = 0.0
    got_i = 0
    for t in sorted(tab["dur"].unique()):
        n_risk = int((tab["dur"] >= t).sum())
        d = int(tab.loc[tab["dur"] == t, "churn"].sum())
        if d == 0:
            continue
        H += round(1e8 * d / n_risk) / 1e8
        V += round(1e12 * d / n_risk / n_risk) / 1e12
        r = rows[got_i]
        assert (r["dur"], r["n_risk"], r["d"]) == (t, n_risk, d)
        assert r["na_cumhaz"] == pytest.approx(H, abs=2e-4)
        assert r["na_var"] == pytest.approx(V, abs=2e-4)
        got_i += 1
    assert got_i == len(rows)


# ---------------------------------------------------------------------------
# q462 CvM: direct double loop over the pooled sample (no freq domain).
# ---------------------------------------------------------------------------
def test_cvm_matches_direct_ecdf(spark):
    from synth_transform_spark.plans import REGISTRY

    got = REGISTRY["q462_cramer_von_mises"].spark(spark, SF_DIR).collect()[0]
    ev = _events()
    p = ev[ev["event_type"] == "purchase"]
    day = p["ts"].to_numpy().astype("datetime64[s]").astype("int64") // 86400
    weekend = ((day + 3) % 7) >= 5
    x = (100.0 * p.loc[weekend, "value"]).round().to_numpy()
    y = (100.0 * p.loc[~weekend, "value"]).round().to_numpy()
    n1, n2 = len(x), len(y)
    pooled = np.concatenate([x, y])
    f = np.searchsorted(np.sort(x), pooled, side="right") / n1
    g = np.searchsorted(np.sort(y), pooled, side="right") / n2
    t_cvm = n1 * n2 / (n1 + n2) ** 2 * ((f - g) ** 2).sum()
    assert (got["n_weekend"], got["n_weekday"]) == (n1, n2)
    assert got["t_cvm"] == pytest.approx(t_cvm, abs=2e-3)


# ---------------------------------------------------------------------------
# q464 KPSS: direct numpy partial sums + Bartlett long-run variance.
# ---------------------------------------------------------------------------
def test_kpss_matches_direct(spark):
    from synth_transform_spark.plans import REGISTRY

    got = REGISTRY["q464_kpss"].spark(spark, SF_DIR).collect()[0]
    ev = _events()
    x = ev.groupby(ev["ts"].dt.floor("D")).size().sort_index().to_numpy(float)
    n = len(x)
    e = x - x.mean()
    s = np.cumsum(e)
    g = [float((e[: n - l] * e[l:]).sum()) / n for l in range(5)]
    s2 = g[0] + 2 * sum((1 - l / 5) * g[l] for l in range(1, 5))
    eta = (s**2).sum() / n**2 / s2
    assert got["n"] == n
    assert got["s2_longrun"] == pytest.approx(s2, abs=2e-3)
    assert got["kpss_level"] == pytest.approx(eta, abs=2e-4)


# ---------------------------------------------------------------------------
# q461 EB shrinkage: numpy method-of-moments recompute.
# ---------------------------------------------------------------------------
def test_eb_shrinkage_matches_numpy(spark):
    import pandas as pd

    from synth_transform_spark.plans import REGISTRY

    got = (
        REGISTRY["q461_eb_shrinkage"].spark(spark, SF_DIR)
        .toPandas()
        .sort_values("brand")
        .reset_index(drop=True)
    )
    li = pd.read_parquet(SF_DIR + "/lineitem.parquet")
    part = pd.read_parquet(SF_DIR + "/part.parquet")
    j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    g = (
        j.groupby("p_brand")
        .agg(n=("l_returnflag", "size"),
             x=("l_returnflag", lambda s: int((s == "R").sum())))
        .sort_index()
    )
    r = (g["x"] / g["n"]).to_numpy()
    m = r.mean()
    v = ((r - m) ** 2).mean()
    kp = max(0.0, m * (1 - m) / v - 1.0)
    shrunk = (g["x"].to_numpy() + kp * m) / (g["n"].to_numpy() + kp)
    np.testing.assert_array_equal(got["n_lines"].to_numpy(), g["n"].to_numpy())
    np.testing.assert_allclose(got["k_prior"].iloc[0], kp, atol=2e-3)
    np.testing.assert_allclose(got["shrunk_rate"].to_numpy(), shrunk, atol=2e-4)


# ---------------------------------------------------------------------------
# q465 BLEU: pure-Python Counter recompute of clipped corpus BLEU-2.
# ---------------------------------------------------------------------------
def test_bleu_matches_counters(spark):
    from collections import Counter, defaultdict

    from synth_transform_spark.plans import REGISTRY

    got = {
        r["source"]: r
        for r in REGISTRY["q465_corpus_bleu"].spark(spark, SF_DIR).collect()
    }
    docs = _docs()
    toks = {
        r.doc_id: [t for t in r.text.lower().split(" ") if t]
        for r in docs.itertuples()
    }
    src = {r.doc_id: r.source for r in docs.itertuples()}
    agg = defaultdict(lambda: [0, 0, 0, 0, 0, 0, set()])
    for did in sorted(toks):
        if did % 2 or did + 1 not in toks:
            continue
        c, r = toks[did], toks[did + 1]
        if not c or not r or len(c) < 2 or len(r) < 2:
            continue
        a = agg[src[did]]
        for n, idx in ((1, 0), (2, 3)):
            cg = Counter(tuple(c[i : i + n]) for i in range(len(c) - n + 1))
            rg = Counter(tuple(r[i : i + n]) for i in range(len(r) - n + 1))
            a[idx] += sum(cg.values())          # cand total
            a[idx + 1] += sum(rg.values())      # ref total
            a[idx + 2] += sum(min(v, rg[g]) for g, v in cg.items())
        a[6].add(did // 2)
    for source, a in agg.items():
        g = got[source]
        p1 = a[2] / a[0]
        p2 = a[5] / a[3]
        bp = math.exp(min(0.0, 1.0 - a[1] / a[0]))
        assert g["n_pairs"] == len(a[6])
        assert (g["cand_tokens"], g["ref_tokens"]) == (a[0], a[1])
        assert g["p1"] == pytest.approx(p1, abs=2e-4)
        assert g["p2"] == pytest.approx(p2, abs=2e-4)
        assert g["bleu2"] == pytest.approx(bp * math.sqrt(p1 * p2), abs=2e-4)
    assert set(got) == set(agg)


# ---------------------------------------------------------------------------
# q466 G^2: Counter + math.log recompute, including the top-20 ordering.
# ---------------------------------------------------------------------------
def test_dunning_g2_matches_counters(spark):
    from collections import Counter

    from synth_transform_spark.plans import REGISTRY

    rows = REGISTRY["q466_dunning_g2"].spark(spark, SF_DIR).collect()
    docs = _docs()
    bigrams = Counter()
    for r in docs.itertuples():
        t = [x for x in r.text.lower().split(" ") if x]
        bigrams.update(zip(t[:-1], t[1:]))
    left = Counter()
    right = Counter()
    for (w1, w2), c in bigrams.items():
        left[w1] += c
        right[w2] += c
    nb = sum(bigrams.values())

    def g2(w1, w2):
        k11 = bigrams[(w1, w2)]
        k12 = left[w1] - k11
        k21 = right[w2] - k11
        k22 = nb - left[w1] - right[w2] + k11
        r1, r2 = left[w1], nb - left[w1]
        c1, c2 = right[w2], nb - right[w2]
        tot = 0.0
        for k, e in ((k11, r1 * c1 / nb), (k12, r1 * c2 / nb),
                     (k21, r2 * c1 / nb), (k22, r2 * c2 / nb)):
            if k > 0:
                tot += k * math.log(k / e)
        return 2 * tot

    want = sorted(
        ((g2(w1, w2), w1, w2) for (w1, w2) in bigrams),
        key=lambda x: (-x[0], x[1], x[2]),
    )[:20]
    assert len(rows) == 20
    for row, (g, w1, w2) in zip(rows, want):
        assert (row["w1"], row["w2"]) == (w1, w2)
        assert row["g2"] == pytest.approx(g, abs=2e-3)


# ---------------------------------------------------------------------------
# q467 zlib: per-source means pinned against direct python zlib.
# ---------------------------------------------------------------------------
def test_zlib_quality_matches_direct(spark):
    import zlib
    from collections import defaultdict

    from synth_transform_spark.plans import REGISTRY

    got = {
        r["source"]: r
        for r in REGISTRY["q467_zlib_quality"].spark(spark, SF_DIR).collect()
    }
    sums = defaultdict(lambda: [0, 0, 0])
    for r in _docs().itertuples():
        raw = r.text.encode("utf-8")
        ratio4 = round(10000.0 * len(zlib.compress(raw, 6)) / len(raw))
        s = sums[r.source]
        s[0] += 1
        s[1] += ratio4
        s[2] += ratio4 < 4000
    assert set(got) == set(sums)
    for source, (n, s4, hi) in sums.items():
        g = got[source]
        assert g["n_docs"] == n
        assert g["mean_ratio"] == pytest.approx(s4 / n / 1e4, abs=2e-4)
        assert g["pct_high_compress"] == pytest.approx(hi / n, abs=2e-4)


# ---------------------------------------------------------------------------
# q468 modularity: set-based recompute of Q over the co-purchase graph.
# ---------------------------------------------------------------------------
def test_modularity_matches_sets(spark):
    from collections import Counter, defaultdict

    import pandas as pd

    from synth_transform_spark.plans import REGISTRY

    rows = REGISTRY["q468_modularity"].spark(spark, SF_DIR).collect()
    li = pd.read_parquet(SF_DIR + "/lineitem.parquet")
    part = pd.read_parquet(SF_DIR + "/part.parquet")
    brand = dict(zip(part["p_partkey"], part["p_brand"]))
    edges = set()
    for _, grp in li.groupby("l_orderkey"):
        ps = sorted(set(grp["l_partkey"]))
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    m = len(edges)
    deg = Counter()
    e_in = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
        if brand[a] == brand[b]:
            e_in[brand[a]] += 1
    d_sum = defaultdict(int)
    for p, d in deg.items():
        d_sum[brand[p]] += d
    q_total = sum(
        e_in[c] / m - (d_sum[c] / (2 * m)) ** 2 for c in d_sum
    )
    for r in rows:
        c = r["brand"]
        assert r["internal_edges"] == e_in[c]
        assert r["degree_sum"] == d_sum[c]
        assert r["contrib"] == pytest.approx(
            e_in[c] / m - (d_sum[c] / (2 * m)) ** 2, abs=2e-4
        )
        assert r["q_total"] == pytest.approx(q_total, abs=2e-3)


# ---------------------------------------------------------------------------
# q469 CORAL: numpy covariance recompute (unfrozen floats).
# ---------------------------------------------------------------------------
def test_coral_matches_numpy(spark):
    import pandas as pd

    from synth_transform_spark.plans import REGISTRY

    got = REGISTRY["q469_coral_drift"].spark(spark, SF_DIR).collect()[0]
    emb = pd.read_parquet(SF_DIR + "/embeddings.parquet")
    X = np.stack(emb["embedding"].to_numpy())[:, :16].astype(float)
    g = (emb["label"].to_numpy() % 2).astype(int)
    covs = []
    for grp in (0, 1):
        M = X[g == grp]
        covs.append(np.cov(M, rowvar=False, ddof=0))
    diff = covs[0] - covs[1]
    frob = float((diff**2).sum())
    assert (got["n_even"], got["n_odd"]) == (int((g == 0).sum()), int((g == 1).sum()))
    assert got["frob_sq"] == pytest.approx(frob, abs=2e-4)
    assert got["coral_dist"] == pytest.approx(frob / (4 * 16 * 16), abs=2e-4)


# ---------------------------------------------------------------------------
# q470 Jaro-Winkler: the Catalyst HOF expression fuzzed against DuckDB's
# C++ builtin on random pairs (two INDEPENDENT implementations of the
# greedy matching + transposition + prefix-boost algorithm), plus the
# textbook pinned values.
# ---------------------------------------------------------------------------
def test_jaro_winkler_expr_matches_duckdb_fuzz(spark):
    import random

    import duckdb
    import pyspark.sql.functions as F

    from synth_transform_spark.functions.fuzzy import jaro_winkler_expr

    rng = random.Random(8)
    rows = [
        (
            "".join(rng.choice("abcde") for _ in range(rng.randint(1, 14))),
            "".join(rng.choice("abcde") for _ in range(rng.randint(1, 14))),
        )
        for _ in range(500)
    ] + [("MARTHA", "MARHTA"), ("DWAYNE", "DUANE"), ("DIXON", "DICKSONX"),
         ("CRATE", "TRACE"), ("abc", "abc"), ("a", "b")]
    df = spark.createDataFrame(rows, "a string, b string")
    got = df.select(
        "a", "b", F.expr(jaro_winkler_expr("a", "b")).alias("jw")
    ).collect()
    con = duckdb.connect()
    for r in got:
        want = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [r["a"], r["b"]]
        ).fetchone()[0]
        assert r["jw"] == pytest.approx(want, abs=1e-12), (r["a"], r["b"])
    pinned = {("MARTHA", "MARHTA"): 0.9611111111111111,
              ("DWAYNE", "DUANE"): 0.84,
              ("DIXON", "DICKSONX"): 0.8133333333333332}
    for r in got:
        if (r["a"], r["b"]) in pinned:
            assert r["jw"] == pytest.approx(pinned[(r["a"], r["b"])], abs=1e-9)


# ===========================================================================
# Second round-8 wave (q471-q483): independent recomputations.
# ===========================================================================
def _purchase_groups():
    ev = _events()
    p = ev[ev["event_type"] == "purchase"]
    day = p["ts"].to_numpy().astype("datetime64[s]").astype("int64") // 86400
    weekend = ((day + 3) % 7) >= 5
    x = (100.0 * p.loc[weekend, "value"]).round().to_numpy()
    y = (100.0 * p.loc[~weekend, "value"]).round().to_numpy()
    return x, y


def _tie_ranks(vals):
    order = np.argsort(vals, kind="stable")
    ranks = np.empty(len(vals), float)
    sv = vals[order]
    i = 0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0
        i = j
    return ranks


# ---------------------------------------------------------------------------
# q471 Ansari-Bradley: per-observation both-end scores with tie-averaging
# (a direct rank construction, not the closed-form block sums).
# ---------------------------------------------------------------------------
def test_ansari_matches_direct_scores(spark):
    from synth_transform_spark.plans import REGISTRY

    got = REGISTRY["q471_ansari_bradley"].spark(spark, SF_DIR).collect()[0]
    x, y = _purchase_groups()
    pooled = np.concatenate([x, y])
    n = len(pooled)
    order = np.argsort(pooled, kind="stable")
    raw = np.minimum(np.arange(1, n + 1), n + 1 - np.arange(1, n + 1))
    scores = np.empty(n, float)
    sv = pooled[order]
    i = 0
    while i < n:
        j = i
        while j < n and sv[j] == sv[i]:
            j += 1
        scores[order[i:j]] = raw[i:j].mean()
        i = j
    a = scores[: len(x)].sum()
    sa, sa2 = scores.sum(), (scores**2).sum()
    n1, n2 = len(x), len(y)
    ea = n1 * sa / n
    var = n1 * n2 * (n * sa2 - sa**2) / (n**2 * (n - 1))
    assert (got["n_weekend"], got["n_weekday"]) == (n1, n2)
    assert got["ab_stat"] == pytest.approx(a, abs=2e-3)
    assert got["z"] == pytest.approx((a - ea) / math.sqrt(var), abs=2e-3)


# ---------------------------------------------------------------------------
# q472 Jonckheere-Terpstra: direct pairwise Mann-Whitney counts.
# ---------------------------------------------------------------------------
def test_jt_matches_pairwise(spark):
    import pandas as pd

    from synth_transform_spark.plans import REGISTRY

    got = REGISTRY["q472_jonckheere_terpstra"].spark(spark, SF_DIR).collect()[0]
    od = pd.read_parquet(SF_DIR + "/orders.parquet")
    od = od.assign(v=(100.0 * od["o_totalprice"]).round())
    prios = sorted(od["o_orderpriority"].unique())
    groups = [od.loc[od["o_orderpriority"] == p, "v"].to_numpy() for p in prios]
    jt2 = 0
    for i in range(len(groups)):
        for j in range(i + 1, len(groups)):
            lt = (groups[i][:, None] < groups[j][None, :]).sum()
            eq = (groups[i][:, None] == groups[j][None, :]).sum()
            jt2 += 2 * int(lt) + int(eq)
    ns = [len(g) for g in groups]
    n = sum(ns)
    mean = (n * n - sum(k * k for k in ns)) / 4.0
    var = (n * n * (2 * n + 3) - sum(k * k * (2 * k + 3) for k in ns)) / 72.0
    assert got["n"] == n
    # jt2 is emitted as an exact decimal STRING (round-10 output-width
    # promotion: int64 wraps past ~4.3e9 orders)
    assert int(got["jt2"]) == jt2
    assert got["z"] == pytest.approx(
        (jt2 / 2.0 - mean) / math.sqrt(var), abs=2e-4
    )


# ---------------------------------------------------------------------------
# q473 runs test: direct loop.
# ---------------------------------------------------------------------------
def test_runs_matches_loop(spark):
    from synth_transform_spark.plans import REGISTRY

    got = REGISTRY["q473_runs_test"].spark(spark, SF_DIR).collect()[0]
    xs = _daily_counts()
    med = float(np.percentile(xs, 50, method="linear"))
    b = xs > med
    runs = 1 + int((b[1:] != b[:-1]).sum())
    n1, n2 = int(b.sum()), int((~b).sum())
    mu = 2.0 * n1 * n2 / (n1 + n2) + 1
    var = (
        2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
        / ((n1 + n2) ** 2 * (n1 + n2 - 1))
    )
    assert (got["n_above"], got["n_below"], got["runs"]) == (n1, n2, runs)
    assert got["z"] == pytest.approx((runs - mu) / math.sqrt(var), abs=2e-4)


# ---------------------------------------------------------------------------
# q474 D'Agostino: numpy central moments from the raw values.
# ---------------------------------------------------------------------------
def test_dagostino_matches_numpy_moments(spark):
    from synth_transform_spark.plans import REGISTRY

    got = REGISTRY["q474_dagostino_k2"].spark(spark, SF_DIR).collect()[0]
    x, y = _purchase_groups()
    v = np.concatenate([x, y])
    n = len(v)
    c = v - v.mean()
    m2, m3, m4 = (c**2).mean(), (c**3).mean(), (c**4).mean()
    g1 = m3 / m2**1.5
    g2 = m4 / m2**2
    yv = g1 * math.sqrt((n + 1) * (n + 3) / (6.0 * (n - 2)))
    b2 = 3.0 * (n * n + 27 * n - 70) * (n + 1) * (n + 3) / (
        (n - 2.0) * (n + 5) * (n + 7) * (n + 9)
    )
    w2 = math.sqrt(2 * (b2 - 1)) - 1
    delta = 1 / math.sqrt(math.log(math.sqrt(w2)))
    alpha = math.sqrt(2 / (w2 - 1))
    z1 = delta * math.log(yv / alpha + math.sqrt((yv / alpha) ** 2 + 1))
    eg = 3.0 * (n - 1) / (n + 1)
    vg = 24.0 * n * (n - 2) * (n - 3) / ((n + 1) ** 2 * (n + 3) * (n + 5))
    xx = (g2 - eg) / math.sqrt(vg)
    b1 = (
        6.0 * (n * n - 5 * n + 2) / ((n + 7) * (n + 9))
        * math.sqrt(6.0 * (n + 3) * (n + 5) / (n * (n - 2) * (n - 3)))
    )
    a = 6.0 + 8.0 / b1 * (2.0 / b1 + math.sqrt(1 + 4.0 / b1**2))
    z2 = (
        (1 - 2.0 / (9 * a))
        - ((1 - 2.0 / a) / (1 + xx * math.sqrt(2.0 / (a - 4)))) ** (1.0 / 3)
    ) / math.sqrt(2.0 / (9 * a))
    assert got["n"] == n
    assert got["skew_g1"] == pytest.approx(g1, abs=2e-4)
    assert got["kurt_g2"] == pytest.approx(g2, abs=2e-4)
    assert got["z_skew"] == pytest.approx(z1, abs=2e-3)
    assert got["z_kurt"] == pytest.approx(z2, abs=2e-3)
    assert got["k2"] == pytest.approx(z1**2 + z2**2, abs=2e-2)


# ---------------------------------------------------------------------------
# q475 Breslow-Day: numpy recompute + root-validity property per stratum.
# ---------------------------------------------------------------------------
def test_breslow_day_matches_numpy(spark):
    import pandas as pd

    from synth_transform_spark.plans import REGISTRY

    got = REGISTRY["q475_breslow_day"].spark(spark, SF_DIR).collect()[0]
    li = pd.read_parquet(SF_DIR + "/lineitem.parquet")
    yr = li["l_shipdate"].dt.year
    exp = li["l_discount"] >= 0.06
    ret = li["l_returnflag"] == "R"
    cells = []
    for y in sorted(yr.unique()):
        m = yr == y
        a = int((m & exp & ret).sum())
        b = int((m & exp & ~ret).sum())
        c = int((m & ~exp & ret).sum())
        d = int((m & ~exp & ~ret).sum())
        cells.append((a, b, c, d))
    num = sum(a * d / (a + b + c + d) for a, b, c, d in cells)
    den = sum(b * c / (a + b + c + d) for a, b, c, d in cells)
    orr = num / den
    bd = 0.0
    for a, b, c, d in cells:
        n = a + b + c + d
        r1, c1 = a + b, a + c
        A, B, C = orr - 1, orr * (r1 + c1) + (n - r1 - c1), orr * r1 * c1
        at = (B - math.sqrt(B * B - 4 * A * C)) / (2 * A)
        # root validity: margins must stay positive
        assert max(0.0, r1 + c1 - n) < at < min(r1, c1)
        var = 1.0 / (
            1 / at + 1 / (r1 - at) + 1 / (c1 - at) + 1 / (n - r1 - c1 + at)
        )
        bd += (a - at) ** 2 / var
    assert got["k_strata"] == len(cells)
    assert got["or_mh"] == pytest.approx(orr, abs=2e-3)
    assert got["bd_stat"] == pytest.approx(bd, abs=2e-2)


# ---------------------------------------------------------------------------
# q476 Chow: per-segment lstsq RSS.
# ---------------------------------------------------------------------------
def test_chow_matches_lstsq(spark):
    from synth_transform_spark.plans import REGISTRY

    got = REGISTRY["q476_chow_test"].spark(spark, SF_DIR).collect()[0]
    ev = _events()
    p = ev[ev["event_type"] == "purchase"]
    y = (
        p.assign(c=(100.0 * p["value"]).round())
        .groupby(p["ts"].dt.floor("D"))["c"]
        .sum()
        .sort_index()
        .to_numpy(float)
    )
    n = len(y)
    tau = n // 2
    t = np.arange(1, n + 1, dtype=float)

    def rss(tt, yy):
        X = np.column_stack([np.ones(len(tt)), tt])
        return float(np.linalg.lstsq(X, yy, rcond=None)[1][0])

    rp = rss(t, y)
    r1 = rss(t[:tau], y[:tau])
    r2 = rss(t[tau:], y[tau:])
    f = ((rp - r1 - r2) / 2.0) / ((r1 + r2) / (n - 4))
    assert (got["n"], got["break_t"]) == (n, tau)
    assert got["rss_pooled"] == pytest.approx(rp, rel=1e-6)
    assert got["rss_split"] == pytest.approx(r1 + r2, rel=1e-6)
    assert got["f_chow"] == pytest.approx(f, abs=2e-3)


# ---------------------------------------------------------------------------
# q477 Theta: the closed-form dyadic-weight sum must equal the SES
# RECURSION (a pure-Python fold — a different algorithm).
# ---------------------------------------------------------------------------
def test_theta_matches_ses_fold(spark):
    from synth_transform_spark.plans import REGISTRY

    rows = sorted(
        REGISTRY["q477_theta_forecast"].spark(spark, SF_DIR).collect(),
        key=lambda r: r["h"],
    )
    xs = _daily_counts()
    n = len(xs)
    t = np.arange(1, n + 1, dtype=float)
    b, a = np.polyfit(t, xs, 1)
    z = 2 * xs - (a + b * t)
    lvl = z[0]
    for k in range(1, n):
        lvl = 0.5 * z[k] + 0.5 * lvl
    for r, h in zip(rows, range(1, 8)):
        assert r["h"] == h
        want = 0.5 * lvl + 0.5 * (a + b * (n + h))
        assert r["forecast"] == pytest.approx(want, abs=2e-3)


# ---------------------------------------------------------------------------
# q478 Croston: SES folds on demand sizes and intervals.
# ---------------------------------------------------------------------------
def test_croston_matches_ses_folds(spark):
    import pandas as pd

    from synth_transform_spark.plans import REGISTRY

    got = REGISTRY["q478_croston"].spark(spark, SF_DIR).collect()[0]
    li = pd.read_parquet(SF_DIR + "/lineitem.parquet")
    part = pd.read_parquet(SF_DIR + "/part.parquet")
    keep = part.loc[part["p_brand"] == "Brand#13", "p_partkey"]
    sub = li[li["l_partkey"].isin(set(keep))]
    day = (
        sub["l_shipdate"].to_numpy().astype("datetime64[D]").astype("int64")
    )
    z = (
        pd.DataFrame({"d": day, "q": sub["l_quantity"].round()})
        .groupby("d")["q"]
        .sum()
        .sort_index()
    )
    di = z.index.to_numpy() - z.index.min() + 1
    ivals = np.diff(np.concatenate([[0], di]))

    def fold(vs):
        lvl = vs[0]
        for v in vs[1:]:
            lvl = 0.5 * v + 0.5 * lvl
        return lvl

    zh, ph = fold(z.to_numpy(float)), fold(ivals.astype(float))
    assert got["n_demand_days"] == len(z)
    assert got["z_hat"] == pytest.approx(zh, abs=2e-3)
    assert got["p_hat"] == pytest.approx(ph, abs=2e-3)
    assert got["croston_rate"] == pytest.approx(zh / ph, abs=2e-3)


# ---------------------------------------------------------------------------
# q479 ESD: numpy iterative removal loop.
# ---------------------------------------------------------------------------
def test_grubbs_esd_matches_loop(spark):
    import pandas as pd

    from synth_transform_spark.plans import REGISTRY

    rows = sorted(
        REGISTRY["q479_grubbs_esd"].spark(spark, SF_DIR).collect(),
        key=lambda r: r["round"],
    )
    ev = _events()
    p = ev[ev["event_type"] == "purchase"]
    df = pd.DataFrame(
        {"id": p["event_id"].to_numpy(),
         "x": (100.0 * p["value"]).round().to_numpy()}
    )
    for i, row in enumerate(rows, 1):
        mean = df["x"].mean()
        sd = df["x"].std(ddof=1)
        r = (df["x"] - mean).abs() / sd
        cand = (
            df.assign(r=r)
            .sort_values(["r", "x", "id"], ascending=[False, False, True])
            .iloc[0]
        )
        assert row["round"] == i
        assert row["event_id"] == int(cand["id"])
        assert row["x_cents"] == int(cand["x"])
        assert row["r_stat"] == pytest.approx(float(cand["r"]), abs=2e-4)
        df = df[df["id"] != int(cand["id"])]


# ---------------------------------------------------------------------------
# q481 Mood: direct numpy median + chi-square table.
# ---------------------------------------------------------------------------
def test_mood_matches_direct(spark):
    from synth_transform_spark.plans import REGISTRY

    rows = REGISTRY["q481_mood_median"].spark(spark, SF_DIR).collect()
    ev = _events()
    v = (100.0 * ev["value"]).round()
    med = float(np.percentile(v.to_numpy(), 50, method="linear"))
    chi = 0.0
    want = {}
    ta = int((v > med).sum())
    tb = int((v <= med).sum())
    n = ta + tb
    for t in sorted(ev["event_type"].unique()):
        m = ev["event_type"] == t
        above = int((v[m] > med).sum())
        beloweq = int((v[m] <= med).sum())
        nt = above + beloweq
        ea, eb = nt * ta / n, nt * tb / n
        contrib = (above - ea) ** 2 / ea + (beloweq - eb) ** 2 / eb
        chi += contrib
        want[t] = (above, beloweq, ea, contrib)
    for r in rows:
        above, beloweq, ea, contrib = want[r["event_type"]]
        assert (r["above"], r["beloweq"]) == (above, beloweq)
        assert r["e_above"] == pytest.approx(ea, abs=2e-3)
        assert r["contrib"] == pytest.approx(contrib, abs=2e-3)
        assert r["chi2_total"] == pytest.approx(chi, abs=2e-2)


# ---------------------------------------------------------------------------
# q482 Cochran's Q: direct matrix formula.
# ---------------------------------------------------------------------------
def test_cochran_q_matches_matrix(spark):
    from synth_transform_spark.plans import REGISTRY

    got = REGISTRY["q482_cochran_q"].spark(spark, SF_DIR).collect()[0]
    ev = _events()
    mat = (
        ev.assign(one=1, d=ev["ts"].dt.floor("D"))
        .pivot_table(index=["user_id", "d"], columns="event_type",
                     values="one", aggfunc="max", fill_value=0)
    )
    X = mat[["click", "purchase", "error"]].to_numpy()
    k = 3
    C = X.sum(axis=0)
    R = X.sum(axis=1)
    q = (k - 1) * (k * (C**2).sum() - C.sum() ** 2) / (
        k * R.sum() - (R**2).sum()
    )
    assert got["n"] == len(mat)
    assert (got["n_click"], got["n_purchase"], got["n_error"]) == tuple(
        int(c) for c in C
    )
    assert got["q_stat"] == pytest.approx(q, abs=2e-4)


# ---------------------------------------------------------------------------
# q480 rich club: set recompute on the q468 edge relation.
# ---------------------------------------------------------------------------
def test_rich_club_matches_sets(spark):
    from collections import Counter

    import pandas as pd

    from synth_transform_spark.plans import REGISTRY

    rows = {
        r["k"]: r
        for r in REGISTRY["q480_rich_club"].spark(spark, SF_DIR).collect()
    }
    li = pd.read_parquet(SF_DIR + "/lineitem.parquet")
    edges = set()
    for _, grp in li.groupby("l_orderkey"):
        ps = sorted(set(grp["l_partkey"]))
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    for k in (2, 4, 8):
        nodes = {p for p, d in deg.items() if d > k}
        if len(nodes) <= 1:
            assert k not in rows
            continue
        ek = sum(1 for a, b in edges if a in nodes and b in nodes)
        r = rows[k]
        assert (r["n_nodes"], r["e_k"]) == (len(nodes), ek)
        assert r["phi"] == pytest.approx(
            2.0 * ek / (len(nodes) * (len(nodes) - 1)), abs=2e-4
        )


# ---------------------------------------------------------------------------
# q470 unicode semantics pin: our expression is CHAR-based, DuckDB's
# builtin BYTE-based — they agree exactly on ASCII (q470's domain) and
# this test pins the documented divergence on multibyte input.
# ---------------------------------------------------------------------------
def test_jaro_winkler_unicode_semantics(spark):
    import duckdb
    import pyspark.sql.functions as F

    from synth_transform_spark.functions.fuzzy import jaro_winkler_expr

    df = spark.createDataFrame([("café", "cafe")], "a string, b string")
    got = df.select(F.expr(jaro_winkler_expr("a", "b")).alias("jw")).collect()
    # char-based: m=3, t=0, prefix 3 -> 0.8333 + 0.3*(1-0.8333)
    assert got[0]["jw"] == pytest.approx(0.8833333333333333, abs=1e-9)
    duck = duckdb.connect().execute(
        "SELECT jaro_winkler_similarity('café', 'cafe')"
    ).fetchone()[0]
    assert duck == pytest.approx(0.8483333333333334, abs=1e-9)  # byte-based


# ===========================================================================
# Closing wave (q484-q488): independent recomputations.
# ===========================================================================
def test_lepage_matches_direct_ranks(spark):
    from synth_transform_spark.plans import REGISTRY

    got = REGISTRY["q484_lepage"].spark(spark, SF_DIR).collect()[0]
    x, y = _purchase_groups()
    pooled = np.concatenate([x, y])
    n1, n2, n = len(x), len(y), len(pooled)
    ranks = _tie_ranks(pooled)
    w1 = ranks[:n1].sum()
    # tie-corrected rank-sum variance
    ties = 0
    for v in np.unique(pooled):
        t = int((pooled == v).sum())
        ties += t**3 - t
    var_w = n1 * n2 * (n + 1) / 12.0 - n1 * n2 * ties / (12.0 * n * (n - 1))
    z_w = (w1 - n1 * (n + 1) / 2.0) / math.sqrt(var_w)
    assert got["z_wilcoxon"] == pytest.approx(z_w, abs=2e-3)
    # z_ansari must equal q471's z on the same frame
    from synth_transform_spark.plans import REGISTRY as R

    ab = R["q471_ansari_bradley"].spark(spark, SF_DIR).collect()[0]
    assert got["z_ansari"] == pytest.approx(ab["z"], abs=2e-4)
    assert got["lepage_l"] == pytest.approx(
        round(got["z_wilcoxon"], 4) ** 2 + round(got["z_ansari"], 4) ** 2,
        abs=2e-3,
    )


def test_cucconi_matches_direct_ranks(spark):
    from synth_transform_spark.plans import REGISTRY

    got = REGISTRY["q485_cucconi"].spark(spark, SF_DIR).collect()[0]
    x, y = _purchase_groups()
    pooled = np.concatenate([x, y])
    n1, n2, n = len(x), len(y), len(pooled)
    r = _tie_ranks(pooled)[:n1]
    s = n + 1 - r
    den = math.sqrt(n1 * n2 * (n + 1) * (2 * n + 1) * (8 * n + 11) / 5.0)
    u = (6 * (r**2).sum() - n1 * (n + 1) * (2 * n + 1)) / den
    v = (6 * (s**2).sum() - n1 * (n + 1) * (2 * n + 1)) / den
    rho = 2.0 * (n * n - 4) / ((2 * n + 1) * (8 * n + 11)) - 1
    c = (u * u + v * v - 2 * rho * u * v) / (2 * (1 - rho * rho))
    assert (got["n_weekend"], got["n_weekday"]) == (n1, n2)
    assert got["u_stat"] == pytest.approx(u, abs=2e-3)
    assert got["v_stat"] == pytest.approx(v, abs=2e-3)
    assert got["cucconi_c"] == pytest.approx(c, abs=2e-3)


def test_page_trend_matches_direct(spark):
    import pandas as pd

    from synth_transform_spark.plans import REGISTRY

    got = REGISTRY["q486_page_trend"].spark(spark, SF_DIR).collect()[0]
    ev = _events()
    d = ev["ts"].to_numpy().astype("datetime64[s]").astype("int64") // 86400
    daily = pd.Series(1, index=d).groupby(level=0).sum().sort_index()
    df = pd.DataFrame(
        {"wk": (daily.index + 3) // 7, "pos": (daily.index + 3) % 7 + 1,
         "x": daily.to_numpy()}
    )
    full = df.groupby("wk").size()
    df = df[df["wk"].isin(full[full == 7].index)]
    b = df["wk"].nunique()
    rj = np.zeros(8)
    for _, wkdf in df.groupby("wk"):
        ranks = _tie_ranks(wkdf["x"].to_numpy(float))
        for pos, rk in zip(wkdf["pos"], ranks):
            rj[pos] += rk
    L = sum(j * rj[j] for j in range(1, 8))
    e = b * 7 * 64 / 4.0
    sd = math.sqrt(b * 49 * 8 * 48 / 144.0)
    assert got["n_weeks"] == b
    assert got["l_stat"] == pytest.approx(L, abs=2e-3)
    assert got["z"] == pytest.approx((L - e) / sd, abs=2e-3)


def test_xi_matches_direct_walk(spark):
    from synth_transform_spark.plans import REGISTRY

    got = REGISTRY["q487_xi_correlation"].spark(spark, SF_DIR).collect()[0]
    ev = _events()
    day = ev["ts"].dt.floor("D")
    x = (
        ev[ev["event_type"] == "click"].groupby(day[ev["event_type"] == "click"])
        .size()
        .reindex(sorted(day.unique()), fill_value=0)
    )
    y = (
        ev[ev["event_type"] == "purchase"]
        .groupby(day[ev["event_type"] == "purchase"])
        .size()
        .reindex(sorted(day.unique()), fill_value=0)
    )
    n = len(x)
    order = np.lexsort((np.arange(n), x.to_numpy()))
    yv = y.to_numpy()
    r = np.array([(yv <= yi).sum() for yi in yv], dtype=float)
    l = np.array([(yv >= yi).sum() for yi in yv], dtype=float)
    rw = r[order]
    s1 = np.abs(np.diff(rw)).sum()
    xi = 1 - n * s1 / (2 * (l * (n - l)).sum())
    assert got["n_days"] == n
    assert got["s1"] == int(s1)
    assert got["xi"] == pytest.approx(xi, abs=2e-4)


def test_hopkins_matches_direct(spark):
    import hashlib

    import pandas as pd

    from synth_transform_spark.plans import REGISTRY

    got = REGISTRY["q488_hopkins"].spark(spark, SF_DIR).collect()[0]
    emb = pd.read_parquet(SF_DIR + "/embeddings.parquet")
    X = np.stack(emb["embedding"].to_numpy())[:, :8].astype(float)
    ids = emb["vec_id"].to_numpy()
    md5s = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
    real_idx = np.argsort(md5s, kind="stable")[:32]
    mn, mx = X.min(axis=0), X.max(axis=0)
    syn = np.zeros((32, 8))
    for i in range(1, 33):
        for j in range(1, 9):
            h = hashlib.md5(f"hop_{i}_{j}".encode()).hexdigest()[:8]
            u = int(h, 16) / 4294967296.0
            syn[i - 1, j - 1] = mn[j - 1] + (mx[j - 1] - mn[j - 1]) * u
    su = sw = 0
    for p in syn:
        d = np.sqrt(((X - p) ** 2).sum(axis=1)).min()
        su += round(1e8 * d)
    for idx in real_idx:
        d2 = ((X - X[idx]) ** 2).sum(axis=1)
        d2[idx] = np.inf
        sw += round(1e8 * math.sqrt(d2.min()))
    assert got["sum_u"] == pytest.approx(su / 1e8, abs=2e-4)
    assert got["sum_w"] == pytest.approx(sw / 1e8, abs=2e-4)
    assert got["hopkins"] == pytest.approx(su / (su + sw), abs=2e-4)


# ---------------------------------------------------------------------------
# q489 ROUGE-L: the prefix-max DP must equal the classic two-row LCS DP
# (sequential inner loop — a different algorithm than the query's form).
# ---------------------------------------------------------------------------
def _lcs(a, b):
    prev = [0] * (len(b) + 1)
    for w in a:
        cur = [0]
        for j, t in enumerate(b, 1):
            cur.append(max(prev[j], cur[-1], prev[j - 1] + (t == w)))
        prev = cur
    return prev[-1]


# slow tier (round-12 verdict #1): multi-minute independent-recompute
# redundancy; run with -m "" (see pytest.ini)
@pytest.mark.slow
def test_rouge_l_matches_two_row_dp(spark):
    from collections import defaultdict

    from synth_transform_spark.plans import REGISTRY

    got = {
        r["source"]: r
        for r in REGISTRY["q489_rouge_l"].spark(spark, SF_DIR).collect()
    }
    docs = _docs()
    toks = {
        r.doc_id: [t for t in r.text.lower().split(" ") if t][:120]
        for r in docs.itertuples()
    }
    src = {r.doc_id: r.source for r in docs.itertuples()}
    agg = defaultdict(lambda: [0, 0, 0])  # n, total_lcs, f8_sum
    for did in sorted(toks):
        if did % 2 or did + 1 not in toks:
            continue
        a, b = toks[did], toks[did + 1]
        if not a or not b:
            continue
        lcs = _lcs(a, b)
        p, r = lcs / len(a), lcs / len(b)
        f1 = 0.0 if lcs == 0 else 2 * p * r / (p + r)
        s = agg[src[did]]
        s[0] += 1
        s[1] += lcs
        s[2] += round(1e8 * f1)
    assert set(got) == set(agg)
    for source, (n, tl, f8) in agg.items():
        g = got[source]
        assert g["n_pairs"] == n
        assert g["total_lcs"] == tl
        assert g["mean_rouge_l_f1"] == pytest.approx(f8 / n / 1e8, abs=2e-4)
