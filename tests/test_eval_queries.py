"""Semantic tests for the round-5 eval wave (q343–q347): each statistic
is recomputed literally in Python and must agree with the relational
form — independent of the DuckDB oracle (which shares no code with
these recomputations)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from synth_transform_spark.plans import REGISTRY

from conftest import SF_DIR


def _doc_tokens():
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    return {
        int(r["doc_id"]): [t for t in r["text"].split(" ") if t]
        for _, r in docs.iterrows()
    }


def test_kneser_ney_matches_naive(spark):
    df = (
        REGISTRY["q343_kneser_ney"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("doc_id")
    )
    toks = _doc_tokens()
    c2: dict[tuple[str, str], int] = {}
    for d, ts in toks.items():
        if d % 13 == 1:
            for a, b in zip(ts, ts[1:]):
                c2[(a, b)] = c2.get((a, b), 0) + 1
    c1: dict[str, int] = {}
    n_follow: dict[str, int] = {}
    n_hist: dict[str, int] = {}
    for (a, b), n in c2.items():
        c1[a] = c1.get(a, 0) + n
        n_follow[a] = n_follow.get(a, 0) + 1
        n_hist[b] = n_hist.get(b, 0) + 1
    T = len(c2)
    D = 0.75
    checked = 0
    for d, ts in toks.items():
        if d % 13 != 0 or len(ts) < 2:
            continue
        ls_sum, n_big, n_unseen = 0, 0, 0
        for a, b in zip(ts, ts[1:]):
            pcont = n_hist.get(b, 0.5) / T if n_hist.get(b) else 0.5 / T
            if a not in c1:
                p = pcont
                n_unseen += 1
            else:
                p = max(c2.get((a, b), 0) - D, 0.0) / c1[a] + (
                    D * n_follow[a] / c1[a]
                ) * pcont
            ls_sum += round(1e6 * math.log(p))
            n_big += 1
        assert int(df.loc[d, "n_bigrams"]) == n_big
        assert int(df.loc[d, "n_unseen_prev"]) == n_unseen
        assert int(df.loc[d, "avg_score_micro"]) == math.floor(
            ls_sum / n_big
        )
        checked += 1
    assert checked > 3  # the held-out split genuinely exists


def test_class_prf_matches_naive(spark):
    df = (
        REGISTRY["q344_class_prf"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("label")
    )
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    X = np.stack(emb["embedding"].to_numpy()).astype("float64")
    y = emb["label"].to_numpy()
    labels = sorted(set(int(v) for v in y))
    cents = {
        lab: np.round(X[y == lab].mean(axis=0), 4) for lab in labels
    }
    preds = []
    for i in range(len(X)):
        d2 = {
            lab: round(float(((X[i] - c) ** 2).sum()), 4)
            for lab, c in cents.items()
        }
        preds.append(min(labels, key=lambda l: (d2[l], l)))
    preds = np.array(preds)
    f1s = []
    for lab in labels:
        tp = int(((y == lab) & (preds == lab)).sum())
        n_true = int((y == lab).sum())
        n_pred = int((preds == lab).sum())
        prec = tp / n_pred if n_pred else 0.0
        rec = tp / n_true if n_true else 0.0
        f1 = 2 * tp / (n_pred + n_true) if (n_pred + n_true) else 0.0
        f1s.append(round(1e4 * f1) / 1e4)
        assert int(df.loc[lab, "tp"]) == tp
        assert int(df.loc[lab, "n_true"]) == n_true
        assert int(df.loc[lab, "n_pred"]) == n_pred
        assert abs(df.loc[lab, "prec"] - prec) <= 1e-4
        assert abs(df.loc[lab, "rec"] - rec) <= 1e-4
        assert abs(df.loc[lab, "f1"] - f1) <= 1e-4
    acc = float((preds == y).mean())
    assert abs(df["accuracy"].iloc[0] - acc) <= 1e-4
    assert abs(df["macro_f1"].iloc[0] - sum(f1s) / len(f1s)) <= 2e-4


def test_brier_decomposition_matches_naive(spark):
    row = (
        REGISTRY["q345_brier_decomposition"]
        .spark(spark, SF_DIR)
        .toPandas()
        .iloc[0]
    )
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    x = emb["embedding"].apply(lambda v: float(v[0]))
    y = (emb["label"] >= 5).astype(int).to_numpy()
    lo, hi = x.min(), x.max()
    ci = ((x - lo) / (hi - lo) * 1e6).round().astype("int64").to_numpy()
    p = ci / 1e6
    n = len(p)
    brier = float(((p - y) ** 2).mean())
    bins = np.minimum((ci * 10) // 10**6, 9)
    rel = res = 0.0
    obar = y.mean()
    for b in range(10):
        m = bins == b
        nb = int(m.sum())
        if not nb:
            continue
        rel += nb * (p[m].mean() - y[m].mean()) ** 2
        res += nb * (y[m].mean() - obar) ** 2
    rel, res = rel / n, res / n
    unc = obar * (1 - obar)
    assert int(row["n"]) == n
    assert abs(row["brier"] - brier) <= 1e-3
    assert abs(row["reliability"] - rel) <= 1e-3
    assert abs(row["resolution"] - res) <= 1e-3
    assert abs(row["uncertainty"] - unc) <= 1e-3
    # Murphy identity: brier = rel - res + unc + within-bin variance,
    # and the within-bin variance term is non-negative
    wbv = brier - (rel - res + unc)
    assert wbv >= -1e-9


def test_degree_assortativity_matches_naive(spark):
    row = (
        REGISTRY["q346_degree_assortativity"]
        .spark(spark, SF_DIR)
        .toPandas()
        .iloc[0]
    )
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    items = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    m = items.merge(items, on="l_orderkey")
    m = m[m["l_partkey_x"] < m["l_partkey_y"]]
    und = set(zip(m["l_partkey_x"], m["l_partkey_y"]))
    edges = [(a, b) for a, b in und] + [(b, a) for a, b in und]
    deg: dict[int, int] = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    xs = [deg[s] for s, _ in edges]
    ys = [deg[d] for _, d in edges]
    M = len(edges)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(v * v for v in xs)
    syy = sum(v * v for v in ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    r = (M * sxy - sx * sy) / (
        math.sqrt(M * sxx - sx * sx) * math.sqrt(M * syy - sy * sy)
    )
    assert int(row["m_edges"]) == M
    assert int(row["n_nodes"]) == len(deg)
    assert abs(row["assortativity"] - r) <= 1e-3
    assert -1.0 <= row["assortativity"] <= 1.0


def test_textrank_matches_naive(spark):
    df = REGISTRY["q347_textrank_keywords"].spark(spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    docs = docs[docs["lang"] == "en"]
    w: dict[tuple[str, str], int] = {}
    for text in docs["text"]:
        ts = [t for t in text.split(" ") if t]
        for a, b in zip(ts, ts[1:]):
            if len(a) >= 4 and len(b) >= 4 and a != b:
                k = (min(a, b), max(a, b))
                w[k] = w.get(k, 0) + 1
    gr: dict[str, dict[str, int]] = {}
    for (u, v), n in w.items():
        gr.setdefault(u, {})[v] = n
        gr.setdefault(v, {})[u] = n
    wdeg = {u: sum(nb.values()) for u, nb in gr.items()}
    r = {u: 1_000_000 for u in gr}
    for _ in range(4):
        nxt = {}
        for v in gr:
            s = sum(
                round(r[u] * gr[u][v] / wdeg[u]) for u in gr[v]
            )
            nxt[v] = round(150000.0 + 0.85 * s)
        r = nxt
    top = sorted(r.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert len(df) == min(20, len(top))
    for i, (tok, score) in enumerate(top[: len(df)], start=1):
        assert df.iloc[i - 1]["token"] == tok
        assert int(df.iloc[i - 1]["rk"]) == i
        assert abs(df.iloc[i - 1]["score"] - round(score / 1e6, 4)) <= 1e-9
    # damped scores are bounded below by the teleport mass
    assert (df["score"] >= 0.15).all()


def _daily_series(event_type=None):
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    if event_type is not None:
        ev = ev[ev["event_type"] == event_type]
    days = pd.to_datetime(ev["ts"]).dt.normalize()
    return days.value_counts().sort_index()


def test_granger_matches_naive(spark):
    row = (
        REGISTRY["q348_granger_causality"]
        .spark(spark, SF_DIR)
        .toPandas()
        .iloc[0]
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    days = pd.to_datetime(ev["ts"]).dt.normalize()
    cal = sorted(days.unique())
    y = [int(((days == d) & (ev["event_type"] == "purchase")).sum()) for d in cal]
    x = [int(((days == d) & (ev["event_type"] == "click")).sum()) for d in cal]
    yt = np.array(y[1:], dtype=float)
    yl = np.array(y[:-1], dtype=float)
    xl = np.array(x[:-1], dtype=float)
    n = len(yt)
    A = np.column_stack([np.ones(n), yl, xl])
    bu, *_ = np.linalg.lstsq(A, yt, rcond=None)
    rss_u = float(((yt - A @ bu) ** 2).sum())
    Ar = np.column_stack([np.ones(n), yl])
    br, *_ = np.linalg.lstsq(Ar, yt, rcond=None)
    rss_r = float(((yt - Ar @ br) ** 2).sum())
    f = (rss_r - rss_u) / (rss_u / (n - 3))
    assert int(row["n"]) == n
    assert abs(row["b_ylag"] - bu[1]) <= 1e-3
    assert abs(row["b_xlag"] - bu[2]) <= 1e-3
    assert abs(row["f_stat"] - f) <= max(1e-2, 1e-3 * abs(f))


def test_pacf_matches_naive(spark):
    df = (
        REGISTRY["q349_pacf"].spark(spark, SF_DIR).toPandas().set_index("lag")
    )
    x = _daily_series().to_numpy(dtype=float)
    n = len(x)
    d = n * x - x.sum()
    den = float((d * d).sum())
    rho = {
        k: round(1e8 * float((d[:-k] * d[k:]).sum()) / den) / 1e8
        for k in range(1, 6)
    }
    # Durbin-Levinson
    phi_prev: dict[int, float] = {}
    sig = 1.0
    for k in range(1, 6):
        if k == 1:
            pkk = rho[1]
            phi = {1: pkk}
            sig = 1.0 - pkk * pkk
        else:
            num = rho[k] - sum(
                phi_prev[j] * rho[k - j] for j in range(1, k)
            )
            pkk = num / sig
            phi = {
                j: phi_prev[j] - pkk * phi_prev[k - j] for j in range(1, k)
            }
            phi[k] = pkk
            sig = sig * (1.0 - pkk * pkk)
        phi_prev = phi
        assert abs(df.loc[k, "rho"] - rho[k]) <= 1e-4
        assert abs(df.loc[k, "pacf"] - pkk) <= 1e-3
    # PACF at lag 1 equals ACF at lag 1 by construction
    assert abs(df.loc[1, "pacf"] - df.loc[1, "rho"]) <= 1e-9


def test_shuffle_advisor_matches_naive(spark):
    import hashlib

    df = (
        REGISTRY["q350_shuffle_advisor"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("n_partitions")
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    hs = [
        int(hashlib.md5(str(int(u)).encode()).hexdigest()[:8], 16)
        for u in ev["user_id"]
    ]
    for c in (8, 32, 128):
        counts: dict[int, int] = {}
        for h in hs:
            counts[h % c] = counts.get(h % c, 0) + 1
        mx, tot = max(counts.values()), sum(counts.values())
        assert int(df.loc[c, "n_used"]) == len(counts)
        assert int(df.loc[c, "n_empty"]) == c - len(counts)
        assert int(df.loc[c, "max_rows"]) == mx
        assert abs(df.loc[c, "skew_ratio"] - mx * c / tot) <= 1e-3
        assert abs(df.loc[c, "max_share"] - mx / tot) <= 1e-4
    # more partitions => max_share can only shrink or hold
    shares = [df.loc[c, "max_share"] for c in (8, 32, 128)]
    assert shares[0] >= shares[1] >= shares[2]


def test_shapley_efficiency_and_naive(spark):
    import itertools
    import math as _m

    df = (
        REGISTRY["q351_shapley_attribution"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("channel")
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["ts"] = pd.to_datetime(ev["ts"])
    fp = (
        ev[ev["event_type"] == "purchase"]
        .groupby("user_id")["ts"]
        .min()
        .to_dict()
    )
    sets: dict[int, set] = {}
    conv: dict[int, int] = {}
    for _, r in ev[ev["event_type"] != "purchase"].iterrows():
        u = int(r["user_id"])
        if u in fp and not (r["ts"] < fp[u]):
            continue
        sets.setdefault(u, set()).add(r["event_type"])
        conv[u] = 1 if u in fp else 0
    chans = sorted({c for s in sets.values() for c in s})
    uN = len(chans)
    vm: dict[frozenset, list] = {}
    for u, s in sets.items():
        k = frozenset(s)
        vm.setdefault(k, [0, 0])
        vm[k][0] += 1
        vm[k][1] += conv[u]

    def v(S):
        k = frozenset(S)
        if not k or k not in vm:
            return 0.0
        nu, nc = vm[k]
        return nc / nu

    for c in chans:
        others = [x for x in chans if x != c]
        phi = 0
        for rsz in range(uN):
            for S in itertools.combinations(others, rsz):
                w = (
                    _m.factorial(len(S))
                    * _m.factorial(uN - len(S) - 1)
                    / _m.factorial(uN)
                )
                phi += round(1e8 * w * (v(set(S) | {c}) - v(S)))
        want = round(phi / 1e8, 4)
        assert abs(df.loc[c, "phi"] - want) <= 2e-4
        assert int(df.loc[c, "n_touched"]) == sum(
            1 for s in sets.values() if c in s
        )
    # efficiency: Σ φ_c = v(full coalition)
    assert abs(df["phi"].sum() - v(set(chans))) <= 5e-4 * uN


def test_bloom_fpp_audit_matches_naive(spark):
    import hashlib

    row = (
        REGISTRY["q352_bloom_fpp_audit"]
        .spark(spark, SF_DIR)
        .toPandas()
        .iloc[0]
    )
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    mem = sorted(set(docs.loc[docs["lang"] == "en", "doc_id"].astype(int)))
    prb = sorted(set(docs.loc[docs["lang"] != "en", "doc_id"].astype(int)))
    M, K = 4096, 3

    def pos(i, d):
        return int(
            hashlib.md5(f"{i}:{d}".encode()).hexdigest()[:8], 16
        ) % M

    bits = {pos(i, d) for d in mem for i in (1, 2, 3)}
    fp = sum(
        1 for d in prb if all(pos(i, d) in bits for i in (1, 2, 3))
    )
    theory = (1 - (1 - 1 / M) ** (K * len(mem))) ** K
    assert int(row["n_members"]) == len(mem)
    assert int(row["n_probes"]) == len(prb)
    assert int(row["n_bits_set"]) == len(bits)
    assert int(row["fp_count"]) == fp
    assert abs(row["fp_rate"] - fp / len(prb)) <= 1e-4
    assert abs(row["fp_theory"] - theory) <= 1e-4


def test_tukey_hsd_matches_naive(spark):
    df = REGISTRY["q353_tukey_hsd"].spark(spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    g = docs.groupby("lang")["n_chars"]
    stats = {
        lang: (len(v), float(v.sum()), float((v**2).sum()))
        for lang, v in g
    }
    ssw = sum(
        round(1e4 * (sxx - sx * sx / n)) / 1e4
        for n, sx, sxx in stats.values()
    )
    nn = sum(n for n, _, _ in stats.values())
    msw = ssw / (nn - len(stats))
    for _, r in df.iterrows():
        na, sa, _ = stats[r["lang_a"]]
        nb, sb, _ = stats[r["lang_b"]]
        md = sa / na - sb / nb
        q = abs(md) / math.sqrt(msw / 2 * (1 / na + 1 / nb))
        assert int(r["n_a"]) == na and int(r["n_b"]) == nb
        assert abs(r["mean_diff"] - md) <= 1e-3
        assert abs(r["q_stat"] - q) <= 1e-3
    k = len(stats)
    assert len(df) == k * (k - 1) // 2


def test_dispersion_matches_naive(spark):
    df = (
        REGISTRY["q354_dispersion_test"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("event_type")
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    days = pd.to_datetime(ev["ts"]).dt.normalize()
    for et in sorted(ev["event_type"].unique()):
        x = days[ev["event_type"] == et].value_counts().to_numpy()
        n = len(x)
        var = float(x.var(ddof=1))
        mean = float(x.mean())
        d = (n - 1) * var / mean
        z = (d - (n - 1)) / math.sqrt(2 * (n - 1))
        assert int(df.loc[et, "n"]) == n
        assert abs(df.loc[et, "mean_daily"] - mean) <= 1e-3
        assert abs(df.loc[et, "var_daily"] - var) <= 1e-3
        assert abs(df.loc[et, "dispersion"] - d) <= 1e-2
        assert abs(df.loc[et, "z"] - z) <= 1e-3
        assert int(df.loc[et, "overdispersed"]) == (1 if z > 2 else 0)


def test_funnel_wilson_matches_naive(spark):
    df = (
        REGISTRY["q355_funnel_wilson_ci"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("step")
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["ts"] = pd.to_datetime(ev["ts"])
    c = ev[ev["event_type"] == "click"].groupby("user_id")["ts"].min()
    s_rows = ev[ev["event_type"] == "signup"].merge(
        c.rename("cts"), on="user_id"
    )
    s = (
        s_rows[s_rows["ts"] > s_rows["cts"]]
        .groupby("user_id")["ts"]
        .min()
    )
    p_rows = ev[ev["event_type"] == "purchase"].merge(
        s.rename("sts"), on="user_id"
    )
    p = (
        p_rows[p_rows["ts"] > p_rows["sts"]]
        .groupby("user_id")["ts"]
        .min()
    )
    n0 = ev["user_id"].nunique()
    z = 1.96
    for step, (n, k) in {
        1: (n0, len(c)),
        2: (len(c), len(s)),
        3: (len(s), len(p)),
    }.items():
        pr = k / n
        center = pr + z * z / (2 * n)
        half = z * math.sqrt(pr * (1 - pr) / n + z * z / (4 * n * n))
        denom = 1 + z * z / n
        assert int(df.loc[step, "n"]) == n
        assert int(df.loc[step, "k"]) == k
        assert abs(df.loc[step, "rate"] - pr) <= 1e-4
        assert abs(df.loc[step, "wilson_lo"] - (center - half) / denom) <= 1e-4
        assert abs(df.loc[step, "wilson_hi"] - (center + half) / denom) <= 1e-4
        # Wilson interval always contains the point estimate
        assert df.loc[step, "wilson_lo"] <= pr <= df.loc[step, "wilson_hi"]


def test_knn_graph_audit_matches_naive(spark):
    import hashlib

    df = (
        REGISTRY["q356_knn_graph_audit"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("label")
    )
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    emb = emb.assign(
        h=[hashlib.md5(str(int(v)).encode()).hexdigest() for v in emb["vec_id"]]
    ).sort_values(["h", "vec_id"]).head(256)
    ids = emb["vec_id"].astype(int).to_list()
    labels = dict(zip(ids, emb["label"].astype(int)))
    X = np.stack(emb["embedding"].to_numpy()).astype("float64")
    nrm = np.sqrt((X * X).sum(axis=1))
    S = (X @ X.T) / np.outer(nrm, nrm)
    knn: set[tuple[int, int]] = set()
    for qi, q in enumerate(ids):
        cands = sorted(
            (
                (round(S[qi, vi], 4), ids[vi])
                for vi in range(len(ids))
                if ids[vi] != q
            ),
            key=lambda t: (-t[0], t[1]),
        )[:5]
        for _, nb in cands:
            knn.add((q, nb))
    per_label: dict[int, list] = {}
    indeg: dict[int, int] = {}
    for a, b in knn:
        indeg[b] = indeg.get(b, 0) + 1
    for lab in sorted(set(labels.values())):
        nodes = [i for i in ids if labels[i] == lab]
        edges = [(a, b) for a, b in knn if labels[a] == lab]
        mutual = [(a, b) for a, b in edges if (b, a) in knn]
        mx = max((indeg.get(i, 0) for i in nodes), default=0)
        assert int(df.loc[lab, "n_nodes"]) == len(nodes)
        assert int(df.loc[lab, "n_edges"]) == len(edges)
        assert int(df.loc[lab, "n_mutual"]) == len(mutual)
        assert abs(
            df.loc[lab, "mutual_rate"] - len(mutual) / len(edges)
        ) <= 1e-4
        assert int(df.loc[lab, "max_indeg"]) == mx


def test_gini_stump_matches_naive(spark):
    df = REGISTRY["q357_gini_stump_scan"].spark(spark, SF_DIR).toPandas()
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    X = np.round(
        1e6 * np.stack(emb["embedding"].to_numpy()).astype("float64")
    ).astype("int64")
    y = emb["label"].to_numpy()
    n = len(y)
    scores = {}
    for d in range(X.shape[1]):
        thr = float(np.percentile(X[:, d], 50, method="linear"))
        left = X[:, d] <= thr
        num = 0.0
        for side in (left, ~left):
            ns = int(side.sum())
            if ns == 0:
                continue
            sc2 = sum(
                int((y[side] == lab).sum()) ** 2 for lab in set(y[side])
            )
            num += ns - sc2 / ns
        scores[d + 1] = round(num / n, 4)
    want = sorted(scores.items(), key=lambda kv: (kv[1], kv[0]))[:10]
    for i, (dim, g) in enumerate(want, start=1):
        row = df[df["rk"] == i].iloc[0]
        assert int(row["dim"]) == dim
        assert abs(row["gini_split"] - g) <= 1e-4


def test_streaming_outer_join_matches_batch(spark):
    df = (
        REGISTRY["q358_streaming_outer_join"].spark(spark, SF_DIR).toPandas()
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["ts"] = pd.to_datetime(ev["ts"])
    l = ev[ev["event_type"] == "error"][["event_id", "user_id", "ts"]]
    r = ev[ev["event_type"] == "click"][["user_id", "ts"]].rename(
        columns={"ts": "rts"}
    )
    m = l.merge(r, on="user_id")
    m = m[
        (m["rts"] >= m["ts"] - pd.Timedelta(seconds=600))
        & (m["rts"] <= m["ts"] + pd.Timedelta(seconds=600))
    ]
    w = min(l["ts"].max(), r["rts"].max()) - pd.Timedelta(hours=3)
    matched_ids = set(m["event_id"].astype(int))
    unmatched = l[
        ~l["event_id"].isin(matched_ids)
        & (l["ts"] + pd.Timedelta(seconds=600) <= w)
    ]
    got_matched = df[df["matched"] == 1]
    got_null = df[df["matched"] == 0]
    assert len(got_matched) == len(m)
    assert len(got_null) == len(unmatched)
    assert set(got_null["event_id"].astype(int)) == set(
        unmatched["event_id"].astype(int)
    )
    assert got_null["matched_ts"].isna().all()


def test_forecast_eval_matches_naive(spark):
    df = (
        REGISTRY["q359_forecast_eval"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("model")
    )
    x = _daily_series().to_list()
    # SES levels per q341's frozen recurrence
    l_int = {}
    for m in range(1, len(x) + 1):
        s = 0
        for j in range(1, m + 1):
            w = 0.5 ** (m - 1) if j == 1 else 0.5 ** (m - j + 1)
            s += round(1e6 * x[j - 1] * w)
        l_int[m] = s
    metrics = {}
    for model in ("ses", "naive"):
        ae = ape = sape = 0
        n = 0
        for t in range(2, len(x) + 1):
            xt = x[t - 1]
            if model == "ses":
                f_micro = l_int[t - 1]
            else:
                f_micro = x[t - 2] * 1_000_000
            e = abs(xt * 1_000_000 - f_micro)
            ae += e
            ape += round(1e8 * e / (1e6 * xt))
            sape += round(1e8 * 2 * e / (1e6 * xt + f_micro))
            n += 1
        metrics[model] = (n, ae, ape, sape)
    naive_mae = metrics["naive"][1] / metrics["naive"][0]
    for model, (n, ae, ape, sape) in metrics.items():
        row = df.loc[model]
        assert int(row["n"]) == n
        assert abs(row["mae"] - ae / 1e6 / n) <= 2e-4
        assert abs(row["mape"] - ape / 1e8 / n) <= 2e-4
        assert abs(row["smape"] - sape / 1e8 / n) <= 2e-4
        assert abs(row["mase"] - (ae / n) / naive_mae) <= 2e-3
    assert abs(df.loc["naive", "mase"] - 1.0) <= 1e-9  # identity


def test_power_planner_matches_naive(spark):
    df = (
        REGISTRY["q360_power_planner"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("n_per_arm")
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    clickers = set(ev.loc[ev["event_type"] == "click", "user_id"])
    buyers = set(ev.loc[ev["event_type"] == "purchase", "user_id"])
    p = len(clickers & buyers) / len(clickers)
    za, zb = 1.959964, 0.841621
    for n in (1000, 5000, 10000, 50000, 100000, 500000):
        mde1 = (
            za * math.sqrt(2 * p * (1 - p)) + zb * math.sqrt(2 * p * (1 - p))
        ) / math.sqrt(n)
        mde = (
            za * math.sqrt(2 * p * (1 - p))
            + zb * math.sqrt(p * (1 - p) + (p + mde1) * (1 - p - mde1))
        ) / math.sqrt(n)
        assert abs(df.loc[n, "baseline_rate"] - p) <= 1e-4
        assert abs(df.loc[n, "mde_abs"] - mde) <= 1e-4
    # more samples, smaller detectable effect
    mdes = df["mde_abs"].to_list()
    assert all(a >= b for a, b in zip(mdes, mdes[1:]))


def test_chunk_planner_matches_naive(spark):
    df = (
        REGISTRY["q361_chunk_planner"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("chunk_size")
    )
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    ntoks = [
        len([t for t in text.split(" ") if t]) for text in docs["text"]
    ]
    ntoks = [n for n in ntoks if n > 0]
    for c in (64, 128, 256):
        chunks = sum(-(-n // c) for n in ntoks)
        full = sum(
            (-(-n // c)) if n % c == 0 else (-(-n // c)) - 1 for n in ntoks
        )
        last = sum(c if n % c == 0 else n % c for n in ntoks)
        waste = sum((c - n % c) % c for n in ntoks)
        assert int(df.loc[c, "n_chunks"]) == chunks
        assert int(df.loc[c, "n_full"]) == full
        assert abs(df.loc[c, "mean_last_fill"] - last / len(ntoks) / c) <= 1e-4
        assert abs(df.loc[c, "waste_share"] - waste / (chunks * c)) <= 1e-4
    # tokens conserved: chunk slots minus padding equals the corpus
    waste64 = sum((64 - n % 64) % 64 for n in ntoks)
    assert int(df.loc[64, "n_chunks"]) * 64 - waste64 == sum(ntoks)


def test_anomaly_ensemble_matches_naive(spark):
    import statistics

    df = REGISTRY["q362_anomaly_ensemble"].spark(spark, SF_DIR).toPandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    days = pd.to_datetime(ev["ts"]).dt.normalize()
    got = {
        (r["event_type"], r["day"]): r for _, r in df.iterrows()
    }
    n_checked = 0
    for et in sorted(ev["event_type"].unique()):
        series = days[ev["event_type"] == et].value_counts().sort_index()
        xs = series.to_list()
        n = len(xs)
        mean = sum(xs) / n
        sd = statistics.stdev(xs)
        med = statistics.median([float(v) for v in xs])
        mad = statistics.median([abs(v - med) for v in xs])
        q1 = float(np.percentile(xs, 25, method="linear"))
        q3 = float(np.percentile(xs, 75, method="linear"))
        for day, x in series.items():
            vz = 1 if round(1e4 * abs(x - mean) / sd) > 20000 else 0
            vm = (
                1
                if round(1e4 * abs(x - med)) > round(1e4 * 3 * 1.4826 * mad)
                else 0
            )
            vi = (
                1
                if (
                    round(1e4 * x) < round(1e4 * (q1 - 1.5 * (q3 - q1)))
                    or round(1e4 * x) > round(1e4 * (q3 + 1.5 * (q3 - q1)))
                )
                else 0
            )
            key = (et, day.strftime("%Y-%m-%d"))
            if vz + vm + vi >= 1:
                r = got.pop(key)
                assert int(r["v_z"]) == vz
                assert int(r["v_mad"]) == vm
                assert int(r["v_iqr"]) == vi
                assert int(r["is_anomaly"]) == (1 if vz + vm + vi >= 2 else 0)
                n_checked += 1
            else:
                assert key not in got
    assert not got  # no extra rows
    assert n_checked == len(df)


def test_join_order_audit_matches_naive(spark):
    df = (
        REGISTRY["q363_join_order_audit"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("plan")
    )
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    est_lo = len(li) * len(o) / max(
        li["l_orderkey"].nunique(), o["o_orderkey"].nunique()
    )
    est_oc = len(o) * len(c) / max(
        o["o_custkey"].nunique(), c["c_custkey"].nunique()
    )
    act_lo = len(li.merge(o, left_on="l_orderkey", right_on="o_orderkey"))
    act_oc = len(o.merge(c, left_on="o_custkey", right_on="c_custkey"))
    act_final = len(
        li.merge(o, left_on="l_orderkey", right_on="o_orderkey").merge(
            c, left_on="o_custkey", right_on="c_custkey"
        )
    )
    assert abs(df.loc["lo_first", "est_join1"] - round(est_lo, 4)) <= 1e-6
    assert int(df.loc["lo_first", "actual_join1"]) == act_lo
    assert abs(df.loc["oc_first", "est_join1"] - round(est_oc, 4)) <= 1e-6
    assert int(df.loc["oc_first", "actual_join1"]) == act_oc
    assert int(df.loc["lo_first", "actual_final"]) == act_final
    assert int(df.loc["oc_first", "actual_final"]) == act_final
    # both plans estimate the SAME final size up to formula order
    assert (
        abs(
            df.loc["lo_first", "est_final"]
            - df.loc["oc_first", "est_final"]
        )
        <= max(1e-4 * df.loc["lo_first", "est_final"], 1.0)
    )


def test_order_dependency_matches_naive(spark):
    df = (
        REGISTRY["q364_order_dependency_mining"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index(["lhs", "rhs"])
    )
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    f = {c: (100.0 * li[c]).round().astype("int64") for c in cols}
    n = len(li)
    for a in cols:
        for b in cols:
            if a == b:
                continue
            v = int((f[a] > f[b]).sum())
            row = df.loc[(a, b)]
            assert int(row["n"]) == n
            assert int(row["n_violations"]) == v
            assert abs(row["violation_rate"] - v / n) <= 1e-4
            assert int(row["holds"]) == (1 if v / n <= 0.01 else 0)
    # discount <= tax-level sanity: at least one non-trivial invariant
    # direction must separate (rates differ between (a,b) and (b,a))
    assert (
        df.loc[("l_discount", "l_extendedprice"), "violation_rate"]
        != df.loc[("l_extendedprice", "l_discount"), "violation_rate"]
    )


def test_weighted_jaccard_matches_naive(spark):
    df = (
        REGISTRY["q365_weighted_jaccard_sources"]
        .spark(spark, SF_DIR)
        .toPandas()
    )
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    cnt: dict[str, dict[str, int]] = {}
    for _, r in docs.iterrows():
        d = cnt.setdefault(r["source"], {})
        for t in r["text"].split(" "):
            if t:
                d[t] = d.get(t, 0) + 1
    srcs = sorted(cnt)
    want = {}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            ca, cb = cnt[a], cnt[b]
            smin = sum(min(ca[t], cb[t]) for t in ca.keys() & cb.keys())
            smax = sum(ca.values()) + sum(cb.values()) - smin
            if smin > 0:
                want[(a, b)] = (smin, smax)
    assert len(df) == len(want)
    for _, r in df.iterrows():
        smin, smax = want[(r["source_a"], r["source_b"])]
        assert int(r["smin"]) == smin
        assert int(r["smax"]) == smax
        assert abs(r["weighted_jaccard"] - smin / smax) <= 1e-4
        # multiset Jaccard is bounded by the set Jaccard from above by 1
        assert 0 < r["weighted_jaccard"] <= 1


def test_circular_stats_matches_naive(spark):
    df = (
        REGISTRY["q366_circular_stats"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("event_type")
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    secs = (
        pd.to_datetime(ev["ts"]).astype("datetime64[ns]").astype("int64")
        // 10**9
    ) % 86400
    for et in sorted(ev["event_type"].unique()):
        th = 2 * math.pi * secs[ev["event_type"] == et] / 86400.0
        c = sum(round(1e6 * math.cos(t)) for t in th)
        s = sum(round(1e6 * math.sin(t)) for t in th)
        n = len(th)
        mh = ((math.atan2(s, c) + 2 * math.pi) % (2 * math.pi)) / (
            2 * math.pi
        ) * 24
        r = math.sqrt(c * c + s * s) / (1e6 * n)
        assert int(df.loc[et, "n"]) == n
        assert abs(df.loc[et, "mean_hour"] - mh) <= 1e-3
        assert abs(df.loc[et, "resultant_r"] - r) <= 1e-4
        assert 0 <= df.loc[et, "mean_hour"] < 24
        assert 0 <= df.loc[et, "resultant_r"] <= 1


def test_dedup_impact_matches_naive(spark):
    df = (
        REGISTRY["q367_dedup_impact"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("source")
    )
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    keeper = docs.groupby(docs["text"])["doc_id"].min().to_dict()
    docs = docs.assign(
        dropped=[
            0 if keeper[t] == i else 1
            for t, i in zip(docs["text"], docs["doc_id"])
        ],
        n_tok=[len([t for t in x.split(" ") if t]) for x in docs["text"]],
    )
    for src, g in docs.groupby("source"):
        saved = int(g.loc[g["dropped"] == 1, "n_tok"].sum())
        assert int(df.loc[src, "n_docs"]) == len(g)
        assert int(df.loc[src, "n_dropped"]) == int(g["dropped"].sum())
        assert int(df.loc[src, "tokens_total"]) == int(g["n_tok"].sum())
        assert int(df.loc[src, "tokens_saved"]) == saved
        assert abs(
            df.loc[src, "save_share"] - saved / g["n_tok"].sum()
        ) <= 1e-4


def test_friedman_matches_naive(spark):
    df = (
        REGISTRY["q368_friedman_test"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("event_type")
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    days = pd.to_datetime(ev["ts"]).dt.normalize()
    cal = sorted(days.unique())
    types = sorted(ev["event_type"].unique())
    n, k = len(cal), len(types)
    rsum = {t: 0.0 for t in types}
    t_sum = 0
    for d in cal:
        xs = {
            t: int(((days == d) & (ev["event_type"] == t)).sum())
            for t in types
        }
        vals = sorted(xs.values())
        ranks = {}
        for t, x in xs.items():
            lo = vals.index(x) + 1
            cnt = vals.count(x)
            ranks[t] = lo + (cnt - 1) / 2.0
        for t in types:
            rsum[t] += ranks[t]
        for x in set(xs.values()):
            c = vals.count(x)
            t_sum += c**3 - c
    q = 12.0 / (n * k * (k + 1)) * sum(v * v for v in rsum.values()) - 3 * n * (
        k + 1
    )
    qc = q / (1 - t_sum / (n * k * (k * k - 1)))
    for t in types:
        assert abs(df.loc[t, "rank_sum"] - rsum[t]) <= 1e-9
        assert abs(df.loc[t, "mean_rank"] - rsum[t] / n) <= 1e-4
        assert abs(df.loc[t, "q_stat"] - q) <= 1e-3
        assert abs(df.loc[t, "q_corrected"] - qc) <= 1e-3
    # rank sums over all treatments total n*k(k+1)/2
    assert abs(sum(rsum.values()) - n * k * (k + 1) / 2) <= 1e-9


def test_batch_mixing_matches_naive(spark):
    import hashlib

    df = (
        REGISTRY["q369_batch_mixing_audit"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("batch")
    )
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    batch = [
        int(hashlib.md5(str(int(d)).encode()).hexdigest()[:8], 16) % 16
        for d in docs["doc_id"]
    ]
    docs = docs.assign(batch=batch)
    N = len(docs)
    glob = docs["source"].value_counts().to_dict()
    for b, g in docs.groupby("batch"):
        nb = len(g)
        cnt = g["source"].value_counts().to_dict()
        clc = sum(round(1e6 * c * math.log(c)) for c in cnt.values())
        ent = math.log(nb) - clc / 1e6 / nb
        klt = sum(
            round(
                1e8 * (c / nb) * math.log((c / nb) / (glob[s] / N))
            )
            for s, c in cnt.items()
        )
        assert int(df.loc[b, "n_docs"]) == nb
        assert abs(df.loc[b, "source_entropy"] - ent) <= 1e-3
        assert abs(df.loc[b, "kl_to_global"] - klt / 1e8) <= 1e-3
        assert abs(
            df.loc[b, "max_share"] - max(cnt.values()) / nb
        ) <= 1e-4
        assert df.loc[b, "kl_to_global"] >= -1e-9  # KL is non-negative


def test_lm_model_selection_matches_naive(spark):
    df = (
        REGISTRY["q371_lm_model_selection"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("model")
    )
    toks = {
        d: ts for d, ts in _doc_tokens().items() if d % 13 == 1
    }
    uni: dict[str, int] = {}
    big: dict[tuple, int] = {}
    for ts in toks.values():
        for t in ts:
            uni[t] = uni.get(t, 0) + 1
        for a, b in zip(ts, ts[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    n = sum(uni.values())
    ll_u = sum(round(1e6 * c * math.log(c / n)) for c in uni.values()) / 1e6
    c1: dict[str, int] = {}
    for (a, _), c in big.items():
        c1[a] = c1.get(a, 0) + c
    nb = sum(big.values())
    ll_b = (
        sum(
            round(1e6 * c * math.log(c / c1[a]))
            for (a, _), c in big.items()
        )
        / 1e6
    )
    for model, (ne, kp, ll) in {
        "unigram": (n, len(uni), ll_u),
        "bigram": (nb, len(big), ll_b),
    }.items():
        row = df.loc[model]
        assert int(row["n_events"]) == ne
        assert int(row["k_params"]) == kp
        assert abs(row["loglik"] - ll) <= 1e-2
        assert abs(row["aic"] - (2 * kp - 2 * ll)) <= 2e-2
        assert abs(row["bic"] - (kp * math.log(ne) - 2 * ll)) <= 2e-2
    # bigram must fit better raw (higher loglik) — MLE nesting
    assert df.loc["bigram", "loglik"] > df.loc["unigram", "loglik"]


def test_umass_coherence_matches_naive(spark):
    df = REGISTRY["q370_umass_coherence"].spark(spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    postings: dict[str, set] = {}
    for _, r in docs.iterrows():
        for t in set(x for x in r["text"].split(" ") if len(x) >= 4):
            postings.setdefault(t, set()).add(int(r["doc_id"]))
    top = sorted(postings.items(), key=lambda kv: (-len(kv[1]), kv[0]))[:10]
    terms = []
    for i in range(10):
        for j in range(i + 1, 10):
            wi, di = top[i][0], top[i][1]
            wj, dj = top[j][0], top[j][1]
            dij = len(di & dj)
            term = round(1e6 * math.log((dij + 1) / len(dj)))
            terms.append((wi, wj, len(di), len(dj), dij, term))
    coh = sum(t[-1] for t in terms) / 1e6
    assert len(df) == 45
    for row, (wi, wj, di, dj, dij, term) in zip(df.itertuples(), terms):
        assert row.w_i == wi and row.w_j == wj
        assert int(row.d_i) == di and int(row.d_j) == dj
        assert int(row.d_ij) == dij
        assert abs(row.term - term / 1e6) <= 1e-4
        assert abs(row.coherence - coh) <= 1e-3


def test_filter_disparity_matches_naive(spark):
    df = (
        REGISTRY["q372_filter_disparity"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index(["filter", "source"])
    )
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    toks = docs["text"].apply(lambda t: len([x for x in t.split(" ") if x]))
    passes = {
        "length": docs["n_chars"] >= 100,
        "lang": docs["lang"] == "en",
        "stopword": (" " + docs["text"].str.lower() + " ").str.contains(
            " the ", regex=False
        ),
        "tokens": toks >= 20,
    }
    for f, mask in passes.items():
        grate = mask.mean()
        for src, g in docs.groupby("source"):
            n = len(g)
            np_ = int(mask[g.index].sum())
            ratio = (np_ / n) / grate
            row = df.loc[(f, src)]
            assert int(row["n"]) == n
            assert int(row["n_pass"]) == np_
            assert abs(row["pass_rate"] - np_ / n) <= 1e-4
            assert abs(row["impact_ratio"] - ratio) <= 1e-3
            assert int(row["disparate"]) == (
                1 if round(1e4 * ratio) < 8000 else 0
            )


def test_rbo_matches_naive(spark):
    df = (
        REGISTRY["q373_rank_biased_overlap"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("query_id")
    )
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    ids = emb["vec_id"].astype(int).to_list()
    X = np.stack(emb["embedding"].to_numpy()).astype("float64")
    nrm = np.sqrt((X * X).sum(axis=1))
    # int8 quantization mirror
    s = np.abs(X).max(axis=1)
    Q = np.floor(X / s[:, None] * 127.0 + 0.5).astype("int64")
    K, P = 20, 0.9
    for qi in range(5):
        q = ids.index(qi)
        exact = sorted(
            (
                (round(float(X[q] @ X[v]) / (nrm[q] * nrm[v]), 4), ids[v])
                for v in range(len(ids))
                if ids[v] != qi
            ),
            key=lambda t: (-t[0], t[1]),
        )[:K]
        approx = sorted(
            (
                (
                    round(
                        float(Q[q] @ Q[v]) * s[q] * s[v] / 16129.0
                        / (nrm[q] * nrm[v]),
                        4,
                    ),
                    ids[v],
                )
                for v in range(len(ids))
                if ids[v] != qi
            ),
            key=lambda t: (-t[0], t[1]),
        )[:K]
        ra = {nb: i + 1 for i, (_, nb) in enumerate(exact)}
        rb = {nb: i + 1 for i, (_, nb) in enumerate(approx)}
        common = {nb: max(ra[nb], rb[nb]) for nb in ra.keys() & rb.keys()}
        rbo = (
            sum(
                round(
                    1e8
                    * (1 - P)
                    * P ** (d - 1)
                    * sum(1 for m in common.values() if m <= d)
                    / d
                )
                for d in range(1, K + 1)
            )
            / 1e8
        )
        assert abs(df.loc[qi, "rbo"] - round(rbo, 4)) <= 1e-4
        assert int(df.loc[qi, "n_common"]) == len(common)
        assert 0 <= df.loc[qi, "rbo"] <= 1


def test_session_gap_sweep_matches_naive(spark):
    df = (
        REGISTRY["q374_session_gap_sweep"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("gap_sec")
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    secs = (
        pd.to_datetime(ev["ts"]).astype("datetime64[ns]").astype("int64")
        // 10**9
    )
    ev = ev.assign(sec=secs)
    import statistics

    for gap in (60, 300, 1800, 7200):
        durs = []
        nev = []
        for _, g in ev.groupby("user_id"):
            ss = sorted(g["sec"])
            cur = [ss[0]]
            for a, b in zip(ss, ss[1:]):
                if b - a > gap:
                    durs.append(cur[-1] - cur[0])
                    nev.append(len(cur))
                    cur = [b]
                else:
                    cur.append(b)
            durs.append(cur[-1] - cur[0])
            nev.append(len(cur))
        assert int(df.loc[gap, "n_sessions"]) == len(durs)
        assert abs(df.loc[gap, "mean_events"] - sum(nev) / len(nev)) <= 1e-4
        assert abs(
            df.loc[gap, "p50_duration_sec"]
            - statistics.median([float(d) for d in durs])
        ) <= 1e-6
        assert int(df.loc[gap, "max_duration_sec"]) == max(durs)
    # wider gap merges sessions: counts must be non-increasing
    ns = df["n_sessions"].to_list()
    assert all(a >= b for a, b in zip(ns, ns[1:]))


def test_fpgrowth_matches_naive(spark):
    df = (
        REGISTRY["q376_fpgrowth_itemsets"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("itemset")
    )
    import itertools

    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    days = pd.to_datetime(ev["ts"]).dt.normalize()
    baskets = (
        ev.assign(day=days)
        .groupby(["user_id", "day"])["event_type"]
        .apply(frozenset)
        .to_list()
    )
    types = sorted({t for b in baskets for t in b})
    n = len(baskets)
    want = {}
    for sz in range(2, len(types) + 1):
        for combo in itertools.combinations(types, sz):
            sup = sum(1 for b in baskets if set(combo) <= b)
            if sup / n >= 0.05:
                want[",".join(combo)] = (sz, sup)
    assert set(df.index) == set(want)
    for k, (sz, sup) in want.items():
        assert int(df.loc[k, "n_items"]) == sz
        assert int(df.loc[k, "support"]) == sup
        assert abs(df.loc[k, "support_rate"] - sup / n) <= 1e-4
    # anti-monotonicity: any frequent triple's pairs are also frequent
    for k, (sz, _) in want.items():
        if sz == 3:
            items = k.split(",")
            for pair in itertools.combinations(items, 2):
                assert ",".join(pair) in want


def test_als_recommendations_sane(spark):
    df = REGISTRY["q375_als_recommend"].spark(spark, SF_DIR).toPandas()
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    hist = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    parts = set(hist["l_partkey"].astype(int))
    seen = (
        hist.groupby("o_custkey")["l_partkey"]
        .apply(lambda v: set(v.astype(int)))
        .to_dict()
    )
    assert len(df) > 0
    assert set(df.columns) == {"c_custkey", "l_partkey", "rank"}
    assert set(df["rank"].unique()) <= {1, 2}
    assert set(df["l_partkey"].astype(int)) <= parts
    # recommendations never repeat something the customer already bought
    for _, r in df.iterrows():
        assert int(r["l_partkey"]) not in seen[int(r["c_custkey"])]
    # per-customer at most 2 rows, ranks unique within customer
    g = df.groupby("c_custkey")["rank"]
    assert (g.count() <= 2).all()
    assert (g.nunique() == g.count()).all()


def test_dynamic_session_matches_naive(spark):
    df = (
        REGISTRY["q377_streaming_dynamic_session"]
        .spark(spark, SF_DIR)
        .toPandas()
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["ts"] = pd.to_datetime(ev["ts"])
    want = []
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values("ts")
        rows = list(
            zip(
                g["ts"],
                [
                    300 if t == "error" else 1800
                    for t in g["event_type"]
                ],
                g["value"],
            )
        )
        wall = None
        sess = []
        for ts, gap, val in rows:
            end = ts + pd.Timedelta(seconds=gap)
            if wall is None or ts >= wall:
                sess.append([ts, end, 1, val])
                wall = end
            else:
                cur = sess[-1]
                cur[1] = max(cur[1], end)
                cur[2] += 1
                cur[3] += val
                wall = max(wall, end)
        for s0, s1, n, v in sess:
            want.append((uid, s0, s1, n, round(v, 4)))
    got = sorted(
        (
            int(r["user_id"]),
            r["session_start"],
            r["session_end"],
            int(r["n_events"]),
            round(float(r["total_value"]), 4),
        )
        for _, r in df.iterrows()
    )
    assert got == sorted(want)


def test_hurst_matches_naive(spark):
    df = (
        REGISTRY["q378_hurst_exponent"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("n")
    )
    x = _daily_series().to_list()
    pts = []
    for n in (8, 16, 32):
        rss = []
        for b0 in range(0, len(x) - n + 1, n):
            blk = x[b0 : b0 + n]
            if len(blk) < n:
                continue
            sx = sum(blk)
            sxx = sum(v * v for v in blk)
            if n * sxx <= sx * sx:
                continue
            cum, mn, mx = 0, 0, 0
            for v in blk:
                cum += n * v - sx
                mn, mx = min(mn, cum), max(mx, cum)
            rs = round(1e8 * (mx - mn) / math.sqrt(n * sxx - sx * sx))
            rss.append(rs)
        if not rss:
            # series shorter than one full block at this size: the query
            # (and oracle) drop the point entirely
            assert n not in df.index
            continue
        mean_rs = sum(rss) / 1e8 / len(rss)
        assert int(df.loc[n, "n_blocks"]) == len(rss)
        assert abs(df.loc[n, "mean_rs"] - mean_rs) <= 1e-3
        pts.append((math.log(n), math.log(mean_rs)))
    m = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxy = sum(a * b for a, b in pts)
    sxx = sum(a * a for a, _ in pts)
    h = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    assert abs(df["hurst"].iloc[0] - h) <= 1e-2
    assert 0.0 < df["hurst"].iloc[0] < 1.1


def test_hll_error_curve_matches_naive(spark):
    import hashlib

    df = (
        REGISTRY["q379_hll_error_curve"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("bits")
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    users = sorted(set(ev["user_id"].astype(int)))
    hs = {
        int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16)
        for u in users
    }
    from synth_transform_spark.operators.sketches import hll_alpha

    for bits in (4, 6, 8, 10):
        m = 1 << bits
        wbits = 32 - bits
        regs: dict[int, int] = {}
        for h in hs:
            b = h >> wbits
            w = h % (1 << wbits)
            rank = (
                wbits + 1
                if w == 0
                else wbits + 1 - len(bin(w)) + 2  # len('0b')
            )
            regs[b] = max(regs.get(b, 0), rank)
        sum_inv = sum(2.0**-r for r in regs.values()) + (m - len(regs))
        raw = hll_alpha(m) * m * m / sum_inv
        zeros = m - len(regs)
        est = (
            m * math.log(m / zeros)
            if raw <= 2.5 * m and zeros > 0
            else raw
        )
        assert abs(df.loc[bits, "estimate"] - round(est, 4)) <= 1e-3
        assert int(df.loc[bits, "exact"]) == len(users)
        assert abs(
            df.loc[bits, "rel_err"]
            - round((round(est, 4) - len(users)) / len(users), 4)
        ) <= 1e-3


def test_storage_write_planner_matches_naive(spark):
    df = (
        REGISTRY["q380_storage_write_planner"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("strategy")
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    days = pd.to_datetime(ev["ts"]).dt.normalize()
    ud = set(zip(ev["user_id"].astype(int), days))
    cal = sorted({d for _, d in ud})
    active = {d: sum(1 for _, dd in ud if dd == d) for d in cal}
    first = {}
    for u, d in sorted(ud, key=lambda t: t[1]):
        first.setdefault(u, d)
    cum = []
    seen = 0
    for d in cal:
        seen += sum(1 for v in first.values() if v == d)
        cum.append(seen)
    rows_snapshot = sum(cum)
    rows_append = sum(active.values())
    end_state = cum[-1]
    for strat, rw in (
        ("daily_snapshot", rows_snapshot),
        ("scd2_append", rows_append),
        ("final_rewrite", end_state),
    ):
        assert int(df.loc[strat, "rows_written"]) == rw
        assert int(df.loc[strat, "n_days"]) == len(cal)
        assert abs(
            df.loc[strat, "ratio_vs_append"] - rw / rows_append
        ) <= 1e-4
    # snapshot always costs at least as much as append
    assert (
        df.loc["daily_snapshot", "rows_written"]
        >= df.loc["scd2_append", "rows_written"]
    )


def test_burstiness_matches_naive(spark):
    df = (
        REGISTRY["q381_burstiness"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("event_type")
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    secs = (
        pd.to_datetime(ev["ts"]).astype("datetime64[ns]").astype("int64")
        // 10**9
    )
    ev = ev.assign(sec=secs)
    for et, g in ev.groupby("event_type"):
        g = g.sort_values(["sec", "event_id"])
        ss = g["sec"].to_list()
        taus = [b - a for a, b in zip(ss, ss[1:])]
        n = len(taus)
        mu = sum(taus) / n
        sigma = math.sqrt(sum(t * t for t in taus) / n - mu * mu)
        B = (sigma - mu) / (sigma + mu)
        pairs = list(zip(taus, taus[1:]))
        m = len(pairs)
        sx = sum(a for a, _ in pairs)
        sy = sum(b for _, b in pairs)
        sxx = sum(a * a for a, _ in pairs)
        syy = sum(b * b for _, b in pairs)
        sxy = sum(a * b for a, b in pairs)
        M = (m * sxy - sx * sy) / (
            math.sqrt(m * sxx - sx * sx) * math.sqrt(m * syy - sy * sy)
        )
        assert int(df.loc[et, "n"]) == n
        assert abs(df.loc[et, "mean_gap_sec"] - mu) <= 1e-3
        assert abs(df.loc[et, "burstiness"] - B) <= 1e-3
        assert abs(df.loc[et, "memory_coef"] - M) <= 1e-3
        assert -1 <= df.loc[et, "burstiness"] <= 1


def test_price_index_matches_naive(spark):
    df = (
        REGISTRY["q382_price_index"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("period")
    )
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    m = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    m["mon"] = pd.to_datetime(m["o_orderdate"]).dt.to_period("M")
    mp = (
        m.assign(
            cents=(100 * m["l_extendedprice"]).round().astype("int64"),
            q100=(100 * m["l_quantity"]).round().astype("int64"),
        )
        .groupby(["mon", "l_partkey"])[["cents", "q100"]]
        .sum()
    )
    months = sorted(mp.index.get_level_values(0).unique())
    for mi in range(1, len(months)):
        m0, m1 = months[mi - 1], months[mi]
        a = mp.loc[m0]
        b = mp.loc[m1]
        both = a.index.intersection(b.index)
        if len(both) == 0:
            assert (mi + 1) not in df.index
            continue
        ln = ld = pn = pdn = 0
        for pk in both:
            p0 = a.loc[pk, "cents"] / a.loc[pk, "q100"]
            p1 = b.loc[pk, "cents"] / b.loc[pk, "q100"]
            q0 = a.loc[pk, "q100"]
            q1 = b.loc[pk, "q100"]
            ln += round(100 * p1 * q0)
            ld += round(100 * p0 * q0)
            pn += round(100 * p1 * q1)
            pdn += round(100 * p0 * q1)
        las, paa = ln / ld, pn / pdn
        row = df.loc[mi + 1]
        assert int(row["n_parts"]) == len(both)
        assert abs(row["laspeyres"] - las) <= 1e-3
        assert abs(row["paasche"] - paa) <= 1e-3
        assert abs(row["fisher"] - math.sqrt(las * paa)) <= 1e-3


def test_double_sweep_matches_naive(spark):
    row = (
        REGISTRY["q383_double_sweep_diameter"]
        .spark(spark, SF_DIR)
        .toPandas()
        .iloc[0]
    )
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    items = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    mm = items.merge(items, on="l_orderkey")
    mm = mm[mm["l_partkey_x"] < mm["l_partkey_y"]]
    adj: dict[int, set] = {}
    for a, b in set(zip(mm["l_partkey_x"], mm["l_partkey_y"])):
        adj.setdefault(int(a), set()).add(int(b))
        adj.setdefault(int(b), set()).add(int(a))

    def bfs(src, cap=8):
        dist = {src: 0}
        frontier = [src]
        for h in range(1, cap + 1):
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = h
                        nxt.append(v)
            frontier = nxt
            if not nxt:
                break
        return dist

    seed = min(adj)
    d1 = bfs(seed)
    pivot = min(
        (n for n in d1), key=lambda n: (-d1[n], n)
    )
    d2 = bfs(pivot)
    assert int(row["seed"]) == seed
    assert int(row["pivot_node"]) == pivot
    assert int(row["ecc_seed"]) == d1[pivot]
    assert int(row["diameter_lb"]) == max(d2.values())
    assert int(row["n_reached"]) == len(d2)
    # the second sweep's eccentricity dominates the first's
    assert int(row["diameter_lb"]) >= int(row["ecc_seed"])


def test_sequence_sanity_matches_naive(spark):
    df = (
        REGISTRY["q384_sequence_sanity"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("rule")
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["ts"] = pd.to_datetime(ev["ts"])
    viol = {
        "purchase_before_click": 0,
        "signup_after_purchase": 0,
        "error_only_user": 0,
        "purchase_without_view": 0,
    }
    n_users = ev["user_id"].nunique()
    for _, g in ev.groupby("user_id"):
        mins = g.groupby("event_type")["ts"].min()
        p0 = mins.get("purchase")
        c0 = mins.get("click")
        s0 = mins.get("signup")
        v0 = mins.get("view")
        if p0 is not None and (c0 is None or p0 < c0):
            viol["purchase_before_click"] += 1
        if s0 is not None and p0 is not None and s0 > p0:
            viol["signup_after_purchase"] += 1
        if (g["event_type"] == "error").all():
            viol["error_only_user"] += 1
        if p0 is not None and v0 is None:
            viol["purchase_without_view"] += 1
    for rule, v in viol.items():
        assert int(df.loc[rule, "n_violations"]) == v
        assert int(df.loc[rule, "n_users"]) == n_users
        assert abs(df.loc[rule, "rate"] - v / n_users) <= 1e-4


def test_ltv_cohort_matches_naive(spark):
    df = (
        REGISTRY["q385_ltv_cohort"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index(["cohort", "age_weeks"])
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    secs = (
        pd.to_datetime(ev["ts"]).astype("datetime64[ns]").astype("int64")
        // 10**9
    )
    ev = ev.assign(week=secs // 604800)
    first_w = ev.groupby("user_id")["week"].min().to_dict()
    min_cw = min(first_w.values())
    cohort_users: dict[int, int] = {}
    for u, w in first_w.items():
        cohort_users[w] = cohort_users.get(w, 0) + 1
    purch = ev[ev["event_type"] == "purchase"]
    inc: dict[tuple[int, int], int] = {}
    for _, r in purch.iterrows():
        cw = first_w[int(r["user_id"])]
        age = int(r["week"]) - cw
        inc[(cw, age)] = inc.get((cw, age), 0) + round(100 * r["value"])
    ages = sorted({a for _, a in inc} | {0})
    for cw, nu in cohort_users.items():
        cum = 0
        for a in ages:
            cum += inc.get((cw, a), 0)
            key = (cw - min_cw, a)
            assert int(df.loc[key, "n_users"]) == nu
            assert abs(df.loc[key, "cum_value"] - cum / 100.0) <= 1e-6
            assert abs(
                df.loc[key, "ltv_per_user"] - round(cum / 100.0 / nu, 4)
            ) <= 1e-4
    # LTV curves are monotone in age
    for coh, g in df.groupby(level=0):
        v = g.sort_index()["cum_value"].to_list()
        assert all(x <= y for x, y in zip(v, v[1:]))


def test_ipf_raking_matches_naive(spark):
    import hashlib

    df = (
        REGISTRY["q386_ipf_raking"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index(["source", "lang"])
    )
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    half = [
        int(hashlib.md5(str(int(d)).encode()).hexdigest()[:8], 16) % 2 == 0
        for d in docs["doc_id"]
    ]
    samp = docs[pd.Series(half, index=docs.index)]
    cells = (
        samp.groupby(["source", "lang"]).size().to_dict()
    )
    s_src = set(samp["source"])
    s_lang = set(samp["lang"])
    pop = docs[docs["source"].isin(s_src) & docs["lang"].isin(s_lang)]
    tsrc = (pop.groupby("source").size() * 10**6).to_dict()
    tlang = (pop.groupby("lang").size() * 10**6).to_dict()
    w = {k: 10**6 for k in cells}
    for _ in range(3):
        cur_s: dict[str, int] = {}
        for (s, l), n in cells.items():
            cur_s[s] = cur_s.get(s, 0) + n * w[(s, l)]
        w = {
            (s, l): round(w[(s, l)] * tsrc[s] / cur_s[s])
            for (s, l) in cells
        }
        cur_l: dict[str, int] = {}
        for (s, l), n in cells.items():
            cur_l[l] = cur_l.get(l, 0) + n * w[(s, l)]
        w = {
            (s, l): round(w[(s, l)] * tlang[l] / cur_l[l])
            for (s, l) in cells
        }
    for (s, l), n in cells.items():
        assert int(df.loc[(s, l), "n_sample"]) == n
        assert abs(df.loc[(s, l), "weight"] - round(w[(s, l)] / 1e6, 4)) <= 1e-4
    # raked lang margins land on the population targets (within rounding)
    est_l = df.reset_index().assign(
        m=lambda d: d["n_sample"] * d["weight"]
    ).groupby("lang")["m"].sum()
    for l, t in tlang.items():
        assert abs(est_l[l] - t / 1e6) / (t / 1e6) <= 0.01


def test_tail_gpd_matches_naive(spark):
    row = (
        REGISTRY["q387_tail_gpd"].spark(spark, SF_DIR).toPandas().iloc[0]
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    secs = (
        pd.to_datetime(ev["ts"]).astype("datetime64[ns]").astype("int64")
        // 10**9
    )
    ss = sorted(zip(secs, ev["event_id"]))
    taus = [b[0] - a[0] for a, b in zip(ss, ss[1:])]
    u = float(np.percentile(taus, 90, method="linear"))
    exc = [t - u for t in taus if t > u]
    nu, n = len(exc), len(taus)
    mu = sum(exc) / nu
    v = (nu * sum(y * y for y in exc) - sum(exc) ** 2) / (nu * (nu - 1))
    xi = 0.5 * (1 - mu * mu / v)
    beta = mu * (1 - xi)
    q999 = u + beta / xi * ((n / nu * 0.001) ** (-xi) - 1)
    assert abs(row["threshold"] - u) <= 1e-6
    assert int(row["n_exceed"]) == nu
    assert abs(row["mean_excess"] - mu) <= 1e-3
    assert abs(row["xi"] - xi) <= 1e-3
    assert abs(row["beta"] - beta) <= 1e-3
    assert abs(row["p999_gap_sec"] - q999) <= max(1e-2, 1e-3 * q999)
    # the extrapolated p99.9 must exceed the threshold
    assert row["p999_gap_sec"] > row["threshold"]


def test_capture_recapture_matches_naive(spark):
    row = (
        REGISTRY["q388_capture_recapture"]
        .spark(spark, SF_DIR)
        .toPandas()
        .iloc[0]
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    c1 = set(ev.loc[ev["event_type"] == "click", "user_id"])
    c2 = set(ev.loc[ev["event_type"] == "view", "user_id"])
    n1, n2, m = len(c1), len(c2), len(c1 & c2)
    truth = ev["user_id"].nunique()
    est = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    se = math.sqrt(
        (n1 + 1) * (n2 + 1) * (n1 - m) * (n2 - m)
        / ((m + 1) ** 2 * (m + 2))
    )
    assert int(row["n1"]) == n1 and int(row["n2"]) == n2
    assert int(row["m"]) == m and int(row["truth"]) == truth
    assert abs(row["chapman_est"] - est) <= 1e-3
    assert abs(row["se"] - se) <= 1e-3
    assert abs(row["rel_err"] - (est - truth) / truth) <= 1e-3


def test_markov_stationary_matches_naive(spark):
    df = (
        REGISTRY["q389_markov_stationary"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("event_type")
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    secs = (
        pd.to_datetime(ev["ts"]).astype("datetime64[ns]").astype("int64")
    )
    ev = ev.assign(o=secs)
    types = sorted(ev["event_type"].unique())
    k = len(types)
    ti = {t: i for i, t in enumerate(types)}
    c = [[0] * k for _ in range(k)]
    for _, g in ev.groupby("user_id"):
        g = g.sort_values(["o", "event_id"])
        ets = g["event_type"].to_list()
        for a, b in zip(ets, ets[1:]):
            c[ti[a]][ti[b]] += 1
    r = [sum(row) for row in c]
    pi = [round(1e6 / k)] * k
    for _ in range(6):
        nxt = [0] * k
        for j in range(k):
            for i in range(k):
                if r[i]:
                    nxt[j] += round(pi[i] * c[i][j] / r[i])
        pi = nxt
    emp = ev["event_type"].value_counts()
    nn = len(ev)
    for t in types:
        assert abs(df.loc[t, "stationary_pi"] - round(pi[ti[t]] / 1e6, 4)) <= 1e-4
        assert abs(df.loc[t, "empirical_share"] - emp[t] / nn) <= 1e-4
    # the iterated distribution is a probability vector (up to rounding)
    assert abs(df["stationary_pi"].sum() - 1.0) <= 1e-3


def test_srm_guard_matches_naive(spark):
    import hashlib

    df = (
        REGISTRY["q390_srm_guard"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("scope")
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    secs = (
        pd.to_datetime(ev["ts"]).astype("datetime64[ns]").astype("int64")
        // 10**9
    )
    ev = ev.assign(week=secs // 604800)
    first_w = ev.groupby("user_id")["week"].min()
    cw0 = first_w.min()
    counts: dict[str, list] = {}
    for u, w in first_w.items():
        arm = int(hashlib.md5(str(int(u)).encode()).hexdigest()[:8], 16) % 2
        key = str(int(w - cw0))
        counts.setdefault(key, [0, 0])[arm] += 1
    overall = [0, 0]
    for n0, n1 in counts.values():
        overall[0] += n0
        overall[1] += n1
    counts["overall"] = overall
    for scope, (n0, n1) in counts.items():
        chi2 = (n0 - n1) ** 2 / (n0 + n1)
        assert int(df.loc[scope, "n0"]) == n0
        assert int(df.loc[scope, "n1"]) == n1
        assert abs(df.loc[scope, "chi2"] - chi2) <= 1e-3
        assert int(df.loc[scope, "srm_flag"]) == (
            1 if round(1e4 * chi2) > 38410 else 0
        )
    assert len(df) == len(counts)


def test_robust_location_matches_naive(spark):
    df = (
        REGISTRY["q391_robust_location"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("event_type")
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev = ev.assign(c=(100.0 * ev["value"]).round().astype("int64"))
    for et, g in ev.groupby("event_type"):
        c = g["c"].to_numpy()
        lo4 = round(100 * float(np.percentile(c, 10, method="linear")))
        hi4 = round(100 * float(np.percentile(c, 90, method="linear")))
        inband = (100 * c >= lo4) & (100 * c <= hi4)
        w4 = np.clip(100 * c, lo4, hi4)
        n = len(c)
        assert int(df.loc[et, "n"]) == n
        assert abs(df.loc[et, "mean"] - c.sum() / 100 / n) <= 1e-3
        assert abs(
            df.loc[et, "trimmed_mean"]
            - c[inband].sum() / 100 / inband.sum()
        ) <= 1e-3
        assert abs(
            df.loc[et, "winsorized_mean"] - w4.sum() / 10000 / n
        ) <= 1e-3
        assert int(df.loc[et, "n_clamped"]) == int(n - inband.sum())
        # clamping can only reduce spread-driven distance from the band
        assert lo4 / 10000.0 <= df.loc[et, "winsorized_mean"] <= hi4 / 10000.0
