"""Semantic tests for the inferential-stats / eval queries (q314+):
each statistic is recomputed literally in Python (naive ranks / pair
counts) and must agree with the domain-collapsed relational form."""

from __future__ import annotations

import math

import pandas as pd

from synth_transform_spark.plans import REGISTRY

from conftest import SF_DIR


def _avg_ranks(values):
    """Average ranks (1-based, ties share the mean rank)."""
    order = sorted(range(len(values)), key=lambda i: values[i])
    ranks = [0.0] * len(values)
    i = 0
    while i < len(order):
        j = i
        while j + 1 < len(order) and values[order[j + 1]] == values[order[i]]:
            j += 1
        r = (i + j + 2) / 2.0  # mean of 1-based positions i+1..j+1
        for k in range(i, j + 1):
            ranks[order[k]] = r
        i = j + 1
    return ranks


def test_rank_sum_matches_naive_ranks(spark):
    df = (
        REGISTRY["q314_rank_sum_test"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("event_type")
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["v"] = (10000.0 * ev["value"]).round().astype("int64")
    for et, g in ev.groupby("event_type"):
        vals = list(g["v"])
        grp = list((g["user_id"] % 2 == 1).astype(int))
        ranks = _avg_ranks(vals)
        n1 = sum(grp)
        n2 = len(grp) - n1
        r1 = sum(r for r, t in zip(ranks, grp) if t == 1)
        u1 = r1 - n1 * (n1 + 1) / 2.0
        n = n1 + n2
        # tie term from value multiplicities
        from collections import Counter

        ties = sum(c**3 - c for c in Counter(vals).values())
        var = n1 * n2 / 12.0 * ((n + 1) - ties / (n * (n - 1)))
        z = (u1 - n1 * n2 / 2.0) / math.sqrt(var)
        row = df.loc[et]
        assert int(row["n1"]) == n1 and int(row["n2"]) == n2
        assert int(row["two_u"]) == round(2 * u1)
        assert abs(row["z"] - z) <= 1e-3
    # z must flag nothing absurd: cohorts are a random split
    assert df["z"].abs().max() < 10


def test_kruskal_wallis_matches_naive(spark):
    df = (
        REGISTRY["q315_kruskal_wallis"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("lang")
    )
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    from collections import Counter

    for lang, g in docs.groupby("lang"):
        vals = list(g["n_chars"])
        ranks = _avg_ranks(vals)
        n = len(vals)
        srcs = list(g["source"])
        groups = sorted(set(srcs))
        h = 0.0
        for s in groups:
            rj = sum(r for r, src in zip(ranks, srcs) if src == s)
            nj = srcs.count(s)
            h += rj * rj / nj
        h = 12.0 / (n * (n + 1)) * h - 3.0 * (n + 1)
        ties = sum(c**3 - c for c in Counter(vals).values())
        h_corr = h / (1.0 - ties / (n**3 - n))
        row = df.loc[lang]
        assert int(row["n"]) == n
        assert int(row["k"]) == len(groups)
        assert abs(row["h"] - h) <= 2e-3
        assert abs(row["h_tie_corr"] - h_corr) <= 2e-3
        assert row["h_tie_corr"] >= row["h"] - 1e-9  # correction inflates H


def test_average_precision_matches_naive(spark):
    df = REGISTRY["q316_average_precision"].spark(spark, SF_DIR).toPandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    v = (10000.0 * ev["value"]).round().astype("int64")
    pos = (ev["event_type"] == "purchase").astype(int)
    agg = (
        pd.DataFrame({"v": v, "pos": pos})
        .groupby("v")
        .agg(p=("pos", "sum"), c=("pos", "size"))
        .sort_index(ascending=False)
    )
    cumpos = agg["p"].cumsum()
    cumall = agg["c"].cumsum()
    n_pos = int(agg["p"].sum())
    ap = float((agg["p"] * cumpos / cumall).sum() / n_pos)
    row = df.iloc[0]
    assert int(row["n_pos"]) == n_pos
    assert int(row["n"]) == int(agg["c"].sum())
    assert abs(row["avg_precision"] - ap) <= 1e-3
    # AP of a random-ish score sits near prevalence, never below a tenth
    assert row["avg_precision"] >= row["prevalence"] * 0.5
    assert row["avg_precision"] <= 1.0


def test_mcnemar_counts_partition(spark):
    df = REGISTRY["q317_mcnemar"].spark(spark, SF_DIR).toPandas()
    row = df.iloc[0]
    n = int(row["n"])
    parts = (
        int(row["both_right"])
        + int(row["b"])
        + int(row["c"])
        + int(row["both_wrong"])
    )
    assert parts == n  # the four cells partition the eval set
    # accuracies decompose from the same cells
    assert row["acc_a"] == round((row["both_right"] + row["b"]) / n, 4)
    assert row["acc_b"] == round((row["both_right"] + row["c"]) / n, 4)
    b, c = int(row["b"]), int(row["c"])
    if b + c:
        want = (abs(b - c) - 1) ** 2 / (b + c)
        assert abs(row["chi2_cc"] - want) <= 1e-3
    else:
        assert row["chi2_cc"] == 0.0


def test_mcnemar_predictions_literal(spark):
    """The two heuristics themselves recomputed in Python."""
    df = REGISTRY["q317_mcnemar"].spark(spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    y = docs["lang"] == "en"
    pa = (" " + docs["text"].str.lower() + " ").str.contains(" the ", regex=False)
    toks = docs["text"].str.split(" ").apply(lambda t: [x for x in t if x])
    avg_len = docs["text"].str.replace(" ", "", regex=False).str.len() / toks.str.len()
    pb = avg_len < 5.5
    row = df.iloc[0]
    assert int(row["b"]) == int(((pa == y) & (pb != y)).sum())
    assert int(row["c"]) == int(((pa != y) & (pb == y)).sum())


def test_wasserstein_matches_naive(spark):
    df = (
        REGISTRY["q318_wasserstein"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("event_type")
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["v"] = (100.0 * ev["value"]).round().astype("int64")
    ev["t"] = (ev["user_id"] % 2 == 1).astype(int)
    for et, g in ev.groupby("event_type"):
        a = sorted(g.loc[g["t"] == 1, "v"])
        b = sorted(g.loc[g["t"] == 0, "v"])
        dom = sorted(set(a) | set(b))
        n1, n2 = len(a), len(b)
        import bisect

        w1 = 0.0
        for lo, hi in zip(dom, dom[1:]):
            f1 = bisect.bisect_right(a, lo) / n1
            f2 = bisect.bisect_right(b, lo) / n2
            w1 += abs(f1 - f2) * (hi - lo)
        row = df.loc[et]
        assert int(row["n1"]) == n1 and int(row["n2"]) == n2
        assert abs(row["w1"] - w1 / 100.0) <= 1e-3
        assert row["w1"] >= 0


def test_isotonic_matches_literal_pava(spark):
    df = (
        REGISTRY["q319_isotonic_calibration"]
        .spark(spark, SF_DIR)
        .toPandas()
        .sort_values("bin")
    )
    # monotone nondecreasing fit
    iso = list(df["iso_rate"])
    assert all(x <= y + 1e-9 for x, y in zip(iso, iso[1:]))
    # literal pool-adjacent-violators over the same (n, pos) bins
    pools = [[int(n), int(p)] for n, p in zip(df["n"], df["pos"])]
    stack = []
    for n, p in pools:
        stack.append([n, p])
        while len(stack) > 1 and (
            stack[-2][1] * stack[-1][0] >= stack[-1][1] * stack[-2][0]
        ):
            n2, p2 = stack.pop()
            stack[-1][0] += n2
            stack[-1][1] += p2
    # expand pooled rates back to bins
    rates = []
    for n, p in stack:
        rates.append((n, p / n))
    expanded = []
    bin_counts = list(df["n"].astype(int))
    i = 0
    for n, r in rates:
        taken = 0
        while taken < n:
            taken += bin_counts[i]
            expanded.append(r)
            i += 1
    assert len(expanded) == len(iso)
    for got, exp in zip(iso, expanded):
        assert abs(got - exp) <= 1e-3
    # weighted mean is conserved by PAVA
    tot = (df["n"] * df["iso_rate"]).sum()
    assert abs(tot - df["pos"].sum()) <= df["n"].sum() * 1e-3


def test_peak_concurrency_matches_naive_sweep(spark):
    df = (
        REGISTRY["q320_peak_concurrency"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("event_type")
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["end"] = pd.to_datetime(ev["ts"]) + pd.to_timedelta(
        60 * (1 + ev["user_id"] % 5), unit="s"
    )
    for et, g in ev.groupby("event_type"):
        deltas = {}
        for t in pd.to_datetime(g["ts"]):
            deltas[t] = deltas.get(t, 0) + 1
        for t in g["end"]:
            deltas[t] = deltas.get(t, 0) - 1
        run = 0
        peak = 0
        peak_at = None
        for t in sorted(deltas):
            run += deltas[t]
            if run > peak:
                peak = run
                peak_at = t
        row = df.loc[et]
        assert int(row["peak"]) == peak
        assert pd.Timestamp(row["peak_at"]) == peak_at
        assert peak >= 1


def test_rebalance_audit_exact(spark):
    import bisect
    import hashlib

    df = (
        REGISTRY["q321_rebalance_audit"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("strategy")
    )
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    ids = list(docs["doc_id"])
    mod_moved = sum(1 for i in ids if i % 8 != i % 9)

    def ring(n_shards):
        return sorted(
            hashlib.md5(f"node{n}:{r}".encode()).hexdigest()
            for n in range(n_shards)
            for r in range(16)
        )

    r8, r9 = ring(8), ring(9)

    def succ(ring_pts, h):
        i = bisect.bisect_left(ring_pts, h)
        return ring_pts[i] if i < len(ring_pts) else ring_pts[0]

    ring_moved = 0
    for i in ids:
        h = hashlib.md5(str(i).encode()).hexdigest()
        if succ(r8, h) != succ(r9, h):
            ring_moved += 1
    assert int(df.loc["mod", "n_moved"]) == mod_moved
    assert int(df.loc["ring", "n_moved"]) == ring_moved
    # the whole point: the ring moves far fewer keys than mod-N
    assert df.loc["ring", "moved_frac"] < df.loc["mod", "moved_frac"]
    assert df.loc["mod", "moved_frac"] > 0.5
    assert df.loc["ring", "moved_frac"] < 0.5


def test_split_leakage_consistency(spark):
    """Leaky pair counts must equal composing the two proven parts by
    hand: exact Jaccard pairs x md5 split."""
    import hashlib

    from synth_transform_spark.operators import dedup

    docs_df = __import__("pandas").read_parquet(f"{SF_DIR}/documents.parquet")

    def split_of(doc_id):
        u = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 100
        return "train" if u < 80 else ("val" if u < 90 else "test")

    from synth_transform_spark.sources.readers import load_table

    docs = load_table(spark, SF_DIR, "documents")
    pairs = (
        dedup.prefix_jaccard_join(docs, threshold=0.5)
        .select("id_a", "id_b")
        .toPandas()
    )
    want = {}
    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        sa, sb = sorted((split_of(a), split_of(b)))
        k = (sa, sb)
        n, leaky = want.get(k, (0, 0))
        want[k] = (n + 1, leaky + (1 if sa != sb else 0))
    df = REGISTRY["q322_split_leakage"].spark(spark, SF_DIR).toPandas()
    got = {
        (r["split_a"], r["split_b"]): (int(r["n_pairs"]), int(r["n_leaky"]))
        for _, r in df.iterrows()
    }
    assert got == want
    # same-split rows never count as leaky
    same = df[df["split_a"] == df["split_b"]]
    assert (same["n_leaky"] == 0).all()


def test_permutation_test_properties(spark):
    df = REGISTRY["q323_permutation_test"].spark(spark, SF_DIR).toPandas()
    # valid p range with the +1 smoothing: [1/200, 1]
    assert (df["p_value"] >= 1.0 / 200).all()
    assert (df["p_value"] <= 1.0).all()
    # a random odd/even split should not be wildly significant everywhere
    assert (df["p_value"] > 0.005).any()
    # sf0.001 is sparse: some types miss a cohort on a few days
    assert (df["n_days"] >= 20).all()


def test_permutation_test_literal_replay(spark):
    """Replay one event type's permutation set literally in Python."""
    import hashlib

    import pandas as pd

    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev = ev[ev["event_type"] == "purchase"].copy()
    ev["day"] = pd.to_datetime(ev["ts"]).dt.floor("D").dt.date
    ev["x"] = (100.0 * ev["value"]).round().astype("int64")
    ev["odd"] = (ev["user_id"] % 2 == 1).astype(int)
    ds = []
    for day, g in ev.groupby("day"):
        s1, c1 = int(g.loc[g["odd"] == 1, "x"].sum()), int((g["odd"] == 1).sum())
        s0, c0 = int(g.loc[g["odd"] == 0, "x"].sum()), int((g["odd"] == 0).sum())
        if c1 and c0:
            ds.append((str(day), s1 // c1 - s0 // c0))
    t_obs = sum(d for _, d in ds)
    worse = 0
    for b in range(1, 200):
        t_b = 0
        for day, d in ds:
            par = int(hashlib.md5(f"{b}:{day}".encode()).hexdigest()[:8], 16) % 2
            t_b += d if par == 0 else -d
        if abs(t_b) >= abs(t_obs):
            worse += 1
    p = round((1 + worse) / 200.0, 4)
    df = (
        REGISTRY["q323_permutation_test"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("event_type")
    )
    assert int(df.loc["purchase", "t_obs"]) == t_obs
    assert abs(df.loc["purchase", "p_value"] - p) <= 1e-9


def test_krippendorff_matches_literal(spark):
    """Unit-by-unit coincidence recomputation in Python."""
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    n = n_units = q01 = o11 = o00 = 0
    for _, r in docs.iterrows():
        text = r["text"]
        toks = [t for t in text.split(" ") if t]
        ra = 1 if " the " in f" {text.lower()} " else 0
        ratings = [ra]
        if r["n_chars"] >= 150:
            ratings.append(
                1 if len(text.replace(" ", "")) / len(toks) < 5.5 else 0
            )
        if len(toks) >= 30:
            short = sum(1 for t in toks if len(t) <= 2)
            ratings.append(1 if short / len(toks) >= 0.15 else 0)
        m = len(ratings)
        if m < 2:
            continue
        n1 = sum(ratings)
        n0 = m - n1
        n_units += 1
        n += m
        q01 += 2 * n1 * n0 // (m - 1)
        o11 += n1 * (n1 - 1) // (m - 1)
        o00 += n0 * (n0 - 1) // (m - 1)
    df = REGISTRY["q324_krippendorff_alpha"].spark(spark, SF_DIR).toPandas()
    row = df.iloc[0]
    assert int(row["n_units"]) == n_units
    assert int(row["n"]) == n
    assert int(row["q01"]) == q01
    assert int(row["o11"]) == o11
    assert int(row["o00"]) == o00
    nc1 = o11 + q01 // 2
    nc0 = o00 + q01 // 2
    alpha = 1.0 - (n - 1) * q01 / (2.0 * nc1 * nc0)
    assert abs(row["alpha"] - alpha) <= 1e-3
    assert -1.0 <= row["alpha"] <= 1.0


def test_media_histogram_dups_verified(spark):
    """Every emitted pair must truly satisfy L1 <= 60 on the exact
    per-mille histograms, recomputed from raw text bytes."""
    df = REGISTRY["q325_media_histogram_dups"].spark(spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet").set_index("doc_id")

    def hist(text):
        from collections import Counter

        c = Counter(b % 16 for b in text.encode())
        t = sum(c.values())
        return {b: (v * 1000) // t for b, v in c.items()}

    for _, r in df.iterrows():
        ha = hist(docs.loc[int(r["id_a"]), "text"])
        hb = hist(docs.loc[int(r["id_b"]), "text"])
        l1 = sum(
            abs(ha.get(b, 0) - hb.get(b, 0)) for b in set(ha) | set(hb)
        )
        assert l1 == int(r["l1"])
        assert l1 <= 60
    assert (df["id_a"] < df["id_b"]).all()


def test_periodogram_matches_naive(spark):
    df = REGISTRY["q326_periodogram"].spark(spark, SF_DIR).toPandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["day"] = pd.to_datetime(ev["ts"]).dt.floor("D")
    for et, g in ev.groupby("event_type"):
        daily = g.groupby("day").size().sort_index()
        nd = len(daily)
        s = int(daily.sum())
        d0 = daily.index.min()
        sub = df[df["event_type"] == et].set_index("period")
        xs = []
        for day, c in daily.items():
            t = (day - d0).days
            xs.append((t, int(c) * nd - s))
        sx2 = sum(x * x for _, x in xs)
        for p in range(2, 11):
            a = sum(
                x * round(1e6 * math.cos(2 * math.pi * t / p)) for t, x in xs
            )
            b = sum(
                x * round(1e6 * math.sin(2 * math.pi * t / p)) for t, x in xs
            )
            power = (a * a + b * b) / 1e12 / (nd * sx2)
            assert abs(sub.loc[p, "power"] - power) <= 1e-3
        # normalized power stays in a sane band
        assert (sub["power"] >= 0).all()
        assert (sub["power"] <= 2.0).all()


def test_trend_test_matches_naive(spark):
    df = REGISTRY["q327_trend_test"].spark(spark, SF_DIR).toPandas()
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    orders["s"] = orders["o_orderpriority"].str[0].astype(int)
    orders["y"] = (orders["o_totalprice"] > 250000).astype(int)
    n = len(orders)
    r = int(orders["y"].sum())
    sn = int((orders["s"]).sum())
    ssn = int((orders["s"] ** 2).sum())
    sr = int((orders["s"] * orders["y"]).sum())
    p = r / n
    num = sr - r * sn / n
    var = p * (1 - p) * (ssn - sn * sn / n)
    z = num / math.sqrt(var)
    row = df.iloc[0]
    assert int(row["n"]) == n
    assert int(row["n_high"]) == r
    assert int(row["k"]) == orders["s"].nunique()
    assert abs(row["z"] - z) <= 1e-3


def test_mantel_haenszel_matches_naive(spark):
    df = REGISTRY["q328_mantel_haenszel"].spark(spark, SF_DIR).toPandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["dow"] = pd.to_datetime(ev["ts"]).dt.dayofweek
    ev["t"] = (ev["user_id"] % 2 == 1).astype(int)
    ev["y"] = (ev["value"] >= 50).astype(int)
    num = den = 0.0
    sa = sb = sc = sd = 0
    for _, g in ev.groupby("dow"):
        a = int(((g["t"] == 1) & (g["y"] == 1)).sum())
        b = int(((g["t"] == 1) & (g["y"] == 0)).sum())
        c = int(((g["t"] == 0) & (g["y"] == 1)).sum())
        d = int(((g["t"] == 0) & (g["y"] == 0)).sum())
        n = a + b + c + d
        num += round(1e6 * a * d / n)
        den += round(1e6 * b * c / n)
        sa, sb, sc, sd = sa + a, sb + b, sc + c, sd + d
    row = df.iloc[0]
    assert int(row["n_strata"]) == ev["dow"].nunique()
    assert abs(row["or_crude"] - sa * sd / (sb * sc)) <= 1e-3
    assert abs(row["or_mh"] - num / den) <= 1e-3
    # a random split: both ORs hover near 1
    assert 0.5 < row["or_mh"] < 2.0


def test_lateral_topk_matches_naive(spark):
    df = REGISTRY["q329_lateral_topk"].spark(spark, SF_DIR).toPandas()
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    nation = pd.read_parquet(f"{SF_DIR}/nation.parquet")
    for _, nrow in nation.iterrows():
        top = (
            cust[cust["c_nationkey"] == nrow["n_nationkey"]]
            .sort_values(["c_acctbal", "c_custkey"], ascending=[False, True])
            .head(3)
        )
        got = df[df["n_name"] == nrow["n_name"]]
        assert len(got) == len(top)
        assert set(got["c_name"]) == set(top["c_name"])
    # exactly 3 per nation with customers
    counts = df.groupby("n_name").size()
    assert (counts <= 3).all()


def test_lateral_topk_plan_no_rescan(spark):
    """The lateral must decorrelate: customer scanned once, ranked by a
    partitioned window — not re-scanned per nation row."""
    df = REGISTRY["q329_lateral_topk"].spark(spark, SF_DIR)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # nation + customer, once each ("formatted" lists each scan node in
    # both the tree and the detail section, so count locations instead)
    assert plan.count("Location: InMemoryFileIndex") == 2
    assert "Window" in plan  # rank rewrite, not a per-nation re-scan
    assert "CartesianProduct" not in plan


def test_set_ops_all_multiplicity(spark):
    """Bag semantics recomputed from per-key multiplicities:
    intersect-all count = sum min(m1, m2); except-all = sum max(m1-m2, 0)."""
    df = (
        REGISTRY["q330_set_ops_all"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("month")
    )
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    od = pd.to_datetime(orders["o_orderdate"])
    orders["m"] = od.dt.month
    h1 = orders[od < "1998-01-01"]
    h2 = orders[od >= "1998-01-01"]
    c1 = h1.groupby(["o_custkey", "m"]).size()
    c2 = h2.groupby(["o_custkey", "m"]).size()
    both = c1.to_frame("a").join(c2.to_frame("b"), how="left").fillna(0)
    inter = both[["a", "b"]].min(axis=1)
    excess = (both["a"] - both["b"]).clip(lower=0)
    for m in df.index:
        want_i = int(inter[inter.index.get_level_values("m") == m].sum())
        want_e = int(excess[excess.index.get_level_values("m") == m].sum())
        assert int(df.loc[m, "n_recurring"]) == want_i
        assert int(df.loc[m, "n_h1_excess"]) == want_e
    # identity: recurring + excess = H1 activity rows for that month
    h1_counts = h1.groupby("m").size()
    for m in df.index:
        assert int(df.loc[m, "n_recurring"] + df.loc[m, "n_h1_excess"]) == int(
            h1_counts.get(m, 0)
        )


def test_topk_churn_matches_naive(spark):
    df = REGISTRY["q331_topk_churn"].spark(spark, SF_DIR).toPandas()
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    li["week"] = (
        pd.to_datetime(li["l_shipdate"])
        .dt.to_period("W-SUN")
        .dt.start_time
    )
    li["q"] = (100.0 * li["l_quantity"]).round().astype("int64")
    wk = li.groupby(["week", "l_partkey"])["q"].sum().reset_index()
    tops = {}
    for w, g in wk.groupby("week"):
        g = g.sort_values(["q", "l_partkey"], ascending=[False, True])
        tops[w] = set(g.head(20)["l_partkey"])
    weeks = sorted(tops)
    want = {}
    for prev, cur in zip(weeks, weeks[1:]):
        ov = len(tops[cur] & tops[prev])
        want[cur] = (ov, round(ov / (len(tops[cur]) + len(tops[prev]) - ov), 4))
    assert len(df) == len(want)
    for _, r in df.iterrows():
        w = pd.Timestamp(r["week"])
        ov, jac = want[w]
        assert int(r["overlap"]) == ov
        # Python round() is half-even, the engines round half-up: a raw
        # ratio landing exactly on x.xxxx5 (e.g. 1/32) differs by 1e-4
        assert abs(r["jaccard"] - jac) <= 1.1e-4
    assert (df["jaccard"] <= 1.0).all() and (df["jaccard"] >= 0.0).all()


def test_anova_matches_naive(spark):
    df = (
        REGISTRY["q332_anova_f"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("lang")
    )
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    for lang, g in docs.groupby("lang"):
        grand = g["n_chars"].mean()
        ssb = sum(
            len(s) * (s["n_chars"].mean() - grand) ** 2
            for _, s in g.groupby("source")
        )
        ssw = sum(
            ((s["n_chars"] - s["n_chars"].mean()) ** 2).sum()
            for _, s in g.groupby("source")
        )
        k = g["source"].nunique()
        n = len(g)
        f = (ssb / (k - 1)) / (ssw / (n - k))
        row = df.loc[lang]
        assert int(row["n"]) == n and int(row["k"]) == k
        assert abs(row["f"] - f) <= 2e-3
        assert abs(row["eta_sq"] - ssb / (ssb + ssw)) <= 2e-3
        assert 0.0 <= row["eta_sq"] <= 1.0


def test_brown_forsythe_matches_naive(spark):
    df = (
        REGISTRY["q333_brown_forsythe"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("lang")
    )
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    for lang, g in docs.groupby("lang"):
        zs = []
        for src, s in g.groupby("source"):
            vals = sorted(s["n_chars"])
            med = vals[(len(vals) + 1) // 2 - 1]  # lower median
            zs.append([abs(v - med) for v in vals])
        n = sum(len(z) for z in zs)
        k = len(zs)
        grand = sum(sum(z) for z in zs) / n
        ssb = sum(len(z) * (sum(z) / len(z) - grand) ** 2 for z in zs)
        ssw = sum(
            sum((v - sum(z) / len(z)) ** 2 for v in z) for z in zs
        )
        f = (ssb / (k - 1)) / (ssw / (n - k))
        row = df.loc[lang]
        assert int(row["n"]) == n and int(row["k"]) == k
        assert abs(row["f"] - f) <= 2e-3
        assert row["f"] >= 0


def test_partial_correlation_matches_naive(spark):
    df = REGISTRY["q334_partial_correlation"].spark(spark, SF_DIR).toPandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["day"] = pd.to_datetime(ev["ts"]).dt.floor("D")
    daily = ev.groupby("day").agg(
        x=("event_type", lambda s: int((s == "purchase").sum())),
        y=("event_type", lambda s: int((s == "error").sum())),
        z=("event_type", "size"),
    )
    rxy = daily["x"].corr(daily["y"])
    rxz = daily["x"].corr(daily["z"])
    ryz = daily["y"].corr(daily["z"])
    part = (rxy - rxz * ryz) / math.sqrt((1 - rxz**2) * (1 - ryz**2))
    row = df.iloc[0]
    assert int(row["n_days"]) == len(daily)
    assert abs(row["r_xy"] - rxy) <= 1e-3
    assert abs(row["r_xz"] - rxz) <= 1e-3
    assert abs(row["r_yz"] - ryz) <= 1e-3
    assert abs(row["r_partial"] - part) <= 1e-3
    assert -1.0 <= row["r_partial"] <= 1.0


def test_silhouette_matches_naive(spark):
    df = (
        REGISTRY["q335_silhouette"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("label")
    )
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    import numpy as np

    vecs = {
        int(r["vec_id"]): np.round(1e6 * np.array(r["embedding"])).astype(
            "int64"
        )
        + 1_000_000
        for _, r in emb.iterrows()
    }
    labels = dict(zip(emb["vec_id"].astype(int), emb["label"].astype(int)))
    cents = {}
    for lab in sorted(set(labels.values())):
        ids = [i for i, l in labels.items() if l == lab]
        m = np.stack([vecs[i] for i in ids])
        cents[lab] = np.floor_divide(m.sum(axis=0), len(ids))
    sums = {}
    counts = {}
    for i, lab in labels.items():
        d = {
            cl: float(np.sqrt(((vecs[i] - c) ** 2).sum()))
            for cl, c in cents.items()
        }
        a = d[lab]
        b = min(v for cl, v in d.items() if cl != lab)
        si = round(1e6 * (b - a) / max(a, b))
        sums[lab] = sums.get(lab, 0) + si
        counts[lab] = counts.get(lab, 0) + 1
    for lab in cents:
        want = round(sums[lab] / 1e6 / counts[lab], 4)
        assert int(df.loc[lab, "n"]) == counts[lab]
        assert abs(df.loc[lab, "mean_silhouette"] - want) <= 2e-4
    # silhouette is bounded
    assert (df["mean_silhouette"] >= -1.0).all()
    assert (df["mean_silhouette"] <= 1.0).all()


def test_lsh_planner_closed_form(spark):
    df = REGISTRY["q336_lsh_planner"].spark(spark, SF_DIR).toPandas()
    for _, r in df.iterrows():
        b, rr, t = int(r["bands"]), int(r["rows_per_band"]), r["target_j"]
        assert b * rr <= 64
        p = 1 - (1 - t**rr) ** b
        fp = 1 - (1 - 0.3**rr) ** b
        assert abs(r["p_detect"] - p) <= 1e-3
        assert abs(r["p_fp"] - fp) <= 1e-3
        assert abs(r["score"] - (p - fp)) <= 2e-3
    # top-3 per target, rank-1 score dominates within each target
    for t, g in df.groupby("target_j"):
        g = g.sort_values("rk")
        assert list(g["rk"]) == [1, 2, 3]
        assert g.iloc[0]["score"] >= g.iloc[1]["score"] - 1e-9
    # the production 80%-threshold layout family should surface near the
    # top for t=0.8 (the q27 4-band x 3-row choice trades budget down)
    t8 = df[df["target_j"] == 0.8]
    assert t8.iloc[0]["p_detect"] > 0.9


def test_filter_cascade_matches_naive(spark):
    df = REGISTRY["q337_filter_cascade"].spark(spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    n = len(docs)
    toks = docs["text"].str.split(" ").apply(lambda t: [x for x in t if x])
    want = {
        "length": int((docs["n_chars"] >= 100).sum()),
        "lang": int((docs["lang"] == "en").sum()),
        "stopword": int(
            (" " + docs["text"].str.lower() + " ")
            .str.contains(" the ", regex=False)
            .sum()
        ),
        "tokens": int((toks.str.len() >= 20).sum()),
    }
    costs = {"length": 1, "lang": 1, "stopword": 5, "tokens": 10}
    got = df.set_index("filter")
    for f, np_ in want.items():
        assert int(got.loc[f, "n_pass"]) == np_
        assert got.loc[f, "sel"] == round(np_ / n, 4)
        dpc = (1 - np_ / n) / costs[f]
        assert abs(got.loc[f, "drop_per_cost"] - dpc) <= 1e-3
    # ranking is by drop-per-cost descending
    ordered = df.sort_values("opt_rank")["drop_per_cost"]
    assert all(
        x >= y - 1e-9 for x, y in zip(ordered, ordered[1:])
    )


def _daily_counts():
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    days = pd.to_datetime(ev["ts"]).dt.normalize()
    return days.value_counts().sort_index().to_list()


def test_jarque_bera_matches_naive(spark):
    df = (
        REGISTRY["q338_jarque_bera"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("event_type")
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    for et, g in ev.groupby("event_type"):
        v = (100.0 * g["value"]).round().astype("int64") / 100.0
        n = len(v)
        mu = v.mean()
        m2 = ((v - mu) ** 2).mean()
        m3 = ((v - mu) ** 3).mean()
        m4 = ((v - mu) ** 4).mean()
        g1 = m3 / m2**1.5
        g2 = m4 / m2**2 - 3.0
        jb = n / 6.0 * (g1**2 + g2**2 / 4.0)
        assert int(df.loc[et, "n"]) == n
        assert abs(df.loc[et, "skewness"] - g1) <= 1e-3
        assert abs(df.loc[et, "ex_kurtosis"] - g2) <= 1e-3
        assert abs(df.loc[et, "jb"] - jb) <= max(1e-2, 1e-3 * jb)


def test_ljung_box_matches_naive(spark):
    df = (
        REGISTRY["q339_ljung_box"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("lag")
    )
    x = _daily_counts()
    n = len(x)
    mu = sum(x) / n
    den = sum((v - mu) ** 2 for v in x)
    q = 0.0
    for k in range(1, 8):
        rho = (
            sum((x[i] - mu) * (x[i + k] - mu) for i in range(n - k)) / den
        )
        q += rho**2 / (n - k)
        want_q = n * (n + 2) * q
        assert abs(df.loc[k, "rho"] - rho) <= 1e-3
        assert abs(df.loc[k, "q_stat"] - want_q) <= max(1e-2, 1e-3 * want_q)
    # Q is cumulative, so it must be non-decreasing in the lag
    assert df["q_stat"].is_monotonic_increasing


def test_durbin_watson_matches_naive(spark):
    row = (
        REGISTRY["q340_durbin_watson"].spark(spark, SF_DIR).toPandas().iloc[0]
    )
    x = _daily_counts()
    n = len(x)
    ts = list(range(1, n + 1))
    st, sx = sum(ts), sum(x)
    stt = sum(t * t for t in ts)
    stx = sum(t * v for t, v in zip(ts, x))
    slope = (n * stx - st * sx) / (n * stt - st * st)
    icept = (sx - slope * st) / n
    e = [
        round(1e6 * (v - (icept + slope * t))) / 1e6
        for t, v in zip(ts, x)
    ]
    dw = sum(
        (e[i] - e[i - 1]) ** 2 for i in range(1, n)
    ) / sum(v**2 for v in e)
    assert int(row["n_days"]) == n
    assert abs(row["slope"] - slope) <= 1e-3
    assert abs(row["dw"] - dw) <= 1e-3
    assert abs(row["rho1_approx"] - (1 - dw / 2)) <= 1e-3


def test_ses_forecast_matches_naive(spark):
    df = (
        REGISTRY["q341_ses_forecast"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("t")
    )
    x = _daily_counts()
    level = float(x[0])
    for t in range(2, len(x) + 1):
        # forecast for step t is the level after observing x[0..t-2]
        assert abs(df.loc[t, "forecast"] - level) <= 2e-3
        assert int(df.loc[t, "x"]) == x[t - 1]
        assert abs(df.loc[t, "err"] - (x[t - 1] - level)) <= 4e-3
        level = 0.5 * x[t - 1] + 0.5 * level
    assert 1 not in df.index  # no forecast for the first day


def test_hampel_filter_matches_naive(spark):
    df = (
        REGISTRY["q342_hampel_filter"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("t")
    )
    import statistics

    x = _daily_counts()
    n = len(x)
    for t in range(1, n + 1):
        lo, hi = max(1, t - 3), min(n, t + 3)
        nbr = [float(x[j - 1]) for j in range(lo, hi + 1)]
        med = statistics.median(nbr)
        mad = statistics.median([abs(v - med) for v in nbr])
        flag = 1 if abs(x[t - 1] - med) > 3.0 * 1.4826 * mad else 0
        assert int(df.loc[t, "x"]) == x[t - 1]
        assert abs(df.loc[t, "med"] - med) <= 1e-6
        assert abs(df.loc[t, "mad"] - mad) <= 1e-6
        assert int(df.loc[t, "is_outlier"]) == flag
