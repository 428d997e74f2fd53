"""Round-9 independent math / edge-semantics tests.

Pins the round-8 advice fixes (q467 empty-doc guard, q471/q484 wide
triangular arithmetic) and the documented ROUGE-L cap truncation, each
recomputed with an independent implementation (pure Python two-row LCS
DP, direct python zlib / integer arithmetic) rather than the shared
oracle formula.
"""

from __future__ import annotations

import math

import pytest

from conftest import SF_DIR


# ---------------------------------------------------------------------------
# q467: the zlib kernel must survive degenerate inputs (empty / 1-byte
# docs) — round-8 advice: `comp / len` used to divide by zero and crash
# the int64 cast for empty texts.
# ---------------------------------------------------------------------------
def test_zlib_kernel_empty_doc_guard():
    import zlib

    import pandas as pd

    from synth_transform_spark.plans.texteval_queries import _zlib_ratios

    pdf = pd.DataFrame(
        {
            "source": ["s", "s", "s"],
            "text": ["", "a", "hello world " * 50],
        }
    )
    (out,) = list(_zlib_ratios(iter([pdf])))
    # empty doc: clipped length 1, ratio = len(zlib.compress(b"")) / 1
    empty_r4 = round(10000.0 * len(zlib.compress(b"", 6)))
    assert out["r4"].tolist()[0] == empty_r4
    assert out["r4"].dtype == "int64"
    # non-degenerate rows unchanged by the guard
    one = round(10000.0 * len(zlib.compress(b"a", 6)))
    assert out["r4"].tolist()[1] == one


# ---------------------------------------------------------------------------
# q489: _ROUGE_CAP silently truncates both sides to 120 tokens — LCS and
# the P/R denominators refer to the CLIPPED sequences (documented in
# SCALE.md). Pin it on a >120-token pair whose overlap lives entirely
# past the cap: capped LCS must be 0 while the full LCS is not.
# ---------------------------------------------------------------------------
def _lcs(a, b):
    prev = [0] * (len(b) + 1)
    for w in a:
        cur = [0]
        for j, t in enumerate(b, 1):
            cur.append(max(prev[j], cur[-1], prev[j - 1] + (t == w)))
        prev = cur
    return prev[-1]


def test_rouge_cap_truncates(spark):
    import pyspark.sql.functions as F

    from synth_transform_spark.plans.texteval_queries import (
        _ROUGE_CAP,
        _SPARK_LCS,
    )

    assert _ROUGE_CAP == 120  # SCALE.md documents this number
    # overlap only past token 120: a ends in 20 "m"s, b is all "m"s
    a = [f"a{i}" for i in range(130)] + ["m"] * 20
    b = ["m"] * 150
    # short pair fully under the cap, exercising the normal path too
    a2, b2 = ["x", "y", "z", "w"], ["y", "w", "q"]
    df = spark.createDataFrame([(a, b), (a2, b2)], "a array<string>, b array<string>")
    got = [r["lcs"] for r in df.select(F.expr(_SPARK_LCS).alias("lcs")).collect()]
    assert got[0] == _lcs(a[:120], b[:120]) == 0
    assert _lcs(a, b) == 20  # the un-capped answer the clip hides
    assert got[1] == _lcs(a2, b2) == 2


# ---------------------------------------------------------------------------
# q471/q484: the wide-integer Ansari-Bradley T(x) (parity-split halving,
# DECIMAL(38,0)) must equal a direct pure-Python sum of min(r, N+1-r)
# for every x — including values past 2^53/2^63 where the round-8 form
# (double halving / BIGINT products) would break.
# ---------------------------------------------------------------------------
def test_ab_score_sum_wide_integer(spark):
    import pyspark.sql.functions as F

    from synth_transform_spark.plans.nonparam_queries import _ab_t

    # small domain: exact brute-force cross-check of the closed form
    for n in (1, 2, 7, 8, 9):
        h = (n + 1) // 2
        rows = [(x, h, n) for x in range(0, n + 1)]
        df = spark.createDataFrame(rows, "x long, h long, n long")
        got = [
            int(r["t"])
            for r in df.select(F.expr(_ab_t("spark", "x")).alias("t"))
            .orderBy("x")
            .collect()
        ]
        want = [
            sum(min(r, n + 1 - r) for r in range(1, x + 1))
            for x in range(0, n + 1)
        ]
        assert got == want, f"N={n}"

    # huge domain: products overflow int64 and halving exceeds 2^53 —
    # the exact closed form in python ints is the independent check
    n = 10**12
    h = (n + 1) // 2
    xs = [h - 1, h, h + 1, n - 1, n]
    df = spark.createDataFrame([(x, h, n) for x in xs], "x long, h long, n long")
    got = {
        int(r["x"]): int(r["t"])
        for r in df.select(
            "x", F.expr(_ab_t("spark", "x")).alias("t")
        ).collect()
    }

    def t_exact(x):
        tri = lambda y: y * (y + 1) // 2  # noqa: E731 — python bigint
        return tri(x) if x <= h else 2 * tri(h) + (x - h) * (n + 1) - tri(x)

    for x in xs:
        assert got[x] == t_exact(x), f"x={x}"


# the q471/q484 z-statistics themselves are covered by the DuckDB oracle
# hash gate; scipy (absent here) agreement was hand-checked for the
# Ansari-Bradley/Lepage family when the queries landed in round 8.


# ===========================================================================
# Round-9 wave (q491-q498): independent recomputations (pure python /
# numpy, sorted-sample algorithms — not the frequency-domain identities
# the engines share).
# ===========================================================================
def _events_df():
    import pandas as pd

    from conftest import SF_DIR

    return pd.read_parquet(SF_DIR + "/events.parquet")


def _weekend_mask(ts):
    import pandas as pd

    sec = (ts - pd.Timestamp("1970-01-01")) // pd.Timedelta(seconds=1)
    return ((sec // 86400 + 3) % 7) >= 5


def _avg_ranks(values):
    order = sorted(range(len(values)), key=lambda i: values[i])
    ranks = [0.0] * len(values)
    i = 0
    while i < len(order):
        j = i
        while j + 1 < len(order) and values[order[j + 1]] == values[order[i]]:
            j += 1
        r = (i + j + 2) / 2.0
        for k in range(i, j + 1):
            ranks[order[k]] = r
        i = j + 1
    return ranks


def _purchases_split():
    ev = _events_df()
    p = ev[ev["event_type"] == "purchase"]
    v = (100.0 * p["value"]).round().astype("int64").to_numpy()
    we = _weekend_mask(p["ts"]).to_numpy()
    return v[we], v[~we]


def test_conover_squared_ranks_matches_naive(spark):
    import numpy as np

    from synth_transform_spark.plans import REGISTRY

    df = (
        REGISTRY["q491_conover_squared_ranks"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("event_type")
    )
    ev = _events_df()
    ev["v2"] = (200.0 * ev["value"]).round().astype("int64")
    groups, devs = [], []
    for t, g in ev.groupby("event_type"):
        m2 = round(np.quantile(g["v2"].to_numpy(float), 0.5, method="linear"))
        u = np.abs(g["v2"].to_numpy() - int(m2))
        groups.extend([t] * len(u))
        devs.extend(u.tolist())
    ranks = np.array(_avg_ranks(devs))
    scores = ranks**2
    n = len(scores)
    by = {}
    for t, s in zip(groups, scores):
        by.setdefault(t, []).append(s)
    sbar = scores.mean()
    d2 = (np.sum(scores**2) - n * sbar**2) / (n - 1)
    t_stat = (
        sum(np.sum(v) ** 2 / len(v) for v in by.values()) - n * sbar**2
    ) / d2
    for t, v in by.items():
        assert int(df.loc[t, "n"]) == len(v)
        assert df.loc[t, "mean_sq_rank"] == pytest.approx(
            float(np.mean(v)), rel=1e-6, abs=1e-3
        )
        assert df.loc[t, "t_conover"] == pytest.approx(t_stat, abs=2e-3)


def test_brunner_munzel_matches_naive(spark):
    import numpy as np

    from synth_transform_spark.plans import REGISTRY

    row = REGISTRY["q492_brunner_munzel"].spark(spark, SF_DIR).toPandas().iloc[0]
    x, y = _purchases_split()  # x = weekend, y = weekday
    nx, ny = len(x), len(y)
    pooled = np.concatenate([x, y])
    rp = np.array(_avg_ranks(pooled.tolist()))
    rx, ry = rp[:nx], rp[nx:]
    rxi = np.array(_avg_ranks(x.tolist()))
    ryi = np.array(_avg_ranks(y.tolist()))
    mx, my = rx.mean(), ry.mean()
    sx2 = np.sum((rx - rxi - mx + (nx + 1) / 2.0) ** 2) / (nx - 1)
    sy2 = np.sum((ry - ryi - my + (ny + 1) / 2.0) ** 2) / (ny - 1)
    p_hat = (my - (ny + 1) / 2.0) / nx
    w = nx * ny * (my - mx) / (nx + ny) / math.sqrt(nx * sx2 + ny * sy2)
    assert int(row["n_weekend"]) == nx and int(row["n_weekday"]) == ny
    assert row["p_hat"] == pytest.approx(p_hat, abs=2e-4)
    assert row["w_bm"] == pytest.approx(w, abs=2e-3)


def test_kuiper_matches_ecdf(spark):
    import numpy as np

    from synth_transform_spark.plans import REGISTRY

    row = REGISTRY["q493_kuiper_test"].spark(spark, SF_DIR).toPandas().iloc[0]
    x, y = _purchases_split()
    xs = np.unique(np.concatenate([x, y]))
    f1 = np.searchsorted(np.sort(x), xs, side="right") / len(x)
    f2 = np.searchsorted(np.sort(y), xs, side="right") / len(y)
    dp = max(float(np.max(f1 - f2)), 0.0)
    dm = max(float(np.max(f2 - f1)), 0.0)
    assert row["d_plus"] == pytest.approx(dp, abs=2e-4)
    assert row["d_minus"] == pytest.approx(dm, abs=2e-4)
    assert row["v_kuiper"] == pytest.approx(dp + dm, abs=2e-4)


def test_anderson_darling_2s_matches_scholz_stephens(spark):
    import numpy as np

    from synth_transform_spark.plans import REGISTRY

    row = (
        REGISTRY["q494_anderson_darling_2s"].spark(spark, SF_DIR).toPandas().iloc[0]
    )
    x, y = _purchases_split()
    n1, n2 = len(x), len(y)
    n = n1 + n2
    vals, l = np.unique(np.concatenate([x, y]), return_counts=True)
    c1 = np.array([(x == v).sum() for v in vals], dtype=float)
    c2 = np.array([(y == v).sum() for v in vals], dtype=float)
    k1, k2 = np.cumsum(c1), np.cumsum(c2)
    bj = (k1 + k2) - l / 2.0
    m1 = k1 - c1 / 2.0
    m2 = k2 - c2 / 2.0
    den = bj * (n - bj) - n * l / 4.0
    ok = den > 0
    inner1 = np.sum(l[ok] * (n * m1[ok] - n1 * bj[ok]) ** 2 / den[ok])
    inner2 = np.sum(l[ok] * (n * m2[ok] - n2 * bj[ok]) ** 2 / den[ok])
    a2 = (n - 1) / float(n) ** 2 * (inner1 / n1 + inner2 / n2) / n
    assert int(row["n_weekend"]) == n1 and int(row["n_weekday"]) == n2
    assert row["a2_akn"] == pytest.approx(a2, abs=2e-3)


def test_hoeffdings_d_matches_pair_loop(spark):
    import pandas as pd

    from synth_transform_spark.plans import REGISTRY
    from conftest import SF_DIR as _sf

    row = REGISTRY["q497_hoeffdings_d"].spark(spark, _sf).toPandas().iloc[0]
    od = pd.read_parquet(_sf + "/orders.parquet")
    od["cents"] = (100.0 * od["o_totalprice"]).round().astype("int64")
    daily = od.groupby("o_orderdate").agg(
        x=("o_orderkey", "size"), y=("cents", "sum")
    )
    xs, ys = daily["x"].to_list(), daily["y"].to_list()
    n = len(xs)
    D1 = D2 = D3 = 0.0
    for i in range(n):
        lt_x = sum(1 for j in range(n) if xs[j] < xs[i])
        eq_x = sum(1 for j in range(n) if xs[j] == xs[i])
        lt_y = sum(1 for j in range(n) if ys[j] < ys[i])
        eq_y = sum(1 for j in range(n) if ys[j] == ys[i])
        r = lt_x + (eq_x + 1) / 2.0
        s = lt_y + (eq_y + 1) / 2.0
        q = (
            1
            + sum(1 for j in range(n) if j != i and xs[j] < xs[i] and ys[j] < ys[i])
            + 0.25 * sum(
                1 for j in range(n) if j != i and xs[j] == xs[i] and ys[j] == ys[i]
            )
            + 0.5 * sum(
                1 for j in range(n) if j != i and xs[j] == xs[i] and ys[j] < ys[i]
            )
            + 0.5 * sum(
                1 for j in range(n) if j != i and xs[j] < xs[i] and ys[j] == ys[i]
            )
        )
        D1 += (q - 1) * (q - 2)
        D2 += (r - 1) * (r - 2) * (s - 1) * (s - 2)
        D3 += (r - 2) * (s - 2) * (q - 1)
    d = (
        30.0
        * ((n - 2) * (n - 3) * D1 + D2 - 2 * (n - 2) * D3)
        / (n * (n - 1) * (n - 2) * (n - 3) * (n - 4))
    )
    assert int(row["n_days"]) == n
    assert row["d_stat"] == pytest.approx(d, abs=2e-4)


def test_theils_u_matches_counter_entropy(spark):
    from collections import Counter

    import pandas as pd

    from synth_transform_spark.plans import REGISTRY
    from conftest import SF_DIR as _sf

    row = REGISTRY["q498_theils_u"].spark(spark, _sf).toPandas().iloc[0]
    docs = pd.read_parquet(_sf + "/documents.parquet")
    n = len(docs)
    lang_c = Counter(docs["lang"])
    hy = -sum(m / n * math.log(m / n) for m in lang_c.values())
    hyx = 0.0
    for _, g in docs.groupby("source"):
        r = len(g)
        for c in Counter(g["lang"]).values():
            hyx -= c / n * math.log(c / r)
    assert int(row["n_docs"]) == n
    assert row["h_lang"] == pytest.approx(hy, abs=2e-4)
    assert row["h_lang_given_source"] == pytest.approx(hyx, abs=2e-4)
    assert row["theils_u"] == pytest.approx((hy - hyx) / hy, abs=2e-3)
