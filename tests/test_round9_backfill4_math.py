"""Round-9 backfill, part 4: COUNT-ALGEBRA / ORDER-STAT waivers.

Even "one-liner" formulas deserve a third implementation when it costs
ten lines of pandas — this batch retires ten more waivers (lexical
richness, FD mining, padding waste, n-gram novelty, shipping SLA,
Wilson brand rates, IPS policy replay, time-to-convert, CVaR, QQ
deciles), leaving the inventory's waiver list to genuinely trivial
count rollups.
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


def _docs():
    return pd.read_parquet(SF_DIR + "/documents.parquet")


# ---------------------------------------------------------------------------
def test_lexical_richness_matches_counters(spark):
    from collections import Counter

    df = _run(spark, "q394_lexical_richness").set_index("source")
    for src, g in _docs().groupby("source"):
        c = Counter(t for text in g["text"] for t in text.split(" ") if t)
        n_tok = sum(c.values())
        n_typ = len(c)
        hapax = sum(1 for v in c.values() if v == 1)
        rep2 = sum(v * (v - 1) for v in c.values())
        row = df.loc[src]
        assert int(row["n_tokens"]) == n_tok
        assert int(row["n_types"]) == n_typ
        assert row["ttr"] == pytest.approx(n_typ / n_tok, abs=2e-4)
        assert row["hapax_ratio"] == pytest.approx(hapax / n_typ, abs=2e-4)
        assert row["simpson_d"] == pytest.approx(
            rep2 / (n_tok * (n_tok - 1)), abs=2e-4
        )
        assert row["herdan_c"] == pytest.approx(
            math.log(n_typ) / math.log(n_tok), abs=2e-4
        )


# ---------------------------------------------------------------------------
def test_fd_violations_match_pandas(spark):
    df = _run(spark, "q395_fd_violations").set_index("fd")
    ev, docs = _events(), _docs()
    cases = {
        "events.user_id->event_type": (ev, "user_id", "event_type"),
        "documents.lang->source": (docs, "lang", "source"),
        "documents.source->lang": (docs, "source", "lang"),
    }
    for fd, (frame, x, y) in cases.items():
        if fd not in df.index:
            continue
        g = frame.groupby([x, y]).size().rename("c").reset_index()
        per = g.groupby(x)["c"].agg(["max", "sum"])
        row = df.loc[fd]
        assert int(row["n_rows"]) == int(per["sum"].sum())
        assert int(row["n_lhs"]) == len(per)
        assert row["holds_rate"] == pytest.approx(
            per["max"].sum() / per["sum"].sum(), abs=2e-4
        )
        assert int(row["n_violations"]) == int(
            per["sum"].sum() - per["max"].sum()
        )
        assert int(row["exact_fd"]) == int(
            per["sum"].sum() == per["max"].sum()
        )


# ---------------------------------------------------------------------------
def test_padding_waste_matches_numpy(spark):
    df = _run(spark, "q396_padding_waste").set_index("max_len")
    lens = np.array(
        [len([t for t in text.split(" ") if t]) for text in _docs()["text"]]
    )
    for m in (64, 128, 256):
        kept = np.minimum(lens, m)
        trunc = np.maximum(lens - m, 0)
        n = len(lens)
        row = df.loc[m]
        assert int(row["n_docs"]) == n
        assert int(row["total_tokens"]) == int(lens.sum())
        assert int(row["kept_tokens"]) == int(kept.sum())
        assert int(row["pad_tokens"]) == int(n * m - kept.sum())
        assert int(row["trunc_tokens"]) == int(trunc.sum())
        assert row["pad_frac"] == pytest.approx(
            (n * m - kept.sum()) / (n * m), abs=2e-4
        )
        assert row["trunc_frac"] == pytest.approx(
            trunc.sum() / lens.sum(), abs=2e-4
        )
        ideal = (int(kept.sum()) + m - 1) // m
        assert int(row["ideal_rows"]) == ideal
        assert row["packing_gain"] == pytest.approx(n / ideal, abs=2e-3)


# ---------------------------------------------------------------------------
def test_ngram_novelty_matches_counters(spark):
    from collections import Counter

    df = _run(spark, "q399_ngram_novelty").set_index("source")
    docs = _docs()
    per_doc = {}
    dfreq = Counter()
    for r in docs.itertuples():
        w = [t for t in r.text.split(" ") if t]
        grams = {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}
        if grams:
            per_doc[r.doc_id] = (r.source, grams)
            dfreq.update(grams)
    agg = {}
    for src, grams in per_doc.values():
        uniq = sum(1 for g in grams if dfreq[g] == 1)
        nov = _rnd(1e6 * uniq / len(grams))
        s = agg.setdefault(src, [0, 0, 0])
        s[0] += 1
        s[1] += nov
        s[2] += nov < 500000
    for src, (n, snov, low) in agg.items():
        row = df.loc[src]
        assert int(row["n_docs"]) == n
        assert row["mean_novelty"] == pytest.approx(snov / n / 1e6, abs=2e-4)
        assert row["low_novelty_share"] == pytest.approx(low / n, abs=2e-4)


# ---------------------------------------------------------------------------
def test_shipping_sla_matches_numpy(spark):
    df = _run(spark, "q422_shipping_sla").set_index("priority")
    li = pd.read_parquet(SF_DIR + "/lineitem.parquet")
    od = pd.read_parquet(SF_DIR + "/orders.parquet")
    j = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    delay = (
        (
            pd.to_datetime(j["l_shipdate"]) - pd.to_datetime(j["o_orderdate"])
        ).dt.days
    ).to_numpy(float)
    for pr, g in pd.DataFrame(
        {"p": j["o_orderpriority"], "d": delay}
    ).groupby("p"):
        d = g["d"].to_numpy(float)
        row = df.loc[pr]
        assert int(row["n_items"]) == len(d)
        for col, q in (("p50_days", 0.5), ("p90_days", 0.9), ("p99_days", 0.99)):
            assert row[col] == pytest.approx(
                np.quantile(d, q, method="linear"), abs=1e-3
            ), (pr, col)
        assert row["breach_share"] == pytest.approx(
            float((d > 90).mean()), abs=2e-4
        )


# ---------------------------------------------------------------------------
def test_brand_return_rates_match_wilson(spark):
    df = _run(spark, "q425_brand_return_rates").set_index("brand")
    li = pd.read_parquet(SF_DIR + "/lineitem.parquet")
    part = pd.read_parquet(SF_DIR + "/part.parquet")
    j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    j["ret"] = (j["l_returnflag"] == "R").astype(int)
    nt, rt = len(j), int(j["ret"].sum())
    z = 1.959964
    for brand, g in j.groupby("p_brand"):
        n, r = len(g), int(g["ret"].sum())
        p = r / n
        half = z * math.sqrt((p * (1 - p) + z * z / (4 * n)) / n)
        lo = (p + z * z / (2 * n) - half) / (1 + z * z / n)
        hi = (p + z * z / (2 * n) + half) / (1 + z * z / n)
        row = df.loc[brand]
        assert int(row["n_items"]) == n and int(row["n_returned"]) == r
        assert row["return_rate"] == pytest.approx(p, abs=2e-4)
        assert row["wilson_lower"] == pytest.approx(lo, abs=2e-4)
        assert row["wilson_upper"] == pytest.approx(hi, abs=2e-4)
        assert int(row["elevated"]) == int(
            _rnd(1e4 * lo) > _rnd(1e4 * rt / nt)
        )


# ---------------------------------------------------------------------------
def test_policy_replay_matches_pandas(spark):
    df = _run(spark, "q449_policy_replay").set_index("context")
    ev = _events()
    sec = (ev["ts"] - pd.Timestamp("1970-01-01")) // pd.Timedelta(seconds=1)
    v = pd.DataFrame(
        {
            "ctx": ((sec // 3600) % 24) // 6,
            "act": ev["event_type"],
            "r": (100.0 * ev["value"]).round().astype("int64"),
            "odd": ev["event_id"] % 2,
        }
    )
    train = v[v["odd"] == 0]
    test = v[v["odd"] == 1]
    tg = train.groupby(["ctx", "act"])["r"].agg(["size", "sum"])
    mu = {
        k: _rnd(1e6 * s / n) for k, (n, s) in tg.iterrows()
    }
    for ctx in sorted(set(k[0] for k in mu)):
        acts = {a: m for (c, a), m in mu.items() if c == ctx}
        best = max(acts.values())
        pi = min(a for a, m in acts.items() if m == best)
        match = test[(test["ctx"] == ctx) & (test["act"] == pi)]
        if not len(match):
            continue
        n_ctx_train = int(train[train["ctx"] == ctx].shape[0])
        n_train_act = int(tg.loc[(ctx, pi), "size"])
        n_ev_ctx = int(test[test["ctx"] == ctx].shape[0])
        sr = match["r"].sum()
        row = df.loc[ctx]
        assert row["policy_action"] == pi
        assert int(row["n_match"]) == len(match)
        assert row["replay_reward"] == pytest.approx(
            sr / 100.0 / len(match), abs=2e-3
        )
        assert row["ips_value"] == pytest.approx(
            sr / 100.0 * n_ctx_train / n_train_act / n_ev_ctx, abs=2e-3
        )


# ---------------------------------------------------------------------------
def test_time_to_convert_matches_pandas(spark):
    row = _run(spark, "q176_time_to_convert").iloc[0]
    ev = _events()
    su = (
        ev[ev["event_type"] == "signup"].groupby("user_id")["ts"].min()
    )
    deltas = []
    for uid, s_ts in su.items():
        p = ev[
            (ev["user_id"] == uid)
            & (ev["event_type"] == "purchase")
            & (ev["ts"] > s_ts)
        ]["ts"]
        if len(p):
            d = (
                p.min().floor("s") - s_ts.floor("s")
            ) // pd.Timedelta(seconds=1)
            deltas.append(float(d))
    deltas = np.array(deltas)
    assert int(row["n_converted"]) == len(deltas)
    for col, q in (("p25_sec", 0.25), ("p50_sec", 0.5), ("p75_sec", 0.75)):
        assert row[col] == pytest.approx(
            np.quantile(deltas, q, method="linear"), rel=1e-6, abs=0.51
        )


# ---------------------------------------------------------------------------
def test_cvar_spend_matches_numpy(spark):
    df = _run(spark, "q435_cvar_spend").set_index("segment")
    od = pd.read_parquet(SF_DIR + "/orders.parquet")
    cu = pd.read_parquet(SF_DIR + "/customer.parquet")
    j = od.merge(cu, left_on="o_custkey", right_on="c_custkey")
    j["c"] = (100.0 * j["o_totalprice"]).round().astype("int64")
    for seg, g in j.groupby("c_mktsegment"):
        c = g["c"].to_numpy(float)
        hi4 = _rnd(100.0 * np.quantile(c, 0.95, method="linear"))
        tail = c[100 * c >= hi4]
        row = df.loc[seg]
        assert int(row["n"]) == len(c)
        assert row["var95"] == pytest.approx(hi4 / 1e4, abs=1e-3)
        assert int(row["tail_n"]) == len(tail)
        assert row["cvar95"] == pytest.approx(
            tail.sum() / 100.0 / len(tail), abs=1e-2
        )


# ---------------------------------------------------------------------------
def test_qq_deciles_match_numpy(spark):
    df = _run(spark, "q407_qq_deciles").set_index("decile")
    ev = _events()
    c = (100.0 * ev["value"]).round().astype("int64")
    even = c[ev["user_id"] % 2 == 0].to_numpy(float)
    odd = c[ev["user_id"] % 2 == 1].to_numpy(float)
    for d in range(1, 10):
        qe = np.quantile(even, d / 10.0, method="linear")
        qo = np.quantile(odd, d / 10.0, method="linear")
        row = df.loc[d]
        assert row["q_even"] == pytest.approx(qe / 100.0, abs=1e-3)
        assert row["q_odd"] == pytest.approx(qo / 100.0, abs=1e-3)
        assert row["qq_diff"] == pytest.approx((qo - qe) / 100.0, abs=2e-3)
