"""Semantic unit tests for the round-5 additions (q247-q259): ACF algebra,
EWMA forecast bounds, calibration-bin identities, association-statistic
ranges, banded levenshtein completeness, HITS normalisation."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from synth_transform_spark.operators import graph
from synth_transform_spark.functions import fuzzy
from synth_transform_spark.plans import REGISTRY

from conftest import SF_DIR


def test_acf_bounds_and_shape(spark):
    rows = REGISTRY["q247_acf"].spark(spark, SF_DIR).collect()
    assert len(rows) == 5 * 7  # 5 types x lags 1..7
    for r in rows:
        # Cauchy-Schwarz: |r_k| <= 1 for the full-denominator estimator
        assert -1.0 <= r["acf"] <= 1.0, r
        assert r["n_days"] == 30


def test_ewma_matches_naive_recompute(spark):
    from synth_transform_spark.plans.timeseries_queries import _EWMA_W
    from synth_transform_spark.sources.readers import load_table

    rows = REGISTRY["q248_ewma_control"].spark(spark, SF_DIR).collect()
    # first day per type has no history -> dropped: 29 rows per type
    assert len(rows) == 5 * 29

    ev = (
        load_table(spark, SF_DIR, "events")
        .groupBy("event_type", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"))
        .agg(
            F.floor(
                F.sum(F.round(F.col("value") * 10000.0).cast("long")).cast("double")
                / F.count(F.lit(1))
            ).cast("long").alias("x_int")
        )
        .collect()
    )
    series: dict[str, list] = {}
    for r in sorted(ev, key=lambda r: (r["event_type"], r["day"])):
        series.setdefault(r["event_type"], []).append((r["day"], r["x_int"]))
    expect = {}
    for et, days in series.items():
        for t in range(1, len(days)):
            num = den = 0
            for j, w in enumerate(_EWMA_W):
                if t - 1 - j >= 0:
                    num += days[t - 1 - j][1] * w
                    den += w
            expect[(et, days[t][0])] = (days[t][1], num // den)
    for r in rows:
        x_int, e_int = expect[(r["event_type"], r["day"])]
        assert r["daily_avg"] == x_int / 10000.0, r
        assert r["ewma"] == e_int / 10000.0, r
        assert r["dev"] == pytest.approx(r["daily_avg"] - r["ewma"], abs=1e-9)


def test_calibration_bins_sum_to_ece(spark):
    rows = REGISTRY["q249_calibration_ece"].spark(spark, SF_DIR).collect()
    assert {r["bin"] for r in rows} <= set(range(10))
    n_total = sum(r["n"] for r in rows)
    # ECE must equal the n-weighted mean of the per-bin gaps (4dp slack
    # because gap/ece are independently rounded)
    recon = sum(r["gap"] * r["n"] for r in rows) / n_total
    assert rows[0]["ece"] == pytest.approx(recon, abs=2e-4)
    eces = {r["ece"] for r in rows}
    assert len(eces) == 1  # replicated total is identical on every row


def test_association_stat_ranges(spark):
    row = REGISTRY["q250_categorical_association"].spark(spark, SF_DIR).collect()[0]
    assert row["dof"] == (5 - 1) * (4 - 1)
    assert row["chi2"] >= 0.0
    assert 0.0 <= row["cramers_v"] <= 1.0
    assert row["mi_nats"] >= 0.0


def test_levenshtein_band_pairs_complete_vs_bruteforce(spark):
    vals = [
        "small ring", "smalll ring", "small rng", "red widget",
        "red gadget", "blue bolt", "blu bolt", "totally different",
    ]
    df = spark.createDataFrame([(v,) for v in vals], ["name"])
    got = {
        (r["name_a"], r["name_b"], r["dist"])
        for r in fuzzy.levenshtein_band_pairs(df, "name", max_dist=2).collect()
    }

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    want = {
        (a, b, lev(a, b))
        for a in vals
        for b in vals
        if a < b and lev(a, b) <= 2
    }
    assert got == want


def test_hits_max_normalised(spark):
    edges = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (3, 12), (3, 10)], ["s", "d"]
    )
    rows = graph.hits(edges, n_iter=2).collect()
    hubs = {r["node"]: r["score"] for r in rows if r["side"] == "hub"}
    auths = {r["node"]: r["score"] for r in rows if r["side"] == "auth"}
    assert max(hubs.values()) == 1.0 and max(auths.values()) == 1.0
    assert all(0.0 < v <= 1.0 for v in list(hubs.values()) + list(auths.values()))
    # node 10 has the most in-links from the best hubs -> top authority
    assert auths[10] == 1.0


def test_t_closeness_zero_for_global_distribution(spark):
    """A group whose priority mix equals the global mix has EMD exactly 0;
    integer algebra means no float fuzz in that zero."""
    from synth_transform_spark.plans import REGISTRY

    df = REGISTRY["q253_t_closeness"].spark(spark, SF_DIR).toPandas()
    assert (df["t_emd"] >= 0).all()
    # EMD is bounded by 1 for normalized distributions on a unit chain
    assert (df["t_emd"] <= 1).all()
    assert set(df["violates_t"].unique()) <= {0, 1}
    # flag consistency with the reported 4dp value at t = 1/50 = 0.02
    for _, r in df.iterrows():
        if r["t_emd"] > 0.0201:
            assert r["violates_t"] == 1
        if r["t_emd"] < 0.0199:
            assert r["violates_t"] == 0


def test_knn_shapley_efficiency_property(spark):
    """KNN-Shapley values per query sum to the *efficiency* total: the
    full-train utility 1[y_(1)=y] ... actually Σ_i s_i = v(N) = P(first
    neighbour correct) estimated as ind of rank-1 under the closed form
    with K=1-like telescoping; for K=5 the documented property that holds
    exactly is monotone-telescoping: s_i depends only on suffix terms, so
    ranks with equal labels between i and N share values. We pin two
    invariants: (a) within a query, ranks j where ind_j == ind_{j+1} have
    s_j == s_{j+1}; (b) |s_i| ≤ 1/K + 1/N."""
    import pandas as pd
    from synth_transform_spark.plans import REGISTRY
    from synth_transform_spark.testing import duckdb_connection

    con = duckdb_connection(SF_DIR)
    # recompute full (not top-20) table from the oracle for the invariant
    full_sql = REGISTRY["q254_knn_shapley"].oracle.replace(
        "WHERE i <= 20", ""
    )
    df = con.execute(full_sql).df()
    assert not df.empty
    k, n = 5, df.groupby("query_id")["rank"].max().iloc[0]
    assert (df["shapley"].abs() <= 1.0 / k + 1.0 / n + 1e-9).all()
    spark_df = REGISTRY["q254_knn_shapley"].spark(spark, SF_DIR).toPandas()
    assert (spark_df.groupby("query_id")["rank"].max() == 20).all()


def test_item_item_cf_cosine_bounds(spark):
    from synth_transform_spark.plans import REGISTRY

    df = REGISTRY["q255_item_item_cf"].spark(spark, SF_DIR).toPandas()
    assert not df.empty
    assert (df["cosine"] > 0).all() and (df["cosine"] <= 1.0).all()
    assert (df["rnk"].isin([1, 2, 3])).all()
    # neighbour lists are ranked: within an item, rnk order follows cosine desc
    for _, g in df.groupby("item"):
        assert (
            g.sort_values("rnk")["cosine"].is_monotonic_decreasing
            or len(g) == 1
        )


def test_prefix_neighbor_dups_complete_at_32(spark):
    """Every pair sharing a ≥32-char prefix must appear as a CHAIN in the
    adjacent-pair relation: all docs with the same 32-prefix form one
    lexicographic run, so consecutive members are adjacent pairs with
    lcp_ge ≥ 32. Verify group-level completeness against brute force."""
    from synth_transform_spark.plans import REGISTRY
    from synth_transform_spark.testing import duckdb_connection

    con = duckdb_connection(SF_DIR)
    truth = con.execute(
        """
        SELECT SUBSTR(text, 1, 32) AS p, COUNT(*) AS c
        FROM read_parquet('{}/documents.parquet')
        GROUP BY p HAVING COUNT(*) > 1
        """.format(SF_DIR)
    ).df()
    df = REGISTRY["q256_prefix_neighbor_dups"].spark(spark, SF_DIR).toPandas()
    got_pairs_32 = (df["lcp_ge"] >= 32).sum()
    # each run of c docs contributes exactly c-1 adjacent pairs at ≥32
    expect = int((truth["c"] - 1).sum())
    assert got_pairs_32 == expect


def test_srp_distortion_monotone_trend(spark):
    """mean_cos must trend downward as hamming grows (JL preservation):
    the first bucket's mean beats the last bucket's mean, and
    est_theta_frac is exactly hamming/64."""
    from synth_transform_spark.plans import REGISTRY

    df = (
        REGISTRY["q257_srp_distortion"]
        .spark(spark, SF_DIR)
        .toPandas()
        .sort_values("hamming")
    )
    assert len(df) > 3
    assert df.iloc[0]["mean_cos"] > df.iloc[-1]["mean_cos"]
    # numpy .round is half-even while Spark rounds half-up (18/64 =
    # 0.28125 → 0.2813 in Spark, 0.2812 in numpy) — compare with tolerance
    assert ((df["est_theta_frac"] - df["hamming"] / 64).abs() <= 6e-5).all()


def test_winnowing_guarantee_on_planted_dup(spark):
    """Winnowing guarantee: substring matches of length ≥ k+w−1 = 15 chars
    share ≥1 fingerprint. Plant a near-dup pair and check it pairs up."""
    import pyspark.sql.functions as F
    from synth_transform_spark.plans import REGISTRY

    df = REGISTRY["q258_winnowing_fingerprints"].spark(spark, SF_DIR).toPandas()
    # corpus has planted near-dups (q27/q04 find them); winnowing must too
    assert not df.empty
    assert (df["shared"] >= 12).all()
    assert (df["doc_a"] < df["doc_b"]).all()


def test_sequence_patterns_counts_non_overlapping(spark):
    from synth_transform_spark.plans import REGISTRY

    df = REGISTRY["q259_sequence_patterns"].spark(spark, SF_DIR).toPandas()
    assert not df.empty
    assert (df["n_funnels"] >= 1).all()
    # a funnel needs ≥3 events
    assert (df["n_events"] >= 3 * df["n_funnels"]).all()


# -- q260-q267 semantics ----------------------------------------------------


def test_hbos_matches_numpy_recompute(spark):
    """q260's integer-frozen HBOS must equal a literal numpy recompute of
    Goldstein & Dengel's estimator under the same freezing."""
    import math

    import numpy as np
    import pandas as pd

    from synth_transform_spark.plans.similarity_queries import (
        _Q260_BINS,
        _Q260_TOPK,
    )

    df = REGISTRY["q260_hbos_outliers"].spark(spark, SF_DIR).toPandas()
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    X = np.array([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
    n, d = X.shape
    lo, hi = X.min(axis=0), X.max(axis=0)
    bins = np.minimum(
        np.floor((X - lo) / (hi - lo) * _Q260_BINS).astype(np.int64),
        _Q260_BINS - 1,
    )
    scores = np.zeros(n, dtype=np.int64)
    for i in range(d):
        counts = np.bincount(bins[:, i], minlength=_Q260_BINS)
        w = np.array(
            [
                round(1_000_000.0 * math.log(n / c)) if c else 0
                for c in counts
            ],
            dtype=np.int64,
        )
        scores += w[bins[:, i]]
    order = sorted(range(n), key=lambda j: (-scores[j], emb["vec_id"][j]))
    top = [(int(emb["vec_id"][j]), scores[j] / 1e6) for j in order[:_Q260_TOPK]]
    assert len(df) == _Q260_TOPK
    assert list(df["vec_id"]) == [t[0] for t in top]
    for got, (_, want) in zip(df["hbos"], top):
        assert got == round(want, 4)


def test_kmv_jaccard_error_identity_and_bounds(spark):
    df = REGISTRY["q261_kmv_source_jaccard"].spark(spark, SF_DIR).toPandas()
    n_src = len(set(df["source_a"]) | set(df["source_b"]))
    assert len(df) == n_src * (n_src - 1) // 2  # every unordered pair once
    assert ((df["est_jaccard"] >= 0) & (df["est_jaccard"] <= 1)).all()
    assert ((df["exact_jaccard"] >= 0) & (df["exact_jaccard"] <= 1)).all()
    # abs_err is |est - exact| of the UNROUNDED values, so it may differ
    # from the rounded columns' difference by at most the rounding slack
    gap = (df["abs_err"] - (df["est_jaccard"] - df["exact_jaccard"]).abs()).abs()
    assert (gap <= 1e-4 + 1e-12).all()
    # k=64 sketch on these corpus sizes: estimator stays in the coarse band
    assert (df["abs_err"] <= 0.35).all()


def test_kfold_partitions_and_accuracy_identity(spark):
    import pandas as pd
    import hashlib

    from synth_transform_spark.plans.similarity_queries import _Q262_FOLDS

    df = REGISTRY["q262_kfold_cv"].spark(spark, SF_DIR).toPandas()
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    folds = [
        int(hashlib.md5(str(v).encode()).hexdigest()[:2], 16) % _Q262_FOLDS
        for v in emb["vec_id"]
    ]
    sizes = pd.Series(folds).value_counts()
    assert len(df) == _Q262_FOLDS
    assert int(df["n_test"].sum()) == len(emb)  # folds partition the corpus
    for _, r in df.iterrows():
        assert int(r["n_test"]) == int(sizes[int(r["fold"])])
        assert r["accuracy"] == round(r["n_correct"] / r["n_test"], 4)
        assert 0.0 <= r["accuracy"] <= 1.0


def test_learning_curve_nested_and_fixed_test(spark):
    from synth_transform_spark.plans.similarity_queries import (
        _Q263_STEPS,
        _Q263_BANDS,
    )

    df = (
        REGISTRY["q263_learning_curve"]
        .spark(spark, SF_DIR)
        .toPandas()
        .sort_values("train_frac_pct")
    )
    assert list(df["train_frac_pct"]) == [
        t * (100 // _Q263_BANDS) for t in _Q263_STEPS
    ]
    # fixed held-out slice: identical n_test at every curve point
    assert df["n_test"].nunique() == 1
    # nested subsets: n_train strictly grows along the curve
    assert df["n_train"].is_monotonic_increasing
    assert (df["n_train"].diff().dropna() > 0).all()
    assert ((df["accuracy"] >= 0) & (df["accuracy"] <= 1)).all()


def test_sequential_ab_z_matches_naive(spark):
    """q264's daily cumulative z must equal the closed-form two-proportion
    statistic recomputed in Python from the raw events."""
    import math

    import pandas as pd

    df = REGISTRY["q264_sequential_ab"].spark(spark, SF_DIR).toPandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["day"] = pd.to_datetime(ev["ts"]).dt.floor("D")
    ev["a"] = ev["user_id"] % 2 == 0
    ev["conv"] = ev["event_type"] == "purchase"
    daily = (
        ev.groupby("day")
        .apply(
            lambda g: pd.Series(
                {
                    "na": int(g["a"].sum()),
                    "ca": int((g["a"] & g["conv"]).sum()),
                    "nb": int((~g["a"]).sum()),
                    "cb": int((~g["a"] & g["conv"]).sum()),
                }
            ),
            include_groups=False,
        )
        .sort_index()
        .cumsum()
    )
    assert len(df) == len(daily)
    got = df.sort_values("day").reset_index(drop=True)
    for i, (_, r) in enumerate(daily.iterrows()):
        assert int(got.loc[i, "cna"]) == r["na"]
        assert int(got.loc[i, "cca"]) == r["ca"]
        assert int(got.loc[i, "cnb"]) == r["nb"]
        assert int(got.loc[i, "ccb"]) == r["cb"]
        p = (r["ca"] + r["cb"]) / (r["na"] + r["nb"])
        z = (r["ca"] / r["na"] - r["cb"] / r["nb"]) / math.sqrt(
            p * (1 - p) * (1 / r["na"] + 1 / r["nb"])
        )
        assert got.loc[i, "z_stat"] == round(z, 4)
        assert got.loc[i, "crossed"] == (1 if abs(z) > 2.7 else 0)


def test_distinct_n_diversity_token_totals(spark):
    import pandas as pd

    df = REGISTRY["q265_distinct_n_diversity"].spark(spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    docs["nw"] = docs["text"].map(lambda t: len([w for w in t.split(" ") if w]))
    want = docs.groupby("source")["nw"].sum()
    for _, r in df.iterrows():
        assert int(r["n_tokens"]) == int(want[r["source"]])
        for c in ("distinct_1", "distinct_2", "distinct_3"):
            assert 0.0 < r[c] <= 1.0


def test_key_skew_audit_matches_pandas(spark):
    import pandas as pd

    df = (
        REGISTRY["q266_key_skew_audit"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("key_col")
    )
    assert len(df) == 4
    for table, col in (
        ("lineitem", "l_partkey"),
        ("lineitem", "l_suppkey"),
        ("orders", "o_custkey"),
        ("events", "user_id"),
    ):
        counts = (
            pd.read_parquet(f"{SF_DIR}/{table}.parquet")[col]
            .value_counts()
            .sort_values(ascending=False)
        )
        r = df.loc[f"{table}.{col}"]
        n_rows, n_keys, mx = counts.sum(), len(counts), counts.iloc[0]
        assert int(r["n_rows"]) == n_rows
        assert int(r["n_keys"]) == n_keys
        assert int(r["max_key_n"]) == mx
        assert r["max_share"] == round(mx / n_rows, 4)
        assert r["skew_ratio"] == round(mx * n_keys / n_rows, 4)
        assert r["top10_share"] >= r["max_share"]
        # top-10 share identity (tie-break on key asc never changes the sum)
        assert r["top10_share"] == round(counts.iloc[:10].sum() / n_rows, 4)


def test_personalized_pagerank_integer_recurrence(spark):
    """operators/graph.personalized_pagerank on a hand-sized graph must
    equal the literal integer recurrence run in pure Python."""
    from synth_transform_spark.operators.graph import personalized_pagerank

    edges = [(1, 2), (2, 1), (2, 3), (3, 1), (4, 1)]
    seeds = [1]
    e = spark.createDataFrame(edges, "s long, d long")
    s = spark.createDataFrame([(x,) for x in seeds], "node long")
    got = {
        r["node"]: r["score"]
        for r in personalized_pagerank(e, s, n_iter=3).collect()
    }

    B, d_pct = 1_000_000_000, 85
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    od = {}
    for u, _ in edges:
        od[u] = od.get(u, 0) + 1
    base = {v: ((100 - d_pct) * B) // (100 * len(seeds)) if v in seeds else 0
            for v in nodes}
    r = dict(base)
    for _ in range(3):
        in_sum = {v: 0 for v in nodes}
        for u, v in edges:
            in_sum[v] += r[u] // od[u]
        r = {v: base[v] + (d_pct * in_sum[v]) // 100 for v in nodes}
    for v in nodes:
        assert got[v] == r[v] / B, (v, got[v], r[v] / B)
    # teleport mass only reaches the seed: node 4 has no in-edges → 0
    assert got[4] == 0.0


def test_personalized_pagerank_mass_bounded(spark):
    """Floor division only loses mass: Σ score ≤ 1 on the q267 graph."""
    df = (
        REGISTRY["q267_personalized_pagerank"]
        .spark(spark, SF_DIR)
        .toPandas()
    )
    assert not df.empty
    assert (df["score"] >= 0).all()
    assert df["score"].sum() <= 1.0 + 1e-9


# -- q268-q275 semantics ----------------------------------------------------


def test_trigram_index_never_misses(spark):
    """Trigram containment is necessary for substring match, so candidates
    must be a superset of true matches - and n_matches must equal the
    exact per-pattern containment count."""
    import pandas as pd

    from synth_transform_spark.plans.textops import _Q268_PATTERNS

    df = (
        REGISTRY["q268_trigram_search"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("pattern")
    )
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    for p in _Q268_PATTERNS:
        true_matches = int(docs["text"].str.contains(p, regex=False).sum())
        r = df.loc[p]
        assert int(r["n_matches"]) == true_matches
        assert int(r["n_candidates"]) >= true_matches


def test_readability_matches_pooled_recompute(spark):
    import re

    import pandas as pd

    df = (
        REGISTRY["q269_readability"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("source")
    )
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    docs["w"] = docs["text"].map(lambda t: len([x for x in t.split(" ") if x]))
    docs["syl"] = docs["text"].map(lambda t: len(re.findall(r"[aeiouy]+", t)))
    g = docs.groupby("source").agg(
        n_docs=("doc_id", "size"), n_words=("w", "sum"), n_syl=("syl", "sum")
    )
    for src, r in g.iterrows():
        got = df.loc[src]
        assert int(got["n_words"]) == r["n_words"]
        assert int(got["n_syllables"]) == r["n_syl"]
        fk = 0.39 * (r["n_words"] / r["n_docs"]) + 11.8 * (
            r["n_syl"] / r["n_words"]
        ) - 15.59
        assert abs(got["fk_grade"] - fk) < 1e-3


def test_mmr_greedy_invariants(spark):
    """Rank 1 is the pure-relevance argmax; scores are non-increasing
    (each later pick optimises over a shrunken, more-penalised set); all
    picks distinct; score never exceeds 0.7 * rel."""
    df = (
        REGISTRY["q270_mmr_rerank"]
        .spark(spark, SF_DIR)
        .toPandas()
        .sort_values("mmr_rank")
    )
    assert list(df["mmr_rank"]) == [1, 2, 3, 4, 5]
    assert df["vec_id"].nunique() == 5
    assert abs(df.iloc[0]["score"] - round(0.7 * df.iloc[0]["rel"], 4)) <= 1e-9
    assert (df["score"].diff().dropna() <= 1e-9).all()
    # |sim| <= 1 bounds the redundancy term (sims may be NEGATIVE, which
    # legitimately pushes a score above 0.7 * rel)
    assert (df["score"] <= 0.7 * df["rel"] + 0.3 + 1e-9).all()
    assert (df["score"] >= 0.7 * df["rel"] - 0.3 - 1e-9).all()


def test_mmr_matches_numpy_greedy(spark):
    """Replicate pool selection + greedy in numpy (raw doubles, no 4dp
    freeze) and require the same picked ids - on this corpus no cosine
    pair sits within 1e-4 of a decision boundary, so the frozen and raw
    greedies agree."""
    import numpy as np
    import pandas as pd

    df = (
        REGISTRY["q270_mmr_rerank"]
        .spark(spark, SF_DIR)
        .toPandas()
        .sort_values("mmr_rank")
    )
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet").sort_values("vec_id")
    X = np.array([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
    ids = emb["vec_id"].to_numpy()
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    q = Xn[ids == 0][0]
    rel = Xn @ q
    rel[ids == 0] = -2
    order = sorted(range(len(ids)), key=lambda j: (-round(rel[j], 4), ids[j]))
    pool = order[:20]
    sims = Xn[pool] @ Xn[pool].T
    chosen = []
    for _ in range(5):
        best = None
        for pj, j in enumerate(pool):
            if pj in chosen:
                continue
            maxsim = max((sims[pj, c] for c in chosen), default=0.0)
            raw = 0.7 * rel[j] - 0.3 * maxsim
            key = (raw, -ids[j])
            if best is None or key > best[0]:
                best = (key, pj)
        chosen.append(best[1])
    assert list(df["vec_id"]) == [int(ids[pool[c]]) for c in chosen]


def test_theil_sen_matches_python(spark):
    import statistics

    import pandas as pd

    df = (
        REGISTRY["q271_theil_sen"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("event_type")
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["day"] = pd.to_datetime(ev["ts"]).dt.floor("D")
    daily = ev.groupby(["event_type", "day"]).size()
    for et in daily.index.get_level_values(0).unique():
        s = daily[et].sort_index()
        ts = [(d.toordinal(), c) for d, c in s.items()]
        slopes = [
            round(1e6 * (cj - ci) / (tj - ti))
            for k, (ti, ci) in enumerate(ts)
            for tj, cj in ts[k + 1 :]
        ]
        r = df.loc[et]
        assert int(r["n_pairs"]) == len(slopes)
        assert r["sen_slope"] == round(statistics.median(slopes) / 1e6, 4)


def test_backtest_skill_identity(spark):
    df = REGISTRY["q272_forecast_backtest"].spark(spark, SF_DIR).toPandas()
    assert (df["n_eval"] == 23).all()  # 30 contiguous days - 7
    for _, r in df.iterrows():
        # query computes skill from UNROUNDED MAEs; recomputing from the
        # 4dp-rounded output columns can drift a little past 1e-4
        assert abs(
            r["skill_vs_naive1"]
            - (1.0 - r["mae_snaive"] / r["mae_naive1"])
        ) <= 5e-4


def test_randomized_response_debias_identities(spark):
    df = REGISTRY["q273_randomized_response"].spark(spark, SF_DIR).toPandas()
    n = int(df["n_true"].sum())
    assert int(df["n_reported"].sum()) == n  # mechanism never drops a row
    # estimator identity per category
    k = len(df)
    for _, r in df.iterrows():
        est = (r["n_reported"] - n * 0.25 / k) / 0.75
        assert abs(r["n_hat"] - est) <= 1e-3
    # debiasing is exactly mass-preserving: sum n_hat == n
    assert abs(df["n_hat"].sum() - n) <= 1e-2


def test_temperature_weights_flatten_with_temperature(spark):
    df = REGISTRY["q274_temperature_weights"].spark(spark, SF_DIR).toPandas()
    for c in ("w_t100", "w_t050", "w_t025"):
        assert abs(df[c].sum() - 1.0) <= 1e-2  # 4dp-rounded weights sum to 1
    # lower temperature -> flatter distribution
    assert df["w_t100"].var() >= df["w_t050"].var() >= df["w_t025"].var()
    # small sources get boosted, large ones damped
    small = df.loc[df["n_tokens"].idxmin()]
    large = df.loc[df["n_tokens"].idxmax()]
    assert small["w_t050"] >= small["w_t100"]
    assert large["w_t050"] <= large["w_t100"]
    assert small["epochs_t050"] >= 1.0 >= large["epochs_t050"]


def test_zonemap_clustering_actually_prunes(spark):
    df = (
        REGISTRY["q275_zonemap_audit"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("layout")
    )
    nat, clu = df.loc["natural"], df.loc["date_clustered"]
    assert int(nat["rows_total"]) == int(clu["rows_total"])
    # same rows survive the predicate regardless of layout; clustering
    # must scan no MORE than natural order
    assert clu["row_scan_frac"] <= nat["row_scan_frac"]
    assert clu["rows_scanned"] <= nat["rows_scanned"]
    # and the clustered layout must genuinely skip blocks
    assert int(clu["n_scanned"]) < int(clu["n_blocks"])


# -- q276-q281 semantics ----------------------------------------------------


def test_unigram_viterbi_matches_python_dp(spark):
    """Full Python recompute: piece frequencies, frozen log scores, and
    the (score desc, pieces asc, split asc) Viterbi DP must reproduce
    every word's n_pieces and logprob."""
    import math

    import pandas as pd

    df = (
        REGISTRY["q276_unigram_viterbi"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("word")
    )
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    wf: dict[str, int] = {}
    for t in docs["text"]:
        for w in t.split(" "):
            if w and len(w) <= 12:
                wf[w] = wf.get(w, 0) + 1
    pf: dict[str, int] = {}
    for w, f in wf.items():
        for i in range(len(w)):
            for L in range(1, min(4, len(w) - i) + 1):
                pf[w[i : i + L]] = pf.get(w[i : i + L], 0) + f
    tot = sum(pf.values())
    s = {p: round(1e6 * math.log(c / tot)) for p, c in pf.items()}
    for w, f in wf.items():
        best = {0: (0, 0)}  # j -> (score, npieces)
        for j in range(1, len(w) + 1):
            cands = []
            for i in range(max(0, j - 4), j):
                if i in best:
                    sc, np_ = best[i]
                    cands.append((sc + s[w[i:j]], -(np_ + 1), -i))
            top = max(cands)
            best[j] = (top[0], -top[1])
        sc, np_ = best[len(w)]
        r = df.loc[w]
        assert int(r["n_pieces"]) == np_, (w, np_, r["n_pieces"])
        assert r["logprob"] == round(sc / 1e6, 4), (w, sc)
    assert len(df) == len(wf)


def test_removal_effect_on_hand_chain(spark):
    """START splits 50/50 to a and b, both convert: removing either
    channel halves conversion, attribution is an exact 50/50 split."""
    from synth_transform_spark.operators.graph import (
        removal_effect_attribution,
    )

    probs = spark.createDataFrame(
        [
            ("_START", "a", 500000),
            ("_START", "b", 500000),
            ("a", "purchase", 1000000),
            ("b", "purchase", 1000000),
        ],
        "s string, t string, p long",
    )
    rows = {
        r["channel"]: r
        for r in removal_effect_attribution(probs, ("a", "b")).collect()
    }
    for c in ("a", "b"):
        assert rows[c]["p_full"] == 1.0
        assert rows[c]["p_removed"] == 0.5
        assert rows[c]["removal_effect"] == 0.5
        assert rows[c]["attribution"] == 0.5


def test_markov_attribution_invariants(spark):
    df = REGISTRY["q277_markov_attribution"].spark(spark, SF_DIR).toPandas()
    assert len(df) == 4
    assert df["p_full"].nunique() == 1
    assert (df["p_removed"] <= df["p_full"] + 1e-9).all()
    assert ((df["removal_effect"] >= 0) & (df["removal_effect"] <= 1)).all()
    assert abs(df["attribution"].sum() - 1.0) <= 2e-4


def test_bh_rejections_are_a_p_value_prefix(spark):
    df = (
        REGISTRY["q278_bh_fdr"]
        .spark(spark, SF_DIR)
        .toPandas()
        .sort_values(["p_value", "event_type", "weekday"])
        .reset_index(drop=True)
    )
    assert len(df) == 35
    assert ((df["p_value"] >= 0) & (df["p_value"] <= 1.0001)).all()
    rej = list(df["rejected"])
    # BH rejects exactly the kmax smallest p-values - a prefix
    assert rej == sorted(rej, reverse=True)
    # cell counts partition the type totals
    assert (df.groupby("event_type")["n_cell"].sum()
            == df.groupby("event_type")["n_type"].first()).all()


def test_next_event_argmax_matches_pandas(spark):
    import pandas as pd

    df = (
        REGISTRY["q279_next_event_accuracy"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("state")
    )
    ev = (
        pd.read_parquet(f"{SF_DIR}/events.parquet")
        .sort_values(["user_id", "ts", "event_id"])
    )
    ev["nxt"] = ev.groupby("user_id")["event_type"].shift(-1)
    tr = ev.dropna(subset=["nxt"]).groupby(["event_type", "nxt"]).size()
    for s in tr.index.get_level_values(0).unique():
        g = tr[s]
        top = sorted(g.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        r = df.loc[s]
        assert r["top_next"] == top
        assert int(r["n_trans"]) == int(g.sum())
        assert r["hit_rate"] == round(g[top] / g.sum(), 4)


def test_cohens_kappa_matches_sklearn_formula(spark):
    df = REGISTRY["q280_cohens_kappa"].spark(spark, SF_DIR).toPandas()
    n = df["n_gold"].sum()
    po = df["n_correct"].sum() / n
    pe = (df["n_gold"] * df["n_pred"]).sum() / (n * n)
    kappa = (po - pe) / (1 - pe)
    assert df["kappa"].nunique() == 1
    assert abs(df["kappa"].iloc[0] - kappa) <= 1e-4
    # marginals consistent
    assert df["n_pred"].sum() == n
    assert (df["n_correct"] <= df[["n_gold", "n_pred"]].min(axis=1)).all()


def test_abc_classes_match_pandas_cutoffs(spark):
    import pandas as pd

    df = REGISTRY["q281_abc_classes"].spark(spark, SF_DIR).toPandas()
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    part = pd.read_parquet(f"{SF_DIR}/part.parquet")[["p_partkey", "p_brand"]]
    li = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    li["r"] = (
        (10000.0 * li["l_extendedprice"] * (1.0 - li["l_discount"]))
        .round()
        .astype("int64")
    )
    rev = li.groupby(["p_brand", "l_partkey"])["r"].sum().reset_index()
    got = df.set_index(["p_brand", "abc_class"])
    for brand, g in rev.groupby("p_brand"):
        g = g.sort_values(["r", "l_partkey"], ascending=[False, True])
        tot = int(g["r"].sum())
        cum, classes = 0, []
        for r in g["r"]:
            cum += int(r)
            classes.append(
                "A" if 5 * cum <= 4 * tot else ("B" if 20 * cum <= 19 * tot else "C")
            )
        g["cls"] = classes
        for cls, cg in g.groupby("cls"):
            row = got.loc[(brand, cls)]
            assert int(row["n_parts"]) == len(cg)
            assert row["rev_share"] == round(cg["r"].sum() / tot, 4)
    # every brand's shares sum to ~1
    s = df.groupby("p_brand")["rev_share"].sum()
    assert ((s - 1.0).abs() <= 2e-4).all()


# -- q282-q285 semantics ----------------------------------------------------


def test_ktruss_peel_monotone_and_consistent(spark):
    df = (
        REGISTRY["q282_ktruss_peel"]
        .spark(spark, SF_DIR)
        .toPandas()
        .sort_values("peel_round")
        .reset_index(drop=True)
    )
    assert list(df["peel_round"]) == [1, 2]
    # flow conservation and monotone shrinkage
    assert (df["n_edges_in"] - df["n_removed"] == df["n_edges_out"]).all()
    assert df.loc[1, "n_edges_in"] == df.loc[0, "n_edges_out"]
    assert (df["n_removed"] >= 0).all()
    # round 2 removes no more than round 1 (supports only drop after a peel,
    # but survivors already had support >= 2, so the second cut is smaller)
    assert df.loc[1, "n_removed"] <= df.loc[0, "n_removed"]


def test_roc_auc_matches_sklearn_free_recompute(spark):
    """Exact AUC recompute via pandas rank (average ranks = tie-corrected
    Mann-Whitney) must equal the count-algebra result."""
    import pandas as pd

    row = REGISTRY["q283_roc_auc"].spark(spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    v = (10000.0 * ev["value"]).round()
    pos = (ev["event_type"] == "purchase").astype(int)
    ranks = pd.Series(v).rank(method="average")
    n_pos, n_neg = int(pos.sum()), int((1 - pos).sum())
    u = ranks[pos == 1].sum() - n_pos * (n_pos + 1) / 2
    auc = u / (n_pos * n_neg)
    assert int(row["n_pos"]) == n_pos and int(row["n_neg"]) == n_neg
    assert abs(row["auc"] - auc) <= 1e-4


def test_did_matches_statsmodels_free_recompute(spark):
    import math

    import pandas as pd

    row = REGISTRY["q284_diff_in_diff"].spark(spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["x"] = (100.0 * ev["value"]).round()
    ev["post"] = pd.to_datetime(ev["ts"]) >= pd.Timestamp("2024-01-16")
    ev["t"] = ev["user_id"] % 2 == 1
    cells = {}
    for t in (True, False):
        for post in (True, False):
            g = ev[(ev["t"] == t) & (ev["post"] == post)]["x"]
            cells[(t, post)] = (len(g), g.mean(), g.var(ddof=1))
    did = (cells[(True, True)][1] - cells[(True, False)][1]) - (
        cells[(False, True)][1] - cells[(False, False)][1]
    )
    se = math.sqrt(sum(v / n for n, _, v in cells.values()))
    assert int(row["n_t_post"]) == cells[(True, True)][0]
    assert abs(row["did"] - did / 100.0) <= 1e-3
    assert abs(row["se"] - se / 100.0) <= 1e-3
    assert abs(row["t_stat"] - did / se) <= 1e-3


def test_rec_coverage_bounds_and_list_size(spark):
    row = (
        REGISTRY["q285_rec_coverage_novelty"]
        .spark(spark, SF_DIR)
        .toPandas()
        .iloc[0]
    )
    assert 0 < row["coverage"] <= 1.0
    assert row["n_recommended"] <= row["n_catalog"]
    # every list row is one of <=3 neighbours of some item
    recs = REGISTRY["q255_item_item_cf"].spark(spark, SF_DIR).toPandas()
    assert int(row["n_list_rows"]) == len(recs)
    assert row["mean_novelty_nats"] > 0  # no item covers every order
    assert abs(row["mean_cooc"] - round(recs["cooc"].mean(), 4)) <= 1e-4


# -- q286-q289 semantics ----------------------------------------------------


def test_expectation_suite_matches_pandas(spark):
    import pandas as pd

    df = (
        REGISTRY["q286_expectation_suite"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("rule")
    )
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    assert int(df.loc["lineitem.l_quantity not_null", "n_failed"]) == int(
        li["l_quantity"].isna().sum()
    )
    assert int(df.loc["lineitem.l_discount in [0,1]", "n_failed"]) == int(
        ((li["l_discount"] < 0) | (li["l_discount"] > 1)).sum()
    )
    assert int(df.loc["orders.o_totalprice > 0", "n_failed"]) == int(
        (orders["o_totalprice"] <= 0).sum()
    )
    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    assert int(
        df.loc["lineitem.l_shipdate >= orders.o_orderdate", "n_failed"]
    ) == int((j["l_shipdate"] < j["o_orderdate"]).sum())
    fk = (~li["l_orderkey"].isin(orders["o_orderkey"])).sum()
    assert int(df.loc["lineitem.l_orderkey fk orders", "n_failed"]) == int(fk)
    for _, r in df.iterrows():
        assert r["pass_rate"] == round(1.0 - r["n_failed"] / r["n_checked"], 4)


def test_dp_histogram_noise_is_laplace_quantile(spark):
    """Reproduce the seeded noise from the md5 stream and verify the
    release is exactly true + noise."""
    import hashlib
    import math

    df = REGISTRY["q287_dp_histogram"].spark(spark, SF_DIR).toPandas()
    for _, r in df.iterrows():
        u = (
            int(hashlib.md5(r["event_type"].encode()).hexdigest()[:8], 16)
            % 1000000
            + 0.5
        ) / 1000000.0
        noise = round(
            (1.0 if u < 0.5 else -1.0) * 2 * math.log(1.0 - 2.0 * abs(u - 0.5))
        )
        assert int(r["noise_added"]) == noise
        assert int(r["n_noisy"]) == int(r["n_true"]) + noise


def test_linear_interp_lies_between_neighbors(spark):
    import pandas as pd

    df = REGISTRY["q288_linear_interp"].spark(spark, SF_DIR).toPandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["d"] = (
        pd.to_datetime(ev["ts"]).dt.floor("D")
        - pd.Timestamp("2024-01-01")
    ).dt.days
    ev["x"] = (100.0 * ev["value"]).round().astype("int64")
    daily = (
        ev.groupby(["event_type", "d"])["x"]
        .apply(lambda g: int(g.sum()) // len(g))
        .reset_index()
    )
    present = daily[daily["d"] % 3 != 0].set_index(["event_type", "d"])["x"]
    # day 0 has no left neighbour -> dropped; all other %3 days interpolated
    assert (df["day_idx"] % 3 == 0).all()
    assert 0 not in set(df["day_idx"])
    for _, r in df.iterrows():
        et, d = r["event_type"], int(r["day_idx"])
        pd_ = max(dd for (e, dd) in present.index if e == et and dd < d)
        nd = min(dd for (e, dd) in present.index if e == et and dd > d)
        px, nx = present[(et, pd_)], present[(et, nd)]
        want = (px + (nx - px) * (d - pd_) / (nd - pd_)) / 100.0
        assert abs(r["value_interp"] - want) <= 1e-4
        lo, hi = min(px, nx) / 100.0, max(px, nx) / 100.0
        assert lo - 1e-9 <= r["value_interp"] <= hi + 1e-9


def test_gain_chart_identities(spark):
    df = (
        REGISTRY["q289_gain_chart"]
        .spark(spark, SF_DIR)
        .toPandas()
        .sort_values("decile")
    )
    auc_row = REGISTRY["q283_roc_auc"].spark(spark, SF_DIR).toPandas().iloc[0]
    n, p = auc_row["n_pos"] + auc_row["n_neg"], auc_row["n_pos"]
    assert int(df["n_rows"].sum()) == n
    assert int(df["n_pos"].sum()) == p
    assert abs(df["capture"].iloc[-1] - 1.0) <= 1e-9  # last decile captures all
    assert df["capture"].is_monotonic_increasing
    # lift identity: n-weighted mean lift == 1
    wmean = (df["lift"] * df["n_rows"]).sum() / n
    assert abs(wmean - 1.0) <= 1e-3


# -- q290-q293 semantics ----------------------------------------------------


def test_cluster_purity_entropy_identities(spark):
    import math

    df = REGISTRY["q290_cluster_purity"].spark(spark, SF_DIR).toPandas()
    assert not df.empty
    assert (df["cluster_size"] >= 2).all()
    assert (df["n_sources"] <= df["cluster_size"]).all()
    # entropy bounds: 0 (pure) .. ln(n_sources) (uniform)
    assert (df["entropy_nats"] >= -1e-9).all()
    for _, r in df.iterrows():
        assert r["entropy_nats"] <= math.log(r["n_sources"]) + 1e-4
        assert r["top_share"] >= 1.0 / r["n_sources"] - 1e-4  # 4dp slack
        if r["n_sources"] == 1:
            assert r["entropy_nats"] == 0.0 and r["top_share"] == 1.0


def test_covariate_balance_matches_pandas(spark):
    import math

    import pandas as pd

    df = (
        REGISTRY["q291_covariate_balance"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("covariate")
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["value_x100"] = (100.0 * ev["value"]).round()
    ts = pd.to_datetime(ev["ts"])
    ev["hour_of_day"] = ts.dt.hour
    ev["iso_weekday"] = ts.dt.dayofweek + 1
    t = ev[ev["user_id"] % 2 == 1]
    c = ev[ev["user_id"] % 2 == 0]
    for cov in ("value_x100", "hour_of_day", "iso_weekday"):
        smd = (t[cov].mean() - c[cov].mean()) / math.sqrt(
            (t[cov].var(ddof=1) + c[cov].var(ddof=1)) / 2
        )
        r = df.loc[cov]
        assert abs(r["mean_treated"] - t[cov].mean()) <= 1e-3
        assert abs(r["smd"] - smd) <= 1e-3
        assert r["balanced"] == (1 if abs(smd) < 0.1 else 0)


def test_broadcast_advisor_sizes_match_pandas(spark):
    import pandas as pd

    from synth_transform_spark.plans.events_queries import _Q292_TABLES

    df = (
        REGISTRY["q292_broadcast_advisor"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("table_name")
    )
    for t, (strs, fixed) in _Q292_TABLES.items():
        tab = pd.read_parquet(f"{SF_DIR}/{t}.parquet")
        est = sum(tab[c].str.encode("utf-8").str.len().sum() for c in strs)
        est += 8 * len(fixed) * len(tab)
        r = df.loc[t]
        assert int(r["n_rows"]) == len(tab)
        assert int(r["est_bytes"]) == int(est)
        assert r["broadcastable"] == (1 if est < 10 * 1024 * 1024 else 0)


def test_quantile_normalize_preserves_marginals(spark):
    """Quantile normalization must (a) keep every doc, (b) map within-
    source order monotonically, (c) draw every normalized value from the
    global value multiset."""
    import pandas as pd

    df = REGISTRY["q293_quantile_normalize"].spark(spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    assert len(df) == len(docs)
    global_vals = set(docs["n_chars"])
    assert set(df["qnorm_chars"]) <= global_vals
    for _, g in df.groupby("source"):
        g = g.sort_values(["n_chars", "doc_id"])
        assert g["qnorm_chars"].is_monotonic_increasing
    # extremes map to (near-)extremes: the source minimum maps to the
    # global minimum region, the maximum to the top
    gmin, gmax = docs["n_chars"].min(), docs["n_chars"].max()
    for _, g in df.groupby("source"):
        assert g["qnorm_chars"].min() == gmin  # source rank 1 -> global pos 1
        assert g["qnorm_chars"].max() == gmax  # source rank n -> global pos N


# -- q294-q297 semantics ----------------------------------------------------


def test_mann_kendall_matches_python(spark):
    import math

    import pandas as pd

    df = (
        REGISTRY["q294_mann_kendall"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("event_type")
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["day"] = pd.to_datetime(ev["ts"]).dt.floor("D")
    daily = ev.groupby(["event_type", "day"]).size()
    for et in daily.index.get_level_values(0).unique():
        c = list(daily[et].sort_index())
        n = len(c)
        s = sum(
            (1 if c[j] > c[i] else (-1 if c[j] < c[i] else 0))
            for i in range(n)
            for j in range(i + 1, n)
        )
        from collections import Counter

        tie = sum(
            t * (t - 1) * (2 * t + 5) for t in Counter(c).values() if t > 1
        )
        var = (n * (n - 1) * (2 * n + 5) - tie) / 18.0
        z = 0.0 if s == 0 else (s - (1 if s > 0 else -1)) / math.sqrt(var)
        r = df.loc[et]
        assert int(r["s_stat"]) == s
        assert abs(r["z_stat"] - z) <= 1e-3
        assert 0.0 <= r["p_value"] <= 1.0001


def test_userlevel_dp_cap_is_respected(spark):
    import pandas as pd

    df = REGISTRY["q295_userlevel_dp"].spark(spark, SF_DIR).toPandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    per_user = ev.groupby(["event_type", "user_id"]).size().clip(upper=5)
    want = per_user.groupby("event_type").sum()
    for _, r in df.iterrows():
        assert int(r["n_capped"]) == int(want[r["event_type"]])
        assert r["n_capped"] <= r["n_true"]
        assert int(r["n_noisy"]) == int(r["n_capped"]) + int(r["noise_added"])
        # Laplace(b=10) noise stays within a few scale units at this seed
        assert abs(int(r["noise_added"])) <= 10 * 14  # b * ln(1e6) bound


def test_joinsize_exact_matches_pandas(spark):
    import pandas as pd

    df = (
        REGISTRY["q296_joinsize_estimate"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("key_col")
    )
    for table, col in (
        ("lineitem", "l_partkey"),
        ("lineitem", "l_suppkey"),
        ("orders", "o_custkey"),
    ):
        counts = pd.read_parquet(f"{SF_DIR}/{table}.parquet")[col].value_counts()
        exact = int((counts**2).sum())
        r = df.loc[f"{table}.{col}"]
        assert int(r["exact_size"]) == exact
        assert int(r["est_size"]) % 10 == 0  # x10 scale-up of a subset sum
        assert r["rel_err"] == round(abs(r["est_size"] - exact) / exact, 4)


def test_dtw_not_above_lockstep_and_matches_python(spark):
    """DTW over equal-length series can never exceed the lock-step L1
    path (which is one admissible alignment); verify against a literal
    Python DP on the same frozen buckets."""
    import pandas as pd

    df = REGISTRY["q297_dtw_distance"].spark(spark, SF_DIR).toPandas()
    assert (df["dtw"] <= df["l1_lockstep"] + 1e-9).all()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["b"] = (
        (pd.to_datetime(ev["ts"]).dt.floor("D") - pd.Timestamp("2024-01-01"))
        .dt.days
        // 3
    )
    ev["x"] = (100.0 * ev["value"]).round().astype("int64")
    ser = {}
    g = ev[ev["b"] < 10].groupby(["event_type", "b"])["x"]
    agg = g.apply(lambda s: int(s.sum()) // len(s))
    for (et, b), v in agg.items():
        ser.setdefault(et, {})[b] = v
    types = sorted(ser)
    got = df.set_index(["type_a", "type_b"])["dtw"]
    for ai in range(len(types)):
        for bi in range(ai + 1, len(types)):
            a = [ser[types[ai]][k] for k in range(10)]
            b = [ser[types[bi]][k] for k in range(10)]
            INF = 1 << 60
            D = [[INF] * 11 for _ in range(11)]
            D[0][0] = 0
            for i in range(1, 11):
                for j in range(1, 11):
                    D[i][j] = abs(a[i - 1] - b[j - 1]) + min(
                        D[i - 1][j], D[i][j - 1], D[i - 1][j - 1]
                    )
            assert got[(types[ai], types[bi])] == round(D[10][10] / 100.0, 4)


# -- q298-q300 semantics ----------------------------------------------------


def test_exact_ols_matches_numpy_lstsq(spark):
    import numpy as np
    import pandas as pd

    df = (
        REGISTRY["q298_exact_ols"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("feature")
    )
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    X = np.column_stack(
        [
            np.ones(len(li)),
            li["l_quantity"].to_numpy(dtype=np.float64),
            (100.0 * li["l_discount"]).round(),
        ]
    )
    y = li["l_extendedprice"].round().to_numpy(dtype=np.float64)
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert abs(df.loc["intercept", "beta"] - beta[0]) <= 1e-2
    assert abs(df.loc["quantity", "beta"] - beta[1]) <= 1e-3
    assert abs(df.loc["discount_pct", "beta"] - beta[2]) <= 1e-3
    pred = X @ beta
    r2 = 1.0 - ((y - pred) ** 2).sum() / ((y - y.mean()) ** 2).sum()
    assert abs(df["r_squared"].iloc[0] - r2) <= 1e-3


def test_stratified_uplift_pools_correctly(spark):
    df = (
        REGISTRY["q299_stratified_uplift"]
        .spark(spark, SF_DIR)
        .toPandas()
        .sort_values("stratum")
    )
    assert df["pooled_ate"].nunique() == 1
    n_s = df["n_t"] + df["n_c"]
    pooled = (df["uplift"] * n_s).sum() / n_s.sum()
    assert abs(df["pooled_ate"].iloc[0] - pooled) <= 2e-4
    for _, r in df.iterrows():
        assert abs(
            r["uplift"] - (r["rate_treated"] - r["rate_control"])
        ) <= 2e-4
        assert r["n_t"] > 0 and r["n_c"] > 0  # empty-arm strata dropped


def test_powerlaw_alpha_matches_python(spark):
    import math

    import pandas as pd

    row = (
        REGISTRY["q300_powerlaw_alpha"].spark(spark, SF_DIR).toPandas().iloc[0]
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    deg = ev.groupby("user_id").size()
    alpha = 1.0 + len(deg) / sum(math.log(k / 0.5) for k in deg)
    assert int(row["n_users"]) == len(deg)
    assert int(row["max_degree"]) == int(deg.max())
    assert abs(row["alpha"] - alpha) <= 1e-3


# -- q301 semantics ---------------------------------------------------------


def test_streaming_two_level_matches_batch_below_boundary(spark):
    """The chained streaming rollup must equal the batch two-level rollup
    on every window the final watermark closed, and emit nothing past
    the boundary."""
    import pandas as pd

    df = REGISTRY["q301_streaming_two_level"].spark(spark, SF_DIR).toPandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["w"] = pd.to_datetime(ev["ts"]).dt.floor("h")
    l1 = ev.groupby(["w", "event_type"]).size()
    l2 = l1.groupby("w").agg(["count", "sum", "max"])
    boundary = pd.to_datetime(ev["ts"]).max() - pd.Timedelta(hours=2)
    want = l2[l2.index + pd.Timedelta(hours=1) <= boundary]
    assert len(df) == len(want)
    got = df.set_index("window_start")
    for w, r in want.iterrows():
        g = got.loc[w]
        assert int(g["n_types"]) == r["count"]
        assert int(g["total_events"]) == r["sum"]
        assert int(g["max_type_n"]) == r["max"]
    assert (got.index + pd.Timedelta(hours=1) <= boundary).all()


# -- q302-q306 semantics ----------------------------------------------------


def test_psi_zero_on_identical_halves(spark):
    """PSI of a distribution against itself is exactly 0 - check via the
    operator algebra on a symmetric synthetic frame, and sanity-bound
    the real corpus values."""
    df = REGISTRY["q302_psi_drift"].spark(spark, SF_DIR).toPandas()
    assert (df["psi"] >= 0).all()  # PSI is a symmetrised KL -> nonnegative
    for _, r in df.iterrows():
        want = 2 if r["psi"] >= 0.25 else (1 if r["psi"] >= 0.1 else 0)
        assert r["drift_level"] == want


def test_segment_migration_row_shares(spark):
    import pandas as pd

    df = REGISTRY["q303_segment_migration"].spark(spark, SF_DIR).toPandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    n_users = ev["user_id"].nunique()
    # every user appears exactly once in the matrix
    assert int(df["n_users"].sum()) == n_users
    shares = df.groupby("from_seg")["row_share"].sum()
    assert ((shares - 1.0).abs() <= 2e-3).all()


def test_domain_quantiles_match_pandas(spark):
    import pandas as pd

    df = (
        REGISTRY["q304_domain_quantiles"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("event_type")
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["v"] = (100.0 * ev["value"]).round().astype("int64")
    for et, g in ev.groupby("event_type"):
        vs = sorted(g["v"])
        n = len(vs)
        r = df.loc[et]
        assert int(r["n"]) == n
        for p in (50, 90, 99):
            k = (p * n + 99) // 100  # lower-nearest order statistic
            assert r[f"p{p}"] == round(vs[k - 1] / 100.0, 4), (et, p)


def test_ks_test_matches_scipy_free_recompute(spark):
    import math

    import pandas as pd

    row = REGISTRY["q305_ks_test"].spark(spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["v"] = (100.0 * ev["value"]).round().astype("int64")
    t = sorted(ev.loc[ev["user_id"] % 2 == 1, "v"])
    c = sorted(ev.loc[ev["user_id"] % 2 == 0, "v"])
    vals = sorted(set(t) | set(c))
    import bisect

    d = max(
        abs(bisect.bisect_right(t, v) / len(t) - bisect.bisect_right(c, v) / len(c))
        for v in vals
    )
    ne = len(t) * len(c) / (len(t) + len(c))
    assert int(row["n1"]) == len(t) and int(row["n2"]) == len(c)
    assert abs(row["d_stat"] - d) <= 1e-4
    assert abs(row["p_value"] - 2.0 * math.exp(-2.0 * d * d * ne)) <= 1e-3


def test_spearman_matches_pandas_corr(spark):
    import pandas as pd

    df = REGISTRY["q306_spearman_daily"].spark(spark, SF_DIR).toPandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["day"] = pd.to_datetime(ev["ts"]).dt.floor("D")
    mat = ev.groupby(["day", "event_type"]).size().unstack()
    rho = mat.corr(method="spearman")
    for _, r in df.iterrows():
        assert abs(r["rho"] - rho.loc[r["type_a"], r["type_b"]]) <= 1e-3
    assert (df["rho"].abs() <= 1.0 + 1e-9).all()


# -- q307-q310 semantics ----------------------------------------------------


def test_lead_lag_zero_lag_agrees_with_pearson(spark):
    """At lag 0 the full overlap is the 30-day series; the chosen best
    lag's |r| must be >= the lag-0 |r| (argmax property), and lag-0 r
    must match pandas Pearson."""
    import pandas as pd

    df = REGISTRY["q307_lead_lag"].spark(spark, SF_DIR).toPandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["day"] = pd.to_datetime(ev["ts"]).dt.floor("D")
    mat = ev.groupby(["day", "event_type"]).size().unstack()
    corr = mat.corr()
    for _, r in df.iterrows():
        r0 = corr.loc[r["type_a"], r["type_b"]]
        assert abs(r["best_r"]) >= abs(round(r0, 4)) - 1e-9, r
        assert -3 <= r["best_lag"] <= 3


def test_greedy_coverage_is_monotone_submodular(spark):
    import pandas as pd

    df = (
        REGISTRY["q308_greedy_coverage"]
        .spark(spark, SF_DIR)
        .toPandas()
        .sort_values("step")
    )
    # diminishing returns: marginal gains never increase along the greedy
    assert (df["new_tokens"].diff().dropna() <= 0).all()
    # coverage telescopes exactly
    assert (df["covered_total"] == df["new_tokens"].cumsum()).all()
    assert df["source"].nunique() == len(df)
    # greedy step 1 is the globally best single source
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")

    def grams(t):
        w = [x for x in t.split(" ") if x]
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    per_src: dict[str, set] = {}
    for _, d in docs.iterrows():
        per_src.setdefault(d["source"], set()).update(grams(d["text"]))
    best = max(sorted(per_src), key=lambda s: len(per_src[s]))
    assert df.iloc[0]["source"] == best
    assert int(df.iloc[0]["new_tokens"]) == len(per_src[best])


def test_entropy_rate_is_mixture_of_conditionals(spark):
    import math

    df = REGISTRY["q309_entropy_rate"].spark(spark, SF_DIR).toPandas()
    assert df["entropy_rate"].nunique() == 1
    n = df["n_out"].sum()
    mix = (df["h_conditional"] * df["n_out"]).sum() / n
    assert abs(df["entropy_rate"].iloc[0] - mix) <= 2e-4
    # bounded by log of the state count
    assert 0 <= df["entropy_rate"].iloc[0] <= math.log(len(df)) + 1e-9


def test_fd_plan_matches_quantiles(spark):
    q304 = (
        REGISTRY["q304_domain_quantiles"].spark(spark, SF_DIR).toPandas()
    )
    df = (
        REGISTRY["q310_fd_histogram_plan"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("event_type")
    )
    assert (df["iqr"] > 0).all()
    for _, r in df.iterrows():
        # FD width identity: width = 2 * IQR / cbrt(n) (4dp slack)
        want = 2.0 * r["iqr"] / (r["n"] ** (1.0 / 3.0))
        assert abs(r["fd_width"] - want) <= 1e-3
        assert r["n_bins"] >= 1
    assert set(df.index) == set(q304["event_type"])


def test_order_reconciliation_counts(spark):
    import pandas as pd

    df = REGISTRY["q311_order_reconciliation"].spark(spark, SF_DIR).toPandas()
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    assert int(df["n_orders"].sum()) == len(orders)
    # lineless counts match the true FK gap
    lineless = (~orders["o_orderkey"].isin(li["l_orderkey"])).sum()
    assert int(df["n_lineless"].sum()) == int(lineless)
    assert (df["n_mismatched"] <= df["n_orders"]).all()
    for _, r in df.iterrows():
        assert r["mismatch_rate"] == round(r["n_mismatched"] / r["n_orders"], 4)


def test_jackknife_cv_matches_python(spark):
    """Literal delete-one recompute in Python must reproduce the closed-
    form jackknife SE (same 1e8 freeze)."""
    import math

    import pandas as pd

    df = (
        REGISTRY["q312_jackknife_cv_se"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("event_type")
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["day"] = pd.to_datetime(ev["ts"]).dt.floor("D")
    ev["xi"] = (100.0 * ev["value"]).round().astype("int64")
    daily = (
        ev.groupby(["event_type", "day"])["xi"]
        .apply(lambda g: int(g.sum()) // len(g))
        .reset_index()
    )
    for et, g in daily.groupby("event_type"):
        xs = list(g["xi"])
        n = len(xs)
        cvis = []
        for i in range(n):
            rest = xs[:i] + xs[i + 1 :]
            m = sum(rest) / (n - 1)
            var = (sum(x * x for x in rest) - sum(rest) ** 2 / (n - 1)) / (n - 2)
            cvis.append(round(1e8 * math.sqrt(var) / m))
        mean_cvi = sum(cvis) / n
        se = math.sqrt(
            (n - 1) / n * sum((c - mean_cvi) ** 2 for c in cvis)
        ) / 1e8
        r = df.loc[et]
        assert int(r["n"]) == n
        assert abs(r["jackknife_se"] - se) <= 1e-3
        assert r["jackknife_se"] > 0


def test_chao1_bounds_and_identities(spark):
    df = REGISTRY["q313_chao1_richness"].spark(spark, SF_DIR).toPandas()
    assert (df["chao1"] >= df["vocab"]).all()  # estimate never below seen
    assert (df["f1"] + df["f2"] <= df["vocab"]).all()
    assert ((df["p_unseen_gt"] >= 0) & (df["p_unseen_gt"] <= 1)).all()
    for _, r in df.iterrows():
        if r["f2"] > 0:
            want = r["vocab"] + r["f1"] ** 2 / (2 * r["f2"])
        else:
            want = r["vocab"] + r["f1"] * (r["f1"] - 1) / 2
        assert abs(r["chao1"] - want) <= 1e-3
