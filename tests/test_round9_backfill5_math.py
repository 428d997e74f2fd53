"""Round-9 backfill, part 5 (final): the last retireable waivers —
summary stats, corpus-half KL drift, two-proportion A/B z, the full
BM25->NDCG/MRR IR eval pipeline, per-dim feature stats, the dataset
card, and per-label embedding norms. After this batch the waiver list
holds only rollups whose every input signal already has a recomputed
sibling.
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


def _docs():
    return pd.read_parquet(SF_DIR + "/documents.parquet")


# ---------------------------------------------------------------------------
def test_summary_stats_match_numpy(spark):
    df = _run(spark, "q44_summary_stats").set_index("col_name")
    li = pd.read_parquet(SF_DIR + "/lineitem.parquet")
    for col in ("l_quantity", "l_extendedprice", "l_discount"):
        v = li[col].to_numpy(float)
        row = df.loc[col]
        assert int(row["n"]) == len(v)
        assert row["mean"] == pytest.approx(v.mean(), abs=1e-3)
        assert row["std"] == pytest.approx(v.std(ddof=1), abs=1e-3)
        assert row["min_v"] == pytest.approx(v.min(), abs=1e-4)
        assert row["max_v"] == pytest.approx(v.max(), abs=1e-4)


# ---------------------------------------------------------------------------
def test_corpus_drift_matches_counters(spark):
    from collections import Counter

    df = _run(spark, "q156_corpus_drift")
    docs = _docs()
    ca, cb = Counter(), Counter()
    for r in docs.itertuples():
        (ca if r.doc_id % 2 == 0 else cb).update(
            t for t in r.text.split(" ") if t
        )
    vocab = set(ca) | set(cb)
    v = len(vocab)
    ta, tb = sum(ca.values()), sum(cb.values())
    terms = {}
    for tok in vocab:
        pa = (ca.get(tok, 0) + 1) / (ta + v)
        pb = (cb.get(tok, 0) + 1) / (tb + v)
        terms[tok] = round(pa * round(math.log(pa / pb), 6), 6)
    want = sorted(terms.items(), key=lambda kv: (-abs(kv[1]), kv[0]))[:10]
    assert len(df) == 10
    for (_, row), (tok, kl) in zip(df.iterrows(), want):
        assert row["tok"] == tok
        assert row["kl_term"] == pytest.approx(kl, abs=1e-6)


# ---------------------------------------------------------------------------
def test_ab_test_matches_welch_z(spark):
    row = _run(spark, "q175_ab_test").iloc[0]
    ev = pd.read_parquet(SF_DIR + "/events.parquet")
    p = ev[ev["event_type"] == "purchase"]
    a = p[p["user_id"] % 2 == 0]["value"].to_numpy(float)
    b = p[p["user_id"] % 2 == 1]["value"].to_numpy(float)
    z = (a.mean() - b.mean()) / math.sqrt(
        a.var() / len(a) + b.var() / len(b)  # population var (SQL identity)
    )
    assert int(row["na"]) == len(a) and int(row["nb"]) == len(b)
    assert row["mean_a"] == pytest.approx(a.mean(), abs=1e-3)
    assert row["mean_b"] == pytest.approx(b.mean(), abs=1e-3)
    assert row["z_stat"] == pytest.approx(z, abs=2e-3)


# ---------------------------------------------------------------------------
# q198: the full BM25-ranked / cosine-graded IR eval, recomputed from
# scratch (tokenise -> tf/df -> BM25 k1=1.2 b=0.75 for doc-0's query
# vocabulary -> frozen-score top-10 -> cosine relevance grades ->
# DCG/IDCG + MRR@0.05).
# ---------------------------------------------------------------------------
def test_ir_eval_matches_scratch_bm25(spark):
    from collections import Counter

    row = _run(spark, "q198_ir_eval").iloc[0]
    docs = _docs()
    toks = {
        r.doc_id: [t for t in r.text.split(" ") if t]
        for r in docs.itertuples()
    }
    dl = {d: len(w) for d, w in toks.items()}
    n_docs = len(toks)
    avgdl = sum(dl.values()) / n_docs
    dfreq = Counter()
    for w in toks.values():
        dfreq.update(set(w))
    qset = set(toks[0])
    k1, b = 1.2, 0.75
    scores = {}
    for d, w in toks.items():
        if d == 0:
            continue
        tf = Counter(w)
        s = 0.0
        hit = False
        for tok in qset:
            if tf.get(tok, 0) == 0:
                continue
            hit = True
            idf = math.log(
                (n_docs - dfreq[tok] + 0.5) / (dfreq[tok] + 0.5) + 1.0
            )
            s += (
                idf
                * tf[tok]
                * (k1 + 1.0)
                / (tf[tok] + k1 * (1.0 - b + b * dl[d] / avgdl))
            )
        if hit:
            scores[d] = s
    top = sorted(scores.items(), key=lambda kv: (-round(kv[1], 4), kv[0]))[:10]

    em = pd.read_parquet(SF_DIR + "/embeddings.parquet")
    mat = np.stack(em["embedding"].to_numpy()).astype(float)
    ids = em["vec_id"].to_numpy()
    q = mat[list(ids).index(0)]
    norms = np.linalg.norm(mat, axis=1)
    rel = {}
    for i, vid in enumerate(ids):
        if vid == 0:
            continue
        rel[int(vid)] = max(
            round(float(mat[i] @ q) / (norms[i] * np.linalg.norm(q)), 4), 0.0
        )
    graded = [(rk, rel.get(d, 0.0)) for rk, (d, _) in enumerate(top, 1)]
    dcg = sum(r / math.log2(rk + 1) for rk, r in graded)
    ideal = sorted(rel.values(), reverse=True)[:10]
    idcg = sum(r / math.log2(i + 2) for i, r in enumerate(ideal))
    mrr_ranks = [rk for rk, r in graded if r >= 0.05]
    mrr = round(1.0 / min(mrr_ranks), 4) if mrr_ranks else 0.0
    assert row["ndcg_10"] == pytest.approx(dcg / idcg, abs=2e-3)
    assert row["mrr"] == pytest.approx(mrr, abs=1e-4)


# ---------------------------------------------------------------------------
def test_feature_stats_match_numpy(spark):
    df = _run(spark, "q199_feature_stats").set_index("dim")
    em = pd.read_parquet(SF_DIR + "/embeddings.parquet")
    mat = np.stack(em["embedding"].to_numpy()).astype(float)
    for d in range(mat.shape[1]):
        col = mat[:, d]
        row = df.loc[d]
        assert row["mean_"] == pytest.approx(col.mean(), abs=1e-3)
        assert row["std_"] == pytest.approx(col.std(), abs=1e-3)  # population
        assert row["min_"] == pytest.approx(col.min(), abs=1e-4)
        assert row["max_"] == pytest.approx(col.max(), abs=1e-4)


# ---------------------------------------------------------------------------
def test_dataset_card_matches_pandas(spark):
    df = _run(spark, "q228_dataset_card").set_index(
        ["table_name", "column_name"]
    )
    frames = {
        "documents": _docs(),
        "events": pd.read_parquet(SF_DIR + "/events.parquet"),
    }
    for (tab, col), row in df.iterrows():
        if tab not in frames:
            continue
        f = frames[tab]
        if col not in f.columns:
            continue
        assert int(row["n_rows"]) == len(f), (tab, col)
        assert int(row["n_nulls"]) == int(f[col].isna().sum())
        assert int(row["n_distinct"]) == int(f[col].nunique())


# ---------------------------------------------------------------------------
def test_embedding_norms_match_numpy(spark):
    df = _run(spark, "q405_embedding_norms").set_index("label")
    em = pd.read_parquet(SF_DIR + "/embeddings.parquet")
    mat = np.round(1e6 * np.stack(em["embedding"].to_numpy()).astype(float))
    labels = em["label"].to_numpy()
    for lab in np.unique(labels):
        sub = mat[labels == lab]
        cent = np.array([_rnd(c) for c in sub.mean(axis=0)], dtype=float)
        norm_micro = np.array([_rnd(v) for v in np.linalg.norm(sub, axis=1)])
        cos_micro = np.array(
            [
                _rnd(
                    1e6
                    * float(v @ cent)
                    / (np.linalg.norm(v) * np.linalg.norm(cent))
                )
                for v in sub
            ]
        )
        row = df.loc[lab]
        assert int(row["n_vecs"]) == len(sub)
        assert row["mean_norm"] == pytest.approx(
            norm_micro.mean() / 1e6, abs=2e-4
        )
        assert row["min_norm"] == pytest.approx(
            norm_micro.min() / 1e6, abs=2e-4
        )
        assert row["max_norm"] == pytest.approx(
            norm_micro.max() / 1e6, abs=2e-4
        )
        assert row["mean_centroid_cos"] == pytest.approx(
            cos_micro.mean() / 1e6, abs=2e-4
        )
