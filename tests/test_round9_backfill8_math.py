"""Round-9 backfill, part 8: Gopher rule rates, lang-ID margins, and the
int8 quantization audit recomputed with Counters/numpy — three more
waivers retired. The final three waivers (q195 LSH P/R, q429 chunk
overlap, q455 filter agreement) wrap multi-stage pipelines whose
kernels are covered at operator level.
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
def test_gopher_rules_match_counters(spark):
    from collections import Counter

    df = _run(spark, "q401_gopher_rules").set_index("source")
    stops = {"the", "a", "and", "of", "to", "in"}
    agg = {}
    for r in _docs().itertuples():
        toks = [t for t in r.text.lower().split(" ") if t]
        if not toks:
            continue
        c = Counter(toks)
        n = sum(c.values())
        chars = sum(v * len(k) for k, v in c.items())
        rules = (
            int(20 <= n <= 1000),
            int(4 * n <= chars <= 10 * n),
            int(sum(c.get(s, 0) for s in stops) >= 2),
            int(10 * max(c.values()) <= n),
            int(5 * len(c) >= 2 * n),
        )
        s = agg.setdefault(r.source, [0, 0, 0, 0, 0, 0, 0])
        s[0] += 1
        for i, v in enumerate(rules, 1):
            s[i] += v
        s[6] += int(all(rules))
    cols = (
        "word_count_rate",
        "word_len_rate",
        "stopword_rate",
        "dominance_rate",
        "distinct_rate",
        "all_rules_rate",
    )
    for src, s in agg.items():
        row = df.loc[src]
        assert int(row["n_docs"]) == s[0]
        for i, col in enumerate(cols, 1):
            assert row[col] == pytest.approx(s[i] / s[0], abs=2e-4), (src, col)


# ---------------------------------------------------------------------------
def test_langid_margin_matches_counters(spark):
    df = _run(spark, "q402_langid_margin").set_index("source")
    vocab = {
        "de": {"der", "die", "und", "von", "table"},
        "en": {"the", "a", "and", "of", "fast"},
        "es": {"el", "la", "de", "que", "data"},
        "fr": {"le", "la", "et", "de", "join"},
        "zh": {"de", "le", "shi", "zai", "merge"},
    }
    order = ["de", "en", "es", "fr", "zh"]
    agg = {}
    for r in _docs().itertuples():
        toks = [t for t in r.text.lower().split(" ") if t]
        scores = [sum(1 for t in toks if t in vocab[l]) for l in order]
        best = max(scores)
        pred = order[scores.index(best)]  # first language hitting the max
        srt = sorted(scores)
        margin = best - srt[-2]
        s = agg.setdefault(r.source, [0, 0, 0, 0])
        s[0] += 1
        s[1] += int(pred == r.lang)
        s[2] += margin
        s[3] += int(margin == 0)
    for src, (n, hit, marg, amb) in agg.items():
        row = df.loc[src]
        assert int(row["n_docs"]) == n
        assert row["accuracy"] == pytest.approx(hit / n, abs=2e-4)
        assert row["mean_margin"] == pytest.approx(marg / n, abs=2e-4)
        assert row["ambiguous_share"] == pytest.approx(amb / n, abs=2e-4)


# ---------------------------------------------------------------------------
def test_int8_quant_audit_matches_numpy(spark):
    df = _run(spark, "q427_int8_quant_audit").set_index("label")
    em = pd.read_parquet(SF_DIR + "/embeddings.parquet")
    mat = np.round(1e6 * np.stack(em["embedding"].to_numpy()).astype(float))
    labels = em["label"].to_numpy()
    agg = {}
    for row_v, lab in zip(mat, labels):
        mx = float(np.max(np.abs(row_v)))
        q = np.array([_rnd(127.0 * x / mx) for x in row_v], dtype=float)
        cos = _rnd(
            1e6
            * float(row_v @ q)
            / (np.linalg.norm(row_v) * np.linalg.norm(q))
        )
        deq = q * mx / 127.0
        mse = _rnd(float(np.sum((row_v - deq) ** 2)) / len(row_v))
        s = agg.setdefault(lab, [0, 0, 10**9, 0])
        s[0] += 1
        s[1] += cos
        s[2] = min(s[2], cos)
        s[3] += mse
    for lab, (n, cs, cmin, ms) in agg.items():
        row = df.loc[lab]
        assert int(row["n_vecs"]) == n
        assert row["mean_quant_cos"] == pytest.approx(cs / n / 1e6, abs=2e-4)
        assert row["min_quant_cos"] == pytest.approx(cmin / 1e6, abs=2e-4)
        assert row["mean_mse"] == pytest.approx(ms / n / 1e12, abs=2e-3)


# ---------------------------------------------------------------------------
def test_chunk_overlap_audit_matches_closed_form(spark):
    df = _run(spark, "q429_chunk_overlap_audit").set_index(
        ["source", "chunk_size"]
    )
    docs = _docs()
    docs["tok"] = [
        len([t for t in text.split(" ") if t]) for text in docs["text"]
    ]
    for (size, stride) in ((128, 96), (256, 192), (512, 384)):
        for src, g in docs.groupby("source"):
            chunks = emitted = 0
            for tok in g["tok"]:
                if tok == 0:
                    continue
                if tok > size:
                    extra = -(-(tok - size) // stride)  # ceil division
                    chunks += extra + 1
                    emitted += tok + extra * (size - stride)
                else:
                    chunks += 1
                    emitted += tok
            row = df.loc[(src, size)]
            assert int(row["n_chunks"]) == chunks, (src, size)
            assert int(row["tokens_in"]) == int(g["tok"].sum())
            assert int(row["tokens_emitted"]) == emitted
            assert row["blowup"] == pytest.approx(
                emitted / g["tok"].sum(), abs=2e-4
            )
