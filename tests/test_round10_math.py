"""Round-10 independent recomputations: the final two verification
waivers retired (round-9 verdict #1). Both queries are rebuilt from raw
parquet with pure Python — hashlib/collections only, no Spark, no
DuckDB, no imports from the operators under test — and compared to the
registry output field by field.

- q195_lsh_quality: the full MinHash-LSH pipeline (word 3-gram shingles
  -> 32-bit md5-prefix shingle hash -> 12 linear permutations -> 4
  banded buckets -> bucket pairs -> exact-Jaccard verify) re-derived
  from its published constants (LCG a/c/m, prime P, band size), plus
  the exact all-pairs truth, plus the precision/recall algebra.
- q455_filter_agreement: Gopher-style heuristic flag, CCNet-style LM
  flag (global unigram LM, 4dp-frozen mean log-prob, interpolated P25
  threshold), the per-source agreement table and global Cohen's kappa.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import numpy as np
import pandas as pd
import pytest

from conftest import SF_DIR


def _rnd_half_up(v: float, dp: int = 4) -> float:
    """Spark/DuckDB ROUND (half away from zero) — python round() banks."""
    s = 10.0**dp
    x = v * s
    return (math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)) / s


def _run(spark, name) -> pd.DataFrame:
    from synth_transform_spark.plans import REGISTRY

    return REGISTRY[name].spark(spark, SF_DIR).toPandas()


def _docs() -> pd.DataFrame:
    return pd.read_parquet(SF_DIR + "/documents.parquet")


# ---------------------------------------------------------------------------
# q195 — LSH pair set vs exact truth, every stage re-derived.
# Constants restated from their definitions (operators/dedup.py docs),
# NOT imported, so a drifting implementation cannot drift this test.
# ---------------------------------------------------------------------------
_P = 4294967311  # smallest prime > 2^32
_LCG_A, _LCG_C, _LCG_M = 1103515245, 12345, 1 << 31
_N_PERMS, _BAND_SIZE, _MAX_BUCKET = 12, 3, 1000


def _perms() -> list[tuple[int, int]]:
    out, s = [], 42
    for _ in range(_N_PERMS):
        s = (_LCG_A * s + _LCG_C) % _LCG_M
        a = s | 1
        s = (_LCG_A * s + _LCG_C) % _LCG_M
        out.append((a, s))
    return out


def _shingle_set(text: str, n: int = 3) -> frozenset[str]:
    toks = [t for t in text.split(" ") if t]
    if len(toks) < n:
        return frozenset()
    return frozenset(" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1))


def _jacc4(sa: frozenset, sb: frozenset) -> float:
    ov = len(sa & sb)
    return _rnd_half_up(ov / (len(sa) + len(sb) - ov)) if ov else 0.0


def _jacc_ge_4_5(sa: frozenset, sb: frozenset) -> bool:
    # exact-rational accept at t = 4/5 (round 11, matches the engine and
    # oracle semantics): 5·|A∩B| >= 4·|A∪B|, never the rounded value
    ov = len(sa & sb)
    return 5 * ov >= 4 * (len(sa) + len(sb) - ov)


def test_q195_lsh_quality_pure_python(spark):
    got = _run(spark, "q195_lsh_quality").iloc[0]

    sh = {r.doc_id: _shingle_set(r.text) for r in _docs().itertuples()}
    ids = sorted(i for i, s in sh.items() if s)

    # exact truth: all pairs at exact-rational Jaccard >= 4/5
    truth = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if _jacc_ge_4_5(sh[a], sh[b])
    }

    # MinHash signatures: one 32-bit hash per shingle, 12 linear perms
    perms = _perms()
    sigs = {}
    for d in ids:
        xs = [
            int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)
            for s in sh[d]
        ]
        sigs[d] = tuple(min((a * x + b) % _P for x in xs) for a, b in perms)

    # banding: 4 buckets of 3 signature slots; max_bucket guard; pairs
    buckets: dict[tuple, list] = defaultdict(list)
    for d, sig in sigs.items():
        for band in range(_N_PERMS // _BAND_SIZE):
            key = (band, sig[band * _BAND_SIZE : (band + 1) * _BAND_SIZE])
            buckets[key].append(d)
    cands = set()
    for members in buckets.values():
        if len(members) > _MAX_BUCKET:
            continue
        members = sorted(members)
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                cands.add((a, b))
    lsh = {(a, b) for a, b in cands if _jacc_ge_4_5(sh[a], sh[b])}

    n_exact, n_lsh = len(truth), len(lsh)
    n_common = len(truth & lsh)
    assert n_exact > 0 and n_lsh > 0  # a degenerate fixture proves nothing
    assert got["n_exact"] == n_exact
    assert got["n_lsh"] == n_lsh
    assert got["n_common"] == n_common
    assert got["precision_"] == pytest.approx(
        _rnd_half_up(n_common / n_lsh), abs=1e-9
    )
    assert got["recall_"] == pytest.approx(
        _rnd_half_up(n_common / n_exact), abs=1e-9
    )


# ---------------------------------------------------------------------------
# q455 — heuristic-vs-LM filter agreement + global kappa.
# ---------------------------------------------------------------------------
def test_q455_filter_agreement_pure_python(spark):
    got = _run(spark, "q455_filter_agreement").set_index("source")

    docs = _docs()
    tok_lists = {
        r.doc_id: [t for t in r.text.split(" ") if t] for r in docs.itertuples()
    }
    unigram = Counter()
    for toks in tok_lists.values():
        unigram.update(toks)
    total = sum(unigram.values())

    rows = []
    for r in docs.itertuples():
        toks = tok_lists[r.doc_id]
        if not toks:
            continue
        n_tok = len(toks)
        n_chars = sum(len(t) for t in toks)
        mean_lp = math.fsum(math.log(unigram[t] / total) for t in toks) / n_tok
        lp4 = int(_rnd_half_up(10000.0 * _rnd_half_up(mean_lp), 0))
        rows.append((r.source, n_tok, n_chars, lp4))

    t4 = int(
        _rnd_half_up(
            100.0
            * float(
                np.percentile(
                    np.array([lp4 for *_x, lp4 in rows], dtype=float), 25.0
                )
            ),
            0,
        )
    )

    per = defaultdict(lambda: [0, 0, 0, 0, 0])  # n, kk, ka, kb, dd
    for source, n_tok, n_chars, lp4 in rows:
        a = int(50 <= n_tok <= 1000 and 30 * n_tok <= 10 * n_chars <= 100 * n_tok)
        b = int(100 * lp4 >= t4)
        s = per[source]
        s[0] += 1
        s[1] += a * b
        s[2] += a * (1 - b)
        s[3] += (1 - a) * b
        s[4] += (1 - a) * (1 - b)

    n = sum(s[0] for s in per.values())
    kk = sum(s[1] for s in per.values())
    ka = sum(s[2] for s in per.values())
    kb = sum(s[3] for s in per.values())
    dd = sum(s[4] for s in per.values())
    po = (kk + dd) / n
    pe = (kk + ka) / n * ((kk + kb) / n) + (kb + dd) / n * ((ka + dd) / n)
    kappa = _rnd_half_up((po - pe) / (1.0 - pe))

    assert set(got.index) == set(per)
    for source, (nd, skk, ska, skb, sdd) in per.items():
        row = got.loc[source]
        assert row["n_docs"] == nd
        assert row["both_keep"] == skk
        assert row["only_a"] == ska
        assert row["only_b"] == skb
        assert row["both_drop"] == sdd
        assert row["agree_rate"] == pytest.approx(
            _rnd_half_up((skk + sdd) / nd), abs=1e-9
        )
        assert row["kappa_global"] == pytest.approx(kappa, abs=1e-9)


# ---------------------------------------------------------------------------
# q503 — LSH band-planner S-curve, recomputed with python ints.
# ---------------------------------------------------------------------------
def test_q503_band_planner_pure_python(spark):
    got = _run(spark, "q503_lsh_band_planner").set_index("band_size")
    T = 20**12
    for r in (1, 2, 3, 4, 6, 12):
        b = 12 // r
        p_num = {k: T - (20**r - k**r) ** b for k in range(1, 20)}
        row = got.loc[r]
        assert row["n_bands"] == b
        assert row["p_at_080"] == pytest.approx(
            _rnd_half_up(p_num[16] / T), abs=1e-9
        )
        for col, cond in (
            ("s10", lambda v: 10 * v >= T),
            ("s50", lambda v: 2 * v >= T),
            ("s90", lambda v: 10 * v >= 9 * T),
        ):
            ks = [k for k in range(1, 20) if cond(p_num[k])]
            if ks:
                assert row[col] == pytest.approx(min(ks) / 20.0, abs=1e-12)
            else:
                assert pd.isna(row[col])
