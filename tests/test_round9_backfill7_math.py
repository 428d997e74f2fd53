"""Round-9 backfill, part 7: the deterministic HLL estimate (pure-python
register construction from md5) and the source scorecard (ASCII regex +
Counter recompute) — two more waivers retired; the six that remain wrap
multi-stage pipelines (LSH P/R, Gopher rules, lang-ID margins, int8
audit, chunk overlap, filter agreement) whose kernels carry their own
recomputation tests.
"""

from __future__ import annotations

import hashlib
import math
import re

import pandas as pd
import pytest

from conftest import SF_DIR


def _run(spark, name):
    from synth_transform_spark.plans import REGISTRY

    return REGISTRY[name].spark(spark, SF_DIR).toPandas()


# ---------------------------------------------------------------------------
# q71: 256-register deterministic HLL from md5 prefixes, rebuilt in
# pure python (registers, bias constant alpha*m^2 = 47072.7126...,
# linear-counting small-range correction).
# ---------------------------------------------------------------------------
def test_hll_distinct_matches_python_registers(spark):
    df = _run(spark, "q71_hll_distinct").set_index("o_orderpriority")
    od = pd.read_parquet(SF_DIR + "/orders.parquet")
    for pr, g in od.groupby("o_orderpriority"):
        regs = {}
        for ck in g["o_custkey"]:
            hv = int(hashlib.md5(str(ck).encode()).hexdigest()[:8], 16)
            bucket, w = hv // 16777216, hv % 16777216
            r = 25 if w == 0 else 25 - w.bit_length()
            regs[bucket] = max(regs.get(bucket, -10), r)
        sum_obs = sum(2.0**-r for r in regs.values())
        n_obs = len(regs)
        raw = 47072.71267120224 / (sum_obs + (256 - n_obs))
        if raw <= 640.0 and (256 - n_obs) > 0:
            hll = 256.0 * math.log(256.0 / (256 - n_obs))
        else:
            hll = raw
        row = df.loc[pr]
        assert int(row["exact_distinct"]) == g["o_custkey"].nunique()
        assert row["hll_distinct"] == pytest.approx(hll, abs=2e-3)
        # the estimate must actually be accurate (m=256 -> ~6.5% rse)
        assert abs(hll - g["o_custkey"].nunique()) <= max(
            0.25 * g["o_custkey"].nunique(), 10
        )


# ---------------------------------------------------------------------------
# q157: per-source curation scorecard — keep-rule flags and exact-dup
# shares recomputed with Counters and an ASCII regex (RE2's \w class).
# ---------------------------------------------------------------------------
def test_source_scorecard_matches_counters(spark):
    from collections import Counter

    df = _run(spark, "q157_source_scorecard").set_index("source")
    docs = pd.read_parquet(SF_DIR + "/documents.parquet")
    text_counts = Counter(docs["text"])
    agg = {}
    for r in docs.itertuples():
        toks = [t for t in r.text.lower().split(" ") if t]
        n_chars = len(r.text)
        punct = n_chars - len(re.sub(r"[^\w\s]", "", r.text, flags=re.ASCII))
        keep = int(
            len(toks) >= 10
            and round(len(set(toks)) / len(toks), 4) >= 0.1
            and round(punct / n_chars, 4) <= 0.3
        ) if toks and n_chars else 0
        is_dup = int(text_counts[r.text] > 1)
        s = agg.setdefault(r.source, [0, 0, 0, 0, 0])
        s[0] += 1
        s[1] += n_chars
        s[2] += len(toks)
        s[3] += keep
        s[4] += is_dup
    for src, (n, ch, tk, keep, dup) in agg.items():
        row = df.loc[src]
        assert int(row["n_docs"]) == n
        assert row["avg_chars"] == pytest.approx(ch / n, abs=1e-3)
        assert row["avg_tokens"] == pytest.approx(tk / n, abs=1e-3)
        assert row["keep_rate"] == pytest.approx(keep / n, abs=2e-4)
        assert row["dup_rate"] == pytest.approx(dup / n, abs=2e-4)
