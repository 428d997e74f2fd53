"""Round-9 independent math / edge-semantics tests.

Pins the round-8 advice fixes (q467 empty-doc guard, q471/q484 wide
triangular arithmetic) and the documented ROUGE-L cap truncation, each
recomputed with an independent implementation (pure Python two-row LCS
DP, direct python zlib / integer arithmetic) rather than the shared
oracle formula.
"""

from __future__ import annotations

import pytest


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
