"""Property-based tests (hypothesis) for the round-4 kernels whose
correctness rests on structural arguments: the interval-overlap
first-shared-bucket emit rule, KMV sketch merge algebra, and the
pointer-doubling ancestor closure. Few examples, small inputs — each
example runs real Spark jobs."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

import pyspark.sql.functions as F

FEW = settings(max_examples=5, deadline=None)


intervals = st.lists(
    st.tuples(st.integers(0, 500), st.integers(0, 300)).map(
        lambda t: (t[0], t[0] + t[1])
    ),
    min_size=1,
    max_size=12,
)


@FEW
@given(left=intervals, right=intervals)
def test_interval_overlap_matches_brute_force(spark, left, right):
    """Bucketed overlap join ≡ O(n·m) brute force, for any interval sets
    — including spans crossing many buckets and zero-length intervals."""
    from synth_transform_spark.operators.temporal import interval_overlap_join

    ldf = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(left)], "lid long, l_start long, l_end long"
    )
    rdf = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(right)], "rid long, r_start long, r_end long"
    )
    got = {
        (r.lid, r.rid)
        for r in interval_overlap_join(ldf, rdf, bucket_sec=64).select("lid", "rid").collect()
    }
    want = {
        (i, j)
        for i, (a, b) in enumerate(left)
        for j, (c, d) in enumerate(right)
        if a <= d and c <= b
    }
    assert got == want


@FEW
@given(
    xs=st.lists(st.integers(0, 10_000), min_size=1, max_size=60),
    ys=st.lists(st.integers(0, 10_000), min_size=1, max_size=60),
)
def test_kmv_merge_equals_union_sketch(spark, xs, ys):
    """Register-merge property: the union estimate from merged k-minima
    equals the sketch built directly on the concatenated stream, and
    below k distinct values the estimate is EXACT."""
    from synth_transform_spark.operators.sketches import (
        kmv_estimate_from_minima,
        kmv_minima,
        kmv_set_estimates,
    )

    k = 16
    rows = [("a", str(x)) for x in xs] + [("b", str(y)) for y in ys]
    df = spark.createDataFrame(rows, "g string, v string")
    pairs = kmv_set_estimates(df, "g", "v", k=k).collect()
    both = df.select(F.lit("u").alias("g"), "v")
    direct = kmv_estimate_from_minima(
        kmv_minima(both, ["g"], "v", k=k), ["g"], k=k
    ).collect()[0]["kmv_distinct"]
    if pairs:  # only when both groups exist
        assert pairs[0]["est_union"] == direct
    n_distinct = len(set(xs) | set(ys))
    if n_distinct < k and pairs:
        assert pairs[0]["est_union"] == float(n_distinct)


@FEW
@given(
    parents=st.lists(st.integers(0, 40), min_size=2, max_size=40),
)
def test_ancestor_closure_matches_walk(spark, parents):
    """Doubling closure ≡ the per-node parent walk, for any forest where
    parent(i) < i (generated: node i+1's parent is parents[i] % (i+1))."""
    from synth_transform_spark.operators.graph import ancestor_closure

    edges = [(i + 1, parents[i] % (i + 1)) for i in range(len(parents))]
    df = spark.createDataFrame(edges, "node long, parent long")
    got = {
        (r.node, r.anc)
        for r in ancestor_closure(df, n_rounds=6).collect()
    }
    pmap = dict(edges)
    want = set()
    for n in pmap:
        cur = n
        while cur in pmap:
            cur = pmap[cur]
            want.add((n, cur))
    assert got == want


# ---------------------------------------------------------------------------
# Round-5 kernels: structural properties that unit examples can't pin.
# ---------------------------------------------------------------------------

docs_texts = st.lists(
    st.lists(
        st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]),
        min_size=1,
        max_size=30,
    ).map(" ".join),
    min_size=1,
    max_size=8,
)


@FEW
@given(texts=docs_texts)
def test_cdc_chunks_reassemble_exactly(spark, texts):
    """Content-defined chunks, concatenated in chunk order, must reproduce
    every document's token stream exactly — no token lost or duplicated by
    the boundary rule, for any corpus."""
    from synth_transform_spark.plans.corpus_dedup_queries import CDC_DIVISOR

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    from pyspark.sql import Window

    toks = df.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("i", "tok")
    ).filter(F.col("tok") != "")
    is_b = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
        % CDC_DIVISOR
        == 0
    ).cast("long")
    w = Window.partitionBy("doc_id").orderBy("i")
    chunked = toks.withColumn("is_b", is_b).withColumn(
        "chunk_idx", F.sum("is_b").over(w) - F.col("is_b")
    )
    back = (
        chunked.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("chunk_idx"), F.col("i"), F.col("tok")))
                    ),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("rejoined")
        )
        .collect()
    )
    expect = {i: " ".join(t.split()) for i, t in enumerate(texts)}
    for r in back:
        assert r.rejoined == expect[r.doc_id]


@FEW
@given(
    values=st.lists(st.floats(-100, 100, allow_nan=False), min_size=40, max_size=120)
)
def test_conformal_threshold_is_order_statistic(spark, values):
    """The split-conformal threshold must equal the ⌈(n+1)·0.9⌉-th smallest
    calibration score computed by brute force — the exact finite-sample
    guarantee hinges on that rank arithmetic."""
    import math

    n = len(values)
    mu_int = math.floor(sum(round(v * 10000) for v in values) / n)
    scores = sorted(abs(round(v * 10000) - mu_int) for v in values)
    k = min((9 * (n + 1) + 9) // 10, n)
    expected_thr = scores[k - 1]
    df = spark.createDataFrame(
        [(i * 2, "t", float(v)) for i, v in enumerate(values)],
        "event_id long, event_type string, value double",
    )
    from pyspark.sql import Window

    vint = df.select(
        "event_id", "event_type",
        F.round(F.col("value") * F.lit(10000.0)).cast("long").alias("v"),
    )
    centre = vint.groupBy("event_type").agg(
        F.floor(F.sum("v").cast("double") / F.count(F.lit(1))).cast("long").alias("mu"),
        F.count(F.lit(1)).alias("n_cal"),
    )
    scored = vint.join(F.broadcast(centre), "event_type").select(
        "event_type", "n_cal", F.abs(F.col("v") - F.col("mu")).alias("score"), "event_id"
    )
    rk = F.row_number().over(
        Window.partitionBy("event_type").orderBy(F.asc("score"), F.asc("event_id"))
    )
    got = (
        scored.withColumn("rk", rk)
        .filter(
            F.col("rk")
            == F.least(
                (9 * (F.col("n_cal") + 1) + 9).cast("long") / 10, F.col("n_cal")
            ).cast("long")
        )
        .select("score")
        .first()
    )
    assert got.score == expected_thr


@FEW
@given(
    pts=st.lists(
        st.lists(st.integers(-50, 50), min_size=4, max_size=4),
        min_size=3,
        max_size=20,
        unique_by=lambda p: tuple(p),
    )
)
def test_kcenter_greedy_2_approximation(spark, pts):
    """Gonzalez's guarantee: after selecting k centres, every point's
    distance to the selection is at most the distance of the NEXT point
    the greedy would pick — i.e. max-min-dist is non-increasing in rank
    (the structural fact behind the 2-approximation)."""
    from synth_transform_spark.operators.similarity import kcenter_coreset

    k = min(6, len(pts))
    df = spark.createDataFrame(
        [(i, [float(x) for x in p]) for i, p in enumerate(pts)],
        "vec_id long, embedding array<float>",
    )
    out = kcenter_coreset(df, k=k).toPandas().sort_values("sel_rank")
    dists = out.dist_to_set.tolist()[1:]  # rank-1 seed has dist 0 by definition
    assert all(a >= b for a, b in zip(dists, dists[1:])), dists
    assert len(set(out.vec_id)) == len(out)  # never re-selects


@FEW
@given(
    words=st.lists(
        st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"]),
        min_size=5,
        max_size=120,
    )
)
def test_countmin_never_underestimates(spark, tmp_path_factory, words):
    """Count-Min's defining guarantee: for ANY corpus, the estimate of
    every audited token is >= its true count (equality iff no bucket
    collision on some row) — checked through q439's full plan on a
    synthetic documents table."""
    import pandas as pd

    from synth_transform_spark.plans import REGISTRY

    d = tmp_path_factory.mktemp("cm")
    docs = [" ".join(words[i : i + 10]) for i in range(0, len(words), 10)]
    pd.DataFrame(
        {
            "doc_id": range(len(docs)),
            "text": docs,
            "lang": "en",
            "source": "synth",
            "n_chars": [len(t) for t in docs],
        }
    ).to_parquet(d / "documents.parquet", index=False)
    rows = REGISTRY["q439_countmin_audit"].spark(spark, str(d)).collect()
    assert rows, "audit must return the heavy hitters"
    from collections import Counter

    truth = Counter(words)
    for r in rows:
        assert r["cm_estimate"] >= r["true_count"] == truth[r["token"]]
        assert r["overestimate"] == r["cm_estimate"] - r["true_count"]


# ---------------------------------------------------------------------------
# q470's Jaro-Winkler Catalyst expression ≡ a pure-Python reference
# implementation (textbook greedy matching, floor-halved transpositions,
# 0.7 boost threshold — the semantics pinned to DuckDB's builtin), on
# ARBITRARY ASCII strings including empty-ish, repeated-char, and
# pathological-window cases hypothesis likes to find. One Spark job per
# batch of examples (the strings are collected into a single DataFrame).
# ---------------------------------------------------------------------------
def _jw_reference(a: str, b: str) -> float:
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    w = max(max(la, lb) // 2 - 1, 0)
    used = [False] * lb
    mc = []
    for i in range(la):
        for j in range(max(0, i - w), min(lb, i + w + 1)):
            if not used[j] and a[i] == b[j]:
                used[j] = True
                mc.append(a[i])
                break
    m = len(mc)
    if m == 0:
        return 0.0
    s2m = [b[j] for j in range(lb) if used[j]]
    t = sum(1 for p, q in zip(mc, s2m) if p != q) // 2
    jaro = (m / la + m / lb + (m - t) / m) / 3.0
    pfx = 0
    for k in range(min(4, la, lb)):
        if a[k] == b[k]:
            pfx += 1
        else:
            break
    return jaro + 0.1 * pfx * (1 - jaro) if jaro > 0.7 else jaro


_jw_strings = st.lists(
    st.tuples(
        st.text(alphabet="abcxyz #", min_size=1, max_size=20),
        st.text(alphabet="abcxyz #", min_size=1, max_size=20),
    ),
    min_size=1,
    max_size=25,
)


@FEW
@given(pairs=_jw_strings)
def test_jaro_winkler_expr_matches_reference(spark, pairs):
    from synth_transform_spark.functions.fuzzy import jaro_winkler_expr

    df = spark.createDataFrame(pairs, "a string, b string")
    got = df.select(
        "a", "b", F.expr(jaro_winkler_expr("a", "b")).alias("jw")
    ).collect()
    for r in got:
        want = _jw_reference(r["a"], r["b"])
        assert abs(r["jw"] - want) < 1e-12, (r["a"], r["b"], r["jw"], want)
