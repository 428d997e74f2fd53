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
