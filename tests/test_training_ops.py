"""Round-4 training-data operators: properties the oracle hash-match can't
state — bloom soundness/pruning, CMS overcount bound + mergeability,
MERGE edge cases, SCD2 run compression, contamination/repetition/PII
behaviour on constructed inputs."""

from __future__ import annotations

import pyspark.sql.functions as F

from synth_transform_spark.operators import bloom, delta, sketches, temporal
from synth_transform_spark.operators.dedup import contamination
from synth_transform_spark.operators.text_analysis import redact_pii, repetition_signals


# --- bloom -----------------------------------------------------------------


def test_bloom_never_drops_true_matches_and_prunes_some(spark):
    probe = spark.range(2000).select((F.col("id") % 500).alias("k"), F.col("id").alias("v"))
    build = spark.range(100).select((F.col("id") * 3).alias("bk"))  # keys 0,3,...,297
    words = bloom.bloom_build(build, "bk")
    pruned = bloom.bloom_prune(probe, words, "k")
    exact = probe.join(build.select(F.col("bk").alias("k")).distinct(), "k", "left_semi")
    n_probe, n_pruned, n_exact = probe.count(), pruned.count(), exact.count()
    assert n_exact <= n_pruned < n_probe  # sound AND actually pruning
    # every exact match survives the bloom stage (no false negatives)
    assert exact.join(pruned, ["k", "v"], "left_anti").count() == 0


def test_bloom_semi_join_equals_plain_semi_join(spark):
    probe = spark.range(1000).select((F.col("id") % 300).alias("k"))
    build = spark.range(50).select((F.col("id") * 7).alias("bk"))
    got = bloom.bloom_semi_join(probe, build, "k", "bk")
    want = probe.join(build.select(F.col("bk").alias("k")).distinct(), "k", "left_semi")
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_bloom_keeps_duplicate_probe_rows(spark):
    probe = spark.createDataFrame([(1,), (1,), (2,)], ["k"])
    build = spark.createDataFrame([(1,)], ["bk"])
    got = bloom.bloom_semi_join(probe, build, "k", "bk")
    assert got.count() == 2  # multiplicity preserved, not distinct'd


# --- count-min --------------------------------------------------------------


def test_cms_estimate_is_an_upper_bound(spark):
    df = spark.range(3000).select((F.col("id") % 97).cast("string").alias("v"))
    exact = df.groupBy("v").agg(F.count(F.lit(1)).alias("n"))
    cells = sketches.cms_cells(df, "v")
    est = sketches.cms_estimates(exact.select("v"), cells, "v")
    bad = exact.join(est, "v").filter(F.col("cms_est") < F.col("n")).count()
    assert bad == 0  # min over d rows never undercounts


def test_cms_cells_merge_by_sum(spark):
    left = spark.range(0, 1000).select((F.col("id") % 50).cast("string").alias("v"))
    right = spark.range(0, 800).select((F.col("id") % 31).cast("string").alias("v"))
    whole = sketches.cms_cells(left.union(right), "v")
    merged = (
        sketches.cms_cells(left, "v")
        .union(sketches.cms_cells(right, "v"))
        .groupBy("r", "bucket")
        .agg(F.sum("cell").cast("long").alias("cell"))
    )
    assert whole.exceptAll(merged).count() == 0
    assert merged.exceptAll(whole).count() == 0


# --- merge / SCD2 -----------------------------------------------------------


def test_merge_upsert_semantics(spark):
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "val"]
    )
    updates = spark.createDataFrame(
        [(2, "B", "upsert"), (3, None, "delete"), (4, "d", "upsert"),
         (9, None, "delete")],  # delete of an absent key is a no-op
        ["k", "val", "op"],
    )
    got = {
        (r.k, r.val)
        for r in delta.merge_upsert(base, updates, ["k"], ["val"]).collect()
    }
    assert got == {(1, "a"), (2, "B"), (4, "d")}


def test_scd2_compresses_runs_and_chains_intervals(spark):
    rows = [
        (1, 10, 100, "A"), (1, 20, 101, "A"), (1, 30, 102, "B"),
        (1, 40, 103, "A"),
        (2, 10, 200, "X"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "state"])
    hist = temporal.scd2_history(
        df, key="user_id", ts_col="ts", state_cols=("state",), tiebreak="event_id"
    )
    got = {
        (r.user_id, r.state, r.valid_from, r.valid_to, r.version)
        for r in hist.collect()
    }
    assert got == {
        (1, "A", 10, 30, 1),   # the 10/20 run compressed into one row
        (1, "B", 30, 40, 2),
        (1, "A", 40, None, 3),  # A reopens as a NEW version after B
        (2, "X", 10, None, 1),
    }


# --- text curation ----------------------------------------------------------


def test_contamination_flags_overlap_only(spark):
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "zz yy xx ww vv")],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([(100, "beta gamma delta epsilon")], ["doc_id", "text"])
    got = {(r.doc_id, r.n_contam) for r in contamination(corpus, bench).collect()}
    # doc 1 shares exactly the 'beta gamma delta' 3-gram; doc 2 shares none
    assert got == {(1, 1)}


def test_repetition_flags_loops_not_diverse_text(spark):
    rep = " ".join(["spam ham"] * 20)          # one 2-gram dominates
    div = " ".join(f"w{i}" for i in range(40))  # all grams unique
    df = spark.createDataFrame([(1, rep), (2, div)], ["doc_id", "text"])
    got = {r.doc_id: r.repetitive for r in repetition_signals(df).collect()}
    assert got == {1: True, 2: False}


def test_redact_pii_spans_and_counts(spark):
    df = spark.createDataFrame(
        [(1, "mail bob.smith@corp.io from 192.168.0.1 call 555-0199"),
         (2, "no pii here")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in redact_pii(df).collect()}
    assert out[1].redacted == "mail <EMAIL> from <IP> call <PHONE>"
    assert (out[1].n_email, out[1].n_ip, out[1].n_phone) == (1, 1, 1)
    assert out[2].redacted == "no pii here"
    assert (out[2].n_email, out[2].n_ip, out[2].n_phone) == (0, 0, 0)


# --- round-4 review regressions ---------------------------------------------


def test_shingles_empty_and_short_docs_yield_empty_not_crash(spark):
    # sequence(0, -1) generates DESCENDING [0, -1] — unguarded, element_at
    # (toks, 0) threw INVALID_INDEX_OF_ZERO on any doc with < n tokens.
    from synth_transform_spark.operators.dedup import shingle_arrays

    df = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "one two"), (4, "a b c d")], ["doc_id", "text"]
    )
    got = {r.doc_id: list(r.sh_arr) for r in shingle_arrays(df, n=3).collect()}
    assert got[1] == [] and got[2] == [] and got[3] == []
    assert got[4] == ["a b c", "b c d"]


def test_cms_unseen_item_estimates_zero(spark):
    # Unseen items must return 0 (min over cells INCLUDING empty ones),
    # and must not vanish from the output via the inner join.
    df = spark.createDataFrame([("a",), ("a",), ("b",)], ["v"])
    cells = sketches.cms_cells(df, "v")
    items = spark.createDataFrame([("a",), ("zzz_unseen",)], ["v"])
    got = {r.v: r.cms_est for r in sketches.cms_estimates(items, cells, "v").collect()}
    assert got["a"] >= 2
    assert got["zzz_unseen"] == 0


def test_repetition_signals_keeps_two_token_docs(spark):
    # A 2-token doc has 2-grams but no 3-grams: it must appear with NULL
    # 3-gram features, not silently vanish from the signal relation.
    df = spark.createDataFrame(
        [(1, "spam spam"), (2, "a b c d e f")], ["doc_id", "text"]
    )
    got = {r.doc_id: r for r in repetition_signals(df).collect()}
    assert set(got) == {1, 2}
    assert got[1].top3_frac is None and got[1].dup3_frac is None
    assert got[1].top2_frac == 1.0  # the single 2-gram is 100% of 2-grams


def test_q244_unimax_allocation_invariants(spark):
    """Waterfilling contract: no language exceeds its epoch cap, the
    budget is exhausted up to flooring slack (or all caps saturate), and
    unsaturated languages share one common water level."""
    from synth_transform_spark.plans.training_queries import (
        _UNIMAX_EPOCHS,
        _UNIMAX_FRAC,
        q244_unimax_budget,
    )

    rows = q244_unimax_budget(spark, "/root/testdata/sf0.001").collect()
    total_tokens = sum(r["n_tokens"] for r in rows)
    budget = int(_UNIMAX_FRAC * total_tokens)
    for r in rows:
        assert r["alloc_tokens"] <= r["cap_tokens"]
        assert r["epochs"] <= _UNIMAX_EPOCHS + 1e-9
    alloc_sum = sum(r["alloc_tokens"] for r in rows)
    if all(r["alloc_tokens"] == r["cap_tokens"] for r in rows):
        assert alloc_sum <= budget
    else:
        # flooring each lang loses < 1 token per lang
        assert budget - len(rows) < alloc_sum <= budget
        levels = {r["alloc_tokens"] for r in rows
                  if r["alloc_tokens"] < r["cap_tokens"]}
        assert len(levels) == 1
