"""q115/q116 semantics on constructed corpora: first-occurrence keeps,
in-order reassembly, positional (non-distinct) n-gram counting — the
properties the oracle hash-match asserts but does not explain."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from synth_transform_spark.plans.corpus_dedup_queries import (
    NGRAM_N,
    SEG_TOKENS,
    q115_segment_dedup,
    q116_repeated_ngrams,
)


def _docs_dir(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text"]).withColumn(
        "lang", F.lit("en")
    ).withColumn("source", F.lit("t")).withColumn(
        "n_chars", F.length("text").cast("long")
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_q115_first_occurrence_wins_and_reassembles(spark, tmp_path):
    seg_a = " ".join(f"a{i}" for i in range(SEG_TOKENS))
    seg_b = " ".join(f"b{i}" for i in range(SEG_TOKENS))
    seg_c = " ".join(f"c{i}" for i in range(SEG_TOKENS))
    rows = [
        (0, f"{seg_a} {seg_b}"),          # both novel: fully kept
        (1, f"{seg_a} {seg_c}"),          # seg_a dropped (doc 0 owns it), c kept
        (2, seg_b),                        # entire doc is a dup: kept_text empty
    ]
    sf = _docs_dir(spark, tmp_path, rows)
    out = {r["doc_id"]: r for r in q115_segment_dedup(spark, sf).collect()}
    assert out[0]["n_segs"] == 2 and out[0]["n_kept"] == 2
    assert out[0]["kept_text"] == f"{seg_a} {seg_b}"
    assert out[1]["n_kept"] == 1 and out[1]["kept_text"] == seg_c
    assert out[2]["n_kept"] == 0 and out[2]["kept_text"] == ""


def test_q115_partial_tail_segment_is_its_own_unit(spark, tmp_path):
    # 15 tokens -> one full segment + one 5-token tail; the tail is a
    # distinct dedup unit, not merged into the full segment
    toks = [f"t{i}" for i in range(SEG_TOKENS + 5)]
    rows = [(0, " ".join(toks)), (1, " ".join(toks[SEG_TOKENS:]))]
    sf = _docs_dir(spark, tmp_path, rows)
    out = {r["doc_id"]: r for r in q115_segment_dedup(spark, sf).collect()}
    assert out[0]["n_segs"] == 2 and out[0]["n_kept"] == 2
    # doc 1 IS doc 0's tail segment -> dropped entirely
    assert out[1]["n_segs"] == 1 and out[1]["n_kept"] == 0


def test_q116_counts_occurrences_not_distinct_grams(spark, tmp_path):
    span = " ".join(f"w{i}" for i in range(NGRAM_N))
    rows = [
        (0, f"{span} x {span}"),  # span occurs twice in doc 0
        (1, f"y {span}"),
        (2, f"z z {span}"),
    ]
    sf = _docs_dir(spark, tmp_path, rows)
    out = q116_repeated_ngrams(spark, sf).collect()
    hit = [r for r in out if r["gram"] == span]
    assert len(hit) == 1
    assert hit[0]["n_docs"] == 3
    assert hit[0]["n_occurrences"] == 4  # 2 + 1 + 1


# --------------------------------------------------------------------------
# q231 span coverage / q233 containment / q234 entropy / q235 boilerplate —
# constructed-corpus semantics the oracle hash asserts but does not explain.
# --------------------------------------------------------------------------
from synth_transform_spark.plans.corpus_dedup_queries import (  # noqa: E402
    q231_span_coverage,
    q235_boilerplate_templates,
)


def test_q231_coverage_fractions(spark, tmp_path):
    shared = " ".join(f"s{i}" for i in range(NGRAM_N))      # exactly one gram
    uniq_a = " ".join(f"a{i}" for i in range(NGRAM_N))
    rows = [
        (0, f"{shared}"),                 # 1 gram, duplicated → 1.0
        (1, f"{shared} x0"),              # 2 grams, 1 duplicated → 0.5
        (2, uniq_a),                      # 1 gram, unique → 0.0
        (3, "short doc"),                 # < 8 tokens → absent
    ]
    sf = _docs_dir(spark, tmp_path, rows)
    out = {r["doc_id"]: r for r in q231_span_coverage(spark, sf).collect()}
    assert 3 not in out
    assert out[0]["dup_frac"] == 1.0 and out[0]["n_grams"] == 1
    assert out[1]["n_grams"] == 2 and out[1]["n_dup"] == 1
    assert out[1]["dup_frac"] == 0.5
    assert out[2]["dup_frac"] == 0.0


def test_q233_containment_is_directed(spark, tmp_path):
    from synth_transform_spark.plans.dedup_queries import q233_containment_pairs

    small = "w1 w2 w3 w4"                       # shingles: 2, all inside big
    big = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"      # shingles: 8
    rows = [(0, small), (1, big)]
    sf = _docs_dir(spark, tmp_path, rows)
    out = {(r["src_id"], r["dst_id"]): r["containment"]
           for r in q233_containment_pairs(spark, sf).collect()}
    # small fully contained in big: C(0→1) = 2/2 = 1.0 survives the 0.7 gate;
    # the reverse direction C(1→0) = 2/8 does not.
    assert out == {(0, 1): 1.0}


def test_q234_entropy_bounds(spark, tmp_path):
    from synth_transform_spark.plans.textops import q234_token_entropy

    rows = [
        (0, "x x x x x x x x"),                              # H = 0
        (1, " ".join(f"t{i}" for i in range(16))),           # H = log2(16) = 4
    ]
    sf = _docs_dir(spark, tmp_path, rows)
    out = {r["doc_id"]: r for r in q234_token_entropy(spark, sf).collect()}
    assert out[0]["entropy"] == 0.0 and out[0]["keep"] == 0
    assert out[1]["entropy"] == 4.0 and out[1]["keep"] == 1
    assert out[1]["n_types"] == 16 and out[1]["n_tokens"] == 16


def test_q235_prefix_and_suffix_groups(spark, tmp_path):
    from synth_transform_spark.plans.corpus_dedup_queries import _BOILER_TOKENS

    header = " ".join(f"h{i}" for i in range(_BOILER_TOKENS))
    rows = [
        (0, f"{header} body0 end0"),
        (1, f"{header} body1 end1"),
        (2, "lone document text"),
    ]
    sf = _docs_dir(spark, tmp_path, rows)
    out = q235_boilerplate_templates(spark, sf).collect()
    assert [(r["kind"], r["n_docs"], r["doc_list"]) for r in out] == [
        ("prefix", 2, "0,1")
    ]
    assert out[0]["snippet"] == header


def test_q245_flags_bilingual_concatenation(spark, tmp_path):
    """A doc whose first window is marker-English and second is
    marker-French must come back mixed with two languages; a uniform doc
    must not."""
    from synth_transform_spark.plans.textops import q245_mixed_language

    en = "the a and of fast the a and of fast"          # 10 en-marker tokens
    fr = "le et je ne pas le et je ne pas"              # 10 fr-ish tokens
    rows = [(0, f"{en} {fr}"), (1, en)]
    sf = _docs_dir(spark, tmp_path, rows)
    out = {r["doc_id"]: r for r in q245_mixed_language(spark, sf).collect()}
    assert out[0]["mixed"] == 1 and out[0]["n_langs"] == 2
    assert out[0]["top_share"] == 0.5
    assert out[1]["mixed"] == 0 and out[1]["n_langs"] == 1


def test_q490_excision_keeps_first_and_reassembles(spark, tmp_path):
    from synth_transform_spark.plans.corpus_dedup_queries import (
        q490_substring_excision,
    )

    span = " ".join(f"s{i}" for i in range(NGRAM_N))  # exactly one 8-gram
    uniq = " ".join(f"u{i}" for i in range(4))
    rows = [
        (0, span),                    # first occurrence: kept verbatim
        (1, f"{uniq} {span}"),        # later occurrence: span excised
        (2, "tiny doc"),              # < 8 tokens: passes through
        (3, ""),                      # empty: survives as empty
    ]
    sf = _docs_dir(spark, tmp_path, rows)
    out = {r["doc_id"]: r for r in q490_substring_excision(spark, sf).collect()}
    assert set(out) == {0, 1, 2, 3}
    assert out[0]["n_removed"] == 0 and out[0]["kept_text"] == span
    assert out[1]["n_removed"] == NGRAM_N and out[1]["kept_text"] == uniq
    assert out[2]["n_removed"] == 0 and out[2]["kept_text"] == "tiny doc"
    assert out[3]["n_tokens"] == 0 and out[3]["kept_text"] == ""


def test_q490_overlapping_runs_excise_whole_tail_occurrence(spark, tmp_path):
    from synth_transform_spark.plans.corpus_dedup_queries import (
        q490_substring_excision,
    )

    # a 12-token run duplicated later in the SAME doc: every position of
    # the second run is covered by some non-first 8-gram, including the
    # run's tail (positions covered via overlapping grams)
    run = [f"r{i}" for i in range(NGRAM_N + 4)]
    mid = [f"m{i}" for i in range(3)]
    rows = [(0, " ".join(run + mid + run))]
    sf = _docs_dir(spark, tmp_path, rows)
    row = q490_substring_excision(spark, sf).collect()[0]
    assert row["n_tokens"] == 2 * len(run) + len(mid)
    assert row["n_removed"] == len(run)
    assert row["kept_text"] == " ".join(run + mid)


def test_q499_containment_is_directed(spark, tmp_path):
    from synth_transform_spark.plans.corpus_dedup_queries import (
        q499_source_contamination,
    )

    span = " ".join(f"g{i}" for i in range(NGRAM_N))
    extra = " ".join(f"h{i}" for i in range(NGRAM_N))
    # source A = exactly the span; source B = span + another gram
    # => A fully contained in B (1.0), B only half contained in A
    rows = [(0, span, "A"), (1, f"{span} {extra}", "B")]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"]).withColumn(
        "lang", F.lit("en")
    ).withColumn("n_chars", F.length("text").cast("long"))
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {
        (r["source_a"], r["source_b"]): r
        for r in q499_source_contamination(spark, str(tmp_path)).collect()
    }
    assert out[("A", "B")]["containment_in_b"] == 1.0
    assert out[("B", "A")]["containment_in_b"] < 1.0
    assert out[("A", "B")]["shared_grams"] == out[("B", "A")]["shared_grams"]


def test_q500_funnel_consistent_with_parts(spark):
    from conftest import SF_DIR as _sf
    from synth_transform_spark.plans.corpus_dedup_queries import (
        q115_segment_dedup,
        q490_substring_excision,
        q500_dedup_funnel,
    )

    funnel = {r["stage"]: r for r in q500_dedup_funnel(spark, _sf).collect()}
    assert set(funnel) == {
        "1_exact_docs",
        "2_segment_tokens",
        "3_substring_tokens",
        "4_neardup_docs",
    }
    for r in funnel.values():
        assert 0 <= r["n_kept"] <= r["n_total"]
        assert r["reduction"] == pytest.approx(
            1.0 - r["n_kept"] / r["n_total"], abs=1e-4
        )
    # stage 3 must agree with q490's own per-doc accounting
    q490 = q490_substring_excision(spark, _sf).toPandas()
    assert funnel["3_substring_tokens"]["n_total"] == int(q490["n_tokens"].sum())
    assert funnel["3_substring_tokens"]["n_kept"] == int(
        (q490["n_tokens"] - q490["n_removed"]).sum()
    )
    # stage 2 must agree with q115's kept-token accounting
    q115 = q115_segment_dedup(spark, _sf).toPandas()
    kept_toks = sum(
        len([t for t in kt.split(" ") if t]) for kt in q115["kept_text"]
    )
    assert funnel["2_segment_tokens"]["n_kept"] == kept_toks
