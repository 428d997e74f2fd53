"""q115/q116 semantics on constructed corpora: first-occurrence keeps,
in-order reassembly, positional (non-distinct) n-gram counting — the
properties the oracle hash-match asserts but does not explain."""

from __future__ import annotations

import pyspark.sql.functions as F

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
