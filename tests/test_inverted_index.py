"""inverted_index (operators/text_analysis.py): postings + df semantics."""

from __future__ import annotations

from synth_transform_spark.operators.text_analysis import inverted_index


def test_postings_df_and_tokenisation(spark):
    docs = spark.createDataFrame(
        [
            (10, "The cat sat, the CAT!"),   # 'cat'/'the' dedup within doc
            (2, "a cat"),
            (7, "dogs only"),
        ],
        "doc_id LONG, text STRING",
    )
    got = {
        r["token"]: (r["df"], r["postings"])
        for r in inverted_index(docs).collect()
    }
    # case-folded, punctuation split, per-doc distinct, ids numerically sorted
    assert got["cat"] == (2, "2,10")
    assert got["the"] == (1, "10")
    assert got["sat"] == (1, "10")
    assert got["dogs"] == (1, "7")


def test_min_df_bounds_output(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha gamma")], "doc_id LONG, text STRING"
    )
    toks = {r["token"] for r in inverted_index(docs, min_df=2).collect()}
    assert toks == {"alpha"}
