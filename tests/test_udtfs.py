"""UDTF surface (functions/udtfs.py): registration, lateral expansion,
offset fidelity."""

from __future__ import annotations


def test_token_spans_lateral(spark):
    from synth_transform_spark.functions.udtfs import TokenSpans

    spark.udtf.register("token_spans", TokenSpans)
    rows = spark.sql(
        """
        SELECT t.doc_id, s.token, s.start, s.end
        FROM VALUES (1, 'ab  cd e'), (2, NULL), (3, '') AS t(doc_id, txt),
             LATERAL token_spans(t.txt) AS s
        ORDER BY t.doc_id, s.start
        """
    ).collect()
    assert [(r.doc_id, r.token, r.start, r.end) for r in rows] == [
        (1, "ab", 0, 2),
        (1, "cd", 4, 6),
        (1, "e", 7, 8),
    ]
    # offsets reconstruct the token from the original string
    src = "ab  cd e"
    for r in rows:
        assert src[r.start : r.end] == r.token
