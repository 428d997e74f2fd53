"""BPE trainer (operators/bpe.py) vs a sequential pure-Python reference.

The window-algebra merge must reproduce greedy leftmost-first semantics
exactly — including the self-pair run case ("aaaa" under merge (a,a) →
[aa, aa], not [aa, a, a]).
"""

from __future__ import annotations

from synth_transform_spark.operators import bpe


def bpe_reference(word_counts: dict[str, int], k: int):
    """Sequential textbook implementation (Sennrich'16 greedy scan)."""
    seqs = {w: list(w) for w in word_counts}
    merges = []
    for rank in range(1, k + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, n in word_counts.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + n
        if not counts:
            break
        (left, right), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, left, right, c))
        for w in seqs:
            s = seqs[w]
            out: list[str] = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return merges, {w: s for w, s in seqs.items()}


def _docs(spark, texts):
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                 "doc_id long, text string")


def test_matches_sequential_reference(spark):
    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wide wider widest wide lower",
    ]
    docs = _docs(spark, texts)
    res = bpe.train(docs, k=5)
    wc = {}
    for t in texts:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    exp_merges, exp_seqs = bpe_reference(wc, 5)
    assert res.merges == exp_merges
    seg = {
        r.word: r.segmented.split(" ")
        for r in bpe.vocab_segmentation(res).collect()
    }
    assert seg == exp_seqs


def test_self_pair_run_merges_every_other(spark):
    """'aaaa' under merge (a,a): greedy scan gives [aa, aa] — the run-rank
    window must keep candidates 1 and 3, not chain-merge."""
    docs = _docs(spark, ["aaaa aaaa aaa b"])
    res = bpe.train(docs, k=1)
    assert res.merges[0][1:3] == ("a", "a")
    seg = {
        r.word: (r.segmented, r.n_tokens)
        for r in bpe.vocab_segmentation(res).collect()
    }
    assert seg["aaaa"] == ("aa aa", 2)
    assert seg["aaa"] == ("aa a", 2)
    assert seg["b"] == ("b", 1)


def test_merge_count_is_pre_merge_adjacency(spark):
    """pair_n reports the adjacency count (overlaps included): 'aaa'
    contributes TWO (a,a) adjacencies though only one merge applies."""
    docs = _docs(spark, ["aaa"])
    res = bpe.train(docs, k=1)
    assert res.merges == [(1, "a", "a", 2)]


def test_stops_when_fully_merged(spark):
    docs = _docs(spark, ["ab ab"])
    res = bpe.train(docs, k=10)
    # one merge exhausts the corpus (every word becomes a single symbol)
    assert [m[1:3] for m in res.merges] == [("a", "b")]


def test_oracle_matches_spark_when_corpus_exhausts_early(spark):
    """'ab ab' exhausts after ONE merge. bpe.train breaks and keeps the
    final state; the oracle's LEFT JOIN ON TRUE must pass the state
    through the empty rounds unchanged instead of wiping it."""
    import duckdb
    import pandas as pd

    from synth_transform_spark.plans.registry import REGISTRY

    docs_pdf = pd.DataFrame({"doc_id": [0, 1], "text": ["ab ab", "ab"]})
    con = duckdb.connect()
    con.register("documents", docs_pdf)

    sdocs = spark.createDataFrame(docs_pdf)
    res = bpe.train(sdocs, k=6)
    assert [m[1:3] for m in res.merges] == [("a", "b")]

    merges_oracle = con.execute(REGISTRY["q186_bpe_merges"].oracle).df()
    assert list(
        merges_oracle[["left_sym", "right_sym"]].itertuples(index=False, name=None)
    ) == [("a", "b")]

    seg_oracle = con.execute(REGISTRY["q187_bpe_segmentation"].oracle).df()
    seg_spark = bpe.vocab_segmentation(res).toPandas()
    o = {r.word: (r.segmented, r.n_tokens) for r in seg_oracle.itertuples()}
    s = {r.word: (r.segmented, r.n_tokens) for r in seg_spark.itertuples()}
    assert o == s == {"ab": ("ab", 1)}
