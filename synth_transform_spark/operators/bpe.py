"""Distributed BPE tokenizer training (byte-pair-encoding merge learning).

Sennrich et al., "Neural Machine Translation of Rare Words with Subword
Units" (ACL 2016): starting from characters, repeatedly merge the most
frequent adjacent symbol pair. The training-data pipelines this engine
targets need the trainer ON the cluster — the corpus word count is the
100 TB-scale stage, and the merge loop then runs over the aggregated
vocabulary relation, which is orders of magnitude smaller but can still be
tens of millions of (word, pos, symbol) rows — too big to collect.

Spark shape, per merge round (driver loop, like operators/graph.pagerank):

1. adjacency via LEAD over (word, pos) — window bounded by word length;
2. pair counts: one keyed groupBy with map-side partials; the argmax pair
   (count DESC, pair ASC — fully deterministic tie-break) is the ONLY
   driver-side collect, one row per round. A round-11 experiment kept
   the argmax distributed instead (broadcast 1-row relation cross-joined
   into the rebuild, merge metadata collected once post-loop): measured
   A/B at sf0.1 it DOUBLED the wall (4.5 → 8.5 s) — the per-round
   BroadcastExchange + nested-loop join under the eager checkpoint costs
   more than the one-row collect it replaces — so the collect stays;
3. leftmost-first merge WITHOUT a sequential scan: candidate positions,
   then within each maximal run of CONSECUTIVE candidates keep the
   odd-ranked ones (1st, 3rd, ...). A run of consecutive candidate
   positions only arises for self-pairs like (a,a) in "aaaa", and
   greedy left-to-right merging takes exactly every other candidate —
   so the window algebra reproduces the sequential semantics exactly;
4. rebuild: merged position takes left||right, its successor drops, pos
   re-densifies with row_number. State is localCheckpoint-ed per round
   (lineage truncation; multi-executor clusters prefer reliable
   checkpoint — see caching.py).

Everything is deterministic — counts are exact integers, ties break
lexicographically — so the DuckDB oracle unrolls the same algebra as
K materialized CTE blocks and hash-matches the merge table bit for bit.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


@dataclass(frozen=True)
class BpeResult:
    """Learned merge list [(rank, left, right, pair_count)] + final vocab
    state (word, n, pos, sym)."""

    merges: list[tuple[int, str, str, int]]
    state: DataFrame


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus word frequencies — the only stage that touches raw text."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _initial_state(wc: DataFrame) -> DataFrame:
    """(word, n, pos, sym): one row per character occurrence."""
    return wc.select(
        "word",
        "n",
        F.posexplode(F.split("word", "")).alias("pos", "sym"),
    )


def train(docs: DataFrame, k: int, text_col: str = "text") -> BpeResult:
    """Learn ``k`` BPE merges over the corpus. Executes 1 + k rounds of
    Spark jobs (iterative — not a lazy plan). Per-round cost: one
    one-row argmax collect + one eager checkpoint (the distributed-argmax
    variant was measured SLOWER — see the module docstring)."""
    w_word = Window.partitionBy("word").orderBy("pos")
    state = _initial_state(word_counts(docs, text_col)).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, k + 1):
        p = state.withColumn("nxt", F.lead("sym").over(w_word))
        pair_counts = (
            p.filter(F.col("nxt").isNotNull())
            .groupBy("sym", "nxt")
            .agg(F.sum("n").alias("cnt"))
        )
        top = (
            pair_counts.orderBy(
                F.col("cnt").desc(), F.col("sym").asc(), F.col("nxt").asc()
            )
            .limit(1)
            .collect()
        )
        if not top:  # every word is a single symbol — nothing left to merge
            break
        left, right, cnt = top[0].sym, top[0].nxt, int(top[0].cnt)
        merges.append((rank, left, right, cnt))

        cand = p.filter((F.col("sym") == left) & (F.col("nxt") == right)).select(
            "word", "pos"
        )
        kept = (
            cand.withColumn("rn0", F.row_number().over(w_word))
            .withColumn("grp", F.col("pos") - F.col("rn0"))
            .withColumn(
                "rir",
                F.row_number().over(
                    Window.partitionBy("word", "grp").orderBy("pos")
                ),
            )
            .filter(F.col("rir") % 2 == 1)
            .select("word", "pos")
        )
        merged = kept.withColumn("is_merge", F.lit(1))
        dropped = kept.select(
            "word", (F.col("pos") + 1).alias("pos"), F.lit(1).alias("is_drop")
        )
        state = (
            p.join(merged, ["word", "pos"], "left")
            .join(dropped, ["word", "pos"], "left")
            .filter(F.col("is_drop").isNull())
            .select(
                "word",
                "n",
                "pos",
                F.when(
                    F.col("is_merge") == 1, F.concat("sym", "nxt")
                ).otherwise(F.col("sym")).alias("sym"),
            )
            .withColumn("new_pos", F.row_number().over(w_word) - 1)
            .select("word", "n", F.col("new_pos").alias("pos"), "sym")
            .localCheckpoint(eager=True)
        )
    return BpeResult(merges=merges, state=state)


def merge_table(spark, result: BpeResult) -> DataFrame:
    """The learned merges as a relation (the tokenizer artifact)."""
    return spark.createDataFrame(
        result.merges,
        "merge_rank bigint, left_sym string, right_sym string, pair_n bigint",
    )


def vocab_segmentation(result: BpeResult) -> DataFrame:
    """Post-training segmentation of every vocab word:
    (word, n, segmented, n_tokens) — what the encoder would emit."""
    ordered = F.array_sort(F.collect_list(F.struct("pos", "sym")))
    return result.state.groupBy("word", "n").agg(
        F.array_join(
            F.transform(ordered, lambda s: s.sym), " "
        ).alias("segmented"),
        F.count(F.lit(1)).alias("n_tokens"),
    )


def unigram_viterbi(
    docs: DataFrame,
    text_col: str = "text",
    max_piece: int = 4,
    max_word_len: int = 12,
) -> DataFrame:
    """SentencePiece-style unigram-LM E-step: Viterbi-segment every
    vocabulary word under substring-frequency piece probabilities.

    Pieces are all substrings of length 1..``max_piece``; p(piece) is its
    corpus-weighted occurrence share; the Viterbi DP maximises the summed
    log-probability of a segmentation (ties: fewer pieces, then the
    smallest split point). Returns (word, corpus_freq, n_pieces,
    logprob).

    The DP is VECTORISED over the vocabulary relation: position j's best
    prefix score is one join+argmax over positions j-max_piece..j-1, so
    the whole E-step is ``max_word_len`` relational steps (no UDF, no
    per-word loop) - each step a vocabulary-keyed join, which is exactly
    the shape that scales: 100 TB of text collapses to a vocabulary
    relation first, and every DP step shuffles only that.

    Log scores are frozen to round(10^6 * ln(pf/total)) integers so the
    argmax cannot wobble across engines; ties break deterministically.
    """
    from ..caching import persist_tracked

    words = (
        docs.select(
            F.explode(
                F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
            ).alias("word")
        )
        .filter(F.length("word") <= max_word_len)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    words = persist_tracked(words)
    sub = (
        words.select(
            "word",
            "f",
            F.explode(F.sequence(F.lit(0), F.length("word") - 1)).alias("i"),
        )
        .select(
            "word",
            "f",
            "i",
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.least(F.lit(max_piece), F.length("word") - F.col("i")),
                )
            ).alias("L"),
        )
        .select(
            "word",
            "f",
            "i",
            (F.col("i") + F.col("L")).alias("j"),
            F.substr(F.col("word"), F.col("i") + 1, F.col("L")).alias("piece"),
        )
    )
    pf = sub.groupBy("piece").agg(F.sum("f").alias("pf"))
    tot = pf.agg(F.sum("pf").alias("tot"))
    sc = pf.crossJoin(F.broadcast(tot)).select(
        "piece",
        F.round(
            1000000.0 * F.log(F.col("pf").cast("double") / F.col("tot"))
        )
        .cast("long")
        .alias("s"),
    )
    pp = persist_tracked(
        sub.join(sc, "piece").select("word", "i", "j", "s")
    )

    b: list[DataFrame] = [
        words.select(
            "word",
            F.lit(0).cast("long").alias("sc"),
            F.lit(0).cast("long").alias("np"),
        )
    ]
    for j in range(1, max_word_len + 1):
        cands = None
        for i in range(max(0, j - max_piece), j):
            c = (
                pp.filter((F.col("i") == i) & (F.col("j") == j))
                .join(b[i], "word")
                .select(
                    "word",
                    (F.col("sc") + F.col("s")).alias("csc"),
                    (F.col("np") + 1).alias("cnp"),
                    F.lit(i).cast("long").alias("bi"),
                )
            )
            cands = c if cands is None else cands.unionByName(c)
        best = (
            cands.groupBy("word")
            .agg(
                F.max(
                    F.struct(
                        F.col("csc").alias("sc"),
                        (-F.col("cnp")).alias("nnp"),
                        (-F.col("bi")).alias("nbi"),
                    )
                ).alias("m")
            )
            .select(
                "word",
                F.col("m.sc").alias("sc"),
                (-F.col("m.nnp")).cast("long").alias("np"),
            )
        )
        # localCheckpoint (not persist): each level references up to
        # ``max_piece`` prior levels, so an un-truncated lineage would grow
        # ~4^12 analyzer nodes - checkpointing keeps every DP step's plan
        # flat (the graph.py iterative-operator pattern).
        b.append(best.localCheckpoint(eager=True))

    out = None
    for j in range(1, max_word_len + 1):
        part = (
            words.filter(F.length("word") == j)
            .join(b[j], "word")
            .select(
                "word",
                F.col("f").cast("long").alias("corpus_freq"),
                F.col("np").cast("long").alias("n_pieces"),
                F.round(F.col("sc") / 1000000.0, 4).alias("logprob"),
            )
        )
        out = part if out is None else out.unionByName(part)
    return out
