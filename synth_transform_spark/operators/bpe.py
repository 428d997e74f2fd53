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
   driver-side collect, one row per round;
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
    Spark jobs (iterative — not a lazy plan)."""
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
