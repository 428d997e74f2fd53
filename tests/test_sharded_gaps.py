"""sharded_gaps kernel: the day-shard-and-stitch lag/lead must equal the
naive per-key global window EXACTLY — including same-second ties, empty
day gaps, single-event shards, and per-key stream ends."""

from __future__ import annotations

import random

import pyspark.sql.functions as F
from pyspark.sql import Window

from synth_transform_spark.operators.windows import sharded_gaps


def _naive_with_id(df, keys, sec="sec", idc="eid"):
    w = Window.partitionBy(*keys).orderBy(sec, idc)
    return df.select(
        *keys,
        F.col(sec),
        F.col(idc),
        F.lag(sec).over(w).alias("prv_sec"),
        F.lead(sec).over(w).alias("nxt_sec"),
    )


def _check(spark, rows, keys, shard_seconds):
    # row-level: (k, sec, eid) identifies each row in both variants, so a
    # mispairing of (prv, nxt) across same-second ties is a hard mismatch
    # (a multiset compare per (k, sec) group would let it slide).
    df = spark.createDataFrame(rows, ["k", "sec", "eid"])
    got = sharded_gaps(df, keys, sec_col="sec", id_col="eid",
                       shard_seconds=shard_seconds, keep_id=True)
    want = _naive_with_id(df, keys)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_adversarial_fixed_case(spark):
    # two keys; day-sized shards; empty days between events; same-second
    # ties (both within and at shard-opening seconds); single-event days
    rows = [
        ("a", 0, 1), ("a", 0, 2), ("a", 10, 3),          # ties at stream head
        ("a", 86399, 4), ("a", 86400, 5), ("a", 86400, 6),  # boundary + tie
        ("a", 4 * 86400, 7),                              # 3 empty days
        ("a", 4 * 86400 + 50, 8),
        ("b", 7, 1), ("b", 2 * 86400, 2),                 # sparse second key
        ("c", 5, 9),                                       # single-event key
    ]
    _check(spark, rows, ["k"], 86400)


def test_keyless_matches_global_window(spark):
    rows = [("x", s, i) for i, s in enumerate(
        [0, 1, 1, 50, 86399, 86401, 86401, 3 * 86400, 9 * 86400, 9 * 86400]
    )]
    _check(spark, rows, [], 86400)


def test_randomized_against_naive(spark):
    rng = random.Random(6)
    rows = []
    for i in range(400):
        key = rng.choice(["a", "b", "c", "d"])
        sec = rng.randrange(0, 12 * 86400)
        if rng.random() < 0.2:
            sec = (sec // 86400) * 86400  # land exactly on shard boundaries
        if rng.random() < 0.2 and rows:
            sec = rows[-1][1]  # force duplicate seconds
        rows.append((key, sec, i))
    _check(spark, rows, ["k"], 86400)
    # odd shard width: boundaries no longer align with "days"
    _check(spark, rows, ["k"], 9973)


def test_empty_input_is_total(spark):
    df = spark.createDataFrame([], "k string, sec long, eid long")
    out = sharded_gaps(df, ["k"], sec_col="sec", id_col="eid")
    assert out.count() == 0
    assert set(out.columns) == {"k", "sec", "prv_sec", "nxt_sec"}


def test_packer_meets_padding_waste_lower_bound(spark):
    """Cross-op consistency: q69's 8-shard packer must land within 8
    windows of q396's perfect-packing lower bound ceil(T/512) — each
    shard wastes less than one capacity at its tail, nothing else."""
    import pyspark.sql.functions as F2

    from synth_transform_spark.operators import seqprep
    from synth_transform_spark.sources.readers import load_table

    from conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    packed = seqprep.pack_sequences(docs, capacity=512, n_shards=8)
    total = packed.select(F2.sum("n_tokens").alias("t")).collect()[0]["t"]
    per_shard = (
        packed.groupBy("shard")
        .agg((F2.max("bin_last") + 1).alias("bins"))
        .collect()
    )
    n_windows = sum(r["bins"] for r in per_shard)
    lower = -(-total // 512)
    assert lower <= n_windows <= lower + 8
