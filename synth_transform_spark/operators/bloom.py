"""Bloom-filter join pruning: a deterministic, engine-portable runtime filter.

The 100 TB motivation: a fact-side scan feeding a selective join moves every
probe row through the shuffle even though most will not match. Spark's own
runtime-filter / DPP machinery handles the partition-column case; this
operator is the general-key version — build a compact bloom filter from the
(small, filtered) build side, broadcast it, and drop non-matching probe rows
BEFORE the join shuffle. The final exact join still runs, so false positives
cost nothing but wasted shuffle bytes and false negatives are impossible
(bit-set membership is exact for inserted keys).

Construction (mirrors in SQL, so the q80 oracle can be the PLAIN semi-join —
correctness means the pruned plan returns exactly the unpruned answer):

- m = 4096 bits stored as 64 × 64-bit words; k = 3 hash functions
- position_j(key) = first-8-md5-hex("j:" || key) mod m   (j = 0,1,2)
- build: distinct positions → word = pos div 64, bit = pos mod 64,
  word value = BIT_OR(1 << bit) per word  → a 64-row relation
- probe: a key passes iff all k of its words have the bit set

Scale notes: the build side aggregates to AT MOST 64 rows regardless of key
count — broadcast for free. The probe-side check is a broadcast hash join on
``word`` (≤ k rows exploded per probe row) plus an ALL-bits-set aggregate,
entirely JVM-side; no Python, no driver collect. Sizing: k=3/m=4096 gives
~1.5 % false-positive rate at 500 keys (n/m ≈ 0.12); production sizing scales
m with the build-side count (m ≈ 10·n keeps FPR ≈ 1 %).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import broadcast

BLOOM_BITS = 4096
BLOOM_WORDS = BLOOM_BITS // 64
BLOOM_K = 3


def _pos_sql(j: int, key_col: str) -> str:
    """The j-th bloom bit position for ``key_col`` as a SQL expression —
    the SINGLE source of the hash formula: build and probe both compile
    from this text, so they cannot drift apart (drift would mean silent
    false negatives, i.e. wrong join results)."""
    return (
        f"(CAST(conv(substring(md5(concat('{j}:', CAST({key_col} AS STRING))),"
        f" 1, 8), 16, 10) AS BIGINT) % {BLOOM_BITS})"
    )


def _positions(key_col: str, k: int = BLOOM_K):
    """The k bloom bit positions for a key, as column expressions."""
    return [F.expr(_pos_sql(j, key_col)) for j in range(k)]


def bloom_build(build: DataFrame, key_col: str) -> DataFrame:
    """Aggregate a key set into bloom words: (word, bits) — ≤ 64 rows."""
    pos = F.explode(F.array(*_positions(key_col))).alias("pos")
    positions = build.select(pos).distinct()
    return positions.select(
        (F.col("pos") / F.lit(64)).cast("long").alias("word"),
        (F.col("pos") % F.lit(64)).alias("bit"),
    ).groupBy("word").agg(
        # shiftleft's amount must be a literal in the Python API — SQL expr
        # accepts the column form.
        F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))")).alias(
            "bits"
        )
    )


def bloom_prune(probe: DataFrame, bloom_words: DataFrame, key_col: str) -> DataFrame:
    """Probe rows whose key passes the bloom filter (supersets the true
    matches — follow with the exact join).

    ZERO-shuffle on the probe side: the ≤ 64 bloom words are packed into a
    dense array in ONE broadcast row (missing words ⇒ 0), so the k bit
    checks are pure row-local expressions inside whole-stage codegen — a
    narrow filter, exactly what a runtime filter must be. (The previous
    shape exploded k rows per probe row and re-grouped on a row tag: a
    full-width Exchange of the probe side, defeating the prune's purpose.)
    """
    packed = bloom_words.agg(
        F.map_from_arrays(
            F.collect_list("word"), F.collect_list("bits")
        ).alias("_wmap")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(BLOOM_WORDS - 1)),
            lambda w: F.coalesce(
                F.element_at(F.col("_wmap"), w.cast("long")), F.lit(0).cast("long")
            ),
        ).alias("_words")
    )
    out = probe.join(broadcast(packed))
    # All k bit tests as one row-local predicate. The shift amount is a
    # column, which the Python shiftright API rejects — SQL exprs accept
    # it; the position formula is _pos_sql, the same text the build side
    # compiles.
    checks = []
    for j in range(BLOOM_K):
        p = _pos_sql(j, key_col)
        checks.append(
            f"((shiftright(element_at(_words, CAST({p} DIV 64 AS INT) + 1),"
            f" CAST({p} % 64 AS INT)) & 1) = 1)"
        )
    return out.filter(F.expr(" AND ".join(checks))).select(*probe.columns)


def bloom_semi_join(
    probe: DataFrame, build: DataFrame, probe_key: str, build_key: str
) -> DataFrame:
    """Exact semi-join accelerated by a bloom pre-filter.

    Returns exactly ``probe SEMI JOIN build`` (the q80 oracle is the plain
    semi-join): the bloom stage only removes rows the exact join would
    reject anyway. The exact stage joins the (already pruned) probe against
    the distinct build keys.
    """
    words = bloom_build(build, build_key)
    pruned = bloom_prune(probe, words, probe_key)
    keys = build.select(F.col(build_key).alias(probe_key)).distinct()
    return pruned.join(broadcast(keys), probe_key, "left_semi")
