"""Skew-mitigation joins: salting.

The 100 TB posture for skewed equi-joins (SURVEY.md §7.6 "salting hooks on
skewed keys" — user_guid, ISSN): a hot key whose rows exceed one task's
share stalls the stage. AQE's skew-join handles sort-merge cases
automatically (`spark.sql.adaptive.skewJoin.enabled`, on in this engine's
session); explicit salting is the portable fallback and the only option
when the skewed side feeds a hash aggregation.

Mechanics: the big (skewed) side gets a deterministic salt in [0, n); the
small side is replicated n times (explode over the salt range); the join
key becomes (key, salt). Each hot key now spreads over n tasks at the cost
of replicating the small side n-fold — n trades replication against
parallelism.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    Deterministic salt (xxhash64 of the whole row, mod n) so retries and
    re-runs partition identically. Result equals ``big.join(small, on,
    how)`` ONLY for inner/left joins (the small side must be unique on
    ``on`` — standard for dimension joins; duplicates would duplicate
    output rows exactly as in the unsalted join). right/full joins are
    rejected: the n_salts-replicated small side would emit every unmatched
    small row n_salts times.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            f"salted_join supports how in ('inner','left','left_outer'); got {how!r}"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts)).cast("long")
    big_s = big.withColumn("_salt", salt)
    small_s = small.withColumn(
        "_salt_i", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt_i").cast("long")).drop("_salt_i")
    return big_s.join(small_s, on + ["_salt"], how).drop("_salt")


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str | list[str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation for skewed group keys.

    Stage 1 groups on (keys, salt) — hot keys split across n partial
    groups; stage 2 merges partials on keys. Supported aggs: sum, count,
    min, max (re-aggregable); avg must be decomposed by the caller into
    sum+count. ``aggs`` maps column → function or list of functions, so
    one call (one table scan) computes every aggregate.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    partial_exprs = []
    final_exprs = []
    pairs = [
        (col, fn)
        for col, fns in aggs.items()
        for fn in ([fns] if isinstance(fns, str) else fns)
    ]
    for col, fn in pairs:
        p = f"_p_{fn}_{col}"
        if fn == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(p))
            final_exprs.append(F.sum(p).alias(f"{fn}_{col}"))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(p))
            final_exprs.append(F.sum(p).alias(f"{fn}_{col}"))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(p))
            final_exprs.append(F.min(p).alias(f"{fn}_{col}"))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(p))
            final_exprs.append(F.max(p).alias(f"{fn}_{col}"))
        else:
            raise ValueError(f"non-re-aggregable function: {fn}")
    return (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*partial_exprs)
        .groupBy(*keys)
        .agg(*final_exprs)
    )
