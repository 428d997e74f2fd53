"""Incremental-processing operators: snapshot diff.

The reference's ``synth update`` flow recomputes a cache and overwrites it
wholesale (/root/reference/synth/cli.py — fetch-all then rewrite); at 100 TB
the pipeline equivalent is computing the DELTA between two table snapshots
and reprocessing only changed keys. ``snapshot_diff`` is that operator:
added / removed / changed rows between an old and a new snapshot of the
same keyed table.

Scale notes: one full-outer sort-merge join shuffling both sides on the
key — the unavoidable minimum for a keyed diff (bucketing both snapshots
on the key at write time makes it shuffle-free). Value comparison is a
single md5 over the concatenated value columns computed map-side, so wide
tables compare one 32-char column, not N columns, through the join.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    value_cols: Sequence[str],
) -> DataFrame:
    """Rows that differ between snapshots: (*key_cols, status).

    status ∈ {'added', 'removed', 'changed'}; unchanged rows are dropped
    (the common case at scale — emit the delta, not the table). Value
    equality is null-safe via an md5 fingerprint of the value columns
    (NULL encoded distinctly from the empty string).
    """
    def fp(df: DataFrame) -> DataFrame:
        enc = [
            F.coalesce(F.col(c).cast("string"), F.lit("\x00null")).alias(c)
            for c in value_cols
        ]
        return df.select(
            *key_cols, F.md5(F.concat_ws("\x01", *enc)).alias("val_fp")
        )

    o = fp(old).withColumnRenamed("val_fp", "old_fp")
    n = fp(new).withColumnRenamed("val_fp", "new_fp")
    joined = o.join(n, list(key_cols), "full_outer")
    return joined.filter(
        F.col("old_fp").isNull()
        | F.col("new_fp").isNull()
        | (F.col("old_fp") != F.col("new_fp"))
    ).select(
        *key_cols,
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    )


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    value_cols: Sequence[str],
    op_col: str = "op",
) -> DataFrame:
    """MERGE: apply an update batch to a base snapshot in one pass.

    ``updates`` carries the same key/value columns plus ``op_col`` ∈
    {'upsert', 'delete'}: matched upserts replace the base values, unmatched
    upserts insert, deletes drop the key (matched or not), untouched base
    rows pass through. Returns the post-merge snapshot.

    Scale notes: one full-outer equi-join on the key — the copy-on-write
    MERGE kernel (Delta/Iceberg semantics without the transaction log).
    The batch is usually ≪ the base, so AQE broadcasts it; bucketing the
    base on the key makes the rewrite shuffle-free. Duplicate keys within
    one batch are the caller's contract to resolve (last-writer-wins needs
    an ordering column; this operator assumes ≤ 1 update row per key,
    matching SQL MERGE's cardinality rule).
    """
    upd = updates.select(
        *key_cols,
        *[F.col(c).alias(f"_u_{c}") for c in value_cols],
        F.col(op_col).alias("_op"),
    )
    joined = base.join(upd, list(key_cols), "full_outer")
    kept = joined.filter(
        (F.col("_op").isNull()) | (F.col("_op") == F.lit("upsert"))
    )
    return kept.select(
        *key_cols,
        *[
            F.when(F.col("_op") == "upsert", F.col(f"_u_{c}"))
            .otherwise(F.col(c))
            .alias(c)
            for c in value_cols
        ],
    )
