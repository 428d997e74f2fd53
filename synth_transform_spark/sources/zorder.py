"""Z-order (Morton) clustered layout: keys, writer, and box-query pruning.

The q90 key generator and the write-side policy it exists for, in one
module so the Spark expression, the DuckDB oracle SQL, and the bucket
enumeration used for pruning all derive from the same bit layout:

    zval bit 2b   = bit b of x        (b < Z_BITS)
    zval bit 2b+1 = bit b of y
    zbucket       = zval >> BUCKET_SHIFT   (top PREFIX_BITS bits of each dim,
                                            interleaved)

Writing a 100 TB fact table partitioned by ``zbucket`` (and range-sorted by
``zval`` within partitions) makes BOTH dimensions prunable from one layout:
a rectangle query enumerates the qualifying buckets driver-side
(``zbuckets_for_box`` — at most 2^(2·PREFIX_BITS) = 1024 candidates, a
trivial loop) and the scan touches only those directories; parquet row-group
min/max on ``zval`` then skips within files. This is the OPTIMIZE ZORDER
layout of Delta/Iceberg re-expressed with plain repartition + partitionBy.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

Z_BITS = 16          # bits per dimension in zval
PREFIX_BITS = 5      # bits per dimension in the bucket prefix
BUCKET_SHIFT = 2 * Z_BITS - 2 * PREFIX_BITS  # 22: zbucket = zval >> 22
CELL = 1 << (Z_BITS - PREFIX_BITS)           # 2048: x-range covered per bucket


def z_value_expr(x, y):
    """zval column from two already-masked (< 2^Z_BITS) long columns."""
    terms = []
    for b in range(Z_BITS):
        terms.append(
            F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)), 2 * b)
            + F.shiftleft(F.shiftright(y, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def z_value_sql(x: str, y: str) -> str:
    """The identical bit algebra as DuckDB SQL (oracle side of q90)."""
    terms = [
        f"((({x} >> {b}) & 1) << {2 * b}) + ((({y} >> {b}) & 1) << {2 * b + 1})"
        for b in range(Z_BITS)
    ]
    return " + ".join(terms)


def _interleave_prefix(xp: int, yp: int) -> int:
    """Bucket id for dimension prefixes xp, yp (< 2^PREFIX_BITS)."""
    out = 0
    for b in range(PREFIX_BITS):
        out |= ((xp >> b) & 1) << (2 * b)
        out |= ((yp >> b) & 1) << (2 * b + 1)
    return out


def zbuckets_for_box(x_lo: int, x_hi: int, y_lo: int, y_hi: int) -> list[int]:
    """Every zbucket whose cell intersects the inclusive rectangle
    [x_lo, x_hi] × [y_lo, y_hi] — the driver-side pruning list for a box
    query (≤ 1024 candidates checked; the result is usually a handful)."""
    out = []
    for xp in range(1 << PREFIX_BITS):
        if xp * CELL > x_hi or (xp + 1) * CELL - 1 < x_lo:
            continue
        for yp in range(1 << PREFIX_BITS):
            if yp * CELL > y_hi or (yp + 1) * CELL - 1 < y_lo:
                continue
            out.append(_interleave_prefix(xp, yp))
    return sorted(out)


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` Z-order-clustered on (x_col, y_col).

    Adds ``zval``/``zbucket``, directory-partitions by ``zbucket`` and
    range-sorts by ``zval`` within files — directory pruning across both
    dimensions plus row-group skipping inside each bucket. One repartition
    per write; file count per bucket stays 1 task's output (no small-files
    explosion).

    DOMAIN CONTRACT: both coordinates must already lie in [0, 2^Z_BITS).
    Values outside are rejected up front (one cheap agg) — silently
    masking them would alias distant points into the same cell and make
    ``read_box`` return wrong rows (e.g. x = 2^16 + 100 would satisfy a
    [100, 1500] box). Callers with wider/negative domains normalise first
    (shift/scale into the grid), which is also what fixes the bucket
    math — a mask never can.
    """
    lim = 1 << Z_BITS
    bad = df.filter(
        (F.col(x_col) < 0)
        | (F.col(x_col) >= lim)
        | (F.col(y_col) < 0)
        | (F.col(y_col) >= lim)
    ).count()
    if bad:
        raise ValueError(
            f"write_zordered: {bad} rows have {x_col}/{y_col} outside "
            f"[0, {lim}) — normalise coordinates into the grid first"
        )
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    out = (
        df.withColumn("zval", z_value_expr(x, y).cast("long"))
        .withColumn("zbucket", F.shiftright(F.col("zval"), BUCKET_SHIFT).cast("long"))
        .repartition(F.col("zbucket"))
        .sortWithinPartitions("zval")
    )
    out.write.mode(mode).partitionBy("zbucket").parquet(path)


def read_box(
    spark: SparkSession,
    path: str,
    x_col: str,
    y_col: str,
    x_lo: int,
    x_hi: int,
    y_lo: int,
    y_hi: int,
) -> DataFrame:
    """Box query over a Z-ordered table: bucket pruning + exact filter.

    The ``zbucket IN (...)`` predicate is a partition filter (directory
    pruning, visible as PartitionFilters in the plan); the exact x/y
    predicates then cut the false positives inside surviving buckets.
    Box bounds must respect the same [0, 2^Z_BITS) domain the writer
    enforces (checked here — a wrapped box would silently miss rows).
    """
    lim = 1 << Z_BITS
    if not (0 <= x_lo <= x_hi < lim and 0 <= y_lo <= y_hi < lim):
        raise ValueError(
            f"read_box: bounds must satisfy 0 <= lo <= hi < {lim} "
            f"(got x=[{x_lo}, {x_hi}], y=[{y_lo}, {y_hi}])"
        )
    buckets = zbuckets_for_box(x_lo, x_hi, y_lo, y_hi)
    return (
        spark.read.parquet(path)
        .filter(F.col("zbucket").isin(buckets))
        .filter(
            (F.col(x_col) >= x_lo)
            & (F.col(x_col) <= x_hi)
            & (F.col(y_col) >= y_lo)
            & (F.col(y_col) <= y_hi)
        )
    )
