"""Grouped statistics with the reference's evaluation-score semantics.

Reference: AggregateEvaluationScores (/root/reference/synth/etl.py:772-821)
and ScoreStats (/root/reference/synth/utils.py:156-199):

- "falsy" values are excluded — ``filter(None, data)`` drops NULL **and 0**
  (SURVEY.md §4.3 "ScoreStats falsy-filter semantics").
- mean/sum need ≥1 value, sample std-dev needs ≥2 values, else NULL.
- mode: the reference uses ``statistics.mode`` (unique mode or crash);
  here mode is deterministic — most frequent value, smallest value on ties —
  computed via count + row_number (portable to any engine, unlike F.mode
  whose tie-break is unspecified).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def grouped_stats(df: DataFrame, key_cols: list[str], value_col: str) -> DataFrame:
    """count / mean / mode / sum / sample-stddev per key, reference semantics.

    Two aggregations over the same shuffle key (stats + mode), joined — both
    are partial-agg friendly; no row explosion.
    """
    vals = df.filter(F.col(value_col).isNotNull() & (F.col(value_col) != 0))
    stats = vals.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_scores"),
        F.round(F.avg(value_col), 4).alias("mean_score"),
        F.round(F.sum(value_col), 4).alias("sum_score"),
        F.count(F.lit(1)).alias("_n2"),
        F.round(F.stddev_samp(value_col), 4).alias("_sd"),
    )
    # stddev gate: ≥2 values else NULL (stddev_samp already NULLs n=1, the
    # explicit gate documents the reference rule utils.py:198-199).
    stats = stats.withColumn(
        "std_dev", F.when(F.col("_n2") >= 2, F.col("_sd"))
    ).drop("_n2", "_sd")

    counts = vals.groupBy(*key_cols, value_col).agg(F.count(F.lit(1)).alias("_c"))
    w = Window.partitionBy(*key_cols).orderBy(F.desc("_c"), F.asc(value_col))
    mode = (
        counts.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(*key_cols, F.col(value_col).alias("mode_score"))
    )
    return stats.join(mode, key_cols)
