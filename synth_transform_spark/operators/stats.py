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
from pyspark.sql import DataFrame


def grouped_stats(df: DataFrame, key_cols: list[str], value_col: str) -> DataFrame:
    """count / mean / mode / sum / sample-stddev per key, reference semantics.

    Two chained aggregations, no join, no window: groupBy(key, value)
    counts each distinct value once, then groupBy(key) derives every
    statistic from the (value, count) pairs — count/sum/mean weighted,
    sample stddev algebraically (Σcv² − (Σcv)²/n)/(n−1), and the mode as
    ``max_by(value, (count, −value))`` giving the deterministic
    most-frequent-then-smallest tie-break in one aggregate.
    """
    v = F.col(value_col)
    vals = df.filter(v.isNotNull() & (v != 0))
    counts = vals.groupBy(*key_cols, value_col).agg(F.count(F.lit(1)).alias("_c"))
    c = F.col("_c")
    n = F.sum(c)
    s1 = F.sum(c * v)  # Σ c·v
    s2 = F.sum(c * v * v)  # Σ c·v²
    var_samp = (s2 - s1 * s1 / n) / (n - F.lit(1))
    return counts.groupBy(*key_cols).agg(
        n.cast("long").alias("n_scores"),
        F.round(s1 / n, 4).alias("mean_score"),
        F.round(s1, 4).alias("sum_score"),
        # stddev gate: ≥2 values else NULL (reference rule utils.py:198-199)
        F.when(n >= 2, F.round(F.sqrt(var_samp), 4)).alias("std_dev"),
        F.max_by(v, F.struct(c, (-v).alias("_neg"))).alias("mode_score"),
    )
