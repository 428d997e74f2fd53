"""Deterministic weighted sampling (A-Res / Efraimidis-Spirakis).

Weighted reservoir sampling without replacement: each row gets key
u^(1/w) for uniform u ∈ (0,1]; the k largest keys per stratum are the
sample, and P(row sampled) is proportional to weight w. A training-data
pipeline uses this to sample documents proportional to a quality score
while keeping the draw reproducible across runs and engines.

Determinism: u is md5-derived — u = (h + 1) / 2³², h the first 8 md5 hex
chars of the row id — so the "randomness" is a pure function of the data
and the DuckDB oracle reproduces the identical sample. Ranking compares
ln(u)/w (monotone in u^(1/w)); ln differs across libms by ulps, far below
the spacing of distinct md5-derived keys, and ties break on the id.

Scale: the per-stratum top-k is a window row_number — one shuffle on the
stratum key, per-group sort. For few huge strata use the q23-style
two-phase shard top-k (local top-k per (stratum, shard), re-rank
survivors); for the common many-strata case the plain window is the right
plan and AQE splits skewed strata.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def weighted_sample(
    df: DataFrame,
    stratum_cols: list[str],
    id_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """k rows per stratum, inclusion probability ∝ ``weight_col`` (> 0).

    Returns the input columns plus ``sample_rank`` (1-based, by descending
    A-Res key — rank 1 is the strongest draw).
    """
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    u = (h + F.lit(1)) / F.lit(float(1 << 32))  # (0, 1], exact rational
    key = F.log(u) / F.col(weight_col)
    w = Window.partitionBy(*stratum_cols).orderBy(
        key.desc(), F.col(id_col)
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= k)
    )
