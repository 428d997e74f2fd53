"""Relational HyperLogLog: a distinct-count sketch with a deterministic,
engine-portable register construction.

Spark's own ``approx_count_distinct`` is HLL++ too, but its hash and
register layout are engine-internal — unverifiable against another engine.
This operator rebuilds the classic HLL (Flajolet et al. 2007) from md5, so
the DuckDB oracle computes the IDENTICAL registers and estimate and the
driver's hash gate can verify a *sketch* exactly:

- h           = first 8 md5 hex chars of the value → 32-bit integer
- bucket      = top 8 bits (m = 256 registers)
- w           = low 24 bits; rank = leading zeros in w + 1
              = 25 - bit_length(w)  (bit_length via length(bin(w)) — both
                engines render minimal binary strings), 25 if w = 0
- register[b] = max rank seen in bucket b
- raw         = alpha_256 · m² / Σ 2^-R_b   (empty registers contribute 2⁰)
- estimate    = m · ln(m / V)  if raw ≤ 2.5 m and V > 0 (linear-counting
                small-range correction, V = empty registers), else raw

Determinism across engines: Σ 2^-R_b is a sum of powers of two spanning
< 53 binary orders — EXACT in IEEE double regardless of summation order,
so Spark's partial-agg tree and DuckDB's serial sum produce the same bits;
alpha·m² is inlined as one double literal; ln differs across libms by ulps
(≪ the 4dp round). The 32-bit-hash large-range correction is omitted —
register saturation, not hash collision, is the binding limit here.

Scale: the sketch IS the scale story — per group the state is ≤ m registers
(map-side combine on (group, bucket) then (group)), constant memory at any
cardinality; mergeable across partitions/days by register-wise max, which
is what makes it a streaming/continuous-aggregate primitive. ~6.5 % typical
relative error at m = 256 (1.04/√m); the exact twin lives alongside it in
q71's output so the gate also documents the achieved error.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

HLL_BUCKET_BITS = 8
HLL_M = 1 << HLL_BUCKET_BITS            # 256 registers
_ALPHA_M2 = 47072.71267120224           # 0.7213/(1+1.079/256) * 256²


def hll_registers(
    df: DataFrame, group_cols: Sequence[str], value_col: str
) -> DataFrame:
    """(group_cols…, bucket, r): max-rank register per group and bucket."""
    h = F.conv(F.substring(F.md5(F.col(value_col).cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    bucket = (h / F.lit(1 << 24)).cast("long")  # top 8 of 32 bits
    w = h % F.lit(1 << 24)
    tagged = df.select(
        *group_cols, bucket.alias("bucket"), w.alias("w")
    ).withColumn(
        "rank",
        F.when(F.col("w") == 0, F.lit(25)).otherwise(
            F.lit(25) - F.length(F.bin("w"))
        ),
    )
    return tagged.groupBy(*group_cols, "bucket").agg(F.max("rank").alias("r"))


def hll_distinct(
    df: DataFrame, group_cols: Sequence[str], value_col: str
) -> DataFrame:
    """HLL distinct estimate per group: (group_cols…, hll_distinct)."""
    regs = hll_registers(df, group_cols, value_col)
    per_group = regs.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("r"))).alias("sum_obs"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    m = F.lit(float(HLL_M))
    zeros = m - F.col("n_obs")
    sum_inv = F.col("sum_obs") + zeros  # empty registers: 2⁰ each
    raw = F.lit(_ALPHA_M2) / sum_inv
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (zeros > 0), m * F.log(m / zeros)
    ).otherwise(raw)
    return per_group.select(
        *group_cols, F.round(est, 4).alias("hll_distinct")
    )
