"""Round-12 freeze of the LSH candidate-derivation spec (r11 verdict #7).

The candidate-derivation definition moved in rounds 10 (bucket-array
expansion) and 11 (exact-rational accepts; 60-bit band keys): it is now
FROZEN — see the CANDIDATE-DERIVATION SPEC block in operators/dedup.py.
LSH is lossy, so the candidate set IS semantics: the engine and the DuckDB
oracle CTE must derive bit-identical signatures and band keys, or the two
engines silently diverge on band collisions. These tests pin the two
derivations to each other so any future drift in EITHER source fails fast.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from synth_transform_spark.operators import dedup
from synth_transform_spark.plans.dedup_queries import _minhash_ctes
from synth_transform_spark.sources.readers import load_table

from conftest import SF_DIR


def test_band_pipeline_lockstep(spark, oracle_con):
    """Engine shingle→signature→band pipeline == oracle CTE, row for row.

    This is the full frozen derivation on real data: shingle_hash (8-hex
    truncation), the linear-permutation MinHash, and the 60-bit band_key
    (15-hex truncation of the banded md5) all have to agree for the sets
    to match — a drift in any one term shows up as a band_key mismatch.
    """
    docs = load_table(spark, SF_DIR, "documents")
    bands = dedup.lsh_bands(
        dedup.minhash_signatures_linear(dedup.shingle_arrays(docs))
    )
    eng = sorted(
        (r["doc_id"], r["band_id"], r["band_key"]) for r in bands.collect()
    )
    ora = sorted(
        map(
            tuple,
            oracle_con.execute(
                f"WITH {_minhash_ctes()} "
                "SELECT doc_id, band_id, band_key FROM bands"
            ).fetchall(),
        )
    )
    assert len(eng) > 0
    assert eng == ora


def test_md5_truncation_scalar_lockstep(spark, oracle_con):
    """The two hex-truncation idioms agree on adversarial scalar inputs.

    Engine: conv(substring(md5(s), 1, L), 16, 10) cast long.
    Oracle: CAST(('0x' || SUBSTR(MD5(s), 1, L))::UBIGINT AS BIGINT).
    Checked at L=15 (band_key, 60 bits) and L=8 (shingle_hash, 32 bits).
    """
    samples = [
        "",
        "a",
        "the quick brown fox",
        "123|456|789",
        "0|0|0",
        "ünïcode shingle",
        " leading space",
        "9999999999|1|0",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    eng = {
        row["s"]: row
        for row in df.select(
            "s",
            F.conv(F.substring(F.md5("s"), 1, 15), 16, 10).cast("long").alias("k60"),
            F.conv(F.substring(F.md5("s"), 1, 8), 16, 10).cast("long").alias("k32"),
        ).collect()
    }
    for s in samples:
        row = eng[s]
        o60, o32 = oracle_con.execute(
            "SELECT CAST(('0x' || SUBSTR(MD5(?), 1, 15))::UBIGINT AS BIGINT),"
            "       CAST(('0x' || SUBSTR(MD5(?), 1, 8))::UBIGINT AS BIGINT)",
            [s, s],
        ).fetchone()
        assert (row["k60"], row["k32"]) == (o60, o32), repr(s)
