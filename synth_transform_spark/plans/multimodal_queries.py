"""Multimodal-column queries (north-star: binary payloads + typed metadata).

The media table is derived deterministically from `documents`
(payload = UTF-8 bytes of text — pure ASCII in the driver data, so byte-level
Spark results equal char-level DuckDB oracles). Every stage's plumbing is
real (binary columns, Arrow batches, mapInPandas); only the codec boundary
is faked — see operators/multimodal.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators import multimodal
from ..sources.readers import load_table
from .registry import register

_FRAME_SIZE = 64
_STRIDE = 4


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.attach_media(load_table(spark, sf_dir, "documents"))


@register(
    "q34_media_manifest",
    oracle="""
SELECT doc_id,
       ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS media_type,
       CASE WHEN doc_id % 3 <> 1 THEN CAST(doc_id % 7 * 64 + 64 AS INT) END AS width,
       CASE WHEN doc_id % 3 <> 1 THEN CAST(doc_id % 5 * 64 + 64 AS INT) END AS height,
       CAST(OCTET_LENGTH(ENCODE(text)) AS INT) AS n_bytes,
       SHA256(text) AS content_sha256
FROM documents
""",
    tags=("multimodal-manifest", "S13-analogue"),
    bench=True,
)
def q34_media_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media inventory: metadata + size + content hash, all JVM-side."""
    return multimodal.media_manifest(_media(spark, sf_dir))


@register(
    "q35_frame_sample",
    oracle=f"""
WITH m AS (
    SELECT doc_id, OCTET_LENGTH(ENCODE(text)) AS n_bytes FROM documents
),
frames AS (
    SELECT doc_id, n_bytes,
           CAST(CEIL(n_bytes / {_FRAME_SIZE}.0) AS BIGINT) AS n_frames
    FROM m
)
SELECT doc_id,
       CAST((n_frames + {_STRIDE} - 1) // {_STRIDE} AS BIGINT) AS n_sampled,
       CAST(
         CASE WHEN (n_frames - 1) % {_STRIDE} = 0
              -- the final (possibly short) frame was sampled
              THEN ((n_frames + {_STRIDE} - 1) // {_STRIDE} - 1) * {_FRAME_SIZE}
                   + n_bytes - (n_frames - 1) * {_FRAME_SIZE}
              ELSE ((n_frames + {_STRIDE} - 1) // {_STRIDE}) * {_FRAME_SIZE}
         END AS BIGINT) AS bytes_sampled
FROM frames
""",
    tags=("multimodal-frames", "mapInPandas"),
)
def q35_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling rollup: the oracle recomputes the chunk math in closed
    form, cross-checking the mapInPandas slicing byte-for-byte."""
    frames = multimodal.sample_frames(_media(spark, sf_dir), _FRAME_SIZE, _STRIDE)
    return frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("frame_bytes").alias("bytes_sampled"),
    )


@register(
    "q36_byte_histogram",
    oracle="""
SELECT CAST(ASCII(ch) % 16 AS INT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT UNNEST(STRING_SPLIT_REGEX(text, '')) AS ch FROM documents)
WHERE ch <> ''
GROUP BY bucket
""",
    tags=("multimodal-features", "mapInPandas"),
    bench=True,
)
def q36_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide byte histogram from the numpy feature extractor; partial
    per-doc counts aggregate relationally after the Arrow stage."""
    hist = multimodal.byte_histogram(_media(spark, sf_dir), n_bins=16)
    return hist.groupBy("bucket").agg(F.sum("n").alias("n"))


@register(
    "q37_decoded_intensity",
    oracle="""
WITH chars AS (
    SELECT doc_id, ASCII(UNNEST(STRING_SPLIT_REGEX(text, ''))) AS b
    FROM documents
),
mean_i AS (
    SELECT doc_id, AVG(CAST(b AS DOUBLE)) AS mi FROM chars WHERE b IS NOT NULL GROUP BY doc_id
)
SELECT ['image','audio','video'][CAST(d.doc_id % 3 + 1 AS INT)] AS media_type,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(m.mi), 4) AS avg_intensity
FROM documents d JOIN mean_i m USING (doc_id)
GROUP BY media_type
""",
    tags=("multimodal-decode", "stubbed-codec"),
)
def q37_decoded_intensity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-media-type intensity rollup over the (fake) decode stage."""
    decoded = multimodal.decode_media(_media(spark, sf_dir))
    return decoded.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("mean_intensity"), 4).alias("avg_intensity"),
    )


@register(
    "q138_thumbnail_stats",
    # Exercises resize_images end to end: 8×8 nearest-neighbour thumbnails
    # of every image payload, then a byte-level rollup. The oracle replays
    # the exact resize kernel — out(r,c) = grid(⌊r·H/8⌋·W + ⌊c·W/8⌋ mod n)
    # over the text-byte grid — via a generate_series pixel lattice.
    oracle="""
WITH imgs AS (
    SELECT doc_id, text,
           CAST(doc_id % 7 * 64 + 64 AS INT) AS w_in,
           CAST(doc_id % 5 * 64 + 64 AS INT) AS h_in,
           OCTET_LENGTH(ENCODE(text)) AS n
    FROM documents WHERE doc_id % 3 = 0
),
px AS (
    SELECT i.doc_id,
           ASCII(SUBSTR(i.text,
                 CAST(((gr.r * i.h_in) // 8 * i.w_in
                       + (gc.c * i.w_in) // 8) % i.n AS INT) + 1, 1)) AS b
    FROM imgs i, GENERATE_SERIES(0, 7) AS gr(r), GENERATE_SERIES(0, 7) AS gc(c)
)
SELECT doc_id,
       CAST(64 AS BIGINT) AS thumb_bytes,
       ROUND(AVG(CAST(b AS DOUBLE)), 4) AS thumb_mean
FROM px GROUP BY doc_id
""",
    tags=("multimodal-resize", "mapInPandas"),
)
def q138_thumbnail_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8×8 thumbnails for every image payload via resize_images, rolled up
    to per-doc byte stats (JVM-side aggregate over the Arrow stage)."""
    imgs = _media(spark, sf_dir).filter(F.col("metadata.media_type") == "image")
    thumbs = multimodal.resize_images(imgs, width=8, height=8)
    # byte values JVM-side: hex the 64-byte payload once, then fold over
    # 2-char slices with conv(hex, 16, 10) — no Python touches the bytes
    # after the Arrow resize stage.
    hexed = F.hex("payload")
    byte_sum = F.aggregate(
        F.sequence(F.lit(1), F.octet_length("payload")),
        F.lit(0.0),
        lambda acc, i: acc
        + F.conv(F.substring(hexed, (i - 1) * 2 + 1, 2), 16, 10).cast("double"),
    )
    return thumbs.select(
        "doc_id",
        F.octet_length("payload").cast("long").alias("thumb_bytes"),
        F.round(byte_sum / F.octet_length("payload"), 4).alias("thumb_mean"),
    )


@register(
    "q140_audio_peaks",
    # Audio-modality analytics: frame the sample stream, power per frame,
    # loudest frame per doc. Frame energies are EXACT doubles (integer
    # squares / power-of-two divisor — see audio_frame_energy), so the
    # argmax with its frame_idx tie-break is engine-portable without any
    # rounding epsilon inside the comparison. The series cap (200) is
    # 20× the corpus max of 9 frames/doc (TESTDATA docs ≤ ~600 bytes);
    # the WHERE f < n_frames bound is the real frame count.
    oracle="""
WITH aud AS (
    SELECT doc_id, text, OCTET_LENGTH(ENCODE(text)) // 64 AS n_frames
    FROM documents WHERE doc_id % 3 = 1
),
px AS (
    SELECT a.doc_id, a.n_frames, CAST(gf.f AS INT) AS frame_idx,
           AVG(POWER(ASCII(SUBSTR(a.text, CAST(gf.f * 64 + gs.s AS INT) + 1, 1))
                     - 128.0, 2)) AS energy
    FROM aud a,
         GENERATE_SERIES(0, 200) AS gf(f),
         GENERATE_SERIES(0, 63) AS gs(s)
    WHERE gf.f < a.n_frames
    GROUP BY a.doc_id, a.n_frames, gf.f
)
SELECT doc_id, CAST(n_frames AS BIGINT) AS n_frames,
       frame_idx AS peak_frame, ROUND(energy, 4) AS peak_energy
FROM (
    SELECT doc_id, n_frames, frame_idx, energy,
           ROW_NUMBER() OVER (PARTITION BY doc_id
                              ORDER BY energy DESC, frame_idx ASC) AS rk
    FROM px) t
WHERE rk = 1
""",
    tags=("multimodal-audio", "mapInPandas"),
)
def q140_audio_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loudest 64-sample frame per audio doc: Arrow-batched framing +
    energy kernel, then a relational argmax (struct-max, frame_idx
    tie-break) — no Python after the feature stage."""
    aud = _media(spark, sf_dir).filter(F.col("metadata.media_type") == "audio")
    fr = multimodal.audio_frame_energy(aud, frame_size=64)
    best = fr.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.max(
            F.struct(
                F.col("energy"),
                (-F.col("frame_idx")).alias("ni"),
                F.col("frame_idx").alias("fi"),
            )
        ).alias("_m"),
    )
    return best.select(
        "doc_id",
        F.col("n_frames").cast("long").alias("n_frames"),
        F.col("_m.fi").alias("peak_frame"),
        F.round(F.col("_m.energy"), 4).alias("peak_energy"),
    )


_CUT_THRESHOLD_MILLI = 3000


@register(
    "q193_scene_changes",
    # Shot-boundary detection over the "video" payloads: per-frame integer
    # milli-mean intensity (sum*1000 div len — exact in both engines),
    # LAG-diff along the frame series, cut where |diff| > threshold. The
    # oracle recomputes the byte sums char-wise (ASCII payloads) so the
    # mapInPandas framing is cross-checked byte for byte.
    oracle=f"""
WITH chars AS (
    SELECT doc_id, ASCII(UNNEST(STRING_SPLIT_REGEX(text, ''))) AS bv,
           GENERATE_SUBSCRIPTS(STRING_SPLIT_REGEX(text, ''), 1) - 1 AS pos
    FROM documents WHERE doc_id % 3 = 2
),
frames AS (
    SELECT doc_id, pos // 64 AS frame_idx,
           CAST(SUM(bv) AS BIGINT) AS sum_b, CAST(COUNT(*) AS BIGINT) AS flen
    FROM chars GROUP BY doc_id, pos // 64
),
milli AS (
    SELECT doc_id, frame_idx, sum_b * 1000 // flen AS m FROM frames
),
diffs AS (
    SELECT doc_id, frame_idx, m,
           m - LAG(m) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS d
    FROM milli
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_frames,
       CAST(SUM(CASE WHEN ABS(d) > {_CUT_THRESHOLD_MILLI} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_cuts
FROM diffs GROUP BY doc_id
""",
    tags=("multimodal-features", "mapInPandas", "W2"),
)
def q193_scene_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-change counts per video: frame intensity series (Arrow pass,
    operators/multimodal.frame_intensities) → integer milli-mean → LAG
    diff over a per-doc window (bounded by frame count) → keyed rollup."""
    from pyspark.sql import Window

    media = _media(spark, sf_dir).filter(F.col("doc_id") % 3 == 2)
    frames = multimodal.frame_intensities(media, frame_size=64)
    milli = frames.withColumn("m", F.expr("sum_b * 1000L div flen"))
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    diffs = milli.withColumn("d", F.col("m") - F.lag("m").over(w))
    return diffs.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum(
            F.when(F.abs("d") > _CUT_THRESHOLD_MILLI, 1).otherwise(0)
        ).cast("long").alias("n_cuts"),
    )
