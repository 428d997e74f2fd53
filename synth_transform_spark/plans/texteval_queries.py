"""Round-8 text-evaluation wave: corpus BLEU, Dunning log-likelihood
collocations, and a compression-ratio quality signal.

The reference's text processing is cleaning + name extraction
(/root/reference/synth/utils.py:69-106); these queries add the
corpus-evaluation layer a training-data pipeline reports on top: BLEU
between paired documents (the n-gram-overlap read used for near-dup /
paraphrase audits), Dunning's G^2 log-likelihood ratio for collocation
mining (the classic "which bigrams are real phrases" statistic, Dunning
CL 1993), and the zlib compression-ratio signal quality filters use to
flag boilerplate/repetitive documents (the Gopher/RefinedWeb-style
heuristic q401's rule set does not include because it needs a real
compressor).

Tokenization is the house whitespace split (q05); bigrams come from
array-lambda zips — NO per-doc window, so the plan stays one exploded
projection + keyed aggregates at any corpus size.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources.readers import load_table
from .registry import register

#: Spark/DuckDB token + bigram array expressions (identical semantics:
#: lowercase, whitespace split, empties dropped, 1-based index zip).
_SPARK_TOKS = "filter(split(lower(text), ' '), x -> x <> '')"
_DUCK_TOKS = "list_filter(string_split(lower(text), ' '), x -> x <> '')"
_SPARK_BIGRAMS = (
    "transform(sequence(1, size(toks) - 1),"
    " i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"
)
_DUCK_BIGRAMS = (
    "list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])"
)


# --------------------------------------------------------------------------
# q465 - corpus BLEU-2 between adjacent document pairs: candidate =
# even doc_id, reference = doc_id + 1, paired on doc_id // 2. Clipped
# unigram/bigram precisions + brevity penalty aggregated per candidate
# source — the n-gram-overlap score used to audit paraphrase/near-dup
# density (complementing q27/q32's set-similarity reads with the
# MT-style ordered-n-gram measure: BLEU counts each gram at most
# min(cand, ref) times).
# Parity: token/bigram counts, clipped-match sums, and lengths are
# exact integers; p1/p2/BP/BLEU are one double expression per source
# row. 4dp.
# Scale: pairing is a doc_id//2 keyed equi-join (1:1, never a window);
# gram joins shuffle on (pair, gram) — bounded by document length, and
# the clip join is per-pair local. One source-keyed rollup at the end.
# --------------------------------------------------------------------------
@register(
    "q465_corpus_bleu",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, source, doc_id // 2 AS p, doc_id % 2 AS role,
           {_DUCK_TOKS} AS toks
    FROM documents
),
grams AS (
    SELECT p, role, 1 AS n, UNNEST(toks) AS g FROM toks
    UNION ALL
    SELECT p, role, 2 AS n, UNNEST({_DUCK_BIGRAMS}) AS g FROM toks
),
gc AS (
    SELECT p, role, n, g, CAST(COUNT(*) AS BIGINT) AS c
    FROM grams GROUP BY p, role, n, g
),
clip AS (
    SELECT a.p, a.n, CAST(SUM(LEAST(a.c, b.c)) AS BIGINT) AS hits
    FROM gc a JOIN gc b ON b.p = a.p AND b.n = a.n AND b.g = a.g
    WHERE a.role = 0 AND b.role = 1
    GROUP BY a.p, a.n
),
tots AS (
    SELECT p, n, CAST(SUM(CASE WHEN role = 0 THEN c ELSE 0 END) AS BIGINT)
               AS cand,
           CAST(SUM(CASE WHEN role = 1 THEN c ELSE 0 END) AS BIGINT) AS ref
    FROM gc GROUP BY p, n
),
pairs AS (
    SELECT t.p, t.n, t.cand, t.ref, COALESCE(cl.hits, 0) AS hits
    FROM tots t LEFT JOIN clip cl ON cl.p = t.p AND cl.n = t.n
    WHERE t.cand > 0 AND t.ref > 0
),
src AS (
    SELECT doc_id // 2 AS p, source FROM documents WHERE doc_id % 2 = 0
),
agg AS (
    SELECT s.source,
           CAST(COUNT(DISTINCT pr.p) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN pr.n = 1 THEN pr.cand ELSE 0 END) AS BIGINT)
               AS cand_tokens,
           CAST(SUM(CASE WHEN pr.n = 1 THEN pr.ref ELSE 0 END) AS BIGINT)
               AS ref_tokens,
           CAST(SUM(CASE WHEN pr.n = 1 THEN pr.hits ELSE 0 END) AS BIGINT)
               AS hits1,
           CAST(SUM(CASE WHEN pr.n = 2 THEN pr.hits ELSE 0 END) AS BIGINT)
               AS hits2,
           CAST(SUM(CASE WHEN pr.n = 2 THEN pr.cand ELSE 0 END) AS BIGINT)
               AS cand2
    FROM pairs pr JOIN src s ON s.p = pr.p
    GROUP BY s.source
)
SELECT source, n_pairs, cand_tokens, ref_tokens,
       ROUND(CAST(hits1 AS DOUBLE) / cand_tokens, 4) AS p1,
       ROUND(CAST(hits2 AS DOUBLE) / cand2, 4) AS p2,
       ROUND(EXP(LEAST(0.0, 1.0 - CAST(ref_tokens AS DOUBLE) / cand_tokens))
             * SQRT((CAST(hits1 AS DOUBLE) / cand_tokens)
                    * (CAST(hits2 AS DOUBLE) / cand2)), 4) AS bleu2
FROM agg
ORDER BY source
""",
    tags=("text-eval", "A8", "F23"),
)
def q465_corpus_bleu(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus BLEU-2 between adjacent doc pairs, per candidate source:
    (source, n_pairs, cand_tokens, ref_tokens, p1, p2, bleu2)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        (F.col("doc_id") / 2).cast("long").alias("p"),
        (F.col("doc_id") % 2).alias("role"),
        F.expr(_SPARK_TOKS).alias("toks"),
    )
    uni = toks.select(
        "p", "role", F.lit(1).alias("n"), F.explode("toks").alias("g")
    )
    bi = toks.select(
        "p",
        "role",
        F.lit(2).alias("n"),
        F.explode(F.expr(_SPARK_BIGRAMS)).alias("g"),
    )
    gc = (
        uni.unionByName(bi)
        .groupBy("p", "role", "n", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    a = gc.filter(F.col("role") == 0).select(
        "p", "n", "g", F.col("c").alias("ca")
    )
    b = gc.filter(F.col("role") == 1).select(
        "p", "n", "g", F.col("c").alias("cb")
    )
    clip = (
        a.join(b, ["p", "n", "g"])
        .groupBy("p", "n")
        .agg(F.sum(F.least("ca", "cb")).alias("hits"))
    )
    tots = gc.groupBy("p", "n").agg(
        F.sum(F.when(F.col("role") == 0, F.col("c")).otherwise(0)).alias(
            "cand"
        ),
        F.sum(F.when(F.col("role") == 1, F.col("c")).otherwise(0)).alias(
            "ref"
        ),
    )
    pairs = (
        tots.join(clip, ["p", "n"], "left")
        .na.fill({"hits": 0})
        .filter((F.col("cand") > 0) & (F.col("ref") > 0))
    )
    src = docs.filter(F.col("doc_id") % 2 == 0).select(
        (F.col("doc_id") / 2).cast("long").alias("p"), "source"
    )
    agg = (
        pairs.join(src, "p")
        .groupBy("source")
        .agg(
            F.countDistinct("p").alias("n_pairs"),
            F.sum(F.when(F.col("n") == 1, F.col("cand")).otherwise(0)).alias(
                "cand_tokens"
            ),
            F.sum(F.when(F.col("n") == 1, F.col("ref")).otherwise(0)).alias(
                "ref_tokens"
            ),
            F.sum(F.when(F.col("n") == 1, F.col("hits")).otherwise(0)).alias(
                "hits1"
            ),
            F.sum(F.when(F.col("n") == 2, F.col("hits")).otherwise(0)).alias(
                "hits2"
            ),
            F.sum(F.when(F.col("n") == 2, F.col("cand")).otherwise(0)).alias(
                "cand2"
            ),
        )
    )
    p1 = F.col("hits1").cast("double") / F.col("cand_tokens")
    p2 = F.col("hits2").cast("double") / F.col("cand2")
    bp = F.exp(
        F.least(
            F.lit(0.0),
            1.0 - F.col("ref_tokens").cast("double") / F.col("cand_tokens"),
        )
    )
    return agg.select(
        "source",
        "n_pairs",
        "cand_tokens",
        "ref_tokens",
        F.round(p1, 4).alias("p1"),
        F.round(p2, 4).alias("p2"),
        F.round(bp * F.sqrt(p1 * p2), 4).alias("bleu2"),
    ).orderBy("source")


# --------------------------------------------------------------------------
# q466 - Dunning log-likelihood (G^2) collocation mining: for every
# corpus bigram, the 2x2 contingency (bigram vs its left/right marginal
# counts over all N bigram slots) scored with G^2 = 2 * sum O*ln(O/E) —
# the statistic of record for "is this a real phrase or chance
# co-occurrence" (Dunning 1993), robust where q102's PMI overweights
# rare pairs. Top 20 by G^2.
# Parity: all four cells are exact integer counts derived from one
# bigram aggregate + two marginal aggregates; each bigram's G^2 is the
# identical double expression (zero cells contribute 0 via CASE). 4dp,
# deterministic (g2 DESC, w1, w2) tie-break.
# Scale: one exploded bigram aggregate (map-side combined); marginals
# re-aggregate the bigram relation (vocab-bounded) and join back on
# vocab keys; TakeOrderedAndProject(20) ends the plan.
# --------------------------------------------------------------------------
def _g2_cell(k: str, e: str) -> str:
    return f"(CASE WHEN {k} > 0 THEN {k} * LN({k} / ({e})) ELSE 0.0 END)"


_G2_EXPR = (
    "2.0 * ("
    + " + ".join(
        [
            _g2_cell("k11", "CAST(c1 AS DOUBLE) * c2 / nb"),
            _g2_cell("k12", "CAST(c1 AS DOUBLE) * (nb - c2) / nb"),
            _g2_cell("k21", "CAST(nb - c1 AS DOUBLE) * c2 / nb"),
            _g2_cell("k22", "CAST(nb - c1 AS DOUBLE) * (nb - c2) / nb"),
        ]
    )
    + ")"
)


@register(
    "q466_dunning_g2",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
),
bg AS (
    SELECT STRING_SPLIT(b, ' ')[1] AS w1, STRING_SPLIT(b, ' ')[2] AS w2
    FROM (SELECT UNNEST({_DUCK_BIGRAMS}) AS b FROM toks) u
),
bc AS (
    SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM bg GROUP BY w1, w2
),
lm AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM bc GROUP BY w1),
rm AS (SELECT w2, CAST(SUM(c12) AS BIGINT) AS c2 FROM bc GROUP BY w2),
nn AS (SELECT CAST(SUM(c12) AS BIGINT) AS nb FROM bc),
cells AS (
    SELECT b.w1, b.w2, b.c12, l.c1, r.c2, n.nb,
           CAST(b.c12 AS DOUBLE) AS k11,
           CAST(l.c1 - b.c12 AS DOUBLE) AS k12,
           CAST(r.c2 - b.c12 AS DOUBLE) AS k21,
           CAST(n.nb - l.c1 - r.c2 + b.c12 AS DOUBLE) AS k22
    FROM bc b JOIN lm l ON l.w1 = b.w1 JOIN rm r ON r.w2 = b.w2
    CROSS JOIN nn n
)
SELECT w1, w2, c12, c1, c2, ROUND({_G2_EXPR}, 4) AS g2
FROM cells
ORDER BY {_G2_EXPR} DESC, w1, w2
LIMIT 20
""",
    tags=("text-eval", "A8", "A5"),
)
def q466_dunning_g2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 bigram collocations by Dunning's G^2:
    (w1, w2, c12, c1, c2, g2)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.expr(_SPARK_TOKS).alias("toks"))
    bg = toks.select(F.explode(F.expr(_SPARK_BIGRAMS)).alias("b")).select(
        F.split("b", " ").getItem(0).alias("w1"),
        F.split("b", " ").getItem(1).alias("w2"),
    )
    bc = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    lm = bc.groupBy("w1").agg(F.sum("c12").alias("c1"))
    rm = bc.groupBy("w2").agg(F.sum("c12").alias("c2"))
    nn = bc.agg(F.sum("c12").alias("nb"))
    cells = (
        bc.join(lm, "w1")
        .join(rm, "w2")
        .crossJoin(F.broadcast(nn))
        .selectExpr(
            "w1",
            "w2",
            "c12",
            "c1",
            "c2",
            "nb",
            "CAST(c12 AS DOUBLE) AS k11",
            "CAST(c1 - c12 AS DOUBLE) AS k12",
            "CAST(c2 - c12 AS DOUBLE) AS k21",
            "CAST(nb - c1 - c2 + c12 AS DOUBLE) AS k22",
        )
    )
    g2 = F.expr(_G2_EXPR)
    return (
        cells.select("w1", "w2", "c12", "c1", "c2", g2.alias("g2_raw"))
        .orderBy(F.col("g2_raw").desc(), "w1", "w2")
        .limit(20)
        .select(
            "w1", "w2", "c12", "c1", "c2", F.round("g2_raw", 4).alias("g2")
        )
    )


# --------------------------------------------------------------------------
# q467 - zlib compression-ratio quality signal: compressed_len/raw_len
# per document (level 6), rolled up per source with the share of
# suspiciously compressible docs (ratio < 0.4 — boilerplate/repetition).
# The quality heuristic production curation stacks (Gopher, RefinedWeb)
# run alongside rule sets like q401: a real DEFLATE pass catches
# repetition that length/stopword rules miss. Needs a real compressor,
# so this is a declared Arrow-batched mapInPandas stage (PYTHON_OK) —
# linear, no shuffle before the source rollup.
# No SQL oracle (DuckDB has no zlib): rows-only driver check; the exact
# per-doc ratios are pinned against direct python zlib in
# tests/test_texteval.py.
# Scale: one mapInPandas projection (Arrow batches, CPU-bound ~100 MB/s
# per core — the compressor IS the workload) + one source-keyed
# aggregate. Ratios frozen to 1e4 ints so the rollup is exact.
# --------------------------------------------------------------------------
def _zlib_ratios(batches):
    """mapInPandas kernel for q467: (source, r4 = round(1e4 * ratio)).

    Module-level so tests/test_round9_math.py can drive it directly with
    degenerate inputs the parquet fixtures don't contain."""
    import zlib

    import pandas as pd

    for pdf in batches:
        raw = pdf["text"].str.encode("utf-8")
        comp = raw.map(lambda b: len(zlib.compress(b, 6)))
        # clip length to >=1: an empty doc would divide to inf and
        # crash the int64 cast (round-8 advice). zlib's empty-input
        # overhead (8 bytes) then reads as r4=80000 — a maximally
        # incompressible signal, which is the right curation verdict
        # for a zero-content doc.
        yield pd.DataFrame(
            {
                "source": pdf["source"],
                # 1e4-frozen ratio: exact integer rollup downstream
                "r4": (
                    10000.0 * comp / raw.map(len).clip(lower=1)
                ).round().astype("int64"),
            }
        )


@register(
    "q467_zlib_quality",
    oracle=None,  # no compressor in SQL: rows-only + pinned unit tests
    tags=("quality", "text-eval", "F16"),
)
def q467_zlib_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source zlib compression-ratio profile: (source, n_docs,
    mean_ratio, pct_high_compress)."""
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    scored = docs.mapInPandas(_zlib_ratios, "source string, r4 long")
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.sum("r4").cast("double") / F.count(F.lit(1)) / 1e4, 4)
            .alias("mean_ratio"),
            F.round(
                F.sum((F.col("r4") < 4000).cast("long")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("pct_high_compress"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# q489 - ROUGE-L between the q465 document pairs: longest common
# subsequence computed DECLARATIVELY in both engines via the prefix-max
# form of the DP recurrence — row_i[j] = max(cand[1..j]) with cand[k] =
# max(row_{i-1}[k+1], row_{i-1}[k] + eq) — so each DP row is a pure
# array-lambda expression of the previous row with NO sequential
# within-row dependency. Spark folds rows with one higher-order
# ``aggregate`` (whole-stage JVM, no UDF); the DuckDB oracle iterates
# rows with a recursive CTE over the same algebra. ROUGE-L F1 (the
# summarization/near-dup eval of record) completes q465's BLEU with the
# order-preserving-subsequence read: BLEU counts clipped n-grams, LCS
# rewards long in-order overlap.
# Parity: LCS lengths are exact integers; per-pair F1 doubles are
# identical expressions frozen to round(1e8 * f1) before the per-source
# mean. 4dp.
# Scale: the 1:1 doc_id//2 pair join bounds rows; per-pair DP cost is
# O(min(L,120)^3) array ops with the 120-token cap (tunable), constant
# per pair at any corpus size. Recursion depth (oracle) = capped token
# count.
# TRUNCATION SEMANTICS (documented per round-8 verdict): _ROUGE_CAP
# SILENTLY CLIPS both sides to their first 120 tokens — LCS, precision
# and recall denominators (la/lb) all refer to the CLIPPED sequences,
# so a pair of long docs whose overlap lives past token 120 scores 0.
# Identical clipping on both engines keeps the gate exact; for
# full-document ROUGE raise the cap (cost grows as cap^3 per pair).
# Pinned by tests/test_round9_math.py::test_rouge_cap_truncates.
# --------------------------------------------------------------------------
_ROUGE_CAP = 120

_SPARK_LCS = f"""
element_at(
  aggregate(slice(a, 1, {_ROUGE_CAP}),
    transform(sequence(0, size(slice(b, 1, {_ROUGE_CAP}))),
              x -> CAST(0 AS BIGINT)),
    (r, w) -> concat(
      array(CAST(0 AS BIGINT)),
      transform(sequence(1, size(slice(b, 1, {_ROUGE_CAP}))), j ->
        array_max(transform(sequence(1, j), k ->
          greatest(element_at(r, k + 1),
                   element_at(r, k)
                   + IF(element_at(slice(b, 1, {_ROUGE_CAP}), k) = w,
                        1L, 0L))))))),
  size(slice(b, 1, {_ROUGE_CAP})) + 1)
"""


@register(
    "q489_rouge_l",
    oracle=f"""
WITH RECURSIVE toks AS (
    SELECT doc_id, source, doc_id // 2 AS p, doc_id % 2 AS role,
           ({_DUCK_TOKS})[1:{_ROUGE_CAP}] AS toks
    FROM documents
),
pairs AS (
    SELECT c.p, c.source, c.toks AS a, r.toks AS b
    FROM toks c JOIN toks r ON r.p = c.p AND r.role = 1
    WHERE c.role = 0 AND len(c.toks) > 0 AND len(r.toks) > 0
),
dp AS (
    SELECT p, source, a, b, 0 AS i,
           list_transform(range(0, len(b) + 1), x -> CAST(0 AS BIGINT)) AS r
    FROM pairs
    UNION ALL
    SELECT p, source, a, b, i + 1,
           list_prepend(CAST(0 AS BIGINT),
             list_transform(range(1, len(b) + 1), j ->
               list_max(list_transform(range(1, j + 1), k ->
                 greatest(r[k + 1], r[k] + CASE WHEN b[k] = a[i + 1]
                                                THEN 1 ELSE 0 END)))))
    FROM dp WHERE i < len(a)
),
scored AS (
    SELECT p, source, len(a) AS la, len(b) AS lb,
           r[len(b) + 1] AS lcs
    FROM dp WHERE i = len(a)
),
f1 AS (
    SELECT source, lcs,
           CAST(ROUND(100000000.0 * CASE WHEN lcs = 0 THEN 0.0
                ELSE 2.0 * (CAST(lcs AS DOUBLE) / la)
                     * (CAST(lcs AS DOUBLE) / lb)
                     / (CAST(lcs AS DOUBLE) / la
                        + CAST(lcs AS DOUBLE) / lb) END) AS BIGINT) AS f8
    FROM scored
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(lcs) AS BIGINT) AS total_lcs,
       ROUND(CAST(SUM(f8) AS DOUBLE) / COUNT(*) / 100000000.0, 4)
           AS mean_rouge_l_f1
FROM f1
GROUP BY source
ORDER BY source
""",
    tags=("text-eval", "A8", "F23"),
)
def q489_rouge_l(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-L F1 between adjacent doc pairs via a declarative LCS DP:
    (source, n_pairs, total_lcs, mean_rouge_l_f1)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        (F.col("doc_id") / 2).cast("long").alias("p"),
        (F.col("doc_id") % 2).alias("role"),
        F.expr(_SPARK_TOKS).alias("t"),
    )
    cand = toks.filter(
        (F.col("role") == 0) & (F.size("t") > 0)
    ).select("p", "source", F.col("t").alias("a"))
    ref = toks.filter(
        (F.col("role") == 1) & (F.size("t") > 0)
    ).select("p", F.col("t").alias("b"))
    pairs = cand.join(ref, "p")
    scored = pairs.select(
        "source",
        F.size(F.slice("a", 1, _ROUGE_CAP)).alias("la"),
        F.size(F.slice("b", 1, _ROUGE_CAP)).alias("lb"),
        F.expr(_SPARK_LCS).alias("lcs"),
    )
    lcs = F.col("lcs").cast("double")
    p = lcs / F.col("la")
    r = lcs / F.col("lb")
    f1 = scored.select(
        "source",
        "lcs",
        F.round(
            1e8
            * F.when(F.col("lcs") == 0, F.lit(0.0)).otherwise(
                2.0 * p * r / (p + r)
            )
        )
        .cast("long")
        .alias("f8"),
    )
    return (
        f1.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("lcs").alias("total_lcs"),
            F.round(
                F.sum("f8").cast("double") / F.count(F.lit(1)) / 1e8, 4
            ).alias("mean_rouge_l_f1"),
        )
        .orderBy("source")
    )
