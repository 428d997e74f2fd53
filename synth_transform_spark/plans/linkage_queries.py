"""Entity-resolution queries: Fellegi–Sunter linkage + golden records.

The reference's identity matching is single-field fuzzy thresholds
(/root/reference/synth/resources.py:278,296,330 — ported exactly in q54);
these queries layer the probabilistic generalisation on top: blocked pair
scoring with per-field log-likelihood weights (q180), then survivorship —
clusters → one canonical merged record per entity (q181).

Both are fully deterministic (literal weights, exact levenshtein, argmax
with explicit tie-breaks) so the DuckDB oracle hash-matches; the cluster
step mirrors the Spark min-label fixpoint with a recursive reachability
CTE (same algebra as q63).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import linkage
from ..sources.readers import load_table
from .registry import register

_NA = linkage.NAME_W.agree
_ND = linkage.NAME_W.disagree
_BA = linkage.BAL_W.agree
_BD = linkage.BAL_W.disagree

#: Blocked pairs with per-field agreement flags and the summed FS score.
#: Blocking key (nation, segment) keeps this an equi-join in both engines.
_SCORED_PAIRS_CTE = f"""
fs_pairs AS (
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           CASE WHEN levenshtein(a.c_name, b.c_name) <= 2 THEN 1 ELSE 0 END AS name_agree,
           CASE WHEN ABS(a.c_acctbal - b.c_acctbal) < 100.0 THEN 1 ELSE 0 END AS bal_agree
    FROM customer a
    JOIN customer b
      ON a.c_nationkey = b.c_nationkey
     AND a.c_mktsegment = b.c_mktsegment
     AND a.c_custkey < b.c_custkey
),
fs_scored AS (
    SELECT id_a, id_b, name_agree, bal_agree,
           ROUND(CASE WHEN name_agree = 1 THEN {_NA!r} ELSE {_ND!r} END
               + CASE WHEN bal_agree = 1 THEN {_BA!r} ELSE {_BD!r} END, 4) AS score
    FROM fs_pairs
)
"""


@register(
    "q180_record_linkage",
    oracle=f"""
WITH {_SCORED_PAIRS_CTE}
SELECT id_a, id_b, name_agree, bal_agree, score,
       CASE WHEN score >= {linkage.MATCH_THRESHOLD!r} THEN 'match'
            WHEN score >= {linkage.POSSIBLE_THRESHOLD!r} THEN 'possible'
            ELSE 'non_match' END AS decision
FROM fs_scored
WHERE score >= {linkage.POSSIBLE_THRESHOLD!r}
""",
    tags=("linkage", "J13", "F15", "entity-resolution"),
)
def q180_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi–Sunter record linkage over (nation, segment)-blocked
    customer pairs: per-field agreement → summed log2(m/u) weights →
    match / possible decision. All comparisons are JVM expressions inside
    one blocked self-join (operators/linkage.py)."""
    customer = load_table(spark, sf_dir, "customer")
    return linkage.score_customer_pairs(customer)


@register(
    "q181_golden_records",
    oracle=f"""
WITH RECURSIVE {_SCORED_PAIRS_CTE},
matched AS (
    SELECT id_a, id_b FROM fs_scored WHERE score >= {linkage.MATCH_THRESHOLD!r}
),
edges AS (
    SELECT id_a AS s, id_b AS d FROM matched
    UNION
    SELECT id_b AS s, id_a AS d FROM matched
),
reach(s, d) AS (
    SELECT s, d FROM edges
    UNION
    SELECT r.s, e.d FROM reach r JOIN edges e ON e.s = r.d
),
lab AS (
    SELECT s AS custkey, LEAST(s, MIN(d)) AS entity_id FROM reach GROUP BY s
),
members AS (
    SELECT l.entity_id, c.c_custkey, c.c_name, c.c_acctbal, c.c_mktsegment
    FROM lab l JOIN customer c ON c.c_custkey = l.custkey
),
ranked AS (
    SELECT entity_id, c_name,
           ROW_NUMBER() OVER (
               PARTITION BY entity_id ORDER BY c_acctbal DESC, c_custkey ASC
           ) AS rn
    FROM members
),
merged AS (
    SELECT entity_id,
           COUNT(*) AS n_members,
           ROUND(MAX(c_acctbal), 4) AS max_acctbal,
           ROUND(SUM(c_acctbal), 4) AS total_acctbal,
           STRING_AGG(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments
    FROM members
    GROUP BY entity_id
)
SELECT m.entity_id, m.n_members, r.c_name AS canonical_name,
       m.max_acctbal, m.total_acctbal, m.segments
FROM merged m
JOIN ranked r ON r.entity_id = m.entity_id AND r.rn = 1
""",
    tags=("linkage", "survivorship", "A4", "U4"),
)
def q181_golden_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship: q180's match pairs → connected components → one golden
    record per entity (canonical name = argmax balance, merged numerics,
    segment roster). Iterative cluster step — builds jobs, not a lazy
    plan (operators/graph.py)."""
    customer = load_table(spark, sf_dir, "customer")
    import pyspark.sql.functions as F

    matched = (
        linkage.score_customer_pairs(customer)
        .filter(F.col("decision") == "match")
        .select("id_a", "id_b")
    )
    out = linkage.golden_records(customer, matched)
    return out.select(
        "entity_id",
        "n_members",
        "canonical_name",
        "max_acctbal",
        "total_acctbal",
        "segments",
    )


@register(
    "q236_reciprocal_best_match",
    oracle=f"""
WITH {_SCORED_PAIRS_CTE},
cand AS (
    SELECT id_a, id_b, score FROM fs_scored
    WHERE score >= {linkage.POSSIBLE_THRESHOLD!r}
),
directed AS (
    SELECT id_a AS src, id_b AS dst, score FROM cand
    UNION ALL
    SELECT id_b AS src, id_a AS dst, score FROM cand
),
best AS (
    SELECT src, dst, score,
           ROW_NUMBER() OVER (
               PARTITION BY src ORDER BY score DESC, dst ASC
           ) AS rn
    FROM directed
)
SELECT a.src AS id_a, a.dst AS id_b, ROUND(a.score, 4) AS score
FROM best a
JOIN best b ON b.src = a.dst AND b.dst = a.src AND b.rn = 1
WHERE a.rn = 1 AND a.src < a.dst
ORDER BY id_a, id_b
""",
    tags=("linkage", "J13", "W3", "entity-resolution"),
)
def q236_reciprocal_best_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-best-match pairs: among q180's possible-or-better scored
    pairs, keep (a, b) only when b is a's highest-scoring counterpart AND
    a is b's — the high-precision 1:1 linkage rule that survives when one
    record fuzzily resembles many. Argmax per side is a per-src window
    with (score desc, dst asc) tie-break; the mutual check is one
    key-mirrored self-join."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    customer = load_table(spark, sf_dir, "customer")
    cand = linkage.score_customer_pairs(customer).select(
        "id_a", "id_b", "score"
    )
    directed = cand.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst"), "score"
    ).unionByName(
        cand.select(
            F.col("id_b").alias("src"), F.col("id_a").alias("dst"), "score"
        )
    )
    w = Window.partitionBy("src").orderBy(F.desc("score"), F.asc("dst"))
    best = directed.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    mirror = best.select(
        F.col("src").alias("m_src"), F.col("dst").alias("m_dst")
    )
    return (
        best.join(
            mirror,
            (mirror["m_src"] == best["dst"]) & (mirror["m_dst"] == best["src"]),
        )
        .filter(F.col("src") < F.col("dst"))
        .select(
            F.col("src").alias("id_a"),
            F.col("dst").alias("id_b"),
            F.round("score", 4).alias("score"),
        )
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# q251 — banded exact edit-distance self-join over the distinct part-name
# vocabulary: catalog-normalisation fuzzy matching ("smalll ring" vs
# "small ring") next to q54's partial-ratio join (token-containment
# similarity) and q182's prefix-filter Jaccard (set similarity) — this one
# is CHARACTER-level edit distance with the Ed-Join length-band blocking,
# the remaining classic of the similarity-join family.
# Scale: dedup to DISTINCT names first (vocabulary-bounded, not
# corpus-bounded), then a bucket equi-join on len//(d+1) — levenshtein ≥
# |len diff| makes the 3-bucket probe provably complete; never all-pairs.
# The verify filter runs Spark's threshold-bounded levenshtein kernel.
# Occurrence counts rejoin per name via broadcast.
# Parity: edit distance is integer; DuckDB's levenshtein is the same
# unit-cost metric. No floats anywhere.
# ---------------------------------------------------------------------------
@register(
    "q251_edit_distance_join",
    oracle="""
WITH names AS (SELECT p_name, COUNT(*) AS n FROM part GROUP BY p_name),
pairs AS (
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
           CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b
    FROM names a JOIN names b
      ON a.p_name < b.p_name
     AND ABS(LENGTH(a.p_name) - LENGTH(b.p_name)) <= 2
)
SELECT name_a, name_b, dist, n_a, n_b
FROM pairs WHERE dist <= 2
ORDER BY name_a, name_b
""",
    tags=("J13", "fuzzy", "dedup-near"),
)
def q251_edit_distance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate part names at edit distance ≤ 2:
    (name_a, name_b, dist, n_a, n_b) — functions/fuzzy.levenshtein_band_pairs
    (length-banded, distinct-vocabulary blocking)."""
    import pyspark.sql.functions as F

    from ..functions import fuzzy

    part = load_table(spark, sf_dir, "part")
    pairs = fuzzy.levenshtein_band_pairs(part, "p_name", max_dist=2)
    counts = part.groupBy(F.col("p_name").alias("name")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        pairs.join(
            F.broadcast(counts.select(F.col("name").alias("name_a"), F.col("n").alias("n_a"))),
            "name_a",
        )
        .join(
            F.broadcast(counts.select(F.col("name").alias("name_b"), F.col("n").alias("n_b"))),
            "name_b",
        )
        .select("name_a", "name_b", "dist", "n_a", "n_b")
        .orderBy("name_a", "name_b")
    )


# ---------------------------------------------------------------------------
# q470 — Jaro-Winkler fuzzy-name join over the q180 blocking frame, with
# the similarity computed by TWO INDEPENDENT IMPLEMENTATIONS: the Spark
# side is a pure Catalyst higher-order-function expression
# (functions/fuzzy.py:jaro_winkler_expr — no Python, no UDF), the oracle
# side is DuckDB's built-in C++ jaro_winkler_similarity. A hash match
# here is a genuine cross-implementation validation of the whole greedy
# matching/transposition/prefix-boost algorithm, not a shared formula —
# the strongest correctness tier in the registry (the q54 partial_ratio
# family shares this property). Reference anchor: the reference's fuzzy
# identity matching (resources.py:278,296) is ratio-threshold based; JW
# is the industry-standard name-similarity alternative (J13/F15).
# Parity: identical doubles (property-fuzzed bitwise on random pairs);
# the 0.97 threshold and 4dp rounding are applied to the same values.
# Scale (round-9 refinement): candidates come from a NAME-DERIVED block
# — sorted-digit deletion-1 keys (operators/linkage.deletion_keys_sql)
# composed with the (nation, segment) equi-join — so block size is
# bounded by the name distribution, not corpus/125. Lossless for this
# band: JW >= 0.97 with the fixed 4-char prefix boost forces Jaro >=
# 0.95 => >= 17/18 matched chars => digit multisets differ by <= 1
# element => the sorted strings share a deletion-1 key (asserted
# against DuckDB's C++ JW in tests/test_linkage.py). The oracle keeps
# the plain (nation, segment) block — candidate-superset equivalence is
# exactly what the hash match proves. JW itself is O(len*window) JVM
# work per surviving candidate inside whole-stage codegen.
# ---------------------------------------------------------------------------
@register(
    "q470_jaro_winkler_join",
    oracle="""
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       ROUND(jaro_winkler_similarity(a.c_name, b.c_name), 4) AS jw
FROM customer a
JOIN customer b
  ON a.c_nationkey = b.c_nationkey
 AND a.c_mktsegment = b.c_mktsegment
 AND a.c_custkey < b.c_custkey
WHERE jaro_winkler_similarity(a.c_name, b.c_name) >= 0.97
ORDER BY id_a, id_b
""",
    tags=("linkage", "J13", "F15", "fuzzy"),
)
def q470_jaro_winkler_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked Jaro-Winkler name join (pure Catalyst HOF expression vs
    DuckDB's C++ builtin): (id_a, id_b, jw >= 0.97)."""
    import pyspark.sql.functions as F

    from ..functions.fuzzy import jaro_winkler_expr

    from ..operators.linkage import deletion_keys_sql

    customer = load_table(spark, sf_dir, "customer")
    keyed = customer.select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_mktsegment",
        F.explode(
            F.expr(deletion_keys_sql("c_name", k=1, sorted_multiset=True))
        ).alias("bk"),
    )
    a = keyed.select(
        F.col("c_custkey").alias("id_a"),
        F.col("c_name").alias("name_a"),
        F.col("c_nationkey").alias("nk"),
        F.col("c_mktsegment").alias("seg"),
        "bk",
    )
    b = keyed.select(
        F.col("c_custkey").alias("id_b"),
        F.col("c_name").alias("name_b"),
        F.col("c_nationkey").alias("nk"),
        F.col("c_mktsegment").alias("seg"),
        "bk",
    )
    jw = F.expr(jaro_winkler_expr("name_a", "name_b"))
    return (
        a.join(b, ["bk", "nk", "seg"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("jw_raw", jw)
        .filter(F.col("jw_raw") >= 0.97)
        .select("id_a", "id_b", F.round("jw_raw", 4).alias("jw"))
        .orderBy("id_a", "id_b")
    )
