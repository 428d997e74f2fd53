"""Probabilistic record linkage: Fellegi–Sunter scoring + survivorship.

The reference resolves fuzzy identity with single-field ratio thresholds
(`fuzz.partial_ratio >= 80` / `> 50`, /root/reference/synth/resources.py:278,
296, 330-331 — see functions/fuzzy.py for the exact port). Production entity
resolution generalises that to the Fellegi–Sunter model (Fellegi & Sunter,
JASA 1969): each field comparison contributes a log-likelihood *match weight*

    agree:    log2(m_i / u_i)
    disagree: log2((1 - m_i) / (1 - u_i))

where m_i = P(field agrees | same entity) and u_i = P(field agrees |
different entities). The summed score is thresholded into
match / possible / non_match — the classic three-way decision rule.

Spark-first shape:

- **Blocking** is the scale lever: candidate pairs come from an equi-join
  on a blocking key, never from a cross join. Round 8's verdict flagged
  the static (nation, segment) key — 125 cells, so within-block pairs
  grow as (N/125)^2 and salting redistributes a block without shrinking
  its pair set. Round 9 composes a NAME-DERIVED deletion-neighborhood
  key (FastSS, Bocek et al. 2007) into the block join: every record
  emits the strings obtained by deleting up to k characters from its
  name's digit tail, and two records are candidates only if they share
  a key (plus nation+segment). Two strings within levenshtein k ALWAYS
  share a depth-k deletion key, so the blocking is recall-lossless for
  the lev<=2 agreement band that every emitted pair must satisfy
  (name-disagree pairs cannot reach score >= 0: -4.29 + 3.0 < 0) —
  asserted empirically in tests/test_linkage.py. Block sizes are now
  bounded by the deletion-key collision distribution (near-duplicate
  neighborhoods), not by corpus size / 125.
- **Multiset variant** for the Jaro-Winkler >= 0.97 band (q470):
  JW >= 0.97 with the fixed 4-char prefix boost forces Jaro >= 0.95,
  hence >= 17 of 18 matched chars, hence digit MULTISETS differing by
  at most one element (transpositions don't change the multiset) — so
  sorted-digit deletion-1 keys are lossless there (10 keys/record).
- **Comparisons stay JVM-side**: levenshtein + abs-difference are built-in
  expressions, so the whole score is whole-stage-codegen'd; no Python.
- **Survivorship** consumes the match pairs: connected components
  (operators/graph.py — min-label propagation) then one argmax pass picks
  the canonical record per entity cluster and merges fields by rule
  (max balance, membership roster, roll-up totals).

Determinism: weights are literals, levenshtein is exact, the canonical
member is argmax(acctbal) tie-broken by min custkey — every step is
DuckDB-expressible and both engines hash-match.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .graph import connected_components


@dataclass(frozen=True)
class FieldWeight:
    """One field's Fellegi–Sunter m/u priors (as log2 agree/disagree weights)."""

    m: float
    u: float

    @property
    def agree(self) -> float:
        return math.log2(self.m / self.u)

    @property
    def disagree(self) -> float:
        return math.log2((1.0 - self.m) / (1.0 - self.u))


#: Priors for the customer-linkage demo: names are near-identifying
#: (levenshtein ≤ 2 on the padded key), balances weakly corroborate.
NAME_W = FieldWeight(m=0.95, u=0.02)
BAL_W = FieldWeight(m=0.80, u=0.10)

#: Three-way decision thresholds on the summed log2 score.
MATCH_THRESHOLD = 5.0
POSSIBLE_THRESHOLD = 0.0


def deletion_keys_sql(name_expr: str, k: int = 2, sorted_multiset: bool = False) -> str:
    """SQL expression: array of FastSS deletion-neighborhood blocking keys.

    Base string = the digit tail of ``name_expr`` (non-digits stripped —
    this corpus's names are a literal prefix + zero-padded id, and
    lev(P+a, P+b) = lev(a, b) for a shared prefix P). Keys = all strings
    reachable by deleting up to ``k`` characters (plus the base itself):
    two strings within levenshtein ``k`` always share one. With
    ``sorted_multiset`` the base is first canonicalised to its sorted
    character multiset — lossless for multiset-difference <= k bands
    (the JW >= 0.97 case), 10x fewer keys than sequence depth 2.

    Degenerate names (no digits) collapse to the empty-string key: one
    full block — degraded to the pre-round-9 bound but never lossy.
    All JVM-side (regexp/split/transform/substring); no Python.

    Round 12 (the ``_gram_expr`` binding, SQL edition): the base string is
    bound ONCE through a single-element ``transform`` lambda. ``del1``
    references its input ~2L+4 times (length, array, and two substrings
    per deletion position), and higher-order lambdas evaluate interpreted
    with no common-subexpression elimination — inlining the
    ``regexp_replace`` text at each site re-ran the regexp ~20× per row
    (the q180 suite's per-row hot spot). A lambda-variable reference is a
    plain slot read. The emitted key arrays are byte-identical (same
    expressions over the same bound value, same array_union order).
    """
    base = f"regexp_replace({name_expr}, '[^0-9]', '')"
    if sorted_multiset:
        base = f"concat_ws('', array_sort(split({base}, '')))"

    def del1(e: str) -> str:
        # guard length 0: sequence(1, 0) DESCENDS in Spark (never empty)
        return (
            f"CASE WHEN length({e}) = 0 THEN array({e}) "
            f"ELSE array_union(array({e}), "
            f"transform(sequence(1, length({e})), i -> "
            f"concat(substring({e}, 1, i - 1), substring({e}, i + 1, 64)))) END"
        )

    keys = f"element_at(transform(array({base}), b0 -> {del1('b0')}), 1)"
    for _ in range(k - 1):
        keys = f"array_distinct(flatten(transform({keys}, x -> {del1('x')})))"
    return keys


def score_customer_pairs(
    customer: DataFrame,
    name_max_lev: int = 2,
    bal_max_diff: float = 100.0,
) -> DataFrame:
    """Fellegi–Sunter pair scoring over name-blocked customers.

    Candidates = pairs sharing a depth-2 deletion key of the name digit
    tail AND (nation, segment) — recall-lossless for the lev<=2 name
    band every emitted pair satisfies (see module docstring), with block
    size bounded by the name distribution. Returns (id_a, id_b,
    name_agree, bal_agree, score, decision) for every candidate that is
    not an outright non-match (score ≥ 0) — emitting the full non-match
    set would be O(block²) noise nobody consumes.
    """
    # Round 11: the block self-join used to carry every compared field on
    # both sides, so each multiply-shared blocking key duplicated the full
    # payload and the pair dropDuplicates shuffled ~4× the bytes it needed.
    # Candidates are now generated NARROW — (custkey, bk, nation, segment)
    # only — deduped as bare id pairs, and the compared fields re-attach
    # via two equi-joins on the unique customer key (guide §2.3: shuffle
    # keys and metadata, attach payloads once).
    from ..caching import persist_tracked
    from ..sources.readers import ensure_parallelism

    # persisted: both self-join sides consume it — without the barrier the
    # deletion-key expansion (the per-row hot spot here) runs once per
    # side, i.e. the corpus is scanned and expanded twice. A small parquet
    # scan is also ONE task, so the expansion ran on one core until the
    # ensure_parallelism below (1.52 s single-task at sf0.1; no-op at real
    # data scale where the scan is already split). Round 11 used an eager
    # localCheckpoint; with the expansion parallel the serialize-now job
    # costs more than it saves (A/B best-of-4 at sf0.1: checkpoint 2.35 s,
    # lazy persist 2.13 s, none 2.21 s) and its GC-sensitive barrier was
    # the documented suite-position straggler — lazy persist keeps the
    # one-evaluation semantics without the extra job.
    keyed = persist_tracked(
        ensure_parallelism(customer).select(
            "c_custkey",
            "c_nationkey",
            "c_mktsegment",
            F.explode(
                F.expr(deletion_keys_sql("c_name", k=name_max_lev))
            ).alias("bk"),
        ),
    )
    a = keyed.select(
        F.col("c_custkey").alias("a_c_custkey"),
        F.col("c_nationkey").alias("a_c_nationkey"),
        F.col("c_mktsegment").alias("a_c_mktsegment"),
        F.col("bk").alias("a_bk"),
    )
    b = keyed.select(
        F.col("c_custkey").alias("b_c_custkey"),
        F.col("c_nationkey").alias("b_c_nationkey"),
        F.col("c_mktsegment").alias("b_c_mktsegment"),
        F.col("bk").alias("b_bk"),
    )
    id_pairs = (
        a.join(
            b,
            on=[
                F.col("a_bk") == F.col("b_bk"),
                F.col("a_c_nationkey") == F.col("b_c_nationkey"),
                F.col("a_c_mktsegment") == F.col("b_c_mktsegment"),
                F.col("a_c_custkey") < F.col("b_c_custkey"),
            ],
        )
        .select("a_c_custkey", "b_c_custkey")
        .dropDuplicates(["a_c_custkey", "b_c_custkey"])
    )
    attrs_a = customer.select(
        F.col("c_custkey").alias("a_c_custkey"),
        F.col("c_name").alias("a_c_name"),
        F.col("c_acctbal").alias("a_c_acctbal"),
    )
    attrs_b = customer.select(
        F.col("c_custkey").alias("b_c_custkey"),
        F.col("c_name").alias("b_c_name"),
        F.col("c_acctbal").alias("b_c_acctbal"),
    )
    pairs = id_pairs.join(attrs_a, "a_c_custkey").join(attrs_b, "b_c_custkey")
    name_agree = F.levenshtein("a_c_name", "b_c_name") <= name_max_lev
    bal_agree = F.abs(F.col("a_c_acctbal") - F.col("b_c_acctbal")) < bal_max_diff
    score = F.round(
        F.when(name_agree, F.lit(NAME_W.agree)).otherwise(F.lit(NAME_W.disagree))
        + F.when(bal_agree, F.lit(BAL_W.agree)).otherwise(F.lit(BAL_W.disagree)),
        4,
    )
    decision = (
        F.when(score >= MATCH_THRESHOLD, F.lit("match"))
        .when(score >= POSSIBLE_THRESHOLD, F.lit("possible"))
        .otherwise(F.lit("non_match"))
    )
    return (
        pairs.select(
            F.col("a_c_custkey").alias("id_a"),
            F.col("b_c_custkey").alias("id_b"),
            name_agree.cast("int").alias("name_agree"),
            bal_agree.cast("int").alias("bal_agree"),
            score.alias("score"),
            decision.alias("decision"),
        )
        .filter(F.col("decision") != "non_match")
    )


def golden_records(customer: DataFrame, match_pairs: DataFrame) -> DataFrame:
    """Survivorship: matched pairs → entity clusters → one golden record.

    Per cluster: canonical name = the member with the max account balance
    (ties: min custkey — argmax via one max_by with a packed tie-break),
    plus roster size and merged numerics. The cluster pass is iterative
    (connected components); the merge is a single groupBy.
    """
    cc = connected_components(match_pairs, "id_a", "id_b")
    members = customer.join(
        cc, customer["c_custkey"] == cc["node"], "inner"
    ).select(
        F.col("component").alias("entity_id"),
        "c_custkey",
        "c_name",
        "c_acctbal",
        "c_mktsegment",
    )
    # argmax(acctbal, tie min custkey): max_by over a struct orders by
    # (acctbal, -custkey) lexicographically — both engines agree because
    # the struct comparison is field-by-field.
    return members.groupBy("entity_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.expr(
            "max_by(c_name, struct(c_acctbal, -c_custkey))"
        ).alias("canonical_name"),
        F.round(F.max("c_acctbal"), 4).alias("max_acctbal"),
        F.round(F.sum("c_acctbal"), 4).alias("total_acctbal"),
        F.array_join(F.array_sort(F.collect_set("c_mktsegment")), ",").alias(
            "segments"
        ),
    )
