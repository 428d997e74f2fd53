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
  on a blocking key (here (nation, segment)), never from a cross join.
  At 100 TB the block key cardinality bounds the reducer fan-in; skewed
  blocks (one giant city...) get the salted-join treatment from
  operators/skew.py, and multi-pass blocking (union of several keys) is a
  union of the same plan.
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


def score_customer_pairs(
    customer: DataFrame,
    name_max_lev: int = 2,
    bal_max_diff: float = 100.0,
) -> DataFrame:
    """Fellegi–Sunter pair scoring over (nation, segment)-blocked customers.

    Returns (id_a, id_b, name_agree, bal_agree, score, decision) for every
    blocked pair that is not an outright non-match (score ≥ 0) — emitting
    the full non-match set would be O(block²) noise nobody consumes.
    """
    cols = ["c_custkey", "c_name", "c_nationkey", "c_mktsegment", "c_acctbal"]
    a = customer.select([F.col(c).alias(f"a_{c}") for c in cols])
    b = customer.select([F.col(c).alias(f"b_{c}") for c in cols])
    pairs = a.join(
        b,
        on=[
            F.col("a_c_nationkey") == F.col("b_c_nationkey"),
            F.col("a_c_mktsegment") == F.col("b_c_mktsegment"),
            F.col("a_c_custkey") < F.col("b_c_custkey"),
        ],
    )
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
