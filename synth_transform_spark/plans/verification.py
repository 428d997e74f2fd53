"""Registry-wide verification-coverage inventory (the round-8 top_next).

The DuckDB oracle hash gate catches any divergence between the Spark
plan and the oracle SQL — but NOT a wrong formula both engines share
(SURVEY §5.2's trap class: the two sides are written by the same hand
from the same reading of the statistic). The only defense is an
INDEPENDENT recomputation: a test that rebuilds the number from raw
parquet with numpy / pure Python / a third algorithm and compares.

Round 8 proved the audit pattern on integer headroom (plans/headroom.py):
mechanical inventory + a test that fails new entries without coverage.
This module applies it to verification itself:

- :data:`SEMANTIC_MODULES` — test modules whose module contract (see
  each docstring) is semantic/independent verification: every
  ``REGISTRY["qNN_..."]`` reference inside one marks that query as
  independently recomputed. Plan-shape and lint modules (test_plans,
  test_oracle_parity, ...) deliberately do NOT count.
- :func:`independent_queries` — the mechanically extracted set.
- :func:`verification_tiers` — per-query tier:
  ``oracle+independent`` > ``oracle`` > ``rows-only+independent`` >
  ``rows-only``.
- :data:`WAIVERS` — stats-tagged (A12) queries running on the oracle
  gate alone, each with an explicit triage reason. tests/
  test_verification_inventory.py fails any A12 query that is neither
  independently recomputed nor waived — so a new statistical query
  cannot land with hash-gate-only verification silently — and fails any
  waiver that has since gained coverage (the list can only shrink).

The A12 tag is the statistics marker (SURVEY §2 A12 "summary stats");
it is where shared-formula risk concentrates. Non-A12 queries are
relational algebra whose oracle IS the independent twin (a join/filter
has no formula to mis-share beyond what the hash compares).
"""

from __future__ import annotations

import pathlib
import re

#: Test modules whose REGISTRY references are, by module contract,
#: independent semantic recomputations (docstring states it). Globs
#: allowed — future test_round*_math.py files join automatically.
SEMANTIC_MODULES: tuple[str, ...] = (
    "test_round*_math.py",  # from-parquet numpy/pure-python recomputation
    "test_round5_ops.py",  # semantic unit tests, ACF/EWMA/calibration algebra
    "test_stats_queries.py",  # naive-rank / pair-count literal recomputation
    "test_eval_queries.py",  # literal python recomputation, oracle-independent
    "test_corpus_dedup.py",  # constructed-corpus first-occurrence semantics
    "test_graph.py",  # pure-python union-find vs operators
    "test_sketches.py",  # HLL accuracy/determinism/mergeability
    "test_similarity.py",  # recall floors vs exact brute force
    "test_training_ops.py",  # bloom/CMS bounds, contamination on constructed inputs
    "test_temporal.py",  # naive pandas reference on randomized event sets
    "test_properties.py",  # hypothesis property tests on kernel algebra
    "test_sampling.py",  # proportionality + determinism
    "test_observability.py",  # literal recomputation of side-band metrics
    "test_bpe.py",  # reference BPE trainer vs distributed
    "test_seqprep.py",  # chunk/pack invariants on constructed docs
    "test_ml.py",  # accuracy floors, PCA vs numpy eigh
    "test_multimodal.py",  # deterministic kernels vs direct recomputation
    "test_linkage.py",  # Fellegi-Sunter scoring on constructed pairs
    "test_dedup_units.py",  # minhash/banding unit algebra
    "test_streaming.py",  # stream-vs-batch equivalence
    "test_functions.py",  # cleaning/date/doi goldens vs reference behavior
)

#: A12-tagged queries still verified by the oracle hash gate alone,
#: with the triage reason. Every removal is a backfilled test; the
#: inventory test forbids additions without a reason and deletions of
#: coverage. Grouped by triage class:
#:   COUNT-ALGEBRA — the statistic is counts/sums/shares whose formula
#:     is a one-liner the hash already pins bit-for-bit (no moment or
#:     rank transform to mis-share).
#:   ORDER-STAT — quantile/percentile selection; both engines run the
#:     same interpolation contract, pinned by tests elsewhere at the
#:     function level (q44's percentile tier) but not per-query.
#:   PLANNER — the output is a plan/advisor recommendation derived from
#:     counts (no statistical formula).
#:   FORMULA(low) — a one-line closed form over already-pinned inputs.
#: The FORMULA(med) BACKLOG class was emptied in round 9
#: (tests/test_round9_backfill2_math.py) — new med+ risks must get a
#: test, not a waiver.
WAIVERS: dict[str, str] = {
    # EMPTY since round 10: q195 (full pure-Python MinHash-LSH pipeline +
    # exact truth + P/R algebra) and q455 (unigram-LM flag, threshold, and
    # kappa recompute) moved to tests/test_round10_math.py. Every A12 query
    # now carries an independent recomputation; new entries require a
    # written triage reason AND will fail review — add the test instead.
}


_PKG_ROOT = pathlib.Path(__file__).resolve().parents[2]
# any registry name inside a semantic module counts — these modules
# exist to recompute queries, so a name reference IS a test driving
# that query (REGISTRY["..."], a runner helper, or a direct import of
# the query function)
_REF_RE = re.compile(r"\b(q[0-9]+_[0-9a-z_]+)\b")


def independent_queries(tests_dir: pathlib.Path | None = None) -> set[str]:
    """Query names referenced from a semantic test module."""
    tests = tests_dir or (_PKG_ROOT / "tests")
    names: set[str] = set()
    for pattern in SEMANTIC_MODULES:
        for f in tests.glob(pattern):
            names |= set(_REF_RE.findall(f.read_text()))
    return names


def verification_tiers(registry, tests_dir: pathlib.Path | None = None) -> dict[str, str]:
    """Per-query verification tier (see module docstring)."""
    indep = independent_queries(tests_dir)
    tiers = {}
    for name, q in registry.items():
        has_oracle = q.oracle is not None
        has_indep = name in indep
        tiers[name] = (
            "oracle+independent" if has_oracle and has_indep
            else "oracle" if has_oracle
            else "rows-only+independent" if has_indep
            else "rows-only"
        )
    return tiers


def stats_queries(registry) -> list[str]:
    """A12-tagged queries — where shared-formula risk concentrates."""
    return sorted(n for n, q in registry.items() if "A12" in q.tags)
