"""Verification-coverage inventory enforcement (round-8 top_next).

The oracle hash gate cannot catch a wrong formula both engines share;
plans/verification.py inventories which queries carry an INDEPENDENT
recomputation test and which run on the hash gate alone. These tests
make the inventory binding: a new stats-tagged (A12) query cannot land
without either an independent-math test in a semantic module or an
explicit, reasoned waiver — and a waiver dies the moment coverage
arrives (the list can only shrink).

No Spark session needed — static analysis of the registry + test tree.
"""

from __future__ import annotations

import pathlib

import synth_transform_spark.plans  # noqa: F401  (registers everything)
from synth_transform_spark.plans.registry import REGISTRY
from synth_transform_spark.plans.verification import (
    SEMANTIC_MODULES,
    WAIVERS,
    independent_queries,
    stats_queries,
    verification_tiers,
)

TESTS = pathlib.Path(__file__).resolve().parent


def test_every_stats_query_verified_or_waived():
    indep = independent_queries(TESTS)
    gap = sorted(set(stats_queries(REGISTRY)) - indep - set(WAIVERS))
    assert not gap, (
        "A12-tagged queries with neither an independent-math test in a "
        "semantic module nor a WAIVERS entry (add the test — a waiver "
        f"needs a written triage reason): {gap}"
    )


def test_no_stale_waivers():
    indep = independent_queries(TESTS)
    stale = sorted(set(WAIVERS) & indep)
    assert not stale, (
        f"waivers whose query now has independent coverage — delete them: {stale}"
    )


def test_waivers_reference_real_stats_queries():
    a12 = set(stats_queries(REGISTRY))
    bad = sorted(set(WAIVERS) - a12)
    assert not bad, f"waivers for unknown/non-A12 queries: {bad}"
    empty = sorted(n for n, why in WAIVERS.items() if len(why) < 15)
    assert not empty, f"waivers without a substantive reason: {empty}"


def test_semantic_modules_all_exist():
    dead = [p for p in SEMANTIC_MODULES if not list(TESTS.glob(p))]
    assert not dead, f"SEMANTIC_MODULES globs matching no test file: {dead}"


def test_tier_floor():
    # ratchet: independent coverage must not regress below the round-9
    # close (272 independently recomputed queries; 177 of the 179 A12
    # set). The 2 remaining waivers are all rollups of operators whose
    # kernels are recomputed elsewhere (see WAIVERS) — no formula class
    # is waived at any risk level.
    tiers = verification_tiers(REGISTRY, TESTS)
    indep_n = sum(1 for t in tiers.values() if t.endswith("independent"))
    assert indep_n >= 272, f"independent coverage regressed: {indep_n} < 245"
    a12 = stats_queries(REGISTRY)
    a12_indep = sum(1 for q in a12 if tiers[q].endswith("independent"))
    assert a12_indep >= 177, (
        f"A12 independent count regressed: {a12_indep}/{len(a12)}"
    )


def test_rows_only_is_the_documented_set():
    # rows-only queries (no oracle) are a deliberate, enumerated design
    # decision — any new one must be added here consciously
    tiers = verification_tiers(REGISTRY, TESTS)
    rows_only = sorted(n for n, t in tiers.items() if t.startswith("rows-only"))
    assert rows_only == [
        "q214_svc_classifier",
        "q375_als_recommend",
        "q41_tfidf_classifier",
        "q467_zlib_quality",
        "q55_model_outliers",
    ]
