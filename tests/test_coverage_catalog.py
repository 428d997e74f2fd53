"""COVERAGE.md per-query catalog must equal the registry-generated one
(round-8 verdict #6 — the headroom-ledger sync trick applied to the
coverage catalog). Static analysis only, no Spark session."""

from __future__ import annotations

import pathlib
import re

import synth_transform_spark.plans  # noqa: F401  (registers everything)
from synth_transform_spark.plans.catalog import END, START, render_section
from synth_transform_spark.plans.registry import REGISTRY

ROOT = pathlib.Path(__file__).resolve().parents[1]


def test_coverage_catalog_matches_registry():
    text = (ROOT / "COVERAGE.md").read_text()
    m = re.search(re.escape(START) + r".*?" + re.escape(END), text, re.S)
    assert m, "COVERAGE.md is missing the generated query-catalog section"
    want = render_section(REGISTRY, ROOT / "tests")
    assert m.group(0) == want, (
        "COVERAGE.md catalog drifted from the registry — regenerate with "
        "`python -m synth_transform_spark.plans.catalog`"
    )


def test_catalog_covers_every_query_once():
    text = (ROOT / "COVERAGE.md").read_text()
    m = re.search(re.escape(START) + r".*?" + re.escape(END), text, re.S)
    names = re.findall(r"^- `(q[0-9a-z_]+)`", m.group(0), re.M)
    assert sorted(names) == sorted(REGISTRY)
