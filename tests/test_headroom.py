"""Registry-wide integer-overflow headroom audit (the q456 silent-wrap class).

Spark's non-ANSI BIGINT SUM wraps on overflow while DuckDB promotes to
HUGEINT, so a frozen-integer moment sum that overflows at cluster scale
passes every small-SF parity gate and silently corrupts results at 100 TB.
q456 hit this for real (sum of kilo-dollar^2 residuals); round-7 review
flagged the same latent class in q447/q443/q436.

These tests make the class unrepresentable:

- every oracle whose SUM accumulates integers must carry a ledger entry
  (plans/headroom.py) declaring its worst-case |summand| and 100 TB row
  bound;
- entries dispositioned ``ok`` must prove the worst-case sum stays under
  2^62;
- entries dispositioned ``decimal38`` must genuinely exceed 2^62 (no
  stale promotions) and be listed in SCALE.md's generated
  "Integer-headroom ledger" section, which documents the DECIMAL(38,0)
  accumulator switch and its row threshold.

No Spark session needed — the audit is static analysis of oracle SQL,
which shares its arithmetic with the Spark plan by construction.
"""

from __future__ import annotations

import pathlib
import re

import synth_transform_spark.plans  # noqa: F401  (registers everything)
from synth_transform_spark.plans.headroom import (
    INT64_HEADROOM,
    LEDGER,
    flagged_queries,
    scale_md_lines,
)
from synth_transform_spark.plans.registry import REGISTRY

SCALE_MD = pathlib.Path(__file__).resolve().parents[1] / "SCALE.md"


def test_every_integer_sum_is_audited():
    flagged = flagged_queries(REGISTRY)
    missing = sorted(set(flagged) - set(LEDGER))
    assert not missing, (
        "integer-typed SUMs without a headroom ledger entry "
        f"(add to plans/headroom.py LEDGER): {missing}\n"
        + "\n".join(f"{q}: {flagged[q][:2]}" for q in missing)
    )


def test_no_stale_ledger_entries():
    # ``promoted`` entries are exempt by design: their accumulators moved
    # to DECIMAL(38)/HUGEINT, so the BIGINT-sum detector no longer fires,
    # but the entry stays as the audit trail of the closed risk.
    flagged = flagged_queries(REGISTRY)
    stale = sorted(
        q for q in set(LEDGER) - set(flagged)
        if not LEDGER[q].disposition.startswith("promoted")
    )
    assert not stale, f"ledger entries whose query no longer has integer sums: {stale}"


def test_promoted_entries_really_promoted():
    # a promoted entry whose oracle still has a BIGINT-accumulating SUM
    # is lying about the fix; and its bound must be a genuine >2^62 risk
    flagged = flagged_queries(REGISTRY)
    bad = [
        a.query
        for a in LEDGER.values()
        if a.disposition.startswith("promoted")
        and (a.query in flagged or a.bound <= INT64_HEADROOM)
    ]
    assert not bad, f"promoted entries still flagged or under-bounded: {bad}"


def test_ok_dispositions_fit_headroom():
    over = [
        f"{a.query}: bound {a.bound:.3g} > 2^62"
        for a in LEDGER.values()
        if a.disposition == "ok" and a.bound > INT64_HEADROOM
    ]
    assert not over, "\n".join(over)


def test_decimal38_dispositions_are_genuine():
    # a decimal38 entry that actually fits should be re-dispositioned ok,
    # otherwise the SCALE.md promotion list overstates the risk surface
    under = [
        f"{a.query}: bound {a.bound:.3g} <= 2^62 — re-disposition to ok"
        for a in LEDGER.values()
        if a.disposition == "decimal38" and a.bound <= INT64_HEADROOM
    ]
    assert not under, "\n".join(under)


def test_dispositions_are_known():
    bad = [
        a.query
        for a in LEDGER.values()
        if a.disposition not in ("ok", "decimal38", "promoted", "promoted (output)")
    ]
    assert not bad, bad


def test_scale_md_section_matches_ledger():
    text = SCALE_MD.read_text()
    m = re.search(
        r"<!-- headroom-ledger:start -->\n(.*?)<!-- headroom-ledger:end -->",
        text,
        re.S,
    )
    assert m, "SCALE.md is missing the generated headroom-ledger section markers"
    doc_lines = [ln for ln in m.group(1).strip().splitlines() if ln.startswith("- ")]
    want = scale_md_lines()
    assert doc_lines == want, (
        "SCALE.md Integer-headroom ledger drifted from plans/headroom.py — "
        "regenerate with scale_md_lines().\n"
        f"doc has {len(doc_lines)} rows, ledger wants {len(want)}"
    )
