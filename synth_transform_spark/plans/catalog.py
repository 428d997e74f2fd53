"""Generated per-query catalog for COVERAGE.md (round-8 verdict #6).

COVERAGE.md's counts were already lint-synced to ``len(REGISTRY)``; the
per-query catalog itself was hand-grown narrative. This module emits it
FROM registry metadata — name, tags, oracle/bench flags, verification
tier (plans/verification.py), and whether SCALE.md mentions the query —
and tests/test_coverage_catalog.py asserts the committed section matches
byte-for-byte (the headroom-ledger sync trick), so the catalog cannot
drift from the code.
"""

from __future__ import annotations

import pathlib
import re

from .verification import verification_tiers

_ROOT = pathlib.Path(__file__).resolve().parents[2]

START = "<!-- query-catalog:start -->"
END = "<!-- query-catalog:end -->"


def _qnum(name: str) -> int:
    return int(re.match(r"q(\d+)", name).group(1))


def catalog_lines(registry, tests_dir: pathlib.Path | None = None) -> list[str]:
    tiers = verification_tiers(registry, tests_dir)
    scale_text = (_ROOT / "SCALE.md").read_text()
    # Scale mentions come in two shapes: full names (`q174_rolling_...`) and
    # bare zero-padded numbers (`(q132)`, `q08`). int-normalize the numeric
    # form but require >= 2 digits: prose convention zero-pads q01-q09, so
    # the only 1-digit `q8` tokens are the q471/q484 ledger's accumulator
    # VARIABLE, which previously leaked a spurious scale flag onto
    # q08_dim_denorm (round-9 advice).
    scale_names = set(re.findall(r"\bq\d+_[a-z0-9_]+", scale_text))
    scale_nums = {int(m) for m in re.findall(r"\bq(\d{2,})\b", scale_text)}
    scale_nums |= {_qnum(n) for n in scale_names}
    lines = []
    for name in sorted(registry, key=_qnum):
        q = registry[name]
        flags = [tiers[name]]
        if q.bench:
            flags.append("bench")
        if _qnum(name) in scale_nums:
            flags.append("scale")
        tags = ",".join(q.tags)
        lines.append(f"- `{name}` [{tags}] {'; '.join(flags)}")
    return lines


def render_section(registry, tests_dir: pathlib.Path | None = None) -> str:
    body = "\n".join(catalog_lines(registry, tests_dir))
    return (
        f"{START}\n"
        "## Per-query catalog (GENERATED — do not hand-edit)\n\n"
        "One line per registered query: name, tags, verification tier\n"
        "(oracle+independent > oracle > rows-only±independent — see\n"
        "plans/verification.py), bench-suite membership, and whether\n"
        "SCALE.md carries a posture mentioning the query. Regenerate with\n"
        "`python -m synth_transform_spark.plans.catalog`; the sync test\n"
        "fails on any drift.\n\n"
        f"{body}\n"
        f"{END}"
    )


def write_coverage_section() -> None:
    import synth_transform_spark.plans  # noqa: F401

    from .registry import REGISTRY

    cov = _ROOT / "COVERAGE.md"
    text = cov.read_text()
    section = render_section(REGISTRY)
    if START in text:
        text = re.sub(
            re.escape(START) + ".*?" + re.escape(END),
            lambda m: section,
            text,
            flags=re.S,
        )
    else:
        text = text.rstrip() + "\n\n" + section + "\n"
    cov.write_text(text)


if __name__ == "__main__":
    write_coverage_section()
    print("COVERAGE.md catalog regenerated")
