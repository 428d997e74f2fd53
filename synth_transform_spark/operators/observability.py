"""Side-band pipeline metrics via Spark's Observation API.

Production pipelines need per-stage row counts and violation counters
WITHOUT paying an extra action per metric: ``df.observe`` attaches
aggregate expressions to the existing plan, the JVM accumulates them
while the one real action (write / count) runs, and the driver reads the
result afterwards — zero additional scans, zero extra shuffles.

Reference parity: the reference pipeline reports per-step progress while
materialising each ETL step (reference synth/utils.py:213 task_message;
steps in synth/etl.py); here the per-stage counters ride the DataFrame
plan itself instead of issuing follow-up COUNT queries.

Scale posture: metrics are plain aggregate expressions evaluated inside
the job that already runs — map-side partials, one tiny driver-side
result. Safe at any input size by construction.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Observation


def dq_metrics(
    not_null: Sequence[str] = (),
    positive: Sequence[str] = (),
    extra: Mapping[str, Column] | None = None,
) -> dict[str, Column]:
    """Standard data-quality counter set: total rows, per-column null
    counts (``nulls_<col>``), per-column non-positive counts
    (``nonpos_<col>``), plus caller-supplied aggregate expressions."""
    m: dict[str, Column] = {"n_rows": F.count(F.lit(1))}
    for c in not_null:
        m[f"nulls_{c}"] = F.sum(F.col(c).isNull().cast("long"))
    for c in positive:
        m[f"nonpos_{c}"] = F.sum(
            (F.col(c).isNull() | (F.col(c) <= 0)).cast("long")
        )
    if extra:
        m.update(extra)
    return m


def observe_stage(
    df: DataFrame, name: str, metrics: Mapping[str, Column]
) -> tuple[DataFrame, Observation]:
    """Attach named side-band metrics to ``df``'s plan.

    Returns the observed frame (use it in place of ``df``) and the
    ``Observation`` handle; ``obs.get`` blocks until the first action on
    the observed frame completes, then yields ``{name: value}``.
    """
    obs = Observation(name)
    observed = df.observe(obs, *[c.alias(k) for k, c in metrics.items()])
    return observed, obs


def violations(metrics: Mapping[str, int | float]) -> dict[str, int]:
    """The non-zero violation counters from a collected metric dict
    (every key except the ``n_rows`` total)."""
    return {
        k: int(v)
        for k, v in metrics.items()
        if k != "n_rows" and v is not None and int(v) != 0
    }


def assert_clean(metrics: Mapping[str, int | float]) -> None:
    """Raise ``ValueError`` listing every non-zero violation counter —
    the post-action gate a write pipeline calls after ``obs.get``."""
    bad = violations(metrics)
    if bad:
        raise ValueError(f"data-quality violations: {bad}")
