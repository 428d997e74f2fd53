"""The reference's `synth rebuild` pipeline, re-expressed as Spark DataFrame
transforms (SURVEY.md §3.1, §7.4).

Reference: /root/reference/synth/etl.py:25-58 — 15 ordered steps over four
identical source databases plus six supplementary resources, producing the
denormalised analysis schema. Here each step is a pure
DataFrame→DataFrame function; the cross-round "translator" mappings
(/root/reference/synth/utils.py:263-298) are mapping DataFrames consumed via
broadcast joins; per-row loops become joins/windows.
"""

from .context import PipelineContext
from .rebuild import rebuild

__all__ = ["PipelineContext", "rebuild"]
