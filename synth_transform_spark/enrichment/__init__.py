"""Enrichment layer: cache-table-backed external lookups.

The Spark re-expression of the reference's `synth update` surface
(/root/reference/synth/resources.py): network-derived results are staged
into key-value cache tables so the rebuild pipeline stays pure and
reproducible (SURVEY.md §3.2, §4.3 "non-determinism quarantine").
"""

from .http_stage import (  # noqa: F401
    TokenBucket,
    enrich_http,
    refresh_cache,
)
