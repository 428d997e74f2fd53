"""Declared queries: the engine's correctness + bench surface.

Importing this package registers every query into ``registry.REGISTRY``.
Each query is a (spark_fn, oracle_sql) pair — the oracle is the ANSI-SQL
twin the DuckDB harness runs on the same parquet tables.
"""

from . import (  # noqa: F401
    abtest_queries,
    analytics_queries,
    corpus_dedup_queries,
    curation_queries,
    dedup_queries,
    eval_queries,
    events_queries,
    forecast_queries,
    incremental_queries,
    inference_queries,
    linkage_queries,
    multimodal_queries,
    nested_queries,
    nonparam2_queries,
    nonparam_queries,
    payload_queries,
    pipeline_parity_queries,
    relational,
    sequence_queries,
    similarity_queries,
    star_queries,
    stats_queries,
    streaming_queries,
    subquery_queries,
    temporal_queries,
    texteval_queries,
    textops,
    timeseries_queries,
    tpch_queries,
    training_queries,
)
from .registry import REGISTRY, Query, bench_queries, oracle_sql_map, query_map

__all__ = [
    "REGISTRY",
    "Query",
    "bench_queries",
    "oracle_sql_map",
    "query_map",
]
