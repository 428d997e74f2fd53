"""Query registry.

Every declared query gets:
- a Spark implementation ``(spark, sf_dir) -> DataFrame``,
- an oracle: equivalent ANSI SQL for DuckDB over the same parquet views
  (``None`` only for genuinely non-SQL-expressible ops → weaker rows-only
  driver check),
- tags tying it back to SURVEY.md §2 operator ids,
- a ``bench`` flag marking the headline suite bench.py times.

Column-name contract: Spark results and oracle results must use identical
column names (the driver sorts columns by name before value-hashing).
All floating-point aggregates are rounded to 4dp on BOTH sides so summation
order (partitioned Spark vs single-node DuckDB) cannot flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    spark: SparkFn
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False


REGISTRY: dict[str, Query] = {}


def register(
    name: str, oracle: str | None, tags: tuple[str, ...] = (), bench: bool = False
) -> Callable[[SparkFn], SparkFn]:
    def deco(fn: SparkFn) -> SparkFn:
        # a silent overwrite would drop a query from the 400+-name
        # registry and only surface as count drift much later; a hard
        # raise (not assert) so `python -O` cannot strip the guard
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, spark=fn, oracle=oracle, tags=tags, bench=bench)
        return fn

    return deco


def query_map() -> dict[str, SparkFn]:
    return {name: q.spark for name, q in REGISTRY.items()}


def oracle_sql_map() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}


def bench_queries() -> dict[str, SparkFn]:
    return {name: q.spark for name, q in REGISTRY.items() if q.bench}
