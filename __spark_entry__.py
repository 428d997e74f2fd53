"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` expose the engine's declared query surface
from ``synth_transform_spark.plans`` (each entry is a SURVEY.md §2 operator
family bound to the driver tables; see the ``tags`` in the registry).
``entry()`` runs the flagship query — the reference's access-request rollup
shape (SURVEY.md §2.4 A2 / /root/reference/synth/etl.py:651-671) — at
sf0.001.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from synth_transform_spark.plans import oracle_sql_map, query_map
from synth_transform_spark.plans.relational import q02_multi_access_rollup


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q02_multi_access_rollup(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family from SURVEY.md §2."""
    return query_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for every SQL-expressible query."""
    return oracle_sql_map()
