"""synth_transform_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of ``NaturalHistoryMuseum/synth_transform`` (see /root/repo/SURVEY.md),
extended with large-scale training-data pipeline operators (dedup, similarity
search, text analysis, streaming) designed for 100 TB-scale execution.

Layers (SURVEY.md §7.1):

- ``session``    — SparkSession bootstrap tuned for the engine (AQE, UTC, Arrow).
- ``sources``    — readers/writers (parquet star schema, csv/json/excel/kv, dump).
- ``functions``  — scalar function library (cleaning, dates, DOI parsing, names).
- ``operators``  — reusable DataFrame→DataFrame operators (dedup, similarity,
                   text analysis, grouped stats, surrogate ids, windows).
- ``plans``      — declared queries: each is a (spark_fn, oracle_sql) pair bound
                   to the driver's TPC-H-ish tables; the correctness surface.
- ``streaming``  — Structured Streaming jobs over the ``events`` table.

Everything is built on the DataFrame API so Catalyst handles predicate pushdown,
column pruning, join selection and AQE; Python UDFs are avoided in hot paths.
"""

__version__ = "0.1.0"
