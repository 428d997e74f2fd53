"""SQL-dump sink (reference: DumpAnalysisDatabase, /root/reference/synth/etl.py:80-146).

Serialises every target table to a portable SQL file: CREATE TABLE DDL then
one INSERT per row in deterministic FK-topological table order, with the
reference's typed-literal rules (etl.py:98-128):

- bool           → TRUE / FALSE
- None           → null
- str            → single-quoted, embedded quotes doubled
- datetime/date  → quoted ISO string
- int/float      → plain
- anything else  → raise (fail-fast, etl.py:125-128)

Rows stream through ``toLocalIterator`` — the driver never materialises a
whole table.
"""

from __future__ import annotations

import datetime
import numbers
from typing import IO

from pyspark.sql import DataFrame

_SPARK_TO_SQL = {
    "long": "BIGINT",
    "bigint": "BIGINT",
    "int": "INTEGER",
    "integer": "INTEGER",
    "double": "DOUBLE",
    "float": "FLOAT",
    "string": "TEXT",
    "boolean": "BOOLEAN",
    "timestamp": "DATETIME",
    "date": "DATE",
}


def serialise(value) -> str:
    """One literal, reference rules (etl.py:98-128). Bool before Number —
    bool is a Number in Python, and the reference branches on bool first."""
    if value is None:
        return "null"
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, (datetime.datetime, datetime.date)):
        return "'{}'".format(str(value).replace("'", "''"))
    if isinstance(value, str):
        return "'{}'".format(value.replace("'", "''"))
    if isinstance(value, numbers.Number):
        return str(value)
    raise TypeError(f"Cannot serialise value of type {type(value)!r}: {value!r}")


def dump_table(name: str, df: DataFrame, out: IO[str]) -> int:
    """DDL + INSERTs for one table; returns row count written."""
    cols = df.schema.fields
    col_defs = ", ".join(
        f"`{f.name}` {_SPARK_TO_SQL.get(f.dataType.simpleString(), 'TEXT')}"
        for f in cols
    )
    out.write(f"DROP TABLE IF EXISTS `{name}`;\n")
    out.write(f"CREATE TABLE `{name}` ({col_defs});\n")
    col_list = ", ".join(f"`{f.name}`" for f in cols)
    n = 0
    for row in df.toLocalIterator():
        values = ", ".join(serialise(row[f.name]) for f in cols)
        out.write(f"INSERT INTO `{name}` ({col_list}) VALUES ({values});\n")
        n += 1
    return n


def dump_database(tables: dict[str, DataFrame], order: tuple[str, ...], path: str) -> dict[str, int]:
    """Serialise ``tables`` to ``path`` in the given deterministic order
    (etl.py:130-146); views are skipped like the reference's dump."""
    counts: dict[str, int] = {}
    with open(path, "w") as out:
        for name in order:
            if name in tables:
                counts[name] = dump_table(name, tables[name], out)
    return counts
