"""Oracle-parity harness: replicate the driver's DuckDB comparison locally.

compare(): row count + column set + normalised value multiset, after
sorting columns by name (the driver's contract) and canonicalising types
(ints→int64, floats→float64 repr, timestamps→ISO, NULL sentinel).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import duckdb
import pandas as pd

from .sources.readers import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 4))
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)


def canon_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False, name=None):
        rows.append(tuple(_canon_cell(v) for v in row))
    return sorted(rows)


_INT_KINDS = {"i", "u"}


def _canon_dtype(dt) -> str:
    k = dt.kind
    if k in _INT_KINDS:
        return f"int{dt.itemsize * 8}"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "timestamp"
    return "object"


@dataclass
class CompareResult:
    ok: bool
    detail: str


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> CompareResult:
    sc, oc = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if sc != oc:
        return CompareResult(False, f"column mismatch: spark={sc} oracle={oc}")
    if len(spark_pdf) != len(oracle_pdf):
        return CompareResult(
            False, f"row count mismatch: spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
        )
    for c in sc:
        sd = _canon_dtype(spark_pdf[c].dtype)
        od = _canon_dtype(oracle_pdf[c].dtype)
        if sd != od:
            return CompareResult(
                False, f"dtype mismatch on {c}: spark={spark_pdf[c].dtype} oracle={oracle_pdf[c].dtype}"
            )
    srows, orows = canon_rows(spark_pdf), canon_rows(oracle_pdf)
    if srows != orows:
        diffs = [
            f"  spark={s} oracle={o}" for s, o in zip(srows, orows) if s != o
        ][:5]
        return CompareResult(False, "value mismatch (first diffs):\n" + "\n".join(diffs))
    return CompareResult(True, "ok")
