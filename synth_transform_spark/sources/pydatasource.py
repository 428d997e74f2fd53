"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API).

The S-family's extension point: when an input isn't parquet/JDBC/CSV, a
Python DataSource plugs a new format into ``spark.read.format(...)`` with
REAL partition planning — Spark asks ``partitions()`` once, then calls
``read(partition)`` once per task, so generation/ingest parallelises
across executors like any scan (no driver funnel, no RDD glue).

Two roles here:

- ``SyntheticEventsDataSource`` (format ``synthetic_events``): a
  deterministic event generator — md5-derived fields from the row id, so
  two reads (or two engines) produce identical rows. Used by tests as a
  stand-in for any "generate or fetch by range" source (the HTTP-page /
  API-cursor ingest shape: each InputPartition carries its id range).
- a batch ``writer()`` implementing the commit protocol: tasks write
  part files and return commit messages; ``commit()`` publishes a
  _SUCCESS manifest listing them — the sink contract (atomic-ish publish,
  abort discards) in miniature.

Public API only (pyspark.sql.datasource); no reference-repo analogue —
this is north-star source/sink surface.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
)
_TYPES = ("click", "view", "purchase", "signup", "error")
_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _h(i: int, salt: str) -> int:
    return int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:8], 16)


def synth_row(i: int):
    """Deterministic row i — pure function, shared by reader and tests."""
    return (
        i,
        _EPOCH + timedelta(seconds=_h(i, "ts") % 2_592_000),
        _h(i, "user") % 1000,
        _TYPES[_h(i, "type") % len(_TYPES)],
        round((_h(i, "value") % 100_000) / 1000.0, 3),
    )


@dataclass
class _RangePartition(InputPartition):
    start: int
    end: int


class _SyntheticReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 4))

    def partitions(self):
        per = (self.n_rows + self.n_parts - 1) // self.n_parts
        return [
            _RangePartition(lo, min(lo + per, self.n_rows))
            for lo in range(0, self.n_rows, per)
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield synth_row(i)


@dataclass
class _PartFile(WriterCommitMessage):
    path: str
    rows: int


class _CsvDirWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.path = options["path"]
        self.overwrite = overwrite

    def write(self, iterator):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        out = os.path.join(self.path, f"part-{pid:05d}.csv")
        n = 0
        with open(out, "w") as f:
            for row in iterator:
                f.write(",".join("" if v is None else str(v) for v in row) + "\n")
                n += 1
        return _PartFile(path=out, rows=n)

    def commit(self, messages):
        manifest = os.path.join(self.path, "_SUCCESS")
        with open(manifest, "w") as f:
            for m in messages:
                f.write(f"{m.path}\t{m.rows}\n")

    def abort(self, messages):
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _SyntheticReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        return _CsvDirWriter(self.options, overwrite)

    def simpleStreamReader(self, schema: StructType):
        return _SyntheticStreamReader(self.options)


# --- streaming reader: the same synthetic rows as a micro-batch stream ----

from pyspark.sql.datasource import SimpleDataSourceStreamReader  # noqa: E402


class _SyntheticStreamReader(SimpleDataSourceStreamReader):
    """Offset-managed micro-batch source: each batch advances the row
    cursor by ``rows_per_batch`` until ``rows`` is exhausted. Offsets are
    plain dicts ({"pos": n}) checkpointed by the engine — exactly the
    cursor-paging ingest contract (API page tokens, binlog positions)
    re-expressed through the public streaming DataSource API.

    ``read`` returns (rows, next_offset); on restart the engine replays
    from the last committed offset via ``readBetweenOffsets`` — the
    deterministic generator makes that replay exact, which is what gives
    the source end-to-end exactly-once WITH a replayable upstream.
    """

    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.per_batch = int(options.get("rows_per_batch", 100))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict):
        lo = int(start["pos"])
        hi = min(lo + self.per_batch, self.n_rows)
        # a LIST, not a generator: the rows ride to executors pickled
        return [synth_row(i) for i in range(lo, hi)], {"pos": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return [synth_row(i) for i in range(int(start["pos"]), int(end["pos"]))]
