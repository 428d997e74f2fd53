"""Spark 4 `transformWithStateInPandas` stateful operator (gated).

The modern replacement for `applyInPandasWithState` (streaming/stateful.py):
a `StatefulProcessor` class with named, independently-typed state variables
(ValueState / ListState / MapState), optional TTL per variable, timers, and
an initial-state hook. The per-user running-profile processor below keeps

- ``agg``  (ValueState): (n_events, total_value, max_value) — the running
  numeric profile, updated commutatively so micro-batch boundaries and
  intra-batch row order cannot change the final state;
- ``types`` (MapState): the set of distinct event_types seen — MapState
  keys act as a set, sized O(distinct types per user), not O(events).

Emission: one row per (user, micro-batch) with the post-batch state — the
same "running totals in update mode" contract q57 pins for the legacy API,
so the two operators are drop-in comparable.

ENVIRONMENT GATE: the transformWithState Python worker talks to the JVM
state server over a protobuf protocol — it hard-imports ``google.protobuf``
at runner init. This container ships no protobuf, so the runtime path
raises ``MissingProtobufError`` early with a clear message instead of a
mid-query worker crash; the processor logic itself is plain pandas and is
exercised wherever protobuf exists (tests/test_streaming.py skips
otherwise). The legacy-API twin (q57) stays the driver-gate stateful query.

Scale: state is keyed by user_id → O(active users); RocksDB state store
(set in `running_profile`'s conf contract) spills cold keys off-heap, and
event-time TTL on ``agg`` would bound state for abandoned users — noted,
not set, because the bounded replay harness needs every key to survive to
the last batch.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import pandas as pd
from pyspark.sql import DataFrame

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.streaming.stateful_processor import StatefulProcessorHandle

OUTPUT_SCHEMA = (
    "user_id BIGINT, n_events BIGINT, total_value DOUBLE, "
    "max_value DOUBLE, n_types BIGINT"
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class MissingProtobufError(RuntimeError):
    """transformWithState needs `google.protobuf` for its state protocol."""


def protobuf_available() -> bool:
    try:  # pragma: no cover - trivial
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def make_profile_processor():
    """Build the per-user running-profile StatefulProcessor.

    Deferred import + class definition: `stateful_processor` imports fine
    without protobuf (only the runner needs it), but constructing the
    processor inside the factory keeps module import cheap and lets tests
    instantiate it directly for logic-level checks.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
    )

    class UserProfileProcessor(StatefulProcessor):
        def init(self, handle: "StatefulProcessorHandle") -> None:
            self._agg = handle.getValueState(
                "agg", "n BIGINT, total DOUBLE, mx DOUBLE"
            )
            self._types = handle.getMapState("types", "t STRING", "one INT")

        def handleInputRows(self, key, rows, timer_values):
            n, total, mx = self._agg.get() or (0, 0.0, float("-inf"))
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                mx = max(mx, float(pdf["value"].max()))
                for t in pdf["event_type"].unique():
                    self._types.updateValue((str(t),), (1,))
            self._agg.update((n, total, mx))
            n_types = sum(1 for _ in self._types.keys())
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 4)],
                    "max_value": [mx],
                    "n_types": [n_types],
                }
            )

        def close(self) -> None:
            pass

    return UserProfileProcessor()


from contextlib import contextmanager


@contextmanager
def rocksdb_state_store(spark):
    """Scope the RocksDB state-store provider to one streaming run: set the
    session conf on entry, restore the prior value (or unset) on exit. The
    conf is read when a streaming query STARTS, so callers must keep this
    scope open until the query terminates — exactly what the gated e2e
    harness does (start → awaitTermination → exit scope)."""
    key = "spark.sql.streaming.stateStore.providerClass"
    try:
        prior = spark.conf.get(key)
    except Exception:
        prior = None
    spark.conf.set(key, ROCKSDB_PROVIDER)
    try:
        yield
    finally:
        if prior is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prior)


def running_profile(stream: DataFrame) -> DataFrame:
    """Per-user running profile via transformWithStateInPandas (update mode).

    Raises MissingProtobufError up front when the protocol dependency is
    absent — callers fall back to streaming/stateful.running_user_totals
    (same emission contract, legacy API).

    SESSION-CONF SIDE EFFECT (documented contract): transformWithState is
    only supported on the RocksDB state store, and the provider conf is
    consumed at query START — after this builder returns. Setting it here
    therefore leaks to every later streaming query in the session. Callers
    that need isolation wrap the whole start→terminate span in
    ``rocksdb_state_store(spark)``, which restores the prior provider.
    """
    if not protobuf_available():
        raise MissingProtobufError(
            "transformWithStateInPandas requires the `protobuf` package for "
            "its Python<->JVM state protocol; use "
            "streaming.stateful.running_user_totals instead"
        )
    spark = stream.sparkSession
    # transformWithState is only supported on the RocksDB state store.
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
    return stream.groupBy("user_id").transformWithStateInPandas(
        make_profile_processor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
