"""transformWithStateInPandas operator (streaming/tws.py).

The runtime path needs `protobuf` (absent in this container) — the full
streaming run is skip-gated; the processor's state logic and the gate
behaviour are testable everywhere via an in-memory handle double.
"""

from __future__ import annotations

import pandas as pd
import pytest

from synth_transform_spark.streaming import tws


class _FakeValueState:
    def __init__(self):
        self._v = None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)


class _FakeMapState:
    def __init__(self):
        self._m = {}

    def updateValue(self, k, v):
        self._m[tuple(k)] = tuple(v)

    def keys(self):
        return iter(self._m.keys())


class _FakeHandle:
    def __init__(self):
        self.states = {}

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.states.setdefault(name, _FakeValueState())

    def getMapState(self, name, kschema, vschema, ttlDurationMs=None):
        return self.states.setdefault(name, _FakeMapState())


def _batch(values, types):
    return pd.DataFrame({"value": values, "event_type": types})


def test_processor_accumulates_across_batches():
    proc = tws.make_profile_processor()
    proc.init(_FakeHandle())
    [out1] = list(
        proc.handleInputRows((7,), iter([_batch([1.0, 2.0], ["a", "b"])]), None)
    )
    [out2] = list(
        proc.handleInputRows((7,), iter([_batch([4.0], ["a"])]), None)
    )
    assert out1.iloc[0].to_dict() == {
        "user_id": 7, "n_events": 2, "total_value": 3.0,
        "max_value": 2.0, "n_types": 2,
    }
    # second batch sees the first batch's state: counts grow, max updates,
    # the repeated type does NOT grow the distinct-type set
    assert out2.iloc[0].to_dict() == {
        "user_id": 7, "n_events": 3, "total_value": 7.0,
        "max_value": 4.0, "n_types": 2,
    }


def test_processor_state_is_commutative():
    """Final state is identical under reordered batches — the property that
    makes the operator micro-batch-boundary-proof."""
    batches = [_batch([5.0], ["x"]), _batch([1.0, 9.0], ["y", "x"])]
    finals = []
    for order in (batches, batches[::-1]):
        proc = tws.make_profile_processor()
        proc.init(_FakeHandle())
        out = None
        for b in order:
            [out] = list(proc.handleInputRows((1,), iter([b]), None))
        finals.append(out.iloc[0].to_dict())
    assert finals[0] == finals[1]


def test_gate_raises_without_protobuf(spark, monkeypatch):
    monkeypatch.setattr(tws, "protobuf_available", lambda: False)
    stream = spark.readStream.format("rate").load()
    with pytest.raises(tws.MissingProtobufError):
        tws.running_profile(stream)


@pytest.mark.skipif(
    not tws.protobuf_available(), reason="protobuf not installed in container"
)
def test_running_profile_end_to_end(spark):
    import pyspark.sql.functions as F

    from synth_transform_spark.sources.readers import load_table
    from synth_transform_spark.streaming import events as se

    stream = se.read_events_stream(spark, "/root/testdata/sf0.001")
    # rocksdb_state_store scopes the provider conf to this run (set at
    # query start, restored after termination) — the documented contract
    # for isolating running_profile's session-conf side effect.
    with tws.rocksdb_state_store(spark):
        out = se.run_available_now(
            tws.running_profile(stream), "tws_profile", output_mode="update"
        )
    final = out.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("total_value", "n_events").alias("total_value"),
    )
    batch = load_table(spark, "/root/testdata/sf0.001", "events")
    expected = batch.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )
    assert final.exceptAll(expected).count() == 0
    assert expected.exceptAll(final).count() == 0
