"""snapshot_diff (operators/delta.py): keyed added/removed/changed deltas."""

from __future__ import annotations

from synth_transform_spark.operators.delta import snapshot_diff


def _diff(spark, old_rows, new_rows):
    schema = "k INT, a STRING, b DOUBLE"
    old = spark.createDataFrame(old_rows, schema)
    new = spark.createDataFrame(new_rows, schema)
    out = snapshot_diff(old, new, ["k"], ["a", "b"])
    return {r["k"]: r["status"] for r in out.collect()}


def test_added_removed_changed_unchanged(spark):
    got = _diff(
        spark,
        [(1, "x", 1.0), (2, "y", 2.0), (3, "z", 3.0)],
        [(2, "y", 2.0), (3, "z", 9.0), (4, "w", 4.0)],
    )
    # k=2 unchanged → dropped; k=1 removed, k=3 changed, k=4 added
    assert got == {1: "removed", 3: "changed", 4: "added"}


def test_null_is_distinct_from_literal_null_string(spark):
    # NULL → "null"-string transitions must register as changes (the \x00
    # sentinel encoding), and NULL → NULL as unchanged.
    got = _diff(
        spark,
        [(1, None, 1.0), (2, None, 2.0)],
        [(1, "null", 1.0), (2, None, 2.0)],
    )
    assert got == {1: "changed"}


def test_multi_column_key(spark):
    old = spark.createDataFrame([(1, "a", 10.0)], "k1 INT, k2 STRING, v DOUBLE")
    new = spark.createDataFrame(
        [(1, "a", 11.0), (1, "b", 5.0)], "k1 INT, k2 STRING, v DOUBLE"
    )
    out = snapshot_diff(old, new, ["k1", "k2"], ["v"])
    got = {(r["k1"], r["k2"]): r["status"] for r in out.collect()}
    assert got == {(1, "a"): "changed", (1, "b"): "added"}
