"""Semantics tests for the CDC operators beyond the q101/q102 oracles:
the merge contract on edge inputs the star-schema derivation never hits."""

from __future__ import annotations

from hoops_edge_database_etl_spark.queries.cdc import scd2_apply


def test_scd2_edge_cases(spark):
    """Null-payload updates still close the current row; brand-new keys
    open at version 1; untouched keys pass through unchanged."""
    current = spark.createDataFrame(
        [(1, "a", 1, True), (2, "b", 1, True)],
        "k long, val string, version long, is_current boolean",
    )
    updates = spark.createDataFrame([(2, None), (3, "new")], "k long, val string")
    rows = {
        (r["k"], r["val"], r["version"], r["is_current"])
        for r in scd2_apply(current, updates, ["k"]).collect()
    }
    assert rows == {
        (1, "a", 1, True),
        (2, "b", 1, False),
        (2, None, 2, True),
        (3, "new", 1, True),
    }


def test_scd2_repeated_merge_increments_version(spark):
    """Applying a second batch to the merged output opens version 3 and
    closes version 2 — history keeps growing monotonically."""
    current = spark.createDataFrame(
        [(1, "a", 1, True)], "k long, val string, version long, is_current boolean"
    )
    v2 = scd2_apply(current, spark.createDataFrame([(1, "b")], "k long, val string"), ["k"])
    v3 = scd2_apply(v2, spark.createDataFrame([(1, "c")], "k long, val string"), ["k"])
    rows = {
        (r["k"], r["val"], r["version"], r["is_current"]) for r in v3.collect()
    }
    assert rows == {
        (1, "a", 1, False),
        (1, "b", 2, False),
        (1, "c", 3, True),
    }
