"""Range-join operator semantics: endpoint modes, bin independence,
error cases."""

from __future__ import annotations

import pytest

from hoops_edge_database_etl_spark.operators.rangejoin import range_join


def _pairs(df):
    return sorted((r["pid"], r["iid"]) for r in df.collect())


@pytest.fixture()
def data(spark):
    points = spark.createDataFrame(
        [(i, v) for i, v in enumerate([0, 5, 10, 15, 20, 25, 100])], "pid long, p long"
    )
    intervals = spark.createDataFrame(
        [(0, 0, 10), (1, 10, 20), (2, 18, 30), (3, 50, 60)], "iid long, lo long, hi long"
    )
    return points, intervals


def test_closed_modes(spark, data):
    points, intervals = data
    got = _pairs(range_join(points, intervals, "p", "lo", "hi", 7, closed="both"))
    # p=10 hits [0,10] and [10,20]; p=20 hits [10,20] and [18,30]
    assert got == [(0, 0), (1, 0), (2, 0), (2, 1), (3, 1), (4, 1), (4, 2), (5, 2)]
    left = _pairs(range_join(points, intervals, "p", "lo", "hi", 7, closed="left"))
    assert (2, 0) not in left and (4, 1) not in left  # hi endpoints excluded
    assert (2, 1) in left and (0, 0) in left


def test_bin_width_does_not_change_result(spark, data):
    points, intervals = data
    expect = _pairs(range_join(points, intervals, "p", "lo", "hi", 7))
    for w in (1, 3, 100):
        assert _pairs(range_join(points, intervals, "p", "lo", "hi", w)) == expect


def test_negative_axis_values(spark):
    """floor-division binning must stay consistent below zero."""
    points = spark.createDataFrame([(0, -8), (1, -1), (2, 3)], "pid long, p long")
    intervals = spark.createDataFrame([(0, -10, 0)], "iid long, lo long, hi long")
    assert _pairs(range_join(points, intervals, "p", "lo", "hi", 7)) == [
        (0, 0),
        (1, 0),
    ]


def test_rejects_bad_args(spark, data):
    points, intervals = data
    with pytest.raises(ValueError):
        range_join(points, intervals, "p", "lo", "hi", 0)
    with pytest.raises(ValueError):
        range_join(points, intervals, "p", "lo", "hi", 7, closed="open")
    with pytest.raises(ValueError):
        range_join(points, points, "p", "lo", "hi", 7)  # overlapping names
