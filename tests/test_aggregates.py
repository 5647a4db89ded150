"""Aggregate query oracle parity (SURVEY.md §2.4 A1–A14) + plan unit tests."""

from __future__ import annotations

import pytest

from tests.conftest import compare_query

AGG_QUERIES = [
    "q21_weighted_avg",
    "q22_mode_per_group",
    "q23_pearson_corr",
    "q24_error_metrics",
    "q25_group_having",
    "q26_rollup",
    "q27_anomaly_detection",
    "q28_conditional_mean_gap",
    "q29_null_profile",
    "q30_duplicate_stats",
]


@pytest.mark.parametrize("name", AGG_QUERIES)
def test_agg_query_matches_oracle(spark, duck, name):
    compare_query(spark, duck, name)


def test_null_profile_one_scan(spark):
    """The null profile must compute every column in a single aggregate, not
    one scan per column (the reference's loop, audit_lakehouse.py:213-224)."""
    from hoops_edge_database_etl_spark.plans.quality import null_profile

    df = spark.createDataFrame(
        [(1, None, "x"), (2, 5, None), (None, None, "z")], "a int, b int, c string"
    )
    rows = {r["col_name"]: (r["n_nulls"], r["n_rows"]) for r in null_profile(df).collect()}
    assert rows == {"a": (1, 3), "b": (2, 3), "c": (1, 3)}
    # exactly one Aggregate over the source — no unioned per-column scans
    plan = null_profile(df)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("logicalrdd") == 1


def test_duplicate_keys(spark):
    from hoops_edge_database_etl_spark.plans.quality import duplicate_keys

    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b"), (1, "a")], "k int, v string"
    )
    out = duplicate_keys(df, ["k", "v"]).collect()
    assert len(out) == 1 and out[0]["n_rows"] == 3
