"""Skew salting + bucketed co-located joins: result parity and the
physical-plan guarantees they exist to provide."""

from __future__ import annotations

import pyspark.sql.functions as F

from hoops_edge_database_etl_spark.operators.skew import salted_agg, salted_join
from hoops_edge_database_etl_spark.sources.io import write_bucketed
from tests.conftest import SF_DIR


def _rows(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(r[c] for c in cols) for r in df.collect()
    )


def test_salted_agg_matches_plain_agg(spark):
    """Salted two-phase aggregation is result-identical to the plain
    GROUP BY, including on a deliberately skewed key (90% one value)."""
    df = spark.createDataFrame(
        [(("hot" if i % 10 else f"cold{i}"), i, float(i % 7)) for i in range(1000)],
        "k string, v long, w double",
    )
    got = salted_agg(
        df,
        ["k"],
        {"s": ("sum", F.col("v")), "n": ("count", F.lit(1)), "mx": ("max", F.col("w"))},
        n_salts=8,
    )
    want = df.groupBy("k").agg(
        F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"), F.max("w").alias("mx")
    )
    assert _rows(got) == _rows(want)


def test_salted_agg_plan_is_two_phase(spark):
    """The salted plan must contain BOTH shuffles: one on (key, salt),
    one on key — that split is the whole point."""
    df = spark.range(100).select((F.col("id") % 3).alias("k"), F.col("id").alias("v"))
    plan = (
        salted_agg(df, ["k"], {"s": ("sum", F.col("v"))}, n_salts=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "__salt" in plan
    assert plan.count("Exchange hashpartitioning") == 2


def test_salted_join_matches_plain_join(spark):
    """Inner and left salted joins are row-identical to their unsalted
    forms, including unmatched left rows and duplicate right keys."""
    left = spark.createDataFrame(
        [(("hot" if i % 5 else f"k{i}"), i) for i in range(500)], "k string, v long"
    )
    right = spark.createDataFrame(
        [("hot", 1.0), ("hot", 2.0), ("k1", 3.0), ("absent", 9.0)], "k string, w double"
    )
    for how in ("inner", "left"):
        got = salted_join(left, right, ["k"], n_salts=4, how=how)
        want = left.join(right, ["k"], how)
        assert _rows(got) == _rows(want), how


def test_salted_join_rejects_right_and_full(spark):
    import pytest

    left = spark.range(1).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        salted_join(left, left, ["k"], how="full")


def test_bucketed_join_elides_exchange(spark, tmp_path):
    """Two tables bucketed identically on the join key must sort-merge
    join with ZERO Exchange operators — the pay-shuffle-once-at-write
    contract. Broadcast is disabled for the assertion so the plan can't
    sidestep the claim."""
    o = spark.createDataFrame(
        [(i, f"s{i % 7}") for i in range(200)], "k long, status string"
    )
    li = spark.createDataFrame(
        [(i % 200, float(i)) for i in range(600)], "k long, amt double"
    )
    write_bucketed(o, "t_orders_b", 4, ["k"], sort_cols=["k"])
    write_bucketed(li, "t_lines_b", 4, ["k"], sort_cols=["k"])
    try:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = (
                spark.table("t_lines_b")
                .join(spark.table("t_orders_b"), "k")
                .groupBy("status")
                .agg(F.sum("amt").alias("amt"))
            )
            assert joined.count() == 7
            plan = joined._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        assert "SortMergeJoin" in plan
        # the join itself must not shuffle; the only allowed Exchange is
        # the final groupBy on status (a different key)
        join_part = plan.split("SortMergeJoin", 1)[1]
        assert "Exchange" not in join_part, "bucketed join still shuffled"
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lines_b")


def test_grouped_kernel_agg_salted_matches_unsalted(spark):
    """grouped_kernel_agg with a salt merges to EXACTLY the unsalted
    kernel result on a deliberately skewed key (the q115/q116 pair's
    correctness core, minus the bench)."""
    import pandas as pd

    from hoops_edge_database_etl_spark.operators.skew import grouped_kernel_agg

    def kernel(pdf):
        v = pdf["v"].to_numpy()
        return pd.DataFrame(
            {"n": [int(len(v))], "s": [int(v.sum())], "ss": [int((v * v).sum())]}
        )

    df = spark.createDataFrame(
        [(("hot" if i % 10 else f"cold{i}"), i % 97) for i in range(2000)],
        "k string, v long",
    )
    salted = grouped_kernel_agg(df, ["k"], kernel, "n long, s long, ss long", n_salts=8)
    plain = grouped_kernel_agg(df, ["k"], kernel, "n long, s long, ss long")
    assert _rows(salted) == _rows(plain)
    # and both equal the JVM ground truth
    want = df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("ss"),
    )
    assert _rows(salted) == _rows(want)


def test_grouped_kernel_agg_rejects_salt_collision(spark):
    """An input already carrying __salt is rejected, not silently re-salted."""
    import pandas as pd
    import pytest as _pytest

    from hoops_edge_database_etl_spark.operators.skew import grouped_kernel_agg

    df = spark.range(10).select(
        (F.col("id") % 2).alias("k"), F.col("id").alias("v"), F.lit(0).alias("__salt")
    )
    with _pytest.raises(ValueError, match="__salt"):
        grouped_kernel_agg(
            df, ["k"], lambda p: pd.DataFrame({"n": [len(p)]}), "n long", n_salts=4
        )


def test_grouped_kernel_agg_hot_threshold_matches(spark):
    """Selective salting (hot_threshold) is result-identical to the
    unsalted run, both when the threshold fires and when nothing is hot."""
    import pandas as pd

    from hoops_edge_database_etl_spark.operators.skew import grouped_kernel_agg

    def kernel(pdf):
        v = pdf["v"].to_numpy()
        return pd.DataFrame({"n": [int(len(v))], "s": [int(v.sum())]})

    df = spark.createDataFrame(
        [(("hot" if i % 10 else f"cold{i}"), i % 97) for i in range(2000)],
        "k string, v long",
    )
    plain = _rows(grouped_kernel_agg(df, ["k"], kernel, "n long, s long"))
    fired = grouped_kernel_agg(
        df, ["k"], kernel, "n long, s long", n_salts=8, hot_threshold=100
    )
    cold = grouped_kernel_agg(
        df, ["k"], kernel, "n long, s long", n_salts=8, hot_threshold=10**9
    )
    assert _rows(fired) == plain
    assert _rows(cold) == plain
