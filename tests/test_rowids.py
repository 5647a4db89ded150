"""operators/rowids.py unit tests: stable_row_ids (the zipWithIndex
replacement) and distributed_ntile (round 10 — the entity-rank
global-window conversion used by q166/q171/q209).

distributed_ntile's contract is EXACT equality with engine NTILE for a
total order, including the ceil-first bucket fill when n % k != 0 — the
property the oracles depend on (DuckDB fills buckets the same way)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window


def _base(spark, n):
    # a scrambled value column with a deterministic id tiebreak
    return spark.range(n).select((F.col("id") * 37 % n).alias("v"), "id")


def test_stable_row_ids_contiguous_and_ordered(spark):
    from hoops_edge_database_etl_spark.operators.rowids import stable_row_ids

    df = _base(spark, 257)
    out = stable_row_ids(df, [F.col("v").desc(), "id"], id_col="rid").collect()
    assert sorted(r["rid"] for r in out) == list(range(257))
    by_rid = sorted(out, key=lambda r: r["rid"])
    keys = [(-r["v"], r["id"]) for r in by_rid]
    assert keys == sorted(keys), "row ids do not follow the total order"


def test_distributed_ntile_matches_engine_ntile(spark):
    from hoops_edge_database_etl_spark.operators.rowids import distributed_ntile

    # n % k == 0, n % k != 0, n < k, n == 1 — every bucket-fill branch
    for n, k in [(100, 10), (7, 3), (3, 10), (1, 4), (1500, 10), (97, 5)]:
        df = _base(spark, n)
        order = [F.col("v").desc(), "id"]
        got = sorted(
            map(
                tuple,
                distributed_ntile(df, k, order, tile_col="t")
                .select("v", "id", "t")
                .collect(),
            )
        )
        exp = sorted(
            map(
                tuple,
                df.select(
                    "v", "id", F.ntile(k).over(Window.orderBy(*order)).alias("t")
                ).collect(),
            )
        )
        assert got == exp, f"NTILE mismatch at n={n} k={k}"


def test_distributed_ntile_plan_has_no_global_window(spark):
    """The point of the operator: no Window over an Exchange
    SinglePartition anywhere in its plan."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
        ),
    )
    from audit_global_window import global_window_heads

    from hoops_edge_database_etl_spark.operators.rowids import distributed_ntile

    df = _base(spark, 500)
    plan = (
        distributed_ntile(df, 10, [F.col("v").desc(), "id"], tile_col="t")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert global_window_heads(plan) == []
    assert "ntile(" not in plan