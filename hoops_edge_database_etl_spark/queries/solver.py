"""Registry entries for the iterative solver (rows-only — genuinely
non-SQL-expressible, SURVEY.md §2.5 W10/W11) and the normalize layer
(oracle-checked: its semantics ARE SQL — coalesce + try_cast + row_number)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from hoops_edge_database_etl_spark.queries import query
from hoops_edge_database_etl_spark.tables import load


@query("q53_iterative_ratings")  # no oracle: iterative fixed point (W10/W11)
def q53_iterative_ratings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-date SOS-adjusted rating snapshots over synthetic matchups
    derived from orders (team = custkey mod 20, opponent = clerk-derived,
    efficiency from totalprice folded into the [40,200] clamp window).

    The fixed point has league-average coupling per iteration, so there is
    no SQL equivalent — the driver records a rows-only check and the
    semantic invariants live in tests/test_ratings.py (winner ordering,
    emergent league mean, SOS reward, no-leakage snapshots)."""
    from hoops_edge_database_etl_spark.operators.ratings import ratings_per_date

    o = load(spark, sf_dir, "orders")
    games = (
        o.select(
            F.col("o_orderdate").alias("game_date"),
            (F.col("o_custkey") % 20).alias("team_id"),
            (F.col("o_orderkey") % 20).alias("opp_id"),
            (40.0 + F.pmod(F.col("o_totalprice"), F.lit(120.0))).alias("off_eff"),
            (F.col("o_orderkey") % 2 == 0).alias("is_home"),
        )
        .filter(F.col("team_id") != F.col("opp_id"))
    )
    bounds = games.agg(
        F.min("game_date").alias("lo"), F.max("game_date").alias("hi")
    ).collect()[0]
    lo, hi = bounds["lo"], bounds["hi"]
    span = (hi - lo).days
    rating_dates = [lo + __import__("datetime").timedelta(days=span * k // 4) for k in (1, 2, 3, 4)]
    return ratings_per_date(
        spark, games, rating_dates=rating_dates, half_life_days=90.0, hca=4.0
    )


@query(
    "q54_normalize_layer",
    oracle="""
    WITH messy AS (
      SELECT CAST(o_orderkey AS VARCHAR) AS orderId,
             CASE WHEN o_orderkey % 97 = 0 THEN 'bad'
                  ELSE CAST(o_custkey AS VARCHAR) || '.5' END AS totalPrice,
             CASE o_orderkey % 3 WHEN 0 THEN 'yes' WHEN 1 THEN 'false'
                  ELSE '1' END AS isPriority,
             o_orderkey % 1000 AS dup_key,
             o_orderkey AS arrival
      FROM orders
    ), conformed AS (
      SELECT TRY_CAST(orderId AS BIGINT) AS order_id,
             TRY_CAST(totalPrice AS DOUBLE) AS total_price,
             CASE WHEN lower(isPriority) IN ('true','1','yes','1.0') THEN TRUE
                  WHEN lower(isPriority) IN ('false','0','no','0.0') THEN FALSE
                  END AS is_priority,
             dup_key, arrival
      FROM messy
    )
    SELECT order_id, total_price, is_priority, CAST(dup_key AS BIGINT) AS dup_key
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY dup_key ORDER BY arrival) AS rn
      FROM conformed
    ) WHERE rn = 1
    """,
)
def q54_normalize_layer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The normalize layer end-to-end on a deliberately-messy projection of
    orders: camelCase aliases → snake_case, float-string/bool-string
    lenient casts (nulls on 'bad'), deterministic first-by-arrival PK
    dedup. This is the primitive every silver table passes through
    (SURVEY.md §7 step 2)."""
    from hoops_edge_database_etl_spark.normalize import TableSpec, normalize_records

    o = load(spark, sf_dir, "orders")
    messy = o.select(
        F.col("o_orderkey").cast("string").alias("orderId"),
        F.when(F.col("o_orderkey") % 97 == 0, "bad")
        .otherwise(F.concat(F.col("o_custkey").cast("string"), F.lit(".5")))
        .alias("totalPrice"),
        F.when(F.col("o_orderkey") % 3 == 0, "yes")
        .when(F.col("o_orderkey") % 3 == 1, "false")
        .otherwise("1")
        .alias("isPriority"),
        (F.col("o_orderkey") % 1000).alias("dup_key"),
        F.col("o_orderkey").alias("arrival"),
    )
    spec = TableSpec(
        name="q54_orders",
        primary_keys=("dup_key",),
        schema=StructType(
            [
                StructField("order_id", LongType()),
                StructField("total_price", DoubleType()),
                StructField("is_priority", BooleanType()),
                StructField("dup_key", LongType()),
            ]
        ),
        aliases={
            "order_id": ("orderId",),
            "total_price": ("totalPrice",),
            "is_priority": ("isPriority",),
        },
    )
    return normalize_records(messy, spec, order_col="arrival")
