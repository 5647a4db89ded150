"""Data-layout operators: Z-order (Morton) clustering and the
min/max-stats block skipping it buys — the physical-design lever that
decides how much of 100 TB a 2-D predicate actually reads (Delta/Iceberg
OPTIMIZE ZORDER; the reference's Athena partition-projection tuning,
infra/glue_tables.tf, is the 1-D special case).

Everything is exact integer arithmetic (bit interleave via div/mod by
powers of two), so DuckDB replays the layout decision bit-for-bit.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hoops_edge_database_etl_spark.queries import query
from hoops_edge_database_etl_spark.tables import load

Z_BITS = 8          # per-dimension resolution (x, y in 0..255)
Z_BLOCK_DIV = 256   # rows group into z >> 8 blocks (256 z-prefix "files")
BOX = (64, 127, 64, 127)  # the 2-D predicate: x in [64,127], y in [64,127]


def _interleave_sql(xcol: str, ycol: str) -> str:
    """Morton code as pure div/mod/multiply — valid in Spark SQL and
    DuckDB alike (no engine-specific bit operators)."""
    terms = []
    for i in range(Z_BITS):
        terms.append(f"(({xcol} % {1 << (i + 1)}) // {1 << i}) * {1 << (2 * i)}")
        terms.append(f"(({ycol} % {1 << (i + 1)}) // {1 << i}) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


_SPARK_Z = _interleave_sql("x", "y").replace("//", "div")
_DUCK_Z = _interleave_sql("x", "y")

_X1, _X2, _Y1, _Y2 = BOX
_PRED = f"(x BETWEEN {_X1} AND {_X2} AND y BETWEEN {_Y1} AND {_Y2})"
_OVERLAP = (
    f"NOT (max_x < {_X1} OR min_x > {_X2} OR max_y < {_Y1} OR min_y > {_Y2})"
)


@query(
    "q133_zorder_skipping",
    oracle=f"""
    WITH mx AS (
      SELECT MAX(o_custkey) AS mxx,
             MAX(CAST(floor(o_totalprice) AS BIGINT)) AS mxy
      FROM orders
    ),
    enc AS (
      SELECT (o_custkey * 256) // (mx.mxx + 1) AS x,
             (CAST(floor(o_totalprice) AS BIGINT) * 256) // (mx.mxy + 1) AS y
      FROM orders, mx
    ),
    z AS (SELECT x, y, ({_DUCK_Z}) AS zv FROM enc),
    blocks AS (
      SELECT 'zorder' AS layout, zv // {Z_BLOCK_DIV} AS block,
             COUNT(*) AS n, MIN(x) AS min_x, MAX(x) AS max_x,
             MIN(y) AS min_y, MAX(y) AS max_y,
             SUM(CASE WHEN {_PRED} THEN 1 ELSE 0 END) AS matched
      FROM z GROUP BY 1, 2
      UNION ALL
      SELECT 'linear_x', x, COUNT(*), MIN(x), MAX(x), MIN(y), MAX(y),
             SUM(CASE WHEN {_PRED} THEN 1 ELSE 0 END)
      FROM z GROUP BY 1, 2
    )
    SELECT layout,
           CAST(COUNT(*) AS BIGINT) AS n_blocks,
           CAST(SUM(CASE WHEN {_OVERLAP} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_blocks_scanned,
           CAST(SUM(CASE WHEN {_OVERLAP} THEN n ELSE 0 END) AS BIGINT)
             AS rows_scanned,
           CAST(SUM(matched) AS BIGINT) AS rows_matched
    FROM blocks GROUP BY layout
    """,
)
def q133_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering evaluated by what it exists for — BLOCK
    SKIPPING under a 2-D predicate: orders are encoded to an
    8-bit×8-bit grid (dynamic min/max scaling, integer div — exact at
    any SF), Morton-interleaved (div/mod arithmetic, no UDF, no
    engine-specific bit ops), grouped into z-prefix blocks (the "files"
    a ZORDER-optimized table write would produce via
    repartitionByRange(zv) + sortWithinPartitions), and each block
    keeps min/max stats per dimension — exactly what parquet row-group
    footers store. The query reports, for the box predicate
    x∈[{x1},{x2}], y∈[{y1},{y2}]: blocks scanned and rows read under
    Z-order vs a linear single-column layout. Z-order bounds BOTH
    dims per block so ~15/16 of blocks prune; the linear layout prunes
    only on x and drags the full y range into every surviving block.
    At 100 TB this ratio is the difference between reading 6 TB and
    reading 25 TB for the same answer; the layout decision costs one
    range-partitioned write. The whole evaluation is two groupBys —
    no sort needed to MEASURE the layout.""".format(
        x1=_X1, x2=_X2, y1=_Y1, y2=_Y2
    )
    o = load(spark, sf_dir, "orders")
    mx = o.agg(
        F.max("o_custkey").alias("mxx"),
        F.max(F.floor("o_totalprice").cast("bigint")).alias("mxy"),
    )
    enc = o.crossJoin(F.broadcast(mx)).selectExpr(
        "(o_custkey * 256) div (mxx + 1) AS x",
        "(CAST(floor(o_totalprice) AS BIGINT) * 256) div (mxy + 1) AS y",
    )
    z = enc.selectExpr("x", "y", f"({_SPARK_Z}) AS zv")
    pred = F.expr(_PRED)

    def block_stats(df: DataFrame, layout: str, block: F.Column) -> DataFrame:
        return (
            df.groupBy(block.alias("block"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.min("x").alias("min_x"),
                F.max("x").alias("max_x"),
                F.min("y").alias("min_y"),
                F.max("y").alias("max_y"),
                F.sum(F.when(pred, 1).otherwise(0)).alias("matched"),
            )
            .withColumn("layout", F.lit(layout))
        )

    blocks = block_stats(z, "zorder", F.expr(f"zv div {Z_BLOCK_DIV}")).unionByName(
        block_stats(z, "linear_x", F.col("x"))
    )
    overlap = F.expr(_OVERLAP)
    return blocks.groupBy("layout").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
        F.sum(F.when(overlap, 1).otherwise(0)).cast("bigint").alias("n_blocks_scanned"),
        F.sum(F.when(overlap, F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("rows_scanned"),
        F.sum("matched").cast("bigint").alias("rows_matched"),
    )
