"""Data-quality profiling plans (reference: scripts/audit_lakehouse.py).

Design rule: every profile is ONE scan of the table regardless of column
count — the wide aggregate row is computed first, then unpivoted with
``stack``. At 100 TB a per-column scan loop (the naive port of the
reference's audit) would multiply the I/O by the column count.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def null_profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Null count per column: (col_name, n_nulls, n_rows) — one scan.

    Reference: audit_lakehouse.py:213-224 (per-column null pcts).
    """
    cols = columns or df.columns
    wide = df.agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}")
            for c in cols
        ],
    )
    stack_expr = ", ".join(f"'{c}', __nulls_{c}" for c in cols)
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_expr}) AS (col_name, n_nulls)", "__n AS n_rows"
    ).select(
        "col_name",
        F.col("n_nulls").cast("bigint"),
        F.col("n_rows").cast("bigint"),
    )


def duplicate_keys(df: DataFrame, pk: list[str]) -> DataFrame:
    """Rows per duplicated PK tuple (audit_lakehouse.py:187-224)."""
    return (
        df.groupBy(*pk)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def volume_anomalies(
    df: DataFrame, group_col: str, date_col: str, threshold: float = 0.5
) -> DataFrame:
    """Days with row volume < threshold × neighbor average
    (audit_lakehouse.py:225-246)."""
    from pyspark.sql import Window

    daily = df.groupBy(group_col, date_col).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy(group_col).orderBy(date_col).rowsBetween(-1, 1)
    return (
        daily.withColumn("neighbor_avg", F.avg(F.col("n").cast("double")).over(w))
        .filter(F.col("n") < threshold * F.col("neighbor_avg"))
    )
