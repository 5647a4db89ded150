"""Associative top-k-per-group: the two-phase plan that replaces a
per-group row_number sort (single reducer per group — the q73/q74 failure
shape VERDICT r2 flagged) with per-input-partition local selection
followed by a candidate merge.

Top-k is associative: any row in a group's global top-k is in the top-k
of every subset containing it, so
  phase 1 ranks within (group, input-partition) — the shuffle key carries
  the partition id, spreading a 100 TB group over every reducer; each
  reducer sorts only a partition-sized slice and keeps k rows;
  phase 2 merge-ranks the ≤ k·n_partitions survivors per group — the
  same TakeOrdered merge shape Spark uses for a global LIMIT.
Result — including exact rank values — is identical to the one-window
form for any total ordering. (Reference: the pattern its hand-rolled
"keep first provider per game" loops needed at scale,
gold/game_predictions_features.py:262-290.)
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[str | Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Rows ranked ``1..k`` per group under ``order_cols`` (which must be a
    total order within each group for a deterministic result; ties beyond
    it may swap rank labels between content-identical rows). Executes the
    two-phase associative plan above — no single-reducer groups, no
    SinglePartition exchange."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    reserved = {"__tk_pid", "__tk_lr", rank_col}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(f"input columns clash with reserved names: {sorted(clash)}")
    with_pid = df.withColumn("__tk_pid", F.spark_partition_id())
    w_local = Window.partitionBy(*group_cols, "__tk_pid").orderBy(*order_cols)
    cand = (
        with_pid.withColumn("__tk_lr", F.row_number().over(w_local))
        .filter(F.col("__tk_lr") <= k)
        .drop("__tk_lr")
    )
    w_merge = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        cand.withColumn(rank_col, F.row_number().over(w_merge))
        .filter(F.col(rank_col) <= k)
        .drop("__tk_pid")
    )
