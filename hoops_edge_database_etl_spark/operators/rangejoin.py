"""Range (interval-containment) join — the second custom join operator
next to as-of (operators/asof.py), for "point falls inside interval"
predicates with no equi-key.

A naive ``points.join(intervals, (lo <= p) & (p <= hi))`` has no equi
condition, so Catalyst can only plan BroadcastNestedLoopJoin (or a
cartesian product) — O(|P|·|I|) pair evaluations and a broadcast of one
entire side. The standard scale shape (used by every range-join
implementation: Databricks' range-join hints, postgres GiST, interval
trees flattened to grids) is **bin bucketing**:

- pick a bin width ``w`` on the join axis;
- each point belongs to exactly one bin, ``floor(p / w)``;
- each interval is replicated to every bin it overlaps,
  ``sequence(floor(lo/w), floor(hi/w))`` — replication factor
  ``1 + (hi - lo)/w``, bounded when interval length is bounded;
- equi-join on the bin key (an ordinary shuffled/broadcast hash join),
  then apply the exact containment predicate as a residual filter.

Each (point, interval) pair meets in exactly one bin — the point's own —
so no dedup is needed. Pick ``w`` ≈ the typical interval length: smaller
bins raise the interval replication factor, larger bins raise the number
of false candidates the residual filter discards.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_BIN = "__rj_bin"


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: int,
    closed: str = "both",
) -> DataFrame:
    """Inner range join of ``points`` (numeric axis column ``point_col``)
    with ``intervals`` ([``lo_col``, ``hi_col``] on the same axis, ends
    per ``closed``: both|left|right|neither). Axis columns must be
    integral (cast dates to day numbers first — exact, no float edges).
    Column names of the two inputs must be disjoint."""
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"overlapping column names: {sorted(overlap)}")
    if _BIN in points.columns or _BIN in intervals.columns:
        raise ValueError(f"column name {_BIN!r} is reserved")
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    preds = {
        "both": (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col)),
        "left": (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col)),
        "right": (F.col(point_col) > F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col)),
        "neither": (F.col(point_col) > F.col(lo_col)) & (F.col(point_col) < F.col(hi_col)),
    }
    if closed not in preds:
        raise ValueError(f"closed must be one of {sorted(preds)}, got {closed!r}")
    p = points.withColumn(_BIN, F.floor(F.col(point_col) / bin_width))
    i = intervals.withColumn(
        _BIN,
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bin_width), F.floor(F.col(hi_col) / bin_width)
            )
        ),
    )
    return p.join(i, _BIN).filter(preds[closed]).drop(_BIN)
