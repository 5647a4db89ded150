"""As-of (point-in-time) join — the reference's bisect-over-sorted-timeline
lookup (J8: scripts/backtest_spreads.py:87-152) re-expressed scale-first.

Strategy: the *union trick*. Tag both sides, union them, and run ONE window
per key ordered by (ts, side): each left row picks up the latest preceding
right row via ``last(..., ignorenulls=True)``. This is a single shuffle on
the join key with no row explosion — unlike the naive
``left.join(right, key).filter(r_ts < l_ts)`` which is O(|L|·|R|) per key
and dies on hot keys at 100 TB. Pandas ``merge_asof`` inside
``applyInPandas`` would also work but leaves the JVM for no reason.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    strict: bool = True,
    tolerance_expr: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach ``value_cols`` from the latest right row with
    ``right_ts < left_ts`` (``<=`` when ``strict=False``), per ``on`` key.
    ``direction="forward"`` flips the lookup: the EARLIEST right row with
    ``right_ts > left_ts`` (``>=`` when ``strict=False``) — the
    "next event after" join (time-to-convert, next-quote lookups).

    All left columns are preserved; attached columns keep their names (they
    must not collide). ``tolerance_expr`` (e.g. ``"INTERVAL 7 DAYS"``) nulls
    out matches older than ``left_ts - tolerance`` (backward) or newer than
    ``left_ts + tolerance`` (forward).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    for c in value_cols:
        if c in left.columns:
            raise ValueError(f"value column {c!r} collides with a left column")

    # side ordering at equal timestamps decides strictness:
    # backward strict: left(0) sorts BEFORE right(1) at equal ts → same-ts
    # right rows fall outside the left row's "preceding" frame.
    # forward strict is the mirror: right(0) BEFORE left(1) → same-ts right
    # rows fall outside the "following" frame.
    if direction == "backward":
        left_side, right_side = (0, 1) if strict else (1, 0)
    else:
        left_side, right_side = (1, 0) if strict else (0, 1)

    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("__asof_ts"),
        F.lit(left_side).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in value_cols],
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in keys],
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__asof_ts"),
        F.lit(right_side).alias("__side"),
        *[F.col(c) for c in value_cols],
    ).select(*l_tagged.columns)  # align column order for the union

    unioned = l_tagged.unionByName(r_tagged)
    # Frame choice is a SCALE decision, not just semantics (round 9,
    # caught live by q253's sf1 soak row): Spark evaluates a shrinking
    # (x, unboundedFollowing) frame by re-scanning the remaining rows
    # for EVERY row — O(rows²) per partition, which on a hot key is the
    # exact quadratic this operator exists to avoid. An unbounded-
    # PRECEDING frame updates incrementally in O(rows), so the forward
    # direction expresses the identical row set ("strictly after me in
    # (ts, side) order") as a GROWING frame over the DESCENDING order.
    if direction == "backward":
        w = (
            Window.partitionBy(*keys)
            .orderBy("__asof_ts", "__side")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
    else:
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.desc("__asof_ts"), F.desc("__side"))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
    # NOTE: a NULL in a right-side value column is skipped by ignorenulls and
    # would surface the previous non-null match — acceptable for enrichment
    # columns, same behavior as the reference's dict lookup of parsed rows.
    # Because of that, the tolerance check below is PER COLUMN: each value
    # column's staleness is judged against the timestamp of the row that
    # actually supplied it (max ts over rows where that column is non-null),
    # not the newest preceding right row overall (ADVICE r1).
    ts_agg = F.max if direction == "backward" else F.min
    mts = {
        c: ts_agg(
            F.when(
                (F.col("__side") == F.lit(right_side)) & F.col(c).isNotNull(),
                F.col("__asof_ts"),
            )
        )
        .over(w)
        .alias(f"__match_ts_{c}")
        for c in value_cols
    }
    # Both directions now read a growing frame, so the "nearest to the
    # current row" pick is last() in BOTH: ascending order for backward,
    # descending for forward (first-in-ascending == last-in-descending;
    # the min/max staleness aggregates above are order-free either way).
    fill = lambda c: F.last(c, ignorenulls=True)  # noqa: E731
    filled = unioned.select(
        *[c for c in unioned.columns if c not in value_cols and c != "__side"],
        F.col("__side"),
        *[fill(F.col(c)).over(w).alias(c) for c in value_cols],
        *(mts.values() if tolerance_expr is not None else ()),
    )
    out = filled.filter(F.col("__side") == left_side)
    if tolerance_expr is not None:
        stale = (
            f"__match_ts_{{c}} < __asof_ts - {tolerance_expr}"
            if direction == "backward"
            else f"__match_ts_{{c}} > __asof_ts + {tolerance_expr}"
        )
        out = out.select(
            *[c for c in out.columns if c not in value_cols],
            *[
                F.when(F.expr(stale.format(c=c)), None)
                .otherwise(F.col(c))
                .alias(c)
                for c in value_cols
            ],
        )
    return out.drop(
        "__side", "__asof_ts", *[f"__match_ts_{c}" for c in value_cols]
    )
