"""Skew-mitigation operators: salted two-phase aggregation and salted
joins (SURVEY §2 scale notes; the brief's "skewed keys → salting or AQE
skew-join").

AQE's skew-join splitting (enabled in session.get_spark) handles most
runtime skew transparently; these operators are the *declarative* form
for the cases AQE can't fix:

- a single hot GROUP BY key whose partial-aggregate state is itself huge
  (e.g. collect-style or distinct-heavy aggregation where map-side
  combine doesn't shrink the hot key),
- a shuffle join where one key's rows exceed a single task's memory on
  BOTH sides, so splitting one side (what AQE does) is not enough.

Both transformations are result-identical to their unsalted forms — the
salt only changes the physical distribution of rows across tasks.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

#: aggregate spec name -> (partial fn, final fn). count's partials are
#: summed; min/max/sum are idempotent under re-aggregation.
_AGGS = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    specs: dict[str, tuple[str, str | Column]],
    n_salts: int = 16,
) -> DataFrame:
    """GROUP BY ``keys`` with the shuffle split across ``n_salts`` salted
    sub-keys: partial-aggregate on (keys…, salt), then final-aggregate on
    keys. ``specs`` maps output column name → (agg, input column) with agg
    one of sum/count/min/max — the decomposable aggregates, so the salted
    result is exactly the unsalted result.

    The salt is the row's position id mod ``n_salts`` — per-row, so even
    a hot key made of IDENTICAL duplicate rows spreads over ``n_salts``
    reducers (a content hash would send every duplicate to one reducer —
    exactly the case salting exists for). Layout-dependent but
    result-independent: any salt assignment yields the same aggregate.
    Sizing: pick n_salts ≈ (hot-key rows ÷ rows-per-task-budget);
    oversalting costs one extra tiny shuffle stage, undersalting leaves
    residual skew.
    """
    if "__salt" in df.columns:
        raise ValueError("input already has a __salt column")
    for name, (agg, _col) in specs.items():
        if agg not in _AGGS:
            raise ValueError(f"{name}: unsupported agg {agg!r}; one of {sorted(_AGGS)}")
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(
            *[
                _AGGS[agg][0](col).alias(name)
                for name, (agg, col) in specs.items()
            ]
        )
    )
    return partial.groupBy(*keys).agg(
        *[
            _AGGS[agg][1](F.col(name)).alias(name)
            for name, (agg, _col) in specs.items()
        ]
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed``'s hot keys overwhelm single tasks: the
    skewed side gets a deterministic per-row salt, the ``other`` side is
    replicated once per salt value (explode of a ``sequence`` literal —
    cost = n_salts × |other|, so this is for a *moderately* sized right
    side; a truly small side should just be ``broadcast()``), and the
    join key becomes (on…, salt) — a hot key's rows now land on n_salts
    different reducers. Result is row-identical to the unsalted join.

    ``how`` supports inner/left (left = keep every skewed-side row);
    right/full would need the replicated side de-duplicated after the
    join, so they are rejected rather than silently wrong."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if "__salt" in skewed.columns or "__salt" in other.columns:
        raise ValueError("input already has a __salt column")
    # per-row salt (not content hash): identical duplicate rows of a hot
    # key must still spread — see salted_agg
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    left = skewed.withColumn("__salt", salt)
    right = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("long"))
    joined = left.join(right, [*on, "__salt"], how)
    return joined.drop("__salt")
