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


def _salt_col(df: DataFrame, n_salts: int, mode: str, seed: int = 0x5A17) -> Column:
    """Salt expression for the given ``mode``.

    ``"content"`` (default): xxhash64 over every input column plus a
    seed — **deterministic under stage-retry recomputation**, the
    property that makes salting safe on non-deterministic upstream
    partitionings (a shuffled input re-fetched after executor loss
    re-hashes every row to the SAME salt, so nothing is double-counted
    or dropped). Rows of a hot key spread as long as they differ in any
    column; fully IDENTICAL duplicate rows all land on one sub-key.

    ``"rowid"``: position id mod n_salts — spreads even identical
    duplicate rows, but the assignment is layout-dependent: a stage
    retry that recomputes a non-deterministic input can re-salt rows
    already fetched by some reducers. Callers choosing this mode must
    feed a deterministic source (parquet scan, localCheckpoint'ed
    DataFrame) — enforced by documentation, not code, because Spark
    does not expose "is this lineage deterministic" to the DataFrame
    layer.
    """
    if mode == "content":
        return F.pmod(
            F.xxhash64(*[F.col(c) for c in df.columns], F.lit(seed)), F.lit(n_salts)
        )
    if mode == "rowid":
        return F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    raise ValueError(f"salt mode must be 'content' or 'rowid', got {mode!r}")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    specs: dict[str, tuple[str, str | Column]],
    n_salts: int = 16,
    salt_mode: str = "content",
) -> DataFrame:
    """GROUP BY ``keys`` with the shuffle split across ``n_salts`` salted
    sub-keys: partial-aggregate on (keys…, salt), then final-aggregate on
    keys. ``specs`` maps output column name → (agg, input column) with agg
    one of sum/count/min/max — the decomposable aggregates, so the salted
    result is exactly the unsalted result.

    The default salt is a content hash (see :func:`_salt_col`) so the
    assignment survives stage-retry recomputation; pass
    ``salt_mode="rowid"`` only when a hot key consists of IDENTICAL
    duplicate rows that must still spread, and only over deterministic
    inputs. Layout-dependent but result-independent either way: any salt
    assignment yields the same aggregate. Sizing: pick n_salts ≈
    (hot-key rows ÷ rows-per-task-budget); oversalting costs one extra
    tiny shuffle stage, undersalting leaves residual skew.
    """
    if "__salt" in df.columns:
        raise ValueError("input already has a __salt column")
    for name, (agg, _col) in specs.items():
        if agg not in _AGGS:
            raise ValueError(f"{name}: unsupported agg {agg!r}; one of {sorted(_AGGS)}")
    salt = _salt_col(df, n_salts, salt_mode)
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
    salt_mode: str = "content",
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
    # content-hash salt by default: stable under stage-retry recompute;
    # salt_mode="rowid" spreads identical duplicate rows but requires a
    # deterministic input — see _salt_col
    salt = _salt_col(skewed, n_salts, salt_mode)
    left = skewed.withColumn("__salt", salt)
    right = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("long"))
    joined = left.join(right, [*on, "__salt"], how)
    return joined.drop("__salt")


def grouped_kernel_agg(
    df: DataFrame,
    keys: Sequence[str],
    kernel,
    partial_schema: str,
    n_salts: int | None = None,
    salt_mode: str = "content",
    hot_threshold: int | None = None,
) -> DataFrame:
    """GROUP BY ``keys`` where the per-group computation is a PANDAS
    KERNEL (grouped-map ``applyInPandas``) instead of built-in aggregates
    — the case Spark CANNOT partially aggregate map-side: every row of a
    group crosses the shuffle and lands on one task, so a hot key turns
    into a single-task funnel no matter how decomposable the math is
    (unlike ``groupBy().agg()``, where partial aggregation already
    defuses skew — see q64 vs q115's docstrings for the distinction).

    ``kernel(pdf) -> one-row pandas.DataFrame`` of partial state matching
    ``partial_schema`` (grouping columns are re-attached here). With
    ``n_salts`` set, the kernel runs per (keys…, salt) and the partials
    are merged with a SUM per column — so the kernel's state must be
    additive (counts, sums, power sums, mergeable sketch registers);
    non-additive state needs a custom merge and does not belong here.
    Result is identical to the unsalted run; only the physical
    distribution changes: a hot group's rows flow through n_salts
    parallel tasks and the merge sees n_salts tiny rows per key.

    ``hot_threshold`` makes the salting SELECTIVE — the grouped-map
    analogue of AQE's skew-split, which does not apply to
    ``applyInPandas``: a pre-pass counts rows per key (codegen
    map-side-combining shuffle — cheap next to any pandas kernel) and
    only keys with ≥ hot_threshold rows are salted; every other key
    keeps salt 0. Without it, salting every key multiplies the group
    count by n_salts, and since grouped-map pays a fixed per-group
    Arrow/Python round-trip (~1 ms), a mostly-cold keyspace gets
    SLOWER, not faster — measured at sf0.1: salt-everything 12.3 s vs
    1.3 s for salt-hot-only on the q115 input. The hot set is provably
    broadcast-safe: at most total_rows/hot_threshold keys can exceed
    the threshold."""
    import pandas as pd

    names = [f.strip().split(" ")[0].strip("`") for f in partial_schema.split(",")]
    key_types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    out_schema = (
        ", ".join(f"`{k}` {key_types[k]}" for k in keys) + ", " + partial_schema
    )

    def wrap(pdf: "pd.DataFrame") -> "pd.DataFrame":
        out = kernel(pdf)
        for k in keys:
            out[k] = pdf[k].iloc[0]
        return out[[*keys, *names]]

    if n_salts is None:
        return df.groupBy(*keys).applyInPandas(wrap, schema=out_schema)
    reserved = {"__salt", "__is_hot"} & set(df.columns)
    if reserved:
        raise ValueError(f"input already has reserved column(s) {sorted(reserved)}")
    # build the salt over the ORIGINAL columns (not the joined hot flag),
    # so the assignment is a pure content hash — stable under stage retry
    salt = _salt_col(df, n_salts, salt_mode)
    if hot_threshold is not None:
        hot = (
            df.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("__cnt"))
            .filter(F.col("__cnt") >= hot_threshold)
            .select(*keys, F.lit(True).alias("__is_hot"))
        )
        salted = (
            df.join(F.broadcast(hot), list(keys), "left")
            .withColumn(
                "__salt",
                F.when(F.col("__is_hot"), salt).otherwise(F.lit(0).cast("long")),
            )
            .drop("__is_hot")
        )
    else:
        salted = df.withColumn("__salt", salt)
    partial = salted.groupBy(*keys, "__salt").applyInPandas(
        lambda pdf: wrap(pdf.drop(columns="__salt")), schema=out_schema
    )
    return partial.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in names]
    )
