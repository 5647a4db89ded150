"""Test-table loaders over the driver-generated parquet star schema.

Mirrors the reference's storage layer role (SURVEY.md §2.1 S7/S8): reads are
plain ``spark.read.parquet`` so Catalyst owns column pruning, predicate
pushdown, and partition pruning — the things the reference did by hand with
manual ``columns=`` lists and S3 prefix construction
(reference: src/cbbd_etl/gold/_io_helpers.py:20-67).
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@contextmanager
def _nanos_as_long(spark: SparkSession):
    """Scope spark.sql.legacy.parquet.nanosAsLong=true to one schema
    resolution: events.parquet carries TIMESTAMP(NANOS), which vanilla
    Spark rejects at analysis time (PARQUET_TYPE_ILLEGAL); the conf is
    only consulted there, so it is restored to its prior value as soon
    as the DataFrame exists — no session-wide mutation leaks to other
    parquet reads in the caller's session (ADVICE r2). Not safe against
    a concurrent load() on the same session from another thread."""
    key = "spark.sql.legacy.parquet.nanosAsLong"
    try:
        prev = spark.conf.get(key)
    except Exception:
        prev = None
    spark.conf.set(key, "true")
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table; projection/pushdown handled by Catalyst."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    with _nanos_as_long(spark):
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    return _fix_events_ts(df, name)


def _fix_events_ts(df: DataFrame, name: str) -> DataFrame:
    """Normalize events.ts across the encodings driver testdata has
    shipped: TIMESTAMP(NANOS) (rounds 1-4 — arrives as int64 nanos under
    nanosAsLong, truncated to micros) and plain timestamp[us] with no
    UTC flag (round 5+ — Spark reads TIMESTAMP_NTZ, which functions like
    unix_micros reject). Both collapse to a session-TZ TIMESTAMP; the
    session is pinned UTC, so the NTZ→LTZ cast reinterprets the same
    wall-clock micros DuckDB reads — oracle parity unchanged."""
    if name != "events":
        return df
    from pyspark.sql import functions as F

    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        # integer div — ns values (~1.7e18) overflow double precision
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if dt == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_stream(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Streaming read of one testdata table with the SAME nanos handling
    as :func:`load` — file stream sources need an explicit schema and a
    directory, so this streams the sf dir glob-filtered to the table's
    file. Keeping the ts fixup here (not in callers) guarantees the
    streaming input can never diverge from what the batch oracle reads."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    with _nanos_as_long(spark):
        schema = spark.read.parquet(f"{sf_dir}/{name}.parquet").schema
        df = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", f"{name}.parquet")
            .parquet(sf_dir)
        )
    return _fix_events_ts(df, name)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` can be used
    exactly like the reference's Athena SQL corpus (SURVEY.md §3.3)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
