"""Storage layer: medallion-layout readers/writers + catalog + checkpoints
(SURVEY.md §2.1 S5–S14, §2.10 I1–I5).

The reference hand-rolls S3 prefix listing, partition-path construction,
1000-key purge batches, and Glue registration (s3_io.py, glue_catalog.py).
In Spark each of those is one engine feature:

- Hive-partitioned writes: ``partitionBy`` + DYNAMIC partition overwrite
  (replaces purge-then-rewrite, s3_io.py:78-84 — only touched partitions
  are replaced, which at 100 TB is the difference between rewriting a day
  and rewriting a decade);
- partition-pruned reads: a ``where`` on partition columns (the manual
  ``season=YYYY/`` prefix math, _io_helpers.py:40-47, for free);
- permissive multi-file reads: ``mergeSchema`` or normalize.permissive_union;
- catalog: ``saveAsTable`` / ``CREATE TABLE USING parquet`` on the session
  catalog (Glue's role, glue_catalog.py:13-48);
- checkpoints: a tiny parquet state table keyed (endpoint, param_hash)
  (DynamoDB's role, checkpoint.py:18-45);
- dead letter: quarantine append of failed/empty batches
  (orchestrate.py:688-695).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession


def is_path_not_found(exc: Exception) -> bool:
    """True only for a missing-path read failure. Anything else (corrupt
    footer, permissions, schema errors) must propagate — swallowing it
    would silently discard the existing sink on the next overwrite
    (ADVICE r1)."""
    if not isinstance(exc, AnalysisException):
        return False
    cond = None
    for attr in ("getCondition", "getErrorClass"):
        fn = getattr(exc, attr, None)
        if fn is not None:
            try:
                cond = fn()
                break
            except Exception:  # pragma: no cover - py4j edge
                continue
    if cond is not None:
        return cond == "PATH_NOT_FOUND"
    return "PATH_NOT_FOUND" in str(exc)


def overwrite_parquet_atomic(df: DataFrame, path: str) -> None:
    """Overwrite ``path`` with ``df`` even when ``df`` reads from ``path``:
    write to a sibling temp dir, then swap via filesystem renames. Replaces
    the collect()-and-recreate idiom — no driver round-trip, so it scales
    past driver memory and keeps types exact (ADVICE/VERDICT r1).

    Swap order is rename-dest-aside (dest → dest.__old_swap, tmp → dest,
    delete __old_swap) rather than delete-then-rename, so there is no
    window where the destination is missing; every ``fs.rename`` result
    is checked (HDFS rename reports failure by returning false, not by
    throwing — ADVICE r2) and a failed final rename restores the
    original data before raising. :func:`recover_swap` heals a leftover
    ``.__old_swap`` from a crash mid-swap."""
    spark = df.sparkSession
    tmp = path.rstrip("/") + ".__tmp_swap"
    old = path.rstrip("/") + ".__old_swap"
    df.write.mode("overwrite").parquet(tmp)
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    htmp = jvm.org.apache.hadoop.fs.Path(tmp)
    hold = jvm.org.apache.hadoop.fs.Path(old)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(hold):
        # prior crash after its swap completed; the live dest wins
        fs.delete(hold, True)
    had_dest = fs.exists(hpath)
    if had_dest and not fs.rename(hpath, hold):
        raise IOError(f"atomic overwrite: rename {path} -> {old} failed")
    if not fs.rename(htmp, hpath):
        if had_dest and not fs.rename(hold, hpath):
            raise IOError(
                f"atomic overwrite: rename {tmp} -> {path} failed AND restoring "
                f"{old} -> {path} failed; data is intact at {old}"
            )
        raise IOError(f"atomic overwrite: rename {tmp} -> {path} failed")
    if had_dest:
        fs.delete(hold, True)


def recover_swap(spark: SparkSession, path: str) -> None:
    """Heal an interrupted :func:`overwrite_parquet_atomic`: if ``path``
    is missing but its ``.__old_swap`` survivor exists (crash between the
    two renames), restore it. No-op otherwise."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    hold = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + ".__old_swap")
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath) and fs.exists(hold):
        if not fs.rename(hold, hpath):
            raise IOError(f"recover_swap: rename {hold} -> {path} failed")


# --- sinks ----------------------------------------------------------------


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    dynamic: bool = True,
) -> None:
    """Partitioned snappy-parquet sink (S6/S13). ``dynamic=True`` replaces
    only the partitions present in ``df`` — the reference's purge+rewrite
    (s3_io.py:78-84) without the full-prefix delete."""
    writer = df.write.mode(mode)
    if dynamic and mode == "overwrite":
        writer = writer.option("partitionOverwriteMode", "dynamic")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed parquet table (managed, catalog-registered): rows are
    hash-clustered into ``n_buckets`` files per partition on
    ``bucket_cols``, so joins/aggregations on those keys read
    pre-shuffled data — Spark elides the Exchange entirely when both
    sides are bucketed the same way (see test_plans: bucketed join has
    zero shuffles). This is the co-located-join strategy the brief names
    for repeated big-big joins: pay the shuffle once at write time, not
    on every query. ``sort_cols`` additionally sorts within buckets,
    enabling sort-merge without a per-task sort."""
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def write_raw_ndjson(df: DataFrame, path: str, mode: str = "append") -> None:
    """Raw-layer sink: gzipped JSON-lines (S5, s3_io.py:48-55)."""
    df.write.mode(mode).option("compression", "gzip").json(path)


def write_dead_letter(
    df: DataFrame, path: str, reason: str, source: str
) -> None:
    """Quarantine failed/empty batches with provenance columns
    (S12/I5, orchestrate.py:688-695)."""
    (
        df.withColumn("__dl_reason", F.lit(reason))
        .withColumn("__dl_source", F.lit(source))
        .withColumn("__dl_at", F.current_timestamp())
        .write.mode("append")
        .json(path)
    )


def register_table(
    spark: SparkSession, name: str, path: str, partition_cols: list[str] | None = None
) -> None:
    """Catalog sink (S11): external parquet table over an existing path +
    partition discovery — Glue's ensure-table + MSCK role
    (glue_catalog.py:13-48, bronze_silver_validation_queries.sql:5-36)."""
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    if partition_cols:
        # explicit column list required when declaring partitioning
        schema = spark.read.parquet(path).schema
        cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)
        spark.sql(
            f"CREATE TABLE {name} ({cols}) USING parquet "
            f"PARTITIONED BY ({', '.join(partition_cols)}) LOCATION '{path}'"
        )
        spark.sql(f"MSCK REPAIR TABLE {name}")
    else:
        spark.sql(f"CREATE TABLE {name} USING parquet LOCATION '{path}'")


# --- scans ----------------------------------------------------------------


def read_table(
    spark: SparkSession, path: str, merge_schema: bool = True
) -> DataFrame:
    """Permissive multi-file scan (S7/S9): mergeSchema unions drifting part
    files; Catalyst owns projection/pushdown/partition pruning."""
    return spark.read.option("mergeSchema", str(merge_schema).lower()).parquet(path)


def latest_asof(df: DataFrame, asof_col: str = "asof") -> DataFrame:
    """Latest-snapshot scan (S10, backtest_spreads.py:58-84): keep only the
    max asof partition. The max() subquery prunes to one partition at plan
    time when ``asof_col`` is a partition column."""
    mx = df.select(F.max(asof_col).alias("__mx"))
    return df.join(F.broadcast(mx), df[asof_col] == F.col("__mx")).drop("__mx")


# --- incremental state (I2) ----------------------------------------------


class CheckpointStore:
    """Tiny parquet checkpoint table keyed (endpoint, param_hash) →
    last_completed marker (the DynamoDB table, checkpoint.py:18-45).

    Read the whole table (it's rows-of-metadata small), merge in memory,
    overwrite — one atomic swap per run, mirroring the reference's
    put-item-per-endpoint semantics without a KV store."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._schema = "endpoint string, param_hash string, marker string, updated_at timestamp"

    def load(self) -> DataFrame:
        recover_swap(self.spark, self.path)
        try:
            return self.spark.read.parquet(self.path)
        except Exception as exc:
            if not is_path_not_found(exc):
                raise
            return self.spark.createDataFrame([], self._schema)

    def get(self, endpoint: str, param_hash: str) -> str | None:
        rows = (
            self.load()
            .filter(
                (F.col("endpoint") == endpoint) & (F.col("param_hash") == param_hash)
            )
            .select("marker")
            .collect()
        )
        return rows[0]["marker"] if rows else None

    def put(self, endpoint: str, param_hash: str, marker: str) -> None:
        updated = self.spark.createDataFrame(
            [(endpoint, param_hash, marker)], "endpoint string, param_hash string, marker string"
        ).withColumn("updated_at", F.current_timestamp())
        merged = (
            self.load()
            .filter(
                ~(
                    (F.col("endpoint") == endpoint)
                    & (F.col("param_hash") == param_hash)
                )
            )
            .unionByName(updated)
            .coalesce(1)
        )
        # temp-write + rename: no driver round-trip, safe to overwrite the
        # path the plan is reading from
        overwrite_parquet_atomic(merged, self.path)


def run_summary(df_counts: dict[str, int], spark: SparkSession) -> DataFrame:
    """Per-run row-count summary frame (S14, orchestrate.py:645-649)."""
    rows = [(k, v) for k, v in sorted(df_counts.items())]
    return spark.createDataFrame(rows, "table string, n_rows long").withColumn(
        "run_at", F.current_timestamp()
    )
