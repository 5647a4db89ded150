"""Structured Streaming layer (SURVEY.md §2.10 I1–I5).

The reference's incrementality is batch-with-checkpoints: a rolling 7-day
re-ingest window (orchestrate.py:366-379), a DynamoDB checkpoint store,
PK dedup across overlapping partitions, and dead-lettering. Spark-first,
each maps onto Structured Streaming:

- ``Trigger.AvailableNow`` = "process everything new, then stop" — exactly
  the reference's incremental run, with exactly-once file-source tracking
  replacing the hand-rolled (endpoint, param_hash) markers;
- watermark + ``dropDuplicatesWithinWatermark`` = cross-batch PK dedup
  with bounded state (the reference's in-run seen-key set,
  orchestrate.py:657-681, but it survives restarts and won't OOM);
- watermarked windowed/session aggregations = the daily-rollup shapes (W6)
  computed continuously instead of by re-scan;
- ``foreachBatch`` = the idempotent-merge + dead-letter boundary (I3/I5).

All sinks/sources here are file-based (parquet/json dirs) so the layer is
runnable on local[k] and on a cluster unchanged.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery


def read_json_stream(
    spark: SparkSession, path: str, schema: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Raw-layer streaming source: JSON-lines directory (the S5 raw sink is
    this source's producer). Schema is declared — streaming sources cannot
    infer — which matches the normalize layer's contract-first design."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path)


def ingest_available_now(
    src: DataFrame, dst_path: str, checkpoint: str, partition_cols: list[str] | None = None
) -> StreamingQuery:
    """Bronze ingest: drain everything currently available, then stop
    (I1 — the reference's `incremental` run). File-source offsets in the
    checkpoint give exactly-once without (endpoint, param_hash) markers."""
    writer = (
        src.writeStream.format("parquet")
        .option("path", dst_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    return writer.start()


def dedup_within_watermark(
    src: DataFrame, pk: list[str], ts_col: str, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming PK dedup with bounded state: duplicates arriving within
    the watermark horizon are dropped, state older than the horizon is
    evicted (replaces the unbounded seen-key set, orchestrate.py:657-681)."""
    return src.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(pk)


def windowed_counts(
    src: DataFrame,
    ts_col: str,
    group_cols: list[str],
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window aggregation — the continuous form of the
    daily rollup's per-day groupBy (W6). Late rows beyond the watermark are
    dropped deterministically instead of silently double-counting."""
    return (
        src.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), *group_cols)
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *group_cols,
            "n_events",
            "sum_value",
        )
    )


def session_counts(
    src: DataFrame,
    ts_col: str,
    key_col: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming gap-sessionization: the stateful form of q37/W2's
    session_window — sessions close when no event arrives within ``gap``."""
    return (
        src.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(key_col),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def foreach_batch_upsert(
    src: DataFrame,
    dst_path: str,
    checkpoint: str,
    pk: list[str],
    order_col: str,
) -> StreamingQuery:
    """Idempotent micro-batch merge (I3): each batch is PK-deduped against
    the existing sink (keep latest by ``order_col``) and the affected data
    rewritten — the streaming form of deduplicate_silver.py's
    consolidate-keep-latest repair."""
    from pyspark.sql import Window

    def upsert(batch: DataFrame, batch_id: int) -> None:
        from hoops_edge_database_etl_spark.sources.io import (
            is_path_not_found,
            overwrite_parquet_atomic,
        )

        spark = batch.sparkSession
        try:
            existing = spark.read.parquet(dst_path)
            merged = existing.unionByName(batch, allowMissingColumns=True)
        except Exception as exc:
            # only a genuinely missing sink starts fresh; a transient read
            # failure must NOT silently drop all existing rows (ADVICE r1)
            if not is_path_not_found(exc):
                raise
            merged = batch
        w = Window.partitionBy(*pk).orderBy(F.col(order_col).desc())
        latest = (
            merged.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        overwrite_parquet_atomic(latest, dst_path)

    return (
        src.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stateful_running_totals(
    src: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    watermark: str = "2 hours",
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-key
    running event count + value total carried across micro-batches (the
    streaming analogue of the cumulative rollup W6). Emits one row per key
    per batch with the updated totals."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = f"{key_col} long, n_events long, total double"
    state_schema = "n long, total double"

    def update(key, pdfs, state: GroupState):
        n, total = (state.get if state.exists else (0, 0.0))
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame({key_col: [key[0]], "n_events": [n], "total": [total]})

    return (
        src.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
