"""SparkSession factory tuned for both local testing and cluster scale.

The reference is a single-process PyArrow pipeline (SURVEY.md §0); here every
knob that matters at 100 TB is set once: AQE (runtime re-planning + skew-join
splitting + partition coalescing), UTC session timezone (oracle parity),
Arrow-based Python interop, and a shuffle-partition count sized to the local
core count rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "hoops-edge-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    On a real cluster the ``master`` and memory settings come from
    spark-submit; everything configured here is master-agnostic except the
    ``local[N]`` fallback used for tests/bench.
    """
    cpus = str(cpus or os.environ.get("SPARK_GRAFT_CPUS") or "32")
    shuffle_partitions = str(
        shuffle_partitions or os.environ.get("SPARK_SHUFFLE_PARTITIONS") or cpus
    )
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # Right-size shuffles for the active parallelism; AQE coalesces further.
        .config("spark.sql.shuffle.partitions", shuffle_partitions)
        # Runtime re-planning: join-strategy switches, skew splitting, coalesce.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Deterministic timestamps vs the DuckDB oracle (naive == UTC).
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow transfer for createDataFrame/toPandas/pandas UDFs.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Parquet TIMESTAMP(NANOS) (events.ts) reads as long; the loader
        # converts to a microsecond timestamp (tables.load).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Dimension tables (nation/region/customer-scale dims) broadcast freely.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "snappy")
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
