"""Deterministic sketch operators: cardinality estimation and sampling
built on md5 ORDER STATISTICS instead of RNG state, so they are (a)
mergeable/distributed-safe like their probabilistic cousins and (b)
bit-reproducible across engines — the property that lets DuckDB
hash-check them. Production swaps md5 for xxhash64 and (for cardinality)
KMV for HLL when a fixed 1.5 kB register array beats a k-row state; the
query shapes do not change.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hoops_edge_database_etl_spark.queries import query
from hoops_edge_database_etl_spark.tables import load

KMV_K = 64
HASH_M = float(1 << 60)  # base_hash60 range: 15 hex chars = 60 bits

_H60 = "CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT)"


@query(
    "q72_kmv_distinct_sketch",
    oracle=f"""
    WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
    h AS (
      SELECT event_type, {_H60} AS hv,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY {_H60}) AS rn
      FROM d
    ),
    sk AS (
      SELECT event_type, MAX(hv) AS hk, COUNT(*) AS kk
      FROM h WHERE rn <= {KMV_K} GROUP BY event_type
    ),
    ex AS (SELECT event_type, COUNT(*) AS n_exact FROM d GROUP BY event_type)
    SELECT ex.event_type,
           CAST(ex.n_exact AS BIGINT) AS n_exact,
           CASE WHEN sk.kk < {KMV_K} THEN CAST(sk.kk AS DOUBLE)
                ELSE ({KMV_K} - 1.0) * {HASH_M!r} / CAST(sk.hk AS DOUBLE)
           END AS kmv_estimate
    FROM ex JOIN sk USING (event_type)
    """,
)
def q72_kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct-count sketch per event_type, next to the
    exact answer it approximates: keep the {k} smallest 60-bit hashes of
    the distinct keys; if the k-th smallest is hk, the key space is
    ~uniformly filled and distinct-count ≈ (k−1)·M/hk. The sketch state
    is k int64s per group — constant, mergeable (merge = union + keep k
    smallest — the same shuffle shape as any top-k), and exactly
    reproducible, unlike RNG-seeded HLL implementations which differ
    across engines. At 100 TB this replaces count_distinct's full
    de-dup shuffle with a k-row state per group."""
    ev = load(spark, sf_dir, "events")
    d = ev.select("event_type", "user_id").distinct()
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    w = Window.partitionBy("event_type").orderBy("hv")
    ranked = d.select("event_type", h.alias("hv")).withColumn(
        "rn", F.row_number().over(w)
    )
    sk = (
        ranked.filter(F.col("rn") <= KMV_K)
        .groupBy("event_type")
        .agg(F.max("hv").alias("hk"), F.count(F.lit(1)).alias("kk"))
    )
    ex = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact")
    )
    est = F.when(F.col("kk") < KMV_K, F.col("kk").cast("double")).otherwise(
        F.lit(KMV_K - 1.0) * F.lit(HASH_M) / F.col("hk").cast("double")
    )
    return ex.join(sk, "event_type").select(
        "event_type", "n_exact", est.alias("kmv_estimate")
    )


@query(
    "q73_stratified_sample",
    oracle="""
    WITH r AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR) || ':sample'), doc_id
             ) AS sample_rank
      FROM documents
    )
    SELECT doc_id, lang, CAST(sample_rank AS BIGINT) AS sample_rank
    FROM r WHERE sample_rank <= 25
    """,
)
def q73_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: 25 docs per language, chosen by
    md5 hash rank — statistically uniform within each stratum (hash order
    is independent of any data attribute) yet fully reproducible and
    repartition-proof, where ``df.sample()``'s per-partition RNG changes
    membership whenever the layout shifts.

    Scale plan (executed, not just documented): top-k-per-stratum is
    associative, so it runs in two phases with no single-reducer strata:
      1. rank within (lang, input-partition) — the shuffle key carries
         the partition id, so a 100 TB stratum spreads over every
         reducer instead of landing on one; each reducer sorts only a
         partition-sized slice and keeps its local 25 smallest hashes;
      2. merge-rank the survivors per lang — ≤ 25·n_partitions candidate
         rows per stratum (vs corpus/n_langs before), the same
         TakeOrdered merge shape Spark itself uses for global top-k.
    Any global top-25 row is a local top-25 row of its partition, so the
    result — including exact sample_rank values — is identical."""
    d = load(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":sample")))
    t = d.select(
        "doc_id", "lang", key.alias("__hk"), F.spark_partition_id().alias("__pid")
    )
    w_local = Window.partitionBy("lang", "__pid").orderBy("__hk", "doc_id")
    cand = t.withColumn("__lr", F.row_number().over(w_local)).filter(F.col("__lr") <= 25)
    w_merge = Window.partitionBy("lang").orderBy("__hk", "doc_id")
    return (
        cand.withColumn("sample_rank", F.row_number().over(w_merge))
        .filter(F.col("sample_rank") <= 25)
        .select("doc_id", "lang", F.col("sample_rank").cast("bigint").alias("sample_rank"))
    )
