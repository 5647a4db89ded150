"""Same-session interleaved A/B for the q459 and q232 rewrites (round 12).

Same drift-immune protocol as scripts/ab_q225_r12.py: variants alternate in
ONE session, noop sink, per-variant median + spread.

q459 variants:
  old        - r11 plan: two rank windows + two count windows over lineitem
  new        - r12 plan: joint histogram + distinct-value marginal cumsums
q232 variants:
  old        - r11 plan: two events scans + two full-width distincts
  new        - r12 plan: weekly keys derived from daily keys, lazy ckpt
  new_nockpt - r12 plan without the localCheckpoint

Usage: python scripts/ab_q459_q232_r12.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hoops_edge_database_etl_spark.session import get_spark
from hoops_edge_database_etl_spark.tables import load

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# --- q459 ------------------------------------------------------------------


def _q459_moments(ranked: DataFrame) -> DataFrame:
    m = ranked.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("dx").cast("decimal(38,0)").alias("sx"),
        F.sum("dy").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("dx") * F.col("dx")).cast("decimal(38,0)").alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).cast("decimal(38,0)").alias("syy"),
        F.sum(F.col("dx") * F.col("dy")).cast("decimal(38,0)").alias("sxy"),
    )
    return m.select(
        "l_returnflag",
        (
            (m.n * m.sxy - m.sx * m.sy)
            / F.sqrt(
                (m.n * m.sxx - m.sx * m.sx).cast("double")
                * (m.n * m.syy - m.sy * m.sy).cast("double")
            )
        ).alias("spearman_rho"),
    )


def q459_old(spark, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    dx = (
        2 * F.rank().over(Window.partitionBy("l_returnflag").orderBy("l_quantity"))
        + F.count(F.lit(1)).over(Window.partitionBy("l_returnflag", "l_quantity"))
        - 1
    )
    dy = (
        2
        * F.rank().over(
            Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
        )
        + F.count(F.lit(1)).over(
            Window.partitionBy("l_returnflag", "l_extendedprice")
        )
        - 1
    )
    ranked = li.select(
        "l_returnflag",
        dx.cast("decimal(38,0)").alias("dx"),
        dy.cast("decimal(38,0)").alias("dy"),
    )
    return _q459_moments(ranked)


def q459_new(spark, sf_dir: str) -> DataFrame:
    from hoops_edge_database_etl_spark.queries import all_queries

    return all_queries()["q459_spearman_rank_corr"](spark, sf_dir)


# --- q232 ------------------------------------------------------------------

KMV_K = 64
HASH_M = float(16**15)


def _q232_from_keys(keys: DataFrame) -> DataFrame:
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    dw = Window.partitionBy("event_type", "d").orderBy("hv")
    daily = (
        keys.select("event_type", "d", h.alias("hv"))
        .withColumn("rn", F.row_number().over(dw))
        .filter(F.col("rn") <= KMV_K)
        .drop("rn")
    )
    week = F.floor(F.datediff(F.col("d"), F.lit("2024-01-01")) / 7).cast("bigint")
    wk = daily.select("event_type", week.alias("week"), "hv").distinct()
    mw = Window.partitionBy("event_type", "week").orderBy("hv")
    merged = (
        wk.withColumn("rn", F.row_number().over(mw))
        .filter(F.col("rn") <= KMV_K)
        .groupBy("event_type", "week")
        .agg(F.max("hv").alias("hk"), F.count(F.lit(1)).alias("kk"))
    )
    direct_keys = keys.select("event_type", week.alias("week"), "user_id").distinct()
    direct = (
        direct_keys.select("event_type", "week", h.alias("hv"))
        .withColumn("rn", F.row_number().over(mw))
        .filter(F.col("rn") <= KMV_K)
        .groupBy("event_type", "week")
        .agg(F.max("hv").alias("hk"), F.count(F.lit(1)).alias("kk"))
    )

    def est(kk, hk):
        return F.when(kk < KMV_K, kk.cast("double")).otherwise(
            F.lit(KMV_K - 1.0) * F.lit(HASH_M) / hk.cast("double")
        )

    m = merged.alias("m")
    d_ = direct.alias("d")
    return m.join(d_, ["event_type", "week"]).select(
        "event_type",
        "week",
        est(F.col("m.kk"), F.col("m.hk")).alias("est_from_merge"),
        est(F.col("d.kk"), F.col("d.hk")).alias("est_direct"),
    )


def q232_old(spark, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    keys = ev.select("event_type", F.to_date("ts").alias("d"), "user_id").distinct()
    dw = Window.partitionBy("event_type", "d").orderBy("hv")
    daily = (
        keys.select("event_type", "d", h.alias("hv"))
        .withColumn("rn", F.row_number().over(dw))
        .filter(F.col("rn") <= KMV_K)
        .drop("rn")
    )
    week = F.floor(F.datediff(F.col("d"), F.lit("2024-01-01")) / 7).cast("bigint")
    wk = daily.select("event_type", week.alias("week"), "hv").distinct()
    mw = Window.partitionBy("event_type", "week").orderBy("hv")
    merged = (
        wk.withColumn("rn", F.row_number().over(mw))
        .filter(F.col("rn") <= KMV_K)
        .groupBy("event_type", "week")
        .agg(F.max("hv").alias("hk"), F.count(F.lit(1)).alias("kk"))
    )
    direct_keys = ev.select(
        "event_type",
        F.floor(F.datediff(F.to_date("ts"), F.lit("2024-01-01")) / 7)
        .cast("bigint")
        .alias("week"),
        "user_id",
    ).distinct()
    direct = (
        direct_keys.select("event_type", "week", h.alias("hv"))
        .withColumn("rn", F.row_number().over(mw))
        .filter(F.col("rn") <= KMV_K)
        .groupBy("event_type", "week")
        .agg(F.max("hv").alias("hk"), F.count(F.lit(1)).alias("kk"))
    )

    def est(kk, hk):
        return F.when(kk < KMV_K, kk.cast("double")).otherwise(
            F.lit(KMV_K - 1.0) * F.lit(HASH_M) / hk.cast("double")
        )

    m = merged.alias("m")
    d_ = direct.alias("d")
    return m.join(d_, ["event_type", "week"]).select(
        "event_type",
        "week",
        est(F.col("m.kk"), F.col("m.hk")).alias("est_from_merge"),
        est(F.col("d.kk"), F.col("d.hk")).alias("est_direct"),
    )


def q232_new(spark, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    keys = (
        ev.select("event_type", F.to_date("ts").alias("d"), "user_id")
        .distinct()
        .localCheckpoint(eager=False)
    )
    return _q232_from_keys(keys)


def q232_new_nockpt(spark, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    keys = ev.select("event_type", F.to_date("ts").alias("d"), "user_id").distinct()
    return _q232_from_keys(keys)


VARIANTS = {
    "q459_old": lambda s: q459_old(s, SF_DIR),
    "q459_new": lambda s: q459_new(s, SF_DIR),
    "q232_old": lambda s: q232_old(s, SF_DIR),
    "q232_new": lambda s: q232_new(s, SF_DIR),
    "q232_nockpt": lambda s: q232_new_nockpt(s, SF_DIR),
}


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(app_name="ab-q459-q232-r12")
    spark.sparkContext.setLogLevel("ERROR")

    def run(fn) -> float:
        spark.catalog.clearCache()
        for jrdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            jrdd.unpersist(True)
        t0 = time.perf_counter()
        fn(spark).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for name, fn in VARIANTS.items():
        spark.sparkContext.setJobDescription(f"warm {name}")
        run(fn)
    times: dict[str, list[float]] = {n: [] for n in VARIANTS}
    for r in range(reps):
        for name, fn in VARIANTS.items():
            spark.sparkContext.setJobDescription(f"rep{r} {name}")
            times[name].append(run(fn))
    for name, ts in times.items():
        ts = sorted(ts)
        print(
            f"{name:12s} median {ts[len(ts) // 2]:.3f}  "
            f"[{ts[0]:.3f}, {ts[-1]:.3f}]  all={[round(t, 3) for t in ts]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
