"""Same-session interleaved A/B for the q225 rewrite (round 12).

Full-bench sessions this round carry heavy start-of-session drift (controls
2-4x their r11 values, decaying within the run), so per-query movement is
adjudicated here the drift-immune way: all variants alternate inside ONE
session, noop sink, reps interleaved (A B C D  A B C D ...), median + spread
per variant.

Variants:
  old         - r11 plan: two lineitem scans, broadcast stats join, semi gate
  new         - r12 plan: one pair rollup (lazy localCheckpoint), window gate
  new_nockpt  - r12 plan without the localCheckpoint
  new_eager   - r12 plan with eager localCheckpoint

Usage: python scripts/ab_q225_r12.py [reps]
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


def q225_old(spark, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    os_ = (
        li.groupBy(F.col("l_orderkey").alias("os_orderkey"))
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.max("l_shipdate").alias("max_ship"),
        )
        .filter(F.col("n_supp") >= 2)
    )
    lastl = (
        li.join(
            os_,
            (li.l_orderkey == os_.os_orderkey) & (li.l_shipdate == os_.max_ship),
        )
        .select(F.col("os_orderkey").alias("ok"), "l_suppkey")
        .distinct()
    )
    uniq = (
        lastl.groupBy("ok")
        .agg(F.count(F.lit(1)).alias("n_last"))
        .filter(F.col("n_last") == 1)
        .select("ok")
    )
    return (
        lastl.join(uniq, "ok", "left_semi")
        .groupBy(F.col("l_suppkey").cast("bigint").alias("s_suppkey"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
    )


def _q225_new(spark, sf_dir: str, ckpt: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_orderkey", "l_suppkey").agg(F.max("l_shipdate").alias("sm"))
    if ckpt == "lazy":
        ps = ps.localCheckpoint(eager=False)
    elif ckpt == "eager":
        ps = ps.localCheckpoint(eager=True)
    os_ = (
        ps.groupBy(F.col("l_orderkey").alias("ok"))
        .agg(F.count(F.lit(1)).alias("n_supp"), F.max("sm").alias("max_ship"))
        .filter(F.col("n_supp") >= 2)
    )
    lastl = ps.join(os_, (ps.l_orderkey == os_.ok) & (ps.sm == os_.max_ship)).select(
        "ok", "l_suppkey"
    )
    wn = Window.partitionBy("ok")
    return (
        lastl.withColumn("n_last", F.count(F.lit(1)).over(wn))
        .filter(F.col("n_last") == 1)
        .groupBy(F.col("l_suppkey").cast("bigint").alias("s_suppkey"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
    )


VARIANTS = {
    "old": lambda s: q225_old(s, SF_DIR),
    "new": lambda s: _q225_new(s, SF_DIR, "lazy"),
    "new_nockpt": lambda s: _q225_new(s, SF_DIR, "none"),
    "new_eager": lambda s: _q225_new(s, SF_DIR, "eager"),
}


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(app_name="ab-q225-r12")
    spark.sparkContext.setLogLevel("ERROR")

    def run(fn) -> float:
        spark.catalog.clearCache()
        for jrdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            jrdd.unpersist(True)
        t0 = time.perf_counter()
        fn(spark).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # one warm pass of every variant (JIT + footer caches), then interleave
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
