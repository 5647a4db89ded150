"""q459 checkpoint/no-checkpoint interleaved A/B (round 12 follow-up).

q459_new (lazy localCheckpoint of the joint histogram) measured SLOWER than
the r11 window plan in scripts/ab_q459_q232_r12.py; this isolates the
checkpoint from the histogram shape. Protocol identical: one session,
interleaved reps, noop sink.
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


def q459_hist(spark, sf_dir: str, ckpt: bool) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    jc = li.groupBy("l_returnflag", "l_quantity", "l_extendedprice").agg(
        F.count(F.lit(1)).alias("c")
    )
    if ckpt:
        jc = jc.localCheckpoint(eager=False)
    qc = jc.groupBy("l_returnflag", "l_quantity").agg(F.sum("c").alias("cv"))
    pc = jc.groupBy("l_returnflag", "l_extendedprice").agg(F.sum("c").alias("cv"))
    wq = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_quantity")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wp = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    dxm = qc.select(
        "l_returnflag",
        "l_quantity",
        (2 * F.coalesce(F.sum("cv").over(wq), F.lit(0)) + F.col("cv") + 1).alias("dx"),
    )
    dym = pc.select(
        "l_returnflag",
        "l_extendedprice",
        (2 * F.coalesce(F.sum("cv").over(wp), F.lit(0)) + F.col("cv") + 1).alias("dy"),
    )
    weighted = (
        jc.join(F.broadcast(dxm), ["l_returnflag", "l_quantity"])
        .join(dym, ["l_returnflag", "l_extendedprice"])
        .select(
            "l_returnflag",
            F.col("c").cast("decimal(38,0)").alias("c"),
            F.col("dx").cast("decimal(38,0)").alias("dx"),
            F.col("dy").cast("decimal(38,0)").alias("dy"),
        )
    )
    m = weighted.groupBy("l_returnflag").agg(
        F.sum("c").cast("decimal(38,0)").alias("n"),
        F.sum(F.col("c") * F.col("dx")).cast("decimal(38,0)").alias("sx"),
        F.sum(F.col("c") * F.col("dy")).cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("c") * F.col("dx") * F.col("dx")).cast("decimal(38,0)").alias("sxx"),
        F.sum(F.col("c") * F.col("dy") * F.col("dy")).cast("decimal(38,0)").alias("syy"),
        F.sum(F.col("c") * F.col("dx") * F.col("dy")).cast("decimal(38,0)").alias("sxy"),
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


VARIANTS = {
    "hist_ckpt": lambda s: q459_hist(s, SF_DIR, True),
    "hist_nockpt": lambda s: q459_hist(s, SF_DIR, False),
}


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(app_name="ab-q459b-r12")
    spark.sparkContext.setLogLevel("ERROR")

    def run(fn) -> float:
        spark.catalog.clearCache()
        for jrdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            jrdd.unpersist(True)
        t0 = time.perf_counter()
        fn(spark).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for name, fn in VARIANTS.items():
        run(fn)
    times = {n: [] for n in VARIANTS}
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
