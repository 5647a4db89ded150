"""q459 third-round A/B: marginal-moment histogram vs the committed form.

Finding so far (scripts/ab_q459_q232_r12.py, ab_q459b_r12.py): the r12 joint-
histogram rewrite is scale-right (no 3-reducer per-flag window sort) but
locally ~1.5 s slower than the r11 window plan. This round tests a cheaper
algebra: n/sx/sxx come from the quantity marginal alone, sy/syy from the
price marginal alone, and ONLY sxy touches the joint table — which after the
150-row broadcast attach of dx collapses by groupBy(flag, price) to
price-grain before meeting dym at the SAME grain.

Variants:
  committed  - the ce3bc8c form (joint ⋈ dxm ⋈ dym, one wide moment agg)
  marginal   - the marginal-moment algebra above
  old_window - r11 two-rank-window plan (local reference only; 3-reducer
               sort at scale)
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

D = "decimal(38,0)"


def q459_committed(spark, sf_dir: str) -> DataFrame:
    from hoops_edge_database_etl_spark.queries import all_queries

    return all_queries()["q459_spearman_rank_corr"](spark, sf_dir)


def q459_marginal(spark, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    jc = (
        li.groupBy("l_returnflag", "l_quantity", "l_extendedprice")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
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
        "cv",
        (2 * F.coalesce(F.sum("cv").over(wq), F.lit(0)) + F.col("cv") + 1).alias("dx"),
    )
    dym = pc.select(
        "l_returnflag",
        "l_extendedprice",
        "cv",
        (2 * F.coalesce(F.sum("cv").over(wp), F.lit(0)) + F.col("cv") + 1).alias("dy"),
    )
    # n, sx, sxx from the quantity marginal (150 rows); sy, syy from the
    # price marginal; every sum exact in decimal(38,0)
    mx = dxm.groupBy("l_returnflag").agg(
        F.sum("cv").cast(D).alias("n"),
        F.sum(F.col("cv").cast(D) * F.col("dx").cast(D)).alias("sx"),
        F.sum(
            F.col("cv").cast(D) * F.col("dx").cast(D) * F.col("dx").cast(D)
        ).alias("sxx"),
    )
    my = dym.groupBy("l_returnflag").agg(
        F.sum(F.col("cv").cast(D) * F.col("dy").cast(D)).alias("sy"),
        F.sum(
            F.col("cv").cast(D) * F.col("dy").cast(D) * F.col("dy").cast(D)
        ).alias("syy"),
    )
    # sxy: attach dx by 150-row broadcast, collapse to price grain
    # (map-side combined), meet dym at the SAME grain
    cdx = (
        jc.join(
            F.broadcast(dxm.select("l_returnflag", "l_quantity", "dx")),
            ["l_returnflag", "l_quantity"],
        )
        .groupBy("l_returnflag", "l_extendedprice")
        .agg(F.sum(F.col("c").cast(D) * F.col("dx").cast(D)).alias("cdx"))
    )
    mxy = (
        cdx.join(
            dym.select("l_returnflag", "l_extendedprice", "dy"),
            ["l_returnflag", "l_extendedprice"],
        )
        .groupBy("l_returnflag")
        .agg(F.sum(F.col("cdx") * F.col("dy").cast(D)).alias("sxy"))
    )
    m = mx.join(my, "l_returnflag").join(mxy, "l_returnflag")
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


def q459_old_window(spark, sf_dir: str) -> DataFrame:
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
        dx.cast(D).alias("dx"),
        dy.cast(D).alias("dy"),
    )
    m = ranked.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast(D).alias("n"),
        F.sum("dx").cast(D).alias("sx"),
        F.sum("dy").cast(D).alias("sy"),
        F.sum(F.col("dx") * F.col("dx")).cast(D).alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).cast(D).alias("syy"),
        F.sum(F.col("dx") * F.col("dy")).cast(D).alias("sxy"),
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
    "committed": lambda s: q459_committed(s, SF_DIR),
    "marginal": lambda s: q459_marginal(s, SF_DIR),
    "old_window": lambda s: q459_old_window(s, SF_DIR),
}


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(app_name="ab-q459c-r12")
    spark.sparkContext.setLogLevel("ERROR")

    # sanity parity gate (1e-9 relative): the BINDING gate is the DuckDB
    # oracle hash at sf0.01 via drive.py — the variants' final double
    # expressions differ in decimal-precision bookkeeping, so bit-equality
    # across variants at unchecked SFs is not the contract
    base = {
        r["l_returnflag"]: r["spearman_rho"]
        for r in VARIANTS["old_window"](spark).collect()
    }
    for name in ("committed", "marginal"):
        got = {r["l_returnflag"]: r["spearman_rho"] for r in VARIANTS[name](spark).collect()}
        for k in base:
            assert abs(got[k] - base[k]) <= 1e-9 * max(1.0, abs(base[k])), (
                name,
                k,
                got[k],
                base[k],
            )
    print("parity ok (1e-9)", flush=True)

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
