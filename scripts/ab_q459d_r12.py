"""q459 fourth-round A/B: the committed joint-histogram form regressed in
the round-12 clean bench (r11 2.60 s -> 5.23 s in-bench, 3.42 s isolated
5-rep median): l_extendedprice is ~unique per row, so the "histogram"
carries ~|fact| cells through a lazy localCheckpoint plus a fact-sized
re-attach shuffle join — the distinct-value compression that pays for the
plan never happens on the price side.

Two new candidates against the three r12-session variants:

  hybrid   - quantity midranks from the 150-row histogram (broadcast
             re-attach, the part of the committed plan that DOES compress)
             + price midranks from ONE per-flag rank window over the fact
             rows (r11 paid TWO such sorts; this keeps exactly one), then
             a single flag-grain moment aggregation. 1 fact exchange+sort,
             one extra 2-column scan for the quantity histogram.
  rangecum - scale-right form with NO per-flag reducer sort: one fact
             exchange builds (flag, price) cells carrying cv and
             sum-of-dx (dx attached by the 150-row broadcast BEFORE the
             cells collapse), then the per-flag running sum over cells is
             the stable_row_ids two-pass shape — repartitionByRange +
             per-partition window + broadcast prefix offsets — parallel
             over all cores instead of 3 reducers. sy/syy/sxy come from
             the cells (sxy = sum(sdx * dy): rows sharing a price cell
             share dy), n/sx/sxx from the quantity histogram alone.

Usage: python scripts/ab_q459d_r12.py [reps]
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


def _dxm(li) -> DataFrame:
    """Quantity-marginal doubled midranks: <=50 distinct quantities x 3
    flags = 150 rows; the flag-partitioned cumsum window runs over 150
    rows total (fixture-bounded, not corpus-bounded)."""
    qc = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("cv")
    )
    wq = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_quantity")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return qc.select(
        "l_returnflag",
        "l_quantity",
        "cv",
        (2 * F.coalesce(F.sum("cv").over(wq), F.lit(0)) + F.col("cv") + 1).alias(
            "dx"
        ),
    )


def _rho(m: DataFrame) -> DataFrame:
    return m.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / (
                F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
                * F.sqrt((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double"))
            )
        ).alias("spearman_rho"),
    ).orderBy("l_returnflag")


def q459_hybrid(spark, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    dxm = _dxm(li).select("l_returnflag", "l_quantity", "dx")
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
    rows = li.withColumn("dy", dy.cast(D)).join(
        F.broadcast(dxm), ["l_returnflag", "l_quantity"]
    )
    m = rows.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast(D).alias("n"),
        F.sum(F.col("dx").cast(D)).cast(D).alias("sx"),
        F.sum("dy").cast(D).alias("sy"),
        F.sum(F.col("dx").cast(D) * F.col("dx").cast(D)).cast(D).alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).cast(D).alias("syy"),
        F.sum(F.col("dx").cast(D) * F.col("dy")).cast(D).alias("sxy"),
    )
    return _rho(m)


def q459_rangecum(spark, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    dxm = _dxm(li)
    # one fact exchange: collapse to (flag, price) cells, dx attached by
    # the 150-row broadcast BEFORE the collapse so sum(dx) rides along.
    # The cumsum bucket key is DETERMINISTIC arithmetic on the value
    # (repartitionByRange's SAMPLED bounds are re-drawn per
    # materialization, and this frame feeds both the main plan and two
    # broadcast subtrees — a flaky-inconsistency hazard observed live).
    pc = (
        li.join(
            F.broadcast(dxm.select("l_returnflag", "l_quantity", "dx")),
            ["l_returnflag", "l_quantity"],
        )
        .groupBy("l_returnflag", "l_extendedprice")
        .agg(
            F.count(F.lit(1)).alias("cv"),
            F.sum(F.col("dx").cast(D)).alias("sdx"),
        )
        .withColumn("__bkt", (F.col("l_extendedprice") / 3300.0).cast("int"))
    )
    # per-flag running sum over price cells, no per-flag reducer sort:
    # deterministic value buckets + per-bucket window + broadcast prefixes
    wl = (
        Window.partitionBy("__bkt", "l_returnflag")
        .orderBy("l_extendedprice")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    loc = pc.withColumn("run", F.sum("cv").over(wl))
    tot = loc.groupBy("__bkt", "l_returnflag").agg(F.sum("cv").alias("t"))
    earlier = tot.select(
        F.col("__bkt").alias("__e_bkt"),
        F.col("l_returnflag").alias("__e_flag"),
        F.col("t").alias("__e_t"),
    )
    offsets = (
        tot.join(
            F.broadcast(earlier),
            (F.col("__e_flag") == F.col("l_returnflag"))
            & (F.col("__e_bkt") < F.col("__bkt")),
            "left",
        )
        .groupBy("__bkt", "l_returnflag")
        .agg(F.coalesce(F.sum("__e_t"), F.lit(0)).cast("long").alias("base"))
    )
    cells = loc.join(F.broadcast(offsets), ["__bkt", "l_returnflag"]).select(
        "l_returnflag",
        "cv",
        "sdx",
        (
            2 * (F.col("base") + F.col("run") - F.col("cv")) + F.col("cv") + 1
        ).cast(D).alias("dy"),
    )
    my = cells.groupBy("l_returnflag").agg(
        F.sum(F.col("cv").cast(D) * F.col("dy")).cast(D).alias("sy"),
        F.sum(F.col("cv").cast(D) * F.col("dy") * F.col("dy")).cast(D).alias("syy"),
        F.sum(F.col("sdx") * F.col("dy")).cast(D).alias("sxy"),
    )
    mx = dxm.groupBy("l_returnflag").agg(
        F.sum("cv").cast(D).alias("n"),
        F.sum(F.col("cv").cast(D) * F.col("dx").cast(D)).cast(D).alias("sx"),
        F.sum(
            F.col("cv").cast(D) * F.col("dx").cast(D) * F.col("dx").cast(D)
        ).cast(D).alias("sxx"),
    )
    return _rho(mx.join(my, "l_returnflag"))


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
    return _rho(m)


VARIANTS = {
    "committed": lambda s: q459_committed(s, SF_DIR),
    "old_window": lambda s: q459_old_window(s, SF_DIR),
    "hybrid": lambda s: q459_hybrid(s, SF_DIR),
    "rangecum": lambda s: q459_rangecum(s, SF_DIR),
}


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(app_name="ab-q459d-r12")
    spark.sparkContext.setLogLevel("ERROR")

    # sanity parity gate (1e-9 relative + exact n): the BINDING gate is
    # the DuckDB oracle hash at sf0.01 via the verify drive
    base = {
        r["l_returnflag"]: (r["n"], r["spearman_rho"])
        for r in VARIANTS["old_window"](spark).collect()
    }
    for name in ("committed", "hybrid", "rangecum"):
        got = {
            r["l_returnflag"]: (r["n"], r["spearman_rho"])
            for r in VARIANTS[name](spark).collect()
        }
        for k in base:
            assert got[k][0] == base[k][0], (name, k, got[k], base[k])
            assert abs(got[k][1] - base[k][1]) <= 1e-9 * max(1.0, abs(base[k][1])), (
                name,
                k,
                got[k],
                base[k],
            )
    print("parity ok (n exact, rho 1e-9)", flush=True)

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
