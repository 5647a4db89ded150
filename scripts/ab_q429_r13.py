"""q429 r13 A/B (VERDICT r12 item 4): per-sweep cost is now AQE job
scheduling, not data — probe the early-exit every 2nd sweep so two sweeps'
lineage materializes under ONE count job (the lazy in-loop checkpoints
compose: sweep d's unprobed checkpoint is computed as part of sweep d+1's
probe job, and later readers hit its blocks).

Equivalence: fragments are appended BEFORE the probe under p2, so a sweep
whose frontier is already dead appends an EMPTY fragment (filter new != 0
of an all-zero state) — zero rows, zero contribution; the probe at the
next even sweep reads 0 and exits. The (node, first-reached-sweep) set is
unchanged. Parity is asserted on exact rows each run.

Variants:
  cur - queries/solver.py q429 as committed (probe every sweep)
  p2  - probe at even sweeps only (and at the budget boundary)

Usage: python scripts/ab_q429_r13.py [reps]   (interleaved, one session)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hoops_edge_database_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def q429_p2(spark, sf_dir: str, probe_every: int = 2) -> DataFrame:
    from hoops_edge_database_etl_spark.queries.solver import (
        _HC_PIVOTS,
        _HC_SWEEPS,
    )
    from hoops_edge_database_etl_spark.tables import load

    li = load(spark, sf_dir, "lineitem")
    l1 = li.filter(F.col("l_linenumber") == 1).select("l_orderkey", "l_partkey")
    l2 = (
        li.filter(F.col("l_linenumber") == 2)
        .select("l_orderkey", F.col("l_partkey").alias("p2"))
    )
    e = (
        l1.join(l2, "l_orderkey")
        .filter(F.col("l_partkey") != F.col("p2"))
        .select(
            F.least("l_partkey", "p2").cast("long").alias("a"),
            F.greatest("l_partkey", "p2").cast("long").alias("b"),
        )
        .distinct()
    )
    ed = (
        e.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionAll(e.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .localCheckpoint(eager=True)
    )
    nodes = ed.select(F.col("src").alias("node")).distinct().localCheckpoint(
        eager=True
    )
    rk = Window.orderBy(
        F.md5(F.concat(F.col("node").cast("string"), F.lit(":hc"))), F.col("node")
    )
    seeds = (
        nodes.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") <= _HC_PIVOTS)
        .select("node", F.expr("shiftleft(1L, rk - 1)").alias("bits"))
        .localCheckpoint(eager=False)
    )
    newfrags: list[DataFrame] = []
    vis = seeds
    frontier = seeds
    for d in range(1, _HC_SWEEPS + 1):
        msgs = frontier.join(ed, frontier.node == ed.src).select(
            F.col("dst").alias("node"),
            F.col("bits").alias("mb"),
            F.lit(0).cast("long").alias("vb"),
        )
        st = (
            msgs.unionAll(
                vis.select(
                    "node", F.lit(0).cast("long").alias("mb"), F.col("bits").alias("vb")
                )
            )
            .groupBy("node")
            .agg(F.bit_or("mb").alias("mb"), F.bit_or("vb").alias("vb"))
            .select(
                "node",
                F.col("mb").bitwiseAND(F.bitwise_not(F.col("vb"))).alias("new"),
                F.col("mb").bitwiseOR(F.col("vb")).alias("bits"),
            )
            .localCheckpoint(eager=False)
        )
        newfrags.append(
            st.filter(F.col("new") != 0).select(
                "node", F.col("new").alias("bits"), F.lit(d).cast("long").alias("d")
            )
        )
        vis = st.select("node", "bits")
        frontier = st.filter(F.col("new") != 0).select(
            "node", F.col("new").alias("bits")
        )
        if d % probe_every == 0 or d == _HC_SWEEPS:
            if st.filter(F.col("new") != 0).count() == 0:
                break
    reached = newfrags[0]
    for frag in newfrags[1:]:
        reached = reached.unionAll(frag)
    contrib = reached.groupBy("node").agg(
        F.sum(F.bit_count("bits").cast("long") * F.expr("1000000 div d"))
        .cast("long")
        .alias("harmonic_x1e6"),
        F.sum(F.bit_count("bits").cast("long")).cast("long").alias("n_reached"),
    )
    out = nodes.join(contrib, "node", "left")
    return out.select(
        "node",
        F.coalesce("harmonic_x1e6", F.lit(0)).cast("long").alias("harmonic_x1e6"),
        F.coalesce("n_reached", F.lit(0)).cast("long").alias("n_reached"),
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(app_name="ab-q429-r13")
    spark.sparkContext.setLogLevel("ERROR")

    from hoops_edge_database_etl_spark.queries.solver import (
        q429_harmonic_centrality,
    )

    variants = {
        "cur": lambda: q429_harmonic_centrality(spark, SF_DIR),
        "p2": lambda: q429_p2(spark, SF_DIR),
    }

    base = sorted(tuple(r) for r in variants["cur"]().collect())
    got = sorted(tuple(r) for r in variants["p2"]().collect())
    assert got == base, "p2: output differs"
    print(f"parity ok ({len(base)} rows exact)", flush=True)

    def run(fn) -> float:
        spark.catalog.clearCache()
        import gc

        gc.collect()
        for jrdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            jrdd.unpersist(True)
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for fn in variants.values():
        run(fn)
    times = {v: [] for v in variants}
    for r in range(reps):
        for v, fn in variants.items():
            spark.sparkContext.setJobDescription(f"rep{r} {v}")
            times[v].append(run(fn))
    for v, ts in times.items():
        ts = sorted(ts)
        print(
            f"{v:4s} median {ts[len(ts) // 2]:.3f}  [{ts[0]:.3f}, {ts[-1]:.3f}]  "
            f"all={[round(t, 3) for t in ts]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
