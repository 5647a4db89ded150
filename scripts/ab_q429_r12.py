"""q429 co-partitioned sweep A/B (round 12, second pass).

The committed bitmask form still pays 3 exchanges per sweep: the
frontier⋈edges join shuffles BOTH sides (edges every sweep!), and the
message/visited merge groupBy re-shuffles the whole visited set. This
variant pre-partitions the edge list by src ONCE before its checkpoint
(LogicalRDD preserves outputPartitioning, so every sweep's join sees a
hash(src)-partitioned leaf), keeps frontier/visited hash(node)-partitioned
the same way, and merges messages into visited with a full-outer join of
two co-partitioned sides — per sweep only the message rows cross an
exchange.

Protocol: same session, interleaved reps, noop sink; exact row-set parity
asserted before timing (all-integer output).

Usage: python scripts/ab_q429_r12.py [reps]
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

_HC_PIVOTS = 32
_HC_SWEEPS = 16


def q429_committed(spark, sf_dir: str) -> DataFrame:
    from hoops_edge_database_etl_spark.queries import all_queries

    return all_queries()["q429_harmonic_centrality"](spark, sf_dir)


def q429_copart(spark, sf_dir: str) -> DataFrame:
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
        .localCheckpoint(eager=True)
    )
    visited = seeds
    frontier = seeds
    newfrags: list[DataFrame] = []
    for d in range(1, _HC_SWEEPS + 1):
        msgs = frontier.join(ed, frontier.node == ed.src).select(
            F.col("dst").alias("node"), F.col("bits").alias("mb")
        )
        m = msgs.groupBy("node").agg(F.bit_or("mb").alias("mb"))
        j = (
            m.join(
                visited.select("node", F.col("bits").alias("vb")),
                "node",
                "full_outer",
            )
            .select(
                "node",
                F.coalesce("mb", F.lit(0))
                .bitwiseAND(F.bitwise_not(F.coalesce("vb", F.lit(0))))
                .alias("nb"),
                F.coalesce("vb", F.lit(0))
                .bitwiseOR(F.coalesce("mb", F.lit(0)))
                .alias("allb"),
            )
            .localCheckpoint(eager=True)
        )
        nxt = j.filter(F.col("nb") != 0).select(
            "node", F.col("nb").alias("bits"), F.lit(d).cast("long").alias("d")
        )
        if nxt.count() == 0:
            break
        newfrags.append(nxt)
        visited = j.select("node", F.col("allb").alias("bits"))
        frontier = nxt.select("node", "bits")
    reached = newfrags[0]
    for frag in newfrags[1:]:
        reached = reached.unionAll(frag)
    contrib = reached.groupBy("node").agg(
        F.sum(F.bit_count("bits").cast("long") * F.expr("1000000 div d"))
        .cast("long")
        .alias("harmonic_x1e6"),
        F.sum(F.bit_count("bits").cast("long")).cast("long").alias("n_reached"),
    )
    return nodes.join(contrib, "node", "left").select(
        "node",
        F.coalesce("harmonic_x1e6", F.lit(0)).cast("long").alias("harmonic_x1e6"),
        F.coalesce("n_reached", F.lit(0)).cast("long").alias("n_reached"),
    )


VARIANTS = {
    "committed": lambda s: q429_committed(s, SF_DIR),
    "copart": lambda s: q429_copart(s, SF_DIR),
}


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(app_name="ab-q429-r12")
    spark.sparkContext.setLogLevel("ERROR")

    base = sorted(
        tuple(r) for r in VARIANTS["committed"](spark).collect()
    )
    got = sorted(tuple(r) for r in VARIANTS["copart"](spark).collect())
    assert got == base, (len(got), len(base), got[:3], base[:3])
    print(f"parity ok ({len(base)} rows, exact)", flush=True)

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
            f"{name:10s} min {ts[0]:.3f}  median {ts[len(ts) // 2]:.3f}  "
            f"all={[round(t, 3) for t in ts]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
