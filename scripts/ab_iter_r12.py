"""Same-session interleaved A/B for the iterative fixed-point queries
(round 12): q117 pagerank, q135 BFS, q300 SSSP, q410 star CC.

Hypothesis (guide §1.2 "per-task work" → here per-SWEEP driver work): each
sweep currently pays TWO driver round-trips — an eager localCheckpoint
materialization job plus a separate convergence-probe job (isEmpty / agg
collect). A lazy localCheckpoint whose materialization is CARRIED by the
probe action folds them into one job per sweep; q117 (fixed sweep count, no
probe) can chain all sweeps into the single final action. The graphs here
are fixture-sized (20-100 nodes), so per-sweep job latency IS the query
cost; at scale the same fold removes one full read of the sweep state per
sweep.

Probe equivalence notes (each exact, not approximate):
  q300  (count, sum(dist)) stabilizes iff the distance map is at its fixed
        point: count equal => same node set (nodes are never dropped);
        then sum equal <=> every dist equal (dists only decrease).
        Replaces the merged-vs-old anti-join probe.
  q135  count() == 0 replaces isEmpty(); count is a FULL action, so the
        lazy checkpoint is fully materialized (isEmpty's take(1) would
        materialize only partition 0 and leave the checkpoint partial).
  q410  probe unchanged (full agg), checkpoint made lazy — the agg
        materializes it.

Variants interleave inside one session (A B A B ...), noop sink, median +
spread per variant.

Usage: python scripts/ab_iter_r12.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hoops_edge_database_etl_spark.queries import all_queries
from hoops_edge_database_etl_spark.queries.solver import (
    _PR_ITERS,
    _PR_SCALE,
    BFS_MAX_HOPS,
    BFS_SEEDS,
    SSSP_DIST_CAP,
    SSSP_MAX_SWEEPS,
    SSSP_SOURCE,
)
from hoops_edge_database_etl_spark.session import get_spark
from hoops_edge_database_etl_spark.tables import load

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# --- NEW variants -----------------------------------------------------------


def q117_new(spark, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    e = (
        o.select(
            (F.col("o_custkey") % 20).cast("long").alias("src"),
            (F.col("o_orderkey") % 20).cast("long").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    od = e.groupBy("src").agg(F.sum("w").alias("outw"))
    ew = e.join(od, "src").localCheckpoint(eager=False)
    base = (15 * _PR_SCALE) // 100
    pr = od.select(
        F.col("src").alias("node"), F.lit(_PR_SCALE).cast("long").alias("pr")
    ).localCheckpoint(eager=False)
    for _ in range(_PR_ITERS):
        contrib = ew.join(pr, ew.src == pr.node).select(
            F.col("dst"),
            F.expr("pr * w div outw").alias("c"),
        )
        pr = (
            contrib.groupBy("dst")
            .agg((F.lit(base) + F.expr("85 * sum(c) div 100")).alias("pr"))
            .select(F.col("dst").alias("node"), "pr")
            .localCheckpoint(eager=False)
        )
    return pr.select(
        F.col("node").alias("team_id"),
        (F.col("pr").cast("double") / _PR_SCALE).alias("pagerank"),
    )


def q135_new(spark, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    e = (
        o.select(
            (F.col("o_custkey") % 100).cast("long").alias("src"),
            (F.col("o_orderkey") % 100).cast("long").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    seeds = spark.createDataFrame(
        [(int(s), 0) for s in BFS_SEEDS], "node long, hops long"
    )
    visited = seeds.localCheckpoint(eager=False)
    frontier = visited
    for hop in range(1, BFS_MAX_HOPS + 1):
        nxt = (
            e.join(frontier.select(F.col("node").alias("src")), "src")
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "anti")
            .withColumn("hops", F.lit(hop).cast("long"))
            .localCheckpoint(eager=False)
        )
        # count() is a FULL action: it materializes the lazy checkpoint
        # across all partitions AND answers the emptiness probe in the
        # same job (isEmpty's take(1) would leave the checkpoint partial)
        if nxt.count() == 0:
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=False)
        frontier = nxt
    return visited.select(F.col("node").cast("bigint"), F.col("hops").cast("bigint"))


def q300_new(spark, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    src = (F.col("o_custkey") % 100).cast("long")
    dst = (F.col("o_orderkey") % 100).cast("long")
    e = (
        o.select(src.alias("src"), dst.alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .select(
            "src",
            "dst",
            (1 + (F.col("src") * 31 + F.col("dst")) % 9).cast("long").alias("w"),
        )
        .localCheckpoint(eager=False)
    )
    dist = spark.createDataFrame(
        [(int(SSSP_SOURCE), 0)], "node long, dist long"
    ).localCheckpoint(eager=False)
    prev = None
    for _ in range(SSSP_MAX_SWEEPS):
        cand = (
            e.join(dist.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"), (F.col("dist") + F.col("w")).alias("dist")
            )
            .filter(F.col("dist") <= SSSP_DIST_CAP)
        )
        merged = (
            dist.unionByName(cand)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=False)
        )
        # (count, sum) monotone probe — full agg, one job materializes the
        # checkpoint and answers convergence
        probe = tuple(
            merged.agg(F.count(F.lit(1)), F.sum("dist")).collect()[0]
        )
        dist = merged
        if probe == prev:
            break
        prev = probe
    return dist.filter(F.col("dist") <= SSSP_DIST_CAP).select(
        F.col("node").cast("bigint"), F.col("dist").cast("bigint")
    )


def _canon(edges: DataFrame) -> DataFrame:
    u, v = F.col("src"), F.col("dst")
    return (
        edges.select(F.greatest(u, v).alias("u"), F.least(u, v).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _star_new(edges: DataFrame, max_rounds: int = 40) -> DataFrame:
    e = _canon(edges).localCheckpoint(eager=False)
    prev = None
    for _ in range(max_rounds):
        sym = e.select("u", "v").unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("src"), F.col("m").alias("dst"))
        )
        e = _canon(large)
        mins = e.groupBy("u").agg(F.min("v").alias("m"))
        j = e.join(mins, "u")
        small = j.select(
            F.col("v").alias("src"), F.col("m").alias("dst")
        ).unionByName(j.select(F.col("u").alias("src"), F.col("m").alias("dst")))
        e = _canon(small).localCheckpoint(eager=False)
        probe = tuple(
            e.agg(F.count(F.lit(1)), F.sum(F.col("u") + F.col("v"))).collect()[0]
        )
        if probe == prev:
            break
        prev = probe
    else:  # pragma: no cover
        raise RuntimeError("star contraction did not converge")
    members = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = e.select(F.col("v").alias("node"), F.col("v").alias("component")).distinct()
    return members.unionByName(roots)


def q410_new(spark, sf_dir: str) -> DataFrame:
    from hoops_edge_database_etl_spark.queries.solver import (
        CC_PATH_MOD,
        CC_STAR_BLOCK,
        _cc_path_edges,
    )

    edges = _cc_path_edges(spark, sf_dir, CC_STAR_BLOCK)
    comp = _star_new(edges)
    all_nodes = (
        load(spark, sf_dir, "orders")
        .select((F.col("o_orderkey") % CC_PATH_MOD).cast("long").alias("node"))
        .distinct()
    )
    return all_nodes.join(comp, "node", "left").select(
        "node", F.coalesce("component", F.col("node")).alias("component")
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(app_name="ab-iter-r12")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    variants = {
        "q117_old": lambda: qs["q117_pagerank_distributed"](spark, SF_DIR),
        "q117_new": lambda: q117_new(spark, SF_DIR),
        "q135_old": lambda: qs["q135_bfs_hops"](spark, SF_DIR),
        "q135_new": lambda: q135_new(spark, SF_DIR),
        "q300_old": lambda: qs["q300_weighted_sssp"](spark, SF_DIR),
        "q300_new": lambda: q300_new(spark, SF_DIR),
        "q410_old": lambda: qs["q410_star_components"](spark, SF_DIR),
        "q410_new": lambda: q410_new(spark, SF_DIR),
    }

    def _drop_persistent_rdds():
        for jrdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            jrdd.unpersist(True)

    # equality gate first: new must produce identical rows to old
    for base in ["q117", "q135", "q300", "q410"]:
        a = sorted(map(tuple, variants[f"{base}_old"]().collect()))
        _drop_persistent_rdds()
        b = sorted(map(tuple, variants[f"{base}_new"]().collect()))
        _drop_persistent_rdds()
        assert a == b, f"{base}: variant rows differ"
        print(f"{base}: old == new ({len(a)} rows)", flush=True)

    # warm
    for fn in variants.values():
        fn().write.format("noop").mode("overwrite").save()
        _drop_persistent_rdds()

    times: dict[str, list[float]] = {k: [] for k in variants}
    for r in range(reps):
        for name, fn in variants.items():
            spark.catalog.clearCache()
            _drop_persistent_rdds()
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            times[name].append(time.perf_counter() - t0)
        print(f"rep {r + 1}/{reps} done", flush=True)

    for name, ts in times.items():
        ts = sorted(ts)
        print(
            f"{name}: median {ts[len(ts) // 2]:.3f} s  [{ts[0]:.3f}, {ts[-1]:.3f}]",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
