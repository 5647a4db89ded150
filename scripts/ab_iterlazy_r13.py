"""Generalize the r12 lazy-checkpoint/probe-cadence lesson (q410/q429) to
the remaining iterative headline queries. Per sweep today:

  q62  - labels eager checkpoint (job) + sum-probe collect (job)    = 2 jobs
  q117 - rank eager checkpoint (job), no probe (fixed iterations)   = 1 job
  q135 - nxt eager ckpt (job) + isEmpty take+backfill (jobs) +
         visited-union eager ckpt (job)                             = 3+ jobs
  q300 - merged eager ckpt (job) + improved.isEmpty (jobs)          = 2+ jobs

Lazy variants: every in-loop checkpoint eager=False; the probe (sum
collect / count()==0) is the single action that materializes the sweep —
and isEmpty probes become count()==0 because a take(1) probe on a lazy
checkpoint triggers a partial compute + a backfill job (LocalRDDCheckpointData
re-runs missing partitions), which costs MORE jobs than one count.
Checkpoint eagerness and probe form change NO data values; parity is
asserted on exact rows per query.

Usage: python scripts/ab_iterlazy_r13.py [reps]
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hoops_edge_database_etl_spark.session import get_spark
from hoops_edge_database_etl_spark.tables import load

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def q62_lazy(spark, sf_dir):
    from hoops_edge_database_etl_spark.queries.dedup_text import q43_minhash_lsh

    edges = q43_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    und = edges.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        edges.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    und = und.localCheckpoint(eager=True)
    labels = und.groupBy("src").agg(
        F.least(F.first("src"), F.min("dst")).alias("lbl")
    ).select(F.col("src").alias("node"), "lbl")
    prev_sum = None
    for _ in range(30):
        labels = labels.localCheckpoint(eager=False)
        cur_sum = labels.agg(F.sum("lbl")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
        prop = und.join(labels, und["dst"] == labels["node"]).select(
            F.col("src").alias("node"), F.col("lbl")
        )
        labels = (
            labels.unionByName(prop).groupBy("node").agg(F.min("lbl").alias("lbl"))
        )
    else:
        raise RuntimeError("did not converge")
    d = load(spark, sf_dir, "documents")
    comp = (
        d.select("doc_id")
        .join(labels, d["doc_id"] == labels["node"], "left")
        .select("doc_id", F.coalesce("lbl", "doc_id").alias("cluster_id"))
    )
    sizes = comp.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return comp.join(sizes, "cluster_id").select(
        "doc_id", "cluster_id", "cluster_size",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"),
    )


def q117_lazy(spark, sf_dir):
    from hoops_edge_database_etl_spark.queries.solver import _PR_ITERS, _PR_SCALE

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
    ew = e.join(od, "src").localCheckpoint(eager=True)
    base = (15 * _PR_SCALE) // 100
    pr = od.select(
        F.col("src").alias("node"), F.lit(_PR_SCALE).cast("long").alias("pr")
    ).localCheckpoint(eager=False)
    for _ in range(_PR_ITERS):
        contrib = ew.join(pr, ew.src == pr.node).select(
            F.col("dst"), F.expr("pr * w div outw").alias("c")
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


def q135_lazy(spark, sf_dir):
    from hoops_edge_database_etl_spark.queries.solver import BFS_MAX_HOPS, BFS_SEEDS

    o = load(spark, sf_dir, "orders")
    e = (
        o.select(
            (F.col("o_custkey") % 100).cast("long").alias("src"),
            (F.col("o_orderkey") % 100).cast("long").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    seeds = spark.createDataFrame(
        [(int(s), 0) for s in BFS_SEEDS], "node long, hops long"
    )
    visited = seeds.localCheckpoint(eager=True)
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
        if nxt.count() == 0:
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=False)
        frontier = nxt
    return visited.select(F.col("node").cast("bigint"), F.col("hops").cast("bigint"))


def q300_lazy(spark, sf_dir):
    from hoops_edge_database_etl_spark.queries.solver import (
        SSSP_DIST_CAP,
        SSSP_MAX_SWEEPS,
        SSSP_SOURCE,
    )

    o = load(spark, sf_dir, "orders")
    src = (F.col("o_custkey") % 100).cast("long")
    dst = (F.col("o_orderkey") % 100).cast("long")
    e = (
        o.select(src.alias("src"), dst.alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .select(
            "src", "dst",
            (1 + (F.col("src") * 31 + F.col("dst")) % 9).cast("long").alias("w"),
        )
        .localCheckpoint(eager=True)
    )
    dist = spark.createDataFrame(
        [(int(SSSP_SOURCE), 0)], "node long, dist long"
    ).localCheckpoint(eager=True)
    for _ in range(SSSP_MAX_SWEEPS):
        cand = (
            e.join(dist.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"), (F.col("dist") + F.col("w")).alias("dist"))
            .filter(F.col("dist") <= SSSP_DIST_CAP)
        )
        merged = (
            dist.unionByName(cand)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=False)
        )
        improved = merged.join(
            dist.withColumnRenamed("dist", "old"), "node", "left"
        ).filter(F.col("old").isNull() | (F.col("dist") < F.col("old")))
        done = improved.count() == 0
        dist = merged
        if done:
            break
    return dist.filter(F.col("dist") <= SSSP_DIST_CAP).select(
        F.col("node").cast("bigint"), F.col("dist").cast("bigint")
    )


def q300_sumprobe(spark, sf_dir):
    """q300 with the q410-style monotone scalar probe: dist values only
    ever DECREASE and nodes are only ever ADDED, so (count, sum(dist))
    changes iff some relaxation improved something — the per-sweep
    improved-JOIN probe is replaced by a two-scalar aggregate that also
    materializes the lazy checkpoint. Stopping sweep is identical."""
    from hoops_edge_database_etl_spark.queries.solver import (
        SSSP_DIST_CAP,
        SSSP_MAX_SWEEPS,
        SSSP_SOURCE,
    )

    o = load(spark, sf_dir, "orders")
    src = (F.col("o_custkey") % 100).cast("long")
    dst = (F.col("o_orderkey") % 100).cast("long")
    e = (
        o.select(src.alias("src"), dst.alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .select(
            "src", "dst",
            (1 + (F.col("src") * 31 + F.col("dst")) % 9).cast("long").alias("w"),
        )
        .localCheckpoint(eager=True)
    )
    dist = spark.createDataFrame(
        [(int(SSSP_SOURCE), 0)], "node long, dist long"
    ).localCheckpoint(eager=True)
    prev = None
    for _ in range(SSSP_MAX_SWEEPS):
        cand = (
            e.join(dist.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"), (F.col("dist") + F.col("w")).alias("dist"))
            .filter(F.col("dist") <= SSSP_DIST_CAP)
        )
        merged = (
            dist.unionByName(cand)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=False)
        )
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


LAZY = {
    "q62_dedup_clusters": q62_lazy,
    "q117_pagerank_distributed": q117_lazy,
    "q135_bfs_hops": q135_lazy,
    "q300_weighted_sssp": q300_lazy,
    "q300_weighted_sssp#sumprobe": q300_sumprobe,
}


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(app_name="ab-iterlazy-r13")
    spark.sparkContext.setLogLevel("ERROR")
    from hoops_edge_database_etl_spark.queries import all_queries

    cur = all_queries()

    for name, lazy_fn in LAZY.items():
        qname = name.split("#")[0]
        base = sorted(tuple(r) for r in cur[qname](spark, SF).collect())
        got = sorted(tuple(r) for r in lazy_fn(spark, SF).collect())
        assert got == base, f"{name}: lazy variant differs"
        print(f"parity ok {name} ({len(base)} rows exact)", flush=True)

    def run(fn) -> float:
        spark.catalog.clearCache()
        gc.collect()
        for jrdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            jrdd.unpersist(True)
        t0 = time.perf_counter()
        fn(spark, SF).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for name, lazy_fn in LAZY.items():
        qname = name.split("#")[0]
        for fn in (cur[qname], lazy_fn):
            run(fn)  # warm both forms
        te, tl = [], []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"rep{r} {name} eager")
            te.append(run(cur[qname]))
            spark.sparkContext.setJobDescription(f"rep{r} {name} lazy")
            tl.append(run(lazy_fn))
        te, tl = sorted(te), sorted(tl)
        print(
            f"{name:26s} eager {te[len(te) // 2]:.3f} [{te[0]:.3f}, {te[-1]:.3f}]"
            f"  lazy {tl[len(tl) // 2]:.3f} [{tl[0]:.3f}, {tl[-1]:.3f}]",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
