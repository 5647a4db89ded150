"""q410 A/B: per-round cost of the large/small-star contraction.

The graph is fixture-bounded (<= 2048 nodes, path segments), so q410's
~5 s is ~6 rounds of pure per-round latency: each round currently runs
THREE distinct() exchanges (the mid-round _canon after large-star, the
end-of-round _canon, plus the groupBy/join exchanges) and an eager
localCheckpoint + a scalar probe job. Variants:

  current     - operators/cc.py as committed
  nodistinct  - orientation + self-loop filter stay (narrow, no shuffle)
                but the MID-ROUND dedup is dropped; duplicate edges are
                harmless to groupBy-min and are swept by the end-of-round
                canon before the checkpoint/probe. One distinct exchange
                per round instead of two.
  lazyck      - end-of-round localCheckpoint(eager=False): the probe
                count materializes it anyway, saving one job submission.
  combo       - nodistinct + lazyck.

Equivalence: min-of-neighborhood is duplicate-insensitive; the join fans
duplicates through the round but the round-end distinct restores the
canonical set, so the per-round canonical edge sets — and the probe
sequence and the fixed point — are IDENTICAL. Verified by comparing the
full (node, component) output against the committed form each run.

Usage: python scripts/ab_q410_r12.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hoops_edge_database_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _orient(edges: DataFrame) -> DataFrame:
    """Orient (u > v) and drop self-loops WITHOUT deduplicating —
    narrow ops only, no exchange."""
    u, v = F.col("src"), F.col("dst")
    return edges.select(
        F.greatest(u, v).alias("u"), F.least(u, v).alias("v")
    ).filter(F.col("u") != F.col("v"))


def _canon(edges: DataFrame) -> DataFrame:
    u, v = F.col("src"), F.col("dst")
    return (
        edges.select(F.greatest(u, v).alias("u"), F.least(u, v).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def star_variant(edges: DataFrame, *, mid_distinct: bool, eager: bool,
                 max_rounds: int = 40) -> DataFrame:
    e = _canon(edges).localCheckpoint(eager=True)
    prev = None
    rounds = 0
    for _ in range(max_rounds):
        rounds += 1
        sym = e.select("u", "v").unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("src"), F.col("m").alias("dst"))
        )
        e = _canon(large) if mid_distinct else _orient(large)
        mins = e.groupBy("u").agg(F.min("v").alias("m"))
        j = e.join(mins, "u")
        small = j.select(
            F.col("v").alias("src"), F.col("m").alias("dst")
        ).unionByName(j.select(F.col("u").alias("src"), F.col("m").alias("dst")))
        e = _canon(small).localCheckpoint(eager=eager)
        probe = tuple(
            e.agg(F.count(F.lit(1)), F.sum(F.col("u") + F.col("v"))).collect()[0]
        )
        if probe == prev:
            break
        prev = probe
    else:
        raise RuntimeError("did not converge")
    members = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = e.select(F.col("v").alias("node"), F.col("v").alias("component")).distinct()
    out = members.unionByName(roots)
    out._rounds = rounds  # type: ignore[attr-defined]
    return out


def q410_with(spark, variant: str) -> DataFrame:
    from hoops_edge_database_etl_spark.queries.solver import (
        CC_PATH_MOD,
        CC_STAR_BLOCK,
        _cc_path_edges,
    )
    from hoops_edge_database_etl_spark.tables import load

    edges = _cc_path_edges(spark, SF_DIR, CC_STAR_BLOCK)
    if variant == "current":
        from hoops_edge_database_etl_spark.operators.cc import (
            connected_components_star,
        )

        comp = connected_components_star(edges)
    else:
        mid = variant in ("current", "lazyck")
        eager = variant in ("current", "nodistinct")
        comp = star_variant(edges, mid_distinct=mid, eager=eager)
    all_nodes = (
        load(spark, SF_DIR, "orders")
        .select((F.col("o_orderkey") % CC_PATH_MOD).cast("long").alias("node"))
        .distinct()
    )
    return all_nodes.join(comp, "node", "left").select(
        "node", F.coalesce("component", F.col("node")).alias("component")
    )


VARIANTS = ["current", "nodistinct", "lazyck", "combo"]


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(app_name="ab-q410-r12")
    spark.sparkContext.setLogLevel("ERROR")

    base = sorted(
        (r["node"], r["component"]) for r in q410_with(spark, "current").collect()
    )
    for v in VARIANTS[1:]:
        got = sorted((r["node"], r["component"]) for r in q410_with(spark, v).collect())
        assert got == base, f"{v}: output differs"
    print("parity ok (exact rows)", flush=True)

    def run(v: str) -> float:
        spark.catalog.clearCache()
        for jrdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            jrdd.unpersist(True)
        t0 = time.perf_counter()
        q410_with(spark, v).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for v in VARIANTS:
        run(v)
    times = {v: [] for v in VARIANTS}
    for r in range(reps):
        for v in VARIANTS:
            spark.sparkContext.setJobDescription(f"rep{r} {v}")
            times[v].append(run(v))
    for v, ts in times.items():
        ts = sorted(ts)
        print(
            f"{v:12s} median {ts[len(ts) // 2]:.3f}  [{ts[0]:.3f}, {ts[-1]:.3f}]  "
            f"all={[round(t, 3) for t in ts]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
