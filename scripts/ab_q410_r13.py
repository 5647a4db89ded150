"""q410 adjudication (VERDICT r12 item 1): cold local[32] measurement of
the four cc.py variants, ONE FRESH JVM PER INVOCATION — the r12 interleaved
same-session A/B said 4.05 s for the combo while the official 32-core bench
said 7.74 s (all reps >= 7.7) and the 8-core driver run 4.58 s, so the
session-interleaving itself is a suspect. Protocol matches the official
bench: 2 untimed warms + N timed reps of the noop sink, median reported.

Variants (bisecting commit 03566ee's two halves):
  combo      - cc.py as committed at HEAD (_orient mid-round + lazy ckpt)
  r11        - mid-round _canon dedup + eager round-end checkpoint
  nodistinct - _orient mid-round + eager round-end checkpoint
  lazyck     - mid-round _canon dedup + lazy round-end checkpoint

Usage: python scripts/ab_q410_r13.py <variant> [reps]
Driver loop: for v in combo r11 nodistinct lazyck; do python scripts/ab_q410_r13.py $v; done
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
    for _ in range(max_rounds):
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
    return members.unionByName(roots)


VARIANTS = {
    "combo": None,  # cc.py as committed
    "r11": dict(mid_distinct=True, eager=True),
    "nodistinct": dict(mid_distinct=False, eager=True),
    "lazyck": dict(mid_distinct=True, eager=False),
}


def q410_with(spark, variant: str) -> DataFrame:
    from hoops_edge_database_etl_spark.queries.solver import (
        CC_PATH_MOD,
        CC_STAR_BLOCK,
        _cc_path_edges,
    )
    from hoops_edge_database_etl_spark.tables import load

    edges = _cc_path_edges(spark, SF_DIR, CC_STAR_BLOCK)
    if variant == "combo":
        from hoops_edge_database_etl_spark.operators.cc import (
            connected_components_star,
        )

        comp = connected_components_star(edges)
    else:
        comp = star_variant(edges, **VARIANTS[variant])
    all_nodes = (
        load(spark, SF_DIR, "orders")
        .select((F.col("o_orderkey") % CC_PATH_MOD).cast("long").alias("node"))
        .distinct()
    )
    return all_nodes.join(comp, "node", "left").select(
        "node", F.coalesce("component", F.col("node")).alias("component")
    )


def main() -> None:
    variant = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    warm = 2
    assert variant in VARIANTS, variant
    spark = get_spark(app_name=f"ab-q410-r13-{variant}")
    spark.sparkContext.setLogLevel("ERROR")

    def run() -> float:
        spark.catalog.clearCache()
        import gc

        gc.collect()
        for jrdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            jrdd.unpersist(True)
        t0 = time.perf_counter()
        q410_with(spark, variant).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for _ in range(warm):
        run()
    times = sorted(run() for _ in range(reps))
    print(
        f"{variant:12s} median {times[len(times) // 2]:.3f}  "
        f"[{times[0]:.3f}, {times[-1]:.3f}]  all={[round(t, 3) for t in times]}",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
