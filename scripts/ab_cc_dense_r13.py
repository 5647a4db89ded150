"""Dense/high-multiplicity re-measure of cc.py's r12 `_orient` tradeoff
(ADVICE r12): dropping the mid-round dedup lets duplicate edges fan
through the small-star join, inflating the round-end distinct's shuffle
input in proportion to duplicate multiplicity — and the r12 A/B only
covered the bounded, low-multiplicity path-segment fixture.

Graph here: the q429/q414 part co-purchase MULTIGRAPH — the q429 edge
build WITHOUT its distinct, so every (a, b) pair appears once per
co-purchasing order (natural duplicate multiplicity), plus both
orientations. Variants share the committed round structure (lazy
round-end checkpoint); only the mid-round step differs:

  orient - HEAD: mid-round _orient (no dedup)
  canon  - mid-round _canon (dedup), the pre-r12 form

Parity: exact (node, component) rows. Usage: python scripts/ab_cc_dense_r13.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hoops_edge_database_etl_spark.session import get_spark
from hoops_edge_database_etl_spark.tables import load
from scripts.ab_q410_r13 import star_variant

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def dense_edges(spark):
    li = load(spark, SF, "lineitem")
    l1 = li.filter(F.col("l_linenumber") == 1).select("l_orderkey", "l_partkey")
    l2 = (
        li.filter(F.col("l_linenumber") == 2)
        .select("l_orderkey", F.col("l_partkey").alias("p2"))
    )
    return (
        l1.join(l2, "l_orderkey")
        .filter(F.col("l_partkey") != F.col("p2"))
        .select(
            F.col("l_partkey").cast("long").alias("src"),
            F.col("p2").cast("long").alias("dst"),
        )
    )  # NO distinct: multiplicity = co-purchase count


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(app_name="ab-cc-dense-r13")
    spark.sparkContext.setLogLevel("ERROR")

    edges = dense_edges(spark)
    n_multi = edges.count()
    n_canon = (
        edges.select(
            F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
        )
        .distinct()
        .count()
    )
    print(f"multigraph edges={n_multi}  canonical={n_canon}  "
          f"multiplicity x{n_multi / max(n_canon, 1):.2f}", flush=True)

    base = sorted(
        tuple(r)
        for r in star_variant(edges, mid_distinct=False, eager=False).collect()
    )
    got = sorted(
        tuple(r)
        for r in star_variant(edges, mid_distinct=True, eager=False).collect()
    )
    assert got == base, "variants differ"
    print(f"parity ok ({len(base)} rows exact)", flush=True)

    def run(mid: bool) -> float:
        spark.catalog.clearCache()
        import gc

        gc.collect()
        for jrdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            jrdd.unpersist(True)
        t0 = time.perf_counter()
        star_variant(dense_edges(spark), mid_distinct=mid, eager=False).write.format(
            "noop"
        ).mode("overwrite").save()
        return time.perf_counter() - t0

    variants = {"orient": False, "canon": True}
    for mid in variants.values():
        run(mid)
    times = {v: [] for v in variants}
    for r in range(reps):
        for v, mid in variants.items():
            spark.sparkContext.setJobDescription(f"rep{r} {v}")
            times[v].append(run(mid))
    for v, ts in times.items():
        ts = sorted(ts)
        print(
            f"{v:7s} median {ts[len(ts) // 2]:.3f}  [{ts[0]:.3f}, {ts[-1]:.3f}]  "
            f"all={[round(t, 3) for t in ts]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
