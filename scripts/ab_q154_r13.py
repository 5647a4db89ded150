"""q154 r13 A/B (VERDICT r12 item 8): the r8 retry translated the PER-DOC
token arrays to ints (500k docs) and lost to the dictionary-build cost;
the r13 decomposition shows the cost center is the VERIFY stage instead —
size(array_intersect(sa, sb)) over STRING arrays for ~1.73M candidate
pairs at sf0.1 (+1.85 s of the warm 3.5 s total) — and the arrays that
feed it belong to the 3,935 distinct-set GROUPS, not the docs. Variants
re-encode only those group sets:

  str   - committed form: string arrays, size(array_intersect)
  xxh   - sets as sort_array(transform(s, xxhash64)) long arrays; same
          intersect on longs (injective on any fixture vocab; collision
          risk documented, not adopted without the dict check)
  dict  - EXACT at any scale: token -> dense id by row_number over the
          already-built dfreq (vocab-bounded window), group sets as int
          arrays via one explode+join over GROUP rows (3,935 x m, not
          500k x m as in r8)

Parity gate: each variant's (ga, gb, jaccard) rows must equal the
committed form's exactly. Usage: python scripts/ab_q154_r13.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from hoops_edge_database_etl_spark.session import get_spark
from hoops_edge_database_etl_spark.tables import load

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SSJ_T10 = 9


def pipeline(spark, verify: str):
    d = load(spark, SF, "documents")
    toks = d.select("doc_id", F.array_distinct(F.split("text", " ")).alias("s"))
    keyed = toks.select("doc_id", F.sort_array("s").alias("sk"))
    groups = keyed.groupBy("sk").agg(
        F.min("doc_id").alias("gid"), F.count(F.lit(1)).alias("cnt")
    )
    gsets = groups.select("gid", F.col("sk").alias("s"), "cnt")
    x = gsets.select("gid", F.explode("s").alias("tok")).filter(F.col("tok") != "")
    dfreq = x.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    ranked = (
        x.join(F.broadcast(dfreq), "tok")
        .groupBy("gid")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("df"), F.col("tok")))
            ).alias("arr")
        )
        .select("gid", F.transform("arr", lambda st: st["tok"]).alias("ordered"))
    )
    m = F.size("ordered")
    plen = m - F.expr(f"(({SSJ_T10} * size(ordered) + 9) div 10)") + 1
    prefix = ranked.select(
        "gid", m.alias("m"), F.posexplode(F.slice("ordered", 1, plen)).alias("p0", "tok")
    ).select("gid", "m", (F.col("p0") + 1).alias("rn"), "tok")
    a = prefix.select(
        F.col("gid").alias("ga"), F.col("m").alias("ma"), F.col("rn").alias("ra"), "tok"
    ).repartition(64, "ga")
    bb = prefix.select(
        F.col("gid").alias("gb"), F.col("m").alias("mb"), F.col("rn").alias("rb"), "tok"
    )
    min_overlap = F.expr(
        f"(({SSJ_T10} * (ma + mb) + {10 + SSJ_T10 - 1}) div {10 + SSJ_T10})"
    )
    cand = (
        a.join(
            bb,
            (a.tok == bb.tok)
            & (F.col("ga") < F.col("gb"))
            & (10 * F.least("ma", "mb") >= SSJ_T10 * F.greatest("ma", "mb"))
            & (
                F.least(F.col("ma") - F.col("ra"), F.col("mb") - F.col("rb")) + 1
                >= min_overlap
            ),
        )
        .select("ga", "gb")
        .distinct()
    )
    if verify == "str":
        enc = gsets.select("gid", F.col("s").alias("es"))
    elif verify == "xxh":
        enc = gsets.select(
            "gid", F.sort_array(F.transform("s", lambda t: F.xxhash64(t))).alias("es")
        )
    elif verify == "dict":
        ids = dfreq.select(
            "tok", F.row_number().over(Window.orderBy("tok")).alias("tid")
        )
        enc = (
            gsets.select("gid", F.explode("s").alias("tok"))
            .join(F.broadcast(ids), "tok", "left")
            .groupBy("gid")
            # empty-string token is filtered out of dfreq -> tid null; keep
            # it as id 0 so set sizes (and the union size) stay identical
            .agg(F.collect_list(F.coalesce("tid", F.lit(0))).alias("es"))
        )
    else:
        raise ValueError(verify)
    sa = enc.select(F.col("gid").alias("ga"), F.col("es").alias("sa"))
    sb = enc.select(F.col("gid").alias("gb"), F.col("es").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb"))
    v = (
        cand.join(sa, "ga")
        .join(sb, "gb")
        .select("ga", "gb", inter.alias("inter"),
                (F.size("sa") + F.size("sb") - inter).alias("un"))
    )
    return v.filter(F.col("inter") * 10 >= SSJ_T10 * F.col("un")).select(
        "ga", "gb",
        (F.col("inter").cast("double") / F.col("un").cast("double")).alias("jaccard"),
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(app_name="ab-q154-r13")
    spark.sparkContext.setLogLevel("ERROR")

    variants = ["str", "xxh", "dict"]
    base = sorted(tuple(r) for r in pipeline(spark, "str").collect())
    for v in variants[1:]:
        got = sorted(tuple(r) for r in pipeline(spark, v).collect())
        assert got == base, f"{v}: differs"
    print(f"parity ok ({len(base)} group pairs exact)", flush=True)

    def run(v: str) -> float:
        spark.catalog.clearCache()
        import gc

        gc.collect()
        for jrdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            jrdd.unpersist(True)
        t0 = time.perf_counter()
        pipeline(spark, v).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for v in variants:
        run(v)
    times = {v: [] for v in variants}
    for r in range(reps):
        for v in variants:
            spark.sparkContext.setJobDescription(f"rep{r} {v}")
            times[v].append(run(v))
    for v, ts in times.items():
        ts = sorted(ts)
        print(
            f"{v:5s} median {ts[len(ts) // 2]:.3f}  [{ts[0]:.3f}, {ts[-1]:.3f}]  "
            f"all={[round(t, 3) for t in ts]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
