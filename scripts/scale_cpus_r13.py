"""Core-count scaling evidence at a SF that can show it (VERDICT r12
item 6): at sf0.1 every query is fixture/scheduling-bound and c8≈c32; this
runs the six r12-rewritten queries at sf1 (make_scale 10x --jitter) with
SPARK_GRAFT_CPUS=8 and =32 — one FRESH JVM per (query, cpus) — and reports
the c8/c32 ratio. Ratios ≥~2 for the data-bound queries prove the r12
rewrites (bitmask BFS, mapInPandas Gram/PCM kernels, rollup sharing)
actually parallelize; serial-bound queries are expected near 1 and get
documented as such.

Usage: python scripts/scale_cpus_r13.py [sf1_dir] [out_json]
Runs one (query, cpus) per subprocess so `local[N]` is truly per-run.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QUERIES = [
    "q141_pca_power_iteration",
    "q145_audio_pcm_features",
    "q225_waiting_suppliers",
    "q232_sketch_rollup_merge",
    "q429_harmonic_centrality",
    "q459_spearman_rank_corr",
]

CHILD = r"""
import sys, time, gc
sys.path.insert(0, %(repo)r)
from hoops_edge_database_etl_spark.session import get_spark
from hoops_edge_database_etl_spark.queries import all_queries
name, sf_dir = %(name)r, %(sf)r
spark = get_spark(app_name=f"scale-{name}")
spark.sparkContext.setLogLevel("ERROR")
fn = all_queries()[name]
def run():
    spark.catalog.clearCache(); gc.collect()
    for jrdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
        jrdd.unpersist(True)
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0
run()  # warm
ts = sorted(run() for _ in range(2))
print("RESULT", ts[0], ts[-1])
spark.stop()
"""


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, ".scratch/sf1")
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_cpus_r13.json"
    results: dict[str, dict] = {}
    for name in QUERIES:
        row: dict = {}
        for cpus in (8, 32):
            env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
            code = CHILD % {"repo": REPO, "name": name, "sf": sf_dir}
            proc = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True,
                text=True,
                env=env,
                cwd=REPO,
                timeout=1800,
            )
            line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT")]
            if proc.returncode != 0 or not line:
                print(f"{name} c{cpus}: FAILED\n{proc.stderr[-1500:]}", flush=True)
                row[f"c{cpus}"] = None
                continue
            best, worst = (float(x) for x in line[0].split()[1:3])
            row[f"c{cpus}"] = round(best, 3)
            row[f"c{cpus}_worst"] = round(worst, 3)
            print(f"{name} c{cpus}: best {best:.3f} worst {worst:.3f}", flush=True)
        if row.get("c8") and row.get("c32"):
            row["ratio_c8_over_c32"] = round(row["c8"] / row["c32"], 2)
        results[name] = row
    with open(out_path, "w") as f:
        json.dump({"sf_dir": sf_dir, "reps": 2, "warm": 1, "queries": results}, f, indent=1)
    print("wrote", out_path, flush=True)


if __name__ == "__main__":
    main()
