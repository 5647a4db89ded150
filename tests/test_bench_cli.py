"""Shape test for the bench CLI surface (the driver parses its stdout).

Runs ``python bench.py`` as a subprocess on a 2-query subset at sf0.001
with 1 rep / 0 warms and asserts the output contract BENCH_r{N}.json
depends on: exactly two JSON lines on stdout (full, then the compact
tail summary that must survive the driver's 2000-char output window),
both parseable, both carrying the round-7 drift controls, and the
compact line carrying n_queries. Guards the r5 regression class
(BENCH_r05 recorded "parsed": null because the JSON outgrew the window)
and the r6 one (missing controls would void round-over-round
normalization).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_emits_two_parseable_json_lines_with_controls():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_QUERIES="q02_filter_pushdown,q41_exact_dedup",
        SPARK_GRAFT_BENCH_REPS="1",
        SPARK_GRAFT_BENCH_WARM="0",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(lines) == 2, f"expected exactly 2 JSON lines, got {lines!r}"
    full, compact = (json.loads(ln) for ln in lines)
    assert set(full["queries"]) == {"q02_filter_pushdown", "q41_exact_dedup"}
    assert full["metric"] == compact["metric"] == "headline_queries_total_wall"
    assert full["value"] == compact["value"] > 0
    for d in (full, compact):
        assert d["control_first"] > 0 and d["control_last"] > 0
    assert compact["n_queries"] == 2
    # r13 (VERDICT r12 item 2): per-query medians must be in the FINAL
    # line — the full line falls outside the driver's 2000-char tail, so
    # a compact line without them leaves PERF per_query empty.
    assert set(compact["queries"]) == {"q02_filter_pushdown", "q41_exact_dedup"}
    assert all(v >= 0 for v in compact["queries"].values())
    # the compact line is the LAST stdout line so it survives the
    # driver's tail window even if the full line is enormous
    assert "n_queries" in lines[-1]


def test_bench_rejects_unknown_subset_names():
    """ADVICE r7: a misspelled SPARK_GRAFT_BENCH_QUERIES must fail fast,
    not silently fall back to running all registered queries."""
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_QUERIES="q02_filter_pushdwn",  # typo
        SPARK_GRAFT_BENCH_REPS="1",
        SPARK_GRAFT_BENCH_WARM="0",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        timeout=600,
    )
    assert proc.returncode != 0
    assert "q02_filter_pushdwn" in proc.stderr
    assert not proc.stdout.strip()  # no bench JSON emitted


def test_compact_line_fits_driver_tail_with_full_headline():
    """r13: the final line must carry all 66 HEADLINE per-query medians and
    still fit the driver's 2000-char tail — even when every median is a
    worst-case 5-char value (xx.xx). Pure function, no Spark."""
    sys.path.insert(0, REPO)
    import bench

    controls = {
        "control_first": 0.2366,
        "control_last": 0.1378,
        "control_cpu_first": 0.2058,
        "control_cpu_last": 0.1548,
        "control_shuffle_first": 0.6155,
        "control_shuffle_last": 0.7482,
    }
    timings = {n: 12.4449 for n in bench.HEADLINE}
    line = bench.compact_summary_line(821.36, 0.1, 3, 2, timings, controls)
    assert len(line) <= 1980
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_total_wall"
    assert parsed["unit"] == "sec" and parsed["sf"] == 0.1
    assert set(parsed["queries"]) == set(bench.HEADLINE)
    assert parsed["queries"]["q01_pricing_summary"] == 12.44

    # pathological overflow (absurd 9-char medians): the queries map is
    # dropped LAST, never the contract fields
    crazy = {n: 123456.78 for n in bench.HEADLINE}
    line2 = bench.compact_summary_line(8e6, 0.1, 3, 2, crazy, controls)
    assert len(line2) <= 1980
    parsed2 = json.loads(line2)
    assert parsed2["metric"] == "headline_queries_total_wall"


def test_bench_emits_cpu_controls():
    """Round 8: a CPU-bound control (codegen fold over spark.range, no
    input) must appear beside the scan control in both JSON lines — the
    scan control alone missed a +23% CPU-side session drift."""
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_QUERIES="q02_filter_pushdown",
        SPARK_GRAFT_BENCH_REPS="1",
        SPARK_GRAFT_BENCH_WARM="0",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    for ln in lines:
        d = json.loads(ln)
        assert d["control_cpu_first"] > 0 and d["control_cpu_last"] > 0
