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
