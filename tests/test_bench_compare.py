"""Shape tests for scripts/bench_compare.py (VERDICT r7 item 2).

The compare tool must (a) recover per-query numbers from the driver's
FRONT-TRUNCATED artifacts (only the spread dict tail survives the output
window), (b) parse raw bench stdout, and (c) normalize by the control
geomean so uniform session drift does not read as a regression. The
r6->r7 fixture check pins the judge's hand-computed numbers: 40 common
queries, median ratio 0.86x, movers exactly {q459, q462}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "bench_compare.py")

sys.path.insert(0, os.path.join(REPO, "scripts"))
from bench_compare import compare, control_geomean, load_artifact  # noqa: E402


def test_r6_r7_reproduces_judge_numbers():
    a = load_artifact(os.path.join(REPO, "BENCH_r06.json"))
    b = load_artifact(os.path.join(REPO, "BENCH_r07.json"))
    rep = compare(a, b, 1.25)
    assert rep["n_common"] == 40
    assert abs(rep["median_norm_ratio"] - 0.865) < 0.02
    assert {m["query"] for m in rep["movers"]} == {
        "q459_spearman_rank_corr",
        "q462_allen_relations",
    }


def test_raw_stdout_and_control_normalization(tmp_path):
    # Two synthetic raw-bench files: b is uniformly 1.5x slower but its
    # control is also 1.5x slower -> normalized ratios must be ~1.0.
    qa = {"q01_x": 1.0, "q02_y": 2.0}
    a = tmp_path / "a.txt"
    b = tmp_path / "b.txt"
    a.write_text(
        json.dumps(
            {
                "metric": "m",
                "value": 3.0,
                "queries": qa,
                "control_first": 0.10,
                "control_last": 0.10,
            }
        )
        + "\n"
    )
    b.write_text(
        json.dumps(
            {
                "metric": "m",
                "value": 4.5,
                "queries": {k: v * 1.5 for k, v in qa.items()},
                "control_first": 0.15,
                "control_last": 0.15,
            }
        )
        + "\n"
    )
    la, lb = load_artifact(str(a)), load_artifact(str(b))
    assert control_geomean(la) == 0.10
    rep = compare(la, lb, 1.25)
    assert rep["n_common"] == 2
    assert all(abs(r["norm_ratio"] - 1.0) < 1e-9 for r in rep["rows"])
    assert not rep["movers"]


def test_truncated_tail_recovers_spread_minima(tmp_path):
    # driver-wrapped artifact whose tail lost the median dict entirely
    art = tmp_path / "BENCH_x.json"
    art.write_text(
        json.dumps(
            {
                "tail": '1], "q07_z": [2.0, 2.5], "q08_w": [0.5, 0.6]}, '
                '"control_first": 0.2, "control_last": 0.1}\n'
                '{"metric": "m", "value": 3.0, "n_queries": 2, '
                '"control_first": 0.2, "control_last": 0.1}\n',
                "parsed": {
                    "value": 3.0,
                    "control_first": 0.2,
                    "control_last": 0.1,
                },
            }
        )
    )
    la = load_artifact(str(art))
    assert la["source"] == "spread_min"
    assert la["queries"] == {"q07_z": 2.0, "q08_w": 0.5}
    assert abs(control_geomean(la) - (0.2 * 0.1) ** 0.5) < 1e-12


def test_cli_exit_codes(tmp_path):
    proc = subprocess.run(
        [
            sys.executable,
            SCRIPT,
            os.path.join(REPO, "BENCH_r06.json"),
            os.path.join(REPO, "BENCH_r07.json"),
        ],
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert proc.returncode == 0
    rep = json.loads(proc.stdout)
    assert rep["n_common"] == 40
    proc2 = subprocess.run(
        [
            sys.executable,
            SCRIPT,
            os.path.join(REPO, "BENCH_r06.json"),
            os.path.join(REPO, "BENCH_r07.json"),
            "--fail-on-movers",
        ],
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert proc2.returncode == 1  # q459/q462 exceed 1.25x
