"""Soak-artifact shape test (VERDICT r7 item 5): SOAK_r{N}.json gets the
same mechanical treatment the bench artifact got in test_bench_cli.py —
a committed soak artifact must carry positive timings, slope arithmetic
consistent with them, no error rows, and (from r7 on, when adjudication
notes became part of the contract) a non-empty note per row.
"""

from __future__ import annotations

import glob
import json
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACTS = sorted(glob.glob(os.path.join(REPO, "SOAK_r*.json")))


def _rows(doc: dict):
    for name, row in doc.get("queries", {}).items():
        yield name, row, True
    for section in ("plan_change_recheck", "fixture_change_recheck"):
        recheck = doc.get(section) or {}
        for name, row in recheck.get("queries", {}).items():
            yield name, row, False


@pytest.mark.parametrize(
    "path", ARTIFACTS, ids=[os.path.basename(p) for p in ARTIFACTS]
)
def test_soak_artifact_shape(path):
    doc = json.load(open(path))
    rnd = int(re.search(r"r0*(\d+)", os.path.basename(path)).group(1))
    for key in ("sf_small", "sf_big", "data_ratio", "method"):
        assert key in doc, f"missing top-level {key}"
    assert doc["sf_big"] > doc["sf_small"] > 0
    assert abs(doc["data_ratio"] - doc["sf_big"] / doc["sf_small"]) < 0.5
    assert isinstance(doc["method"], str) and doc["method"].strip()
    assert doc["queries"], "artifact has no soak rows"

    notes_required = rnd >= 7
    for name, row, is_primary in _rows(doc):
        assert "error" not in row, f"{name}: committed artifact has error row"
        if row["big_s"] is None:
            # a killed/over-budget run may carry null timings ONLY with a
            # hand adjudication in the note (q287 r7)
            assert row["slope"] is None, name
            assert "HAND-ADJUDICATED" in (row.get("note") or ""), (
                f"{name}: null timings without hand adjudication"
            )
            continue
        assert row["small_s"] > 0 and row["big_s"] > 0, name
        # slope recorded at 1-2dp from timings themselves rounded to 3dp
        expect = row["big_s"] / row["small_s"]
        assert abs(row["slope"] - expect) <= 0.06, (
            f"{name}: slope {row['slope']} inconsistent with "
            f"{row['big_s']}/{row['small_s']} = {expect:.4f}"
        )
        if is_primary and rnd >= 7:
            assert isinstance(row.get("quadratic_by_contract"), bool), name
        if notes_required:
            assert isinstance(row.get("note"), str) and row["note"].strip(), (
                f"{name}: adjudication note required from r7 on"
            )
        if rnd >= 9 and is_primary:
            assert re.fullmatch(r"[0-9a-f]{12}", row.get("plan_fp") or ""), (
                f"{name}: soak rows carry a plan fingerprint from r9 on "
                "(VERDICT r8 item 3)"
            )


def _latest_fp_rows():
    """(name, recorded_fp) for every fingerprinted row, keeping only the
    LATEST artifact's fingerprint per query (a re-timed row supersedes)."""
    fp: dict[str, str] = {}
    for path in ARTIFACTS:  # sorted ascending by round
        doc = json.load(open(path))
        for name, row, _ in _rows(doc):
            if row.get("plan_fp"):
                fp[name] = row["plan_fp"]
    return sorted(fp.items())


@pytest.mark.skipif(not _latest_fp_rows(), reason="no fingerprinted soak rows yet")
def test_soak_rows_match_current_plans(spark):
    """The q287 lesson, made mechanical (VERDICT r8 item 3): a soak row is
    a measurement OF A PLAN. Recompute each fingerprinted query's current
    plan fingerprint at the soak's small SF; any divergence means the
    implementation changed after the row was recorded — the row must be
    re-timed (new row or plan_change_recheck entry with a fresh fp), not
    trusted."""
    import sys

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from plan_fp import plan_fingerprint

    from hoops_edge_database_etl_spark.queries import all_queries

    queries = all_queries()
    sf_dir = "/root/testdata/sf0.1"
    stale = []
    for name, recorded in _latest_fp_rows():
        if name not in queries:
            stale.append(f"{name}: no longer registered")
            continue
        current = plan_fingerprint(queries[name](spark, sf_dir))
        if current != recorded:
            stale.append(f"{name}: plan changed since its soak row "
                         f"({recorded} -> {current}) - re-time it")
    assert not stale, "; ".join(stale)
