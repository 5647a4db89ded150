"""Spatial grid-join queries (q279/q280) vs the oracle + geometric
correctness proofs."""

from __future__ import annotations

import hashlib

import pytest

from tests.conftest import SF_DIR, compare_query

from hoops_edge_database_etl_spark.queries import all_queries
from hoops_edge_database_etl_spark.queries.spatial import GRID, RADIUS


def _xy(key, sx, sy):
    x = int(hashlib.md5(f"{key}{sx}".encode()).hexdigest()[:8], 16) % GRID
    y = int(hashlib.md5(f"{key}{sy}".encode()).hexdigest()[:8], 16) % GRID
    return x, y


@pytest.mark.parametrize(
    "name", ["q279_spatial_radius_join", "q280_nearest_facility"]
)
def test_spatial_matches_oracle(spark, duck, name):
    compare_query(spark, duck, name)


def test_q279_complete_against_brute_force(spark, duck):
    """The grid join must find EXACTLY the within-radius pairs the
    O(n^2) brute force finds — no cell-boundary escapes."""
    keys = [r[0] for r in duck.execute("SELECT c_custkey FROM customer").fetchall()]
    pts = {k: _xy(k, ":x", ":y") for k in keys}
    expected = set()
    items = sorted(pts.items())
    for i, (ka, (xa, ya)) in enumerate(items):
        for kb, (xb, yb) in items[i + 1 :]:
            if (xa - xb) ** 2 + (ya - yb) ** 2 < RADIUS * RADIUS:
                expected.add((min(ka, kb), max(ka, kb)))
    got = {
        (r["id_a"], r["id_b"])
        for r in all_queries()["q279_spatial_radius_join"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_q280_assignment_is_argmin(spark):
    rows = all_queries()["q280_nearest_facility"](spark, SF_DIR).collect()
    assert len(rows) == 1500
    fac = {k: _xy(k, ":fx", ":fy") for k in range(0, 11)}  # s_suppkey <= 10
    for r in rows[:100]:
        x, y = _xy(r["id"], ":x", ":y")
        best = min(
            ((fx - x) ** 2 + (fy - y) ** 2, fid) for fid, (fx, fy) in fac.items()
        )
        assert (r["dist_sq"], r["nearest_facility"]) == best


@pytest.mark.parametrize(
    "name", ["q281_spatial_multires_rollup", "q282_zone_containment_join"]
)
def test_spatial_rollup_zone_match_oracle(spark, duck, name):
    compare_query(spark, duck, name)


def test_q281_nesting_invariant(spark):
    """Every coarse cell's count equals the sum of its children."""
    rows = all_queries()["q281_spatial_multires_rollup"](spark, SF_DIR).collect()
    by_res = {}
    for r in rows:
        by_res.setdefault(r["res"], {})[(r["cx"], r["cy"])] = r["n_points"]
    for res in (1, 2):
        for (cx, cy), n in by_res[res].items():
            children = sum(
                v
                for (kx, ky), v in by_res[res + 1].items()
                if kx // 4 == cx and ky // 4 == cy
            )
            assert children == n
    assert sum(by_res[1].values()) == 1500


def test_q282_zero_zones_reported(spark):
    rows = all_queries()["q282_zone_containment_join"](spark, SF_DIR).collect()
    assert len(rows) == 20  # every zone reports, including empty ones
    assert all(r["n_points_inside"] >= 0 for r in rows)
    assert any(r["n_points_inside"] > 0 for r in rows)


def test_q283_matches_oracle(spark, duck):
    compare_query(spark, duck, "q283_dbscan_core_points")


def test_q283_consistent_with_radius_join(spark):
    """Neighbor counts must equal degrees in q279's pair list."""
    from collections import Counter

    pairs = all_queries()["q279_spatial_radius_join"](spark, SF_DIR).collect()
    deg = Counter()
    for p in pairs:
        deg[p["id_a"]] += 1
        deg[p["id_b"]] += 1
    rows = all_queries()["q283_dbscan_core_points"](spark, SF_DIR).collect()
    assert len(rows) == 1500
    for r in rows:
        assert r["n_neighbors"] == deg.get(r["id"], 0)
        if r["label"] == "core":
            assert r["n_neighbors"] >= 3
        elif r["label"] == "noise":
            assert r["n_neighbors"] == 0
