"""Hodges-Lehmann, Wilcoxon signed-rank, Epanechnikov KDE (q422-q424):
oracle parity plus brute-force / midrank / integration recomputes."""

from __future__ import annotations

import numpy as np

from tests.conftest import SF_DIR, compare_query


def test_q422_matches_oracle(spark, duck):
    compare_query(spark, duck, "q422_hodges_lehmann")


def test_q423_matches_oracle(spark, duck):
    compare_query(spark, duck, "q423_wilcoxon_signed_rank")


def test_q424_matches_oracle(spark, duck):
    compare_query(spark, duck, "q424_kde_epanechnikov")


def _raw_values(duck, event_type):
    return [
        int(v)
        for (v,) in duck.execute(
            "SELECT CAST(floor(value) AS BIGINT) FROM events"
            f" WHERE event_type = '{event_type}'"
        ).fetchall()
    ]


def test_q422_brute_force_walsh_median(spark, duck):
    """O(n²) brute force over one group's raw values reproduces the
    compressed-join estimate, and Σ weights == n(n+1)/2."""
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = {
        r["event_type"]: r
        for r in all_queries()["q422_hodges_lehmann"](spark, SF_DIR).collect()
    }
    xs = _raw_values(duck, "view")
    n = len(xs)
    assert rows["view"]["n_walsh"] == n * (n + 1) // 2
    xs_a = np.array(xs, dtype=np.int64)
    sums = (xs_a[:, None] + xs_a[None, :])[np.triu_indices(n)]  # i <= j
    sums.sort()
    w = len(sums)
    lower_median = int(sums[(w + 1) // 2 - 1])
    assert rows["view"]["hl_sum2"] == lower_median
    assert rows["view"]["hl_estimate"] == lower_median / 2


def test_q422_symmetric_sample_equals_median(spark):
    """For a symmetric sample the HL estimate equals the center."""
    from hoops_edge_database_etl_spark.queries.aggregates import F  # noqa: F401

    xs = np.array([-5, -3, -1, 0, 1, 3, 5]) + 100
    n = len(xs)
    sums = np.sort((xs[:, None] + xs[None, :])[np.triu_indices(n)])
    w = len(sums)
    assert sums[(w + 1) // 2 - 1] / 2 == 100.0


def test_q423_midrank_replay(spark, duck):
    """Textbook midrank recompute of W+ and z from raw differences."""
    from hoops_edge_database_etl_spark.queries import all_queries

    got = {
        r["event_type"]: r
        for r in all_queries()["q423_wilcoxon_signed_rank"](spark, SF_DIR).collect()
    }
    diffs = duck.execute(
        """
        SELECT event_type,
               SUM(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16' THEN 1
                        ELSE 0 END)
               - SUM(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16' THEN 1
                          ELSE 0 END) AS d
        FROM events GROUP BY event_type, user_id
        """
    ).fetchall()
    per = {}
    for et, d in diffs:
        per.setdefault(et, []).append(int(d))
    for et, ds in per.items():
        ds = np.array(ds, dtype=np.int64)
        nz = ds[ds != 0]
        n = len(nz)
        ad = np.abs(nz)
        order = np.argsort(ad, kind="mergesort")
        ranks = np.empty(n, dtype=float)
        sorted_ad = ad[order]
        i = 0
        while i < n:
            j = i
            while j < n and sorted_ad[j] == sorted_ad[i]:
                j += 1
            ranks[order[i:j]] = (i + 1 + j) / 2  # midrank of positions i+1..j
            i = j
        w_plus = float(ranks[nz > 0].sum())
        assert got[et]["n"] == n
        assert got[et]["w_plus_x2"] == int(round(2 * w_plus))
        _, counts = np.unique(ad, return_counts=True)
        tie = float((counts.astype(np.int64) ** 3 - counts).sum())
        mu = n * (n + 1) / 4
        var = n * (n + 1) * (2 * n + 1) / 24 - tie / 48
        z = (w_plus - mu) / np.sqrt(var)
        assert abs(got[et]["z_score"] - z) < 1e-9


def test_q424_numpy_replay_and_integral(spark, duck):
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = all_queries()["q424_kde_epanechnikov"](spark, SF_DIR).collect()
    assert len(rows) == 250
    assert all(r["density"] >= 0 for r in rows)
    xs = np.array(_raw_values(duck, "purchase"), dtype=np.int64)
    n, h = len(xs), 25
    for r in rows:
        if r["event_type"] != "purchase":
            continue
        g = r["grid_x"]
        d = g - xs
        mask = np.abs(d) < h
        num = int((xs[mask] * 0 + (h * h - d[mask] ** 2)).sum())
        assert r["density_num"] == num
        assert abs(r["density"] - 3.0 * num / (4.0 * n * h**3)) < 1e-15
    # density integrates to ~1 over the grid (step 10, kernel support 25
    # fully inside the value range for the bulk of the mass)
    for et in {r["event_type"] for r in rows}:
        dens = [r["density"] for r in rows if r["event_type"] == et]
        assert 0.9 < sum(dens) * 10 < 1.1
