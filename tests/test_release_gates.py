"""Activity selection, Brier/Murphy decomposition, l-diversity
(q416-q418): oracle parity plus the optimality / identity / planted-group
properties the hash check alone cannot pin."""

from __future__ import annotations

import bisect

from tests.conftest import SF_DIR, compare_query


def test_q416_matches_oracle(spark, duck):
    compare_query(spark, duck, "q416_activity_selection")


def test_q417_matches_oracle(spark, duck):
    compare_query(spark, duck, "q417_brier_decomposition")


def test_q418_matches_oracle(spark, duck):
    compare_query(spark, duck, "q418_l_diversity")


def _optimal_chain_len(intervals):
    """Independent DP: max non-overlapping count via sort-by-end +
    binary search (weighted-interval-scheduling DP with unit weights)."""
    ivs = sorted(intervals, key=lambda t: t[1])
    ends = [e for _, e in ivs]
    best = [0] * (len(ivs) + 1)
    for i, (s, e) in enumerate(ivs, 1):
        j = bisect.bisect_right(ends, s, 0, i - 1)
        best[i] = max(best[i - 1], best[j] + 1)
    return best[len(ivs)]


def test_q416_greedy_count_is_dp_optimal(spark, duck):
    """Re-prove the EFT theorem on this data: for every user the greedy
    chain length equals the true optimum from an independent DP."""
    from hoops_edge_database_etl_spark.queries import all_queries

    sel = all_queries()["q416_activity_selection"](spark, SF_DIR).collect()
    got = {}
    for r in sel:
        got[r["uid"]] = got.get(r["uid"], 0) + 1
    raw = duck.execute(
        """
        SELECT user_id,
               CAST(floor(epoch(ts)) AS BIGINT),
               CAST(floor(epoch(ts)) AS BIGINT)
                 + (CAST(floor(value) AS BIGINT) % 240) * 60 + 600
        FROM events
        """
    ).fetchall()
    per_user = {}
    for uid, s, e in raw:
        per_user.setdefault(uid, []).append((s, e))
    for uid, ivs in per_user.items():
        assert got.get(uid, 0) == _optimal_chain_len(ivs), f"user {uid}"


def test_q416_selection_is_valid_chain(spark):
    """Selected intervals per user are pairwise non-overlapping under the
    half-open convention (next start >= previous end)."""
    from hoops_edge_database_etl_spark.queries import all_queries

    sel = all_queries()["q416_activity_selection"](spark, SF_DIR).collect()
    per_user = {}
    for r in sel:
        per_user.setdefault(r["uid"], []).append((r["s"], r["e"]))
    for ivs in per_user.values():
        ivs.sort()
        for (s1, e1), (s2, e2) in zip(ivs, ivs[1:]):
            assert s2 >= e1


def test_q417_murphy_identity(spark):
    """REL - RES + UNC == Brier, exactly (to float ulp), recomputed with
    numpy from the per-bin integer columns — the identity holds because
    forecasts are quantized to their bin."""
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = all_queries()["q417_brier_decomposition"](spark, SF_DIR).collect()
    n = sum(r["n_b"] for r in rows)
    s = sum(r["s_b"] for r in rows)
    rel = sum(r["rel_num_e12"] for r in rows) / n / 1e12
    res = sum(r["res_num_e12"] for r in rows) / n / 1e12
    unc = (s / n) * (1 - s / n)
    brier = float(sum(int(r["brier_num_e12"]) for r in rows)) / n / 1e12
    assert abs((rel - res + unc) - brier) < 1e-9
    # independent recompute of each term from raw integers
    import numpy as np

    n_b = np.array([r["n_b"] for r in rows], dtype=float)
    s_b = np.array([r["s_b"] for r in rows], dtype=float)
    f = np.array([r["f_q_ppm"] for r in rows], dtype=float) / 1e6
    o_b = s_b / n_b
    assert abs(rel - float(np.sum(n_b * (f - o_b) ** 2)) / n) < 1e-9
    assert abs(res - float(np.sum(n_b * (o_b - s / n) ** 2)) / n) < 1e-9


def test_q418_l_bounded_by_k_and_domain(spark):
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = all_queries()["q418_l_diversity"](spark, SF_DIR).collect()
    for r in rows:
        assert 1 <= r["l"] <= min(r["k"], 5)
        assert r["publishable"] == (r["meets_k5"] and r["meets_l3"])


def test_q418_planted_homogeneous_group_fails_l(spark):
    """A big group with one sensitive value is k-anonymous but NOT
    l-diverse — the homogeneity attack the audit exists to catch."""
    from hoops_edge_database_etl_spark.queries.aggregates import l_diversity_audit

    rows = [("g1", f"seg{i % 4}") for i in range(20)] + [
        ("g2", "only_seg")
    ] * 20
    df = spark.createDataFrame(rows, "qi: string, sensitive: string")
    res = {r["qi"]: r for r in l_diversity_audit(df, ["qi"], "sensitive").collect()}
    assert res["g1"]["publishable"] is True
    assert res["g2"]["meets_k5"] is True
    assert res["g2"]["meets_l3"] is False
    assert res["g2"]["publishable"] is False
