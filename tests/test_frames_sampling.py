"""Holt trend smoothing, RANGE window frames, Neyman allocation
(q419-q421): oracle parity plus the recursion-replay / band-recompute /
budget-conservation properties."""

from __future__ import annotations

from tests.conftest import SF_DIR, compare_query


def test_q419_matches_oracle(spark, duck):
    compare_query(spark, duck, "q419_holt_trend")


def test_q420_matches_oracle(spark, duck):
    compare_query(spark, duck, "q420_sql_range_frames")


def test_q421_matches_oracle(spark, duck):
    compare_query(spark, duck, "q421_neyman_allocation")


def _holt_replay(ys):
    s, b = ys[0], 0.0
    for y in ys[1:]:
        s_new = (y + s + b) / 2
        b = (s_new - s + b) / 2
        s = s_new
    return s, b


def test_q419_recursion_replay_exact(spark, duck):
    """Python replay of the Holt recursion from the raw daily series
    matches the fold output bit-for-bit (identical op order)."""
    from hoops_edge_database_etl_spark.queries import all_queries

    daily = duck.execute(
        """
        SELECT event_type,
               CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS d,
               CAST(SUM(CAST(floor(value + 0.5) AS BIGINT)) AS DOUBLE) AS y
        FROM events GROUP BY 1, 2 ORDER BY event_type, d
        """
    ).fetchall()
    series = {}
    for et, _, y in daily:
        series.setdefault(et, []).append(y)
    got = {
        r["event_type"]: (r["level_s"], r["trend_b"], r["forecast_7d"])
        for r in all_queries()["q419_holt_trend"](spark, SF_DIR).collect()
    }
    for et, ys in series.items():
        s, b = _holt_replay(ys)
        assert got[et] == (s, b, s + 7 * b), et


def test_q419_planted_trend_series_converges(spark):
    """A pure linear series y = 10 + 3t: the smoothed trend converges to
    the true slope and the level tracks the last value."""
    from hoops_edge_database_etl_spark.queries.windows import holt_smooth

    rows = [("g", t, 10.0 + 3.0 * t) for t in range(40)]
    daily = spark.createDataFrame(rows, "g: string, d: long, y: double")
    r = holt_smooth(daily, "g").collect()[0]
    assert abs(r["trend_b"] - 3.0) < 0.05
    assert abs(r["level_s"] - (10.0 + 3.0 * 39)) < 1.0
    # replay agreement on the planted series too
    s, b = _holt_replay([10.0 + 3.0 * t for t in range(40)])
    assert (r["level_s"], r["trend_b"]) == (s, b)


def test_q420_bands_recompute_and_diverge_from_rows(spark):
    """Every RANGE band equals a dict-based recompute over bucket
    distance, and RANGE vs ROWS genuinely differ at sparse tails."""
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = all_queries()["q420_sql_range_frames"](spark, SF_DIR).collect()
    by_prio = {}
    for r in rows:
        by_prio.setdefault(r["prio"], {})[r["bucket"]] = r["n"]
    any_diff = False
    for r in rows:
        n = by_prio[r["prio"]]
        assert r["n_trail3"] == sum(
            v for b, v in n.items() if r["bucket"] - 3 <= b <= r["bucket"]
        )
        assert r["n_lead3"] == sum(
            v for b, v in n.items() if r["bucket"] <= b <= r["bucket"] + 3
        )
        assert r["n_band2"] == sum(
            v for b, v in n.items() if abs(b - r["bucket"]) <= 2
        )
        any_diff = any_diff or (r["n_trail3"] != r["n_rows3"])
    assert any_diff  # sparse buckets exist, so the frames are not equivalent


def test_q421_budget_conserved_and_monotone(spark):
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = all_queries()["q421_neyman_allocation"](spark, SF_DIR).collect()
    assert sum(r["alloc"] for r in rows) == 1000
    # allocation ordering follows the Neyman weight N_h * sigma_h
    by_w = sorted(rows, key=lambda r: r["n_h"] * r["sigma_c"])
    allocs = [r["alloc"] for r in by_w]
    assert allocs == sorted(allocs)
    for r in rows:
        assert abs(r["alloc"] - r["neyman_quota"]) <= 1.0


def test_q421_numpy_replay(spark, duck):
    """Independent recompute: cents -> sample std -> largest remainder."""
    import math

    from hoops_edge_database_etl_spark.queries import all_queries

    raw = duck.execute(
        """
        SELECT c_mktsegment, COUNT(*),
               SUM(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)),
               SUM(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
                   * CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
        FROM customer GROUP BY 1
        """
    ).fetchall()
    w = {
        seg: n * math.sqrt((n * sxx - sx * sx) / (n * (n - 1)))
        for seg, n, sx, sxx in raw
    }
    tot = sum(w[s] for s in sorted(w))
    quota = {s: 1000.0 * v / tot for s, v in w.items()}
    base = {s: int(q // 1) for s, q in quota.items()}
    leftover = 1000 - sum(base.values())
    order = sorted(quota, key=lambda s: (-(quota[s] - base[s]), s))
    for s in order[:leftover]:
        base[s] += 1
    got = {
        r["stratum"]: r["alloc"]
        for r in all_queries()["q421_neyman_allocation"](spark, SF_DIR).collect()
    }
    assert got == base
