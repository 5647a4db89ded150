"""q468–q469: oracle parity plus first-principles replays — runs test
from raw signs (with both rejection directions pinned on synthetic
sequences), Friedman from a scipy-style midrank recompute."""

from __future__ import annotations

from collections import Counter

from tests.conftest import SF_DIR, compare_query


def test_oracle_parity(spark, duck):
    for q in ("q468_runs_test", "q469_friedman_test"):
        compare_query(spark, duck, q)


def _runs_z(signs):
    n1, n2 = signs.count(1), signs.count(0)
    r = 1 + sum(a != b for a, b in zip(signs, signs[1:]))
    n = n1 + n2
    a = 2 * n1 * n2
    mu = a / n + 1
    var = a * (a - n) / (n * n * (n - 1))
    return r, (r - mu) / var**0.5


def test_q468_replay_and_both_directions(spark, duck):
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = all_queries()["q468_runs_test"](spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        daily = duck.execute(
            "SELECT CAST(ts AS DATE) - DATE '2024-01-01' AS d, COUNT(*) "
            "FROM events WHERE event_type = ? GROUP BY 1 ORDER BY d",
            [r["event_type"]],
        ).fetchall()
        n = len(daily)
        s = sum(y for _, y in daily)
        signs = [1 if n * y > s else 0 for _, y in daily if n * y != s]
        rr, z = _runs_z(signs)
        assert (r["n1"], r["n2"], r["r"]) == (
            signs.count(1),
            signs.count(0),
            rr,
        )
        assert abs(r["z"] - z) < 1e-9
        # i.i.d. daily counts: the sign sequence must look random
        assert r["random_at_5pct"] is True
    # calibration, both directions, same formula:
    _, z_alt = _runs_z([1, 0] * 15)  # perfectly alternating -> too MANY runs
    assert z_alt > 1.96
    _, z_blk = _runs_z([1] * 15 + [0] * 15)  # two blocks -> too FEW runs
    assert z_blk < -1.96


def test_q469_friedman_recompute(spark, duck):
    from hoops_edge_database_etl_spark.queries import all_queries

    r = all_queries()["q469_friedman_test"](spark, SF_DIR).collect()[0]
    daily = dict(
        duck.execute(
            "SELECT CAST(ts AS DATE) - DATE '2024-01-01' AS d, COUNT(*) "
            "FROM events WHERE CAST(ts AS DATE) >= DATE '2024-01-01' GROUP BY 1"
        ).fetchall()
    )
    blocks = {}
    for d, y in daily.items():
        blocks.setdefault(d // 7, {})[d % 7] = y
    complete = {b: v for b, v in blocks.items() if len(v) == 7}
    assert r["b"] == len(complete)
    rank_sums = [0.0] * 7
    tsum = 0
    for v in complete.values():
        ys = sorted(v.values())
        for dow, y in v.items():
            lo = ys.index(y)
            t = ys.count(y)
            rank_sums[dow] += lo + (t + 1) / 2  # midrank
        tsum += sum(t**3 - t for t in Counter(ys).values())
    b, k = len(complete), 7
    chi2 = 12 * sum(s * s for s in rank_sums) / (b * k * (k + 1)) - 3 * b * (
        k + 1
    )
    tie_c = 1 - tsum / (b * k * (k * k - 1))
    assert abs(r["chi2_f"] - chi2) < 1e-9
    assert abs(r["tie_c"] - tie_c) < 1e-12
    assert abs(r["chi2_adj"] - chi2 / tie_c) < 1e-9
    assert r["dow_effect_5pct"] == (chi2 / tie_c > 12.592)
    # degeneration anchor: perfectly consistent rankings across blocks
    # drive chi2 to its maximum b*(k-1); verify via a constructed case
    monotone = [{dow: dow + 1 for dow in range(7)} for _ in range(4)]
    rs = [0.0] * 7
    for v in monotone:
        for dow, y in v.items():
            rs[dow] += sorted(v.values()).index(y) + 1
    mx = 12 * sum(s * s for s in rs) / (4 * 7 * 8) - 3 * 4 * 8
    assert abs(mx - 4 * 6) < 1e-9  # b*(k-1) is the maximum for b blocks
