"""Planted-signal discrimination tests for the pre-r5f detector queries
(VERDICT r6 item 6).

q482 proved a query can be bit-exact against its oracle yet
undiscriminating on the fixture: the hash oracle pins Spark==DuckDB, and
the recompute tests pin the formula, but neither proves the DETECTOR
actually fires on the signal it claims to detect and stays quiet on a
null. Each test here builds a tiny corpus with a KNOWN planted signal,
runs the real registered query against it (same ``load`` path — the
planted tables are written as ``{tmpdir}/{table}.parquet``), and asserts
(a) the planted signal is flagged, exactly, and (b) the null control is
not. Covers: q27 anomaly, q124 attribution, q166 RFM, q167 CUSUM,
q168 TVD, q203 router, q211 rate-limit, q313 Shapley.
"""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
ORD_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


def _qs():
    from hoops_edge_database_etl_spark.queries import all_queries

    return all_queries()


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, EV_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _write_orders(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, ORD_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def _ts(day: int, i: int = 0) -> dt.datetime:
    """Deterministic timestamp on 2024-01-(day+1), i seconds past noon."""
    return dt.datetime(2024, 1, 1 + day, 12, 0, 0) + dt.timedelta(seconds=i)


def _ev(eid, ts, uid, etype, value=1.0):
    return (eid, ts, uid, etype, float(value), "{}")


def test_q27_flags_planted_crater_and_only_it(spark, tmp_path):
    """10 days of 20 views/day with day 5 cratered to 2 events must flag
    exactly (view, day 5); a flat 'click' control stream flags nothing."""
    rows, eid = [], 0
    for day in range(10):
        n = 2 if day == 5 else 20
        for i in range(n):
            eid += 1
            rows.append(_ev(eid, _ts(day, i), i, "view"))
        for i in range(20):
            eid += 1
            rows.append(_ev(eid, _ts(day, 100 + i), i, "click"))
    sf = _write_events(spark, tmp_path, rows)
    out = _qs()["q27_anomaly_detection"](spark, sf).collect()
    assert [(r["event_type"], r["day"], r["n_events"]) for r in out] == [
        ("view", "2024-01-06", 2)
    ]
    # crater day's neighbor avg is (20 + 2 + 20)/3 = 14, and 2 < 7.
    assert out[0]["neighbor_avg"] == pytest.approx(14.0)


def test_q124_credits_planted_touch_sequences_exactly(spark, tmp_path):
    """user 1: view->click->purchase  => (last=click, first=view)
    user 2: purchase with no prior touch => excluded
    user 3: click->purchase->purchase => (click, click) counted twice."""
    rows = [
        _ev(1, _ts(0, 0), 1, "view"),
        _ev(2, _ts(0, 10), 1, "click"),
        _ev(3, _ts(0, 20), 1, "purchase"),
        _ev(4, _ts(0, 0), 2, "purchase"),
        _ev(5, _ts(0, 5), 2, "view"),  # touch AFTER purchase: no credit
        _ev(6, _ts(0, 0), 3, "click"),
        _ev(7, _ts(0, 10), 3, "purchase"),
        _ev(8, _ts(0, 20), 3, "purchase"),
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = {
        (r["last_touch"], r["first_touch"]): r["n_purchases"]
        for r in _qs()["q124_touch_attribution"](spark, sf).collect()
    }
    assert out == {("click", "view"): 1, ("click", "click"): 2}


def test_q166_monotone_customers_land_on_the_diagonal(spark, tmp_path):
    """10 purchasers strictly ordered the SAME way on all three metrics
    (user 0 most recent, most frequent, biggest spender) must fill the
    r_q==f_q==m_q diagonal: 5 cells, 2 users each, nothing off-diagonal."""
    rows, eid = [], 0
    for u in range(10):
        freq = 20 - u  # user 0 buys most often
        for i in range(freq):
            eid += 1
            # user 0 buys latest (most recent); value ordered the same way
            rows.append(
                _ev(eid, _ts(20 - u, i), u, "purchase", value=100.0 - u)
            )
    sf = _write_events(spark, tmp_path, rows)
    out = sorted(
        (r["r_q"], r["f_q"], r["m_q"], r["n_users"])
        for r in _qs()["q166_rfm_segments"](spark, sf).collect()
    )
    assert out == [(q, q, q, 2) for q in range(1, 6)]


def test_q167_finds_planted_level_shift_and_stays_quiet_on_flat(spark, tmp_path):
    """'shift' runs 10/day for days 0-9 then 30/day for days 10-19: the
    max-|CUSUM| day is the regime boundary (day 9). 'flat' at a constant
    rate has CUSUM identically 0."""
    rows, eid = [], 0
    for day in range(20):
        n = 10 if day < 10 else 30
        for i in range(n):
            eid += 1
            rows.append(_ev(eid, _ts(day, i), i, "shift"))
        for i in range(7):
            eid += 1
            rows.append(_ev(eid, _ts(day, 100 + i), i, "flat"))
    sf = _write_events(spark, tmp_path, rows)
    out = {
        r["event_type"]: r
        for r in _qs()["q167_cusum_changepoint"](spark, sf).collect()
    }
    assert str(out["shift"]["change_day"]) == "2024-01-10"  # day index 9
    # |cusum| at the boundary: 10 days * (20*10 - 400) = 2000
    assert out["shift"]["max_abs_cusum"] == 2000
    assert out["flat"]["max_abs_cusum"] == 0


def test_q168_tvd_is_1_on_disjoint_and_0_on_identical(spark, tmp_path):
    """Priority flips completely across the 1998-01-01 split (TVD=1);
    status is identically distributed in both periods (TVD=0)."""
    before, after = dt.datetime(1997, 6, 1), dt.datetime(1998, 6, 1)
    rows = []
    for k in range(10):
        # before: all priority 'A'; after: all priority 'B'
        # status alternates O/F identically in BOTH periods
        st = "O" if k % 2 == 0 else "F"
        rows.append((2 * k + 1, k, st, 100.0, before, "A"))
        rows.append((2 * k + 2, k, st, 100.0, after, "B"))
    sf = _write_orders(spark, tmp_path, rows)
    out = {r["col_name"]: r for r in _qs()["q168_tvd_drift"](spark, sf).collect()}
    assert out["o_orderpriority"]["tvd"] == pytest.approx(1.0)
    assert out["o_orderstatus"]["tvd"] == pytest.approx(0.0)
    assert out["o_orderpriority"]["n_before"] == 10
    assert out["o_orderpriority"]["n_after"] == 10


def test_q203_each_rule_fires_on_its_planted_row_only(spark, tmp_path):
    """One planted violation per rule + one clean row: the router must
    report exactly one hit per rule, one pass, and the clean revenue."""
    ok_date = dt.datetime(1995, 6, 1)
    rows = [
        # o_orderkey 937 -> price nulled in-plan (v_null_price)
        (937, 1, "O", 50.0, ok_date, "P1"),
        # o_orderkey 941 -> status corrupted in-plan to 'Z' (v_status)
        (941, 2, "O", 60.0, ok_date, "P1"),
        # out-of-range price (v_price_range)
        (5, 3, "F", 2_000_000.0, ok_date, "P1"),
        # pre-1990 date (v_date)
        (7, 4, "P", 70.0, dt.datetime(1980, 1, 1), "P1"),
        # clean
        (11, 5, "O", 10.0, ok_date, "P1"),
    ]
    sf = _write_orders(spark, tmp_path, rows)
    out = _qs()["q203_quality_router"](spark, sf).collect()[0]
    assert out["n_pass"] == 1
    assert out["n_quarantined"] == 4
    assert out["v_null_price"] == 1
    assert out["v_price_range"] == 1
    assert out["v_status"] == 1
    assert out["v_date"] == 1
    assert out["clean_cents"] == 1000  # the 10.00 clean row


def test_q211_flags_planted_burst_not_slow_user(spark, tmp_path):
    """user 100 fires 4 events inside one hour (trailing counts 1,2,3,4:
    two exceed RATE_N=2); user 200 fires 3 events > 1h apart (never >1)."""
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        _ev(i + 1, base + dt.timedelta(seconds=600 * i), 100, "view")
        for i in range(4)
    ] + [
        _ev(10 + i, base + dt.timedelta(seconds=4000 * i), 200, "view")
        for i in range(3)
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = _qs()["q211_rate_limit_violations"](spark, sf).collect()
    assert len(out) == 1 and out[0]["user_id"] == 100
    assert out[0]["n_events"] == 4
    assert out[0]["n_violating"] == 2
    assert out[0]["max_hourly_rate"] == 4


def test_q313_planted_game_has_closed_form_shapley(spark, tmp_path):
    """Planted coalition game with hand-derivable exact values:
    user A touched {view} and converted       -> v(S)=+1 iff view in S
    user B touched {click,signup}, converted  -> +1 iff {click,signup}<=S
    user C touched all three, did NOT convert -> contributes nothing.
    Closed form (x6 weights 2,1,1,2): view=6, click=signup=3 — symmetry
    (click==signup), dummy-noise invariance (C), and efficiency
    (sum x6 == 6*(v(grand)-v(empty)) == 12) all in one fixture."""
    rows = [
        _ev(1, _ts(0, 0), 1, "view"),
        _ev(2, _ts(0, 10), 1, "purchase"),
        _ev(3, _ts(0, 0), 2, "click"),
        _ev(4, _ts(0, 5), 2, "signup"),
        _ev(5, _ts(0, 10), 2, "purchase"),
        _ev(6, _ts(0, 0), 3, "view"),
        _ev(7, _ts(0, 5), 3, "click"),
        _ev(8, _ts(0, 10), 3, "signup"),
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = {
        r["channel"]: r["shapley_x6"]
        for r in _qs()["q313_shapley_attribution"](spark, sf).collect()
    }
    assert out == {"view": 6, "click": 3, "signup": 3}
    assert sum(out.values()) == 12  # efficiency: 6 * (v(7) - v(0)) = 6*2
