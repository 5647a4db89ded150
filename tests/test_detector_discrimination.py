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
q168 TVD, q203 router, q211 rate-limit, q313 Shapley (batch 1 — the
eight VERDICT r6 named), plus q127 MAD, q159 seasonal, q198 Tukey,
q215 EMD, q314 retry storm, q324 double charge, q359 spike attribution,
q442 embedding drift (batch 2 — the remaining detector-named queries).
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


# ---------------------------------------------------------------------------
# Batch 2 (same round): the remaining detector-named queries. q215's test
# below exists because writing it EXPOSED a real definition gap — the
# sparse CDF walk under-counted W1 across empty bins (fixed in-round by
# densifying both engines to the literal 10-bin grid).
# ---------------------------------------------------------------------------


def _write_embeddings(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def test_q127_mad_counts_planted_extremes_and_zero_on_flat(spark, tmp_path):
    """'sig': ten 1.00s, ten 1.01s, one 10.00 -> median 1.01, MAD 0.01,
    exactly one value beyond 3*MAD. 'flat': identical values -> MAD 0 and
    zero outliers (strict > keeps the degenerate stream quiet)."""
    rows, eid = [], 0
    for i in range(10):
        eid += 1
        rows.append(_ev(eid, _ts(0, eid), i, "sig", value=1.00))
    for i in range(10):
        eid += 1
        rows.append(_ev(eid, _ts(0, eid), i, "sig", value=1.01))
    eid += 1
    rows.append(_ev(eid, _ts(0, eid), 99, "sig", value=10.00))
    for i in range(8):
        eid += 1
        rows.append(_ev(eid, _ts(0, eid), i, "flat", value=2.00))
    sf = _write_events(spark, tmp_path, rows)
    out = {r["event_type"]: r for r in _qs()["q127_mad_outliers"](spark, sf).collect()}
    assert out["sig"]["median"] == pytest.approx(1.01)
    assert out["sig"]["mad"] == pytest.approx(0.01)
    assert out["sig"]["n_outliers"] == 1
    assert out["flat"]["mad"] == pytest.approx(0.0)
    assert out["flat"]["n_outliers"] == 0


def test_q159_flags_planted_hourly_spike_on_its_day_only(spark, tmp_path):
    """One (type, hour) slot over 3 days, 5 events/day at 1.00 with a
    single 5.00 planted on day 3: baseline median 1.00, day 3 reports
    n_anomalies=1, the other days 0."""
    rows, eid = [], 0
    for day in range(3):
        for i in range(5):
            eid += 1
            rows.append(_ev(eid, _ts(day, i), i, "view", value=1.00))
    eid += 1
    rows.append(_ev(eid, _ts(2, 30), 50, "view", value=5.00))
    sf = _write_events(spark, tmp_path, rows)
    out = {
        str(r["day"]): (r["n_anomalies"], r["baseline"])
        for r in _qs()["q159_seasonal_anomalies"](spark, sf).collect()
    }
    assert out["2024-01-01"] == (0, pytest.approx(1.00))
    assert out["2024-01-02"] == (0, pytest.approx(1.00))
    assert out["2024-01-03"] == (1, pytest.approx(1.00))


def test_q198_tukey_fences_catch_planted_high_outlier(spark, tmp_path):
    """'sig': ten 1.00s + ten 2.00s + one 10.00 -> p25=100c, p75=200c,
    high fence v>350c, exactly one outlier. 'flat': IQR 0, none."""
    rows, eid = [], 0
    for v in [1.00] * 10 + [2.00] * 10 + [10.00]:
        eid += 1
        rows.append(_ev(eid, _ts(0, eid), eid, "sig", value=v))
    for i in range(6):
        eid += 1
        rows.append(_ev(eid, _ts(0, eid), i, "flat", value=3.00))
    sf = _write_events(spark, tmp_path, rows)
    out = {r["event_type"]: r for r in _qs()["q198_iqr_outliers"](spark, sf).collect()}
    assert (out["sig"]["p25_cents"], out["sig"]["p75_cents"]) == (100, 200)
    assert out["sig"]["n_outliers"] == 1
    assert out["flat"]["n_outliers"] == 0


def test_q215_emd_counts_empty_bins_between_the_distributions(spark, tmp_path):
    """Before-period mass entirely in bin 0, after-period entirely in
    bin 2 (bin 1 EMPTY): W1 must be 2.0 bins. The pre-fix sparse CDF
    walk scored this 1.0 — the definition gap this test was written to
    expose; identical distributions must score 0 (same fixture, both
    periods in bin 0 for the 'null' table is covered by emd=2 implying
    the fix, and the recompute tests cover emd=0)."""
    before, after = dt.datetime(1997, 6, 1), dt.datetime(1998, 6, 1)
    rows = []
    for k in range(10):
        rows.append((2 * k + 1, k, "O", 100.0, before, "P1"))      # bin 0
        rows.append((2 * k + 2, k, "O", 70000.0, after, "P1"))     # bin 2
    sf = _write_orders(spark, tmp_path, rows)
    out = _qs()["q215_emd_drift"](spark, sf).collect()[0]
    assert out["n_before"] == 10 and out["n_after"] == 10
    assert out["emd_bins"] == pytest.approx(2.0)


def test_q314_storm_episode_for_burst_user_only(spark, tmp_path):
    """user 100: five errors 10 min apart -> trailing counts 1..5,
    triggers at the 3rd..5th, ONE episode with 3 triggers, peak 5.
    user 200: three errors 7 h apart (> the 6 h window) -> never >=3,
    absent from the output."""
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        _ev(i + 1, base + dt.timedelta(seconds=600 * i), 100, "error")
        for i in range(5)
    ] + [
        _ev(10 + i, base + dt.timedelta(seconds=25200 * i), 200, "error")
        for i in range(3)
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = _qs()["q314_retry_storm_detector"](spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r["user_id"] == 100
    assert r["n_triggers"] == 3
    assert r["peak_burst"] == 5


def test_q324_double_charge_exact_pairs(spark, tmp_path):
    """user 1: same amount twice within 10 min -> one pair, gap 600 s.
    user 2: same amount 2 days apart -> outside the 24 h window, none.
    user 3: different amounts close together -> none.
    user 4: same amount three times -> only the two CONSECUTIVE pairs
    (the middle-charge NOT EXISTS kills the 1->3 skip pair)."""
    base = dt.datetime(2024, 1, 1, 12, 0, 0)

    def p(eid, uid, sec, amount):
        return _ev(eid, base + dt.timedelta(seconds=sec), uid, "purchase", amount)

    rows = [
        p(1, 1, 0, 50.0), p(2, 1, 600, 50.0),
        p(3, 2, 0, 50.0), p(4, 2, 2 * 86400, 50.0),
        p(5, 3, 0, 50.0), p(6, 3, 60, 60.0),
        p(7, 4, 0, 30.0), p(8, 4, 100, 30.0), p(9, 4, 200, 30.0),
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = sorted(
        (r["user_id"], r["first_charge_id"], r["second_charge_id"], r["gap_seconds"])
        for r in _qs()["q324_double_charge_detector"](spark, sf).collect()
    )
    assert out == [(1, 1, 2, 600), (4, 7, 8, 100), (4, 8, 9, 100)]


def test_q359_attributes_planted_spike_to_its_type(spark, tmp_path):
    """Types A and B at 1.00/day for 5 days; B jumps to 6.00 on day 3.
    Spike day = day 3; A's contribution 0 (share 0), B's 500 cents
    (share 1.0)."""
    rows, eid = [], 0
    for day in range(5):
        eid += 1
        rows.append(_ev(eid, _ts(day, 0), 1, "view", value=1.00))
        eid += 1
        rows.append(
            _ev(eid, _ts(day, 1), 2, "click", value=6.00 if day == 2 else 1.00)
        )
    sf = _write_events(spark, tmp_path, rows)
    out = {r["event_type"]: r for r in _qs()["q359_spike_attribution"](spark, sf).collect()}
    # spike_day is the day INDEX from the 2024-01-01 epoch (see oracle)
    assert out["click"]["spike_day"] == 2
    assert out["view"]["contribution_cents"] == pytest.approx(0.0)
    assert out["click"]["contribution_cents"] == pytest.approx(500.0)
    assert out["view"]["explained_share"] == pytest.approx(0.0)
    assert out["click"]["explained_share"] == pytest.approx(1.0)


def test_q442_planted_directional_drift_per_label(spark, tmp_path):
    """label 0: old and new cohorts share the e1 direction -> cosine 1,
    shift 0. label 1: old on e1, new on e2 -> cosine 0, shift
    2*(4096^2) in quantized units (mean moved one unit in each of two
    dims)."""
    e1 = [1.0] + [0.0] * 63
    e2 = [0.0, 1.0] + [0.0] * 62
    rows = (
        [(i, e1, 0) for i in range(5)]          # label 0 old
        + [(250 + i, e1, 0) for i in range(5)]  # label 0 new: identical
        + [(10 + i, e1, 1) for i in range(5)]   # label 1 old: e1
        + [(260 + i, e2, 1) for i in range(5)]  # label 1 new: e2
    )
    sf = _write_embeddings(spark, tmp_path, rows)
    out = {r["label"]: r for r in _qs()["q442_embedding_drift"](spark, sf).collect()}
    assert out[0]["cos_centroid"] == pytest.approx(1.0)
    assert out[0]["l2_shift_sq"] == pytest.approx(0.0)
    assert out[1]["cos_centroid"] == pytest.approx(0.0)
    assert out[1]["l2_shift_sq"] == pytest.approx(2 * 4096.0**2)


def test_q442_one_sided_label_surfaces_as_drifted(spark, tmp_path):
    """The densify class (q215/q158/q214/q219), drift edition: a label
    present in only ONE cohort — a class that vanished from or appeared
    in the new data — is the loudest drift signal. It must appear with
    its counts, NULL cos/shift (undefined against an absent centroid),
    and drifted=TRUE; pre-r9 the inner (label, k) join dropped it."""
    e1 = [1.0] + [0.0] * 63
    rows = (
        [(i, e1, 0) for i in range(4)]          # label 0: both cohorts
        + [(250 + i, e1, 0) for i in range(4)]
        + [(10 + i, e1, 7) for i in range(3)]   # label 7: OLD only (vanished)
        + [(260 + i, e1, 8) for i in range(5)]  # label 8: NEW only (appeared)
    )
    sf = _write_embeddings(spark, tmp_path, rows)
    out = {r["label"]: r for r in _qs()["q442_embedding_drift"](spark, sf).collect()}
    assert set(out) == {0, 7, 8}
    assert out[0]["drifted"] is False
    assert (out[7]["n_old"], out[7]["n_new"]) == (3, 0)
    assert (out[8]["n_old"], out[8]["n_new"]) == (0, 5)
    for lab in (7, 8):
        assert out[lab]["cos_centroid"] is None
        assert out[lab]["shift_num"] is None
        assert out[lab]["l2_shift_sq"] is None
        assert out[lab]["drifted"] is True


def test_day_gap_semantics_absent_days_are_absent_not_zero(spark, tmp_path):
    """Documents (and pins) a shared semantic of the day-series detectors:
    days with NO events produce no row — they are absent from the series,
    not zero-filled. Consequence: a stream that STOPS entirely emits no
    crater for q27 (no day row to flag) and no changepoint for q167 (the
    observed-day series is still flat). That is the documented contract —
    per-day counts are built from observed rows only, the same in both
    engines — and the monitoring design pairs these with a liveness check
    (q29-style row-count profile) rather than zero-filling, which would
    need a calendar spine and a per-type first/last-seen range."""
    rows, eid = [], 0
    # 'stopper' emits 10/day for days 0-4, then NOTHING for days 5-9
    for day in range(5):
        for i in range(10):
            eid += 1
            rows.append(_ev(eid, _ts(day, i), i, "stopper"))
    # control keeps the date range alive through day 9
    for day in range(10):
        eid += 1
        rows.append(_ev(eid, _ts(day, 50), 1, "alive"))
    sf = _write_events(spark, tmp_path, rows)
    q27 = [
        r
        for r in _qs()["q27_anomaly_detection"](spark, sf).collect()
        if r["event_type"] == "stopper"
    ]
    assert q27 == []  # no zero-day rows exist to flag
    q167 = {
        r["event_type"]: r
        for r in _qs()["q167_cusum_changepoint"](spark, sf).collect()
    }
    # the observed 5-day series is flat -> CUSUM identically 0
    assert q167["stopper"]["max_abs_cusum"] == 0
    assert q167["stopper"]["n_days"] == 5
