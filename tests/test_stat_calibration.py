"""Power/calibration checks for the hypothesis-test battery (VERDICT r7
item 6, extending the test_detector_discrimination pattern to the
STATISTICAL-TEST queries): each registered test query runs against a
planted fixture where the effect provably exists (the test must FIRE)
and a null fixture where it provably doesn't (the test must stay
QUIET). The oracle pins Spark==DuckDB and the recompute tests pin the
formula; these pin that the statistic actually discriminates. Covers
q218 KS, q459 Spearman, q460 Kruskal-Wallis, q465 Ljung-Box, q468
runs test, q469 Friedman, q478 Cramér-von Mises (batch 1 — the seven
the r7 verdict named), plus q297 Mann-Whitney, q144 Welch, q323 ANOVA,
q158 chi-square, q370 overdispersion, q406 Durbin-Watson (batch 2 —
the rest of the inference suite; batch 2 found and fixed q158's
empty-cell densify gap).
"""

from __future__ import annotations

import datetime as dt

import pytest

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
ORD_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)
LI_SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
    "l_quantity double, l_extendedprice double, l_discount double, "
    "l_tax double, l_returnflag string, l_linestatus string, "
    "l_shipdate timestamp"
)

PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def _qs():
    from hoops_edge_database_etl_spark.queries import all_queries

    return all_queries()


def _day(d: int, i: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 12, 0, 0) + dt.timedelta(days=d, seconds=i)


def _write(spark, tmp_path, table, schema, rows):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / f"{table}.parquet"))
    return str(tmp_path)


def _daily_events(series: dict[str, list[int]]):
    """rows with count series[etype][d] events on day d for each type."""
    rows, eid = [], 0
    for etype, counts in sorted(series.items()):
        for d, c in enumerate(counts):
            for i in range(c):
                rows.append((eid, _day(d, i), 1, etype, 1.0, "{}"))
                eid += 1
    return rows


def _li(rows_spec):
    """(returnflag, qty, price) triples -> full lineitem rows."""
    out = []
    for i, (flag, qty, price) in enumerate(rows_spec):
        out.append(
            (i + 1, 1, 1, 1, float(qty), float(price), 0.0, 0.0, flag, "O",
             _day(0))
        )
    return out


# --- q218 two-sample KS ----------------------------------------------------


def test_q218_ks_zero_on_identical_one_on_disjoint(spark, tmp_path):
    def ev_rows(click_vals, error_vals):
        rows, eid = [], 0
        for v in click_vals:
            rows.append((eid, _day(0, eid), 1, "click", float(v), "{}"))
            eid += 1
        for v in error_vals:
            rows.append((eid, _day(0, eid), 1, "error", float(v), "{}"))
            eid += 1
        return rows

    q = _qs()["q218_ks_test"]
    vals = [v / 2 for v in range(1, 31)]
    sf = _write(spark, tmp_path, "events", EV_SCHEMA, ev_rows(vals, vals))
    [null] = q(spark, sf).collect()
    assert null["ks_numer"] == 0 and null["ks_stat"] == 0.0

    sf = _write(
        spark, tmp_path, "events", EV_SCHEMA,
        ev_rows([1.0] * 20, [9.0] * 25),
    )
    [shift] = q(spark, sf).collect()
    assert shift["ks_stat"] == 1.0
    assert shift["ks_numer"] == shift["na"] * shift["nb"]


# --- q459 Spearman ---------------------------------------------------------


def test_q459_spearman_hits_plus_minus_one_and_zero(spark, tmp_path):
    spec = []
    # 'A': monotone nonlinear (rho exactly +1), 'N': anti-monotone (-1),
    # 'R': the n=4 permutation (2,4,1,3): sum d^2 = 10 -> rho exactly 0
    for i in range(1, 9):
        spec.append(("A", i, i * i))
        spec.append(("N", i, 1000 - i * i))
    for i, p in enumerate([2, 4, 1, 3], start=1):
        spec.append(("R", i, 10 * p))
    sf = _write(spark, tmp_path, "lineitem", LI_SCHEMA, _li(spec))
    rows = {r["l_returnflag"]: r for r in _qs()["q459_spearman_rank_corr"](spark, sf).collect()}
    assert abs(rows["A"]["spearman_rho"] - 1.0) < 1e-12
    assert abs(rows["N"]["spearman_rho"] + 1.0) < 1e-12
    assert abs(rows["R"]["spearman_rho"]) < 1e-12


# --- q460 Kruskal-Wallis ---------------------------------------------------


def _kw_fixture(spark, tmp_path, quantities_by_group):
    li, orders = [], []
    okey = 0
    for g, (prio, qtys) in enumerate(quantities_by_group.items()):
        for qty in qtys:
            okey += 1
            orders.append((okey, 1, "O", 100.0, _day(0), prio))
            li.append((okey, 1, 1, 1, float(qty), 1.0, 0.0, 0.0, "N", "O",
                       _day(0)))
    _write(spark, tmp_path, "orders", ORD_SCHEMA, orders)
    return _write(spark, tmp_path, "lineitem", LI_SCHEMA, li)


def test_q460_kw_quiet_on_identical_groups_fires_on_separated(spark, tmp_path):
    q = _qs()["q460_kruskal_wallis"]
    # all five groups share the identical quantity multiset -> H exactly 0
    sf = _kw_fixture(
        spark, tmp_path, {p: list(range(1, 11)) for p in PRIORITIES}
    )
    [null] = q(spark, sf).collect()
    assert abs(null["h_adj"]) < 1e-9
    assert null["significant_5pct"] is False

    # fully separated blocks of 10 distinct quantities per group:
    # rank sums 55/155/255/355/455 -> H = 47.06 >> 9.488
    sf = _kw_fixture(
        spark,
        tmp_path,
        {p: list(range(10 * g + 1, 10 * g + 11)) for g, p in enumerate(PRIORITIES)},
    )
    [sep] = q(spark, sf).collect()
    assert sep["h_adj"] > 9.488
    assert sep["significant_5pct"] is True
    assert abs(sep["h_adj"] - 47.0588) < 0.01  # closed form for this layout


# --- q465 Ljung-Box --------------------------------------------------------

# fixed 30-day pseudo-random counts with replayed Q_LB = 3.81 (< 14.067)
LB_NOISE = [9, 16, 14, 9, 12, 19, 12, 9, 8, 3, 18, 12, 16, 6, 8, 4, 7, 5,
            11, 12, 20, 8, 7, 11, 2, 4, 6, 5, 15, 7]


def test_q465_ljung_box_fires_on_period2_quiet_on_noise(spark, tmp_path):
    sf = _write(
        spark, tmp_path, "events", EV_SCHEMA,
        _daily_events({"alt": [2, 12] * 15, "noise": LB_NOISE}),
    )
    rows = {r["event_type"]: r for r in _qs()["q465_ljung_box"](spark, sf).collect()}
    # alternating series: replayed Q = 194.13 -> not white noise
    assert rows["alt"]["q_lb"] > 14.067
    assert rows["alt"]["white_noise_5pct"] is False
    assert abs(rows["alt"]["q_lb"] - 194.133) < 0.01
    # planted noise: replayed Q = 3.81 -> white noise at 5%
    assert rows["noise"]["q_lb"] < 14.067
    assert rows["noise"]["white_noise_5pct"] is True
    assert abs(rows["noise"]["q_lb"] - 3.812) < 0.01


# --- q468 runs test --------------------------------------------------------


def test_q468_runs_rejects_both_directions_passes_calm(spark, tmp_path):
    # counts in {1,3}: mean strictly between -> no exact-mean drops
    hi, lo = 3, 1
    series = {
        "alternating": [hi, lo] * 10,          # R = 20: too many runs
        "blocked": [hi] * 10 + [lo] * 10,      # R = 2: too few runs
        "calm": ([hi, hi, lo, lo] * 5),        # R = 10 vs E[R] = 11
    }
    sf = _write(spark, tmp_path, "events", EV_SCHEMA, _daily_events(series))
    rows = {r["event_type"]: r for r in _qs()["q468_runs_test"](spark, sf).collect()}
    assert rows["alternating"]["r"] == 20
    assert rows["alternating"]["z"] > 1.96
    assert rows["alternating"]["random_at_5pct"] is False
    assert rows["blocked"]["r"] == 2
    assert rows["blocked"]["z"] < -1.96
    assert rows["blocked"]["random_at_5pct"] is False
    assert rows["calm"]["r"] == 10
    assert abs(rows["calm"]["z"] + 0.459) < 0.01  # replayed z = -0.459
    assert rows["calm"]["random_at_5pct"] is True


# --- q469 Friedman ---------------------------------------------------------


def test_q469_friedman_fires_on_dow_effect_quiet_on_latin_square(spark, tmp_path):
    q = _qs()["q469_friedman_test"]
    # 4 complete weeks, same strictly-increasing dow profile each week:
    # within-block ranks identical -> chi2_F = 6b = 24 > 12.592
    counts = [1 + 2 * (d % 7) for d in range(28)]
    sf = _write(spark, tmp_path, "events", EV_SCHEMA,
                _daily_events({"x": counts}))
    [eff] = q(spark, sf).collect()
    assert eff["b"] == 4
    assert abs(eff["chi2_adj"] - 24.0) < 1e-9
    assert eff["dow_effect_5pct"] is True

    # 7-week Latin square: every dow takes every within-week rank once
    # -> equal rank sums -> chi2_F exactly 0
    counts = [1 + 2 * (((d % 7) + (d // 7)) % 7) for d in range(49)]
    sf = _write(spark, tmp_path, "events", EV_SCHEMA,
                _daily_events({"x": counts}))
    [null] = q(spark, sf).collect()
    assert null["b"] == 7
    assert abs(null["chi2_adj"]) < 1e-9
    assert null["dow_effect_5pct"] is False


# --- q478 Cramér-von Mises -------------------------------------------------


def _orders_fixture(spark, tmp_path, urgent_vals, low_vals):
    rows, okey = [], 0
    for prio, vals in (("1-URGENT", urgent_vals), ("5-LOW", low_vals)):
        for v in vals:
            okey += 1
            rows.append((okey, 1, "O", float(v), _day(0), prio))
    return _write(spark, tmp_path, "orders", ORD_SCHEMA, rows)


def test_q478_cvm_quiet_on_interleaved_fires_on_disjoint(spark, tmp_path):
    q = _qs()["q478_cramer_von_mises"]
    # perfect interleave: ECDFs differ by <= 1/n everywhere
    # closed form: T = 106800/16000 - 1599/240 = 0.0125 < 0.461
    sf = _orders_fixture(
        spark, tmp_path,
        [10 + 20 * j for j in range(20)], [20 + 20 * j for j in range(20)],
    )
    [null] = q(spark, sf).collect()
    assert abs(null["t_cvm"] - 0.0125) < 1e-9
    assert null["same_distribution_5pct"] is True

    # disjoint supports: T = 10 - 6.6625 = 3.3375 >> 0.461
    sf = _orders_fixture(
        spark, tmp_path,
        [float(j) for j in range(1, 21)], [100.0 + j for j in range(1, 21)],
    )
    [sep] = q(spark, sf).collect()
    assert abs(sep["t_cvm"] - 3.3375) < 1e-9
    assert sep["same_distribution_5pct"] is False


# --- batch 2: the remaining inference suite ---------------------------------


def test_q297_mwu_auc_half_on_identical_extremes_on_separated(spark, tmp_path):
    def ev_rows(view_vals, click_vals):
        rows, eid = [], 0
        for v in view_vals:
            rows.append((eid, _day(0, eid), 1, "view", float(v), "{}"))
            eid += 1
        for v in click_vals:
            rows.append((eid, _day(0, eid), 1, "click", float(v), "{}"))
            eid += 1
        return rows

    q = _qs()["q297_mann_whitney_u"]
    vals = list(range(1, 21))
    sf = _write(spark, tmp_path, "events", EV_SCHEMA, ev_rows(vals, vals))
    [null] = q(spark, sf).collect()
    assert null["auc_hat"] == 0.5  # identical multisets: exact by symmetry
    assert null["u1_doubled"] == null["u2_doubled"]

    sf = _write(
        spark, tmp_path, "events", EV_SCHEMA,
        ev_rows([100 + v for v in vals], vals),
    )
    [sep] = q(spark, sf).collect()
    assert sep["auc_hat"] == 1.0  # every view value beats every click value


def test_q144_welch_zero_on_identical_days_fires_on_shift(spark, tmp_path):
    def ev_rows(click_vals, error_vals):
        rows, eid = [], 0
        for v in click_vals:
            rows.append((eid, _day(0, eid), 1, "click", float(v), "{}"))
            eid += 1
        for v in error_vals:
            rows.append((eid, _day(0, eid), 1, "error", float(v), "{}"))
            eid += 1
        return rows

    q = _qs()["q144_welch_ttest"]
    vals = [10, 12] * 10
    sf = _write(spark, tmp_path, "events", EV_SCHEMA, ev_rows(vals, vals))
    [null] = q(spark, sf).collect()
    assert null["mean_diff"] == 0.0 and null["t_stat"] == 0.0

    sf = _write(
        spark, tmp_path, "events", EV_SCHEMA,
        ev_rows(vals, [1, 3] * 10),
    )
    [shift] = q(spark, sf).collect()
    assert shift["mean_diff"] == 9.0  # (11 - 2) exactly, integer cents
    # replayed: t = 9 / sqrt(2 * (20/19) / 20) = 27.75
    assert abs(shift["t_stat"] - 27.7489) < 0.01


def test_q323_anova_zero_on_identical_groups_fires_on_separated(spark, tmp_path):
    def orders_rows(vals_by_prio):
        rows, okey = [], 0
        for prio, vals in vals_by_prio.items():
            for v in vals:
                okey += 1
                rows.append((okey, 1, "O", float(v), _day(0), prio))
        return rows

    q = _qs()["q323_oneway_anova"]
    same = [100, 110, 120, 130]
    sf = _write(
        spark, tmp_path, "orders", ORD_SCHEMA,
        orders_rows({p: same for p in PRIORITIES}),
    )
    [null] = q(spark, sf).collect()
    assert abs(null["f_stat"]) < 1e-9 and abs(null["eta_squared"]) < 1e-9

    sf = _write(
        spark, tmp_path, "orders", ORD_SCHEMA,
        orders_rows(
            {p: [1000 * g + 1, 1000 * g + 2] for g, p in enumerate(PRIORITIES)}
        ),
    )
    [sep] = q(spark, sf).collect()
    assert sep["f_stat"] > 1000 and sep["eta_squared"] > 0.99


def test_q158_chi2_zero_on_proportional_table_fires_on_disjoint(spark, tmp_path):
    def ev_rows(day_counts_by_type):
        rows, eid = [], 0
        for etype, counts in sorted(day_counts_by_type.items()):
            for d, c in enumerate(counts):
                for i in range(c):
                    rows.append((eid, _day(d, i), 1, etype, 1.0, "{}"))
                    eid += 1
        return rows

    q = _qs()["q158_chi_square"]
    # B is exactly 2x A per day -> every cell perfectly proportional
    base = [10, 20, 10, 5, 10, 10, 15]
    sf = _write(
        spark, tmp_path, "events", EV_SCHEMA,
        ev_rows({"A": base, "B": [2 * c for c in base]}),
    )
    rows = q(spark, sf).collect()
    assert all(r["contrib"] == 0.0 for r in rows)
    assert all(r["chi2"] == 0.0 for r in rows)

    # A only on day 0, B only on day 1 -> maximal association: chi2 = N
    sf = _write(
        spark, tmp_path, "events", EV_SCHEMA,
        ev_rows({"A": [30], "B": [0, 30]}),
    )
    rows = q(spark, sf).collect()
    assert abs(rows[0]["chi2"] - 60.0) < 1e-9  # 2x2 disjoint: chi2 == N


def test_q370_dispersion_zero_on_constant_fires_on_bimodal(spark, tmp_path):
    rows, eid = [], 0
    # 'flat': 10 users x 3 events on day 0 -> var exactly 0
    for u in range(10):
        for i in range(3):
            rows.append((eid, _day(0, i), u, "flat", 1.0, "{}"))
            eid += 1
    # 'burst': 5 users with 1 event, 5 users with 21 -> index ~10
    for u in range(10):
        c = 1 if u < 5 else 21
        for i in range(c):
            rows.append((eid, _day(0, i), 100 + u, "burst", 1.0, "{}"))
            eid += 1
    sf = _write(spark, tmp_path, "events", EV_SCHEMA, rows)
    out = {r["event_type"]: r for r in _qs()["q370_overdispersion"](spark, sf).collect()}
    assert out["flat"]["dispersion_index"] == 0.0
    assert out["flat"]["overdispersed"] is False
    # replayed: mean 11, var = 10*100/9 -> index 1000/99 = 10.101
    assert abs(out["burst"]["dispersion_index"] - 1000 / 99) < 1e-9
    assert out["burst"]["overdispersed"] is True


def test_q406_dw_fires_on_blocked_quiet_on_alternating(spark, tmp_path):
    def ev_rows(series_by_type):
        rows, eid = [], 0
        for etype, ys in sorted(series_by_type.items()):
            for d, y in enumerate(ys):
                rows.append((eid, _day(d), 1, etype, float(y), "{}"))
                eid += 1
        return rows

    sf = _write(
        spark, tmp_path, "events", EV_SCHEMA,
        ev_rows(
            {
                "blocked": [100.0] * 10 + [20.0] * 10,  # replayed DW 0.7714
                "alternating": [100.0, 20.0] * 10,      # replayed DW 3.826
            }
        ),
    )
    out = {r["event_type"]: r for r in _qs()["q406_durbin_watson"](spark, sf).collect()}
    assert abs(out["blocked"]["dw"] - 0.7714) < 0.001
    assert out["blocked"]["positive_autocorr"] is True
    assert abs(out["alternating"]["dw"] - 3.826) < 0.001
    assert out["alternating"]["positive_autocorr"] is False


def test_q214_benford_missing_digit_surfaces_as_max_deviation(spark, tmp_path):
    # every total starts with digit 9 -> digits 1-8 must appear as rows
    # with n=0 and deviation == their full Benford expectation
    rows = [(k + 1, 1, "O", 900.0 + k, _day(0), "1-URGENT") for k in range(10)]
    sf = _write(spark, tmp_path, "orders", ORD_SCHEMA, rows)
    out = {r["digit"]: r for r in _qs()["q214_benford_digits"](spark, sf).collect()}
    assert set(out) == set(range(1, 10))
    assert out[9]["n"] == 10 and out[9]["observed_ppm"] == 1_000_000
    assert out[1]["n"] == 0
    assert out[1]["observed_ppm"] == 0
    assert out[1]["deviation_ppm"] == out[1]["expected_ppm"]  # the loudest flag


def test_q214_benford_subcent_rows_excluded_by_contract(spark, tmp_path):
    # rows whose total rounds below one cent have NO first significant
    # digit in the cents unit — the stated contract excludes them from
    # rows AND the ppm denominator (round-9 ADVICE: previously they
    # produced a d=0 group the 1-9 spine dropped silently, leaving a
    # denominator that counted invisible rows)
    rows = [(k + 1, 1, "O", 900.0, _day(0), "1-URGENT") for k in range(5)]
    rows += [(100 + k, 1, "O", 0.001, _day(0), "1-URGENT") for k in range(3)]
    sf = _write(spark, tmp_path, "orders", ORD_SCHEMA, rows)
    out = {r["digit"]: r for r in _qs()["q214_benford_digits"](spark, sf).collect()}
    assert set(out) == set(range(1, 10))
    assert out[9]["n"] == 5
    # denominator is 5 (the sub-cent rows are out), so digit 9 owns 100%
    assert out[9]["observed_ppm"] == 1_000_000


def test_q219_srm_zero_user_arm_surfaces(spark, tmp_path):
    # find user ids that all hash to ONE arm, simulating a pipeline that
    # dropped the other arm entirely - the exact breakage SRM exists for
    import hashlib

    def arm_of(uid: int) -> str:
        h = int(hashlib.md5(f"{uid}:exp1".encode()).hexdigest()[:8], 16)
        return "control" if h % 2 == 0 else "treatment"

    control_only = [u for u in range(200) if arm_of(u) == "control"][:20]
    rows = [
        (i, _day(0, i), u, "view", 1.0, "{}")
        for i, u in enumerate(control_only)
    ]
    sf = _write(spark, tmp_path, "events", EV_SCHEMA, rows)
    out = {r["arm"]: r for r in _qs()["q219_srm_check"](spark, sf).collect()}
    assert set(out) == {"control", "treatment"}
    assert out["treatment"]["n"] == 0
    # one-armed design: (2*0 - N)^2 / (2N) = N/2 from EACH side
    n = out["control"]["total"]
    assert out["treatment"]["chi2_contrib"] == n / 2.0
    assert out["control"]["chi2_contrib"] == n / 2.0
    assert out["treatment"]["chi2_contrib"] + out["control"]["chi2_contrib"] > 3.84


# --- q405 degree assortativity --------------------------------------------


def test_q405_assortativity_null_on_regular_graph_minus_one_on_star(
    spark, tmp_path
):
    """Round-9 sf1 soak, live: the mod-100 node fold saturates to the
    COMPLETE graph at sf1, every degree equals 99, and the Pearson
    denominator is exactly zero — ANSI Spark threw DIVIDE_BY_ZERO while
    the DuckDB oracle silently emitted NULL. The declared contract is
    now explicit in both engines: zero degree variance → NULL. Closed
    forms: K4 (regular) → NULL with 6 edges; a 4-leaf star → exactly −1
    (every edge pairs the deg-4 hub with a deg-1 leaf)."""
    q = _qs()["q405_degree_assortativity"]

    def orders(pairs):
        return [
            (v, u, "O", 1.0, _day(0, i), "1-URGENT")
            for i, (u, v) in enumerate(pairs)
        ]

    # complete graph on {1,2,3,4}: custkey%100=u, orderkey%100=v
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    sf = _write(spark, tmp_path, "orders", ORD_SCHEMA, orders(k4))
    [row] = q(spark, sf).collect()
    assert row["n_edges"] == 6
    assert row["assortativity"] is None

    # star centered at 0 with leaves 1..4
    star = [(0, 1), (0, 2), (0, 3), (0, 4)]
    sf = _write(spark, tmp_path, "orders", ORD_SCHEMA, orders(star))
    [row] = q(spark, sf).collect()
    assert row["n_edges"] == 4
    assert abs(row["assortativity"] + 1.0) < 1e-12
