"""Aggregate query oracle parity (SURVEY.md §2.4 A1–A14) + plan unit tests."""

from __future__ import annotations

import pytest

from tests.conftest import compare_query

AGG_QUERIES = [
    "q21_weighted_avg",
    "q22_mode_per_group",
    "q23_pearson_corr",
    "q24_error_metrics",
    "q25_group_having",
    "q26_rollup",
    "q27_anomaly_detection",
    "q28_conditional_mean_gap",
    "q29_null_profile",
    "q30_duplicate_stats",
]


@pytest.mark.parametrize("name", AGG_QUERIES)
def test_agg_query_matches_oracle(spark, duck, name):
    compare_query(spark, duck, name)


def test_null_profile_one_scan(spark):
    """The null profile must compute every column in a single aggregate, not
    one scan per column (the reference's loop, audit_lakehouse.py:213-224)."""
    from hoops_edge_database_etl_spark.plans.quality import null_profile

    df = spark.createDataFrame(
        [(1, None, "x"), (2, 5, None), (None, None, "z")], "a int, b int, c string"
    )
    rows = {r["col_name"]: (r["n_nulls"], r["n_rows"]) for r in null_profile(df).collect()}
    assert rows == {"a": (1, 3), "b": (2, 3), "c": (1, 3)}
    # exactly one Aggregate over the source — no unioned per-column scans
    plan = null_profile(df)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("logicalrdd") == 1


def test_duplicate_keys(spark):
    from hoops_edge_database_etl_spark.plans.quality import duplicate_keys

    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b"), (1, "a")], "k int, v string"
    )
    out = duplicate_keys(df, ["k", "v"]).collect()
    assert len(out) == 1 and out[0]["n_rows"] == 3


def test_skyline_kernel_matches_bruteforce():
    """_skyline_kernel (q119) against the O(n²) dominance definition on a
    tie-heavy point set: duplicates of frontier points all survive;
    same-price larger-size points are dominated."""
    import pandas as pd

    from hoops_edge_database_etl_spark.queries.events_analytics import _skyline_kernel

    pts = [
        (1, 100, 5), (2, 100, 5),   # duplicate frontier point — both stay
        (3, 100, 7),                # same price, bigger size — dominated
        (4, 90, 4),                 # smaller size, lower price — frontier
        (5, 110, 9),                # highest price — frontier
        (6, 80, 4),                 # ties q4's size at lower price — dominated
        (7, 120, 1),                # dominates everything possible
        (8, 50, 20),
    ]
    pdf = pd.DataFrame(pts, columns=["p_partkey", "price_c", "size"])

    def dominated(p, q):
        return (
            q[1] >= p[1] and q[2] <= p[2] and (q[1] > p[1] or q[2] < p[2])
        )

    want = sorted(
        p[0] for p in pts if not any(dominated(p, q) for q in pts if q[0] != p[0])
    )
    got = sorted(_skyline_kernel(pdf)["p_partkey"].tolist())
    assert got == want


def test_skyline_two_phase_identity():
    """skyline(skyline(X) ∪ skyline(Y)) == skyline(X ∪ Y) — the identity
    q119's distributed plan relies on, checked on deterministic data."""
    import pandas as pd

    from hoops_edge_database_etl_spark.queries.events_analytics import _skyline_kernel

    pts = [(i, (i * 37) % 100, (i * 53) % 40) for i in range(400)]
    pdf = pd.DataFrame(pts, columns=["p_partkey", "price_c", "size"])
    whole = _skyline_kernel(pdf)
    parts = [pdf.iloc[:133], pdf.iloc[133:266], pdf.iloc[266:]]
    merged = _skyline_kernel(pd.concat([_skyline_kernel(p) for p in parts]))
    key = lambda d: sorted(map(tuple, d[["p_partkey", "price_c", "size"]].to_numpy()))
    assert key(whole) == key(merged)


def test_expectations_all_pass_on_clean_data(spark):
    """The shipped rule set must pass on the generator's clean orders
    table, and observed values must be real metrics (non-null)."""
    from hoops_edge_database_etl_spark.queries import all_queries
    from tests.conftest import SF_DIR

    rows = all_queries()["q151_expectations"](spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["passed"] is True, f"rule {r['rule_id']} failed: {r}"
        assert r["observed"] is not None


def test_chi_square_decomposition(spark):
    """Cell contributions are non-negative and their ordered-fold total is
    what every row carries; expected counts preserve the margins."""
    from hoops_edge_database_etl_spark.queries import all_queries
    from tests.conftest import SF_DIR

    rows = all_queries()["q158_chi_square"](spark, SF_DIR).collect()
    assert rows
    chi2 = {r["chi2"] for r in rows}
    assert len(chi2) == 1
    total = sum(sorted(r["contrib"] for r in rows))
    assert abs(next(iter(chi2)) - total) < 1e-9
    n = sum(r["obs"] for r in rows)
    exp_sum = sum(r["expected"] for r in rows)
    assert abs(exp_sum - n) < 1e-6
    for r in rows:
        assert r["contrib"] >= 0.0


def test_tvd_drift_bounds(spark, duck):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    compare_query(spark, duck, "q168_tvd_drift")
    rows = all_queries()["q168_tvd_drift"](spark, SF_DIR).collect()
    assert {r["col_name"] for r in rows} == {"o_orderpriority", "o_orderstatus"}
    for r in rows:
        assert 0.0 <= r["tvd"] <= 1.0
        assert r["n_before"] > 0 and r["n_after"] > 0


def test_decile_lift_monotone_prefix_property(spark, duck):
    """Cumulative lift starts at the top decile's lift and converges to
    exactly 1.0 over the full population."""
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    compare_query(spark, duck, "q171_decile_lift")
    rows = sorted(
        all_queries()["q171_decile_lift"](spark, SF_DIR).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    assert abs(rows[-1]["cum_lift"] - 1.0) < 1e-12


def test_autocorrelation_in_unit_interval(spark, duck):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    compare_query(spark, duck, "q178_autocorrelation")
    rows = all_queries()["q178_autocorrelation"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r["acf1"] <= 1.0
        assert r["n_pairs"] > 10


def test_confusion_matrix_cells_partition_table(spark, duck):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    compare_query(spark, duck, "q189_confusion_matrix")
    r = all_queries()["q189_confusion_matrix"](spark, SF_DIR).collect()[0]
    n = duck.execute("SELECT COUNT(*) FROM orders").fetchone()[0]
    assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == n
    assert 0.0 <= r["precision_"] <= 1.0 and 0.0 <= r["recall_"] <= 1.0
    p, q = r["precision_"], r["recall_"]
    assert abs(r["f1"] - (2 * p * q / (p + q))) < 1e-12


def test_correlation_matrix_diagonal_consistency(spark, duck):
    """r is symmetric-bounded and the price/qty cell agrees with q23's
    single-pair machinery recomputed in DuckDB."""
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    compare_query(spark, duck, "q193_correlation_matrix")
    rows = {(r["col_a"], r["col_b"]): r["r"]
            for r in all_queries()["q193_correlation_matrix"](spark, SF_DIR).collect()}
    assert len(rows) == 6
    for v in rows.values():
        assert -1.0 <= v <= 1.0
    want = duck.execute(
        "SELECT corr(l_quantity, l_extendedprice) FROM lineitem"
    ).fetchone()[0]
    assert abs(rows[("qty", "price")] - want) < 1e-6


def test_quality_router_partitions_rows(spark, duck):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    compare_query(spark, duck, "q203_quality_router")
    r = all_queries()["q203_quality_router"](spark, SF_DIR).collect()[0]
    n = duck.execute("SELECT COUNT(*) FROM orders").fetchone()[0]
    assert r["n_pass"] + r["n_quarantined"] == n
    assert r["v_null_price"] > 0 and r["v_status"] > 0  # injections fired
    assert r["v_price_range"] == 0 and r["v_date"] == 0  # clean generator


def test_lorenz_concentration_shape(spark, duck):
    """Revenue share must dominate customer share everywhere (sorted by
    spend desc), and both end exactly at 1.0."""
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    compare_query(spark, duck, "q209_lorenz_concentration")
    rows = sorted(
        all_queries()["q209_lorenz_concentration"](spark, SF_DIR).collect(),
        key=lambda r: r["decile"],
    )
    for r in rows:
        assert r["cum_revenue_share"] >= r["cum_customer_share"] - 1e-12
    assert abs(rows[-1]["cum_revenue_share"] - 1.0) < 1e-12
    assert abs(rows[-1]["cum_customer_share"] - 1.0) < 1e-12


def test_benford_shares_sum_to_one_million(spark, duck):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries
    from hoops_edge_database_etl_spark.queries.aggregates import BENFORD_PPM

    compare_query(spark, duck, "q214_benford_digits")
    rows = all_queries()["q214_benford_digits"](spark, SF_DIR).collect()
    assert {r["digit"] for r in rows} == set(range(1, 10))
    assert sum(BENFORD_PPM) == 1_000_000  # the law's shares partition unity
    total_obs = sum(r["observed_ppm"] for r in rows)
    assert 999990 <= total_obs <= 1000000  # integer-floor ppm
    for r in rows:
        assert r["deviation_ppm"] == abs(r["observed_ppm"] - r["expected_ppm"])


def test_emd_drift_scale(spark, duck):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    compare_query(spark, duck, "q215_emd_drift")
    r = all_queries()["q215_emd_drift"](spark, SF_DIR).collect()[0]
    assert 0.0 <= r["emd_bins"] <= 9.0  # at most the grid span
    assert r["emd_numer"] >= 0


def test_ks_dominates_nothing_weird(spark, duck):
    """KS ∈ [0, 1]; and KS ≥ TVD is NOT required (different supports) —
    but KS must be ≥ the CDF gap at any single probe point."""
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    compare_query(spark, duck, "q218_ks_test")
    r = all_queries()["q218_ks_test"](spark, SF_DIR).collect()[0]
    assert 0.0 <= r["ks_stat"] <= 1.0
    probe = duck.execute("""
        WITH s AS (SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) cents
                   FROM events WHERE event_type IN ('click', 'error'))
        SELECT abs(
          (SELECT CAST(COUNT(*) AS DOUBLE) FROM s WHERE event_type='click' AND cents <= 25000)
            / (SELECT COUNT(*) FROM s WHERE event_type='click')
          - (SELECT CAST(COUNT(*) AS DOUBLE) FROM s WHERE event_type='error' AND cents <= 25000)
            / (SELECT COUNT(*) FROM s WHERE event_type='error'))
    """).fetchone()[0]
    assert r["ks_stat"] >= probe - 1e-12


def test_srm_check_balanced_hash_split(spark, duck):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    compare_query(spark, duck, "q219_srm_check")
    rows = all_queries()["q219_srm_check"](spark, SF_DIR).collect()
    assert {r["arm"] for r in rows} == {"control", "treatment"}
    assert sum(r["n"] for r in rows) == 150
    # an honest hash split of 150 users should not scream SRM
    assert sum(r["chi2_contrib"] for r in rows) < 15.0


def test_q239_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q239_hierarchy_rollup")


def test_q239_root_holds_everything(spark):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = {r["node"]: r for r in all_queries()["q239_hierarchy_rollup"](spark, SF_DIR).collect()}
    total = rows[0]
    # root subtree covers every part exactly once
    assert total["n_desc"] == 2000
    # parent subtree strictly contains the child's
    assert rows[0]["subtree_value_cents"] >= rows[1]["subtree_value_cents"]
    assert rows[1]["n_desc"] >= rows[19]["n_desc"]


def test_q241_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q241_k_anonymity")


def test_q241_only_violations_reported(spark):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = all_queries()["q241_k_anonymity"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r["group_size"] < 5
        assert r["l_distinct"] >= 0


def test_q243_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q243_loo_target_encoding")


def test_q243_excludes_self(spark):
    """A row's own target must not be in its encoding: for any segment,
    encodings differ across rows exactly when targets differ."""
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries
    from hoops_edge_database_etl_spark.tables import load
    import pyspark.sql.functions as F

    enc = all_queries()["q243_loo_target_encoding"](spark, SF_DIR)
    o = load(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    j = enc.join(o, "o_orderkey").collect()
    by_seg = {}
    for r in j:
        by_seg.setdefault(r["seg"], []).append((round(r["o_totalprice"] * 100), r["loo_encoding"]))
    for seg, rows in by_seg.items():
        # same target -> same encoding; higher target -> strictly lower LOO mean
        rows.sort()
        for (t1, e1), (t2, e2) in zip(rows, rows[1:]):
            if t1 == t2:
                assert e1 == e2
            else:
                assert e1 > e2


def test_q256_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q256_maxmin_fair_share")


def test_q256_allocation_invariants(spark):
    """Water-filling invariants: Σalloc == capacity, alloc ≤ demand,
    uncapped tenants fully satisfied, capped allocations within 1 token
    of each other and never above any uncapped tenant's demand."""
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = all_queries()["q256_maxmin_fair_share"](spark, SF_DIR).collect()
    total_demand = sum(r["demand_tokens"] for r in rows)
    cap = total_demand // 2
    assert sum(r["alloc_tokens"] for r in rows) == cap
    capped = [r for r in rows if r["capped"] == 1]
    uncapped = [r for r in rows if r["capped"] == 0]
    assert capped, "budget of half the corpus must bind someone"
    for r in rows:
        assert r["alloc_tokens"] <= r["demand_tokens"]
    for r in uncapped:
        assert r["alloc_tokens"] == r["demand_tokens"]
    allocs = [r["alloc_tokens"] for r in capped]
    assert max(allocs) - min(allocs) <= 1
    if uncapped:
        assert max(r["alloc_tokens"] for r in uncapped) <= min(allocs) + 1


def test_q264_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q264_deletion_propagation")


def test_q264_cascade_is_complete(spark, duck):
    """After the simulated purge, no orphaned orders/lineitems remain."""
    orphans = duck.execute("""
      WITH victims AS (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
      o_dead AS (SELECT o_orderkey FROM orders
                 WHERE o_custkey IN (SELECT c_custkey FROM victims))
      SELECT
        (SELECT COUNT(*) FROM orders
         WHERE o_custkey IN (SELECT c_custkey FROM victims)
           AND o_orderkey NOT IN (SELECT o_orderkey FROM o_dead)),
        (SELECT COUNT(*) FROM lineitem
         WHERE l_orderkey IN (SELECT o_orderkey FROM o_dead)
           AND l_orderkey NOT IN (SELECT o_orderkey FROM o_dead))
    """).fetchone()
    assert orphans == (0, 0)


def test_q270_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q270_dependency_profiling")


def test_q270_known_structure(spark):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = {
        r["candidate"]: r
        for r in all_queries()["q270_dependency_profiling"](spark, SF_DIR).collect()
    }
    assert rows["nation.nationkey->regionkey"]["holds"] == 1
    assert rows["orders.orderkey unique"]["holds"] == 1
    assert rows["customer.nationkey->mktsegment"]["holds"] == 0


def test_q276_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q276_ledger_reconciliation")


def test_q276_conservation(spark):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = all_queries()["q276_ledger_reconciliation"](spark, SF_DIR).collect()
    assert sum(r["n_orders"] for r in rows) == 15000
    for r in rows:
        if r["grade"] == "exact":
            assert r["abs_drift_cents"] == 0


def test_q284_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q284_suppressed_rollup")


def test_q284_conservation_and_suppression(spark):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = all_queries()["q284_suppressed_rollup"](spark, SF_DIR).collect()
    assert sum(r["n"] for r in rows) == 1500  # nothing dropped
    for r in rows:
        if r["seg"] != "<suppressed>":
            assert r["n"] >= 5  # no small cell published under its label


def test_q285_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q285_topk_plus_other")


def test_q285_other_conserves_total(spark, duck):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = all_queries()["q285_topk_plus_other"](spark, SF_DIR).collect()
    assert len(rows) == 21  # 20 named + OTHER
    total = duck.execute(
        "SELECT SUM(CAST(floor(l_extendedprice*100+0.5) AS BIGINT)) FROM lineitem"
    ).fetchone()[0]
    assert sum(r["rev_cents"] for r in rows) == total
    other = [r for r in rows if r["part_or_other"] == -1][0]
    assert other["n_members"] > 1


def test_q297_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q297_mann_whitney_u")


def test_q297_u_identity_and_bounds(spark):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    [r] = all_queries()["q297_mann_whitney_u"](spark, SF_DIR).collect()
    # U1 + U2 == n1*n2 (doubled on both sides)
    assert r["u1_doubled"] + r["u2_doubled"] == 2 * r["n1"] * r["n2"]
    assert 0 <= r["u1_doubled"] <= 2 * r["n1"] * r["n2"]
    assert 0.0 <= r["auc_hat"] <= 1.0


def test_q307_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q307_mode_imputation")


def test_q307_repairs_only_holes_with_true_majority(spark, duck):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries
    from hoops_edge_database_etl_spark.queries.aggregates import IMPUTE_DROP_MOD

    rows = all_queries()["q307_mode_imputation"](spark, SF_DIR).collect()
    orig = dict(
        duck.execute("SELECT c_custkey, c_mktsegment FROM customer").fetchall()
    )
    punched = {
        k
        for (k,) in duck.execute(
            f"""SELECT c_custkey FROM customer
            WHERE CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':seg'),
                  1, 8) AS BIGINT) % {IMPUTE_DROP_MOD} = 0"""
        ).fetchall()
    }
    modes = dict(
        duck.execute(
            f"""SELECT c_nationkey, seg FROM (
              SELECT c_nationkey, c_mktsegment AS seg,
                     ROW_NUMBER() OVER (PARTITION BY c_nationkey
                       ORDER BY COUNT(*) DESC, c_mktsegment) AS rn
              FROM customer
              WHERE c_custkey NOT IN (SELECT UNNEST(CAST(? AS BIGINT[])))
              GROUP BY c_nationkey, c_mktsegment) WHERE rn = 1""",
            [list(punched)],
        ).fetchall()
    )
    assert len(rows) == len(orig)
    for r in rows:
        if r["c_custkey"] in punched:
            assert r["was_imputed"]
            assert r["segment"] == modes[r["c_nationkey"]]
        else:
            assert not r["was_imputed"]
            assert r["segment"] == orig[r["c_custkey"]]


def test_q316_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q316_cuped_adjustment")


def test_q316_cuped_reduces_variance(spark, duck):
    """The point of CUPED: Var(Y − θX) <= Var(Y) on the pooled sample
    (guaranteed when θ is the pooled OLS slope). Recomputed from the
    reported exact integer moments plus an independent DuckDB pass."""
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = all_queries()["q316_cuped_adjustment"](spark, SF_DIR).collect()
    assert {r["arm"] for r in rows} == {"control", "treatment"}
    [tn] = {r["theta_numer"] for r in rows}
    [td] = {r["theta_denom"] for r in rows}
    assert td > 0
    theta = tn / td
    n, syy_c, sxx_c, sxy_c = duck.execute(
        """
        WITH per_user AS (
          SELECT user_id,
                 SUM(CASE WHEN event_type = 'click' AND CAST(ts AS DATE) < DATE '2024-01-16'
                          THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS pre,
                 SUM(CASE WHEN event_type = 'purchase' AND CAST(ts AS DATE) >= DATE '2024-01-16'
                          THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS post
          FROM events GROUP BY user_id
        )
        SELECT COUNT(*),
               COUNT(*) * SUM(post * post) - SUM(post) * SUM(post),
               COUNT(*) * SUM(pre * pre) - SUM(pre) * SUM(pre),
               COUNT(*) * SUM(pre * post) - SUM(pre) * SUM(post)
        FROM per_user
        """
    ).fetchone()
    var_y = syy_c
    var_adj = syy_c - 2 * theta * sxy_c + theta * theta * sxx_c
    assert var_adj <= var_y + 1e-9
    assert sxx_c == td and sxy_c == tn


def test_q323_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q323_oneway_anova")


def test_q323_anova_against_scipy_formula(spark, duck):
    """F recomputed from raw group data in pure Python (the textbook
    two-pass formula) must agree to float tolerance."""
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    [r] = all_queries()["q323_oneway_anova"](spark, SF_DIR).collect()
    groups = {}
    for pri, dollars in duck.execute(
        "SELECT o_orderpriority, CAST(floor(o_totalprice + 0.5) AS BIGINT)"
        " FROM orders"
    ).fetchall():
        groups.setdefault(pri, []).append(dollars)
    k = len(groups)
    n = sum(len(v) for v in groups.values())
    grand = sum(sum(v) for v in groups.values()) / n
    ssb = sum(len(v) * (sum(v) / len(v) - grand) ** 2 for v in groups.values())
    ssw = sum(
        sum((x - sum(v) / len(v)) ** 2 for x in v) for v in groups.values()
    )
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert r["n"] == n
    assert abs(r["ssb"] - ssb) / max(ssb, 1) < 1e-9
    assert abs(r["ssw"] - ssw) / max(ssw, 1) < 1e-9
    assert abs(r["f_stat"] - f) / max(abs(f), 1e-9) < 1e-9
    assert 0.0 <= r["eta_squared"] <= 1.0


def test_q327_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q327_diff_in_diff")


def test_q327_did_from_cells(spark):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    [r] = all_queries()["q327_diff_in_diff"](spark, SF_DIR).collect()
    assert r["nt"] > 0 and r["nc"] > 0
    recomputed = (r["st_post"] / r["nt"] - r["st_pre"] / r["nt"]) - (
        r["sc_post"] / r["nc"] - r["sc_pre"] / r["nc"]
    )
    assert abs(r["did_cents"] - recomputed) < 1e-6


def test_q334_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q334_posthoc_pairwise")


def test_q334_pairwise_consistent_with_group_means(spark, duck):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = all_queries()["q334_posthoc_pairwise"](spark, SF_DIR).collect()
    assert len(rows) == 10
    means = dict(
        duck.execute(
            """SELECT o_orderpriority,
               CAST(SUM(CAST(floor(o_totalprice + 0.5) AS BIGINT)) AS DOUBLE)
                 / COUNT(*)
               FROM orders GROUP BY 1"""
        ).fetchall()
    )
    for r in rows:
        expect = means[r["pri_a"]] - means[r["pri_b"]]
        assert abs(r["mean_diff"] - expect) < 1e-6
        assert r["se"] > 0
        assert (r["t_stat"] >= 0) == (r["mean_diff"] >= 0)


def test_q339_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q339_multiclass_eval")


def test_q339_confusion_identities(spark, duck):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = all_queries()["q339_multiclass_eval"](spark, SF_DIR).collect()
    assert len(rows) == 5
    [(n_events,)] = duck.execute("SELECT COUNT(*) FROM events").fetchall()
    # one-vs-rest bookkeeping: sum(tp) + sum(fn) == total (every event has
    # exactly one actual class); same for fp by prediction
    assert sum(r["tp"] + r["fn"] for r in rows) == n_events
    assert sum(r["tp"] + r["fp"] for r in rows) == n_events
    for r in rows:
        assert r["f1_ppm"] == r["tp"] * 2_000_000 // max(2 * r["tp"] + r["fp"] + r["fn"], 1)


def test_q341_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q341_power_mde")


def test_q341_power_algebra(spark):
    import math

    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries
    from hoops_edge_database_etl_spark.queries.aggregates import (
        MDE_TARGET_CENTS,
        Z_ALPHA,
        Z_BETA,
    )

    [r] = all_queries()["q341_power_mde"](spark, SF_DIR).collect()
    var = (r["n"] * r["sxx"] - r["sx"] * r["sx"]) / (r["n"] * (r["n"] - 1))
    assert abs(r["variance"] - var) < 1e-6
    assert r["mde_cents"] > 0
    n_req = math.ceil(
        2 * var * (Z_ALPHA + Z_BETA) ** 2 / MDE_TARGET_CENTS**2
    )
    assert r["n_per_arm_for_target"] == n_req
    # a bigger sample must shrink the MDE: n_req detects the target
    mde_at_req = (Z_ALPHA + Z_BETA) * math.sqrt(var * 2 / n_req)
    assert mde_at_req <= MDE_TARGET_CENTS * 1.01


def test_q342_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q342_isotonic_calibration")


def test_q342_maxmin_equals_textbook_pava(spark):
    """The max-min closed form must equal an independent sequential
    PAVA implementation (the theorem), and be monotone + mass-
    conserving on pooled blocks."""
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = sorted(
        all_queries()["q342_isotonic_calibration"](spark, SF_DIR).collect(),
        key=lambda r: r["bin"],
    )
    assert rows

    # textbook PAVA: pool adjacent violators on (pos, n) blocks
    blocks = [[r["pos"], r["n"]] for r in rows]
    i = 0
    while i < len(blocks) - 1:
        if blocks[i][0] * blocks[i + 1][1] > blocks[i + 1][0] * blocks[i][1]:
            blocks[i][0] += blocks[i + 1][0]
            blocks[i][1] += blocks[i + 1][1]
            del blocks[i + 1]
            i = max(i - 1, 0)
        else:
            i += 1
    expanded = []
    for pos, n in blocks:
        rate = pos / n
        total = 0
        while total < n:
            take = rows[len(expanded)]["n"]
            expanded.append(rate)
            total += take
    assert len(expanded) == len(rows)
    for r, pava in zip(rows, expanded):
        assert abs(r["rate_iso"] - pava) < 1e-9
    iso = [r["rate_iso"] for r in rows]
    assert iso == sorted(iso)  # monotone
    assert abs(
        sum(r["rate_iso"] * r["n"] for r in rows) - sum(r["pos"] for r in rows)
    ) < 1e-6  # pooling conserves total positives


def test_q347_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q347_simpson_guard")


def test_q347_cell_bookkeeping(spark):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = {r["stratum"]: r for r in all_queries()["q347_simpson_guard"](spark, SF_DIR).collect()}
    assert set(rows) == {"0", "1", "2", "ALL"}
    pooled = rows["ALL"]
    assert not pooled["disagrees_with_pooled"]
    for col in ("n1", "c1", "n0", "c0"):
        assert sum(rows[s][col] for s in ("0", "1", "2")) == pooled[col]
    for r in rows.values():
        assert 0 <= r["c1"] <= r["n1"] and 0 <= r["c0"] <= r["n0"]
        assert r["direction"] in (-1, 0, 1)


def test_q348_matches_oracle(spark, duck):
    compare_query(spark, duck, "q348_quantile_treatment_effect")


def test_q348_quantiles_ordered(spark):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = {r["p"]: r for r in all_queries()["q348_quantile_treatment_effect"](spark, SF_DIR).collect()}
    assert set(rows) == {"p25", "p50", "p75"}
    for side in ("q_treat", "q_control"):
        assert rows["p25"][side] <= rows["p50"][side] <= rows["p75"][side]
    for r in rows.values():
        assert r["qte_cents"] == r["q_treat"] - r["q_control"]


def test_q349_matches_oracle(spark, duck):
    compare_query(spark, duck, "q349_hotelling_t2")


def test_q349_t2_distributional_sanity(spark):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = all_queries()["q349_hotelling_t2"](spark, SF_DIR).collect()
    assert rows
    t2s = [r["t2"] for r in rows]
    assert all(t >= 0 for t in t2s)
    # E[T²] = p·(n-1)/(n-... ) ≈ p = 2 for near-normal data; loose band
    mean_t2 = sum(t2s) / len(t2s)
    assert 0.5 < mean_t2 < 8.0
    for r in rows:
        assert r["is_anomaly"] == (r["t2"] > 9.21)


def test_q349_catches_jointly_inconsistent_point(spark):
    """A synthetic day that is marginally typical but correlation-breaking
    must score higher T² than every typical day."""
    import pyspark.sql.functions as FF

    from hoops_edge_database_etl_spark.queries.aggregates import T2_THRESHOLD

    # strongly correlated x ~ y, one point with x high / y low
    pts = [(i, 100 + i, 200 + 2 * i) for i in range(20)] + [(20, 119, 202)]
    df = spark.createDataFrame(pts, "d long, x long, y long")
    mom = df.agg(
        FF.count(FF.lit(1)).alias("n"),
        FF.sum("x").alias("sx"),
        FF.sum("y").alias("sy"),
        FF.sum(FF.col("x") * FF.col("x")).alias("sxx"),
        FF.sum(FF.col("y") * FF.col("y")).alias("syy"),
        FF.sum(FF.col("x") * FF.col("y")).alias("sxy"),
    )
    cov = mom.selectExpr(
        "CAST(sx AS DOUBLE)/n AS mx",
        "CAST(sy AS DOUBLE)/n AS my",
        "(CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx)/(CAST(n AS DOUBLE)*(n-1)) AS cxx",
        "(CAST(n AS DOUBLE)*syy - CAST(sy AS DOUBLE)*sy)/(CAST(n AS DOUBLE)*(n-1)) AS cyy",
        "(CAST(n AS DOUBLE)*sxy - CAST(sx AS DOUBLE)*sy)/(CAST(n AS DOUBLE)*(n-1)) AS cxy",
    )
    t2 = (
        "((x-mx)*(x-mx)*cyy - 2*(x-mx)*(y-my)*cxy + (y-my)*(y-my)*cxx)"
        "/(cxx*cyy-cxy*cxy)"
    )
    scored = {r["d"]: r["t2"] for r in df.crossJoin(cov).selectExpr("d", f"{t2} AS t2").collect()}
    weird = scored.pop(20)
    assert weird > max(scored.values())
    assert weird > T2_THRESHOLD


def test_q355_matches_oracle(spark, duck):
    compare_query(spark, duck, "q355_eb_shrinkage")


def test_q355_shrinkage_properties(spark):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = all_queries()["q355_eb_shrinkage"](spark, SF_DIR).collect()
    assert rows
    g = rows[0]["global_rate"]
    for r in rows:
        lo, hi = sorted((r["raw_rate"], g))
        # shrunk rate lies strictly between raw and prior (or equals both)
        assert lo - 1e-12 <= r["shrunk_rate"] <= hi + 1e-12
        # more data => less shrinkage: distance to raw shrinks with n
        assert abs(r["shrunk_rate"] - r["raw_rate"]) <= abs(g - r["raw_rate"]) + 1e-12


def test_q357_matches_oracle(spark, duck):
    compare_query(spark, duck, "q357_mediation_analysis")


def test_q357_effect_decomposition_identity(spark):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    [r] = all_queries()["q357_mediation_analysis"](spark, SF_DIR).collect()
    # the OLS identity: total == direct + alpha * beta_m, exactly
    assert abs(
        r["total_effect"] - (r["direct_effect"] + r["indirect_effect"])
    ) < 1e-9 * max(1.0, abs(r["total_effect"]))
    assert abs(r["indirect_effect"] - r["alpha"] * r["beta_m"]) < 1e-9


def test_q361_matches_oracle(spark, duck):
    compare_query(spark, duck, "q361_wilson_lower_bound")


def test_q361_wilson_properties(spark):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = all_queries()["q361_wilson_lower_bound"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["wilson_lower"] <= r["raw_rate"]
    # humility: the bound must reorder at least one pair vs raw rates
    by_wilson = [r["l_partkey"] for r in rows]
    by_raw = [
        r["l_partkey"]
        for r in sorted(rows, key=lambda r: (-r["raw_rate"], r["l_partkey"]))
    ]
    assert by_wilson != by_raw


def test_q362_matches_oracle(spark, duck):
    compare_query(spark, duck, "q362_randomization_test")


def test_q362_p_value_bounds_and_planted_effect(spark):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries
    from hoops_edge_database_etl_spark.queries.aggregates import PERM_B

    [r] = all_queries()["q362_randomization_test"](spark, SF_DIR).collect()
    assert 0 <= r["n_extreme"] <= PERM_B
    assert r["p_value_ppm"] == (1 + r["n_extreme"]) * 1_000_000 // (PERM_B + 1)
    assert r["p_value_ppm"] >= 1_000_000 // (PERM_B + 1)  # the exactness floor

    # planted effect: treatment implies conversion; p must hit the floor
    import pyspark.sql.functions as FF

    users = spark.range(200).select(FF.col("id").alias("user_id"))
    coin = (
        FF.conv(
            FF.substring(
                FF.md5(FF.concat(FF.col("user_id").cast("string"), FF.lit(":exp1"))),
                1, 8,
            ), 16, 10,
        ).cast("bigint") % 2
    )
    pu = users.select("user_id", coin.alias("t")).withColumn(
        "y", FF.col("t")  # perfect effect
    )
    fan = pu.select(
        "user_id", "y", FF.explode(FF.sequence(FF.lit(0), FF.lit(PERM_B))).alias("b")
    ).select(
        "y", "b",
        FF.when(FF.col("b") == 0, coin).otherwise(
            FF.conv(
                FF.substring(
                    FF.md5(FF.concat(FF.col("user_id").cast("string"),
                                     FF.lit(":perm:"), FF.col("b").cast("string"))),
                    1, 8,
                ), 16, 10,
            ).cast("bigint") % 2
        ).alias("t"),
    )
    diffs = {
        r["b"]: r["d"]
        for r in fan.groupBy("b")
        .agg(
            (FF.sum(FF.col("t") * FF.col("y")).cast("double") / FF.sum("t")
             - FF.sum((1 - FF.col("t")) * FF.col("y")).cast("double")
             / FF.sum(1 - FF.col("t"))).alias("d")
        )
        .collect()
    }
    obs = diffs.pop(0)
    assert abs(obs - 1.0) < 1e-12
    assert all(abs(d) < abs(obs) for d in diffs.values())


def test_q364_matches_oracle(spark, duck):
    compare_query(spark, duck, "q364_fleiss_kappa")


def test_q364_kappa_vs_python(spark, duck):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    [r] = all_queries()["q364_fleiss_kappa"](spark, SF_DIR).collect()
    ks = [
        k
        for (k,) in duck.execute(
            """SELECT (CASE WHEN value >= 150 THEN 1 ELSE 0 END)
               + (CASE WHEN value >= 140 THEN 1 ELSE 0 END)
               + (CASE WHEN value >= 160 THEN 1 ELSE 0 END) FROM events"""
        ).fetchall()
    ]
    n, m = len(ks), 3
    p_bar = sum(k * k + (m - k) * (m - k) - m for k in ks) / (n * m * (m - 1))
    p1 = sum(ks) / (n * m)
    p_e = p1 * p1 + (1 - p1) * (1 - p1)
    kappa = (p_bar - p_e) / (1 - p_e)
    assert r["n"] == n
    assert abs(r["fleiss_kappa"] - kappa) < 1e-9
    assert -1.0 <= r["fleiss_kappa"] <= 1.0
    # near-identical thresholds => substantial agreement
    assert r["fleiss_kappa"] > 0.5


def test_q365_matches_oracle(spark, duck):
    compare_query(spark, duck, "q365_covariate_balance")


def test_q365_random_split_is_balanced_and_metric_catches_imbalance(spark):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = all_queries()["q365_covariate_balance"](spark, SF_DIR).collect()
    assert {r["cov"] for r in rows} == {"n_events", "click_cents", "active_days"}
    for r in rows:
        # a genuine hash split should be well-balanced at this n
        assert abs(r["smd"]) < 0.5

    # planted imbalance: assign by the covariate itself; SMD must explode
    import math

    xs = list(range(100))
    t = [1 if x >= 50 else 0 for x in xs]
    n1, n0 = sum(t), len(t) - sum(t)
    s1 = sum(x for x, ti in zip(xs, t) if ti)
    s0 = sum(x for x, ti in zip(xs, t) if not ti)
    q1 = sum(x * x for x, ti in zip(xs, t) if ti)
    q0 = sum(x * x for x, ti in zip(xs, t) if not ti)
    v1 = (n1 * q1 - s1 * s1) / (n1 * (n1 - 1))
    v0 = (n0 * q0 - s0 * s0) / (n0 * (n0 - 1))
    smd = (s1 / n1 - s0 / n0) / math.sqrt((v1 + v0) / 2)
    assert abs(smd) > 2.0


def test_q367_matches_oracle(spark, duck):
    compare_query(spark, duck, "q367_capture_recapture")


def test_q367_estimators_near_truth(spark):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    [r] = all_queries()["q367_capture_recapture"](spark, SF_DIR).collect()
    assert r["m"] <= min(r["n1"], r["n2"])
    # near-independent channels: both estimators within 20% of truth
    for est in ("lincoln_petersen", "chapman"):
        assert abs(r[est] - r["true_n"]) <= 0.2 * r["true_n"]
    # Chapman never exceeds Lincoln-Petersen
    assert r["chapman"] <= r["lincoln_petersen"]


def test_q369_matches_oracle(spark, duck):
    compare_query(spark, duck, "q369_regression_discontinuity")


def test_q369_placebo_and_planted_jump(spark, duck):
    import pyspark.sql.functions as FF

    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    [r] = all_queries()["q369_regression_discontinuity"](spark, SF_DIR).collect()
    [(sd,)] = duck.execute(
        """SELECT stddev_samp(y) FROM (
             SELECT SUM(CASE WHEN event_type = 'purchase'
                          AND CAST(ts AS DATE) >= DATE '2024-01-08'
                         THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                         ELSE 0 END) AS y
             FROM events GROUP BY user_id)"""
    ).fetchall()
    assert r["n_below"] > 10 and r["n_above"] > 10
    assert abs(
        r["rdd_effect_cents"] - (r["intercept_above"] - r["intercept_below"])
    ) < 1e-9
    # no real threshold policy exists: the placebo estimate must stay
    # within the outcome's own noise scale (one pooled sd)
    assert abs(r["rdd_effect_cents"]) < sd

    # planted jump: y = 10x + 500·1[x>=0]; the estimator must recover ~500
    pts = [(x, 10 * x + (500 if x >= 0 else 0)) for x in range(-20, 20)]
    df = spark.createDataFrame(pts, "x long, y long")
    mom = df.withColumn("side", (FF.col("x") >= 0).cast("int")).groupBy("side").agg(
        FF.count(FF.lit(1)).alias("n"),
        FF.sum("x").alias("sx"),
        FF.sum("y").alias("sy"),
        FF.sum(FF.col("x") * FF.col("x")).alias("sxx"),
        FF.sum(FF.col("x") * FF.col("y")).alias("sxy"),
    )
    fits = {
        r["side"]: r
        for r in mom.selectExpr(
            "side",
            "(CAST(n AS DOUBLE)*sxy - CAST(sx AS DOUBLE)*sy)"
            "/(CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx) AS slope",
            "(CAST(sy AS DOUBLE)/n) - ((CAST(n AS DOUBLE)*sxy - CAST(sx AS DOUBLE)*sy)"
            "/(CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx)) * (CAST(sx AS DOUBLE)/n)"
            " AS intercept",
        ).collect()
    }
    jump = fits[1]["intercept"] - fits[0]["intercept"]
    assert abs(jump - 500) < 1e-6


def test_q370_matches_oracle(spark, duck):
    compare_query(spark, duck, "q370_overdispersion")


def test_q370_dispersion_identity(spark):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = all_queries()["q370_overdispersion"](spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["mean_k"] > 0 and r["var_k"] >= 0
        assert abs(r["dispersion_index"] - r["var_k"] / r["mean_k"]) < 1e-12
        assert r["overdispersed"] == (r["dispersion_index"] > 1.5)


def test_q378_matches_oracle(spark, duck):
    compare_query(spark, duck, "q378_paired_ttest")


def test_q378_paired_t_vs_python(spark, duck):
    import math

    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    [r] = all_queries()["q378_paired_ttest"](spark, SF_DIR).collect()
    dds = [
        post - pre
        for pre, post in duck.execute(
            """SELECT SUM(CASE WHEN event_type='purchase' AND CAST(ts AS DATE) < DATE '2024-01-16'
                          THEN CAST(floor(value*100+0.5) AS BIGINT) ELSE 0 END),
                      SUM(CASE WHEN event_type='purchase' AND CAST(ts AS DATE) >= DATE '2024-01-16'
                          THEN CAST(floor(value*100+0.5) AS BIGINT) ELSE 0 END)
               FROM events GROUP BY user_id"""
        ).fetchall()
    ]
    n = len(dds)
    mean = sum(dds) / n
    var = sum((d - mean) ** 2 for d in dds) / (n - 1)
    t = mean / math.sqrt(var / n)
    assert r["n"] == n
    assert abs(r["t_stat"] - t) < 1e-9


def test_q379_matches_oracle(spark, duck):
    compare_query(spark, duck, "q379_mcnemar")


def test_q379_cells_partition_and_dominant_model(spark, duck):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    [r] = all_queries()["q379_mcnemar"](spark, SF_DIR).collect()
    [(n,)] = duck.execute("SELECT COUNT(*) FROM events").fetchall()
    assert r["b"] + r["c"] + r["both_right"] + r["both_wrong"] == n
    assert r["mcnemar_chi2"] >= 0

    # strict dominance: model B == truth, model A always wrong on positives
    rows = [(1, 0, 1), (1, 0, 1), (0, 0, 0), (1, 0, 1)]
    df = spark.createDataFrame(rows, "truth int, model_a int, model_b int")
    import pyspark.sql.functions as FF

    [cells] = df.agg(
        FF.sum(FF.when((FF.col("model_a") == FF.col("truth")) & (FF.col("model_b") != FF.col("truth")), 1).otherwise(0)).alias("b"),
        FF.sum(FF.when((FF.col("model_a") != FF.col("truth")) & (FF.col("model_b") == FF.col("truth")), 1).otherwise(0)).alias("c"),
    ).collect()
    assert cells["b"] == 0 and cells["c"] == 3
    assert (cells["b"] - cells["c"]) ** 2 / (cells["b"] + cells["c"]) == 3.0


def test_q380_matches_oracle(spark, duck):
    compare_query(spark, duck, "q380_bland_altman")


def test_q380_rounding_structure(spark):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    [r] = all_queries()["q380_bland_altman"](spark, SF_DIR).collect()
    # dollar-rounding error is within ±50 cents by construction
    assert abs(r["bias_cents"]) < 50
    assert r["loa_lower"] <= r["bias_cents"] <= r["loa_upper"]
    assert -60 < r["loa_lower"] and r["loa_upper"] < 60


def test_q385_matches_oracle(spark, duck):
    compare_query(spark, duck, "q385_design_effect")


def test_q385_icc_vs_python_and_identities(spark, duck):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    [r] = all_queries()["q385_design_effect"](spark, SF_DIR).collect()
    groups = {}
    for uid, cents in duck.execute(
        "SELECT user_id, CAST(floor(value*100+0.5) AS BIGINT) FROM events"
    ).fetchall():
        groups.setdefault(uid, []).append(cents)
    k = len(groups)
    n = sum(len(v) for v in groups.values())
    s = sum(sum(v) for v in groups.values())
    ssb_raw = sum(sum(groups[u]) ** 2 / len(groups[u]) for u in sorted(groups))
    qq = sum(x * x for v in groups.values() for x in v)
    msb = (ssb_raw - s * s / n) / (k - 1)
    msw = (qq - ssb_raw) / (n - k)
    nn2 = sum(len(v) ** 2 for v in groups.values())
    m0 = (n - nn2 / n) / (k - 1)
    icc = (msb - msw) / (msb + (m0 - 1) * msw)
    deff = 1 + (m0 - 1) * icc
    assert r["n_clusters"] == k and r["n_obs"] == n
    assert abs(r["icc"] - icc) < 1e-9
    assert abs(r["deff"] - deff) < 1e-9
    assert abs(r["effective_n"] - n / deff) < 1e-6
    assert -1.0 < r["icc"] < 1.0 and r["deff"] > 0


def test_q386_matches_oracle(spark, duck):
    compare_query(spark, duck, "q386_stratified_ate")


def test_q386_contributions_sum_to_standardized_ate(spark, duck):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = all_queries()["q386_stratified_ate"](spark, SF_DIR).collect()
    assert {r["stratum"] for r in rows} == {0, 1, 2, 3, 4}
    total = sum(r["weighted_contribution"] for r in rows)
    # direct standardization identity: contributions reassemble the ATE
    recomputed = sum(
        r["stratum_effect_cents"] * (r["n1"] + r["n0"]) for r in rows
    ) / sum(r["n1"] + r["n0"] for r in rows)
    assert abs(total - recomputed) < 1e-6
    for r in rows:
        assert r["n1"] > 0 and r["n0"] > 0  # every stratum has both arms


def test_q390_matches_oracle(spark, duck):
    compare_query(spark, duck, "q390_jackknife_ratio")


def test_q390_jackknife_vs_python(spark, duck):
    import math

    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries
    from hoops_edge_database_etl_spark.queries.aggregates import (
        JACKKNIFE_GROUPS,
    )

    [r] = all_queries()["q390_jackknife_ratio"](spark, SF_DIR).collect()
    groups = {}
    for g, rev, clicks in duck.execute(
        f"""SELECT CAST('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':jk'),
                  1, 8) AS BIGINT) % {JACKKNIFE_GROUPS},
                  SUM(CASE WHEN event_type='purchase'
                       THEN CAST(floor(value*100+0.5) AS BIGINT) ELSE 0 END),
                  SUM(CASE WHEN event_type='click' THEN 1 ELSE 0 END)
            FROM events GROUP BY user_id"""
    ).fetchall():
        a, b = groups.get(g, (0, 0))
        groups[g] = (a + rev, b + clicks)
    R = sum(a for a, _ in groups.values())
    C = sum(b for _, b in groups.values())
    thetas = [(R - a) / (C - b) for g, (a, b) in sorted(groups.items())]
    k = len(thetas)
    tbar = sum(thetas) / k
    var = (k - 1) / k * sum((t - tbar) ** 2 for t in thetas)
    assert r["revenue_cents"] == R and r["clicks"] == C
    assert abs(r["var_jack"] - var) < 1e-9 * max(var, 1e-12)
    assert r["se_jack"] > 0
    # the point estimate sits within a few SEs of every LOO estimate
    for t in thetas:
        assert abs(t - r["ratio_cents_per_click"]) < 6 * r["se_jack"] + 1e-9
    assert abs(r["se_jack"] - math.sqrt(var)) < 1e-12


def test_q393_matches_oracle(spark, duck):
    compare_query(spark, duck, "q393_missingness_audit")


def test_q393_recovers_planted_mechanism(spark):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = {r["seg"]: r for r in all_queries()["q393_missingness_audit"](spark, SF_DIR).collect()}
    assert all(r["mcar_rejected"] for r in rows.values())
    building = rows["BUILDING"]["rate_ppm"]
    others = [r["rate_ppm"] for s, r in rows.items() if s != "BUILDING"]
    # planted 1/3 vs 1/10 design: BUILDING ~333k ppm, others ~100k ppm
    assert building > 2 * max(others) * 0.9
    assert 200_000 < building < 500_000
    for v in others:
        assert 30_000 < v < 200_000


def test_q394_matches_oracle(spark, duck):
    compare_query(spark, duck, "q394_negative_binomial_fit")


def test_q394_moment_round_trip(spark):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = all_queries()["q394_negative_binomial_fit"](spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        if r["nb_applicable"]:
            rr, p = r["nb_r"], r["nb_p"]
            assert rr > 0 and 0 < p < 1
            # NB(mean) = r(1-p)/p, NB(var) = r(1-p)/p² — the MoM inverse
            assert abs(rr * (1 - p) / p - r["mean_k"]) < 1e-9
            assert abs(rr * (1 - p) / p / p - r["var_k"]) < 1e-9
        else:
            assert r["nb_r"] is None and r["nb_p"] is None


def test_q395_matches_oracle(spark, duck):
    compare_query(spark, duck, "q395_prevalence_correction")


def test_q395_bayes_and_monotonicity(spark):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = sorted(
        all_queries()["q395_prevalence_correction"](spark, SF_DIR).collect(),
        key=lambda r: r["prev_ppm"],
    )
    assert [r["prev_ppm"] for r in rows] == [10_000, 100_000, 500_000]
    for r in rows:
        pi = r["prev_ppm"] / 1_000_000
        ppv = r["sens"] * pi / (r["sens"] * pi + (1 - r["spec"]) * (1 - pi))
        assert abs(r["ppv"] - ppv) < 1e-12
        assert 0 <= r["ppv"] <= 1 and 0 <= r["npv"] <= 1
    # PPV rises with prevalence, NPV falls
    assert rows[0]["ppv"] < rows[1]["ppv"] < rows[2]["ppv"]
    assert rows[0]["npv"] > rows[2]["npv"]


def test_q396_matches_oracle(spark, duck):
    compare_query(spark, duck, "q396_weighted_kappa")


def test_q396_qwk_vs_python(spark, duck):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    [r] = all_queries()["q396_weighted_kappa"](spark, SF_DIR).collect()
    conf = {}
    for a, b in duck.execute(
        """SELECT CASE WHEN value < 20 THEN 0 WHEN value < 60 THEN 1 ELSE 2 END,
                  CASE WHEN value < 25 THEN 0 WHEN value < 70 THEN 1 ELSE 2 END
           FROM events"""
    ).fetchall():
        conf[(a, b)] = conf.get((a, b), 0) + 1
    n = sum(conf.values())
    wo = sum((a - b) ** 2 * o for (a, b), o in conf.items())
    rowm = {a: sum(o for (x, _), o in conf.items() if x == a) for a in range(3)}
    colm = {b: sum(o for (_, y), o in conf.items() if y == b) for b in range(3)}
    we = sum((a - b) ** 2 * rowm[a] * colm[b] for a in range(3) for b in range(3))
    qwk = 1 - n * wo / we
    assert r["n"] == n and r["wo"] == wo and r["we_scaled"] == we
    assert abs(r["qwk"] - qwk) < 1e-12
    assert 0.5 < r["qwk"] <= 1.0  # near-identical thresholds agree strongly


def test_q397_matches_oracle(spark, duck):
    compare_query(spark, duck, "q397_profit_threshold")


def test_q397_monotone_cells_and_argmax_flag(spark):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = sorted(
        all_queries()["q397_profit_threshold"](spark, SF_DIR).collect(),
        key=lambda r: r["threshold"],
    )
    best = max(r["profit_cents"] for r in rows)
    for a, b in zip(rows, rows[1:]):
        assert b["tp"] <= a["tp"] and b["fp"] <= a["fp"]  # stricter catches less
    for r in rows:
        assert r["is_optimal"] == (r["profit_cents"] == best)
    assert sum(1 for r in rows if r["is_optimal"]) >= 1


def test_q403_matches_oracle(spark, duck):
    compare_query(spark, duck, "q403_effective_size")


def test_q403_diversity_identities(spark):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    [r] = all_queries()["q403_effective_size"](spark, SF_DIR).collect()
    assert 1.0 <= r["effective_suppliers"] <= r["n_suppliers"]
    assert 0.0 < r["evenness"] <= 1.0
    # inverse relation: HHI(bp) * effective ≈ 10^4 (floor-div slack)
    assert abs(r["hhi_bp"] * r["effective_suppliers"] - 10_000) < 100

    # uniform shares => effective == k exactly
    import pyspark.sql.functions as FF

    df = spark.createDataFrame([(i % 10, 1) for i in range(100)], "g int, one int")
    mom = df.groupBy("g").agg(FF.count(FF.lit(1)).alias("n")).agg(
        FF.count(FF.lit(1)).alias("k"),
        FF.sum("n").alias("t"),
        FF.sum(FF.col("n") * FF.col("n")).alias("sq"),
    )
    [m] = mom.collect()
    assert m["t"] ** 2 / m["sq"] == m["k"]


def test_q407_matches_oracle(spark, duck):
    compare_query(spark, duck, "q407_cochran_q")


def test_q407_q_properties(spark):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    [r] = all_queries()["q407_cochran_q"](spark, SF_DIR).collect()
    assert r["cochran_q"] >= 0
    # per-model totals bounded by n
    for t in ("t1", "t2", "t3"):
        assert 0 <= r[t] <= r["n"]
    # k=2 degeneration: Cochran's Q == McNemar's (b-c)^2/(b+c) on a toy set
    # rows: (c1, c2) correctness pairs with b = only-1-right, c = only-2-right
    rows = [(1, 0)] * 5 + [(0, 1)] * 2 + [(1, 1)] * 3 + [(0, 0)] * 2
    t1, t2 = sum(a for a, _ in rows), sum(b for _, b in rows)
    rsum = sum(a + b for a, b in rows)
    r2 = sum((a + b) ** 2 for a, b in rows)
    q = 1 * (2 * (t1 * t1 + t2 * t2) - rsum * rsum) / (2 * rsum - r2)
    b, c = 5, 2
    assert abs(q - (b - c) ** 2 / (b + c)) < 1e-12


def test_q409_matches_oracle(spark, duck):
    compare_query(spark, duck, "q409_partial_correlation")


def test_q409_partial_kills_planted_confound(spark):
    """x and y driven purely by z: raw r_xy large, partial ~ 0."""
    import math
    import random

    rng = [(i, (i * 37) % 100) for i in range(200)]  # deterministic 'volume'
    xs, ys, zs = [], [], []
    for i, z in rng:
        noise_x = (i * 17) % 7 - 3
        noise_y = (i * 29) % 11 - 5
        zs.append(z)
        xs.append(2 * z + noise_x)
        ys.append(5 * z + noise_y)
    n = len(zs)

    def corr(a, b):
        sa, sb = sum(a), sum(b)
        sab = sum(x * y for x, y in zip(a, b))
        saa = sum(x * x for x in a)
        sbb = sum(x * x for x in b)
        return (n * sab - sa * sb) / math.sqrt(
            (n * saa - sa * sa) * (n * sbb - sb * sb)
        )

    rxy, rxz, ryz = corr(xs, ys), corr(xs, zs), corr(ys, zs)
    partial = (rxy - rxz * ryz) / math.sqrt((1 - rxz**2) * (1 - ryz**2))
    assert rxy > 0.99
    assert abs(partial) < 0.3  # the confound is gone

    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    [r] = all_queries()["q409_partial_correlation"](spark, SF_DIR).collect()
    for c in ("rxy", "rxz", "ryz", "partial_rxy_z"):
        assert -1.0 <= r[c] <= 1.0
