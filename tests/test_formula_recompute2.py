"""Shared-formula audit, batch 2: the statistics queries registered BEFORE
the r5 block (q23–q293 families) get the same independent-recomputation
treatment as tests/test_formula_recompute.py — textbook-route rederivation
from raw tables (np.corrcoef, np.linalg.lstsq, searchsorted CDFs, float
(o−e)²/e chains, python NTILE replays, eigensolver cross-checks) so a
formula bug shared by the Spark query and its DuckDB oracle cannot hide
behind hash parity."""

from __future__ import annotations

import hashlib
import math

import numpy as np

from tests.conftest import SF_DIR


def _q(spark, name):
    from hoops_edge_database_etl_spark.queries import all_queries

    return all_queries()[name](spark, SF_DIR).collect()


def _arm(uid, salt=":exp1", mod=2):
    return int(hashlib.md5(f"{uid}{salt}".encode()).hexdigest()[:8], 16) % mod


def _close(a, b, rel=1e-9):
    assert abs(a - b) <= rel * max(abs(a), abs(b), 1e-12), (a, b)


# --- correlations ----------------------------------------------------------


def test_q23_pearson_vs_numpy_corrcoef(spark, duck):
    rows = {r["l_returnflag"]: r for r in _q(spark, "q23_pearson_corr")}
    raw = duck.execute(
        "SELECT l_returnflag, l_quantity, l_extendedprice FROM lineitem"
    ).fetchall()
    per = {}
    for f, x, y in raw:
        per.setdefault(f, ([], []))
        per[f][0].append(float(x))
        per[f][1].append(float(y))
    for f, (xs, ys) in per.items():
        r = float(np.corrcoef(xs, ys)[0, 1])
        assert rows[f]["n_rows"] == len(xs)
        _close(rows[f]["qty_price_corr"], r, 1e-9)


def test_q193_correlation_matrix_vs_numpy(spark, duck):
    rows = {(r["col_a"], r["col_b"]): r["r"] for r in _q(spark, "q193_correlation_matrix")}
    raw = np.array(
        duck.execute(
            "SELECT CAST(floor(l_quantity*100+0.5) AS BIGINT),"
            " CAST(floor(l_extendedprice*100+0.5) AS BIGINT),"
            " CAST(floor(l_discount*100+0.5) AS BIGINT),"
            " CAST(floor(l_tax*100+0.5) AS BIGINT) FROM lineitem"
        ).fetchall(),
        dtype=np.float64,
    )
    cm = np.corrcoef(raw, rowvar=False)
    names = ["qty", "price", "disc", "tax"]
    for i in range(4):
        for j in range(i + 1, 4):
            _close(rows[(names[i], names[j])], float(cm[i, j]), 1e-9)


def test_q178_acf1_vs_numpy(spark, duck):
    rows = {r["l_returnflag"]: r for r in _q(spark, "q178_autocorrelation")}
    daily = duck.execute(
        "SELECT l_returnflag, CAST(l_shipdate AS DATE),"
        " CAST(SUM(CAST(floor(l_extendedprice*100+0.5) AS BIGINT)) AS BIGINT)"
        " FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    per = {}
    for f, _, cents in daily:
        per.setdefault(f, []).append(cents)
    for f, series in per.items():
        x, y = np.array(series[:-1], float), np.array(series[1:], float)
        _close(rows[f]["acf1"], float(np.corrcoef(x, y)[0, 1]), 1e-9)
        assert rows[f]["n_pairs"] == len(x)


def test_q405_assortativity_is_endpoint_degree_corrcoef(spark, duck):
    [r] = _q(spark, "q405_degree_assortativity")
    edges = {
        (min(u, v), max(u, v))
        for u, v in duck.execute(
            "SELECT o_custkey % 100, o_orderkey % 100 FROM orders"
            " WHERE o_custkey % 100 <> o_orderkey % 100"
        ).fetchall()
    }
    deg = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    ku = [deg[u] for u, v in edges] + [deg[v] for u, v in edges]
    kv = [deg[v] for u, v in edges] + [deg[u] for u, v in edges]
    assert r["n_edges"] == len(edges)
    _close(r["assortativity"], float(np.corrcoef(ku, kv)[0, 1]), 1e-9)


# --- regression ------------------------------------------------------------


def test_q120_grouped_ols_vs_lstsq(spark, duck):
    rows = {r["p_brand"]: r for r in _q(spark, "q120_grouped_ols")}
    raw = duck.execute(
        "SELECT p.p_brand, l.l_quantity, l.l_extendedprice"
        " FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey"
    ).fetchall()
    per = {}
    for b, x, y in raw:
        per.setdefault(b, ([], []))
        per[b][0].append(float(x))
        per[b][1].append(float(y))
    for b, (xs, ys) in per.items():
        A = np.column_stack([np.ones(len(xs)), xs])
        coef = np.linalg.lstsq(A, np.array(ys), rcond=None)[0]
        assert rows[b]["n_rows"] == len(xs)
        _close(rows[b]["slope"], float(coef[1]), 1e-6)
        _close(rows[b]["intercept"], float(coef[0]), 1e-6)


def test_q152_ols_scoring_vs_lstsq_and_residuals(spark, duck):
    rows = {r["l_returnflag"]: r for r in _q(spark, "q152_ols_scoring")}
    raw = duck.execute(
        "SELECT l_returnflag, CAST(floor(l_quantity*100+0.5) AS BIGINT),"
        " CAST(floor(l_extendedprice*100+0.5) AS BIGINT) FROM lineitem"
    ).fetchall()
    per = {}
    for f, x, y in raw:
        per.setdefault(f, ([], []))
        per[f][0].append(x)
        per[f][1].append(y)
    for f, (xs, ys) in per.items():
        X = np.array(xs, float)
        Y = np.array(ys, float)
        coef = np.linalg.lstsq(np.column_stack([np.ones(len(X)), X]), Y, rcond=None)[0]
        resid = Y - (coef[0] + coef[1] * X)
        r = rows[f]
        _close(r["slope"], float(coef[1]), 1e-6)
        _close(r["intercept_cents"], float(coef[0]), 1e-6)
        _close(r["rmse_cents"], float(np.sqrt(np.mean(resid**2))), 1e-6)
        _close(r["max_abs_residual_cents"], float(np.max(np.abs(resid))), 1e-6)


# --- two-sample tests ------------------------------------------------------


def test_q144_welch_vs_numpy(spark, duck):
    rows = {str(r["day"]): r for r in _q(spark, "q144_welch_ttest")}
    raw = duck.execute(
        "SELECT CAST(CAST(ts AS DATE) AS VARCHAR), event_type,"
        " CAST(floor(value*100+0.5) AS BIGINT) FROM events"
        " WHERE event_type IN ('click', 'error')"
    ).fetchall()
    per = {}
    for day, et, cents in raw:
        per.setdefault(day, {"click": [], "error": []})[et].append(cents)
    n_checked = 0
    for day, arms in per.items():
        a, b = np.array(arms["click"], float), np.array(arms["error"], float)
        if len(a) < 2 or len(b) < 2:
            assert day not in rows
            continue
        t = (a.mean() - b.mean()) / math.sqrt(
            a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)
        )
        r = rows[day]
        assert (r["n1"], r["n2"]) == (len(a), len(b))
        _close(r["mean_diff"], (a.mean() - b.mean()) / 100.0, 1e-9)
        _close(r["t_stat"], t, 1e-9)
        n_checked += 1
    assert n_checked == len(rows) > 0


def test_q218_ks_vs_numpy_searchsorted(spark, duck):
    [r] = _q(spark, "q218_ks_test")
    raw = duck.execute(
        "SELECT event_type, CAST(floor(value*100+0.5) AS BIGINT) FROM events"
        " WHERE event_type IN ('click', 'error')"
    ).fetchall()
    a = np.sort(np.array([c for t, c in raw if t == "click"]))
    b = np.sort(np.array([c for t, c in raw if t == "error"]))
    support = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(a, support, side="right") / len(a)
    fb = np.searchsorted(b, support, side="right") / len(b)
    d = float(np.max(np.abs(fa - fb)))
    assert (r["na"], r["nb"]) == (len(a), len(b))
    _close(r["ks_stat"], d, 1e-9)


def test_q158_chi_square_vs_float_chain(spark, duck):
    """(o−e)²/e float route vs the engines' integer identity
    (oN−RC)²/(NRC), plus the chi² total."""
    rows = _q(spark, "q158_chi_square")
    raw = duck.execute(
        "SELECT event_type,"
        " (CAST(floor(epoch(ts)) AS BIGINT) // 86400 + 4) % 7 FROM events"
    ).fetchall()
    obs, rn, cn = {}, {}, {}
    for et, dow in raw:
        obs[(et, dow)] = obs.get((et, dow), 0) + 1
        rn[et] = rn.get(et, 0) + 1
        cn[dow] = cn.get(dow, 0) + 1
    n = len(raw)
    chi2 = 0.0
    contribs = {}
    for (et, dow), o in obs.items():
        e = rn[et] * cn[dow] / n
        contribs[(et, dow)] = (o - e) ** 2 / e
    chi2 = sum(contribs[k] for k in sorted(contribs))
    assert len(rows) == len(obs)
    for r in rows:
        k = (r["event_type"], r["dow"])
        assert r["obs"] == obs[k]
        _close(r["expected"], rn[r["event_type"]] * cn[r["dow"]] / n, 1e-12)
        _close(r["contrib"], contribs[k], 1e-9)
        _close(r["chi2"], chi2, 1e-9)


def test_q219_srm_vs_hashlib_recount(spark, duck):
    rows = {r["arm"]: r for r in _q(spark, "q219_srm_check")}
    users = [u for (u,) in duck.execute("SELECT DISTINCT user_id FROM events").fetchall()]
    n_c = sum(1 for u in users if _arm(u) == 0)
    counts = {"control": n_c, "treatment": len(users) - n_c}
    for arm, n in counts.items():
        r = rows[arm]
        assert r["n"] == n and r["total"] == len(users)
        # float route: (n - N/2)^2 / (N/2)
        _close(r["chi2_contrib"], (n - len(users) / 2) ** 2 / (len(users) / 2), 1e-12)


# --- drift -----------------------------------------------------------------


def test_q168_tvd_vs_float_route(spark, duck):
    rows = {r["col_name"]: r for r in _q(spark, "q168_tvd_drift")}
    for col in ("o_orderpriority", "o_orderstatus"):
        raw = duck.execute(
            f"SELECT {col}, CAST(o_orderdate < TIMESTAMP '1998-01-01' AS INTEGER)"
            " FROM orders"
        ).fetchall()
        c1, c2 = {}, {}
        for cat, before in raw:
            (c1 if before else c2)[cat] = (c1 if before else c2).get(cat, 0) + 1
        n1, n2 = sum(c1.values()), sum(c2.values())
        cats = set(c1) | set(c2)
        tvd = 0.5 * sum(abs(c1.get(c, 0) / n1 - c2.get(c, 0) / n2) for c in cats)
        r = rows[col]
        assert (r["n_before"], r["n_after"], r["n_categories"]) == (n1, n2, len(cats))
        _close(r["tvd"], tvd, 1e-12)


def test_q215_emd_vs_float_cdf(spark, duck):
    [r] = _q(spark, "q215_emd_drift")
    raw = duck.execute(
        "SELECT CAST(least(floor(o_totalprice / 30000), 9) AS BIGINT),"
        " CAST(o_orderdate < TIMESTAMP '1998-01-01' AS INTEGER) FROM orders"
    ).fetchall()
    c1 = [0] * 10
    c2 = [0] * 10
    for b, before in raw:
        (c1 if before else c2)[b] += 1
    n1, n2 = sum(c1), sum(c2)
    f1 = np.cumsum(c1) / n1
    f2 = np.cumsum(c2) / n2
    # both engines now densify to the literal 10-bin grid (round 7), so
    # this dense recompute matches BY CONSTRUCTION on any data — the
    # gappy-grid case is pinned by the planted discrimination test
    emd = float(np.sum(np.abs(f1 - f2)))
    assert (r["n_before"], r["n_after"]) == (n1, n2)
    _close(r["emd_bins"], emd, 1e-12)


def test_q214_benford_constants_and_observed(spark, duck):
    from hoops_edge_database_etl_spark.queries.aggregates import BENFORD_PPM

    for d, ppm in enumerate(BENFORD_PPM, start=1):
        assert abs(ppm - math.log10(1 + 1 / d) * 1_000_000) <= 1.0
    assert sum(BENFORD_PPM) in (999_999, 1_000_000)  # distribution sums to 1
    rows = {r["digit"]: r for r in _q(spark, "q214_benford_digits")}
    digits = [
        int(str(c)[0])
        for (c,) in duck.execute(
            "SELECT CAST(floor(o_totalprice*100+0.5) AS BIGINT) FROM orders"
            " WHERE o_totalprice > 0"
        ).fetchall()
    ]
    total = len(digits)
    for d in set(digits):
        n = digits.count(d)
        r = rows[d]
        assert r["n"] == n
        assert r["observed_ppm"] == n * 1_000_000 // total
        assert r["deviation_ppm"] == abs(r["observed_ppm"] - r["expected_ppm"])


# --- rank/NTILE machinery --------------------------------------------------


def _ntile10(ranked):
    """NTILE(10) semantics: first (n mod 10) tiles get ceil(n/10) rows."""
    n = len(ranked)
    base, rem = divmod(n, 10)
    out, i = [], 0
    for tile in range(1, 11):
        size = base + (1 if tile <= rem else 0)
        out.extend((tile, item) for item in ranked[i : i + size])
        i += size
    return out


def test_q171_decile_lift_vs_python_ntile(spark, duck):
    rows = {r["decile"]: r for r in _q(spark, "q171_decile_lift")}
    u = duck.execute(
        "SELECT o_custkey,"
        " CAST(SUM(CAST(floor(o_totalprice*100+0.5) AS BIGINT)) AS BIGINT),"
        " CAST(MAX(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)"
        " AS BIGINT) FROM orders GROUP BY o_custkey"
    ).fetchall()
    ranked = sorted(u, key=lambda t: (-t[1], t[0]))
    tiles = {}
    for tile, (ck, score, pos) in _ntile10(ranked):
        n, p = tiles.get(tile, (0, 0))
        tiles[tile] = (n + 1, p + pos)
    tot_n = sum(n for n, _ in tiles.values())
    tot_p = sum(p for _, p in tiles.values())
    cum_n = cum_p = 0
    for tile in range(1, 11):
        n, p = tiles[tile]
        cum_n += n
        cum_p += p
        r = rows[tile]
        assert (r["n_custs"], r["n_pos"]) == (n, p)
        _close(r["rate"], p / n, 1e-12)
        _close(r["cum_lift"], (cum_p * tot_n) / (cum_n * tot_p), 1e-12)


def test_q209_lorenz_vs_python_ntile(spark, duck):
    rows = {r["decile"]: r for r in _q(spark, "q209_lorenz_concentration")}
    u = duck.execute(
        "SELECT o_custkey,"
        " CAST(SUM(CAST(floor(o_totalprice*100+0.5) AS BIGINT)) AS BIGINT)"
        " FROM orders GROUP BY o_custkey"
    ).fetchall()
    ranked = sorted(u, key=lambda t: (-t[1], t[0]))
    tiles = {}
    for tile, (ck, cents) in _ntile10(ranked):
        n, s = tiles.get(tile, (0, 0))
        tiles[tile] = (n + 1, s + cents)
    tot_n = sum(n for n, _ in tiles.values())
    tot_s = sum(s for _, s in tiles.values())
    cum_n = cum_s = 0
    for tile in range(1, 11):
        n, s = tiles[tile]
        cum_n += n
        cum_s += s
        r = rows[tile]
        assert (r["n_custs"], r["cents"]) == (n, s)
        _close(r["cum_revenue_share"], cum_s / tot_s, 1e-12)
        _close(r["cum_customer_share"], cum_n / tot_n, 1e-12)
    # Lorenz monotonicity: revenue share always >= customer share when
    # ranked rich-first
    assert all(
        rows[t]["cum_revenue_share"] >= rows[t]["cum_customer_share"] - 1e-12
        for t in range(1, 11)
    )


# --- quantile selection ----------------------------------------------------


def test_q198_iqr_vs_sorted_selection_and_float_fences(spark, duck):
    rows = {r["event_type"]: r for r in _q(spark, "q198_iqr_outliers")}
    raw = duck.execute(
        "SELECT event_type, CAST(floor(value*100+0.5) AS BIGINT) FROM events"
    ).fetchall()
    per = {}
    for et, c in raw:
        per.setdefault(et, []).append(c)
    for et, cs in per.items():
        cs.sort()
        n = len(cs)
        p25 = cs[math.ceil(0.25 * n) - 1]
        p75 = cs[math.ceil(0.75 * n) - 1]
        iqr = p75 - p25
        n_out = sum(1 for c in cs if c < p25 - 1.5 * iqr or c > p75 + 1.5 * iqr)
        r = rows[et]
        assert (r["p25_cents"], r["p75_cents"]) == (p25, p75)
        assert r["n_events"] == n and r["n_outliers"] == n_out


def test_q162_weighted_median_vs_sorted_cumsum(spark, duck):
    rows = {r["source"]: r for r in _q(spark, "q162_weighted_median")}
    raw = duck.execute(
        "SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT),"
        " CAST(n_chars AS DOUBLE) FROM documents"
    ).fetchall()
    per = {}
    for s, w, v in raw:
        per.setdefault(s, []).append((v, w))
    for s, pairs in per.items():
        pairs.sort()
        tw = sum(w for _, w in pairs)
        half = math.ceil(0.5 * tw)
        cum = 0
        for v, w in pairs:
            cum += w
            if cum >= half:
                med = v
                break
        r = rows[s]
        assert r["total_weight"] == tw
        _close(r["weighted_median"], med, 1e-12)


# --- eigensolver cross-check ----------------------------------------------


def test_q141_pca_exact_integer_replay_and_rayleigh(spark, duck):
    """Two checks with different jobs.  (1) A bit-exact third-engine
    replay: the whole fixed-point pipeline (12-bit quantize, int gram,
    floor double-divide by n, 8 matvec sweeps with 2^20 renormalization,
    sign fix) re-run in numpy integer arithmetic must equal the Spark
    output EXACTLY — the DuckDB oracle already replays it, so this is
    the independent third engine.  (2) A semantic bound via LAPACK: the
    synthetic embeddings are near-isotropic (eigengap ratio ~0.984), so
    8 power sweeps CANNOT isolate the top eigenvector (audit finding:
    cosine to eigh's top direction is only ~0.59) — the honest claim,
    now in the docstring, is a NEAR-DOMINANT direction, checked as
    Rayleigh quotient >= 0.94 of the true top eigenvalue (measured
    0.954; exceeds lambda_4/lambda_1 = 0.927, so v lives in the top of
    the spectrum)."""
    rows = _q(spark, "q141_pca_power_iteration")
    sv = np.zeros(len(rows), dtype=np.int64)
    for r in rows:
        sv[r["dim"]] = r["v"]
    emb = duck.execute("SELECT embedding FROM embeddings").fetchall()
    Qm = np.floor(
        np.array([e for (e,) in emb], dtype=np.float64) * 4096 + 0.5
    ).astype(np.int64)
    n = len(Qm)
    gs = Qm.T.astype(object) @ Qm.astype(object)  # exact integer gram
    gv = np.floor(np.array(gs, dtype=np.float64) / float(n)).astype(np.int64)
    S = 1 << 20
    v = np.full(gv.shape[0], S, dtype=np.int64)
    for _ in range(8):
        w = gv.astype(object) @ v.astype(object)
        m = max(abs(int(x)) for x in w)
        v = np.array(
            [int(np.floor(float(int(x)) * float(S) / float(m))) for x in w],
            dtype=np.int64,
        )
    if v.sum() < 0:
        v = -v
    assert np.array_equal(sv, v)
    G = np.array(gs, dtype=np.float64) / n
    vv = sv / np.linalg.norm(sv)
    lam = np.linalg.eigvalsh(G)
    assert float(vv @ G @ vv) >= 0.94 * lam[-1]

# --- changepoint / bootstrap / rolling regression --------------------------


def test_q167_cusum_vs_python_walk(spark, duck):
    rows = {r["event_type"]: r for r in _q(spark, "q167_cusum_changepoint")}
    daily = duck.execute(
        "SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR),"
        " CAST(COUNT(*) AS BIGINT) FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    per = {}
    for et, day, c in daily:
        per.setdefault(et, []).append((day, c))
    for et, series in per.items():
        n_days = len(series)
        total = sum(c for _, c in series)
        cusum, best = 0, None
        for day, c in series:  # already day-ordered
            cusum += n_days * c - total
            if best is None or abs(cusum) > best[1]:
                best = (day, abs(cusum))
        r = rows[et]
        assert r["n_days"] == n_days
        assert str(r["change_day"]) == best[0]
        assert r["max_abs_cusum"] == best[1]


def test_q172_bootstrap_vs_hashlib_replicates(spark, duck):
    """Replicate totals rebuilt with hashlib + the Poisson(1) lattice,
    SE via np.var(ddof=1); the lattice cut points themselves checked
    against the true Poisson(1) CDF."""
    from hoops_edge_database_etl_spark.queries.sketches import BOOT_B

    cdf, p, k = [], math.exp(-1.0), 0
    acc = p
    for k in range(5):
        cdf.append(round(acc * 1000))
        p = p / (k + 1)
        acc += p
    assert cdf == [368, 736, 920, 981, 996]  # the lattice in _BOOT_M_SQL

    def mult(u):
        for m, cut in enumerate([368, 736, 920, 981, 996]):
            if u < cut:
                return m
        return 5

    [r] = _q(spark, "q172_bootstrap_variance")
    raw = duck.execute(
        "SELECT o_orderkey, CAST(floor(o_totalprice*100+0.5) AS BIGINT)"
        " FROM orders"
    ).fetchall()
    totals = []
    for b in range(BOOT_B):
        t = 0
        for ok, cents in raw:
            u = int(
                hashlib.md5(f"{ok}:boot:{b}".encode()).hexdigest()[:8], 16
            ) % 1000
            t += mult(u) * cents
        totals.append(t)
    point = sum(c for _, c in raw)
    tt = np.array(totals, dtype=np.float64)
    assert r["point_total_cents"] == point
    assert r["n_replicates"] == BOOT_B
    _close(r["boot_mean"], float(tt.mean()), 1e-12)
    _close(r["boot_se"], float(tt.std(ddof=1)), 1e-9)
    # the bootstrap mean of a total is unbiased: within a few SE of point
    assert abs(float(tt.mean()) - point) < 6 * float(tt.std(ddof=1))


def test_q187_rolling_slope_vs_polyfit(spark, duck):
    rows = {
        (r["flag"], str(r["day"])): r["slope_cents_per_day"]
        for r in _q(spark, "q187_rolling_slope")
    }
    daily = duck.execute(
        "SELECT l_returnflag, CAST(CAST(l_shipdate AS DATE) AS VARCHAR),"
        " CAST(date_diff('day', DATE '1995-01-01', CAST(l_shipdate AS DATE))"
        " AS BIGINT),"
        " CAST(SUM(CAST(floor(l_extendedprice*100+0.5) AS BIGINT)) AS BIGINT)"
        " FROM lineitem GROUP BY 1, 2, 3 ORDER BY 1, 2"
    ).fetchall()
    per = {}
    for f, day, x, y in daily:
        per.setdefault(f, []).append((day, x, y))
    n_checked = 0
    for f, series in per.items():
        for i in range(6, len(series)):
            wnd = series[i - 6 : i + 1]
            xs = np.array([x for _, x, _ in wnd], float)
            ys = np.array([y for _, _, y in wnd], float)
            slope = float(np.polyfit(xs, ys, 1)[0])
            _close(rows[(f, series[i][0])], slope, 1e-7)
            n_checked += 1
    assert n_checked == len(rows) > 0
