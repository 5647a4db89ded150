"""q461–q465: oracle parity plus independent recomputes — Gopher rules
from raw strings, Allen-case exhaustiveness by brute force, DTW and
Ljung-Box from first-principles Python DPs, Levenshtein from a pure
Wagner-Fischer."""

from __future__ import annotations

from tests.conftest import SF_DIR, compare_query


def test_oracle_parity(spark, duck):
    for q in (
        "q461_gopher_quality_rules",
        "q462_allen_relations",
        "q463_dtw_distance",
        "q464_levenshtein_blocking",
        "q465_ljung_box",
    ):
        compare_query(spark, duck, q)


def test_q461_rules_recompute(spark):
    import duckdb

    from hoops_edge_database_etl_spark.queries import all_queries

    duck = duckdb.connect()
    duck.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    texts = dict(duck.execute("SELECT doc_id, text FROM documents").fetchall())
    rows = all_queries()["q461_gopher_quality_rules"](spark, SF_DIR).collect()
    stops = {"the", "a", "to", "of", "and", "that", "have", "with"}
    n_pass = 0
    for r in rows:
        ws = texts[r["doc_id"]].split(" ")
        wc = len(ws)
        chars = sum(len(w) for w in ws)
        n_alpha = sum(w.isalpha() and w.isascii() for w in ws)
        n_stop = len(stops & set(ws))
        max_tf = max(ws.count(w) for w in set(ws))
        assert (r["wc"], r["chars"], r["n_alpha"], r["n_stop"], r["max_tf"]) == (
            wc,
            chars,
            n_alpha,
            n_stop,
            max_tf,
        )
        expect = (
            50 <= wc <= 100000
            and 3 * wc <= chars <= 10 * wc
            and 5 * n_alpha >= 4 * wc
            and n_stop >= 2
            and 5 * max_tf <= wc
        )
        assert r["passes"] == expect
        n_pass += expect
    # the fixture draws 10-99-word docs: both verdicts must occur
    assert 0 < n_pass < len(rows)


def _allen(s1, e1, s2, e2):
    """Textbook Allen (1983) definitions, written independently of the
    query's CASE order."""
    if (s1, e1) == (s2, e2):
        return "equals"
    if e1 < s2:
        return "precedes"
    if e1 == s2:
        return "meets"
    if s2 > e1:  # unreachable, kept for symmetry with the inverse block
        return None
    if s1 > e2:
        return "preceded_by"
    if s1 == e2:
        return "met_by"
    if s1 == s2:
        return "starts" if e1 < e2 else "started_by"
    if e1 == e2:
        return "finishes" if s1 > s2 else "finished_by"
    if s1 < s2:
        return "contains" if e1 > e2 else "overlaps"
    return "during" if e1 < e2 else "overlapped_by"


def test_q462_case_exhaustive_on_grid(duck):
    from hoops_edge_database_etl_spark.queries.joins import _ALLEN_CASE

    grid = [
        (s1, e1, s2, e2)
        for s1 in range(5)
        for e1 in range(s1, 5)
        for s2 in range(5)
        for e2 in range(s2, 5)
    ]
    duck.execute("CREATE TEMP TABLE g(s1 INT, e1 INT, s2 INT, e2 INT)")
    duck.executemany("INSERT INTO g VALUES (?,?,?,?)", grid)
    got = duck.execute(f"SELECT s1, e1, s2, e2, {_ALLEN_CASE} FROM g").fetchall()
    seen = set()
    for s1, e1, s2, e2, rel in got:
        assert rel is not None, (s1, e1, s2, e2)  # never falls through
        assert rel == _allen(s1, e1, s2, e2)
        seen.add(rel)
    assert len(seen) == 13  # every Allen relation realized on the grid
    duck.execute("DROP TABLE g")


def _daily_series(duck, lo, hi):
    maxd = duck.execute(
        "SELECT MAX(CAST(ts AS DATE) - DATE '2024-01-01') FROM events"
    ).fetchone()[0]
    hi = min(hi, maxd)
    out = {}
    for (t,) in duck.execute("SELECT DISTINCT event_type FROM events").fetchall():
        cnt = dict(
            duck.execute(
                "SELECT CAST(ts AS DATE) - DATE '2024-01-01', COUNT(*) "
                "FROM events WHERE event_type = ? GROUP BY 1",
                [t],
            ).fetchall()
        )
        out[t] = [cnt.get(d, 0) for d in range(lo, hi + 1)]
    return out


def _dtw(a, b):
    prev = None
    for i, av in enumerate(a):
        row = []
        for j, bv in enumerate(b):
            c = abs(av - bv)
            if i == 0:
                row.append(c + (0 if j == 0 else row[j - 1]))
            elif j == 0:
                row.append(c + prev[0])
            else:
                row.append(c + min(prev[j], prev[j - 1], row[j - 1]))
        prev = row
    return prev[-1]


def test_q463_dtw_recompute(spark, duck):
    from hoops_edge_database_etl_spark.queries import all_queries

    series = _daily_series(duck, 0, 27)
    rows = all_queries()["q463_dtw_distance"](spark, SF_DIR).collect()
    assert len(rows) == len(series) * (len(series) - 1) // 2
    for r in rows:
        assert r["dtw"] == _dtw(series[r["type_a"]], series[r["type_b"]])
        # DTW is bounded above by the no-warp (pointwise L1) distance
        l1 = sum(
            abs(x - y) for x, y in zip(series[r["type_a"]], series[r["type_b"]])
        )
        assert 0 <= r["dtw"] <= l1


def _wagner_fischer(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        row = [i]
        for j, cb in enumerate(b, 1):
            row.append(
                min(prev[j] + 1, row[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = row
    return prev[-1]


def test_q464_levenshtein_recompute(spark):
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = all_queries()["q464_levenshtein_blocking"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["dist"] == _wagner_fischer(r["name_a"], r["name_b"])
        assert r["name_a"].split(" ")[1] == r["name_b"].split(" ")[1] == r["noun"]
        assert r["is_candidate"] == (r["dist"] <= 4)


def test_q465_ljung_box_recompute(spark, duck):
    from hoops_edge_database_etl_spark.queries import all_queries

    series = _daily_series(duck, 0, 10**9)
    rows = all_queries()["q465_ljung_box"](spark, SF_DIR).collect()
    for r in rows:
        xs = series[r["event_type"]]
        n = len(xs)
        assert r["n"] == n
        mean = sum(xs) / n
        den = sum((x - mean) ** 2 for x in xs)
        q = 0.0
        for k in range(1, 8):
            rho = (
                sum((xs[t] - mean) * (xs[t + k] - mean) for t in range(n - k))
                / den
            )
            if k == 1:
                assert abs(r["rho1"] - rho) < 1e-9
            q += rho * rho / (n - k)
        q *= n * (n + 2)
        assert abs(r["q_lb"] - q) < 1e-6
        assert r["white_noise_5pct"] == (r["q_lb"] < 14.067)
