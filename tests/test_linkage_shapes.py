"""Fellegi-Sunter linkage scoring, TPC-H Q2 shape, Good-Turing smoothing
(q425-q427): oracle parity plus replay / equivalence / conservation
properties."""

from __future__ import annotations

from tests.conftest import SF_DIR, compare_query


def test_q425_matches_oracle(spark, duck):
    compare_query(spark, duck, "q425_fellegi_sunter")


def test_q426_matches_oracle(spark, duck):
    compare_query(spark, duck, "q426_min_cost_supplier")


def test_q427_matches_oracle(spark, duck):
    compare_query(spark, duck, "q427_good_turing")


def test_q425_pattern_ordering_and_m_gt_u(spark):
    """All-agree must outscore all-disagree by orders of magnitude, the
    ratio must be monotone in the number of agreements along any chain,
    and every field must be informative (m > u) on this fixture."""
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = all_queries()["q425_fellegi_sunter"](spark, SF_DIR).collect()
    assert len(rows) == 8
    by_pat = {
        (r["f_nation"], r["f_suffix"], r["f_bal"]): r["fs_ratio"] for r in rows
    }
    assert by_pat[(True, True, True)] > 1000 * by_pat[(False, False, False)]
    # flipping any single field from disagree to agree raises the score
    for i in range(3):
        for base in by_pat:
            if not base[i]:
                flipped = tuple(
                    (not v) if j == i else v for j, v in enumerate(base)
                )
                assert by_pat[flipped] > by_pat[base]
    # matches concentrate in the all-agree pattern
    match_counts = {
        (r["f_nation"], r["f_suffix"], r["f_bal"]): r["n_match"] for r in rows
    }
    assert match_counts[(True, True, True)] == max(match_counts.values())


def test_q425_numpy_replay(spark, duck):
    from hoops_edge_database_etl_spark.queries import all_queries

    pairs = duck.execute(
        """
        WITH a AS (
          SELECT c_custkey AS id, c_custkey % 40 AS blk,
                 c_nationkey AS nation, c_custkey % 100 AS suffix,
                 CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
          FROM customer
        ),
        b AS (
          SELECT c_custkey AS id, c_custkey % 40 AS blk,
                 CASE WHEN c_custkey % 10 = 0 THEN (c_nationkey + 1) % 25
                      ELSE c_nationkey END AS nation,
                 (c_custkey + CASE WHEN c_custkey % 13 = 0 THEN 50 ELSE 0 END)
                   % 100 AS suffix,
                 CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
                   + CASE WHEN c_custkey % 7 = 0 THEN 250 ELSE 0 END AS cents
          FROM customer
        )
        SELECT a.id = b.id, a.nation = b.nation, a.suffix = b.suffix,
               ABS(a.cents - b.cents) <= 100
        FROM a JOIN b ON b.blk = a.blk
        """
    ).fetchall()
    md = sum(1 for m, *_ in pairs if m)
    ud = len(pairs) - md
    mn = [sum(1 for m, *f in pairs if m and f[i]) for i in range(3)]
    un = [sum(1 for m, *f in pairs if not m and f[i]) for i in range(3)]

    def ratio(pattern):
        out = None
        for i, agree in enumerate(pattern):
            if agree:
                t = ((mn[i] + 1) * (ud + 2)) / ((md + 2) * (un[i] + 1))
            else:
                t = ((md + 1 - mn[i]) * (ud + 2)) / ((md + 2) * (ud + 1 - un[i]))
            out = t if out is None else out * t
        return out

    got = {
        (r["f_nation"], r["f_suffix"], r["f_bal"]): (
            r["n_match"],
            r["n_unmatch"],
            r["fs_ratio"],
        )
        for r in all_queries()["q425_fellegi_sunter"](spark, SF_DIR).collect()
    }
    from collections import Counter

    cm = Counter((tuple(f), m) for m, *f in pairs)
    for pat, (n_m, n_u, fs) in got.items():
        assert n_m == cm[(pat, True)]
        assert n_u == cm[(pat, False)]
        assert abs(fs - ratio(pat)) < 1e-9 * max(1.0, abs(fs))


def test_q426_window_argmin_equals_bruteforce(spark, duck):
    """The decorrelated window plan equals a per-part brute-force min
    over the same cost table (and the tiebreak picks the min suppkey)."""
    from hoops_edge_database_etl_spark.queries import all_queries

    got = {
        r["p_partkey"]: (r["best_suppkey"], r["cost_c"])
        for r in all_queries()["q426_min_cost_supplier"](spark, SF_DIR).collect()
    }
    costs = duck.execute(
        """
        SELECT l.l_partkey, l.l_suppkey,
               MIN(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT))
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'ASIA'
        GROUP BY 1, 2
        """
    ).fetchall()
    big = duck.execute(
        "SELECT p_partkey FROM part WHERE p_size >= 45"
    ).fetchall()
    keep = {k for (k,) in big}
    best = {}
    for pk, sk, c in costs:
        if pk in keep and (pk not in best or (c, sk) < best[pk]):
            best[pk] = (c, sk)
    assert got == {pk: (sk, c) for pk, (c, sk) in best.items()}


def test_q427_mass_conservation_and_replay(spark, duck):
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = all_queries()["q427_good_turing"](spark, SF_DIR).collect()
    fof = duck.execute(
        """
        SELECT r, COUNT(*) FROM (
          SELECT COUNT(*) AS r FROM lineitem GROUP BY l_partkey, l_suppkey
        ) GROUP BY r
        """
    ).fetchall()
    n_total = duck.execute("SELECT COUNT(*) FROM lineitem").fetchone()[0]
    fof_d = dict(fof)
    # total mass: sum r * N_r over ALL r equals the row count
    assert sum(r * nr for r, nr in fof) == n_total
    for r in rows:
        assert r["n_r"] == fof_d[r["r"]]
        assert r["n_r_next"] == fof_d.get(r["r"] + 1, 0)
        expected = (r["r"] + 1) * fof_d.get(r["r"] + 1, 0) / fof_d[r["r"]]
        assert abs(r["r_star"] - expected) < 1e-12
        assert r["p0_unseen_mass"] == fof_d[1] / n_total
        # the head exists and is singleton-dominated on this fixture
    assert fof_d[1] > fof_d.get(2, 0) > fof_d.get(3, 0)
