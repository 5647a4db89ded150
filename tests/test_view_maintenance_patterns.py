"""q476–q477: oracle parity plus replays — the join-view delta algebra
re-derived in Python set algebra (and deliberately broken to prove the
fingerprint catches it), sequential-pattern containment recounted per
user."""

from __future__ import annotations

from collections import defaultdict

from tests.conftest import SF_DIR, compare_query


def test_oracle_parity(spark, duck):
    for q in ("q476_join_view_maintenance", "q477_sequential_patterns"):
        compare_query(spark, duck, q)


def test_q476_delta_algebra_replay_and_tamper(spark, duck):
    from hoops_edge_database_etl_spark.queries import all_queries

    orders = duck.execute(
        "SELECT o_orderkey, o_custkey, o_orderdate >= DATE '1997-01-01' "
        "FROM orders"
    ).fetchall()
    cust = duck.execute(
        "SELECT c_custkey, c_custkey % 97 = 0 FROM customer"
    ).fetchall()
    a = [(k, c) for k, c, d in orders if not d]
    da = [(k, c) for k, c, d in orders if d]
    b = {k for k, d in cust if not d}
    db = {k for k, d in cust if d}
    incr = (
        [(k, c) for k, c in a if c in b]
        + [(k, c) for k, c in da if c in b]
        + [(k, c) for k, c in a if c in db]
        + [(k, c) for k, c in da if c in db]
    )
    full = [(k, c) for k, c in a + da if c in b or c in db]
    r = all_queries()["q476_join_view_maintenance"](spark, SF_DIR).collect()[0]
    assert (r["n_delta_a"], r["n_delta_b"]) == (len(da), len(db))
    assert r["n_incremental"] == len(incr)
    assert r["n_recomputed"] == len(full)
    assert sorted(incr) == sorted(full)  # the identity, row-exactly
    assert r["maintained_ok"] is True
    assert r["fp_incremental"] == r["fp_recomputed"]
    # tamper: drop the ΔA⋈ΔB cross term — counts (hence fingerprints,
    # which sum per-row hashes) must diverge iff that term is non-empty
    broken = [(k, c) for k, c in incr if not (c in db and (k, c) in set(
        (kk, cc) for kk, cc in da
    ))]
    dropped = [(k, c) for k, c in da if c in db]
    assert dropped, "fixture must exercise the cross term"
    assert len(broken) == len(full) - len(dropped)


def test_q477_containment_replay(spark, duck):
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = duck.execute(
        "SELECT user_id, event_type FROM events ORDER BY user_id, ts, event_id"
    ).fetchall()
    seqs = defaultdict(list)
    for u, t in rows:
        seqs[u].append(t)
    types = sorted({t for _, t in rows})
    supp_ab = defaultdict(int)
    supp = defaultdict(int)
    for seq in seqs.values():
        present = set(seq)
        for t in present:
            supp[t] += 1
        for x in types:
            for y in types:
                if x in present and y in present:
                    fx = seq.index(x)
                    ly = len(seq) - 1 - seq[::-1].index(y)
                    if fx < ly:
                        supp_ab[(x, y)] += 1
    got = {
        (r["a"], r["b"]): r
        for r in all_queries()["q477_sequential_patterns"](
            spark, SF_DIR
        ).collect()
    }
    n = len(seqs)
    assert len(got) == len(types) ** 2
    for (x, y), r in got.items():
        assert r["n_users"] == n
        assert (r["supp_a"], r["supp_b"]) == (supp[x], supp[y])
        assert r["supp_ab"] == supp_ab[(x, y)]
        assert r["lift_ppm"] == supp_ab[(x, y)] * n * 1000000 // (
            supp[x] * supp[y]
        )
        if x == y:
            # diagonal = "occurs at least twice"
            twice = sum(s.count(x) >= 2 for s in seqs.values())
            assert r["supp_ab"] == twice
