"""q483: oracle parity plus a from-scratch subsequence recount, the
Apriori anti-monotonicity theorem, and cross-agreement with q477's
position-based pair counts."""

from __future__ import annotations

from collections import defaultdict

from tests.conftest import SF_DIR, compare_query


def test_oracle_parity(spark, duck):
    compare_query(spark, duck, "q483_subsequence_patterns_3")


def _contains(seq, pat):
    i = 0
    for ch in pat:
        i = seq.find(ch, i)
        if i < 0:
            return False
        i += 1
    return True


def test_q483_recount_theorem_and_q477_agreement(spark, duck):
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = duck.execute(
        "SELECT user_id, event_type FROM events ORDER BY user_id, ts, event_id"
    ).fetchall()
    seqs = defaultdict(str)
    for u, t in rows:
        seqs[u] += t[0]
    got = {
        (r["a"], r["b"], r["c"]): r
        for r in all_queries()["q483_subsequence_patterns_3"](
            spark, SF_DIR
        ).collect()
    }
    syms = sorted({t[0] for _, t in rows})
    assert len(got) == len(syms) ** 3
    pair2 = {
        (r["a"][0], r["b"][0]): r["supp_ab"]
        for r in all_queries()["q477_sequential_patterns"](spark, SF_DIR).collect()
    }
    n = len(seqs)
    for (a, b, c), r in got.items():
        s3 = sum(_contains(s, a + b + c) for s in seqs.values())
        sab = sum(_contains(s, a + b) for s in seqs.values())
        sbc = sum(_contains(s, b + c) for s in seqs.values())
        assert (r["supp3"], r["supp_ab"], r["supp_bc"]) == (s3, sab, sbc)
        assert r["supp3_ppm"] == s3 * 1000000 // n
        # the Apriori pruning theorem holds on every triple
        assert r["apriori_ok"] is True and s3 <= min(sab, sbc)
        # regex containment ≡ q477's first/last-position containment
        assert sab == pair2[(a, b)]
        assert sbc == pair2[(b, c)]
