"""Sampled join estimation, quota top-k, Luhn validation (q446-q448):
oracle parity plus estimator tolerance, exchange-argument exactness,
and checksum duality properties."""

from __future__ import annotations

from tests.conftest import SF_DIR, compare_query


def test_q446_matches_oracle(spark, duck):
    compare_query(spark, duck, "q446_sampled_join_estimate")


def test_q447_matches_oracle(spark, duck):
    compare_query(spark, duck, "q447_quota_topk")


def test_q448_matches_oracle(spark, duck):
    compare_query(spark, duck, "q448_luhn_check")


def test_q446_estimator_within_tolerance(spark):
    from hoops_edge_database_etl_spark.queries import all_queries

    r = all_queries()["q446_sampled_join_estimate"](spark, SF_DIR).collect()[0]
    assert r["est_join_size"] == r["sampled_pairs"] * 64
    assert r["abs_err"] == r["est_join_size"] - r["true_join_size"]
    assert 0.8 <= r["ratio"] <= 1.25  # 1/16 x 1/4 sampling at sf0.01


def test_q447_constrained_optimality_bruteforce(spark, duck):
    """Exchange-argument exactness: the two-phase board equals a direct
    brute force over all orders under the same per-class cap."""
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = all_queries()["q447_quota_topk"](spark, SF_DIR).collect()
    assert len(rows) == 20
    raw = duck.execute(
        """
        SELECT o_orderkey, o_orderpriority,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
        FROM orders
        """
    ).fetchall()
    raw.sort(key=lambda t: (-t[2], t[0]))
    taken, per_class = [], {}
    for k, prio, cents in raw:
        if per_class.get(prio, 0) < 5:
            per_class[prio] = per_class.get(prio, 0) + 1
            taken.append((k, prio, cents))
        if len(taken) == 20:
            break
    got = [(r["o_orderkey"], r["o_orderpriority"], r["cents"]) for r in rows]
    assert got == taken
    # quota respected
    from collections import Counter

    assert max(Counter(p for _, p, _ in got).values()) <= 5


def _luhn_ok(s):
    total = 0
    for i, ch in enumerate(reversed(s)):
        d = int(ch)
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


def test_q448_python_luhn_replay_and_duality(spark):
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = all_queries()["q448_luhn_check"](spark, SF_DIR).collect()
    n_valid = 0
    for r in rows:
        assert r["luhn_valid"] == _luhn_ok(r["acct12"]), r["acct12"]
        n_valid += r["luhn_valid"]
        # generator-validator duality: append the check digit that makes
        # the 13-digit string valid; exactly one of 0..9 works
        fixes = [d for d in range(10) if _luhn_ok(r["acct12"] + str(d))]
        assert len(fixes) == 1
    # a uniform checksum admits ~1/10 of random ids
    assert 0.05 < n_valid / len(rows) < 0.15
