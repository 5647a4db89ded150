"""HITS link analysis + k-core onion peeling + Little's law conservation
(q413-q415): oracle parity plus the planted-graph / theorem properties the
hash check alone cannot pin (VERDICT r5 lesson: every iterative or formula
query needs an independent semantic test)."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_DIR, compare_query


def test_q413_matches_oracle(spark, duck):
    compare_query(spark, duck, "q413_hits_scores")


def test_q414_matches_oracle(spark, duck):
    compare_query(spark, duck, "q414_kcore_onion")


def test_q415_matches_oracle(spark, duck):
    compare_query(spark, duck, "q415_littles_law")


def test_hits_scores_bounded_and_max_normalized(spark):
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = all_queries()["q413_hits_scores"](spark, SF_DIR).collect()
    hubs = [r["hub"] for r in rows]
    auths = [r["authority"] for r in rows]
    assert all(0.0 <= v <= 1.0 for v in hubs + auths)
    # max-normalization: the top node on each axis sits exactly at 1.0
    assert max(hubs) == 1.0
    assert max(auths) == 1.0


def test_hits_planted_star_centers_win(spark):
    """A bipartite broadcast graph: hub node 0 points at authorities
    1..5; a stray edge 6->7 exists so normalization has competition.
    Node 0 must be the top hub, nodes 1..5 the top authorities."""
    from hoops_edge_database_etl_spark.queries.solver import hits_iterate

    edges = [(0, t, 5) for t in range(1, 6)] + [(6, 7, 1)]
    e = spark.createDataFrame(edges, "src: long, dst: long, w: long")
    res = {r["node"]: (r["hub"], r["authority"]) for r in hits_iterate(e).collect()}
    assert res[0][0] == 1.0  # dominant hub
    assert all(res[t][1] > res[7][1] for t in range(1, 6))
    assert res[0][1] == 0.0  # nothing points at the hub
    assert all(res[t][0] == 0.0 for t in range(1, 6))  # authorities point nowhere


def test_kcore_planted_clique_survives_pendant_chain_peels(spark):
    """K5 clique (nodes 0-4) survives a 4-core; a pendant chain
    5-6-7 hanging off node 0 peels outward-in: 7 and 6 and 5 all have
    degree < 4 immediately (sweep 1), the clique is untouched."""
    from hoops_edge_database_etl_spark.queries.solver import kcore_peel

    clique = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    chain = [(0, 5), (5, 6), (6, 7)]
    e = spark.createDataFrame(clique + chain, "a: long, b: long")
    res = {r["node"]: (r["removed_sweep"], r["in_core"]) for r in kcore_peel(e, k=4).collect()}
    assert all(res[n] == (None, True) for n in range(5))
    assert all(res[n][0] == 1 for n in (5, 6, 7))


def test_kcore_cascade_rounds(spark):
    """A path 0-1-2-3-4 under k=2: endpoints peel at sweep 1, the next
    layer at sweep 2, the middle at sweep 3 — the onion layers record
    the cascade depth, not just membership."""
    from hoops_edge_database_etl_spark.queries.solver import kcore_peel

    e = spark.createDataFrame([(i, i + 1) for i in range(4)], "a: long, b: long")
    res = {r["node"]: r["removed_sweep"] for r in kcore_peel(e, k=2).collect()}
    assert res == {0: 1, 4: 1, 1: 2, 3: 2, 2: 3}


def test_kcore_result_is_fixpoint_and_layers_contiguous(spark, duck):
    """The 4-core's induced degrees are all >= 4 (core-ness), re-peeling
    the core removes nothing (maximality-side fixpoint), and removal
    sweeps form a contiguous 1..depth range."""
    from hoops_edge_database_etl_spark.queries import all_queries
    from hoops_edge_database_etl_spark.queries.solver import kcore_peel

    res = all_queries()["q414_kcore_onion"](spark, SF_DIR).collect()
    core = {r["node"] for r in res if r["in_core"]}
    sweeps = sorted({r["removed_sweep"] for r in res if r["removed_sweep"] is not None})
    assert sweeps == list(range(1, len(sweeps) + 1))

    edges = duck.execute(
        """
        WITH l1 AS (SELECT l_orderkey, l_partkey FROM lineitem WHERE l_linenumber = 1),
        l2 AS (SELECT l_orderkey, l_partkey FROM lineitem WHERE l_linenumber = 2)
        SELECT DISTINCT LEAST(l1.l_partkey, l2.l_partkey) a,
               GREATEST(l1.l_partkey, l2.l_partkey) b
        FROM l1 JOIN l2 USING (l_orderkey) WHERE l1.l_partkey <> l2.l_partkey
        """
    ).fetchall()
    induced = [(a, b) for a, b in edges if a in core and b in core]
    if core:
        from collections import Counter

        deg = Counter()
        for a, b in induced:
            deg[a] += 1
            deg[b] += 1
        assert set(deg) == core
        assert min(deg.values()) >= 4
        e2 = spark.createDataFrame(induced, "a: long, b: long")
        again = kcore_peel(e2, k=4).collect()
        assert all(r["in_core"] for r in again)


def test_littles_law_conservation_and_consistency(spark):
    """The theorem: the boundary-sweep integral of concurrency equals the
    per-job overlap sum EXACTLY, per priority class — and the flag
    column agrees with the raw columns it summarizes."""
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = all_queries()["q415_littles_law"](spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["conservation_ok"] is True
        assert r["integral_days"] == r["sum_overlap_days"]
        assert 0 < r["n_arrivals"] <= r["n_open"] + r["n_arrivals"]
        # finite-window Little: the full-span window contains nearly every
        # job, so L and λW agree to within a few percent of edge effects
        assert abs(r["l_avg_open"] - r["lambda_w"]) < 0.05 * r["l_avg_open"]


def test_littles_law_numpy_replay(spark, duck):
    """Independent recompute (the formula-audit discipline): replay the
    sweep integral day-by-day in pure Python from the raw job intervals
    and match both output routes."""
    from hoops_edge_database_etl_spark.queries import all_queries

    jobs = duck.execute(
        """
        SELECT o.o_orderpriority,
               CAST(o.o_orderdate AS DATE) AS arrive,
               CAST(MAX(l.l_shipdate) AS DATE) + 1 AS depart
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, o.o_orderkey, 2
        """
    ).fetchall()
    import datetime

    w0 = datetime.date(1995, 1, 1)
    w1 = datetime.date(2002, 1, 1)
    want = {}
    for prio, arrive, depart in jobs:
        lo, hi = max(arrive, w0), min(depart, w1)
        if hi > lo:
            want[prio] = want.get(prio, 0) + (hi - lo).days
    got = {
        r["prio"]: r["integral_days"]
        for r in all_queries()["q415_littles_law"](spark, SF_DIR).collect()
    }
    assert got == want
