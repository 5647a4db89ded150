"""Weighted interval scheduling, pivot harmonic centrality, shared-text
recursive CTE (q428-q430): oracle parity plus the unit-weight crossover,
BFS replay, and binary-tree shape properties."""

from __future__ import annotations

from tests.conftest import SF_DIR, compare_query


def test_q428_matches_oracle(spark, duck):
    compare_query(spark, duck, "q428_weighted_intervals")


def test_q429_matches_oracle(spark, duck):
    compare_query(spark, duck, "q429_harmonic_centrality")


def test_q430_matches_oracle(spark, duck):
    compare_query(spark, duck, "q430_sql_recursive_cte")


def test_q428_unit_weights_crossover_with_q416(spark):
    """THE crossover theorem: with every weight = 1 the weighted DP's
    optimum equals q416's greedy earliest-finish-time chain length,
    per user — two independent algorithms (and two independent oracle
    formulations) pinned to each other."""
    import pyspark.sql.functions as F

    from hoops_edge_database_etl_spark.queries import all_queries
    from hoops_edge_database_etl_spark.queries.events_analytics import (
        _weighted_interval_kernel,
    )

    greedy = all_queries()["q416_activity_selection"](spark, SF_DIR).collect()
    greedy_n = {}
    for r in greedy:
        greedy_n[r["uid"]] = greedy_n.get(r["uid"], 0) + 1

    # rebuild intervals exactly as the queries do, but with w = 1
    from hoops_edge_database_etl_spark.tables import load

    ev = load(spark, SF_DIR, "events")
    iv = ev.select(
        F.col("user_id").alias("uid"),
        F.unix_timestamp("ts").alias("s"),
        (
            F.unix_timestamp("ts")
            + (F.floor("value").cast("long") % 240) * 60
            + 600
        ).alias("e"),
        F.lit(1).cast("long").alias("w"),
    )
    unit = iv.groupBy("uid").applyInPandas(
        _weighted_interval_kernel,
        schema="uid long, best_value long, n_intervals long",
    )
    got = {r["uid"]: r["best_value"] for r in unit.collect()}
    assert got == greedy_n


def test_q429_python_bfs_replay(spark, duck):
    import hashlib
    from collections import defaultdict, deque

    from hoops_edge_database_etl_spark.queries import all_queries

    edges = duck.execute(
        """
        WITH l1 AS (SELECT l_orderkey, l_partkey FROM lineitem
                    WHERE l_linenumber = 1),
        l2 AS (SELECT l_orderkey, l_partkey FROM lineitem
               WHERE l_linenumber = 2)
        SELECT DISTINCT LEAST(l1.l_partkey, l2.l_partkey),
               GREATEST(l1.l_partkey, l2.l_partkey)
        FROM l1 JOIN l2 USING (l_orderkey)
        WHERE l1.l_partkey <> l2.l_partkey
        """
    ).fetchall()
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    nodes = sorted(adj)
    pivots = sorted(
        nodes, key=lambda n: (hashlib.md5(f"{n}:hc".encode()).hexdigest(), n)
    )[:32]
    want_h = defaultdict(int)
    want_r = defaultdict(int)
    for p in pivots:
        dist = {p: 0}
        dq = deque([p])
        while dq:
            u = dq.popleft()
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    dq.append(v)
        for v, d in dist.items():
            if d > 0:
                want_h[v] += 1000000 // d
                want_r[v] += 1
    got = {
        r["node"]: (r["harmonic_x1e6"], r["n_reached"])
        for r in all_queries()["q429_harmonic_centrality"](spark, SF_DIR).collect()
    }
    assert set(got) == set(nodes)
    for v in nodes:
        assert got[v] == (want_h[v], want_r[v]), v


def test_q430_complete_binary_tree_shape(spark):
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = {
        r["depth"]: r
        for r in all_queries()["q430_sql_recursive_cte"](spark, SF_DIR).collect()
    }
    # 127-residue tree: root 0, then levels {2^(k-1) .. 2^k - 1} up to 126
    expect = {0: (1, 0, 0), 1: (1, 1, 1)}
    for k in range(2, 8):
        lo, hi = 2 ** (k - 1), min(2**k - 1, 126)
        expect[k] = (hi - lo + 1, lo, hi)
    assert {
        d: (r["n_nodes"], r["min_node"], r["max_node"]) for d, r in rows.items()
    } == expect
