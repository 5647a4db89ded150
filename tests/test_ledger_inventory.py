"""Stockout projection, GROUP BY ALL sugar, hash-chain ledger
(q443-q445): oracle parity plus depletion replay, key-inference
equivalence, and tamper-detection properties."""

from __future__ import annotations

import hashlib

from tests.conftest import SF_DIR, compare_query


def test_q443_matches_oracle(spark, duck):
    compare_query(spark, duck, "q443_stockout_projection")


def test_q444_matches_oracle(spark, duck):
    compare_query(spark, duck, "q444_sql_group_by_all")


def test_q445_matches_oracle(spark, duck):
    compare_query(spark, duck, "q445_hash_chain_ledger")


def test_q443_depletion_replay(spark, duck):
    from hoops_edge_database_etl_spark.queries import all_queries

    got = {
        r["p_partkey"]: r
        for r in all_queries()["q443_stockout_projection"](spark, SF_DIR).collect()
    }
    rows = duck.execute(
        """
        SELECT l.l_partkey,
               CAST(CAST(l.l_shipdate AS DATE) - DATE '1995-01-01' AS BIGINT),
               SUM(CAST(floor(l.l_quantity) AS BIGINT))
        FROM lineitem l
        WHERE l.l_partkey % 17 = 0
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    start = dict(
        duck.execute(
            "SELECT p_partkey, p_size * 40 + 200 FROM part WHERE p_partkey % 17 = 0"
        ).fetchall()
    )
    series = {}
    for pk, d, q in rows:
        series.setdefault(pk, []).append((d, q))
    for pk, st in start.items():
        stock, first_out, total = st, None, 0
        for d, q in series.get(pk, []):
            stock -= q
            total += q
            if stock < 0 and first_out is None:
                first_out = d
        r = got[pk]
        assert r["total_demand"] == total
        assert r["first_stockout_d"] == first_out
        assert r["stocks_out"] == (first_out is not None)
        if total <= st:
            assert first_out is None


def test_q444_group_by_all_matches_explicit_keys(spark):
    """ALL-inference resolves to exactly the explicit GROUP BY 1,2,3 /
    ORDER BY 1,2,3,4,5 form."""
    from hoops_edge_database_etl_spark.tables import register_views

    register_views(spark, SF_DIR)
    implicit = spark.sql(
        """
        SELECT o_orderpriority, year(o_orderdate) AS order_year, o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS revenue_c
        FROM orders
        WHERE o_orderdate >= CAST('1996-01-01' AS DATE)
        GROUP BY ALL ORDER BY ALL
        """
    ).collect()
    explicit = spark.sql(
        """
        SELECT o_orderpriority, year(o_orderdate) AS order_year, o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS revenue_c
        FROM orders
        WHERE o_orderdate >= CAST('1996-01-01' AS DATE)
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3, 4, 5
        """
    ).collect()
    assert [tuple(r) for r in implicit] == [tuple(r) for r in explicit]


def _chain(txs):
    acc = "GENESIS"
    for k, cents in sorted(txs):
        acc = hashlib.md5(f"{acc}|{k}:{cents}".encode()).hexdigest()
    return acc


def test_q445_tamper_detection(spark, duck):
    from hoops_edge_database_etl_spark.queries import all_queries

    got = {
        r["acct"]: r["head_digest"]
        for r in all_queries()["q445_hash_chain_ledger"](spark, SF_DIR).collect()
    }
    raw = duck.execute(
        """
        SELECT o_custkey, o_orderkey,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
        FROM orders WHERE o_custkey % 9 = 0
        """
    ).fetchall()
    per = {}
    for acct, k, c in raw:
        per.setdefault(acct, []).append((k, c))
    some = sorted(per)[0]
    for acct, txs in per.items():
        assert got[acct] == _chain(txs)
    # the four tamper classes all change the head
    txs = per[some]
    assert _chain(txs) != _chain([(k, c + 1) if i == 0 else (k, c)
                                  for i, (k, c) in enumerate(txs)])  # mutate
    assert _chain(txs) != _chain(txs + [(10**9, 1)])  # insert
    assert _chain(txs) != _chain(txs[1:])  # drop
    swapped = [(txs[1][0], txs[0][1]), (txs[0][0], txs[1][1])] + txs[2:]
    assert _chain(txs) != _chain(swapped)  # reorder amounts across slots
