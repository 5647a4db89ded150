"""Join query oracle parity + asof_join operator unit tests."""

from __future__ import annotations

import pytest

from tests.conftest import compare_query

JOIN_QUERIES = [
    "q11_dim_enrich_join",
    "q12_inner_join_revenue",
    "q13_first_match_join",
    "q14_anti_join_gaps",
    "q15_semi_join",
    "q16_self_join_opponent",
    "q17_asof_join",
    "q18_fuzzy_name_join",
    "q19_referential_integrity",
    "q20_two_sided_expansion",
]


@pytest.mark.parametrize("name", JOIN_QUERIES)
def test_join_query_matches_oracle(spark, duck, name):
    compare_query(spark, duck, name)


def test_asof_join_strict_vs_nonstrict(spark):
    from hoops_edge_database_etl_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 10, "c")], "k int, ts int, who string"
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 15, 150.0), (2, 99, 990.0)], "k int, ts int, v double"
    )
    strict = {
        r["who"]: r["v"]
        for r in asof_join(left, right, "k", "ts", "ts", ["v"], strict=True).collect()
    }
    # strictly-before: left(1,10) must NOT see right(1,10)
    assert strict == {"a": None, "b": 150.0, "c": None}
    nonstrict = {
        r["who"]: r["v"]
        for r in asof_join(left, right, "k", "ts", "ts", ["v"], strict=False).collect()
    }
    assert nonstrict == {"a": 100.0, "b": 150.0, "c": None}


def test_asof_join_collision_guard(spark):
    from hoops_edge_database_etl_spark.operators.asof import asof_join

    df = spark.createDataFrame([(1, 1, 1.0)], "k int, ts int, v double")
    with pytest.raises(ValueError, match="collides"):
        asof_join(df, df, "k", "ts", "ts", ["v"])


def test_asof_tolerance_is_per_column(spark):
    """ADVICE r1: when the newest preceding right row is NULL in one value
    column, that column's value comes from an older row and must be
    tolerance-checked against THAT row's timestamp, not the newer one's."""
    from hoops_edge_database_etl_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 20, "q")], "k int, ts int, who string")
    right = spark.createDataFrame(
        [(1, 5, 1.0, 9.0), (1, 18, None, 10.0)],
        "k int, ts int, v1 double, v2 double",
    )
    row = asof_join(
        left, right, "k", "ts", "ts", ["v1", "v2"], tolerance_expr="10"
    ).collect()[0]
    # v2 came from ts=18 (fresh); v1 came from ts=5 (stale: 20-5 > 10)
    assert row["v2"] == 10.0
    assert row["v1"] is None


def test_hierarchical_shares_sum_to_one(spark):
    from hoops_edge_database_etl_spark.queries import all_queries
    from tests.conftest import SF_DIR

    rows = all_queries()["q163_hierarchical_share"](spark, SF_DIR).collect()
    assert rows
    assert abs(sum(r["share_of_total"] for r in rows) - 1.0) < 1e-9
    by_region: dict[str, float] = {}
    for r in rows:
        by_region[r["region"]] = by_region.get(r["region"], 0.0) + r["share_of_region"]
    for region, tot in by_region.items():
        assert abs(tot - 1.0) < 1e-9, region


def test_asof_forward_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q174_asof_forward")


def test_asof_forward_semantics_on_synthetic_frame(spark):
    """Equal-timestamp strictness + earliest-following selection."""
    import pyspark.sql.functions as F2

    from hoops_edge_database_etl_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 35), (2, 10)], "k int, ts int"
    )
    right = spark.createDataFrame(
        [(1, 10, "a"), (1, 25, "b"), (1, 30, "c"), (2, 5, "z")],
        "k int, ts int, v string",
    )
    out = asof_join(
        left, right.withColumnRenamed("ts", "rts"),
        on="k", left_ts="ts", right_ts="rts",
        value_cols=["v"], strict=True, direction="forward",
    )
    got = {(r["k"], r["ts"]): r["v"] for r in out.collect()}
    # strict: the ts=10 right row does NOT match the ts=10 left row
    assert got == {(1, 10): "b", (1, 20): "b", (1, 35): None, (2, 10): None}
    out2 = asof_join(
        left, right.withColumnRenamed("ts", "rts"),
        on="k", left_ts="ts", right_ts="rts",
        value_cols=["v"], strict=False, direction="forward",
    )
    got2 = {(r["k"], r["ts"]): r["v"] for r in out2.collect()}
    assert got2[(1, 10)] == "a"  # non-strict: same-ts row matches
    assert F2 is not None


def test_temporal_dim_join_orders_conserved(spark, duck):
    """Every order matches exactly one dimension version — totals equal
    the raw order count."""
    from tests.conftest import SF_DIR, compare_query
    from hoops_edge_database_etl_spark.queries import all_queries

    compare_query(spark, duck, "q184_temporal_dim_join")
    rows = all_queries()["q184_temporal_dim_join"](spark, SF_DIR).collect()
    n_orders = duck.execute("SELECT COUNT(*) FROM orders").fetchone()[0]
    assert sum(r["n_orders"] for r in rows) == n_orders


def test_null_safe_join_matches_null_bucket(spark, duck):
    from tests.conftest import SF_DIR, compare_query
    from hoops_edge_database_etl_spark.queries import all_queries

    compare_query(spark, duck, "q190_null_safe_join")
    rows = all_queries()["q190_null_safe_join"](spark, SF_DIR).collect()
    assert len(rows) == 11  # 10 buckets + the matched NULL bucket
    nulls = [r for r in rows if r["k"] is None]
    assert len(nulls) == 1 and nulls[0]["n_a"] > 0 and nulls[0]["n_b"] > 0


def test_small_qty_revenue_subset_of_total(spark, duck):
    from tests.conftest import SF_DIR, compare_query
    from hoops_edge_database_etl_spark.queries import all_queries

    compare_query(spark, duck, "q196_small_qty_revenue")
    r = all_queries()["q196_small_qty_revenue"](spark, SF_DIR).collect()[0]
    total = duck.execute("SELECT COUNT(*) FROM lineitem").fetchone()[0]
    assert 0 < r["n_small_lines"] < total


def test_dominant_suppliers_semi_no_duplicates(spark, duck):
    from tests.conftest import SF_DIR, compare_query
    from hoops_edge_database_etl_spark.queries import all_queries

    compare_query(spark, duck, "q197_dominant_suppliers")
    rows = all_queries()["q197_dominant_suppliers"](spark, SF_DIR).collect()
    assert rows
    n = sum(r["n_dominant_suppliers"] for r in rows)
    distinct = duck.execute("""
        WITH ps AS (SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS BIGINT)) sq
                    FROM lineitem GROUP BY 1, 2),
        pt AS (SELECT l_partkey, SUM(sq) tq FROM ps GROUP BY 1)
        SELECT COUNT(DISTINCT ps.l_suppkey) FROM ps JOIN pt USING (l_partkey)
        WHERE ps.sq * 20 > 3 * pt.tq
    """).fetchone()[0]
    assert n == distinct  # semi join counted each supplier once


def test_fifo_allocation_conservation(spark, duck):
    """Per part: Σ allocated == min(supply, demand) — the FIFO identity."""
    from tests.conftest import SF_DIR, compare_query
    from hoops_edge_database_etl_spark.queries import all_queries

    compare_query(spark, duck, "q206_fifo_allocation")
    rows = all_queries()["q206_fifo_allocation"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["allocated"] == min(r["supply"], r["demand"]), r
        assert r["n_matches"] >= 1


def test_asof_nearest_gap_is_minimal(spark, duck):
    """Spot-check: the reported gap equals the true minimum |Δt| for a
    sample of error events."""
    from tests.conftest import SF_DIR, compare_query
    from hoops_edge_database_etl_spark.queries import all_queries

    compare_query(spark, duck, "q217_asof_nearest")
    rows = all_queries()["q217_asof_nearest"](spark, SF_DIR).collect()
    got = {r["event_id"]: r["nearest_gap_us"] for r in rows[:100]}
    for eid, gap in list(got.items())[:20]:
        want = duck.execute(f"""
            SELECT MIN(abs(epoch_us(CAST(c.ts AS TIMESTAMP))
                           - epoch_us(CAST(e.ts AS TIMESTAMP))))
            FROM events e JOIN events c ON c.user_id = e.user_id
            WHERE e.event_id = {eid} AND e.event_type = 'error'
              AND c.event_type = 'click'
        """).fetchone()[0]
        assert gap == want, eid


def test_q244_matches_oracle(spark, duck):
    compare_query(spark, duck, "q244_copurchase_topk")


def test_q244_symmetric_counts(spark):
    """Co-purchase counts are symmetric: n(p1,p2) == n(p2,p1) whenever
    both directions survive the top-5 cut is not guaranteed, but any
    pair present both ways must agree on the count."""
    from hoops_edge_database_etl_spark.queries import all_queries
    from tests.conftest import SF_DIR

    rows = all_queries()["q244_copurchase_topk"](spark, SF_DIR).collect()
    cnt = {(r["p1"], r["p2"]): r["n_orders"] for r in rows}
    both = [(k, v) for k, v in cnt.items() if (k[1], k[0]) in cnt]
    assert both
    for (p1, p2), v in both:
        assert cnt[(p2, p1)] == v
    assert all(r["rnk"] <= 5 for r in rows)


def test_q268_matches_oracle(spark, duck):
    compare_query(spark, duck, "q268_graph_neighbor_agg")


def test_q268_mean_consistent(spark):
    from hoops_edge_database_etl_spark.queries import all_queries
    from tests.conftest import SF_DIR

    rows = all_queries()["q268_graph_neighbor_agg"](spark, SF_DIR).collect()
    assert rows
    for r in rows[:50]:
        assert abs(r["neigh_mean"] - r["neigh_sum_cents"] / (r["degree"] * 100)) < 1e-9
        assert r["degree"] >= 1


def test_q291_matches_oracle(spark, duck):
    compare_query(spark, duck, "q291_orphan_entity_sweep")


def test_q291_known_referential_structure(spark):
    from hoops_edge_database_etl_spark.queries import all_queries
    from tests.conftest import SF_DIR

    rows = {
        r["check_name"]: r["n_orphans"]
        for r in all_queries()["q291_orphan_entity_sweep"](spark, SF_DIR).collect()
    }
    assert len(rows) == 4
    assert rows["customers_without_orders"] == 0  # generator guarantee
    assert rows["parts_never_ordered"] == 0
    # a genuine finding: the generator leaves some orders line-less
    assert rows["orders_without_lines"] > 0
    assert all(v >= 0 for v in rows.values())


def test_q311_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q311_popularity_bias")


def test_q311_shares_sum_and_head_skew(spark):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = all_queries()["q311_popularity_bias"](spark, SF_DIR).collect()
    total = sum(r["n_rec_slots"] for r in rows)
    assert total > 0
    assert sum(r["share_ppm"] for r in rows) <= 1_000_000  # floor division
    by_dec = {r["decile"]: r["n_rec_slots"] for r in rows}
    # co-purchase candidates should over-represent the head decile
    assert by_dec.get(0, 0) >= total // 10


def test_q319_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q319_join_strategy_advisor")


def test_q319_recommendations_consistent(spark):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries
    from hoops_edge_database_etl_spark.queries.joins import (
        BROADCAST_LIMIT_BYTES,
        SHUFFLE_HASH_RATIO,
    )

    rows = all_queries()["q319_join_strategy_advisor"](spark, SF_DIR).collect()
    assert len(rows) == 7
    for r in rows:
        if r["build_bytes"] < BROADCAST_LIMIT_BYTES:
            assert r["strategy"] == "broadcast"
        elif r["probe_rows"] >= r["build_rows"] * SHUFFLE_HASH_RATIO:
            assert r["strategy"] == "shuffle_hash"
        else:
            assert r["strategy"] == "sort_merge"
    # the tiny dims are always broadcastable at any tested sf
    by_name = {r["join_name"]: r["strategy"] for r in rows}
    assert by_name["nation_x_region"] == "broadcast"
