"""Inverted index / phrase search / CEP pattern queries vs the oracle."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR, compare_query

from hoops_edge_database_etl_spark.queries import all_queries


@pytest.mark.parametrize(
    "name",
    ["q235_inverted_index", "q236_phrase_search", "q237_event_pattern_match"],
)
def test_search_matches_oracle(spark, duck, name):
    compare_query(spark, duck, name)


def test_q235_postings_are_sorted_and_sized(spark):
    rows = all_queries()["q235_inverted_index"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        postings = r["postings"].split(",")
        assert len(postings) == r["df"]
        assert postings == sorted(postings)
        assert r["cf"] >= r["df"] >= 1


def test_q236_agrees_with_index_intersection(spark):
    """Every phrase hit must appear in BOTH terms' posting lists."""
    idx = {
        r["term"]: set(r["postings"].split(","))
        for r in all_queries()["q235_inverted_index"](spark, SF_DIR).collect()
    }
    hits = all_queries()["q236_phrase_search"](spark, SF_DIR).collect()
    assert hits
    both = idx["table"] & idx["value"]
    for r in hits:
        assert str(r["doc_id"]) in both


def test_q237_match_requires_pattern_events(spark):
    rows = all_queries()["q237_event_pattern_match"](spark, SF_DIR).collect()
    assert len(rows) == 150
    assert any(r["n_matches"] > 0 for r in rows)
    for r in rows:
        # each match consumes >= 4 events (v, e, e, p)
        assert r["n_matches"] * 4 <= r["n_events"]


def test_q401_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q401_rank_aggregation")


def test_q401_borda_dominance(spark):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = sorted(
        all_queries()["q401_rank_aggregation"](spark, SF_DIR).collect(),
        key=lambda r: r["final_rank"],
    )
    assert [r["final_rank"] for r in rows] == list(range(1, len(rows) + 1))
    costs = [r["borda_cost"] for r in rows]
    assert costs == sorted(costs)
    for r in rows:
        assert r["borda_cost"] == r["r1"] + r["r2"] + r["r3"]
        # a part ranked #1 everywhere would have cost 3; sanity floor
        assert r["borda_cost"] >= 3


def test_q408_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q408_kendall_tau")


def test_q408_tau_vs_python_and_extremes(spark, duck):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    [r] = all_queries()["q408_kendall_tau"](spark, SF_DIR).collect()
    assert -1.0 <= r["tau_b"] <= 1.0
    assert r["conc"] + r["disc"] <= r["n_pairs"]
    vals = duck.execute(
        """SELECT SUM(CAST(floor(l_extendedprice*100+0.5) AS BIGINT)),
                  SUM(CAST(l_quantity AS BIGINT))
           FROM lineitem GROUP BY l_partkey"""
    ).fetchall()
    import math

    conc = disc = tx = ty = 0
    for i in range(len(vals)):
        for j in range(i + 1, len(vals)):
            dx = vals[i][0] - vals[j][0]
            dy = vals[i][1] - vals[j][1]
            if dx == 0:
                tx += 1
            if dy == 0:
                ty += 1
            if dx * dy > 0:
                conc += 1
            elif dx * dy < 0:
                disc += 1
    npairs = len(vals) * (len(vals) - 1) // 2
    tau = (conc - disc) / (
        math.sqrt(npairs - tx) * math.sqrt(npairs - ty)
    )
    assert r["conc"] == conc and r["disc"] == disc
    assert abs(r["tau_b"] - tau) < 1e-12
    # perfectly agreeing rankings => tau == 1 exactly
    agree = [(i, 2 * i) for i in range(50)]
    c2 = sum(
        1
        for i in range(50)
        for j in range(i + 1, 50)
        if (agree[i][0] - agree[j][0]) * (agree[i][1] - agree[j][1]) > 0
    )
    assert c2 == 50 * 49 // 2
