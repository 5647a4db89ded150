"""Connected components: star contraction vs label propagation
(operators/cc.py, VERDICT r5 item 5)."""

from __future__ import annotations

import pytest


def test_q410_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q410_star_components")


def test_q411_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q411_labelprop_components")


def test_q412_matches_q62_oracle(spark, duck):
    """Star contraction on the REAL LSH candidate graph must reproduce
    q62's labelprop clustering exactly (shared oracle)."""
    from tests.conftest import compare_query

    compare_query(spark, duck, "q412_dedup_clusters_star")


def _path_edges(spark, n, breaks=()):
    rows = [
        (i, i + 1) for i in range(n - 1) if i + 1 not in set(breaks)
    ]
    return spark.createDataFrame(rows, "src: long, dst: long")


def test_star_handles_long_path_where_labelprop_budget_fails(spark):
    """The adversarial case the operator exists for: a 200-node path has
    diameter 199 — label propagation needs ~200 sweeps (raises under a
    10-sweep budget), star contraction converges in O(log n) rounds."""
    from hoops_edge_database_etl_spark.operators.cc import (
        connected_components_labelprop,
        connected_components_star,
    )

    edges = _path_edges(spark, 200)
    comp = {
        r["node"]: r["component"]
        for r in connected_components_star(edges).collect()
    }
    assert comp == {i: 0 for i in range(200)}
    with pytest.raises(RuntimeError, match="label propagation"):
        connected_components_labelprop(edges, max_sweeps=10)


def test_star_and_labelprop_agree_on_multi_component_graph(spark):
    from hoops_edge_database_etl_spark.operators.cc import (
        connected_components_labelprop,
        connected_components_star,
    )

    # three components: a path 0-9, a triangle {20,21,22}, a pair {30,31};
    # edge orientation deliberately mixed
    rows = (
        [(i + 1, i) for i in range(9)]
        + [(20, 21), (22, 21), (20, 22)]
        + [(31, 30)]
    )
    edges = spark.createDataFrame(rows, "src: long, dst: long")
    star = {
        r["node"]: r["component"]
        for r in connected_components_star(edges).collect()
    }
    prop = {
        r["node"]: r["component"]
        for r in connected_components_labelprop(edges).collect()
    }
    want = (
        {i: 0 for i in range(10)}
        | {n: 20 for n in (20, 21, 22)}
        | {30: 30, 31: 30}
    )
    assert star == want
    assert prop == want


def test_star_single_edge_and_star_graph(spark):
    from hoops_edge_database_etl_spark.operators.cc import (
        connected_components_star,
    )

    edges = spark.createDataFrame(
        [(5, 9)] + [(100, 100 + i) for i in range(1, 6)], "src: long, dst: long"
    )
    comp = {
        r["node"]: r["component"]
        for r in connected_components_star(edges).collect()
    }
    assert comp[5] == 5 and comp[9] == 5
    assert all(comp[100 + i] == 100 for i in range(6))
