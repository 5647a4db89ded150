"""Tolerance-window dedup and the linkage operating curve (q454-q455):
oracle parity plus chain-rule, conservation, and monotonicity
properties."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_DIR, compare_query


def test_q454_matches_oracle(spark, duck):
    compare_query(spark, duck, "q454_tolerance_dedup")


def test_q455_matches_oracle(spark, duck):
    compare_query(spark, duck, "q455_linkage_threshold_curve")


def test_q454_collapses_planted_echoes_conserving_rows(spark, duck):
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = all_queries()["q454_tolerance_dedup"](spark, SF_DIR).collect()
    n_events = duck.execute("SELECT COUNT(*) FROM events").fetchone()[0]
    n_echo = duck.execute(
        "SELECT COUNT(*) FROM events WHERE event_id % 5 = 0"
    ).fetchone()[0]
    # conservation: every input row (original + echo) lands in a group
    assert sum(r["n_collapsed"] for r in rows) == n_events + n_echo
    # no surviving keeper is an echo id unless its original merged away
    # (echo ids are original + 1_000_000; the keeper is min event_id)
    assert all(r["kept_event_id"] < 1_000_000 for r in rows)
    # echoes actually merged: groups with n_collapsed >= 2 exist in bulk
    assert sum(1 for r in rows if r["n_collapsed"] >= 2) > 0.8 * n_echo


def test_q454_chain_rule_and_gap_isolation(spark):
    from hoops_edge_database_etl_spark.queries.windows import (  # noqa: F401
        q454_tolerance_dedup,
    )

    # planted chain a, a+1, a+2 (pairwise within 2s end to end via the
    # chain rule) plus an isolated event 10s later
    rows = [
        (1, "view", 1000, 1),
        (1, "view", 1001, 2),
        (1, "view", 1002, 3),
        (1, "view", 1012, 4),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, sec long, event_id long"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "event_type").orderBy("sec", "event_id")
    flagged = df.withColumn(
        "is_head",
        F.when(F.col("sec") - F.lag("sec").over(w) <= 2, 0).otherwise(1),
    )
    grp = flagged.withColumn(
        "g", F.sum("is_head").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    out = (
        grp.groupBy("user_id", "event_type", "g")
        .agg(
            F.min("event_id").alias("kept"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    got = sorted((r["kept"], r["n"]) for r in out)
    assert got == [(1, 3), (4, 1)]


def test_q455_conservation_and_monotonicity(spark):
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = sorted(
        all_queries()["q455_linkage_threshold_curve"](spark, SF_DIR).collect(),
        key=lambda r: r["threshold"],
    )
    total = rows[0]["tp"] + rows[0]["fn"]
    for r in rows:
        assert r["tp"] + r["fn"] == total
        assert r["precision_ppm"] == r["tp"] * 1000000 // (r["tp"] + r["fp"])
        assert r["recall_ppm"] == r["tp"] * 1000000 // total
        assert (
            r["f1_ppm"]
            == 2 * r["tp"] * 1000000 // (2 * r["tp"] + r["fp"] + r["fn"])
        )
    tps = [r["tp"] for r in rows]
    fps = [r["fp"] for r in rows]
    recalls = [r["recall_ppm"] for r in rows]
    assert tps == sorted(tps, reverse=True)
    assert fps == sorted(fps, reverse=True)
    assert recalls == sorted(recalls, reverse=True)
    assert sum(1 for r in rows if r["is_best_f1"]) >= 1
    best = max(r["f1_ppm"] for r in rows)
    assert all((r["f1_ppm"] == best) == r["is_best_f1"] for r in rows)
