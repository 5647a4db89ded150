"""Structured Streaming layer tests — file sources under tmp_path, every
query drained with Trigger.AvailableNow so tests are deterministic."""

from __future__ import annotations

import json
import os

import pytest


SCHEMA = "event_id long, ts timestamp, user_id long, value double"


def _write_ndjson(path, rows, name="part0.json"):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


ROWS = [
    {"event_id": 1, "ts": "2024-01-01T10:00:00", "user_id": 1, "value": 10.0},
    {"event_id": 2, "ts": "2024-01-01T10:10:00", "user_id": 1, "value": 5.0},
    {"event_id": 3, "ts": "2024-01-01T12:00:00", "user_id": 2, "value": 7.0},
]


def test_ingest_available_now_exactly_once(spark, tmp_path):
    from hoops_edge_database_etl_spark.streaming.pipeline import (
        ingest_available_now,
        read_json_stream,
    )

    src_dir, dst, cp = str(tmp_path / "src"), str(tmp_path / "dst"), str(tmp_path / "cp")
    _write_ndjson(src_dir, ROWS)
    src = read_json_stream(spark, src_dir, SCHEMA)
    ingest_available_now(src, dst, cp).awaitTermination(60)
    assert spark.read.parquet(dst).count() == 3
    # re-run without new files: offsets tracked, nothing re-ingested
    ingest_available_now(read_json_stream(spark, src_dir, SCHEMA), dst, cp).awaitTermination(60)
    assert spark.read.parquet(dst).count() == 3
    # new file arrives → only it is processed
    _write_ndjson(src_dir, [
        {"event_id": 4, "ts": "2024-01-01T13:00:00", "user_id": 2, "value": 1.0}
    ], name="part1.json")
    ingest_available_now(read_json_stream(spark, src_dir, SCHEMA), dst, cp).awaitTermination(60)
    assert spark.read.parquet(dst).count() == 4


def test_windowed_counts_stream(spark, tmp_path):
    from hoops_edge_database_etl_spark.streaming.pipeline import (
        read_json_stream,
        windowed_counts,
    )

    src_dir = str(tmp_path / "src")
    _write_ndjson(src_dir, ROWS)
    agg = windowed_counts(
        read_json_stream(spark, src_dir, SCHEMA), "ts", ["user_id"], "1 hour"
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = {
        (r["user_id"], str(r["window_start"])): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    assert rows[(1, "2024-01-01 10:00:00")] == (2, 15.0)
    assert rows[(2, "2024-01-01 12:00:00")] == (1, 7.0)


def test_dedup_within_watermark(spark, tmp_path):
    from hoops_edge_database_etl_spark.streaming.pipeline import (
        dedup_within_watermark,
        read_json_stream,
    )

    src_dir = str(tmp_path / "src")
    dup_rows = ROWS + [ROWS[0] | {"value": 99.0}]  # same event_id re-delivered
    _write_ndjson(src_dir, dup_rows)
    deduped = dedup_within_watermark(
        read_json_stream(spark, src_dir, SCHEMA), ["event_id"], "ts"
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    out = spark.sql("SELECT event_id FROM dedup_out").collect()
    assert sorted(r["event_id"] for r in out) == [1, 2, 3]


def test_session_counts_stream(spark, tmp_path):
    from hoops_edge_database_etl_spark.streaming.pipeline import (
        read_json_stream,
        session_counts,
    )

    src_dir = str(tmp_path / "src")
    _write_ndjson(src_dir, ROWS)
    sess = session_counts(read_json_stream(spark, src_dir, SCHEMA), "ts", "user_id")
    q = (
        sess.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = {
        (r["user_id"], str(r["session_start"])): r["n_events"]
        for r in spark.sql("SELECT * FROM sessions").collect()
    }
    # events 10:00 and 10:10 merge into one session; 12:00 is its own
    assert rows[(1, "2024-01-01 10:00:00")] == 2
    assert rows[(2, "2024-01-01 12:00:00")] == 1


def test_foreach_batch_upsert_keeps_latest(spark, tmp_path):
    from hoops_edge_database_etl_spark.streaming.pipeline import (
        foreach_batch_upsert,
        read_json_stream,
    )

    src_dir, dst, cp = str(tmp_path / "s"), str(tmp_path / "d"), str(tmp_path / "c")
    _write_ndjson(src_dir, ROWS)
    q = foreach_batch_upsert(
        read_json_stream(spark, src_dir, SCHEMA), dst, cp, ["event_id"], "ts"
    )
    q.awaitTermination(60)
    assert spark.read.parquet(dst).count() == 3
    # a later-ts re-delivery of event 1 replaces the original
    _write_ndjson(
        src_dir,
        [{"event_id": 1, "ts": "2024-01-01T15:00:00", "user_id": 1, "value": 42.0}],
        name="p1.json",
    )
    q = foreach_batch_upsert(
        read_json_stream(spark, src_dir, SCHEMA), dst, cp, ["event_id"], "ts"
    )
    q.awaitTermination(60)
    out = {r["event_id"]: r["value"] for r in spark.read.parquet(dst).collect()}
    assert out == {1: 42.0, 2: 5.0, 3: 7.0}


def test_stateful_running_totals(spark, tmp_path):
    from hoops_edge_database_etl_spark.streaming.pipeline import (
        read_json_stream,
        stateful_running_totals,
    )

    src_dir = str(tmp_path / "src")
    _write_ndjson(src_dir, ROWS)
    totals = stateful_running_totals(
        read_json_stream(spark, src_dir, SCHEMA), "user_id", "ts", "value"
    )
    q = (
        totals.writeStream.format("memory")
        .queryName("totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = {r["user_id"]: (r["n_events"], r["total"]) for r in spark.sql("SELECT * FROM totals").collect()}
    assert rows[1] == (2, 15.0)
    assert rows[2] == (1, 7.0)


def test_streaming_session_window_merges_across_batches(spark):
    """Session count from the streaming state store equals the batch
    gaps-and-islands computation (already hash-checked; here assert the
    structural invariant that sessions per user are non-overlapping)."""
    from hoops_edge_database_etl_spark.queries import all_queries
    from tests.conftest import SF_DIR

    rows = all_queries()["q156_streaming_session_window"](spark, SF_DIR).collect()
    assert rows
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for sess in by_user.values():
        sess.sort(key=lambda r: r["session_start"])
        for a, b in zip(sess, sess[1:]):
            assert a["session_end"] <= b["session_start"]


def test_streaming_cdc_compaction_matches_batch_twin(spark, duck):
    """q200 (stream) and q195 (batch) must agree on every shared column."""
    from tests.conftest import SF_DIR, compare_query
    from hoops_edge_database_etl_spark.queries import all_queries

    compare_query(spark, duck, "q200_streaming_cdc_compaction")
    qs = all_queries()
    s = qs["q200_streaming_cdc_compaction"](spark, SF_DIR).collect()[0]
    b = qs["q195_cdc_compaction"](spark, SF_DIR).collect()[0]
    assert (s["n_live"], s["n_tombstones"], s["live_cents"]) == (
        b["n_live"], b["n_tombstones"], b["live_cents"]
    )


def test_q293_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q293_streaming_fingerprint")


def test_q293_agrees_with_batch_fingerprint(spark):
    """The streaming fingerprint must equal q286's batch computation —
    the commutative-aggregate property in action."""
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    stream = {
        r["split"]: (r["n_docs"], r["fingerprint"])
        for r in all_queries()["q293_streaming_fingerprint"](spark, SF_DIR).collect()
    }
    batch = {
        r["split"]: (r["n_docs"], r["fingerprint"])
        for r in all_queries()["q286_dataset_fingerprint"](spark, SF_DIR).collect()
    }
    assert stream == batch
