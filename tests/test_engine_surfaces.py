"""Streaming count-min, Python UDTF, VARIANT extraction (q434-q436):
oracle parity plus the streaming≡batch, conservation, and
surface-equivalence properties."""

from __future__ import annotations

from tests.conftest import SF_DIR, compare_query


def test_q434_matches_oracle(spark, duck):
    compare_query(spark, duck, "q434_streaming_countmin")


def test_q435_matches_oracle(spark, duck):
    compare_query(spark, duck, "q435_python_udtf")


def test_q436_matches_oracle(spark, duck):
    compare_query(spark, duck, "q436_variant_json")


def test_q434_stream_equals_batch_q125(spark):
    """The streamed sketch probe is bit-identical to batch q125 — the
    exactly-once replay claim, checked end to end."""
    from hoops_edge_database_etl_spark.queries import all_queries

    qs = all_queries()
    stream = sorted(
        tuple(r) for r in qs["q434_streaming_countmin"](spark, SF_DIR).collect()
    )
    batch = sorted(
        tuple(r) for r in qs["q125_countmin_heavy_hitters"](spark, SF_DIR).collect()
    )
    assert stream == batch


def test_q435_installments_conserve_cents(spark, duck):
    """Every order's installments sum exactly to its cents total, counts
    match k, and amounts differ by at most one cent (largest
    remainder)."""
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = all_queries()["q435_python_udtf"](spark, SF_DIR).collect()
    per = {}
    for r in rows:
        per.setdefault(r["o_orderkey"], []).append(r["amount"])
    truth = dict(
        duck.execute(
            """
            SELECT o_orderkey, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
            FROM orders WHERE o_orderkey % 31 = 0
            """
        ).fetchall()
    )
    assert set(per) == set(truth)
    for k, amounts in per.items():
        assert sum(amounts) == truth[k]
        assert len(amounts) == k % 4 + 2
        assert max(amounts) - min(amounts) <= 1


def test_q436_variant_counts_match_string_path(spark):
    """The VARIANT route agrees with the legacy get_json_object route on
    the same data — two JSON machineries inside Spark itself."""
    import pyspark.sql.functions as F

    from hoops_edge_database_etl_spark.tables import load

    ev = load(spark, SF_DIR, "events")
    a = ev.select(
        F.expr("try_variant_get(try_parse_json(props), '$.k', 'bigint')").alias("k")
    )
    b = ev.select(F.get_json_object("props", "$.k").cast("long").alias("k"))
    assert sorted(r["k"] for r in a.collect()) == sorted(
        r["k"] for r in b.collect()
    )
