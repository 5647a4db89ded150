"""Extract stage (S1–S4) unit tests with a fake transport — no network."""

from __future__ import annotations

from datetime import date

import pytest

from hoops_edge_database_etl_spark.sources.extract import (
    EndpointSpec,
    ExtractError,
    Extractor,
    RetryPolicy,
    TokenBucket,
    date_chunks,
    records_to_df,
    season_window,
)


def make_extractor(transport, **kw):
    sleeps: list[float] = []
    ex = Extractor(
        transport,
        retry=kw.pop("retry", RetryPolicy(max_attempts=4, base_delay=0.5, max_delay=8.0)),
        sleeper=sleeps.append,
        **kw,
    )
    return ex, sleeps


def test_retry_backoff_then_success():
    calls = []

    def transport(path, params):
        calls.append(path)
        if len(calls) < 3:
            return 503, {}, None
        return 200, {}, [{"id": 1}]

    ex, sleeps = make_extractor(transport)
    assert ex.fetch_json("/games") == [{"id": 1}]
    assert len(calls) == 3
    # exponential: 0.5, 1.0 (the bucket may also sleep, so check subset)
    assert [s for s in sleeps if s in (0.5, 1.0)] == [0.5, 1.0]


def test_retry_after_header_overrides_backoff():
    seen = []

    def transport(path, params):
        seen.append(1)
        return (429, {"Retry-After": "2.5"}, None) if len(seen) == 1 else (200, {}, [])

    ex, sleeps = make_extractor(transport)
    ex.fetch_json("/games")
    assert 2.5 in sleeps


def test_non_retryable_and_exhausted_raise():
    ex, _ = make_extractor(lambda p, q: (404, {}, None))
    with pytest.raises(ExtractError) as ei:
        ex.fetch_json("/nope")
    assert ei.value.status == 404 and ei.value.attempts == 1

    ex2, _ = make_extractor(lambda p, q: (500, {}, None))
    with pytest.raises(ExtractError) as ei2:
        ex2.fetch_json("/flaky")
    assert ei2.value.attempts == 4  # max_attempts spent


def test_token_bucket_blocks_until_refill():
    clock = [0.0]
    slept = []

    def sleeper(s):
        slept.append(s)
        clock[0] += s

    b = TokenBucket(2.0, clock=lambda: clock[0], sleeper=sleeper)
    b.acquire()
    b.acquire()  # drains the 2-token burst
    b.acquire()  # must wait for refill
    assert slept, "third acquire should have slept"


def test_season_window_and_date_chunks():
    lo, hi = season_window(2024)
    assert (lo, hi) == (date(2023, 8, 1), date(2024, 7, 31))
    chunks = list(date_chunks(date(2024, 1, 1), date(2024, 2, 15), 30))
    assert chunks[0] == (date(2024, 1, 1), date(2024, 1, 30))
    assert chunks[-1][1] == date(2024, 2, 15)
    # lossless, non-overlapping coverage
    assert chunks[1][0] == date(2024, 1, 31)


def test_season_endpoint_chunked_params():
    calls = []

    def transport(path, params):
        calls.append((path, dict(params)))
        return 200, {}, [{"gameId": len(calls)}]

    ex, _ = make_extractor(transport)
    spec = EndpointSpec(
        name="games",
        path="/games",
        kind="season",
        season_param="season",
        start_date_param="startDateRange",
        end_date_param="endDateRange",
    )
    recs = ex.run_endpoint(spec, seasons=[2024], chunk_days=100)
    assert len(recs) == len(calls) == 4  # 365-day window / 100-day chunks
    assert all(p["season"] == 2024 for _, p in calls)
    assert calls[0][1]["startDateRange"] == "2023-08-01"
    assert calls[-1][1]["endDateRange"] == "2024-07-31"


def test_fanout_discovery_and_dead_letter():
    def transport(path, params):
        if path == "/plays/game/13":
            return 500, {}, None
        return 200, {}, [{"playId": path}]

    ex, _ = make_extractor(transport)
    parents = [{"gameId": 12}, {"gameId": 13}, {"gameId": 12}, {"noId": 9}]
    ids = Extractor.discover_ids(parents, "gameId")
    assert ids == [12, 13]
    spec = EndpointSpec(
        name="plays", path="/plays/game/{gameId}", kind="fanout", fanout_param="gameId"
    )
    recs = ex.run_endpoint(spec, parent_ids=ids)
    assert [r["playId"] for r in recs] == ["/plays/game/12"]
    assert ex.dead_letters == [
        {"endpoint": "plays", "path": "/plays/game/13", "params": {}, "status": 500}
    ]


def test_records_to_df_declared_schema(spark):
    df = records_to_df(
        spark, [{"gameId": 1, "team": "A"}, {"gameId": 2, "team": None}],
        "gameId long, team string",
    )
    assert df.count() == 2
    assert [f.simpleString() for f in df.schema.fields] == ["gameId:bigint", "team:string"]


def test_token_bucket_sub_unit_rate_does_not_hang():
    """rate < 1/s (one call per 2s) must still eventually grant a token —
    the capacity floor of 1 keeps fractional accumulation reachable."""
    clock = [0.0]
    def sleeper(s):
        clock[0] += s

    b = TokenBucket(0.5, clock=lambda: clock[0], sleeper=sleeper)
    b.acquire()  # burst token
    b.acquire()  # must refill (~2s simulated) instead of spinning forever
    assert clock[0] >= 2.0


def test_retry_after_http_date_falls_back_to_backoff():
    """An RFC 7231 HTTP-date Retry-After must not crash past the
    dead-letter handler — fall back to exponential backoff."""
    seen = []

    def transport(path, params):
        seen.append(1)
        return (
            (429, {"Retry-After": "Fri, 31 Dec 1999 23:59:59 GMT"}, None)
            if len(seen) == 1
            else (200, {}, [])
        )

    ex, sleeps = make_extractor(transport)
    ex.fetch_json("/games")
    assert 0.5 in sleeps  # base backoff used, no ValueError


def test_incoherent_specs_rejected():
    ex, _ = make_extractor(lambda p, q: (200, {}, []))
    with pytest.raises(ValueError):
        ex.run_endpoint(
            EndpointSpec(name="plays", path="/plays/{gameId}", kind="fanout"),
            parent_ids=[1],
        )
    with pytest.raises(ValueError):
        ex.run_endpoint(
            EndpointSpec(
                name="games", path="/games", kind="season",
                season_param="season", start_date_param="start",
            ),
            seasons=[2024], chunk_days=30,
        )


def test_negative_retry_after_clamped_to_zero():
    """A hostile/buggy negative Retry-After must not reach time.sleep
    (ValueError would escape the dead-letter path — ADVICE r2)."""
    p = RetryPolicy(max_attempts=3, base_delay=0.5, max_delay=8.0)
    assert p.delay(1, retry_after="-5") == 0.0
    assert p.delay(1, retry_after="-0.1") == 0.0
    assert p.delay(1, retry_after="3") == 3.0
