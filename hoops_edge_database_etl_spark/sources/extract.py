"""Extract stage (SURVEY.md §2.1 S1–S4): REST source, endpoint registry,
date-chunked season scans, and parent→child fan-out discovery.

The reference runs this as an asyncio HTTP pipeline (api_client.py:24-121
token-bucket rate limiter + bounded concurrency + exponential-backoff
retry honoring Retry-After; orchestrate.py:311-531 season/date-chunk/
fan-out drivers; config.yaml:23-191 endpoint registry). Extraction is
inherently a driver-side concern — the cluster's job starts at
``spark.createDataFrame`` — so this module keeps the same semantics as a
thin, transport-injectable layer: pass any callable
``(path, params) -> (status, headers, payload)`` (an http client in
production, a fake in tests — no network dependency here) and the
records land in a DataFrame for the normalize layer.

Scale note: the extract fan-out is bounded by the API's rate limit, not
by data volume; downstream Spark never sees this code. For bulk-history
replays the right move is the reference's own: land raw JSON to object
storage (sources.io.write_raw_ndjson) and let executors parse it.
"""

from __future__ import annotations

import threading
import time
from collections.abc import Callable, Iterable, Iterator, Sequence
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from datetime import date, timedelta
from typing import Any

from pyspark.sql import DataFrame, SparkSession

Transport = Callable[[str, dict], tuple[int, dict, Any]]

RETRYABLE_STATUSES = (429, 500, 502, 503, 504)


class ExtractError(RuntimeError):
    """Terminal extract failure (non-retryable status or retries spent)."""

    def __init__(self, path: str, status: int, attempts: int):
        super().__init__(f"{path} failed with status {status} after {attempts} attempts")
        self.path, self.status, self.attempts = path, status, attempts


@dataclass(frozen=True)
class RetryPolicy:
    """Exponential backoff with Retry-After override (api_client.py:66-121)."""

    max_attempts: int = 5
    base_delay: float = 0.5
    max_delay: float = 8.0

    def delay(self, attempt: int, retry_after: str | None = None) -> float:
        if retry_after is not None:
            try:
                # clamp below at 0: a negative Retry-After would make
                # time.sleep raise ValueError past the dead-letter path
                return max(0.0, min(self.max_delay, float(retry_after)))
            except ValueError:
                # RFC 7231 allows an HTTP-date here; fall back to backoff
                # rather than crashing past the dead-letter handler
                pass
        return min(self.max_delay, self.base_delay * (2 ** (attempt - 1)))


@dataclass(frozen=True)
class EndpointSpec:
    """One registry entry (config.yaml:23-191). ``kind``:

    - ``snapshot``: one unparameterized call;
    - ``season``: one call per season, optionally split into date chunks
      when ``start_date_param``/``end_date_param`` are declared;
    - ``fanout``: one call per discovered parent id, substituted into
      ``{placeholder}`` in the path (orchestrate.py:381-531).
    """

    name: str
    path: str
    kind: str = "snapshot"
    season_param: str | None = None
    start_date_param: str | None = None
    end_date_param: str | None = None
    fanout_param: str | None = None
    extra_params: dict = field(default_factory=dict)


class TokenBucket:
    """Thread-safe token bucket (api_client.py:24-44, sync form)."""

    def __init__(self, rate_per_sec: float, clock=time.monotonic, sleeper=time.sleep):
        self.rate = float(rate_per_sec)
        # capacity ≥ 1 or acquire() could never reach a whole token for
        # sub-1/s rates (e.g. one call per 2 s) and would spin forever
        self.capacity = max(1.0, self.rate)
        self._tokens = self.capacity
        self._clock, self._sleep = clock, sleeper
        self._last = clock()
        self._lock = threading.Lock()

    def acquire(self) -> None:
        while True:
            with self._lock:
                now = self._clock()
                self._tokens = min(
                    self.capacity, self._tokens + (now - self._last) * self.rate
                )
                self._last = now
                if self._tokens >= 1:
                    self._tokens -= 1
                    return
            self._sleep(max(0.01, 1 / self.rate))


def season_window(season: int, start=(8, 1), end=(7, 31)) -> tuple[date, date]:
    """A season's date window, e.g. 2024 → 2023-08-01..2024-07-31
    (config.yaml seasons.window_*)."""
    return date(season - 1, *start), date(season, *end)


def date_chunks(start: date, end: date, chunk_days: int) -> Iterator[tuple[date, date]]:
    """Inclusive [start, end] split into chunk_days-sized ranges (S3,
    orchestrate.py:823-860) — bounds API payload size per call."""
    cur = start
    step = timedelta(days=chunk_days)
    while cur <= end:
        nxt = min(end, cur + step - timedelta(days=1))
        yield cur, nxt
        cur = nxt + timedelta(days=1)


class Extractor:
    """S1 REST source with S2 registry semantics over an injected
    transport; retry/rate-limit/concurrency mirror the reference."""

    def __init__(
        self,
        transport: Transport,
        retry: RetryPolicy | None = None,
        rate_per_sec: float = 100.0,
        max_concurrency: int = 3,
        sleeper=time.sleep,
    ):
        self.transport = transport
        self.retry = retry or RetryPolicy()
        self.bucket = TokenBucket(rate_per_sec, sleeper=sleeper)
        self.max_concurrency = max_concurrency
        self._sleep = sleeper
        self.dead_letters: list[dict] = []

    def fetch_json(self, path: str, params: dict | None = None) -> Any:
        params = dict(params or {})
        attempt = 0
        while True:
            attempt += 1
            self.bucket.acquire()
            status, headers, payload = self.transport(path, params)
            if status == 200:
                return payload
            if status in RETRYABLE_STATUSES and attempt < self.retry.max_attempts:
                self._sleep(self.retry.delay(attempt, headers.get("Retry-After")))
                continue
            raise ExtractError(path, status, attempt)

    def _calls(self, spec: EndpointSpec, seasons, chunk_days, parent_ids):
        if spec.kind == "fanout" and not spec.fanout_param:
            raise ValueError(f"{spec.name}: fanout spec requires fanout_param")
        if spec.kind == "season" and bool(spec.start_date_param) != bool(
            spec.end_date_param
        ):
            raise ValueError(
                f"{spec.name}: start_date_param and end_date_param must be set together"
            )
        if spec.kind == "snapshot":
            yield spec.path, dict(spec.extra_params)
        elif spec.kind == "season":
            for season in seasons or ():
                base = dict(spec.extra_params)
                if spec.season_param:
                    base[spec.season_param] = season
                if spec.start_date_param and chunk_days:
                    lo, hi = season_window(season)
                    for s, e in date_chunks(lo, hi, chunk_days):
                        p = dict(base)
                        p[spec.start_date_param] = s.isoformat()
                        p[spec.end_date_param] = e.isoformat()
                        yield spec.path, p
                else:
                    yield spec.path, base
        elif spec.kind == "fanout":
            for pid in parent_ids or ():
                yield spec.path.format(**{spec.fanout_param: pid}), dict(spec.extra_params)
        else:
            raise ValueError(f"unknown endpoint kind {spec.kind!r}")

    def run_endpoint(
        self,
        spec: EndpointSpec,
        seasons: Sequence[int] | None = None,
        chunk_days: int | None = None,
        parent_ids: Iterable[Any] | None = None,
    ) -> list[dict]:
        """All calls for one endpoint (bounded thread fan-out sharing the
        rate bucket); failed calls dead-letter instead of killing the run
        (orchestrate.py:688-695)."""
        calls = list(self._calls(spec, seasons, chunk_days, parent_ids))

        def one(call):
            path, params = call
            try:
                payload = self.fetch_json(path, params)
            except ExtractError as exc:
                self.dead_letters.append(
                    {"endpoint": spec.name, "path": path, "params": params, "status": exc.status}
                )
                return []
            recs = payload if isinstance(payload, list) else [payload]
            return [r for r in recs if isinstance(r, dict)]

        out: list[dict] = []
        with ThreadPoolExecutor(max_workers=self.max_concurrency) as pool:
            for recs in pool.map(one, calls):
                out.extend(recs)
        return out

    @staticmethod
    def discover_ids(records: Iterable[dict], key: str) -> list[Any]:
        """S4 fan-out discovery: distinct non-null child ids from a parent
        endpoint's records (orchestrate.py:478-531), e.g. games → gameId →
        per-game plays/lineups."""
        seen: dict[Any, None] = {}
        for r in records:
            v = r.get(key)
            if v is not None:
                seen.setdefault(v, None)
        return list(seen)


def records_to_df(spark: SparkSession, records: list[dict], schema: str) -> DataFrame:
    """Hand-off to the cluster: extracted dicts → DataFrame with a declared
    schema (never inferred — extract payloads drift; the normalize layer's
    lenient casts do the rest)."""
    return spark.createDataFrame(records, schema)
