"""External-API ingest connector (SURVEY.md S1-S5).

The reference's Semantic Scholar client (reference:
src/DataPipeline/Ingestion/semantic_scholar_client.py:8-494) is a
driver-process asyncio fan-out: paged search with retry/backoff and
adaptive limit shrink (S1, :44,147-166), point lookup (S2, :199-269),
batched id fetch behind a semaphore sized by API-key count (S3,
:272-331), paginated reference scans with a per-paper cap (S4,
:334-438), and a reference fan-out returning an edge list (S5,
:441-494).

Spark-first restatement: the *protocol* mechanics (token bucket,
retry/backoff, pagination) live in a transport-agnostic client so they
are unit-testable without a network; the *distribution* is
``mapPartitions`` over an id/term DataFrame with one client per
partition — each Spark task holds its own rate limiter, so aggregate
throughput = partitions x per-partition rate, tunable to the
provider's global ceiling by choosing the partition count
(``repartition(total_rate / per_task_rate)``). No driver-side
collection of payloads: fetched rows are born distributed.

The HTTP layer itself is injected (``transport``): production passes a
requests/urllib3 session wrapper; tests and this container pass a
deterministic fake. Nothing else changes — the retry loop, paging and
rate control are identical either way.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable, Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# A transport takes (endpoint, params) and returns a decoded JSON-ish
# dict. It raises TransportError with a status code on HTTP failure.
Transport = Callable[[str, dict[str, Any]], dict[str, Any]]


class TransportError(Exception):
    """HTTP-level failure with a status code, like requests.HTTPError."""

    def __init__(self, status: int, message: str = ""):
        super().__init__(f"HTTP {status}: {message}")
        self.status = status


def make_http_transport(
    base_url: str, timeout_s: float = 30.0
) -> Transport:
    """Real HTTP transport over stdlib urllib — the production
    implementation of the Transport seam the fakes stand in for
    (reference semantic_scholar_client.py:8-196 is aiohttp; urllib
    keeps the engine dependency-free, and a closure over a string is
    picklable to executors). GETs ``base_url/endpoint`` with params
    urlencoded, decodes the JSON body, and maps HTTP failures to
    ``TransportError(status)`` so the client's retry/backoff/shrink
    ladder sees exactly the statuses it was built for. Accepts the
    optional ``headers`` kwarg, so ``ApiClient`` key rotation sends
    x-api-key on the wire. Exercised against a real loopback socket
    in tests/test_api_ingest.py (no external network anywhere)."""

    def transport(
        endpoint: str,
        params: dict[str, Any],
        headers: dict[str, str] | None = None,
    ) -> dict[str, Any]:
        import json as _json
        import urllib.error
        import urllib.parse
        import urllib.request

        url = base_url.rstrip("/") + "/" + endpoint.lstrip("/")
        if params:
            url += "?" + urllib.parse.urlencode(params)
        req = urllib.request.Request(url, headers=headers or {})
        try:
            with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                body = resp.read().decode("utf-8")
                return _json.loads(body) if body else {}
        except urllib.error.HTTPError as exc:
            raise TransportError(exc.code, str(exc.reason)) from exc

    return transport


class TokenBucket:
    """Classic token-bucket rate limiter.

    The reference enforces 1 req/s (keyed) / 1 per 5 s (anonymous) with
    bare sleeps (semantic_scholar_client.py:82-84); a bucket allows
    short bursts while holding the same sustained rate, which matters
    when many Spark tasks each run one.
    """

    def __init__(
        self,
        rate_per_sec: float,
        burst: int = 1,
        clock: Callable[[], float] = time.monotonic,
        sleeper: Callable[[float], None] = time.sleep,
    ):
        self.rate = float(rate_per_sec)
        self.capacity = float(burst)
        self.tokens = float(burst)
        self.clock = clock
        self.sleeper = sleeper
        self.last = clock()

    def acquire(self) -> float:
        """Block until a token is available; return seconds waited."""
        waited = 0.0
        while True:
            now = self.clock()
            self.tokens = min(
                self.capacity, self.tokens + (now - self.last) * self.rate
            )
            self.last = now
            if self.tokens >= 1.0:
                self.tokens -= 1.0
                return waited
            need = (1.0 - self.tokens) / self.rate
            self.sleeper(need)
            waited += need


class ApiKeyPool:
    """Thread-safe round-robin API key rotation (the reference's
    APIKeyManager, api_key_manager.py:14-60: comma-separated key list,
    lock-guarded cycle). ``start`` offsets the cycle so N Spark tasks
    seeded with consecutive starts spread load across keys instead of
    rotating in lockstep.

    Not picklable (holds a lock) by design — ship the raw key tuple
    to executors and build a pool per task (see
    fetch_papers_distributed)."""

    def __init__(self, keys: Iterable[str], start: int = 0):
        import threading

        self._keys = [k for k in keys if k]
        self._i = start % len(self._keys) if self._keys else 0
        self._lock = threading.Lock()

    def __len__(self) -> int:
        return len(self._keys)

    @property
    def keys(self) -> tuple[str, ...]:
        return tuple(self._keys)

    def next_key(self) -> str | None:
        if not self._keys:
            return None
        with self._lock:
            key = self._keys[self._i]
            self._i = (self._i + 1) % len(self._keys)
            return key


def adaptive_max_concurrent(n_keys: int, requested: int = 10) -> int:
    """The reference's key-count → concurrency tiering (main.py:
    111-131): 1 key caps at 3 concurrent, 2 keys at 5, 3+ run the
    requested fan-out. In the Spark restatement 'concurrent requests'
    = partitions each holding one rate-limited client, so this sizes
    ``num_tasks``."""
    if n_keys <= 1:
        return min(3, requested)
    if n_keys == 2:
        return min(5, requested)
    return requested


@dataclass
class ApiClientConfig:
    rate_per_sec: float = 1.0
    burst: int = 1
    max_retries: int = 5
    # 429 backoff: base * 2^attempt, capped (reference waits 10*2^n
    # capped at 60, semantic_scholar_client.py:140-144).
    backoff_base_sec: float = 10.0
    backoff_cap_sec: float = 60.0
    page_limit: int = 100
    # On HTTP 400 the reference halves the requested page size and
    # retries (adaptive limit shrink, semantic_scholar_client.py:
    # 147-166); floor prevents shrinking to zero.
    min_page_limit: int = 10
    fields: tuple[str, ...] = (
        "paperId",
        "title",
        "abstract",
        "year",
        "citationCount",
        "references",
    )


@dataclass
class ApiClient:
    """Transport-agnostic paged/retrying API client (S1-S4 mechanics)."""

    transport: Transport
    config: ApiClientConfig = field(default_factory=ApiClientConfig)
    sleeper: Callable[[float], None] = time.sleep
    # Optional key rotation: each request takes the pool's next key
    # and sends it as the x-api-key header (semantic_scholar_client.py
    # :308-310 rotates per request under the semaphore). Transports
    # that don't accept a ``headers`` kwarg (the 2-arg test doubles)
    # are detected once and called without it.
    key_pool: "ApiKeyPool | None" = None

    def __post_init__(self) -> None:
        import inspect

        self._bucket = TokenBucket(
            self.config.rate_per_sec,
            self.config.burst,
            sleeper=self.sleeper,
        )
        self.request_count = 0
        self.retry_count = 0
        try:
            sig = inspect.signature(self.transport)
            self._transport_takes_headers = "headers" in sig.parameters
        except (TypeError, ValueError):
            self._transport_takes_headers = False

    def _send(self, endpoint: str, params: dict[str, Any]) -> dict:
        key = self.key_pool.next_key() if self.key_pool else None
        if self._transport_takes_headers:
            headers = {"x-api-key": key} if key else {}
            return self.transport(endpoint, params, headers=headers)
        return self.transport(endpoint, params)

    # -- core request with rate limit + retry/backoff ------------------
    def _request(self, endpoint: str, params: dict[str, Any]) -> dict:
        cfg = self.config
        limit = params.get("limit")
        for attempt in range(cfg.max_retries + 1):
            self._bucket.acquire()
            self.request_count += 1
            try:
                return self._send(endpoint, dict(params))
            except TransportError as exc:
                self.retry_count += 1
                if exc.status == 429:
                    if attempt >= cfg.max_retries:
                        raise
                    self.sleeper(
                        min(
                            cfg.backoff_base_sec * (2**attempt),
                            cfg.backoff_cap_sec,
                        )
                    )
                elif exc.status == 400 and limit and limit > cfg.min_page_limit:
                    # adaptive page shrink, then retry immediately
                    limit = max(cfg.min_page_limit, limit // 2)
                    params["limit"] = limit
                elif exc.status in (500, 502, 503, 504):
                    if attempt >= cfg.max_retries:
                        raise
                    self.sleeper(min(2.0 * (2**attempt), cfg.backoff_cap_sec))
                else:
                    # 404 -> empty; 403 and other client errors are final
                    if exc.status == 404:
                        return {}
                    raise
        raise TransportError(599, "retries exhausted")

    # -- S1: paged search ----------------------------------------------
    def search(
        self, term: str, max_results: int
    ) -> Iterator[dict[str, Any]]:
        """Paged search scan with projection pushdown (``fields``)."""
        cfg = self.config
        offset, got = 0, 0
        while got < max_results:
            page = self._request(
                "search",
                {
                    "query": term,
                    "offset": offset,
                    "limit": min(cfg.page_limit, max_results - got),
                    "fields": ",".join(cfg.fields),
                },
            )
            rows = page.get("data", [])
            if not rows:
                return
            for row in rows:
                yield row
                got += 1
                if got >= max_results:
                    return
            offset += len(rows)
            if page.get("total") is not None and offset >= page["total"]:
                return

    # -- S8 support: offset-addressed slice (streaming source) ----------
    def search_total(self, term: str = "") -> int:
        """One metadata probe: total result count for a query —
        drives the streaming source's latestOffset."""
        page = self._request(
            "search",
            {"query": term, "offset": 0, "limit": 1, "fields": ""},
        )
        return int(page.get("total", 0))

    def search_slice(
        self, offset: int, count: int, term: str = ""
    ) -> Iterator[dict[str, Any]]:
        """Absolute-offset page fetch: rows [offset, offset+count) of
        the stable result order — the addressable form a replayable
        streaming micro-batch needs (vs ``search``'s cursor scan)."""
        cfg = self.config
        got = 0
        while got < count:
            page = self._request(
                "search",
                {
                    "query": term,
                    "offset": offset + got,
                    "limit": min(cfg.page_limit, count - got),
                    "fields": ",".join(cfg.fields),
                },
            )
            rows = page.get("data", [])
            if not rows:
                return
            for row in rows:
                yield row
                got += 1
                if got >= count:
                    return

    # -- S2: point lookup ----------------------------------------------
    def get_paper(self, paper_id: str) -> dict[str, Any] | None:
        out = self._request(
            "paper", {"id": paper_id, "fields": ",".join(self.config.fields)}
        )
        return out or None

    # -- S4: paginated references with per-paper cap --------------------
    def get_references(
        self, paper_id: str, max_refs: int
    ) -> list[str]:
        refs: list[str] = []
        offset = 0
        while len(refs) < max_refs:
            page = self._request(
                "references",
                {
                    "id": paper_id,
                    "offset": offset,
                    "limit": min(self.config.page_limit, max_refs - len(refs)),
                },
            )
            rows = page.get("data", [])
            if not rows:
                break
            refs.extend(
                r.get("citedPaper", {}).get("paperId") or r.get("paperId")
                for r in rows
            )
            offset += len(rows)
        return [r for r in refs if r][:max_refs]


# ---------------------------------------------------------------------
# Distributed fan-out (S3/S5): mapPartitions with a per-task client.
# ---------------------------------------------------------------------

PAPER_SCHEMA = StructType(
    [
        StructField("paperId", StringType()),
        StructField("title", StringType()),
        StructField("abstract", StringType()),
        StructField("year", IntegerType()),
        StructField("citationCount", LongType()),
        StructField("references_id", ArrayType(StringType())),
    ]
)

EDGE_SCHEMA = StructType(
    [
        StructField("src_paper_id", StringType()),
        StructField("dst_paper_id", StringType()),
    ]
)


def _row_from_payload(p: dict[str, Any]) -> tuple:
    refs = [
        r.get("paperId")
        for r in (p.get("references") or [])
        if isinstance(r, dict) and r.get("paperId")
    ]
    year = p.get("year")
    cites = p.get("citationCount")
    return (
        p.get("paperId"),
        p.get("title"),
        p.get("abstract"),
        int(year) if year is not None else None,
        int(cites) if cites is not None else None,
        refs,
    )


def fetch_papers_distributed(
    spark: SparkSession,
    paper_ids: DataFrame,
    transport_factory: Callable[[], Transport],
    config: ApiClientConfig | None = None,
    num_tasks: int | None = None,
    api_keys: Iterable[str] = (),
    max_concurrent: int = 10,
) -> DataFrame:
    """S3: batched id fan-out as ``mapPartitions``.

    One ``ApiClient`` (own token bucket) per partition; aggregate rate
    = ``num_tasks * rate_per_sec`` — choose ``num_tasks`` to match the
    provider's global ceiling. When ``num_tasks`` is not given it is
    sized ADAPTIVELY from the key-pool size exactly as the reference
    sizes its semaphore (main.py:111-131: 1 key → 3, 2 keys → 5, 3+ →
    ``max_concurrent``). Each task builds its own ``ApiKeyPool`` over
    the shipped key tuple, cycle-offset by partition index so the
    fleet spreads across keys instead of rotating in lockstep
    (api_key_manager.py's process-wide cycle, distributed).

    ``transport_factory`` must be picklable (module-level function /
    functools.partial) because it ships to executors.
    """
    cfg = config or ApiClientConfig()
    keys = tuple(k for k in api_keys if k)
    if num_tasks is None and keys:
        num_tasks = adaptive_max_concurrent(len(keys), max_concurrent)

    def fetch_partition(pid: int, rows: Iterable) -> Iterator[tuple]:
        pool = ApiKeyPool(keys, start=pid) if keys else None
        client = ApiClient(transport_factory(), cfg, key_pool=pool)
        for row in rows:
            payload = client.get_paper(row[0])
            if payload:
                yield _row_from_payload(payload)

    ids = paper_ids
    if num_tasks:
        ids = ids.repartition(num_tasks)
    return spark.createDataFrame(
        ids.rdd.mapPartitionsWithIndex(fetch_partition), PAPER_SCHEMA
    )


def fetch_reference_edges_distributed(
    spark: SparkSession,
    paper_ids: DataFrame,
    transport_factory: Callable[[], Transport],
    config: ApiClientConfig | None = None,
    max_refs_per_paper: int = 50,
    num_tasks: int | None = None,
    api_keys: Iterable[str] = (),
    max_concurrent: int = 10,
) -> DataFrame:
    """S5: reference fan-out producing the citation edge list
    ``(src_paper_id, dst_paper_id)`` — the distributed form of the
    reference's dict paperId -> [ref ids] (semantic_scholar_client.py:
    441-494), ready for the D6 graph-expansion join. Key rotation and
    adaptive task sizing as in ``fetch_papers_distributed``."""
    cfg = config or ApiClientConfig()
    keys = tuple(k for k in api_keys if k)
    if num_tasks is None and keys:
        num_tasks = adaptive_max_concurrent(len(keys), max_concurrent)

    def fetch_partition(pid: int, rows: Iterable) -> Iterator[tuple]:
        pool = ApiKeyPool(keys, start=pid) if keys else None
        client = ApiClient(transport_factory(), cfg, key_pool=pool)
        for row in rows:
            for ref in client.get_references(row[0], max_refs_per_paper):
                yield (row[0], ref)

    ids = paper_ids
    if num_tasks:
        ids = ids.repartition(num_tasks)
    return spark.createDataFrame(
        ids.rdd.mapPartitionsWithIndex(fetch_partition), EDGE_SCHEMA
    )
