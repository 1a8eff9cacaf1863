"""Unit tests for the S1-S5 ingest connector: rate limiting, retry/
backoff, adaptive page shrink, pagination, and the distributed
mapPartitions fan-out — all against a deterministic fake transport
(the reference unit-tests the same mechanics with mocked HTTP,
tests/unit/test_semantic_scholar_client.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from citeconnect_datapipeline_spark.sources.api_ingest import (
    ApiClient,
    ApiClientConfig,
    TokenBucket,
    TransportError,
    fetch_papers_distributed,
    fetch_reference_edges_distributed,
)
from citeconnect_datapipeline_spark.sources.fake_transport import (
    CORPUS,
    FakeTransport,
    fake_transport_factory,
)

# ---------------------------------------------------------------------
# Fakes
# ---------------------------------------------------------------------

def no_sleep(_secs: float) -> None:
    return None


def make_client(transport, **cfg) -> ApiClient:
    return ApiClient(transport, ApiClientConfig(**cfg), sleeper=no_sleep)


# ---------------------------------------------------------------------
# TokenBucket
# ---------------------------------------------------------------------


def test_token_bucket_enforces_sustained_rate():
    now = [0.0]
    slept = []

    def clock():
        return now[0]

    def sleeper(s):
        slept.append(s)
        now[0] += s

    bucket = TokenBucket(rate_per_sec=2.0, burst=1, clock=clock, sleeper=sleeper)
    for _ in range(5):
        bucket.acquire()
    # 1 free token + 4 paid waits at 0.5 s each
    assert sum(slept) == pytest.approx(2.0)


def test_token_bucket_burst_allows_initial_spike():
    now = [0.0]
    slept = []
    bucket = TokenBucket(
        1.0, burst=3, clock=lambda: now[0], sleeper=lambda s: slept.append(s)
    )
    for _ in range(3):
        bucket.acquire()
    assert slept == []  # burst capacity absorbs the spike


# ---------------------------------------------------------------------
# Retry / backoff / page shrink
# ---------------------------------------------------------------------


def test_429_exponential_backoff_then_success():
    transport = FakeTransport(fail_plan=[429, 429, 0])
    waits = []
    client = ApiClient(
        transport, ApiClientConfig(rate_per_sec=1e9), sleeper=waits.append
    )
    assert client.get_paper("p1")["paperId"] == "p1"
    # 10 * 2^0, 10 * 2^1 (reference: 10*2^attempt capped 60)
    assert waits == [10.0, 20.0]
    assert client.retry_count == 2


def test_429_retries_exhausted_raises():
    transport = FakeTransport(fail_plan=[429] * 10)
    client = make_client(transport, rate_per_sec=1e9, max_retries=3)
    with pytest.raises(TransportError):
        client.get_paper("p1")


def test_400_shrinks_page_limit_and_retries():
    transport = FakeTransport(fail_plan=[400, 400, 0])
    client = make_client(transport, rate_per_sec=1e9, page_limit=80)
    rows = list(client.search("x", 200))
    assert len(rows) == len(CORPUS)
    limits = [p["limit"] for e, p in transport.calls if e == "search"]
    # first page asks 80, two 400s shrink it 80 -> 40 -> 20
    assert limits[:3] == [80, 40, 20]


def test_404_returns_none_not_raise():
    client = make_client(FakeTransport(), rate_per_sec=1e9)
    assert client.get_paper("missing") is None


def test_5xx_retried_then_succeeds():
    transport = FakeTransport(fail_plan=[503, 504, 0])
    client = make_client(transport, rate_per_sec=1e9)
    assert client.get_paper("p2")["paperId"] == "p2"


# ---------------------------------------------------------------------
# Pagination
# ---------------------------------------------------------------------


def test_search_pages_through_results():
    transport = FakeTransport()
    client = make_client(transport, rate_per_sec=1e9, page_limit=7)
    rows = list(client.search("anything", 20))
    assert len(rows) == 20
    assert [r["paperId"] for r in rows] == sorted(CORPUS)[:20]
    search_calls = [p for e, p in transport.calls if e == "search"]
    assert [c["offset"] for c in search_calls] == [0, 7, 14]
    # projection pushdown: field list rides on every page request
    assert all("fields" in c for c in search_calls)


def test_search_stops_at_total():
    client = make_client(FakeTransport(), rate_per_sec=1e9, page_limit=100)
    rows = list(client.search("x", 10_000))
    assert len(rows) == len(CORPUS)


def test_references_capped_per_paper():
    client = make_client(FakeTransport(), rate_per_sec=1e9)
    refs = client.get_references("p7", max_refs=2)
    assert refs == ["p0", "p1"]  # p7 has 3 refs, capped at 2


# ---------------------------------------------------------------------
# Distributed fan-out
# ---------------------------------------------------------------------


def test_fetch_papers_distributed(spark):
    ids = spark.createDataFrame(
        [(f"p{i}",) for i in range(12)], "paper_id string"
    )
    out = fetch_papers_distributed(
        spark,
        ids,
        fake_transport_factory,
        ApiClientConfig(rate_per_sec=1e9),
        num_tasks=4,
    )
    rows = {r["paperId"]: r for r in out.collect()}
    assert set(rows) == {f"p{i}" for i in range(12)}
    assert rows["p7"]["references_id"] == ["p0", "p1", "p2"]
    assert rows["p3"]["citationCount"] == 9


def test_fetch_reference_edges_distributed(spark):
    ids = spark.createDataFrame([("p5",), ("p7",)], "paper_id string")
    out = fetch_reference_edges_distributed(
        spark,
        ids,
        fake_transport_factory,
        ApiClientConfig(rate_per_sec=1e9),
        max_refs_per_paper=50,
        num_tasks=2,
    )
    edges = {(r.src_paper_id, r.dst_paper_id) for r in out.collect()}
    assert edges == {("p5", "p0"), ("p7", "p0"), ("p7", "p1"), ("p7", "p2")}


# ---------------------------------------------------------------------
# Spark 4 Python DataSource surface (S1 as spark.read.format)
# ---------------------------------------------------------------------


def test_paper_search_datasource_partitions_per_term(spark):
    from citeconnect_datapipeline_spark.sources.paper_search_datasource import (
        PaperSearchDataSource,
    )

    spark.dataSource.register(PaperSearchDataSource)
    df = (
        spark.read.format("paper_search")
        .option("terms", "llm, retrieval, bias")
        .option("max_results", "7")
        .load()
    )
    # one input partition (= one rate-limited client) per search term
    assert df.rdd.getNumPartitions() == 3
    rows = df.collect()
    assert len(rows) == 21  # 3 terms x max_results=7 (limit pushdown)
    assert df.schema.fieldNames() == [
        "paperId",
        "title",
        "abstract",
        "year",
        "citationCount",
        "references_id",
    ]
    # deterministic transport: every term pages the same sorted corpus,
    # so each partition returns the lexicographically first 7 ids
    assert {r.paperId for r in rows} == {
        "p0", "p1", "p10", "p11", "p12", "p13", "p14",
    }


def test_paper_search_datasource_requires_terms(spark):
    from citeconnect_datapipeline_spark.sources.paper_search_datasource import (
        PaperSearchDataSource,
    )
    import pytest as _pytest

    spark.dataSource.register(PaperSearchDataSource)
    with _pytest.raises(Exception, match="terms"):
        spark.read.format("paper_search").load().collect()


def test_paper_search_datasource_pushes_year_filter(spark):
    """Spark 4.1 filter pushdown into the Python DataSource: year
    bounds are applied source-side (the API's year= param); the
    pushed predicate no longer appears as a post-scan Filter node."""
    from citeconnect_datapipeline_spark.sources.paper_search_datasource import (
        PaperSearchDataSource,
    )

    spark.dataSource.register(PaperSearchDataSource)
    base = (
        spark.read.format("paper_search")
        .option("terms", "llm")
        .option("max_results", "50")
        .load()
    )
    df = base.filter((F.col("year") >= 2010) & (F.col("year") < 2015))
    rows = df.collect()
    assert rows, "filtered read must still return rows"
    assert all(2010 <= r.year < 2015 for r in rows)
    # corpus years are 2000 + i%25 over 50 ids -> 2 ids per year in range
    assert len(rows) == 10
    # The range comparisons must be consumed by the source (only the
    # declined IsNotNull may remain as a residual post-scan Filter).
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert ">= 2010" not in plan and "< 2015" not in plan, plan


# ---------------------------------------------------------------------
# S3 completion: key rotation + adaptive concurrency
# ---------------------------------------------------------------------


def test_api_key_pool_round_robin_and_offset():
    from citeconnect_datapipeline_spark.sources.api_ingest import ApiKeyPool

    pool = ApiKeyPool(["a", "b", "c"])
    assert [pool.next_key() for _ in range(5)] == ["a", "b", "c", "a", "b"]
    # partition-offset start spreads tasks across the key space
    assert ApiKeyPool(["a", "b", "c"], start=1).next_key() == "b"
    assert ApiKeyPool(["a", "b", "c"], start=5).next_key() == "c"
    assert len(ApiKeyPool([])) == 0
    assert ApiKeyPool([]).next_key() is None


def test_adaptive_concurrency_tiers():
    """main.py:111-131's tiering: 1 key -> 3, 2 keys -> 5, 3+ -> the
    requested fan-out; never above the request."""
    from citeconnect_datapipeline_spark.sources.api_ingest import (
        adaptive_max_concurrent,
    )

    assert adaptive_max_concurrent(1, 10) == 3
    assert adaptive_max_concurrent(2, 10) == 5
    assert adaptive_max_concurrent(3, 10) == 10
    assert adaptive_max_concurrent(8, 10) == 10
    assert adaptive_max_concurrent(1, 2) == 2
    assert adaptive_max_concurrent(2, 4) == 4


def test_client_rotates_keys_per_request():
    """Each request takes the pool's next key as x-api-key; a
    2-arg transport double (no headers kwarg) still works keyless."""
    from citeconnect_datapipeline_spark.sources.api_ingest import ApiKeyPool
    from citeconnect_datapipeline_spark.sources.fake_transport import (
        HeaderRecordingTransport,
    )

    transport = HeaderRecordingTransport()
    client = ApiClient(
        transport,
        ApiClientConfig(rate_per_sec=1e9),
        sleeper=no_sleep,
        key_pool=ApiKeyPool(["k1", "k2"]),
    )
    for pid in ("p1", "p2", "p3"):
        client.get_paper(pid)
    assert transport.keys_seen == ["k1", "k2", "k1"]

    # legacy 2-arg transport: rotation silently off, requests still flow
    legacy = FakeTransport()
    client2 = ApiClient(
        legacy,
        ApiClientConfig(rate_per_sec=1e9),
        sleeper=no_sleep,
        key_pool=ApiKeyPool(["k1"]),
    )
    assert client2.get_paper("p1")["paperId"] == "p1"


def test_fetch_papers_distributed_key_rotation_adaptive(spark, tmp_path):
    """2 keys -> 5 tasks (adaptive), every key exercised across the
    executor fleet, results complete."""
    from functools import partial

    from citeconnect_datapipeline_spark.sources.fake_transport import (
        HeaderRecordingTransport,
    )

    log = str(tmp_path / "keys_used.txt")
    ids = spark.createDataFrame(
        [(f"p{i}",) for i in range(20)], "paper_id string"
    )
    out = fetch_papers_distributed(
        spark,
        ids,
        partial(HeaderRecordingTransport, log),
        ApiClientConfig(rate_per_sec=1e9),
        api_keys=("k1", "k2"),
    )
    assert out.rdd.getNumPartitions() == 5  # adaptive_max_concurrent(2)
    rows = {r["paperId"] for r in out.collect()}
    assert rows == {f"p{i}" for i in range(20)}
    used = set(open(log).read().split())
    assert used == {"k1", "k2"}


# ---------------------------------------------------------------------
# Real-socket loopback transport (closes the fake-transport seam:
# everything above runs against in-process doubles; this section runs
# the SAME client mechanics through make_http_transport against an
# http.server bound to the loopback interface — no external network).
# ---------------------------------------------------------------------


class _LoopbackApi:
    """Tiny paged paper API served over a real socket, with scripted
    failures: per-path counters drive 429-then-succeed and
    limit-too-big -> 400 behaviors; every request's x-api-key header
    is recorded for rotation asserts."""

    def __init__(self, n_papers: int = 35, max_limit: int = 100):
        import http.server
        import json as _json
        import threading
        import urllib.parse

        api = self
        self.papers = [
            {"paperId": f"p{i:03d}", "title": f"t{i}", "year": 2000 + i % 5}
            for i in range(n_papers)
        ]
        self.seen_keys: list[str | None] = []
        self.rate_limit_budget = 0  # N next /search hits get 429
        self.server_err_budget = 0  # N next /search hits get 500
        self.max_limit = max_limit
        self.requests: list[dict] = []

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                parsed = urllib.parse.urlparse(self.path)
                q = {
                    k: v[0]
                    for k, v in urllib.parse.parse_qs(parsed.query).items()
                }
                api.seen_keys.append(self.headers.get("x-api-key"))
                api.requests.append({"path": parsed.path, **q})

                def send(code, payload=None):
                    self.send_response(code)
                    self.send_header("Content-Type", "application/json")
                    self.end_headers()
                    if payload is not None:
                        self.wfile.write(_json.dumps(payload).encode())

                if parsed.path == "/search":
                    if api.rate_limit_budget > 0:
                        api.rate_limit_budget -= 1
                        return send(429)
                    if api.server_err_budget > 0:
                        api.server_err_budget -= 1
                        return send(500)
                    limit = int(q.get("limit", 10))
                    if limit > api.max_limit:
                        return send(400)
                    off = int(q.get("offset", 0))
                    rows = api.papers[off : off + limit]
                    return send(
                        200, {"data": rows, "total": len(api.papers)}
                    )
                if parsed.path == "/paper":
                    pid = q.get("id")
                    hit = [p for p in api.papers if p["paperId"] == pid]
                    if not hit:
                        return send(404)
                    return send(200, hit[0])
                return send(404)

        self.httpd = http.server.ThreadingHTTPServer(
            ("127.0.0.1", 0), Handler
        )
        self.port = self.httpd.server_address[1]
        self.thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )
        self.thread.start()

    @property
    def base_url(self) -> str:
        host = "127.0.0.1"
        return f"http://{host}:{self.port}"

    def close(self):
        self.httpd.shutdown()
        self.httpd.server_close()


@pytest.fixture()
def loopback_api():
    api = _LoopbackApi()
    yield api
    api.close()


def _loopback_client(api, **cfg) -> ApiClient:
    from citeconnect_datapipeline_spark.sources.api_ingest import (
        make_http_transport,
    )

    cfg.setdefault("rate_per_sec", 10_000.0)
    cfg.setdefault("burst", 100)
    return ApiClient(
        make_http_transport(api.base_url),
        ApiClientConfig(**cfg),
        sleeper=no_sleep,
    )


def test_loopback_paged_search_real_socket(loopback_api):
    """S1 pagination over a real socket: all rows, correct page
    cadence, stop at total."""
    client = _loopback_client(loopback_api, page_limit=10)
    rows = list(client.search("any", max_results=100))
    assert [r["paperId"] for r in rows] == [
        f"p{i:03d}" for i in range(35)
    ]
    offsets = [
        int(r["offset"]) for r in loopback_api.requests
        if r["path"] == "/search"
    ]
    assert offsets == [0, 10, 20, 30]


def test_loopback_retry_backoff_and_server_errors(loopback_api):
    """429s and 500s on the wire retry with backoff and then succeed;
    retry_count reflects every failed round-trip."""
    loopback_api.rate_limit_budget = 2
    loopback_api.server_err_budget = 1
    client = _loopback_client(loopback_api, page_limit=50)
    rows = list(client.search("any", max_results=5))
    assert len(rows) == 5
    assert client.retry_count == 3


def test_loopback_adaptive_page_shrink(loopback_api):
    """A 400 for an oversized limit halves the page size until the
    server accepts — the reference's adaptive shrink, over a real
    socket."""
    loopback_api.max_limit = 20
    client = _loopback_client(loopback_api, page_limit=100)
    rows = list(client.search("any", max_results=35))
    assert len(rows) == 35
    limits = [
        int(r["limit"]) for r in loopback_api.requests
        if r["path"] == "/search"
    ]
    assert limits[0] == 35  # asked big
    assert 25 in limits or 17 in limits  # halved until accepted
    assert all(lim <= 20 for lim in limits[-2:])


def test_loopback_key_rotation_on_the_wire(loopback_api):
    """ApiKeyPool keys must actually reach the server as x-api-key
    headers, rotating round-robin per request."""
    from citeconnect_datapipeline_spark.sources.api_ingest import (
        ApiKeyPool,
        make_http_transport,
    )

    client = ApiClient(
        make_http_transport(loopback_api.base_url),
        ApiClientConfig(rate_per_sec=10_000.0, burst=100, page_limit=10),
        sleeper=no_sleep,
        key_pool=ApiKeyPool(["k1", "k2", "k3"]),
    )
    list(client.search("any", max_results=30))
    assert loopback_api.seen_keys[:3] == ["k1", "k2", "k3"]
    assert set(loopback_api.seen_keys) == {"k1", "k2", "k3"}


def test_loopback_point_lookup_and_404(loopback_api):
    """S2 over the wire: hit returns the paper, miss maps 404 ->
    None (not an exception)."""
    client = _loopback_client(loopback_api)
    assert client.get_paper("p003")["title"] == "t3"
    assert client.get_paper("nope") is None
