"""Spark 4 Python DataSource for the paper-search API (SURVEY.md S1).

``api_ingest.py`` exposes the connector as driver calls +
``mapPartitions`` fan-out; this module exposes the SAME client as a
first-class ``spark.read.format("paper_search")`` source — the fully
idiomatic Spark surface: the source declares its schema, splits work
into one InputPartition per search term (each task runs its own
rate-limited client, mirroring the reference's per-term task fan-out,
Ingestion/main.py:746-768), and rows flow straight into the scan node
with no driver materialization.

Options:
  terms        comma-separated search terms (required) — one input
               partition (= one Spark task) each
  max_results  per-term result cap (default 20) — the S1 limit
               pushdown
  rate_per_sec per-task token-bucket rate (default 100 for the
               in-memory transport; set to the provider ceiling /
               task count in production)

The transport is the deterministic in-package double (no network in
this container); production swaps ``_make_transport`` for a
requests-backed one with the same signature.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

from .api_ingest import ApiClient, ApiClientConfig, PAPER_SCHEMA, _row_from_payload


class TermPartition(InputPartition):
    def __init__(self, term: str, max_results: int, rate_per_sec: float):
        self.term = term
        self.max_results = max_results
        self.rate_per_sec = rate_per_sec


def _make_transport():
    from .fake_transport import FakeTransport

    return FakeTransport()


class PaperSearchReader(DataSourceReader):
    def __init__(self, options: dict):
        terms = options.get("terms", "")
        self.terms = [t.strip() for t in terms.split(",") if t.strip()]
        if not self.terms:
            raise ValueError(
                "paper_search requires option 'terms' (comma-separated)"
            )
        self.max_results = int(options.get("max_results", "20"))
        self.rate_per_sec = float(options.get("rate_per_sec", "100"))
        self.year_filters: list[Filter] = []

    def pushFilters(self, filters) -> "Iterator[Filter]":
        """Spark 4.1 filter pushdown (SURVEY.md §4: the reference
        pushes year bounds into the API's ``year=`` request param).
        Accept simple comparisons on the ``year`` column — they are
        applied source-side, before rows enter the scan — and hand
        everything else back for Spark to evaluate."""
        accepted_types = (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )
        for f in filters:
            if (
                isinstance(f, accepted_types)
                and f.attribute == ("year",)
                and isinstance(f.value, int)
            ):
                self.year_filters.append(f)
            else:
                yield f  # unsupported -> Spark re-applies it

    def _keep(self, year) -> bool:
        for f in self.year_filters:
            if year is None:
                return False
            if isinstance(f, EqualTo) and year != f.value:
                return False
            if isinstance(f, GreaterThan) and not year > f.value:
                return False
            if isinstance(f, GreaterThanOrEqual) and not year >= f.value:
                return False
            if isinstance(f, LessThan) and not year < f.value:
                return False
            if isinstance(f, LessThanOrEqual) and not year <= f.value:
                return False
        return True

    def partitions(self) -> Sequence[InputPartition]:
        return [
            TermPartition(t, self.max_results, self.rate_per_sec)
            for t in self.terms
        ]

    def read(self, partition: TermPartition) -> Iterator[tuple]:
        cfg = ApiClientConfig(
            rate_per_sec=partition.rate_per_sec,
            backoff_base_sec=0.0,  # in-memory transport: no real waits
            backoff_cap_sec=0.0,
        )
        client = ApiClient(_make_transport(), cfg)
        # Source-side filtering stands in for the provider's year=
        # request parameter: rows are dropped before they reach the
        # scan (with a real HTTP transport the bound goes on the URL).
        for payload in client.search(partition.term, partition.max_results):
            if self._keep(payload.get("year")):
                yield _row_from_payload(payload)


class PaperSearchDataSource(DataSource):
    """``spark.read.format("paper_search")`` — register once per
    session with ``spark.dataSource.register(PaperSearchDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "paper_search"

    def schema(self):
        return PAPER_SCHEMA

    def reader(self, schema) -> PaperSearchReader:
        return PaperSearchReader(dict(self.options))

    def streamReader(self, schema) -> "PaperFeedStreamReader":
        return PaperFeedStreamReader(dict(self.options))


class PageRangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class PaperFeedStreamReader(DataSourceStreamReader):
    """Offset-tracked micro-batch reader over the paper corpus
    (SURVEY.md S8/M1: the reference's generator-based batch slices,
    gcs_reader.py:173-217, restated as a real Structured Streaming
    source). The offset is the cursor position in the (stable-sorted)
    corpus; each trigger advances by ``page_size`` — so batches are
    deterministic, replayable from any committed offset, and
    exactly-once under checkpointing: precisely the contract the
    reference's ad-hoc generator cannot give."""

    def __init__(self, options: dict):
        self.page_size = int(options.get("page_size", "10"))
        client = ApiClient(
            _make_transport(),
            ApiClientConfig(
                rate_per_sec=1e6,
                backoff_base_sec=0.0,
                backoff_cap_sec=0.0,
            ),
        )
        # total() is one cheap metadata call; rows stream per batch
        self.total = client.search_total()

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def latestOffset(self) -> dict:
        return {"pos": self.total}

    def partitions(self, start: dict, end: dict):
        s, e = start["pos"], end["pos"]
        if s >= e:
            return [PageRangePartition(s, s)]
        return [
            PageRangePartition(p, min(p + self.page_size, e))
            for p in range(s, e, self.page_size)
        ]

    def read(self, partition: PageRangePartition) -> Iterator[tuple]:
        if partition.start >= partition.end:
            return
        client = ApiClient(
            _make_transport(),
            ApiClientConfig(
                rate_per_sec=1e6,
                backoff_base_sec=0.0,
                backoff_cap_sec=0.0,
            ),
        )
        for payload in client.search_slice(
            partition.start, partition.end - partition.start
        ):
            yield _row_from_payload(payload)

    def commit(self, end: dict) -> None:
        pass  # source is external/immutable; nothing to clean up
