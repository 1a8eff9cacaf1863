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
    InputPartition,
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
        for payload in client.search(partition.term, partition.max_results):
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
