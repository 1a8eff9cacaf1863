"""Deterministic in-memory transport for the S1-S5 connector.

Stands in for the HTTP layer in tests and in this container (no
network): a synthetic 50-paper corpus with stable ids, titles, years,
citation counts and reference lists. Production swaps this for a
requests-session wrapper with the same ``(endpoint, params) -> dict``
signature; the client and the distributed fan-out are unchanged.

Lives in the package (not tests/) so it pickles cleanly into Spark
executors — test-module classes don't import on workers.
"""

from __future__ import annotations

from .api_ingest import Transport, TransportError

CORPUS = {
    f"p{i}": {
        "paperId": f"p{i}",
        "title": f"Paper {i}",
        "abstract": f"Abstract {i}",
        "year": 2000 + (i % 25),
        "citationCount": i * 3,
        "references": [{"paperId": f"p{j}"} for j in range(i % 4)],
    }
    for i in range(50)
}


class FakeTransport:
    """Deterministic API double; failures scriptable via ``fail_plan``
    (a list of HTTP statuses to raise, consumed one per call; 0 = ok)."""

    def __init__(self, fail_plan: list[int] | None = None):
        self.calls: list[tuple[str, dict]] = []
        self.fail_plan = list(fail_plan or [])

    def __call__(self, endpoint: str, params: dict) -> dict:
        self.calls.append((endpoint, dict(params)))
        if self.fail_plan:
            status = self.fail_plan.pop(0)
            if status:
                raise TransportError(status, "scripted")
        if endpoint == "search":
            ids = sorted(CORPUS)
            off, lim = params["offset"], params["limit"]
            return {
                "total": len(ids),
                "data": [CORPUS[i] for i in ids[off : off + lim]],
            }
        if endpoint == "paper":
            p = CORPUS.get(params["id"])
            if p is None:
                raise TransportError(404, params["id"])
            return p
        if endpoint == "references":
            p = CORPUS.get(params["id"], {})
            refs = p.get("references", [])
            off, lim = params["offset"], params["limit"]
            return {"data": [{"citedPaper": r} for r in refs[off : off + lim]]}
        raise TransportError(500, f"unknown endpoint {endpoint}")


def fake_transport_factory() -> Transport:
    """Picklable factory for mapPartitions fan-out."""
    return FakeTransport()


class HeaderRecordingTransport(FakeTransport):
    """FakeTransport with the PRODUCTION signature (accepts the
    ``headers`` kwarg, so the client's key-rotation path engages) that
    records every x-api-key — in memory and, when ``log_file`` is
    given, appended to disk so executor-side usage is observable from
    the test process."""

    def __init__(
        self,
        log_file: str | None = None,
        fail_plan: list[int] | None = None,
    ):
        super().__init__(fail_plan)
        self.log_file = log_file
        self.keys_seen: list[str | None] = []

    def __call__(  # type: ignore[override]
        self, endpoint: str, params: dict, headers: dict | None = None
    ) -> dict:
        key = (headers or {}).get("x-api-key")
        self.keys_seen.append(key)
        if self.log_file and key:
            with open(self.log_file, "a") as f:
                f.write(key + "\n")
        return super().__call__(endpoint, params)
