"""Integration: the reference's collection->zone->upsert lifecycle
(§3.1 stages 2 + 7) run end-to-end against the fake transport —
ingest connector fan-out, zone write with run partitioning, latest-run
scan, keyed upsert into the serving table. Mirrors the reference's
mocked end-to-end tests (tests/integration/test_end_to_end_pipeline.py)
at the Spark surfaces."""

from __future__ import annotations

from pyspark.sql import functions as F

from citeconnect_datapipeline_spark.sinks.upsert import upsert_parquet
from citeconnect_datapipeline_spark.sinks.zones import (
    read_latest_run,
    write_zone,
)
from citeconnect_datapipeline_spark.sources.api_ingest import (
    ApiClientConfig,
    fetch_papers_distributed,
)
from citeconnect_datapipeline_spark.sources.fake_transport import (
    fake_transport_factory,
)


def test_ingest_zone_upsert_lifecycle(spark, tmp_path):
    zone = str(tmp_path / "raw_zone")
    serving = str(tmp_path / "papers_serving")
    cfg = ApiClientConfig(rate_per_sec=1e9)

    # run 1: fetch 10 papers, land in zone, upsert to serving
    ids1 = spark.createDataFrame(
        [(f"p{i}",) for i in range(10)], "paper_id string"
    )
    papers1 = fetch_papers_distributed(
        spark, ids1, fake_transport_factory, cfg, num_tasks=2
    )
    write_zone(papers1, zone, run_id="r001")
    landed = read_latest_run(spark, zone)
    assert landed.count() == 10
    inserted = upsert_parquet(
        spark, landed.drop("run_id"), serving, "paperId"
    )
    assert inserted == 10

    # run 2: overlapping fetch (5 old + 5 new) -> only new keys insert
    ids2 = spark.createDataFrame(
        [(f"p{i}",) for i in range(5, 15)], "paper_id string"
    )
    papers2 = fetch_papers_distributed(
        spark, ids2, fake_transport_factory, cfg, num_tasks=2
    )
    write_zone(papers2, zone, run_id="r002")
    latest = read_latest_run(spark, zone)
    assert {r.run_id for r in latest.select("run_id").collect()} == {"r002"}
    inserted2 = upsert_parquet(
        spark, latest.drop("run_id"), serving, "paperId"
    )
    assert inserted2 == 5

    final = spark.read.parquet(serving)
    assert final.count() == 15
    # metadata survived the full path (connector -> zone -> upsert)
    row = final.filter(F.col("paperId") == "p7").first()
    assert row.title == "Paper 7"
    assert row.references_id == ["p0", "p1", "p2"]
    # zone history retains both runs (appends never clobber)
    assert spark.read.parquet(zone).count() == 20
