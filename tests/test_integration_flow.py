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


def test_mitigation_feedback_loop(spark):
    """The reference's signature behavior (§3.1 stage 5,
    bias_mitigation_collector.py:378-457) closed end-to-end at the
    Spark surfaces: slice counts -> under-representation
    recommendations -> targeted re-collection through the
    rate-limited connector for exactly the recommended domains/
    amounts -> union -> re-slice -> the count disparity strictly
    shrinks. The decision list is driver-sized (a handful of
    domains); the data path stays distributed."""
    from citeconnect_datapipeline_spark.plans.pipelines import (
        _first_keyword_domain,
        mitigation_recommendations,
    )
    from citeconnect_datapipeline_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")

    def slice_counts(d):
        return (
            d.select(
                _first_keyword_domain(F.lower(F.col("text"))).alias("domain")
            )
            .groupBy("domain")
            .agg(F.count("*").alias("n_docs"))
        )

    before = {r.domain: r.n_docs for r in slice_counts(docs).collect()}
    disparity_before = max(before.values()) - min(before.values())
    assert disparity_before > 0, "corpus already balanced — vacuous test"

    recs = mitigation_recommendations(spark, sf).collect()
    assert recs, "no under-represented domains found"

    keyword = {
        "relational": "join",
        "analytics": "window",
        "aggregation": "agg",
        "dedup": "hash",
        "streaming": "stream",
        "general": "",
    }
    cfg = ApiClientConfig(rate_per_sec=1e9)
    new_parts = []
    for rec in recs:
        need = min(rec.papers_needed, 50)  # fake corpus holds 50 papers
        ids = spark.createDataFrame(
            [(f"p{i}",) for i in range(need)], "paper_id string"
        )
        fetched = fetch_papers_distributed(
            spark, ids, fake_transport_factory, config=cfg, num_tasks=4
        )
        kw = keyword[rec.domain]
        new_parts.append(
            fetched.select(
                F.xxhash64("paperId", F.lit(rec.domain)).alias("doc_id"),
                F.concat_ws(
                    " ", F.lit(kw), F.col("title"), F.col("abstract")
                ).alias("text"),
                F.lit("en").alias("lang"),
                F.lit("mitigation_recollect").alias("source"),
                F.length(
                    F.concat_ws(
                        " ", F.lit(kw), F.col("title"), F.col("abstract")
                    )
                ).alias("n_chars"),
            )
        )
    recollected = new_parts[0]
    for p in new_parts[1:]:
        recollected = recollected.unionByName(p)
    assert recollected.count() > 0, "connector returned nothing"

    merged = docs.select(
        "doc_id", "text", "lang", "source", "n_chars"
    ).unionByName(recollected)
    after = {r.domain: r.n_docs for r in slice_counts(merged).collect()}
    disparity_after = max(after.values()) - min(after.values())
    assert disparity_after < disparity_before, (
        f"mitigation did not reduce disparity: "
        f"{disparity_before} -> {disparity_after} (before={before}, "
        f"after={after})"
    )


def test_run_mitigation_cycle_via_paper_search_source(spark):
    """The loop as an ENGINE function, not test choreography:
    mitigation_recommendations -> run_mitigation_cycle (default
    path = the registered paper_search DataSource, term/limit as
    explicit options) -> union tagged fetches into the corpus ->
    re-slice -> disparity strictly shrinks. Also asserts the
    per-domain caps were respected on the wire."""
    from citeconnect_datapipeline_spark.plans.pipelines import (
        _first_keyword_domain,
        mitigation_recommendations,
        run_mitigation_cycle,
    )
    from citeconnect_datapipeline_spark.sources.paper_search_datasource import (
        PaperSearchDataSource,
    )
    from citeconnect_datapipeline_spark.sources.tables import load_table

    spark.dataSource.register(PaperSearchDataSource)
    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")

    recs_df = mitigation_recommendations(spark, sf)
    recs = {r.domain: r.papers_needed for r in recs_df.collect()}
    assert recs, "no under-represented domains found"

    fetched = run_mitigation_cycle(spark, recs_df)
    got = {
        r.target_domain: r.n
        for r in fetched.groupBy("target_domain")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # every recommended domain was re-collected, capped by
    # papers_needed and by the 50-paper fake corpus
    assert set(got) == set(recs)
    for domain, needed in recs.items():
        assert got[domain] == min(needed, 50)

    # re-slice: recollected rows belong to the slice they were
    # COLLECTED FOR (the reference tags by search term too)
    base = docs.select(
        _first_keyword_domain(F.lower(F.col("text"))).alias("domain")
    )
    merged = base.unionByName(
        fetched.select(F.col("target_domain").alias("domain"))
    )

    def disparity(d):
        counts = [r.n for r in d.groupBy("domain").agg(
            F.count("*").alias("n")).collect()]
        return max(counts) - min(counts)

    assert disparity(merged) < disparity(base)


def test_run_mitigation_cycle_explicit_params_no_env(spark):
    """Loop parameters flow as explicit (term, cap) arguments to the
    injected reingest — never env mutation — and a balanced corpus
    (empty recommendations) fetches nothing."""
    from citeconnect_datapipeline_spark.plans.pipelines import (
        run_mitigation_cycle,
    )

    seen = []

    def fake_reingest(sp, term, cap):
        seen.append((term, cap))
        return sp.createDataFrame(
            [(f"{term}-{i}",) for i in range(cap)], "paperId string"
        )

    recs = spark.createDataFrame(
        [("analytics", 7), ("streaming", 3), ("dedup", 0)],
        "domain string, papers_needed long",
    )
    out = run_mitigation_cycle(
        spark, recs, reingest=fake_reingest, max_fetch_per_domain=5
    )
    assert sorted(seen) == [("analytics", 5), ("streaming", 3)]
    assert out.count() == 8  # 5 + 3; zero-need domain skipped

    empty = spark.createDataFrame(
        [], "domain string, papers_needed long"
    )
    none_fetched = run_mitigation_cycle(spark, empty)
    assert none_fetched.count() == 0
    assert "target_domain" in none_fetched.columns
