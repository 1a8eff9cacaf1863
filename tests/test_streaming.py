"""Structured Streaming jobs: a drained finite stream must equal the
batch answer, and stateful ops must behave (dedup, foreachBatch
upsert idempotence)."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from citeconnect_datapipeline_spark.streaming import jobs
from citeconnect_datapipeline_spark.streaming.event_windows import (
    tumbling_window_agg,
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="ccspark_stream_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_stream_tumbling_equals_batch(spark, sf_dir):
    stream = jobs.read_event_stream(spark, sf_dir)
    assert stream.isStreaming
    q = jobs.run_to_memory(
        jobs.tumbling_counts_stream(stream), "t_tumbling", output_mode="append"
    )
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.table("t_tumbling").collect()
    }
    want = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in tumbling_window_agg(spark, sf_dir).collect()
    }
    # Append mode only emits windows closed by the watermark; every
    # emitted window must match batch exactly, and most windows close.
    assert got
    assert len(got) >= len(want) * 0.9
    for k, v in got.items():
        assert want[k] == v
    q.stop()


def test_stream_dedup(spark, sf_dir):
    stream = jobs.read_event_stream(spark, sf_dir)
    q = jobs.run_to_memory(jobs.dedup_stream(stream), "t_dedup")
    n = spark.table("t_dedup").count()
    batch_n = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .dropDuplicates(["event_id"])
        .count()
    )
    assert n == batch_n
    q.stop()


def test_foreach_batch_upsert_idempotent(spark, sf_dir, tmpdir):
    target = f"{tmpdir}/target"
    # Run the same upsert twice with fresh checkpoints: second pass
    # must insert nothing new (ON CONFLICT DO NOTHING semantics).
    for i in range(2):
        stream = jobs.read_event_stream(spark, sf_dir)
        jobs.foreach_batch_upsert(
            stream.select("event_id", "ts", "user_id", "value"),
            target,
            ["event_id"],
            f"{tmpdir}/ckpt{i}",
        )
    got = spark.read.parquet(target)
    assert got.count() == got.dropDuplicates(["event_id"]).count()
    assert (
        got.count()
        == spark.read.parquet(f"{sf_dir}/events.parquet")
        .dropDuplicates(["event_id"])
        .count()
    )


def test_stateful_user_stats_across_batches(spark, tmp_path):
    """applyInPandasWithState carries state across micro-batches: the
    events table is split into 3 files streamed one per trigger; the
    last emission per user must equal the batch groupBy answer."""
    from citeconnect_datapipeline_spark.sources.tables import load_table
    from citeconnect_datapipeline_spark.streaming.jobs import (
        run_to_memory,
        stateful_user_stats,
    )

    events = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "ts", "user_id", "value"
    )
    src = tmp_path / "stream_src"
    # 3 slices -> 3 micro-batches with maxFilesPerTrigger=1
    events.filter(F.col("event_id") % 3 == 0).coalesce(1).write.parquet(
        str(src / "f0")
    )
    events.filter(F.col("event_id") % 3 == 1).coalesce(1).write.parquet(
        str(src / "f1")
    )
    events.filter(F.col("event_id") % 3 == 2).coalesce(1).write.parquet(
        str(src / "f2")
    )

    schema = events.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    out = stateful_user_stats(stream)
    run_to_memory(out, "user_stats", output_mode="update")
    emitted = spark.table("user_stats").toPandas()
    # multiple batches must have produced repeated emissions per user
    assert len(emitted) > emitted["user_id"].nunique()
    final = (
        emitted.sort_values(["user_id", "n_events"])
        .groupby("user_id")
        .tail(1)
        .set_index("user_id")
    )

    batch = (
        events.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
            F.max("ts").alias("last_ts"),
        )
        .toPandas()
        .set_index("user_id")
    )
    assert len(final) == len(batch)
    for uid in batch.index:
        assert final.loc[uid, "n_events"] == batch.loc[uid, "n_events"]
        assert abs(
            final.loc[uid, "total_value"] - batch.loc[uid, "total_value"]
        ) < 1e-6
        assert final.loc[uid, "last_ts"] == batch.loc[uid, "last_ts"]


def test_stream_stream_join_equals_batch(spark):
    """Watermarked stream-stream interval join drained with
    availableNow must equal the same join computed in batch."""
    from citeconnect_datapipeline_spark.sources.tables import load_table
    from citeconnect_datapipeline_spark.streaming.jobs import (
        read_event_stream,
        run_to_memory,
        stream_stream_click_purchase_join,
    )

    sf = "/root/testdata/sf0.001"
    stream = read_event_stream(spark, sf)
    out = stream_stream_click_purchase_join(
        stream.filter(F.col("event_type") == "click"),
        stream.filter(F.col("event_type") == "purchase"),
    )
    run_to_memory(out, "ss_join", output_mode="append")
    streamed = {
        (r.click_id, r.purchase_ts, r.purchase_value)
        for r in spark.table("ss_join").collect()
    }

    events = load_table(spark, sf, "events")
    clicks = events.filter(F.col("event_type") == "click")
    purchases = events.filter(F.col("event_type") == "purchase")
    batch = stream_stream_click_purchase_join(clicks, purchases)
    expected = {
        (r.click_id, r.purchase_ts, r.purchase_value)
        for r in batch.collect()
    }
    assert streamed == expected
    assert len(streamed) > 0


def test_paper_feed_stream_source_exactly_once(spark, tmp_path):
    """Spark 4 Python streaming DataSource (S8/M1): offset-tracked
    micro-batches over the paper corpus; a restart from the same
    checkpoint re-reads NOTHING (offsets committed), which is the
    exactly-once contract the reference's generator slices lack."""
    from citeconnect_datapipeline_spark.sources.paper_search_datasource import (
        PaperSearchDataSource,
    )

    spark.dataSource.register(PaperSearchDataSource)
    ckpt = str(tmp_path / "ckpt")
    got: list[int] = []

    def run_once() -> int:
        seen = 0

        def sink(df, _bid):
            nonlocal seen
            seen += df.count()

        q = (
            spark.readStream.format("paper_search")
            .option("page_size", "10")
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return seen

    assert run_once() == 50  # full corpus, 5 page partitions
    assert run_once() == 0  # restart: offsets committed, no re-read


def test_transform_with_state_matches_old_api(spark, tmp_path):
    """transformWithStateInPandas (Spark 4 successor API) must carry
    identical state semantics to the applyInPandasWithState form:
    same final per-user snapshot as the batch groupBy. Where protobuf
    (the TWS state-protocol dependency) is absent, the operator's two
    documented runtime gates are asserted instead — the suite runs
    100% in every container, and the gates themselves (refuse to run
    without an explicit RocksDB opt-in; name the missing protobuf
    dependency instead of failing deep in the state client) are
    contract, not incidental."""
    from citeconnect_datapipeline_spark.sources.tables import load_table
    from citeconnect_datapipeline_spark.streaming.jobs import (
        run_to_memory,
        stateful_user_stats_tws,
    )

    events = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "ts", "user_id", "value"
    )
    src = tmp_path / "tws_src"
    for i in range(2):
        events.filter(F.col("event_id") % 2 == i).coalesce(1).write.parquet(
            str(src / f"f{i}")
        )
    # TWS requires RocksDB: opt in on a session CLONE — the operator
    # refuses to mutate a shared session's state-store provider
    s = spark.newSession()

    def make_stream():
        return (
            s.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(str(src))
        )

    # Gate 1 (always testable): no silent provider flip — without the
    # caller's explicit RocksDB opt-in the operator must refuse.
    with pytest.raises(RuntimeError, match="RocksDB"):
        stateful_user_stats_tws(make_stream())
    s.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        # Gate 2 (this container): the documented dependency error,
        # raised at call time, naming the missing package.
        with pytest.raises(ImportError, match="protobuf"):
            stateful_user_stats_tws(make_stream())
        return
    out = stateful_user_stats_tws(make_stream())
    run_to_memory(out, "user_stats_tws", output_mode="update")
    emitted = s.table("user_stats_tws").toPandas()  # view lives on the clone
    final = (
        emitted.sort_values(["user_id", "n_events"])
        .groupby("user_id")
        .tail(1)
        .set_index("user_id")
    )
    batch = (
        events.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
            F.max("ts").alias("last_ts"),
        )
        .toPandas()
        .set_index("user_id")
    )
    assert len(final) == len(batch)
    for uid in batch.index:
        assert final.loc[uid, "n_events"] == batch.loc[uid, "n_events"]
        assert (
            abs(final.loc[uid, "total_value"] - batch.loc[uid, "total_value"])
            < 1e-6
        )
        assert final.loc[uid, "last_ts"] == batch.loc[uid, "last_ts"]


def test_streaming_cdc_apply(spark, tmp_path):
    """A change feed streamed in two micro-batches lands as the same
    final table a batch MERGE would produce: updates replace, deletes
    remove, late inserts insert."""
    from citeconnect_datapipeline_spark.streaming.jobs import (
        foreach_batch_cdc_apply,
    )

    target = str(tmp_path / "target")
    spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], "k string, v int"
    ).write.parquet(target)

    src = tmp_path / "changes"
    schema = "k string, v int, _op string"
    spark.createDataFrame(
        [("b", 20, "upsert"), ("c", 0, "delete")], schema
    ).coalesce(1).write.parquet(str(src / "f0"))
    spark.createDataFrame(
        [("d", 4, "upsert"), ("b", 21, "upsert")], schema
    ).coalesce(1).write.parquet(str(src / "f1"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    foreach_batch_cdc_apply(
        stream, target, str(tmp_path / "ckpt"), key="k"
    )
    rows = {r.k: r.v for r in spark.read.parquet(target).collect()}
    assert rows == {"a": 1, "b": 21, "d": 4}


def test_stream_foreach_batch_jdbc_upsert(spark, tmp_path):
    """The reference's incremental upload end-to-end in streaming
    form: file-source micro-batches -> foreachBatch -> jdbc_upsert
    (ON CONFLICT DO NOTHING through the fake DB). Re-delivered rows
    across micro-batches dedup store-side via conflict accounting —
    effectively-once without any driver-side id set."""
    from citeconnect_datapipeline_spark.sinks.upsert import jdbc_upsert
    from citeconnect_datapipeline_spark.sources.tables import load_table
    from tests.test_sinks import _fake_pg_factory

    events = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "value"
    )
    src = tmp_path / "stream_src"
    # two files with OVERLAPPING event ids: the second batch re-delivers
    half = events.filter(F.col("event_id") % 2 == 0)
    half.coalesce(1).write.parquet(str(src / "f0"))
    events.coalesce(1).write.parquet(str(src / "f1"))

    state = str(tmp_path / "pg_state.txt")
    fail = str(tmp_path / "pg_fail.txt")
    factory = _fake_pg_factory(state, fail)
    totals = {"inserted": 0, "skipped": 0, "failed": 0}

    def apply_batch(batch_df, batch_id):
        stats = jdbc_upsert(
            batch_df, "events_tbl", "event_id", factory, batch_size=100
        )
        for k in totals:
            totals[k] += stats[k]

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    n_total = events.count()
    n_half = half.count()
    with open(state) as f:
        stored = {ln.strip() for ln in f if ln.strip()}
    assert len(stored) == n_total           # every id exactly once
    assert totals["inserted"] == n_total    # conflicts did not insert
    assert totals["skipped"] == n_half      # re-delivered rows skipped
    assert totals["failed"] == 0


def test_neardup_ingest_stream_rejects_cross_batch_dups(spark, tmp_path):
    """Incremental MinHash-LSH ingest dedup: a later micro-batch
    re-submitting existing TEXT under fresh doc_ids is rejected via
    the persisted band index, not an id match; within-batch dup pairs
    keep the smaller id; disjoint new docs are accepted."""
    from citeconnect_datapipeline_spark.sources.tables import load_table
    from citeconnect_datapipeline_spark.streaming.neardup_ingest import (
        ingest_batch,
        neardup_ingest_stream,
    )

    docs = (
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 40)
    )
    first = docs.filter(F.col("doc_id") < 20)
    # second batch: 10 re-texts of batch-1 docs under NEW ids (+1000),
    # plus 20 genuinely new docs
    retexts = first.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text"
    )
    fresh = docs.filter((F.col("doc_id") >= 20) & (F.col("doc_id") < 40))
    second = retexts.unionByName(fresh)

    src = tmp_path / "ingest_src"
    first.coalesce(1).write.parquet(str(src / "b0"))
    second.coalesce(1).write.parquet(str(src / "b1"))

    store = str(tmp_path / "store")
    stream = (
        spark.readStream.schema(first.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    neardup_ingest_stream(stream, store, str(tmp_path / "ckpt"))

    stored = spark.read.parquet(f"{store}/docs")
    stored_ids = {r.doc_id for r in stored.select("doc_id").collect()}
    # every re-text id rejected; the sf0.001 lake also plants exact-
    # text dups INSIDE the original 40, so accepted ids are a subset
    assert not (stored_ids & set(range(1000, 1010)))
    assert stored_ids <= set(range(40))
    # no two stored docs share identical text (the planted dups
    # collapsed to one representative each)
    n_texts = stored.select("text").distinct().count()
    assert n_texts == stored.count()
    # a re-run batch of already-ingested docs is fully rejected
    stats = ingest_batch(spark, first, store)
    assert stats["accepted"] == 0
    assert stats["rejected"] == stats["attempted"]


def test_neardup_ingest_reconciles_crash_window(spark, tmp_path):
    """Crash between the index append and the docs append leaves
    index rows with no doc ('index-without-doc'); a replay would then
    re-reject the doc against its own orphaned band keys forever.
    reconcile_store must delete exactly those rows so the doc's next
    delivery is accepted."""
    from citeconnect_datapipeline_spark.operators.dedup import (
        minhash_band_hashes,
    )
    from citeconnect_datapipeline_spark.sources.tables import load_table
    from citeconnect_datapipeline_spark.streaming.neardup_ingest import (
        ingest_batch,
        reconcile_store,
    )

    docs = (
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "text")
    )
    store = str(tmp_path / "store")
    first = docs.filter(F.col("doc_id") < 10)
    ingest_batch(spark, first, store)
    n_index_before = spark.read.parquet(f"{store}/index").count()

    # simulate the crash: index rows for a brand-new doc land, the
    # doc row never does (synthetic text so the victim is near-dup of
    # nothing in the store — only its own orphaned index rows)
    unique_text = " ".join(f"zw{i}qx kv{i}jh pt{i}om" for i in range(12))
    victim = spark.createDataFrame(
        [(5000, unique_text)], "doc_id long, text string"
    )
    minhash_band_hashes(victim).write.mode("append").parquet(
        f"{store}/index"
    )
    # un-reconciled, a replay of the victim is rejected by its own
    # orphaned index rows
    assert ingest_batch(spark, victim, store)["accepted"] == 0
    # ... and that rejected replay adds nothing, so the orphans remain
    removed = reconcile_store(spark, store)
    assert removed > 0
    assert spark.read.parquet(f"{store}/index").count() == n_index_before
    # post-reconcile the victim's next delivery is accepted
    stats = ingest_batch(spark, victim, store)
    assert stats["accepted"] == 1
    stored = {
        r.doc_id
        for r in spark.read.parquet(f"{store}/docs").select("doc_id").collect()
    }
    assert 5000 in stored
    # a healthy store reconciles to a no-op
    assert reconcile_store(spark, store) == 0


def test_debounce_stream_matches_batch_flags(spark, tmp_path):
    """Streaming debounce (applyInPandasWithState, one long of state
    per signal) must keep exactly the rows the batch gaps-and-islands
    flag keeps, across event-time-ordered micro-batches."""
    from citeconnect_datapipeline_spark.sources.tables import load_table
    from citeconnect_datapipeline_spark.streaming.jobs import (
        debounce_stream,
        run_to_memory,
    )

    events = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    # event-time-ordered tertiles -> ordered micro-batch replay
    cuts = events.agg(
        F.percentile(F.unix_micros("ts"), F.lit(1 / 3)).alias("c1"),
        F.percentile(F.unix_micros("ts"), F.lit(2 / 3)).alias("c2"),
    ).first()
    us = F.unix_micros(F.col("ts"))
    src = tmp_path / "debounce_src"
    events.filter(us <= cuts["c1"]).coalesce(1).write.parquet(
        str(src / "f0")
    )
    events.filter((us > cuts["c1"]) & (us <= cuts["c2"])).coalesce(
        1
    ).write.parquet(str(src / "f1"))
    events.filter(us > cuts["c2"]).coalesce(1).write.parquet(
        str(src / "f2")
    )
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    # sf0.001 events are sparse: a 1-hour gap makes bursts real so
    # the test exercises both keep and drop paths
    gap_sec = 3600
    out = debounce_stream(stream, gap_sec=gap_sec)
    run_to_memory(out, "debounced", output_mode="append")
    kept_stream = {
        int(r["event_id"]) for r in spark.table("debounced").collect()
    }

    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    prev_us = F.unix_micros(F.lag("ts").over(w))
    kept_batch = {
        int(r["event_id"])
        for r in events.withColumn(
            "keep",
            prev_us.isNull()
            | (F.unix_micros(F.col("ts")) - prev_us > gap_sec * 1_000_000),
        )
        .filter(F.col("keep"))
        .collect()
    }
    assert kept_stream == kept_batch
    assert 0 < len(kept_stream) < events.count()


def test_debounce_stream_multichunk_group_ordering(spark, tmp_path):
    """applyInPandasWithState delivers a key's micro-batch rows as
    MULTIPLE Arrow chunks with no cross-chunk ordering guarantee; the
    debounce scan must restore event-time order over the whole batch,
    not per chunk. One hot key, 120 rows written in md5-shuffled
    order, Arrow batches forced down to 7 rows -> ~18 unordered
    chunks for the single group. A per-chunk sort mis-keeps burst
    followers and mis-drops burst leaders; the concat-then-sort scan
    must match the batch gaps-and-islands flag exactly."""
    import pandas as pd

    from citeconnect_datapipeline_spark.streaming.jobs import (
        debounce_stream,
        run_to_memory,
    )

    base_us = 1_600_000_000_000_000
    rows = []
    for burst in range(12):
        for j in range(10):
            i = burst * 10 + j
            # bursts of 10 events 1 s apart, 100 s between bursts
            rows.append((i, base_us + burst * 100_000_000 + j * 1_000_000))
    pdf = pd.DataFrame(rows, columns=["event_id", "ts_us"])
    events = (
        spark.createDataFrame(pdf)
        .select(
            F.col("event_id").cast("long"),
            F.timestamp_micros("ts_us").alias("ts"),
            F.lit(1).cast("long").alias("user_id"),
            F.lit("click").alias("event_type"),
        )
        # shuffle on-disk row order so Arrow chunks arrive unordered
        .orderBy(F.md5(F.col("event_id").cast("string")))
    )
    src = tmp_path / "debounce_chunks"
    events.coalesce(1).write.parquet(str(src))
    stream = spark.readStream.schema(events.schema).parquet(str(src))
    old_chunk = spark.conf.get(
        "spark.sql.execution.arrow.maxRecordsPerBatch", "10000"
    )
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        out = debounce_stream(stream, gap_sec=5)
        run_to_memory(out, "debounced_chunks", output_mode="append")
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old_chunk
        )
    kept = {
        int(r["event_id"])
        for r in spark.table("debounced_chunks").collect()
    }
    # exactly the 12 burst leaders survive
    assert kept == {b * 10 for b in range(12)}


def test_watermark_sizing_loop_stream_matches_batch_prediction(
    spark, tmp_path
):
    """The watermark-sizing LOOP (M5): measure disorder with the
    late_arrival_audit core, feed its p99 into withWatermark, replay
    event-time-disordered micro-batches, and assert the stream keeps
    exactly the rows the batch audit predicts — the ~99% of late data
    inside the p99 horizon survive, the tail beyond it is dropped.

    Traffic: 60 in-order events (10 per 1-hour window, 6 windows),
    then a late burst of 100 events 1-29 s late (inside the p99
    horizon, all still in the open last window) plus ONE event ~5.9 h
    late (the tail). p99 of the 101 lateness values = 29 s exactly,
    so the sized watermark is '29 seconds': every burst row's window
    is still open on arrival (admitted), while the tail row's window
    end sits hours behind the watermark (dropped, and its long-closed
    window is NOT re-emitted — the append contract). A sentinel batch
    far in the future closes all real windows.

    Replay uses a LIVE processingTime trigger with one file fed per
    micro-batch, waiting for each batch to commit before feeding the
    next: in this Spark build availableNow replays the whole backlog
    under the run-start watermark (late rows are NOT dropped
    mid-replay — verified empirically), so only a live trigger
    exercises the cross-batch watermark advance this loop is about."""
    import glob
    import shutil
    import time as _time

    from citeconnect_datapipeline_spark.operators.timeseries import (
        lateness_profile,
    )
    from citeconnect_datapipeline_spark.streaming.jobs import (
        tumbling_counts_stream,
        watermark_from_late_audit,
    )

    t0 = 1_600_000_000  # epoch seconds
    rows = []  # (event_id = arrival order, ts_sec)
    eid = 0
    for i in range(60):  # in-order: 10 per hour over 6 hours
        rows.append((eid, t0 + i * 360))
        eid += 1
    gm0 = t0 + 59 * 360  # max event time of the in-order batch
    batch0_end = eid
    for j in range(100):  # small-late burst: 1..29 s late, cycled
        rows.append((eid, gm0 - (j % 29 + 1)))
        eid += 1
    rows.append((eid, t0 + 100))  # the tail: ~5.9 h late
    eid += 1
    batch1_end = eid
    rows.append((eid, t0 + 86_400))  # sentinel: closes every window

    def mk_df(slc):
        return spark.createDataFrame(
            [(i, ts) for i, ts in slc], "event_id long, ts_sec long"
        ).select(
            "event_id",
            F.timestamp_seconds("ts_sec").alias("ts"),
            F.lit(1).cast("long").alias("user_id"),
            F.lit("click").alias("event_type"),
            F.lit(1.0).alias("value"),
        )

    real = mk_df(rows[:batch1_end])  # the actual traffic, no sentinel
    audit = lateness_profile(real)
    delay = watermark_from_late_audit(audit)
    assert delay == "29 seconds"  # p99 of 100x(1..29 s) + 1x huge

    src = tmp_path / "wm_src"
    src.mkdir()
    stream = (
        spark.readStream.schema(real.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = tumbling_counts_stream(stream, watermark=delay)
    q = (
        out.writeStream.format("memory")
        .queryName("wm_sized")
        .outputMode("append")
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        fed = 0

        def total_processed():
            return sum(p["numInputRows"] for p in q.recentProgress)

        def feed(slc, n_file):
            nonlocal fed
            tmp = tmp_path / f"stage{n_file}"
            mk_df(slc).coalesce(1).write.parquet(str(tmp))
            [part] = glob.glob(str(tmp / "part*"))
            shutil.copy(part, str(src / f"part-{n_file:03d}.parquet"))
            fed += len(slc)
            deadline = _time.monotonic() + 60
            while total_processed() < fed:
                assert _time.monotonic() < deadline, "batch not committed"
                _time.sleep(0.2)

        feed(rows[:batch0_end], 0)
        feed(rows[batch0_end:batch1_end], 1)
        feed(rows[batch1_end:], 2)
        # final no-data batch: watermark from the sentinel evicts and
        # emits every real window
        deadline = _time.monotonic() + 60
        while spark.table("wm_sized").count() < 7:
            assert _time.monotonic() < deadline, "windows not emitted"
            _time.sleep(0.3)
        dropped = sum(
            so.get("numRowsDroppedByWatermark", 0)
            for p in q.recentProgress
            for so in p["stateOperators"]
        )
    finally:
        q.stop()
    got = {
        r["window_start"]: int(r["n_events"])
        for r in spark.table("wm_sized").collect()
    }

    # Batch-side prediction under Spark's published semantics: the
    # watermark advances to (max event time of committed batches -
    # delay), a row is admitted iff its window end is past the
    # watermark of its batch, and append emits a window once the
    # watermark passes its end. Here: every burst row lands in the
    # still-open last window (admitted), the single tail row's window
    # closed hours earlier (dropped), the sentinel's own window never
    # closes (not emitted).
    import datetime as _dt

    predicted = {}
    for i, ts in rows[:batch1_end]:
        if i == batch1_end - 1:
            continue  # the tail event: beyond the sized watermark
        w_start = ts - ts % 3600
        key = _dt.datetime.fromtimestamp(
            w_start, tz=_dt.timezone.utc
        ).strftime("%Y-%m-%d %H:%M:%S")
        predicted[key] = predicted.get(key, 0) + 1
    assert got == predicted
    assert sum(got.values()) == 160  # 161 real events, 1 dropped
    assert dropped == 1  # the engine counted exactly the tail


def test_decayed_popularity_stream_matches_batch_scores(spark, tmp_path):
    """Streaming decayed popularity (one (last_ts, score) pair of
    state per part) must equal the batch trending decay exactly:
    each part's final stream state, renormalized to the batch
    query's global MAX-orderdate anchor with one multiplication,
    equals sum over its orders of 0.5^(age/halflife) — the
    multiplicative-fold identity the operator is built on. Replayed
    across 3 event-time-ordered micro-batches so state genuinely
    carries between triggers."""
    from citeconnect_datapipeline_spark.sources.tables import load_table
    from citeconnect_datapipeline_spark.streaming.jobs import (
        decayed_popularity_stream,
        run_to_memory,
    )

    sf = "/root/testdata/sf0.001"
    hl_days = 30.0
    li = load_table(spark, sf, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    orders = load_table(spark, sf, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    fact = li.join(
        orders, li.l_orderkey == orders.o_orderkey
    ).select("l_partkey", "l_orderkey", F.col("o_orderdate").alias("ts"))

    # event-time-ordered tertiles -> ordered micro-batch replay
    cuts = fact.agg(
        F.percentile(F.unix_micros("ts"), F.lit(1 / 3)).alias("c1"),
        F.percentile(F.unix_micros("ts"), F.lit(2 / 3)).alias("c2"),
    ).first()
    us = F.unix_micros(F.col("ts"))
    src = tmp_path / "decay_src"
    fact.filter(us <= cuts["c1"]).coalesce(1).write.parquet(
        str(src / "f0")
    )
    fact.filter((us > cuts["c1"]) & (us <= cuts["c2"])).coalesce(
        1
    ).write.parquet(str(src / "f1"))
    fact.filter(us > cuts["c2"]).coalesce(1).write.parquet(
        str(src / "f2")
    )
    stream = (
        spark.readStream.schema(fact.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    out = decayed_popularity_stream(stream, halflife_days=hl_days)
    run_to_memory(out, "decayed_pop", output_mode="update")
    emitted = spark.table("decayed_pop").toPandas()
    # update mode re-emits refreshed parts each batch; keep the last
    # (= highest last_us, then highest score) emission per part
    final = (
        emitted.sort_values(["l_partkey", "last_us", "score"])
        .groupby("l_partkey")
        .tail(1)
        .set_index("l_partkey")
    )

    hl_us = hl_days * 86_400_000_000.0
    anchor_us = orders.agg(
        F.unix_micros(F.max("o_orderdate"))
    ).first()[0]
    batch = {
        r["l_partkey"]: r["score"]
        for r in fact.select(
            "l_partkey",
            F.pow(
                F.lit(0.5),
                (F.lit(anchor_us) - F.unix_micros("ts")) / hl_us,
            ).alias("w"),
        )
        .groupBy("l_partkey")
        .agg(F.sum("w").alias("score"))
        .collect()
    }
    assert len(final) == len(batch)
    assert (emitted.groupby("l_partkey").size() > 1).any()  # state carried
    for pk, want in batch.items():
        got = final.loc[pk, "score"] * 0.5 ** (
            (anchor_us - final.loc[pk, "last_us"]) / hl_us
        )
        assert abs(got - want) < 1e-6 * max(1.0, want), pk


def test_cusum_stream_matches_batch_chart(spark, tmp_path):
    """The streaming CUSUM fold must equal the batch
    cumsum-minus-running-min form point-for-point across micro-batch
    boundaries, including through a planted level shift."""
    from citeconnect_datapipeline_spark.operators.timeseries import (
        cusum_series,
    )
    from citeconnect_datapipeline_spark.streaming.jobs import (
        cusum_stream,
        run_to_memory,
    )

    xs = [10.0, 10.2, 9.8, 10.1, 9.9] * 6 + [13.0, 13.2, 12.8, 13.1, 12.9] * 4
    series = spark.createDataFrame(
        [("m", i, float(x)) for i, x in enumerate(xs)],
        "metric string, wk long, x double",
    )
    batch = {
        r["wk"]: r
        for r in cusum_series(
            series.select("wk", "x"), baseline=30
        ).collect()
    }
    # phase-I baseline, pinned exactly as the batch core computes it
    import statistics as st

    base = xs[:30]
    mu = round(sum(base) / len(base), 6)
    sd = round(st.pstdev(base), 6)
    src = tmp_path / "cusum_src"
    for b in range(3):  # 3 ordered micro-batches of 20, 20, 10 points
        lo, hi = b * 20, min((b + 1) * 20, len(xs))
        series.filter(
            (F.col("wk") >= lo) & (F.col("wk") < hi)
        ).coalesce(1).write.parquet(str(src / f"b{b}"))
    stream = (
        spark.readStream.schema(series.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    run_to_memory(cusum_stream(stream, mu=mu, sd=sd), "cusum_stream_t")
    got = {r["wk"]: r for r in spark.table("cusum_stream_t").collect()}
    assert len(got) == len(xs) == len(batch)
    for wk, b in batch.items():
        g = got[wk]
        assert abs(g["z"] - b["z"]) < 1e-9, wk
        assert abs(g["cusum_pos"] - b["cusum_pos"]) < 1e-9, wk
        assert abs(g["cusum_neg"] - b["cusum_neg"]) < 1e-9, wk
        assert g["alarm"] == b["alarm"], wk
    # the planted shift actually alarms in the streamed output too
    assert any(r["alarm"] == 1 for r in got.values())


def test_heavy_hitters_stream_contains_true_hitters_across_batches(
    spark, tmp_path
):
    """Space-saving invariants across micro-batch boundaries: state
    is k counters per group; every item with true count > N/k is in
    the final summary; guaranteed ranks carry exact counts equal to
    the batch groupBy truth."""
    from citeconnect_datapipeline_spark.streaming.jobs import (
        heavy_hitters_stream,
        run_to_memory,
    )

    # well-separated frequencies: item t0 x120, t1 x60, t2 x30, then
    # 20 singletons - truth top-3 unambiguous, N = 230
    rows, o = [], 0
    for it, c in (("t0", 120), ("t1", 60), ("t2", 30)):
        for _ in range(c):
            rows.append(("g", it, o)); o += 1
    for s in range(20):
        rows.append(("g", f"noise{s:02d}", o)); o += 1
    # interleave deterministically so heavy items span all batches
    rows.sort(key=lambda r: (r[2] * 7919) % 230)
    rows = [("g", it, i) for i, (_, it, _) in enumerate(rows)]
    df = spark.createDataFrame(
        rows, "grp string, item string, ord long"
    )
    src = tmp_path / "hh_src"
    n = len(rows)
    for b in range(3):  # 3 ordered micro-batches
        lo, hi = b * 80, min((b + 1) * 80, n)
        df.filter(
            (F.col("ord") >= lo) & (F.col("ord") < hi)
        ).coalesce(1).write.parquet(str(src / f"b{b}"))
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    run_to_memory(heavy_hitters_stream(stream, k=8), "hh_stream_t")
    out = spark.table("hh_stream_t").collect()
    # the FINAL batch's summary = rows with the max n_seen
    n_final = max(r["n_seen"] for r in out)
    assert n_final == n
    final = {r["item"]: r for r in out if r["n_seen"] == n_final}
    assert len(final) == 8  # state is exactly k counters
    truth = {"t0": 120, "t1": 60, "t2": 30}
    # every item with true count > N/k = 28.75 must be present
    for it, c in truth.items():
        assert it in final, it
        # lower bound est - err <= true <= est
        assert final[it]["est_count"] - final[it]["err"] <= c
        assert final[it]["est_count"] >= c
    # the top-3 ranks are the true hitters in exact order and their
    # guaranteed flags hold with EXACT counts (err 0: never evicted)
    ranked = sorted(final.values(), key=lambda r: r["rank"])
    assert [r["item"] for r in ranked[:3]] == ["t0", "t1", "t2"]
    for r in ranked[:3]:
        assert r["guaranteed"] and r["err"] == 0
        assert r["est_count"] == truth[r["item"]]


def test_heavy_hitters_stream_eviction_bounds_error(spark, tmp_path):
    """An item arriving after the summary is full inherits the
    evicted minimum as its error bound - est overestimates by at
    most err, never under."""
    from citeconnect_datapipeline_spark.streaming.jobs import (
        heavy_hitters_stream,
        run_to_memory,
    )

    rows = []
    o = 0
    for s in range(4):  # fill k=4 slots with singletons
        rows.append(("g", f"a{s}", o)); o += 1
    for _ in range(5):  # newcomer evicts a min-count slot
        rows.append(("g", "late", o)); o += 1
    df = spark.createDataFrame(
        rows, "grp string, item string, ord long"
    )
    src = tmp_path / "hh2_src"
    df.coalesce(1).write.parquet(str(src / "b0"))
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    run_to_memory(heavy_hitters_stream(stream, k=4), "hh2_stream_t")
    final = {
        r["item"]: r for r in spark.table("hh2_stream_t").collect()
    }
    late = final["late"]
    assert late["est_count"] == 6 and late["err"] == 1  # 5 true + 1
    assert late["est_count"] - late["err"] == 5  # exact lower bound
    assert late["rank"] == 1


def test_ewma_stream_matches_batch_anomaly(spark, tmp_path):
    """The streaming truncated-decay EWMA must equal the batch
    RANGE-frame fold point-for-point across micro-batch boundaries,
    including through calendar gaps (where decay skips days)."""
    import datetime

    from citeconnect_datapipeline_spark.streaming.jobs import (
        ewma_stream,
        run_to_memory,
    )
    from __spark_entry__ import queries

    # one event per day -> daily mean == the planted value; a 4-day
    # gap after day 20 exercises calendar decay vs row offset
    days = list(range(20)) + list(range(24, 40))
    xs = [10.0 + (i % 5) for i in range(len(days))]
    d0 = datetime.date(2024, 1, 1)
    rows = [
        (i, "purchase", datetime.datetime.combine(
            d0 + datetime.timedelta(days=d), datetime.time(12)),
         float(x))
        for i, (d, x) in enumerate(zip(days, xs))
    ]
    sf = str(tmp_path / "lake")
    spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp,"
        " value double"
    ).write.parquet(f"{sf}/events.parquet")
    batch = {
        r["wd"]: r
        for r in queries()["ewma_anomaly"](spark, sf).collect()
    }

    wd0 = (d0 - datetime.date(1970, 1, 1)).days
    series = spark.createDataFrame(
        [("m", wd0 + d, float(x)) for d, x in zip(days, xs)],
        "metric string, wd long, x double",
    )
    src = tmp_path / "ewma_src"
    for b in range(3):
        lo, hi = b * 12, min((b + 1) * 12, len(days))
        keep = [wd0 + d for d in days[lo:hi]]
        series.filter(F.col("wd").isin(keep)).coalesce(1).write.parquet(
            str(src / f"b{b}")
        )
    stream = (
        spark.readStream.schema(series.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    run_to_memory(ewma_stream(stream), "ewma_stream_t")
    got = {r["wd"]: r for r in spark.table("ewma_stream_t").collect()}
    assert len(got) == len(batch) == len(days)
    for wd, b in batch.items():
        g = got[wd]
        assert abs(g["mean_value"] - b["mean_value"]) < 1e-9, wd
        assert abs(g["ewma"] - b["ewma"]) < 1e-9, wd
        assert abs(g["rel_dev"] - b["rel_dev"]) < 1e-9, wd


def test_ewma_stream_all_zero_window_emits_null(spark, tmp_path):
    """A sparse count metric whose trailing window is all zeros must
    emit NULL rel_dev (the batch twin's SQL null-on-zero-divide),
    not raise ZeroDivisionError and kill the query (r9 ADVICE #3)."""
    from citeconnect_datapipeline_spark.streaming.jobs import (
        ewma_stream,
        run_to_memory,
    )

    series = spark.createDataFrame(
        [("m", 19700, 0.0), ("m", 19701, 0.0), ("m", 19702, 3.0)],
        "metric string, wd long, x double",
    )
    src = tmp_path / "ewma_zero_src"
    series.coalesce(1).write.parquet(str(src / "b0"))
    stream = (
        spark.readStream.schema(series.schema)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    run_to_memory(ewma_stream(stream), "ewma_zero_t")
    got = {r["wd"]: r for r in spark.table("ewma_zero_t").collect()}
    assert got[19700]["rel_dev"] is None
    assert got[19701]["rel_dev"] is None
    assert got[19702]["rel_dev"] is not None  # ewma > 0 once x=3 lands
