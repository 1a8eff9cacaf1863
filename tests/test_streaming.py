"""Structured Streaming jobs: a drained finite stream must equal the
batch answer, and stateful ops must behave (dedup, foreachBatch
upsert idempotence)."""

from __future__ import annotations

import shutil
import tempfile

import pytest

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
