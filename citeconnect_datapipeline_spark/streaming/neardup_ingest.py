"""Incremental near-duplicate-free ingestion (M2 + T9 composed).

The reference's ingest dedups on exact ``paperId`` against the ids
already in the store (upload_papers_to_supabase.py:306-316); a
training-data lake needs the stronger guarantee — a NEW document is
rejected when it is a NEAR-duplicate of anything already ingested,
not just an id match. This module runs MinHash-LSH dedup *at ingest
time*: per micro-batch, band keys for the incoming docs are joined
against the persisted band index of everything accepted so far;
survivors are appended to both the docs store and the index.

Scale shape: the per-batch state is the (doc_id, band_idx,
band_hash) index — 4 longs per accepted doc — NOT the corpus text;
the candidate check is an equi-join on (band_idx, band_hash), which
at 100 TB is a bucketable key with near-uniform distribution. Offsets
live in the stream checkpoint, and a replayed batch re-rejects its
own docs via the same index (its accepted docs are already in it),
making ingest idempotent per batch after the index append lands.
The index append runs BEFORE the docs append, so a crash between the
two can only produce index-without-doc (a replay then re-rejects the
doc — safe under-acceptance), never doc-without-index (which would
admit future dups). The batch core (``ingest_batch``) is exposed for
non-streaming backfills and tests.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.dedup import minhash_band_hashes


def ingest_batch(
    spark: SparkSession,
    batch: DataFrame,
    store_dir: str,
    text_col: str = "text",
) -> dict:
    """Accept the subset of ``batch`` that is not a near-dup of the
    store OR of an earlier doc in the same batch; append survivors'
    text rows to ``{store_dir}/docs`` and their band keys to
    ``{store_dir}/index``. Returns {attempted, accepted, rejected}.

    Within-batch semantics are deterministic and DELIBERATELY
    TRANSITIVE: a doc is rejected when it shares a band with ANY
    lower-id doc of the batch, including one that was itself
    rejected. For a collision chain a<b<c where b collides with a
    and c only with b, exact greedy keep-first would accept c;
    transitive rejection drops it. This is a conservative
    over-rejection chosen on purpose: it is a single self-join (the
    exact greedy resolution is an iterative independent-set loop —
    one job per chain hop), it can never ADMIT a duplicate, and
    band-collision chains that are not cliques are rare in practice
    (near-dup similarity is close to transitive at the thresholds
    used). The trade is documented here so callers needing exact
    greedy semantics know to run the batch through
    ``operators.dedup.neardup_components`` offline instead.
    """
    docs_dir = os.path.join(store_dir, "docs")
    index_dir = os.path.join(store_dir, "index")
    bands = minhash_band_hashes(batch, text_col).persist()

    dup_vs_store = None
    if os.path.isdir(index_dir):
        index = spark.read.parquet(index_dir)
        dup_vs_store = (
            bands.join(index, ["band_idx", "band_hash"], "left_semi")
            .select("doc_id")
            .distinct()
        )

    # within-batch collisions: the later (larger-id) doc of any
    # shared-bucket pair is rejected — one self-join on the band key
    a, b = bands.alias("a"), bands.alias("b")
    dup_in_batch = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") > F.col("b.doc_id")),
            "left_semi",
        )
        .select("doc_id")
        .distinct()
    )
    dup_ids = (
        dup_in_batch
        if dup_vs_store is None
        else dup_in_batch.unionByName(dup_vs_store).distinct()
    )

    accepted = batch.join(dup_ids, "doc_id", "left_anti")
    accepted_bands = bands.join(dup_ids, "doc_id", "left_anti")

    n_attempted = batch.count()
    n_rejected = dup_ids.count()
    # index BEFORE docs: see module docstring for the crash ordering
    accepted_bands.write.mode("append").parquet(index_dir)
    accepted.write.mode("append").parquet(docs_dir)
    store_total = spark.read.parquet(docs_dir).count()
    bands.unpersist()
    return {
        "attempted": n_attempted,
        "accepted": n_attempted - n_rejected,
        "rejected": n_rejected,
        "store_total": store_total,
    }


def reconcile_store(spark: SparkSession, store_dir: str) -> int:
    """Heal the crash window the append ordering leaves open: index
    rows land BEFORE doc rows, so a crash between the two appends
    leaves band keys whose doc_id is absent from the docs store.
    Replays then re-reject that doc against its own orphaned index
    rows — silently dropping it forever. Run this at stream startup
    (``neardup_ingest_stream`` does) to delete orphaned index rows;
    the doc's next delivery is then accepted normally.

    Returns the number of orphaned index rows removed. The index
    rewrite swaps directories atomically (staging -> rename dance)
    and rolls an interrupted previous swap forward/back first, so a
    crash DURING reconciliation never loses accepted docs' index
    rows either."""
    import shutil

    index_dir = os.path.join(store_dir, "index")
    docs_dir = os.path.join(store_dir, "docs")
    old, staging = f"{index_dir}.old", f"{index_dir}.staging"
    # recover an interrupted swap: old+index -> drop old (post-
    # commit); old alone -> restore (pre-commit)
    if os.path.isdir(old):
        if os.path.isdir(index_dir):
            shutil.rmtree(old)
        else:
            os.rename(old, index_dir)
    if os.path.isdir(staging):
        shutil.rmtree(staging)
    if not os.path.isdir(index_dir):
        return 0
    if not os.path.isdir(docs_dir):
        # nothing ever committed to docs: the whole index is orphaned
        index = spark.read.parquet(index_dir)
        n = index.count()
        shutil.rmtree(index_dir)
        return n
    index = spark.read.parquet(index_dir)
    doc_ids = spark.read.parquet(docs_dir).select("doc_id").distinct()
    n_orphans = index.join(doc_ids, "doc_id", "left_anti").count()
    if n_orphans == 0:
        return 0
    index.join(doc_ids, "doc_id", "left_semi").write.parquet(staging)
    os.rename(index_dir, old)
    os.rename(staging, index_dir)
    shutil.rmtree(old)
    return n_orphans


def neardup_ingest_stream(
    stream_df: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
) -> StreamingQuery:
    """Streaming wrapper: each micro-batch flows through
    ``ingest_batch`` under the stream checkpoint's offset tracking.
    Startup first RECONCILES the store (drops index rows orphaned by
    a crash between the index and docs appends — see
    ``reconcile_store``). Drains with availableNow so a finite
    backlog processes deterministically in tests; a production run
    drops the trigger for continuous micro-batches."""
    reconcile_store(stream_df.sparkSession, store_dir)

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ingest_batch(
            batch_df.sparkSession, batch_df, store_dir, text_col
        )

    q = (
        stream_df.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return q
