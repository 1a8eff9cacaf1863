"""JSONL document source — the wire format training corpora actually
ship in (one JSON object per line, usually .jsonl/.jsonl.gz shards:
C4, the Pile, Dolma, RedPajama all distribute this way). The engine's
lake is parquet; this connector is the INGEST edge that gets raw
shards into it without ever aborting a task on a malformed line.

Failure semantics follow the engine's rule (SCALE.md: "failures are
data"): the reader runs in PERMISSIVE mode with an explicit
corrupt-record column, so a truncated shard, a stray log line, or a
schema-violating record becomes a QUARANTINE ROW carrying the raw
line — auditable, re-processable — while every valid line lands
typed. An explicit schema is REQUIRED: schema inference would scan
the data twice and silently widen types per shard (the classic
"this shard made doc_id a string" ingestion bug).

Reference parity: the reference ingests via per-paper HTTP JSON and
pandas; file-based JSONL corpora are out of its scope — this is the
scale-path source a Spark-first pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCS_JSONL_SCHEMA = (
    "doc_id BIGINT, text STRING, lang STRING, source STRING, "
    "n_chars BIGINT"
)
_CORRUPT = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str = DOCS_JSONL_SCHEMA,
) -> tuple[DataFrame, DataFrame]:
    """Read newline-delimited JSON shards with an explicit schema.

    Returns ``(valid, quarantine)``:

    * ``valid`` — rows where every declared column parsed; typed
      exactly as ``schema`` declares (no inference, no widening).
    * ``quarantine`` — one row per malformed line: the raw line in
      ``raw_record`` plus the source file (for re-processing the
      shard); schema-valid columns parsed from a partially-usable
      line are retained where Spark could extract them.

    Spark's PERMISSIVE mode nulls unparseable columns and stores the
    raw line in the corrupt-record column — but a cached/direct
    filter on ONLY that column is unreliable (Spark requires
    referencing other columns too), so the split is done after a
    full projection. Compressed shards (.gz/.zst) decode via the
    codec from the extension, exactly like any text source; at
    100 TB the reader parallelizes per shard file (gzip shards are
    not splittable — the documented trade every JSONL corpus
    accepts, which is why shards are kept ~1 GB)."""
    raw = (
        spark.read.schema(f"{schema}, {_CORRUPT} STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
        .withColumn("_src_file", F.input_file_name())
        # materialize the full projection before splitting: filtering
        # a bare corrupt-record column is unsupported on the lazy
        # parsed relation (SPARK-21610)
        .cache()
    )
    valid = raw.filter(F.col(_CORRUPT).isNull()).drop(
        _CORRUPT, "_src_file"
    )
    quarantine = raw.filter(F.col(_CORRUPT).isNotNull()).select(
        F.col(_CORRUPT).alias("raw_record"),
        F.col("_src_file").alias("src_file"),
    )
    # Hand the caller the cache handle: the split only works off this
    # cached relation, so its lifetime is the caller's to end (see
    # ingest_jsonl_to_zone, which unpersists once both sides landed).
    valid._jsonl_parse_cache = raw
    quarantine._jsonl_parse_cache = raw
    return valid, quarantine


def quarantine_path(zone_path: str) -> str:
    """Sibling root for quarantine rows. NOT inside ``zone_path``: a
    zone is a homogeneous ``run_id=*/part-*.parquet`` tree, and a
    ``quarantine/`` subdir with a different schema inside it makes
    every subsequent zone read fail partition discovery
    (CONFLICTING_DIRECTORY_STRUCTURES) — the quarantine store is its
    own zone-shaped tree next door."""
    return zone_path.rstrip("/") + "_quarantine"


def ingest_jsonl_to_zone(
    spark: SparkSession,
    path: str,
    zone_path: str,
    run_id: str,
    schema: str = DOCS_JSONL_SCHEMA,
) -> dict:
    """JSONL shards -> parquet zone in one pass: valid rows land as a
    zone run (``sinks.zones.write_zone`` layout), quarantine rows
    land in the SIBLING ``<zone>_quarantine/run_id=<id>`` tree (see
    :func:`quarantine_path`) so a re-run can replay just the bad
    lines without poisoning the zone's own partition discovery.
    Returns counts (driver-sized). The cached parse relation backing
    the valid/quarantine split is unpersisted before returning — the
    counts have already materialized both sides, so repeated ingests
    in one process do not accumulate pinned storage."""
    import os

    from ..sinks.zones import write_zone

    valid, quarantine = read_jsonl(spark, path, schema)
    try:
        write_zone(valid, zone_path, run_id=run_id)
        n_bad = quarantine.count()
        if n_bad:
            quarantine.write.mode("overwrite").parquet(
                os.path.join(
                    quarantine_path(zone_path), f"run_id={run_id}"
                )
            )
        return {"n_valid": valid.count(), "n_quarantined": n_bad}
    finally:
        # the split shares one cached PERMISSIVE parse of the raw
        # shards (read_jsonl); both sides are written/counted by now,
        # so release it — repeated ingests must not pin storage.
        cached = getattr(valid, "_jsonl_parse_cache", None)
        if cached is not None:
            cached.unpersist()
