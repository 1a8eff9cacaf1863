"""Zone-layout parquet sinks and scans (SURVEY.md K1/K6/S10).

The reference writes one parquet file per (search_term, timestamp)
under GCS prefix "zones" raw_v2/ and processed_v2/ (reference:
src/DataPipeline/Ingestion/main.py:275-310,618-625,714-729), then
re-discovers data by listing the prefix and picking the blob with the
max created-time (Validation/schema_validator.py:589-623). That file-
naming convention is a hand-rolled partitioning scheme; the Spark-
native form is directory partitioning, where the "pick latest"
becomes partition pruning on ``run_ts`` instead of a client-side
listing + max().

At 100 TB the layout is the performance feature: partition columns
(zone semantics like domain/run) prune whole directories at plan
time, and within a run the writer controls file count/size so the
lake doesn't fragment into the reference's one-file-per-term pattern
(small-files problem at scale).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_zone(
    df: DataFrame,
    zone_path: str,
    run_id: str,
    partition_cols: tuple[str, ...] = (),
    files_per_partition: int = 1,
    mode: str = "append",
) -> None:
    """K1: write a run's data into a zone as partitioned parquet.

    Layout: ``zone_path/run_id=<id>/[partition_cols...]/*.parquet``.
    ``run_id`` is a partition column, so every run is an independent
    directory: appends never rewrite history, a failed run is dropped
    by deleting one directory, and readers prune to one run without
    listing the rest (the reference re-lists the whole prefix each
    consumer, gcs_reader.py:127-171).

    ``files_per_partition`` caps output fragmentation: the reference
    writes one file per (term, timestamp) which at 100 TB would mean
    millions of KB-sized files; repartitioning by the partition
    columns groups each output directory's data into a bounded file
    count sized for the lake's block size.
    """
    out = df.withColumn("run_id", F.lit(run_id))
    cols = ("run_id",) + tuple(partition_cols)
    if partition_cols:
        out = out.repartition(
            files_per_partition * 8, *[F.col(c) for c in partition_cols]
        )
    else:
        out = out.coalesce(files_per_partition)
    out.write.mode(mode).partitionBy(*cols).parquet(zone_path)


def read_zone(
    spark: SparkSession,
    zone_path: str,
    run_id: str | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """Zone scan; with ``run_id`` the filter is pure partition pruning
    (no data files outside that run are touched).

    ``merge_schema=True`` handles SCHEMA EVOLUTION across runs: a zone
    accumulates runs over months, and later runs legitimately add
    columns (the reference's 23-field vs 30-field paper records,
    SURVEY.md §1.1, are exactly this). The default single-footer read
    would silently project every run down to whichever file the
    driver sampled first; with merging, old runs surface the new
    columns as NULL — the union-by-name semantics every consumer
    expects. Costs one footer read per file, so keep it off for
    single-run reads."""
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    df = reader.parquet(zone_path)
    if run_id is not None:
        df = df.filter(F.col("run_id") == run_id)
    return df


def read_latest_run(spark: SparkSession, zone_path: str) -> DataFrame:
    """S10: the reference's "latest processed file" scan
    (schema_validator.py:589-623) — max over partition VALUES (directory
    names, no data read) then a pruned scan of that one run."""
    runs = [
        f.split("=", 1)[1]
        for f in os.listdir(zone_path)
        if f.startswith("run_id=")
    ]
    if not runs:
        raise FileNotFoundError(f"no run_id= partitions under {zone_path}")
    return read_zone(spark, zone_path, max(runs))


def read_run_asof(
    spark: SparkSession, zone_path: str, as_of_run_id: str
) -> DataFrame:
    """Time travel over the zone: read the latest run at or before
    ``as_of_run_id`` (run ids sort lexicographically — timestamped ids
    like ``2024-06-01T12-00`` give wall-clock travel). Same mechanism
    as [S10] latest-run: the version choice is a directory-name max,
    zero data files touched until the pruned scan of the chosen run.
    This is the plain-parquet form of Delta/Iceberg ``VERSION AS OF``
    — every historical run stays queryable until explicitly vacuumed,
    so a training job can pin the exact lake state it saw."""
    runs = [
        f.split("=", 1)[1]
        for f in os.listdir(zone_path)
        if f.startswith("run_id=")
    ]
    eligible = [r for r in runs if r <= as_of_run_id]
    if not eligible:
        raise FileNotFoundError(
            f"no run_id= partition at or before {as_of_run_id!r} "
            f"under {zone_path}"
        )
    return read_zone(spark, zone_path, max(eligible))


def vacuum_zone(zone_path: str, keep_latest: int = 3) -> list[str]:
    """Retention for the time-travel history: delete all but the
    newest ``keep_latest`` runs (lexicographic run-id order, matching
    [[read_run_asof]]'s travel order). Returns the run ids removed.
    Deletion is per-run directory removal — the same atomic unit the
    writer produces — so a concurrent reader of a surviving run never
    sees a partial state. Delta/Iceberg VACUUM with the table format
    replaced by the run_id= directory convention."""
    import shutil

    runs = sorted(
        f.split("=", 1)[1]
        for f in os.listdir(zone_path)
        if f.startswith("run_id=")
    )
    doomed = runs[:-keep_latest] if keep_latest > 0 else runs
    for r in doomed:
        shutil.rmtree(os.path.join(zone_path, f"run_id={r}"))
    return doomed


def write_json_artifact(
    df: DataFrame, path: str, max_rows: int = 100_000
) -> None:
    """K6: small-aggregate JSON artifact (schema snapshots, slice
    summaries — schema_validator.py:388-396, slicing_bias_analysis.py:
    43-72). These are driver-sized BY CONSTRUCTION (post-aggregation);
    the collect is the intended pattern, not a scale bug — and the
    ``max_rows`` guard makes a misuse (pointing this at an
    unaggregated table) fail fast with a clear error instead of
    OOMing the driver. Written atomically via tmp+rename so a
    concurrent reader never sees a partial artifact."""
    # limit(max_rows + 1) bounds the fetch itself: the guard must not
    # collect the oversized input to discover it is oversized.
    rows = [
        r.asDict(recursive=True) for r in df.limit(max_rows + 1).collect()
    ]
    if len(rows) > max_rows:
        raise ValueError(
            f"write_json_artifact: input exceeds {max_rows} rows — "
            "JSON artifacts are for driver-sized aggregates; write a "
            "parquet zone for table-sized data"
        )
    tmp = f"{path}.tmp"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(tmp, "w") as f:
        json.dump(rows, f, default=str, indent=1)
    os.replace(tmp, path)


def compact_zone(
    spark: SparkSession,
    zone_path: str,
    run_id: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Lake maintenance: rewrite one run's partition into size-bounded
    files and atomically swap it in.

    Streaming appends and per-term micro-writes (the reference's
    one-file-per-(term,timestamp) pattern) fragment a zone into many
    small files; at 100 TB that dominates planning time (file listing)
    and read throughput (per-file open cost). Compaction = read the
    run, coalesce to ceil(bytes / target) files, write to a temp run
    directory, then atomic directory rename — readers pruned to the
    run see either the old fragmented layout or the new compact one,
    never a mix.

    Returns {files_before, files_after, bytes}. Driver touches only
    file metadata (listing), never rows.
    """
    run_dir = os.path.join(zone_path, f"run_id={run_id}")

    def _list_parquet(d: str) -> list[str]:
        out = []
        for root, _dirs, files in os.walk(d):
            out.extend(
                os.path.join(root, f)
                for f in files
                if f.endswith(".parquet")
            )
        return out

    before = _list_parquet(run_dir)
    total_bytes = sum(os.path.getsize(f) for f in before)
    n_files = max(1, -(-total_bytes // target_file_bytes))  # ceil

    # Preserve any sub-partition directories (user partition_cols from
    # write_zone): re-discover them from the layout and re-partitionBy
    # on rewrite so compaction never flattens the pruning structure.
    sub_cols = []
    probe = run_dir
    while True:
        parts = [
            e for e in os.listdir(probe)
            if "=" in e and os.path.isdir(os.path.join(probe, e))
        ]
        if not parts:
            break
        sub_cols.append(parts[0].split("=", 1)[0])
        probe = os.path.join(probe, parts[0])

    df = spark.read.parquet(run_dir)
    tmp_dir = os.path.join(zone_path, f".compact-run_id={run_id}.tmp")
    writer = df.coalesce(n_files).write.mode("overwrite")
    if sub_cols:
        writer = writer.partitionBy(*sub_cols)
    writer.parquet(tmp_dir)
    old_dir = os.path.join(zone_path, f".old-run_id={run_id}.tmp")
    os.rename(run_dir, old_dir)
    os.rename(tmp_dir, run_dir)
    import shutil

    shutil.rmtree(old_dir)
    return {
        "files_before": len(before),
        "files_after": len(_list_parquet(run_dir)),
        "bytes": total_bytes,
    }


def write_zone_observed(
    df: DataFrame,
    zone_path: str,
    run_id: str,
    metrics: dict[str, "F.Column | str"] | None = None,
    **write_kwargs,
) -> dict:
    """K1 write with INLINE metrics via ``Observation``: aggregate
    expressions (row counts, null rates, value sums) are collected in
    the same pass that writes the data — zero extra table scans, the
    Spark-native replacement for the reference's write-then-re-read
    validation round trip (schema_validator.py re-reads the file it
    just wrote).

    ``metrics`` maps name -> aggregate Column (or SQL string).
    Returns the observed metric dict (driver-sized by construction).
    """
    from pyspark.sql import Observation

    if metrics is None:
        metrics = {"n_rows": F.count(F.lit(1))}
    cols = [
        (F.expr(c) if isinstance(c, str) else c).alias(name)
        for name, c in metrics.items()
    ]
    obs = Observation(f"write_zone:{run_id}")
    observed = df.observe(obs, *cols)
    write_zone(observed, zone_path, run_id, **write_kwargs)
    return dict(obs.get)
