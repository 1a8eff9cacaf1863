"""Structured Streaming jobs (SURVEY.md SS2.11 M1-M5).

Real ``readStream`` pipelines over the events lake: file-source
micro-batches (the reference's generator-based batching,
utils/gcs_reader.py:173-217), watermarked tumbling aggregation,
streaming dedup (the incremental skip-existing upsert,
upload_papers_to_supabase.py:78-87), and a ``foreachBatch`` merge sink
(K3). Each job runs with ``trigger(availableNow=True)`` in tests so a
finite stream drains deterministically and must equal the batch
answer.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def read_event_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over the events table (M1). Schema comes
    from a batch peek (streams need a declared schema); nanos ts is
    normalized exactly as in the batch source layer."""
    from ..sources.tables import _ensure_session_defaults

    _ensure_session_defaults(spark)  # UTC TZ: makes the NTZ cast lossless
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    # The file source streams a directory; scope it to the events
    # table with a glob filter (zone-prefix scoping, SURVEY.md S7/S8).
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_type = dict(stream.dtypes).get("ts")
    if ts_type == "bigint":
        # integer div, not /: float division of int64 nanos loses
        # precision past 2^53 (same fix as sources/tables.py)
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    elif ts_type == "timestamp_ntz":
        # timestamp[us] parquet without UTC flag: NTZ rejects
        # withWatermark; UTC session TZ makes this cast lossless
        # (same normalization as sources/tables.py load_table).
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def tumbling_counts_stream(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling 1-hour counts (M5): late events beyond the
    watermark are dropped and per-window state is reclaimed -- the
    property that bounds memory on an unbounded stream."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def watermark_from_late_audit(
    audit: DataFrame, safety: float = 1.0
) -> str:
    """Close the watermark-sizing loop (M5): turn the 1-row lateness
    profile from `operators.timeseries.lateness_profile` (the
    `late_arrival_audit` core) into a `withWatermark` delay string —
    ceil(p99_late_sec * safety) seconds. A p99-sized watermark admits
    ~99% of late data while keeping window state bounded; raise
    ``safety`` to trade state for completeness, and the audit's
    max_late_sec is the loss bound of whatever you pick. The audit
    frame is 1 row by construction, so the collect is O(1)."""
    import math

    row = audit.first()
    p99 = float(row["p99_late_sec"] or 0.0)
    return f"{int(math.ceil(p99 * safety))} seconds"


def dedup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming dedup on event_id within the watermark horizon (M2):
    the incremental skip-existing upsert as bounded-state
    ``dropDuplicates`` -- state for ids older than the watermark is
    dropped, so memory is O(ids per horizon), not O(all ids ever)."""
    return events.withWatermark("ts", watermark).dropDuplicates(
        ["event_id", "ts"]
    )


def run_to_memory(
    stream_df: DataFrame, name: str, output_mode: str = "append"
) -> StreamingQuery:
    """Drain a finite stream into an in-memory table with
    availableNow (M1's bounded-catch-up trigger), return the query."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def foreach_batch_upsert(
    stream_df: DataFrame,
    target_dir: str,
    key_cols: list[str],
    checkpoint_dir: str,
) -> StreamingQuery:
    """``foreachBatch`` merge-upsert sink (M2/K3): per micro-batch,
    dedup the batch on the key, anti-join against the current target,
    append only new keys -- INSERT ... ON CONFLICT DO NOTHING
    (upload_papers_to_supabase.py:228-276) restated set-wise. With a
    JDBC target the same function body becomes a staged MERGE; the
    parquet target keeps the test hermetic."""

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        fresh = batch_df.dropDuplicates(key_cols)
        try:
            existing = spark.read.parquet(target_dir).select(*key_cols)
            fresh = fresh.join(existing, key_cols, "left_anti")
        except Exception:
            pass  # first batch: target does not exist yet
        fresh.write.mode("append").parquet(target_dir)

    q = (
        stream_df.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return q


def stateful_user_stats(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState`` (M5+):
    per-user running (event count, total value, max ts) maintained in
    group state ACROSS micro-batches — the arbitrary-state API for
    operators the built-in windowed aggregations can't express
    (per-key ML feature accumulation, custom sessionization, CDC
    folding). Each batch emits the group's cumulative snapshot; the
    LAST emission per user equals the batch groupBy answer (asserted
    in tests across multi-file micro-batches).

    State is a 3-tuple per user — O(active keys), no raw events
    retained; at 100 TB of stream history the state store holds only
    the running aggregates."""
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    out_schema = (
        "user_id bigint, n_events bigint, total_value double, "
        "last_ts timestamp"
    )
    state_schema = "n bigint, total double, last_ts bigint"

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n, total, last_us = (
            state.get if state.exists else (0, 0.0, 0)
        )
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            batch_max_us = int(pdf["ts"].astype("int64").max()) // 1000
            last_us = max(last_us, batch_max_us)
        state.update((n, total, last_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 6)],
                "last_ts": [pd.Timestamp(last_us, unit="us")],
            }
        )

    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_stream_click_purchase_join(
    clicks: DataFrame, purchases: DataFrame
) -> DataFrame:
    """Stream-stream inner join with event-time bounds (M5+): each
    click joins purchases by the same user within [click-1h, click].
    Both sides are watermarked so the join STATE is bounded — Spark
    retains only rows younger than watermark + interval, the property
    that makes an unbounded x unbounded join feasible (state is
    O(rate x horizon), not O(history)).

    The interval condition doubles as the state-eviction contract:
    without it (or without watermarks) a stream-stream join cannot
    bound either side's buffer."""
    c = (
        clicks.withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
    )
    p = (
        purchases.withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("purchase_ts") <= F.col("click_ts")),
    ).select(
        "click_id",
        F.col("c_user").alias("user_id"),
        "click_ts",
        "purchase_ts",
        F.round("purchase_value", 6).alias("purchase_value"),
    )


def stateful_user_stats_tws(events: DataFrame) -> DataFrame:
    """The same per-user running stats as ``stateful_user_stats``, on
    Spark 4's ``transformWithStateInPandas`` — the successor API to
    applyInPandasWithState: typed state handles (ValueState/ListState/
    MapState) managed by a StatefulProcessor object instead of a
    positional state tuple, plus timers and initial-state support.
    Both implementations are kept (and asserted equal in tests)
    because the old API is what most production jobs still run, while
    this is where new stateful operators should land.

    State per user is one ValueState row (n, total, last_us) —
    O(active keys), identical to the old form.

    Runtime requirements (both checked/raised here): the RocksDB
    state store (the only provider transformWithState is implemented
    on — also the one you want at scale: changelog checkpointing,
    bounded memory via native spill) and the ``protobuf`` package
    (the TWS state-server protocol; absent in this container, so the
    parity test skips — the operator is exercised wherever protobuf
    exists)."""
    import pandas as pd

    # Require — do not silently SET — the RocksDB provider: mutating
    # the caller's shared session conf would flip the state-store
    # implementation under every OTHER streaming query on the same
    # session (an HDFS-backed job restarted mid-flight would lose its
    # store format). The caller opts in on a session it owns:
    #   spark.conf.set("spark.sql.streaming.stateStore.providerClass",
    #                  _ROCKSDB_PROVIDER)   # or a newSession() clone
    # Checked BEFORE the protobuf import so each precondition is
    # independently testable (the provider gate must be exercisable
    # in containers that lack protobuf).
    rocksdb = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    provider = events.sparkSession.conf.get(
        "spark.sql.streaming.stateStore.providerClass", ""
    )
    if rocksdb not in (provider or ""):
        raise RuntimeError(
            "transformWithStateInPandas requires the RocksDB state "
            "store; set spark.sql.streaming.stateStore.providerClass "
            f"to {rocksdb} on the session that owns this stream"
        )

    try:  # gate: TWS's Python state client speaks protobuf
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as exc:
        raise ImportError(
            "transformWithStateInPandas requires the protobuf package"
        ) from exc

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "agg", "n bigint, total double, last_us bigint"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, total, last_us = (
                self._state.get() if self._state.exists() else (0, 0.0, 0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                batch_max_us = (
                    int(pdf["ts"].astype("int64").max()) // 1000
                )
                last_us = max(last_us, batch_max_us)
            self._state.update((n, total, last_us))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 6)],
                    "last_ts": [pd.Timestamp(last_us, unit="us")],
                }
            )

        def close(self) -> None:
            pass

    out_schema = (
        "user_id bigint, n_events bigint, total_value double, "
        "last_ts timestamp"
    )
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=UserStats(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
    )


def foreach_batch_cdc_apply(
    change_stream: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    key: str,
    op_col: str = "_op",
):
    """Streaming CDC apply (M2 completed): a change feed (rows tagged
    upsert/delete) folds into the target table per micro-batch via the
    full MERGE (sinks.upsert.merge_parquet). Offsets live in the
    checkpoint, so a crashed run resumes at the failed batch and
    re-applies it — MERGE is idempotent per batch (same changes ⇒
    same final table), giving effectively-once end-to-end. This is
    the streaming form of the reference's skip-existing upload, but
    able to propagate updates AND retractions, not just inserts."""
    from ..sinks.upsert import merge_parquet

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_parquet(
            batch_df.sparkSession, batch_df, target_dir, key, op_col
        )

    q = (
        change_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return q


def debounce_stream(events: DataFrame, gap_sec: int = 5) -> DataFrame:
    """Streaming twin of the batch `event_debounce` operator
    (operators/timeseries.py): per (user_id, event_type) signal, emit
    ONLY the first event of each burst — an event survives iff it
    arrives more than ``gap_sec`` after the previous event of its
    signal. State per key is ONE long (the last event-time seen), so
    the state store is O(active signals) with no raw events retained;
    the debounce decision is made once, at ingest, instead of by
    every downstream consumer re-running the batch window.

    Ordering contract: event-time order within each micro-batch is
    restored per key (sort on ts, event_id); across batches the
    source must deliver in event-time order (the file-source replay
    guarantee in tests) or late events are judged against the newest
    timestamp seen — the same arrival-order semantics
    `late_arrival_audit` measures."""
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    out_schema = (
        "user_id bigint, event_type string, event_id bigint,"
        " ts timestamp"
    )
    state_schema = "last_us bigint"
    gap_us = gap_sec * 1_000_000

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        last_us = state.get[0] if state.exists else None
        kept = {"event_id": [], "ts_us": []}
        # A key's micro-batch rows arrive as MULTIPLE Arrow chunks
        # (default 10k rows) with no cross-chunk ordering guarantee,
        # so event-time order must be restored over the WHOLE batch:
        # materialize every chunk first, then one concat + sort.
        # Sorting per chunk would mis-keep/mis-drop events whenever a
        # burst straddles a chunk boundary.
        chunks = list(pdfs)
        pdf = (
            pd.concat(chunks, ignore_index=True)
            if len(chunks) > 1
            else chunks[0]
        ).sort_values(["ts", "event_id"])
        for eid, ts_us in zip(
            pdf["event_id"],
            pdf["ts"].astype("int64") // 1000,
        ):
            ts_us = int(ts_us)
            if last_us is None or ts_us - last_us > gap_us:
                kept["event_id"].append(int(eid))
                kept["ts_us"].append(ts_us)
            last_us = ts_us
        if last_us is not None:
            state.update((int(last_us),))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(kept["event_id"]),
                "event_type": [key[1]] * len(kept["event_id"]),
                "event_id": kept["event_id"],
                "ts": pd.to_datetime(
                    pd.Series(kept["ts_us"], dtype="int64") * 1000
                ),
            }
        )

    return (
        events.select("user_id", "event_type", "event_id", "ts")
        .groupBy("user_id", "event_type")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def decayed_popularity_stream(
    orders: DataFrame, halflife_days: float = 30.0
) -> DataFrame:
    """Streaming twin of the batch `trending_parts_decayed` decay
    (operators/sorts.py): per part, ONE (last_event_us, score) pair
    of state folds every arriving order multiplicatively —
    score = score * 0.5^(dt / halflife) + 1 — so the state store is
    O(active parts) with no event history retained, and any reader
    can renormalize a part's score to a common anchor with one more
    multiplication (the batch query's MAX-orderdate anchor). Emits
    the refreshed (part, last_event_us, score) rows each
    micro-batch (update mode).

    Ordering contract: like `debounce_stream`, a key's micro-batch
    rows arrive as multiple unordered Arrow chunks — ALL chunks are
    materialized, concatenated, and sorted once on (ts, order key)
    before folding; across batches the source must deliver in
    event-time order, the same arrival discipline the batch twin's
    anchor math assumes."""
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    out_schema = "l_partkey bigint, last_us bigint, score double"
    state_schema = "last_us bigint, score double"
    hl_us = halflife_days * 86_400_000_000.0

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        last_us, score = (
            state.get if state.exists else (None, 0.0)
        )
        chunks = list(pdfs)
        pdf = (
            pd.concat(chunks, ignore_index=True)
            if len(chunks) > 1
            else chunks[0]
        ).sort_values(["ts", "l_orderkey"])
        for ts_us in pdf["ts"].astype("int64") // 1000:
            ts_us = int(ts_us)
            if last_us is not None:
                score = score * 0.5 ** ((ts_us - last_us) / hl_us)
            score += 1.0
            last_us = ts_us
        state.update((int(last_us), float(score)))
        yield pd.DataFrame(
            {
                "l_partkey": [key[0]],
                "last_us": [last_us],
                "score": [score],
            }
        )

    return (
        orders.select("l_partkey", "l_orderkey", "ts")
        .groupBy("l_partkey")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def cusum_stream(
    series: DataFrame,
    mu: float,
    sd: float,
    k: float = 0.5,
    h: float = 4.0,
) -> DataFrame:
    """Streaming twin of the batch `cusum_drift_chart`
    (operators/timeseries.py): per metric key, the two-sided
    standardized CUSUM folds each arriving (wk, x) point into four
    state scalars — the running cumsums W+/W- and their running
    minimums — so the state store is O(metrics), no history
    retained, and the emitted statistic is EXACTLY the batch form's
    cumsum-minus-running-min at every point. ``mu``/``sd`` are the
    phase-I baseline the batch side computed and pinned (a stream
    cannot see its own future; shipping the baseline as parameters
    is the deployment contract, same as the batch query's
    first-52-weeks rule).

    Ordering contract: like `debounce_stream`, ALL of a key's Arrow
    chunks in a micro-batch are concatenated and sorted on (wk)
    before folding; across batches the source must deliver in series
    order (the availableNow file-per-batch discipline the parity
    test uses)."""
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    out_schema = (
        "metric string, wk bigint, x double, z double,"
        " cusum_pos double, cusum_neg double, alarm int"
    )
    state_schema = "wp double, wn double, mp double, mn double"

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        wp, wn, mp, mn = (
            state.get if state.exists else (0.0, 0.0, 0.0, 0.0)
        )
        chunks = list(pdfs)
        pdf = (
            pd.concat(chunks, ignore_index=True)
            if len(chunks) > 1
            else chunks[0]
        ).sort_values("wk")
        out = {c: [] for c in (
            "wk", "x", "z", "cusum_pos", "cusum_neg", "alarm")}
        for wk, x in zip(pdf["wk"], pdf["x"]):
            z = 0.0 if sd == 0.0 else round((x - mu) / sd, 6)
            wp += round(z - k, 6)
            wn += round(-z - k, 6)
            # fold the current point into the running minimum BEFORE
            # emitting: the batch window frame includes the current
            # row, so a new global minimum must emit exactly 0
            mp = min(mp, wp)
            mn = min(mn, wn)
            cp = round(wp - min(0.0, mp), 6)
            cn = round(wn - min(0.0, mn), 6)
            out["wk"].append(int(wk))
            out["x"].append(float(x))
            out["z"].append(z)
            out["cusum_pos"].append(cp)
            out["cusum_neg"].append(cn)
            out["alarm"].append(int(cp > h or cn > h))
        state.update((float(wp), float(wn), float(mp), float(mn)))
        yield pd.DataFrame({"metric": key[0], **out})

    return (
        series.groupBy("metric")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def heavy_hitters_stream(
    events: DataFrame, k: int = 8
) -> DataFrame:
    """Streaming heavy hitters per group via the SPACE-SAVING sketch
    (Metwally et al. 2005) in ``applyInPandasWithState`` — the
    cross-batch twin of the batch `cms_heavy_hitters` family: state
    per group is EXACTLY k (item, count, err) counters regardless of
    stream length, the invariant that makes top-k viable over an
    unbounded stream. Arriving items increment their counter, fill a
    free slot, or EVICT the minimum counter (inheriting its count as
    the new item's error bound): any item with true frequency >
    N/k is guaranteed present, and est - err is a lower bound on
    the true count (``guaranteed`` flags summary rows whose lower
    bound clears the next rank's estimate — those ranks are exact).

    Determinism contract (the cusum_stream ordering rule): each
    micro-batch's Arrow chunks are concatenated and sorted on
    ``ord`` before folding, eviction ties resolve to the
    lexicographically smallest item, and across batches the source
    must deliver in ord order (the availableNow file-per-batch
    discipline the parity test uses).

    Input: (grp string, item string, ord long). Output per batch:
    (grp, item, est_count, err, n_seen, rank, guaranteed)."""
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    out_schema = (
        "grp string, item string, est_count bigint, err bigint,"
        " n_seen bigint, rank int, guaranteed boolean"
    )
    state_schema = (
        "items array<string>, counts array<long>, errs array<long>,"
        " n bigint"
    )

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        if state.exists:
            items, counts, errs, n = state.get
            items, counts, errs = list(items), list(counts), list(errs)
        else:
            items, counts, errs, n = [], [], [], 0
        chunks = list(pdfs)
        pdf = (
            pd.concat(chunks, ignore_index=True)
            if len(chunks) > 1
            else chunks[0]
        ).sort_values("ord")
        idx = {it: i for i, it in enumerate(items)}
        for it in pdf["item"]:
            n += 1
            i = idx.get(it)
            if i is not None:
                counts[i] += 1
            elif len(items) < k:
                idx[it] = len(items)
                items.append(it)
                counts.append(1)
                errs.append(0)
            else:
                # evict the min counter; ties to the smallest item so
                # replay at any chunking reproduces byte-for-byte
                j = min(
                    range(len(items)),
                    key=lambda q: (counts[q], items[q]),
                )
                del idx[items[j]]
                idx[it] = j
                errs[j] = counts[j]
                counts[j] += 1
                items[j] = it
        state.update(
            (list(items), [int(c) for c in counts],
             [int(e) for e in errs], int(n))
        )
        order = sorted(
            range(len(items)), key=lambda q: (-counts[q], items[q])
        )
        rows = {c: [] for c in (
            "item", "est_count", "err", "rank", "guaranteed")}
        for r, q in enumerate(order):
            nxt = counts[order[r + 1]] if r + 1 < len(order) else 0
            rows["item"].append(items[q])
            rows["est_count"].append(int(counts[q]))
            rows["err"].append(int(errs[q]))
            rows["rank"].append(r + 1)
            rows["guaranteed"].append(
                bool(counts[q] - errs[q] >= nxt)
            )
        yield pd.DataFrame(
            {
                "grp": key[0],
                "item": rows["item"],
                "est_count": rows["est_count"],
                "err": rows["err"],
                "n_seen": int(n),
                "rank": rows["rank"],
                "guaranteed": rows["guaranteed"],
            }
        )

    return events.groupBy("grp").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def ewma_stream(
    series: DataFrame,
    decay: float = 0.7,
    span: int = 9,
) -> DataFrame:
    """Streaming twin of the batch `ewma_anomaly`
    (operators/timeseries.py): per metric key, each arriving
    (wd, x) day re-derives the truncated calendar-decay EWMA —
    baseline weight of day d in day t is decay^(t-d) for
    t - span <= d <= t, EXACTLY the batch RANGE-frame fold — from a
    state holding only the trailing ``span + 1`` (wd, x) pairs, so
    the state store is O(metrics x span), no unbounded history. The
    fold preserves the batch core's deterministic left-to-right
    summation order (oldest first), so parity is exact, not
    approximate.

    Ordering contract: a key's micro-batch chunks are concatenated
    and sorted on wd before folding (the cusum_stream discipline);
    across batches the source must deliver in series order."""
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    out_schema = (
        "metric string, wd bigint, mean_value double, ewma double,"
        " rel_dev double"
    )
    state_schema = "wds array<bigint>, xs array<double>"

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        wds, xs = (
            ([], []) if not state.exists else (
                list(state.get[0]), list(state.get[1])
            )
        )
        chunks = list(pdfs)
        pdf = (
            pd.concat(chunks, ignore_index=True)
            if len(chunks) > 1
            else chunks[0]
        ).sort_values("wd")
        out = {c: [] for c in ("wd", "mean_value", "ewma", "rel_dev")}
        for wd, x in zip(pdf["wd"], pdf["x"]):
            wd = int(wd)
            x = float(x)
            wds.append(wd)
            xs.append(x)
            while wds and wds[0] < wd - span:
                wds.pop(0)
                xs.pop(0)
            num = 0.0
            den = 0.0
            # oldest-first left fold == the batch HOF aggregate over
            # the RANGE-frame collect_list (ascending wd)
            for d, v in zip(wds, xs):
                w = decay ** (wd - d)
                num += v * w
                den += w
            ewma = num / den
            out["wd"].append(wd)
            out["mean_value"].append(round(x, 4))
            out["ewma"].append(round(ewma, 4))
            # batch twin divides in SQL, which yields NULL when the
            # trailing window is all zeros — mirror that instead of
            # raising ZeroDivisionError and killing the stream
            out["rel_dev"].append(
                round(abs(x - ewma) / ewma, 4) if ewma != 0 else None
            )
        state.update((wds, xs))
        yield pd.DataFrame({"metric": key[0], **out})

    return (
        series.groupBy("metric")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
