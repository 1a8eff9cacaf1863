"""Vector-store push sink (SURVEY.md K4).

The reference batch-inserts chunk embeddings into Weaviate with a
dynamic batcher (embeddings/vector_store.py:60-91). Spark-side this
is the same shape as the JDBC upsert: one client per PARTITION,
batched adds, injected client factory (no Weaviate in this
container; production passes a weaviate-client wrapper with the same
``add_batch(rows)`` contract).

The in-engine alternative — embeddings as a parquet table plus the
§2.10 similarity queries — is usually the better design at 100 TB
(the store IS the lake); this sink exists for parity with deployments
that serve queries from a dedicated vector database.
"""

from __future__ import annotations

from typing import Callable, Iterable, Iterator

from pyspark.sql import DataFrame

# A vector-store client factory returns add_batch(rows) where each row
# is (id, vector, metadata_dict-ish tuple).
ClientFactory = Callable[[], Callable[[list[tuple]], None]]


def write_vectors(
    df: DataFrame,
    client_factory: ClientFactory,
    batch_size: int = 100,
) -> None:
    """Push (id, embedding, ...) rows to an external vector store,
    one client per partition, ``batch_size`` rows per add call
    (the reference's dynamic batch, vector_store.py:64-69)."""

    def push_partition(rows: Iterable) -> Iterator:
        add_batch = client_factory()
        batch: list[tuple] = []
        for row in rows:
            batch.append(tuple(row))
            if len(batch) >= batch_size:
                add_batch(batch)
                batch = []
        if batch:
            add_batch(batch)
        return iter(())

    df.rdd.foreachPartition(lambda it: list(push_partition(it)))


# ---------------------------------------------------------------------
# K4 as a Spark 4 Python DataSource writer (df.write.format(...)):
# the same push sink with Spark's two-phase commit protocol on top —
# tasks STAGE batches, the driver COMMITs only when every task
# succeeded, abort discards staged work. That is the transactional
# contract the reference's row-by-row batcher cannot give (a failed
# run leaves partial inserts; here it leaves nothing).
# ---------------------------------------------------------------------

import json as _json
import os as _os
import uuid as _uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)


class _StagedBatch(WriterCommitMessage):
    def __init__(self, staged_path: str, n_rows: int):
        self.staged_path = staged_path
        self.n_rows = n_rows


class VectorStoreWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("vector_store writer requires option 'path'")
        self.overwrite = overwrite

    def write(self, rows) -> _StagedBatch:
        staged_dir = _os.path.join(self.path, ".staged")
        _os.makedirs(staged_dir, exist_ok=True)
        staged = _os.path.join(staged_dir, f"{_uuid.uuid4().hex}.jsonl")
        n = 0
        with open(staged, "w") as f:
            for row in rows:
                f.write(_json.dumps(row.asDict(recursive=True), default=str))
                f.write("\n")
                n += 1
        return _StagedBatch(staged, n)

    def commit(self, messages) -> None:
        messages = list(messages)
        if self.overwrite:
            # An overwrite that lands FEWER parts than the previous
            # write must not leave the old tail parts behind — a
            # reader would see a mix of two generations. Clear every
            # prior part (and manifest) before publishing the new
            # ones; the staged files are safe, they live in .staged/.
            for name in _os.listdir(self.path):
                if name.startswith("part-") and name.endswith(".jsonl"):
                    _os.remove(_os.path.join(self.path, name))
            _SUCCESS = _os.path.join(self.path, "_SUCCESS")
            if _os.path.exists(_SUCCESS):
                _os.remove(_SUCCESS)
        total = 0
        for i, m in enumerate(messages):
            final = _os.path.join(self.path, f"part-{i:05d}.jsonl")
            _os.replace(m.staged_path, final)
            total += m.n_rows
        try:  # drop the now-empty staging dir
            _os.rmdir(_os.path.join(self.path, ".staged"))
        except OSError:
            pass
        manifest = _os.path.join(self.path, "_SUCCESS")
        with open(manifest, "w") as f:
            _json.dump({"n_rows": total, "parts": len(messages)}, f)

    def abort(self, messages) -> None:
        for m in messages:
            try:
                _os.remove(m.staged_path)
            except FileNotFoundError:
                pass


class VectorStoreDataSource(DataSource):
    """``df.write.format("vector_store").option("path", ...)`` —
    register with ``spark.dataSource.register(VectorStoreDataSource)``.
    The file-backed store is the container's deterministic double;
    production swaps the staged-JSONL writes for client.add_batch
    calls with the same stage/commit split (stage = insert under a
    run tag, commit = flip the tag live, abort = delete the tag)."""

    @classmethod
    def name(cls) -> str:
        return "vector_store"

    def writer(self, schema, overwrite: bool) -> VectorStoreWriter:
        return VectorStoreWriter(dict(self.options), overwrite)
