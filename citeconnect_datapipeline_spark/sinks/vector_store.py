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
