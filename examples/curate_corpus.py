#!/usr/bin/env python
"""End-to-end corpus curation with the library facade (api.py).

Reads a documents parquet (doc_id, text, ...), removes near-duplicate
documents keeping one representative per cluster, trains a BPE
tokenizer on the kept corpus, and writes the curated zone + a token
accounting — the minimal version of the flow a training-data team
runs, expressed entirely against ``api.*`` DataFrame functions (no
benchmark lake layout).

Usage:
    python examples/curate_corpus.py [docs_parquet] [out_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def curate(spark, docs, out_dir: str) -> dict:
    """docs(doc_id, text) -> curated zone written under out_dir;
    returns summary counts."""
    from citeconnect_datapipeline_spark import api

    # 1. near-dup clusters: shingle Jaccard pairs -> connected
    #    components -> keep the lowest doc_id per cluster
    pairs = api.dedup.jaccard_scored_pairs(docs).filter("jaccard >= 0.5")
    labels = api.graph.connected_components(
        pairs, src="doc_a", dst="doc_b"
    )
    kept = (
        docs.join(
            labels.select(
                F.col("v").alias("doc_id"), F.col("label").alias("component")
            ),
            "doc_id",
            "left",
        )
        .withColumn("component", F.coalesce("component", F.col("doc_id")))
        .filter(F.col("doc_id") == F.col("component"))
        .drop("component")
    )

    # 2. tokenizer: train on the KEPT corpus, account tokens with it
    merges = api.tokenizer.train_bpe_merges(kept, n_merges=8)
    vocab = api.tokenizer.encode_word_vocab(kept, merges)
    words = kept.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                lambda x: x != F.lit(""),
            )
        ).alias("word"),
    )
    tokens = (
        words.join(vocab, "word")
        .groupBy()
        .agg(F.sum("n_tokens").alias("total_bpe_tokens"))
        .first()["total_bpe_tokens"]
    )

    # 3. persist the curated corpus as a zone run
    api.sinks.write_zone(kept, os.path.join(out_dir, "curated"), run_id="r1")

    return {
        "n_docs_in": docs.count(),
        "n_docs_kept": kept.count(),
        "n_merges": len(merges),
        "total_bpe_tokens": int(tokens),
    }


def main() -> None:
    from citeconnect_datapipeline_spark.session import get_spark

    docs_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else "/root/testdata/sf0.001/documents.parquet"
    )
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curate_demo"
    spark = get_spark(app_name="curate-example")
    docs = spark.read.parquet(docs_path).select("doc_id", "text")
    summary = curate(spark, docs, out_dir)
    print(summary)
    spark.stop()


if __name__ == "__main__":
    main()
