#!/usr/bin/env python
"""Ingest-side flow with the library facade: parse fetched payloads
into introductions, gate on extraction quality, publish a named
embedding model, embed the kept content, and build + search a
persistent IVF index.

This is the reference pipeline's §3.1 front half re-expressed
against ``api.*`` — content extraction (the real tier parsers, not
fakes), provenance-aware filtering, model-registry publish/load, and
vector indexing — with no benchmark lake layout required.

Usage:
    python examples/ingest_and_embed.py [payloads_parquet] [out_dir]

``payloads_parquet`` needs (doc_id, arxiv_html?, grobid_tei?,
pdf_text?, abstract?) — missing columns are treated as absent tiers.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def ingest_and_embed(spark, payloads, out_dir: str) -> dict:
    """payloads -> extracted + gated content, embedded with a
    published hash-projection model, IVF-indexed under out_dir;
    returns summary counts."""
    from citeconnect_datapipeline_spark import api

    # 1. the 4-tier cascade over raw payloads: stdlib HTML / TEI /
    #    PDF-regex parsers in one mapInPandas stage, provenance cols
    extracted = api.extraction.extract_from_payloads(payloads)

    # 2. quality gate: drop failed extractions; keep the provenance
    #    distribution as the run's health metric. kept feeds four
    #    downstream actions, so pin it — otherwise every action
    #    re-parses all payloads from scratch
    kept = extracted.filter(F.col("method") != "failed").persist()
    method_dist = {
        r["method"]: r["n"]
        for r in kept.groupBy("method")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    n_extracted = sum(method_dist.values())
    if n_extracted == 0:
        kept.unpersist()
        raise ValueError(
            "every payload failed all extraction tiers — nothing to "
            "embed or index; check the payload columns"
        )

    # 3. publish the embedding model to the registry, load it back
    #    (the load is what a downstream job would do), and embed
    model_dir = os.path.join(out_dir, "models", "hash_projection_v1")
    api.models.save_embedding_model(
        spark, api.similarity.HashProjectionModel.get().spec, model_dir
    )
    factory = api.models.load_embedding_model(spark, model_dir)
    embedded = api.similarity.embed_with_model(
        kept.select("doc_id", F.col("content").alias("text")), factory
    )

    # 4. IVF index: persist partitioned-by-list, then search it with
    #    the first document as the probe query
    emb = embedded.select(
        F.col("doc_id").alias("vec_id"),
        "embedding",
        F.lit("doc").alias("label"),
    )
    index_dir = os.path.join(out_dir, "ivf_index")
    api.similarity.build_ivf_index(emb, index_dir)
    probe = emb.orderBy("vec_id").first()
    hits = api.similarity.search_ivf_index(
        spark, index_dir, list(probe["embedding"]), k=5
    )

    summary = {
        "n_payloads": payloads.count(),
        "n_extracted": n_extracted,
        "method_distribution": method_dist,
        "model_dir": model_dir,
        "index_dir": index_dir,
        "top_hits": [r["vec_id"] for r in hits.collect()],
    }
    kept.unpersist()
    return summary


def main() -> None:
    from citeconnect_datapipeline_spark.session import get_spark

    payloads_path = sys.argv[1] if len(sys.argv) > 1 else None
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ingest_demo"
    spark = get_spark()
    if payloads_path:
        payloads = spark.read.parquet(payloads_path)
    else:  # tiny built-in demo corpus
        para = "spark shuffles data across executors " * 12
        payloads = spark.createDataFrame(
            [
                (1, f'<section id="S1"><p>{para}</p></section>', None, None),
                (2, None, None, f"1. Introduction\n{para}\nReferences\n"),
                (3, None, None, None),
            ],
            "doc_id long, arxiv_html string, grobid_tei string,"
            " pdf_text string",
        ).withColumn(
            "abstract",
            F.lit("an abstract long enough to clear the fifty char gate"),
        )
    summary = ingest_and_embed(spark, payloads, out_dir)
    print(summary)


if __name__ == "__main__":
    main()
