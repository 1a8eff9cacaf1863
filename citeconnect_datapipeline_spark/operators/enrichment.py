"""Token accounting + metadata enrichment (SURVEY.md T8, F5-F9, A15).

The reference estimates tokens as ``len(text)//4`` (reference:
src/DataPipeline/preprocessing/chunker.py:132-137) and enriches each
paper with keywords, an importance score, a keyword-containment domain
classification and a decade bucket (preprocessing/metadata_enricher.py:
33-170). Training-data pipelines need the sharper version: a BPE-ish
regex token count (what batch-size/cost estimation actually uses).

Everything here is native column expressions — one narrow projection
pass, no Python, no shuffle except the final aggregations — so at
100 TB these run at scan speed with column pruning (only ``text`` and
the few metadata columns are read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import load_table

# BPE-ish lexer: word runs | digit runs | single punctuation marks.
# Deliberately portable between Java regex (Spark) and RE2 (DuckDB).
BPE_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

STOPWORDS = ("the", "a", "an", "and", "or", "of", "in", "on", "to", "is")


@query(
    "token_counts",
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{BPE_PATTERN}')) AS bpe_tokens,
           len(regexp_extract_all(text, '[^ ]+')) AS ws_tokens,
           CAST(length(text) // 4 AS BIGINT) AS approx_tokens,
           ROUND(length(text) * 1.0
                 / NULLIF(len(regexp_extract_all(text, '{BPE_PATTERN}')), 0),
                 3) AS chars_per_token
    FROM documents
    ORDER BY doc_id
    """,
)
def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token accounting: BPE-ish regex lexer vs whitespace
    vs the reference's len//4 heuristic (chunker.py:132-137), plus
    chars-per-token — the quantity every training-cost estimate and
    chunk-size decision keys on. Pure codegen (regexp_extract_all +
    size); the scan reads two columns."""
    docs = load_table(spark, sf_dir, "documents")
    bpe = F.size(F.regexp_extract_all("text", F.lit(BPE_PATTERN), F.lit(0)))
    ws = F.size(F.regexp_extract_all("text", F.lit("[^ ]+"), F.lit(0)))
    return (
        docs.select(
            "doc_id",
            bpe.cast("long").alias("bpe_tokens"),
            ws.cast("long").alias("ws_tokens"),
            F.floor(F.length("text") / 4).alias("approx_tokens"),
            F.round(
                F.length("text")
                / F.nullif(bpe.cast("double"), F.lit(0.0)),
                3,
            ).alias("chars_per_token"),
        )
        .orderBy("doc_id")
    )


@query(
    "enrich_documents",
    oracle=f"""
    SELECT doc_id,
           array_to_string(list_sort(list_filter(
               list_distinct(regexp_extract_all(lower(text), '[a-z]{{3,}}')),
               w -> NOT list_contains({list(STOPWORDS)}, w)
           ))[1:5], ',') AS keywords,
           ROUND(LEAST(100.0, log10(n_chars + 1) * 25
                              + CASE WHEN lang = 'en' THEN 10 ELSE 0 END),
                 4) AS importance,
           CASE WHEN regexp_matches(text, 'join|query|table|scan')
                    THEN 'database'
                WHEN regexp_matches(text, 'spark|batch|stream|partition')
                    THEN 'compute'
                ELSE 'general' END AS domain,
           CAST(n_chars // 100 * 100 AS BIGINT) AS size_bucket
    FROM documents
    ORDER BY doc_id
    """,
)
def enrich_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T8 composite enrichment in one narrow pass: keyword extraction
    (F6: >=3-letter words minus stopwords, first 5 alphabetically for
    determinism), importance score (F7: log-scaled size + language
    bonus, clamped to 100 like metadata_enricher.py:91-129), keyword-
    containment domain classify (F9: rlike chain, the broadcast-map
    alternative of D5), and the decade-style bucket (F8:
    ``x//100*100``). Four enrichments, zero shuffles, zero Python."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.array_distinct(
        F.regexp_extract_all(F.lower("text"), F.lit("[a-z]{3,}"), F.lit(0))
    )
    keywords = F.slice(
        F.array_sort(
            F.array_except(words, F.array(*[F.lit(w) for w in STOPWORDS]))
        ),
        1,
        5,
    )
    importance = F.round(
        F.least(
            F.lit(100.0),
            F.log10(F.col("n_chars") + 1) * 25
            + F.when(F.col("lang") == "en", 10.0).otherwise(0.0),
        ),
        4,
    )
    domain = (
        F.when(F.col("text").rlike("join|query|table|scan"), "database")
        .when(F.col("text").rlike("spark|batch|stream|partition"), "compute")
        .otherwise("general")
    )
    return (
        docs.select(
            "doc_id",
            # Comma-joined string, not array<string>: the driver's
            # pandas canonicalizer sorts columns and list cells are
            # unhashable — a string column round-trips the hash check
            # while carrying the same ordered keyword set.
            F.concat_ws(",", keywords).alias("keywords"),
            importance.alias("importance"),
            domain.alias("domain"),
            (F.floor(F.col("n_chars") / 100) * 100).alias("size_bucket"),
        )
        .orderBy("doc_id")
    )
