#!/usr/bin/env python
"""Pipeline health checks with the library facade (api.py).

The monitoring layer a training-data pipeline runs between ingest and
training, expressed entirely against ``api.*`` DataFrame functions on
caller-provided frames (no benchmark lake layout):

1. drift  — two-sided CUSUM over the daily document-intake series
   (api.timeseries.cusum): did volume shift against the phase-I
   baseline?
2. shift  — Mann-Whitney U between this week's and last week's
   doc-length distributions (api.stats.mannwhitney_u): rank-based, so
   a few giant documents cannot fake or mask a shift.
3. schema — functional-dependency audit (api.curation.fd_violations):
   `source -> lang` held at onboarding; a violation appearing later
   means an upstream merge corrupted the registry.
4. text   — MATTR lexical diversity per source
   (api.curation.lexical_diversity_by): a source whose chunked
   type-token ratio collapses started shipping templates.
5. vocab  — SymSpell deletion-neighborhood pairs
   (api.dedup.edit_neighbor_pairs): rare words one edit from frequent
   ones are the OCR/typo artifacts to normalize before tokenizer
   training.

Usage:
    python examples/pipeline_health_checks.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def health_checks(spark, docs, intake):
    """docs: (doc_id, source, lang, text, n_chars, week) frame;
    intake: (day, n_docs) daily counts. Returns {name: DataFrame}."""
    from citeconnect_datapipeline_spark.api import (
        curation,
        dedup,
        stats,
        timeseries,
    )

    checks = {}
    checks["intake_cusum"] = timeseries.cusum(
        intake, ord_col="day", val_col="n_docs", baseline=14
    )
    this_week = docs.filter(F.col("week") == 1)
    last_week = docs.filter(F.col("week") == 0)
    samples = last_week.select(
        F.lit("doc_len_q25").alias("metric"),
        (F.col("n_chars") / 25).cast("long").cast("double").alias("v"),
        F.lit(1).alias("g"),
    ).unionAll(
        this_week.select(
            F.lit("doc_len_q25").alias("metric"),
            (F.col("n_chars") / 25)
            .cast("long")
            .cast("double")
            .alias("v"),
            F.lit(2).alias("g"),
        )
    )
    checks["length_shift_mwu"] = stats.mannwhitney_u(samples)
    checks["fd_source_lang"] = curation.fd_violations(
        docs, "source", "lang", "docs.source->lang"
    )
    checks["lexical_diversity"] = curation.lexical_diversity_by(
        docs, "source"
    )
    vocab = (
        docs.select(
            F.explode(
                F.filter(
                    F.split(F.lower("text"), "[^a-z0-9]+"),
                    lambda x: x != "",
                )
            ).alias("word")
        )
        .filter(F.length("word") >= 4)
        .groupBy("word")
        .agg(F.count("*").alias("c"))
    )
    checks["typo_suspects"] = dedup.edit_neighbor_pairs(vocab).filter(
        F.col("suspected_typo") == 1
    )
    return checks


def main() -> None:
    from citeconnect_datapipeline_spark.session import get_spark

    spark = get_spark()
    body = " ".join(f"tok{i}" for i in range(30))
    docs = spark.createDataFrame(
        [
            (i, f"src{i % 3}", "en",
             ("tokenizer " if i % 25 else "tokenzer ") + body,
             200 + (i % 5) * 25, i // 50)
            for i in range(100)
        ],
        "doc_id long, source string, lang string, text string,"
        " n_chars long, week int",
    )
    intake = spark.createDataFrame(
        [(d, float(40 + d % 3 + (10 if d > 20 else 0))) for d in range(28)],
        "day long, n_docs double",
    )
    for name, df in health_checks(spark, docs, intake).items():
        print(f"== {name}")
        df.show(8, truncate=False)


if __name__ == "__main__":
    main()
