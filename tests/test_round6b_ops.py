"""Crafted behavioral tests for the round-6 second-session operators.

Same contract as test_round6_ops.py: each test plants a distribution
where the operator's defining property is forced and asserts the
operator recovers exactly it — intent checks beside the oracle's
engine-agreement hash."""

from __future__ import annotations

import hashlib
import os

from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def _write(spark, tmp_path, name, schema, rows):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(str(tmp_path), f"{name}.parquet"))
    return str(tmp_path)


def _bucket(word: str) -> str:
    return hashlib.md5(word.encode()).hexdigest()[:2]


def test_logreg_portable_learns_planted_separator(spark, tmp_path):
    """A word exclusive to the trusted source must earn a positive
    weight, a word exclusive to the rest a negative one, and two
    AdaGrad rounds must reduce the training loss below the ln(2)
    starting point."""
    from citeconnect_datapipeline_spark.operators.classifier import (
        logreg_adagrad_portable,
    )

    rows = []
    for i in range(3):
        rows.append((i, "goodword goodword shared", "en", "src0", 20))
    for i in range(3, 6):
        rows.append((i, "badword badword shared", "en", "src1", 20))
    sf = _write(spark, tmp_path, "documents", DOC_SCHEMA, rows)
    out = {r["bucket"]: r for r in logreg_adagrad_portable(spark, sf).collect()}
    assert out[_bucket("goodword")]["w2"] > 0
    assert out[_bucket("badword")]["w2"] < 0
    some = next(iter(out.values()))
    assert some["loss_final"] < some["loss_r2"] < 0.6932
