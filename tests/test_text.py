"""Text-pipeline specifics: SQL chunker vs pandas-UDF chunker parity."""

from __future__ import annotations


def test_chunker_sql_vs_pandas_parity(spark, sf_dir):
    from citeconnect_datapipeline_spark.operators.text import (
        chunk_documents,
        chunk_documents_pandas,
    )

    sql_rows = [
        tuple(r)
        for r in chunk_documents(spark, sf_dir)
        .select("doc_id", "pos", "chunk_id", "chunk_text", "n_words")
        .collect()
    ]
    udf_rows = [
        tuple(r)
        for r in chunk_documents_pandas(spark, sf_dir)
        .select("doc_id", "pos", "chunk_id", "chunk_text", "n_words")
        .collect()
    ]
    assert sql_rows == udf_rows
    assert len(sql_rows) > 500  # 1->N actually multiplied rows


def test_chunker_udtf_parity(spark, sf_dir):
    """The Spark-4 Python-UDTF form must agree row-for-row with the
    codegen'd SQL chunker (all three 1->N surfaces share semantics)."""
    from citeconnect_datapipeline_spark.operators.text import (
        chunk_documents,
        chunk_documents_udtf,
    )

    cols = ["doc_id", "pos", "chunk_id", "chunk_text", "n_words"]
    sql_rows = [
        tuple(r) for r in chunk_documents(spark, sf_dir).select(*cols).collect()
    ]
    udtf_rows = [
        tuple(r)
        for r in chunk_documents_udtf(spark, sf_dir).select(*cols).collect()
    ]
    assert sql_rows == udtf_rows


def test_chunk_overlap_semantics(spark, sf_dir):
    from citeconnect_datapipeline_spark.operators.text import (
        CHUNK_STRIDE,
        CHUNK_WORDS,
        chunk_documents,
    )

    df = chunk_documents(spark, sf_dir)
    first_doc = df.filter("doc_id = 0").orderBy("pos").collect()
    if len(first_doc) >= 2:
        w0 = first_doc[0].chunk_text.split(" ")
        w1 = first_doc[1].chunk_text.split(" ")
        overlap = CHUNK_WORDS - CHUNK_STRIDE
        assert w0[CHUNK_STRIDE:] == w1[:overlap]
