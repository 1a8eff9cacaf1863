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


def test_sentence_chunker_reference_semantics():
    """The fidelity chunker's plain-function core against the
    reference algorithm's CONTRACT (chunker.py:53-124,170-214):
    sentence boundaries preserved, budget respected, char-tail
    overlap seeds the next chunk, oversized sentences force-split on
    words, short docs drop."""
    from citeconnect_datapipeline_spark.operators.text import (
        _chunk_text_sentence_preserving,
    )

    est = lambda t: max(1, len(t) // 4)  # noqa: E731

    # 1. below min_chunk_size: no chunks (chunker.py:71-74)
    assert _chunk_text_sentence_preserving("short.", 64, 16, 40) == []

    # 2. multi-sentence accumulation: boundaries preserved + budget
    sents = [f"Sentence number {i} has a few words in it." for i in range(12)]
    text = " ".join(sents)
    chunks = _chunk_text_sentence_preserving(text, 32, 8, 40)
    assert len(chunks) > 1
    assert [c[0] for c in chunks] == list(range(len(chunks)))
    for _pos, t, tok, _sc, _ec in chunks:
        assert tok == est(t)
        # token budget: a chunk holds its overlap seed + whole
        # sentences, and the drive loop stops BEFORE exceeding the
        # budget with a further sentence; the seed itself is <= 4*8
        # chars, so the bound is budget + overlap
        assert tok <= 32 + 8
    # every original sentence appears INTACT in at least one chunk
    for s in sents:
        assert any(s in t for _p, t, *_ in chunks)
    # consecutive chunks share the char-tail overlap seed
    for (p0, t0, *_), (p1, t1, *_) in zip(chunks, chunks[1:]):
        if est(t0) <= 8:
            seed = t0
        else:
            seed = t0[-8 * 4 :]
        assert t1.startswith(seed)

    # 3. an oversized sentence force-splits on words, each piece
    # within budget, and reassembles to the original word sequence
    long_sent = " ".join(f"word{i:03d}" for i in range(120)) + "."
    text = "Lead sentence comes first to flush the buffer. " + long_sent
    chunks = _chunk_text_sentence_preserving(text, 32, 8, 40)
    pieces = [t for _p, t, tok, sc, ec in chunks if sc == 0 and _p > 0]
    assert pieces, "force-split pieces must be emitted"
    for piece in pieces:
        # the reference budgets the SUM of per-word estimates
        # (chunker.py:181-187), not the whole-piece estimate — spaces
        # aren't charged, so est(piece) may exceed the budget
        assert sum(est(w) for w in piece.split()) <= 32
    assert " ".join(pieces).split() == long_sent.split()


def test_sentence_chunker_spark_matches_core(spark, sf_dir):
    """mapInPandas operator == the plain-function core applied to the
    same docs (the Spark plumbing adds ids and ordering, nothing
    else)."""
    from citeconnect_datapipeline_spark.operators.text import (
        _chunk_text_sentence_preserving,
        chunk_documents_sentences,
    )
    from citeconnect_datapipeline_spark.sources.tables import load_table

    got = [
        tuple(r)
        for r in chunk_documents_sentences(spark, sf_dir)
        .select(
            "doc_id", "pos", "chunk_id", "chunk_text",
            "token_count", "start_char", "end_char",
        )
        .collect()
    ]
    assert got, "synthetic docs must produce chunks"
    want = []
    for r in (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    ):
        for pos, t, tok, sc, ec in _chunk_text_sentence_preserving(
            r.text, 64, 16, 40
        ):
            want.append(
                (r.doc_id, pos, f"{r.doc_id}_chunk_{pos}", t, tok, sc, ec)
            )
    want.sort(key=lambda x: (x[0], x[1]))
    assert got == want


def test_gopher_flags_edge_shapes(spark):
    """Degenerate documents the lake never contains: empty text,
    symbol-only text, and a single repeated word must all be dropped
    by the right rule, without nulls or division errors."""
    from pyspark.sql import functions as F

    rows = [
        (0, "", 0),
        (1, "!!! ??? *** %%% ###", 19),
        (2, " ".join(["word"] * 200), 999),          # zero diversity
        (3, " ".join(f"w{i}" for i in range(200)), 600),  # healthy
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_chars int")
    df.createOrReplaceTempView("documents_edge")

    words = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != ""
    )
    n_words = F.size(words)
    ttr = F.size(F.array_distinct(words)) / F.greatest(
        n_words, F.lit(1)
    ).cast("double")
    out = {
        r.doc_id: (r.n_words, round(r.ttr, 4))
        for r in df.select(
            "doc_id", n_words.alias("n_words"), ttr.alias("ttr")
        ).collect()
    }
    assert out[0] == (0, 0.0)       # empty: no words, defined ttr
    assert out[1] == (0, 0.0)       # symbols only: filtered to zero
    assert out[2][0] == 200 and out[2][1] == 0.005  # 1 distinct / 200
    assert out[3] == (200, 1.0)

    # the registered query's keep verdict on these shapes
    import citeconnect_datapipeline_spark.operators.text as text_mod

    orig = text_mod.load_table  # the module-bound name the query uses
    try:
        text_mod.load_table = lambda s, d, n: df  # inject edge corpus
        flags = {
            r.doc_id: r.keep
            for r in text_mod.gopher_quality_flags(
                spark, "unused"
            ).collect()
        }
    finally:
        text_mod.load_table = orig
    assert flags == {0: False, 1: False, 2: False, 3: True}
