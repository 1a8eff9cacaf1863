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


def test_duplicate_span_merge_islands(spark):
    """Two identical 50-word docs: every window (pos 0..2) is
    duplicated and overlapping, so each doc reports ONE merged span
    covering words 0..50; a unique doc contributes no span rows."""
    import citeconnect_datapipeline_spark.operators.dedup as dedup_mod

    shared = " ".join(f"s{i}" for i in range(50))
    unique = " ".join(f"u{i}" for i in range(50))
    df = spark.createDataFrame(
        [(0, shared), (1, shared), (2, unique)],
        "doc_id long, text string",
    )
    orig = dedup_mod.load_table
    try:
        dedup_mod.load_table = lambda s, d, n: df
        rows = sorted(
            (r.doc_id, r.span_start_word, r.span_end_word, r.n_windows)
            for r in dedup_mod.duplicate_span_merge(
                spark, "unused"
            ).collect()
        )
    finally:
        dedup_mod.load_table = orig
    assert rows == [(0, 0, 50, 3), (1, 0, 50, 3)]


def test_duplicate_span_merge_splits_disjoint_runs(spark):
    """A duplicated window separated from another duplicated window by
    a unique stretch must NOT merge: two docs share windows at the
    START and END of a 95-word doc but differ in the middle, giving
    two distinct spans per doc."""
    import citeconnect_datapipeline_spark.operators.dedup as dedup_mod

    head = [f"h{i}" for i in range(20)]     # pos-0 window, shared
    tail = [f"t{i}" for i in range(20)]     # final window, shared
    mid_a = [f"a{i}" for i in range(55)]
    mid_b = [f"b{i}" for i in range(55)]
    doc_a = " ".join(head + mid_a + tail)   # 95 words -> pos 0..5
    doc_b = " ".join(head + mid_b + tail)
    df = spark.createDataFrame(
        [(0, doc_a), (1, doc_b)], "doc_id long, text string"
    )
    orig = dedup_mod.load_table
    try:
        dedup_mod.load_table = lambda s, d, n: df
        out = dedup_mod.duplicate_span_merge(spark, "unused").collect()
    finally:
        dedup_mod.load_table = orig
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(
            (r.span_start_word, r.span_end_word)
        )
    # 95 words, stride 15, width 20 -> positions 0..5; only pos 0
    # (pure head) and pos 5 (75..95, pure tail) are shared verbatim.
    assert by_doc[0] == [(0, 20), (75, 95)]
    assert by_doc[1] == [(0, 20), (75, 95)]


def test_bloom_prefilter_matches_plain_antijoin(spark):
    """The Bloom prefilter must be results-invisible: new-vs-existing
    output identical to the direct anti-join, with the bucket tables
    (not the existing-hash table) as the broadcast sides."""
    import citeconnect_datapipeline_spark.operators.dedup as dedup_mod
    from pyspark.sql import functions as F

    # 40 existing docs (doc_id 0..39 via %10<8 on 0..49), batch of 10
    # where two duplicate existing texts.
    rows = []
    for i in range(50):
        if i % 10 >= 8 and i % 20 == 8:
            text = f"existing text {i - 8}"   # dup of an existing doc
        else:
            text = f"existing text {i}" if i % 10 < 8 else f"new {i}"
        rows.append((i, text))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    orig = dedup_mod.load_table
    try:
        dedup_mod.load_table = lambda s, d, n: df
        got = sorted(
            r.doc_id
            for r in dedup_mod.bloom_prefilter_dedup(
                spark, "unused"
            ).collect()
        )
        plan = (
            dedup_mod.bloom_prefilter_dedup(spark, "unused")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        dedup_mod.load_table = orig

    hashed = df.select(
        "doc_id", F.md5(F.lower(F.col("text"))).alias("h")
    )
    existing = hashed.filter(F.col("doc_id") % 10 < 8).select("h")
    want = sorted(
        r.doc_id
        for r in hashed.filter(F.col("doc_id") % 10 >= 8)
        .join(existing, "h", "left_anti")
        .collect()
    )
    assert got == want and len(got) < 10  # the planted dups are gone
    # bounded-broadcast shape: the bucket semi/anti joins broadcast
    assert plan.count("BroadcastHashJoin") >= 4


def test_lm_perplexity_buckets_are_balanced_and_ordered(spark, sf_dir):
    """Tertiles are count-balanced (sizes differ by <=1) and ordered:
    every head doc scores <= every tail doc after the shared 6-dp
    rounding (rank ties broken by doc_id stay within adjacent
    buckets)."""
    from citeconnect_datapipeline_spark.operators.text import (
        lm_perplexity_buckets,
    )

    out = lm_perplexity_buckets(spark, sf_dir).collect()
    sizes = {}
    scores = {"head": [], "middle": [], "tail": []}
    for r in out:
        sizes[r.ppl_bucket] = sizes.get(r.ppl_bucket, 0) + 1
        scores[r.ppl_bucket].append(r.avg_nll)
    assert max(sizes.values()) - min(sizes.values()) <= 1
    assert max(scores["head"]) <= min(scores["tail"])
    assert max(scores["head"]) <= min(scores["middle"]) or not scores[
        "middle"
    ]


def test_bpe_merges_match_python_trainer(spark):
    """The Spark BPE loop must learn the exact merge sequence a
    pure-Python reference trainer learns on the same corpus — same
    pairs, same order, same weighted counts (tie-break: count DESC,
    then (left, right) lexicographic)."""
    import re
    from collections import Counter

    from citeconnect_datapipeline_spark.operators.tokenizer import (
        N_MERGES,
        train_bpe_merges,
    )
    from citeconnect_datapipeline_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    got = train_bpe_merges(docs)

    # reference trainer
    freq = Counter()
    for r in docs.select("text").collect():
        for w in re.split("[^a-z0-9]+", r.text.lower()):
            if w:
                freq[w] += 1
    vocab = {w: tuple(w) for w in freq}
    want = []
    for rank in range(N_MERGES):
        pairs = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += freq[w]
        if not pairs:
            break
        (a, b), pc = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        want.append((rank, a, b, pc))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == a
                    and syms[i + 1] == b
                ):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = tuple(out)
    assert got == want
    # reruns deterministic
    assert train_bpe_merges(docs) == got


def test_bpe_encode_matches_python_encoder(spark):
    """Per-doc BPE token counts must equal a pure-Python apply_bpe
    (rank-order merges, exhaustive left-to-right passes) using the
    SAME learned merge table."""
    import re
    from collections import defaultdict

    from citeconnect_datapipeline_spark.operators.tokenizer import (
        bpe_encode_stats,
        train_bpe_merges,
    )
    from citeconnect_datapipeline_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    merges = [(a, b) for _, a, b, _ in train_bpe_merges(docs)]

    def encode(word):
        syms = list(word)
        for a, b in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    want = defaultdict(lambda: [0, 0, 0])  # words, bpe toks, chars
    for r in docs.select("doc_id", "text").collect():
        for w in re.split("[^a-z0-9]+", r.text.lower()):
            if w:
                acc = want[r.doc_id]
                acc[0] += 1
                acc[1] += encode(w)
                acc[2] += len(w)

    got = bpe_encode_stats(spark, sf).collect()
    assert len(got) == len(want)
    for row in got:
        n_words, n_tok, n_chars = want[row.doc_id]
        assert row.n_words == n_words
        assert row.n_bpe_tokens == n_tok
        assert row.chars_per_token == round(n_chars / n_tok, 6)
        # encoding never expands past chars nor shrinks below words
        assert n_words <= row.n_bpe_tokens <= n_chars
