"""Text pipeline operators (SURVEY.md SS2.10 T1/T2/T8, A5/A15) plus
the training-data text-analysis suite (language-ID, quality scoring,
token counting, fingerprinting).

The reference's text stage is per-row Python: clean
(preprocessing/text_cleaner.py:34-112), sentence-preserving sliding-
window chunking (preprocessing/chunker.py:53-124,170-214; 512-token
chunks, 50 overlap), keyword top-k (metadata_enricher.py:62-89), and
explode-count distributions (databias/analyze_bias.py:74,136).

Spark restatement: tokenization is ``split`` into arrays, chunking is
``sequence`` + ``slice`` + ``posexplode`` (pure SQL, whole-stage
codegen, 1->N without a UDF), counts are explode -> groupBy. A
pandas_udf variant of the chunker exists for reference-fidelity
testing (chunk_documents_pandas) and is asserted equal to the SQL
version in tests.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..plans.registry import query
from ..sources.tables import (
    literal_grid,
    load_table,
    spread_small_source,
)

# Chunking parameters: the reference uses 512 tokens / 50 overlap
# (embeddings/config.py:63-64) over ~4-char tokens; the synthetic docs
# are ~50 words, so scaled-down windows exercise the same shapes
# (multi-chunk docs, ragged tail, overlap).
CHUNK_WORDS = 20
CHUNK_STRIDE = 15  # 5-word overlap

STOPWORDS = ("the", "a", "an", "and", "of", "to", "in", "is", "on", "for")


def _words(col: str = "text"):
    return F.split(F.lower(F.col(col)), "[^a-z0-9]+")


@query(
    "chunk_documents",
    oracle=f"""
    WITH words AS (
        SELECT doc_id, string_split_regex(lower(text), '[^a-z0-9]+') AS w
        FROM documents
    ),
    chunks AS (
        SELECT doc_id,
               CAST(t.i AS INTEGER) AS pos,
               array_to_string(
                   list_slice(w, 1 + t.i * {CHUNK_STRIDE},
                              {CHUNK_WORDS} + t.i * {CHUNK_STRIDE}), ' '
               ) AS chunk_text
        FROM words,
             UNNEST(range(0, GREATEST(
                 CAST(CEIL((len(w) - {CHUNK_WORDS}) / {CHUNK_STRIDE}.0)
                     AS BIGINT) + 1, 1))) AS t(i)
    )
    SELECT doc_id, pos,
           doc_id || '_chunk_' || pos AS chunk_id,
           chunk_text,
           length(chunk_text) - length(replace(chunk_text, ' ', '')) + 1
               AS n_words
    FROM chunks
    WHERE chunk_text <> ''
    ORDER BY doc_id, pos
    """,
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (T2): 1 doc -> N overlapping
    chunks with (chunk_id, position) provenance, the reference
    chunker's shape (chunker.py:53-124; chunk_id format
    ``{paper_id}_chunk_{position}`` from services/embedding_service.py).

    Pure-SQL formulation: word array -> ``sequence`` of window starts
    -> ``slice`` per start -> ``posexplode``. Fully codegen'd, no UDF,
    partition-parallel in the document id -- at 100 TB the 1->N
    explosion is the only row-multiplying step and carries no shuffle.

    r12: the word array is MATERIALIZED in its own projection before
    the generator (guide §4.1 — compute once, reference many). The
    single-select form inlined ``split(lower(text))`` into the
    transform LAMBDA, so every chunk re-split the whole document:
    O(doc_len * n_chunks) per doc, quadratic in document length.
    With the projected array the split runs once per doc and the
    lambda slices a bound attribute (CollapseProject keeps the
    non-cheap alias separate because it is referenced twice —
    asserted in tests/test_plans.py)."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.col("w")
    n_chunks = F.greatest(
        F.ceil((F.size(w) - CHUNK_WORDS) / CHUNK_STRIDE) + 1, F.lit(1)
    )
    starts = F.sequence(F.lit(0), n_chunks - 1)
    chunks = F.transform(
        starts,
        lambda i: F.concat_ws(
            " ", F.slice(w, i * CHUNK_STRIDE + 1, CHUNK_WORDS)
        ),
    )
    return (
        docs.select("doc_id", _words().alias("w"))
        .select("doc_id", F.posexplode(chunks).alias("pos", "chunk_text"))
        .filter(F.col("chunk_text") != "")
        .select(
            "doc_id",
            "pos",
            F.concat_ws("_", "doc_id", F.lit("chunk"), "pos").alias("chunk_id"),
            "chunk_text",
            (F.size(F.split(F.col("chunk_text"), " "))).alias("n_words"),
        )
        .orderBy("doc_id", "pos")
    )


def chunk_documents_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-fidelity chunker as an Arrow-batched pandas UDF
    (SURVEY.md SS7.4 asks for both implementations; tests assert parity
    with the SQL version). This is the pattern for chunkers whose
    semantics outgrow SQL (sentence-boundary preservation, force-split
    of long sentences, chunker.py:170-214)."""
    import re

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("pos", IntegerType()),
            StructField("chunk_id", StringType()),
            StructField("chunk_text", StringType()),
            StructField("n_words", IntegerType()),
        ]
    )

    def chunk_batch(batches):
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "pos": [], "chunk_id": [],
                "chunk_text": [], "n_words": [],
            }
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                words = [t for t in re.split(r"[^a-z0-9]+", text.lower())]
                n = max(-(-(len(words) - CHUNK_WORDS) // CHUNK_STRIDE) + 1, 1)
                for pos in range(n):
                    piece = words[pos * CHUNK_STRIDE : pos * CHUNK_STRIDE + CHUNK_WORDS]
                    chunk = " ".join(piece)
                    if not chunk:
                        continue
                    out["doc_id"].append(doc_id)
                    out["pos"].append(pos)
                    out["chunk_id"].append(f"{doc_id}_chunk_{pos}")
                    out["chunk_text"].append(chunk)
                    out["n_words"].append(len(chunk.split(" ")))
            yield pd.DataFrame(out)

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInPandas(chunk_batch, schema).orderBy("doc_id", "pos")


class _ChunkUDTF:
    """Python UDTF (Spark 4 user-defined TABLE function) form of the
    chunker — the third implementation of the 1→N shape (SURVEY.md
    SS2.12: SQL posexplode, pandas_udf, UDTF). A UDTF is the right
    surface when each input row yields a variable number of typed
    rows and the logic is imperative: ``eval`` yields tuples, Spark
    handles the lateral expansion, and the function composes in SQL
    as ``LATERAL chunk_udtf(doc_id, text)``."""

    def eval(self, doc_id, text):  # noqa: ANN001 - UDTF contract
        import re

        words = re.split(r"[^a-z0-9]+", (text or "").lower())
        n = max(-(-(len(words) - CHUNK_WORDS) // CHUNK_STRIDE) + 1, 1)
        for pos in range(n):
            piece = words[pos * CHUNK_STRIDE : pos * CHUNK_STRIDE + CHUNK_WORDS]
            chunk = " ".join(piece)
            if chunk:
                yield (
                    doc_id,
                    pos,
                    f"{doc_id}_chunk_{pos}",
                    chunk,
                    len(chunk.split(" ")),
                )


@query(
    "chunk_documents_udtf",
    oracle=f"""
    WITH words AS (
        SELECT doc_id, string_split_regex(lower(text), '[^a-z0-9]+') AS w
        FROM documents
    ),
    chunks AS (
        SELECT doc_id,
               CAST(t.i AS INTEGER) AS pos,
               array_to_string(
                   list_slice(w, 1 + t.i * {CHUNK_STRIDE},
                              {CHUNK_WORDS} + t.i * {CHUNK_STRIDE}), ' '
               ) AS chunk_text
        FROM words,
             UNNEST(range(0, GREATEST(
                 CAST(CEIL((len(w) - {CHUNK_WORDS}) / {CHUNK_STRIDE}.0)
                     AS BIGINT) + 1, 1))) AS t(i)
    )
    SELECT doc_id, pos,
           doc_id || '_chunk_' || pos AS chunk_id,
           chunk_text,
           length(chunk_text) - length(replace(chunk_text, ' ', '')) + 1
               AS n_words
    FROM chunks
    WHERE chunk_text <> ''
    ORDER BY doc_id, pos
    """,
)
def chunk_documents_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunking via a registered Python UDTF invoked through a SQL
    LATERAL join — same semantics (and same oracle) as
    ``chunk_documents``; exists to cover the UDTF extension surface.
    Arrow-serialized batches; per-row Python, so the codegen'd SQL
    form stays the production default."""
    from pyspark.sql.functions import udtf

    chunker = udtf(
        _ChunkUDTF,
        returnType=(
            "doc_id long, pos int, chunk_id string, "
            "chunk_text string, n_words int"
        ),
    )
    spark.udtf.register("chunk_udtf", chunker)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "udtf_docs"
    )
    return spark.sql(
        """
        SELECT c.doc_id, c.pos, c.chunk_id, c.chunk_text, c.n_words
        FROM udtf_docs AS d,
             LATERAL chunk_udtf(d.doc_id, d.text) AS c
        ORDER BY c.doc_id, c.pos
        """
    )


def _chunk_text_sentence_preserving(
    text: str,
    chunk_size: int,
    overlap: int,
    min_chunk_size: int,
) -> list[tuple[int, str, int, int, int]]:
    """The reference chunker's EXACT accumulation semantics
    (chunker.py:53-124 drive loop, :126-129 sentence regex, :131-137
    len//4 token estimate, :160-168 char-tail overlap, :170-214
    word-level force-split of oversized sentences), as a plain
    function so both the Spark operator and tests call one body.

    Returns (pos, chunk_text, token_count, start_char, end_char)
    tuples. Two reference quirks are preserved deliberately —
    fidelity means chunk boundaries (and so every downstream
    embedding and near-dup verdict) match the reference run for run:
    * force-split chunks report start_char=0 / end_char=len(piece)
      (chunker.py:196-197,207-208);
    * char_position advances by raw sentence length, ignoring the
      whitespace the split consumed (chunker.py:115).
    """
    import re

    def est(t: str) -> int:
        return max(1, len(t) // 4)

    if not text or len(text) < min_chunk_size:
        return []
    sentences = [
        s.strip()
        for s in re.split(r"(?<=[.!?])\s+", text)
        if s.strip()
    ]
    out: list[tuple[int, str, int, int, int]] = []
    cur: list[str] = []
    cur_tokens = 0
    char_pos = 0
    pos = 0

    def emit(sents: list[str], p: int, start: int) -> None:
        t = " ".join(sents)
        out.append((p, t, est(t), start, start + len(t)))

    for sentence in sentences:
        s_tokens = est(sentence)
        if s_tokens > chunk_size:
            if cur:
                emit(cur, pos, char_pos)
                pos += 1
                cur = []
                cur_tokens = 0
            # word-level force split (chunker.py:170-214)
            words_acc: list[str] = []
            acc_tokens = 0
            for word in sentence.split():
                w_tokens = est(word)
                if acc_tokens + w_tokens > chunk_size:
                    if words_acc:
                        piece = " ".join(words_acc)
                        out.append(
                            (pos, piece, est(piece), 0, len(piece))
                        )
                        pos += 1
                    words_acc = [word]
                    acc_tokens = w_tokens
                else:
                    words_acc.append(word)
                    acc_tokens += w_tokens
            if words_acc:
                piece = " ".join(words_acc)
                out.append((pos, piece, est(piece), 0, len(piece)))
                pos += 1
            char_pos += len(sentence)
            continue
        if cur_tokens + s_tokens > chunk_size and cur:
            emit(cur, pos, char_pos)
            pos += 1
            combined = " ".join(cur)
            if est(combined) <= overlap:
                ov = combined
            else:
                oc = overlap * 4
                ov = combined[-oc:] if len(combined) > oc else combined
            cur = [ov] if ov else []
            cur_tokens = est(ov) if ov else 0
        cur.append(sentence)
        cur_tokens += s_tokens
        char_pos += len(sentence)
    if cur:
        emit(cur, pos, char_pos)
    return out


@query("chunk_documents_sentences")  # rows-only: stateful sentence
# accumulation with char-tail overlap is not SQL-expressible — the
# overlap carried into chunk k depends on every sentence before it
def chunk_documents_sentences(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """T2 at reference fidelity: sentence-PRESERVING chunking — full
    sentences accumulate until the token budget, a char-tail overlap
    seeds the next chunk, and a single sentence over the budget is
    force-split on words (chunker.py:53-124,170-214). The SQL
    sliding-window chunker (``chunk_documents``) keeps uniform
    windows; this one keeps SEMANTIC boundaries, which is what the
    reference embeds.

    Spark shape: Arrow-batched ``mapInPandas`` over (doc_id, text) —
    per-document independent, so it scales embarrassingly with input
    splits; no shuffle, the same 1→N explosion profile as the SQL
    form. Scaled-down budget (64 tokens / 16 overlap / 40 min-chars
    vs the reference's 512/50/100, embeddings/config.py:63-64) so the
    ~50-word synthetic docs exercise multi-chunk accumulation, not
    just the single-chunk fast path."""
    chunk_size, overlap, min_chunk = 64, 16, 40

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("pos", IntegerType()),
            StructField("chunk_id", StringType()),
            StructField("chunk_text", StringType()),
            StructField("token_count", IntegerType()),
            StructField("start_char", IntegerType()),
            StructField("end_char", IntegerType()),
        ]
    )

    def chunk_batch(batches):
        for pdf in batches:
            rows: dict[str, list] = {f.name: [] for f in schema.fields}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                for pos, t, tok, sc, ec in _chunk_text_sentence_preserving(
                    text, chunk_size, overlap, min_chunk
                ):
                    rows["doc_id"].append(doc_id)
                    rows["pos"].append(pos)
                    rows["chunk_id"].append(f"{doc_id}_chunk_{pos}")
                    rows["chunk_text"].append(t)
                    rows["token_count"].append(tok)
                    rows["start_char"].append(sc)
                    rows["end_char"].append(ec)
            yield pd.DataFrame(rows)

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInPandas(chunk_batch, schema).orderBy("doc_id", "pos")


@query(
    "word_freq_topk",
    oracle=f"""
    WITH words AS (
        SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS word
        FROM documents
    )
    SELECT word, COUNT(*) AS n
    FROM words
    WHERE length(word) >= 3
      AND word NOT IN {STOPWORDS!r}
    GROUP BY word
    ORDER BY n DESC, word
    LIMIT 25
    """,
)
def word_freq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword top-k (A15/F6): regex tokenize -> stopword + min-length
    filter -> count -> top-k (metadata_enricher.py:62-89's Counter
    .most_common, distributed). Filters run before the shuffle, so
    only surviving tokens move."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(_words()).alias("word"))
        .filter(
            (F.length("word") >= 3) & (~F.col("word").isin(*STOPWORDS))
        )
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(25)
    )


@query(
    "explode_count_by_group",
    oracle="""
    WITH words AS (
        SELECT source,
               unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS word
        FROM documents
    )
    SELECT source, COUNT(*) AS n_tokens, COUNT(DISTINCT word) AS n_distinct
    FROM words
    WHERE word <> ''
    GROUP BY source
    ORDER BY source
    """,
)
def explode_count_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode + grouped count (A5): ``fieldsOfStudy.explode()
    .value_counts()`` (analyze_bias.py:74,136) -- array explode then
    count + distinct count per group."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("source", F.explode(_words()).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_tokens"),
            F.countDistinct("word").alias("n_distinct"),
        )
        .orderBy("source")
    )


@query(
    "lang_id_heuristic",
    oracle=f"""
    WITH words AS (
        SELECT doc_id, lang,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS w
        FROM documents
    )
    SELECT doc_id, lang AS labeled_lang,
           ROUND(CAST(len(list_filter(w,
               x -> list_contains({list(STOPWORDS)!r}, x))) AS DOUBLE)
               / GREATEST(len(w), 1), 6) AS en_stopword_ratio,
           CASE WHEN CAST(len(list_filter(w,
               x -> list_contains({list(STOPWORDS)!r}, x))) AS DOUBLE)
               / GREATEST(len(w), 1) >= 0.05
                THEN 'en' ELSE 'other' END AS predicted_lang
    FROM words
    ORDER BY doc_id
    """,
)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic for training-data pipelines: stopword-hit
    ratio against an English function-word list; classify en/other.
    Pure column expressions (filter over the token array), no UDF --
    the n-gram-profile generalization swaps the stopword list for
    per-language profile arrays and argmax over scores."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.filter(_words(), lambda x: x != "")
    hits = F.size(
        F.filter(w, lambda x: x.isin(*STOPWORDS))
    )
    # threshold the RAW ratio (what the oracle and the confusion
    # matrix do); only the DISPLAYED ratio is rounded — thresholding
    # the rounded value would flip a doc whose raw ratio sits in
    # [0.0499995, 0.05), silently diverging from the oracle
    raw = hits.cast("double") / F.greatest(F.size(w), F.lit(1))
    return (
        docs.select(
            "doc_id",
            F.col("lang").alias("labeled_lang"),
            F.round(raw, 6).alias("en_stopword_ratio"),
            F.when(raw >= 0.05, "en").otherwise("other").alias(
                "predicted_lang"
            ),
        )
    )


@query(
    "quality_score",
    oracle="""
    WITH words AS (
        SELECT doc_id, n_chars,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS w
        FROM documents
    )
    SELECT doc_id,
           n_chars,
           len(w) AS n_tokens,
           ROUND(CAST(len(list_distinct(w)) AS DOUBLE)
                 / GREATEST(len(w), 1), 6) AS type_token_ratio,
           ROUND(CAST(n_chars AS DOUBLE) / GREATEST(len(w), 1), 6)
               AS mean_word_len,
           CASE WHEN len(w) >= 40 AND
                     CAST(len(list_distinct(w)) AS DOUBLE)
                     / GREATEST(len(w), 1) >= 0.4
                THEN 'high'
                WHEN len(w) >= 20 THEN 'medium'
                ELSE 'low' END AS quality_band
    FROM words
    ORDER BY doc_id
    """,
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality scoring: length, token count, type-token
    ratio, mean word length, banded quality label -- the
    training-data analogue of the reference's content_quality tiers
    (content_extractor.py provenance + min-length gates
    embedding_service.py:263-269)."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.filter(_words(), lambda x: x != "")
    ttr = F.round(
        F.size(F.array_distinct(w)).cast("double")
        / F.greatest(F.size(w), F.lit(1)),
        6,
    )
    return (
        docs.select(
            "doc_id",
            "n_chars",
            F.size(w).alias("n_tokens"),
            ttr.alias("type_token_ratio"),
            F.round(
                F.col("n_chars").cast("double")
                / F.greatest(F.size(w), F.lit(1)),
                6,
            ).alias("mean_word_len"),
            F.when((F.size(w) >= 40) & (ttr >= 0.4), "high")
            .when(F.size(w) >= 20, "medium")
            .otherwise("low")
            .alias("quality_band"),
        )
    )


@query(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(regexp_replace(trim(lower(text)), ' +', ' ', 'g'))
               AS fingerprint,
           length(regexp_replace(trim(lower(text)), ' +', ' ', 'g'))
               AS norm_len
    FROM documents
    ORDER BY doc_id
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over whitespace-normalized
    lowercase text -- the exact-dedup key and cache-key primitive
    (training-data pipelines key shards and near-dup unions on this)."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), " +", " ")
    return docs.select(
        "doc_id",
        F.md5(norm).alias("fingerprint"),
        F.length(norm).alias("norm_len"),
    )


@query(
    "doc_repetition_topk",
    oracle="""
    WITH words AS (
        SELECT doc_id, string_split_regex(lower(text), '[^a-z0-9]+') AS w
        FROM documents
    ),
    sh AS (
        SELECT doc_id,
               array_to_string(list_slice(w, i, i + 2), ' ') AS shingle
        FROM words, UNNEST(range(1, greatest(len(w) - 1, 2))) AS t(i)
        WHERE array_to_string(list_slice(w, i, i + 2), ' ') <> ''
    )
    SELECT doc_id,
           COUNT(*) AS n_shingles,
           ROUND(1 - COUNT(DISTINCT shingle) * 1.0 / COUNT(*), 6)
               AS rep_ratio
    FROM sh
    GROUP BY doc_id
    ORDER BY rep_ratio DESC, doc_id
    LIMIT 20
    """,
)
def doc_repetition_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition ratio (the Gopher-rule boilerplate
    signal a training-data filter cuts on): 1 - distinct/total 3-word
    shingles per doc, top-20 most repetitive. No explode and no
    shuffle at all until the final top-k (TakeOrdered on the scan
    stage, one job).

    The shingle counting is an Arrow-batched pandas UDF (r12, closing
    the r11 gate flag): the previous form — an interpreted
    ``transform(sequence, xxhash64(get,get,get))`` HOF — cost ~35 us
    PER SHINGLE (1.8 ms/doc; 9 s over one compact scan partition) and
    needed a repartition job just to hide that behind parallelism.
    Python set-of-tuples counting over the same JVM-split word array
    is ~50x faster per row, needs no spread and no hash at all
    (exact tuples, i.e. literally the oracle's COUNT(DISTINCT
    shingle)), and is the documented exception lane: when the
    built-in path is an interpreted HOF, a vectorized Arrow batch
    wins (the r11 GEMM precedent). The 6-dp rounding stays JVM-side
    (F.round HALF_UP == DuckDB) — Python's banker's round would
    diverge on exact 1e-7 ties (d/128-style ratios). At 100 TB the
    UDF rides the scan's own partitioning — per-doc work, no state."""
    from .dedup import _nonempty_filter

    docs = load_table(spark, sf_dir, "documents")

    @F.pandas_udf("struct<n:int,d:int>")
    def shingle_counts(words):
        import pandas as pd

        out_n, out_d = [], []
        for w in words:
            w = list(w)
            n = len(w)
            if n >= 3:
                out_n.append(n - 2)
                out_d.append(len(set(zip(w, w[1:], w[2:]))))
            else:
                # matches greatest(size-2, 1): one (possibly
                # padded) shingle, trivially distinct
                out_n.append(1)
                out_d.append(1)
        return pd.DataFrame({"n": out_n, "d": out_d})

    counts = shingle_counts(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+")
    )
    return (
        docs.filter(_nonempty_filter("text"))
        .select("doc_id", counts.alias("c"))
        .select(
            "doc_id",
            F.col("c.n").alias("n_shingles"),
            F.round(
                1 - F.col("c.d").cast("double") / F.col("c.n"), 6
            ).alias("rep_ratio"),
        )
        .orderBy(F.desc("rep_ratio"), "doc_id")
        .limit(20)
    )


@query(
    "tfidf_top_terms",
    oracle="""
    WITH terms AS (
        SELECT DISTINCT doc_id, t.term
        FROM (
            SELECT doc_id,
                   unnest(list_filter(
                       string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> x <> '')) AS term
            FROM documents
        ) t
    ),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS f
        FROM (
            SELECT doc_id,
                   unnest(list_filter(
                       string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> x <> '')) AS term
            FROM documents
        ) raw
        GROUP BY doc_id, term
    ),
    df AS (
        SELECT term, COUNT(*) AS n_docs FROM terms GROUP BY term
    ),
    n AS (SELECT COUNT(*) AS total FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term,
               ROUND(tf.f * ln(CAST(n.total AS DOUBLE) / df.n_docs), 6)
                   AS tfidf
        FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
    ),
    ranked AS (
        SELECT doc_id, term, tfidf,
               ROW_NUMBER() OVER (
                   PARTITION BY doc_id
                   ORDER BY tfidf DESC, term
               ) AS rn
        FROM scored
    )
    SELECT doc_id, term, tfidf FROM ranked WHERE rn <= 3
    ORDER BY doc_id, tfidf DESC, term
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 terms per document — the statistical upgrade of
    the reference's frequency-only keyword extraction
    (metadata_enricher.py:62-89, A15): raw term frequency weighted by
    ln(N/df) so corpus-wide boilerplate scores near zero without a
    hand-maintained stopword list.

    Plan shape: one explode of the token arrays feeds BOTH the
    per-doc tf aggregate and (via per-row distinct terms) the df
    aggregate; df joins back onto tf on the term key with NO forced
    hint — at 100 TB the vocabulary is 10^7-10^8 terms, so AQE
    broadcasts df while it fits and shuffle-joins when it does not
    (r8: a forced broadcast here was the vocab_sizing_curve OOM
    class); the top-k is a per-doc window. At 100 TB df is the only
    global state and it is O(vocabulary) — the classic
    two-aggregate scheme that needs no driver-side vocabulary."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.filter(_words(), lambda x: x != "")
    tokens = docs.select(
        "doc_id", F.explode(w).alias("term")
    )
    tf = tokens.groupBy("doc_id", "term").agg(F.count("*").alias("f"))
    df_counts = (
        docs.select(
            "doc_id", F.explode(F.array_distinct(w)).alias("term")
        )
        .groupBy("term")
        .agg(F.count("*").alias("n_docs"))
    )
    # Corpus size as a broadcast 1-row aggregate folded into the
    # plan (same move as top_decile_mean's threshold): a driver-side
    # docs.count() would be an extra job and a serial barrier before
    # the scoring stage could even be submitted.
    total = docs.agg(F.count("*").cast("double").alias("n_total"))
    scored = (
        tf.join(df_counts, "term")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("f") * F.log(F.col("n_total") / F.col("n_docs")),
                6,
            ).alias("tfidf"),
        )
    )
    from pyspark.sql import Window

    rn = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(
            F.desc("tfidf"), "term"
        )
    )
    return (
        scored.withColumn("rn", rn)
        .filter(F.col("rn") <= 3)
        .drop("rn")
        .orderBy("doc_id", F.desc("tfidf"), "term")
    )


# PII patterns, deliberately lookaround-free so Java regex (Spark) and
# RE2 (DuckDB) agree byte-for-byte. The lake's synthetic text contains
# no real PII; the operator's value is the portable redaction plan.
PII_EMAIL = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
PII_PHONE = "\\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"
PII_IPV4 = (
    "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
)
PII_SSN = "[0-9]{3}-[0-9]{2}-[0-9]{4}"


@query(
    "pii_redaction",
    oracle=f"""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(text, '{PII_EMAIL}', '<EMAIL>', 'g'),
                 '{PII_SSN}', '<SSN>', 'g'),
               '{PII_PHONE}', '<PHONE>', 'g'),
             '{PII_IPV4}', '<IP>', 'g') AS redacted,
           len(regexp_extract_all(text, '{PII_EMAIL}')) AS n_emails,
           len(regexp_extract_all(text, '{PII_SSN}')) AS n_ssns,
           len(regexp_extract_all(text, '{PII_PHONE}')) AS n_phones,
           len(regexp_extract_all(text, '{PII_IPV4}')) AS n_ips
    FROM documents
    ORDER BY doc_id
    """,
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing — the curation stage every training-data
    pipeline runs before text leaves the trust boundary: emails,
    SSN-shaped ids, phone numbers and IPv4 literals are replaced with
    typed placeholders, with per-type match counts kept as audit
    columns (the redaction RATE is itself a quality signal; a doc
    that is mostly PII is usually scraped boilerplate).

    Entirely native regexp_replace/regexp_extract_all — one narrow
    codegen projection, scan-speed at 100 TB, and the redaction order
    (email → SSN → phone → IP) is fixed so overlapping patterns
    resolve identically everywhere. Patterns avoid lookarounds so the
    Java and RE2 engines agree. NO trailing sort: a global orderBy of
    the redacted corpus would be a full shuffle that exists only for
    display; the driver's correctness compare canonicalizes by
    sorting rows itself, and the oracle keeps its ORDER BY only as
    documentation of determinism."""
    docs = load_table(spark, sf_dir, "documents")
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.col("text"), PII_EMAIL, "<EMAIL>"
                ),
                PII_SSN,
                "<SSN>",
            ),
            PII_PHONE,
            "<PHONE>",
        ),
        PII_IPV4,
        "<IP>",
    )

    def n_matches(pat: str):
        return F.size(
            F.regexp_extract_all("text", F.lit(pat), F.lit(0))
        ).cast("long")

    return docs.select(
        "doc_id",
        redacted.alias("redacted"),
        n_matches(PII_EMAIL).alias("n_emails"),
        n_matches(PII_SSN).alias("n_ssns"),
        n_matches(PII_PHONE).alias("n_phones"),
        n_matches(PII_IPV4).alias("n_ips"),
    )


@query(
    "gopher_quality_flags",
    oracle="""
    WITH w AS (
        SELECT doc_id, n_chars,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS words,
               len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS n_symbols,
               len(regexp_extract_all(text, '[a-zA-Z0-9]+')) AS n_alnum_runs
        FROM documents
    ),
    m AS (
        SELECT doc_id, n_chars,
               len(words) AS n_words,
               ROUND(CAST(n_chars AS DOUBLE)
                     / GREATEST(len(words), 1), 4) AS mean_word_len,
               ROUND(CAST(n_symbols AS DOUBLE)
                     / GREATEST(n_alnum_runs, 1), 4) AS symbol_ratio,
               ROUND(CAST(len(list_distinct(words)) AS DOUBLE)
                     / GREATEST(len(words), 1), 4) AS ttr
        FROM w
    )
    SELECT doc_id, n_words, mean_word_len, symbol_ratio, ttr,
           CAST(n_words BETWEEN 50 AND 100000 AS BOOLEAN) AS ok_word_count,
           CAST(mean_word_len BETWEEN 3 AND 10 AS BOOLEAN) AS ok_word_len,
           CAST(symbol_ratio <= 0.1 AS BOOLEAN) AS ok_symbols,
           CAST(ttr >= 0.3 AS BOOLEAN) AS ok_diversity,
           CAST(n_words BETWEEN 50 AND 100000
                AND mean_word_len BETWEEN 3 AND 10
                AND symbol_ratio <= 0.1
                AND ttr >= 0.3 AS BOOLEAN) AS keep
    FROM m
    ORDER BY doc_id
    """,
)
def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, the
    public curation standard): word-count window, mean-word-length
    window, symbol-to-word ratio cap, and a type-token-ratio floor,
    each surfaced as its own flag plus the combined ``keep`` verdict
    — pipelines tune individual thresholds, so per-rule observability
    matters as much as the verdict.

    All four metrics come from ONE narrow projection over the text
    column (no explode, no shuffle except the final presentation
    sort): at 100 TB this runs at scan speed and the flags prune the
    corpus before any expensive downstream stage."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
        lambda x: x != "",
    )
    n_words = F.size(words)
    n_symbols = F.size(
        F.regexp_extract_all("text", F.lit("[^a-zA-Z0-9 ]"), F.lit(0))
    )
    n_alnum = F.size(
        F.regexp_extract_all("text", F.lit("[a-zA-Z0-9]+"), F.lit(0))
    )
    mean_word_len = F.round(
        F.col("n_chars") / F.greatest(n_words, F.lit(1)), 4
    )
    symbol_ratio = F.round(
        n_symbols / F.greatest(n_alnum, F.lit(1)).cast("double"), 4
    )
    ttr = F.round(
        F.size(F.array_distinct(words))
        / F.greatest(n_words, F.lit(1)).cast("double"),
        4,
    )
    ok_wc = (n_words >= 50) & (n_words <= 100000)
    base = docs.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        ttr.alias("ttr"),
        ok_wc.alias("ok_word_count"),
    )
    ok_len = (F.col("mean_word_len") >= 3) & (F.col("mean_word_len") <= 10)
    ok_sym = F.col("symbol_ratio") <= 0.1
    ok_ttr = F.col("ttr") >= 0.3
    return base.select(
        "*",
        ok_len.alias("ok_word_len"),
        ok_sym.alias("ok_symbols"),
        ok_ttr.alias("ok_diversity"),
        (
            F.col("ok_word_count") & ok_len & ok_sym & ok_ttr
        ).alias("keep"),
    )


VOCAB_TOP_K = 24  # corpus vocab is ~31 words; 24 leaves a real OOV tail


@query(
    "vocab_coverage",
    oracle=f"""
    WITH words AS (
        SELECT doc_id, lang, lower(w) AS w
        FROM documents,
             UNNEST(string_split_regex(lower(text), '[^a-z0-9]+'))
                 AS t(w)
        WHERE w <> ''
    ),
    vocab AS (
        SELECT w FROM words
        GROUP BY w
        ORDER BY COUNT(*) DESC, w
        LIMIT {VOCAB_TOP_K}
    )
    SELECT words.lang,
           COUNT(*) AS n_tokens,
           CAST(SUM(CASE WHEN vocab.w IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           ROUND(SUM(CASE WHEN vocab.w IS NULL THEN 1.0 ELSE 0 END)
                 / COUNT(*), 6) AS oov_rate
    FROM words LEFT JOIN vocab ON words.w = vocab.w
    GROUP BY words.lang
    ORDER BY words.lang
    """,
)
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage / out-of-vocabulary rate per language
    against the corpus's own top-VOCAB_TOP_K=24 vocabulary -- the
    tokenizer-fit diagnostic run before committing a vocab: a slice
    with a high OOV rate will fragment into byte-fallback tokens and
    train poorly. In production the vocab list is the tokenizer's;
    here it is derived from the corpus so the query is self-contained.

    Plan shape: one token-frequency groupBy (map-side combined) ->
    top-k (tiny, broadcast back) -> one map-side left join over the
    token stream + per-lang rollup. No shuffle touches the token
    stream except its own frequency aggregation; the vocab side is
    VOCAB_TOP_K rows at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "lang",
        F.explode(
            F.split(F.lower(F.col("text")), "[^a-z0-9]+")
        ).alias("w"),
    ).filter(F.col("w") != "")
    vocab = F.broadcast(
        words.groupBy("w")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "w")
        .limit(VOCAB_TOP_K)
        .select("w", F.lit(True).alias("in_vocab"))
    )
    return (
        words.join(vocab, "w", "left")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(
                F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
            F.round(
                F.sum(
                    F.when(F.col("in_vocab").isNull(), 1.0).otherwise(
                        0.0
                    )
                )
                / F.count("*"),
                6,
            ).alias("oov_rate"),
        )
        .orderBy("lang")
    )


# --- CCNet-style LM quality bucketing -------------------------------------


@query(
    "lm_perplexity_buckets",
    oracle="""
    WITH words AS (
        SELECT doc_id, source,
               list_filter(
                   string_split_regex(lower(text), '[^a-z0-9]+'),
                   x -> x <> ''
               ) AS w
        FROM documents
    ),
    bg AS (
        SELECT doc_id, source,
               w[CAST(t.i AS BIGINT)] AS w1,
               w[CAST(t.i AS BIGINT) + 1] AS w2
        FROM words, UNNEST(range(1, len(w))) AS t(i)
    ),
    cb AS (
        SELECT w1, w2, COUNT(*) AS cb
        FROM bg WHERE source = 'src0'
        GROUP BY w1, w2
    ),
    cu AS (
        SELECT w1, SUM(cb) AS cu FROM cb GROUP BY w1
    ),
    v AS (SELECT COUNT(*) AS v FROM cu),
    scored AS (
        SELECT b.doc_id,
               COUNT(*) AS n_bigrams,
               ROUND(AVG(-ln(
                   (COALESCE(cb.cb, 0) + 1.0)
                   / (COALESCE(cu.cu, 0) + v.v)
               )), 6) AS avg_nll
        FROM bg b
        LEFT JOIN cb ON b.w1 = cb.w1 AND b.w2 = cb.w2
        LEFT JOIN cu ON b.w1 = cu.w1
        CROSS JOIN v
        GROUP BY b.doc_id
    ),
    cuts AS (
        SELECT quantile_cont(avg_nll, CAST(1 AS DOUBLE)/3) AS c1,
               quantile_cont(avg_nll, CAST(2 AS DOUBLE)/3) AS c2
        FROM scored
    )
    SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams, avg_nll,
           CASE WHEN avg_nll <= c1 THEN 'head'
                WHEN avg_nll <= c2 THEN 'middle'
                ELSE 'tail' END AS ppl_bucket
    FROM scored CROSS JOIN cuts
    ORDER BY doc_id
    """,
)
def lm_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style language-model quality bucketing (Wenzek et al.
    2020): train a Laplace-smoothed bigram model on a trusted slice
    (``source = 'src0'`` plays Wikipedia), score every document by its
    average negative log-likelihood, and split the corpus into
    head / middle / tail thirds — the buckets CCNet uses to keep the
    head, sample the middle, and drop the tail before LM training.
    The reference has no model-based quality gate at all; its quality
    score is rule-arithmetic (databias/bias_detection_engine.py) —
    this is the learned-statistics upgrade, with the 5-gram KenLM of
    the paper swapped for a bigram model the engine can train
    IN-PLANE: counts are plain aggregates, so "training" is two
    groupBys and no Python.

    Shape at 100 TB: bigram/context counts shuffle on the word keys
    (Zipf skew is bounded — each bucket is a scalar count, never a
    pair expansion); scoring is a shuffled LEFT JOIN of exploded doc
    bigrams against the count tables (AQE broadcasts them while they
    fit; at web-corpus vocabulary they stay shuffled — no forced
    hint); the smoothing denominator V rides a 1-row scalar broadcast.
    Bucketing is THRESHOLD-based, never rank-based: the two tertile
    cutoffs are a 1-row exact-`percentile` aggregate (its partial
    state is a count-map over DISTINCT 6-dp scores — bounded, fully
    distributed) broadcast back over the doc-grain rows, so no
    per-document row ever passes through an unpartitioned WindowExec.
    Scores are rounded to 6 dp BEFORE the cutoff computation on BOTH
    engines, and the cutoffs either equal a data value exactly (both
    engines return the order statistic verbatim) or fall strictly
    inside a >=1e-6-wide gap between adjacent rounded scores — so fp
    noise in the interpolation cannot flip a bucket. Ties at a cutoff
    share a bucket (CCNet semantics: the bucket is a quality BAND,
    not an exact third). At web scale swap `percentile` for
    `percentile_approx` — the cutoffs stop being exact but the plan
    shape is already the scalable one."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
        lambda x: x != F.lit(""),
    )
    # Adjacent-pair array as a zip of two shifted slices — NO lambda:
    # a transform(sequence, i -> struct(get, get)) formulation does
    # per-element interpreted evaluation and measured 12x slower at
    # sf0.1; slice+arrays_zip are single native expressions over the
    # whole array. A 0/1-token doc yields length-0 slices -> empty
    # zip, no padding to filter.
    ln = F.greatest(F.size(w) - 1, F.lit(0))
    bigram_arr = F.arrays_zip(
        F.slice(w, 1, ln).alias("w1"), F.slice(w, 2, ln).alias("w2")
    )
    bg = docs.select(
        "doc_id", "source", F.explode(bigram_arr).alias("b")
    ).select("doc_id", "source", "b.w1", "b.w2")
    cb = (
        bg.filter(F.col("source") == "src0")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("cb"))
    )
    cu = cb.groupBy("w1").agg(F.sum("cb").alias("cu"))
    v = cu.agg(F.count("*").alias("v"))
    # Probe with 8-byte xxhash64 keys instead of the string pairs:
    # the scoring side carries two longs per bigram occurrence through
    # the joins rather than the words themselves (measured ~25% off
    # the whole query; equality classes unchanged short of a 2^-64
    # collision). The count tables keep their string keys — they are
    # the model and stay readable.
    cbk = cb.select(F.xxhash64("w1", "w2").alias("bk"), "cb")
    cuk = cu.select(F.xxhash64("w1").alias("uk"), "cu")
    scored = (
        bg.select(
            "doc_id",
            F.xxhash64("w1", "w2").alias("bk"),
            F.xxhash64("w1").alias("uk"),
        )
        .join(cbk, "bk", "left")
        .join(cuk, "uk", "left")
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(
                F.avg(
                    -F.log(
                        (F.coalesce(F.col("cb"), F.lit(0)) + F.lit(1.0))
                        / (
                            F.coalesce(F.col("cu"), F.lit(0))
                            + F.col("v")
                        )
                    )
                ),
                6,
            ).alias("avg_nll"),
        )
    )
    cuts = scored.agg(
        F.expr(
            "percentile(avg_nll, array(cast(1 as double)/3,"
            " cast(2 as double)/3))"
        ).alias("cs")
    ).select(
        F.col("cs")[0].alias("_c1"), F.col("cs")[1].alias("_c2")
    )
    return (
        scored.crossJoin(F.broadcast(cuts))
        .withColumn(
            "ppl_bucket",
            F.when(F.col("avg_nll") <= F.col("_c1"), "head")
            .when(F.col("avg_nll") <= F.col("_c2"), "middle")
            .otherwise("tail"),
        )
        .drop("_c1", "_c2")
    )


ZIPF_HEAD_RANKS = 100


@query(
    "zipf_alpha_fit",
    oracle=f"""
    WITH tok AS (
        SELECT lang, t.w
        FROM (
            SELECT lang,
                   list_filter(
                       string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> x <> ''
                   ) AS ws
            FROM documents
        ), UNNEST(ws) AS t(w)
    ),
    wc AS (
        SELECT lang, w, COUNT(*) AS c FROM tok GROUP BY lang, w
    ),
    ranked AS (
        SELECT lang, c,
               ROW_NUMBER() OVER (
                   PARTITION BY lang ORDER BY c DESC, w
               ) AS r
        FROM wc
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_ranks,
           ROUND(-REGR_SLOPE(ln(CAST(c AS DOUBLE)),
                             ln(CAST(r AS DOUBLE))), 6) AS zipf_alpha,
           ROUND(REGR_R2(ln(CAST(c AS DOUBLE)),
                         ln(CAST(r AS DOUBLE))), 6) AS fit_r2
    FROM ranked
    WHERE r <= {ZIPF_HEAD_RANKS}
    GROUP BY lang
    ORDER BY lang
    """,
)
def zipf_alpha_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-exponent fit per language: OLS slope of ln(frequency)
    against ln(rank) over the top-ZIPF_HEAD_RANKS=100 word ranks —
    natural language sits near alpha = 1, so a slice whose alpha
    collapses toward 0 (flat head = keyword stuffing / template spam)
    or blows past ~1.5 (a few tokens dominating = boilerplate
    repetition) is machine-generated or corrupted BEFORE any
    model-based scorer runs. The corpus-shape sibling of
    [[vocab_coverage]]'s OOV rate and the distribution-level check
    the reference's rule-based quality score cannot see.

    One token-count aggregation (shuffle on (lang, word), uniform),
    one per-lang ranking window over the COUNTS table (vocab-sized,
    not corpus-sized), and REGR_* streaming accumulators over the
    ZIPF_HEAD_RANKS-row head per language — map-side combinable,
    nothing driver-side."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "lang",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                lambda x: x != F.lit(""),
            )
        ).alias("w"),
    )
    wc = tok.groupBy("lang", "w").agg(F.count("*").alias("c"))
    ranked = wc.withColumn(
        "r",
        F.row_number().over(
            Window.partitionBy("lang").orderBy(F.desc("c"), "w")
        ),
    ).filter(F.col("r") <= ZIPF_HEAD_RANKS)
    lnc = F.log(F.col("c").cast("double"))
    lnr = F.log(F.col("r").cast("double"))
    return (
        ranked.groupBy("lang")
        .agg(
            F.count("*").alias("n_ranks"),
            F.round(-F.regr_slope(lnc, lnr), 6).alias("zipf_alpha"),
            F.round(F.regr_r2(lnc, lnr), 6).alias("fit_r2"),
        )
        .orderBy("lang")
    )


# --- Token-entropy quality signal ------------------------------------------


@query(
    "token_entropy",
    oracle="""
    WITH words AS (
        SELECT doc_id, unnest(list_filter(
            string_split_regex(lower(text), '[^a-z0-9]+'),
            x -> x <> ''
        )) AS word
        FROM documents
    ),
    wc AS (
        SELECT doc_id, word, COUNT(*) AS c
        FROM words GROUP BY doc_id, word
    )
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           ROUND(ln(SUM(c)) - SUM(c * ln(c)) / SUM(c), 6) AS entropy
    FROM wc
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram Shannon entropy — the information-density
    quality gate that catches what ratio rules miss: keyword-stuffed
    spam and template boilerplate score LOW (a few tokens dominate),
    MT gibberish and encoding garbage score anomalously HIGH for
    their length. Used alongside gopher_quality_flags /
    doc_repetition the way CCNet-era pipelines pair perplexity with
    repetition filters; the reference's quality score is length/null
    arithmetic only (databias/bias_detection_engine.py) — entropy is
    the distribution-shape upgrade at token grain, complementing
    zipf_alpha_fit's corpus grain.

    H = -sum(p_w ln p_w) is computed in the algebraically stable
    form ln(n) - sum(c ln c)/n, so ONE aggregate over per-doc word
    counts suffices. Shape at 100 TB: groupBy(doc_id, word) then
    groupBy(doc_id) — both shuffles keyed per document (bounded by
    doc length, no corpus-wide hot key; partial map-side combine
    collapses each doc's words before the exchange). Entropy is
    rounded to 6 dp on both engines (float contract)."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
        lambda x: x != F.lit(""),
    )
    wc = (
        docs.select("doc_id", F.explode(w).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("c"))
    )
    n = F.sum("c")
    return (
        wc.groupBy("doc_id")
        .agg(
            n.cast("bigint").alias("n_tokens"),
            F.count("*").alias("n_distinct"),
            F.round(
                F.log(n) - F.sum(F.col("c") * F.log("c")) / n, 6
            ).alias("entropy"),
        )
    )


# --- Corpus datacard -------------------------------------------------------


@query(
    "corpus_datacard",
    oracle="""
    WITH words AS (
        SELECT doc_id, source, lang, n_chars,
               len(list_filter(
                   string_split_regex(lower(text), '[^a-z0-9]+'),
                   x -> x <> ''
               )) AS n_tokens,
               md5(lower(text)) AS content_hash
        FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           COUNT(DISTINCT lang) AS n_langs,
           ROUND(quantile_cont(n_tokens, 0.50), 4) AS p50_tokens,
           ROUND(quantile_cont(n_tokens, 0.90), 4) AS p90_tokens,
           ROUND(1.0 - COUNT(DISTINCT content_hash)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS exact_dup_rate
    FROM words
    GROUP BY source
    ORDER BY source
    """,
)
def corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-source corpus DATACARD in one pass: volume (docs,
    tokens, chars), language breadth, length distribution (exact
    p50/p90 token quantiles) and exact-duplicate rate — the summary
    table every training-data release publishes (Dodge et al.'s C4
    audit, the Pile/Dolma datasheets) and the first thing a curator
    reads before touching mixture weights. The reference publishes
    no corpus-level summary at all; its stats are per-run validator
    thresholds.

    One groupBy(source) carries every aggregate: counts and sums are
    plain partial aggregates, the token quantiles buffer per group
    (documented percentile_approx swap at lake scale, as in
    quantiles_by_group), and the dup rate rides COUNT(DISTINCT
    content_hash) — Catalyst expands distinct aggregates into a
    two-level aggregation keyed on (source, hash): shuffle-bounded,
    uniform keys, no pair expansion."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
        lambda x: x != F.lit(""),
    )
    base = docs.select(
        "source",
        "lang",
        "n_chars",
        F.size(w).alias("n_tokens"),
        F.md5(F.lower(F.col("text"))).alias("content_hash"),
    )
    qs = F.percentile("n_tokens", F.array(F.lit(0.5), F.lit(0.9)))
    return (
        base.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.countDistinct("lang").alias("n_langs"),
            qs.alias("qs"),
            F.countDistinct("content_hash").alias("n_distinct"),
        )
        .select(
            "source",
            "n_docs",
            "total_tokens",
            "total_chars",
            "n_langs",
            F.round(F.col("qs")[0], 4).alias("p50_tokens"),
            F.round(F.col("qs")[1], 4).alias("p90_tokens"),
            F.round(
                F.lit(1.0)
                - F.col("n_distinct") / F.col("n_docs").cast("double"),
                6,
            ).alias("exact_dup_rate"),
        )
        .orderBy("source")
    )


@query(
    "lang_confusion_matrix",
    oracle=f"""
    WITH words AS (
        SELECT lang,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS w
        FROM documents
    ),
    pred AS (
        SELECT lang,
               CASE WHEN CAST(len(list_filter(w,
                   x -> list_contains({list(STOPWORDS)!r}, x))) AS DOUBLE)
                   / GREATEST(len(w), 1) >= 0.05
                    THEN 'en' ELSE 'other' END AS predicted_lang
        FROM words
    )
    SELECT lang, predicted_lang,
           COUNT(*) AS n,
           ROUND(COUNT(*) / CAST(SUM(COUNT(*)) OVER (
               PARTITION BY lang
           ) AS DOUBLE), 6) AS share_of_lang
    FROM pred
    GROUP BY lang, predicted_lang
    ORDER BY lang, predicted_lang
    """,
)
def lang_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the language-ID heuristic against the
    labeled ``lang`` column — the EVALUATION every classifier-driven
    filter owes its users before anyone trusts its keep decisions
    (a language filter that silently drops 30% of German is a
    mixture bug that only a per-label share table surfaces). Rows:
    (label, prediction, count, share-of-label). The reference
    evaluates none of its heuristics; this is the audit table.

    Shape: the per-doc prediction is in-row arithmetic; one
    groupBy(lang, predicted) whose output is |langs| x 2 rows, then
    an unpartitioned-window normalizer over that tiny table."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
        lambda x: x != F.lit(""),
    )
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    ratio = F.size(
        F.filter(w, lambda x: F.array_contains(stop_arr, x))
    ).cast("double") / F.greatest(F.size(w), F.lit(1))
    pred = docs.select(
        "lang",
        F.when(ratio >= 0.05, "en").otherwise("other").alias(
            "predicted_lang"
        ),
    )
    per_lang = Window.partitionBy("lang")
    counted = pred.groupBy("lang", "predicted_lang").agg(
        F.count("*").alias("n")
    )
    return (
        counted.select(
            "lang",
            "predicted_lang",
            "n",
            F.round(
                F.col("n") / F.sum("n").over(per_lang).cast("double"), 6
            ).alias("share_of_lang"),
        )
        .orderBy("lang", "predicted_lang")
    )


@query(
    "filter_attrition_funnel",
    oracle="""
    WITH w AS (
        SELECT doc_id, n_chars,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS words,
               len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS n_symbols,
               len(regexp_extract_all(text, '[a-zA-Z0-9]+')) AS n_alnum_runs
        FROM documents
    ),
    m AS (
        SELECT len(words) AS n_words,
               ROUND(CAST(n_chars AS DOUBLE)
                     / GREATEST(len(words), 1), 4) AS mean_word_len,
               ROUND(CAST(n_symbols AS DOUBLE)
                     / GREATEST(n_alnum_runs, 1), 4) AS symbol_ratio,
               ROUND(CAST(len(list_distinct(words)) AS DOUBLE)
                     / GREATEST(len(words), 1), 4) AS ttr
        FROM w
    ),
    f AS (
        SELECT n_words,
               n_words BETWEEN 50 AND 100000 AS ok1,
               mean_word_len BETWEEN 3 AND 10 AS ok2,
               symbol_ratio <= 0.1 AS ok3,
               ttr >= 0.3 AS ok4
        FROM m
    ),
    a AS (
        SELECT CAST(count(*) AS BIGINT) AS d0,
               CAST(COALESCE(sum(n_words), 0) AS BIGINT) AS w0,
               CAST(count(*) FILTER (WHERE ok1) AS BIGINT) AS d1,
               CAST(COALESCE(sum(n_words) FILTER (WHERE ok1), 0)
                    AS BIGINT) AS w1,
               CAST(count(*) FILTER (WHERE ok1 AND ok2) AS BIGINT) AS d2,
               CAST(COALESCE(sum(n_words) FILTER (WHERE ok1 AND ok2), 0)
                    AS BIGINT) AS w2,
               CAST(count(*) FILTER (WHERE ok1 AND ok2 AND ok3)
                    AS BIGINT) AS d3,
               CAST(COALESCE(
                    sum(n_words) FILTER (WHERE ok1 AND ok2 AND ok3), 0)
                    AS BIGINT) AS w3,
               CAST(count(*) FILTER (WHERE ok1 AND ok2 AND ok3 AND ok4)
                    AS BIGINT) AS d4,
               CAST(COALESCE(
                    sum(n_words)
                        FILTER (WHERE ok1 AND ok2 AND ok3 AND ok4), 0)
                    AS BIGINT) AS w4
        FROM f
    )
    SELECT stage_idx, stage, docs, words,
           ROUND(CAST(docs AS DOUBLE) / GREATEST(d0, 1), 6) AS doc_share,
           ROUND(CAST(words AS DOUBLE) / GREATEST(w0, 1), 6)
               AS word_share
    FROM (
        SELECT 0 AS stage_idx, 'ingest' AS stage,
               d0 AS docs, w0 AS words, d0, w0 FROM a
        UNION ALL SELECT 1, 'word_count', d1, w1, d0, w0 FROM a
        UNION ALL SELECT 2, 'word_len', d2, w2, d0, w0 FROM a
        UNION ALL SELECT 3, 'symbols', d3, w3, d0, w0 FROM a
        UNION ALL SELECT 4, 'diversity', d4, w4, d0, w0 FROM a
    )
    ORDER BY stage_idx
    """,
)
def filter_attrition_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stage attrition funnel through the Gopher quality gates —
    the curation deliverable every corpus release publishes next to
    the rules themselves (C4 / RefinedWeb / Dolma report exactly this
    table): after each gate applied IN ORDER, how many documents and
    how much token mass survive, as counts and as shares of ingest.
    `gopher_quality_flags` gives per-document observability; this
    gives the corpus-level cost of each threshold, which is what a
    curator tunes against.

    Scale shape: the same ONE narrow scan as the flags query (no
    explode), folded into a single 1-row aggregate of conditional
    sums, then `stack`ed into 5 presentation rows on the driver-side
    1-row result — corpus-size-independent memory past the scan, no
    shuffle except the 1-row agg exchange. At 100 TB this is the
    cheapest possible full-corpus pass."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
        lambda x: x != "",
    )
    n_words = F.size(words)
    n_symbols = F.size(
        F.regexp_extract_all("text", F.lit("[^a-zA-Z0-9 ]"), F.lit(0))
    )
    n_alnum = F.size(
        F.regexp_extract_all("text", F.lit("[a-zA-Z0-9]+"), F.lit(0))
    )
    mean_word_len = F.round(
        F.col("n_chars") / F.greatest(n_words, F.lit(1)), 4
    )
    symbol_ratio = F.round(
        n_symbols / F.greatest(n_alnum, F.lit(1)).cast("double"), 4
    )
    ttr = F.round(
        F.size(F.array_distinct(words))
        / F.greatest(n_words, F.lit(1)).cast("double"),
        4,
    )
    f = docs.select(
        n_words.cast("long").alias("n_words"),
        ((n_words >= 50) & (n_words <= 100000)).alias("ok1"),
        mean_word_len.between(3, 10).alias("ok2"),
        (symbol_ratio <= 0.1).alias("ok3"),
        (ttr >= 0.3).alias("ok4"),
    )

    def surv(cond, tag):
        return [
            F.count(F.when(cond, True)).alias(f"d{tag}"),
            F.coalesce(
                F.sum(F.when(cond, F.col("n_words"))), F.lit(0)
            ).alias(f"w{tag}"),
        ]

    keep1 = F.col("ok1")
    keep2 = keep1 & F.col("ok2")
    keep3 = keep2 & F.col("ok3")
    keep4 = keep3 & F.col("ok4")
    agg = f.agg(
        F.count(F.lit(1)).alias("d0"),
        F.coalesce(F.sum("n_words"), F.lit(0)).alias("w0"),
        *surv(keep1, "1"),
        *surv(keep2, "2"),
        *surv(keep3, "3"),
        *surv(keep4, "4"),
    )
    staged = agg.select(
        F.expr(
            "stack(5,"
            " 0, 'ingest',     d0, w0,"
            " 1, 'word_count', d1, w1,"
            " 2, 'word_len',   d2, w2,"
            " 3, 'symbols',    d3, w3,"
            " 4, 'diversity',  d4, w4"
            ") AS (stage_idx, stage, docs, words)"
        ),
        "d0",
        "w0",
    )
    return staged.select(
        "stage_idx",
        "stage",
        "docs",
        "words",
        F.round(
            F.col("docs") / F.greatest(F.col("d0"), F.lit(1)).cast("double"),
            6,
        ).alias("doc_share"),
        F.round(
            F.col("words")
            / F.greatest(F.col("w0"), F.lit(1)).cast("double"),
            6,
        ).alias("word_share"),
    ).orderBy("stage_idx")


BM25_TERMS = ("hash", "join", "vector")
BM25_K1 = 1.2
BM25_B = 0.75


def bm25_rank(
    docs: DataFrame,
    terms=BM25_TERMS,
    k1: float = BM25_K1,
    b: float = BM25_B,
    top_k: int = 20,
) -> DataFrame:
    """DataFrame-level Okapi BM25 (Lucene non-negative idf) over a
    ``doc_id``/``text`` frame for a fixed term set — the library core
    behind the ``bm25_search`` registry query; see its docstring for
    the inverted-index scale shape. Returns top_k rows of
    (doc_id, matched_terms, score) with scores rounded to 6 dp before
    the rank and doc_id tie-breaks."""
    from ..sources.tables import spread_small_source

    docs = spread_small_source(docs)
    words = F.array_remove(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"), ""
    )
    base = docs.select(
        "doc_id", words.alias("words"), F.size(words).alias("dl")
    )
    stats = F.broadcast(
        base.agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.avg("dl").alias("avgdl"),
        )
    )
    tf = (
        base.select("doc_id", "dl", F.explode("words").alias("term"))
        .filter(F.col("term").isin(*terms))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    df = F.broadcast(
        tf.groupBy("term").agg(
            F.countDistinct("doc_id").cast("double").alias("df")
        )
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + k1 * (
        1.0 - b + b * F.col("dl") / F.col("avgdl")
    )
    term_score = idf * F.col("tf") * (k1 + 1.0) / denom
    return (
        tf.join(df, "term")
        .crossJoin(stats)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("matched_terms"),
            F.round(F.sum(term_score), 6).alias("score"),
        )
        .orderBy(F.desc("score"), "doc_id")
        .limit(top_k)
    )


@query(
    "bm25_search",
    oracle=f"""
    WITH d AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS words
        FROM documents
    ),
    dl AS (SELECT doc_id, len(words) AS dl, words FROM d),
    s AS (
        SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl
    ),
    tf AS (
        SELECT doc_id, dl, term, CAST(count(*) AS DOUBLE) AS tf
        FROM (SELECT doc_id, dl, unnest(words) AS term FROM dl)
        WHERE term IN ('hash', 'join', 'vector')
        GROUP BY 1, 2, 3
    ),
    df AS (
        SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
        FROM tf GROUP BY 1
    )
    SELECT tf.doc_id,
           CAST(count(*) AS BIGINT) AS matched_terms,
           ROUND(SUM(
               ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
               * tf.tf * ({BM25_K1} + 1)
               / (tf.tf + {BM25_K1}
                  * (1 - {BM25_B} + {BM25_B} * tf.dl / s.avgdl))
           ), 6) AS score
    FROM tf JOIN df USING (term), s
    GROUP BY tf.doc_id
    ORDER BY score DESC, doc_id
    LIMIT 20
    """,
)
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical retrieval over the corpus: Okapi BM25 (Robertson's
    formula with Lucene's non-negative idf) for a fixed conjunctive
    term set, top-20 by score — the keyword-search complement of
    `cosine_topk`'s dense retrieval; production search is exactly this
    pair plus a fusion step.

    Scale shape is the inverted-index one: ONE tokenize+explode scan
    whose term filter is pushed directly above the generate (posting
    lists for the query terms only survive), a (doc,term) count
    shuffle, a |terms|-row document-frequency broadcast joined back,
    and the corpus stats (N, avg doc length) as a 1-row scalar
    broadcast — no per-document table ever ships. Scores are rounded
    to 6 dp BEFORE the rank/limit and tie-broken by doc_id, so ULP
    differences between JVM and libm ln() can't reorder the top-k."""
    return bm25_rank(load_table(spark, sf_dir, "documents"))


def _rep_cte(n: int) -> str:
    """DuckDB CTE trio for within-doc duplicated n-gram coverage."""
    return f"""
    g{n} AS (
        SELECT doc_id, i AS pos, len(w) AS nw,
               array_to_string(list_slice(w, i, i + {n - 1}), ' ') AS g
        FROM words,
             UNNEST(range(1, greatest(len(w) - {n - 2}, 2))) AS t(i)
        WHERE array_to_string(list_slice(w, i, i + {n - 1}), ' ') <> ''
    ),
    d{n} AS (
        SELECT doc_id, g FROM g{n}
        GROUP BY doc_id, g HAVING COUNT(*) >= 2
    ),
    c{n} AS (
        SELECT DISTINCT x.doc_id, p
        FROM g{n} x
        JOIN d{n} d ON x.doc_id = d.doc_id AND x.g = d.g,
        UNNEST(range(x.pos, least(x.pos + {n - 1}, x.nw) + 1)) AS c(p)
    ),
    r{n} AS (SELECT doc_id, COUNT(*) AS cov FROM c{n} GROUP BY doc_id)"""


@query(
    "gopher_repetition_ratios",
    oracle=f"""
    WITH words AS (
        SELECT doc_id,
               list_filter(
                   string_split_regex(lower(text), '[^a-z0-9]+'),
                   x -> x <> ''
               ) AS w
        FROM documents
    ),{_rep_cte(2)},{_rep_cte(3)}
    SELECT w.doc_id,
           CAST(len(w.w) AS BIGINT) AS n_words,
           ROUND(COALESCE(r2.cov, 0) * 1.0
                 / greatest(len(w.w), 1), 6) AS dup2_ratio,
           ROUND(COALESCE(r3.cov, 0) * 1.0
                 / greatest(len(w.w), 1), 6) AS dup3_ratio
    FROM words w
    LEFT JOIN r2 ON w.doc_id = r2.doc_id
    LEFT JOIN r3 ON w.doc_id = r3.doc_id
    ORDER BY w.doc_id
    """,
)
def gopher_repetition_ratios(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """WITHIN-document repetition, the Gopher/MassiveText "fraction
    of content in duplicate n-grams" family (Rae et al. 2021, Table
    A1): for n = 2 and 3, the fraction of word POSITIONS covered by
    an n-gram occurring at least twice in the SAME document. High
    ratios flag degenerate text — keyword stuffing, boilerplate
    loops, decode failures — that per-corpus dedup never sees
    because the repetition is internal. Complements
    `doc_repetition_topk` (which ranks docs by one shingle stat)
    with the per-doc coverage ratios Gopher actually thresholds on,
    and `boilerplate_phrase_stats` (cross-corpus phrases) with the
    within-doc grain.

    Scale shape: everything is keyed on doc_id — the n-gram
    explode, the per-(doc, gram) duplicate count, the position
    coverage union, and the final rollup all shuffle on the document
    key (or run map-side after the first doc-keyed exchange), so the
    operator is embarrassingly doc-parallel: no corpus-wide state,
    no broadcast, no window. Gram construction is the portable
    slice/concat form shared with the shingle oracles, so coverage
    is value-verified in DuckDB."""
    from ..sources.tables import spread_small_source

    docs = spread_small_source(load_table(spark, sf_dir, "documents"))
    w = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
        lambda x: x != F.lit(""),
    )
    base = docs.select("doc_id", w.alias("w")).select(
        "doc_id", "w", F.size("w").alias("nw")
    )

    def covered(n: int) -> DataFrame:
        # r12 (guide §2.3/§2.4): the previous form generated the gram
        # stream TWICE (once into a (doc, g) count aggregate, once as
        # the probe side of a join back on (doc, g)) and then paid a
        # (doc, p) distinct exchange. One window count over the same
        # keys marks duplicate grams in a single pass of one gram
        # stream, and the coverage union collapses into the final
        # doc-grain aggregate (distinct positions == size of the
        # deduped flattened span list; per-doc arrays are bounded by
        # doc length x n). 2 gram generations + 3 exchanges -> 1
        # generation + 2 exchanges; oracle MATCH re-verified at both
        # scales.
        grams = (
            base.select(
                "doc_id",
                "nw",
                F.explode(
                    F.filter(
                        F.transform(
                            F.sequence(
                                F.lit(1),
                                F.greatest(
                                    F.col("nw") - (n - 1), F.lit(1)
                                ),
                            ),
                            lambda i: F.struct(
                                i.alias("pos"),
                                F.concat_ws(
                                    " ", F.slice("w", i, n)
                                ).alias("g"),
                            ),
                        ),
                        lambda s: s["g"] != F.lit(""),
                    )
                ).alias("e"),
            )
            .select("doc_id", "nw", "e.pos", "e.g")
        )
        dup_occ = (
            grams.withColumn(
                "c",
                F.count("*").over(
                    Window.partitionBy("doc_id", "g")
                ),
            )
            .filter(F.col("c") >= 2)
        )
        return (
            dup_occ.select(
                "doc_id",
                F.sequence(
                    F.col("pos"),
                    F.least(F.col("pos") + (n - 1), F.col("nw")),
                ).alias("span"),
            )
            .groupBy("doc_id")
            .agg(
                F.size(
                    F.array_distinct(
                        F.flatten(F.collect_list("span"))
                    )
                ).alias(f"cov{n}")
            )
        )

    ratio = lambda c: F.round(  # noqa: E731
        F.coalesce(c, F.lit(0))
        * 1.0
        / F.greatest(F.col("nw"), F.lit(1)),
        6,
    )
    return (
        base.select("doc_id", "nw")
        .join(covered(2), "doc_id", "left")
        .join(covered(3), "doc_id", "left")
        .select(
            "doc_id",
            F.col("nw").cast("long").alias("n_words"),
            ratio(F.col("cov2")).alias("dup2_ratio"),
            ratio(F.col("cov3")).alias("dup3_ratio"),
        )
    )


NPMI_MIN_COUNT = 5


@query(
    "word_collocation_npmi",
    oracle=f"""
    WITH words AS (
        SELECT doc_id,
               list_filter(
                   string_split_regex(lower(text), '[^a-z0-9]+'),
                   x -> x <> ''
               ) AS w
        FROM documents
    ),
    bg AS (
        SELECT w[i] AS w1, w[i + 1] AS w2
        FROM words, UNNEST(range(1, greatest(len(w), 2))) AS t(i)
        WHERE i < len(w)
    ),
    pc AS (
        SELECT w1, w2, COUNT(*) AS c FROM bg GROUP BY w1, w2
    ),
    uc AS (
        SELECT w1 AS wrd, SUM(c) AS u FROM pc GROUP BY w1
    ),
    n AS (SELECT SUM(c) AS n FROM pc),
    scored AS (
        SELECT p.w1, p.w2, p.c,
               ROUND(
                   ln((p.c * n.n * 1.0) / (a.u * b.u))
                   / (-ln(p.c * 1.0 / n.n)), 6) AS npmi
        FROM pc p
        JOIN uc a ON p.w1 = a.wrd
        JOIN uc b ON p.w2 = b.wrd
        CROSS JOIN n
        WHERE p.c >= {NPMI_MIN_COUNT}
    )
    SELECT w1, w2, CAST(c AS BIGINT) AS n_cooccur, npmi
    FROM scored
    ORDER BY npmi DESC, w1, w2
    LIMIT 20
    """,
)
def word_collocation_npmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phrase mining via normalized pointwise mutual information
    (Bouma 2009): the top word bigrams whose co-occurrence beats
    chance, NPMI-normalized to [-1, 1] so scores are comparable
    across corpus sizes — the statistic used to decide which word
    pairs become single tokenizer units ("new york"-style merges,
    the data-driven complement of `bpe_merge_ranks`' frequency-only
    merges) and to seed stop-phrase lists. Word-level sibling of
    `copurchase_pmi_topk` (items in baskets there, adjacent words
    here); the min-count gate keeps one-off typo pairs out of the
    numerator.

    Shape: bigram explode -> one (w1, w2) count shuffle (map-side
    combinable, Zipf skew bounded because each key is a scalar
    count), unigram marginals re-aggregated FROM the pair counts
    (no second corpus pass), 1-row total broadcast, TakeOrdered
    top-20. ln() ratios of integer counts agree across engines;
    scores rounded before the rank."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
        lambda x: x != F.lit(""),
    )
    ln_ = F.greatest(F.size("w") - 1, F.lit(0))
    bg_arr = F.arrays_zip(
        F.slice("w", 1, ln_).alias("w1"),
        F.slice("w", 2, ln_).alias("w2"),
    )
    bg = docs.select(w.alias("w")).select(
        F.explode(bg_arr).alias("b")
    ).select("b.w1", "b.w2")
    pc = bg.groupBy("w1", "w2").agg(F.count("*").alias("c"))
    uc = pc.groupBy(F.col("w1").alias("wrd")).agg(
        F.sum("c").alias("u")
    )
    n = pc.agg(F.sum("c").alias("n"))
    pmi = F.log(
        F.col("c") * F.col("n") * 1.0 / (F.col("ua") * F.col("ub"))
    )
    denom = -F.log(F.col("c") * 1.0 / F.col("n"))
    return (
        pc.filter(F.col("c") >= NPMI_MIN_COUNT)
        .join(
            uc.select(F.col("wrd").alias("w1"), F.col("u").alias("ua")),
            "w1",
        )
        .join(
            uc.select(F.col("wrd").alias("w2"), F.col("u").alias("ub")),
            "w2",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "w1",
            "w2",
            F.col("c").cast("long").alias("n_cooccur"),
            F.round(pmi / denom, 6).alias("npmi"),
        )
        .orderBy(F.desc("npmi"), "w1", "w2")
        .limit(20)
    )


@query(
    "tokenizer_fertility_by_lang",
    oracle="""
    WITH per_doc AS (
        SELECT lang,
               len(regexp_extract_all(text,
                   '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS toks,
               length(text) AS chars
        FROM documents
        WHERE length(text) > 0
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(toks) AS BIGINT) AS total_tokens,
           ROUND(SUM(toks) * 1.0 / SUM(chars), 6) AS fertility,
           ROUND(quantile_cont(ROUND(toks * 1.0 / chars, 6), 0.5), 6)
               AS p50_fertility
    FROM per_doc
    GROUP BY lang
    ORDER BY lang
    """,
)
def tokenizer_fertility_by_lang(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Tokenizer fertility (tokens per character) per language — the
    multilingual-budget report: languages a tokenizer segments
    poorly consume disproportionate sequence length per unit of
    text, so mixture weights and per-language token budgets key on
    exactly this table (the per-corpus rollup of token_counts'
    per-doc accounting, with the same portable BPE-ish lexer).

    Scale shape: the regex lex is per-row codegen over a two-column
    scan; one lang-grain aggregate (map-side partials); the median
    is the exact-`percentile` fold whose partial state is a
    count-map over distinct 6 dp ratios — swap for
    percentile_approx at web scale, same plan."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.size(
        F.regexp_extract_all(
            "text", F.lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), F.lit(0)
        )
    )
    per_doc = docs.filter(F.length("text") > 0).select(
        "lang",
        toks.cast("long").alias("toks"),
        F.length("text").cast("long").alias("chars"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("toks").alias("total_tokens"),
            F.round(
                F.sum("toks") / F.sum("chars").cast("double"), 6
            ).alias("fertility"),
            F.round(
                F.expr(
                    "percentile(round(toks * 1.0 / chars, 6), 0.5)"
                ),
                6,
            ).alias("p50_fertility"),
        )
        .orderBy("lang")
    )


@query(
    "readability_scores",
    oracle="""
    WITH base AS (
        SELECT doc_id,
               GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1)
                   AS n_sentences,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS w,
               len(regexp_extract_all(lower(text), '[aeiouy]+'))
                   AS vowel_groups
        FROM documents
    ),
    counted AS (
        SELECT doc_id, n_sentences,
               len(w) AS n_words,
               vowel_groups
               + len(w)
               - len(list_filter(w, x -> regexp_matches(x, '[aeiouy]')))
                   AS n_syllables
        FROM base
        WHERE len(w) > 0
    )
    SELECT doc_id, CAST(n_sentences AS BIGINT) AS n_sentences,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(n_syllables AS BIGINT) AS n_syllables,
           ROUND(206.835 - 1.015 * (n_words * 1.0 / n_sentences)
                 - 84.6 * (n_syllables * 1.0 / n_words), 6) AS flesch,
           ROUND(0.39 * (n_words * 1.0 / n_sentences)
                 + 11.8 * (n_syllables * 1.0 / n_words) - 15.59, 6)
               AS fk_grade,
           CASE WHEN ROUND(206.835 - 1.015 * (n_words * 1.0 / n_sentences)
                           - 84.6 * (n_syllables * 1.0 / n_words), 6) >= 60
                THEN 'easy'
                WHEN ROUND(206.835 - 1.015 * (n_words * 1.0 / n_sentences)
                           - 84.6 * (n_syllables * 1.0 / n_words), 6) >= 30
                THEN 'standard'
                ELSE 'difficult' END AS band
    FROM counted
    ORDER BY doc_id
    """,
)
def readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease + Flesch-Kincaid grade per document — the
    classic readability features a quality filter feeds beside
    `quality_score`'s lexical ratios (the C4/Gopher-era pipelines
    screened on exactly these surface statistics). Syllables are the
    standard vowel-group approximation, computed WITHOUT exploding
    words: a vowel group never spans a word boundary, so the
    per-word sum equals one regexp count over the whole lowered text,
    plus one silent-word correction (consonant-only tokens count 1)
    — the entire operator is per-row regexp arithmetic in
    whole-stage codegen: no shuffle, no explode, no UDF, scaling as
    a pure map at any corpus size. The band label is derived from
    the 6-dp-rounded score on both engines so the cut cannot flip."""
    # r13 (guide §2.6/§6): the verification lakes ship documents as
    # ONE parquet file, so this pure-map regex query ran its whole
    # scan stage on a single core; the conditional spread
    # round-robins the small scan across defaultParallelism and
    # no-ops on an already-wide scan. The trailing global sort
    # (corpus-grain range exchange + sort, pure output cosmetics) is
    # dropped — the driver contract hash-compares row-sorted (r12
    # extraction/equidepth precedent).
    docs = spread_small_source(load_table(spark, sf_dir, "documents"))
    # r13 (guide §4.1 built-ins over HOFs): every per-doc statistic
    # is a regexp_count over the lowered text — the previous form
    # split the text into a word array and ran an interpreted
    # rlike-per-word HOF (`filter(w, x -> x rlike ...)`, no codegen)
    # just to count vowel-less words. Identities: n_words = number of
    # maximal [a-z0-9]+ runs; a run matches '[a-z0-9]*[aeiouy][a-z0-9]*'
    # exactly once iff it contains a vowel (greedy match consumes the
    # whole run; vowel-less runs match nowhere), so
    # words_with_vowel = that count and the silent-word correction is
    # n_words - words_with_vowel, unchanged.
    lower = F.lower(F.col("text"))
    n_words = F.regexp_count(lower, F.lit("[a-z0-9]+"))
    vowel_words = F.regexp_count(
        lower, F.lit("[a-z0-9]*[aeiouy][a-z0-9]*")
    )
    base = docs.select(
        "doc_id",
        F.greatest(
            F.regexp_count(F.col("text"), F.lit("[.!?]+")), F.lit(1)
        ).alias("n_sentences"),
        n_words.alias("nw"),
        (
            F.regexp_count(lower, F.lit("[aeiouy]+"))
            + n_words
            - vowel_words
        ).alias("syl"),
    )
    counted = base.filter(F.col("nw") > 0).select(
        "doc_id",
        F.col("n_sentences").cast("bigint").alias("n_sentences"),
        F.col("nw").cast("bigint").alias("n_words"),
        F.col("syl").cast("bigint").alias("n_syllables"),
    )
    wps = F.col("n_words") * 1.0 / F.col("n_sentences")
    spw = F.col("n_syllables") * 1.0 / F.col("n_words")
    flesch = F.round(206.835 - 1.015 * wps - 84.6 * spw, 6)
    return counted.select(
        "doc_id",
        "n_sentences",
        "n_words",
        "n_syllables",
        flesch.alias("flesch"),
        F.round(0.39 * wps + 11.8 * spw - 15.59, 6).alias("fk_grade"),
        F.when(flesch >= 60, "easy")
        .when(flesch >= 30, "standard")
        .otherwise("difficult")
        .alias("band"),
    )


CHI2_MIN_DF = 30  # terms in fewer docs carry no selection signal
CHI2_TOPK = 20


@query(
    "chi2_term_selection",
    oracle=f"""
    WITH pres AS MATERIALIZED (
        SELECT DISTINCT d.doc_id, d.source, w.word
        FROM documents d,
             unnest(string_split_regex(lower(d.text), '[^a-z0-9]+'))
                 AS w(word)
        WHERE length(w.word) >= 3
          AND w.word NOT IN {STOPWORDS!r}
    ),
    n_total AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents),
    class_sz AS (
        SELECT source, COUNT(DISTINCT doc_id) AS n_class
        FROM documents GROUP BY source
    ),
    term_df AS (
        SELECT word, COUNT(*) AS df FROM pres GROUP BY word
    ),
    cell AS (
        SELECT word, source, COUNT(*) AS n11
        FROM pres GROUP BY word, source
    ),
    scored AS (
        SELECT c.word, c.source,
               c.n11,
               s.n_class - c.n11 AS n10,
               t.df - c.n11 AS n01,
               n.n - s.n_class - (t.df - c.n11) AS n00,
               ROUND(
                   n.n
                   * POWER(CAST(c.n11 AS DOUBLE)
                           * (n.n - s.n_class - (t.df - c.n11))
                           - CAST(s.n_class - c.n11 AS DOUBLE)
                           * (t.df - c.n11), 2)
                   / (CAST(s.n_class AS DOUBLE) * (n.n - s.n_class)
                      * t.df * (n.n - t.df)),
                   6) AS chi2
        FROM cell c
        JOIN class_sz s USING (source)
        JOIN term_df t USING (word)
        CROSS JOIN n_total n
        WHERE t.df >= {CHI2_MIN_DF} AND t.df < n.n
    )
    SELECT word, source, CAST(n11 AS BIGINT) AS n11,
           CAST(n10 AS BIGINT) AS n10, CAST(n01 AS BIGINT) AS n01,
           CAST(n00 AS BIGINT) AS n00, chi2
    FROM scored
    ORDER BY chi2 DESC, word, source
    LIMIT {CHI2_TOPK}
    """,
)
def chi2_term_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square feature selection — the classic term-vs-class
    independence screen (sklearn's chi2 / the selection step before
    training `quality_classifier`-style models): for each (term,
    source) one-vs-rest 2x2 contingency over DOCUMENT PRESENCE, the
    chi-square statistic N*(n11*n00 - n10*n01)^2 / (row and column
    marginals), top-20. Terms below 30 (CHI2_MIN_DF) doc-frequency
    are screened out (no signal, and the long tail is where the term
    table's size lives).

    Scale shape: presence = one explode -> distinct at (doc, term)
    grain (the only corpus-sized shuffle); everything after is
    term-grain and (term, class)-grain with the class sizes and the
    1-row total riding broadcasts. The contingency arithmetic is
    integer codegen; doubles only enter for the final statistic."""
    docs = load_table(spark, sf_dir, "documents")
    return chi2_term_selection_frame(docs)


def chi2_term_selection_frame(
    docs: DataFrame,
    class_col: str = "source",
    min_df: int = CHI2_MIN_DF,
    topk: int = CHI2_TOPK,
) -> DataFrame:
    """Library core of `chi2_term_selection` (api.curation.
    chi2_term_selection): one-vs-rest chi-square term selection over
    any (``doc_id``, ``text``, ``class_col``) frame — document-
    presence 2x2 contingency per (term, class), min-df screened,
    top-k by statistic."""
    pres = (
        docs.select(
            "doc_id",
            F.col(class_col).alias("source"),
            F.explode(_words()).alias("word"),
        )
        .filter(
            (F.length("word") >= 3) & (~F.col("word").isin(*STOPWORDS))
        )
        .distinct()
    )
    n_total = docs.agg(
        F.count_distinct("doc_id").alias("n")
    )
    class_sz = docs.groupBy(
        F.col(class_col).alias("source")
    ).agg(
        F.count_distinct("doc_id").alias("n_class")
    )
    term_df = pres.groupBy("word").agg(F.count("*").alias("df"))
    cell = pres.groupBy("word", "source").agg(
        F.count("*").alias("n11")
    )
    n11 = F.col("n11")
    n10 = F.col("n_class") - n11
    n01 = F.col("df") - n11
    n00 = F.col("n") - F.col("n_class") - n01
    chi2 = F.round(
        F.col("n")
        * F.pow(
            n11.cast("double") * n00 - n10.cast("double") * n01, 2
        )
        / (
            F.col("n_class").cast("double")
            * (F.col("n") - F.col("n_class"))
            * F.col("df")
            * (F.col("n") - F.col("df"))
        ),
        6,
    )
    return (
        cell.join(F.broadcast(class_sz), "source")
        .join(term_df, "word")
        .crossJoin(F.broadcast(n_total))
        .filter(
            (F.col("df") >= min_df) & (F.col("df") < F.col("n"))
        )
        .select(
            "word",
            "source",
            n11.cast("bigint").alias("n11"),
            n10.cast("bigint").alias("n10"),
            n01.cast("bigint").alias("n01"),
            n00.cast("bigint").alias("n00"),
            chi2.alias("chi2"),
        )
        .orderBy(F.desc("chi2"), "word", "source")
        .limit(topk)
    )


@query(
    "token_gini_by_source",
    oracle=f"""
    WITH words AS (
        SELECT d.source, w.word
        FROM documents d,
             unnest(string_split_regex(lower(d.text), '[^a-z0-9]+'))
                 AS w(word)
        WHERE length(w.word) >= 3
          AND w.word NOT IN {STOPWORDS!r}
    ),
    counts AS (
        SELECT source, word, COUNT(*) AS c
        FROM words GROUP BY source, word
    ),
    ranked AS (
        SELECT source, c,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY c, word) AS i,
               c * 1.0 / SUM(c) OVER (PARTITION BY source) AS p
        FROM counts
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           ROUND(2.0 * SUM(i * c) / (COUNT(*) * SUM(c))
                 - (COUNT(*) + 1.0) / COUNT(*), 6) AS gini,
           ROUND(SUM(p * p), 6) AS simpson,
           ROUND(-SUM(p * ln(p)), 6) AS entropy
    FROM ranked
    GROUP BY source
    ORDER BY source
    """,
)
def token_gini_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution concentration per source — the corpus
    diversity panel a mixture designer reads beside
    `zipf_alpha_fit`: the Gini coefficient of the word-frequency
    distribution (0 = perfectly even vocabulary use, ->1 = a few
    tokens dominate, the boilerplate/template signature), the
    Simpson index sum p^2 (collision probability of two random
    tokens), and Shannon entropy — three lenses on the same
    concentration question, each preferring different tails.
    Gini comes from the rank identity
    2*sum(i*c_i)/(n*sum c) - (n+1)/n over ASC-sorted counts —
    integer arithmetic until the final division.

    Scale shape: one (source, word) count shuffle (vocab grain),
    then a rank window and the rollup both PARTITIONED BY source
    over the vocab-grain table — bounded by vocabulary size (Heaps
    sub-linear), never corpus rows."""
    docs = load_table(spark, sf_dir, "documents")
    return token_concentration_by(docs)


def token_concentration_by(
    docs: DataFrame, group_col: str = "source"
) -> DataFrame:
    """Library core of `token_gini_by_source` (api.curation.
    token_concentration_by): the Gini/Simpson/entropy concentration
    panel of the word distribution per ``group_col`` over any
    (``text``, ``group_col``) frame."""
    counts = (
        docs.select(
            F.col(group_col).alias("source"),
            F.explode(_words()).alias("word"),
        )
        .filter(
            (F.length("word") >= 3) & (~F.col("word").isin(*STOPWORDS))
        )
        .groupBy("source", "word")
        .agg(F.count("*").alias("c"))
    )
    wr = Window.partitionBy("source").orderBy("c", "word")
    wtot = Window.partitionBy("source")
    p = F.col("c") * 1.0 / F.sum("c").over(wtot)
    ranked = counts.select(
        "source",
        "c",
        F.row_number().over(wr).alias("i"),
        p.alias("p"),
    )
    n = F.count("*")
    tot = F.sum("c")
    return (
        ranked.groupBy("source")
        .agg(
            n.cast("bigint").alias("n_distinct"),
            tot.cast("bigint").alias("n_tokens"),
            F.round(
                2.0 * F.sum(F.col("i") * F.col("c")) / (n * tot)
                - (n + 1.0) / n,
                6,
            ).alias("gini"),
            F.round(F.sum(F.col("p") * F.col("p")), 6).alias(
                "simpson"
            ),
            F.round(
                -F.sum(F.col("p") * F.log(F.col("p"))), 6
            ).alias("entropy"),
        )
        .orderBy("source")
    )


VOCAB_CURVE_KS = (1, 2, 4, 8, 16, 32, 64)


@query(
    "vocab_sizing_curve",
    oracle=f"""
    WITH words AS (
        SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+'))
            AS word
        FROM documents
    ),
    counts AS (
        SELECT word, COUNT(*) AS c FROM words
        WHERE length(word) >= 3
          AND word NOT IN {STOPWORDS!r}
        GROUP BY word
    ),
    ranked AS MATERIALIZED (
        SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, word) AS r
        FROM counts
    ),
    tot AS (SELECT SUM(c) AS tot, COUNT(*) AS n_distinct FROM ranked)
    SELECT k.k AS vocab_k,
           CAST(COALESCE(SUM(rk.c), 0) AS BIGINT) AS covered_tokens,
           ROUND(COALESCE(SUM(rk.c), 0) * 1.0 / MAX(t.tot), 6)
               AS coverage_frac,
           ROUND(1.0 - COALESCE(SUM(rk.c), 0) * 1.0 / MAX(t.tot), 6)
               AS oov_frac
    FROM (VALUES {", ".join(f"({k})" for k in VOCAB_CURVE_KS)}) AS k(k)
    LEFT JOIN ranked rk ON rk.r <= k.k
    CROSS JOIN tot t
    GROUP BY k.k
    ORDER BY k.k
    """,
)
def vocab_sizing_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary sizing curve — the coverage-vs-size trade a
    tokenizer team reads before fixing a vocab budget (the marginal
    token-mass each doubling of the vocabulary buys; the knee of
    this curve IS the vocab size decision): for k in 1,2,4,...,64,
    the fraction of all token occurrences covered by the top-k
    words, with the OOV remainder that would fall to byte-fallback.
    The single-k variant is `vocab_coverage`; this emits the whole
    doubling grid in one plan.

    Scale shape: one word-count shuffle (vocab grain, Heaps
    sub-linear), then a distributed TakeOrdered(max k) — never a
    global sort or a full-vocab window — so the rank window and the
    broadcast both operate on the <=64-row head (the
    `hill_tail_profile` pattern); the total-token scalar is a
    separate 1-row aggregate. The grid and the output are bounded
    by the k ladder, the corpus appears only in the first
    aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    # r12 note: both consumers (ranked head, total scalar) share the
    # hash(word) aggregate exchange, which AQE stage reuse computes
    # once at runtime; an eager pin measured slower (0.89 -> 0.98 s)
    # and is deliberately not applied.
    counts = (
        docs.select(F.explode(_words()).alias("word"))
        .filter(
            (F.length("word") >= 3) & (~F.col("word").isin(*STOPWORDS))
        )
        .groupBy("word")
        .agg(F.count("*").alias("c"))
    )
    kmax = max(VOCAB_CURVE_KS)
    ranked = (
        counts.orderBy(F.desc("c"), "word")
        .limit(kmax)
        .select(
            "c",
            F.row_number()
            .over(Window.orderBy(F.desc("c"), "word"))
            .alias("r"),
        )
    )
    tot = counts.agg(F.sum("c").alias("tot"))
    grid = literal_grid(spark, "vocab_k", VOCAB_CURVE_KS, "long")
    covered = F.coalesce(F.sum("c"), F.lit(0))
    return (
        grid.join(
            F.broadcast(ranked), F.col("r") <= F.col("vocab_k"), "left"
        )
        .groupBy("vocab_k")
        .agg(covered.cast("bigint").alias("covered_tokens"))
        .crossJoin(F.broadcast(tot))
        .select(
            "vocab_k",
            "covered_tokens",
            F.round(
                F.col("covered_tokens") * 1.0 / F.col("tot"), 6
            ).alias("coverage_frac"),
            F.round(
                1.0 - F.col("covered_tokens") * 1.0 / F.col("tot"), 6
            ).alias("oov_frac"),
        )
        .orderBy("vocab_k")
    )


TTR_CHUNK = 25  # MATTR window: full 25-token chunks only


@query(
    "ttr_lexical_diversity",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source, unnest(ws) AS word,
               generate_subscripts(ws, 1) AS pos
        FROM (
            SELECT doc_id, source,
                   list_filter(
                       string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> x <> '') AS ws
            FROM documents
        )
    ),
    cells AS (
        SELECT source, doc_id, (pos - 1) // {TTR_CHUNK} AS chunk,
               COUNT(*) AS n_tok,
               COUNT(DISTINCT word) AS n_type
        FROM toks GROUP BY 1, 2, 3
    ),
    mattr AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_chunks,
               ROUND(AVG(n_type * 1.0 / {TTR_CHUNK}), 6) AS mattr
        FROM cells WHERE n_tok = {TTR_CHUNK}
        GROUP BY source
    ),
    naive AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS token_count,
               CAST(COUNT(DISTINCT word) AS BIGINT) AS type_count
        FROM toks GROUP BY source
    )
    SELECT n.source, m.n_chunks, m.mattr,
           n.token_count, n.type_count,
           ROUND(n.type_count * 1.0 / n.token_count, 6) AS naive_ttr
    FROM naive n JOIN mattr m ON n.source = m.source
    ORDER BY n.source
    """,
)
def ttr_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical diversity per source: MATTR (the moving/chunked
    type-token ratio — Covington & McFall 2010's fix for TTR's
    length bias) over full 25-token chunks, beside the naive
    whole-source TTR it corrects. Template-heavy or boilerplate
    sources score LOW mattr (few distinct types per 25-token
    window) even when their corpus-level type count looks healthy —
    the quality signal `token_entropy` and `gopher_repetition_ratios`
    approximate at other granularities, here in the unit reviewers
    quote. Naive TTR is emitted too because the CONTRAST is the
    diagnostic: naive falls with corpus size (Heaps) while mattr is
    size-stable, so a source whose naive is low but mattr is normal
    is just BIG, not repetitive.

    Scale shape: one posexplode of the token arrays feeds both the
    (source, doc, chunk) distinct-type aggregate and the per-source
    type/token totals — two map-side-combinable shuffles, no window,
    no per-doc state; partial tail chunks are dropped (n_tok = 25
    exactly) so every chunk's TTR is measured on the same support.

    Reference anchor: extends the reference's per-document quality
    heuristics (processing/quality_scorer.py) with the
    corpus-comparable diversity panel it lacks."""
    docs = load_table(spark, sf_dir, "documents")
    return lexical_diversity_by(docs, "source")


def lexical_diversity_by(
    docs: DataFrame,
    group_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk: int = TTR_CHUNK,
) -> DataFrame:
    """Library core of `ttr_lexical_diversity`
    (api.curation.lexical_diversity_by): MATTR over full
    ``chunk``-token windows plus naive TTR, grouped by
    ``group_col``."""
    w = F.filter(_words(text_col), lambda x: x != "")
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(group_col).alias("source"),
        F.posexplode(w).alias("pos", "word"),
    )
    cells = (
        toks.groupBy(
            "source",
            "doc_id",
            (F.col("pos") / chunk).cast("long").alias("chunk"),
        )
        .agg(
            F.count("*").alias("n_tok"),
            F.countDistinct("word").alias("n_type"),
        )
    )
    mattr = (
        cells.filter(F.col("n_tok") == chunk)
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_chunks"),
            F.round(
                F.avg(F.col("n_type") * 1.0 / chunk), 6
            ).alias("mattr"),
        )
    )
    naive = toks.groupBy("source").agg(
        F.count("*").cast("bigint").alias("token_count"),
        F.countDistinct("word").cast("bigint").alias("type_count"),
    )
    return (
        naive.join(mattr, "source")
        .select(
            "source",
            "n_chunks",
            "mattr",
            "token_count",
            "type_count",
            F.round(
                F.col("type_count") * 1.0 / F.col("token_count"), 6
            ).alias("naive_ttr"),
        )
        .orderBy("source")
    )


TPL_POSITIONS = 8  # leading token positions audited for templating


@query(
    "positional_template_score",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, pos - 1 AS pos, word
        FROM (
            SELECT doc_id,
                   unnest(ws) AS word,
                   generate_subscripts(ws, 1) AS pos
            FROM (
                SELECT doc_id,
                       list_filter(
                           string_split_regex(lower(text),
                                              '[^a-z0-9]+'),
                           x -> x <> '') AS ws
                FROM documents
            )
        ) WHERE pos <= {TPL_POSITIONS}
    ),
    cells AS (
        SELECT pos, word, COUNT(*) AS c
        FROM toks GROUP BY 1, 2
    ),
    ptot AS (
        SELECT pos, SUM(c) AS n, MAX(c) AS topc
        FROM cells GROUP BY 1
    ),
    ent AS (
        SELECT c.pos,
               ROUND(-SUM((c.c * 1.0 / t.n)
                     * LN(c.c * 1.0 / t.n)), 6) AS entropy_nats,
               CAST(COUNT(*) AS BIGINT) AS n_distinct
        FROM cells c JOIN ptot t ON c.pos = t.pos
        GROUP BY c.pos
    ),
    top1 AS (
        SELECT c.pos, MIN(c.word) AS top_token,
               ROUND(MAX(c.c) * 1.0 / MAX(t.n), 6) AS top_share
        FROM cells c
        JOIN ptot t ON c.pos = t.pos AND c.c = t.topc
        GROUP BY c.pos
    )
    SELECT e.pos, e.n_distinct, e.entropy_nats,
           t.top_token, t.top_share,
           CASE WHEN t.top_share >= 0.5 THEN 1 ELSE 0 END
               AS templated
    FROM ent e JOIN top1 t ON e.pos = t.pos
    ORDER BY e.pos
    """,
)
def positional_template_score(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-position token entropy over the first 8 token slots — the
    template detector that catches what document-LEVEL repetition
    scores miss: a corpus where every page opens 'terms of service
    for ...' has normal whole-doc diversity but near-zero entropy at
    positions 0-3, and boilerplate openings are exactly what an LM
    memorizes first. Each position reports its token entropy,
    distinct count, dominant token and its share; share >= 0.5 flags
    the slot as templated (the prefix a cleaner strips or a
    dedup-by-prefix keys on). Complements `boilerplate_phrase_stats`
    (corpus-wide n-grams) and `ttr_lexical_diversity` (within-doc
    windows) with the POSITIONAL axis.

    Scale shape: one posexplode limited to 8 positions per doc (the
    filter rides the explode), a (position, word) count aggregate —
    8 x vocabulary rows at worst, Heaps-bounded — then position-grain
    arithmetic; ties on the dominant token break on MIN(word) in
    both engines. Output is 8 rows at any corpus size.

    Reference anchor: the reference's cleaner strips known literals
    only (processing/text_cleaner.py); this measures where unknown
    templates live."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.filter(_words(), lambda x: x != "")
    toks = (
        docs.select("doc_id", F.posexplode(w).alias("pos", "word"))
        .filter(F.col("pos") < TPL_POSITIONS)
    )
    cells = toks.groupBy("pos", "word").agg(F.count("*").alias("c"))
    ptot = cells.groupBy("pos").agg(
        F.sum("c").alias("n"), F.max("c").alias("topc")
    )
    joined = cells.join(F.broadcast(ptot), "pos")
    p = F.col("c") * 1.0 / F.col("n")
    ent = joined.groupBy("pos").agg(
        F.round(-F.sum(p * F.log(p)), 6).alias("entropy_nats"),
        F.count("*").cast("bigint").alias("n_distinct"),
    )
    top1 = (
        joined.filter(F.col("c") == F.col("topc"))
        .groupBy("pos")
        .agg(
            F.min("word").alias("top_token"),
            F.round(
                F.max("c") * 1.0 / F.max("n"), 6
            ).alias("top_share"),
        )
    )
    return (
        ent.join(top1, "pos")
        .select(
            "pos",
            "n_distinct",
            "entropy_nats",
            "top_token",
            "top_share",
            F.when(F.col("top_share") >= 0.5, 1)
            .otherwise(0)
            .alias("templated"),
        )
        .orderBy("pos")
    )


BD_TOP_WORDS = 20  # Burrows' Delta marker-word panel size


@query(
    "stylometry_burrows_delta",
    oracle=f"""
    WITH words AS (
        SELECT source, unnest(list_filter(
            string_split_regex(lower(text), '[^a-z0-9]+'),
            x -> x <> '')) AS word
        FROM documents
    ),
    top_words AS (
        SELECT word FROM words GROUP BY 1
        ORDER BY COUNT(*) DESC, word LIMIT {BD_TOP_WORDS}
    ),
    src_tot AS (
        SELECT source, COUNT(*) AS tot FROM words GROUP BY 1
    ),
    sw AS (
        SELECT source, word, COUNT(*) AS c FROM words
        WHERE word IN (SELECT word FROM top_words)
        GROUP BY 1, 2
    ),
    grid AS (
        SELECT s.source, t.word,
               COALESCE(sw.c, 0) * 1.0 / s.tot AS f
        FROM src_tot s CROSS JOIN top_words t
        LEFT JOIN sw ON sw.source = s.source AND sw.word = t.word
    ),
    stats AS (
        SELECT word, AVG(f) AS mu,
               GREATEST(stddev_pop(f), 1e-12) AS sd
        FROM grid GROUP BY 1
    ),
    z AS (
        SELECT g.source, g.word, (g.f - st.mu) / st.sd AS z
        FROM grid g JOIN stats st USING (word)
    )
    SELECT a.source AS source_a, b.source AS source_b,
           ROUND(AVG(ABS(a.z - b.z)), 6) AS delta,
           CAST(COUNT(*) AS BIGINT) AS n_words
    FROM z a JOIN z b ON a.word = b.word AND a.source < b.source
    GROUP BY 1, 2
    ORDER BY delta, source_a, source_b
    """,
)
def stylometry_burrows_delta(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Burrows' Delta (Burrows 2002) between sources — the standard
    stylometric attribution distance: relative frequencies of the
    corpus's top-20 words (function words dominate such a list, and
    style lives in function-word habits), z-scored per word ACROSS
    sources, Delta = mean |z_a - z_b| per source pair. Low Delta =
    same stylistic fingerprint (a mirrored/scraped source pair the
    dedup stack should inspect; in provenance work, same author);
    high = distinct registers. Complements the distributional
    screens (`source_kl_divergence` compares content buckets; Delta
    compares STYLE on the shared high-frequency vocabulary).

    Scale shape: one token pass to (source, word) counts; the
    marker panel is a 20-row TakeOrdered head; the grid is
    |sources| x 20 (sources are a curated registry, so the grid,
    the per-word moment table, and the C(|sources|, 2) pair panel
    are all registry-bounded — never corpus-grain). Zero cells are
    materialized by the registry cross join so a word ABSENT from a
    source pulls its z below the mean instead of vanishing.
    Relative frequencies are exact-int ratios; the pair fold
    averages 20 terms, so the 6-dp pin is engine-stable."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.filter(_words(), lambda x: x != "")
    # ONE corpus pass to (source, word) counts; everything downstream
    # is registry x 20-word grain. The z table is eagerly pinned
    # (localCheckpoint) because the pair self-join would otherwise
    # re-derive the corpus scan once per join leg (16 scans in the
    # unpinned optimized plan) — the fellegi_sunter_em discipline
    # for bounded derived tables.
    swc = (
        docs.select("source", F.explode(w).alias("word"))
        .groupBy("source", "word")
        .agg(F.count("*").alias("c"))
    )
    swc = swc.localCheckpoint()
    top_words = (
        swc.groupBy("word")
        .agg(F.sum("c").alias("cw"))
        .orderBy(F.desc("cw"), "word")
        .limit(BD_TOP_WORDS)
        .select("word")
    )
    src_tot = swc.groupBy("source").agg(F.sum("c").alias("tot"))
    sw = swc.join(F.broadcast(top_words), "word")
    grid = (
        src_tot.crossJoin(F.broadcast(top_words))
        .join(sw, ["source", "word"], "left")
        .select(
            "source",
            "word",
            (F.coalesce(F.col("c"), F.lit(0)) * 1.0 / F.col("tot"))
            .alias("f"),
        )
    )
    stats = grid.groupBy("word").agg(
        F.avg("f").alias("mu"),
        F.greatest(F.stddev_pop("f"), F.lit(1e-12)).alias("sd"),
    )
    z = grid.join(F.broadcast(stats), "word").select(
        "source",
        "word",
        ((F.col("f") - F.col("mu")) / F.col("sd")).alias("z"),
    )
    z = z.localCheckpoint()
    a = z.select(
        F.col("source").alias("source_a"),
        "word",
        F.col("z").alias("za"),
    )
    b = z.select(
        F.col("source").alias("source_b"),
        "word",
        F.col("z").alias("zb"),
    )
    return (
        a.join(b, (a.word == b.word) & (a.source_a < b.source_b))
        .groupBy("source_a", "source_b")
        .agg(
            F.round(
                F.avg(F.abs(F.col("za") - F.col("zb"))), 6
            ).alias("delta"),
            F.count("*").cast("bigint").alias("n_words"),
        )
        .orderBy("delta", "source_a", "source_b")
    )


WB_MIN_CF = 20  # corpus-frequency floor for the burstiness panel
WB_TOPK = 30


@query(
    "word_burstiness_topk",
    oracle=f"""
    WITH dw AS (
        SELECT doc_id, word, COUNT(*) AS c
        FROM (
            SELECT doc_id, unnest(list_filter(
                string_split_regex(lower(text), '[^a-z0-9]+'),
                x -> x <> '')) AS word
            FROM documents
        )
        GROUP BY 1, 2
    ),
    nn AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n
           FROM documents),
    wstats AS (
        SELECT word, SUM(c) AS cf, COUNT(*) AS df
        FROM dw GROUP BY 1
    )
    SELECT w.word,
           CAST(w.cf AS BIGINT) AS cf,
           CAST(w.df AS BIGINT) AS df,
           ROUND(nn.n * (1 - EXP(-w.cf / nn.n)), 6) AS expected_df,
           ROUND(nn.n * (1 - EXP(-w.cf / nn.n)) / w.df, 6)
               AS burstiness,
           ROUND(w.cf * 1.0 / w.df, 6) AS mean_occ_per_doc
    FROM wstats w CROSS JOIN nn
    WHERE w.cf >= {WB_MIN_CF}
    ORDER BY ROUND(nn.n * (1 - EXP(-w.cf / nn.n)) / w.df, 6) DESC,
             w.word
    LIMIT {WB_TOPK}
    """,
)
def word_burstiness_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Word burstiness (Church & Gale 1995): content words do not
    scatter Poisson-randomly — they BURST (a document about a topic
    repeats its terms). For each word with corpus frequency >= 20,
    compare the document frequency a homogeneous Poisson would
    predict (N(1 - e^(-cf/N))) with the observed df; the ratio > 1
    measures concentration. The burstiest words are the topical /
    template vocabulary (`doc_repetition_topk` finds within-doc
    repeats; this finds cross-corpus concentration — the IDF
    assumption-checker for the BM25/TF-IDF rankers, which model df,
    not cf, precisely BECAUSE of burstiness).

    Scale shape: one (doc, word) count pass (Heaps-bounded), one
    vocab-grain rollup, a 1-row doc-count broadcast, and a
    TakeOrdered 30-row head — no windows, no joins beyond the
    scalar. exp over exact-int ratios is engine-stable at the
    6-dp pin (ordering key is the ROUNDED ratio on both sides)."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.filter(_words(), lambda x: x != "")
    dw = (
        docs.select("doc_id", F.explode(w).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("c"))
    )
    nn = docs.agg(
        F.countDistinct("doc_id").cast("double").alias("n")
    )
    wstats = dw.groupBy("word").agg(
        F.sum("c").alias("cf"), F.count("*").alias("df")
    )
    exp_df = F.col("n") * (1 - F.exp(-F.col("cf") / F.col("n")))
    return (
        wstats.filter(F.col("cf") >= WB_MIN_CF)
        .crossJoin(F.broadcast(nn))
        .select(
            "word",
            F.col("cf").cast("bigint").alias("cf"),
            F.col("df").cast("bigint").alias("df"),
            F.round(exp_df, 6).alias("expected_df"),
            F.round(exp_df / F.col("df"), 6).alias("burstiness"),
            F.round(F.col("cf") * 1.0 / F.col("df"), 6).alias(
                "mean_occ_per_doc"
            ),
        )
        .orderBy(F.desc("burstiness"), "word")
        .limit(WB_TOPK)
    )


HEAPS_CHECKPOINTS = (0.125, 0.25, 0.5, 1.0)  # doc-prefix ladder


@query(
    "heaps_law_fit",
    oracle=f"""
    WITH dw AS (
        SELECT doc_id, unnest(list_filter(
            string_split_regex(lower(text), '[^a-z0-9]+'),
            x -> x <> '')) AS word
        FROM documents
    ),
    bounds AS (
        SELECT {", ".join(
            f"ROUND(quantile_cont(doc_id, {c}), 6) AS c{i}"
            for i, c in enumerate(HEAPS_CHECKPOINTS)
        )}
        FROM (SELECT DISTINCT doc_id FROM documents)
    ),
    cells AS (
        SELECT {", ".join(
            f"COUNT(DISTINCT CASE WHEN dw.doc_id <= b.c{i} "
            f"THEN dw.word END) AS v{i}, "
            f"COUNT(DISTINCT CASE WHEN dw.doc_id <= b.c{i} "
            f"THEN dw.doc_id END) AS n{i}, "
            f"COUNT(CASE WHEN dw.doc_id <= b.c{i} "
            f"THEN 1 END) AS t{i}"
            for i in range(len(HEAPS_CHECKPOINTS))
        )}
        FROM dw CROSS JOIN bounds b
    ),
    pts AS (
        {" UNION ALL ".join(
            f"SELECT {i} AS ck, n{i} AS n_docs, t{i} AS n_tokens,"
            f" v{i} AS vocab FROM cells"
            for i in range(len(HEAPS_CHECKPOINTS))
        )}
    ),
    fit AS (
        SELECT ROUND(regr_slope(LN(vocab), LN(n_tokens)), 6) + 0.0
                   AS beta,
               ROUND(EXP(regr_intercept(LN(vocab), LN(n_tokens))), 6)
                   AS k
        FROM pts
    )
    SELECT p.ck AS checkpoint,
           CAST(p.n_docs AS BIGINT) AS n_docs,
           CAST(p.n_tokens AS BIGINT) AS n_tokens,
           CAST(p.vocab AS BIGINT) AS vocab,
           f.beta AS heaps_beta,
           f.k AS heaps_k,
           ROUND(f.k * POWER(p.n_tokens, f.beta), 6)
               AS fitted_vocab
    FROM pts p CROSS JOIN fit f
    ORDER BY checkpoint
    """,
)
def heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit of vocabulary growth — V(n) = K n^beta over a
    doc-prefix ladder (1/8, 1/4, 1/2, full corpus by doc_id): the
    exponent the engine's OWN scale arguments lean on ('vocab grain
    is Heaps-sublinear') turned into a measured number, and the
    tokenizer-planning curve (`vocab_sizing_curve` asks what k
    covers; this asks how vocabulary GROWS as the corpus does —
    beta ~ 0.5 means 4x data ~ 2x vocab, the budget rule for
    open-vocab growth).

    The four prefix vocabularies are FOUR CONDITIONAL COUNT-
    DISTINCTs in ONE aggregate over the (doc, word) pass — not four
    scans: the checkpoint doc_id boundaries ride a 1-row percentile
    broadcast, and the log-log fit is a 4-point regression. The
    fitted_vocab column replays the law at each checkpoint so the
    residual is visible.

    Scale shape: one token explode, a 1-row boundary broadcast, one
    multi-distinct aggregate (Spark plans it as an expand — 4x the
    pass, still one shuffle), a 4-row fit."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.filter(_words(), lambda x: x != "")
    bounds = docs.select("doc_id").distinct().agg(
        *[
            F.round(
                F.percentile("doc_id", F.lit(c)), 6
            ).alias(f"c{i}")
            for i, c in enumerate(HEAPS_CHECKPOINTS)
        ]
    )
    # r12 note: the static plan embeds this subtree twice (fit +
    # final projection), but the shared SinglePartition aggregate
    # exchange is deduplicated by AQE stage reuse at runtime — an
    # eager pin here measured SLOWER (1.91 -> 2.12 s isolated), so
    # the frame is deliberately left lazy.
    #
    # r13 (guide §2.3): the 12-way multi-countDistinct planned an
    # Expand that pushed 12 copies of every (doc, word) row through
    # one exchange. The checkpoints are NESTED prefixes, so a word is
    # in prefix i iff its MIN doc_id <= c_i: one word-grain
    # min(doc_id) aggregate (map-side partial min, the exchange
    # carries one row per distinct word per mapper) replaces all four
    # vocab distincts, and the doc-axis cells (n_i docs, t_i tokens)
    # come straight off size(words) at the scan — no explode, no
    # Expand, integer-exact equality with the oracle.
    wg = docs.select(
        "doc_id", F.explode(w).alias("word")
    ).groupBy("word").agg(F.min("doc_id").alias("fd"))
    vrow = wg.crossJoin(F.broadcast(bounds)).agg(
        *[
            F.count(
                F.when(F.col("fd") <= F.col(f"c{i}"), 1)
            ).alias(f"v{i}")
            for i in range(len(HEAPS_CHECKPOINTS))
        ]
    )
    ntrow = (
        docs.select("doc_id", F.size(w).alias("tk"))
        .filter(F.col("tk") > 0)
        .crossJoin(F.broadcast(bounds))
        .agg(
            *[
                agg
                for i in range(len(HEAPS_CHECKPOINTS))
                for agg in (
                    F.count(
                        F.when(F.col("doc_id") <= F.col(f"c{i}"), 1)
                    ).alias(f"n{i}"),
                    F.coalesce(
                        F.sum(
                            F.when(
                                F.col("doc_id") <= F.col(f"c{i}"),
                                F.col("tk"),
                            )
                        ),
                        F.lit(0).cast("long"),
                    ).alias(f"t{i}"),
                )
            ]
        )
    )
    cells = vrow.crossJoin(ntrow)
    stack_args = []
    for i in range(len(HEAPS_CHECKPOINTS)):
        stack_args += [
            F.lit(i),
            F.col(f"n{i}"),
            F.col(f"t{i}"),
            F.col(f"v{i}"),
        ]
    # ONE reference to the 1-row cells frame (a 4-way union would
    # re-derive the corpus aggregate per checkpoint)
    pts = cells.select(
        F.stack(
            F.lit(len(HEAPS_CHECKPOINTS)), *stack_args
        ).alias("ck", "n_docs", "n_tokens", "vocab")
    )
    fit = pts.agg(
        (
            F.round(
                F.regr_slope(
                    F.log(F.col("vocab").cast("double")),
                    F.log(F.col("n_tokens").cast("double")),
                ),
                6,
            )
            + 0.0
        ).alias("beta"),
        F.round(
            F.exp(
                F.regr_intercept(
                    F.log(F.col("vocab").cast("double")),
                    F.log(F.col("n_tokens").cast("double")),
                )
            ),
            6,
        ).alias("k"),
    )
    return (
        pts.crossJoin(F.broadcast(fit))
        .select(
            F.col("ck").alias("checkpoint"),
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.col("vocab").cast("bigint").alias("vocab"),
            F.col("beta").alias("heaps_beta"),
            F.col("k").alias("heaps_k"),
            F.round(
                F.col("k")
                * F.pow(
                    F.col("n_tokens").cast("double"), F.col("beta")
                ),
                6,
            ).alias("fitted_vocab"),
        )
        .orderBy("checkpoint")
    )


@query(
    "char_ngram_lang_profile",
    oracle="""
    WITH norm AS (
        SELECT lang,
               regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')
                   AS s
        FROM documents
    ),
    tri AS (
        SELECT lang,
               substring(s, i, 3) AS g
        FROM norm,
             UNNEST(range(1, length(s) - 1)) AS t(i)
        WHERE length(s) >= 3
    ),
    prof AS (
        SELECT lang, g, COUNT(*) AS c FROM tri GROUP BY 1, 2
    ),
    norms AS (
        SELECT lang, SQRT(SUM(c * c)) AS nrm,
               COUNT(*) AS n_grams
        FROM prof GROUP BY 1
    ),
    dots AS (
        SELECT a.lang AS lang_a, b.lang AS lang_b,
               SUM(a.c * b.c) AS dot
        FROM prof a JOIN prof b
          ON a.g = b.g AND a.lang < b.lang
        GROUP BY 1, 2
    )
    SELECT na.lang AS lang_a, nb.lang AS lang_b,
           ROUND(COALESCE(d.dot, 0) / (na.nrm * nb.nrm), 6)
               AS cosine,
           CAST(na.n_grams AS BIGINT) AS n_grams_a,
           CAST(nb.n_grams AS BIGINT) AS n_grams_b
    FROM norms na
    JOIN norms nb ON na.lang < nb.lang
    LEFT JOIN dots d
      ON d.lang_a = na.lang AND d.lang_b = nb.lang
    ORDER BY cosine DESC, lang_a, lang_b
    """,
)
def char_ngram_lang_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Character-trigram profile similarity between language labels —
    the Cavnar-Trenkle / fastText signal under every practical
    language identifier, here as a LABEL-QUALITY audit: two langs
    whose trigram profiles are near-cosine-1 are either related
    scripts or (on curated corpora) mislabeled splits the pipeline
    should merge, and a lang whose profile drifts from its own
    history flags contamination (`lang_confusion_matrix` audits the
    word-level classifier; this audits the LABELS themselves at the
    sub-word level, where loanwords and code-switching live).

    Scale shape: one character-window explode (the shingle pass at
    char grain), a (lang, trigram)-grain profile (trigram space is
    bounded by charset^3, langs by the registry), norm rollups, and
    a trigram-keyed profile join — never doc-pair, never
    corpus-grain after the profile aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    s = F.regexp_replace(
        F.trim(F.lower(F.col("text"))), r"\s+", " "
    )
    # r12 (guide §4.2): the per-character `transform(sequence, i ->
    # substring(s, i, 3))` HOF is interpreted (no codegen for lambda
    # bodies) and explodes one row per character — the dominant CPU
    # of this query. The trigram PROFILE (lang, g, c) is computed in
    # one mapInArrow stage instead: per task, codepoints via numpy
    # (UTF-32 — Spark's substring and Python slicing both count code
    # points), trigrams packed into 21-bit-per-char uint64 keys,
    # counted with np.unique, and emitted ONCE per task — a map-side
    # partial aggregation, so the exchange carries per-task distinct
    # grams instead of per-character rows. String normalization stays
    # in Catalyst so lower/trim/regexp semantics are byte-identical
    # to the oracle's. Counting is exact integers: `prof` is
    # bit-identical to the explode+groupBy form it replaces
    # (equality pinned in tests/test_round12_ops.py).
    src = spread_small_source(
        docs.select("lang", s.alias("s")).filter(F.length("s") >= 3)
    )

    def gen(batches):
        import numpy as np
        import pyarrow as pa

        acc: dict = {}  # lang -> list[np.ndarray] of packed keys
        for batch in batches:
            langs = batch.column(0).to_pylist()
            texts = batch.column(1).to_pylist()
            per_lang: dict = {}
            for lang, txt in zip(langs, texts):
                cp = np.frombuffer(
                    txt.encode("utf-32-le"), dtype=np.uint32
                ).astype(np.uint64)
                keys = (
                    (cp[:-2] << np.uint64(42))
                    | (cp[1:-1] << np.uint64(21))
                    | cp[2:]
                )
                per_lang.setdefault(lang, []).append(keys)
            for lang, arrs in per_lang.items():
                # compact to distinct-gram grain per batch so the
                # task-level accumulator stays domain-bounded
                uk, uc = np.unique(
                    np.concatenate(arrs), return_counts=True
                )
                st = acc.setdefault(lang, [[], []])
                st[0].append(uk)
                st[1].append(uc)
        for lang, (uks, ucs) in acc.items():
            k = np.concatenate(uks)
            c = np.concatenate(ucs)
            uk, inv = np.unique(k, return_inverse=True)
            cnt = np.zeros(len(uk), dtype=np.int64)
            np.add.at(cnt, inv, c)
            m = np.uint64(0x1FFFFF)
            chars = np.empty((len(uk), 3), dtype=np.uint32)
            chars[:, 0] = (uk >> np.uint64(42)) & m
            chars[:, 1] = (uk >> np.uint64(21)) & m
            chars[:, 2] = uk & m
            flat = chars.tobytes().decode("utf-32-le")
            grams = [flat[i * 3 : i * 3 + 3] for i in range(len(uk))]
            yield pa.record_batch(
                [
                    pa.array([lang] * len(uk), type=pa.string()),
                    pa.array(grams, type=pa.string()),
                    pa.array(cnt),
                ],
                names=["lang", "g", "c"],
            )

    partial = src.mapInArrow(gen, "lang string, g string, c long")
    # Pin the (lang, trigram) profile: THREE consumers read it (the
    # norm rollup and both sides of the gram-keyed dot join), and
    # un-pinned each would re-run the corpus scan + Arrow kernel.
    # The frame is bounded by charset^3 x langs, never corpus-grain.
    prof = (
        partial.groupBy("lang", "g")
        .agg(F.sum("c").alias("c"))
        .localCheckpoint()
    )
    norms = prof.groupBy("lang").agg(
        F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("nrm"),
        F.count("*").alias("n_grams"),
    )
    a = prof.select(
        F.col("lang").alias("lang_a"), "g", F.col("c").alias("ca")
    )
    b = prof.select(
        F.col("lang").alias("lang_b"), "g", F.col("c").alias("cb")
    )
    dots = (
        a.join(b, (a.g == b.g) & (a.lang_a < b.lang_b))
        .groupBy("lang_a", "lang_b")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("dot"))
    )
    na = norms.select(
        F.col("lang").alias("lang_a"),
        F.col("nrm").alias("na"),
        F.col("n_grams").alias("n_grams_a"),
    )
    nb = norms.select(
        F.col("lang").alias("lang_b"),
        F.col("nrm").alias("nb"),
        F.col("n_grams").alias("n_grams_b"),
    )
    # lang-pair spine from the registry-bounded norm table, so
    # zero-overlap script pairs emit cosine 0 instead of vanishing
    spine = na.join(nb, F.col("lang_a") < F.col("lang_b"))
    return (
        spine.join(dots, ["lang_a", "lang_b"], "left")
        .select(
            "lang_a",
            "lang_b",
            F.round(
                F.coalesce(F.col("dot"), F.lit(0.0))
                / (F.col("na") * F.col("nb")),
                6,
            ).alias("cosine"),
            F.col("n_grams_a").cast("bigint").alias("n_grams_a"),
            F.col("n_grams_b").cast("bigint").alias("n_grams_b"),
        )
        .orderBy(F.desc("cosine"), "lang_a", "lang_b")
    )


RAKE_TOPK = 25  # keyphrase result page
# phrase delimiters: any stopword (word-bounded) or non-alphanumeric
# run; kept in ONE regex so both engines segment identically
RAKE_SPLIT = (
    r"\b(?:the|a|an|and|of|to|in|is|on|for)\b|[^a-z0-9 ]+"
)


@query(
    "rake_keyphrases",
    oracle=f"""
    WITH phrases AS (
        SELECT doc_id,
               trim(p) AS phrase
        FROM (
            SELECT doc_id,
                   unnest(string_split_regex(lower(text),
                          '{RAKE_SPLIT}')) AS p
            FROM documents
        )
        WHERE trim(p) <> '' AND length(trim(p)) >= 3
    ),
    pw AS (
        SELECT phrase,
               unnest(string_split_regex(phrase, ' +')) AS word,
               len(list_filter(string_split_regex(phrase, ' +'),
                   x -> x <> '')) AS plen
        FROM phrases
    ),
    wstats AS (
        SELECT word,
               COUNT(*) AS freq,
               SUM(plen - 1) AS degree
        FROM pw WHERE word <> '' GROUP BY 1
    ),
    pscore AS (
        SELECT p.phrase,
               COUNT(*) AS n_occur,
               ROUND(SUM((w.degree + w.freq) * 1.0 / w.freq), 6)
                   AS rake_score
        FROM (SELECT DISTINCT phrase FROM phrases) dp
        JOIN pw p ON p.phrase = dp.phrase
        JOIN wstats w ON w.word = p.word
        WHERE p.word <> ''
        GROUP BY p.phrase
    ),
    occ AS (
        SELECT phrase, COUNT(*) AS n_docs_hit
        FROM phrases GROUP BY 1
    )
    SELECT s.phrase,
           ROUND(s.rake_score / o.n_docs_hit, 6) AS rake_score,
           CAST(o.n_docs_hit AS BIGINT) AS n_occurrences
    FROM pscore s JOIN occ o USING (phrase)
    ORDER BY ROUND(s.rake_score / o.n_docs_hit, 6) DESC, s.phrase
    LIMIT {RAKE_TOPK}
    """,
)
def rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010) over the corpus:
    candidate phrases are the maximal token runs BETWEEN stopwords/
    punctuation, each word scores degree/frequency co-occurrence
    credit ((deg + freq)/freq here — the standard variant), and a
    phrase scores the sum over its words — multi-word domain terms
    outrank frequent single words by construction, which is exactly
    what `word_freq_topk` cannot do and `tfidf_top_terms` only does
    per document. The engine normalizes the phrase-occurrence sum
    per occurrence so corpus-frequent boilerplate phrases do not
    dominate on volume alone.

    Scale shape: one regex phrase split (the chunker's pass shape),
    a (phrase, word) explode, a VOCAB-grain word-stat aggregate
    joined back at word grain, a phrase-grain rollup, and a
    TakeOrdered 25-row page. Nothing pairwise, nothing
    corpus-grain after the phrase aggregate (phrase space is
    Heaps-bounded like the shingle tables)."""
    # r13 (guide §2.6/§6): spread the one-file verification scan so
    # the RAKE_SPLIT regex explode uses every core (no-op at scale)
    docs = spread_small_source(
        load_table(spark, sf_dir, "documents")
    )
    phrases = (
        docs.select(
            F.explode(
                F.split(F.lower(F.col("text")), RAKE_SPLIT)
            ).alias("p"),
        )
        .select(F.trim(F.col("p")).alias("phrase"))
        .filter(
            (F.col("phrase") != "") & (F.length("phrase") >= 3)
        )
    )
    # r13 (guide §2.3/§2.4): ONE phrase-grain aggregate carries the
    # occurrence multiplicity n; every downstream stage then runs at
    # DISTINCT-phrase grain (Heaps-bounded vocab), not occurrence
    # grain. The previous form referenced the corpus-wide regex
    # explode 3x (pw / distinct / occ) — 8 parquet scans of the text
    # column and occurrence-grain word explodes. Every statistic is
    # multiplicity-linear, so the weighted forms are exact:
    # freq = Σ n, degree = Σ (plen-1)·n, phrase-sum = n·Σ_words, and
    # the per-occurrence normalization divides n back out. Pinned:
    # three consumers, vocab-sized rows.
    ph = (
        phrases.groupBy("phrase")
        .agg(F.count("*").alias("n"))
        .localCheckpoint()
    )
    words_arr = F.filter(
        F.split(F.col("phrase"), " +"), lambda x: x != ""
    )
    pw = ph.select(
        "phrase",
        "n",
        F.explode(F.split(F.col("phrase"), " +")).alias("word"),
        F.size(words_arr).alias("plen"),
    ).filter(F.col("word") != "")
    wstats = pw.groupBy("word").agg(
        F.sum("n").alias("freq"),
        F.sum((F.col("plen") - 1) * F.col("n")).alias("degree"),
    )
    pscore = (
        pw.join(wstats, "word")
        .groupBy("phrase", "n")
        .agg(
            F.sum(
                (F.col("degree") + F.col("freq"))
                * 1.0
                / F.col("freq")
            ).alias("s")
        )
        .select(
            "phrase",
            "n",
            F.round(F.col("s") * F.col("n"), 6).alias("rake_score"),
        )
    )
    score = F.round(F.col("rake_score") / F.col("n"), 6)
    return (
        pscore.select(
            "phrase",
            score.alias("rake_score"),
            F.col("n").cast("bigint").alias("n_occurrences"),
        )
        .orderBy(F.desc("rake_score"), "phrase")
        .limit(RAKE_TOPK)
    )
