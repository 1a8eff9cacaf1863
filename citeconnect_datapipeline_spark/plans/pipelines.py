"""End-to-end composed pipelines (SURVEY.md §3): the reference's DAG
stages as single lazily-built DataFrame plans.

The reference runs its flow as Airflow tasks passing state through
GCS files and subprocesses (dags/test_dag.py:750-751): collection ->
preprocessing -> bias slicing -> mitigation loop -> validation ->
upload. Here each composite is ONE declarative plan — Catalyst sees
the whole lineage, so column pruning, filter pushdown and shuffle
planning happen across stage boundaries that in the reference are
opaque process hops (SURVEY.md §3.1 "Spark restatement").
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import load_table, spread_small_source

# Shared clean expression (T1 suite, matches scalar_text_clean).
def _cleaned(col):
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(col), "[^a-z0-9 ]", " "), " +", " "
        )
    )


def _first_keyword_domain(col):
    """F9 keyword classify, first-occurrence priority: the EARLIEST
    matching keyword decides the domain (the reference scans keyword
    lists in order, metadata_enricher.py:150-170). regexp_extract
    returns the first match in both Spark and DuckDB, so the oracle
    replays it exactly — and unlike an any-match rlike chain it
    actually discriminates on keyword-dense synthetic text."""
    key = F.regexp_extract(col, "(join|window|agg|hash|stream)", 1)
    return (
        F.when(key == "join", "relational")
        .when(key == "window", "analytics")
        .when(key == "agg", "aggregation")
        .when(key == "hash", "dedup")
        .when(key == "stream", "streaming")
        .otherwise("general")
    )


@query(
    "papers_pipeline_e2e",
    oracle="""
    WITH cleaned AS (
        SELECT doc_id, lang, n_chars,
               trim(regexp_replace(
                   regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                   ' +', ' ', 'g')) AS content
        FROM documents
    ), filtered AS (
        SELECT * FROM cleaned WHERE length(content) >= 200
    ), enriched AS (
        SELECT doc_id, lang, n_chars, content,
               CASE regexp_extract(content, '(join|window|agg|hash|stream)', 1)
                    WHEN 'join' THEN 'relational'
                    WHEN 'window' THEN 'analytics'
                    WHEN 'agg' THEN 'aggregation'
                    WHEN 'hash' THEN 'dedup'
                    WHEN 'stream' THEN 'streaming'
                    ELSE 'general' END AS domain,
               ROUND(LEAST(100.0, log10(n_chars + 1) * 25
                     + CASE WHEN lang = 'en' THEN 10 ELSE 0 END), 4)
                   AS importance
        FROM filtered
    ), deduped AS (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY md5(content) ORDER BY doc_id
            ) AS rn FROM enriched
        ) WHERE rn = 1
    )
    SELECT domain, COUNT(*) AS n_docs,
           ROUND(AVG(importance), 4) AS mean_importance,
           ROUND(AVG(length(content)), 2) AS mean_len
    FROM deduped
    GROUP BY domain
    ORDER BY domain
    """,
)
def papers_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's stages 2-7 as ONE plan (§3.1): clean (T1) ->
    min-length filter (P4) -> enrich domain+importance (T8/F7/F9) ->
    content-hash dedup keep-first (D2, deterministic doc_id tie-break)
    -> bias-slice aggregation (A1). In the reference each arrow is a
    process/file boundary; here Catalyst prunes columns through the
    whole lineage (only text/lang/n_chars are scanned) and the dedup
    window + final agg are the only shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    content = _cleaned(F.col("text"))
    enriched = (
        docs.select(
            "doc_id", "lang", "n_chars", content.alias("content")
        )
        .filter(F.length("content") >= 200)
        .select(
            "doc_id",
            "lang",
            "n_chars",
            "content",
            _first_keyword_domain(F.col("content")).alias("domain"),
            F.round(
                F.least(
                    F.lit(100.0),
                    F.log10(F.col("n_chars") + 1) * 25
                    + F.when(F.col("lang") == "en", 10.0).otherwise(0.0),
                ),
                4,
            ).alias("importance"),
        )
    )
    w = Window.partitionBy(F.md5("content")).orderBy("doc_id")
    deduped = (
        enriched.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return (
        deduped.groupBy("domain")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("importance"), 4).alias("mean_importance"),
            F.round(F.avg(F.length("content")), 2).alias("mean_len"),
        )
        .orderBy("domain")
    )


@query(
    "mitigation_recommendations",
    oracle="""
    WITH slices AS (
        SELECT CASE regexp_extract(lower(text),
                    '(join|window|agg|hash|stream)', 1)
                    WHEN 'join' THEN 'relational'
                    WHEN 'window' THEN 'analytics'
                    WHEN 'agg' THEN 'aggregation'
                    WHEN 'hash' THEN 'dedup'
                    WHEN 'stream' THEN 'streaming'
                    ELSE 'general' END AS domain,
               COUNT(*) AS n_docs
        FROM documents
        GROUP BY 1
    ), stats AS (
        SELECT MAX(n_docs) AS max_docs FROM slices
    )
    SELECT domain, n_docs,
           CAST(max_docs - n_docs AS BIGINT) AS papers_needed,
           CASE WHEN n_docs < max_docs * 0.5 THEN 'high'
                ELSE 'medium' END AS priority
    FROM slices, stats
    WHERE n_docs < max_docs
    ORDER BY (CASE WHEN n_docs < max_docs * 0.5 THEN 'high'
              ELSE 'medium' END = 'high') DESC,
             papers_needed DESC, domain
    """,
)
def mitigation_recommendations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bias-mitigation decision step (§3.1 stage 5, A3+A11+O4):
    slice counts per domain -> under-represented set vs the largest
    slice -> papers_needed gap + priority -> priority-sorted
    collection recommendations (bias_mitigation_collector.py:19-68,
    378-457). The reference re-invokes the whole ingest pipeline per
    recommendation; here the output IS the work list an ingest
    connector (sources.api_ingest) would fan out over — the feedback
    loop's aggregate->decide step as one plan with a single groupBy
    and a broadcast of the 1-row max."""
    docs = load_table(spark, sf_dir, "documents")
    slices = (
        docs.select(
            _first_keyword_domain(F.lower(F.col("text"))).alias("domain")
        )
        .groupBy("domain")
        .agg(F.count("*").alias("n_docs"))
    )
    stats = slices.agg(F.max("n_docs").alias("max_docs"))
    priority = F.when(
        F.col("n_docs") < F.col("max_docs") * 0.5, "high"
    ).otherwise("medium")
    return (
        slices.join(F.broadcast(stats))
        .filter(F.col("n_docs") < F.col("max_docs"))
        .select(
            "domain",
            "n_docs",
            (F.col("max_docs") - F.col("n_docs"))
            .cast("long")
            .alias("papers_needed"),
            priority.alias("priority"),
        )
        .orderBy(
            F.desc(F.col("priority") == "high"),
            F.desc("papers_needed"),
            "domain",
        )
    )


def run_mitigation_cycle(
    spark: SparkSession,
    recommendations: DataFrame,
    reingest=None,
    max_fetch_per_domain: int = 1000,
) -> DataFrame:
    """Close the bias-mitigation feedback loop (§3.1 stage 5): the
    ``mitigation_recommendations`` aggregate drives a PARAMETERIZED
    re-ingest — one targeted collection per under-represented domain,
    capped at that domain's ``papers_needed`` — and returns the
    fetched papers tagged with ``target_domain``, ready to union into
    the corpus and re-slice. The reference's
    ``run_full_mitigation_cycle``
    (databias/bias_mitigation_collector.py:378-457) re-invokes its
    whole collection pipeline per recommendation through process
    environment mutation; here every parameter is EXPLICIT (SURVEY
    §7.4): term and limit flow as DataSource options, nothing reads
    env state.

    ``reingest(spark, term, cap) -> DataFrame`` defaults to the
    registered ``paper_search`` DataSource (S1) with term/limit
    options — the fully idiomatic re-collection path whose scan fans
    out one rate-limited task per term. The driver loop is over the
    RECOMMENDATIONS (one row per domain slice — a bounded aggregate
    by construction, guarded at 10k), never over data; each fetch is
    its own distributed scan, exactly the reference's
    per-recommendation re-invocation without the process hop."""
    if reingest is None:

        def reingest(sp: SparkSession, term: str, cap: int) -> DataFrame:
            return (
                sp.read.format("paper_search")
                .option("terms", term)
                .option("max_results", str(cap))
                .load()
            )

    recs = [
        r.asDict()
        for r in recommendations.select(
            "domain", "papers_needed"
        ).limit(10_001).collect()
    ]
    if len(recs) > 10_000:
        raise ValueError(
            "run_mitigation_cycle: recommendations must be a per-slice "
            "aggregate, not a table"
        )
    fetched: DataFrame | None = None
    for rec in recs:
        cap = min(int(rec["papers_needed"]), max_fetch_per_domain)
        if cap <= 0:
            continue
        part = reingest(spark, rec["domain"], cap).withColumn(
            "target_domain", F.lit(rec["domain"])
        )
        fetched = part if fetched is None else fetched.unionByName(part)
    if fetched is None:
        from ..sources.api_ingest import PAPER_SCHEMA

        return spark.createDataFrame(
            [], PAPER_SCHEMA.add("target_domain", "string")
        )
    return fetched


@query("chunk_embed_search_e2e")  # rows-only: model inference not SQL
def chunk_embed_search_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The embedding service end-to-end (§3.3): select content ->
    clean (T1) -> chunk 1->N (T2) -> batch-embed chunks (T4, fake
    deterministic encoder) -> cosine top-10 against a driver-encoded
    query vector (T5/T6). One plan: the chunker explode and the
    mapInPandas embed stage pipeline without a barrier, and the
    query vector is broadcast as a literal — the reference's
    process_domain + search flow (services/embedding_service.py:
    68-331, embed_generator.py:288-305) with no pickle files and no
    in-memory [N, dim] matrix."""
    from ..operators.similarity import _FakeModel, _dot

    # r13 (guide §2.6/§4.5): the one-file verification scan fed the
    # chunk explode AND the mapInPandas encoder on a single core;
    # the conditional spread fans the Python embed stage across
    # every worker (no-op on an already-wide scan)
    docs = spread_small_source(load_table(spark, sf_dir, "documents"))
    content = _cleaned(F.col("text"))
    # sentence-ish chunks: fixed 40-word windows with 10-word overlap
    words = F.split(content, " ")
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(words) - 9, F.lit(1)), F.lit(30)
    )
    chunks = docs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                starts, lambda s: F.concat_ws(" ", F.slice(words, s, 40))
            )
        ).alias("chunk_pos", "chunk_text"),
    ).filter(F.length("chunk_text") > 0)

    def embed(batches):
        model = _FakeModel.get()
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "chunk_pos": pdf["chunk_pos"],
                    "embedding": model.encode(pdf["chunk_text"].tolist()),
                }
            )

    embedded = chunks.mapInPandas(
        embed,
        "doc_id long, chunk_pos int, embedding array<float>",
    )
    qvec = _FakeModel.get().encode(["spark query table join"])[0]
    q = F.array(*[F.lit(float(x)) for x in qvec])
    sim = _dot(F.col("embedding").cast("array<double>"), q)
    return (
        embedded.select(
            "doc_id",
            "chunk_pos",
            F.round(sim, 6).alias("similarity"),
        )
        .orderBy(F.desc("similarity"), "doc_id", "chunk_pos")
        .limit(10)
    )


@query(
    "curation_pipeline_e2e",
    oracle="""
    WITH hashed AS (
        SELECT doc_id, lang, n_chars, text,
               md5(lower(text)) AS content_hash
        FROM documents
    ),
    deduped AS (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (
                       PARTITION BY content_hash ORDER BY doc_id
                   ) AS rn
            FROM hashed
        ) WHERE rn = 1
    ),
    scored AS (
        SELECT doc_id, lang, n_chars,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS w
        FROM deduped
    ),
    gated AS (
        SELECT doc_id, lang, n_chars,
               len(w) AS n_tokens,
               CAST(len(list_distinct(w)) AS DOUBLE)
                   / GREATEST(len(w), 1) AS ttr
        FROM scored
        WHERE len(w) >= 20
          AND CAST(len(list_distinct(w)) AS DOUBLE)
              / GREATEST(len(w), 1) >= 0.3
    ),
    tagged AS (
        SELECT lang, n_chars, n_tokens, ttr,
               CASE WHEN (ascii(substring(md5(CAST(doc_id AS VARCHAR)),
                                          1, 1)) * 31
                          + ascii(substring(md5(CAST(doc_id AS VARCHAR)),
                                            2, 1))) % 100 < 80
                    THEN 'train'
                    WHEN (ascii(substring(md5(CAST(doc_id AS VARCHAR)),
                                          1, 1)) * 31
                          + ascii(substring(md5(CAST(doc_id AS VARCHAR)),
                                            2, 1))) % 100 < 90
                    THEN 'valid'
                    ELSE 'test' END AS split
        FROM gated
    )
    SELECT split, lang,
           COUNT(*) AS n_docs,
           ROUND(AVG(n_chars), 4) AS avg_chars,
           ROUND(AVG(ttr), 6) AS avg_ttr
    FROM tagged
    GROUP BY split, lang
    ORDER BY split, lang
    """,
)
def curation_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-data curation flow as ONE lazy DAG (the
    task-mandate composition: dedup -> quality gate -> deterministic
    split -> per-cohort stats):

      documents -> exact-content dedup (keep-first by hash)
                -> quality gates (min tokens, min type-token ratio —
                   drops boilerplate/repetitive docs)
                -> hash-derived 80/10/10 split tag (shard-stable,
                   no RNG, no row order)
                -> (split, lang) cohort summary.

    Plan shape at 100 TB: the dedup window shuffles on content_hash
    (uniform by construction); every later step is a narrow
    projection until the final small rollup — Catalyst collapses the
    whole chain into two exchanges total. The reference runs these as
    four separate jobs with parquet round-trips between
    (dedup in upload, quality in validator, no split, slices in
    databias); here intermediate state never touches storage."""
    docs = load_table(spark, sf_dir, "documents")
    w_all = F.split(F.lower(F.col("text")), "[^a-z0-9]+")
    dedup_w = Window.partitionBy("content_hash").orderBy("doc_id")
    deduped = (
        docs.select(
            "doc_id",
            "lang",
            "n_chars",
            "text",
            F.md5(F.lower(F.col("text"))).alias("content_hash"),
        )
        .withColumn("rn", F.row_number().over(dedup_w))
        .filter(F.col("rn") == 1)
    )
    w = F.filter(w_all, lambda x: x != "")
    ttr = F.size(F.array_distinct(w)).cast("double") / F.greatest(
        F.size(w), F.lit(1)
    )
    gated = deduped.select(
        "doc_id",
        "lang",
        "n_chars",
        F.size(w).alias("n_tokens"),
        ttr.alias("ttr"),
    ).filter((F.col("n_tokens") >= 20) & (F.col("ttr") >= 0.3))
    bucket = (
        F.ascii(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1))
        * 31
        + F.ascii(F.substring(F.md5(F.col("doc_id").cast("string")), 2, 1))
    ) % 100
    split = (
        F.when(bucket < 80, "train")
        .when(bucket < 90, "valid")
        .otherwise("test")
    )
    return (
        gated.select(split.alias("split"), "lang", "n_chars", "ttr")
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.round(F.avg("ttr"), 6).alias("avg_ttr"),
        )
        .orderBy("split", "lang")
    )


@query("sentence_chunk_embed_e2e")  # rows-only: sentence accumulation
# + model inference are not SQL-expressible
def sentence_chunk_embed_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's ACTUAL embedding flow at chunk-boundary
    fidelity (§3.3 with the real chunker): clean (T1) →
    sentence-preserving 512-token-style chunking (T2,
    chunker.py:53-124) → batch-embed (T4) → cosine top-10 (T5/T6).
    ``chunk_embed_search_e2e`` uses uniform windows; this variant
    produces the chunk boundaries the reference's embeddings actually
    see, so downstream similarity results are comparable run-for-run.

    Scale shape: chunking and embedding are FUSED into ONE
    mapInPandas stage — the chunk explosion happens inside the same
    Arrow batch that feeds the encoder, so intermediate chunks never
    cross a stage boundary (no second Python round-trip, no shuffle;
    the reference pickles chunks to GCS between these steps). The
    scaled-down budget matches chunk_documents_sentences."""
    from ..operators.similarity import _FakeModel, _dot
    from ..operators.text import _chunk_text_sentence_preserving

    chunk_size, overlap, min_chunk = 64, 16, 40
    # r13: same conditional spread as chunk_embed_search_e2e — the
    # fused chunk+encode Python stage otherwise runs on the single
    # scan task the one-file verification lake produces
    docs = spread_small_source(
        load_table(spark, sf_dir, "documents")
    ).select("doc_id", _cleaned(F.col("text")).alias("content"))

    def chunk_and_embed(batches):
        model = _FakeModel.get()
        for pdf in batches:
            ids, poss, texts = [], [], []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                for pos, t, _tok, _sc, _ec in (
                    _chunk_text_sentence_preserving(
                        content, chunk_size, overlap, min_chunk
                    )
                ):
                    ids.append(doc_id)
                    poss.append(pos)
                    texts.append(t)
            vecs = model.encode(texts) if texts else []
            yield pd.DataFrame(
                {"doc_id": ids, "chunk_pos": poss, "embedding": list(vecs)}
            )

    embedded = docs.mapInPandas(
        chunk_and_embed,
        "doc_id long, chunk_pos int, embedding array<float>",
    )
    qvec = _FakeModel.get().encode(["spark query table join"])[0]
    q = F.array(*[F.lit(float(x)) for x in qvec])
    sim = _dot(F.col("embedding").cast("array<double>"), q)
    return (
        embedded.select(
            "doc_id",
            "chunk_pos",
            F.round(sim, 6).alias("similarity"),
        )
        .orderBy(F.desc("similarity"), "doc_id", "chunk_pos")
        .limit(10)
    )
