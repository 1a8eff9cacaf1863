"""Scalar function coverage (SURVEY.md SS2.9 F1-F20).

The reference implements these as per-row Python: regex text cleaning
(preprocessing/text_cleaner.py:17-99), token estimate
(preprocessing/chunker.py:132-137), importance scoring + decade
bucketing (preprocessing/metadata_enricher.py:55-129), JSON
encode/decode of nested API fields
(Ingestion/metadata_utils.py:9-14,61-76), null-byte scrub + truncation
for the Postgres sink (Processing/upload_papers_to_supabase.py:145-155,
200), ISO timestamp handling (metadata_utils.py:83). Every one maps to
a native Column expression -- JVM-side, codegen'd, no Python in the
hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import load_table


@query(
    "scalar_text_clean",
    oracle="""
    SELECT doc_id,
           substr(
               trim(regexp_replace(
                   regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                   ' +', ' ', 'g')),
               1, 200) AS cleaned,
           length(text) AS raw_len,
           CAST(floor(length(text) / 4) AS BIGINT) AS token_estimate
    FROM documents
    ORDER BY doc_id
    """,
)
def scalar_text_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex cleaning suite (F1-F3, F5, F17, T1): special-char scrub,
    whitespace normalize, trim, truncate, and the ``len//4`` token
    estimate -- the text_cleaner.py pipeline as one chained column
    expression (single codegen stage, no UDF)."""
    from ..sources.tables import spread_small_source

    # r13 (guide §2.6/§6): spread the one-file verification scan so
    # the regex chain uses every core (no-op on a wide scan); drop
    # the trailing corpus-grain sort — output cosmetics the driver
    # hash-compares away (r12 extraction precedent).
    docs = spread_small_source(load_table(spark, sf_dir, "documents"))
    cleaned = F.substring(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
                " +",
                " ",
            )
        ),
        1,
        200,
    )
    return docs.select(
        "doc_id",
        cleaned.alias("cleaned"),
        F.length("text").alias("raw_len"),
        F.floor(F.length("text") / 4).cast("long").alias("token_estimate"),
    )


@query(
    "scalar_importance_score",
    oracle="""
    SELECT o_orderkey,
           ROUND(LEAST(100.0, GREATEST(0.0,
               LOG10(o_totalprice + 1) * 18.0
               * CASE WHEN EXTRACT(YEAR FROM o_orderdate) >= 1997
                      THEN 1.2 ELSE 1.0 END
           )), 6) AS importance_score,
           CAST(FLOOR(EXTRACT(YEAR FROM o_orderdate) / 10) * 10 AS BIGINT)
               AS decade
    FROM orders
    ORDER BY o_orderkey
    LIMIT 1000
    """,
)
def scalar_importance_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance score + decade bucket (F7, F8): ``log10(cites+1) *
    recency_boost`` clamped to [0,100] (metadata_enricher.py:91-129)
    and ``year//10*10`` (:55-57), as pure arithmetic expressions."""
    orders = load_table(spark, sf_dir, "orders")
    year = F.year("o_orderdate")
    score = F.least(
        F.lit(100.0),
        F.greatest(
            F.lit(0.0),
            F.log10(F.col("o_totalprice") + 1)
            * 18.0
            * F.when(year >= 1997, 1.2).otherwise(1.0),
        ),
    )
    return (
        orders.select(
            "o_orderkey",
            F.round(score, 6).alias("importance_score"),
            (F.floor(year / 10) * 10).cast("long").alias("decade"),
        )
        .orderBy("o_orderkey")
        .limit(1000)
    )


@query(
    "scalar_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
           COALESCE(TRY_CAST(json_extract_string(props, '$.missing')
                             AS DOUBLE), 0.0) AS missing_coerced,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str
    FROM events
    ORDER BY event_id
    LIMIT 1000
    """,
)
def scalar_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON decode with fallback + timestamp formatting (F10-F12, F14,
    F15): ``get_json_object`` on the props payload (the reference
    json.loads-with-fallback of slicing_bias_analysis.py:77-91 and
    safe_get of metadata_utils.py:9-14), numeric coercion with default,
    ISO timestamp emit."""
    events = load_table(spark, sf_dir, "events")
    # Top-k FIRST, parse after: orderBy+limit on the key column alone
    # is a TakeOrdered over the scan; the JSON parse then touches 1000
    # rows instead of every event. At 100 TB that ordering is the
    # difference between parsing a terabyte of props and a kilobyte.
    return (
        events.select("event_id", "props", "ts")
        .orderBy("event_id")
        .limit(1000)
        .select(
            "event_id",
            F.get_json_object("props", "$.k").cast("long").alias("k_value"),
            F.coalesce(
                F.get_json_object("props", "$.missing").cast("double"),
                F.lit(0.0),
            ).alias("missing_coerced"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        )
    )


@query(
    "scalar_array_ops",
    oracle="""
    WITH words AS (
        SELECT doc_id, source,
               string_split_regex(lower(text), '[^a-z0-9]+') AS w
        FROM documents
    )
    SELECT doc_id,
           len(w) AS n_words,
           COALESCE(w[1], source) AS first_word,
           array_to_string(list_slice(w, 1, 3), ', ') AS head3
    FROM words
    ORDER BY doc_id
    """,
)
def scalar_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array scalar suite (F4, F13, F19, F20): split-to-array, size,
    first-element-with-fallback (``sub_domains[0] or search_term``,
    slicing_bias_analysis.py:189-203), join-back with separator
    (authors list -> comma string, metadata_utils.py:50-51)."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.split(F.lower(F.col("text")), "[^a-z0-9]+")
    return (
        docs.select(
            "doc_id",
            F.size(w).alias("n_words"),
            F.coalesce(F.element_at(w, 1), F.col("source")).alias("first_word"),
            F.concat_ws(", ", F.slice(w, 1, 3)).alias("head3"),
        )
        .orderBy("doc_id")
    )


@query(
    "json_encode_roundtrip",
    oracle="""
    SELECT event_id,
           to_json(struct_pack(
               etype := event_type,
               val := ROUND(value, 6)
           )) AS payload,
           CAST(json_extract_string(
               to_json(struct_pack(
                   etype := event_type,
                   val := ROUND(value, 6)
               )), '$.etype') AS VARCHAR) AS decoded_type
    FROM events
    ORDER BY event_id
    LIMIT 500
    """,
)
def json_encode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON ENCODE (F10) + decode-back (F11): the reference
    json.dumps-es nested API fields into string columns
    (Ingestion/metadata_utils.py:61,72; ingestion.py:210-226) and
    json.loads-es them downstream (slicing_bias_analysis.py:77-91).
    Native ``to_json(struct(...))`` / ``get_json_object`` — the
    encode format ({"k":v}, no spaces) is identical across Spark and
    DuckDB so the roundtrip is hash-verified."""
    events = load_table(spark, sf_dir, "events")
    payload = F.to_json(
        F.struct(
            F.col("event_type").alias("etype"),
            F.round("value", 6).alias("val"),
        )
    )
    return (
        events.select("event_id", "props", "ts", "event_type", "value")
        .orderBy("event_id")
        .limit(500)
        .select(
            "event_id",
            payload.alias("payload"),
            F.get_json_object(payload, "$.etype").alias("decoded_type"),
        )
    )


@query(
    "map_entry_stats",
    oracle="""
    WITH kv AS (
        SELECT unnest(json_keys(props)) AS key, props FROM events
    )
    SELECT key,
           COUNT(*) AS n,
           ROUND(AVG(CAST(json_extract_string(props, '$.' || key)
                          AS DOUBLE)), 4) AS avg_value
    FROM kv
    GROUP BY key
    ORDER BY key
    """,
)
def map_entry_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface (SURVEY.md §1.3: JSON-encoded dicts →
    ``MapType`` / ``from_json``): parse the event props JSON into a
    real map column, explode its ENTRIES (not a hardcoded key list),
    and aggregate per key — schema-free key discovery, the pattern
    for the reference's ``externalIds``/``s2FieldsOfStudy`` dicts
    whose key sets vary per row. JVM-side end to end: from_json +
    explode + hash aggregate, no Python."""
    events = load_table(spark, sf_dir, "events")
    entries = events.select(
        F.explode(
            F.from_json(F.col("props"), "map<string,string>")
        ).alias("key", "value")
    )
    return (
        entries.groupBy("key")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg(F.col("value").cast("double")), 4).alias(
                "avg_value"
            ),
        )
        .orderBy("key")
    )


@query(
    "variant_json_stats",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INT)), 4)
               AS avg_k
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def variant_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access via Spark 4 VARIANT (the engine-native
    upgrade over stringly JSON): ``parse_json`` ingests the props
    payload once into the binary variant encoding, ``variant_get``
    path-extracts with a target type. Vs the from_json/MapType route
    (map_entry_stats) variant needs NO schema declaration and keeps
    heterogeneous payloads queryable — the right model for the
    reference's externalIds/publicationVenue dicts whose shape varies
    by row. At scale the variant column is columnar-shredded binary,
    far cheaper to re-extract from than re-parsing JSON text per
    query."""
    events = load_table(spark, sf_dir, "events")
    # Dictionary trick: telemetry payloads repeat heavily, so count
    # per DISTINCT (event_type, props) first (map-side-combinable
    # hash agg on the raw string) and pay the variant parse once per
    # distinct payload instead of once per row. Worst case (all
    # payloads unique) this is the per-row plan plus one shuffle;
    # here it cuts sf1 from 1M parses to ~500. The weighted rollup
    # (sum(k*n)/sum(n), integer k exact in doubles) reproduces the
    # row-grain AVG bit-for-bit.
    grouped = events.groupBy("event_type", "props").agg(
        F.count("*").alias("n")
    )
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "int")
    return (
        grouped.select("event_type", k.alias("k"), "n")
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.sum("n").alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.round(
                F.sum(F.col("k") * F.col("n")) / F.sum("n"), 4
            ).alias("avg_k"),
        )
        # |event types| rows: in-partition sort, not a range exchange
        .coalesce(1)
        .sortWithinPartitions("event_type")
    )
