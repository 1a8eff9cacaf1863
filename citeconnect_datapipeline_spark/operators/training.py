"""Training-data curation operators beyond the reference's surface:
deterministic train/valid/test splitting, benchmark-contamination
detection, and distribution-drift scoring (PSI).

The reference stops at dedup + bias slices; a pipeline feeding model
training also needs (a) a split that is stable under re-runs and
shard-parallel (hash of the key, never row order or RNG state),
(b) an n-gram overlap check of candidate training docs against an
evaluation/benchmark set (train-on-test contamination is the classic
LLM-data failure), and (c) a drift statistic between cohorts/runs
(population stability index) to alert on distribution shift, the
continuous version of the reference's z-score anomaly check
(Validation/schema_validator.py:68-133).

All three are pure DataFrame plans -- one or two shuffles each, no
Python in the hot path -- and all three carry DuckDB oracles: the
split bucket is derived from md5 (identical in both engines, unlike
xxhash64/hash), and contamination counts are hash-agnostic because
shingle sets are compared by cardinality, not value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import load_table
from .dedup import _shingle_hashes

# 80/10/10 split over a 0-99 hash bucket.
TRAIN_CUT, VALID_CUT = 80, 90

# Every 50th doc stands in for a held-out benchmark/eval set.
BENCHMARK_STRIDE = 50


def _hash_bucket(key):
    """Deterministic 0-99 bucket from md5 of the key, using only
    functions with identical semantics in Spark and DuckDB (md5,
    substring, ascii). Hash-derived -> stable under re-runs, shard
    order, and resharding; never RNG- or row-order-based."""
    h = F.md5(key.cast("string"))
    return (
        F.ascii(F.substring(h, 1, 1)) * 31 + F.ascii(F.substring(h, 2, 1))
    ) % 100


@query(
    "train_test_split",
    oracle=f"""
    WITH bucketed AS (
        SELECT doc_id, n_chars,
               (ascii(substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 31
                + ascii(substring(md5(CAST(doc_id AS VARCHAR)), 2, 1))) % 100
                   AS bucket
        FROM documents
    )
    SELECT CASE WHEN bucket < {TRAIN_CUT} THEN 'train'
                WHEN bucket < {VALID_CUT} THEN 'valid'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           ROUND(AVG(n_chars), 4) AS avg_chars
    FROM bucketed
    GROUP BY 1
    ORDER BY split
    """,
)
def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/valid/test split summary. The
    split column is a narrow projection (no shuffle); only this
    summary aggregates. At 100 TB the same expression tags every
    shard independently -- no global sort, sample, or state."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = _hash_bucket(F.col("doc_id"))
    split = (
        F.when(bucket < TRAIN_CUT, "train")
        .when(bucket < VALID_CUT, "valid")
        .otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
        .orderBy("split")
    )


@query(
    "benchmark_contamination",
    oracle=f"""
    WITH words AS (
        SELECT doc_id, string_split_regex(lower(text), '[^a-z0-9]+') AS w
        FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               array_to_string(list_slice(w, i, i + 2), ' ') AS shingle
        FROM words, UNNEST(range(1, greatest(len(w) - 1, 2))) AS t(i)
        WHERE array_to_string(list_slice(w, i, i + 2), ' ') <> ''
    )
    SELECT c.doc_id AS cand_id, b.doc_id AS bench_id,
           COUNT(*) AS n_shared
    FROM sh c JOIN sh b ON c.shingle = b.shingle
    WHERE b.doc_id % {BENCHMARK_STRIDE} = 0
      AND c.doc_id % {BENCHMARK_STRIDE} <> 0
    GROUP BY c.doc_id, b.doc_id
    ORDER BY n_shared DESC, cand_id, bench_id
    LIMIT 20
    """,
)
def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-on-test contamination check: candidate training docs
    ranked by the number of distinct 3-word shingles they share with
    any benchmark doc (top-20, total tie-break). Same blocked-join
    shape as ngram_jaccard_topk but asymmetric: the benchmark side is
    tiny (1/{BENCHMARK_STRIDE} of docs; a real eval set is KBs, not
    TBs), so at scale its shingle table broadcasts and the check is a
    map-side join over the candidate scan -- no candidate-side
    shuffle. Shared-shingle counts are identical between the hashed
    (Spark) and string (oracle) shingle representations because only
    set cardinality matters."""
    docs = load_table(spark, sf_dir, "documents")
    sh = _shingle_hashes(docs)
    bench = F.broadcast(
        sh.filter(F.col("doc_id") % BENCHMARK_STRIDE == 0)
        .withColumnRenamed("doc_id", "bench_id")
    )
    cand = sh.filter(F.col("doc_id") % BENCHMARK_STRIDE != 0)
    return (
        cand.join(bench, "sh")
        .groupBy(
            F.col("doc_id").alias("cand_id"), F.col("bench_id")
        )
        .agg(F.count("*").alias("n_shared"))
        .orderBy(F.desc("n_shared"), "cand_id", "bench_id")
        .limit(20)
    )


@query(
    "class_balance_sample",
    oracle="""
    WITH sized AS (
        SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1
    ),
    target AS (SELECT MIN(n) AS t FROM sized),
    ranked AS (
        SELECT doc_id, lang, n_chars,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rn
        FROM documents
    )
    SELECT lang, COUNT(*) AS n_kept, ROUND(AVG(n_chars), 4) AS avg_chars
    FROM ranked, target
    WHERE rn <= t
    GROUP BY lang
    ORDER BY lang
    """,
)
def class_balance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling: equalize group sizes (here per
    ``lang``) by keeping the first ``min(group size)`` rows per group
    in md5-of-key order -- a deterministic, re-run-stable stand-in for
    random undersampling (no RNG, no row order; the md5 sort IS the
    shuffle). The balanced-class training set is the standard fix for
    the group imbalance the reference's bias module only *reports*
    (databias/slicing_bias_analysis.py:300-319) -- this operator closes
    that loop in-engine.

    Plan shape: one groupBy for sizes (rows = |groups|, broadcast
    back), one window shuffle on the group key. Skewed groups are the
    watch item at 100 TB -- the window partitions by class, so a
    dominant class lands on one task; production splits it with a
    salted two-phase rank or samples pre-aggregated shards."""
    docs = load_table(spark, sf_dir, "documents")
    target = F.broadcast(
        docs.groupBy("lang")
        .count()
        .agg(F.min("count").alias("t"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("doc_id", "lang", "n_chars")
        .withColumn("rn", F.row_number().over(w))
        .join(target)
        .filter(F.col("rn") <= F.col("t"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
        .orderBy("lang")
    )


@query(
    "distribution_psi_drift",
    oracle="""
    WITH counts AS (
        SELECT event_type,
               user_id % 2 AS cohort,
               COUNT(*) AS n
        FROM events
        GROUP BY 1, 2
    ),
    totals AS (
        SELECT cohort, SUM(n) AS total FROM counts GROUP BY 1
    ),
    props AS (
        SELECT c.event_type,
               SUM(CASE WHEN c.cohort = 0
                   THEN CAST(c.n AS DOUBLE) / t.total END) AS p0,
               SUM(CASE WHEN c.cohort = 1
                   THEN CAST(c.n AS DOUBLE) / t.total END) AS p1
        FROM counts c JOIN totals t ON c.cohort = t.cohort
        GROUP BY 1
    )
    SELECT COUNT(*) AS n_categories,
           ROUND(SUM((p0 - p1) * LN(p0 / p1)), 6) AS psi
    FROM props
    """,
)
def distribution_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift between two cohorts (here
    ``user_id % 2``; in production, this-run vs last-run or this-week
    vs last-week partitions). PSI = sum (p_a - p_b) * ln(p_a / p_b)
    over the category distribution -- the standard drift alarm
    (<0.1 stable, >0.25 shifted), generalizing the reference's
    count-z-score anomaly to whole distributions.

    Plan shape: one partial-aggregated groupBy over the fact table,
    then arithmetic over a category-sized frame -- drift on 100 TB
    costs one scan + one tiny shuffle."""
    events = load_table(spark, sf_dir, "events")
    counts = (
        events.groupBy(
            "event_type", (F.col("user_id") % 2).alias("cohort")
        ).agg(F.count("*").alias("n"))
    )
    totals = counts.groupBy("cohort").agg(F.sum("n").alias("total"))
    props = (
        counts.join(totals, "cohort")
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(
                    F.col("cohort") == 0,
                    F.col("n").cast("double") / F.col("total"),
                )
            ).alias("p0"),
            F.sum(
                F.when(
                    F.col("cohort") == 1,
                    F.col("n").cast("double") / F.col("total"),
                )
            ).alias("p1"),
        )
    )
    return props.agg(
        F.count("*").alias("n_categories"),
        F.round(
            F.sum(
                (F.col("p0") - F.col("p1"))
                * F.log(F.col("p0") / F.col("p1"))
            ),
            6,
        ).alias("psi"),
    )


@query(
    "stratified_sample",
    oracle="""
    WITH tagged AS (
        SELECT doc_id, lang, n_chars,
               (ascii(substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 31
                + ascii(substring(md5(CAST(doc_id AS VARCHAR)), 2, 1)))
                   % 100 AS bucket
        FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_sampled,
           ROUND(AVG(n_chars), 4) AS avg_chars,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
    FROM tagged
    WHERE CASE WHEN lang = 'en' THEN bucket < 10 ELSE bucket < 50 END
    GROUP BY lang
    ORDER BY lang
    """,
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum sampling — ``df.sampleBy`` without
    its RNG: each stratum gets its own keep fraction (downsample the
    dominant language to 10%, keep half of everything else), decided
    by the SAME md5-derived bucket as train_test_split, so the sample
    is stable across runs, shards, and row order — the property that
    makes a curation sample reproducible and auditable.

    Shuffle-free tagging (narrow projection) + one rollup to report
    per-stratum sample sizes; at 100 TB the filter prunes before
    anything else runs. The fraction map is a literal here; a
    production call takes it as a dict parameter."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.ascii(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1))
        * 31
        + F.ascii(F.substring(F.md5(F.col("doc_id").cast("string")), 2, 1))
    ) % 100
    keep = F.when(F.col("lang") == "en", bucket < 10).otherwise(
        bucket < 50
    )
    return (
        docs.filter(keep)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_sampled"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .orderBy("lang")
    )


@query(
    "seq_length_histogram",
    oracle="""
    WITH toks AS (
        SELECT CAST(length(text) // 4 AS BIGINT) AS n_tokens
        FROM documents
    ),
    bucketed AS (
        SELECT CAST(n_tokens // 16 * 16 AS BIGINT) AS bucket_lo,
               n_tokens
        FROM toks
    )
    SELECT bucket_lo,
           bucket_lo + 16 AS bucket_hi,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           ROUND(COUNT(*) * 100.0 / SUM(COUNT(*)) OVER (), 4) AS pct_docs
    FROM bucketed
    GROUP BY bucket_lo
    ORDER BY bucket_lo
    """,
)
def seq_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length distribution — what sizes batch packing, bins
    bucketed batching, and sets max_seq_len truncation budgets: docs
    histogrammed into 16-token buckets with doc share and total-token
    mass per bucket (the token MASS, not the doc count, is what an
    epoch actually costs).

    One narrow projection + one groupBy on the bucket key; the share
    column rides a single-partition window over the (tiny) bucket
    rollup, not the data."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.floor(F.length("text") / 4)
    bucket = (F.floor(n_tokens / 16) * 16).cast("long")
    agg = (
        docs.select(
            bucket.alias("bucket_lo"), n_tokens.alias("n_tokens")
        )
        .groupBy("bucket_lo")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
    )
    total = Window.partitionBy()
    return (
        agg.select(
            "bucket_lo",
            (F.col("bucket_lo") + 16).alias("bucket_hi"),
            "n_docs",
            "total_tokens",
            F.round(
                F.col("n_docs") * 100.0 / F.sum("n_docs").over(total), 4
            ).alias("pct_docs"),
        )
        .orderBy("bucket_lo")
    )
