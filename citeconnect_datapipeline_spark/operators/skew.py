"""Skew mitigation: salted aggregation and salted broadcast join.

AQE's skew-join splitting (enabled in session.py) handles most skew
at runtime; salting is the explicit fallback for the two cases AQE
does not cover: a skewed GROUP BY key (one reducer gets the hot key's
entire partition) and a hot key on the BUILD side of a non-broadcast
join. At 100 TB a single hot key (one viral document id, one null-ish
default) can hold a stage at 1/1000th parallelism — salting splits
the hot key across S sub-keys at the cost of a second (tiny) reduce.

No reference analogue (single-process pandas has no shuffle); this is
Spark-native scale equipment (SURVEY.md §4 'Spill-aware' row).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count_by_key(
    df: DataFrame, key: str, salt_buckets: int = 16
) -> DataFrame:
    """Two-stage skew-proof count: groupBy (key, salt) then re-reduce
    by key. Stage 1 spreads any hot key over ``salt_buckets``
    reducers; stage 2 reduces ``salt_buckets`` partials per key —
    negligible. Salt is a hash of the full row spread uniformly, not
    a random() (determinism: same input -> same plan result)."""
    salt = F.pmod(F.xxhash64(*df.columns), F.lit(salt_buckets)).alias("_salt")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(F.count("*").alias("_partial"))
    )
    return (
        partial.groupBy(key)
        .agg(F.sum("_partial").alias("n"))
    )


def salted_sum_by_key(
    df: DataFrame, key: str, value: str | Column, salt_buckets: int = 16
) -> DataFrame:
    """Same two-stage shape for sums (any algebraic aggregate works:
    partial per (key, salt), merge per key)."""
    value_col = F.col(value) if isinstance(value, str) else value
    salt = F.pmod(F.xxhash64(*df.columns), F.lit(salt_buckets)).alias("_salt")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(F.sum(value_col).alias("_partial"))
    )
    return partial.groupBy(key).agg(F.sum("_partial").alias("total"))


def replicated_broadcast_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-proof fact-to-dim join by salting: facts get a random-ish
    per-row salt, the (small) dim side is REPLICATED across all salt
    values, and the join key becomes (key, salt) — a hot fact key now
    lands on ``salt_buckets`` tasks instead of one. Only sensible when
    dim is broadcast-sized x salt_buckets; for fact-to-fact skew use
    AQE skew join."""
    salted_facts = facts.withColumn(
        "_salt", F.pmod(F.xxhash64(*facts.columns), F.lit(salt_buckets))
    )
    replicated_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = salted_facts.join(
        F.broadcast(replicated_dim), on=[key, "_salt"], how="left"
    )
    return out.drop("_salt")


from pyspark.sql import SparkSession  # noqa: E402

from ..plans.registry import query  # noqa: E402
from ..sources.tables import load_table  # noqa: E402

SKEW_TOPK = 5


@query(
    "join_key_skew_report",
    oracle=f"""
    WITH kc AS (
        SELECT l_partkey AS key, COUNT(*) AS n
        FROM lineitem GROUP BY l_partkey
    ),
    tot AS (
        SELECT SUM(n) AS total, COUNT(*) AS n_keys,
               MAX(n) AS max_n,
               quantile_cont(n, CAST(1 AS DOUBLE)/2) AS med_n
        FROM kc
    ),
    ranked AS (
        SELECT key, n,
               ROW_NUMBER() OVER (ORDER BY n DESC, key) AS rnk
        FROM kc
    )
    SELECT r.rnk AS hot_rank, r.key AS hot_key,
           CAST(r.n AS BIGINT) AS n_rows,
           ROUND(r.n * 1.0 / t.total, 6) AS share,
           ROUND(r.n / t.med_n, 6) AS x_median,
           CAST(t.n_keys AS BIGINT) AS n_keys
    FROM ranked r CROSS JOIN tot t
    WHERE r.rnk <= {SKEW_TOPK}
    ORDER BY r.rnk
    """,
)
def join_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The diagnostic that decides WHEN the salting in this module is
    worth its extra reduce: the top-5 (SKEW_TOPK) heaviest values of a
    join/groupBy key (here lineitem.l_partkey, the co-purchase join
    key) with each hot key's row share and its multiple of the
    median key size — 'x_median >> 1' is the number a perf engineer
    reads before choosing between AQE skew-split, salting, or a
    broadcast. Runs BEFORE a 100 TB join, on the key-count table
    (|distinct keys| rows), not the fact table.

    Shape: one map-side-combinable key count, a 1-row stats
    aggregate (exact median over key counts — swap percentile_approx
    at web scale) broadcast back, and a top-k rank over... not the
    full key table: ORDER BY n DESC LIMIT k plans as TakeOrdered on
    the key-count table. The rank window in the oracle is spelled
    with ROW_NUMBER for determinism; the Spark side gets the same
    order from the sort columns directly."""
    li = load_table(spark, sf_dir, "lineitem")
    kc = li.groupBy(F.col("l_partkey").alias("key")).agg(
        F.count("*").alias("n")
    )
    tot = kc.agg(
        F.sum("n").alias("total"),
        F.count("*").alias("n_keys"),
        F.expr("percentile(n, cast(1 as double)/2)").alias("med_n"),
    )
    top = (
        kc.orderBy(F.desc("n"), "key")
        .limit(SKEW_TOPK)
        .crossJoin(F.broadcast(tot))
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("n"), "key")
    return (
        top.withColumn("hot_rank", F.row_number().over(w))
        .select(
            "hot_rank",
            F.col("key").alias("hot_key"),
            F.col("n").cast("long").alias("n_rows"),
            F.round(F.col("n") * 1.0 / F.col("total"), 6).alias(
                "share"
            ),
            F.round(F.col("n") / F.col("med_n"), 6).alias("x_median"),
            F.col("n_keys").cast("long"),
        )
        .orderBy("hot_rank")
    )
