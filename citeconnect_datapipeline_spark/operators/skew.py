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
