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
        # the row_number window already single-partitioned and sorted
        # the 5-row frame by exactly this order — a trailing orderBy
        # would re-exchange it; an in-partition sort is a no-op pass
        # that pins the contract (r10 verdict #2 job-count cut)
        .sortWithinPartitions("hot_rank")
    )


ZORDER_BITS = 8  # bits per dimension -> 256 bins, 16-bit z-values
ZORDER_FILE_SHIFT = 8  # file id = top 8 z-bits -> 256 z-range files
_US_PER_DAY = 86400000000.0


def zorder_value(bx, by) -> Column:
    """16-bit Morton/Z-value from two 8-bit bin columns: bit i of bx
    lands at position 2i+1, bit i of by at 2i. Pure integer bit
    arithmetic — whole-stage codegen, no UDF."""
    terms = " + ".join(
        f"shiftleft(shiftright({bx}, {i}) & 1, {2 * i + 1})"
        f" + shiftleft(shiftright({by}, {i}) & 1, {2 * i})"
        for i in range(ZORDER_BITS)
    )
    return F.expr(terms)


def _zsql() -> str:
    """The identical interleave spelled for DuckDB."""
    return " + ".join(
        f"(((bx >> {i}) & 1) << {2 * i + 1})"
        f" + (((by >> {i}) & 1) << {2 * i})"
        for i in range(ZORDER_BITS)
    )


@query(
    "zorder_layout_stats",
    oracle=f"""
    WITH bounds AS (
        SELECT MIN(o_custkey) AS min_x, MAX(o_custkey) AS max_x,
               MIN(FLOOR(epoch_us(o_orderdate) / {_US_PER_DAY})) AS min_y,
               MAX(FLOOR(epoch_us(o_orderdate) / {_US_PER_DAY})) AS max_y
        FROM orders
    ),
    binned AS (
        SELECT CAST(FLOOR((o_custkey - b.min_x) * 256.0
                          / (b.max_x - b.min_x + 1)) AS BIGINT) AS bx,
               CAST(FLOOR((FLOOR(epoch_us(o_orderdate) / {_US_PER_DAY})
                           - b.min_y) * 256.0
                          / (b.max_y - b.min_y + 1)) AS BIGINT) AS by
        FROM orders CROSS JOIN bounds b
    ),
    zed AS (
        SELECT bx, by, ({{z}}) AS z FROM binned
    ),
    zfiles AS (
        SELECT z >> {ZORDER_FILE_SHIFT} AS file_id,
               COUNT(*) AS n_rows,
               MAX(bx) - MIN(bx) + 1 AS x_span,
               MAX(by) - MIN(by) + 1 AS y_span
        FROM zed GROUP BY 1
    ),
    lfiles AS (
        SELECT by AS file_id,
               COUNT(*) AS n_rows,
               MAX(bx) - MIN(bx) + 1 AS x_span,
               MAX(by) - MIN(by) + 1 AS y_span
        FROM zed GROUP BY 1
    )
    SELECT 'zorder' AS layout, CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(n_rows) AS BIGINT) AS n_rows,
           ROUND(AVG(x_span / 256.0), 6) AS x_read_frac,
           ROUND(AVG(y_span / 256.0), 6) AS y_read_frac
    FROM zfiles
    UNION ALL
    SELECT 'linear', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(n_rows) AS BIGINT),
           ROUND(AVG(x_span / 256.0), 6),
           ROUND(AVG(y_span / 256.0), 6)
    FROM lfiles
    ORDER BY layout
    """.replace("{z}", _zsql()),
)
def zorder_layout_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) multi-dimensional clustering evaluated as a
    LAYOUT decision — the Delta Z-ORDER / Iceberg sort-order move,
    which no single-process reference needs but a 100 TB lake lives
    by: bin two query dimensions (customer key, order day) to 8 bits
    each, interleave the bits into a 16-bit z-value, and range-split
    the z-space into files (top-8-bit tiles). For each candidate
    layout — z-order tiles vs the usual time-linear layout (files =
    date bins) — report every file's min/max span per dimension,
    reduced to the expected FRACTION of the bin domain a file covers:
    with uniform point predicates this is exactly the expected
    fraction of files a zone-map (min/max) pruner must read. The
    output is the two-row decision table: linear reads ~100% of
    files for a customer-key predicate; z-order reads a few percent
    on BOTH dimensions — the quantified case for re-clustering.

    Scale shape: one 1-row bounds broadcast (min/max per dim), one
    scan computing bins + the z-value in pure integer bit arithmetic
    (whole-stage codegen, no UDF), and two file-grain aggregates —
    file counts are layout constants (256), independent of corpus
    size. Writing the layout is `df.repartitionByRange(z)` +
    `sortWithinPartitions(z)`; this query is the evaluator that
    justifies it."""
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min("o_custkey").alias("min_x"),
        F.max("o_custkey").alias("max_x"),
        F.min(
            F.floor(F.unix_micros(F.col("o_orderdate")) / F.lit(_US_PER_DAY))
        ).alias("min_y"),
        F.max(
            F.floor(F.unix_micros(F.col("o_orderdate")) / F.lit(_US_PER_DAY))
        ).alias("max_y"),
    )
    day = F.floor(F.unix_micros(F.col("o_orderdate")) / F.lit(_US_PER_DAY))
    binned = orders.crossJoin(F.broadcast(bounds)).select(
        F.floor(
            (F.col("o_custkey") - F.col("min_x"))
            * 256.0
            / (F.col("max_x") - F.col("min_x") + 1)
        )
        .cast("bigint")
        .alias("bx"),
        F.floor(
            (day - F.col("min_y")) * 256.0 / (F.col("max_y") - F.col("min_y") + 1)
        )
        .cast("bigint")
        .alias("by"),
    )
    zed = binned.select("bx", "by", zorder_value("bx", "by").alias("z"))

    def _files(key) -> DataFrame:
        return zed.groupBy(key.alias("file_id")).agg(
            F.count("*").alias("n_rows"),
            (F.max("bx") - F.min("bx") + 1).alias("x_span"),
            (F.max("by") - F.min("by") + 1).alias("y_span"),
        )

    def _summary(files: DataFrame, name: str) -> DataFrame:
        return files.agg(
            F.lit(name).alias("layout"),
            F.count("*").alias("n_files"),
            F.sum("n_rows").alias("n_rows"),
            F.round(F.avg(F.col("x_span") / 256.0), 6).alias("x_read_frac"),
            F.round(F.avg(F.col("y_span") / 256.0), 6).alias("y_read_frac"),
        )

    zf = _summary(_files(F.shiftright(F.col("z"), ZORDER_FILE_SHIFT)), "zorder")
    lf = _summary(_files(F.col("by")), "linear")
    return zf.unionAll(lf).orderBy("layout")


SHARDS_BEFORE = 8  # resharding scenario: grow 8 -> 9
SHARDS_AFTER = 9
_HEX = "0123456789abcdef"


@query(
    "shard_rebalance_report",
    oracle=f"""
    WITH keyed AS (SELECT DISTINCT p_partkey AS k FROM part),
    weights AS (
        SELECT k, s, md5(CAST(s AS VARCHAR) || ':' || CAST(k AS VARCHAR))
                   AS w
        FROM keyed CROSS JOIN (SELECT unnest(range({SHARDS_AFTER})) AS s)
    ),
    hrw AS (
        SELECT k,
               arg_max(s, w) FILTER (WHERE s < {SHARDS_BEFORE})
                   AS shard_before,
               arg_max(s, w) AS shard_after
        FROM weights GROUP BY k
    ),
    modh AS (
        SELECT k,
               (strpos('{_HEX}', substr(md5(CAST(k AS VARCHAR)), 1, 1)) - 1)
                   * 16
               + strpos('{_HEX}', substr(md5(CAST(k AS VARCHAR)), 2, 1)) - 1
                   AS h
        FROM keyed
    )
    SELECT 'rendezvous' AS strategy,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(COUNT(*) FILTER (WHERE shard_before <> shard_after)
                AS BIGINT) AS moved,
           ROUND(COUNT(*) FILTER (WHERE shard_before <> shard_after)
                 * 1.0 / COUNT(*), 6) AS moved_frac
    FROM hrw
    UNION ALL
    SELECT 'mod', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) FILTER (WHERE h % {SHARDS_BEFORE}
                                 <> h % {SHARDS_AFTER}) AS BIGINT),
           ROUND(COUNT(*) FILTER (WHERE h % {SHARDS_BEFORE}
                                  <> h % {SHARDS_AFTER})
                 * 1.0 / COUNT(*), 6)
    FROM modh
    ORDER BY strategy DESC
    """,
)
def shard_rebalance_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resharding-cost planner: when a keyed store grows from 8 to 9
    shards (SHARDS_BEFORE/AFTER — a vector-store partition set, a
    streaming state store, a bucketed table), how many rows must
    MOVE? Compares the two placement disciplines side by side:
    rendezvous/HRW hashing (per (key, shard) weight = md5(shard:key),
    key lives on the argmax shard — moves ONLY keys the new shard
    wins, the theoretical 1/K_after minimum) against mod-hashing
    (shard = hash % K — remapping nearly everything). The output is
    the migration bill: ~11% of keys move under rendezvous, ~89%
    under mod — the quantified case for consistent placement before
    the first resharding event, not after.

    Portable by construction: weights are md5 strings (identical in
    both engines, lexicographic argmax), and the mod hash builds its
    integer from md5 hex chars via strpos — no conv(), no
    engine-specific hash. Scale shape: a K_after-way row explode of
    the key set (a layout constant, not corpus growth), one
    per-key argmax aggregate, and two bounded summary rows;
    everything map-side-combinable, no window, no driver state."""
    keys = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").cast("string").alias("k")
    ).distinct()
    shards = F.array(*[F.lit(s) for s in range(SHARDS_AFTER)])
    weights = keys.select(
        "k", F.explode(shards).alias("s")
    ).select(
        "k",
        "s",
        F.md5(F.concat_ws(":", F.col("s"), F.col("k"))).alias("w"),
    )
    hrw = weights.groupBy("k").agg(
        F.max_by(
            F.when(F.col("s") < SHARDS_BEFORE, F.col("s")),
            F.when(F.col("s") < SHARDS_BEFORE, F.col("w")),
        ).alias("shard_before"),
        F.max_by("s", "w").alias("shard_after"),
    )
    idx1 = F.instr(F.lit(_HEX), F.substring(F.md5("k"), 1, 1)) - 1
    idx2 = F.instr(F.lit(_HEX), F.substring(F.md5("k"), 2, 1)) - 1
    modh = keys.select((idx1 * 16 + idx2).alias("h"))
    moved_hrw = F.sum(
        F.when(F.col("shard_before") != F.col("shard_after"), 1).otherwise(0)
    )
    r1 = hrw.agg(
        F.lit("rendezvous").alias("strategy"),
        F.count("*").alias("n_keys"),
        moved_hrw.alias("moved"),
        F.round(moved_hrw * 1.0 / F.count("*"), 6).alias("moved_frac"),
    )
    moved_mod = F.sum(
        F.when(
            F.col("h") % SHARDS_BEFORE != F.col("h") % SHARDS_AFTER, 1
        ).otherwise(0)
    )
    r2 = modh.agg(
        F.lit("mod").alias("strategy"),
        F.count("*").alias("n_keys"),
        moved_mod.alias("moved"),
        F.round(moved_mod * 1.0 / F.count("*"), 6).alias("moved_frac"),
    )
    return r1.unionAll(r2).orderBy(F.desc("strategy"))


JSE_SAMPLE_HEX = "0"  # keep keys whose md5 starts with this -> 1/16
JSE_RATE = 16


def _jse_sql(a: str, ka: str, b: str, kb: str, label: str) -> str:
    return f"""
    SELECT label, method, exact_rows, est_rows,
           ROUND(ABS(est_rows - exact_rows) / exact_rows, 6) AS rel_err
    FROM (
        WITH ca AS (SELECT {ka} AS k, COUNT(*) AS c FROM {a} GROUP BY 1),
        cb AS (SELECT {kb} AS k, COUNT(*) AS c FROM {b} GROUP BY 1),
        j AS (
            SELECT ca.k, ca.c * cb.c AS pairs
            FROM ca JOIN cb USING (k)
        ),
        ex AS (SELECT CAST(SUM(pairs) AS BIGINT) AS exact_rows FROM j)
        SELECT '{label}' AS label, 'key_sample' AS method,
               ex.exact_rows,
               CAST({JSE_RATE} * SUM(CASE WHEN substr(
                        md5(CAST(j.k AS VARCHAR)), 1, 1)
                        = '{JSE_SAMPLE_HEX}' THEN j.pairs ELSE 0 END)
                    AS DOUBLE) AS est_rows
        FROM j CROSS JOIN ex GROUP BY ex.exact_rows
        UNION ALL
        SELECT '{label}', 'independence', ex.exact_rows,
               (SELECT SUM(c) FROM ca) * 1.0
               * (SELECT SUM(c) FROM cb)
               / GREATEST((SELECT COUNT(*) FROM ca),
                          (SELECT COUNT(*) FROM cb))
        FROM ex
    )
    """


@query(
    "join_size_estimate",
    oracle=(
        _jse_sql("customer", "c_custkey", "orders", "o_custkey",
                 "customer~orders")
        + " UNION ALL "
        + _jse_sql("part", "p_partkey", "lineitem", "l_partkey",
                   "part~lineitem")
        + " ORDER BY label, method"
    ),
)
def join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation — the number a cost-based planner
    must get right before choosing broadcast vs shuffle vs skew
    mitigation, computed here three ways so the estimators can be
    graded against truth WITHOUT executing the join: (1) exact
    |A join B| = sum over keys of cA*cB from the two key-count
    tables; (2) a deterministic 1/16 KEY-sample estimate (keep keys
    whose md5 starts '0', scale by 16 — sampling KEYS, not rows,
    keeps each key's degree product intact, the property row-level
    Bernoulli sampling destroys); (3) the textbook independence
    estimate |A|*|B|/max(ndv_A, ndv_B) that every System-R
    descendant (and Catalyst's stats) uses. The output rows carry
    each estimate's relative error — on the test lake the key-sample
    lands within a few percent while independence is exact only
    because the FK is uniform; on skewed keys the sample wins, which
    is why runtime re-planning (AQE) exists.

    Scale shape: key-grain count tables (the same bounded statistics
    a planner maintains), one equi-join between them, and 1-row
    rollups — the fact tables are scanned once each and never
    joined."""
    spark_sf = sf_dir

    def one(a: str, ka: str, b: str, kb: str, label: str) -> DataFrame:
        ca = (
            load_table(spark, spark_sf, a)
            .groupBy(F.col(ka).alias("k"))
            .agg(F.count("*").alias("ca"))
        )
        cb = (
            load_table(spark, spark_sf, b)
            .groupBy(F.col(kb).alias("k"))
            .agg(F.count("*").alias("cb"))
        )
        j = ca.join(cb, "k").select(
            "k", (F.col("ca") * F.col("cb")).alias("pairs")
        )
        stats_a = ca.agg(
            F.sum("ca").alias("na"), F.count("*").alias("ndva")
        )
        stats_b = cb.agg(
            F.sum("cb").alias("nb"), F.count("*").alias("ndvb")
        )
        ex = j.agg(F.sum("pairs").cast("bigint").alias("exact_rows"))
        samp = j.agg(
            (
                JSE_RATE
                * F.sum(
                    F.when(
                        F.substring(F.md5(F.col("k").cast("string")), 1, 1)
                        == JSE_SAMPLE_HEX,
                        F.col("pairs"),
                    ).otherwise(0)
                )
            )
            .cast("double")
            .alias("est_rows")
        )
        r1 = (
            F.broadcast(ex)
            .crossJoin(samp)
            .select(
                F.lit(label).alias("label"),
                F.lit("key_sample").alias("method"),
                "exact_rows",
                "est_rows",
            )
        )
        r2 = (
            F.broadcast(ex)
            .crossJoin(F.broadcast(stats_a))
            .crossJoin(F.broadcast(stats_b))
            .select(
                F.lit(label).alias("label"),
                F.lit("independence").alias("method"),
                "exact_rows",
                (
                    F.col("na")
                    * 1.0
                    * F.col("nb")
                    / F.greatest(F.col("ndva"), F.col("ndvb"))
                ).alias("est_rows"),
            )
        )
        return r1.unionAll(r2)

    out = one(
        "customer", "c_custkey", "orders", "o_custkey", "customer~orders"
    ).unionAll(
        one("part", "p_partkey", "lineitem", "l_partkey", "part~lineitem")
    )
    return out.select(
        "label",
        "method",
        "exact_rows",
        "est_rows",
        F.round(
            F.abs(F.col("est_rows") - F.col("exact_rows"))
            / F.col("exact_rows"),
            6,
        ).alias("rel_err"),
    ).orderBy("label", "method")
