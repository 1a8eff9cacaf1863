"""Declarative data-quality expectations (SURVEY.md SS2.5 A13/A14
generalized into an API).

The reference hand-codes each validity check as separate pandas
passes (invalid years, negative citations, missing rates —
Validation/schema_validator.py:135-237,325-350). Here a check suite
is DATA: a dict of named boolean SQL predicates compiled into ONE
conditional-aggregation pass over the table (``sum(when(violated))``
per check), then unpivoted to a (check, violations, pass_rate) row
per check. Adding a check adds a column to one scan — never another
pass, which is the difference between O(checks) and O(1) table reads
at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import load_table
from .text import STOPWORDS


def expectations_report(
    df: DataFrame, checks: dict[str, str]
) -> DataFrame:
    """Evaluate named row-level expectations in one aggregation pass.

    ``checks`` maps check-name -> SQL boolean expression that should
    be TRUE for a healthy row (NULL counts as a violation, matching
    the reference's treat-missing-as-bad accounting). Returns one row
    per check: (check, n_rows, violations, pass_rate).
    """
    aggs = [F.count(F.lit(1)).alias("_n")]
    for name, predicate in checks.items():
        ok = F.coalesce(F.expr(predicate), F.lit(False))
        aggs.append(
            F.sum(F.when(ok, 0).otherwise(1)).alias(f"_v_{name}")
        )
    wide = df.agg(*aggs)
    stack_args: list = []
    for name in checks:
        stack_args.append(F.lit(name))
        stack_args.append(F.col(f"_v_{name}"))
    return (
        wide.select(
            "_n",
            F.stack(F.lit(len(checks)), *stack_args).alias(
                "check", "violations"
            ),
        )
        .select(
            "check",
            F.col("_n").alias("n_rows"),
            "violations",
            F.round(
                1.0 - F.col("violations") / F.col("_n"), 6
            ).alias("pass_rate"),
        )
        .orderBy("check")
    )


ORDER_CHECKS = {
    "orderdate_in_range": (
        "o_orderdate >= TIMESTAMP '1990-01-01' "
        "AND o_orderdate < TIMESTAMP '2001-01-01'"
    ),
    "price_positive": "o_totalprice > 0.0",
    "priority_known": (
        "o_orderpriority IN ('1-URGENT','2-HIGH','3-MEDIUM',"
        "'4-NOT SPECIFIED','5-LOW')"
    ),
    "status_known": "o_orderstatus IN ('O','F','P')",
    "custkey_present": "o_custkey IS NOT NULL",
}


@query(
    "expectations_report",
    oracle="""
    WITH wide AS (
        SELECT COUNT(*) AS n,
               SUM(CASE WHEN COALESCE(
                   o_orderdate >= TIMESTAMP '1990-01-01'
                   AND o_orderdate < TIMESTAMP '2001-01-01', FALSE)
                   THEN 0 ELSE 1 END) AS v_orderdate_in_range,
               SUM(CASE WHEN COALESCE(o_totalprice > 0.0, FALSE)
                   THEN 0 ELSE 1 END) AS v_price_positive,
               SUM(CASE WHEN COALESCE(o_orderpriority IN
                   ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED',
                    '5-LOW'), FALSE)
                   THEN 0 ELSE 1 END) AS v_priority_known,
               SUM(CASE WHEN COALESCE(o_orderstatus IN ('O','F','P'),
                   FALSE)
                   THEN 0 ELSE 1 END) AS v_status_known,
               SUM(CASE WHEN o_custkey IS NOT NULL
                   THEN 0 ELSE 1 END) AS v_custkey_present
        FROM orders
    )
    SELECT u.check, wide.n AS n_rows,
           CAST(u.violations AS BIGINT) AS violations,
           ROUND(1.0 - CAST(u.violations AS DOUBLE) / wide.n, 6)
               AS pass_rate
    FROM wide, (
        SELECT 'orderdate_in_range' AS check,
               v_orderdate_in_range AS violations FROM wide
        UNION ALL SELECT 'price_positive', v_price_positive FROM wide
        UNION ALL SELECT 'priority_known', v_priority_known FROM wide
        UNION ALL SELECT 'status_known', v_status_known FROM wide
        UNION ALL SELECT 'custkey_present', v_custkey_present FROM wide
    ) u
    ORDER BY u.check
    """,
)
def expectations_report_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The declarative check suite run over orders: five expectations
    (range, positivity, domain membership, non-null) in a single
    map-side-combinable scan, unpivoted to one row per check."""
    return expectations_report(
        load_table(spark, sf_dir, "orders"), ORDER_CHECKS
    )


K_ANON = 5  # minimum safe quasi-identifier group size


def k_anonymity_cells(
    df: DataFrame, qid_cols: list, k: int = K_ANON
) -> DataFrame:
    """Library core of `k_anonymity_audit` (api.curation.
    k_anonymity_cells): every quasi-identifier equivalence cell with
    group_size, at_risk flag (< k) and population share, smallest
    first. One qid-grain aggregate + a 1-row total broadcast."""
    # r12 (guide §2.4): pinned eagerly — the total scalar and the
    # share projection both read `cells`, and un-pinned each re-ran
    # the table scan (2 scans in k_anonymity_audit_before.txt). The
    # frame is bounded by the qid domain. (Library note: this makes
    # the call EAGER — it runs the cell aggregate at build time.)
    cells = (
        df.groupBy(*qid_cols)
        .agg(F.count("*").alias("group_size"))
        .localCheckpoint()
    )
    tot = cells.agg(F.sum("group_size").alias("n"))
    return (
        cells.join(F.broadcast(tot))
        .select(
            *qid_cols,
            "group_size",
            F.when(F.col("group_size") < k, 1)
            .otherwise(0)
            .alias("at_risk"),
            F.round(F.col("group_size") / F.col("n"), 6).alias(
                "pop_share"
            ),
        )
        .orderBy("group_size", *qid_cols)
    )


@query(
    "k_anonymity_audit",
    oracle=f"""
    WITH cells AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS group_size
        FROM customer
        GROUP BY 1, 2
    ),
    tot AS (SELECT SUM(group_size) AS n FROM cells)
    SELECT c.c_nationkey, c.c_mktsegment, c.group_size,
           CASE WHEN c.group_size < {K_ANON} THEN 1 ELSE 0 END
               AS at_risk,
           ROUND(c.group_size * 1.0 / t.n, 6) AS pop_share
    FROM cells c CROSS JOIN tot t
    ORDER BY c.group_size, c.c_nationkey, c.c_mktsegment
    """,
)


def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over quasi-identifiers — the privacy gate a
    corpus release runs beside `pii_redaction`: any combination of
    quasi-identifying attributes (here nation x market segment)
    shared by fewer than 5 (K_ANON) records re-identifies its
    members by linkage (Sweeney's k-anonymity). Reports every
    equivalence cell with its size, at-risk flag, and population
    share, smallest first — the table a release either suppresses or
    generalizes until no at_risk rows remain.

    Scale shape: ONE map-side-combinable aggregate at qid grain (the
    cell table is bounded by the qid domain, not the corpus) and a
    1-row total broadcast for shares."""
    cust = load_table(spark, sf_dir, "customer")
    return k_anonymity_cells(
        cust, ["c_nationkey", "c_mktsegment"]
    )


L_DIVERSE = 3  # minimum distinct sensitive values per qid cell


def l_diversity_cells(
    df: DataFrame, qid_cols: list, sensitive: str, l_min: int = L_DIVERSE
) -> DataFrame:
    """Library core of `l_diversity_audit` (api.curation.
    l_diversity_cells): per quasi-identifier cell, the count of
    DISTINCT sensitive values (distinct l-diversity) and the entropy
    effective-number exp(H) (entropy l-diversity), with the at_risk
    flag l < l_min. Two qid-grain aggregates (one at (qid, sensitive)
    grain, one rollup) — bounded by the qid x sensitive domain."""
    per_val = df.groupBy(*qid_cols, sensitive).agg(
        F.count("*").alias("c")
    )
    tot = Window.partitionBy(*qid_cols)
    p = F.col("c") / F.sum("c").over(tot)
    return (
        per_val.select(*qid_cols, "c", (-p * F.log(p)).alias("h"))
        .groupBy(*qid_cols)
        .agg(
            F.sum("c").alias("group_size"),
            F.count("*").alias("l_distinct"),
            F.round(F.exp(F.sum("h")), 6).alias("entropy_l"),
        )
        .select(
            *qid_cols,
            "group_size",
            "l_distinct",
            "entropy_l",
            F.when(F.col("l_distinct") < l_min, 1).otherwise(0).alias(
                "at_risk"
            ),
        )
        .orderBy("l_distinct", *qid_cols)
    )


@query(
    "l_diversity_audit",
    oracle=f"""
    WITH per_val AS (
        SELECT c_nationkey,
               CAST(FLOOR(c_acctbal / 2000.0) AS BIGINT) AS bal_band,
               c_mktsegment, COUNT(*) AS c
        FROM customer
        GROUP BY 1, 2, 3
    ),
    h AS (
        SELECT c_nationkey, bal_band, c,
               -(c * 1.0 / SUM(c) OVER (PARTITION BY c_nationkey, bal_band))
               * ln(c * 1.0 / SUM(c) OVER (PARTITION BY c_nationkey, bal_band))
                   AS hterm
        FROM per_val
    )
    SELECT c_nationkey, bal_band,
           CAST(SUM(c) AS BIGINT) AS group_size,
           CAST(COUNT(*) AS BIGINT) AS l_distinct,
           ROUND(exp(SUM(hterm)), 6) AS entropy_l,
           CASE WHEN COUNT(*) < {L_DIVERSE} THEN 1 ELSE 0 END AS at_risk
    FROM h
    GROUP BY c_nationkey, bal_band
    ORDER BY l_distinct, c_nationkey, bal_band
    """,
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — the escalation of `k_anonymity_audit`
    (Machanavajjhala et al. 2007): a qid cell can be large (k-safe)
    yet still leak if every member SHARES the sensitive value (the
    homogeneity attack k-anonymity misses). Per (nation,
    account-balance band) cell: distinct-l (how many sensitive
    market segments appear), entropy-l as the effective number
    exp(H) (robust to one dominant value), and the at_risk flag
    l < 3 (L_DIVERSE). A release suppresses or generalizes flagged
    cells exactly as with k-anonymity — the two audits run together.

    Scale shape: one aggregate at (qid, sensitive) grain, an
    entropy fold partitioned by the qid cell, and a qid-grain
    rollup — every intermediate bounded by the attribute domain,
    never corpus-grain."""
    cust = load_table(spark, sf_dir, "customer").withColumn(
        "bal_band",
        F.floor(F.col("c_acctbal") / 2000.0).cast("bigint"),
    )
    return l_diversity_cells(
        cust, ["c_nationkey", "bal_band"], "c_mktsegment"
    )


DP_EPSILON = 1.0  # per-release privacy budget (Laplace scale = 1/eps)
_DP_HEX = "0123456789abcdef"


def _dp_u_sql(key: str) -> str:
    """Uniform (0,1) from 4 md5 hex chars — engine-portable, no
    conv(): u = (h1*4096 + h2*256 + h3*16 + h4 + 1) / 65537."""
    terms = " + ".join(
        f"(strpos('{_DP_HEX}', substr(md5({key}), {i + 1}, 1)) - 1)"
        f" * {16 ** (3 - i)}"
        for i in range(4)
    )
    return f"(({terms}) + 1.0) / 65537.0"


_DP_DEMO_SALT = "spark-graft-demo-release"  # PUBLIC — demo/ledger only


def dp_noisy_counts_release(
    cells: DataFrame,
    group_col: str,
    *,
    salt: str,
    epsilon: float = DP_EPSILON,
) -> DataFrame:
    """Laplace-noised release of per-cell counts with an epsilon
    ledger column. ``cells`` must carry (``group_col``, ``n``).

    The noise is drawn by inverse-CDF from an md5-derived uniform
    over ``salt || ':' || cell`` — ``salt`` is REQUIRED and is the
    entire privacy guarantee: with a per-release SECRET salt the
    noise is unpredictable to consumers (a sealed seed, the standard
    way a DP release is made auditable-yet-private), while with a
    public or derivable salt anyone can recompute and subtract the
    noise, so the output is a FORMAT/LEDGER DEMO with zero
    differential privacy. The epsilon ledger arithmetic (counts have
    sensitivity 1; ask twice, spend 2) is meaningful only in the
    secret-salt regime. Keep the salt out of the published table.

    Scale shape: per-cell arithmetic in codegen over an already
    cell-grain input. No corpus-grain state, no window."""
    h = F.md5(
        F.concat(
            F.lit("dp:"), F.lit(salt), F.lit(":"), F.col(group_col)
        )
    )
    u_terms = sum(
        (
            (F.instr(F.lit(_DP_HEX), F.substring(h, i + 1, 1)) - 1)
            * (16 ** (3 - i))
            for i in range(4)
        ),
        F.lit(0),
    )
    u = (u_terms + 1.0) / 65537.0
    lap = (
        -(1.0 / epsilon)
        * F.when(u >= 0.5, 1.0).otherwise(-1.0)
        * F.log(1.0 - 2.0 * F.abs(u - 0.5))
    )
    return cells.select(
        group_col,
        (F.col("n") + F.round(lap, 0)).cast("bigint").alias("noisy_count"),
        F.lit(float(epsilon)).alias("epsilon"),
        F.round(F.lit(1.0 / epsilon), 6).alias("laplace_scale"),
    ).orderBy(group_col)


@query(
    "dp_noisy_counts",
    oracle=f"""
    WITH cells AS (
        SELECT c_mktsegment AS segment, COUNT(*) AS n
        FROM customer GROUP BY 1
    ),
    noised AS (
        SELECT segment, n,
               {_dp_u_sql(f"'dp:{_DP_DEMO_SALT}:' || segment")} AS u
        FROM cells
    )
    SELECT segment,
           CAST(n + ROUND(
               -(1.0 / {DP_EPSILON})
               * CASE WHEN u >= 0.5 THEN 1.0 ELSE -1.0 END
               * ln(1.0 - 2.0 * ABS(u - 0.5)), 0) AS BIGINT)
               AS noisy_count,
           {DP_EPSILON} AS epsilon,
           ROUND(1.0 / {DP_EPSILON}, 6) AS laplace_scale
    FROM noised
    ORDER BY segment
    """,
)
def dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-count release format + epsilon ledger, demonstrated
    beside `k_anonymity_audit` and `l_diversity_audit`: each
    published cell count carries Laplace(1/epsilon) noise and the
    epsilon it spent (the budget LEDGER a release process
    accumulates across queries).

    IMPORTANT: this registered query runs `dp_noisy_counts_release`
    with the repo-public ``_DP_DEMO_SALT`` so both engines can
    hash-verify it — that makes THIS row a format/ledger DEMO, not a
    DP release (a consumer of this table could recompute the noise).
    The operator itself requires a salt; production callers pass a
    per-release SECRET salt, which is what turns the same arithmetic
    into an actual differentially-private mechanism (sensitivity-1
    Laplace, sealed seed).

    Scale shape: one map-side-combinable aggregate at cell grain,
    then `dp_noisy_counts_release`'s per-cell codegen arithmetic."""
    cust = load_table(spark, sf_dir, "customer")
    cells = cust.groupBy(
        F.col("c_mktsegment").alias("segment")
    ).agg(F.count("*").alias("n"))
    return dp_noisy_counts_release(
        cells, "segment", salt=_DP_DEMO_SALT
    )


# round(log10(1 + 1/d), 6) for d = 1..9 — injected as identical
# literals into BOTH engines so the chi-square terms are bit-equal
BENFORD_EXPECTED = {
    1: 0.30103, 2: 0.176091, 3: 0.124939, 4: 0.09691, 5: 0.079181,
    6: 0.066947, 7: 0.057992, 8: 0.051153, 9: 0.045757,
}


@query(
    "benford_digit_audit",
    oracle=f"""
    WITH scaled AS (
        SELECT CASE WHEN l_extendedprice >= 1 THEN l_extendedprice
               {" ".join(
                   f"WHEN l_extendedprice >= 1e-{k}"
                   f" THEN GREATEST(l_extendedprice * 1e{k}, 1.0)"
                   for k in range(1, 19)
               )}
               END AS m
        FROM lineitem
        WHERE l_extendedprice > 0
    ),
    cells AS (
        SELECT substr(CAST(CAST(FLOOR(m) AS BIGINT)
                       AS VARCHAR), 1, 1) AS digit,
               COUNT(*) AS n
        FROM scaled
        WHERE m IS NOT NULL
        GROUP BY 1
    ),
    tot AS (SELECT SUM(n) AS tot FROM cells),
    expected(digit, exp_frac) AS (
        VALUES {", ".join(f"('{d}', {v})" for d, v in BENFORD_EXPECTED.items())}
    )
    SELECT c.digit, CAST(c.n AS BIGINT) AS n,
           ROUND(c.n * 1.0 / t.tot, 6) AS obs_frac,
           e.exp_frac,
           ROUND(POWER(ROUND(c.n * 1.0 / t.tot, 6) - e.exp_frac, 2)
                 / e.exp_frac, 6) AS chi2_term
    FROM cells c CROSS JOIN tot t
    JOIN expected e ON e.digit = c.digit
    ORDER BY c.digit
    """,
)
def benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit — the numeric-quality screen a lake
    runs over money/measure columns before trusting them (fabricated
    or unit-mangled figures drift from Benford's logarithmic digit
    law; auditors and data-quality suites use exactly this test):
    observed first-significant-digit fractions of l_extendedprice
    against log10(1 + 1/d), with the per-digit chi-square
    contribution so the failing digits are visible, not just a
    summary stat. The first SIGNIFICANT digit is computed down to
    1e-18: sub-1 values are scaled up by a power-of-10 CASE ladder
    with a greatest(.,1.0) last-ulp clamp (see benford_digit_cells)
    before the integer part's string head — never log10 arithmetic
    (whose float slack misclassifies exact powers of 10).

    Scale shape: one map-side-combinable 9-cell aggregate over the
    fact scan; the total and the expected-law table ride 1-row/9-row
    broadcasts. Per-row work is codegen substring arithmetic."""
    li = load_table(spark, sf_dir, "lineitem")
    return benford_digit_cells(li, "l_extendedprice")


def benford_digit_cells(df: DataFrame, value_col: str) -> DataFrame:
    """Library core of `benford_digit_audit` (api.quality.
    benford_digit_cells): the Benford first-digit screen over any
    positive numeric column — per digit 1-9, observed fraction vs
    log10(1 + 1/d) and the chi-square contribution. The first
    SIGNIFICANT digit is computed for any value in [1e-18, inf):
    values in (0, 1) are scaled into [1, 10^18) by a CASE ladder of
    power-of-10 thresholds (IEEE multiply/compare, identical in
    every engine — no log10, whose float slack misclassifies exact
    powers of 10), then the digit is the integer part's string
    head. The multiply itself is a ROUNDED IEEE op, so a value
    within 1 ulp below a threshold can scale to just under 1; a
    greatest(scaled, 1.0) clamp (mirrored in the oracle) pins such
    edge rows to digit 1, keeping the digits-1-9 output contract.
    Rows with value <= 0 (no first significant digit) or below
    1e-18 (outside the ladder's documented domain) are excluded."""
    v = F.col(value_col)
    scaled = F.when(v >= 1, v)
    for k in range(1, 19):
        # greatest(., 1.0) guards the last-ulp case where the IEEE
        # multiply of a value just under the 1e-k threshold lands
        # fractionally below 1 and would emit digit '0' (r8 ADVICE
        # #3) — the clamp keeps the documented digits-1-9 contract.
        scaled = scaled.when(
            v >= float(f"1e-{k}"),
            F.greatest(v * float(f"1e{k}"), F.lit(1.0)),
        )
    digit = F.substring(
        F.floor(F.col("_m")).cast("bigint").cast("string"), 1, 1
    )
    # r12 (guide §2.4): `cells` feeds BOTH the total scalar and the
    # main projection; un-pinned, each reference re-ran the fact scan
    # with the per-row CASE ladder (2 lineitem scans in
    # benford_digit_audit_before.txt). Pin the digit-domain-bounded
    # (<= 9 rows) aggregate eagerly; the scan runs once.
    cells = (
        df.filter(v > 0)
        .select(scaled.alias("_m"))
        .filter(F.col("_m").isNotNull())
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count("*").alias("n"))
        .localCheckpoint()
    )
    tot = cells.agg(F.sum("n").alias("tot"))
    exp_frac = F.element_at(
        F.create_map(
            *[
                F.lit(x)
                for d, v in BENFORD_EXPECTED.items()
                for x in (str(d), v)
            ]
        ),
        F.col("digit"),
    )
    obs = F.round(F.col("n") * 1.0 / F.col("tot"), 6)
    return (
        cells.join(F.broadcast(tot))
        .select(
            "digit",
            "n",
            obs.alias("obs_frac"),
            exp_frac.alias("exp_frac"),
            F.round(
                F.pow(obs - exp_frac, 2) / exp_frac, 6
            ).alias("chi2_term"),
        )
        .orderBy("digit")
    )


_PROFILE_COLS = (  # (column, kind) — documents table profile
    ("doc_id", "numeric"),
    ("text", "string"),
    ("lang", "string"),
    ("source", "string"),
    ("n_chars", "numeric"),
)


@query(
    "column_null_profile",
    oracle=f"""
    WITH wide AS (
        SELECT COUNT(*) AS n,
               {", ".join(
                   f'''COUNT(*) FILTER (WHERE {c} IS NULL)
                       AS null_{c},
                   COUNT(*) FILTER (WHERE {
                       f"TRIM(CAST({c} AS VARCHAR)) = ''"
                       if k == "string" else f"{c} <= 0"
                   }) AS degen_{c},
                   COUNT(DISTINCT {c}) AS nd_{c}'''
                   for c, k in _PROFILE_COLS
               )}
        FROM documents
    )
    SELECT u.col, wide.n AS n_rows,
           CAST(u.n_null AS BIGINT) AS n_null,
           ROUND(u.n_null * 1.0 / wide.n, 6) AS null_frac,
           CAST(u.n_degenerate AS BIGINT) AS n_degenerate,
           CAST(u.n_distinct AS BIGINT) AS n_distinct
    FROM wide, (
        {" UNION ALL ".join(
            f"SELECT '{c}' AS col, null_{c} AS n_null,"
            f" degen_{c} AS n_degenerate, nd_{c} AS n_distinct"
            " FROM wide"
            for c, _ in _PROFILE_COLS
        )}
    ) u
    ORDER BY u.col
    """,
)
def column_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling in ONE scan — the table a data engineer
    pulls before trusting any column (the profiling half of
    `expectations_report`, which asserts; this one DESCRIBES): per
    column, the null count/fraction, the degenerate count (blank
    after trim for strings, <= 0 for numerics — the values that are
    technically non-null but carry no information), and the exact
    distinct cardinality. Adding a column adds expressions to one
    aggregate — never another table pass, the O(checks) vs O(1)
    scans distinction the expectations suite pins.

    Scale shape: one aggregate with conditional counts plus exact
    COUNT(DISTINCT) per profiled column (Spark plans the distincts
    via expand — cost scales with profiled-column count, which is
    the operator's knob; swap approx_count_distinct in when exact
    cardinality isn't worth the expand), then a bounded unpivot."""
    docs = load_table(spark, sf_dir, "documents")
    aggs = [F.count("*").alias("n")]
    for c, kind in _PROFILE_COLS:
        degen = (
            F.trim(F.col(c).cast("string")) == ""
            if kind == "string"
            else F.col(c) <= 0
        )
        # r12 (guide §2.3 shuffle metadata, not payloads): the exact-
        # distinct Expand ships every profiled value through the
        # (value, gid) exchange — for the document body that is the
        # whole corpus text. Count distinct 8-byte xxhash64 classes
        # of the text instead: same cardinality short of a 2^-64
        # collision (the identical equality-class contract the
        # shingle family already rides vs its string oracles),
        # verified MATCH vs the oracle's count(DISTINCT text) at both
        # audit scales. Narrow columns keep the exact value distinct.
        # (null-guarded: xxhash64(NULL) is the non-null seed, but
        # count_distinct must keep skipping NULL rows)
        nd_col = (
            F.when(F.col(c).isNotNull(), F.xxhash64(F.col(c)))
            if c == "text"
            else F.col(c)
        )
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(
                f"null_{c}"
            ),
            F.sum(
                F.when(F.coalesce(degen, F.lit(False)), 1).otherwise(0)
            ).alias(f"degen_{c}"),
            F.count_distinct(nd_col).alias(f"nd_{c}"),
        ]
    wide = docs.agg(*aggs)
    stack_args: list = []
    for c, _ in _PROFILE_COLS:
        stack_args += [
            F.lit(c),
            F.col(f"null_{c}"),
            F.col(f"degen_{c}"),
            F.col(f"nd_{c}"),
        ]
    return (
        wide.select(
            "n",
            F.stack(
                F.lit(len(_PROFILE_COLS)), *stack_args
            ).alias("col", "n_null", "n_degenerate", "n_distinct"),
        )
        .select(
            "col",
            F.col("n").alias("n_rows"),
            F.col("n_null").cast("bigint").alias("n_null"),
            F.round(F.col("n_null") * 1.0 / F.col("n"), 6).alias(
                "null_frac"
            ),
            F.col("n_degenerate").cast("bigint").alias("n_degenerate"),
            F.col("n_distinct").cast("bigint").alias("n_distinct"),
        )
        .orderBy("col")
    )


DP_USER_CAP = 4  # per-user contribution bound C per cell


def dp_user_counts_release(
    events: DataFrame,
    group_col: str,
    user_col: str,
    *,
    salt: str,
    cap: int = DP_USER_CAP,
    epsilon: float = DP_EPSILON,
    include_audit: bool = False,
) -> DataFrame:
    """USER-level DP noisy counts with bounded contribution
    (api.curation.dp_user_counts_release) — the upgrade
    `dp_noisy_counts_release` (row-level, sensitivity 1) cannot
    honestly make on event data: when one user can contribute many
    rows to a cell, removing that user moves the raw count by their
    whole activity, so the Laplace scale must grow with the
    contribution bound. This clips each user's per-cell
    contribution at ``cap`` FIRST (the standard user-level DP move:
    utility loss for the heavy users, bounded sensitivity for
    everyone), then noises the clipped sum at scale cap/epsilon.
    ``n_users_clipped`` is the utility audit a DP engineer reads to
    tune the cap — but it is a DETERMINISTIC function of the raw
    data, so a frame containing it is NOT an epsilon-DP release.
    The default therefore EXCLUDES it (``include_audit=False``);
    pass ``include_audit=True`` only for the internal tuning frame
    that never leaves the trust boundary (r8 ADVICE #1). The salt
    contract is dp_noisy_counts_release's: REQUIRED, secret in
    production, public only for the demo/ledger.

    Scale shape: one (cell, user) aggregate (map-side combinable),
    one LEAST() clip in codegen, one cell-grain rollup, per-cell
    noise arithmetic. No window, no corpus-grain state."""
    per_user = events.groupBy(
        F.col(group_col).alias("cell"), F.col(user_col).alias("u")
    ).agg(F.count("*").alias("nu"))
    clipped = per_user.groupBy("cell").agg(
        F.sum(F.least(F.col("nu"), F.lit(cap))).alias("n"),
        F.count(F.when(F.col("nu") > cap, 1)).alias("n_users_clipped"),
    )
    h = F.md5(
        F.concat(F.lit("dpu:"), F.lit(salt), F.lit(":"), F.col("cell"))
    )
    u_terms = sum(
        (
            (F.instr(F.lit(_DP_HEX), F.substring(h, i + 1, 1)) - 1)
            * (16 ** (3 - i))
            for i in range(4)
        ),
        F.lit(0),
    )
    u = (u_terms + 1.0) / 65537.0
    lap = (
        -(float(cap) / epsilon)
        * F.when(u >= 0.5, 1.0).otherwise(-1.0)
        * F.log(1.0 - 2.0 * F.abs(u - 0.5))
    )
    audit_cols = (
        [F.col("n_users_clipped").cast("bigint").alias("n_users_clipped")]
        if include_audit
        else []
    )
    return clipped.select(
        F.col("cell"),
        (F.col("n") + F.round(lap, 0)).cast("bigint").alias("noisy_count"),
        *audit_cols,
        F.lit(float(epsilon)).alias("epsilon"),
        F.lit(cap).cast("int").alias("sensitivity"),
        F.round(F.lit(float(cap) / epsilon), 6).alias("laplace_scale"),
    ).orderBy("cell")


@query(
    "dp_user_activity_counts",
    oracle=f"""
    WITH per_user AS (
        SELECT event_type AS cell, user_id AS u, COUNT(*) AS nu
        FROM events GROUP BY 1, 2
    ),
    clipped AS (
        SELECT cell,
               SUM(LEAST(nu, {DP_USER_CAP})) AS n,
               COUNT(*) FILTER (WHERE nu > {DP_USER_CAP})
                   AS n_users_clipped
        FROM per_user GROUP BY 1
    ),
    noised AS (
        SELECT cell, n, n_users_clipped,
               {_dp_u_sql(f"'dpu:{_DP_DEMO_SALT}:' || cell")} AS u
        FROM clipped
    )
    SELECT cell,
           CAST(n + ROUND(
               -({DP_USER_CAP}.0 / {DP_EPSILON})
               * (CASE WHEN u >= 0.5 THEN 1.0 ELSE -1.0 END)
               * LN(1.0 - 2.0 * ABS(u - 0.5)), 0) AS BIGINT)
               AS noisy_count,
           {DP_EPSILON} AS epsilon,
           CAST({DP_USER_CAP} AS INT) AS sensitivity,
           ROUND({DP_USER_CAP}.0 / {DP_EPSILON}, 6) AS laplace_scale
    FROM noised ORDER BY cell
    """,
)
def dp_user_activity_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type activity counts released under USER-level DP
    with bounded contribution — see `dp_user_counts_release` for the
    clip/sensitivity argument and the salt contract (the repo-public
    demo salt keeps this oracle-checkable; a real release swaps in a
    sealed secret salt and the same plan shape). Releases ONLY the
    noisy counts + the public (epsilon, cap) ledger: the exact
    n_users_clipped utility audit stays behind include_audit=True
    and never ships in this frame (r8 ADVICE #1)."""
    events = load_table(spark, sf_dir, "events")
    return dp_user_counts_release(
        events, "event_type", "user_id", salt=_DP_DEMO_SALT
    )


KAPPA_REDUNDANT = 0.6  # Landis-Koch 'substantial agreement' line


@query(
    "filter_agreement_kappa",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, n_chars,
               list_filter(string_split_regex(lower(text),
                                              '[^a-z0-9]+'),
                           x -> x <> '') AS words,
               len(regexp_extract_all(text, '[^a-zA-Z0-9 ]'))
                   AS n_symbols,
               len(regexp_extract_all(text, '[a-zA-Z0-9]+'))
                   AS n_alnum_runs
        FROM documents
    ),
    flags AS (
        SELECT doc_id,
               CAST(len(words) BETWEEN 50 AND 100000
                    AND ROUND(CAST(n_chars AS DOUBLE)
                        / GREATEST(len(words), 1), 4)
                        BETWEEN 3 AND 10
                    AND ROUND(CAST(n_symbols AS DOUBLE)
                        / GREATEST(n_alnum_runs, 1), 4) <= 0.1
                    AND ROUND(CAST(len(list_distinct(words)) AS DOUBLE)
                        / GREATEST(len(words), 1), 4) >= 0.3
                    AS INT) AS a,
               CAST(len(words) >= 20 AS INT) AS b
        FROM w
    ),
    cells AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(a * b) AS DOUBLE) AS n11,
               CAST(SUM((1 - a) * (1 - b)) AS DOUBLE) AS n00,
               CAST(SUM(a * (1 - b)) AS DOUBLE) AS n10,
               CAST(SUM((1 - a) * b) AS DOUBLE) AS n01
        FROM flags
    ),
    k AS (
        SELECT n, n11, n00, n10, n01,
               (n11 + n00) / n AS po,
               ((n11 + n10) / n) * ((n11 + n01) / n)
               + ((n00 + n01) / n) * ((n00 + n10) / n) AS pe
        FROM cells
    )
    SELECT CAST(n AS BIGINT) AS n_docs,
           CAST(n11 AS BIGINT) AS n_both_keep,
           CAST(n00 AS BIGINT) AS n_both_drop,
           CAST(n10 AS BIGINT) AS n_only_gopher,
           CAST(n01 AS BIGINT) AS n_only_band,
           ROUND(po, 6) AS observed_agreement,
           CASE WHEN pe >= 1.0 THEN 0.0
                ELSE ROUND((po - pe) / (1.0 - pe), 6) END AS kappa,
           CASE WHEN pe < 1.0
                 AND (po - pe) / (1.0 - pe) >= {KAPPA_REDUNDANT}
                THEN 1 ELSE 0 END AS redundant
    FROM k
    """,
)
def filter_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two independent quality filters — the
    chance-corrected agreement a curation owner reads before
    STACKING filters: raw agreement is inflated whenever both
    filters keep most documents, kappa subtracts the agreement two
    coin-flips with the same marginals would get. High kappa (>= 0.6,
    Landis-Koch 'substantial') means the second filter is mostly
    re-deciding the first one's calls — drop it or tune it to a
    different failure mode; near-zero kappa means the filters carve
    the corpus on genuinely different axes and the off-diagonal
    counts (kept by exactly one) are the review queue worth human
    eyes. Compared here: the Gopher rule bundle vs the
    length-band gate (`quality_score`'s medium+ line).

    Scale shape: both filters are per-row codegen over ONE text
    projection (no explode, no join), the 2x2 table is a scalar
    aggregate, kappa is arithmetic on 5 numbers. Scan-speed at any
    corpus size.

    Reference anchor: the reference runs its quality rules as an
    unexamined conjunction (databias/bias_detection_engine.py); this
    measures whether each conjunct earns its place."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
        lambda x: x != "",
    )
    n_words = F.size(words)
    mean_word_len = F.round(
        F.col("n_chars") / F.greatest(n_words, F.lit(1)), 4
    )
    symbol_ratio = F.round(
        F.size(
            F.regexp_extract_all(
                "text", F.lit("[^a-zA-Z0-9 ]"), F.lit(0)
            )
        )
        / F.greatest(
            F.size(
                F.regexp_extract_all(
                    "text", F.lit("[a-zA-Z0-9]+"), F.lit(0)
                )
            ),
            F.lit(1),
        ).cast("double"),
        4,
    )
    ttr = F.round(
        F.size(F.array_distinct(words))
        / F.greatest(n_words, F.lit(1)).cast("double"),
        4,
    )
    a = (
        (n_words >= 50)
        & (n_words <= 100000)
        & (mean_word_len >= 3)
        & (mean_word_len <= 10)
        & (symbol_ratio <= 0.1)
        & (ttr >= 0.3)
    ).cast("int")
    b = (n_words >= 20).cast("int")
    cells = docs.select(a.alias("a"), b.alias("b")).agg(
        F.count("*").cast("double").alias("n"),
        F.sum(F.col("a") * F.col("b")).cast("double").alias("n11"),
        F.sum((1 - F.col("a")) * (1 - F.col("b")))
        .cast("double")
        .alias("n00"),
        F.sum(F.col("a") * (1 - F.col("b")))
        .cast("double")
        .alias("n10"),
        F.sum((1 - F.col("a")) * F.col("b"))
        .cast("double")
        .alias("n01"),
    )
    po = (F.col("n11") + F.col("n00")) / F.col("n")
    pe = ((F.col("n11") + F.col("n10")) / F.col("n")) * (
        (F.col("n11") + F.col("n01")) / F.col("n")
    ) + ((F.col("n00") + F.col("n01")) / F.col("n")) * (
        (F.col("n00") + F.col("n10")) / F.col("n")
    )
    kappa = (po - pe) / (1.0 - pe)
    return cells.select(
        F.col("n").cast("bigint").alias("n_docs"),
        F.col("n11").cast("bigint").alias("n_both_keep"),
        F.col("n00").cast("bigint").alias("n_both_drop"),
        F.col("n10").cast("bigint").alias("n_only_gopher"),
        F.col("n01").cast("bigint").alias("n_only_band"),
        F.round(po, 6).alias("observed_agreement"),
        F.when(pe >= 1.0, F.lit(0.0))
        .otherwise(F.round(kappa, 6))
        .alias("kappa"),
        F.when((pe < 1.0) & (kappa >= KAPPA_REDUNDANT), 1)
        .otherwise(0)
        .alias("redundant"),
    )


def fd_violations(
    df: DataFrame, lhs: str, rhs: str, fd_name: str
) -> DataFrame:
    """Library core of `functional_dependency_audit`
    (api.curation.fd_violations): does ``lhs -> rhs`` hold in ``df``?
    One (lhs)-grain countDistinct aggregate, then a 1-row rollup —
    map-side combinable, no window, corpus appears once."""
    per_key = df.groupBy(F.col(lhs).alias("k")).agg(
        F.countDistinct(F.col(rhs)).alias("n_rhs")
    )
    return per_key.agg(
        F.lit(fd_name).alias("fd"),
        F.count("*").cast("bigint").alias("n_keys"),
        F.sum(F.when(F.col("n_rhs") > 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_violating_keys"),
        F.round(
            F.sum(F.when(F.col("n_rhs") > 1, 1).otherwise(0))
            * 1.0
            / F.count("*"),
            6,
        ).alias("violation_rate"),
        F.max("n_rhs").cast("bigint").alias("max_rhs_per_key"),
        F.when(F.max("n_rhs") <= 1, 1).otherwise(0).alias("holds"),
    )


def _fd_sql(table: str, lhs: str, rhs: str) -> str:
    return f"""
        SELECT '{table}.{lhs}->{rhs}' AS fd,
               CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_violating_keys,
               ROUND(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END)
                     * 1.0 / COUNT(*), 6) AS violation_rate,
               CAST(MAX(n_rhs) AS BIGINT) AS max_rhs_per_key,
               CASE WHEN MAX(n_rhs) <= 1 THEN 1 ELSE 0 END AS holds
        FROM (
            SELECT {lhs} AS k, COUNT(DISTINCT {rhs}) AS n_rhs
            FROM {table} GROUP BY 1
        )"""


_FD_PANEL = (
    ("documents", "source", "lang"),
    ("documents", "lang", "source"),
    ("nation", "n_nationkey", "n_regionkey"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("customer", "c_nationkey", "c_mktsegment"),
)


@query(
    "functional_dependency_audit",
    oracle="\n    UNION ALL\n".join(
        _fd_sql(t, a, b) for t, a, b in _FD_PANEL
    )
    + "\n    ORDER BY fd",
)
def functional_dependency_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Functional-dependency audit — does column A determine column
    B? The schema-inference / data-quality primitive behind
    normalization checks (a 'holds' FD is a join key you can factor
    out), silent-corruption alarms (an FD that held last run and
    breaks today means an upstream merge went wrong), and
    stratification safety (stratifying on A while B varies within A
    leaks). The panel audits the lake's interesting pairs: document
    source does NOT pin language (and vice versa) — so a mixture
    plan must treat them as independent axes — while the nation ->
    region hierarchy holds exactly.

    Scale shape: per FD, one lhs-grain countDistinct aggregate
    (map-side combinable) and a 1-row rollup; the panel is a
    unionAll of 1-row frames. No window, no join, each table
    scanned once per FD it appears in.

    Reference anchor: the reference validates presence/type only
    (utils/data_validation.py); FDs are the relationship layer it
    never checks."""
    frames = []
    for table, lhs, rhs in _FD_PANEL:
        df = load_table(spark, sf_dir, table)
        frames.append(
            fd_violations(df, lhs, rhs, f"{table}.{lhs}->{rhs}")
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionAll(f)
    return out.orderBy("fd")


T_CLOSE = 0.2  # standard t-closeness budget for categorical EMD


def t_closeness_cells(
    df, qid_col: str, sensitive_col: str, t: float = None
):
    """Library core of `t_closeness_audit` (api.curation.
    t_closeness_cells): per qid group, the EMD (categorical uniform
    ground distance => total variation) of the sensitive
    distribution from the global one, with the violates_t flag.
    Absent (qid, sensitive) cells contribute their full |0 - p|
    mass via the domain-grid left join."""
    t = T_CLOSE if t is None else t
    # r12 (guide §2.4): FOUR consumers (grp/glob/tot marginals + the
    # grid join) read `cells`; un-pinned, each re-ran the table scan
    # (4 scans in t_closeness_audit_before.txt). Pin the
    # domain-bounded cell table eagerly; the corpus appears once.
    # (Library note: the call is EAGER — the cell aggregate runs at
    # build time.)
    cells = (
        df.groupBy(qid_col, sensitive_col)
        .agg(F.count("*").cast("bigint").alias("n"))
        .localCheckpoint()
    )
    grp = cells.groupBy(qid_col).agg(F.sum("n").alias("ng"))
    glob = cells.groupBy(sensitive_col).agg(F.sum("n").alias("ns"))
    tot = cells.agg(F.sum("n").alias("nt"))
    grid = (
        grp.crossJoin(F.broadcast(glob))
        .crossJoin(F.broadcast(tot))
        .join(cells, [qid_col, sensitive_col], "left")
        .select(
            qid_col,
            "ng",
            "ns",
            "nt",
            F.coalesce("n", F.lit(0)).alias("n"),
        )
    )
    tvd = F.round(
        0.5
        * F.sum(
            F.abs(
                F.col("n") * 1.0 / F.col("ng")
                - F.col("ns") * 1.0 / F.col("nt")
            )
        ),
        6,
    )
    return (
        grid.groupBy(qid_col)
        .agg(
            F.max("ng").cast("bigint").alias("group_size"),
            tvd.alias("emd_tvd"),
            (tvd > t).alias("violates_t"),
        )
        .orderBy(qid_col)
    )


@query(
    "t_closeness_audit",
    oracle=f"""
    WITH cells AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM customer GROUP BY 1, 2
    ),
    grp AS (
        SELECT c_nationkey, SUM(n) AS ng FROM cells GROUP BY 1
    ),
    seg AS (
        SELECT c_mktsegment, SUM(n) AS ns FROM cells GROUP BY 1
    ),
    tot AS (SELECT SUM(n) AS nt FROM cells),
    grid AS (
        SELECT g.c_nationkey, s.c_mktsegment, g.ng, s.ns, t.nt,
               COALESCE(c.n, 0) AS n
        FROM grp g CROSS JOIN seg s CROSS JOIN tot t
        LEFT JOIN cells c ON c.c_nationkey = g.c_nationkey
                         AND c.c_mktsegment = s.c_mktsegment
    )
    SELECT c_nationkey,
           CAST(MAX(ng) AS BIGINT) AS group_size,
           ROUND(0.5 * SUM(ABS(n * 1.0 / ng - ns * 1.0 / nt)), 6)
               AS emd_tvd,
           ROUND(0.5 * SUM(ABS(n * 1.0 / ng - ns * 1.0 / nt)), 6)
               > {T_CLOSE} AS violates_t
    FROM grid
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit — the third rung of the release-privacy
    ladder this engine already walks (`k_anonymity_audit`: cells big
    enough; `l_diversity_audit`: sensitive values varied enough):
    even a large, diverse cell LEAKS if its sensitive-attribute
    DISTRIBUTION diverges from the corpus-wide one (Li et al. 2007 —
    the skewness attack l-diversity misses). Per quasi-identifier
    group (nation), the Earth Mover's Distance of its market-segment
    distribution from the global distribution; for categoricals
    under uniform ground distance EMD reduces to total variation,
    0.5 * L1. Groups beyond t = 0.2 (T_CLOSE) need generalization or
    suppression before release.

    Scale shape: one (qid, sensitive) cell aggregate (bounded by the
    two domains), the group/global/total marginals derived from THAT
    cell table (never a second corpus pass), and a left join against
    the qid x sensitive grid so ABSENT cells contribute their full
    |0 - p| mass — dropping them understates the distance exactly
    for the most skewed (most dangerous) groups."""
    cust = load_table(spark, sf_dir, "customer")
    return t_closeness_cells(cust, "c_nationkey", "c_mktsegment")


# Exponential-mechanism quantile release: PUBLIC output domain for
# order totals — documented a-priori bounds, NOT derived from data
# (deriving them would leak).
DPM_LO, DPM_HI, DPM_CELLS = 0.0, 600000.0, 100


def dp_median_exponential(
    df,
    value_col: str,
    *,
    salt: str,
    release_key: str,
    lo: float = DPM_LO,
    hi: float = DPM_HI,
    cells: int = DPM_CELLS,
    epsilon: float = DP_EPSILON,
):
    """Library core of `dp_median_release` (api.curation.
    dp_median_exponential): McSherry-Talwar exponential-mechanism
    median over a PUBLIC [lo, hi] grid of ``cells`` candidates.
    ``salt`` follows the dp_noisy_counts_release contract (REQUIRED,
    secret in production); ``release_key`` names the release in the
    draw key so two releases from one dataset draw independently.
    Ships ONLY the selected value + the public ledger — utilities,
    probabilities, and exact counts are deterministic functions of
    the raw data and must not leave the trust boundary."""
    spark = df.sparkSession
    step = (hi - lo) / cells
    # r12 note: the mechanism chain embeds this bucket pass 8x in
    # the static plan, but all copies share the identical hash(b)
    # aggregate exchange, which AQE stage reuse computes once; an
    # eager pin measured slower (1.27 -> 1.48 s) and is deliberately
    # not applied.
    bc = (
        df.select(
            F.least(
                F.greatest(
                    F.floor(
                        (F.col(value_col) - lo) / step
                    ).cast("int"),
                    F.lit(0),
                ),
                F.lit(cells - 1),
            ).alias("b")
        )
        .groupBy("b")
        .agg(F.count("*").alias("c"))
    )
    tot = bc.agg(F.sum("c").alias("n"))
    grid = spark.range(cells + 1).select(
        F.col("id").cast("int").alias("gb")
    )
    below = (
        grid.join(F.broadcast(bc), F.col("b") < F.col("gb"), "left")
        .groupBy("gb")
        .agg(F.coalesce(F.sum("c"), F.lit(0)).alias("below"))
    )
    util = below.crossJoin(F.broadcast(tot)).select(
        "gb", (-F.abs(F.col("below") - F.col("n") / 2.0)).alias("u")
    )
    mx = util.agg(F.max("u").alias("umax"))
    prob = util.crossJoin(F.broadcast(mx)).select(
        "gb",
        F.exp(epsilon * (F.col("u") - F.col("umax")) / 2.0).alias(
            "p"
        ),
    )
    z = prob.agg(F.sum("p").alias("z"))
    w_cum = Window.orderBy("gb").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cdf = prob.crossJoin(F.broadcast(z)).select(
        "gb", (F.sum("p").over(w_cum) / F.col("z")).alias("cum")
    )
    h = F.md5(F.lit(f"dpm:{salt}:{release_key}"))
    u_draw = (
        sum(
            (
                (F.instr(F.lit(_DP_HEX), F.substring(h, i + 1, 1)) - 1)
                * (16 ** (3 - i))
                for i in range(4)
            ),
            F.lit(0),
        )
        + 1.0
    ) / 65537.0
    return cdf.filter(F.col("cum") >= u_draw).agg(
        F.round(lo + F.min("gb") * F.lit(step), 6).alias("dp_median"),
        F.lit(float(epsilon)).alias("epsilon"),
        F.lit(1).alias("sensitivity"),
        F.lit(lo).alias("domain_lo"),
        F.lit(hi).alias("domain_hi"),
        F.lit(cells + 1).cast("bigint").alias("n_candidates"),
    )


@query(
    "dp_median_release",
    oracle=f"""
    WITH step AS (
        SELECT ({DPM_HI} - {DPM_LO}) / {DPM_CELLS} AS w
    ),
    bucketed AS (
        SELECT LEAST(GREATEST(CAST(FLOOR((o_totalprice - {DPM_LO})
                   / s.w) AS INTEGER), 0), {DPM_CELLS} - 1) AS b
        FROM orders CROSS JOIN step s
    ),
    bc AS (
        SELECT b, COUNT(*) AS c FROM bucketed GROUP BY b
    ),
    tot AS (SELECT SUM(c) AS n FROM bc),
    grid AS (
        SELECT g.b,
               COALESCE(SUM(bc.c) FILTER (WHERE bc.b < g.b), 0)
                   AS below
        FROM (SELECT unnest(range({DPM_CELLS + 1})) AS b) g
        LEFT JOIN bc ON bc.b < g.b
        GROUP BY g.b
    ),
    util AS (
        SELECT g.b, -ABS(g.below - t.n / 2.0) AS u
        FROM grid g CROSS JOIN tot t
    ),
    mx AS (SELECT MAX(u) AS umax FROM util),
    prob AS (
        SELECT u2.b,
               EXP({DP_EPSILON} * (u2.u - m.umax) / 2.0) AS p
        FROM util u2 CROSS JOIN mx m
    ),
    z AS (SELECT SUM(p) AS z FROM prob),
    cdf AS (
        SELECT p.b,
               SUM(p.p) OVER (ORDER BY p.b
                   ROWS UNBOUNDED PRECEDING) / z.z AS cum
        FROM prob p CROSS JOIN z
    ),
    draw AS (
        SELECT {_dp_u_sql(f"'dpm:{_DP_DEMO_SALT}:orders'")} AS u
    )
    SELECT ROUND({DPM_LO} + MIN(c.b)
                 * (({DPM_HI} - {DPM_LO}) / {DPM_CELLS}), 6)
               AS dp_median,
           {DP_EPSILON} AS epsilon,
           1 AS sensitivity,
           {DPM_LO} AS domain_lo,
           {DPM_HI} AS domain_hi,
           CAST({DPM_CELLS + 1} AS BIGINT) AS n_candidates
    FROM cdf c CROSS JOIN draw d
    WHERE c.cum >= d.u
    """,
)
def dp_median_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private MEDIAN via the exponential mechanism —
    the third rung of the engine's DP ladder (`dp_noisy_counts` =
    row-level counts, `dp_user_activity_counts` = user-level counts;
    quantiles need McSherry-Talwar selection, not additive noise):
    candidates are a PUBLIC 101-point grid over documented domain
    bounds (data-derived candidates would leak), utility is the
    classic rank distance -|#below - n/2| with sensitivity 1, and
    the release samples from p(c) proportional to exp(eps*u/2) by
    inverse-CDF against the salt-keyed uniform draw — the same
    demo-salt determinism contract as the count releases (secret
    salt in production, identical plan). Only the selected value
    and the public (epsilon, domain, grid) ledger ship: utilities,
    probabilities, and exact counts are deterministic functions of
    the raw data and stay internal (the dp_user_activity_counts
    lesson, r8 ADVICE #1).

    Scale shape: ONE bucket pass over the fact scan (bounded
    101-cell histogram), then all mechanism arithmetic on the
    101-row grid — max-shifted exponentials for underflow safety,
    a 101-row cumsum window, one inverse-CDF filter. Output 1 row."""
    orders = load_table(spark, sf_dir, "orders")
    return dp_median_exponential(
        orders,
        "o_totalprice",
        salt=_DP_DEMO_SALT,
        release_key="orders",
    )


ANON_K = 5  # the k-anonymity bar the ladder is judged against


@query(
    "anonymization_ladder",
    oracle=f"""
    WITH l0 AS (
        SELECT CAST(c_nationkey AS VARCHAR) || '|' || c_mktsegment
                   || '|' || CAST(CAST(FLOOR(c_acctbal / 100)
                                       AS INT) AS VARCHAR) AS qid
        FROM customer
    ),
    l1 AS (
        SELECT CAST(c_nationkey AS VARCHAR) || '|' || c_mktsegment
                   AS qid
        FROM customer
    ),
    l2 AS (
        SELECT CAST(n.n_regionkey AS VARCHAR) || '|' || c.c_mktsegment
                   AS qid
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    ),
    l3 AS (SELECT c_mktsegment AS qid FROM customer),
    l4 AS (SELECT '*' AS qid FROM customer),
    stacked AS (
        SELECT 0 AS level, 'nation|segment|bal100' AS generalization,
               qid FROM l0
        UNION ALL SELECT 1, 'nation|segment', qid FROM l1
        UNION ALL SELECT 2, 'region|segment', qid FROM l2
        UNION ALL SELECT 3, 'segment', qid FROM l3
        UNION ALL SELECT 4, '*', qid FROM l4
    ),
    classes AS (
        SELECT level, generalization, qid, COUNT(*) AS sz
        FROM stacked GROUP BY 1, 2, 3
    )
    SELECT CAST(level AS BIGINT) AS level,
           generalization,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(MIN(sz) AS BIGINT) AS k_min,
           MIN(sz) >= {ANON_K} AS k_anonymous,
           ROUND(SUM(CASE WHEN sz < {ANON_K} THEN sz ELSE 0 END)
                 * 1.0 / SUM(sz), 6) AS suppression_share
    FROM classes
    GROUP BY 1, 2
    ORDER BY level
    """,
)
def anonymization_ladder(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Generalization ladder for k-anonymity — the table a privacy
    engineer reads to pick the release schema (Sweeney 2002,
    Samarati's generalization lattice walked along one sensible
    path): each rung coarsens the quasi-identifier (balance bucket
    dropped -> nation widened to region -> segment only -> full
    suppression) and reports the equivalence-class census — class
    count, worst-case k, whether the rung clears k = {k}, and the
    record share that would need suppression to clear it. The
    FIRST rung that is k-anonymous with tolerable suppression is
    the release: `k_anonymity_audit` inspects one schema in depth,
    this ladder says WHICH schema; `l_diversity_audit` /
    `t_closeness_audit` then screen the survivor for attribute
    disclosure, and the dp_* family replaces suppression with
    noise when even the ladder's top is too revealing.

    Scale shape: five map-side-combinable aggregates (one per rung)
    over the customer scan, stacked; class tables collapse to
    1-row-per-rung summaries before the union, nothing is ever
    class-grain downstream. The nation->region rung broadcasts the
    25-row fixed dimension.""".format(k=ANON_K)
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")

    def census(level, name, qid_df):
        classes = qid_df.groupBy("qid").agg(F.count("*").alias("sz"))
        return classes.agg(
            F.lit(level).cast("bigint").alias("level"),
            F.lit(name).alias("generalization"),
            F.count("*").cast("bigint").alias("n_classes"),
            F.min("sz").cast("bigint").alias("k_min"),
            (F.min("sz") >= ANON_K).alias("k_anonymous"),
            F.round(
                F.sum(
                    F.when(F.col("sz") < ANON_K, F.col("sz")).otherwise(
                        0
                    )
                )
                * 1.0
                / F.sum("sz"),
                6,
            ).alias("suppression_share"),
        )

    sep = F.lit("|")
    l0 = cust.select(
        F.concat(
            F.col("c_nationkey").cast("string"),
            sep,
            F.col("c_mktsegment"),
            sep,
            F.floor(F.col("c_acctbal") / 100)
            .cast("int")
            .cast("string"),
        ).alias("qid")
    )
    l1 = cust.select(
        F.concat(
            F.col("c_nationkey").cast("string"),
            sep,
            F.col("c_mktsegment"),
        ).alias("qid")
    )
    l2 = cust.join(
        F.broadcast(nat), cust.c_nationkey == nat.n_nationkey
    ).select(
        F.concat(
            F.col("n_regionkey").cast("string"),
            sep,
            F.col("c_mktsegment"),
        ).alias("qid")
    )
    l3 = cust.select(F.col("c_mktsegment").alias("qid"))
    l4 = cust.select(F.lit("*").alias("qid"))
    rungs = [
        census(0, "nation|segment|bal100", l0),
        census(1, "nation|segment", l1),
        census(2, "region|segment", l2),
        census(3, "segment", l3),
        census(4, "*", l4),
    ]
    out = rungs[0]
    for r in rungs[1:]:
        out = out.unionAll(r)
    return out.orderBy("level")


def shapley_filter_cells(
    flags: DataFrame,
    names: tuple = ("min_length", "ttr", "stopword_ratio"),
) -> DataFrame:
    """Library core of `filter_shapley_attribution`
    (api.quality.shapley_filter_cells): exact 3-filter Shapley
    removal attribution over any frame with 0/1 pass-flag columns
    ``a``, ``b``, ``c`` — all 8 coalition pass-counts from ONE
    aggregate of flag products, the 3-row value table from pure
    1-row arithmetic. ``names`` labels the three filters in a-b-c
    order."""
    p = flags.agg(
        F.count("*").alias("n"),
        F.sum("a").alias("pa"),
        F.sum("b").alias("pb"),
        F.sum("c").alias("pc"),
        F.sum(F.col("a") * F.col("b")).alias("pab"),
        F.sum(F.col("a") * F.col("c")).alias("pac"),
        F.sum(F.col("b") * F.col("c")).alias("pbc"),
        F.sum(F.col("a") * F.col("b") * F.col("c")).alias("pabc"),
    )
    n, pa, pb, pc = (F.col(x) for x in ("n", "pa", "pb", "pc"))
    pab, pac, pbc, pabc = (
        F.col(x) for x in ("pab", "pac", "pbc", "pabc")
    )
    rows = p.select(
        F.stack(
            F.lit(3),
            F.lit(names[0]),
            (n - pa).alias("s1"),
            (
                (
                    2.0 * (n - pa)
                    + 1.0 * (pb - pab)
                    + 1.0 * (pc - pac)
                    + 2.0 * (pbc - pabc)
                )
                / 6
            ),
            F.lit(names[1]),
            (n - pb),
            (
                (
                    2.0 * (n - pb)
                    + 1.0 * (pa - pab)
                    + 1.0 * (pc - pbc)
                    + 2.0 * (pac - pabc)
                )
                / 6
            ),
            F.lit(names[2]),
            (n - pc),
            (
                (
                    2.0 * (n - pc)
                    + 1.0 * (pa - pac)
                    + 1.0 * (pb - pbc)
                    + 2.0 * (pab - pabc)
                )
                / 6
            ),
        ).alias("filter", "solo_removed", "shapley"),
        (n - pabc).alias("total_removed"),
        n.alias("n"),
    )
    return rows.select(
        "filter",
        F.col("solo_removed").cast("bigint").alias("solo_removed"),
        F.round("shapley", 6).alias("shapley_removed"),
        F.round(
            F.when(
                F.col("total_removed") > 0,
                F.col("shapley") / F.col("total_removed"),
            ).otherwise(0.0),
            6,
        ).alias("shapley_share"),
        F.col("total_removed").cast("bigint").alias(
            "coalition_removed"
        ),
        F.col("n").cast("bigint").alias("n_docs"),
    )


@query(
    "filter_shapley_attribution",
    oracle=f"""
    WITH flags AS (
        SELECT CASE WHEN len(w) >= 40 THEN 1 ELSE 0 END AS a,
               CASE WHEN CAST(len(list_distinct(w)) AS DOUBLE)
                         / GREATEST(len(w), 1) >= 0.4
                    THEN 1 ELSE 0 END AS b,
               CASE WHEN CAST(len(list_filter(w, x ->
                         list_contains({list(STOPWORDS)!r},
                                       x))) AS DOUBLE)
                         / GREATEST(len(w), 1) >= 0.05
                    THEN 1 ELSE 0 END AS c
        FROM (
            SELECT list_filter(
                string_split_regex(lower(text), '[^a-z0-9]+'),
                x -> x <> '') AS w
            FROM documents
        )
    ),
    p AS (
        SELECT COUNT(*) AS n,
               SUM(a) AS pa, SUM(b) AS pb, SUM(c) AS pc,
               SUM(a * b) AS pab, SUM(a * c) AS pac,
               SUM(b * c) AS pbc, SUM(a * b * c) AS pabc
        FROM flags
    ),
    sv AS (
        SELECT 'min_length' AS filter, n - pa AS solo_removed,
               (2.0 * (n - pa) + 1.0 * (pb - pab)
                + 1.0 * (pc - pac) + 2.0 * (pbc - pabc)) / 6
                   AS shapley,
               n - pabc AS total_removed, n
        FROM p
        UNION ALL
        SELECT 'ttr', n - pb,
               (2.0 * (n - pb) + 1.0 * (pa - pab)
                + 1.0 * (pc - pbc) + 2.0 * (pac - pabc)) / 6,
               n - pabc, n
        FROM p
        UNION ALL
        SELECT 'stopword_ratio', n - pc,
               (2.0 * (n - pc) + 1.0 * (pa - pac)
                + 1.0 * (pb - pbc) + 2.0 * (pab - pabc)) / 6,
               n - pabc, n
        FROM p
    )
    SELECT filter,
           CAST(solo_removed AS BIGINT) AS solo_removed,
           ROUND(shapley, 6) AS shapley_removed,
           ROUND(CASE WHEN total_removed > 0
                      THEN shapley / total_removed ELSE 0 END, 6)
               AS shapley_share,
           CAST(total_removed AS BIGINT) AS coalition_removed,
           CAST(n AS BIGINT) AS n_docs
    FROM sv
    ORDER BY filter
    """,
)
def filter_shapley_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact Shapley attribution of the quality-filter stack — WHO
    removed the docs? `filter_attrition_funnel` charges each doc to
    the FIRST filter in pipeline order (order-dependent; swapping
    two gates changes the story), Shapley values charge each filter
    its marginal removal averaged over ALL 3! application orders
    (Shapley 1953; the SHAP idea applied to pipeline stages) — the
    order-free answer, with the efficiency property that the three
    values sum EXACTLY to the full stack's removal count (asserted
    by the planted test). Filters are the engine's standing gates:
    token count >= 40, TTR >= 0.4, stopword ratio >= 0.05.

    Scale shape: exact Shapley is exponential in FILTERS, not docs —
    3 filters = 8 coalitions, and all 8 coalition pass-counts fall
    out of ONE map-side-combinable aggregate over the doc-grain flag
    pass (sums of flag products). The 3-row value table is pure
    1-row arithmetic stacked; nothing downstream is corpus-grain.
    The k-filter generalization keeps the same shape (2^k sums in
    one aggregate) until k ~ 20, far past any real filter stack."""
    docs = load_table(spark, sf_dir, "documents")
    from .text import STOPWORDS, _words

    w = F.filter(_words(), lambda x: x != "")
    ntok = F.size(w)
    ttr = F.size(F.array_distinct(w)).cast("double") / F.greatest(
        ntok, F.lit(1)
    )
    stop = F.size(
        F.filter(w, lambda x: x.isin(*STOPWORDS))
    ).cast("double") / F.greatest(ntok, F.lit(1))
    flags = docs.select(
        (ntok >= 40).cast("int").alias("a"),
        (ttr >= 0.4).cast("int").alias("b"),
        (stop >= 0.05).cast("int").alias("c"),
    )
    return shapley_filter_cells(flags).orderBy("filter")
