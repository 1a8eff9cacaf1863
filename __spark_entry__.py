"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over the engine's query registry
(``citeconnect_datapipeline_spark.plans.registry``): every implemented
operator from SURVEY.md SS2 is a named query there, with its DuckDB
oracle SQL where SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from citeconnect_datapipeline_spark.plans.registry import (  # noqa: E402
    get_oracles,
    get_queries,
)

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    papers_pipeline_e2e is the reference's whole §3.1 lifecycle as one
    plan: clean -> filter -> enrich -> dedup -> slice."""
    return get_queries()["papers_pipeline_e2e"](spark, _SMOKE_SF_DIR)


# Queries with a green hash-MATCH row in CORRECTNESS_r01/r02 (the
# driver verifies a prefix window of queries(); these rotate to the
# BACK so every registered query accumulates at least one driver-
# verified row across rounds). enrich_documents / array_semi_filter
# failed those rounds (array-typed outputs, fixed since) and go FIRST
# so the fix lands in the next correctness artifact.
#
# ROUND 4 MAINTENANCE: after CORRECTNESS_r03.json lands, add its
# green query names to _DRIVER_VERIFIED (and clear _RECHECK_FIRST if
# both re-checks flipped green) so the next window reaches the ~22
# still-unverified queries. Every oracled query already MATCHes in
# the local strict audit at sf0.01 AND sf0.1 (AUDIT_LOCAL.md), so
# rotation is about driver-side evidence, not expected failures.
_RECHECK_FIRST = (
    "enrich_documents",
    "array_semi_filter",
)
_DRIVER_VERIFIED = frozenset(
    {
        "bias_slice_disparity", "pricing_summary", "value_counts",
        "group_size_median", "column_stats", "top_decile_mean",
        "pivot_mean", "conditional_agg_anomaly", "group_describe",
        "rollup_slices", "cube_slices", "approx_distinct_stats",
        "schema_snapshot", "unpivot_metrics", "grouping_sets_slices",
        "shipping_priority_topk", "regional_supplier_volume",
        "market_share_by_year", "asof_join_events", "range_join_binned",
        "dedup_keep_first", "dup_detection", "exact_hash_dedup",
        "ngram_jaccard_topk", "minhash_lsh_candidates",
        "neardup_components", "simhash_fingerprints",
        "fuzzy_prefix_pairs", "token_counts", "content_extract_4tier",
        "extraction_method_distribution", "part_copurchase_pagerank",
        "copurchase_pmi_topk", "anti_join_new_rows",
        "semi_join_existing", "broadcast_dim_lookup",
        "graph_1hop_expansion", "graph_2hop_frontier", "left_join_fill",
        "run_diff_full_outer", "multimodal_inventory",
        "media_decode_features", "video_frame_samples",
        "expectations_report", "union_all_entities",
        "distinct_union_ids", "except_ids", "intersect_ids",
    }
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md SS2, ordered
    so the driver's prefix-window correctness check reaches queries
    that don't yet have a verified row (see _DRIVER_VERIFIED).
    Within the unverified set, ORACLED queries come before rows-only
    ones — a hash-MATCH row is the stronger evidence, so it earns the
    window slot first."""
    qs = get_queries()
    oracled = set(get_oracles())
    unverified = [
        n
        for n in qs
        if n not in _DRIVER_VERIFIED and n not in _RECHECK_FIRST
    ]
    order = [n for n in _RECHECK_FIRST if n in qs]
    order += [n for n in unverified if n in oracled]
    order += [n for n in unverified if n not in oracled]
    order += [
        n
        for n in qs
        if n in _DRIVER_VERIFIED and n not in _RECHECK_FIRST
    ]
    return {n: qs[n] for n in order}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted for
    non-SQL-expressible ops -> rows-only check)."""
    return get_oracles()
