"""Crafted behavioral tests for the round-6 operators.

Each test plants a distribution where the operator's defining
property is FORCED (a known h-index profile, a planted duplicate
vector, a coupled order pair, controlled quartiles, hand-computable
sampling keys) and asserts the operator finds exactly it —
complementing the oracle hash-match, which checks engine agreement
but not intent.
"""

from __future__ import annotations

import datetime
import hashlib
import math
import os

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)
EMB_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)
LINEITEM_SCHEMA = StructType(
    [
        StructField("l_orderkey", LongType()),
        StructField("l_partkey", LongType()),
        StructField("l_suppkey", LongType()),
        StructField("l_linenumber", IntegerType()),
        StructField("l_quantity", DoubleType()),
        StructField("l_extendedprice", DoubleType()),
        StructField("l_discount", DoubleType()),
        StructField("l_tax", DoubleType()),
        StructField("l_returnflag", StringType()),
        StructField("l_linestatus", StringType()),
        StructField("l_shipdate", TimestampType()),
    ]
)
ORDER_SCHEMA = StructType(
    [
        StructField("o_orderkey", LongType()),
        StructField("o_custkey", LongType()),
        StructField("o_orderstatus", StringType()),
        StructField("o_totalprice", DoubleType()),
        StructField("o_orderdate", TimestampType()),
        StructField("o_orderpriority", StringType()),
    ]
)


def _write(spark, tmp_path, name, schema, rows):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(str(tmp_path), f"{name}.parquet"))
    return str(tmp_path)


def _li(orderkey, partkey, suppkey, ship=None):
    return (
        int(orderkey),
        int(partkey),
        int(suppkey),
        1,
        1.0,
        100.0,
        0.0,
        0.0,
        "N",
        "O",
        ship or datetime.datetime(1995, 6, 1),
    )


def test_h_index_matches_the_hand_computed_profile(spark, tmp_path):
    from citeconnect_datapipeline_spark.operators.analytics import (
        supplier_h_index,
    )

    rows = []
    ok = 0
    # supplier 1: parts with reference counts [5, 4, 3, 1] -> h = 3
    for part, cnt in ((101, 5), (102, 4), (103, 3), (104, 1)):
        for _ in range(cnt):
            ok += 1
            rows.append(_li(ok, part, 1))
    # supplier 2: ten parts, one reference each -> h = 1
    for part in range(201, 211):
        ok += 1
        rows.append(_li(ok, part, 2))
    sf = _write(spark, tmp_path, "lineitem", LINEITEM_SCHEMA, rows)
    got = {
        r["s_suppkey"]: r for r in supplier_h_index(spark, sf).collect()
    }
    assert got[1]["h_index"] == 3
    assert got[1]["n_parts"] == 4 and got[1]["total_refs"] == 13
    assert got[2]["h_index"] == 1
    assert got[2]["n_parts"] == 10 and got[2]["total_refs"] == 10


def test_weighted_sample_keys_are_deterministic_and_hand_computable(
    spark, tmp_path
):
    from citeconnect_datapipeline_spark.operators.training import (
        weighted_sample_es,
    )

    rows = [
        (int(i), "x" * (10 * (i + 1)), "en", "s", 10 * (i + 1))
        for i in range(10)
    ] + [(99, "", "en", "s", 0)]  # zero weight -> excluded
    sf = _write(spark, tmp_path, "documents", DOC_SCHEMA, rows)
    got1 = weighted_sample_es(spark, sf).collect()
    got2 = weighted_sample_es(spark, sf).collect()
    assert [r.asDict() for r in got1] == [r.asDict() for r in got2]
    assert all(r["doc_id"] != 99 for r in got1)
    # hand-compute one Efraimidis-Spirakis key: u from the first 5
    # md5 nibbles + 0.5 over 16^5, key = -ln(u) * 1e5 / weight
    by_id = {r["doc_id"]: r for r in got1}
    some = got1[0]
    h = hashlib.md5(f"es:{some['doc_id']}".encode()).hexdigest()
    u = (int(h[:5], 16) + 0.5) / 16**5
    want = round(-math.log(u) * 100000.0 / some["weight"], 6)
    assert abs(some["es_key"] - want) < 1e-9
    # ranking is ascending in the key
    keys = [r["es_key"] for r in got1]
    assert keys == sorted(keys)


def test_rfm_extremes_land_in_the_corner_segments(spark, tmp_path):
    from citeconnect_datapipeline_spark.operators.analytics import (
        rfm_segments,
    )

    base = datetime.datetime(1995, 1, 1)
    rows = []
    ok = 0
    # four customers with strictly separated R / F / M levels:
    # cust 1 is best on all three axes, cust 4 worst on all three.
    for cust, (days_ago, n_orders, price) in enumerate(
        ((0, 4, 1000.0), (10, 3, 100.0), (20, 2, 10.0), (30, 1, 1.0)),
        start=1,
    ):
        for _ in range(n_orders):
            ok += 1
            rows.append(
                (
                    ok,
                    cust,
                    "O",
                    price,
                    base - datetime.timedelta(days=days_ago),
                    "3-MEDIUM",
                )
            )
    sf = _write(spark, tmp_path, "orders", ORDER_SCHEMA, rows)
    got = rfm_segments(spark, sf).collect()
    assert sum(r["n_customers"] for r in got) == 4
    cells = {
        (r["r_score"], r["f_score"], r["m_score"]): r for r in got
    }
    assert (4, 4, 4) in cells  # cust 1: most recent, most, biggest
    assert (1, 1, 1) in cells  # cust 4: stalest, fewest, smallest
    assert cells[(4, 4, 4)]["total_monetary"] == 4000.0


def test_bib_coupling_finds_the_coupled_urgent_pair_only(
    spark, tmp_path
):
    from citeconnect_datapipeline_spark.operators.graph import (
        bib_coupling_topk,
    )

    base = datetime.datetime(1995, 1, 1)

    def order(ok, prio):
        return (int(ok), 1, "O", 100.0, base, prio)

    orders = [
        order(1, "1-URGENT"),
        order(2, "1-URGENT"),
        order(3, "1-URGENT"),
        order(4, "3-MEDIUM"),
        order(5, "3-MEDIUM"),
    ]
    li = []
    # orders 1 and 2 share parts 11, 12, 13 -> coupled with 3 shared
    for p in (11, 12, 13):
        li.append(_li(1, p, 1))
        li.append(_li(2, p, 1))
    # order 3 shares only part 11 with them -> below the >=2 floor
    li.append(_li(3, 11, 1))
    # orders 4 and 5 share parts 21, 22 but are NOT urgent -> absent
    for p in (21, 22):
        li.append(_li(4, p, 1))
        li.append(_li(5, p, 1))
    _write(spark, tmp_path, "orders", ORDER_SCHEMA, orders)
    sf = _write(spark, tmp_path, "lineitem", LINEITEM_SCHEMA, li)
    got = bib_coupling_topk(spark, sf).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["o1"], r["o2"], r["shared_parts"]) == (1, 2, 3)


def test_ship_latency_buckets_and_cumulative_share(spark, tmp_path):
    from citeconnect_datapipeline_spark.operators.timeseries import (
        ship_latency_histogram,
    )

    base = datetime.datetime(1995, 1, 1)
    orders = [(int(i), 1, "O", 100.0, base, "3-MEDIUM") for i in (1, 2, 3)]
    li = [
        _li(1, 1, 1, base + datetime.timedelta(days=2)),  # bucket 0
        _li(2, 1, 1, base + datetime.timedelta(days=6)),  # bucket 0
        _li(3, 1, 1, base + datetime.timedelta(days=9)),  # bucket 1
    ]
    _write(spark, tmp_path, "orders", ORDER_SCHEMA, orders)
    sf = _write(spark, tmp_path, "lineitem", LINEITEM_SCHEMA, li)
    got = {r["week_bucket"]: r for r in ship_latency_histogram(spark, sf).collect()}
    assert got[0]["n_items"] == 2 and got[1]["n_items"] == 1
    assert abs(got[0]["share"] - round(2 / 3, 6)) < 1e-9
    assert got[1]["cum_share"] == 1.0


def test_semantic_dedup_portable_drops_the_planted_duplicate(
    spark, tmp_path
):
    from citeconnect_datapipeline_spark.operators.clustering import (
        semantic_dedup_portable,
    )

    dim = 8
    def unit(i):
        v = [0.0] * dim
        v[i] = 1.0
        return v

    rows = [
        (0, unit(0), 0),
        (1, unit(0), 0),  # exact duplicate of vec 0 -> cos 1.0
        (2, unit(1), 1),
        (3, unit(2), 2),
        (4, unit(3), 3),
    ]
    sf = _write(spark, tmp_path, "embeddings", EMB_SCHEMA, rows)
    got = semantic_dedup_portable(spark, sf).collect()
    assert sum(r["n_vecs"] for r in got) == 5
    dup_clusters = [r for r in got if r["n_dropped"] > 0]
    assert len(dup_clusters) == 1
    r = dup_clusters[0]
    assert r["n_vecs"] == 2 and r["n_dropped"] == 1
    assert abs(r["max_within_cos"] - 1.0) < 1e-6
    for other in got:
        if other is not r:
            assert other["n_dropped"] == 0


def test_portable_ann_cosines_agree_with_numpy_brute_force(spark):
    import numpy as np
    import pyarrow.parquet as pq

    from citeconnect_datapipeline_spark.operators.similarity import (
        ann_ivf_portable,
        ann_pq_portable,
    )

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(os.path.join(sf, "embeddings.parquet"))
    ids = t["vec_id"].to_pylist()
    M = np.array(t["embedding"].to_pylist(), dtype="float64")
    q = M[ids.index(0)]
    cos = (M @ q) / (
        np.linalg.norm(M, axis=1) * np.linalg.norm(q) + 1e-300
    )
    by_id = dict(zip(ids, cos))
    for fn in (ann_ivf_portable, ann_pq_portable):
        rows = fn(spark, sf).collect()
        assert 0 < len(rows) <= 5
        for r in rows:
            assert r["vec_id"] != 0
            assert abs(r["cosine"] - round(by_id[r["vec_id"]], 6)) < 2e-6


def test_fertility_is_exact_on_crafted_texts(spark, tmp_path):
    from citeconnect_datapipeline_spark.operators.text import (
        tokenizer_fertility_by_lang,
    )

    rows = [
        # "ab cd" -> 2 BPE tokens / 5 chars
        (0, "ab cd", "aa", "s", 5),
        # "a1!" -> tokens a, 1, ! = 3 tokens / 3 chars
        (1, "a1!", "bb", "s", 3),
    ]
    sf = _write(spark, tmp_path, "documents", DOC_SCHEMA, rows)
    got = {r["lang"]: r for r in tokenizer_fertility_by_lang(spark, sf).collect()}
    assert got["aa"]["total_tokens"] == 2
    assert abs(got["aa"]["fertility"] - 0.4) < 1e-9
    assert got["bb"]["total_tokens"] == 3
    assert abs(got["bb"]["fertility"] - 1.0) < 1e-9
    assert got["aa"]["n_docs"] == 1 and got["bb"]["n_docs"] == 1


def test_hits_authority_beats_raw_indegree_via_hub_quality(
    spark, tmp_path
):
    from citeconnect_datapipeline_spark.operators.graph import (
        hits_authorities,
    )

    li = []
    ok = 0
    # part 1 and part 2 both have in-degree 3. But part 1's citing
    # orders are HUBS (each also cites the popular parts 10..14),
    # while part 2's citers cite nothing else. HITS must rank part 1
    # above part 2; raw in-degree cannot separate them.
    for _ in range(3):
        ok += 1
        li.append(_li(ok, 1, 1))
        for p in range(10, 15):
            li.append(_li(ok, p, 1))
    for _ in range(3):
        ok += 1
        li.append(_li(ok, 2, 1))
    sf = _write(spark, tmp_path, "lineitem", LINEITEM_SCHEMA, li)
    got = {r["p_partkey"]: r for r in hits_authorities(spark, sf).collect()}
    assert got[1]["authority"] > got[2]["authority"]
    shares = [r["authority_share"] for r in got.values()]
    assert all(0 < x <= 1 for x in shares)


def test_kmv_theta_estimates_track_exact_overlap(spark, tmp_path):
    """Two audiences with a planted 50% overlap: the KMV estimates
    must land within theta-sketch error of the exact counts (K=64,
    relative error ~ 1/sqrt(K) ~ 12.5%; allow 3x that)."""
    import datetime as dt

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from citeconnect_datapipeline_spark.operators.statistics import (
        theta_overlap_portable,
    )

    EVENT_SCHEMA = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )
    base = dt.datetime(1995, 1, 1)
    rows = []
    eid = 0
    # click: users 0..999; buy: users 500..1499 -> exact overlap 500,
    # union 1500, click-minus-buy 500
    for u in range(1000):
        eid += 1
        rows.append((eid, base, u, "click", 1.0, "{}"))
    for u in range(500, 1500):
        eid += 1
        rows.append((eid, base, u, "buy", 1.0, "{}"))
    sf = _write(spark, tmp_path, "events", EVENT_SCHEMA, rows)
    got = theta_overlap_portable(spark, sf).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["a"], r["b"]) == ("buy", "click")
    tol = 3 / math.sqrt(64)
    assert abs(r["union_est"] - 1500) <= 1500 * tol
    assert abs(r["intersect_est"] - 500) <= 1500 * tol
    assert abs(r["a_minus_b_est"] - 500) <= 1500 * tol


def test_hll_estimate_within_error_bound_on_planted_cardinality(
    spark, tmp_path
):
    """5000 distinct users in one audience, 100 in another: estimates
    must track exact counts within ~3x the m=256 standard error
    (1.04/sqrt(256) ~ 6.5%), and the small audience — on the
    linear-counting path — should be near exact."""
    import datetime as dt

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from citeconnect_datapipeline_spark.operators.statistics import (
        hll_distinct_portable,
    )

    EVENT_SCHEMA = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )
    base = dt.datetime(1995, 1, 1)
    rows = [(i + 1, base, i, "big", 1.0, "{}") for i in range(5000)]
    rows += [
        (10_000 + i, base, i, "small", 1.0, "{}") for i in range(100)
    ]
    sf = _write(spark, tmp_path, "events", EVENT_SCHEMA, rows)
    got = {r["event_type"]: r for r in hll_distinct_portable(spark, sf).collect()}
    assert got["big"]["exact_users"] == 5000
    assert got["big"]["rel_err"] <= 3 * 1.04 / math.sqrt(256)
    assert got["small"]["exact_users"] == 100
    # 100 << 2.5*m -> linear counting with most registers empty
    assert got["small"]["rel_err"] <= 0.10


def test_k_anonymity_flags_the_planted_small_cell(spark, tmp_path):
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from citeconnect_datapipeline_spark.operators.quality import (
        k_anonymity_audit,
    )

    CUST_SCHEMA = StructType(
        [
            StructField("c_custkey", LongType()),
            StructField("c_name", StringType()),
            StructField("c_nationkey", IntegerType()),
            StructField("c_acctbal", DoubleType()),
            StructField("c_mktsegment", StringType()),
        ]
    )
    rows = []
    ck = 0
    # cell (1, BULK): 20 members -> safe; cell (2, RARE): 2 -> at risk
    for _ in range(20):
        ck += 1
        rows.append((ck, f"c{ck}", 1, 0.0, "BULK"))
    for _ in range(2):
        ck += 1
        rows.append((ck, f"c{ck}", 2, 0.0, "RARE"))
    sf = _write(spark, tmp_path, "customer", CUST_SCHEMA, rows)
    got = {(r["c_nationkey"], r["c_mktsegment"]): r for r in k_anonymity_audit(spark, sf).collect()}
    assert got[(2, "RARE")]["at_risk"] == 1
    assert got[(2, "RARE")]["group_size"] == 2
    assert got[(1, "BULK")]["at_risk"] == 0
    assert abs(got[(1, "BULK")]["pop_share"] - round(20 / 22, 6)) < 1e-9
