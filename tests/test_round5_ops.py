"""Crafted behavioral tests for the round-5 second-session operators.

Each test plants a distribution where the operator's defining
property is FORCED (a dominant heavy hitter, a quoted subset, a
redundant retrieval page, an exact-duplicate vector, a clamped
upsample factor, an attributable purchase) and asserts the operator
finds exactly it — complementing the oracle hash-match, which checks
engine agreement but not intent.
"""

from __future__ import annotations

import datetime
import math
import os

from pyspark.sql import functions as F
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


def _docs(spark, tmp_path, texts, source="src"):
    rows = [
        (int(i), t, "en", source if isinstance(source, str) else source[i], len(t))
        for i, t in enumerate(texts)
    ]
    return _write(spark, tmp_path, "documents", DOC_SCHEMA, rows)


def test_cms_estimate_never_undercounts_and_finds_the_heavy_hitter(
    spark, tmp_path
):
    from citeconnect_datapipeline_spark.operators.statistics import (
        cms_heavy_hitters,
    )

    texts = [" ".join(["alpha"] * 50 + ["beta"] * 7), "beta gamma beta"]
    sf = _docs(spark, tmp_path, texts)
    rows = {r["word"]: r for r in cms_heavy_hitters(spark, sf).collect()}
    assert rows["alpha"]["exact_cnt"] == 50
    assert rows["beta"]["exact_cnt"] == 9
    for r in rows.values():
        # CMS collisions only ADD counts — an estimate below exact
        # would mean the sketch is wrong, not just coarse.
        assert r["cms_est"] >= r["exact_cnt"]
        assert r["overestimate"] == r["cms_est"] - r["exact_cnt"]
    top = max(rows.values(), key=lambda r: r["exact_cnt"])
    assert top["word"] == "alpha"


def test_containment_detects_quoted_subset_that_jaccard_misses(
    spark, tmp_path
):
    from citeconnect_datapipeline_spark.operators.dedup import (
        ngram_containment_topk,
    )

    words = [f"w{i}" for i in range(30)]
    long_doc = " ".join(words)
    short_doc = " ".join(words[:10])  # quoted wholesale in long_doc
    sf = _docs(spark, tmp_path, [long_doc, short_doc])
    rows = ngram_containment_topk(spark, sf).collect()
    pair = [r for r in rows if r["doc_a"] == 0 and r["doc_b"] == 1]
    assert len(pair) == 1
    r = pair[0]
    # every shingle of the short doc appears in the long one...
    assert r["contain_b_in_a"] == 1.0
    # ...while symmetric Jaccard stays low (the union is the long doc)
    assert r["jaccard"] < 0.35
    assert r["contain_a_in_b"] == r["jaccard"]  # common == n_b here


def test_mmr_demotes_the_exact_duplicate_cosine_would_rank_second(
    spark, tmp_path
):
    from citeconnect_datapipeline_spark.operators.similarity import (
        mmr_diversified_topk,
    )

    embs = [
        (0, [1.0, 1.0, 0.0, 0.0], 0),  # query
        (1, [1.0, 0.9, 0.0, 0.0], 0),  # most relevant
        (2, [1.0, 0.9, 0.0, 0.0], 0),  # exact duplicate of 1
        (3, [0.85, 1.0, 0.0, 0.0], 0),  # nearly as relevant, diverse
        (4, [0.0, 0.0, 1.0, 0.0], 1),  # irrelevant
    ]
    sf = _write(spark, tmp_path, "embeddings", EMB_SCHEMA, embs)
    picked = mmr_diversified_topk(spark, sf).collect()
    order = [r["vec_id"] for r in picked]
    # plain cosine top-2 would be [1, 2]; MMR must interleave the
    # diverse 3 ahead of the duplicate 2
    assert order[0] == 1
    assert order[1] == 3
    assert order[2] == 2
    # mmr scores are non-increasing only per-step definition; the
    # first pick's score is lambda * its relevance
    assert math.isclose(
        picked[0]["mmr_score"], round(0.7 * picked[0]["relevance"], 6),
        rel_tol=1e-9, abs_tol=1e-6,
    )


def test_rp_lsh_retrieves_exact_duplicate_in_bucket_zero(spark, tmp_path):
    from citeconnect_datapipeline_spark.operators.similarity import (
        ann_rp_lsh_portable,
    )

    base = [0.3, -0.2, 0.9, 0.1] * 16  # 64-d
    other = [(-1.0) ** i * (0.1 + 0.01 * i) for i in range(64)]
    embs = [
        (0, base, 0),
        (5, list(base), 0),  # exact duplicate of the probe
        (7, other, 1),
    ]
    sf = _write(spark, tmp_path, "embeddings", EMB_SCHEMA, embs)
    rows = ann_rp_lsh_portable(spark, sf).collect()
    by_id = {r["vec_id"]: r for r in rows}
    assert 5 in by_id
    assert by_id[5]["sig_hamming"] == 0  # identical signature bucket
    assert by_id[5]["cosine"] == 1.0


def test_upsampling_plan_clamps_and_materializes_exact_row_counts(
    spark, tmp_path
):
    from citeconnect_datapipeline_spark.operators.training import (
        source_upsampling_plan,
    )

    texts = [" ".join(["tok"] * 100)] * 90 + ["tok tok"] * 2
    sources = ["big"] * 90 + ["tiny"] * 2
    sf = _docs(spark, tmp_path, texts, source=sources)
    rows = {r["source"]: r for r in source_upsampling_plan(spark, sf).collect()}
    # the dominant source is damped to the floor, the tail clamps at 4
    assert rows["big"]["repeat_factor"] == 1
    assert rows["tiny"]["repeat_factor"] == 4
    for r in rows.values():
        assert r["rows_after"] == r["n_docs"] * r["repeat_factor"]
    total = sum(r["rows_after"] for r in rows.values())
    share = sum(r["final_share"] for r in rows.values())
    assert total == 90 * 1 + 2 * 4
    assert abs(share - 1.0) < 1e-5


def test_last_touch_attribution_windows_and_orphans(spark, tmp_path):
    from citeconnect_datapipeline_spark.operators.timeseries import (
        last_touch_attribution,
    )

    t0 = datetime.datetime(2024, 3, 1, 12, 0, 0)

    def ev(i, days, typ, val, user=1):
        return (
            int(i),
            t0 + datetime.timedelta(days=days),
            int(user),
            typ,
            float(val),
            "{}",
        )

    rows = [
        ev(1, 0, "click", 0.0),
        ev(2, 1, "purchase", 10.0),  # 1 day after click: attributed
        ev(3, 20, "purchase", 5.0),  # 19 days after click: expired
        ev(4, 2, "purchase", 7.0, user=2),  # no click at all: orphan
    ]
    sf = _write(spark, tmp_path, "events", EVENT_SCHEMA, rows)
    out = {r["day"]: r for r in last_touch_attribution(spark, sf).collect()}
    assert out["2024-03-02"]["n_attributed"] == 1
    assert out["2024-03-02"]["attributed_value"] == 10.0
    assert out["2024-03-21"]["n_attributed"] == 0
    assert out["2024-03-03"]["n_attributed"] == 0
    assert sum(r["n_purchases"] for r in out.values()) == 3


def test_equidepth_buckets_hold_a_quarter_each_on_distinct_values(
    spark, tmp_path
):
    from citeconnect_datapipeline_spark.operators.statistics import (
        equidepth_histogram,
    )

    rows = [
        (int(i), 1, "O", float(i), datetime.datetime(2024, 1, 1), "1-URGENT")
        for i in range(1, 101)
    ]
    sf = _write(spark, tmp_path, "orders", ORDER_SCHEMA, rows)
    # r12 dropped the query's trailing sort (the driver hashes
    # row-sorted values); order rows here instead
    out = sorted(
        equidepth_histogram(spark, sf).collect(),
        key=lambda r: r["bucket"],
    )
    assert [r["bucket"] for r in out] == [1, 2, 3, 4]
    for r in out:
        assert abs(r["n"] - 25) <= 1  # equi-DEPTH, not equi-width
    # bucket ranges tile the domain in order
    assert out[0]["lo"] == 1.0 and out[3]["hi"] == 100.0
    for a, b in zip(out, out[1:]):
        assert a["hi"] < b["lo"]


def test_kmeans_portable_invariants_and_determinism(spark, tmp_path):
    from citeconnect_datapipeline_spark.operators.clustering import (
        kmeans_portable,
    )

    # four tight orthogonal blobs, one label each
    embs = []
    vid = 0
    for blob in range(4):
        for j in range(5):
            v = [0.0] * 64
            v[blob * 16] = 10.0
            v[blob * 16 + 1] = 0.1 * j
            embs.append((vid, v, blob))
            vid += 1
    sf = _write(spark, tmp_path, "embeddings", EMB_SCHEMA, embs)
    out1 = kmeans_portable(spark, sf).collect()
    out2 = kmeans_portable(spark, sf).collect()
    assert [tuple(r) for r in out1] == [tuple(r) for r in out2]
    assert sum(r["n_vecs"] for r in out1) == 20
    for r in out1:
        assert r["inertia"] >= 0.0
        assert 0.0 < r["purity"] <= 1.0
    # blobs are orthogonal and tight: majority label purity must be
    # perfect for every surviving cluster
    assert all(r["purity"] == 1.0 for r in out1)


def test_inplane_hash_embedding_matches_fake_model(spark, tmp_path):
    from citeconnect_datapipeline_spark.operators.similarity import (
        _FakeModel,
        embed_search_portable,
    )

    texts = ["spark join merge", "spark join merge", "vector scan table"]
    sf = _docs(spark, tmp_path, texts)
    rows = embed_search_portable(spark, sf).collect()
    by_id = {r["doc_id"]: r for r in rows}
    # doc 1 is an exact text duplicate of the probe doc 0: the hash
    # embedding is identical, so cosine must be exactly 1 after
    # rounding
    assert by_id[1]["cosine"] == 1.0
    assert by_id[2]["cosine"] < 1.0
    # and the in-plane expression IS _FakeModel.encode: same hash,
    # same int16 assembly (normalization divides out of cosine)
    enc = _FakeModel.get().encode([texts[0], texts[2]])
    cos_fake = sum(a * b for a, b in zip(enc[0], enc[1]))
    assert math.isclose(cos_fake, by_id[2]["cosine"], abs_tol=1e-6)


def test_interevent_histogram_buckets_by_log2_gap(spark, tmp_path):
    from citeconnect_datapipeline_spark.operators.timeseries import (
        interevent_gap_histogram,
    )

    t0 = datetime.datetime(2024, 3, 1, 12, 0, 0)
    rows = [
        (1, t0, 1, "view", 0.0, "{}"),
        (2, t0 + datetime.timedelta(seconds=2), 1, "view", 0.0, "{}"),
        (3, t0 + datetime.timedelta(seconds=2 + 300), 1, "view", 0.0, "{}"),
        (4, t0, 2, "view", 0.0, "{}"),
    ]
    sf = _write(spark, tmp_path, "events", EVENT_SCHEMA, rows)
    out = {r["bucket"]: r for r in interevent_gap_histogram(spark, sf).collect()}
    # gap of 2 s -> log2(3) -> bucket 1; gap of 300 s -> log2(301) -> 8
    assert out[1]["n_gaps"] == 1
    assert out[8]["n_gaps"] == 1
    # cross-user boundaries produce no gap: exactly two gaps total
    assert sum(r["n_gaps"] for r in out.values()) == 2
