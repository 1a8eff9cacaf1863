"""Behavioral tests for the round-4 curation/retrieval additions on
CRAFTED corpora (the oracle audit proves engine parity on the driver
tables; these prove the operators detect what they claim to detect).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
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


def _write_docs(spark, tmp_path, rows):
    rows = [
        (int(i), t, "en", "src", len(t)) for i, t in rows
    ]
    spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(str(tmp_path), "documents.parquet"))
    return str(tmp_path)


def _write_embs(spark, tmp_path, rows):
    rows = [(int(i), [float(x) for x in v], int(lb)) for i, v, lb in rows]
    spark.createDataFrame(rows, EMB_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(str(tmp_path), "embeddings.parquet"))
    return str(tmp_path)


def test_bm25_ranks_term_dense_doc_first(spark, tmp_path):
    from citeconnect_datapipeline_spark.operators.text import bm25_search

    filler = "alpha beta gamma delta " * 30
    rows = [
        (0, "hash join vector " * 20),           # dense in all terms
        (1, filler + "hash join vector"),         # one mention each
        (2, filler),                              # no query terms
        (3, filler + "hash hash"),                # one term only
    ]
    out = bm25_search(spark, _write_docs(spark, tmp_path, rows)).collect()
    ids = [r["doc_id"] for r in out]
    assert ids[0] == 0, "term-dense doc must rank first"
    assert 2 not in ids, "doc without any query term must not match"
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[0]["matched_terms"] == 3
    assert by_id[3]["matched_terms"] == 1
    assert all(r["score"] > 0 for r in out)


def test_label_outlier_flags_planted_mislabel(spark, tmp_path):
    from citeconnect_datapipeline_spark.operators.training import (
        label_outlier_flags,
    )

    # Two tight clusters on orthogonal axes; vec 99 sits in cluster B
    # but carries cluster A's label.
    rows = []
    for i in range(10):
        rows.append((i, [1.0, 0.01 * i, 0.0, 0.0], 0))
    for i in range(10, 20):
        rows.append((i, [0.0, 0.01 * i, 1.0, 0.0], 1))
    rows.append((99, [0.0, 0.05, 1.0, 0.0], 0))  # mislabeled
    out = label_outlier_flags(
        spark, _write_embs(spark, tmp_path, rows)
    ).collect()
    flags = {r["vec_id"]: r["mislabel"] for r in out}
    assert flags[99] is True
    assert sum(flags[i] for i in range(20)) == 0, (
        "clean cluster members must not be flagged"
    )
    planted = next(r for r in out if r["vec_id"] == 99)
    assert planted["best_other_label"] == 1


def test_attrition_funnel_is_monotone_and_anchored(spark, sf_dir):
    from citeconnect_datapipeline_spark.operators.text import (
        filter_attrition_funnel,
    )

    rows = filter_attrition_funnel(spark, sf_dir).collect()
    assert [r["stage_idx"] for r in rows] == [0, 1, 2, 3, 4]
    docs = [r["docs"] for r in rows]
    words = [r["words"] for r in rows]
    assert all(a >= b for a, b in zip(docs, docs[1:]))
    assert all(a >= b for a, b in zip(words, words[1:]))
    assert rows[0]["doc_share"] == 1.0 and rows[0]["word_share"] == 1.0
    # funnel head equals the corpus, tail equals the gopher keep count
    from citeconnect_datapipeline_spark.operators.text import (
        gopher_quality_flags,
    )

    g = gopher_quality_flags(spark, sf_dir)
    assert rows[0]["docs"] == g.count()
    assert rows[4]["docs"] == g.filter("keep").count()


def test_sq8_codes_bounded_and_lossless_on_constant_dims(spark, tmp_path):
    from citeconnect_datapipeline_spark.operators.similarity import (
        embedding_sq_int8,
    )

    rows = [
        (0, [0.0, 5.0, -1.0], 0),
        (1, [1.0, 5.0, 1.0], 0),
        (2, [0.5, 5.0, 3.0], 0),
    ]
    out = embedding_sq_int8(
        spark, _write_embs(spark, tmp_path, rows)
    ).collect()
    d = len(rows[0][1])
    for r in out:
        assert 0 <= r["code_sum"] <= 255 * d
        assert r["mse"] >= 0 and r["max_abs_err"] >= 0
        # 8-bit grid on ranges of width <= 4 keeps error under half a
        # quantization step of the widest dim
        assert r["max_abs_err"] <= 4.0 / 255 / 2 + 1e-9
    # a row sitting on the grid in every dim is lossless: row 0 is the
    # per-dim minimum everywhere (constant dim included)
    by_id = {r["vec_id"]: r for r in out}
    assert by_id[0]["max_abs_err"] == 0.0


def test_decontaminate_drops_benchmark_copy_only(spark, tmp_path):
    from citeconnect_datapipeline_spark.operators.training import (
        decontaminate_corpus,
    )

    bench_text = (
        "quick brown fox jumps over the lazy dog near the riverbank "
        "while seven wizards mix potent elixirs at midnight"
    )
    clean = "totally unrelated prose about spark plans and shuffles "
    rows = [
        (50, bench_text),          # benchmark doc (id % 50 == 0)
        (1, bench_text + " extra"),  # near-copy -> dropped
        (2, clean * 5),             # clean -> kept
        (3, clean * 3 + " another clean body of words"),
    ]
    out = decontaminate_corpus(
        spark, _write_docs(spark, tmp_path, rows)
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["docs_total"] == 3  # benchmark doc itself excluded
    assert r["docs_dropped"] == 1
    assert r["docs_kept"] == 2
    assert r["docs_total"] == r["docs_dropped"] + r["docs_kept"]
    assert 0.0 <= r["drop_share"] <= 1.0


def test_bm25_idf_downweights_ubiquitous_term(spark, tmp_path):
    from citeconnect_datapipeline_spark.operators.text import bm25_search

    # 'hash' appears once in EVERY doc; 'vector' once in ONE doc. Same
    # tf, same doc length -> the rare term must contribute more.
    filler = "alpha beta gamma delta epsilon zeta " * 10
    rows = [(i, filler + "hash") for i in range(9)]
    rows.append((9, filler + "vector"))
    out = bm25_search(spark, _write_docs(spark, tmp_path, rows)).collect()
    by_id = {r["doc_id"]: r["score"] for r in out}
    assert by_id[9] > by_id[0]


def test_salted_group_rank_equals_naive_window_under_skew(spark):
    """Property (r4 verdict #6): the two-phase salted rank must be
    byte-identical to row_number() OVER (PARTITION BY g ORDER BY
    md5(key), key) — including on a pathologically skewed frame
    where one group holds 95% of the mass (the case that makes the
    naive window a single task)."""
    from pyspark.sql import Window

    from citeconnect_datapipeline_spark.operators.training import (
        salted_group_rank,
    )

    rows = [(i, "dominant") for i in range(950)]
    rows += [(1000 + i, f"tail{i % 5}") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id bigint, g string")

    naive_w = Window.partitionBy("g").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    naive = df.select(
        "doc_id", "g", F.row_number().over(naive_w).alias("rn")
    )
    salted = salted_group_rank(df, "g")

    n_rows = df.count()
    assert salted.count() == n_rows
    # exact equality: anti-join both ways is empty
    assert salted.exceptAll(naive).count() == 0
    assert naive.exceptAll(salted).count() == 0

    # and the physical plan partitions the rank window by
    # (group, salt), never by the group alone — the whole point
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan


def test_salted_group_rank_dense_from_one(spark):
    """Ranks are 1..n per group with no gaps or dups (offsets join
    correctly across salt boundaries)."""
    from citeconnect_datapipeline_spark.operators.training import (
        salted_group_rank,
    )

    rows = [(i, "g%d" % (i % 3)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id bigint, g string")
    out = salted_group_rank(df, "g").groupBy("g").agg(
        F.count("*").alias("n"),
        F.min("rn").alias("lo"),
        F.max("rn").alias("hi"),
        F.countDistinct("rn").alias("nd"),
    )
    for r in out.collect():
        assert r["lo"] == 1
        assert r["hi"] == r["n"] == r["nd"]


def _write_docs_src(spark, tmp_path, rows):
    """rows: (doc_id, text, source)"""
    rows = [(int(i), t, "en", s, len(t)) for i, t, s in rows]
    spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(str(tmp_path), "documents.parquet"))
    return str(tmp_path)


def test_minhash_estimate_exact_dup_and_error_bounds(spark, tmp_path):
    """An exact duplicate pair must estimate Jaccard 1.0 with zero
    error; every row's estimate and truth live in [0, 1] and the
    error column is |est - true|."""
    from citeconnect_datapipeline_spark.operators.dedup import (
        minhash_jaccard_estimate,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta " * 6
    rows = [
        (1, base, "s0"),
        (2, base, "s0"),  # exact dup of 1
        (3, base + " iota kappa mu nu xi", "s0"),  # near-dup
        (4, "completely different words entirely other tokens", "s1"),
    ]
    out = minhash_jaccard_estimate(
        spark, _write_docs_src(spark, tmp_path, rows)
    ).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r for r in out}
    assert (1, 2) in pairs
    r12 = pairs[(1, 2)]
    assert r12["est_jaccard"] == 1.0
    assert r12["true_jaccard"] == 1.0
    assert r12["abs_err"] == 0.0
    for r in out:
        assert 0.0 <= r["est_jaccard"] <= 1.0
        assert 0.0 <= r["true_jaccard"] <= 1.0
        assert abs(
            r["abs_err"] - abs(r["est_jaccard"] - r["true_jaccard"])
        ) < 2e-6


def test_source_kl_zero_for_identical_and_larger_for_outlier(
    spark, tmp_path
):
    """A source textually identical to the corpus majority scores
    near-zero KL; a disjoint-vocabulary source scores strictly
    higher. Smoothing keeps every KL finite and >= 0 (Gibbs)."""
    from citeconnect_datapipeline_spark.operators.training import (
        source_kl_divergence,
    )

    common = "spark shuffle partition join filter scan " * 20
    rows = [(i, common, "same%d" % (i % 2)) for i in range(20)]
    rows += [
        (100 + i, "zz%d qq%d ww%d " % (i, i, i) * 30, "outlier")
        for i in range(3)
    ]
    out = source_kl_divergence(
        spark, _write_docs_src(spark, tmp_path, rows)
    ).collect()
    kl = {r["source"]: r["kl_divergence"] for r in out}
    # Gibbs: KL >= 0 always (holds only because the grid covers ALL
    # 256 buckets — a truncated support made this negative)
    assert all(v >= 0.0 for v in kl.values())
    # the two textually identical sources must score identically
    # (up to rounding), and far below the disjoint-vocabulary one
    assert abs(kl["same0"] - kl["same1"]) < 1e-4
    assert kl["outlier"] > 5 * kl["same0"]
    assert all(r["n_buckets"] == 256 for r in out)


def test_ks_drift_separated_cohorts_hits_one(spark, tmp_path):
    """If every even-user value is below every odd-user value, the
    ECDF gap reaches 1.0 exactly at the boundary bin."""
    import datetime

    from citeconnect_datapipeline_spark.operators.statistics import (
        ks_drift_statistic,
    )
    from pyspark.sql.types import (
        DoubleType,
        StringType as _S,
        StructField as _F,
        StructType as _T,
        TimestampType,
    )

    ts = datetime.datetime(2024, 1, 1)
    schema = _T(
        [
            _F("event_id", LongType()),
            _F("ts", TimestampType()),
            _F("user_id", LongType()),
            _F("event_type", _S()),
            _F("value", DoubleType()),
            _F("props", _S()),
        ]
    )
    rows = [
        (i, ts, i, "e", float(5 + (i % 2) * 100), "{}")
        for i in range(200)
    ]
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(str(tmp_path), "events.parquet"))
    out = ks_drift_statistic(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["ks_stat"] == 1.0
    assert r["ks_at_bin"] == 5  # gap peaks at the even cohort's bin
    assert r["n_bins"] == 2


def test_repetition_ratios_degenerate_vs_clean(spark, tmp_path):
    """A pure 2-token loop is fully covered at both gram sizes; an
    all-distinct doc scores 0; ratios live in [0, 1]."""
    from citeconnect_datapipeline_spark.operators.text import (
        gopher_repetition_ratios,
    )

    rows = [
        (1, "spam ham " * 20, "s0"),  # degenerate loop
        (2, "one two three four five six seven eight nine ten", "s0"),
        (3, "x y z x y z padding words here now", "s0"),  # partial
    ]
    out = gopher_repetition_ratios(
        spark, _write_docs_src(spark, tmp_path, rows)
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[1]["dup2_ratio"] == 1.0
    assert by_id[1]["dup3_ratio"] == 1.0
    assert by_id[2]["dup2_ratio"] == 0.0
    assert by_id[2]["dup3_ratio"] == 0.0
    r3 = by_id[3]
    assert 0.0 < r3["dup2_ratio"] < 1.0
    for r in out:
        assert 0.0 <= r["dup3_ratio"] <= r["dup2_ratio"] + 1e-9


def test_hard_negatives_never_share_anchor_label(spark, sf_dir):
    """Every mined negative carries a different label than its
    anchor, ranks are dense 1..k, and similarities are
    non-increasing within an anchor."""
    from citeconnect_datapipeline_spark.operators.similarity import (
        HARDNEG_TOPK,
        hard_negative_mining,
    )

    rows = hard_negative_mining(spark, sf_dir).collect()
    assert rows
    by_q = {}
    for r in rows:
        assert r["neg_label"] != r["q_label"]
        by_q.setdefault(r["q_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= HARDNEG_TOPK
        sims = [r["similarity"] for r in rs]
        assert sims == sorted(sims, reverse=True)
