"""Property tests: the vectorized XXH64 kernel (functions/xxh64.py)
must be BIT-IDENTICAL to Spark's ``xxhash64`` expression — that
equality is the entire correctness argument for swapping the
interpreted shingle HOF for the Arrow stage (every downstream posting
list, LSH band, simhash bit and oracle hash is a function of these
values)."""

from __future__ import annotations

import random
import string

import numpy as np
import pytest
from pyspark.sql import functions as F

from citeconnect_datapipeline_spark.functions import xxh64 as xk


def _spark_xxh64_longs(spark, values: list[int]) -> list[int]:
    df = spark.createDataFrame([(v,) for v in values], "v long")
    return [
        r[0] for r in df.select(F.xxhash64("v")).collect()
    ]


def test_hash_long_matches_spark(spark):
    rng = random.Random(7)
    vals = [0, 1, -1, 2**63 - 1, -(2**63), 42] + [
        rng.randint(-(2**63), 2**63 - 1) for _ in range(200)
    ]
    expected = _spark_xxh64_longs(spark, vals)
    got = xk.hash_long(np.array(vals, dtype=np.int64), xk._SEED)
    assert got.view(np.int64).tolist() == expected


def test_hash_int_matches_spark(spark):
    rng = random.Random(8)
    vals = [0, 1, -1, 2**31 - 1, -(2**31)] + [
        rng.randint(-(2**31), 2**31 - 1) for _ in range(200)
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v int")
    expected = [r[0] for r in df.select(F.xxhash64("v")).collect()]
    got = xk.hash_int(np.array(vals, dtype=np.int64), xk._SEED)
    assert got.view(np.int64).tolist() == expected


def test_hash_chained_long_seed_matches_spark(spark):
    # xxhash64(a, b) chains: hash_long(b, hash_long(a, 42))
    rng = random.Random(9)
    pairs = [
        (rng.randint(-(2**63), 2**63 - 1), rng.randint(-(2**63), 2**63 - 1))
        for _ in range(100)
    ]
    df = spark.createDataFrame(pairs, "a long, b long")
    expected = [r[0] for r in df.select(F.xxhash64("a", "b")).collect()]
    a = np.array([p[0] for p in pairs], dtype=np.int64)
    b = np.array([p[1] for p in pairs], dtype=np.int64)
    got = xk.hash_long(b, xk.hash_long(a, xk._SEED))
    assert got.view(np.int64).tolist() == expected


def _ragged_from_strings(words: list[str]):
    bufs = [w.encode("utf-8") for w in words]
    flat = b"".join(bufs)
    lens = np.array([len(b) for b in bufs], dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1])).astype(np.int64)
    return (
        np.frombuffer(flat, dtype=np.uint8)
        if flat
        else np.zeros(0, dtype=np.uint8)
    ), starts, lens


@pytest.mark.parametrize("seed", [42, 0, 123456789])
def test_hash_bytes_matches_spark(spark, seed):
    rng = random.Random(seed)
    alphabet = string.ascii_lowercase + string.digits
    words = [""]
    # cover every length class: <4, 4-7, 8-31 (vectorized), >=32
    # (scalar fallback), plus multi-byte UTF-8
    for ln in list(range(0, 40)) + [63, 64, 100]:
        words.append("".join(rng.choice(alphabet) for _ in range(ln)))
    words += ["héllo", "naïve café", "日本語のテキスト", "🎉" * 9]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    expected = [r[0] for r in df.select(F.xxhash64("w")).collect()]
    buf, starts, lens = _ragged_from_strings(words)
    got = xk.hash_bytes_ragged(
        buf, starts, lens, np.uint64(42) if seed == 42 else np.uint64(seed)
    )
    if seed == 42:
        assert got.view(np.int64).tolist() == expected
    else:
        # non-42 seeds: compare against the scalar reference (Spark's
        # expression has no seed parameter at the SQL surface)
        ref = [
            xk._hash_bytes_scalar(w.encode("utf-8"), seed) for w in words
        ]
        assert got.tolist() == ref


def test_shingle_hashes_flat_matches_spark_expr(spark):
    from citeconnect_datapipeline_spark.operators.dedup import (
        _shingle_hash_expr,
    )

    rng = random.Random(11)
    alphabet = string.ascii_lowercase + string.digits
    docs = []
    for i in range(60):
        nwords = rng.choice([1, 2, 3, 4, 5, 10, 50])
        ws = [
            "".join(
                rng.choice(alphabet)
                for _ in range(rng.choice([0, 1, 2, 3, 5, 8, 20, 35]))
            )
            for _ in range(nwords)
        ]
        docs.append((i, " ".join(ws)))
    # also the pathological single-empty-word doc and repeats
    docs.append((100, ""))
    docs.append((101, "same same same same"))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    # Spark-side NON-distinct shingles (the kernel returns raw
    # shingles; distinct is applied by the consumer modes)
    words = F.split(F.lower(F.col("text")), "[^a-z0-9]+")
    raw = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(words) - 2, F.lit(1))),
        lambda i: F.xxhash64(
            *[F.get(words, i + j - 1) for j in range(3)]
        ),
    )
    expected = {
        r["doc_id"]: r["sh"]
        for r in df.select("doc_id", raw.alias("sh")).collect()
    }
    # kernel side
    rows = sorted(expected)
    import re

    flat_words: list[str] = []
    doc_offsets = [0]
    by_id = dict(docs)
    for doc_id in rows:
        ws = re.split(r"[^a-z0-9]+", by_id[doc_id].lower())
        flat_words.extend(ws)
        doc_offsets.append(len(flat_words))
    buf, starts, lens = _ragged_from_strings(flat_words)
    h, soff = xk.shingle_hashes_flat(
        buf, starts, lens, np.array(doc_offsets, dtype=np.int64), 3
    )
    h = h.view(np.int64)
    for idx, doc_id in enumerate(rows):
        got = h[soff[idx] : soff[idx + 1]].tolist()
        assert got == expected[doc_id], f"doc {doc_id}"


def test_shingle_distinct_matches_expr_on_lake(spark, sf_dir):
    """End-to-end: the Arrow explode stage equals the legacy
    interpreted-HOF explode on the real verification corpus."""
    from citeconnect_datapipeline_spark.operators.dedup import (
        _nonempty_filter,
        _shingle_hash_expr,
        _shingle_arrow_stage,
    )
    from citeconnect_datapipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    legacy = (
        docs.filter(_nonempty_filter("text"))
        .select("doc_id", F.explode(_shingle_hash_expr("text", 3)).alias("sh"))
        .collect()
    )
    arrow = _shingle_arrow_stage(docs, "text", "explode", 3).collect()
    assert sorted(map(tuple, arrow)) == sorted(map(tuple, legacy))


def _edge_docs(spark):
    """Lake docs plus the edge classes the lake may not cover: empty
    text (filtered), punctuation-only, 1-2 word docs (NULL-padded
    shingles), heavy in-doc repetition (distinct matters), unicode."""
    rows = [
        (9001, ""),
        (9002, "...!!!"),
        (9003, "one"),
        (9004, "two words"),
        (9005, "same same same same same same"),
        (9006, "héllo wörld naïve café crème brûlée"),
        (9007, "a b c d e f g h i j k l m n o p q r s t"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _with_edges(spark, docs):
    return docs.select("doc_id", "text").unionByName(_edge_docs(spark))


def test_sizes_mode_matches_expr(spark, sf_dir):
    from citeconnect_datapipeline_spark.operators.dedup import (
        _nonempty_filter,
        _shingle_hash_expr,
        _shingle_arrow_stage,
    )
    from citeconnect_datapipeline_spark.sources.tables import load_table

    docs = _with_edges(spark, load_table(spark, sf_dir, "documents"))
    legacy = (
        docs.filter(_nonempty_filter("text"))
        .select("doc_id", F.size(_shingle_hash_expr("text", 3)).alias("n"))
        .collect()
    )
    arrow = _shingle_arrow_stage(docs, "text", "sizes", 3).collect()
    assert sorted(map(tuple, arrow)) == sorted(map(tuple, legacy))


def test_simhash_mode_matches_groupby_votes(spark, sf_dir):
    """simhash mode equals the legacy explode + 32-conditional-sum
    groupBy formulation bit-for-bit."""
    from citeconnect_datapipeline_spark.operators.dedup import (
        _nonempty_filter,
        _shingle_hash_expr,
        _shingle_arrow_stage,
    )
    from citeconnect_datapipeline_spark.sources.tables import load_table

    docs = _with_edges(spark, load_table(spark, sf_dir, "documents"))
    sh = (
        docs.filter(_nonempty_filter("text"))
        .select("doc_id", F.explode(_shingle_hash_expr("text", 3)).alias("h"))
    )
    votes = sh.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(1) == 1, 1)
                .otherwise(-1)
            ).alias(f"b{i}")
            for i in range(32)
        ]
    )
    fingerprint = None
    for i in range(32):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1)).otherwise(F.lit(0))
        term = (bit * F.lit(2**i)).cast("long")
        fingerprint = term if fingerprint is None else fingerprint + term
    legacy = votes.select("doc_id", fingerprint.alias("simhash")).collect()
    arrow = _shingle_arrow_stage(docs, "text", "simhash", 3).collect()
    assert sorted(map(tuple, arrow)) == sorted(map(tuple, legacy))


def test_bands_mode_matches_signature_fold(spark, sf_dir):
    """bands mode equals the legacy per-row Catalyst aggregate fold
    (16 salted min-hashes, banded 4x4, chained xxhash64 band keys)."""
    from citeconnect_datapipeline_spark.operators.dedup import (
        _nonempty_filter,
        _shingle_hash_expr,
        _shingle_arrow_stage,
    )
    from citeconnect_datapipeline_spark.sources.tables import load_table

    num_hashes, band_size = 16, 4
    docs = _with_edges(spark, load_table(spark, sf_dir, "documents"))
    arr = _shingle_hash_expr("text", 3)
    init = F.struct(
        *[
            F.lit(2**63 - 1).cast("long").alias(f"mh{i}")
            for i in range(num_hashes)
        ]
    )
    signature = F.aggregate(
        arr,
        init,
        lambda acc, x: F.struct(
            *[
                F.least(acc[f"mh{i}"], F.xxhash64(x, F.lit(i))).alias(
                    f"mh{i}"
                )
                for i in range(num_hashes)
            ]
        ),
    )
    minhashes = (
        docs.filter(_nonempty_filter("text"))
        .select("doc_id", signature.alias("sig"))
        .select(
            "doc_id",
            *[
                F.col(f"sig.mh{i}").alias(f"mh{i}")
                for i in range(num_hashes)
            ],
        )
    )
    legacy = minhashes.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        *[
                            F.col(f"mh{b * band_size + j}")
                            for j in range(band_size)
                        ]
                    )
                    for b in range(num_hashes // band_size)
                ]
            )
        ).alias("band_idx", "band_hash"),
    ).collect()
    arrow = _shingle_arrow_stage(
        docs, "text", "bands", 3,
        num_hashes=num_hashes, band_size=band_size,
    ).collect()
    assert sorted(map(tuple, arrow)) == sorted(map(tuple, legacy))


def test_explode_mode_string_key(spark, sf_dir):
    """explode mode with a non-doc_id key column (source_overlap's
    grain): per-ROW distinct hashes keyed by the string column."""
    from citeconnect_datapipeline_spark.operators.dedup import (
        _nonempty_filter,
        _shingle_hash_expr,
        _shingle_arrow_stage,
    )
    from citeconnect_datapipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    legacy = (
        docs.filter(_nonempty_filter("text"))
        .select(
            "source", F.explode(_shingle_hash_expr("text", 3)).alias("sh")
        )
        .collect()
    )
    arrow = _shingle_arrow_stage(
        docs, "text", "explode", 3, key_col="source"
    ).collect()
    assert sorted(map(tuple, arrow)) == sorted(map(tuple, legacy))
