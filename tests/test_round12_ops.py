"""Round-12 behavioral tests: the r11 ADVICE fixes and verdict items
made observable.

Same pattern as the earlier round files: plant inputs where the fixed
property is FORCED and assert the documented behavior directly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _lake(spark, tmp_path, **tables):
    sf = str(tmp_path / "lake")
    for name, (rows, schema) in tables.items():
        spark.createDataFrame(rows, schema).write.mode(
            "overwrite"
        ).parquet(f"{sf}/{name}.parquet")
    return sf


# ------- fuzzy_prefix_pairs: entropy-adaptive segment boundaries -----


def test_adaptive_bounds_absorb_shared_prefix():
    """The degenerate-gram defense (r11 verdict #3): a constant
    10-char shared prefix carries ~zero diversity mass, so the first
    boundary must land well PAST it — the segment covering the shared
    region extends into varied territory instead of becoming a
    corpus-wide constant gram."""
    from citeconnect_datapipeline_spark.operators.dedup import (
        _adaptive_bounds,
    )

    counts = [1] * 10 + [20] * 30  # 'rep<k> '-style shared prefix
    bounds = _adaptive_bounds(counts, 11)
    assert bounds[0] == 0 and bounds[-1] == 40
    assert all(b2 > b1 for b1, b2 in zip(bounds, bounds[1:]))
    # first segment swallows the whole constant region plus at least
    # one varied char — its gram is NOT constant corpus-wide
    assert bounds[1] > 10


def test_adaptive_bounds_degenerate_counts_fall_back_uniform():
    """All-constant (or empty-corpus zero) counts: the eps floor
    makes every position equal mass, so boundaries degrade to the
    r11 uniform partition — never a crash, never an empty segment."""
    from citeconnect_datapipeline_spark.operators.dedup import (
        _adaptive_bounds,
    )

    for counts in ([1] * 40, [0] * 40):
        bounds = _adaptive_bounds(counts, 11)
        assert bounds[0] == 0 and bounds[-1] == 40
        widths = [b2 - b1 for b1, b2 in zip(bounds, bounds[1:])]
        assert len(widths) == 11 and all(w >= 1 for w in widths)
        assert max(widths) - min(widths) <= 1  # uniform partition


def test_fuzzy_pairs_exact_under_corpus_wide_shared_prefix(
    spark, tmp_path
):
    """The adversarial case the sf1 probe corpus manufactures: EVERY
    document shares a literal prefix. The blocked join must still
    equal the quadratic brute-force join exactly (the boundary
    placement is a performance lever, never a semantics lever)."""
    import random

    from __spark_entry__ import queries

    rng = random.Random(12)
    words = ("alpha beta gamma delta epsilon zeta eta theta iota "
             "kappa lam mu nu xi omicron pi rho sigma tau").split()
    rows = []
    doc = 0
    for fam in range(25):
        base = "rep3 " + " ".join(rng.choices(words, k=12))
        for _ in range(rng.randint(1, 3)):
            doc += 1
            text = base
            for _ in range(rng.randint(0, 6)):
                i = rng.randrange(5, len(text))  # keep the prefix
                text = text[:i] + rng.choice("abcxyz ") + text[i + 1:]
            rows.append((doc, text, rng.choice(["en", "de"])))
    sf = _lake(
        spark, tmp_path,
        documents=(rows, "doc_id long, text string, lang string"),
    )
    got = sorted(
        (r["doc_a"], r["doc_b"], r["edit_dist"])
        for r in queries()["fuzzy_prefix_pairs"](spark, sf).collect()
    )
    d = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "lang",
        F.substring(F.lower(F.col("text")), 1, 40).alias("pre"),
    )
    brute = sorted(
        (r["doc_a"], r["doc_b"], r["edit_dist"])
        for r in d.alias("x").join(
            d.alias("y"),
            (F.col("x.lang") == F.col("y.lang"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        ).select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.levenshtein("x.pre", "y.pre").alias("edit_dist"),
        ).filter(F.col("edit_dist") <= 10).collect()
    )
    assert got == brute and len(brute) > 0


# ---------- box/violin: null category cannot crash the chart ---------


def test_box_violin_null_category_filtered_and_chart_survives(
    spark, tmp_path
):
    """r11 ADVICE #1: a NULL category could win a top_k slot in the
    groupBy but never match the semi/left join, leaving density null
    and crashing the renderer on max([]). The aggregate now drops
    null categories up front, and the renderer degrades to box-only
    on a defensively-null density row instead of raising."""
    from citeconnect_datapipeline_spark.sinks.report import (
        box_violin_aggregate,
        svg_box_violin_chart,
    )

    rows = [(None, float(v)) for v in range(50)]  # null would win
    rows += [("a", 10.0)] * 5 + [("b", 20.0)] * 3
    df = spark.createDataFrame(rows, "k string, v double")
    got = box_violin_aggregate(df, "k", "v", bins=4, top_k=2).collect()
    assert [r["k"] for r in got] == ["a", "b"]  # null gone
    assert all(r["density"] is not None for r in got)

    # renderer: a null/empty density row degrades, never raises
    svg = svg_box_violin_chart(
        [
            {"k": "x", "lo": 0.0, "q1": 1.0, "med": 2.0, "q3": 3.0,
             "hi": 4.0, "density": None},
            {"k": "y", "lo": 0.0, "q1": 1.0, "med": 2.0, "q3": 3.0,
             "hi": 4.0, "density": []},
        ],
        "k",
    )
    assert "<svg" in svg and "<polygon" not in svg  # box-only


# -------- _cosine_vs_anchors: zero-norm rows emit NULL, not NaN ------


def test_cosine_vs_anchors_zero_norm_emits_null(spark):
    """r11 ADVICE #2: numpy division gives inf/NaN on a zero-norm
    embedding where Spark division semantics give null — and NaN
    sorts FIRST under desc(sim), silently winning top-k slots. The
    GEMM stage must mask non-finite sims to real NULLs."""
    from citeconnect_datapipeline_spark.operators.similarity import (
        _cosine_vs_anchors,
    )

    emb = spark.createDataFrame(
        [
            (1, "a", [1.0, 0.0]),
            (2, "b", [0.0, 0.0]),  # zero norm
            (3, "a", [0.0, 2.0]),
        ],
        "vec_id long, label string, embedding array<double>",
    )
    anchors = spark.createDataFrame(
        [(1, "a", [1.0, 0.0])],
        "q_id long, q_label string, qvec array<double>",
    )
    got = {r["vec_id"]: r["sim"] for r in
           _cosine_vs_anchors(emb, anchors).collect()}
    assert got[1] == 1.0 and got[3] == 0.0
    assert got[2] is None  # null, not NaN/inf
    # and a desc(sim) ranking never puts the zero-norm row first
    top = (
        _cosine_vs_anchors(emb, anchors)
        .orderBy(F.desc_nulls_last("sim"))
        .limit(1)
        .collect()[0]
    )
    assert top["vec_id"] == 1


# ------ fetch-ladder vs simulated-tier cascade parity (r11 #7) ------


def test_fetch_ladder_agrees_with_simulated_cascade_on_driver_data(
    spark,
):
    """r11 verdict #7: route the DRIVER testdata through the real
    fetch+parse ladder (fixture transport serving per-doc envelopes
    on the same doc_id%4 availability the simulated `_fetch_tiers`
    stage models) and assert the two cascades agree doc-for-doc on
    routing (method/quality) and on content modulo the DOCUMENTED
    `_squash` whitespace normalization the real parsers apply
    (extraction_parsers.py r10 ADVICE #3).

    Known, asserted divergence: the real fallback ladder returns the
    'failed' marker for abstracts <= 50 chars
    (content_extractor.py:181-197) while the simulated query's tier-4
    always emits the substring — every 'failed' doc must be exactly a
    short-abstract doc."""
    import html as html_mod

    from __spark_entry__ import queries
    from citeconnect_datapipeline_spark.operators.extraction_fetch import (
        FixtureTransport,
        TieredContentFetcher,
        extract_with_fetch_ladder,
    )
    from citeconnect_datapipeline_spark.operators.extraction_parsers import (
        _squash,
    )

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "text"
    )
    rows = docs.collect()  # 500 rows: bounded test fixture build

    fixtures = {}
    papers_rows = []
    for r in rows:
        did, text = r["doc_id"], r["text"] or ""
        mod = did % 4
        arxiv_id, pdf_url = None, None
        if mod == 0:
            arxiv_id = str(did)
            fixtures[f"https://arxiv.org/html/{did}"] = (
                200,
                '<html><body><section id="S1"><p>'
                + html_mod.escape(text[:400])
                + "</p></section></body></html>",
            )
        elif mod == 1:
            pdf_url = f"https://pdfs/{did}.pdf"
            fixtures[pdf_url] = (
                200,
                '<TEI xmlns="http://www.tei-c.org/ns/1.0"><text><body>'
                '<div type="introduction"><p>'
                + html_mod.escape(text[:300])
                + "</p></div></body></text></TEI>",
            )
        elif mod == 2:
            pdf_url = f"https://pdfs/{did}.pdf"
            fixtures[pdf_url] = (
                200,
                "1. Introduction\n" + text[:250],
            )
        papers_rows.append((did, arxiv_id, pdf_url, text[:150]))

    papers = spark.createDataFrame(
        papers_rows,
        "doc_id long, arxiv_id string, pdf_url string, abstract string",
    )
    ladder = {
        r["doc_id"]: r
        for r in extract_with_fetch_ladder(
            papers,
            lambda: TieredContentFetcher(FixtureTransport(fixtures)),
        ).collect()
    }
    sim = {
        r["doc_id"]: r
        for r in queries()["content_extract_4tier"](spark, sf).collect()
    }
    assert set(ladder) == set(sim) == {r["doc_id"] for r in rows}

    method_map = {
        "arxiv_html": "arxiv_html",
        "grobid_pdf": "grobid",
        "regex_pdf": "pdf_regex",
        "abstract_tldr": "abstract",
    }
    n_failed = 0
    methods_seen = set()
    for r in rows:
        did, text = r["doc_id"], r["text"] or ""
        lad, s = ladder[did], sim[did]
        if lad["method"] == "failed":
            n_failed += 1
            assert len(text[:150]) <= 50  # the documented divergence
            assert s["method"] == "abstract"
            continue
        methods_seen.add(lad["method"])
        assert method_map[lad["method"]] == s["method"], did
        assert lad["quality"] == s["quality"], did
        assert _squash(lad["content"] or "") == _squash(
            s["content"] or ""
        ), did
    # non-vacuity: every real tier was exercised by the corpus
    assert methods_seen == set(method_map)


def test_cosine_vs_anchors_nan_embedding_propagates_nan(spark):
    """Self-review r12: only ZERO-NORM pairs are nulled — a NaN that
    comes from a NaN-VALUED embedding must propagate as NaN (both
    engines rank NaN first under desc), not be silently nulled."""
    import math

    from citeconnect_datapipeline_spark.operators.similarity import (
        _cosine_vs_anchors,
    )

    emb = spark.createDataFrame(
        [
            (1, "a", [1.0, 0.0]),
            (2, "b", [float("nan"), 1.0]),  # corrupt, nonzero norm
        ],
        "vec_id long, label string, embedding array<double>",
    )
    anchors = spark.createDataFrame(
        [(1, "a", [1.0, 0.0])],
        "q_id long, q_label string, qvec array<double>",
    )
    got = {r["vec_id"]: r["sim"] for r in
           _cosine_vs_anchors(emb, anchors).collect()}
    assert got[1] == 1.0
    assert got[2] is not None and math.isnan(got[2])


# ------- r12 optimization internals: equality-pinning tests ---------


def test_bpe_python_encode_matches_catalyst_fold_chain(spark, sf_dir):
    """encode_word_vocab moved from 12 nested interpreted `aggregate`
    folds to a mapInPandas running the same left-to-right
    non-overlapping merge — the two forms must agree word-for-word
    on the real lake vocabulary."""
    from citeconnect_datapipeline_spark.operators.tokenizer import (
        _apply_merge,
        encode_word_vocab,
        train_bpe_merges,
    )
    from citeconnect_datapipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    merges = train_bpe_merges(docs)
    new = {
        r["word"]: r["n_tokens"]
        for r in encode_word_vocab(docs, merges).collect()
    }
    sym = F.split(F.col("word"), "")
    for _, a, b, _ in merges:
        sym = _apply_merge(sym, a, b)
    words = docs.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                lambda x: x != F.lit(""),
            )
        ).alias("word")
    ).distinct()
    old = {
        r["word"]: r["n"]
        for r in words.select("word", F.size(sym).alias("n")).collect()
    }
    assert new == old and len(new) > 20


def test_bpe_python_encode_overlap_semantics():
    """'aaa' + (a,a) must merge left-to-right non-overlapping into
    [aa, a] — the fold-semantics contract the Python encode keeps."""
    from citeconnect_datapipeline_spark.operators.tokenizer import (
        encode_word_tokens,
    )

    assert encode_word_tokens("aaa", [("a", "a")]) == 2
    assert encode_word_tokens("aaaa", [("a", "a")]) == 2
    # merged token never re-merges as its own left constituent
    assert encode_word_tokens("aaa", [("a", "a"), ("aa", "a")]) == 1
    assert encode_word_tokens("x", []) == 1


def test_trigram_arrow_profile_matches_catalyst_explode(
    spark, tmp_path
):
    """char_ngram_lang_profile's (lang, g, c) trigram profile moved
    into a mapInArrow kernel (packed-codepoint np.unique). Plant a
    lake with multibyte/emoji text, whitespace runs, sub-3-char and
    NULL rows, then assert the registered query equals a
    reconstruction of the legacy explode+groupBy form row-for-row."""
    rows = [
        (1, "Hello  world", "en", "s", 12),
        (2, "héllo héllo wörld", "de", "s", 17),
        (3, "日本語のテキストです", "ja", "s", 10),
        (4, "🎉🎊🎉🎊 party 🎉", "emoji", "s", 12),
        (5, "ab", "short", "s", 2),  # < 3 chars after norm: dropped
        (6, None, "null-text", "s", 0),
        (7, "  padded   spaces  ", "en", "s", 19),
        (8, "mixed 日本 and ascii", None, "s", 17),  # NULL lang kept
    ]
    sf = str(tmp_path / "lake")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")

    from citeconnect_datapipeline_spark.operators.text import (
        char_ngram_lang_profile,
    )

    got = sorted(
        tuple(r) for r in char_ngram_lang_profile(spark, sf).collect()
    )

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    s = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    tri = (
        docs.select("lang", s.alias("s"))
        .filter(F.length("s") >= 3)
        .select(
            "lang",
            F.explode(
                F.expr(
                    "transform(sequence(1, length(s) - 2),"
                    " i -> substring(s, i, 3))"
                )
            ).alias("g"),
        )
    )
    prof = tri.groupBy("lang", "g").agg(F.count("*").alias("c"))
    norms = prof.groupBy("lang").agg(
        F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("nrm"),
        F.count("*").alias("n_grams"),
    )
    a = prof.select(
        F.col("lang").alias("lang_a"), "g", F.col("c").alias("ca")
    )
    b = prof.select(
        F.col("lang").alias("lang_b"), "g", F.col("c").alias("cb")
    )
    dots = (
        a.join(b, (a.g == b.g) & (a.lang_a < b.lang_b))
        .groupBy("lang_a", "lang_b")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("dot"))
    )
    na = norms.select(
        F.col("lang").alias("lang_a"),
        F.col("nrm").alias("na"),
        F.col("n_grams").alias("n_grams_a"),
    )
    nb = norms.select(
        F.col("lang").alias("lang_b"),
        F.col("nrm").alias("nb"),
        F.col("n_grams").alias("n_grams_b"),
    )
    spine = na.join(nb, F.col("lang_a") < F.col("lang_b"))
    want = sorted(
        tuple(r)
        for r in spine.join(dots, ["lang_a", "lang_b"], "left")
        .select(
            "lang_a",
            "lang_b",
            F.round(
                F.coalesce(F.col("dot"), F.lit(0.0))
                / (F.col("na") * F.col("nb")),
                6,
            ).alias("cosine"),
            F.col("n_grams_a").cast("bigint").alias("n_grams_a"),
            F.col("n_grams_b").cast("bigint").alias("n_grams_b"),
        )
        .collect()
    )
    # 4 langs carry trigrams (short/empty rows drop, NULL lang drops
    # out of the a<b pairing in BOTH forms) -> C(4,2)=6 pairs, with
    # at least the de/en pair sharing grams
    assert got == want and len(got) == 6
    assert any(r[2] > 0 for r in got)


def test_literal_grid_values_and_types(spark):
    """literal_grid (pure-JVM VALUES local relation) must reproduce
    the createDataFrame grids it replaced: same column name, dtype,
    and values — with a LocalTableScan, never a Python RDD scan."""
    from citeconnect_datapipeline_spark.sources.tables import (
        literal_grid,
    )

    g = literal_grid(spark, "k", (1, 2, 5), "long")
    assert g.schema["k"].dataType.simpleString() == "bigint"
    assert [r["k"] for r in g.orderBy("k").collect()] == [1, 2, 5]
    d = literal_grid(spark, "lift", (0.01, 0.1), "double")
    assert d.schema["lift"].dataType.simpleString() == "double"
    assert [r["lift"] for r in d.orderBy("lift").collect()] == [
        0.01,
        0.1,
    ]
    plan = g._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan and "ExistingRDD" not in plan
