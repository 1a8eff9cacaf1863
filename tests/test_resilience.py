"""Skew salting, quarantine routing, vector-store sink — the scale
and resilience equipment around the core operators."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from citeconnect_datapipeline_spark.operators.extraction import (
    extract_with_quarantine,
)
from citeconnect_datapipeline_spark.operators.skew import (
    replicated_broadcast_join,
    salted_count_by_key,
    salted_sum_by_key,
)
from citeconnect_datapipeline_spark.sinks.vector_store import write_vectors
from citeconnect_datapipeline_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def skewed_df(spark):
    # 90% of rows share one hot key
    return spark.range(1000).select(
        F.when(F.col("id") < 900, "hot").otherwise(
            F.concat(F.lit("k"), F.col("id"))
        ).alias("k"),
        (F.col("id") % 7).cast("double").alias("v"),
    )


def test_salted_count_matches_plain(spark):
    df = skewed_df(spark)
    salted = {(r.k, r.n) for r in salted_count_by_key(df, "k", 8).collect()}
    plain = {
        (r.k, r.n)
        for r in df.groupBy("k").agg(F.count("*").alias("n")).collect()
    }
    assert salted == plain


def test_salted_sum_matches_plain(spark):
    df = skewed_df(spark)
    salted = {
        (r.k, r.total)
        for r in salted_sum_by_key(df, "k", "v", 8).collect()
    }
    plain = {
        (r.k, r.total)
        for r in df.groupBy("k").agg(F.sum("v").alias("total")).collect()
    }
    assert salted == plain


def test_replicated_broadcast_join_matches_plain(spark):
    facts = skewed_df(spark)
    dim = spark.createDataFrame(
        [("hot", "HOT"), ("k950", "K950")], "k string, label string"
    )
    salted = replicated_broadcast_join(facts, dim, "k", 8)
    plain = facts.join(dim, "k", "left")
    assert salted.count() == plain.count() == 1000
    got = (
        salted.groupBy("label").count().orderBy("label").collect()
    )
    want = plain.groupBy("label").count().orderBy("label").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_quarantine_split(spark):
    docs = load_table(spark, SF_DIR, "documents")
    good, quarantined = extract_with_quarantine(docs)
    n_docs = docs.count()
    bad_ids = {r.doc_id for r in quarantined.collect()}
    expected_bad = {
        r.doc_id
        for r in docs.select("doc_id").collect()
        if r.doc_id % 97 == 13
    }
    assert bad_ids == expected_bad
    assert good.count() == n_docs - len(bad_ids)
    err = quarantined.first()
    assert "simulated fetch failure" in err.error


def test_vector_store_sink_batches(spark, tmp_path):
    outdir = tmp_path / "vs"
    outdir.mkdir()

    def client_factory():
        import uuid

        fname = str(outdir / f"client-{uuid.uuid4().hex}.jsonl")

        def add_batch(batch):
            with open(fname, "a") as f:
                f.write(json.dumps([r[0] for r in batch]) + "\n")

        return add_batch

    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    ).repartition(3)
    write_vectors(emb, client_factory, batch_size=16)
    ids = []
    for f in outdir.iterdir():
        for line in open(f):
            batch = json.loads(line)
            assert len(batch) <= 16
            ids.extend(batch)
    assert sorted(ids) == [r.vec_id for r in emb.orderBy("vec_id").collect()]


def test_ann_lsh_recall_vs_bruteforce(spark):
    """The LSH ANN path must agree with brute force on most of the
    true top-10 (recall >= 0.5 with 8 bits + Hamming-1 probes on the
    near-orthogonal synthetic vectors; production tunes bits/probes
    per recall target). Guards against the bucketing silently
    degenerating (e.g. everything in one bucket, or probe set empty).
    """
    from citeconnect_datapipeline_spark.operators.similarity import (
        ann_lsh_topk,
        cosine_topk,
    )

    sf = "/root/testdata/sf0.01"
    truth = {r.vec_id for r in cosine_topk(spark, sf).collect()}
    approx = {r.vec_id for r in ann_lsh_topk(spark, sf).collect()}
    assert len(approx) == 10
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.5, f"ANN recall degenerated: {recall}"


def test_neardup_component_semantics(spark):
    """Connected-components invariants: the component id is the min
    member of the cluster, exactly one canonical row per component,
    and every clustered doc pairs with >=1 other (no singleton enters
    the edge list)."""
    from collections import Counter

    from citeconnect_datapipeline_spark.operators.dedup import (
        neardup_components,
    )

    rows = neardup_components(spark, "/root/testdata/sf0.01").collect()
    assert rows, "no near-dup clusters found — planted dups missing?"
    members: dict[int, list] = {}
    for r in rows:
        members.setdefault(r.component, []).append(r)
    for comp, rs in members.items():
        assert len(rs) >= 2, f"singleton component {comp}"
        assert comp == min(r.doc_id for r in rs)
        assert sum(r.is_canonical for r in rs) == 1
        canon = next(r for r in rs if r.is_canonical)
        assert canon.doc_id == comp
    # doc ids unique across clusters
    ids = Counter(r.doc_id for r in rows)
    assert all(c == 1 for c in ids.values())


def test_ann_ivf_recall_and_pruning(spark):
    """IVF ANN: recall vs brute force must hold, and the probe stage
    must actually prune — the probed row count has to be well below
    the table size (nprobe/nlists of it, up to cluster imbalance),
    otherwise the 'scan only a few lists' contract silently became a
    full scan."""
    from citeconnect_datapipeline_spark.operators.similarity import (
        IVF_LISTS,
        IVF_NPROBE,
        _ivf_assignments,
        _train_ivf_centroids,
        ann_ivf_topk,
        cosine_topk,
    )
    from citeconnect_datapipeline_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.01"
    truth = {r.vec_id for r in cosine_topk(spark, sf).collect()}
    approx = {r.vec_id for r in ann_ivf_topk(spark, sf).collect()}
    assert len(approx) == 10
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.5, f"IVF recall degenerated: {recall}"

    emb = load_table(spark, sf, "embeddings")
    total = emb.count()
    cents = _train_ivf_centroids(emb, IVF_LISTS)
    sizes = (
        _ivf_assignments(emb, cents)
        .groupBy("list_id")
        .count()
        .collect()
    )
    assert len(sizes) > IVF_NPROBE, "k-means collapsed to too few lists"
    largest_probe = sum(
        sorted((r["count"] for r in sizes), reverse=True)[:IVF_NPROBE]
    )
    assert largest_probe < 0.8 * total, (
        f"probing {IVF_NPROBE}/{IVF_LISTS} lists scans {largest_probe}"
        f"/{total} rows — no pruning"
    )


def test_ivf_training_unbiased_on_skewed_layout(spark):
    """Centroid training must sample uniformly over the corpus even
    when vec_id order correlates with content — the layout every real
    lake has (ids assigned by ingest time, one domain at a time). The
    adversarial layout here puts a single tight cluster in the first
    600 ids (more than IVF_TRAIN_SAMPLE) and five other clusters
    after; lowest-id sampling would train every centroid on cluster 0
    and recall for a late-id query would collapse. Hash-ordered
    sampling must keep centroids spread across all clusters and give
    high recall for a query in the LAST cluster."""
    import numpy as np

    from citeconnect_datapipeline_spark.operators.similarity import (
        IVF_LISTS,
        IVF_NPROBE,
        IVF_TRAIN_SAMPLE,
        _ivf_assignments,
        _train_ivf_centroids,
    )

    rng = np.random.default_rng(7)
    n_clusters, dim = 6, 16
    bases = rng.normal(size=(n_clusters, dim))
    bases /= np.linalg.norm(bases, axis=1, keepdims=True)
    rows, cluster_of = [], {}
    vid = 0
    # ids 0..599: all cluster 0 (covers the whole train sample);
    # ids 600+: clusters 1..5, 280 vectors each.
    for cluster, count in [(0, 600)] + [(c, 280) for c in range(1, 6)]:
        for _ in range(count):
            v = bases[cluster] + 0.05 * rng.normal(size=dim)
            v /= np.linalg.norm(v)
            rows.append((vid, [float(x) for x in v]))
            cluster_of[vid] = cluster
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    cents = _train_ivf_centroids(emb, IVF_LISTS)
    assert len(cents) == IVF_LISTS
    # The training sample is smaller than the cluster-0 prefix, so a
    # biased (lowest-id) sampler could not have seen clusters 1-5 at
    # all. Unbiased centroids must separate them: every cluster base
    # should have a centroid very close to it.
    worst = min(float((cents @ bases[c]).max()) for c in range(n_clusters))
    assert worst > 0.9, (
        f"a cluster has no nearby centroid (best dot {worst:.3f}) — "
        "training sample is biased"
    )

    # Recall for a query in the LAST cluster (highest ids): probe the
    # nearest lists and check the exact top-10 within probed rows
    # covers >= 0.8 of the true brute-force top-10.
    qid = vid - 1
    qv = np.asarray(rows[qid][1], dtype="float64")
    qv /= np.linalg.norm(qv)
    all_mat = np.stack([np.asarray(r[1], dtype="float64") for r in rows])
    all_mat /= np.linalg.norm(all_mat, axis=1, keepdims=True)
    sims = all_mat @ qv
    sims[qid] = -2.0
    truth = set(np.argsort(-sims)[:10].tolist())

    probe_lists = set(np.argsort(-(cents @ qv))[:IVF_NPROBE].tolist())
    assigned = {
        r.vec_id: r.list_id
        for r in _ivf_assignments(emb, cents).collect()
    }
    probed = [
        v for v in range(vid)
        if assigned[v] in probe_lists and v != qid
    ]
    approx = set(
        sorted(probed, key=lambda v: -sims[v])[:10]
    )
    recall = len(truth & approx) / 10
    assert recall >= 0.8, f"skewed-layout IVF recall {recall}"
    assert len(rows) > IVF_TRAIN_SAMPLE


def test_ann_pq_recall_and_code_width(spark):
    """Product-quantization ANN: the ADC-pooled exact re-rank must
    recover most of the true top-10 (recall >= 0.5; the 150-candidate
    refine pool typically makes it ~1.0), every emitted code must fit
    the advertised 32 bits (M=8 subspaces x 4-bit codes — the 64x
    compression claim), and reruns must be deterministic."""
    from citeconnect_datapipeline_spark.operators.similarity import (
        ann_pq_topk,
        cosine_topk,
    )

    sf = "/root/testdata/sf0.01"
    truth = {r.vec_id for r in cosine_topk(spark, sf).collect()}
    rows = ann_pq_topk(spark, sf).collect()
    approx = {r.vec_id for r in rows}
    assert len(approx) == 10
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.5, f"PQ recall degenerated: {recall}"
    assert all(0 <= r.packed_code < (1 << 32) for r in rows)
    rerun = {r.vec_id for r in ann_pq_topk(spark, sf).collect()}
    assert rerun == approx


def test_ann_ivfpq_recall_pruning_and_code_width(spark):
    """The composed IVF+PQ+refine path: recall@10 vs brute force must
    hold, the PQ stage must only see the probed sliver (the IVF
    contract), and every packed code must fit the advertised 32 bits
    (M=8 subspaces x 4 bits)."""
    from citeconnect_datapipeline_spark.operators.similarity import (
        IVF_LISTS,
        IVF_NPROBE,
        ann_ivfpq_topk,
        cosine_topk,
    )

    sf = "/root/testdata/sf0.01"
    truth = {r.vec_id for r in cosine_topk(spark, sf).collect()}
    rows = ann_ivfpq_topk(spark, sf).collect()
    approx = {r.vec_id for r in rows}
    assert len(approx) == 10
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.5, f"IVFPQ recall degenerated: {recall}"
    for r in rows:
        assert 0 <= r.packed_code < (1 << 32), "code exceeds 32 bits"
    # the ADC stage must run on the probed lists only, not the corpus:
    # nprobe/nlists of a balanced index, bounded well under the table
    from citeconnect_datapipeline_spark.operators.similarity import (
        _ivf_assignments,
        _train_ivf_centroids,
    )
    from citeconnect_datapipeline_spark.sources.tables import load_table

    emb = load_table(spark, sf, "embeddings")
    cents = _train_ivf_centroids(emb, IVF_LISTS)
    per_list = (
        _ivf_assignments(emb, cents).groupBy("list_id").count().collect()
    )
    worst_probe = sum(
        sorted((r["count"] for r in per_list), reverse=True)[:IVF_NPROBE]
    )
    assert worst_probe < 0.8 * emb.count()
