"""Invariants for the iterative clustering ops (rows-only in the
driver contract, so correctness evidence lives here): k-means
determinism + inertia monotonicity + exact numpy parity, and
semantic_dedup greedy-kept-set parity against a brute-force rerun."""

from __future__ import annotations

import numpy as np
import pytest

from citeconnect_datapipeline_spark.operators.clustering import (
    K_CLUSTERS,
    SEMDEDUP_TAU,
    _kmeans_fit,
    kmeans_clusters,
    semantic_dedup,
)


@pytest.fixture(scope="module")
def vecs(spark, sf_dir):
    """vec_id-sorted embedding matrix collected once (test scale)."""
    emb, _ = _kmeans_fit(spark, sf_dir, iters=0)
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    M = np.stack([np.asarray(r["embedding"], dtype="float64") for r in rows])
    return ids, M


def _np_assign(M, C):
    d2 = (
        (M * M).sum(axis=1)[:, None]
        - 2.0 * (M @ C.T)
        + (C * C).sum(axis=1)[None, :]
    )
    return d2.argmin(axis=1), np.maximum(d2.min(axis=1), 0.0)


def test_kmeans_sizes_and_inertia_match_numpy(spark, sf_dir, vecs):
    ids, M = vecs
    out = kmeans_clusters(spark, sf_dir).collect()
    assert sum(r["n_vecs"] for r in out) == len(ids)
    # independent numpy rerun of the same fit
    _, C = _kmeans_fit(spark, sf_dir)
    a, d2 = _np_assign(M, C)
    for r in out:
        sel = a == r["cluster_id"]
        assert int(sel.sum()) == r["n_vecs"]
        assert abs(float(d2[sel].sum()) - r["inertia"]) < 1e-2

def test_kmeans_deterministic_across_reruns(spark, sf_dir):
    a = [tuple(r) for r in kmeans_clusters(spark, sf_dir).collect()]
    b = [tuple(r) for r in kmeans_clusters(spark, sf_dir).collect()]
    assert a == b


def test_kmeans_inertia_nonincreasing_in_iterations(spark, sf_dir, vecs):
    ids, M = vecs
    totals = []
    for iters in (0, 1, 5):
        _, C = _kmeans_fit(spark, sf_dir, iters=iters)
        _, d2 = _np_assign(M, C)
        totals.append(float(d2.sum()))
    assert totals[1] <= totals[0] + 1e-9
    assert totals[2] <= totals[1] + 1e-9


def test_semantic_dedup_matches_bruteforce_greedy(spark, sf_dir, vecs):
    ids, M = vecs
    out = {r["cluster_id"]: r for r in semantic_dedup(spark, sf_dir).collect()}
    _, C = _kmeans_fit(spark, sf_dir)
    a, _ = _np_assign(M, C)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    total_checked = 0
    for c in range(K_CLUSTERS):
        sel = np.where(a == c)[0]
        if len(sel) == 0:
            assert c not in out
            continue
        # ids are already ascending (vecs fixture sorts), so sel is in
        # ascending vec_id order
        kept: list[int] = []
        dropped = 0
        for i in sel:
            if kept and float((Mn[kept] @ Mn[i]).max()) >= SEMDEDUP_TAU:
                dropped += 1
                continue
            kept.append(i)
        r = out[c]
        assert r["n_vecs"] == len(sel)
        assert r["n_kept"] == len(kept)
        assert r["n_dropped"] == dropped
        total_checked += len(sel)
    assert total_checked == len(ids)


def test_pca_whiten_matches_numpy_and_decorrelates(spark, sf_dir, vecs):
    """ZCA whitening: Spark output must equal the numpy computation on
    the same matrix (per-component to 6 dp), and the whitened sample
    covariance must be ~identity (the definition of whitening)."""
    from citeconnect_datapipeline_spark.operators.clustering import (
        PCA_EPS,
        embedding_pca_whiten,
    )

    ids, M = vecs
    n = len(M)
    mu = M.mean(axis=0)
    cov = (M.T @ M) / n - np.outer(mu, mu)
    lam, U = np.linalg.eigh(cov)
    W = (U * (1.0 / np.sqrt(np.maximum(lam, 0.0) + PCA_EPS))) @ U.T
    want = np.round((M - mu) @ W, 6)

    rows = embedding_pca_whiten(spark, sf_dir).collect()
    got = np.stack(
        [np.asarray(r["whitened"]) for r in sorted(rows, key=lambda r: r["vec_id"])]
    )
    assert got.shape == want.shape
    assert np.allclose(got, want, atol=2e-6)

    wc = np.cov(got, rowvar=False, bias=True)
    off = wc - np.diag(np.diag(wc))
    assert np.abs(np.diag(wc) - 1.0).max() < 0.05
    assert np.abs(off).max() < 0.05


def test_materialized_intermediates_valid_across_sessions(spark, sf_dir):
    """The bench runs 16 newSession clones over one SparkContext; the
    shared materialized intermediates (CC labels, k-means centroids,
    BPE merges) must produce identical results when consumed from a
    DIFFERENT session than the one that built them."""
    from citeconnect_datapipeline_spark.operators.dedup import (
        _neardup_labels,
    )

    first = _neardup_labels(spark, sf_dir)
    counts1 = sorted(
        (r["v"], r["label"]) for r in first.collect()
    )
    clone = spark.newSession()
    second = _neardup_labels(clone, sf_dir)
    assert second is first  # same context id -> cache hit
    counts2 = sorted((r["v"], r["label"]) for r in second.collect())
    assert counts1 == counts2
