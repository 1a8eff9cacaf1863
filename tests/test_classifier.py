"""Invariants for the in-engine LR quality classifier (rows-only in
the driver contract, so correctness evidence lives here): exact numpy
parity of the whole AdaGrad training loop, separation on a synthetic
separable corpus, overall loss decrease, and output-contract checks.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from citeconnect_datapipeline_spark.operators.classifier import (
    L2_LAMBDA,
    LEARNING_RATE,
    N_BUCKETS,
    _bucket_features,
    logreg_fit,
    quality_classifier,
    score_with_weights,
)
from citeconnect_datapipeline_spark.sources.tables import load_table


def _labels(docs):
    return docs.select(
        "doc_id",
        F.when(F.col("source") == "src0", 1.0).otherwise(0.0).alias("y"),
    )


@pytest.fixture(scope="module")
def fit_inputs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    feats = _bucket_features(docs).persist()
    feats.count()
    labels = _labels(docs)
    yield feats, labels
    feats.unpersist()


def _np_fit(feats_pdf, labels_pdf, iters, lr=LEARNING_RATE, l2=L2_LAMBDA):
    """Reference implementation of logreg_fit: dense numpy, identical
    weighting, AdaGrad steps, bias unregularized."""
    doc_ids = labels_pdf["doc_id"].to_numpy()
    idx = {d: i for i, d in enumerate(doc_ids)}
    y = labels_pdf["y"].to_numpy().astype("float64")
    X = np.zeros((len(doc_ids), N_BUCKETS + 1))
    X[:, N_BUCKETS] = 1.0  # bias feature
    for d, b, x in feats_pdf[["doc_id", "b", "x"]].itertuples(index=False):
        X[idx[d], b] = x
    pos = y.sum()
    tot = len(y)
    pw = (tot - pos) / pos if 0.0 < pos < tot else 1.0
    sw = np.where(y == 1.0, pw, 1.0)
    denom = sw.sum()
    w = np.zeros(N_BUCKETS + 1)
    g2 = np.zeros(N_BUCKETS + 1)
    losses = []
    for _ in range(iters):
        m = X @ w
        sig = 1.0 / (1.0 + np.exp(-m))
        ll = np.log1p(np.exp(-np.abs(m))) + np.maximum((1.0 - 2.0 * y) * m, 0.0)
        losses.append(float((sw * ll).sum()) / denom)
        r = sw * (sig - y)
        g = (X * r[:, None]).sum(axis=0) / denom
        reg = l2 * w
        reg[N_BUCKETS] = 0.0
        g_tot = g + reg
        g2 += g_tot * g_tot
        w = w - lr * g_tot / (np.sqrt(g2) + 1e-12)
    return w, losses


def test_numpy_parity_full_loop(spark, sf_dir, fit_inputs):
    """The Spark loop and a dense numpy rerun agree on weights and
    loss history to fp-association tolerance."""
    feats, labels = fit_inputs
    w_spark, losses_spark = logreg_fit(feats, labels, iters=4)
    w_np, losses_np = _np_fit(feats.toPandas(), labels.toPandas(), iters=4)
    assert np.allclose(np.array(w_spark), w_np, rtol=1e-9, atol=1e-12)
    assert np.allclose(np.array(losses_spark), np.array(losses_np), rtol=1e-9)


def test_loss_decreases_overall(spark, sf_dir, fit_inputs):
    feats, labels = fit_inputs
    _, losses = logreg_fit(feats, labels, iters=8)
    assert len(losses) == 8
    assert losses[0] == pytest.approx(math.log(2.0), rel=1e-3)
    assert losses[-1] < losses[0]


def test_separable_synthetic_recovers_labels(spark):
    """On a linearly separable corpus (disjoint vocabularies per
    class) the classifier must reach >=95% balanced accuracy — the
    evidence that the trainer learns, independent of how separable
    the lake's trusted slice happens to be."""
    rows = []
    for i in range(60):
        rows.append((i, "alpha beta gamma delta epsilon zeta", "src0"))
    for i in range(60, 240):
        rows.append((i, "omega psi chi phi upsilon tau", "srcX"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    feats = _bucket_features(docs)
    labels = _labels(docs)
    w, losses = logreg_fit(feats, labels, iters=10)
    scored = score_with_weights(feats, w).join(labels, "doc_id").toPandas()
    pred = scored["quality_prob"] >= 0.5
    acc_pos = (pred & (scored["y"] == 1.0)).sum() / (scored["y"] == 1.0).sum()
    acc_neg = (~pred & (scored["y"] == 0.0)).sum() / (scored["y"] == 0.0).sum()
    assert (acc_pos + acc_neg) / 2.0 >= 0.95
    assert losses[-1] < 0.5  # separable data drives loss well below ln 2


def test_query_output_contract(spark, sf_dir):
    pdf = quality_classifier(spark, sf_dir).toPandas()
    docs = load_table(spark, sf_dir, "documents")
    n_with_tokens = docs.filter(
        F.size(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                lambda x: x != F.lit(""),
            )
        )
        > 0
    ).count()
    assert len(pdf) == n_with_tokens
    assert pdf["quality_prob"].between(0.0, 1.0).all()
    assert (pdf["keep"] == (pdf["quality_prob"] >= 0.5)).all()
    assert set(pdf["is_trusted_source"].unique()) <= {0, 1}
