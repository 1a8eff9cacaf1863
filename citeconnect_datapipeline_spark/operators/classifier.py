"""In-engine quality-classifier training (logistic regression).

The classifier-based quality filter is the step every published LM
data pipeline runs after rule filters: GPT-3 trained an LR on
"WebText vs raw Common Crawl" features and kept high-scoring pages
(Brown et al. 2020, App. A), LLaMA/RedPajama and CCNet do the same
with fastText-style linear models over bag-of-words features. The
reference has no learned filter at all (its quality score is rule
arithmetic, databias/bias_detection_engine.py:1-120) — this module is
that learned upgrade, trained entirely IN-PLANE with the same
driver-bounded loop discipline as ``clustering._kmeans_fit``:

- Features: per-document L1-normalized counts over 256 md5-prefix
  word buckets (the same hashed bag-of-words DSIR uses) + a bias
  term. Long (doc_id, bucket, x) format, computed ONCE and cached —
  at 100 TB this is the only corpus-wide pass, one shuffle keyed per
  document.
- Labels: the trusted slice (``source = 'src0'``, the corpus's
  Wikipedia stand-in, as in lm_perplexity_buckets / DSIR) is the
  positive class; everything else negative. The positive class is
  re-weighted by the class ratio so the 1:19 imbalance cannot push
  the classifier to the constant-negative solution.
- Training: full-batch gradient descent with AdaGrad per-coordinate
  steps (plain GD on L1-normalized bag-of-words either crawls or
  oscillates without a hand-tuned global step; the accumulated-
  curvature denominator is scale-free and still fully
  deterministic). The current weight vector is embedded in the plan
  as a 257-double literal array (a few KB — no broadcast variable,
  no driver-side feature materialization); each round computes the
  per-doc margin IN-ROW as an array fold over the cached sparse
  feature array, then explodes it once into a 257-key gradient
  aggregate — ``collect`` moves 257 doubles per round, NEVER
  vectors or rows, the exact contract the k-means update uses
  (k*d partials). No join and no doc-keyed exchange per round.
- Scale: iteration cost is one scan of the one-row-per-doc cache;
  model state is 257 doubles regardless of corpus size. The
  documented production swap is mini-batch rounds over a
  hash-sampled sliver (``pmod(xxhash64(doc_id), s) = 0``) when
  full-batch scans per round are too dear.

Iterative / loop-carried => non-SQL-expressible: rows-only driver
check + dedicated tests (separable-synthetic accuracy, numpy
gradient parity, loss monotonicity, determinism) in
tests/test_classifier.py.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import spark_round as _round6
from ..plans.registry import query
from ..sources.tables import literal_frame, load_table

N_BUCKETS = 256  # md5(word) first 2 hex chars, as in DSIR
N_ITERS = 10
LEARNING_RATE = 0.2
L2_LAMBDA = 1e-4
TRUSTED_SOURCE = "src0"


def _bucket_features(docs: DataFrame) -> DataFrame:
    """(doc_id, b, x): L1-normalized hashed bag-of-words features.

    Zero-token documents produce no rows and are excluded from
    training/scoring, consistent with every text operator's
    nonempty gate."""
    from ..sources.tables import spread_small_source

    docs = spread_small_source(docs)
    w = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
        lambda x: x != F.lit(""),
    )
    counts = (
        docs.select("doc_id", F.explode(w).alias("word"))
        .select(
            "doc_id",
            F.conv(F.substring(F.md5("word"), 1, 2), 16, 10)
            .cast("int")
            .alias("b"),
        )
        .groupBy("doc_id", "b")
        .agg(F.count("*").alias("c"))
    )
    n = F.sum("c").over(Window.partitionBy("doc_id"))
    return counts.select(
        "doc_id", "b", (F.col("c").cast("double") / n).alias("x")
    )


def _margin_expr(weights: list[float]):
    """sum(x * w[b]) via a literal weight array (bias included as
    slot N_BUCKETS, paired with the synthetic x=1 bias feature row) —
    the model rides the plan, so scoring is pure codegen with no join
    against a weight table."""
    lit_w = F.array(*[F.lit(float(v)) for v in weights])
    return F.sum(F.col("x") * F.element_at(lit_w, F.col("b") + 1))


def logreg_fit(
    feats: DataFrame,
    labels: DataFrame,
    iters: int = N_ITERS,
    lr: float = LEARNING_RATE,
    l2: float = L2_LAMBDA,
    keep_train: bool = False,
):
    """Full-batch weighted logistic regression.

    ``feats``: (doc_id, b, x) long features; ``labels``: (doc_id, y)
    with y in {0.0, 1.0}. Returns (weights[257] with bias last,
    per-iteration mean weighted log-loss) — the loss history is what
    the monotonicity test pins. With ``keep_train=True`` the cached
    per-doc training table (doc_id, y, fx) is NOT unpersisted and is
    returned as a third element, so a caller can SCORE off the same
    cache instead of re-deriving features with a second corpus scan
    (quality_classifier does, via its materialized-intermediate
    entry — the caller owns the cache's lifetime).
    """
    pos, tot = labels.agg(
        F.sum("y").alias("p"), F.count("*").alias("t")
    ).first()
    pos = float(pos or 0.0)
    pw = (tot - pos) / pos if 0.0 < pos < tot else 1.0
    # ONE cached row per document: (doc_id, y, fx) where fx is the
    # sparse feature array [(b, x)...] with a synthetic bias element
    # (b = N_BUCKETS, x = 1) appended — zero-token docs (empty fx
    # after the left join) still train the bias. Everything
    # per-iteration computes IN-ROW off this cache: the margin is an
    # array fold against the literal weight vector, so each round is
    # a single scan + explode + 257-key aggregate + 257-row collect.
    # No join, no doc-keyed exchange, no sort — the earlier
    # long-format variant paid a sort-merge join per round and ran
    # ~4x slower at sf0.1.
    bias_elem = F.array(
        F.struct(
            F.lit(N_BUCKETS).alias("b"), F.lit(1.0).alias("x")
        )
    )
    per_doc = feats.groupBy("doc_id").agg(
        F.collect_list(
            F.struct(F.col("b").alias("b"), F.col("x").alias("x"))
        ).alias("fx0")
    )
    train = (
        labels.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "y",
            F.concat(
                F.coalesce(
                    "fx0", F.array().cast("array<struct<b:int,x:double>>")
                ),
                bias_elem,
            ).alias("fx"),
        )
        .persist()
    )
    try:
        weights, losses = _adagrad_rounds(
            train, pos, tot, pw, iters, lr, l2
        )
    finally:
        if not keep_train:
            train.unpersist()
    if keep_train:
        return weights, losses, train
    return weights, losses


def _adagrad_rounds(
    train: DataFrame,
    pos: float,
    tot: int,
    pw: float,
    iters: int,
    lr: float,
    l2: float,
) -> tuple[list[float], list[float]]:
    """The AdaGrad loop over a cached (y, fx) training table.

    r13 (guide §4.2): one mapInArrow pass per round, emitting
    O(model) per-task partials — margin, sigmoid and per-element
    gradient products run vectorized in numpy inside the task. The
    r12 round was an INTERPRETED Catalyst fold over fx (no codegen
    for lambda bodies) plus an explode into a 257-key aggregate:
    ~4x the per-round CPU and 2 extra AQE stages. Values differ only
    in float summation order (covered by the numpy-parity test at
    rtol 1e-9)."""
    import numpy as np
    import pyarrow as pa

    weights = [0.0] * (N_BUCKETS + 1)
    g2 = [0.0] * (N_BUCKETS + 1)  # AdaGrad accumulators
    losses: list[float] = []
    denom = pos * pw + (tot - pos)  # total sample weight
    feat_cols = train.select("y", "fx")

    def _grad_pass(w_list: list[float]) -> tuple[list[float], float]:
        wv = np.asarray(w_list, dtype=np.float64)

        def fn(batches):
            g = np.zeros(N_BUCKETS + 1)
            ls = 0.0
            for b in batches:
                ys = b.column("y").to_numpy(zero_copy_only=False)
                if len(ys) == 0:
                    continue
                fx = b.column("fx")
                off = np.asarray(fx.offsets, dtype=np.int64)
                starts = off[:-1] - off[0]
                lens = off[1:] - off[:-1]
                sv = fx.flatten()
                fb = np.asarray(sv.field("b"), dtype=np.int64)
                xx = np.asarray(sv.field("x"), dtype=np.float64)
                # every doc carries the synthetic bias element, so no
                # segment is empty and reduceat is well-defined
                m = np.add.reduceat(xx * wv[fb], starts)
                sw = np.where(ys == 1.0, pw, 1.0)
                sig = 1.0 / (1.0 + np.exp(-m))
                r = sw * (sig - ys)
                # overflow-safe weighted log-loss, as before
                ls += float(
                    np.sum(
                        sw
                        * (
                            np.log1p(np.exp(-np.abs(m)))
                            + np.maximum((1.0 - 2.0 * ys) * m, 0.0)
                        )
                    )
                )
                g += np.bincount(
                    fb,
                    weights=np.repeat(r, lens) * xx,
                    minlength=N_BUCKETS + 1,
                )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([g.tolist()], type=pa.list_(pa.float64())),
                    pa.array([ls], type=pa.float64()),
                ],
                names=["g", "l"],
            )

        rows = feat_cols.mapInArrow(
            fn, "g array<double>, l double"
        ).collect()
        gsum = np.zeros(N_BUCKETS + 1)
        lsum = 0.0
        for row in rows:
            gsum += np.asarray(row["g"])
            lsum += float(row["l"])
        return gsum.tolist(), lsum

    for _ in range(iters):
        grad, lsum = _grad_pass(weights)
        losses.append(lsum / denom)
        # AdaGrad per-coordinate step: plain GD on L1-normalized
        # bag-of-words needs a hand-tuned global step (diverges
        # by lr=20 on this corpus, crawls at lr=1); the
        # accumulated-curvature denominator makes the step
        # scale-free per bucket and is still fully deterministic.
        new_w = []
        for i, (w, g) in enumerate(zip(weights, grad)):
            # bias (last slot) is conventionally unregularized
            g_tot = g / denom + (l2 * w if i < N_BUCKETS else 0.0)
            g2[i] += g_tot * g_tot
            new_w.append(w - lr * g_tot / (math.sqrt(g2[i]) + 1e-12))
        weights = new_w
    return weights, losses


def score_with_weights(feats: DataFrame, weights: list[float]) -> DataFrame:
    """(doc_id, quality_prob): sigmoid of the literal-array margin —
    a single aggregate, no Python, model folded into codegen."""
    m = _margin_expr(weights) + F.lit(weights[N_BUCKETS])
    return feats.groupBy("doc_id").agg(
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-m)), 6).alias(
            "quality_prob"
        )
    )


@query("quality_classifier")  # rows-only: loop-carried training
def quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the LR quality filter on trusted-vs-rest labels and
    score every document; ``keep`` marks documents the (class-
    balanced) classifier rates more trusted-like than not
    (prob >= 0.5) — the kept set is the classifier-filtered corpus
    downstream curation (dedup, mixing, packing) consumes."""
    from ..memo import shared_intermediate

    def build():
        # r13 (guide §4.2): the training table is built by ONE
        # mapInArrow kernel over (doc_id, y, words) — tokenize stays
        # JVM-side; md5-bucketing + L1-normalization happen per doc
        # inside the task — so the cold fit pays NO shuffle at all
        # for features (the r12 path was explode -> (doc, b) agg ->
        # per-doc window -> collect_list -> label join: 3 doc-keyed
        # exchanges, the bench's slowest cold artifact at 5.4 s).
        # Same table contract as logreg_fit's builder: one row per
        # document, bias element appended, zero-token docs bias-only.
        import hashlib

        import pyarrow as pa

        from ..sources.tables import spread_small_source

        docs = spread_small_source(load_table(spark, sf_dir, "documents"))
        words = F.filter(
            F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
            lambda x: x != F.lit(""),
        )
        src = docs.select(
            "doc_id",
            F.when(F.col("source") == TRUSTED_SOURCE, 1.0)
            .otherwise(0.0)
            .alias("y"),
            words.alias("ws"),
        )
        fx_type = pa.list_(
            pa.struct([("b", pa.int32()), ("x", pa.float64())])
        )

        def _train_kernel(batches):
            for b in batches:
                ids, ys, fxs = [], [], []
                for did, y, wlist in zip(
                    b.column(0).to_pylist(),
                    b.column(1).to_pylist(),
                    b.column(2).to_pylist(),
                ):
                    counts: dict[int, int] = {}
                    tw = len(wlist) if wlist else 0
                    if wlist:
                        for w in wlist:
                            i = int(
                                hashlib.md5(
                                    w.encode("utf-8")
                                ).hexdigest()[:2],
                                16,
                            )
                            counts[i] = counts.get(i, 0) + 1
                    fx = [
                        {"b": i, "x": counts[i] * 1.0 / tw}
                        for i in sorted(counts)
                    ] + [{"b": N_BUCKETS, "x": 1.0}]
                    ids.append(did)
                    ys.append(float(y))
                    fxs.append(fx)
                if ids:
                    yield pa.RecordBatch.from_arrays(
                        [
                            pa.array(ids),
                            pa.array(ys, type=pa.float64()),
                            pa.array(fxs, type=fx_type),
                        ],
                        names=["doc_id", "y", "fx"],
                    )

        train = src.mapInArrow(
            _train_kernel,
            "doc_id long, y double,"
            " fx array<struct<b:int,x:double>>",
        ).persist()
        pos, tot = train.agg(
            F.sum("y").alias("p"), F.count("*").alias("t")
        ).first()
        pos = float(pos or 0.0)
        pw = (tot - pos) / pos if 0.0 < pos < tot else 1.0
        weights, _ = _adagrad_rounds(
            train, pos, tot, pw, N_ITERS, LEARNING_RATE, L2_LAMBDA
        )
        return train, weights

    # ONE corpus scan per process: fit and scoring both read the
    # cached (doc_id, y, fx) table — scoring is the same in-row fold
    # the training rounds use, no feature re-derivation, no join.
    train, weights = shared_intermediate(
        spark, "quality_classifier_fit", (sf_dir,), build
    )
    lit_w = F.array(*[F.lit(float(v)) for v in weights])
    m = F.aggregate(
        "fx",
        F.lit(0.0),
        lambda acc, f: acc + f["x"] * F.element_at(lit_w, f["b"] + 1),
    )
    prob = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-m)), 6)
    return (
        # fx always holds the synthetic bias element; >1 means the
        # doc had at least one real token (the same nonempty gate the
        # feature-table scoring applied)
        train.filter(F.size("fx") > 1)
        .select(
            "doc_id",
            prob.alias("quality_prob"),
            F.col("y").cast("int").alias("is_trusted_source"),
            (prob >= 0.5).alias("keep"),
        )
        .orderBy("doc_id")
    )


@query("classifier_eval")  # rows-only: consumes the trained model
def classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion table for the LR quality filter against its own
    training labels (trusted-source vs rest) — keep-decision counts,
    share-of-label, and the headline precision/recall a curator
    checks before trusting the kept corpus (same audit contract as
    lang_confusion_matrix; a filter is only as good as its published
    error rates). Reads the SAME memoized fit quality_classifier
    uses — no extra training, one tiny aggregate over the scored
    table."""
    scored = quality_classifier(spark, sf_dir)
    per_label = Window.partitionBy("is_trusted_source")
    return (
        scored.groupBy("is_trusted_source", "keep")
        .agg(F.count("*").alias("n"))
        .select(
            "is_trusted_source",
            "keep",
            "n",
            F.round(
                F.col("n")
                / F.sum("n").over(per_label).cast("double"),
                6,
            ).alias("share_of_label"),
        )
        .orderBy("is_trusted_source", "keep")
    )


LRP_EPS = 1e-12  # AdaGrad step denominator guard (same as logreg_fit)
LRP_BIAS = "~bias"  # sorts after every hex bucket in both engines


def _lrp_oracle() -> str:
    """Unrolled-CTE oracle for logreg_adagrad_portable: 2 AdaGrad
    rounds of weighted full-batch logistic regression spelled in
    portable SQL. Every cross-engine float boundary is pinned by a
    6-dp ROUND: the class weight, each round's gradient, each
    round's weight, the per-doc margin, and the sigmoid — so fp
    association order in the big sums cannot flip a downstream
    comparison (the same contract kmeans_portable uses)."""
    return f"""
    WITH lab AS (
        SELECT doc_id,
               CASE WHEN source = '{TRUSTED_SOURCE}' THEN 1.0
                    ELSE 0.0 END AS y
        FROM documents
        WHERE len(list_filter(
            string_split_regex(lower(text), '[^a-z0-9]+'),
            x -> x <> '')) > 0
    ),
    cw AS (
        SELECT SUM(y) AS pos, COUNT(*) AS tot,
               ROUND((COUNT(*) - SUM(y)) / SUM(y), 6) AS pw
        FROM lab
    ),
    labw AS (
        SELECT l.doc_id, l.y,
               CASE WHEN l.y = 1.0 THEN c.pw ELSE 1.0 END AS wt
        FROM lab l CROSS JOIN cw c
    ),
    wordfeat AS (
        SELECT doc_id, substr(md5(word), 1, 2) AS b,
               COUNT(*) AS c
        FROM (
            SELECT doc_id, unnest(list_filter(
                string_split_regex(lower(text), '[^a-z0-9]+'),
                x -> x <> '')) AS word
            FROM documents
        )
        GROUP BY 1, 2
    ),
    feats AS (
        SELECT doc_id, b,
               c * 1.0 / SUM(c) OVER (PARTITION BY doc_id) AS x
        FROM wordfeat
        UNION ALL
        SELECT DISTINCT doc_id, '{LRP_BIAS}' AS b, 1.0 AS x
        FROM wordfeat
    ),
    dn AS (SELECT pos * pw + (tot - pos) AS denom FROM cw),
    g1 AS (
        SELECT f.b,
               ROUND(SUM(l.wt * (0.5 - l.y) * f.x)
                     / (SELECT denom FROM dn), 6) AS g1
        FROM feats f JOIN labw l USING (doc_id)
        GROUP BY f.b
    ),
    w1 AS (
        SELECT b, g1,
               ROUND(-{LEARNING_RATE} * g1
                     / (sqrt(g1 * g1) + {LRP_EPS}), 6) AS w1
        FROM g1
    ),
    m2 AS (
        SELECT f.doc_id, ROUND(SUM(f.x * w.w1), 6) AS m
        FROM feats f JOIN w1 w USING (b)
        GROUP BY f.doc_id
    ),
    p2 AS (
        SELECT l.doc_id, l.y, l.wt,
               ROUND(1.0 / (1.0 + exp(-m2.m)), 6) AS p
        FROM labw l JOIN m2 USING (doc_id)
    ),
    loss2 AS (
        SELECT ROUND(SUM(wt * -(y * ln(p) + (1 - y) * ln(1 - p)))
                     / (SELECT denom FROM dn), 6) AS loss_r2
        FROM p2
    ),
    g2p AS (
        SELECT f.b, SUM(p.wt * (p.p - p.y) * f.x) AS s
        FROM feats f JOIN p2 p USING (doc_id)
        GROUP BY f.b
    ),
    model AS (
        SELECT w.b, w.g1, w.w1,
               ROUND(g2p.s / (SELECT denom FROM dn)
                     + CASE WHEN w.b = '{LRP_BIAS}' THEN 0.0
                            ELSE {L2_LAMBDA} * w.w1 END, 6) AS g2
        FROM w1 w JOIN g2p USING (b)
    ),
    model2 AS (
        SELECT b, g1, w1, g2,
               ROUND(w1 - {LEARNING_RATE} * g2
                     / (sqrt(g1 * g1 + g2 * g2) + {LRP_EPS}), 6)
                   AS w2
        FROM model
    ),
    m3 AS (
        SELECT f.doc_id, ROUND(SUM(f.x * model2.w2), 6) AS m
        FROM feats f JOIN model2 USING (b)
        GROUP BY f.doc_id
    ),
    p3 AS (
        SELECT l.doc_id, l.y, l.wt,
               ROUND(1.0 / (1.0 + exp(-m3.m)), 6) AS p
        FROM labw l JOIN m3 USING (doc_id)
    ),
    loss3 AS (
        SELECT ROUND(SUM(wt * -(y * ln(p) + (1 - y) * ln(1 - p)))
                     / (SELECT denom FROM dn), 6) AS loss_final
        FROM p3
    )
    SELECT m.b AS bucket, m.g1, m.w1, m.g2, m.w2,
           l2.loss_r2, l3.loss_final
    FROM model2 m CROSS JOIN loss2 l2 CROSS JOIN loss3 l3
    ORDER BY abs(m.w2) DESC, m.b
    LIMIT 20
    """


def _lrp_doc_arrays(batch):
    """Decode one Arrow batch of the pinned per-doc training table
    (y double, bs array<int>, xs array<double>) into numpy: labels,
    flat bucket ids, flat x values, and per-doc segment starts."""
    import numpy as np

    ys = batch.column("y").to_numpy(zero_copy_only=False)
    bs = batch.column("bs")
    xs = batch.column("xs")
    off = np.asarray(bs.offsets, dtype=np.int64)
    starts = off[:-1] - off[0]
    flat_b = np.asarray(bs.flatten(), dtype=np.int64)
    flat_x = np.asarray(xs.flatten(), dtype=np.float64)
    return ys, flat_b, flat_x, starts, off[1:] - off[:-1]


@query("logreg_adagrad_portable", oracle=_lrp_oracle())
def logreg_adagrad_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-verified logistic-regression twin — the classifier
    family's first hash-MATCHED member: 2 unrolled AdaGrad rounds of
    the EXACT update rule `logreg_fit` runs for 10 (g/denom + l2*w,
    h += g^2, w -= lr*g/(sqrt(h)+eps), bias unregularized, positives
    re-weighted by the class ratio), replayed CTE-for-CTE by DuckDB
    so weights, gradients, and the before/after training loss all
    hash-match value-for-value.

    Differences from the production fit, chosen for portability and
    documented here: buckets are the md5 2-hex-char STRING keys
    (DSIR's portable bucketing); 2 rounds instead of 10; zero-token
    docs are excluded rather than trained bias-only; the loss is the
    direct -[y ln p + (1-y) ln(1-p)] form (margins here are bounded
    by lr, so the overflow-safe form is unnecessary). Every float
    that crosses an engine boundary is rounded at 6 dp before use
    (class weight, per-round gradient and weight, per-doc margin,
    sigmoid) — driver-side rounding uses `_round6`, the bit-faithful
    twin of F.round — so engines re-synchronize at every step
    exactly as the r12 in-plane form did.

    r13 (guide §4.2/§2.4): the corpus-grain work per round was 2-3
    doc-keyed JOINS + a 257-key aggregate (23 AQE jobs, 2.4 s
    isolated, 8.6 s in-suite — a top-5 entry). Now the feature pass
    builds ONE pinned per-doc table (y, bucket-ids, x-values) via a
    mapInArrow tokenize+hash kernel (no explode, no per-doc window),
    and each round is ONE mapInArrow pass over it emitting O(model)
    per-task partials (257 gradient sums + the loss term + bucket
    presence) — margins, sigmoids and per-element products run
    vectorized in numpy inside the task; nothing doc-grain is ever
    collected or joined. Driver state stays O(model x tasks).
    Reference anchor: GPT-3 App. A / CCNet linear quality filters."""
    import numpy as np
    import pyarrow as pa

    docs = load_table(spark, sf_dir, "documents")
    words = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
        lambda x: x != F.lit(""),
    )
    n_b = N_BUCKETS  # hex buckets; index N_BUCKETS = the bias slot

    def _build(batches):
        import hashlib

        for b in batches:
            ys_out, bs_out, xs_out = [], [], []
            ys = b.column("y").to_pylist()
            ws = b.column("ws").to_pylist()
            for y, wlist in zip(ys, ws):
                tw = len(wlist)
                if tw == 0:
                    continue  # zero-token docs excluded (oracle form)
                counts: dict[int, int] = {}
                for w in wlist:
                    i = int(
                        hashlib.md5(w.encode("utf-8")).hexdigest()[:2],
                        16,
                    )
                    counts[i] = counts.get(i, 0) + 1
                idx = sorted(counts)
                ys_out.append(float(y))
                bs_out.append(idx + [n_b])
                xs_out.append(
                    [counts[i] * 1.0 / tw for i in idx] + [1.0]
                )
            if not ys_out:
                continue
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ys_out, type=pa.float64()),
                    pa.array(bs_out, type=pa.list_(pa.int32())),
                    pa.array(xs_out, type=pa.list_(pa.float64())),
                ],
                names=["y", "bs", "xs"],
            )

    # ONE corpus pass: tokenize + md5-bucket + L1-normalize per doc,
    # pinned eagerly — every round below reads this narrow table.
    train = (
        docs.select(
            F.when(F.col("source") == TRUSTED_SOURCE, 1.0)
            .otherwise(0.0)
            .alias("y"),
            words.alias("ws"),
        )
        .mapInArrow(
            _build, "y double, bs array<int>, xs array<double>"
        )
        .localCheckpoint(eager=True)
    )
    cw = train.agg(
        F.sum("y").alias("pos"),
        F.count("*").alias("tot"),
        F.round((F.count("*") - F.sum("y")) / F.sum("y"), 6).alias("pw"),
    ).first()
    pos, tot, pw = float(cw["pos"]), int(cw["tot"]), float(cw["pw"])
    denom = pos * pw + (tot - pos)

    partial_schema = (
        "g array<double>, seen array<int>, lsum double"
    )

    def _pass(w_vec):
        """One fit pass: per-task partial gradient sums by bucket,
        bucket presence, and (for w_vec != None) the loss sum under
        the current rounded weights."""
        wv = None if w_vec is None else np.asarray(w_vec)

        def fn(batches):
            g = np.zeros(n_b + 1)
            seen = np.zeros(n_b + 1, dtype=np.int32)
            lsum = 0.0
            for b in batches:
                ys, fb, fx, starts, lens = _lrp_doc_arrays(b)
                if len(ys) == 0:
                    continue
                wt = np.where(ys == 1.0, pw, 1.0)
                np.add.at(seen, fb, 1)
                if wv is None:
                    # round 1: all weights 0 -> sigmoid = 0.5
                    r = wt * (0.5 - ys)
                else:
                    m = np.add.reduceat(fx * wv[fb], starts)
                    m = np.array([_round6(v) for v in m])
                    p = np.array(
                        [_round6(v) for v in 1.0 / (1.0 + np.exp(-m))]
                    )
                    lsum += float(
                        np.sum(
                            wt
                            * -(
                                ys * np.log(p)
                                + (1.0 - ys) * np.log(1.0 - p)
                            )
                        )
                    )
                    r = wt * (p - ys)
                g += np.bincount(
                    fb, weights=np.repeat(r, lens) * fx,
                    minlength=n_b + 1,
                )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([g.tolist()], type=pa.list_(pa.float64())),
                    pa.array(
                        [seen.tolist()], type=pa.list_(pa.int32())
                    ),
                    pa.array([lsum], type=pa.float64()),
                ],
                names=["g", "seen", "lsum"],
            )

        rows = train.mapInArrow(fn, partial_schema).collect()
        g = np.zeros(n_b + 1)
        seen = np.zeros(n_b + 1, dtype=np.int64)
        lsum = 0.0
        for r in rows:
            g += np.asarray(r["g"])
            seen += np.asarray(r["seen"], dtype=np.int64)
            lsum += float(r["lsum"])
        return g, seen, lsum

    bstr = [f"{i:02x}" for i in range(n_b)] + [LRP_BIAS]
    # round 1 (weights all zero): g1 = round(sum(wt (0.5-y) x)/denom)
    gsum1, seen, _ = _pass(None)
    if not seen[n_b]:
        raise ValueError(
            f"logreg round-2 model is missing the bias bucket "
            f"'{LRP_BIAS}' (0 docs survived the token filter) — "
            "the feature table is empty or the corpus was filtered "
            "to zero labeled docs, so no model can be fit"
        )
    present = [i for i in range(n_b + 1) if seen[i]]
    g1 = {i: _round6(gsum1[i] / denom) for i in present}
    w1 = {
        i: _round6(
            -LEARNING_RATE * g1[i] / (math.sqrt(g1[i] * g1[i]) + LRP_EPS)
        )
        for i in present
    }
    w1_vec = np.zeros(n_b + 1)
    for i in present:
        w1_vec[i] = w1[i]
    # round 2: margins/sigmoids under w1, loss_r2, g2, w2
    gsum2, _, lsum2 = _pass(w1_vec)
    loss_r2 = _round6(lsum2 / denom)
    g2 = {
        i: _round6(
            gsum2[i] / denom
            + (0.0 if i == n_b else L2_LAMBDA * w1[i])
        )
        for i in present
    }
    w2 = {
        i: _round6(
            w1[i]
            - LEARNING_RATE
            * g2[i]
            / (math.sqrt(g1[i] * g1[i] + g2[i] * g2[i]) + LRP_EPS)
        )
        for i in present
    }
    w2_vec = np.zeros(n_b + 1)
    for i in present:
        w2_vec[i] = w2[i]
    # final loss under w2 (gradient partials unused)
    _, _, lsum3 = _pass(w2_vec)
    loss_final = _round6(lsum3 / denom)
    top = sorted(present, key=lambda i: (-abs(w2[i]), bstr[i]))[:20]
    return literal_frame(
        spark,
        "bucket string, g1 double, w1 double, g2 double, w2 double,"
        " loss_r2 double, loss_final double",
        [
            (bstr[i], g1[i], w1[i], g2[i], w2[i], loss_r2, loss_final)
            for i in top
        ],
    ).orderBy(F.abs(F.col("w2")).desc(), "bucket")


# ---------------------------------------------------------------------
# Calibration audit: once a score gates training data (keep/drop by
# "confidence"), the pipeline must know whether that confidence MEANS
# anything — the reliability diagram + ECE readout.
# ---------------------------------------------------------------------

ECE_BINS = 10  # standard reliability-diagram decile bins


def calibration_cells(scored, bins: int = None):
    """Library core of `score_calibration_ece` (api.classifier.
    calibration_cells): the reliability table + ECE for any
    (conf in [0,1], y in {0,1}) frame — bin counts, mean confidence,
    empirical positive rate, signed gap, and the bin-weighted ECE
    scalar broadcast onto every row. Score-agnostic: feed a model
    sigmoid, a heuristic score, anything the pipeline thresholds."""
    bins = ECE_BINS if bins is None else bins
    binned = scored.select(
        (
            F.least(
                F.floor(F.col("conf") * bins).cast("int"),
                F.lit(bins - 1),
            )
            + 1
        ).alias("bin"),
        "conf",
        "y",
    )
    cells = binned.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(F.avg("conf"), 6).alias("mean_conf"),
        F.round(F.avg("y"), 6).alias("frac_pos"),
    )
    tot = cells.agg(
        F.round(
            F.sum(
                F.col("n")
                * F.abs(F.col("mean_conf") - F.col("frac_pos"))
            )
            / F.sum("n"),
            6,
        ).alias("ece")
    )
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n",
            "mean_conf",
            "frac_pos",
            F.round(
                F.col("frac_pos") - F.col("mean_conf"), 6
            ).alias("gap"),
            "ece",
        )
        .orderBy("bin")
    )


@query(
    "score_calibration_ece",
    oracle=f"""
    WITH scored AS (
        SELECT CASE WHEN source = '{TRUSTED_SOURCE}'
                    THEN 1.0 ELSE 0.0 END AS y,
               ROUND(CAST(len(list_distinct(list_filter(
                         string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> ''))) AS DOUBLE)
                     / GREATEST(len(list_filter(
                         string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '')), 1), 6) AS conf
        FROM documents
    ),
    binned AS (
        SELECT LEAST(CAST(FLOOR(conf * 10) AS INTEGER),
                     10 - 1) + 1 AS bin,
               conf, y
        FROM scored
    ),
    cells AS (
        SELECT bin,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(AVG(conf), 6) AS mean_conf,
               ROUND(AVG(y), 6) AS frac_pos
        FROM binned GROUP BY bin
    ),
    tot AS (
        SELECT SUM(n) AS nt,
               ROUND(SUM(n * ABS(mean_conf - frac_pos)) / SUM(n), 6)
                   AS ece
        FROM cells
    )
    SELECT c.bin, c.n, c.mean_conf, c.frac_pos,
           ROUND(c.frac_pos - c.mean_conf, 6) AS gap,
           t.ece
    FROM cells c CROSS JOIN tot t
    ORDER BY c.bin
    """,
)
def score_calibration_ece(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Reliability diagram + Expected Calibration Error for a score
    used as a confidence — the audit that must precede ANY
    threshold-by-confidence curation policy (Guo et al. 2017): if a
    quality score of 0.8 does not mean '~80% of such docs are from
    the trusted source', then 'keep everything above 0.8' is not
    the policy its author believes it is. Here the audited score is
    the type-token ratio (the quality_score family's confidence
    proxy, already in [0,1]) against the trusted-source label the
    classifier family trains on; the output is the standard
    10-bin reliability table (count, mean confidence,
    empirical positive rate, signed gap) plus the ECE scalar
    (bin-weighted mean |gap|) repeated per row for the panel read.
    Swapping in a learned model's sigmoid margin is a one-column
    change — the audit shape is score-agnostic.

    Scale shape: one corpus pass computes (bin, conf, y), one
    10-cell aggregate, and the ECE total rides a 1-row
    broadcast back onto the cells. No window, no pair stage."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
        lambda x: x != F.lit(""),
    )
    conf = F.round(
        F.size(F.array_distinct(w)).cast("double")
        / F.greatest(F.size(w), F.lit(1)),
        6,
    )
    scored = docs.select(
        F.when(F.col("source") == TRUSTED_SOURCE, 1.0)
        .otherwise(0.0)
        .alias("y"),
        conf.alias("conf"),
    )
    return calibration_cells(scored, ECE_BINS)


@query(
    "decision_stump_portable",
    oracle="""
    WITH base AS (
        SELECT 'quantity' AS feature, l_quantity AS v,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        FROM lineitem
        UNION ALL
        SELECT 'discount', ROUND(l_discount, 2),
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
        FROM lineitem
    ),
    cells AS (
        SELECT feature, v, COUNT(*) AS n, SUM(y) AS pos
        FROM base GROUP BY 1, 2
    ),
    cum AS (
        SELECT feature, v,
               SUM(n) OVER w AS cn,
               SUM(pos) OVER w AS cpos
        FROM cells
        WINDOW w AS (PARTITION BY feature ORDER BY v
                     ROWS UNBOUNDED PRECEDING)
    ),
    tot AS (
        SELECT feature, SUM(n) AS nn, SUM(pos) AS pp
        FROM cells GROUP BY 1
    ),
    scored AS (
        SELECT c.feature, c.v AS threshold,
               c.cn AS n_left, t.nn - c.cn AS n_right,
               ROUND(
                   (c.cn * 1.0 / t.nn)
                   * 2 * (c.cpos * 1.0 / c.cn)
                   * (1 - c.cpos * 1.0 / c.cn)
                   + ((t.nn - c.cn) * 1.0 / t.nn)
                   * 2 * ((t.pp - c.cpos) * 1.0 / (t.nn - c.cn))
                   * (1 - (t.pp - c.cpos) * 1.0 / (t.nn - c.cn)),
                   6) AS gini_split,
               ROUND(2 * (t.pp * 1.0 / t.nn)
                     * (1 - t.pp * 1.0 / t.nn), 6) AS gini_root,
               ROUND(
                   (GREATEST(c.cpos, c.cn - c.cpos)
                    + GREATEST(t.pp - c.cpos,
                               (t.nn - c.cn) - (t.pp - c.cpos)))
                   * 1.0 / t.nn, 6) AS stump_acc
        FROM cum c JOIN tot t USING (feature)
        WHERE c.cn < t.nn
    )
    SELECT feature, threshold,
           CAST(n_left AS BIGINT) AS n_left,
           CAST(n_right AS BIGINT) AS n_right,
           gini_root, gini_split,
           ROUND(gini_root - gini_split, 6) AS gini_gain,
           stump_acc
    FROM scored
    QUALIFY ROW_NUMBER() OVER (PARTITION BY feature
                               ORDER BY gini_split, threshold) = 1
    ORDER BY feature
    """,
)
def decision_stump_portable(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """1R decision stump (Holte 1993) — the ML baseline every
    classifier must beat, fit distributedly: for each numeric
    feature, the single threshold v <= t minimizing the weighted
    Gini impurity of the two sides, with the stump's majority-class
    accuracy beside the logistic model's metrics
    (`classifier_eval`) — if logreg barely beats the best stump,
    the features are the problem, not the optimizer. Label:
    l_returnflag = 'R' (the engine's standing binary target).

    The scan over all candidate thresholds is NOT a per-threshold
    pass: counts collapse to VALUE-grain cells (l_quantity has 50
    distinct values, discount 11 — domain-bounded at any SF), one
    cumulative window per feature turns prefix counts into
    left/right class totals for EVERY threshold simultaneously (the
    classic sorted-split-scan of decision-tree learners, as window
    arithmetic), and a struct-min argmax picks the winner with
    smallest-threshold ties. All ratios are exact-int divisions, so
    6-dp rounding is engine-stable.

    Scale shape: one map-side-combinable aggregate to value grain,
    bounded windows, a 2-row per-feature totals broadcast, 2-row
    output. Continuous features bucket to percentile-boundary
    candidates first (the lorenz discipline), same plan."""
    li = load_table(spark, sf_dir, "lineitem")
    y = F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
    base = li.select(
        F.lit("quantity").alias("feature"),
        F.col("l_quantity").alias("v"),
        y.alias("y"),
    ).unionAll(
        li.select(
            F.lit("discount"),
            F.round("l_discount", 2),
            y,
        )
    )
    cells = base.groupBy("feature", "v").agg(
        F.count("*").alias("n"), F.sum("y").alias("pos")
    )
    w = (
        Window.partitionBy("feature")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = cells.select(
        "feature",
        "v",
        F.sum("n").over(w).alias("cn"),
        F.sum("pos").over(w).alias("cpos"),
    )
    tot = cells.groupBy("feature").agg(
        F.sum("n").alias("nn"), F.sum("pos").alias("pp")
    )
    pl = F.col("cpos") * 1.0 / F.col("cn")
    pr = (F.col("pp") - F.col("cpos")) * 1.0 / (
        F.col("nn") - F.col("cn")
    )
    proot = F.col("pp") * 1.0 / F.col("nn")
    scored = (
        cum.join(F.broadcast(tot), "feature")
        .filter(F.col("cn") < F.col("nn"))
        .select(
            "feature",
            F.col("v").alias("threshold"),
            F.col("cn").alias("n_left"),
            (F.col("nn") - F.col("cn")).alias("n_right"),
            F.round(
                (F.col("cn") * 1.0 / F.col("nn")) * 2 * pl * (1 - pl)
                + ((F.col("nn") - F.col("cn")) * 1.0 / F.col("nn"))
                * 2
                * pr
                * (1 - pr),
                6,
            ).alias("gini_split"),
            F.round(2 * proot * (1 - proot), 6).alias("gini_root"),
            F.round(
                (
                    F.greatest(
                        F.col("cpos"), F.col("cn") - F.col("cpos")
                    )
                    + F.greatest(
                        F.col("pp") - F.col("cpos"),
                        (F.col("nn") - F.col("cn"))
                        - (F.col("pp") - F.col("cpos")),
                    )
                )
                * 1.0
                / F.col("nn"),
                6,
            ).alias("stump_acc"),
        )
    )
    best = scored.groupBy("feature").agg(
        F.min(
            F.struct(
                F.col("gini_split").alias("g"),
                F.col("threshold").alias("t"),
                F.col("n_left").alias("nl"),
                F.col("n_right").alias("nr"),
                F.col("gini_root").alias("gr"),
                F.col("stump_acc").alias("acc"),
            )
        ).alias("m")
    )
    return best.select(
        "feature",
        F.col("m.t").alias("threshold"),
        F.col("m.nl").cast("bigint").alias("n_left"),
        F.col("m.nr").cast("bigint").alias("n_right"),
        F.col("m.gr").alias("gini_root"),
        F.col("m.g").alias("gini_split"),
        F.round(F.col("m.gr") - F.col("m.g"), 6).alias("gini_gain"),
        F.col("m.acc").alias("stump_acc"),
    ).orderBy("feature")
