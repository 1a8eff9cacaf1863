#!/usr/bin/env python
"""Isolated per-query measurement: warm best-of-N wall, Spark job
count (job-group counted, the bench's allowance basis), and physical
plan node counts (Exchange / Sort / Python-eval / Window / scans).

Usage (repo root):
    MEASURE_SF_DIR=/root/testdata/sf0.1 python tools/measure_query.py \
        <query> [<query>...]

Prints one line per query:
    name  best_s  (runs)  jobs=J  exch=E sort=S pyeval=P window=W

Methodology matches bench.py's isolated pass: noop sink, System.gc()
settle, min across repeats, jobs via statusTracker job groups.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    repeats = int(os.environ.get("MEASURE_REPEATS", "3"))
    sf_dir = os.environ.get("MEASURE_SF_DIR", "/root/testdata/sf0.1")

    from citeconnect_datapipeline_spark.plans.registry import get_queries
    from citeconnect_datapipeline_spark.session import get_spark

    spark = get_spark(app_name="measure-query")
    queries = get_queries()
    sc = spark.sparkContext
    # warm the JVM once on smoke data
    warm = "/root/testdata/sf0.001"
    for w in names:
        fn = queries.get(w)
        if fn is None:
            continue
        try:
            fn(spark, warm if os.path.isdir(warm) else sf_dir).write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception:
            pass

    for name in names:
        fn = queries.get(name)
        if fn is None:
            print(f"SKIP {name}: not registered")
            continue
        best, jobs_best = None, None
        for attempt in range(repeats):
            try:
                sc._jvm.System.gc()
            except Exception:
                pass
            time.sleep(0.2)
            group = f"measure-{name}-{attempt}"
            sc.setJobGroup(group, name)
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            t = time.monotonic() - t0
            sc.setJobGroup("measure-idle", "idle")
            try:
                jobs = max(
                    len(sc.statusTracker().getJobIdsForGroup(group)), 1
                )
            except Exception:
                jobs = -1
            if best is None or t < best:
                best, jobs_best = t, jobs
        # plan node census from the final (pre-execution) plan
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        import re

        def cnt(pat: str) -> int:
            return len(re.findall(pat, plan))

        print(
            f"{name:38s} {best:7.3f}s (best of {repeats}) "
            f"jobs={jobs_best} exch={cnt(r'Exchange')} "
            f"sort={cnt(r'[+*-] Sort')} "
            f"pyeval={cnt(r'EvalPython|MapInArrow|MapInPandas|FlatMapGroups')} "
            f"window={cnt(r'Window')} scans={cnt(r'Scan parquet')}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
