#!/usr/bin/env python
"""Dump `.explain("formatted")` for named queries to files.

Usage (repo root):
    python tools/dump_plan.py <out_dir> <suffix> <query> [<query>...]

Writes <out_dir>/<query>_<suffix>.txt for each query, built at
AUDIT_SF_DIR (default /root/testdata/sf0.01). Used to record the
before/after plan evidence for optimization rounds (plans/r12/).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("AUDIT_SF_DIR", "/root/testdata/sf0.01")

    from citeconnect_datapipeline_spark.plans.registry import get_queries
    from citeconnect_datapipeline_spark.session import get_spark

    spark = get_spark(app_name="dump-plan")
    queries = get_queries()
    for name in names:
        fn = queries.get(name)
        if fn is None:
            print(f"SKIP {name}: not registered", file=sys.stderr)
            continue
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
