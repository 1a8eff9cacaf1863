#!/usr/bin/env python
"""Audit every registered query's physical plan for repeated work:
how many times each base table is scanned, and how many Python
(MapInArrow/MapInPandas/ArrowEvalPython/BatchEvalPython) stages the
plan embeds. A table scanned N>1 times usually means a shared frame
is re-derived per consumer (guide §2.4: remove passes outright —
materialize the bounded intermediate instead).

Usage (repo root):
    python tools/scan_audit.py [min_scans] 2>/dev/null

Builds each query at AUDIT_SF_DIR (default /root/testdata/sf0.01) and
prints queries whose plan scans ANY single table >= min_scans (default
2) times, sorted by (scans x table bytes) — the re-read cost proxy.
"""
import os
import re
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    min_scans = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sf_dir = os.environ.get("AUDIT_SF_DIR", "/root/testdata/sf0.01")

    from citeconnect_datapipeline_spark.plans.registry import get_queries
    from citeconnect_datapipeline_spark.session import get_spark

    spark = get_spark(app_name="scan-audit")
    sizes = {
        f[: -len(".parquet")]: os.path.getsize(os.path.join(sf_dir, f))
        for f in os.listdir(sf_dir)
        if f.endswith(".parquet")
    }
    rows = []
    for name, fn in sorted(get_queries().items()):
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            print(f"ERROR {name}: {exc}", file=sys.stderr)
            continue
        # node headers: "(12) Scan parquet " followed later by a
        # "Location: ... <table>.parquet" detail line
        tables = re.findall(r"\[file:[^\]]*/(\w+)\.parquet\]", plan)
        per_table: dict = {}
        for t in tables:
            per_table[t] = per_table.get(t, 0) + 1
        py_nodes = len(
            re.findall(
                r"^\(\d+\) (MapInArrow|MapInPandas|ArrowEvalPython|"
                r"BatchEvalPython|FlatMapGroupsInPandas)",
                plan,
                re.M,
            )
        )
        worst = {
            t: c for t, c in per_table.items() if c >= min_scans
        }
        if worst or py_nodes >= 2:
            cost = sum(c * sizes.get(t, 0) for t, c in worst.items())
            rows.append((cost, name, worst, py_nodes))
    rows.sort(reverse=True)
    for cost, name, worst, py in rows:
        print(
            f"{name}: dup_scans={worst} py_stages={py}"
            f" rescan_bytes={cost}"
        )


if __name__ == "__main__":
    main()
