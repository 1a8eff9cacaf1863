"""Driver-shaped strict verify harness: Spark query vs DuckDB oracle.

Usage (repo root):
    python tools/oracle_audit.py <query_name> [<query_name>...]
    python tools/oracle_audit.py --all

Exact hash compare after 6-dp float rounding, columns sorted by name —
stricter than tests/test_correctness.py (which compares with float
tolerance); this mirrors the external driver's value-hash gate.
"""
import hashlib
import sys

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import duckdb

import __spark_entry__ as entry
from citeconnect_datapipeline_spark.session import get_spark

import os as _os

SF_DIR = _os.environ.get("AUDIT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(df_pandas):
    cols = sorted(df_pandas.columns)
    df = df_pandas[cols]
    rows = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if v is None:
                vals.append("NULL")
                continue
            try:
                import pandas as pd

                if not isinstance(v, (list, tuple)) and pd.isna(v):
                    vals.append("NULL")
                    continue
            except (TypeError, ValueError):
                pass
            if isinstance(v, float):
                vals.append(f"{round(v, 6):.6f}")
            elif isinstance(v, (list, tuple)):
                vals.append(str([round(x, 6) if isinstance(x, float) else x for x in v]))
            else:
                vals.append(str(v))
        rows.append("|".join(vals))
    rows.sort()
    return hashlib.sha256("\n".join(rows).encode()).hexdigest(), len(rows), cols


def main():
    names = sys.argv[1:]
    if names == ["--all"]:
        names = sorted(entry.oracle_sql())
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if _os.path.isdir(p):  # Spark-written directory parquet
            p = f"{p}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
        )
    queries = entry.queries()
    oracles = entry.oracle_sql()
    fails = 0
    if "content_extract_payload_parse" in names:
        # the payload-parse oracle is exact only under documented
        # corpus properties — check them FIRST so a regenerated corpus
        # fails with the assumption named, not as a hash mismatch
        # (r10 ADVICE #4)
        from citeconnect_datapipeline_spark.operators.extraction import (
            assert_payload_parse_corpus_properties,
        )

        assert_payload_parse_corpus_properties(spark, SF_DIR)
        print("payload-parse corpus properties: OK")
    for name in names:
        sdf = queries[name](spark, SF_DIR).toPandas()
        if name not in oracles:
            print(f"{name}: ROWS-ONLY rows={len(sdf)} cols={sorted(sdf.columns)}")
            print(sdf.head(3).to_string())
            continue
        odf = con.execute(oracles[name]).fetchdf()
        sh, sn, sc = canon(sdf)
        oh, on, oc = canon(odf)
        if sh == oh:
            print(f"{name}: MATCH rows={sn}")
        else:
            fails += 1
            print(f"{name}: MISMATCH spark(rows={sn},cols={sc}) duck(rows={on},cols={oc})")
            print("  spark head:", sdf.head(2).to_dict("records"))
            print("  duck  head:", odf.head(2).to_dict("records"))
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
