#!/usr/bin/env python
"""Time every DuckDB oracle sequentially at a given scale dir, with a
per-oracle wall cap, and write one JSON file.

Usage:
    DUCK_SF_DIR=/tmp/scale_probe/sf1 DUCK_CAP=60 DUCK_OUT=DUCK_SF1_r13.json \
        python tools/duck_sweep.py

A query that exceeds the cap is recorded as {"sec": cap, "capped": true}
— a LOWER BOUND on its true time. The bench's over-2x gate uses
2*duck + floor*jobs as the allowance, so a capped (understated) duck
time makes the gate STRICTER, never looser. Each capped oracle runs in
a fresh subprocess so the cap can actually interrupt DuckDB.
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("DUCK_SF_DIR", "/tmp/scale_probe/sf1")
CAP = float(os.environ.get("DUCK_CAP", "60"))
OUT = os.environ.get("DUCK_OUT", "DUCK_SWEEP.json")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

_CHILD = """
import json, sys, time
import duckdb
sf_dir, name = sys.argv[1], sys.argv[2]
sql = json.load(open(sys.argv[3]))[name]
con = duckdb.connect()
con.execute("SET threads TO 32")
for t in {tables!r}:
    import os
    p = f"{{sf_dir}}/{{t}}.parquet"
    if os.path.isdir(p):
        p = f"{{p}}/*.parquet"
    con.execute(f"CREATE VIEW {{t}} AS SELECT * FROM read_parquet('{{p}}')")
t0 = time.monotonic()
con.execute(sql).fetchall()
print(round(time.monotonic() - t0, 3))
""".format(tables=TABLES)


def main() -> None:
    import __spark_entry__ as entry

    oracles = entry.oracle_sql()
    tmp = "/tmp/_duck_oracles.json"
    with open(tmp, "w") as fh:
        json.dump(oracles, fh)
    out: dict = {}
    t_all = time.monotonic()
    for name in sorted(oracles):
        t0 = time.monotonic()
        try:
            r = subprocess.run(
                [sys.executable, "-c", _CHILD, SF_DIR, name, tmp],
                capture_output=True,
                text=True,
                timeout=CAP,
            )
            if r.returncode == 0:
                out[name] = {"sec": float(r.stdout.strip()), "capped": False}
            else:
                out[name] = {
                    "sec": round(time.monotonic() - t0, 3),
                    "error": r.stderr.strip()[-200:],
                }
        except subprocess.TimeoutExpired:
            out[name] = {"sec": CAP, "capped": True}
        print(name, out[name], flush=True)
    summary = {
        "sf_dir": SF_DIR,
        "cap_sec": CAP,
        "n": len(out),
        "n_capped": sum(1 for v in out.values() if v.get("capped")),
        "duck_sum_lower_bound": round(
            sum(v["sec"] for v in out.values()), 3
        ),
        "wall": round(time.monotonic() - t_all, 1),
        "queries": out,
    }
    with open(OUT, "w") as fh:
        json.dump(summary, fh, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
