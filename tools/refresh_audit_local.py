#!/usr/bin/env python
"""Regenerate AUDIT_LOCAL.md from two fresh full oracle sweeps.

Runs `tools/oracle_audit.py --all` at sf0.01 and sf0.1 in fresh
subprocesses (one Spark session each), asserts every oracled query
MATCHes at both scales, and rewrites AUDIT_LOCAL.md with the full
transcripts — the round-closing evidence refresh as one command:

    python tools/refresh_audit_local.py "round N final refresh (date)" \
        "free-text paragraph describing this round's additions"
"""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sweep(sf_dir: str) -> list[str]:
    env = dict(os.environ, AUDIT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "tools", "oracle_audit.py"),
         "--all"],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    # keep only per-query verdict rows (oracle_audit also prints
    # info lines like "payload-parse corpus properties: OK")
    lines = [
        ln
        for ln in out.splitlines()
        if ": MATCH" in ln or ": MISMATCH" in ln or ": ERROR" in ln
    ]
    bad = [ln for ln in lines if ": MATCH" not in ln]
    if bad:
        raise SystemExit(
            f"non-MATCH rows at {sf_dir}:\n" + "\n".join(bad)
        )
    return lines


def main() -> None:
    title = sys.argv[1] if len(sys.argv) > 1 else "refresh"
    blurb = sys.argv[2] if len(sys.argv) > 2 else ""
    sys.path.insert(0, HERE)
    from __spark_entry__ import oracle_sql, queries

    n_q, n_o = len(queries()), len(oracle_sql())
    small = sweep("/root/testdata/sf0.01")
    big = sweep("/root/testdata/sf0.1")
    assert len(small) == len(big) == n_o, (len(small), len(big), n_o)
    doc = [
        f"# Local oracle audit — {title}",
        "",
        "`python tools/oracle_audit.py --all` — driver-shaped strict"
        " hash compare",
        "(columns sorted by name, 6-dp rounding)."
        f" **{n_o} oracled queries, all",
        f"MATCH at BOTH scales** ({n_q} registered; the other"
        f" {n_q - n_o} are rows-only by",
        "contract: iterative fits, engine-local sketch binaries, model",
        "inference, ANN index paths, per-shard bin-packing state —"
        " every such",
        "family has at least one value-verified portable twin). Zero",
        "mismatches, zero errors.",
    ]
    if blurb:
        doc += ["", blurb]
    doc += [
        "",
        f"## sf0.01 (default) — {len(small)} MATCH",
        "```",
        *sorted(small),
        "```",
        "",
        f"## sf0.1 (AUDIT_SF_DIR=/root/testdata/sf0.1) —"
        f" {len(big)} MATCH",
        "```",
        *sorted(big),
        "```",
        "",
    ]
    with open(os.path.join(HERE, "AUDIT_LOCAL.md"), "w") as f:
        f.write("\n".join(doc))
    print(f"AUDIT_LOCAL.md refreshed: {len(small)}+{len(big)} MATCH")


if __name__ == "__main__":
    main()
