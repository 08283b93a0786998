#!/usr/bin/env python3
"""Cross-engine Jaro-Winkler fuzz: replay graft.JwFuzz's seeded random
pairs through DuckDB's jaro_winkler_similarity and diff at 12 decimals.

Usage: java ... graft.JwFuzz 2000 42 | python3 tools/jw_fuzz.py
Exits 0 iff every pair agrees; prints a JSON summary line.
"""
import json
import sys

import duckdb

con = duckdb.connect()
n = bad = 0
worst = None
for line in sys.stdin:
    parts = line.rstrip("\n").split("\t")
    if len(parts) != 3:
        continue
    a, b, jw = parts[0], parts[1], float(parts[2])
    ref = con.execute(
        "SELECT jaro_winkler_similarity(?, ?)", [a, b]).fetchone()[0]
    n += 1
    if abs(ref - jw) > 1e-12:
        bad += 1
        if worst is None or abs(ref - jw) > worst[0]:
            worst = (abs(ref - jw), a, b, jw, ref)
summary = {"metric": "jw_fuzz", "pairs": n, "mismatches": bad}
if worst:
    summary["worst"] = {"a": worst[1], "b": worst[2],
                        "graft": worst[3], "duckdb": worst[4]}
print(json.dumps(summary))
sys.exit(1 if bad else 0)
