#!/usr/bin/env python3
"""Digest a watchdog-instrumented graft.Verify sweep log into a compact
per-query timing JSON (the BENCH-twin evidence for derived-SF runs):
reads '[verify] <name> ok <secs>s' / failed lines from the log, emits
one JSON object {name: secs} plus the failed list. Driver-side tooling
only (like oracle_check.py).

Usage: sf10_report.py <sweepLog> [out.json]
"""
import json
import re
import sys


def main():
    log = open(sys.argv[1], errors="replace").read()
    ok = {m.group(1): float(m.group(2)) for m in re.finditer(
        r"\[verify\] (\S+) ok ([0-9.]+)s", log)}
    failed = [(m.group(1), m.group(2).strip()) for m in re.finditer(
        r"\[verify\] (\S+) failed after [0-9.]+s: (.*)", log)]
    out = {
        "metric": "verify_sweep",
        "ok": len(ok),
        "failed": [{"name": n, "err": e[:120]} for n, e in failed],
        "total_secs": round(sum(ok.values()), 1),
        "slowest": sorted(ok.items(), key=lambda kv: -kv[1])[:15],
        "per_query_secs": {k: round(v, 2) for k, v in sorted(ok.items())},
    }
    text = json.dumps(out, indent=1)
    if len(sys.argv) > 2:
        open(sys.argv[2], "w").write(text + "\n")
    print(text)


if __name__ == "__main__":
    main()
