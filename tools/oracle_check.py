#!/usr/bin/env python3
"""Local pre-flight for the driver's t2 gate: run each oracle SQL from
`Verify`'s oracle_sql.json in DuckDB over the same sf dir, and compare
with the Spark result parquet (columns sorted by name, rows sorted,
values stringified, NULL -> \\N) the way the driver's hash compare does.

Usage: oracle_check.py <sfDir> <verifyOutDir> [query ...]
"""
import json, sys, glob, os
import duckdb

# Types whose pandas/pyarrow stringification at the driver is KNOWN to
# diverge from Python fetchall() (round-2 q33/q44/q51: HUGEINT SUMs) —
# a denylist, so legitimate new oracle types (DECIMAL-free FLOAT,
# SMALLINT, TIMESTAMP_NS, ...) don't false-positive; anything actually
# divergent still fails the value compare below.
DIVERGENT_TYPES = {"HUGEINT", "UHUGEINT", "DECIMAL"}

def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if v is None:
                vals.append("\\N")
            elif isinstance(v, float):
                vals.append(repr(v))
            else:
                vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    n_ok = n_bad = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        spark_glob = (glob.glob(os.path.join(out_dir, name + ".parquet", "*.parquet"))
                      or glob.glob(os.path.join(out_dir, name, "*.parquet")))
        if not spark_glob:
            print(f"MISSING spark result: {name}")
            n_bad += 1
            continue
        try:
            o = con.sql(oracle[name])
            # Flag oracle types whose stringification diverges through the
            # driver's pandas path (invisible to this script's fetchall
            # compare but fatal at the driver).
            exotic = [(c, str(t)) for c, t in zip(o.columns, o.types)
                      if any(str(t).startswith(d) for d in DIVERGENT_TYPES)]
            if exotic:
                print(f"EXOTIC-TYPE {name}: {exotic} — CAST in the oracle SQL")
                n_bad += 1
                continue
            o_rows, o_cols = o.fetchall(), o.columns
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            n_bad += 1
            continue
        srel = con.sql(f"SELECT * FROM read_parquet({spark_glob!r})")
        s_rows, s_cols = srel.fetchall(), srel.columns
        if sorted(o_cols) != sorted(s_cols):
            print(f"COLS-MISMATCH {name}: oracle={sorted(o_cols)} spark={sorted(s_cols)}")
            n_bad += 1
            continue
        a, b = norm(o_rows, o_cols), norm(s_rows, s_cols)
        if a == b:
            print(f"OK   {name} ({len(a)} rows)")
            n_ok += 1
        else:
            print(f"DIFF {name}: oracle {len(a)} rows vs spark {len(b)} rows")
            for i, (x, y) in enumerate(zip(a, b)):
                if x != y:
                    print(f"  first diff row {i}:\n    oracle: {x}\n    spark : {y}")
                    break
            else:
                if len(a) != len(b):
                    longer, tag = (a, "oracle") if len(a) > len(b) else (b, "spark")
                    print(f"  extra {tag} row: {longer[min(len(a), len(b))]}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
