#!/usr/bin/env python3
"""Local pre-flight for the driver's t2 gate: run each oracle SQL from
`Verify`'s oracle_sql.json in DuckDB over the same sf dir, and compare
with the Spark result parquet (columns sorted by name, rows sorted,
values stringified, NULL -> \\N) the way the driver's hash compare does.

Usage: oracle_check.py <sfDir> <verifyOutDir> [query ...]
"""
import gc, json, sys, glob, os
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
    # ONE FRESH CONNECTION PER QUERY (r9 finding): a shared in-memory
    # connection accumulates buffer-manager state across the sweep — at
    # derived sf10 the alphabetical tail (q84+) aborts with "Out of
    # Memory Error ... 2048 bytes" despite 100+ GiB free, and even a
    # temp_directory + bounded memory_limit only delays it; the same
    # queries pass solo. View DDL is metadata-only, so reconnecting per
    # query costs nothing. The spill dir + bounded limit stay so a heavy
    # oracle can spill instead of crowding a co-running Spark JVM.
    def fresh_con():
        c = duckdb.connect()
        c.sql("SET temp_directory='/tmp/duckdb_oracle_spill'")
        # threads=8: DuckDB 1.0 with 32 threads over-reserves per-thread
        # operator memory on the heavy sf10 oracles and aborts tiny
        # allocations at ~14 GB RSS with 120 GB free (q84 repro); 8
        # threads + a high limit + spill completes the same query in 65 s.
        # Both knobs are host tuning (this box has 100+GB) — override via
        # ORACLE_THREADS / ORACLE_MEMLIMIT on smaller machines (ADVICE r9).
        c.sql(f"SET threads={int(os.environ.get('ORACLE_THREADS', '8'))}")
        c.sql(f"SET memory_limit='{os.environ.get('ORACLE_MEMLIMIT', '90GB')}'")
        for t in ["region","nation","customer","supplier","part","orders",
                  "lineitem","events","documents","embeddings"]:
            p = f"{sf_dir}/{t}.parquet"
            if os.path.exists(p):
                c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        return c
    # Returns True iff the query checks out. Runs on its own connection,
    # CLOSED by the caller before the next query opens one: relations and
    # the buffer pool die with the connection, so one heavy oracle cannot
    # starve the next (r9: after q84 at sf10, even duckdb.connect() for
    # the NEXT query failed until the previous database was closed).
    def check_one(con, name):
        spark_glob = (glob.glob(os.path.join(out_dir, name + ".parquet", "*.parquet"))
                      or glob.glob(os.path.join(out_dir, name, "*.parquet")))
        if not spark_glob:
            print(f"MISSING spark result: {name}")
            return False
        try:
            o = con.sql(oracle[name])
            # Flag oracle types whose stringification diverges through the
            # driver's pandas path (invisible to this script's fetchall
            # compare but fatal at the driver).
            exotic = [(c, str(t)) for c, t in zip(o.columns, o.types)
                      if any(str(t).startswith(d) for d in DIVERGENT_TYPES)]
            if exotic:
                print(f"EXOTIC-TYPE {name}: {exotic} — CAST in the oracle SQL")
                return False
            o_rows, o_cols = o.fetchall(), o.columns
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            return False
        srel = con.sql(f"SELECT * FROM read_parquet({spark_glob!r})")
        s_rows, s_cols = srel.fetchall(), srel.columns
        if sorted(o_cols) != sorted(s_cols):
            print(f"COLS-MISMATCH {name}: oracle={sorted(o_cols)} spark={sorted(s_cols)}")
            return False
        a, b = norm(o_rows, o_cols), norm(s_rows, s_cols)
        if a == b:
            print(f"OK   {name} ({len(a)} rows)")
            return True
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
            return False

    # ORACLE_SUBPROC=1: one PYTHON PROCESS per query. At derived sf10 a
    # heavy oracle (q84's span explode) leaves DuckDB 1.0's process-global
    # allocator unable to serve even 8-byte requests for the NEXT
    # database — con.close() + gc.collect() do not recover it — so the
    # only clean isolation is process death. Opt-in (costs ~1 s/query of
    # interpreter startup); the sf0.001/sf0.01 sweeps don't need it.
    if os.environ.get("ORACLE_SUBPROC") == "1" and len(oracle) > 1:
        import subprocess
        names = [n for n in sorted(oracle) if not only or n in only]
        env = dict(os.environ, ORACLE_SUBPROC="0")
        n_ok = n_bad = 0
        for name in names:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), sf_dir, out_dir,
                 name], env=env)
            if r.returncode == 0:
                n_ok += 1
            else:
                n_bad += 1
        print(f"\n{n_ok} ok, {n_bad} bad")
        sys.exit(1 if n_bad else 0)

    n_ok = n_bad = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        con = fresh_con()
        try:
            if check_one(con, name):
                n_ok += 1
            else:
                n_bad += 1
        finally:
            con.close()
            # relations created inside check_one can pin the closed
            # database through cyclic refs until a GC pass runs; collect
            # NOW so the next connection starts with a clean allocator
            gc.collect()
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
