#!/usr/bin/env python3
"""Derive a LARGER scale factor from a driver-generated fixture dir by
replicating every table `copies` times with disjoint key spaces — the
sf1 evidence generator (VERDICT r4 #2). Driver-side tooling only (like
oracle_check.py), never a library dependency.

Design goals:
- REFERENTIAL INTEGRITY: every foreign key is offset by the same
  per-copy stride as its parent (orders.o_custkey tracks customer,
  lineitem.l_{order,part,supp}key track their parents), so join
  cardinalities scale exactly linearly. region/nation stay fixed
  (TPC-H semantics: dimension tables are SF-invariant).
- LINEAR near-dup structure: copy 0 is byte-identical to the source
  (all `< id bound` oracle contracts keep their exact meaning); in copy
  i>0 every alphabetic token gets a copy-unique LETTERS-ONLY suffix
  ("zzq" + two base-26 letters of i, injective for i <= 675). Token
  maps are injective per copy, so WITHIN-copy Jaccard/MinHash/shingle
  structure is preserved exactly while cross-copy token sets are
  disjoint — near-dup pair counts scale 10x, not 100x. n_chars is
  recomputed (the source invariant n_chars == length(text) holds).
  (The first version used a single chr(97+i) suffix character, which
  stops being a letter at i=26 — every copy past 25 then collapsed
  into ONE shared token space under the [a-z] tokenizer. Found by the
  sf10 run: q55's distinct-shingle count came out identical at
  copies=30 and copies=100.)
- Embeddings: copy i is the source vector circularly shifted by
  1 + (i-1) % (dim-1) positions, negated on every second wrap of that
  cycle (valid for i <= 2*(dim-1) = 126 at dim 64). A common
  permutation (and a common sign flip) preserves all within-copy
  cosines (up to float summation order) and decorrelates cross-copy
  pairs, so embedding near-dup pairs also scale linearly. (The first
  version shifted by i unclamped — DuckDB slice clamping made every
  copy past dim-1 an exact duplicate of the source.)
- events: ids offset, timestamps/props untouched — per-user session
  structure replicates exactly.
- DUP-HEAVY mode (dupFrac > 0, VERDICT r6 #2): the first
  int(copies * dupFrac) non-source copies of documents/embeddings are
  EXACT replicas under fresh ids (text/vector unchanged) instead of
  suffixed/rotated — e.g. copies=10 dupFrac=0.6 yields a corpus where
  60% of documents are byte-identical duplicates of a lower-id doc,
  the realistic crawl regime the dedup family must survive at scale.
  Exact replicas are the J=1 / cos=1 end of near-dup: they exercise the
  dedup pipelines' exact-collapse prepass and the loser-set anti-join at
  O(corpus) loser cardinality. Remaining copies keep the injective
  suffix / rotation treatment, so within-copy near-dup structure is
  still present. Other tables replicate normally (dup-heaviness is a
  documents/embeddings property).

CLUSTERED mode (VERDICT r7 #4): `make_sf.py --clustered <dstDir>
[n=20000] [dim=64] [nClusters=64] [seed=42] [sigma=0.1]` writes ONLY an
embeddings.parquet (same schema as the driver fixture: vec_id int64,
embedding list<float>, label int32 = the generating cluster) drawn from
a seeded Gaussian mixture — unit-norm cluster centers, per-point noise
sigma/dim (at 0.1, noise norm ≈ 0.8: within-cluster cosines ~0.6 vs
cross-cluster ~N(0, 1/dim), so members are clustered yet individually
DISTINCT — PQ codes differ within a cluster and ADC can rank them).
Much smaller sigmas (~0.04) instead make each cluster a near-duplicate
PILE: codes collapse, ADC distances tie n/nClusters deep, and recall@k
measures tie-breaking, not quantizer resolution (the regime the dedup
family owns, not ANN). The driver fixture's random vectors have
NO structure for a quantizer to exploit, so its measured ANN recall is
a floor; real embedding corpora are clustered, and this fixture
measures the recall the IVF/PQ/IVF-PQ probes actually deliver there.

SKEW mode (VERDICT r8 #5): `make_sf.py --skew <srcDir> <dstDir>
[copies=10] [hotFrac=0.2]` writes the tables the skew-stress queries
read (supplier, part, events, documents) replicated `copies`× — but
with hotFrac of the rows re-keyed onto ONE Zipf-hot key per dimension:
  - events: hotFrac of rows get user_id = the source's min user id
    (one user owns ~20% of all events → a giant sessionize window
    partition and a hot shuffle key for every per-user agg/join);
  - documents: hotFrac of rows get source = 'hot_source' AND the TEXT
    of the source corpus's min-id document (one LSH band bucket owns
    ~20% of the corpus → the banding hot-bucket guard's worst case;
    one source owns ~20% of rows → per-source window/agg skew);
  - supplier: hotFrac of rows get s_acctbal = the source median (a hot
    VALUE bucket for the q76–q78 rank joins' bucketized form).
  Row selection is hash(new id) % 100 < hotFrac*100 — deterministic,
  reproducible, and independent of copy index. n_chars is recomputed
  for rewritten documents so the fixture invariant holds. Oracle
  comparisons stay valid: DuckDB reads the same rewritten parquet.

TABLES filter: a trailing `--tables=a,b` limits which tables any
replication run writes (e.g. `--tables=documents,embeddings` for the
dup-heavy dedup-audit fixture, which reads nothing else — at copies=100
that skips ~60M lineitem rows of dead weight).

Usage: make_sf.py <srcDir> <dstDir> [copies=10] [dupFrac=0]
       [--tables=t1,t2,...]
"""
import os
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

STRIDE = 10_000_000  # far above any source key; keeps copy-0 ids intact


def make_clustered(dst, n=20000, dim=64, n_clusters=64, seed=42,
                   sigma=0.1):
    import numpy as np
    rng = np.random.RandomState(seed)
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.randint(0, n_clusters, size=n)
    vecs = (centers[labels] +
            rng.normal(scale=sigma, size=(n, dim))).astype(np.float32)
    os.makedirs(dst, exist_ok=True)
    table = pa.table({
        "vec_id": pa.array(range(n), type=pa.int64()),
        "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
        "label": pa.array(labels, type=pa.int32()),
    })
    pq.write_table(table, f"{dst}/embeddings.parquet", version="2.6",
                   row_group_size=16384)
    print(f"embeddings: {n} rows, dim {dim}, {n_clusters} clusters, "
          f"seed {seed}")


def make_skew(src, dst, copies=10, hot_frac=0.2):
    con = duckdb.connect()
    hot_pct = int(hot_frac * 100)

    def t(name):
        return f"read_parquet('{src}/{name}.parquet')"

    os.makedirs(dst, exist_ok=True)
    cp = f"CROSS JOIN (SELECT unnest(range({copies})) AS i) AS c"

    def write(name, select):
        con.sql(f"COPY ({select}) TO '{dst}/{name}.parquet' "
                f"(FORMAT PARQUET, ROW_GROUP_SIZE 16384)")
        n = con.sql(f"SELECT count(*) FROM '{dst}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows")

    hot_user = con.sql(f"SELECT min(user_id) FROM {t('events')}").fetchone()[0]
    hot_bal = con.sql(
        f"SELECT median(s_acctbal) FROM {t('supplier')}").fetchone()[0]
    hot_text = con.sql(f"""SELECT text FROM {t('documents')}
        ORDER BY doc_id LIMIT 1""").fetchone()[0].replace("'", "''")
    write("part", f"""
        SELECT p_partkey + i*{STRIDE} AS p_partkey, p_name, p_brand, p_type,
               p_size, p_retailprice
        FROM {t('part')} {cp}""")
    write("supplier", f"""
        SELECT s_suppkey + i*{STRIDE} AS s_suppkey, s_name, s_nationkey,
               CASE WHEN hash(s_suppkey + i*{STRIDE}) % 100 < {hot_pct}
                    THEN {hot_bal} ELSE s_acctbal END AS s_acctbal
        FROM {t('supplier')} {cp}""")
    write("events", f"""
        SELECT event_id + i*{STRIDE} AS event_id,
               CAST(ts AS TIMESTAMP_NS) AS ts,
               CASE WHEN hash(event_id + i*{STRIDE}) % 100 < {hot_pct}
                    THEN {hot_user} ELSE user_id + i*{STRIDE} END AS user_id,
               event_type, value, props
        FROM {t('events')} {cp}""")
    ev = pq.read_table(f"{dst}/events.parquet")
    idx = ev.schema.get_field_index("ts")
    ev = ev.set_column(idx, pa.field("ts", pa.timestamp("ns")),
                       ev.column("ts").cast(pa.timestamp("ns")))
    pq.write_table(ev, f"{dst}/events.parquet", version="2.6",
                   row_group_size=16384)
    print("events: ts restored to timestamp[ns]")
    # Hot documents get the shared text + a NUMERIC suffix unique per row:
    # byte-distinct (the dedup exact-collapse prepass cannot fold them)
    # but token-identical under the [a-z]+ tokenizer — every band bucket
    # of the shared signature goes hot simultaneously, the banding
    # hot-bucket guard's worst case by construction. NON-hot rows get
    # the normal injective per-copy token suffix (same as replication
    # mode) so the hot key is the fixture's ONLY anomaly — without it,
    # every copy would be a byte-identical replica and the dedup legs
    # would measure the exact-collapse prepass, not the hot bucket.
    hot_doc = (f"'{hot_text}' || ' ' || "
               f"CAST(doc_id + i*{STRIDE} AS VARCHAR)")
    sfx = ("chr(CAST(97 + i // 26 AS INTEGER)) || "
           "chr(CAST(97 + i % 26 AS INTEGER))")
    cold_doc = (f"regexp_replace(text, '([A-Za-z]+)', "
                f"'\\1zzq' || {sfx}, 'g')")
    write("documents", f"""
        SELECT doc_id + i*{STRIDE} AS doc_id,
               CASE WHEN hash(doc_id + i*{STRIDE}) % 100 < {hot_pct}
                    THEN {hot_doc} ELSE {cold_doc} END AS text,
               lang,
               CASE WHEN hash(doc_id + i*{STRIDE}) % 100 < {hot_pct}
                    THEN 'hot_source' ELSE source END AS source,
               CASE WHEN hash(doc_id + i*{STRIDE}) % 100 < {hot_pct}
                    THEN CAST(length({hot_doc}) AS BIGINT)
                    ELSE CAST(length({cold_doc}) AS BIGINT)
               END AS n_chars
        FROM {t('documents')} {cp}""")
    hot_rows = con.sql(f"""SELECT count(*) FROM '{dst}/documents.parquet'
        WHERE source = 'hot_source'""").fetchone()[0]
    print(f"skew: hot_source owns {hot_rows} documents "
          f"(target {hot_frac:.0%}), hot_user={hot_user}, "
          f"hot_bal={hot_bal}")


def main():
    if sys.argv[1] == "--clustered":
        args = sys.argv[2:]
        make_clustered(args[0], *[int(a) for a in args[1:5]],
                       *[float(a) for a in args[5:6]])
        return
    if sys.argv[1] == "--skew":
        args = sys.argv[2:]
        make_skew(args[0], args[1],
                  int(args[2]) if len(args) > 2 else 10,
                  float(args[3]) if len(args) > 3 else 0.2)
        return
    table_filter = None
    argv = sys.argv
    for a in list(argv):
        if a.startswith("--tables="):
            table_filter = set(a[len("--tables="):].split(","))
            argv = [x for x in argv if x != a]
    src, dst = argv[1], argv[2]
    copies = int(argv[3]) if len(argv) > 3 else 10
    dup_frac = float(argv[4]) if len(argv) > 4 else 0.0
    if not (0.0 <= dup_frac < 1.0):
        raise SystemExit(f"dupFrac={dup_frac} must be in [0, 1)")
    # copies 1..n_dup are exact replicas (dup-heavy mode); 0 stays source
    n_dup = int(copies * dup_frac)
    con = duckdb.connect()

    def t(name):
        return f"read_parquet('{src}/{name}.parquet')"

    # Validate EVERY copy bound before the first write: failing midway
    # leaves a partially built directory that looks complete at a glance.
    if copies > 675:
        raise SystemExit(f"copies={copies} exceeds the document token-suffix "
                         f"injectivity bound 675 (two base-26 letters)")
    dim = con.sql(f"SELECT len(embedding) FROM {t('embeddings')} LIMIT 1") \
        .fetchone()[0]
    if copies > 2 * (dim - 1):
        raise SystemExit(f"copies={copies} exceeds the embedding "
                         f"decorrelation bound 2*(dim-1)={2 * (dim - 1)}")

    os.makedirs(dst, exist_ok=True)
    cp = f"CROSS JOIN (SELECT unnest(range({copies})) AS i) AS c"

    # ROW_GROUP_SIZE: DuckDB's default (~123k rows) leaves a derived table
    # with a handful of row groups — Spark can split a parquet FILE no
    # finer than its row groups, so scans of the text-heavy tables ran
    # 2-5 tasks no matter the core count (found when sf3 and sf10 bench
    # times came out equal). 16k-row groups restore the many-split layout
    # a 100 TB dataset written by any distributed engine would have.
    def write(name, select):
        if table_filter is not None and name not in table_filter:
            return
        con.sql(f"COPY ({select}) TO '{dst}/{name}.parquet' "
                f"(FORMAT PARQUET, ROW_GROUP_SIZE 16384)")
        n = con.sql(f"SELECT count(*) FROM '{dst}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows")

    # SF-invariant dimensions: verbatim copy
    for name in ("region", "nation"):
        write(name, f"SELECT * FROM {t(name)}")

    write("customer", f"""
        SELECT c_custkey + i*{STRIDE} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM {t('customer')} {cp}""")
    write("supplier", f"""
        SELECT s_suppkey + i*{STRIDE} AS s_suppkey, s_name, s_nationkey, s_acctbal
        FROM {t('supplier')} {cp}""")
    write("part", f"""
        SELECT p_partkey + i*{STRIDE} AS p_partkey, p_name, p_brand, p_type,
               p_size, p_retailprice
        FROM {t('part')} {cp}""")
    # timestamp columns are cast back to the SOURCE parquet units (ms for
    # the TPC-H dates, ns for events.ts) — DuckDB would otherwise write
    # its native us and silently drop the driver layout's TIMESTAMP(NANOS)
    # quirk that Tables.events exists to handle
    write("orders", f"""
        SELECT o_orderkey + i*{STRIDE} AS o_orderkey,
               o_custkey + i*{STRIDE} AS o_custkey,
               o_orderstatus, o_totalprice,
               CAST(o_orderdate AS TIMESTAMP_MS) AS o_orderdate, o_orderpriority
        FROM {t('orders')} {cp}""")
    write("lineitem", f"""
        SELECT l_orderkey + i*{STRIDE} AS l_orderkey,
               l_partkey + i*{STRIDE} AS l_partkey,
               l_suppkey + i*{STRIDE} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus,
               CAST(l_shipdate AS TIMESTAMP_MS) AS l_shipdate
        FROM {t('lineitem')} {cp}""")
    write("events", f"""
        SELECT event_id + i*{STRIDE} AS event_id,
               CAST(ts AS TIMESTAMP_NS) AS ts,
               user_id + i*{STRIDE} AS user_id, event_type, value, props
        FROM {t('events')} {cp}""")
    # DuckDB's parquet writer downcasts TIMESTAMP_NS to us (v1.0) —
    # rewrite events through pyarrow to restore the source layout's
    # TIMESTAMP(NANOS) physical type (parquet 2.6)
    if table_filter is None or "events" in table_filter:
        ev = pq.read_table(f"{dst}/events.parquet")
        idx = ev.schema.get_field_index("ts")
        ev = ev.set_column(idx, pa.field("ts", pa.timestamp("ns")),
                           ev.column("ts").cast(pa.timestamp("ns")))
        pq.write_table(ev, f"{dst}/events.parquet", version="2.6",
                       row_group_size=16384)
        print("events: ts restored to timestamp[ns]")
    # letters-only, injective for i <= 675: 'zzq' + base-26(i) as 2 letters
    sfx = ("chr(CAST(97 + i // 26 AS INTEGER)) || "
           "chr(CAST(97 + i % 26 AS INTEGER))")
    write("documents", f"""
        SELECT doc_id + i*{STRIDE} AS doc_id,
               CASE WHEN i <= {n_dup} THEN text
                    ELSE regexp_replace(text, '([A-Za-z]+)',
                                        '\\1zzq' || {sfx}, 'g')
               END AS text,
               lang, source,
               CASE WHEN i <= {n_dup} THEN n_chars
                    ELSE CAST(length(regexp_replace(text, '([A-Za-z]+)',
                              '\\1zzq' || {sfx}, 'g')) AS BIGINT)
               END AS n_chars
        FROM {t('documents')} {cp}""")
    # shift cycles 1..dim-1 (never 0 → always a proper rotation); the
    # second pass through the cycle negates, so no two copies coincide
    # for i <= 2*(dim-1) (validated up front); within-copy cosines are
    # unchanged either way
    write("embeddings", f"""
        SELECT vec_id + i*{STRIDE} AS vec_id,
               CASE WHEN i <= {n_dup} THEN embedding
                    ELSE list_transform(
                        embedding[1 + (1 + (i-1) % {dim - 1}):]
                          || embedding[1:(1 + (i-1) % {dim - 1})],
                        x -> CASE WHEN ((i-1) // {dim - 1}) % 2 = 1
                             THEN -x ELSE x END)
               END AS embedding,
               label
        FROM {t('embeddings')} {cp}""")


if __name__ == "__main__":
    main()
