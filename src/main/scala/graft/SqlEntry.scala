package graft

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** E2 SQL-string entry (SURVEY.md §3.2): every declared-contract query
  * Q1–Q27 (§2.12) as executable Spark SQL TEXT, semantically identical to
  * its DataFrame builder in [[SparkEntry.queries]]. This is the second of
  * the two entry surfaces a reference user gets — `spark.sql("...")`
  * through the full parser → analyzer → optimizer path, not just the
  * DataFrame DSL (which shares Catalyst from the analyzer down but skips
  * the parser). SqlParitySpec pins text-vs-builder result equality for
  * all 27, so the two surfaces cannot drift apart silently.
  *
  * Dialect notes vs the DuckDB oracle texts in the QueryDefs: Spark has
  * `explode` not `unnest`, `date_format` not `strftime`, HOF lambdas
  * (`transform`/`aggregate`/`zip_with`) not list_* functions; join-order
  * hints are expressed as `/*+ BROADCAST(dim) */` where the builders use
  * `broadcast(...)` — exercising the hint-parsing path too.
  */
object SqlEntry {

  /** Spark-dialect tokenizer CTE — same `[^a-z]+` word rule as
    * [[graft.functions.Text.wordsOf]] and the DuckDB TokensCte. */
  private val TokensCte =
    """tokens AS (
      |  SELECT doc_id, word FROM (
      |    SELECT doc_id, explode(split(lower(text), '[^a-z]+')) AS word
      |    FROM documents) t
      |  WHERE length(word) > 0)""".stripMargin

  /** Spark SQL text per declared query, keyed by registry name. */
  val sql: Map[String, String] = ListMap(
    "q01_wordcount" ->
      s"""WITH $TokensCte
        |SELECT word, COUNT(*) AS c FROM tokens GROUP BY word ORDER BY word""".stripMargin,
    "q02_inverted_index" ->
      s"""WITH $TokensCte,
        |d AS (SELECT DISTINCT word, doc_id FROM tokens)
        |SELECT word, COUNT(*) AS df,
        |  array_join(transform(array_sort(collect_set(doc_id)),
        |                       x -> CAST(x AS STRING)), ',') AS docs
        |FROM d GROUP BY word ORDER BY word""".stripMargin,
    "q03_grep" ->
      "SELECT doc_id, text FROM documents WHERE text LIKE '%spark%' ORDER BY doc_id",
    "q04_topk_words" ->
      s"""WITH $TokensCte
        |SELECT word, COUNT(*) AS c FROM tokens GROUP BY word
        |ORDER BY c DESC, word LIMIT 10""".stripMargin,
    "q05_token_stats" ->
      s"""WITH $TokensCte
        |SELECT doc_id, COUNT(*) AS n_tok, COUNT(DISTINCT word) AS n_uniq
        |FROM tokens GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q06_source_freq" ->
      "SELECT source, COUNT(*) AS c FROM documents GROUP BY source ORDER BY c DESC, source",
    "q07_lang_sources" ->
      """WITH d AS (SELECT DISTINCT lang, source FROM documents)
        |SELECT lang, array_join(array_sort(collect_set(source)), ',') AS sources
        |FROM d GROUP BY lang ORDER BY lang""".stripMargin,
    "q08_global_agg" ->
      """SELECT COUNT(*) AS n,
        |  SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS sum_price_cents,
        |  ROUND(AVG(l_discount), 2) AS avg_disc,
        |  date_format(MIN(l_shipdate), 'yyyy-MM-dd HH:mm:ss') AS min_ship,
        |  date_format(MAX(l_shipdate), 'yyyy-MM-dd HH:mm:ss') AS max_ship
        |FROM lineitem""".stripMargin,
    "q09_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
        |  ROUND(SUM(l_quantity), 2) AS sum_qty,
        |  ROUND(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100e0, 2)
        |    AS sum_price,
        |  ROUND(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) / 100e0, 2)
        |    AS sum_disc_price,
        |  ROUND(AVG(l_quantity), 2) AS avg_qty,
        |  ROUND(AVG(l_extendedprice), 2) AS avg_price
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q10_rollup" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
        |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
        |  COUNT(*) AS cnt,
        |  ROUND(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) / 100e0, 2)
        |    AS sum_price
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY g_status, g_prio, o_orderstatus NULLS LAST, o_orderpriority NULLS LAST""".stripMargin,
    "q11_date_buckets" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(month(o_orderdate) AS BIGINT) AS m,
        |  COUNT(*) AS cnt, ROUND(SUM(o_totalprice), 2) AS sum_price
        |FROM orders GROUP BY y, m ORDER BY y, m""".stripMargin,
    "q12_join2" ->
      """SELECT c_mktsegment, COUNT(*) AS cnt,
        |  ROUND(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) / 100e0, 2)
        |    AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q13_join4" ->
      """SELECT /*+ BROADCAST(nation) */ n_name,
        |  ROUND(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) / 100e0, 2)
        |    AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q14_join5_region" ->
      """SELECT /*+ BROADCAST(nation, region) */ n_name,
        |  ROUND(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) / 100e0, 2)
        |    AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q15_topk_unshipped" ->
      """SELECT l_orderkey,
        |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  date_format(o_orderdate, 'yyyy-MM-dd') AS orderdate
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q16_having" ->
      """SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS total
        |FROM orders GROUP BY o_custkey
        |HAVING ROUND(SUM(o_totalprice), 2) > 3500000
        |ORDER BY total DESC, o_custkey""".stripMargin,
    "q17_outer_join" ->
      """SELECT c_custkey, COALESCE(cnt, 0) AS cnt
        |FROM customer LEFT JOIN
        |  (SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey) oc
        |  ON c_custkey = o_custkey
        |ORDER BY c_custkey""".stripMargin,
    "q18_semi_anti" ->
      """SELECT 'has_orders' AS tag, c_custkey FROM customer
        |  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT 'no_orders' AS tag, c_custkey FROM customer
        |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY tag, c_custkey""".stripMargin,
    "q19_theta_join" ->
      """SELECT /*+ BROADCAST(supplier) */ p_partkey, COUNT(*) AS cnt
        |FROM part JOIN supplier ON p_retailprice > s_acctbal
        |GROUP BY p_partkey ORDER BY p_partkey""".stripMargin,
    "q20_rank_window" ->
      """SELECT o_orderpriority, o_orderkey, ROUND(o_totalprice, 2) AS price,
        |  CAST(rn AS BIGINT) AS rn FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t WHERE rn <= 3
        |ORDER BY o_orderpriority, rn""".stripMargin,
    "q21_frames_lag" ->
      """SELECT o_custkey, o_orderkey, date_format(o_orderdate, 'yyyy-MM-dd') AS od,
        |  ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running,
        |  ROUND(COALESCE(LAG(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey), 0), 2) AS prev
        |FROM orders WHERE o_custkey < 20
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q22_json_events" ->
      """SELECT date_format(date_trunc('hour', ts), 'yyyy-MM-dd HH:mm:ss') AS h,
        |  event_type, COUNT(*) AS cnt, ROUND(SUM(value), 2) AS sum_val,
        |  ROUND(AVG(CAST(get_json_object(props, '$.k') AS INT)), 2) AS avg_k
        |FROM events GROUP BY h, event_type ORDER BY h, event_type""".stripMargin,
    "q23_set_ops" ->
      """WITH b AS (SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'),
        |o AS (SELECT DISTINCT o_custkey AS k FROM orders)
        |SELECT 'building_with_orders' AS tag, k
        |  FROM (SELECT k FROM b INTERSECT SELECT k FROM o) t1
        |UNION ALL
        |SELECT 'building_no_orders' AS tag, k
        |  FROM (SELECT k FROM b EXCEPT SELECT k FROM o) t2
        |ORDER BY tag, k""".stripMargin,
    "q24_exact_dedup" ->
      """SELECT COUNT(*) AS total, COUNT(DISTINCT text) AS uniq,
        |  COUNT(*) - COUNT(DISTINCT text) AS dups
        |FROM documents""".stripMargin,
    "q25_cosine_topk" ->
      """WITH e AS (SELECT vec_id, transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |en AS (SELECT vec_id, v,
        |  sqrt(aggregate(v, CAST(0 AS DOUBLE), (a, x) -> a + x * x)) AS nrm FROM e),
        |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM en WHERE vec_id < 5),
        |pairs AS (
        |  SELECT qid, vec_id AS nid,
        |    ROUND(aggregate(zip_with(qv, v, (x, y) -> x * y),
        |                    CAST(0 AS DOUBLE), (a, x) -> a + x) / (qn * nrm), 4) AS cos
        |  FROM q JOIN en ON vec_id != qid),
        |ranked AS (SELECT qid, nid, cos,
        |  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn FROM pairs)
        |SELECT qid, nid, cos, CAST(rn AS BIGINT) AS rn FROM ranked WHERE rn <= 5
        |ORDER BY qid, rn""".stripMargin,
    "q26_neardup_jaccard" ->
      s"""WITH $TokensCte,
        |t AS (SELECT DISTINCT doc_id, word FROM tokens WHERE doc_id < 100),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM t GROUP BY doc_id),
        |inter AS (SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS i
        |          FROM t x JOIN t y ON x.word = y.word AND x.doc_id < y.doc_id
        |          GROUP BY x.doc_id, y.doc_id)
        |SELECT a, b, ROUND(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 4) AS jac
        |FROM inter JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
        |WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8
        |ORDER BY a, b""".stripMargin,
    "q27_tfidf" ->
      s"""WITH $TokensCte,
        |tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM tokens
        |       WHERE doc_id < 20 GROUP BY doc_id, word),
        |df AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM tokens GROUP BY word),
        |n AS (SELECT COUNT(*) AS n FROM documents),
        |wts AS (SELECT /*+ BROADCAST(df) */ doc_id, tf.word AS word,
        |        ROUND(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df), 4) AS weight
        |        FROM tf JOIN df ON tf.word = df.word CROSS JOIN n),
        |r AS (SELECT doc_id, word, weight,
        |      ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY weight DESC, word) AS rn
        |      FROM wts)
        |SELECT doc_id, word, weight, CAST(rn AS BIGINT) AS rn FROM r WHERE rn <= 3
        |ORDER BY doc_id, rn""".stripMargin)

  /** Spark SQL texts for EXTENSION queries beyond the declared 27 —
    * the full SQL-expressible remainder of the registry (VERDICT r4 #6):
    * window families, grouping sets/cube, sessionization, funnel HOF
    * folds, the text-pipeline scoring/filter/shingle operators, the
    * SQL-registered native expressions (`poly_hash`, `dot_product` via
    * [[GraftExtensions.register]]) and the SQL-registered TopK UDAF.
    * Pinned result-equal to the builders in SqlParitySpec alongside the
    * contract 27.
    *
    * Deliberately ABSENT (and why): q37/q53/q72/q75 (approximate LSH
    * variants — the operator/rule path IS the surface, results are not
    * SQL-stable), q38/q39 (IVF Lloyd training loop / typed-Dataset stub
    * codec — imperative driver coordination, not a single statement),
    * q46 (already SQL text in its builder), q48/q58/q71/q74 (connected
    * components — an iterative fixpoint the library runs as a driver
    * loop; Spark SQL has no UNION-distinct recursive CTE to express it
    * tersely and a cyclic edge set would not terminate under UNION ALL
    * recursion). Where a builder uses a
    * bucketed/banded SCALE plan with
    * identical semantics (q50), the text states the declarative
    * all-pairs SPEC — the result contract, not the physical plan. */
  val extensionSql: Map[String, String] = ListMap(
    "q63_rank_variants" ->
      """WITH b AS (
        |  SELECT o_orderpriority, o_orderkey,
        |    CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bucket,
        |    o_totalprice
        |  FROM orders WHERE o_custkey < 100)
        |SELECT o_orderpriority, o_orderkey, bucket,
        |  CAST(RANK() OVER (PARTITION BY o_orderpriority ORDER BY bucket DESC)
        |       AS BIGINT) AS rnk,
        |  CAST(DENSE_RANK() OVER (PARTITION BY o_orderpriority ORDER BY bucket DESC)
        |       AS BIGINT) AS drnk,
        |  ROUND(PERCENT_RANK() OVER (PARTITION BY o_orderpriority
        |                             ORDER BY bucket DESC), 4) AS prk,
        |  CAST(NTILE(4) OVER (PARTITION BY o_orderpriority
        |                      ORDER BY o_totalprice DESC, o_orderkey)
        |       AS BIGINT) AS nt
        |FROM b ORDER BY o_orderpriority, o_orderkey""".stripMargin,
    "q64_outer_variants" ->
      """WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS c_cnt
        |           FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey),
        |s AS (SELECT s_nationkey AS nk, COUNT(*) AS s_cnt
        |      FROM supplier WHERE s_acctbal < 0 GROUP BY s_nationkey)
        |SELECT tag, nk, c_cnt, s_cnt FROM (
        |  SELECT 'full' AS tag, COALESCE(c.nk, s.nk) AS nk,
        |    COALESCE(c_cnt, CAST(0 AS BIGINT)) AS c_cnt,
        |    COALESCE(s_cnt, CAST(0 AS BIGINT)) AS s_cnt
        |  FROM c FULL JOIN s ON c.nk = s.nk
        |  UNION ALL
        |  SELECT 'right' AS tag, s.nk AS nk,
        |    COALESCE(c_cnt, CAST(0 AS BIGINT)) AS c_cnt, s_cnt
        |  FROM c RIGHT JOIN s ON c.nk = s.nk) u
        |ORDER BY tag, nk""".stripMargin,
    "q67_scalar_sweep" ->
      """SELECT o_orderkey,
        |  CAST(datediff(to_date(o_orderdate), DATE '1995-01-01') AS BIGINT)
        |    AS days_since,
        |  trim(concat('  ', o_orderpriority, ' ')) AS prio,
        |  COALESCE(NULLIF(o_orderstatus, 'O'), '-') AS status_or_dash,
        |  ROUND(ABS(o_totalprice - 150000), 2) AS absdiff,
        |  ROUND(POWER(1.0001, CAST(o_orderkey % 100 AS DOUBLE)), 4) AS powv,
        |  substring(o_orderpriority, 1, 3) AS prio3
        |FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey""".stripMargin,
    "q69_window_nav" ->
      """SELECT o_custkey, o_orderkey,
        |  ROUND(COALESCE(LEAD(o_totalprice) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 0), 2) AS next_price,
        |  ROUND(FIRST_VALUE(o_totalprice) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS first_price,
        |  ROUND(LAST_VALUE(o_totalprice) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS last_price,
        |  CAST(NTH_VALUE(o_orderkey, 2) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS BIGINT) AS second_key
        |FROM orders WHERE o_custkey < 50
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q70_sliding_window" ->
      """SELECT date_format(window.start, 'yyyy-MM-dd HH:mm:ss') AS w_start,
        |  event_type, COUNT(*) AS cnt, ROUND(SUM(value), 2) AS sum_val
        |FROM events
        |GROUP BY window(ts, '1 hour', '15 minutes'), event_type
        |ORDER BY w_start, event_type""".stripMargin,
    "q28_lang_id" ->
      s"""WITH $TokensCte,
        |sc AS (SELECT doc_id,
        |  SUM(CASE WHEN word IN ('hash','merge') THEN 1 ELSE 0 END) AS c_de,
        |  SUM(CASE WHEN word IN ('the','a') THEN 1 ELSE 0 END) AS c_en,
        |  SUM(CASE WHEN word IN ('data','row') THEN 1 ELSE 0 END) AS c_es,
        |  SUM(CASE WHEN word IN ('query','table') THEN 1 ELSE 0 END) AS c_fr,
        |  SUM(CASE WHEN word IN ('spark','scan') THEN 1 ELSE 0 END) AS c_zh
        |  FROM tokens WHERE doc_id < 100 GROUP BY doc_id),
        |p AS (SELECT doc_id,
        |  CASE WHEN c_de = g THEN 'de' WHEN c_en = g THEN 'en'
        |       WHEN c_es = g THEN 'es' WHEN c_fr = g THEN 'fr'
        |       WHEN c_zh = g THEN 'zh' END AS pred
        |  FROM (SELECT *, GREATEST(c_de, c_en, c_es, c_fr, c_zh) AS g FROM sc) t)
        |SELECT p.doc_id, d.lang, pred,
        |  CAST(CASE WHEN d.lang = pred THEN 1 ELSE 0 END AS BIGINT) AS hit
        |FROM p JOIN documents d ON p.doc_id = d.doc_id
        |ORDER BY p.doc_id""".stripMargin,
    "q29_quality_score" ->
      s"""WITH $TokensCte,
        |q AS (SELECT doc_id, COUNT(*) AS n_tok,
        |  ROUND(CAST(SUM(length(word)) AS DOUBLE) / COUNT(*), 4) AS avg_len,
        |  ROUND(CAST(SUM(CASE WHEN word IN ('the','a') THEN 1 ELSE 0 END) AS DOUBLE)
        |        / COUNT(*), 4) AS stop_ratio,
        |  ROUND(ln(1 + COUNT(*)) *
        |    (1 - CAST(SUM(CASE WHEN word IN ('the','a') THEN 1 ELSE 0 END) AS DOUBLE)
        |         / COUNT(*)), 4) AS score
        |  FROM tokens GROUP BY doc_id)
        |SELECT q.doc_id, n_tok, avg_len, stop_ratio, score, n_chars
        |FROM q JOIN documents d ON q.doc_id = d.doc_id
        |ORDER BY q.doc_id""".stripMargin,
    "q30_fingerprint" ->
      "SELECT doc_id, poly_hash(text, 7) AS fp FROM documents ORDER BY doc_id",
    "q31_token_count" ->
      """SELECT doc_id,
        |  CAST(size(split(text, ' ')) AS BIGINT) AS n_ws,
        |  CAST(size(regexp_extract_all(text, '[a-z]+', 0)) AS BIGINT) AS n_re,
        |  CAST(ceil(n_chars / 4.0) AS BIGINT) AS est_bpe
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q32_minhash_sig" ->
      s"""WITH $TokensCte,
        |t AS (SELECT DISTINCT doc_id, word FROM tokens WHERE doc_id < 50),
        |h AS (SELECT doc_id, poly_hash(word, 7) AS wh FROM t)
        |SELECT doc_id,
        |  MIN((wh * 3 + 1) % 1000000007) AS h0,
        |  MIN((wh * 5 + 7) % 1000000007) AS h1,
        |  MIN((wh * 11 + 13) % 1000000007) AS h2,
        |  MIN((wh * 17 + 19) % 1000000007) AS h3
        |FROM h GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q33_simhash" ->
      s"""WITH $TokensCte,
        |tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM tokens WHERE doc_id < 100
        |       GROUP BY doc_id, word),
        |h AS (SELECT doc_id, tf, poly_hash(word, 7) AS wh FROM tf),
        |bits AS (SELECT doc_id, b,
        |         SUM(CASE WHEN (shiftright(wh, b) & 1) = 1 THEN tf ELSE -tf END) AS s
        |         FROM h CROSS JOIN (SELECT explode(sequence(0, 15)) AS b) bs
        |         GROUP BY doc_id, b)
        |SELECT doc_id,
        |  SUM(CASE WHEN s > 0 THEN CAST(shiftleft(1, b) AS BIGINT) ELSE 0 END)
        |    AS simhash
        |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q34_ngram_jaccard" ->
      """WITH arr AS (
        |  SELECT doc_id, filter(split(lower(text), '[^a-z]+'),
        |                        x -> length(x) > 0) AS ws
        |  FROM documents WHERE doc_id < 50),
        |bg AS (SELECT DISTINCT doc_id, bg FROM (
        |  SELECT doc_id, explode(transform(sequence(1, size(ws) - 1),
        |    i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1)))) AS bg
        |  FROM arr) t),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM bg GROUP BY doc_id),
        |inter AS (SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS i
        |          FROM bg x JOIN bg y ON x.bg = y.bg AND x.doc_id < y.doc_id
        |          GROUP BY x.doc_id, y.doc_id)
        |SELECT a, b, ROUND(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 4) AS jac
        |FROM inter JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
        |WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.05
        |ORDER BY a, b""".stripMargin,
    "q35_embedding_neardup" ->
      """WITH e AS (SELECT vec_id, transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings WHERE vec_id < 200),
        |en AS (SELECT vec_id, v,
        |  sqrt(aggregate(v, CAST(0 AS DOUBLE), (a, x) -> a + x * x)) AS nrm FROM e),
        |p AS (SELECT a.vec_id AS a, b.vec_id AS b,
        |  dot_product(a.v, b.v) / (a.nrm * b.nrm) AS rawcos
        |  FROM en a JOIN en b ON a.vec_id < b.vec_id)
        |SELECT a, b, ROUND(rawcos, 4) AS cos FROM p WHERE rawcos >= 0.3
        |ORDER BY a, b""".stripMargin,
    "q36_media_meta" ->
      """SELECT doc_id AS media_id,
        |  element_at(array('image','audio','video'), CAST(doc_id % 3 + 1 AS INT))
        |    AS kind,
        |  CAST(octet_length(text) AS BIGINT) AS n_bytes,
        |  aggregate(transform(split(text, ''), c -> ascii(c)),
        |            CAST(0 AS BIGINT), (acc, x) -> acc + x) AS checksum
        |FROM documents ORDER BY media_id""".stripMargin,
    "q40_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events
        |           WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
        |u AS (
        |  SELECT user_id, ts, CAST(NULL AS TIMESTAMP) AS prev_click,
        |         1 AS side, event_id FROM p
        |  UNION ALL
        |  SELECT user_id, ts, ts AS prev_click, 0 AS side,
        |         CAST(NULL AS BIGINT) AS event_id FROM c),
        |w AS (SELECT user_id, ts, event_id, side,
        |  LAST(prev_click, true) OVER (PARTITION BY user_id
        |    ORDER BY ts, side, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_click
        |  FROM u)
        |SELECT event_id, user_id, date_format(ts, 'yyyy-MM-dd HH:mm:ss') AS ts,
        |  date_format(prev_click, 'yyyy-MM-dd HH:mm:ss') AS prev_click
        |FROM w WHERE side = 1 ORDER BY event_id""".stripMargin,
    "q41_percentiles" ->
      """SELECT o_orderpriority,
        |  ROUND(element_at(ps, 1), 2) AS p25, ROUND(element_at(ps, 2), 2) AS p50,
        |  ROUND(element_at(ps, 3), 2) AS p75, ROUND(element_at(ps, 4), 2) AS p90
        |FROM (SELECT o_orderpriority,
        |        percentile(o_totalprice, array(0.25D, 0.50D, 0.75D, 0.90D)) AS ps
        |      FROM orders GROUP BY o_orderpriority) t
        |ORDER BY o_orderpriority""".stripMargin,
    "q42_topk_udaf" ->
      """SELECT o_orderpriority,
        |  array_join(transform(topk3(ROUND(o_totalprice, 2)),
        |    x -> CAST(CAST(x AS DECIMAL(18,2)) AS STRING)), ',') AS top_prices
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q43_approx_distinct" ->
      """SELECT source, approx_count_distinct(text) AS approx_uniq, COUNT(*) AS n
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q44_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id,
        |    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts,
        |    SUM(CASE WHEN prev IS NULL
        |             OR unix_micros(ts) - unix_micros(prev) > 1800000000
        |             THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM e)
        |SELECT user_id, sid, COUNT(*) AS n,
        |  date_format(MIN(ts), 'yyyy-MM-dd HH:mm:ss') AS s_start,
        |  date_format(MAX(ts), 'yyyy-MM-dd HH:mm:ss') AS s_end
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, sid""".stripMargin,
    "q45_cube" ->
      """SELECT lang, source,
        |  CAST(GROUPING(lang) AS BIGINT) AS g_l,
        |  CAST(GROUPING(source) AS BIGINT) AS g_s,
        |  COUNT(*) AS cnt
        |FROM documents GROUP BY CUBE(lang, source)
        |ORDER BY g_l, g_s, lang NULLS LAST, source NULLS LAST""".stripMargin,
    "q47_range_frame" ->
      """SELECT o_orderkey, o_orderpriority, ROUND(o_totalprice, 2) AS price,
        |  COUNT(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
        |                 RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING) AS n_near
        |FROM orders WHERE o_orderkey BETWEEN 1 AND 999
        |ORDER BY o_orderkey""".stripMargin,
    "q49_stratified_sample" ->
      """WITH h AS (SELECT lang, doc_id, poly_hash(text, 13) % 1000 AS hb
        |           FROM documents),
        |r AS (SELECT lang, doc_id, hb,
        |      ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hb, doc_id) AS rn
        |      FROM h)
        |SELECT lang, doc_id, hb, CAST(rn AS BIGINT) AS rn FROM r WHERE rn <= 10
        |ORDER BY lang, rn""".stripMargin,
    "q50_simhash_neardup" ->
      s"""WITH $TokensCte,
        |tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM tokens WHERE doc_id < 100
        |       GROUP BY doc_id, word),
        |h AS (SELECT doc_id, tf, poly_hash(word, 7) AS wh FROM tf),
        |bits AS (SELECT doc_id, b,
        |         SUM(CASE WHEN (shiftright(wh, b) & 1) = 1 THEN tf ELSE -tf END) AS s
        |         FROM h CROSS JOIN (SELECT explode(sequence(0, 15)) AS b) bs
        |         GROUP BY doc_id, b),
        |sh AS (SELECT doc_id,
        |       SUM(CASE WHEN s > 0 THEN CAST(shiftleft(1, b) AS BIGINT) ELSE 0 END)
        |         AS simhash
        |       FROM bits GROUP BY doc_id)
        |SELECT x.doc_id AS a, y.doc_id AS b,
        |  CAST(bit_count(x.simhash ^ y.simhash) AS BIGINT) AS dist
        |FROM sh x JOIN sh y ON x.doc_id < y.doc_id
        |WHERE bit_count(x.simhash ^ y.simhash) <= 3
        |ORDER BY a, b""".stripMargin,
    "q51_json_map" ->
      """SELECT event_type, jk, COUNT(*) AS cnt, SUM(jv) AS sum_v,
        |  MIN(jv) AS min_v, MAX(jv) AS max_v
        |FROM events
        |LATERAL VIEW explode(from_json(props, 'map<string,bigint>')) kv AS jk, jv
        |GROUP BY event_type, jk
        |ORDER BY event_type, jk""".stripMargin,
    "q52_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_s,
        |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_p,
        |  COUNT(*) AS cnt,
        |  ROUND(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) / 100e0, 2)
        |    AS sum_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY g_s, g_p, o_orderstatus NULLS LAST, o_orderpriority NULLS LAST""".stripMargin,
    "q54_repetition_filter" ->
      """WITH w AS (
        |  SELECT doc_id, filter(split(lower(text), '[^a-z]+'),
        |                        x -> length(x) > 0) AS words
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, transform(sequence(1, size(words) - 1),
        |    i -> concat_ws(' ', element_at(words, i), element_at(words, i + 1))) AS bg
        |  FROM w WHERE size(words) >= 2)
        |SELECT doc_id,
        |  CAST(size(bg) AS BIGINT) AS n_bigrams,
        |  CAST(size(array_distinct(bg)) AS BIGINT) AS n_distinct,
        |  ROUND(1 - CAST(size(array_distinct(bg)) AS DOUBLE) / size(bg), 4)
        |    AS dup_frac,
        |  CAST(CASE WHEN 1 - CAST(size(array_distinct(bg)) AS DOUBLE) / size(bg) > 0.2
        |       THEN 1 ELSE 0 END AS BIGINT) AS flagged
        |FROM b ORDER BY doc_id""".stripMargin,
    "q55_boilerplate_ngrams" ->
      """WITH w AS (
        |  SELECT doc_id, filter(split(lower(text), '[^a-z]+'),
        |                        x -> length(x) > 0) AS words
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, explode(transform(sequence(1, size(words) - 2),
        |    i -> concat_ws(' ', element_at(words, i), element_at(words, i + 1),
        |                   element_at(words, i + 2)))) AS shingle
        |  FROM w WHERE size(words) >= 3)
        |SELECT shingle, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_total
        |FROM g GROUP BY shingle HAVING COUNT(DISTINCT doc_id) >= 3
        |ORDER BY n_docs DESC, n_total DESC, shingle""".stripMargin,
    "q56_shard_pack" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST(size(filter(split(lower(text), '[^a-z]+'),
        |                     x -> length(x) > 0)) AS BIGINT) AS n_tok
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, lang, n_tok,
        |    SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t)
        |SELECT doc_id, lang, n_tok,
        |  CAST(FLOOR((cum - n_tok) / 500.0) AS BIGINT) AS shard
        |FROM c ORDER BY lang, doc_id""".stripMargin,
    "q57_lm_xent" ->
      """WITH w AS (
        |  SELECT doc_id, explode(filter(split(lower(text), '[^a-z]+'),
        |                                x -> length(x) > 0)) AS word
        |  FROM documents),
        |dc AS (SELECT doc_id, word, COUNT(*) AS c FROM w GROUP BY doc_id, word),
        |vocab AS (SELECT word, SUM(c) AS cnt FROM dc GROUP BY word),
        |tot AS (SELECT SUM(cnt) AS t FROM vocab)
        |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |  ROUND(-SUM(c * log2(cnt / t)) / SUM(c), 4) AS xent_bits
        |FROM dc JOIN vocab USING (word) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q59_decontam" ->
      """WITH w AS (
        |  SELECT doc_id, source, filter(split(lower(text), '[^a-z]+'),
        |                                x -> length(x) > 0) AS words
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, source, explode(transform(sequence(1, size(words) - 2),
        |    i -> concat_ws(' ', element_at(words, i), element_at(words, i + 1),
        |                   element_at(words, i + 2)))) AS sh
        |  FROM w WHERE size(words) >= 3),
        |bench AS (SELECT DISTINCT sh FROM g WHERE source = 'src0'),
        |train AS (SELECT DISTINCT doc_id, sh FROM g WHERE source <> 'src0'),
        |m AS (SELECT t.doc_id, CASE WHEN b.sh IS NULL THEN 0 ELSE 1 END AS hit
        |      FROM train t LEFT JOIN bench b ON t.sh = b.sh)
        |SELECT doc_id, COUNT(*) AS n_shingles, CAST(SUM(hit) AS BIGINT) AS n_hit,
        |  ROUND(CAST(SUM(hit) AS DOUBLE) / COUNT(*), 4) AS contam_frac,
        |  CAST(CASE WHEN CAST(SUM(hit) AS DOUBLE) / COUNT(*) >= 0.5
        |       THEN 1 ELSE 0 END AS BIGINT) AS flagged
        |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q60_bm25" ->
      """WITH per AS (
        |  SELECT doc_id,
        |    CAST(size(words) AS BIGINT) AS len,
        |    CAST(size(filter(words, w -> w = 'spark')) AS BIGINT) AS tf_spark,
        |    CAST(size(filter(words, w -> w = 'join')) AS BIGINT) AS tf_join,
        |    CAST(size(filter(words, w -> w = 'table')) AS BIGINT) AS tf_table
        |  FROM (SELECT doc_id, filter(split(lower(text), '[^a-z]+'),
        |                              x -> length(x) > 0) AS words
        |        FROM documents) t),
        |stats AS (SELECT
        |    COUNT(CASE WHEN len > 0 THEN 1 END) AS n,
        |    AVG(CASE WHEN len > 0 THEN len END) AS avgdl,
        |    SUM(CASE WHEN tf_spark > 0 THEN 1 ELSE 0 END) AS df_spark,
        |    SUM(CASE WHEN tf_join > 0 THEN 1 ELSE 0 END) AS df_join,
        |    SUM(CASE WHEN tf_table > 0 THEN 1 ELSE 0 END) AS df_table
        |  FROM per)
        |SELECT doc_id, ROUND(
        |    ln((n - df_spark + 0.5) / (df_spark + 0.5) + 1) * tf_spark * 2.2
        |      / (tf_spark + 1.2 * (0.25 + 0.75 * len / avgdl))
        |  + ln((n - df_join + 0.5) / (df_join + 0.5) + 1) * tf_join * 2.2
        |      / (tf_join + 1.2 * (0.25 + 0.75 * len / avgdl))
        |  + ln((n - df_table + 0.5) / (df_table + 0.5) + 1) * tf_table * 2.2
        |      / (tf_table + 1.2 * (0.25 + 0.75 * len / avgdl)), 4) AS bm25
        |FROM per CROSS JOIN stats
        |WHERE tf_spark + tf_join + tf_table > 0
        |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin,
    "q61_length_outliers" ->
      """WITH b AS (
        |  SELECT lang, percentile(n_chars, 0.05) AS lo_raw,
        |         percentile(n_chars, 0.95) AS hi_raw
        |  FROM documents GROUP BY lang)
        |SELECT doc_id, d.lang, n_chars,
        |  ROUND(lo_raw, 2) AS lo, ROUND(hi_raw, 2) AS hi,
        |  CAST(CASE WHEN n_chars < lo_raw OR n_chars > hi_raw THEN 1 ELSE 0 END
        |       AS BIGINT) AS outlier
        |FROM documents d JOIN b ON d.lang = b.lang
        |ORDER BY doc_id""".stripMargin,
    "q62_funnel" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
        |         WHEN 'purchase' THEN 3 ELSE 0 END AS BIGINT) AS code
        |  FROM events),
        |l AS (SELECT user_id,
        |        sort_array(collect_list(struct(ts, event_id, code))) AS evs
        |      FROM e GROUP BY user_id)
        |SELECT user_id,
        |  aggregate(transform(evs, x -> x.code), CAST(0 AS BIGINT),
        |    (acc, x) -> CASE WHEN x = acc + 1 THEN acc + 1 ELSE acc END)
        |    AS funnel_depth
        |FROM l ORDER BY user_id""".stripMargin,
    "q65_incremental_dedup" ->
      """SELECT n.doc_id, n.n_chars
        |FROM documents n
        |WHERE n.doc_id % 5 = 4
        |  AND NOT EXISTS (SELECT 1 FROM documents e
        |                  WHERE e.doc_id % 5 <> 4 AND e.text = n.text)
        |ORDER BY n.doc_id""".stripMargin,
    "q66_first_positions" ->
      """WITH w AS (
        |  SELECT doc_id, filter(split(lower(text), '[^a-z]+'),
        |                        x -> length(x) > 0) AS words
        |  FROM documents WHERE doc_id < 50)
        |SELECT doc_id, word, CAST(MIN(pos0 + 1) AS BIGINT) AS first_pos
        |FROM w LATERAL VIEW posexplode(words) p AS pos0, word
        |GROUP BY doc_id, word
        |ORDER BY doc_id, word""".stripMargin,
    "q68_term_vectors" ->
      """WITH w AS (
        |  SELECT source, explode(filter(split(lower(text), '[^a-z]+'),
        |                                x -> length(x) > 0)) AS word
        |  FROM documents),
        |c AS (SELECT source, word, COUNT(*) AS cnt FROM w GROUP BY source, word),
        |r AS (SELECT source, word, cnt,
        |      ROW_NUMBER() OVER (PARTITION BY source
        |                         ORDER BY cnt DESC, word) AS rn
        |      FROM c)
        |SELECT source, word, cnt, CAST(rn AS BIGINT) AS rn FROM r WHERE rn <= 5
        |ORDER BY source, rn""".stripMargin,
    "q73_approx_percentiles" ->
      """SELECT o_orderpriority,
        |  ROUND(element_at(ps, 1), 2) AS p25, ROUND(element_at(ps, 2), 2) AS p50,
        |  ROUND(element_at(ps, 3), 2) AS p75, ROUND(element_at(ps, 4), 2) AS p90
        |FROM (SELECT o_orderpriority,
        |        approx_percentile(o_totalprice,
        |                          array(0.25D, 0.50D, 0.75D, 0.90D), 10000) AS ps
        |      FROM orders GROUP BY o_orderpriority) t
        |ORDER BY o_orderpriority""".stripMargin,
    // q76/q77: the rank-join ALGORITHM as one statement — quantile
    // boundaries inlined via an approx_percentile CTE instead of the
    // builder's driver-side approxQuantile. The output is invariant to
    // the bucketing (buckets only partition the running windows; counts
    // and sums are exact whatever the boundaries), so text == builder
    // holds even though the two sketches pick different split points.
    "q76_theta_rank_join" ->
      """WITH bounds AS (
        |  SELECT approx_percentile(CAST(s_acctbal AS DOUBLE),
        |           array(0.125D, 0.25D, 0.375D, 0.5D, 0.625D, 0.75D, 0.875D),
        |           10000) AS bs
        |  FROM supplier),
        |u AS (
        |  SELECT p_partkey AS k, CAST(p_retailprice AS DOUBLE) AS v, 0 AS is_r
        |  FROM part
        |  UNION ALL
        |  SELECT CAST(NULL AS BIGINT), CAST(s_acctbal AS DOUBLE), 1 FROM supplier),
        |ub AS (SELECT k, v, is_r, size(filter(b.bs, x -> x < v)) AS bucket
        |       FROM u CROSS JOIN bounds b),
        |dense AS (
        |  SELECT bid.bucket, COALESCE(pb.in_bucket, CAST(0 AS BIGINT)) AS in_bucket
        |  FROM (SELECT explode(sequence(0, 7)) AS bucket) bid
        |  LEFT JOIN (SELECT bucket, COUNT(*) AS in_bucket FROM ub WHERE is_r = 1
        |             GROUP BY bucket) pb ON pb.bucket = bid.bucket),
        |pfx AS (
        |  SELECT bucket, COALESCE(SUM(in_bucket) OVER (ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |    CAST(0 AS BIGINT)) AS prefix
        |  FROM dense),
        |run AS (
        |  SELECT k, is_r, bucket,
        |    SUM(is_r) OVER (PARTITION BY bucket ORDER BY v, is_r
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS below
        |  FROM ub)
        |SELECT k AS p_partkey, prefix + below AS cnt
        |FROM run JOIN pfx ON run.bucket = pfx.bucket
        |WHERE is_r = 0 AND prefix + below > 0
        |ORDER BY p_partkey""".stripMargin,
    "q77_theta_agg_join" ->
      """WITH bounds AS (
        |  SELECT approx_percentile(CAST(s_acctbal AS DOUBLE),
        |           array(0.125D, 0.25D, 0.375D, 0.5D, 0.625D, 0.75D, 0.875D),
        |           10000) AS bs
        |  FROM supplier),
        |u AS (
        |  SELECT p_partkey AS k, CAST(p_retailprice AS DOUBLE) AS v, 0 AS is_r,
        |    CAST(NULL AS BIGINT) AS sv
        |  FROM part
        |  UNION ALL
        |  SELECT CAST(NULL AS BIGINT), CAST(s_acctbal AS DOUBLE), 1,
        |    CAST(round(s_acctbal * 100) AS BIGINT)
        |  FROM supplier),
        |ub AS (SELECT k, v, is_r, sv, size(filter(b.bs, x -> x < v)) AS bucket
        |       FROM u CROSS JOIN bounds b),
        |dense AS (
        |  SELECT bid.bucket, COALESCE(pb.in_bucket, CAST(0 AS BIGINT)) AS in_bucket,
        |    pb.sum_in
        |  FROM (SELECT explode(sequence(0, 7)) AS bucket) bid
        |  LEFT JOIN (SELECT bucket, COUNT(*) AS in_bucket, SUM(sv) AS sum_in
        |             FROM ub WHERE is_r = 1 GROUP BY bucket) pb
        |    ON pb.bucket = bid.bucket),
        |pfx AS (
        |  SELECT bucket,
        |    COALESCE(SUM(in_bucket) OVER (ORDER BY bucket
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |      CAST(0 AS BIGINT)) AS prefix,
        |    SUM(sum_in) OVER (ORDER BY bucket
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS sprefix
        |  FROM dense),
        |run AS (
        |  SELECT k, is_r, bucket,
        |    SUM(is_r) OVER w AS below,
        |    SUM(sv) OVER w AS sum_below
        |  FROM ub
        |  WINDOW w AS (PARTITION BY bucket ORDER BY v, is_r
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT k AS p_partkey, prefix + below AS cnt,
        |  COALESCE(sprefix, CAST(0 AS BIGINT)) +
        |    COALESCE(sum_below, CAST(0 AS BIGINT)) AS sum_cents,
        |  ROUND((COALESCE(sprefix, CAST(0 AS BIGINT)) +
        |         COALESCE(sum_below, CAST(0 AS BIGINT))) / 100.0
        |        / (prefix + below), 2) AS avg_bal
        |FROM run JOIN pfx ON run.bucket = pfx.bucket
        |WHERE is_r = 0 AND prefix + below > 0
        |ORDER BY p_partkey""".stripMargin,
    // q78: the inclusive (>=) + MIN/MAX variant — ties count, so the
    // running window sorts right rows BEFORE left at equal values
    // (ORDER BY v, is_r DESC), and min/max prefixes ride the same
    // densified bucket table.
    "q78_theta_band_join" ->
      """WITH bounds AS (
        |  SELECT approx_percentile(CAST(s_acctbal AS DOUBLE),
        |           array(0.125D, 0.25D, 0.375D, 0.5D, 0.625D, 0.75D, 0.875D),
        |           10000) AS bs
        |  FROM supplier),
        |u AS (
        |  SELECT p_partkey AS k, CAST(p_retailprice AS DOUBLE) AS v, 0 AS is_r,
        |    CAST(NULL AS BIGINT) AS sv
        |  FROM part
        |  UNION ALL
        |  SELECT CAST(NULL AS BIGINT), CAST(s_acctbal AS DOUBLE), 1,
        |    CAST(round(s_acctbal * 100) AS BIGINT)
        |  FROM supplier),
        |ub AS (SELECT k, v, is_r, sv, size(filter(b.bs, x -> x < v)) AS bucket
        |       FROM u CROSS JOIN bounds b),
        |dense AS (
        |  SELECT bid.bucket, COALESCE(pb.in_bucket, CAST(0 AS BIGINT)) AS in_bucket,
        |    pb.sum_in, pb.min_in, pb.max_in
        |  FROM (SELECT explode(sequence(0, 7)) AS bucket) bid
        |  LEFT JOIN (SELECT bucket, COUNT(*) AS in_bucket, SUM(sv) AS sum_in,
        |                    MIN(sv) AS min_in, MAX(sv) AS max_in
        |             FROM ub WHERE is_r = 1 GROUP BY bucket) pb
        |    ON pb.bucket = bid.bucket),
        |pfx AS (
        |  SELECT bucket,
        |    COALESCE(SUM(in_bucket) OVER wp, CAST(0 AS BIGINT)) AS prefix,
        |    SUM(sum_in) OVER wp AS sprefix,
        |    MIN(min_in) OVER wp AS mprefix,
        |    MAX(max_in) OVER wp AS xprefix
        |  FROM dense
        |  WINDOW wp AS (ORDER BY bucket
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |run AS (
        |  SELECT k, is_r, bucket,
        |    SUM(is_r) OVER w AS below,
        |    SUM(sv) OVER w AS sum_below,
        |    MIN(sv) OVER w AS min_below,
        |    MAX(sv) OVER w AS max_below
        |  FROM ub
        |  WINDOW w AS (PARTITION BY bucket ORDER BY v, is_r DESC
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT k AS p_partkey, prefix + below AS cnt,
        |  COALESCE(sprefix, CAST(0 AS BIGINT)) +
        |    COALESCE(sum_below, CAST(0 AS BIGINT)) AS sum_cents,
        |  LEAST(COALESCE(mprefix, min_below), COALESCE(min_below, mprefix))
        |    AS min_cents,
        |  GREATEST(COALESCE(xprefix, max_below), COALESCE(max_below, xprefix))
        |    AS max_cents
        |FROM run JOIN pfx ON run.bucket = pfx.bucket
        |WHERE is_r = 0 AND prefix + below > 0
        |ORDER BY p_partkey""".stripMargin,
    "q79_corpus_shuffle" ->
      """WITH h AS (SELECT doc_id, poly_hash(text, 29) AS skey FROM documents)
        |SELECT doc_id, skey, CAST(skey % 8 AS BIGINT) AS shard,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY skey % 8
        |                          ORDER BY skey, doc_id) AS BIGINT) AS pos
        |FROM h ORDER BY shard, pos""".stripMargin,
    "q80_weighted_mix" ->
      """WITH h AS (SELECT lang, doc_id, poly_hash(text, 17) AS hk
        |           FROM documents),
        |r AS (SELECT lang, doc_id, hk,
        |      ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hk, doc_id) AS rn,
        |      COUNT(*) OVER (PARTITION BY lang) AS total
        |      FROM h)
        |SELECT lang, doc_id, CAST(rn AS BIGINT) AS rn FROM r
        |WHERE rn <= CEIL(total * (CASE WHEN lang = 'en' THEN 0.5 ELSE 0.25 END))
        |ORDER BY lang, rn""".stripMargin,
    "q81_pii_scrub" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    CONCAT(text,
        |      CASE WHEN doc_id % 2 = 0
        |        THEN CONCAT(' Contact user', doc_id, '@', source,
        |                    '.example.com now.')
        |        ELSE '' END,
        |      CASE WHEN doc_id % 3 = 0
        |        THEN CONCAT(' Call 555-',
        |                    lpad(CAST(doc_id % 10000 AS STRING), 4, '0'),
        |                    ' today.')
        |        ELSE '' END) AS raw
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(regexp_count(raw, '[a-z0-9._%]+@[a-z0-9.-]+[.][a-z]+') AS BIGINT)
        |    AS n_emails,
        |  CAST(regexp_count(raw, '555-[0-9]{4}') AS BIGINT) AS n_phones,
        |  regexp_replace(
        |    regexp_replace(raw, '[a-z0-9._%]+@[a-z0-9.-]+[.][a-z]+', '<EMAIL>'),
        |    '555-[0-9]{4}', '<PHONE>') AS scrubbed
        |FROM raw ORDER BY doc_id""".stripMargin,
    "q82_url_extract" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    CONCAT(text, ' See https://', source, '.example.com/d/', doc_id,
        |      CASE WHEN doc_id % 5 = 0
        |        THEN CONCAT(' and http://mirror.example.org/x/', doc_id,
        |                    '?ref=ab')
        |        ELSE '' END, ' ok.') AS raw
        |  FROM documents),
        |u AS (
        |  SELECT doc_id,
        |    explode(regexp_extract_all(raw,
        |      'https?://[a-z0-9./?=_-]+[a-z0-9/]', 0)) AS url
        |  FROM raw)
        |SELECT doc_id, url,
        |  regexp_extract(url, 'https?://([a-z0-9.-]+)/', 1) AS host,
        |  regexp_extract(url, '^(https?)', 1) AS scheme
        |FROM u ORDER BY doc_id, url""".stripMargin,
    "q83_dup_spans" ->
      """WITH g AS (
        |  SELECT doc_id, CAST(pos AS BIGINT) AS pos, shingle
        |  FROM documents
        |  LATERAL VIEW posexplode(word_ngrams(text, 8)) t AS pos, shingle),
        |f AS (
        |  SELECT shingle FROM g GROUP BY shingle
        |  HAVING COUNT(DISTINCT doc_id) >= 2),
        |h AS (SELECT g.doc_id, g.pos FROM g JOIN f USING (shingle)),
        |b AS (
        |  SELECT doc_id, pos,
        |    CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 8
        |         THEN 1 ELSE 0 END AS brk
        |  FROM h),
        |s AS (
        |  SELECT doc_id, pos,
        |    SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS island
        |  FROM b)
        |SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + 7 AS span_end,
        |  COUNT(*) AS n_shingles
        |FROM s GROUP BY doc_id, island
        |ORDER BY doc_id, span_start""".stripMargin,
    "q84_span_cut" ->
      """WITH g AS (
        |  SELECT doc_id, CAST(pos AS BIGINT) AS pos, shingle
        |  FROM documents
        |  LATERAL VIEW posexplode(word_ngrams(text, 8)) t AS pos, shingle),
        |f AS (
        |  SELECT shingle FROM g GROUP BY shingle
        |  HAVING COUNT(DISTINCT doc_id) >= 2),
        |h AS (SELECT g.doc_id, g.pos FROM g JOIN f USING (shingle)),
        |c AS (
        |  SELECT doc_id, collect_set(cp) AS covered
        |  FROM (SELECT doc_id, explode(sequence(pos, pos + 7)) AS cp FROM h)
        |  GROUP BY doc_id),
        |w AS (
        |  SELECT doc_id,
        |    filter(split(lower(text), '[^a-z]+'), x -> length(x) > 0)
        |      AS words
        |  FROM documents),
        |j AS (
        |  SELECT w.doc_id, w.words,
        |    filter(w.words, (x, i) -> NOT array_contains(
        |      coalesce(c.covered, CAST(array() AS ARRAY<BIGINT>)),
        |      CAST(i AS BIGINT))) AS kept
        |  FROM w LEFT JOIN c ON w.doc_id = c.doc_id)
        |SELECT doc_id, CAST(size(words) AS BIGINT) AS n_words,
        |  CAST(size(words) - size(kept) AS BIGINT) AS n_cut,
        |  concat_ws(' ', kept) AS cleaned
        |FROM j ORDER BY doc_id""".stripMargin,
    // q85/q86 exercise Spark's native PIVOT / UNPIVOT grammar — the
    // parser path the DataFrame builders (pivot()/unpivot()) skip.
    "q85_pivot" ->
      """WITH base AS (
        |  SELECT n_name, YEAR(o_orderdate) AS yr,
        |         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |              JOIN nation ON c_nationkey = n_nationkey)
        |SELECT n_name, COALESCE(y1995, 0L) AS y1995,
        |  COALESCE(y1996, 0L) AS y1996, COALESCE(y1997, 0L) AS y1997,
        |  COALESCE(y1998, 0L) AS y1998
        |FROM base
        |PIVOT (SUM(cents) FOR yr IN (1995 AS y1995, 1996 AS y1996,
        |                             1997 AS y1997, 1998 AS y1998))
        |ORDER BY n_name""".stripMargin,
    "q86_unpivot" ->
      """SELECT l_returnflag, metric, value FROM (
        |  SELECT l_returnflag,
        |    SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS qty_cents,
        |    SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS price_cents,
        |    SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS disc_cents
        |  FROM lineitem GROUP BY l_returnflag)
        |UNPIVOT (value FOR metric IN (qty_cents, price_cents, disc_cents))
        |ORDER BY l_returnflag, metric""".stripMargin,
    // q89's generated shift/and/or interleave is the SAME text the
    // DuckDB oracle runs — Spark 4 parses the `>>`/`<<` operators, so
    // one string serves both engines (bit-for-bit, per the oracle hash).
    "q89_zorder" ->
      s"""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  CAST(${graft.operators.Layout.zValueSql(
               Seq("l_partkey", "l_suppkey"), 20)} AS BIGINT)
        |    AS zval
        |FROM lineitem
        |ORDER BY zval, l_orderkey, l_linenumber""".stripMargin,
    "q90_merge_upsert" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k,
        |         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |chg AS (
        |  SELECT k, cents + 500 AS cents, 'U' AS op FROM base WHERE k % 7 = 0
        |  UNION ALL
        |  SELECT k + 10000000 AS k, cents, 'I' AS op FROM base WHERE k % 11 = 0),
        |kept AS (
        |  SELECT b.k, b.cents, 'B' AS op FROM base b
        |  WHERE NOT EXISTS (SELECT 1 FROM chg c WHERE c.k = b.k))
        |SELECT k, cents, op FROM chg
        |UNION ALL SELECT k, cents, op FROM kept
        |ORDER BY k, op""".stripMargin,
    "q91_gapfill" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(date_trunc('DAY', ts) AS DATE) AS day,
        |         SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
        |  FROM events GROUP BY 1, 2),
        |spine AS (
        |  SELECT user_id, explode(sequence(d0, d1)) AS day
        |  FROM (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
        |        FROM daily GROUP BY user_id) s),
        |f AS (
        |  SELECT s.user_id, s.day, d.cents,
        |    SUM(CASE WHEN d.cents IS NULL THEN 0 ELSE 1 END)
        |      OVER (PARTITION BY s.user_id ORDER BY s.day) AS grp
        |  FROM spine s LEFT JOIN daily d
        |    ON s.user_id = d.user_id AND s.day = d.day)
        |SELECT user_id, date_format(day, 'yyyy-MM-dd') AS day,
        |  CAST(CASE WHEN cents IS NULL THEN 0 ELSE 1 END AS BIGINT) AS observed,
        |  MAX(cents) OVER (PARTITION BY user_id, grp) AS filled_cents
        |FROM f ORDER BY user_id, day""".stripMargin,
    "q92_fuzzy_join" ->
      """WITH c AS (
        |  SELECT c_custkey AS id, c_name AS name
        |  FROM customer WHERE c_custkey < 1000),
        |keyed AS (
        |  SELECT id, name, explode(array_union(array(name),
        |    transform(sequence(0, length(name) - 1),
        |      i -> concat(substring(name, 1, i), substring(name, i + 2)))))
        |    AS k
        |  FROM c),
        |cand AS (
        |  SELECT DISTINCT x.id AS a, x.name AS an, y.id AS b, y.name AS bn
        |  FROM keyed x JOIN keyed y ON x.k = y.k AND x.id < y.id)
        |SELECT a, b, CAST(levenshtein(an, bn) AS BIGINT) AS lev
        |FROM cand WHERE levenshtein(an, bn) <= 1
        |ORDER BY a, b""".stripMargin,
    // q93 has no SQL text: the bloom build is a DataFrame-surface stat op
    // (DataFrameStatFunctions.bloomFilter); its SQL-expressible twin is
    // q59's text, already in the `sql` map.
    // q94's SQL text is the flat declarative window — Catalyst plans it as
    // ONE global window (the single-partition shape); the builder's
    // sharded two-level prefix sum is the scale path. Result-equal by
    // associativity, which is exactly what the parity pin proves.
    "q94_token_pack" ->
      s"""WITH $TokensCte,
        |t AS (
        |  SELECT d.doc_id,
        |    CAST(COALESCE(COUNT(tokens.word), 0) AS BIGINT) AS n_tok
        |  FROM documents d LEFT JOIN tokens ON d.doc_id = tokens.doc_id
        |  GROUP BY d.doc_id),
        |c AS (
        |  SELECT doc_id, n_tok,
        |    COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS start_tok
        |  FROM t)
        |SELECT doc_id, n_tok, start_tok,
        |  start_tok DIV 256 AS pack_id,
        |  CASE WHEN n_tok = 0 THEN 0
        |       ELSE (start_tok + n_tok - 1) DIV 256 - start_tok DIV 256 + 1
        |  END AS n_packs
        |FROM c ORDER BY doc_id""".stripMargin,
    // q95's moment aggregates share names across Spark and DuckDB — the
    // oracle text IS valid Spark SQL, reused verbatim.
    "q95_stats_agg" ->
      """SELECT l_returnflag,
        |  ROUND(corr(l_quantity, l_extendedprice), 4) AS r,
        |  ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS cov,
        |  ROUND(stddev_samp(l_quantity), 4) AS sd_qty,
        |  ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |  ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS icept
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q96_cdc_compact" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k,
        |         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |log AS (
        |  SELECT k, cents + seq * 100 AS cents, seq,
        |    CASE WHEN k % 15 = 0 AND seq = (k DIV 5) % 3 + 1
        |         THEN 'D' ELSE 'U' END AS op
        |  FROM (SELECT k, cents,
        |          explode(sequence(CAST(1 AS BIGINT), (k DIV 5) % 3 + 1)) AS seq
        |        FROM base WHERE k % 5 = 0) v),
        |latest AS (
        |  SELECT k, cents, seq, op,
        |    ROW_NUMBER() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
        |  FROM log),
        |applied AS (
        |  SELECT k, cents, seq AS last_seq FROM latest
        |  WHERE rn = 1 AND op <> 'D'),
        |kept AS (
        |  SELECT b.k, b.cents, CAST(0 AS BIGINT) AS last_seq FROM base b
        |  WHERE NOT EXISTS (SELECT 1 FROM log l WHERE l.k = b.k))
        |SELECT k, cents, last_seq FROM applied
        |UNION ALL SELECT k, cents, last_seq FROM kept
        |ORDER BY k""".stripMargin,
    // q98's SQL text is the DECLARATIVE theta form (BETWEEN join) — at
    // fixture scale Catalyst broadcasts it; the builder's bucketize
    // rewrite is the 100 TB path. Result-equal is the parity pin.
    "q98_interval_join" ->
      """WITH iv AS (
        |  SELECT u.user_id, s.lo, s.lo + 5 AS hi
        |  FROM (SELECT DISTINCT user_id FROM events) u
        |  CROSS JOIN (SELECT 1 + 4 * k AS lo
        |              FROM (SELECT explode(sequence(0, 7)) AS k)) s),
        |e AS (
        |  SELECT user_id, CAST(date_part('DAY', ts) AS BIGINT) AS day,
        |         CAST(ROUND(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |m AS (
        |  SELECT e.user_id, iv.lo, e.cents
        |  FROM e JOIN iv ON e.user_id = iv.user_id
        |              AND e.day BETWEEN iv.lo AND iv.hi)
        |SELECT user_id, CAST(lo AS BIGINT) AS win_start,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(cents) AS BIGINT) AS cents
        |FROM m GROUP BY user_id, lo
        |ORDER BY user_id, win_start""".stripMargin,
    // q99 through the SQL-registered native poly_hash (the DuckDB text
    // spells the same fold as a list_reduce).
    "q99_table_checksum" ->
      """SELECT source, COUNT(*) AS n,
        |  CAST(SUM(poly_hash(text, 41)) AS BIGINT) AS sum_ck,
        |  CAST(BIT_XOR(poly_hash(text, 41)) AS BIGINT) AS xor_ck
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    // q100's SQL text is the DECLARATIVE shared-token join (the hot-token
    // blowup shape); the builder's prefix filter is the lossless 100 TB
    // rewrite — result equality is exactly the losslessness claim.
    "q100_setsim_join" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    filter(split(lower(text), '[^a-z]+'), x -> length(x) > 0)
        |      AS words
        |  FROM documents),
        |g AS (
        |  SELECT DISTINCT doc_id, sh FROM (
        |    SELECT doc_id, explode(transform(sequence(1, size(words) - 2),
        |      i -> concat_ws(' ', element_at(words, i), element_at(words, i + 1),
        |                     element_at(words, i + 2)))) AS sh
        |    FROM w WHERE size(words) >= 3) e),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY doc_id),
        |inter AS (
        |  SELECT x.doc_id AS a, y.doc_id AS b, CAST(COUNT(*) AS BIGINT) AS inter
        |  FROM g x JOIN g y ON x.sh = y.sh AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2)
        |SELECT a, b, inter,
        |  ROUND(CAST(inter AS DOUBLE) / (sa.n + sb.n - inter), 4) AS j
        |FROM inter JOIN sz sa ON a = sa.doc_id JOIN sz sb ON b = sb.doc_id
        |WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.6
        |ORDER BY a, b""".stripMargin,
    // q101's SQL text is the from-scratch recompute (the oracle text,
    // valid Spark SQL verbatim); the builder maintains the aggregate
    // incrementally — parity IS the maintenance-correctness claim.
    "q101_incremental_agg" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents,
        |  ROUND(CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE)
        |        / COUNT(*), 4) AS avg_cents
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q102_chunk_overlap" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    filter(split(lower(text), '[^a-z]+'), x -> length(x) > 0) AS toks
        |  FROM documents),
        |nz AS (SELECT doc_id, toks, size(toks) AS n FROM w WHERE size(toks) > 0)
        |SELECT doc_id, CAST(pos AS BIGINT) AS chunk_id,
        |  CAST(least(20, n - start) AS BIGINT) AS n_tok,
        |  concat_ws(' ', slice(toks, start + 1, 20)) AS chunk
        |FROM nz LATERAL VIEW posexplode(sequence(0, n - 1, 10)) p AS pos, start
        |ORDER BY doc_id, chunk_id""".stripMargin,
    "q103_kl_divergence" ->
      """WITH stok AS (
        |  SELECT source, word FROM (
        |    SELECT source, explode(split(lower(text), '[^a-z]+')) AS word
        |    FROM documents) t WHERE length(word) > 0),
        |sc AS (SELECT source, word, COUNT(*) AS c FROM stok GROUP BY source, word),
        |st AS (SELECT source, SUM(c) AS n FROM sc GROUP BY source),
        |g AS (SELECT word, SUM(c) AS gc FROM sc GROUP BY word),
        |t AS (SELECT SUM(c) AS tn FROM sc)
        |SELECT sc.source, CAST(st.n AS BIGINT) AS n_tok,
        |  ROUND(SUM((CAST(sc.c AS DOUBLE) / st.n) *
        |            ln((CAST(sc.c AS DOUBLE) / st.n) /
        |               (CAST(g.gc AS DOUBLE) / t.tn))), 4) AS kl
        |FROM sc JOIN st ON sc.source = st.source
        |        JOIN g ON sc.word = g.word CROSS JOIN t
        |GROUP BY sc.source, st.n ORDER BY sc.source""".stripMargin,
    "q104_fuzzy_join_lev2" ->
      """WITH c AS (
        |  SELECT c_custkey AS id, c_name AS name
        |  FROM customer WHERE c_custkey < 1000),
        |d1 AS (
        |  SELECT id, name, array_union(array(name),
        |    transform(sequence(0, length(name) - 1),
        |      i -> concat(substring(name, 1, i), substring(name, i + 2)))) AS vs
        |  FROM c),
        |keyed AS (
        |  SELECT id, name, explode(array_distinct(concat(vs,
        |    flatten(transform(vs, v ->
        |      transform(sequence(0, length(v) - 1),
        |        i -> concat(substring(v, 1, i), substring(v, i + 2)))))))) AS k
        |  FROM d1),
        |cand AS (
        |  SELECT DISTINCT x.id AS a, x.name AS an, y.id AS b, y.name AS bn
        |  FROM keyed x JOIN keyed y ON x.k = y.k AND x.id < y.id)
        |SELECT a, b, CAST(levenshtein(an, bn) AS BIGINT) AS lev
        |FROM cand WHERE levenshtein(an, bn) <= 2
        |ORDER BY a, b""".stripMargin,
    // q105: the multi-column COUNT(DISTINCT) statement verbatim —
    // Catalyst's Expand rewrite keeps it at 2 exchanges however many
    // columns are profiled.
    "q105_profile" ->
      """WITH p AS (
        |  SELECT 'l_returnflag' AS col_name, COUNT(*) AS n_rows,
        |    CAST(COUNT(*) - COUNT(l_returnflag) AS BIGINT) AS n_null,
        |    COUNT(DISTINCT l_returnflag) AS ndv,
        |    CAST(MIN(l_returnflag) AS STRING) AS min_val,
        |    CAST(MAX(l_returnflag) AS STRING) AS max_val
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_linestatus', COUNT(*),
        |    CAST(COUNT(*) - COUNT(l_linestatus) AS BIGINT),
        |    COUNT(DISTINCT l_linestatus),
        |    CAST(MIN(l_linestatus) AS STRING), CAST(MAX(l_linestatus) AS STRING)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_quantity', COUNT(*),
        |    CAST(COUNT(*) - COUNT(l_quantity) AS BIGINT),
        |    COUNT(DISTINCT l_quantity),
        |    CAST(CAST(MIN(l_quantity) AS BIGINT) AS STRING),
        |    CAST(CAST(MAX(l_quantity) AS BIGINT) AS STRING)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_partkey', COUNT(*),
        |    CAST(COUNT(*) - COUNT(l_partkey) AS BIGINT),
        |    COUNT(DISTINCT l_partkey),
        |    CAST(MIN(l_partkey) AS STRING), CAST(MAX(l_partkey) AS STRING)
        |  FROM lineitem)
        |SELECT * FROM p ORDER BY col_name""".stripMargin,
    // NOTE: the SQL text reads lineitem four times; the builder's
    // single-scan wide-agg + explode form is the declared plan. Result
    // equality is the parity pin.
    "q106_retention" ->
      """WITH ev AS (SELECT * FROM events WHERE event_id % 97 = 0),
        |wk AS (SELECT DISTINCT user_id,
        |         to_date(date_trunc('week', ts)) AS wk FROM ev),
        |c AS (SELECT user_id, MIN(wk) AS cohort FROM wk GROUP BY user_id)
        |SELECT date_format(c.cohort, 'yyyy-MM-dd') AS cohort,
        |  CAST(datediff(w.wk, c.cohort) / 7 AS BIGINT) AS week_no,
        |  COUNT(*) AS n_users
        |FROM wk w JOIN c ON w.user_id = c.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q107_transitions" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |    LAG(event_type) OVER (PARTITION BY user_id
        |                          ORDER BY ts, event_id) AS src
        |  FROM events),
        |t AS (SELECT src, event_type AS dst, COUNT(*) AS n
        |      FROM seq WHERE src IS NOT NULL GROUP BY src, dst)
        |SELECT src, dst, n,
        |  ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY src), 4) AS p,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY src
        |                          ORDER BY n DESC, dst) AS BIGINT) AS rk
        |FROM t ORDER BY src, rk""".stripMargin,
    "q108_ohlc" ->
      """WITH e AS (SELECT user_id, to_date(ts) AS day, ts, event_id,
        |      CAST(ROUND(value * 100) AS BIGINT) AS cents FROM events)
        |SELECT user_id, date_format(day, 'yyyy-MM-dd') AS day,
        |  min_by(cents, struct(ts, event_id)) AS open,
        |  MAX(cents) AS high, MIN(cents) AS low,
        |  max_by(cents, struct(ts, event_id)) AS close,
        |  COUNT(*) AS n, SUM(cents) AS volume
        |FROM e GROUP BY user_id, day
        |ORDER BY user_id, day""".stripMargin,
    // q109 through the SQL-registered native poly_hash (as q99).
    "q109_winnow" ->
      """WITH t AS (SELECT doc_id,
        |    regexp_replace(lower(text), '[^a-z]+', '') AS s
        |  FROM documents),
        |g AS (SELECT doc_id, i, poly_hash(substring(s, i, 8), 7) AS h
        |      FROM (SELECT doc_id, s, explode(sequence(1, length(s) - 7)) AS i
        |            FROM t WHERE length(s) >= 8)),
        |w AS (SELECT doc_id, i,
        |        MIN(h) OVER (PARTITION BY doc_id ORDER BY i
        |                     ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
        |        COUNT(*) OVER (PARTITION BY doc_id) AS ng
        |      FROM g),
        |f AS (SELECT DISTINCT doc_id, fp FROM w WHERE i <= ng - 3)
        |SELECT doc_id, COUNT(*) AS n_fp, bit_xor(fp) AS fp_xor,
        |  MIN(fp) AS fp_min, MAX(fp) AS fp_max
        |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q110_bpe_pairs" ->
      """WITH w0 AS (
        |  SELECT word FROM (
        |    SELECT explode(filter(split(lower(text), '[^a-z]+'),
        |                          x -> length(x) > 0)) AS word
        |    FROM documents)
        |  WHERE length(word) >= 2),
        |p AS (SELECT substring(word, i, 2) AS pair
        |      FROM (SELECT word, explode(sequence(1, length(word) - 1)) AS i
        |            FROM w0))
        |SELECT pair, COUNT(*) AS n FROM p GROUP BY pair
        |ORDER BY n DESC, pair LIMIT 100""".stripMargin,
    "q111_histogram" ->
      """WITH e AS (SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        |           FROM orders),
        |k AS (SELECT MIN(cents) AS mn, MAX(cents) AS mx,
        |        CAST(CEIL((MAX(cents) - MIN(cents) + 1) / 20.0) AS BIGINT)
        |          AS width
        |      FROM e),
        |h AS (SELECT CAST(FLOOR((cents - mn) / width) AS BIGINT) AS bucket,
        |             mn, width
        |      FROM e CROSS JOIN k)
        |SELECT bucket, mn + bucket * width AS lo,
        |  mn + (bucket + 1) * width - 1 AS hi, COUNT(*) AS n
        |FROM h GROUP BY bucket, mn, width
        |ORDER BY bucket""".stripMargin,
    "q112_ewma" ->
      // final rounding = the C/DuckDB mirror (Advanced.roundPortable's
      // exact op sequence), NOT Spark ROUND — see roundPortable's
      // scaladoc for the shortest-repr divergence it closes
      """WITH e AS (SELECT user_id, ts, event_id,
        |      CAST(ROUND(value * 100) AS BIGINT) AS cents FROM events),
        |l AS (SELECT user_id,
        |        transform(array_sort(collect_list(struct(ts, event_id, cents))),
        |                  r -> CAST(r.cents AS DOUBLE)) AS vs
        |      FROM e GROUP BY user_id),
        |r AS (SELECT user_id, CAST(size(vs) AS BIGINT) AS n,
        |        aggregate(slice(vs, 2, size(vs)), element_at(vs, 1),
        |                  (acc, x) -> 0.3 * x + 0.7 * acc) AS raw
        |      FROM l)
        |SELECT user_id, n,
        |  SIGN(raw) * (FLOOR(ABS(raw) * 10000.0D) +
        |    CASE WHEN ABS(raw) * 10000.0D - FLOOR(ABS(raw) * 10000.0D) >= 0.5D
        |         THEN 1.0D ELSE 0.0D END) / 10000.0D AS ewma
        |FROM r ORDER BY user_id""".stripMargin,
    "q113_char_entropy" ->
      """WITH t AS (SELECT doc_id,
        |    regexp_replace(lower(text), '[^a-z]+', '') AS s
        |  FROM documents),
        |nz AS (SELECT doc_id, s, CAST(length(s) AS BIGINT) AS n
        |       FROM t WHERE length(s) > 0),
        |cs AS (SELECT doc_id, n,
        |    filter(transform(sequence(0, 25),
        |        i -> length(s) - length(replace(s, char(97 + i), ''))),
        |      x -> x > 0) AS counts
        |  FROM nz)
        |SELECT doc_id, n AS n_char,
        |  ROUND(-aggregate(
        |      transform(counts,
        |        c -> (CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n)),
        |      CAST(0 AS DOUBLE), (acc, x) -> acc + x), 4) AS entropy
        |FROM cs ORDER BY doc_id""".stripMargin,
    // q114's SQL text is the DECLARATIVE shared-token containment join
    // (the hot-token blowup shape, as q100); the builder's one-sided
    // prefix filter is the lossless scale rewrite — result equality is
    // exactly the losslessness claim.
    "q114_contain_join" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    filter(split(lower(text), '[^a-z]+'), x -> length(x) > 0)
        |      AS words
        |  FROM documents),
        |g AS (
        |  SELECT DISTINCT doc_id, sh FROM (
        |    SELECT doc_id, explode(transform(sequence(1, size(words) - 2),
        |      i -> concat_ws(' ', element_at(words, i), element_at(words, i + 1),
        |                     element_at(words, i + 2)))) AS sh
        |    FROM w WHERE size(words) >= 3) e),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY doc_id),
        |inter AS (
        |  SELECT x.doc_id AS a, y.doc_id AS b, CAST(COUNT(*) AS BIGINT) AS inter
        |  FROM g x JOIN g y ON x.sh = y.sh AND x.doc_id <> y.doc_id
        |  GROUP BY 1, 2)
        |SELECT a, b, inter, ROUND(CAST(inter AS DOUBLE) / sa.n, 4) AS c
        |FROM inter JOIN sz sa ON a = sa.doc_id
        |WHERE CAST(inter AS DOUBLE) / sa.n >= 0.8
        |ORDER BY a, b""".stripMargin,
    "q115_rolling_median" ->
      """WITH e AS (SELECT user_id, ts, event_id,
        |      CAST(ROUND(value * 100) AS BIGINT) AS cents FROM events),
        |a AS (SELECT user_id, event_id,
        |        sort_array(collect_list(cents) OVER (
        |          PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS arr
        |      FROM e)
        |SELECT user_id, event_id, CAST(size(arr) AS BIGINT) AS n_win,
        |  CASE WHEN size(arr) % 2 = 1
        |    THEN CAST(element_at(arr, CAST((size(arr) + 1) / 2 AS INT)) AS DOUBLE)
        |    ELSE CAST(element_at(arr, CAST(size(arr) / 2 AS INT)) +
        |              element_at(arr, CAST(size(arr) / 2 + 1 AS INT)) AS DOUBLE) / 2
        |  END AS med
        |FROM a ORDER BY user_id, event_id""".stripMargin,
    // q117's TEXT is the naive id-ordered 3-way self-join — the
    // SQL-expressible semantics; the builder's degree-oriented plan is
    // the skew-proof scale path (Graph.triangleCounts), result-equal.
    "q117_triangles" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |            FROM lineitem),
        |e AS (SELECT DISTINCT x.pk AS a, y.pk AS b
        |      FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk),
        |t AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |      FROM e e1
        |      JOIN e e2 ON e2.a = e1.b
        |      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |n AS (SELECT explode(array(x, y, z)) AS node FROM t)
        |SELECT CAST(node AS BIGINT) AS p_partkey, COUNT(*) AS triangles
        |FROM n GROUP BY node
        |ORDER BY triangles DESC, p_partkey LIMIT 20""".stripMargin,
    "q118_twap" ->
      """WITH e AS (SELECT user_id, ts, event_id,
        |      CAST(ROUND(value * 100) AS BIGINT) AS cents FROM events),
        |w AS (SELECT user_id, cents,
        |        unix_millis(LEAD(ts) OVER (PARTITION BY user_id
        |                                   ORDER BY ts, event_id))
        |          - unix_millis(ts) AS dur
        |      FROM e)
        |SELECT user_id,
        |  CAST(COUNT(1) AS BIGINT) AS n_spans,
        |  CAST(SUM(dur) AS BIGINT) AS total_ms,
        |  ROUND(CAST(SUM(cents * dur) AS DOUBLE) / SUM(dur) / 100, 4) AS twap
        |FROM w WHERE dur IS NOT NULL AND dur > 0
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q119_pmi_collocations" ->
      """WITH t AS (SELECT filter(split(lower(text), '[^a-z]+'),
        |                        x -> length(x) > 0) AS ws
        |           FROM documents),
        |p AS (SELECT e.a, e.b
        |      FROM (SELECT explode(transform(sequence(1, size(ws) - 1),
        |              i -> struct(element_at(ws, i) AS a,
        |                          element_at(ws, CAST(i + 1 AS INT)) AS b))) AS e
        |            FROM t WHERE size(ws) >= 2)),
        |c AS (SELECT a, b, COUNT(1) AS n FROM p GROUP BY a, b),
        |w AS (SELECT a, b, n,
        |        SUM(n) OVER (PARTITION BY a) AS ca,
        |        SUM(n) OVER (PARTITION BY b) AS cb,
        |        SUM(n) OVER () AS nn
        |      FROM c)
        |SELECT a, b, CAST(n AS BIGINT) AS n,
        |  ROUND(ln((CAST(n AS DOUBLE) * CAST(nn AS DOUBLE))
        |           / (CAST(ca AS DOUBLE) * CAST(cb AS DOUBLE))), 4) AS pmi
        |FROM w WHERE n >= 5 ORDER BY a, b""".stripMargin,
    "q120_vocab_coverage" ->
      """WITH tok AS (SELECT explode(filter(split(lower(text), '[^a-z]+'),
        |                                   x -> length(x) > 0)) AS word
        |             FROM documents),
        |u AS (SELECT word, COUNT(1) AS n FROM tok GROUP BY word)
        |SELECT CAST(ROW_NUMBER() OVER (ORDER BY n DESC, word) AS BIGINT) AS rank,
        |  word, CAST(n AS BIGINT) AS n,
        |  ROUND(CAST(SUM(n) OVER (ORDER BY n DESC, word
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |             AS DOUBLE) / SUM(n) OVER (), 6) AS cum_share
        |FROM u ORDER BY rank""".stripMargin,
    "q121_mad_outliers" ->
      """WITH m AS (SELECT source, percentile(n_chars, 0.5) AS med
        |           FROM documents GROUP BY source),
        |d2 AS (SELECT doc_id, d.source, n_chars, med,
        |         ABS(n_chars - med) AS dev
        |       FROM documents d JOIN m ON d.source = m.source),
        |md AS (SELECT source, percentile(dev, 0.5) AS mad
        |       FROM d2 GROUP BY source)
        |SELECT doc_id, d2.source, CAST(n_chars AS BIGINT) AS n_chars,
        |  ROUND(d2.med, 2) AS med, ROUND(mad, 2) AS mad,
        |  CAST(CASE WHEN dev > 3 * mad THEN 1 ELSE 0 END AS BIGINT) AS outlier
        |FROM d2 JOIN md ON d2.source = md.source ORDER BY doc_id""".stripMargin,
    "q122_neardup_matrix" ->
      """WITH tok AS (SELECT doc_id, source,
        |        explode(filter(split(lower(text), '[^a-z]+'),
        |                       x -> length(x) > 0)) AS word
        |      FROM documents),
        |t AS (SELECT DISTINCT doc_id, source, word FROM tok WHERE doc_id < 100),
        |sz AS (SELECT doc_id, COUNT(1) AS n FROM t GROUP BY doc_id),
        |inter AS (SELECT x.doc_id AS a, y.doc_id AS b,
        |            x.source AS sa, y.source AS sb, COUNT(1) AS i
        |          FROM t x JOIN t y ON x.word = y.word AND x.doc_id < y.doc_id
        |          GROUP BY x.doc_id, y.doc_id, x.source, y.source),
        |pairs AS (SELECT sa, sb FROM inter
        |          JOIN sz za ON za.doc_id = inter.a
        |          JOIN sz zb ON zb.doc_id = inter.b
        |          WHERE CAST(i AS DOUBLE) / (za.n + zb.n - i) >= 0.8)
        |SELECT least(sa, sb) AS source_a, greatest(sa, sb) AS source_b,
        |  CAST(COUNT(1) AS BIGINT) AS dup_pairs
        |FROM pairs GROUP BY source_a, source_b
        |ORDER BY source_a, source_b""".stripMargin,
    "q123_snapshot_diff" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k,
        |         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
        |         o_orderstatus AS status
        |  FROM orders),
        |old AS (SELECT * FROM base WHERE k % 7 <> 0),
        |nw AS (SELECT k,
        |         CASE WHEN k % 3 = 0 THEN cents + 999 ELSE cents END AS cents,
        |         status
        |       FROM base WHERE k % 5 <> 0),
        |d AS (SELECT COALESCE(o.k, n.k) AS k,
        |        o.cents AS old_cents, n.cents AS new_cents,
        |        CASE WHEN o.k IS NULL THEN 'added'
        |             WHEN n.k IS NULL THEN 'removed'
        |             WHEN o.cents IS DISTINCT FROM n.cents
        |                  OR o.status IS DISTINCT FROM n.status THEN 'changed'
        |             ELSE 'same' END AS change
        |      FROM old o FULL JOIN nw n ON o.k = n.k)
        |SELECT k, change, old_cents, new_cents
        |FROM d WHERE change <> 'same' ORDER BY k""".stripMargin,
    "q124_skyline" ->
      """WITH base AS (
        |  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
        |         o_orderdate AS d
        |  FROM orders),
        |pts AS (SELECT cents, d, COUNT(1) AS n_orders
        |        FROM base GROUP BY cents, d),
        |w AS (SELECT cents, d, n_orders,
        |        MAX(d) OVER (ORDER BY cents DESC
        |          RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hmax,
        |        MAX(d) OVER (ORDER BY cents DESC
        |          RANGE BETWEEN CURRENT ROW AND CURRENT ROW) AS smax
        |      FROM pts)
        |SELECT cents, d, n_orders FROM w
        |WHERE (hmax IS NULL OR d > hmax) AND d = smax
        |ORDER BY cents DESC""".stripMargin,
    "q125_quantile_binning" ->
      """WITH e AS (SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        |           FROM orders),
        |k AS (SELECT percentile(cents,
        |        array(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)) AS cuts
        |      FROM e),
        |b AS (SELECT CAST(size(filter(cuts, c -> cents > c)) AS BIGINT) AS bin,
        |             cents
        |      FROM e CROSS JOIN k)
        |SELECT bin, COUNT(1) AS n, MIN(cents) AS lo, MAX(cents) AS hi
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin,
    "q126_threshold_curve" ->
      """WITH tok AS (SELECT doc_id,
        |        explode(filter(split(lower(text), '[^a-z]+'),
        |                       x -> length(x) > 0)) AS word
        |      FROM documents),
        |t AS (SELECT DISTINCT doc_id, word FROM tok WHERE doc_id < 100),
        |sz AS (SELECT doc_id, COUNT(1) AS n FROM t GROUP BY doc_id),
        |inter AS (SELECT x.doc_id AS a, y.doc_id AS b, COUNT(1) AS i
        |          FROM t x JOIN t y ON x.word = y.word AND x.doc_id < y.doc_id
        |          GROUP BY x.doc_id, y.doc_id),
        |pairs AS (SELECT ROUND(CAST(i AS DOUBLE) / (za.n + zb.n - i), 4) AS jac
        |          FROM inter
        |          JOIN sz za ON za.doc_id = inter.a
        |          JOIN sz zb ON zb.doc_id = inter.b
        |          WHERE CAST(i AS DOUBLE) / (za.n + zb.n - i) >= 0.5),
        |th AS (SELECT explode(array(50, 55, 60, 65, 70, 75, 80, 85, 90, 95))
        |                AS t)
        |SELECT CAST(t AS BIGINT) AS threshold, COUNT(1) AS n_pairs
        |FROM pairs CROSS JOIN th WHERE jac >= t / 100.0
        |GROUP BY t ORDER BY threshold""".stripMargin,
    // q127 has no SQL text: like q48/q58/q71 it rides the iterative
    // pointer-jump components, which has no fixed-point SQL form here.
    "q128_embed_cov" ->
      """WITH x AS (SELECT vec_id, p + 1 AS i, CAST(e AS DOUBLE) AS v
        |           FROM embeddings LATERAL VIEW posexplode(embedding) AS p, e),
        |n AS (SELECT CAST(COUNT(1) AS DOUBLE) AS n FROM embeddings),
        |m AS (SELECT i, SUM(v) AS s FROM x GROUP BY i),
        |p AS (SELECT a.i AS i, b.i AS j, SUM(a.v * b.v) AS sp
        |      FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
        |      GROUP BY a.i, b.i)
        |SELECT CAST(p.i AS BIGINT) AS i, CAST(p.j AS BIGINT) AS j,
        |  ROUND(sp / n.n - (mi.s / n.n) * (mj.s / n.n), 4) + 0.0 AS cov
        |FROM p JOIN m mi ON mi.i = p.i JOIN m mj ON mj.i = p.j CROSS JOIN n
        |ORDER BY i, j""".stripMargin,
    "q129_fk_audit" ->
      """WITH fk AS (SELECT CASE WHEN o_orderkey % 37 = 0
        |                        THEN o_custkey - 1000000
        |                        ELSE o_custkey END AS k FROM orders),
        |fc AS (SELECT k, COUNT(*) AS cnt FROM fk GROUP BY k),
        |r1 AS (SELECT 'fk_orders_custkey' AS check_name,
        |         CAST(SUM(cnt) AS BIGINT) AS checked,
        |         CAST(COALESCE(SUM(CASE WHEN c.c_custkey IS NULL
        |                                THEN cnt END), 0) AS BIGINT)
        |           AS violations
        |       FROM fc LEFT JOIN customer c ON fc.k = c.c_custkey),
        |u AS (SELECT c_custkey AS k FROM customer
        |      UNION ALL
        |      SELECT c_custkey FROM customer WHERE c_custkey % 41 = 0),
        |uc AS (SELECT k, COUNT(*) AS cnt FROM u GROUP BY k),
        |r2 AS (SELECT 'unique_customer_custkey' AS check_name,
        |         CAST(SUM(cnt) AS BIGINT) AS checked,
        |         CAST(SUM(cnt - 1) AS BIGINT) AS violations FROM uc),
        |r3 AS (SELECT 'notnull_documents_text' AS check_name,
        |         CAST(COUNT(*) AS BIGINT) AS checked,
        |         CAST(SUM(CASE WHEN doc_id % 29 = 0 THEN 1 ELSE 0 END)
        |           AS BIGINT) AS violations
        |       FROM documents)
        |SELECT * FROM r1 UNION ALL SELECT * FROM r2 UNION ALL
        |SELECT * FROM r3 ORDER BY check_name""".stripMargin,
    "q130_acf" ->
      """WITH dc AS (SELECT CAST(ts AS DATE) AS d,
        |             CAST(COUNT(*) AS DOUBLE) AS x
        |           FROM events GROUP BY 1),
        |s AS (SELECT x, ROW_NUMBER() OVER (ORDER BY d) AS i FROM dc),
        |mu AS (SELECT AVG(x) AS mu FROM s),
        |den AS (SELECT SUM((x - mu) * (x - mu)) AS d2
        |        FROM s CROSS JOIN mu),
        |k AS (SELECT explode(sequence(1, 7)) AS lag),
        |num AS (SELECT k.lag, SUM((a.x - mu) * (b.x - mu)) AS nm
        |        FROM k JOIN s a ON a.i > k.lag
        |               JOIN s b ON b.i = a.i - k.lag CROSS JOIN mu
        |        GROUP BY k.lag)
        |SELECT CAST(num.lag AS BIGINT) AS lag, ROUND(nm / d2, 4) AS acf
        |FROM num CROSS JOIN den ORDER BY lag""".stripMargin,
    "q131_cooccur_lift" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |tot AS (SELECT CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS nu
        |        FROM ut),
        |mg AS (SELECT event_type, COUNT(*) AS m FROM ut GROUP BY 1),
        |p AS (SELECT x.event_type AS a, y.event_type AS b,
        |        COUNT(*) AS n_users
        |      FROM ut x JOIN ut y ON x.user_id = y.user_id
        |                        AND x.event_type < y.event_type
        |      GROUP BY 1, 2)
        |SELECT p.a, p.b, CAST(p.n_users AS BIGINT) AS n_users,
        |  ROUND(CAST(p.n_users AS DOUBLE) * nu / (ma.m * mb.m), 4)
        |    AS lift,
        |  ROUND(CAST(p.n_users AS DOUBLE) / (ma.m + mb.m - p.n_users), 4)
        |    AS jaccard
        |FROM p JOIN mg ma ON ma.event_type = p.a
        |       JOIN mg mb ON mb.event_type = p.b CROSS JOIN tot
        |ORDER BY a, b""".stripMargin,
    // q132 has no SQL text: like q48/q127 it rides the iterative
    // pointer-jump components, which has no fixed-point SQL form here.
    "q133_psi_drift" ->
      """WITH e AS (SELECT source, n_chars AS v FROM documents),
        |k AS (SELECT percentile(v, array(0.1, 0.2, 0.3, 0.4, 0.5,
        |                                 0.6, 0.7, 0.8, 0.9)) AS cuts
        |      FROM e),
        |b AS (SELECT source,
        |        CAST(size(filter(cuts, c -> v > c)) AS BIGINT) AS bin
        |      FROM e CROSS JOIN k),
        |sb AS (SELECT source, bin, COUNT(*) AS c FROM b GROUP BY 1, 2),
        |srcs AS (SELECT source, SUM(c) AS ns FROM sb GROUP BY source),
        |bins AS (SELECT explode(sequence(0, 9)) AS bin),
        |cb AS (SELECT bin, SUM(c) AS cnt_b FROM sb GROUP BY bin),
        |tot AS (SELECT SUM(c) AS n FROM sb),
        |grid AS (SELECT s.source, s.ns, bb.bin
        |         FROM srcs s CROSS JOIN bins bb),
        |f AS (SELECT g.source, g.ns, g.bin,
        |        COALESCE(sb.c, 0) AS cs, COALESCE(cb.cnt_b, 0) AS cnt_b
        |      FROM grid g
        |      LEFT JOIN sb ON sb.source = g.source AND sb.bin = g.bin
        |      LEFT JOIN cb ON cb.bin = g.bin)
        |SELECT source, ROUND(SUM(
        |    ((cs + 1.0) / (ns + 10.0) - (cnt_b + 1.0) / (n + 10.0)) *
        |    ln(((cs + 1.0) / (ns + 10.0)) /
        |       ((cnt_b + 1.0) / (n + 10.0)))), 4) AS psi
        |FROM f CROSS JOIN tot GROUP BY source ORDER BY source""".stripMargin,
    "q134_rank_fusion" ->
      s"""WITH $TokensCte,
        |tf AS (SELECT doc_id, COUNT(*) AS s0 FROM tokens
        |       WHERE word IN ('spark', 'join', 'table') GROUP BY doc_id),
        |t50 AS (SELECT doc_id, s0 FROM tf ORDER BY s0 DESC, doc_id LIMIT 50),
        |rb AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY s0 DESC, doc_id)
        |         AS r_terms FROM t50),
        |l50 AS (SELECT doc_id, n_chars FROM documents
        |        ORDER BY n_chars DESC, doc_id LIMIT 50),
        |rq AS (SELECT doc_id,
        |         ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS r_len
        |       FROM l50),
        |f AS (SELECT COALESCE(rb.doc_id, rq.doc_id) AS doc_id,
        |        CAST(rb.r_terms AS BIGINT) AS r_terms,
        |        CAST(rq.r_len AS BIGINT) AS r_len
        |      FROM rb FULL JOIN rq ON rb.doc_id = rq.doc_id)
        |SELECT doc_id, r_terms, r_len,
        |  ROUND(COALESCE(CAST(1.0 AS DOUBLE) / (60 + r_terms), 0) +
        |        COALESCE(CAST(1.0 AS DOUBLE) / (60 + r_len), 0), 4) AS rrf
        |FROM f ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin,
    "q135_quantile_norm" ->
      """WITH v AS (SELECT doc_id, source, n_chars,
        |         ROW_NUMBER() OVER (PARTITION BY source
        |                            ORDER BY n_chars, doc_id) AS rk
        |       FROM documents),
        |m AS (SELECT rk, AVG(CAST(n_chars AS DOUBLE)) AS qv
        |      FROM v GROUP BY rk)
        |SELECT v.doc_id, v.source, v.n_chars, ROUND(m.qv, 4) AS qnorm
        |FROM v JOIN m ON v.rk = m.rk ORDER BY doc_id""".stripMargin,
    "q136_padding_waste" ->
      """WITH t AS (SELECT doc_id,
        |    GREATEST(CAST(size(filter(split(lower(text), '[^a-z]+'),
        |      x -> length(x) > 0)) AS BIGINT), 1) AS n_tok
        |  FROM documents),
        |b AS (SELECT CAST(FLOOR(log2(n_tok)) AS BIGINT) AS bucket, n_tok
        |      FROM t)
        |SELECT bucket, COUNT(*) AS n_docs,
        |  MAX(n_tok) AS max_tok, SUM(n_tok) AS sum_tok,
        |  COUNT(*) * MAX(n_tok) - SUM(n_tok) AS pad_waste,
        |  ROUND(CAST(COUNT(*) * MAX(n_tok) - SUM(n_tok) AS DOUBLE) /
        |        (COUNT(*) * MAX(n_tok)), 4) AS waste_frac
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q137_weighted_sample" ->
      """WITH t AS (SELECT doc_id, n_chars AS w FROM documents),
        |c AS (SELECT doc_id, w,
        |        CAST(COALESCE(SUM(w) OVER (ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS BIGINT) AS cb
        |      FROM t),
        |tot AS (SELECT CAST(SUM(w) AS DOUBLE) / 100 AS step FROM t)
        |SELECT doc_id, w AS weight,
        |  CAST(FLOOR((cb + w) / step) - FLOOR(cb / step) AS BIGINT)
        |    AS n_picks
        |FROM c CROSS JOIN tot
        |WHERE FLOOR((cb + w) / step) - FLOOR(cb / step) > 0
        |ORDER BY doc_id""".stripMargin,
    "q138_kappa" ->
      s"""WITH $TokensCte,
        |sc AS (SELECT doc_id,
        |  SUM(CASE WHEN word IN ('hash','merge') THEN 1 ELSE 0 END) AS c_de,
        |  SUM(CASE WHEN word IN ('the','a') THEN 1 ELSE 0 END) AS c_en,
        |  SUM(CASE WHEN word IN ('data','row') THEN 1 ELSE 0 END) AS c_es,
        |  SUM(CASE WHEN word IN ('query','table') THEN 1 ELSE 0 END) AS c_fr,
        |  SUM(CASE WHEN word IN ('spark','scan') THEN 1 ELSE 0 END) AS c_zh
        |  FROM tokens WHERE doc_id < 100 GROUP BY doc_id),
        |p AS (SELECT doc_id,
        |  CASE WHEN c_de = g THEN 'de' WHEN c_en = g THEN 'en'
        |       WHEN c_es = g THEN 'es' WHEN c_fr = g THEN 'fr'
        |       WHEN c_zh = g THEN 'zh' END AS pred
        |  FROM (SELECT *, GREATEST(c_de, c_en, c_es, c_fr, c_zh) AS g FROM sc) t),
        |j AS (SELECT d.lang, pred FROM p
        |      JOIN documents d ON p.doc_id = d.doc_id),
        |agg AS (SELECT COUNT(*) AS n,
        |  SUM(CASE WHEN lang = pred THEN 1 ELSE 0 END) AS agree,
        |  SUM(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS r_de,
        |  SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS r_en,
        |  SUM(CASE WHEN lang = 'es' THEN 1 ELSE 0 END) AS r_es,
        |  SUM(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS r_fr,
        |  SUM(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS r_zh,
        |  SUM(CASE WHEN pred = 'de' THEN 1 ELSE 0 END) AS k_de,
        |  SUM(CASE WHEN pred = 'en' THEN 1 ELSE 0 END) AS k_en,
        |  SUM(CASE WHEN pred = 'es' THEN 1 ELSE 0 END) AS k_es,
        |  SUM(CASE WHEN pred = 'fr' THEN 1 ELSE 0 END) AS k_fr,
        |  SUM(CASE WHEN pred = 'zh' THEN 1 ELSE 0 END) AS k_zh
        |FROM j),
        |r AS (SELECT n, agree * CAST(1.0 AS DOUBLE) / n AS po,
        |        (r_de * k_de + r_en * k_en + r_es * k_es + r_fr * k_fr +
        |         r_zh * k_zh) * CAST(1.0 AS DOUBLE) / (n * n) AS pe
        |      FROM agg)
        |SELECT CAST(n AS BIGINT) AS n, ROUND(po, 4) AS po,
        |  ROUND(pe, 4) AS pe, ROUND((po - pe) / (1 - pe), 4) AS kappa
        |FROM r""".stripMargin,
    "q140_mixture_alloc" ->
      """WITH t AS (SELECT source,
        |    CAST(SUM(size(filter(split(lower(text), '[^a-z]+'),
        |      x -> length(x) > 0))) AS BIGINT) AS toks
        |  FROM documents GROUP BY source),
        |z AS (SELECT SUM(sqrt(CAST(toks AS DOUBLE))) AS z FROM t)
        |SELECT source, toks,
        |  ROUND(sqrt(CAST(toks AS DOUBLE)) / z, 4) AS weight,
        |  CAST(FLOOR(sqrt(CAST(toks AS DOUBLE)) / z * 1000000) AS BIGINT)
        |    AS target_toks,
        |  ROUND(sqrt(CAST(toks AS DOUBLE)) / z * 1000000 / toks, 4) AS epochs
        |FROM t CROSS JOIN z ORDER BY source""".stripMargin,
    "q141_curriculum" ->
      """WITH r AS (SELECT doc_id, source,
        |         ROW_NUMBER() OVER (PARTITION BY source
        |                            ORDER BY n_chars, doc_id) AS rk
        |       FROM documents),
        |s AS (SELECT source, ROW_NUMBER() OVER (ORDER BY source) AS sidx
        |      FROM (SELECT DISTINCT source FROM documents) d),
        |k AS (SELECT COUNT(*) AS k FROM s)
        |SELECT (r.rk - 1) * k.k + s.sidx AS pos, r.doc_id, r.source,
        |  r.rk AS rk
        |FROM r JOIN s ON r.source = s.source CROSS JOIN k
        |ORDER BY pos LIMIT 100""".stripMargin,
    "q139_centroid_sim" ->
      """WITH x AS (SELECT label, p + 1 AS i, CAST(e AS DOUBLE) AS v
        |           FROM embeddings LATERAL VIEW posexplode(embedding) AS p, e),
        |m AS (SELECT label, i, AVG(v) AS mv FROM x GROUP BY label, i),
        |nrm AS (SELECT label, sqrt(SUM(mv * mv)) AS nm FROM m GROUP BY label),
        |dt AS (SELECT a.label AS la, b.label AS lb, SUM(a.mv * b.mv) AS dot
        |       FROM m a JOIN m b ON a.i = b.i AND a.label < b.label
        |       GROUP BY a.label, b.label)
        |SELECT CAST(la AS BIGINT) AS a, CAST(lb AS BIGINT) AS b,
        |  ROUND(dot / (na.nm * nb.nm), 4) + 0.0 AS cos
        |FROM dt JOIN nrm na ON na.label = la JOIN nrm nb ON nb.label = lb
        |ORDER BY a, b""".stripMargin,
    // q142's SQL surface is the positional min-join chain — running it
    // result-equal to the builder proves the (depth, anchor) fold and
    // the join formulation agree IN-ENGINE, same role as q94's flat
    // global window.
    "q142_window_funnel" ->
      """WITH e AS (
        |  SELECT user_id, ts,
        |    CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
        |         WHEN 'purchase' THEN 3 ELSE 0 END AS code,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pos
        |  FROM events),
        |p1 AS (SELECT user_id, MIN(pos) AS p FROM e WHERE code = 1 GROUP BY user_id),
        |a1 AS (SELECT p1.user_id, p1.p, e.ts FROM p1
        |       JOIN e ON e.user_id = p1.user_id AND e.pos = p1.p),
        |p2 AS (SELECT e.user_id, MIN(e.pos) AS p FROM e
        |       JOIN a1 ON e.user_id = a1.user_id AND e.pos > a1.p
        |        AND e.ts <= a1.ts + INTERVAL 3 DAY
        |       WHERE e.code = 2 GROUP BY e.user_id),
        |a2 AS (SELECT p2.user_id, p2.p, e.ts FROM p2
        |       JOIN e ON e.user_id = p2.user_id AND e.pos = p2.p),
        |p3 AS (SELECT e.user_id, MIN(e.pos) AS p FROM e
        |       JOIN a2 ON e.user_id = a2.user_id AND e.pos > a2.p
        |        AND e.ts <= a2.ts + INTERVAL 3 DAY
        |       WHERE e.code = 3 GROUP BY e.user_id),
        |u AS (SELECT DISTINCT user_id FROM e),
        |du AS (SELECT u.user_id,
        |         CASE WHEN p3.p IS NOT NULL THEN 3 WHEN p2.p IS NOT NULL THEN 2
        |              WHEN p1.p IS NOT NULL THEN 1 ELSE 0 END AS depth
        |       FROM u LEFT JOIN p1 ON u.user_id = p1.user_id
        |              LEFT JOIN p2 ON u.user_id = p2.user_id
        |              LEFT JOIN p3 ON u.user_id = p3.user_id),
        |r AS (SELECT CAST(depth AS BIGINT) AS depth,
        |        CAST(COUNT(*) AS BIGINT) AS n_users
        |      FROM du GROUP BY depth)
        |SELECT depth, n_users,
        |  CAST(SUM(n_users) OVER (ORDER BY depth DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS reached
        |FROM r ORDER BY depth""".stripMargin,
    "q143_user_growth" ->
      """WITH f AS (SELECT user_id,
        |    MIN(CAST(date_trunc('day', ts) AS DATE)) AS day
        |  FROM events WHERE event_id % 97 = 0 GROUP BY user_id),
        |n AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS new_users
        |      FROM f GROUP BY day)
        |SELECT date_format(day, 'yyyy-MM-dd') AS day, new_users,
        |  CAST(SUM(new_users) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_users
        |FROM n ORDER BY day""".stripMargin,
    "q144_gini" ->
      """WITH r AS (SELECT source, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |                       ORDER BY n_chars, doc_id) AS rk
        |  FROM documents)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
        |  ROUND((CAST(2.0 AS DOUBLE) * SUM(rk * n_chars)
        |         - (COUNT(*) + 1) * SUM(n_chars))
        |        / (COUNT(*) * SUM(n_chars)), 4) AS gini
        |FROM r GROUP BY source ORDER BY source""".stripMargin,
    "q146_zipf" ->
      s"""WITH $TokensCte,
        |f AS (SELECT word, COUNT(*) AS c FROM tokens GROUP BY word),
        |top AS (SELECT word, c FROM f ORDER BY c DESC, word LIMIT 100),
        |r AS (SELECT CAST(c AS DOUBLE) AS c,
        |        CAST(ROW_NUMBER() OVER (ORDER BY c DESC, word) AS DOUBLE) AS rk
        |      FROM top)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  ROUND(regr_slope(ln(c), ln(rk)), 4) AS slope,
        |  ROUND(regr_intercept(ln(c), ln(rk)), 4) AS intercept,
        |  ROUND(regr_r2(ln(c), ln(rk)), 4) AS r2
        |FROM r""".stripMargin,
    "q147_stickiness" ->
      """WITH ud AS (SELECT DISTINCT user_id,
        |    CAST(date_trunc('day', ts) AS DATE) AS day FROM events),
        |dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau
        |        FROM ud GROUP BY day),
        |wau AS (SELECT d.day, CAST(COUNT(DISTINCT w.user_id) AS BIGINT) AS wau
        |        FROM dau d JOIN ud w
        |          ON w.day BETWEEN date_sub(d.day, 6) AND d.day
        |        GROUP BY d.day)
        |SELECT date_format(d.day, 'yyyy-MM-dd') AS day, d.dau, w.wau,
        |  ROUND(CAST(d.dau AS DOUBLE) / w.wau, 4) AS stickiness
        |FROM dau d JOIN wau w ON d.day = w.day ORDER BY day""".stripMargin,
    "q148_burstiness" ->
      s"""WITH $TokensCte,
        |wc AS (SELECT word, doc_id, COUNT(*) AS c FROM tokens
        |       GROUP BY word, doc_id),
        |g AS (SELECT word, SUM(c) AS s, SUM(c * c) AS q, COUNT(*) AS df
        |      FROM wc GROUP BY word),
        |nd AS (SELECT COUNT(*) AS n FROM documents),
        |top AS (SELECT * FROM g ORDER BY s DESC, word LIMIT 20)
        |SELECT word, CAST(s AS BIGINT) AS freq, CAST(df AS BIGINT) AS df,
        |  ROUND(CAST(n * q - s * s AS DOUBLE) / (n * s), 4) AS vmr
        |FROM top CROSS JOIN nd ORDER BY word""".stripMargin,
    "q149_auc" ->
      """WITH h AS (SELECT n_chars AS v,
        |    SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS np,
        |    SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS nn
        |  FROM documents GROUP BY n_chars),
        |c AS (SELECT np, nn,
        |        COALESCE(SUM(nn) OVER (ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |          CAST(0 AS BIGINT)) AS nb
        |      FROM h)
        |SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
        |  CAST(SUM(nn) AS BIGINT) AS n_neg,
        |  ROUND(CAST(SUM(np * (2 * nb + nn)) AS DOUBLE)
        |        / (CAST(2 AS DOUBLE) * SUM(np) * SUM(nn)), 4) AS auc
        |FROM c""".stripMargin,
    "q150_ks_test" ->
      """WITH h AS (SELECT n_chars AS v,
        |    SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS c1,
        |    SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS c2
        |  FROM documents WHERE source IN ('src0', 'src1')
        |  GROUP BY n_chars),
        |c AS (SELECT v,
        |        SUM(c1) OVER (ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS k1,
        |        SUM(c2) OVER (ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS k2,
        |        SUM(c1) OVER () AS n1, SUM(c2) OVER () AS n2
        |      FROM h),
        |g AS (SELECT v, n1, n2, ABS(k1 * n2 - k2 * n1) AS gap FROM c)
        |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
        |  CAST(MIN(CASE WHEN gap = m THEN v END) AS BIGINT) AS at_value,
        |  ROUND(CAST(m AS DOUBLE) / (n1 * n2), 4) AS d_stat
        |FROM g CROSS JOIN (SELECT MAX(gap) AS m FROM g) mm
        |GROUP BY n1, n2, m""".stripMargin,
    // jaro_winkler is the graft-native codegen expression, registered
    // on the SQL surface by GraftExtensions — this text exercises the
    // injected-function path end to end.
    "q151_jw_vocab" ->
      s"""WITH $TokensCte,
        |v AS (SELECT DISTINCT word FROM tokens),
        |p AS (SELECT a.word AS w1, b.word AS w2,
        |        ROUND(jaro_winkler(a.word, b.word), 4) AS jw
        |      FROM v a JOIN v b ON a.word < b.word)
        |SELECT w1, w2, jw
        |FROM p WHERE jw >= 0.7 ORDER BY w1, w2""".stripMargin,
    "q152_changepoint" ->
      """WITH x AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |    COUNT(*) AS c
        |  FROM events GROUP BY day),
        |w AS (SELECT day, c,
        |        SUM(c) OVER (ORDER BY day
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |        ROW_NUMBER() OVER (ORDER BY day) AS i,
        |        SUM(c) OVER () AS t, COUNT(*) OVER () AS n
        |      FROM x),
        |g AS (SELECT day, n, ABS(n * cum - i * t) AS dev FROM w)
        |SELECT CAST(n AS BIGINT) AS n_days,
        |  date_format(MIN(CASE WHEN dev = m THEN day END), 'yyyy-MM-dd')
        |    AS at_day,
        |  ROUND(CAST(m AS DOUBLE) / n, 4) AS s_max
        |FROM g CROSS JOIN (SELECT MAX(dev) AS m FROM g) mm
        |GROUP BY n, m""".stripMargin,
    "q153_benford" ->
      """WITH o AS (SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice)
        |      AS BIGINT) AS STRING), 1, 1) AS BIGINT) AS d
        |  FROM orders),
        |h AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS obs FROM o GROUP BY d),
        |e AS (SELECT d, obs,
        |        SUM(obs) OVER () * log10(1 + CAST(1 AS DOUBLE) / d) AS exp
        |      FROM h)
        |SELECT d, obs, ROUND(exp, 4) AS expected,
        |  ROUND((obs - exp) * (obs - exp) / exp, 4) AS contrib,
        |  ROUND(SUM((obs - exp) * (obs - exp) / exp) OVER (), 4) AS chi2
        |FROM e ORDER BY d""".stripMargin,
    "q154_seq_pattern" ->
      """WITH c AS (SELECT user_id, ts, event_id,
        |    CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
        |      WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
        |      ELSE 'e' END AS code
        |  FROM events),
        |s AS (SELECT user_id,
        |        array_join(transform(
        |          sort_array(collect_list(struct(ts, event_id, code))),
        |          x -> x.code), '') AS str
        |      FROM c GROUP BY user_id),
        |m AS (SELECT pattern,
        |        CAST(regexp_count(str, pattern) AS BIGINT) AS hits
        |      FROM s LATERAL VIEW explode(array('v[^c]*p', 'pe')) t
        |        AS pattern)
        |SELECT pattern,
        |  CAST(SUM(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_users,
        |  CAST(SUM(hits) AS BIGINT) AS occurrences
        |FROM m GROUP BY pattern ORDER BY pattern""".stripMargin,
    "q155_scd2" ->
      """WITH c AS (
        |  SELECT user_id, event_type AS state, ts, event_id,
        |    LAG(event_type) OVER (PARTITION BY user_id
        |                          ORDER BY ts, event_id) AS prev
        |  FROM events),
        |ch AS (SELECT user_id, state, ts, event_id FROM c
        |       WHERE prev IS NULL OR prev <> state),
        |v AS (SELECT user_id, state,
        |        ROW_NUMBER() OVER (PARTITION BY user_id
        |                           ORDER BY ts, event_id) AS version,
        |        ts AS valid_from,
        |        LEAD(ts) OVER (PARTITION BY user_id
        |                       ORDER BY ts, event_id) AS valid_to
        |      FROM ch)
        |SELECT user_id, CAST(version AS BIGINT) AS version, state,
        |  date_format(valid_from, 'yyyy-MM-dd HH:mm:ss') AS valid_from,
        |  COALESCE(date_format(valid_to, 'yyyy-MM-dd HH:mm:ss'),
        |    'current') AS valid_to,
        |  CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS BIGINT)
        |    AS is_current
        |FROM v ORDER BY user_id, version""".stripMargin,
    "q156_bad_records" ->
      """WITH m AS (SELECT event_type,
        |    CASE WHEN event_id % 13 = 0
        |         THEN substring(props, 1, length(props) - 1)
        |         ELSE props END AS s
        |  FROM events),
        |p AS (SELECT event_type,
        |        CAST(get_json_object(s, '$.k') AS BIGINT) AS k FROM m)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_corrupt,
        |  ROUND(CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |        / COUNT(*), 4) AS corrupt_rate,
        |  CAST(SUM(COALESCE(k, 0)) AS BIGINT) AS sum_k
        |FROM p GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q157_ab_test" ->
      """WITH u AS (SELECT user_id, user_id % 2 AS variant,
        |    MAX(CASE WHEN event_type = 'purchase' AND value > 90
        |        THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY user_id),
        |v AS (SELECT variant, CAST(COUNT(*) AS BIGINT) AS n,
        |        CAST(SUM(conv) AS BIGINT) AS conversions
        |      FROM u GROUP BY variant),
        |w AS (SELECT
        |        MAX(CASE WHEN variant = 0 THEN n END) AS n0,
        |        MAX(CASE WHEN variant = 0 THEN conversions END) AS c0,
        |        MAX(CASE WHEN variant = 1 THEN n END) AS n1,
        |        MAX(CASE WHEN variant = 1 THEN conversions END) AS c1
        |      FROM v)
        |SELECT n0, c0, ROUND(CAST(c0 AS DOUBLE) / n0, 4) AS cr0,
        |  n1, c1, ROUND(CAST(c1 AS DOUBLE) / n1, 4) AS cr1,
        |  ROUND((CAST(c0 AS DOUBLE) / n0 - CAST(c1 AS DOUBLE) / n1)
        |    / sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
        |           * (1 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
        |           * (CAST(1 AS DOUBLE) / n0 + CAST(1 AS DOUBLE) / n1)), 4)
        |    AS z
        |FROM w""".stripMargin)

  /** Run a declared query from its SQL text. The text executes in a
    * CLONED session (`newSession`: own temp-view catalog and SQL conf,
    * shared SparkContext/cache) so registering the table views never
    * mutates the caller's session state — the library-surface fix for
    * the round-3 note on q46's createOrReplaceTempView. */
  def run(spark: SparkSession, dir: String, name: String): DataFrame = {
    val s = spark.newSession()
    s.conf.set("spark.sql.session.timeZone", "UTC")
    s.conf.set(Tables.nanosAsLongConf, "true")
    // SQL-surface registrations, scoped to the cloned session: the native
    // graft expressions (poly_hash, dot_product, ... — what
    // spark.sql.extensions would inject at startup) and the TopK
    // Aggregator as a SQL-callable UDAF.
    GraftExtensions.register(s)
    s.udf.register("topk3",
      org.apache.spark.sql.functions.udaf(new graft.functions.TopK(3)))
    // Per-table accessors, not raw load: events' ts needs the
    // nanos→timestamp normalization baked into Tables.events.
    val loaders: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "region" -> Tables.region, "nation" -> Tables.nation,
      "customer" -> Tables.customer, "supplier" -> Tables.supplier,
      "part" -> Tables.part, "orders" -> Tables.orders,
      "lineitem" -> Tables.lineitem, "events" -> Tables.events,
      "documents" -> Tables.documents, "embeddings" -> Tables.embeddings)
    loaders.foreach { case (t, f) => f(s, dir).createOrReplaceTempView(t) }
    s.sql(sql.getOrElse(name, extensionSql(name)))
  }
}
