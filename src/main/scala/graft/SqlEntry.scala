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
      """SELECT COUNT(*) AS n, ROUND(SUM(l_extendedprice), 2) AS sum_price,
        |  ROUND(AVG(l_discount), 2) AS avg_disc,
        |  date_format(MIN(l_shipdate), 'yyyy-MM-dd HH:mm:ss') AS min_ship,
        |  date_format(MAX(l_shipdate), 'yyyy-MM-dd HH:mm:ss') AS max_ship
        |FROM lineitem""".stripMargin,
    "q09_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
        |  ROUND(SUM(l_quantity), 2) AS sum_qty,
        |  ROUND(SUM(l_extendedprice), 2) AS sum_price,
        |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  ROUND(AVG(l_quantity), 2) AS avg_qty,
        |  ROUND(AVG(l_extendedprice), 2) AS avg_price
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q10_rollup" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
        |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
        |  COUNT(*) AS cnt, ROUND(SUM(o_totalprice), 2) AS sum_price
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY g_status, g_prio, o_orderstatus NULLS LAST, o_orderpriority NULLS LAST""".stripMargin,
    "q11_date_buckets" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(month(o_orderdate) AS BIGINT) AS m,
        |  COUNT(*) AS cnt, ROUND(SUM(o_totalprice), 2) AS sum_price
        |FROM orders GROUP BY y, m ORDER BY y, m""".stripMargin,
    "q12_join2" ->
      """SELECT c_mktsegment, COUNT(*) AS cnt, ROUND(SUM(o_totalprice), 2) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q13_join4" ->
      """SELECT /*+ BROADCAST(nation) */ n_name,
        |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q14_join5_region" ->
      """SELECT /*+ BROADCAST(nation, region) */ n_name,
        |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
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
    * widens the parser-path coverage to the remaining window-function
    * families (rank variants with NULLS LAST, navigation functions with
    * explicit frames, the `window()` table expression in GROUP BY) and
    * GROUPING ROLLUP. Pinned result-equal to the builders in
    * SqlParitySpec alongside the contract 27. */
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
        |ORDER BY w_start, event_type""".stripMargin)

  /** Run a declared query from its SQL text. The text executes in a
    * CLONED session (`newSession`: own temp-view catalog and SQL conf,
    * shared SparkContext/cache) so registering the table views never
    * mutates the caller's session state — the library-surface fix for
    * the round-3 note on q46's createOrReplaceTempView. */
  def run(spark: SparkSession, dir: String, name: String): DataFrame = {
    val s = spark.newSession()
    s.conf.set("spark.sql.session.timeZone", "UTC")
    s.conf.set(Tables.nanosAsLongConf, "true")
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
