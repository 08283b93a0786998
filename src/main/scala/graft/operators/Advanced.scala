package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.TopK

/** Advanced relational/temporal operators closing out SURVEY.md §2:
  * as-of join (J7), exact percentiles, the custom-Aggregator top-k
  * (§2.11 A10), and approx distinct (A6, engine-specific → unchecked).
  */
object Advanced {

  /** As-of join, the scalable formulation: instead of a per-row range
    * join (quadratic blowup per key), union both sides with a kind flag
    * and carry the last-seen left timestamp forward with a running
    * `last(ignoreNulls)` window — ONE shuffle by key, linear scan per
    * partition. This is the 100 TB shape: no range-join explosion, no
    * broadcast of an unbounded side.
    */
  def asofJoin(right: DataFrame, left: DataFrame, key: String, ts: String,
               carry: String): DataFrame = {
    val l = left.select(col(key), col(ts),
      col(ts).as(carry), lit(0).as("side"), lit(null).cast("long").as("rid"))
    val r = right.select(col(key), col(ts),
      lit(null).cast(left.schema(ts).dataType).as(carry), lit(1).as("side"),
      col("event_id").as("rid"))
    // side 0 sorts before side 1 at equal ts → "<=" as-of semantics
    val w = Window.partitionBy(key)
      .orderBy(col(ts), col("side"), col("rid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn(carry, last(col(carry), ignoreNulls = true).over(w))
      .where(col("side") === 1)
      .drop("side")
  }

  /** q40: as-of join on events — for every purchase, the most recent
    * click (ts <= purchase ts) by the same user. Oracle uses a
    * correlated MAX subquery (dialect-neutral as-of definition). */
  val q40_asof_join = QueryDef(
    "q40_asof_join",
    """SELECT e.event_id, e.user_id,
      |  strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts,
      |  strftime((SELECT max(c.ts) FROM events c
      |            WHERE c.event_type = 'click' AND c.user_id = e.user_id
      |              AND c.ts <= e.ts), '%Y-%m-%d %H:%M:%S') AS prev_click
      |FROM events e WHERE e.event_type = 'purchase'
      |ORDER BY e.event_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val purchases = ev.where(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = ev.where(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    asofJoin(purchases, clicks, "user_id", "ts", "prev_click")
      .select(col("rid").as("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
        date_format(col("prev_click"), "yyyy-MM-dd HH:mm:ss").as("prev_click"))
      .orderBy("event_id")
  }

  /** q41: exact interpolated percentiles per group — Spark `percentile`
    * and DuckDB `quantile_cont` share the linear-interpolation
    * definition. */
  val q41_percentiles = QueryDef(
    "q41_percentiles",
    """SELECT o_orderpriority,
      |  ROUND(quantile_cont(o_totalprice, 0.25), 2) AS p25,
      |  ROUND(quantile_cont(o_totalprice, 0.50), 2) AS p50,
      |  ROUND(quantile_cont(o_totalprice, 0.75), 2) AS p75,
      |  ROUND(quantile_cont(o_totalprice, 0.90), 2) AS p90
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) {
    (s, d) =>
      Tables.orders(s, d).groupBy("o_orderpriority")
        .agg(
          round(expr("percentile(o_totalprice, 0.25)"), 2).as("p25"),
          round(expr("percentile(o_totalprice, 0.50)"), 2).as("p50"),
          round(expr("percentile(o_totalprice, 0.75)"), 2).as("p75"),
          round(expr("percentile(o_totalprice, 0.90)"), 2).as("p90"))
        .orderBy("o_orderpriority")
  }

  /** q42: top-3 prices per priority via the custom TopK Aggregator
    * (§2.11 A10). Unlike the window top-k (Q20), this partial-aggregates
    * map-side: each task ships ≤k values per group to the shuffle. */
  val q42_topk_udaf = QueryDef(
    "q42_topk_udaf",
    """SELECT o_orderpriority, list(p ORDER BY p DESC) AS top_prices FROM (
      |  SELECT o_orderpriority, ROUND(o_totalprice, 2) AS p,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
      |                       ORDER BY o_totalprice DESC) AS rn
      |  FROM orders) WHERE rn <= 3
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    val topk = udaf(new TopK(3))
    Tables.orders(s, d).groupBy("o_orderpriority")
      .agg(topk(round(col("o_totalprice"), 2)).as("top_prices"))
      .orderBy("o_orderpriority")
  }

  /** q43: HLL approx distinct (A6) — sketch values are engine-specific,
    * so the driver records a rows-only check; the ScalaTest suite bounds
    * the relative error against the exact count instead. */
  val q43_approx_distinct = QueryDef.unchecked("q43_approx_distinct") { (s, d) =>
    Tables.documents(s, d).groupBy("source")
      .agg(
        approx_count_distinct(col("text")).as("approx_uniq"),
        count(lit(1)).as("n"))
      .orderBy("source")
  }

  val all: Seq[QueryDef] =
    Seq(q40_asof_join, q41_percentiles, q42_topk_udaf, q43_approx_distinct)
}
