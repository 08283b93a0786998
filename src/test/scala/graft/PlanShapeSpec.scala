package graft

import graft.operators.Relational

/** Plan-shape assertions (SURVEY.md §4.2): the Catalyst behaviors the
  * 100 TB posture depends on must actually appear in the physical plan —
  * verify, don't re-implement. */
class PlanShapeSpec extends SparkSpec {

  private def plan(q: QueryDef): String = {
    val df = q.build(spark, sf0001)
    df.queryExecution.executedPlan.toString
  }

  test("Q13 star join broadcasts the nation dim") {
    assert(plan(Relational.q13_join4).contains("BroadcastHashJoin"))
  }

  test("Q9 pushes the shipdate filter into the parquet scan") {
    val p = plan(Relational.q09_pricing_summary)
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
  }

  test("Q9 prunes columns: scan reads only the needed lineitem columns") {
    val p = plan(Relational.q09_pricing_summary)
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_returnflag"))
    assert(!readSchema.contains("l_orderkey"), s"unpruned scan: $readSchema")
  }

  test("Q4 top-k compiles to TakeOrderedAndProject (no global sort)") {
    assert(plan(Relational.q04_topk_words).contains("TakeOrderedAndProject"))
  }

  test("Q1 aggregation is partial+final (map-side combine)") {
    val df = Relational.q01_wordcount.build(spark, sf0001)
    df.collect() // materialize so AQE finalizes stages (codegen is per-stage)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("HashAggregate"))
    assert(p.contains("codegen id"), "word-count pipeline fell out of codegen")
  }

  test("Q20 rank-limit pushes down to WindowGroupLimit (no full sort per group)") {
    assert(plan(Relational.q20_rank_window).contains("WindowGroupLimit"))
  }

  test("Q18 EXISTS/NOT EXISTS become semi/anti joins, not subquery loops") {
    val p = plan(Relational.q18_semi_anti)
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"))
  }
}
