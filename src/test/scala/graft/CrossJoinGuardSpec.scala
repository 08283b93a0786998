package graft

import org.apache.spark.SparkException

class CrossJoinGuardSpec extends SparkSpec {

  private def checked(df: org.apache.spark.sql.DataFrame): Unit =
    CrossJoinGuard.check(spark)(df.queryExecution.analyzed)

  test("rejects an unconditioned join of two large relations") {
    spark.conf.set(CrossJoinGuard.ThresholdKey, "1") // everything is "large"
    try {
      val li = Tables.lineitem(spark, sf0001)
      val e = intercept[SparkException] { checked(li.crossJoin(li)) }
      assert(e.getMessage.contains("cross-join guard"))
    } finally spark.conf.unset(CrossJoinGuard.ThresholdKey)
  }

  test("conditioned joins and bounded cross joins pass") {
    val li = Tables.lineitem(spark, sf0001)
    val o = Tables.orders(spark, sf0001)
    checked(li.join(o, li("l_orderkey") === o("o_orderkey"))) // has condition
    checked(li.crossJoin(o.limit(1))) // bounded side under default 512 MB
    spark.conf.set(CrossJoinGuard.ThresholdKey, "1")
    try {
      spark.conf.set(CrossJoinGuard.EnabledKey, "false") // explicit opt-out
      checked(li.crossJoin(li))
    } finally {
      spark.conf.unset(CrossJoinGuard.ThresholdKey)
      spark.conf.set(CrossJoinGuard.EnabledKey, "true")
    }
  }

  test("the registered query suite passes the guard at threshold defaults") {
    SparkEntry.queries.foreach { case (name, fn) =>
      try checked(fn(spark, sf0001))
      catch { case e: SparkException =>
        fail(s"$name tripped the cross-join guard: ${e.getMessage}")
      }
    }
  }
}
