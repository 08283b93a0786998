package graft

import org.apache.spark.sql.SparkSession

/** Dev-only scratch main for timing a single query (not part of the
  * driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty || (args(0) == "--sql" && args.length < 2)) {
      System.err.println(
        "usage: graft.Scratch <queryName> [sfDir] | --sql '<text>' [sfDir]")
      sys.exit(2)
    }
    val name = args(0)
    val sfDir =
      if (name == "--sql") (if (args.length > 2) args(2) else "/root/testdata/sf0.1")
      else if (args.length > 1) args(1)
      else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.nanosAsLongConf, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // `--sql '<text>'` times an ad-hoc statement over the table views
    // (same registrations as SqlEntry.run) instead of a registry query —
    // the decomposition tool for plan-cost audits.
    val fn: (SparkSession, String) => org.apache.spark.sql.DataFrame =
      if (name == "--sql") {
        val text = args(1)
        (s, d) => {
          val c = s.newSession()
          c.conf.set(Tables.nanosAsLongConf, "true")
          GraftExtensions.register(c)
          Seq("documents" -> Tables.documents _, "lineitem" -> Tables.lineitem _,
            "orders" -> Tables.orders _, "events" -> Tables.events _,
            "part" -> Tables.part _, "supplier" -> Tables.supplier _,
            "customer" -> Tables.customer _, "embeddings" -> Tables.embeddings _)
            .foreach { case (t, f) => f(c, d).createOrReplaceTempView(t) }
          c.sql(text)
        }
      } else SparkEntry.queries(name)
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[scratch] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
