package graft

import org.apache.spark.sql.SparkSession

/** Dev-only scratch main for timing a single query (not part of the
  * driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.nanosAsLongConf, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[scratch] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
