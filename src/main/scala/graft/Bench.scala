package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main (driver contract): times every registered
  * query on SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Protocol (BASELINE.md): one untimed warmup pass over the whole suite
  * (JIT + codegen compile + parquet footer cache), then 3 timed passes,
  * median per query — so the numbers measure the query plans, not
  * single-JVM classloading noise.
  *
  * Each query is materialized through the `noop` sink — unlike `count()`,
  * this executes the full plan with all output columns (count() would let
  * Catalyst prune the projection and under-report the real work).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.nanosAsLongConf, "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val queries = SparkEntry.queries.toSeq.sortBy(_._1)

    // A crashed query returns NaN, never a timing: a near-zero elapsed
    // for a query that did no work would silently "improve" the suite
    // total against the frozen BASELINE.md numbers.
    def runOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        Double.NaN
      }
    }

    queries.foreach { case (n, f) => runOne(n, f) } // warmup pass, untimed
    val samples = (1 to passes).map { _ =>
      queries.map { case (n, f) => n -> runOne(n, f) }.toMap
    }
    val medians = queries.flatMap { case (n, _) =>
      val xs = samples.map(_(n)).filterNot(_.isNaN).sorted
      if (xs.isEmpty) None else Some(n -> xs(xs.length / 2))
    }
    val failed = queries.map(_._1).filter(n => samples.exists(_(n).isNaN))

    val qs = medians.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val fs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = medians.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$fs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
