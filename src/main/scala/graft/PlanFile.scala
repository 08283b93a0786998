package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool (r12 optimization round): dump `.explain("formatted")` of
  * named registry queries to individual files — the before/after plan
  * evidence under plans/r12/.
  *
  * Usage: PlanFile <outDir> <suffix> <query...>
  * writes <outDir>/<query>_<suffix>.txt for each query.
  */
object PlanFile {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    Files.createDirectories(outDir)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.nanosAsLongConf, "true")
      .config("spark.sql.adaptive.enabled", "false") // full static plan
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution
        .explainString(ExplainMode.fromString("formatted")).trim
      Files.writeString(outDir.resolve(s"${n}_$suffix.txt"), txt + "\n")
      println(s"[planfile] wrote ${n}_$suffix.txt")
    }
    spark.stop()
  }
}
