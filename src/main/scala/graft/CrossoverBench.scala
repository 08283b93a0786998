package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Similarity, TextPipeline}

/** Exact-vs-LSH dedup crossover measurement (VERDICT r6 #6, extended
  * to documents in round 7).
  *
  * The q74/q75 (embeddings) and q71/q72 (documents) pairs leave an open
  * scaling question: at small n the LSH variants cost MORE than their
  * exact twins (banding overhead dominates), so where is the crossover?
  * This main ladders corpus size n over one fixture's embeddings or
  * documents table — the lowest-n ids, subset materialized via
  * localCheckpoint so both methods read identical in-memory input and
  * subset construction never pollutes the timing — and times the full
  * dedup pipeline (stage-0 exact collapse → pairs → connected
  * components → election → anti-join) under the exact method (all-pairs
  * join, O(n²) comparisons) and the LSH method (banding + bucket-join
  * candidates, O(n·bucket) comparisons). One JSON line per point:
  *
  * {"metric":"dedup_crossover","table":...,"n":N,"exact_secs":...,
  *  "lsh_secs":...,"exact_survivors":...,"lsh_survivors":...,
  *  "loadavg":"..."}
  *
  * Per-point statistic is the min across SPARK_GRAFT_BENCH_PASSES
  * passes (default 3) — same rationale as Bench: min measures the
  * plan, not the co-tenant machine. Survivor counts are reported so
  * the recall cost of the approximate path at each n is visible next
  * to its speedup.
  *
  * Usage: CrossoverBench [sfDir] [table: embeddings|documents]
  *                       [nList] [threshold]
  */
object CrossoverBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/repo/testdata/sf1"
    val table = if (args.length > 1) args(1) else "embeddings"
    val ns: Seq[Int] =
      if (args.length > 2) args(2).split(",").toSeq.map(_.trim.toInt)
      else Seq(500, 1000, 2000, 5000, 10000, 20000)
    val threshold =
      if (args.length > 3) args(3).toDouble
      else if (table == "documents") 0.8 else 0.9
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

    def loadavg(): String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split("\\s+").take(3).mkString(",")
      catch { case _: Throwable => "" }

    val (idCol, full, run) = table match {
      case "embeddings" =>
        ("vec_id", Tables.embeddings(spark, sfDir).select("vec_id", "embedding"),
          (sub: DataFrame, m: String) => Similarity.dedupEmbeddings(sub, threshold, m))
      case "documents" =>
        ("doc_id", Tables.documents(spark, sfDir).select("doc_id", "text"),
          (sub: DataFrame, m: String) => TextPipeline.dedupCorpus(sub, threshold,
            if (m == "lsh") "minhash-lsh" else m, electBy = "first"))
      case other => sys.error(s"unknown table '$other' (embeddings | documents)")
    }

    ns.foreach { n =>
      val sub = full.orderBy(idCol).limit(n).localCheckpoint()
      def timeOne(method: String): (Double, Long) = {
        var best = Double.MaxValue
        var survivors = 0L
        (0 until passes).foreach { _ =>
          val t0 = System.nanoTime()
          survivors = run(sub, method).count()
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
        }
        (best, survivors)
      }
      val la = loadavg()
      val (exactSecs, exactSurv) = timeOne("exact")
      val (lshSecs, lshSurv) = timeOne("lsh")
      println(f"""{"metric":"dedup_crossover","sf":"$sfDir","table":"$table","threshold":$threshold%.2f,"n":$n,"exact_secs":$exactSecs%.3f,"lsh_secs":$lshSecs%.3f,"exact_survivors":$exactSurv,"lsh_survivors":$lshSurv,"loadavg":"$la"}""")
    }
    spark.stop()
  }
}
