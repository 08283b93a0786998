package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TextPipeline

/** Broadcast-vs-bloom decontamination crossover measurement (the NOTES
  * round-8 candidate): q93's scaladoc claims the bloom path pays off
  * "when the eval suite outgrows a broadcastable hash table", but the
  * fixture's single held-out source never exercises that regime — at
  * registry scale the bloom build is pure overhead (~0.4 s over q59).
  * This main pins the crossover the way CrossoverBench did for dedup:
  * the bench shingle set is laddered by factor k (each original shingle
  * plus k−1 digit-suffixed perturbations — perturbed shingles can never
  * collide with real [a-z ] shingles, so the HIT SET is identical at
  * every k and only the bench-side cardinality grows), and both cores
  * run the identical decontamination over the unchanged train side:
  *
  *  - [[TextPipeline.decontamBroadcast]]: forced broadcast of the bench
  *    hash table — O(bench) bytes to every executor, zero extra jobs;
  *  - [[TextPipeline.decontamBloom]]: bits-sized filter broadcast +
  *    scan-stage prefilter + candidates-only verify join, but pays a
  *    separate sketch-build job over the bench set.
  *
  * One JSON line per k:
  * {"metric":"decontam_crossover","k":K,"bench_rows":R,
  *  "broadcast_secs":...,"bloom_secs":...,"flagged":N,"loadavg":"..."}
  * `flagged` comes from both paths each pass and is asserted equal —
  * the exactness contract (no false negatives) holds at every ladder
  * point, not just the registry SF.
  *
  * Per-point statistic is min across SPARK_GRAFT_BENCH_PASSES passes
  * (default 3) — min measures the plan, not the co-tenant machine.
  * Inputs are localCheckpoint-materialized so ladder construction never
  * pollutes the timing.
  *
  * Usage: BloomCrossoverBench [sfDir] [kList] [paths: both|broadcast|bloom]
  * (`paths` isolates one side — needed once the broadcast side stops
  * completing at all: on local-cluster[2,8,2048] at k=1024 the
  * broadcast-relation build dies with SparkOutOfMemoryError
  * UNABLE_TO_ACQUIRE_MEMORY, which aborts the whole JVM run, so the
  * bloom side must be measured in its own invocation; a skipped side
  * reports -1 and the exactness cross-check is waived.)
  */
object BloomCrossoverBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val ks: Seq[Int] =
      if (args.length > 1) args(1).split(",").toSeq.map(_.trim.toInt)
      else Seq(1, 4, 16, 64, 256)
    val paths = if (args.length > 2) args(2) else "both"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
    // SPARK_GRAFT_MASTER: see Verify — local-cluster[n,c,m] for multi-JVM
    // runs; that is where the broadcast-vs-bloom question gets real (the
    // single-JVM "broadcast" never serializes the hash table off-heap)
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val spark = SparkSession.builder()
      .master(master)
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

    val sh = TextPipeline.triShingles(spark, sfDir)
    val bench0 = sh.where(col("source") === "src0")
      .select("sh").distinct().localCheckpoint()
    val train = sh.where(col("source") =!= "src0")
      .select("doc_id", "sh").localCheckpoint()

    ks.foreach { k =>
      val benchK = bench0
        .select(col("sh"), explode(sequence(lit(0), lit(k - 1))).as("i"))
        .select(when(col("i") === 0, col("sh"))
          .otherwise(concat(col("sh"), lit(" q"), col("i"))).as("sh"))
        .localCheckpoint()
      val benchRows = benchK.count()
      def timeOne(f: => Long): (Double, Long) = {
        var best = Double.MaxValue
        var flagged = 0L
        (0 until passes).foreach { _ =>
          val t0 = System.nanoTime()
          flagged = f
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
        }
        (best, flagged)
      }
      val la = loadavg()
      val (bSecs, bFlag) =
        if (paths == "bloom") (-1.0, -1L)
        else timeOne(
          TextPipeline.decontamBroadcast(train, benchK)
            .where(col("flagged") === 1).count())
      val (fSecs, fFlag) =
        if (paths == "broadcast") (-1.0, -1L)
        else timeOne(
          TextPipeline.decontamBloom(train, benchK, expectedItems = benchRows)
            .where(col("flagged") === 1).count())
      require(paths != "both" || bFlag == fFlag,
        s"exactness violated at k=$k: broadcast=$bFlag bloom=$fFlag")
      val flagged = if (bFlag >= 0) bFlag else fFlag
      println(f"""{"metric":"decontam_crossover","sf":"$sfDir","master":"$master","k":$k,"bench_rows":$benchRows,"broadcast_secs":$bSecs%.3f,"bloom_secs":$fSecs%.3f,"flagged":$flagged,"loadavg":"$la"}""")
    }
    spark.stop()
  }
}
