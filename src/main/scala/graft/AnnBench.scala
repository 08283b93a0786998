package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** ANN probe-path bench: exact brute-force vs IVF vs PQ top-k on one
  * fixture's embeddings, laddered over corpus size n — the q38/q87
  * scale evidence (the probe twin of [[CrossoverBench]]'s dedup
  * ladder).
  *
  * What is timed is the amortized PROBE ONLY: IVF centroids and PQ
  * codebooks are trained (deterministically) outside the clock, the
  * production lifecycle ([[Similarity.trainCentroids]] /
  * [[Similarity.trainPqCodebooks]] — train nightly, probe per-query).
  * Exact is the [[Similarity.cosineTopK]] broadcast scan every probe
  * must beat. Recall@k of each approximate path vs the exact answer is
  * reported NEXT TO its speedup, so the accuracy price of a faster
  * probe is never hidden. Per-point statistic is the min across
  * SPARK_GRAFT_BENCH_PASSES passes (default 3) — min measures the
  * plan, not the co-tenant machine.
  *
  * One JSON line per n:
  * {"metric":"ann_probe","n":N,"n_queries":Q,"k":K,
  *  "exact_secs":...,"ivf_secs":...,"pq_secs":...,
  *  "ivf_recall":...,"pq_recall":...,"loadavg":"..."}
  *
  * Usage: AnnBench [sfDir] [nList] [nQueries] [k]
  */
object AnnBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/repo/testdata/sf1"
    val ns: Seq[Int] =
      if (args.length > 1) args(1).split(",").toSeq.map(_.trim.toInt)
      else Seq(2000, 5000, 10000, 20000)
    val nQueries = if (args.length > 2) args(2).toInt else 100
    val k = if (args.length > 3) args(3).toInt else 10
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

    val full = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val pred = col("vec_id") < nQueries

    ns.foreach { n =>
      val sub = full.orderBy("vec_id").limit(n).localCheckpoint()
      // train AND encode OUTSIDE the clock — the standing-index
      // lifecycle: codebooks + the m-byte code table are built once
      // (deterministically) and persisted; what is probed per query
      // batch is the codes scan + ADC + candidate re-rank
      val cents = Similarity.trainCentroids(sub, nCells = 16).localCheckpoint()
      val cb = Similarity.trainPqCodebooks(sub).localCheckpoint()
      val codes = Similarity.pqEncode(sub, cb).localCheckpoint()
      val ivfPqCodes = Similarity.ivfPqEncode(sub, cents, cb).localCheckpoint()

      def pairs(df: DataFrame): Set[(Long, Long)] =
        df.select("qid", "nid").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      def timeOne(mk: () => DataFrame): (Double, Set[(Long, Long)]) = {
        var best = Double.MaxValue
        var got: Set[(Long, Long)] = Set.empty
        (0 until passes).foreach { _ =>
          val t0 = System.nanoTime()
          got = pairs(mk())
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
        }
        (best, got)
      }

      val la = loadavg()
      val (exactSecs, exact) = timeOne(() => Similarity.cosineTopK(sub, pred, k))
      val (ivfSecs, ivf) =
        timeOne(() => Similarity.probeTopK(sub, cents, pred, k, nProbe = 4))
      val (pqSecs, pq) = timeOne(() =>
        Similarity.pqProbeTopK(sub, cb, pred, k, codes = Some(codes)))
      val (ivfPqSecs, ivfpq) = timeOne(() =>
        Similarity.ivfPqProbeTopK(sub, cents, cb, pred, k,
          codes = Some(ivfPqCodes)))
      def recall(got: Set[(Long, Long)]): Double =
        if (exact.isEmpty) 1.0 else (exact intersect got).size.toDouble / exact.size
      val refine = Similarity.autoRefine(n) // what the default-0 probes used
      println(f"""{"metric":"ann_probe","sf":"$sfDir","n":$n,"n_queries":$nQueries,"k":$k,"refine":$refine,"exact_secs":$exactSecs%.3f,"ivf_secs":$ivfSecs%.3f,"pq_secs":$pqSecs%.3f,"ivfpq_secs":$ivfPqSecs%.3f,"ivf_recall":${recall(ivf)}%.3f,"pq_recall":${recall(pq)}%.3f,"ivfpq_recall":${recall(ivfpq)}%.3f,"loadavg":"$la"}""")
    }
    spark.stop()
  }
}
