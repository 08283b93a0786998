package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.operators.TextPipeline

/** Dense-vs-range measurement for the per-source length rank
  * (q135/q141/q144's shared kernel, [[TextPipeline.sourceLengthRanksAuto]]):
  * on each fixture dir, time the DENSE window form and the RANGE
  * stitch form over the pruned (doc_id, source, n_chars) projection,
  * with per-task max/median from a listener — the document-side twin
  * of CrossoverBench's dense-vs-chunked evidence. Per-point statistic
  * is min wall across SPARK_GRAFT_BENCH_PASSES passes (default 3; max
  * task reported from the min-wall pass). One JSON object per fixture.
  *
  * Usage: SourceRankBench <fixtureDir> [fixtureDir...]
  */
object SourceRankBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SourceRankBench <fixtureDir>...")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val width = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "64")
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", width)
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.nanosAsLongConf, "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val durations =
      new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskInfo != null && te.taskInfo.successful)
          durations.add(te.taskInfo.duration)
    })
    def drain(): Unit = {
      var last = -1; var same = 0
      while (same < 2) {
        Thread.sleep(200)
        val n = durations.size
        if (n == last) same += 1 else { same = 0; last = n }
      }
    }

    val rows = args.toSeq.map { dir =>
      val docs = Tables.documents(spark, dir)
        .select(col("doc_id"), col("source"), col("n_chars"))
      def time(tag: String,
               f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
      : String = {
        f(docs).write.format("noop").mode("overwrite").save() // warmup
        val best = (1 to passes).map { _ =>
          durations.clear()
          val t0 = System.nanoTime()
          f(docs).write.format("noop").mode("overwrite").save()
          val wall = (System.nanoTime() - t0) / 1e9
          drain()
          val ds = durations.toArray(Array.empty[java.lang.Long])
            .map(_.longValue).sorted
          (wall, if (ds.isEmpty) 0.0 else ds.last / 1e3,
            if (ds.isEmpty) 0.0 else ds(ds.length / 2) / 1e3)
        }.minBy(_._1)
        System.err.println(f"[srcrank] $dir $tag: wall=${best._1}%.2f " +
          f"task_max=${best._2}%.2f task_med=${best._3}%.3f")
        f""""$tag":{"wall":${best._1}%.2f,"task_max":${best._2}%.2f,""" +
          f""""task_med":${best._3}%.3f}"""
      }
      val hot = TextPipeline.hottestSourceRows(docs)
      val d = time("dense", TextPipeline.sourceLengthRanks)
      val r = time("range", TextPipeline.sourceLengthRanksRange)
      s""""$dir":{"hottest_source_rows_est":$hot,$d,$r}"""
    }
    println(rows.mkString(
      """{"metric":"source_rank_dense_vs_range","unit":"sec","fixtures":{""",
      ",", "}}"))
    spark.stop()
  }
}
