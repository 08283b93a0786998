package graft

import java.nio.file.Files

import graft.mrcompat.MapReduceJob

/** Reference-parity goldens (SURVEY.md §5.1): the distributed compat
  * path must produce byte-identical grouped output to the sequential
  * oracle — the Spark analog of test-mr.sh's `cmp` against
  * mrsequential.go. */
class MrCompatSpec extends SparkSpec {

  private lazy val inputDir: String = {
    val dir = Files.createTempDirectory("mr-in").toFile
    val docs = Seq(
      "f0.txt" -> "the quick brown fox jumps over the lazy dog",
      "f1.txt" -> "pack my box with five dozen liquor jugs",
      "f2.txt" -> "the five boxing wizards jump quickly",
      "f3.txt" -> "sphinx of black quartz judge my vow; the end")
    docs.foreach { case (n, c) =>
      Files.write(new java.io.File(dir, n).toPath, c.getBytes)
    }
    dir.getAbsolutePath
  }

  private def readInputs: Seq[(String, String)] =
    new java.io.File(inputDir).listFiles.toSeq.sortBy(_.getName)
      .map(f => f.getName -> new String(Files.readAllBytes(f.toPath)))

  test("wc: distributed result == sequential oracle") {
    val dist = MapReduceJob.run(spark, s"$inputDir/*",
      MapReduceJob.wcMap, MapReduceJob.wcReduce, 3).collect().sorted.toSeq
    // wholeTextFiles yields full paths; oracle map ignores the name for wc
    val seqr = MapReduceJob.sequential(readInputs,
      MapReduceJob.wcMap, MapReduceJob.wcReduce).sorted
    assert(dist == seqr)
    assert(dist.exists { case (k, v) => k == "the" && v == "4" })
  }

  test("indexer: distributed result == sequential oracle (name-normalized)") {
    def stripDirs(kv: (String, String)): (String, String) = {
      val (k, v) = kv
      val Array(df, docs) = v.split(" ", 2)
      k -> s"$df ${docs.split(",").map(_.split("/").last).sorted.mkString(",")}"
    }
    val dist = MapReduceJob.run(spark, s"$inputDir/*",
      MapReduceJob.indexerMap, MapReduceJob.indexerReduce, 3)
      .collect().toSeq.map(stripDirs).sorted
    val seqr = MapReduceJob.sequential(readInputs,
      MapReduceJob.indexerMap, MapReduceJob.indexerReduce).map(stripDirs).sorted
    assert(dist == seqr)
  }

  test("output is sorted within each reduce partition (lab ordering guarantee)") {
    val parts = MapReduceJob.run(spark, s"$inputDir/*",
      MapReduceJob.wcMap, MapReduceJob.wcReduce, 3)
      .glom().collect()
    assert(parts.length == 3)
    parts.foreach { p => assert(p.map(_._1).toSeq == p.map(_._1).toSeq.sorted) }
  }

  test("runToDir writes R 'key value' text files") {
    val out = Files.createTempDirectory("mr-out").toFile.getAbsolutePath + "/job"
    MapReduceJob.runToDir(spark, s"$inputDir/*",
      MapReduceJob.wcMap, MapReduceJob.wcReduce, 2, out)
    val files = new java.io.File(out).listFiles.filter(_.getName.startsWith("part-"))
    assert(files.length == 2)
    val lines = files.flatMap(f => scala.io.Source.fromFile(f).getLines())
    assert(lines.forall(_.matches("[a-z]+ \\d+")))
  }

  test("runToDir commits atomically: _SUCCESS marker present before read") {
    val out = Files.createTempDirectory("mr-suc").toFile.getAbsolutePath + "/job"
    MapReduceJob.runToDir(spark, s"$inputDir/*",
      MapReduceJob.wcMap, MapReduceJob.wcReduce, 2, out)
    assert(new java.io.File(out, "_SUCCESS").exists,
      "FileCommitProtocol success marker missing")
  }

  test("map tasks actually run in parallel (>= 2 concurrent; lab parallelism test)") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd, SparkListenerTaskStart}
    val running = new java.util.concurrent.atomic.AtomicInteger(0)
    val peak = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onTaskStart(t: SparkListenerTaskStart): Unit = {
        val now = running.incrementAndGet()
        peak.getAndUpdate(p => math.max(p, now))
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        running.decrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // slow each map task enough that executions must overlap on local[4]
      val rdd = spark.sparkContext.wholeTextFiles(s"$inputDir/*", 4)
        .map { kv => Thread.sleep(300); kv }
      rdd.count()
      // listener events are async; poll briefly for the peak to settle
      val deadline = System.currentTimeMillis() + 10000
      while (peak.get() < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(peak.get() >= 2, s"peak concurrency was ${peak.get()}")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("grep app: distributed == sequential oracle; only matching lines") {
    val m = MapReduceJob.grepMap("the")
    val dist = MapReduceJob.run(spark, s"$inputDir/*", m,
      MapReduceJob.grepReduce, 2).collect().toSeq
      .map { case (k, v) => k.split("/").last -> v }.sorted
    val seqr = MapReduceJob.sequential(readInputs, m, MapReduceJob.grepReduce)
      .map { case (k, v) => k.split("/").last -> v }.sorted
    assert(dist == seqr)
    assert(dist.nonEmpty && dist.forall(_._2.toInt > 0))
  }

  test("sort app: keys globally ordered across ordered partitions") {
    val parts = MapReduceJob.run(spark, s"$inputDir/*",
      MapReduceJob.sortMap, MapReduceJob.sortReduce, 3)
      .glom().collect()
    parts.foreach { p =>
      assert(p.map(_._1).toSeq == p.map(_._1).toSeq.sorted) }
  }

  test("crash tolerance: task that fails once still yields correct result") {
    val sc = spark.sparkContext
    val acc = sc.longAccumulator("attempts")
    val rdd = MapReduceJob.run(spark, s"$inputDir/*",
      MapReduceJob.wcMap, MapReduceJob.wcReduce, 2)
      .mapPartitions { it =>
        if (org.apache.spark.TaskContext.get.attemptNumber() == 0) {
          throw new RuntimeException("injected crash (lab crash.go analog)")
        }
        it
      }
    val got = rdd.collect().sorted.toSeq
    val seqr = MapReduceJob.sequential(readInputs,
      MapReduceJob.wcMap, MapReduceJob.wcReduce).sorted
    assert(got == seqr)
  }
}
