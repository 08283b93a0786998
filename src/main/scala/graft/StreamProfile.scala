package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.DocDedup

/** Stage-isolating profile of the streaming ingest-dedup path (VERDICT r7
  * #3): runs the SAME feed as [[StreamBench]] through progressively more
  * of the pipeline, so the per-batch cost decomposes into
  *
  *   passthrough  — micro-batch planning + commit overhead only
  *   banded       — + scan-local MinHash banding (signature compute)
  *   state        — + keyed RocksDB state (get/update per bucket)
  *   state+timers — the full incrementalCandidatesTtl path
  *
  * Each stage prints rows/sec; the deltas localize the bottleneck. Extra
  * Spark confs come from SPARK_GRAFT_STREAM_CONF ("k=v;k=v") so RocksDB
  * knobs (changelog checkpointing, maintenance interval) can be laddered
  * without recompiling.
  *
  * Usage: StreamProfile [rows=20000] [batchSize=5000] [sfDir=sf0.01 path]
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toInt else 20000
    val batchSize = if (args.length > 1) args(1).toInt else 5000
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.nanosAsLongConf, "true")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_STREAM_CONF").foreach { s =>
      s.split(";").filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2); b.config(k, v)
      }
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val texts = Tables.documents(spark, sfDir)
      .orderBy("doc_id").select("text").collect().map(_.getString(0))
    val t0ms = 1700000000000L

    def run(name: String)(pipe: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Unit = {
      val in = MemoryStream[DocDedup.TsDoc]
      val ckpt = java.nio.file.Files.createTempDirectory(s"sp-$name").toString
      val q = pipe(in.toDF()).writeStream.format("noop")
        .option("checkpointLocation", ckpt).start()
      // warmup batch (plan compile, store open) excluded from the clock
      in.addData((0 until batchSize).map { j =>
        DocDedup.TsDoc(-1000000L - j, texts(j % texts.length),
          new Timestamp(t0ms - 3600L * 1000 + j))
      })
      q.processAllAvailable()
      val start = System.nanoTime()
      var emitted = 0
      while (emitted < rows) {
        val n = math.min(batchSize, rows - emitted)
        in.addData((0 until n).map { j =>
          val id = (emitted + j).toLong
          DocDedup.TsDoc(id, texts((id % texts.length).toInt),
            new Timestamp(t0ms + id * 10L))
        })
        q.processAllAvailable()
        emitted += n
      }
      val secs = (System.nanoTime() - start) / 1e9
      val progress = q.recentProgress.takeRight(3).map(_.json).mkString("\n")
      q.stop()
      println(f"""{"stage":"$name","rows_per_sec":${rows / secs}%.1f,"secs":$secs%.3f,"rows":$rows,"batch_size":$batchSize}""")
      if (sys.env.contains("SPARK_GRAFT_STREAM_PROGRESS"))
        println(s"--- $name last progress ---\n$progress")
    }

    run("passthrough")(df => df)
    run("banded")(df => DocDedup.bandedRows(df.withWatermark("ts", "10 minutes"),
      carry = Seq("ts")))
    run("state_no_ttl")(df => DocDedup.incrementalCandidates(df).toDF())
    run("state_ttl")(df => DocDedup.incrementalCandidatesTtl(df).toDF())
    spark.stop()
  }
}
