package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.{DocDedup, EmbDedup}

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
  * `op=emb` profiles the EMBEDDING twin the same way: hyperplane banding,
  * then the list-state best-match probes without timers, then the full
  * event-time-TTL path — the deltas separate ListState get/append cost
  * from timer-churn cost.
  *
  * Usage: StreamProfile [rows=20000] [batchSize=5000] [sfDir=sf0.01 path]
  *                      [op=doc|emb]
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toInt else 20000
    val batchSize = if (args.length > 1) args(1).toInt else 5000
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.01"
    val op = if (args.length > 3) args(3) else "doc"
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

    val t0ms = 1700000000000L

    // One generic stage runner per input shape: builds the stream, pumps a
    // warmup batch (plan compile, store open — excluded from the clock),
    // then times `rows` through the staged pipeline.
    def runWith[T <: Product : org.apache.spark.sql.Encoder](
        name: String, mk: (Int, Int) => Seq[T])(
        pipe: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Unit = {
      val in = MemoryStream[T]
      val ckpt = java.nio.file.Files.createTempDirectory(s"sp-$name").toString
      val q = pipe(in.toDF()).writeStream.format("noop")
        .option("checkpointLocation", ckpt).start()
      in.addData(mk(-1000000, batchSize))
      q.processAllAvailable()
      val start = System.nanoTime()
      var emitted = 0
      while (emitted < rows) {
        val n = math.min(batchSize, rows - emitted)
        in.addData(mk(emitted, n))
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

    if (op == "doc") {
      val texts = Tables.documents(spark, sfDir)
        .orderBy("doc_id").select("text").collect().map(_.getString(0))
      def mk(from: Int, n: Int): Seq[DocDedup.TsDoc] = (0 until n).map { j =>
        val id = (from + j).toLong
        val ts = if (from < 0) t0ms - 3600L * 1000 + j else t0ms + id * 10L
        DocDedup.TsDoc(id, texts(math.floorMod(id, texts.length).toInt),
          new Timestamp(ts))
      }
      def run(name: String) = runWith[DocDedup.TsDoc](name, mk) _
      run("passthrough")(df => df)
      run("banded")(df => DocDedup.bandedRows(df.withWatermark("ts", "10 minutes"),
        carry = Seq("ts")))
      run("state_no_ttl")(df => DocDedup.incrementalCandidates(df).toDF())
      run("state_ttl")(df => DocDedup.incrementalCandidatesTtl(df).toDF())
    } else {
      val vecs = Tables.embeddings(spark, sfDir)
        .orderBy("vec_id").select("embedding").collect()
        .map(_.getSeq[Float](0).map(_.toDouble))
      def mk(from: Int, n: Int): Seq[EmbDedup.VecTs] = (0 until n).map { j =>
        val id = (from + j).toLong
        val ts = if (from < 0) t0ms - 3600L * 1000 + j else t0ms + id * 10L
        EmbDedup.VecTs(id, vecs(math.floorMod(id, vecs.length).toInt),
          new Timestamp(ts))
      }
      def run(name: String) = runWith[EmbDedup.VecTs](name, mk) _
      run("passthrough")(df => df)
      run("banded")(df => EmbDedup.bandedRows(df.withWatermark("ts", "10 minutes"),
        carry = Seq("ts")))
      run("rep_ttl")(df => EmbDedup.incrementalCandidatesTtl(df).toDF())
      run("probes_no_ttl")(df =>
        EmbDedup.probes(df.drop("ts")).toDF())
      run("probes_ttl")(df => EmbDedup.probesTtl(df).toDF())
    }
    spark.stop()
  }
}
