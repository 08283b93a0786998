package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.{DocDedup, EmbDedup}

/** Streaming ingest-dedup throughput micro-bench (VERDICT r6 #7): feed
  * synthetic documents through [[DocDedup.incrementalCandidatesTtl]] —
  * scan-local MinHash banding → RocksDB-backed per-bucket state with
  * event-time TTL timers — in fixed-size micro-batches and report
  * rows/sec as one JSON line (the BENCH_rN_stream.json artifact).
  * `op=embrep` (VERDICT r8 #4) runs the EMBEDDING twin instead:
  * [[EmbDedup.incrementalCandidatesTtl]] — scan-local hyperplane-SimHash
  * banding → single-representative RocksDB TTL bucket state, the exact
  * mirror of the doc leg's operator. `op=embprobe` runs the heavier
  * best-match VERDICT feeder [[EmbDedup.probesTtl]] instead (full
  * vectors + norms in per-bucket member LISTS, one probe per arrival
  * per band — O(cap) state work where the rep path is O(1); bench both
  * to see the contract's price). The bare `op=emb` name is REJECTED:
  * it meant probesTtl in BENCH_r08_stream.json and
  * incrementalCandidatesTtl in BENCH_r09_stream.json (ADVICE r9 —
  * compare artifacts by their JSON `op` field, which always recorded
  * the real operator, never by the CLI flag).
  *
  * Texts cycle through the sf0.01 documents fixture (real token
  * distributions, including its hot LSH buckets) under fresh ids with
  * monotonically increasing event times, so every row exercises banding,
  * state lookup/update, and timer re-arming. The emb leg cycles the
  * embeddings fixture the same way.  Wall time covers the full
  * query lifecycle across all micro-batches (processAllAvailable per
  * batch — commit latency included, the honest ingest number).
  *
  * Usage: StreamBench [rows=50000] [batchSize=5000] [sfDir=sf0.01 path]
  *                    [op=doc|embrep|embprobe]
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toInt else 50000
    val batchSize = if (args.length > 1) args(1).toInt else 5000
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.01"
    val op = if (args.length > 3) args(3) else "doc"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    // Shuffle width = state-store SHARD count for a streaming stateful
    // op (fixed at first checkpoint). Decoupled from cores (VERDICT r11
    // #7) so the state-sharding scaling leg can vary one without the
    // other; SPARK_GRAFT_MASTER mirrors Verify's multi-JVM override.
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val spark = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.nanosAsLongConf, "true")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      // Deployment posture for streaming state (r8 profile: full-snapshot
      // uploads per commit were ~45% of ingest wall time): commit the
      // RocksDB CHANGELOG per batch and snapshot only at the maintenance
      // interval — the per-batch cost becomes O(batch writes), not
      // O(total state).
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true")
      // No-data micro-batches exist to fire event-time timers promptly
      // while input pauses; for this operator expiry emits nothing, so
      // the extra empty batch per step only doubles the fsync-bound
      // commit count (r8 profile: 2× ingest cost). Deferring timer
      // processing to the next data batch is one-sided the same way the
      // quantized timers are: the dedup horizon is a superset of ttl —
      // a rep can linger past expiry until the next batch touches the
      // store, never vanish early.
      .config("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val t0ms = 1700000000000L // fixed epoch base — deterministic event times
    val checkpoint = java.nio.file.Files
      .createTempDirectory("streambench-ckpt").toString

    // One (query, per-batch feeder) pair per op: the harness below is
    // op-agnostic — it only pumps batches and times commits.
    val (query, feed) = op match {
      case "doc" =>
        val texts = Tables.documents(spark, sfDir)
          .orderBy("doc_id").select("text").collect().map(_.getString(0))
        val in = MemoryStream[DocDedup.TsDoc]
        val q = DocDedup.incrementalCandidatesTtl(in.toDF())
          .writeStream.format("noop")
          .option("checkpointLocation", checkpoint)
          .start()
        (q, (from: Int, n: Int) => in.addData((0 until n).map { j =>
          val id = (from + j).toLong
          DocDedup.TsDoc(id, texts((id % texts.length).toInt),
            new Timestamp(t0ms + id * 10L))
        }))
      case "emb" =>
        sys.error("op 'emb' is ambiguous (probesTtl in r8 artifacts, " +
          "incrementalCandidatesTtl in r9) — use 'embrep' or 'embprobe'")
      case "embrep" | "embprobe" =>
        val vecs = Tables.embeddings(spark, sfDir)
          .orderBy("vec_id").select("embedding").collect()
          .map(_.getSeq[Float](0).map(_.toDouble))
        val in = MemoryStream[EmbDedup.VecTs]
        val pipe =
          if (op == "embrep") EmbDedup.incrementalCandidatesTtl(in.toDF()).toDF()
          else EmbDedup.probesTtl(in.toDF()).toDF()
        val q = pipe
          .writeStream.format("noop")
          .option("checkpointLocation", checkpoint)
          .start()
        (q, (from: Int, n: Int) => in.addData((0 until n).map { j =>
          val id = (from + j).toLong
          EmbDedup.VecTs(id, vecs((id % vecs.length).toInt),
            new Timestamp(t0ms + id * 10L))
        }))
      case other => sys.error(s"unknown op '$other' (doc|embrep|embprobe)")
    }

    val start = System.nanoTime()
    var emitted = 0
    val batchSecs = Seq.newBuilder[Double]
    while (emitted < rows) {
      val n = math.min(batchSize, rows - emitted)
      val b0 = System.nanoTime()
      feed(emitted, n)
      query.processAllAvailable()
      batchSecs += (System.nanoTime() - b0) / 1e9
      emitted += n
    }
    val secs = (System.nanoTime() - start) / 1e9
    query.stop()
    val rps = rows / secs
    val bs = batchSecs.result()
    val perBatch = bs.map(s => f"$s%.3f").mkString("[", ",", "]")
    // steady state = excluding the first batch (plan compile + codegen +
    // store creation — fixed costs a long-running ingest amortizes away)
    val steady =
      if (bs.size > 1) (rows - batchSize) / bs.tail.sum else rps
    val opName = op match {
      case "embrep" => "EmbDedup.incrementalCandidatesTtl"
      case "embprobe" => "EmbDedup.probesTtl"
      case _ => "incrementalCandidatesTtl"
    }
    println(f"""{"metric":"stream_rows_per_sec","value":$rps%.1f,"unit":"rows/sec","steady_rows_per_sec":$steady%.1f,"op":"$opName","store":"rocksdb","changelog_checkpointing":true,"no_data_batches":false,"rows":$rows,"batch_size":$batchSize,"batches":${(rows + batchSize - 1) / batchSize},"secs":$secs%.3f,"batch_secs":$perBatch,"shuffle_partitions":$shufflePartitions,"master":"$master","sf":"$sfDir"}""")
    spark.stop()
  }
}
