package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.operators.TextPipeline

/** Incremental (streaming) EMBEDDING near-duplicate detection — the
  * vector twin of [[DocDedup]], mirroring batch
  * [[graft.operators.Similarity.dedupEmbeddings]] the way DocDedup
  * mirrors `dedupCorpus`:
  *
  *  - hyperplane-LSH banding is SCAN-LOCAL (the codegen
  *    `hyperplane_sig` expression — same bits/bands/seed math as the
  *    batch path and the Catalyst rewrite), so a stream pays no
  *    signature shuffle;
  *  - per-(band, bsig) bucket state holds up to `cap` member vectors
  *    (the batch hot-bucket guard bound) and every arrival emits ONE
  *    best-match probe per band, verified by EXACT cosine;
  *  - [[verdictQuery]] folds probes into irrevocable greedy per-arrival
  *    keep/drop verdicts; [[survivorQuery]] maintains an epoch-snapshot
  *    survivor index that is golden-EQUAL to batch
  *    `dedupEmbeddings(method = "lsh")` over everything ingested so far
  *    (same candidate relation, same cosine verification, same
  *    components and min-id election) when neither side's bucket cap
  *    truncates. The greedy-vs-transitive contrast is the same as
  *    DocDedup's and is documented there.
  *
  * ZERO-NORM CONTRACT (batch and stream agree): cosine similarity is
  * undefined for a zero vector, so a zero-norm embedding is never a
  * duplicate of anything and nothing is a duplicate of it — it always
  * receives a keep verdict, survives batch dedup (the exact-cosine
  * filter evaluates NaN ≥ τ as false), and is never stored as a bucket
  * member, so NaN never participates in a best-match comparison.
  */
object EmbDedup {

  /** The minimal incoming shape. */
  case class Vec(vec_id: Long, embedding: Seq[Double])

  /** One banded-signature row carrying the (double-cast) vector. */
  case class BandRowV(vec_id: Long, band: Int, bsig: Long, v: Seq[Double])

  /** One banded probe: best stored-member match of `vec_id` in `band`
    * (`dup_of = -1` when the bucket had nothing to compare to). */
  case class Probe(vec_id: Long, band: Int, dup_of: Long, cos: Double)

  // public: the state-encoder's generated code calls the accessors
  case class VecRep(rep_id: Long, v: Seq[Double], nrm: Double)

  /** [[Vec]] with an event time — the TTL variant's incoming shape. */
  case class VecTs(vec_id: Long, embedding: Seq[Double], ts: java.sql.Timestamp)

  /** [[BandRowV]] carrying the event time. */
  case class BandRowVTs(vec_id: Long, band: Int, bsig: Long, v: Seq[Double],
                        ts: java.sql.Timestamp)

  /** Banded rows for a `(vec_id, embedding)` frame, scan-local — the
    * carry-the-vector form of `Similarity.hyperplaneBanded` (same
    * signature math, pinned against it in StreamingSpec). Works on both
    * static and streaming input; `carry` forwards extra columns (the
    * TTL variant rides the event time through). */
  def bandedRows(emb: DataFrame, bits: Int = 64, bands: Int = 16,
                 seed: Long = 42L, carry: Seq[String] = Nil): DataFrame = {
    require(bits >= 1 && bits <= 64 && bands >= 1 && bits % bands == 0)
    val rows = bits / bands
    val mask = if (rows == 64) -1L else (1L << rows) - 1L
    val sig = emb
      .withColumn("v", transform(col("embedding"), _.cast("double")))
      .withColumn("sig",
        graft.expressions.VectorExpressions.hyperplaneSig(col("v"), bits, seed))
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        shiftrightunsigned(col("sig"), b * rows).bitwiseAND(lit(mask)).as("bsig"))
    }
    val carried = carry.map(col)
    sig.select(col("vec_id") +: explode(array(bandCols: _*)).as("bd") +:
        col("v") +: carried: _*)
      .select(col("vec_id") +: col("bd.band").as("band") +:
        col("bd.bsig").as("bsig") +: col("v") +: carried: _*)
  }

  /** [[DocDedup.WordBucketProcessor]] for vectors: up to `cap` member
    * vectors per bucket, one best-match probe (max exact cosine, ties →
    * min vec_id) per arrival per band. Threshold-free — the fold
    * applies it. */
  class VecBucketProcessor(cap: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[(Int, Long), BandRowV, Probe] {
    import org.apache.spark.sql.streaming.{ListState, OutputMode, TimeMode, TimerValues, TTLConfig}
    import org.apache.spark.sql.Encoders

    @transient private var members: ListState[VecRep] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      members = getHandle.getListState[VecRep](
        "members", Encoders.product[VecRep], TTLConfig.NONE)

    private def norm(v: Seq[Double]): Double =
      math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x))

    override def handleInputRows(key: (Int, Long), rows: Iterator[BandRowV],
                                 timers: TimerValues): Iterator[Probe] = {
      val sorted = rows.toArray.sortBy(_.vec_id)
      val out = Seq.newBuilder[Probe]
      val stored = scala.collection.mutable.ArrayBuffer.empty[VecRep]
      members.get().foreach(stored += _)
      sorted.foreach { r =>
        if (stored.exists(_.rep_id == r.vec_id)) {
          out += Probe(r.vec_id, key._1, -1L, 0.0)
        } else {
          val rn = norm(r.v)
          var bestId = -1L
          var bestCos = Double.MinValue
          // zero-norm contract: cosine is undefined for a zero vector, so
          // a zero-norm arrival matches nothing (kept, dup_of = -1) and
          // is never stored; zero-norm stored members (legacy state) are
          // skipped — NaN never enters the comparison, matching the batch
          // path where `cos >= threshold` is false for NaN
          if (rn > 0.0) stored.foreach { m =>
            if (m.nrm > 0.0) {
              var d = 0.0
              var i = 0
              while (i < r.v.length) { d += m.v(i) * r.v(i); i += 1 }
              val cos = d / (m.nrm * rn)
              if (cos > bestCos || (cos == bestCos && bestId >= 0 && m.rep_id < bestId))
                { bestId = m.rep_id; bestCos = cos }
            }
          }
          out += Probe(r.vec_id, key._1, bestId,
            if (bestId >= 0) bestCos else 0.0)
          if (rn > 0.0 && stored.size < cap) {
            val w = VecRep(r.vec_id, r.v, rn)
            stored += w
            members.appendValue(w)
          }
        }
      }
      out.result().iterator
    }
  }

  /** Per-band probes for a streaming `(vec_id, embedding)` frame. */
  def probes(emb: DataFrame,
             cap: Int = TextPipeline.LshMaxBucket): Dataset[Probe] = {
    import emb.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    bandedRows(emb).as[BandRowV]
      .groupByKey(r => (r.band, r.bsig))
      .transformWithState(new VecBucketProcessor(cap),
        TimeMode.None(), OutputMode.Append())
  }

  /** [[VecBucketProcessor]] with EVENT-TIME TTL on the stored members
    * ([[DocDedup.TtlBucketProcessor]] pattern): every bucket arrival
    * re-arms a timer at `last event time + ttl`; when the watermark
    * passes it the bucket's member list is cleared, so state is bounded
    * by event-time-ACTIVE buckets. Same activity-anchored horizon as
    * the doc variant: any traffic into a bucket keeps its members
    * alive — the horizon is "ttl since last bucket activity", not
    * "since each member was admitted". */
  class VecBucketProcessorTtl(cap: Int, ttlMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[(Int, Long), BandRowVTs, Probe] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, TimeMode, TimerValues, TTLConfig}
    import org.apache.spark.sql.Encoders

    @transient private var members: ListState[VecRep] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      members = getHandle.getListState[VecRep](
        "members", Encoders.product[VecRep], TTLConfig.NONE)

    private def norm(v: Seq[Double]): Double =
      math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x))

    override def handleInputRows(key: (Int, Long), rows: Iterator[BandRowVTs],
                                 timers: TimerValues): Iterator[Probe] = {
      val sorted = rows.toArray.sortBy(r => (r.ts.getTime, r.vec_id))
      val out = Seq.newBuilder[Probe]
      val stored = scala.collection.mutable.ArrayBuffer.empty[VecRep]
      members.get().foreach(stored += _)
      sorted.foreach { r =>
        if (stored.exists(_.rep_id == r.vec_id)) {
          out += Probe(r.vec_id, key._1, -1L, 0.0)
        } else {
          val rn = norm(r.v)
          var bestId = -1L
          var bestCos = Double.MinValue
          // zero-norm contract: cosine is undefined for a zero vector, so
          // a zero-norm arrival matches nothing (kept, dup_of = -1) and
          // is never stored; zero-norm stored members (legacy state) are
          // skipped — NaN never enters the comparison, matching the batch
          // path where `cos >= threshold` is false for NaN
          if (rn > 0.0) stored.foreach { m =>
            if (m.nrm > 0.0) {
              var d = 0.0
              var i = 0
              while (i < r.v.length) { d += m.v(i) * r.v(i); i += 1 }
              val cos = d / (m.nrm * rn)
              if (cos > bestCos || (cos == bestCos && bestId >= 0 && m.rep_id < bestId))
                { bestId = m.rep_id; bestCos = cos }
            }
          }
          out += Probe(r.vec_id, key._1, bestId,
            if (bestId >= 0) bestCos else 0.0)
          if (rn > 0.0 && stored.size < cap) {
            val w = VecRep(r.vec_id, r.v, rn)
            stored += w
            members.appendValue(w)
          }
        }
      }
      // one armed timer per bucket, moved FORWARD only: a late-but-valid
      // row (within the watermark delay) whose event time is older than
      // the armed timer must not pull expiry backward — take the max of
      // the existing timer and this batch's newest activity + ttl
      val armed = getHandle.listTimers().foldLeft(Long.MinValue)(math.max)
      val target = math.max(armed, sorted.map(_.ts.getTime).max + ttlMs)
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
      getHandle.registerTimer(target)
      out.result().iterator
    }

    override def handleExpiredTimer(key: (Int, Long), timers: TimerValues,
                                    expired: ExpiredTimerInfo): Iterator[Probe] = {
      members.clear()
      Iterator.empty
    }
  }

  /** TTL variant of [[probes]] over a `(vec_id, embedding, ts)` stream:
    * bucket member lists age out after `ttlMs` of event-time bucket
    * inactivity (watermark-driven), bounding state on perpetual feeds —
    * the vector twin of [[DocDedup.incrementalCandidatesTtl]], same
    * activity-anchored expiry horizon. Requires a watermark on `ts`
    * (applied here) and the RocksDB state store provider. */
  def probesTtl(emb: DataFrame, cap: Int = TextPipeline.LshMaxBucket,
                ttlMs: Long = 24L * 3600 * 1000,
                lateness: String = "10 minutes"): Dataset[Probe] = {
    import emb.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    bandedRows(emb.withWatermark("ts", lateness), carry = Seq("ts"))
      .as[BandRowVTs]
      .groupByKey(r => (r.band, r.bsig))
      .transformWithState(new VecBucketProcessorTtl(cap, ttlMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Fold per-band probes into one verdict per vector — keep iff no
    * stored member reached the cosine threshold ([[DocDedup
    * .foldVerdicts]] with cosine in place of Jaccard). */
  def foldVerdicts(probes: DataFrame, threshold: Double): DataFrame = {
    val best = probes
      .where(col("dup_of") >= 0 && col("cos") >= threshold)
      .groupBy("vec_id")
      .agg(max(struct(round(col("cos"), 4).as("cos"),
        (-col("dup_of")).as("nd"))).as("b"))
      .select(col("vec_id"), (-col("b.nd")).as("dup_of"), col("b.cos").as("cos"))
    probes.select("vec_id").distinct()
      .join(best, Seq("vec_id"), "left")
      .select(col("vec_id"), col("dup_of").isNull.as("keep"),
        col("dup_of"), col("cos"))
  }

  /** Greedy per-arrival keep/drop verdicts for an embedding stream —
    * semantics exactly as [[DocDedup.verdictQuery]] (irrevocable at
    * arrival; batch min-id survivors are a subset; equal on
    * arrival-clique corpora). */
  def verdictQuery(emb: DataFrame, threshold: Double, outDir: String,
                   checkpointDir: String,
                   cap: Int = TextPipeline.LshMaxBucket)
      : org.apache.spark.sql.streaming.StreamingQuery =
    probes(emb, cap).writeStream
      .foreachBatch { (batch: Dataset[Probe], epochId: Long) =>
        foldVerdicts(batch.toDF(), threshold)
          .write.mode("overwrite").parquet(s"$outDir/epoch=$epochId")
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** One ingest epoch of [[survivorQuery]] — the vector
    * [[DocDedup.ingestEpoch]]: epoch-keyed idempotent stores (ids /
    * vectors+norms / banded rows), candidates touching only the NEW
    * batch against the standing banded index (batch bucket guard on the
    * current view), exact-cosine verification with the codegen dot
    * kernel, components over cumulative pairs, min-id election,
    * survivor snapshot at `outDir/epoch=N`. */
  def ingestEpoch(batch: DataFrame, threshold: Double, stateDir: String,
                  outDir: String, epochId: Long,
                  maxBucket: Int = TextPipeline.LshMaxBucket,
                  bandedTable: Option[String] = None,
                  indexBuckets: Int = 8,
                  pruneStandingBuckets: Int = 0): Unit = {
    val spark = batch.sparkSession
    val b = batch.persist()
    b.select("vec_id")
      .write.mode("overwrite").parquet(s"$stateDir/ids/epoch=$epochId")
    b.withColumn("v", transform(col("embedding"), _.cast("double")))
      .select(col("vec_id"), col("v"),
        sqrt(aggregate(col("v"), lit(0.0d), (a, x) => a + x * x)).as("nrm"))
      .write.mode("overwrite").parquet(s"$stateDir/vecs/epoch=$epochId")
    val bandedNew = bandedRows(b).select("vec_id", "band", "bsig")
    bandedTable match {
      case Some(t) =>
        // keyed (file-prunable) layout for new tables — see DocDedup
        val keyed = !spark.catalog.tableExists(t) ||
          spark.table(t).columns.contains("bkey")
        if (keyed)
          graft.operators.Layout.appendEpochBucketed(
            bandedNew.withColumn("bkey", hash(col("band"), col("bsig"))),
            t, indexBuckets, epochId, Seq("bkey"), Seq("band", "bsig"))
        else
          graft.operators.Layout.appendEpochBucketed(bandedNew, t,
            indexBuckets, epochId, Seq("band", "bsig"))
      case None =>
        bandedNew.write.mode("overwrite")
          .parquet(s"$stateDir/banded/epoch=$epochId")
    }
    b.unpersist()

    val bandedAll = bandedTable.map(spark.table)
      .getOrElse(spark.read.parquet(s"$stateDir/banded"))
    val bandCols =
      Seq("vec_id", "band", "bsig") ++
        (if (bandedAll.columns.contains("bkey")) Seq("bkey") else Nil)
    val allB = bandedAll.select(bandCols.head, bandCols.tail: _*)
    val newB = bandedAll.where(col("epoch") === epochId)
      .select(bandCols.head, bandCols.tail: _*)
    val vecs = spark.read.parquet(s"$stateDir/vecs")
      .select("vec_id", "v", "nrm")
    val dot = graft.expressions.VectorExpressions.dotProduct(col("va"), col("vb"))
    // subset-key co-partition knob — see DocDedup.ingestEpoch
    val coKey = "spark.sql.requireAllClusterKeysForCoPartition"
    val coPrev = spark.conf.getOption(coKey)
    spark.conf.set(coKey, "false")
    try {
      TextPipeline.incrementalGuardedCandidates(allB, newB, maxBucket,
          idCol = "vec_id", pruneBuckets = pruneStandingBuckets)
        .join(vecs.select(col("vec_id").as("a"), col("v").as("va"),
          col("nrm").as("na")), "a")
        .join(vecs.select(col("vec_id").as("b"), col("v").as("vb"),
          col("nrm").as("nb")), "b")
        .where(dot / (col("na") * col("nb")) >= threshold)
        .select("a", "b")
        .write.mode("overwrite").parquet(s"$stateDir/pairs/epoch=$epochId")
    } finally coPrev match {
      case Some(v) => spark.conf.set(coKey, v)
      case None => spark.conf.unset(coKey)
    }

    val allPairs = spark.read.parquet(s"$stateDir/pairs").select("a", "b")
    val losers =
      if (allPairs.isEmpty) allPairs.select(col("a").as("vec_id"))
      else TextPipeline.connectedComponents(allPairs)
        .where(col("id") =!= col("rep"))
        .select(col("id").as("vec_id"))
    // un-hinted anti join: losers is O(duplicate count) — AQE broadcasts
    // it when small, shuffles when a dup-heavy feed makes it O(corpus)
    spark.read.parquet(s"$stateDir/ids").select("vec_id")
      .join(losers, Seq("vec_id"), "left_anti")
      .write.mode("overwrite").parquet(s"$outDir/epoch=$epochId")
  }

  /** Streaming survivor-index maintenance for embeddings — every
    * epoch's snapshot equals batch `Similarity.dedupEmbeddings(lsh)`
    * over everything ingested so far (golden in StreamingSpec);
    * snapshots may revoke, exactly as [[DocDedup.survivorQuery]]
    * documents. */
  def survivorQuery(emb: DataFrame, threshold: Double, stateDir: String,
                    outDir: String, checkpointDir: String,
                    maxBucket: Int = TextPipeline.LshMaxBucket,
                    bandedTable: Option[String] = None,
                    indexBuckets: Int = 8,
                    pruneStandingBuckets: Int = 0)
      : org.apache.spark.sql.streaming.StreamingQuery =
    emb.writeStream
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        ingestEpoch(batch, threshold, stateDir, outDir, epochId, maxBucket,
          bandedTable, indexBuckets, pruneStandingBuckets)
      }
      .option("checkpointLocation", checkpointDir)
      .start()
}
