package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.operators.TextPipeline

/** Incremental (streaming) near-duplicate detection — the stream twin of
  * [[graft.operators.TextPipeline.dedupCorpus]]'s candidate stage, for
  * the ingest-time question "is this document a near-dup of anything
  * already admitted?" asked of an unbounded feed.
  *
  * Shape, end to end:
  *
  *  1. MinHash signatures are computed SCAN-LOCALLY: where the batch path
  *     aggregates exploded `(doc_id, word)` rows
  *     ([[TextPipeline.minHashBanded]]), a stream can't afford a
  *     signature shuffle per micro-batch, so each of the 16 hashes folds
  *     per-row with array HOFs (`array_min` over the transformed distinct
  *     word array). Same `(a,b)` parameter family and word hash → the
  *     signatures are IDENTICAL to the batch path's (pinned in
  *     StreamingSpec), so a corpus can move between the two pipelines.
  *  2. Banded bucket keys `(band, bsig)` key the arbitrary-state stage:
  *     each bucket's state is ONE representative (first doc_id to claim
  *     the bucket, plus its full signature) — O(1) state per bucket, the
  *     stream analog of the batch hot-bucket star guard
  *     ([[TextPipeline.bucketGuardedCandidates]]): every later arrival
  *     pairs with the representative only, never all-pairs, so a
  *     boilerplate flood emits O(n) edges and bounded state no matter how
  *     degenerate the feed.
  *  3. The estimated Jaccard (fraction of agreeing signature components —
  *     the standard MinHash estimator) is computed inside the processor
  *     from the stored signature and filtered at `tau`, so candidate
  *     verification needs no second join.
  *
  * A document colliding with the same representative in several bands
  * emits one [[DocDedup.Match]] per band (the `band` column keeps rows
  * distinct); consumers wanting one verdict per doc take
  * `max(est_jaccard)` per (doc_id, dup_of).
  *
  * State lifetime: one representative per observed bucket — the standing
  * dedup index, which is exactly what incremental ingest needs to
  * remember. Feeds where old representatives should age out re-arm an
  * event-time timer per bucket, the [[EventOps.TtlTotalsProcessor]]
  * pattern, unchanged here to keep the operator minimal.
  */
object DocDedup {

  /** The minimal incoming-document shape. */
  case class Doc(doc_id: Long, text: String)

  /** [[Doc]] with an event time, for the TTL variant. */
  case class TsDoc(doc_id: Long, text: String, ts: java.sql.Timestamp)

  /** One banded-signature row of an incoming document. */
  case class BandRow(doc_id: Long, band: Int, bsig: String, sig: Seq[Long])

  /** [[BandRow]] plus the document's event time. */
  case class BandRowTs(doc_id: Long, band: Int, bsig: String, sig: Seq[Long],
                       ts: java.sql.Timestamp)

  /** An admitted near-dup candidate: `doc_id` collided with the earlier
    * `dup_of` in `band`, with estimated Jaccard `est_jaccard`. */
  case class Match(doc_id: Long, dup_of: Long, band: Int, est_jaccard: Double)

  // public: the state-encoder's generated code calls the accessors
  case class BucketRep(rep_id: Long, sig: Seq[Long])

  /** Banded MinHash rows for a `(doc_id, text)` frame, scan-local (no
    * shuffle): per-row `array_min` folds replace the batch path's
    * group-by, with the same hash parameters (`TextPipeline.LshHashes`
    * hashes in `TextPipeline.LshBands` bands) so signatures match the
    * batch pipeline exactly. Works on both static and streaming input. */
  def bandedRows(docsIn: DataFrame, carry: Seq[String] = Nil): DataFrame = {
    // tokenless docs have no word rows on the batch path either
    val docs = docsIn.where(size(Text.wordsOf(col("text"))) > 0)
    val words = array_distinct(Text.wordsOf(col("text")))
    val hs = (0 until TextPipeline.LshHashes).map { i =>
      val (a, b) = (2L * i + 3L, 7L * i + 1L) // minHashBanded's family
      array_min(transform(words,
        w => (Text.polyHash(w, 7L) * a + b) % TextPipeline.P))
    }
    val rows = TextPipeline.LshHashes / TextPipeline.LshBands
    val bandCols = (0 until TextPipeline.LshBands).map { bnd =>
      struct(lit(bnd).as("band"),
        concat_ws("_",
          (0 until rows).map(r => col("sig")(bnd * rows + r)): _*).as("bsig"))
    }
    val kept = carry.map(col)
    docs.select(col("doc_id") +: array(hs: _*).as("sig") +: kept: _*)
      .select(col("doc_id") +: explode(array(bandCols: _*)).as("bd") +:
        col("sig") +: kept: _*)
      .select(col("doc_id") +: col("bd.band").as("band") +:
        col("bd.bsig").as("bsig") +: col("sig") +: kept: _*)
  }

  /** Per-bucket representative state: the first doc_id to claim the
    * bucket stays its representative; every later arrival is compared to
    * it and emitted iff the signature-estimated Jaccard reaches `tau`.
    * Within a micro-batch, rows are processed in doc_id order so the
    * representative (and therefore the output) is deterministic
    * regardless of partition iteration order. */
  class BucketProcessor(tau: Double)
      extends org.apache.spark.sql.streaming.StatefulProcessor[(Int, String), BandRow, Match] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders

    @transient private var rep: ValueState[BucketRep] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      rep = getHandle.getValueState[BucketRep](
        "rep", Encoders.product[BucketRep], TTLConfig.NONE)

    override def handleInputRows(key: (Int, String), rows: Iterator[BandRow],
                                 timers: TimerValues): Iterator[Match] = {
      val sorted = rows.toArray.sortBy(_.doc_id)
      val out = Seq.newBuilder[Match]
      var cur = Option(rep.get())
      sorted.foreach { r =>
        cur match {
          case None =>
            cur = Some(BucketRep(r.doc_id, r.sig))
            rep.update(cur.get)
          case Some(b) if b.rep_id == r.doc_id => () // replayed representative
          case Some(b) =>
            val est = b.sig.zip(r.sig).count { case (x, y) => x == y }
              .toDouble / b.sig.size
            if (est >= tau) out += Match(r.doc_id, b.rep_id, key._1, est)
        }
      }
      out.result().iterator
    }
  }

  /** Incremental near-dup candidates over a streaming `(doc_id, text)`
    * frame: one [[Match]] per (band collision with estimated Jaccard ≥
    * `tau`). The only shuffle per micro-batch is the keyed-state
    * exchange on `(band, bsig)`. Requires the RocksDB state store
    * provider (as all `transformWithState` ops do). */
  def incrementalCandidates(docs: DataFrame, tau: Double = 0.5): Dataset[Match] = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    bandedRows(docs).as[BandRow]
      .groupByKey(r => (r.band, r.bsig))
      .transformWithState(new BucketProcessor(tau),
        TimeMode.None(), OutputMode.Append())
  }

  /** [[BucketProcessor]] with EVENT-TIME TTL on the representative (the
    * [[EventOps.TtlTotalsProcessor]] pattern): every arrival re-arms a
    * timer at `last event time + ttl`; when the watermark passes it the
    * representative is dropped, so state is bounded by event-time-ACTIVE
    * buckets and a replay produces identical results at any speed. A
    * later document re-claims the bucket from scratch — the dedup
    * horizon becomes "anything admitted within the last ttl", which is
    * how a perpetual ingest feed keeps its index from growing without
    * bound. */
  class TtlBucketProcessor(tau: Double, ttlMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[(Int, String), BandRowTs, Match] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders

    @transient private var rep: ValueState[BucketRep] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      rep = getHandle.getValueState[BucketRep](
        "rep", Encoders.product[BucketRep], TTLConfig.NONE)

    override def handleInputRows(key: (Int, String), rows: Iterator[BandRowTs],
                                 timers: TimerValues): Iterator[Match] = {
      val sorted = rows.toArray.sortBy(r => (r.ts.getTime, r.doc_id))
      val out = Seq.newBuilder[Match]
      var cur = Option(rep.get())
      sorted.foreach { r =>
        cur match {
          case None =>
            cur = Some(BucketRep(r.doc_id, r.sig))
            rep.update(cur.get)
          case Some(b) if b.rep_id == r.doc_id => ()
          case Some(b) =>
            val est = b.sig.zip(r.sig).count { case (x, y) => x == y }
              .toDouble / b.sig.size
            if (est >= tau) out += Match(r.doc_id, b.rep_id, key._1, est)
        }
      }
      // one armed timer per bucket: slide expiry to the newest activity
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
      getHandle.registerTimer(sorted.map(_.ts.getTime).max + ttlMs)
      out.result().iterator
    }

    override def handleExpiredTimer(key: (Int, String), timers: TimerValues,
                                    expired: ExpiredTimerInfo): Iterator[Match] = {
      rep.clear()
      Iterator.empty
    }
  }

  /** TTL variant of [[incrementalCandidates]] over a `(doc_id, text,
    * ts)` stream: representatives age out after `ttlMs` of event-time
    * bucket inactivity (watermark-driven), bounding state on perpetual
    * feeds. Requires a watermark on `ts`. */
  def incrementalCandidatesTtl(docs: DataFrame, tau: Double = 0.5,
                               ttlMs: Long = 24L * 3600 * 1000,
                               lateness: String = "10 minutes"): Dataset[Match] = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    bandedRows(docs.withWatermark("ts", lateness), carry = Seq("ts"))
      .as[BandRowTs]
      .groupByKey(r => (r.band, r.bsig))
      .transformWithState(new TtlBucketProcessor(tau, ttlMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
