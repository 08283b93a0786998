package graft

import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.operators.TextPipeline

/** Hot-bucket guard for the MinHash-LSH candidate join
  * (TextPipeline.bucketGuardedCandidates): on a degenerate corpus where
  * one band bucket swallows ~everything, candidate generation must stay
  * LINEAR in bucket size (star edges), never quadratic (all-pairs) —
  * while keeping dedup-cluster connectivity intact.
  */
class LshGuardSpec extends SparkSpec {
  import spark.implicits._

  private val N = 300
  // Adversarial corpus: N byte-identical documents → identical word sets
  // → identical MinHash signature → ONE bucket per band holding all N.
  private def skewedSets = {
    val docs = (0L until N.toLong)
      .map(i => (i, "alpha beta gamma delta epsilon zeta")).toSeq
      .toDF("doc_id", "text")
    Text.tokens(docs).select("doc_id", "word").distinct()
  }

  test("adversarial corpus collapses into one bucket per band (premise)") {
    val buckets = TextPipeline.minHashBanded(skewedSets)
      .groupBy("band", "bsig").count().collect()
    assert(buckets.length === TextPipeline.LshBands)
    assert(buckets.forall(_.getLong(2) === N.toLong))
  }

  test("oversized buckets emit linear star edges, not quadratic all-pairs") {
    val cap = 8
    val cand = TextPipeline.bucketGuardedCandidates(
      TextPipeline.minHashBanded(skewedSets), cap)
    // star topology: every doc linked to the bucket-min (doc 0), N-1 pairs
    // total — NOT n(n-1)/2 = 44850
    val pairs = cand.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length === N - 1)
    assert(pairs.forall(_._1 == 0L), "every star edge anchors at the bucket min")
    assert(pairs.map(_._2).sorted.toSeq === (1L until N.toLong))
  }

  test("per-bucket pair count is bounded by max(cap choose 2, bucket size)") {
    // mixed corpus: one giant identical-doc bucket + distinct small docs
    val docs = ((0L until 100L).map(i => (i, "alpha beta gamma delta")) ++
      (100L until 120L).map(i => (i, s"unique$i words here number$i"))).toSeq
      .toDF("doc_id", "text")
    val sets = Text.tokens(docs).select("doc_id", "word").distinct()
    val cap = 8
    val cand = TextPipeline.bucketGuardedCandidates(
      TextPipeline.minHashBanded(sets), cap)
    // giant bucket contributes 99 star edges; small buckets at most
    // cap*(cap-1)/2 = 28 pairs each — nothing quadratic in 100
    assert(cand.count() <= 99L + 20L * cap * (cap - 1) / 2)
  }

  test("star edges preserve dedup-cluster connectivity end-to-end") {
    val verified = TextPipeline.minHashLshPairs(skewedSets, 0.8, maxBucket = 8)
    val rows = verified.collect()
    assert(rows.length === N - 1)
    assert(rows.forall(_.getDouble(2) === 1.0), "identical docs verify at jac=1")
    val comps = TextPipeline.connectedComponents(verified.select("a", "b"))
      .select("rep").distinct().collect()
    assert(comps.length === 1, "all identical docs stay in ONE cluster")
  }

  test("hamming guard: identical simhashes emit linear star pairs; " +
    "cap<=0 restores exact all-pairs") {
    // N identical 16-bit signatures → every band bucket holds all N
    val sigs = (0L until N.toLong).map(i => (i, 0xA5C3L)).toSeq
      .toDF("doc_id", "simhash")
    val guarded = TextPipeline.hammingNeighborPairs(sigs, k = 3, maxBucket = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(guarded.length === N - 1, s"want ${N - 1} star pairs, got ${guarded.length}")
    assert(guarded.forall(_._1 == 0L), "every star edge anchors at the bucket min")
    assert(guarded.forall(_._3 == 0L), "identical signatures are at distance 0")
    assert(guarded.map(_._2).sorted.toSeq === (1L until N.toLong))
    val exact = TextPipeline.hammingNeighborPairs(sigs, k = 3, maxBucket = 0)
    assert(exact.count() === N.toLong * (N - 1) / 2, "cap<=0 must be all-pairs exact")
  }

  test("hamming guard: default cap leaves the q50 corpus on the exact path") {
    val sigs = TextPipeline.simhashOf(spark, sf0001)
    val nBands = 4 // k=3 → 4 bands of 4 bits, q50's configuration
    val biggest = sigs
      .select(col("doc_id"), col("simhash"),
        explode(sequence(lit(0), lit(nBands - 1))).as("bandIdx"))
      .withColumn("bandVal", expr("shiftright(simhash, bandIdx * 4) & 15"))
      .groupBy("bandIdx", "bandVal").count()
      .agg(max("count")).head().getLong(0)
    assert(biggest <= TextPipeline.LshMaxBucket,
      s"q50 fixture bucket sizes (max $biggest) must stay under the default cap " +
        "or q50's exact-enumeration oracle breaks")
  }

  test("default cap leaves the fixture corpus on the exact all-pairs path") {
    val sets = Text.tokens(Tables.documents(spark, sf0001))
      .where(col("doc_id") < 100).select("doc_id", "word").distinct()
    val maxBucket = TextPipeline.minHashBanded(sets)
      .groupBy("band", "bsig").count().agg(max("count")).head().getLong(0)
    assert(maxBucket <= TextPipeline.LshMaxBucket,
      s"fixture bucket sizes (max $maxBucket) must stay under the default cap " +
        "or q37's recall contract changes")
  }
}
