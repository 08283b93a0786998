package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Cosine / ANN operators vs hand-computed values + recall of the IVF
  * scale path against the exact brute-force answer. */
class SimilaritySpec extends SparkSpec {

  private def df(vecs: (Long, Seq[Float])*) = {
    import spark.implicits._
    vecs.toSeq.toDF("vec_id", "embedding")
  }

  test("cosineTopK hand-computed on orthogonal + parallel vectors") {
    val d = df(
      0L -> Seq(1f, 0f, 0f),
      1L -> Seq(2f, 0f, 0f),   // cos(0,1)=1
      2L -> Seq(0f, 1f, 0f),   // cos(0,2)=0
      3L -> Seq(1f, 1f, 0f))   // cos(0,3)=~0.7071
    val got = Similarity.cosineTopK(d, col("vec_id") === 0, 3)
      .select("qid", "nid", "cos", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (0L, 1L, 1.0, 1L), (0L, 3L, 0.7071, 2L), (0L, 2L, 0.0, 3L)))
  }

  test("ivfTopK: high recall vs exact top-k on fixture embeddings") {
    val emb = Tables.embeddings(spark, sf0001)
    val pred = col("vec_id") < 5
    def pairs(dfr: org.apache.spark.sql.DataFrame) =
      dfr.select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.cosineTopK(emb, pred, 5))
    val approx = pairs(Similarity.ivfTopK(emb, pred, 5, nCells = 8, nProbe = 4))
    assert(approx.size == 25) // 5 queries × k=5
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall too low: $recall")
  }

  test("probeTopK on a SAVED centroid table == inline ivfTopK") {
    val emb = Tables.embeddings(spark, sf0001)
    val pred = col("vec_id") < 5
    val dir = java.nio.file.Files.createTempDirectory("graft-centroids").toString
    // train once → persist → reload → probe: the amortized IVF lifecycle
    Similarity.trainCentroids(emb, nCells = 8, kmeansIters = 2)
      .write.mode("overwrite").parquet(dir)
    val saved = spark.read.parquet(dir)
    val viaSaved = Similarity.probeTopK(emb, saved, pred, 5, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val inline = Similarity.ivfTopK(emb, pred, 5, nCells = 8, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(viaSaved.nonEmpty && viaSaved.sameElements(inline),
      "saved-centroid probe must reproduce the inline IVF result exactly")
  }

  test("dedupEmbeddings: identical-vector corpus keeps ONE survivor, " +
    "guarded buckets stay linear") {
    // 200 copies of the same vector + 3 mutually-orthogonal singletons:
    // every band bucket of the copies holds all 200 (over any small cap)
    val d = df(
      ((0L until 200L).map(i => i -> Seq(1f, 2f, 3f, 4f)) ++
        Seq(200L -> Seq(1f, 0f, 0f, 0f), 201L -> Seq(0f, 1f, 0f, 0f),
          202L -> Seq(0f, 0f, 1f, 0f))): _*)
    val cand = operators.TextPipeline.bucketGuardedCandidates(
      Similarity.hyperplaneBanded(d), cap = 8, idCol = "vec_id")
    // identical vectors share every band bucket → star edges only from
    // those buckets: candidate count is LINEAR (199 + a few singleton
    // collisions), nowhere near 200*199/2 = 19900
    assert(cand.count() <= 199L + 3 * 16)
    val kept = Similarity.dedupEmbeddings(d, 0.9, "lsh", maxBucket = 8)
      .select("vec_id").collect().map(_.getLong(0)).sorted
    assert(kept.contains(0L), "min-id representative survives")
    assert(!kept.exists(k => k > 0L && k < 200L), "all other copies removed")
    assert(Seq(200L, 201L, 202L).forall(kept.contains), "orthogonal vectors kept")
  }

  test("dedupEmbeddings: method=auto matches exact below the crossover " +
    "and lsh above it") {
    val emb = Tables.embeddings(spark, sf0001).where(col("vec_id") < 200)
    assert(emb.count() < Similarity.AutoDedupCrossover) // premise: small side
    val auto = Similarity.dedupEmbeddings(emb, 0.3, "auto")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val exact = Similarity.dedupEmbeddings(emb, 0.3, "exact")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(auto == exact, "small corpus must ride the exact path")
    // the decision function itself, at the boundary
    assert(Similarity.chooseDedupMethod(Similarity.AutoDedupCrossover - 1) == "exact")
    assert(Similarity.chooseDedupMethod(Similarity.AutoDedupCrossover) == "lsh")
    // end-to-end above the crossover (rides lsh): an identical-vector
    // flood still collapses to the single min-id survivor
    val big = spark.range(0, Similarity.AutoDedupCrossover + 64)
      .select(col("id").as("vec_id"),
        array(lit(1.0f), lit(2.0f), lit(3.0f)).as("embedding"))
    val bigKept = Similarity.dedupEmbeddings(big.toDF(), 0.9, "auto")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(bigKept == Set(0L), "identical-vector flood must keep vec_id 0 only")
  }

  test("dedupEmbeddings: exact survivors ⊆ LSH survivors on fixture") {
    val emb = Tables.embeddings(spark, sf0001).where(col("vec_id") < 200)
    val exact = Similarity.dedupEmbeddings(emb, 0.3, "exact")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val lsh = Similarity.dedupEmbeddings(emb, 0.3, "lsh")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // a missed LSH pair can only SPLIT a cluster — every exact cluster's
    // min-id rep is also the min of whichever LSH sub-cluster holds it
    assert(exact.subsetOf(lsh),
      s"exact-only survivors: ${(exact -- lsh).toSeq.sorted.take(5)}")
    assert(exact.nonEmpty && lsh.size <= 200)
  }
}
