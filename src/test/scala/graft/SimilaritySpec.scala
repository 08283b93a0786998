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
}
