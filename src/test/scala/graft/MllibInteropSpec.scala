package graft

import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, CountVectorizer, MinHashLSH}
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.operators.TextPipeline

/** MLlib interop (SURVEY §2.9 L2/L3 name the MLlib LSH implementations
  * as the library alternative to our deterministic custom paths): the
  * engine's tables flow into ml.feature pipelines and the results agree
  * with the exact formulations. */
class MllibInteropSpec extends SparkSpec {

  test("MinHashLSH candidates agree with exact Jaccard on duplicate docs") {
    val docs = Tables.documents(spark, sf0001).where(col("doc_id") < 100)
      .select(col("doc_id"), Text.wordsOf(col("text")).as("words"))
    val cv = new CountVectorizer().setInputCol("words").setOutputCol("features")
      .setBinary(true).fit(docs)
    val vecs = cv.transform(docs).where(expr("aggregate(words, 0, (a, x) -> a + 1) > 0"))
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(8).setSeed(42L).fit(vecs)
    // jaccard distance <= 0.2  ⇔  jaccard similarity >= 0.8
    val pairs = lsh.approxSimilarityJoin(vecs, vecs, 0.2, "dist")
      .selectExpr("datasetA.doc_id AS a", "datasetB.doc_id AS b")
      .where(col("a") < col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = TextPipeline.exactJaccardPairs(
      Text.tokens(Tables.documents(spark, sf0001).where(col("doc_id") < 100))
        .select("doc_id", "word").distinct(), 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // approxSimilarityJoin verifies true distance on candidates →
    // precision is exact; identical docs always collide → they appear
    assert(pairs.subsetOf(exact), s"false positives: ${pairs -- exact}")
    assert(pairs.nonEmpty || exact.isEmpty, "LSH found no candidates")
  }

  test("BucketedRandomProjectionLSH top-1 matches exact cosine argmax for a query") {
    val emb = Tables.embeddings(spark, sf0001)
    import spark.implicits._
    val vecs = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])]
      .map { case (id, e) =>
        val arr = e.map(_.toDouble).toArray
        val n = math.sqrt(arr.map(x => x * x).sum)
        (id, Vectors.dense(arr.map(_ / n))) // unit norm: L2-NN == cosine-NN
      }.toDF("vec_id", "features")
    val lsh = new BucketedRandomProjectionLSH().setInputCol("features")
      .setOutputCol("hashes").setBucketLength(2.0).setNumHashTables(6)
      .setSeed(42L).fit(vecs)
    val query = vecs.where(col("vec_id") === 0)
      .collect()(0).getAs[org.apache.spark.ml.linalg.Vector]("features")
    val ann = lsh.approxNearestNeighbors(vecs.where(col("vec_id") =!= 0), query, 1)
      .toDF().select("vec_id").collect()(0).getLong(0)
    val exact = graft.operators.Similarity
      .cosineTopK(emb, col("vec_id") === 0, 1)
      .collect()(0).getAs[Long]("nid")
    assert(ann == exact, s"ANN top-1 $ann != exact top-1 $exact")
  }
}
