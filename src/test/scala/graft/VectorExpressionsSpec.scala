package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.expressions.VectorExpressions.{cosineSim, dotProduct}

class VectorExpressionsSpec extends SparkSpec {

  private def vecs = {
    import spark.implicits._
    Seq(
      (Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0)), // orthogonal → 0
      (Array(1.0, 2.0, 3.0), Array(2.0, 4.0, 6.0)), // parallel → 1
      (Array(3.0, 4.0, 0.0), Array(4.0, 3.0, 0.0))  // cos = 24/25
    ).toDF("a", "b")
  }

  test("cosine_sim on hand-computed vectors") {
    val got = vecs.select(round(cosineSim(col("a"), col("b")), 6)).collect().map(_.getDouble(0))
    assert(got.toSeq == Seq(0.0, 1.0, 0.96))
  }

  test("dot_product on hand-computed vectors") {
    val got = vecs.select(dotProduct(col("a"), col("b"))).collect().map(_.getDouble(0))
    assert(got.toSeq == Seq(0.0, 28.0, 24.0))
  }

  test("native dot is bit-identical to the HOF fold on fixture embeddings") {
    val e = Tables.embeddings(spark, sf0001).limit(50)
      .withColumn("v", transform(col("embedding"), _.cast("double")))
    val both = e.select(
      dotProduct(col("v"), col("v")).as("native"),
      aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
        lit(0.0d), (acc, x) => acc + x).as("hof"))
    assert(both.where(col("native") =!= col("hof")).count() == 0)
  }

  test("poly_hash native == HOF char fold on fixture text; unicode = code points") {
    // the HOF formulation polyHash replaced — kept here as the reference
    def hofHash(s: org.apache.spark.sql.Column, seed: Long) =
      aggregate(
        filter(split(s, ""), c => length(c) > 0),
        lit(seed),
        (acc, c) => (acc * 31L + ascii(c)) % graft.functions.Text.HashMod)
    val docs = Tables.documents(spark, sf0001).limit(100)
    val both = docs.select(
      graft.functions.Text.polyHash(col("text"), 7L).as("native"),
      hofHash(col("text"), 7L).as("hof"))
    assert(both.where(col("native") =!= col("hof")).count() == 0)
    // non-BMP input folds full code points (DuckDB unicode() semantics):
    // "a😀" → ((7*31+97) % M * 31 + 0x1F600) % M
    import spark.implicits._
    val got = Seq("a😀").toDF("s")
      .select(graft.functions.Text.polyHash(col("s"), 7L)).collect()(0).getLong(0)
    val expect = ((7L * 31 + 97) % graft.functions.Text.HashMod * 31 + 0x1F600) %
      graft.functions.Text.HashMod
    assert(got == expect)
  }

  test("poly_hash callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql("SELECT poly_hash('ab', 7)").collect()(0).getLong(0)
    val m = graft.functions.Text.HashMod
    assert(r == ((7L * 31 + 97) % m * 31 + 98) % m)
  }

  test("interpreted eval (null path) and nulls propagate") {
    val r = vecs.select(cosineSim(lit(null).cast("array<double>"), col("b"))).collect()
    assert(r.forall(_.isNullAt(0)))
  }

  test("cosine_sim / dot_product callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c,
        |       dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d""".stripMargin)
      .collect()(0)
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 11.0)
  }

  test("GraftExtensions injector wires both functions") {
    // exercise the SparkSessionExtensions path without a new context
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions()(ext) // must not throw; functions registered at build time
  }
}
