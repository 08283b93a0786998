package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import org.apache.spark.sql.graftvec.{CosineSim, DotProduct, JaroWinkler}

/** SparkSessionExtensions hook: makes the native vector expressions
  * available from SQL (`SELECT cosine_sim(a, b)`) when the session is
  * built with `spark.sql.extensions=graft.GraftExtensions`. The Scala
  * API (`VectorExpressions.cosineSim`) works without any session config.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def binary(name: String, make: (Expression, Expression) => Expression) =
    (
      FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, name),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"$name expects 2 arguments, got ${args.length}")
        make(args(0), args(1))
      })

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(binary("cosine_sim", CosineSim))
    ext.injectFunction(binary("dot_product", DotProduct))
    ext.injectFunction(binary("jaro_winkler", JaroWinkler))
    ext.injectFunction(adcDistance)
    ext.injectFunction(hyperplaneSig)
    ext.injectFunction(polyHash)
    ext.injectFunction(bigramHashStats)
    ext.injectFunction(wordNgrams)
    ext.injectFunction(hasMinWords)
    ext.injectCheckRule(spark => CrossJoinGuard.check(spark))
    // opt-in (spark.graft.lsh.autoRewrite.enabled) cosine-join → LSH rewrite
    ext.injectOptimizerRule(_ => graft.plans.LshJoinRewrite)
  }

  /** `adc_distance(lut, codes, ksub)` — ksub must be a literal. */
  private def adcDistance = (
    FunctionIdentifier("adc_distance"),
    new ExpressionInfo(classOf[GraftExtensions].getName, "adc_distance"),
    GraftExtensions.buildAdcDistance _)

  /** `hyperplane_sig(vec[, bits[, seed]])` — bits/seed must be literals. */
  private def hyperplaneSig = (
    FunctionIdentifier("hyperplane_sig"),
    new ExpressionInfo(classOf[GraftExtensions].getName, "hyperplane_sig"),
    GraftExtensions.buildHyperplaneSig _)

  /** `poly_hash(str[, seed])` — seed must be a literal. */
  private def polyHash = (
    FunctionIdentifier("poly_hash"),
    new ExpressionInfo(classOf[GraftExtensions].getName, "poly_hash"),
    GraftExtensions.buildPolyHash _)

  /** `bigram_hash_stats(text)`. */
  private def bigramHashStats = (
    FunctionIdentifier("bigram_hash_stats"),
    new ExpressionInfo(classOf[GraftExtensions].getName, "bigram_hash_stats"),
    GraftExtensions.buildBigramHashStats _)

  /** `word_ngrams(text, n)` — n must be a literal. */
  private def wordNgrams = (
    FunctionIdentifier("word_ngrams"),
    new ExpressionInfo(classOf[GraftExtensions].getName, "word_ngrams"),
    GraftExtensions.buildWordNgrams _)

  /** `has_min_words(text, k)` — k must be a literal. */
  private def hasMinWords = (
    FunctionIdentifier("has_min_words"),
    new ExpressionInfo(classOf[GraftExtensions].getName, "has_min_words"),
    GraftExtensions.buildHasMinWords _)
}

object GraftExtensions {
  /** Builds `hyperplane_sig(vec[, bits[, seed]])` from SQL args —
    * bits/seed must be literals (they parameterize codegen). */
  def buildHyperplaneSig(args: Seq[Expression]): Expression = {
    require(args.nonEmpty && args.length <= 3,
      s"hyperplane_sig expects 1-3 arguments, got ${args.length}")
    require(args.drop(1).forall(_.foldable), "bits/seed must be literals")
    val bits = if (args.length > 1) args(1).eval().asInstanceOf[Number].intValue else 64
    val seed = if (args.length > 2) args(2).eval().asInstanceOf[Number].longValue else 42L
    org.apache.spark.sql.graftvec.HyperplaneSig(args(0), bits, seed)
  }

  /** Register the same functions on an ALREADY-RUNNING session (the
    * extensions config only applies when the SparkContext is first
    * built). Idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    Seq[(String, (Expression, Expression) => Expression)](
      "cosine_sim" -> (CosineSim(_, _)),
      "dot_product" -> (DotProduct(_, _)),
      "jaro_winkler" -> (JaroWinkler(_, _))
    ).foreach { case (name, make) =>
      reg.createOrReplaceTempFunction(
        name, args => make(args(0), args(1)), "built-in")
    }
    reg.createOrReplaceTempFunction(
      "adc_distance", buildAdcDistance, "built-in")
    reg.createOrReplaceTempFunction(
      "hyperplane_sig", buildHyperplaneSig, "built-in")
    reg.createOrReplaceTempFunction(
      "poly_hash", buildPolyHash, "built-in")
    reg.createOrReplaceTempFunction(
      "bigram_hash_stats", buildBigramHashStats, "built-in")
    reg.createOrReplaceTempFunction(
      "word_ngrams", buildWordNgrams, "built-in")
    reg.createOrReplaceTempFunction(
      "has_min_words", buildHasMinWords, "built-in")
  }

  /** Builds `adc_distance(lut, codes, ksub)` from SQL args — ksub must
    * be a literal (it is the codegen-time LUT stride). */
  def buildAdcDistance(args: Seq[Expression]): Expression = {
    require(args.length == 3,
      s"adc_distance expects 3 arguments, got ${args.length}")
    require(args(2).foldable, "ksub must be a literal")
    org.apache.spark.sql.graftvec.AdcDistance(
      args(0), args(1), args(2).eval().asInstanceOf[Number].intValue)
  }

  /** Builds `has_min_words(text, k)` from SQL args — k must be a
    * literal (it parameterizes codegen). */
  def buildHasMinWords(args: Seq[Expression]): Expression = {
    require(args.length == 2,
      s"has_min_words expects 2 arguments, got ${args.length}")
    require(args(1).foldable, "k must be a literal")
    org.apache.spark.sql.graftvec.HasMinWords(
      args(0), args(1).eval().asInstanceOf[Number].intValue)
  }

  /** Builds `bigram_hash_stats(text)` from SQL args. */
  def buildBigramHashStats(args: Seq[Expression]): Expression = {
    require(args.length == 1,
      s"bigram_hash_stats expects 1 argument, got ${args.length}")
    org.apache.spark.sql.graftvec.BigramHashStats(args(0))
  }

  /** Builds `word_ngrams(text, n)` from SQL args — n must be a literal
    * (it parameterizes codegen). */
  def buildWordNgrams(args: Seq[Expression]): Expression = {
    require(args.length == 2,
      s"word_ngrams expects 2 arguments, got ${args.length}")
    require(args(1).foldable, "n must be a literal")
    org.apache.spark.sql.graftvec.WordNgrams(
      args(0), args(1).eval().asInstanceOf[Number].intValue)
  }

  /** Builds `poly_hash(str[, seed])` from SQL args — seed must be a
    * literal (it parameterizes codegen). */
  def buildPolyHash(args: Seq[Expression]): Expression = {
    require(args.nonEmpty && args.length <= 2,
      s"poly_hash expects 1-2 arguments, got ${args.length}")
    require(args.drop(1).forall(_.foldable), "seed must be a literal")
    val seed = if (args.length > 1) args(1).eval().asInstanceOf[Number].longValue else 7L
    org.apache.spark.sql.graftvec.PolyHash(args(0), seed)
  }
}
