package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftvec.HyperplaneSig

import graft.expressions.VectorExpressions
import graft.operators.Similarity

/** The LSH cosine-join rewrite (graft.plans.LshJoinRewrite) and its
  * HyperplaneSig signature expression: signature properties, codegen vs
  * interpreted parity, plan shape (equi join, no nested-loop), precision
  * 1.0 / bounded recall vs the exact pair join, and the opt-in
  * optimizer-rule path producing the same rows as the explicit operator.
  */
class LshRewriteSpec extends SparkSpec {

  private def emb = Tables.embeddings(spark, sf0001)

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("hyperplane_sig: parallel vectors collide, negated vectors flip every bit") {
    import spark.implicits._
    val df = Seq((
      Array(0.3, -1.7, 2.2, 0.9),
      Array(0.6, -3.4, 4.4, 1.8),    // same direction
      Array(-0.3, 1.7, -2.2, -0.9))) // opposite direction
      .toDF("v", "par", "neg")
      .select(
        VectorExpressions.hyperplaneSig(col("v")).as("sv"),
        VectorExpressions.hyperplaneSig(col("par")).as("sp"),
        VectorExpressions.hyperplaneSig(col("neg")).as("sn"))
    val r = df.collect()(0)
    assert(r.getLong(0) == r.getLong(1), "parallel vectors must share the signature")
    assert(r.getLong(0) == ~r.getLong(2), "negation must flip all 64 bits")
  }

  test("hyperplane_sig: whole-stage codegen matches the interpreted eval") {
    val got = emb.limit(32)
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"))
      .withColumn("sig", VectorExpressions.hyperplaneSig(col("v"), bits = 64, seed = 42L))
      .collect()
    assert(got.nonEmpty)
    val expr = HyperplaneSig(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        null, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
      64, 42L)
    got.foreach { r =>
      val v = r.getSeq[Double](1).toArray
      val interpreted = expr.nullSafeEval(new GenericArrayData(v))
      assert(r.getLong(2) == interpreted.asInstanceOf[Long],
        s"codegen/interpreted drift for vec_id=${r.getLong(0)}")
    }
  }

  test("rewrite turns the nested-loop cosine join into an equi join") {
    val exact = Similarity.cosineThresholdPairs(emb, 100, 0.3)
    val exactPlan = exact.queryExecution.sparkPlan.toString
    assert(exactPlan.contains("NestedLoop") || exactPlan.contains("Cartesian"),
      s"exact twin should be the all-pairs plan, got:\n$exactPlan")
    val lsh = Similarity.lshNeardupPairs(emb, 100, 0.3)
    val lshPlan = lsh.queryExecution.sparkPlan.toString
    assert(!lshPlan.contains("NestedLoop") && !lshPlan.contains("Cartesian"),
      s"rewritten plan still all-pairs:\n$lshPlan")
    assert(lshPlan.contains("HashJoin") || lshPlan.contains("SortMergeJoin"),
      s"rewritten plan should join on (band idx, band):\n$lshPlan")
  }

  test("precision 1.0 and bounded recall vs the exact pair join") {
    val exact = pairs(Similarity.cosineThresholdPairs(emb, 200, 0.3))
    val lsh = pairs(Similarity.lshNeardupPairs(emb, 200, 0.3))
    assert(lsh.subsetOf(exact),
      s"LSH emitted pairs the exact join rejects: ${(lsh -- exact).take(5)}")
    assert(exact.nonEmpty)
    val recall = (exact intersect lsh).size.toDouble / exact.size
    // 64 bits / 16 bands / 4 rows: P(collide) at cos=0.3 is
    // 1-(1-(1-acos(.3)/pi)^4)^16 ~ 0.89, higher above the threshold.
    assert(recall >= 0.6, s"recall too low: $recall (|exact|=${exact.size})")
  }

  test("opt-in optimizer rule path matches the explicit operator") {
    val ns = spark.newSession()
    ns.experimental.extraOptimizations = Seq(graft.plans.LshJoinRewrite)
    ns.conf.set(graft.plans.LshJoinRewrite.EnabledKey, "true")
    try {
      val auto = Similarity.cosineThresholdPairs(Tables.embeddings(ns, sf0001), 150, 0.3)
      val autoPlan = auto.queryExecution.sparkPlan.toString
      assert(!autoPlan.contains("NestedLoop") && !autoPlan.contains("Cartesian"),
        s"conf-enabled rewrite did not fire:\n$autoPlan")
      val explicitPairs = pairs(Similarity.lshNeardupPairs(emb, 150, 0.3))
      assert(pairs(auto) == explicitPairs,
        "optimizer-rule path and explicit operator path must agree row-for-row")
    } finally ns.conf.set(graft.plans.LshJoinRewrite.EnabledKey, "false")
  }

  test("rule path hot-bucket guard: 300 identical vectors yield LINEAR candidates") {
    import spark.implicits._
    // the adversarial corpus of LshGuardSpec, through the CATALYST rule:
    // every vector shares every band signature, so without the guard the
    // banded equi-join emits 300*299/2 = 44850 pairs from one bucket
    val n = 300
    val degenerate = Seq.tabulate(n)(i =>
        (i.toLong, Array(0.3f, -1.7f, 2.2f, 0.9f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.lshNeardupPairs(degenerate, Long.MaxValue, 0.3)
    val got = pairs(out)
    assert(got.size == n - 1,
      s"guard must bound the degenerate bucket to star edges, got ${got.size} pairs")
    // star shape: the min-id representative reaches every other member,
    // so dedup clustering still sees one connected component
    assert(got == (1 until n).map(b => (0L, b.toLong)).toSet)
  }

  test("rule path guard disabled (maxBucket<=0) restores the exact pair contract") {
    import spark.implicits._
    val n = 40
    val degenerate = Seq.tabulate(n)(i =>
        (i.toLong, Array(0.3f, -1.7f, 2.2f, 0.9f)))
      .toDF("vec_id", "embedding")
    val key = graft.plans.LshJoinRewrite.MaxBucketKey
    spark.conf.set(key, "8")
    try {
      assert(pairs(Similarity.lshNeardupPairs(degenerate, Long.MaxValue, 0.3)).size == n - 1)
      spark.conf.set(key, "0")
      assert(pairs(Similarity.lshNeardupPairs(degenerate, Long.MaxValue, 0.3)).size == n * (n - 1) / 2,
        "cap<=0 must fall back to the unguarded all-pairs bucket join")
    } finally spark.conf.unset(key)
  }

  test("q53 registry entry returns near-dup pairs") {
    val out = SparkEntry.queries("q53_lsh_neardup")(spark, sf0001)
    assert(out.columns.toSeq == Seq("a", "b", "cos"))
    assert(out.count() > 0)
  }
}
