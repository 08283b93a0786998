package org.apache.spark.sql.graftvec

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaro-Winkler similarity — the fuzzy-match verifier for name
  * and token matching (q151). Spark ships `levenshtein` but no Jaro
  * family; a Scala UDF here would box two strings per comparison on
  * the hottest path of a similarity join, so this is a codegen
  * [[BinaryExpression]] like the other graftvec kernels: one
  * allocation-free byte scan per pair, boolean match masks reused from
  * a stack array.
  *
  * Semantics match DuckDB's `jaro_winkler_similarity` (the oracle for
  * q151), i.e. the standard definition: match window
  * ⌊max(|a|,|b|)/2⌋−1 (min 0), transpositions counted over matched
  * sequences, and the Winkler boost `j + 0.1·ℓ·(1−j)` applied only
  * when jaro > 0.7, with the common prefix ℓ capped at 4. Probed
  * edge contracts (see JaroWinklerSpec): both-empty → 0.0 (NOT 1.0),
  * one-empty → 0.0, window 0 makes "ab"/"ba" → 0.0.
  *
  * Byte semantics: comparison is per byte, exact for ASCII (the
  * corpus fixtures) — same contract as [[NgramKernel]]; multi-byte
  * code points compare as byte sequences, which agrees with DuckDB on
  * equality of characters but counts a non-ASCII char as multiple
  * match units.
  */
object JaroWinklerKernel {
  def jaroWinkler(s1: UTF8String, s2: UTF8String): Double = {
    val a = s1.getBytes
    val b = s2.getBytes
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aM = new Array[Boolean](la)
    val bM = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!bM(j) && a(i) == b(j)) {
          aM(i) = true; bM(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aM(i)) {
        while (!bM(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    val jaro =
      (m.toDouble / la + m.toDouble / lb + (m - t / 2).toDouble / m) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxL = math.min(4, math.min(la, lb))
    while (l < maxL && a(l) == b(l)) l += 1
    jaro + 0.1 * l * (1.0 - jaro)
  }
}

/** `jaro_winkler(a, b)` → double in [0, 1]; DuckDB-parity semantics. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  private def kernelCls: String =
    JaroWinklerKernel.getClass.getName.stripSuffix("$") + "$.MODULE$"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerKernel.jaroWinkler(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $kernelCls.jaroWinkler($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}
