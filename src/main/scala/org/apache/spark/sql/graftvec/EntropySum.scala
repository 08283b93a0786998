package org.apache.spark.sql.graftvec

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The q113 character-entropy fold in one pass over the string
  * (r12 optimization round, guide §4 per-task work):
  * letter counts for a–z, then the EXACT double sequence of the HOF
  * formulation — acc = Σ over letters with count > 0, in a→z order, of
  * (c/n)·ln(c/n), with n = the string's CHARACTER count (code points,
  * = SQL length()). Returns the raw accumulator; callers apply
  * round(−acc, 4) in SQL so rounding semantics stay Spark's.
  *
  * Bit-identical to the replaced expression chain by construction: the
  * old form computed each count as length(s) − length(replace(s, ch)),
  * filtered zeros, then left-folded (acc + (c/n)·ln(c/n)) from 0.0 in
  * a→z order — the same values added in the same order with the same
  * double ops. What it replaces per row: 26 full string scans + 26
  * string allocations (the replace() chain) + an interpreted HOF fold;
  * this is ONE scan and no allocation beyond the 26-slot count array.
  */
case class EntropySum(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "entropy_sum"

  override def nullSafeEval(s: Any): Any =
    EntropySum.fold(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val cls = EntropySum.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.fold($s);"
    })

  override protected def withNewChildInternal(newChild: Expression): EntropySum =
    copy(child = newChild)
}

object EntropySum {

  /** Called from generated code — pure static fn. */
  def fold(s: UTF8String): Double = {
    val str = s.toString
    val counts = new Array[Long](26)
    var n = 0L // code points, = SQL length()
    var off = 0
    while (off < str.length) {
      val cp = str.codePointAt(off)
      if (cp >= 'a' && cp <= 'z') counts(cp - 'a') += 1
      n += 1
      off += Character.charCount(cp)
    }
    // same fold as: aggregate(transform(filter(counts, >0), c ->
    //   (c/n)*ln(c/n)), 0.0, +) — a→z order, zeros skipped
    val nd = n.toDouble
    var acc = 0.0
    var i = 0
    while (i < 26) {
      val c = counts(i)
      if (c > 0L) {
        val p = c.toDouble / nd
        // StrictMath.log: Spark's Log codegen calls java.lang.StrictMath
        // (not Math) — Math.log can differ in the last ulp on FMA
        // hardware, which the parity test caught
        acc = acc + p * StrictMath.log(p)
      }
      i += 1
    }
    acc
  }
}
