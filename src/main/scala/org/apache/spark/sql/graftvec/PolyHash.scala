package org.apache.spark.sql.graftvec

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash of a string: fold `acc = (acc*31 + cp) % M`
  * over the string's Unicode code points, starting from `seed`
  * (M = 1e9+7). The fingerprinting primitive behind q30/q49 and the
  * minhash family.
  *
  * Semantics mirror the DuckDB oracle exactly
  * (`list_reduce(list_prepend(seed, list_transform(split(s,''),
  * x -> unicode(x))), (acc,x) -> (acc*31+x) % 1000000007)`): DuckDB's
  * `unicode()` yields code points, so the fold here iterates code
  * points, not UTF-16 units or bytes.
  *
  * Replaces the built-in HOF formulation (`aggregate(split(s, ""), ...)`)
  * which materializes a per-character array of 1-char strings and
  * evaluates a lambda per element; this is one fused loop per row inside
  * whole-stage codegen — the difference is O(corpus bytes) of allocation
  * at 100 TB.
  */
case class PolyHash(child: Expression, seed: Long)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override def nullSafeEval(s: Any): Any =
    PolyHash.hash(s.asInstanceOf[UTF8String], seed)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val cls = PolyHash.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.hash($s, ${seed}L);"
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  final val Mod = 1000000007L

  /** Called from generated code — must stay a cheap pure static fn. */
  def hash(s: UTF8String, seed: Long): Long = {
    val str = s.toString
    val n = str.length
    var acc = seed
    var i = 0
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * 31L + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }
}
