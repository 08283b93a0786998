package org.apache.spark.sql.graftvec

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, LongType}

/** Random-hyperplane (SimHash-for-vectors) signature: bit `i` of the
  * result is set iff `dot(v, h_i) > 0`, where hyperplane `h_i` has
  * pseudo-random ±1 components derived by hashing `(seed, i, j)` — no
  * stored hyperplane matrix, no RNG state, bit-identical on every
  * executor and every run. Two vectors agree on bit `i` with probability
  * `1 - angle(a,b)/π` (Goemans–Williamson), which is what makes banded
  * signature equality an LSH for cosine similarity ([[graft.plans.LshJoinRewrite]]).
  *
  * O(nBits × dim) fused primitive loop inside whole-stage codegen — the
  * per-row cost that replaces an O(corpus²) cross join at 100 TB.
  */
case class HyperplaneSig(child: Expression, nBits: Int, seed: Long)
    extends UnaryExpression with ExpectsInputTypes {
  require(nBits >= 1 && nBits <= 64, s"nBits must be in [1,64], got $nBits")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val d = v.numElements()
    var sig = 0L
    var i = 0
    while (i < nBits) {
      var acc = 0.0
      var j = 0
      while (j < d) {
        acc += v.getDouble(j) * HyperplaneSig.component(seed, i, j)
        j += 1
      }
      if (acc > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cls = HyperplaneSig.getClass.getName.stripSuffix("$") + "$.MODULE$"
      val d = ctx.freshName("d")
      val sig = ctx.freshName("sig")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      s"""
         |int $d = $v.numElements();
         |long $sig = 0L;
         |for (int $i = 0; $i < $nBits; $i++) {
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $d; $j++) {
         |    $acc += $v.getDouble($j) * $cls.component(${seed}L, $i, $j);
         |  }
         |  if ($acc > 0) $sig |= (1L << $i);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

object HyperplaneSig {
  /** ±1.0 hyperplane component for (bit i, dimension j): splitmix64-style
    * finalizer over a seed/i/j mix, parity decides the sign. Called from
    * generated code — must stay a cheap pure static function. */
  def component(seed: Long, i: Int, j: Int): Double = {
    var z = seed ^ (i.toLong * 0x9E3779B97F4A7C15L) ^ (j.toLong * 0xC2B2AE3D27D4EB4FL)
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^= (z >>> 31)
    if ((z & 1L) == 0L) 1.0 else -1.0
  }
}
