package org.apache.spark.sql.graftvec

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, ByteType, DataType, DoubleType}

/** Native Catalyst expressions for the vector hot path (SURVEY.md §4.3
  * optional custom work #1).
  *
  * The HOF formulation (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`)
  * allocates an intermediate array and evaluates an interpreted lambda
  * per element; these expressions generate a single fused primitive
  * loop inside whole-stage codegen instead — the per-pair kernel of the
  * brute-force/IVF similarity scans, which at 100 TB runs
  * O(corpus × queries × dim) times.
  *
  * Lives under `org.apache.spark.sql` because `ExpectsInputTypes` /
  * `ExpressionUtils` are `private[sql]` — the established extension
  * pattern for third-party native expressions. Public API:
  * `graft.expressions.VectorExpressions` and `graft.GraftExtensions`.
  *
  * Floating-point note: summation is sequential left-to-right, the same
  * order as both the HOF fold it replaces and DuckDB's
  * `list_cosine_similarity` — results stay bit-identical to the oracle.
  */
abstract class VectorBinaryExpression extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
}

/** cosine(a, b) = dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b))), one pass. */
case class CosineSim(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.getDouble($i);
         |  double $yi = $b.getDouble($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** dot(a, b), sequential sum — the building block when norms are
  * precomputed once per row (brute-force scan pattern). */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** PQ asymmetric-distance computation (ADC): `sum_i lut[i*ksub +
  * codes[i]]` over a FLAT per-query lookup table (m×ksub doubles,
  * row-major) and an `array<tinyint>` code word. This is the per-pair
  * kernel of the [[graft.operators.Similarity]] PQ probe — at 100 TB it
  * runs O(corpus × queries) times, and the HOF formulation
  * (`aggregate(zip_with(lut, codes, element_at))`) allocates a zipped
  * array and boxes every lookup; this is m indexed loads + adds inside
  * whole-stage codegen. `ksub` is the LUT stride, a codegen-time
  * literal. Out-of-range codes are the caller's contract (pqEncode
  * emits [0, ksub) by construction). */
case class AdcDistance(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(ByteType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_distance"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val lut = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    var s = 0.0
    var i = 0
    while (i < m) { s += lut.getDouble(i * ksub + codes.getByte(i)); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $m = $b.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $m; $i++) {
         |  $s += $a.getDouble($i * $ksub + $b.getByte($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcDistance =
    copy(left = newLeft, right = newRight)
}

/** L2 normalization in one fused pass: norm accumulate + scale, no
  * intermediate array and no per-element re-evaluation. The HOF
  * formulation (`transform(v, x / sqrt(aggregate(v, ...)))`) is
  * PATHOLOGICAL under CollapseProject: when the norm is a projected
  * alias referenced inside the lambda, it is inlined into the lambda
  * BODY and the O(dim) aggregate re-runs per element — O(dim²) per row
  * (measured 20× on the PQ probe's query side). Zero-norm input is
  * returned UNCHANGED (all zeros) — callers enforce the documented
  * nrm > 0 contract. */
case class NormalizeVec(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "normalize_vec"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) { val x = v.getDouble(i); ss += x * x; i += 1 }
    val out = new Array[Double](n)
    val inv = if (ss > 0.0) 1.0 / math.sqrt(ss) else 1.0
    i = 0
    while (i < n) { out(i) = v.getDouble(i) * inv; i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val ss = ctx.freshName("ss")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val out = ctx.freshName("out")
      val inv = ctx.freshName("inv")
      s"""
         |int $n = $v.numElements();
         |double $ss = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $v.getDouble($i); $ss += $x * $x;
         |}
         |double[] $out = new double[$n];
         |double $inv = $ss > 0.0 ? 1.0 / java.lang.Math.sqrt($ss) : 1.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = $v.getDouble($i) * $inv;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NormalizeVec =
    copy(child = newChild)
}

/** PQ encoder: all `m` nearest-codebook-entry codes of a unit vector in
  * ONE fused loop — the O(corpus) half of the PQ lifecycle. The
  * codebook rides along as a flat row-major double[] reference object
  * (m×ksub×dsub — driver-bounded by the PQ contract), so the codegen
  * body is three nested primitive loops with zero allocation per row
  * beyond the m-byte code word. The HOF formulation this replaces
  * (per-subspace `slice` + `zip_with` + `array_sort` over struct
  * candidates) allocates ~m×ksub arrays per row. Argmin ties break to
  * the LOWEST code index (strict `<`), matching the
  * `array_sort((dist, code))` tie order of the HOF form. */
case class PqEncode(child: Expression, cb: Array[Double],
                    m: Int, ksub: Int, dsub: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(cb.length == m * ksub * dsub,
    s"codebook length ${cb.length} != m*ksub*dsub = ${m * ksub * dsub}")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(a: Any): Any = {
    val u = a.asInstanceOf[ArrayData]
    val out = new Array[Byte](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestd = Double.MaxValue
      val cbase = s * ksub * dsub
      var j = 0
      while (j < ksub) {
        var d = 0.0
        val off = cbase + j * dsub
        var t = 0
        while (t < dsub) {
          val diff = u.getDouble(s * dsub + t) - cb(off + t)
          d += diff * diff
          t += 1
        }
        if (d < bestd) { bestd = d; best = j }
        j += 1
      }
      out(s) = best.toByte
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCb", cb, "double[]")
    nullSafeCodeGen(ctx, ev, u => {
      val out = ctx.freshName("codes")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val t = ctx.freshName("t")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestd = ctx.freshName("bestd")
      val off = ctx.freshName("off")
      s"""
         |byte[] $out = new byte[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  int $best = 0; double $bestd = Double.MAX_VALUE;
         |  for (int $j = 0; $j < $ksub; $j++) {
         |    double $d = 0.0;
         |    int $off = ($s * $ksub + $j) * $dsub;
         |    for (int $t = 0; $t < $dsub; $t++) {
         |      double $diff = $u.getDouble($s * $dsub + $t) - $cbRef[$off + $t];
         |      $d += $diff * $diff;
         |    }
         |    if ($d < $bestd) { $bestd = $d; $best = $j; }
         |  }
         |  $out[$s] = (byte) $best;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Column bridge (ExpressionUtils is private[sql]). */
object VectorKernels {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
