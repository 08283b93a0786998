package org.apache.spark.sql.graftvec

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Intersection of two SORTED-ascending, duplicate-free long arrays —
  * a two-pointer merge, O(|a| + |b|) with no per-row hash set
  * (r12 optimization round, guide §4 per-task work).
  *
  * Replaces `array_intersect` in q117's triangle-closing stage:
  * Spark's ArrayIntersect builds an OpenHashSet per ROW, which
  * StageBreakdown measured as the dominant cost of the whole query
  * (49.5 s of task time at sf0.1 — ~8 µs per edge for ≤64-element
  * arrays). The adjacency arrays are sorted once in the collect
  * aggregate (O(k log k) per node), then every edge's intersection is
  * a linear merge.
  *
  * CONTRACT (caller-enforced, q117 sorts via sort_array): both inputs
  * sorted ascending with no duplicates. Output: the intersection,
  * sorted ascending — same SET as array_intersect (element order may
  * differ from ArrayIntersect's first-argument order; q117 explodes
  * and counts, so order is immaterial).
  */
case class SortedIntersect(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sorted_intersect"

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersect.merge(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = SortedIntersect.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.merge($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersect =
    copy(left = newLeft, right = newRight)
}

object SortedIntersect {

  /** Called from generated code — pure static fn. */
  def merge(a: ArrayData, b: ArrayData): ArrayData = {
    val (na, nb) = (a.numElements(), b.numElements())
    val out = new Array[Long](math.min(na, nb))
    var i = 0
    var j = 0
    var m = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { out(m) = x; m += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }
}
