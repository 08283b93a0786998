package org.apache.spark.sql.graftvec

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}

/** |A ∩ B| for two SORTED-ascending (UTF8 binary order), duplicate-free
  * string arrays — a two-pointer merge, O(|a| + |b|) comparisons with
  * no per-row hash set and no result-array allocation (r12 optimization
  * round, guide §4; the q117 SortedIntersect lesson applied to the
  * q100/q114 verify stage, which only consumes the intersection SIZE).
  *
  * Replaces `size(array_intersect(arr_a, arr_b))` over the doc-set
  * arrays: Spark's ArrayIntersect builds an OpenHashSet of UTF8Strings
  * per candidate PAIR and materializes the intersection array that
  * size() immediately reduces. The doc sets are already
  * `sort_array(collect_set(...))` — sorted ascending in exactly the
  * UTF8String binary order this merge compares by, and duplicate-free —
  * so the count is one linear pass.
  *
  * CONTRACT (caller-enforced): both inputs sorted ascending by
  * UTF8String binary order, no duplicates. Returns the same count
  * array_intersect's size would.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.count(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls =
        SortedIntersectCount.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.count($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {

  /** Called from generated code — pure static fn. */
  def count(a: ArrayData, b: ArrayData): Long = {
    val (na, nb) = (a.numElements(), b.numElements())
    var i = 0
    var j = 0
    var m = 0L
    while (i < na && j < nb) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { m += 1L; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    m
  }
}
