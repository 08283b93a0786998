package org.apache.spark.sql.graftvec

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprints of a string, fused into one scan-local pass
  * (r12 optimization round; guide §1.2 "the distributed algorithm" +
  * §4 "prefer built-ins/codegen" applied to q109):
  *
  *   1. k-gram hashes: h(i) = polyHash(s[i .. i+k-1], seed 7) for every
  *      1-based start i ≤ len − k + 1 — the SAME fold as [[PolyHash]]
  *      over the SAME substrings the SQL `substr(s, i, k)` takes, so
  *      each value is bit-identical to the exploded formulation (and to
  *      the DuckDB oracle's list_reduce);
  *   2. window minima: fp(j) = min(h(j) .. h(j+w−1)) for every FULL
  *      window (j ≤ ng − w + 1, ng = #grams) — a monotonic-deque
  *      sliding minimum, O(ng) total;
  *   3. the distinct fingerprint set, returned SORTED ascending.
  *
  * Returns an empty array when the string is shorter than k + w − 1
  * (no full window — the exploded form produced zero rows there).
  *
  * This replaces q109's three data-sized exchanges (the per-position
  * explode → doc_id window sort → DISTINCT → final groupBy chain) with
  * a zero-shuffle projection: the per-document fingerprint set never
  * leaves its scan task. At 100 TB the explode form shuffles
  * O(corpus chars) rows three times; this moves nothing.
  */
case class WinnowFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fps"

  override def nullSafeEval(s: Any): Any =
    WinnowFps.fps(s.asInstanceOf[UTF8String], k, w)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val cls = WinnowFps.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.fps($s, $k, $w);"
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

object WinnowFps {

  /** Called from generated code — pure static fn. */
  def fps(s: UTF8String, k: Int, w: Int): ArrayData = {
    // code points, matching PolyHash / SQL substr character semantics
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    val ng = n - k + 1
    val nw = ng - w + 1 // # full windows
    if (nw <= 0) return new GenericArrayData(Array.empty[Long])
    val cps = new Array[Int](n)
    var ci = 0
    var off = 0
    while (off < str.length) {
      val cp = str.codePointAt(off)
      cps(ci) = cp
      ci += 1
      off += Character.charCount(cp)
    }
    // gram hashes: same fold as PolyHash over each k-substring
    val h = new Array[Long](ng)
    var i = 0
    while (i < ng) {
      var acc = 7L
      var j = 0
      while (j < k) {
        acc = (acc * 31L + cps(i + j)) % PolyHash.Mod
        j += 1
      }
      h(i) = acc
      i += 1
    }
    // sliding minimum over w consecutive hashes (monotonic deque of
    // indices, front = current window's min)
    val deque = new Array[Int](ng)
    var head = 0
    var tail = 0 // exclusive
    val set = new java.util.HashSet[java.lang.Long]()
    i = 0
    while (i < ng) {
      while (tail > head && h(deque(tail - 1)) >= h(i)) tail -= 1
      deque(tail) = i
      tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) set.add(h(deque(head)))
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var m = 0
    while (it.hasNext) { out(m) = it.next(); m += 1 }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }
}
