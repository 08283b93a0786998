package org.apache.spark.sql.graftvec

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All distinct ≤2-deletion variants of a string, as 64-bit blocking
  * hashes — the SymSpell depth-2 key set of q104/fuzzyJoin2, fused
  * into one prefix-hash pass (r12 optimization round, guide §4).
  *
  * The replaced expression chain MATERIALIZED every variant string
  * (interpreted transform lambdas: L single-deletion UTF8String
  * concats, then L·(L−1) double-deletion concats, then array_distinct
  * over ~L² strings, then xxhash64 of each) — O(L³) copied characters
  * per row. This kernel enumerates the same variant SET via
  * polynomial prefix hashes: H(s[0,i) ∥ s[i+1,j) ∥ s[j+1,n)) is three
  * O(1) segment-hash merges, so the whole depth-2 neighborhood costs
  * O(L²) multiplies and zero string allocation.
  *
  * Correctness contract (why the hash NEED NOT be xxhash64): blocking
  * keys only have to AGREE between the two join sides — a true pair
  * (lev ≤ 2) shares an exact variant string, which hashes equally
  * here; a hash collision only mints a false candidate, which the
  * levenshtein verify stage kills. Same exactness argument the
  * original xxhash64 keys relied on. Within-row duplicates are
  * deduplicated (the old array_distinct, modulo collisions — which
  * can only merge keys, never drop a shared one). Hashing is over
  * CODE POINTS, matching the substr character positions the old
  * per-variant builder used.
  */
case class DeletionHashes(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "deletion_hashes"

  override def nullSafeEval(s: Any): Any =
    DeletionHashes.hashes(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val cls = DeletionHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.hashes($s);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): DeletionHashes =
    copy(child = newChild)
}

object DeletionHashes {
  private val B = 1000003L // polynomial base (64-bit wraparound hash)

  /** Called from generated code — pure static fn. Returns the sorted
    * distinct hash set of: the string itself, every 1-deletion, every
    * 2-deletion (positions i < j removed). */
  def hashes(s: UTF8String): ArrayData = {
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    val cps = new Array[Int](n)
    var ci = 0
    var off = 0
    while (off < str.length) {
      val cp = str.codePointAt(off)
      cps(ci) = cp
      ci += 1
      off += Character.charCount(cp)
    }
    // pre(i) = hash of cps[0, i); pow(k) = B^k — 64-bit wraparound
    val pre = new Array[Long](n + 1)
    val pow = new Array[Long](n + 1)
    pow(0) = 1L
    var i = 0
    while (i < n) {
      pre(i + 1) = pre(i) * B + (cps(i) + 1L)
      pow(i + 1) = pow(i) * B
      i += 1
    }
    // H(cps[l, r)) = pre(r) − pre(l)·B^(r−l)
    @inline def seg(l: Int, r: Int): Long = pre(r) - pre(l) * pow(r - l)
    @inline def merge(h1: Long, h2: Long, len2: Int): Long =
      h1 * pow(len2) + h2
    val set = new java.util.HashSet[java.lang.Long]()
    set.add(pre(n)) // depth 0
    i = 0
    while (i < n) { // depth 1: drop i
      set.add(merge(seg(0, i), seg(i + 1, n), n - i - 1))
      var j = i + 1
      while (j < n) { // depth 2: drop i < j
        set.add(merge(merge(seg(0, i), seg(i + 1, j), j - i - 1),
          seg(j + 1, n), n - j - 1))
        j += 1
      }
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
