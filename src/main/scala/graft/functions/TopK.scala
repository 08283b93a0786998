package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator (SURVEY.md §2.11 A10 — the "user Reduce fn"
  * surface as a first-class `Aggregator`, registered via
  * `functions.udaf`).
  *
  * Keeps the k largest doubles per group in a bounded buffer, so the
  * aggregation is partial map-side like any hash agg: each task reduces
  * its partition to ≤k values before the shuffle. Contrast with the
  * window-function top-k (Q20), which must shuffle EVERY row to its
  * group's reducer and sort — at 100 TB, the UDAF ships k values per
  * group per task instead of the whole table.
  *
  * Buffer is a sorted ascending List (head = smallest retained): insert
  * is O(k), merge O(k); k is small by contract.
  */
final class TopK(k: Int) extends Aggregator[Double, List[Double], Seq[Double]] {
  def zero: List[Double] = Nil

  private def insert(buf: List[Double], x: Double): List[Double] =
    if (buf.length < k) (x :: buf).sorted
    else if (x <= buf.head) buf
    else (x :: buf.tail).sorted

  def reduce(buf: List[Double], x: Double): List[Double] = insert(buf, x)

  def merge(a: List[Double], b: List[Double]): List[Double] =
    b.foldLeft(a)(insert)

  /** Final output: descending, the natural "top k" reading order. */
  def finish(buf: List[Double]): Seq[Double] = buf.sorted.reverse

  def bufferEncoder: Encoder[List[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Double]]()
  def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

/** Typed top-k ROWS aggregator — [[TopK]] generalized to carry a row
  * payload: keeps the k best (value, key) pairs under the total order
  * (value DESC, key ASC), so a ROW_NUMBER()-≤-k window over a
  * LOW-CARDINALITY group key (q20's 5-priority top-3) becomes a plain
  * hash aggregate with BOUNDED partial state. The window formulation
  * must shuffle EVERY row into |groups| unsplittable window partitions
  * and sort them — at 100 TB, 20% of the table lands in one task; this
  * aggregator ships ≤ k pairs per group per map partition through the
  * exchange and needs no sort at all. The (value, key) order is total
  * whenever `key` is unique (q20's o_orderkey), so the output rows are
  * BIT-IDENTICAL to the window's rn ≤ k rows with rn = position + 1.
  *
  * Buffer is a List sorted worst-retained-first: insert/merge O(k);
  * k is small by contract.
  */
final class TopKRows(k: Int)
  extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {
  def zero: List[(Double, Long)] = Nil

  /** a strictly better than b under (value DESC, key ASC); total for
    * unique keys. */
  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: List[(Double, Long)],
                     x: (Double, Long)): List[(Double, Long)] =
    if (buf.length < k) (x :: buf).sortWith((a, b) => better(b, a))
    else if (better(x, buf.head)) (x :: buf.tail).sortWith((a, b) => better(b, a))
    else buf

  def reduce(buf: List[(Double, Long)], x: (Double, Long)): List[(Double, Long)] =
    insert(buf, x)

  def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
    b.foldLeft(a)(insert)

  /** Final output: best-first — position i IS the window's rn = i + 1. */
  def finish(buf: List[(Double, Long)]): Seq[(Double, Long)] =
    buf.sortWith(better)

  def bufferEncoder: Encoder[List[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Double, Long)]]()
  def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}

/** [[TopKRows]] with a STRING payload key — same bounded-partial-state
  * contract under the total order (value DESC, key ASC in code-point /
  * UTF-8-binary order, matching Spark's UTF8String window sort);
  * total whenever `key` is unique within the group (q68's per-source
  * distinct words). Counts passed as the Double value stay exact below
  * 2⁵³. A sibling class rather than a generic because `Aggregator`
  * needs concrete `ExpressionEncoder`s per payload type. */
final class TopKRowsStr(k: Int)
  extends Aggregator[(Double, String), List[(Double, String)], Seq[(Double, String)]] {
  def zero: List[(Double, String)] = Nil

  /** Code-point (= UTF-8 byte = Spark UTF8String binary) order, NOT
    * Java String's UTF-16 code-unit order (ADVICE r11): the two differ
    * when supplementary-plane characters (stored as surrogate pairs,
    * 0xD800–0xDFFF code units) mix with U+E000–U+FFFF — UTF-16 sorts
    * the latter AFTER the surrogates even though their code points are
    * smaller. The window this class claims bit-identity with orders by
    * UTF8String, so ties must break the same way for ANY key corpus,
    * not just [a-z]+ tokens. Allocation-free (no UTF8String boxing in
    * the per-row reduce path). */
  private def keyLt(a: String, b: String): Boolean = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return ca < cb
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    i == a.length && j < b.length // exhausted prefix sorts first
  }

  private def better(a: (Double, String), b: (Double, String)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && keyLt(a._2, b._2))

  private def insert(buf: List[(Double, String)],
                     x: (Double, String)): List[(Double, String)] =
    if (buf.length < k) (x :: buf).sortWith((a, b) => better(b, a))
    else if (better(x, buf.head)) (x :: buf.tail).sortWith((a, b) => better(b, a))
    else buf

  def reduce(buf: List[(Double, String)],
             x: (Double, String)): List[(Double, String)] = insert(buf, x)

  def merge(a: List[(Double, String)],
            b: List[(Double, String)]): List[(Double, String)] =
    b.foldLeft(a)(insert)

  /** Final output: best-first — position i IS the window's rn = i + 1. */
  def finish(buf: List[(Double, String)]): Seq[(Double, String)] =
    buf.sortWith(better)

  def bufferEncoder: Encoder[List[(Double, String)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Double, String)]]()
  def outputEncoder: Encoder[Seq[(Double, String)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, String)]]()
}
