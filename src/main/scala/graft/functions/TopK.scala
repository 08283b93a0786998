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
