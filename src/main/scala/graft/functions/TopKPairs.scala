package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k (score, id) aggregator — the bounded-buffer form of the
  * per-group "top k by score, id-tie-broken" window pattern the ANN
  * probes rank candidates with ([[graft.operators.Similarity]]).
  *
  * Ordering contract matches `Window.orderBy(score.desc, id.asc)` +
  * `row_number <= k` EXACTLY: a candidate beats another on higher
  * score, then on LOWER id. Output is the kept pairs best-first (their
  * positions are the row numbers).
  *
  * Scale rationale (same as [[TopK]], which keeps bare doubles): the
  * window form shuffles EVERY (query, candidate) row to its query's
  * reducer and sorts — O(n·|Q|) rows through one exchange. This
  * aggregator reduces each map task to ≤ k pairs per query BEFORE the
  * shuffle (partial + final like any hash agg), so the exchange ships
  * O(tasks·|Q|·k) rows and nothing is globally sorted. Buffer is a
  * worst-first sorted List: insert/merge O(k), k small by contract.
  */
final class TopKPairs(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {

  def zero: List[(Double, Long)] = Nil

  /** a beats b on higher score, then lower id. NaN scores as −∞ (a
    * zero-norm pair ranks strictly last, id-tie-broken) — mapping NaN
    * keeps the comparator TOTAL, which List.sortWith requires; raw
    * `>`/`==` are all-false on NaN and would place it arbitrarily. */
  private def beats(a: (Double, Long), b: (Double, Long)): Boolean = {
    val as = if (a._1.isNaN) Double.NegativeInfinity else a._1
    val bs = if (b._1.isNaN) Double.NegativeInfinity else b._1
    as > bs || (as == bs && a._2 < b._2)
  }

  /** worst-first insertion keeping ≤ k. */
  private def insert(buf: List[(Double, Long)],
                     x: (Double, Long)): List[(Double, Long)] =
    if (buf.length < k) (x :: buf).sortWith((p, q) => beats(q, p))
    else if (!beats(x, buf.head)) buf
    else (x :: buf.tail).sortWith((p, q) => beats(q, p))

  def reduce(buf: List[(Double, Long)], x: (Double, Long)): List[(Double, Long)] =
    insert(buf, x)

  def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
    b.foldLeft(a)(insert)

  /** best-first: element i is row_number i+1. */
  def finish(buf: List[(Double, Long)]): Seq[(Double, Long)] =
    buf.sortWith(beats)

  def bufferEncoder: Encoder[List[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Double, Long)]]()
  def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
