package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Buffer/output of [[GramMatrix]]: row count, per-dimension sums
  * s(i), and the upper-triangle product sums p(idx(i,j)) laid out
  * row-major — idx(i,j) = (i·(2d−i−1))/2 + j for 0-based i ≤ j. */
case class GramState(n: Long, s: Array[Double], p: Array[Double])

/** One-pass covariance statistics over a vector column (r12
  * optimization round, guide §2.3 "aggregate before you shuffle" +
  * §4 per-task work, applied to q128):
  *
  * The replaced plan exploded each embedding into d(d+1)/2 = 2,080
  * (i, j, xᵢ·xⱼ) STRUCT rows through an interpreted higher-order
  * lambda (plus a second posexplode pass for the means and a third
  * scan for the count), then hash-aggregated 2,080 keys. This
  * aggregator folds each vector straight into a primitive
  * (n, Σxᵢ, Σxᵢxⱼ) buffer — one tight d²/2 multiply-add loop per row,
  * no per-element structs, ONE scan of the corpus — and ships exactly
  * one buffer per map partition. The shuffle carries
  * #partitions · (d(d+1)/2 + d + 1) doubles at ANY corpus scale.
  *
  * FP note: per-partition sequential fold + pairwise merge replaces
  * the hash aggregate's arbitrary partial-sum order. Both are
  * unordered double summations; q128's declared contract already
  * rounds AFTER the final division because cross-engine sums cannot
  * share an order (the DuckDB oracle sums in its own order) — the
  * 4-dp round is the documented tolerance, re-proven against the
  * oracle at sf0.001/sf0.01/sf0.1 after this change.
  */
final class GramMatrix
  extends Aggregator[Seq[Double], GramState, GramState] {

  def zero: GramState = GramState(0L, Array.empty, Array.empty)

  def reduce(b: GramState, v: Seq[Double]): GramState = {
    val d = v.length
    val buf =
      if (b.n == 0L && b.s.isEmpty)
        GramState(0L, new Array[Double](d), new Array[Double](d * (d + 1) / 2))
      else b
    require(buf.s.length == d,
      s"GramMatrix: ragged vector lengths (${buf.s.length} vs $d)")
    val arr = v.toArray // one d-element copy; the d²/2 loop dominates
    var i = 0
    var idx = 0
    while (i < d) {
      val xi = arr(i)
      buf.s(i) += xi
      var j = i
      while (j < d) {
        buf.p(idx) += xi * arr(j)
        idx += 1
        j += 1
      }
      i += 1
    }
    GramState(buf.n + 1L, buf.s, buf.p)
  }

  def merge(a: GramState, b: GramState): GramState =
    if (a.n == 0L && a.s.isEmpty) b
    else if (b.n == 0L && b.s.isEmpty) a
    else {
      var i = 0
      while (i < a.s.length) { a.s(i) += b.s(i); i += 1 }
      i = 0
      while (i < a.p.length) { a.p(i) += b.p(i); i += 1 }
      GramState(a.n + b.n, a.s, a.p)
    }

  def finish(buf: GramState): GramState = buf

  def bufferEncoder: Encoder[GramState] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[GramState]()
  def outputEncoder: Encoder[GramState] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[GramState]()
}
