package graft

import scala.util.Random

import org.apache.spark.unsafe.types.UTF8String

/** Dev tool: cross-engine fuzz of the native Jaro-Winkler kernel.
  * Emits `a<TAB>b<TAB>jw` lines for seeded random ASCII pairs —
  * short alphabet + varied lengths to force window clipping,
  * transpositions, prefix boosts, and empty/one-char edges —
  * which `tools/jw_fuzz.py` replays through DuckDB's own
  * `jaro_winkler_similarity` and diffs at 12 decimals. The fixture
  * vocabulary only exercises a handful of (len, overlap) shapes;
  * this covers the combinatorial space the q151 oracle can't reach.
  */
object JwFuzz {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 2000
    val seed = if (args.length > 1) args(1).toLong else 42L
    val rnd = new Random(seed)
    val alphabets = Seq("ab", "abcde", "abcdefghijklmnopqrstuvwxyz")
    def word(): String = {
      val len = rnd.nextInt(21) // 0..20, empties included
      val alpha = alphabets(rnd.nextInt(alphabets.length))
      (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    }
    (0 until n).foreach { _ =>
      val (a, b) = (word(), word())
      val jw = org.apache.spark.sql.graftvec.JaroWinklerKernel.jaroWinkler(
        UTF8String.fromString(a), UTF8String.fromString(b))
      println(s"$a\t$b\t$jw")
    }
  }
}
