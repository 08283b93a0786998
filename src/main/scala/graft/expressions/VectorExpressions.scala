package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftvec.VectorKernels

/** Public Column API over the native vector kernels
  * (org.apache.spark.sql.graftvec — see that file for why the
  * expressions live in a bridge package). */
object VectorExpressions {
  def cosineSim(a: Column, b: Column): Column =
    VectorKernels.column(
      org.apache.spark.sql.graftvec.CosineSim(
        VectorKernels.expression(a), VectorKernels.expression(b)))

  def dotProduct(a: Column, b: Column): Column =
    VectorKernels.column(
      org.apache.spark.sql.graftvec.DotProduct(
        VectorKernels.expression(a), VectorKernels.expression(b)))

  /** PQ asymmetric distance over a flat m×ksub LUT and tinyint codes
    * ([[org.apache.spark.sql.graftvec.AdcDistance]]). */
  def adcDistance(lut: Column, codes: Column, ksub: Int): Column =
    VectorKernels.column(
      org.apache.spark.sql.graftvec.AdcDistance(
        VectorKernels.expression(lut), VectorKernels.expression(codes), ksub))

  /** One-pass L2 normalization
    * ([[org.apache.spark.sql.graftvec.NormalizeVec]]). */
  def normalizeVec(v: Column): Column =
    VectorKernels.column(
      org.apache.spark.sql.graftvec.NormalizeVec(
        VectorKernels.expression(v)))

  /** One-pass PQ code assignment against a flat row-major codebook
    * ([[org.apache.spark.sql.graftvec.PqEncode]]). */
  def pqEncode(u: Column, cb: Array[Double], m: Int, ksub: Int,
               dsub: Int): Column =
    VectorKernels.column(
      org.apache.spark.sql.graftvec.PqEncode(
        VectorKernels.expression(u), cb, m, ksub, dsub))

  /** Random-hyperplane LSH signature of an array<double> vector
    * ([[org.apache.spark.sql.graftvec.HyperplaneSig]]). */
  def hyperplaneSig(v: Column, bits: Int = 64, seed: Long = 42L): Column =
    VectorKernels.column(
      org.apache.spark.sql.graftvec.HyperplaneSig(
        VectorKernels.expression(v), bits, seed))

  /** One-scan (n_bigrams, n_distinct) over hashed word bigrams
    * ([[org.apache.spark.sql.graftvec.BigramHashStats]]). */
  def bigramHashStats(text: Column): Column =
    VectorKernels.column(
      org.apache.spark.sql.graftvec.BigramHashStats(
        VectorKernels.expression(text)))

  /** One-scan space-joined word n-grams
    * ([[org.apache.spark.sql.graftvec.WordNgrams]]). */
  def wordNgrams(text: Column, n: Int): Column =
    VectorKernels.column(
      org.apache.spark.sql.graftvec.WordNgrams(
        VectorKernels.expression(text), n))

  /** Early-exit "at least k words" predicate
    * ([[org.apache.spark.sql.graftvec.HasMinWords]]). */
  def hasMinWords(text: Column, k: Int): Column =
    VectorKernels.column(
      org.apache.spark.sql.graftvec.HasMinWords(
        VectorKernels.expression(text), k))

  /** DuckDB-parity Jaro-Winkler similarity
    * ([[org.apache.spark.sql.graftvec.JaroWinkler]]). */
  def jaroWinkler(a: Column, b: Column): Column =
    VectorKernels.column(
      org.apache.spark.sql.graftvec.JaroWinkler(
        VectorKernels.expression(a), VectorKernels.expression(b)))

  /** One-pass winnowing fingerprint set (sorted distinct array)
    * ([[org.apache.spark.sql.graftvec.WinnowFps]]). */
  def winnowFps(s: Column, k: Int, w: Int): Column =
    VectorKernels.column(
      org.apache.spark.sql.graftvec.WinnowFps(
        VectorKernels.expression(s), k, w))

  /** Distinct ≤2-deletion variant hashes (SymSpell depth-2 keys)
    * ([[org.apache.spark.sql.graftvec.DeletionHashes]]). */
  def deletionHashes(s: Column): Column =
    VectorKernels.column(
      org.apache.spark.sql.graftvec.DeletionHashes(
        VectorKernels.expression(s)))

  /** Two-pointer intersection of sorted duplicate-free long arrays
    * ([[org.apache.spark.sql.graftvec.SortedIntersect]]). */
  def sortedIntersect(a: Column, b: Column): Column =
    VectorKernels.column(
      org.apache.spark.sql.graftvec.SortedIntersect(
        VectorKernels.expression(a), VectorKernels.expression(b)))

  /** |A ∩ B| of sorted duplicate-free string arrays
    * ([[org.apache.spark.sql.graftvec.SortedIntersectCount]]). */
  def sortedIntersectCount(a: Column, b: Column): Column =
    VectorKernels.column(
      org.apache.spark.sql.graftvec.SortedIntersectCount(
        VectorKernels.expression(a), VectorKernels.expression(b)))

  /** One-pass q113 character-entropy fold
    * ([[org.apache.spark.sql.graftvec.EntropySum]]). */
  def entropySum(s: Column): Column =
    VectorKernels.column(
      org.apache.spark.sql.graftvec.EntropySum(
        VectorKernels.expression(s)))
}
