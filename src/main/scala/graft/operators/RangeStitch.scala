package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-safe EXACT per-key ordered computations (rank, prefix sum) via
  * range partitioning — the generic form of the r11 per-source rank fix
  * (see [[TextPipeline.sourceLengthRanksRange]]'s scaladoc for the full
  * derivation; it now delegates here).
  *
  * The problem class: `fn() OVER (PARTITION BY key ORDER BY ...)` puts
  * every row of one key in ONE task, and at 100 TB the hottest key of a
  * documents/events table (a language, a crawl domain, a celebrity
  * user) can own most of the corpus. AQE cannot split a window
  * partition; only a plan change can.
  *
  * The cure: range-repartition on the FULL sort key (key, orderCols...)
  * + in-partition sort, so the global order is "partition id, then
  * position" — the range sampler splits a hot key across as many
  * partitions as its mass requires. `monotonically_increasing_id`
  * encodes (partition id ≪ 33 | record position); a node-sized
  * per-(pid, key) side table (≤ #keys + numPartitions − 1 rows — ranges
  * are contiguous, so Σ per-partition distinct keys telescopes) carries
  * the cross-partition offsets, and one equi-join stitches them back.
  *
  * Shared contracts:
  *  - (key, orderCols...) must be a TOTAL order (make the last order
  *    column a unique id); `key` must be non-null (the stitch join is
  *    an equi-join — a null key would drop rows the dense window keeps).
  *  - The sorted frame feeds two consumers and the range sampler is
  *    nondeterministic across evaluations, so it is cut through
  *    [[Checkpoints.cut]] (pass only pruned columns in) —
  *    `localCheckpoint` by default; see that object's scaladoc for the
  *    executor-loss durability contract (fail-fast, never a wrong
  *    answer) and the reliable-`checkpoint` cluster knob.
  *  - Output rows are NOT in window order; sort downstream if needed.
  *  - Even-data cost ≈ 1.8× the dense window (SKEW_r11_hotsrc.json) —
  *    callers route through a hottest-key probe and pay it only above
  *    the measured skew threshold.
  */
object RangeStitch {

  private def sortedWithPos(df: DataFrame, key: String,
                            orderCols: Seq[String]): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val rangeCols = (key +: orderCols).map(col)
    // pid comes from spark_partition_id() — an API-contract value —
    // rather than the high bits of monotonically_increasing_id (ADVICE
    // r11: that layout, pid << 33 | record#, is an undocumented-stable
    // implementation detail). seq still reads mid's low 33 bits: the
    // record counter is the in-partition row position we need, and no
    // public function exposes it without a second sort. Ceiling: seq
    // wraps if ONE range partition exceeds 2^33 (~8.6B) rows — at that
    // point the partition itself is already a failed exchange (a single
    // task owning terabytes), so the stitch is not the binding limit.
    Checkpoints.cut(
      df.repartitionByRange(parts, rangeCols: _*)
        .sortWithinPartitions(key, orderCols: _*)
        .withColumn("pid", spark_partition_id().cast("long"))
        .withColumn("seq",
          monotonically_increasing_id().bitwiseAND(lit((1L << 33) - 1))))
  }

  private def prevPids(key: String): Column =
    coalesce(
      sum("cnt").over(Window.partitionBy(key).orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))

  /** ROW_NUMBER() OVER (PARTITION BY key ORDER BY orderCols) as `out`
    * (long), skew-safe: rk = cross-partition offset of (key, pid) +
    * in-partition position − first position of (key, pid) + 1. No sort
    * or window ever sees more than ~1/numPartitions of the data. */
  def withRangeRank(df: DataFrame, key: String, orderCols: Seq[String],
                    out: String = "rk"): DataFrame = {
    val sorted = sortedWithPos(df, key, orderCols)
    val offs = sorted.groupBy("pid", key)
      .agg(count(lit(1)).as("cnt"), min("seq").as("mseq"))
      .withColumn("off", prevPids(key))
      .select(col("pid"), col(key), col("mseq"), col("off"))
    sorted.join(offs, Seq("pid", key))
      .withColumn(out, col("off") + (col("seq") - col("mseq")) + lit(1L))
      .drop("pid", "seq", "mseq", "off")
  }

  /** SUM(valueCol) OVER (PARTITION BY key ORDER BY orderCols ROWS
    * UNBOUNDED PRECEDING..CURRENT ROW) as `out`, skew-safe: a local
    * cumsum within each (pid, key) slice (a window whose partitions are
    * bounded by the range exchange) + the per-(pid, key) offset table.
    * `valueCol` must be non-null (sum-based stitch). */
  def withRangePrefixSum(df: DataFrame, key: String, orderCols: Seq[String],
                         valueCol: String, out: String): DataFrame = {
    val sorted = sortedWithPos(df, key, orderCols)
    val offs = sorted.groupBy("pid", key)
      .agg(sum(valueCol).as("cnt"))
      .withColumn("off", prevPids(key))
      .select(col("pid"), col(key), col("off"))
    val wLocal = Window.partitionBy("pid", key).orderBy("seq")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sorted
      .withColumn("lcum", sum(valueCol).over(wLocal))
      .join(offs, Seq("pid", key))
      .withColumn(out, col("lcum") + col("off"))
      .drop("pid", "seq", "lcum", "off")
  }

  /** Estimated row count of the hottest `key` value, from a
    * deterministic hash sample over struct(key, idCol) (idCol must vary
    * per row for the sample to be uniform — pass the table's unique
    * id). One scan + a map-side-combined count; the driver reads ONE
    * row. The routing probe for this object's operators — same
    * mechanism as [[Advanced.hottestKeyRows]]. */
  def hottestKeyRows(df: DataFrame, key: String, idCol: String,
                     sampleMod: Int = 100): Long = {
    val est = df
      .where(pmod(hash(struct(col(key), col(idCol))),
        lit(sampleMod)) === 0)
      .groupBy(key).count()
      .agg(max("count")).first()
    if (est.isNullAt(0)) 0L else est.getLong(0) * sampleMod
  }

  /** Process-wide probe memo keyed by caller-chosen key + the probed
    * key column + the id column — registry queries over the same
    * fixture pay ONE probe scan per (table, key column) per JVM. idCol
    * is part of the key (ADVICE r11) because it is the only in-API
    * distinguisher of WHICH table was probed: two different tables
    * under one fixture-dir cacheKey with a same-named key column (e.g.
    * both carrying `lang`) must not share an estimate — mirrors how
    * [[Advanced.hottestUserDayRowsCached]] suffixes its key. */
  private val probeCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String, String, Int), java.lang.Long]()

  /** [[hottestKeyRows]] through the process-wide memo. */
  def hottestKeyRowsCached(df: DataFrame, key: String, idCol: String,
                           cacheKey: String, sampleMod: Int = 100): Long =
    probeCache.computeIfAbsent((cacheKey, key, idCol, sampleMod),
      _ => java.lang.Long.valueOf(hottestKeyRows(df, key, idCol, sampleMod)))
      .longValue()

  /** Measured crossover for THIS kernel (CROSSOVER_r11_rank.json: hot
    * key at 0.5M/1M/2M/4M rows over 10M docs, quiet box): the dense
    * window's wall grows linearly with the hot key (1.77/2.41/3.81/
    * 6.98 s, max task 1.14/1.69/3.26/6.29) while the range plan is flat
    * bookkeeping (walls 3.3–4.3 s, max task ~1.0–1.3 s throughout) —
    * walls cross EXACTLY at 2M, where the range plan's max task is
    * already 2.5× better. 2M is therefore the routing default (the
    * events family's 2.5M is the same measurement made on sessionize;
    * this kernel's own ladder sits a touch lower). */
  val defaultHotKeyRowThreshold: Long = 2000000L

  /** Route a dense-window builder vs its range-stitch twin by measured
    * key skew ([[Advanced.routeBySkew]]'s shape, generalized to any
    * key column). Threshold default is [[defaultHotKeyRowThreshold]],
    * this kernel's own measured crossover. */
  def routeBySkew(df: DataFrame, key: String, idCol: String,
                  dense: DataFrame => DataFrame,
                  ranged: DataFrame => DataFrame,
                  hotKeyRowThreshold: Long = defaultHotKeyRowThreshold,
                  sampleMod: Int = 100,
                  probeCacheKey: Option[String] = None): DataFrame = {
    val hot = probeCacheKey match {
      case Some(k) => hottestKeyRowsCached(df, key, idCol, k, sampleMod)
      case None    => hottestKeyRows(df, key, idCol, sampleMod)
    }
    if (hot >= hotKeyRowThreshold) ranged(df) else dense(df)
  }
}
