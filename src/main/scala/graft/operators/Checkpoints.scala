package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage-cut policy for the multi-consumer materialization points
  * (VERDICT r11 #6 — the RangeStitch sorted frame and the q100/q114
  * doc-set tables).
  *
  * Why a cut at all: each site materializes a frame whose lineage is
  * nondeterministic across evaluations (a range-partitioner SAMPLE, a
  * `collect_set` arrival order) and that feeds two or more consumers —
  * without the cut, Catalyst re-evaluates the lineage per consumer and
  * the consumers can see DIFFERENT rows (a correctness bug, not a perf
  * choice).
  *
  * Why `localCheckpoint` by default: it materializes to executor
  * memory/disk with no HDFS/object-store round-trip — the right cost
  * on a single box and on healthy static-allocation clusters. Its
  * durability contract matters and is often misread: blocks live on
  * executors, so if an executor is LOST (failure, dynamic-allocation
  * downscale), Spark does NOT silently recompute the truncated
  * lineage — `LocalCheckpointRDD.compute` throws ("Checkpoint block
  * not found") and the job FAILS FAST. The stitch can therefore never
  * read an inconsistent re-sample; the worst case is a deterministic
  * rerun, never a wrong answer. Within a successful run, all consumers
  * read the same materialized blocks — that is the consistency the
  * stitch algebra needs.
  *
  * Why the knob: on long-running clusters with executor churn
  * (spot/preemptible nodes, dynamic allocation), fail-fast reruns of a
  * 100 TB job are an operational cost. Setting
  * `graft.checkpoint.reliable=true` (plus
  * `sparkContext.setCheckpointDir(...)` — required by Spark) routes
  * every cut through reliable `checkpoint()` instead: blocks land in
  * the checkpoint dir's fault-tolerant storage and survive executor
  * loss, at the price of a write+read round-trip per cut. Same rows
  * either way — the knob only changes where the materialized bytes
  * live. */
object Checkpoints {

  /** SQL-conf key: "true" → reliable `checkpoint()` (checkpoint dir
    * must be set), anything else / unset → `localCheckpoint()`. Read
    * per cut, so a session can flip it between jobs. */
  val ReliableConf = "graft.checkpoint.reliable"

  /** Materialize `df` and truncate its lineage under the session's
    * configured durability policy (see object doc). */
  def cut(df: DataFrame): DataFrame =
    if (df.sparkSession.conf.getOption(ReliableConf).exists(_.toBoolean))
      df.checkpoint()
    else df.localCheckpoint()
}
