package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.Cross
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}

/** Analysis-time guardrail (injected via GraftExtensions'
  * `injectCheckRule`): reject condition-less / cross joins whose BOTH
  * sides exceed a size threshold. At 100 TB an accidental cartesian
  * product doesn't fail fast — it runs for days; this turns it into an
  * immediate analysis error with remediation guidance. Bounded
  * cross joins (broadcast-sized side, e.g. the q27 `n` scalar or the
  * q25 query set) pass untouched; deliberate big ones can opt out via
  * `spark.graft.crossJoinGuard.enabled=false`.
  */
object CrossJoinGuard {

  val EnabledKey = "spark.graft.crossJoinGuard.enabled"
  val ThresholdKey = "spark.graft.crossJoinGuard.maxBytes"
  val DefaultThreshold: Long = 512L * 1024 * 1024 // both sides > 512 MB → reject

  def check(spark: SparkSession)(plan: LogicalPlan): Unit = {
    if (!spark.conf.get(EnabledKey, "true").toBoolean) return
    val threshold = spark.conf.get(ThresholdKey, DefaultThreshold.toString).toLong
    plan.foreach {
      case j @ Join(left, right, joinType, condition, _)
          if condition.isEmpty || joinType == Cross =>
        val l = left.stats.sizeInBytes
        val r = right.stats.sizeInBytes
        if (l > threshold && r > threshold) {
          throw new org.apache.spark.SparkException(
            s"graft cross-join guard: unconditioned join of two large relations " +
              s"($l x $r bytes, threshold $threshold). Broadcast one side, add a " +
              s"join condition, or set $EnabledKey=false if intentional.")
        }
      case _ =>
    }
  }
}
