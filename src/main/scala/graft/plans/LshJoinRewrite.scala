package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Alias, And, Attribute, AttributeReference, BitwiseAnd, CreateArray, EqualTo,
  Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual,
  Literal, Or, PosExplode, RowFrame, RowOrdering, ShiftRightUnsigned,
  SpecifiedWindowFrame, UnboundedFollowing, UnboundedPreceding,
  WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.aggregate.{Count, Min}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{
  Aggregate, Filter, Generate, Join, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftvec.{CosineSim, HyperplaneSig}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** The LSH auto-rewrite SURVEY.md §4.3 deferred as future work: a
  * `Rule[LogicalPlan]` that turns a cosine-threshold join — O(|L|×|R|)
  * pair evaluations, infeasible at 100 TB — into a banded
  * random-hyperplane LSH plan:
  *
  * {{{
  *   Join(L, R, cosine_sim(lv, rv) >= t && rest)
  * ⇒ Aggregate(origOutput, origOutput,        // i.e. GROUP BY all = dedup
  *     Project(origOutput,
  *       Join(explodeBands(L, lv), explodeBands(R, rv),
  *            bandIdx_l = bandIdx_r && band_l = band_r
  *              && cosine_sim(lv, rv) >= t && rest)))
  * }}}
  *
  * where `explodeBands` adds a [[HyperplaneSig]] signature (nBits), splits
  * it into nBands contiguous bit-bands, and posexplodes them — so the join
  * becomes an EQUI join on (band index, band value) that shuffle-partitions
  * by bucket instead of comparing all pairs. The original condition is kept
  * as a post-filter: every surviving pair genuinely satisfies it
  * (precision 1.0); pairs that collide in no band are lost (recall < 1,
  * rising with threshold — Goemans–Williamson bit-agreement probability
  * `1 - angle/π` per bit, `1-(1-p^rows)^bands` overall). The group-by-all
  * collapses pairs that collide in several bands (it also collapses
  * pre-existing fully-identical result rows — acceptable for the dedup /
  * near-dup workloads this targets, and the rewrite is opt-in).
  *
  * Degenerate corpora are bounded the same way as the DataFrame LSH
  * operators: [[guardHotBuckets]] thins oversized (band idx, band sig)
  * buckets on the left exploded side to their min-key representative
  * before the join, so n identical vectors produce O(n) star candidates
  * instead of O(n²) pairs (cap: `spark.graft.lsh.maxBucket`, default
  * [[graft.operators.TextPipeline.LshMaxBucket]]; <= 0 restores the
  * unguarded join).
  *
  * OPT-IN because approximate: enable with `spark.graft.lsh.autoRewrite
  * .enabled=true` (plus `graft.GraftExtensions` in `spark.sql.extensions`,
  * or `spark.experimental.extraOptimizations`). Tune via
  * `spark.graft.lsh.bits` / `.bands` / `.seed` / `.maxBucket`.
  */
object LshJoinRewrite extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.lsh.autoRewrite.enabled"
  val BitsKey = "spark.graft.lsh.bits"
  val BandsKey = "spark.graft.lsh.bands"
  val SeedKey = "spark.graft.lsh.seed"
  /** Hot-bucket cap (see [[guardHotBuckets]]); <= 0 disables the guard. */
  val MaxBucketKey = "spark.graft.lsh.maxBucket"

  private val SigName = "_graft_lsh_sig"
  private val PosName = "_graft_lsh_band_idx"
  private val BandName = "_graft_lsh_band"
  private val BucketCountName = "_graft_lsh_bn"
  private val BucketRepName = "_graft_lsh_rep"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!SQLConf.get.getConfString(EnabledKey, "false").toBoolean) plan
    else rewrite(plan)

  /** The rewrite itself, independent of the enabled conf — callable
    * directly on an analyzed plan (the `Lsh.neardupPairs` operator path). */
  def rewrite(plan: LogicalPlan): LogicalPlan = {
    val bits = SQLConf.get.getConfString(BitsKey, "64").toInt
    val bands = SQLConf.get.getConfString(BandsKey, "16").toInt
    val seed = SQLConf.get.getConfString(SeedKey, "42").toLong
    val cap = SQLConf.get.getConfString(MaxBucketKey,
      graft.operators.TextPipeline.LshMaxBucket.toString).toInt
    require(bits >= 1 && bits <= 64 && bands >= 1 && bits % bands == 0,
      s"need 1 <= bands <= bits <= 64 with bands | bits, got bits=$bits bands=$bands")
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if !alreadyRewritten(cond) =>
        cosinePredicateSides(cond, left, right) match {
          case Some((lv, rv)) =>
            val (lGenRaw, lPos, lBand) = explodeBands(left, lv, bits, bands, seed)
            val (rGen, rPos, rBand) = explodeBands(right, rv, bits, bands, seed)
            val lGen = guardHotBuckets(lGenRaw, lPos, lBand, left.output, cap)
            val newCond = And(And(EqualTo(lPos, rPos), EqualTo(lBand, rBand)), cond)
            // GROUP BY all output columns — what ReplaceDeduplicateWithAggregate
            // would produce from Deduplicate(j.output, ...). Emitted directly
            // because that replacement batch runs BEFORE injected optimizer
            // rules and experimental.extraOptimizations: a Deduplicate created
            // here would reach the planner unreplaced and fail to plan.
            Aggregate(j.output, j.output,
              Project(j.output, Join(lGen, rGen, Inner, Some(newCond), hint)))
          case None => j
        }
    }
  }

  /** Marker: a rewritten join's condition references our band attributes —
    * prevents the fixed-point optimizer batch from rewriting twice. */
  private def alreadyRewritten(cond: Expression): Boolean =
    cond.references.exists(_.name == BandName)

  /** Hot-bucket STAR guard for the rule path — the Catalyst mirror of
    * [[graft.operators.TextPipeline.bucketGuardedCandidates]]: a degenerate
    * corpus (thousands of identical/boilerplate vectors, routine in web
    * crawls) collapses into one (band idx, band sig) bucket, and the
    * banded equi-join then emits O(n²) candidate pairs from that single
    * bucket — the straggler task the rewrite exists to avoid.
    *
    * The guard thins the LEFT exploded side only: a Window over the
    * bucket key computes the member count and the min "identity" value
    * (the first sort-orderable attribute of the original left output —
    * vec_id/doc_id-style schemas lead with exactly such a key); rows in
    * buckets over `cap` survive only if they carry that min value. An
    * oversized bucket thus joins as {representative} × members — linear
    * STAR candidates — while every bucket at or under `cap` keeps the
    * exact all-pairs candidate set. Guarding one side (not both) is what
    * preserves dedup-clustering connectivity: the representative still
    * reaches every member. The window partitions by the same (band idx,
    * band sig) key the candidate join hashes on, so it rides the join's
    * own exchange.
    *
    * Skipped when `cap` <= 0 or no left attribute is orderable (then the
    * unguarded join is the declared contract, as before). If the chosen
    * identity attribute is not unique within a bucket, every row tied at
    * the min survives — the bound degrades gracefully toward the
    * unguarded join only on corpora with fully duplicated lead columns. */
  private def guardHotBuckets(lGen: LogicalPlan, pos: Attribute,
                              band: Attribute, leftOutput: Seq[Attribute],
                              cap: Int): LogicalPlan = {
    val keyOpt = leftOutput.find(a => RowOrdering.isOrderable(a.dataType))
    if (cap <= 0 || keyOpt.isEmpty) return lGen
    val key = keyOpt.get
    val frame = SpecifiedWindowFrame(RowFrame, UnboundedPreceding, UnboundedFollowing)
    val spec = WindowSpecDefinition(Seq(pos, band), Nil, frame)
    val cnt = Alias(WindowExpression(
      Count(Literal(1)).toAggregateExpression(), spec), BucketCountName)()
    val rep = Alias(WindowExpression(
      Min(key).toAggregateExpression(), spec), BucketRepName)()
    val win = Window(Seq(cnt, rep), Seq(pos, band), Nil, lGen)
    val keep = Or(
      LessThanOrEqual(cnt.toAttribute, Literal(cap.toLong)),
      EqualTo(key, rep.toAttribute))
    Project(lGen.output, Filter(keep, win))
  }

  /** Find a `cosine_sim(a, b) >= t` conjunct (any of the four comparison
    * spellings) whose operands split cleanly across the join sides; return
    * the (left-side vector, right-side vector) expressions. */
  private def cosinePredicateSides(
      cond: Expression, left: LogicalPlan, right: LogicalPlan): Option[(Expression, Expression)] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(a, b) => conjuncts(a) ++ conjuncts(b)
      case other => Seq(other)
    }
    def sides(c: CosineSim): Option[(Expression, Expression)] =
      if (c.left.references.subsetOf(left.outputSet) &&
          c.right.references.subsetOf(right.outputSet)) Some((c.left, c.right))
      else if (c.right.references.subsetOf(left.outputSet) &&
               c.left.references.subsetOf(right.outputSet)) Some((c.right, c.left))
      else None
    conjuncts(cond).view.flatMap {
      case GreaterThanOrEqual(c: CosineSim, Literal(_, DoubleType)) => sides(c)
      case GreaterThan(c: CosineSim, Literal(_, DoubleType)) => sides(c)
      case LessThanOrEqual(Literal(_, DoubleType), c: CosineSim) => sides(c)
      case LessThan(Literal(_, DoubleType), c: CosineSim) => sides(c)
      case _ => None
    }.headOption
  }

  /** child → Generate(PosExplode([band_0 .. band_{n-1}]), Project(child, sig)),
    * returning the plan plus the (band index, band value) attributes. */
  private def explodeBands(
      child: LogicalPlan, vec: Expression, bits: Int, bands: Int,
      seed: Long): (LogicalPlan, Attribute, Attribute) = {
    val rows = bits / bands
    val mask = if (rows == 64) -1L else (1L << rows) - 1L
    val sig = Alias(HyperplaneSig(vec, bits, seed), SigName)()
    val proj = Project(child.output :+ sig, child)
    val bandExprs = (0 until bands).map { b =>
      BitwiseAnd(
        ShiftRightUnsigned(sig.toAttribute, Literal(b * rows)),
        Literal(mask))
    }
    val pos = AttributeReference(PosName, IntegerType, nullable = false)()
    val band = AttributeReference(BandName, LongType, nullable = true)()
    val gen = Generate(PosExplode(CreateArray(bandExprs)),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(pos, band), proj)
    (gen, pos, band)
  }
}
