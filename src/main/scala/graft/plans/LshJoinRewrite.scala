package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Alias, And, Attribute, AttributeReference, BitwiseAnd, CreateArray, EqualTo,
  Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual,
  Literal, PosExplode, ShiftRightUnsigned}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{
  Aggregate, Generate, Join, LogicalPlan, Project}
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
  * OPT-IN because approximate: enable with `spark.graft.lsh.autoRewrite
  * .enabled=true` (plus `graft.GraftExtensions` in `spark.sql.extensions`,
  * or `spark.experimental.extraOptimizations`). Tune via
  * `spark.graft.lsh.bits` / `.bands` / `.seed`.
  */
object LshJoinRewrite extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.lsh.autoRewrite.enabled"
  val BitsKey = "spark.graft.lsh.bits"
  val BandsKey = "spark.graft.lsh.bands"
  val SeedKey = "spark.graft.lsh.seed"

  private val SigName = "_graft_lsh_sig"
  private val PosName = "_graft_lsh_band_idx"
  private val BandName = "_graft_lsh_band"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!SQLConf.get.getConfString(EnabledKey, "false").toBoolean) plan
    else rewrite(plan)

  /** The rewrite itself, independent of the enabled conf — callable
    * directly on an analyzed plan (the `Lsh.neardupPairs` operator path). */
  def rewrite(plan: LogicalPlan): LogicalPlan = {
    val bits = SQLConf.get.getConfString(BitsKey, "64").toInt
    val bands = SQLConf.get.getConfString(BandsKey, "16").toInt
    val seed = SQLConf.get.getConfString(SeedKey, "42").toLong
    require(bits >= 1 && bits <= 64 && bands >= 1 && bits % bands == 0,
      s"need 1 <= bands <= bits <= 64 with bands | bits, got bits=$bits bands=$bands")
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if !alreadyRewritten(cond) =>
        cosinePredicateSides(cond, left, right) match {
          case Some((lv, rv)) =>
            val (lGen, lPos, lBand) = explodeBands(left, lv, bits, bands, seed)
            val (rGen, rPos, rBand) = explodeBands(right, rv, bits, bands, seed)
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
