package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType}

/** Catalyst optimizer rule: rewrite large-large inequality (band) joins
  * into binned equi-joins — the whole-operator form of
  * `graft.operators.RangeJoin.binned`, applied automatically to any
  * matching logical Join.
  *
  * OSS Spark plans an inequality-only inner join as
  * BroadcastNestedLoopJoin / CartesianProduct — O(n·m) when both sides are
  * fact-sized. This rule matches
  *
  *   `Join(p, i, Inner, (x >= lo) AND (x <= hi))`    (any conjunct order,
  *   strict or non-strict, point side left or right)
  *
  * where `x` is integral and comes entirely from one side and `lo`/`hi`
  * from the other, and rewrites to
  *
  *   Project(orig output,
  *     Filter(orig condition,                 -- exact band re-check
  *       Join(p + x div w, explode(seq(lo div w .. hi div w)) over i,
  *            Inner, point_bin = interval_bin)))
  *
  * which Spark then plans with its scalable shuffled equi-join machinery.
  * Binning uses exact integer division (never a double `floor(x/w)`,
  * whose rounding near bin boundaries could drop matches). Truncating
  * division is monotone, so every bin overlapping [lo, hi] lies in
  * [lo div w, hi div w] and the rewrite is lossless; the original
  * condition re-applied above the join removes the false candidates.
  *
  * Opt-in: fires only when `spark.graft.rangeJoin.binWidth` is set — bin
  * width is a data-dependent choice (near the median interval length, see
  * RangeJoin scaladoc) that the user must make. Registered via
  * `GraftExtensions` (injectOptimizerRule) or
  * `spark.experimental.extraOptimizations`.
  */
object BinnedRangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val WidthKey = "spark.graft.rangeJoin.binWidth"

  private case class Band(x: Expression, lo: Expression, hi: Expression,
      pointIsLeft: Boolean)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = SQLConf.get.getConfString(WidthKey, "")
    if (width.isEmpty) plan
    else width.trim.toLongOption match {
      // a malformed/non-positive width must not throw from inside the
      // optimizer (it would fail EVERY query in the session, not just
      // band joins) — warn once per invocation and skip the rewrite
      case Some(w) if w > 0 =>
        plan.transformUp {
          case j @ Join(left, right, Inner, Some(cond), _) =>
            // bind the match once (guard-and-body would evaluate it twice)
            matchBand(cond, left, right) match {
              case Some(band) => rewrite(j, band, w)
              case None       => j
            }
        }
      case _ =>
        logWarning(s"$WidthKey='$width' is not a positive long; " +
          "band-join rewrite disabled for this query")
        plan
    }
  }

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  /** A conjunct read as "point OP bound": both orientations of the four
    * comparison ops. Strictness is irrelevant — bins over-approximate and
    * the exact predicate is re-applied.
    */
  private def asBounds(c: Expression): Seq[(Expression, Expression, Boolean)] =
    c match {
      case GreaterThanOrEqual(a, b) => Seq((a, b, true), (b, a, false))
      case GreaterThan(a, b)        => Seq((a, b, true), (b, a, false))
      case LessThanOrEqual(a, b)    => Seq((a, b, false), (b, a, true))
      case LessThan(a, b)           => Seq((a, b, false), (b, a, true))
      case _                        => Seq.empty
    }

  private def matchBand(cond: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[Band] = {
    val conjs = splitConjunctivePredicates(cond)
    if (conjs.size != 2) return None
    val combos = for {
      (x1, lo, isLower1) <- asBounds(conjs(0)) if isLower1
      (x2, hi, isLower2) <- asBounds(conjs(1)) if !isLower2
      if x1.semanticEquals(x2)
    } yield (x1, lo, hi)
    val mirrored = for {
      (x1, lo, isLower1) <- asBounds(conjs(1)) if isLower1
      (x2, hi, isLower2) <- asBounds(conjs(0)) if !isLower2
      if x1.semanticEquals(x2)
    } yield (x1, lo, hi)
    (combos ++ mirrored).collectFirst {
      case (x, lo, hi)
          if integral(x) && integral(lo) && integral(hi) &&
            x.deterministic && lo.deterministic && hi.deterministic &&
            x.references.nonEmpty && lo.references.nonEmpty &&
            x.references.subsetOf(left.outputSet) &&
            (lo.references ++ hi.references).subsetOf(right.outputSet) =>
        Band(x, lo, hi, pointIsLeft = true)
      case (x, lo, hi)
          if integral(x) && integral(lo) && integral(hi) &&
            x.deterministic && lo.deterministic && hi.deterministic &&
            x.references.nonEmpty && lo.references.nonEmpty &&
            x.references.subsetOf(right.outputSet) &&
            (lo.references ++ hi.references).subsetOf(left.outputSet) =>
        Band(x, lo, hi, pointIsLeft = false)
    }
  }

  private def rewrite(j: Join, band: Band, width: Long): LogicalPlan = {
    val (pointPlan, intervalPlan) =
      if (band.pointIsLeft) (j.left, j.right) else (j.right, j.left)
    def asLong(e: Expression): Expression =
      if (e.dataType == LongType) e else Cast(e, LongType)
    def bin(e: Expression): Expression =
      IntegralDivide(asLong(e), Literal(width))

    val pBin = Alias(bin(band.x), "__graft_p_bin")()
    val pPlan = Project(pointPlan.output :+ pBin, pointPlan)

    // reversed intervals (lo > hi) match nothing; Sequence would throw
    val seq = If(
      LessThanOrEqual(asLong(band.lo), asLong(band.hi)),
      Sequence(bin(band.lo), bin(band.hi), Some(Literal(1L)),
        Some(SQLConf.get.sessionLocalTimeZone)),
      Literal.create(Array.empty[Long], ArrayType(LongType, containsNull = false)))
    val iBinAttr =
      AttributeReference("__graft_i_bin", LongType, nullable = true)()
    val iPlan = Generate(Explode(seq), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(iBinAttr),
      child = intervalPlan)

    val joined = Join(pPlan, iPlan, Inner,
      Some(EqualTo(pBin.toAttribute, iBinAttr)), JoinHint.NONE)
    Project(j.output, Filter(j.condition.get, joined))
  }
}
