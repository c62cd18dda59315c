package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Registration for one maintained materialized view: aggregates of
  * `sourcePath` grouped by exactly `keys` computing count(*) and/or
  * sums of `sumCols` can be answered from `viewPath`
  * ([[graft.sources.Lake.refreshIncremental]]'s output shape).
  */
final case class MvDef(sourcePath: String, viewPath: String,
    keys: Seq[String], sumCols: Seq[String], countCol: String)

/** Catalyst optimizer rule: answer matching aggregates from a maintained
  * MATERIALIZED VIEW instead of scanning the source table — the
  * Databricks/Snowflake "MV query rewrite", re-expressed over the
  * engine's versioned lake. A 100 TB fact scan + shuffle becomes a read
  * of a keys-sized view when the optimizer can PROVE equivalence:
  *
  *   Aggregate(group = exactly the view's keys,
  *             aggs  = count(*) and/or sum(col in sumCols),
  *             child = bare scan of the source's CURRENT files)
  *
  * rewrites to a Project over the view iff [[graft.sources.Lake
  * .mvRewriteInfo]] confirms the view's watermark covers the source
  * head AND the scanned file set is exactly the source's current file
  * set (a time-travel read of an older version never rewrites; a
  * deletion-vector read is never a bare scan, so it can't match).
  * Output attribute ids are preserved, so parent operators are
  * untouched. Anything else — extra predicates, other aggregates,
  * expression group keys, distinct — leaves the plan alone: declining
  * is always correct.
  *
  * The freshness gate re-reads two KB-sized manifests per candidate
  * aggregate at optimization time; a plan with no registered source
  * path short-circuits on a string prefix test. Registered via
  * `spark.experimental.extraOptimizations` (or GraftExtensions), defs
  * via [[register]] — both idempotent.
  *
  * Caveats (documented contract, enforced by the registration site):
  * rewrite equivalence relies on refreshIncremental's own contracts —
  * non-null keys, count/sum aggregates only (avg would need a
  * sum/count split this rule deliberately doesn't do).
  */
object MvRewriteRule extends Rule[LogicalPlan] {

  private val defs = new ConcurrentHashMap[String, MvDef]()

  private def norm(p: String): String = {
    val s = new java.net.URI(p).getPath
    if (s.endsWith("/")) s.dropRight(1) else s
  }

  def register(d: MvDef): Unit = { defs.put(norm(d.sourcePath), d); () }
  def clear(): Unit = defs.clear()

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (defs.isEmpty) plan
    else plan transformUp {
      case agg @ Aggregate(groupings, aggExprs, child, _) =>
        rewrite(agg, groupings, aggExprs, child).getOrElse(agg)
    }
  }

  /** The scan's file paths when `p` is a bare (optionally
    * column-pruned) parquet relation — anything else is not provably a
    * plain read of the table.
    */
  private def bareScanFiles(p: LogicalPlan): Option[Seq[String]] = p match {
    case Project(pl, lr: LogicalRelation)
        if pl.forall(_.isInstanceOf[AttributeReference]) =>
      bareScanFiles(lr)
    case lr: LogicalRelation =>
      lr.relation match {
        case fs: HadoopFsRelation =>
          Some(fs.location.rootPaths.map(rp => rp.toUri.getPath))
        case _ => None
      }
    case _ => None
  }

  private def rewrite(agg: Aggregate, groupings: Seq[Expression],
      aggExprs: Seq[NamedExpression], child: LogicalPlan): Option[LogicalPlan] = {
    val files = bareScanFiles(child).getOrElse(return None)
    if (files.isEmpty) return None
    // candidate def: every scanned file lives under a registered source
    val d = defs.values.toArray.collectFirst {
      case mv: MvDef if files.forall(_.startsWith(norm(mv.sourcePath) + "/")) => mv
    }.getOrElse(return None)
    // group keys: exactly the view's keys, as bare columns
    val groupAttrs = groupings.map {
      case a: AttributeReference => a
      case _ => return None
    }
    if (groupAttrs.map(_.name).toSet != d.keys.toSet ||
      groupAttrs.size != d.keys.size) return None
    // every output is a key passthrough, count(*), or sum(registered col)
    sealed trait Out
    case class KeyOut(name: String) extends Out
    case object CountOut extends Out
    case class SumOut(col: String) extends Out
    val outs: Seq[(NamedExpression, Out)] = aggExprs.map {
      case a: AttributeReference if groupAttrs.exists(_.exprId == a.exprId) =>
        a -> KeyOut(a.name)
      case al @ Alias(a: AttributeReference, _)
          if groupAttrs.exists(_.exprId == a.exprId) =>
        al -> KeyOut(a.name)
      // non-null literal only: count(lit(null)) is 0 per group, NOT the
      // view's count(*) — rewriting it would be a wrong (nonzero) answer
      case al @ Alias(AggregateExpression(Count(Seq(l: Literal)), Complete, false, None, _), _)
          if l.value != null =>
        al -> CountOut
      case al @ Alias(AggregateExpression(Sum(a: AttributeReference, _), Complete, false, None, _), _)
          if d.sumCols.contains(a.name) =>
        al -> SumOut(a.name)
      case _ => return None
    }
    val spark = SparkSession.active
    // freshness + exact-current-read proof (metadata-sized)
    val current = graft.sources.Lake.mvRewriteInfo(spark, d.sourcePath,
      d.viewPath).getOrElse(return None)
    if (files.toSet != current) return None
    val viewPlan = graft.sources.Lake.readVersioned(spark, d.viewPath)
      .queryExecution.analyzed
    val viewAttr: Map[String, Attribute] =
      viewPlan.output.map(a => a.name -> a).toMap
    val projections = outs.map { case (orig, out) =>
      val src = out match {
        case KeyOut(n) => viewAttr.getOrElse(n, return None)
        case CountOut => viewAttr.getOrElse(d.countCol, return None)
        case SumOut(c) => viewAttr.getOrElse(c, return None)
      }
      val value: Expression =
        if (src.dataType == orig.dataType) src else Cast(src, orig.dataType)
      Alias(value, orig.name)(exprId = orig.exprId)
    }
    logInfo(s"MvRewriteRule: answering aggregate over ${d.sourcePath} " +
      s"from maintained view ${d.viewPath}")
    Some(Project(projections, viewPlan))
  }
}
