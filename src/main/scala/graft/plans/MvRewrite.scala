package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Optimizer rule: aggregate navigation onto a registered materialized
  * view (the warehouse-engine "MV rewrite" / aggregate-pushdown feature).
  *
  * A summary table pre-aggregated at (g1..gn) with a row count and
  * partial sums can answer any COUNT(*)/SUM query grouped by a SUBSET of
  * (g1..gn) by RE-aggregation: COUNT(*) → SUM(cnt), SUM(x) → SUM(sum_x)
  * — counts and decimal sums merge exactly (the h02 mergeable-partials
  * contract), so the rewrite is lossless. At 100 TB this replaces a scan
  * of the raw fact table with a scan of a summary that is orders of
  * magnitude smaller, which is why every serious warehouse engine ships
  * it.
  *
  * Conservative applicability guards:
  *  - the aggregate's child is the registered source relation (matched
  *    by its file-source root path), bare or under a pure column-pruning
  *    Project — anything computed invalidates the match;
  *  - every grouping expression is a plain column, and the set is a
  *    subset of the MV's grouping columns;
  *  - every aggregate is COUNT(*)/COUNT(1) or SUM over a registered
  *    source column (optionally cast, e.g. the repo's DECIMAL(38,4)
  *    contract), optionally wrapped in an outer cast on the result.
  *    SUM's input cast must match the cast the MV itself applied, so
  *    partial re-aggregation is bit-exact, not approximately right.
  *
  * Registration is per source path (`MvRewrite.register`); the rule
  * resolves the summary with a fresh read through the active session, as
  * CacheManager does when splicing InMemoryRelations.
  */
object MvRewrite extends Rule[LogicalPlan] {

  /** sums: source column name → (summary partial-sum column, the exact
    * input expression shape the MV aggregated, reproduced by name). */
  final case class Mv(sourcePath: String, mvPath: String,
      groupCols: Set[String], cntCol: String, sums: Map[String, String])

  private val registry = new ConcurrentHashMap[String, Mv]()

  def register(mv: Mv): Unit = registry.put(mv.sourcePath, mv)
  def clear(): Unit = registry.clear()

  private def rootPaths(rel: LogicalRelation): Seq[String] = rel.relation match {
    case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
    case _ => Seq.empty
  }

  private def findMv(paths: Seq[String]): Option[Mv] =
    paths.flatMap(p => Option(registry.get(p))).headOption

  /** The registered source relation, bare or under pure column pruning. */
  private object SourceScan {
    def unapply(plan: LogicalPlan): Option[Mv] = plan match {
      case rel: LogicalRelation => findMv(rootPaths(rel))
      case Project(projList, rel: LogicalRelation)
          if projList.forall(_.isInstanceOf[AttributeReference]) =>
        findMv(rootPaths(rel))
      case _ => None
    }
  }

  /** Matches COUNT(*)/COUNT(1) and SUM(col) / SUM(CAST(col)) aggregates,
    * with an optional outer cast on the result; returns a builder that
    * reproduces the expression over the summary's attributes. */
  private def rewriteAgg(e: Expression, mv: Mv,
      summaryAttr: String => Option[Attribute]): Option[Expression] = e match {
    case Alias(child, name) =>
      rewriteAgg(child, mv, summaryAttr).map(r =>
        Alias(r, name)(exprId = e.asInstanceOf[Alias].exprId))
    case Cast(child, dt, tz, mode) =>
      rewriteAgg(child, mv, summaryAttr).map(r => Cast(r, dt, tz, mode))
    case AggregateExpression(Count(Seq(Literal(_, _))), mode, false, None, _) =>
      summaryAttr(mv.cntCol).map(a => Sum(a).toAggregateExpression())
    case AggregateExpression(Sum(sumChild, evalMode), mode, false, None, _) =>
      // ONLY the DECIMAL(38,4) contract shape: rewriting SUM(double) to
      // a sum of decimal partials would silently change the result type
      // (and its FP semantics) — that plan must stay un-rewritten
      val srcCol = sumChild match {
        case Cast(ar: AttributeReference, dt: org.apache.spark.sql.types.DecimalType, _, _)
            if dt.precision == 38 && dt.scale == 4 => Some(ar.name)
        case _ => None
      }
      for {
        c <- srcCol
        mvCol <- mv.sums.get(c)
        a <- summaryAttr(mvCol)
      } yield Sum(a, evalMode).toAggregateExpression()
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(groupExprs, aggExprs, SourceScan(mv), hint)
        if groupExprs.nonEmpty
          && groupExprs.forall {
            case a: AttributeReference => mv.groupCols.contains(a.name)
            case _ => false
          } =>
      val session = SparkSession.active
      val summary = session.read.parquet(mv.mvPath).queryExecution.analyzed
      def summaryAttr(name: String): Option[Attribute] =
        summary.output.find(_.name == name)
      val rewritten: Option[Seq[NamedExpression]] =
        aggExprs.foldLeft(Option(Vector.empty[NamedExpression])) {
          case (acc, ne) => acc.flatMap { v =>
            ne match {
              case a: AttributeReference if mv.groupCols.contains(a.name) =>
                summaryAttr(a.name).map(s =>
                  v :+ Alias(s, a.name)(exprId = a.exprId))
              case other =>
                rewriteAgg(other, mv, summaryAttr)
                  .collect { case n: NamedExpression => v :+ n }
            }
          }
        }
      rewritten match {
        case Some(newAggs) =>
          val newGroups = groupExprs.flatMap {
            case a: AttributeReference => summaryAttr(a.name)
          }
          if (newGroups.size == groupExprs.size) Aggregate(newGroups, newAggs, summary, hint)
          else agg
        case None => agg
      }
  }
}
