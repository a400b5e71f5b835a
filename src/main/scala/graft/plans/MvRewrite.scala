package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Aggregate navigation (automatic materialized-view rewrite — the
  * Oracle/Calcite QUERY REWRITE feature, as a Catalyst optimizer rule):
  * a monthly aggregate written naively against the FACT TABLE is rewritten
  * at optimization time to read the pre-aggregated rollup instead, mapping
  * each additive aggregate onto a SUM of the matching MV measure
  * (count(*) → sum(n_items), sum(x) → sum(sum_x)). The user keeps writing
  * the natural query; the engine serves it from the summary.
  *
  * Registration mirrors `CREATE MATERIALIZED VIEW … ENABLE QUERY REWRITE`:
  * [[MvRewrite.install]] takes the TEMPLATE aggregate (the exact DataFrame
  * the MV materializes, built from the same Column code as the production
  * query, so template and query cannot drift) plus the MV's parquet path,
  * extracts the template's optimized grouping/aggregate shapes and fact
  * file paths, and appends one [[MvAggregateRewrite]] rule to
  * `spark.experimental.extraOptimizations` (imperative injection — the
  * session already exists; a cold-start deployment would use
  * `withExtensions`/`injectOptimizerRule`).
  *
  * Matching is deliberately conservative — rewrite fires only when ALL of:
  *  - the aggregate's leaf is a parquet relation over exactly the
  *    registered fact files (path-set equality, so sf0.01 and sf0.1
  *    registrations coexist without cross-firing);
  *  - the plan between Aggregate and leaf is only Project (column
  *    pruning) — any Filter/Join disqualifies (a predicate could select
  *    rows the month-grain rollup cannot reproduce);
  *  - the grouping expressions and every aggregate function match a
  *    registered shape under [[MvRewrite.shape]] (attribute names
  *    normalized, then Catalyst's `canonicalized` — exprIds, aliases and
  *    commutative order neutralized).
  * Unmatched plans pass through untouched; output attribute exprIds are
  * preserved on rewrite so parent operators (Sort etc.) still resolve.
  * Correctness contract: pipeline_mv_rewrite's DuckDB oracle IS the naive
  * fact-table SQL, so the rewrite must be semantics-preserving to hash-
  * match, and PlanQualitySpec pins that the executed plan actually reads
  * the MV, not the fact table.
  */
object MvRewrite {

  /** One registered rewrite target: fact leaf paths, the canonical
    * grouping shapes, per-aggregate-shape MV measure column, the MV path,
    * and the group-key MV column.
    */
  private[plans] final case class Target(
      factPaths: Set[String],
      groupShapes: Seq[Expression],
      aggToMvColumn: Map[Expression, String],
      groupMvColumn: String,
      mvPath: String)

  private val targets =
    new java.util.concurrent.ConcurrentHashMap[String, Target]()

  /** Fired-counter for specs: how many Aggregates this JVM has rewritten. */
  private[graft] val fired = new java.util.concurrent.atomic.AtomicLong()

  /** Name-normalize then canonicalize: two expressions over different scans
    * of the same table get the same shape; exprIds, aliases and qualifiers
    * do not matter.
    */
  private[plans] def shape(e: Expression): Expression = {
    val named = e.transformUp {
      case a: AttributeReference =>
        AttributeReference(a.name.toLowerCase, a.dataType, a.nullable)(ExprId(0), Nil)
    }
    named.canonicalized
  }

  /** Register `template` (an Aggregate DataFrame over the fact table whose
    * output columns are named exactly like the MV's measure columns, group
    * key first) as rewritable to the rollup at `mvPath`, and install the
    * rule into the session once.
    */
  def install(spark: SparkSession, template: DataFrame, mvPath: String): Unit = {
    val key = spark.hashCode() + "|" + mvPath
    targets.computeIfAbsent(key, _ => {
      val (agg, leaf) = findAggAndLeaf(template.queryExecution.optimizedPlan)
        .getOrElse(throw new IllegalArgumentException(
          "MV rewrite template must optimize to Aggregate over Project*/parquet scan"))
      val groupKeyName = agg.aggregateExpressions.head.name
      val aggMap = agg.aggregateExpressions.tail.map {
        case al @ Alias(child, _) => shape(child) -> al.name
        case other => throw new IllegalArgumentException(
          s"unexpected template aggregate output: $other")
      }.toMap
      // install the rule once per session
      synchronized {
        val already = spark.experimental.extraOptimizations
          .exists(_.isInstanceOf[MvAggregateRewrite])
        if (!already)
          spark.experimental.extraOptimizations =
            spark.experimental.extraOptimizations :+ new MvAggregateRewrite(spark)
      }
      Target(leafPaths(leaf), agg.groupingExpressions.map(shape),
        aggMap, groupKeyName, mvPath)
    })
    ()
  }

  private[plans] def allTargets: Seq[Target] = {
    import scala.jdk.CollectionConverters._
    targets.values.asScala.toSeq
  }

  /** Aggregate over only Project/SubqueryAlias wrappers over a parquet
    * LogicalRelation — the rewritable silhouette.
    */
  private[plans] def findAggAndLeaf(p: LogicalPlan): Option[(Aggregate, LogicalRelation)] =
    p match {
      case a: Aggregate => pureScan(a.child).map(a -> _)
      case Project(_, c) => findAggAndLeaf(c)
      case s: org.apache.spark.sql.catalyst.plans.logical.Sort => findAggAndLeaf(s.child)
      case _ => None
    }

  private[plans] def pureScan(p: LogicalPlan): Option[LogicalRelation] = p match {
    case lr: LogicalRelation if lr.relation.isInstanceOf[HadoopFsRelation] => Some(lr)
    case Project(_, c) => pureScan(c)
    case SubqueryAlias(_, c) => pureScan(c)
    case _ => None
  }

  private[plans] def leafPaths(lr: LogicalRelation): Set[String] =
    lr.relation.asInstanceOf[HadoopFsRelation]
      .location.rootPaths.map(_.toString).toSet
}

/** The optimizer rule: see [[MvRewrite]]. Appended to
  * `spark.experimental.extraOptimizations`, so it runs after the standard
  * batches (pruning already pushed a Project under the Aggregate).
  */
final class MvAggregateRewrite(spark: SparkSession) extends Rule[LogicalPlan] {
  import MvRewrite._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val ts = allTargets
    if (ts.isEmpty) plan
    else plan.transformUp {
      case agg: Aggregate =>
        pureScan(agg.child).flatMap { leaf =>
          ts.find(t => leafPaths(leaf) == t.factPaths &&
              agg.groupingExpressions.map(shape) == t.groupShapes)
            .flatMap(t => rewrite(agg, t))
        }.getOrElse(agg)
    }
  }

  private def rewrite(agg: Aggregate, t: Target): Option[LogicalPlan] = {
    val mvPlan = spark.read.parquet(t.mvPath).queryExecution.analyzed
    val mvOut = mvPlan.output.map(a => a.name -> a).toMap
    val groupAttr = mvOut(t.groupMvColumn)
    val groupShape = t.groupShapes.head
    val mapped: Seq[Option[NamedExpression]] = agg.aggregateExpressions.map {
      case al @ Alias(child, name) if shape(child) == groupShape =>
        Some(Alias(groupAttr, name)(al.exprId))
      case al @ Alias(child, name) =>
        t.aggToMvColumn.get(shape(child)).map { col =>
          Alias(AggregateExpression(Sum(mvOut(col)), Complete, isDistinct = false),
            name)(al.exprId)
        }
      case _ => None
    }
    if (mapped.exists(_.isEmpty)) None // any unmapped output -> leave untouched
    else {
      fired.incrementAndGet()
      // prune explicitly: this rule runs in extraOptimizations, AFTER the
      // standard column-pruning batch, so nothing downstream would strip
      // the MV's unused columns (ship_day) from the scan otherwise
      val needed = (Seq(groupAttr) ++ mapped.flatten.flatMap(_.collect {
        case a: AttributeReference => a
      })).distinct.filterNot(_ == groupAttr).prepended(groupAttr)
      Some(Aggregate(Seq(groupAttr), mapped.flatten, Project(needed, mvPlan)))
    }
  }
}
