package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.ScalaUDF
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{CartesianProductExec, SortMergeJoinExec}

/** Physical-plan shape counters shared by PlanQualitySpec and
  * PlanManifestSpec. Counting is by NODE/EXPRESSION CLASS, not by plan
  * string: a `ScalaUDF` renders as `UDF(...)` or its `withName` label, so
  * string matching on "ScalaUDF" never fires (the r9 spec's no-UDF
  * assertion was vacuous — fixed here).
  */
object PlanStats {

  case class Counts(
      shuffles: Int, broadcasts: Int, generates: Int,
      cartesians: Int, sortMerges: Int, scalaUdfs: Int) {
    def render: String =
      s"shuffles=$shuffles bcast=$broadcasts generate=$generates " +
        s"cartesian=$cartesians smj=$sortMerges udf=$scalaUdfs"
  }

  /** Counts over the executed plan (AQE wrappers unwrapped to the initial
    * physical plan so the counts are static-plan facts, independent of
    * runtime re-optimization).
    */
  def of(df: DataFrame): Counts = {
    var shuffles, broadcasts, generates, cartesians, sortMerges, udfs = 0
    def visit(p: SparkPlan): Unit = p.foreach { node =>
      node match {
        case a: AdaptiveSparkPlanExec => visit(a.initialPlan)
        case _: ShuffleExchangeExec => shuffles += 1
        case _: BroadcastExchangeExec => broadcasts += 1
        case _: org.apache.spark.sql.execution.GenerateExec => generates += 1
        case _: CartesianProductExec => cartesians += 1
        case _: SortMergeJoinExec => sortMerges += 1
        case _ => ()
      }
      node.expressions.foreach(_.foreach {
        case _: ScalaUDF => udfs += 1
        case _ => ()
      })
    }
    visit(df.queryExecution.executedPlan)
    Counts(shuffles, broadcasts, generates, cartesians, sortMerges, udfs)
  }

  /** True iff any expression anywhere in the plan is a ScalaUDF. */
  def hasScalaUdf(df: DataFrame): Boolean = of(df).scalaUdfs > 0
}
