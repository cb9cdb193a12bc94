package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Measurement utility (probes + layout tests): the rows a query's
  * parquet scans actually MATERIALIZED — i.e. what survived row-group
  * min/max pruning of the pushed predicates — read from the executed
  * plan's scan metrics. This is the direct observable for "did the
  * clustered layout make the reader skip data", as opposed to footer
  * geometry, which only says it could.
  *
  * Recurses through AQE wrappers and query stages (plain `collect` stops
  * at stage boundaries).
  */
object ScanMetrics {
  private def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    case q: QueryStageExec => scans(q.plan)
    case s: FileSourceScanExec => Seq(s)
    case other => other.children.flatMap(scans)
  }

  /** Executes `df` (collect) and returns the summed `numOutputRows` of
    * every parquet scan in its final plan. */
  def scanOutputRows(df: DataFrame): Long = {
    df.collect()
    scans(df.queryExecution.executedPlan)
      .map(_.metrics("numOutputRows").value).sum
  }
}
