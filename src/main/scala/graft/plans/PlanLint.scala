package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.ScalaUDF
import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, Join, LogicalPlan, Sort, Window}

/** Static scale-linter over a DataFrame's OPTIMIZED logical plan — the
  * review checklist this engine applies to itself ("would this plan
  * survive 100×?"), executable against any user query before it runs:
  *
  *  - `cartesian_join`: a join with no condition multiplies partitions —
  *    the canonical scale-killer (every library join here is keyed or
  *    against a broadcast one-row frame).
  *  - `single_partition_window`: a window with an empty PARTITION BY
  *    plans an Exchange SinglePartition — every row through one task
  *    (the dense_ids operator exists precisely to avoid it; small
  *    bounded frames are the legitimate exception, which is why this is
  *    a lint, not an error).
  *  - `global_sort`: ORDER BY with no LIMIT above it is a full
  *    range-shuffle sort of the whole result; top-k should ride
  *    TakeOrderedAndProject instead.
  *  - `scala_udf`: a Scala UDF black-boxes the expression — no codegen,
  *    no pushdown through it (the library's own rule: compiled Catalyst
  *    expressions instead; this engine ships zero UDFs).
  *
  * Inspection happens AFTER the optimizer, so patterns Catalyst already
  * fixes (pruning, constant folding, pushdown) don't false-positive;
  * the rules look at what will actually run. Driver-side plan walk,
  * zero jobs.
  */
object PlanLint {

  /** (rule, hits) for every lint rule, zeros included — a stable,
    * assertable shape. */
  def lint(df: DataFrame): Seq[(String, Int)] = {
    val plan = df.queryExecution.optimizedPlan
    val cartesian = plan.collect {
      case j: Join if j.condition.isEmpty => j
    }.size
    val singleWin = plan.collect {
      case w: Window if w.partitionSpec.isEmpty => w
    }.size
    // a global Sort is fine when a GlobalLimit sits anywhere above it
    // (planned as top-k); count sorts with no limit ancestor
    def sortsWithoutLimit(p: LogicalPlan, underLimit: Boolean): Int = p match {
      case _: GlobalLimit => p.children.map(sortsWithoutLimit(_, underLimit = true)).sum
      case s: Sort if s.global && !underLimit =>
        1 + s.children.map(sortsWithoutLimit(_, underLimit)).sum
      case other => other.children.map(sortsWithoutLimit(_, underLimit)).sum
    }
    val globalSort = sortsWithoutLimit(plan, underLimit = false)
    val udfs = plan.collect {
      case p if p.expressions.exists(_.exists(_.isInstanceOf[ScalaUDF])) => p
    }.size
    Seq(
      "cartesian_join" -> cartesian,
      "single_partition_window" -> singleWin,
      "global_sort" -> globalSort,
      "scala_udf" -> udfs)
  }

  /** [[lint]] as a one-row-per-rule DataFrame for a LABELED plan. */
  def lintDF(label: String, df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    lint(df).map { case (r, n) => (label, r, n) }
      .toDF("plan_label", "rule", "hits")
  }
}
