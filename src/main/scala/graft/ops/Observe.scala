package graft.ops

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/** In-flight audit metrics via `Dataset.observe` — the observability
  * surface a production curation pipeline needs and a second scan can't
  * afford: row counts, null-key counts and exact measure sums are
  * computed BY THE QUERY ITSELF as its one pass runs (Catalyst's
  * CollectMetrics node — an accumulator-backed side channel, not an
  * aggregate in the plan), so auditing a 100 TB write costs zero extra
  * exchanges and zero extra scans. The alternative — re-aggregating the
  * curated frame — pays the whole scan again and can silently diverge
  * from what the sink actually saw if the input is not deterministic.
  *
  * Batch: [[auditedCount]] runs one action under an [[Observation]] and
  * returns the metrics. Streaming: the same `.observe(...)` column set
  * attaches to a stream and surfaces per-batch in
  * `StreamingQueryProgress.observedMetrics` (pinned in StreamingSpec).
  *
  * Constraint inherited from Spark's contract: observed aggregates may
  * not use DISTINCT (they must be mergeable accumulators) — the same
  * mergeable-partials doctrine the streaming stores follow.
  */
object Observe {

  /** The standard curation audit column set: rows seen, null keys, and
    * an exact decimal measure sum (order-independent, the money
    * doctrine). */
  def auditMetrics(keyCol: String, measureCol: String): Seq[org.apache.spark.sql.Column] = Seq(
    count(lit(1)).as("n_rows"),
    sum(col(keyCol).isNull.cast("long")).as("n_null_keys"),
    sum(col(measureCol).cast("decimal(18,2)")).as("sum_measure"))

  /** Attach the audit to `df`, run ONE counting action, and return
    * (row count, observed metrics). The metrics describe exactly the
    * rows that action processed. */
  def auditedCount(
      df: DataFrame,
      keyCol: String,
      measureCol: String): (Long, Map[String, Any]) = {
    val obs = Observation()
    val cols = auditMetrics(keyCol, measureCol)
    val observed = df.observe(obs, cols.head, cols.tail: _*)
    val n = observed.count()
    (n, obs.get)
  }

  /** Gate-visible form: the audited pass over the curated events slice,
    * with the observed metrics returned AS the result frame (one row) —
    * so the DuckDB oracle can recompute what the side channel reported.
    * The pass itself is the pipeline action (a count over the curated
    * frame); the metrics ride it.
    */
  def observedAudit(s: SparkSession, dir: String): DataFrame = {
    val curated = graft.Tables.events(s, dir)
      .where(col("event_type").isNotNull)
    val (n, m) = auditedCount(curated, "user_id", "value")
    val sumMeasure = m("sum_measure") match {
      case null => 0.0
      case d: java.math.BigDecimal => d.doubleValue()
      case d: BigDecimal => d.doubleValue
      case other => other.toString.toDouble
    }
    import s.implicits._
    Seq((m("n_rows").asInstanceOf[Long], n,
      m("n_null_keys").asInstanceOf[Long], sumMeasure))
      .toDF("n_rows", "n_counted", "n_null_keys", "sum_measure")
  }
}
