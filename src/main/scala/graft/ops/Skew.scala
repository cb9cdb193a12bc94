package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation primitives. AQE's skew-join handling covers joins at
  * runtime; for heavily-skewed AGGREGATION keys (one user producing a
  * large share of a 100 TB stream) the classic fix is salting: shuffle on
  * (key, salt) first so no single reducer owns a hot key, then combine the
  * per-salt partials — two small shuffles instead of one stalled one.
  *
  * The salt must be deterministic for oracle checking: derived from a
  * row-identity column, not `rand()`. Result is identical to the unsalted
  * aggregation (verified by the `salted_agg` oracle, which is the PLAIN
  * formulation).
  */
object Skew {

  /** Two-phase salted sum/count aggregation.
    *
    * @param saltFrom row-identity column the salt is derived from
    * @param buckets  salt fan-out (≈ number of reducers a hot key spreads
    *                 over; 8–32 covers most real skew)
    */
  def saltedSumCount(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      saltFrom: String,
      buckets: Int = 16): DataFrame =
    df.withColumn("_salt", pmod(col(saltFrom), lit(buckets)))
      .groupBy(col(keyCol), col("_salt"))
      .agg(
        count(lit(1)).as("_n"),
        sum(col(valueCol).cast("decimal(18,2)")).as("_s"))
      .groupBy(col(keyCol))
      .agg(
        sum(col("_n")).as("n_events"),
        sum(col("_s")).cast("double").as("sum_value"))

  /** Salted shuffle join for a skewed fact key: the fact side salts on a
    * row-identity column, the (small-ish but not broadcastable) dim side
    * is REPLICATED once per salt bucket, and the join key becomes
    * (key, salt) — a hot key's rows spread over `buckets` reducers
    * instead of stalling one. Result is identical to the plain join
    * (verified by the oracle, which is the unsalted formulation).
    * AQE's skew-join split covers sort-merge cases at runtime; explicit
    * salting remains the deterministic form that also works for
    * aggregations and under AQE-off.
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      saltFrom: String,
      buckets: Int = 16): DataFrame = {
    val salted = fact.withColumn("_salt", pmod(col(saltFrom), lit(buckets)))
    val replicated = dim
      .withColumn("_dsalt", explode(sequence(lit(0), lit(buckets - 1))))
      .withColumnRenamed(key, "_dk")
    salted
      .join(replicated, col(key) === col("_dk") && col("_salt") === col("_dsalt"))
      .drop("_salt", "_dsalt", "_dk")
  }

  /** Join-key SKEW telemetry — the measurement that justifies (or
    * rules out) [[saltedSumCount]]/[[saltedJoin]] before anyone pays
    * their replication cost: the key-frequency distribution folded
    * into integer log₂ magnitude buckets. One row per magnitude m with
    * the number of distinct keys whose count has ⌊log₂⌋ = m and the
    * rows they carry — a heavy top bucket says salt, a flat profile
    * says don't. NULL keys group like any key (a hot NULL is the most
    * common real-world skew cause). Key identities are
    * [[graft.ext.TextOps.heavyHitters]]'s job; this is the shape.
    *
    * Scale shape: two map-side-combined aggregates — the (key) count
    * and the ≤64-row magnitude fold. The key aggregate's exchange
    * carries one row per key per partition; the hot key itself
    * combines map-side, so the diagnosis never suffers the skew it
    * measures.
    */
  def skewReport(df: DataFrame, keyCol: String): DataFrame =
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("c"))
      .selectExpr("c", "cast(length(bin(c)) - 1 as int) as freq_mag")
      .groupBy(col("freq_mag"))
      .agg(count(lit(1)).as("n_keys"),
        sum(col("c")).cast("bigint").as("n_rows"))
}
