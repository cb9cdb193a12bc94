package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep a per-key state frame of
  * MERGEABLE aggregates (count / sum / min / max) and fold each new
  * delta partition into it with one co-partitioned full-outer join —
  * never rescanning history. This is THE pattern that keeps a 100 TB
  * rolling metric store cheap: the daily cost is |delta| + |state|,
  * not |corpus|, and with both sides bucketed on the key the merge is
  * exchange-free. The oracle is the full recompute over
  * state ∪ delta, so the algebraic merge is hash-verified exact
  * (sums in decimal(18,2) — order-independent, never raw double).
  *
  * Only MERGEABLE aggregates belong in the state (count/sum/min/max,
  * and by extension mean = sum/count; the approx sketches in
  * `ops/Functions` merge too). Non-mergeable ones (exact median,
  * exact distinct) need their inputs — that is a different storage
  * contract, not a different merge.
  */
object Incremental {

  /** Per-key aggregate state for one slice of data. */
  def aggState(df: DataFrame, keyCol: String, valueCol: String): DataFrame =
    df.groupBy(col(keyCol).as("k"))
      .agg(
        count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(18,2)")).as("sum_v"),
        min(col(valueCol).cast("decimal(18,2)")).as("min_v"),
        max(col(valueCol).cast("decimal(18,2)")).as("max_v"))

  /** Merge a delta's state into the existing state. Null-safe key
    * equality so the NULL-key group merges like any other key (a plain
    * join would emit two NULL rows where the full recompute emits one).
    * `least`/`greatest` skip NULL inputs in both Spark and DuckDB, so a
    * key present on only one side keeps that side's extrema.
    */
  def mergeAggState(state: DataFrame, delta: DataFrame, keyName: String = "k"): DataFrame = {
    val s = state.select(col("k").as("_ks"), col("n").as("_ns"),
      col("sum_v").as("_ss"), col("min_v").as("_mins"), col("max_v").as("_maxs"))
    val d = delta.select(col("k").as("_kd"), col("n").as("_nd"),
      col("sum_v").as("_sd"), col("min_v").as("_mind"), col("max_v").as("_maxd"))
    s.join(d, col("_ks") <=> col("_kd"), "full_outer")
      .select(
        coalesce(col("_ks"), col("_kd")).as(keyName),
        (coalesce(col("_ns"), lit(0L)) + coalesce(col("_nd"), lit(0L))).as("n"),
        // all-NULL-valued keys must stay NULL (as a full recompute's SUM
        // would), not become 0 — only coalesce when one side has a sum
        when(col("_ss").isNull && col("_sd").isNull, lit(null))
          .otherwise(coalesce(col("_ss"), lit(0).cast("decimal(18,2)")) +
            coalesce(col("_sd"), lit(0).cast("decimal(18,2)")))
          .cast("decimal(18,2)").as("sum_v"),
        least(col("_mins"), col("_mind")).as("min_v"),
        greatest(col("_maxs"), col("_maxd")).as("max_v"))
  }

  /** N-way merge of aggregate-state partials in ONE aggregate — the
    * shape the streaming store reader uses (k batch partials for a key
    * fold to one row; `sum` skips NULLs so an all-NULL-valued key keeps
    * a NULL sum, matching [[mergeAggState]]'s pairwise contract without
    * any join).
    */
  def mergePartials(partials: DataFrame): DataFrame =
    partials.groupBy(col("k"))
      .agg(
        sum(col("n")).cast("bigint").as("n"),
        sum(col("sum_v")).cast("decimal(18,2)").as("sum_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))

  /** Streaming twin: maintain the per-key aggregate state from a stream.
    * Each micro-batch writes its own state partial to a batch-id
    * directory (whole-dir overwrite ⇒ redelivery of a batch converges to
    * the same store — the [[Cdc.applyChangelogSink]] idempotence
    * contract), and readers fold base + all committed partials with
    * [[mergePartials]]. Equal to `aggState(base events ∪ streamed
    * events)` by the mergeability of count/sum/min/max.
    */
  def aggStateSink(
      events: DataFrame,
      keyCol: String,
      valueCol: String,
      outDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        aggStateBatch(batch.toDF(), keyCol, valueCol, outDir, batchId)
      }
      .start()

  /** One micro-batch's state partial — factored out so redelivery (same
    * batch id, same rows) is directly testable.
    */
  def aggStateBatch(df: DataFrame, keyCol: String, valueCol: String, outDir: String, batchId: Long): Unit = {
    aggState(df, keyCol, valueCol)
      .write.mode("overwrite").parquet(s"$outDir/state/batch_$batchId")
    ()
  }

  /** The merged state over a base state frame plus everything
    * [[aggStateSink]] has committed so far. Zero committed batches yield
    * the base unchanged (the empty-store contract).
    */
  def aggStateFrom(
      spark: org.apache.spark.sql.SparkSession,
      base: DataFrame,
      outDir: String): DataFrame = {
    val committed = graft.ext.TextOps.committedBatchDirs(spark, s"$outDir/state")
    if (committed.isEmpty) base
    else mergePartials(base.unionByName(
      spark.read.parquet(committed.toSeq.sorted.map(b => s"$outDir/state/$b"): _*)))
  }
}
