package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** One micro-batch's health row, extracted from Spark's progress event:
  * throughput, latency, and the state-store footprint — the numbers an
  * operator pages on. */
case class BatchProgress(
    query_name: String,
    batch_id: Long,
    ts: String,
    num_input_rows: Long,
    rows_per_sec: Double,
    batch_duration_ms: Long,
    state_rows: Long,
    state_bytes: Long,
    watermark: String)

/** The "Monitors" downstream surface (reference behavior class: the
  * stack's pptx routes query output to Time-series + Monitors consumers;
  * StructuredStreaming.scala:86-100 only console-prints progress): a
  * [[StreamingQueryListener]] that PERSISTS every micro-batch's progress
  * to a parquet monitoring store, plus the health reader over it.
  *
  * Scale shape: one O(1) row per (query, batch) written from the driver
  * listener thread — the store grows with batches, never with data;
  * the reader is a bounded-key aggregate. Listener delivery is
  * asynchronous and at-least-once on restart, so the reader dedups on
  * (query_name, batch_id), making redelivery harmless — the same
  * idempotence contract as every sink here.
  */
object Monitors {

  /** Attach a persisting monitor; returns the listener so callers can
    * detach with `spark.streams.removeListener`. */
  def attach(spark: SparkSession, outDir: String): StreamingQueryListener = {
    val listener = new StreamingQueryListener {
      import StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        val stateRows = p.stateOperators.map(_.numRowsTotal).sum
        val stateBytes = p.stateOperators.map(_.memoryUsedBytes).sum
        val row = BatchProgress(
          Option(p.name).getOrElse(p.id.toString),
          p.batchId,
          p.timestamp,
          p.numInputRows,
          p.processedRowsPerSecond,
          Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L),
          stateRows,
          stateBytes,
          Option(p.eventTime.get("watermark")).getOrElse(""))
        import spark.implicits._
        // one tiny append per batch; failures must never kill the
        // listener bus (monitoring is best-effort by contract)
        try Seq(row).toDS().write.mode("append").parquet(outDir)
        catch { case _: Throwable => () }
      }
    }
    spark.streams.addListener(listener)
    listener
  }

  /** Raw per-batch rows, deduped on (query, batch) — redelivery-safe. */
  def progress(spark: SparkSession, outDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_name"), col("batch_id"))
      .orderBy(col("ts").desc)
    spark.read.parquet(outDir)
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1).drop("_rn")
  }

  /** Health rollup per query: batches seen, rows ingested, latency
    * bounds, current state footprint (from the LATEST batch). */
  def health(spark: SparkSession, outDir: String): DataFrame = {
    val p = progress(spark, outDir)
    val latest = p.groupBy(col("query_name"))
      .agg(max(col("batch_id")).as("batch_id"))
      .join(p, Seq("query_name", "batch_id"))
      .select(col("query_name"), col("state_rows").as("latest_state_rows"),
        col("state_bytes").as("latest_state_bytes"))
    p.groupBy(col("query_name"))
      .agg(
        count(lit(1)).as("n_batches"),
        sum(col("num_input_rows")).as("total_rows"),
        max(col("batch_duration_ms")).as("max_batch_ms"),
        expr("percentile(batch_duration_ms, 0.5)").as("p50_batch_ms"))
      .join(latest, Seq("query_name"))
  }
}
