package graft.io

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.streaming.SessionizedEvent

/** Sinks. The reference runs FIVE concurrent streaming queries off one
  * topic — console debug, two per-row Redis writers, two per-row Cassandra
  * writers (StructuredStreaming.scala:228-279) — five Kafka consumers with
  * unsynchronized batches, one CQL INSERT / up-to-13 Redis round-trips per
  * row. Here: ONE query, `foreachBatch`, fanning out to N sinks from the
  * same consistent micro-batch with vectorized parquet/connector writes.
  */
object Sinks {

  /** Fan-out: append the enriched history (the Cassandra
    * `moneysmartprocessed` stand-in) and maintain a compacted per-user
    * state snapshot (the Redis stand-in), both parquet, both batch-level.
    */
  def historyAndState(
      sessionized: Dataset[SessionizedEvent],
      outDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    sessionized.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[SessionizedEvent], batchId: Long) =>
        val df = batch.toDF().persist()
        try {
          // history: partitioned by (batch_id, event_date) and written with
          // DYNAMIC partition overwrite — re-delivering a batch id (the
          // post-crash foreachBatch contract: the last batch MAY repeat)
          // rewrites exactly its own partitions instead of appending
          // duplicates. This is the parquet analogue of the reference's
          // Cassandra upsert keyed on (ts, user_id): replay converges to
          // the same rows instead of accumulating them. A plain append
          // would double history on every recovery replay. event_date
          // stays in the spec so date filters prune at the second level.
          //
          // LIFECYCLE CONTRACT: batch ids are scoped to ONE checkpoint, so
          // checkpointDir and outDir form a unit — starting a FRESH
          // checkpoint against an EXISTING outDir restarts ids at 0 and
          // would overwrite the previous run's partitions (Spark's own
          // file sinks have the same property via their _spark_metadata
          // log). Point a new checkpoint at a new outDir; resume the same
          // checkpoint to continue the same output.
          df.withColumn("batch_id", lit(batchId))
            .withColumn("event_date", to_date(col("ts")))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id", "event_date")
            .parquet(s"$outDir/history")
          // state snapshot: last record per user in this batch, merged by
          // overwrite-latest (idempotent per batchId directory)
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("user_id"))
            .orderBy(col("ts").desc, col("event_id").desc)
          df.withColumn("_rn", row_number().over(w))
            .filter(col("_rn") === 1).drop("_rn")
            .write.mode("overwrite")
            .parquet(s"$outDir/state/batch_$batchId")
        } finally df.unpersist()
        ()
      }
      .start()

  /** Streaming dead-letter routing: apply the declarative dq rules to
    * every micro-batch and fan out from ONE query — clean rows to
    * `outDir/clean`, failing rows (with their `failed_rules` verdicts)
    * to `outDir/quarantine` — the ingest-boundary pattern where bad
    * records must never silently vanish NOR poison the main table.
    * Both legs write idempotently per batch id (partition overwrite),
    * honoring the post-crash foreachBatch replay contract the history
    * sink established; rule evaluation is [[graft.ops.Quality
    * .dqQuarantine]]'s single shared projection, so batch and streaming
    * verdicts can never diverge.
    */
  def dqQuarantineSink(
      events: org.apache.spark.sql.DataFrame,
      rules: Seq[graft.ops.Quality.DqRule],
      outDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val df = batch.persist()
        try {
          val bad = graft.ops.Quality.dqQuarantine(df, rules).persist()
          try {
            bad.write.mode("overwrite")
              .parquet(s"$outDir/quarantine/batch_$batchId")
            // clean = rows anti-joined against the quarantined rows on the
            // FULL column tuple, with NULL-SAFE equality — a failing row
            // often fails BECAUSE a column is null, and `=` would let it
            // slip past the anti-join into the clean leg. Exact because
            // verdicts are value-deterministic: any row value-equal to a
            // quarantined row earns the same scalar/ref verdicts, and
            // identical rows share their Unique key, so a value-twin of a
            // bad row is itself bad
            val badSide = bad.select(df.columns
              .map(c => org.apache.spark.sql.functions.col(c).as(s"_q_$c")): _*)
            val cond = df.columns
              .map(c => org.apache.spark.sql.functions.col(c) <=>
                org.apache.spark.sql.functions.col(s"_q_$c"))
              .reduce(_ && _)
            df.join(badSide, cond, "left_anti")
              .write.mode("overwrite")
              .parquet(s"$outDir/clean/batch_$batchId")
          } finally bad.unpersist()
        } finally df.unpersist()
        ()
      }
      .start()

  /** Console sink (the reference's dev sink, StructuredStreaming:228-231). */
  def console(sessionized: Dataset[SessionizedEvent]): StreamingQuery =
    sessionized.writeStream.format("console").outputMode("append").start()

  /** The configured-but-unstarted Kafka writer — split out from [[kafka]]
    * so the option plumbing is assertable without a broker ([[IoSpec]]).
    * `acks` passes through as the producer config `kafka.acks`, covering
    * the reference's three producer modes (GetProducerAPI.scala:33,57,82):
    * `"0"` = fire-and-forget, `"1"` = leader-ack (the sync/async pair's
    * default), `"all"` = full-ISR durability. Anything the connector
    * should hand the underlying KafkaProducer rides the same
    * `kafka.`-prefix convention.
    */
  /** Whole-row → single `value` JSON column, the shape the Kafka
    * connector requires. Shared by [[kafkaWriter]] and directly testable
    * on a batch frame (a streaming frame can't be collected in a test).
    */
  def jsonPayload(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.map(col): _*)).as("value"))

  def kafkaWriter(
      df: DataFrame,
      bootstrapServers: String,
      topic: String,
      checkpointDir: String,
      acks: String = "all")
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    jsonPayload(df)
      .writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .option("kafka.acks", acks)
      .option("checkpointLocation", checkpointDir)

  /** Kafka producer sink — the reference's producer app emits JSON lines
    * (GetProducerAPI.scala:82-105); engine-side the same is one writeStream.
    */
  def kafka(
      df: DataFrame,
      bootstrapServers: String,
      topic: String,
      checkpointDir: String,
      acks: String = "all"): StreamingQuery =
    kafkaWriter(df, bootstrapServers, topic, checkpointDir, acks).start()
}
