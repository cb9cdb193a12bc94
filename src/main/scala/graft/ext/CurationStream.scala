package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** The end-to-end STREAMING curation pipeline — the batch
  * `pipeline_curate2` composition re-expressed as ONE continuous query
  * over an arriving crawl: decontaminate → quality-filter → exact dedup
  * → survivors + running report card. Each stage is the already-tested
  * streaming form of a gated batch operator; this object gates their
  * COMPOSITION (the StreamingSpec parity test replays batches through
  * it and requires the result to equal the batch composition on the
  * same documents).
  *
  * Stage shapes, in arrival order:
  *  - decontamination: [[Dedup.bloomScreenStream]] — STATELESS screen
  *    against the benchmark's Bloom blob (numBits/8 bytes at any
  *    reference size; no false negatives, so nothing contaminated ever
  *    survives; size numBits for the fp rate the corpus tolerates).
  *  - quality: the [[TextOps.classifierScoreSql]] hashed-bag-of-words
  *    score as an inline projection (a streaming stage cannot join back
  *    against itself to recover columns, so the score rides as a column
  *    and drops after the filter).
  *  - exact dedup: content-hash `dropDuplicatesWithinWatermark` — the
  *    managed-state keep-first-ARRIVAL; state is bounded by arrival
  *    rate × watermark, the documented streaming dedup contract.
  *  - sink: ONE foreachBatch writing survivors with dynamic
  *    partition-overwrite by batch id (idempotent under replay) and
  *    folding the same batch into the accumulated report card
  *    ([[TextOps.corpusStatsBatch]] / [[TextOps.corpusStatsFrom]]) —
  *    the before/after numbers a curation stream logs, with no second
  *    query over the data.
  */
object CurationStream {

  def curateStream(
      docs: DataFrame, // columns: doc_id, ts (event time), text
      benchmark: DataFrame, // reference eval set with a text column
      outDir: String,
      checkpointDir: String,
      delay: String = "10 minutes",
      expectedItems: Long = 1L << 20,
      numBits: Long = 1L << 23): StreamingQuery = {
    val decontaminated =
      Dedup.bloomScreenStream(docs, benchmark, expectedItems, numBits)
    val quality = decontaminated
      .withColumn("_score", expr(
        TextOps.classifierScoreSql("filter(split(text, ' '), x -> x != '')")))
      .filter(col("_score") >= 0)
      .drop("_score")
    val deduped = quality
      .withColumn("_th", expr(TextOps.md5Long64("text")))
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("_th")
      .drop("_th")
    deduped.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch.withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(s"$outDir/docs")
        TextOps.corpusStatsBatch(batch.toDF(), s"$outDir/stats", batchId)
      }
      .start()
  }
}
