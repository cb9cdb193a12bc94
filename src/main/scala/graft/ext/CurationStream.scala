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

  /** NULL-text policy: a NULL text scores NULL and the quality filter
    * drops it — the batch [[TextOps.classifierScore]] surfaces NULL so
    * caller policy can decide, but a continuous pipeline must decide
    * inline, and "unscorable does not enter the training corpus" is the
    * conservative call. Route NULL-text rows around the pipeline
    * upstream if they must be preserved.
    */
  def curateStream(
      docs: DataFrame, // columns: doc_id, ts (event time), text
      benchmark: DataFrame, // reference eval set with a text column
      outDir: String,
      checkpointDir: String,
      delay: String = "10 minutes",
      expectedItems: Long = 1L << 20,
      numBits: Long = 1L << 23): StreamingQuery = {
    // pin the benchmark for the QUERY's lifetime: IncrementalExecution
    // re-plans the Bloom blob's scalar subquery every micro-batch
    // (bloomScreenStream scaladoc), so an unpinned reference would
    // re-scan + re-aggregate O(benchmark) per batch; released by the
    // termination listener below
    val bench = benchmark.persist()
    val decontaminated =
      Dedup.bloomScreenStream(docs, bench, expectedItems, numBits)
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
    val query = deduped.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        // one persist spans BOTH per-batch actions — without it the
        // micro-batch plan executes once for the survivor write and
        // again for the report-card fold (the Sinks.scala idiom).
        // corpusStatsBatch's inner persist of the same plan is a no-op
        // against this cache; its unpersist releases it, so the order
        // (survivors first, stats last) is load-bearing.
        val b = batch.persist()
        try {
          b.withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(s"$outDir/docs")
          TextOps.corpusStatsBatch(b.toDF(), s"$outDir/stats", batchId)
        } finally b.unpersist()
        ()
      }
      .start()
    val session = docs.sparkSession
    session.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit = ()
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
          if (e.id == query.id) {
            bench.unpersist()
            session.streams.removeListener(this)
          }
      })
    query
  }
}
