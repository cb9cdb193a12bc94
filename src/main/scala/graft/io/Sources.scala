package graft.io

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Event

/** Streaming sources. The engine is source-agnostic: anything that yields
  * a Dataset[Event] feeds the sessionizer. Kafka mirrors the reference's
  * `readStream.format("kafka")` (StructuredStreaming.scala:79-84); the
  * file source backs tests and replay (the reference's producer replays a
  * JSON-lines file into Kafka, App.scala:29-49 — a file stream expresses
  * the same thing without the broker hop).
  */
object Sources {

  /** JSON wire schema of an event message (explicit — the reference's
    * startup `inferSchema` pass, StructuredStreaming.scala:71-76, is
    * exactly what a production pipeline must not do).
    */
  val eventWireSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** The configured-but-unloaded Kafka reader — split out from
    * [[kafkaEvents]] so the option plumbing (the part of the connector
    * surface that CAN fail silently: a misspelled `subscribe` key, a
    * dropped `maxOffsetsPerTrigger`) is assertable in tests without a
    * broker or the connector jar on the classpath ([[IoSpec]] pins every
    * key). `.load()` is the only step that needs either.
    */
  def kafkaReader(
      spark: SparkSession,
      bootstrapServers: String,
      topic: String,
      startingOffsets: String = "latest",
      maxOffsetsPerTrigger: Option[Long] = None)
      : org.apache.spark.sql.streaming.DataStreamReader = {
    val reader = spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
    maxOffsetsPerTrigger
      .fold(reader)(n => reader.option("maxOffsetsPerTrigger", n.toString))
  }

  /** Kafka → Dataset[Event]: value bytes → JSON → typed columns, the
    * reference's S3+P1+P2+P3 chain in one projection.
    */
  def kafkaEvents(
      spark: SparkSession,
      bootstrapServers: String,
      topic: String,
      startingOffsets: String = "latest",
      maxOffsetsPerTrigger: Option[Long] = None): Dataset[Event] =
    decode(kafkaReader(
      spark, bootstrapServers, topic, startingOffsets, maxOffsetsPerTrigger)
      .load())

  /** JSON-lines file → Dataset[Event] through the DataSourceV2
    * micro-batch replay source ([[ReplaySourceProvider]]): the reference
    * producer's batch-of-3 replay (App.scala:40–49) over the REAL
    * `readStream.format(...)` offset/commit wiring, decoded by the same
    * Kafka-envelope chain as [[kafkaEvents]].
    */
  def replayEvents(
      spark: SparkSession,
      path: String,
      batchSize: Int = 3): Dataset[Event] =
    decode(spark.readStream
      .format(classOf[ReplaySourceProvider].getName)
      .option("path", path)
      .option("batchSize", batchSize.toString)
      .load())

  /** JSON-lines directory stream → Dataset[Event] (test/replay path). */
  def fileEvents(spark: SparkSession, dir: String): Dataset[Event] = {
    import spark.implicits._
    spark.readStream
      .schema(eventWireSchema)
      .json(dir)
      .as[Event]
  }

  /** Batch format round-trip: write a deterministic fact slice as CSV,
    * JSON-lines and ORC, read each back under the EXPLICIT source schema
    * (never inference — the [[eventWireSchema]] doctrine), and reduce
    * every copy to the same exact aggregate row. Gates the text-source
    * plumbing end to end: a parser that drops a row, mangles a quoted
    * string, or loses double precision shifts an exact decimal sum and
    * fails the hash (Spark's shortest-round-trip double printing makes
    * CSV/JSON numerics lossless by construction; sums are taken as
    * decimal so partition order can't move them). The oracle recomputes
    * the aggregates straight from parquet — four sources, one truth.
    */
  def formatRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val slice = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_returnflag"))
      .where(col("l_orderkey") % 100 === 0)
    // scratch under the session checkpoint root when one is set — the
    // shared-filesystem location every executor can already reach on a
    // real cluster (a java.nio driver-local path silently assumes driver
    // and executors share a disk); Hadoop FS API for create/delete so the
    // same code lands on HDFS/S3 paths, local tmp only as the fallback
    // for checkpoint-less sessions. Deleted in the finally — the copies
    // exist only to be re-read and reduced, so nothing leaks per run.
    val tmp = spark.sparkContext.getCheckpointDir
      .map(c => s"$c/graft_fmt_roundtrip")
      .getOrElse(java.nio.file.Files.createTempDirectory("graft_fmt").toString)
    val hPath = new org.apache.hadoop.fs.Path(tmp)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val schema = slice.schema
    def summarize(fmt: String, df: DataFrame): DataFrame =
      df.agg(
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"),
        sum(col("l_orderkey")).as("sum_key"),
        countDistinct(col("l_returnflag")).as("n_flags"))
        .select(lit(fmt).as("format"), col("n_rows"), col("sum_qty"),
          col("sum_price"), col("sum_key"), col("n_flags"))
    try {
      slice.write.mode("overwrite").option("header", "true").csv(s"$tmp/csv")
      slice.write.mode("overwrite").json(s"$tmp/json")
      slice.write.mode("overwrite").orc(s"$tmp/orc")
      val out = summarize("parquet", slice)
        .unionByName(summarize("csv",
          spark.read.option("header", "true").schema(schema).csv(s"$tmp/csv")))
        .unionByName(summarize("json", spark.read.schema(schema).json(s"$tmp/json")))
        .unionByName(summarize("orc", spark.read.schema(schema).orc(s"$tmp/orc")))
      // force the aggregates BEFORE the finally deletes their input files
      // (the result is one row per format — a bounded driver action), and
      // hand back a self-contained frame with the same schema
      val rows = out.collect().toIndexedSeq
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), out.schema)
    } finally {
      fs.delete(hPath, true)
      ()
    }
  }

  /** Schema-evolution round-trip: write two parquet GENERATIONS of the
    * same table — v=1 with the original 3 columns, v=2 with a column
    * added — then read the directory back with `mergeSchema` and reduce
    * per generation to exact aggregates. Gates the two mechanisms a
    * long-lived dataset depends on: schema UNION with null backfill
    * (v=1 rows must surface the added column as NULL, not fail or
    * misalign) and partition-column discovery (the `v=N` directory key
    * becomes a readable column). The oracle recomputes the same
    * aggregates from the source table with the union-with-null
    * semantics spelled out — four generations of writers, one truth
    * (the [[formatRoundtrip]] doctrine applied to time instead of
    * format). Same scratch discipline too: checkpoint-root allocation,
    * aggregates forced, directory deleted in the finally.
    */
  def schemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val li = graft.Tables.lineitem(spark, dir)
    val v1 = li.where(col("l_orderkey") % 100 === 0)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val v2 = li.where(col("l_orderkey") % 100 === 50)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"))
    val tmp = spark.sparkContext.getCheckpointDir
      .map(c => s"$c/graft_schema_evolution")
      .getOrElse(java.nio.file.Files.createTempDirectory("graft_evo").toString)
    val hPath = new org.apache.hadoop.fs.Path(tmp)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      v1.write.mode("overwrite").parquet(s"$tmp/v=1")
      v2.write.mode("overwrite").parquet(s"$tmp/v=2")
      val merged = spark.read.option("mergeSchema", "true").parquet(tmp)
      val out = merged
        .groupBy(col("v").cast("int").as("v"))
        .agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("l_extendedprice").isNull, 1L)).as("n_null_price"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            .as("sum_price"))
        .orderBy(col("v"))
      val rows = out.collect().toIndexedSeq
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), out.schema)
    } finally {
      fs.delete(hPath, true)
      ()
    }
  }

  /** Kafka envelope → typed events (shared by batch backfill and stream).
    * DROPMALFORMED semantics: `from_json` yields a null struct for corrupt
    * payloads, and the filter drops them — one poisoned message must not
    * kill a long-running stream (the typed encoder would otherwise fail on
    * the null primitive key).
    */
  def decode(kafka: DataFrame): Dataset[Event] = {
    import kafka.sparkSession.implicits._
    kafka
      .select(from_json(col("value").cast("string"), eventWireSchema).as("e"))
      .filter(col("e.event_id").isNotNull)
      .select("e.*")
      .as[Event]
  }
}
