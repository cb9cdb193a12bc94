package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All reads go through here so every query benefits from the same
  * scan-level behavior: explicit parquet source (vectorized reader,
  * predicate pushdown, column pruning all come from Catalyst for free).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame =
    spark.read.parquet(s"$sfDir/$table.parquet")

  /** `events.parquet` has carried two physical `ts` encodings across data
    * generations: TIMESTAMP(NANOS) (no native Spark type — read nanos as raw
    * Long via the legacy conf and truncate to micros, the same truncation
    * DuckDB applies casting TIMESTAMP_NS to its microsecond TIMESTAMP) and
    * TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark 4 infers as
    * TIMESTAMP_NTZ. Every downstream operator does epoch arithmetic with
    * `unix_micros`, which requires the LTZ TimestampType, so normalize both
    * to TimestampType here. The NTZ→LTZ cast interprets the wall-clock value
    * in the session time zone; all graft sessions pin UTC, so the stored
    * micros pass through unchanged — exactly the value DuckDB's epoch_us()
    * sees on the naive timestamp.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  /** Measurement hygiene, OPT-IN: the driver's documents table is ONE
    * parquet file (single row group ⇒ a single input split no
    * maxPartitionBytes setting can subdivide), so cheap projections run
    * single-task at 1× and scaling sweeps read "1× slower than 3×"
    * artifacts (BENCH_SF1's non-monotone 1× columns). With
    * `SPARK_GRAFT_DOC_SPLITS=N` the scan is followed by one round-robin
    * exchange to N partitions, putting the EXPRESSION work (what the
    * sweeps time) on the same footing as the multi-file replicas. Unset —
    * every production and gate path — the layout is untouched.
    */
  def documents(spark: SparkSession, sfDir: String): DataFrame = {
    val df = load(spark, sfDir, "documents")
    sys.env.get("SPARK_GRAFT_DOC_SPLITS") match {
      case Some(n) => df.repartition(n.toInt)
      case None => df
    }
  }
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
