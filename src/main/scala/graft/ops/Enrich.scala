package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Stateless enrichment column ops — the reference's projection surface
  * (SURVEY.md §2b), re-expressed as composable `Column` functions so each
  * query is a single projection (the reference stacks 12+ sequential
  * `withColumn`s, StructuredStreaming.scala:167-178; Catalyst collapses
  * them but authoring one `select` avoids the analyzer cost entirely).
  *
  * Everything here is built-in `functions._` — codegen'd, no UDFs — so the
  * whole enrichment stays inside one WholeStageCodegen span at any scale.
  */
object Enrich {

  /** Platform normalization (StructuredStreaming.scala:96-100): anything
    * that is not exactly "MOBILE" is "WEB".
    */
  def normalizePlatform(platform: Column): Column =
    when(platform === "MOBILE", "MOBILE").otherwise("WEB")

  /** Device classification from a user-agent string — the reference's
    * 5-way CASE/LIKE chain (StructuredStreaming.scala:101-115), same
    * match order (Windows, android, iPhone, iPad, Mac, Others).
    */
  def classifyDevice(userAgent: Column): Column =
    when(userAgent.like("%Windows%"), "Windows PC")
      .when(userAgent.like("%android%"), "Android")
      .when(userAgent.like("%iPhone%"), "iPhone")
      .when(userAgent.like("%iPad%"), "iPad")
      .when(userAgent.like("%Mac%"), "iMac")
      .otherwise("Others")

  /** Deterministic user-agent assignment for the driver test tables (the
    * `events` table has no user_agent column; the reference's sample file
    * is not in its repo either, FIXTURES.md §A1). Keyed on user_id so the
    * classifier above sees every branch.
    */
  def syntheticUserAgent(userId: Column): Column =
    when(userId % 6 === 0, "Mozilla/5.0 (Windows NT 10.0; Win64; x64)")
      .when(userId % 6 === 1, "Mozilla/5.0 (Linux; android 13; Pixel 7)")
      .when(userId % 6 === 2, "Mozilla/5.0 (iPhone; CPU iPhone OS 16_0)")
      .when(userId % 6 === 3, "Mozilla/5.0 (iPad; CPU OS 16_0)")
      .when(userId % 6 === 4, "Mozilla/5.0 (Macintosh; Intel Mac OS X 13_0)")
      .otherwise("curl/8.0")

  /** Raw-platform derivation used for the driver test tables (events have
    * no platform column; click/view traffic counts as MOBILE).
    */
  def platformFromEventType(eventType: Column): Column =
    normalizePlatform(
      when(eventType.isin("click", "view"), "MOBILE").otherwise(upper(eventType)))

  /** `props.k` as bigint (P2 JSON parse in single-field form). */
  def kFromProps(props: Column): Column =
    get_json_object(props, "$.k").cast(LongType)

  /** Schema for the `props` JSON column of the events table. */
  val propsSchema: StructType = StructType(Seq(StructField("k", LongType)))

  /** JSON parse + struct flatten (StructuredStreaming.scala:88-89:
    * `from_json(...).as("data")` then `select("data.*")`).
    */
  def parseProps(df: DataFrame, propsCol: String = "props"): DataFrame =
    df.withColumn("_props", from_json(col(propsCol), propsSchema))
      .withColumn("k", col("_props.k"))
      .drop("_props")

  /** Full enrichment of an events micro-batch/table in ONE projection:
    * rename (P4), JSON parse (P2/P3), platform normalize (P7), device
    * classify (P8), last_visited copy (P9).
    */
  def enrichEvents(events: DataFrame): DataFrame = {
    val ua = syntheticUserAgent(col("user_id"))
    events.select(
      col("event_id"),
      col("user_id"),
      col("ts").as("message_date"),
      ua.as("user_agent"),
      classifyDevice(ua).as("device"),
      platformFromEventType(col("event_type")).as("platform"),
      kFromProps(col("props")).as("k"),
      col("ts").as("last_visited"))
  }
}
