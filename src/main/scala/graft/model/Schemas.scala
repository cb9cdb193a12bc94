package graft.model

import org.apache.spark.sql.types._

/** Explicit schemas for the engine.
  *
  * The reference infers its clickstream schema at startup from a JSON sample
  * (reference: MoneySmart/msConsumerApis/.../StructuredStreaming.scala:71-76,
  * with a comment calling it "brute force"). The new engine declares schemas
  * explicitly — runtime inference stays available only as a dev helper.
  */
object Schemas {

  /** Driver test table `events.parquet` (the clickstream stand-in). */
  val event: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("props", StringType, nullable = true)
  ))

  /** Clickstream event as consumed by the reference pipeline
    * (StructuredStreaming.scala:90-93; typed per the Cassandra DDL
    * README.md:35-52 but with real types instead of all-TEXT).
    */
  val clickstream: StructType = StructType(Seq(
    StructField("user_id", StringType, nullable = true),
    StructField("message_date", TimestampType, nullable = true),
    StructField("user_agent", StringType, nullable = true),
    StructField("partner_id", StringType, nullable = true),
    StructField("partner_name", StringType, nullable = true),
    StructField("init_session", BooleanType, nullable = true),
    StructField("session_id", StringType, nullable = true),
    StructField("page_type", StringType, nullable = true),
    StructField("category", StringType, nullable = true),
    StructField("cart_amount", DecimalType(18, 2), nullable = true),
    StructField("platform", StringType, nullable = true)
  ))

  /** Per-user state — reference keeps this as a 13-field all-string Redis
    * hash (StructuredStreaming.scala:123-139). Here it is a typed state
    * carried by Spark's own state store (see graft.streaming).
    */
  val userState: StructType = StructType(Seq(
    StructField("u_id", StringType, nullable = true),
    StructField("tstamp", TimestampType, nullable = true),
    StructField("msg_date", TimestampType, nullable = true),
    StructField("usr_agent", StringType, nullable = true),
    StructField("prtnr_id", StringType, nullable = true),
    StructField("prtnr_name", StringType, nullable = true),
    StructField("sess_id", StringType, nullable = true),
    StructField("pg_type", StringType, nullable = true),
    StructField("ctgry", StringType, nullable = true),
    StructField("cart_amt", DecimalType(18, 2), nullable = true),
    StructField("pltfrm", StringType, nullable = true),
    StructField("last_visit", TimestampType, nullable = true),
    StructField("user_device", StringType, nullable = true)
  ))
}

/** Typed event row for Dataset-based (stateful streaming) operators. */
case class Event(
    event_id: Long,
    ts: java.sql.Timestamp,
    user_id: Long,
    event_type: String,
    value: Double,
    props: String)

/** Per-user session state carried in Spark's state store — replaces the
  * reference's external Redis hash (RedisForeachWriter.scala:37 key scheme
  * "<topic>:<user_id>"; StructuredStreaming.scala:123-139 field set).
  */
case class SessionState(
    userId: Long,
    sessionSeq: Long,
    lastTs: Long, // epoch micros of last event seen
    lastEventType: String,
    lastPurchaseValue: Option[Double],
    eventsInSession: Long)
