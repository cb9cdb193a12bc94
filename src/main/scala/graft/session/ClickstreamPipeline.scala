package graft.session

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Enrich

/** The WHOLE reference consumer pipeline
  * (StructuredStreaming.scala:79-279) as one composed batch query:
  * enrichment (platform/device/JSON), sessionization (30-min gap),
  * change detection, purchase carry-forward, and new-vs-returning — the
  * same record the reference assembles through a Redis join plus ~30
  * stacked projections, produced here by one window pass over the user
  * key plus one projection.
  *
  * Every constituent is itself oracle-checked (`enrich`, `sess_assign`,
  * `change_detect`, `carry_forward`); this composition is checked as
  * `pipeline_full` — the engine's "switch over from the reference and run
  * your whole query in one call" surface.
  */
object ClickstreamPipeline {

  def run(events: DataFrame): DataFrame = {
    val sessioned = Sessionize.withSessionIds(events)
    val withState = StateOps.carryForwardLastPurchase(
      StateOps.changeDetect(sessioned, "event_type"))
    val ua = Enrich.syntheticUserAgent(col("user_id"))
    withState.select(
      col("event_id"), col("user_id"), col("ts"),
      col("event_type"), col("value"),
      Enrich.classifyDevice(ua).as("device"),
      Enrich.platformFromEventType(col("event_type")).as("platform"),
      Enrich.kFromProps(col("props")).as("k"),
      col("session_id"), col("session_start"),
      col("event_type_changed"),
      col("last_purchase_value"))
  }
}
