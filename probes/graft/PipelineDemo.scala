package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.io.{Sinks, Sources}
import graft.streaming.StreamingSessionizer

/** End-to-end streaming demo: replay the events table as a JSON-lines file
  * stream (the reference's producer replay, App.scala:29-49, without the
  * broker hop), run the stateful sessionizer with watermark + event-time
  * state eviction, fan out to history/state parquet sinks, and print the
  * resulting layout.
  *
  * Usage: tools/run.sh graft.PipelineDemo [sfDir] [outDir]
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.drop(1).headOption
      .getOrElse(java.nio.file.Files.createTempDirectory("graft_demo").toString)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    // producer replay: table -> JSON-lines (what the reference pushes to Kafka)
    val replayDir = s"$outDir/replay"
    Tables.events(spark, sfDir)
      .select(to_json(struct(col("*"))).as("value"))
      .write.mode("overwrite").text(replayDir)

    val events = Sources.fileEvents(spark, replayDir)
      .withWatermark("ts", "30 minutes")
      .as[graft.model.Event]
    val sessionized = StreamingSessionizer.sessionize(
      events, eventTimeTimeout = true)
    val q = Sinks.historyAndState(sessionized, s"$outDir/out", s"$outDir/ckpt")
    q.awaitTermination()

    val history = spark.read.parquet(s"$outDir/out/history")
    println(s"history rows: ${history.count()}")
    println(s"sessions: ${history.select("session_id").distinct().count()}")
    history.orderBy("user_id", "ts").show(10, truncate = false)
    spark.stop()
  }
}
