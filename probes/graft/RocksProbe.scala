package graft

import org.apache.spark.sql.SparkSession
import graft.streaming.StreamingSessionizer
import graft.model.Event

/** Dev probe: the RocksDB-provider SCALE test for the streaming
  * sessionizer (r15 verdict task 7). The transformWithState path is
  * correctness-proven at toy size (timers survive restart, V1→V2 state
  * evolution); this measures it past heap comfort: N distinct keys open
  * N `ValueState` entries + N event-time timers in one micro-batch on
  * the RocksDB state store, then one sentinel event advances the
  * watermark past every deadline so ALL N timers fire and evict in the
  * follow-up batch. Reports:
  *   - open rate (keys/s): batch-1 wall, state + timer registration
  *   - close rate (keys/s): sentinel + timer-drain wall, fire + emit +
  *     evict
  *   - state telemetry from StreamingQueryProgress.stateOperators
  *     (numRowsTotal before/after eviction, provider memory/SST bytes)
  *   - checkpoint directory size on disk
  *
  *   tools/run.sh graft.RocksProbe [nKeys] [runs]
  */
object RocksProbe {
  def main(args: Array[String]): Unit = {
    val nKeys = args.headOption.map(_.toInt).getOrElse(1000000)
    val runs = if (args.length > 1) args(1).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    (1 to runs).foreach { run =>
      implicit val sqlCtx = spark.sqlContext
      val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event]
      val ckpt = java.nio.file.Files.createTempDirectory("rocksprobe_ckpt")
      val q = StreamingSessionizer.sessionizeTwsClosed(ms.toDS())
        .writeStream.format("noop")
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append").start()
      try {
        val t0us = 1704067200000000L // 2024-01-01 00:00:00 UTC
        def tsAt(us: Long) = new java.sql.Timestamp(us / 1000L)
        // N distinct users, one event each: N states + N timers open.
        // Events built lazily partition-side would be better still, but
        // MemoryStream is driver-fed by design; ~N small case objects.
        val batch1 = (0 until nKeys).map { i =>
          Event(i.toLong, tsAt(t0us), i.toLong, "view", 1.0, "{}")
        }
        val t1 = System.nanoTime()
        ms.addData(batch1)
        q.processAllAvailable()
        val openSec = (System.nanoTime() - t1) / 1e9
        val afterOpen = q.lastProgress
        val rowsAfterOpen =
          afterOpen.stateOperators.map(_.numRowsTotal).sum
        val memAfterOpen = afterOpen.stateOperators
          .flatMap(_.customMetrics.asInstanceOf[java.util.Map[String, java.lang.Long]]
            .entrySet().toArray.map(_.asInstanceOf[java.util.Map.Entry[String, java.lang.Long]]))
          .filter(e => e.getKey == "rocksdbTotalMemoryUsageBytes" ||
            e.getKey == "rocksdbSstFileSize")
          .map(e => e.getKey -> e.getValue.longValue()).toMap
        def duBytes(p: java.nio.file.Path): Long = {
          val s = java.nio.file.Files.walk(p)
          try s.filter(java.nio.file.Files.isRegularFile(_))
            .mapToLong(java.nio.file.Files.size(_)).sum()
          finally s.close()
        }
        val ckptBytes = duBytes(ckpt)
        // sentinel far past every deadline: all N timers fire + evict in
        // the drained no-data batch
        val t2 = System.nanoTime()
        ms.addData(Seq(Event(-1L, tsAt(t0us + 7200L * 1000000L), -1L, "view", 1.0, "{}")))
        q.processAllAvailable()
        val closeSec = (System.nanoTime() - t2) / 1e9
        val emitted = q.recentProgress.map(_.sink.numOutputRows).filter(_ > 0).sum
        val rowsAfterClose = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
        println(f"[rocksprobe] run=$run keys=$nKeys " +
          f"open_sec=$openSec%.2f open_keys_per_sec=${nKeys / openSec}%.0f " +
          f"close_sec=$closeSec%.2f close_keys_per_sec=${nKeys / closeSec}%.0f " +
          f"state_rows_open=$rowsAfterOpen state_rows_after_evict=$rowsAfterClose " +
          f"closed_emitted=$emitted ckpt_bytes=$ckptBytes rocksdb=$memAfterOpen")
      } finally {
        q.stop()
        org.apache.commons.io.FileUtils.deleteDirectory(ckpt.toFile)
      }
    }
    spark.stop()
  }
}
