package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.ext.Similarity

/** Dev probe (results recorded in BENCH_SF1.md): the asymmetric ADC
  * serving path at scale — [[graft.ext.Similarity.pqAdcTopKJoin]] in its
  * two regimes:
  *   (a) bulk: every corpus vector as a query (the pq_adc_knn gate
  *       shape) — comparable to the SDC bulk graph `pqKnnJoin`;
  *   (b) serving slice: a vec_id % 25 query subset against the full
  *       packed store — the production request-batch shape.
  * Shuffle-write bytes recorded per run: the ADC claim is that the
  * corpus side of the pair join carries m-byte packed codes (the query
  * side additionally carries its m·k-long LUT — 512 B at 8×8, amortized
  * over its whole candidate list).
  */
object AdcServeProbe {
  def main(args: Array[String]): Unit = {
    // --slice-only: skip the two BULK regimes (Σ|cell|² pair spaces —
    // the pq_knn curve already stops at 10× for those) and measure just
    // the serving slice, the regime that stays cheap at any store size
    val sliceOnly = args.contains("--slice-only")
    // --cells=N: the coarse-cell count (default 16, the gate regime).
    // Cells are id-seeded, not trained, so raising it costs nothing at
    // index build — it divides the per-query candidate list, the knob
    // that keeps the serving slice flat as the store grows.
    val cells = args.collectFirst { case a if a.startsWith("--cells=") =>
      a.stripPrefix("--cells=").toInt }.getOrElse(16)
    val dirArgs = args.filterNot(a => a == "--slice-only" || a.startsWith("--cells=")).toSeq
    val dirs =
      if (dirArgs.nonEmpty) dirArgs
      else Seq("/root/testdata/sf0.1", "testdata_scale/x10", "testdata_scale/x100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(
          sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    dirs.foreach { d =>
      val emb = Tables.embeddings(spark, d)
      val n = emb.count()
      def timed(f: => Unit): (Double, Long) = {
        Thread.sleep(300)
        shuffleBytes.set(0L)
        val t0 = System.nanoTime()
        f
        val secs = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        (secs, shuffleBytes.get())
      }
      def med3(f: => Unit): (Double, Long) = {
        timed(f)
        val rs = Seq(timed(f), timed(f), timed(f)).sortBy(_._1)
        rs(1)
      }
      val cb = graft.ext.IndexCache.pqCodebook(spark, emb, d)
      val slice = emb.filter(col("vec_id") % 25 === 0)
      // the serving regime builds the PqIndex ONCE (persisted — the
      // production parquet-store shape) and pays only per-batch cost in
      // the timed section; build cost is reported separately
      val idx0 = Similarity.pqServingIndex(emb, cb, cells = cells)
      val centsP = idx0.cents.persist()
      val storeP = idx0.store.persist()
      val (buildSecs, buildBytes) = timed { centsP.count(); storeP.count() }
      val idx = Similarity.PqIndex(centsP, storeP)
      val (srvSecs, srvBytes) = med3 {
        Similarity.pqAdcTopKJoinOn(slice, idx, cb, kNbrs = 3).count()
      }
      centsP.unpersist()
      storeP.unpersist()
      if (sliceOnly) {
        println(f"""{"dir":"$d","n":$n,"cells":$cells,""" +
          f""""adc_build_sec":$buildSecs%.3f,"adc_build_shuffle_mb":${buildBytes / 1e6}%.1f,""" +
          f""""adc_slice_sec":$srvSecs%.3f,"adc_slice_shuffle_mb":${srvBytes / 1e6}%.1f}""")
      } else {
        val (bulkSecs, bulkBytes) = med3 {
          Similarity.pqAdcTopKJoin(emb, emb, cb, kNbrs = 3, cells = cells).count()
        }
        val (sdcSecs, sdcBytes) = med3 {
          Similarity.pqKnnJoinWith(emb, cb, kNbrs = 3, cells = cells).count()
        }
        println(f"""{"dir":"$d","n":$n,""" +
          f""""adc_bulk_sec":$bulkSecs%.3f,"adc_bulk_shuffle_mb":${bulkBytes / 1e6}%.1f,""" +
          f""""adc_slice_sec":$srvSecs%.3f,"adc_slice_shuffle_mb":${srvBytes / 1e6}%.1f,""" +
          f""""sdc_bulk_sec":$sdcSecs%.3f,"sdc_bulk_shuffle_mb":${sdcBytes / 1e6}%.1f}""")
      }
    }
    spark.stop()
  }
}
