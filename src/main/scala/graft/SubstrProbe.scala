package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{expr, struct, xxhash64}

import graft.ext.TextOps

/** Dev probe (results recorded in BENCH_SF1.md): the alignment-free
  * substring-dedup pair at scale — [[graft.ext.TextOps.dupSpans]] (span
  * telemetry) and [[graft.ext.TextOps.substringDedup]] (rewrite) over
  * the documents table at 1×/10×/100×, with shuffle-write bytes. The
  * scale claim: the rolling-window hash count is map-side combined (the
  * duplicate cluster collapses per task), so time should track the
  * corpus linearly and shuffle bytes should track ids+hashes for the
  * span half, plus the surviving corpus for the rewrite half.
  */
object SubstrProbe {
  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
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
      val docs = Tables.documents(spark, d)
      val n = docs.count()
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
      // force FULL materialization (the ForceProbe idiom): a bare
      // count() lets Catalyst eliminate the rewrite's left join (unique
      // right keys) and prune every computed column — 0.2 s / 0 MB at
      // x100, measuring nothing
      def force(df: DataFrame): Unit =
        df.select(xxhash64(struct(df.columns.map(org.apache.spark.sql.functions.col): _*)).as("h"))
          .agg(expr("bit_xor(h)")).collect()
      val (spanSecs, spanBytes) = med3 { force(TextOps.dupSpans(docs)) }
      val nSpans = TextOps.dupSpans(docs).count()
      val (rwSecs, rwBytes) = med3 { force(TextOps.substringDedup(docs)) }
      println(f"""{"dir":"$d","n_docs":$n,"n_spans":$nSpans,""" +
        f""""dup_spans_sec":$spanSecs%.3f,"dup_spans_shuffle_mb":${spanBytes / 1e6}%.1f,""" +
        f""""substring_dedup_sec":$rwSecs%.3f,"substring_dedup_shuffle_mb":${rwBytes / 1e6}%.1f}""")
    }
    spark.stop()
  }
}
