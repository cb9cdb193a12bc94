package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.ext.Similarity

/** Dev probe (results recorded in BENCH_SF1.md): PQ-compressed bulk kNN
  * join vs the exact form, same fixed-16 cell structure — so the
  * candidate-pair SPACE is identical and the measured difference is
  * purely the representation: m-byte codes + compiled ADC + k·n exact
  * re-rank, vs full 64-dim vectors through the pair join. The probe
  * also records total shuffle-write bytes per run, because the PQ
  * form's claim is BYTES (what the exchange carries when vectors don't
  * fit the shuffle), not pair count — wall time at local[32] is
  * compute-bound and understates the cluster-scale difference.
  * Training is timed separately: the codebook trains once (IndexCache
  * shape) and serving runs against it.
  */
object PqKnnProbe {
  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "testdata_scale/x10")
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
        Thread.sleep(300) // let the async listener drain the prior run
        shuffleBytes.set(0L)
        val t0 = System.nanoTime()
        f
        val secs = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        (secs, shuffleBytes.get())
      }
      def med3(f: => Unit): (Double, Long) = {
        timed(f) // warmup
        val rs = Seq(timed(f), timed(f), timed(f)).sortBy(_._1)
        rs(1)
      }
      val (trainSecs, _) = timed {
        Similarity.pqCodebook(emb).count() // train once, serving reuses
      }
      val cb = graft.ext.IndexCache.pqCodebook(spark, emb, d)
      val (pqSecs, pqBytes) = med3 {
        Similarity.pqKnnJoinWith(emb, cb, kNbrs = 3, cells = 16).count()
      }
      val (exSecs, exBytes) = med3 {
        Similarity.knnJoin(emb, kNbrs = 3, k = 16).count()
      }
      val kAd = Similarity.adaptiveCodebookSize(n)
      val (adSecs, adBytes) = med3 {
        Similarity.knnJoin(emb, kNbrs = 3, k = kAd).count()
      }
      println(f"""{"dir":"$d","n":$n,"train_sec":$trainSecs%.3f,""" +
        f""""pq_knn_sec":$pqSecs%.3f,"pq_knn_shuffle_mb":${pqBytes / 1e6}%.1f,""" +
        f""""exact16_sec":$exSecs%.3f,"exact16_shuffle_mb":${exBytes / 1e6}%.1f,""" +
        f""""adaptive_k":$kAd,"adaptive_sec":$adSecs%.3f,"adaptive_shuffle_mb":${adBytes / 1e6}%.1f}""")
    }
    spark.stop()
  }
}
