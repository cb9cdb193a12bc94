package graft

import org.apache.spark.sql.SparkSession

import graft.ext.Dedup

/** Dev probe: connectedComponents wall time + round count at a given SF,
  * with the reliable-checkpoint path on and off — separates algorithmic
  * cost from checkpoint I/O when tuning the star-contraction loop.
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_cc_ckpt")

    val pairs = Dedup.minhashCandidatePairs(Tables.documents(spark, sfDir))
      .select("a_id", "b_id")

    def run(): (Double, Int) = {
      val t0 = System.nanoTime()
      val cc = Dedup.connectedComponents(pairs)
      cc.count()
      val secs = (System.nanoTime() - t0) / 1e9
      Dedup.release(cc)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      (secs, Dedup.lastCcRounds)
    }

    run() // warmup
    val (tLocal, rLocal) = run()
    spark.sparkContext.setCheckpointDir(ckptDir.toString)
    val (tRel, rRel) = run()
    println(f"""{"sf":"$sfDir","local_sec":$tLocal%.3f,"local_rounds":$rLocal,"reliable_sec":$tRel%.3f,"reliable_rounds":$rRel}""")
    spark.stop()
    try {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(ckptDir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    } catch { case _: Throwable => () }
  }
}
