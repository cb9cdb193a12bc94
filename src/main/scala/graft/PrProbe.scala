package graft

import org.apache.spark.sql.SparkSession

import graft.ext.{Dedup, Graph}

/** Dev probe (results recorded in BENCH_SF1.md): PageRank per-iteration
  * cost as the iteration count grows, with and without lineage
  * truncation.
  *
  * What it demonstrates: exchange reuse already keeps EXECUTION at O(1)
  * edge scans (PlanSpec), but the unrolled plan's driver-side
  * analysis/optimization cost grows with iters — the round-5 verdict's
  * "iters≈50 planning bottleneck". With `checkpointEvery = 10` the
  * lineage is cut every 10 iterations, so sec/iter must stay ~flat from
  * iters=8 to iters=64, while the untruncated run's sec/iter climbs.
  */
object PrProbe {
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
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_pr_ckpt")
    spark.sparkContext.setCheckpointDir(ckptDir.toString)

    val edges = Graph.lineitemGraph(Tables.lineitem(spark, sfDir))

    def run(iters: Int, every: Int): Double = {
      val t0 = System.nanoTime()
      val r = Graph.pageRank(edges, iters = iters, checkpointEvery = every)
      // sum(rank), not count(): a count prunes the rank arithmetic out of
      // the unrolled plan entirely (the EdgeCorpus vacuous-count effect),
      // which would bill the checkpointed mode for materialization work
      // the unrolled mode silently skipped
      r.agg(org.apache.spark.sql.functions.sum("rank")).head()
      val secs = (System.nanoTime() - t0) / 1e9
      Dedup.release(r)
      spark.catalog.clearCache()
      secs
    }

    run(8, 10) // warmup (JVM/codegen/parquet footers)
    val rows = for {
      iters <- Seq(8, 16, 32, 64)
      truncated <- Seq(true, false)
    } yield {
      val every = if (truncated) 10 else Int.MaxValue
      val secs = math.min(run(iters, every), run(iters, every))
      val label = if (truncated) "ckpt10" else "unrolled"
      println(f"""{"iters":$iters,"mode":"$label","sec":$secs%.3f,"sec_per_iter":${secs / iters}%.4f}""")
      (iters, label, secs)
    }
    println(rows.map { case (i, m, s) => f"$i/$m=$s%.2fs" }.mkString("summary: ", ", ", ""))
    spark.stop()
    try {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(ckptDir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    } catch { case _: Throwable => () }
  }
}
