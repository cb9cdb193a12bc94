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
  *
  * Second arg `phases` switches to the round-7 level audit: splits one
  * `pagerank_top` timed run into build / optimize / execute phases and
  * compares AQE on/off at iters=8 — the evidence behind the BENCH_SF1
  * "where the default-8 level comes from" paragraph.
  */
object PrProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_pr_ckpt")
    spark.sparkContext.setCheckpointDir(ckptDir.toString)

    if (args.length > 1 && args(1) == "phases") phaseAudit(spark, sfDir)
    else truncationCurve(spark, sfDir)

    spark.stop()
    try {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(ckptDir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    } catch { case _: Throwable => () }
  }

  private def truncationCurve(spark: SparkSession, sfDir: String): Unit = {
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
  }

  private def phaseAudit(spark: SparkSession, sfDir: String): Unit = {
    def t[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    for (rep <- 1 to 4) {
      val (tBuild, df) = t(SparkEntry.queries("pagerank_top")(spark, sfDir))
      val (tOpt, _) = t(df.queryExecution.executedPlan) // analysis+optimization
      val (tExec, n) = t(df.count()) // AQE re-plan + run
      println(f"rep $rep: build=$tBuild%.3f opt=$tOpt%.3f exec=$tExec%.3f rows=$n")
    }
    for (aqe <- Seq("true", "false", "true", "false")) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      val edges = Graph.lineitemGraph(Tables.lineitem(spark, sfDir))
      val (sec, _) = t(Graph.pageRank(edges, iters = 8).collect())
      println(f"aqe=$aqe exec=$sec%.3f")
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
