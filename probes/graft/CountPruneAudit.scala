package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}

/** Dev audit: which queries does Bench's `count()` sink UNDER-MEASURE?
  *
  * A global count eliminates any left join whose right side has unique
  * keys (count = left count), and with it everything that only feeds
  * that join — so a query shaped "enrich each row with an aggregate,
  * keep every row" times only its left branch under Bench. This audit
  * compares Join counts in the optimized logical plan of each query
  * with and without a count on top and prints every query that loses
  * joins — the definitive affected list for BENCH_SF1's measurement-
  * boundary note. Plan-only: nothing executes.
  *
  *   tools/run.sh graft.CountPruneAudit /root/testdata/sf0.01
  */
object CountPruneAudit {
  private def joins(p: LogicalPlan): Int = p.collect { case j: Join => j }.size

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_cpa_ckpt")
    spark.sparkContext.setCheckpointDir(ckptDir.toString)
    var affected = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val full = joins(df.queryExecution.optimizedPlan)
        val cnt = joins(df.groupBy().count().queryExecution.optimizedPlan)
        if (cnt < full) {
          affected += 1
          println(s"[countprune] $name: $full joins full, $cnt under count()")
        }
      } catch {
        case e: Throwable =>
          println(s"[countprune] $name: AUDIT ERROR ${e.getMessage.take(120)}")
      }
    }
    println(s"[countprune] affected=$affected of ${SparkEntry.queries.size}")
    spark.stop()
    org.apache.commons.io.FileUtils.deleteDirectory(ckptDir.toFile)
  }
}
