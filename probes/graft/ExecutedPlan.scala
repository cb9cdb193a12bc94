package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run a declared query to completion and dump the FINAL
  * (post-AQE) executed plan — the only place runtime exchange/stage reuse
  * is visible ([[Explain]] shows the static plan, where AQE stage reuse
  * has not happened yet).
  *
  * Usage: tools/run.sh graft.ExecutedPlan [sfDir] [query ...]
  */
object ExecutedPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq else Seq("minhash_pairs")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===================== $n =====================")
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.collect() // executes THIS df's plan, driving AQE to its final form
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
