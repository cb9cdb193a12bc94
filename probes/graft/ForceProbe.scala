package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{expr, struct, xxhash64}

/** Dev probe: time queries with EVERY output column forced.
  *
  * `Bench` times `df.count()`, which is the right cheap sink for
  * aggregates/joins (their work happens below the count) but lets
  * Catalyst prune the final projections of PURE-PROJECTION queries
  * (enrich, pii_scrub, classifier_score, media_*): their bench rows
  * time the scan, not the expressions. This probe instead reduces
  * `xxhash64(struct(<all columns>))` to one sum — every expression is
  * computed, nothing is collected. Use it when measuring a projection
  * operator's actual compute cost or scaling curve; `Bench` keeps
  * `count()` so its totals stay comparable across rounds.
  *
  *   tools/run.sh graft.ForceProbe /root/testdata/sf0.1 pii_scrub classifier_score
  */
object ForceProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ForceProbe <sfDir> <query>...")
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    // scale experiments: decouple the exchange width from the core count
    // (a 100x corpus on 32 partitions concentrates per-partition hash
    // state; AQE coalesces an over-provisioned width back down for free)
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_forceprobe_ckpt")
    spark.sparkContext.setCheckpointDir(ckptDir.toString)
    names.foreach { n =>
      def once(): Double = {
        // the clock covers CONSTRUCTION too, matching Bench.timed:
        // iterative operators (connectedComponents, pageRank past the
        // truncation point) execute real cluster rounds eagerly while the
        // frame is being built — a post-construction clock silently
        // excludes them (observed: fuzzy_dedup_survivors "0.6 s" at x100
        // when the contraction rounds actually dominate)
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(n)(spark, sfDir)
        // bit_xor: order-independent reduction with no ANSI overflow
        df.select(xxhash64(struct(df.columns.map(org.apache.spark.sql.functions.col): _*)).as("h"))
          .agg(expr("bit_xor(h)")).collect()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warmup
      val ts = Seq.fill(3)(once()).sorted
      println(f"[forceprobe] $n sec=${ts(1)}%.3f (min=${ts.head}%.3f max=${ts.last}%.3f) dir=$sfDir")
    }
    spark.stop()
    org.apache.commons.io.FileUtils.deleteDirectory(ckptDir.toFile)
  }
}
