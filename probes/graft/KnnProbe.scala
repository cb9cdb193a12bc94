package graft

import org.apache.spark.sql.SparkSession

import graft.ext.Similarity

/** Dev probe (results recorded in BENCH_SF1.md): bulk kNN join scaling
  * under the two codebook regimes. The declared `knn_join` query pins
  * k = 16 (the oracle's fixed first-16-vectors codebook), which is the
  * deliberately-quadratic Σ|cell|² ≈ n²/16 regime at growing n; the
  * library default is the adaptive k ≈ √n, whose pair work grows as
  * n^1.5. This probe measures both on the same scaled corpora so the
  * curve difference is a number, not an argument.
  */
object KnnProbe {
  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "testdata_scale/x3",
        "testdata_scale/x10", "testdata_scale/x30")
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

    dirs.foreach { d =>
      val emb = Tables.embeddings(spark, d)
      val n = emb.count()
      def timed(k: Int): Double = {
        val t0 = System.nanoTime()
        Similarity.knnJoin(emb, kNbrs = 3, k = k).count()
        (System.nanoTime() - t0) / 1e9
      }
      timed(16) // warmup
      val fixed = Seq(timed(16), timed(16), timed(16)).sorted.apply(1)
      val kAdaptive = Similarity.adaptiveCodebookSize(n)
      val adaptive = Seq(timed(kAdaptive), timed(kAdaptive), timed(kAdaptive)).sorted.apply(1)
      println(f"""{"dir":"$d","n":$n,"fixed16_sec":$fixed%.3f,"adaptive_k":$kAdaptive,"adaptive_sec":$adaptive%.3f}""")
    }
    spark.stop()
  }
}
