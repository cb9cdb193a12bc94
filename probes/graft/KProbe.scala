package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: measure semanticDedup's codebook-size knob at a given SF —
  * the Σ|cell|² ≈ n²/k bound says a 10× corpus with 10× the centroids
  * should pay ~constant per-cell work, while a FIXED codebook pays 10×
  * (documented in BENCH_SF1.md; this makes it a number, not an argument).
  *
  * Usage: tools/run.sh graft.KProbe <embDir> <k1> [k2 ...]
  */
object KProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata_scale/x10")
    val ks = if (args.length > 1) args.tail.map(_.toInt).toSeq else Seq(16, 160)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    ks.foreach { k =>
      graft.ext.Similarity.semanticDedup(emb, k = k).count() // warmup
      val t = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        graft.ext.Similarity.semanticDedup(emb, k = k).count()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[kprobe] dir=$dir k=$k%-4d sec=$t%.3f")
    }
    spark.stop()
  }
}
