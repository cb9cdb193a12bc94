package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: does Lloyd's actually BALANCE the cells? Prints Σ|cell|²
  * (the pair-search cost driver of `semantic_dedup`/`knn_join`) for the
  * seed codebook (iters=0 ≡ first-k assignment) vs the trained one, plus
  * surviving-cell counts.
  *
  *   tools/run.sh graft.KmProbe2 /root/repo/testdata_scale/x10 8 2
  */
object KmProbe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = if (args.length > 1) args(1).toInt else 8
    val iters = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, sfDir)
    Seq(0, iters).foreach { it =>
      val sizes = graft.ext.Similarity.kmeansAssign(emb, k, it)
        .filter(col("cell").isNotNull)
        .groupBy(col("cell")).agg(count(lit(1)).as("n"))
      val row = sizes.agg(
        sum(expr("n * n")).as("ssq"),
        count(lit(1)).as("cells"),
        max(col("n")).as("max_cell")).collect()(0)
      println(s"[kmprobe2] dir=$sfDir k=$k iters=$it " +
        s"ssq=${row.getLong(0)} cells=${row.getLong(1)} max_cell=${row.getLong(2)}")
    }
    spark.stop()
  }
}
