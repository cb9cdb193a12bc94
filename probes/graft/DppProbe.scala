package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: phase attribution for dpp_prune (round 16) — is the cost
  * the dim aggregate, the hive-partitioned write, the pruned read-back
  * join, or the scratch delete?
  *
  *   tools/run.sh graft.DppProbe /root/testdata/sf0.1
  */
object DppProbe {
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
    spark.sparkContext.setLogLevel("ERROR")

    def o = Tables.orders(spark, sfDir)
      .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
      .select(col("o_orderkey"), col("o_totalprice"), col("o_month"))
    def dim = o.groupBy(col("o_month")).agg(count(lit(1)).as("mcnt"))
      .where(col("mcnt") % 3 === 0).select(col("o_month"))

    def timed(label: String)(f: => Unit): Unit = {
      f // warmup
      val ts = Seq.fill(3) {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[dppprobe] $label sec=${ts(1)}%.3f (min=${ts.head}%.3f max=${ts.last}%.3f)")
    }

    val fs = new org.apache.hadoop.fs.Path("/tmp").getFileSystem(
      spark.sparkContext.hadoopConfiguration)

    timed("dim_agg_only") { dim.write.format("noop").mode("overwrite").save() }
    timed("write_only") {
      val tmp = java.nio.file.Files.createTempDirectory("dppprobe").toString
      try o.write.mode("overwrite").partitionBy("o_month").parquet(tmp)
      finally { fs.delete(new org.apache.hadoop.fs.Path(tmp), true); () }
    }
    timed("write_repart") {
      val tmp = java.nio.file.Files.createTempDirectory("dppprobe").toString
      try o.repartition(col("o_month")).write.mode("overwrite")
        .partitionBy("o_month").parquet(tmp)
      finally { fs.delete(new org.apache.hadoop.fs.Path(tmp), true); () }
    }
    timed("full_roundtrip") {
      graft.io.Maintenance.dppRoundtrip(o, dim, "o_month", Seq(
        count(lit(1)).as("n_rows"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price")))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
