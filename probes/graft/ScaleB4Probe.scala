package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Scaling A/B for the round-17 batch-4 rewrites on their TPC-H inputs
  * (GenScale covers documents/embeddings only): the input replicates
  * ×N in-plan (explode over a replica sequence, keys offset per replica
  * so per-key cardinalities — the shapes both operators aggregate
  * over — are preserved), then OLD and NEW forms alternate in one JVM,
  * median of 3.
  *
  *   SPARK_GRAFT_CPUS=32 tools/run.sh graft.ops.ScaleB4Probe /root/testdata/sf0.1 10
  */
object ScaleB4Probe {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleB4Probe <sfDir> <replicas>")
    val sfDir = args(0)
    val n = args(1).toInt
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

    def ordersX: DataFrame = Tables.orders(spark, sfDir)
      .crossJoin(spark.range(n.toLong).toDF("_r"))
      .withColumn("o_orderkey", col("o_orderkey") + col("_r") * 100000000L)
      .drop("_r")

    def custX: DataFrame = Tables.customer(spark, sfDir)
      .crossJoin(spark.range(n.toLong).toDF("_r"))
      .withColumn("c_custkey",
        (col("c_custkey").cast("bigint") + col("_r") * 10000000L).cast("long"))
      .drop("_r")

    def cdcSnapshot: DataFrame = custX.select(
      col("c_custkey").cast("bigint").as("cust_id"),
      col("c_name").as("name"),
      col("c_nationkey").cast("bigint").as("nation"),
      col("c_mktsegment").as("segment"))
    def cdcChangelog(snap: DataFrame): DataFrame = {
      val id = col("cust_id")
      val u1 = snap.filter(id % 10 === 3)
        .select(id, col("name"), col("nation"), lit("UPDATED1").as("segment"),
          lit("U").as("op"), (id * 10 + 1).as("version"))
      val u2 = snap.filter(id % 30 === 3)
        .select(id, col("name"), col("nation"), lit("UPDATED2").as("segment"),
          lit("U").as("op"), (id * 10 + 2).as("version"))
      val del = snap.filter(id % 10 === 7)
        .select(id, col("name"), col("nation"), col("segment"),
          lit("D").as("op"), (id * 10 + 1).as("version"))
      u1.unionByName(u2).unionByName(del)
    }
    // a delta window covering ~the same FRACTION of versions as the
    // declared query's [500, 1200] does at x1
    val (v1, v2) = (500L, 1200L)

    val variants: Seq[(String, () => DataFrame, () => DataFrame)] = Seq(
      ("table_profile_x" + n,
        () => Audit.tableProfileOnePassForProbe(ordersX),
        () => Audit.tableProfile(ordersX)),
      ("cdc_version_diff_x" + n,
        () => {
          val snap = cdcSnapshot
          Cdc.snapshotDiff(
            Cdc.applyChangelogAsOf(snap, cdcChangelog(snap), "cust_id", v1),
            Cdc.applyChangelogAsOf(snap, cdcChangelog(snap), "cust_id", v2),
            "cust_id")
        },
        () => {
          val snap = cdcSnapshot
          Cdc.versionDiff(snap, cdcChangelog(snap), "cust_id", v1, v2)
        }))

    def force(df: DataFrame): Unit =
      df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
        .agg(expr("bit_xor(h)")).collect()

    variants.foreach { case (name, oldF, newF) =>
      val o = oldF().collect().map(_.toString).sorted
      val nw = newF().collect().map(_.toString).sorted
      require(o.sameElements(nw), s"$name: OLD and NEW outputs differ!")
      println(s"[scale] $name outputs identical (${o.length} rows)")
      force(oldF()); force(newF())
      val olds = collection.mutable.ArrayBuffer[Double]()
      val news = collection.mutable.ArrayBuffer[Double]()
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime(); force(oldF())
        olds += (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime(); force(newF())
        news += (System.nanoTime() - t1) / 1e9
      }
      def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
      println(f"[scale] $name OLD med=${med(olds.toSeq)}%.3f " +
        olds.map(x => f"$x%.2f").mkString("[", ",", "]") +
        f" NEW med=${med(news.toSeq)}%.3f " +
        news.map(x => f"$x%.2f").mkString("[", ",", "]"))
    }
    spark.stop()
  }
}
