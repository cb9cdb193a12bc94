package graft

import org.apache.spark.sql.SparkSession

/** Dev probe (results in BENCH_SF1.md): q21 on the scaled fact tables,
  * flat parquet vs a layout bucketed+sorted by orderkey — the round-7
  * verdict's "would the bucketed layout remove the SMJ sorts at 100×?"
  * question, answered with executed plans and medians, not argument.
  *
  * The bucketed write is a one-time layout cost a real deployment pays at
  * ingest; the probe prints it for honesty but compares QUERY time.
  *
  *   tools/run.sh graft.Q21BucketProbe /root/repo/testdata_scale/x100 32
  */
object Q21BucketProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata_scale/x100")
    val buckets = if (args.length > 1) args(1).toInt else 32
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val wh = java.nio.file.Files.createTempDirectory("graft_q21b_wh")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", wh.toString)
      // Spark ≥3.0 ignores per-bucket sort order on read by default
      // (multi-file buckets made it unsafe); the layout here is strictly
      // one file per bucket, which is exactly the case the legacy flag
      // re-enables — without it the SMJ keeps a LOCAL sort per bucket
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering",
        (!args.contains("nosortmeta")).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val supplier = Tables.supplier(spark, sfDir)

    def timed3(mk: () => org.apache.spark.sql.DataFrame): (Double, Seq[Double]) = {
      def once(): Double = {
        val t0 = System.nanoTime(); mk().count(); (System.nanoTime() - t0) / 1e9
      }
      once() // warmup
      val ts = Seq.fill(3)(once()).sorted
      (ts(1), ts)
    }
    def planShape(df: org.apache.spark.sql.DataFrame): String = {
      df.count() // executed plan reflects AQE's final shape only after a run
      val p = df.queryExecution.executedPlan.toString
      def n(tok: String) = tok.r.findAllIn(p).size
      s"exchanges=${n("Exchange ")} sorts=${n("Sort \\[")} smj=${n("SortMergeJoin")} shj=${n("ShuffledHashJoin")} bhj=${n("BroadcastHashJoin")}"
    }

    // flat parquet
    val flat = () => graft.ops.Relational.waitingSupplierFrom(
      Tables.lineitem(spark, sfDir), Tables.orders(spark, sfDir), supplier)
    val (flatMed, flatAll) = timed3(flat)
    println(f"[q21probe] flat: median=$flatMed%.2fs runs=${flatAll.map(t => f"$t%.2f").mkString(",")} ${planShape(flat())}")

    // bucketed layout: both facts bucketed+sorted by orderkey, through
    // the library recipe (one file per bucket enforced by bucketWrite)
    val t0 = System.nanoTime()
    val liFiles = graft.io.Maintenance.bucketWrite(
      spark.read.parquet(s"$sfDir/lineitem.parquet"), "l_orderkey", buckets, "lineitem_b")
    graft.io.Maintenance.bucketWrite(
      spark.read.parquet(s"$sfDir/orders.parquet"), "o_orderkey", buckets, "orders_b")
    println(f"[q21probe] bucketed write (one-time layout cost): ${(System.nanoTime() - t0) / 1e9}%.1fs")
    println(s"[q21probe] lineitem_b files: $liFiles for $buckets buckets")

    val bucketed = () => graft.ops.Relational.waitingSupplierFrom(
      spark.table("lineitem_b"), spark.table("orders_b"), supplier)
    val (bMed, bAll) = timed3(bucketed)
    println(f"[q21probe] bucketed($buckets): median=$bMed%.2fs runs=${bAll.map(t => f"$t%.2f").mkString(",")} ${planShape(bucketed())}")

    // results must agree
    val a = flat().collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val b = bucketed().collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    println(s"[q21probe] results_match=${a == b}")

    if (args.contains("explain")) {
      def dump(tag: String, df: org.apache.spark.sql.DataFrame): Unit = {
        df.count()
        println(s"===== $tag =====")
        println(df.queryExecution.executedPlan.toString)
      }
      dump("flat", flat()); dump("bucketed", bucketed())
    }
    spark.stop()
    try org.apache.commons.io.FileUtils.deleteDirectory(wh.toFile)
    catch { case _: Throwable => () }
  }
}
