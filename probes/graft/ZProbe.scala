package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (results in BENCH_SF1.md): does the z-order layout
  * actually buy scan-time pruning at scale, or only pretty footers?
  *
  * Mechanism under test: Spark prunes parquet at ROW-GROUP granularity
  * from each group's min/max stats once a predicate is pushed
  * (`PushedFilters` in the plan). A clustered layout makes those stats
  * tight; with ~file-sized row groups, row-group pruning ≈ file pruning.
  * The probe writes the same fact rows three ways — unordered, 1-D
  * range-sorted by x, z-ordered by (x, y) — and times a 2-D box query
  * (central 1/4 × 1/4 of each key range) plus a 1-D x-only query over
  * each layout, median of 3 after warmup.
  *
  * Expected shape: 1-D sort wins the x-only query and does nothing for
  * the y dimension of the box; z-order is close on x-only and wins the
  * box outright; unordered loses both.
  *
  *   SPARK_GRAFT_CPUS=32 tools/run.sh graft.ZProbe /root/testdata/sf0.1 10 64
  */
object ZProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rep = if (args.length > 1) args(1).toInt else 10
    val files = if (args.length > 2) args(2).toInt else 64
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
    val dir = java.nio.file.Files.createTempDirectory("graft_zprobe").toString

    // rep content-disjoint replicas, orderkey-shifted so the x range
    // really grows (a plain union would just densify the same range)
    val base = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
    val maxOk = base.agg(max("l_orderkey")).collect()(0).getLong(0) + 1L
    val fact = (0 until rep).map { r =>
      base.select((col("l_orderkey") + lit(r * maxOk)).as("l_orderkey"),
        col("l_linenumber"), col("l_partkey"), col("l_quantity"))
    }.reduce(_ union _)
    val rows = fact.count()

    def timedWrite(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; val t = (System.nanoTime() - t0) / 1e9
      println(f"[zprobe] layout $label: write ${t}%.2fs"); t
    }
    timedWrite("unordered") {
      fact.repartition(files).write.mode("overwrite").parquet(s"$dir/u")
    }
    timedWrite("sorted-x") {
      fact.repartitionByRange(files, col("l_orderkey"))
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite").parquet(s"$dir/s")
    }
    timedWrite("zorder") {
      graft.io.Maintenance.zOrderWrite(
        fact, "l_orderkey", "l_partkey", s"$dir/z", files, bits = 10)
      ()
    }

    val Array(g) = fact.agg(
      min("l_orderkey"), max("l_orderkey"), min("l_partkey"), max("l_partkey")).collect()
    val (xLo, xHi, yLo, yHi) = (g.getLong(0), g.getLong(1), g.getLong(2), g.getLong(3))
    val (qxLo, qxHi) = (xLo + (xHi - xLo) * 3 / 8, xLo + (xHi - xLo) * 5 / 8)
    val (qyLo, qyHi) = (yLo + (yHi - yLo) * 3 / 8, yLo + (yHi - yLo) * 5 / 8)

    def boxQ(path: String): DataFrame =
      spark.read.parquet(path)
        .where(col("l_orderkey").between(qxLo, qxHi) &&
          col("l_partkey").between(qyLo, qyHi))
        .agg(sum("l_quantity"))
    def xQ(path: String): DataFrame =
      spark.read.parquet(path)
        .where(col("l_orderkey").between(qxLo, qxHi))
        .agg(sum("l_quantity"))

    def timed3(mk: () => DataFrame): (Double, Seq[Double]) = {
      def once(): Double = {
        val t0 = System.nanoTime(); mk().collect(); (System.nanoTime() - t0) / 1e9
      }
      once()
      val ts = Seq.fill(3)(once()).sorted
      (ts(1), ts)
    }
    println(s"[zprobe] rows=$rows files=$files box=x[$qxLo,$qxHi] y[$qyLo,$qyHi]")
    for ((label, path) <- Seq("unordered" -> "u", "sorted-x" -> "s", "zorder" -> "z")) {
      val (bm, ball) = timed3(() => boxQ(s"$dir/$path"))
      val (xm, xall) = timed3(() => xQ(s"$dir/$path"))
      // rows the scan MATERIALIZED (post row-group min/max pruning) —
      // the direct skip observable; skip ratio = 1 - read/rows
      val bRead = ScanMetrics.scanOutputRows(boxQ(s"$dir/$path"))
      val xRead = ScanMetrics.scanOutputRows(xQ(s"$dir/$path"))
      println(f"[zprobe] $label%-9s box median=$bm%.3fs runs=${ball.map(t => f"$t%.3f").mkString(",")}" +
        f"  x-only median=$xm%.3fs runs=${xall.map(t => f"$t%.3f").mkString(",")}" +
        f"  box_rows_read=$bRead (skip=${100.0 * (1 - bRead.toDouble / rows)}%.1f%%)" +
        f"  x_rows_read=$xRead (skip=${100.0 * (1 - xRead.toDouble / rows)}%.1f%%)")
    }
    // cross-check: identical answers on every layout
    val answers = Seq("u", "s", "z").map(p => boxQ(s"$dir/$p").collect()(0).get(0))
    require(answers.distinct.size == 1, s"layouts disagree: $answers")
    println(s"[zprobe] box answer identical across layouts: ${answers.head}")
    spark.stop()
  }
}
