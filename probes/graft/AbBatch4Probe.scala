package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** In-session A/B probe for the round-17 batch-4 rewrites (one JVM,
  * alternating old/new, median of 5 — the AbBatch3Probe pattern).
  *
  *   tools/run.sh graft.ops.AbBatch4Probe /root/testdata/sf0.1
  *
  * OLD forms: tableProfile's one-pass multi-COUNT(DISTINCT) exact arm
  * (still in-tree as the approx arm's shared body, `tableProfileOnePass`
  * with exactDistinct = true) and versionDiff's twin form
  * (snapshotDiff over two applyChangelogAsOf states — the public
  * functions the rewrite is pinned against). Output equality is
  * asserted in-probe before timing.
  */
object AbBatch4Probe {

  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: AbBatch4Probe <sfDir>")
    val sfDir = args(0)
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

    // SparkEntry's cdc fixture, replicated (private there)
    def cdcSnapshot: DataFrame = Tables.customer(spark, sfDir).select(
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
      val revive = snap.filter(id % 20 === 17)
        .select(id, col("name"), col("nation"), lit("REVIVED").as("segment"),
          lit("U").as("op"), (id * 10 + 5).as("version"))
      val ins = snap.filter(id % 10 === 1)
        .select((id + 10000000L).as("cust_id"), lit("new_customer").as("name"),
          (id % 25).as("nation"), lit("NEW").as("segment"),
          lit("I").as("op"), lit(1L).as("version"))
      u1.unionByName(u2).unionByName(del).unionByName(revive).unionByName(ins)
    }

    // pre-change paretoFront (driver head() for the x-range)
    def oldPareto(df: DataFrame, xCol: String, yCol: String, buckets: Int = 64): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.{Column, Row}
      val pts = df.where(col(xCol).isNotNull && col(yCol).isNotNull)
      val perX = pts.groupBy(col(xCol).as("_x")).agg(max(col(yCol)).as("_mx"))
      val Row(minX, maxX) = perX.agg(min(col("_x")).cast("double"), max(col("_x")).cast("double")).head()
      val bucketExpr: Column =
        if (minX == null || minX == maxX) lit(0)
        else least(floor((col("_x").cast("double") - lit(minX)) /
          lit(maxX.asInstanceOf[Double] - minX.asInstanceOf[Double]) * lit(buckets)), lit(buckets - 1)).cast("int")
      val bucketed = perX.withColumn("_bk", bucketExpr)
      val wLocal = Window.partitionBy(col("_bk")).orderBy(col("_x").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val local = bucketed
        .withColumn("_smax", max(col("_mx")).over(wLocal))
        .where(col("_smax").isNull || col("_mx") > col("_smax"))
      val wBuckets = Window.orderBy(col("_bk").desc).rowsBetween(Window.unboundedPreceding, -1)
      val higherMax = bucketed.groupBy(col("_bk")).agg(max(col("_mx")).as("_bmx"))
        .withColumn("_hmax", max(col("_bmx")).over(wBuckets))
        .select(col("_bk"), col("_hmax"))
      val sky = local.join(higherMax, Seq("_bk"))
        .where(col("_hmax").isNull || col("_mx") > col("_hmax"))
        .select(col("_x"), col("_mx"))
      pts.join(sky, pts(xCol) === sky("_x") && pts(yCol) === sky("_mx"))
        .select(pts.columns.map(pts(_)): _*)
    }
    def paretoIn: DataFrame = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate"))

    // pre-change classifierScore (md5 inside the interpreted fold)
    def oldClassifierScore(documents: DataFrame, dim: Int = 1024): DataFrame = {
      val md5x = "cast(conv(substring(md5(x), 1, 15), 16, 10) as bigint)"
      val w = s"(($md5x % $dim) * 2654435761L) % 2001L - 1000L"
      documents
        .selectExpr("doc_id", "filter(split(text, ' '), x -> x != '') as toks")
        .selectExpr("doc_id", "size(toks) as n_tokens",
          s"aggregate(toks, 0L, (a, x) -> a + ($w)) as score_milli")
        .selectExpr("doc_id", "n_tokens", "score_milli",
          "cast(score_milli >= 0 as int) as keep")
    }

    val variants: Seq[(String, () => DataFrame, () => DataFrame)] = Seq(
      ("classifier_score",
        () => oldClassifierScore(Tables.documents(spark, sfDir)),
        () => graft.ext.TextOps.classifierScore(Tables.documents(spark, sfDir))),
      ("pareto_front",
        () => oldPareto(paretoIn, "o_totalprice", "o_orderdate"),
        () => Mining.paretoFront(paretoIn, "o_totalprice", "o_orderdate")),
      ("table_profile",
        () => Audit.tableProfileOnePassForProbe(Tables.orders(spark, sfDir)),
        () => Audit.tableProfile(Tables.orders(spark, sfDir))),
      ("cdc_version_diff",
        () => {
          val snap = cdcSnapshot
          Cdc.snapshotDiff(
            Cdc.applyChangelogAsOf(snap, cdcChangelog(snap), "cust_id", 500L),
            Cdc.applyChangelogAsOf(snap, cdcChangelog(snap), "cust_id", 1200L),
            "cust_id")
        },
        () => {
          val snap = cdcSnapshot
          Cdc.versionDiff(snap, cdcChangelog(snap), "cust_id", 500L, 1200L)
        }))

    def force(df: DataFrame): Unit =
      df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
        .agg(expr("bit_xor(h)")).collect()

    variants.foreach { case (name, oldF, newF) =>
      val o = oldF().collect().map(_.toString).sorted
      val n = newF().collect().map(_.toString).sorted
      require(o.sameElements(n), s"$name: OLD and NEW outputs differ!")
      println(s"[ab] $name outputs identical (${o.length} rows)")
      force(oldF()); force(newF())
      val olds = collection.mutable.ArrayBuffer[Double]()
      val news = collection.mutable.ArrayBuffer[Double]()
      (1 to 5).foreach { _ =>
        val t0 = System.nanoTime(); force(oldF())
        olds += (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime(); force(newF())
        news += (System.nanoTime() - t1) / 1e9
      }
      def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
      println(f"[ab] $name OLD med=${med(olds.toSeq)}%.3f " +
        olds.map(x => f"$x%.2f").mkString("[", ",", "]") +
        f" NEW med=${med(news.toSeq)}%.3f " +
        news.map(x => f"$x%.2f").mkString("[", ",", "]"))
    }
    spark.stop()
  }
}
