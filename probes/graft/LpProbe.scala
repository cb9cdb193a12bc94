package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
object LpProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val edges = Tables.lineitem(spark, sfDir).select(col("l_suppkey").as("src"),
      (col("l_partkey") + 1000000L).as("dst"))
    val und = edges
      .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val adj = und.select(col("a").as("node"), col("b").as("nbr"))
      .unionAll(und.select(col("b").as("node"), col("a").as("nbr")))
    val deg = adj.groupBy(col("node")).agg(count(lit(1)).as("degree"))
    val centers = adj.join(deg.where(col("degree") <= 50).select(col("node")), Seq("node"))
    val cn = centers.select(col("node").as("z"), col("nbr").as("u"))
      .join(centers.select(col("node").as("z"), col("nbr").as("v")), Seq("z"))
      .filter(col("u") < col("v"))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("cn"))
    val unlinked = cn.join(und, cn("u") === und("a") && cn("v") === und("b"), "left_anti")
    def t(name: String, df: DataFrame): Unit = {
      df.count()
      val ts = Seq.fill(3)({ val t0=System.nanoTime(); df.count(); (System.nanoTime()-t0)/1e9 }).sorted
      println(f"[lpprobe] $name sec=${ts(1)}%.3f")
    }
    t("und", und); t("deg", deg); t("centers", centers); t("cn", cn); t("unlinked", unlinked)
    t("full", graft.ext.Graph.linkPredict(edges))
    spark.stop()
  }
}
