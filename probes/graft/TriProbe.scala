package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: phase-attribute `triangle_count`'s forced time (r13
  * verdict task 3 — the only carried query whose forced number moved
  * > 0.3 s on the quiet archive, 0.98 → 1.47 s, with no plan change).
  *
  * Four cumulative cuts of the [[graft.ext.Graph.triangleCounts]]
  * pipeline, each forced under the ForceProbe xxhash64/bit_xor sink so
  * the phases are measured with the SAME sink cost model as the bench's
  * forced number:
  *   undirect  — lineitem edge derivation + canonicalize + distinct
  *   orient    — + degree aggregate + two joins + (degree, id) ranking
  *   wedge     — + the neighbor-pair self-join (the O(m^{3/2}) core)
  *   close     — + the closing-edge equi-join
  *   full      — + per-node rollup, clustering coefficient, global sort
  * Phase cost = delta between adjacent rows; sink/scan overhead is the
  * `undirect` floor.
  *
  *   tools/run.sh graft.TriProbe /root/testdata/sf0.1
  */
object TriProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TriProbe <sfDir>")
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

    val edges = graft.ext.Graph.lineitemGraph(
      graft.Tables.lineitem(spark, sfDir))

    val und = edges
      .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val deg = und.select(col("a").as("node"))
      .unionAll(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    val withDeg = und
      .join(deg.select(col("node").as("a"), col("degree").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("degree").as("db")), "b")
    val aFirst = col("da") < col("db") || (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("u"),
      when(aFirst, col("b")).otherwise(col("a")).as("v"),
      when(aFirst, col("db")).otherwise(col("da")).as("dv"))
    val e2 = oriented.select(col("u"), col("v").as("w"), col("dv").as("dw"))
    val wedges = oriented.join(e2, Seq("u"))
      .filter(col("dv") < col("dw") || (col("dv") === col("dw") && col("v") < col("w")))
      .select(col("u"), col("v"), col("w"))
    val closing = oriented.select(col("u").as("v"), col("v").as("w"))
    val tris = wedges.join(closing, Seq("v", "w"))
    val full = graft.ext.Graph.triangleCounts(edges)

    def forceOnce(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
        .agg(expr("bit_xor(h)")).collect()
      (System.nanoTime() - t0) / 1e9
    }
    def phase(name: String, df: DataFrame): Unit = {
      forceOnce(df) // warmup
      val ts = Seq.fill(3)(forceOnce(df)).sorted
      println(f"[triprobe] $name sec=${ts(1)}%.3f (min=${ts.head}%.3f max=${ts.last}%.3f)")
    }
    phase("undirect", und)
    phase("orient", oriented)
    phase("wedge", wedges)
    phase("close", tris)
    phase("full", full)
    spark.stop()
  }
}
