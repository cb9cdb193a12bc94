package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (results recorded in BENCH_SF1.md): the grid radius-join's
  * scale law measured with GROWING point sets — the sf dirs keep
  * customer/supplier fixed (dims don't grow in GenScale's model), so the
  * gated query's curve can't show what the join does when the MAP fills
  * up. Two growth regimes, the ones a real deployment moves between:
  *
  *   density-const   domain side scales with √n, so points-per-cell is
  *                   constant — the "more cities" regime. Candidate pairs
  *                   grow linearly; time should track n.
  *   domain-fixed    same map, n× the points — the "denser downtown"
  *                   regime. Points-per-cell grows n×, candidate pairs
  *                   n², the law the operator documents as its skew
  *                   lever (shrink R / AQE-split hot cells).
  *
  * Points are synthesized from `spark.range` with the same LCG placement
  * the gated query uses (deterministic, uniform); build = probe/15,
  * mirroring the customer:supplier ratio. Forced via the xxhash64
  * reduction; median of 3 after warm-up.
  *
  *   tools/run.sh graft.GeoProbe [probeCounts,...]
  */
object GeoProbe {
  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.map(_.split(",").map(_.trim.toLong).toSeq)
      .getOrElse(Seq(15000L, 150000L, 1500000L, 15000000L))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def pts(n: Long, w: Long, h: Long, mulX: Long, mulY: Long) =
      spark.range(n).select(
        col("id"),
        expr(s"(id * $mulX + 7) % $w").as("x"),
        expr(s"(id * $mulY + 13) % $h").as("y"))

    def run(label: String, nProbe: Long, w: Long, h: Long): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        val df = graft.ext.Geo.radiusJoinNearest(
          pts(nProbe, w, h, 48271L, 69621L),
          pts(nProbe / 15, w, h, 40503L, 69427L),
          radius = 1000L)
        df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
          .agg(expr("bit_xor(h)")).collect()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val ts = Seq.fill(3)(once()).sorted
      println(f"[geoprobe] $label nProbe=$nProbe map=${w}x$h sec=${ts(1)}%.3f " +
        f"(min=${ts.head}%.3f max=${ts.last}%.3f)")
    }

    // density-const: area grows with n (side with √n); base map 36000×18000
    // at n=15000 matches the gated query's geometry
    sizes.foreach { n =>
      val s = math.sqrt(n.toDouble / 15000.0)
      run("density-const", n, math.round(36000 * s), math.round(18000 * s))
    }
    // domain-fixed: the base map regardless of n — per-cell population
    // grows n×, the quadratic regime (cap the top size: n² pairs)
    sizes.filter(_ <= 1500000L).foreach { n =>
      run("domain-fixed", n, 36000L, 18000L)
    }
    spark.stop()
  }
}
