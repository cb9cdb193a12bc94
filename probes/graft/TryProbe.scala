package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, expr, struct, xxhash64}

/** Dev probe: per-column attribution of `try_ops`' forced cost.
  *
  * Round 12 measured try_ops forced at 2.51 s — ~8× its projection
  * peers over the same orders scan — with the plan fully inside ONE
  * WholeStageCodegen span (no interpreted fallback; graft.Explain).
  * Each phase here forces the scan plus exactly one of the declared
  * try-columns, so phase − base isolates that expression's per-row
  * cost. The suspicion (the overflow_add lesson from round 12, see the
  * scaladoc in ops/Functions.tryOps): TRY evaluation pays Java
  * exception-throw machinery per FAILING row, so an expression that
  * fails on every row costs ~µs/row however good the codegen is.
  *
  *   tools/run.sh graft.TryProbe /root/testdata/sf0.1
  */
object TryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    val phases = Seq(
      "base_key_only" -> Seq("o_orderkey"),
      "pri_int (fails EVERY row)" -> Seq(
        "try_cast(o_orderpriority as int) as pri_int"),
      "pri_num (parses every row)" -> Seq(
        "try_cast(split_part(o_orderpriority, '-', 1) as int) as pri_num"),
      "per_bucket (div-by-zero 1/3)" -> Seq(
        "try_divide(o_totalprice, cast(o_custkey % 3 as double)) as per_bucket"),
      "overflow_add (fails 0.1%)" -> Seq(
        """try_add(case when o_orderkey % 1000 = 0 then 9223372036854775807L
          |        else 0L end, o_orderkey) as overflow_add""".stripMargin))
    phases.foreach { case (name, cols) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        val df = Tables.orders(spark, sfDir).selectExpr("o_orderkey" +: cols.filterNot(_ == "o_orderkey"): _*)
        df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
          .agg(expr("bit_xor(h)")).collect()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val ts = Seq.fill(3)(once()).sorted
      println(f"[tryprobe] $name sec=${ts(1)}%.3f (min=${ts.head}%.3f max=${ts.last}%.3f)")
    }
    spark.stop()
  }
}
