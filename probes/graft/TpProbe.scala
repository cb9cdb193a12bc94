package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object TpProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata_scale/x100")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def once(exact: Boolean): Double = {
      val t0 = System.nanoTime()
      val df = graft.ops.Audit.tableProfile(Tables.orders(spark, sfDir), exactDistinct = exact)
      df.select(xxhash64(struct(df.columns.map(col): _*)).as("h")).agg(expr("bit_xor(h)")).collect()
      (System.nanoTime() - t0) / 1e9
    }
    Seq(true, false).foreach { ex =>
      once(ex)
      val ts = Seq.fill(3)(once(ex)).sorted
      println(f"[tpprobe] exact=$ex sec=${ts(1)}%.3f dir=$sfDir")
    }
    spark.stop()
  }
}
