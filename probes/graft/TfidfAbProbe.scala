package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: A/B of tfidfCosinePairs WITH vs WITHOUT the source-level
  * isnotnull(doc_id) (the round-11 exchange-reuse fix) at a given scale
  * dir. The B leg reconstructs the pre-fix shape inline.
  */
object TfidfAbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("testdata_scale/x100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val documents = Tables.documents(spark, sfDir)

    def oldShape(): DataFrame = {
      val maxDf = 100
      val tf = documents
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
      val n = documents.agg(count(lit(1)).cast("double").as("n_docs"))
      val df = tf.where(col("tf") > 0)
        .groupBy(col("token")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxDf)
      val w = tf.join(df, Seq("token")).crossJoin(broadcast(n))
        .selectExpr("doc_id", "token", "tf * (n_docs / df) as w")
        .repartition(col("doc_id"))
      val norms = w.groupBy(col("doc_id"))
        .agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
      val wn = w.join(norms, "doc_id")
      wn.select(col("token"), col("doc_id").as("a_id"), col("w").as("a_w"), col("nrm").as("a_nrm"))
        .join(wn.select(col("token"), col("doc_id").as("b_id"), col("w").as("b_w"),
          col("nrm").as("b_nrm")), "token")
        .filter(col("a_id") < col("b_id"))
        .groupBy(col("a_id"), col("b_id"), col("a_nrm"), col("b_nrm"))
        .agg(sum(col("a_w") * col("b_w")).as("dot"))
        .select(col("a_id"), col("b_id"),
          round(col("dot") / (col("a_nrm") * col("b_nrm")), 6).as("cosine"))
        .filter(col("cosine") >= 0.5)
        .orderBy(col("cosine").desc, col("a_id"), col("b_id")).limit(50)
    }

    def time(tag: String, mk: () => DataFrame): Unit = {
      mk().collect() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); mk().collect(); (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[tfidfab] $tag median=${ts(1)}%.3f (min=${ts.head}%.3f max=${ts.last}%.3f)")
    }
    time("pre-fix (no source isnotnull)", () => oldShape())
    time("library (round-11 fix)", () => graft.ext.TextOps.tfidfCosinePairs(documents))
    spark.stop()
  }
}
