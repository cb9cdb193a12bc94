package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only measurement harness (not part of the library surface):
  * step-level timings for whatever operator is being tuned this round.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def t(tag: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s  ($r)")
    }
    import graft.ext.{Dedup, TextOps}
    val all = Tables.documents(spark, dir)
    val corpus = all.filter(col("doc_id") % 50 =!= 0)
    t("warm")(all.count())
    t("corpus")(corpus.count())
    val nonRep = TextOps.repetitionStats(corpus)
      .filter(col("repetitive") === 0).select("doc_id")
    t("nonRep")(nonRep.count())
    val cleanIds = Dedup.contaminationCounts(all)
      .filter(col("contaminated") === 0).select("doc_id")
    t("cleanIds")(cleanIds.count())
    val survivors = corpus
      .join(nonRep, Seq("doc_id"), "left_semi")
      .join(cleanIds, Seq("doc_id"), "left_semi")
    t("survivors")(survivors.count())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_th")).orderBy(col("doc_id"))
    val deduped = survivors
      .withColumn("_th", expr(s"${TextOps.md5Long64("text")}"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_th", "_rn")
    t("deduped")(deduped.count())
    val rate = expr("10 + ((cast(substring(source, 4, 8) as int) * 7) % 80)")
    val sampled = deduped.filter(
      expr(s"pmod(${TextOps.md5Long64("cast(doc_id as string)")}, 100)") < rate)
    t("sampled")(sampled.count())
    t("full agg run1")(sampled.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("bigint")).as("total_tokens")).count())
    t("full agg run2")(sampled.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("bigint")).as("total_tokens")).count())
    spark.stop()
  }
}
