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
    import graft.ext.TextOps.{md5Long64, shingleExpr}
    def docs = Tables.documents(spark, dir)
    val flat = docs
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(shingleExpr("toks"))).as("shingle"))
      .select(col("doc_id"), expr(md5Long64("shingle")).as("shingle_hash"))
    t("warm")(docs.count())
    t("flat shingle hashes")(flat.count())
    val grouped = flat.groupBy(col("shingle_hash"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) <= 100)
    t("grouped buckets")(grouped.count())
    val pairs = grouped
      .filter(size(col("ids")) > 1)
      .selectExpr(
        """explode(flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids) - i - 1), y -> struct(x as a_id, y as b_id))
          |))) as p""".stripMargin)
    t("pair explosion rows")(pairs.count())
    val counted = pairs.select(col("p.a_id").as("a_id"), col("p.b_id").as("b_id"))
      .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("n_common"))
    t("pair counts")(counted.count())
    t("full ngram_jaccard q")(graft.ext.Dedup.ngramJaccardCapped(docs, maxDf = 100).count())
    spark.stop()
  }
}
