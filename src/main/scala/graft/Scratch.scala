package graft
import org.apache.spark.sql.SparkSession
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
      val t0 = System.nanoTime(); f
      println(f"$tag: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    def docs = Tables.documents(spark, dir)
    t("minhash_pairs run1")(graft.ext.Dedup.minhashCandidatePairs(docs).count())
    t("minhash_pairs run2")(graft.ext.Dedup.minhashCandidatePairs(docs).count())
    t("simhash_pairs")(graft.ext.Dedup.simhashPairs(docs).count())
    t("ngram_capped")(graft.ext.Dedup.ngramJaccardCapped(docs).count())
    t("dedup_clusters")(graft.ext.Dedup.connectedComponents(
      graft.ext.Dedup.minhashCandidatePairs(docs).select("a_id","b_id")).count())
    println("pairs n: " + graft.ext.Dedup.minhashCandidatePairs(docs).count())
    val pinned = spark.sparkContext.getRDDStorageInfo.filter(_.numCachedPartitions > 0)
    println("pinned after all: " + pinned.map(i => s"${i.id}(${i.memSize}b)").mkString(","))
    spark.stop()
  }
}
