package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: banded (3-arg) vs full levenshtein on the editLinkage /
  * blockingEval pair streams.
  *
  *   SPARK_GRAFT_CPUS=32 tools/run.sh graft.LevProbe /root/testdata/sf0.1
  */
object LevProbe {
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

    val p = Tables.part(spark, sfDir)
      .select(col("p_partkey"), col("p_brand"),
        split(col("p_name"), " ").getItem(0).as("w1"), col("p_name"))
    val a = p.select(col("p_brand"), col("w1"),
      col("p_partkey").as("key_a"), col("p_name").as("name_a"))
    val b = p.select(col("p_brand"), col("w1"),
      col("p_partkey").as("key_b"), col("p_name").as("name_b"))
    val pairs = a.join(b, Seq("p_brand", "w1")).where(col("key_a") < col("key_b"))

    def timed(label: String)(f: => Unit): Unit = {
      f // warmup
      val ts = Seq.fill(3) {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[levprobe] $label sec=${ts(1)}%.3f (min=${ts.head}%.3f max=${ts.last}%.3f)")
    }

    timed("pairs_only") {
      pairs.select(col("key_a")).write.format("noop").mode("overwrite").save()
    }
    timed("full_lev") {
      pairs.select(levenshtein(col("name_a"), col("name_b")).as("d"))
        .write.format("noop").mode("overwrite").save()
    }
    timed("banded_lev_4") {
      pairs.select(levenshtein(col("name_a"), col("name_b"), 4).as("d"))
        .write.format("noop").mode("overwrite").save()
    }
    timed("full_filter") {
      pairs.where(levenshtein(col("name_a"), col("name_b")) <= 4)
        .select(col("key_a")).write.format("noop").mode("overwrite").save()
    }
    timed("banded_filter") {
      pairs.where(levenshtein(col("name_a"), col("name_b"), 4).between(0, 4))
        .select(col("key_a")).write.format("noop").mode("overwrite").save()
    }
    timed("lenpre_filter_2") {
      pairs.where(abs(length(col("name_a")) - length(col("name_b"))) <= 2 &&
          levenshtein(col("name_a"), col("name_b")) <= 2)
        .select(col("key_a")).write.format("noop").mode("overwrite").save()
    }
    timed("full_filter_2") {
      pairs.where(levenshtein(col("name_a"), col("name_b")) <= 2)
        .select(col("key_a")).write.format("noop").mode("overwrite").save()
    }

    // the ACTUAL blockingEval truth stream: sampled brands, brand-only block
    val sampled = p.where(col("p_brand").endsWith("3"))
    val ta = sampled.select(col("p_brand"), col("p_partkey").as("key_a"),
      col("p_name").as("name_a"))
    val tb = sampled.select(col("p_brand"), col("p_partkey").as("key_b"),
      col("p_name").as("name_b"))
    val tpairs = ta.join(tb, Seq("p_brand")).where(col("key_a") < col("key_b"))
    timed("truth_full") {
      tpairs.where(levenshtein(col("name_a"), col("name_b")) <= 2)
        .select(col("key_a")).write.format("noop").mode("overwrite").save()
    }
    timed("truth_lenpre") {
      tpairs.where(abs(length(col("name_a")) - length(col("name_b"))) <= 2 &&
          levenshtein(col("name_a"), col("name_b")) <= 2)
        .select(col("key_a")).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
