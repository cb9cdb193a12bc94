package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (results recorded in BENCH_SF1.md): the Aho–Corasick
  * dictionary-scan claim measured — one pass over corpus bytes whatever
  * the dictionary size, vs the naive form's |P| re-scans.
  *
  * Dictionaries of 8 / 64 / 512 patterns are derived deterministically
  * from the corpus vocabulary (tokens + token bigrams of the first
  * document's vocabulary, padded with synthetic `kw<i>` misses so the
  * larger dictionaries are mostly non-matching — the realistic
  * blocklist regime). Three forms race:
  *
  *   ac       multi_match_counts (compiled automaton, one pass)
  *   naive    sum of |P| contains() scans in one projection — the
  *            expression a user writes first; every pattern re-reads
  *            the text
  *   hof      size(filter(array(P), p -> contains(text, p))) — the
  *            higher-order one-liner; same |P| rescans, plus lambda
  *            interpretation
  *
  * All three forced via the xxhash64 reduction; median of 3 after
  * warm-up.
  *
  *   tools/run.sh graft.AcProbe /root/testdata/sf0.1
  */
object AcProbe {
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

    val docs = Tables.documents(spark, sfDir).where(col("text").isNotNull)
    // deterministic dictionary: corpus vocabulary + bigrams, then
    // synthetic misses
    val vocab = docs.limit(1).selectExpr("split(text, ' ') as t")
      .selectExpr("explode(t) as tok").distinct()
      .orderBy(col("tok")).collect().map(_.getString(0)).filter(_.nonEmpty)
    val bigrams = vocab.flatMap(a => vocab.map(b => s"$a $b"))
    def dict(n: Int): Seq[String] = {
      val real = (vocab ++ bigrams).distinct.take(n / 2)
      val misses = (0 until (n - real.length)).map(i => s"kw$i@miss")
      (real ++ misses).distinct
    }

    def force(df: org.apache.spark.sql.DataFrame): Unit = {
      df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
        .agg(expr("bit_xor(h)")).collect()
      ()
    }
    def med3(mk: => org.apache.spark.sql.DataFrame): Double = {
      def once(): Double = {
        val t0 = System.nanoTime(); force(mk); (System.nanoTime() - t0) / 1e9
      }
      once()
      Seq.fill(3)(once()).sorted.apply(1)
    }

    def safe(mk: => org.apache.spark.sql.DataFrame): String =
      try f"${med3(mk)}%.3f"
      catch { case e: Throwable => s"FAIL(${e.getClass.getSimpleName})" }

    Seq(8, 64, 512).foreach { n =>
      val p = dict(n)
      val ac = safe {
        docs.select(col("doc_id"),
          graft.functions.MultiMatchFunctions.multi_match_counts(col("text"), p).as("c"))
      }
      val naiveExpr = p.map(x =>
        s"cast(contains(text, '${x.replace("'", "''")}') as int)").mkString(" + ")
      // the 512-term sum tree overflows the analyzer's recursion — the
      // naive form does not even COMPILE at blocklist size; record that
      val naive = safe { docs.selectExpr("doc_id", s"($naiveExpr) as n_match") }
      val arr = "array(" + p.map(x => s"'${x.replace("'", "''")}'").mkString(",") + ")"
      val hof = safe {
        docs.selectExpr("doc_id",
          s"size(filter($arr, p -> contains(text, p))) as n_match")
      }
      println(s"[acprobe] patterns=$n ac=$ac naive_contains=$naive hof_filter=$hof dir=$sfDir")
    }
    spark.stop()
  }
}
