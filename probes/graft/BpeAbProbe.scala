package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** In-session A/B probe for the BPE training-loop rewrites (one JVM,
  * alternating, median of 5). Variants:
  *   cur  — the shipped Bpe (baseline)
  *   spl  — pairsExpr splits the symbol string ONCE per row into an
  *          array column (the interpreted transform lambda re-evaluated
  *          split(trim(sp)) per element: O(w²) per word per round)
  *   chk  — spl + each round's vocab localCheckpoint/checkpoint-
  *          materialized (the Graph.pageRank idiom), collapsing the
  *          round lineage
  *
  *   tools/run.sh graft.ext.BpeAbProbe /root/testdata/sf0.1
  */
object BpeAbProbe {

  private def vocab(documents: DataFrame): DataFrame = Bpe.vocab(documents)

  private val pairsFast =
    """case when size(syms) >= 2
      | then transform(sequence(1, size(syms) - 1),
      |   i -> struct(element_at(syms, i) as a, element_at(syms, i + 1) as b))
      | else array() end""".stripMargin

  private def merged(col: String): String =
    (1 to 6).foldLeft(col) { (acc, _) =>
      s"replace($acc, concat(' ', ba, ' ', bb, ' '), concat(' ', ba, bb, ' '))"
    }

  private def roundFast(v: DataFrame): (DataFrame, DataFrame) = {
    val best = v
      .select(split(trim(col("sp")), " ").as("syms"), col("freq"))
      .select(explode(expr(pairsFast)).as("p"), col("freq"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("pair_count"))
      .orderBy(col("pair_count").desc, col("a"), col("b"))
      .limit(1)
    val next = v
      .crossJoin(broadcast(best.select(col("a").as("ba"), col("b").as("bb"))))
      .withColumn("sp", expr(merged("sp")))
      .select(col("word"), col("freq"), col("sp"))
    (best, next)
  }

  private def segState(documents: DataFrame, iters: Int, chk: Boolean): DataFrame = {
    val reliable = documents.sparkSession.sparkContext.getCheckpointDir.isDefined
    def mat(df: DataFrame): DataFrame =
      if (chk) Dedup.truncated(df, reliable) else df
    var v = mat(vocab(documents))
    (1 to iters).foreach { _ =>
      val (_, next) = roundFast(v)
      v = mat(next)
    }
    v
  }

  private def segOut(v: DataFrame): DataFrame =
    v.select(
      col("word"), col("freq"),
      trim(col("sp")).as("segmented"),
      expr("cast(size(split(trim(sp), ' ')) as int)").as("n_symbols"))

  private def encOut(documents: DataFrame, v: DataFrame): DataFrame = {
    val seg = v.select(col("word"),
      expr("cast(size(split(trim(sp), ' ')) as bigint)").as("n_sym"))
    documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .join(broadcast(seg), Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_sym")).as("n_subwords"))
      .orderBy(col("doc_id"))
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: BpeAbProbe <sfDir>")
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
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_bpe_ckpt")
    spark.sparkContext.setCheckpointDir(ckptDir.toString)

    def docs: DataFrame = Tables.documents(spark, sfDir)

    val variants: Seq[(String, () => DataFrame)] = Seq(
      ("seg_cur", () => Bpe.bpeSegment(docs)),
      ("seg_spl", () => segOut(segState(docs, 3, chk = false))),
      ("seg_chk", () => segOut(segState(docs, 3, chk = true))),
      ("enc_cur", () => Bpe.bpeEncodeDocs(docs)),
      ("enc_spl", () => encOut(docs, segState(docs, 3, chk = false))),
      ("enc_chk", () => encOut(docs, segState(docs, 3, chk = true))))

    def force(df: DataFrame): Unit =
      df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
        .agg(expr("bit_xor(h)")).collect()

    // correctness cross-check: all seg variants identical, all enc identical
    val segRef = Bpe.bpeSegment(docs).collect().map(_.toString).sorted
    val encRef = Bpe.bpeEncodeDocs(docs).collect().map(_.toString).sorted
    require(segOut(segState(docs, 3, chk = false)).collect().map(_.toString).sorted.sameElements(segRef), "seg_spl differs")
    require(segOut(segState(docs, 3, chk = true)).collect().map(_.toString).sorted.sameElements(segRef), "seg_chk differs")
    require(encOut(docs, segState(docs, 3, chk = false)).collect().map(_.toString).sorted.sameElements(encRef), "enc_spl differs")
    require(encOut(docs, segState(docs, 3, chk = true)).collect().map(_.toString).sorted.sameElements(encRef), "enc_chk differs")
    println("[ab] all BPE variants output-identical")

    variants.foreach { case (name, f) =>
      force(f())
      val ts = collection.mutable.ArrayBuffer[Double]()
      (1 to 5).foreach { _ =>
        val t0 = System.nanoTime(); force(f())
        ts += (System.nanoTime() - t0) / 1e9
      }
      def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
      println(f"[ab] $name med=${med(ts.toSeq)}%.3f " +
        ts.map(x => f"$x%.2f").mkString("[", ",", "]"))
    }
    spark.stop()
    org.apache.commons.io.FileUtils.deleteDirectory(ckptDir.toFile)
  }
}
