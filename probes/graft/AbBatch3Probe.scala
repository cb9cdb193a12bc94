package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** In-session A/B probe for the round-17 batch-3 rewrites (one JVM,
  * alternating old/new, median of 5 — the LevProbe pattern from the
  * round's measurement doctrine; box noise cancels across the
  * interleave).
  *
  *   tools/run.sh graft.ext.AbBatch3Probe /root/testdata/sf0.1
  *
  * OLD forms are verbatim copies of the pre-change code (two-window
  * top1 + join for contrastiveTriplets; aggregate + join-back word
  * scores for rakeKeywords). NEW forms are the shipped functions.
  * Equality of old-vs-new output is asserted once before timing.
  */
object AbBatch3Probe {

  // ---- pre-change contrastiveTriplets (two windows + equi-join) ----
  private def oldContrastive(
      embeddings: DataFrame,
      minPosSim: Double,
      k: Int): DataFrame = {
    val a = Similarity.ivfAssignWithUnit(embeddings,
      if (k == Similarity.AdaptiveK)
        Similarity.adaptiveCodebookSize(embeddings.count())
      else k)
      .repartition(
        embeddings.sparkSession.sessionState.conf.numShufflePartitions,
        col("cell"))
    val l = a.select(col("cell"), col("vec_id"), col("unit"))
    val r = a.select(col("cell"), col("vec_id").as("nbr_id"),
      col("unit").as("nbr_unit"))
    val pairs = l.join(r, Seq("cell"))
      .filter(col("vec_id") =!= col("nbr_id"))
      .select(col("vec_id"), col("cell"), col("nbr_id"),
        round(graft.functions.VectorFunctions.vec_dot(col("unit"), col("nbr_unit")), 6).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cell"), col("vec_id"))
      .orderBy(col("sim").desc, col("nbr_id"))
    def top1(side: DataFrame, idCol: String, simCol: String): DataFrame =
      side.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .select(col("vec_id").as("anchor_id"), col("nbr_id").as(idCol),
          col("sim").as(simCol))
    top1(pairs.filter(col("sim") >= minPosSim), "pos_id", "pos_sim")
      .join(top1(pairs.filter(col("sim") < minPosSim), "neg_id", "neg_sim"),
        Seq("anchor_id"))
      .select("anchor_id", "pos_id", "pos_sim", "neg_id", "neg_sim")
  }

  // ---- pre-change rakeKeywords (word-score aggregate + join-back) ----
  private def oldRake(documents: DataFrame, k: Int, maxLen: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = documents
      .where(col("text").isNotNull)
      .select(col("doc_id"),
        posexplode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
          .as(Seq("pos", "tok")))
      .where(!col("tok").isInCollection(TextOps.RakeStopwords))
    val runs = toks
      .withColumn("grp", col("pos") -
        row_number().over(Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
    val phrases = runs
      .groupBy(col("doc_id"), col("grp"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, tok))), s -> s.tok)")
        .as("words"))
      .where(size(col("words")) <= maxLen)
      .select(col("doc_id"), col("grp"), col("words"), size(col("words")).as("plen"))
    val wordScores = phrases
      .select(explode(col("words")).as("w"), col("plen"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("freq"), sum(col("plen")).cast("long").as("deg"))
      .select(col("w"), expr("(deg * 1000000L) div freq").as("wscore"))
    phrases
      .select(col("doc_id"), col("grp"),
        array_join(col("words"), " ").as("phrase"), explode(col("words")).as("w"))
      .join(wordScores, "w")
      .groupBy(col("doc_id"), col("grp"), col("phrase"))
      .agg(sum(col("wscore")).as("inst_score"))
      .groupBy(col("phrase"))
      .agg(count(lit(1)).as("n_occ"), max(col("inst_score")).as("score_scaled"))
      .orderBy(col("score_scaled").desc, col("phrase"))
      .limit(k)
      .selectExpr("phrase", "n_occ", "score_scaled",
        "cast(score_scaled as double) / 1000000.0d as score")
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: AbBatch3Probe <sfDir>")
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

    def embIn: DataFrame = {
      val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
      val dup = emb.filter(col("vec_id") % 20 === 0)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      emb.unionByName(dup)
    }
    def docs: DataFrame = Tables.documents(spark, sfDir)

    val variants: Seq[(String, () => DataFrame, () => DataFrame)] = Seq(
      ("contrastive_triplets",
        () => oldContrastive(embIn, 0.95, 16),
        () => Similarity.contrastiveTriplets(embIn, k = 16)),
      ("contrastive_triplets_adaptive",
        () => oldContrastive(embIn, 0.95, Similarity.AdaptiveK),
        () => Similarity.contrastiveTriplets(embIn)),
      ("rake_keywords",
        () => oldRake(docs, 50, 4),
        () => TextOps.rakeKeywords(docs)))

    def force(df: DataFrame): Unit =
      df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
        .agg(expr("bit_xor(h)")).collect()

    variants.foreach { case (name, oldF, newF) =>
      // correctness cross-check once (sorted full collect, string render)
      val o = oldF().orderBy(col(oldF().columns.head)).collect().map(_.toString)
      val n = newF().orderBy(col(newF().columns.head)).collect().map(_.toString)
      require(o.sameElements(n), s"$name: OLD and NEW outputs differ!")
      println(s"[ab] $name outputs identical (${o.length} rows)")
      force(oldF()); force(newF()) // warm both
      val olds = collection.mutable.ArrayBuffer[Double]()
      val news = collection.mutable.ArrayBuffer[Double]()
      (1 to 5).foreach { _ =>
        val t0 = System.nanoTime(); force(oldF())
        olds += (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime(); force(newF())
        news += (System.nanoTime() - t1) / 1e9
      }
      def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
      println(f"[ab] $name OLD med=${med(olds.toSeq)}%.3f " +
        olds.map(x => f"$x%.2f").mkString("[", ",", "]") +
        f" NEW med=${med(news.toSeq)}%.3f " +
        news.map(x => f"$x%.2f").mkString("[", ",", "]"))
    }
    spark.stop()
  }
}
