package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import TextOps.{md5Long64, shingleExpr}

/** Deduplication operators for training-data pipelines, in increasing
  * fuzziness: exact (hash groupBy), MinHash signatures + LSH bands,
  * SimHash, and n-gram Jaccard pairs. Embedding-cosine near-dup lives in
  * [[Similarity]].
  *
  * Scale shapes:
  *  - exact dedup is one hash-shuffle on a 64-bit key (never on the full
  *    text — a 100 TB corpus shuffles 8-byte keys, not documents);
  *  - MinHash/SimHash signatures are per-row projections (no shuffle);
  *    LSH banding then joins on band hash — candidate pairs only, never
  *    the full cross product;
  *  - Jaccard pairs join on shingle hash, so cost is Σ(bucket²) over
  *    shingle buckets, not n² over documents.
  */
object Dedup {

  /** Exact dedup: group documents by content hash; keep the smallest
    * doc_id as the canonical representative.
    */
  def exact(documents: DataFrame): DataFrame =
    documents
      .selectExpr("doc_id", s"${md5Long64("text")} as text_hash")
      .groupBy(col("text_hash"))
      .agg(min(col("doc_id")).as("keeper_doc_id"), count(lit(1)).as("n_copies"))

  /** MinHash signatures (k independent 60-bit hash functions over the
    * distinct 3-gram shingle set) plus LSH band hashes — two bands of
    * k/2 rows each. Docs sharing a band hash are near-dup candidates.
    */
  def minhashSignatures(documents: DataFrame, k: Int = 8): DataFrame = {
    val mhCols = (0 until k).map { seed =>
      s"array_min(transform(sh, s -> ${md5Long64(s"concat('$seed:', s)")})) as mh$seed"
    }
    val half = k / 2
    val band0 = (0 until half).map(i => s"mh$i").mkString("concat_ws(',', ", ", ", ")")
    val band1 = (half until k).map(i => s"mh$i").mkString("concat_ws(',', ", ", ", ")")
    documents
      .withColumn("toks", split(col("text"), " "))
      .withColumn("sh", expr(shingleExpr("toks")))
      .selectExpr("doc_id" +: mhCols: _*)
      .selectExpr(
        (Seq("doc_id") ++ (0 until k).map(i => s"mh$i") ++ Seq(
          s"${md5Long64(band0)} as band0",
          s"${md5Long64(band1)} as band1")): _*)
  }

  /** LSH candidate pairs: documents sharing either band hash, with their
    * estimated Jaccard (fraction of matching MinHash components).
    */
  def minhashCandidatePairs(documents: DataFrame, k: Int = 8): DataFrame = {
    val sig = minhashSignatures(documents, k)
    val a = sig.alias("a")
    val b = sig.alias("b")
    val sameBand = col("a.band0") === col("b.band0") || col("a.band1") === col("b.band1")
    val matches = (0 until k)
      .map(i => when(col(s"a.mh$i") === col(s"b.mh$i"), 1).otherwise(0))
      .reduce(_ + _)
    a.join(b, col("a.doc_id") < col("b.doc_id") && sameBand)
      .select(
        col("a.doc_id").as("a_id"),
        col("b.doc_id").as("b_id"),
        (matches.cast("double") / lit(k.toDouble)).as("est_jaccard"))
  }

  /** 16-bit SimHash over the token multiset: hash each token once, then
    * per bit sum +1/-1 weights and keep the sign. Pure per-row
    * higher-order aggregation — no shuffle, no UDF.
    */
  def simhash(documents: DataFrame): DataFrame = {
    val bitSums = (0 until 16).map { i =>
      s"aggregate(hs, 0L, (acc, x) -> acc + case when shiftright(x, $i) % 2 = 1 then 1 else -1 end) as b$i"
    }
    val packed = (0 until 16)
      .map(i => s"case when b$i > 0 then cast(${1 << i} as bigint) else 0L end")
      .mkString(" + ")
    documents
      .withColumn("toks", split(col("text"), " "))
      .withColumn("hs", expr(s"transform(toks, t -> ${md5Long64("t")})"))
      .selectExpr("doc_id" +: bitSums: _*)
      .selectExpr("doc_id", s"$packed as simhash")
  }

  /** Top-k most similar document pairs by distinct-3-gram Jaccard.
    * Exploded shingle-hash join: pairs only materialize where a shingle
    * is shared. Deterministic order (jaccard desc, ids asc).
    */
  def ngramJaccardPairs(documents: DataFrame, topK: Int = 50): DataFrame = {
    val sh = documents
      .withColumn("toks", split(col("text"), " "))
      .withColumn("sh", expr(shingleExpr("toks")))
      .selectExpr("doc_id", s"transform(sh, s -> ${md5Long64("s")}) as shs")
    val sizes = sh.selectExpr("doc_id", "cast(size(shs) as bigint) as n_sh")
    val ex = sh.selectExpr("doc_id", "explode(shs) as shingle_hash")
    val common = ex.alias("a")
      .join(ex.alias("b"),
        col("a.shingle_hash") === col("b.shingle_hash") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.withColumnRenamed("doc_id", "a_id").withColumnRenamed("n_sh", "a_n"), "a_id")
      .join(sizes.withColumnRenamed("doc_id", "b_id").withColumnRenamed("n_sh", "b_n"), "b_id")
      .selectExpr(
        "a_id", "b_id", "n_common",
        "cast(n_common as double) / cast(a_n + b_n - n_common as double) as jaccard")
      .orderBy(col("jaccard").desc, col("a_id"), col("b_id"))
      .limit(topK)
  }
}
