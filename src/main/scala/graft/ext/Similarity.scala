package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *  - brute-force cosine (exact baseline) — the dot product is a
  *    higher-order `aggregate` over `zip_with`, evaluated left-to-right in
  *    double precision so Spark and the DuckDB oracle agree to the ulp
  *    (outputs are still rounded to 6 decimals as a guard);
  *  - sign-LSH bucketing (the scale path) — an 8-bit bucket from the sign
  *    pattern of the first 8 dimensions turns the n² pair space into
  *    Σ(bucket²); at 100 TB the bucket id is also the natural partition
  *    key, so candidate generation is a co-partitioned self-join.
  */
object Similarity {

  /** SQL expression for cosine(a, b) in pure double arithmetic. */
  def cosineExpr(a: String, b: String): String =
    s"""aggregate(zip_with($a, $b, (x, y) -> cast(x as double) * cast(y as double)), 0D, (acc, v) -> acc + v)
       | / (sqrt(aggregate($a, 0D, (acc, x) -> acc + cast(x as double) * cast(x as double)))
       |    * sqrt(aggregate($b, 0D, (acc, x) -> acc + cast(x as double) * cast(x as double))))""".stripMargin

  /** Brute-force top-k nearest neighbors of one query vector. Single pass
    * over the table; the per-row cosine is a projection, the top-k a
    * TakeOrdered — no shuffle of the embedding column at all.
    */
  def cosineTopK(embeddings: DataFrame, queryVecId: Long = 0L, k: Int = 10): DataFrame = {
    val q = embeddings
      .filter(col("vec_id") === queryVecId)
      .selectExpr("embedding as q_embedding")
    embeddings.filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .selectExpr(
        "vec_id",
        s"round(${cosineExpr("embedding", "q_embedding")}, 6) as cosine_sim")
      .orderBy(col("cosine_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** All near-duplicate pairs with cosine ≥ threshold (exact, brute
    * force). Quadratic — the correctness baseline the LSH path is
    * validated against at small scale.
    */
  def nearDupPairs(embeddings: DataFrame, threshold: Double = 0.4): DataFrame = {
    val a = embeddings.selectExpr("vec_id as a_id", "embedding as a_emb")
    val b = embeddings.selectExpr("vec_id as b_id", "embedding as b_emb")
    a.join(b, col("a_id") < col("b_id"))
      .selectExpr(
        "a_id", "b_id",
        s"round(${cosineExpr("a_emb", "b_emb")}, 6) as cosine_sim")
      .filter(col("cosine_sim") >= threshold)
  }

  /** Sign-LSH bucket assignment: bit i set iff dimension i+1 is positive.
    * Vectors in the same bucket are ANN candidates; bucket sizes show the
    * partition balance the scale path relies on.
    */
  def lshBuckets(embeddings: DataFrame): DataFrame = {
    val bucket = (1 to 8)
      .map(i => s"case when cast(element_at(embedding, $i) as double) > 0 then cast(${1 << (i - 1)} as bigint) else 0L end")
      .mkString(" + ")
    embeddings
      .selectExpr("vec_id", "label", s"$bucket as bucket")
  }

  /** ANN via sign-LSH: candidate pairs restricted to equal buckets, then
    * exact cosine re-rank within the bucket — Σ(bucket²) work instead
    * of n².
    */
  def annPairsLsh(embeddings: DataFrame, threshold: Double = 0.4): DataFrame = {
    val withBucket = lshBuckets(embeddings)
      .join(embeddings, "vec_id")
      .select(col("vec_id"), col("bucket"), col("embedding"))
    val a = withBucket.selectExpr("vec_id as a_id", "bucket", "embedding as a_emb")
    val b = withBucket.selectExpr("vec_id as b_id", "bucket as b_bucket", "embedding as b_emb")
    a.join(b, col("bucket") === col("b_bucket") && col("a_id") < col("b_id"))
      .selectExpr(
        "a_id", "b_id", "bucket",
        s"round(${cosineExpr("a_emb", "b_emb")}, 6) as cosine_sim")
      .filter(col("cosine_sim") >= threshold)
  }
}
