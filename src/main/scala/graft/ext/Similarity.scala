package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.{vec_dot, vec_norm}

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *  - brute-force cosine (exact baseline) — vectors are L2-normalized
  *    ONCE per row, then every pair costs a single dot product, computed
  *    by the codegen'd [[graft.functions.VecDot]] Catalyst expression (a
  *    tight primitive loop inside whole-stage codegen, ~100× the
  *    throughput of an interpreted higher-order `aggregate` lambda);
  *  - sign-LSH bucketing (the scale path) — an 8-bit bucket from the sign
  *    pattern of the first 8 dimensions turns the n² pair space into
  *    Σ(bucket²); at 100 TB the bucket id is also the natural partition
  *    key, so candidate generation is a co-partitioned self-join.
  *
  * Determinism: normalization and dot accumulate left-to-right in double,
  * mirroring the DuckDB oracle's `list_sum(list_transform(...))`; outputs
  * are rounded to 6 decimals as a cross-engine guard.
  */
object Similarity {

  /** Portable higher-order-function formulation of cosine(a, b) — the
    * semantic reference that [[vec_dot]] is tested against.
    */
  def cosineExpr(a: String, b: String): String =
    s"""aggregate(zip_with($a, $b, (x, y) -> cast(x as double) * cast(y as double)), 0D, (acc, v) -> acc + v)
       | / (sqrt(aggregate($a, 0D, (acc, x) -> acc + cast(x as double) * cast(x as double)))
       |    * sqrt(aggregate($b, 0D, (acc, x) -> acc + cast(x as double) * cast(x as double))))""".stripMargin

  /** Project (vec_id, unit): the L2-normalized embedding as array<double>.
    * One pass per vector; downstream cosines are then plain dots.
    */
  private def normalized(embeddings: DataFrame): DataFrame =
    embeddings
      .withColumn("_norm", vec_norm(col("embedding")))
      .withColumn("unit", expr("transform(embedding, x -> cast(x as double) / _norm)"))

  /** Brute-force top-k nearest neighbors of one query vector. Single scan;
    * the per-row cosine is one codegen'd dot against the broadcast query
    * vector; top-k is a TakeOrdered — nothing shuffles the vectors.
    */
  def cosineTopK(embeddings: DataFrame, queryVecId: Long = 0L, k: Int = 10): DataFrame = {
    val n = normalized(embeddings)
    val q = n.filter(col("vec_id") === queryVecId).select(col("unit").as("q_unit"))
    n.filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(vec_dot(col("unit"), col("q_unit")), 6).as("cosine_sim"))
      .orderBy(col("cosine_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** All near-duplicate pairs with cosine ≥ threshold (exact, brute
    * force). Quadratic — the correctness baseline the LSH path is
    * validated against at small scale. Normalization happens before the
    * join, so the n² stage does one dot per pair and nothing else.
    */
  def nearDupPairs(embeddings: DataFrame, threshold: Double = 0.4): DataFrame = {
    val n = normalized(embeddings)
    val a = n.selectExpr("vec_id as a_id", "unit as a_unit")
    val b = n.selectExpr("vec_id as b_id", "unit as b_unit")
    a.join(b, col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        round(vec_dot(col("a_unit"), col("b_unit")), 6).as("cosine_sim"))
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
    embeddings.selectExpr("vec_id", "label", s"$bucket as bucket")
  }

  /** ANN via sign-LSH: candidate pairs restricted to equal buckets, then
    * exact cosine re-rank within the bucket — Σ(bucket²) work instead
    * of n².
    */
  def annPairsLsh(embeddings: DataFrame, threshold: Double = 0.4): DataFrame = {
    val withBucket = lshBuckets(embeddings)
      .join(embeddings, "vec_id")
    val n = normalized(withBucket)
    val a = n.selectExpr("vec_id as a_id", "bucket", "unit as a_unit")
    val b = n.selectExpr("vec_id as b_id", "bucket as b_bucket", "unit as b_unit")
    a.join(b, col("bucket") === col("b_bucket") && col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("bucket"),
        round(vec_dot(col("a_unit"), col("b_unit")), 6).as("cosine_sim"))
      .filter(col("cosine_sim") >= threshold)
  }
}
