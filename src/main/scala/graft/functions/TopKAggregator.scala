package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator: keeps the k largest (score, id) pairs per
  * group, merging map-side.
  *
  * Scale rationale vs the window-function formulation
  * (`row_number().over(partitionBy(g).orderBy(score)) <= k`): a window
  * must shuffle and fully SORT every row of every group; this aggregator
  * reduces each partition to ≤ k rows per group before the shuffle
  * (classic partial-aggregation), so the exchange carries k·|groups|
  * rows instead of |input|. At 100 TB with k=3 that is the difference
  * between shuffling terabytes and megabytes. Results are identical —
  * asserted against the window formulation by the `topk_agg` oracle.
  *
  * The buffer is a small sorted Vector (k is small by contract); ties
  * break on the larger id to make results deterministic.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[Long]] {

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: Seq[(Double, Long)], e: (Double, Long)): Seq[(Double, Long)] = {
    val merged = (buf :+ e).sortWith(better)
    if (merged.size > k) merged.take(k) else merged
  }

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)], e: (Double, Long)): Seq[(Double, Long)] =
    insert(buf, e)

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    b.foldLeft(a)(insert)

  override def finish(buf: Seq[(Double, Long)]): Seq[Long] = buf.map(_._2)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
