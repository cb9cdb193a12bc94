package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise sum of integer vectors as a typed Aggregator — the
  * map-side-combining form of a per-cell centroid update.
  *
  * Scale rationale vs `posexplode` + `groupBy(cell, pos)`: the explode
  * form shuffles one row per (vector, component) — n·dim rows for one
  * k-means round, which at corpus scale dwarfs the data itself. This
  * aggregator reduces every partition to at most k (cell → dim longs +
  * count) buffers BEFORE the exchange (Spark runs typed Aggregators with
  * partial aggregation), so the shuffle carries ≤ k·numPartitions rows
  * whatever n is. Integer addition is associative, so any combine order
  * is bit-identical — the property `Similarity.kmeansAssign`'s
  * cross-engine exactness rests on.
  *
  * The buffer is a primitive long array (sums) plus the member count;
  * `zero` is dimension-agnostic (empty array) and adopts the first
  * vector's length, so one aggregator serves any embedding dim. NULL /
  * empty inputs never reach it — callers filter the quantized-unit
  * column first (see `Similarity.kmeansCentroids`).
  */
class LongVecSumAggregator[I](extract: I => Seq[Long])
    extends Aggregator[I, (Array[Long], Long), LongVecSumAggregator.Out] {
  import LongVecSumAggregator.Out

  private type Buf = (Array[Long], Long)

  override def zero: Buf = (Array.emptyLongArray, 0L)

  override def reduce(buf: Buf, in: I): Buf = {
    val v = extract(in)
    val (sums, n) = buf
    if (sums.isEmpty) {
      val s = new Array[Long](v.length)
      var i = 0
      while (i < v.length) { s(i) = v(i); i += 1 }
      (s, n + 1L)
    } else {
      require(sums.length == v.length,
        s"vector length mismatch: buffer ${sums.length} vs input ${v.length}")
      var i = 0
      while (i < sums.length) { sums(i) += v(i); i += 1 }
      (sums, n + 1L)
    }
  }

  override def merge(a: Buf, b: Buf): Buf =
    if (a._1.isEmpty) b
    else if (b._1.isEmpty) a
    else {
      require(a._1.length == b._1.length,
        s"vector length mismatch in merge: ${a._1.length} vs ${b._1.length}")
      val s = a._1
      var i = 0
      while (i < s.length) { s(i) += b._1(i); i += 1 }
      (s, a._2 + b._2)
    }

  override def finish(buf: Buf): Out = Out(buf._1.toSeq, buf._2)

  override def bufferEncoder: Encoder[Buf] = ExpressionEncoder[Buf]()
  override def outputEncoder: Encoder[Out] = ExpressionEncoder[Out]()
}

object LongVecSumAggregator {
  /** sums = Σ vectors element-wise; n = member count. */
  case class Out(sums: Seq[Long], n: Long)
}
