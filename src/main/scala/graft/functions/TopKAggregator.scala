package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
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
  * The buffer is a pair of primitive arrays kept sorted best-first
  * (score desc, id asc on ties). The common-case insert — a row that
  * does not beat the current worst — is one comparison with zero
  * allocation; a displacing insert shifts in place. No boxed tuples,
  * no per-row sort (the previous `Vector[(Double, Long)]` buffer
  * re-sorted k+1 boxed pairs on every row).
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), (Array[Double], Array[Long]), Seq[Long]] {

  // k <= 0 would read ss(-1) in the full-buffer branch of insert — fail at
  // construction, not mid-job on some executor
  require(k >= 1, s"TopKAggregator requires k >= 1, got $k")

  /** True iff (s1, i1) ranks strictly before (s2, i2). */
  @inline private def before(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  private def insert(
      buf: (Array[Double], Array[Long]),
      score: Double,
      id: Long): (Array[Double], Array[Long]) = {
    val ss = buf._1
    val ids = buf._2
    val n = ss.length
    if (n == k) {
      if (before(ss(n - 1), ids(n - 1), score, id)) buf // doesn't make the cut
      else {
        // in-place displacing insert (mutating and returning the buffer is
        // the documented Aggregator pattern)
        var pos = n - 1
        while (pos > 0 && !before(ss(pos - 1), ids(pos - 1), score, id)) {
          ss(pos) = ss(pos - 1)
          ids(pos) = ids(pos - 1)
          pos -= 1
        }
        ss(pos) = score
        ids(pos) = id
        buf
      }
    } else {
      // growing phase — happens at most k times per group, ever
      var pos = n
      while (pos > 0 && !before(ss(pos - 1), ids(pos - 1), score, id)) pos -= 1
      val ns = new Array[Double](n + 1)
      val ni = new Array[Long](n + 1)
      System.arraycopy(ss, 0, ns, 0, pos)
      System.arraycopy(ids, 0, ni, 0, pos)
      ns(pos) = score
      ni(pos) = id
      System.arraycopy(ss, pos, ns, pos + 1, n - pos)
      System.arraycopy(ids, pos, ni, pos + 1, n - pos)
      (ns, ni)
    }
  }

  override def zero: (Array[Double], Array[Long]) =
    (Array.emptyDoubleArray, Array.emptyLongArray)

  override def reduce(
      buf: (Array[Double], Array[Long]),
      e: (Double, Long)): (Array[Double], Array[Long]) =
    insert(buf, e._1, e._2)

  override def merge(
      a: (Array[Double], Array[Long]),
      b: (Array[Double], Array[Long])): (Array[Double], Array[Long]) = {
    var acc = a
    var i = 0
    while (i < b._1.length) {
      acc = insert(acc, b._1(i), b._2(i))
      i += 1
    }
    acc
  }

  override def finish(buf: (Array[Double], Array[Long])): Seq[Long] =
    buf._2.toSeq

  override def bufferEncoder: Encoder[(Array[Double], Array[Long])] =
    ExpressionEncoder[(Array[Double], Array[Long])]()

  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}
