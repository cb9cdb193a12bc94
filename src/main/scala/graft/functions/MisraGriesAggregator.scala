package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items summary as a typed Aggregator: a single
  * corpus pass that returns a bounded CANDIDATE set guaranteed to contain
  * every item whose true frequency exceeds N/(capacity+1), plus the total
  * item count N.
  *
  * Scale rationale vs `groupBy(token).count()`: the exact form shuffles
  * one row per DISTINCT token — at 100 TB of web text that is a
  * billions-of-keys exchange just to find the handful of dominant items.
  * This summary reduces every partition to ≤ `capacity` (token, count)
  * entries before the exchange, so the exchange carries
  * capacity·numPartitions rows regardless of vocabulary size; an exact
  * re-count restricted to the (broadcast) candidates then turns the
  * superset into the precise answer (see `TextOps.heavyHitters`).
  *
  * Merge follows the mergeable-summaries construction (Agarwal et al.,
  * PODS'12): add counts pointwise, then subtract the (capacity+1)-th
  * largest count from every entry and drop the non-positive ones. The
  * decrement bound (total decrements ≤ N/(capacity+1) per item) is
  * preserved under merging, which is what makes the per-partition →
  * global two-level aggregation safe.
  *
  * The buffer is a pair of parallel arrays with keys kept SORTED, plus the
  * running total — same encoder-friendly primitive-array pattern as
  * [[TopKAggregator]]. The steady-state reduce (key already tracked) is
  * one binary search + in-place bump, zero allocation; inserts and the
  * decrement sweep are O(capacity) and amortized by the increments that
  * precede them.
  */
class MisraGriesAggregator[I](capacity: Int, extract: I => String)
    extends Aggregator[I, (Array[String], Array[Long], Long), MisraGriesAggregator.Out] {
  import MisraGriesAggregator.Out

  require(capacity >= 1, s"MisraGriesAggregator requires capacity >= 1, got $capacity")

  private type Buf = (Array[String], Array[Long], Long)

  override def zero: Buf = (Array.empty[String], Array.emptyLongArray, 0L)

  @inline private def search(keys: Array[String], item: String): Int =
    java.util.Arrays.binarySearch(keys.asInstanceOf[Array[AnyRef]], item)

  override def reduce(buf: Buf, in: I): Buf = {
    val item = extract(in)
    val (keys, counts, n) = buf
    val pos = search(keys, item)
    if (pos >= 0) {
      counts(pos) += 1L // tracked: in-place bump
      (keys, counts, n + 1L)
    } else if (keys.length < capacity) {
      // growing phase: sorted insert (at most `capacity` net growths)
      val at = -pos - 1
      val nk = new Array[String](keys.length + 1)
      val nc = new Array[Long](keys.length + 1)
      System.arraycopy(keys, 0, nk, 0, at)
      System.arraycopy(counts, 0, nc, 0, at)
      nk(at) = item
      nc(at) = 1L
      System.arraycopy(keys, at, nk, at + 1, keys.length - at)
      System.arraycopy(counts, at, nc, at + 1, keys.length - at)
      (nk, nc, n + 1L)
    } else {
      // full and untracked: decrement-all, evict zeros (the arriving item
      // cancels against one decrement of every tracked item)
      var kept = 0
      var i = 0
      while (i < counts.length) {
        if (counts(i) > 1L) kept += 1
        i += 1
      }
      if (kept == counts.length) {
        i = 0
        while (i < counts.length) { counts(i) -= 1L; i += 1 }
        (keys, counts, n + 1L)
      } else {
        val nk = new Array[String](kept)
        val nc = new Array[Long](kept)
        var j = 0
        i = 0
        while (i < counts.length) {
          if (counts(i) > 1L) { nk(j) = keys(i); nc(j) = counts(i) - 1L; j += 1 }
          i += 1
        }
        (nk, nc, n + 1L)
      }
    }
  }

  override def merge(a: Buf, b: Buf): Buf = {
    // merge-join of two sorted summaries
    val (ak, ac, an) = a
    val (bk, bc, bn) = b
    val mk = new Array[String](ak.length + bk.length)
    val mc = new Array[Long](ak.length + bk.length)
    var i = 0; var j = 0; var m = 0
    while (i < ak.length && j < bk.length) {
      val cmp = ak(i).compareTo(bk(j))
      if (cmp == 0) { mk(m) = ak(i); mc(m) = ac(i) + bc(j); i += 1; j += 1 }
      else if (cmp < 0) { mk(m) = ak(i); mc(m) = ac(i); i += 1 }
      else { mk(m) = bk(j); mc(m) = bc(j); j += 1 }
      m += 1
    }
    while (i < ak.length) { mk(m) = ak(i); mc(m) = ac(i); i += 1; m += 1 }
    while (j < bk.length) { mk(m) = bk(j); mc(m) = bc(j); j += 1; m += 1 }
    if (m <= capacity) (java.util.Arrays.copyOf(mk, m), java.util.Arrays.copyOf(mc, m), an + bn)
    else {
      // subtract the (capacity+1)-th largest count, drop non-positives
      val sorted = java.util.Arrays.copyOf(mc, m)
      java.util.Arrays.sort(sorted)
      val cut = sorted(m - capacity - 1)
      var kept = 0
      i = 0
      while (i < m) { if (mc(i) > cut) kept += 1; i += 1 }
      val nk = new Array[String](kept)
      val nc = new Array[Long](kept)
      var p = 0
      i = 0
      while (i < m) {
        if (mc(i) > cut) { nk(p) = mk(i); nc(p) = mc(i) - cut; p += 1 }
        i += 1
      }
      (nk, nc, an + bn)
    }
  }

  override def finish(buf: Buf): Out = Out(buf._1, buf._3)

  override def bufferEncoder: Encoder[Buf] = ExpressionEncoder[Buf]()
  override def outputEncoder: Encoder[Out] = ExpressionEncoder[Out]()
}

/** [[MisraGriesAggregator]] with the residual COUNTS exposed alongside
  * the candidates — what a summary STORE needs (the per-batch streaming
  * sink persists ≤ capacity (token, residual) rows; the plain form's
  * finish deliberately drops counts because the batch path re-counts
  * exactly). Delegates every buffer operation to the proven
  * implementation.
  */
class MisraGriesFullAggregator[I](capacity: Int, extract: I => String)
    extends Aggregator[I, (Array[String], Array[Long], Long), MisraGriesAggregator.OutFull] {
  private val inner = new MisraGriesAggregator[I](capacity, extract)
  override def zero: (Array[String], Array[Long], Long) = inner.zero
  override def reduce(b: (Array[String], Array[Long], Long), i: I): (Array[String], Array[Long], Long) =
    inner.reduce(b, i)
  override def merge(a: (Array[String], Array[Long], Long), b: (Array[String], Array[Long], Long)): (Array[String], Array[Long], Long) =
    inner.merge(a, b)
  override def finish(buf: (Array[String], Array[Long], Long)): MisraGriesAggregator.OutFull =
    MisraGriesAggregator.OutFull(buf._1, buf._2, buf._3)
  override def bufferEncoder: Encoder[(Array[String], Array[Long], Long)] =
    ExpressionEncoder[(Array[String], Array[Long], Long)]()
  override def outputEncoder: Encoder[MisraGriesAggregator.OutFull] =
    ExpressionEncoder[MisraGriesAggregator.OutFull]()
}

object MisraGriesAggregator {
  /** Sorted candidate items — a superset of every item with true frequency
    * > n_total/(capacity+1) — and the total item count.
    */
  case class Out(candidates: Array[String], n_total: Long)

  /** Candidates with their residual summary counts (each UNDERCOUNTS its
    * item's true frequency by at most ⌊n_total/(capacity+1)⌋).
    */
  case class OutFull(candidates: Array[String], counts: Array[Long], n_total: Long)

  /** The plain string-stream form. */
  def apply(capacity: Int): MisraGriesAggregator[String] =
    new MisraGriesAggregator[String](capacity, identity)

  /** The counts-exposed string-stream form. */
  def full(capacity: Int): MisraGriesFullAggregator[String] =
    new MisraGriesFullAggregator[String](capacity, identity)
}
