package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._

/** Compiled SDC kernel for the bulk PQ kNN join
  * ([[graft.ext.Similarity.pqKnnJoin]]) — Jégou et al. 2011's SYMMETRIC
  * distance computation: both sides of the candidate pair are
  * represented by their m packed codebook RANKS (8 bits each, one
  * bigint per vector — the literal m-bytes-per-vector PQ storage
  * contract), and the approximate dot reads the precomputed
  * codeword×codeword table
  *
  *   sdc = Σ_s T[(s·k + rank_a(s))·k + rank_b(s)]
  *
  * broadcast ONCE for the whole join (m·k² longs — 4 KB at m=k=8,
  * independent of corpus size). Per pair: m table loads and adds.
  *
  * Two designs this replaced, with the measured reason: a per-pair
  * codeword-list scan (~256 struct reads/pair, benched 3.5× slower than
  * the exact join), and asymmetric ADC with a per-QUERY lookup table —
  * exact-shuffle-parity, because the 512-byte LUT riding every query
  * row costs exactly what the 512-byte vector did. SDC is what actually
  * shrinks the exchange: ids + 8 bytes on BOTH sides.
  */
object PqAdc {
  /** [[PqAdcLut]]'s kernel: Σ_s lut[s·k + rank_s(packed)]; null (boxed)
    * when a packed rank falls outside [0, k) or the table. */
  def adcLut(lut: ArrayData, packed: Long, m: Int, k: Int): java.lang.Long = {
    val n = lut.numElements()
    var total = 0L
    var s = 0
    while (s < m) {
      val r = ((packed >>> (8 * s)) & 0xffL).toInt
      val idx = s * k + r
      if (r >= k || idx >= n) return null
      total += lut.getLong(idx)
      s += 1
    }
    java.lang.Long.valueOf(total)
  }

  /** Null (boxed) when a packed rank falls outside the table — codes
    * from a foreign codebook; callers filter those pairs. */
  def sdcPacked(table: ArrayData, packedA: Long, packedB: Long,
      m: Int, k: Int): java.lang.Long = {
    val n = table.numElements()
    var total = 0L
    var s = 0
    while (s < m) {
      val ra = ((packedA >>> (8 * s)) & 0xffL).toInt
      val rb = ((packedB >>> (8 * s)) & 0xffL).toInt
      val idx = (s * k + ra) * k + rb
      if (ra >= k || rb >= k || idx >= n) return null
      total += table.getLong(idx)
      s += 1
    }
    java.lang.Long.valueOf(total)
  }
}

/** `sdc_packed(table, packed_a, packed_b)` — see [[PqAdc.sdcPacked]]. */
case class PqSdcPacked(
    table: Expression, packedA: Expression, packedB: Expression, m: Int, k: Int)
    extends TernaryExpression with Serializable {

  require(m >= 1 && m <= 8, s"m must be in [1, 8] (8-bit packed ranks), got m=$m")
  require(k >= 1 && k <= 256, s"k must be in [1, 256] (8-bit packed ranks), got k=$k")

  override def first: Expression = table
  override def second: Expression = packedA
  override def third: Expression = packedB

  override def nullable: Boolean = true
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (table.dataType, packedA.dataType, packedB.dataType) match {
      case (ArrayType(LongType, _), LongType, LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"sdc_packed expects (array<bigint>, bigint, bigint), got ($a, $b, $c)")
    }

  override def nullSafeEval(t: Any, a: Any, b: Any): Any =
    PqAdc.sdcPacked(t.asInstanceOf[ArrayData],
      a.asInstanceOf[Long], b.asInstanceOf[Long], m, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, a, b) => s"""
      |java.lang.Long r = graft.functions.PqAdc.sdcPacked($t, $a, $b, $m, $k);
      |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.longValue(); }
     """.stripMargin)

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): PqSdcPacked =
    copy(table = newFirst, packedA = newSecond, packedB = newThird)
}

/** `adc_lut(lut, packed)` — ASYMMETRIC distance computation for serving:
  * the QUERY keeps full precision as its dense per-(subspace, rank)
  * codeword-dot table `lut[s·k + r]` (m·k longs, computed once per query
  * row), the corpus row is its packed ranks, and the approximate dot is
  * m table loads + adds. The serving-time sibling of [[PqSdcPacked]]:
  * one side exact, so ranking quality matches [[graft.ext.Similarity.pqTopK]]'s
  * ADC instead of SDC's doubly-quantized scores.
  */
case class PqAdcLut(lut: Expression, packed: Expression, m: Int, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with Serializable {

  require(m >= 1 && m <= 8, s"m must be in [1, 8] (8-bit packed ranks), got m=$m")
  require(k >= 1 && k <= 256, s"k must be in [1, 256] (8-bit packed ranks), got k=$k")

  override def left: Expression = lut
  override def right: Expression = packed

  override def nullable: Boolean = true
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (lut.dataType, packed.dataType) match {
      case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"adc_lut expects (array<bigint>, bigint), got ($a, $b)")
    }

  override def nullSafeEval(l: Any, p: Any): Any =
    PqAdc.adcLut(l.asInstanceOf[ArrayData], p.asInstanceOf[Long], m, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, p) => s"""
      |java.lang.Long r = graft.functions.PqAdc.adcLut($l, $p, $m, $k);
      |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.longValue(); }
     """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcLut =
    copy(lut = newLeft, packed = newRight)
}

object PqFunctions {
  /** Column API: symmetric PQ dot of two packed-rank code words against
    * the broadcast codeword×codeword table. */
  def sdc_packed(table: Column, packedA: Column, packedB: Column,
      m: Int, k: Int): Column =
    GraftShim.column(PqSdcPacked(GraftShim.expression(table),
      GraftShim.expression(packedA), GraftShim.expression(packedB), m, k))

  /** Column API: asymmetric PQ dot of a query's dense (s, rank)
    * codeword-dot table against a corpus vector's packed ranks. */
  def adc_lut(lut: Column, packed: Column, m: Int, k: Int): Column =
    GraftShim.column(PqAdcLut(GraftShim.expression(lut),
      GraftShim.expression(packed), m, k))
}
