package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression packing a SimHash signature from an array of
  * token hashes: per bit position, sum +1/-1 weights over all hashes and
  * keep the sign bit.
  *
  * Replaces `bits` separate higher-order `aggregate` lambdas (each an
  * interpreted pass over the array — 16 passes × per-element virtual calls)
  * with ONE primitive loop inside whole-stage codegen. Semantics are
  * identical to the HOF formulation (asserted in tests), so the DuckDB
  * oracle is unchanged.
  */
case class SimHashBits(child: Expression, bits: Int)
    extends UnaryExpression with Serializable {

  require(bits >= 1 && bits <= 64, s"bits must be in [1,64], got $bits")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash_bits expects array<bigint>, got $t")
  }

  override def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val cnt = new Array[Long](bits)
    var j = 0
    while (j < n) {
      val x = xs.getLong(j)
      var i = 0
      while (i < bits) {
        cnt(i) += (if (((x >> i) & 1L) == 1L) 1L else -1L)
        i += 1
      }
      j += 1
    }
    var packed = 0L
    var i = 0
    while (i < bits) {
      if (cnt(i) > 0) packed |= (1L << i)
      i += 1
    }
    packed
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val cnt = ctx.freshName("cnt")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val packed = ctx.freshName("packed")
      s"""
         |int $n = $a.numElements();
         |long[] $cnt = new long[$bits];
         |for (int $j = 0; $j < $n; $j++) {
         |  long $x = $a.getLong($j);
         |  for (int $i = 0; $i < $bits; $i++) {
         |    $cnt[$i] += ((($x >> $i) & 1L) == 1L) ? 1L : -1L;
         |  }
         |}
         |long $packed = 0L;
         |for (int $i = 0; $i < $bits; $i++) {
         |  if ($cnt[$i] > 0) $packed |= (1L << $i);
         |}
         |${ev.value} = $packed;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashBits =
    copy(child = newChild)
}

object SimHashFunctions {
  /** Column API: pack a `bits`-wide SimHash from an array<bigint> of
    * token hashes.
    */
  def simhash_bits(hashes: Column, bits: Int): Column =
    GraftShim.column(SimHashBits(GraftShim.expression(hashes), bits))
}
