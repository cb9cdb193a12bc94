package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused nearest-centroid argmax: given a unit vector and a broadcast
  * centroid table (array of (cent_id, cent_unit) structs), return
  * (cell, cent_sim) — the centroid with the highest ROUNDED cosine,
  * ties to the smallest id.
  *
  * Why an Expression: the `array_max(transform(cents, c -> ...))`
  * formulation evaluates its lambda through the interpreter — k boxed
  * dot products per input row, each allocating a struct. This fuses the
  * whole argmax into one primitive loop inside whole-stage codegen:
  * k·dim multiply-adds per row, zero allocation until the single output
  * struct. Semantics are IDENTICAL to the HOF form (asserted bit-for-bit
  * in `ExtSpec`): the per-centroid similarity is rounded to 6 via the
  * same HALF_UP decimal rounding Spark's `round` uses, and the
  * comparison orders by (rounded sim DESC, cent_id ASC) exactly like the
  * struct-max tie-break.
  */
case class VecArgmaxCell(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = VecArgmaxCell.outType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val okUnit = left.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    val okCents = right.dataType match {
      case ArrayType(StructType(Array(a, b)), _) =>
        a.dataType == LongType && (b.dataType match {
          case ArrayType(DoubleType, _) => true
          case _ => false
        })
      case _ => false
    }
    if (okUnit && okCents)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_argmax_cell expects (array<double>, array<struct<bigint,array<double>>>), " +
          s"got ${left.dataType} / ${right.dataType}")
  }

  // empty centroid table -> null (mirrors array_max over an empty array)
  override def nullable: Boolean = true

  override def nullSafeEval(u: Any, cs: Any): Any = {
    val unit = u.asInstanceOf[ArrayData]
    val cents = cs.asInstanceOf[ArrayData]
    val k = cents.numElements()
    if (k == 0) return null
    var bestId = Long.MaxValue
    var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < k) {
      val row = cents.getStruct(c, 2)
      val id = row.getLong(0)
      val cu = row.getArray(1)
      val n = math.min(unit.numElements(), cu.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) { acc += unit.getDouble(i) * cu.getDouble(i); i += 1 }
      val sim = VecArgmaxCell.round6(acc)
      val cmp = VecArgmaxCell.cmpSim(sim, bestSim)
      if (cmp > 0 || (cmp == 0 && id < bestId)) { bestSim = sim; bestId = id }
      c += 1
    }
    InternalRow(bestId, bestSim)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (u, cs) => {
      val k = ctx.freshName("k")
      val c = ctx.freshName("c")
      val row = ctx.freshName("row")
      val id = ctx.freshName("id")
      val cu = ctx.freshName("cu")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val sim = ctx.freshName("sim")
      val bestId = ctx.freshName("bestId")
      val bestSim = ctx.freshName("bestSim")
      s"""
         |int $k = $cs.numElements();
         |if ($k == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $bestId = Long.MAX_VALUE;
         |  double $bestSim = Double.NEGATIVE_INFINITY;
         |  for (int $c = 0; $c < $k; $c++) {
         |    org.apache.spark.sql.catalyst.InternalRow $row = $cs.getStruct($c, 2);
         |    long $id = $row.getLong(0);
         |    org.apache.spark.sql.catalyst.util.ArrayData $cu = $row.getArray(1);
         |    int $n = java.lang.Math.min($u.numElements(), $cu.numElements());
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $acc += $u.getDouble($i) * $cu.getDouble($i);
         |    }
         |    double $sim = graft.functions.VecArgmaxCell.round6($acc);
         |    int ${c}_cmp = graft.functions.VecArgmaxCell.cmpSim($sim, $bestSim);
         |    if (${c}_cmp > 0 || (${c}_cmp == 0 && $id < $bestId)) {
         |      $bestSim = $sim; $bestId = $id;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[] { (Object) $bestId, (Object) $bestSim });
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecArgmaxCell =
    copy(left = newLeft, right = newRight)
}

object VecArgmaxCell {
  val outType: StructType = StructType(Seq(
    StructField("cell", LongType, nullable = false),
    StructField("cent_sim", DoubleType, nullable = false)))

  /** EXACTLY Spark's `round(x, 6)` for doubles: decimal HALF_UP at scale 6
    * (see catalyst `Round` / `RoundBase`), so the fused path and the HOF
    * `round` are bit-identical, including the .5 boundary cases.
    * NaN/Infinity pass through unchanged, as Spark's `round` leaves them
    * (`BigDecimal.valueOf` would throw NumberFormatException on them).
    */
  def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Spark's double ordering (`SQLOrderingUtil.compareDoubles`): NaN sorts
    * GREATEST and -0.0 == 0.0 — so the fused argmax picks the same winner
    * as the struct `array_max` form even for non-finite similarities.
    * Called from both the interpreted eval and the generated code.
    */
  def cmpSim(x: Double, y: Double): Int =
    if (x == y) 0 else java.lang.Double.compare(x, y)

  def vec_argmax_cell(unit: org.apache.spark.sql.Column,
      cents: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftshim.GraftShim.column(
      VecArgmaxCell(
        org.apache.spark.sql.graftshim.GraftShim.expression(unit),
        org.apache.spark.sql.graftshim.GraftShim.expression(cents)))
}
