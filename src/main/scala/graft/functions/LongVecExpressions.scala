package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the INT64 vector kernels of the ANN
  * family (quantized-unit dots, nearest-centroid argmax, nearest-codeword
  * argmin). Spark's higher-order functions (`aggregate`, `zip_with`,
  * `transform`, `filter`) are CodegenFallback — every element evaluates
  * through the interpreter with boxed lambda calls — so the HOF forms of
  * these kernels cost ~dim interpreted calls per candidate per row. Each
  * expression here generates one tight primitive loop inside whole-stage
  * codegen and is pinned bit-identical to the HOF form it replaces in
  * ExtSpec (the [[VecDot]] / [[VecArgmaxCell]] FunctionsSpec precedent).
  */

/** Exact int64 dot of two bigint arrays.
  *
  * Semantics mirror `aggregate(zip_with(a, b, (x, y) -> x * y), 0L,
  * (acc, x) -> acc + x)` exactly:
  *   - either array NULL → NULL;
  *   - length mismatch → NULL (zip_with pads the shorter side with NULL,
  *     the padded product is NULL, and a NULL poisons the aggregate);
  *   - any NULL element → NULL (same poisoning);
  *   - overflow wraps like non-ANSI LongType Multiply/Add (Java
  *     semantics) — unreachable for quantized units (|x| ≤ 1e6, dim ≤ 64
  *     ⇒ |dot| ≤ 6.4e13), stated for contract completeness.
  */
case class VecDotLong(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot_long expects array<bigint>, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotLong =
    copy(left = newLeft, right = newRight)
}

/** Fused integer nearest-centroid argmax: given a quantized unit vector
  * and the broadcast centroid table (array of (cidx, qcent) structs),
  * return (cell, qdot) — the centroid with the largest exact int64 dot,
  * ties to the smallest cidx.
  *
  * Replaces (bit-identically, ExtSpec-pinned):
  * {{{
  *   array_max(transform(cents, c -> named_struct(
  *     'dot', aggregate(zip_with(qvec, c.qcent, (x, y) -> x * y), 0L, (a, x) -> a + x),
  *     'negidx', -c.cidx)))
  * }}}
  * with cell = -negidx and qdot = dot. Empty centroid array → NULL
  * (array_max of an empty array). Callers guard qvec IS NOT NULL
  * outside (the [[VecDotLong]] null-poisoning cases cannot arise:
  * centroid vectors are means of quantized units, never NULL-element,
  * and always the same dimension as qvec).
  */
case class VecArgmaxQCell(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = VecArgmaxQCell.outType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val okVec = left.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    val okCents = right.dataType match {
      case ArrayType(StructType(Array(a, b)), _) =>
        a.dataType == LongType && (b.dataType match {
          case ArrayType(LongType, _) => true
          case _ => false
        })
      case _ => false
    }
    if (okVec && okCents)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_argmax_qcell expects (array<bigint>, array<struct<bigint,array<bigint>>>), " +
          s"got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(v: Any, cs: Any): Any = {
    val qvec = v.asInstanceOf[ArrayData]
    val cents = cs.asInstanceOf[ArrayData]
    val k = cents.numElements()
    if (k == 0) return null
    val d = qvec.numElements()
    var bestId = Long.MaxValue
    var bestDot = Long.MinValue
    var first = true
    var c = 0
    while (c < k) {
      val row = cents.getStruct(c, 2)
      val id = row.getLong(0)
      val cu = row.getArray(1)
      // a dimension-mismatched centroid is EXCLUDED, never scored on a
      // partial dot (r16 ADVICE: the HOF form NULL-poisons its dot via
      // zip_with padding, so it can never win — aligned with
      // [[VecDotLong]]'s mismatch-to-NULL contract; unreachable for
      // trained centroids, which share qvec's dimension by construction)
      if (cu.numElements() == d) {
        var acc = 0L
        var i = 0
        while (i < d) { acc += qvec.getLong(i) * cu.getLong(i); i += 1 }
        if (first || acc > bestDot || (acc == bestDot && id < bestId)) {
          bestDot = acc; bestId = id; first = false
        }
      }
      c += 1
    }
    if (first) null else InternalRow(bestId, bestDot)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cs) => {
      val k = ctx.freshName("k")
      val d = ctx.freshName("d")
      val c = ctx.freshName("c")
      val row = ctx.freshName("row")
      val id = ctx.freshName("id")
      val cu = ctx.freshName("cu")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val bestId = ctx.freshName("bestId")
      val bestDot = ctx.freshName("bestDot")
      val first = ctx.freshName("first")
      s"""
         |int $k = $cs.numElements();
         |if ($k == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $d = $v.numElements();
         |  long $bestId = Long.MAX_VALUE;
         |  long $bestDot = Long.MIN_VALUE;
         |  boolean $first = true;
         |  for (int $c = 0; $c < $k; $c++) {
         |    org.apache.spark.sql.catalyst.InternalRow $row = $cs.getStruct($c, 2);
         |    long $id = $row.getLong(0);
         |    org.apache.spark.sql.catalyst.util.ArrayData $cu = $row.getArray(1);
         |    if ($cu.numElements() == $d) {
         |      long $acc = 0L;
         |      for (int $i = 0; $i < $d; $i++) {
         |        $acc += $v.getLong($i) * $cu.getLong($i);
         |      }
         |      if ($first || $acc > $bestDot || ($acc == $bestDot && $id < $bestId)) {
         |        $bestDot = $acc; $bestId = $id; $first = false;
         |      }
         |    }
         |  }
         |  if ($first) { ${ev.isNull} = true; }
         |  else {
         |    ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |      new Object[] { java.lang.Long.valueOf($bestId), java.lang.Long.valueOf($bestDot) });
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecArgmaxQCell =
    copy(left = newLeft, right = newRight)
}

object VecArgmaxQCell {
  val outType: StructType = StructType(Seq(
    StructField("cell", LongType, nullable = false),
    StructField("qdot", LongType, nullable = false)))
}

/** Fused nearest-codeword argmin for one PQ subvector: given the
  * subvector `qsub`, its subspace id `s`, and the broadcast all-subspace
  * codeword table (array of (s, cidx, qcent) structs), return
  * (code, qobj) — the codeword of subspace `s` with the largest exact
  * int64 L2 objective 2·dot(qsub, qcent) − Σ qcent², ties to the
  * smallest cidx.
  *
  * Replaces (bit-identically, ExtSpec-pinned):
  * {{{
  *   array_max(transform(filter(cents, c -> c.s = s), c -> named_struct(
  *     'obj', 2L * aggregate(zip_with(qsub, c.qcent, (x, y) -> x * y), 0L, (a, x) -> a + x)
  *            - aggregate(c.qcent, 0L, (a, x) -> a + x * x),
  *     'negidx', -c.cidx)))
  * }}}
  * with code = -negidx and qobj = obj. No codeword in subspace `s` →
  * NULL (array_max over the empty filtered array). The HOF form
  * allocates the filtered array plus one struct per codeword per row;
  * this is one primitive loop, zero allocation until the output struct.
  */
case class PqArgmaxCode(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with Serializable {

  override def dataType: DataType = PqArgmaxCode.outType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val okSub = first.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    val okS = second.dataType == IntegerType
    val okCents = third.dataType match {
      case ArrayType(StructType(Array(a, b, c)), _) =>
        a.dataType == IntegerType && b.dataType == LongType && (c.dataType match {
          case ArrayType(LongType, _) => true
          case _ => false
        })
      case _ => false
    }
    if (okSub && okS && okCents)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "pq_argmax_code expects (array<bigint>, int, array<struct<int,bigint,array<bigint>>>), " +
          s"got ${first.dataType} / ${second.dataType} / ${third.dataType}")
  }

  override def nullSafeEval(q: Any, sv: Any, cs: Any): Any = {
    val qsub = q.asInstanceOf[ArrayData]
    val s = sv.asInstanceOf[Int]
    val cents = cs.asInstanceOf[ArrayData]
    val k = cents.numElements()
    val d = qsub.numElements()
    var bestId = Long.MaxValue
    var bestObj = Long.MinValue
    var any = false
    var c = 0
    while (c < k) {
      val row = cents.getStruct(c, 3)
      // dimension-mismatched codewords are EXCLUDED, never scored on a
      // partial dot — the VecArgmaxQCell/VecDotLong mismatch contract
      // (unreachable for trained codebooks: subvector slices share qsub's
      // width by construction)
      if (row.getInt(0) == s && row.getArray(2).numElements() == d) {
        val id = row.getLong(1)
        val cu = row.getArray(2)
        var dot = 0L
        var i = 0
        while (i < d) { dot += qsub.getLong(i) * cu.getLong(i); i += 1 }
        var ss = 0L
        i = 0
        while (i < d) { val x = cu.getLong(i); ss += x * x; i += 1 }
        val obj = 2L * dot - ss
        if (!any || obj > bestObj || (obj == bestObj && id < bestId)) {
          bestObj = obj; bestId = id; any = true
        }
      }
      c += 1
    }
    if (!any) null else InternalRow(bestId, bestObj)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, sv, cs) => {
      val k = ctx.freshName("k")
      val d = ctx.freshName("d")
      val c = ctx.freshName("c")
      val row = ctx.freshName("row")
      val id = ctx.freshName("id")
      val cu = ctx.freshName("cu")
      val m = ctx.freshName("m")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val ss = ctx.freshName("ss")
      val x = ctx.freshName("x")
      val obj = ctx.freshName("obj")
      val i = ctx.freshName("i")
      val bestId = ctx.freshName("bestId")
      val bestObj = ctx.freshName("bestObj")
      val any = ctx.freshName("any")
      s"""
         |int $k = $cs.numElements();
         |int $d = $q.numElements();
         |long $bestId = Long.MAX_VALUE;
         |long $bestObj = Long.MIN_VALUE;
         |boolean $any = false;
         |for (int $c = 0; $c < $k; $c++) {
         |  org.apache.spark.sql.catalyst.InternalRow $row = $cs.getStruct($c, 3);
         |  if ($row.getInt(0) == $sv && $row.getArray(2).numElements() == $d) {
         |    long $id = $row.getLong(1);
         |    org.apache.spark.sql.catalyst.util.ArrayData $cu = $row.getArray(2);
         |    long $dot = 0L;
         |    for (int $i = 0; $i < $d; $i++) {
         |      $dot += $q.getLong($i) * $cu.getLong($i);
         |    }
         |    long $ss = 0L;
         |    for (int $i = 0; $i < $d; $i++) {
         |      long $x = $cu.getLong($i); $ss += $x * $x;
         |    }
         |    long $obj = 2L * $dot - $ss;
         |    if (!$any || $obj > $bestObj || ($obj == $bestObj && $id < $bestId)) {
         |      $bestObj = $obj; $bestId = $id; $any = true;
         |    }
         |  }
         |}
         |if (!$any) { ${ev.isNull} = true; }
         |else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[] { java.lang.Long.valueOf($bestId), java.lang.Long.valueOf($bestObj) });
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): PqArgmaxCode =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PqArgmaxCode {
  val outType: StructType = StructType(Seq(
    StructField("code", LongType, nullable = false),
    StructField("qobj", LongType, nullable = false)))
}

/** Fused own-cell / nearest-other-cell squared L2 distances — the
  * silhouette kernel: given a quantized vector, its assigned cell, and
  * the broadcast centroid table, return (a2, b2) where a2 is the exact
  * int64 ‖qvec − qcent(cell)‖² (NULL when the assigned cell is missing
  * from the table) and b2 = min over OTHER cells (NULL when there is no
  * other cell — the k-effectively-1 exclusion).
  *
  * Replaces (bit-identically, ExtSpec-pinned):
  * {{{
  *   dists = transform(cents, c -> (c.cidx, Σ(x−y)²))
  *   a2 = element_at(filter(dists, d -> d.cell2 = cell), 1).d2
  *   b2 = array_min(transform(filter(dists, d -> d.cell2 != cell), d -> d.d2))
  * }}}
  * The HOF form materializes the k-struct dists array per row plus two
  * filtered copies; this is one primitive loop, no allocation.
  */
case class VecCellL2(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with Serializable {

  override def dataType: DataType = VecCellL2.outType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val okVec = first.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    val okCell = second.dataType == LongType
    val okCents = third.dataType match {
      case ArrayType(StructType(Array(a, b)), _) =>
        a.dataType == LongType && (b.dataType match {
          case ArrayType(LongType, _) => true
          case _ => false
        })
      case _ => false
    }
    if (okVec && okCell && okCents)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "vec_cell_l2 expects (array<bigint>, bigint, array<struct<bigint,array<bigint>>>), " +
          s"got ${first.dataType} / ${second.dataType} / ${third.dataType}")
  }

  override def nullSafeEval(v: Any, cellV: Any, cs: Any): Any = {
    val qvec = v.asInstanceOf[ArrayData]
    val cell = cellV.asInstanceOf[Long]
    val cents = cs.asInstanceOf[ArrayData]
    val k = cents.numElements()
    val d = qvec.numElements()
    var a2 = 0L
    var hasA = false
    var b2 = 0L
    var hasB = false
    var c = 0
    while (c < k) {
      val row = cents.getStruct(c, 2)
      val id = row.getLong(0)
      val cu = row.getArray(1)
      // mismatch contract as in [[VecArgmaxQCell]]: a wrong-dimension
      // centroid is excluded, never scored on a truncated distance
      if (cu.numElements() == d) {
        var acc = 0L
        var i = 0
        while (i < d) {
          val diff = qvec.getLong(i) - cu.getLong(i)
          acc += diff * diff
          i += 1
        }
        if (id == cell) {
          if (!hasA) { a2 = acc; hasA = true }
        } else if (!hasB || acc < b2) { b2 = acc; hasB = true }
      }
      c += 1
    }
    InternalRow(
      if (hasA) a2 else null,
      if (hasB) b2 else null)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cellV, cs) => {
      val k = ctx.freshName("k")
      val d = ctx.freshName("d")
      val c = ctx.freshName("c")
      val row = ctx.freshName("row")
      val id = ctx.freshName("id")
      val cu = ctx.freshName("cu")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val diff = ctx.freshName("diff")
      val i = ctx.freshName("i")
      val a2 = ctx.freshName("a2")
      val hasA = ctx.freshName("hasA")
      val b2 = ctx.freshName("b2")
      val hasB = ctx.freshName("hasB")
      s"""
         |int $k = $cs.numElements();
         |int $d = $v.numElements();
         |long $a2 = 0L; boolean $hasA = false;
         |long $b2 = 0L; boolean $hasB = false;
         |for (int $c = 0; $c < $k; $c++) {
         |  org.apache.spark.sql.catalyst.InternalRow $row = $cs.getStruct($c, 2);
         |  long $id = $row.getLong(0);
         |  org.apache.spark.sql.catalyst.util.ArrayData $cu = $row.getArray(1);
         |  if ($cu.numElements() == $d) {
         |    long $acc = 0L;
         |    for (int $i = 0; $i < $d; $i++) {
         |      long $diff = $v.getLong($i) - $cu.getLong($i);
         |      $acc += $diff * $diff;
         |    }
         |    if ($id == $cellV) {
         |      if (!$hasA) { $a2 = $acc; $hasA = true; }
         |    } else if (!$hasB || $acc < $b2) { $b2 = $acc; $hasB = true; }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[] {
         |    $hasA ? (Object) java.lang.Long.valueOf($a2) : null,
         |    $hasB ? (Object) java.lang.Long.valueOf($b2) : null });
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): VecCellL2 =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object VecCellL2 {
  val outType: StructType = StructType(Seq(
    StructField("a2", LongType, nullable = true),
    StructField("b2", LongType, nullable = true)))
}

/** Fused unit-normalize + micro-quantize: the `qvec` kernel of the whole
  * integer ANN family, one codegen loop instead of three interpreted
  * passes.
  *
  * Replaces (bit-identically, ExtSpec-pinned):
  * {{{
  *   _norm = sqrt(vec_dot(embedding, embedding))          // codegen'd
  *   unit  = when(_norm > 0D, transform(embedding, x -> cast(x as double) / _norm))
  *   qvec  = transform(unit, x -> cast(floor(x * 1000000.0 + 0.5) as bigint))
  * }}}
  * The HOF form evaluates the norm dot twice (the `_norm > 0` guard and
  * the division both reference it) and allocates two interpreted
  * transform outputs per row. Semantics preserved exactly:
  *   - embedding NULL → NULL;
  *   - norm not > 0 (zero vector, or NaN from a NaN element) → NULL
  *     (the `when` guard's else-NULL, which the outer transform passes
  *     through);
  *   - per element: floor((x / norm) · 1e6 + 0.5) with the same double
  *     op order, cast to long with Scala/Java truncation (identical to
  *     non-ANSI Cast for the integral floor output);
  *   - a NULL element quantizes to a NULL element (transform's per-
  *     element null pass-through).
  */
case class VecQuantizeUnit(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_quantize_unit expects array<float|double>, got $t")
    }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    def elem(i: Int): Double =
      if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i)) { val v = elem(i); acc += v * v }
      else return quantNullAware(x, n)
      i += 1
    }
    val norm = math.sqrt(acc)
    if (!(norm > 0.0)) return null
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      out(i) = java.lang.Long.valueOf(
        math.floor(elem(i) / norm * 1000000.0 + 0.5).toLong)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  // slow path for arrays carrying NULL elements (never hit by the
  // embeddings fixture; kept so the expression matches the HOF chain on
  // ANY input): the norm dot treats a NULL element as a NULL product,
  // which poisons vec_dot's aggregate... but the HOF chain computes the
  // norm via the codegen'd vec_dot, which SKIPS nothing — a NULL element
  // makes `_norm` undefined only through getDouble-on-null semantics.
  // The reference chain (`vec_norm` = sqrt(vec_dot)) reads a NULL slot
  // as 0.0 (ArrayData.getDouble on a null slot returns the default), so
  // mirror exactly that: norm over null-as-0.0, then per-element NULL
  // pass-through in the output.
  private def quantNullAware(x: ArrayData, n: Int): Any = {
    def elem(i: Int): Double =
      if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i)) { val v = elem(i); acc += v * v }
      i += 1
    }
    val norm = math.sqrt(acc)
    if (!(norm > 0.0)) return null
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      out(i) =
        if (x.isNullAt(i)) null
        else java.lang.Long.valueOf(
          math.floor(elem(i) / norm * 1000000.0 + 0.5).toLong)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      val norm = ctx.freshName("norm")
      val out = ctx.freshName("out")
      val anyNull = ctx.freshName("anyNull")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |boolean $anyNull = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { $anyNull = true; }
         |  else { double $v = (double) $a.$get($i); $acc += $v * $v; }
         |}
         |double $norm = java.lang.Math.sqrt($acc);
         |if (!($norm > 0.0)) {
         |  ${ev.isNull} = true;
         |} else {
         |  Object[] $out = new Object[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$a.isNullAt($i)) {
         |      $out[$i] = java.lang.Long.valueOf((long) java.lang.Math.floor(
         |        ((double) $a.$get($i)) / $norm * 1000000.0 + 0.5));
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): VecQuantizeUnit =
    copy(child = newChild)
}

/** Banded Hamming distance: Σ bit_count(pᵢ ^ qᵢ) over two bigint arrays
  * (the four 16-bit dHash bands of the phash near-dup path — the per-
  * candidate-PAIR kernel of the quadratic-ish verify loop, the hottest
  * remaining interpreted site after the round-16 codegen campaign).
  *
  * Semantics mirror (ExtSpec-pinned bit-identical):
  * {{{
  *   aggregate(zip_with(p, q, (x, y) -> bit_count(x ^ y)),
  *             0, (acc, v) -> acc + v)
  * }}}
  *   - either array NULL → NULL;
  *   - length mismatch → NULL (zip_with pads the shorter side with NULL,
  *     bit_count(NULL ^ y) is NULL, and acc + NULL poisons the fold);
  *   - any NULL element → NULL (same poisoning);
  *   - bit_count yields INT and the fold starts at literal 0, so the
  *     result is IntegerType exactly like the HOF form.
  */
case class VecHammingBands(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_hamming_bands expects array<bigint>, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $acc = 0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecHammingBands =
    copy(left = newLeft, right = newRight)
}

/** Element-wise int64 subtraction — the IVF-PQ residual kernel
  * (qvec − coarse centroid), previously a per-row interpreted
  * `zip_with(a, b, (x, y) -> x - y)`.
  *
  * Semantics mirror zip_with exactly (ExtSpec-pinned bit-identical):
  *   - either array NULL → NULL;
  *   - output length = max(|a|, |b|); positions past the shorter side
  *     are NULL elements (zip_with's NULL padding makes x − NULL NULL);
  *   - a NULL element on either side → NULL element;
  *   - overflow wraps like non-ANSI LongType Subtract (Java semantics).
  */
case class VecSubLong(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_sub_long expects array<bigint>, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    val n = math.max(nx, ny)
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (i < nx && i < ny && !x.isNullAt(i) && !y.isNullAt(i))
        out(i) = java.lang.Long.valueOf(x.getLong(i) - y.getLong(i))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $n = java.lang.Math.max($nx, $ny);
         |Object[] $out = new Object[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($i < $nx && $i < $ny && !$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $out[$i] = java.lang.Long.valueOf($a.getLong($i) - $b.getLong($i));
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecSubLong =
    copy(left = newLeft, right = newRight)
}

object LongVecFunctions {
  /** Column API: exact int64 dot (see [[VecDotLong]]). */
  def vec_dot_long(a: Column, b: Column): Column =
    GraftShim.column(VecDotLong(GraftShim.expression(a), GraftShim.expression(b)))

  /** Column API: banded Hamming distance (see [[VecHammingBands]]). */
  def vec_hamming_bands(a: Column, b: Column): Column =
    GraftShim.column(VecHammingBands(GraftShim.expression(a), GraftShim.expression(b)))

  /** Column API: element-wise int64 subtraction (see [[VecSubLong]]). */
  def vec_sub_long(a: Column, b: Column): Column =
    GraftShim.column(VecSubLong(GraftShim.expression(a), GraftShim.expression(b)))

  /** Column API: fused integer nearest-centroid argmax (see
    * [[VecArgmaxQCell]]). */
  def vec_argmax_qcell(qvec: Column, cents: Column): Column =
    GraftShim.column(VecArgmaxQCell(
      GraftShim.expression(qvec), GraftShim.expression(cents)))

  /** Column API: fused PQ nearest-codeword argmax (see [[PqArgmaxCode]]). */
  def pq_argmax_code(qsub: Column, s: Column, cents: Column): Column =
    GraftShim.column(PqArgmaxCode(
      GraftShim.expression(qsub), GraftShim.expression(s), GraftShim.expression(cents)))

  /** Column API: fused unit-normalize + micro-quantize (see
    * [[VecQuantizeUnit]]). */
  def vec_quantize_unit(embedding: Column): Column =
    GraftShim.column(VecQuantizeUnit(GraftShim.expression(embedding)))

  /** Column API: fused silhouette distances (see [[VecCellL2]]). */
  def vec_cell_l2(qvec: Column, cell: Column, cents: Column): Column =
    GraftShim.column(VecCellL2(
      GraftShim.expression(qvec), GraftShim.expression(cell),
      GraftShim.expression(cents)))
}
