package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expression for the dot product of two numeric arrays
  * (float or double elements), accumulating in double precision,
  * left-to-right — the exact order the DuckDB oracle's `list_sum .
  * list_transform` uses, and the exact semantics of the higher-order
  * `aggregate(zip_with(...))` formulation it replaces.
  *
  * Why an Expression and not the higher-order built-ins: `aggregate` /
  * `zip_with` evaluate their lambda per element through the interpreter —
  * on a 2M-pair self-join over 64-dim vectors that is ~256M interpreted
  * lambda calls. This expression generates a tight primitive loop inside
  * whole-stage codegen: no virtual calls, no boxing, no per-element
  * allocation.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) |
           ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot expects array<float|double|bigint>, got ${left.dataType} / ${right.dataType}")
  }

  // bigint elements widen to double exactly like Spark's own
  // long*double Multiply (cast the long operand, multiply in double) —
  // so vec_dot(qvec, <double literal>) is bit-identical to the
  // `aggregate(zip_with(qvec, arr, (x, w) -> x * w), 0D, ...)` HOF form
  private def getter(e: Expression): String = e.dataType match {
    case ArrayType(FloatType, _) => "getFloat"
    case ArrayType(LongType, _) => "getLong"
    case _ => "getDouble"
  }

  // The LONG path poisons on a NULL element (result NULL) exactly like
  // the HOF form it replaces — `x * w` with x NULL is NULL and the 0D
  // fold propagates it (r16 ADVICE: getLong on a null slot silently
  // reads 0, which would score a partial dot; vec_quantize_unit CAN
  // emit per-element NULLs). The float/double path keeps its historical
  // null-as-0.0 read: [[VecQuantizeUnit]]'s null-aware norm is pinned to
  // exactly that semantics and the embeddings fixture never exercises it.
  private def nullPoisons: Boolean =
    left.dataType == ArrayType(LongType, containsNull = true) ||
      left.dataType == ArrayType(LongType, containsNull = false) ||
      right.dataType == ArrayType(LongType, containsNull = true) ||
      right.dataType == ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = super.nullable || nullPoisons

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lg = getter(left)
    val rg = getter(right)
    def elem(d: ArrayData, g: String, i: Int): Double = g match {
      case "getFloat" => d.getFloat(i).toDouble
      case "getLong" => d.getLong(i).toDouble
      case _ => d.getDouble(i)
    }
    val poison = nullPoisons
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (poison && (x.isNullAt(i) || y.isNullAt(i))) return null
      acc += elem(x, lg, i) * elem(y, rg, i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = getter(left)
    val rGet = getter(right)
    val poison = nullPoisons
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val nullCheck =
        if (poison)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $acc += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
         |}
         |if (!${ev.isNull}) ${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Column API: dot product in double precision. */
  def vec_dot(a: Column, b: Column): Column =
    GraftShim.column(VecDot(GraftShim.expression(a), GraftShim.expression(b)))

  /** Column API: L2 norm. */
  def vec_norm(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(vec_dot(a, a))

  /** Make `vec_dot` available to SQL text in an existing session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VecDot(exprs.head, exprs(1)), "built-in")
}

/** `spark.sql.extensions`-style registration for users who configure the
  * session from the outside:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("vec_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[VecDot].getName, "vec_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VecDot(exprs.head, exprs(1))))
    // Spark's Bloom expressions exist but are registered only in the
    // internal runtime-filter registry — surface them to SQL text so the
    // screen-then-verify dedup pattern (ext/Dedup.bloomScreenDedup) is
    // writable as plain SQL: build with graft_bloom_agg(hash[, items,
    // bits]), probe with graft_might_contain((select blob...), hash).
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_bloom_agg"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => exprs match {
        case Seq(c) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c)
        case Seq(c, n) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c, n)
        case Seq(c, n, b) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c, n, b)
        case _ => throw new IllegalArgumentException(
          s"graft_bloom_agg expects 1-3 arguments, got ${exprs.size}")
      }))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_might_contain"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_might_contain"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          exprs.head, exprs(1))))
    // the compiled per-element 60-bit md5 prefix (HashExpressions), as
    // SQL text — so expr-string pipelines (classifierScoreSql, the
    // streaming curation twin) can hoist their per-token md5 out of
    // interpreted aggregate() lambdas into the compiled array loop
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("md5_long64_array"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[Md5Long64Array].getName, "md5_long64_array"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Md5Long64Array(exprs.head)))
    // non-equi range joins -> banded hash joins (see BandedRangeJoinRule)
    e.injectOptimizerRule(_ => graft.plans.BandedRangeJoinRule)
  }
}
