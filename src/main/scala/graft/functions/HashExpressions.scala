package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-element 60-bit md5 prefix over an array of strings.
  *
  * Bit-identical to the SQL `transform(arr, s -> cast(conv(substring(
  * md5(s), 1, 15), 16, 10) as bigint))` the DuckDB oracle mirrors — the
  * first 15 hex chars of the md5 digest read as an unsigned number — but
  * evaluated as ONE compiled loop over the array instead of a per-element
  * interpreted lambda (`transform` bodies never enter whole-stage codegen;
  * on a token/shingle array every element pays interpreter dispatch plus a
  * hex-string round trip). Measured ~3× on the signature pipelines, which
  * hash every token of every document.
  */
case class Md5Long64Array(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = child.dataType match {
    case ArrayType(_, containsNull) => ArrayType(LongType, containsNull)
    case _ => ArrayType(LongType)
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"md5_long64_array expects array<string>, got $t")
  }

  override def nullSafeEval(a: Any): Any =
    HashUtil.md5Long64Array(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.HashUtil.md5Long64Array($a);")

  override protected def withNewChildInternal(newChild: Expression): Md5Long64Array =
    copy(child = newChild)
}

/** Distinct word 3-gram shingles of a token array, each mapped to its
  * 60-bit md5 prefix — the fused form of `shingleExpr` + md5-per-shingle.
  *
  * Semantics are `transform(array_distinct(3-grams), md5Long64)`:
  * 3-grams are `tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2]`, distinctness
  * is on the STRING (first occurrence kept, so a 60-bit hash collision
  * between distinct shingles still yields two elements, as the oracle's
  * string-level `list_distinct` does), fewer than 3 tokens yields an empty
  * array, and a null token nulls its shingles (concat semantics). The one
  * deliberate deviation: a null shingle (only possible when the token
  * array itself contains nulls, which `split` never produces) is emitted
  * at the END of the array rather than at its first-occurrence position —
  * every consumer here is order-insensitive (explode, min, count). One
  * compiled loop replaces four interpreted higher-order passes
  * (sequence → transform/concat → array_distinct → transform/md5) plus
  * their intermediate arrays.
  */
case class Shingles3Hashed(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"shingles3_hashed expects array<string>, got $t")
  }

  override def nullSafeEval(a: Any): Any =
    HashUtil.shingles3Hashed(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.HashUtil.shingles3Hashed($a);")

  override protected def withNewChildInternal(newChild: Expression): Shingles3Hashed =
    copy(child = newChild)
}

object HashUtil {
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(s), as the SQL hex-prefix form reads them:
    * 15 hex chars = bytes 0..6 fully plus the high nibble of byte 7.
    */
  def md5Long64(s: UTF8String): Long = {
    val md = digest.get()
    md.reset()
    val b = md.digest(s.getBytes)
    var v = 0L
    var k = 0
    while (k < 7) { v = (v << 8) | (b(k) & 0xffL); k += 1 }
    (v << 4) | ((b(7) & 0xffL) >>> 4)
  }

  private val space = UTF8String.fromString(" ")

  def shingles3Hashed(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    if (n < 3) return new GenericArrayData(new Array[Any](0))
    // distinct on the shingle STRING, first occurrence first — exactly
    // array_distinct's contract, so string-distinct survives even a
    // (cosmically unlikely) 60-bit hash collision
    val seen = new java.util.LinkedHashSet[UTF8String](n * 2)
    var hasNull = false
    var i = 0
    while (i <= n - 3) {
      if (toks.isNullAt(i) || toks.isNullAt(i + 1) || toks.isNullAt(i + 2)) {
        hasNull = true // concat(null, ...) is null; array_distinct keeps ONE null
      } else {
        seen.add(UTF8String.concat(
          toks.getUTF8String(i), space,
          toks.getUTF8String(i + 1), space,
          toks.getUTF8String(i + 2)))
      }
      i += 1
    }
    val out = new Array[Any](seen.size() + (if (hasNull) 1 else 0))
    var j = 0
    val it = seen.iterator()
    while (it.hasNext) { out(j) = md5Long64(it.next()); j += 1 }
    new GenericArrayData(out) // trailing slot stays null when hasNull
  }

  def md5Long64Array(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) out(i) = md5Long64(arr.getUTF8String(i))
      i += 1
    }
    new GenericArrayData(out)
  }
}

object HashFunctions {
  /** Column API: 60-bit md5 prefix per element of an array<string>. */
  def md5_long64_array(a: Column): Column =
    GraftShim.column(Md5Long64Array(GraftShim.expression(a)))

  /** Column API: hashed distinct word 3-gram shingles of a token array. */
  def shingles3_hashed(toks: Column): Column =
    GraftShim.column(Shingles3Hashed(GraftShim.expression(toks)))
}
