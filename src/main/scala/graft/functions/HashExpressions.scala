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
}
