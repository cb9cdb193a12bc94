package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a compiled expression.
  *
  * Spark SQL has no normalization builtin, and the alternative seams are
  * worse: a Scala UDF de-optimizes the whole projection, and mapPartitions
  * drops out of columnar processing for one string function. The JDK's
  * `java.text.Normalizer` is the reference NFC implementation (same
  * Unicode tables ICU feeds DuckDB's `nfc_normalize`, which the oracle
  * uses), so the expression stays engine-portable.
  *
  * The fast path matters at corpus scale: real text is overwhelmingly
  * already NFC, and `Normalizer.isNormalized` is a scan without
  * allocation — only the rare decomposed string pays the rebuild.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"nfc_normalize expects string, got $t")
  }

  override def nullSafeEval(s: Any): Any =
    TextUtil.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TextUtil.nfc($s);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object TextUtil {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

object TextFunctions {
  /** Column API: Unicode NFC normalization of a string column. */
  def nfc_normalize(s: Column): Column =
    GraftShim.column(NfcNormalize(GraftShim.expression(s)))
}
