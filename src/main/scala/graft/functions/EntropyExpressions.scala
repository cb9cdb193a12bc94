package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled kernel for [[graft.ext.Classify.charEntropy]]'s per-document
  * character histogram.
  *
  * Semantics are EXACTLY the SQL formulation it replaces (the DuckDB
  * oracle is unchanged; AuditSpec pins row-level parity against the
  * explode form): one count per CODE POINT of the text — the unit
  * `substring(text, i, 1)` for i in 1..`length(text)` yields in both
  * engines — folded to the three integers the entropy surrogate needs
  * (total count n, distinct code points, Σ c·⌊log2 c⌋).
  *
  * The SQL shape materialized one ROW per character (explode of a
  * position sequence), then shuffled the (doc, char) stream into two
  * aggregations — linear in corpus BYTES on the exchange. This kernel
  * keeps the histogram inside one compiled projection pass per
  * document: no character rows exist, nothing about the histogram
  * crosses the wire (the LmHash discipline; char_entropy measured
  * 26.7 s at 100× in the explode form — all exchange).
  */
object CharEntropy {

  /** `length(bin(c)) - 1`: floor(log2 c) for c > 0; 0 at c = 0. */
  private def mag(c: Long): Int =
    if (c <= 0L) 0 else 63 - java.lang.Long.numberOfLeadingZeros(c)

  /** struct<n, distinct_chars, clog> of a document, or null for the
    * empty string (the SQL form's `length(text) > 0` filter contract —
    * an empty doc has no distribution).
    */
  def stats(text: UTF8String): InternalRow = {
    val s = text.toString
    if (s.isEmpty) return null
    val counts = new java.util.HashMap[Integer, Array[Long]]()
    var i = 0
    var n = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      n += 1L
      val slot = counts.get(cp)
      if (slot == null) counts.put(cp, Array(1L)) else slot(0) += 1L
    }
    var clog = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0)
      clog += c * mag(c)
    }
    new GenericInternalRow(Array[Any](n, counts.size.toLong, clog))
  }
}

/** struct<n,distinct_chars,clog> of a document's code-point histogram;
  * null for empty strings (see [[CharEntropy.stats]]).
  */
case class CharEntropyStats(child: Expression)
    extends UnaryExpression with Serializable {

  override def nullable: Boolean = true

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("distinct_chars", LongType, nullable = false),
    StructField("clog", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"char_entropy_stats expects string, got $t")
  }

  override def nullSafeEval(t: Any): Any =
    CharEntropy.stats(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => s"""
      |${ev.value} = graft.functions.CharEntropy.stats($t);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): CharEntropyStats =
    copy(child = newChild)
}

object EntropyFunctions {
  /** Column API: per-document code-point histogram summary. */
  def char_entropy_stats(text: Column): Column =
    GraftShim.column(CharEntropyStats(GraftShim.expression(text)))
}
