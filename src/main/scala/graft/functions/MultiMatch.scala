package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern matching (Aho & Corasick 1975, "Efficient
  * string matching: an aid to bibliographic search") as a compiled
  * expression — the dictionary scan every ingest pipeline needs
  * (blocklists, PII keyword screens, topic taggers) and Spark SQL lacks:
  * the built-in alternatives are P separate `contains`/`instr` scans
  * (re-reads the text per pattern) or one `rlike` alternation (Java
  * regex backtracking, non-linear on adversarial input, and it can't
  * COUNT occurrences). This automaton reads each text exactly once —
  * O(bytes + matches) whatever the dictionary size — and reports ALL
  * occurrences, overlapping included (every end position the automaton
  * passes), per pattern.
  *
  * Matching is over raw UTF-8 BYTES (the [[JaroWinkler]] convention):
  * identical to character matching on ASCII, and correct on multibyte
  * UTF-8 too because no UTF-8 sequence is a suffix of another code
  * point's encoding.
  *
  * The automaton is the classic dense form: byte-indexed goto table
  * flattened to one int array (state·256 + byte → state, fail
  * transitions PRE-RESOLVED during the BFS so the hot loop is one array
  * read per input byte, no fail chasing), plus the ε-closure of the
  * output function per state. Dense costs 1 KiB per trie node — the
  * right trade up to ~10⁵ dictionary bytes (a blocklist); a
  * million-entry gazetteer would swap in a double-array or bitmapped
  * transition encoding behind the same interface.
  *
  * Scale shape: the automaton builds ONCE on the driver (dictionary
  * size, not data size) and ships to executors inside the serialized
  * expression — a broadcast-sized constant; the scan is a pure
  * projection, zero exchanges.
  */
final class AcAutomaton(patterns: Array[Array[Byte]]) extends Serializable {
  require(patterns.nonEmpty, "AcAutomaton needs at least one pattern")
  require(patterns.forall(_.nonEmpty), "empty pattern")

  val nPatterns: Int = patterns.length

  // dense next table (nStates * 256) with fail links resolved, and the
  // fail-closed output function: pattern ids ending at each state
  private val (next: Array[Int], outs: Array[Array[Int]]) = {
    val cap = patterns.map(_.length).sum + 1
    val goto = Array.fill(cap * 256)(-1)
    val rawOut = Array.fill(cap)(List.empty[Int])
    var nStates = 1
    var p = 0
    while (p < nPatterns) {
      val pat = patterns(p)
      var s = 0
      var i = 0
      while (i < pat.length) {
        val b = pat(i) & 0xff
        if (goto(s * 256 + b) == -1) { goto(s * 256 + b) = nStates; nStates += 1 }
        s = goto(s * 256 + b)
        i += 1
      }
      rawOut(s) = p :: rawOut(s)
      p += 1
    }
    val fail = new Array[Int](nStates)
    val outList = rawOut.take(nStates)
    val queue = new java.util.ArrayDeque[Integer]()
    var b = 0
    while (b < 256) {
      val s = goto(b)
      if (s == -1) goto(b) = 0
      else { fail(s) = 0; queue.add(s) }
      b += 1
    }
    while (!queue.isEmpty) {
      val s = queue.poll().intValue()
      // fail-closure of outputs: everything the fail state reports, this
      // state reports too (the standard output-function union)
      outList(s) = outList(s) ::: outList(fail(s))
      var c = 0
      while (c < 256) {
        val t = goto(s * 256 + c)
        if (t == -1) goto(s * 256 + c) = goto(fail(s) * 256 + c)
        else { fail(t) = goto(fail(s) * 256 + c); queue.add(t) }
        c += 1
      }
    }
    (goto.take(nStates * 256), outList.map(_.toArray))
  }

  /** Occurrence count per pattern (ALL occurrences, overlapping
    * included), aligned with the constructor's pattern order. One pass
    * over the text bytes. */
  def countAll(text: UTF8String): GenericArrayData = {
    val counts = new Array[Long](nPatterns)
    val n = text.numBytes
    var s = 0
    var i = 0
    while (i < n) {
      s = next(s * 256 + (text.getByte(i) & 0xff))
      val o = outs(s)
      if (o.length > 0) {
        var j = 0
        while (j < o.length) { counts(o(j)) += 1L; j += 1 }
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  private val patLens: Array[Int] = patterns.map(_.length)

  /** The text with every byte covered by ANY match replaced by `mask`
    * (the union of all match spans — overlapping and nested matches
    * merge into one redacted run). Byte-level like [[countAll]]; the
    * replaced bytes are exactly a matched pattern's bytes, so a valid
    * UTF-8 input stays valid whenever patterns are whole code-point
    * sequences (always true for ASCII dictionaries). One automaton pass
    * plus one output pass.
    */
  def maskAll(text: UTF8String, mask: Byte): UTF8String = {
    val n = text.numBytes
    val bytes = text.getBytes
    val covered = new Array[Boolean](n)
    var any = false
    var s = 0
    var i = 0
    while (i < n) {
      s = next(s * 256 + (bytes(i) & 0xff))
      val o = outs(s)
      if (o.length > 0) {
        var j = 0
        while (j < o.length) {
          var p = i - patLens(o(j)) + 1
          while (p <= i) { covered(p) = true; p += 1 }
          j += 1
        }
        any = true
      }
      i += 1
    }
    if (!any) return text
    val out = new Array[Byte](n)
    i = 0
    while (i < n) { out(i) = if (covered(i)) mask else bytes(i); i += 1 }
    UTF8String.fromBytes(out)
  }
}

/** `multi_match_counts(text, patterns)`: per-pattern occurrence counts
  * of a FIXED dictionary in each text — array<bigint> aligned with the
  * dictionary order; see [[AcAutomaton]] for the pinned matching
  * contract (byte-level, all occurrences, overlapping included). The
  * dictionary is part of the expression, not a child: it is a plan-time
  * constant, so the automaton builds once and the scan stays inside
  * whole-stage codegen as a single static call per row.
  */
case class MultiMatchCounts(child: Expression, patterns: Seq[String])
    extends UnaryExpression with Serializable {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "multi_match_counts needs a non-empty dictionary of non-empty patterns")
  require(patterns.distinct.length == patterns.length,
    "multi_match_counts dictionary has duplicate patterns")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"multi_match_counts expects string, got $other")
  }

  @transient private lazy val automaton =
    new AcAutomaton(patterns.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray)

  override def nullSafeEval(input: Any): Any =
    automaton.countAll(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val auto = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[AcAutomaton].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $auto.countAll($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiMatchCounts =
    copy(child = newChild)
}

/** `multi_match_mask(text, patterns)`: the redaction half — every byte
  * covered by any dictionary match replaced by `'*'` (overlapping and
  * nested matches merge into one redacted run); see
  * [[AcAutomaton.maskAll]]. Same plan-time-constant dictionary and
  * single-pass contract as [[MultiMatchCounts]].
  */
case class MultiMatchMask(child: Expression, patterns: Seq[String])
    extends UnaryExpression with Serializable {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "multi_match_mask needs a non-empty dictionary of non-empty patterns")
  require(patterns.distinct.length == patterns.length,
    "multi_match_mask dictionary has duplicate patterns")

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"multi_match_mask expects string, got $other")
  }

  @transient private lazy val automaton =
    new AcAutomaton(patterns.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray)

  override def nullSafeEval(input: Any): Any =
    automaton.maskAll(input.asInstanceOf[UTF8String], '*'.toByte)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val auto = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[AcAutomaton].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $auto.maskAll($c, (byte) '*');")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiMatchMask =
    copy(child = newChild)
}

object MultiMatchFunctions {
  /** Column API: per-pattern occurrence counts (array<bigint>, dictionary
    * order) of `patterns` in `text`. */
  def multi_match_counts(text: Column, patterns: Seq[String]): Column =
    GraftShim.column(MultiMatchCounts(GraftShim.expression(text), patterns))

  /** Column API: `text` with every dictionary match masked by `'*'`. */
  def multi_match_mask(text: Column, patterns: Seq[String]): Column =
    GraftShim.column(MultiMatchMask(GraftShim.expression(text), patterns))
}
