package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, DayTimeIntervalType, IntegerType, LongType, ShortType, TimestampNTZType, TimestampType}

/** Optimizer rule: rewrite a purely non-equi range join into a banded
  * HASH join.
  *
  * Spark OSS plans `a JOIN b ON x >= lo AND x < lo + C` (no equi term) as
  * a nested loop over |a|·|b| pairs — unrunnable at scale. But the window
  * width C is right there in the predicate, so the rule quantizes both
  * sides into width-C bands and joins on the band id: a row with
  * `x ∈ [lo, lo+C)` can only sit in `band(lo)` or `band(lo)+1`, so the
  * build side is Expand-ed into those two band rows and the join becomes
  * `p_band = b_band AND <original condition>` — an equi join with the
  * original range predicate as residual. Candidates per band pair are a
  * superset of the matches; the residual keeps the result EXACTLY equal
  * to the naive join.
  *
  * Scope (soundness before generality):
  *  - inner joins whose condition has NO equi conjunct between the sides
  *    (if one exists, Catalyst already hash-joins on it);
  *  - band key and bound of integral or timestamp type (exact arithmetic
  *    — a double band computed with rounded division could misplace
  *    boundary rows). Timestamps band on their epoch micros; NTZ values
  *    go through a UTC cast, a linear (DST-free) exact mapping;
  *  - `x >= lo AND x < lo + C` / `x <= lo + C` with positive literal C —
  *    integral C for numeric keys, a day-time INTERVAL for timestamps.
  *
  * Integer truncating division is monotone and advances at most 1 per +C
  * shift (for C > 0), so offsets {0, 1} cover every match for either
  * rounding convention and any sign of x.
  *
  * This is the same decomposition Databricks' range-join optimization and
  * DuckDB's IEJoin apply; here it is an `injectOptimizerRule` extension
  * ([[graft.functions.GraftExtensions]]).
  */
object BandedRangeJoinRule extends Rule[LogicalPlan] {

  private def isBandable(e: Expression): Boolean = e.dataType match {
    case LongType | IntegerType | ShortType | ByteType => true
    case TimestampType | TimestampNTZType => true
    case _ => false
  }

  private def litLong(l: Literal): Option[Long] = (l.dataType, l.value) match {
    case (_: DayTimeIntervalType, i: java.lang.Long) => Some(i) // micros
    case (_, i: java.lang.Integer) => Some(i.longValue)
    case (_, i: java.lang.Long) => Some(i)
    case (_, i: java.lang.Short) => Some(i.longValue)
    case (_, i: java.lang.Byte) => Some(i.longValue)
    case _ => None
  }

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConj(a) ++ splitConj(b)
    case x => Seq(x)
  }

  private def sideOf(e: Expression, l: LogicalPlan, r: LogicalPlan): Option[Boolean] =
    if (e.references.nonEmpty && e.references.subsetOf(l.outputSet)) Some(true)
    else if (e.references.nonEmpty && e.references.subsetOf(r.outputSet)) Some(false)
    else None

  private def hasEquiBetween(cs: Seq[Expression], l: LogicalPlan, r: LogicalPlan): Boolean =
    cs.exists {
      case EqualTo(a, b) =>
        (for (sa <- sideOf(a, l, r); sb <- sideOf(b, l, r)) yield sa != sb).getOrElse(false)
      case EqualNullSafe(a, b) =>
        (for (sa <- sideOf(a, l, r); sb <- sideOf(b, l, r)) yield sa != sb).getOrElse(false)
      case _ => false
    }

  /** (x, lo, bandWidth, startShift, xOnLeft) for the first usable range
    * pattern. The window is `x ∈ [lo + s1, lo + s2 (+slack))`; bandWidth
    * is its span, startShift = s1 (0 for the plain one-sided form,
    * negative for symmetric ±C proximity windows).
    */
  private def findRange(
      cs: Seq[Expression],
      l: LogicalPlan,
      r: LogicalPlan): Option[(Expression, Expression, Long, Long, Boolean)] = {
    // lower bound: x >= lo + s1  (s1 = 0 | +c | -c)
    val lowers: Seq[(Expression, Expression, Option[Long])] = cs.collect {
      case GreaterThanOrEqual(x, Add(lo, lit: Literal, _)) => (x, lo, litLong(lit))
      case GreaterThanOrEqual(x, Subtract(lo, lit: Literal, _)) => (x, lo, litLong(lit).map(-_))
      case GreaterThanOrEqual(x, TimestampAddInterval(lo, lit: Literal, _)) => (x, lo, litLong(lit))
      case LessThanOrEqual(Add(lo, lit: Literal, _), x) => (x, lo, litLong(lit))
      case LessThanOrEqual(Subtract(lo, lit: Literal, _), x) => (x, lo, litLong(lit).map(-_))
      case LessThanOrEqual(TimestampAddInterval(lo, lit: Literal, _), x) => (x, lo, litLong(lit))
      case GreaterThanOrEqual(x, lo) => (x, lo, Some(0L))
      case LessThanOrEqual(lo, x) => (x, lo, Some(0L))
    }
    // upper bound: x < lo + s2 (+slack for <=)
    val uppers: Seq[(Expression, Expression, Option[Long], Long)] = cs.collect {
      case LessThan(x, Add(lo, lit: Literal, _)) => (x, lo, litLong(lit), 0L)
      case LessThanOrEqual(x, Add(lo, lit: Literal, _)) => (x, lo, litLong(lit), 1L)
      case GreaterThan(Add(lo, lit: Literal, _), x) => (x, lo, litLong(lit), 0L)
      case GreaterThanOrEqual(Add(lo, lit: Literal, _), x) => (x, lo, litLong(lit), 1L)
      case LessThan(x, TimestampAddInterval(lo, lit: Literal, _)) => (x, lo, litLong(lit), 0L)
      case LessThanOrEqual(x, TimestampAddInterval(lo, lit: Literal, _)) => (x, lo, litLong(lit), 1L)
      case GreaterThan(TimestampAddInterval(lo, lit: Literal, _), x) => (x, lo, litLong(lit), 0L)
      case GreaterThanOrEqual(TimestampAddInterval(lo, lit: Literal, _), x) => (x, lo, litLong(lit), 1L)
    }
    (for {
      (x1, lo1, s1Opt) <- lowers.iterator
      (x2, lo2, s2Opt, slack) <- uppers.iterator
      if x1.semanticEquals(x2) && lo1.semanticEquals(lo2)
      if isBandable(x1) && isBandable(lo1)
      s1 <- s1Opt
      s2 <- s2Opt // for DayTimeIntervalType the literal value IS micros
      width = s2 + slack - s1
      if width > 0
      xSide <- sideOf(x1, l, r)
      loSide <- sideOf(lo1, l, r)
      if xSide != loSide
    } yield (x1, lo1, width, s1, xSide)).nextOption()
  }

  /** band(e + shift) = (long(e) + shift) div width — pure long arithmetic
    * even for timestamps (epoch micros), so the band is exact.
    */
  private def bandOf(e: Expression, width: Long, shift: Long): Expression = {
    val asLong = e.dataType match {
      case TimestampType => UnixMicros(e)
      case TimestampNTZType => UnixMicros(Cast(e, TimestampType, Some("UTC")))
      case _ => Cast(e, LongType)
    }
    val shifted = if (shift == 0L) asLong else Add(asLong, Literal(shift))
    Cast(IntegralDivide(shifted, Literal(width)), LongType)
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val cs = splitConj(cond)
      if (hasEquiBetween(cs, left, right)) j
      else findRange(cs, left, right) match {
        case None => j
        case Some((x, lo, width, startShift, xOnLeft)) =>
          val (probe, build) = if (xOnLeft) (left, right) else (right, left)
          // probe side: one extra projected column, its band id
          val pAlias = Alias(bandOf(x, width, 0L), "_graft_pband")()
          val probe2 = Project(probe.output :+ pAlias, probe)
          // build side: Expand replicates each row into band and band+1,
          // banding from the window START (lo + startShift)
          val bAttr = AttributeReference("_graft_bband", LongType, nullable = true)()
          val bandBase = bandOf(lo, width, startShift)
          val build2 = Expand(
            Seq(build.output :+ bandBase,
              build.output :+ Add(bandBase, Literal(1L))),
            build.output :+ bAttr,
            build)
          val newCond = And(cond, EqualTo(pAlias.toAttribute, bAttr))
          val (nl, nr) = if (xOnLeft) (probe2, build2) else (build2, probe2)
          Project(j.output, Join(nl, nr, Inner, Some(newCond), hint))
      }
  }
}
