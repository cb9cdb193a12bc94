package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range join — the scalable form of a non-equi interval join.
  *
  * A plain `a.join(b, a.t BETWEEN b.lo AND b.hi)` has no equi term, so
  * Catalyst can only plan a nested-loop over |a|·|b| pairs — unrunnable at
  * scale. The band trick makes it a HASH join: quantize the range key into
  * fixed-width bands; a probe row in band k can only match build rows in
  * bands {k, k+1, …} that its window spans, so joining on the band id (one
  * equi-join per band offset, unioned) plus the exact residual predicate
  * is equivalent and shuffles on band keys. With window ≤ band width, two
  * offsets (k and k+1) cover every match.
  *
  * This is the same decomposition Databricks' range-join optimization and
  * DuckDB's IEJoin perform internally; Spark OSS has no native rule, so the
  * engine provides it as a composition.
  */
object RangeJoin {

  /** Count rows of `probe` whose `tCol` falls in [anchor, anchor+days) of
    * each `build` row, via band = epoch_day / days. Returns `build`'s key
    * columns + `n_in_range`.
    *
    * @param days window length in days; also the band width, so exactly
    *             two band offsets cover any window placement
    */
  def countWithinDays(
      build: DataFrame,
      buildKey: Column,
      anchorCol: Column,
      probe: DataFrame,
      tCol: Column,
      days: Int): DataFrame = {
    val bandOf: Column => Column = c => floor(unix_micros(c.cast("timestamp"))
      / (days.toLong * 86400L * 1000000L)).cast("long")
    val b = build.select(buildKey.as("_k"), anchorCol.as("_lo"))
      .withColumn("_band", bandOf(col("_lo")))
    // Pre-aggregate the probe side to (distinct t, weight) BEFORE the
    // join: for day-grained timestamps this collapses the probe from
    // O(rows) to O(days) regardless of SF — the join then touches weights,
    // not rows. Degenerates gracefully when t is high-cardinality.
    val p = probe.select(tCol.as("_t"))
      .groupBy(col("_t")).agg(count(lit(1)).as("_w"))
      .withColumn("_pband", bandOf(col("_t")))
    // two equi-joins on band id (offset 0 and +1), exact residual filter
    val matches = Seq(0, 1).map { off =>
      b.join(p, col("_pband") === col("_band") + off &&
          col("_t") >= col("_lo") &&
          col("_t") < col("_lo") + expr(s"interval $days days"))
        .select(col("_k"), col("_w"))
    }.reduce(_ unionAll _)
    // left join back so build rows with zero matches keep a 0 count
    val counts = matches.groupBy(col("_k")).agg(sum(col("_w")).as("_n"))
    b.select(col("_k"))
      .join(counts, Seq("_k"), "left")
      .select(col("_k"), coalesce(col("_n"), lit(0L)).as("n_in_range"))
  }

  /** Day-grained fast form of [[countWithinDays]]: counts probe rows whose
    * DAY falls in [day(anchor), day(anchor)+days). Equal to the banded
    * form whenever both columns are day-grained (DateType, or timestamps
    * at midnight — the TPC-H shape); NOT equivalent for intra-day
    * timestamps, which is why the banded general form stays.
    *
    * Why it exists (r15 verdict: steepest x10 curve in the suite): the
    * banded form materializes ~days·|build| match rows, aggregates them
    * by build key, and left-joins back — three |build|-scale exchanges.
    * But with day-grained keys the answer for an anchor at day d is a
    * pure function of d: Σ w(t) over the day range [d, d+days).
    * So: pre-aggregate the probe to per-day weights (map-side combine,
    * O(days) rows), explode each weighted day onto the ≤`days` anchor
    * days it contributes to, sum per anchor day, and BROADCAST the
    * O(days) result: the build side streams through one broadcast hash
    * join with zero exchanges, zero |build|-scale aggregates, and no
    * join-back. Measured at x10: 5.9 s banded → sub-second.
    */
  def countWithinDaysDaily(
      build: DataFrame,
      buildKey: Column,
      anchorCol: Column,
      probe: DataFrame,
      tCol: Column,
      days: Int): DataFrame = {
    require(days >= 1, s"days must be >= 1, got $days")
    val daily = probe.select(to_date(tCol).as("_t"))
      .where(col("_t").isNotNull)
      .groupBy(col("_t")).agg(count(lit(1)).as("_w"))
    // Each per-day weight (t, w) contributes to every anchor day in
    // (t−days, t]: explode the O(days) daily frame onto those anchor
    // days and sum — equivalent to the previous dense-grid windowed sum
    // (anchor days with NO weighted day in range simply have no row, and
    // the left join's coalesce maps absent to 0 exactly as it mapped the
    // grid's zero rows), but with no unpartitioned Window at all. That
    // window ran on the bounded O(days) grid — scale-safe — yet flooded
    // every driver log with WindowExec single-partition warnings (the
    // round-16 bench tail was ~100% this warning), burying real ones.
    val ranged = daily
      .select(explode(sequence(
        date_sub(col("_t"), days - 1), col("_t"))).as("_d"), col("_w"))
      .groupBy(col("_d")).agg(sum(col("_w")).as("_n"))
    build.select(buildKey.as("_k"), to_date(anchorCol).as("_lo"))
      .join(broadcast(ranged), col("_lo") === col("_d"), "left")
      .select(col("_k"), coalesce(col("_n"), lit(0L)).as("n_in_range"))
  }
}
