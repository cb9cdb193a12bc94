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
}
