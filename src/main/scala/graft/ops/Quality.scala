package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation — the constraint-report shape
  * (dbt tests / Great Expectations / Deequ) every ingest boundary needs:
  * assert properties of a table, get back one small row per rule with
  * exact violation counts, and gate the pipeline on `pass`.
  *
  * Scale shape: every SCALAR rule (not-null, range, regex) folds into
  * ONE shared aggregate pass — conditional sums, map-side combined, so
  * the table scans once however many scalar rules there are. `Unique`
  * is one map-side-combined groupBy on its key (the exact duplicate
  * count, not an approximation); `RefIntegrity` is one anti-join whose
  * dimension side broadcasts when small. Each non-scalar rule is its
  * own bounded job; the report union is a handful of one-row frames.
  */
object Quality {

  sealed trait DqRule
  /** `col` must be non-null. */
  final case class NotNull(col: String) extends DqRule
  /** `col` must lie in [lo, hi] (nulls are NOT violations here —
    * compose with [[NotNull]] to also forbid them; a rule should test
    * one property). */
  final case class InRange(col: String, lo: Double, hi: Double) extends DqRule
  /** `col` must fully match `regex` (nulls pass, as with [[InRange]]).
    * Stick to constructs Java regex and RE2 share (the piiScrub
    * portability discipline) if the report must be oracle-comparable. */
  final case class Matches(col: String, regex: String) extends DqRule
  /** The key must be unique; violations = rows in excess of one per
    * key (so a key seen 3× contributes 2). */
  final case class Unique(cols: Seq[String]) extends DqRule
  /** Every non-null `fkCol` must exist in `dim.dimKey` (referential
    * integrity); violations = orphan rows. */
  final case class RefIntegrity(fkCol: String, dim: DataFrame, dimKey: String)
      extends DqRule

  /** One row per rule: (rule, col_name, n_rows, n_violations, pass). */
  def dqReport(df: DataFrame, rules: Seq[DqRule]): DataFrame = {
    require(rules.nonEmpty, "dqReport needs at least one rule")
    val total = count(lit(1)).cast("bigint").as("n_rows")
    def viol(cond: Column): Column =
      sum(when(cond, 1L).otherwise(0L)).cast("bigint")

    val scalar = rules.zipWithIndex.collect {
      case (NotNull(c), i) =>
        (i, "not_null", c, col(c).isNull)
      case (InRange(c, lo, hi), i) =>
        (i, "in_range", c, col(c).isNotNull && (col(c) < lo || col(c) > hi))
      case (Matches(c, re), i) =>
        (i, "matches", c, col(c).isNotNull && !col(c).rlike(s"^(?:$re)$$"))
    }
    val scalarReport: Option[DataFrame] =
      if (scalar.isEmpty) None
      else Some {
        // one pass: every scalar rule is a conditional aggregate over
        // the same scan
        val aggs = total +: scalar.flatMap { case (i, _, _, cond) =>
          Seq(viol(cond).as(s"v_$i"))
        }
        val row = df.agg(aggs.head, aggs.tail: _*)
        scalar.map { case (i, rule, c, _) =>
          row.select(lit(rule).as("rule"), lit(c).as("col_name"),
            col("n_rows"), col(s"v_$i").as("n_violations"))
        }.reduce(_.unionByName(_))
      }

    val others: Seq[DataFrame] = rules.collect {
      case Unique(cols) =>
        val keyCols = cols.map(col)
        df.groupBy(keyCols: _*).agg(count(lit(1)).as("c"))
          .agg(coalesce(sum(col("c")), lit(0L)).cast("bigint").as("n_rows"),
            coalesce(sum(col("c") - 1), lit(0L)).cast("bigint").as("n_violations"))
          .select(lit("unique").as("rule"),
            lit(cols.mkString(",")).as("col_name"),
            col("n_rows"), col("n_violations"))
      case RefIntegrity(fk, dim, key) =>
        val orphans = df.filter(col(fk).isNotNull)
          .join(dim.select(col(key).as(fk)).distinct(), Seq(fk), "left_anti")
        val nOrph = orphans.agg(count(lit(1)).cast("bigint").as("n_violations"))
        df.agg(total).crossJoin(nOrph)
          .select(lit("ref_integrity").as("rule"), lit(fk).as("col_name"),
            col("n_rows"), col("n_violations"))
    }

    (scalarReport.toSeq ++ others)
      .reduce(_.unionByName(_))
      .withColumn("pass", (col("n_violations") === 0L).cast("int"))
  }

  /** Single-round suppression k-anonymization: rows whose quasi-
    * identifier combination occurs fewer than `k` times get those QI
    * values suppressed to `'*'`, then the anonymized view's class
    * histogram is returned. Every surviving non-suppressed class has
    * ≥ k members by construction; the merged `'*'` class is reported
    * as-is — if it is still smaller than k the caller drops it (stated
    * contract; full iterative generalization à la Mondrian trades
    * utility for it and is out of scope of the suppression form).
    *
    * Scale shape: one count aggregate on the QI key, broadcast back for
    * the suppression projection, one re-aggregate — the QI key space is
    * the (bounded) crossing of the QI columns, so both aggregates are
    * map-side combined and the broadcast is class-histogram-sized.
    */
  def kAnonymize(df: DataFrame, qiCols: Seq[String], k: Int): DataFrame = {
    require(qiCols.nonEmpty && k >= 2, s"need QI columns and k >= 2, got k=$k")
    val cast = qiCols.map(c => col(c).cast("string").as(c))
    val base = df.select(cast: _*)
    val classes = base.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("_n"))
    val joined = base.join(broadcast(classes), qiCols)
    val outCols = qiCols.map(c =>
      when(col("_n") >= k, col(c)).otherwise(lit("*")).as(s"${c}_g"))
    joined.select(outCols: _*)
      .groupBy(qiCols.map(c => col(s"${c}_g")): _*)
      .agg(count(lit(1)).cast("bigint").as("class_size"))
      .orderBy(qiCols.map(c => col(s"${c}_g")): _*)
  }

  /** l-diversity audit of the QI equivalence classes — the companion
    * check [[kAnonymize]] alone cannot give (Machanavajjhala et al.
    * 2006, "l-Diversity: privacy beyond k-anonymity"): a class can be
    * k-large yet reveal everyone's sensitive value when the class is
    * HOMOGENEOUS. Per class this emits the exact ingredients and two
    * verdicts: DISTINCT l-diversity (≥ l distinct sensitive values) and
    * RECURSIVE (c, l)-diversity — r₁ < c·(r_l + … + r_m) over the
    * descending sensitive-value counts — chosen over entropy
    * l-diversity because it is ALL-INTEGER (entropy's Σ p·ln p would
    * hang a cross-engine gate on libm parity; the recursive form is the
    * paper's own practical variant).
    *
    * Scale shape: one (QI, sensitive) aggregate, one per-class window
    * bounded by the sensitive domain, one class rollup — every exchange
    * carries the bounded QI×sensitive crossing, never the table.
    */
  def lDiversity(
      df: DataFrame,
      qiCols: Seq[String],
      sensitiveCol: String,
      l: Int = 3,
      c: Int = 2): DataFrame = {
    require(qiCols.nonEmpty && l >= 2 && c >= 1,
      s"need QI columns, l >= 2, c >= 1; got l=$l c=$c")
    val qi = qiCols.map(col)
    val counts = df
      .select((qiCols :+ sensitiveCol).map(x => col(x).cast("string").as(x)): _*)
      .groupBy((qi :+ col(sensitiveCol)): _*)
      .agg(count(lit(1)).as("_cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(qi: _*)
      .orderBy(col("_cnt").desc, col(sensitiveCol))
    counts
      .withColumn("_rn", row_number().over(w))
      .groupBy(qi: _*)
      .agg(
        sum(col("_cnt")).as("class_size"),
        count(lit(1)).as("n_distinct_sensitive"),
        max(when(col("_rn") === 1, col("_cnt"))).as("top_count"),
        coalesce(sum(when(col("_rn") >= l, col("_cnt"))), lit(0L)).as("tail_sum"))
      .withColumn("distinct_l_ok",
        (col("n_distinct_sensitive") >= l).cast("int"))
      .withColumn("recursive_cl_ok",
        (col("top_count") < lit(c.toLong) * col("tail_sum")).cast("int"))
      .orderBy(qi: _*)
  }

  /** t-closeness audit — the third of the release-audit trio (Li, Li &
    * Venkatasubramanian 2007, "t-Closeness: privacy beyond k-anonymity
    * and l-diversity"): a class can be l-diverse yet still leak when
    * its sensitive DISTRIBUTION skews far from the table's. For a
    * categorical sensitive attribute under the equal-distance ground
    * metric, the paper's Earth Mover's Distance reduces to total
    * variation: EMD = ½ Σ_v |c_v/n − g_v/N|.
    *
    * Gate contract (the [[graft.ext.Similarity.embedPca]] sketch-gate
    * idiom): the distance is carried as the EXACT integer numerator
    * Σ_v |c_v·N − g_v·n| over denominator 2·n·N — emitted as a digit
    * STRING (it exceeds int64 at corpus counts; decimal(38,0)
    * accumulation, both engines print identical digits) — plus the
    * boolean verdict tDen·num ≤ 2·tNum·n·N compared in exact integers,
    * so no float division ever reaches the hash.
    *
    * Scale shape: one bounded (QI, sensitive) aggregate, the global
    * histogram broadcast back over the class × domain crossing (both
    * bounded), one class rollup — the table itself crosses the wire
    * once, as counts.
    */
  def tCloseness(
      df: DataFrame,
      qiCols: Seq[String],
      sensitiveCol: String,
      tNum: Int = 2,
      tDen: Int = 5): DataFrame = {
    require(qiCols.nonEmpty && tNum >= 0 && tDen >= 1 && tNum <= tDen,
      s"need QI columns and t = tNum/tDen in [0, 1]; got $tNum/$tDen")
    val dec = "decimal(38,0)"
    val qi = qiCols.map(col)
    val base = df.select(
      (qiCols :+ sensitiveCol).map(x => col(x).cast("string").as(x)): _*)
    val global = base.groupBy(col(sensitiveCol)).agg(count(lit(1)).as("_g"))
    val total = base.agg(count(lit(1)).as("_N"))
    val cls = base.groupBy((qi :+ col(sensitiveCol)): _*)
      .agg(count(lit(1)).as("_c"))
    val nCls = cls.groupBy(qi: _*).agg(sum(col("_c")).as("class_size"))
    nCls
      .crossJoin(broadcast(global.crossJoin(total)))
      .join(cls, qiCols :+ sensitiveCol, "left")
      .withColumn("_c", coalesce(col("_c"), lit(0L)))
      .withColumn("_term",
        abs(col("_c").cast(dec) * col("_N") - col("_g").cast(dec) * col("class_size")))
      .groupBy(qi: _*)
      .agg(
        first(col("class_size")).as("class_size"),
        first(col("_N")).as("_N"),
        sum(col("_term")).as("_num"))
      .select(
        (qi :+
          col("class_size") :+
          col("_num").cast("string").as("emd_num") :+
          (col("_num") * tDen <=
            col("class_size").cast(dec) * col("_N") * (2 * tNum))
            .cast("int").as("t_ok")): _*)
      .orderBy(qi: _*)
  }

  /** Row-level quarantine routing — the complement of [[dqReport]]'s
    * aggregates: every failing row comes back with `failed_rules`, the
    * sorted list of rules it violates, ready to write to a quarantine
    * sink while the clean rows continue (the dead-letter pattern at the
    * ingest boundary; Deequ's row-level results / dbt's store_failures).
    *
    * Scale shape: all scalar rules evaluate in the SAME projection over
    * one scan; `Unique` joins back the duplicated keys only (the
    * violating sliver, shuffled once on the key); `RefIntegrity`
    * broadcasts the dimension key set. The verdict array is built and
    * filtered per row — no per-rule passes, no row explosion.
    */
  def dqQuarantine(df: DataFrame, rules: Seq[DqRule]): DataFrame = {
    require(rules.nonEmpty, "dqQuarantine needs at least one rule")
    val markers = scala.collection.mutable.ArrayBuffer.empty[Column]
    var cur = df
    rules.foreach {
      case NotNull(c) =>
        markers += when(col(c).isNull, lit(s"not_null:$c"))
      case InRange(c, lo, hi) =>
        markers += when(col(c).isNotNull && (col(c) < lo || col(c) > hi),
          lit(s"in_range:$c"))
      case Matches(c, re) =>
        markers += when(col(c).isNotNull && !col(c).rlike(s"^(?:$re)$$"),
          lit(s"matches:$c"))
      case Unique(cols) =>
        val name = s"_dup_${cols.mkString("_")}"
        val dups = df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("_c"))
          .filter(col("_c") > 1)
          .select(cols.map(col) :+ lit(true).as(name): _*)
        cur = cur.join(dups, cols, "left")
        markers += when(col(name), lit(s"unique:${cols.mkString(",")}"))
      case RefIntegrity(fk, dim, key) =>
        val name = s"_ref_$fk"
        val d = dim.select(col(key).as(s"_k_$fk")).distinct()
          .withColumn(name, lit(true))
        cur = cur.join(broadcast(d), col(fk) === col(s"_k_$fk"), "left")
        markers += when(col(fk).isNotNull && col(name).isNull, lit(s"ref:$fk"))
    }
    cur
      .withColumn("failed_rules",
        array_sort(filter(array(markers.toSeq: _*), x => x.isNotNull)))
      .filter(size(col("failed_rules")) > 0)
      .select(df.columns.map(col) :+ col("failed_rules") :+
        size(col("failed_rules")).cast("int").as("n_failed"): _*)
  }

  /** Differentially-private group counts under the DISCRETE two-sided
    * geometric mechanism (Ghosh–Roughgarden–Sundararajan 2012 — the
    * utility-optimal integer mechanism for count queries): noise
    * Z = G₁ − G₂ for iid geometrics P(G=g) = (1−α)αᵍ gives the
    * two-sided geometric with ε = ln(1/α). Each geometric is sampled
    * EXACTLY as the number of leading zero hex digits of an md5 draw
    * (each digit uniform on 16 values → P(G≥g) = 16⁻ᵍ, so α = 1/16,
    * ε = ln 16 ≈ 2.77 per count at sensitivity 1) — pure integer
    * arithmetic end to end, no float ln/exp to drift between engines,
    * which is what lets the whole mechanism sit under the DuckDB hash
    * gate. `released_n` clamps at 0 (post-processing, privacy-free).
    *
    * Testability caveat, stated plainly: the draws here are seeded
    * hashes of the group key so the gate can verify the mechanism's
    * arithmetic; hash noise an adversary can recompute provides NO
    * privacy. Production swaps the two md5 draws for a real entropy
    * source — the mechanism, sensitivity, and clamping are unchanged.
    */
  def dpCounts(df: DataFrame, keyCol: String, seed: String = "dp"): DataFrame = {
    def geo(tag: String): Column =
      length(regexp_extract(md5(concat(lit(s"$seed:$tag:"), col("_k"))), "^0*", 0)).cast("bigint")
    df.select(coalesce(col(keyCol).cast("string"), lit("<NULL>")).as("_k"))
      .groupBy(col("_k"))
      .agg(count(lit(1)).as("_n"))
      .select(col("_k").as(keyCol),
        (col("_n") + geo("a") - geo("b")).cast("bigint").as("noisy_n"))
      .withColumn("released_n", greatest(col("noisy_n"), lit(0L)))
  }

  /** Weekday seasonality profile: per (type, day-of-week) observed
    * counts against the independence expectation
    * E = n_type·n_dow/N, with the ratio observed/expected — the
    * "is Tuesday weird for purchases" telemetry that separates weekly
    * rhythm from genuine drift before CUSUM alarms on it. Counts exact;
    * expected and ratio are fixed two-division IEEE trees over exact
    * int64s. day-of-week is ISO (1 = Monday), identical cross-engine.
    */
  def weekdayProfile(df: DataFrame, typeCol: String, tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wType = Window.partitionBy(col("etype"))
    val wDow = Window.partitionBy(col("dow"))
    val wAll = Window.partitionBy()
    df.where(col(typeCol).isNotNull)
      .groupBy(col(typeCol).as("etype"),
        dayofweek(col(tsCol)).as("_d")) // 1 = Sunday in Spark
      .agg(count(lit(1)).as("n"))
      // ISO dow (1 = Monday): shift Spark's Sunday-first convention
      .withColumn("dow", expr("case when _d = 1 then 7 else _d - 1 end").cast("int"))
      .drop("_d")
      .withColumn("n_type", sum(col("n")).over(wType).cast("bigint"))
      .withColumn("n_dow", sum(col("n")).over(wDow).cast("bigint"))
      .withColumn("n_all", sum(col("n")).over(wAll).cast("bigint"))
      .select(col("etype"), col("dow"), col("n"), col("n_type"), col("n_dow"),
        (col("n_type").cast("double") * col("n_dow").cast("double") /
          col("n_all").cast("double")).as("expected"),
        (col("n").cast("double") /
          (col("n_type").cast("double") * col("n_dow").cast("double") /
            col("n_all").cast("double"))).as("ratio"))
  }

  /** CUSUM change-point telemetry over per-day event counts (Page 1954)
    * — the "did the mix shift mid-corpus" alarm for ingest monitoring.
    * Per type, the classic cumulative sum of deviations from the mean is
    * kept INTEGER-EXACT by scaling with the day count: cusum_scaled(d) =
    * Σ_{d'≤d} (n(d')·D − total) is the true CUSUM times D, so no float
    * accumulates across rows (cross-engine-exact under the hash gate)
    * and the flag |cusum_scaled| > m·total reads "the running deviation
    * exceeded m mean-days". Observed days only (an absent day is absent
    * in both engines; a zero-filled axis is `resample_fill`'s job).
    *
    * One shuffle on the type key serves both windows (the per-type
    * constants and the ordered cumsum); day cardinality bounds every
    * partition, so the sort is per-type-tiny at any corpus size.
    */
  def cusumDrift(df: DataFrame, typeCol: String, tsCol: String, threshMult: Int = 1): DataFrame =
    cusumFromDaily(dailyCounts(df, typeCol, tsCol), threshMult)

  /** Per-(type, day) event counts — the mergeable partial the streaming
    * twin stores per batch (counts of the same (type, day) from k
    * batches fold by summing).
    */
  def dailyCounts(df: DataFrame, typeCol: String, tsCol: String): DataFrame =
    df.where(col(typeCol).isNotNull)
      .groupBy(col(typeCol).as("etype"), date_trunc("day", col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"))

  private def cusumFromDaily(daily: DataFrame, threshMult: Int): DataFrame = {
    require(threshMult >= 1, s"threshMult must be >= 1, got $threshMult")
    import org.apache.spark.sql.expressions.Window
    val wType = Window.partitionBy(col("etype"))
    val wCum = Window.partitionBy(col("etype")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("n_days", count(lit(1)).over(wType))
      .withColumn("total", sum(col("n")).over(wType))
      .withColumn("cusum_scaled",
        sum(col("n") * col("n_days") - col("total")).over(wCum).cast("bigint"))
      .select(col("etype"), col("day"), col("n"),
        col("n_days").cast("bigint").as("n_days"), col("total").cast("bigint").as("total"),
        col("cusum_scaled"),
        (abs(col("cusum_scaled")) > lit(threshMult) * col("total")).as("drift_flag"))
  }

  /** Theil–Sen robust trend slope over per-day event counts — the
    * outlier-immune "is this type growing or dying" estimator (breakdown
    * point 29%, vs 0% for least squares): the median of all pairwise
    * slopes (nⱼ−nᵢ)/(dⱼ−dᵢ). Slopes stay EXACT RATIONALS (int64
    * numerator/denominator); the median is taken under the total order
    * (⌊10⁶·num/den⌋, num, den) — the first key is one IEEE
    * floor-division (identical cross-engine), the tie-breaks make the
    * order total, so both engines pick the same pair. Lower median for
    * even counts (averaging rationals would be exact too, but the
    * witness pair is more useful than a synthetic midpoint). `slope` is
    * the single division num/den.
    *
    * Scale shape: the pairwise self-join is per-type and day-bounded
    * (D(D−1)/2 rows for D observed days — 435 at a 30-day window), as
    * is the median window; types parallelize freely.
    */
  def trendSlope(df: DataFrame, typeCol: String, tsCol: String): DataFrame =
    trendFromDaily(dailyCounts(df, typeCol, tsCol))

  /** [[trendSlope]] over base events plus everything [[cusumDriftSink]]
    * committed — the SAME daily-count store serves both drift readers
    * (one bounded per-batch aggregate on disk, k monitoring views over
    * it), which is the point of storing mergeable partials instead of
    * computed verdicts.
    */
  def trendSlopeFrom(
      spark: org.apache.spark.sql.SparkSession,
      base: DataFrame,
      typeCol: String,
      tsCol: String,
      outDir: String): DataFrame =
    trendFromDaily(mergedDaily(spark, base, typeCol, tsCol, outDir))

  /** [[autocorrelation]] over base events plus everything
    * [[cusumDriftSink]] committed — the fifth reader over the shared
    * daily-count store (CUSUM, Theil-Sen, weekday, decomposition, ACF
    * all monitor from the same bounded mergeable partials). */
  def autocorrelationFrom(
      spark: org.apache.spark.sql.SparkSession,
      base: DataFrame,
      typeCol: String,
      tsCol: String,
      outDir: String,
      maxLag: Int = 7): DataFrame =
    acfFromDaily(mergedDaily(spark, base, typeCol, tsCol, outDir), maxLag)

  /** Per-type ordinary-least-squares trend of the daily counts — the
    * parametric complement to [[trendSlope]]'s Theil–Sen (OLS is the
    * one dashboards fit; Theil–Sen is the robust check). Kept exact the
    * integer way: with the day re-indexed to 0..T−1 per type (so sums
    * stay tiny), slope = (nΣdy − ΣdΣy) / (nΣd² − (Σd)²) is a ratio of
    * two int64s carried as witness columns, the slope itself ONE IEEE
    * division, and r² a fixed two-multiply/one-divide expression over
    * the same exact sums — deterministic in any engine. One daily
    * aggregate + one per-type fold; output is |types| rows.
    */
  def olsTrend(df: DataFrame, typeCol: String, tsCol: String): DataFrame =
    olsFromDaily(dailyCounts(df, typeCol, tsCol))

  /** [[olsTrend]] over base events plus everything [[cusumDriftSink]]
    * committed — with [[ewmaSmoothFrom]] the sixth/seventh readers over
    * the shared daily-count store: one stream of bounded mergeable
    * partials feeds CUSUM, Theil-Sen, weekday, decomposition, ACF, OLS
    * and EWMA without ever replaying events. */
  def olsTrendFrom(
      spark: org.apache.spark.sql.SparkSession,
      base: DataFrame,
      typeCol: String,
      tsCol: String,
      outDir: String): DataFrame =
    olsFromDaily(mergedDaily(spark, base, typeCol, tsCol, outDir))

  /** [[ewmaSmooth]] over the same merged store; see [[olsTrendFrom]]. */
  def ewmaSmoothFrom(
      spark: org.apache.spark.sql.SparkSession,
      base: DataFrame,
      typeCol: String,
      tsCol: String,
      outDir: String): DataFrame =
    ewmaFromDaily(mergedDaily(spark, base, typeCol, tsCol, outDir))

  private[graft] def olsFromDaily(daily: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wT = Window.partitionBy(col("etype"))
    val d = daily.withColumn(
      "d", datediff(col("day"), to_date(lit("1970-01-01"))).cast("long"))
      .withColumn("d", col("d") - min(col("d")).over(wT))
    val agg = d.groupBy(col("etype")).agg(
      count(lit(1)).as("n"),
      sum(col("d")).as("sd"),
      sum(col("n")).as("sy"),
      sum(col("d") * col("d")).as("sdd"),
      sum(col("d") * col("n")).as("sdy"),
      sum(col("n") * col("n")).as("syy"))
    agg.select(
      col("etype"), col("n").as("n_days"),
      (col("n") * col("sdy") - col("sd") * col("sy")).as("slope_num"),
      (col("n") * col("sdd") - col("sd") * col("sd")).as("slope_den"),
      when(col("n") * col("sdd") =!= col("sd") * col("sd"),
        (col("n") * col("sdy") - col("sd") * col("sy")).cast("double") /
          (col("n") * col("sdd") - col("sd") * col("sd")).cast("double"))
        .as("slope"),
      when((col("n") * col("sdd") =!= col("sd") * col("sd")) &&
          (col("n") * col("syy") =!= col("sy") * col("sy")),
        ((col("n") * col("sdy") - col("sd") * col("sy")).cast("double") *
          (col("n") * col("sdy") - col("sd") * col("sy")).cast("double")) /
          ((col("n") * col("sdd") - col("sd") * col("sd")).cast("double") *
            (col("n") * col("syy") - col("sy") * col("sy")).cast("double")))
        .as("r2"))
  }

  /** Exponentially weighted moving average (α = 1/2) of the per-day
    * event counts, kept EXACT end to end: with a dyadic α the recursion
    * s_t = (x_t + s_{t−1})/2 has the closed form s_t = N_t / 2^(t−1)
    * with N_t = x_1 + Σ_{i=2..t} x_i·2^(i−2) — an integer running sum —
    * so the gate carries (numerator, exponent) as exact integers and
    * the smoothed value is ONE IEEE division, bit-identical in any
    * engine. One bounded-key aggregate plus one partitioned window; no
    * per-row state, no driver loop.
    *
    * Scaled-integer envelope: |N_t| < 2^63 needs
    * series length ≲ 62 − log2(max daily count) per type — ample for
    * the calendar-bounded daily series this smooths (≈50 days at 10⁹
    * events/day). Longer horizons chunk: N and the exponent are a
    * one-row-per-type mergeable partial, so a new chunk re-seeds from
    * the previous chunk's (N, t) exactly like the daily-count store.
    */
  def ewmaSmooth(df: DataFrame, typeCol: String, tsCol: String): DataFrame =
    ewmaFromDaily(dailyCounts(df, typeCol, tsCol))

  private[graft] def ewmaFromDaily(daily: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy(col("etype")).orderBy(col("day"))
    daily
      .withColumn("rn", row_number().over(wOrd))
      // loud failure, not silent wraparound: Spark's shiftleft wraps the
      // shift amount mod 64, so past 62 observations per type the dyadic
      // weights would silently diverge instead of erroring — the guard
      // rides INSIDE the live wn expression (a detached assert_true
      // column would be pruned by the optimizer)
      .withColumn("wn",
        when(col("rn") > 62, expr(
          "raise_error('ewmaSmooth: more than 62 observations per type — " +
            "dyadic weights would wrap mod 64; chunk-reseed from the " +
            "(ewma_num, den_log2) partial as documented')"))
        .when(col("rn") === 1, col("n"))
        .otherwise(col("n") * expr("shiftleft(1L, rn - 2)")))
      .withColumn("ewma_num",
        sum(col("wn")).over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("etype"), col("day"), col("n"), col("ewma_num"),
        (col("rn") - 1).as("den_log2"),
        (col("ewma_num").cast("double") / expr("shiftleft(1L, rn - 1)").cast("double"))
          .as("ewma"))
  }

  private[ops] def mergedDaily(
      spark: org.apache.spark.sql.SparkSession,
      base: DataFrame,
      typeCol: String,
      tsCol: String,
      outDir: String): DataFrame = {
    val committed = graft.ext.TextOps.committedBatchDirs(spark, s"$outDir/daily")
    val baseDaily = dailyCounts(base, typeCol, tsCol)
    val all =
      if (committed.isEmpty) baseDaily
      else baseDaily.unionByName(spark.read.parquet(
        committed.toSeq.sorted.map(b => s"$outDir/daily/$b"): _*))
    all.groupBy(col("etype"), col("day")).agg(sum(col("n")).as("n"))
  }

  private def trendFromDaily(dailyIn: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = dailyIn
      .select(col("etype"),
        datediff(col("day"), to_date(lit("1970-01-01"))).cast("bigint").as("d"),
        col("n"))
    val pairs = daily.alias("i")
      .join(daily.alias("j"),
        col("i.etype") === col("j.etype") && col("i.d") < col("j.d"))
      .select(col("i.etype").as("etype"),
        (col("j.n") - col("i.n")).as("num"),
        (col("j.d") - col("i.d")).as("den"))
      .withColumn("slope_micro",
        floor(col("num").cast("double") * lit(1000000.0) / col("den").cast("double")).cast("bigint"))
    val w = Window.partitionBy(col("etype"))
      .orderBy(col("slope_micro"), col("num"), col("den"))
    val wAll = Window.partitionBy(col("etype"))
    pairs
      .withColumn("rn", row_number().over(w))
      .withColumn("n_pairs", count(lit(1)).over(wAll))
      .where(col("rn") === expr("(n_pairs + 1) div 2"))
      .join(daily.groupBy(col("etype")).agg(count(lit(1)).as("n_days")), Seq("etype"))
      .select(col("etype"), col("n_days"), col("n_pairs").cast("bigint").as("n_pairs"),
        col("num").as("med_num"), col("den").as("med_den"),
        (col("num").cast("double") / col("den").cast("double")).as("slope"))
  }

  /** Sample autocorrelation of the per-day count series, lags 1..maxLag
    * — the seasonality detector behind "is this metric weekly-periodic"
    * (an ACF spike at lag 7) and "is drift persistent" (slow ACF decay),
    * the fourth reader over the same [[dailyCounts]] store as
    * CUSUM/Theil-Sen/weekday. r_k = Σ(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)²
    * is kept cross-engine EXACT by clearing the x̄ = S/n denominators:
    * with C_k = Σ x_t·x_{t+k}, A_k = Σ_{t≤n−k} x_t, B_k = Σ_{t>k} x_t,
    *   num·n² = n²·C_k − n·S·(A_k+B_k) + (n−k)·S²
    *   den·n² = n·(n·Q − S²)
    * are int64 (emitted as witness columns), and `acf` is their single
    * IEEE division. Lags over the observed-day INDEX (an absent day is
    * absent in both engines — zero-filling is `resample_fill`'s job);
    * lags with no pairs, and constant series (den = 0), yield no row.
    * Overflow bound: n_days·S·(A+B) stays under 2⁶³ up to ~10⁸ events
    * per type per year — beyond that, pre-scale the daily counts.
    *
    * Scale shape: one shuffle on the type key serves the lead window
    * AND the per-type aggregate; maxLag leads share one window sort,
    * the aggregate is map-side combined, and the stack unpivot runs on
    * |types| rows. Day cardinality bounds every partition.
    */
  def autocorrelation(df: DataFrame, typeCol: String, tsCol: String, maxLag: Int = 7): DataFrame =
    acfFromDaily(dailyCounts(df, typeCol, tsCol), maxLag)

  private[graft] def acfFromDaily(daily: DataFrame, maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 30, s"maxLag must be in [1,30], got $maxLag")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("etype")).orderBy(col("day"))
    val withLeads = (1 to maxLag).foldLeft(daily) { (d, k) =>
      d.withColumn(s"_l$k", lead(col("n"), k).over(w))
    }
    val aggs = Seq(
      count(lit(1)).as("n_days"),
      sum(col("n")).as("s"),
      sum(col("n") * col("n")).as("q")) ++ (1 to maxLag).flatMap { k =>
      Seq(
        sum(col("n") * col(s"_l$k")).as(s"c_$k"),
        sum(when(col(s"_l$k").isNotNull, col("n"))).as(s"a_$k"),
        sum(col(s"_l$k")).as(s"b_$k"))
    }
    val stackArgs =
      (1 to maxLag).map(k => s"$k, c_$k, a_$k, b_$k").mkString(", ")
    withLeads.groupBy(col("etype")).agg(aggs.head, aggs.tail: _*)
      .selectExpr("etype", "n_days", "s", "q",
        s"stack($maxLag, $stackArgs) as (lag, ck, ak, bk)")
      .where(col("ck").isNotNull)
      .select(col("etype"), col("lag").cast("int").as("lag"), col("n_days"),
        (col("n_days") * col("n_days") * col("ck")
          - col("n_days") * col("s") * (col("ak") + col("bk"))
          + (col("n_days") - col("lag")) * col("s") * col("s")).as("acf_num"),
        (col("n_days") * (col("n_days") * col("q") - col("s") * col("s")))
          .as("acf_den"))
      .where(col("acf_den") > 0)
      .withColumn("acf",
        col("acf_num").cast("double") / col("acf_den").cast("double"))
  }

  /** CROSS-series Pearson correlation matrix over the per-type daily
    * counts — the time-series-similarity complement to
    * [[autocorrelation]]'s within-series lags: "which event streams
    * move together" is the readout behind shared-incident detection
    * (two metrics dip the same day), leading-indicator hunting, and
    * redundant-monitor pruning. The eighth reader over the same
    * [[dailyCounts]] store as CUSUM / Theil-Sen / weekday /
    * decomposition / ACF / OLS / EWMA.
    *
    * Alignment: each series is ZERO-FILLED over the union of observed
    * corpus days (a day where one type logged nothing is a real 0 in
    * its series — inner-joining only common days would correlate
    * presence, not volume; the grid is |types|·|days|, a vocabulary
    * frame). Exactness is the [[olsTrend]] discipline with the x̄,ȳ
    * denominators cleared: per pair, num = n·Σxy − Σx·Σy and
    * var_a/var_b = n·Σx² − (Σx)², all EXACT int64 witnesses (emitted),
    * and r = num / sqrt(var_a·var_b) is one fixed IEEE tree — the
    * variance product multiplies as DOUBLES (the int64 product would
    * overflow first) and sqrt is an exactly-rounded IEEE op, so the
    * value cannot drift engines; rounded 6dp like every emitted
    * irrational. Constant series (var = 0) emit NULL r, never a 0/0.
    * Envelope: n_days·Σxy < 2⁶³ to ~10⁸ events/type/day-year — the
    * ACF bound; pre-scale beyond.
    *
    * Scale shape: ONE map-side-combined daily aggregate over the
    * corpus; everything after (distinct days, the fill grid, the
    * day-aligned self-join, the pair rollup) runs on vocabulary-bounded
    * frames — |types|·|days| rows, |types|² output. Nothing downstream
    * of the first aggregate ever sees an event row.
    */
  def seriesCorrelation(df: DataFrame, typeCol: String, tsCol: String): DataFrame =
    corrFromDaily(dailyCounts(df, typeCol, tsCol))

  private[graft] def corrFromDaily(daily: DataFrame): DataFrame = {
    val days = daily.select(col("day")).distinct()
    val types = daily.select(col("etype")).distinct()
    val filled = types.crossJoin(days)
      .join(daily, Seq("etype", "day"), "left")
      .select(col("etype"), col("day"), coalesce(col("n"), lit(0L)).as("n"))
    val a = filled.select(col("day"), col("etype").as("type_a"), col("n").as("x"))
    val b = filled.select(col("day"), col("etype").as("type_b"), col("n").as("y"))
    a.join(b, Seq("day"))
      .where(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(
        count(lit(1)).as("n_days"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("type_a"), col("type_b"), col("n_days"),
        (col("n_days") * col("sxy") - col("sx") * col("sy")).as("corr_num"),
        (col("n_days") * col("sxx") - col("sx") * col("sx")).as("var_a"),
        (col("n_days") * col("syy") - col("sy") * col("sy")).as("var_b"))
      .withColumn("pearson_r",
        when(col("var_a") > 0 && col("var_b") > 0,
          round(col("corr_num").cast("double") /
            sqrt(col("var_a").cast("double") * col("var_b").cast("double")), 6)))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** [[seriesCorrelation]] over base events plus everything
    * [[cusumDriftSink]] committed — see [[olsTrendFrom]]; same store,
    * same bounded partials. */
  def seriesCorrelationFrom(
      spark: org.apache.spark.sql.SparkSession,
      base: DataFrame,
      typeCol: String,
      tsCol: String,
      outDir: String): DataFrame =
    corrFromDaily(mergedDaily(spark, base, typeCol, tsCol, outDir))

  /** Classical additive seasonal decomposition of the per-day count
    * series: n = trend + seasonal + residual, the "is the dip real or
    * just the weekend" separator for ingest monitoring — the decomposed
    * sibling of [[weekdayProfile]] (which profiles the seasonal factor
    * alone) over the same [[dailyCounts]] store.
    *
    * Cross-engine exactness: the trend is a centered 7-row moving
    * AVERAGE carried as its integer moving SUM (`trend_sum7`); the
    * seasonal factor is the per-(type, ISO-dow) mean of the detrended
    * series carried as the integer pair (`seas_num` = Σ(7·n −
    * trend_sum7), `seas_den` = row count) — so the only float ops are
    * three scalar derivations with a fixed expression tree (two
    * divisions, two subtractions), identical in any IEEE engine. Rows
    * without a full ±3-day window (series edges) get no decomposition
    * row: a partial-window trend would bias the seasonal means.
    * Observed-day index semantics as in [[autocorrelation]].
    *
    * Scale shape: one shuffle on the type key for the moving window,
    * one map-side-combined aggregate on (type, dow) — 7·|types| rows —
    * broadcast back. Day cardinality bounds every partition.
    */
  def seasonalDecompose(df: DataFrame, typeCol: String, tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("etype")).orderBy(col("day"))
      .rowsBetween(-3, 3)
    val withTrend = dailyCounts(df, typeCol, tsCol)
      .withColumn("_dow1", dayofweek(col("day")))
      .withColumn("dow",
        expr("case when _dow1 = 1 then 7 else _dow1 - 1 end").cast("int"))
      .withColumn("_win_n", count(lit(1)).over(w))
      .withColumn("trend_sum7", sum(col("n")).over(w))
      .where(col("_win_n") === 7)
      .select(col("etype"), col("day"), col("dow"), col("n"), col("trend_sum7"))
    val seasonal = withTrend
      .groupBy(col("etype"), col("dow"))
      .agg(sum(lit(7L) * col("n") - col("trend_sum7")).as("seas_num"),
        count(lit(1)).as("seas_den"))
    withTrend.join(broadcast(seasonal), Seq("etype", "dow"))
      .withColumn("trend", col("trend_sum7").cast("double") / lit(7.0))
      .withColumn("seasonal",
        col("seas_num").cast("double") / (lit(7L) * col("seas_den")).cast("double"))
      .withColumn("residual",
        col("n").cast("double") - col("trend") - col("seasonal"))
      .select(col("etype"), col("day"), col("dow"), col("n"), col("trend_sum7"),
        col("seas_num"), col("seas_den"), col("trend"), col("seasonal"),
        col("residual"))
  }

  /** Streaming twin of [[cusumDrift]]: each micro-batch writes its
    * (type, day) count partial to a batch-id directory (whole-dir
    * overwrite ⇒ replay-idempotent), and [[cusumDriftFrom]] folds base +
    * committed partials into the SAME CUSUM as the batch path over the
    * union — the drift alarm recomputes from bounded daily aggregates,
    * never from raw history.
    */
  def cusumDriftSink(
      events: DataFrame,
      typeCol: String,
      tsCol: String,
      outDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        cusumDriftBatch(batch.toDF(), typeCol, tsCol, outDir, batchId)
      }
      .start()

  /** One micro-batch's daily-count partial (factored out for replay tests). */
  def cusumDriftBatch(df: DataFrame, typeCol: String, tsCol: String, outDir: String, batchId: Long): Unit = {
    dailyCounts(df, typeCol, tsCol)
      .write.mode("overwrite").parquet(s"$outDir/daily/batch_$batchId")
    ()
  }

  /** CUSUM over base events plus everything [[cusumDriftSink]] committed.
    * Zero committed batches yield the CUSUM of the base alone.
    */
  def cusumDriftFrom(
      spark: org.apache.spark.sql.SparkSession,
      base: DataFrame,
      typeCol: String,
      tsCol: String,
      outDir: String,
      threshMult: Int = 1): DataFrame =
    cusumFromDaily(mergedDaily(spark, base, typeCol, tsCol, outDir), threshMult)

  /** Exact ELEMENT quantiles per group — for each requested q, the value
    * at row ⌈q·n⌉ of the group's sort order (percentile-disc semantics:
    * an actual data element, never an interpolated midpoint, so nothing
    * floats between engines). Emits (group, q_permille, n, value).
    *
    * Selected OVER THE VALUE SUPPORT (the [[conformalInterval]] /
    * [[imputeMedian]] order-statistic doctrine): rows collapse to
    * per-(group, value) counts, ONE cumulative window runs over the
    * support — bounded by distinct values per group, not rows — and
    * every requested quantile is served by ONE pass (the q list
    * explodes per support row; the row whose cumulative range straddles
    * ⌈q·n/1000⌉ wins). The first form ranked raw rows AND re-executed
    * the window once per quantile via a 5-way union — measured 5.6 s
    * standalone at x10 where this form is scan-bound.
    */
  def quantileElements(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      qPermille: Seq[Int] = Seq(250, 500, 750, 900, 990)): DataFrame = {
    require(qPermille.nonEmpty && qPermille.forall(q => q >= 1 && q <= 1000),
      s"qPermille values must be in [1,1000], got $qPermille")
    import org.apache.spark.sql.expressions.Window
    val counts = df
      .select(col(groupCol).as("_g"), col(valueCol).as("_v"))
      .where(col("_v").isNotNull)
      .groupBy(col("_g"), col("_v"))
      .agg(count(lit(1)).as("_c"))
    val wCum = Window.partitionBy(col("_g")).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("_cum", sum(col("_c")).over(wCum))
      .withColumn("_n", sum(col("_c")).over(Window.partitionBy(col("_g"))))
      .select(col("_g"), col("_v"), col("_c"), col("_cum"), col("_n"),
        explode(array(qPermille.distinct.sorted.map(lit): _*)).as("q_permille"))
      // ⌈q·n/1000⌉ in pure int64: (q*n + 999) div 1000
      .withColumn("_k", expr("(q_permille * _n + 999) div 1000"))
      .where(col("_cum") - col("_c") < col("_k") && col("_k") <= col("_cum"))
      .select(col("_g").as(groupCol), col("q_permille"),
        col("_n").cast("bigint").as("n"), col("_v").as(valueCol))
  }

  /** Linearly-INTERPOLATED per-group quantiles (SQL `percentile_cont`
    * semantics, the convention dashboards and numpy default to) — the
    * continuous twin of [[quantileElements]]' exact-element form. At
    * permille q over n values, the target rank is r = q·(n−1)/1000: the
    * result is element ⌊r⌋ when r is integral, else the ONE IEEE lerp
    * lo + frac·(hi − lo) between the two neighboring exact elements.
    * The fractional part is carried as an exact integer remainder
    * (q·(n−1) mod 1000), so which elements interpolate — and whether
    * interpolation happens at all — is decided in int64; only the final
    * lerp is float, making the row hash-gatable against any engine with
    * the same convention.
    *
    * Shape: the [[quantileElements]] support-selection form — one
    * per-(group, value) aggregate, one support-sized cumulative window,
    * every quantile served in one exploded pass. The raw-row neighbor
    * `lead(value)` becomes: the SAME support value when rank ⌊r⌋+2
    * still falls inside the current value's run (lerp between equal
    * elements — exactly the duplicate-handling percentile_cont
    * requires), else the next support value. |groups|·|q| rows out.
    */
  def quantileInterp(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      qPermille: Seq[Int] = Seq(500, 900, 990)): DataFrame = {
    require(qPermille.nonEmpty && qPermille.forall(q => q >= 0 && q <= 1000),
      s"qPermille values must be in [0,1000], got $qPermille")
    import org.apache.spark.sql.expressions.Window
    val counts = df
      .select(col(groupCol).as("_g"), col(valueCol).cast("double").as("_v"))
      // null GROUPS drop too (a NULL-key partition would produce rows
      // the oracle never does) — the dailyLagged / lorenzGini convention
      .where(col("_v").isNotNull && col("_g").isNotNull)
      .groupBy(col("_g"), col("_v"))
      .agg(count(lit(1)).as("_c"))
    val wOrd = Window.partitionBy(col("_g")).orderBy(col("_v"))
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("_cum", sum(col("_c")).over(wCum))
      .withColumn("_n", sum(col("_c")).over(Window.partitionBy(col("_g"))))
      .withColumn("_next", lead(col("_v"), 1).over(wOrd))
      .select(col("_g"), col("_v"), col("_c"), col("_cum"), col("_n"),
        col("_next"),
        explode(array(qPermille.distinct.sorted.map(lit): _*)).as("q_permille"))
      // target rank r = q(n−1)/1000 (0-based): keep the support row
      // containing 1-based rank ⌊r⌋+1 = (q(n−1)) div 1000 + 1
      .withColumn("_k", expr("(q_permille * (_n - 1)) div 1000 + 1"))
      .where(col("_cum") - col("_c") < col("_k") && col("_k") <= col("_cum"))
      // the raw-row lead: rank ⌊r⌋+2 inside this value's run ⇒ same value
      .withColumn("_hi",
        when(col("_k") + 1 <= col("_cum"), col("_v")).otherwise(col("_next")))
      .select(
        col("_g").as(groupCol), col("q_permille"),
        col("_n").cast("bigint").as("n"),
        // frac = (q(n−1) mod 1000)/1000, exactly 0 ⇔ no interpolation
        when(expr("(q_permille * (_n - 1)) % 1000") === 0L, col("_v"))
          .otherwise(col("_v") +
            (expr("cast((q_permille * (_n - 1)) % 1000 as double) / 1000.0d") *
              (col("_hi") - col("_v"))))
          .as("value"))
  }

  /** Two-proportion A/B comparison: per-variant exposed/converted counts,
    * exact-ratio conversion rates, absolute and relative lift, and the
    * pooled two-proportion z statistic. Counts are exact int64; every
    * float is a fixed expression tree of correctly-rounded IEEE ops over
    * those counts, so the whole row is hash-gatable. One pass for the
    * per-variant counts; the 2-row pivot is a broadcast formality.
    */
  def abLift(
      df: DataFrame,
      variantCol: String,
      unitCol: String,
      convertedCol: String): DataFrame = {
    val per = df
      .where(col(variantCol).isNotNull && col(unitCol).isNotNull)
      .groupBy(col(variantCol).cast("string").as("variant"))
      .agg(
        count_distinct(col(unitCol)).as("n_units"),
        count_distinct(when(col(convertedCol), col(unitCol))).as("n_conv"))
    val a = per.where(col("variant") === "A")
      .select(col("n_units").as("n_a"), col("n_conv").as("c_a"))
    val b = per.where(col("variant") === "B")
      .select(col("n_units").as("n_b"), col("n_conv").as("c_b"))
    a.crossJoin(broadcast(b)).selectExpr(
      "n_a", "c_a", "n_b", "c_b",
      "cast(c_a as double) / cast(n_a as double) as rate_a",
      "cast(c_b as double) / cast(n_b as double) as rate_b",
      "cast(c_b as double) / cast(n_b as double) - cast(c_a as double) / cast(n_a as double) as abs_lift",
      """case when c_a > 0 then
        |  (cast(c_b as double) / cast(n_b as double)) / (cast(c_a as double) / cast(n_a as double)) - 1.0
        |end as rel_lift""".stripMargin,
      """case when c_a + c_b > 0 and c_a + c_b < n_a + n_b then
        |  (cast(c_b as double) / cast(n_b as double) - cast(c_a as double) / cast(n_a as double))
        |  / sqrt((cast(c_a + c_b as double) / cast(n_a + n_b as double))
        |         * (1.0 - cast(c_a + c_b as double) / cast(n_a + n_b as double))
        |         * (1.0 / cast(n_a as double) + 1.0 / cast(n_b as double)))
        |end as z_score""".stripMargin)
  }

  /** CUPED-adjusted A/B metric (Deng, Xu, Kohavi, Walker, "Improving the
    * Sensitivity of Online Controlled Experiments by Utilizing
    * Pre-Experiment Data", WSDM 2013): per unit, Y is the in-experiment
    * metric and X the same metric over the PRE-experiment window;
    * Y' = Y − θ(X − X̄) with the pooled θ = cov(X,Y)/var(X) strips the
    * between-user variance X explains, shrinking the experiment's
    * variance by exactly the X–Y correlation² — the single most widely
    * deployed variance-reduction trick in large-scale experimentation.
    *
    * Determinism discipline (the [[graft.ops.Functions.statsMoments]]
    * doctrine): per-EVENT values are rounded to integer units up front
    * (floor(v + 0.5) — so a metric whose per-event values are mostly
    * SUB-unit, e.g. rates in [0,1], collapses toward 0/1 and loses the
    * CUPED correlation: pre-scale such metrics to an integer unit —
    * cents, basis points — before calling; this rounding is the
    * operator's contract, not an accident),
    * all five cross-moments are EXACT int64 sums, and every emitted
    * float is one fixed IEEE expression tree over those integers —
    * order-independent, hash-gatable. int64 envelope: with per-unit
    * totals ≤ U and n units, |Σxy| ≤ n·U² (n·U² < 2⁶³ holds past 10⁹
    * units at U = 10⁵; the sums also stay under 2⁵³ there, so the
    * double conversion is exact). Shapes: one pre/post conditional
    * aggregate per unit (one shuffle on the unit key), a 2-row variant
    * rollup, and a broadcast of the pooled moments — nothing scales
    * with events except the first aggregate.
    */
  def cupedAdjust(
      df: DataFrame,
      variantCol: String,
      unitCol: String,
      valueCol: String,
      tsCol: String,
      cutoff: String): DataFrame = {
    val units = df
      .where(col(unitCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(unitCol).as("unit"), col(variantCol).as("variant"))
      .agg(
        sum(when(col(tsCol) < lit(cutoff).cast("timestamp"),
          expr(s"cast(floor($valueCol + 0.5d) as bigint)")).otherwise(0L)).as("x"),
        sum(when(col(tsCol) >= lit(cutoff).cast("timestamp"),
          expr(s"cast(floor($valueCol + 0.5d) as bigint)")).otherwise(0L)).as("y"))
    val perVariant = units
      .groupBy(col("variant"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("y") * col("y")).as("syy"))
    val pooled = perVariant
      .agg(sum(col("n")).as("pn"), sum(col("sx")).as("psx"),
        sum(col("sy")).as("psy"), sum(col("sxx")).as("psxx"),
        sum(col("sxy")).as("psxy"))
    perVariant.crossJoin(broadcast(pooled)).selectExpr(
      "variant", "n", "sx", "sy", "sxy", "sxx", "syy",
      // pooled θ: ONE division over double products of exact int64 sums,
      // guarded by the INTEGER var(X) witness — pooled var(X) = 0 (no
      // pre-period events, or constant X) means no covariate signal:
      // θ is NULL and the adjustment below is a no-op, never NaN/Inf
      """case when pn * psxx <> psx * psx then
        |  (cast(pn as double) * cast(psxy as double) - cast(psx as double) * cast(psy as double))
        |  / (cast(pn as double) * cast(psxx as double) - cast(psx as double) * cast(psx as double))
        |end as theta""".stripMargin,
      "cast(psx as double) / cast(pn as double) as x_bar",
      "cast(sy as double) / cast(n as double) as mean_y")
      .selectExpr(
        "variant", "n", "sx", "sy", "sxy", "sxx", "syy", "theta", "mean_y",
        // mean of Y' = mean_y − θ(mean_x − x̄): fixed expression tree;
        // NULL θ (zero pooled var(X)) applies a zero adjustment
        "mean_y - coalesce(theta, 0.0d) * (cast(sx as double) / cast(n as double) - x_bar) as mean_y_adj",
        // population variances per variant, then the CUPED identity
        // var(Y−θX) = var(Y) − 2θcov(X,Y) + θ²var(X)
        """(cast(n as double) * cast(syy as double) - cast(sy as double) * cast(sy as double))
          | / (cast(n as double) * cast(n as double)) as var_y""".stripMargin,
        """((cast(n as double) * cast(syy as double) - cast(sy as double) * cast(sy as double))
          |  - 2.0d * coalesce(theta, 0.0d) * (cast(n as double) * cast(sxy as double) - cast(sx as double) * cast(sy as double))
          |  + coalesce(theta, 0.0d) * coalesce(theta, 0.0d) * (cast(n as double) * cast(sxx as double) - cast(sx as double) * cast(sx as double)))
          | / (cast(n as double) * cast(n as double)) as var_y_adj""".stripMargin)
      .selectExpr(
        "variant", "n", "sx", "sy", "sxy", "theta", "mean_y", "mean_y_adj",
        "var_y", "var_y_adj",
        "case when var_y > 0.0d then 100.0d * (1.0d - var_y_adj / var_y) end as var_reduction_pct")
  }

  /** Deterministic two-level prefix sums over a (value, counts…) frame —
    * the shared scaffolding of [[ksTest]] and [[rocAuc]]: cumulative
    * order statistics WITHOUT a global-ORDER window (the scale-killer
    * [[graft.plans.PlanLint]] exists to flag). Values bucket by a FIXED
    * affine rule derived from the collected (min, max) — a 2-value
    * driver action, the [[graft.ops.Mining]] precedent — so bucket
    * assignment is a pure function of the value: unlike
    * `repartitionByRange` (whose sampled boundaries differ per
    * evaluation, making a twice-consumed exchange correct ONLY while
    * Spark happens to reuse it), the two consumers below (local running
    * sums; per-bucket offset totals) agree under ANY physical plan,
    * exchange reuse on or off. Each bucket's ROWS window is
    * bucket-bounded; the offset window runs over `buckets` rows — a
    * constant-size frame, not the data.
    *
    * Adds `cum_<c>` (INCLUSIVE running sum in value order) per
    * requested count column. Empty input → empty output.
    */
  private def bucketedPrefixSums(
      counts: DataFrame,
      valueCol: String,
      sumCols: Seq[String],
      buckets: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val mm = counts
      .agg(min(col(valueCol).cast("double")), max(col(valueCol).cast("double")))
      .head()
    val (mn, mx) =
      if (mm.isNullAt(0)) (0.0, 0.0)
      else (mm.getDouble(0), mm.getDouble(1))
    val width = (mx - mn) / buckets
    val bucket =
      if (width <= 0.0) lit(0)
      else least(lit(buckets - 1), greatest(lit(0),
        floor((col(valueCol).cast("double") - lit(mn)) / lit(width)).cast("int")))
    val parts = counts.withColumn("_bkt", bucket)
    val localW = Window.partitionBy(col("_bkt")).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offW = Window.orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parts.groupBy(col("_bkt"))
      .agg(sum(col(sumCols.head)).as(s"_t_${sumCols.head}"),
        sumCols.tail.map(c => sum(col(c)).as(s"_t_$c")): _*)
      .select(col("_bkt") +: sumCols.map(c =>
        coalesce(sum(col(s"_t_$c")).over(offW), lit(0L)).as(s"_o_$c")): _*)
    sumCols.foldLeft(parts) { (acc, c) =>
      acc.withColumn(s"_l_$c", sum(col(c)).over(localW))
    }
      .join(broadcast(offsets), "_bkt")
      .select(counts.columns.map(col) ++ sumCols.map(c =>
        (col(s"_l_$c") + col(s"_o_$c")).as(s"cum_$c")): _*)
  }

  /** Exact two-sample Kolmogorov–Smirnov statistic, distributed — the
    * unbinned complement to [[psiDrift]]'s binned PSI: D = max over the
    * pooled support of |F_a − F_b|, computed as the integer witness
    * D_num = max |n_b·cum_a(v) − n_a·cum_b(v)| with ONE terminal
    * division by n_a·n_b, so threshold decisions are exact (int64
    * envelope: n_a·n_b < 2⁶³ holds to ~3·10⁹ rows per side). Cumulative
    * distributions come from [[bucketedPrefixSums]] (deterministic
    * buckets, no global-order window). Output: one row — or ZERO rows
    * when no input row qualifies, matching the oracle's empty grouped
    * aggregate rather than emitting an all-NULL row.
    */
  def ksTest(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      groupA: String,
      groupB: String): DataFrame = {
    val counts = df
      .where(col(groupCol).isin(groupA, groupB) && col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("v"))
      .agg(
        sum(when(col(groupCol) === groupA, 1L).otherwise(0L)).as("ca"),
        sum(when(col(groupCol) === groupB, 1L).otherwise(0L)).as("cb"))
    val cums = bucketedPrefixSums(counts, "v", Seq("ca", "cb"))
    val tot = counts.agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"))
    cums.crossJoin(broadcast(tot))
      .agg(
        max(col("n_a")).as("n_a"),
        max(col("n_b")).as("n_b"),
        max(abs(col("cum_ca") * col("n_b") - col("cum_cb") * col("n_a"))).as("d_num"))
      .where(col("n_a").isNotNull)
      .selectExpr("n_a", "n_b", "d_num",
        "cast(d_num as double) / (cast(n_a as double) * cast(n_b as double)) as d")
  }

  /** Exact ROC-AUC by the Mann–Whitney rank statistic — the
    * threshold-free ranking metric every classifier eval reports,
    * computed EXACTLY (ties get average ranks, carried as the integer
    * 2·ΣR so no half ever floats): per distinct score s with cp(s)
    * positives of ct(s) rows and B(s) rows strictly below,
    * 2·ΣR_pos = Σ cp·(2B + ct + 1), and
    * AUC = (2ΣR_pos − n_pos(n_pos+1)) / (2·n_pos·n_neg) — integer
    * witnesses, ONE terminal division. Envelope: 2ΣR ≤ 2n² (safe past
    * 10⁹ rows). Ties group on the RAW score value — fractional
    * classifier probabilities rank exactly; no cast ever collapses
    * distinct scores into accidental ties. Cumulative-below counts come
    * from [[bucketedPrefixSums]] (B = inclusive cum − own count). Zero
    * rows out on empty input, like [[ksTest]].
    */
  def rocAuc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val g = df
      .where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(scoreCol).as("sc"))
      .agg(
        sum(when(col(labelCol), 1L).otherwise(0L)).as("cp"),
        count(lit(1)).as("ct"))
    val tot = g.agg(
      sum(col("cp")).as("n_pos"),
      (sum(col("ct")) - sum(col("cp"))).as("n_neg"))
    bucketedPrefixSums(g, "sc", Seq("ct"))
      .select(col("cp"), col("ct"), (col("cum_ct") - col("ct")).as("b"))
      .crossJoin(broadcast(tot))
      .agg(
        max(col("n_pos")).as("n_pos"),
        max(col("n_neg")).as("n_neg"),
        (sum(col("cp") * (col("b") * 2 + col("ct") + 1)) -
          max(col("n_pos") * (col("n_pos") + 1))).as("auc_num2"))
      .where(col("n_pos").isNotNull)
      .selectExpr("n_pos", "n_neg", "auc_num2",
        "cast(auc_num2 as double) / (2.0d * cast(n_pos as double) * cast(n_neg as double)) as auc")
  }

  /** Split-conformal prediction intervals (Vovk; Lei et al. 2018, the
    * distribution-free coverage guarantee every production regressor
    * should ship with): fit a point predictor on the TRAIN hash-band,
    * take q̂ = the ⌈(n_cal+1)(1−α)⌉-th smallest absolute residual on the
    * disjoint CALIBRATION band, and the interval ŷ ± q̂ then covers a
    * fresh row's value with probability ≥ 1−α — no distributional
    * assumption. The TEST band reports the realized coverage, which the
    * guarantee says lands at ≈ 1−α.
    *
    * Fully integer-exact: the predictor is the per-group train mean
    * carried as the RATIONAL sx/n (never divided), so the residual
    * |y − sx/n| scales to the exact int64 |cents·n_train − sx|; q̂ is a
    * k-th order statistic of integers (a group-bounded rank window, no
    * global sort); the coverage test |cents·n − sx| ≤ q̂ is a pure
    * integer comparison — a row exactly on the interval edge can never
    * flip engines. Envelope: cents·n_train < 2⁶³ to ~10⁹ train rows of
    * 6-figure values per group.
    *
    * `alphaPct` is the miscoverage in percent (10 → 90% intervals); the
    * rank k = ⌈(1−α)(n_cal+1)⌉ is computed in integers.
    *
    * Shape: three hash-band filters of ONE scan, a per-group train
    * aggregate (broadcast-sized), a support-sized cumulative window for
    * the order statistic, and one integer-compare aggregate over test
    * rows. Nothing global. Groups with no train or no calibration rows
    * emit NOTHING (inner joins — conformal coverage is undefined
    * without both bands; the oracle mirrors the drop).
    */
  def conformalInterval(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      valueCol: String,
      alphaPct: Int = 10): DataFrame = {
    require(alphaPct >= 1 && alphaPct < 100,
      s"alphaPct must be in [1, 100), got $alphaPct")
    import org.apache.spark.sql.expressions.Window
    val h = graft.ext.TextOps.md5Long64(s"concat('conf:', cast($idCol as string))")
    val base = df
      .where(col(valueCol).isNotNull && col(idCol).isNotNull &&
        col(groupCol).isNotNull)
      .selectExpr(idCol, groupCol, valueCol,
        s"cast(floor($valueCol * 100.0d + 0.5d) as bigint) as _cents",
        s"pmod($h, 100) as _band")
    val train = base.where(col("_band") < 50)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_train"), sum(col("_cents")).as("sx"))
    val cal = base.where(col("_band") >= 50 && col("_band") < 75)
      .join(broadcast(train), Seq(groupCol))
      .withColumn("_resid", abs(col("_cents") * col("n_train") - col("sx")))
    // k-th order statistic WITHOUT ranking raw rows: with ~|groups|
    // window partitions, a per-row rank sorts the whole calibration
    // band inside a handful of tasks (measured 5.2 s at the 100× probe).
    // Collapse to per-(group, residual) counts first — map-side
    // combined, support-sized — and select the residual whose
    // cumulative-count range covers k (identical to the rank-k row:
    // ties collapse onto one support row). The window now runs over the
    // residual SUPPORT per group, not the data.
    val calCounts = cal
      .groupBy(col(groupCol), col("_resid"))
      .agg(count(lit(1)).as("_c"))
    val wCum = Window.partitionBy(col(groupCol)).orderBy(col("_resid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wGrp = Window.partitionBy(col(groupCol))
    val calRanked = calCounts
      .withColumn("_cum", sum(col("_c")).over(wCum))
      .withColumn("n_cal", sum(col("_c")).over(wGrp))
      // k = ceil((1-α)(n_cal+1)) via the positive-operand form
      // (a + b - 1) div b — safe under BOTH truncating and flooring
      // integer division, so the two engines cannot disagree
      .withColumn("_k",
        least(col("n_cal"),
          expr(s"(${100 - alphaPct} * (n_cal + 1) + 99) div 100")))
      .where(col("_cum") - col("_c") < col("_k") && col("_k") <= col("_cum"))
      .select(col(groupCol), col("n_cal"), col("_resid").as("qhat_scaled"))
    val test = base.where(col("_band") >= 75)
      .join(broadcast(train), Seq(groupCol))
      .join(broadcast(calRanked), Seq(groupCol))
      .groupBy(col(groupCol), col("n_train"), col("n_cal"), col("qhat_scaled"))
      .agg(
        count(lit(1)).as("n_test"),
        sum(when(abs(col("_cents") * col("n_train") - col("sx")) <=
          col("qhat_scaled"), 1L).otherwise(0L)).as("n_covered"))
    test
      .select(col(groupCol), col("n_train"), col("n_cal"), col("n_test"),
        col("qhat_scaled"), col("n_covered"),
        (col("n_covered").cast("double") / col("n_test").cast("double"))
          .as("coverage"))
      .orderBy(col(groupCol))
  }

  /** Calibration curve (reliability diagram) of a score against a binary
    * outcome — the eval that catches a model whose RANKING is fine
    * (high AUC) but whose probabilities lie: per equal-width score
    * bucket, the mean score vs the realized positive rate. Perfectly
    * calibrated ⇒ the two track each other; the table IS the diagram.
    *
    * Scores are carried as MICRO-UNIT fixed point —
    * floor(score·10⁶ + 0.5), the [[conformalInterval]] cents idiom at
    * 1e-6 resolution — so fractional classifier probabilities in [0,1]
    * (the operator's primary input) spread across every bucket instead
    * of silently collapsing under an integer cast, the rocAuc defect
    * class this operator must not repeat. Bucketing is then the
    * pure-integer affine rule (sc_fp − min)·buckets div (max − min + 1)
    * over the OBSERVED fixed-point range — min/max come from the same
    * aggregate-and-broadcast idiom as [[bucketedPrefixSums]]' bounds,
    * the numerator is non-negative so truncating and flooring division
    * agree, and bucket identity is exact and engine-independent (never
    * a sampled/ntile boundary). Counts are exact int64; the score sum
    * is lifted to decimal(38,0) (micro-units × corpus rows outgrow
    * int64 near 10¹² rows of unit-scale scores — the scalerFitApply
    * lesson); mean score, bucket bounds and positive rate are terminal
    * divisions back to score units.
    */
  def calibrationCurve(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      buckets: Int = 10): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val base = df
      .where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(
        expr(s"cast(floor($scoreCol * 1000000.0d + 0.5d) as bigint)").as("sc_fp"),
        col(labelCol).as("y"))
    val bounds = base.agg(min(col("sc_fp")).as("mn"), max(col("sc_fp")).as("mx"))
    base.crossJoin(broadcast(bounds))
      // the bucket multiply is lifted to decimal(38,0) like the score sum
      // (ADVICE r15): in int64 the product (sc_fp − mn)·buckets would cap
      // the usable score RANGE at ~2⁶³/(10⁶·buckets) ≈ 9.2e11 score units
      // — unreachable for probabilities but not for raw logits/amounts;
      // on decimal the envelope is gone. MUST be `div`, not
      // floor(a / b): decimal `/` rounds HALF_UP at the result scale, so
      // the max element's 9.999…·10⁻¹ quotient rounds to the next bucket
      // before floor sees it; `div` divides exactly and truncates.
      .withColumn("bucket",
        expr(s"(cast(sc_fp - mn as decimal(38,0)) * $buckets" +
          s" div (mx - mn + 1)) ").cast("int"))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("y"), 1L).otherwise(0L)).as("n_pos"),
        sum(col("sc_fp").cast("decimal(38,0)")).as("sum_fp"),
        min(col("sc_fp")).as("lo_fp"),
        max(col("sc_fp")).as("hi_fp"))
      .select(col("bucket"), col("n"), col("n_pos"),
        (col("lo_fp").cast("double") / 1000000.0d).as("bucket_lo"),
        (col("hi_fp").cast("double") / 1000000.0d).as("bucket_hi"),
        (col("sum_fp").cast("double") / col("n").cast("double") / 1000000.0d)
          .as("mean_score"),
        (col("n_pos").cast("double") / col("n").cast("double")).as("pos_rate"))
      .orderBy(col("bucket"))
  }

  /** Keyed pseudonymization with referential integrity — the privacy
    * transform between raw IDs and the release-audit trio
    * ([[lDiversity]]/[[tCloseness]]): every occurrence of an ID, in ANY
    * table pseudonymized with the SAME salt, maps to the same opaque
    * token (md5(salt:id)), so joins, session grouping, and per-user
    * aggregates still work downstream while the raw identifier never
    * leaves the boundary. Deterministic and stateless — no mapping
    * table to store, leak, or replay (the mapping-table alternative is
    * itself PII); rotation = a new salt. 128-bit md5 makes accidental
    * collisions (two users merging) negligible to ~2⁶⁴ ids, and the
    * gate's distinct-preservation check would catch one.
    *
    * NOT encryption: md5 here is a keyed one-way label, and a
    * low-entropy ID space (user_id ∈ [1, 10⁶]) is enumerable by anyone
    * who learns the salt — treat the salt as a secret with the same
    * handling as a key, exactly as HMAC-based tokenization deployments
    * do (a compiled HMAC-SHA256 expression is the drop-in hardening;
    * md5 keeps the gate cross-engine here).
    *
    * Shape: a pure projection — zero exchanges, scan speed; the
    * downstream join keys change bytes, not cardinality or partitioning.
    */
  def pseudonymize(df: DataFrame, idCol: String, salt: String): DataFrame = {
    require(salt.nonEmpty, "pseudonymize needs a non-empty salt")
    require(!salt.contains("'"), "salt must not contain quotes")
    df.withColumn(s"${idCol}_pseudo",
      when(col(idCol).isNotNull,
        md5(concat(lit(s"$salt:"), col(idCol).cast("string")))))
      .drop(idCol)
  }

  /** Weight-of-Evidence and Information Value per category — THE
    * credit-scoring / feature-selection screen for a categorical feature
    * against a binary outcome (Siddiqi, "Credit Risk Scorecards"):
    * WOE_c = ln((pos_c/P)/(neg_c/N)), IV contribution
    * (pos_c/P − neg_c/N)·WOE_c; categories with an IV sum ≥ 0.3 are
    * strong predictors, ≤ 0.02 useless. Emitted per category so the gate
    * hashes each row; callers sum iv_term for the feature's IV.
    *
    * Exactness: counts are exact int64; WOE's argument is ONE division
    * of exact int64 products (pos·N / neg·P); ln() may differ in the
    * last ulp across libm implementations, so WOE and the IV term are
    * rounded to 6 dp — the [[psiDrift]] precedent. Zero-cell categories
    * (no positives or no negatives) emit NULL WOE/term rather than ±Inf
    * (the standard fix is a smoothing constant; an audit must show the
    * raw degenerate cell, not hide it). A NULL category is a real
    * category (the [[graft.ops.Audit.sampleAudit]] convention).
    */
  def woeIv(df: DataFrame, catCol: String, labelCol: String): DataFrame = {
    val g = df
      .where(col(labelCol).isNotNull)
      .groupBy(col(catCol).as("category"))
      .agg(
        sum(when(col(labelCol), 1L).otherwise(0L)).as("n_pos"),
        count(lit(1)).as("n_all"))
      .select(col("category"), col("n_pos"),
        (col("n_all") - col("n_pos")).as("n_neg"))
    val tot = g.agg(sum(col("n_pos")).as("p_tot"), sum(col("n_neg")).as("n_tot"))
    g.crossJoin(broadcast(tot))
      .selectExpr("category", "n_pos", "n_neg",
        """CASE WHEN n_pos > 0 AND n_neg > 0 AND p_tot > 0 AND n_tot > 0
          |     THEN round(ln(cast(n_pos * n_tot as double)
          |                   / cast(n_neg * p_tot as double)), 6) END AS woe""".stripMargin,
        """CASE WHEN n_pos > 0 AND n_neg > 0 AND p_tot > 0 AND n_tot > 0
          |     THEN round((cast(n_pos as double) / cast(p_tot as double)
          |                 - cast(n_neg as double) / cast(n_tot as double))
          |                * ln(cast(n_pos * n_tot as double)
          |                     / cast(n_neg * p_tot as double)), 6) END AS iv_term""".stripMargin)
      .orderBy(col("category"))
  }

  /** Per-group NULL imputation with the exact LOWER-MEDIAN of the
    * group's known values — the feature-engineering fill that is robust
    * to the skew a mean would inherit, chosen as an exact ELEMENT
    * (row_number = ⌈n/2⌉ under value order) rather than an interpolated
    * midpoint, so no cross-engine float interpolation exists to drift.
    * Rows in groups with NO known value stay NULL (flagged, not
    * invented).
    *
    * The median is SELECTED OVER THE VALUE SUPPORT, not ranked over raw
    * rows (the [[conformalInterval]] order-statistic doctrine): rows
    * collapse to per-(group, value) counts first, the cumulative window
    * then runs over the support — bounded by the number of DISTINCT
    * values per group, not the row count — and the k-th element
    * (k = (n+1) div 2, the lower median) is the support row whose
    * cumulative range straddles k. Identical result to a raw-row
    * row_number at any scale, without ever sorting a data-sized window
    * partition. One aggregate, one support-sized window, one
    * broadcast-sized join-back.
    */
  def imputeMedian(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df
      .select(col(groupCol).as("_g"), col(valueCol).as("_v"))
      .where(col("_v").isNotNull)
      .groupBy(col("_g"), col("_v"))
      .agg(count(lit(1)).as("_c"))
    val wCum = Window.partitionBy(col("_g")).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val med = counts
      .withColumn("_cum", sum(col("_c")).over(wCum))
      .withColumn("_n", sum(col("_c")).over(Window.partitionBy(col("_g"))))
      .withColumn("_k", expr("(_n + 1) div 2"))
      .where(col("_cum") - col("_c") < col("_k") && col("_k") <= col("_cum"))
      .select(col("_g"), col("_v").as("_med"))
    df.join(med, col(groupCol) <=> col("_g"), "left")
      .select(df.columns.map(col) :+
        coalesce(col(valueCol), col("_med")).as(s"${valueCol}_imputed") :+
        col(valueCol).isNull.as("was_imputed"): _*)
  }

  /** Column-profile drift between two snapshots of a table — the
    * "did the upstream schema/semantics shift" check run at every
    * ingest boundary: per column, null count, EXACT distinct count, and
    * min/max (stringified for a uniform row schema), before vs after,
    * with three integer-exact verdict flags (`distinct_changed`,
    * `range_changed` via null-safe compares, `null_rate_up` via
    * cross-multiplication — no float rate ever computed).
    *
    * Scale shape: one two-level aggregation PER COLUMN per side — level
    * 1 is `groupBy(col).count()` (hash-aggregated, map-side combined, so
    * only the column's distinct values cross the wire), level 2 folds
    * that value-histogram into every metric at once: n = Σ counts,
    * null_n = the NULL group's count, distinct_n = the non-null group
    * count (≡ COUNT(DISTINCT col)), min/max over the group keys. This
    * replaces the former single-pass multi-COUNT(DISTINCT) aggregate,
    * whose Expand multiplied every row ×(cols+1) and whose string
    * min/max buffers forced full-width SortAggregates below the
    * exchange; each per-column scan prunes to that one parquet column,
    * so total column-bytes read are unchanged. Exactness is free here
    * (the histogram is exact); at truly pathological cardinalities swap
    * `approx_count_distinct` in — the sketch-gate idiom covers the
    * accuracy contract.
    */
  def profileDiff(before: DataFrame, after: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    def profile(df: DataFrame, side: String): DataFrame =
      cols.map { c =>
        df.groupBy(col(c)).agg(count(lit(1)).as("_cnt"))
          .agg(
            // empty side: zero groups -> sum is NULL, the old count was 0
            coalesce(sum(col("_cnt")), lit(0L)).as(s"n_$side"),
            coalesce(sum(when(col(c).isNull, col("_cnt"))), lit(0L))
              .as(s"null_n_$side"),
            count(col(c)).as(s"distinct_n_$side"),
            min(col(c)).cast("string").as(s"min_$side"),
            max(col(c)).cast("string").as(s"max_$side"))
          .select(lit(c).as("col_name"), col(s"n_$side"), col(s"null_n_$side"),
            col(s"distinct_n_$side"), col(s"min_$side"), col(s"max_$side"))
      }.reduce(_ unionByName _)
    profile(before, "before").join(profile(after, "after"), Seq("col_name"))
      .select(col("col_name"),
        col("n_before"), col("n_after"),
        col("null_n_before"), col("null_n_after"),
        col("distinct_n_before"), col("distinct_n_after"),
        col("min_before"), col("min_after"),
        col("max_before"), col("max_after"),
        (col("distinct_n_before") =!= col("distinct_n_after")).as("distinct_changed"),
        (!((col("min_before") <=> col("min_after")) &&
          (col("max_before") <=> col("max_after")))).as("range_changed"),
        (col("null_n_after") * col("n_before") >
          col("null_n_before") * col("n_after")).as("null_rate_up"))
  }

  /** Cohen's kappa inter-labeler agreement — the training-data QA check
    * for "do these two annotators/classifiers agree beyond chance".
    * κ = (N·Σagree − Σₖ aₖ·bₖ) / (N² − Σₖ aₖ·bₖ): numerator and
    * denominator are EXACT int64 products (emitted as columns), κ is
    * their single IEEE division, NULL when the denominator is 0 (both
    * sides constant and equal — chance agreement is already 1). Rows
    * where either label is NULL are excluded (agreement is undefined).
    * Three map-side-combined aggregates over one pass each; the
    * marginal product join is on the label vocabulary, not the corpus.
    */
  /** Offline ranking-quality evaluation — precision@k, recall@k, MRR@10
    * — the metrics a retrieval / dedup-candidate / recommender pipeline
    * reports per experiment. Each group in `queryCol` is one "query";
    * its rows are the ranked list (by `scoreCol` desc, `tieCol` asc for
    * determinism); `relCol` is the boolean relevance label.
    *
    * Every metric stays EXACT and engine-portable: hits@k and the
    * relevant totals are integer sums; the reciprocal-rank sum is kept
    * as the integer Σ 2520/first_rank (2520 = lcm(1..10), so every
    * in-window reciprocal is exact), and each final metric is ONE IEEE
    * division of two integers — bit-identical in any engine. Shape: one
    * ranking window partitioned by query + two map-side-combined
    * aggregates; output is |ks| rows however large the corpus.
    */
  def rankEval(
      df: DataFrame,
      queryCol: String,
      relCol: Column,
      scoreCol: String,
      tieCol: String,
      ks: Seq[Int] = Seq(1, 3, 5)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(ks.nonEmpty && ks.forall(k => k >= 1 && k <= 10),
      s"ks must be within [1,10] (the lcm-2520 reciprocal window), got $ks")
    val w = Window.partitionBy(col("q"))
      .orderBy(col(scoreCol).desc, col(tieCol).asc)
    val ranked = df.select(
      col(queryCol).as("q"), relCol.cast("int").as("rel"),
      col(scoreCol), col(tieCol))
      .withColumn("rnk", row_number().over(w))
    val perAggs = ks.map(k =>
      sum(when(col("rnk") <= k, col("rel")).otherwise(0)).as(s"h$k")) :+
      min(when(col("rel") === 1 && col("rnk") <= 10, col("rnk"))).as("first_rel")
    val per = ranked.groupBy(col("q"))
      .agg(sum(col("rel")).as("n_rel"), perAggs: _*)
    val totAggs = ks.map(k => sum(col(s"h$k")).as(s"s$k")) :+
      sum(coalesce(expr("2520 div first_rel"), lit(0L))).as("mrr_num")
    val tot = per.agg(
      count(lit(1)).as("n_queries"),
      sum(col("n_rel")).as("sum_relevant") +: totAggs: _*)
    val perK = ks.map(k =>
      struct(lit(k).as("k"), col(s"s$k").cast("bigint").as("sum_hits")))
    tot.select(col("n_queries"), col("sum_relevant").cast("bigint").as("sum_relevant"),
      col("mrr_num").cast("bigint").as("mrr_num"),
      explode(array(perK: _*)).as("kk"))
      .select(
        col("kk.k").as("k"), col("n_queries"), col("sum_relevant"),
        col("kk.sum_hits").as("sum_hits"), col("mrr_num"),
        (col("kk.sum_hits").cast("double") / (col("kk.k") * col("n_queries")))
          .as("precision_at_k"),
        (col("kk.sum_hits").cast("double") / col("sum_relevant")).as("recall_at_k"),
        (col("mrr_num").cast("double") / (lit(2520.0) * col("n_queries")))
          .as("mrr_at_10"))
  }

  def labelAgreement(df: DataFrame, colA: String, colB: String): DataFrame = {
    val base = df
      .select(col(colA).cast("string").as("a"), col(colB).cast("string").as("b"))
      .where(col("a").isNotNull && col("b").isNotNull)
    val tot = base.agg(
      count(lit(1)).as("n"),
      count(when(col("a") === col("b"), 1)).as("n_agree"))
    val pe = base.groupBy(col("a")).agg(count(lit(1)).as("na"))
      .join(base.groupBy(col("b")).agg(count(lit(1)).as("nb")), col("a") === col("b"))
      .agg(coalesce(sum(col("na") * col("nb")), lit(0L)).as("pe_num"))
    tot.crossJoin(pe).select(
      col("n"), col("n_agree"), col("pe_num"),
      (col("n") * col("n_agree") - col("pe_num")).as("kappa_num"),
      (col("n") * col("n") - col("pe_num")).as("kappa_den"),
      when(col("n") * col("n") =!= col("pe_num"),
        (col("n") * col("n_agree") - col("pe_num")).cast("double") /
          (col("n") * col("n") - col("pe_num")).cast("double")).as("kappa"))
  }

  /** nDCG@k (binary relevance) — the graded complement to [[rankEval]]:
    * precision@k ignores WHERE in the window a hit lands, nDCG pays
    * rank 1 more than rank 10, which is what a retrieval experiment
    * actually optimizes.
    *
    * Exactness: the discount 1/log2(r+1) is irrational, so instead of
    * trusting two libm implementations to round identically, both
    * engines share one literal table of nano-scaled integer discounts
    * D_r = round(1e9/log2(r+1)) for r = 1..10 (the lcm-2520 doctrine
    * generalized to a fixed-point table). DCG and ideal-DCG are then
    * EXACT int64 sums of rel_r·D_r (ideal DCG for m relevant items is
    * the prefix sum P[min(m,k)] — binary relevance makes the ideal
    * ordering "all hits first"), and the corpus micro-nDCG is ONE
    * terminal IEEE division Σdcg/Σidcg. Queries with zero relevant
    * rows are excluded (nDCG is undefined there, and including them
    * would let an engine's 0/0 convention leak into the gate).
    *
    * Shape: one ranking window partitioned by query + one map-side-
    * combined aggregate; the discount lookup is `element_at` on a
    * 10-element array literal — no join. Output is |ks| rows however
    * large the corpus.
    */
  def ndcgEval(
      df: DataFrame,
      queryCol: String,
      relCol: Column,
      scoreCol: String,
      tieCol: String,
      ks: Seq[Int] = Seq(5, 10)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(ks.nonEmpty && ks.forall(k => k >= 1 && k <= 10),
      s"ks must be within [1,10] (the fixed-point discount table), got $ks")
    // round(1e9 / log2(r+1)), r = 1..10 — shared verbatim with the oracle
    val disc = Seq(1000000000L, 630929754L, 500000000L, 430676558L,
      386852807L, 356207187L, 333333333L, 315464877L, 301029996L, 289064826L)
    val prefix = disc.scanLeft(0L)(_ + _) // P(0)=0, P(m)=Σ_{r≤m} D_r
    val dArr = array(disc.map(lit): _*)
    val pArr = array(prefix.map(lit): _*)
    val w = Window.partitionBy(col("q"))
      .orderBy(col(scoreCol).desc, col(tieCol).asc)
    val ranked = df.select(
      col(queryCol).as("q"), relCol.cast("int").as("rel"),
      col(scoreCol), col(tieCol))
      .withColumn("rnk", row_number().over(w))
    val perAggs = ks.map(k =>
      sum(when(col("rnk") <= k && col("rel") === 1,
        element_at(dArr, col("rnk"))).otherwise(0L)).as(s"dcg$k"))
    val per = ranked.groupBy(col("q"))
      .agg(sum(col("rel")).as("n_rel"), perAggs: _*)
      .where(col("n_rel") > 0)
    val totAggs = ks.flatMap(k => Seq(
      sum(col(s"dcg$k")).as(s"sd$k"),
      // ideal DCG: m = min(n_rel, k) hits at the top → prefix sum P[m];
      // element_at is 1-indexed so P[m] lives at position m+1
      sum(element_at(pArr, least(col("n_rel"), lit(k)).cast("int") + 1))
        .as(s"si$k")))
    val tot = per.agg(count(lit(1)).as("n_queries"), totAggs: _*)
    val perK = ks.map(k =>
      struct(lit(k).as("k"),
        col(s"sd$k").cast("bigint").as("sum_dcg_scaled"),
        col(s"si$k").cast("bigint").as("sum_idcg_scaled")))
    tot.select(col("n_queries"), explode(array(perK: _*)).as("kk"))
      .select(
        col("kk.k").as("k"), col("n_queries").cast("bigint").as("n_queries"),
        col("kk.sum_dcg_scaled").as("sum_dcg_scaled"),
        col("kk.sum_idcg_scaled").as("sum_idcg_scaled"),
        (col("kk.sum_dcg_scaled").cast("double") /
          col("kk.sum_idcg_scaled").cast("double")).as("ndcg_micro"))
  }

  /** Rolling-window anomaly flags over daily counts — the complement to
    * [[controlChart]]'s GLOBAL Shewhart limits: a slow seasonal drift
    * moves the global mean and masks local spikes, while a trailing
    * 7-day window adapts. Flags |z| > 3 against the trailing window's
    * own mean/variance.
    *
    * Exactness: with m prior days of sum S and sum-of-squares Q,
    * z² > 9  ⟺  (m·y − S)² > 9·(m·Q − S²)  — every term an exact
    * int64 product of daily counts (spike_flag is PURE-INTEGER, so a
    * day exactly on the 3σ line can never flip engines; the printed z
    * is one terminal division pair for humans). Zero-variance windows
    * flag any deviation (a constant series then a jump IS anomalous).
    * Warm-up days (m < window) are emitted unflagged with m as the
    * witness — silently dropping them would hide the first week of a
    * new event type.
    *
    * Shape: daily counts are one map-side-combined aggregate (≤ types ×
    * days rows); the trailing window runs over THAT bounded frame,
    * partitioned by type — never over raw events.
    */
  def rollingAnomaly(
      events: DataFrame,
      typeCol: String,
      tsCol: String,
      window: Int = 7): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(window >= 2 && window <= 60, s"window must be in [2,60], got $window")
    // the shared daily-count frame (date_trunc day — the idiom every
    // drift reader gates on), renamed to y for the z-witness algebra
    val daily = dailyCounts(events, typeCol, tsCol)
      .select(col("etype"), col("day"), col("n").as("y"))
    val w = Window.partitionBy(col("etype")).orderBy(col("day"))
      .rowsBetween(-window, -1)
    val stats = daily
      .withColumn("m", count(col("y")).over(w))
      .withColumn("s", coalesce(sum(col("y")).over(w), lit(0L)))
      .withColumn("qq", coalesce(sum(col("y") * col("y")).over(w), lit(0L)))
    stats.select(
      col("etype"), col("day"), col("y").cast("bigint").as("y"),
      col("m").cast("bigint").as("m_window"),
      // integer z²-witness: z² > 9 ⟺ (my−S)² > 9(mQ−S²); the common m
      // factor is cancelled to keep the envelope inside int64 up to
      // ~1e8 events/day/type
      when(col("m") === window,
        ((col("m") * col("y") - col("s")) * (col("m") * col("y") - col("s"))) >
          (lit(9L) * (col("m") * col("qq") - col("s") * col("s"))))
        .otherwise(lit(false)).as("spike_flag"),
      // human-facing z (terminal divisions only; NULL in warm-up)
      when(col("m") === window && (col("m") * col("qq") > col("s") * col("s")),
        (col("y").cast("double") - col("s").cast("double") / col("m")) /
          sqrt((col("m") * col("qq") - col("s") * col("s")).cast("double") /
            (col("m").cast("double") * col("m").cast("double"))))
        .as("z"))
      .orderBy(col("etype"), col("day"))
  }
}
