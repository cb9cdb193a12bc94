package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.TextOps

/** Statistical audit operators: categorical-dependence testing
  * (mutual information / chi-square), a Benford first-digit fraud/DQ
  * screen, and deterministic Poisson-bootstrap confidence intervals.
  *
  * Cross-engine doctrine (shared with the rest of the suite): every
  * emitted number is either an exact integer, or ONE IEEE expression
  * over exact integers rounded to 6dp — both engines evaluate the same
  * expression tree, so there is no float-summation order to drift. The
  * only data-dependent float SUMS in this file are decimal-typed
  * (bootstrap replicate sums), which are order-free by construction.
  *
  * Scale shapes: all three operators reduce to one groupBy on a
  * low-cardinality key (cells / digits / nothing) plus broadcast joins
  * of 1-row or marginal frames; none shuffles the fact table more than
  * once and none holds more than the distinct-cell set in memory.
  */
object Audit {

  /** Pointwise mutual information and chi-square decomposition of two
    * categorical columns — the "are these columns independent?" audit a
    * curation pipeline runs before trusting a stratified sample or a
    * per-source quota (a lang×source dependence means per-source caps
    * silently reweight languages).
    *
    * One row per OBSERVED (x, y) cell: the joint count, both marginals,
    * the grand total, the independence-expected count, the cell's PMI
    * (natural log), and its chi-square contribution. The cell counts,
    * marginals and total are exact integers; `expected`, `pmi` and
    * `chi_comp` are single IEEE expressions over those integers rounded
    * to 6dp (chi uses the integer-numerator form
    * (n·n_xy − n_x·n_y)² / (n · n_x·n_y) so the subtraction happens in
    * exact int64 before any float enters; int64 holds it through
    * ~2×10⁹-row inputs — past that, lift the products to decimal).
    *
    * Scale shape: one shuffle on the (x, y) cell key — the fact table is
    * touched once; marginals and the total are re-aggregations of the
    * (tiny) cell frame, broadcast back. Unobserved cells (n_xy = 0)
    * contribute expected-but-no-PMI mass and are deliberately not
    * emitted: their chi term is e = n_x·n_y/n, recoverable from the
    * marginals, and emitting the dense cross product would turn a
    * sparse audit into |X|·|Y| rows.
    */
  def mutualInfo(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val cells = df
      .groupBy(col(xCol), col(yCol))
      .agg(count(lit(1)).as("n_xy"))
    val mx = cells.groupBy(col(xCol)).agg(sum(col("n_xy")).as("n_x"))
    val my = cells.groupBy(col(yCol)).agg(sum(col("n_xy")).as("n_y"))
    val tot = cells.agg(sum(col("n_xy")).as("n"))
    cells
      .join(broadcast(mx), Seq(xCol))
      .join(broadcast(my), Seq(yCol))
      .crossJoin(broadcast(tot))
      .select(
        col(xCol), col(yCol), col("n_xy"), col("n_x"), col("n_y"), col("n"),
        expr("round(CAST(n_x * n_y AS DOUBLE) / CAST(n AS DOUBLE), 6)")
          .as("expected"),
        expr("round(ln(CAST(n_xy * n AS DOUBLE) / CAST(n_x * n_y AS DOUBLE)), 6)")
          .as("pmi"),
        expr(
          """round((CAST(n_xy * n - n_x * n_y AS DOUBLE)
            |        * CAST(n_xy * n - n_x * n_y AS DOUBLE))
            |       / (CAST(n AS DOUBLE) * CAST(n_x * n_y AS DOUBLE)), 6)"""
            .stripMargin)
          .as("chi_comp"))
      .orderBy(col(xCol), col(yCol))
  }

  /** Benford first-significant-digit audit of a positive numeric
    * column — the classic fabricated-data / unit-mix screen: naturally
    * occurring multiplicative quantities put digit d first with
    * probability log10(1 + 1/d); price lists, capped fields, and
    * injected synthetics do not.
    *
    * Nine rows (digit 1–9): observed count, total, observed frequency,
    * the Benford expectation, and the chi-square component. The first
    * digit is extracted via floor + integer-string prefix — `floor` is
    * exact IEEE in both engines, and the string of an integral double
    * cast to int64 is unambiguous, whereas any log10-based mantissa
    * extraction would wobble at exact powers of ten. Rows with value
    * < 1 are excluded (their leading digit lives below the decimal
    * point; extend with a decimal-shift normalization if such data
    * matters).
    *
    * Scale shape: one map-side-combined groupBy on a 9-value key; the
    * 1-row total broadcast back. Nothing else moves.
    */
  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    val digits = df
      .where(col(valueCol) >= 1)
      .select(
        expr(s"CAST(substring(CAST(CAST(floor($valueCol) AS BIGINT) AS STRING), 1, 1) AS INT)")
          .as("digit"))
    val counts = digits.groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).as("total"))
    // the Benford probability appears three times (frequency, chi
    // numerator, chi denominator); keep the TEXT of the expression
    // identical everywhere so both engines fold the same tree
    val bf = "(ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0))"
    counts
      .crossJoin(broadcast(tot))
      .select(
        col("digit"), col("n"), col("total"),
        expr("round(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 6)").as("obs_freq"),
        expr(s"round($bf, 6)").as("benford_freq"),
        expr(
          s"""round(((CAST(n AS DOUBLE) - CAST(total AS DOUBLE) * $bf)
             |        * (CAST(n AS DOUBLE) - CAST(total AS DOUBLE) * $bf))
             |       / (CAST(total AS DOUBLE) * $bf), 6)""".stripMargin)
          .as("chi_comp"))
      .orderBy(col("digit"))
  }

  /** Poisson-bootstrap replicate means of a numeric column — the
    * scale-correct bootstrap: classical resampling draws n rows WITH
    * replacement per replicate (unshardable — a global multinomial),
    * but for large n the per-row resample count converges to
    * Poisson(1), which factorizes per row (Chamandy et al.,
    * "Estimating Uncertainty for Massive Data Streams", 2012). Each of
    * the `b` replicates weighs every row by an iid Poisson(1) count
    * derived DETERMINISTICALLY from md5(key, replicate) — stable under
    * retries, partition splits, and engines, where `rand()` is none of
    * those.
    *
    * Output: one row per replicate — its effective row count
    * (Σ weights) and its weighted mean. Quantiles of the `b` means are
    * the CI; they are left to the caller because the replicate frame IS
    * the distribution (b rows).
    *
    * Exactness: weights are integers from exact integer hash
    * comparisons (inverse-CDF thresholds scaled to the hash-family
    * modulus); the value is carried as integer CENTS
    * (round(value·100) — exact for 2-decimal money, measured ~35%
    * faster per replicate-sum than the decimal(18,2) form, and equally
    * order-free; int64 holds Σ cents·weight through ~10¹¹ rows — lift
    * to decimal past that); the mean is the single terminal IEEE
    * division, rounded 6dp.
    *
    * Scale shape: ONE pass over the fact table with 2·b aggregate
    * expressions (no b× row explosion), one 1-row shuffle, then a
    * driver-side `stack` to b rows. b scales as columns, not data. The
    * per-row cost is ONE md5 of the key: the b replicate uniforms come
    * from the same universal-hash family as the MinHash components
    * (u_r = (a_r·h + b_r) mod P over the md5's low 30 bits — all
    * products < 2⁴⁷, no engine-divergent overflow), which measured 8×
    * faster than hashing md5(key, r) per replicate.
    */
  def bootstrapCi(df: DataFrame, keyCol: String, valueCol: String, b: Int = 32): DataFrame = {
    require(b >= 1 && b <= 128, s"replicate count $b outside [1, 128]")
    // cumulative Poisson(1) CDF scaled to the modulus P = 2^30-35:
    // floor(P(X<=k) · P) for k = 0..5 — the same integer constants on
    // both engines
    val t = Seq(395007529L, 790015058L, 987518823L, 1053353411L,
      1069812058L, 1073103787L)
    def w(r: Int): String = {
      val u = s"((${graft.ext.Dedup.minhashA(r)} * h + ${graft.ext.Dedup.minhashB(r)}) % ${graft.ext.Dedup.MinhashP})"
      s"""(CASE WHEN $u < ${t(0)} THEN 0 WHEN $u < ${t(1)} THEN 1
         | WHEN $u < ${t(2)} THEN 2 WHEN $u < ${t(3)} THEN 3
         | WHEN $u < ${t(4)} THEN 4 WHEN $u < ${t(5)} THEN 5
         | ELSE 6 END)""".stripMargin
    }
    // ONE md5 per row; each replicate's weight is a cheap integer mix of
    // it, projected once because it feeds two aggregates
    val withW = df
      .select(
        expr(s"CAST(round($valueCol * 100) AS BIGINT)").as("vc"),
        expr(s"${TextOps.md5Long64(s"concat('bs:', CAST($keyCol AS STRING))")} % 1073741824")
          .as("h"))
      .select(
        col("vc") +: (0 until b).map(r => expr(w(r)).as(s"w_$r")): _*)
    val aggs = (0 until b).flatMap { r =>
      Seq(
        expr(s"SUM(w_$r)").as(s"n_$r"),
        expr(s"SUM(vc * w_$r)").as(s"s_$r"))
    }
    withW.agg(aggs.head, aggs.tail: _*)
      .selectExpr(
        s"stack($b, ${(0 until b).map(r => s"$r, n_$r, s_$r").mkString(", ")}) AS (rep, n_eff, s)")
      .select(
        col("rep"), col("n_eff"),
        expr("round(CAST(s AS DOUBLE) / (100.0 * CAST(n_eff AS DOUBLE)), 6)").as("mean_value"))
      .orderBy(col("rep"))
  }

  /** Discrete-time survival (hazard) table of the first-to-second-event
    * gap per user — the Kaplan–Meier ingredient table: time-to-repeat
    * with RIGHT CENSORING (a user whose second event hasn't happened by
    * the end of observation is not a non-repeater; ignoring censoring is
    * the classic retention-analysis bias). One row per observed day
    * offset t: the at-risk count (users whose event or censoring time is
    * ≥ t), repeat events at t, censorings at t, and the discrete hazard
    * d/n. Counts are exact integers — the risk set is a DESCENDING
    * cumulative integer sum, not a per-row self-join — and the hazard is
    * the single terminal division rounded 6dp. The KM survival curve is
    * Π(1 − hazard) over this table; the cumulative float product is left
    * to the caller (it has no order-free exact form, and the table IS
    * the estimator's sufficient statistic).
    *
    * Scale shape: one shuffle on user_id (first/second event via one
    * per-user window over (ts, id)), one groupBy on the day offset
    * (bounded by the observation span), one window over those ≤span
    * rows. The global observation end is a 1-row broadcast.
    */
  def hazardTable(events: DataFrame, userCol: String, tsCol: String, idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("u")).orderBy(col("ts"), col("id"))
    val firstTwo = events
      .select(col(userCol).as("u"), col(tsCol).as("ts"), col(idCol).as("id"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 2)
      .groupBy(col("u"))
      .agg(
        min(expr("CASE WHEN rn = 1 THEN ts END")).as("t1"),
        min(expr("CASE WHEN rn = 2 THEN ts END")).as("t2"))
    val obsEnd = events.agg(max(col(tsCol)).as("obs_end"))
    val spans = firstTwo
      .crossJoin(broadcast(obsEnd))
      .select(
        expr("CASE WHEN t2 IS NOT NULL THEN datediff(CAST(t2 AS DATE), CAST(t1 AS DATE)) ELSE datediff(CAST(obs_end AS DATE), CAST(t1 AS DATE)) END").as("t_day"),
        expr("CAST(t2 IS NOT NULL AS INT)").as("is_event"))
    val perDay = spans
      .groupBy(col("t_day"))
      .agg(
        sum(col("is_event")).as("d"),
        sum(expr("1 - is_event")).as("c"))
    // the risk-set window is global but runs over the PER-DAY frame —
    // bounded by the observation span in days, not the event count
    perDay
      .withColumn("n_risk",
        sum(expr("d + c")).over(org.apache.spark.sql.expressions.Window
          .orderBy(col("t_day").desc)
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .select(col("t_day"), col("n_risk"), col("d"), col("c"),
        expr("round(CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE), 6)").as("hazard"))
      .orderBy(col("t_day"))
  }

  /** Exact single change-point per event type over its daily counts —
    * binary segmentation's first split (Scott & Knott 1974 lineage):
    * the day boundary maximizing the between-segment mean gap. The
    * score |S₁n₂ − S₂n₁| / (n₁n₂) stays an EXACT RATIONAL (int64
    * numerator/denominator); the arg-max is taken under the total
    * order (⌊10⁶·num/den⌋, num, den desc, k) — the first key is one
    * integer floor-division (identical cross-engine), the tie-breaks
    * make the order total, so both engines pick the same split (the
    * `trendSlope` median discipline). Means are over OBSERVED days;
    * types with a single observed day have no interior split and are
    * not emitted.
    *
    * Scale shape: one (type, day) aggregate, then windows over the
    * ≤span-days per-type frames — the candidate set is D−1 rows per
    * type, never the event count; types parallelize freely.
    */
  def changePoint(events: DataFrame, typeCol: String, tsCol: String): DataFrame =
    changePointFromDaily(Quality.dailyCounts(events, typeCol, tsCol))

  /** [[changePoint]] over base events plus everything
    * [[Quality.cusumDriftSink]] committed — the sixth reader over the
    * shared streaming daily-count store (CUSUM detects drift, this
    * localizes WHEN it started; one bounded store, k monitoring views).
    */
  def changePointFrom(
      spark: org.apache.spark.sql.SparkSession,
      base: DataFrame,
      typeCol: String,
      tsCol: String,
      outDir: String): DataFrame =
    changePointFromDaily(Quality.mergedDaily(spark, base, typeCol, tsCol, outDir))

  private def changePointFromDaily(daily: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy(col("etype")).orderBy(col("day"))
    val wAll = Window.partitionBy(col("etype"))
    val cand = daily
      .withColumn("k", row_number().over(wOrd))
      .withColumn("s1",
        sum(col("n")).over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("d_days", count(lit(1)).over(wAll))
      .withColumn("total", sum(col("n")).over(wAll))
      .where(col("k") < col("d_days"))
      .select(
        col("etype"), col("day").as("split_day"),
        col("k").as("n1"), (col("d_days") - col("k")).as("n2"),
        col("s1"), (col("total") - col("s1")).as("s2"))
      .withColumn("num", expr("abs(s1 * n2 - s2 * n1)"))
      .withColumn("den", expr("n1 * n2"))
    cand
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("etype")).orderBy(
          expr("num * 1000000 div den").desc, col("num").desc,
          col("den").asc, col("n1").asc)))
      .where(col("rn") === 1)
      .select(
        col("etype"), col("split_day"), col("n1"), col("n2"), col("s1"), col("s2"),
        expr("round(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE), 6)")
          .as("mean_gap"))
      .orderBy(col("etype"))
  }

  /** Out-of-order-arrival telemetry per user — the event-pipeline DQ
    * check every watermark/session design silently assumes was done:
    * with `idCol` as the ingestion sequence, count the adjacent steps
    * whose event time goes BACKWARD and the worst backward skew. A
    * pipeline seeing nonzero inversions needs its watermark delay at
    * least `max_backstep_us`; one seeing none can tighten it. All
    * integers (unix-microsecond deltas).
    *
    * Scale shape: one user-keyed window (lag) + one user-keyed
    * aggregate — the same single shuffle every sessionization already
    * pays.
    */
  def orderAudit(events: DataFrame, userCol: String, tsCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col(idCol))
    events
      .select(col(userCol).as("user_id"),
        expr(s"unix_micros($tsCol)").as("tus"), col(idCol).as("id"))
      .withColumn("prev", lag(col("tus"), 1).over(
        Window.partitionBy(col("user_id")).orderBy(col("id"))))
      .select(col("user_id"),
        expr("CASE WHEN prev IS NOT NULL AND prev > tus THEN prev - tus ELSE 0 END")
          .as("back_us"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(expr("CAST(back_us > 0 AS INT)")).as("n_inversions"),
        max(col("back_us")).as("max_backstep_us"))
      .orderBy(col("user_id"))
  }

  /** Shewhart c-chart of daily event counts per type — the SPC monitor
    * a pipeline dashboard runs over arrival volumes: center c̄ = S/D,
    * limits c̄ ± 3√c̄ (counts are Poisson-ish; √ of the mean is the
    * textbook sigma). The printed limits are single IEEE expressions
    * (sqrt is correctly rounded by IEEE 754 in both engines) rounded
    * 6dp, but the BREACH FLAGS are pure integer comparisons —
    * (yD − S)² > 9SD on the matching side — so a point on the line
    * can never flip between engines.
    *
    * Scale shape: one (type, day) aggregate plus a per-type 2-column
    * re-aggregate broadcast back; the chart frame is span-bounded.
    */
  def controlChart(events: DataFrame, typeCol: String, tsCol: String): DataFrame =
    controlChartFromDaily(Quality.dailyCounts(events, typeCol, tsCol))

  /** [[controlChart]] over the same merged store; see
    * [[changePointFrom]] — the seventh reader over the shared
    * daily-count partials.
    */
  def controlChartFrom(
      spark: org.apache.spark.sql.SparkSession,
      base: DataFrame,
      typeCol: String,
      tsCol: String,
      outDir: String): DataFrame =
    controlChartFromDaily(Quality.mergedDaily(spark, base, typeCol, tsCol, outDir))

  private def controlChartFromDaily(daily: DataFrame): DataFrame = {
    val tot = daily.groupBy(col("etype"))
      .agg(sum(col("n")).as("s_total"), count(lit(1)).as("n_days"))
    val m = "(CAST(s_total AS DOUBLE) / CAST(n_days AS DOUBLE))"
    daily
      .join(broadcast(tot), Seq("etype"))
      .select(
        col("etype"), col("day"), col("n"), col("s_total"), col("n_days"),
        expr(s"round($m + 3.0 * sqrt($m), 6)").as("ucl"),
        expr(s"round(greatest(0.0, $m - 3.0 * sqrt($m)), 6)").as("lcl"),
        expr("""CASE WHEN n * n_days > s_total
               |      AND (n * n_days - s_total) * (n * n_days - s_total) > 9 * s_total * n_days
               |     THEN 1 ELSE 0 END""".stripMargin).as("breach_hi"),
        expr("""CASE WHEN n * n_days < s_total
               |      AND (s_total - n * n_days) * (s_total - n * n_days) > 9 * s_total * n_days
               |     THEN 1 ELSE 0 END""".stripMargin).as("breach_lo"))
      .orderBy(col("etype"), col("day"))
  }

  /** Population Stability Index per bin — THE production drift metric
    * for a numeric feature between a reference window and the current
    * one (scorecards, feature stores, model monitors all alarm on
    * PSI > 0.1/0.25). Complements [[graft.ext.Similarity]]'s
    * embedding-space drift with the single-column tabular form.
    *
    * Both sides bin by the same fixed-width rule (floor(v / width),
    * capped into [0, bins−1]; fixed bins are the deployed-monitor shape
    * — quantile bins recomputed per window would move the goalposts the
    * metric is supposed to detect). Counts are exact integers with
    * add-one smoothing (PSI is undefined on an empty bin; +1 is the
    * standard fix and is VISIBLE in the emitted formula, not hidden).
    * The per-bin term (p−q)·ln(p/q) is one IEEE expression over exact
    * integer witnesses under the [[mutualInfo]] 6dp-rounding discipline
    * (libm's ln may differ in the last ulp across engines; 6dp absorbs
    * it). Per-bin rows only — the corpus PSI is the sum of a bounded
    * handful of rounded terms, left to the caller so no float-sum order
    * enters the gate.
    *
    * Shape: two map-side-combined bin aggregates (≤ bins keys each),
    * one bounded join, 1-row totals broadcast. Scan-bound at any scale.
    */
  def psiDrift(
      reference: DataFrame,
      current: DataFrame,
      valueCol: String,
      binWidth: Double,
      bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"bins must be in [2,1000], got $bins")
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    def binned(df: DataFrame, as: String): DataFrame = df
      .where(col(valueCol).isNotNull)
      .select(least(greatest(floor(col(valueCol) / binWidth), lit(0)), lit(bins - 1))
        .cast("bigint").as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as(as))
    val r = binned(reference, "n_ref")
    val c = binned(current, "n_cur")
    val totals = broadcast(
      r.agg(sum(col("n_ref")).as("t_ref")).crossJoin(c.agg(sum(col("n_cur")).as("t_cur"))))
    r.join(c, Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
      .crossJoin(totals)
      .select(col("bin"), col("n_ref"), col("n_cur"),
        col("t_ref").cast("bigint").as("t_ref"),
        col("t_cur").cast("bigint").as("t_cur"),
        expr(s"""round((CAST(n_ref + 1 AS DOUBLE) / CAST(t_ref + $bins AS DOUBLE)
                |        - CAST(n_cur + 1 AS DOUBLE) / CAST(t_cur + $bins AS DOUBLE))
                |       * ln((CAST(n_ref + 1 AS DOUBLE) / CAST(t_ref + $bins AS DOUBLE))
                |            / (CAST(n_cur + 1 AS DOUBLE) / CAST(t_cur + $bins AS DOUBLE))), 6)"""
          .stripMargin).as("psi_term"))
      .orderBy(col("bin"))
  }

  /** Sample-representativeness audit — did the deterministic hash
    * sample preserve each stratum's share? Every sampling operator in
    * the suite (hashSample, stratifiedSample, the curation pipelines)
    * assumes its membership hash is unbiased per stratum; this audit
    * CHECKS it, per stratum, with a binomial z² test at nominal rate
    * pctNum/pctDen.
    *
    * Exactness: with n_f stratum rows and n_s sampled, p = num/den,
    * z² = (n_s − n_f·p)² / (n_f·p·(1−p))
    *    = (den·n_s − num·n_f)² / (n_f·num·(den−num))  — every witness
    * an exact int64, the deviation FLAG pure integer
    * ((den·n_s − num·n_f)² > 9·n_f·num·(den−num), i.e. |z| > 3), and
    * the printed rate/z terminal divisions. A stratum exactly at 3σ
    * can never flip engines.
    *
    * Shape: two map-side-combined stratum aggregates + one bounded
    * join. Scan-bound at any scale.
    */
  def sampleAudit(
      full: DataFrame,
      sampled: DataFrame,
      stratCol: String,
      pctNum: Long,
      pctDen: Long): DataFrame = {
    require(pctNum >= 1 && pctNum < pctDen,
      s"nominal rate must be in (0,1): $pctNum/$pctDen")
    val f = full.groupBy(col(stratCol).as("stratum"))
      .agg(count(lit(1)).as("n_full"))
    val sm = sampled.groupBy(col(stratCol).as("stratum"))
      .agg(count(lit(1)).as("n_sample"))
    // Null-safe join: a NULL stratum is a real stratum (unlabeled rows
    // sample like any other) — plain equality would report n_sample=0
    // for it and fire a spurious |z|>3 flag.
    f.alias("f").join(sm.alias("sm"),
        col("f.stratum") <=> col("sm.stratum"), "left")
      .select(col("f.stratum").as("stratum"),
        col("n_full").cast("bigint").as("n_full"),
        coalesce(col("n_sample"), lit(0L)).cast("bigint").as("n_sample"))
      .select(col("stratum"), col("n_full"), col("n_sample"),
        (col("n_sample").cast("double") / col("n_full").cast("double"))
          .as("rate"),
        ((lit(pctDen) * col("n_sample") - lit(pctNum) * col("n_full")) *
          (lit(pctDen) * col("n_sample") - lit(pctNum) * col("n_full")) >
          lit(9L * pctNum * (pctDen - pctNum)) * col("n_full"))
          .as("dev_flag"),
        ((lit(pctDen) * col("n_sample") - lit(pctNum) * col("n_full"))
          .cast("double") /
          sqrt((lit(pctNum * (pctDen - pctNum)) * col("n_full")).cast("double")))
          .as("z"))
  }

  /** Sample-ratio-mismatch check — the FIRST thing a trustworthy
    * experiment readout verifies (Fabijan et al., "Diagnosing Sample
    * Ratio Mismatch", KDD 2019): does the realized unit split across
    * variants match the designed equal split? A biased assignment hash,
    * a crash path that drops one variant's logs, or a bot filter that
    * fires asymmetrically all surface here before any metric is read.
    *
    * χ² against the equal-split expectation, kept integer-exact: with k
    * variants, N units and per-variant n_i, χ² = Σ(n_i − N/k)²/(N/k)
    * = W/(k·N) where W = Σ(k·n_i − N)² — an exact int64 witness
    * (envelope: k·n_i ≤ k·N < 2⁶³ at any realistic scale), ONE terminal
    * division, and the srm_flag is the pure-integer comparison
    * 100·W > crit_centi·k·N, so a split exactly on the critical value
    * can never flip engines.
    *
    * The critical value is DERIVED FROM k by default: with k variants
    * the statistic has df = k−1, and a fixed df=1 value of 3.84 would
    * over-flag any experiment with ≥ 3 arms (χ²₀.₀₅ at df=2 is already
    * 5.99). The default (`critCenti = 0`) looks up χ²₀.₀₅ in hundredths
    * for df 1–10 — an integer table, keeping the integer-witness
    * discipline — and FAILS FAST (`raise_error`) for k > 11: a NULL
    * flag would be silently dropped by a downstream `WHERE srm_flag`,
    * which is the exact quiet-miss this check exists to prevent (ADVICE
    * r15). A positive `critCenti` overrides the lookup for non-5%
    * levels or df > 10.
    *
    * Shape: one map-side-combined count per variant, then a k-row
    * rollup. Units, not events: the unit key is counted DISTINCT per
    * variant (an SRM check over raw events would double-count chatty
    * users — the standard mistake).
    */
  def srmCheck(
      df: DataFrame,
      variantCol: String,
      unitCol: String,
      critCenti: Long = 0L): DataFrame = {
    require(critCenti >= 0, s"critCenti must be >= 0 (0 = derive from k), got $critCenti")
    // χ²₀.₀₅ in hundredths for df = 1..10 (k = 2..11)
    val chi2Crit05Centi = Seq(384L, 599L, 781L, 949L, 1107L,
      1259L, 1407L, 1551L, 1692L, 1831L)
    val perVariant = df
      .where(col(variantCol).isNotNull && col(unitCol).isNotNull)
      .groupBy(col(variantCol).as("variant"))
      .agg(count_distinct(col(unitCol)).as("n_units"))
    // the window frame is the VARIANT table — k rows, a constant-size
    // frame, not the data (the bucketedPrefixSums offset-window rule)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    perVariant
      .withColumn("k", count(lit(1)).over(w).cast("bigint"))
      .withColumn("n_total", sum(col("n_units")).over(w))
      .withColumn("dev", col("k") * col("n_units") - col("n_total"))
      .groupBy(col("k"), col("n_total"))
      .agg(sum(col("dev") * col("dev")).as("w2"))
      .withColumn("crit_centi",
        if (critCenti > 0) lit(critCenti)
        // lookup at the df=k−1 index; OUTSIDE the table the row fails
        // fast (when() also guards the ANSI out-of-bounds error) — a
        // NULL flag here would vanish under a downstream WHERE srm_flag
        else when(col("k").between(2, chi2Crit05Centi.length + 1),
          element_at(
            array(chi2Crit05Centi.map(lit): _*), (col("k") - 1).cast("int")))
          .otherwise(raise_error(concat(
            lit("srmCheck: k = "), col("k").cast("string"),
            lit(" variants is outside the built-in chi-square table"
              + " (2 <= k <= 11); pass critCenti explicitly")))))
      .select(col("k"), col("n_total"), col("w2"), col("crit_centi"),
        (col("w2").cast("double") / (col("k") * col("n_total")).cast("double"))
          .as("chi2"),
        (lit(100L) * col("w2") > col("crit_centi") * col("k") * col("n_total"))
          .as("srm_flag"))
  }

  /** Disparate-impact (80%-rule) audit — per-group positive rate vs the
    * global rate, the fairness screen an ML-governance review runs over
    * any scored/filtered dataset ("does the quality filter pass
    * documents from source X at < 4/5 the global rate?"). The four-
    * fifths rule is the EEOC's and the standard first-line metric.
    *
    * Exactness: rates and the impact ratio are terminal divisions of
    * exact int64 counts; the `below_four_fifths` FLAG is pure integer —
    * rate_g < (4/5)·rate_global  ⟺  5·n_pos·N < 4·n·P — so a group
    * exactly on the line can never flip engines (the controlChart
    * breach-flag discipline). Groups with n = 0 cannot occur (groupBy
    * only emits observed groups); a global P = 0 leaves ratios NULL
    * rather than dividing by zero.
    *
    * Shape: ONE map-side-combined aggregate over the fact table plus a
    * broadcast 1-row global frame. Scan-bound at any scale.
    */
  def disparateImpact(
      df: DataFrame,
      groupCol: String,
      positive: org.apache.spark.sql.Column): DataFrame = {
    val per = df
      .where(col(groupCol).isNotNull)
      .groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("n"),
        count(when(positive, 1)).as("n_pos"))
    val glob = broadcast(per.agg(
      sum(col("n")).as("n_total"), sum(col("n_pos")).as("p_total")))
    per.crossJoin(glob)
      .select(
        col("grp"), col("n").cast("bigint").as("n"),
        col("n_pos").cast("bigint").as("n_pos"),
        col("n_total").cast("bigint").as("n_total"),
        col("p_total").cast("bigint").as("p_total"),
        (col("n_pos").cast("double") / col("n").cast("double")).as("rate"),
        when(col("p_total") > 0,
          (col("n_pos") * col("n_total")).cast("double") /
            (col("n") * col("p_total")).cast("double")).as("impact_ratio"),
        (lit(5L) * col("n_pos") * col("n_total") <
          lit(4L) * col("n") * col("p_total")).as("below_four_fifths"))
  }

  /** Clustering-vs-labels purity — the external-validity eval for a
    * trained clustering (k-means cells, LSH buckets, dedup clusters):
    * per cluster, how dominated is it by one ground-truth label? The
    * pre-training question this answers: "do my embedding clusters
    * track the taxonomy I'm about to balance quotas over?"
    *
    * Per-cluster output: size, the majority label (ties broken on the
    * label value so both engines elect the same winner), its count, and
    * purity = n_majority / n as the one terminal division. Corpus
    * purity is Σ n_majority / Σ n — both witnesses are emitted, so the
    * caller (or the gate) recomputes it exactly.
    *
    * Shape: one (cluster, label) aggregate — map-side combined,
    * cells × labels keys — then a ranking window over THAT bounded
    * frame, never over assignments. Assignment and label frames join on
    * the id; at corpus scale both sides are id-partitioned and the
    * label side is usually a projection of the same table the
    * clustering read, so AQE reuses the exchange.
    */
  def clusterPurity(
      assignments: DataFrame,
      idCol: String,
      clusterCol: String,
      labels: DataFrame,
      labelIdCol: String,
      labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cl = assignments
      .where(col(clusterCol).isNotNull)
      .select(col(idCol).as("_id"), col(clusterCol).as("cluster"))
      .join(labels.select(col(labelIdCol).as("_id"),
        col(labelCol).cast("string").as("label")), Seq("_id"))
      .groupBy(col("cluster"), col("label"))
      .agg(count(lit(1)).as("n_lab"))
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col("n_lab").desc, col("label"))
    cl.withColumn("rn", row_number().over(w))
      .withColumn("n", sum(col("n_lab")).over(Window.partitionBy(col("cluster"))))
      .where(col("rn") === 1)
      .select(
        col("cluster"), col("n").cast("bigint").as("n"),
        col("label").as("majority_label"),
        col("n_lab").cast("bigint").as("n_majority"),
        (col("n_lab").cast("double") / col("n").cast("double")).as("purity"))
  }

  /** Schema-contract diff — the breaking-change classifier a data
    * contract check runs before a producer ships a new table version:
    * every column-level difference between two schemas, each tagged
    * `breaking` by the reader-compatibility rules (a REMOVED column
    * breaks readers; a type change breaks unless it is a lossless
    * widening; nullability TIGHTENING is safe for readers while
    * LOOSENING breaks consumers that assumed non-null; an added
    * nullable column is the one always-safe evolution). Unchanged
    * columns emit nothing — the diff is the contract review's
    * worklist, not a schema dump. Pure metadata: zero jobs, zero scans.
    */
  def schemaDiff(
      spark: org.apache.spark.sql.SparkSession,
      old: org.apache.spark.sql.types.StructType,
      neu: org.apache.spark.sql.types.StructType): DataFrame = {
    val widenings = Set(
      "tinyint->smallint", "tinyint->int", "tinyint->bigint",
      "smallint->int", "smallint->bigint", "int->bigint",
      "float->double", "date->timestamp")
    val o = old.fields.map(f => f.name -> f).toMap
    val n = neu.fields.map(f => f.name -> f).toMap
    val rows = (old.fieldNames ++ neu.fieldNames).distinct.toSeq.flatMap { name =>
      (o.get(name), n.get(name)) match {
        case (Some(f), None) =>
          Seq((name, "removed", f.dataType.simpleString, null: String, true))
        case (None, Some(f)) =>
          Seq((name, "added", null: String, f.dataType.simpleString, !f.nullable))
        case (Some(a), Some(b)) =>
          val t =
            if (a.dataType != b.dataType)
              Seq((name, "type_changed", a.dataType.simpleString, b.dataType.simpleString,
                !widenings.contains(s"${a.dataType.simpleString}->${b.dataType.simpleString}")))
            else Nil
          val nl =
            if (a.nullable != b.nullable)
              Seq((name,
                if (b.nullable) "nullability_loosened" else "nullability_tightened",
                a.dataType.simpleString, b.dataType.simpleString, b.nullable))
            else Nil
          t ++ nl
        case (None, None) => Nil
      }
    }
    import spark.implicits._
    rows.toDF("column", "change", "old_type", "new_type", "breaking")
  }

  /** Column profiler — the data-catalog / data-contract bootstrap (what
    * Deequ's profiler and every warehouse "analyze table" job compute):
    * per column, row count, null count, EXACT distinct count, uniqueness
    * verdict, and typed min/max (numerics as doubles; strings and
    * day-granularity timestamps as strings).
    *
    * Notes for the gate: dtype is a engine-neutral class label
    * (numeric/string/timestamp/other), not a type NAME; timestamp
    * min/max are emitted at DATE granularity (engine-identical
    * rendering), numerics as exact doubles.
    *
    * `exactDistinct = true` (the gate arm) is a two-level aggregation
    * PER COLUMN — the [[graft.ops.Quality.profileDiff]] shape: level 1
    * is `groupBy(col).count()` (hash-aggregated, map-side combined, so
    * only that column's distinct values cross the wire), level 2 folds
    * the value-histogram into every metric at once (n = Σ counts,
    * null count = the NULL group's count, distinct = non-null group
    * count ≡ COUNT(DISTINCT col), typed min/max over the group keys).
    * Each per-column scan prunes to that one parquet column, so total
    * column-bytes read equal the former one-pass form's; what the
    * former form paid on top was the multi-COUNT(DISTINCT) Expand —
    * every row replicated ×(C+1) before the exchange — and full-width
    * SortAggregates forced by the string min/max buffers (measured
    * 12.2× the approx arm at 60M rows, TpProbe, and ~2.4× at sf0.1 vs
    * this histogram form, AbBatch4Probe).
    * Production profiling at 100 TB sets `exactDistinct = false`: ONE
    * expand-free pass whatever the column count — HLL sketches
    * (`approx_count_distinct`) with the tolerant uniqueness verdict
    * (±2σ of the sketch error), exactly the Deequ-profiler default.
    */
  def tableProfile(df: DataFrame, exactDistinct: Boolean = true): DataFrame =
    if (exactDistinct) tableProfileExact(df) else tableProfileOnePass(df, exactDistinct = false)

  private def tableProfileExact(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    def cls(dt: DataType): String = dt match {
      case _: NumericType => "numeric"
      case StringType => "string"
      case TimestampType | TimestampNTZType | DateType => "timestamp"
      case _ => "other"
    }
    df.schema.fields.toSeq.map { f =>
      val k = col("_k")
      val typed = cls(f.dataType) match {
        case "numeric" => Seq(
          min(k).cast("double").as("min_num"), max(k).cast("double").as("max_num"),
          lit(null).cast("string").as("min_str"), lit(null).cast("string").as("max_str"))
        case "string" => Seq(
          lit(null).cast("double").as("min_num"), lit(null).cast("double").as("max_num"),
          min(k).as("min_str"), max(k).as("max_str"))
        case "timestamp" => Seq(
          lit(null).cast("double").as("min_num"), lit(null).cast("double").as("max_num"),
          min(k.cast("date")).cast("string").as("min_str"),
          max(k.cast("date")).cast("string").as("max_str"))
        case _ => Seq(
          lit(null).cast("double").as("min_num"), lit(null).cast("double").as("max_num"),
          lit(null).cast("string").as("min_str"), lit(null).cast("string").as("max_str"))
      }
      val aggs = Seq(
        // empty input: zero groups -> sum is NULL, the one-pass count was 0
        coalesce(sum(col("_cnt")), lit(0L)).as("n"),
        coalesce(sum(when(k.isNull, col("_cnt"))), lit(0L)).as("n_null"),
        count(k).as("n_distinct")) ++ typed
      df.groupBy(col(f.name).as("_k")).agg(count(lit(1)).as("_cnt"))
        .agg(aggs.head, aggs.tail: _*)
        .select(
          lit(f.name).as("column"),
          lit(cls(f.dataType)).as("dtype"),
          col("n"), col("n_null"), col("n_distinct"),
          // uniqueness is among NON-NULL values (nulls are absence, not
          // duplicates): distinct == non-null count, both exact here
          (col("n_distinct") === col("n") - col("n_null")).as("is_unique"),
          col("min_num"), col("max_num"), col("min_str"), col("max_str"))
    }.reduce(_ unionByName _)
  }

  /** The former single-pass form: every metric fans out as expressions
    * inside ONE aggregate over the frame, then pivots to long
    * (column, metric…) rows via an in-row explode. With
    * `exactDistinct = false` (its only remaining caller) the C distinct
    * counts are HLL sketches, so the pass is Expand-free and scans the
    * table exactly once whatever the column count.
    */
  /** Probe access to the former exact arm (A/B evidence only). */
  private[ops] def tableProfileOnePassForProbe(df: DataFrame): DataFrame =
    tableProfileOnePass(df, exactDistinct = true)

  private def tableProfileOnePass(df: DataFrame, exactDistinct: Boolean): DataFrame = {
    import org.apache.spark.sql.types._
    val fields = df.schema.fields.toSeq
    def cls(dt: DataType): String = dt match {
      case _: NumericType => "numeric"
      case StringType => "string"
      case TimestampType | TimestampNTZType | DateType => "timestamp"
      case _ => "other"
    }
    val aggs = fields.flatMap { f =>
      val c = col(f.name)
      val base = Seq(
        count(c).as(s"__c_${f.name}"),
        (if (exactDistinct) count_distinct(c) else approx_count_distinct(c))
          .as(s"__d_${f.name}"))
      val typed = cls(f.dataType) match {
        case "numeric" => Seq(
          min(c).cast("double").as(s"__mn_${f.name}"),
          max(c).cast("double").as(s"__mx_${f.name}"),
          lit(null).cast("string").as(s"__ms_${f.name}"),
          lit(null).cast("string").as(s"__xs_${f.name}"))
        case "string" => Seq(
          lit(null).cast("double").as(s"__mn_${f.name}"),
          lit(null).cast("double").as(s"__mx_${f.name}"),
          min(c).as(s"__ms_${f.name}"),
          max(c).as(s"__xs_${f.name}"))
        case "timestamp" => Seq(
          lit(null).cast("double").as(s"__mn_${f.name}"),
          lit(null).cast("double").as(s"__mx_${f.name}"),
          min(c.cast("date")).cast("string").as(s"__ms_${f.name}"),
          max(c.cast("date")).cast("string").as(s"__xs_${f.name}"))
        case _ => Seq(
          lit(null).cast("double").as(s"__mn_${f.name}"),
          lit(null).cast("double").as(s"__mx_${f.name}"),
          lit(null).cast("string").as(s"__ms_${f.name}"),
          lit(null).cast("string").as(s"__xs_${f.name}"))
      }
      base ++ typed
    } :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = fields.map { f =>
      struct(
        lit(f.name).as("column"),
        lit(cls(f.dataType)).as("dtype"),
        col("__n").as("n"),
        (col("__n") - col(s"__c_${f.name}")).as("n_null"),
        col(s"__d_${f.name}").as("n_distinct"),
        // uniqueness is among NON-NULL values (nulls are absence, not
        // duplicates). Approx arm: a sketch can undercount a truly-
        // unique column, so the verdict tolerates the default 5% rsd
        // (≈2σ); exact arm is strict equality
        (if (exactDistinct) col(s"__d_${f.name}") === col(s"__c_${f.name}")
         else col(s"__d_${f.name}").cast("double") >=
           col(s"__c_${f.name}").cast("double") * 0.9)
          .as("is_unique"),
        col(s"__mn_${f.name}").as("min_num"),
        col(s"__mx_${f.name}").as("max_num"),
        col(s"__ms_${f.name}").as("min_str"),
        col(s"__xs_${f.name}").as("max_str"))
    }
    one.select(explode(array(entries: _*)).as("p")).select(col("p.*"))
  }

  /** Per-group Gini concentration of an integer measure — the "10% of
    * keys carry 80% of the load" audit that decides whether a dataset
    * needs skew handling BEFORE a job hits it (a high-Gini key column is
    * tomorrow's hot-partition incident) and doubles as the standard
    * inequality report over spend/traffic/tokens-per-doc.
    *
    * Exact discrete form: with per-key totals c₁ ≤ … ≤ c_n (ties broken
    * by key — a total order, so ranks are unique), G = Σ(2i − n − 1)·cᵢ
    * / (n·Σc). Numerator and denominator are exact int64 witnesses; the
    * quotient is the ONE IEEE division. int64 envelope: |num| < n²·max c
    * — guarded loudly at n²·maxc > 4·10¹⁸ rather than silently wrapping
    * (the ewmaSmooth doctrine).
    *
    * Shapes: one key aggregate, one group-bounded rank window, one group
    * rollup — |groups| rows out, nothing global.
    */
  def lorenzGini(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      measureExpr: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perKey = df
      .where(col(groupCol).isNotNull && col(keyCol).isNotNull)
      .groupBy(col(groupCol).as("grp"), col(keyCol).as("key"))
      .agg(sum(expr(measureExpr)).cast("long").as("c"))
    val w = Window.partitionBy(col("grp")).orderBy(col("c"), col("key"))
    val wg = Window.partitionBy(col("grp"))
    perKey
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(wg))
      .withColumn("maxc", max(col("c")).over(wg))
      .withColumn("_guard",
        // divide, don't multiply: n²·maxc would itself overflow before
        // the comparison could catch it
        when(col("maxc") > expr("4000000000000000000L div (n * n)"),
          expr("raise_error('lorenzGini: n^2 * max(c) exceeds the int64 envelope — scale the measure down')"))
          .otherwise(lit(0)))
      .groupBy(col("grp"))
      .agg(
        count(lit(1)).as("n_keys"),
        sum(col("c")).as("total"),
        // + max(guard): the guard term is always 0, but folding it into
        // an EMITTED value keeps column pruning from eliminating the
        // raise_error branch entirely
        (sum((col("i") * 2 - col("n") - 1) * col("c"))
          + max(col("_guard")).cast("long")).as("gini_num"))
      .select(
        col("grp"), col("n_keys"), col("total"), col("gini_num"),
        (col("gini_num").cast("double") /
          (col("n_keys") * col("total")).cast("double")).as("gini"))
  }
}
