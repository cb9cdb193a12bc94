package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.TextOps

/** Tabular feature engineering for training pipelines: the encodings a
  * model actually trains on, built leakage-safe and cross-engine exact.
  * Sibling of [[Functions]] (scalar sweeps) and [[Quality]] (monitoring):
  * these transforms' outputs FEED a trainer, so their contracts are about
  * not leaking the label and not drifting between the engine that built
  * the training set and the engine that serves.
  */
object Features {

  /** Leakage-safe k-fold target encoding (mean-of-label with additive
    * smoothing) of a categorical column — the high-cardinality-category
    * encoder gradient-boosting pipelines use where one-hot would explode.
    * The encoding a row sees is computed from the OTHER folds only
    * (out-of-fold counts = per-category totals minus own-fold counts), so
    * a row's own label never reaches its own feature — the leak that
    * makes naive target encoding overfit catastrophically.
    *
    * te = (pos_oof + w·prior) / (cnt_oof + w) with the global prior
    * P/N, cleared of nested divisions into the single IEEE division
    *   (pos_oof·N + w·P) / ((cnt_oof + w)·N)
    * of exact int64 products, so the gate holds cross-engine. Categories
    * absent from every other fold fall back to exactly the prior
    * (pos_oof = cnt_oof = 0). Output: one row per OBSERVED (category,
    * fold) with the witness counts; serving joins on (category, fold)
    * and coalesces unseen categories to the prior. Overflow bound:
    * pos·N < 2⁶³ holds to ~3·10⁹ rows; shard the encoder by category
    * beyond that.
    *
    * Scale shape: one map-side-combined aggregate on (category, fold),
    * one on category — the second frame is category-sized and joins the
    * first on its own key; the global pair is a 1-row broadcast. The fact
    * table scans once.
    */
  /** Leakage-safe standardization — the fit/transform contract every ML
    * feature pipeline needs done right: μ and σ are FIT on the
    * deterministic train split only (md5 hash of the unit id, the
    * [[graft.ext.Sampling]] convention), then APPLIED to every row — so
    * validation/test values never leak into the scaler, and re-runs,
    * retries and engines all derive the identical split.
    *
    * Exactness: values are carried as integer cents
    * (floor(v·100 + 0.5) — the [[graft.ops.Audit.bootstrapMeans]]
    * trade); sx is an exact int64 sum, Σcents² accumulates in
    * decimal(38,0) (int64 overflows it past ~10⁹ six-figure rows —
    * MEASURED at the 100× probe, hence the lift; a decimal sum is
    * order-free like an integer one); μ = sx/n and n²σ² = n·sxx − sx²
    * are fixed IEEE expressions over those witnesses; z = (v − μ)/σ is
    * rounded 6dp (the ln-rounding precedent). A zero-variance fit
    * (constant train column) is the exact MIN ≠ MAX witness — no
    * product to overflow — and yields NULL z, not ±Inf.
    *
    * Shape: one map-side-combined aggregate over the train slice (the
    * fit is ONE broadcastable row), then one pure projection over the
    * full table. The fact table scans twice at most; nothing shuffles.
    */
  def scalerFitApply(
      df: DataFrame,
      idCol: String,
      valueCol: String,
      trainPct: Int = 80): DataFrame = {
    require(trainPct >= 1 && trainPct <= 100,
      s"trainPct must be in [1,100], got $trainPct")
    val h = TextOps.md5Long64(s"concat('scale:', cast($idCol as string))")
    val base = df
      .where(col(valueCol).isNotNull && col(idCol).isNotNull)
      .selectExpr(idCol, valueCol,
        s"cast(floor($valueCol * 100.0d + 0.5d) as bigint) as _cents",
        s"pmod($h, 100) < $trainPct as is_train")
    val fit = base.where(col("is_train"))
      .agg(count(lit(1)).as("n_train"),
        sum(col("_cents")).as("sx"),
        sum((col("_cents") * col("_cents")).cast("decimal(38,0)")).as("sxx"),
        min(col("_cents")).as("_mnc"),
        max(col("_cents")).as("_mxc"))
    base.crossJoin(broadcast(fit))
      .selectExpr(idCol, valueCol, "is_train", "n_train",
        // cents units cancel in (v − μ)/σ, so z is scale-free
        """case when n_train > 0 and _mnc <> _mxc
          |     then round((cast(_cents as double) - cast(sx as double) / cast(n_train as double))
          |                / sqrt((cast(n_train as double) * cast(sxx as double)
          |                        - cast(sx as double) * cast(sx as double))
          |                       / (cast(n_train as double) * cast(n_train as double))), 6)
          |end as z""".stripMargin)
  }

  def targetEncode(
      df: DataFrame,
      catCol: String,
      labelCol: String,
      foldKeyCol: String,
      nFolds: Int = 5,
      smoothing: Int = 20): DataFrame = {
    require(nFolds >= 2, s"nFolds must be >= 2, got $nFolds")
    require(smoothing >= 0, s"smoothing must be >= 0, got $smoothing")
    val base = df
      .where(col(catCol).isNotNull && col(labelCol).isNotNull &&
        col(foldKeyCol).isNotNull)
      .select(col(catCol).as("category"),
        col(labelCol).cast("boolean").as("_y"),
        pmod(col(foldKeyCol), lit(nFolds)).cast("int").as("fold"))
    val perFold = base.groupBy(col("category"), col("fold")).agg(
      count(lit(1)).as("cnt_fold"),
      count(when(col("_y"), 1)).as("pos_fold"))
    val perCat = perFold.groupBy(col("category")).agg(
      sum(col("cnt_fold")).as("cnt_cat"),
      sum(col("pos_fold")).as("pos_cat"))
    val global = perFold.agg(
      sum(col("cnt_fold")).as("n_total"),
      sum(col("pos_fold")).as("pos_total"))
    perFold.join(perCat, Seq("category"))
      .crossJoin(broadcast(global))
      .select(col("category"), col("fold"), col("cnt_fold"), col("pos_fold"),
        (col("cnt_cat") - col("cnt_fold")).as("cnt_oof"),
        (col("pos_cat") - col("pos_fold")).as("pos_oof"),
        col("n_total"), col("pos_total"))
      .withColumn("te",
        (col("pos_oof") * col("n_total") + lit(smoothing.toLong) * col("pos_total"))
          .cast("double") /
          ((col("cnt_oof") + lit(smoothing.toLong)) * col("n_total")).cast("double"))
  }

  /** Exact quantile normalization of a numeric feature against the
    * POOLED distribution — the "make every group's feature comparable"
    * transform (batch-effect removal in expression data, per-source score
    * alignment in ranking corpora): a value at within-group rank r of
    * n_g maps to the pooled element at rank ⌈r·N/n_g⌉, so every group's
    * normalized distribution is a subsample of the same reference. An
    * exact ELEMENT, not an interpolated midpoint — no cross-engine float
    * interpolation exists to drift (the imputeMedian discipline). Ties
    * break by `idCol` so both rankings are total.
    *
    * Scale shape: the within-group rank is one group-keyed window; the
    * pooled ranking reuses the [[Functions.denseIds]] two-pass (range
    * partition + per-partition rank + offset broadcast) — NO
    * single-partition global window; the rank lookup is an equi-join on
    * the computed global rank. At corpus scale, swap the pooled side for
    * a sampled reference CDF — same join shape against a small
    * broadcastable rank table.
    */
  def quantileNormalize(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      idCol: String,
      partitions: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df
      .where(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("grp"), col(valueCol).as("value"),
        col(idCol).as("id"))
    val wg = Window.partitionBy(col("grp")).orderBy(col("value"), col("id"))
    val wn = Window.partitionBy(col("grp"))
    val ranked = base
      .withColumn("rank_in_group", row_number().over(wg).cast("bigint"))
      .withColumn("n_group", count(lit(1)).over(wn))
    val ref = Functions
      .denseIds(base.select(col("value").as("_rv"), col("id").as("_rid")),
        "struct(_rv, _rid)", partitions)
      .select((col("id") + 1L).as("global_rank"), col("_rv").as("normalized"))
    val nAll = base.agg(count(lit(1)).as("n_all"))
    ranked.crossJoin(broadcast(nAll))
      .withColumn("global_rank",
        expr("(rank_in_group * n_all + n_group - 1) div n_group"))
      .join(ref, Seq("global_rank"))
      .select(col("grp"), col("id"), col("value"), col("rank_in_group"),
        col("n_group"), col("global_rank"), col("normalized"))
  }

  /** Recency-decayed per-user value — the "engagement score that
    * forgets" feature (RFM's monetary axis with a half-life): each
    * event's value decays by half per day of age, so a purchase last
    * week outweighs the same purchase last quarter. The standard
    * trainer feature for churn/LTV models.
    *
    * Exactness is the [[Quality.ewmaSmooth]] dyadic doctrine turned
    * per-user: values quantize to integer cents, each event contributes
    * cents · 2^(maxAge − age) to an int64 numerator, and the score is
    * ONE terminal division by 2^maxAge — no float sum exists, so
    * partition order can't move it. The int64 envelope is
    * maxAge + log2(Σcents) < 63: with the 32-day guard below, a user can
    * accumulate 2^31 cents (~$21M) before the envelope tightens, and a
    * longer span fails loudly instead of overflowing silently (the
    * shiftleft-wraps-mod-64 failure ewmaSmooth documents).
    *
    * Shape: one (user, day) pre-aggregate (map-side combined) then one
    * user-keyed aggregate — the decay factor is a column expression, so
    * the whole thing is two scan-bound aggregates; no windows, no
    * self-joins.
    */
  def decayedValue(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      valueCol: String): DataFrame = {
    val daily = events
      .where(col(userCol).isNotNull && col(valueCol).isNotNull)
      .select(col(userCol).as("user_id"),
        datediff(to_date(col(tsCol)), lit("1970-01-01")).cast("bigint").as("day"),
        // integer cents: floor(v * 100 + 0.5) — exact on both engines
        floor(col(valueCol) * 100.0 + 0.5).cast("bigint").as("cents"))
      .groupBy(col("user_id"), col("day"))
      .agg(sum(col("cents")).as("day_cents"))
    val maxDay = broadcast(daily.agg(max(col("day")).as("max_day")))
    daily.crossJoin(maxDay)
      .withColumn("age", col("max_day") - col("day"))
      // loud failure before the 2^k envelope can wrap (ewmaSmooth rule)
      .withColumn("age", when(col("age") > 32, expr(
        "raise_error('decayedValue: event span exceeds 32 days — chunk-reseed " +
          "the decay epoch before the dyadic envelope overflows')"))
        .otherwise(col("age")))
      .groupBy(col("user_id"))
      .agg(
        sum(col("day_cents") * expr("shiftleft(1L, cast(32 - age as int))"))
          .as("num_scaled"),
        sum(col("day_cents")).as("raw_cents"),
        count(lit(1)).as("n_days"))
      .select(col("user_id"),
        col("num_scaled").cast("bigint").as("num_scaled"),
        col("raw_cents").cast("bigint").as("raw_cents"),
        col("n_days").cast("bigint").as("n_days"),
        (col("num_scaled").cast("double") / math.pow(2.0, 32) / 100.0)
          .as("decayed_value"))
  }

  /** The shared prelude of [[lagFeatures]] and [[forecastBacktest]]:
    * per-(key, epoch-day) exact counts plus the value-RANGE lag1/lag7
    * columns (gaps break adjacency by construction — the windows range
    * over the day VALUE, not row position, so a missing day contributes
    * nothing and yields NULL lags, never fabricated zeros). */
  private def dailyLagged(
      df: DataFrame,
      keyCol: String,
      tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = df
      .where(col(keyCol).isNotNull)
      .groupBy(col(keyCol).as("key"),
        expr(s"datediff(cast($tsCol as date), date'1970-01-01')").cast("long").as("day"))
      .agg(count(lit(1)).as("n"))
    val byDay = Window.partitionBy(col("key")).orderBy(col("day"))
    daily
      .withColumn("lag1", max(col("n")).over(byDay.rangeBetween(-1, -1)))
      .withColumn("lag7", max(col("n")).over(byDay.rangeBetween(-7, -7)))
  }

  /** Supervised lag-feature matrix for per-key daily-count forecasting —
    * the feature-engineering step every demand/traffic model starts
    * from: for each (key, day), yesterday's count (`lag1`), the
    * same-weekday-last-week count (`lag7`), the trailing-7-day sum
    * (`roll7`, the CURRENT day excluded — a feature computed from the
    * label's own day is leakage), the day-of-week, and the NEXT day's
    * count as the label. Rows whose label day is past the observed
    * range are dropped (no fabricated zeros: absence of data is not a
    * zero count). Counts are exact int64 end to end; day arithmetic is
    * integer epoch-days, so every engine agrees bit-for-bit.
    *
    * Shapes: one (key, day) count aggregate, then key-partitioned
    * RANGE windows over the integer day (the [[dailyLagged]] prelude,
    * shared with the backtest so the two can never desynchronize).
    * Nothing global; |keys|·|days| rows out.
    */
  def lagFeatures(
      df: DataFrame,
      keyCol: String,
      tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDay = Window.partitionBy(col("key")).orderBy(col("day"))
    dailyLagged(df, keyCol, tsCol)
      .withColumn("roll7", sum(col("n")).over(byDay.rangeBetween(-7, -1)))
      .withColumn("dow", pmod(col("day") + 4, lit(7)).cast("int")) // 1970-01-01 = Thursday
      .withColumn("label", max(col("n")).over(byDay.rangeBetween(1, 1)))
      .where(col("label").isNotNull)
  }

  /** Seasonal-naive forecast backtest with the MASE verdict (Hyndman &
    * Koehler, "Another look at measures of forecast accuracy", 2006):
    * before anyone trains a model on [[lagFeatures]]' matrix, this is
    * the bar it must beat — predict day t by day t−7 (seasonal naive)
    * and score it against the one-step naive (predict by t−1), as the
    * scaled error ratio MASE = MAE_seasonal / MAE_naive. MASE < 1 ⇒
    * weekly seasonality carries real signal for this key; a trained
    * model that can't beat BOTH baselines is noise. Absolute errors
    * over integer daily counts are exact int64 sums; each arm's pair
    * count is carried (gapped days drop pairs — the shared
    * [[dailyLagged]] prelude) and the ratio is ONE division of int64
    * cross-products.
    */
  def forecastBacktest(
      df: DataFrame,
      keyCol: String,
      tsCol: String): DataFrame =
    dailyLagged(df, keyCol, tsCol)
      .groupBy(col("key"))
      .agg(
        count(lit(1)).as("n_days"),
        count(col("lag7")).as("pairs_seasonal"),
        count(col("lag1")).as("pairs_naive"),
        sum(abs(col("n") - col("lag7"))).as("sae_seasonal"),
        sum(abs(col("n") - col("lag1"))).as("sae_naive"))
      .selectExpr("key", "n_days", "pairs_seasonal", "pairs_naive",
        "sae_seasonal", "sae_naive",
        """case when sae_naive > 0 and pairs_seasonal > 0 then
          |  cast(sae_seasonal * pairs_naive as double)
          |    / cast(sae_naive * pairs_seasonal as double)
          |end as mase""".stripMargin)
}
