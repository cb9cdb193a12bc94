package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation primitives. AQE's skew-join handling covers joins at
  * runtime; for heavily-skewed AGGREGATION keys (one user producing a
  * large share of a 100 TB stream) the classic fix is salting: shuffle on
  * (key, salt) first so no single reducer owns a hot key, then combine the
  * per-salt partials — two small shuffles instead of one stalled one.
  *
  * The salt must be deterministic for oracle checking: derived from a
  * row-identity column, not `rand()`. Result is identical to the unsalted
  * aggregation (verified by the `salted_agg` oracle, which is the PLAIN
  * formulation).
  */
object Skew {

  /** Two-phase salted sum/count aggregation.
    *
    * @param saltFrom row-identity column the salt is derived from
    * @param buckets  salt fan-out (≈ number of reducers a hot key spreads
    *                 over; 8–32 covers most real skew)
    */
  def saltedSumCount(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      saltFrom: String,
      buckets: Int = 16): DataFrame =
    df.withColumn("_salt", pmod(col(saltFrom), lit(buckets)))
      .groupBy(col(keyCol), col("_salt"))
      .agg(
        count(lit(1)).as("_n"),
        sum(col(valueCol).cast("decimal(18,2)")).as("_s"))
      .groupBy(col(keyCol))
      .agg(
        sum(col("_n")).as("n_events"),
        sum(col("_s")).cast("double").as("sum_value"))

  /** Salted shuffle join for a skewed fact key: the fact side salts on a
    * row-identity column, the (small-ish but not broadcastable) dim side
    * is REPLICATED once per salt bucket, and the join key becomes
    * (key, salt) — a hot key's rows spread over `buckets` reducers
    * instead of stalling one. Result is identical to the plain join
    * (verified by the oracle, which is the unsalted formulation).
    * AQE's skew-join split covers sort-merge cases at runtime; explicit
    * salting remains the deterministic form that also works for
    * aggregations and under AQE-off.
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      saltFrom: String,
      buckets: Int = 16): DataFrame = {
    val salted = fact.withColumn("_salt", pmod(col(saltFrom), lit(buckets)))
    val replicated = dim
      .withColumn("_dsalt", explode(sequence(lit(0), lit(buckets - 1))))
      .withColumnRenamed(key, "_dk")
    salted
      .join(replicated, col(key) === col("_dk") && col("_salt") === col("_dsalt"))
      .drop("_salt", "_dsalt", "_dk")
  }

  /** Join-key SKEW telemetry — the measurement that justifies (or
    * rules out) [[saltedSumCount]]/[[saltedJoin]] before anyone pays
    * their replication cost: the key-frequency distribution folded
    * into integer log₂ magnitude buckets. One row per magnitude m with
    * the number of distinct keys whose count has ⌊log₂⌋ = m and the
    * rows they carry — a heavy top bucket says salt, a flat profile
    * says don't. NULL keys group like any key (a hot NULL is the most
    * common real-world skew cause). Key identities are
    * [[graft.ext.TextOps.heavyHitters]]'s job; this is the shape.
    *
    * Scale shape: two map-side-combined aggregates — the (key) count
    * and the ≤64-row magnitude fold. The key aggregate's exchange
    * carries one row per key per partition; the hot key itself
    * combines map-side, so the diagnosis never suffers the skew it
    * measures.
    */
  /** Self-tuning skew-split join: measure, split, join — the composed
    * form of what [[joinAdvisor]] recommends and [[saltedJoin]] fixes by
    * hand. One exact map-side-combined count pass finds the fact keys
    * above `hotThreshold` rows (at most |fact|/threshold keys — bounded
    * by construction, so the hot-key list broadcasts); the join then
    * splits: hot fact rows meet ONLY their (tiny, hot-restricted) dim
    * slice via a broadcast hash join — no hot key ever crosses a hash
    * exchange — while the cold remainder takes the normal keyed join.
    * The union is EXACTLY the plain inner join (the oracle is the
    * unsalted formulation), which is the whole point: same answer, no
    * stalled reducer. AQE's runtime skew split covers sort-merge cases;
    * this is the deterministic plan-level form that also composes with
    * bucketing and AQE-off.
    */
  def autoSkewJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      hotThreshold: Long = 100000L): DataFrame = {
    require(hotThreshold >= 2, s"hotThreshold must be >= 2, got $hotThreshold")
    val hot = broadcast(
      fact.groupBy(col(key)).agg(count(lit(1)).as("_n"))
        .where(col("_n") >= hotThreshold).select(col(key)))
    val cold = fact.join(hot, Seq(key), "left_anti").join(dim, Seq(key))
    val hotSide = fact.join(hot, Seq(key), "left_semi")
      .join(broadcast(dim.join(hot, Seq(key), "left_semi")), Seq(key))
    cold.unionByName(hotSide)
  }

  def skewReport(df: DataFrame, keyCol: String): DataFrame =
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("c"))
      .selectExpr("c", "cast(length(bin(c)) - 1 as int) as freq_mag")
      .groupBy(col("freq_mag"))
      .agg(count(lit(1)).as("n_keys"),
        sum(col("c")).cast("bigint").as("n_rows"))

  /** Equi-join OUTPUT-size estimation from count-min sketches (Cormode &
    * Muthukrishnan's inner-product estimator): |A ⋈ B| = Σ_k cA(k)·cB(k)
    * is estimated as min over sketch rows r of Σ_b cmsA[r][b]·cmsB[r][b].
    * This is the pre-flight check before a join whose output could be
    * quadratic — a skewed key on BOTH sides multiplies, and you want the
    * d·w-cell sketches (buildable in one bounded pass per side, exactly
    * [[graft.ext.TextOps.cmsCounts]]' shape) to say so BEFORE the
    * exchange is paid, not after the stage OOMs. Collisions only add
    * non-negative products, so est ≥ exact is structural (`over_ok`),
    * and every quantity is int64 md5-bucket arithmetic — the whole
    * estimator sits under the DuckDB hash gate, exact-verification arm
    * included (a production consumer computes only the sketch side).
    */
  /** The sketch-only arm of [[joinSizeEstimate]] as a broadcastable
    * 1-row frame — what a production pre-flight computes (the exact arm
    * exists for the gate), and what [[joinAdvisor]] composes.
    */
  private def cmsJoinEstimate(
      left: DataFrame,
      right: DataFrame,
      keyL: String,
      keyR: String,
      depth: Int,
      width: Int): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    def cms(df: DataFrame, key: String, side: String): DataFrame =
      df.select(expr(key).cast("string").as("k"))
        .where(col("k").isNotNull)
        .select(col("k"), explode(expr(s"sequence(0, ${depth - 1})")).as("r"))
        .select(col("r"),
          expr(s"${graft.ext.TextOps.md5Long64("concat(r, ':', k)")} % $width").as("bucket"))
        .groupBy(col("r"), col("bucket"))
        .agg(count(lit(1)).as(s"c_$side"))
    // A sketch row with NO overlapping buckets has inner product 0 but drops
    // out of the inner join; if any of the `depth` rows is absent the true
    // min is 0 (disjoint-key inputs must estimate 0, not NULL).
    cms(left, keyL, "a").join(cms(right, keyR, "b"), Seq("r", "bucket"))
      .groupBy(col("r"))
      .agg(sum(col("c_a") * col("c_b")).as("ip"))
      .agg(when(count(lit(1)) < depth, lit(0L))
        .otherwise(min(col("ip"))).cast("bigint").as("est_size"))
  }

  def joinSizeEstimate(
      left: DataFrame,
      right: DataFrame,
      keyL: String,
      keyR: String,
      depth: Int = 4,
      width: Int = 512): DataFrame = {
    val est = cmsJoinEstimate(left, right, keyL, keyR, depth, width)
    val exact = left.select(expr(keyL).cast("string").as("k"))
      .where(col("k").isNotNull)
      .groupBy(col("k")).agg(count(lit(1)).as("ca"))
      .join(right.select(expr(keyR).cast("string").as("k"))
        .where(col("k").isNotNull)
        .groupBy(col("k")).agg(count(lit(1)).as("cb")), Seq("k"))
      .agg(coalesce(sum(col("ca") * col("cb")), lit(0L)).cast("bigint").as("exact_size"))
    exact.crossJoin(est).select(
      col("exact_size"), col("est_size"),
      (col("est_size") - col("exact_size")).as("err"),
      expr("cast(case when est_size >= exact_size then 1 else 0 end as int)").as("over_ok"))
  }

  /** Pre-flight JOIN strategy advisor — the telemetry family composed
    * into one verdict row BEFORE any exchange is paid: side row counts
    * (null keys excluded — an inner equi-join prunes them), the CMS
    * output-size estimate, each side's hottest key magnitude
    * (⌊log₂ max count⌋, the [[skewReport]] fold), three exact boolean
    * findings, and a recommended strategy string:
    * broadcast the side under `broadcastRowLimit`, else salt when either
    * side carries a key hotter than 2^`hotMagLimit`, else plain shuffle.
    * `output_blowup` flags est > `blowupFactor`·(|L|+|R|) — the quadratic
    * output that no join strategy survives (fix the data, not the plan).
    * Every input to every verdict is an exact int64 or the structural
    * CMS overestimate, so the whole advisor sits under the hash gate.
    *
    * Scale shape: two key-count aggregates, two ≤64-row magnitude folds,
    * two d×w sketches — all map-side combined, all 1-row outputs crossed
    * as broadcasts. Cost is a few column-pruned scans; paying it beats
    * discovering the blowup when the shuffle stage OOMs.
    */
  def joinAdvisor(
      left: DataFrame,
      right: DataFrame,
      keyL: String,
      keyR: String,
      broadcastRowLimit: Long = 100000L,
      hotMagLimit: Int = 13,
      blowupFactor: Long = 4L,
      depth: Int = 4,
      width: Int = 512): DataFrame = {
    require(broadcastRowLimit >= 1, s"broadcastRowLimit must be >= 1, got $broadcastRowLimit")
    require(hotMagLimit >= 1 && hotMagLimit <= 62, s"hotMagLimit must be in [1,62], got $hotMagLimit")
    require(blowupFactor >= 1, s"blowupFactor must be >= 1, got $blowupFactor")
    def keyed(df: DataFrame, key: String): DataFrame =
      df.select(expr(key).cast("string").as("k")).where(col("k").isNotNull)
    def stats(df: DataFrame, key: String, side: String): DataFrame =
      keyed(df, key)
        .groupBy(col("k")).agg(count(lit(1)).as("c"))
        .agg(
          coalesce(sum(col("c")), lit(0L)).cast("bigint").as(s"n_$side"),
          coalesce(max(expr("cast(length(bin(c)) - 1 as int)")), lit(0)).as(s"max_mag_$side"))
    stats(left, keyL, "left")
      .crossJoin(broadcast(stats(right, keyR, "right")))
      .crossJoin(broadcast(cmsJoinEstimate(left, right, keyL, keyR, depth, width)))
      .select(
        col("n_left"), col("n_right"), col("est_size"),
        col("max_mag_left"), col("max_mag_right"),
        (col("n_left") <= broadcastRowLimit).as("can_broadcast_left"),
        (col("n_right") <= broadcastRowLimit).as("can_broadcast_right"),
        (col("est_size") > lit(blowupFactor) * (col("n_left") + col("n_right")))
          .as("output_blowup"),
        when(col("n_right") <= broadcastRowLimit, lit("broadcast_right"))
          .when(col("n_left") <= broadcastRowLimit, lit("broadcast_left"))
          .when(col("max_mag_left") >= hotMagLimit || col("max_mag_right") >= hotMagLimit,
            lit("salted_join"))
          .otherwise(lit("shuffle_join")).as("strategy"))
  }

  /** LEFT join that never shuffles its NULL-key rows — the classic
    * production skew bug made structural: in a plain left join every
    * null-keyed left row still enters the exchange, and since
    * `hash(null)` is one value, ALL of them land on ONE reducer. A fact
    * table where 20% of the FK is null (unattributed traffic, pre-launch
    * rows, opted-out users) turns that reducer into the job's straggler
    * — at 100 TB, a task holding 20% of the table. Nulls can never
    * MATCH, so the fix costs nothing semantically: route the null
    * stratum around the join entirely (filter → union with
    * null-extended right columns) and let only the matchable rows
    * exchange. Output is bit-identical to the plain left join; the spec
    * asserts equality and the no-null/all-null edges.
    *
    * (AQE's skew-join split does NOT rescue the plain form: it splits
    * SORTED partitions of skewed size, but every null hashes to the one
    * partition AND the one key — a split cannot separate equal keys for
    * a join that must co-locate them. Routing around the exchange can.)
    */
  def nullSafeLeftJoin(left: DataFrame, right: DataFrame, key: String): DataFrame = {
    require(left.columns.contains(key), s"left side lacks join key '$key'")
    require(right.columns.contains(key), s"right side lacks join key '$key'")
    val matched = left.where(col(key).isNotNull).join(right, Seq(key), "left")
    val rightCols = right.columns.filterNot(_ == key)
    val rightTypes = right.schema.fields.map(f => f.name -> f.dataType).toMap
    val nulls = left.where(col(key).isNull)
      .select(col(key) +: left.columns.filterNot(_ == key).map(col) ++:
        rightCols.map(c => lit(null).cast(rightTypes(c)).as(c)): _*)
    // join output column order is key, left-rest, right-rest — mirror it
    matched.unionByName(nulls)
  }
}
