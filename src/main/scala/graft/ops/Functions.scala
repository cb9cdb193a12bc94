package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Scalar/aggregate function surface beyond what the other modules already
  * exercise: string ops, date/time parts, array aggregation, exact
  * percentiles, HLL approximate distinct. All built-ins (codegen'd), all
  * single-shuffle-or-less.
  */
object Functions {

  /** String function sweep over customer names (upper/lower, substring,
    * regexp extraction, replace, length, coalesce/nullif).
    */
  def stringOps(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(
      col("c_custkey"),
      col("c_name"),
      upper(col("c_name")).as("name_upper"),
      lower(col("c_name")).as("name_lower"),
      substring(col("c_name"), 1, 8).as("name_prefix"),
      length(col("c_name")).as("name_len"),
      regexp_extract(col("c_name"), "([0-9]+)", 1).as("name_digits"),
      regexp_replace(col("c_name"), "[0-9]", "#").as("name_masked"),
      concat_ws("/", col("c_mktsegment"), col("c_name")).as("seg_name"),
      coalesce(nullif(col("c_mktsegment"), lit("MACHINERY")), lit("OTHER")).as("segment_or_other"))

  /** Date-part sweep over orders (year/month/day, day-of-week, quarter,
    * truncation, day difference against a fixed anchor).
    */
  def dateOps(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).select(
      col("o_orderkey"),
      col("o_orderdate"),
      year(col("o_orderdate")).as("order_year"),
      month(col("o_orderdate")).as("order_month"),
      dayofmonth(col("o_orderdate")).as("order_day"),
      quarter(col("o_orderdate")).as("order_quarter"),
      dayofweek(col("o_orderdate")).as("order_dow"),
      date_trunc("month", col("o_orderdate")).as("month_start"),
      datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).as("days_since_epoch"))

  /** Array aggregation: the sorted distinct event-type vocabulary per user
    * (deterministic by construction — collect_set order is not).
    */
  def arrayOps(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(sort_array(collect_set(col("event_type"))).as("event_types"))
      .select(
        col("user_id"),
        // serialized for the oracle compare (array columns don't hash
        // portably across engines); the array ops themselves are the point
        array_join(col("event_types"), ",").as("event_types_csv"),
        size(col("event_types")).as("n_types"),
        array_contains(col("event_types"), "purchase").as("has_purchase"),
        element_at(col("event_types"), 1).as("first_type"))

  /** Exact interpolated percentiles per group (Spark `percentile` ==
    * DuckDB `quantile_cont`).
    */
  def pricePercentiles(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        expr("percentile(o_totalprice, 0.5)").as("median_price"),
        expr("percentile(o_totalprice, 0.9)").as("p90_price"),
        min(col("o_totalprice")).as("min_price"))

  /** Robust per-group outlier detection via median absolute deviation —
    * the heavy-tail-safe alternative to mean/σ z-scores (one fat-finger
    * value shifts a mean arbitrarily; the median and MAD have a 50%
    * breakdown point). Flags rows with |x − med| > 3·1.4826·MAD, the
    * standard "3 robust sigmas" rule (1.4826 ≈ 1/Φ⁻¹(3/4) makes MAD a
    * consistent σ estimator under normality).
    *
    * Two bounded-key aggregate passes (median, then MAD of deviations),
    * each broadcasting its group-sized result back onto the fact table —
    * the winsorize plan shape, riding the same percentile ↔
    * quantile_cont parity. The threshold compare is written
    * `dev·10⁴ > 44478·mad` — exactly-representable literals on both
    * sides, so no cross-engine decimal-literal drift can flip a
    * boundary row.
    */
  def madOutliers(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("event_type"), col("value"))
    val med = ev.groupBy("event_type").agg(expr("percentile(value, 0.5)").as("med"))
    val dev = ev.join(broadcast(med), "event_type")
      .withColumn("dev", abs(col("value") - col("med")))
    val madDf = dev.groupBy("event_type").agg(
      expr("percentile(dev, 0.5)").as("mad"),
      min(col("med")).as("med"),
      count(lit(1)).as("n_rows"))
    dev.join(broadcast(madDf.select(col("event_type"), col("mad"))), "event_type")
      .groupBy("event_type")
      .agg(sum((col("dev") * lit(10000.0) > lit(44478.0) * col("mad"))
        .cast("bigint")).as("n_outliers"))
      .join(madDf, "event_type")
      .select(col("event_type"), col("n_rows"), col("med"), col("mad"), col("n_outliers"))
      .orderBy("event_type")
  }

  /** Contiguous 0-based global row numbering in `orderExpr` order WITHOUT
    * the global-window bottleneck. `row_number() OVER (ORDER BY …)` with
    * no partition key plans an `Exchange SinglePartition` — every row
    * through ONE task, the classic 100 TB scale-killer for "assign
    * training-example ids". This operator gets the identical numbering
    * from three bounded pieces: range-partition on the order key, rank
    * WITHIN each partition (a parallel window), and add per-partition
    * offsets computed from a partitions-sized count frame that cumsums
    * in one tiny window and broadcasts back. The result is independent
    * of where the range boundaries land, so sampling drift in the range
    * partitioner can never change an id.
    *
    * Contract: `orderExpr` must be unique (it defines the total order; a
    * duplicate key's relative numbering would be tie-broken by physical
    * placement — nondeterministic).
    */
  def denseIds(df: DataFrame, orderExpr: String, partitions: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(partitions >= 1, s"partitions must be >= 1, got $partitions")
    val parted = df
      .repartitionByRange(partitions, expr(orderExpr))
      .withColumn("_pid", spark_partition_id())
    val ranked = parted.withColumn(
      "_rk",
      row_number().over(Window.partitionBy(col("_pid")).orderBy(expr(orderExpr))))
    val counts = parted.groupBy("_pid").agg(count(lit(1)).as("_n"))
    // per-partition offset = Σ counts of all LOWER pids — a triangular
    // join on the partitions-sized counts frame (≤ `partitions`² pairs,
    // trivially bounded), equivalent to the cumulative-sum window it
    // replaces. The window ran unpartitioned — fine on a partitions-sized
    // frame, but it flooded driver logs with WindowExec single-partition
    // warnings on every execution (round-16 verdict item 9), burying the
    // warnings that matter.
    val offsets = counts
      .join(counts.select(col("_pid").as("_p2"), col("_n").as("_n2")),
        col("_p2") < col("_pid"), "left")
      .groupBy(col("_pid"))
      .agg(coalesce(sum(col("_n2")), lit(0L)).as("_off"))
    ranked.join(broadcast(offsets.select(col("_pid"), col("_off"))), Seq("_pid"))
      .withColumn("id", col("_off") + col("_rk") - lit(1L))
      .drop("_pid", "_rk", "_off")
  }

  /** The dense_ids gate entry: number the documents by doc_id. */
  def denseIdsDocs(s: SparkSession, dir: String): DataFrame =
    denseIds(Tables.documents(s, dir).select(col("doc_id"), col("lang")), "doc_id")
      .orderBy(col("doc_id"))

  /** Winsorization — clamp a numeric feature to its per-group [p1, p99]
    * band, the outlier-capping step feature pipelines run before
    * normalization (a single fat-finger price otherwise dominates a
    * mean/σ scaler). Two passes: an exact-percentile aggregate on the
    * bounded group key, whose 3-row result broadcasts back onto the fact
    * table for the clamp pass — the fact side never shuffles twice.
    * Clamped money sums as decimal(18,2) (order-independent, so the gate
    * is stable under partitioning); the bounds themselves ride on the
    * `percentile` ↔ `quantile_cont` parity the price_percentiles gate
    * already pins. At 100 TB the exact percentile (a sort-based agg that
    * buffers each group) swaps for `approx_percentile` — same plan shape,
    * sketch-gated accuracy instead of a hash gate.
    */
  def winsorizedStats(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(col("l_returnflag"), col("l_extendedprice"))
    val qs = li.groupBy("l_returnflag").agg(
      expr("percentile(l_extendedprice, 0.01)").as("q01"),
      expr("percentile(l_extendedprice, 0.99)").as("q99"))
    li.join(broadcast(qs), "l_returnflag")
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("l_extendedprice") < col("q01"), 1L).otherwise(0L)).as("n_floor"),
        sum(when(col("l_extendedprice") > col("q99"), 1L).otherwise(0L)).as("n_ceil"),
        min(col("q01")).as("q01"),
        min(col("q99")).as("q99"),
        sum(least(greatest(col("l_extendedprice"), col("q01")), col("q99"))
          .cast("decimal(18,2)")).cast("decimal(18,2)").as("winsorized_sum"))
      .orderBy("l_returnflag")
  }

  /** Generator / lateral view: one row per token with its position
    * (`posexplode`). The 100 TB shape: explode multiplies rows INSIDE a
    * partition — no shuffle, and the narrow projection keeps row width
    * tiny before the blowup.
    */
  def explodeTokens(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), col("pos"), col("col").as("token"))

  /** Math-function sweep restricted to operations with bit-exact IEEE
    * results in every engine: abs/floor/ceil/sign, sqrt (correctly rounded
    * per IEEE-754), integer mod/div. exp/ln/pow are deliberately absent —
    * libm vs StrictMath differ in the last ulp.
    */
  def mathOps(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).select(
      col("o_orderkey"),
      abs(col("o_totalprice") - 150000.0).as("abs_delta"),
      floor(col("o_totalprice")).as("price_floor"),
      ceil(col("o_totalprice")).as("price_ceil"),
      signum(col("o_totalprice") - 150000.0).cast("int").as("delta_sign"),
      sqrt(col("o_totalprice")).as("price_sqrt"),
      pmod(col("o_orderkey"), lit(7L)).as("key_mod7"),
      (col("o_orderkey") / 1000L).cast("long").as("key_div1k"),
      least(col("o_totalprice"), lit(100000.0)).as("capped"),
      greatest(col("o_totalprice"), lit(100000.0)).as("floored"))

  /** Window-frame sweep: RANGE frame over event-time micros (30-day
    * trailing revenue), ntile / percent_rank / cume_dist, first_value.
    * The range-frame sum is decimal (exact under any accumulation order —
    * range frames are re-aggregated per row, so double would drift).
    */
  def windowFrames(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val micros30d = 30L * 24 * 3600 * 1000000
    val byTime = Window.partitionBy(col("o_custkey"))
      .orderBy(col("t_us"))
      .rangeBetween(-micros30d, 0)
    val byPrice = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      // o_orderdate is TIMESTAMP_NTZ in the parquet; session tz is UTC so
      // the cast to (LTZ) timestamp is the identity mapping to epoch micros
      .withColumn("t_us", unix_micros(col("o_orderdate").cast("timestamp")))
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        sum(col("o_totalprice").cast("decimal(12,2)")).over(byTime)
          .cast("double").as("trailing_30d_spend"),
        ntile(4).over(byPrice).as("price_quartile"),
        percent_rank().over(byPrice).as("price_pct_rank"),
        cume_dist().over(byPrice).as("price_cume_dist"),
        first_value(col("o_orderkey")).over(byPrice).as("top_order"))
  }

  /** Unpivot / melt: wide lineitem metrics to long (metric, value) rows.
    * Like explode, a partition-local row multiplier — no shuffle.
    */
  def unpivotMetrics(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        "metric", "value")

  /** Equi-width histogram of order prices: global min/max (one tiny agg,
    * broadcast back) then a partition-local bucket assignment + count.
    * The bucket arithmetic is the same IEEE expression in both engines.
    */
  def histogramPrices(s: SparkSession, dir: String): DataFrame = {
    val b = Tables.orders(s, dir)
      .agg(min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"))
    Tables.orders(s, dir)
      .crossJoin(broadcast(b))
      .select(least(
        floor((col("o_totalprice") - col("lo")) / (col("hi") - col("lo")) * 10.0),
        lit(9.0)).cast("long").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_orders"))
  }

  /** MapType surface: per-user event-type→count map built with
    * `map_from_entries`, queried with `element_at`/`size`. The map is
    * internal; outputs are scalars (maps don't hash portably across
    * engines). Two-level aggregation — the second stage shuffles only one
    * row per (user, type).
    */
  def mapOps(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg(map_from_entries(collect_list(struct(col("event_type"), col("n"))))
        .as("type_counts"))
      .select(
        col("user_id"),
        coalesce(element_at(col("type_counts"), "purchase"), lit(0L)).as("n_purchase"),
        coalesce(element_at(col("type_counts"), "click"), lit(0L)).as("n_click"),
        size(col("type_counts")).as("n_types"))

  /** Edit-distance between adjacent customer names — the fuzzy-match
    * primitive (classic DP, exact integer result in every engine). The
    * adjacency self-join is a 1-shift equi-join: hash join on the key,
    * never a cross product.
    */
  def fuzzyNamePairs(s: SparkSession, dir: String): DataFrame = {
    val a = Tables.customer(s, dir).select(col("c_custkey"), col("c_name"))
    val b = Tables.customer(s, dir)
      .select((col("c_custkey") - 1).as("prev_key"), col("c_name").as("next_name"))
    a.join(b, col("c_custkey") === col("prev_key"))
      .select(
        col("c_custkey"), col("c_name"), col("next_name"),
        levenshtein(col("c_name"), col("next_name")).as("edit_dist"))
  }

  /** Blocked record linkage scored by Jaro–Winkler — the classic
    * entity-resolution pipeline: a bounded blocking key (p_brand, 25
    * blocks) turns the quadratic all-pairs into per-block self-joins,
    * and the compiled [[graft.functions.JaroWinkler]] expression scores
    * candidates inside whole-stage codegen. At 100 TB the block key is
    * the scale lever: pairs per block are (block size)², so skewed
    * blocks fall to the salting playbook, never to a cartesian.
    *
    * Gate: raw pairs above 0.8 with the score rounded to 6dp — DuckDB
    * recomputes with its native `jaro_winkler_similarity`, so the gate
    * cross-checks two INDEPENDENT implementations of the metric (the
    * rounding absorbs last-ulp association drift, not algorithmic
    * divergence — m, t, prefix or threshold differences shift the third
    * decimal and fail the hash).
    */
  def recordLinkage(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.StringSimilarityFunctions.jaro_winkler
    val p = Tables.part(s, dir).select(col("p_partkey"), col("p_brand"), col("p_name"))
    val a = p.select(col("p_brand"), col("p_partkey").as("key_a"), col("p_name").as("name_a"))
    val b = p.select(col("p_brand"), col("p_partkey").as("key_b"), col("p_name").as("name_b"))
    a.join(b, Seq("p_brand")).where(col("key_a") < col("key_b"))
      // Membership thresholds on the RAW score — a deliberate, MEASURED
      // rejection of the round-the-predicate suggestion: any filter on
      // round(jw, 6) is substituted and pushed into the join condition
      // by Catalyst (a post-projection Filter does not stay above the
      // join), and Spark's round() on a double allocates a BigDecimal
      // per evaluation — paying it on EVERY candidate pair doubled the
      // whole query (2.9 → 5.2 s at sf0.1; a two-stage
      // raw-prefilter-then-rounded-filter form was pushed down and
      // re-merged identically). Raw-threshold membership is already
      // rounding-stable here because BOTH engines evaluate the SAME
      // bit-identical scorer ([[graft.functions.JaroWinkler]] mirrors
      // DuckDB's byte-level floored-transposition form, fuzz-verified
      // over 8k random pairs in HashProperties) — the two sides compare
      // the same double against the same literal, so no pair can be
      // admitted by exactly one engine. The 6dp rounding protects only
      // the EMITTED value, computed once for survivors.
      .withColumn("jw", jaro_winkler(col("name_a"), col("name_b")))
      .where(col("jw") >= 0.8)
      .select(col("p_brand"), col("key_a"), col("key_b"),
        round(col("jw"), 6).as("jw_r6"))
  }

  /** Edit-distance entity resolution — the Levenshtein complement to
    * [[recordLinkage]]'s Jaro-Winkler: JW favors shared prefixes (names,
    * brands), Levenshtein counts raw edits, so the two catch different
    * typo classes and production matchers run both. Every emitted
    * distance is an EXACT integer (the one metric in the linkage family
    * with no float in it at all), so the gate needs no rounding
    * discipline; the similarity ratio 1 − d/max(len) is one terminal
    * IEEE division.
    *
    * Blocking is two-level — (brand, first name token) — a deliberately
    * FINER key than recordLinkage's brand-only: Levenshtein is O(|a|·|b|)
    * per pair where the compiled JW scorer is near-linear, so the pair
    * budget must be smaller for the same wall-clock. Measured on part:
    * brand-only is 8.0M pairs at sf0.1, brand+token is 1.0M. Pair count
    * is Σ block², the documented lever; candidates never materialize
    * outside the per-block join.
    */
  def editLinkage(s: SparkSession, dir: String, maxDist: Int = 4): DataFrame = {
    val p = Tables.part(s, dir)
      .select(col("p_partkey"), col("p_brand"),
        split(col("p_name"), " ").getItem(0).as("w1"), col("p_name"))
    val a = p.select(col("p_brand"), col("w1"),
      col("p_partkey").as("key_a"), col("p_name").as("name_a"))
    val b = p.select(col("p_brand"), col("w1"),
      col("p_partkey").as("key_b"), col("p_name").as("name_b"))
    a.join(b, Seq("p_brand", "w1")).where(col("key_a") < col("key_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .where(col("dist") <= maxDist)
      .select(col("p_brand"), col("key_a"), col("key_b"),
        col("dist").cast("bigint").as("dist"),
        (lit(1.0) - col("dist").cast("double") /
          greatest(length(col("name_a")), length(col("name_b"))).cast("double"))
          .as("sim"))
  }

  /** Sorted-neighborhood candidate generation (Hernández & Stolfo,
    * SIGMOD 1995) — the third blocking strategy in the linkage family:
    * equi-blocking ([[recordLinkage]]: brand; [[editLinkage]]: brand +
    * first token) only pairs records whose block keys MATCH EXACTLY, so
    * a typo in the blocking field itself hides the pair. Sorting each
    * block by the fuzzy field and pairing each record with its next `w`
    * sort-neighbors catches near-misses that share a sort prefix but no
    * token — and the candidate count is EXACTLY n·w, linear by
    * construction (equi-blocking is Σ block², quadratic in block size).
    *
    * Plan shape: pairs are NOT a band join (a brand-only join with a
    * position filter would still materialize block² rows before
    * filtering) — the w neighbor offsets become w shifted copies of the
    * position frame, each pairing by pure (block, pos) EQUI-join, so
    * nothing bigger than n·w ever exists. The per-block ranking window
    * sorts one block per task; block count grows with the catalog (the
    * GenScale regime), and the sort field prefix can be folded into the
    * block key when a single block outgrows a task — the same
    * granularity lever every blocker in this family documents.
    * Distances are exact-integer Levenshtein: no rounding discipline.
    */
  def sortedNeighborhood(s: SparkSession, dir: String, window: Int = 2): DataFrame = {
    require(window >= 1 && window <= 10, s"window must be in [1,10], got $window")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("p_brand")).orderBy(col("p_name"), col("p_partkey"))
    val pos = Tables.part(s, dir)
      .select(col("p_partkey"), col("p_brand"), col("p_name"))
      .withColumn("pos", row_number().over(w))
    val left = (1 to window).map { k =>
      pos.select(col("p_brand"), (col("pos") + k).as("pos"),
        col("p_partkey").as("key_a"), col("p_name").as("name_a"),
        lit(k.toLong).as("gap"))
    }.reduce(_ unionByName _)
    left.join(
      pos.select(col("p_brand"), col("pos"),
        col("p_partkey").as("key_b"), col("p_name").as("name_b")),
      Seq("p_brand", "pos"))
      .select(col("p_brand"), col("key_a"), col("key_b"), col("gap"),
        levenshtein(col("name_a"), col("name_b")).cast("bigint").as("dist"))
  }

  /** Blocking-strategy evaluation — the "measure your blocker" harness
    * (the [[graft.ext.Dedup.lshTuning]] idea applied to entity
    * resolution): every blocker trades candidates for recall, and the
    * only honest way to pick one is to COUNT both against a ground
    * truth. Truth here is the exact in-brand Levenshtein-≤2 pair set
    * over a DETERMINISTIC brand sample (brands whose tag ends in '3',
    * ~1/10 of the catalog) — sampled truth is how production evaluates
    * blockers too, because exhaustive truth is the quadratic cost the
    * blocker exists to avoid; the sample is exact, not approximate,
    * within its slice.
    *
    * Three strategies, one row each: `brand` (coarse equi-block — by
    * construction it CONTAINS all in-brand truth, so its recall is the
    * definitional 1.0 and its candidate count is the cost ceiling),
    * `brand_token` ([[editLinkage]]'s two-level key), and
    * `sorted_neighborhood` (w = 2 sort-neighbors). Emitted per
    * strategy: global candidate count, truth size, truth found, recall
    * and candidates-per-truth-pair as terminal divisions of exact
    * int64s.
    *
    * Shape: candidate counts are aggregates over the same equi-joins
    * the production blockers run (never materialized wide); the truth
    * join is bounded by the brand sample. Output is 3 rows at any
    * corpus size.
    */
  def blockingEval(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = Tables.part(s, dir)
      .select(col("p_partkey"), col("p_brand"),
        split(col("p_name"), " ").getItem(0).as("w1"), col("p_name"))
    // endsWith/LIKE '%3' — the one suffix predicate both engines share
    // verbatim (negative substr starts differ cross-engine)
    val sampled = p.where(col("p_brand").endsWith("3"))
    // exact truth on the sampled brands: in-brand pairs at lev <= 2
    val ta = sampled.select(col("p_brand"), col("p_partkey").as("key_a"),
      col("p_name").as("name_a"))
    val tb = sampled.select(col("p_brand"), col("p_partkey").as("key_b"),
      col("p_name").as("name_b"))
    // Length prefilter before the DP (r17, guide §1.2 per-task work):
    // lev(a,b) ≥ |len(a)−len(b)|, so the length conjunct is implied by
    // `lev ≤ 2` — same truth set — and codegen short-circuits the O(n·m)
    // DP for every pair it rejects (LevProbe: 2.03 → 1.27 s on the
    // brand+token pair stream). Two REJECTED-by-measurement alternatives,
    // both slower on these ~25-char names: the 3-arg banded levenshtein
    // (1.73 vs 1.28 s — band bookkeeping beats the tiny full DP) and a
    // one-pass union-of-strategies restructure (honest forced 3.9 vs
    // 2.5 s — the per-strategy semi-joins were never the bottleneck).
    val truth = ta.join(tb, Seq("p_brand")).where(col("key_a") < col("key_b"))
      .where(abs(length(col("name_a")) - length(col("name_b"))) <= 2 &&
        levenshtein(col("name_a"), col("name_b")) <= 2)
      .select(col("p_brand"), col("key_a"), col("key_b"))
    val nTruth = truth.agg(count(lit(1)).as("n_truth"))

    def strategyRow(name: String, cand: DataFrame): DataFrame = {
      val nCand = cand.agg(count(lit(1)).as("n_candidates"))
      val found = truth.join(cand, Seq("p_brand", "key_a", "key_b"), "left_semi")
        .agg(count(lit(1)).as("n_found"))
      nCand.crossJoin(broadcast(nTruth)).crossJoin(broadcast(found))
        .select(lit(name).as("strategy"),
          col("n_candidates").cast("bigint").as("n_candidates"),
          col("n_truth").cast("bigint").as("n_truth"),
          col("n_found").cast("bigint").as("n_found"),
          when(col("n_truth") > 0,
            col("n_found").cast("double") / col("n_truth").cast("double"))
            .as("recall"),
          when(col("n_truth") > 0,
            col("n_candidates").cast("double") / col("n_truth").cast("double"))
            .as("candidates_per_truth"))
    }

    def pairs(blockCols: Seq[String]): DataFrame = {
      val a = p.select((blockCols.map(col) :+ col("p_partkey").as("key_a")): _*)
      val b = p.select((blockCols.map(col) :+ col("p_partkey").as("key_b")): _*)
      a.join(b, blockCols).where(col("key_a") < col("key_b"))
        .select(col("p_brand"), col("key_a"), col("key_b"))
    }
    val posW = Window.partitionBy(col("p_brand")).orderBy(col("p_name"), col("p_partkey"))
    val pos = p.withColumn("pos", row_number().over(posW))
    val snPairs = (1 to 2).map { k =>
      pos.select(col("p_brand"), (col("pos") + k).as("pos"),
        col("p_partkey").as("kl"))
        .join(pos.select(col("p_brand"), col("pos"),
          col("p_partkey").as("kr")), Seq("p_brand", "pos"))
        .select(col("p_brand"),
          least(col("kl"), col("kr")).as("key_a"),
          greatest(col("kl"), col("kr")).as("key_b"))
    }.reduce(_ unionByName _)

    strategyRow("brand", pairs(Seq("p_brand")))
      .unionByName(strategyRow("brand_token", pairs(Seq("p_brand", "w1"))))
      .unionByName(strategyRow("sorted_neighborhood", snPairs))
  }

  /** Exact weighted median per group — the robust center a mean-based
    * report can't give when weights are lopsided (median part price
    * weighted by size/volume, median latency weighted by traffic). The
    * selection rule is the integer form: the weighted median is the
    * first value in sort order whose running weight W_i satisfies
    * 2·W_i ≥ W_total — no floats anywhere until the value itself is
    * emitted, and ties in the value column break on the tiebreak column
    * so both engines walk the same order.
    *
    * Shape: one ranking window per group (cumulative weight over the
    * group's sort order) + a 1-row-per-group reduction. Groups are the
    * bounded dimension key; the window never spans more than a group.
    */
  def weightedMedian(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      weightCol: String,
      tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("g"))
      .orderBy(col("v"), col("tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = df.select(col(groupCol).as("g"), col(valueCol).as("v"),
      col(weightCol).cast("bigint").as("wt"), col(tieCol).as("tie"))
      .where(col("wt") > 0)
      .withColumn("cw", sum(col("wt")).over(w))
      .withColumn("tw", sum(col("wt")).over(Window.partitionBy(col("g"))))
    cum.where(lit(2L) * col("cw") >= col("tw"))
      .groupBy(col("g"))
      .agg(min_by(struct(col("v"), col("tie")), struct(col("v"), col("tie")))
        .getField("v").as("weighted_median"),
        max(col("tw")).as("total_weight"))
      .select(col("g").as(groupCol), col("weighted_median"),
        col("total_weight").cast("bigint").as("total_weight"))
  }

  /** Statistical moments from EXACT decimal accumulators: mean, variance,
    * stddev, and corr(quantity, price) are derived with the textbook
    * formulas from decimal sums (S, S², cross-product). Built-in
    * `stddev`/`corr` stream Welford-style partials whose double merges are
    * partition-order-dependent — fine for analytics, wrong for
    * reproducible results. Decimal partials are order-independent; the
    * closed-form double arithmetic at the end is deterministic. Same
    * single-shuffle shape as any groupBy.
    */
  def statsMoments(s: SparkSession, dir: String): DataFrame = {
    // quantity and discount, NOT price: every decimal sum here keeps its
    // unscaled value below 2^53, so decimal→double conversion is exact in
    // both engines. (Σprice² overflows that bound and DuckDB's int128→
    // double→÷10⁴ then double-rounds while Java single-rounds — a 1-ulp
    // cross-engine trap measured at sf0.001.)
    val q = col("l_quantity").cast("decimal(12,2)")
    val d = col("l_discount").cast("decimal(12,2)")
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(q).as("sq"), sum(d).as("sd"),
        sum(q * q).as("sqq"), sum(d * d).as("sdd"), sum(q * d).as("sqd"))
      .select(
        col("l_returnflag"), col("n"),
        (col("sq").cast("double") / col("n")).as("mean_qty"),
        ((col("sqq").cast("double")
          - col("sq").cast("double") * col("sq").cast("double") / col("n"))
          / (col("n") - 1)).as("var_qty"),
        ((col("n") * col("sqd").cast("double")
          - col("sq").cast("double") * col("sd").cast("double"))
          / (sqrt(col("n") * col("sqq").cast("double")
              - col("sq").cast("double") * col("sq").cast("double"))
            * sqrt(col("n") * col("sdd").cast("double")
              - col("sd").cast("double") * col("sd").cast("double"))))
          .as("corr_qty_discount"))
      .select(
        col("l_returnflag"), col("n"), col("mean_qty"), col("var_qty"),
        sqrt(col("var_qty")).as("stddev_qty"), col("corr_qty_discount"))
  }

  /** Boolean aggregates: bool_or / bool_and / count_if per group. */
  def boolAggs(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        expr("bool_or(o_totalprice > 400000.0)").as("any_big"),
        expr("bool_and(o_totalprice > 0.0)").as("all_positive"),
        expr("count_if(o_totalprice > 400000.0)").as("n_big"))

  /** Schema-evolution union: two projections with different column sets
    * merged by NAME with null fill-in (`unionByName(allowMissingColumns)`)
    * — positional union would silently misalign columns.
    */
  def unionByNameOps(s: SparkSession, dir: String): DataFrame = {
    val big = Tables.orders(s, dir)
      .filter(col("o_totalprice") > 400000.0)
      .select(col("o_orderkey"), col("o_totalprice"))
    val urgent = Tables.orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderpriority"))
    big.unionByName(urgent, allowMissingColumns = true)
  }

  /** Second string sweep: split_part, padding, translate, regex predicate,
    * reverse, data-driven repeat. (initcap is absent from DuckDB, so it
    * lives in unit tests only.)
    */
  def stringOps2(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(
      col("c_custkey"),
      col("c_name"),
      expr("split_part(c_name, '#', 2)").as("name_num"),
      lpad(col("c_custkey").cast("string"), 10, "0").as("key_padded"),
      rpad(col("c_mktsegment"), 12, ".").as("seg_padded"),
      translate(col("c_name"), "#", "-").as("name_dashed"),
      col("c_name").rlike("[02468]$").as("ends_even"),
      reverse(col("c_name")).as("name_rev"),
      expr("repeat('*', cast(c_custkey % 5 as int))").as("stars"))

  /** Higher-order array functions as a first-class surface: transform /
    * filter / aggregate (fold) / contains over a data-driven `sequence`.
    * All lambdas run inside codegen — no UDF, no shuffle.
    */
  def hofOps(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).selectExpr(
      "o_orderkey",
      "array_join(transform(sequence(1, o_orderkey % 5 + 1), x -> cast(x * x as string)), ',') as squares_csv",
      "aggregate(sequence(1, o_orderkey % 5 + 1), 0L, (acc, x) -> acc + x) as sum_arr",
      "cast(size(filter(sequence(1, o_orderkey % 5 + 1), x -> x % 2 = 0)) as int) as n_even",
      "array_contains(sequence(1, o_orderkey % 5 + 1), 3) as has_3")

  /** Error-safe `try_*` functions: malformed casts, divide-by-zero and
    * overflow yield NULL instead of failing the job — at 100 TB a single
    * poisoned row must not kill a 6-hour pipeline.
    */
  def tryOps(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).selectExpr(
      "o_orderkey",
      // malformed on ~0.1% of rows (key % 1000 == 7): the NULL branch
      // still fires at every sf, but TRY evaluation pays Java
      // exception-throw machinery per FAILING row — the original
      // try_cast(o_orderpriority as int) failed on EVERY row and that
      // single column cost 1.1 s of try_ops' 2.5 s forced at sf0.1
      // (TryProbe, round 13) — same lesson as overflow_add below
      """try_cast(case when o_orderkey % 1000 = 7 then o_orderpriority
        |         else split_part(o_orderpriority, '-', 1) end as int)
        |  as pri_int""".stripMargin,
      "try_cast(split_part(o_orderpriority, '-', 1) as int) as pri_num",
      "try_divide(o_totalprice, cast(o_custkey % 3 as double)) as per_bucket",
      // overflow on ~0.1% of rows (key % 1000 == 0, key > 0): BOTH
      // try_add branches fire at every sf. The original
      // try_add(Long.MaxValue, key) overflowed on EVERY row — the null
      // branch was total, the value branch untested, and the per-row
      // ArithmeticException machinery alone cost 2.0 s of try_ops'
      // 4.0 s forced re-time at sf0.1 (isolated round 12)
      """try_add(case when o_orderkey % 1000 = 0 then 9223372036854775807L
        |        else 0L end, o_orderkey) as overflow_add""".stripMargin)

  /** Datetime formatting and parse round-trip (numeric patterns only —
    * textual month/day names are locale-dependent and not portable).
    */
  def dateFormatOps(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).select(
      col("o_orderkey"),
      date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
      date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("full_ts"),
      to_timestamp(date_format(col("o_orderdate"), "yyyy-MM-dd"), "yyyy-MM-dd")
        .as("parsed_day"),
      date_format(col("o_orderdate"), "D").cast("int").as("day_of_year"))

  /** Time-series resample with gap fill: dense hourly buckets per event
    * type (each type's own min..max span), missing hours as 0. The axis
    * is generated from the AGGREGATED bounds (O(types) rows exploded to
    * O(hours)) — never from the raw events — then left-joined to the
    * hourly counts. The standard "no silent gaps in the chart" op.
    */
  def resampleFill(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("b"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val axis = hourly
      .groupBy(col("event_type").as("et"))
      .agg(min(col("b")).as("lo"), max(col("b")).as("hi"))
      .select(col("et"),
        explode(sequence(col("lo"), col("hi"), expr("interval 1 hour"))).as("bucket"))
    axis.join(hourly,
        axis("et") === hourly("event_type") && axis("bucket") === hourly("b"), "left")
      .select(col("et").as("event_type"), col("bucket"),
        coalesce(col("n"), lit(0L)).as("n_events"))
  }

  /** Outer generator: `posexplode_outer` keeps rows whose array is empty
    * (null pos/element) — the explode form that doesn't silently drop
    * parents. The array here is data-driven-empty for every third key.
    */
  def explodeOuter(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .withColumn("arr", expr("filter(sequence(1, 3), x -> x <= o_orderkey % 3)"))
      .select(col("o_orderkey"), posexplode_outer(col("arr")))
      .select(col("o_orderkey"), col("pos"),
        col("col").cast("long").as("elem"))

  /** Approximate quantile sketch (`percentile_approx`) — the streaming/
    * distributed quantile path when exact `percentile`'s full sort-merge
    * is too expensive. Sketch values are engine-specific, so the ORACLE
    * GATE is a rank-error bound computed Spark-side: the approx median
    * must land between the exact p45 and p55 values (and p90 between
    * p85/p95) — accuracy=1000 guarantees rank error ≤ 0.1%, so a healthy
    * sketch passes with 49 ranks of slack and a broken one flips the
    * boolean into a hash mismatch. The oracle emits the exact row count
    * and literal `true`s.
    *
    * Tiny groups are exempted (`n_rows < 20`): the sketch returns an
    * actual data ELEMENT while `percentile` INTERPOLATES, and below
    * ~11 rows a perfect sketch's element can legitimately fall outside
    * the interpolated ±5-percentile band (e.g. 2 rows {10, 20}: approx
    * median 10 vs interpolated p45 = 14.5) — the rank-slack argument
    * needs 0.5·n−1 ≥ 0.45·(n−1).
    */
  def approxQuantiles(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        expr("percentile_approx(o_totalprice, array(0.5D, 0.9D), 1000)").as("q"),
        expr("percentile(o_totalprice, array(0.45D, 0.55D, 0.85D, 0.95D))").as("ex"),
        count(lit(1)).as("n_rows"))
      .select(col("o_orderstatus"), col("n_rows"),
        (col("n_rows") < 20 ||
          (element_at(col("q"), 1) >= element_at(col("ex"), 1) &&
            element_at(col("q"), 1) <= element_at(col("ex"), 2))).as("median_in_bounds"),
        (col("n_rows") < 20 ||
          (element_at(col("q"), 2) >= element_at(col("ex"), 3) &&
            element_at(col("q"), 2) <= element_at(col("ex"), 4))).as("p90_in_bounds"))

  /** MERGEABLE cardinality sketches (Apache DataSketches HLL): build one
    * sketch per group, then union the binary sketches into a global
    * estimate WITHOUT rescanning rows. This is the 100 TB architecture
    * for distinct counts over arbitrary roll-ups — per-partition/per-day
    * sketches persist once and merge into any coarser grain later.
    * The sketch binary is engine-specific, so the ORACLE GATE is the
    * exact distinct count plus a Spark-side accuracy boolean: both the
    * per-group estimates AND the merged-global estimate must land within
    * 5% of the exact count (default lgK=12 → rsd ≈ 1.6%, so a healthy
    * sketch passes with 3σ slack); the oracle computes the exact counts
    * and literal `true`.
    */
  def hllSketches(s: SparkSession, dir: String): DataFrame = {
    val per = Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        expr("hll_sketch_agg(o_custkey)").as("sk"),
        countDistinct(col("o_custkey")).as("exact_customers"))
    val within = (approx: Column, exact: Column) =>
      abs(approx.cast("double") - exact) <= exact * 0.05
    val perOut = per.select(col("o_orderstatus"), col("exact_customers"),
      within(expr("hll_sketch_estimate(sk)"), col("exact_customers")).as("within_5pct"))
    // the merged estimate unions BINARY sketches — no row rescan; only the
    // gate's exact global count rescans (test-rig cost, not operator cost)
    val allOut = per
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("approx"))
      .crossJoin(Tables.orders(s, dir)
        .agg(countDistinct(col("o_custkey")).as("exact_customers")))
      .select(lit("ALL").as("o_orderstatus"), col("exact_customers"),
        within(col("approx"), col("exact_customers")).as("within_5pct"))
    perOut.unionAll(allOut)
  }

  /** Estimated audience OVERLAP between every pair of event types via
    * HLL inclusion–exclusion — |A∩B| ≈ est(A) + est(B) − est(A∪B),
    * where the union estimate merges the two BINARY sketches
    * (`hll_union`), never rescanning rows. This is the sketch algebra
    * that answers "how much do these segments overlap" at 100 TB: one
    * distinct pass builds |types| sketches; every pairwise union is a
    * driver-sized sketch merge (intersection has no mergeable sketch —
    * inclusion–exclusion IS the standard estimator, e.g. the
    * DataSketches guidance).
    *
    * Gate: exact per-type and pairwise-intersection counts (the
    * pairwise exact is a user-keyed self-join of the distinct
    * (type, user) frame — ≤|types|² fanout per user), plus a Spark-side
    * boolean pinning the I–E estimate within 5% of |A|+|B| (the error
    * scale of the three ≈1.6%-rsd estimates it composes); the oracle
    * recomputes the exact counts and literal `true`.
    */
  def hllOverlap(s: SparkSession, dir: String): DataFrame =
    hllOverlapFrom(Tables.events(s, dir), "event_type", "user_id")

  /** [[hllOverlap]] over any (segment, member) frame. */
  def hllOverlapFrom(df: DataFrame, typeCol: String, userCol: String): DataFrame = {
    val tu = df
      .where(col(typeCol).isNotNull && col(userCol).isNotNull)
      .select(col(typeCol).as("t"), col(userCol).as("u"))
      .distinct()
    val per = tu.groupBy(col("t")).agg(
      expr("hll_sketch_agg(u)").as("sk"),
      count(lit(1)).as("n"))
    val pairs = per
      .select(col("t").as("etype_a"), col("sk").as("sk_a"), col("n").as("exact_a"))
      .join(broadcast(per.select(col("t").as("etype_b"), col("sk").as("sk_b"),
        col("n").as("exact_b"))), col("etype_a") < col("etype_b"))
    val exactBoth = tu.alias("x").join(tu.alias("y"), Seq("u"))
      .where(col("x.t") < col("y.t"))
      .groupBy(col("x.t").as("etype_a"), col("y.t").as("etype_b"))
      .agg(count(lit(1)).as("exact_both"))
    pairs.join(exactBoth, Seq("etype_a", "etype_b"), "left")
      .withColumn("exact_both", coalesce(col("exact_both"), lit(0L)))
      .withColumn("est_inter",
        expr("hll_sketch_estimate(sk_a) + hll_sketch_estimate(sk_b)" +
          " - hll_sketch_estimate(hll_union(sk_a, sk_b))").cast("double"))
      .select(col("etype_a"), col("etype_b"), col("exact_a"), col("exact_b"),
        col("exact_both"),
        (abs(col("est_inter") - col("exact_both"))
          <= (col("exact_a") + col("exact_b")).cast("double") * 0.05)
          .as("inter_within_5pct"))
  }

  /** Streaming twin of [[hllOverlap]]: each micro-batch reduces to ONE
    * (segment → HLL sketch) row set written to a batch-id directory
    * (whole-dir overwrite ⇒ replay-idempotent). This is the mergeable-
    * partials doctrine applied to distinct-membership: HLL union is a
    * register-wise max — associative, commutative AND idempotent — so
    * base + any committed prefix (even with a redelivered batch) merges
    * to the same audience sketches, with per-batch state bounded at
    * |segments|·sketch-bytes, never |users|. */
  def hllOverlapSink(
      df: DataFrame,
      typeCol: String,
      userCol: String,
      outDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        hllOverlapBatch(batch.toDF(), typeCol, userCol, outDir, batchId)
      }
      .start()

  /** One micro-batch's sketch partial (factored out for replay tests). */
  def hllOverlapBatch(
      df: DataFrame, typeCol: String, userCol: String,
      outDir: String, batchId: Long): Unit = {
    df.where(col(typeCol).isNotNull && col(userCol).isNotNull)
      .groupBy(col(typeCol).as("t"))
      .agg(expr(s"hll_sketch_agg($userCol)").as("sk"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$outDir/sketches/batch_$batchId")
    ()
  }

  /** Pairwise audience-overlap ESTIMATES from base rows plus every
    * committed [[hllOverlapSink]] partial. Unlike the batch gate query,
    * the streamed users exist only as sketches — no exact columns are
    * derivable (that is the point: bounded state) — so this emits the
    * three estimates per pair; accuracy is asserted in tests against an
    * exact recount of the full data. */
  def hllOverlapEstFrom(
      spark: SparkSession,
      base: DataFrame,
      typeCol: String,
      userCol: String,
      outDir: String): DataFrame = {
    val basePer = base
      .where(col(typeCol).isNotNull && col(userCol).isNotNull)
      .groupBy(col(typeCol).as("t"))
      .agg(expr(s"hll_sketch_agg($userCol)").as("sk"))
    val per = mergedSegmentSketches(spark, basePer, outDir)
    per.select(col("t").as("etype_a"), col("sk").as("sk_a"))
      .join(broadcast(per.select(col("t").as("etype_b"), col("sk").as("sk_b"))),
        col("etype_a") < col("etype_b"))
      .select(col("etype_a"), col("etype_b"),
        expr("hll_sketch_estimate(sk_a)").cast("double").as("est_a"),
        expr("hll_sketch_estimate(sk_b)").cast("double").as("est_b"),
        expr("hll_sketch_estimate(sk_a) + hll_sketch_estimate(sk_b)" +
          " - hll_sketch_estimate(hll_union(sk_a, sk_b))").cast("double")
          .as("est_inter"))
  }

  /** One (t → unioned sketch) row per segment from base rows plus every
    * committed [[hllOverlapSink]] partial — the shared merge both sketch
    * readers sit on. */
  private def mergedSegmentSketches(
      spark: SparkSession, basePer: DataFrame, outDir: String): DataFrame = {
    val committed = graft.ext.TextOps.committedBatchDirs(spark, s"$outDir/sketches")
    val all =
      if (committed.isEmpty) basePer
      else basePer.unionByName(spark.read.parquet(
        committed.toSeq.sorted.map(b => s"$outDir/sketches/$b"): _*))
    all.groupBy(col("t")).agg(expr("hll_union_agg(sk)").as("sk"))
  }

  /** Streaming twin of [[rollingDistinct]], the second reader over a
    * [[hllOverlapSink]] store keyed by DAY: per-day audience sketches
    * merge from base plus committed partials (streamed users exist ONLY
    * as sketches — bounded state is the point, so this emits estimates;
    * tests pin them within 5% of an exact recount), then the same
    * gap-honoring range-frame window unions ≤`days` sketches per day. */
  def rollingDistinctEstFrom(
      spark: SparkSession,
      base: DataFrame,
      dayCol: String,
      userCol: String,
      outDir: String,
      days: Int = 7): DataFrame = {
    require(days >= 1 && days <= 366, s"days must be in [1,366], got $days")
    val basePer = base.where(col(userCol).isNotNull && col(dayCol).isNotNull)
      .groupBy(col(dayCol).cast("date").as("t"))
      .agg(expr(s"hll_sketch_agg($userCol)").as("sk"))
    val per = mergedSegmentSketches(spark, basePer, outDir)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("day_num")).rangeBetween(-(days - 1), 0)
    per.withColumn("day_num", datediff(col("t"), to_date(lit("1970-01-01"))))
      .withColumn("roll_sk", expr("hll_union_agg(sk)").over(w))
      .select(col("t").cast("timestamp").as("day"),
        expr("hll_sketch_estimate(sk)").cast("double").as("est_dau"),
        expr("hll_sketch_estimate(roll_sk)").cast("double").as("est_rolling"))
  }

  /** Daily active users plus a 7-day ROLLING distinct-user count — the
    * windowed-sketch composition: one distinct pass builds per-day HLL
    * sketches, then the rolling estimate is a range-frame window union
    * of ≤7 kilobyte-sized sketches per day. At 100 TB the exact rolling
    * distinct (a 7× fanout of the distinct (day, user) frame) is the
    * thing you CAN'T afford daily; the sketch path re-aggregates nothing
    * — day count is calendar-bounded, so the single-partition window
    * over the daily frame is a non-issue at any corpus size.
    *
    * Gate: exact DAU and exact rolling-7 distinct (both recomputed by
    * the oracle) plus a Spark-side boolean pinning the window-unioned
    * estimate within 5% of exact; the oracle emits literal `true`. */
  def rollingDistinct(s: SparkSession, dir: String): DataFrame =
    rollingDistinctFrom(Tables.events(s, dir), "user_id", "ts")

  /** [[rollingDistinct]] over any (member, timestamp) frame. */
  def rollingDistinctFrom(
      df: DataFrame, userCol: String, tsCol: String, days: Int = 7): DataFrame = {
    require(days >= 1 && days <= 366, s"days must be in [1,366], got $days")
    val du = df.where(col(userCol).isNotNull)
      .select(to_date(col(tsCol)).as("day"), col(userCol).as("u"))
      .distinct()
    val daily = du.groupBy(col("day")).agg(
      count(lit(1)).as("exact_dau"),
      expr("hll_sketch_agg(u)").as("sk"))
    // range frame on day-number so calendar GAPS are honored (a rows
    // frame would silently widen the window across missing days)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("day_num")).rangeBetween(-(days - 1), 0)
    val est = daily
      .withColumn("day_num", datediff(col("day"), to_date(lit("1970-01-01"))))
      .withColumn("roll_sk", expr("hll_union_agg(sk)").over(w))
      .select(col("day"), col("exact_dau"),
        expr("hll_sketch_estimate(roll_sk)").cast("double").as("est_rolling"))
    val rolling = du
      .select(explode(expr(s"sequence(day, date_add(day, ${days - 1}))")).as("day"),
        col("u"))
      .groupBy(col("day"))
      .agg(countDistinct(col("u")).as("exact_rolling7"))
    est.join(rolling, Seq("day"))
      // midnight timestamp, the daily-store convention (dates stringify
      // differently across engines; midnight timestamps don't)
      .select(col("day").cast("timestamp").as("day"),
        col("exact_dau"), col("exact_rolling7"),
        (abs(col("est_rolling") - col("exact_rolling7"))
          <= col("exact_rolling7").cast("double") * 0.05).as("within_5pct"))
  }

  /** HLL++ approximate distinct — the sketch the exact `countDistinct`
    * path can't afford at 100 TB. The estimate is engine-specific, so the
    * ORACLE GATE emits the exact counts plus Spark-side 5%-accuracy
    * booleans (rsd=0.02 → 2.5σ slack); the oracle computes the exact
    * distinct counts and literal `true`.
    */
  def approxDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("approx_orders"),
        approx_count_distinct(col("l_partkey"), rsd = 0.02).as("approx_parts"),
        countDistinct(col("l_orderkey")).as("exact_orders"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .select(col("l_returnflag"), col("exact_orders"), col("exact_parts"),
        (abs(col("approx_orders").cast("double") - col("exact_orders"))
          <= col("exact_orders") * 0.05).as("orders_within_5pct"),
        (abs(col("approx_parts").cast("double") - col("exact_parts"))
          <= col("exact_parts") * 0.05).as("parts_within_5pct"))
}
