package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Bpe, Classify, Dedup, Geo, Graph, IndexCache, Multimodal, Sampling, Similarity, TextOps}
import graft.ops.{Audit, Cdc, Enrich, Functions, Incremental, Mining, Relational, Skew}
import graft.session.{ClickstreamPipeline, Sessionize, StateOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 gets an entry in `queries`
  * and, where ANSI-SQL-expressible, a DuckDB oracle in `oracleSql` over the
  * same parquet tables. Column names are aliased identically on both sides
  * (the driver's compare sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship: 30-minute-gap sessionization of the event stream —
    * the batch twin of the reference's stateful pipeline
    * (StructuredStreaming.scala:159-189). Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    qSessionize(spark, "/root/testdata/sf0.001")

  private def qSessionize(s: SparkSession, dir: String): DataFrame =
    Sessionize
      .withSessionIds(Tables.events(s, dir))
      .select("event_id", "user_id", "ts", "session_start", "session_seq", "session_id")

  private def qSessionStats(s: SparkSession, dir: String): DataFrame =
    Sessionize
      .sessionStats(Sessionize.withSessionIds(Tables.events(s, dir)))

  private val Cutoff = "2024-01-15 00:00:00"

  /** The keyword_tag gate dictionary (see the query declaration for why
    * these exact shapes); mirrored literally in the oracle's VALUES. */
  private val KeywordDict: Seq[String] = Seq(
    "table", "fast merge", "scan slow", "spark",
    "agg", "agg row", "value table", "a a")

  /** CDC gate fixtures: a compact customer snapshot plus a changelog
    * DERIVED deterministically from it (the oracle rebuilds the same
    * rows in SQL), exercising every MERGE case — two-version
    * latest-wins (% 30 == 3 keys get U v1 then U v2), plain update
    * (% 10 == 3), delete (% 10 == 7), delete-overridden-by-later-update
    * (% 20 == 17 — a 'D' at v·10+1 loses to a 'U' at v·10+5), insert
    * under fresh keys (% 10 == 1 → key + 10⁷), and untouched
    * pass-through (everything else). All key/version arithmetic in
    * bigint so both engines agree at any SF. */
  private def cdcSnapshot(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(
      col("c_custkey").cast("bigint").as("cust_id"),
      col("c_name").as("name"),
      col("c_nationkey").cast("bigint").as("nation"),
      col("c_mktsegment").as("segment"))

  private def cdcChangelog(snap: DataFrame): DataFrame = {
    val id = col("cust_id")
    val u1 = snap.filter(id % 10 === 3)
      .select(id, col("name"), col("nation"), lit("UPDATED1").as("segment"),
        lit("U").as("op"), (id * 10 + 1).as("version"))
    val u2 = snap.filter(id % 30 === 3)
      .select(id, col("name"), col("nation"), lit("UPDATED2").as("segment"),
        lit("U").as("op"), (id * 10 + 2).as("version"))
    val del = snap.filter(id % 10 === 7)
      .select(id, col("name"), col("nation"), col("segment"),
        lit("D").as("op"), (id * 10 + 1).as("version"))
    val revive = snap.filter(id % 20 === 17)
      .select(id, col("name"), col("nation"), lit("REVIVED").as("segment"),
        lit("U").as("op"), (id * 10 + 5).as("version"))
    val ins = snap.filter(id % 10 === 1)
      .select((id + 10000000L).as("cust_id"), lit("new_customer").as("name"),
        (id % 25).as("nation"), lit("NEW").as("segment"),
        lit("I").as("op"), lit(1L).as("version"))
    u1.unionByName(u2).unionByName(del).unionByName(revive).unionByName(ins)
  }

  private def qEnrich(s: SparkSession, dir: String): DataFrame =
    Enrich.enrichEvents(Tables.events(s, dir))

  /** The (order, brand) basket frame the basket-mining family shares. */
  private def brandBaskets(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_partkey"))
      .join(Tables.part(s, dir).select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))

  private def qChangeDetect(s: SparkSession, dir: String): DataFrame =
    StateOps
      .changeDetect(Tables.events(s, dir), "event_type")
      .select("event_id", "user_id", "ts", "event_type",
        "prev_event_type", "event_type_changed")

  private def qCarryForward(s: SparkSession, dir: String): DataFrame =
    StateOps
      .carryForwardLastPurchase(Tables.events(s, dir))
      .select("event_id", "user_id", "ts", "event_type", "value",
        "last_purchase_value", "last_purchase_ts")

  private def qStateSnapshot(s: SparkSession, dir: String): DataFrame =
    StateOps
      .stateSnapshot(Tables.events(s, dir))
      .select("user_id", "event_id", "ts", "event_type", "value")

  private def qNewVsReturning(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val cutoff = lit(Cutoff).cast("timestamp")
    val state = StateOps
      .stateSnapshot(ev.filter(col("ts") < cutoff))
      .select(col("user_id").as("u_id"), col("ts").as("state_ts"))
    StateOps
      .newVsReturning(ev.filter(col("ts") >= cutoff), state)
      .select("event_id", "user_id", "ts", "state_ts", "is_new")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sess_assign" -> (qSessionize _),
    "sess_stats" -> (qSessionStats _),
    "enrich" -> (qEnrich _),
    "change_detect" -> (qChangeDetect _),
    "carry_forward" -> (qCarryForward _),
    "state_snapshot" -> (qStateSnapshot _),
    "funnel_steps" -> ((s, d) =>
      graft.session.StateOps.funnelSteps(Tables.events(s, d))),
    // top user journeys: the event-type PATH of each (user, day),
    // ordered by (ts, event_id), counted across sessions — the classic
    // product-analytics path report. The per-session path builds with
    // the substring_dedup rebuild idiom (collect_list of a sortable
    // struct, array_sort, transform-join — bounded by the session's own
    // events, never a corpus-wide window); the top-100 is a distributed
    // TakeOrdered with a deterministic (count desc, path) order.
    "session_paths" -> ((s, d) =>
      Tables.events(s, d).where(col("event_type").isNotNull)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(expr(
          "array_join(transform(array_sort(collect_list(struct(ts, event_id, event_type))), x -> x.event_type), '>')")
          .as("path"))
        .groupBy(col("path"))
        .agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("n_sessions").desc, col("path"))
        .limit(100)),
    "cohort_retention" -> ((s, d) =>
      graft.session.StateOps.cohortRetention(Tables.events(s, d))),
    "rfm_segments" -> ((s, d) =>
      graft.session.StateOps.rfmSegments(Tables.events(s, d))),
    "new_vs_returning" -> (qNewVsReturning _),
    "q1_pricing" -> (Relational.pricingSummary _),
    "q3_top_unshipped" -> (Relational.topUnshippedOrders(_, _)),
    "q5_local_supplier" -> (Relational.localSupplierVolume _),
    "topk_per_group" -> (Relational.topOrdersPerCustomer(_, _)),
    "topk_agg" -> ((s, d) => {
      import s.implicits._
      // typed Aggregator path: partial top-k map-side, shuffles k rows per
      // group instead of every row (see TopKAggregator scaladoc)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_totalprice"), col("o_orderkey"))
        .as[(Long, Double, Long)]
        .groupByKey(_._1)
        .mapValues(t => (t._2, t._3))
        .agg(new graft.functions.TopKAggregator(3).toColumn.name("top_ids"))
        .toDF("o_custkey", "top_ids")
        .selectExpr("o_custkey",
          "array_join(transform(top_ids, x -> cast(x as string)), ',') as top_orderkeys_csv")
    }),
    "window_ranks" -> (Relational.orderRanks _),
    "running_qty" -> (Relational.runningSupplierQty _),
    "semi_anti" -> (Relational.customersByOrderExistence _),
    "set_ops" -> (Relational.setOpsCustkeys _),
    "agg_order_stats" -> (Relational.orderStatusStats _),
    "distinct_pairs" -> (Relational.distinctStatusPriority _),
    "sort_limit" -> (Relational.topLineitemsByPrice _),
    "pipeline_full" -> ((s, d) => ClickstreamPipeline.run(Tables.events(s, d))),
    "string_ops" -> (Functions.stringOps _),
    "date_ops" -> (Functions.dateOps _),
    "array_ops" -> (Functions.arrayOps _),
    "price_percentiles" -> (Functions.pricePercentiles _),
    "winsorize" -> (Functions.winsorizedStats _),
    "mad_outliers" -> (Functions.madOutliers _),
    "dense_ids" -> (Functions.denseIdsDocs _),
    // sketch queries are gated via Spark-side accuracy booleans against
    // the exact value (the sketch itself is engine-specific): the oracle
    // computes the exact columns and literal `true`, so a sketch accuracy
    // failure flips a hash mismatch instead of hiding in a unit test
    "approx_distinct" -> (Functions.approxDistinct _),
    "hll_sketches" -> (Functions.hllSketches _),
    "approx_quantiles" -> (Functions.approxQuantiles _),
    "resample_fill" -> (Functions.resampleFill _),
    "date_format_ops" -> (Functions.dateFormatOps _),
    "explode_outer" -> (Functions.explodeOuter _),
    "q8_market_share" -> (Relational.marketShare _),
    "q17_small_qty" -> (Relational.smallQtyRevenue _),
    "q15_top_supplier" -> (Relational.topSupplier _),
    "q12_late_lines" -> (Relational.lateLinesByStatus _),
    "q18_large_orders" -> ((s, d) => Relational.largeOrders(s, d)),
    "q21_waiting_supplier" -> (Relational.waitingSupplier _),
    "q22_global_sales" -> (Relational.globalSales _),
    "q2_min_cost_supp" -> (Relational.minCostSupplier _),
    "q20_excess_shippers" -> ((s, d) => Relational.excessShippers(s, d)),
    "q9_product_profit" -> (Relational.productProfit _),
    "q11_important_parts" -> (Relational.importantParts _),
    "q16_supplier_counts" -> (Relational.supplierPartCounts _),
    "sliding_window" -> (Relational.slidingAvgPrice _),
    "nulls_order" -> ((s, d) =>
      // explicit NULLS FIRST — Spark's asc default, DuckDB's is NULLS LAST,
      // so portable code always states it
      Relational.orderRanks(s, d)
        .orderBy(col("next_higher_price").asc_nulls_first,
          col("o_custkey"), col("o_orderkey"))
        .limit(30)),
    "embed_quantize" -> ((s, d) => Similarity.quantizeInt8(Tables.embeddings(s, d))),
    "pipeline_curate" -> ((s, d) => {
      // the end-to-end corpus curation pipeline: quality filter -> exact
      // dedup (deterministic keeper) -> stratified sample per language
      val docs = Tables.documents(s, d)
      val scored = TextOps.textStats(docs).select("doc_id", "quality_score")
      val good = docs.join(scored.filter(col("quality_score") >= 0.5), "doc_id")
      graft.ext.Sampling
        .stratifiedSample(Dedup.keepFirstByText(good), "lang", "doc_id", 10)
        .select("doc_id", "lang", "source", "n_chars")
    }),
    "pipeline_curate3" -> ((s, d) => {
      // CROSS-MODAL curation: a document survives iff its TEXT is the
      // exact-dedup keeper AND its EMBEDDING survives semantic dedup
      // (vec_id aligns with doc_id) AND it clears the quality floor.
      // Each signal is a deterministic id set; the embedding side's pair
      // search is cell-bounded (Similarity.semanticDedupKeep), and the
      // final report is one aggregate over the surviving corpus.
      val docs = Tables.documents(s, d)
      val keepText = Dedup.keepFirstByText(docs).select("doc_id")
      val keepVec = Similarity.semanticDedupKeep(Tables.embeddings(s, d), k = 16)
        .select(col("vec_id").as("doc_id"))
      val quality = TextOps.textStats(docs)
        .filter(col("quality_score") >= 0.5).select("doc_id")
      docs
        .join(keepText, Seq("doc_id"), "left_semi")
        .join(keepVec, Seq("doc_id"), "left_semi")
        .join(quality, Seq("doc_id"), "left_semi")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " ")).cast("bigint")).as("total_tokens"))
        .orderBy(col("lang"))
    }),
    "pipeline_curate4" -> ((s, d) => {
      // the WEB-INGEST chain end-to-end, composing the round-13 ops:
      // markup -> boilerplate removal (htmlExtract) -> blocklist
      // redaction (Aho-Corasick union-of-spans) -> mask-ratio floor
      // (drop docs that are mostly blocklist hits: 5*masked < chars,
      // an integer compare) -> per-lang rollup with masked-chars
      // telemetry. Every stage a pure projection until the final
      // bounded-key aggregate.
      val docs = Tables.documents(s, d)
      val clean = TextOps.htmlExtract(TextOps.synthesizeHtml(docs))
        .select(col("doc_id"), col("clean_text").as("text"))
      val red = TextOps.keywordRedact(clean, KeywordDict)
      red
        .where(col("n_masked") * 5 < length(col("redacted")))
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_masked")).as("total_masked"),
          sum(length(col("redacted")).cast("bigint")).as("total_chars"))
        .orderBy(col("lang"))
    }),
    "pipeline_curate2" -> ((s, d) => {
      // the modern curation chain end-to-end: drop eval-set docs ->
      // repetition filter -> decontaminate -> exact dedup (deterministic
      // keeper) -> per-source weighted mix -> corpus stats. Every stage is
      // a semi-join against a deterministic doc_id set, so the whole
      // pipeline composes as filters over ONE documents scan.
      val all = Tables.documents(s, d)
      val corpus = all.filter(col("doc_id") % 50 =!= 0)
      // aggregate-form repetition filter (see TextOps.repetitionCounts):
      // the flag predicate sits ABOVE a groupBy, so it cannot be pushed
      // into the interpreted bigram projection. The REPETITIVE ids feed an
      // anti join, so docs with <2 tokens (no counts row) are kept —
      // zero bigrams = not repetitive, matching the projection form.
      val repetitiveIds = TextOps.repetitionCounts(corpus)
        .filter(expr(
          "1.0 - cast(n_distinct_bigrams as double) / cast(n_bigrams as double) > 0.05"))
        .select("doc_id")
      val cleanIds = Dedup.contaminationCounts(all)
        .filter(col("contaminated") === 0).select("doc_id")
      val survivors = corpus
        .join(repetitiveIds, Seq("doc_id"), "left_anti")
        .join(cleanIds, Seq("doc_id"), "left_semi")
      // keep-first dedup as ONE min_by aggregate (same keeper as
      // keepFirstByText: min doc_id per text hash). The semi-join form
      // would put the whole filter chain under BOTH join sides (exchange
      // reuse can't collapse differently-pruned subplans); the former
      // row_number window had the single-consumer shape but buffered
      // each duplicate CLUSTER in one unsplittable window partition —
      // the skewed-key class de-skewed everywhere else this round.
      // min_by keeps the single consumer AND partial-aggregates: a
      // million-copy cluster collapses to one row per task before the
      // exchange ever sees it.
      val deduped = survivors
        .withColumn("_th", expr(s"${TextOps.md5Long64("text")}"))
        .groupBy(col("_th"))
        .agg(min_by(
          struct(survivors.columns.map(col): _*), col("doc_id")).as("_r"))
        .select(col("_r.*"))
      val rate = expr(Sampling.sourceRateSql)
      val sampled = deduped.filter(
        expr(s"pmod(${TextOps.md5Long64("cast(doc_id as string)")}, 100)") < rate)
      sampled
        .groupBy(col("source"), col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " ")).cast("bigint")).as("total_tokens"))
        .orderBy(col("source"), col("lang"))
    }),
    "sql_interface" -> ((s, d) => {
      // the SQL front door: same engine, same tables, ANSI SQL in.
      // Register only the views the statement references — q1PricingSql
      // reads lineitem alone, and registering all ten tables re-read
      // every parquet footer per run (this was the #2 slowest bench query
      // purely on bookkeeping). The self-sufficiency contract holds: the
      // query depends on no conf another query set (OpsSpec's
      // fresh-session test guards it). A real multi-table statement would
      // register exactly its own tables the same way — events via
      // Tables.events (nanos→micros ts), never the raw footer.
      Tables.load(s, d, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(q1PricingSql)
    }),
    "salted_agg" -> ((s, d) =>
      Skew.saltedSumCount(Tables.events(s, d), "user_id", "value", "event_id")),
    "skew_report" -> ((s, d) =>
      Skew.skewReport(Tables.events(s, d), "user_id")),
    "join_size_estimate" -> ((s, d) => {
      val ev = Tables.events(s, d)
      Skew.joinSizeEstimate(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase"),
        "user_id", "user_id")
    }),
    "join_advisor" -> ((s, d) => {
      val ev = Tables.events(s, d)
      Skew.joinAdvisor(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase"),
        "user_id", "user_id")
    }),
    // freq_itemsets and assoc_rules read ONE cached basket model per
    // (corpus, ratio) — stats/items/pairs are vocabulary-bounded files
    "freq_itemsets" -> ((s, d) => {
      val (stats, _, pairs) = IndexCache.basketModel(
        brandBaskets(s, d), s"$d|brand", "l_orderkey", "p_brand", 0.02)
      Mining.freqItemsetsWith(stats, pairs)
    }),
    "assoc_rules" -> ((s, d) => {
      val (stats, items, pairs) = IndexCache.basketModel(
        brandBaskets(s, d), s"$d|brand", "l_orderkey", "p_brand", 0.02)
      Mining.assocRulesWith(stats, items, pairs)
    }),
    "markov_transitions" -> ((s, d) =>
      Mining.markovTransitions(Tables.events(s, d),
        "user_id", "event_type", "ts", "event_id")),
    // own support ratio -> own cache entry; the repeated bench/verify
    // executions still read one materialization
    "item_cooccurrence" -> ((s, d) => {
      val (_, items, pairs) = IndexCache.basketModel(
        brandBaskets(s, d), s"$d|brand", "l_orderkey", "p_brand", 0.001)
      Mining.itemCooccurrenceWith(items, pairs)
    }),
    "event_trigrams" -> ((s, d) =>
      Mining.eventTrigrams(Tables.events(s, d),
        "user_id", "event_type", "ts", "event_id")),
    "pareto_front" -> ((s, d) =>
      Mining.paretoFront(
        Tables.orders(s, d).select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate")),
        "o_totalprice", "o_orderdate")),
    "incr_agg_merge" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val cutoff = lit("2024-01-16").cast("timestamp")
      val state = Incremental.aggState(ev.filter(col("ts") < cutoff), "user_id", "value")
      val delta = Incremental.aggState(ev.filter(col("ts") >= cutoff), "user_id", "value")
      Incremental.mergeAggState(state, delta, "user_id")
        .select(col("user_id"), col("n"),
          col("sum_v").cast("double").as("sum_v"),
          col("min_v").cast("double").as("min_v"),
          col("max_v").cast("double").as("max_v"))
    }),
    "dp_counts" -> ((s, d) =>
      graft.ops.Quality.dpCounts(Tables.events(s, d), "event_type")),
    "golden_record" -> ((s, d) =>
      Cdc.goldenRecord(Tables.events(s, d), "user_id",
        Seq("ts", "event_id"), Seq("event_type", "value", "props"))),
    // iters = 2: the lineitem-graph peel converges after round 1 at every
    // SF (probed: u1..u6 edge counts identical), so round 2 verifies the
    // fixpoint and further rounds are pure stage-count cost (4 rounds
    // measured 4.2-6.5 s, 2 rounds ~half); the operator supports up to 8
    "k_core" -> ((s, d) =>
      Graph.kCoreMedian(
        Tables.lineitem(s, d).select(col("l_suppkey").as("src"),
          (col("l_partkey") + 1000000L).as("dst")),
        iters = 2)),
    "cusum_drift" -> ((s, d) =>
      graft.ops.Quality.cusumDrift(Tables.events(s, d), "event_type", "ts")),
    "trend_slope" -> ((s, d) =>
      graft.ops.Quality.trendSlope(Tables.events(s, d), "event_type", "ts")),
    "autocorr" -> ((s, d) =>
      graft.ops.Quality.autocorrelation(Tables.events(s, d), "event_type", "ts")),
    // cross-series Pearson over the zero-filled daily counts: which
    // event streams move together (integer witnesses, one IEEE tree)
    "series_correlation" -> ((s, d) =>
      graft.ops.Quality.seriesCorrelation(Tables.events(s, d), "event_type", "ts")),
    "embed_pca" -> ((s, d) =>
      Similarity.embedPca(Tables.embeddings(s, d), k = 8)),
    "hll_overlap" -> (Functions.hllOverlap _),
    "rolling_distinct" -> (Functions.rollingDistinct _),
    "ewma_smooth" -> ((s, d) =>
      graft.ops.Quality.ewmaSmooth(Tables.events(s, d), "event_type", "ts")),
    // weights are a pure function of the collapsed pair so the oracle
    // recomputes them; multi-hop relaxation genuinely fires (a cheap
    // 2-hop path can undercut a heavy direct edge under %9+1 weights)
    "sssp_bounded" -> ((s, d) => {
      import s.implicits._
      val edges = Tables.lineitem(s, d)
        .selectExpr("l_suppkey % 100 as src", "l_partkey % 100 as dst")
        .where(col("src") =!= col("dst"))
        .distinct()
        .withColumn("w", (col("src") * 7 + col("dst") * 13) % 9 + 1)
      Graph.ssspBounded(edges, Seq(0L, 1L).toDF("node"), rounds = 3)
        .orderBy(col("node"))
    }),
    "bfs_reach" -> ((s, d) =>
      Graph.bfsDistances(
        Tables.lineitem(s, d).select(
          col("l_suppkey").cast("long").as("src"),
          (-col("l_partkey")).cast("long").as("dst")).distinct(),
        Tables.supplier(s, d).where(col("s_nationkey") === 3)
          .select(col("s_suppkey").cast("long").as("node")),
        maxHops = 3)),
    "interval_join_outer" -> ((s, d) =>
      graft.streaming.StreamJoins.intervalJoinOuter(Tables.events(s, d))),
    "rate_limit" -> ((s, d) =>
      graft.streaming.RateLimiter.rateLimit(
        Tables.events(s, d), "user_id", "ts", "event_id", maxPer = 3)),
    "plan_lint" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      // a deliberately pathological plan: unkeyed join × global window ×
      // un-limited global sort — the linter must flag each exactly once
      val ev = Tables.events(s, d).select(col("event_id"), col("value"))
      val bad = ev.crossJoin(Tables.region(s, d).select(col("r_regionkey")))
        .withColumn("rn", row_number().over(Window.orderBy(col("event_id"))))
        .orderBy(col("value"))
      val clean = Tables.events(s, d).groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
      graft.plans.PlanLint.lintDF("bad", bad)
        .unionByName(graft.plans.PlanLint.lintDF("clean", clean))
    }),
    "record_linkage" -> (Functions.recordLinkage _),
    "ols_trend" -> ((s, d) =>
      graft.ops.Quality.olsTrend(Tables.events(s, d), "event_type", "ts")),
    "format_roundtrip" -> (graft.io.Sources.formatRoundtrip _),
    "schema_evolution" -> (graft.io.Sources.schemaEvolution _),
    "observed_audit" -> (graft.ops.Observe.observedAudit _),
    "rank_eval" -> ((s, d) =>
      graft.ops.Quality.rankEval(
        Tables.lineitem(s, d), "l_orderkey",
        col("l_returnflag") === "R", "l_extendedprice", "l_linenumber")),
    "ndcg_eval" -> ((s, d) =>
      graft.ops.Quality.ndcgEval(
        Tables.lineitem(s, d), "l_orderkey",
        col("l_returnflag") === "R", "l_extendedprice", "l_linenumber")),
    "anomaly_windows" -> ((s, d) =>
      graft.ops.Quality.rollingAnomaly(Tables.events(s, d), "event_type", "ts")),
    // gate shape: epoch micros instead of the raw timestamp (integer
    // seconds/micros can't pick up timezone-rendering drift), event_id
    // restored as the tiebreak's public name
    "window_dedup" -> ((s, d) =>
      Dedup.windowDedup(Tables.events(s, d),
        Seq("user_id", "event_type"), "ts", "event_id")
        .withColumn("ts_us", unix_micros(col("ts"))).drop("ts")
        .withColumnRenamed("tie", "event_id")),
    "ivm_agg" -> ((s, d) => {
      val snap = cdcSnapshot(s, d)
      Cdc.maintainCountView(snap, cdcChangelog(snap), "cust_id",
        Seq("nation", "segment"))
    }),
    // IVM for a JOIN view: unchanged rows read from the materialized
    // view, only the changelog's surviving keys re-join the dim —
    // gate-asserted equal to the full recompute over the applied table
    "ivm_join" -> ((s, d) => {
      val snap = cdcSnapshot(s, d)
      val dim = Tables.nation(s, d).select(
        col("n_nationkey").cast("bigint").as("nation"),
        col("n_name").as("nation_name"))
      Cdc.maintainJoinView(
        Cdc.joinView(snap, dim, "nation"),
        cdcChangelog(snap), dim, "cust_id", "nation")
    }),
    // experiment trust: sample-ratio-mismatch chi-square on the A/B
    // unit split, integer witnesses, flag never engine-flippable
    "srm_check" -> ((s, d) =>
      Audit.srmCheck(
        Tables.events(s, d).withColumn("variant",
          when(col("user_id") % 2 === 0, lit("A")).otherwise(lit("B"))),
        "variant", "user_id")),
    // feature selection: WOE/IV of event_type against the high-value
    // outcome — per-category rows, ln rounded 6dp (psi_term precedent)
    "woe_iv" -> ((s, d) =>
      graft.ops.Quality.woeIv(
        Tables.events(s, d).where(col("value").isNotNull)
          .withColumn("y", col("value") > 50.0),
        "event_type", "y")),
    // internal clustering validity over the trained k-means cells —
    // centroid-based simplified silhouette, integer-exact distances
    "silhouette" -> ((s, d) =>
      Similarity.silhouetteSimplified(Tables.embeddings(s, d), k = 8, iters = 2)),
    // leakage-safe fit/transform: scaler stats FIT on the hash-train
    // slice only, applied everywhere; zero-variance fit -> NULL z
    "scaler_fit" -> ((s, d) =>
      graft.ops.Features.scalerFitApply(
        Tables.events(s, d).select(col("event_id"), col("value")),
        "event_id", "value")
        .orderBy(col("event_id"))),
    // referentially-consistent keyed pseudonymization: same salt ->
    // same token across tables, per-token rollup proves cardinality
    // and join keys survive the transform
    "pseudonymize" -> ((s, d) => {
      val ev = graft.ops.Quality.pseudonymize(
        Tables.events(s, d).select(col("user_id"), col("event_type")),
        "user_id", "release24")
      ev.groupBy(col("user_id_pseudo"))
        .agg(count(lit(1)).as("n_events"),
          count_distinct(col("event_type")).as("n_types"))
        .orderBy(col("user_id_pseudo"))
    }),
    // temporal split with an embargo band excluded from BOTH sides —
    // the lookback-leak control a plain cutoff split misses
    "time_split_embargo" -> ((s, d) =>
      Sampling.timeSplitEmbargo(Tables.events(s, d), "ts",
        "2024-01-15 00:00:00", embargoDays = 2)),
    // finalized sessions: superseded OR gap-deadline past the corpus
    // horizon — the batch twin of the streaming timer closures
    "session_close" -> ((s, d) =>
      graft.session.Sessionize.closedSessions(Tables.events(s, d))
        .withColumn("last_ts_us", unix_micros(col("last_ts")))
        .drop("last_ts")),
    // distribution-free prediction intervals: per-type train-mean
    // predictor, calibration-band order-statistic q-hat (all-integer),
    // realized test coverage ~ 90%
    "conformal_interval" -> ((s, d) =>
      graft.ops.Quality.conformalInterval(
        Tables.events(s, d), "event_id", "event_type", "value")),
    // reliability diagram: per score bucket, mean score vs realized
    // positive rate — catches well-ranked but miscalibrated scores.
    // The score is fed RAW (fractional dollars) — the fixture that
    // pins the fixed-point bucketing against integer-cast collapse
    "calibration_curve" -> ((s, d) =>
      graft.ops.Quality.calibrationCurve(
        Tables.events(s, d)
          .select(col("value").as("sc"),
            (col("event_type") === "purchase").as("y")),
        "sc", "y")),
    "ctfidf_terms" -> ((s, d) =>
      graft.ext.TextOps.ctfidfTerms(Tables.documents(s, d), "lang", k = 5)),
    // external validity of the trained k-means clustering against the
    // embeddings' ground-truth labels
    "cluster_purity" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      graft.ops.Audit.clusterPurity(
        Similarity.kmeansAssign(emb, k = 8, iters = 2), "vec_id", "cell",
        emb, "vec_id", "label")
    }),
    "edit_linkage" -> ((s, d) => Functions.editLinkage(s, d)),
    "sorted_neighborhood" -> ((s, d) => Functions.sortedNeighborhood(s, d)),
    "blocking_eval" -> ((s, d) => Functions.blockingEval(s, d)),
    // declared FD candidates across the schema: keys must hold, the
    // behavioral ones must report their violation worklists
    "fd_audit" -> ((s, d) => {
      import graft.ops.Integrity.{FdCandidate, fdAudit}
      fdAudit(Seq(
        FdCandidate("orders: o_orderkey -> o_orderdate",
          Tables.orders(s, d), Seq("o_orderkey"), "o_orderdate"),
        FdCandidate("orders: o_custkey -> o_orderpriority",
          Tables.orders(s, d), Seq("o_custkey"), "o_orderpriority"),
        FdCandidate("customer: c_nationkey -> c_mktsegment",
          Tables.customer(s, d), Seq("c_nationkey"), "c_mktsegment"),
        FdCandidate("nation: n_nationkey -> n_regionkey",
          Tables.nation(s, d), Seq("n_nationkey"), "n_regionkey"),
        FdCandidate("lineitem: (l_orderkey, l_linenumber) -> l_partkey",
          Tables.lineitem(s, d), Seq("l_orderkey", "l_linenumber"), "l_partkey"),
        FdCandidate("lineitem: l_partkey -> l_suppkey",
          Tables.lineitem(s, d), Seq("l_partkey"), "l_suppkey")))
    }),
    // dead-letter routing: a deterministic 1-in-7 slice of props loses
    // its final byte, exactly the truncated-upload failure mode
    "json_ingest" -> ((s, d) => {
      val mangled = Tables.events(s, d).withColumn("props2",
        when(col("event_id") % 7 === 0,
          expr("substring(props, 1, length(props) - 1)"))
          .otherwise(col("props")))
      graft.ext.WebOps.jsonIngest(mangled, "event_id", "props2")
    }),
    // does any customer nation receive URGENT handling at < 4/5 the
    // global rate — the 80%-rule fairness screen over the order stream
    "parity_audit" -> ((s, d) =>
      graft.ops.Audit.disparateImpact(
        Tables.orders(s, d).join(
          broadcast(Tables.customer(s, d)
            .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey")),
        "c_nationkey", col("o_orderpriority") === "1-URGENT")),
    // order-value drift between the pre- and post-1998 eras, 10 bins of
    // 50k — the deployed-monitor shape (fixed bins, add-one smoothing)
    "psi_drift" -> ((s, d) => {
      val o = Tables.orders(s, d)
      graft.ops.Audit.psiDrift(
        o.where(col("o_orderdate") < lit("1998-01-01")),
        o.where(col("o_orderdate") >= lit("1998-01-01")),
        "o_totalprice", binWidth = 50000.0)
    }),
    "fk_audit" -> ((s, d) => {
      import graft.ops.Integrity.{FkEdge, fkAudit}
      fkAudit(Seq(
        FkEdge("lineitem.l_orderkey->orders", Tables.lineitem(s, d), "l_orderkey",
          Tables.orders(s, d), "o_orderkey"),
        FkEdge("lineitem.l_partkey->part", Tables.lineitem(s, d), "l_partkey",
          Tables.part(s, d), "p_partkey"),
        FkEdge("lineitem.l_suppkey->supplier", Tables.lineitem(s, d), "l_suppkey",
          Tables.supplier(s, d), "s_suppkey"),
        FkEdge("orders.o_custkey->customer", Tables.orders(s, d), "o_custkey",
          Tables.customer(s, d), "c_custkey"),
        FkEdge("customer.c_nationkey->nation", Tables.customer(s, d), "c_nationkey",
          Tables.nation(s, d), "n_nationkey"),
        FkEdge("supplier.s_nationkey->nation", Tables.supplier(s, d), "s_nationkey",
          Tables.nation(s, d), "n_nationkey"),
        FkEdge("nation.n_regionkey->region", Tables.nation(s, d), "n_regionkey",
          Tables.region(s, d), "r_regionkey")))
    }),
    "link_predict" -> ((s, d) =>
      Graph.linkPredict(
        Tables.lineitem(s, d).select(col("l_suppkey").as("src"),
          (col("l_partkey") + 1000000L).as("dst")),
        maxCenterDegree = 50, topK = 5)),
    "target_encode" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val pt = Tables.part(s, d).select(col("p_partkey"), col("p_brand"))
      graft.ops.Features.targetEncode(
        li.join(pt, col("l_partkey") === col("p_partkey"))
          .select(col("p_brand"),
            (col("l_returnflag") === "R").as("is_returned"), col("l_orderkey")),
        "p_brand", "is_returned", "l_orderkey")
    }),
    "quantile_normalize" -> ((s, d) =>
      graft.ops.Features.quantileNormalize(
        Tables.events(s, d).select(col("event_id"), col("event_type"), col("value")),
        "event_type", "value", "event_id")),
    "seasonal_decompose" -> ((s, d) =>
      graft.ops.Quality.seasonalDecompose(Tables.events(s, d), "event_type", "ts")),
    "profile_diff" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val cutoff = lit("1998-01-01").cast("timestamp")
      graft.ops.Quality.profileDiff(
        o.filter(col("o_orderdate") < cutoff),
        o.filter(col("o_orderdate") >= cutoff),
        Seq("o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"))
    }),
    "bpe_fertility" -> ((s, d) => Bpe.bpeFertility(Tables.documents(s, d))),
    "label_agreement" -> ((s, d) =>
      graft.ops.Quality.labelAgreement(
        TextOps.langId(Tables.documents(s, d)), "lang", "predicted_lang")),
    "asof_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      // right side: each user's last event per day (a daily state snapshot)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"), date_trunc("day", col("ts")))
        .orderBy(col("ts").desc, col("event_id").desc)
      val snaps = ev
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1)
        .select(col("user_id"), col("ts").as("snap_ts"), col("value").as("snap_value"))
      graft.ops.AsOfJoin.asof(
        ev.select("event_id", "user_id", "ts"),
        snaps, "user_id", "ts", "snap_ts", Seq("snap_ts", "snap_value"))
    }),
    "interval_join_pairs" -> ((s, d) =>
      graft.streaming.StreamJoins.intervalJoinPairs(Tables.events(s, d))),
    "peak_concurrency" -> ((s, d) => Relational.peakConcurrency(s, d)),
    "asof_join_fwd" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"), date_trunc("day", col("ts")))
        .orderBy(col("ts").desc, col("event_id").desc)
      val snaps = ev
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1)
        .select(col("user_id"), col("ts").as("snap_ts"), col("value").as("snap_value"))
      // forward with a 1-day tolerance: the "next daily snapshot, unless
      // it is too stale to be that event's snapshot" feature-store read
      graft.ops.AsOfJoin.asofForward(
        ev.select("event_id", "user_id", "ts"),
        snaps, "user_id", "ts", "snap_ts",
        Seq("snap_ts", "snap_value"), Some(86400000000L))
    }),
    "tumbling_counts" -> ((s, d) => Sessionize.tumblingCounts(Tables.events(s, d))),
    "session_window" -> ((s, d) => Sessionize.sessionWindowStats(Tables.events(s, d))),
    "session_window_dynamic" -> ((s, d) =>
      Sessionize.sessionWindowDynamic(Tables.events(s, d))),
    "q4_late_priority" -> (Relational.latePriorityCounts _),
    "q6_forecast" -> (Relational.forecastRevenue _),
    "q7_nation_volume" -> (Relational.nationVolume _),
    "q10_returned" -> (Relational.returnedItemReport _),
    "q14_promo_share" -> (Relational.promoShare _),
    "q19_bracket_join" -> (Relational.bracketJoin _),
    "explode_tokens" -> (Functions.explodeTokens _),
    "math_ops" -> (Functions.mathOps _),
    "window_frames" -> (Functions.windowFrames _),
    "unpivot_metrics" -> (Functions.unpivotMetrics _),
    "histogram_prices" -> (Functions.histogramPrices _),
    "map_ops" -> (Functions.mapOps _),
    "sample_hash" -> ((s, d) =>
      graft.ext.Sampling.hashSample(Tables.events(s, d), "event_id", 10)),
    "sample_stratified" -> ((s, d) =>
      graft.ext.Sampling.stratifiedSample(Tables.documents(s, d), "lang", "doc_id", 20)
        .select("doc_id", "lang", "source")),
    "weighted_sample" -> ((s, d) =>
      graft.ext.Sampling.prioritySample(Tables.documents(s, d), "doc_id", "n_chars", 100)),
    "q13_custdist" -> (Relational.customerDistribution _),
    "argmax_order" -> (Relational.topOrderPerStatus _),
    "outer_join_balance" -> (Relational.balanceVsBigOrders _),
    "fuzzy_name_pairs" -> (Functions.fuzzyNamePairs _),
    // the DAILY form: anchors/keys are day-grained here, so the windowed
    // day-grid broadcast replaces the banded join's three |orders|-scale
    // exchanges (the r15 steepest-x10-curve fix); the banded general form
    // stays gate-covered via auto_range_join + PlanSpec/FunctionsSpec
    "range_join_count" -> ((s, d) =>
      graft.ops.RangeJoin.countWithinDaysDaily(
        Tables.orders(s, d), col("o_orderkey"), col("o_orderdate"),
        Tables.lineitem(s, d), col("l_shipdate"), 7)
        .select(col("_k").as("o_orderkey"), col("n_in_range"))),
    "auto_range_join" -> ((s, d) => {
      // written as the NAIVE non-equi join; the injected BandedRangeJoinRule
      // rewrites it into a banded hash join (asserted in PlanSpec)
      val ev = Tables.events(s, d)
      val all = ev.select(col("event_id"), unix_micros(col("ts")).as("t_us"))
      val pur = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), unix_micros(col("ts")).as("p_us"))
      all.join(pur,
          col("t_us") >= col("p_us") && col("t_us") < col("p_us") + lit(3600000000L))
        .groupBy(col("p_id"))
        .agg(count(lit(1)).as("n_within_hour"))
    }),
    "token_count" -> ((s, d) => TextOps.tokenCounts(Tables.documents(s, d))),
    // dictionary chosen to exercise every Aho–Corasick edge at once:
    // shared prefixes (scan slow/spark via 's'), a pattern that is a
    // proper prefix of another (agg ⊂ agg row — the fail-closed output
    // union must report both on "agg row"), and a self-overlapping
    // pattern ("a a" in "a a a" hits twice — regex/split counting can't)
    "keyword_tag" -> ((s, d) =>
      TextOps.keywordTag(Tables.documents(s, d), KeywordDict)
        .orderBy(col("doc_id"), col("pattern"))),
    "html_extract" -> ((s, d) =>
      TextOps.htmlExtract(TextOps.synthesizeHtml(Tables.documents(s, d)))
        .orderBy(col("doc_id"))),
    "keyword_redact" -> ((s, d) =>
      TextOps.keywordRedact(Tables.documents(s, d), KeywordDict)
        .orderBy(col("doc_id"))),
    "link_graph" -> ((s, d) =>
      TextOps.linkGraph(TextOps.synthesizeHtml(Tables.documents(s, d)))),
    "ivf_topk_probe4" -> ((s, d) => Similarity.ivfTopKProbe(Tables.embeddings(s, d))),
    // k pinned to 16: the DuckDB oracle hard-codes the first-16-vectors
    // codebook (vec_id < 16); the library default is the adaptive k ≈ √n
    "semantic_dedup" -> ((s, d) => Similarity.semanticDedup(Tables.embeddings(s, d), k = 16)),
    "semantic_dedup_keep" -> ((s, d) => Similarity.semanticDedupKeep(Tables.embeddings(s, d), k = 16)),
    "knn_join" -> ((s, d) => Similarity.knnJoin(Tables.embeddings(s, d), kNbrs = 3, k = 16)),
    // decoration: vec_id % 20 == 0 vectors re-enter as EXACT duplicates
    // under fresh ids, so the near-dup exclusion provably fires — a
    // twin's cosine-1.0 pair must never surface as a "negative"
    "hard_negatives" -> ((s, d) => {
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      val dup = emb.filter(col("vec_id") % 20 === 0)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      Similarity.hardNegatives(emb.unionByName(dup), kNbrs = 3, k = 16)
    }),
    // same duplicate decoration: the twins are each other's positives,
    // so every decorated anchor emits a complete (anchor, pos, neg) row
    "contrastive_triplets" -> ((s, d) => {
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      val dup = emb.filter(col("vec_id") % 20 === 0)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      Similarity.contrastiveTriplets(emb.unionByName(dup), k = 16)
    }),
    // The PRODUCTION regime: k ≈ √n adaptive codebook (the default the docs
    // recommend at scale), hash-gated against an oracle that derives the
    // same k from COUNT(*) — not just the pinned k=16 oracle regime.
    "semantic_dedup_adaptive" -> ((s, d) => Similarity.semanticDedup(Tables.embeddings(s, d))),
    "knn_join_adaptive" -> ((s, d) => Similarity.knnJoin(Tables.embeddings(s, d))),
    // adaptive twins of the mining entries too — k ≈ √n keeps the pair
    // space Σ|cell|² ≈ n^1.5/k ≈ n at any corpus size, where the pinned
    // k=16 gate regime is quadratic-per-cell by construction (these are
    // the declared bench/production entries; the fixed-16 forms above
    // stay as the decorated exclusion-proof gate arms)
    "hard_negatives_adaptive" -> ((s, d) =>
      Similarity.hardNegatives(Tables.embeddings(s, d).select("vec_id", "embedding"))),
    // keeps the duplicate decoration (without it no pair clears the 0.95
    // positive bar and the entry is vacuously empty); k adapts to the
    // decorated count
    "contrastive_triplets_adaptive" -> ((s, d) => {
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      val dup = emb.filter(col("vec_id") % 20 === 0)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      Similarity.contrastiveTriplets(emb.unionByName(dup))
    }),
    "stats_moments" -> (Functions.statsMoments _),
    "bool_aggs" -> (Functions.boolAggs _),
    "union_by_name" -> (Functions.unionByNameOps _),
    "string_ops2" -> (Functions.stringOps2 _),
    "hof_ops" -> (Functions.hofOps _),
    "try_ops" -> (Functions.tryOps _),
    "simhash_pairs" -> ((s, d) => Dedup.simhashPairs(Tables.documents(s, d))),
    "salted_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val dim = ev.groupBy(col("user_id")).agg(count(lit(1)).as("user_total"))
      Skew.saltedJoin(ev.select("event_id", "user_id"), dim, "user_id", "event_id")
        .select("event_id", "user_id", "user_total")
    }),
    "skew_autosplit" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val dim = ev.groupBy(col("user_id")).agg(count(lit(1)).as("user_total"))
      // threshold chosen to split: the busiest users ride the broadcast
      // path, the long tail the keyed join — result == the plain join
      Skew.autoSkewJoin(ev.select(col("event_id"), col("user_id")), dim,
        "user_id", hotThreshold = 12L)
        .select(col("event_id"), col("user_id"), col("user_total"))
    }),
    "rollup_status" -> (Relational.rollupStatusPriority _),
    "cube_flags" -> (Relational.cubeFlags _),
    "pivot_status" -> (Relational.pivotStatus _),
    "above_avg_orders" -> (Relational.aboveAvgOrders _),
    "grouping_sets" -> (Relational.groupingSets _),
    "disjunctive_filter" -> (Relational.disjunctiveFilter _),
    "set_ops_all" -> (Relational.setOpsAll _),
    "big_order_customers" -> (Relational.bigOrderCustomers(_, _)),
    "text_stats" -> ((s, d) => TextOps.textStats(Tables.documents(s, d))),
    "lang_id" -> ((s, d) => TextOps.langId(Tables.documents(s, d))),
    "calibration_table" -> ((s, d) => TextOps.langIdCalibration(Tables.documents(s, d))),
    "code_detect" -> ((s, d) => TextOps.codeDetect(Tables.documents(s, d))),
    "feature_hash" -> ((s, d) => TextOps.featureHash(Tables.documents(s, d))),
    "sample_fixed_k" -> ((s, d) =>
      Sampling.sampleFixedK(
        Tables.documents(s, d).select("doc_id", "lang", "source", "n_chars"),
        "doc_id", k = 100)),
    "bounce_rate" -> ((s, d) => Sessionize.bounceRate(Tables.events(s, d))),
    "session_depth_hist" -> ((s, d) => Sessionize.sessionDepthHist(Tables.events(s, d))),
    "weekday_profile" -> ((s, d) =>
      graft.ops.Quality.weekdayProfile(Tables.events(s, d), "event_type", "ts")),
    "conversion_lag" -> ((s, d) =>
      StateOps.conversionLag(Tables.events(s, d), "click", "purchase")),
    "vocab_growth" -> ((s, d) => TextOps.vocabGrowth(Tables.documents(s, d))),
    "quantile_elements" -> ((s, d) =>
      graft.ops.Quality.quantileElements(
        Tables.lineitem(s, d), "l_returnflag", "l_extendedprice")),
    "event_gaps" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val gaps = ev.where(col("user_id").isNotNull)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("next_us", lead(unix_micros(col("ts")), 1).over(w))
        .where(col("next_us").isNotNull)
        .select(col("event_type"),
          (col("next_us") - unix_micros(col("ts"))).as("gap_us"))
      graft.ops.Quality.quantileElements(gaps, "event_type", "gap_us", Seq(500, 900, 990))
    }),
    "ab_lift" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("variant", when(col("user_id") % 2 === 0, lit("A")).otherwise(lit("B")))
        .withColumn("converted", col("event_type") === "purchase")
      graft.ops.Quality.abLift(ev, "variant", "user_id", "converted")
    }),
    "dedup_stats" -> ((s, d) =>
      Dedup.clusterStats(IndexCache.ccClusters(Tables.documents(s, d), d))),
    "impute_values" -> ((s, d) => {
      // deterministically knock out ~10% of values so the imputation
      // path provably fires (the dq-family corruption idiom)
      val ev = Tables.events(s, d).select(col("event_id"), col("event_type"), col("value"))
        .withColumn("value",
          when(expr(s"${TextOps.md5Long64("concat('imp:', cast(event_id as string))")} % 10") === 0,
            lit(null)).otherwise(col("value")))
      graft.ops.Quality.imputeMedian(ev, "event_type", "value")
    }),
    "compact_plan" -> ((s, d) => {
      val files = Tables.lineitem(s, d).select(
        date_trunc("month", col("l_shipdate")).as("part"),
        (col("l_orderkey") % 50).as("file_id"),
        (col("l_extendedprice").cast("decimal(12,2)") * 100).cast("bigint").as("cents"))
        .groupBy(col("part"), col("file_id"))
        .agg(sum(col("cents")).cast("bigint").as("bytes"))
      graft.io.Maintenance.compactPlan(files, "part", "file_id", "bytes",
        targetBytes = 8000000L)
    }),
    "fingerprints" -> ((s, d) => TextOps.fingerprints(Tables.documents(s, d))),
    "dedup_exact" -> ((s, d) => Dedup.exact(Tables.documents(s, d))),
    "dedup_keep_first" -> ((s, d) =>
      Dedup.keepFirstByText(Tables.documents(s, d))
        .select("doc_id", "lang", "source", "n_chars")),
    "minhash_sigs" -> ((s, d) => Dedup.minhashSignatures(Tables.documents(s, d))),
    // the candidate-pair stage is a corpus-level artifact shared by the
    // whole CC family (IndexCache train/compute-once contract)
    "minhash_pairs" -> ((s, d) => IndexCache.minhashPairs(Tables.documents(s, d), d)),
    "incremental_dedup" -> ((s, d) => Dedup.incrementalDedup(Tables.documents(s, d))),
    "incremental_fuzzy_dedup" -> ((s, d) => Dedup.incrementalFuzzyDedup(Tables.documents(s, d))),
    // ~8 bits/item at the test corpus scale (fpp ≈ 2%); output is exact
    // regardless — the confirm join erases the fpp tail
    "bloom_screen_dedup" -> ((s, d) => Dedup.bloomScreenDedup(
      Tables.documents(s, d), expectedItems = 4096L, numBits = 32768L)),
    // same deliberately tiny/saturating TOTAL sizing as the unsharded
    // gate row, split across 4 hash-prefix blobs — the exact-output
    // contract must hold at any fpp, including the worst case
    "bloom_screen_dedup_sharded" -> ((s, d) => Dedup.bloomScreenDedupSharded(
      Tables.documents(s, d), shards = 4, expectedItems = 4096L, numBits = 32768L)),
    "simhash" -> ((s, d) => Dedup.simhash(Tables.documents(s, d))),
    // capped at maxDf=100: the uncapped pair generation (unbounded
    // collect_list per shingle) is a test-only baseline — one boilerplate
    // shingle in f docs would put f² pairs on a single task at corpus scale
    "ngram_jaccard" -> ((s, d) => Dedup.ngramJaccardCapped(Tables.documents(s, d), maxDf = 100)),
    // the exact-truth pair set is a corpus-level artifact: computed once
    // per (corpus, threshold) via IndexCache (the PQ train-once contract)
    // and reused by every consumer — the pair listing and LSH tuning's
    // recall denominator below
    "ssjoin_pairs" -> ((s, d) =>
      IndexCache.prefixPairs(s, Tables.documents(s, d), d)),
    "lsh_tuning" -> ((s, d) =>
      Dedup.lshTuningWith(Tables.documents(s, d),
        IndexCache.prefixPairs(s, Tables.documents(s, d), d).select("a_id", "b_id"))),
    "ngram_jaccard_capped" -> ((s, d) => Dedup.ngramJaccardCapped(Tables.documents(s, d))),
    "containment_pairs" -> ((s, d) => Dedup.containmentPairs(Tables.documents(s, d))),
    "tfidf_cosine_pairs" -> ((s, d) => TextOps.tfidfCosinePairs(Tables.documents(s, d))),
    "pack_sequences" -> ((s, d) => TextOps.packSequences(Tables.documents(s, d))),
    "attribution" -> ((s, d) => StateOps.attribution(Tables.events(s, d))),
    "gopher_quality" -> ((s, d) => TextOps.gopherQuality(Tables.documents(s, d))),
    "classifier_score" -> ((s, d) => TextOps.classifierScore(Tables.documents(s, d))),
    "freq_score" -> ((s, d) => TextOps.freqScore(Tables.documents(s, d))),
    "corpus_stats" -> ((s, d) => TextOps.corpusStats(Tables.documents(s, d))),
    "doc_repetition" -> ((s, d) => TextOps.docRepetition(Tables.documents(s, d))),
    "ngram_repetition" -> ((s, d) => TextOps.ngramRepetition(Tables.documents(s, d))),
    // sketch-gate: the zlib byte stream isn't SQL-expressible, but the
    // gate emits the exact-computable n_bytes (UTF-8 octet length, null
    // propagating) plus invariant booleans — deflate output is nonempty,
    // bounded by the zlib worst case (stored blocks: 5 bytes per 16 KiB
    // + 6 bytes stream overhead), and ratio/flag are arithmetic-
    // consistent with the sizes — that the oracle pins to literal true.
    // A broken Deflater path (state leak, wrong size accounting, flag
    // drift) flips a hash mismatch instead of hiding in a unit test.
    "compression_ratio" -> ((s, d) =>
      TextOps.compressionRatio(Tables.documents(s, d))
        .select(col("doc_id"), col("n_bytes"),
          (col("n_deflate").isNotNull === col("n_bytes").isNotNull &&
            (col("n_bytes").isNull ||
              (col("n_deflate") > 0L &&
                col("n_deflate") <= col("n_bytes") + col("n_bytes") / lit(16384L) * 5L + 16L)))
            .as("deflate_bounded"),
          when(col("n_bytes").isNull || col("n_bytes") === 0L,
              col("deflate_ratio").isNull && col("low_entropy").isNull)
            .otherwise(
              abs(col("deflate_ratio") -
                col("n_deflate").cast("double") / col("n_bytes").cast("double")) < 1e-12 &&
              col("low_entropy") === (col("deflate_ratio") < 0.4))
            .as("ratio_consistent"))),
    "dsir_weights" -> ((s, d) => TextOps.dsirWeights(Tables.documents(s, d))),
    "lm_score" -> ((s, d) => TextOps.lmScore(Tables.documents(s, d))),
    // the synthetic corpus carries no real PII, so the query DECORATES
    // each doc with deterministic doc_id-derived email/IP/phone strings
    // before scrubbing — the gate then proves count and redaction
    // semantics exactly (including regex-dialect parity vs RE2)
    "pii_scrub" -> ((s, d) => TextOps.piiScrub(
      Tables.documents(s, d).select(col("doc_id"),
        concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com from 10.0."),
          pmod(col("doc_id"), lit(256L)).cast("string"),
          lit(".7 tel +1555"),
          lpad(pmod(col("doc_id"), lit(10000L)).cast("string"), 7, "0"))
          .as("text")))),
    // structured-PII twin: decorate each doc with a known-Luhn-VALID test
    // card (dashed on even doc_ids — separator handling under the gate),
    // a provably-broken twin (+5 mod 10 on the check digit always breaks
    // Luhn), an Amex (dashed 4-6-5 on even doc_ids), a bare 13/19-digit
    // PAN rotating valid/valid/broken, a 20-digit run that must NEVER
    // match, and an SSN-shaped token; the gate then proves per-family
    // candidate counting, staged precedence, the integer-exact Luhn
    // filter, and redaction order
    "pii_scrub2" -> ((s, d) => TextOps.piiScrub2(
      Tables.documents(s, d).select(col("doc_id"), {
        def pick(cards: Seq[String]) = element_at(
          array(cards.map(lit): _*), (pmod(col("doc_id"), lit(4L)) + 1).cast("int"))
        val plain = Seq("4111111111111111", "4012888888881881",
          "5500005555555559", "2223003122003222")
        val dashed = plain.map(_.grouped(4).mkString("-"))
        val broken = plain.map(c =>
          c.take(15) + (((c.last - '0') + 5) % 10).toString)
        def pick3(pans: Seq[String]) = element_at(
          array(pans.map(lit): _*), (pmod(col("doc_id"), lit(3L)) + 1).cast("int"))
        concat(col("text"), lit(" card "),
          when(pmod(col("doc_id"), lit(2L)) === 0, pick(dashed))
            .otherwise(pick(plain)),
          lit(" junk "), pick(broken),
          lit(" amex "),
          when(pmod(col("doc_id"), lit(2L)) === 0, lit("3782-822463-10005"))
            .otherwise(lit("371449635398431")),
          lit(" pan "),
          pick3(Seq("4222222222222", "4111111111111111110", "4111111111111111115")),
          lit(" long 12345678901234567890 ssn 123-45-"),
          lpad(pmod(col("doc_id"), lit(10000L)).cast("string"), 4, "0"))
          .as("text")
      }))),
    "shingle_novelty" -> ((s, d) => TextOps.shingleNovelty(Tables.documents(s, d))),
    "pagerank_top" -> ((s, d) =>
      Graph.pageRank(Graph.lineitemGraph(Tables.lineitem(s, d)))
        .orderBy(col("rank").desc, col("id")).limit(20)),
    // trust propagation from the id%10==0 seed set (entity expansion)
    "ppr_seeds" -> ((s, d) => {
      val g = Graph.lineitemGraph(Tables.lineitem(s, d))
      val seedIds = g.select(col("src").as("id"))
        .unionAll(g.select(col("dst").as("id"))).distinct()
        .where(col("id") % 10 === 0)
      Graph.personalizedPageRank(g, seedIds)
        .orderBy(col("rank").desc, col("id")).limit(20)
    }),
    "triangle_count" -> ((s, d) =>
      Graph.triangleCounts(Graph.lineitemGraph(Tables.lineitem(s, d)))),
    // reproducible link-prediction negatives: hash-strided non-edges.
    // mod-1000 graph — the mod-100 one is near-complete at sf>=0.01,
    // which leaves no non-edges to sample
    "graph_negatives" -> ((s, d) =>
      Graph.graphNegatives(
        Graph.lineitemGraph(Tables.lineitem(s, d), srcMod = 1000, dstMod = 1000)
          .select("src", "dst"))),
    "label_propagation" -> ((s, d) =>
      Graph.labelPropagation(Graph.lineitemGraph(Tables.lineitem(s, d)))),
    "dedup_clusters" -> ((s, d) =>
      IndexCache.ccClusters(Tables.documents(s, d), d)),
    // corpus-mixing readout: per source pair, how many near-dup clusters
    // and member pairs span both — rides the family's shared CC stage
    "dedup_source_overlap" -> ((s, d) =>
      Dedup.sourceOverlap(Tables.documents(s, d),
        IndexCache.ccClusters(Tables.documents(s, d), d))),
    // chaining audit: member-to-representative exact jaccard per cluster,
    // over the family's shared CC assignment
    "cluster_diameter" -> ((s, d) =>
      Dedup.clusterDiameterWith(Tables.documents(s, d),
        IndexCache.ccClusters(Tables.documents(s, d), d))),
    // the END-TO-END fuzzy dedup a production corpus runs: LSH candidates
    // → signature-estimate verify (≥4 of 8 minhash components ⇒ est
    // Jaccard ≥ 0.5, the standard LSH accept rule) → connected components
    // over the verified pairs → keep each cluster's min-id canonical plus
    // every untouched doc. Every stage is the already-gated machinery;
    // this query gates their COMPOSITION.
    "fuzzy_dedup_survivors" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val losers = IndexCache.ccClusters(docs, d, minEst = Some(0.5))
        .filter(col("doc_id") =!= col("component"))
        .select(col("doc_id"))
      docs.join(losers, Seq("doc_id"), "left_anti")
        .select("doc_id", "lang", "source", "n_chars")
    }),
    // quality-aware variant: a real pipeline keeps each near-dup
    // cluster's BEST member, not an arbitrary id — keeper = argmax by
    // (classifier score, then smallest doc_id), int64-exact so the whole
    // choice is gateable; untouched docs ride through
    "fuzzy_dedup_best" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val cc = IndexCache.ccClusters(docs, d, minEst = Some(0.5))
      val scored = cc.join(
        TextOps.classifierScore(docs).select(col("doc_id"), col("score_milli")),
        Seq("doc_id"))
      val keepers = scored.groupBy(col("component"))
        .agg(max(struct(col("score_milli"), (-col("doc_id")).as("neg_id"))).as("best"))
        .select((-col("best.neg_id")).as("doc_id"))
      docs.join(cc.select(col("doc_id")), Seq("doc_id"), "left_anti")
        .select(col("doc_id"))
        .unionByName(keepers)
        .join(docs, Seq("doc_id"))
        .select("doc_id", "lang", "source", "n_chars")
    }),
    // decoration (doc_id % 3 == 0): a tab run, a control byte, and a
    // DECOMPOSED e+combining-acute — so the control strip, the NFC fold
    // (2 chars -> 1) and the whitespace collapse all provably fire,
    // while undecorated rows pin the changed=0 branch
    "text_normalize" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      TextOps.textNormalize(docs.withColumn("text",
        when(col("doc_id") % 3 === 0,
          concat(col("text"), lit("\t\t x\u0001e\u0301")))
          .otherwise(col("text"))))
    }),
    // decoration: doc_id % 5 picks an injected script run (Cyrillic of
    // id-dependent length / CJK / Arabic / Greek+digits / none) so every
    // class counter and the dominant arg-max provably fire; undecorated
    // rows pin the ASCII latin-dominant baseline
    "script_mix" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val cyr = "\u0430\u0431\u0432"
      val cjk = "\u4E2D\u6587"
      val arb = "\u0627\u0628\u062C"
      val grk = "\u03B1\u03B2\u03B3"
      TextOps.scriptMix(docs.withColumn("text",
        when(col("doc_id") % 5 === 1, concat(col("text"), lit(" "),
          expr(s"repeat('$cyr', cast(doc_id % 3 + 1 as int))")))
          .when(col("doc_id") % 5 === 2, concat(col("text"), lit(s" $cjk")))
          .when(col("doc_id") % 5 === 3, concat(col("text"), lit(s" $arb")))
          .when(col("doc_id") % 5 === 4, concat(col("text"), lit(s" ${grk}42")))
          .otherwise(col("text"))))
    }),
    "fim_split" -> ((s, d) => TextOps.fimSplit(Tables.documents(s, d))),
    "source_report" -> ((s, d) => TextOps.sourceReport(Tables.documents(s, d))),
    "repetition_stats" -> ((s, d) => TextOps.repetitionStats(Tables.documents(s, d))),
    "vocab_topk" -> ((s, d) => TextOps.vocabTopK(Tables.documents(s, d))),
    "doc_chunks" -> ((s, d) => TextOps.chunkTokens(Tables.documents(s, d))),
    "chunk_dedup" -> ((s, d) => TextOps.chunkDedup(Tables.documents(s, d))),
    "tfidf_top" -> ((s, d) => TextOps.tfidfTop(Tables.documents(s, d))),
    "block_dedup_rewrite" -> ((s, d) => TextOps.blockDedupRewrite(Tables.documents(s, d))),
    "dup_spans" -> ((s, d) => TextOps.dupSpans(Tables.documents(s, d))),
    "substring_dedup" -> ((s, d) => TextOps.substringDedup(Tables.documents(s, d))),
    "heavy_hitters" -> ((s, d) => TextOps.heavyHitters(Tables.documents(s, d))),
    "cms_counts" -> ((s, d) => TextOps.cmsCounts(Tables.documents(s, d), probeMod = 7)),
    "bpe_merges" -> ((s, d) => Bpe.bpeMerges(Tables.documents(s, d))),
    "bpe_segment" -> ((s, d) => Bpe.bpeSegment(Tables.documents(s, d))),
    "bpe_encode_docs" -> ((s, d) => Bpe.bpeEncodeDocs(Tables.documents(s, d))),
    "heavy_hitters_by_lang" -> ((s, d) => TextOps.heavyHittersByGroup(Tables.documents(s, d))),
    // postings serialized to CSV for the gate: the driver's pandas harness
    // cannot hash-sort an array column (r4: the one ungated query); the
    // CSV of the sorted list is an equivalent bit-stable encoding
    // (precedent: embed_quantize's q8_csv)
    "inverted_index" -> ((s, d) =>
      TextOps.invertedIndex(Tables.documents(s, d))
        .select(col("token"), col("doc_freq"),
          array_join(col("postings").cast("array<string>"), ",").as("postings_csv"))),
    "token_pmi" -> ((s, d) => TextOps.tokenPmi(Tables.documents(s, d))),
    "bm25_top" -> ((s, d) => TextOps.bm25Top(Tables.documents(s, d))),
    "rank_fusion" -> ((s, d) => TextOps.rrfFusion(Tables.documents(s, d),
      Seq("spark", "query", "join"), Seq("stream", "window", "batch"))),
    // hybrid retrieval: BM25 lexical arm + vector cosine arm, RRF-fused
    // (doc_id and vec_id share the corpus id space)
    "hybrid_search" -> ((s, d) => TextOps.hybridSearch(
      Tables.documents(s, d), Tables.embeddings(s, d),
      Seq("spark", "query", "join"))),
    "contamination" -> ((s, d) => Dedup.contamination(Tables.documents(s, d))),
    "domain_mix" -> ((s, d) => Sampling.weightedBySource(Tables.documents(s, d))),
    "mixture_sample" -> ((s, d) => Sampling.mixtureSample(Tables.documents(s, d))),
    "domain_cap" -> ((s, d) => Sampling.capPerSource(Tables.documents(s, d), cap = 8)),
    "dataset_split" -> ((s, d) => Sampling.datasetSplit(Tables.documents(s, d))),
    // decoration: orderkey-derived breakage so every rule's violation
    // counter provably fires — null FKs, orphan FKs, negative totals,
    // malformed priorities, re-entered duplicate keys
    "dq_report" -> ((s, d) =>
      graft.ops.Quality.dqReport(dqDecorated(s, d), dqRules(s, d))),
    "k_anonymity" -> ((s, d) =>
      graft.ops.Quality.kAnonymize(Tables.customer(s, d),
        Seq("c_nationkey", "c_mktsegment"), k = 8)),
    "l_diversity" -> ((s, d) =>
      graft.ops.Quality.lDiversity(Tables.customer(s, d),
        Seq("c_nationkey"), "c_mktsegment", l = 3, c = 2)),
    "t_closeness" -> ((s, d) =>
      graft.ops.Quality.tCloseness(Tables.customer(s, d),
        Seq("c_nationkey"), "c_mktsegment", tNum = 2, tDen = 5)),
    // gate shape: the driver's oracle harness hashes via pandas sort and
    // cannot order an array-typed column, so the gated entry flattens
    // failed_rules to a '|'-joined string (the library API keeps the array)
    "dq_quarantine" -> ((s, d) =>
      graft.ops.Quality.dqQuarantine(dqDecorated(s, d), dqRules(s, d))
        .withColumn("failed_rules", array_join(col("failed_rules"), "|"))
        .orderBy(col("o_orderkey"), col("n_failed"))),
    "cdc_apply" -> ((s, d) => {
      val snap = cdcSnapshot(s, d)
      Cdc.applyChangelog(snap, cdcChangelog(snap), "cust_id")
    }),
    "cdc_diff" -> ((s, d) => {
      val snap = cdcSnapshot(s, d)
      Cdc.snapshotDiff(snap, Cdc.applyChangelog(snap, cdcChangelog(snap), "cust_id"), "cust_id")
    }),
    "scd2_history" -> ((s, d) =>
      Cdc.scdHistory(cdcChangelog(cdcSnapshot(s, d)), "cust_id")),
    "replica_diff" -> ((s, d) => {
      val a = Tables.customer(s, d).select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      // deterministically diverged replica: every 101st key dropped,
      // every 97th key's balance shifted
      val b = a.where(col("c_custkey") % 101 =!= 0)
        .withColumn("c_acctbal",
          when(col("c_custkey") % 97 === 0, col("c_acctbal") + 1.0)
            .otherwise(col("c_acctbal")))
      Cdc.replicaDiff(a, b, "c_custkey")
    }),
    // asOf = 3031 (custkey 303's first update): keys < 303 fully
    // applied, key 303 at v1-only (latest-wins restricted by time),
    // later keys untouched, all v=1 inserts present
    "cdc_as_of" -> ((s, d) => {
      val snap = cdcSnapshot(s, d)
      Cdc.applyChangelogAsOf(snap, cdcChangelog(snap), "cust_id", asOf = 3031L)
    }),
    "leakage_safe_split" -> ((s, d) =>
      Sampling.leakageSafeSplitWith(Tables.documents(s, d),
        IndexCache.ccClusters(Tables.documents(s, d), d))),
    // what the 500→1200 version range changed in the merged table
    // (bounds chosen inside every SF's version span: versions are cust_id*10+k)
    "cdc_version_diff" -> ((s, d) => {
      val snap = cdcSnapshot(s, d)
      Cdc.versionDiff(snap, cdcChangelog(snap), "cust_id", v1 = 500L, v2 = 1200L)
    }),
    // robust per-brand price center, size-weighted (integer 2W >= T rule)
    "weighted_median" -> ((s, d) =>
      Functions.weightedMedian(Tables.part(s, d),
        "p_brand", "p_retailprice", "p_size", "p_partkey")),
    // half-life-per-day engagement value per user (dyadic-exact decay)
    "decayed_value" -> ((s, d) =>
      graft.ops.Features.decayedValue(Tables.events(s, d), "user_id", "ts", "value")),
    // grid-bucketed spatial radius join: customers to their in-range
    // suppliers on a deterministic integer map (LCG placement from the
    // keys so the oracle reproduces the coordinates bit-for-bit); the
    // oracle is the brute-force cross join — the semantic spec the grid
    // must match exactly, candidate geometry and all
    "geo_cell_join" -> ((s, d) => {
      val probe = Tables.customer(s, d).selectExpr(
        "c_custkey as id",
        "(cast(c_custkey as bigint) * 48271 + 7) % 36000 as x",
        "(cast(c_custkey as bigint) * 69621 + 13) % 18000 as y")
      val build = Tables.supplier(s, d).selectExpr(
        "s_suppkey as id",
        "(cast(s_suppkey as bigint) * 40503 + 3) % 36000 as x",
        "(cast(s_suppkey as bigint) * 69427 + 17) % 18000 as y")
      Geo.radiusJoinNearest(probe, build, radius = 1000L)
    }),
    // CUPED variance reduction: pre-period (before Cutoff) engagement as
    // the covariate, post-period as the metric, pooled theta
    "cuped_adjust" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("variant",
          when(col("user_id") % 2 === 0, lit("A")).otherwise(lit("B")))
      graft.ops.Quality.cupedAdjust(ev, "variant", "user_id", "value", "ts", Cutoff)
    }),
    // consistent-placement audit: balance per shard + keys ceded when the
    // fleet grows 32 -> 33 (the minimal-disruption property, proven)
    "rendezvous_shard" -> ((s, d) =>
      Sampling.rendezvousShards(Tables.documents(s, d), "doc_id", 32)),
    // RAKE keyphrases: stopword-delimited candidate runs, deg/freq word
    // scores kept integer (×10^6) so phrase sums are order-independent
    "rake_keywords" -> ((s, d) =>
      TextOps.rakeKeywords(Tables.documents(s, d), k = 50, maxLen = 4)),
    // Allen's 13-relation interval algebra over per-order ship→receipt
    // windows; the ELSE arm raises, so non-exhaustiveness fails loudly
    "interval_relations" -> (Relational.allenRelations _),
    // left join with the null-key stratum routed AROUND the exchange
    // (~20% of FKs deterministically nulled so the path provably fires);
    // result is bit-identical to the plain left join the oracle runs
    "null_skew_join" -> ((s, d) => {
      val o = Tables.orders(s, d).withColumn("o_custkey",
        when(expr(s"${TextOps.md5Long64("concat('nsj:', cast(o_orderkey as string))")} % 5") === 0,
          lit(null)).otherwise(col("o_custkey")))
      Skew.nullSafeLeftJoin(o, Tables.customer(s, d).select(
        col("c_custkey").as("o_custkey"), col("c_mktsegment"), col("c_acctbal")),
        "o_custkey")
        .groupBy(col("o_orderstatus"))
        .agg(
          count(lit(1)).as("n_rows"),
          count(col("c_mktsegment")).as("n_matched"),
          sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("sum_bal"))
    }),
    // hive-partitioned write → partition-pruned join read-back: the dim
    // filter (count ≡ 0 mod 3 — NOT derivable from the join key, so
    // static pushdown can't subsume it) survives as a runtime pruning
    // subquery on the fact scan; PlanSpec pins the dynamicpruning node
    "dpp_prune" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
        .select(col("o_orderkey"), col("o_totalprice"), col("o_month"))
      val dim = o.groupBy(col("o_month")).agg(count(lit(1)).as("mcnt"))
        .where(col("mcnt") % 3 === 0).select(col("o_month"))
      graft.io.Maintenance.dppRoundtrip(o, dim, "o_month", Seq(
        count(lit(1)).as("n_rows"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price")))
    }),
    // greedy max-coverage pick of 3 docs over word-3-gram shingles; the
    // oracle unrolls the 3 submodular rounds literally
    "coverage_select" -> ((s, d) =>
      Sampling.coverageSelect(Tables.documents(s, d), k = 3)),
    // Spark 4 VARIANT end to end over the shared jsonDecorSql fixture:
    // parse_json → typed variant_get extractions → per-tag rollup. The
    // oracle never parses JSON — every field is a closed-form function
    // of event_id, so a parse/extract/type-coercion bug anywhere in the
    // variant path moves an aggregate and fails the hash. Gates the
    // null-vs-MISSING distinction too: `note` is present-but-null only
    // on %7 ids (is_variant_null), absent otherwise (variant_get null).
    "variant_extract" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"), expr(jsonDecorSql).as("js"))
        .select(expr("parse_json(js)").as("v"), col("event_id"))
        .select(
          expr("variant_get(v, '$.id', 'bigint')").as("vid"),
          expr("variant_get(v, '$.tag', 'string')").as("tag"),
          expr("variant_get(v, '$.score', 'double')").as("score"),
          expr("variant_get(v, '$.ok', 'boolean')").as("ok"),
          expr("variant_get(v, '$.tags[0]', 'bigint')").as("tag0"),
          expr("is_variant_null(variant_get(v, '$.note'))").as("note_null"))
        .groupBy(col("tag"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("vid")).as("sum_id"),
          // scores are exact multiples of 0.5 — IEEE sums are
          // order-independent here, no decimal detour needed
          sum(col("score")).as("sum_score"),
          count(when(col("ok"), 1)).as("n_ok"),
          count(when(col("note_null"), 1)).as("n_note_null"),
          sum(col("tag0")).as("sum_tag0"))),
    // seasonal-naive vs naive MASE backtest over per-type daily counts:
    // the baseline bar any trained forecaster must beat
    "forecast_backtest" -> ((s, d) =>
      graft.ops.Features.forecastBacktest(Tables.events(s, d), "event_type", "ts")),
    // schema-contract diff between the real orders schema and a v2 with
    // a drop, an add, a widening, and a narrowing — the oracle is the
    // expected worklist spelled out (metadata op: the VALUES are the
    // spec)
    "schema_diff" -> ((s, d) => {
      val v1 = Tables.orders(s, d).schema
      val v2 = Tables.orders(s, d)
        .drop("o_orderpriority")
        .withColumn("o_shippriority", lit(1))
        .withColumn("o_custkey", col("o_custkey").cast("int"))
        .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
        .schema
      Audit.schemaDiff(s, v1, v2)
    }),
    // exact tie-aware ROC-AUC: does spend value rank purchases above
    // other events — Mann-Whitney with integer witnesses
    "roc_auc" -> ((s, d) =>
      graft.ops.Quality.rocAuc(
        Tables.events(s, d).where(col("value").isNotNull)
          .select(expr("cast(floor(value) as bigint)").as("sc"),
            (col("event_type") === "purchase").as("y")),
        "sc", "y")),
    // CSV dead-letter routing: ~1% of lines carry an unparseable price
    // (deterministic %97 mangling) and must surface as routed corrupt
    // rows with identity kept on the OUTER id, never dropped
    "csv_dead_letter" -> ((s, d) => {
      val lines = Tables.orders(s, d).select(
        col("o_orderkey"),
        expr(
          """concat(cast(o_orderkey as string), ',', cast(o_custkey as string), ',',
            |  case when o_orderkey % 97 = 0
            |       then concat('x', cast(o_totalprice as string))
            |       else cast(o_totalprice as string) end)""".stripMargin).as("line"))
      graft.ext.WebOps.csvDeadLetter(lines, "o_orderkey", "line",
        "k BIGINT, c BIGINT, price DOUBLE", "price")
    }),
    // percentile_cont-convention interpolated quantiles: element picks
    // and interpolate-or-not decided in int64, one IEEE lerp at the end
    "quantile_interp" -> ((s, d) =>
      graft.ops.Quality.quantileInterp(Tables.events(s, d), "event_type", "value")),
    // exact two-sample KS: is the purchase value distribution the same
    // as the click one — unbinned D with integer witnesses, computed
    // with two-level prefix sums (no global-order window)
    "ks_test" -> ((s, d) =>
      graft.ops.Quality.ksTest(Tables.events(s, d), "event_type", "value",
        "purchase", "click")),
    // one-pass dynamic column profiler (catalog/contract bootstrap);
    // metrics fan out inside a single agg whatever the column count
    "table_profile" -> ((s, d) => Audit.tableProfile(Tables.orders(s, d))),
    // the DECLARED production/bench arm (knn_join_adaptive precedent):
    // HLL sketches instead of the exact-distinct Expand (12.2× at 100×,
    // TpProbe). The sketch estimate is engine-specific, so the gate
    // replaces the raw n_distinct with exact-reproducible fields plus a
    // plausibility boolean (sketch within [1, 1.2·non-null + 16]) and
    // the 0.9-tolerant uniqueness verdict, which the oracle computes
    // from DuckDB's cheap exact distinct (no Expand there) — the two
    // verdicts agree whenever no column sits in the [0.9, 1) uniqueness
    // band, which this fixture pins (d/c is 1 or ≪ 0.9 per column)
    "table_profile_approx" -> ((s, d) => {
      val p = Audit.tableProfile(Tables.orders(s, d), exactDistinct = false)
      val nonNull = col("n") - col("n_null")
      p.select(col("column"), col("dtype"), col("n"), col("n_null"),
        (col("n_distinct") >= least(lit(1L), nonNull) &&
          col("n_distinct").cast("double") <= nonNull.cast("double") * 1.2 + 16.0)
          .as("distinct_bounded"),
        col("is_unique"),
        col("min_num"), col("max_num"), col("min_str"), col("max_str"))
    }),
    // per-(type, day) supervised forecasting matrix: value-ranged lags
    // (gaps break adjacency — no leakage, no fabricated zeros)
    "lag_features" -> ((s, d) =>
      graft.ops.Features.lagFeatures(Tables.events(s, d), "event_type", "ts")),
    // hierarchical subtree rollup of deterministic doc-derived paths:
    // every row counts into every prefix; exact-hit counts split out
    "path_rollup" -> ((s, d) =>
      graft.ext.WebOps.pathRollup(
        Tables.documents(s, d).select(expr(pathDecorSql).as("path")), "path")),
    // concentration audit: exact discrete Gini of per-customer spend
    // within each order status (skew forecasting + inequality report)
    "lorenz_gini" -> ((s, d) =>
      Audit.lorenzGini(Tables.orders(s, d), "o_orderstatus", "o_custkey",
        "cast(floor(o_totalprice + 0.5d) as bigint)")),
    // Spark 4 native XML: synthesize a per-event record (attribute +
    // elements + a missing-element arm), from_xml with an explicit
    // schema, roll up — oracle again closed-form from event_id, so the
    // XML parser/coercion path is gated without an oracle-side parser
    "xml_extract" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"), expr(
          """concat('<e id="', cast(event_id as string), '">',
            |  case when event_id % 2 = 0
            |       then concat('<tag>t', cast(event_id % 7 as string), '</tag>') else '' end,
            |  case when event_id % 3 = 0
            |       then concat('<score>', cast(event_id % 100 as string), '.5</score>') else '' end,
            |'</e>')""".stripMargin).as("x"))
        .select(expr(
          "from_xml(x, 'struct<_id: bigint, tag: string, score: double>')").as("p"))
        .groupBy(col("p.tag").as("tag"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("p._id")).as("sum_id"),
          sum(col("p.score")).as("sum_score"))),
    // is the 10% hash sample representative per language (|z| > 3 flags)
    "sample_audit" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      graft.ops.Audit.sampleAudit(docs,
        Sampling.hashSample(docs, "doc_id", 10), "lang", 10L, 100L)
    }),
    // distribution-shift telemetry: even/odd vec_id halves stand in for
    // reference vs current crawl snapshots
    "embedding_drift" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.embeddingDrift(
        emb.filter(col("vec_id") % 2 === 0),
        emb.filter(col("vec_id") % 2 === 1))
    }),
    "epoch_order" -> ((s, d) => Sampling.epochOrder(Tables.documents(s, d), epoch = 1, shards = 8)),
    "cosine_topk" -> ((s, d) => Similarity.cosineTopK(Tables.embeddings(s, d))),
    "embed_truncate" -> ((s, d) => Similarity.matryoshkaProbe(Tables.embeddings(s, d))),
    "embed_outliers" -> ((s, d) => Similarity.outliersByLabel(Tables.embeddings(s, d))),
    "lsh_buckets" -> ((s, d) => Similarity.lshBuckets(Tables.embeddings(s, d))),
    // blocked-tile exact form; the row-level n² join is a test-only baseline
    "embed_neardup" -> ((s, d) => Similarity.nearDupPairsBlocked(Tables.embeddings(s, d))),
    "ann_lsh_pairs" -> ((s, d) => Similarity.annPairsLsh(Tables.embeddings(s, d))),
    "ivf_cells" -> ((s, d) => Similarity.ivfAssign(Tables.embeddings(s, d))),
    "ivf_topk" -> ((s, d) => Similarity.ivfTopK(Tables.embeddings(s, d))),
    // integer-quantized Lloyd's: the ENTIRE iterative training loop is
    // cross-engine exact, so a trained-model operator sits under the hash
    // gate (k=8 seeds, 2 rounds — see Similarity.kmeansAssign)
    "kmeans_assign" -> ((s, d) =>
      Similarity.kmeansAssign(Tables.embeddings(s, d), k = 8, iters = 2)),
    // product quantization (m=8 subspaces × k=8 codewords, 2 Lloyd's
    // rounds): the trained multi-codebook, the per-vector codes, and the
    // ADC ranking are all integer-exact — the whole FAISS-PQ shape under
    // the hash gate (see Similarity.pqEncode/pqTopK)
    // The PQ family trains through IndexCache: ONE Lloyd's run per
    // (corpus dir, params) per process — pq_codes/pq_topk/pq_rerank share
    // a codebook, ivfpq_topk its own (coarse, residual) pair — matching
    // the documented train-on-sample/encode-forever production shape
    // (round-11 verdict task #4: the four queries retrained
    // near-identical codebooks independently, 17% of the bench). The
    // oracle retrains per query in DuckDB and still hash-matches: cached
    // and fresh training are bit-identical (PqSpec pins it).
    "pq_codes" -> ((s, d) =>
      Similarity.pqEncodeWith(Tables.embeddings(s, d),
          IndexCache.pqCodebook(s, Tables.embeddings(s, d), d))
        .select(col("vec_id"), col("s").cast("long").as("s"),
          col("code"), col("qobj"))),
    "pq_topk" -> ((s, d) => Similarity.pqTopKWith(Tables.embeddings(s, d),
      IndexCache.pqCodebook(s, Tables.embeddings(s, d), d))),
    // the full FAISS IVFx,PQy composition: coarse cells + PQ on the cell
    // RESIDUALS + per-probed-cell query lookup tables — integer-exact end
    // to end (see Similarity.ivfPqTopK)
    "ivfpq_topk" -> ((s, d) => {
      val (coarse, pqc) = IndexCache.ivfPqIndex(s, Tables.embeddings(s, d), d)
      Similarity.ivfPqTopKWith(Tables.embeddings(s, d), coarse, pqc)
    }),
    // two-stage retrieval: PQ-ADC shortlist (50) -> exact re-rank (5),
    // the FAISS refine stage (see Similarity.pqRerank)
    "pq_rerank" -> ((s, d) => Similarity.pqRerankWith(Tables.embeddings(s, d),
      IndexCache.pqCodebook(s, Tables.embeddings(s, d), d))),
    // bulk kNN graph on m-byte PQ codes + exact re-rank of the ADC
    // shortlist — the form that stays feasible when vectors don't fit
    // the shuffle (see Similarity.pqKnnJoin); shares the cached trained
    // codebook with the rest of the PQ family
    "pq_knn_join" -> ((s, d) => Similarity.pqKnnJoinWith(Tables.embeddings(s, d),
      IndexCache.pqCodebook(s, Tables.embeddings(s, d), d))),
    // the SERVING path: every corpus vector as a query, ADC-ranked
    // against the packed code store (asymmetric — queries keep full
    // precision; the streaming twin pqKnnStream is StreamingSpec-pinned
    // equal to this batch form)
    "pq_adc_knn" -> ((s, d) => Similarity.pqAdcTopKJoin(
      Tables.embeddings(s, d), Tables.embeddings(s, d),
      IndexCache.pqCodebook(s, Tables.embeddings(s, d), d))),
    // ANN quality telemetry: recall of the ADC serving path vs the exact
    // integer top-k on a deterministic query slice — integers only, so
    // the whole measurement is hash-gated
    "pq_recall" -> ((s, d) => Similarity.pqRecall(Tables.embeddings(s, d),
      IndexCache.pqCodebook(s, Tables.embeddings(s, d), d))),
    "media_meta" -> ((s, d) =>
      Multimodal.synthesizeMedia(Tables.documents(s, d))
        .selectExpr("media_id", "doc_id", "modality",
          "cast(octet_length(content) as bigint) as n_bytes",
          "width", "height", "sample_rate", "n_frames")),
    "frame_sample" -> ((s, d) =>
      Multimodal.sampleFrames(Multimodal.synthesizeMedia(Tables.documents(s, d)))),
    "media_dedup" -> ((s, d) =>
      Multimodal.mediaDedup(Multimodal.synthesizeMedia(Tables.documents(s, d)))),
    // unified REAL-codec dispatch over a MIXED corpus: per doc_id % 3 the
    // payload is a genuine BMP/PNG, WAV/AIFF, or animated GIF, and the
    // extractor picks the codec by magic bytes — pixel, sample and frame
    // sums all land under ONE closed-form hash gate
    "media_features" -> ((s, d) =>
      Multimodal.extractRealFeatures(
        Multimodal.synthesizeRealMedia(Tables.documents(s, d))).toDF()),
    // Per-file Bloom sidecar index end-to-end: scatter the docs across 16
    // hash-partitioned files (min/max useless by construction), build the
    // sidecar, probe a fixed key set through the pruned read. No false
    // negatives = exactly the oracle's IN-list rows; the actual file
    // skipping is pinned with executed-scan metrics in BucketingSpec.
    "bloom_prune" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "lang", "source", "n_chars")
      val dir = java.nio.file.Files.createTempDirectory("graft_bloomidx").toString
      docs.repartition(16, col("doc_id")).write.mode("overwrite").parquet(dir)
      graft.io.BloomIndex.build(s, dir, "doc_id")
      val (res, _, _) = graft.io.BloomIndex.prunedRead(s, dir, "doc_id", bloomProbeKeys)
      res.orderBy("doc_id")
    }),
    // Z-ORDER layout key (Maintenance.zValue / zOrderWrite): equal-width
    // monotone buckets over the ACTUAL key ranges, bit-interleaved into
    // the Morton code the clustered write sorts by. The bucket exprs are
    // THE SAME zBucketExprs the layout writer clusters by, so the gate
    // tests what zOrderWrite actually writes; the layout's pruning
    // effect itself is pinned in BucketingSpec.
    "zorder_layout" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val (bx, by, _, _) =
        graft.io.Maintenance.zBucketExprs(li, "l_orderkey", "l_partkey", 8)
      li.select(col("l_orderkey"), col("l_linenumber"),
        bx.as("bx"), by.as("by"),
        graft.io.Maintenance.zValue(bx, by, 8).as("zval"))
    }),
    // REAL codec path end-to-end: hand-rolled BMP encode → javax.imageio
    // decode → exact integer pixel features, hash-gated against the
    // oracle's closed-form recomputation of the same pixels. Every column
    // is exact — a channel-order, row-orientation, padding, or ImageIO
    // regression flips the gate.
    "media_decode" -> ((s, d) =>
      Multimodal.decodeImages(Multimodal.synthesizeImages(Tables.documents(s, d))).toDF()),
    // REAL resize round-trip: decode → pinned nearest-neighbor half-scale
    // → BMP re-encode → re-decode; output geometry, the encoder's exact
    // framing (BI_RGB byte length) and the re-decoded pixel sum all
    // recomputed closed-form by the oracle
    "image_resize" -> ((s, d) =>
      Multimodal.resizeImages(Multimodal.synthesizeImages(Tables.documents(s, d))).toDF()),
    // Perceptual dedup on DECODED pixels: each doc's pixels encoded twice
    // (BMP + PNG twins, zero shared payload bytes); the dHash is computed
    // from the real codec output and the oracle recomputes it from the
    // closed-form pixel spec.
    "image_phash" -> ((s, d) =>
      Multimodal.imagePhash(Multimodal.synthesizeImagePairs(Tables.documents(s, d))).toDF()),
    "phash_dedup" -> ((s, d) =>
      Multimodal.phashDedup(Multimodal.synthesizeImagePairs(Tables.documents(s, d)))),
    // REAL audio codec path: hand-rolled WAV (even ids, PCM16-LE) and
    // JDK-encoded AIFF (odd ids, PCM16-BE) → javax.sound.sampled decode →
    // exact integer sample features against the oracle's closed-form
    // recomputation. Endianness, container parsing, and the signed-16
    // interpretation all sit under the hash gate.
    "audio_decode" -> ((s, d) =>
      Multimodal.decodeAudio(Multimodal.synthesizeAudio(Tables.documents(s, d))).toDF()),
    // windowed RMS + clip telemetry over the REAL PCM decode path
    "audio_loudness" -> ((s, d) =>
      Multimodal.audioLoudness(Multimodal.synthesizeAudio(Tables.documents(s, d))).toDF()),
    // REAL video (multi-frame) codec path: animated GIF encode via the
    // JDK writer's sequence API → per-frame-indexed decode of every 3rd
    // frame only (decode cost scales with frames KEPT) → exact per-frame
    // pixel features the oracle recomputes closed-form.
    "video_frames" -> ((s, d) =>
      Multimodal.decodeSampledFrames(
        Multimodal.synthesizeVideos(Tables.documents(s, d)), stride = 3).toDF()),
    // keyframe selection on REAL decoded frames, gated via the same
    // closed-form pixel spec: consecutive frames differ by +5 mod 256 per
    // pixel, so per-frame energy = 5*(npix - wraps) + 251*wraps and the
    // wrap count drives which frames clear the 8/pixel threshold
    "video_keyframes" -> ((s, d) =>
      Multimodal.keyframes(
        Multimodal.synthesizeVideos(Tables.documents(s, d))).toDF()
        .orderBy(col("media_id"), col("frame_idx"))),
    // categorical-dependence audit (lang × source): per-cell PMI and
    // chi-square components from exact integer counts
    "mutual_info" -> ((s, d) =>
      Audit.mutualInfo(Tables.documents(s, d), "lang", "source")),
    // Benford first-digit DQ screen over the price column
    "benford_audit" -> ((s, d) =>
      Audit.benfordAudit(Tables.lineitem(s, d), "l_extendedprice")),
    // deterministic Poisson-bootstrap replicate means (hash-seeded, one
    // pass, B replicates as aggregate columns — never a B× row blowup)
    "bootstrap_ci" -> ((s, d) =>
      Audit.bootstrapCi(Tables.orders(s, d), "o_orderkey", "o_totalprice")),
    // per-doc character-entropy junk screen (integer-log2 magnitudes)
    "char_entropy" -> ((s, d) => Classify.charEntropy(Tables.documents(s, d))),
    // TRAINED multinomial NB language classifier over hashed token
    // buckets, scored on the held-out doc_id % 5 == 0 slice
    "nb_classify" -> ((s, d) => Classify.nbClassify(Tables.documents(s, d))),
    // per-class precision/recall/F1 of nb_classify's held-out predictions
    "nb_metrics" -> ((s, d) => Classify.nbMetrics(Tables.documents(s, d))),
    // URL canonicalization over a deterministic doc_id-derived messy-URL
    // decoration (the pii_scrub convention: the synthetic corpus has no
    // URL column, so the gate decorates one with every rule provably
    // firing — case folding, default-port strip, fragment drop, utm_*
    // strip with order-preserved survivors, and an unparsable passthrough)
    "url_canonical" -> ((s, d) =>
      graft.ext.WebOps.urlCanonical(
        Tables.documents(s, d).select(col("doc_id"), expr(urlDecorSql).as("url")),
        "url", Seq("doc_id"))),
    // JSON key/type profile over a deterministic event_id-derived props
    // decoration carrying every value shape (number, string, bool, null,
    // array) at different key frequencies
    "json_profile" -> ((s, d) =>
      graft.ext.WebOps.jsonProfile(
        Tables.events(s, d).select(expr(jsonDecorSql).as("props2")), "props2")),
    // discrete-time survival table (first→second event gap per user,
    // right-censored at the observation end)
    "hazard_table" -> ((s, d) =>
      Audit.hazardTable(Tables.events(s, d), "user_id", "ts", "event_id")),
    // the composition the canonicalizer exists for: canonical-URL exact
    // dedup — clusters invisible to raw-string dedup (case, default
    // ports, fragments, utm params all erased before grouping)
    "url_dedup" -> ((s, d) =>
      graft.ext.WebOps.urlCanonical(
        Tables.documents(s, d).select(col("doc_id"), expr(urlDecorSql).as("url")),
        "url", Seq("doc_id"))
        .groupBy(col("canon_url"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper"))
        .where(col("n_docs") > 1)
        .orderBy(col("canon_url"))),
    // exact-rational binary-segmentation first split of each type's
    // daily-count series (the change-point CUSUM localizes)
    "change_point" -> ((s, d) =>
      Audit.changePoint(Tables.events(s, d), "event_type", "ts")),
    // out-of-order arrival telemetry per user (watermark sizing input)
    "order_audit" -> ((s, d) =>
      Audit.orderAudit(Tables.events(s, d), "user_id", "ts", "event_id")),
    // Shewhart c-chart of daily counts with integer-exact breach flags
    "control_chart" -> ((s, d) =>
      Audit.controlChart(Tables.events(s, d), "event_type", "ts"))
  )

  /** Deterministic messy-URL decoration, shared VERBATIM with the DuckDB
    * oracle (the `Sampling.sourceRateSql` discipline — one string, two
    * engines, so the input can never drift): mixed-case scheme/host,
    * default and non-default ports, utm params in leading and middle
    * positions, fragments, and a % 11 unparsable row.
    */
  private val urlDecorSql: String =
    """CASE WHEN doc_id % 11 = 0 THEN 'not a url ' || CAST(doc_id AS STRING)
      |ELSE (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'Http' END) || '://'
      |  || (CASE WHEN doc_id % 3 = 0 THEN 'WWW.Example.COM'
      |           WHEN doc_id % 3 = 1 THEN 'cdn.Site.org'
      |           ELSE 'blog.example.com' END)
      |  || (CASE WHEN doc_id % 4 = 0 THEN ''
      |           WHEN doc_id % 4 = 1 THEN ':80'
      |           WHEN doc_id % 4 = 2 THEN ':443'
      |           ELSE ':8080' END)
      |  || '/p/' || CAST(doc_id % 7 AS STRING)
      |  || (CASE WHEN doc_id % 3 = 0 THEN '?utm_source=x&id=' || CAST(doc_id AS STRING)
      |           WHEN doc_id % 3 = 1 THEN '?id=' || CAST(doc_id AS STRING) || '&utm_campaign=y&ref=z'
      |           ELSE '' END)
      |  || (CASE WHEN doc_id % 5 = 0 THEN '#Sec' || CAST(doc_id AS STRING) ELSE '' END)
      |END""".stripMargin

  /** Deterministic JSON decoration for the profile gate — every value
    * shape present, keys at staggered frequencies; shared verbatim with
    * the oracle like [[urlDecorSql]].
    */
  /** The path_rollup fixture: 1–4-deep site paths from doc_id mods —
    * heavy shared prefixes (5 roots) with varied subtree shapes, so the
    * rollup provably aggregates across depths; mirrored in the oracle. */
  private val pathDecorSql: String =
    """concat('/s', cast(doc_id % 5 as string),
      |  case when doc_id % 4 >= 1 then concat('/t', cast(doc_id % 3 as string)) else '' end,
      |  case when doc_id % 4 >= 2 then concat('/u', cast(doc_id % 2 as string)) else '' end,
      |  case when doc_id % 4 >= 3 then concat('/v', cast(doc_id % 7 as string)) else '' end)""".stripMargin

  private val jsonDecorSql: String =
    """'{"id": ' || CAST(event_id AS STRING)
      |  || (CASE WHEN event_id % 2 = 0 THEN ', "tag": "t' || CAST(event_id % 7 AS STRING) || '"' ELSE '' END)
      |  || (CASE WHEN event_id % 3 = 0 THEN ', "score": ' || CAST(event_id % 100 AS STRING) || '.5' ELSE '' END)
      |  || (CASE WHEN event_id % 5 = 0 THEN ', "ok": true' ELSE '' END)
      |  || (CASE WHEN event_id % 7 = 0 THEN ', "note": null' ELSE '' END)
      |  || (CASE WHEN event_id % 11 = 0 THEN ', "tags": [1,2]' ELSE '' END)
      |  || '}'""".stripMargin

  // ---- DuckDB oracle fragments (mirror the Spark expressions exactly) ----

  /** DuckDB twin of TextOps.md5Long64. */
  private def dH(e: String): String =
    s"CAST(('0x' || substr(md5($e), 1, 15)) AS BIGINT)"

  /** The dq family's deterministically-corrupted orders frame — shared
    * by dq_report (aggregate verdicts) and dq_quarantine (row routing)
    * so both gates decorate identically.
    */
  private def dqDecorated(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val dec0 = o.select(
      col("o_orderkey").cast("bigint").as("o_orderkey"),
      when(col("o_orderkey") % 1000 === 7, lit(null).cast("bigint"))
        .when(col("o_orderkey") % 1000 === 33, lit(-5L))
        .otherwise(col("o_custkey").cast("bigint")).as("o_custkey"),
      when(col("o_orderkey") % 1000 === 13, -col("o_totalprice"))
        .otherwise(col("o_totalprice")).as("o_totalprice"),
      when(col("o_orderkey") % 1000 === 21, lit("X-BAD"))
        .otherwise(col("o_orderpriority")).as("o_orderpriority"))
    dec0.unionByName(dec0.filter(col("o_orderkey") % 5000 === 11))
  }

  private def dqRules(s: SparkSession, d: String): Seq[graft.ops.Quality.DqRule] = {
    import graft.ops.Quality
    Seq(
      Quality.NotNull("o_custkey"),
      Quality.InRange("o_totalprice", 0, 10000000),
      Quality.Matches("o_orderpriority", "[1-5]-[A-Z ]+"),
      Quality.Unique(Seq("o_orderkey")),
      Quality.RefIntegrity("o_custkey",
        Tables.customer(s, d)
          .select(col("c_custkey").cast("bigint").as("c_custkey")),
        "c_custkey"))
  }

  /** bloom_prune's probe set — ONE definition interpolated into both the
    * Spark query and the oracle SQL so the membership list can't drift.
    * Mostly-present scattered ids plus two absent sentinels (the skip
    * case).
    */
  private val bloomProbeKeys: Seq[Long] =
    (0L until 60L).map(i => i * 7L + 1L) ++ Seq(1000000007L, 1000000009L)

  /** DuckDB twin of Bpe's 6-pass anchored merge (pair columns a/b ride
    * in from the round's best-pair CTE via CROSS JOIN).
    */
  private def dBpeMerged(col: String): String =
    (1 to 6).foldLeft(col)((acc, _) =>
      s"replace($acc, ' ' || a || ' ' || b || ' ', ' ' || a || b || ' ')")

  /** DuckDB twin of the CDC gate fixtures (cdcSnapshot/cdcChangelog) plus
    * the latest-wins MERGE: CTEs `snap`, `chg`, `latest` (one row per
    * changed key, highest version), and `applied` (the post-merge table).
    */
  private val dCdcCtes: String =
    """WITH snap AS (
      |  SELECT CAST(c_custkey AS BIGINT) AS cust_id, c_name AS name,
      |         CAST(c_nationkey AS BIGINT) AS nation, c_mktsegment AS segment
      |  FROM customer
      |), chg AS (
      |  SELECT cust_id, name, nation, 'UPDATED1' AS segment,
      |         'U' AS op, cust_id * 10 + 1 AS version
      |  FROM snap WHERE cust_id % 10 = 3
      |  UNION ALL
      |  SELECT cust_id, name, nation, 'UPDATED2', 'U', cust_id * 10 + 2
      |  FROM snap WHERE cust_id % 30 = 3
      |  UNION ALL
      |  SELECT cust_id, name, nation, segment, 'D', cust_id * 10 + 1
      |  FROM snap WHERE cust_id % 10 = 7
      |  UNION ALL
      |  SELECT cust_id, name, nation, 'REVIVED', 'U', cust_id * 10 + 5
      |  FROM snap WHERE cust_id % 20 = 17
      |  UNION ALL
      |  SELECT cust_id + 10000000, 'new_customer', cust_id % 25, 'NEW',
      |         'I', CAST(1 AS BIGINT)
      |  FROM snap WHERE cust_id % 10 = 1
      |), latest AS (
      |  SELECT cust_id, name, nation, segment, op FROM (
      |    SELECT *, row_number() OVER (PARTITION BY cust_id
      |                                 ORDER BY version DESC) AS rn
      |    FROM chg) t
      |  WHERE rn = 1
      |), applied AS (
      |  SELECT cust_id, name, nation, segment FROM snap
      |  WHERE cust_id NOT IN (SELECT cust_id FROM latest)
      |  UNION ALL
      |  SELECT cust_id, name, nation, segment FROM latest WHERE op <> 'D'
      |)""".stripMargin

  /** Unrolled BPE training CTE chain: v0 (word-freq vocab, space-anchored
    * chars) then per round t: pair counts p_t, deterministic best b_t,
    * merged vocab v_t — the DuckDB twin of Bpe.trainedState.
    */
  private def dBpeCtes(iters: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
        |v0 AS (SELECT word, COUNT(*) AS freq,
        |              ' ' || regexp_replace(word, '(.)', '\1 ', 'g') AS sp
        |       FROM tok WHERE regexp_full_match(word, '[a-z]+') GROUP BY word)""".stripMargin)
    for (t <- 1 to iters) {
      sb.append(",\n").append(
        s"""p$t AS (SELECT syms[i] AS a, syms[i + 1] AS b,
           |               CAST(SUM(freq) AS BIGINT) AS pair_count
           |        FROM (SELECT string_split(trim(sp), ' ') AS syms, freq,
           |                     unnest(generate_series(1, len(string_split(trim(sp), ' ')) - 1)) AS i
           |              FROM v${t - 1})
           |        GROUP BY 1, 2),
           |b$t AS (SELECT a, b, pair_count FROM p$t ORDER BY pair_count DESC, a, b LIMIT 1),
           |v$t AS (SELECT word, freq, ${dBpeMerged("sp")} AS sp FROM v${t - 1} CROSS JOIN b$t)""".stripMargin)
    }
    sb.toString
  }

  /** DuckDB twin of Multimodal's integer luma (r + 2g + 3b over the
    * closed-form pixelChannels spec) at coordinates (`x`, `y`).
    */
  private def dLuma(x: String, y: String): String =
    s"(((doc_id + 3*($x) + 7*($y)) % 256)" +
      s" + 2*((2*doc_id + 5*($x) + 11*($y)) % 256)" +
      s" + 3*((3*doc_id + 13*($x) + ($y)) % 256))"

  /** CTE chain ending in `ph` = (media_id, w, h, band0..band3): the dHash
    * of every BMP/PNG twin (media 2·doc_id and 2·doc_id+1 share the
    * doc's pixels, hence the hash), recomputed from the pixel spec —
    * the DuckDB twin of Multimodal.imagePhash ∘ synthesizeImagePairs.
    */
  private val dPhashCtes: String = {
    val bandSums = (0 to 3).map { b =>
      s"""CAST(SUM(CASE WHEN (j*8 + i) // 16 = $b
         |              THEN bit * (CAST(1 AS BIGINT) << ((j*8 + i) % 16))
         |              ELSE 0 END) AS BIGINT) AS band$b""".stripMargin
    }.mkString(",\n")
    s"""WITH d AS (
       |  SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 11 AS h
       |  FROM documents WHERE doc_id IS NOT NULL AND doc_id >= 0
       |), js AS (
       |  SELECT doc_id, w, h, unnest(range(0, 8)) AS j FROM d
       |), ij AS (
       |  SELECT doc_id, w, h, j, unnest(range(0, 8)) AS i FROM js
       |), bits AS (
       |  SELECT doc_id, j, i,
       |    CASE WHEN ${dLuma("(i+1) * w // 9", "j * h // 8")}
       |            > ${dLuma("i * w // 9", "j * h // 8")}
       |         THEN 1 ELSE 0 END AS bit
       |  FROM ij
       |), bands AS (
       |  SELECT doc_id,
       |$bandSums
       |  FROM bits GROUP BY doc_id
       |), ph AS (
       |  SELECT 2*d.doc_id + twin AS media_id, d.w, d.h,
       |         band0, band1, band2, band3
       |  FROM d JOIN bands USING (doc_id)
       |       CROSS JOIN (SELECT unnest([0, 1]) AS twin)
       |)""".stripMargin
  }

  /** DuckDB twin of TextOps.shingleExpr (distinct word 3-grams). */
  private val dSh =
    """CASE WHEN len(toks) >= 3
      | THEN list_distinct(list_transform(range(1, len(toks) - 1),
      |   i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))
      | ELSE CAST([] AS VARCHAR[]) END""".stripMargin

  private val dToksCte =
    "WITH t AS (SELECT doc_id, lang, text, string_split(text, ' ') AS toks FROM documents)"

  /** DuckDB twin of Graph.pageRank over Graph.lineitemGraph: the fixed
    * iteration loop UNROLLED into one CTE per step (genuinely independent
    * of the Spark formulation — no recursion, no shared code). Literal
    * arithmetic (`(1.0 - 0.85)`, `r * weight / out_w`) is written in the
    * exact order the Spark expressions evaluate, so the only cross-engine
    * difference is double-sum associativity, absorbed by the final
    * `round(_, 6)`.
    */
  private def pagerankSql(iters: Int): String = {
    val head =
      """WITH edges AS (
        |  SELECT l_suppkey % 100 AS src, l_partkey % 100 AS dst, COUNT(*) AS weight
        |  FROM lineitem WHERE l_suppkey % 100 <> l_partkey % 100
        |  GROUP BY 1, 2
        |), nodes AS (
        |  SELECT src AS id FROM edges UNION SELECT dst FROM edges
        |), ow AS (
        |  SELECT src, SUM(weight) AS out_w FROM edges GROUP BY 1
        |), n AS (
        |  SELECT CAST(COUNT(*) AS DOUBLE) AS n_nodes FROM nodes
        |), r0 AS (
        |  SELECT id, 1.0 / n.n_nodes AS r FROM nodes CROSS JOIN n
        |)""".stripMargin
    val steps = (1 to iters).map { k =>
      s""", r$k AS (
         |  SELECT nodes.id, (1.0 - 0.85) / n.n_nodes + 0.85 * COALESCE(c.c, 0.0) AS r
         |  FROM nodes CROSS JOIN n
         |  LEFT JOIN (
         |    SELECT e.dst, SUM(p.r * e.weight / ow.out_w) AS c
         |    FROM r${k - 1} p JOIN edges e ON p.id = e.src JOIN ow ON ow.src = e.src
         |    GROUP BY e.dst
         |  ) c ON c.dst = nodes.id
         |)""".stripMargin
    }.mkString
    head + steps +
      s"\nSELECT id, round(r, 6) AS rank FROM r$iters ORDER BY rank DESC, id LIMIT 20"
  }

  /** [[pagerankSql]] with the teleport restricted to the id%10==0 seed
    * set — the oracle twin of Graph.personalizedPageRank over the same
    * lineitem graph.
    */
  private def pprSql(iters: Int): String = {
    val head =
      """WITH edges AS (
        |  SELECT l_suppkey % 100 AS src, l_partkey % 100 AS dst, COUNT(*) AS weight
        |  FROM lineitem WHERE l_suppkey % 100 <> l_partkey % 100
        |  GROUP BY 1, 2
        |), nodes AS (
        |  SELECT src AS id FROM edges UNION SELECT dst FROM edges
        |), ow AS (
        |  SELECT src, SUM(weight) AS out_w FROM edges GROUP BY 1
        |), seeds AS (
        |  SELECT id FROM nodes WHERE id % 10 = 0
        |), ns AS (
        |  SELECT CAST(COUNT(*) AS DOUBLE) AS n_seeds FROM seeds
        |), tele AS (
        |  SELECT nodes.id,
        |         CASE WHEN seeds.id IS NOT NULL THEN 1.0 / ns.n_seeds
        |              ELSE 0.0 END AS t
        |  FROM nodes LEFT JOIN seeds ON seeds.id = nodes.id CROSS JOIN ns
        |), r0 AS (
        |  SELECT id, t AS r FROM tele
        |)""".stripMargin
    val steps = (1 to iters).map { k =>
      s""", r$k AS (
         |  SELECT tele.id, (1.0 - 0.85) * tele.t + 0.85 * COALESCE(c.c, 0.0) AS r
         |  FROM tele
         |  LEFT JOIN (
         |    SELECT e.dst, SUM(p.r * e.weight / ow.out_w) AS c
         |    FROM r${k - 1} p JOIN edges e ON p.id = e.src JOIN ow ON ow.src = e.src
         |    GROUP BY e.dst
         |  ) c ON c.dst = tele.id
         |)""".stripMargin
    }.mkString
    head + steps +
      s"\nSELECT id, round(r, 6) AS rank FROM r$iters ORDER BY rank DESC, id LIMIT 20"
  }

  /** DuckDB twin of Similarity's normalize-once path: unit vectors as
    * array<double> (left-to-right double accumulation, like VecDot).
    * Zero-norm embeddings get a NULL unit, mirroring `normalized()`'s
    * guard — without it the engines diverge on that edge (Spark NULL vs
    * DuckDB Inf/NaN units from x/0.0).
    */
  private val dUnitCte =
    """WITH u AS (
      |  SELECT vec_id,
      |         CASE WHEN sqrt(list_sum(list_transform(embedding,
      |                y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))) > 0
      |           THEN list_transform(embedding, x -> CAST(x AS DOUBLE)
      |             / sqrt(list_sum(list_transform(embedding, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))))
      |         END AS unit
      |  FROM embeddings
      |)""".stripMargin

  private def dUnitDot(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i]))"

  /** One Lloyd's assignment round in the integer domain (see
    * Similarity.kmeansAssign): exact int64 dot per centroid, argmax with
    * ties to the smallest centroid id. `q`/`c` are CTE names.
    */
  private def dKmAssign(q: String, c: String): String =
    s"""SELECT vec_id, qvec, cell, dot FROM (
       |  SELECT vec_id, qvec, cell, dot,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cell) AS rn
       |  FROM (SELECT $q.vec_id, $q.qvec, kc.cidx AS cell,
       |               CAST(list_sum(list_transform(range(1, len($q.qvec) + 1),
       |                 i -> $q.qvec[i] * kc.qcent[i])) AS BIGINT) AS dot
       |        FROM $q, $c kc WHERE $q.qvec IS NOT NULL) d) t WHERE rn = 1""".stripMargin

  /** One Lloyd's centroid update: per-component integer mean
    * (round-half-up via exact double division), empty cells drop out.
    * `sum(qv)` is HUGEINT in DuckDB — the DOUBLE cast normalizes it.
    */
  private def dKmUpdate(a: String): String =
    s"""SELECT cell AS cidx, list(m ORDER BY pos) AS qcent FROM (
       |  SELECT cell, pos, CAST(floor(CAST(sum(qv) AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS m
       |  FROM (SELECT cell, unnest(qvec) AS qv, unnest(range(1, len(qvec) + 1)) AS pos FROM $a) e
       |  GROUP BY cell, pos) f GROUP BY cell""".stripMargin

  /** One multi-subspace PQ assignment round (Similarity.pqAssign's twin):
    * exact int64 L2 objective 2·x·c − c·c per codeword of the row's OWN
    * subspace, argmax with ties to the smallest code. `sub`/`c` are CTE
    * names; `sub` must have (vec_id, s, qsub), `c` (s, cidx, qcent).
    */
  private def dPqAssign(sub: String, c: String): String =
    s"""SELECT vec_id, s, qsub, code, obj FROM (
       |  SELECT vec_id, s, qsub, code, obj,
       |         row_number() OVER (PARTITION BY vec_id, s ORDER BY obj DESC, code) AS rn
       |  FROM (SELECT $sub.vec_id, $sub.s, $sub.qsub, kc.cidx AS code,
       |               CAST(2 * list_sum(list_transform(range(1, len($sub.qsub) + 1),
       |                 i -> $sub.qsub[i] * kc.qcent[i]))
       |                 - list_sum(list_transform(kc.qcent, x -> x * x)) AS BIGINT) AS obj
       |        FROM $sub, $c kc WHERE $sub.qsub IS NOT NULL AND kc.s = $sub.s) d) t
       |WHERE rn = 1""".stripMargin

  /** One PQ codebook update (Similarity.pqCentroids' twin): per-(subspace,
    * code) integer mean, empty codes drop out.
    */
  private def dPqUpdate(a: String): String =
    s"""SELECT s, code AS cidx, list(mv ORDER BY pos) AS qcent FROM (
       |  SELECT s, code, pos, CAST(floor(CAST(sum(qv) AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS mv
       |  FROM (SELECT s, code, unnest(qsub) AS qv, unnest(range(1, len(qsub) + 1)) AS pos FROM $a) e
       |  GROUP BY s, code, pos) f GROUP BY s, code""".stripMargin

  /** Shared PQ CTE prefix: quantized units → subvector stream → seeded
    * codebooks → 2 unrolled Lloyd's rounds → final assignment `a2` over
    * final codebooks `c2`.
    */
  private val dPqCtes =
    s"""$dUnitCte,
       |q AS (SELECT vec_id, CASE WHEN unit IS NOT NULL THEN list_transform(unit,
       |        x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) END AS qvec FROM u),
       |sub AS (SELECT vec_id, s,
       |          CASE WHEN qvec IS NOT NULL THEN list_slice(qvec, s * 8 + 1, s * 8 + 8) END AS qsub
       |        FROM (SELECT vec_id, qvec, unnest(range(0, 8)) AS s FROM q)),
       |c0 AS (SELECT s, vec_id AS cidx, qsub AS qcent FROM sub
       |       WHERE qsub IS NOT NULL AND vec_id IN (
       |         SELECT vec_id FROM q WHERE qvec IS NOT NULL ORDER BY vec_id LIMIT 8)),
       |a0 AS (${dPqAssign("sub", "c0")}),
       |c1 AS (${dPqUpdate("a0")}),
       |a1 AS (${dPqAssign("sub", "c1")}),
       |c2 AS (${dPqUpdate("a1")}),
       |a2 AS (${dPqAssign("sub", "c2")})""".stripMargin

  /** The recursive connected-components oracle body, shared by
    * dedup_clusters (the assignment view) and dedup_stats (the size
    * histogram view). */
  private lazy val dCcSql: String =
    s"""${dToksCte.replace("WITH t AS", "WITH RECURSIVE t AS")}, s AS (
       |  SELECT doc_id, $dSh AS sh FROM t
       |), h2 AS (
       |  SELECT doc_id, list_transform(sh, s2 -> ${dH("s2")}) AS hs FROM s
       |), m AS (
       |  SELECT doc_id,
       |       $dMh
       |  FROM h2
       |), sig AS (
       |  SELECT doc_id,
       |         ${dH("concat_ws(',', mh0, mh1, mh2, mh3)")} AS band0,
       |         ${dH("concat_ws(',', mh4, mh5, mh6, mh7)")} AS band1
       |  FROM m
       |), pairs AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM sig a JOIN sig b
       |    ON a.doc_id < b.doc_id AND (a.band0 = b.band0 OR a.band1 = b.band1)
       |), edges AS (
       |  SELECT a_id AS u, b_id AS v FROM pairs
       |  UNION
       |  SELECT b_id, a_id FROM pairs
       |), reach AS (
       |  SELECT u, u AS v FROM (SELECT DISTINCT u FROM edges)
       |  UNION
       |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
       |)
       |SELECT u AS doc_id, MIN(v) AS component FROM reach GROUP BY 1""".stripMargin

  private val dMh = (0 until 8).map { i =>
    s"list_min(list_transform(hs, x -> (${Dedup.minhashA(i)} * (x % 1073741824) + ${Dedup.minhashB(i)}) % ${Dedup.MinhashP})) AS mh$i"
  }.mkString(",\n       ")

  private def dSimhashBitsW(w: Int): String = (0 until w).map { i =>
    s"list_sum(list_transform(hs, x -> CASE WHEN (x >> $i) & 1 = 1 THEN 1 ELSE -1 END)) AS b$i"
  }.mkString(",\n       ")

  private def dSimhashPackW(w: Int): String = (0 until w)
    .map(i => s"CASE WHEN b$i > 0 THEN CAST(${1L << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END")
    .mkString(" + ")

  private val dSimhashBits = dSimhashBitsW(16)
  private val dSimhashPack = dSimhashPackW(16)

  private val dLshBucket = (1 to 8)
    .map(i => s"CASE WHEN CAST(embedding[$i] AS DOUBLE) > 0 THEN CAST(${1 << (i - 1)} AS BIGINT) ELSE CAST(0 AS BIGINT) END")
    .mkString(" + ")

  // DuckDB twin of Similarity.signBandExpr: 16 axis-pair hyperplane signs
  // packed into one band value
  private def dSignBand(lo: Int, bits: Int): String = (0 until bits).map { j =>
    val d1 = lo + 2 * j + 1
    val d2 = lo + 2 * j + 2
    s"(CASE WHEN CAST(embedding[$d1] AS DOUBLE) - CAST(embedding[$d2] AS DOUBLE) > 0 THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
  }.mkString(" + ")

  private val q1PricingSql: String =
      """SELECT l_returnflag, l_linestatus,
        |       SUM(l_quantity) AS sum_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |                * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
        |            AS DOUBLE) AS sum_disc_price,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |                * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
        |                * (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2))))
        |            AS DOUBLE) AS sum_charge,
        |       AVG(l_quantity) AS avg_qty,
        |       COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** DuckDB twin of Audit.bootstrapCi's Poisson(1) weight for replicate
    * r — ONE md5-derived h per row, the same universal-hash mix and the
    * same inverse-CDF integer thresholds (scaled to the modulus).
    */
  private def dBsW(r: Int): String = {
    val u = s"((${Dedup.minhashA(r)} * h + ${Dedup.minhashB(r)}) % ${Dedup.MinhashP})"
    s"(CASE WHEN $u < 395007529 THEN 0 WHEN $u < 790015058 THEN 1" +
      s" WHEN $u < 987518823 THEN 2 WHEN $u < 1053353411 THEN 3" +
      s" WHEN $u < 1069812058 THEN 4 WHEN $u < 1073103787 THEN 5 ELSE 6 END)"
  }

  private val dBootstrapSql: String = {
    val aggs = (0 until 32).map { r =>
      s"CAST(SUM(${dBsW(r)}) AS BIGINT) AS n_$r,\n" +
        s"       CAST(SUM(vc * ${dBsW(r)}) AS BIGINT) AS s_$r"
    }.mkString(",\n       ")
    val reps = (0 until 32).map { r =>
      s"SELECT $r AS rep, n_$r AS n_eff," +
        s" round(CAST(s_$r AS DOUBLE) / (100.0 * CAST(n_$r AS DOUBLE)), 6) AS mean_value FROM a"
    }.mkString("\n  UNION ALL ")
    s"WITH hh AS (\n  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS vc," +
      s" ${dH("'bs:' || CAST(o_orderkey AS VARCHAR)")} % 1073741824 AS h\n  FROM orders\n)," +
      s" a AS (\n  SELECT $aggs\n  FROM hh\n)\n$reps\nORDER BY rep"
  }

  /** Shared CTE pipeline of the NB classifier oracle up to the per-doc
    * arg-max (nb_classify emits it; nb_metrics re-aggregates it).
    */
  private val dNbPick: String =
    s"""WITH tok AS (
       |  SELECT doc_id, lang, ${dH("t")} % 4096 AS b
       |  FROM (SELECT doc_id, lang,
       |               unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
       |        FROM documents)
       |), cnt AS (
       |  SELECT lang AS cls, b, COUNT(*) AS c
       |  FROM tok WHERE doc_id % 5 <> 0 GROUP BY 1, 2
       |), tot AS (
       |  SELECT cls, CAST(SUM(c) AS BIGINT) AS tc FROM cnt GROUP BY 1
       |), prior AS (
       |  SELECT lang AS cls, COUNT(*) AS pc
       |  FROM documents WHERE doc_id % 5 <> 0 GROUP BY 1
       |), dense AS (
       |  SELECT p.cls, g.b,
       |         (length(bin(COALESCE(c.c, 0) + 1)) - 1)
       |           - (length(bin(t.tc + 4096)) - 1) AS w
       |  FROM prior p
       |  CROSS JOIN (SELECT unnest(range(0, 4096)) AS b) g
       |  JOIN tot t ON t.cls = p.cls
       |  LEFT JOIN cnt c ON c.cls = p.cls AND c.b = g.b
       |), sc AS (
       |  SELECT e.doc_id, e.lang, d.cls,
       |         CAST(SUM(d.w) AS BIGINT) + (length(bin(p.pc + 1)) - 1) AS score
       |  FROM tok e JOIN dense d USING (b) JOIN prior p ON p.cls = d.cls
       |  WHERE e.doc_id % 5 = 0
       |  GROUP BY e.doc_id, e.lang, d.cls, p.pc
       |), pick AS (
       |  SELECT doc_id, lang, cls, score,
       |         ROW_NUMBER() OVER (PARTITION BY doc_id
       |                            ORDER BY score DESC, cls ASC) AS rn
       |  FROM sc
       |)""".stripMargin

  /** DuckDB twin of WebOps.urlCanonical over the decorated documents —
    * shared (sans ORDER BY) by url_canonical and url_dedup. DuckDB
    * string literals do not process backslash escapes, so the regex
    * carries a single \? where the Spark side passes the pattern through
    * the (non-SQL-parsed) function API; the decor SQL is flattened to
    * one line because its leading '||' continuation lines would be eaten
    * by this template's stripMargin.
    */
  private val dUrlCanonSql: String = {
    // identical to WebOps.UrlRe incl. the '/'-anchored path group (the
    // malformed-port passthrough contract)
    val re = "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#:]+)(:[0-9]+)?((?:/[^?#]*)?)(\\?[^#]*)?(#.*)?$"
    s"""WITH u AS (
       |  SELECT doc_id, ${urlDecorSql.replace('\n', ' ')} AS url FROM documents
       |), p AS (
       |  SELECT doc_id, url,
       |         regexp_extract(url, '$re', 1) AS u_scheme,
       |         regexp_extract(url, '$re', 2) AS u_host,
       |         regexp_extract(url, '$re', 3) AS u_port,
       |         regexp_extract(url, '$re', 4) AS u_path,
       |         regexp_extract(url, '$re', 5) AS u_query,
       |         regexp_extract(url, '$re', 6) AS u_frag
       |  FROM u
       |), k AS (
       |  SELECT *, CASE WHEN u_query = '' THEN []
       |                 ELSE list_filter(string_split(substring(u_query, 2), '&'),
       |                                  q -> substring(q, 1, 4) <> 'utm_') END AS kept
       |  FROM p
       |)
       |SELECT doc_id, url,
       |       CASE WHEN u_scheme = '' THEN url
       |            ELSE lower(u_scheme) || '://' || lower(u_host)
       |                 || (CASE WHEN (lower(u_scheme) = 'http'  AND u_port = ':80')
       |                            OR (lower(u_scheme) = 'https' AND u_port = ':443')
       |                     THEN '' ELSE u_port END)
       |                 || u_path
       |                 || (CASE WHEN u_query = '' OR len(kept) = 0 THEN ''
       |                     ELSE '?' || array_to_string(kept, '&') END)
       |       END AS canon_url,
       |       CASE WHEN u_query = '' THEN 0
       |            ELSE len(string_split(substring(u_query, 2), '&')) - len(kept)
       |       END AS dropped_utm,
       |       CAST(u_frag <> '' AS INT) AS had_fragment,
       |       CAST((lower(u_scheme) = 'http' AND u_port = ':80')
       |         OR (lower(u_scheme) = 'https' AND u_port = ':443') AS INT) AS port_stripped,
       |       CAST(u_scheme = '' AS INT) AS unparsed
       |FROM k""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    "sess_assign" ->
      """WITH g AS (
        |  SELECT event_id, user_id, ts,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events
        |), s AS (
        |  SELECT event_id, user_id, ts,
        |         CASE WHEN prev_ts IS NULL
        |                   OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
        |              THEN 1 ELSE 0 END AS session_start
        |  FROM g
        |)
        |SELECT event_id, user_id, ts,
        |       CAST(session_start AS BIGINT) AS session_start,
        |       CAST(SUM(session_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq,
        |       CAST(user_id AS VARCHAR) || '-' ||
        |         CAST(SUM(session_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                                       ROWS UNBOUNDED PRECEDING) AS VARCHAR)
        |         AS session_id
        |FROM s""".stripMargin,
    "sess_stats" ->
      """WITH g AS (
        |  SELECT event_id, user_id, ts, event_type, value,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events
        |), s AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL
        |                      OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
        |                 THEN 1 ELSE 0 END AS session_start
        |  FROM g
        |), sess AS (
        |  SELECT *, CAST(user_id AS VARCHAR) || '-' ||
        |            CAST(SUM(session_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                                          ROWS UNBOUNDED PRECEDING) AS VARCHAR)
        |            AS session_id
        |  FROM s
        |)
        |SELECT user_id, session_id,
        |       COUNT(*) AS n_events,
        |       MIN(ts) AS session_start_ts,
        |       MAX(ts) AS session_end_ts,
        |       epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us,
        |       CAST(SUM(CASE WHEN event_type = 'purchase'
        |                     THEN CAST(value AS DECIMAL(18,2))
        |                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        |         AS purchase_value
        |FROM sess
        |GROUP BY user_id, session_id""".stripMargin,
    "enrich" ->
      """WITH ua AS (
        |  SELECT *,
        |         CASE WHEN user_id % 6 = 0 THEN 'Mozilla/5.0 (Windows NT 10.0; Win64; x64)'
        |              WHEN user_id % 6 = 1 THEN 'Mozilla/5.0 (Linux; android 13; Pixel 7)'
        |              WHEN user_id % 6 = 2 THEN 'Mozilla/5.0 (iPhone; CPU iPhone OS 16_0)'
        |              WHEN user_id % 6 = 3 THEN 'Mozilla/5.0 (iPad; CPU OS 16_0)'
        |              WHEN user_id % 6 = 4 THEN 'Mozilla/5.0 (Macintosh; Intel Mac OS X 13_0)'
        |              ELSE 'curl/8.0' END AS user_agent,
        |         CASE WHEN event_type IN ('click','view') THEN 'MOBILE'
        |              ELSE upper(event_type) END AS platform_raw
        |  FROM events
        |)
        |SELECT event_id, user_id, ts AS message_date, user_agent,
        |       CASE WHEN user_agent LIKE '%Windows%' THEN 'Windows PC'
        |            WHEN user_agent LIKE '%android%' THEN 'Android'
        |            WHEN user_agent LIKE '%iPhone%' THEN 'iPhone'
        |            WHEN user_agent LIKE '%iPad%' THEN 'iPad'
        |            WHEN user_agent LIKE '%Mac%' THEN 'iMac'
        |            ELSE 'Others' END AS device,
        |       CASE WHEN platform_raw = 'MOBILE' THEN 'MOBILE' ELSE 'WEB' END AS platform,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |       ts AS last_visited
        |FROM ua""".stripMargin,
    "change_detect" ->
      """SELECT event_id, user_id, ts, event_type,
        |       lag(event_type) OVER w AS prev_event_type,
        |       CAST(CASE WHEN lag(event_type) OVER w IS NOT NULL
        |                      AND event_type <> lag(event_type) OVER w
        |                 THEN 1 ELSE 0 END AS BIGINT) AS event_type_changed
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,
    "carry_forward" ->
      """SELECT event_id, user_id, ts, event_type, value,
        |       last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
        |         OVER w AS last_purchase_value,
        |       last_value(CASE WHEN event_type = 'purchase' THEN ts END IGNORE NULLS)
        |         OVER w AS last_purchase_ts
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS UNBOUNDED PRECEDING)""".stripMargin,
    "state_snapshot" ->
      """SELECT user_id, event_id, ts, event_type, value FROM (
        |  SELECT user_id, event_id, ts, event_type, value,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) t
        |WHERE rn = 1""".stripMargin,
    "session_paths" ->
      // string_agg ORDER BY (ts, event_id) = array_sort over the same
      // struct key (event_id unique ⇒ identical order); day = CAST DATE
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, ts, event_id, event_type
        |  FROM events WHERE event_type IS NOT NULL
        |), p AS (
        |  SELECT user_id, day,
        |         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        |  FROM e GROUP BY 1, 2
        |)
        |SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
        |FROM p GROUP BY path
        |ORDER BY n_sessions DESC, path LIMIT 100""".stripMargin,
    "funnel_steps" ->
      """WITH v AS (
        |  SELECT user_id, MIN(ts) AS view_ts FROM events
        |  WHERE event_type = 'view' GROUP BY 1
        |), c AS (
        |  SELECT e.user_id, MIN(e.ts) AS click_ts
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts >= v.view_ts
        |    AND e.ts <= v.view_ts + INTERVAL 24 HOUR GROUP BY 1
        |), p AS (
        |  SELECT e.user_id, MIN(e.ts) AS purchase_ts
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= c.click_ts
        |    AND e.ts <= c.click_ts + INTERVAL 24 HOUR GROUP BY 1
        |)
        |SELECT v.user_id, v.view_ts, c.click_ts, p.purchase_ts,
        |       CAST(1 + CASE WHEN c.click_ts IS NULL THEN 0 ELSE 1 END
        |              + CASE WHEN p.purchase_ts IS NULL THEN 0 ELSE 1 END AS INTEGER) AS stage
        |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)""".stripMargin,
    "cohort_retention" ->
      """WITH w AS (
        |  SELECT user_id, CAST(floor(epoch_us(ts) / 604800000000) AS BIGINT) AS week
        |  FROM events
        |), fs AS (SELECT user_id, MIN(week) AS cohort_week FROM w GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, week FROM w)
        |SELECT cohort_week, week - cohort_week AS week_offset,
        |       COUNT(*) AS n_active_users
        |FROM a JOIN fs USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "rfm_segments" ->
      """WITH pu AS (
        |  SELECT user_id, MAX(ts) AS last_ts, COUNT(*) AS frequency,
        |         SUM(CAST(value AS DECIMAL(18,2))) AS monetary
        |  FROM events GROUP BY 1
        |), ref AS (SELECT MAX(ts) AS ref_ts FROM events),
        |rec AS (
        |  SELECT user_id,
        |         CAST(floor((epoch_us(ref_ts) - epoch_us(last_ts)) / 86400000000) AS BIGINT) AS recency_days,
        |         frequency, CAST(monetary AS DOUBLE) AS monetary
        |  FROM pu CROSS JOIN ref
        |), b AS (
        |  SELECT quantile_cont(recency_days, 0.25) AS r1, quantile_cont(recency_days, 0.5) AS r2,
        |         quantile_cont(recency_days, 0.75) AS r3,
        |         quantile_cont(frequency, 0.25) AS f1, quantile_cont(frequency, 0.5) AS f2,
        |         quantile_cont(frequency, 0.75) AS f3,
        |         quantile_cont(monetary, 0.25) AS m1, quantile_cont(monetary, 0.5) AS m2,
        |         quantile_cont(monetary, 0.75) AS m3
        |  FROM rec
        |)
        |SELECT user_id, recency_days, frequency, monetary,
        |       CAST(1 + CASE WHEN recency_days > r1 THEN 1 ELSE 0 END
        |              + CASE WHEN recency_days > r2 THEN 1 ELSE 0 END
        |              + CASE WHEN recency_days > r3 THEN 1 ELSE 0 END AS INTEGER) AS r_seg,
        |       CAST(5 - (1 + CASE WHEN frequency > f1 THEN 1 ELSE 0 END
        |                   + CASE WHEN frequency > f2 THEN 1 ELSE 0 END
        |                   + CASE WHEN frequency > f3 THEN 1 ELSE 0 END) AS INTEGER) AS f_seg,
        |       CAST(5 - (1 + CASE WHEN monetary > m1 THEN 1 ELSE 0 END
        |                   + CASE WHEN monetary > m2 THEN 1 ELSE 0 END
        |                   + CASE WHEN monetary > m3 THEN 1 ELSE 0 END) AS INTEGER) AS m_seg
        |FROM rec CROSS JOIN b ORDER BY user_id""".stripMargin,
    "new_vs_returning" ->
      """WITH state AS (
        |  SELECT user_id AS u_id, ts AS state_ts FROM (
        |    SELECT user_id, ts,
        |           row_number() OVER (PARTITION BY user_id
        |                              ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events
        |    WHERE ts < TIMESTAMP '2024-01-15 00:00:00') t
        |  WHERE rn = 1
        |)
        |SELECT e.event_id, e.user_id, e.ts, s.state_ts,
        |       CAST(CASE WHEN s.u_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_new
        |FROM events e
        |LEFT JOIN state s
        |  ON trim(CAST(e.user_id AS VARCHAR)) = trim(CAST(s.u_id AS VARCHAR))
        |WHERE e.ts >= TIMESTAMP '2024-01-15 00:00:00'""".stripMargin,
    "q1_pricing" -> q1PricingSql,
    "sql_interface" -> q1PricingSql,
    "q3_top_unshipped" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |                * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
        |            AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |                * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
        |            AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name""".stripMargin,
    "topk_agg" ->
      """WITH r AS (
        |  SELECT o_custkey, o_orderkey,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders
        |)
        |SELECT o_custkey,
        |       string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY rk) AS top_orderkeys_csv
        |FROM r WHERE rk <= 3
        |GROUP BY o_custkey""".stripMargin,
    "topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         CAST(row_number() OVER (PARTITION BY o_custkey
        |                                 ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rk
        |  FROM orders) t
        |WHERE rk <= 3""".stripMargin,
    "window_ranks" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |       CAST(rank() OVER w AS INTEGER) AS price_rank,
        |       CAST(dense_rank() OVER w AS INTEGER) AS price_dense_rank,
        |       lag(o_totalprice) OVER w AS next_higher_price,
        |       lead(o_totalprice) OVER w AS next_lower_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)""".stripMargin,
    "running_qty" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate, l_quantity,
        |       SUM(l_quantity) OVER (PARTITION BY l_suppkey
        |                             ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
        |                             ROWS UNBOUNDED PRECEDING) AS running_qty
        |FROM lineitem""".stripMargin,
    "semi_anti" ->
      """SELECT c_custkey, CAST(1 AS BIGINT) AS has_orders FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT c_custkey, CAST(0 AS BIGINT) AS has_orders FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "set_ops" ->
      """(SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
        | INTERSECT
        | SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 0)
        |EXCEPT
        |SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'MACHINERY'""".stripMargin,
    "agg_order_stats" ->
      """SELECT o_orderstatus,
        |       COUNT(*) AS n_orders,
        |       COUNT(DISTINCT o_custkey) AS n_customers,
        |       MIN(o_totalprice) AS min_price,
        |       MAX(o_totalprice) AS max_price,
        |       MIN(o_orderdate) AS first_order,
        |       MAX(o_orderdate) AS last_order
        |FROM orders
        |GROUP BY o_orderstatus""".stripMargin,
    "distinct_pairs" ->
      "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
    "string_ops" ->
      """SELECT c_custkey, c_name,
        |       upper(c_name) AS name_upper,
        |       lower(c_name) AS name_lower,
        |       substr(c_name, 1, 8) AS name_prefix,
        |       CAST(length(c_name) AS INTEGER) AS name_len,
        |       regexp_extract(c_name, '([0-9]+)', 1) AS name_digits,
        |       regexp_replace(c_name, '[0-9]', '#', 'g') AS name_masked,
        |       concat_ws('/', c_mktsegment, c_name) AS seg_name,
        |       coalesce(nullif(c_mktsegment, 'MACHINERY'), 'OTHER') AS segment_or_other
        |FROM customer""".stripMargin,
    "date_ops" ->
      """SELECT o_orderkey, o_orderdate,
        |       CAST(year(o_orderdate) AS INTEGER) AS order_year,
        |       CAST(month(o_orderdate) AS INTEGER) AS order_month,
        |       CAST(day(o_orderdate) AS INTEGER) AS order_day,
        |       CAST(quarter(o_orderdate) AS INTEGER) AS order_quarter,
        |       CAST(date_part('dow', o_orderdate) + 1 AS INTEGER) AS order_dow,
        |       date_trunc('month', o_orderdate) AS month_start,
        |       CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS INTEGER) AS days_since_epoch
        |FROM orders""".stripMargin,
    "array_ops" ->
      """WITH l AS (
        |  SELECT user_id, list_sort(list(DISTINCT event_type)) AS event_types
        |  FROM events GROUP BY user_id
        |)
        |SELECT user_id,
        |       array_to_string(event_types, ',') AS event_types_csv,
        |       CAST(len(event_types) AS INTEGER) AS n_types,
        |       list_contains(event_types, 'purchase') AS has_purchase,
        |       event_types[1] AS first_type
        |FROM l""".stripMargin,
    "dense_ids" ->
      """SELECT doc_id, lang,
        |       row_number() OVER (ORDER BY doc_id) - 1 AS id
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "mad_outliers" ->
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med FROM events GROUP BY 1
        |), d AS (
        |  SELECT e.event_type, abs(e.value - m.med) AS dev
        |  FROM events e JOIN med m USING (event_type)
        |), md AS (
        |  SELECT event_type, quantile_cont(dev, 0.5) AS mad, COUNT(*) AS n_rows
        |  FROM d GROUP BY 1
        |)
        |SELECT d.event_type,
        |       CAST(MIN(md.n_rows) AS BIGINT) AS n_rows,
        |       MIN(med.med) AS med, MIN(md.mad) AS mad,
        |       CAST(COALESCE(SUM(CASE WHEN d.dev * 10000.0 > 44478.0 * md.mad THEN 1 END), 0)
        |            AS BIGINT) AS n_outliers
        |FROM d
        |JOIN md USING (event_type)
        |JOIN med USING (event_type)
        |GROUP BY d.event_type
        |ORDER BY d.event_type""".stripMargin,
    "winsorize" ->
      """WITH qs AS (
        |  SELECT l_returnflag,
        |         quantile_cont(l_extendedprice, 0.01) AS q01,
        |         quantile_cont(l_extendedprice, 0.99) AS q99
        |  FROM lineitem GROUP BY l_returnflag
        |)
        |SELECT l.l_returnflag,
        |       CAST(COUNT(*) AS BIGINT) AS n_rows,
        |       CAST(COALESCE(SUM(CASE WHEN l_extendedprice < q01 THEN 1 END), 0) AS BIGINT) AS n_floor,
        |       CAST(COALESCE(SUM(CASE WHEN l_extendedprice > q99 THEN 1 END), 0) AS BIGINT) AS n_ceil,
        |       MIN(q01) AS q01, MIN(q99) AS q99,
        |       CAST(SUM(CAST(least(greatest(l_extendedprice, q01), q99) AS DECIMAL(18,2)))
        |            AS DECIMAL(18,2)) AS winsorized_sum
        |FROM lineitem l JOIN qs USING (l_returnflag)
        |GROUP BY l.l_returnflag
        |ORDER BY l.l_returnflag""".stripMargin,
    "price_percentiles" ->
      """SELECT o_orderstatus,
        |       quantile_cont(o_totalprice, 0.5) AS median_price,
        |       quantile_cont(o_totalprice, 0.9) AS p90_price,
        |       MIN(o_totalprice) AS min_price
        |FROM orders
        |GROUP BY o_orderstatus""".stripMargin,
    // sketch gates: exact columns compare exactly; the Spark side computes
    // the accuracy boolean against its own exact aggregate, the oracle
    // emits literal true — a sketch accuracy failure = hash mismatch
    "approx_distinct" ->
      """SELECT l_returnflag,
        |       COUNT(DISTINCT l_orderkey) AS exact_orders,
        |       COUNT(DISTINCT l_partkey) AS exact_parts,
        |       true AS orders_within_5pct,
        |       true AS parts_within_5pct
        |FROM lineitem
        |GROUP BY l_returnflag""".stripMargin,
    "approx_quantiles" ->
      """SELECT o_orderstatus, COUNT(*) AS n_rows,
        |       true AS median_in_bounds,
        |       true AS p90_in_bounds
        |FROM orders
        |GROUP BY o_orderstatus""".stripMargin,
    "hll_sketches" ->
      """SELECT o_orderstatus,
        |       COUNT(DISTINCT o_custkey) AS exact_customers,
        |       true AS within_5pct
        |FROM orders GROUP BY o_orderstatus
        |UNION ALL
        |SELECT 'ALL', COUNT(DISTINCT o_custkey), true FROM orders""".stripMargin,
    "skew_report" ->
      """WITH k AS (
        |  SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id
        |)
        |SELECT CAST(length(bin(c)) - 1 AS INT) AS freq_mag,
        |       COUNT(*) AS n_keys,
        |       CAST(SUM(c) AS BIGINT) AS n_rows
        |FROM k GROUP BY 1""".stripMargin,
    "join_size_estimate" ->
      s"""WITH a AS (
         |  SELECT CAST(user_id AS VARCHAR) AS k FROM events
         |  WHERE event_type = 'click' AND user_id IS NOT NULL
         |), b AS (
         |  SELECT CAST(user_id AS VARCHAR) AS k FROM events
         |  WHERE event_type = 'purchase' AND user_id IS NOT NULL
         |), ca AS (
         |  SELECT r, bucket, COUNT(*) AS c_a FROM (
         |    SELECT rr.r, ${dH("concat(rr.r, ':', a.k)")} % 512 AS bucket
         |    FROM a, (SELECT unnest(range(0, 4)) AS r) rr
         |  ) t GROUP BY 1, 2
         |), cb AS (
         |  SELECT r, bucket, COUNT(*) AS c_b FROM (
         |    SELECT rr.r, ${dH("concat(rr.r, ':', b.k)")} % 512 AS bucket
         |    FROM b, (SELECT unnest(range(0, 4)) AS r) rr
         |  ) t GROUP BY 1, 2
         |), est AS (
         |  SELECT CAST(CASE WHEN COUNT(*) < 4 THEN 0 ELSE MIN(ip) END AS BIGINT) AS est_size FROM (
         |    SELECT ca.r, SUM(ca.c_a * cb.c_b) AS ip
         |    FROM ca JOIN cb ON ca.r = cb.r AND ca.bucket = cb.bucket
         |    GROUP BY ca.r) t
         |), ex AS (
         |  SELECT CAST(COALESCE(SUM(x.ca * y.cb), 0) AS BIGINT) AS exact_size FROM
         |    (SELECT k, COUNT(*) AS ca FROM a GROUP BY k) x
         |    JOIN (SELECT k, COUNT(*) AS cb FROM b GROUP BY k) y ON x.k = y.k
         |)
         |SELECT exact_size, est_size, est_size - exact_size AS err,
         |       CAST(CASE WHEN est_size >= exact_size THEN 1 ELSE 0 END AS INT) AS over_ok
         |FROM ex, est""".stripMargin,
    "join_advisor" ->
      s"""WITH a AS (
         |  SELECT CAST(user_id AS VARCHAR) AS k FROM events
         |  WHERE event_type = 'click' AND user_id IS NOT NULL
         |), b AS (
         |  SELECT CAST(user_id AS VARCHAR) AS k FROM events
         |  WHERE event_type = 'purchase' AND user_id IS NOT NULL
         |), sa AS (
         |  SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n_left,
         |         CAST(COALESCE(MAX(length(bin(c)) - 1), 0) AS INT) AS max_mag_left
         |  FROM (SELECT k, COUNT(*) AS c FROM a GROUP BY k)
         |), sb AS (
         |  SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n_right,
         |         CAST(COALESCE(MAX(length(bin(c)) - 1), 0) AS INT) AS max_mag_right
         |  FROM (SELECT k, COUNT(*) AS c FROM b GROUP BY k)
         |), ca AS (
         |  SELECT r, bucket, COUNT(*) AS c_a FROM (
         |    SELECT rr.r, ${dH("concat(rr.r, ':', a.k)")} % 512 AS bucket
         |    FROM a, (SELECT unnest(range(0, 4)) AS r) rr
         |  ) t GROUP BY 1, 2
         |), cb AS (
         |  SELECT r, bucket, COUNT(*) AS c_b FROM (
         |    SELECT rr.r, ${dH("concat(rr.r, ':', b.k)")} % 512 AS bucket
         |    FROM b, (SELECT unnest(range(0, 4)) AS r) rr
         |  ) t GROUP BY 1, 2
         |), est AS (
         |  SELECT CAST(CASE WHEN COUNT(*) < 4 THEN 0 ELSE MIN(ip) END AS BIGINT) AS est_size FROM (
         |    SELECT ca.r, SUM(ca.c_a * cb.c_b) AS ip
         |    FROM ca JOIN cb ON ca.r = cb.r AND ca.bucket = cb.bucket
         |    GROUP BY ca.r) t
         |)
         |SELECT n_left, n_right, est_size, max_mag_left, max_mag_right,
         |       n_left <= 100000 AS can_broadcast_left,
         |       n_right <= 100000 AS can_broadcast_right,
         |       est_size > 4 * (n_left + n_right) AS output_blowup,
         |       CASE WHEN n_right <= 100000 THEN 'broadcast_right'
         |            WHEN n_left <= 100000 THEN 'broadcast_left'
         |            WHEN max_mag_left >= 13 OR max_mag_right >= 13 THEN 'salted_join'
         |            ELSE 'shuffle_join' END AS strategy
         |FROM sa, sb, est""".stripMargin,
    "freq_itemsets" ->
      """WITH tx AS (
        |  SELECT DISTINCT l.l_orderkey AS b, CAST(p.p_brand AS VARCHAR) AS it
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE l.l_orderkey IS NOT NULL AND p.p_brand IS NOT NULL
        |), ms AS (
        |  SELECT CAST(CEIL(0.02 * CAST(COUNT(DISTINCT b) AS DOUBLE)) AS BIGINT) AS min_n FROM tx
        |), fi AS (
        |  SELECT it FROM tx GROUP BY it HAVING COUNT(*) >= (SELECT min_n FROM ms)
        |), pruned AS (
        |  SELECT tx.b, tx.it FROM tx JOIN fi USING (it)
        |), pairs AS (
        |  SELECT x.it AS item_a, y.it AS item_b, CAST(COUNT(*) AS BIGINT) AS pair_n
        |  FROM pruned x JOIN pruned y ON x.b = y.b AND x.it < y.it
        |  GROUP BY 1, 2 HAVING COUNT(*) >= (SELECT min_n FROM ms)
        |), nb AS (SELECT CAST(COUNT(DISTINCT b) AS BIGINT) AS n_baskets FROM tx)
        |SELECT item_a, item_b, pair_n,
        |       CAST(pair_n AS DOUBLE) / CAST(n_baskets AS DOUBLE) AS supp
        |FROM pairs, nb""".stripMargin,
    "assoc_rules" ->
      """WITH tx AS (
        |  SELECT DISTINCT l.l_orderkey AS b, CAST(p.p_brand AS VARCHAR) AS it
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE l.l_orderkey IS NOT NULL AND p.p_brand IS NOT NULL
        |), ms AS (
        |  SELECT CAST(CEIL(0.02 * CAST(COUNT(DISTINCT b) AS DOUBLE)) AS BIGINT) AS min_n FROM tx
        |), fi AS (
        |  SELECT it, CAST(COUNT(*) AS BIGINT) AS item_n FROM tx GROUP BY it HAVING COUNT(*) >= (SELECT min_n FROM ms)
        |), pruned AS (
        |  SELECT tx.b, tx.it FROM tx JOIN fi USING (it)
        |), pairs AS (
        |  SELECT x.it AS item_a, y.it AS item_b, CAST(COUNT(*) AS BIGINT) AS pair_n
        |  FROM pruned x JOIN pruned y ON x.b = y.b AND x.it < y.it
        |  GROUP BY 1, 2 HAVING COUNT(*) >= (SELECT min_n FROM ms)
        |), directed AS (
        |  SELECT item_a AS antecedent, item_b AS consequent, pair_n FROM pairs
        |  UNION ALL
        |  SELECT item_b AS antecedent, item_a AS consequent, pair_n FROM pairs
        |), nb AS (SELECT CAST(COUNT(DISTINCT b) AS BIGINT) AS n_baskets FROM tx)
        |SELECT d.antecedent, d.consequent, d.pair_n,
        |       fa.item_n AS n_ant, fc.item_n AS n_cons,
        |       CAST(d.pair_n AS DOUBLE) / CAST(fa.item_n AS DOUBLE) AS confidence,
        |       CAST(d.pair_n * n_baskets AS DOUBLE) / CAST(fa.item_n * fc.item_n AS DOUBLE) AS lift
        |FROM directed d
        |JOIN fi fa ON d.antecedent = fa.it
        |JOIN fi fc ON d.consequent = fc.it, nb""".stripMargin,
    "item_cooccurrence" ->
      """WITH tx AS (
        |  SELECT DISTINCT l.l_orderkey AS b, CAST(p.p_brand AS VARCHAR) AS it
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE l.l_orderkey IS NOT NULL AND p.p_brand IS NOT NULL
        |), ms AS (
        |  SELECT CAST(CEIL(0.001 * CAST(COUNT(DISTINCT b) AS DOUBLE)) AS BIGINT) AS min_n FROM tx
        |), fi AS (
        |  SELECT it, CAST(COUNT(*) AS BIGINT) AS item_n FROM tx GROUP BY it
        |  HAVING COUNT(*) >= (SELECT min_n FROM ms)
        |), pruned AS (
        |  SELECT tx.b, tx.it FROM tx JOIN fi USING (it)
        |), pairs AS (
        |  SELECT x.it AS item_a, y.it AS item_b, CAST(COUNT(*) AS BIGINT) AS pair_n
        |  FROM pruned x JOIN pruned y ON x.b = y.b AND x.it < y.it
        |  GROUP BY 1, 2
        |), directed AS (
        |  SELECT item_a AS item, item_b AS neighbor, pair_n FROM pairs
        |  UNION ALL
        |  SELECT item_b AS item, item_a AS neighbor, pair_n FROM pairs
        |), scored AS (
        |  SELECT d.item, d.neighbor, d.pair_n, fi1.item_n AS n_i, fi2.item_n AS n_j,
        |         CAST(d.pair_n AS DOUBLE) / SQRT(CAST(fi1.item_n * fi2.item_n AS DOUBLE)) AS cosine
        |  FROM directed d
        |  JOIN fi fi1 ON fi1.it = d.item
        |  JOIN fi fi2 ON fi2.it = d.neighbor
        |), rk AS (
        |  SELECT *, row_number() OVER (PARTITION BY item
        |                               ORDER BY cosine DESC, pair_n DESC, neighbor) AS rk
        |  FROM scored
        |)
        |SELECT item, neighbor, pair_n, n_i, n_j, cosine, CAST(rk AS INT) AS rk
        |FROM rk WHERE rk <= 5""".stripMargin,
    "event_trigrams" ->
      """WITH e AS (
        |  SELECT user_id, event_type AS t1, ts, event_id
        |  FROM events WHERE user_id IS NOT NULL
        |), t AS (
        |  SELECT t1,
        |         LEAD(t1, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t2,
        |         LEAD(t1, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t3
        |  FROM e
        |), c AS (
        |  SELECT t1, t2, t3, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM t WHERE t3 IS NOT NULL GROUP BY 1, 2, 3
        |), rk AS (
        |  SELECT *, row_number() OVER (ORDER BY n DESC, t1, t2, t3) AS rk FROM c
        |)
        |SELECT t1, t2, t3, n, CAST(rk AS INT) AS rk FROM rk WHERE rk <= 20""".stripMargin,
    "markov_transitions" ->
      """WITH e AS (
        |  SELECT user_id, event_type AS from_type, ts, event_id
        |  FROM events WHERE user_id IS NOT NULL
        |), t AS (
        |  SELECT from_type,
        |         LEAD(from_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM e
        |), c AS (
        |  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n_trans
        |  FROM t WHERE to_type IS NOT NULL GROUP BY 1, 2
        |), f AS (
        |  SELECT from_type, CAST(SUM(n_trans) AS BIGINT) AS n_from FROM c GROUP BY 1
        |)
        |SELECT c.from_type, c.to_type, c.n_trans, f.n_from,
        |       CAST(c.n_trans AS DOUBLE) / CAST(f.n_from AS DOUBLE) AS prob
        |FROM c JOIN f USING (from_type)""".stripMargin,
    "pareto_front" ->
      """WITH p AS (
        |  SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
        |  WHERE o_totalprice IS NOT NULL AND o_orderdate IS NOT NULL
        |)
        |SELECT a.o_orderkey, a.o_totalprice, a.o_orderdate FROM p a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM p b
        |  WHERE b.o_totalprice >= a.o_totalprice AND b.o_orderdate >= a.o_orderdate
        |    AND (b.o_totalprice > a.o_totalprice OR b.o_orderdate > a.o_orderdate))""".stripMargin,
    "incr_agg_merge" ->
      """SELECT user_id,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
        |       CAST(MIN(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS min_v,
        |       CAST(MAX(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_v
        |FROM events GROUP BY 1""".stripMargin,
    "dp_counts" ->
      """WITH g AS (
        |  SELECT COALESCE(CAST(event_type AS VARCHAR), '<NULL>') AS k,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1
        |), z AS (
        |  SELECT k,
        |         CAST(n + length(regexp_extract(md5('dp:a:' || k), '^0*'))
        |                - length(regexp_extract(md5('dp:b:' || k), '^0*')) AS BIGINT) AS noisy_n
        |  FROM g
        |)
        |SELECT k AS event_type, noisy_n,
        |       CAST(GREATEST(noisy_n, 0) AS BIGINT) AS released_n
        |FROM z""".stripMargin,
    "golden_record" ->
      """WITH w AS (
        |  SELECT user_id,
        |    CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_obs,
        |    MAX(ts) OVER (PARTITION BY user_id) AS last_ts,
        |    last_value(event_type IGNORE NULLS) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS event_type,
        |    last_value(value IGNORE NULLS) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS value,
        |    last_value(props IGNORE NULLS) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS props,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events
        |)
        |SELECT user_id, n_obs, last_ts, event_type, value, props
        |FROM w WHERE rn = 1""".stripMargin,
    "k_core" -> {
      val head =
        """WITH e0 AS (
          |  SELECT l_suppkey AS src, l_partkey + 1000000 AS dst FROM lineitem
          |), u0 AS (
          |  SELECT DISTINCT src, dst FROM (
          |    SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0
          |  ) WHERE src <> dst
          |), km AS (
          |  SELECT CAST(CEIL(MEDIAN(cnt)) AS BIGINT) AS min_deg
          |  FROM (SELECT COUNT(*) AS cnt FROM u0 GROUP BY src)
          |)""".stripMargin
      val steps = (1 to 2).map { r =>
        s""", a$r AS (
           |  SELECT src AS node FROM u${r - 1} GROUP BY src
           |  HAVING COUNT(*) >= (SELECT min_deg FROM km)
           |), u$r AS (
           |  SELECT u.src, u.dst FROM u${r - 1} u
           |  JOIN a$r x ON x.node = u.src
           |  JOIN a$r y ON y.node = u.dst
           |)""".stripMargin
      }.mkString
      head + steps +
        "\nSELECT src AS node, CAST(COUNT(*) AS BIGINT) AS core_degree FROM u2 GROUP BY src"
    },
    "cusum_drift" ->
      """WITH daily AS (
        |  SELECT event_type AS etype, date_trunc('day', ts) AS day,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2
        |), st AS (
        |  SELECT etype, CAST(COUNT(*) AS BIGINT) AS n_days,
        |         CAST(SUM(n) AS BIGINT) AS total
        |  FROM daily GROUP BY 1
        |), c AS (
        |  SELECT d.etype, d.day, d.n, s.n_days, s.total,
        |         CAST(SUM(d.n * s.n_days - s.total)
        |              OVER (PARTITION BY d.etype ORDER BY d.day) AS BIGINT) AS cusum_scaled
        |  FROM daily d JOIN st s USING (etype)
        |)
        |SELECT etype, day, n, n_days, total, cusum_scaled,
        |       abs(cusum_scaled) > 1 * total AS drift_flag
        |FROM c""".stripMargin,
    "series_correlation" ->
      """WITH daily AS (
        |  SELECT event_type AS etype, date_trunc('day', ts) AS day,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2
        |), days AS (SELECT DISTINCT day FROM daily),
        |types AS (SELECT DISTINCT etype FROM daily),
        |g AS (
        |  SELECT t.etype, dd.day, COALESCE(x.n, 0) AS n
        |  FROM types t CROSS JOIN days dd
        |  LEFT JOIN daily x ON x.etype = t.etype AND x.day = dd.day
        |), p AS (
        |  SELECT a.etype AS type_a, b.etype AS type_b,
        |         CAST(COUNT(*) AS BIGINT) AS n_days,
        |         CAST(SUM(a.n) AS BIGINT) AS sx,
        |         CAST(SUM(b.n) AS BIGINT) AS sy,
        |         CAST(SUM(a.n * b.n) AS BIGINT) AS sxy,
        |         CAST(SUM(a.n * a.n) AS BIGINT) AS sxx,
        |         CAST(SUM(b.n * b.n) AS BIGINT) AS syy
        |  FROM g a JOIN g b ON a.day = b.day AND a.etype < b.etype
        |  GROUP BY 1, 2
        |)
        |SELECT type_a, type_b, n_days,
        |       n_days * sxy - sx * sy AS corr_num,
        |       n_days * sxx - sx * sx AS var_a,
        |       n_days * syy - sy * sy AS var_b,
        |       CASE WHEN n_days * sxx - sx * sx > 0
        |             AND n_days * syy - sy * sy > 0 THEN
        |         round(CAST(n_days * sxy - sx * sy AS DOUBLE)
        |               / sqrt(CAST(n_days * sxx - sx * sx AS DOUBLE)
        |                      * CAST(n_days * syy - sy * sy AS DOUBLE)), 6)
        |       END AS pearson_r
        |FROM p ORDER BY 1, 2""".stripMargin,
    "trend_slope" ->
      """WITH daily AS (
        |  SELECT event_type AS etype, date_trunc('day', ts) AS day,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2
        |), dd AS (
        |  SELECT etype,
        |         CAST(date_diff('day', TIMESTAMP '1970-01-01', day) AS BIGINT) AS d, n
        |  FROM daily
        |), pairs AS (
        |  SELECT i.etype, j.n - i.n AS num, j.d - i.d AS den,
        |         CAST(FLOOR(CAST(j.n - i.n AS DOUBLE) * 1000000.0
        |              / CAST(j.d - i.d AS DOUBLE)) AS BIGINT) AS slope_micro
        |  FROM dd i JOIN dd j ON i.etype = j.etype AND i.d < j.d
        |), rk AS (
        |  SELECT *,
        |         row_number() OVER (PARTITION BY etype
        |                            ORDER BY slope_micro, num, den) AS rn,
        |         CAST(COUNT(*) OVER (PARTITION BY etype) AS BIGINT) AS n_pairs
        |  FROM pairs
        |), nd AS (
        |  SELECT etype, CAST(COUNT(*) AS BIGINT) AS n_days FROM daily GROUP BY 1
        |)
        |SELECT r.etype, nd.n_days, r.n_pairs, r.num AS med_num, r.den AS med_den,
        |       CAST(r.num AS DOUBLE) / CAST(r.den AS DOUBLE) AS slope
        |FROM rk r JOIN nd USING (etype)
        |WHERE rn = (n_pairs + 1) // 2""".stripMargin,
    "profile_diff" -> {
      val cols = Seq("o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
      def side(name: String, pred: String): String = {
        val perCol = cols.map { c =>
          s"""SELECT '$c' AS col_name,
             |       CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_n_$name,
             |       CAST(COUNT(DISTINCT $c) AS BIGINT) AS distinct_n_$name,
             |       CAST(MIN($c) AS VARCHAR) AS min_$name,
             |       CAST(MAX($c) AS VARCHAR) AS max_$name
             |FROM ${name}_slice""".stripMargin
        }.mkString("\n    UNION ALL\n    ")
        s"""${name}_slice AS (
           |  SELECT * FROM orders WHERE $pred
           |), n_$name AS (
           |  SELECT CAST(COUNT(*) AS BIGINT) AS n_$name FROM ${name}_slice
           |), p_$name AS (
           |    $perCol
           |)""".stripMargin
      }
      s"""WITH ${side("before", "o_orderdate < TIMESTAMP '1998-01-01'")},
         |${side("after", "o_orderdate >= TIMESTAMP '1998-01-01'")}
         |SELECT b.col_name, n_before, n_after,
         |       null_n_before, null_n_after,
         |       distinct_n_before, distinct_n_after,
         |       min_before, min_after, max_before, max_after,
         |       distinct_n_before <> distinct_n_after AS distinct_changed,
         |       NOT (min_before IS NOT DISTINCT FROM min_after
         |            AND max_before IS NOT DISTINCT FROM max_after) AS range_changed,
         |       null_n_after * n_before > null_n_before * n_after AS null_rate_up
         |FROM p_before b JOIN p_after a ON a.col_name = b.col_name, n_before, n_after""".stripMargin
    },
    "bpe_fertility" ->
      (dBpeCtes(3) + """,
        |dw AS (SELECT lang, unnest(string_split(text, ' ')) AS word
        |       FROM documents)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_words,
        |       CAST(SUM(len(string_split(trim(sp), ' '))) AS BIGINT) AS n_subwords,
        |       CAST(SUM(len(string_split(trim(sp), ' '))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS fertility
        |FROM dw JOIN v3 USING (word)
        |GROUP BY lang""".stripMargin),
    "label_agreement" ->
      s"""$dToksCte, sc AS (
         |  SELECT doc_id, lang,
         |    CAST(len(list_filter(toks, tk -> tk IN ('the', 'a', 'of', 'and', 'is'))) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS en_score,
         |    CAST(len(list_filter(toks, tk -> tk IN ('der', 'die', 'das', 'und', 'ist'))) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS de_score,
         |    CAST(len(list_filter(toks, tk -> tk IN ('el', 'la', 'de', 'y', 'es'))) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS es_score,
         |    CAST(len(list_filter(toks, tk -> tk IN ('le', 'la', 'de', 'et', 'les'))) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS fr_score
         |  FROM t
         |), p AS (
         |  SELECT *, CASE WHEN en_score >= de_score AND en_score >= es_score AND en_score >= fr_score THEN 'en'
         |                 WHEN de_score >= es_score AND de_score >= fr_score THEN 'de'
         |                 WHEN es_score >= fr_score THEN 'es'
         |                 ELSE 'fr' END AS predicted_lang
         |  FROM sc
         |), lab AS (
         |  SELECT CAST(lang AS VARCHAR) AS a, CAST(predicted_lang AS VARCHAR) AS b FROM p
         |  WHERE lang IS NOT NULL AND predicted_lang IS NOT NULL
         |), tot AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |         CAST(COUNT(CASE WHEN a = b THEN 1 END) AS BIGINT) AS n_agree
         |  FROM lab
         |), pe AS (
         |  SELECT CAST(COALESCE(SUM(x.na * y.nb), 0) AS BIGINT) AS pe_num FROM
         |    (SELECT a, COUNT(*) AS na FROM lab GROUP BY a) x
         |    JOIN (SELECT b, COUNT(*) AS nb FROM lab GROUP BY b) y ON x.a = y.b
         |)
         |SELECT n, n_agree, pe_num,
         |       n * n_agree - pe_num AS kappa_num,
         |       n * n - pe_num AS kappa_den,
         |       CASE WHEN n * n <> pe_num
         |            THEN CAST(n * n_agree - pe_num AS DOUBLE) / CAST(n * n - pe_num AS DOUBLE)
         |       END AS kappa
         |FROM tot, pe""".stripMargin,
    "salted_agg" ->
      """SELECT user_id, COUNT(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY user_id""".stripMargin,
    "peak_concurrency" ->
      """WITH o AS (
        |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS s,
        |         CAST(o_orderdate AS DATE)
        |           + CAST(o_orderkey % 14 + 1 AS INTEGER) AS e
        |  FROM orders
        |), pts AS (
        |  SELECT o_custkey, s AS d, 1 AS delta FROM o
        |  UNION ALL
        |  SELECT o_custkey, e AS d, -1 AS delta FROM o
        |), daily AS (
        |  SELECT o_custkey, d, CAST(SUM(delta) AS BIGINT) AS net
        |  FROM pts GROUP BY 1, 2
        |), run AS (
        |  SELECT *, SUM(net) OVER (PARTITION BY o_custkey ORDER BY d) AS open
        |  FROM daily
        |), pk AS (
        |  SELECT *, MAX(open) OVER (PARTITION BY o_custkey) AS peak_open
        |  FROM run
        |)
        |SELECT o_custkey, CAST(peak_open AS BIGINT) AS peak_open,
        |       CAST(MIN(d) AS TIMESTAMP) AS peak_date
        |FROM pk WHERE open = peak_open GROUP BY o_custkey, peak_open
        |HAVING peak_open >= 2 ORDER BY o_custkey""".stripMargin,
    "interval_join_pairs" ->
      """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
        |       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        |FROM events c JOIN events p
        |  ON c.user_id = p.user_id
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 6 HOUR
        |ORDER BY click_id, purchase_id""".stripMargin,
    "asof_join_fwd" ->
      """WITH snaps AS (
        |  SELECT user_id, ts AS snap_ts, value AS snap_value FROM (
        |    SELECT user_id, ts, value,
        |           row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
        |                              ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events) t
        |  WHERE rn = 1
        |), j AS (
        |  SELECT e.event_id, e.user_id, e.ts, MIN(s.snap_ts) AS m
        |  FROM events e LEFT JOIN snaps s
        |    ON s.user_id = e.user_id AND s.snap_ts >= e.ts
        |   AND epoch_us(s.snap_ts) - epoch_us(e.ts) <= 86400000000
        |  GROUP BY e.event_id, e.user_id, e.ts
        |)
        |SELECT j.event_id, j.user_id, j.ts,
        |       s.snap_ts AS asof_snap_ts, s.snap_value AS asof_snap_value
        |FROM j LEFT JOIN snaps s
        |  ON s.user_id = j.user_id AND s.snap_ts = j.m""".stripMargin,
    "asof_join" ->
      """WITH snaps AS (
        |  SELECT user_id, ts AS snap_ts, value AS snap_value FROM (
        |    SELECT user_id, ts, value,
        |           row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
        |                              ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events) t
        |  WHERE rn = 1
        |)
        |SELECT e.event_id, e.user_id, e.ts,
        |       s.snap_ts AS asof_snap_ts, s.snap_value AS asof_snap_value
        |FROM events e
        |ASOF LEFT JOIN snaps s ON e.user_id = s.user_id AND e.ts >= s.snap_ts""".stripMargin,
    "pipeline_full" ->
      """WITH g AS (
        |  SELECT event_id, user_id, ts, event_type, value, props,
        |         lag(ts) OVER w AS prev_ts,
        |         lag(event_type) OVER w AS prev_type,
        |         last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS UNBOUNDED PRECEDING) AS last_purchase_value
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL
        |                      OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
        |                 THEN 1 ELSE 0 END AS session_start
        |  FROM g
        |), x AS (
        |  SELECT *, SUM(session_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                                     ROWS UNBOUNDED PRECEDING) AS seq
        |  FROM s
        |), u AS (
        |  SELECT *,
        |         CASE WHEN user_id % 6 = 0 THEN 'Mozilla/5.0 (Windows NT 10.0; Win64; x64)'
        |              WHEN user_id % 6 = 1 THEN 'Mozilla/5.0 (Linux; android 13; Pixel 7)'
        |              WHEN user_id % 6 = 2 THEN 'Mozilla/5.0 (iPhone; CPU iPhone OS 16_0)'
        |              WHEN user_id % 6 = 3 THEN 'Mozilla/5.0 (iPad; CPU OS 16_0)'
        |              WHEN user_id % 6 = 4 THEN 'Mozilla/5.0 (Macintosh; Intel Mac OS X 13_0)'
        |              ELSE 'curl/8.0' END AS ua
        |  FROM x
        |)
        |SELECT event_id, user_id, ts, event_type, value,
        |       CASE WHEN ua LIKE '%Windows%' THEN 'Windows PC'
        |            WHEN ua LIKE '%android%' THEN 'Android'
        |            WHEN ua LIKE '%iPhone%' THEN 'iPhone'
        |            WHEN ua LIKE '%iPad%' THEN 'iPad'
        |            WHEN ua LIKE '%Mac%' THEN 'iMac'
        |            ELSE 'Others' END AS device,
        |       CASE WHEN (CASE WHEN event_type IN ('click','view') THEN 'MOBILE'
        |                       ELSE upper(event_type) END) = 'MOBILE'
        |            THEN 'MOBILE' ELSE 'WEB' END AS platform,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |       CAST(user_id AS VARCHAR) || '-' || CAST(seq AS VARCHAR) AS session_id,
        |       CAST(session_start AS BIGINT) AS session_start,
        |       CAST(CASE WHEN prev_type IS NOT NULL AND event_type <> prev_type
        |                 THEN 1 ELSE 0 END AS BIGINT) AS event_type_changed,
        |       last_purchase_value
        |FROM u""".stripMargin,
    "tumbling_counts" ->
      """SELECT date_trunc('hour', ts) AS bucket_start, event_type,
        |       COUNT(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2""".stripMargin,
    "session_window" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events
        |), s AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL
        |                      OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
        |                 THEN 1 ELSE 0 END AS st
        |  FROM g
        |), x AS (
        |  SELECT *, SUM(st) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                          ROWS UNBOUNDED PRECEDING) AS seq
        |  FROM s
        |)
        |SELECT user_id, MIN(ts) AS s_start,
        |       MAX(ts) + INTERVAL 30 MINUTE AS s_end,
        |       COUNT(*) AS n_events
        |FROM x
        |GROUP BY user_id, seq""".stripMargin,
    "plan_lint" ->
      """SELECT * FROM (VALUES
        |  ('bad', 'cartesian_join', 1), ('bad', 'single_partition_window', 1),
        |  ('bad', 'global_sort', 1), ('bad', 'scala_udf', 0),
        |  ('clean', 'cartesian_join', 0), ('clean', 'single_partition_window', 0),
        |  ('clean', 'global_sort', 0), ('clean', 'scala_udf', 0))
        |AS t(plan_label, rule, hits)""".stripMargin,
    "rate_limit" ->
      """SELECT event_id, user_id, ts,
        |       ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', ts)
        |                          ORDER BY ts, event_id) <= 3 AS admitted
        |FROM events""".stripMargin,
    "replica_diff" ->
      """SELECT c_custkey, 'removed' AS change_type
        |FROM customer WHERE c_custkey % 101 = 0
        |UNION ALL
        |SELECT c_custkey, 'changed' AS change_type
        |FROM customer WHERE c_custkey % 97 = 0 AND c_custkey % 101 <> 0""".stripMargin,
    "session_window_dynamic" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id,
        |         ts + CASE WHEN event_type = 'purchase' THEN INTERVAL 60 MINUTE
        |                   ELSE INTERVAL 20 MINUTE END AS win_end
        |  FROM events
        |), m AS (
        |  SELECT *, MAX(win_end) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
        |  FROM e
        |), s AS (
        |  SELECT *, CASE WHEN prev_end IS NULL OR ts > prev_end
        |                 THEN 1 ELSE 0 END AS st
        |  FROM m
        |), x AS (
        |  SELECT *, SUM(st) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                          ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM s
        |)
        |SELECT user_id, MIN(ts) AS s_start, MAX(win_end) AS s_end,
        |       COUNT(*) AS n_events
        |FROM x GROUP BY user_id, sid""".stripMargin,
    "q4_late_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY 1""".stripMargin,
    "q6_forecast" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |                * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.03 AND l_discount <= 0.05
        |  AND l_quantity < 24""".stripMargin,
    "q7_nation_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |       CAST(year(l_shipdate) AS INTEGER) AS l_year,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |                * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
        |            AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        |GROUP BY 1, 2, 3""".stripMargin,
    "q10_returned" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |                * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
        |            AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |GROUP BY 1, 2, 3, 4
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,
    "q14_promo_share" ->
      """WITH a AS (
        |  SELECT CAST(SUM(CASE WHEN p_type = 'ECONOMY'
        |                       THEN CAST(l_extendedprice AS DECIMAL(12,2))
        |                            * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
        |                  END) AS DOUBLE) AS promo_revenue,
        |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |                  * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
        |              AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |)
        |SELECT promo_revenue, total_revenue,
        |       promo_revenue * 100.0 / total_revenue AS promo_share
        |FROM a""".stripMargin,
    "q19_bracket_join" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |                * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
        |            AS DOUBLE) AS revenue,
        |       COUNT(*) AS n_items
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity >= 1 AND l_quantity <= 11)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity >= 10 AND l_quantity <= 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 25
        |       AND l_quantity >= 20 AND l_quantity <= 30)""".stripMargin,
    "explode_tokens" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents WHERE doc_id % 10 = 0
        |)
        |SELECT doc_id, CAST(u.i - 1 AS INTEGER) AS pos,
        |       toks[CAST(u.i AS INTEGER)] AS token
        |FROM t, UNNEST(generate_series(1, len(toks))) AS u(i)""".stripMargin,
    "math_ops" ->
      """SELECT o_orderkey,
        |       abs(o_totalprice - 150000.0) AS abs_delta,
        |       CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
        |       CAST(ceil(o_totalprice) AS BIGINT) AS price_ceil,
        |       CAST(sign(o_totalprice - 150000.0) AS INTEGER) AS delta_sign,
        |       sqrt(o_totalprice) AS price_sqrt,
        |       o_orderkey % 7 AS key_mod7,
        |       o_orderkey // 1000 AS key_div1k,
        |       least(o_totalprice, 100000.0) AS capped,
        |       greatest(o_totalprice, 100000.0) AS floored
        |FROM orders""".stripMargin,
    "window_frames" ->
      """WITH o AS (SELECT *, epoch_us(o_orderdate) AS t_us FROM orders)
        |SELECT o_custkey, o_orderkey, o_orderdate,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
        |              OVER (PARTITION BY o_custkey ORDER BY t_us
        |                    RANGE BETWEEN 2592000000000 PRECEDING AND CURRENT ROW)
        |            AS DOUBLE) AS trailing_30d_spend,
        |       CAST(ntile(4) OVER wp AS INTEGER) AS price_quartile,
        |       percent_rank() OVER wp AS price_pct_rank,
        |       cume_dist() OVER wp AS price_cume_dist,
        |       first_value(o_orderkey) OVER wp AS top_order
        |FROM o
        |WINDOW wp AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)""".stripMargin,
    "unpivot_metrics" ->
      """WITH s AS (
        |  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
        |  FROM lineitem
        |)
        |UNPIVOT s ON l_quantity, l_extendedprice, l_discount
        |INTO NAME metric VALUE value""".stripMargin,
    "histogram_prices" ->
      """WITH b AS (
        |  SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders
        |)
        |SELECT CAST(least(floor((o_totalprice - lo) / (hi - lo) * 10.0), 9.0) AS BIGINT) AS bucket,
        |       COUNT(*) AS n_orders
        |FROM orders, b
        |GROUP BY 1""".stripMargin,
    "map_ops" ->
      """SELECT user_id,
        |       CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 END), 0) AS BIGINT) AS n_purchase,
        |       CAST(COALESCE(SUM(CASE WHEN event_type = 'click' THEN 1 END), 0) AS BIGINT) AS n_click,
        |       CAST(COUNT(DISTINCT event_type) AS INTEGER) AS n_types
        |FROM events
        |GROUP BY user_id""".stripMargin,
    "sample_hash" ->
      s"""SELECT event_id, ts, user_id, event_type, value, props
         |FROM events
         |WHERE ${dH("CAST(event_id AS VARCHAR)")} % 100 < 10""".stripMargin,
    "weighted_sample" ->
      s"""WITH s AS (
         |  SELECT doc_id AS key, CAST(n_chars AS DOUBLE) AS weight,
         |         CAST(n_chars AS DOUBLE)
         |           / ((CAST(${dH("concat('ps:', CAST(doc_id AS VARCHAR))")} AS DOUBLE) + 1.0)
         |              / 1152921504606846976.0) AS q
         |  FROM documents
         |), t AS (
         |  SELECT * FROM s ORDER BY q DESC, key DESC LIMIT 101
         |), th AS (
         |  SELECT MIN(q) AS tau, COUNT(*) AS n_top FROM t
         |)
         |SELECT key, weight,
         |       CASE WHEN n_top <= 100 THEN weight ELSE greatest(weight, tau) END AS w_hat
         |FROM t, th
         |WHERE n_top <= 100 OR q > tau
         |ORDER BY key""".stripMargin,
    "sample_stratified" ->
      s"""WITH r AS (
         |  SELECT doc_id, lang, source,
         |         row_number() OVER (PARTITION BY lang
         |                            ORDER BY ${dH("CAST(doc_id AS VARCHAR)")} % 4503599627370496, doc_id) AS rk
         |  FROM documents
         |)
         |SELECT doc_id, lang, source FROM r WHERE rk <= 20""".stripMargin,
    "date_format_ops" ->
      """SELECT o_orderkey,
        |       strftime(o_orderdate, '%Y-%m') AS ym,
        |       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS full_ts,
        |       strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d') AS parsed_day,
        |       CAST(strftime(o_orderdate, '%j') AS INTEGER) AS day_of_year
        |FROM orders""".stripMargin,
    "resample_fill" ->
      """WITH h AS (
        |  SELECT date_trunc('hour', ts) AS b, event_type, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2
        |), bounds AS (
        |  SELECT event_type AS et, min(b) AS lo, max(b) AS hi FROM h GROUP BY 1
        |), axis AS (
        |  SELECT et, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
        |  FROM bounds
        |)
        |SELECT axis.et AS event_type, axis.bucket,
        |       CAST(COALESCE(h.n, 0) AS BIGINT) AS n_events
        |FROM axis LEFT JOIN h ON h.event_type = axis.et AND h.b = axis.bucket""".stripMargin,
    "explode_outer" ->
      """WITH t AS (
        |  SELECT o_orderkey,
        |         list_filter([1, 2, 3], x -> x <= o_orderkey % 3) AS arr
        |  FROM orders
        |)
        |SELECT o_orderkey,
        |       CAST(CASE WHEN len(arr) = 0 THEN NULL ELSE u.i - 1 END AS INTEGER) AS pos,
        |       CAST(CASE WHEN len(arr) = 0 THEN NULL
        |                 ELSE arr[CAST(u.i AS INTEGER)] END AS BIGINT) AS elem
        |FROM t, UNNEST(generate_series(1, greatest(len(arr), 1))) AS u(i)""".stripMargin,
    "q8_market_share" ->
      """WITH v AS (
        |  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |         CAST(l_extendedprice AS DECIMAL(12,2))
        |           * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) AS vol,
        |         n2.n_name AS supp_nation
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey
        |  WHERE r_name = 'ASIA'
        |), a AS (
        |  SELECT o_year,
        |         CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN vol END) AS DOUBLE) AS nation_volume,
        |         CAST(SUM(vol) AS DOUBLE) AS total_volume
        |  FROM v GROUP BY 1
        |)
        |SELECT o_year, COALESCE(nation_volume, 0.0) AS nation_volume, total_volume,
        |       COALESCE(nation_volume, 0.0) / total_volume AS mkt_share
        |FROM a""".stripMargin,
    "q17_small_qty" ->
      """WITH t AS (
        |  SELECT l_partkey AS t_partkey, AVG(l_quantity) * 0.2 AS qty_thresh
        |  FROM lineitem GROUP BY 1
        |)
        |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly,
        |       COUNT(*) AS n_items
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN t ON l_partkey = t_partkey
        |WHERE p_brand = 'Brand#1' AND l_quantity < qty_thresh""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |                  * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
        |              AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY 1
        |)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)""".stripMargin,
    "q12_late_lines" ->
      """SELECT l_linestatus,
        |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
        |GROUP BY 1""".stripMargin,
    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, SUM(l_quantity) AS total_qty
        |  FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > 150.0
        |)
        |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
        |FROM orders
        |JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin,
    "q21_waiting_supplier" ->
      // deliberately the textbook EXISTS / NOT-EXISTS formulation: the gate
      // then proves the Spark side's one-pass decorrelation equivalent
      """WITH f AS (
        |  SELECT l_orderkey, l_suppkey,
        |         (l_shipdate >= o_orderdate + INTERVAL 30 DAY) AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'
        |)
        |SELECT s_name, COUNT(*) AS numwait
        |FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM f WHERE late) l1
        |JOIN supplier ON l1.l_suppkey = s_suppkey
        |WHERE EXISTS (SELECT 1 FROM f l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM f l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 20""".stripMargin,
    "q22_global_sales" ->
      """WITH cust AS (
        |  SELECT right(c_name, 2) AS cntrycode, c_custkey, c_acctbal
        |  FROM customer
        |  WHERE right(c_name, 2) IN ('13', '31', '23', '29', '30', '18', '17')
        |), bal AS (
        |  SELECT SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS sum_bal, COUNT(*) AS n_bal
        |  FROM cust WHERE c_acctbal > 0.0
        |)
        |SELECT cntrycode, COUNT(*) AS numcust,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
        |FROM cust, bal
        |WHERE CAST(c_acctbal AS DECIMAL(12,2)) * n_bal > sum_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
        |GROUP BY cntrycode""".stripMargin,
    // the oracle keeps the textbook CORRELATED scalar-min subquery; the
    // Spark side is the decorrelated per-part aggregate — the gate proves
    // the decorrelation equivalent, not just self-consistent
    "q2_min_cost_supp" ->
      """WITH eur AS (
        |  SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'
        |), o AS (
        |  SELECT p_partkey, p_name, s_name, s_acctbal, n_name,
        |         l_extendedprice AS cost
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN eur ON l_suppkey = s_suppkey
        |  WHERE p_type = 'SMALL'
        |)
        |SELECT DISTINCT p_partkey, p_name, s_name, s_acctbal, n_name,
        |       cost AS min_cost
        |FROM o o1
        |WHERE cost = (SELECT MIN(cost) FROM o o2 WHERE o2.p_partkey = o1.p_partkey)
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,
    "q20_excess_shippers" ->
      """SELECT s_name, s_acctbal
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'EUROPE' AND s_suppkey IN (
        |  SELECT l_suppkey
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE '%bolt'
        |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  GROUP BY l_suppkey, l_partkey
        |  HAVING SUM(l_quantity) > 40.0)
        |ORDER BY s_name""".stripMargin,
    "q9_product_profit" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |                  * (1 - CAST(l_discount AS DECIMAL(12,2)))
        |                - CAST(p_retailprice AS DECIMAL(12,2))
        |                  * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE 'red%'
        |GROUP BY 1, 2
        |ORDER BY nation, o_year DESC""".stripMargin,
    "q11_important_parts" ->
      """WITH pv AS (
        |  SELECT l_partkey,
        |         SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |             * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS val
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'
        |  GROUP BY 1
        |), t AS (
        |  SELECT SUM(val) AS total, COUNT(*) AS n FROM pv
        |)
        |SELECT l_partkey, CAST(val AS DOUBLE) AS part_value
        |FROM pv, t
        |WHERE CAST(val AS DECIMAL(25,4)) * CAST(n * 2 AS DECIMAL(11,0))
        |      > CAST(total AS DECIMAL(27,4)) * CAST(3 AS DECIMAL(1,0))
        |ORDER BY part_value DESC, l_partkey""".stripMargin,
    "q16_supplier_counts" ->
      """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'MEDIUM%'
        |  AND p_size IN (1, 5, 9, 12, 15, 20, 25, 30)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7')
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "sliding_window" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE)
        |         / COUNT(*) OVER w AS sliding_avg_price,
        |       COUNT(*) OVER w AS n_in_frame
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)""".stripMargin,
    "nulls_order" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |       CAST(rank() OVER wp AS INTEGER) AS price_rank,
        |       CAST(dense_rank() OVER wp AS INTEGER) AS price_dense_rank,
        |       lag(o_totalprice) OVER wp AS next_higher_price,
        |       lead(o_totalprice) OVER wp AS next_lower_price
        |FROM orders
        |WINDOW wp AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY next_higher_price ASC NULLS FIRST, o_custkey, o_orderkey
        |LIMIT 30""".stripMargin,
    "embed_quantize" ->
      """WITH m AS (
        |  SELECT vec_id, embedding,
        |         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
        |  FROM embeddings
        |)
        |SELECT vec_id, mx AS scale_max,
        |       CASE WHEN mx > 0 THEN array_to_string(list_transform(embedding,
        |         x -> CAST(CAST(round(CAST(x AS DOUBLE) / mx * 127.0) AS INTEGER) AS VARCHAR)), ',') END AS q8_csv,
        |       CASE WHEN mx > 0
        |         THEN CAST(round(CAST(embedding[1] AS DOUBLE) / mx * 127.0) AS INTEGER) END AS q8_first
        |FROM m""".stripMargin,
    "pipeline_curate" ->
      s"""$dToksCte, scored AS (
         |  SELECT doc_id,
         |         0.5 * least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0)
         |          + 0.25 * (CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE))
         |          + 0.25 * (CAST(len(list_filter(toks, tk -> tk IN ('the', 'a'))) AS DOUBLE) / CAST(len(toks) AS DOUBLE))
         |          AS q
         |  FROM t
         |), good AS (
         |  SELECT d.* FROM documents d JOIN scored USING (doc_id) WHERE q >= 0.5
         |), k AS (
         |  SELECT MIN(doc_id) AS keeper FROM good GROUP BY ${dH("text")}
         |), uniq AS (
         |  SELECT * FROM good WHERE doc_id IN (SELECT keeper FROM k)
         |), r AS (
         |  SELECT doc_id, lang, source, n_chars,
         |         row_number() OVER (PARTITION BY lang
         |                            ORDER BY ${dH("CAST(doc_id AS VARCHAR)")} % 4503599627370496, doc_id) AS rk
         |  FROM uniq
         |)
         |SELECT doc_id, lang, source, n_chars FROM r WHERE rk <= 10""".stripMargin,
    "pipeline_curate2" ->
      s"""$dToksCte, b AS (
         |  SELECT doc_id,
         |         CASE WHEN len(toks) >= 2
         |          THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1])
         |          ELSE CAST([] AS VARCHAR[]) END AS bg
         |  FROM t
         |), nonrep AS (
         |  SELECT doc_id FROM b
         |  WHERE NOT (len(bg) > 0 AND
         |    1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / CAST(len(bg) AS DOUBLE) > 0.05)
         |), s AS (
         |  SELECT doc_id, $dSh AS sh FROM t
         |), e AS (
         |  SELECT doc_id, unnest(list_transform(sh, s2 -> ${dH("s2")})) AS h FROM s
         |), bench AS (
         |  SELECT DISTINCT h FROM e WHERE doc_id % 50 = 0
         |), shared AS (
         |  SELECT e.doc_id, COUNT(*) AS n_shared
         |  FROM e JOIN bench USING (h)
         |  WHERE e.doc_id % 50 <> 0
         |  GROUP BY 1
         |), clean AS (
         |  SELECT d.doc_id FROM documents d LEFT JOIN shared USING (doc_id)
         |  WHERE d.doc_id % 50 <> 0 AND COALESCE(n_shared, 0) < 3
         |), surv AS (
         |  SELECT d.* FROM documents d
         |  JOIN nonrep USING (doc_id) JOIN clean USING (doc_id)
         |  WHERE d.doc_id % 50 <> 0
         |), k AS (
         |  SELECT MIN(doc_id) AS keeper FROM surv GROUP BY ${dH("text")}
         |), uniq AS (
         |  SELECT * FROM surv WHERE doc_id IN (SELECT keeper FROM k)
         |), samp AS (
         |  SELECT * FROM uniq
         |  WHERE ${dH("CAST(doc_id AS VARCHAR)")} % 100
         |        < ${Sampling.sourceRateSql}
         |)
         |SELECT source, lang, COUNT(*) AS n_docs,
         |       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
         |FROM samp GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "pipeline_curate4" ->
      // synthesis -> extraction -> redaction -> mask-ratio floor ->
      // per-lang rollup, every stage the same SQL the standalone
      // html_extract / keyword_redact oracles run
      """WITH h AS (
        |  SELECT doc_id,
        |    '<html><head><title>Doc ' || doc_id || ' &amp; friends</title>'
        |    || '<style>body { color: #000; }</style>'
        |    || '<script>var d = ' || doc_id || '; if (d > 0) { d = d - 1; }</script>'
        |    || '</head><body><nav><a href="/">home</a> | <a href="/about">about</a></nav>'
        |    || '<h1>Doc ' || doc_id || '</h1><p>' || text
        |    || '</p><a href="/doc/' || doc_id || '">permalink</a>'
        |    || '<footer>&copy; corpus</footer></body></html>' AS html
        |  FROM documents WHERE text IS NOT NULL
        |), x AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(
        |      replace(replace(replace(
        |        regexp_replace(
        |          regexp_replace(
        |            regexp_replace(html, '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
        |            '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
        |          '<[^>]*>', ' ', 'g'),
        |        '&amp;', '&'), '&copy;', '(c)'), '&nbsp;', ' '),
        |      '[ \t\r\n]+', ' ', 'g')) AS t
        |  FROM h
        |), pats AS (
        |  SELECT * FROM (VALUES ('table'), ('fast merge'), ('scan slow'),
        |                        ('spark'), ('agg'), ('agg row'),
        |                        ('value table'), ('a a')) p(pattern)
        |), st AS (
        |  SELECT x.doc_id, CAST(u.s AS INTEGER) AS s, len(p.pattern) AS lp
        |  FROM x CROSS JOIN pats p
        |  CROSS JOIN UNNEST(list_filter(range(1, len(x.t) - len(p.pattern) + 2),
        |    i -> substr(x.t, CAST(i AS INTEGER), len(p.pattern)) = p.pattern)) AS u(s)
        |), cov AS (
        |  SELECT DISTINCT doc_id, s + CAST(r.o AS INTEGER) AS pos
        |  FROM st CROSS JOIN UNNEST(range(0, lp)) AS r(o)
        |), chars AS (
        |  SELECT x.doc_id, CAST(g.i AS INTEGER) AS pos,
        |         substr(x.t, CAST(g.i AS INTEGER), 1) AS ch
        |  FROM x CROSS JOIN UNNEST(range(1, len(x.t) + 1)) AS g(i)
        |), red0 AS (
        |  SELECT c.doc_id,
        |         string_agg(CASE WHEN cov.pos IS NOT NULL THEN '*' ELSE c.ch END,
        |                    '' ORDER BY c.pos) AS r
        |  FROM chars c
        |  LEFT JOIN cov ON cov.doc_id = c.doc_id AND cov.pos = c.pos
        |  GROUP BY c.doc_id
        |), red AS (
        |  SELECT x.doc_id, COALESCE(red0.r, '') AS r,
        |         CAST(len(COALESCE(red0.r, ''))
        |              - len(replace(COALESCE(red0.r, ''), '*', '')) AS BIGINT)
        |           AS n_masked
        |  FROM x LEFT JOIN red0 USING (doc_id)
        |)
        |SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(red.n_masked) AS BIGINT) AS total_masked,
        |       CAST(SUM(len(red.r)) AS BIGINT) AS total_chars
        |FROM red JOIN documents d ON d.doc_id = red.doc_id
        |WHERE red.n_masked * 5 < len(red.r)
        |GROUP BY d.lang ORDER BY d.lang""".stripMargin,
    "pipeline_curate3" ->
      s"""$dUnitCte, c AS (
         |  SELECT vec_id AS cent_id, unit AS cent_unit FROM u
         |  WHERE unit IS NOT NULL ORDER BY vec_id LIMIT 16
         |), s0 AS (
         |  SELECT u.vec_id, u.unit, c.cent_id,
         |         round(${dUnitDot("u.unit", "c.cent_unit")}, 6) AS cent_sim
         |  FROM u CROSS JOIN c WHERE u.unit IS NOT NULL
         |), r0 AS (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id
         |                               ORDER BY cent_sim DESC, cent_id) AS rn
         |  FROM s0
         |), assign AS (
         |  SELECT vec_id, unit, cent_id AS cell FROM r0 WHERE rn = 1
         |), p AS (
         |  SELECT lb.vec_id AS vec_id,
         |         round(${dUnitDot("la.unit", "lb.unit")}, 6) AS sim
         |  FROM assign la JOIN assign lb
         |    ON la.cell = lb.cell AND la.vec_id < lb.vec_id
         |), vkeep AS (
         |  SELECT u.vec_id AS doc_id FROM u
         |  LEFT JOIN (SELECT DISTINCT vec_id FROM p WHERE sim >= 0.4) dd USING (vec_id)
         |  WHERE dd.vec_id IS NULL
         |), t AS (
         |  SELECT doc_id, lang, text, string_split(text, ' ') AS toks FROM documents
         |), qual AS (
         |  SELECT doc_id FROM t
         |  WHERE 0.5 * least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0)
         |      + 0.25 * (CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE))
         |      + 0.25 * (CAST(len(list_filter(toks, tk -> tk IN ('the', 'a'))) AS DOUBLE) / CAST(len(toks) AS DOUBLE))
         |      >= 0.5
         |), k AS (
         |  SELECT MIN(doc_id) AS keeper FROM documents GROUP BY ${dH("text")}
         |), surv AS (
         |  SELECT d2.* FROM documents d2
         |  JOIN vkeep USING (doc_id) JOIN qual USING (doc_id)
         |  WHERE d2.doc_id IN (SELECT keeper FROM k)
         |)
         |SELECT lang, COUNT(*) AS n_docs,
         |       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
         |FROM surv GROUP BY 1 ORDER BY 1""".stripMargin,
    "q13_custdist" ->
      """WITH c AS (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY 1
        |)
        |SELECT c_count, COUNT(*) AS custdist FROM c GROUP BY 1""".stripMargin,
    "argmax_order" ->
      """SELECT o_orderstatus, o_orderkey AS top_orderkey, o_totalprice AS top_price
        |FROM (
        |  SELECT o_orderstatus, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_orderstatus
        |                            ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
        |  FROM orders) t
        |WHERE rn = 1""".stripMargin,
    "outer_join_balance" ->
      """WITH neg AS (
        |  SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal < 0
        |), big AS (
        |  SELECT o_custkey, COUNT(*) AS n_big_orders
        |  FROM orders WHERE o_totalprice > 300000 GROUP BY 1
        |)
        |SELECT COALESCE(c_custkey, o_custkey) AS custkey, c_acctbal, n_big_orders
        |FROM neg FULL OUTER JOIN big ON c_custkey = o_custkey""".stripMargin,
    "fuzzy_name_pairs" ->
      """SELECT a.c_custkey, a.c_name, b.c_name AS next_name,
        |       CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS edit_dist
        |FROM customer a JOIN customer b ON b.c_custkey = a.c_custkey + 1""".stripMargin,
    "stats_moments" ->
      """WITH a AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |         SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sq,
        |         SUM(CAST(l_discount AS DECIMAL(12,2))) AS sd,
        |         SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS sqq,
        |         SUM(CAST(l_discount AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS sdd,
        |         SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS sqd
        |  FROM lineitem GROUP BY 1
        |), b AS (
        |  SELECT l_returnflag, n,
        |         CAST(sq AS DOUBLE) / n AS mean_qty,
        |         (CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE) / n) / (n - 1) AS var_qty,
        |         (n * CAST(sqd AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sd AS DOUBLE))
        |           / (sqrt(n * CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
        |              * sqrt(n * CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))) AS corr_qty_discount
        |  FROM a
        |)
        |SELECT l_returnflag, n, mean_qty, var_qty,
        |       sqrt(var_qty) AS stddev_qty, corr_qty_discount
        |FROM b""".stripMargin,
    "bool_aggs" ->
      """SELECT o_orderstatus,
        |       bool_or(o_totalprice > 400000.0) AS any_big,
        |       bool_and(o_totalprice > 0.0) AS all_positive,
        |       CAST(COALESCE(SUM(CASE WHEN o_totalprice > 400000.0 THEN 1 END), 0) AS BIGINT) AS n_big
        |FROM orders
        |GROUP BY 1""".stripMargin,
    "union_by_name" ->
      """SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_orderpriority
        |FROM orders WHERE o_totalprice > 400000.0
        |UNION ALL
        |SELECT o_orderkey, CAST(NULL AS DOUBLE), o_orderpriority
        |FROM orders WHERE o_orderpriority = '1-URGENT'""".stripMargin,
    "string_ops2" ->
      """SELECT c_custkey, c_name,
        |       split_part(c_name, '#', 2) AS name_num,
        |       lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
        |       rpad(c_mktsegment, 12, '.') AS seg_padded,
        |       translate(c_name, '#', '-') AS name_dashed,
        |       regexp_matches(c_name, '[02468]$') AS ends_even,
        |       reverse(c_name) AS name_rev,
        |       repeat('*', CAST(c_custkey % 5 AS INTEGER)) AS stars
        |FROM customer""".stripMargin,
    "skew_autosplit" ->
      """WITH dim AS (
        |  SELECT user_id, COUNT(*) AS user_total FROM events GROUP BY 1
        |)
        |SELECT e.event_id, e.user_id, d.user_total
        |FROM events e JOIN dim d ON e.user_id = d.user_id""".stripMargin,
    "salted_join" ->
      """WITH dim AS (
        |  SELECT user_id, COUNT(*) AS user_total FROM events GROUP BY 1
        |)
        |SELECT e.event_id, e.user_id, d.user_total
        |FROM events e JOIN dim d ON e.user_id = d.user_id""".stripMargin,
    "hof_ops" ->
      """SELECT o_orderkey,
        |       array_to_string(list_transform(generate_series(1, o_orderkey % 5 + 1),
        |                                      x -> CAST(x * x AS VARCHAR)), ',') AS squares_csv,
        |       CAST(list_sum(generate_series(1, o_orderkey % 5 + 1)) AS BIGINT) AS sum_arr,
        |       CAST(len(list_filter(generate_series(1, o_orderkey % 5 + 1),
        |                            x -> x % 2 = 0)) AS INTEGER) AS n_even,
        |       list_contains(generate_series(1, o_orderkey % 5 + 1), 3) AS has_3
        |FROM orders""".stripMargin,
    "try_ops" ->
      """SELECT o_orderkey,
        |       TRY_CAST(CASE WHEN o_orderkey % 1000 = 7 THEN o_orderpriority
        |                ELSE split_part(o_orderpriority, '-', 1) END AS INTEGER)
        |         AS pri_int,
        |       TRY_CAST(split_part(o_orderpriority, '-', 1) AS INTEGER) AS pri_num,
        |       o_totalprice / CAST(o_custkey % 3 AS DOUBLE) AS per_bucket,
        |       CASE WHEN o_orderkey % 1000 = 0 AND o_orderkey > 0 THEN CAST(NULL AS BIGINT)
        |            WHEN o_orderkey % 1000 = 0 THEN 9223372036854775807
        |            ELSE o_orderkey END AS overflow_add
        |FROM orders""".stripMargin,
    "simhash_pairs" ->
      s"""$dToksCte, h AS (
         |  SELECT doc_id, list_transform(toks, tk -> ${dH("tk")}) AS hs FROM t
         |), bb AS (
         |  SELECT doc_id,
         |       ${dSimhashBitsW(60)}
         |  FROM h
         |), sig AS (
         |  SELECT doc_id, CAST(${dSimhashPackW(60)} AS BIGINT) AS simhash FROM bb
         |)
         |SELECT x.doc_id AS a_id, y.doc_id AS b_id,
         |       CAST(bit_count(xor(x.simhash, y.simhash)) AS INTEGER) AS hamming
         |FROM sig x JOIN sig y ON x.doc_id < y.doc_id
         |WHERE bit_count(xor(x.simhash, y.simhash)) <= 3""".stripMargin,
    "auto_range_join" ->
      """WITH e AS (
        |  SELECT event_id, epoch_us(ts) AS t_us FROM events
        |), p AS (
        |  SELECT event_id AS p_id, epoch_us(ts) AS p_us
        |  FROM events WHERE event_type = 'purchase'
        |)
        |SELECT p_id, COUNT(*) AS n_within_hour
        |FROM e JOIN p ON t_us >= p_us AND t_us < p_us + 3600000000
        |GROUP BY 1""".stripMargin,
    "range_join_count" ->
      """SELECT o.o_orderkey, COUNT(l.l_shipdate) AS n_in_range
        |FROM orders o LEFT JOIN lineitem l
        |  ON l.l_shipdate >= o.o_orderdate
        | AND l.l_shipdate < o.o_orderdate + INTERVAL 7 DAY
        |GROUP BY 1""".stripMargin,
    "token_count" ->
      """SELECT doc_id,
        |       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws_tokens,
        |       CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INTEGER) AS n_sub_tokens,
        |       CAST(length(text) AS DOUBLE)
        |         / nullif(CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS DOUBLE), 0)
        |         AS chars_per_subtoken
        |FROM documents""".stripMargin,
    "keyword_tag" ->
      // the brute-force definition the automaton must equal: for every
      // (doc, pattern), the number of start positions i with
      // text[i, i+|p|) = p — ALL occurrences, overlapping included
      """WITH pats AS (
        |  SELECT * FROM (VALUES ('table'), ('fast merge'), ('scan slow'),
        |                        ('spark'), ('agg'), ('agg row'),
        |                        ('value table'), ('a a')) p(pattern)
        |), d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL)
        |SELECT doc_id, pattern, n_hits FROM (
        |  SELECT d.doc_id, p.pattern,
        |         CAST(len(list_filter(range(1, len(d.text) - len(p.pattern) + 2),
        |           i -> substr(d.text, CAST(i AS INTEGER), len(p.pattern)) = p.pattern))
        |           AS BIGINT) AS n_hits
        |  FROM d CROSS JOIN pats p) t
        |WHERE n_hits > 0
        |ORDER BY doc_id, pattern""".stripMargin,
    "keyword_redact" ->
      // brute-force redaction the automaton must equal: the union of all
      // match spans masked char-by-char (chars = bytes on this ASCII
      // corpus), rebuilt with an ordered string_agg
      """WITH pats AS (
        |  SELECT * FROM (VALUES ('table'), ('fast merge'), ('scan slow'),
        |                        ('spark'), ('agg'), ('agg row'),
        |                        ('value table'), ('a a')) p(pattern)
        |), d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
        |st AS (
        |  SELECT d.doc_id, CAST(u.s AS INTEGER) AS s, len(p.pattern) AS lp
        |  FROM d CROSS JOIN pats p
        |  CROSS JOIN UNNEST(list_filter(range(1, len(d.text) - len(p.pattern) + 2),
        |    i -> substr(d.text, CAST(i AS INTEGER), len(p.pattern)) = p.pattern)) AS u(s)
        |), cov AS (
        |  SELECT DISTINCT doc_id, s + CAST(r.o AS INTEGER) AS pos
        |  FROM st CROSS JOIN UNNEST(range(0, lp)) AS r(o)
        |), chars AS (
        |  SELECT d.doc_id, CAST(g.i AS INTEGER) AS pos,
        |         substr(d.text, CAST(g.i AS INTEGER), 1) AS ch
        |  FROM d CROSS JOIN UNNEST(range(1, len(d.text) + 1)) AS g(i)
        |), red AS (
        |  SELECT c.doc_id,
        |         string_agg(CASE WHEN cov.pos IS NOT NULL THEN '*' ELSE c.ch END,
        |                    '' ORDER BY c.pos) AS redacted
        |  FROM chars c
        |  LEFT JOIN cov ON cov.doc_id = c.doc_id AND cov.pos = c.pos
        |  GROUP BY c.doc_id)
        |SELECT d.doc_id, COALESCE(r.redacted, '') AS redacted,
        |       CAST(len(COALESCE(r.redacted, ''))
        |            - len(replace(COALESCE(r.redacted, ''), '*', '')) AS BIGINT)
        |         AS n_masked
        |FROM d LEFT JOIN red r USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    "link_graph" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    '<html><head><title>Doc ' || doc_id || ' &amp; friends</title>'
        |    || '<style>body { color: #000; }</style>'
        |    || '<script>var d = ' || doc_id || '; if (d > 0) { d = d - 1; }</script>'
        |    || '</head><body><nav><a href="/">home</a> | <a href="/about">about</a></nav>'
        |    || '<h1>Doc ' || doc_id || '</h1><p>' || text
        |    || '</p><a href="/doc/' || doc_id || '">permalink</a>'
        |    || '<footer>&copy; corpus</footer></body></html>' AS html
        |  FROM documents WHERE text IS NOT NULL
        |)
        |SELECT u.href, CAST(COUNT(*) AS BIGINT) AS n_refs
        |FROM h CROSS JOIN UNNEST(regexp_extract_all(h.html, '<a href="([^"]*)"', 1)) AS u(href)
        |GROUP BY u.href
        |ORDER BY n_refs DESC, u.href""".stripMargin,
    "html_extract" ->
      // identical synthesis and the IDENTICAL RE2∩Java regex patterns —
      // the gate cross-checks two regex engines byte-for-byte
      """WITH h AS (
        |  SELECT doc_id,
        |    '<html><head><title>Doc ' || doc_id || ' &amp; friends</title>'
        |    || '<style>body { color: #000; }</style>'
        |    || '<script>var d = ' || doc_id || '; if (d > 0) { d = d - 1; }</script>'
        |    || '</head><body><nav><a href="/">home</a> | <a href="/about">about</a></nav>'
        |    || '<h1>Doc ' || doc_id || '</h1><p>' || text
        |    || '</p><a href="/doc/' || doc_id || '">permalink</a>'
        |    || '<footer>&copy; corpus</footer></body></html>' AS html
        |  FROM documents WHERE text IS NOT NULL
        |), x AS (
        |  SELECT doc_id,
        |    replace(regexp_extract(html, '<title>(.*?)</title>', 1), '&amp;', '&') AS title,
        |    CAST(len(regexp_extract_all(html, '<a ')) AS INTEGER) AS n_links,
        |    trim(regexp_replace(
        |      replace(replace(replace(
        |        regexp_replace(
        |          regexp_replace(
        |            regexp_replace(html, '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
        |            '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
        |          '<[^>]*>', ' ', 'g'),
        |        '&amp;', '&'), '&copy;', '(c)'), '&nbsp;', ' '),
        |      '[ \t\r\n]+', ' ', 'g')) AS clean_text
        |  FROM h)
        |SELECT doc_id, title, n_links, clean_text,
        |       CAST(length(clean_text) AS BIGINT) AS n_chars_clean
        |FROM x ORDER BY doc_id""".stripMargin,
    "ivf_topk_probe4" ->
      s"""$dUnitCte, c AS (
         |  SELECT vec_id AS cent_id, unit AS cent_unit FROM u
         |  WHERE unit IS NOT NULL ORDER BY vec_id LIMIT 16
         |), s AS (
         |  SELECT u.vec_id, u.unit, c.cent_id,
         |         round(${dUnitDot("u.unit", "c.cent_unit")}, 6) AS cent_sim
         |  FROM u CROSS JOIN c WHERE u.unit IS NOT NULL
         |), r AS (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id
         |                               ORDER BY cent_sim DESC, cent_id) AS rn
         |  FROM s
         |), assign AS (
         |  SELECT vec_id, unit, cent_id AS cell FROM r WHERE rn = 1
         |), q AS (
         |  SELECT unit AS q_unit FROM u WHERE vec_id = 0
         |), pc AS (
         |  SELECT probe_cell FROM (
         |    SELECT probe_cell, row_number() OVER (ORDER BY sim DESC, probe_cell) AS rn
         |    FROM (
         |      SELECT c.cent_id AS probe_cell,
         |             round(${dUnitDot("c.cent_unit", "q.q_unit")}, 6) AS sim
         |      FROM c CROSS JOIN q) z) t
         |  WHERE rn <= 4
         |)
         |SELECT a.vec_id, a.cell,
         |       round(${dUnitDot("a.unit", "q.q_unit")}, 6) AS cosine_sim
         |FROM assign a JOIN pc ON a.cell = pc.probe_cell CROSS JOIN q
         |WHERE a.vec_id <> 0
         |ORDER BY cosine_sim DESC, a.vec_id
         |LIMIT 5""".stripMargin,
    "semantic_dedup" ->
      s"""$dUnitCte, c AS (
         |  SELECT vec_id AS cent_id, unit AS cent_unit FROM u
         |  WHERE unit IS NOT NULL ORDER BY vec_id LIMIT 16
         |), s AS (
         |  SELECT u.vec_id, u.unit, c.cent_id,
         |         round(${dUnitDot("u.unit", "c.cent_unit")}, 6) AS cent_sim
         |  FROM u CROSS JOIN c WHERE u.unit IS NOT NULL
         |), r AS (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id
         |                               ORDER BY cent_sim DESC, cent_id) AS rn
         |  FROM s
         |), assign AS (
         |  SELECT vec_id, unit, cent_id AS cell FROM r WHERE rn = 1
         |), p AS (
         |  SELECT lb.vec_id AS vec_id, la.vec_id AS a_id,
         |         round(${dUnitDot("la.unit", "lb.unit")}, 6) AS sim
         |  FROM assign la JOIN assign lb
         |    ON la.cell = lb.cell AND la.vec_id < lb.vec_id
         |), dups AS (
         |  SELECT vec_id, MIN(a_id) AS dup_of FROM p WHERE sim >= 0.4 GROUP BY vec_id
         |)
         |SELECT u.vec_id, a.cell, d.dup_of,
         |       CAST(CASE WHEN d.dup_of IS NOT NULL THEN 1 ELSE 0 END AS INTEGER) AS is_dup
         |FROM u LEFT JOIN assign a USING (vec_id)
         |       LEFT JOIN dups d USING (vec_id)""".stripMargin,
    "semantic_dedup_keep" ->
      s"""$dUnitCte, c AS (
         |  SELECT vec_id AS cent_id, unit AS cent_unit FROM u
         |  WHERE unit IS NOT NULL ORDER BY vec_id LIMIT 16
         |), s AS (
         |  SELECT u.vec_id, u.unit, c.cent_id,
         |         round(${dUnitDot("u.unit", "c.cent_unit")}, 6) AS cent_sim
         |  FROM u CROSS JOIN c WHERE u.unit IS NOT NULL
         |), r AS (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id
         |                               ORDER BY cent_sim DESC, cent_id) AS rn
         |  FROM s
         |), assign AS (
         |  SELECT vec_id, unit, cent_id AS cell FROM r WHERE rn = 1
         |), p AS (
         |  SELECT lb.vec_id AS vec_id,
         |         round(${dUnitDot("la.unit", "lb.unit")}, 6) AS sim
         |  FROM assign la JOIN assign lb
         |    ON la.cell = lb.cell AND la.vec_id < lb.vec_id
         |), dups AS (
         |  SELECT DISTINCT vec_id FROM p WHERE sim >= 0.4
         |)
         |SELECT u.vec_id, a.cell
         |FROM u LEFT JOIN assign a USING (vec_id)
         |       LEFT JOIN dups d USING (vec_id)
         |WHERE d.vec_id IS NULL""".stripMargin,
    "knn_join" ->
      s"""$dUnitCte, c AS (
         |  SELECT vec_id AS cent_id, unit AS cent_unit FROM u
         |  WHERE unit IS NOT NULL ORDER BY vec_id LIMIT 16
         |), s AS (
         |  SELECT u.vec_id, u.unit, c.cent_id,
         |         round(${dUnitDot("u.unit", "c.cent_unit")}, 6) AS cent_sim
         |  FROM u CROSS JOIN c WHERE u.unit IS NOT NULL
         |), r AS (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id
         |                               ORDER BY cent_sim DESC, cent_id) AS rn
         |  FROM s
         |), assign AS (
         |  SELECT vec_id, unit, cent_id AS cell FROM r WHERE rn = 1
         |), p AS (
         |  SELECT la.vec_id AS vec_id, la.cell AS cell, lb.vec_id AS nbr_id,
         |         round(${dUnitDot("la.unit", "lb.unit")}, 6) AS cosine_sim
         |  FROM assign la JOIN assign lb
         |    ON la.cell = lb.cell AND la.vec_id <> lb.vec_id
         |), rk AS (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id
         |                               ORDER BY cosine_sim DESC, nbr_id) AS rnk
         |  FROM p
         |)
         |SELECT vec_id, cell, nbr_id, cosine_sim, CAST(rnk AS BIGINT) AS rank
         |FROM rk WHERE rnk <= 3""".stripMargin,
    "hard_negatives" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 1000000, embedding FROM embeddings WHERE vec_id % 20 = 0
         |), u AS (
         |  SELECT vec_id,
         |         CASE WHEN sqrt(list_sum(list_transform(embedding,
         |                y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))) > 0
         |           THEN list_transform(embedding, x -> CAST(x AS DOUBLE)
         |             / sqrt(list_sum(list_transform(embedding, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))))
         |         END AS unit
         |  FROM e
         |), c AS (
         |  SELECT vec_id AS cent_id, unit AS cent_unit FROM u
         |  WHERE unit IS NOT NULL ORDER BY vec_id LIMIT 16
         |), s AS (
         |  SELECT u.vec_id, u.unit, c.cent_id,
         |         round(${dUnitDot("u.unit", "c.cent_unit")}, 6) AS cent_sim
         |  FROM u CROSS JOIN c WHERE u.unit IS NOT NULL
         |), r AS (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id
         |                               ORDER BY cent_sim DESC, cent_id) AS rn
         |  FROM s
         |), assign AS (
         |  SELECT vec_id, unit, cent_id AS cell FROM r WHERE rn = 1
         |), p AS (
         |  SELECT la.vec_id AS vec_id, la.cell AS cell, lb.vec_id AS nbr_id,
         |         round(${dUnitDot("la.unit", "lb.unit")}, 6) AS cosine_sim
         |  FROM assign la JOIN assign lb
         |    ON la.cell = lb.cell AND la.vec_id <> lb.vec_id
         |), rk AS (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id
         |                               ORDER BY cosine_sim DESC, nbr_id) AS rnk
         |  FROM p WHERE cosine_sim < 0.95
         |)
         |SELECT vec_id, cell, nbr_id, cosine_sim, CAST(rnk AS BIGINT) AS rank
         |FROM rk WHERE rnk <= 3""".stripMargin,
    "contrastive_triplets" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 1000000, embedding FROM embeddings WHERE vec_id % 20 = 0
         |), u AS (
         |  SELECT vec_id,
         |         CASE WHEN sqrt(list_sum(list_transform(embedding,
         |                y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))) > 0
         |           THEN list_transform(embedding, x -> CAST(x AS DOUBLE)
         |             / sqrt(list_sum(list_transform(embedding, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))))
         |         END AS unit
         |  FROM e
         |), c AS (
         |  SELECT vec_id AS cent_id, unit AS cent_unit FROM u
         |  WHERE unit IS NOT NULL ORDER BY vec_id LIMIT 16
         |), s AS (
         |  SELECT u.vec_id, u.unit, c.cent_id,
         |         round(${dUnitDot("u.unit", "c.cent_unit")}, 6) AS cent_sim
         |  FROM u CROSS JOIN c WHERE u.unit IS NOT NULL
         |), r AS (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id
         |                               ORDER BY cent_sim DESC, cent_id) AS rn
         |  FROM s
         |), assign AS (
         |  SELECT vec_id, unit, cent_id AS cell FROM r WHERE rn = 1
         |), p AS (
         |  SELECT la.vec_id AS vec_id, lb.vec_id AS nbr_id,
         |         round(${dUnitDot("la.unit", "lb.unit")}, 6) AS sim
         |  FROM assign la JOIN assign lb
         |    ON la.cell = lb.cell AND la.vec_id <> lb.vec_id
         |), pos AS (
         |  SELECT vec_id AS anchor_id, nbr_id AS pos_id, sim AS pos_sim FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |                                 ORDER BY sim DESC, nbr_id) AS rk
         |    FROM p WHERE sim >= 0.95) t WHERE rk = 1
         |), neg AS (
         |  SELECT vec_id AS anchor_id, nbr_id AS neg_id, sim AS neg_sim FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |                                 ORDER BY sim DESC, nbr_id) AS rk
         |    FROM p WHERE sim < 0.95) t WHERE rk = 1
         |)
         |SELECT anchor_id, pos_id, pos_sim, neg_id, neg_sim
         |FROM pos JOIN neg USING (anchor_id)""".stripMargin,
    // Adaptive-codebook twins: k = max(16, min(2^16, ceil(sqrt(n)))) derived
    // from COUNT(*) exactly as Similarity.adaptiveCodebookSize does (n is
    // exact; sqrt/ceil are the same IEEE-double ops both engines run), and
    // the codebook takes the k smallest non-null-unit vec_ids via a
    // row_number qualify — the engine-side ORDER BY vec_id LIMIT k.
    "semantic_dedup_adaptive" ->
      s"""$dUnitCte, kk AS (
         |  SELECT GREATEST(16, LEAST(65536,
         |           CAST(CEIL(SQRT(CAST(COUNT(*) AS DOUBLE))) AS INTEGER))) AS k
         |  FROM embeddings
         |), c AS (
         |  SELECT vec_id AS cent_id, unit AS cent_unit FROM (
         |    SELECT vec_id, unit, row_number() OVER (ORDER BY vec_id) AS rn
         |    FROM u WHERE unit IS NOT NULL) z
         |  WHERE rn <= (SELECT k FROM kk)
         |), s AS (
         |  SELECT u.vec_id, u.unit, c.cent_id,
         |         round(${dUnitDot("u.unit", "c.cent_unit")}, 6) AS cent_sim
         |  FROM u CROSS JOIN c WHERE u.unit IS NOT NULL
         |), r AS (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id
         |                               ORDER BY cent_sim DESC, cent_id) AS rn
         |  FROM s
         |), assign AS (
         |  SELECT vec_id, unit, cent_id AS cell FROM r WHERE rn = 1
         |), p AS (
         |  SELECT lb.vec_id AS vec_id, la.vec_id AS a_id,
         |         round(${dUnitDot("la.unit", "lb.unit")}, 6) AS sim
         |  FROM assign la JOIN assign lb
         |    ON la.cell = lb.cell AND la.vec_id < lb.vec_id
         |), dups AS (
         |  SELECT vec_id, MIN(a_id) AS dup_of FROM p WHERE sim >= 0.4 GROUP BY vec_id
         |)
         |SELECT u.vec_id, a.cell, d.dup_of,
         |       CAST(CASE WHEN d.dup_of IS NOT NULL THEN 1 ELSE 0 END AS INTEGER) AS is_dup
         |FROM u LEFT JOIN assign a USING (vec_id)
         |       LEFT JOIN dups d USING (vec_id)""".stripMargin,
    "knn_join_adaptive" ->
      s"""$dUnitCte, kk AS (
         |  SELECT GREATEST(16, LEAST(65536,
         |           CAST(CEIL(SQRT(CAST(COUNT(*) AS DOUBLE))) AS INTEGER))) AS k
         |  FROM embeddings
         |), c AS (
         |  SELECT vec_id AS cent_id, unit AS cent_unit FROM (
         |    SELECT vec_id, unit, row_number() OVER (ORDER BY vec_id) AS rn
         |    FROM u WHERE unit IS NOT NULL) z
         |  WHERE rn <= (SELECT k FROM kk)
         |), s AS (
         |  SELECT u.vec_id, u.unit, c.cent_id,
         |         round(${dUnitDot("u.unit", "c.cent_unit")}, 6) AS cent_sim
         |  FROM u CROSS JOIN c WHERE u.unit IS NOT NULL
         |), r AS (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id
         |                               ORDER BY cent_sim DESC, cent_id) AS rn
         |  FROM s
         |), assign AS (
         |  SELECT vec_id, unit, cent_id AS cell FROM r WHERE rn = 1
         |), p AS (
         |  SELECT la.vec_id AS vec_id, la.cell AS cell, lb.vec_id AS nbr_id,
         |         round(${dUnitDot("la.unit", "lb.unit")}, 6) AS cosine_sim
         |  FROM assign la JOIN assign lb
         |    ON la.cell = lb.cell AND la.vec_id <> lb.vec_id
         |), rk AS (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id
         |                               ORDER BY cosine_sim DESC, nbr_id) AS rnk
         |  FROM p
         |)
         |SELECT vec_id, cell, nbr_id, cosine_sim, CAST(rnk AS BIGINT) AS rank
         |FROM rk WHERE rnk <= 3""".stripMargin,
    "hard_negatives_adaptive" ->
      s"""$dUnitCte, kk AS (
         |  SELECT GREATEST(16, LEAST(65536,
         |           CAST(CEIL(SQRT(CAST(COUNT(*) AS DOUBLE))) AS INTEGER))) AS k
         |  FROM embeddings
         |), c AS (
         |  SELECT vec_id AS cent_id, unit AS cent_unit FROM (
         |    SELECT vec_id, unit, row_number() OVER (ORDER BY vec_id) AS rn
         |    FROM u WHERE unit IS NOT NULL) z
         |  WHERE rn <= (SELECT k FROM kk)
         |), s AS (
         |  SELECT u.vec_id, u.unit, c.cent_id,
         |         round(${dUnitDot("u.unit", "c.cent_unit")}, 6) AS cent_sim
         |  FROM u CROSS JOIN c WHERE u.unit IS NOT NULL
         |), r AS (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id
         |                               ORDER BY cent_sim DESC, cent_id) AS rn
         |  FROM s
         |), assign AS (
         |  SELECT vec_id, unit, cent_id AS cell FROM r WHERE rn = 1
         |), p AS (
         |  SELECT la.vec_id AS vec_id, la.cell AS cell, lb.vec_id AS nbr_id,
         |         round(${dUnitDot("la.unit", "lb.unit")}, 6) AS cosine_sim
         |  FROM assign la JOIN assign lb
         |    ON la.cell = lb.cell AND la.vec_id <> lb.vec_id
         |), rk AS (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id
         |                               ORDER BY cosine_sim DESC, nbr_id) AS rnk
         |  FROM p WHERE cosine_sim < 0.95
         |)
         |SELECT vec_id, cell, nbr_id, cosine_sim, CAST(rnk AS BIGINT) AS rank
         |FROM rk WHERE rnk <= 3""".stripMargin,
    "contrastive_triplets_adaptive" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 1000000, embedding FROM embeddings WHERE vec_id % 20 = 0
         |), u AS (
         |  SELECT vec_id,
         |         CASE WHEN sqrt(list_sum(list_transform(embedding,
         |                y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))) > 0
         |           THEN list_transform(embedding, x -> CAST(x AS DOUBLE)
         |             / sqrt(list_sum(list_transform(embedding, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))))
         |         END AS unit
         |  FROM e
         |), kk AS (
         |  SELECT GREATEST(16, LEAST(65536,
         |           CAST(CEIL(SQRT(CAST(COUNT(*) AS DOUBLE))) AS INTEGER))) AS k
         |  FROM e
         |), c AS (
         |  SELECT vec_id AS cent_id, unit AS cent_unit FROM (
         |    SELECT vec_id, unit, row_number() OVER (ORDER BY vec_id) AS rn
         |    FROM u WHERE unit IS NOT NULL) z
         |  WHERE rn <= (SELECT k FROM kk)
         |), s AS (
         |  SELECT u.vec_id, u.unit, c.cent_id,
         |         round(${dUnitDot("u.unit", "c.cent_unit")}, 6) AS cent_sim
         |  FROM u CROSS JOIN c WHERE u.unit IS NOT NULL
         |), r AS (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id
         |                               ORDER BY cent_sim DESC, cent_id) AS rn
         |  FROM s
         |), assign AS (
         |  SELECT vec_id, unit, cent_id AS cell FROM r WHERE rn = 1
         |), p AS (
         |  SELECT la.vec_id AS vec_id, lb.vec_id AS nbr_id,
         |         round(${dUnitDot("la.unit", "lb.unit")}, 6) AS sim
         |  FROM assign la JOIN assign lb
         |    ON la.cell = lb.cell AND la.vec_id <> lb.vec_id
         |), pos AS (
         |  SELECT vec_id AS anchor_id, nbr_id AS pos_id, sim AS pos_sim FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |                                 ORDER BY sim DESC, nbr_id) AS rk
         |    FROM p WHERE sim >= 0.95) t WHERE rk = 1
         |), neg AS (
         |  SELECT vec_id AS anchor_id, nbr_id AS neg_id, sim AS neg_sim FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |                                 ORDER BY sim DESC, nbr_id) AS rk
         |    FROM p WHERE sim < 0.95) t WHERE rk = 1
         |)
         |SELECT anchor_id, pos_id, pos_sim, neg_id, neg_sim
         |FROM pos JOIN neg USING (anchor_id)""".stripMargin,
    "rollup_status" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin,
    "cube_flags" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,
    "pivot_status" ->
      """SELECT o_orderpriority,
        |       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS "O",
        |       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS "F",
        |       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS "P"
        |FROM orders
        |GROUP BY o_orderpriority""".stripMargin,
    "grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |       COUNT(*) AS n_orders,
        |       CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
        |       CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin,
    "disjunctive_filter" ->
      """SELECT l_returnflag, COUNT(*) AS n_items,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM lineitem
        |WHERE (l_quantity >= 1 AND l_quantity <= 11 AND l_discount >= 0.05)
        |   OR (l_quantity >= 30 AND l_quantity <= 50 AND l_discount <= 0.02)
        |   OR (l_returnflag = 'R' AND l_tax = 0.0)
        |GROUP BY l_returnflag""".stripMargin,
    "set_ops_all" ->
      """(SELECT o_custkey AS custkey FROM orders
        |  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        | INTERSECT ALL
        | SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O')
        |EXCEPT ALL
        |SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000""".stripMargin,
    "above_avg_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)""".stripMargin,
    "big_order_customers" ->
      """WITH big AS (
        |  SELECT l_orderkey, SUM(l_quantity) AS total_qty
        |  FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > 150
        |)
        |SELECT o_custkey, COUNT(*) AS n_big_orders, SUM(total_qty) AS sum_qty
        |FROM orders JOIN big ON o_orderkey = l_orderkey
        |GROUP BY 1""".stripMargin,
    "text_stats" ->
      s"""$dToksCte
         |SELECT doc_id,
         |       CAST(len(toks) AS BIGINT) AS n_tokens,
         |       CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq_tokens,
         |       CAST(len(list_filter(toks, tk -> tk IN ('the', 'a'))) AS DOUBLE)
         |         / CAST(len(toks) AS DOUBLE) AS stopword_ratio,
         |       CAST(length(text) - (len(toks) - 1) AS DOUBLE)
         |         / CAST(len(toks) AS DOUBLE) AS avg_token_len,
         |       0.5 * least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0)
         |        + 0.25 * (CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE))
         |        + 0.25 * (CAST(len(list_filter(toks, tk -> tk IN ('the', 'a'))) AS DOUBLE) / CAST(len(toks) AS DOUBLE))
         |        AS quality_score
         |FROM t""".stripMargin,
    "lang_id" ->
      s"""$dToksCte, sc AS (
         |  SELECT doc_id, lang,
         |    CAST(len(list_filter(toks, tk -> tk IN ('the', 'a', 'of', 'and', 'is'))) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS en_score,
         |    CAST(len(list_filter(toks, tk -> tk IN ('der', 'die', 'das', 'und', 'ist'))) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS de_score,
         |    CAST(len(list_filter(toks, tk -> tk IN ('el', 'la', 'de', 'y', 'es'))) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS es_score,
         |    CAST(len(list_filter(toks, tk -> tk IN ('le', 'la', 'de', 'et', 'les'))) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS fr_score
         |  FROM t
         |), p AS (
         |  SELECT *, CASE WHEN en_score >= de_score AND en_score >= es_score AND en_score >= fr_score THEN 'en'
         |                 WHEN de_score >= es_score AND de_score >= fr_score THEN 'de'
         |                 WHEN es_score >= fr_score THEN 'es'
         |                 ELSE 'fr' END AS predicted_lang
         |  FROM sc
         |)
         |SELECT doc_id, lang, en_score, de_score, es_score, fr_score, predicted_lang,
         |       CAST(CASE WHEN predicted_lang = lang THEN 1 ELSE 0 END AS BIGINT) AS is_correct
         |FROM p""".stripMargin,
    "calibration_table" ->
      s"""$dToksCte, sc AS (
         |  SELECT doc_id, lang,
         |    CAST(len(list_filter(toks, tk -> tk IN ('the', 'a', 'of', 'and', 'is'))) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS en_score,
         |    CAST(len(list_filter(toks, tk -> tk IN ('der', 'die', 'das', 'und', 'ist'))) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS de_score,
         |    CAST(len(list_filter(toks, tk -> tk IN ('el', 'la', 'de', 'y', 'es'))) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS es_score,
         |    CAST(len(list_filter(toks, tk -> tk IN ('le', 'la', 'de', 'et', 'les'))) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS fr_score
         |  FROM t
         |), p AS (
         |  SELECT *, CASE WHEN en_score >= de_score AND en_score >= es_score AND en_score >= fr_score THEN 'en'
         |                 WHEN de_score >= es_score AND de_score >= fr_score THEN 'de'
         |                 WHEN es_score >= fr_score THEN 'es'
         |                 ELSE 'fr' END AS predicted_lang
         |  FROM sc
         |), g AS (
         |  SELECT CAST(FLOOR(GREATEST(en_score, de_score, es_score, fr_score) * 10.0) AS INT) AS bucket,
         |         CAST(CASE WHEN predicted_lang = lang THEN 1 ELSE 0 END AS BIGINT) AS ok
         |  FROM p
         |)
         |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(ok) AS BIGINT) AS n_correct,
         |       CAST(SUM(ok) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS accuracy
         |FROM g GROUP BY 1""".stripMargin,
    "code_detect" ->
      """SELECT doc_id, n_chars, n_symbols, n_digits, n_semicolons,
        |       CASE WHEN n_chars > 0 THEN CAST(n_symbols AS DOUBLE) / CAST(n_chars AS DOUBLE) END AS symbol_frac,
        |       CASE WHEN n_chars > 0 THEN CAST(n_digits AS DOUBLE) / CAST(n_chars AS DOUBLE) END AS digit_frac,
        |       (n_symbols * 1000 >= 30 * n_chars AND n_chars > 0) AS is_code
        |FROM (
        |  SELECT doc_id,
        |         CAST(length(text) AS BIGINT) AS n_chars,
        |         CAST(length(regexp_replace(text, '[^{}\[\]();=<>]', '', 'g')) AS BIGINT) AS n_symbols,
        |         CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digits,
        |         CAST(length(regexp_replace(text, '[^;]', '', 'g')) AS BIGINT) AS n_semicolons
        |  FROM documents)""".stripMargin,
    "feature_hash" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x != '')) AS token
         |  FROM documents
         |), h AS (
         |  SELECT doc_id, ${dH("'fh:' || token")} % 64 AS feature_idx,
         |         CASE WHEN ${dH("'fs:' || token")} % 2 = 1 THEN 1 ELSE -1 END AS sgn
         |  FROM tok
         |)
         |SELECT doc_id, feature_idx, CAST(COUNT(*) AS BIGINT) AS cnt,
         |       CAST(SUM(sgn) AS BIGINT) AS signed_sum
         |FROM h GROUP BY 1, 2""".stripMargin,
    "sample_fixed_k" ->
      s"""SELECT doc_id, lang, source, n_chars FROM documents
         |WHERE doc_id IS NOT NULL
         |ORDER BY ${dH("'sfk:' || CAST(doc_id AS VARCHAR)")}, doc_id
         |LIMIT 100""".stripMargin,
    "bounce_rate" ->
      """WITH g AS (
        |  SELECT event_id, user_id, event_type, ts,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events
        |), s AS (
        |  SELECT event_id, user_id, event_type, ts,
        |         CASE WHEN prev_ts IS NULL
        |                   OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
        |              THEN 1 ELSE 0 END AS session_start
        |  FROM g
        |), sq AS (
        |  SELECT user_id, event_type, ts, event_id,
        |         SUM(session_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                                  ROWS UNBOUNDED PRECEDING) AS session_seq
        |  FROM s
        |), fe AS (
        |  SELECT user_id, session_seq, event_type,
        |         row_number() OVER (PARTITION BY user_id, session_seq
        |                            ORDER BY ts, event_id) AS rn,
        |         COUNT(*) OVER (PARTITION BY user_id, session_seq) AS n_events
        |  FROM sq
        |), per AS (
        |  SELECT user_id, session_seq, CAST(n_events AS BIGINT) AS n_events,
        |         event_type AS entry_type
        |  FROM fe WHERE rn = 1
        |)
        |SELECT entry_type, CAST(COUNT(*) AS BIGINT) AS n_sessions,
        |       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
        |       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |         / CAST(COUNT(*) AS DOUBLE) AS bounce_rate
        |FROM per GROUP BY 1""".stripMargin,
    "session_depth_hist" ->
      """WITH g AS (
        |  SELECT event_id, user_id, ts,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events
        |), s AS (
        |  SELECT event_id, user_id, ts,
        |         CASE WHEN prev_ts IS NULL
        |                   OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
        |              THEN 1 ELSE 0 END AS session_start
        |  FROM g
        |), sq AS (
        |  SELECT user_id,
        |         SUM(session_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                                  ROWS UNBOUNDED PRECEDING) AS session_seq
        |  FROM s
        |), per AS (
        |  SELECT user_id, session_seq, CAST(COUNT(*) AS BIGINT) AS depth
        |  FROM sq GROUP BY 1, 2
        |)
        |SELECT depth, CAST(COUNT(*) AS BIGINT) AS n_sessions,
        |       CAST(depth * COUNT(*) AS BIGINT) AS n_events
        |FROM per GROUP BY 1""".stripMargin,
    "hll_overlap" ->
      """WITH tu AS (
        |  SELECT DISTINCT event_type AS t, user_id AS u
        |  FROM events WHERE event_type IS NOT NULL AND user_id IS NOT NULL
        |), ct AS (
        |  SELECT t, CAST(COUNT(*) AS BIGINT) AS n FROM tu GROUP BY 1
        |), ex AS (
        |  SELECT x.t AS etype_a, y.t AS etype_b, CAST(COUNT(*) AS BIGINT) AS exact_both
        |  FROM tu x JOIN tu y ON x.u = y.u AND x.t < y.t
        |  GROUP BY 1, 2
        |)
        |SELECT a.t AS etype_a, b.t AS etype_b, a.n AS exact_a, b.n AS exact_b,
        |       COALESCE(ex.exact_both, 0) AS exact_both,
        |       true AS inter_within_5pct
        |FROM ct a JOIN ct b ON a.t < b.t
        |LEFT JOIN ex ON ex.etype_a = a.t AND ex.etype_b = b.t""".stripMargin,
    "embed_pca" ->
      // exact witnesses (n, trace of the scatter matrix) recomputed in
      // SQL from the same quantized units; the eigen verdicts are the
      // sketch-gate booleans the Spark side proves distributedly
      s"""$dUnitCte,
         |q AS (SELECT vec_id, CASE WHEN unit IS NOT NULL THEN list_transform(unit,
         |        x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) END AS qvec FROM u),
         |f AS (SELECT qvec FROM q WHERE qvec IS NOT NULL),
         |ex AS (SELECT unnest(range(1, len(qvec) + 1)) AS i, unnest(qvec) AS x FROM f),
         |s AS (SELECT i, SUM(x) AS si, SUM(x * x) AS qi FROM ex GROUP BY 1),
         |nn AS (SELECT COUNT(*) AS n FROM f),
         |tr AS (SELECT SUM(nn.n * s.qi - s.si * s.si) AS trace_scaled FROM s, nn)
         |SELECT CAST(c.component AS INT) AS component, CAST(nn.n AS BIGINT) AS n,
         |       CAST(tr.trace_scaled AS VARCHAR) AS trace_scaled,
         |       true AS var_ok, true AS ortho_ok, true AS resid_ok, true AS order_ok
         |FROM (SELECT unnest(range(0, LEAST(8,
         |        (SELECT MIN(len(qvec)) FROM f)))) AS component) c, nn, tr""".stripMargin,
    "rolling_distinct" ->
      """WITH du AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id AS u
        |  FROM events WHERE user_id IS NOT NULL
        |), daily AS (
        |  SELECT day, CAST(COUNT(*) AS BIGINT) AS exact_dau FROM du GROUP BY 1
        |), contrib AS (
        |  SELECT du.day + CAST(g.i AS INTEGER) AS day, du.u
        |  FROM du CROSS JOIN (SELECT UNNEST(generate_series(0, 6)) AS i) g
        |), roll AS (
        |  SELECT day, CAST(COUNT(DISTINCT u) AS BIGINT) AS exact_rolling7
        |  FROM contrib GROUP BY 1
        |)
        |SELECT CAST(d.day AS TIMESTAMP) AS day, d.exact_dau,
        |       r.exact_rolling7, true AS within_5pct
        |FROM daily d JOIN roll r ON d.day = r.day""".stripMargin,
    "ols_trend" ->
      """WITH daily AS (
        |  SELECT event_type AS etype, date_trunc('day', ts) AS day,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2
        |), idx AS (
        |  SELECT etype, n,
        |         CAST(datediff('day', MIN(day) OVER (PARTITION BY etype), day)
        |              AS BIGINT) AS d
        |  FROM daily
        |), agg AS (
        |  SELECT etype, CAST(COUNT(*) AS BIGINT) AS n_days,
        |         CAST(SUM(d) AS BIGINT) AS sd, CAST(SUM(n) AS BIGINT) AS sy,
        |         CAST(SUM(d * d) AS BIGINT) AS sdd,
        |         CAST(SUM(d * n) AS BIGINT) AS sdy,
        |         CAST(SUM(n * n) AS BIGINT) AS syy
        |  FROM idx GROUP BY 1
        |)
        |SELECT etype, n_days,
        |       n_days * sdy - sd * sy AS slope_num,
        |       n_days * sdd - sd * sd AS slope_den,
        |       CASE WHEN n_days * sdd <> sd * sd THEN
        |         CAST(n_days * sdy - sd * sy AS DOUBLE)
        |           / CAST(n_days * sdd - sd * sd AS DOUBLE) END AS slope,
        |       CASE WHEN n_days * sdd <> sd * sd AND n_days * syy <> sy * sy THEN
        |         (CAST(n_days * sdy - sd * sy AS DOUBLE)
        |           * CAST(n_days * sdy - sd * sy AS DOUBLE))
        |         / (CAST(n_days * sdd - sd * sd AS DOUBLE)
        |           * CAST(n_days * syy - sy * sy AS DOUBLE)) END AS r2
        |FROM agg""".stripMargin,
    "observed_audit" ->
      // what the observe side channel must have reported: the exact
      // aggregates of the curated slice, n_counted = n_rows by
      // construction (the metrics ride the same pass)
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |       CAST(COUNT(*) AS BIGINT) AS n_counted,
        |       CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_null_keys,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_measure
        |FROM events WHERE event_type IS NOT NULL""".stripMargin,
    "schema_evolution" ->
      // the merged read's contract spelled out: v=1 rows surface the
      // added column as NULL; per-generation exact aggregates
      """WITH v1 AS (
        |  SELECT l_orderkey, l_linenumber, l_quantity,
        |         CAST(NULL AS DOUBLE) AS l_extendedprice, 1 AS v
        |  FROM lineitem WHERE l_orderkey % 100 = 0
        |), v2 AS (
        |  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, 2 AS v
        |  FROM lineitem WHERE l_orderkey % 100 = 50
        |), m AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
        |SELECT CAST(v AS INTEGER) AS v,
        |       CAST(COUNT(*) AS BIGINT) AS n_rows,
        |       CAST(SUM(CASE WHEN l_extendedprice IS NULL THEN 1 END) AS BIGINT)
        |         AS n_null_price,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM m GROUP BY v ORDER BY v""".stripMargin,
    "format_roundtrip" ->
      """WITH slice AS (
        |  SELECT l_orderkey, l_quantity, l_extendedprice, l_returnflag
        |  FROM lineitem WHERE l_orderkey % 100 = 0
        |), s AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |         CAST(SUM(l_orderkey) AS BIGINT) AS sum_key,
        |         CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS n_flags
        |  FROM slice
        |)
        |SELECT f.format, s.n_rows, s.sum_qty, s.sum_price, s.sum_key, s.n_flags
        |FROM s CROSS JOIN (SELECT * FROM (VALUES ('parquet'), ('csv'), ('json'),
        |                    ('orc')) AS x(format)) f""".stripMargin,
    "record_linkage" ->
      """SELECT a.p_brand, a.p_partkey AS key_a, b.p_partkey AS key_b,
        |       ROUND(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS jw_r6
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        |WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.8""".stripMargin,
    "edit_linkage" ->
      """WITH p AS (
        |  SELECT p_partkey, p_brand, string_split(p_name, ' ')[1] AS w1, p_name
        |  FROM part
        |), pr AS (
        |  SELECT a.p_brand, a.p_partkey AS key_a, b.p_partkey AS key_b,
        |         levenshtein(a.p_name, b.p_name) AS d,
        |         a.p_name AS na, b.p_name AS nb
        |  FROM p a JOIN p b
        |    ON a.p_brand = b.p_brand AND a.w1 = b.w1
        |   AND a.p_partkey < b.p_partkey
        |)
        |SELECT p_brand, key_a, key_b, CAST(d AS BIGINT) AS dist,
        |       1.0 - CAST(d AS DOUBLE) / CAST(GREATEST(len(na), len(nb)) AS DOUBLE)
        |         AS sim
        |FROM pr WHERE d <= 4""".stripMargin,
    "fd_audit" -> {
      def fd(name: String, table: String, det: String, dep: String): String =
        s"""SELECT '$name' AS fd,
           |  CAST(COUNT(*) AS BIGINT) AS n_keys,
           |  CAST(COUNT(CASE WHEN nd > 1 THEN 1 END) AS BIGINT) AS n_violating_keys,
           |  CAST(COALESCE(MAX(nd), 0) AS BIGINT) AS max_distinct,
           |  CAST(COUNT(CASE WHEN n_null_dep > 0 THEN 1 END) AS BIGINT) AS n_null_keys,
           |  COUNT(CASE WHEN nd > 1 THEN 1 END) = 0 AS holds
           |FROM (SELECT $det, COUNT(DISTINCT $dep) AS nd,
           |             COUNT(CASE WHEN $dep IS NULL THEN 1 END) AS n_null_dep
           |      FROM $table GROUP BY $det) t""".stripMargin
      Seq(
        fd("orders: o_orderkey -> o_orderdate", "orders", "o_orderkey", "o_orderdate"),
        fd("orders: o_custkey -> o_orderpriority", "orders", "o_custkey", "o_orderpriority"),
        fd("customer: c_nationkey -> c_mktsegment", "customer", "c_nationkey", "c_mktsegment"),
        fd("nation: n_nationkey -> n_regionkey", "nation", "n_nationkey", "n_regionkey"),
        fd("lineitem: (l_orderkey, l_linenumber) -> l_partkey", "lineitem",
          "l_orderkey, l_linenumber", "l_partkey"),
        fd("lineitem: l_partkey -> l_suppkey", "lineitem", "l_partkey", "l_suppkey"))
        .mkString("\nUNION ALL\n")
    },
    "json_ingest" ->
      """WITH m AS (
        |  SELECT event_id,
        |         CASE WHEN event_id % 7 = 0 THEN substr(props, 1, length(props) - 1)
        |              ELSE props END AS p
        |  FROM events
        |), f AS (
        |  SELECT event_id AS id, json_valid(p) AS ok FROM m
        |)
        |SELECT CASE WHEN ok THEN 'clean' ELSE 'corrupt' END AS status,
        |       CAST(COUNT(*) AS BIGINT) AS n_rows,
        |       CAST(COUNT(DISTINCT id) AS BIGINT) AS n_ids,
        |       MIN(id) AS min_id, MAX(id) AS max_id
        |FROM f GROUP BY ok""".stripMargin,
    "parity_audit" ->
      """WITH per AS (
        |  SELECT c.c_nationkey AS grp,
        |         CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(COUNT(CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 END)
        |              AS BIGINT) AS n_pos
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  WHERE c.c_nationkey IS NOT NULL
        |  GROUP BY 1
        |), g AS (
        |  SELECT CAST(SUM(n) AS BIGINT) AS n_total,
        |         CAST(SUM(n_pos) AS BIGINT) AS p_total
        |  FROM per
        |)
        |SELECT per.grp, per.n, per.n_pos, g.n_total, g.p_total,
        |       CAST(per.n_pos AS DOUBLE) / CAST(per.n AS DOUBLE) AS rate,
        |       CASE WHEN g.p_total > 0 THEN
        |         CAST(per.n_pos * g.n_total AS DOUBLE)
        |           / CAST(per.n * g.p_total AS DOUBLE) END AS impact_ratio,
        |       5 * per.n_pos * g.n_total < 4 * per.n * g.p_total
        |         AS below_four_fifths
        |FROM per CROSS JOIN g""".stripMargin,
    "psi_drift" ->
      """WITH rb AS (
        |  SELECT CAST(LEAST(GREATEST(floor(o_totalprice / 50000.0), 0), 9) AS BIGINT) AS bin,
        |         CAST(COUNT(*) AS BIGINT) AS n_ref
        |  FROM orders
        |  WHERE o_orderdate < DATE '1998-01-01' AND o_totalprice IS NOT NULL
        |  GROUP BY 1
        |), cb AS (
        |  SELECT CAST(LEAST(GREATEST(floor(o_totalprice / 50000.0), 0), 9) AS BIGINT) AS bin,
        |         CAST(COUNT(*) AS BIGINT) AS n_cur
        |  FROM orders
        |  WHERE o_orderdate >= DATE '1998-01-01' AND o_totalprice IS NOT NULL
        |  GROUP BY 1
        |), t AS (
        |  SELECT (SELECT CAST(SUM(n_ref) AS BIGINT) FROM rb) AS t_ref,
        |         (SELECT CAST(SUM(n_cur) AS BIGINT) FROM cb) AS t_cur
        |), j AS (
        |  SELECT COALESCE(rb.bin, cb.bin) AS bin,
        |         CAST(COALESCE(n_ref, 0) AS BIGINT) AS n_ref,
        |         CAST(COALESCE(n_cur, 0) AS BIGINT) AS n_cur
        |  FROM rb FULL OUTER JOIN cb ON rb.bin = cb.bin
        |)
        |SELECT j.bin, j.n_ref, j.n_cur, t.t_ref, t.t_cur,
        |       round((CAST(j.n_ref + 1 AS DOUBLE) / CAST(t.t_ref + 10 AS DOUBLE)
        |              - CAST(j.n_cur + 1 AS DOUBLE) / CAST(t.t_cur + 10 AS DOUBLE))
        |             * ln((CAST(j.n_ref + 1 AS DOUBLE) / CAST(t.t_ref + 10 AS DOUBLE))
        |                  / (CAST(j.n_cur + 1 AS DOUBLE) / CAST(t.t_cur + 10 AS DOUBLE))), 6)
        |         AS psi_term
        |FROM j CROSS JOIN t""".stripMargin,
    "blocking_eval" ->
      """WITH p AS (
        |  SELECT p_partkey, p_brand, string_split(p_name, ' ')[1] AS w1, p_name
        |  FROM part
        |), smp AS (
        |  SELECT * FROM p WHERE p_brand LIKE '%3'
        |), truth AS (
        |  SELECT a.p_brand, a.p_partkey AS key_a, b.p_partkey AS key_b
        |  FROM smp a JOIN smp b
        |    ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        |  WHERE levenshtein(a.p_name, b.p_name) <= 2
        |), nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth),
        |cb AS (
        |  SELECT a.p_brand, a.p_partkey AS key_a, b.p_partkey AS key_b
        |  FROM p a JOIN p b ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        |), ct AS (
        |  SELECT a.p_brand, a.p_partkey AS key_a, b.p_partkey AS key_b
        |  FROM p a JOIN p b ON a.p_brand = b.p_brand AND a.w1 = b.w1
        |   AND a.p_partkey < b.p_partkey
        |), pos AS (
        |  SELECT p_partkey, p_brand, p_name,
        |         ROW_NUMBER() OVER (PARTITION BY p_brand
        |           ORDER BY p_name, p_partkey) AS pos
        |  FROM p
        |), cs AS (
        |  SELECT a.p_brand,
        |         LEAST(a.p_partkey, b.p_partkey) AS key_a,
        |         GREATEST(a.p_partkey, b.p_partkey) AS key_b
        |  FROM pos a CROSS JOIN (SELECT CAST(k AS BIGINT) AS gap
        |                         FROM (VALUES (1), (2)) AS x(k)) o
        |  JOIN pos b ON a.p_brand = b.p_brand AND a.pos + o.gap = b.pos
        |), stats AS (
        |  SELECT 'brand' AS strategy,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM cb) AS n_candidates,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM truth t
        |      WHERE EXISTS (SELECT 1 FROM cb c WHERE c.p_brand = t.p_brand
        |        AND c.key_a = t.key_a AND c.key_b = t.key_b)) AS n_found
        |  UNION ALL
        |  SELECT 'brand_token',
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM ct),
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM truth t
        |      WHERE EXISTS (SELECT 1 FROM ct c WHERE c.p_brand = t.p_brand
        |        AND c.key_a = t.key_a AND c.key_b = t.key_b))
        |  UNION ALL
        |  SELECT 'sorted_neighborhood',
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM cs),
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM truth t
        |      WHERE EXISTS (SELECT 1 FROM cs c WHERE c.p_brand = t.p_brand
        |        AND c.key_a = t.key_a AND c.key_b = t.key_b))
        |)
        |SELECT s.strategy, s.n_candidates, nt.n_truth, s.n_found,
        |       CASE WHEN nt.n_truth > 0 THEN
        |         CAST(s.n_found AS DOUBLE) / CAST(nt.n_truth AS DOUBLE) END AS recall,
        |       CASE WHEN nt.n_truth > 0 THEN
        |         CAST(s.n_candidates AS DOUBLE) / CAST(nt.n_truth AS DOUBLE) END
        |         AS candidates_per_truth
        |FROM stats s CROSS JOIN nt""".stripMargin,
    "sorted_neighborhood" ->
      """WITH pos AS (
        |  SELECT p_partkey, p_brand, p_name,
        |         ROW_NUMBER() OVER (PARTITION BY p_brand
        |           ORDER BY p_name, p_partkey) AS pos
        |  FROM part
        |), off AS (
        |  SELECT CAST(k AS BIGINT) AS gap
        |  FROM (VALUES (1), (2)) AS x(k)
        |)
        |SELECT a.p_brand, a.p_partkey AS key_a, b.p_partkey AS key_b, o.gap,
        |       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        |FROM pos a CROSS JOIN off o
        |JOIN pos b ON a.p_brand = b.p_brand AND a.pos + o.gap = b.pos""".stripMargin,
    "ewma_smooth" ->
      """WITH daily AS (
        |  SELECT event_type AS etype, date_trunc('day', ts) AS day,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2
        |), r AS (
        |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY etype ORDER BY day)
        |                 AS INTEGER) AS rn
        |  FROM daily
        |), w AS (
        |  SELECT *, CASE WHEN rn = 1 THEN n
        |                 ELSE n * (CAST(1 AS BIGINT) << (rn - 2)) END AS wn
        |  FROM r
        |)
        |SELECT etype, day, n,
        |       CAST(SUM(wn) OVER (PARTITION BY etype ORDER BY rn) AS BIGINT)
        |         AS ewma_num,
        |       rn - 1 AS den_log2,
        |       CAST(SUM(wn) OVER (PARTITION BY etype ORDER BY rn) AS DOUBLE)
        |         / (CAST(1 AS BIGINT) << (rn - 1)) AS ewma
        |FROM w""".stripMargin,
    "sssp_bounded" ->
      // 3 Bellman-Ford relaxation rounds unrolled as CTEs (the
      // kmeans-unroll discipline); dist after round r = exact min cost
      // over paths of <= r hops
      """WITH e0 AS (
        |  SELECT DISTINCT l_suppkey % 100 AS src, l_partkey % 100 AS dst
        |  FROM lineitem WHERE l_suppkey % 100 <> l_partkey % 100
        |), ew AS (
        |  SELECT src, dst, (src * 7 + dst * 13) % 9 + 1 AS w FROM e0
        |), und AS (
        |  SELECT src, dst, MIN(w) AS w FROM (
        |    SELECT src, dst, w FROM ew
        |    UNION ALL SELECT dst AS src, src AS dst, w FROM ew) u
        |  GROUP BY 1, 2
        |), d0 AS (
        |  SELECT * FROM (VALUES (CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
        |                        (CAST(1 AS BIGINT), CAST(0 AS BIGINT))) t(node, dist)
        |), d1 AS (
        |  SELECT node, MIN(dist) AS dist FROM (
        |    SELECT node, dist FROM d0
        |    UNION ALL SELECT e.dst, d.dist + e.w FROM d0 d
        |    JOIN und e ON e.src = d.node) u GROUP BY node
        |), d2 AS (
        |  SELECT node, MIN(dist) AS dist FROM (
        |    SELECT node, dist FROM d1
        |    UNION ALL SELECT e.dst, d.dist + e.w FROM d1 d
        |    JOIN und e ON e.src = d.node) u GROUP BY node
        |), d3 AS (
        |  SELECT node, MIN(dist) AS dist FROM (
        |    SELECT node, dist FROM d2
        |    UNION ALL SELECT e.dst, d.dist + e.w FROM d2 d
        |    JOIN und e ON e.src = d.node) u GROUP BY node
        |)
        |SELECT node, CAST(dist AS BIGINT) AS dist FROM d3 ORDER BY node""".stripMargin,
    "bfs_reach" ->
      """WITH RECURSIVE e AS (
        |  SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS src,
        |         CAST(-l_partkey AS BIGINT) AS dst FROM lineitem
        |  UNION
        |  SELECT DISTINCT CAST(-l_partkey AS BIGINT), CAST(l_suppkey AS BIGINT)
        |  FROM lineitem
        |), bfs AS (
        |  SELECT CAST(s_suppkey AS BIGINT) AS node, 0 AS dist
        |  FROM supplier WHERE s_nationkey = 3
        |  UNION
        |  SELECT e.dst AS node, b.dist + 1 AS dist
        |  FROM bfs b JOIN e ON e.src = b.node
        |  WHERE b.dist < 3
        |)
        |SELECT node, CAST(MIN(dist) AS INTEGER) AS dist FROM bfs GROUP BY 1""".stripMargin,
    "interval_join_outer" ->
      """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
        |       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id
        | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 6 HOUR
        |ORDER BY click_id, purchase_id""".stripMargin,
    "rank_eval" ->
      """WITH ranked AS (
        |  SELECT l_orderkey,
        |         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS rel,
        |         ROW_NUMBER() OVER (PARTITION BY l_orderkey
        |           ORDER BY l_extendedprice DESC, l_linenumber) AS rnk
        |  FROM lineitem
        |), per AS (
        |  SELECT l_orderkey,
        |         SUM(rel) AS n_rel,
        |         SUM(CASE WHEN rnk <= 1 THEN rel ELSE 0 END) AS h1,
        |         SUM(CASE WHEN rnk <= 3 THEN rel ELSE 0 END) AS h3,
        |         SUM(CASE WHEN rnk <= 5 THEN rel ELSE 0 END) AS h5,
        |         MIN(CASE WHEN rel = 1 AND rnk <= 10 THEN rnk END) AS first_rel
        |  FROM ranked GROUP BY 1
        |), tot AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
        |         CAST(SUM(n_rel) AS BIGINT) AS sum_relevant,
        |         CAST(SUM(h1) AS BIGINT) AS s1,
        |         CAST(SUM(h3) AS BIGINT) AS s3,
        |         CAST(SUM(h5) AS BIGINT) AS s5,
        |         CAST(SUM(COALESCE(2520 // first_rel, 0)) AS BIGINT) AS mrr_num
        |  FROM per
        |)
        |SELECT v.k, t.n_queries, t.sum_relevant,
        |       CASE v.k WHEN 1 THEN t.s1 WHEN 3 THEN t.s3 ELSE t.s5 END AS sum_hits,
        |       t.mrr_num,
        |       CAST(CASE v.k WHEN 1 THEN t.s1 WHEN 3 THEN t.s3 ELSE t.s5 END AS DOUBLE)
        |         / (v.k * t.n_queries) AS precision_at_k,
        |       CAST(CASE v.k WHEN 1 THEN t.s1 WHEN 3 THEN t.s3 ELSE t.s5 END AS DOUBLE)
        |         / t.sum_relevant AS recall_at_k,
        |       CAST(t.mrr_num AS DOUBLE) / (2520.0 * t.n_queries) AS mrr_at_10
        |FROM tot t CROSS JOIN (SELECT * FROM (VALUES (1), (3), (5)) AS x(k)) v""".stripMargin,
    // the fixed-point discount table (round(1e9/log2(r+1)), r=1..10) and
    // its prefix sums are shared verbatim with Quality.ndcgEval
    "ndcg_eval" ->
      """WITH ranked AS (
        |  SELECT l_orderkey,
        |         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS rel,
        |         ROW_NUMBER() OVER (PARTITION BY l_orderkey
        |           ORDER BY l_extendedprice DESC, l_linenumber) AS rnk
        |  FROM lineitem
        |), d AS (
        |  SELECT [1000000000, 630929754, 500000000, 430676558, 386852807,
        |          356207187, 333333333, 315464877, 301029996, 289064826] AS ds,
        |         [0, 1000000000, 1630929754, 2130929754, 2561606312,
        |          2948459119, 3304666306, 3637999639, 3953464516,
        |          4254494512, 4543559338] AS ps
        |), per AS (
        |  SELECT l_orderkey, SUM(rel) AS n_rel,
        |         SUM(CASE WHEN rnk <= 5 AND rel = 1 THEN ds[rnk] ELSE 0 END) AS dcg5,
        |         SUM(CASE WHEN rnk <= 10 AND rel = 1 THEN ds[rnk] ELSE 0 END) AS dcg10
        |  FROM ranked, d GROUP BY 1
        |), tot AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
        |         CAST(SUM(dcg5) AS BIGINT) AS sd5,
        |         CAST(SUM(dcg10) AS BIGINT) AS sd10,
        |         CAST(SUM(ps[CAST(LEAST(n_rel, 5) + 1 AS BIGINT)]) AS BIGINT) AS si5,
        |         CAST(SUM(ps[CAST(LEAST(n_rel, 10) + 1 AS BIGINT)]) AS BIGINT) AS si10
        |  FROM per, d WHERE n_rel > 0
        |)
        |SELECT v.k, t.n_queries,
        |       CASE v.k WHEN 5 THEN t.sd5 ELSE t.sd10 END AS sum_dcg_scaled,
        |       CASE v.k WHEN 5 THEN t.si5 ELSE t.si10 END AS sum_idcg_scaled,
        |       CAST(CASE v.k WHEN 5 THEN t.sd5 ELSE t.sd10 END AS DOUBLE)
        |         / CAST(CASE v.k WHEN 5 THEN t.si5 ELSE t.si10 END AS DOUBLE)
        |         AS ndcg_micro
        |FROM tot t CROSS JOIN (SELECT * FROM (VALUES (5), (10)) AS x(k)) v""".stripMargin,
    "anomaly_windows" ->
      """WITH daily AS (
        |  SELECT event_type AS etype, date_trunc('day', ts) AS day,
        |         CAST(COUNT(*) AS BIGINT) AS y
        |  FROM events WHERE event_type IS NOT NULL
        |  GROUP BY 1, 2
        |), w AS (
        |  SELECT etype, day, y,
        |         CAST(COUNT(y) OVER win AS BIGINT) AS m,
        |         CAST(COALESCE(SUM(y) OVER win, 0) AS BIGINT) AS s,
        |         CAST(COALESCE(SUM(y * y) OVER win, 0) AS BIGINT) AS qq
        |  FROM daily
        |  WINDOW win AS (PARTITION BY etype ORDER BY day
        |                 ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
        |)
        |SELECT etype, day, y, m AS m_window,
        |       CASE WHEN m = 7
        |            THEN (m * y - s) * (m * y - s) > 9 * (m * qq - s * s)
        |            ELSE false END AS spike_flag,
        |       CASE WHEN m = 7 AND m * qq > s * s
        |            THEN (CAST(y AS DOUBLE) - CAST(s AS DOUBLE) / m)
        |                 / sqrt(CAST(m * qq - s * s AS DOUBLE)
        |                        / (CAST(m AS DOUBLE) * CAST(m AS DOUBLE)))
        |       END AS z
        |FROM w""".stripMargin,
    "window_dedup" ->
      """WITH b AS (
        |  SELECT user_id, event_type,
        |         CAST(floor(epoch(ts) / 3600) AS BIGINT) AS bucket, ts, event_id
        |  FROM events
        |), r AS (
        |  SELECT *,
        |         ROW_NUMBER() OVER (PARTITION BY user_id, event_type, bucket
        |                            ORDER BY ts, event_id) AS rn,
        |         COUNT(*) OVER (PARTITION BY user_id, event_type, bucket)
        |           AS arrivals
        |  FROM b
        |)
        |SELECT user_id, event_type, bucket * 3600 AS win_start_sec,
        |       event_id, CAST(arrivals - 1 AS BIGINT) AS n_dups,
        |       epoch_us(ts) AS ts_us
        |FROM r WHERE rn = 1""".stripMargin,
    // full recompute over the merged table — the invariant the
    // incremental path must reproduce
    "ivm_agg" ->
      s"""$dCdcCtes
         |SELECT nation, segment, CAST(COUNT(*) AS BIGINT) AS n_rows
         |FROM applied GROUP BY 1, 2""".stripMargin,
    // full recompute of the JOIN view over the merged table — the
    // invariant the incremental join maintenance must reproduce
    "ivm_join" ->
      s"""$dCdcCtes
         |SELECT a.cust_id, a.name, a.nation, a.segment, n.n_name AS nation_name
         |FROM applied a
         |LEFT JOIN nation n ON a.nation = CAST(n.n_nationkey AS BIGINT)""".stripMargin,
    "srm_check" ->
      """WITH v AS (
        |  SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
        |         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_units
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1
        |), t AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS k,
        |         CAST(SUM(n_units) AS BIGINT) AS n_total
        |  FROM v
        |), w AS (
        |  SELECT t.k, t.n_total,
        |         CAST(SUM((t.k * n_units - t.n_total) * (t.k * n_units - t.n_total)) AS BIGINT) AS w2
        |  FROM v CROSS JOIN t GROUP BY t.k, t.n_total
        |)
        |SELECT k, n_total, w2,
        |       CAST(CASE k WHEN 2 THEN 384 WHEN 3 THEN 599 WHEN 4 THEN 781
        |                   WHEN 5 THEN 949 WHEN 6 THEN 1107 WHEN 7 THEN 1259
        |                   WHEN 8 THEN 1407 WHEN 9 THEN 1551 WHEN 10 THEN 1692
        |                   WHEN 11 THEN 1831 END AS BIGINT) AS crit_centi,
        |       CAST(w2 AS DOUBLE) / CAST(k * n_total AS DOUBLE) AS chi2,
        |       100 * w2 > CASE k WHEN 2 THEN 384 WHEN 3 THEN 599 WHEN 4 THEN 781
        |                         WHEN 5 THEN 949 WHEN 6 THEN 1107 WHEN 7 THEN 1259
        |                         WHEN 8 THEN 1407 WHEN 9 THEN 1551 WHEN 10 THEN 1692
        |                         WHEN 11 THEN 1831 END * k * n_total AS srm_flag
        |FROM w""".stripMargin,
    "woe_iv" ->
      """WITH s AS (
        |  SELECT event_type AS category,
        |         CASE WHEN value > 50.0 THEN 1 ELSE 0 END AS y
        |  FROM events WHERE value IS NOT NULL
        |), g AS (
        |  SELECT category, CAST(SUM(y) AS BIGINT) AS n_pos,
        |         CAST(COUNT(*) - SUM(y) AS BIGINT) AS n_neg
        |  FROM s GROUP BY 1
        |), t AS (
        |  SELECT CAST(SUM(n_pos) AS BIGINT) AS p_tot,
        |         CAST(SUM(n_neg) AS BIGINT) AS n_tot
        |  FROM g
        |)
        |SELECT category, n_pos, n_neg,
        |       CASE WHEN n_pos > 0 AND n_neg > 0 AND p_tot > 0 AND n_tot > 0
        |            THEN round(ln(CAST(n_pos * n_tot AS DOUBLE)
        |                          / CAST(n_neg * p_tot AS DOUBLE)), 6) END AS woe,
        |       CASE WHEN n_pos > 0 AND n_neg > 0 AND p_tot > 0 AND n_tot > 0
        |            THEN round((CAST(n_pos AS DOUBLE) / CAST(p_tot AS DOUBLE)
        |                        - CAST(n_neg AS DOUBLE) / CAST(n_tot AS DOUBLE))
        |                       * ln(CAST(n_pos * n_tot AS DOUBLE)
        |                            / CAST(n_neg * p_tot AS DOUBLE)), 6) END AS iv_term
        |FROM g CROSS JOIN t
        |ORDER BY category""".stripMargin,
    "scaler_fit" ->
      s"""WITH b AS (
         |  SELECT event_id, value,
         |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
         |         ${dH("'scale:' || CAST(event_id AS VARCHAR)")} % 100 < 80 AS is_train
         |  FROM events WHERE value IS NOT NULL AND event_id IS NOT NULL
         |), f AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_train,
         |         CAST(SUM(cents) AS BIGINT) AS sx,
         |         SUM(cents * cents) AS sxx,
         |         MIN(cents) AS mnc, MAX(cents) AS mxc
         |  FROM b WHERE is_train
         |)
         |SELECT event_id, value, is_train, n_train,
         |       CASE WHEN n_train > 0 AND mnc <> mxc
         |            THEN round((CAST(cents AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n_train AS DOUBLE))
         |                       / sqrt((CAST(n_train AS DOUBLE) * CAST(sxx AS DOUBLE)
         |                               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
         |                              / (CAST(n_train AS DOUBLE) * CAST(n_train AS DOUBLE))), 6)
         |       END AS z
         |FROM b CROSS JOIN f
         |ORDER BY event_id""".stripMargin,
    "pseudonymize" ->
      """SELECT md5('release24:' || CAST(user_id AS VARCHAR)) AS user_id_pseudo,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
        |FROM events
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "conformal_interval" ->
      s"""WITH b AS (
         |  SELECT event_id, event_type,
         |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
         |         ${dH("'conf:' || CAST(event_id AS VARCHAR)")} % 100 AS band
         |  FROM events
         |  WHERE value IS NOT NULL AND event_id IS NOT NULL AND event_type IS NOT NULL
         |), t AS (
         |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_train,
         |         CAST(SUM(cents) AS BIGINT) AS sx
         |  FROM b WHERE band < 50 GROUP BY 1
         |), cr AS (
         |  SELECT b.event_type, abs(b.cents * t.n_train - t.sx) AS resid,
         |         row_number() OVER (PARTITION BY b.event_type
         |           ORDER BY abs(b.cents * t.n_train - t.sx), b.event_id) AS rk,
         |         COUNT(*) OVER (PARTITION BY b.event_type) AS n_cal
         |  FROM b JOIN t USING (event_type) WHERE band >= 50 AND band < 75
         |), q AS (
         |  SELECT event_type, CAST(n_cal AS BIGINT) AS n_cal,
         |         CAST(resid AS BIGINT) AS qhat_scaled
         |  FROM cr WHERE rk = LEAST(n_cal, (90 * (n_cal + 1) + 99) // 100)
         |)
         |SELECT b.event_type, t.n_train, q.n_cal,
         |       CAST(COUNT(*) AS BIGINT) AS n_test, q.qhat_scaled,
         |       CAST(SUM(CASE WHEN abs(b.cents * t.n_train - t.sx) <= q.qhat_scaled
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
         |       CAST(SUM(CASE WHEN abs(b.cents * t.n_train - t.sx) <= q.qhat_scaled
         |                     THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS coverage
         |FROM b JOIN t USING (event_type) JOIN q USING (event_type)
         |WHERE band >= 75
         |GROUP BY 1, 2, 3, 5
         |ORDER BY 1""".stripMargin,
    "calibration_curve" ->
      """WITH s AS (
        |  SELECT CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS sc_fp,
        |         event_type = 'purchase' AS y
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
        |), m AS (SELECT MIN(sc_fp) AS mn, MAX(sc_fp) AS mx FROM s)
        |SELECT CAST((sc_fp - mn) * 10 // (mx - mn + 1) AS INT) AS bucket,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |       CAST(MIN(sc_fp) AS DOUBLE) / 1000000.0 AS bucket_lo,
        |       CAST(MAX(sc_fp) AS DOUBLE) / 1000000.0 AS bucket_hi,
        |       CAST(SUM(sc_fp) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
        |         / 1000000.0 AS mean_score,
        |       CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS DOUBLE)
        |         / CAST(COUNT(*) AS DOUBLE) AS pos_rate
        |FROM s CROSS JOIN m
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "session_close" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events
        |), s AS (
        |  SELECT user_id, event_id, ts,
        |         CASE WHEN prev_ts IS NULL
        |                   OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
        |              THEN 1 ELSE 0 END AS st
        |  FROM g
        |), q AS (
        |  SELECT user_id, ts,
        |         CAST(SUM(st) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        |  FROM s
        |), per AS (
        |  SELECT user_id, session_seq,
        |         CAST(user_id AS VARCHAR) || '-' || CAST(session_seq AS VARCHAR) AS session_id,
        |         CAST(COUNT(*) AS BIGINT) AS n_events,
        |         MAX(ts) AS last_ts,
        |         MAX(CAST(session_seq AS BIGINT)) OVER (PARTITION BY user_id) AS max_seq
        |  FROM q GROUP BY user_id, session_seq
        |), h AS (SELECT MAX(epoch_us(ts)) - 600000000 AS wm_us FROM events)
        |SELECT user_id, session_seq, session_id, n_events,
        |       epoch_us(last_ts) AS last_ts_us
        |FROM per CROSS JOIN h
        |WHERE session_seq < max_seq
        |   OR epoch_us(last_ts) + 1800000000 < wm_us""".stripMargin,
    "time_split_embargo" ->
      """SELECT CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00' THEN 'train'
        |            WHEN ts < TIMESTAMP '2024-01-15 00:00:00' + INTERVAL 2 DAY THEN 'embargo'
        |            ELSE 'test' END AS split,
        |       CAST(COUNT(*) AS BIGINT) AS n_rows,
        |       CAST(MIN(CAST(ts AS DATE)) AS VARCHAR) AS min_day,
        |       CAST(MAX(CAST(ts AS DATE)) AS VARCHAR) AS max_day
        |FROM events WHERE ts IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "ctfidf_terms" ->
      """WITH tfc AS (
        |  SELECT lang AS cls, t.token, CAST(COUNT(*) AS BIGINT) AS tf_class
        |  FROM documents, unnest(string_split(text, ' ')) AS t(token)
        |  WHERE text IS NOT NULL AND lang IS NOT NULL AND t.token <> ''
        |  GROUP BY 1, 2
        |), tfg AS (
        |  SELECT token, CAST(SUM(tf_class) AS BIGINT) AS tf_global
        |  FROM tfc GROUP BY 1
        |), tot AS (
        |  SELECT CAST(SUM(tf_global) AS BIGINT) AS total_tokens FROM tfg
        |), scored AS (
        |  SELECT cls, tfc.token, tf_class, tf_global,
        |         tf_class * (CAST(total_tokens AS DOUBLE) / tf_global) AS score
        |  FROM tfc JOIN tfg ON tfc.token = tfg.token CROSS JOIN tot
        |), rr AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY cls
        |    ORDER BY score DESC, token) AS rk
        |  FROM scored
        |)
        |SELECT cls, token, tf_class, tf_global, score,
        |       CAST(rk AS BIGINT) AS rank
        |FROM rr WHERE rk <= 5""".stripMargin,
    "fk_audit" -> {
      def edge(name: String, child: String, fk: String,
               parent: String, pk: String): String =
        s"""SELECT '$name' AS edge,
           |  CAST(COALESCE(SUM(CASE WHEN c.fk IS NOT NULL THEN c.cnt END), 0) AS BIGINT) AS fk_rows,
           |  CAST(COALESCE(SUM(CASE WHEN c.fk IS NULL THEN c.cnt END), 0) AS BIGINT) AS null_fk_rows,
           |  CAST(COUNT(CASE WHEN c.fk IS NOT NULL THEN 1 END) AS BIGINT) AS distinct_fk,
           |  CAST(COALESCE(SUM(CASE WHEN c.fk IS NOT NULL AND p.pk IS NULL THEN c.cnt END), 0) AS BIGINT) AS orphan_rows,
           |  CAST(COUNT(CASE WHEN c.fk IS NOT NULL AND p.pk IS NULL THEN 1 END) AS BIGINT) AS orphan_keys,
           |  CAST(COALESCE(SUM(CASE WHEN c.fk IS NOT NULL AND (p.pk IS NULL OR p.pk % 1000 = 7) THEN c.cnt END), 0) AS BIGINT) AS erased_orphan_rows,
           |  CAST(COUNT(CASE WHEN c.fk IS NOT NULL AND (p.pk IS NULL OR p.pk % 1000 = 7) THEN 1 END) AS BIGINT) AS erased_orphan_keys
           |FROM (SELECT CAST($fk AS BIGINT) AS fk, CAST(COUNT(*) AS BIGINT) AS cnt
           |      FROM $child GROUP BY 1) c
           |LEFT JOIN (SELECT DISTINCT CAST($pk AS BIGINT) AS pk FROM $parent) p
           |  ON c.fk = p.pk""".stripMargin
      Seq(
        edge("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        edge("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
        edge("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        edge("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
        edge("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        edge("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
        edge("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"))
        .mkString("\nUNION ALL\n")
    },
    "link_predict" ->
      """WITH e AS (
        |  SELECT DISTINCT LEAST(l_suppkey, l_partkey + 1000000) AS a,
        |         GREATEST(l_suppkey, l_partkey + 1000000) AS b
        |  FROM lineitem WHERE l_suppkey <> l_partkey + 1000000
        |), adj AS (
        |  SELECT a AS node, b AS nbr FROM e UNION ALL SELECT b, a FROM e
        |), deg AS (
        |  SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM adj GROUP BY 1
        |), ctr AS (
        |  SELECT adj.node, adj.nbr FROM adj JOIN deg USING (node)
        |  WHERE deg.degree <= 50
        |), c AS (
        |  SELECT i.nbr AS u, j.nbr AS v, CAST(COUNT(*) AS BIGINT) AS cn
        |  FROM ctr i JOIN ctr j ON i.node = j.node AND i.nbr < j.nbr
        |  GROUP BY 1, 2
        |), unl AS (
        |  SELECT c.* FROM c
        |  WHERE NOT EXISTS (SELECT 1 FROM e WHERE c.u = e.a AND c.v = e.b)
        |), sc AS (
        |  SELECT unl.u, unl.v, unl.cn, du.degree AS deg_u, dv.degree AS deg_v
        |  FROM unl JOIN deg du ON du.node = unl.u
        |           JOIN deg dv ON dv.node = unl.v
        |), dir AS (
        |  SELECT u AS node, v AS other, cn, deg_u AS deg_node,
        |         deg_v AS deg_other FROM sc
        |  UNION ALL
        |  SELECT v, u, cn, deg_v, deg_u FROM sc
        |), j AS (
        |  SELECT node, other, cn, deg_node, deg_other,
        |         CAST(cn AS DOUBLE)
        |           / CAST(deg_node + deg_other - cn AS DOUBLE) AS jaccard,
        |         deg_node * deg_other AS pref_attach
        |  FROM dir
        |), r AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY node
        |              ORDER BY jaccard DESC, cn DESC, other) AS INT) AS rk
        |  FROM j
        |)
        |SELECT node, other, cn, deg_node, deg_other, jaccard, pref_attach, rk
        |FROM r WHERE rk <= 5""".stripMargin,
    "target_encode" ->
      """WITH b AS (
        |  SELECT p.p_brand AS category,
        |         l.l_returnflag = 'R' AS y,
        |         CAST(l.l_orderkey % 5 AS INT) AS fold
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE p.p_brand IS NOT NULL AND l.l_returnflag IS NOT NULL
        |    AND l.l_orderkey IS NOT NULL
        |), pf AS (
        |  SELECT category, fold, CAST(COUNT(*) AS BIGINT) AS cnt_fold,
        |         CAST(COUNT(CASE WHEN y THEN 1 END) AS BIGINT) AS pos_fold
        |  FROM b GROUP BY 1, 2
        |), pc AS (
        |  SELECT category, CAST(SUM(cnt_fold) AS BIGINT) AS cnt_cat,
        |         CAST(SUM(pos_fold) AS BIGINT) AS pos_cat
        |  FROM pf GROUP BY 1
        |), g AS (
        |  SELECT CAST(SUM(cnt_fold) AS BIGINT) AS n_total,
        |         CAST(SUM(pos_fold) AS BIGINT) AS pos_total FROM pf
        |)
        |SELECT pf.category, pf.fold, pf.cnt_fold, pf.pos_fold,
        |       pc.cnt_cat - pf.cnt_fold AS cnt_oof,
        |       pc.pos_cat - pf.pos_fold AS pos_oof,
        |       g.n_total, g.pos_total,
        |       CAST((pc.pos_cat - pf.pos_fold) * g.n_total
        |              + 20 * g.pos_total AS DOUBLE)
        |         / CAST((pc.cnt_cat - pf.cnt_fold + 20) * g.n_total AS DOUBLE) AS te
        |FROM pf JOIN pc USING (category) CROSS JOIN g""".stripMargin,
    "quantile_normalize" ->
      """WITH b AS (
        |  SELECT event_type AS grp, value, event_id AS id
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
        |), r AS (
        |  SELECT grp, id, value,
        |         CAST(row_number() OVER (PARTITION BY grp ORDER BY value, id)
        |              AS BIGINT) AS rank_in_group,
        |         CAST(COUNT(*) OVER (PARTITION BY grp) AS BIGINT) AS n_group
        |  FROM b
        |), ref AS (
        |  SELECT CAST(row_number() OVER (ORDER BY value, id) AS BIGINT) AS global_rank,
        |         value AS normalized
        |  FROM b
        |), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_all FROM b)
        |SELECT r.grp, r.id, r.value, r.rank_in_group, r.n_group,
        |       (r.rank_in_group * n.n_all + r.n_group - 1) // r.n_group AS global_rank,
        |       ref.normalized
        |FROM r CROSS JOIN n
        |JOIN ref ON ref.global_rank =
        |  (r.rank_in_group * n.n_all + r.n_group - 1) // r.n_group""".stripMargin,
    "autocorr" ->
      """WITH daily AS (
        |  SELECT event_type AS etype, date_trunc('day', ts) AS day,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2
        |), l AS (
        |  SELECT etype, n,
        |         row_number() OVER (PARTITION BY etype ORDER BY day) AS t
        |  FROM daily
        |), st AS (
        |  SELECT etype, CAST(COUNT(*) AS BIGINT) AS n_days,
        |         CAST(SUM(n) AS BIGINT) AS s, CAST(SUM(n * n) AS BIGINT) AS q
        |  FROM l GROUP BY 1
        |), lg AS (SELECT CAST(unnest(range(1, 8)) AS BIGINT) AS lag),
        |pr AS (
        |  SELECT i.etype, g.lag,
        |         CAST(SUM(i.n * j.n) AS BIGINT) AS ck,
        |         CAST(SUM(i.n) AS BIGINT) AS ak,
        |         CAST(SUM(j.n) AS BIGINT) AS bk
        |  FROM l i CROSS JOIN lg g
        |  JOIN l j ON j.etype = i.etype AND j.t = i.t + g.lag
        |  GROUP BY 1, 2
        |)
        |SELECT p.etype, CAST(p.lag AS INT) AS lag, st.n_days,
        |       st.n_days * st.n_days * p.ck - st.n_days * st.s * (p.ak + p.bk)
        |         + (st.n_days - p.lag) * st.s * st.s AS acf_num,
        |       st.n_days * (st.n_days * st.q - st.s * st.s) AS acf_den,
        |       CAST(st.n_days * st.n_days * p.ck - st.n_days * st.s * (p.ak + p.bk)
        |              + (st.n_days - p.lag) * st.s * st.s AS DOUBLE)
        |         / CAST(st.n_days * (st.n_days * st.q - st.s * st.s) AS DOUBLE) AS acf
        |FROM pr p JOIN st USING (etype)
        |WHERE st.n_days * (st.n_days * st.q - st.s * st.s) > 0""".stripMargin,
    "seasonal_decompose" ->
      """WITH daily AS (
        |  SELECT event_type AS etype, date_trunc('day', ts) AS day,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2
        |), t AS (
        |  SELECT etype, day, CAST(isodow(day) AS INT) AS dow, n,
        |         CAST(SUM(n) OVER w AS BIGINT) AS trend_sum7,
        |         CAST(COUNT(*) OVER w AS BIGINT) AS win_n
        |  FROM daily
        |  WINDOW w AS (PARTITION BY etype ORDER BY day
        |               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        |), f AS (SELECT * FROM t WHERE win_n = 7),
        |se AS (
        |  SELECT etype, dow, CAST(SUM(7 * n - trend_sum7) AS BIGINT) AS seas_num,
        |         CAST(COUNT(*) AS BIGINT) AS seas_den
        |  FROM f GROUP BY 1, 2
        |)
        |SELECT f.etype, f.day, f.dow, f.n, f.trend_sum7, se.seas_num, se.seas_den,
        |       CAST(f.trend_sum7 AS DOUBLE) / 7.0 AS trend,
        |       CAST(se.seas_num AS DOUBLE) / CAST(7 * se.seas_den AS DOUBLE) AS seasonal,
        |       CAST(f.n AS DOUBLE) - CAST(f.trend_sum7 AS DOUBLE) / 7.0
        |         - CAST(se.seas_num AS DOUBLE) / CAST(7 * se.seas_den AS DOUBLE) AS residual
        |FROM f JOIN se USING (etype, dow)""".stripMargin,
    "weekday_profile" ->
      """WITH c AS (
        |  SELECT event_type AS etype, CAST(isodow(ts) AS INT) AS dow,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2
        |), t AS (SELECT etype, CAST(SUM(n) AS BIGINT) AS n_type FROM c GROUP BY 1),
        |d AS (SELECT dow, CAST(SUM(n) AS BIGINT) AS n_dow FROM c GROUP BY 1),
        |a AS (SELECT CAST(SUM(n) AS BIGINT) AS n_all FROM c)
        |SELECT c.etype, c.dow, c.n, t.n_type, d.n_dow,
        |       CAST(t.n_type AS DOUBLE) * CAST(d.n_dow AS DOUBLE)
        |         / CAST(a.n_all AS DOUBLE) AS expected,
        |       CAST(c.n AS DOUBLE)
        |         / (CAST(t.n_type AS DOUBLE) * CAST(d.n_dow AS DOUBLE)
        |            / CAST(a.n_all AS DOUBLE)) AS ratio
        |FROM c JOIN t USING (etype) JOIN d USING (dow), a""".stripMargin,
    "conversion_lag" ->
      """WITH f AS (
        |  SELECT user_id,
        |         MIN(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS first_from,
        |         MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS first_to
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1
        |), l AS (
        |  SELECT 'click_to_purchase' AS metric,
        |         CAST(first_to - first_from AS BIGINT) AS lag_us
        |  FROM f
        |  WHERE first_from IS NOT NULL AND first_to IS NOT NULL AND first_to >= first_from
        |), r AS (
        |  SELECT metric, lag_us,
        |         row_number() OVER (PARTITION BY metric ORDER BY lag_us) AS rn,
        |         CAST(COUNT(*) OVER (PARTITION BY metric) AS BIGINT) AS n
        |  FROM l
        |)
        |SELECT metric, q AS q_permille, n, lag_us
        |FROM r, (SELECT unnest([250, 500, 750, 900]) AS q)
        |WHERE rn = (q * n + 999) // 1000""".stripMargin,
    "vocab_growth" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x != '')) AS token
        |  FROM documents
        |), firsts AS (
        |  SELECT token, MIN(doc_id) AS first_doc FROM tok GROUP BY 1
        |), mx AS (SELECT MAX(doc_id) AS max_id FROM documents),
        |b AS (
        |  SELECT CAST(LEAST((first_doc - 1) * 10 // max_id, 9) AS INT) AS bucket
        |  FROM firsts, mx
        |), c AS (
        |  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_new_tokens FROM b GROUP BY 1
        |), axis AS (SELECT CAST(unnest(range(0, 10)) AS INT) AS bucket)
        |SELECT axis.bucket,
        |       CAST(COALESCE(c.n_new_tokens, 0) AS BIGINT) AS n_new_tokens,
        |       CAST(SUM(COALESCE(c.n_new_tokens, 0)) OVER (ORDER BY axis.bucket
        |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_vocab
        |FROM axis LEFT JOIN c USING (bucket)""".stripMargin,
    "quantile_elements" ->
      """WITH r AS (
        |  SELECT l_returnflag AS g, l_extendedprice AS v,
        |         row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
        |         CAST(COUNT(*) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL
        |)
        |SELECT g AS l_returnflag, q AS q_permille, n, v AS l_extendedprice
        |FROM r, (SELECT unnest([250, 500, 750, 900, 990]) AS q)
        |WHERE rn = (q * n + 999) // 1000""".stripMargin,
    "event_gaps" ->
      """WITH e AS (
        |  SELECT user_id, event_type, ts, event_id FROM events WHERE user_id IS NOT NULL
        |), g AS (
        |  SELECT event_type,
        |         LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |           - epoch_us(ts) AS gap_us
        |  FROM e
        |), r AS (
        |  SELECT event_type AS grp, CAST(gap_us AS BIGINT) AS v,
        |         row_number() OVER (PARTITION BY event_type ORDER BY gap_us) AS rn,
        |         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |  FROM g WHERE gap_us IS NOT NULL
        |)
        |SELECT grp AS event_type, q AS q_permille, n, v AS gap_us
        |FROM r, (SELECT unnest([500, 900, 990]) AS q)
        |WHERE rn = (q * n + 999) // 1000""".stripMargin,
    "ab_lift" ->
      """WITH e AS (
        |  SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
        |         user_id, event_type = 'purchase' AS converted
        |  FROM events WHERE user_id IS NOT NULL
        |), per AS (
        |  SELECT variant,
        |         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_units,
        |         CAST(COUNT(DISTINCT CASE WHEN converted THEN user_id END) AS BIGINT) AS n_conv
        |  FROM e GROUP BY 1
        |), a AS (SELECT n_units AS n_a, n_conv AS c_a FROM per WHERE variant = 'A'),
        |b AS (SELECT n_units AS n_b, n_conv AS c_b FROM per WHERE variant = 'B')
        |SELECT n_a, c_a, n_b, c_b,
        |       CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS rate_a,
        |       CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS rate_b,
        |       CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE) - CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS abs_lift,
        |       CASE WHEN c_a > 0 THEN
        |         (CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE)) / (CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE)) - 1.0
        |       END AS rel_lift,
        |       CASE WHEN c_a + c_b > 0 AND c_a + c_b < n_a + n_b THEN
        |         (CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE) - CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE))
        |         / sqrt((CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
        |                * (1.0 - CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
        |                * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
        |       END AS z_score
        |FROM a, b""".stripMargin,
    "impute_values" ->
      s"""WITH e AS (
         |  SELECT event_id, event_type,
         |         CASE WHEN ${dH("'imp:' || CAST(event_id AS VARCHAR)")} % 10 = 0
         |              THEN NULL ELSE value END AS value
         |  FROM events
         |), m AS (
         |  SELECT _g, _v AS _med FROM (
         |    SELECT event_type AS _g, value AS _v,
         |           row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
         |           COUNT(*) OVER (PARTITION BY event_type) AS cnt
         |    FROM e WHERE value IS NOT NULL) t
         |  WHERE rn = (cnt + 1) // 2
         |)
         |SELECT e.event_id, e.event_type, e.value,
         |       COALESCE(e.value, m._med) AS value_imputed,
         |       e.value IS NULL AS was_imputed
         |FROM e LEFT JOIN m ON e.event_type IS NOT DISTINCT FROM m._g""".stripMargin,
    "compact_plan" ->
      """WITH f AS (
        |  SELECT date_trunc('month', l_shipdate) AS part, l_orderkey % 50 AS file_id,
        |         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS bytes
        |  FROM lineitem GROUP BY 1, 2
        |), p AS (
        |  SELECT part, file_id, bytes,
        |         COALESCE(SUM(bytes) OVER (PARTITION BY part ORDER BY bytes DESC, file_id
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
        |  FROM f
        |), b AS (
        |  SELECT part, file_id, bytes, CAST(pre // 8000000 AS BIGINT) AS bin_id FROM p
        |)
        |SELECT part, file_id, bytes, bin_id,
        |       CAST(SUM(bytes) OVER (PARTITION BY part, bin_id) AS BIGINT) AS bin_bytes,
        |       CAST(COUNT(*) OVER (PARTITION BY part, bin_id) AS BIGINT) AS bin_files
        |FROM b""".stripMargin,
    "fingerprints" ->
      s"""$dToksCte, s AS (
         |  SELECT doc_id, text, $dSh AS sh FROM t
         |)
         |SELECT doc_id,
         |       ${dH("text")} AS text_hash,
         |       list_min(list_transform(sh, s2 -> ${dH("s2")})) AS min_shingle_hash,
         |       CAST(len(sh) AS BIGINT) AS n_shingles
         |FROM s""".stripMargin,
    "dedup_exact" ->
      s"""SELECT ${dH("text")} AS text_hash,
         |       MIN(doc_id) AS keeper_doc_id,
         |       COUNT(*) AS n_copies
         |FROM documents
         |GROUP BY 1""".stripMargin,
    "dedup_keep_first" ->
      s"""WITH k AS (
         |  SELECT MIN(doc_id) AS keeper FROM documents GROUP BY ${dH("text")}
         |)
         |SELECT doc_id, lang, source, n_chars
         |FROM documents WHERE doc_id IN (SELECT keeper FROM k)""".stripMargin,
    "minhash_sigs" ->
      s"""$dToksCte, s AS (
         |  SELECT doc_id, $dSh AS sh FROM t
         |), h2 AS (
         |  SELECT doc_id, list_transform(sh, s2 -> ${dH("s2")}) AS hs FROM s
         |), m AS (
         |  SELECT doc_id,
         |       $dMh
         |  FROM h2
         |)
         |SELECT doc_id, mh0, mh1, mh2, mh3, mh4, mh5, mh6, mh7,
         |       ${dH("concat_ws(',', mh0, mh1, mh2, mh3)")} AS band0,
         |       ${dH("concat_ws(',', mh4, mh5, mh6, mh7)")} AS band1
         |FROM m""".stripMargin,
    "minhash_pairs" ->
      s"""$dToksCte, s AS (
         |  SELECT doc_id, $dSh AS sh FROM t
         |), h2 AS (
         |  SELECT doc_id, list_transform(sh, s2 -> ${dH("s2")}) AS hs FROM s
         |), m AS (
         |  SELECT doc_id,
         |       $dMh
         |  FROM h2
         |), sig AS (
         |  SELECT doc_id, mh0, mh1, mh2, mh3, mh4, mh5, mh6, mh7,
         |         ${dH("concat_ws(',', mh0, mh1, mh2, mh3)")} AS band0,
         |         ${dH("concat_ws(',', mh4, mh5, mh6, mh7)")} AS band1
         |  FROM m
         |)
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |       CAST(${(0 until 8).map(i => s"CASE WHEN a.mh$i = b.mh$i THEN 1 ELSE 0 END").mkString(" + ")} AS DOUBLE) / 8.0 AS est_jaccard
         |FROM sig a JOIN sig b
         |  ON a.doc_id < b.doc_id AND (a.band0 = b.band0 OR a.band1 = b.band1)""".stripMargin,
    "incremental_dedup" ->
      s"""$dToksCte, s AS (
         |  SELECT doc_id, $dSh AS sh FROM t
         |), h2 AS (
         |  SELECT doc_id, list_transform(sh, s2 -> ${dH("s2")}) AS hs FROM s
         |), m AS (
         |  SELECT doc_id,
         |       $dMh
         |  FROM h2
         |), sig AS (
         |  SELECT doc_id,
         |         ${dH("concat_ws(',', mh0, mh1, mh2, mh3)")} AS band0,
         |         ${dH("concat_ws(',', mh4, mh5, mh6, mh7)")} AS band1
         |  FROM m
         |), matches AS (
         |  SELECT n.doc_id, MIN(e.doc_id) AS dup_of
         |  FROM sig n JOIN sig e
         |    ON n.doc_id % 5 = 4 AND NOT (e.doc_id % 5 = 4)
         |   AND (n.band0 = e.band0 OR n.band1 = e.band1)
         |  GROUP BY n.doc_id
         |)
         |SELECT f.doc_id, matches.dup_of,
         |       CAST(matches.dup_of IS NOT NULL AS INT) AS is_known_dup
         |FROM (SELECT doc_id FROM sig WHERE doc_id % 5 = 4) f
         |LEFT JOIN matches USING (doc_id)""".stripMargin,
    "incremental_fuzzy_dedup" ->
      s"""$dToksCte, s AS (
         |  SELECT doc_id, $dSh AS sh FROM t
         |), h2 AS (
         |  SELECT doc_id, list_transform(sh, s2 -> ${dH("s2")}) AS hs FROM s
         |), m AS (
         |  SELECT doc_id,
         |       $dMh
         |  FROM h2
         |), sig AS (
         |  SELECT doc_id,
         |         ${dH("concat_ws(',', mh0, mh1, mh2, mh3)")} AS band0,
         |         ${dH("concat_ws(',', mh4, mh5, mh6, mh7)")} AS band1,
         |         mh0, mh1, mh2, mh3, mh4, mh5, mh6, mh7
         |  FROM m
         |), matches AS (
         |  SELECT n.doc_id, MIN(e.doc_id) AS dup_of
         |  FROM sig n JOIN sig e
         |    ON n.doc_id % 5 = 4 AND NOT (e.doc_id % 5 = 4)
         |   AND (n.band0 = e.band0 OR n.band1 = e.band1)
         |   AND (${(0 until 8).map(i => s"CASE WHEN n.mh$i = e.mh$i THEN 1 ELSE 0 END").mkString(" + ")}) >= 6
         |  GROUP BY n.doc_id
         |)
         |SELECT f.doc_id, matches.dup_of,
         |       CAST(matches.dup_of IS NOT NULL AS INT) AS is_known_dup
         |FROM (SELECT doc_id FROM sig WHERE doc_id % 5 = 4) f
         |LEFT JOIN matches USING (doc_id)""".stripMargin,
    // the Bloom screen is engine machinery, not semantics: no false
    // negatives + exact confirm join ⇒ the answer IS content-hash
    // incremental dedup, which is what the oracle states directly
    "bloom_screen_dedup" ->
      s"""WITH sig AS (
         |  SELECT doc_id, ${dH("text")} AS h, (doc_id % 5 = 4) AS is_new
         |  FROM documents
         |), m AS (
         |  SELECT n.doc_id, MIN(e.doc_id) AS dup_of
         |  FROM sig n JOIN sig e ON n.h = e.h AND n.is_new AND NOT e.is_new
         |  GROUP BY n.doc_id
         |)
         |SELECT s.doc_id, m.dup_of,
         |       CAST(m.dup_of IS NOT NULL AS INT) AS is_known_dup
         |FROM sig s LEFT JOIN m USING (doc_id)
         |WHERE s.is_new""".stripMargin,
    // sharding is pure implementation: the screen-then-verify output is
    // the exact content-hash incremental dedup either way, so the oracle
    // is the same join
    "bloom_screen_dedup_sharded" ->
      s"""WITH sig AS (
         |  SELECT doc_id, ${dH("text")} AS h, (doc_id % 5 = 4) AS is_new
         |  FROM documents
         |), m AS (
         |  SELECT n.doc_id, MIN(e.doc_id) AS dup_of
         |  FROM sig n JOIN sig e ON n.h = e.h AND n.is_new AND NOT e.is_new
         |  GROUP BY n.doc_id
         |)
         |SELECT s.doc_id, m.dup_of,
         |       CAST(m.dup_of IS NOT NULL AS INT) AS is_known_dup
         |FROM sig s LEFT JOIN m USING (doc_id)
         |WHERE s.is_new""".stripMargin,
    "simhash" ->
      s"""$dToksCte, h AS (
         |  SELECT doc_id, list_transform(toks, tk -> ${dH("tk")}) AS hs FROM t
         |), b AS (
         |  SELECT doc_id,
         |       $dSimhashBits
         |  FROM h
         |)
         |SELECT doc_id, COALESCE(CAST($dSimhashPack AS BIGINT), 0) AS simhash FROM b""".stripMargin,
    "fim_split" ->
      s"""WITH b AS (
         |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n,
         |         (${dH("'fim:' || CAST(doc_id AS VARCHAR)")} % 100 < 50) AS elected,
         |         ${dH("'fim_a:' || CAST(doc_id AS VARCHAR)")}
         |           % greatest(CAST(length(text) AS BIGINT) - 1, 1) + 1 AS a_raw,
         |         ${dH("'fim_b:' || CAST(doc_id AS VARCHAR)")}
         |           % greatest(CAST(length(text) AS BIGINT) - 1, 1) + 1 AS b_raw
         |  FROM documents
         |), s AS (
         |  SELECT doc_id, text, CAST(elected AND n >= 2 AS INT) AS fim,
         |         CAST(least(a_raw, b_raw) AS INT) AS lo,
         |         CAST(greatest(a_raw, b_raw) AS INT) AS hi
         |  FROM b
         |), parts AS (
         |  SELECT doc_id, fim,
         |         CASE WHEN fim = 1 THEN substr(text, 1, lo - 1) ELSE text END AS prefix,
         |         CASE WHEN fim = 1 THEN substr(text, lo, hi - lo) ELSE '' END AS middle,
         |         CASE WHEN fim = 1 THEN substr(text, hi) ELSE '' END AS suffix
         |  FROM s
         |)
         |SELECT doc_id, fim, prefix, middle, suffix,
         |       CASE WHEN fim = 1
         |            THEN '<PRE>' || prefix || '<SUF>' || suffix || '<MID>' || middle
         |            ELSE prefix END AS assembled
         |FROM parts""".stripMargin,
    "script_mix" ->
      """WITH dec AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 1 THEN text || ' ' ||
        |           repeat(chr(1072) || chr(1073) || chr(1074),
        |                  CAST(doc_id % 3 + 1 AS INT))
        |         WHEN doc_id % 5 = 2 THEN text || ' ' || chr(20013) || chr(25991)
        |         WHEN doc_id % 5 = 3 THEN text || ' ' || chr(1575) || chr(1576) || chr(1580)
        |         WHEN doc_id % 5 = 4 THEN text || ' ' || chr(945) || chr(946) || chr(947) || '42'
        |         ELSE text END AS text
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, text,
        |    length(text) - length(regexp_replace(text,
        |      '[A-Za-z' || chr(192) || '-' || chr(591) || ']', '', 'g')) AS n_latin,
        |    length(text) - length(regexp_replace(text,
        |      '[' || chr(1024) || '-' || chr(1279) || ']', '', 'g')) AS n_cyrillic,
        |    length(text) - length(regexp_replace(text,
        |      '[' || chr(19968) || '-' || chr(40959) || chr(12352) || '-' || chr(12543) || ']', '', 'g')) AS n_cjk,
        |    length(text) - length(regexp_replace(text,
        |      '[' || chr(1536) || '-' || chr(1791) || ']', '', 'g')) AS n_arabic,
        |    length(text) - length(regexp_replace(text,
        |      '[' || chr(880) || '-' || chr(1023) || ']', '', 'g')) AS n_greek,
        |    length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit
        |  FROM dec
        |)
        |SELECT doc_id,
        |  CAST(n_latin AS BIGINT) AS n_latin,
        |  CAST(n_cyrillic AS BIGINT) AS n_cyrillic,
        |  CAST(n_cjk AS BIGINT) AS n_cjk,
        |  CAST(n_arabic AS BIGINT) AS n_arabic,
        |  CAST(n_greek AS BIGINT) AS n_greek,
        |  CAST(n_digit AS BIGINT) AS n_digit,
        |  CAST(length(text) - (n_latin + n_cyrillic + n_cjk + n_arabic + n_greek + n_digit)
        |       AS BIGINT) AS n_other,
        |  CASE WHEN n_latin >= n_cyrillic AND n_latin >= n_cjk
        |            AND n_latin >= n_arabic AND n_latin >= n_greek THEN 'latin'
        |       WHEN n_cyrillic >= n_latin AND n_cyrillic >= n_cjk
        |            AND n_cyrillic >= n_arabic AND n_cyrillic >= n_greek THEN 'cyrillic'
        |       WHEN n_cjk >= n_latin AND n_cjk >= n_cyrillic
        |            AND n_cjk >= n_arabic AND n_cjk >= n_greek THEN 'cjk'
        |       WHEN n_arabic >= n_latin AND n_arabic >= n_cyrillic
        |            AND n_arabic >= n_cjk AND n_arabic >= n_greek THEN 'arabic'
        |       ELSE 'greek' END AS dominant
        |FROM c""".stripMargin,
    "text_normalize" ->
      """WITH dec AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 3 = 0
        |              THEN text || chr(9) || chr(9) || ' x' || chr(1) || 'e' || chr(769)
        |              ELSE text END AS text
        |  FROM documents
        |), n AS (
        |  SELECT doc_id, text,
        |         trim(regexp_replace(nfc_normalize(regexp_replace(text,
        |           '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g')),
        |           '[ \t\r\n]+', ' ', 'g')) AS text_norm
        |  FROM dec
        |)
        |SELECT doc_id, text_norm,
        |       CAST(length(text) AS BIGINT) AS n_chars_raw,
        |       CAST(length(text_norm) AS BIGINT) AS n_chars_norm,
        |       CAST(text <> text_norm AS INT) AS changed
        |FROM n""".stripMargin,
    "repetition_stats" ->
      s"""$dToksCte, b AS (
         |  SELECT doc_id, toks,
         |         CASE WHEN len(toks) >= 2
         |          THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1])
         |          ELSE CAST([] AS VARCHAR[]) END AS bg
         |  FROM t
         |)
         |SELECT doc_id,
         |       CAST(len(toks) AS BIGINT) AS n_tokens,
         |       CAST(len(bg) AS BIGINT) AS n_bigrams,
         |       CAST(len(list_distinct(bg)) AS BIGINT) AS n_distinct_bigrams,
         |       CASE WHEN len(bg) > 0
         |        THEN 1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / CAST(len(bg) AS DOUBLE)
         |        ELSE CAST(0.0 AS DOUBLE) END AS dup_bigram_frac,
         |       CAST(CASE WHEN len(bg) > 0 AND
         |         1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / CAST(len(bg) AS DOUBLE) > 0.05
         |         THEN 1 ELSE 0 END AS INT) AS repetitive
         |FROM b""".stripMargin,
    "vocab_topk" ->
      """SELECT token, COUNT(*) AS occurrences,
        |       COUNT(DISTINCT doc_id) AS doc_freq
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY 1
        |ORDER BY occurrences DESC, token
        |LIMIT 50""".stripMargin,
    "doc_chunks" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |c AS (SELECT doc_id, toks,
        |             unnest(generate_series(0, len(toks) - 1, 24)) AS start
        |      FROM d)
        |SELECT doc_id,
        |       CAST(start // 24 AS BIGINT) AS chunk_idx,
        |       CAST(least(32, len(toks) - start) AS BIGINT) AS n_chunk_tokens,
        |       CAST(('0x' || substr(md5(array_to_string(list_slice(toks, start + 1, start + 32), ' ')), 1, 15)) AS BIGINT) AS chunk_hash
        |FROM c""".stripMargin,
    "chunk_dedup" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |c AS (SELECT doc_id,
        |             CAST(('0x' || substr(md5(array_to_string(list_slice(toks, start + 1, start + 32), ' ')), 1, 15)) AS BIGINT) AS chunk_hash
        |      FROM (SELECT doc_id, toks,
        |                   unnest(generate_series(0, len(toks) - 1, 24)) AS start
        |            FROM d))
        |SELECT chunk_hash, COUNT(*) AS n_occurrences,
        |       COUNT(DISTINCT doc_id) AS n_docs, MIN(doc_id) AS first_doc
        |FROM c GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2""".stripMargin,
    "tfidf_top" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
        |), tf AS (
        |  SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2
        |), df AS (
        |  SELECT token, COUNT(*) AS df FROM tf GROUP BY 1
        |), n AS (SELECT COUNT(*) AS n_docs FROM documents)
        |SELECT doc_id, token, tf, df, score, rk AS rank
        |FROM (
        |  SELECT tf.doc_id, tf.token, tf.tf, df.df,
        |         tf.tf * (CAST(n.n_docs AS DOUBLE) / df.df) AS score,
        |         row_number() OVER (PARTITION BY tf.doc_id
        |                            ORDER BY tf.tf * (CAST(n.n_docs AS DOUBLE) / df.df) DESC, tf.token) AS rk
        |  FROM tf JOIN df USING (token) CROSS JOIN n
        |) WHERE rk <= 3""".stripMargin,
    "block_dedup_rewrite" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |b AS (SELECT doc_id, CAST(start // 16 AS BIGINT) AS idx,
         |             array_to_string(list_slice(toks, start + 1, start + 16), ' ') AS btext
         |      FROM (SELECT doc_id, toks,
         |                   unnest(generate_series(0, len(toks) - 1, 16)) AS start
         |            FROM d)),
         |h AS (SELECT doc_id, idx, btext,
         |             row_number() OVER (PARTITION BY ${dH("btext")}
         |                                ORDER BY doc_id, idx) AS rn
         |      FROM b)
         |SELECT doc_id, COUNT(*) AS n_blocks,
         |       COUNT(CASE WHEN rn = 1 THEN 1 END) AS n_kept,
         |       string_agg(CASE WHEN rn = 1 THEN btext END, ' ' ORDER BY idx) AS new_text
         |FROM h GROUP BY doc_id""".stripMargin,
    "dup_spans" ->
      // rolling 8-token windows; duplicated = hash occurs > 1 time
      // anywhere in the corpus; maximal spans by gaps-and-islands
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |w AS (SELECT doc_id, CAST(start AS BIGINT) AS start,
         |             ${dH("array_to_string(list_slice(toks, start + 1, start + 8), ' ')")} AS whash
         |      FROM (SELECT doc_id, toks,
         |                   unnest(generate_series(0, len(toks) - 8)) AS start
         |            FROM d WHERE len(toks) >= 8)),
         |c AS (SELECT whash FROM w GROUP BY whash HAVING COUNT(*) > 1),
         |dup AS (SELECT w.doc_id, w.start FROM w JOIN c USING (whash)),
         |g AS (SELECT doc_id, start,
         |             CASE WHEN start - lag(start) OVER (PARTITION BY doc_id ORDER BY start) <= 8
         |                  THEN 0 ELSE 1 END AS brk
         |      FROM dup),
         |isl AS (SELECT doc_id, start,
         |               SUM(brk) OVER (PARTITION BY doc_id ORDER BY start) AS island
         |        FROM g)
         |SELECT doc_id, MIN(start) AS span_start, MAX(start) + 7 AS span_end,
         |       MAX(start) + 7 - MIN(start) + 1 AS span_tokens,
         |       COUNT(*) AS n_windows
         |FROM isl GROUP BY doc_id, island""".stripMargin,
    "substring_dedup" ->
      // corpus-global keep-first on (doc_id, start): rn = 1 survives,
      // every other occurrence's 8 covered positions are removed
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |w AS (SELECT doc_id, CAST(start AS BIGINT) AS start,
         |             ${dH("array_to_string(list_slice(toks, start + 1, start + 8), ' ')")} AS whash
         |      FROM (SELECT doc_id, toks,
         |                   unnest(generate_series(0, len(toks) - 8)) AS start
         |            FROM d WHERE len(toks) >= 8)),
         |r AS (SELECT doc_id, start,
         |             row_number() OVER (PARTITION BY whash ORDER BY doc_id, start) AS rn
         |      FROM w),
         |cov AS (SELECT DISTINCT doc_id, pos FROM
         |         (SELECT doc_id, unnest(generate_series(start, start + 7)) AS pos
         |          FROM r WHERE rn > 1)),
         |t AS (SELECT doc_id, unnest(toks) AS token,
         |             CAST(generate_subscripts(toks, 1) - 1 AS BIGINT) AS pos
         |      FROM d),
         |kept AS (SELECT t.doc_id, t.pos, t.token FROM t
         |         WHERE NOT EXISTS (SELECT 1 FROM cov
         |                           WHERE cov.doc_id = t.doc_id AND cov.pos = t.pos)),
         |reb AS (SELECT doc_id, COUNT(*) AS n_kept,
         |               string_agg(token, ' ' ORDER BY pos) AS new_text
         |        FROM kept GROUP BY doc_id)
         |SELECT d2.doc_id,
         |       CAST(len(string_split(d2.text, ' ')) AS BIGINT) AS n_tokens,
         |       COALESCE(reb.n_kept, CAST(0 AS BIGINT)) AS n_kept, reb.new_text
         |FROM documents d2 LEFT JOIN reb ON reb.doc_id = d2.doc_id""".stripMargin,
    "heavy_hitters" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |n AS (SELECT COUNT(*) AS n_total FROM tok)
        |SELECT token, COUNT(*) AS cnt
        |FROM tok CROSS JOIN n
        |GROUP BY token, n.n_total
        |HAVING COUNT(*) * 40 > n.n_total
        |ORDER BY cnt DESC, token""".stripMargin,
    "cms_counts" ->
      // count-min sketch: depth=4 rows × width=512 cells, the row hashes
      // and the probe membership all affine maps of ONE md5 per token
      // (the MinHash universal family — 75437+2r, 13007·(r+1), mod the
      // <2^30 prime; probe uses index depth=4); estimate = min over the
      // probe token's cells; over_ok pins the CMS one-sided guarantee
      s"""WITH tok AS (SELECT token, ${dH("token")} AS h
         |            FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)),
         |rws AS (SELECT unnest(generate_series(0, 3)) AS r),
         |sk AS (SELECT r,
         |              ((75437 + 2 * r) * (h % 1073741824) + 13007 * (r + 1)) % 1073741789 % 512 AS bucket,
         |              COUNT(*) AS c
         |       FROM tok CROSS JOIN rws GROUP BY 1, 2),
         |probes AS (SELECT token, COUNT(*) AS exact_c FROM tok
         |           WHERE (75445 * (h % 1073741824) + 65035) % 1073741789 % 7 = 0
         |           GROUP BY token),
         |est AS (SELECT p.token, p.exact_c, MIN(sk.c) AS est_c
         |        FROM probes p CROSS JOIN rws
         |        JOIN sk ON sk.r = rws.r
         |               AND sk.bucket = ((75437 + 2 * rws.r) * (${dH("p.token")} % 1073741824)
         |                                + 13007 * (rws.r + 1)) % 1073741789 % 512
         |        GROUP BY p.token, p.exact_c)
         |SELECT token, exact_c, est_c, est_c - exact_c AS err,
         |       CAST(CASE WHEN est_c >= exact_c THEN 1 ELSE 0 END AS INT) AS over_ok
         |FROM est""".stripMargin,
    "bpe_merges" ->
      // unrolled 3-round BPE training loop; each round's best pair by
      // (count desc, pair asc) — the whole trainer under the hash gate
      (dBpeCtes(3) + "\n" + (1 to 3).map(t =>
        s"SELECT $t AS iter, a AS left_sym, b AS right_sym, pair_count FROM b$t")
        .mkString("\nUNION ALL ")),
    "bpe_segment" ->
      (dBpeCtes(3) +
        """
          |SELECT word, freq, trim(sp) AS segmented,
          |       CAST(len(string_split(trim(sp), ' ')) AS INT) AS n_symbols
          |FROM v3""".stripMargin),
    "bpe_encode_docs" ->
      // encode under the trained merges: inner join to the trained vocab
      // is the Spark side's broadcast-join encoding
      (dBpeCtes(3) + """,
        |dw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |       FROM documents)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
        |       CAST(SUM(len(string_split(trim(sp), ' '))) AS BIGINT) AS n_subwords
        |FROM dw JOIN v3 USING (word)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    "heavy_hitters_by_lang" ->
      """WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents),
        |n AS (SELECT lang, COUNT(*) AS n_total FROM tok GROUP BY lang)
        |SELECT tok.lang, token, COUNT(*) AS cnt
        |FROM tok JOIN n USING (lang)
        |GROUP BY tok.lang, token, n.n_total
        |HAVING COUNT(*) * 40 > n.n_total
        |ORDER BY lang, cnt DESC, token""".stripMargin,
    "inverted_index" ->
      """SELECT token, CAST(len(postings) AS BIGINT) AS doc_freq,
        |       array_to_string(postings, ',') AS postings_csv
        |FROM (
        |  SELECT token, list_sort(list(DISTINCT doc_id)) AS postings
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
        |  GROUP BY token)
        |ORDER BY token""".stripMargin,
    "rank_fusion" -> {
      def list(p: String, rk: String, terms: Seq[String]): String = {
        val tfs = terms.zipWithIndex.map { case (t, i) =>
          s"CAST(len(list_filter(toks, x -> x = '$t')) AS BIGINT) AS tf$i"
        }.mkString(", ")
        val dfs = terms.indices.map(i =>
          s"SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i").mkString(", ")
        val score = terms.indices.map { i =>
          s"""(ln((CAST(n_docs AS DOUBLE) - df$i + 0.5) / (df$i + 0.5) + 1.0)
             | * (CAST(tf$i AS DOUBLE) * 2.2)
             | / (CAST(tf$i AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / n_docs)))))""".stripMargin
        }.mkString("\n           + ")
        s"""${p}f AS (
           |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, $tfs
           |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
           |), ${p}st AS (
           |  SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl, $dfs FROM ${p}f
           |), ${p}sc AS (
           |  SELECT doc_id, score FROM (
           |    SELECT f.doc_id, round($score, 6) AS score
           |    FROM ${p}f f CROSS JOIN ${p}st
           |  ) WHERE score > 0 ORDER BY score DESC, doc_id LIMIT 20
           |), ${p}rk AS (
           |  SELECT doc_id,
           |         row_number() OVER (ORDER BY score DESC, doc_id) AS rank_$rk
           |  FROM ${p}sc
           |)""".stripMargin
      }
      s"""WITH ${list("qa", "a", Seq("spark", "query", "join"))},
         |${list("qb", "b", Seq("stream", "window", "batch"))}
         |SELECT COALESCE(qark.doc_id, qbrk.doc_id) AS doc_id, rank_a, rank_b,
         |       COALESCE(CAST(1.0 AS DOUBLE) / (60 + rank_a), CAST(0.0 AS DOUBLE))
         |         + COALESCE(CAST(1.0 AS DOUBLE) / (60 + rank_b), CAST(0.0 AS DOUBLE)) AS rrf_score
         |FROM qark FULL OUTER JOIN qbrk ON qark.doc_id = qbrk.doc_id
         |ORDER BY rrf_score DESC, doc_id
         |LIMIT 20""".stripMargin
    },
    // hybrid retrieval: the rank_fusion lexical arm + the cosine_topk
    // vector arm, identical RRF combine
    "hybrid_search" -> {
      val terms = Seq("spark", "query", "join")
      val tfs = terms.zipWithIndex.map { case (t, i) =>
        s"CAST(len(list_filter(toks, x -> x = '$t')) AS BIGINT) AS tf$i"
      }.mkString(", ")
      val dfs = terms.indices.map(i =>
        s"SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i").mkString(", ")
      val score = terms.indices.map { i =>
        s"""(ln((CAST(n_docs AS DOUBLE) - df$i + 0.5) / (df$i + 0.5) + 1.0)
           | * (CAST(tf$i AS DOUBLE) * 2.2)
           | / (CAST(tf$i AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / n_docs)))))""".stripMargin
      }.mkString("\n           + ")
      s"""$dUnitCte,
         |qv AS (SELECT unit AS q_unit FROM u WHERE vec_id = 0),
         |vsc AS (
         |  SELECT vec_id AS doc_id,
         |         round(${dUnitDot("unit", "q_unit")}, 6) AS cosine_sim
         |  FROM u, qv WHERE vec_id <> 0
         |  ORDER BY cosine_sim DESC, vec_id LIMIT 20
         |), vrk AS (
         |  SELECT doc_id,
         |         row_number() OVER (ORDER BY cosine_sim DESC, doc_id) AS rank_vec
         |  FROM vsc
         |), lf AS (
         |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, $tfs
         |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
         |), lst AS (
         |  SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl, $dfs FROM lf
         |), lsc AS (
         |  SELECT doc_id, score FROM (
         |    SELECT f.doc_id, round($score, 6) AS score
         |    FROM lf f CROSS JOIN lst
         |  ) WHERE score > 0 ORDER BY score DESC, doc_id LIMIT 20
         |), lrk AS (
         |  SELECT doc_id,
         |         row_number() OVER (ORDER BY score DESC, doc_id) AS rank_lex
         |  FROM lsc
         |)
         |SELECT COALESCE(lrk.doc_id, vrk.doc_id) AS doc_id, rank_lex, rank_vec,
         |       COALESCE(CAST(1.0 AS DOUBLE) / (60 + rank_lex), CAST(0.0 AS DOUBLE))
         |         + COALESCE(CAST(1.0 AS DOUBLE) / (60 + rank_vec), CAST(0.0 AS DOUBLE)) AS rrf_score
         |FROM lrk FULL OUTER JOIN vrk ON lrk.doc_id = vrk.doc_id
         |ORDER BY rrf_score DESC, doc_id
         |LIMIT 20""".stripMargin
    },
    "bm25_top" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |), f AS (
        |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
        |         CAST(len(list_filter(toks, x -> x = 'spark')) AS BIGINT) AS tf0,
        |         CAST(len(list_filter(toks, x -> x = 'query')) AS BIGINT) AS tf1,
        |         CAST(len(list_filter(toks, x -> x = 'join')) AS BIGINT) AS tf2
        |  FROM d
        |), st AS (
        |  SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl,
        |         SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
        |         SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
        |         SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
        |  FROM f
        |)
        |SELECT doc_id, dl, score, tf0, tf1, tf2
        |FROM (
        |  SELECT f.doc_id, f.dl, f.tf0, f.tf1, f.tf2,
        |         round(
        |           (ln((CAST(n_docs AS DOUBLE) - df0 + 0.5) / (df0 + 0.5) + 1.0)
        |            * (CAST(tf0 AS DOUBLE) * 2.2)
        |            / (CAST(tf0 AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / n_docs)))))
        |           + (ln((CAST(n_docs AS DOUBLE) - df1 + 0.5) / (df1 + 0.5) + 1.0)
        |            * (CAST(tf1 AS DOUBLE) * 2.2)
        |            / (CAST(tf1 AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / n_docs)))))
        |           + (ln((CAST(n_docs AS DOUBLE) - df2 + 0.5) / (df2 + 0.5) + 1.0)
        |            * (CAST(tf2 AS DOUBLE) * 2.2)
        |            / (CAST(tf2 AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / n_docs)))))
        |         , 6) AS score
        |  FROM f CROSS JOIN st)
        |WHERE score > 0
        |ORDER BY score DESC, doc_id
        |LIMIT 20""".stripMargin,
    "token_pmi" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |tok AS (
        |  SELECT doc_id, unnest(toks) AS token,
        |         unnest(range(1, len(toks) + 1)) AS pos
        |  FROM t
        |), pr AS (
        |  SELECT x.token AS a, y.token AS b, COUNT(*) AS pair_n
        |  FROM tok x JOIN tok y ON x.doc_id = y.doc_id AND y.pos = x.pos + 1
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 5
        |), uni AS (SELECT token, COUNT(*) AS t_n FROM tok GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n_tok FROM tok)
        |SELECT a, b, pair_n,
        |       round(ln(CAST(pair_n AS DOUBLE) * n.n_tok
        |                / (CAST(ua.t_n AS DOUBLE) * ub.t_n)), 6) AS pmi
        |FROM pr
        |JOIN uni ua ON ua.token = pr.a
        |JOIN uni ub ON ub.token = pr.b
        |CROSS JOIN n
        |ORDER BY pmi DESC, a, b
        |LIMIT 100""".stripMargin,
    "contamination" ->
      s"""$dToksCte, s AS (
         |  SELECT doc_id, $dSh AS sh FROM t
         |), e AS (
         |  SELECT doc_id, unnest(list_transform(sh, s2 -> ${dH("s2")})) AS h
         |  FROM s
         |), bench AS (
         |  SELECT DISTINCT h FROM e WHERE doc_id % 50 = 0
         |), shared AS (
         |  SELECT e.doc_id, COUNT(*) AS n_shared
         |  FROM e JOIN bench USING (h)
         |  WHERE e.doc_id % 50 <> 0
         |  GROUP BY 1
         |)
         |SELECT d.doc_id,
         |       COALESCE(n_shared, 0) AS n_shared_shingles,
         |       CAST(CASE WHEN COALESCE(n_shared, 0) >= 3 THEN 1 ELSE 0 END AS INT) AS contaminated
         |FROM documents d LEFT JOIN shared USING (doc_id)
         |WHERE d.doc_id % 50 <> 0
         |ORDER BY doc_id""".stripMargin,
    "domain_mix" ->
      s"""WITH r AS (
         |  SELECT DISTINCT source,
         |         ${Sampling.sourceRateSql} AS rate
         |  FROM documents
         |)
         |SELECT d.source, r.rate,
         |       COUNT(*) AS n_docs,
         |       CAST(SUM(CASE WHEN ${dH("CAST(doc_id AS VARCHAR)")} % 100 < r.rate
         |                THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         |FROM documents d JOIN r USING (source)
         |GROUP BY 1, 2
         |ORDER BY d.source""".stripMargin,
    "mixture_sample" ->
      // mixture weights -> feasible token budget B = min_s(T_s*Σw/w_s)
      // -> per-source ppm acceptance rates (split division mirrors the
      // Spark side's overflow-safe q*1000 + r*1000//T form)
      s"""WITH d AS (SELECT doc_id, source,
         |                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
         |           FROM documents),
         |t AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |             CAST(SUM(n_toks) AS BIGINT) AS t_toks,
         |             CAST((${Sampling.sourceRateSql}) AS BIGINT) AS w
         |      FROM d GROUP BY source),
         |sw AS (SELECT CAST(SUM(w) AS BIGINT) AS sum_w FROM t),
         |b AS (SELECT MIN(t_toks * sum_w // w) AS budget, MIN(sum_w) AS sum_w
         |      FROM t CROSS JOIN sw),
         |r AS (SELECT t.*, w * budget // sum_w AS ask_toks,
         |             CASE WHEN t_toks > 0
         |                  THEN ((w * budget // sum_w) * 1000 // t_toks) * 1000
         |                       + (((w * budget // sum_w) * 1000 % t_toks) * 1000 // t_toks)
         |                  ELSE CAST(0 AS BIGINT) END AS rate_ppm
         |      FROM t CROSS JOIN b)
         |SELECT d.source, r.w, r.t_toks, r.ask_toks, r.rate_ppm, r.n_docs,
         |       CAST(SUM(CASE WHEN ${dH("'mix:' || CAST(doc_id AS VARCHAR)")} % 1000000 < r.rate_ppm
         |                THEN 1 ELSE 0 END) AS BIGINT) AS kept_docs,
         |       CAST(SUM(CASE WHEN ${dH("'mix:' || CAST(doc_id AS VARCHAR)")} % 1000000 < r.rate_ppm
         |                THEN n_toks ELSE 0 END) AS BIGINT) AS kept_toks
         |FROM d JOIN r USING (source)
         |GROUP BY 1, 2, 3, 4, 5, 6
         |ORDER BY d.source""".stripMargin,
    "domain_cap" ->
      s"""SELECT source, doc_id FROM (
         |  SELECT source, doc_id,
         |         row_number() OVER (PARTITION BY source
         |           ORDER BY ${dH("CAST(doc_id AS VARCHAR)")} % 4503599627370496, doc_id) AS rn
         |  FROM documents) t
         |WHERE rn <= 8""".stripMargin,
    "dataset_split" ->
      s"""SELECT doc_id,
         |       CASE WHEN b < 10 THEN 'test'
         |            WHEN b < 20 THEN 'val'
         |            ELSE 'train' END AS split
         |FROM (SELECT doc_id, ${dH("CAST(doc_id AS VARCHAR)")} % 100 AS b
         |      FROM documents) t""".stripMargin,
    "k_anonymity" ->
      """WITH b AS (
        |  SELECT CAST(c_nationkey AS VARCHAR) AS n,
        |         CAST(c_mktsegment AS VARCHAR) AS s
        |  FROM customer
        |), cl AS (
        |  SELECT n, s, COUNT(*) AS cnt FROM b GROUP BY 1, 2
        |)
        |SELECT ng AS c_nationkey_g, sg AS c_mktsegment_g,
        |       CAST(COUNT(*) AS BIGINT) AS class_size
        |FROM (
        |  SELECT CASE WHEN cl.cnt >= 8 THEN b.n ELSE '*' END AS ng,
        |         CASE WHEN cl.cnt >= 8 THEN b.s ELSE '*' END AS sg
        |  FROM b JOIN cl ON cl.n = b.n AND cl.s = b.s
        |) t
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    "l_diversity" ->
      """WITH b AS (
        |  SELECT CAST(c_nationkey AS VARCHAR) AS n,
        |         CAST(c_mktsegment AS VARCHAR) AS s
        |  FROM customer
        |), cnts AS (
        |  SELECT n, s, CAST(COUNT(*) AS BIGINT) AS cnt FROM b GROUP BY 1, 2
        |), r AS (
        |  SELECT *, row_number() OVER (PARTITION BY n
        |                               ORDER BY cnt DESC, s) AS rn
        |  FROM cnts
        |)
        |SELECT n AS c_nationkey,
        |       CAST(SUM(cnt) AS BIGINT) AS class_size,
        |       CAST(COUNT(*) AS BIGINT) AS n_distinct_sensitive,
        |       CAST(MAX(CASE WHEN rn = 1 THEN cnt END) AS BIGINT) AS top_count,
        |       CAST(COALESCE(SUM(CASE WHEN rn >= 3 THEN cnt END), 0) AS BIGINT) AS tail_sum,
        |       CAST(COUNT(*) >= 3 AS INT) AS distinct_l_ok,
        |       CAST(MAX(CASE WHEN rn = 1 THEN cnt END)
        |            < 2 * COALESCE(SUM(CASE WHEN rn >= 3 THEN cnt END), 0) AS INT)
        |         AS recursive_cl_ok
        |FROM r GROUP BY n ORDER BY n""".stripMargin,
    "t_closeness" ->
      // total-variation EMD as exact integers: numerator as a digit
      // string (HUGEINT here, decimal(38,0) in Spark — identical
      // digits), verdict compared before any division
      """WITH b AS (
        |  SELECT CAST(c_nationkey AS VARCHAR) AS n,
        |         CAST(c_mktsegment AS VARCHAR) AS s
        |  FROM customer
        |), g AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS gc FROM b GROUP BY 1),
        |tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM b),
        |c AS (SELECT n, s, CAST(COUNT(*) AS BIGINT) AS cc FROM b GROUP BY 1, 2),
        |nc AS (SELECT n, CAST(SUM(cc) AS BIGINT) AS class_size FROM c GROUP BY 1),
        |x AS (
        |  SELECT nc.n, nc.class_size, tt.nn, g.s, g.gc,
        |         COALESCE(c.cc, 0) AS cc
        |  FROM nc CROSS JOIN g CROSS JOIN tt
        |  LEFT JOIN c ON c.n = nc.n AND c.s = g.s
        |)
        |SELECT n AS c_nationkey, class_size,
        |       CAST(SUM(ABS(CAST(cc AS HUGEINT) * nn
        |                    - CAST(gc AS HUGEINT) * class_size)) AS VARCHAR)
        |         AS emd_num,
        |       CAST(SUM(ABS(CAST(cc AS HUGEINT) * nn
        |                    - CAST(gc AS HUGEINT) * class_size)) * 5
        |            <= CAST(class_size AS HUGEINT) * nn * 4 AS INT) AS t_ok
        |FROM x GROUP BY n, class_size, nn ORDER BY n""".stripMargin,
    "dq_quarantine" ->
      """WITH dec0 AS (
        |  SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
        |         CASE WHEN o_orderkey % 1000 = 7 THEN NULL
        |              WHEN o_orderkey % 1000 = 33 THEN CAST(-5 AS BIGINT)
        |              ELSE CAST(o_custkey AS BIGINT) END AS o_custkey,
        |         CASE WHEN o_orderkey % 1000 = 13 THEN -o_totalprice
        |              ELSE o_totalprice END AS o_totalprice,
        |         CASE WHEN o_orderkey % 1000 = 21 THEN 'X-BAD'
        |              ELSE o_orderpriority END AS o_orderpriority
        |  FROM orders
        |), dec AS (
        |  SELECT * FROM dec0
        |  UNION ALL
        |  SELECT * FROM dec0 WHERE o_orderkey % 5000 = 11
        |), dups AS (
        |  SELECT o_orderkey, true AS isdup FROM dec
        |  GROUP BY o_orderkey HAVING COUNT(*) > 1
        |), ck AS (
        |  SELECT DISTINCT CAST(c_custkey AS BIGINT) AS ck FROM customer
        |)
        |SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority,
        |       array_to_string(failed_rules, '|') AS failed_rules,
        |       CAST(len(failed_rules) AS INT) AS n_failed
        |FROM (
        |  SELECT d.*, list_sort(list_filter([
        |    CASE WHEN d.o_custkey IS NULL THEN 'not_null:o_custkey' END,
        |    CASE WHEN d.o_totalprice IS NOT NULL
        |              AND (d.o_totalprice < 0 OR d.o_totalprice > 10000000)
        |         THEN 'in_range:o_totalprice' END,
        |    CASE WHEN d.o_orderpriority IS NOT NULL
        |              AND NOT regexp_full_match(d.o_orderpriority, '[1-5]-[A-Z ]+')
        |         THEN 'matches:o_orderpriority' END,
        |    CASE WHEN u.isdup THEN 'unique:o_orderkey' END,
        |    CASE WHEN d.o_custkey IS NOT NULL AND c.ck IS NULL THEN 'ref:o_custkey' END
        |  ], x -> x IS NOT NULL)) AS failed_rules
        |  FROM dec d
        |  LEFT JOIN dups u ON u.o_orderkey = d.o_orderkey
        |  LEFT JOIN ck c ON c.ck = d.o_custkey
        |) q
        |WHERE len(failed_rules) > 0
        |ORDER BY o_orderkey, n_failed""".stripMargin,
    "dq_report" ->
      """WITH dec0 AS (
        |  SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
        |         CASE WHEN o_orderkey % 1000 = 7 THEN NULL
        |              WHEN o_orderkey % 1000 = 33 THEN CAST(-5 AS BIGINT)
        |              ELSE CAST(o_custkey AS BIGINT) END AS o_custkey,
        |         CASE WHEN o_orderkey % 1000 = 13 THEN -o_totalprice
        |              ELSE o_totalprice END AS o_totalprice,
        |         CASE WHEN o_orderkey % 1000 = 21 THEN 'X-BAD'
        |              ELSE o_orderpriority END AS o_orderpriority
        |  FROM orders
        |), dec AS (
        |  SELECT * FROM dec0
        |  UNION ALL
        |  SELECT * FROM dec0 WHERE o_orderkey % 5000 = 11
        |), t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM dec)
        |SELECT rule, col_name, n_rows, n_violations,
        |       CAST(n_violations = 0 AS INT) AS pass
        |FROM (
        |  SELECT 'not_null' AS rule, 'o_custkey' AS col_name, t.n_rows,
        |         (SELECT CAST(COUNT(*) AS BIGINT) FROM dec
        |          WHERE o_custkey IS NULL) AS n_violations FROM t
        |  UNION ALL
        |  SELECT 'in_range', 'o_totalprice', t.n_rows,
        |         (SELECT CAST(COUNT(*) AS BIGINT) FROM dec
        |          WHERE o_totalprice IS NOT NULL
        |            AND (o_totalprice < 0 OR o_totalprice > 10000000)) FROM t
        |  UNION ALL
        |  SELECT 'matches', 'o_orderpriority', t.n_rows,
        |         (SELECT CAST(COUNT(*) AS BIGINT) FROM dec
        |          WHERE o_orderpriority IS NOT NULL
        |            AND NOT regexp_full_match(o_orderpriority, '[1-5]-[A-Z ]+')) FROM t
        |  UNION ALL
        |  SELECT 'unique', 'o_orderkey', t.n_rows,
        |         (SELECT COALESCE(CAST(SUM(c - 1) AS BIGINT), 0) FROM
        |           (SELECT COUNT(*) AS c FROM dec GROUP BY o_orderkey) g) FROM t
        |  UNION ALL
        |  SELECT 'ref_integrity', 'o_custkey', t.n_rows,
        |         (SELECT CAST(COUNT(*) AS BIGINT) FROM dec
        |          WHERE o_custkey IS NOT NULL
        |            AND o_custkey NOT IN (SELECT c_custkey FROM customer)) FROM t
        |) r""".stripMargin,
    "cdc_apply" ->
      s"""$dCdcCtes
         |SELECT cust_id, name, nation, segment FROM applied""".stripMargin,
    "cdc_diff" ->
      s"""$dCdcCtes
         |SELECT cust_id, change_type FROM (
         |  SELECT COALESCE(b.cust_id, a.cust_id) AS cust_id,
         |         CASE WHEN b.cust_id IS NULL THEN 'added'
         |              WHEN a.cust_id IS NULL THEN 'removed'
         |              WHEN NOT (b.name IS NOT DISTINCT FROM a.name
         |                        AND b.nation IS NOT DISTINCT FROM a.nation
         |                        AND b.segment IS NOT DISTINCT FROM a.segment)
         |                THEN 'changed'
         |              ELSE 'unchanged' END AS change_type
         |  FROM snap b FULL OUTER JOIN applied a ON b.cust_id = a.cust_id) t
         |WHERE change_type <> 'unchanged'""".stripMargin,
    "cdc_as_of" ->
      s"""$dCdcCtes, latest_asof AS (
         |  SELECT cust_id, name, nation, segment, op FROM (
         |    SELECT *, row_number() OVER (PARTITION BY cust_id
         |                                 ORDER BY version DESC) AS rn
         |    FROM chg WHERE version <= 3031) t
         |  WHERE rn = 1
         |)
         |SELECT cust_id, name, nation, segment FROM snap
         |WHERE cust_id NOT IN (SELECT cust_id FROM latest_asof)
         |UNION ALL
         |SELECT cust_id, name, nation, segment FROM latest_asof WHERE op <> 'D'""".stripMargin,
    "cdc_version_diff" ->
      s"""$dCdcCtes, la1 AS (
         |  SELECT cust_id, name, nation, segment, op FROM (
         |    SELECT *, row_number() OVER (PARTITION BY cust_id
         |                                 ORDER BY version DESC) AS rn
         |    FROM chg WHERE version <= 500) t
         |  WHERE rn = 1
         |), t1 AS (
         |  SELECT cust_id, name, nation, segment FROM snap
         |  WHERE cust_id NOT IN (SELECT cust_id FROM la1)
         |  UNION ALL
         |  SELECT cust_id, name, nation, segment FROM la1 WHERE op <> 'D'
         |), la2 AS (
         |  SELECT cust_id, name, nation, segment, op FROM (
         |    SELECT *, row_number() OVER (PARTITION BY cust_id
         |                                 ORDER BY version DESC) AS rn
         |    FROM chg WHERE version <= 1200) t
         |  WHERE rn = 1
         |), t2 AS (
         |  SELECT cust_id, name, nation, segment FROM snap
         |  WHERE cust_id NOT IN (SELECT cust_id FROM la2)
         |  UNION ALL
         |  SELECT cust_id, name, nation, segment FROM la2 WHERE op <> 'D'
         |)
         |SELECT cust_id, change_type FROM (
         |  SELECT COALESCE(b.cust_id, a.cust_id) AS cust_id,
         |         CASE WHEN b.cust_id IS NULL THEN 'added'
         |              WHEN a.cust_id IS NULL THEN 'removed'
         |              WHEN NOT (b.name IS NOT DISTINCT FROM a.name
         |                        AND b.nation IS NOT DISTINCT FROM a.nation
         |                        AND b.segment IS NOT DISTINCT FROM a.segment)
         |                THEN 'changed'
         |              ELSE 'unchanged' END AS change_type
         |  FROM t1 b FULL OUTER JOIN t2 a ON b.cust_id = a.cust_id) t
         |WHERE change_type <> 'unchanged'""".stripMargin,
    "weighted_median" ->
      """WITH c AS (
        |  SELECT p_brand AS g, p_retailprice AS v,
        |         CAST(p_size AS BIGINT) AS wt, p_partkey AS tie
        |  FROM part WHERE p_size > 0
        |), w AS (
        |  SELECT g, v, tie, wt,
        |         SUM(wt) OVER (PARTITION BY g ORDER BY v, tie
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
        |         SUM(wt) OVER (PARTITION BY g) AS tw
        |  FROM c
        |), m AS (
        |  SELECT g, v, tie, CAST(tw AS BIGINT) AS tw FROM w WHERE 2 * cw >= tw
        |), r AS (
        |  SELECT g, v, tw,
        |         ROW_NUMBER() OVER (PARTITION BY g ORDER BY v, tie) AS rn
        |  FROM m
        |)
        |SELECT g AS p_brand, v AS weighted_median, tw AS total_weight
        |FROM r WHERE rn = 1""".stripMargin,
    "decayed_value" ->
      """WITH daily AS (
        |  SELECT user_id,
        |         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |              AS BIGINT) AS day,
        |         CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
        |           AS day_cents
        |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
        |  GROUP BY 1, 2
        |), md AS (SELECT MAX(day) AS max_day FROM daily)
        |SELECT user_id,
        |       CAST(SUM(day_cents * (CAST(1 AS BIGINT)
        |            << CAST(32 - (md.max_day - day) AS INTEGER))) AS BIGINT)
        |         AS num_scaled,
        |       CAST(SUM(day_cents) AS BIGINT) AS raw_cents,
        |       CAST(COUNT(*) AS BIGINT) AS n_days,
        |       CAST(CAST(SUM(day_cents * (CAST(1 AS BIGINT)
        |            << CAST(32 - (md.max_day - day) AS INTEGER))) AS BIGINT)
        |            AS DOUBLE) / 4294967296.0 / 100.0 AS decayed_value
        |FROM daily CROSS JOIN md GROUP BY user_id""".stripMargin,
    "geo_cell_join" ->
      // brute-force reference: every (customer, supplier) pair scored —
      // the grid join must reproduce this set EXACTLY (a candidate lost
      // to a mis-bucketed cell drops a row; a doubled candidate breaks
      // n_in_range). Integer-only distance, so no float enters the gate.
      """WITH p AS (
        |  SELECT c_custkey AS pid,
        |         (CAST(c_custkey AS BIGINT) * 48271 + 7) % 36000 AS px,
        |         (CAST(c_custkey AS BIGINT) * 69621 + 13) % 18000 AS py
        |  FROM customer
        |), b AS (
        |  SELECT s_suppkey AS bid,
        |         (CAST(s_suppkey AS BIGINT) * 40503 + 3) % 36000 AS bx,
        |         (CAST(s_suppkey AS BIGINT) * 69427 + 17) % 18000 AS by
        |  FROM supplier
        |), j AS (
        |  SELECT pid, bid,
        |         (px - bx) * (px - bx) + (py - by) * (py - by) AS d2
        |  FROM p CROSS JOIN b
        |  WHERE (px - bx) * (px - bx) + (py - by) * (py - by) <= 1000000
        |), r AS (
        |  SELECT pid, bid, d2,
        |         ROW_NUMBER() OVER (PARTITION BY pid ORDER BY d2, bid) AS rn,
        |         COUNT(*) OVER (PARTITION BY pid) AS n
        |  FROM j
        |)
        |SELECT pid AS p_id, CAST(n AS BIGINT) AS n_in_range,
        |       bid AS nearest_id, CAST(d2 AS BIGINT) AS nearest_d2
        |FROM r WHERE rn = 1""".stripMargin,
    "cuped_adjust" ->
      // exact int64 cross-moments per variant; every float below is the
      // SAME fixed IEEE expression tree the Spark side evaluates
      """WITH u AS (
        |  SELECT user_id,
        |         CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
        |         CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00'
        |              THEN CAST(floor(value + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
        |         CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-15 00:00:00'
        |              THEN CAST(floor(value + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
        |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
        |  GROUP BY 1, 2
        |), v AS (
        |  SELECT variant, CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |         CAST(SUM(x * x) AS BIGINT) AS sxx,
        |         CAST(SUM(x * y) AS BIGINT) AS sxy,
        |         CAST(SUM(y * y) AS BIGINT) AS syy
        |  FROM u GROUP BY 1
        |), p AS (
        |  SELECT SUM(n) AS pn, SUM(sx) AS psx, SUM(sy) AS psy,
        |         SUM(sxx) AS psxx, SUM(sxy) AS psxy
        |  FROM v
        |), t AS (
        |  SELECT v.*,
        |         CASE WHEN pn * psxx <> psx * psx THEN
        |           (CAST(pn AS DOUBLE) * CAST(psxy AS DOUBLE) - CAST(psx AS DOUBLE) * CAST(psy AS DOUBLE))
        |             / (CAST(pn AS DOUBLE) * CAST(psxx AS DOUBLE) - CAST(psx AS DOUBLE) * CAST(psx AS DOUBLE))
        |         END AS theta,
        |         CAST(psx AS DOUBLE) / CAST(pn AS DOUBLE) AS x_bar,
        |         CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS mean_y
        |  FROM v CROSS JOIN p
        |), f AS (
        |  SELECT variant, n, sx, sy, sxy, theta, mean_y,
        |         mean_y - COALESCE(theta, 0.0) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) - x_bar) AS mean_y_adj,
        |         (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
        |           / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS var_y,
        |         ((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
        |           - 2.0 * COALESCE(theta, 0.0) * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |           + COALESCE(theta, 0.0) * COALESCE(theta, 0.0) * (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
        |           / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS var_y_adj
        |  FROM t
        |)
        |SELECT variant, n, sx, sy, sxy, theta, mean_y, mean_y_adj, var_y, var_y_adj,
        |       CASE WHEN var_y > 0.0 THEN 100.0 * (1.0 - var_y_adj / var_y) END AS var_reduction_pct
        |FROM f""".stripMargin,
    "rendezvous_shard" ->
      // the oracle recomputes both fleets' argmax from the same md5
      // weights; lexicographic (wt, sh) max ties are impossible (60-bit)
      """WITH w AS (
        |  SELECT doc_id, sh,
        |         CAST(('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR) || ':' || CAST(sh AS VARCHAR)), 1, 15)) AS BIGINT) AS wt
        |  FROM documents CROSS JOIN (SELECT unnest(range(0, 33)) AS sh) s
        |  WHERE doc_id IS NOT NULL
        |), a AS (
        |  SELECT doc_id,
        |         arg_max(sh, wt) FILTER (WHERE sh < 32) AS shard,
        |         arg_max(sh, wt) AS shard_plus
        |  FROM w GROUP BY 1
        |), per AS (
        |  SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_keys,
        |         CAST(COUNT(CASE WHEN shard_plus = 32 THEN 1 END) AS BIGINT) AS n_moving
        |  FROM a GROUP BY 1
        |), t AS (SELECT SUM(n_keys) AS tot FROM per)
        |SELECT CAST(shard AS INT) AS shard, n_keys, n_moving,
        |       CAST((n_keys * 32 * 1000000) // tot AS BIGINT) AS fill_ppm
        |FROM per CROSS JOIN t""".stripMargin,
    "rake_keywords" ->
      // same segmentation (0-based positions, gaps-and-islands), same
      // integer (deg·10⁶) div freq word scores, same total top-50 order
      """WITH toks0 AS (
        |  SELECT doc_id,
        |         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok,
        |         unnest(range(0, len(regexp_extract_all(lower(text), '[a-z0-9]+')))) AS pos
        |  FROM documents WHERE text IS NOT NULL
        |), ns AS (
        |  SELECT doc_id, tok, pos,
        |         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        |  FROM toks0
        |  WHERE tok NOT IN ('a','the','and','of','to','is','in','on','for','with')
        |), ph AS (
        |  SELECT doc_id, grp, string_agg(tok, ' ' ORDER BY pos) AS phrase,
        |         CAST(COUNT(*) AS BIGINT) AS plen
        |  FROM ns GROUP BY 1, 2 HAVING COUNT(*) <= 4
        |), ws AS (
        |  SELECT tok AS w, (SUM(plen) * 1000000) // COUNT(*) AS wscore
        |  FROM ns JOIN ph USING (doc_id, grp)
        |  GROUP BY 1
        |), inst AS (
        |  SELECT ph.doc_id, ph.grp, ph.phrase, SUM(ws.wscore) AS inst_score
        |  FROM ns JOIN ph USING (doc_id, grp) JOIN ws ON ns.tok = ws.w
        |  GROUP BY 1, 2, 3
        |)
        |SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occ,
        |       CAST(MAX(inst_score) AS BIGINT) AS score_scaled,
        |       CAST(CAST(MAX(inst_score) AS BIGINT) AS DOUBLE) / 1000000.0 AS score
        |FROM inst GROUP BY 1
        |ORDER BY score_scaled DESC, phrase LIMIT 50""".stripMargin,
    "interval_relations" ->
      // the same cascade, literally: a single flipped < vs <= in any
      // branch shifts counts between adjacent relations and fails the
      // hash
      """WITH li AS (
        |  SELECT l_orderkey AS ok, l_linenumber AS ln,
        |         CAST(l_shipdate AS DATE) AS st,
        |         CAST(l_shipdate AS DATE) + CAST((l_partkey + l_suppkey) % 30 + 1 AS INTEGER) AS en
        |  FROM lineitem
        |)
        |SELECT CASE
        |         WHEN a.st = b.st AND a.en = b.en THEN 'equals'
        |         WHEN a.en < b.st THEN 'before'
        |         WHEN b.en < a.st THEN 'after'
        |         WHEN a.en = b.st THEN 'meets'
        |         WHEN b.en = a.st THEN 'met_by'
        |         WHEN a.st = b.st AND a.en < b.en THEN 'starts'
        |         WHEN a.st = b.st AND a.en > b.en THEN 'started_by'
        |         WHEN a.en = b.en AND a.st > b.st THEN 'finishes'
        |         WHEN a.en = b.en AND a.st < b.st THEN 'finished_by'
        |         WHEN a.st > b.st AND a.en < b.en THEN 'during'
        |         WHEN a.st < b.st AND a.en > b.en THEN 'contains'
        |         WHEN a.st < b.st AND a.en >= b.st AND a.en < b.en THEN 'overlaps'
        |         WHEN b.st < a.st AND b.en >= a.st AND b.en < a.en THEN 'overlapped_by'
        |         ELSE error('allenRelations: non-exhaustive classification')
        |       END AS relation,
        |       CAST(COUNT(*) AS BIGINT) AS n_pairs
        |FROM li a JOIN li b ON a.ok = b.ok AND a.ln < b.ln
        |GROUP BY 1""".stripMargin,
    "null_skew_join" ->
      // the oracle is the PLAIN left join — the null-routing rewrite
      // must be invisible in the result
      s"""WITH o AS (
         |  SELECT o_orderkey, o_orderstatus,
         |         CASE WHEN ${dH("'nsj:' || CAST(o_orderkey AS VARCHAR)")} % 5 = 0
         |              THEN NULL ELSE o_custkey END AS o_custkey
         |  FROM orders
         |)
         |SELECT o.o_orderstatus,
         |       CAST(COUNT(*) AS BIGINT) AS n_rows,
         |       CAST(COUNT(c.c_mktsegment) AS BIGINT) AS n_matched,
         |       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
         |FROM o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
         |GROUP BY 1""".stripMargin,
    "dpp_prune" ->
      // the oracle joins unpartitioned — layout must not change results
      """WITH o AS (
        |  SELECT o_orderkey, o_totalprice,
        |         strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m') AS o_month
        |  FROM orders
        |), dim AS (
        |  SELECT o_month FROM (
        |    SELECT o_month, COUNT(*) AS mcnt FROM o GROUP BY 1
        |  ) WHERE mcnt % 3 = 0
        |)
        |SELECT o.o_month,
        |       CAST(COUNT(*) AS BIGINT) AS n_rows,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM o JOIN dim USING (o_month)
        |GROUP BY 1""".stripMargin,
    "coverage_select" ->
      // the greedy recursion unrolled: each round's argmax (gain desc,
      // doc_id asc) over shingles not covered by earlier picks
      """WITH tk AS (
        |  SELECT doc_id,
        |         unnest(string_split(lower(text), ' ')) AS tok,
        |         unnest(range(1, len(string_split(lower(text), ' ')) + 1)) AS pos
        |  FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL
        |), w AS (
        |  SELECT doc_id,
        |         tok || ' ' || lead(tok, 1) OVER win || ' ' || lead(tok, 2) OVER win AS s
        |  FROM tk WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
        |), sh AS (
        |  SELECT DISTINCT doc_id, s FROM w WHERE s IS NOT NULL
        |), p1 AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS gain FROM sh
        |  GROUP BY 1 ORDER BY gain DESC, doc_id LIMIT 1
        |), c1 AS (
        |  SELECT DISTINCT s.s FROM sh s JOIN p1 ON s.doc_id = p1.doc_id
        |), p2 AS (
        |  SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS gain FROM sh s
        |  WHERE s.s NOT IN (SELECT s FROM c1)
        |  GROUP BY 1 ORDER BY gain DESC, doc_id LIMIT 1
        |), c2 AS (
        |  SELECT s FROM c1
        |  UNION SELECT s.s FROM sh s JOIN p2 ON s.doc_id = p2.doc_id
        |), p3 AS (
        |  SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS gain FROM sh s
        |  WHERE s.s NOT IN (SELECT s FROM c2)
        |  GROUP BY 1 ORDER BY gain DESC, doc_id LIMIT 1
        |)
        |SELECT CAST(1 AS INT) AS round, p1.doc_id, p1.gain,
        |       p1.gain AS covered_total FROM p1
        |UNION ALL
        |SELECT 2, p2.doc_id, p2.gain, p1.gain + p2.gain FROM p1, p2
        |UNION ALL
        |SELECT 3, p3.doc_id, p3.gain, p1.gain + p2.gain + p3.gain
        |FROM p1, p2, p3""".stripMargin,
    "variant_extract" ->
      // closed-form recomputation from event_id — no JSON parser on the
      // oracle side, so the two engines share NOTHING but the spec
      """SELECT CASE WHEN event_id % 2 = 0
        |            THEN 't' || CAST(event_id % 7 AS VARCHAR) END AS tag,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(event_id) AS BIGINT) AS sum_id,
        |       SUM(CASE WHEN event_id % 3 = 0
        |           THEN CAST(event_id % 100 AS DOUBLE) + 0.5 END) AS sum_score,
        |       CAST(COUNT(CASE WHEN event_id % 5 = 0 THEN 1 END) AS BIGINT) AS n_ok,
        |       CAST(COUNT(CASE WHEN event_id % 7 = 0 THEN 1 END) AS BIGINT) AS n_note_null,
        |       CAST(SUM(CASE WHEN event_id % 11 = 0 THEN 1 END) AS BIGINT) AS sum_tag0
        |FROM events
        |GROUP BY 1""".stripMargin,
    "forecast_backtest" ->
      """WITH daily AS (
        |  SELECT event_type AS key,
        |         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS day,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events WHERE event_type IS NOT NULL
        |  GROUP BY 1, 2
        |), l AS (
        |  SELECT key, n,
        |         MAX(n) OVER (PARTITION BY key ORDER BY day
        |           RANGE BETWEEN 1 PRECEDING AND 1 PRECEDING) AS lag1,
        |         MAX(n) OVER (PARTITION BY key ORDER BY day
        |           RANGE BETWEEN 7 PRECEDING AND 7 PRECEDING) AS lag7
        |  FROM daily
        |)
        |SELECT key, CAST(COUNT(*) AS BIGINT) AS n_days,
        |       CAST(COUNT(lag7) AS BIGINT) AS pairs_seasonal,
        |       CAST(COUNT(lag1) AS BIGINT) AS pairs_naive,
        |       CAST(SUM(abs(n - lag7)) AS BIGINT) AS sae_seasonal,
        |       CAST(SUM(abs(n - lag1)) AS BIGINT) AS sae_naive,
        |       CASE WHEN SUM(abs(n - lag1)) > 0 AND COUNT(lag7) > 0 THEN
        |         CAST(CAST(SUM(abs(n - lag7)) AS BIGINT) * CAST(COUNT(lag1) AS BIGINT) AS DOUBLE)
        |           / CAST(CAST(SUM(abs(n - lag1)) AS BIGINT) * CAST(COUNT(lag7) AS BIGINT) AS DOUBLE)
        |       END AS mase
        |FROM l GROUP BY 1""".stripMargin,
    "schema_diff" ->
      // metadata op: the expected contract-review worklist IS the spec.
      // Note the two deliberate verdicts: ntz→ltz is a SEMANTIC change
      // (breaking), and the added column is non-nullable (breaking)
      """SELECT * FROM (VALUES
        |  ('o_custkey', 'type_changed', 'bigint', 'int', true),
        |  ('o_orderdate', 'type_changed', 'timestamp_ntz', 'timestamp', true),
        |  ('o_orderpriority', 'removed', 'string', CAST(NULL AS VARCHAR), true),
        |  ('o_shippriority', 'added', CAST(NULL AS VARCHAR), 'int', true)
        |) AS t("column", change, old_type, new_type, breaking)""".stripMargin,
    "roc_auc" ->
      """WITH s AS (
        |  SELECT CAST(floor(value) AS BIGINT) AS sc,
        |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
        |), g AS (
        |  SELECT sc, CAST(SUM(y) AS BIGINT) AS cp, CAST(COUNT(*) AS BIGINT) AS ct
        |  FROM s GROUP BY 1
        |), w AS (
        |  SELECT sc, cp, ct,
        |         COALESCE(SUM(ct) OVER (ORDER BY sc
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS b
        |  FROM g
        |), t AS (
        |  SELECT CAST(SUM(cp) AS BIGINT) AS n_pos,
        |         CAST(SUM(ct) - SUM(cp) AS BIGINT) AS n_neg
        |  FROM g
        |)
        |SELECT t.n_pos, t.n_neg,
        |       CAST(SUM(cp * (2 * b + ct + 1)) - t.n_pos * (t.n_pos + 1) AS BIGINT) AS auc_num2,
        |       CAST(CAST(SUM(cp * (2 * b + ct + 1)) - t.n_pos * (t.n_pos + 1) AS BIGINT) AS DOUBLE)
        |         / (2.0 * CAST(t.n_pos AS DOUBLE) * CAST(t.n_neg AS DOUBLE)) AS auc
        |FROM w CROSS JOIN t
        |GROUP BY t.n_pos, t.n_neg""".stripMargin,
    "csv_dead_letter" ->
      // closed form: corrupt ⟺ %97 — the parser's routing must land
      // exactly on the mangling rule; sums recomputed from the source
      // doubles (string round-trip is lossless by shortest-repr)
      """SELECT CASE WHEN o_orderkey % 97 = 0 THEN 'corrupt' ELSE 'clean' END AS status,
        |       CAST(COUNT(*) AS BIGINT) AS n_rows,
        |       CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_ids,
        |       CAST(MIN(o_orderkey) AS BIGINT) AS min_id,
        |       CAST(MAX(o_orderkey) AS BIGINT) AS max_id,
        |       CAST(SUM(CASE WHEN o_orderkey % 97 <> 0
        |                THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY 1""".stripMargin,
    "quantile_interp" ->
      // same construction, not quantile_cont(): the gate needs the
      // IDENTICAL expression tree, not an engine's internal convention
      """WITH v AS (
        |  SELECT event_type AS g, CAST(value AS DOUBLE) AS v
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
        |), r AS (
        |  SELECT g, v,
        |         ROW_NUMBER() OVER (PARTITION BY g ORDER BY v) AS rn,
        |         COUNT(*) OVER (PARTITION BY g) AS n,
        |         LEAD(v, 1) OVER (PARTITION BY g ORDER BY v) AS hi
        |  FROM v
        |)
        |SELECT g AS event_type, q AS q_permille, CAST(n AS BIGINT) AS n,
        |       CASE WHEN (q * (n - 1)) % 1000 = 0 THEN v
        |            ELSE v + (CAST((q * (n - 1)) % 1000 AS DOUBLE) / 1000.0) * (hi - v)
        |       END AS value
        |FROM r CROSS JOIN (SELECT CAST(unnest([500, 900, 990]) AS INTEGER) AS q) qs
        |WHERE rn = (q * (n - 1)) // 1000 + 1""".stripMargin,
    "ks_test" ->
      // the oracle's cumulative is a plain ordered window — value
      // cardinality is DuckDB-sized at the gate SF; the Spark side's
      // two-level scan must land on the identical integer witness
      """WITH c AS (
        |  SELECT value AS v,
        |         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM events
        |  WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL
        |  GROUP BY 1
        |), w AS (
        |  SELECT SUM(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
        |         SUM(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb
        |  FROM c
        |), t AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_a, CAST(SUM(cb) AS BIGINT) AS n_b FROM c)
        |SELECT t.n_a, t.n_b,
        |       CAST(MAX(abs(w.cuma * t.n_b - w.cumb * t.n_a)) AS BIGINT) AS d_num,
        |       CAST(CAST(MAX(abs(w.cuma * t.n_b - w.cumb * t.n_a)) AS BIGINT) AS DOUBLE)
        |         / (CAST(t.n_a AS DOUBLE) * CAST(t.n_b AS DOUBLE)) AS d
        |FROM w CROSS JOIN t
        |GROUP BY t.n_a, t.n_b""".stripMargin,
    "table_profile" ->
      // the profile unrolled: one aggregate CTE, one SELECT per column
      """WITH a AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    COUNT(o_orderkey) AS c1, COUNT(DISTINCT o_orderkey) AS d1,
        |      CAST(MIN(o_orderkey) AS DOUBLE) AS mn1, CAST(MAX(o_orderkey) AS DOUBLE) AS mx1,
        |    COUNT(o_custkey) AS c2, COUNT(DISTINCT o_custkey) AS d2,
        |      CAST(MIN(o_custkey) AS DOUBLE) AS mn2, CAST(MAX(o_custkey) AS DOUBLE) AS mx2,
        |    COUNT(o_orderstatus) AS c3, COUNT(DISTINCT o_orderstatus) AS d3,
        |      MIN(o_orderstatus) AS ms3, MAX(o_orderstatus) AS xs3,
        |    COUNT(o_totalprice) AS c4, COUNT(DISTINCT o_totalprice) AS d4,
        |      CAST(MIN(o_totalprice) AS DOUBLE) AS mn4, CAST(MAX(o_totalprice) AS DOUBLE) AS mx4,
        |    COUNT(o_orderdate) AS c5, COUNT(DISTINCT o_orderdate) AS d5,
        |      CAST(CAST(MIN(o_orderdate) AS DATE) AS VARCHAR) AS ms5,
        |      CAST(CAST(MAX(o_orderdate) AS DATE) AS VARCHAR) AS xs5,
        |    COUNT(o_orderpriority) AS c6, COUNT(DISTINCT o_orderpriority) AS d6,
        |      MIN(o_orderpriority) AS ms6, MAX(o_orderpriority) AS xs6
        |  FROM orders
        |)
        |SELECT 'o_orderkey' AS "column", 'numeric' AS dtype, n,
        |       CAST(n - c1 AS BIGINT) AS n_null, CAST(d1 AS BIGINT) AS n_distinct,
        |       d1 = c1 AS is_unique, mn1 AS min_num, mx1 AS max_num,
        |       CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str FROM a
        |UNION ALL SELECT 'o_custkey', 'numeric', n, CAST(n - c2 AS BIGINT),
        |       CAST(d2 AS BIGINT), d2 = c2, mn2, mx2, NULL, NULL FROM a
        |UNION ALL SELECT 'o_orderstatus', 'string', n, CAST(n - c3 AS BIGINT),
        |       CAST(d3 AS BIGINT), d3 = c3, NULL, NULL, ms3, xs3 FROM a
        |UNION ALL SELECT 'o_totalprice', 'numeric', n, CAST(n - c4 AS BIGINT),
        |       CAST(d4 AS BIGINT), d4 = c4, mn4, mx4, NULL, NULL FROM a
        |UNION ALL SELECT 'o_orderdate', 'timestamp', n, CAST(n - c5 AS BIGINT),
        |       CAST(d5 AS BIGINT), d5 = c5, NULL, NULL, ms5, xs5 FROM a
        |UNION ALL SELECT 'o_orderpriority', 'string', n, CAST(n - c6 AS BIGINT),
        |       CAST(d6 AS BIGINT), d6 = c6, NULL, NULL, ms6, xs6 FROM a""".stripMargin,
    "table_profile_approx" ->
      // sketch-gate twin of table_profile: exact columns compare
      // exactly; the sketch's plausibility boolean is literal true; the
      // uniqueness verdict applies the SAME 0.9-tolerant rule to
      // DuckDB's exact distinct (cheap there — no Expand), so the two
      // engines agree unless the sketch errs > 10% at a 0.9-band edge,
      // far outside the 2σ envelope of the default 5% rsd
      // (o_totalprice sits at d/c = 0.9999 — an exact-equality verdict
      // would diverge, the 0.9-rule one cannot)
      """WITH a AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    COUNT(o_orderkey) AS c1, COUNT(DISTINCT o_orderkey) AS d1,
        |      CAST(MIN(o_orderkey) AS DOUBLE) AS mn1, CAST(MAX(o_orderkey) AS DOUBLE) AS mx1,
        |    COUNT(o_custkey) AS c2, COUNT(DISTINCT o_custkey) AS d2,
        |      CAST(MIN(o_custkey) AS DOUBLE) AS mn2, CAST(MAX(o_custkey) AS DOUBLE) AS mx2,
        |    COUNT(o_orderstatus) AS c3, COUNT(DISTINCT o_orderstatus) AS d3,
        |      MIN(o_orderstatus) AS ms3, MAX(o_orderstatus) AS xs3,
        |    COUNT(o_totalprice) AS c4, COUNT(DISTINCT o_totalprice) AS d4,
        |      CAST(MIN(o_totalprice) AS DOUBLE) AS mn4, CAST(MAX(o_totalprice) AS DOUBLE) AS mx4,
        |    COUNT(o_orderdate) AS c5, COUNT(DISTINCT o_orderdate) AS d5,
        |      CAST(CAST(MIN(o_orderdate) AS DATE) AS VARCHAR) AS ms5,
        |      CAST(CAST(MAX(o_orderdate) AS DATE) AS VARCHAR) AS xs5,
        |    COUNT(o_orderpriority) AS c6, COUNT(DISTINCT o_orderpriority) AS d6,
        |      MIN(o_orderpriority) AS ms6, MAX(o_orderpriority) AS xs6
        |  FROM orders
        |)
        |SELECT 'o_orderkey' AS "column", 'numeric' AS dtype, n,
        |       CAST(n - c1 AS BIGINT) AS n_null, true AS distinct_bounded,
        |       CAST(d1 AS DOUBLE) >= CAST(c1 AS DOUBLE) * 0.9 AS is_unique,
        |       mn1 AS min_num, mx1 AS max_num,
        |       CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str FROM a
        |UNION ALL SELECT 'o_custkey', 'numeric', n, CAST(n - c2 AS BIGINT),
        |       true, CAST(d2 AS DOUBLE) >= CAST(c2 AS DOUBLE) * 0.9, mn2, mx2, NULL, NULL FROM a
        |UNION ALL SELECT 'o_orderstatus', 'string', n, CAST(n - c3 AS BIGINT),
        |       true, CAST(d3 AS DOUBLE) >= CAST(c3 AS DOUBLE) * 0.9, NULL, NULL, ms3, xs3 FROM a
        |UNION ALL SELECT 'o_totalprice', 'numeric', n, CAST(n - c4 AS BIGINT),
        |       true, CAST(d4 AS DOUBLE) >= CAST(c4 AS DOUBLE) * 0.9, mn4, mx4, NULL, NULL FROM a
        |UNION ALL SELECT 'o_orderdate', 'timestamp', n, CAST(n - c5 AS BIGINT),
        |       true, CAST(d5 AS DOUBLE) >= CAST(c5 AS DOUBLE) * 0.9, NULL, NULL, ms5, xs5 FROM a
        |UNION ALL SELECT 'o_orderpriority', 'string', n, CAST(n - c6 AS BIGINT),
        |       true, CAST(d6 AS DOUBLE) >= CAST(c6 AS DOUBLE) * 0.9, NULL, NULL, ms6, xs6 FROM a""".stripMargin,
    "lag_features" ->
      // DuckDB's integer-RANGE windows mirror the Spark frames; QUALIFY
      // drops rows whose label day is unobserved, same as the IS NOT
      // NULL filter
      """WITH daily AS (
        |  SELECT event_type AS key,
        |         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS day,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events WHERE event_type IS NOT NULL
        |  GROUP BY 1, 2
        |)
        |SELECT key, day, n,
        |       MAX(n) OVER (PARTITION BY key ORDER BY day
        |         RANGE BETWEEN 1 PRECEDING AND 1 PRECEDING) AS lag1,
        |       MAX(n) OVER (PARTITION BY key ORDER BY day
        |         RANGE BETWEEN 7 PRECEDING AND 7 PRECEDING) AS lag7,
        |       CAST(SUM(n) OVER (PARTITION BY key ORDER BY day
        |         RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT) AS roll7,
        |       CAST((day + 4) % 7 AS INTEGER) AS dow,
        |       MAX(n) OVER (PARTITION BY key ORDER BY day
        |         RANGE BETWEEN 1 FOLLOWING AND 1 FOLLOWING) AS label
        |FROM daily
        |QUALIFY label IS NOT NULL""".stripMargin,
    "path_rollup" ->
      // the same prefix expansion via zipped unnests of equal-length
      // lists; depth is the prefix's own level
      """WITH p AS (
        |  SELECT list_filter(string_split(
        |           '/s' || CAST(doc_id % 5 AS VARCHAR)
        |           || (CASE WHEN doc_id % 4 >= 1 THEN '/t' || CAST(doc_id % 3 AS VARCHAR) ELSE '' END)
        |           || (CASE WHEN doc_id % 4 >= 2 THEN '/u' || CAST(doc_id % 2 AS VARCHAR) ELSE '' END)
        |           || (CASE WHEN doc_id % 4 >= 3 THEN '/v' || CAST(doc_id % 7 AS VARCHAR) ELSE '' END),
        |           '/'), s -> s != '') AS segs
        |  FROM documents WHERE doc_id IS NOT NULL
        |), pref AS (
        |  SELECT unnest(list_transform(range(1, len(segs) + 1),
        |           i -> '/' || array_to_string(segs[1:i], '/'))) AS prefix,
        |         unnest(range(1, len(segs) + 1)) AS lvl,
        |         len(segs) AS full_depth
        |  FROM p WHERE len(segs) > 0
        |)
        |SELECT prefix, CAST(lvl AS INTEGER) AS depth,
        |       CAST(COUNT(*) AS BIGINT) AS n_rows,
        |       CAST(COUNT(CASE WHEN lvl = full_depth THEN 1 END) AS BIGINT) AS n_exact
        |FROM pref GROUP BY 1, 2""".stripMargin,
    "lorenz_gini" ->
      """WITH pk AS (
        |  SELECT o_orderstatus AS grp, o_custkey AS key,
        |         CAST(SUM(CAST(floor(o_totalprice + 0.5) AS BIGINT)) AS BIGINT) AS c
        |  FROM orders WHERE o_orderstatus IS NOT NULL AND o_custkey IS NOT NULL
        |  GROUP BY 1, 2
        |), r AS (
        |  SELECT grp, c,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY grp ORDER BY c, key) AS BIGINT) AS i,
        |         CAST(COUNT(*) OVER (PARTITION BY grp) AS BIGINT) AS n
        |  FROM pk
        |)
        |SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_keys,
        |       CAST(SUM(c) AS BIGINT) AS total,
        |       CAST(SUM((i * 2 - n - 1) * c) AS BIGINT) AS gini_num,
        |       CAST(CAST(SUM((i * 2 - n - 1) * c) AS BIGINT) AS DOUBLE)
        |         / CAST(COUNT(*) * CAST(SUM(c) AS BIGINT) AS DOUBLE) AS gini
        |FROM r GROUP BY 1""".stripMargin,
    "xml_extract" ->
      """SELECT CASE WHEN event_id % 2 = 0
        |            THEN 't' || CAST(event_id % 7 AS VARCHAR) END AS tag,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(event_id) AS BIGINT) AS sum_id,
        |       SUM(CASE WHEN event_id % 3 = 0
        |           THEN CAST(event_id % 100 AS DOUBLE) + 0.5 END) AS sum_score
        |FROM events
        |GROUP BY 1""".stripMargin,
    "sample_audit" ->
      s"""WITH f AS (
         |  SELECT lang AS stratum, CAST(COUNT(*) AS BIGINT) AS n_full
         |  FROM documents GROUP BY 1
         |), sm AS (
         |  SELECT lang AS stratum, CAST(COUNT(*) AS BIGINT) AS n_sample
         |  FROM documents
         |  WHERE ${dH("CAST(doc_id AS VARCHAR)")} % 100 < 10
         |  GROUP BY 1
         |)
         |SELECT f.stratum, f.n_full,
         |       CAST(COALESCE(sm.n_sample, 0) AS BIGINT) AS n_sample,
         |       CAST(COALESCE(sm.n_sample, 0) AS DOUBLE)
         |         / CAST(f.n_full AS DOUBLE) AS rate,
         |       (100 * COALESCE(sm.n_sample, 0) - 10 * f.n_full)
         |         * (100 * COALESCE(sm.n_sample, 0) - 10 * f.n_full)
         |         > 9 * 10 * 90 * f.n_full AS dev_flag,
         |       CAST(100 * COALESCE(sm.n_sample, 0) - 10 * f.n_full AS DOUBLE)
         |         / sqrt(CAST(10 * 90 * f.n_full AS DOUBLE)) AS z
         |FROM f LEFT JOIN sm ON sm.stratum = f.stratum""".stripMargin,
    "scd2_history" ->
      s"""$dCdcCtes
         |SELECT cust_id, name, nation, segment,
         |       version AS valid_from, valid_to, valid_to IS NULL AS is_current
         |FROM (
         |  SELECT *, lead(version) OVER (PARTITION BY cust_id
         |                                ORDER BY version) AS valid_to
         |  FROM chg) t
         |WHERE op <> 'D'""".stripMargin,
    "epoch_order" ->
      s"""SELECT doc_id, shard,
         |       row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS shard_rank
         |FROM (SELECT doc_id,
         |             ${dH("('1:' || CAST(doc_id AS VARCHAR))")} % 8 AS shard,
         |             ${dH("('1:' || CAST(doc_id AS VARCHAR))")} AS h
         |      FROM documents) t""".stripMargin,
    "lsh_tuning" -> {
      val configs = Seq((2, 8), (4, 4), (8, 2))
      val k = 16
      val rMin = 2
      val bMin = k / rMin
      val mh16 = (0 until k).map { i =>
        s"list_min(list_transform(hs, x -> (${Dedup.minhashA(i)} * (x % 1073741824) + ${Dedup.minhashB(i)}) % ${Dedup.MinhashP})) AS mh$i"
      }.mkString(",\n         ")
      val mharr = (0 until k).map(i => s"mh$i").mkString("[", ", ", "]")
      val bandCols = (0 until bMin).map { j =>
        val slice = (j * rMin until j * rMin + rMin).map(i => s"mh$i")
          .mkString("concat_ws(',', ", ", ", ")")
        s"${dH(slice)} AS b$j"
      }.mkString(",\n         ")
      val sbUnion = (0 until bMin)
        .map(j => s"SELECT doc_id, $j AS j, b$j AS bh FROM ma")
        .mkString("\n    UNION ALL\n    ")
      def member(b: Int, r: Int) =
        s"len(list_filter(range(0, $b), j -> a_mh[j*$r+1:j*$r+$r] = b_mh[j*$r+1:j*$r+$r])) > 0"
      val flagCols = configs.map { case (b, r) =>
        s"${member(b, r)} AS m_${b}_$r"
      }.mkString(",\n         ")
      val aggCols = configs.flatMap { case (b, r) =>
        Seq(
          s"CAST(COALESCE(SUM(CASE WHEN m_${b}_$r THEN 1 END), 0) AS BIGINT) AS nc_${b}_$r",
          s"CAST(COALESCE(SUM(CASE WHEN m_${b}_$r AND hit = 1 THEN 1 END), 0) AS BIGINT) AS nh_${b}_$r")
      }.mkString(",\n         ")
      val finals = configs.map { case (b, r) =>
        s"""SELECT CAST($b AS INT) AS bands, CAST($r AS INT) AS rows_per_band,
           |       nc_${b}_$r AS n_candidates, tc.n_truth, nh_${b}_$r AS n_hits,
           |       CASE WHEN nc_${b}_$r > 0 THEN CAST(nh_${b}_$r AS DOUBLE) / CAST(nc_${b}_$r AS DOUBLE) END AS "precision",
           |       CASE WHEN tc.n_truth > 0 THEN CAST(nh_${b}_$r AS DOUBLE) / CAST(tc.n_truth AS DOUBLE) END AS recall
           |FROM st, tc""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""$dToksCte, s AS (
         |  SELECT doc_id, $dSh AS sh FROM t
         |), e AS (
         |  SELECT doc_id, unnest(list_transform(sh, s2 -> ${dH("s2")})) AS shingle_hash
         |  FROM s
         |), sizes AS (
         |  SELECT doc_id, COUNT(*) AS n_sh FROM e GROUP BY 1
         |), truth AS (
         |  SELECT a_id, b_id FROM (
         |    SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_common
         |    FROM e a JOIN e b ON a.shingle_hash = b.shingle_hash AND a.doc_id < b.doc_id
         |    GROUP BY 1, 2
         |  ) c
         |  JOIN sizes na ON na.doc_id = c.a_id
         |  JOIN sizes nb ON nb.doc_id = c.b_id
         |  WHERE 5 * n_common >= 3 * (na.n_sh + nb.n_sh - n_common)
         |), tc AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth
         |), h2 AS (
         |  SELECT doc_id, list_transform(sh, s2 -> ${dH("s2")}) AS hs
         |  FROM s WHERE len(sh) > 0
         |), m AS (
         |  SELECT doc_id,
         |         $mh16
         |  FROM h2
         |), ma AS (
         |  SELECT doc_id, $mharr AS mharr,
         |         $bandCols
         |  FROM m
         |), sb AS (
         |    $sbUnion
         |), cand0 AS (
         |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM sb a JOIN sb b ON a.j = b.j AND a.bh = b.bh AND a.doc_id < b.doc_id
         |), wm AS (
         |  SELECT c.a_id, c.b_id, x.mharr AS a_mh, y.mharr AS b_mh,
         |         CASE WHEN t.a_id IS NOT NULL THEN 1 ELSE 0 END AS hit
         |  FROM cand0 c
         |  JOIN ma x ON x.doc_id = c.a_id
         |  JOIN ma y ON y.doc_id = c.b_id
         |  LEFT JOIN truth t ON t.a_id = c.a_id AND t.b_id = c.b_id
         |), flags AS (
         |  SELECT hit,
         |         $flagCols
         |  FROM wm
         |), st AS (
         |  SELECT $aggCols
         |  FROM flags
         |)
         |$finals""".stripMargin
    },
    "ssjoin_pairs" ->
      s"""$dToksCte, s AS (
         |  SELECT doc_id, $dSh AS sh FROM t
         |), e AS (
         |  SELECT doc_id, unnest(list_transform(sh, s2 -> ${dH("s2")})) AS shingle_hash
         |  FROM s
         |), sizes AS (
         |  SELECT doc_id, COUNT(*) AS n_sh FROM e GROUP BY 1
         |), common AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_common
         |  FROM e a JOIN e b ON a.shingle_hash = b.shingle_hash AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |)
         |SELECT a_id, b_id,
         |       CAST(na.n_sh AS BIGINT) AS a_n, CAST(nb.n_sh AS BIGINT) AS b_n,
         |       n_common,
         |       CAST(n_common AS DOUBLE) / CAST(na.n_sh + nb.n_sh - n_common AS DOUBLE) AS jaccard
         |FROM common
         |JOIN sizes na ON na.doc_id = a_id
         |JOIN sizes nb ON nb.doc_id = b_id
         |WHERE 5 * n_common >= 3 * (na.n_sh + nb.n_sh - n_common)
         |ORDER BY a_id, b_id""".stripMargin,
    "ngram_jaccard" ->
      s"""$dToksCte, s AS (
         |  SELECT doc_id, $dSh AS sh FROM t
         |), e AS (
         |  SELECT doc_id, unnest(list_transform(sh, s2 -> ${dH("s2")})) AS shingle_hash
         |  FROM s
         |), g AS (
         |  SELECT shingle_hash FROM e GROUP BY 1 HAVING COUNT(*) <= 100
         |), ec AS (
         |  SELECT e.doc_id, e.shingle_hash FROM e JOIN g USING (shingle_hash)
         |), sizes AS (
         |  SELECT doc_id, COUNT(*) AS n_sh FROM ec GROUP BY 1
         |), common AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_common
         |  FROM ec a JOIN ec b ON a.shingle_hash = b.shingle_hash AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |)
         |SELECT a_id, b_id, n_common,
         |       CAST(n_common AS DOUBLE) / CAST(na.n_sh + nb.n_sh - n_common AS DOUBLE) AS jaccard
         |FROM common
         |JOIN sizes na ON na.doc_id = a_id
         |JOIN sizes nb ON nb.doc_id = b_id
         |ORDER BY jaccard DESC, a_id, b_id
         |LIMIT 50""".stripMargin,
    "dedup_clusters" -> dCcSql,
    "dedup_source_overlap" -> {
      // dCcSql folded into a `cc` CTE (the cluster_diameter pattern),
      // then the per-(cluster, source) counts and the pair matrix
      val ccCtes = dCcSql.replace(
        "\nSELECT u AS doc_id, MIN(v) AS component FROM reach GROUP BY 1",
        ", cc AS (\n  SELECT u AS doc_id, MIN(v) AS component FROM reach GROUP BY 1\n)")
      s"""$ccCtes, mem AS (
         |  SELECT c.component, c.doc_id, d.source
         |  FROM cc c JOIN documents d USING (doc_id)
         |), ps AS (
         |  SELECT component, source, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM mem GROUP BY 1, 2
         |)
         |SELECT a.source AS source_a, b.source AS source_b,
         |       CAST(COUNT(*) AS BIGINT) AS n_clusters,
         |       CAST(SUM(CASE WHEN a.source = b.source
         |                     THEN a.n * (a.n - 1) // 2
         |                     ELSE a.n * b.n END) AS BIGINT) AS n_doc_pairs
         |FROM ps a JOIN ps b ON a.component = b.component
         |                   AND a.source <= b.source
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },
    "cluster_diameter" -> {
      // dCcSql with its terminal SELECT folded into a `cc` CTE, then the
      // star-distance jaccard over the same hashed-shingle lists
      val ccCtes = dCcSql.replace(
        "\nSELECT u AS doc_id, MIN(v) AS component FROM reach GROUP BY 1",
        ", cc AS (\n  SELECT u AS doc_id, MIN(v) AS component FROM reach GROUP BY 1\n)")
      s"""$ccCtes, mem AS (
         |  SELECT component, doc_id FROM cc WHERE doc_id <> component
         |), shd AS (
         |  SELECT DISTINCT doc_id, h
         |  FROM (SELECT doc_id, unnest(hs) AS h FROM h2) z
         |), ssz AS (
         |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM shd GROUP BY 1
         |), mm AS (
         |  SELECT m.component, m.doc_id, x.h
         |  FROM mem m JOIN shd x ON x.doc_id = m.doc_id
         |), rr AS (
         |  SELECT k.component, x.h
         |  FROM (SELECT DISTINCT component FROM mem) k
         |  JOIN shd x ON x.doc_id = k.component
         |), itr AS (
         |  SELECT mm.component, mm.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
         |  FROM mm JOIN rr ON rr.component = mm.component AND rr.h = mm.h
         |  GROUP BY 1, 2
         |)
         |SELECT m.component, m.doc_id,
         |       CAST(COALESCE(za.sz, 0) AS BIGINT) AS sz_rep,
         |       CAST(COALESCE(zb.sz, 0) AS BIGINT) AS sz_member,
         |       CAST(COALESCE(i.n_shared, 0) AS BIGINT) AS n_shared,
         |       CASE WHEN COALESCE(za.sz, 0) + COALESCE(zb.sz, 0)
         |                 - COALESCE(i.n_shared, 0) > 0 THEN
         |         CAST(COALESCE(i.n_shared, 0) AS DOUBLE)
         |           / CAST(COALESCE(za.sz, 0) + COALESCE(zb.sz, 0)
         |                  - COALESCE(i.n_shared, 0) AS DOUBLE) END AS jaccard,
         |       3 * COALESCE(i.n_shared, 0)
         |         < 1 * (COALESCE(za.sz, 0) + COALESCE(zb.sz, 0)) AS chain_flag
         |FROM mem m
         |LEFT JOIN ssz za ON za.doc_id = m.component
         |LEFT JOIN ssz zb ON zb.doc_id = m.doc_id
         |LEFT JOIN itr i ON i.component = m.component AND i.doc_id = m.doc_id""".stripMargin
    },
    // dedup_stats extends the SAME recursive-CC oracle with a size
    // histogram — one truth construction, two views
    "dedup_stats" -> dCcSql.replace(
      "SELECT u AS doc_id, MIN(v) AS component FROM reach GROUP BY 1",
      """, comp0 AS (
        |  SELECT u AS doc_id, MIN(v) AS component FROM reach GROUP BY 1
        |), sizes AS (
        |  SELECT component, CAST(COUNT(*) AS BIGINT) AS cluster_size
        |  FROM comp0 GROUP BY 1
        |)
        |SELECT cluster_size,
        |       CAST(COUNT(*) AS BIGINT) AS n_clusters,
        |       CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs,
        |       CAST((cluster_size - 1) * COUNT(*) AS BIGINT) AS n_removable
        |FROM sizes GROUP BY 1""".stripMargin),
    "leakage_safe_split" ->
      s"""${dToksCte.replace("WITH t AS", "WITH RECURSIVE t AS")}, s AS (
         |  SELECT doc_id, $dSh AS sh FROM t
         |), h2 AS (
         |  SELECT doc_id, list_transform(sh, s2 -> ${dH("s2")}) AS hs FROM s
         |), m AS (
         |  SELECT doc_id,
         |       $dMh
         |  FROM h2
         |), sig AS (
         |  SELECT doc_id,
         |         ${dH("concat_ws(',', mh0, mh1, mh2, mh3)")} AS band0,
         |         ${dH("concat_ws(',', mh4, mh5, mh6, mh7)")} AS band1
         |  FROM m
         |), pairs AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM sig a JOIN sig b
         |    ON a.doc_id < b.doc_id AND (a.band0 = b.band0 OR a.band1 = b.band1)
         |), edges AS (
         |  SELECT a_id AS u, b_id AS v FROM pairs
         |  UNION
         |  SELECT b_id, a_id FROM pairs
         |), reach AS (
         |  SELECT u, u AS v FROM (SELECT DISTINCT u FROM edges)
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
         |), comp AS (
         |  SELECT u AS doc_id, MIN(v) AS component FROM reach GROUP BY 1
         |), reps AS (
         |  SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS rep
         |  FROM documents d LEFT JOIN comp c USING (doc_id)
         |)
         |SELECT doc_id, rep,
         |       CASE WHEN b < 10 THEN 'test'
         |            WHEN b < 20 THEN 'val'
         |            ELSE 'train' END AS split
         |FROM (SELECT doc_id, rep, ${dH("CAST(rep AS VARCHAR)")} % 100 AS b
         |      FROM reps) t""".stripMargin,
    "fuzzy_dedup_survivors" ->
      s"""${dToksCte.replace("WITH t AS", "WITH RECURSIVE t AS")}, s AS (
         |  SELECT doc_id, $dSh AS sh FROM t
         |), h2 AS (
         |  SELECT doc_id, list_transform(sh, s2 -> ${dH("s2")}) AS hs FROM s
         |), m AS (
         |  SELECT doc_id,
         |       $dMh
         |  FROM h2
         |), sig AS (
         |  SELECT doc_id,
         |         ${dH("concat_ws(',', mh0, mh1, mh2, mh3)")} AS band0,
         |         ${dH("concat_ws(',', mh4, mh5, mh6, mh7)")} AS band1,
         |         mh0, mh1, mh2, mh3, mh4, mh5, mh6, mh7
         |  FROM m
         |), pairs AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM sig a JOIN sig b
         |    ON a.doc_id < b.doc_id AND (a.band0 = b.band0 OR a.band1 = b.band1)
         |   AND (${(0 until 8).map(i => s"CASE WHEN a.mh$i = b.mh$i THEN 1 ELSE 0 END").mkString(" + ")}) >= 4
         |), edges AS (
         |  SELECT a_id AS u, b_id AS v FROM pairs
         |  UNION
         |  SELECT b_id, a_id FROM pairs
         |), reach AS (
         |  SELECT u, u AS v FROM (SELECT DISTINCT u FROM edges)
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
         |), comp AS (
         |  SELECT u AS doc_id, MIN(v) AS component FROM reach GROUP BY 1
         |)
         |SELECT d.doc_id, d.lang, d.source, d.n_chars
         |FROM documents d
         |WHERE d.doc_id NOT IN (SELECT doc_id FROM comp WHERE component <> doc_id)""".stripMargin,
    "fuzzy_dedup_best" ->
      s"""${dToksCte.replace("WITH t AS", "WITH RECURSIVE t AS")}, s AS (
         |  SELECT doc_id, $dSh AS sh FROM t
         |), h2 AS (
         |  SELECT doc_id, list_transform(sh, s2 -> ${dH("s2")}) AS hs FROM s
         |), m AS (
         |  SELECT doc_id,
         |       $dMh
         |  FROM h2
         |), sig AS (
         |  SELECT doc_id,
         |         ${dH("concat_ws(',', mh0, mh1, mh2, mh3)")} AS band0,
         |         ${dH("concat_ws(',', mh4, mh5, mh6, mh7)")} AS band1,
         |         mh0, mh1, mh2, mh3, mh4, mh5, mh6, mh7
         |  FROM m
         |), pairs AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM sig a JOIN sig b
         |    ON a.doc_id < b.doc_id AND (a.band0 = b.band0 OR a.band1 = b.band1)
         |   AND (${(0 until 8).map(i => s"CASE WHEN a.mh$i = b.mh$i THEN 1 ELSE 0 END").mkString(" + ")}) >= 4
         |), edges AS (
         |  SELECT a_id AS u, b_id AS v FROM pairs
         |  UNION
         |  SELECT b_id, a_id FROM pairs
         |), reach AS (
         |  SELECT u, u AS v FROM (SELECT DISTINCT u FROM edges)
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
         |), comp AS (
         |  SELECT u AS doc_id, MIN(v) AS component FROM reach GROUP BY 1
         |), score AS (
         |  -- the score must read FILTERED tokens (classifier_score's
         |  -- tokenizer): an empty token from consecutive spaces would
         |  -- contribute a nonzero pseudo-weight here but not on the
         |  -- Spark side, flipping cluster-keeper choices
         |  SELECT doc_id,
         |         CASE WHEN toks IS NULL THEN NULL
         |              ELSE COALESCE(CAST(list_sum(list_transform(
         |                list_filter(toks, x -> x <> ''),
         |                x -> ((${dH("x")} % 1024) * 2654435761) % 2001 - 1000))
         |                AS BIGINT), 0) END AS score_milli
         |  FROM t
         |), keepers AS (
         |  SELECT doc_id FROM (
         |    SELECT c.doc_id,
         |           row_number() OVER (PARTITION BY c.component
         |                              ORDER BY sc.score_milli DESC, c.doc_id) AS rn
         |    FROM comp c JOIN score sc USING (doc_id)) z
         |  WHERE rn = 1
         |)
         |SELECT d.doc_id, d.lang, d.source, d.n_chars
         |FROM documents d
         |WHERE d.doc_id NOT IN (SELECT doc_id FROM comp)
         |   OR d.doc_id IN (SELECT doc_id FROM keepers)""".stripMargin,
    "ngram_jaccard_capped" ->
      s"""$dToksCte, s AS (
         |  SELECT doc_id, $dSh AS sh FROM t
         |), e AS (
         |  SELECT doc_id, unnest(list_transform(sh, s2 -> ${dH("s2")})) AS shingle_hash
         |  FROM s
         |), g AS (
         |  SELECT shingle_hash FROM e GROUP BY 1 HAVING COUNT(*) <= 20
         |), ec AS (
         |  SELECT e.doc_id, e.shingle_hash FROM e JOIN g USING (shingle_hash)
         |), sizes AS (
         |  SELECT doc_id, COUNT(*) AS n_sh FROM ec GROUP BY 1
         |), common AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_common
         |  FROM ec a JOIN ec b ON a.shingle_hash = b.shingle_hash AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |)
         |SELECT a_id, b_id, n_common,
         |       CAST(n_common AS DOUBLE) / CAST(na.n_sh + nb.n_sh - n_common AS DOUBLE) AS jaccard
         |FROM common
         |JOIN sizes na ON na.doc_id = a_id
         |JOIN sizes nb ON nb.doc_id = b_id
         |ORDER BY jaccard DESC, a_id, b_id
         |LIMIT 50""".stripMargin,
    "containment_pairs" ->
      s"""$dToksCte, s AS (
         |  SELECT doc_id, $dSh AS sh FROM t
         |), e AS (
         |  SELECT doc_id, unnest(list_transform(sh, s2 -> ${dH("s2")})) AS shingle_hash
         |  FROM s
         |), g AS (
         |  SELECT shingle_hash FROM e GROUP BY 1 HAVING COUNT(*) <= 20
         |), ec AS (
         |  SELECT e.doc_id, e.shingle_hash FROM e JOIN g USING (shingle_hash)
         |), sizes AS (
         |  SELECT doc_id, COUNT(*) AS n_sh FROM ec GROUP BY 1
         |), common AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_common
         |  FROM ec a JOIN ec b ON a.shingle_hash = b.shingle_hash AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |)
         |SELECT a_id, b_id, na.n_sh AS a_n, nb.n_sh AS b_n, n_common,
         |       CAST(n_common AS DOUBLE) / CAST(least(na.n_sh, nb.n_sh) AS DOUBLE) AS containment,
         |       CAST(n_common AS DOUBLE) / CAST(na.n_sh + nb.n_sh - n_common AS DOUBLE) AS jaccard
         |FROM common
         |JOIN sizes na ON na.doc_id = a_id
         |JOIN sizes nb ON nb.doc_id = b_id
         |WHERE CAST(n_common AS DOUBLE) / CAST(least(na.n_sh, nb.n_sh) AS DOUBLE) >= 0.8
         |ORDER BY containment DESC, a_id, b_id""".stripMargin,
    "tfidf_cosine_pairs" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |             FROM documents WHERE doc_id IS NOT NULL),
        |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        |n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
        |d AS (SELECT doc_id, token, tf, COUNT(*) OVER (PARTITION BY token) AS df FROM tf),
        |w AS (SELECT doc_id, token, tf * (n.n_docs / df) AS w
        |      FROM d CROSS JOIN n WHERE df <= 100),
        |nm AS (SELECT doc_id, sqrt(SUM(w * w)) AS nrm FROM w GROUP BY 1),
        |wn AS (SELECT w.doc_id, token, w.w, nm.nrm FROM w JOIN nm USING (doc_id)),
        |p AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |         round(SUM(a.w * b.w) / (a.nrm * b.nrm), 6) AS cosine
        |  FROM wn a JOIN wn b ON a.token = b.token AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id, a.nrm, b.nrm
        |)
        |SELECT a_id, b_id, cosine FROM p
        |WHERE cosine >= 0.5
        |ORDER BY cosine DESC, a_id, b_id
        |LIMIT 50""".stripMargin,
    "attribution" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS tus FROM events
        |), p AS (
        |  SELECT event_id AS purchase_id, user_id, tus AS p_tus
        |  FROM ev WHERE event_type = 'purchase'
        |), t AS (
        |  SELECT user_id, event_id AS touch_id, event_type AS touch_type, tus AS t_tus
        |  FROM ev WHERE event_type IN ('click', 'view')
        |), cand AS (
        |  SELECT p.purchase_id, p.p_tus, t.touch_id, t.touch_type, t.t_tus,
        |         row_number() OVER (PARTITION BY p.purchase_id
        |                            ORDER BY t.t_tus DESC, t.touch_id DESC) AS rn_last,
        |         row_number() OVER (PARTITION BY p.purchase_id
        |                            ORDER BY t.t_tus ASC, t.touch_id ASC) AS rn_first
        |  FROM p JOIN t ON p.user_id = t.user_id
        |   AND t.t_tus < p.p_tus AND t.t_tus >= p.p_tus - 3600000000
        |), attr AS (
        |  SELECT purchase_id,
        |         MAX(CASE WHEN rn_first = 1 THEN touch_id END) AS first_touch_id,
        |         MAX(CASE WHEN rn_last = 1 THEN touch_id END) AS last_touch_id,
        |         MAX(CASE WHEN rn_last = 1 THEN touch_type END) AS last_touch_type,
        |         MAX(CASE WHEN rn_last = 1
        |             THEN CAST(p_tus - t_tus AS DOUBLE) / 1000000.0 END) AS secs_since_last
        |  FROM cand GROUP BY purchase_id
        |)
        |SELECT p.purchase_id, p.user_id,
        |       attr.first_touch_id, attr.last_touch_id,
        |       attr.last_touch_type, attr.secs_since_last
        |FROM p LEFT JOIN attr USING (purchase_id)""".stripMargin,
    "pack_sequences" ->
      s"""WITH sized AS (
         |  SELECT doc_id,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |         ${dH("CAST(doc_id AS VARCHAR)")} % 32 AS grp,
         |         ${dH("CAST(doc_id AS VARCHAR)")} AS h
         |  FROM documents
         |), placed AS (
         |  SELECT grp, doc_id, n_tokens,
         |         CAST((SUM(n_tokens) OVER (PARTITION BY grp ORDER BY h, doc_id
         |            ROWS UNBOUNDED PRECEDING) - n_tokens) // 512 AS BIGINT) AS bin
         |  FROM sized
         |)
         |SELECT grp, bin, COUNT(*) AS n_docs,
         |       CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
         |       CAST(CAST(SUM(n_tokens) AS BIGINT) AS DOUBLE) / 512.0 AS fill_ratio
         |FROM placed
         |GROUP BY grp, bin""".stripMargin,
    "freq_score" ->
      """WITH tok AS (
        |  -- doc_id IS NOT NULL mirrors the Spark side exactly: corpus
        |  -- frequencies are defined over IDENTIFIED documents (a
        |  -- null-doc row's tokens count in neither engine)
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
        |  FROM documents WHERE doc_id IS NOT NULL
        |), m AS (
        |  SELECT doc_id, length(bin(COUNT(*) OVER (PARTITION BY token))) - 1 AS mag
        |  FROM tok
        |), p AS (
        |  SELECT doc_id, COUNT(*) AS n_tokens,
        |         CAST(SUM(mag) AS BIGINT) AS logfreq_sum,
        |         CAST(MIN(mag) AS BIGINT) AS rarest_mag
        |  FROM m GROUP BY doc_id
        |)
        |SELECT d.doc_id, p.n_tokens, p.logfreq_sum, p.rarest_mag
        |FROM documents d LEFT JOIN p USING (doc_id)""".stripMargin,
    "source_report" ->
      """WITH tok AS (
        |  SELECT source,
        |         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
        |  FROM documents
        |), pt AS (
        |  SELECT source, token, COUNT(*) AS c FROM tok GROUP BY source, token
        |), agg AS (
        |  SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens, COUNT(*) AS n_types,
        |         CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
        |         MAX(c) AS max_token_freq
        |  FROM pt GROUP BY source
        |), d AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY source
        |)
        |SELECT d.source, d.n_docs,
        |       COALESCE(a.n_tokens, 0) AS n_tokens,
        |       COALESCE(a.n_types, 0) AS n_types,
        |       COALESCE(a.n_hapax, 0) AS n_hapax,
        |       a.max_token_freq,
        |       CAST(a.n_types AS DOUBLE) / CAST(a.n_tokens AS DOUBLE) AS type_token_ratio,
        |       CAST(a.n_hapax AS DOUBLE) / CAST(a.n_types AS DOUBLE) AS hapax_frac
        |FROM d LEFT JOIN agg a USING (source)""".stripMargin,
    "corpus_stats" ->
      """WITH tok AS (
        |  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
        |  FROM documents
        |), pt AS (
        |  SELECT token, COUNT(*) AS c FROM tok GROUP BY token
        |)
        |SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
        |       CAST(SUM(c) AS BIGINT) AS n_tokens,
        |       COUNT(*) AS n_types,
        |       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
        |       MAX(c) AS max_token_freq,
        |       CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS type_token_ratio,
        |       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |         / CAST(COUNT(*) AS DOUBLE) AS hapax_frac
        |FROM pt""".stripMargin,
    "doc_repetition" ->
      """WITH tf AS (
        |  SELECT doc_id, token, COUNT(*) AS tf
        |  FROM (SELECT doc_id,
        |               unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
        |        FROM documents WHERE doc_id IS NOT NULL)
        |  GROUP BY doc_id, token
        |), p AS (
        |  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
        |         COUNT(*) AS n_types, MAX(tf) AS max_tf
        |  FROM tf GROUP BY doc_id
        |)
        |SELECT d.doc_id, p.n_tokens, p.n_types, p.max_tf,
        |       CAST(p.max_tf AS DOUBLE) / CAST(p.n_tokens AS DOUBLE) AS top_tok_frac,
        |       CAST(CAST(p.max_tf AS DOUBLE) / CAST(p.n_tokens AS DOUBLE) > 0.075
        |         AS INT) AS dominated
        |FROM documents d LEFT JOIN p USING (doc_id)""".stripMargin,
    "ngram_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, length(text) AS total_chars,
        |         list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents WHERE doc_id IS NOT NULL
        |), nn AS (SELECT unnest([2,3,4]) AS n),
        |x AS (
        |  SELECT t.doc_id, t.total_chars, t.toks, nn.n
        |  FROM t CROSS JOIN nn WHERE len(toks) >= n
        |), g AS (
        |  SELECT doc_id, total_chars, n,
        |         array_to_string(toks[i:i+n-1], ' ') AS gram
        |  FROM (SELECT doc_id, total_chars, toks, n,
        |               unnest(range(1, len(toks) - n + 2)) AS i FROM x)
        |), c AS (
        |  SELECT doc_id, n, gram, COUNT(*) AS cnt, MAX(total_chars) AS total_chars
        |  FROM g GROUP BY 1, 2, 3
        |)
        |SELECT doc_id, n,
        |       CAST(MAX(cnt * length(gram)) AS DOUBLE)
        |         / CAST(MAX(total_chars) AS DOUBLE) AS top_char_frac,
        |       CAST(SUM(CASE WHEN cnt >= 2 THEN cnt * length(gram) ELSE 0 END) AS DOUBLE)
        |         / CAST(MAX(total_chars) AS DOUBLE) AS dup_char_frac
        |FROM c GROUP BY 1, 2""".stripMargin,
    "compression_ratio" ->
      // sketch-gate: exact n_bytes (UTF-8 octet length, null propagating
      // through encode) + the invariant booleans pinned to literal true
      """SELECT doc_id,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |       true AS deflate_bounded,
        |       true AS ratio_consistent
        |FROM documents
        |WHERE doc_id IS NOT NULL""".stripMargin,
    "dsir_weights" ->
      s"""WITH t AS (
         |  SELECT doc_id, (lang = 'en') AS is_tgt,
         |         list_filter(string_split(text, ' '), x -> x <> '') AS toks
         |  FROM documents
         |), bg AS (
         |  SELECT doc_id, is_tgt,
         |         ${dH("toks[i] || ' ' || toks[i + 1]")} % 4096 AS b
         |  FROM (SELECT doc_id, is_tgt, toks,
         |               unnest(range(1, len(toks))) AS i
         |        FROM t WHERE len(toks) >= 2)
         |), m AS (
         |  SELECT doc_id,
         |         (length(bin(SUM(CASE WHEN is_tgt THEN 1 ELSE 0 END) OVER (PARTITION BY b))) - 1)
         |           - (length(bin(COUNT(*) OVER (PARTITION BY b))) - 1) AS wgt
         |  FROM bg
         |), p AS (
         |  SELECT doc_id, COUNT(*) AS n_bigrams, CAST(SUM(wgt) AS BIGINT) AS dsir_score
         |  FROM m GROUP BY doc_id
         |)
         |SELECT d.doc_id, d.lang, p.n_bigrams, p.dsir_score
         |FROM documents d LEFT JOIN p USING (doc_id)""".stripMargin,
    "lm_score" ->
      // hashed bigram-LM: same bucket hashing as the Spark side, counts
      // via window-over-bucket (fine at oracle scale), charges floored
      // at 0 exactly as documented
      s"""WITH t AS (
         |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
         |  FROM documents
         |), bg AS (
         |  SELECT doc_id,
         |         ${dH("toks[i]")} % 4096 AS cb,
         |         ${dH("toks[i] || ' ' || toks[i + 1]")} % 4096 AS b
         |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
         |        FROM t WHERE len(toks) >= 2)
         |), m AS (
         |  SELECT doc_id,
         |         GREATEST(0, (length(bin(COUNT(*) OVER (PARTITION BY cb))) - 1)
         |           - (length(bin(COUNT(*) OVER (PARTITION BY b))) - 1)) AS chg
         |  FROM bg
         |), p AS (
         |  SELECT doc_id, COUNT(*) AS n_bigrams, CAST(SUM(chg) AS BIGINT) AS nll_mag
         |  FROM m GROUP BY doc_id
         |)
         |SELECT d.doc_id, d.lang, p.n_bigrams, p.nll_mag,
         |       CAST(p.nll_mag * 10 > p.n_bigrams * 44 AS INT) AS high_ppl
         |FROM documents d LEFT JOIN p USING (doc_id)""".stripMargin,
    "classifier_score" ->
      s"""WITH t AS (
         |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
         |  FROM documents
         |), s AS (
         |  SELECT doc_id, len(toks) AS n_tokens,
         |         CASE WHEN toks IS NULL THEN NULL
         |              ELSE COALESCE(CAST(list_sum(list_transform(toks,
         |                x -> ((${dH("x")} % 1024) * 2654435761) % 2001 - 1000))
         |                AS BIGINT), 0) END AS score_milli
         |  FROM t
         |)
         |SELECT doc_id, n_tokens, score_milli,
         |       CAST(score_milli >= 0 AS INT) AS keep
         |FROM s""".stripMargin,
    "pii_scrub" ->
      s"""WITH dec AS (
         |  SELECT doc_id,
         |         text || ' contact user' || CAST(doc_id AS VARCHAR)
         |              || '@example.com from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
         |              || '.7 tel +1555' || lpad(CAST(doc_id % 10000 AS VARCHAR), 7, '0')
         |           AS text2
         |  FROM documents
         |)
         |SELECT doc_id,
         |       len(regexp_extract_all(text2, '${TextOps.EmailRe}')) AS n_emails,
         |       len(regexp_extract_all(text2, '${TextOps.Ipv4Re}')) AS n_ipv4,
         |       len(regexp_extract_all(text2, '${TextOps.PhoneRe}')) AS n_phones,
         |       regexp_replace(
         |         regexp_replace(
         |           regexp_replace(text2, '${TextOps.EmailRe}', '<EMAIL>', 'g'),
         |           '${TextOps.Ipv4Re}', '<IP>', 'g'),
         |         '${TextOps.PhoneRe}', '<PHONE>', 'g') AS scrubbed
         |FROM dec""".stripMargin,
    "pii_scrub2" -> {
      val digit = "CAST(substring(c, length(c) - i + 1, 1) AS BIGINT)"
      val luhnOk =
        s"""list_sum(list_transform(range(1, length(c) + 1), i ->
           |  CASE WHEN i % 2 = 0
           |       THEN CASE WHEN 2 * $digit > 9
           |                 THEN 2 * $digit - 9 ELSE 2 * $digit END
           |       ELSE $digit END)) % 10 = 0""".stripMargin
      val plain = Seq("4111111111111111", "4012888888881881",
        "5500005555555559", "2223003122003222")
      val plainL = plain.map(c => s"'$c'").mkString("[", ", ", "]")
      val dashedL = plain.map(_.grouped(4).mkString("-"))
        .map(c => s"'$c'").mkString("[", ", ", "]")
      val brokenL = plain.map(c => c.take(15) + (((c.last - '0') + 5) % 10).toString)
        .map(c => s"'$c'").mkString("[", ", ", "]")
      s"""WITH dec AS (
         |  SELECT doc_id,
         |         text || ' card '
         |              || CASE WHEN doc_id % 2 = 0
         |                      THEN ($dashedL)[CAST(doc_id % 4 AS INT) + 1]
         |                      ELSE ($plainL)[CAST(doc_id % 4 AS INT) + 1] END
         |              || ' junk ' || ($brokenL)[CAST(doc_id % 4 AS INT) + 1]
         |              || ' amex ' || CASE WHEN doc_id % 2 = 0
         |                                  THEN '3782-822463-10005'
         |                                  ELSE '371449635398431' END
         |              || ' pan ' || (['4222222222222', '4111111111111111110',
         |                             '4111111111111111115'])[CAST(doc_id % 3 AS INT) + 1]
         |              || ' long 12345678901234567890 ssn 123-45-'
         |              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         |           AS text2
         |  FROM documents
         |), s1 AS (
         |  SELECT doc_id,
         |         regexp_extract_all(text2, '${TextOps.CardRe}') AS m16,
         |         regexp_replace(text2, '${TextOps.CardRe}', '<CARD>', 'g') AS t1
         |  FROM dec
         |), s2 AS (
         |  SELECT doc_id, m16,
         |         regexp_extract_all(t1, '${TextOps.AmexRe}') AS m15,
         |         regexp_replace(t1, '${TextOps.AmexRe}', '<CARD>', 'g') AS t2
         |  FROM s1
         |), s3 AS (
         |  SELECT doc_id, m16, m15,
         |         regexp_extract_all(t2, '${TextOps.PanRe}') AS mpan,
         |         regexp_replace(t2, '${TextOps.PanRe}', '<CARD>', 'g') AS t3
         |  FROM s2
         |)
         |SELECT doc_id,
         |       CAST(len(m16) + len(m15) + len(mpan) AS INTEGER) AS n_card_candidates,
         |       CAST(len(list_filter(
         |         list_transform(m16 || m15 || mpan,
         |                        s -> regexp_replace(s, '[- ]', '', 'g')),
         |         c -> $luhnOk)) AS INTEGER) AS n_cards_valid,
         |       CAST(len(m15) AS INTEGER) AS n_amex,
         |       CAST(len(mpan) AS INTEGER) AS n_pan,
         |       CAST(len(regexp_extract_all(t3, '${TextOps.SsnRe}')) AS INTEGER) AS n_ssn,
         |       regexp_replace(t3, '${TextOps.SsnRe}', '<SSN>', 'g') AS scrubbed
         |FROM s3""".stripMargin
    },
    "gopher_quality" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
        |v AS (
        |  SELECT doc_id,
        |         CAST(len(toks) AS BIGINT) AS n_words,
        |         CAST(length(text) - (len(toks) - 1) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS mean_word_len,
        |         CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
        |           / CAST(len(toks) AS DOUBLE) AS alpha_frac,
        |         CAST(len(list_intersect(list_distinct(toks),
        |           ['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with'])) AS BIGINT) AS n_req_stopwords
        |  FROM t
        |)
        |SELECT doc_id, n_words, mean_word_len, alpha_frac, n_req_stopwords,
        |       n_words >= 50 AND n_words <= 100000 AS ok_word_count,
        |       mean_word_len >= 3.0 AND mean_word_len <= 10.0 AS ok_word_len,
        |       alpha_frac >= 0.8 AS ok_alpha,
        |       n_req_stopwords >= 2 AS ok_stopwords,
        |       (n_words >= 50 AND n_words <= 100000)
        |         AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
        |         AND alpha_frac >= 0.8 AND n_req_stopwords >= 2 AS gopher_pass
        |FROM v""".stripMargin,
    "shingle_novelty" ->
      s"""$dToksCte, s AS (
         |  SELECT doc_id, $dSh AS sh FROM t
         |), f AS (
         |  SELECT doc_id, unnest(list_transform(sh, s2 -> ${dH("s2")})) AS shingle_hash
         |  FROM s
         |), fo AS (
         |  SELECT shingle_hash, MIN(doc_id) AS first_doc FROM f GROUP BY 1
         |)
         |SELECT f.doc_id,
         |       COUNT(*) AS n_shingles,
         |       CAST(SUM(CASE WHEN fo.first_doc = f.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
         |       CAST(CAST(SUM(CASE WHEN fo.first_doc = f.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
         |         / CAST(COUNT(*) AS DOUBLE) AS novelty
         |FROM f JOIN fo USING (shingle_hash)
         |GROUP BY f.doc_id""".stripMargin,
    "pagerank_top" -> pagerankSql(8),
    "ppr_seeds" -> pprSql(8),
    "graph_negatives" ->
      s"""WITH e0 AS (
         |  SELECT l_suppkey % 1000 AS src, l_partkey % 1000 AS dst
         |  FROM lineitem WHERE l_suppkey % 1000 <> l_partkey % 1000
         |), und AS (
         |  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM e0
         |), nodes AS (
         |  SELECT DISTINCT node FROM (
         |    SELECT a AS node FROM und UNION ALL SELECT b FROM und) t
         |), dn AS (
         |  SELECT node, CAST(ROW_NUMBER() OVER (ORDER BY node) - 1 AS BIGINT) AS idx
         |  FROM nodes
         |), nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM dn),
         |cand AS (
         |  SELECT d.node, CAST(j.j AS BIGINT) AS j,
         |         (d.idx + 1 + (${dH("(CAST(d.node AS VARCHAR) || ':' || CAST(j.j AS VARCHAR))")}
         |                       % (nn.n - 1))) % nn.n AS pidx
         |  FROM dn d
         |  CROSS JOIN (SELECT * FROM (VALUES (1), (2), (3), (4), (5)) AS x(j)) j
         |  CROSS JOIN nn
         |), cp AS (
         |  SELECT c.node, c.j, p.node AS partner
         |  FROM cand c JOIN dn p ON p.idx = c.pidx
         |), ne AS (
         |  SELECT cp.node, cp.partner, MIN(cp.j) AS j
         |  FROM cp
         |  WHERE NOT EXISTS (SELECT 1 FROM und
         |    WHERE und.a = LEAST(cp.node, cp.partner)
         |      AND und.b = GREATEST(cp.node, cp.partner))
         |  GROUP BY 1, 2
         |), r AS (
         |  SELECT node, partner,
         |         ROW_NUMBER() OVER (PARTITION BY node ORDER BY j) AS rk
         |  FROM ne
         |)
         |SELECT node, CAST(rk AS BIGINT) AS neg_rank, partner
         |FROM r WHERE rk <= 3""".stripMargin,
    "label_propagation" -> {
      val head =
        """WITH e0 AS (
          |  SELECT l_suppkey % 100 AS src, l_partkey % 100 AS dst
          |  FROM lineitem WHERE l_suppkey % 100 <> l_partkey % 100
          |), und AS (
          |  SELECT DISTINCT src, dst FROM (
          |    SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0
          |  ) WHERE src <> dst
          |), l0 AS (
          |  SELECT DISTINCT src AS node, src AS label FROM und
          |)""".stripMargin
      val steps = (1 to 3).map { k =>
        s""", l$k AS (
           |  SELECT src AS node, label FROM (
           |    SELECT u.src, l.label,
           |           row_number() OVER (PARTITION BY u.src
           |                              ORDER BY COUNT(*) DESC, l.label) AS rk
           |    FROM und u JOIN l${k - 1} l ON l.node = u.dst
           |    GROUP BY u.src, l.label
           |  ) t WHERE rk = 1
           |)""".stripMargin
      }.mkString
      head + steps + "\nSELECT node, label FROM l3 ORDER BY node"
    },
    "triangle_count" ->
      """WITH e0 AS (
        |  SELECT l_suppkey % 100 AS src, l_partkey % 100 AS dst
        |  FROM lineitem WHERE l_suppkey % 100 <> l_partkey % 100
        |), und AS (
        |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM e0
        |), tri AS (
        |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM und e1
        |  JOIN und e2 ON e2.a = e1.b
        |  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
        |), pern AS (
        |  SELECT node, COUNT(*) AS n_triangles FROM (
        |    SELECT x AS node FROM tri
        |    UNION ALL SELECT y FROM tri
        |    UNION ALL SELECT z FROM tri
        |  ) GROUP BY node
        |), deg AS (
        |  SELECT node, COUNT(*) AS degree FROM (
        |    SELECT a AS node FROM und UNION ALL SELECT b FROM und
        |  ) GROUP BY node
        |)
        |SELECT d.node, CAST(d.degree AS BIGINT) AS degree,
        |       CAST(COALESCE(p.n_triangles, 0) AS BIGINT) AS n_triangles,
        |       CAST(CASE WHEN d.degree >= 2
        |            THEN floor(1000000.0 * 2 * COALESCE(p.n_triangles, 0)
        |                       / (d.degree * (d.degree - 1)))
        |            ELSE 0 END AS BIGINT) AS clustering_ppm
        |FROM deg d LEFT JOIN pern p ON p.node = d.node
        |ORDER BY d.node""".stripMargin,
    "embed_truncate" ->
      s"""$dUnitCte, tu AS (
         |  SELECT vec_id,
         |         CASE WHEN sqrt(list_sum(list_transform(embedding[1:32],
         |                y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))) > 0
         |           THEN list_transform(embedding[1:32], x -> CAST(x AS DOUBLE)
         |             / sqrt(list_sum(list_transform(embedding[1:32], y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))))
         |         END AS tunit
         |  FROM embeddings
         |), qf AS (SELECT unit AS q FROM u WHERE vec_id = 0),
         |qt AS (SELECT tunit AS q FROM tu WHERE vec_id = 0),
         |fsim AS (
         |  SELECT vec_id, round(${dUnitDot("unit", "q")}, 6) AS full_sim
         |  FROM u, qf WHERE vec_id <> 0
         |), tsim AS (
         |  SELECT vec_id, round(${dUnitDot("tunit", "q")}, 6) AS trunc_sim
         |  FROM tu, qt WHERE vec_id <> 0
         |), ftop AS (
         |  SELECT vec_id, true AS in_full FROM fsim
         |  ORDER BY full_sim DESC, vec_id LIMIT 10
         |), ttop AS (
         |  SELECT vec_id, true AS in_trunc FROM tsim
         |  ORDER BY trunc_sim DESC, vec_id LIMIT 10
         |)
         |SELECT v.vec_id, f2.full_sim, t2.trunc_sim,
         |       COALESCE(f.in_full, false) AS in_full,
         |       COALESCE(t.in_trunc, false) AS in_trunc
         |FROM (SELECT COALESCE(f0.vec_id, t0.vec_id) AS vec_id
         |      FROM ftop f0 FULL OUTER JOIN ttop t0 ON f0.vec_id = t0.vec_id) v
         |LEFT JOIN ftop f ON f.vec_id = v.vec_id
         |LEFT JOIN ttop t ON t.vec_id = v.vec_id
         |JOIN fsim f2 ON f2.vec_id = v.vec_id
         |JOIN tsim t2 ON t2.vec_id = v.vec_id
         |ORDER BY v.vec_id""".stripMargin,
    "cosine_topk" ->
      s"""$dUnitCte, q AS (SELECT unit AS q_unit FROM u WHERE vec_id = 0)
         |SELECT vec_id,
         |       round(${dUnitDot("unit", "q_unit")}, 6) AS cosine_sim
         |FROM u, q
         |WHERE vec_id <> 0
         |ORDER BY cosine_sim DESC, vec_id
         |LIMIT 10""".stripMargin,
    "embed_outliers" ->
      s"""WITH u AS (
         |  SELECT vec_id, label,
         |         CASE WHEN sqrt(list_sum(list_transform(embedding,
         |                y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))) > 0
         |           THEN list_transform(embedding, x -> CAST(x AS DOUBLE)
         |             / sqrt(list_sum(list_transform(embedding, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))))
         |         END AS unit
         |  FROM embeddings
         |), r AS (
         |  SELECT label AS rep_label, min(vec_id) AS rep_id FROM embeddings GROUP BY 1
         |), rep AS (
         |  SELECT r.rep_label, u2.unit AS rep_unit FROM r JOIN u u2 ON u2.vec_id = r.rep_id
         |)
         |SELECT u.vec_id, u.label,
         |       round(${dUnitDot("unit", "rep_unit")}, 6) AS rep_sim,
         |       CAST(CASE WHEN round(${dUnitDot("unit", "rep_unit")}, 6) < -0.2
         |            THEN 1 ELSE 0 END AS INT) AS outlier
         |FROM u JOIN rep ON u.label = rep.rep_label
         |ORDER BY u.vec_id""".stripMargin,
    "embed_neardup" ->
      s"""$dUnitCte
         |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |       round(${dUnitDot("a.unit", "b.unit")}, 6) AS cosine_sim
         |FROM u a JOIN u b ON a.vec_id < b.vec_id
         |WHERE round(${dUnitDot("a.unit", "b.unit")}, 6) >= 0.4""".stripMargin,
    "lsh_buckets" ->
      s"""SELECT vec_id, label, $dLshBucket AS bucket FROM embeddings""".stripMargin,
    "ivf_cells" ->
      s"""$dUnitCte, c AS (
         |  SELECT vec_id AS cent_id, unit AS cent_unit FROM u
         |  WHERE unit IS NOT NULL ORDER BY vec_id LIMIT 16
         |), s AS (
         |  SELECT u.vec_id, c.cent_id,
         |         round(${dUnitDot("u.unit", "c.cent_unit")}, 6) AS cent_sim
         |  FROM u CROSS JOIN c WHERE u.unit IS NOT NULL
         |), r AS (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id
         |                               ORDER BY cent_sim DESC, cent_id) AS rn
         |  FROM s
         |)
         |SELECT u.vec_id, a.cent_id AS cell, a.cent_sim
         |FROM u LEFT JOIN (SELECT vec_id, cent_id, cent_sim FROM r WHERE rn = 1) a
         |       USING (vec_id)""".stripMargin,
    "embedding_drift" ->
      s"""$dUnitCte,
         |q AS (SELECT vec_id, CASE WHEN unit IS NOT NULL THEN list_transform(unit,
         |        x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) END AS qvec FROM u),
         |qr AS (SELECT vec_id, qvec FROM q WHERE qvec IS NOT NULL AND vec_id % 2 = 0),
         |qc AS (SELECT vec_id, qvec FROM q WHERE qvec IS NOT NULL AND vec_id % 2 = 1),
         |c0 AS (SELECT vec_id AS cidx, qvec AS qcent FROM qr ORDER BY vec_id LIMIT 16),
         |ar AS (${dKmAssign("qr", "c0")}),
         |ac AS (${dKmAssign("qc", "c0")}),
         |nr AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_ref FROM ar GROUP BY 1),
         |nc AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_cur FROM ac GROUP BY 1),
         |t AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM ar) AS t_ref,
         |             (SELECT CAST(COUNT(*) AS BIGINT) FROM ac) AS t_cur),
         |j AS (SELECT COALESCE(nr.cell, nc.cell) AS cell,
         |             COALESCE(n_ref, 0) AS n_ref, COALESCE(n_cur, 0) AS n_cur
         |      FROM nr FULL OUTER JOIN nc ON nr.cell = nc.cell),
         |g AS (SELECT cell, n_ref, n_cur,
         |             CASE WHEN n_ref > 0 AND n_cur > 0 THEN
         |               CAST(((length(bin(n_cur)) - 1) - (length(bin(n_ref)) - 1))
         |                  - ((length(bin(t_cur)) - 1) - (length(bin(t_ref)) - 1)) AS BIGINT)
         |             END AS drift_mag
         |      FROM j CROSS JOIN t)
         |SELECT cell, n_ref, n_cur, drift_mag,
         |       CAST(CASE WHEN n_ref = 0 OR n_cur = 0 THEN 1
         |                 WHEN abs(drift_mag) >= 2 THEN 1 ELSE 0 END AS INT) AS drifted
         |FROM g""".stripMargin,
    "kmeans_assign" ->
      s"""$dUnitCte,
         |q AS (SELECT vec_id, CASE WHEN unit IS NOT NULL THEN list_transform(unit,
         |        x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) END AS qvec FROM u),
         |c0 AS (SELECT vec_id AS cidx, qvec AS qcent FROM q WHERE qvec IS NOT NULL
         |       ORDER BY vec_id LIMIT 8),
         |a0 AS (${dKmAssign("q", "c0")}),
         |c1 AS (${dKmUpdate("a0")}),
         |a1 AS (${dKmAssign("q", "c1")}),
         |c2 AS (${dKmUpdate("a1")}),
         |a2 AS (${dKmAssign("q", "c2")})
         |SELECT e.vec_id, a.cell, CAST(a.dot AS BIGINT) AS qdot
         |FROM embeddings e LEFT JOIN a2 a USING (vec_id)""".stripMargin,
    // centroid-based simplified silhouette over the same trained cells:
    // integer-exact squared distances, IEEE sqrt (correctly rounded in
    // both engines), fixed-point micro-unit accumulation
    "silhouette" ->
      s"""$dUnitCte,
         |q AS (SELECT vec_id, CASE WHEN unit IS NOT NULL THEN list_transform(unit,
         |        x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) END AS qvec FROM u),
         |c0 AS (SELECT vec_id AS cidx, qvec AS qcent FROM q WHERE qvec IS NOT NULL
         |       ORDER BY vec_id LIMIT 8),
         |a0 AS (${dKmAssign("q", "c0")}),
         |c1 AS (${dKmUpdate("a0")}),
         |a1 AS (${dKmAssign("q", "c1")}),
         |c2 AS (${dKmUpdate("a1")}),
         |a2 AS (${dKmAssign("q", "c2")}),
         |dd AS (
         |  SELECT a.vec_id, a.cell, kc.cidx AS cell2,
         |         CAST(list_sum(list_transform(range(1, len(a.qvec) + 1),
         |           i -> (a.qvec[i] - kc.qcent[i]) * (a.qvec[i] - kc.qcent[i]))) AS BIGINT) AS d2
         |  FROM a2 a, c2 kc
         |), ab AS (
         |  SELECT vec_id, cell,
         |         MIN(CASE WHEN cell2 = cell THEN d2 END) AS a2d,
         |         MIN(CASE WHEN cell2 <> cell THEN d2 END) AS b2d
         |  FROM dd GROUP BY vec_id, cell
         |), sv AS (
         |  SELECT cell,
         |         CASE WHEN greatest(a2d, b2d) = 0 THEN 0.0
         |              ELSE (sqrt(CAST(b2d AS DOUBLE)) - sqrt(CAST(a2d AS DOUBLE)))
         |                   / greatest(sqrt(CAST(a2d AS DOUBLE)), sqrt(CAST(b2d AS DOUBLE))) END AS s
         |  FROM ab WHERE b2d IS NOT NULL
         |)
         |SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_points,
         |       CAST(SUM(CAST(floor(s * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_s_mil,
         |       CAST(SUM(CAST(floor(s * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
         |         / (COUNT(*) * 1000000.0) AS mean_silhouette
         |FROM sv GROUP BY cell ORDER BY cell""".stripMargin,
    // same trained assignment, judged against the ground-truth labels
    "cluster_purity" ->
      s"""$dUnitCte,
         |q AS (SELECT vec_id, CASE WHEN unit IS NOT NULL THEN list_transform(unit,
         |        x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) END AS qvec FROM u),
         |c0 AS (SELECT vec_id AS cidx, qvec AS qcent FROM q WHERE qvec IS NOT NULL
         |       ORDER BY vec_id LIMIT 8),
         |a0 AS (${dKmAssign("q", "c0")}),
         |c1 AS (${dKmUpdate("a0")}),
         |a1 AS (${dKmAssign("q", "c1")}),
         |c2 AS (${dKmUpdate("a1")}),
         |a2 AS (${dKmAssign("q", "c2")}),
         |pur AS (
         |  SELECT a.cell AS cluster, CAST(e.label AS VARCHAR) AS label,
         |         CAST(COUNT(*) AS BIGINT) AS n_lab
         |  FROM a2 a JOIN embeddings e USING (vec_id)
         |  WHERE a.cell IS NOT NULL GROUP BY 1, 2
         |), r AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY cluster
         |           ORDER BY n_lab DESC, label) AS rn,
         |         CAST(SUM(n_lab) OVER (PARTITION BY cluster) AS BIGINT) AS n
         |  FROM pur
         |)
         |SELECT cluster, n, label AS majority_label, n_lab AS n_majority,
         |       CAST(n_lab AS DOUBLE) / CAST(n AS DOUBLE) AS purity
         |FROM r WHERE rn = 1""".stripMargin,
    "pq_codes" ->
      // trained multi-subspace PQ, unrolled exactly like kmeans_assign;
      // every (vec_id, subspace) surfaces — NULL code for zero-norm rows
      s"""$dPqCtes
         |SELECT sub.vec_id, CAST(sub.s AS BIGINT) AS s, a.code, a.obj AS qobj
         |FROM sub LEFT JOIN a2 a ON sub.vec_id = a.vec_id AND sub.s = a.s""".stripMargin,
    "pq_topk" ->
      // ADC: the query's exact dot with every final codeword as an
      // (s, code) lookup table, summed over each vector's codes
      s"""$dPqCtes,
         |qs AS (SELECT s, qsub FROM sub WHERE vec_id = 0 AND qsub IS NOT NULL),
         |lut AS (SELECT c2.s, c2.cidx AS code,
         |          CAST(list_sum(list_transform(range(1, len(qs.qsub) + 1),
         |            i -> qs.qsub[i] * c2.qcent[i])) AS BIGINT) AS qdot
         |        FROM c2 JOIN qs ON c2.s = qs.s),
         |adc AS (SELECT a.vec_id, CAST(SUM(l.qdot) AS BIGINT) AS adc_qdot, COUNT(*) AS n_sub
         |        FROM a2 a JOIN lut l ON a.s = l.s AND a.code = l.code
         |        WHERE a.vec_id <> 0 GROUP BY a.vec_id)
         |SELECT vec_id, adc_qdot FROM adc WHERE n_sub = 8
         |ORDER BY adc_qdot DESC, vec_id LIMIT 5""".stripMargin,
    "pq_rerank" ->
      // ADC shortlist of 50 (the pq_topk pipeline) → exact integer dot
      // re-rank of the shortlist's real vectors → top 5
      s"""$dPqCtes,
         |qs AS (SELECT s, qsub FROM sub WHERE vec_id = 0 AND qsub IS NOT NULL),
         |lut AS (SELECT c2.s, c2.cidx AS code,
         |          CAST(list_sum(list_transform(range(1, len(qs.qsub) + 1),
         |            i -> qs.qsub[i] * c2.qcent[i])) AS BIGINT) AS qdot
         |        FROM c2 JOIN qs ON c2.s = qs.s),
         |adc AS (SELECT a.vec_id, CAST(SUM(l.qdot) AS BIGINT) AS adc_qdot, COUNT(*) AS n_sub
         |        FROM a2 a JOIN lut l ON a.s = l.s AND a.code = l.code
         |        WHERE a.vec_id <> 0 GROUP BY a.vec_id),
         |cand AS (SELECT vec_id FROM adc WHERE n_sub = 8
         |         ORDER BY adc_qdot DESC, vec_id LIMIT 50),
         |qq AS (SELECT qvec FROM q WHERE vec_id = 0 AND qvec IS NOT NULL)
         |SELECT c.vec_id, CAST(list_sum(list_transform(range(1, len(q2.qvec) + 1),
         |         i -> q2.qvec[i] * qq.qvec[i])) AS BIGINT) AS exact_qdot
         |FROM cand c JOIN q q2 ON q2.vec_id = c.vec_id, qq
         |ORDER BY exact_qdot DESC, c.vec_id LIMIT 5""".stripMargin,
    "pq_knn_join" ->
      // bulk PQ kNN graph: first-16 integer coarse cells -> per-cell
      // pairs on m CODES on BOTH sides (symmetric SDC against the
      // trained codebook's codeword-x-codeword dots) -> shortlist 10 ->
      // exact integer re-rank -> top 3
      s"""$dPqCtes,
         |qn AS (SELECT vec_id, qvec FROM q WHERE qvec IS NOT NULL),
         |cc AS (SELECT vec_id AS ccidx, qvec AS ccent FROM qn ORDER BY vec_id LIMIT 16),
         |asgr AS (
         |  SELECT qn.vec_id, qn.qvec, cc.ccidx,
         |         row_number() OVER (PARTITION BY qn.vec_id ORDER BY
         |           list_sum(list_transform(range(1, 65), i -> qn.qvec[i] * cc.ccent[i])) DESC,
         |           cc.ccidx) AS rn
         |  FROM qn CROSS JOIN cc),
         |asg AS (SELECT vec_id, qvec, ccidx AS cell FROM asgr WHERE rn = 1),
         |adcp AS (
         |  SELECT pa.vec_id, pb.vec_id AS nbr_id,
         |         CAST(SUM(list_sum(list_transform(range(1, 9),
         |           j -> ca.qcent[j] * cb.qcent[j]))) AS BIGINT) AS adc_qdot,
         |         COUNT(*) AS n_sub
         |  FROM asg pa JOIN asg pb ON pa.cell = pb.cell AND pa.vec_id <> pb.vec_id
         |  JOIN a2 aa ON aa.vec_id = pa.vec_id
         |  JOIN a2 ab ON ab.vec_id = pb.vec_id AND ab.s = aa.s
         |  JOIN c2 ca ON ca.s = aa.s AND ca.cidx = aa.code
         |  JOIN c2 cb ON cb.s = ab.s AND cb.cidx = ab.code
         |  GROUP BY pa.vec_id, pb.vec_id),
         |sl AS (
         |  SELECT vec_id, nbr_id,
         |         row_number() OVER (PARTITION BY vec_id
         |                            ORDER BY adc_qdot DESC, nbr_id) AS rs
         |  FROM adcp WHERE n_sub = 8),
         |ex AS (
         |  SELECT sl.vec_id, sl.nbr_id,
         |         CAST(list_sum(list_transform(range(1, 65),
         |           i -> qa.qvec[i] * qb.qvec[i])) AS BIGINT) AS exact_qdot
         |  FROM sl JOIN qn qa ON qa.vec_id = sl.vec_id
         |          JOIN qn qb ON qb.vec_id = sl.nbr_id
         |  WHERE sl.rs <= 10)
         |SELECT vec_id, nbr_id, exact_qdot, rank FROM (
         |  SELECT vec_id, nbr_id, exact_qdot,
         |         CAST(row_number() OVER (PARTITION BY vec_id
         |                                 ORDER BY exact_qdot DESC, nbr_id) AS BIGINT) AS rank
         |  FROM ex) t WHERE rank <= 3""".stripMargin,
    "pq_adc_knn" ->
      // asymmetric serving ADC: the query keeps its full subvectors,
      // the corpus side its codes; self-pairs kept (serving contract)
      s"""$dPqCtes,
         |qn AS (SELECT vec_id, qvec FROM q WHERE qvec IS NOT NULL),
         |cc AS (SELECT vec_id AS ccidx, qvec AS ccent FROM qn ORDER BY vec_id LIMIT 16),
         |asgr AS (
         |  SELECT qn.vec_id, qn.qvec, cc.ccidx,
         |         row_number() OVER (PARTITION BY qn.vec_id ORDER BY
         |           list_sum(list_transform(range(1, 65), i -> qn.qvec[i] * cc.ccent[i])) DESC,
         |           cc.ccidx) AS rn
         |  FROM qn CROSS JOIN cc),
         |asg AS (SELECT vec_id, qvec, ccidx AS cell FROM asgr WHERE rn = 1),
         |adcp AS (
         |  SELECT pa.vec_id AS query_id, pb.vec_id AS nbr_id,
         |         CAST(SUM(list_sum(list_transform(range(1, 9),
         |           j -> pa.qvec[a.s * 8 + j] * c2.qcent[j]))) AS BIGINT) AS adc_qdot,
         |         COUNT(*) AS n_sub
         |  FROM asg pa JOIN asg pb ON pa.cell = pb.cell
         |  JOIN a2 a ON a.vec_id = pb.vec_id
         |  JOIN c2 ON c2.s = a.s AND c2.cidx = a.code
         |  GROUP BY pa.vec_id, pb.vec_id)
         |SELECT query_id, nbr_id, adc_qdot, rank FROM (
         |  SELECT query_id, nbr_id, adc_qdot,
         |         CAST(row_number() OVER (PARTITION BY query_id
         |                                 ORDER BY adc_qdot DESC, nbr_id) AS BIGINT) AS rank
         |  FROM adcp WHERE n_sub = 8) t WHERE rank <= 3""".stripMargin,
    "pq_recall" ->
      // ADC top-k (the pq_adc_knn body, queries restricted to the
      // fixed-count hash-ordered sample: 100 smallest md5(vec_id))
      // intersected with the exact integer top-k of the same sample;
      // per-query integer counts only
      s"""$dPqCtes,
         |qn AS (SELECT vec_id, qvec FROM q WHERE qvec IS NOT NULL),
         |qids AS (SELECT vec_id FROM qn
         |         ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 100),
         |cc AS (SELECT vec_id AS ccidx, qvec AS ccent FROM qn ORDER BY vec_id LIMIT 16),
         |asgr AS (
         |  SELECT qn.vec_id, qn.qvec, cc.ccidx,
         |         row_number() OVER (PARTITION BY qn.vec_id ORDER BY
         |           list_sum(list_transform(range(1, 65), i -> qn.qvec[i] * cc.ccent[i])) DESC,
         |           cc.ccidx) AS rn
         |  FROM qn CROSS JOIN cc),
         |asg AS (SELECT vec_id, qvec, ccidx AS cell FROM asgr WHERE rn = 1),
         |qsub AS (SELECT a.vec_id, a.qvec, a.cell FROM asg a
         |         JOIN qids ON qids.vec_id = a.vec_id),
         |adcp AS (
         |  SELECT pa.vec_id AS query_id, pb.vec_id AS nbr_id,
         |         CAST(SUM(list_sum(list_transform(range(1, 9),
         |           j -> pa.qvec[a.s * 8 + j] * c2.qcent[j]))) AS BIGINT) AS adc_qdot,
         |         COUNT(*) AS n_sub
         |  FROM qsub pa JOIN asg pb ON pa.cell = pb.cell
         |  JOIN a2 a ON a.vec_id = pb.vec_id
         |  JOIN c2 ON c2.s = a.s AND c2.cidx = a.code
         |  GROUP BY pa.vec_id, pb.vec_id),
         |adck AS (SELECT query_id, nbr_id FROM (
         |           SELECT query_id, nbr_id,
         |                  row_number() OVER (PARTITION BY query_id
         |                                     ORDER BY adc_qdot DESC, nbr_id) AS rank
         |           FROM adcp WHERE n_sub = 8) t WHERE rank <= 3),
         |exk AS (SELECT query_id, nbr_id FROM (
         |          SELECT qs.vec_id AS query_id, qn.vec_id AS nbr_id,
         |                 row_number() OVER (PARTITION BY qs.vec_id ORDER BY
         |                   list_sum(list_transform(range(1, 65), i -> qn.qvec[i] * qs.qvec[i])) DESC,
         |                   qn.vec_id) AS rank
         |          FROM (SELECT qn.vec_id, qn.qvec FROM qn
         |                JOIN qids ON qids.vec_id = qn.vec_id) qs
         |          CROSS JOIN qn) u WHERE rank <= 3),
         |exn AS (SELECT query_id, COUNT(*) AS n_exact FROM exk GROUP BY query_id),
         |adcn AS (SELECT query_id, COUNT(*) AS n_adc FROM adck GROUP BY query_id),
         |hitn AS (SELECT e.query_id, COUNT(*) AS hits
         |         FROM exk e JOIN adck x ON x.query_id = e.query_id AND x.nbr_id = e.nbr_id
         |         GROUP BY e.query_id)
         |SELECT exn.query_id, exn.n_exact,
         |       COALESCE(adcn.n_adc, CAST(0 AS BIGINT)) AS n_adc,
         |       COALESCE(hitn.hits, CAST(0 AS BIGINT)) AS hits
         |FROM exn
         |LEFT JOIN adcn ON adcn.query_id = exn.query_id
         |LEFT JOIN hitn ON hitn.query_id = exn.query_id""".stripMargin,
    "ivfpq_topk" ->
      // coarse Lloyd's (the kmeans_assign unroll) → integer residuals →
      // residual-PQ Lloyd's (the pq unroll) → per-probed-cell LUT → ADC
      s"""$dUnitCte,
         |q AS (SELECT vec_id, CASE WHEN unit IS NOT NULL THEN list_transform(unit,
         |        x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) END AS qvec FROM u),
         |c0 AS (SELECT vec_id AS cidx, qvec AS qcent FROM q WHERE qvec IS NOT NULL
         |       ORDER BY vec_id LIMIT 8),
         |a0 AS (${dKmAssign("q", "c0")}),
         |c1 AS (${dKmUpdate("a0")}),
         |a1 AS (${dKmAssign("q", "c1")}),
         |c2 AS (${dKmUpdate("a1")}),
         |a2 AS (${dKmAssign("q", "c2")}),
         |resid AS (SELECT a.vec_id, a.cell,
         |    list_transform(range(1, len(a.qvec) + 1), i -> a.qvec[i] - kc.qcent[i]) AS qvec
         |  FROM a2 a JOIN c2 kc ON kc.cidx = a.cell),
         |rsub AS (SELECT vec_id, cell, s, list_slice(qvec, s * 8 + 1, s * 8 + 8) AS qsub
         |  FROM (SELECT vec_id, cell, qvec, unnest(range(0, 8)) AS s FROM resid)),
         |rc0 AS (SELECT s, vec_id AS cidx, qsub AS qcent FROM rsub
         |  WHERE vec_id IN (SELECT vec_id FROM resid ORDER BY vec_id LIMIT 8)),
         |ra0 AS (${dPqAssign("rsub", "rc0")}),
         |rc1 AS (${dPqUpdate("ra0")}),
         |ra1 AS (${dPqAssign("rsub", "rc1")}),
         |rc2 AS (${dPqUpdate("ra1")}),
         |ra2 AS (${dPqAssign("rsub", "rc2")}),
         |qv AS (SELECT qvec FROM q WHERE vec_id = 0 AND qvec IS NOT NULL),
         |probed AS (SELECT kc.cidx AS pcell, kc.qcent,
         |    CAST(list_sum(list_transform(range(1, len(qv.qvec) + 1),
         |      i -> qv.qvec[i] * kc.qcent[i])) AS BIGINT) AS qcdot
         |  FROM c2 kc, qv ORDER BY qcdot DESC, pcell LIMIT 2),
         |lutq AS (SELECT pcell, qcdot, s AS ls, list_slice(qres, s * 8 + 1, s * 8 + 8) AS q_qsub
         |  FROM (SELECT pcell, qcdot,
         |          list_transform(range(1, len(qv.qvec) + 1), i -> qv.qvec[i] - probed.qcent[i]) AS qres,
         |          unnest(range(0, 8)) AS s
         |        FROM probed, qv)),
         |lut AS (SELECT l.pcell, l.qcdot, l.ls, kc.cidx AS lcode,
         |    CAST(list_sum(list_transform(range(1, len(l.q_qsub) + 1),
         |      i -> l.q_qsub[i] * kc.qcent[i])) AS BIGINT) AS rdot
         |  FROM lutq l JOIN rc2 kc ON kc.s = l.ls),
         |cand AS (SELECT a.vec_id, SUM(l.rdot) AS r, MAX(l.qcdot) AS cterm, COUNT(*) AS n_sub
         |  FROM ra2 a
         |  JOIN resid rs ON rs.vec_id = a.vec_id
         |  JOIN lut l ON rs.cell = l.pcell AND a.s = l.ls AND a.code = l.lcode
         |  WHERE a.vec_id <> 0
         |  GROUP BY a.vec_id)
         |SELECT vec_id, CAST(cterm + r AS BIGINT) AS adc_qdot FROM cand WHERE n_sub = 8
         |ORDER BY adc_qdot DESC, vec_id LIMIT 5""".stripMargin,
    "ivf_topk" ->
      s"""$dUnitCte, c AS (
         |  SELECT vec_id AS cent_id, unit AS cent_unit FROM u
         |  WHERE unit IS NOT NULL ORDER BY vec_id LIMIT 16
         |), s AS (
         |  SELECT u.vec_id, u.unit, c.cent_id,
         |         round(${dUnitDot("u.unit", "c.cent_unit")}, 6) AS cent_sim
         |  FROM u CROSS JOIN c WHERE u.unit IS NOT NULL
         |), r AS (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id
         |                               ORDER BY cent_sim DESC, cent_id) AS rn
         |  FROM s
         |), assign AS (
         |  SELECT vec_id, unit, cent_id AS cell FROM r WHERE rn = 1
         |), q AS (
         |  SELECT cell AS q_cell, unit AS q_unit FROM assign WHERE vec_id = 0
         |)
         |SELECT a.vec_id, a.cell,
         |       round(${dUnitDot("a.unit", "q.q_unit")}, 6) AS cosine_sim
         |FROM assign a CROSS JOIN q
         |WHERE a.cell = q.q_cell AND a.vec_id <> 0
         |ORDER BY cosine_sim DESC, a.vec_id
         |LIMIT 5""".stripMargin,
    "media_meta" ->
      """SELECT doc_id AS media_id, doc_id,
        |       CASE WHEN doc_id % 3 = 0 THEN 'image'
        |            WHEN doc_id % 3 = 1 THEN 'audio'
        |            ELSE 'video' END AS modality,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |       CAST(64 + doc_id % 192 AS INTEGER) AS width,
        |       CAST(64 + doc_id % 128 AS INTEGER) AS height,
        |       CAST(CASE WHEN doc_id % 3 = 1 THEN 16000 ELSE 0 END AS INTEGER) AS sample_rate,
        |       CAST(CASE WHEN doc_id % 3 = 2 THEN 10 + doc_id % 90 ELSE 0 END AS INTEGER) AS n_frames
        |FROM documents""".stripMargin,
    "frame_sample" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, doc_id,
        |         CASE WHEN doc_id % 3 = 0 THEN 'image'
        |              WHEN doc_id % 3 = 1 THEN 'audio'
        |              ELSE 'video' END AS modality,
        |         CAST(CASE WHEN doc_id % 3 = 2 THEN 10 + doc_id % 90 ELSE 0 END AS INTEGER) AS n_frames
        |  FROM documents
        |)
        |SELECT media_id, doc_id, n_frames, CAST(unnest(range(0, n_frames, 7)) AS BIGINT) AS frame_idx
        |FROM m
        |WHERE modality = 'video' AND n_frames > 0""".stripMargin,
    "image_phash" ->
      (dPhashCtes + """
        |SELECT media_id, true AS decode_ok,
        |       CAST(w AS INT) AS img_width, CAST(h AS INT) AS img_height,
        |       band0, band1, band2, band3
        |FROM ph""".stripMargin),
    "phash_dedup" ->
      // cluster form: group on the full 64-bit perceptual hash; every
      // BMP/PNG twin pair lands in one cluster (n_copies ≥ 2)
      (dPhashCtes + """
        |SELECT band0, band1, band2, band3,
        |       MIN(media_id) AS keeper_media_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_copies
        |FROM ph
        |GROUP BY 1, 2, 3, 4
        |ORDER BY 1, 2, 3, 4""".stripMargin),
    "media_dedup" ->
      """SELECT md5(text) AS content_hash,
        |       MIN(doc_id) AS keeper_media_id,
        |       COUNT(*) AS n_copies
        |FROM documents
        |GROUP BY 1""".stripMargin,
    "media_features" ->
      // one closed-form leg per modality (pixelChannels / sampleSpec /
      // frameGray), recomputed independently of every Scala codec
      """WITH base AS (
        |  SELECT doc_id FROM documents WHERE doc_id IS NOT NULL AND doc_id >= 0
        |), img AS (
        |  SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 11 AS h
        |  FROM base WHERE doc_id % 3 = 0
        |), iys AS (
        |  SELECT doc_id, w, h, unnest(range(0, h)) AS y FROM img
        |), ipx AS (
        |  SELECT doc_id, w, h, y, unnest(range(0, w)) AS x FROM iys
        |), isum AS (
        |  SELECT doc_id, CAST(MIN(w) * MIN(h) AS BIGINT) AS n_units,
        |    CAST(SUM((doc_id + 3*x + 7*y) % 256
        |           + (2*doc_id + 5*x + 11*y) % 256
        |           + (3*doc_id + 13*x + y) % 256) AS BIGINT) AS unit_sum
        |  FROM ipx GROUP BY doc_id
        |), aud AS (
        |  SELECT doc_id, 50 + doc_id % 100 AS n FROM base WHERE doc_id % 3 = 1
        |), asm AS (
        |  SELECT doc_id, n, unnest(range(0, n)) AS i FROM aud
        |), asum AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_units,
        |    CAST(SUM((doc_id * 31 + i * 17) % 65536 - 32768) AS BIGINT) AS unit_sum
        |  FROM asm GROUP BY doc_id
        |), vid AS (
        |  SELECT doc_id, 6 + doc_id % 9 AS w, 5 + doc_id % 7 AS h,
        |         4 + doc_id % 9 AS nf
        |  FROM base WHERE doc_id % 3 = 2
        |), vfr AS (
        |  SELECT doc_id, w, h, nf, unnest(range(0, nf)) AS f FROM vid
        |), vys AS (
        |  SELECT doc_id, w, h, nf, f, unnest(range(0, h)) AS y FROM vfr
        |), vpx AS (
        |  SELECT doc_id, w, h, nf, f, y, unnest(range(0, w)) AS x FROM vys
        |), vsum AS (
        |  SELECT doc_id, CAST(MIN(nf) AS BIGINT) AS n_units,
        |    CAST(SUM((doc_id + 5*f + 3*x + 7*y) % 256) AS BIGINT) AS unit_sum
        |  FROM vpx GROUP BY doc_id
        |)
        |SELECT i.doc_id AS media_id, 'image' AS modality, true AS decode_ok,
        |       CASE WHEN i.doc_id % 2 = 0 THEN 'bmp' ELSE 'png' END
        |         AS detected_format,
        |       s.n_units, s.unit_sum
        |FROM img i JOIN isum s ON i.doc_id = s.doc_id
        |UNION ALL
        |SELECT a.doc_id, 'audio', true,
        |       CASE WHEN a.doc_id % 2 = 0 THEN 'wav' ELSE 'aiff' END,
        |       s.n_units, s.unit_sum
        |FROM aud a JOIN asum s ON a.doc_id = s.doc_id
        |UNION ALL
        |SELECT v.doc_id, 'video', true, 'gif', s.n_units, s.unit_sum
        |FROM vid v JOIN vsum s ON v.doc_id = s.doc_id""".stripMargin,
    "media_decode" ->
      // closed-form pixel spec (Multimodal.pixelChannels), recomputed
      // independently of the Scala encoder/decoder pair
      """WITH d AS (
        |  SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 11 AS h
        |  FROM documents WHERE doc_id IS NOT NULL AND doc_id >= 0
        |), ys AS (
        |  SELECT doc_id, w, h, unnest(range(0, h)) AS y FROM d
        |), px AS (
        |  SELECT doc_id, w, h, y, unnest(range(0, w)) AS x FROM ys
        |), s AS (
        |  SELECT doc_id,
        |    CAST(SUM((doc_id + 3*x + 7*y) % 256
        |           + (2*doc_id + 5*x + 11*y) % 256
        |           + (3*doc_id + 13*x + y) % 256) AS BIGINT) AS pixel_sum,
        |    CAST(SUM((1 + x + w*y) * ((doc_id + 3*x + 7*y) % 256
        |           + 2*((2*doc_id + 5*x + 11*y) % 256)
        |           + 3*((3*doc_id + 13*x + y) % 256))) AS BIGINT) AS weighted_sum
        |  FROM px GROUP BY doc_id
        |)
        |SELECT d.doc_id AS media_id, true AS decode_ok,
        |       CASE WHEN d.doc_id % 2 = 0 THEN 'bmp' ELSE 'png' END AS detected_format,
        |       CAST(d.w AS INT) AS img_width, CAST(d.h AS INT) AS img_height,
        |       s.pixel_sum, s.weighted_sum, true AS meta_consistent
        |FROM d JOIN s USING (doc_id)""".stripMargin,
    "image_resize" ->
      // the pinned NN rule (sx = x·w div ow, sy = y·h div oh) and the
      // BI_RGB framing (54-byte headers + padded bottom-up rows),
      // recomputed independently of both codec directions
      """WITH d AS (
        |  SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 11 AS h
        |  FROM documents WHERE doc_id IS NOT NULL AND doc_id >= 0
        |), g AS (
        |  SELECT doc_id, w, h, w // 2 AS ow, h // 2 AS oh FROM d
        |), ys AS (
        |  SELECT doc_id, w, h, ow, oh, unnest(range(0, oh)) AS y FROM g
        |), px AS (
        |  SELECT doc_id, w, h, ow, oh, y, unnest(range(0, ow)) AS x FROM ys
        |), sp AS (
        |  SELECT doc_id, (x * w) // ow AS sx, (y * h) // oh AS sy FROM px
        |), s AS (
        |  SELECT doc_id,
        |    CAST(SUM((doc_id + 3*sx + 7*sy) % 256
        |           + (2*doc_id + 5*sx + 11*sy) % 256
        |           + (3*doc_id + 13*sx + sy) % 256) AS BIGINT) AS pixel_sum
        |  FROM sp GROUP BY doc_id
        |)
        |SELECT g.doc_id AS media_id, true AS resize_ok,
        |       CAST(g.w AS INT) AS src_width, CAST(g.h AS INT) AS src_height,
        |       CAST(g.ow AS INT) AS out_width, CAST(g.oh AS INT) AS out_height,
        |       CAST(54 + (3*g.ow + (4 - (3*g.ow) % 4) % 4) * g.oh AS BIGINT)
        |         AS out_bytes,
        |       s.pixel_sum
        |FROM g JOIN s ON g.doc_id = s.doc_id""".stripMargin,
    "bloom_prune" ->
      s"""SELECT doc_id, lang, source, n_chars FROM documents
         |WHERE doc_id IN (${bloomProbeKeys.mkString(", ")})
         |ORDER BY doc_id""".stripMargin,
    "zorder_layout" -> {
      // Morton interleave unrolled to pure integer arithmetic — bit i of
      // bx lands at 2i, bit i of by at 2i+1 (Maintenance.zValue's twin)
      val z = (0 until 8).map { i =>
        s"((bx // ${1L << i}) % 2) * ${1L << (2 * i)} + " +
          s"((by // ${1L << i}) % 2) * ${1L << (2 * i + 1)}"
      }.mkString(" + ")
      s"""WITH mm AS (
         |  SELECT CAST(min(l_orderkey) AS BIGINT) AS xmin,
         |         CAST(max(l_orderkey) AS BIGINT) AS xmax,
         |         CAST(min(l_partkey) AS BIGINT) AS ymin,
         |         CAST(max(l_partkey) AS BIGINT) AS ymax
         |  FROM lineitem
         |), b AS (
         |  SELECT l_orderkey, l_linenumber,
         |    (CAST(l_orderkey AS BIGINT) - xmin)
         |      // GREATEST(1, (xmax - xmin + 256) // 256) AS bx,
         |    (CAST(l_partkey AS BIGINT) - ymin)
         |      // GREATEST(1, (ymax - ymin + 256) // 256) AS by
         |  FROM lineitem, mm
         |)
         |SELECT l_orderkey, l_linenumber, bx, by,
         |       CAST($z AS BIGINT) AS zval
         |FROM b""".stripMargin
    },
    "audio_loudness" ->
      // same closed-form sample spec, re-windowed: the oracle never
      // touches a codec, so a decode that mangles one sample moves a
      // window's exact sum_sq and fails the hash
      """WITH d AS (
        |  SELECT doc_id, 50 + doc_id % 100 AS n
        |  FROM documents WHERE doc_id IS NOT NULL AND doc_id >= 0
        |), s AS (
        |  SELECT doc_id, unnest(range(0, n)) AS i FROM d
        |), v AS (
        |  SELECT doc_id, CAST(i // 16 AS BIGINT) AS win,
        |         (doc_id * 31 + i * 17) % 65536 - 32768 AS smp
        |  FROM s
        |)
        |SELECT doc_id AS media_id, win,
        |       CAST(COUNT(*) AS BIGINT) AS n_in_win,
        |       CAST(SUM(smp * smp) AS BIGINT) AS sum_sq,
        |       CAST(COUNT(CASE WHEN abs(smp) >= 32767 THEN 1 END) AS BIGINT)
        |         AS n_clipped,
        |       sqrt(CAST(SUM(smp * smp) AS DOUBLE) / COUNT(*)) AS rms
        |FROM v GROUP BY 1, 2""".stripMargin,
    "audio_decode" ->
      // closed-form sample spec (Multimodal.sampleSpec), recomputed
      // independently of the Scala encoder/decoder pair
      """WITH d AS (
        |  SELECT doc_id, 50 + doc_id % 100 AS n, 8000 + (doc_id % 3) * 4000 AS rate
        |  FROM documents WHERE doc_id IS NOT NULL AND doc_id >= 0
        |), s AS (
        |  SELECT doc_id, n, rate, unnest(range(0, n)) AS i FROM d
        |), v AS (
        |  SELECT doc_id, i, (doc_id * 31 + i * 17) % 65536 - 32768 AS smp FROM s
        |), agg AS (
        |  SELECT doc_id,
        |    CAST(COUNT(*) AS BIGINT) AS n_samples,
        |    CAST(SUM(smp) AS BIGINT) AS sample_sum,
        |    CAST(SUM((i + 1) * smp) AS BIGINT) AS weighted_sum,
        |    CAST(MIN(smp) AS INT) AS min_sample,
        |    CAST(MAX(smp) AS INT) AS max_sample
        |  FROM v GROUP BY doc_id
        |)
        |SELECT d.doc_id AS media_id, true AS decode_ok,
        |       CASE WHEN d.doc_id % 2 = 0 THEN 'wav' ELSE 'aiff' END AS detected_format,
        |       CAST(d.rate AS INT) AS sr_hz, 1 AS n_channels,
        |       agg.n_samples, agg.sample_sum, agg.weighted_sum,
        |       agg.min_sample, agg.max_sample, true AS meta_consistent
        |FROM d JOIN agg USING (doc_id)""".stripMargin,
    "video_frames" ->
      // closed-form frame-pixel spec (Multimodal.frameGray): every 3rd
      // frame of each doc's GIF, pixel sums recomputed independently
      """WITH d AS (
        |  SELECT doc_id, 6 + doc_id % 9 AS w, 5 + doc_id % 7 AS h,
        |         4 + doc_id % 9 AS nf
        |  FROM documents WHERE doc_id IS NOT NULL AND doc_id >= 0
        |), fr AS (
        |  SELECT doc_id, w, h, nf, unnest(range(0, nf, 3)) AS f FROM d
        |), ys AS (
        |  SELECT doc_id, w, h, nf, f, unnest(range(0, h)) AS y FROM fr
        |), px AS (
        |  SELECT doc_id, w, h, nf, f, y, unnest(range(0, w)) AS x FROM ys
        |), s AS (
        |  SELECT doc_id, f,
        |    CAST(SUM((doc_id + 5*f + 3*x + 7*y) % 256) AS BIGINT) AS pixel_sum,
        |    CAST(SUM((1 + x + w*y) * ((doc_id + 5*f + 3*x + 7*y) % 256)) AS BIGINT) AS weighted_sum
        |  FROM px GROUP BY doc_id, f
        |)
        |SELECT d.doc_id AS media_id, true AS decode_ok,
        |       CAST(d.nf AS INT) AS n_frames, CAST(s.f AS INT) AS frame_idx,
        |       CAST(d.w AS INT) AS img_width, CAST(d.h AS INT) AS img_height,
        |       s.pixel_sum, s.weighted_sum, true AS meta_consistent
        |FROM d JOIN s USING (doc_id)""".stripMargin,
    "video_keyframes" ->
      """WITH d AS (
        |  SELECT doc_id, 6 + doc_id % 9 AS w, 5 + doc_id % 7 AS h,
        |         4 + doc_id % 9 AS nf
        |  FROM documents WHERE doc_id IS NOT NULL AND doc_id >= 0
        |), fr AS (
        |  SELECT doc_id, w, h, nf, unnest(range(1, nf)) AS f FROM d
        |), ys AS (
        |  SELECT doc_id, w, h, nf, f, unnest(range(0, h)) AS y FROM fr
        |), px AS (
        |  SELECT doc_id, w, h, nf, f, y, unnest(range(0, w)) AS x FROM ys
        |), e AS (
        |  SELECT doc_id, f, MIN(nf) AS nf, MIN(w * h) AS npix,
        |    CAST(SUM(abs(((doc_id + 5*f + 3*x + 7*y) % 256)
        |               - ((doc_id + 5*f - 5 + 3*x + 7*y) % 256))) AS BIGINT) AS energy
        |  FROM px GROUP BY doc_id, f
        |)
        |SELECT media_id, frame_idx, energy, n_frames FROM (
        |  SELECT doc_id AS media_id, 0 AS frame_idx,
        |         CAST(NULL AS BIGINT) AS energy, CAST(nf AS INT) AS n_frames
        |  FROM d
        |  UNION ALL
        |  SELECT doc_id, CAST(f AS INT), energy, CAST(nf AS INT)
        |  FROM e WHERE energy > 8 * npix
        |) t
        |ORDER BY media_id, frame_idx""".stripMargin,
    "ann_lsh_pairs" ->
      s"""$dUnitCte, wb AS (
         |  SELECT e.vec_id, u.unit,
         |         ${dSignBand(0, 12)} AS band0,
         |         ${dSignBand(24, 12)} AS band1
         |  FROM embeddings e JOIN u ON e.vec_id = u.vec_id
         |), p AS (
         |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |         round(${dUnitDot("a.unit", "b.unit")}, 6) AS cosine_sim
         |  FROM wb a JOIN wb b ON a.band0 = b.band0 AND a.vec_id < b.vec_id
         |  UNION
         |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |         round(${dUnitDot("a.unit", "b.unit")}, 6) AS cosine_sim
         |  FROM wb a JOIN wb b ON a.band1 = b.band1 AND a.vec_id < b.vec_id
         |)
         |SELECT a_id, b_id, cosine_sim FROM p WHERE cosine_sim >= 0.4""".stripMargin,
    "sort_limit" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_shipdate
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 20""".stripMargin,
    "mutual_info" ->
      """WITH cells AS (
        |  SELECT lang, source, COUNT(*) AS n_xy FROM documents GROUP BY 1, 2
        |), mx AS (
        |  SELECT lang, CAST(SUM(n_xy) AS BIGINT) AS n_x FROM cells GROUP BY 1
        |), my AS (
        |  SELECT source, CAST(SUM(n_xy) AS BIGINT) AS n_y FROM cells GROUP BY 1
        |), tot AS (
        |  SELECT CAST(SUM(n_xy) AS BIGINT) AS n FROM cells
        |)
        |SELECT c.lang, c.source, c.n_xy, m.n_x, y.n_y, t.n,
        |       round(CAST(m.n_x * y.n_y AS DOUBLE) / CAST(t.n AS DOUBLE), 6) AS expected,
        |       round(ln(CAST(c.n_xy * t.n AS DOUBLE)
        |                / CAST(m.n_x * y.n_y AS DOUBLE)), 6) AS pmi,
        |       round((CAST(c.n_xy * t.n - m.n_x * y.n_y AS DOUBLE)
        |              * CAST(c.n_xy * t.n - m.n_x * y.n_y AS DOUBLE))
        |             / (CAST(t.n AS DOUBLE) * CAST(m.n_x * y.n_y AS DOUBLE)), 6) AS chi_comp
        |FROM cells c JOIN mx m USING (lang) JOIN my y USING (source) CROSS JOIN tot t
        |ORDER BY lang, source""".stripMargin,
    "benford_audit" ->
      """WITH d AS (
        |  SELECT CAST(substring(CAST(CAST(floor(l_extendedprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
        |  FROM lineitem WHERE l_extendedprice >= 1
        |), c AS (
        |  SELECT digit, COUNT(*) AS n FROM d GROUP BY 1
        |), t AS (
        |  SELECT CAST(SUM(n) AS BIGINT) AS total FROM c
        |)
        |SELECT digit, n, total,
        |       round(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 6) AS obs_freq,
        |       round((ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0)), 6) AS benford_freq,
        |       round(((CAST(n AS DOUBLE) - CAST(total AS DOUBLE)
        |                * (ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0)))
        |              * (CAST(n AS DOUBLE) - CAST(total AS DOUBLE)
        |                * (ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0))))
        |             / (CAST(total AS DOUBLE)
        |                * (ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0))), 6) AS chi_comp
        |FROM c CROSS JOIN t
        |ORDER BY digit""".stripMargin,
    "bootstrap_ci" -> dBootstrapSql,
    "char_entropy" ->
      """WITH ch AS (
        |  SELECT doc_id, lang, substring(text, CAST(i AS INT), 1) AS ch
        |  FROM (SELECT doc_id, lang, text, unnest(range(1, length(text) + 1)) AS i
        |        FROM documents WHERE length(text) > 0)
        |), cc AS (
        |  SELECT doc_id, lang, ch, COUNT(*) AS c FROM ch GROUP BY 1, 2, 3
        |), d AS (
        |  SELECT doc_id, lang, CAST(SUM(c) AS BIGINT) AS n,
        |         COUNT(*) AS distinct_chars,
        |         CAST(SUM(c * (length(bin(c)) - 1)) AS BIGINT) AS clog
        |  FROM cc GROUP BY 1, 2
        |)
        |SELECT doc_id, lang, n, distinct_chars,
        |       n * (length(bin(n)) - 1) - clog AS ent_mag,
        |       round(CAST(n * (length(bin(n)) - 1) - clog AS DOUBLE)
        |             / CAST(n AS DOUBLE), 6) AS entropy_q,
        |       CAST((n * (length(bin(n)) - 1) - clog) * 2 < n * 3 AS INT) AS low_entropy
        |FROM d ORDER BY doc_id""".stripMargin,
    "nb_classify" ->
      s"""$dNbPick
         |SELECT doc_id, lang, cls AS pred, score, CAST(lang = cls AS INT) AS correct
         |FROM pick WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "nb_metrics" ->
      s"""$dNbPick, res AS (
         |  SELECT doc_id, lang, cls AS pred FROM pick WHERE rn = 1
         |), classes AS (
         |  SELECT DISTINCT lang FROM documents WHERE doc_id % 5 <> 0
         |), bt AS (
         |  SELECT lang, COUNT(*) AS n_true FROM res GROUP BY 1
         |), bp AS (
         |  SELECT pred AS lang, COUNT(*) AS n_pred FROM res GROUP BY 1
         |), tpx AS (
         |  SELECT lang, COUNT(*) AS tp FROM res WHERE lang = pred GROUP BY 1
         |), j AS (
         |  SELECT c.lang,
         |         COALESCE(n_true, 0) AS n_true,
         |         COALESCE(n_pred, 0) AS n_pred,
         |         COALESCE(tp, 0) AS tp
         |  FROM classes c
         |  LEFT JOIN bt USING (lang) LEFT JOIN bp USING (lang) LEFT JOIN tpx USING (lang)
         |)
         |SELECT lang, n_true, n_pred, tp,
         |       CASE WHEN n_pred = 0 THEN NULL
         |            ELSE round(CAST(tp AS DOUBLE) / CAST(n_pred AS DOUBLE), 6) END AS prec,
         |       CASE WHEN n_true = 0 THEN NULL
         |            ELSE round(CAST(tp AS DOUBLE) / CAST(n_true AS DOUBLE), 6) END AS rec,
         |       CASE WHEN n_pred + n_true = 0 THEN NULL
         |            ELSE round(CAST(2 * tp AS DOUBLE) / CAST(n_pred + n_true AS DOUBLE), 6) END AS f1
         |FROM j ORDER BY lang""".stripMargin,
    "url_canonical" -> s"$dUrlCanonSql\nORDER BY doc_id",
    "url_dedup" ->
      // flattened before embedding (the stripMargin-vs-'||' rule again)
      s"""WITH base AS (
         |  ${dUrlCanonSql.replace('\n', ' ')}
         |)
         |SELECT canon_url, COUNT(*) AS n_docs, MIN(doc_id) AS keeper
         |FROM base GROUP BY 1 HAVING COUNT(*) > 1
         |ORDER BY canon_url""".stripMargin,
    "json_profile" ->
      s"""WITH j AS (
         |  SELECT ${jsonDecorSql.replace('\n', ' ')} AS props2 FROM events
         |), kv AS (
         |  SELECT k, json_extract_string(props2, '$$.' || k) AS v
         |  FROM (SELECT props2, unnest(json_keys(props2)) AS k FROM j)
         |)
         |SELECT k, COUNT(*) AS n_present,
         |       CAST(SUM(CAST(v IS NULL AS INT)) AS BIGINT) AS n_null,
         |       CAST(SUM(CAST(v IS NOT NULL AND try_cast(v AS DOUBLE) IS NOT NULL AS INT)) AS BIGINT) AS n_number,
         |       CAST(SUM(CAST(v IS NOT NULL AND v IN ('true', 'false') AS INT)) AS BIGINT) AS n_bool,
         |       CAST(SUM(CAST(v IS NOT NULL AND substring(v, 1, 1) IN ('[', '{') AS INT)) AS BIGINT) AS n_nested,
         |       CAST(SUM(CAST(v IS NOT NULL AND try_cast(v AS DOUBLE) IS NULL
         |                     AND v NOT IN ('true', 'false')
         |                     AND substring(v, 1, 1) NOT IN ('[', '{') AS INT)) AS BIGINT) AS n_string,
         |       COUNT(DISTINCT v) AS n_distinct
         |FROM kv GROUP BY k ORDER BY k""".stripMargin,
    "hazard_table" ->
      """WITH r AS (
        |  SELECT user_id AS u, ts, event_id,
        |         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events
        |), ft AS (
        |  SELECT u,
        |         MIN(CASE WHEN rn = 1 THEN ts END) AS t1,
        |         MIN(CASE WHEN rn = 2 THEN ts END) AS t2
        |  FROM r WHERE rn <= 2 GROUP BY u
        |), oe AS (
        |  SELECT MAX(ts) AS obs_end FROM events
        |), sp AS (
        |  SELECT CASE WHEN t2 IS NOT NULL
        |              THEN datediff('day', CAST(t1 AS DATE), CAST(t2 AS DATE))
        |              ELSE datediff('day', CAST(t1 AS DATE), CAST(obs_end AS DATE)) END AS t_day,
        |         CAST(t2 IS NOT NULL AS INT) AS is_event
        |  FROM ft CROSS JOIN oe
        |), pd AS (
        |  SELECT t_day, CAST(SUM(is_event) AS BIGINT) AS d,
        |         CAST(SUM(1 - is_event) AS BIGINT) AS c
        |  FROM sp GROUP BY t_day
        |)
        |SELECT t_day,
        |       CAST(SUM(d + c) OVER (ORDER BY t_day DESC
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_risk,
        |       d, c,
        |       round(CAST(d AS DOUBLE)
        |             / CAST(SUM(d + c) OVER (ORDER BY t_day DESC
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 6) AS hazard
        |FROM pd ORDER BY t_day""".stripMargin,
    "change_point" ->
      """WITH daily AS (
        |  SELECT event_type AS etype, date_trunc('day', ts) AS day, COUNT(*) AS n
        |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2
        |), cum AS (
        |  SELECT etype, day,
        |         ROW_NUMBER() OVER (PARTITION BY etype ORDER BY day) AS k,
        |         CAST(SUM(n) OVER (PARTITION BY etype ORDER BY day
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s1,
        |         COUNT(*) OVER (PARTITION BY etype) AS d_days,
        |         CAST(SUM(n) OVER (PARTITION BY etype) AS BIGINT) AS total
        |  FROM daily
        |), cand AS (
        |  SELECT etype, day AS split_day, k AS n1, d_days - k AS n2,
        |         s1, total - s1 AS s2,
        |         abs(s1 * (d_days - k) - (total - s1) * k) AS num,
        |         k * (d_days - k) AS den
        |  FROM cum WHERE k < d_days
        |), pick AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY etype
        |              ORDER BY (num * 1000000) // den DESC, num DESC, den ASC, n1 ASC) AS rn
        |  FROM cand
        |)
        |SELECT etype, split_day, n1, n2, s1, s2,
        |       round(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |             - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE), 6) AS mean_gap
        |FROM pick WHERE rn = 1 ORDER BY etype""".stripMargin,
    "order_audit" ->
      """WITH s AS (
        |  SELECT user_id, epoch_us(ts) AS tus,
        |         LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id) AS prev
        |  FROM events
        |), b AS (
        |  SELECT user_id,
        |         CASE WHEN prev IS NOT NULL AND prev > tus THEN prev - tus ELSE 0 END AS back_us
        |  FROM s
        |)
        |SELECT user_id, COUNT(*) AS n_events,
        |       CAST(SUM(CAST(back_us > 0 AS INT)) AS BIGINT) AS n_inversions,
        |       CAST(MAX(back_us) AS BIGINT) AS max_backstep_us
        |FROM b GROUP BY user_id ORDER BY user_id""".stripMargin,
    "control_chart" ->
      """WITH daily AS (
        |  SELECT event_type AS etype, date_trunc('day', ts) AS day, COUNT(*) AS n
        |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2
        |), tot AS (
        |  SELECT etype, CAST(SUM(n) AS BIGINT) AS s_total, COUNT(*) AS n_days
        |  FROM daily GROUP BY 1
        |)
        |SELECT d.etype, d.day, d.n, t.s_total, t.n_days,
        |       round((CAST(s_total AS DOUBLE) / CAST(n_days AS DOUBLE))
        |             + 3.0 * sqrt((CAST(s_total AS DOUBLE) / CAST(n_days AS DOUBLE))), 6) AS ucl,
        |       round(greatest(0.0, (CAST(s_total AS DOUBLE) / CAST(n_days AS DOUBLE))
        |             - 3.0 * sqrt((CAST(s_total AS DOUBLE) / CAST(n_days AS DOUBLE)))), 6) AS lcl,
        |       CASE WHEN n * n_days > s_total
        |             AND (n * n_days - s_total) * (n * n_days - s_total) > 9 * s_total * n_days
        |            THEN 1 ELSE 0 END AS breach_hi,
        |       CASE WHEN n * n_days < s_total
        |             AND (s_total - n * n_days) * (s_total - n * n_days) > 9 * s_total * n_days
        |            THEN 1 ELSE 0 END AS breach_lo
        |FROM daily d JOIN tot t USING (etype)
        |ORDER BY etype, day""".stripMargin
  )
}
