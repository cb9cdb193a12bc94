package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pattern-mining operators: frequent itemsets / association rules
  * (market-basket, Agrawal & Srikant's Apriori pruning), Markov
  * transition telemetry over event streams, and an exact 2-D Pareto
  * frontier (skyline, Börzsönyi et al. 2001) in distributed form.
  *
  * All shapes are scale-first: pair candidates are generated PER BASKET
  * from a bounded sorted item array (never a corpus self-join), the
  * Apriori item-support prune runs before any pair exists, and the
  * skyline reduces to per-x maxima then range-bucketed local windows so
  * no unbounded single-partition sort appears anywhere.
  */
object Mining {

  /** Distinct (basket, item) pairs with NULLs dropped — the transaction
    * relation every mining op starts from.
    */
  private def transactions(df: DataFrame, basketCol: String, itemCol: String): DataFrame =
    df.select(col(basketCol).as("b"), col(itemCol).cast("string").as("it"))
      .where(col("b").isNotNull && col("it").isNotNull)
      .distinct()

  /** Basket count and the absolute support threshold ⌈ratio · n_baskets⌉
    * as ONE broadcast 1-row frame — relative support is what survives a
    * data-scale change (a fixed absolute count silently returns
    * everything at 100× and nothing at 0.01×), and deriving both numbers
    * from a single aggregate keeps it one subtree that AQE stage-reuse
    * shares across every consumer. Same double product and ceil on both
    * engines.
    */
  private def basketStats(tx: DataFrame, ratio: Double): DataFrame =
    tx.agg(count_distinct(col("b")).as("n_baskets"))
      .select(col("n_baskets"),
        ceil(lit(ratio) * col("n_baskets").cast("double")).cast("bigint").as("min_n"))

  /** Item supports ≥ the threshold (the Apriori monotonicity prune: a
    * pair can only be frequent if both items are).
    */
  private def frequentItems(tx: DataFrame, stats: DataFrame): DataFrame =
    tx.groupBy(col("it")).agg(count(lit(1)).as("item_n"))
      .crossJoin(broadcast(stats.select("min_n")))
      .where(col("item_n") >= col("min_n"))
      .drop("min_n")

  /** Co-occurrence counts of item PAIRS within baskets. The candidate
    * pairs are enumerated inside each basket from its sorted distinct
    * frequent-item array (size bounded by the basket, not the corpus) —
    * one explode of a per-row pair array, then a map-side-combined
    * count. There is no corpus-level self-join at any point, which is
    * what makes the shape safe when baskets number in the billions.
    */
  private def basketPairCounts(df: DataFrame, basketCol: String, itemCol: String, stats: DataFrame): DataFrame = {
    val tx = transactions(df, basketCol, itemCol)
    val pruned = tx.join(frequentItems(tx, stats).select("it"), Seq("it"))
    pruned
      .groupBy(col("b"))
      .agg(array_sort(collect_set(col("it"))).as("its"))
      .where(size(col("its")) >= 2)
      .select(explode(expr(
        """flatten(transform(sequence(1, size(its) - 1),
          |  i -> transform(sequence(i + 1, size(its)),
          |    j -> struct(element_at(its, i) as item_a, element_at(its, j) as item_b))))""".stripMargin)).as("p"))
      .select(col("p.item_a").as("item_a"), col("p.item_b").as("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("pair_n"))
  }

  /** The basket-mining model — ONE corpus-level artifact (stats: 1 row;
    * item supports: vocabulary-sized; pair counts: ≤ vocabulary²) that
    * [[freqItemsetsWith]], [[assocRulesWith]] and
    * [[itemCooccurrenceWith]] all read. Computed once and shared via
    * [[graft.ext.IndexCache.basketModel]] (the write-the-intermediate-
    * once doctrine, DESIGN.md round 14): before the share,
    * freq_itemsets + assoc_rules each re-ran the transaction distinct
    * and the per-basket pair explode from scratch at the same support
    * ratio.
    */
  def basketModel(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      minSupportRatio: Double): (DataFrame, DataFrame, DataFrame) = {
    require(minSupportRatio > 0 && minSupportRatio <= 1,
      s"minSupportRatio must be in (0,1], got $minSupportRatio")
    val tx = transactions(df, basketCol, itemCol)
    val stats = basketStats(tx, minSupportRatio)
    (stats, frequentItems(tx, stats), basketPairCounts(df, basketCol, itemCol, stats))
  }

  /** Frequent item pairs: (item_a < item_b, pair support count, support
    * ratio). `supp` is one IEEE division of two exact int64s — identical
    * across engines.
    */
  def freqItemsets(df: DataFrame, basketCol: String, itemCol: String, minSupportRatio: Double = 0.01): DataFrame = {
    val (stats, _, pairs) = basketModel(df, basketCol, itemCol, minSupportRatio)
    freqItemsetsWith(stats, pairs)
  }

  /** [[freqItemsets]] over a prebuilt [[basketModel]]. */
  def freqItemsetsWith(stats: DataFrame, pairs: DataFrame): DataFrame =
    pairs
      .crossJoin(broadcast(stats))
      .where(col("pair_n") >= col("min_n"))
      .select(col("item_a"), col("item_b"), col("pair_n"),
        (col("pair_n").cast("double") / col("n_baskets").cast("double")).as("supp"))

  /** Association rules antecedent → consequent from frequent pairs, both
    * directions, with confidence = supp(ab)/supp(a) and
    * lift = supp(ab)/(supp(a)·supp(b)) = pair_n·n_baskets/(n_a·n_b).
    * Both ratios are single IEEE divisions of exact int64 products.
    */
  def assocRules(df: DataFrame, basketCol: String, itemCol: String, minSupportRatio: Double = 0.01): DataFrame = {
    val (stats, items, pairs) = basketModel(df, basketCol, itemCol, minSupportRatio)
    assocRulesWith(stats, items, pairs)
  }

  /** [[assocRules]] over a prebuilt [[basketModel]]. */
  def assocRulesWith(stats: DataFrame, items: DataFrame, pairs0: DataFrame): DataFrame = {
    val pairs = pairs0
      .crossJoin(broadcast(stats.select("min_n")))
      .where(col("pair_n") >= col("min_n"))
      .drop("min_n")
    val directed = pairs.select(col("item_a").as("antecedent"), col("item_b").as("consequent"), col("pair_n"))
      .unionAll(pairs.select(col("item_b").as("antecedent"), col("item_a").as("consequent"), col("pair_n")))
    directed
      .join(items.select(col("it").as("antecedent"), col("item_n").as("n_ant")), Seq("antecedent"))
      .join(items.select(col("it").as("consequent"), col("item_n").as("n_cons")), Seq("consequent"))
      .crossJoin(broadcast(stats.select("n_baskets")))
      .select(col("antecedent"), col("consequent"), col("pair_n"), col("n_ant"), col("n_cons"),
        (col("pair_n").cast("double") / col("n_ant").cast("double")).as("confidence"),
        ((col("pair_n") * col("n_baskets")).cast("double") /
          (col("n_ant") * col("n_cons")).cast("double")).as("lift"))
  }

  /** Item–item co-occurrence similarity — the "customers who bought X
    * also bought Y" collaborative-filtering primitive: for every item
    * pair sharing a basket, the co-count and the cosine
    * c_ij/√(c_i·c_j), plus each item's top-k neighbors by (cosine,
    * co-count, id) — ties broken totally so the cut is deterministic.
    * √ of an exact int64 product is one IEEE op, identical
    * cross-engine; the ranking key is (co-count² vs scaled product)
    * comparisons only through that single double.
    *
    * Scale shape: identical to [[freqItemsets]] (per-basket pair
    * explode, no corpus self-join); the top-k window is per-item,
    * bounded by the item's neighbor count.
    */
  def itemCooccurrence(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      minSupportRatio: Double = 0.001,
      topK: Int = 5): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val (_, items, pairs) = basketModel(df, basketCol, itemCol, minSupportRatio)
    itemCooccurrenceWith(items, pairs, topK)
  }

  /** [[itemCooccurrence]] over a prebuilt [[basketModel]]. */
  def itemCooccurrenceWith(items: DataFrame, pairs: DataFrame, topK: Int = 5): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val directed = pairs
      .select(col("item_a").as("item"), col("item_b").as("neighbor"), col("pair_n"))
      .unionAll(pairs.select(col("item_b").as("item"), col("item_a").as("neighbor"), col("pair_n")))
      .join(items.select(col("it").as("item"), col("item_n").as("n_i")), Seq("item"))
      .join(items.select(col("it").as("neighbor"), col("item_n").as("n_j")), Seq("neighbor"))
      .withColumn("cosine",
        col("pair_n").cast("double") / sqrt((col("n_i") * col("n_j")).cast("double")))
    val w = Window.partitionBy(col("item"))
      .orderBy(col("cosine").desc, col("pair_n").desc, col("neighbor"))
    directed
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= topK)
      .select(col("item"), col("neighbor"), col("pair_n"), col("n_i"), col("n_j"),
        col("cosine"), col("rk").cast("int").as("rk"))
  }

  /** Top event TRIGRAM paths per entity stream — the sequence-mining
    * counterpart of [[markovTransitions]] (second-order context:
    * "what happens after X then Y"). One shuffle on the entity key,
    * two leads over the same window sort, then a map-side-combined
    * count with a global top-k by (count desc, path) — the top-k
    * window runs over the path vocabulary (|types|³ max), not events.
    */
  def eventTrigrams(
      df: DataFrame,
      keyCol: String,
      typeCol: String,
      tsCol: String,
      tieCol: String,
      topK: Int = 20): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val wAll = Window.orderBy(col("n").desc, col("t1"), col("t2"), col("t3"))
    df.where(col(keyCol).isNotNull)
      .select(col(keyCol), col(typeCol).as("t1"), col(tsCol), col(tieCol))
      .withColumn("t2", lead(col("t1"), 1).over(w))
      .withColumn("t3", lead(col("t1"), 2).over(w))
      .where(col("t3").isNotNull)
      .groupBy(col("t1"), col("t2"), col("t3"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(wAll))
      .where(col("rk") <= topK)
      .select(col("t1"), col("t2"), col("t3"), col("n"), col("rk").cast("int").as("rk"))
  }

  /** First-order Markov transition telemetry: consecutive (state → next
    * state) counts per entity ordered by (ts, tie-break), with each
    * source state's outgoing total and the empirical transition
    * probability (one int64/int64 IEEE division). The behavioral
    * "what happens after X" matrix — one shuffle on the entity key, a
    * per-entity lead window, then a map-side-combined count.
    */
  def markovTransitions(df: DataFrame, keyCol: String, typeCol: String, tsCol: String, tieCol: String): DataFrame =
    transitionMatrix(pairCounts(df, keyCol, typeCol, tsCol, tieCol))

  /** Within-frame consecutive (from, to) counts per entity. */
  private def pairCounts(df: DataFrame, keyCol: String, typeCol: String, tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    df.where(col(keyCol).isNotNull)
      .select(col(keyCol), col(typeCol).as("from_type"), col(tsCol), col(tieCol))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .where(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_trans"))
  }

  /** Fold (from, to, n) counts into the transition matrix with outgoing
    * totals and empirical probabilities — shared by the batch path and
    * the streaming reader.
    */
  private def transitionMatrix(counts: DataFrame): DataFrame = {
    val wFrom = Window.partitionBy(col("from_type"))
    counts
      .groupBy(col("from_type"), col("to_type"))
      .agg(sum(col("n_trans")).cast("bigint").as("n_trans"))
      .withColumn("n_from", sum(col("n_trans")).over(wFrom).cast("bigint"))
      .withColumn("prob", col("n_trans").cast("double") / col("n_from").cast("double"))
  }

  /** Streaming twin of [[markovTransitions]]: each micro-batch stores
    * its WITHIN-batch transition counts plus each entity's first/last
    * state (two per-batch stores, whole-dir overwrite ⇒
    * replay-idempotent); [[markovFrom]] merges the counts and stitches
    * the CROSS-batch transitions from the boundary states — so no raw
    * event history is ever kept, only (types² counts + per-user
    * boundary rows) per batch. Correct under the replay/watermark
    * source contract that each entity's events arrive in event-time
    * order across batches (the stitch orders by batch id); within a
    * batch, (ts, tie) ordering applies as in the batch path.
    */
  def markovSink(
      events: DataFrame,
      keyCol: String,
      typeCol: String,
      tsCol: String,
      tieCol: String,
      outDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        markovBatch(batch.toDF(), keyCol, typeCol, tsCol, tieCol, outDir, batchId)
      }
      .start()

  /** One micro-batch's stores (factored out for replay tests). Writes
    * trans then bounds; the reader intersects the two committed sets, so
    * a crash between the writes never double-counts (the
    * corpusStatsSink two-store discipline).
    */
  def markovBatch(df: DataFrame, keyCol: String, typeCol: String, tsCol: String, tieCol: String,
      outDir: String, batchId: Long): Unit = {
    pairCounts(df, keyCol, typeCol, tsCol, tieCol)
      .write.mode("overwrite").parquet(s"$outDir/trans/batch_$batchId")
    df.where(col(keyCol).isNotNull)
      .groupBy(col(keyCol).cast("string").as("k"))
      .agg(
        min(struct(col(tsCol), col(tieCol), col(typeCol).as("t"))).getField("t").as("first_type"),
        max(struct(col(tsCol), col(tieCol), col(typeCol).as("t"))).getField("t").as("last_type"))
      .withColumn("bid", lit(batchId))
      .write.mode("overwrite").parquet(s"$outDir/bounds/batch_$batchId")
    ()
  }

  /** The transition matrix over everything [[markovSink]] committed. */
  def markovFrom(spark: org.apache.spark.sql.SparkSession, outDir: String): DataFrame = {
    import spark.implicits._
    val committed =
      graft.ext.TextOps.committedBatchDirs(spark, s"$outDir/trans")
        .intersect(graft.ext.TextOps.committedBatchDirs(spark, s"$outDir/bounds"))
    if (committed.isEmpty)
      transitionMatrix(Seq.empty[(String, String, Long)].toDF("from_type", "to_type", "n_trans"))
    else {
      val dirs = committed.toSeq.sorted
      val within = spark.read.parquet(dirs.map(b => s"$outDir/trans/$b"): _*)
      val bounds = spark.read.parquet(dirs.map(b => s"$outDir/bounds/$b"): _*)
      val wB = Window.partitionBy(col("k")).orderBy(col("bid"))
      val cross = bounds
        .withColumn("prev_last", lag(col("last_type"), 1).over(wB))
        .where(col("prev_last").isNotNull)
        .groupBy(col("prev_last").as("from_type"), col("first_type").as("to_type"))
        .agg(count(lit(1)).as("n_trans"))
      transitionMatrix(within.unionByName(cross))
    }
  }

  /** Exact 2-D Pareto frontier (skyline), both dimensions maximized: the
    * rows no other row dominates (≥ in both, > in at least one). Never
    * the O(n²) dominance join: reduce to per-x maxima (distributed
    * aggregate), range-bucket the distinct-x frame by exact min/max (one
    * bounded 2-value driver action, like Maintenance's z-range probe),
    * run the classic sort-by-x-desc / strictly-preceding-cummax-y window
    * WITHIN each bucket, then resolve across buckets with a ≤`buckets`-row
    * window — no unbounded single-partition sort. Bucket ids come from
    * monotone double arithmetic, so a higher bucket implies strictly
    * greater x; the bucketing affects only intermediate pruning, never
    * the result. Rows tied on both dimensions all survive (neither
    * strictly dominates), matching the NOT-EXISTS oracle. NULL
    * dimensions are dropped (dominance is undefined on them).
    */
  def paretoFront(df: DataFrame, xCol: String, yCol: String, buckets: Int = 64): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val pts = df.where(col(xCol).isNotNull && col(yCol).isNotNull)
    val perX = pts.groupBy(col(xCol).as("_x")).agg(max(col(yCol)).as("_mx"))
    // x-range as a broadcast one-row frame (the scalar-join idiom), not
    // a driver head(): the head() ran perX's full groupBy as its own
    // job before the real one (the exchange is only reused within one
    // job), and at scale it is a driver sync point. Same arithmetic:
    // (mx - mn) is the identical IEEE subtraction of the same doubles
    // the literal form computed on the driver.
    val mm = broadcast(perX.agg(
      min(col("_x")).cast("double").as("_mnx"),
      max(col("_x")).cast("double").as("_mxx")))
    val bucketed = perX.crossJoin(mm)
      .withColumn("_bk",
        when(col("_mnx").isNull || col("_mnx") === col("_mxx"), lit(0))
          .otherwise(least(floor((col("_x").cast("double") - col("_mnx")) /
            (col("_mxx") - col("_mnx")) * lit(buckets)), lit(buckets - 1)).cast("int")))
      .drop("_mnx", "_mxx")
    val wLocal = Window.partitionBy(col("_bk")).orderBy(col("_x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = bucketed
      .withColumn("_smax", max(col("_mx")).over(wLocal))
      .where(col("_smax").isNull || col("_mx") > col("_smax"))
    val wBuckets = Window.orderBy(col("_bk").desc).rowsBetween(Window.unboundedPreceding, -1)
    val higherMax = bucketed.groupBy(col("_bk")).agg(max(col("_mx")).as("_bmx"))
      .withColumn("_hmax", max(col("_bmx")).over(wBuckets))
      .select(col("_bk"), col("_hmax"))
    val sky = local.join(higherMax, Seq("_bk"))
      .where(col("_hmax").isNull || col("_mx") > col("_hmax"))
      .select(col("_x"), col("_mx"))
    pts.join(sky, pts(xCol) === sky("_x") && pts(yCol) === sky("_mx"))
      .select(pts.columns.map(pts(_)): _*)
  }
}
