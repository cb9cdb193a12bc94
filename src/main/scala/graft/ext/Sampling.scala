package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for a training-data pipeline.
  *
  * `sample()`/`rand()` are nondeterministic across retries and partition
  * re-splits — at 100 TB a task retry would silently change the sample. All
  * sampling here is HASH-based: membership depends only on the row's key,
  * so it is stable under re-execution, re-partitioning, and engine changes
  * (the md5-prefix hash is reproduced bit-for-bit by the DuckDB oracle).
  * Both operators are partition-local (zero shuffle) except the stratified
  * top-k which shuffles once on the stratum key.
  */
object Sampling {

  /** Keep ~`pct`% of rows by bucketing a 60-bit md5 of the key. */
  def hashSample(df: DataFrame, keyExpr: String, pct: Int): DataFrame =
    df.filter(
      expr(s"pmod(${TextOps.md5Long64(s"cast($keyExpr as string)")}, 100) < $pct"))

  /** The per-source keep rate, as SQL shared verbatim by BOTH engines —
    * `weightedBySource`, `pipeline_curate2`, and their DuckDB oracles all
    * interpolate THIS string, so the membership predicate can never drift
    * between the Spark side and the oracle (the dialect subset here —
    * try_cast/substring/int arithmetic — parses identically in both).
    * `try_cast` + coalesce: a source name outside the `srcN` convention
    * gets the base rate 10 instead of a CAST_INVALID_INPUT crash (the
    * EdgeCorpusSpec class of failure — config tables meet unexpected
    * source names in real pipelines).
    */
  val sourceRateSql: String =
    "10 + ((coalesce(try_cast(substring(source, 4, 8) as int), 0) * 7) % 80)"

  /** Domain-mixing report: per-source keep rates applied as a
    * deterministic hash sample, with the achieved counts per source — the
    * "re-weight web vs curated sources" step of corpus assembly. The
    * rates table is broadcast-joined (in practice it is a small config
    * table; here it is derived deterministically from the source name so
    * the oracle can reproduce it). Shapes: one broadcast join + one
    * aggregate shuffle on the low-cardinality source key — membership is
    * pure per-row hashing, stable under retries and repartitioning.
    */
  def weightedBySource(documents: DataFrame): DataFrame = {
    val rates = documents.select(col("source")).distinct()
      .withColumn("rate", expr(sourceRateSql))
    val h = expr(s"pmod(${TextOps.md5Long64("cast(doc_id as string)")}, 100)")
    documents
      .join(broadcast(rates), "source")
      .withColumn("kept", (h < col("rate")).cast("int"))
      .groupBy(col("source"), col("rate"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("kept")).as("n_kept"))
      .orderBy(col("source"))
  }

  /** Token-budget data mixing — the step that turns "train on 50% web /
    * 30% wiki / 20% books" into per-source sampling rates (the
    * Pile/Dolma mixture-weights shape). Given integer mixture weights
    * per source (`weightExpr`), the operator:
    *
    *   1. counts tokens per source (ONE map-side-combined corpus pass);
    *   2. finds the largest total token budget B that no source can
    *      over-supply: B = min_s floor(T_s · Σw / w_s) — ask more and
    *      some source runs out, capping the real mixture below target;
    *   3. asks each source for floor(w_s · B / Σw) tokens and converts
    *      that to a parts-per-million doc-hash acceptance rate.
    *
    * Selection is the deterministic hash filter (`md5(doc_id) % ppm <
    * rate`), NOT an ordered prefix: a per-source cumulative-sum window
    * would sort whole sources in single tasks (a 50 TB source = one
    * task), while the hash filter is a zero-shuffle projection after a
    * broadcast join, hitting the asked token count in expectation — the
    * only shape that survives 100 TB. Everything is int64: the
    * rate division is split as q·1000 + (r·1000 div T) so intermediates
    * stay under 2⁶³ for sources up to ~9·10¹⁵ tokens.
    *
    * Output is the per-source plan + outcome: weight, token supply,
    * asked tokens, acceptance rate, docs/tokens actually kept — the
    * audit row a mixture pipeline logs per source.
    */
  def mixtureSample(
      documents: DataFrame,
      weightExpr: String = sourceRateSql,
      ppm: Long = 1000000L): DataFrame = {
    require(ppm >= 1000 && ppm % 1000 == 0,
      s"ppm must be a positive multiple of 1000 (split-division exactness), got $ppm")
    val kilo = ppm / 1000
    val d = documents.select(col("doc_id"), col("source"),
      expr("cast(size(split(text, ' ')) as bigint)").as("n_toks"))
    val totals = d.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("t_toks"))
      .withColumn("w", expr(s"cast(($weightExpr) as bigint)"))
    val sw = totals.agg(sum(col("w")).as("sum_w"))
    val budget = totals.crossJoin(broadcast(sw))
      .agg(min(expr("t_toks * sum_w div w")).as("budget"),
        min(col("sum_w")).as("sum_w"))
    val rates = totals.crossJoin(broadcast(budget))
      .withColumn("ask_toks", expr("w * budget div sum_w"))
      .withColumn("rate_ppm", expr(
        s"""case when t_toks > 0
           | then (ask_toks * 1000 div t_toks) * $kilo
           |      + ((ask_toks * 1000 % t_toks) * $kilo div t_toks)
           | else cast(0 as bigint) end""".stripMargin))
    d.join(broadcast(rates.select("source", "w", "t_toks", "ask_toks", "rate_ppm",
        "n_docs")), Seq("source"))
      .withColumn("kept", expr(
        s"cast(pmod(${TextOps.md5Long64("concat('mix:', cast(doc_id as string))")}, $ppm) < rate_ppm as int)"))
      .groupBy(col("source"), col("w"), col("t_toks"), col("ask_toks"),
        col("rate_ppm"), col("n_docs"))
      .agg(sum(col("kept")).as("kept_docs"),
        sum(col("kept") * col("n_toks")).as("kept_toks"))
      .orderBy(col("source"))
  }

  /** Per-source document cap — the anti-domination step of crawl curation
    * (no single domain may contribute more than `cap` documents). Keeps
    * each source's `cap` smallest (hash, doc_id) pairs: hash order makes
    * the kept set a uniform within-source sample that is stable under
    * retries/repartitioning (doc order never matters), and the id
    * tie-break keeps it total.
    *
    * Scale shape: the obvious `row_number() OVER (PARTITION BY source)`
    * shuffles and sorts the WHOLE corpus on a (likely skewed) domain key.
    * This instead runs [[graft.functions.TopKAggregator]] per source —
    * partial top-cap buffers combine map-side, so the exchange carries
    * ≤ cap rows per (source, partition) and the dominant domain's
    * millions of rows never travel. The 52-bit hash fits a double
    * exactly, so the aggregator's (score, id) ordering is bit-identical
    * to the oracle's `ORDER BY hash, doc_id` window.
    */
  def capPerSource(documents: DataFrame, cap: Int = 8): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents
      .selectExpr("source", "doc_id",
        s"${TextOps.md5Long64("cast(doc_id as string)")} % 4503599627370496L as h52")
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapValues(t => (-t._3.toDouble, t._2)) // TopK keeps LARGEST score = smallest hash
      .agg(new graft.functions.TopKAggregator(cap).toColumn.name("ids"))
      .toDF("source", "ids")
      .select(col("source"), explode(col("ids")).as("doc_id"))
  }

  /** Deterministic train/val/test assignment — the split every training
    * corpus needs, as a pure hash projection: membership depends only on
    * the doc id, so it is stable across runs, retries, engines and
    * corpus growth (adding documents never moves an existing one between
    * splits — the property random splitting silently lacks).
    */
  def datasetSplit(
      documents: DataFrame,
      valPct: Int = 10,
      testPct: Int = 10): DataFrame = {
    require(valPct >= 0 && testPct >= 0 && valPct + testPct <= 100,
      s"invalid split percentages: val=$valPct test=$testPct")
    documents.selectExpr("doc_id",
      s"${TextOps.md5Long64("cast(doc_id as string)")} % 100 as bucket")
      .selectExpr("doc_id",
        s"""case when bucket < $testPct then 'test'
           |     when bucket < ${testPct + valPct} then 'val'
           |     else 'train' end as split""".stripMargin)
  }

  /** Leakage-safe train/val/test assignment: near-duplicate documents
    * must land in the SAME split, or the test set silently contains
    * paraphrases of training documents and every evaluation number is
    * contaminated — the failure [[datasetSplit]]'s independent per-doc
    * hashing cannot prevent. Composition of already-gated machinery:
    * LSH candidate pairs → connected components → each doc splits by
    * its component representative's hash (singletons by their own id,
    * so an un-duplicated doc gets exactly its [[datasetSplit]]
    * assignment — the two operators agree wherever leakage is not at
    * stake).
    *
    * Scale shape: the banded LSH pair search and O(log n) star
    * contraction are the `dedup_clusters` plan; the split itself adds
    * one key join + a projection. Stability: adding documents never
    * moves an existing doc between splits unless it genuinely joins a
    * cluster that straddles the change.
    */
  def leakageSafeSplit(
      documents: DataFrame,
      valPct: Int = 10,
      testPct: Int = 10): DataFrame =
    leakageSafeSplitWith(documents,
      Dedup.connectedComponents(
        Dedup.minhashCandidatePairs(documents).select("a_id", "b_id")),
      valPct, testPct)

  /** [[leakageSafeSplit]] over a caller-supplied CC assignment — the
    * shared-stage form ([[IndexCache.ccClusters]]): the split shares the
    * corpus's one candidate-pair/CC materialization with the dedup
    * family instead of re-running the LSH join + contraction.
    */
  def leakageSafeSplitWith(
      documents: DataFrame,
      clusters: DataFrame,
      valPct: Int = 10,
      testPct: Int = 10): DataFrame = {
    require(valPct >= 0 && testPct >= 0 && valPct + testPct <= 100,
      s"invalid split percentages: val=$valPct test=$testPct")
    documents.select(col("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .selectExpr("doc_id", "coalesce(component, doc_id) as rep")
      .selectExpr("doc_id", "rep",
        s"pmod(${TextOps.md5Long64("cast(rep as string)")}, 100) as bucket")
      .selectExpr("doc_id", "rep",
        s"""case when bucket < $testPct then 'test'
           |     when bucket < ${testPct + valPct} then 'val'
           |     else 'train' end as split""".stripMargin)
  }

  /** Temporal split with an EMBARGO gap — the time-series leakage
    * control (López de Prado's purged/embargoed split, reduced to the
    * deterministic core): train is everything before the cutoff, test
    * everything after cutoff + embargo, and the embargo band between
    * them is EXCLUDED from both — so features computed with lookback
    * windows on train rows cannot overlap the test period (the leak a
    * plain temporal split still carries). Returns the three-row summary
    * (split, n_rows, day-granular min/max) the gate hashes — the
    * straddle audit (train max and test min bracket the full embargo
    * width) reads directly off those bounds.
    *
    * Shape: one pure-projection labeling pass + one 3-key
    * map-side-combined aggregate. Nothing shuffles but three rows.
    */
  def timeSplitEmbargo(
      df: DataFrame,
      tsCol: String,
      cutoff: String,
      embargoDays: Int): DataFrame = {
    require(embargoDays >= 0, s"embargoDays must be >= 0, got $embargoDays")
    // cutoff is interpolated into SQL text — validate the shape so a
    // quote or malformed literal fails loudly here, not as expression
    // injection or a confusing parse error (the pseudonymize salt rule)
    // accepts the full shape Spark's timestamp'...' literal does for the
    // common forms: date-only, space- or T-separated time, optional
    // fractional seconds (ADVICE r15: the earlier date/space-only regex
    // silently narrowed the contract for ISO-'T' and sub-second callers)
    require(cutoff.matches("""\d{4}-\d{2}-\d{2}([ T]\d{2}:\d{2}:\d{2}(\.\d{1,9})?)?"""),
      s"cutoff must be 'yyyy-MM-dd' optionally followed by ' HH:mm:ss' or " +
        s"'THH:mm:ss' with optional fractional seconds, got '$cutoff'")
    df.where(col(tsCol).isNotNull)
      .selectExpr(tsCol,
        s"""case when $tsCol < timestamp'$cutoff' then 'train'
           |     when $tsCol < timestamp'$cutoff' + interval $embargoDays days then 'embargo'
           |     else 'test' end as split""".stripMargin)
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(tsCol).cast("date")).cast("string").as("min_day"),
        max(col(tsCol).cast("date")).cast("string").as("max_day"))
      .orderBy(col("split"))
  }

  /** Per-epoch data-loader order: a fresh deterministic permutation per
    * epoch, laid out the way distributed readers actually consume data —
    * `shards` parallel streams, each internally ordered by an
    * epoch-seeded hash. A global `ORDER BY hash` would be one total sort
    * (single-partition bottleneck at corpus scale); per-shard ranking is
    * `shards`-way parallel and each reader's order is still a uniform
    * epoch-dependent shuffle (same shard-then-order shape as
    * `pack_sequences`). Epoch 0 and epoch 1 orders are unrelated;
    * re-running either reproduces it bit-for-bit.
    */
  def epochOrder(
      documents: DataFrame,
      epoch: Int = 0,
      shards: Int = 32): DataFrame = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val h = TextOps.md5Long64(s"concat('$epoch:', cast(doc_id as string))")
    documents
      .selectExpr("doc_id", s"$h % $shards as shard", s"$h as h")
      .selectExpr("doc_id", "shard",
        "row_number() over (partition by shard order by h, doc_id) as shard_rank")
  }

  /** Deterministic k-per-stratum sample, skew-immune.
    *
    * CONTRACT (narrower than a generic window-rank sample — enforced or
    * stated here, not buried in the implementation):
    *  - `keyExpr` must resolve to an INTEGRAL column (checked at plan
    *    time, fails fast) — it is the join-back identity, not just a
    *    tiebreak, so a lossy string→bigint cast is never silently
    *    applied;
    *  - `keyExpr` must be unique within its stratum: a duplicated
    *    (stratum, key) pair would join back to multiple rows and
    *    duplicate output;
    *  - rows with NULL `keyExpr` are dropped (no identity to join back
    *    on, no hash to order by) — unsampleable, not sampled-last.
    * Every id column this library samples by satisfies all three.
    */
  def stratifiedSample(
      df: DataFrame,
      stratumCol: String,
      keyExpr: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // fail fast on a non-integral key: under ANSI a bad cast would fail
    // mid-job, under legacy cast it would silently NULL-drop every row
    val keyType = df.selectExpr(keyExpr).schema.head.dataType
    require(
      Seq("byte", "short", "integer", "long").contains(keyType.typeName),
      s"stratifiedSample keyExpr `$keyExpr` must be integral (the join-back " +
        s"identity); got ${keyType.typeName}")
    // Skew-immune form ([[capPerSource]]'s idiom, round 10 — the former
    // `row_number() OVER (PARTITION BY stratum)` put the dominant
    // stratum, e.g. lang='en' ≈ most of a crawl, in ONE unsplittable
    // window partition): per stratum keep the k smallest (hash, key)
    // pairs via the map-side-combined TopKAggregator — the exchange
    // carries ≤ k rows per (stratum, input partition) — then BROADCAST
    // the k·|strata| picks back; the corpus itself never shuffles at
    // all. The 52-bit hash fits a double exactly, so the (−hash, key)
    // aggregator order is bit-identical to the oracle's
    // `ORDER BY hash % 2^52, key` window. `keyExpr` must be integral and
    // unique within its stratum (it is the join-back identity, not just
    // a tiebreak) — true of every id column this library samples by.
    val spark = df.sparkSession
    import spark.implicits._
    // NULL keys are unsampleable (no identity to join back on, no hash
    // to order by) and are dropped — stated contract, and required: the
    // primitive-Long encoder below would otherwise throw at runtime
    val picks = df
      .selectExpr(
        s"cast($stratumCol as string) as _s",
        s"cast($keyExpr as bigint) as _k",
        s"${TextOps.md5Long64(s"cast($keyExpr as string)")} % 4503599627370496L as _h52")
      .where(col("_k").isNotNull)
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapValues(t => (-t._3.toDouble, t._2)) // TopK keeps LARGEST = smallest hash
      .agg(new graft.functions.TopKAggregator(k).toColumn.name("ks"))
      .toDF("_s", "_ks")
      .select(col("_s"), explode(col("_ks")).as("_k"))
    df.join(broadcast(picks),
      expr(s"cast($stratumCol as string) <=> _s and cast($keyExpr as bigint) = _k"))
      .drop("_s", "_k")
  }

  /** Weight-proportional sample WITHOUT replacement via priority sampling
    * (Duffield–Lund–Thorup 2007): each row gets priority q = w/u for a
    * per-row uniform u ∈ (0,1]; the k highest-priority rows are the
    * sample, and with τ = the (k+1)-th priority, ŵ = max(w, τ) is an
    * unbiased estimator of each kept row's weight contribution — so
    * downstream subset-sums over the sample estimate corpus totals
    * without a second pass.
    *
    * Chosen over Efraimidis–Spirakis (u^(1/w) keys) deliberately: E-S
    * needs ln/pow, whose libm results differ by ulps across engines; the
    * priority key is ONE IEEE division on a hash-derived uniform, so the
    * sample AND the estimator are bit-reproducible in the DuckDB oracle,
    * under task retries, and across repartitioning. u is derived from a
    * 60-bit md5 prefix of the key: u = (h+1)/2^60 ∈ (0, 1].
    *
    * Scale shape: the top-(k+1) is per-partition top-k + a k-sized merge
    * (TakeOrderedAndProject — never a full sort or shuffle of the corpus),
    * and τ rides back as a broadcast 1-row frame. k ≥ n degenerates to
    * keep-everything with ŵ = w (no row sacrificed to the threshold).
    *
    * @param keyExpr    SQL expression for the stable identity (also the
    *                   output `key` column and final sort key)
    * @param weightExpr SQL expression for a POSITIVE numeric weight
    */
  def prioritySample(df: DataFrame, keyExpr: String, weightExpr: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val h = TextOps.md5Long64(s"concat('ps:', cast($keyExpr as string))")
    val scored = df.selectExpr(
      s"$keyExpr as key",
      s"cast($weightExpr as double) as weight",
      s"cast($weightExpr as double) / ((cast($h as double) + 1.0d) / 1152921504606846976.0d) as q")
    val top = scored.orderBy(col("q").desc, col("key").desc).limit(k + 1)
    val tau = top.agg(min(col("q")).as("tau"), count(lit(1)).as("n_top"))
    top.crossJoin(broadcast(tau))
      .filter(col("n_top") <= k || col("q") > col("tau"))
      .select(
        col("key"),
        col("weight"),
        when(col("n_top") <= k, col("weight"))
          .otherwise(greatest(col("weight"), col("tau"))).as("w_hat"))
      .orderBy(col("key"))
  }

  /** Deterministic FIXED-SIZE uniform sample: the k rows with the
    * smallest seeded hash of the id (every engine and every retry picks
    * the same rows — the property `rand()`-based limits lack). The
    * rate-based twins ([[graft.ext.TextOps]]' sample_hash, the
    * stratified/weighted forms here) return a size that floats with the
    * corpus; an eval set or labeling batch needs exactly k. Plans as
    * TakeOrderedAndProject — per-partition top-k then a k-row merge,
    * never a global sort (PlanSpec-pinned).
    */
  def sampleFixedK(df: DataFrame, idCol: String, k: Int, seed: String = "sfk"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    df.where(col(idCol).isNotNull)
      .withColumn("_h",
        expr(graft.ext.TextOps.md5Long64(s"concat('$seed:', cast($idCol as string))")))
      .orderBy(col("_h"), col(idCol))
      .limit(k)
      .drop("_h")
  }

  /** Greedy maximum-coverage subset selection over word-3-gram shingles —
    * the submodular "pick the k docs that together cover the most
    * distinct content" selector (the greedy algorithm carries the
    * classic (1−1/e) guarantee; facility-location/coverage objectives
    * are the standard diversity-aware alternative to score-threshold
    * corpus selection). Round r scores every document by how many of its
    * shingles are NOT yet covered by rounds 1..r−1, picks the argmax
    * (ties to the smaller doc_id — total order), and adds its shingles
    * to the covered set.
    *
    * Scale shape: the shingle frame is (doc, shingle)-keyed and persisted
    * once; each round is one anti-join against the covered set (k·|picked
    * docs'| shingles — bounded by k·max-doc, broadcastable) plus one
    * aggregate; the only driver action is the 1-row argmax per round, k
    * rows total. k is required small (≤ 8) because the GATE oracle
    * unrolls the recursion; a production selector would loop further.
    */
  def coverageSelect(documents: DataFrame, k: Int = 3): DataFrame = {
    require(k >= 1 && k <= 8, s"k must be in [1,8], got $k")
    val spark = documents.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // shingles via posexplode + window leads, NOT the array-transform
    // shingleExpr: project collapsing re-inlines the split() into every
    // element_at of the transform (the quadratic-tokenize trap
    // ext/Dedup.scala documents — its fix is a compiled hash Expression,
    // but HERE the oracle needs the shingle STRINGS, so the window form
    // is the codegen-friendly equivalent; measured 7.4 s → ~1 s at sf0.1)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val sh = documents
      .where(col("text").isNotNull && col("doc_id").isNotNull)
      .select(col("doc_id"),
        posexplode(split(lower(col("text")), " ")).as(Seq("pos", "tok")))
      .withColumn("sh", concat(col("tok"), lit(" "),
        lead(col("tok"), 1).over(w), lit(" "), lead(col("tok"), 2).over(w)))
      .where(col("sh").isNotNull)
      .select(col("doc_id"), col("sh"))
      .distinct()
      .persist()
    try {
      val picks = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Long)]
      var pickedIds = Seq.empty[Long]
      var total = 0L
      var r = 1
      var exhausted = false
      while (r <= k && !exhausted) {
        val covered = sh.where(col("doc_id").isInCollection(pickedIds))
          .select(col("sh")).distinct()
        val remaining =
          if (pickedIds.isEmpty) sh
          else sh.join(covered, Seq("sh"), "left_anti")
        val best = remaining.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("gain"))
          .orderBy(col("gain").desc, col("doc_id"))
          .limit(1).collect()
        if (best.isEmpty) exhausted = true // everything covered: stop
        else {
          val (id, gain) = (best.head.getLong(0), best.head.getLong(1))
          total += gain
          picks += ((r, id, gain, total))
          pickedIds :+= id
          r += 1
        }
      }
      picks.toSeq.toDF("round", "doc_id", "gain", "covered_total")
    } finally {
      sh.unpersist()
      ()
    }
  }

  /** Rendezvous (highest-random-weight) shard assignment audit
    * (Thaler & Ravishankar, "Using Name-Based Mappings to Increase Hit
    * Rates", IEEE/ACM ToN 1998): each key lands on the shard with the
    * max of `shards` keyed hashes. Unlike `key % shards`, growing the
    * fleet to `shards + 1` moves ONLY the keys whose new-shard hash
    * beats their current max — an expected 1/(shards+1) of the corpus —
    * instead of reshuffling nearly everything, which is why it is the
    * placement function of choice for caches, shard maps and stateful
    * stream repartitioning at 100 TB.
    *
    * Output: one row per shard with its key count, its fill in ppm of a
    * perfectly even spread (exact integer division — balance proof),
    * and `n_moving`, the keys this shard cedes when shard `shards` is
    * added (the minimal-disruption proof; Σ n_moving ≈ n/(shards+1)).
    * Both assignments are computed in the SAME projection — per row,
    * `shards + 1` md5s and one lexicographic array_max, zero shuffle —
    * then one aggregate on the (bounded) shard id.
    */
  def rendezvousShards(df: DataFrame, keyExpr: String, shards: Int): DataFrame = {
    require(shards >= 2 && shards <= 1024, s"shards must be in [2,1024], got $shards")
    val wt = TextOps.md5Long64(
      s"concat('shard:', cast($keyExpr as string), ':', cast(sh as string))")
    // ONE hash sweep: both fleets read the same (shards+1)-entry weight
    // array — the base fleet as its length-`shards` prefix slice. The
    // two references are IDENTICAL subtrees, so codegen subexpression
    // elimination evaluates the transform (and its shards+1 md5s) once
    // per row; the earlier two-array form paid the sweep twice.
    val wts = s"transform(sequence(0, $shards), sh -> struct($wt as wt, sh as sh))"
    val assigned = df
      .where(expr(keyExpr).isNotNull)
      .select(
        expr(s"array_max(slice($wts, 1, $shards)).sh").as("shard"),
        expr(s"array_max($wts).sh").as("shard_plus"))
    val per = assigned
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_keys"),
        // a key moves on fleet growth iff the NEW shard's hash wins
        count(when(col("shard_plus") === shards, 1)).as("n_moving"))
    val tot = per.agg(sum(col("n_keys")).as("tot"))
    per.crossJoin(broadcast(tot))
      .select(
        col("shard"),
        col("n_keys"),
        col("n_moving"),
        expr(s"(n_keys * ${shards}L * 1000000L) div tot").as("fill_ppm"))
  }
}
