package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import TextOps.{md5Long64, shingleExpr}

/** Deduplication operators for training-data pipelines, in increasing
  * fuzziness: exact (hash groupBy), MinHash signatures + LSH bands,
  * SimHash, and n-gram Jaccard pairs. Embedding-cosine near-dup lives in
  * [[Similarity]].
  *
  * Scale shapes:
  *  - exact dedup is one hash-shuffle on a 64-bit key (never on the full
  *    text — a 100 TB corpus shuffles 8-byte keys, not documents);
  *  - MinHash/SimHash signatures are per-row projections (no shuffle);
  *    LSH banding then joins on band hash — candidate pairs only, never
  *    the full cross product;
  *  - Jaccard pairs join on shingle hash, so cost is Σ(bucket²) over
  *    shingle buckets, not n² over documents.
  */
object Dedup {

  /** Library storage hygiene: operators here pin NO block-manager storage.
    *
    * The signature projections below (shingle → md5 → k minhash / simhash
    * components) are higher-order-function expressions, which Catalyst
    * evaluates INTERPRETED (no whole-stage codegen, hence no common-
    * subexpression elimination): if the projection feeds a self-join
    * directly, project collapsing inlines the whole shingle+hash pipeline
    * into every derived column and every pushed `isnotnull(joinkey)`
    * filter, on every join side — a measured ~30× per-row recompute blowup.
    * Round 3 hid that behind `persist()`, which fixed the recompute but
    * leaked the cache for the session lifetime (the round-3 bench degraded
    * 16× on late queries from the accumulation).
    *
    * The Spark-first fix is [[computedOnce]]: force the projection through
    * a shuffle. Everything below an Exchange is computed exactly once per
    * row, the N identical subtrees on the join sides collapse to ONE via
    * exchange reuse, and shuffle files are job-scoped temporary state the
    * context cleaner removes — nothing outlives the query, no unpersist
    * choreography, and re-executing the returned frame is self-sufficient
    * at full speed.
    */
  private def computedOnce(df: DataFrame, key: String): DataFrame =
    df.repartition(col(key))

  /** Exact dedup: group documents by content hash; keep the smallest
    * doc_id as the canonical representative.
    */
  def exact(documents: DataFrame): DataFrame =
    documents
      .selectExpr("doc_id", s"${md5Long64("text")} as text_hash")
      .groupBy(col("text_hash"))
      .agg(min(col("doc_id")).as("keeper_doc_id"), count(lit(1)).as("n_copies"))

  /** Materialize the deduplicated corpus: keep exactly the lowest-doc_id
    * copy of each distinct text. Two hash-shuffles on the 64-bit content
    * hash (group + semi-join) — the documents themselves shuffle never.
    * This is the `dropDuplicates`-with-deterministic-winner form (plain
    * `dropDuplicates` keeps an arbitrary row, which can't be
    * oracle-checked and isn't reproducible across runs).
    */
  def keepFirstByText(documents: DataFrame): DataFrame = {
    val keepers = exact(documents).select(col("keeper_doc_id"))
    documents.join(keepers, col("doc_id") === col("keeper_doc_id"), "left_semi")
  }

  /** Universal-hash coefficients for deriving the k MinHash functions
    * from ONE base md5 per shingle: mh_i(x) = (A_i·(x mod 2³⁰) + B_i)
    * mod p. One md5 instead of k per shingle — at corpus scale the md5
    * is the dominant cost, so this is a ~k× saving on the hot path.
    * All arithmetic stays below 2⁶³ and is identical in DuckDB.
    */
  val MinhashP = 1073741789L // largest prime < 2^30
  def minhashA(i: Int): Long = 75437L + 2L * i // odd, < 2^17
  def minhashB(i: Int): Long = 13007L * (i + 1)

  /** Append MinHash components and LSH band hashes to `df` (which must
    * have a `text` column), KEEPING every original column — the streaming-
    * friendly form (watermark columns survive). Works on batch and
    * streaming DataFrames alike: pure per-row projection.
    */
  def withMinhashBands(df: DataFrame, k: Int = 8): DataFrame = {
    val mhCols = (0 until k).map { i =>
      s"array_min(transform(_hs, x -> (${minhashA(i)}L * (x % 1073741824L) + ${minhashB(i)}L) % ${MinhashP}L)) as mh$i"
    }
    val half = k / 2
    val band0 = (0 until half).map(i => s"mh$i").mkString("concat_ws(',', ", ", ", ")")
    val band1 = (half until k).map(i => s"mh$i").mkString("concat_ws(',', ", ", ", ")")
    // coalesce makes the band columns NON-NULLABLE: otherwise a downstream
    // equi-join on them makes Catalyst infer `isnotnull(band)` and push it
    // below these projections SUBSTITUTED — i.e. the whole interpreted
    // shingle+md5 pipeline re-evaluated per row inside a Filter, on every
    // join side (a measured ~10× blowup). The value never IS null here
    // (concat_ws over non-null minhash components), so semantics are
    // unchanged; the nullability bit alone kills the inferred filter.
    df
      .withColumn("_hs",
        graft.functions.HashFunctions.shingles3_hashed(split(col("text"), " ")))
      .selectExpr("*" +: mhCols: _*)
      .selectExpr("*",
        s"coalesce(${md5Long64(band0)}, 0L) as band0",
        s"coalesce(${md5Long64(band1)}, 0L) as band1")
      .drop("_hs")
  }

  /** The corpus as flat (doc_id, shingle_hash) rows: explode the distinct
    * 3-gram shingle set, THEN hash. Hashing a flat string column runs in
    * whole-stage codegen; the same md5 inside a `transform` lambda is
    * interpreted per element (lambda bodies never codegen) — measured ~3×
    * on the signature pipelines. `outer` keeps shingle-less docs (<3
    * tokens) as one null-hash row, matching the array form's null
    * signature for them.
    */
  private def shingleHashes(documents: DataFrame, outer: Boolean): DataFrame = {
    val hs = graft.functions.HashFunctions.shingles3_hashed(split(col("text"), " "))
    val toks = documents.withColumn("hs", hs)
    if (outer) toks.select(col("doc_id"), explode_outer(col("hs")).as("shingle_hash"))
    else toks.select(col("doc_id"), explode(col("hs")).as("shingle_hash"))
  }

  /** MinHash signatures (k hash functions over the distinct 3-gram
    * shingle set) plus LSH band hashes — two bands of k/2 rows each.
    * Docs sharing a band hash are near-dup candidates.
    *
    * Batch form: flat shingle hashes → `groupBy(doc_id)` with k `min`
    * aggregates. Everything is codegen'd and the mins partial-aggregate
    * map-side (k longs per doc per partition cross the wire, not shingle
    * lists), and the one exchange below the aggregate is what every
    * downstream self-join reuses. Values are bit-identical to the per-row
    * array form [[withMinhashBands]] (min over the same distinct-shingle
    * set; min is duplicate- and order-insensitive), which remains the
    * shuffle-free variant streaming needs.
    */
  def minhashSignatures(documents: DataFrame, k: Int = 8): DataFrame = {
    val mins = (0 until k).map { i =>
      min(expr(s"(${minhashA(i)}L * (shingle_hash % 1073741824L) + ${minhashB(i)}L) % ${MinhashP}L"))
        .as(s"mh$i")
    }
    val half = k / 2
    val band0 = (0 until half).map(i => s"mh$i").mkString("concat_ws(',', ", ", ", ")")
    val band1 = (half until k).map(i => s"mh$i").mkString("concat_ws(',', ", ", ", ")")
    shingleHashes(documents, outer = true)
      .groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      // coalesce: non-nullable band keys, so the self-joins below don't
      // infer isnotnull filters (see withMinhashBands)
      .selectExpr("*",
        s"coalesce(${md5Long64(band0)}, 0L) as band0",
        s"coalesce(${md5Long64(band1)}, 0L) as band1")
  }

  /** LSH candidate pairs: documents sharing either band hash, with their
    * estimated Jaccard (fraction of matching MinHash components).
    *
    * Deliberately NOT an `OR` join — Catalyst cannot hash-join a
    * disjunction and would fall back to a nested-loop over all n² pairs.
    * Instead: one equi-join per band, unioned, deduped. Each band join
    * shuffles on its band hash — the LSH contract (collisions only where
    * candidates are) holds at any scale.
    */
  def minhashCandidatePairs(documents: DataFrame, k: Int = 8): DataFrame = {
    // no explicit repartition: the signature aggregate ends in its own
    // exchange, which ReuseExchange collapses across the four join sides
    val sig = minhashSignatures(documents, k)
    val matches = (0 until k)
      .map(i => when(col(s"a.mh$i") === col(s"b.mh$i"), 1).otherwise(0))
      .reduce(_ + _)
    def bandJoin(band: String) =
      sig.alias("a")
        .join(sig.alias("b"),
          col(s"a.$band") === col(s"b.$band") && col("a.doc_id") < col("b.doc_id"))
        .select(
          col("a.doc_id").as("a_id"),
          col("b.doc_id").as("b_id"),
          (matches.cast("double") / lit(k.toDouble)).as("est_jaccard"))
    bandJoin("band0").unionAll(bandJoin("band1")).distinct()
  }

  /** INCREMENTAL near-dup screening — the crawl-update shape: flag each
    * NEW-batch document that is an LSH candidate of the EXISTING corpus
    * (shares a MinHash band with any existing doc), with the smallest
    * matching existing id as the verdict's witness. This is the one-sided
    * form every production dedup runs day to day: the existing corpus is
    * the INDEX side (band-partitioned once, at rest), the new batch is
    * small, and new×new / existing×existing pairs are never generated —
    * the join cost is |batch| × bucket, not Σ(bucket²) over the corpus.
    *
    * Plan: both sides are filters of ONE signature frame, so the corpus
    * is scanned and min-hashed once (the signature aggregate's exchange
    * is reused by all four band-join sides, same as
    * [[minhashCandidatePairs]]); per band the match is an equi-join.
    * `isNew` marks the batch membership (here a deterministic predicate;
    * in production the new shard's partition).
    */
  def incrementalDedup(
      documents: DataFrame,
      isNewExpr: String = "doc_id % 5 = 4",
      k: Int = 8): DataFrame = {
    val sig = minhashSignatures(documents, k)
    val existing = sig.filter(!expr(isNewExpr))
    val fresh = sig.filter(expr(isNewExpr))
    def bandJoin(band: String) =
      fresh.alias("n")
        .join(existing.alias("e"), col(s"n.$band") === col(s"e.$band"))
        .select(col("n.doc_id").as("doc_id"), col("e.doc_id").as("match_id"))
    val matches = bandJoin("band0").unionAll(bandJoin("band1"))
      .groupBy(col("doc_id"))
      .agg(min(col("match_id")).as("dup_of"))
    fresh.select(col("doc_id"))
      .join(matches, Seq("doc_id"), "left")
      .select(col("doc_id"), col("dup_of"),
        col("dup_of").isNotNull.cast("int").as("is_known_dup"))
  }

  /** Incremental dedup with a VERIFY stage — the crawl-update twin of
    * the end-to-end fuzzy dedup (`fuzzy_dedup_survivors`), at a
    * TIGHTENED similarity bar: a new-batch document is a duplicate iff
    * it shares an LSH band with an existing doc AND at least `minMatch`
    * of the k minhash components agree (the default ≥ 6 of 8 ⇒
    * estimated Jaccard ≥ 0.75).
    *
    * `minMatch` must EXCEED the band width k/2 to mean anything: band
    * agreement is defined by k/2 equal components, so any threshold ≤
    * k/2 is subsumed by candidacy itself (the standard ≥ 0.5 accept
    * rule of the whole-corpus composition coincides with band agreement
    * — there it only removes band-hash collisions). This operator is
    * the knob for the stricter regime: candidates at estimated Jaccard
    * in [0.5, minMatch/k) are band-confirmed but verify-REJECTED.
    *
    * The verify is a FILTER inside the band join, not a later stage: the
    * signature components are already columns on both join sides, so
    * confirming a candidate costs k comparisons in the join's own
    * codegen — no second join, no extra exchange, and candidates that
    * fail verification never reach the aggregate. Cost shape is
    * [[incrementalDedup]]'s: one shared signature exchange, one-sided
    * |batch| × bucket band joins, never corpus × corpus.
    */
  def incrementalFuzzyDedup(
      documents: DataFrame,
      isNewExpr: String = "doc_id % 5 = 4",
      k: Int = 8,
      minMatch: Int = 6): DataFrame = {
    require(minMatch >= 1 && minMatch <= k, s"minMatch in [1, $k], got $minMatch")
    val sig = minhashSignatures(documents, k)
    val existing = sig.filter(!expr(isNewExpr))
    val fresh = sig.filter(expr(isNewExpr))
    val nMatch = (0 until k)
      .map(i => when(col(s"n.mh$i") === col(s"e.mh$i"), 1).otherwise(0))
      .reduce(_ + _)
    // shingle-less docs (all-null components) share ONE constant band
    // value but can never reach minMatch (null === null counts 0), so
    // both join sides drop them — a pure optimization (verdicts are
    // unchanged: they surface as never-duplicate via the left join
    // below) that removes a |shingleless|² candidate blowup on corpora
    // with many empty/short pages
    def bandJoin(band: String) =
      fresh.where(col("mh0").isNotNull).alias("n")
        .join(existing.where(col("mh0").isNotNull).alias("e"),
          col(s"n.$band") === col(s"e.$band"))
        .filter(nMatch >= minMatch)
        .select(col("n.doc_id").as("doc_id"), col("e.doc_id").as("match_id"))
    val matches = bandJoin("band0").unionAll(bandJoin("band1"))
      .groupBy(col("doc_id"))
      .agg(min(col("match_id")).as("dup_of"))
    fresh.select(col("doc_id"))
      .join(matches, Seq("doc_id"), "left")
      .select(col("doc_id"), col("dup_of"),
        col("dup_of").isNotNull.cast("int").as("is_known_dup"))
  }

  /** The signature index rows [[incrementalFuzzyDedupSink]] maintains for
    * batches BEFORE `batchId`: one row per (survivor, band), partitioned
    * by (batch_id, bucket). The `batch_id < batchId` filter lands on the
    * partition column, so a replayed batch never probes rows its own
    * crashed attempt wrote (self-match would flag every replayed doc as
    * a duplicate of itself). Empty-store contract: before any batch
    * commits, the index of zero batches is an empty frame with the right
    * schema, not a path error.
    */
  def fuzzyIndex(
      spark: org.apache.spark.sql.SparkSession,
      indexDir: String,
      batchId: Long,
      k: Int): DataFrame = {
    val mh = (0 until k).map(i => s"mh$i BIGINT").mkString(", ")
    val schema =
      s"doc_id BIGINT, bi INT, band BIGINT, $mh, batch_id BIGINT, bucket INT"
    val p = new org.apache.hadoop.fs.Path(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(schema))
    else
      spark.read.schema(schema).parquet(indexDir)
        .where(col("batch_id") < batchId)
  }

  /** STREAMING twin of [[incrementalFuzzyDedup]] — the crawl-update loop
    * run continuously: each arriving micro-batch screens against the
    * accumulated corpus INDEX (LSH band candidacy + the ≥`minMatch`-of-k
    * component verify INLINE in the band join), writes per-doc verdicts,
    * and appends its survivors' signature rows to the index so later
    * batches screen against them. Batch N's verdicts equal the batch
    * operator's with batch N as the new side and the accumulated
    * SURVIVOR corpus as the existing side — survivors, not the raw
    * union: a doc flagged duplicate never enters the index (its witness
    * already stands near it in signature space), which is also what
    * keeps the index from re-accumulating every near-copy a crawl
    * re-fetches. The StreamingSpec parity pin iterates exactly that
    * reference.
    *
    * Index layout and cost shape: the index holds one row per (survivor,
    * band) — doc_id, the k signature components (the verify needs them on
    * the probe's other side), the band hash — partitioned by
    * `(batch_id, bucket)` where `bucket = band mod bandBuckets`. The
    * probe side (the micro-batch, exploded to 2 band rows per doc) is
    * BROADCAST into the index scan, so the corpus-sized side never
    * shuffles — per-batch cost is |batch| × bucket occupancy, the
    * [[incrementalDedup]] shape — and the batch's bucket set (bounded by
    * `bandBuckets`, so always a driver-safe handful of ints) is pushed
    * into the index read as a static PARTITION filter: a small batch
    * opens only the index partitions its bands hash into, instead of
    * paying a full index scan per micro-batch (DPP does not fire for
    * this join shape — measured — so the explicit filter is what makes
    * trickle-arrival screening sublinear in corpus size; raise
    * `bandBuckets` to sharpen it for small-batch streams).
    * Signature rows are ~10 longs per doc: the INDEX is O(corpus) by
    * design (it IS the corpus's dedup key set, unlike the trailing-window
    * STATE of [[graft.ext.Similarity.hotSwapDedupSink]]) — at rest as
    * parquet, never resident in executor memory, compactable with
    * [[graft.io.Maintenance.compactParquet]].
    *
    * Crash/replay contract (the [[graft.io.Sinks]] idiom): foreachBatch
    * may re-deliver the last batch id; verdicts and index rows both land
    * with delete-then-dynamic-overwrite on `batch_id=N`, and the probe
    * reads strictly `batch_id < N` — a replay sees exactly the pre-crash
    * prior state and rewrites its own partitions idempotently.
    */
  def incrementalFuzzyDedupSink(
      indexPath: String,
      verdictsPath: String,
      k: Int = 8,
      minMatch: Int = 6,
      bandBuckets: Int = 64): (DataFrame, Long) => Unit = {
    require(minMatch > k / 2 && minMatch <= k,
      s"minMatch must be in (k/2, k] = (${k / 2}, $k] (band agreement already " +
        s"implies k/2 matching components), got $minMatch")
    require(bandBuckets >= 1, s"bandBuckets must be >= 1, got $bandBuckets")
    (batch, batchId) => {
      val spark = batch.sparkSession
      val mhNames = (0 until k).map(i => s"mh$i")
      val sig = withMinhashBands(batch.select(col("doc_id"), col("text")), k)
        .persist()
      try {
        // `bi` tags which band a row came from: the batch twin only ever
        // compares band0-to-band0 and band1-to-band1, so the exploded
        // form must carry the band index into the join key or a (however
        // unlikely) cross-band hash collision would break exact parity
        // Shingle-less docs (< 3 tokens, or null text) carry all-null
        // minhash components, which hash to ONE constant band value —
        // and since null components can never reach minMatch, every such
        // doc is an eternal survivor. Left in the index they band-join
        // every later batch's shingle-less docs against the whole
        // accumulated class: 2·s·S join rows per batch with S growing
        // forever, in one ever-skewing bucket — exactly the unbounded
        // shape this sink exists to prevent. They are excluded from the
        // probe AND (therefore) the index; their VERDICTS still emit
        // (never-duplicate, dup_of null) via the outer left join below,
        // identical to what the band join would have concluded.
        val probe = sig
          .where(col("mh0").isNotNull)
          .selectExpr(
            "doc_id" +:
              "inline(array(struct(0 as bi, band0 as band), struct(1 as bi, band1 as band)))" +:
              mhNames: _*)
          .withColumn("bucket",
            pmod(col("band"), lit(bandBuckets.toLong)).cast("int"))
          .persist()
        try {
          // push the batch's bucket set into the index read as a
          // PARTITION filter: the set is bounded by bandBuckets (a few
          // hundred ints at most), so this driver action is always
          // bounded — the connectedComponents-count() class of justified
          // collect, not a data collect — and a SMALL batch (the
          // trickle/steady-state arrival shape) then opens only the
          // partitions its bands hash into instead of scanning the whole
          // accumulated index. A batch touching every bucket degrades to
          // the vacuous filter (the full screen IS the work then). This
          // is static partition pruning the planner applies at parquet
          // listing time — measured necessary: DPP does NOT fire for
          // this broadcast join (no selective filter on the probe side).
          val touched = probe.select(col("bucket")).distinct()
            .collect().map(_.getInt(0)).sorted
          val index = fuzzyIndex(spark, indexPath, batchId, k)
            .where(col("bucket").isin(touched.map(Int.box): _*))
          val nMatch = mhNames
            .map(m => when(col(s"e.$m") === col(s"n.$m"), 1).otherwise(0))
            .reduce(_ + _)
          val matches = index.alias("e")
            .join(broadcast(probe.alias("n")),
              col("e.bucket") === col("n.bucket") &&
                col("e.bi") === col("n.bi") && col("e.band") === col("n.band"))
            .filter(nMatch >= minMatch)
            .select(col("n.doc_id").as("doc_id"), col("e.doc_id").as("match_id"))
            .groupBy(col("doc_id"))
            .agg(min(col("match_id")).as("dup_of"))
          val verdicts = sig.select(col("doc_id"))
            .join(matches, Seq("doc_id"), "left")
            .select(col("doc_id"), col("dup_of"),
              col("dup_of").isNotNull.cast("int").as("is_known_dup"))
            .persist()
          try {
            // repartition on the partition column before the two-level
            // partitioned write (the Maintenance.bucketWrite lesson):
            // without it every write task emits a file into every bucket
            // dir it touches — tasks × buckets small files per batch,
            // measured 19→26 s/batch and 178 MB of index for 80k docs in
            // the bulk-arrival probe leg. One shuffle of the batch's own
            // signature rows (tiny) buys one file per touched bucket.
            val survBands = probe
              .join(verdicts.where(col("is_known_dup") === 0).select(col("doc_id")),
                Seq("doc_id"), "left_semi")
              .repartition(col("bucket"))
            Seq(
              (verdicts, verdictsPath, Seq("batch_id")),
              (survBands, indexPath, Seq("batch_id", "bucket"))
            ).foreach { case (df, dir, parts) =>
              // replay hygiene BEFORE the write (the hotSwapDedupSink
              // rationale): dynamic overwrite only replaces partitions
              // the replay TOUCHES — clear this batch's own partition
              // first so a shrunken replay leaves no phantom rows
              val part = new org.apache.hadoop.fs.Path(s"$dir/batch_id=$batchId")
              val fs = part.getFileSystem(spark.sparkContext.hadoopConfiguration)
              if (fs.exists(part)) fs.delete(part, true)
              df.withColumn("batch_id", lit(batchId))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(parts: _*).parquet(dir)
            }
          } finally verdicts.unpersist()
        } finally probe.unpersist()
      } finally sig.unpersist()
    }
  }

  /** Bloom-screened EXACT incremental dedup — the screen-then-verify
    * pattern for deduplicating an arriving batch against a corpus too big
    * to join outright. The existing corpus's content hashes aggregate
    * into ONE Bloom filter (Spark's native `BloomFilterAggregate`, built
    * MAP-SIDE by partial aggregation — the corpus never shuffles); the
    * new batch keeps only rows the filter might contain (true dups plus
    * the fpp tail); and the surviving sliver is BROADCAST back into the
    * corpus for the exact confirm join. Bloom filters have no false
    * negatives and the confirm join removes the false positives, so the
    * output is EXACTLY the content-hash incremental dedup — which is what
    * lets a probabilistic structure sit under the DuckDB hash gate.
    *
    * Scale shape: ZERO corpus exchanges (one-row bloom aggregate + a
    * broadcast-probe join), versus the hash-index build's full corpus
    * shuffle. The batch side shuffles nothing bigger than itself. The
    * blob is `numBits/8` bytes on the driver and in the subquery
    * broadcast — size it ~8–10 bits per existing item (fpp ≈ 1–2%); at
    * corpus scales past broadcastable blobs, shard the screen by hash
    * prefix (same contract per shard).
    *
    * The Bloom expressions are Catalyst-internal (Spark exposes them only
    * to its own runtime-filter rewrite); [[graft.functions]]' shim
    * constructs them the same way it builds the custom expressions, and
    * the blob reaches `might_contain` as a scalar subquery — the form the
    * expression requires.
    */
  def bloomScreenDedup(
      documents: DataFrame,
      isNewExpr: String = "doc_id % 5 = 4",
      expectedItems: Long = 1L << 20,
      numBits: Long = 1L << 23): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery}
    import org.apache.spark.sql.graftshim.GraftShim
    val sig = documents.selectExpr(
      "doc_id", s"${md5Long64("text")} as h", s"cast(($isNewExpr) as boolean) as is_new")
    val existing = sig.filter(!col("is_new"))
    val fresh = sig.filter(col("is_new"))
    val bloom = existing.agg(GraftShim.column(
      new BloomFilterAggregate(GraftShim.expression(col("h")),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression()).as("bf"))
    val screened = fresh.filter(GraftShim.column(BloomFilterMightContain(
      ScalarSubquery(bloom.queryExecution.analyzed),
      GraftShim.expression(col("h")))))
    val matches = existing
      .join(broadcast(screened.select(col("h"), col("doc_id").as("n_id"))), Seq("h"))
      .groupBy(col("n_id"))
      .agg(min(col("doc_id")).as("dup_of"))
      .select(col("n_id").as("doc_id"), col("dup_of"))
    fresh.select(col("doc_id"))
      .join(matches, Seq("doc_id"), "left")
      .select(col("doc_id"), col("dup_of"),
        col("dup_of").isNotNull.cast("int").as("is_known_dup"))
  }

  /** SHARDED Bloom screen — [[bloomScreenDedup]] past the size where ONE
    * blob is practical. A single Bloom filter is one contiguous object:
    * past ~2 GB it physically cannot serialize into a broadcast/subquery
    * result (JVM array + serialization limits), and long before that one
    * huge allocation per executor is hostile. Sharding by hash prefix
    * (`pmod(h, shards)`) splits the screen into `shards` independent
    * blobs, each sized `numBits/shards` — same TOTAL memory, but every
    * object stays under the per-blob walls, so the screen scales to
    * corpus cardinalities one blob cannot reach. Output contract is
    * IDENTICAL to [[bloomScreenDedup]] (exact under the hash gate: the
    * per-shard filters have no false negatives, the confirm join removes
    * false positives).
    *
    * Scale shape (same as unsharded): the corpus never shuffles and is
    * scanned ONCE — all `shards` blobs build in one aggregate pass as
    * conditional map-side aggregates (`CASE WHEN pmod(h,k)=s THEN h END`
    * routes each hash to exactly one blob; the aggregate skips NULLs),
    * reach the probe as ONE scalar subquery returning a struct of blobs
    * (one subquery = one execution — k separate subqueries would re-run
    * the corpus aggregate k times), and each probe row evaluates
    * `might_contain` against ONLY its own shard's field (Spark's
    * bloom-probe expression accepts a struct field over a scalar
    * subquery for exactly this shape). No block-manager storage pinned,
    * honoring the file-head contract.
    */
  def bloomScreenDedupSharded(
      documents: DataFrame,
      isNewExpr: String = "doc_id % 5 = 4",
      shards: Int = 4,
      expectedItems: Long = 1L << 20,
      numBits: Long = 1L << 23): DataFrame = {
    require(shards >= 1 && shards <= 1024, s"shards in [1,1024], got $shards")
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, GetStructField, Literal, ScalarSubquery}
    import org.apache.spark.sql.graftshim.GraftShim
    val sig = documents.selectExpr(
      "doc_id", s"${md5Long64("text")} as h", s"cast(($isNewExpr) as boolean) as is_new")
    val existing = sig.filter(!col("is_new"))
    val fresh = sig.filter(col("is_new"))
    val perShardItems = math.max(1L, expectedItems / shards)
    val perShardBits = math.max(64L, numBits / shards)
    val blobCols = (0 until shards).map { s =>
      GraftShim.column(new BloomFilterAggregate(
        GraftShim.expression(when(pmod(col("h"), lit(shards)) === s, col("h"))),
        Literal(perShardItems), Literal(perShardBits)).toAggregateExpression()).as(s"bf$s")
    }
    val blooms = existing.agg(blobCols.head, blobCols.tail: _*)
      .select(struct((0 until shards).map(s => col(s"bf$s")): _*).as("bfs"))
    val sq = ScalarSubquery(blooms.queryExecution.analyzed)
    // per-row dispatch: probe only this row's shard. NULL h selects no
    // branch → false → not screened, matching the unsharded NULL path.
    val member = (0 until shards).map { s =>
      (pmod(col("h"), lit(shards)) === s,
        GraftShim.column(BloomFilterMightContain(
          GetStructField(sq, s, Some(s"bf$s")),
          GraftShim.expression(col("h")))))
    }.foldRight(lit(false)) { case ((cond, v), acc) => when(cond, v).otherwise(acc) }
    val screened = fresh.filter(member)
    val matches = existing
      .join(broadcast(screened.select(col("h"), col("doc_id").as("n_id"))), Seq("h"))
      .groupBy(col("n_id"))
      .agg(min(col("doc_id")).as("dup_of"))
      .select(col("n_id").as("doc_id"), col("dup_of"))
    fresh.select(col("doc_id"))
      .join(matches, Seq("doc_id"), "left")
      .select(col("doc_id"), col("dup_of"),
        col("dup_of").isNotNull.cast("int").as("is_known_dup"))
  }

  /** STREAMING twin of the Bloom screen — the stateless reference-set
    * filter for an ingest stream: drop every arrival whose content hash
    * the reference Bloom filter might contain (already-ingested corpus,
    * eval benchmarks, known-bad documents), keep the rest. This is
    * [[decontaminateStream]]'s scale path: the broadcast-array form is
    * eval-set-sized, the blob is `numBits/8` bytes for ANY reference
    * cardinality.
    *
    * Direction of error is the safe one for decontamination: Bloom
    * filters have no false negatives, so nothing in the reference ever
    * survives; the fpp tail means a small fraction of CLEAN arrivals is
    * conservatively dropped (size `numBits` ~8–10 bits per reference item
    * for fpp ≈ 1–2%). NULL text cannot be a member — it is kept.
    *
    * The blob reaches the stream as a scalar subquery over the static
    * reference (probed: IncrementalExecution plans it per micro-batch);
    * `reference.persist()` before building the stream makes those
    * per-batch re-plans read the cached aggregate instead of re-scanning.
    */
  def bloomScreenStream(
      stream: DataFrame,
      reference: DataFrame,
      expectedItems: Long = 1L << 20,
      numBits: Long = 1L << 23): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery}
    import org.apache.spark.sql.graftshim.GraftShim
    val bloom = reference.selectExpr(s"${md5Long64("text")} as h")
      .agg(GraftShim.column(
        new BloomFilterAggregate(GraftShim.expression(col("h")),
          Literal(expectedItems), Literal(numBits)).toAggregateExpression()).as("bf"))
    val member = GraftShim.column(BloomFilterMightContain(
      ScalarSubquery(bloom.queryExecution.analyzed),
      GraftShim.expression(expr(md5Long64("text")))))
    // coalesce: an empty reference (NULL blob) or NULL text yields a NULL
    // membership verdict — both mean "cannot be a member", so KEEP
    stream.filter(coalesce(!member, lit(true)))
  }

  /** SimHash over the token multiset: hash each token once, then per bit
    * sum +1/-1 weights and keep the sign. Pure per-row projection — no
    * shuffle, no UDF. The bit-packing runs in the codegen'd
    * [[graft.functions.SimHashBits]] expression (one primitive loop
    * instead of `bits` interpreted higher-order `aggregate` passes).
    * Max useful width is 60 — the token hashes are 60-bit md5 prefixes,
    * so signature bits above 59 would be constant.
    */
  def simhash(documents: DataFrame, bits: Int = 16): DataFrame =
    // coalesce: non-nullable output, so band equi-joins don't infer an
    // isnotnull filter that re-evaluates the pipeline (see withMinhashBands)
    documents
      .withColumn("toks", split(col("text"), " "))
      .withColumn("hs", graft.functions.HashFunctions.md5_long64_array(col("toks")))
      .select(col("doc_id"),
        coalesce(graft.functions.SimHashFunctions.simhash_bits(col("hs"), bits),
          lit(0L)).as("simhash"))

  /** SimHash near-duplicate pairs within a Hamming radius, via the
    * pigeonhole band trick over a 60-bit signature: 4 bands of 15 bits;
    * two signatures within Hamming distance 3 must agree on ≥1 band, so
    * the candidate space is 4 equi-joins on band value — 2¹⁵ = 32,768
    * buckets per band, making each join Σ(bucket²) ≈ n²/32768 under a
    * uniform signature spread, never an n² scan. (A nibble banding of a
    * 16-bit signature would give only 16 buckets/band — quadratic with a
    * constant.) Exact `bit_count(xor)` re-check filters the candidates.
    * Width is 60, not 64, because the token hashes are 60-bit md5
    * prefixes; the pigeonhole argument is width-agnostic as long as the
    * band count exceeds maxHamming.
    */
  def simhashPairs(documents: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sig = computedOnce(simhash(documents, bits = 60), "doc_id")
    // the hamming filter sits INSIDE each band join (Catalyst pushes it
    // into the join residual), so the cross-band distinct only sees the
    // few surviving near-dups, not every band collision
    val pairs = (0 until 4).map { i =>
      val band = sig.selectExpr("doc_id", "simhash",
        s"(shiftright(simhash, ${15 * i}) & 32767L) as band")
      val a = band.selectExpr("doc_id as a_id", "simhash as a_sh", "band")
      val b = band.selectExpr("doc_id as b_id", "simhash as b_sh", "band as b_band")
      a.join(b, col("band") === col("b_band") && col("a_id") < col("b_id"))
        .selectExpr("a_id", "b_id",
          "cast(bit_count(a_sh ^ b_sh) as int) as hamming")
        .filter(col("hamming") <= maxHamming)
    }.reduce(_ unionAll _).distinct()
    pairs
  }

  /** Top-k most similar document pairs by distinct-3-gram Jaccard.
    * Exploded shingle-hash join: pairs only materialize where a shingle
    * is shared. Deterministic order (jaccard desc, ids asc).
    *
    * TEST-ONLY baseline: the per-shingle `collect_list` is unbounded — a
    * boilerplate shingle appearing in f documents materializes an
    * f-element array on one task and f² pairs. The production form is
    * [[ngramJaccardCapped]], which bounds every bucket at maxDf²; this
    * uncapped variant exists to validate it at small scale, and is
    * package-private so the capped form is the only public entry point
    * (both declared queries run the capped form).
    */
  private[graft] def ngramJaccardPairs(documents: DataFrame, topK: Int = 50): DataFrame = {
    // one exchange below both consumers (sizes + buckets): the flat
    // codegen'd shingle-hash projection runs exactly once per row
    val sh = computedOnce(shingleHashes(documents, outer = false), "doc_id")
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    // Pair generation without a self-join: group doc ids per shingle, emit
    // ordered combinations per bucket. One shuffle on the shingle hash,
    // each input row scanned once — at corpus scale this is the difference
    // between 1× and 2× full-corpus hashing, and the bucket list makes
    // shingle-frequency skew observable/cappable.
    val common = sh
      .groupBy(col("shingle_hash"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .selectExpr(
        """explode(flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids) - i - 1), y -> struct(x as a_id, y as b_id))
          |))) as p""".stripMargin)
      .select(col("p.a_id").as("a_id"), col("p.b_id").as("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("n_common"))
    val ranked = common
      .join(sizes.withColumnRenamed("doc_id", "a_id").withColumnRenamed("n_sh", "a_n"), "a_id")
      .join(sizes.withColumnRenamed("doc_id", "b_id").withColumnRenamed("n_sh", "b_n"), "b_id")
      .selectExpr(
        "a_id", "b_id", "n_common",
        "cast(n_common as double) / cast(a_n + b_n - n_common as double) as jaccard")
      .orderBy(col("jaccard").desc, col("a_id"), col("b_id"))
      .limit(topK)
    ranked
  }

  /** Benchmark-contamination check: for every corpus document, count the
    * distinct 3-gram shingles it shares with a held-out benchmark set
    * (here: `doc_id % benchModulus == 0` stands in for the eval-set
    * membership list). The decontamination step every training corpus
    * needs — a doc overlapping an eval set inflates benchmark scores.
    *
    * Scale shape: the benchmark side is eval-set-sized (tiny next to a
    * 100 TB corpus), so its distinct shingle hashes broadcast and the
    * corpus side is ONE scan + one aggregation by doc_id — the corpus is
    * never shuffled on the shingle key. Flat shingle hashing is the same
    * codegen'd [[shingleHashes]] path the dedup operators use.
    */
  def contamination(
      documents: DataFrame,
      benchModulus: Int = 50,
      flagAt: Int = 3): DataFrame =
    contaminationCounts(documents, benchModulus, flagAt).orderBy(col("doc_id"))

  /** [[contamination]] without the presentation sort — the composition
    * form: a pipeline that only semi-joins the clean doc_ids must not pay
    * a global sort for ordering it immediately discards.
    */
  def contaminationCounts(
      documents: DataFrame,
      benchModulus: Int = 50,
      flagAt: Int = 3): DataFrame = {
    val flat = shingleHashes(documents, outer = false)
    val benchShingles = flat.filter(col("doc_id") % benchModulus === 0)
      .select(col("shingle_hash")).distinct()
    val shared = flat.filter(col("doc_id") % benchModulus =!= 0)
      .join(broadcast(benchShingles), "shingle_hash")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
    documents.filter(col("doc_id") % benchModulus =!= 0)
      .select(col("doc_id"))
      .join(shared, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared_shingles"),
        (coalesce(col("n_shared"), lit(0L)) >= flagAt).cast("int").as("contaminated"))
  }

  /** Streaming-friendly decontamination filter: drop every document that
    * shares ANY 3-gram shingle with the benchmark set. The benchmark's
    * distinct shingle hashes collapse to ONE broadcast array row (an eval
    * set is tiny next to the corpus), and the stream side is a pure
    * per-row `arrays_overlap` — STATELESS, so it runs identically on
    * batch and structured-streaming frames with no watermark and no state
    * store, at scan speed.
    */
  def decontaminateStream(stream: DataFrame, benchmark: DataFrame): DataFrame = {
    val sh = graft.functions.HashFunctions.shingles3_hashed(split(col("text"), " "))
    val benchArr = benchmark
      .select(explode(sh).as("h")).distinct()
      .agg(sort_array(collect_list(col("h"))).as("_bench_hashes"))
    stream
      .withColumn("_shs", sh)
      .crossJoin(broadcast(benchArr))
      .filter(!arrays_overlap(col("_shs"), col("_bench_hashes")))
      .drop("_shs", "_bench_hashes")
  }

  /** Rounds the last [[connectedComponents]] call took to converge —
    * telemetry for the scaling probes (BENCH_SF1.md measures that the
    * round count stays ~flat as the corpus grows). Driver-side only.
    */
  @volatile private[graft] var lastCcRounds: Int = 0

  /** Per-call [[connectedComponents]] phase telemetry — what the round-11
    * verdict demanded after two rounds of unattributed bench volatility on
    * `dedup_clusters`: each contraction round's wall seconds, the bytes the
    * round's reliable checkpoint wrote, and the convergence-probe seconds,
    * so a slow call is attributable to a PHASE (checkpoint IO vs join vs
    * probe) from the bench artifact alone. Driver-side instrument; no
    * library behavior depends on it.
    */
  final case class CcTelemetry(
      rounds: Int,
      roundSecs: Seq[Double],
      checkpointBytes: Seq[Long],
      probeSecs: Seq[Double])
  @volatile private[graft] var lastCcTelemetry: Option[CcTelemetry] = None

  /** Bytes on disk behind a reliable-checkpoint-backed frame (0 for the
    * localCheckpoint path — blocks, not files). */
  private def checkpointFileBytes(df: DataFrame): Long = {
    var total = 0L
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.getCheckpointFile.foreach { f =>
          try {
            val pth = new org.apache.hadoop.fs.Path(f)
            val fs = pth.getFileSystem(
              df.sparkSession.sparkContext.hadoopConfiguration)
            total += fs.getContentSummary(pth).getLength
          } catch { case scala.util.control.NonFatal(_) => () }
        }
      case _ => ()
    }
    total
  }

  /** Eagerly materialize `df` with its lineage truncated — the shared
    * primitive of the iterative operators ([[connectedComponents]],
    * [[Graph.pageRank]]).
    *
    * Reliable path: a bare `checkpoint(eager = true)` EXECUTES THE PLAN
    * TWICE — once for the eager action and once more inside the
    * checkpoint-file write job (Spark recomputes unpersisted partitions
    * when writing; measured as a ~2× tax per segment in `PrProbe`). The
    * transient persist makes the write job read the just-computed blocks,
    * then drops the cache entry — the returned frame is backed by the
    * checkpoint FILES alone, releasable via [[release]].
    */
  private[ext] def truncated(df: DataFrame, reliable: Boolean): DataFrame =
    if (!reliable) df.localCheckpoint(eager = true)
    else {
      df.persist()
      try df.checkpoint(eager = true)
      finally df.unpersist(blocking = false)
    }

  /** Connected components over near-dup candidate pairs — the dedup
    * endgame: pairs only say "A≈B"; keeping one doc per TRANSITIVE
    * cluster needs components. Alternating large-star/small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC'14): each round rewires every node's neighbors toward
    * its neighborhood minimum, contracting ANY graph to min-rooted stars
    * in O(log²·n) rounds worst-case (a k-node chain takes ~log·k rounds,
    * where plain min-label propagation needs k hops — the scale-killer
    * the round-5 verdict named). Each half-round is one equi-join + one
    * aggregate over the edge set, which only shrinks; the convergence
    * probe is a star-forest semi-join on the materialized round, never a
    * collect of data rows.
    */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    val sc = pairs.sparkSession.sparkContext
    val reliable = sc.getCheckpointDir.isDefined
    // materialize the caller's pair pipeline (often a full LSH candidate
    // join) exactly ONCE — nodes and edges both derive from this cache,
    // not from three re-executions of the upstream plan
    val base = pairs.selectExpr("a_id", "b_id").persist()
    // nodes has a single consumer (the final projection) — no persist;
    // it recomputes once from the cached base
    val nodes = base.selectExpr("a_id as id").unionAll(base.selectExpr("b_id as id"))
      .distinct()
    // canonical orientation: every edge points large → small. Both star
    // operators emit only (larger, smaller) edges, so the invariant holds
    // through every round without re-canonicalizing.
    var edges = base
      .selectExpr("greatest(a_id, b_id) as u", "least(a_id, b_id) as v")
      .filter(col("u") =!= col("v")).distinct().persist()
    // intermediate checkpoint frames whose storage (executor blocks for
    // localCheckpoint, FILES for reliable checkpoint) we still hold --
    // released together in the finally, so an exception anywhere in the
    // loop cannot leak pinned storage past the call (the round-3 class of
    // bug, re-entered via the error path)
    var chkPins = List.empty[DataFrame]
    // large-star: every strictly-larger neighbor v of u is rewired to
    // m = min(N(u) ∪ {u}); emitted edges (v, m) satisfy v > u ≥ m, so the
    // orientation survives and self-loops are impossible by construction.
    // Raw output is ONE row per undirected edge (each edge survives the
    // v > u filter in exactly one orientation) — rewiring collisions are
    // contracted by small-star's closing distinct, so no distinct here.
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.unionAll(e.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy(col("u").as("mu")).agg(min(col("v")).as("mn"))
        .select(col("mu"), least(col("mu"), col("mn")).as("m"))
      sym.join(mins, col("u") === col("mu"))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
    }
    // small-star: u and each of its SMALLER neighbors are rewired to the
    // minimum of that set (edges arrive oriented, so groupBy(u) sees
    // exactly the smaller neighbors); emits (u, m) and (v, m) with m < u
    // and m ≤ v, equalities dropped by the self-loop filter.
    def smallStar(e: DataFrame): DataFrame = {
      val mins = e.groupBy(col("u").as("mu")).agg(min(col("v")).as("m"))
      e.join(mins, col("u") === col("mu"))
        .select(explode(array(
          struct(col("u").as("s"), col("m").as("t")),
          struct(col("v").as("s"), col("m").as("t")))).as("p"))
        .select(col("p.s").as("u"), col("p.t").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    }
    val telRoundSecs = scala.collection.mutable.ArrayBuffer.empty[Double]
    val telCkptBytes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val telProbeSecs = scala.collection.mutable.ArrayBuffer.empty[Double]
    try {
      var converged = false
      var iter = 0
      while (!converged && iter < maxIters) {
        val tRound0 = System.nanoTime()
        val step = smallStar(largeStar(edges))
        // truncate the lineage EVERY round: the star operators reference
        // their input 8× (sym twice × two consumers in large-star, twice
        // more in small-star), so an untruncated logical tree grows 8^k
        // and driver-side ANALYSIS explodes long before execution does
        // (measured: round 3 over a 255-edge corpus spent 13 s in the
        // driver; persist() caches data but not the plan). The eager
        // checkpoint is the round's materialization job — one pass over
        // the shrinking edge set. Reliable checkpoint (files under the
        // configured dir) when available -- it survives executor loss;
        // localCheckpoint otherwise, whose blocks are unreplicated
        // executor storage: after lineage truncation a lost executor
        // fails the job instead of recomputing. Fine in local mode;
        // Bench/Verify configure a checkpoint dir so the reliable path
        // is what actually runs.
        val next = truncated(step, reliable)
        // the superseded pin (last round's checkpoint) is unreachable
        // once `next` is materialized — release it now, holding at most
        // one round's storage at a time
        chkPins.foreach(releaseCheckpointStorage)
        chkPins = List(next)
        // converged ⇔ the edge set is a star forest ⇔ no edge's target is
        // itself some edge's source (a parent with its own parent means a
        // chain-of-stars still contracting). Detecting this directly on
        // the JUST-materialized round — a semi-join of the small
        // checkpointed edge set against itself — converges one full round
        // earlier than a did-anything-change signature comparison: the
        // shallow graphs real near-dup corpora produce finish in ONE
        // round. Star forest ⇒ both operators map the set to itself, and
        // per-component stars are complete components (two stars of one
        // component would still be bridged by some edge, contradicting
        // star shape).
        val tProbe0 = System.nanoTime()
        val nonStars = next.select(col("v"))
          .join(next.select(col("u").as("v")), Seq("v"), "left_semi")
          .count()
        val tEnd = System.nanoTime()
        telProbeSecs += (tEnd - tProbe0) / 1e9
        telRoundSecs += (tEnd - tRound0) / 1e9
        telCkptBytes += checkpointFileBytes(next)
        converged = nonStars == 0L
        val prev = edges
        edges = next
        prev.unpersist()
        iter += 1
      }
      lastCcRounds = iter
      lastCcTelemetry = Some(CcTelemetry(
        iter, telRoundSecs.toSeq, telCkptBytes.toSeq, telProbeSecs.toSeq))
      // At the fixpoint the edge set IS the answer: one star edge
      // (node → component-min) per non-root node; roots label themselves.
      // The min-aggregate also makes the cutoff case (maxIters hit before
      // convergence) deterministic rather than dependent on duplicate
      // star edges.
      val parents = edges.groupBy(col("u").as("id")).agg(min(col("v")).as("comp"))
      // The returned frame's lineage is the whole driver-side iteration --
      // irreproducible once the loop state is released -- so materialize
      // the RESULT (doc_id, component) into its own checkpoint
      // (result-sized: orders smaller than the signature/edge
      // intermediates). With a configured checkpoint dir the result lives
      // in files (no block-manager footprint); either way [[release]]
      // reclaims it -- blocks AND files -- when the caller is done.
      val projected = nodes.join(parents, Seq("id"), "left")
        .select(col("id").as("doc_id"),
          coalesce(col("comp"), col("id")).as("component"))
      truncated(projected, reliable)
    } finally {
      base.unpersist(blocking = false)
      edges.unpersist(blocking = false)
      // safe only AFTER the result checkpoint is materialized (eager) or
      // on the failure path -- later intermediates have already been
      // re-rooted on their own storage, so superseded ones are unreachable
      chkPins.foreach(releaseCheckpointStorage)
    }
  }

  /** Release the materialized storage behind a frame returned by
    * [[connectedComponents]] (plus any cache entry on it). `unpersist`
    * alone only clears CacheManager state; checkpoint blocks belong to the
    * underlying RDD, reachable through the plan's `LogicalRDD` leaf.
    */
  def release(df: DataFrame): Unit = {
    df.unpersist(blocking = false)
    releaseCheckpointStorage(df)
  }

  /** Unpin a checkpoint-backed frame's executor blocks AND delete its
    * reliable-checkpoint files, if any: `spark.cleaner.referenceTracking.
    * cleanCheckpoints` defaults to false, so checkpoint FILES are never
    * reclaimed automatically -- without this, every call on a cluster with
    * a checkpoint dir would leak one directory per lineage truncation for
    * the application's lifetime (the block-manager leak, reappearing on
    * the filesystem).
    */
  private def releaseCheckpointStorage(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
        l.rdd.getCheckpointFile.foreach { f =>
          val pth = new org.apache.hadoop.fs.Path(f)
          val fs = pth.getFileSystem(
            df.sparkSession.sparkContext.hadoopConfiguration)
          fs.delete(pth, true)
        }
      case _ => ()
    }

  /** Frequency-capped n-gram Jaccard — the 100 TB form of
    * [[ngramJaccardPairs]]. A "stop shingle" occurring in f documents
    * contributes f² candidate pairs; at corpus scale one boilerplate
    * header can dominate the whole job. Capping document frequency at
    * `maxDf` bounds every bucket's pair blowup at maxDf² and drops
    * exactly the shingles with no discriminative value. Jaccard is then
    * computed over each document's SURVIVING shingle set (consistent
    * numerator/denominator — still a true Jaccard, of the capped sets).
    */
  /** Shared df-capped candidate-pair counts: (a_id, b_id, a_n, b_n,
    * n_common) over each document's SURVIVING (df ≤ maxDf) shingle set —
    * the plan both [[ngramJaccardCapped]] and [[containmentPairs]]
    * project their scores from.
    *
    * Flat (doc_id, shingle_hash) rows, pre-shuffled on shingle_hash: the
    * document-frequency aggregate, the cap semi-join, and BOTH sides of
    * the pair join all sit above this ONE exchange (ReuseExchange) — the
    * corpus is scanned and hashed exactly once. The pair join itself is a
    * codegen'd equi-join whose output streams straight into partial
    * aggregation: no per-bucket id arrays (a collect_list bucket is one
    * task's memory at f=maxDf — fine — but building f²/2 pair structs in
    * an interpreted lambda was the measured hot spot), and per-bucket
    * output is still bounded at maxDf² rows by the cap. Each doc's
    * surviving-shingle count attaches BEFORE the pair join: the sizes
    * aggregate and its probe share one doc_id exchange of the (small)
    * flat rows, and the counts ride through the pair join as plain
    * columns — joining sizes onto the (much larger) pair set afterwards
    * would shuffle every candidate pair twice more.
    */
  private def cappedPairCounts(documents: DataFrame, maxDf: Int): DataFrame = {
    val flat = computedOnce(shingleHashes(documents, outer = false), "shingle_hash")
    val freq = flat.groupBy(col("shingle_hash"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select(col("shingle_hash"))
    val kept = flat.join(freq, "shingle_hash")
    val sizes = kept.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val keptN = kept.join(sizes, "doc_id")
    keptN
      .select(col("shingle_hash"), col("doc_id").as("a_id"), col("n_sh").as("a_n"))
      .join(keptN.select(col("shingle_hash"), col("doc_id").as("b_id"), col("n_sh").as("b_n")),
        "shingle_hash")
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"), col("a_n"), col("b_n"))
      .agg(count(lit(1)).as("n_common"))
  }

  /** EXACT threshold set-similarity self-join via prefix filtering — the
    * AllPairs/SSJoin candidate scheme (Bayardo et al. WWW 2007; Chaudhuri
    * et al. ICDE 2006): order every document's shingle set by global
    * rarity (df asc, hash asc), keep only the first
    * n − ⌈t·n⌉ + 1 elements as the document's PREFIX, and generate
    * candidates only from prefix-token collisions. Completeness is a
    * theorem, not a heuristic: under any global order, two sets with
    * Jaccard ≥ t must share an element inside BOTH prefixes (if all
    * common elements ranked after A's prefix, |A∩B| ≤ n_A − p_A < t·n_A
    * — contradiction), so the exact verify pass sees every qualifying
    * pair. This differs from [[ngramJaccardCapped]]'s df-cap, which
    * BOUNDS work by dropping hot shingles and is approximate by
    * contract; prefix filtering prunes harder the rarer a document's
    * rarest shingle is, and stays exact. The oracle computes ALL pairs
    * with no prefix logic — a green gate therefore PROVES the filter
    * admitted every qualifying pair on this corpus.
    *
    * The threshold is a rational tNum/tDen so the prefix length and the
    * final test (tDen·common ≥ tNum·union) are integer-exact — no
    * cross-engine double-ceil drift can shrink a prefix.
    *
    * Scale shape: one shingle exchange (reused across df, sizes, prefix
    * — same computedOnce spine as the capped family), candidates keyed
    * by prefix shingle (rarity-ordered prefixes make hot-token buckets
    * structurally rare), and the verify join touches only candidate
    * pairs. No all-pairs stage anywhere.
    */
  def prefixFilterPairs(
      documents: DataFrame,
      tNum: Int = 3,
      tDen: Int = 5): DataFrame = {
    require(tNum >= 1 && tDen >= tNum, s"threshold must be in (0,1]: $tNum/$tDen")
    import org.apache.spark.sql.expressions.Window
    val flat = computedOnce(shingleHashes(documents, outer = false), "shingle_hash")
    val sizes = flat.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val dfreq = flat.groupBy(col("shingle_hash")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("shingle_hash"))
    val prefix = flat.join(dfreq, "shingle_hash")
      .withColumn("rk", row_number().over(w))
      .join(sizes, "doc_id")
      .filter(col("rk") <=
        col("n_sh") - expr(s"($tNum * n_sh + ${tDen - 1}) div $tDen") + 1)
      .select(col("shingle_hash"), col("doc_id"))
    val cand = prefix.select(col("shingle_hash"), col("doc_id").as("a_id"))
      .join(prefix.select(col("shingle_hash"), col("doc_id").as("b_id")), "shingle_hash")
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
    val common = cand
      .join(flat.select(col("doc_id").as("a_id"), col("shingle_hash")), "a_id")
      .join(flat.select(col("doc_id").as("b_id"), col("shingle_hash")),
        Seq("b_id", "shingle_hash"))
      .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.select(col("doc_id").as("a_id"), col("n_sh").as("a_n")), "a_id")
      .join(sizes.select(col("doc_id").as("b_id"), col("n_sh").as("b_n")), "b_id")
      .filter(col("n_common") * tDen >= (col("a_n") + col("b_n") - col("n_common")) * tNum)
      .selectExpr("a_id", "b_id", "a_n", "b_n", "n_common",
        "cast(n_common as double) / cast(a_n + b_n - n_common as double) as jaccard")
      .orderBy(col("a_id"), col("b_id"))
  }

  def ngramJaccardCapped(
      documents: DataFrame,
      maxDf: Int = 20,
      topK: Int = 50): DataFrame =
    cappedPairCounts(documents, maxDf)
      .selectExpr(
        "a_id", "b_id", "n_common",
        "cast(n_common as double) / cast(a_n + b_n - n_common as double) as jaccard")
      .orderBy(col("jaccard").desc, col("a_id"), col("b_id"))
      .limit(topK)

  /** Shingle-set CONTAINMENT pairs — the subset-duplicate detector Jaccard
    * misses: a short document quoted wholesale inside a long one has
    * containment |A∩B|/min(|A|,|B|) ≈ 1 but Jaccard ≈ |A|/|B| ≈ 0 (the
    * news-dedup / quote-extraction case, Broder's containment measure).
    * Same df-capped single-exchange plan as [[ngramJaccardCapped]] — one
    * corpus scan, every bucket bounded at maxDf² pairs — with containment
    * of the capped sets as the score and Jaccard carried for contrast.
    */
  def containmentPairs(
      documents: DataFrame,
      maxDf: Int = 20,
      minContainment: Double = 0.8): DataFrame =
    cappedPairCounts(documents, maxDf)
      .selectExpr(
        "a_id", "b_id", "a_n", "b_n", "n_common",
        "cast(n_common as double) / cast(least(a_n, b_n) as double) as containment",
        "cast(n_common as double) / cast(a_n + b_n - n_common as double) as jaccard")
      .filter(col("containment") >= minContainment)
      .orderBy(col("containment").desc, col("a_id"), col("b_id"))

  /** Cluster-size report over a connected-components assignment — the
    * run summary every dedup job logs: per cluster size, how many
    * clusters, how many documents they hold, and how many a keep-one
    * policy removes. Two bounded aggregates over the node-sized CC
    * frame; int64 throughout.
    */
  def clusterStats(cc: DataFrame): DataFrame =
    cc.groupBy(col("component"))
      .agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).cast("bigint").as("n_docs"),
        ((col("cluster_size") - 1) * col("n_clusters")).cast("bigint").as("n_removable"))

  /** LSH band-configuration tuning table — the measurement every LSH
    * deployment needs before committing to a (bands, rows-per-band)
    * choice: for each candidate config over ONE k-component MinHash
    * signature, the realized candidate count, how many candidates are
    * TRUE pairs (exact Jaccard ≥ tNum/tDen, from the prefix-filter
    * exact join — complete by the prefix theorem, so recall here is
    * true recall, not recall-vs-an-estimate), and the implied
    * precision/recall. Fewer rows per band (looser) buys recall and
    * pays in candidate volume — the table shows exactly where the
    * S-curve puts each config on THIS corpus.
    *
    * Scale shape: the k-min signature aggregate runs once (all Σb band
    * join sides read its reused exchange — the minhash_pairs /
    * simhash_pairs plan contract), each band join shuffles on its band
    * hash (collisions only where candidates are), and the truth side is
    * the already-gated prefix-filter machinery. Shingle-less documents
    * are excluded (they have no signature and no true pairs). The
    * candidate∩truth probe is a pair-key equi-join; counts are exact
    * int64, precision/recall single IEEE divisions (NULL on empty
    * denominators).
    */
  def lshTuning(
      documents: DataFrame,
      k: Int = 16,
      configs: Seq[(Int, Int)] = Seq((2, 8), (4, 4), (8, 2)),
      tNum: Int = 3,
      tDen: Int = 5): DataFrame =
    lshTuningWith(documents,
      prefixFilterPairs(documents, tNum, tDen).select("a_id", "b_id"),
      k, configs)

  /** [[lshTuning]] against a PRECOMPUTED truth pair set — the shape a
    * suite with a shared truth cache uses ([[IndexCache.prefixPairs]]):
    * the exact join is a corpus-level artifact, paid once per corpus,
    * not once per consumer.
    */
  def lshTuningWith(
      documents: DataFrame,
      truthPairs: DataFrame,
      k: Int = 16,
      configs: Seq[(Int, Int)] = Seq((2, 8), (4, 4), (8, 2))): DataFrame = {
    require(k >= 2 && k <= 64, s"k must be in [2,64], got $k")
    require(configs.nonEmpty, "configs must be non-empty")
    configs.foreach { case (b, r) =>
      require(b >= 1 && r >= 1 && b * r <= k,
        s"config ($b,$r) needs b*r <= k=$k")
    }
    val rMin = configs.map(_._2).min
    configs.foreach { case (b, r) =>
      require(r % rMin == 0,
        s"config rows-per-band must nest: $r is not a multiple of the loosest r=$rMin " +
          "(a coarser band must be a concatenation of the loosest config's bands, " +
          "so its collisions are a subset of the loosest candidate set)")
    }
    val bMin = k / rMin // the loosest tiling over all k mins
    val mins = (0 until k).map { i =>
      min(expr(s"(${minhashA(i)}L * (shingle_hash % 1073741824L) + ${minhashB(i)}L) % ${MinhashP}L"))
        .as(s"mh$i")
    }
    // Signature frame: the k mins as ONE array column, plus the loosest
    // config's band hashes. NESTING is the whole plan: a config with
    // r = m·rMin collides on band j only if its m constituent rMin-bands
    // all collide — so every config's candidate set is a SUBSET of the
    // loosest config's, and one banded join + per-pair membership tests
    // on the min arrays replaces Σb joins + per-config distinct pipelines
    // (measured 11.1 s → 5.3 s at sf0.1 for the same table; the
    // remainder is the exact-truth join itself — see BENCH_SF1).
    val bandArr = (0 until bMin).map { j =>
      val slice = (j * rMin until j * rMin + rMin).map(i => s"mh$i")
        .mkString("concat_ws(',', ", ", ", ")")
      expr(md5Long64(slice))
    }
    val sig = shingleHashes(documents, outer = false)
      .groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until k).map(i => col(s"mh$i")): _*).as("mharr"),
        array(bandArr: _*).as("bands"))
    // loosest candidates via ONE exploded band self-join (band index in
    // the key keeps cross-band collisions out), deduped
    val sigb = sig.select(col("doc_id"), posexplode(col("bands")).as(Seq("j", "bh")))
    val cand0 = sigb.alias("a")
      .join(sigb.alias("b"),
        col("a.j") === col("b.j") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
    val withMins = cand0
      .join(sig.select(col("doc_id").as("a_id"), col("mharr").as("a_mh")), Seq("a_id"))
      .join(sig.select(col("doc_id").as("b_id"), col("mharr").as("b_mh")), Seq("b_id"))
    val truth = truthPairs.select("a_id", "b_id")
    val truthCount = truth.agg(count(lit(1)).as("n_truth"))
    // per-config membership: ∃ band j whose whole min slice matches
    def memberExpr(b: Int, r: Int): org.apache.spark.sql.Column = expr(
      s"""exists(sequence(0, ${b - 1}), j ->
         |  forall(sequence(1, $r), i ->
         |    element_at(a_mh, j * $r + i) = element_at(b_mh, j * $r + i)))""".stripMargin)
    val flagged = withMins
      .join(truth.withColumn("_hit", lit(1)), Seq("a_id", "b_id"), "left")
      .select(configs.map { case (b, r) =>
        memberExpr(b, r).as(s"m_${b}_$r")
      } :+ coalesce(col("_hit"), lit(0)).as("hit"): _*)
    val aggs = configs.flatMap { case (b, r) =>
      Seq(
        coalesce(sum(when(col(s"m_${b}_$r"), 1L)), lit(0L)).as(s"nc_${b}_$r"),
        coalesce(sum(when(col(s"m_${b}_$r") && col("hit") === 1, 1L)), lit(0L)).as(s"nh_${b}_$r"))
    }
    val counts = flagged.agg(aggs.head, aggs.tail: _*)
    configs.map { case (b, r) =>
      counts.select(
        lit(b).as("bands"), lit(r).as("rows_per_band"),
        col(s"nc_${b}_$r").cast("bigint").as("n_candidates"),
        col(s"nh_${b}_$r").cast("bigint").as("n_hits"))
    }.reduce(_ unionAll _)
      .crossJoin(broadcast(truthCount))
      .select(col("bands"), col("rows_per_band"),
        col("n_candidates"), col("n_truth"), col("n_hits"),
        when(col("n_candidates") > 0,
          col("n_hits").cast("double") / col("n_candidates").cast("double")).as("precision"),
        when(col("n_truth") > 0,
          col("n_hits").cast("double") / col("n_truth").cast("double")).as("recall"))
  }

  /** Cluster-diameter audit — the transitive-chaining check for
    * connected-component dedup: CC merges A~B and B~C into one cluster
    * even when A and C share nothing (the classic fuzzy-dedup failure:
    * a chain of borderline pairs welds unrelated documents, and
    * keep-one-per-cluster then DELETES unique content). This audit
    * measures, for every non-representative member, its EXACT shingle
    * Jaccard to the cluster representative and flags members below the
    * threshold — the size of that flag set is the chaining damage a
    * keep-first policy would do.
    *
    * Star distances (member ↔ rep), deliberately not all pairs: the
    * representative IS the survivor under keep-first, so member-to-rep
    * similarity is the question that matters, and the join cost is
    * cluster CONTENT, never cluster size squared. The flag is pure
    * integer — j < tNum/tDen ⟺ (tDen+tNum)·shared < tNum·(szA+szB) —
    * so a member exactly on the threshold can never flip engines;
    * jaccard itself is the one terminal division.
    *
    * Shape: CC over the LSH candidate pairs (the dedup_clusters path),
    * then shingle-hash frames joined by (component, hash) — bounded by
    * the shingle mass of clustered docs, a vanishing fraction of the
    * corpus.
    */
  def clusterDiameter(
      documents: DataFrame,
      tNum: Int = 1,
      tDen: Int = 2): DataFrame =
    clusterDiameterWith(documents,
      connectedComponents(
        minhashCandidatePairs(documents).select("a_id", "b_id")),
      tNum, tDen)

  /** [[clusterDiameter]] over a caller-supplied CC assignment — the
    * shared-stage form: the suite computes the corpus's candidate-pair
    * CC once ([[IndexCache.ccClusters]]) and every family member reads
    * it, instead of each re-running the LSH join + contraction loop.
    */
  def clusterDiameterWith(
      documents: DataFrame,
      cc: DataFrame,
      tNum: Int = 1,
      tDen: Int = 2): DataFrame = {
    require(tNum >= 1 && tDen > tNum, s"threshold must be in (0,1): $tNum/$tDen")
    val mem = cc.where(col("doc_id") =!= col("component"))
    // Prune the shingle stream to CLUSTERED docs (members ∪ reps) before
    // the distinct/size exchanges: every downstream consumer is keyed on
    // a member or rep id (memSh/repSh are inner joins; the two size
    // left-joins only surface those keys), so rows for unclustered docs
    // were shuffled through distinct() and the size aggregate just to be
    // dropped. Both exchanges shrink from corpus-shingle-mass to
    // cluster-content-mass — the guide's semi-join-before-the-exchange
    // move. Output is identical by the key argument above. No broadcast
    // HINT on the id set (r16 ADVICE): on a duplication-heavy corpus the
    // clustered-id set is input-dependent and unbounded, and a forced
    // broadcast over the 8 GB relation cap would fail a query that
    // previously only shuffled — let AQE pick broadcast when the
    // runtime size fits (it does at every bench SF) and fall back to a
    // shuffled semi-join when it doesn't.
    val ids = mem.select(col("doc_id"))
      .unionAll(mem.select(col("component").as("doc_id")))
      .distinct()
    val sh = shingleHashes(documents, outer = false)
      .join(ids, Seq("doc_id"), "left_semi")
      .distinct()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val memSh = mem.join(sh, "doc_id")
      .select(col("component"), col("doc_id"), col("shingle_hash"))
    val repSh = mem.select(col("component")).distinct()
      .join(sh.withColumnRenamed("doc_id", "component"), "component")
      .select(col("component"), col("shingle_hash"))
    val inter = memSh.join(repSh, Seq("component", "shingle_hash"))
      .groupBy(col("component"), col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
    mem
      .join(sizes.select(col("doc_id").as("component"), col("sz").as("sz_rep")),
        Seq("component"), "left")
      .join(sizes.select(col("doc_id"), col("sz").as("sz_member")),
        Seq("doc_id"), "left")
      .join(inter, Seq("component", "doc_id"), "left")
      .select(
        col("component"), col("doc_id"),
        coalesce(col("sz_rep"), lit(0L)).cast("bigint").as("sz_rep"),
        coalesce(col("sz_member"), lit(0L)).cast("bigint").as("sz_member"),
        coalesce(col("n_shared"), lit(0L)).cast("bigint").as("n_shared"))
      .select(col("component"), col("doc_id"), col("sz_rep"), col("sz_member"),
        col("n_shared"),
        when(col("sz_rep") + col("sz_member") - col("n_shared") > 0,
          col("n_shared").cast("double") /
            (col("sz_rep") + col("sz_member") - col("n_shared")).cast("double"))
          .as("jaccard"),
        (lit((tDen + tNum).toLong) * col("n_shared") <
          lit(tNum.toLong) * (col("sz_rep") + col("sz_member")))
          .as("chain_flag"))
  }

  /** Cross-source near-duplicate overlap matrix — the corpus-mixing
    * readout a multi-source pipeline runs BEFORE choosing mixture
    * weights: "how much of source A is already inside source B?"
    * Mixing two sources that near-duplicate each other (the classic
    * CommonCrawl-contains-Wikipedia case) silently up-weights the
    * shared mass; this table quantifies it from the SAME connected-
    * component assignment the dedup family already computes.
    *
    * One row per unordered source pair (source_a ≤ source_b, the
    * diagonal included): `n_clusters` = near-dup clusters containing
    * BOTH sources (on the diagonal: clusters containing the source at
    * all), and `n_doc_pairs` = cross-source member pairs inside those
    * clusters (Σ n_a·n_b per cluster; diagonal: Σ n·(n−1) div 2 —
    * always even product, so truncating and flooring division agree).
    * All counts exact int64.
    *
    * Scale shape: the input is the CC assignment — near-dup cluster
    * members, a vanishing fraction of the corpus — joined once to the
    * doc→source projection; per-(cluster, source) counts are tiny
    * (≤ clusters × sources rows) and the pair matrix self-join runs on
    * THAT frame, bounded by sources-per-cluster², never by docs². The
    * corpus itself contributes one column-pruned scan.
    */
  def sourceOverlap(
      documents: DataFrame,
      cc: DataFrame,
      sourceCol: String = "source"): DataFrame = {
    val members = cc.select(col("doc_id"), col("component"))
      .join(documents.select(col("doc_id"), col(sourceCol).as("_src")), "doc_id")
    val perSrc = members
      .groupBy(col("component"), col("_src"))
      .agg(count(lit(1)).as("_n"))
    val a = perSrc.select(col("component"),
      col("_src").as("source_a"), col("_n").as("_na"))
    val b = perSrc.select(col("component"),
      col("_src").as("source_b"), col("_n").as("_nb"))
    a.join(b, Seq("component"))
      .where(col("source_a") <= col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(
        count(lit(1)).as("n_clusters"),
        sum(when(col("source_a") === col("source_b"),
          expr("_na * (_na - 1) div 2"))
          .otherwise(col("_na") * col("_nb"))).as("n_doc_pairs"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** Time-windowed event dedup — keep the FIRST event per
    * (key, tumbling window). This is the batch twin of Structured
    * Streaming's `dropDuplicatesWithinWatermark`: an at-least-once
    * upstream (Kafka redeliveries, retried webhooks) re-emits the same
    * logical event within seconds, and the dedup horizon is TIME, not
    * the whole corpus — unbounded-key exact dedup would need state
    * forever, the windowed form lets state expire with the watermark.
    * (The streaming API itself is exercised in StreamingSpec's
    * dropDuplicatesWithinWatermark test; this batch form is the
    * tumbling-window projection of that semantic, with the survivor
    * and the duplicate count made explicit.)
    *
    * "First" is deterministic: min (ts, tiebreak) via one max_by-style
    * aggregate — ONE map-side-combined groupBy on (key, window start),
    * no ranking window (a window function would sort inside partitions;
    * min_by doesn't even need the order). Keys shuffle as (key, epoch
    * bucket) — at 100 TB the window bucket also spreads a hot key's
    * history across time buckets instead of one reducer.
    *
    * Returns per-key-per-window survivors with the duplicate count the
    * window absorbed (`n_dups` = arrivals − 1), so the caller gets both
    * the deduped stream and the redelivery telemetry in one pass.
    */
  def windowDedup(
      events: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      tieCol: String,
      windowSeconds: Long = 3600L): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(windowSeconds > 0, s"windowSeconds must be positive, got $windowSeconds")
    // floor-div on the epoch second; double is exact here (epoch seconds
    // ≪ 2^53) and floor matches the oracle's // on non-negative input
    val bucket = floor(unix_timestamp(col(tsCol)).cast("double") / windowSeconds)
      .cast("bigint").as("win_bucket")
    val grouped = events
      .select(keyCols.map(col) :+ bucket :+ col(tsCol).as("ts")
        :+ col(tieCol).as("tie"): _*)
      .groupBy((keyCols.map(col) :+ col("win_bucket")): _*)
      .agg(
        min_by(struct(col("ts"), col("tie")), struct(col("ts"), col("tie")))
          .as("first"),
        count(lit(1)).as("arrivals"))
    grouped.select(
      keyCols.map(col) ++ Seq(
        // epoch seconds, not a timestamp: the gate stringifies values,
        // and integer seconds can't pick up timezone-rendering drift
        (col("win_bucket") * windowSeconds).cast("bigint").as("win_start_sec"),
        col("first.ts").as("ts"),
        col("first.tie").as("tie"),
        (col("arrivals") - 1L).cast("bigint").as("n_dups")): _*)
  }
}
