package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.{vec_dot, vec_norm}
import graft.functions.LongVecFunctions.{vec_dot_long, vec_argmax_qcell, pq_argmax_code, vec_sub_long}

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *  - brute-force cosine (exact baseline) — vectors are L2-normalized
  *    ONCE per row, then every pair costs a single dot product, computed
  *    by the codegen'd [[graft.functions.VecDot]] Catalyst expression (a
  *    tight primitive loop inside whole-stage codegen, ~100× the
  *    throughput of an interpreted higher-order `aggregate` lambda);
  *  - sign-LSH bucketing (the scale path) — multi-band sign-pattern
  *    buckets (2 bands × 12 bits, 4,096 buckets/band) turn the n² pair
  *    space into Σ(bucket²) ≈ n²/4,096 per band; at 100 TB the bucket id
  *    is also the natural partition key, so candidate generation is a
  *    co-partitioned self-join.
  *
  * Determinism: normalization and dot accumulate left-to-right in double,
  * mirroring the DuckDB oracle's `list_sum(list_transform(...))`; outputs
  * are rounded to 6 decimals as a cross-engine guard.
  */
object Similarity {

  /** Portable higher-order-function formulation of cosine(a, b) — the
    * semantic reference that [[vec_dot]] is tested against.
    */
  def cosineExpr(a: String, b: String): String =
    s"""aggregate(zip_with($a, $b, (x, y) -> cast(x as double) * cast(y as double)), 0D, (acc, v) -> acc + v)
       | / (sqrt(aggregate($a, 0D, (acc, x) -> acc + cast(x as double) * cast(x as double)))
       |    * sqrt(aggregate($b, 0D, (acc, x) -> acc + cast(x as double) * cast(x as double))))""".stripMargin

  /** Project (vec_id, unit): the L2-normalized embedding as array<double>.
    * One pass per vector; downstream cosines are then plain dots.
    *
    * Zero-norm (or empty) embeddings get a NULL unit — their cosine is
    * undefined, and an all-NaN unit would crash the fused argmax's decimal
    * rounding and poison every pair filter it touches. NULL instead flows
    * through null-safe expressions as NULL sims, which threshold filters
    * drop and [[ivfAssignWithUnit]] surfaces as a NULL cell.
    */
  private[ext] def normalized(embeddings: DataFrame): DataFrame =
    embeddings
      .withColumn("_norm", vec_norm(col("embedding")))
      .withColumn("unit",
        when(col("_norm") > 0D,
          expr("transform(embedding, x -> cast(x as double) / _norm)")))

  /** Brute-force top-k nearest neighbors of one query vector. Single scan;
    * the per-row cosine is one codegen'd dot against the broadcast query
    * vector; top-k is a TakeOrdered — nothing shuffles the vectors.
    */
  def cosineTopK(embeddings: DataFrame, queryVecId: Long = 0L, k: Int = 10): DataFrame = {
    val n = normalized(embeddings)
    val q = n.filter(col("vec_id") === queryVecId).select(col("unit").as("q_unit"))
    n.filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(vec_dot(col("unit"), col("q_unit")), 6).as("cosine_sim"))
      .orderBy(col("cosine_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Matryoshka truncation probe — the measurement behind the "store the
    * first d′ dims, renormalize, search cheaper" embedding-compression
    * trade (Kusupati et al. 2022; OpenAI/Nomic shortened embeddings):
    * for one query vector, compare its exact top-k under FULL-dimension
    * cosine against top-k under truncate-to-`dims`-and-renormalize, and
    * emit the union with both similarities and membership flags — the
    * overlap IS the retrieval-quality number a team reads before
    * flipping storage to the truncated form.
    *
    * Scale shape: two single-scan cosine passes against broadcast
    * 1-row query vectors, two TakeOrdered top-ks, and a k-sized
    * full-outer join — vectors never shuffle, nothing exceeds k rows
    * after the scans. Exactness: slicing is positional, the renorm is
    * the same sqrt/divide spine as [[normalized]], and both similarity
    * columns round at 6 like every cosine gate here.
    */
  def matryoshkaProbe(
      embeddings: DataFrame,
      dims: Int = 32,
      queryVecId: Long = 0L,
      k: Int = 10): DataFrame = {
    require(dims >= 1 && k >= 1)
    val full = normalized(embeddings).select(col("vec_id"), col("unit"))
    val tr = embeddings
      .withColumn("t", slice(col("embedding"), 1, dims))
      .withColumn("_tn", vec_norm(col("t")))
      .withColumn("tunit",
        when(col("_tn") > 0D, expr("transform(t, x -> cast(x as double) / _tn)")))
      .select(col("vec_id"), col("tunit"))
    val qf = full.filter(col("vec_id") === queryVecId).select(col("unit").as("qf"))
    val qt = tr.filter(col("vec_id") === queryVecId).select(col("tunit").as("qt"))
    val fsim = full.filter(col("vec_id") =!= queryVecId).crossJoin(broadcast(qf))
      .select(col("vec_id"), round(vec_dot(col("unit"), col("qf")), 6).as("full_sim"))
    val tsim = tr.filter(col("vec_id") =!= queryVecId).crossJoin(broadcast(qt))
      .select(col("vec_id"), round(vec_dot(col("tunit"), col("qt")), 6).as("trunc_sim"))
    val ftop = fsim.orderBy(col("full_sim").desc, col("vec_id")).limit(k)
      .select(col("vec_id"), lit(true).as("in_full"))
    val ttop = tsim.orderBy(col("trunc_sim").desc, col("vec_id")).limit(k)
      .select(col("vec_id"), lit(true).as("in_trunc"))
    ftop.join(ttop, Seq("vec_id"), "full_outer")
      .join(fsim, "vec_id").join(tsim, "vec_id")
      .select(col("vec_id"), col("full_sim"), col("trunc_sim"),
        coalesce(col("in_full"), lit(false)).as("in_full"),
        coalesce(col("in_trunc"), lit(false)).as("in_trunc"))
      .orderBy("vec_id")
  }

  /** Per-group embedding outlier screen: cosine of every vector against
    * its label group's deterministic representative — the min-`vec_id`
    * member, a medoid stand-in that needs NO float averaging (a mean
    * centroid's per-dimension double sums would depend on partial-
    * aggregation order, so the flag could flip between engines/runs; the
    * representative's unit vector is a plain row, bit-stable everywhere).
    * Representatives are one row per label, so they broadcast at any
    * corpus size and the screen is a single scan + one codegen'd dot per
    * vector.
    */
  def outliersByLabel(embeddings: DataFrame, flagBelow: Double = -0.2): DataFrame = {
    val n = normalized(embeddings)
    val repIds = embeddings.groupBy(col("label").as("rep_label"))
      .agg(min(col("vec_id")).as("rep_id"))
    val reps = n
      .join(broadcast(repIds), col("vec_id") === col("rep_id"))
      .select(col("rep_label"), col("unit").as("rep_unit"))
    n.join(broadcast(reps), col("label") === col("rep_label"))
      .select(col("vec_id"), col("label"),
        round(vec_dot(col("unit"), col("rep_unit")), 6).as("rep_sim"))
      // NULL-safe: an undefined similarity (zero-norm/null embedding →
      // NULL rep_sim) is "not flagged", not NULL — the oracle's
      // CASE ... ELSE 0 shape, so both engines agree on edge corpora
      .withColumn("outlier", coalesce((col("rep_sim") < flagBelow).cast("int"), lit(0)))
      .orderBy(col("vec_id"))
  }

  /** All near-duplicate pairs with cosine ≥ threshold (exact, brute
    * force). Quadratic row-level join — TEST-ONLY correctness baseline
    * that [[nearDupPairsBlocked]] and the LSH path are validated against
    * at small scale; not exposed as a query/bench entry. Normalization
    * happens before the join, so the n² stage does one dot per pair and
    * nothing else.
    */
  def nearDupPairs(embeddings: DataFrame, threshold: Double = 0.4): DataFrame = {
    val n = normalized(embeddings)
    val a = n.selectExpr("vec_id as a_id", "unit as a_unit")
    val b = n.selectExpr("vec_id as b_id", "unit as b_unit")
    a.join(b, col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        round(vec_dot(col("a_unit"), col("b_unit")), 6).as("cosine_sim"))
      // Catalyst pushes this into the join condition — good: the join
      // filters pairs inline and the output projection re-computes the
      // dot only for the few survivors (measured faster than blocking
      // the pushdown, which forces every pair through a materialized
      // projection).
      .filter(col("cosine_sim") >= threshold)
  }

  /** Exact near-duplicate pairs in BLOCKED (tiled) form — the shape that
    * replaces the row-level brute force at scale. Exact all-pairs search
    * below a low threshold is inherently n² dot products; what kills the
    * row-level join at 100 TB is not the FLOPs but the SHAPE: a
    * nested-loop join materializes every candidate row pair through the
    * operator pipeline. Here vectors are grouped into fixed-size tiles,
    * the B² tile-pair grid is the (tiny) join, and each task runs a
    * primitive m×m dot-product loop over two deserialized tiles — the
    * BLAS-3 decomposition every distributed exact-similarity system uses.
    * Tiles partition evenly (no skew), each tile moves O(B) times, and
    * only survivors are materialized: the in-loop pre-filter keeps
    * `dot ≥ threshold − 1e-6`, and the engine's own `round(_, 6)` +
    * threshold comparison then reproduces the oracle semantics exactly
    * (borderline values within 1e-6 flow through to the engine rounding,
    * so no cross-engine rounding drift is introduced).
    *
    * `mapPartitions`-style typed `flatMap` is justified here: a tiled
    * primitive loop over array pairs has no Catalyst equivalent, and the
    * dot accumulates left-to-right in double exactly like [[vec_dot]].
    */
  def nearDupPairsBlocked(
      embeddings: DataFrame,
      threshold: Double = 0.4,
      blockSize: Int = 256): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    // zero-norm/null embeddings have NULL units (no defined cosine) and
    // must not reach the typed tile kernel, whose primitive arrays can't
    // hold nulls
    val n = normalized(embeddings).select(col("vec_id"), col("unit"))
      .filter(col("unit").isNotNull)
    val tiles = n
      .groupBy(expr(s"vec_id div $blockSize").as("block"))
      .agg(collect_list(struct(col("vec_id").as("_1"), col("unit").as("_2"))).as("items"))
    val grid = tiles.selectExpr("block as ba", "items as ia")
      .join(tiles.selectExpr("block as bb", "items as ib"), col("ba") <= col("bb"))
      .select(col("ba"), col("bb"), col("ia"), col("ib"))
      .as[(Long, Long, Seq[(Long, Seq[Double])], Seq[(Long, Seq[Double])])]
    val cut = threshold - 1e-6
    grid.flatMap { case (ba, bb, ia, ib) =>
        val as = ia.iterator.map { case (id, u) => (id, u.toArray) }.toArray
        val bs =
          if (ba == bb) as
          else ib.iterator.map { case (id, u) => (id, u.toArray) }.toArray
        as.iterator.flatMap { case (aid, au) =>
          bs.iterator.flatMap { case (bid, bu) =>
            if (aid >= bid) Iterator.empty
            else {
              var s = 0.0
              var i = 0
              while (i < au.length) { s += au(i) * bu(i); i += 1 }
              if (s >= cut) Iterator.single((aid, bid, s)) else Iterator.empty
            }
          }
        }
      }
      .toDF("a_id", "b_id", "dot")
      .select(col("a_id"), col("b_id"), round(col("dot"), 6).as("cosine_sim"))
      .filter(col("cosine_sim") >= threshold)
  }

  /** Sign-LSH bucket assignment: bit i set iff dimension i+1 is positive.
    * Vectors in the same bucket are ANN candidates; bucket sizes show the
    * partition balance the scale path relies on.
    */
  def lshBuckets(embeddings: DataFrame): DataFrame = {
    val bucket = (1 to 8)
      .map(i => s"case when cast(element_at(embedding, $i) as double) > 0 then cast(${1 << (i - 1)} as bigint) else 0L end")
      .mkString(" + ")
    embeddings.selectExpr("vec_id", "label", s"$bucket as bucket")
  }

  /** IVF cell assignment — the coarse-quantizer half of IVF-flat ANN.
    * Centroids are the first k vectors (deterministic stand-in for a
    * k-means codebook; swapping in trained centroids changes nothing
    * structurally). Each vector gets its nearest centroid by cosine:
    * a broadcast of k centroids against one scan — no shuffle of the
    * vectors, and the cell id becomes the partition key for search.
    * Argmax ties are broken on the ROUNDED similarity + centroid id so
    * both engines pick the same cell.
    */
  def ivfAssign(embeddings: DataFrame, k: Int = 16): DataFrame =
    ivfAssignWithUnit(embeddings, k)
      .select(col("vec_id"), col("cell"), col("cent_sim"))

  /** [[ivfAssign]] keeping the unit vector alongside the cell — the shared
    * single-scan form for operators that need both the assignment and the
    * vector (within-cell search, semantic dedup) without a join back.
    *
    * ZERO-shuffle formulation: the k centroids collapse to ONE broadcast
    * row holding an array of (cent_id, unit) structs, and the nearest
    * centroid is an `array_max` over a `transform` lambda — a pure
    * projection at scan speed. The previous form exploded k rows per
    * vector and ran a `row_number` window partitioned by vec_id, which
    * SHUFFLED every vector in the corpus just to take a per-row argmax.
    * Tie-break matches the oracle exactly: struct comparison orders by
    * (rounded similarity DESC via max, then smallest cent_id via the
    * negated id field).
    */
  /** The k-entry coarse-quantizer codebook of a corpus, as ONE row holding
    * an array of (cent_id, cent_unit) structs — the broadcastable form
    * every assignment path consumes. Centroids are the k SMALLEST vec_ids
    * with a well-defined unit — not `vec_id < k`, which silently
    * under-fills the codebook on sparse or offset id spaces (a trained
    * k-means codebook drops in here without structural change). The
    * sort+limit is a bounded TakeOrdered (k ≤ 2¹⁶ rows survive per
    * partition), not a global sort of the corpus.
    *
    * Exposed so a STREAMING query can quantize against a codebook built
    * once from the static corpus ([[semanticDedupStream]]): the frame is
    * static, one row, and joins into a stream as an ordinary broadcast.
    */
  def codebook(embeddings: DataFrame, k: Int = 16): DataFrame =
    normalized(embeddings).filter(col("unit").isNotNull)
      .orderBy(col("vec_id")).limit(k)
      .agg(collect_list(struct(col("vec_id").as("cent_id"), col("unit").as("cent_unit")))
        .as("cents"))

  private[ext] def ivfAssignWithUnit(embeddings: DataFrame, k: Int = 16): DataFrame =
    assignWithUnit(embeddings, codebook(embeddings, k))

  /** Embedding-DISTRIBUTION drift between a reference corpus and the
    * current one — the dataset-shift telemetry an embedding pipeline
    * needs before its downstream indexes and dedup thresholds silently
    * rot (a new crawl source, an encoder upgrade, a language mix shift
    * all move the cell histogram first). Both corpora are assigned to
    * the REFERENCE's coarse cells (integer-exact dots, ties to the
    * smallest centroid id — the [[kmeansAssign]] rule), and each cell
    * compares its share of the two corpora by integer log₂ magnitudes
    * (`length(bin(n)) − 1`, the [[graft.ext.TextOps.freqScore]] idiom):
    * `drift_mag = (⌊log₂ n_cur⌋ − ⌊log₂ n_ref⌋) − (⌊log₂ t_cur⌋ −
    * ⌊log₂ t_ref⌋)` — the bit-length form never multiplies counts, so
    * it cannot overflow at any corpus size (cross-multiplied proportion
    * compares die at ~10⁹×10⁹). `drifted` fires on |drift_mag| ≥ 2
    * (≥ ~4× proportion shift, ±1 bit quantization) and on cells that
    * appeared or vanished outright (drift_mag NULL there — the log of
    * an empty cell is undefined). Everything is int64, so the whole
    * measurement sits under the DuckDB hash gate.
    *
    * Scale shape: one broadcast-codebook assignment pass per corpus
    * (zero vector shuffles), two ≤`cells`-row map-side-combined
    * aggregates, one tiny full-outer join — O(n) scans, O(cells)
    * exchange.
    */
  def embeddingDrift(
      reference: DataFrame,
      current: DataFrame,
      cells: Int = 16): DataFrame = {
    require(cells >= 1, s"cells must be >= 1, got $cells")
    val qr = quantizedUnits(reference).filter(col("qvec").isNotNull)
    val qc = quantizedUnits(current).filter(col("qvec").isNotNull)
    val cents = qr.orderBy(col("vec_id")).limit(cells)
      .select(col("vec_id").as("cidx"), col("qvec").as("qcent"))
    val nr = assignQCells(qr, cents)
      .groupBy(col("cell")).agg(count(lit(1)).as("n_ref"))
    val nc = assignQCells(qc, cents)
      .groupBy(col("cell")).agg(count(lit(1)).as("n_cur"))
    driftFromCounts(nr, nc)
  }

  /** The drift card from already-aggregated per-cell counts — shared by
    * the batch and streaming forms so they can only agree or both be
    * wrong (the statsCard discipline). */
  private def driftFromCounts(nr: DataFrame, nc: DataFrame): DataFrame = {
    val tot = nr.agg(coalesce(sum(col("n_ref")), lit(0L)).as("t_ref"))
      .crossJoin(nc.agg(coalesce(sum(col("n_cur")), lit(0L)).as("t_cur")))
    nr.join(nc, Seq("cell"), "full_outer")
      .na.fill(0L, Seq("n_ref", "n_cur"))
      .crossJoin(broadcast(tot))
      .selectExpr("cell", "n_ref", "n_cur",
        """case when n_ref > 0 and n_cur > 0 then
          |  cast(((length(bin(n_cur)) - 1) - (length(bin(n_ref)) - 1))
          |     - ((length(bin(t_cur)) - 1) - (length(bin(t_ref)) - 1)) as bigint)
          |end as drift_mag""".stripMargin)
      .selectExpr("cell", "n_ref", "n_cur", "drift_mag",
        """cast(case when n_ref = 0 or n_cur = 0 then 1
          |          when abs(drift_mag) >= 2 then 1
          |          else 0 end as int) as drifted""".stripMargin)
  }

  /** STREAMING drift monitoring — the long-running ingest form of
    * [[embeddingDrift]]: the stream keeps NO vector state, each
    * micro-batch writes only its ≤`cells`-row cell histogram to
    * `outDir/cells/batch_<id>` (whole-dir overwrite by batch id —
    * foreachBatch redelivery replays idempotently), and the drift card
    * vs the reference materializes ON DEMAND via [[embeddingDriftFrom]].
    * The reference's coarse centroids are collected ONCE (≤`cells`
    * rows, the cbLocalRows discipline) so micro-batches never re-scan
    * the reference corpus.
    */
  def embeddingDriftSink(
      current: DataFrame,
      reference: DataFrame,
      outDir: String,
      checkpointDir: String,
      cells: Int = 16): org.apache.spark.sql.streaming.StreamingQuery = {
    val centsLocal = localCents(reference, cells)
    current.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        embeddingDriftBatch(batch.toDF(), centsLocal, outDir, batchId)
      }
      .start()
  }

  /** One micro-batch's cell histogram — factored out for composite
    * sinks and direct redelivery testing. `centsLocal` must be the
    * reference centroids from the sink that owns `outDir`. */
  def embeddingDriftBatch(
      df: DataFrame,
      centsLocal: Seq[(Long, Seq[Long])],
      outDir: String,
      batchId: Long): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val cents = centsLocal.toDF("cidx", "qcent")
    assignQCells(quantizedUnits(df).filter(col("qvec").isNotNull), cents)
      .groupBy(col("cell")).agg(count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(s"$outDir/cells/batch_$batchId")
    ()
  }

  /** The reference corpus's first-`cells` coarse centroids as LOCAL
    * rows (≤`cells` — a bounded driver action), the broadcastable seed
    * every drift micro-batch assigns against. */
  def localCents(reference: DataFrame, cells: Int = 16): Seq[(Long, Seq[Long])] = {
    require(cells >= 1, s"cells must be >= 1, got $cells")
    val spark = reference.sparkSession
    import spark.implicits._
    quantizedUnits(reference).filter(col("qvec").isNotNull)
      .orderBy(col("vec_id")).limit(cells)
      .select(col("vec_id").as("cidx"), col("qvec").as("qcent"))
      .as[(Long, Seq[Long])].collect().toSeq
  }

  /** The accumulated drift card over everything [[embeddingDriftSink]]
    * has committed so far: merge the per-batch cell histograms (one
    * ≤cells·batches-row sum) and run the SAME [[driftFromCounts]] as
    * the batch path — equal to `embeddingDrift(reference, union of
    * batches)` by shared-aggregate construction. Zero committed batches
    * yield every reference cell as vanished (n_cur = 0), which is the
    * truthful card of an ingest that has delivered nothing.
    */
  def embeddingDriftFrom(
      spark: org.apache.spark.sql.SparkSession,
      reference: DataFrame,
      outDir: String,
      cells: Int = 16): DataFrame = {
    import spark.implicits._
    val centsLocal = localCents(reference, cells)
    val cents = centsLocal.toDF("cidx", "qcent")
    val nr = assignQCells(
        quantizedUnits(reference).filter(col("qvec").isNotNull), cents)
      .groupBy(col("cell")).agg(count(lit(1)).as("n_ref"))
    val committed = TextOps.committedBatchDirs(spark, s"$outDir/cells")
    val nc =
      if (committed.isEmpty)
        spark.emptyDataset[(Long, Long)].toDF("cell", "n_cur")
      else
        spark.read.parquet(
            committed.toSeq.sorted.map(b => s"$outDir/cells/$b"): _*)
          .groupBy(col("cell")).agg(sum(col("n")).as("n_cur"))
    driftFromCounts(nr, nc)
  }

  /** [[ivfAssignWithUnit]] against an ARBITRARY one-row codebook frame
    * (first-k, [[trainedCodebook]], or externally trained centroids in
    * the same format) — the seam that lets every cell-restricted
    * operator run on trained centroids.
    *
    * Null-cell contract: the codebook is always ONE row (a global
    * collect_list), so when it is empty (empty corpus, or only zero-norm
    * vectors) every vector is still emitted, with NULL cell and
    * cent_sim — the assignment reports "no cell", it does not drop rows.
    * Downstream cell equi-joins never match NULL, so such vectors simply
    * pair with nothing (ExtSpec covers both degenerate corpora).
    */
  private[ext] def assignWithUnit(embeddings: DataFrame, cb: DataFrame): DataFrame =
    normalized(embeddings).crossJoin(broadcast(cb))
      // fused codegen argmax (k·dim primitive loop; see VecArgmaxCell —
      // bit-identical to the array_max(transform(...)) HOF form, which
      // would run k interpreted lambda dots per row)
      .withColumn("best",
        graft.functions.VecArgmaxCell.vec_argmax_cell(col("unit"), col("cents")))
      .select(col("vec_id"), col("unit"),
        col("best.cell").as("cell"),
        col("best.cent_sim").as("cent_sim"))

  /** SemDeDup-style semantic deduplication: flag embedding near-duplicates
    * WITHIN each IVF cell. A vector is a duplicate iff some smaller-id
    * vector in the SAME cell has cosine ≥ `threshold`; `dup_of` is the
    * smallest such neighbor (the cluster's canonical representative), so
    * the verdict is deterministic under any partitioning — no float
    * averaging, no iteration.
    *
    * Scale shape: this is the pruning step of SemDeDup (Abbas et al.,
    * 2023) — the cell restriction turns the n² global pair search into
    * Σ|cell|² ≈ n²/k comparisons, and the equi-join on `cell` is an
    * ordinary hash-partitioned join: each cell's vectors co-locate on one
    * partition, nothing else cross-compares. With trained (balanced)
    * centroids the per-cell work is bounded; skewed cells would be split
    * by AQE or a finer codebook, not by changing this operator.
    *
    * Codebook size: `k = AdaptiveK` (the default) derives k ≈ √n from the
    * corpus row count — IVF's standard rule, and the regime the KProbe
    * measurement picked out — so per-cell work stays ≈ n·(n/k)=n^1.5
    * instead of silently reverting to n²/16 on a billion-row corpus. A
    * caller who needs a reproducible codebook (the oracle-gated queries
    * pin the first-16-vectors codebook) passes an explicit k. Sizing the
    * codebook costs one `count()` — parquet-metadata cheap on a raw
    * table scan, but a real aggregation job on a filtered/derived frame;
    * a caller invoking these operators in a loop over the same corpus
    * should resolve k once and pass it explicitly.
    */
  val AdaptiveK: Int = -1

  /** k ≈ √n clamped to [16, 65536] — 16 keeps tiny test corpora on the
    * fixed codebook; 2¹⁶ bounds the broadcast codebook row (~17 MB of
    * float units at dim 64) and Σ|cell|² keeps shrinking past it anyway.
    */
  def adaptiveCodebookSize(n: Long): Int =
    math.max(16, math.min(1 << 16, math.ceil(math.sqrt(n.toDouble)).toInt))

  private def resolveK(embeddings: DataFrame, k: Int): Int =
    if (k == AdaptiveK) adaptiveCodebookSize(embeddings.count()) else k

  def semanticDedup(
      embeddings: DataFrame,
      threshold: Double = 0.4,
      k: Int = AdaptiveK): DataFrame =
    semanticDedupFromAssign(
      ivfAssignWithUnit(embeddings, resolveK(embeddings, k)), threshold)

  /** [[semanticDedup]] against TRAINED (or any custom) centroids in the
    * one-row codebook format — `semanticDedupWith(corpus,
    * trainedCodebook(corpus))` is the full trained pipeline. Same pair
    * search, same verdicts contract; only the cell geometry changes.
    */
  def semanticDedupWith(
      embeddings: DataFrame,
      codebook: DataFrame,
      threshold: Double = 0.4): DataFrame =
    semanticDedupFromAssign(assignWithUnit(embeddings, codebook), threshold)

  private def semanticDedupFromAssign(
      assign: DataFrame,
      threshold: Double): DataFrame = {
    // one explicit cell exchange: the two pair-join sides AND the output
    // projection all sit above it, so exchange reuse computes the
    // assignment (scan + normalize + argmax window) exactly once — and the
    // cell equi-join needs no further shuffle, both sides arrive
    // cell-partitioned (same storage-hygiene idiom as Dedup.computedOnce).
    // EXPLICIT partition count: this exchange feeds a Σ|cell|² fan-out,
    // and AQE sizes coalescing on the exchange's own output — blind to
    // the blow-up above it (the pqKnnJoin trap, measured 8.7× there;
    // benign here only while unit rows keep the exchange big)
    val a = assign.repartition(
      assign.sparkSession.sessionState.conf.numShufflePartitions, col("cell"))
    val l = a.select(col("cell"), col("vec_id").as("a_id"), col("unit").as("a_unit"))
    val r = a.select(col("cell"), col("vec_id").as("b_id"), col("unit").as("b_unit"))
    val dups = l.join(r, Seq("cell"))
      .filter(col("a_id") < col("b_id"))
      .select(col("b_id").as("vec_id"), col("a_id"),
        round(vec_dot(col("a_unit"), col("b_unit")), 6).as("sim"))
      .filter(col("sim") >= threshold)
      .groupBy(col("vec_id"))
      .agg(min(col("a_id")).as("dup_of"))
    a.select(col("vec_id"), col("cell"))
      .join(dups, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"), col("dup_of"),
        col("dup_of").isNotNull.cast("int").as("is_dup"))
  }

  /** Materialized form of [[semanticDedup]]: the surviving corpus — every
    * vector with NO smaller-id near-duplicate in its cell (what a
    * training pipeline actually feeds downstream). Same pair search; the
    * survivors drop out via the `is_dup` flag, keeping one deterministic
    * representative per near-duplicate neighborhood.
    */
  def semanticDedupKeep(
      embeddings: DataFrame,
      threshold: Double = 0.4,
      k: Int = AdaptiveK): DataFrame =
    semanticDedup(embeddings, threshold, k)
      .filter(col("is_dup") === 0)
      .select(col("vec_id"), col("cell"))

  /** Semantic-dedup key as a PURE projection — usable on batch and
    * streaming frames alike (the streaming-twin idiom of
    * [[Dedup.withMinhashBands]]). Each vector gets its IVF `cell` from the
    * broadcast `codebook` (one static row; in a stream this is an ordinary
    * stream-static broadcast join) and a `qsig` of `sigBits` hyperplane
    * sign bits (difference-of-adjacent-dims, scale-invariant — the
    * [[annPairsLsh]] projection family). Two vectors agree on
    * (cell, qsig) with probability (1 − θ/π)^sigBits for angle θ: exact
    * and near-exact duplicates always collide; unrelated vectors collide
    * with vanishing probability as sigBits grows.
    */
  def withSemanticKey(
      df: DataFrame,
      codebook: DataFrame,
      sigBits: Int = 16): DataFrame = {
    require(sigBits >= 1 && sigBits <= 60,
      s"sigBits must be in [1, 60], got $sigBits")
    normalized(df).withColumn("__one", lit(1))
      .join(broadcast(codebook.withColumn("__one", lit(1))), Seq("__one"))
      .withColumn("__best",
        graft.functions.VecArgmaxCell.vec_argmax_cell(col("unit"), col("cents")))
      .withColumn("cell", col("__best.cell"))
      .withColumn("qsig", expr(signBandExpr(0, sigBits)))
      .drop("__one", "cents", "__best", "_norm", "unit")
  }

  /** Streaming twin of [[semanticDedupKeep]] — the incremental-crawl
    * shape: quantize each arriving vector against a codebook built ONCE
    * from the existing static corpus ([[codebook]]), then keep the first
    * arrival per (cell, qsig) within the watermark via
    * `dropDuplicatesWithinWatermark` — exactly how exact/minhash dedup
    * and decontamination already stream.
    *
    * Approximation contract (vs the batch pair search): a vector is
    * dropped iff an earlier in-watermark arrival landed in the SAME cell
    * with the SAME sign signature — a stricter, collision-based verdict
    * than the batch cosine threshold, so streaming drops are (with high
    * probability) a SUBSET of batch `is_dup` flags; recall is tuned by
    * narrowing `sigBits`. Scale shape: state is one row per distinct
    * (cell, qsig) inside the watermark window — bounded by arrival rate ×
    * window, never by corpus size — and the only join in the plan is the
    * one-row codebook broadcast; nothing shuffles on vector content.
    *
    * Degenerate vectors: a zero-norm embedding has NULL cell and an
    * all-zero signature, so ALL such arrivals share one key and collapse
    * to a single survivor per watermark window — unlike the batch
    * operator, which keeps every degenerate row (no defined cosine, no
    * pairs). Deliberate: a directionless vector has no semantic identity
    * to deduplicate BY; screen zero vectors upstream
    * ([[outliersByLabel]]/[[quantizeInt8]] both surface them) if they
    * must be preserved.
    */
  def semanticDedupStream(
      stream: DataFrame,
      corpusCodebook: DataFrame,
      eventTimeCol: String = "ts",
      delay: String = "10 minutes",
      sigBits: Int = 16): DataFrame =
    withSemanticKey(stream, corpusCodebook, sigBits)
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark("cell", "qsig")

  // ------------------------------------------------------------------
  // Codebook refresh for long-running streams
  // ------------------------------------------------------------------

  /** Versioned codebook store — the refresh mechanism for the streaming
    * twins on a drifting crawl. Spark PINS a file source's listing for the
    * life of a streaming query: overwriting the codebook's files mid-query
    * fails the next micro-batch with FAILED_READ_FILE.FILE_NOT_EXIST, and
    * `spark.catalog.refreshTable` does not reach into a running query's
    * analyzed plan (both probed on Spark 4.1 — there is no in-place
    * broadcast swap for a file-backed static side). So refresh is
    * publish-then-restart:
    *
    *  - [[publishCodebook]] writes an IMMUTABLE `v=N+1` subdirectory of
    *    `dir`. A publish never touches files a running query pinned, so
    *    retraining can run while queries are up (e.g. from a
    *    [[refreshingDedupSink]] foreachBatch).
    *  - [[latestCodebook]] resolves the newest version at DATAFRAME
    *    CREATION — i.e. at query (re)start. Stop the query, restart from
    *    the SAME checkpoint: dedup state survives, the new codebook takes
    *    effect. (A rolling restart is how a real cluster rotates any
    *    broadcast-shaped model artifact.)
    *
    * Cross-swap dedup contract: `qsig` derives from the vector alone and
    * survives any swap; `cell` derives from the codebook. A duplicate
    * whose first arrival was keyed under the OLD codebook is re-admitted
    * after a swap iff the two codebooks disagree on its cell — at most one
    * extra survivor per (cell, qsig) neighborhood per swap — while
    * arrivals keyed AFTER the swap keep deduplicating exactly.
    */
  def publishCodebook(cb: DataFrame, dir: String): Int = {
    val next = codebookVersions(cb.sparkSession, dir).lastOption.getOrElse(0) + 1
    // one row — coalesce(1) writes one file, errorIfExists keeps versions immutable
    cb.coalesce(1).write.mode("errorifexists").parquet(s"$dir/v=$next")
    next
  }

  /** Published versions under `dir`, ascending (Hadoop FS — works on any
    * cluster filesystem, not just local disk).
    */
  def codebookVersions(spark: org.apache.spark.sql.SparkSession, dir: String): Seq[Int] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath.getName)
      .collect { case s if s.startsWith("v=") && s.drop(2).nonEmpty
        && s.drop(2).forall(_.isDigit) => s.drop(2).toInt }
      .sorted
  }

  /** The newest published codebook (one row, [[codebook]] format). Resolved
    * at creation time — call at query (re)start, not once per process.
    */
  def latestCodebook(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val vs = codebookVersions(spark, dir)
    require(vs.nonEmpty, s"no codebook versions published under $dir")
    spark.read.parquet(s"$dir/v=${vs.last}")
  }

  /** foreachBatch sink for [[semanticDedupStream]] that drives PERIODIC
    * retraining: append each micro-batch's survivors to `outPath`
    * (partitioned by `batch_id` so retraining can partition-prune), and
    * every `refreshEvery` batches retrain a [[trainedCodebook]] from the
    * TRAILING `trailingBatches` micro-batches of survivors and publish a
    * new version to `cbDir`. The publish is additive (see
    * [[publishCodebook]]) — the running query keeps its pinned codebook;
    * the next restart picks the retrained one up via [[latestCodebook]].
    *
    * The trailing window is what makes refresh viable on an UNBOUNDED
    * stream: retraining from all survivors so far costs O(corpus) per
    * refresh and grows without limit, while the trailing read is bounded
    * by `trailingBatches` × batch size regardless of stream age — and the
    * bound is enforced by parquet PARTITION pruning on `batch_id`, so
    * files outside the window are never opened (only the directory
    * listing, cheap metadata, still sees them). Recency is also the
    * semantically right training set for a drifting crawl: the refresh
    * exists to track drift, and year-old survivors anchor the centroids
    * to where the distribution used to be.
    */
  def refreshingDedupSink(
      outPath: String,
      cbDir: String,
      k: Int = 16,
      iters: Int = 2,
      refreshEvery: Int = 10,
      trailingBatches: Int = 100): (DataFrame, Long) => Unit = {
    require(refreshEvery >= 1, s"refreshEvery must be >= 1, got $refreshEvery")
    require(trailingBatches >= 1, s"trailingBatches must be >= 1, got $trailingBatches")
    (batch, batchId) => {
      // DYNAMIC partition overwrite, not append: foreachBatch MAY
      // re-deliver the last batch id after a crash, and an append would
      // double that batch's survivors in the log — and in every
      // trailing-window retrain that includes it (the historyAndState /
      // hotSwapDedupSink idempotence contract)
      batch.withColumn("batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id").parquet(outPath)
      if ((batchId + 1) % refreshEvery == 0) {
        // replay guard: a crash AFTER a publish but before the
        // micro-batch commits would re-fire this refresh on re-delivery
        // and publish a spurious duplicate version (and pay the retrain
        // twice). The marker makes the refresh at-most-once per batch
        // id up to the marker's own crash window — inside which the
        // duplicate publish carries IDENTICAL centroids (same trailing
        // window, deterministic training), so consumers see version
        // churn at worst, never a different model.
        val marker = new org.apache.hadoop.fs.Path(
          s"$outPath/_refreshed_batch_$batchId")
        val fs = marker.getFileSystem(
          batch.sparkSession.sparkContext.hadoopConfiguration)
        if (!fs.exists(marker)) {
          publishCodebook(
            trainedCodebook(
              trailingSurvivors(batch.sparkSession, outPath, batchId, trailingBatches,
                Some(batch.schema)),
              k, iters),
            cbDir)
          fs.create(marker, true).close()
        }
        // retention for the guards themselves: foreachBatch only ever
        // re-delivers the LAST batch id, so every marker below the
        // current one is dead — sweep them here or the survivor-log
        // root's listing metadata grows one file per refresh forever
        // (the same unbounded-listing failure pruneBatchPartitions
        // exists to stop, which skips these non-`batch_id=` entries)
        fs.listStatus(new org.apache.hadoop.fs.Path(outPath)).foreach { st =>
          val n = st.getPath.getName
          if (n.startsWith("_refreshed_batch_") && n.drop(17).nonEmpty &&
              n.drop(17).forall(c => c >= '0' && c <= '9') &&
              n.drop(17).toLong < batchId)
            fs.delete(st.getPath, false)
        }
      }
    }
  }

  /** IN-PLACE codebook hot swap — the foreachBatch formulation of
    * [[semanticDedupStream]] that picks up a newly published codebook at
    * the NEXT micro-batch, with no query restart. The pinned-listing
    * limitation ([[publishCodebook]] scaladoc) applies to file-backed
    * static sides inside a STREAMING plan; inside `foreachBatch` every
    * micro-batch is a fresh BATCH query, so re-resolving
    * [[latestCodebook]] per batch is an ordinary read — that one line is
    * the entire swap mechanism.
    *
    * What replaces `dropDuplicatesWithinWatermark`'s managed state: a
    * (cell, qsig) key store under `outPath/keys`, partitioned by
    * `batch_id`. Each batch (a) keys its rows against the CURRENT
    * codebook, (b) keeps the min-`vec_id` row per key in-batch, (c)
    * anti-joins the keys of the trailing `dedupBatches` batches — the
    * manual analogue of the watermark bound, enforced by parquet
    * PARTITION pruning so old key files are never opened — and (d)
    * writes survivors + keys with DYNAMIC partition overwrite, so
    * foreachBatch's re-delivered last batch replays idempotently (the
    * [[graft.io.Sinks]] contract; the trailing read excludes the current
    * batch id, so a replay sees exactly the pre-crash prior state).
    *
    * Scale shape: the batch side is micro-batch-sized; the prior side is
    * bounded by `dedupBatches` × batch size at ANY stream age; nothing
    * ever scans the full history. Cross-swap dedup contract is identical
    * to the restart path (at most one extra survivor per (cell, qsig)
    * neighborhood per swap, only where the codebooks disagree on the
    * cell) — but the swap lands one micro-batch after publish instead of
    * at the next restart. With `pruneKeys` the sink also deletes key
    * partitions below the current batch's own window floor
    * ([[graft.io.Maintenance.pruneBatchPartitions]]; the floor is
    * replay-safe — see the call-site comment), bounding key-store DISK
    * (not just reads) on an unbounded stream; survivor data under
    * `/data` is the product and is never pruned.
    *
    * Choosing `dedupBatches` (measured, `graft.HotSwapProbe` sweep in
    * BENCH_SF1.md "Round 11"): per-batch cost is FLAT in stream age for
    * any window (late/steady ≤ 1.05 even at 200k all-distinct
    * rows/batch, 100× the original probe volume) while the unbounded
    * regime grows without limit (2.19× in its first 60 batches) — so the
    * knob prices only the window's own size, not the stream's age. That
    * price is a fixed floor up to W≈25 (per-batch machinery dominates:
    * W=5 and W=25 both ≈1.0–1.1 s at 20k rows) and then roughly linear
    * in W (W=100 ≈2.4× W=25 — trailing-partition listing/open plus the
    * W×batch-size anti-join side). The default is 25: it sits at the
    * top of the free plateau, covers the burst-of-near-identical-
    * arrivals horizon this sink exists for, and its key store stayed at
    * ~4 MB/26 partitions at the 100×-volume point. Streams whose
    * duplicate horizon is genuinely longer should raise it and pay the
    * measured linear price — the flat-in-age property holds at any W.
    */
  def hotSwapDedupSink(
      cbDir: String,
      outPath: String,
      dedupBatches: Int = 25,
      sigBits: Int = 16,
      pruneKeys: Boolean = false): (DataFrame, Long) => Unit = {
    require(dedupBatches >= 1, s"dedupBatches must be >= 1, got $dedupBatches")
    (batch, batchId) => {
      val spark = batch.sparkSession
      val keyed = withSemanticKey(batch, latestCodebook(spark, cbDir), sigBits)
      // in-batch keep-first as a min_by AGGREGATE, not a (cell, qsig)
      // window: a burst of near-identical arrivals — the case this sink
      // exists for — is one hot key, and a window partition cannot be
      // split; min_by partial-aggregates the cluster map-side (the
      // pipeline_curate2 idiom)
      val local = keyed
        .groupBy(col("cell"), col("qsig"))
        .agg(min_by(
          struct(keyed.columns.map(col): _*), col("vec_id")).as("_r"))
        .select(col("_r.*"))
      val survivors = local
        .join(priorKeys(spark, s"$outPath/keys", batchId, dedupBatches),
          Seq("cell", "qsig"), "left_anti")
        .persist()
      try {
        Seq(
          (survivors, s"$outPath/data"),
          (survivors.select(col("cell"), col("qsig")), s"$outPath/keys")
        ).foreach { case (df, dir) =>
          // replay hygiene BEFORE the write: dynamic overwrite only
          // replaces partitions the new result TOUCHES — if a publish
          // landed between a crashed attempt and its re-delivery and the
          // replay's survivor set shrank (or emptied), the crashed
          // attempt's stale rows would otherwise persist as phantom
          // survivors. Clearing this batch's own partition first makes
          // the replay idempotent under any codebook.
          val part = new org.apache.hadoop.fs.Path(s"$dir/batch_id=$batchId")
          val fs = part.getFileSystem(spark.sparkContext.hadoopConfiguration)
          if (fs.exists(part)) fs.delete(part, true)
          df.withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id").parquet(dir)
        }
      } finally survivors.unpersist()
      // keys below the CURRENT batch's window floor are dead operational
      // state (survivor data under /data is the product and is kept).
      // The floor is batchId - dedupBatches, NOT +1: a crash after the
      // prune re-delivers THIS batch id, and its replayed anti-join must
      // still see its own floor partition — pruning one tighter would
      // re-admit a duplicate of a floor-batch key on replay. One stale
      // partition lingers until the next batch prunes it; replay safety
      // is worth a partition of slack.
      if (pruneKeys)
        graft.io.Maintenance.pruneBatchPartitions(
          spark, s"$outPath/keys", batchId - dedupBatches)
      ()
    }
  }

  /** The (cell, qsig) keys of the trailing `dedupBatches` micro-batches
    * STRICTLY BEFORE `batchId` — the prior-state read of
    * [[hotSwapDedupSink]]. Explicit schema (no footer sampling), filter
    * on the `batch_id` partition column only (pruning, not scanning),
    * empty frame before the first write.
    */
  def priorKeys(
      spark: org.apache.spark.sql.SparkSession,
      keysDir: String,
      batchId: Long,
      dedupBatches: Int): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(keysDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
      spark.range(0).selectExpr(
        "cast(null as bigint) as cell", "cast(null as bigint) as qsig")
    else
      spark.read
        .schema("cell BIGINT, qsig BIGINT, batch_id BIGINT")
        .parquet(keysDir)
        .where(col("batch_id").between(batchId - dedupBatches, batchId - 1))
        .select(col("cell"), col("qsig"))
  }

  /** The survivors written by [[refreshingDedupSink]] for the trailing
    * `trailingBatches` micro-batches ending at `upToBatch`, with the
    * `batch_id` bookkeeping column dropped. The `batch_id >= lo` filter
    * lands on the parquet PARTITION column, so the scan opens only the
    * trailing window's files — refresh cost is independent of how long
    * the stream has been running. Pass `schema` (the survivor schema
    * WITHOUT `batch_id`; the sink passes its micro-batch schema) to skip
    * footer-sampling schema inference entirely — on a long-lived survivor
    * directory even the inference read is a file open the refresh
    * shouldn't pay.
    */
  def trailingSurvivors(
      spark: org.apache.spark.sql.SparkSession,
      outPath: String,
      upToBatch: Long,
      trailingBatches: Int,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    // fail LOUDLY on a legacy flat (non-batch_id-partitioned) survivor
    // log: with the explicit schema, a missing partition column reads as
    // all-NULL, the window filter drops every row, and the retrain would
    // silently train a degenerate codebook from zero rows
    val p = new org.apache.hadoop.fs.Path(outPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) {
      val entries = fs.listStatus(p).toSeq.map(_.getPath.getName)
        .filterNot(n => n.startsWith("_") || n.startsWith("."))
      require(entries.isEmpty || entries.exists(_.startsWith("batch_id=")),
        s"trailingSurvivors($outPath): no batch_id= partitions found — " +
          "this looks like a legacy flat survivor log; re-ingest it " +
          "through the partitioned sink before retraining from it")
    }
    val reader = schema.fold(spark.read)(s =>
      spark.read.schema(s.add("batch_id", org.apache.spark.sql.types.LongType)))
    reader.parquet(outPath)
      .where(col("batch_id") >= upToBatch - (trailingBatches - 1))
      .drop("batch_id")
  }

  /** Streaming kNN: top-`kNbrs` corpus neighbors for every QUERY vector
    * arriving on a stream (schema: `vec_id`, event-time, `embedding`) —
    * the retrieval-serving twin of the batch [[knnJoin]]. Emits one row
    * per (event-time window, query): `window_start, query_id, nbr_ids`
    * (best-first), finalized when the watermark passes the window.
    * Requests are idempotent: a query id re-arriving inside the
    * watermark is deduplicated before scoring (a re-ask is the same
    * request, not a new candidate set).
    *
    * Plan shape, stream-side stateless until the last step: (1) the
    * arriving vector gets its IVF cell from the broadcast one-row
    * [[codebook]] (or a [[trainedCodebook]]) — a pure projection; (2) a
    * stream-static equi-join on `cell` against the cell-indexed corpus
    * generates only same-cell candidates (the [[ivfTopK]] nprobe=1
    * contract: Σ per-query work ≈ |cell|, not |corpus|); (3) the windowed
    * top-k is a [[graft.functions.TopKAggregator]], so each partition
    * forwards ≤ kNbrs rows per (window, query) to the state store —
    * never the full candidate list. State is bounded by
    * queries-per-window · kNbrs, independent of corpus size.
    *
    * The static side re-executes per micro-batch by Spark's stream-static
    * join contract; a long-running server caches the index (storage-level
    * pin, caller-owned) or maintains it as its own table.
    */
  def knnStream(
      queries: DataFrame,
      corpus: DataFrame,
      kNbrs: Int = 3,
      k: Int = 16,
      eventTimeCol: String = "ts",
      delay: String = "10 minutes",
      windowLen: String = "10 minutes"): DataFrame = {
    val idx = ivfAssignWithUnit(corpus, k)
      .filter(col("cell").isNotNull)
      .select(col("cell"), col("vec_id").as("nbr_id"), col("unit").as("nbr_unit"))
    val cb = codebook(corpus, k)
    val assigned = normalized(queries).withColumn("__one", lit(1))
      .join(broadcast(cb.withColumn("__one", lit(1))), Seq("__one"))
      .withColumn("__best",
        graft.functions.VecArgmaxCell.vec_argmax_cell(col("unit"), col("cents")))
      .withColumn("cell", col("__best.cell"))
      .filter(col("cell").isNotNull)
      .select(col("vec_id").as("query_id"), col(eventTimeCol), col("unit"), col("cell"))
    // idempotent serving: a query id re-arriving inside the watermark is
    // the same request — without this dedup its candidates would be
    // scored twice and duplicate (sim, nbr_id) pairs could occupy top-k
    // slots. Chained stateful ops (dedup → windowed agg) are the
    // supported multi-stateful append shape.
    val once = assigned
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark("query_id")
    val scored = once.join(idx, Seq("cell"))
      .withColumn("sim", round(vec_dot(col("unit"), col("nbr_unit")), 6))
    val topk = udaf(new graft.functions.TopKAggregator(kNbrs),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Double, Long)]())
    scored
      .groupBy(window(col(eventTimeCol), windowLen).as("win"), col("query_id"))
      .agg(topk(col("sim"), col("nbr_id")).as("nbr_ids"))
      .select(col("win.start").as("window_start"), col("query_id"), col("nbr_ids"))
  }

  /** Unit vectors quantized to the INTEGER lattice (×10⁶, round-half-up):
    * the domain where k-means becomes cross-engine exact. Float centroid
    * means are order-dependent (a parallel sum of doubles depends on
    * partition order), so a float Lloyd's loop can diverge from a serial
    * oracle on argmax ties; int64 sums are associative and exact, so every
    * assignment, mean and tie-break below is bit-identical in any engine
    * and under any partitioning. Quantization error (≤5e-7 per component)
    * is far below any meaningful cluster geometry. NULL for zero-norm
    * vectors — same "no cell" contract as [[ivfAssignWithUnit]].
    */
  /** Integer-exact PCA over the quantized unit vectors — the dimension
    * reducer in front of clustering/ANN (whiten, drop the tail, then
    * cluster in k dims instead of d). The scatter matrix M = n·T − S·Sᵀ
    * (T = Σ q qᵀ upper triangle, S = Σ q) is accumulated as ONE pass of
    * int64 sums via [[graft.functions.LongVecSumAggregator]] — map-side
    * combined, d(d+3)/2 longs per partition buffer, so the exchange is
    * partitions·O(d²) whatever n is, and the matrix every engine would
    * derive is bit-identical (integer addition commutes). The d×d
    * eigenproblem is driver-side cyclic Jacobi (deterministic fixed
    * sweeps; d is the embedding dim, not the corpus), mirroring
    * [[kmeansAssign]]'s train-on-aggregate shape. At corpus scale the
    * same aggregate runs on a sample and the components broadcast.
    *
    * Gate contract (the sketch-gate idiom): eigenvectors are float and
    * engine-specific, so the gated output carries the exact integers
    * SQL can recompute — n and trace(M) (total scaled variance, as a
    * digit string: it exceeds int64 at corpus counts) — plus boolean
    * verdicts the Spark side PROVES distributedly: for each of the top
    * k components, the population variance of the actual projections
    * (computed by a second distributed pass over every vector) matches
    * the eigenvalue, the component set is orthonormal, the residual
    * ‖Mv − λv‖ is tiny, and the spectrum is sorted. Signs are fixed by
    * making each component's largest-|coefficient| entry positive.
    */
  def embedPca(embeddings: DataFrame, k: Int = 8): DataFrame = {
    require(k >= 1 && k <= 64, s"k must be in [1,64], got $k")
    val spark = embeddings.sparkSession
    val q = quantizedUnits(embeddings).filter(col("qvec").isNotNull)
    val (n, d, trace, eigVals, eigVecs) = pcaEigen(q)
    val kk = math.min(k, d)
    val traceD = trace.toDouble

    // driver-side verdicts over the top-k pairs
    val orthoOk = orthoVerdict(eigVecs, kk)
    val orderOk = (1 until kk).forall(i => eigVals(i) <= eigVals(i - 1) * (1 + 1e-12) + 1e-9)

    // distributed proof: project EVERY vector on every component, then
    // match the population variance n·Σy² − (Σy)² against λ. The
    // projection is the codegen'd [[graft.functions.VecDot]] (long
    // elements widen to double exactly like the HOF's x * w Multiply,
    // left-to-right — bit-identical, ExtSpec-pinned); the HOF form
    // paid 2·k·dim interpreted lambda calls per row because the `y`
    // SQL string was spliced into BOTH sum(y) and sum(y*y)
    val projCols = (0 until kk).flatMap { c =>
      val y = vec_dot(col("qvec"), typedLit(eigVecs(c).toSeq))
      Seq(sum(y).as(s"sy_$c"), sum(y * y).as(s"syy_$c"))
    }
    val aggRow = q.agg(count(lit(1)).as("n"), projCols: _*).head()
    val rows = (0 until kk).map { c =>
      val sy = aggRow.getDouble(aggRow.fieldIndex(s"sy_$c"))
      val syy = aggRow.getDouble(aggRow.fieldIndex(s"syy_$c"))
      val varScaled = n.toDouble * syy - sy * sy
      val lam = eigVals(c)
      val varOk = math.abs(varScaled - lam) <=
        math.max(1e-6 * math.abs(lam), 1e-7 * math.max(traceD, 1.0))
      (c, n, trace.toString, varOk, orthoOk, residOk(c, eigVals, eigVecs, d), orderOk)
    }
    import spark.implicits._
    rows.toDF("component", "n", "trace_scaled", "var_ok", "ortho_ok",
      "resid_ok", "order_ok")
  }

  /** Projection of every vector onto [[embedPca]]'s top-k components —
    * the serving half: one broadcast-free scan (components ride in the
    * expression), vectors never shuffle. */
  def pcaProject(embeddings: DataFrame, k: Int = 8): DataFrame = {
    require(k >= 1 && k <= 64, s"k must be in [1,64], got $k")
    val q = quantizedUnits(embeddings).filter(col("qvec").isNotNull)
    val (_, d, _, _, eigVecs) = pcaEigen(q)
    val kk = math.min(k, d)
    val projExprs = (0 until kk).map { c =>
      vec_dot(col("qvec"), typedLit(eigVecs(c).toSeq)).as(s"pc_$c")
    }
    q.select(col("vec_id") +: projExprs: _*)
  }

  /** Streaming twin of the PCA trainer: each micro-batch reduces to ONE
    * scatter partial — the int64 vector [n, S, triu(T)] — written to a
    * batch-id directory (whole-dir overwrite ⇒ replay-idempotent), the
    * [[graft.ops.Quality.cusumDriftSink]] mergeable-partials doctrine
    * applied to covariance: integer sums merge associatively, so
    * base + any committed prefix re-derives the EXACT batch-path scatter
    * matrix, and the model updates from bounded partials, never from
    * replayed vectors. */
  def pcaScatterSink(
      embeddings: DataFrame,
      outDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    embeddings.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        pcaScatterBatch(batch.toDF(), outDir, batchId)
      }
      .start()

  /** One micro-batch's scatter partial (factored out for replay tests).
    * An all-null batch writes an empty (schema-complete) partial so
    * replay stays idempotent without poisoning the merge. */
  def pcaScatterBatch(df: DataFrame, outDir: String, batchId: Long): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val q = quantizedUnits(df).filter(col("qvec").isNotNull)
    val out = scatterOut(q)
    val rows =
      if (out.n == 0L) Seq.empty[Seq[Long]]
      else Seq(out.n +: out.sums)
    rows.toDF("partial")
      .write.mode("overwrite").parquet(s"$outDir/scatter/batch_$batchId")
    ()
  }

  /** PCA over base vectors plus every committed [[pcaScatterSink]]
    * partial. Same verdict row as [[embedPca]] minus `var_ok`: the
    * streamed vectors exist only as scatter partials, so the
    * distributed projection-variance pass has nothing to rescan —
    * the remaining verdicts (trace witness, orthonormality, residual,
    * ordering) cover the merged model. */
  def embedPcaFrom(
      spark: org.apache.spark.sql.SparkSession,
      base: DataFrame,
      outDir: String,
      k: Int = 8): DataFrame = {
    require(k >= 1 && k <= 64, s"k must be in [1,64], got $k")
    import spark.implicits._
    val baseOut = scatterOut(quantizedUnits(base).filter(col("qvec").isNotNull))
    val basePartial =
      if (baseOut.n == 0L) Seq.empty[Seq[Long]] else Seq(baseOut.n +: baseOut.sums)
    val committed = graft.ext.TextOps.committedBatchDirs(spark, s"$outDir/scatter")
    val all =
      if (committed.isEmpty) basePartial.toDF("partial")
      else basePartial.toDF("partial").unionByName(spark.read.parquet(
        committed.toSeq.sorted.map(b => s"$outDir/scatter/$b"): _*))
    val merged = all.select(col("partial")).as[Seq[Long]]
      .select(new graft.functions.LongVecSumAggregator[Seq[Long]](identity).toColumn)
      .head()
    require(merged.sums.nonEmpty, "no vectors in base or committed partials")
    val (n, d, trace, eigVals, eigVecs) =
      eigenFromSums(merged.sums.drop(1), merged.sums.head)
    val kk = math.min(k, d)
    val orthoOk = orthoVerdict(eigVecs, kk)
    val orderOk = (1 until kk).forall(i => eigVals(i) <= eigVals(i - 1) * (1 + 1e-12) + 1e-9)
    (0 until kk).map { c =>
      (c, n, trace.toString, orthoOk, residOk(c, eigVals, eigVecs, d), orderOk)
    }.toDF("component", "n", "trace_scaled", "ortho_ok", "resid_ok", "order_ok")
  }

  private def orthoVerdict(eigVecs: Array[Array[Double]], kk: Int): Boolean = {
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    (0 until kk).forall { i =>
      math.abs(dot(eigVecs(i), eigVecs(i)) - 1.0) < 1e-9 &&
        (i + 1 until kk).forall(j => math.abs(dot(eigVecs(i), eigVecs(j))) < 1e-9)
    }
  }

  /** ‖Mv − λv‖ ≤ tol·‖λv‖-ish residual verdict for component c, with an
    * absolute floor for near-null eigenvalues. M is rebuilt from the
    * eigen-decomposition's own basis — cheap at d×d. */
  private def residOk(
      c: Int, eigVals: Array[Double], eigVecs: Array[Array[Double]], d: Int): Boolean = {
    // Mv = Σ_j λ_j (v_j·v) v_j; for v = v_c with an orthonormal basis
    // this is λ_c v_c up to float error — check against the full basis
    val v = eigVecs(c)
    val mv = new Array[Double](d)
    var j = 0
    while (j < d) {
      val vj = eigVecs(j)
      var dotv = 0.0
      var i = 0
      while (i < d) { dotv += vj(i) * v(i); i += 1 }
      val w = eigVals(j) * dotv
      i = 0
      while (i < d) { mv(i) += w * vj(i); i += 1 }
      j += 1
    }
    val lam = eigVals(c)
    var err = 0.0
    var i = 0
    while (i < d) { val e = mv(i) - lam * v(i); err += e * e; i += 1 }
    val scale = math.max(math.abs(lam), eigVals.map(math.abs).max * 1e-9)
    math.sqrt(err) <= 1e-6 * math.max(scale, 1.0)
  }

  /** One-pass scatter accumulation + driver Jacobi. Returns
    * (n, d, trace(M) exact, eigenvalues desc, eigenvectors row-major). */
  private def pcaEigen(q: DataFrame): (Long, Int, BigInt, Array[Double], Array[Array[Double]]) = {
    val out = scatterOut(q)
    eigenFromSums(out.sums, out.n)
  }

  /** One-pass scatter reduction: Σ over rows of [qvec ++ triu(q·qᵀ)]. */
  private def scatterOut(q: DataFrame): graft.functions.LongVecSumAggregator.Out = {
    val spark = q.sparkSession
    import spark.implicits._
    val agg = new graft.functions.LongVecSumAggregator[Seq[Long]]({ v =>
      val d = v.length
      val out = new Array[Long](d + d * (d + 1) / 2)
      var i = 0
      while (i < d) { out(i) = v(i); i += 1 }
      var idx = d
      i = 0
      while (i < d) {
        var j = i
        while (j < d) { out(idx) = v(i) * v(j); idx += 1; j += 1 }
        i += 1
      }
      scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
    })
    q.select(col("qvec")).as[Seq[Long]].select(agg.toColumn).head()
  }

  private def eigenFromSums(
      sums: Seq[Long], n: Long): (Long, Int, BigInt, Array[Double], Array[Array[Double]]) = {
    require(n >= 2, s"PCA needs at least 2 vectors, got $n")
    val len = sums.length
    val d = ((math.sqrt(9.0 + 8.0 * len) - 3.0) / 2.0).round.toInt
    require(d + d * (d + 1) / 2 == len, s"malformed scatter buffer of length $len")
    val s = sums.take(d).toArray
    val t = sums.drop(d).toArray
    val nB = BigInt(n)
    val m = Array.ofDim[Double](d, d)
    var trace = BigInt(0)
    var idx = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val mij = nB * BigInt(t(idx)) - BigInt(s(i)) * BigInt(s(j))
        if (i == j) trace += mij
        m(i)(j) = mij.toDouble
        m(j)(i) = m(i)(j)
        idx += 1
        j += 1
      }
      i += 1
    }
    val (vals, vecs) = jacobiEigen(m)
    (n, d, trace, vals, vecs)
  }

  /** Cyclic Jacobi with a fixed sweep count — deterministic for a given
    * input matrix (plain IEEE ops, no data-dependent iteration), which
    * is all the gate needs since the matrix itself is integer-derived.
    * Returns (eigenvalues desc, eigenvectors row-major, sign-fixed so
    * each vector's largest-|coefficient| entry is positive). */
  private def jacobiEigen(
      a: Array[Array[Double]], sweeps: Int = 24): (Array[Double], Array[Array[Double]]) = {
    val d = a.length
    val m = a.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    while (sweep < sweeps) {
      var p = 0
      while (p < d - 1) {
        var qi = p + 1
        while (qi < d) {
          val apq = m(p)(qi)
          if (apq != 0.0) {
            val theta = (m(qi)(qi) - m(p)(p)) / (2.0 * apq)
            val tt =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              else 1.0 / (theta - math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(tt * tt + 1.0)
            val sn = tt * c
            var i = 0
            while (i < d) {
              val mip = m(i)(p); val miq = m(i)(qi)
              m(i)(p) = c * mip - sn * miq
              m(i)(qi) = sn * mip + c * miq
              i += 1
            }
            i = 0
            while (i < d) {
              val mpi = m(p)(i); val mqi = m(qi)(i)
              m(p)(i) = c * mpi - sn * mqi
              m(qi)(i) = sn * mpi + c * mqi
              val vip = v(i)(p); val viq = v(i)(qi)
              v(i)(p) = c * vip - sn * viq
              v(i)(qi) = sn * vip + c * viq
              i += 1
            }
          }
          qi += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => (-m(i)(i), i))
    val vals = order.map(i => m(i)(i)).toArray
    val vecs = order.map { ci =>
      val col = Array.tabulate(d)(r => v(r)(ci))
      // sign convention: largest-|coeff| entry positive, ties to the
      // earliest index
      var best = 0
      var i = 1
      while (i < d) { if (math.abs(col(i)) > math.abs(col(best))) best = i; i += 1 }
      if (col(best) < 0) col.map(x => -x) else col
    }.toArray
    (vals, vecs)
  }

  // fused normalize+quantize kernel (one codegen loop; see
  // [[graft.functions.VecQuantizeUnit]]) — bit-identical to the
  // normalized() + transform chain it replaced (ExtSpec pins it),
  // which paid two interpreted transforms and a double-evaluated norm
  // dot per vector
  private def quantizedUnits(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"),
      graft.functions.LongVecFunctions.vec_quantize_unit(col("embedding"))
        .as("qvec"))

  /** Nearest-centroid assignment in the integer domain: one broadcast row
    * of (cidx, qcent) structs against one scan; the argmax is an exact
    * int64 dot per centroid (spherical k-means: on unit vectors, max
    * cosine ≡ min L2), ties to the smallest centroid id. EVERY row
    * surfaces — a NULL qvec (zero-norm vector) or an empty codebook gets
    * NULL cell/qdot via the when-guard, so no caller needs a join back to
    * recover degenerate rows (the guard replaced a re-attach LEFT JOIN,
    * which was a whole vec_id shuffle spent on rows the projection can
    * classify for free).
    */
  private def assignQCells(q: DataFrame, cents: DataFrame): DataFrame = {
    val centsRow = cents
      .agg(collect_list(struct(col("cidx"), col("qcent"))).as("cents"))
    // fused codegen argmax (k·dim primitive loop) — bit-identical to the
    // HOF `array_max(transform(cents, c -> (dot, -cidx)))` form it
    // replaced (ExtSpec pins the equivalence); the HOF form paid
    // k·dim interpreted lambda calls plus a struct allocation per
    // centroid per row
    q.crossJoin(broadcast(centsRow))
      .withColumn("__best",
        when(col("qvec").isNotNull && size(col("cents")) > 0,
          vec_argmax_qcell(col("qvec"), col("cents"))))
      .select(col("vec_id"), col("qvec"),
        col("__best.cell").as("cell"), col("__best.qdot").as("qdot"))
  }

  /** `iters` rounds of Lloyd's over the quantized units. Init is the k
    * smallest vec_ids (the [[codebook]] convention — centroid identity =
    * seed vec_id, so ties resolve to the smallest seed, matching
    * `ivfAssign`). Update = per-component integer mean (round-half-up via
    * exact double division of exact int64s — identical in any IEEE
    * engine); cells that lose all members drop out, shrinking k. Each
    * round is one explode-aggregate shuffle of n·dim (cell, pos, value)
    * rows — the standard distributed k-means cost; at corpus scale the
    * codebook trains on a SAMPLE, which changes the input, not this loop.
    * Plan lineage doubles per round (assignment feeds update), so `iters`
    * is capped small; a long-running trainer would checkpoint per round
    * exactly as [[Graph.pageRank]] does.
    *
    * The update is a [[graft.functions.LongVecSumAggregator]] — per-cell
    * element-wise sums combined MAP-SIDE, so the round's exchange carries
    * ≤ k rows per partition instead of the n·dim rows a
    * posexplode/groupBy(cell, pos) formulation shuffles. At sf0.1 both
    * forms time identically (~1.6 s — the cost is the 2·iters+1
    * SEQUENTIAL job rounds, not data volume); the aggregator's win is the
    * exchange-size asymptotics, which is what matters at corpus scale.
    * Integer sums are order-independent, so the aggregator keeps the
    * loop's cross-engine exactness.
    */
  private def kmeansCentroids(q: DataFrame, k: Int, iters: Int): DataFrame = {
    val spark = q.sparkSession
    import spark.implicits._
    var cents = q.filter(col("qvec").isNotNull)
      .orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").as("cidx"), col("qvec").as("qcent"))
    for (_ <- 1 to iters) {
      cents = assignQCells(q, cents)
        .filter(col("cell").isNotNull)
        .select(col("cell"), col("qvec")).as[(Long, Seq[Long])]
        .groupByKey(_._1)
        .agg(new graft.functions.LongVecSumAggregator[(Long, Seq[Long])](_._2)
          .toColumn.name("sc"))
        .select(col("key").as("cidx"),
          expr("transform(sc.sums, s -> cast(floor(cast(s as double) / cast(sc.n as double) + 0.5) as bigint))")
            .as("qcent"))
    }
    cents
  }

  /** Trained k-means cell assignment — Lloyd's for `iters` rounds, then
    * the final assignment of EVERY vector (zero-norm/null vectors surface
    * with NULL cell). The trained sibling of [[ivfAssign]]'s first-k
    * codebook: same argmax contract, centroids that have actually moved
    * to their clusters' means. Deliberately EXACT cross-engine (see
    * [[quantizedUnits]]) so the whole iterative loop sits under the
    * DuckDB hash gate — the first trained-model operator to do so.
    */
  def kmeansAssign(embeddings: DataFrame, k: Int = 8, iters: Int = 2): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 0 && iters <= 8,
      s"iters must be in [0, 8] (lineage doubles per round; checkpoint a longer trainer), got $iters")
    val q = quantizedUnits(embeddings)
    val cents = kmeansCentroids(q, k, iters)
    assignQCells(q, cents).select(col("vec_id"), col("cell"), col("qdot"))
  }

  /** Simplified (centroid-based) silhouette of the trained k-means
    * clustering — the INTERNAL validity twin of
    * [[graft.ops.Audit.clusterPurity]]'s external one: per point,
    * a = distance to its OWN centroid, b = distance to the NEAREST OTHER
    * centroid, s = (b − a) / max(a, b) ∈ [−1, 1]; the per-cell mean says
    * which clusters are tight and which bleed. The simplified form
    * (Hruschka et al.'s centroid variant of Rousseeuw 1987) replaces the
    * classic all-pairs a/b (O(n²) — a scale-killer) with distances to k
    * centroids: O(n·k), one broadcast of the trained codebook, zero
    * exchanges past the training.
    *
    * Exactness: squared distances are exact int64 sums over the
    * quantized integer units (Σ(x−c)², envelope 64·(2·10⁶)² ≈ 2.6·10¹⁴);
    * sqrt is IEEE-correctly-rounded in every engine, so s is a fixed
    * expression tree over exact witnesses, accumulated in fixed-point
    * micro-units (the ndcgEval discipline — float sums are
    * order-dependent, integer sums are not). Points with NULL cells
    * (zero-norm) or no other cell (k effectively 1) are excluded as
    * undefined rather than defaulted.
    */
  def silhouetteSimplified(
      embeddings: DataFrame, k: Int = 8, iters: Int = 2): DataFrame = {
    require(k >= 2, s"silhouette needs k >= 2, got $k")
    require(iters >= 0 && iters <= 8, s"iters must be in [0, 8], got $iters")
    val q = quantizedUnits(embeddings)
    val cents = kmeansCentroids(q, k, iters)
    val centsRow = cents
      .agg(collect_list(struct(col("cidx"), col("qcent"))).as("cents"))
    // fused own-cell / nearest-other-cell distances (one codegen loop;
    // see [[graft.functions.VecCellL2]]) — bit-identical to the
    // transform + two-filter HOF chain it replaced (ExtSpec pins
    // it), which materialized a k-struct array and two filtered copies
    // per row through the interpreter
    assignQCells(q, cents)
      .filter(col("cell").isNotNull)
      .crossJoin(broadcast(centsRow))
      .withColumn("__d", graft.functions.LongVecFunctions
        .vec_cell_l2(col("qvec"), col("cell"), col("cents")))
      .withColumn("a2", col("__d.a2"))
      .withColumn("b2", col("__d.b2"))
      .where(col("b2").isNotNull)
      .withColumn("s", expr(
        """CASE WHEN greatest(a2, b2) = 0 THEN 0.0d
          |     ELSE (sqrt(cast(b2 as double)) - sqrt(cast(a2 as double)))
          |          / greatest(sqrt(cast(a2 as double)), sqrt(cast(b2 as double))) END""".stripMargin))
      .groupBy(col("cell"))
      .agg(
        count(lit(1)).as("n_points"),
        sum(expr("cast(floor(s * 1000000.0d + 0.5d) as bigint)")).as("sum_s_mil"))
      .select(col("cell"), col("n_points"), col("sum_s_mil"),
        (col("sum_s_mil").cast("double") /
          (col("n_points").cast("double") * 1000000.0)).as("mean_silhouette"))
      .orderBy(col("cell"))
  }

  /** The trained codebook in [[codebook]]'s broadcastable one-row format
    * (centroids back to unit doubles), so IVF search, semantic dedup and
    * the STREAMING dedup twin can run against trained centroids instead
    * of the first-k stand-in: `withSemanticKey(stream, trainedCodebook(corpus))`.
    */
  def trainedCodebook(
      embeddings: DataFrame,
      k: Int = 16,
      iters: Int = 2): DataFrame =
    kmeansCentroids(quantizedUnits(embeddings), k, iters)
      .withColumn("dvec", expr("transform(qcent, x -> cast(x as double) / 1000000.0)"))
      .withColumn("_n", expr("sqrt(aggregate(dvec, 0D, (a, x) -> a + x * x))"))
      .filter(col("_n") > 0D)
      .withColumn("cent_unit", expr("transform(dvec, x -> x / _n)"))
      .agg(collect_list(struct(col("cidx").as("cent_id"), col("cent_unit")))
        .as("cents"))

  // ---------------------------------------------------------------------
  // Product quantization (Jégou et al. 2011, "Product Quantization for
  // Nearest Neighbor Search" — the FAISS `PQ` index family): the unit
  // vector splits into `m` subvectors, each quantized against its OWN
  // k-entry codebook, so a d-dim float vector compresses to m small
  // codes (64-dim float32 → 8 bytes at m=8, 32×) and approximate dot
  // products evaluate from per-subspace lookup tables without touching
  // the original vectors. Trained with the same INTEGER-EXACT Lloyd's
  // discipline as [[kmeansAssign]] — every assignment, mean, and ADC
  // score below is bit-identical in any engine, so the whole trained
  // PQ index sits under the DuckDB hash gate. One deliberate metric
  // difference: subvectors are NOT unit vectors, so assignment is true
  // L2 — argmin ‖x−c‖² ≡ argmax (2·x·c − c·c) — where the spherical
  // trainer's plain dot-argmax would just pick the largest-norm
  // centroid.
  // ---------------------------------------------------------------------

  /** The (vec_id, s, qsub) subvector stream: subspace `s` takes
    * components [s·sub, (s+1)·sub) of the quantized unit vector. NULL
    * qvec (zero-norm) rows keep NULL subvectors — they surface with
    * NULL codes downstream, the [[ivfAssignWithUnit]] contract.
    */
  private def pqSubvectors(q: DataFrame, m: Int, sub: Int): DataFrame =
    q.select(col("vec_id"), col("qvec"),
        explode(expr(s"sequence(0, ${m - 1})")).as("s"))
      .selectExpr("vec_id", "s",
        s"case when qvec is not null then slice(qvec, s * $sub + 1, $sub) end as qsub")

  /** Nearest-codeword assignment for EVERY subspace in one projection:
    * all m·k codewords broadcast as one row, each subvector takes the
    * argmax of the exact int64 L2 objective over ITS subspace's
    * codewords, ties to the smallest code. One scan, no joins keyed on
    * vector ids.
    */
  private def pqAssign(subs: DataFrame, cents: DataFrame): DataFrame = {
    val centsRow = cents
      .agg(collect_list(struct(col("s"), col("cidx"), col("qcent"))).as("cents"))
    // fused codegen argmax over the row's OWN subspace (one primitive
    // loop; see [[graft.functions.PqArgmaxCode]]) — bit-identical to the
    // HOF `array_max(transform(filter(cents, c.s = s), ...))` form it
    // replaced (ExtSpec pins it), which allocated the filtered
    // array plus a struct per codeword per subvector row
    subs.crossJoin(broadcast(centsRow))
      .withColumn("__best",
        when(col("qsub").isNotNull && size(col("cents")) > 0,
          pq_argmax_code(col("qsub"), col("s"), col("cents"))))
      // withColumn + drop, not a select: extra rider columns (e.g. the
      // coarse cell id in [[ivfPqTopK]]) pass through untouched
      .withColumn("code", col("__best.code"))
      .withColumn("qobj", col("__best.qobj"))
      .drop("cents", "__best")
  }

  /** `iters` rounds of multi-subspace Lloyd's — ALL m codebooks train in
    * the same pipeline (the subspace id rides as a key), so the round
    * cost is one explode-aggregate over n·m subvector rows however many
    * subspaces there are. Init: subvectors of the k smallest non-null
    * vec_ids (code identity = seed vec_id, the [[codebook]] convention).
    * Update: per-(subspace, code) integer mean via the map-side-combining
    * [[graft.functions.LongVecSumAggregator]] — ≤ m·k rows per partition
    * cross the wire.
    */
  private def pqCentroids(
      subs: DataFrame, m: Int, k: Int, iters: Int): DataFrame = {
    // every public PQ entry point (pqCodebook/pqEncode/pqTopK/pqRerank/
    // ivfPqTopK) trains through here — the k/iters bounds that keep the
    // per-round lineage doubling finite are hoisted to this single choke
    // point so no caller can reach the unbounded-lineage regime
    require(k >= 1 && iters >= 0 && iters <= 8,
      s"k >= 1, iters in [0, 8] (lineage doubles per round), got k=$k iters=$iters")
    val spark = subs.sparkSession
    import spark.implicits._
    val seeds = subs.filter(col("qsub").isNotNull && col("s") === 0)
      .orderBy(col("vec_id")).limit(k).select(col("vec_id"))
    var cents = subs.join(broadcast(seeds), Seq("vec_id"))
      .filter(col("qsub").isNotNull)
      .select(col("s"), col("vec_id").as("cidx"), col("qsub").as("qcent"))
    for (_ <- 1 to iters) {
      cents = pqAssign(subs, cents)
        .filter(col("code").isNotNull)
        .select(col("s").cast("long"), col("code"), col("qsub"))
        .as[(Long, Long, Seq[Long])]
        .groupByKey(t => (t._1, t._2))
        .agg(new graft.functions.LongVecSumAggregator[(Long, Long, Seq[Long])](_._3)
          .toColumn.name("sc"))
        .select(col("key._1").cast("int").as("s"), col("key._2").as("cidx"),
          expr("transform(sc.sums, s -> cast(floor(cast(s as double) / cast(sc.n as double) + 0.5) as bigint))")
            .as("qcent"))
    }
    cents
  }

  /** The trained PQ codebooks as a broadcastable (s, cidx, qcent) frame
    * — train once (on a SAMPLE at corpus scale), then encode anywhere
    * with [[pqEncodeWith]].
    */
  def pqCodebook(
      embeddings: DataFrame,
      m: Int = 8,
      k: Int = 8,
      iters: Int = 2): DataFrame = {
    val dim = 64
    require(m >= 1 && dim % m == 0, s"m must divide $dim, got $m")
    pqCentroids(pqSubvectors(quantizedUnits(embeddings), m, dim / m), m, k, iters)
  }

  /** Encode vectors against a FIXED trained codebook: a stateless
    * broadcast projection, so the SAME call compiles onto a streaming
    * Dataset — arriving vectors PQ-encode where they land with no state
    * and no shuffle (StreamingSpec pins stream≡batch parity). This is
    * the steady-state half of the train-once/encode-forever contract;
    * [[pqEncode]] is the self-trained batch form.
    */
  def pqEncodeWith(
      vectors: DataFrame, codebook: DataFrame, m: Int = 8): DataFrame = {
    val dim = 64
    require(m >= 1 && dim % m == 0, s"m must divide $dim, got $m")
    pqAssign(pqSubvectors(quantizedUnits(vectors), m, dim / m), codebook)
      .select(col("vec_id"), col("s"), col("code"), col("qobj"))
  }

  /** Trained PQ encoding: every vector's m codes plus the exact integer
    * L2 objective per subspace. The 100 TB contract: after training on
    * a sample, encoding is ONE broadcast-codebook scan projection, and
    * downstream stores keep (vec_id, codes) — m bytes a vector at
    * k ≤ 256 — instead of the embedding.
    */
  def pqEncode(
      embeddings: DataFrame,
      m: Int = 8,
      k: Int = 8,
      iters: Int = 2): DataFrame = {
    val dim = 64 // TESTDATA embedding width; see FIXTURES.md
    require(m >= 1 && dim % m == 0, s"m must divide $dim, got $m")
    require(k >= 1 && iters >= 0 && iters <= 8,
      s"k >= 1, iters in [0, 8] (lineage doubles per round), got k=$k iters=$iters")
    val subs = pqSubvectors(quantizedUnits(embeddings), m, dim / m)
    pqAssign(subs, pqCentroids(subs, m, k, iters))
      .select(col("vec_id"), col("s"), col("code"), col("qobj"))
  }

  /** PQ top-k by Asymmetric Distance Computation: the query keeps its
    * FULL subvectors, every corpus vector is represented only by its m
    * codes, and the approximate dot is Σ_s qsub_s · codeword(s, code_s)
    * — evaluated here as one broadcast join of the (s, code) → qdot
    * lookup TABLE (m·k rows by construction) against the code stream,
    * then a per-vector sum. Exact int64 end to end, so the trained
    * index, the encoding, and the ADC ranking all sit under one hash
    * gate; ties to the smallest vec_id.
    */
  def pqTopK(
      embeddings: DataFrame,
      queryVecId: Long = 0L,
      kNbrs: Int = 5,
      m: Int = 8,
      k: Int = 8,
      iters: Int = 2): DataFrame =
    pqTopKWith(embeddings,
      pqCodebook(embeddings, m, k, iters), queryVecId, kNbrs, m)

  /** [[pqTopK]] against a FIXED trained codebook — the serving-time half
    * of the train-once contract ([[pqEncodeWith]]'s query sibling): the
    * codebook is ≤m·k rows from ANY source (a prior [[pqCodebook]] run,
    * a loaded parquet, [[IndexCache]]), and this call only encodes and
    * ranks. Same ranking contract as [[pqTopK]].
    */
  def pqTopKWith(
      embeddings: DataFrame,
      codebook: DataFrame,
      queryVecId: Long = 0L,
      kNbrs: Int = 5,
      m: Int = 8): DataFrame = {
    val dim = 64
    require(m >= 1 && dim % m == 0, s"m must divide $dim, got $m")
    val subs = pqSubvectors(quantizedUnits(embeddings), m, dim / m)
    val cents = codebook
    val codes = pqAssign(subs, cents)
    // the ADC lookup table: the query's exact dot with every codeword
    val qSubs = subs.filter(col("vec_id") === queryVecId && col("qsub").isNotNull)
      .select(col("s").as("qs"), col("qsub").as("q_qsub"))
    val lut = cents.join(qSubs, col("s") === col("qs"))
      .select(col("s"), col("cidx").as("code"),
        vec_dot_long(col("q_qsub"), col("qcent")).as("qdot"))
    codes.filter(col("code").isNotNull && col("vec_id") =!= queryVecId)
      .join(broadcast(lut), Seq("s", "code"))
      .groupBy(col("vec_id"))
      .agg(sum(col("qdot")).as("adc_qdot"), count(lit(1)).as("n_sub"))
      // vectors missing any subspace in the LUT join would rank on a
      // partial sum — with self-corpus codebooks every (s, code) is
      // present, but the guard keeps the contract explicit
      .filter(col("n_sub") === m)
      .select(col("vec_id"), col("adc_qdot"))
      .orderBy(col("adc_qdot").desc, col("vec_id"))
      .limit(kNbrs)
  }

  /** Two-stage retrieval: PQ-ADC SHORTLIST then exact re-rank — the
    * production serving shape (FAISS's refine/rerank stage). Stage 1
    * ranks the whole corpus by compressed codes alone ([[pqTopK]]'s ADC,
    * cost m lookups a vector); stage 2 fetches the `shortlist` best
    * candidates' REAL vectors and re-ranks them by exact integer dot —
    * recall recovers from quantization error while full-precision reads
    * stay O(shortlist), not O(corpus). The candidate id set broadcasts
    * (≤`shortlist` rows by construction), so the re-rank join is a
    * broadcast semi-join against the vector store — at 100 TB that is
    * the difference between touching m bytes and d·4 bytes per corpus
    * row. Both stages integer-exact under one hash gate.
    */
  def pqRerank(
      embeddings: DataFrame,
      queryVecId: Long = 0L,
      kNbrs: Int = 5,
      shortlist: Int = 50,
      m: Int = 8,
      k: Int = 8,
      iters: Int = 2): DataFrame =
    pqRerankWith(embeddings, pqCodebook(embeddings, m, k, iters),
      queryVecId, kNbrs, shortlist, m)

  /** [[pqRerank]] against a FIXED trained codebook (see [[pqTopKWith]]). */
  def pqRerankWith(
      embeddings: DataFrame,
      codebook: DataFrame,
      queryVecId: Long = 0L,
      kNbrs: Int = 5,
      shortlist: Int = 50,
      m: Int = 8): DataFrame = {
    require(shortlist >= kNbrs, s"shortlist $shortlist < kNbrs $kNbrs")
    val cand = pqTopKWith(embeddings, codebook, queryVecId, shortlist, m)
      .select(col("vec_id").as("cand_id"))
    val q = quantizedUnits(embeddings)
    val qv = q.filter(col("vec_id") === queryVecId && col("qvec").isNotNull)
      .select(col("qvec").as("q_qvec"))
    q.join(broadcast(cand), col("vec_id") === col("cand_id"))
      .crossJoin(broadcast(qv))
      .select(col("vec_id"),
        vec_dot_long(col("qvec"), col("q_qvec")).as("exact_qdot"))
      .orderBy(col("exact_qdot").desc, col("vec_id"))
      .limit(kNbrs)
  }

  /** IVF-PQ top-k — the full FAISS `IVFx,PQy` composition: a coarse
    * quantizer partitions the corpus into cells (trained integer
    * Lloyd's, [[kmeansAssign]]'s machinery), PQ codebooks train on the
    * cell RESIDUALS qvec − centroid (integer subtraction, so the whole
    * index stays int64-exact — residuals concentrate near the origin,
    * which is where per-cell quantization earns its accuracy), and the
    * query probes its `nprobe` best cells with a PER-CELL residual
    * lookup table. The approximate similarity decomposes exactly:
    * dot(q, cent + residual̂) = dot(q, cent) + dot(q_res, codeword)
    * summed over subspaces — both terms integer, so the trained coarse
    * quantizer, the residual codebooks, the codes, AND the ADC ranking
    * all sit under one DuckDB hash gate.
    *
    * Scale shape: vectors never shuffle — both codebooks broadcast to
    * the data, the candidate set is the probed cells' code rows joined
    * to a ≤nprobe·m·k-row broadcast LUT, and the only vec_id exchange
    * is the final ADC rollup of long pairs. At corpus scale the code
    * store is (vec_id, cell, codes) — m bytes + a cell id per vector —
    * partition-pruned by cell exactly like [[ivfTopK]]'s flat form.
    */
  def ivfPqTopK(
      embeddings: DataFrame,
      queryVecId: Long = 0L,
      kNbrs: Int = 5,
      cells: Int = 8,
      m: Int = 8,
      k: Int = 8,
      iters: Int = 2,
      nprobe: Int = 2): DataFrame = {
    val (coarse, pqc) = ivfPqIndex(embeddings, cells, m, k, iters)
    ivfPqTopKWith(embeddings, coarse, pqc, queryVecId, kNbrs, m, nprobe)
  }

  /** The residual subvector stream shared by IVF-PQ training and
    * encoding: each vector's qvec minus its coarse centroid, sliced into
    * m subspaces (`cell` rides along for the partition-pruned code
    * store).
    */
  private def ivfResidualSubs(
      q: DataFrame, coarse: DataFrame, m: Int, sub: Int): DataFrame =
    assignQCells(q, coarse)
      .filter(col("cell").isNotNull)
      .join(broadcast(coarse), col("cell") === col("cidx"))
      // fused codegen residual (ExtSpec-pinned bit-identical to the
      // interpreted `zip_with(qvec, qcent, (x, y) -> x - y)` it replaces
      // — dim boxed lambda calls per corpus vector)
      .select(col("vec_id"), col("cell"),
        vec_sub_long(col("qvec"), col("qcent")).as("qvec"))
      .select(col("vec_id"), col("cell"), col("qvec"),
        explode(expr(s"sequence(0, ${m - 1})")).as("s"))
      .selectExpr("vec_id", "cell", "s", s"slice(qvec, s * $sub + 1, $sub) as qsub")

  /** Train the IVF-PQ index: (coarse centroids, residual PQ codebooks).
    * The train-once half — both frames are tiny (cells rows; m·k rows)
    * and broadcastable; [[ivfPqTopKWith]] serves any number of queries
    * against them without retraining ([[IndexCache]] keys them by
    * corpus+params so a suite of queries trains exactly once).
    */
  def ivfPqIndex(
      embeddings: DataFrame,
      cells: Int = 8,
      m: Int = 8,
      k: Int = 8,
      iters: Int = 2): (DataFrame, DataFrame) = {
    val dim = 64
    require(m >= 1 && dim % m == 0, s"m must divide $dim, got $m")
    val q = quantizedUnits(embeddings)
    val coarse = kmeansCentroids(q, cells, iters)
    val rsubs = ivfResidualSubs(q, coarse, m, dim / m)
    (coarse, pqCentroids(rsubs.select("vec_id", "s", "qsub"), m, k, iters))
  }

  /** [[ivfPqTopK]] against a FIXED trained (coarse, residual-PQ) index —
    * the serving half: encode-and-probe only, no Lloyd's.
    */
  def ivfPqTopKWith(
      embeddings: DataFrame,
      coarse: DataFrame,
      pqc: DataFrame,
      queryVecId: Long = 0L,
      kNbrs: Int = 5,
      m: Int = 8,
      nprobe: Int = 2): DataFrame = {
    val dim = 64
    require(m >= 1 && dim % m == 0, s"m must divide $dim, got $m")
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val sub = dim / m
    val q = quantizedUnits(embeddings)
    val rsubs = ivfResidualSubs(q, coarse, m, sub)
    val codes = pqAssign(rsubs, pqc) // rider column `cell` passes through
    // query side: probe the nprobe best cells by the exact coarse dot...
    val qv = q.filter(col("vec_id") === queryVecId && col("qvec").isNotNull)
    val probed = qv.crossJoin(broadcast(coarse))
      .select(col("cidx").as("pcell"), col("qcent"),
        vec_dot_long(col("qvec"), col("qcent")).as("qcdot"))
      .orderBy(col("qcdot").desc, col("pcell")).limit(nprobe)
    // ...then build the PER-CELL residual LUT: the query's residual
    // differs per probed cell, so each (pcell, s, code) gets its own dot
    val lut = qv.crossJoin(broadcast(probed))
      // same fused residual kernel as ivfResidualSubs (nprobe rows here)
      .select(col("pcell"), col("qcdot"),
        vec_sub_long(col("qvec"), col("qcent")).as("qres"))
      .select(col("pcell"), col("qcdot"), col("qres"),
        explode(expr(s"sequence(0, ${m - 1})")).as("ls"))
      .selectExpr("pcell", "qcdot", "ls", s"slice(qres, ls * $sub + 1, $sub) as q_qsub")
      .join(pqc, col("ls") === col("s"))
      .select(col("pcell"), col("qcdot"), col("ls"), col("cidx").as("lcode"),
        vec_dot_long(col("q_qsub"), col("qcent")).as("rdot"))
    codes.filter(col("code").isNotNull && col("vec_id") =!= queryVecId)
      .join(broadcast(lut),
        col("cell") === col("pcell") && col("s") === col("ls") &&
          col("code") === col("lcode"))
      .groupBy(col("vec_id"))
      .agg(sum(col("rdot")).as("r"), max(col("qcdot")).as("c"),
        count(lit(1)).as("n_sub"))
      .filter(col("n_sub") === m)
      .select(col("vec_id"), (col("c") + col("r")).as("adc_qdot"))
      .orderBy(col("adc_qdot").desc, col("vec_id"))
      .limit(kNbrs)
  }

  /** Bulk kNN join: top-`kNbrs` nearest neighbors for EVERY vector — the
    * embedding-pipeline operator ([[cosineTopK]]/[[ivfTopK]] answer one
    * query vector; semantic clustering, kNN-graph construction and
    * retrieval-eval pipelines need all of them). IVF cell-restricted:
    * neighbors are searched within each vector's coarse-quantizer cell,
    * so the pair space is Σ|cell|² ≈ n²/k instead of n² — the same
    * approximation contract as [[semanticDedup]], with recall traded via
    * the codebook exactly as in IVF-flat indexes.
    *
    * Plan shape: ONE cell exchange computes the assignment; both pair-join
    * sides reuse it (exchange reuse, the [[semanticDedup]] idiom). The
    * per-vector top-k ranks over a window partitioned by (cell, vec_id):
    * a vector has exactly one cell, so the ranking is per-vector — but
    * because the join output is already hash-partitioned by cell, the
    * window needs NO further exchange (HashPartitioning(cell) satisfies
    * a clustered distribution on the superset {cell, vec_id}); candidate
    * pairs are ranked where they are produced and only k·n rows survive.
    * Ranking compares the ROUNDED similarity (then nbr_id) so the order
    * is engine-stable.
    *
    * Zero-norm/null vectors have NULL cells: the equi-join drops them, so
    * they emit no neighbor rows (their cosine is undefined) — same
    * contract as [[semanticDedup]].
    */
  def knnJoin(
      embeddings: DataFrame,
      kNbrs: Int = 3,
      k: Int = AdaptiveK): DataFrame =
    knnJoinFromAssign(
      ivfAssignWithUnit(embeddings, resolveK(embeddings, k)), kNbrs)

  /** [[knnJoin]] against TRAINED (or any custom) centroids in the one-row
    * codebook format — `knnJoinWith(corpus, trainedCodebook(corpus))`
    * builds the kNN graph on trained cell geometry. Same ranking
    * contract; only the candidate restriction changes.
    */
  def knnJoinWith(
      embeddings: DataFrame,
      codebook: DataFrame,
      kNbrs: Int = 3): DataFrame =
    knnJoinFromAssign(assignWithUnit(embeddings, codebook), kNbrs)

  private def knnJoinFromAssign(assign: DataFrame, kNbrs: Int): DataFrame =
    knnJoinFromAssign(assign, kNbrs, maxSim = None)

  private def knnJoinFromAssign(
      assign: DataFrame, kNbrs: Int, maxSim: Option[Double]): DataFrame = {
    // explicit count: see semanticDedup's cell exchange — a Σ|cell|²
    // fan-out sits above this exchange, outside AQE's sizing horizon
    val a = assign.repartition(
      assign.sparkSession.sessionState.conf.numShufflePartitions, col("cell"))
    val l = a.select(col("cell"), col("vec_id"), col("unit"))
    val r = a.select(col("cell"), col("vec_id").as("nbr_id"), col("unit").as("nbr_unit"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cell"), col("vec_id"))
      .orderBy(col("cosine_sim").desc, col("nbr_id"))
    val pairs = l.join(r, Seq("cell"))
      .filter(col("vec_id") =!= col("nbr_id"))
      .select(col("vec_id"), col("cell"), col("nbr_id"),
        round(vec_dot(col("unit"), col("nbr_unit")), 6).as("cosine_sim"))
    maxSim.fold(pairs)(t => pairs.filter(col("cosine_sim") < t))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= kNbrs)
  }

  /** Contrastive TRIPLET assembly — the training artifact itself:
    * (anchor, positive, negative) rows where the positive is the
    * anchor's most-similar near-duplicate (sim ≥ `minPosSim`) and the
    * negative its best hard negative (sim < `minPosSim`, the
    * [[hardNegatives]] bar) — anchors lacking either side emit nothing
    * (a triplet loss needs both). ONE cell-restricted pair-scoring pass
    * feeds both selections: the positive and negative windows partition
    * by (cell, vec_id) over the same exchange, so the corpus is scored
    * once and only the two rank-1 frames (≤ n rows each) meet in the
    * final anchor join.
    */
  def contrastiveTriplets(
      embeddings: DataFrame,
      minPosSim: Double = 0.95,
      k: Int = AdaptiveK): DataFrame = {
    require(minPosSim > -1.0 && minPosSim <= 1.0,
      s"minPosSim must be in (-1, 1], got $minPosSim")
    val a = ivfAssignWithUnit(embeddings, resolveK(embeddings, k))
      .repartition(
        embeddings.sparkSession.sessionState.conf.numShufflePartitions,
        col("cell"))
    val l = a.select(col("cell"), col("vec_id"), col("unit"))
    val r = a.select(col("cell"), col("vec_id").as("nbr_id"),
      col("unit").as("nbr_unit"))
    val pairs = l.join(r, Seq("cell"))
      .filter(col("vec_id") =!= col("nbr_id"))
      .select(col("vec_id"), col("cell"), col("nbr_id"),
        round(vec_dot(col("unit"), col("nbr_unit")), 6).as("sim"))
    // Both selections in ONE aggregate over the pair stream. The former
    // two-window shape re-executed the Σ|cell|² pair join + scoring per
    // side (the windows shared the cell exchange, but everything above
    // it ran twice) and then equi-joined the two rank-1 frames; a
    // conditional struct-max per side is the same argmax — max(sim),
    // ties to the SMALLEST nbr_id via the negated id — computed in one
    // pass with no final join. groupBy(cell, vec_id) is satisfied by the
    // cell exchange (vec_id lives in exactly one cell), so no new
    // shuffle; anchors missing either side aggregate to NULL and are
    // filtered, exactly the inner join's semantics.
    def best(cond: org.apache.spark.sql.Column) =
      max(when(cond, struct(col("sim"), (-col("nbr_id")).as("nid"))))
    pairs
      .groupBy(col("cell"), col("vec_id"))
      .agg(best(col("sim") >= minPosSim).as("p"),
        best(col("sim") < minPosSim).as("n"))
      .where(col("p").isNotNull && col("n").isNotNull)
      .select(col("vec_id").as("anchor_id"),
        (-col("p.nid")).as("pos_id"), col("p.sim").as("pos_sim"),
        (-col("n.nid")).as("neg_id"), col("n.sim").as("neg_sim"))
  }

  /** HARD-NEGATIVE mining for contrastive training: each vector's
    * top-`kNbrs` most-similar neighbors that are NOT near-duplicates —
    * close enough to be informative negatives, excluded above `maxSim`
    * where a "negative" is really an unlabeled positive (the false
    * negative that poisons a contrastive batch; near-dups belong to
    * dedup, not to the negative pool). Same cell-restricted pair space,
    * exchange-reuse plan and engine-stable ranking as [[knnJoin]] — the
    * near-dup exclusion is a filter BETWEEN pair scoring and the
    * window, so survivors re-rank and every anchor still yields up to
    * `kNbrs` negatives.
    */
  def hardNegatives(
      embeddings: DataFrame,
      kNbrs: Int = 3,
      k: Int = AdaptiveK,
      maxSim: Double = 0.95): DataFrame = {
    require(maxSim > -1.0 && maxSim <= 1.0, s"maxSim must be in (-1, 1], got $maxSim")
    knnJoinFromAssign(
      ivfAssignWithUnit(embeddings, resolveK(embeddings, k)), kNbrs, Some(maxSim))
  }

  /** The packed-rank PQ index shared by [[pqKnnJoin]], [[pqAdcTopKJoin]]
    * and [[pqKnnStream]]: local codebook rows + per-subspace rank map +
    * first-`cells` coarse centroids + the cell-clustered (cell, vec_id,
    * packed) code store. */
  private final case class PqPackedIdx(
      cbRows: Seq[(Int, Long, Seq[Long])],
      rankOf: Map[(Int, Long), Long],
      cents0: DataFrame,
      packed: DataFrame)

  /** The serving-time PQ index as DATA: the first-`cells` coarse
    * centroids plus the cell-clustered (cell, vec_id, packed) code
    * store. Build it ONCE per corpus — persist it, or write it out (at
    * scale the store is m bytes + a cell id per vector) — and serve any
    * number of query batches against it with [[pqAdcTopKJoinOn]].
    * Rebuilding per query batch re-pays the O(n·cells·dim) coarse
    * assignment of the whole corpus, which DOMINATES serving once
    * `cells` grows with the store (measured: AdcServeProbe at 100× —
    * the per-batch rebuild got SLOWER going 16 → 256 cells even as the
    * probed pair space shrank 16×; BENCH_SF1).
    */
  final case class PqIndex(cents: DataFrame, store: DataFrame)

  /** Publish a [[PqIndex]] (plus the codebook it was built under — a
    * serve needs all three frames, and packed ranks are meaningless
    * under any other codebook) as an immutable version under `dir`,
    * the [[publishCodebook]] contract extended to a MULTI-frame
    * artifact: three writes land under `dir/v=N/{codebook,cents,store}`
    * and only the final `_PUBLISHED` marker makes the version visible —
    * a crash mid-publish leaves a torn dir that [[latestPqIndex]] never
    * resolves (the committedBatchDirs discipline), and the next publish
    * skips past it. Running queries keep their pinned version; a swap
    * lands at (re)start via [[latestPqIndex]].
    */
  def publishPqIndex(index: PqIndex, codebook: DataFrame, dir: String): Int = {
    val spark = codebook.sparkSession
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // next = past EVERY v= dir, torn ones included (errorifexists would
    // otherwise collide with a torn dir forever)
    val all =
      if (!fs.exists(p)) Seq.empty[Int]
      else fs.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath.getName)
        .collect { case s if s.startsWith("v=") && s.drop(2).nonEmpty
          && s.drop(2).forall(_.isDigit) => s.drop(2).toInt }
    val next = (0 +: all).max + 1
    val base = s"$dir/v=$next"
    codebook.coalesce(1).write.mode("errorifexists").parquet(s"$base/codebook")
    index.cents.coalesce(1).write.mode("errorifexists").parquet(s"$base/cents")
    // the store keeps its cell clustering — at scale it is the big frame
    index.store.write.mode("errorifexists").parquet(s"$base/store")
    fs.create(new org.apache.hadoop.fs.Path(base, "_PUBLISHED"), false).close()
    next
  }

  /** PUBLISHED versions under `dir` (marker present), ascending. */
  def pqIndexVersions(
      spark: org.apache.spark.sql.SparkSession, dir: String): Seq[Int] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath.getName)
      .collect { case s if s.startsWith("v=") && s.drop(2).nonEmpty
        && s.drop(2).forall(_.isDigit) => s.drop(2).toInt }
      .filter(v => fs.exists(new org.apache.hadoop.fs.Path(s"$dir/v=$v", "_PUBLISHED")))
      .sorted
  }

  /** The newest PUBLISHED serving index and its codebook. Resolved at
    * creation time — call at query (re)start, not once per process. */
  def latestPqIndex(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): (PqIndex, DataFrame) = {
    val vs = pqIndexVersions(spark, dir)
    require(vs.nonEmpty, s"no PQ index versions published under $dir")
    val base = s"$dir/v=${vs.last}"
    (PqIndex(
      spark.read.parquet(s"$base/cents"),
      spark.read.parquet(s"$base/store")),
      spark.read.parquet(s"$base/codebook"))
  }

  /** Build the [[PqIndex]] for a corpus under a trained codebook (the
    * [[graft.ext.IndexCache]] shape: train once, index once, serve
    * forever). */
  def pqServingIndex(
      corpus: DataFrame,
      codebook: DataFrame,
      cells: Int = 16,
      m: Int = 8,
      k: Int = 8): PqIndex = {
    val dim = 64
    require(m >= 1 && m <= 8 && dim % m == 0,
      s"m must divide $dim and be <= 8, got $m")
    require(k >= 1 && k <= 256, s"k must be in [1, 256], got $k")
    require(cells >= 1, s"cells must be >= 1, got $cells")
    val (cbRows, rankOf) = cbLocalRows(codebook, k)
    buildPqIndex(corpus, cbRows, rankOf, cells, m, k)
  }

  /** Bounded driver action (the connectedComponents class): the
    * codebook is ≤ m·k rows BY CONSTRUCTION — collect it once. Two
    * things depend on having it local: (1) a self-trained codebook's
    * Lloyd's jobs execute exactly once, with every downstream use
    * reading the materialized local rows; (2) the SDC/ADC tables become
    * PLAN LITERALS instead of broadcast columns — a 4 KB array column
    * cross-joined onto Σ|cell|² pair rows gets COPIED into every
    * unsafe row (measured 3× the whole exact join at x10); a literal
    * is one reference object in the generated code.
    */
  private def cbLocalRows(codebook: DataFrame, k: Int)
      : (Seq[(Int, Long, Seq[Long])], Map[(Int, Long), Long]) = {
    val spark = codebook.sparkSession
    import spark.implicits._
    val cbRows = codebook.selectExpr("cast(s as int) as s", "cidx", "qcent")
      .as[(Int, Long, Seq[Long])].collect().toSeq
    // per-subspace codeword ranks (rank < k always — dropout only
    // shrinks a subspace)
    val rankOf: Map[(Int, Long), Long] = cbRows.groupBy(_._1).toSeq.flatMap {
      case (s, rs) => rs.map(_._2).sorted.zipWithIndex
        .map { case (cidx, r) => ((s, cidx), r.toLong) }
    }.toMap
    require(rankOf.valuesIterator.forall(_ < k),
      s"codebook has a subspace with more than $k codewords")
    (cbRows, rankOf)
  }

  private def pqPackedIndex(
      corpus: DataFrame, codebook: DataFrame,
      cells: Int, m: Int, k: Int): PqPackedIdx = {
    val (cbRows, rankOf) = cbLocalRows(codebook, k)
    val idx = buildPqIndex(corpus, cbRows, rankOf, cells, m, k)
    PqPackedIdx(cbRows, rankOf, idx.cents, idx.store)
  }

  private def buildPqIndex(
      corpus: DataFrame,
      cbRows: Seq[(Int, Long, Seq[Long])],
      rankOf: Map[(Int, Long), Long],
      cells: Int, m: Int, k: Int): PqIndex = {
    val dim = 64
    val sub = dim / m
    val spark = corpus.sparkSession
    import spark.implicits._
    val cbLocal = cbRows.toDF("s", "cidx", "qcent")
    val rankDf = rankOf.toSeq.map { case ((s, c), r) => (s, c, r) }
      .toDF("s", "code", "r")
    val q = quantizedUnits(corpus).filter(col("qvec").isNotNull)
    val cents0 = q.orderBy(col("vec_id")).limit(cells)
      .select(col("vec_id").as("cidx"), col("qvec").as("qcent"))
    val assign = assignQCells(q, cents0)
      .filter(col("cell").isNotNull)
      .select(col("vec_id"), col("qvec"), col("cell"))
    // THE code store: each vector's m 8-bit ranks packed into one
    // bigint — this is what crosses the wire in place of the d-dim
    // vector. Vectors missing any subspace (foreign codebook) drop out
    // via the m-count guard.
    val packed = pqAssign(
        assign.select(col("vec_id"), col("cell"), col("qvec"),
            explode(expr(s"sequence(0, ${m - 1})")).as("s"))
          .selectExpr("vec_id", "cell", "s", s"slice(qvec, s * $sub + 1, $sub) as qsub"),
        cbLocal)
      .join(broadcast(rankDf), Seq("s", "code"))
      .groupBy(col("vec_id"), col("cell"))
      .agg(expr("cast(sum(shiftleft(r, 8 * s)) as bigint)").as("packed"),
        count(lit(1)).as("_ns"))
      .filter(col("_ns") === m)
      .select(col("cell"), col("vec_id"), col("packed"))
      // cell-cluster the store with an EXPLICIT partition count: the
      // packed store is so small that AQE would coalesce a bare
      // repartition(cell) to ~1 partition — and this exchange can feed
      // a join that FANS OUT to Σ|cell|² rows, so the coalesced plan
      // sorts the whole pair stream in one task (measured 33 s vs 3.8 s
      // at x10 — the AQE coalesce-before-expanding-join trap; AQE sizes
      // on the exchange's output, blind to the blow-up above it)
      .repartition(
        corpus.sparkSession.sessionState.conf.numShufflePartitions,
        col("cell"))
    PqIndex(cents0, packed)
  }

  /** The dense (s-major, rank-minor) codeword table as local data:
    * slot s·k + r holds codeword (s, rank r)'s components, zero-vectors
    * in dropout slots (never referenced — packed ranks are < count_s).
    */
  private def cwDense(
      cbRows: Seq[(Int, Long, Seq[Long])], m: Int, k: Int, sub: Int): Seq[Seq[Long]] =
    (0 until m).flatMap { s =>
      val entries = cbRows.filter(_._1 == s).sortBy(_._2)
      (0 until k).map(r =>
        if (r < entries.length) entries(r)._3.toList else List.fill(sub)(0L))
    }

  /** The per-query ADC lookup-table column: lut[s·k + r] = exact dot of
    * the query's subvector s with codeword (s, r), computed ONCE per
    * query row against the literal dense codeword table — m·k small
    * dots; every candidate afterwards costs m loads + adds in
    * [[graft.functions.PqAdcLut]]. */
  private def adcLutCol(cw: Seq[Seq[Long]], m: Int, k: Int, sub: Int): Column =
    transform(typedLit(cw), (c, i) =>
      aggregate(
        zip_with(
          slice(col("qvec"), ((i / lit(k)).cast("int") * sub + 1), lit(sub)),
          c, (x, y) => x * y),
        lit(0L), (a, x) => a + x))

  /** ADC top-k for EVERY query vector against a PQ-compressed corpus —
    * the batch twin of [[pqKnnStream]] and the asymmetric sibling of
    * [[pqKnnJoin]]: queries keep full precision (each query row computes
    * its m·k-entry codeword-dot table once), the corpus side of the
    * cell join carries only packed ranks, and ranking quality matches
    * [[pqTopK]]'s ADC. Self-pairs are NOT excluded — a query that exists
    * in the corpus ranks itself first, the [[knnStream]] serving
    * contract. Int64-exact end to end.
    */
  def pqAdcTopKJoin(
      queries: DataFrame,
      corpus: DataFrame,
      codebook: DataFrame,
      kNbrs: Int = 3,
      cells: Int = 16,
      m: Int = 8,
      k: Int = 8): DataFrame =
    pqAdcTopKJoinOn(queries,
      pqServingIndex(corpus, codebook, cells, m, k), codebook, kNbrs, m, k)

  /** [[pqAdcTopKJoin]] against a PREBUILT [[PqIndex]] — the production
    * serving shape: the store is built (and persisted) once, each
    * request batch pays only its own cell assignment + the cell join.
    * `codebook` must be the one the index was built under (the packed
    * ranks are meaningless under any other). */
  def pqAdcTopKJoinOn(
      queries: DataFrame,
      index: PqIndex,
      codebook: DataFrame,
      kNbrs: Int = 3,
      m: Int = 8,
      k: Int = 8): DataFrame = {
    val dim = 64
    require(m >= 1 && m <= 8 && dim % m == 0,
      s"m must divide $dim and be <= 8, got $m")
    require(k >= 1 && k <= 256, s"k must be in [1, 256], got $k")
    val sub = dim / m
    val (cbRows, _) = cbLocalRows(codebook, k)
    val qAssign = assignQCells(
        quantizedUnits(queries).filter(col("qvec").isNotNull), index.cents)
      .filter(col("cell").isNotNull)
      .select(col("vec_id").as("query_id"), col("qvec"), col("cell"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("adc_qdot").desc, col("nbr_id"))
    qAssign
      .withColumn("lut", adcLutCol(cwDense(cbRows, m, k, sub), m, k, sub))
      .select(col("cell"), col("query_id"), col("lut"))
      .join(index.store.select(col("cell"), col("vec_id").as("nbr_id"),
        col("packed")), Seq("cell"))
      .select(col("query_id"), col("nbr_id"),
        graft.functions.PqFunctions.adc_lut(col("lut"), col("packed"), m, k)
          .as("adc_qdot"))
      .filter(col("adc_qdot").isNotNull)
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= kNbrs)
  }

  /** ANN quality telemetry — per-query recall of the PQ ADC serving path
    * ([[pqAdcTopKJoin]]) against the EXACT integer top-k: the measurement
    * every ANN deployment needs before trusting an index (recall losses
    * come from the coarse-cell restriction AND code quantization; this
    * observes both at once). Queries are a deterministic FIXED-COUNT
    * sample — the `qCount` corpus vectors with the smallest
    * `md5(vec_id)` (tie-broken by vec_id), a hash-ordered draw that is
    * identical across engines and, crucially, does NOT grow with the
    * corpus: the exact-truth arm costs O(n·qCount) at ANY scale, where
    * a modulus slice (q ≈ n/mod) would quietly turn it into O(n²/mod).
    *
    * Emits (query_id, n_exact, n_adc, hits) — integers only, no float
    * division, so the whole measurement sits under the DuckDB hash gate;
    * recall@k = hits / n_exact is one trivial division away for the
    * consumer. Self-pairs count on both sides (the serving contract).
    *
    * Scale shape: the sample ids come from a distributed top-k
    * (TakeOrderedAndProject over (md5, vec_id) — one scan, a qCount-row
    * heap per partition, never a global sort) and broadcast everywhere
    * they are used; the exact side is one corpus pass against the
    * broadcast qCount-row query batch. The ADC side is the serving plan
    * itself, unchanged.
    */
  def pqRecall(
      corpus: DataFrame,
      codebook: DataFrame,
      kNbrs: Int = 3,
      qCount: Int = 100,
      cells: Int = 16,
      m: Int = 8,
      k: Int = 8): DataFrame = {
    require(qCount >= 1, s"qCount must be >= 1, got $qCount")
    val q = quantizedUnits(corpus).filter(col("qvec").isNotNull)
    val qIds = q.select(col("vec_id"))
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(qCount)
    val queries = corpus.join(broadcast(qIds), Seq("vec_id"))
    val adc = pqAdcTopKJoin(queries, corpus, codebook, kNbrs, cells, m, k)
      .select(col("query_id"), col("nbr_id"))
    val qs = q.join(broadcast(qIds), Seq("vec_id"))
      .select(col("vec_id").as("query_id"), col("qvec").as("q_qvec"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("qdot").desc, col("nbr_id"))
    val exact = q.select(col("vec_id").as("nbr_id"), col("qvec"))
      .crossJoin(broadcast(qs))
      // codegen'd exact dot — the truth arm is O(n·qCount) 64-dim dots,
      // the single hottest interpreted-HOF site in the suite before the
      // [[graft.functions.VecDotLong]] rewrite (bit-identical, pinned)
      .withColumn("qdot", vec_dot_long(col("qvec"), col("q_qvec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= kNbrs)
      .select(col("query_id"), col("nbr_id"))
    val exN = exact.groupBy(col("query_id")).agg(count(lit(1)).as("n_exact"))
    val adcN = adc.groupBy(col("query_id")).agg(count(lit(1)).as("n_adc"))
    val hitN = exact.join(adc, Seq("query_id", "nbr_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("hits"))
    exN
      .join(adcN, Seq("query_id"), "left")
      .join(hitN, Seq("query_id"), "left")
      .selectExpr("query_id", "n_exact",
        "coalesce(n_adc, cast(0 as bigint)) as n_adc",
        "coalesce(hits, cast(0 as bigint)) as hits")
  }

  /** STREAMING PQ serving — [[knnStream]]'s compressed-corpus form:
    * arriving query vectors are cell-assigned and ADC-ranked against the
    * static packed code store ([[pqPackedIndex]]), emitting top-k
    * neighbor ids per (window, query). The per-query codeword-dot table
    * is one projection on the stream; the corpus never ships vectors —
    * the stream-static join probes m-byte packed rows. ADC scores are
    * < 2⁵³ by construction (|qvec|, |qcent| ≤ 10⁶ ⇒ Σ ≤ 6.4·10¹³), so
    * the Double-scored [[graft.functions.TopKAggregator]] ranks them
    * EXACTLY. Re-arrivals inside the watermark dedup to one request, the
    * [[knnStream]] idempotence contract.
    */
  def pqKnnStream(
      queries: DataFrame,
      corpus: DataFrame,
      codebook: DataFrame,
      kNbrs: Int = 3,
      cells: Int = 16,
      m: Int = 8,
      k: Int = 8,
      eventTimeCol: String = "ts",
      delay: String = "10 minutes",
      windowLen: String = "10 minutes"): DataFrame =
    pqKnnStreamOn(queries, pqServingIndex(corpus, codebook, cells, m, k),
      codebook, kNbrs, m, k, eventTimeCol, delay, windowLen)

  /** [[pqKnnStream]] against a PREBUILT [[PqIndex]] — the long-running
    * serving shape: the static side of a stream-static join RE-EXECUTES
    * its plan every micro-batch, so a stream built on the raw corpus
    * re-pays the whole O(n·cells·dim) index construction per trigger.
    * Pass a persisted (or parquet-backed) index and each micro-batch
    * pays only its own assignment + cell join — the same measured
    * 5.8–17× the batch split gives ([[pqAdcTopKJoinOn]], BENCH_SF1).
    * `codebook` must be the one the index was built under.
    */
  def pqKnnStreamOn(
      queries: DataFrame,
      index: PqIndex,
      codebook: DataFrame,
      kNbrs: Int = 3,
      m: Int = 8,
      k: Int = 8,
      eventTimeCol: String = "ts",
      delay: String = "10 minutes",
      windowLen: String = "10 minutes"): DataFrame = {
    val dim = 64
    require(m >= 1 && m <= 8 && dim % m == 0,
      s"m must divide $dim and be <= 8, got $m")
    require(k >= 1 && k <= 256, s"k must be in [1, 256], got $k")
    val sub = dim / m
    val (cbRows, _) = cbLocalRows(codebook, k)
    // stream-safe cell assignment: equi-join on a dummy key instead of
    // assignQCells' crossJoin (stream-static cross joins are restricted;
    // the broadcast one-row codebook is the same)
    val centsRow = index.cents
      .agg(collect_list(struct(col("cidx"), col("qcent"))).as("cents"))
      .withColumn("__one", lit(1))
    // quantizedUnits projects down to (vec_id, qvec); the stream needs
    // its event-time column to survive — quantize in place instead
    // (same fused [[graft.functions.VecQuantizeUnit]] kernel)
    val assigned = queries
      .withColumn("qvec",
        graft.functions.LongVecFunctions.vec_quantize_unit(col("embedding")))
      .filter(col("qvec").isNotNull)
      .withColumn("__one", lit(1))
      .join(broadcast(centsRow), Seq("__one"))
      .withColumn("__best",
        when(size(col("cents")) > 0,
          vec_argmax_qcell(col("qvec"), col("cents"))))
      .withColumn("cell", col("__best.cell"))
      .filter(col("cell").isNotNull)
      .withColumn("lut", adcLutCol(cwDense(cbRows, m, k, sub), m, k, sub))
      .select(col("vec_id").as("query_id"), col(eventTimeCol),
        col("cell"), col("lut"))
    val once = assigned
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark("query_id")
    val scored = once
      .join(index.store.select(col("cell"), col("vec_id").as("nbr_id"),
        col("packed")), Seq("cell"))
      .withColumn("adc",
        graft.functions.PqFunctions.adc_lut(col("lut"), col("packed"), m, k)
          .cast("double"))
      .filter(col("adc").isNotNull)
    val topk = udaf(new graft.functions.TopKAggregator(kNbrs),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Double, Long)]())
    scored
      .groupBy(window(col(eventTimeCol), windowLen).as("win"), col("query_id"))
      .agg(topk(col("adc"), col("nbr_id")).as("nbr_ids"))
      .select(col("win.start").as("window_start"), col("query_id"), col("nbr_ids"))
  }

  /** Bulk kNN join on PQ-COMPRESSED codes — [[knnJoin]] for the regime
    * where the vectors themselves don't fit the shuffle: the candidate
    * pair space is still cell-restricted (Σ|cell|², the [[knnJoin]]
    * contract), but the corpus side of the pair join carries only each
    * vector's m codes (m bytes at k ≤ 256) instead of the d-dim vector —
    * at 64-dim float32 that is 32× fewer vector bytes through the big
    * exchange — on BOTH sides, because ranking is SYMMETRIC (Jégou et
    * al.'s SDC): each pair reads the broadcast m·k² codeword×codeword
    * table via the compiled [[graft.functions.PqSdcPacked]] kernel (m
    * loads + adds per pair; the pair stream never explodes to
    * Σ|cell|²·m rows and never carries a vector). The SDC shortlist
    * then gets an exact integer re-rank that fetches full vectors for
    * only shortlist·n candidate ids — quantization error on both sides
    * is recovered exactly where [[pqRerank]] recovers ADC's. Everything
    * is int64-exact, so the trained codebook, the packed codes, the SDC
    * shortlist AND the re-rank sit under one DuckDB hash gate.
    *
    * The coarse restriction uses the first-`cells` integer codebook
    * (assignment exact, ties to the smallest centroid id); trained
    * coarse cells drop in by passing `kmeansCentroids` output to the
    * same assignment. Zero-norm/null vectors have NULL qvec and emit no
    * rows on either side (cosine undefined — the [[knnJoin]] contract).
    */
  def pqKnnJoin(
      embeddings: DataFrame,
      kNbrs: Int = 3,
      shortlist: Int = 10,
      cells: Int = 16,
      m: Int = 8,
      k: Int = 8,
      iters: Int = 2): DataFrame =
    pqKnnJoinWith(embeddings, pqCodebook(embeddings, m, k, iters),
      kNbrs, shortlist, cells, m, k)

  /** [[pqKnnJoin]] against a FIXED trained PQ codebook (the
    * [[IndexCache]] serving shape). */
  def pqKnnJoinWith(
      embeddings: DataFrame,
      codebook: DataFrame,
      kNbrs: Int = 3,
      shortlist: Int = 10,
      cells: Int = 16,
      m: Int = 8,
      k: Int = 8): DataFrame = {
    val dim = 64
    require(m >= 1 && m <= 8 && dim % m == 0,
      s"m must divide $dim and be <= 8 (8-bit packed ranks), got $m")
    require(k >= 1 && k <= 256, s"k must be in [1, 256], got $k")
    require(shortlist >= kNbrs, s"shortlist $shortlist < kNbrs $kNbrs")
    require(cells >= 1, s"cells must be >= 1, got $cells")
    val idx = pqPackedIndex(embeddings, codebook, cells, m, k)
    // the m·k² codeword×codeword SDC table, from the local rows alone
    val table = new Array[Long](m * k * k)
    for ((s1, c1, q1) <- idx.cbRows; (s2, c2, q2) <- idx.cbRows if s1 == s2) {
      var d = 0L
      var j = 0
      while (j < q1.length && j < q2.length) { d += q1(j) * q2(j); j += 1 }
      table(((s1 * k + idx.rankOf((s1, c1)).toInt) * k + idx.rankOf((s2, c2)).toInt)) = d
    }
    val q = quantizedUnits(embeddings).filter(col("qvec").isNotNull)
    val packed = idx.packed
    val wAdc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cell"), col("vec_id"))
      .orderBy(col("adc_qdot").desc, col("nbr_id"))
    // no join-strategy hint: locally the m-byte store broadcasts (the
    // compression's own doing — re-running the cheap encode on the
    // broadcast side costs 0.2 s); at corpus scale it exceeds the
    // threshold and becomes a shuffle join on the already-clustered
    // exchange
    val short = packed
      .join(packed.select(col("cell"), col("vec_id").as("nbr_id"),
        col("packed").as("nbr_packed")), Seq("cell"))
      .filter(col("vec_id") =!= col("nbr_id"))
      .select(col("cell"), col("vec_id"), col("nbr_id"),
        graft.functions.PqFunctions
          .sdc_packed(typedLit(table.toSeq), col("packed"), col("nbr_packed"), m, k)
          .as("adc_qdot"))
      .filter(col("adc_qdot").isNotNull)
      .withColumn("_rs", row_number().over(wAdc))
      .filter(col("_rs") <= shortlist)
      .select(col("vec_id"), col("nbr_id"))
    // exact re-rank: full-precision reads for k·n candidate ids only
    val wExact = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id"))
      .orderBy(col("exact_qdot").desc, col("nbr_id"))
    short
      .join(q.select(col("vec_id"), col("qvec")), Seq("vec_id"))
      .join(q.select(col("vec_id").as("nbr_id"), col("qvec").as("nvec")), Seq("nbr_id"))
      .select(col("vec_id"), col("nbr_id"),
        vec_dot_long(col("qvec"), col("nvec")).as("exact_qdot"))
      .withColumn("rank", row_number().over(wExact).cast("bigint"))
      .filter(col("rank") <= kNbrs)
      .select(col("vec_id"), col("nbr_id"), col("exact_qdot"), col("rank"))
  }

  /** IVF top-k: search ONLY the query vector's cell (nprobe = 1), exact
    * cosine re-rank inside. At scale the scan touches 1/k of the corpus;
    * recall is traded via nprobe exactly as in IVF-flat indexes.
    */
  def ivfTopK(embeddings: DataFrame, queryVecId: Long = 0L, k: Int = 5): DataFrame = {
    val n = ivfAssignWithUnit(embeddings) // assignment is a scan projection — no join back
    val qCell = n.filter(col("vec_id") === queryVecId)
      .select(col("cell").as("q_cell"), col("unit").as("q_unit"))
    n.crossJoin(broadcast(qCell))
      .filter(col("cell") === col("q_cell") && col("vec_id") =!= queryVecId)
      .select(col("vec_id"), col("cell"),
        round(vec_dot(col("unit"), col("q_unit")), 6).as("cosine_sim"))
      .orderBy(col("cosine_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** IVF top-k with nprobe > 1: search the query's `nprobe` nearest cells
    * instead of one — the recall knob of IVF-flat. Probe-cell selection is
    * a 16-row computation; the candidate scan touches nprobe/k of the
    * corpus, still partition-pruned by cell id.
    */
  def ivfTopKProbe(
      embeddings: DataFrame,
      queryVecId: Long = 0L,
      k: Int = 5,
      nprobe: Int = 4): DataFrame = {
    val n = ivfAssignWithUnit(embeddings) // assignment is a scan projection — no join back
    val cents = normalized(embeddings).filter(col("vec_id") < 16)
      .select(col("vec_id").as("cent_id"), col("unit").as("cent_unit"))
    val q = normalized(embeddings).filter(col("vec_id") === queryVecId)
      .select(col("unit").as("q_unit"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("sim").desc, col("cent_id")) // 16 rows — global window is fine
    val probeCells = cents.crossJoin(broadcast(q))
      .select(col("cent_id"),
        round(vec_dot(col("cent_unit"), col("q_unit")), 6).as("sim"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= nprobe)
      .select(col("cent_id").as("probe_cell"))
    n.join(broadcast(probeCells), col("cell") === col("probe_cell"))
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= queryVecId)
      .select(col("vec_id"), col("cell"),
        round(vec_dot(col("unit"), col("q_unit")), 6).as("cosine_sim"))
      .orderBy(col("cosine_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Int8 quantization of embeddings: per-vector symmetric scale
    * (max-abs → 127), the storage form training pipelines ship — 4× to 8×
    * smaller than float32 with recall preserved by re-ranking. Pure
    * projection; serialized as CSV for the cross-engine check (the real
    * sink would write `array<tinyint>`).
    *
    * Zero (or null) vectors have no defined scale — `_max = 0` would
    * divide by zero under ANSI mode — so they quantize to NULL, the same
    * contract as [[normalized]]'s NULL unit (mirrored in the oracle).
    */
  def quantizeInt8(embeddings: DataFrame): DataFrame =
    embeddings
      .withColumn("_max",
        expr("aggregate(embedding, 0D, (m, x) -> greatest(m, abs(cast(x as double))))"))
      .selectExpr(
        "vec_id",
        "_max as scale_max",
        """case when _max > 0D then array_join(transform(embedding,
          |  x -> cast(cast(round(cast(x as double) / _max * 127.0) as int) as string)), ',')
          |  end as q8_csv""".stripMargin,
        """case when _max > 0D
          |  then cast(round(cast(element_at(embedding, 1) as double) / _max * 127.0) as int)
          |  end as q8_first""".stripMargin)

  /** The j-th deterministic axis-pair hyperplane sign over dims
    * [lo+2j+1, lo+2j+2] (1-based): bit set iff x_{d1} - x_{d2} > 0 — a
    * genuine LSH hyperplane (normal e_{d1} − e_{d2}) that is data-derived,
    * deterministic, and expressible identically in any SQL engine (no
    * stored random projection matrix to ship cross-engine).
    */
  private def signBandExpr(lo: Int, bits: Int): String =
    (0 until bits).map { j =>
      val d1 = lo + 2 * j + 1
      val d2 = lo + 2 * j + 2
      s"(case when cast(element_at(embedding, $d1) as double) - cast(element_at(embedding, $d2) as double) > 0 then ${1L << j}L else 0L end)"
    }.mkString(" + ")

  /** ANN candidate pairs via MULTI-BAND sign-LSH: 24 hyperplane sign bits
    * packed into 2 bands × 12 bits; a pair is a candidate iff it agrees on
    * ALL 12 bits of at least one band — the same pigeonhole/band structure
    * as [[Dedup.simhashPairs]]. Each band has 2¹² = 4,096 buckets, so
    * candidate generation is two equi-joins costing Σ(bucket²) ≈ n²/4,096
    * per band under a balanced bit spread — against the n²/256 of a single
    * 8-bit bucket, the shape that stops holding at corpus scale. Exact
    * cosine re-rank inside the buckets keeps only pairs ≥ `threshold`;
    * band count/width is the recall knob (more, narrower bands → higher
    * recall), exactly as in banded MinHash — 2×16 bits pushed recall to
    * zero on this corpus, 2×12 keeps true near-dups colliding at every
    * test SF while preserving the Σ(bucket²) bound.
    */
  def annPairsLsh(embeddings: DataFrame, threshold: Double = 0.4): DataFrame = {
    val n = normalized(embeddings)
      .selectExpr("vec_id", "unit",
        s"${signBandExpr(0, 12)} as band0",
        s"${signBandExpr(24, 12)} as band1")
    val a = n.selectExpr("vec_id as a_id", "band0", "band1", "unit as a_unit")
    val b = n.selectExpr("vec_id as b_id", "band0 as b_band0", "band1 as b_band1",
      "unit as b_unit")
    // one equi-join per band (an OR join would degrade to a nested loop),
    // re-check + filter INSIDE each band so the cross-band distinct only
    // sees surviving near-dups
    def bandJoin(band: String) =
      a.join(b, col(band) === col(s"b_$band") && col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"),
          round(vec_dot(col("a_unit"), col("b_unit")), 6).as("cosine_sim"))
        .filter(col("cosine_sim") >= threshold)
    bandJoin("band0").unionAll(bandJoin("band1")).distinct()
  }
}
