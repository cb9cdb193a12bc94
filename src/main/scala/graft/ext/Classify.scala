package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trained text classification for corpus curation: a multinomial
  * Naive Bayes over hashed token buckets (the fastText-class quality /
  * language filter every LLM data pipeline runs), its precision/recall
  * eval, and a per-document character-entropy junk screen.
  *
  * Integer-log doctrine (shared with `TextOps.lmScore`): real
  * log-probabilities are float sums whose value depends on summation
  * order — un-gateable across engines. Every log here is therefore the
  * EXACT INTEGER magnitude ⌊log2 x⌋ = length(bin(x)) − 1, so scores and
  * entropies are sums of int64 (order-free, bit-identical in Spark and
  * the DuckDB oracle). The quantization costs < 1 bit per term — a
  * classifier/filter threshold decision, not a probability report, is
  * robust to it, and the trade is documented at each call site.
  */
object Classify {

  /** ⌊log2 e⌋ for e ≥ 1, as the exact integer both engines compute. */
  private def ilog2(e: String): String = s"(length(bin($e)) - 1)"

  private val Buckets = 4096

  /** (doc_id, lang, b): one row per token occurrence, the token hashed
    * onto [0, 4096) with the cross-engine md5 bucket hash. Feature
    * hashing (Weinberger et al. 2009) keeps the model a FIXED-width
    * table no matter the vocabulary — the property that lets the
    * trained model broadcast at any corpus size.
    */
  private def tokenBuckets(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("token"))
      .where(col("token") =!= "")
      .select(col("doc_id"), col("lang"),
        expr(s"${TextOps.md5Long64("token")} % $Buckets").as("b"))

  /** Multinomial Naive Bayes language classifier, trained on the
    * doc_id % `fold` != 0 slice and scored on the held-out % == 0
    * slice (in-sample evaluation would grade memorization; the split
    * reuses the deterministic-fold convention of `dataset_split`).
    *
    * Model: per class c, token-bucket likelihood magnitudes
    * m(c,b) = ⌊log2(cnt(c,b)+1)⌋ − ⌊log2(tot(c)+4096)⌋ (Laplace
    * smoothing, integer-quantized — see object doc) and a prior
    * magnitude ⌊log2(docs(c)+1)⌋. A held-out doc's class score is the
    * prior plus the sum of its tokens' magnitudes; prediction is the
    * arg-max, ties broken by class name ascending so both engines pick
    * the same row.
    *
    * Output: one row per held-out doc with ≥ 1 token — true `lang`,
    * `pred`, the integer `score`, and a `correct` flag. Token-less
    * docs have no evidence and are deliberately not emitted (a real
    * pipeline routes them to a default class upstream).
    *
    * Scale shape: training is one groupBy on the (class, bucket) key —
    * the model is DENSE and FIXED: |classes| × 4096 rows, broadcast.
    * Scoring is a broadcast join of the token stream against the model
    * (tokens never shuffle) followed by one aggregate on (doc, class)
    * and a per-doc arg-max window. No step's width grows with the
    * vocabulary or the corpus; only the token stream itself is big,
    * and it is touched twice (train, score) — at 100 TB you persist
    * the trained model once and score incrementally.
    */
  def nbClassify(documents: DataFrame, fold: Int = 5): DataFrame = {
    val train = documents.where(col("doc_id") % fold =!= 0)
    val (cnt, prior) = nbCounts(train)
    nbScore(documents.where(col("doc_id") % fold === 0), cnt, prior)
  }

  /** The model's MERGEABLE TRAINING PARTIALS from a slice of training
    * documents: per-(class, bucket) token counts and per-class document
    * counts. Both are plain sums, so partials from ANY batching of the
    * training set fold to the full-corpus counts by groupBy-sum — the
    * property that makes the model updatable from a stream (the
    * mergeable-partials doctrine: store counts, not computed weights).
    */
  def nbCounts(trainDocs: DataFrame): (DataFrame, DataFrame) = (
    tokenBuckets(trainDocs)
      .groupBy(col("lang").as("cls"), col("b"))
      .agg(count(lit(1)).as("c")),
    trainDocs
      .groupBy(col("lang").as("cls"))
      .agg(count(lit(1)).as("pc")))

  /** Score documents against a model given as its count partials, and
    * pick each doc's arg-max class. The dense |classes| × 4096 weight
    * table means scoring is a plain broadcast equi-join — absent (c,b)
    * cells carry the pure smoothing mass, so there is no per-token
    * missing-key fallback in the hot path.
    */
  private def nbScore(evalDocs: DataFrame, cnt: DataFrame, prior: DataFrame): DataFrame = {
    val spark = evalDocs.sparkSession
    val tot = cnt.groupBy(col("cls")).agg(sum(col("c")).as("tc"))
    val dense = prior.select(col("cls"))
      .crossJoin(spark.range(0, Buckets).select(col("id").as("b")))
      .join(cnt, Seq("cls", "b"), "left")
      .join(tot, Seq("cls"))
      .select(col("cls"), col("b"),
        expr(s"${ilog2("coalesce(c, CAST(0 AS BIGINT)) + 1")} - ${ilog2(s"tc + $Buckets")}")
          .as("w"))
    val scored = tokenBuckets(evalDocs)
      .join(broadcast(dense), Seq("b"))
      .groupBy(col("doc_id"), col("lang"), col("cls"))
      .agg(sum(col("w")).as("sw"))
      .join(broadcast(prior), Seq("cls"))
      .select(col("doc_id"), col("lang"), col("cls"),
        expr(s"sw + ${ilog2("pc + 1")}").as("score"))
    val picked = scored
      .withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("cls").asc)))
      .where(col("rn") === 1)
    picked
      .select(col("doc_id"), col("lang"), col("cls").as("pred"), col("score"),
        (col("lang") === col("cls")).cast("int").as("correct"))
      .orderBy(col("doc_id"))
  }

  /** Streaming model updates: each micro-batch of training documents
    * appends its COUNT PARTIALS to the store (`cnt/batch_N`,
    * `prior/batch_N`) — the crawl-side half of a continuously retrained
    * filter. The store holds counts, never weights: weights are not
    * mergeable, counts are (see [[nbCounts]]). Idempotent replay by
    * batch-dir overwrite, the `lmScoreSink` contract.
    */
  def nbModelSink(
      trainDocs: DataFrame,
      outDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    trainDocs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        nbModelBatch(batch.toDF(), outDir, batchId)
      }
      .start()

  /** One micro-batch's model contribution — factored out for composite
    * sinks. Writes `cnt/batch_N` then `prior/batch_N`; the reader
    * requires BOTH `_SUCCESS` markers, so a crash between them excludes
    * the batch until replay heals it.
    */
  def nbModelBatch(df: DataFrame, outDir: String, batchId: Long): Unit = {
    val b = df.persist()
    try {
      val (cnt, prior) = nbCounts(b)
      cnt.write.mode("overwrite").parquet(s"$outDir/cnt/batch_$batchId")
      prior.write.mode("overwrite").parquet(s"$outDir/prior/batch_$batchId")
    } finally {
      b.unpersist()
      ()
    }
  }

  /** Classify with the model accumulated by [[nbModelSink]] so far:
    * fold the committed count partials (groupBy-sum — exact, any batch
    * count) and score through the SAME [[nbScore]] as the batch path,
    * so the streamed model equals `nbClassify`'s over the union of all
    * batches by construction. Only batches with BOTH sides committed
    * count (the torn-overwrite rule); an empty store classifies nothing
    * and returns the empty frame with the output schema, not an error.
    */
  def nbClassifyFrom(
      spark: org.apache.spark.sql.SparkSession,
      evalDocs: DataFrame,
      outDir: String): DataFrame = {
    def batches(sub: String): Set[String] =
      TextOps.committedBatchDirs(spark, s"$outDir/$sub")
    val complete = (batches("cnt") intersect batches("prior")).toSeq.sorted
    if (complete.isEmpty)
      spark.range(0).selectExpr(
        "CAST(id AS BIGINT) AS doc_id", "CAST(NULL AS STRING) AS lang",
        "CAST(NULL AS STRING) AS pred", "CAST(NULL AS BIGINT) AS score",
        "CAST(NULL AS INT) AS correct")
    else {
      val cnt = spark.read
        .parquet(complete.map(bn => s"$outDir/cnt/$bn"): _*)
        .groupBy(col("cls"), col("b")).agg(sum(col("c")).as("c"))
      val prior = spark.read
        .parquet(complete.map(bn => s"$outDir/prior/$bn"): _*)
        .groupBy(col("cls")).agg(sum(col("pc")).as("pc"))
      nbScore(evalDocs, cnt, prior)
    }
  }

  /** Per-class precision / recall / F1 of [[nbClassify]] over the
    * held-out slice — the eval table that decides whether the filter
    * ships. One row per TRAINED class (a class can have zero held-out
    * predictions or zero held-out truth; its undefined ratios are NULL,
    * not a crash or a silent 0). All counts are exact integers; each
    * ratio is one integer division rounded 6dp — F1 in the 2·tp /
    * (n_pred + n_true) form, which needs no float precision/recall
    * intermediates.
    *
    * Scale shape: re-aggregates the per-doc prediction frame on the
    * class key (|classes| rows) — three tiny aggregates outer-joined.
    */
  def nbMetrics(documents: DataFrame, fold: Int = 5): DataFrame = {
    val out = nbClassify(documents, fold)
    val classes = documents
      .where(col("doc_id") % fold =!= 0)
      .select(col("lang")).distinct()
    // ONE pass over the prediction frame instead of three: each row
    // contributes a (lang, truth-side) and a (pred, pred-side) record,
    // and a single aggregate yields n_true / n_pred / tp per class —
    // the three separate groupBys re-executed nbClassify's window +
    // filter per aggregate (only its doc_id exchange was reused), three
    // plans deep for counts one explode-aggregate computes. Same
    // counts by construction: n_true = Σ truth-side rows with key k,
    // n_pred = Σ pred-side rows with key k, tp = Σ truth-side rows
    // with key k whose pred matches (lang = pred counted once, on the
    // truth side).
    val counts = out.select(explode(array(
        struct(col("lang").as("k"), lit(1L).as("t"), lit(0L).as("p"),
          when(col("lang") === col("pred"), 1L).otherwise(0L).as("tpc")),
        struct(col("pred").as("k"), lit(0L).as("t"), lit(1L).as("p"),
          lit(0L).as("tpc")))).as("c"))
      .groupBy(col("c.k").as("lang"))
      .agg(sum(col("c.t")).as("n_true_s"), sum(col("c.p")).as("n_pred_s"),
        sum(col("c.tpc")).as("tp_s"))
      .select(col("lang"),
        when(col("n_true_s") > 0, col("n_true_s")).as("n_true"),
        when(col("n_pred_s") > 0, col("n_pred_s")).as("n_pred"),
        when(col("tp_s") > 0, col("tp_s")).as("tp"))
    classes
      .join(counts, Seq("lang"), "left")
      .select(
        col("lang"),
        expr("coalesce(n_true, CAST(0 AS BIGINT))").as("n_true"),
        expr("coalesce(n_pred, CAST(0 AS BIGINT))").as("n_pred"),
        expr("coalesce(tp, CAST(0 AS BIGINT))").as("tp"))
      .select(
        col("lang"), col("n_true"), col("n_pred"), col("tp"),
        expr("CASE WHEN n_pred = 0 THEN NULL ELSE round(CAST(tp AS DOUBLE) / CAST(n_pred AS DOUBLE), 6) END")
          .as("prec"),
        expr("CASE WHEN n_true = 0 THEN NULL ELSE round(CAST(tp AS DOUBLE) / CAST(n_true AS DOUBLE), 6) END")
          .as("rec"),
        expr("CASE WHEN n_pred + n_true = 0 THEN NULL ELSE round(CAST(2 * tp AS DOUBLE) / CAST(n_pred + n_true AS DOUBLE), 6) END")
          .as("f1"))
      .orderBy(col("lang"))
  }

  /** Per-document character-entropy screen — the cheap "is this prose
    * or keyboard mash / padding / binary spill?" curation filter.
    * Shannon entropy needs Σ c·log2 c — a float sum, so the emitted
    * `ent_mag` is the integer-quantized magnitude
    * n·⌊log2 n⌋ − Σ c·⌊log2 c⌋ ≥ 0 (exact int64; see object doc), with
    * `entropy_q` = ent_mag / n as the single terminal division and a
    * `low_entropy` flag from the PURE-INTEGER comparison
    * ent_mag·2 < n·3 (quantized entropy below 1.5 bits/char — a
    * repeated-character or single-token document; normal prose sits
    * well above even after quantization).
    *
    * Character extraction is per CODE POINT — the unit
    * `substring(text, i, 1)` yields in both engines, where
    * split-on-empty does not agree. Empty docs carry no distribution
    * and are not emitted.
    *
    * Scale shape: the histogram runs inside ONE compiled projection
    * pass per document (`functions/CharEntropyStats` — bit-identical to
    * the explode form, AuditSpec-pinned): no character rows
    * materialize, nothing about the histogram crosses the wire. The
    * SQL explode form this replaced shuffled one row per character —
    * linear in corpus BYTES on the exchange, measured 26.7 s at 100×
    * vs the kernel's compiled scan (BENCH_SF1 round-13).
    */
  def charEntropy(documents: DataFrame): DataFrame =
    documents
      .where(length(col("text")) > 0)
      .select(col("doc_id"), col("lang"),
        graft.functions.EntropyFunctions.char_entropy_stats(col("text")).as("st"))
      .select(
        col("doc_id"), col("lang"),
        col("st.n").as("n"),
        col("st.distinct_chars").as("distinct_chars"),
        col("st.clog").as("clog"))
      .select(
        col("doc_id"), col("lang"), col("n"), col("distinct_chars"),
        expr(s"n * ${ilog2("n")} - clog").as("ent_mag"),
        expr(s"round(CAST(n * ${ilog2("n")} - clog AS DOUBLE) / CAST(n AS DOUBLE), 6)")
          .as("entropy_q"),
        expr(s"CAST((n * ${ilog2("n")} - clog) * 2 < n * 3 AS INT)")
          .as("low_entropy"))
      .orderBy(col("doc_id"))
}
