package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * token stats / quality scoring, language-ID heuristic, and document
  * fingerprinting. All are per-row projections built from codegen'd
  * built-ins and higher-order array functions — zero shuffles, zero UDFs,
  * so they stream through a 100 TB corpus at scan speed.
  *
  * Cross-engine determinism: every hash is a 60-bit integer derived from
  * md5 (`Hashing.md5Long64`), which both Spark and the DuckDB oracle
  * compute identically; every ratio is an exact int/int IEEE division.
  */
object TextOps {

  /** 60-bit deterministic hash of a string SQL expression (md5-prefix).
    * Same value in DuckDB via `CAST(('0x'||substr(md5(e),1,15)) AS BIGINT)`.
    */
  def md5Long64(e: String): String =
    s"cast(conv(substring(md5($e), 1, 15), 16, 10) as bigint)"

  /** Word 3-gram shingles of a token array expression (distinct set). */
  def shingleExpr(toks: String): String =
    s"""case when size($toks) >= 3
       | then array_distinct(transform(sequence(1, size($toks) - 2),
       |   i -> concat(element_at($toks, i), ' ', element_at($toks, i + 1), ' ', element_at($toks, i + 2))))
       | else array() end""".stripMargin

  /** Per-document n-gram repetition statistics — the "repeated template /
    * degenerate generation" quality signal (Gopher-style repetition
    * filters): a document whose bigrams are mostly duplicates of each
    * other is boilerplate or looping text, not prose. Pure per-row
    * projection (zero shuffle, scan speed at any corpus size); the
    * duplicate fraction is `1 − distinct/total`, an int/int IEEE division
    * identical across engines, and the `repetitive` flag compares that
    * exact double in both engines.
    */
  def repetitionStats(documents: DataFrame, flagFrac: Double = 0.05): DataFrame =
    documents
      .withColumn("toks", split(col("text"), " "))
      .withColumn("bg", expr(
        """case when size(toks) >= 2
          | then transform(sequence(1, size(toks) - 1),
          |   i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))
          | else array() end""".stripMargin))
      .selectExpr(
        "doc_id",
        "cast(size(toks) as bigint) as n_tokens",
        "cast(size(bg) as bigint) as n_bigrams",
        "cast(size(array_distinct(bg)) as bigint) as n_distinct_bigrams",
        """case when size(bg) > 0
          | then 1.0 - cast(size(array_distinct(bg)) as double) / cast(size(bg) as double)
          | else cast(0.0 as double) end as dup_bigram_frac""".stripMargin,
        s"""cast(case when size(bg) > 0 and
           |  1.0 - cast(size(array_distinct(bg)) as double) / cast(size(bg) as double) > $flagFrac
           |  then 1 else 0 end as int) as repetitive""".stripMargin)

  /** Bigram totals per document in AGGREGATE form — the composition-safe
    * twin of [[repetitionStats]]. A filter over the projection form pushes
    * the flag predicate below the Project, where every alias reference
    * re-expands the interpreted bigram lambdas (measured ~25× per-row
    * blowup inside the Filter). Here the bigrams are exploded by index and
    * hashed as FLAT columns (whole-stage codegen end to end), and the
    * counts come out of a `groupBy` — an aggregation boundary no predicate
    * can push through. Distinctness is on the 60-bit bigram hash (the
    * string-collision probability over a corpus is ~pairs²/2⁶¹ —
    * negligible even at 100 TB scale). Documents with fewer than 2 tokens
    * produce no row: callers left-join and treat absent as zero bigrams.
    */
  def repetitionCounts(documents: DataFrame): DataFrame =
    documents
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), col("toks"),
        explode(expr(
          "case when size(toks) >= 2 then sequence(1, size(toks) - 1) else array() end")).as("i"))
      .selectExpr("doc_id",
        s"${md5Long64("concat(element_at(toks, i), ' ', element_at(toks, i + 1))")} as bh")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        countDistinct(col("bh")).as("n_distinct_bigrams"))

  /** Per-document token statistics and a deterministic quality score. */
  /** Canonical text normalization — the cleanup every hashing, dedup,
    * and tokenization pass silently assumes has already happened: the
    * same logical text in NFD vs NFC (a macOS-filename paste, an OCR
    * pipeline) hashes differently, splits differently, and defeats
    * exact dedup. Order: strip non-whitespace control characters
    * (keeping \t \r \n for the collapse), Unicode NFC via the compiled
    * [[graft.functions.NfcNormalize]] expression (JDK Normalizer — the
    * same Unicode tables as the oracle's `nfc_normalize`), collapse
    * whitespace runs to one space, trim. Counters make every change
    * observable, so the whole operator sits under the hash gate.
    *
    * Scale shape: a pure projection — zero exchanges, whole-stage
    * codegen throughout (the NFC expression's fast path is an
    * allocation-free scan for the overwhelmingly-common already-NFC
    * case).
    */
  def textNormalize(documents: DataFrame, textCol: String = "text"): DataFrame = {
    val stripped = regexp_replace(col(textCol),
      "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")
    val norm = trim(regexp_replace(
      graft.functions.TextFunctions.nfc_normalize(stripped), "[ \\t\\r\\n]+", " "))
    documents.select(
      col("doc_id"),
      norm.as("text_norm"),
      length(col(textCol)).cast("bigint").as("n_chars_raw"),
      length(norm).cast("bigint").as("n_chars_norm"),
      (col(textCol) =!= norm).cast("int").as("changed"))
  }

  /** Unicode-SCRIPT composition per document — the signal upstream of
    * language ID (a stopword-profile lang-id is useless on Cyrillic
    * text scored against Latin stopwords) and the filter for
    * script-mixed spam/OCR garbage. Counts per script class come from
    * explicit CODEPOINT-RANGE character classes — the regex construct
    * whose semantics Java regex and RE2 share exactly, the
    * [[piiScrub]] portability discipline (named classes like
    * \p{IsCyrillic} vs \p{Cyrillic} differ between engines) — via the
    * `length(text) − length(remove-class)` idiom, all integers under
    * the hash gate. `dominant` ties break by the fixed class order
    * (latin first), deterministically in both engines.
    *
    * Scale shape: pure projection, zero exchanges, scan-speed.
    */
  def scriptMix(documents: DataFrame): DataFrame = {
    val counted = scriptClasses.foldLeft(
        documents.select(col("doc_id"), col("text"))) {
      case (df, (name, re)) =>
        df.withColumn(s"n_$name",
          (length(col("text")) -
            length(regexp_replace(col("text"), re, ""))).cast("bigint"))
    }
    val letters = scriptClasses.map(_._1).filterNot(_ == "digit")
    counted
      .withColumn("n_other",
        (length(col("text")) -
          scriptClasses.map(c => col(s"n_${c._1}")).reduce(_ + _))
          .cast("bigint"))
      .withColumn("dominant", expr(dominantCase(letters)))
      .drop("text")
  }

  /** (class, codepoint-range regex) pairs shared by the operator; the
    * oracle rebuilds the identical ranges from chr() codepoints. */
  private val scriptClasses: Seq[(String, String)] = Seq(
    "latin" -> "[A-Za-z\u00C0-\u024F]",
    "cyrillic" -> "[\u0400-\u04FF]",
    "cjk" -> "[\u4E00-\u9FFF\u3040-\u30FF]",
    "arabic" -> "[\u0600-\u06FF]",
    "greek" -> "[\u0370-\u03FF]",
    "digit" -> "[0-9]")

  /** The deterministic arg-max CASE over letter-script counts: first
    * class in the fixed order to weakly dominate all others wins. */
  private def dominantCase(letters: Seq[String]): String = {
    val branches = letters.init.map { c =>
      val ge = letters.filterNot(_ == c)
        .map(o => s"n_$c >= n_$o").mkString(" and ")
      s"when $ge then '$c'"
    }
    s"case ${branches.mkString(" ")} else '${letters.last}' end"
  }

  /** Fill-in-the-middle transformation (Bavarian et al. 2022,
    * arXiv:2207.14255) — the data-side half of FIM training: a
    * deterministic `fimPct`% of documents split at two hash-derived
    * character positions into (prefix, middle, suffix) and reassemble
    * in PSM order with sentinel markers, teaching the model to infill;
    * the rest pass through untouched (the paper's mixed regime).
    * Hash-derived split points (not RNG) make the transform stable
    * under retries, repartitioning, and engine changes — the same
    * determinism contract as [[graft.ext.Sampling]] — and two
    * independent hash streams (`fim_a:`/`fim_b:` prefixes) keep the two
    * cut points uncorrelated. Documents under 2 chars never transform
    * (no interior cut exists).
    *
    * Scale shape: pure projection, zero exchanges, scan-speed.
    */
  def fimSplit(
      documents: DataFrame,
      fimPct: Int = 50,
      preTok: String = "<PRE>",
      sufTok: String = "<SUF>",
      midTok: String = "<MID>"): DataFrame = {
    require(fimPct >= 0 && fimPct <= 100, s"fimPct must be in [0,100], got $fimPct")
    val h = md5Long64("concat('fim:', cast(doc_id as string))")
    val ha = md5Long64("concat('fim_a:', cast(doc_id as string))")
    val hb = md5Long64("concat('fim_b:', cast(doc_id as string))")
    documents
      .selectExpr("doc_id", "text",
        "cast(length(text) as bigint) as n",
        s"cast(pmod($h, 100) < $fimPct as boolean) as elected",
        s"pmod($ha, greatest(cast(length(text) as bigint) - 1, 1)) + 1 as a_raw",
        s"pmod($hb, greatest(cast(length(text) as bigint) - 1, 1)) + 1 as b_raw")
      .selectExpr("doc_id", "text", "n",
        "cast(elected and n >= 2 as int) as fim",
        "cast(least(a_raw, b_raw) as int) as lo",
        "cast(greatest(a_raw, b_raw) as int) as hi")
      .selectExpr("doc_id", "fim",
        "case when fim = 1 then substring(text, 1, lo - 1) else text end as prefix",
        "case when fim = 1 then substring(text, lo, hi - lo) else '' end as middle",
        "case when fim = 1 then substring(text, hi) else '' end as suffix")
      .selectExpr("doc_id", "fim", "prefix", "middle", "suffix",
        s"""case when fim = 1
           |  then concat('$preTok', prefix, '$sufTok', suffix, '$midTok', middle)
           |  else prefix end as assembled""".stripMargin)
  }

  def textStats(documents: DataFrame): DataFrame =
    documents
      .withColumn("toks", split(col("text"), " "))
      .selectExpr(
        "doc_id",
        "cast(size(toks) as bigint) as n_tokens",
        "cast(size(array_distinct(toks)) as bigint) as n_uniq_tokens",
        "cast(size(filter(toks, t -> t in ('the', 'a'))) as double) / cast(size(toks) as double) as stopword_ratio",
        "cast(length(text) - (size(toks) - 1) as double) / cast(size(toks) as double) as avg_token_len",
        // weighted mix of length saturation, lexical diversity, stopword presence
        """0.5 * least(cast(size(toks) as double) / 100.0, 1.0)
          | + 0.25 * (cast(size(array_distinct(toks)) as double) / cast(size(toks) as double))
          | + 0.25 * (cast(size(filter(toks, t -> t in ('the', 'a'))) as double) / cast(size(toks) as double))
          | as quality_score""".stripMargin)

  /** Token counting under two tokenizers: whitespace words and a BPE-ish
    * subword regex (letter runs / digit runs / single punctuation — the
    * class shape BPE vocabularies converge to). Pure projection; the
    * regex class is engine-portable (no backtracking constructs).
    */
  def tokenCounts(documents: DataFrame): DataFrame =
    documents.selectExpr(
      "doc_id",
      "size(split(text, ' ')) as n_ws_tokens",
      "size(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)) as n_sub_tokens",
      // nullif guards empty docs; double/double division is exact IEEE
      """cast(length(text) as double)
        | / nullif(cast(size(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)) as double), 0D)
        | as chars_per_subtoken""".stripMargin)

  /** Stopword-profile language ID (n-gram heuristic). Profiles are tiny
    * per-language marker sets; the prediction is the argmax with a fixed
    * tie-break order — deterministic and SQL-expressible.
    */
  def langId(documents: DataFrame): DataFrame = {
    def score(words: Seq[String]): String = {
      val set = words.map(w => s"'$w'").mkString(", ")
      s"cast(size(filter(toks, t -> t in ($set))) as double) / cast(size(toks) as double)"
    }
    val en = score(Seq("the", "a", "of", "and", "is"))
    val de = score(Seq("der", "die", "das", "und", "ist"))
    val es = score(Seq("el", "la", "de", "y", "es"))
    val fr = score(Seq("le", "la", "de", "et", "les"))
    documents
      .withColumn("toks", split(col("text"), " "))
      .selectExpr(
        "doc_id", "lang",
        s"$en as en_score", s"$de as de_score", s"$es as es_score", s"$fr as fr_score")
      .selectExpr(
        "doc_id", "lang", "en_score", "de_score", "es_score", "fr_score",
        """case when en_score >= de_score and en_score >= es_score and en_score >= fr_score then 'en'
          |     when de_score >= es_score and de_score >= fr_score then 'de'
          |     when es_score >= fr_score then 'es'
          |     else 'fr' end as predicted_lang""".stripMargin)
      .selectExpr(
        "doc_id", "lang", "en_score", "de_score", "es_score", "fr_score",
        "predicted_lang",
        "cast(case when predicted_lang = lang then 1 else 0 end as bigint) as is_correct")
  }

  /** Streaming heavy hitters with BOUNDED state: each micro-batch stores
    * its ≤`capacity`-row Misra–Gries summary (token, residual count)
    * plus the batch's item total (whole-dir overwrite ⇒
    * replay-idempotent), and [[heavyHittersFrom]] folds the summaries by
    * the mergeable-summaries construction (Agarwal et al., PODS'12): sum
    * residuals pointwise, subtract the (capacity+1)-th largest, drop
    * non-positives. The merged estimate undercounts each item by at most
    * ⌊N/(capacity+1)⌋ over the WHOLE stream, and every item with true
    * frequency above that bound survives — so the state on disk is
    * capacity·batches rows however large the vocabulary grows, the
    * bounded-sketch contract the exact token histogram
    * ([[corpusStatsSink]]) cannot give.
    */
  def heavyHittersSink(
      documents: DataFrame,
      outDir: String,
      checkpointDir: String,
      capacity: Int = 256): org.apache.spark.sql.streaming.StreamingQuery =
    documents.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        heavyHittersBatch(batch.toDF(), outDir, batchId, capacity)
      }
      .start()

  /** One micro-batch's summary store (factored out for replay tests). */
  def heavyHittersBatch(df: DataFrame, outDir: String, batchId: Long, capacity: Int = 256): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(explode(split(col("text"), " ")).as("token"))
      .as[String]
      .select(graft.functions.MisraGriesAggregator.full(capacity).toColumn.name("s"))
      .select(explode(arrays_zip(col("candidates"), col("counts"))).as("z"), col("n_total"))
      .select(col("z.candidates").as("token"), col("z.counts").as("cnt"),
        col("n_total").as("batch_n_total"), lit(batchId).as("bid"))
      .write.mode("overwrite").parquet(s"$outDir/mg/batch_$batchId")
    ()
  }

  /** The merged heavy-hitter summary over everything [[heavyHittersSink]]
    * committed: (token, est_count, n_total, max_undercount) with
    * est_count ≤ true ≤ est_count + max_undercount guaranteed. The merge
    * window runs over ≤ capacity·batches rows — summary-sized, never
    * vocabulary-sized.
    */
  def heavyHittersFrom(
      spark: org.apache.spark.sql.SparkSession,
      outDir: String,
      capacity: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val committed = committedBatchDirs(spark, s"$outDir/mg")
    if (committed.isEmpty)
      Seq.empty[(String, Long, Long, Long)]
        .toDF("token", "est_count", "n_total", "max_undercount")
    else {
      val raw = spark.read.parquet(committed.toSeq.sorted.map(b => s"$outDir/mg/$b"): _*)
      val nTotal = raw.groupBy(col("bid")).agg(max(col("batch_n_total")).as("bn"))
        .agg(coalesce(sum(col("bn")), lit(0L)).cast("bigint").as("n_total"))
      val wAll = Window.orderBy(col("c").desc, col("token"))
      val ranked = raw.groupBy(col("token"))
        .agg(sum(col("cnt")).as("c"))
        .withColumn("_rk", row_number().over(wAll))
      val cutF = ranked.agg(
        coalesce(max(when(col("_rk") === capacity + 1, col("c"))), lit(0L)).as("cut"))
      ranked
        .crossJoin(broadcast(cutF))
        .where(col("c") > col("cut"))
        .crossJoin(broadcast(nTotal))
        .select(col("token"),
          (col("c") - col("cut")).cast("bigint").as("est_count"),
          col("n_total"),
          expr(s"n_total div ${capacity + 1}").cast("bigint").as("max_undercount"))
    }
  }

  /** Calibration table for the n-gram language classifier — does a
    * winning score of 0.8 actually mean 80%-ish accuracy? Buckets the
    * winning stopword score into tenths and reports exact hit counts
    * per bucket: the reliability diagram every score-thresholding
    * pipeline should look at before picking a cutoff. `floor(score·10)`
    * is one IEEE multiply+floor of the same rational on both engines;
    * counts are exact, `accuracy` a single division.
    */
  def langIdCalibration(documents: DataFrame): DataFrame =
    langId(documents)
      .withColumn("bucket",
        floor(greatest(col("en_score"), col("de_score"), col("es_score"), col("fr_score"))
          * lit(10.0)).cast("int"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("is_correct")).as("n_correct"))
      .select(col("bucket"), col("n"), col("n_correct").cast("bigint").as("n_correct"),
        (col("n_correct").cast("double") / col("n").cast("double")).as("accuracy"))

  /** Code-vs-prose detection heuristics — the curation signal that keeps
    * source code out of (or routed into) a text corpus: exact counts of
    * code-charged symbols ({}[]();=<>), digits, and semicolons, their
    * fractions of the character count, and a verdict boolean at
    * `symbolFracMilli` thousandths. Pure per-row projection — scan speed
    * at any corpus size; every fraction is a single division of exact
    * int64 counts. (Whitespace-only or empty docs get NULL fractions
    * and a false verdict, never a division error.)
    */
  def codeDetect(documents: DataFrame, symbolFracMilli: Int = 30): DataFrame = {
    require(symbolFracMilli >= 1, s"symbolFracMilli must be >= 1, got $symbolFracMilli")
    documents
      .selectExpr("doc_id",
        "cast(length(text) as bigint) as n_chars",
        """cast(length(regexp_replace(text, '[^{}\\[\\]();=<>]', '')) as bigint) as n_symbols""",
        "cast(length(regexp_replace(text, '[^0-9]', '')) as bigint) as n_digits",
        "cast(length(regexp_replace(text, '[^;]', '')) as bigint) as n_semicolons")
      .selectExpr("doc_id", "n_chars", "n_symbols", "n_digits", "n_semicolons",
        "case when n_chars > 0 then cast(n_symbols as double) / cast(n_chars as double) end as symbol_frac",
        "case when n_chars > 0 then cast(n_digits as double) / cast(n_chars as double) end as digit_frac",
        s"cast(coalesce(n_symbols * 1000 >= $symbolFracMilli * n_chars and n_chars > 0, false) as boolean) as is_code")
  }

  /** Vocabulary-growth curve (the empirical Heaps'-law check): how many
    * NEW distinct tokens each tenth of the corpus introduces, and the
    * cumulative vocabulary. A flattening curve says the corpus stops
    * teaching the tokenizer; a linear one says it's still novel — the
    * "is more data still worth it" telemetry. Each token charges its
    * FIRST document (min doc id), buckets are integer value-ranges of
    * the id space, the cumulative fold is a ≤`buckets`-row window.
    */
  def vocabGrowth(documents: DataFrame, buckets: Int = 10): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    import org.apache.spark.sql.expressions.Window
    val firsts = documents
      .selectExpr("doc_id", "explode(filter(split(text, ' '), x -> x != '')) as token")
      .groupBy(col("token")).agg(min(col("doc_id")).as("first_doc"))
    val maxId = documents.agg(max(col("doc_id")).as("max_id"))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val counts = firsts
      .crossJoin(broadcast(maxId))
      .withColumn("bucket",
        least(expr(s"(first_doc - 1) * ${buckets}L div max_id"), lit(buckets - 1))
          .cast("int"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_new_tokens"))
    // saturated buckets introduce ZERO tokens — emit them explicitly so
    // the curve reads as a curve, not a sparse map
    documents.sparkSession.range(buckets)
      .select(col("id").cast("int").as("bucket"))
      .join(counts, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("n_new_tokens"), lit(0L)).cast("bigint").as("n_new_tokens"))
      .withColumn("cum_vocab", sum(col("n_new_tokens")).over(w).cast("bigint"))
  }

  /** Hashing-trick featurizer (Weinberger et al. 2009) in sparse COO
    * form: token → md5 bucket in [0, dim), per-(doc, bucket) exact
    * count plus the SIGNED sum (sign from an independent hash bit) that
    * makes collisions cancel in expectation — the inner-product-
    * preserving form downstream linear models want. One explode + one
    * map-side-combined count; int64 end to end.
    */
  def featureHash(documents: DataFrame, dim: Int = 64): DataFrame = {
    require(dim >= 2, s"dim must be >= 2, got $dim")
    documents
      .selectExpr("doc_id", "explode(filter(split(text, ' '), x -> x != '')) as token")
      .selectExpr("doc_id",
        s"${md5Long64("concat('fh:', token)")} % $dim as feature_idx",
        s"case when ${md5Long64("concat('fs:', token)")} % 2 = 1 then 1L else -1L end as sgn")
      .groupBy(col("doc_id"), col("feature_idx"))
      .agg(count(lit(1)).as("cnt"), sum(col("sgn")).cast("bigint").as("signed_sum"))
  }

  /** Gopher-style composite quality rules (Rae et al. 2021, §A1.1 — the
    * public rule set every corpus-curation pipeline starts from): word
    * count bounds, mean word length bounds, minimum alphabetic-word
    * fraction, and a required-stopword count. Emits each rule's value AND
    * boolean so a downstream filter can tune thresholds without
    * re-scanning; pure per-row projection — scan speed at any corpus
    * size, every predicate an exact int/int or IEEE comparison identical
    * across engines.
    */
  def gopherQuality(documents: DataFrame): DataFrame =
    documents
      .withColumn("toks", split(col("text"), " "))
      .selectExpr(
        "doc_id",
        "cast(size(toks) as bigint) as n_words",
        // total token chars / token count (no per-token length pass)
        "cast(length(text) - (size(toks) - 1) as double) / cast(size(toks) as double) as mean_word_len",
        "cast(size(filter(toks, t -> t rlike '[a-z]')) as double) / cast(size(toks) as double) as alpha_frac",
        """cast(size(array_intersect(array_distinct(toks),
          |  array('the', 'be', 'to', 'of', 'and', 'that', 'have', 'with'))) as bigint)
          |  as n_req_stopwords""".stripMargin)
      .selectExpr(
        "doc_id", "n_words", "mean_word_len", "alpha_frac", "n_req_stopwords",
        "n_words >= 50 and n_words <= 100000 as ok_word_count",
        "mean_word_len >= 3.0 and mean_word_len <= 10.0 as ok_word_len",
        "alpha_frac >= 0.8 as ok_alpha",
        "n_req_stopwords >= 2 as ok_stopwords")
      .selectExpr(
        "doc_id", "n_words", "mean_word_len", "alpha_frac", "n_req_stopwords",
        "ok_word_count", "ok_word_len", "ok_alpha", "ok_stopwords",
        "ok_word_count and ok_word_len and ok_alpha and ok_stopwords as gopher_pass")

  /** Per-document shingle NOVELTY: the fraction of a document's distinct
    * 3-gram shingles whose corpus-FIRST occurrence (smallest doc_id) is
    * this document — the "how much of this doc is new text" signal used
    * for curriculum ordering and incremental-crawl dedup (a doc of
    * recycled shingles scores ~0, original prose ~1).
    *
    * Plan: ONE exchange — the flat hashed shingle rows are pre-shuffled on
    * shingle_hash, the first-occurrence aggregate and its probe both sit
    * above it (exchange reuse), and the per-doc roll-up shuffles only
    * (doc_id, flags). Docs with no shingles (<3 tokens) have undefined
    * novelty and are absent by contract.
    */
  def shingleNovelty(documents: DataFrame): DataFrame = {
    val flat = documents
      .withColumn("hs",
        graft.functions.HashFunctions.shingles3_hashed(split(col("text"), " ")))
      .select(col("doc_id"), explode(col("hs")).as("shingle_hash"))
      .repartition(col("shingle_hash")) // computed once; both consumers reuse
    val first = flat.groupBy(col("shingle_hash"))
      .agg(min(col("doc_id")).as("first_doc"))
    flat.join(first, "shingle_hash")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .selectExpr(
        "doc_id", "n_shingles", "n_novel",
        "cast(n_novel as double) / cast(n_shingles as double) as novelty")
  }

  /** Corpus vocabulary profile: the k most frequent tokens with document
    * frequencies — the "what is this corpus made of" analysis under
    * tokenizer/vocab decisions. One explode + one aggregate with map-side
    * partials (per-partition token counts cross the wire, not token
    * streams); deterministic tie-break on the token itself.
    */
  def vocabTopK(documents: DataFrame, k: Int = 50): DataFrame =
    documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("token"))
      .agg(
        count(lit(1)).as("occurrences"),
        countDistinct(col("doc_id")).as("doc_freq"))
      .orderBy(col("occurrences").desc, col("token"))
      .limit(k)

  /** Overlapping token-window chunking — the context-window packing
    * primitive of a training pipeline: each document is split into
    * windows of `window` tokens advancing by `stride` (window − stride
    * tokens of overlap so no boundary context is lost). One row per
    * chunk with its index, length, and 60-bit content hash.
    *
    * Scale: a pure per-row explode — no shuffle, streams through the
    * corpus at scan speed; the start offsets and the slice/join/md5 are
    * all flat codegen'd columns (the hash is NOT computed inside an array
    * lambda — see repetitionCounts for why that matters).
    */
  def chunkTokens(documents: DataFrame, window: Int = 32, stride: Int = 24): DataFrame =
    documents
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), col("toks"),
        explode(expr(
          s"case when size(toks) > 0 then sequence(0, size(toks) - 1, $stride) else array() end")).as("start"))
      .selectExpr(
        "doc_id",
        s"cast(start div $stride as bigint) as chunk_idx",
        s"cast(least($window, size(toks) - start) as bigint) as n_chunk_tokens",
        s"${md5Long64(s"array_join(slice(toks, start + 1, $window), ' ')")} as chunk_hash")

  /** Cross-document chunk duplication: chunks (per [[chunkTokens]])
    * whose content appears in two or more distinct documents — template
    * reuse at sub-document granularity, which whole-document exact dedup
    * cannot see. Groups the 60-bit chunk hashes, so only 8-byte keys
    * cross the wire, never chunk text; partial aggregation collapses
    * per-partition repeats before the shuffle.
    */
  def chunkDedup(documents: DataFrame, window: Int = 32, stride: Int = 24): DataFrame =
    chunkTokens(documents, window, stride)
      .groupBy(col("chunk_hash"))
      .agg(
        count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("first_doc"))
      .where(col("n_docs") >= 2)

  /** Top-k salient terms per document by tf·idf with a RATIONAL idf
    * (idf ∝ N/df rather than ln(N/df)): `ln` is a libm call whose last
    * bits differ across engines, while `tf × (double(N) / df)` is two
    * IEEE-754 operations every engine computes bit-identically — and the
    * monotone transform preserves the per-document ranking that top-k
    * actually consumes.
    *
    * Plan shape: explode → tf aggregate (near-unique (doc, token) keys —
    * partial aggregation is skew-immune), then df as a second map-side-
    * combined aggregate OVER the tf rows (tf rows are already distinct
    * per (doc, token), so `count(*)` per token IS the document
    * frequency — no second explode, no countDistinct) joined back. The
    * join-back replaces the previous `count() over (partition by token)`
    * window: a window partition cannot be split by AQE, so the stopword
    * token would buffer df ≤ n_docs rows in ONE task at corpus scale,
    * while the join form AQE either broadcasts (vocabulary-sized df
    * side) or skew-splits. N is a 1-row broadcast. Shuffles carry
    * aggregated rows, never raw token streams.
    */
  def tfidfTop(documents: DataFrame, k: Int = 3): DataFrame = {
    val tf = documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val n = documents.agg(count(lit(1)).as("n_docs"))
    // the tf > 0 filter is a tautology (count ≥ 1) whose only job is to
    // CONSUME tf in the df branch: without it column pruning rewrites the
    // branch's inner aggregate to keys-only, its (doc, token) exchange no
    // longer canonicalizes equal to the probe side's, and AQE stage reuse
    // can't fire — with it the corpus scan→explode→tf pipeline runs ONCE
    val df = tf.where(col("tf") > 0)
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    tf.join(df, Seq("token"))
      .crossJoin(broadcast(n))
      .selectExpr("doc_id", "token", "tf", "df",
        "tf * (cast(n_docs as double) / df) as score")
      .selectExpr("doc_id", "token", "tf", "df", "score",
        "row_number() over (partition by doc_id order by score desc, token) as rk")
      .where(col("rk") <= k)
      .selectExpr("doc_id", "token", "tf", "df", "score", "cast(rk as bigint) as rank")
  }

  /** Sparse tf·idf cosine pair similarity — the WEIGHTED near-dup measure:
    * two documents sharing rare terms score high even when their shingle
    * overlap is low (paraphrase/topic duplication, which exact-set Jaccard
    * under-scores and MinHash can't see at all). This is sparse-vector ANN
    * by inverted-index join: a pair only materializes where a term is
    * shared, so the cost is Σ(df²) over the SURVIVING terms — and terms
    * with df > maxDf are dropped, which both bounds every bucket at maxDf²
    * and removes exactly the stopword mass whose idf weight is ~0 anyway.
    *
    * Plan: one corpus scan → tf aggregate; df via a map-side-combined
    * count over the tf rows joined back, with the `df <= maxDf` filter
    * applied to the df side BEFORE the join so the join doubles as the
    * stopword drop (no second explode, and no token-partitioned window —
    * the unsplittable-stopword-task shape; see [[tfidfTop]]); per-doc
    * norms aggregate the SAME weighted rows and ride through the pair
    * join as plain columns (joining norms onto the pair set afterwards
    * would shuffle every candidate pair again). Rational idf (N/df, not
    * ln(N/df)) keeps every weight a pure IEEE expression both engines
    * compute bit-identically; the final cosine is rounded once and the
    * threshold compares the ROUNDED value so the boundary is
    * engine-stable.
    */
  def tfidfCosinePairs(
      documents: DataFrame,
      maxDf: Int = 100,
      threshold: Double = 0.5,
      topK: Int = 50): DataFrame = {
    // the explicit isnotnull is the freqScore idiom applied to doc_id:
    // the downstream doc_id joins (norms, pair sides) infer-push
    // `isnotnull(doc_id)` into the PROBE-side tf branch only, leaving
    // the df branch's scan without it — the two (doc, token) exchanges
    // then canonicalize differently and AQE stage reuse can't fire, so
    // the corpus scan→explode→tf pipeline ran TWICE (observed in the
    // executed plan; PlanSpec now pins one materialized exchange).
    // Putting the filter at the source makes both branches identical —
    // and it is the semantic choice the oracle mirrors: tf·idf weights
    // are defined over identified documents
    val tf = documents
      .where(col("doc_id").isNotNull)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val n = documents.agg(count(lit(1)).cast("double").as("n_docs"))
    // tautological tf > 0 keeps tf alive in this branch so the (doc,
    // token) exchange canonicalizes equal to the probe side's and AQE
    // stage reuse scans the corpus once (see tfidfTop)
    val df = tf.where(col("tf") > 0)
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
    val w = tf.join(df, Seq("token"))
      .crossJoin(broadcast(n))
      .selectExpr("doc_id", "token", "tf * (n_docs / df) as w")
      // one exchange under the norm aggregate AND both pair-join sides
      .repartition(col("doc_id"))
    val norms = w.groupBy(col("doc_id"))
      .agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
    val wn = w.join(norms, "doc_id")
    wn.select(col("token"), col("doc_id").as("a_id"), col("w").as("a_w"), col("nrm").as("a_nrm"))
      .join(wn.select(col("token"), col("doc_id").as("b_id"), col("w").as("b_w"),
        col("nrm").as("b_nrm")), "token")
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"), col("a_nrm"), col("b_nrm"))
      .agg(sum(col("a_w") * col("b_w")).as("dot"))
      .select(col("a_id"), col("b_id"),
        round(col("dot") / (col("a_nrm") * col("b_nrm")), 6).as("cosine"))
      .filter(col("cosine") >= threshold)
      .orderBy(col("cosine").desc, col("a_id"), col("b_id"))
      .limit(topK)
  }

  /** Document fingerprints: whole-text hash plus the minimum shingle hash
    * (the "winnowing" representative) — the primitives under both exact
    * and MinHash dedup.
    */
  def fingerprints(documents: DataFrame): DataFrame =
    documents
      .withColumn("shs",
        graft.functions.HashFunctions.shingles3_hashed(split(col("text"), " ")))
      .selectExpr(
        "doc_id",
        s"${md5Long64("text")} as text_hash",
        "array_min(shs) as min_shingle_hash",
        "cast(size(shs) as bigint) as n_shingles")

  /** C4-style duplicate-span removal WITH document reconstruction: split
    * every document into disjoint `block`-token spans, keep only the
    * corpus-global FIRST occurrence of each span's content (ordered by
    * (doc_id, position) — deterministic under any partitioning), and
    * rebuild each document's text from its surviving spans in order.
    * This is the rewrite form of dedup — C4 dropped repeated lines, not
    * whole pages — which `chunkDedup` (report form) cannot do.
    *
    * Scale shape — deliberately NOT a `row_number() over (partition by
    * bhash)` window: the duplicate clusters ARE the skew (a boilerplate
    * license block repeated across millions of documents is one bhash
    * key holding all its occurrences), and a window partition is
    * unsplittable by AQE — the freq_score/dsir lesson applies to the
    * span hash too. Instead the corpus-first occurrence per span is a
    * map-side-combined `groupBy(bhash).agg(min(struct(doc_id, idx)))` —
    * the million-copy cluster collapses to one row per task BEFORE its
    * exchange — joined back on bhash, where a skewed key is
    * AQE-splittable. The reconstruction then groups by doc_id, an
    * exchange whose payload is bounded by the surviving corpus itself
    * (the same bytes any rewrite must move).
    */
  def blockDedupRewrite(documents: DataFrame, block: Int = 16): DataFrame = {
    val blocks = documents
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), col("toks"),
        explode(expr(
          s"case when size(toks) > 0 then sequence(0, size(toks) - 1, $block) else array() end")).as("start"))
      .selectExpr(
        "doc_id",
        s"cast(start div $block as bigint) as idx",
        s"array_join(slice(toks, start + 1, $block), ' ') as btext")
      .withColumn("bhash", expr(md5Long64("btext")))
    // corpus-global first occupant of each span content, (doc_id, idx)
    // lexicographic — identical to the former window's row_number()=1
    // under ORDER BY (doc_id, idx), but skew-immune by partial aggregation
    val firsts = blocks.groupBy(col("bhash"))
      .agg(min(struct(col("doc_id"), col("idx"))).as("first"))
    blocks.join(firsts, Seq("bhash"))
      .withColumn("_keep",
        col("doc_id") === col("first.doc_id") && col("idx") === col("first.idx"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_blocks"),
        count(when(col("_keep"), lit(1))).as("n_kept"),
        collect_list(when(col("_keep"), struct(col("idx"), col("btext")))).as("_kept"))
      .selectExpr(
        "doc_id", "n_blocks", "n_kept",
        // collect_list drops the non-kept nulls; order by span position.
        // NULL iff ZERO spans survive (string_agg-over-no-rows semantics);
        // nullif on the joined string would also null a legitimately
        // surviving empty-string span (a corpus-first empty-text doc)
        """case when n_kept = 0 then cast(null as string)
          | else array_join(transform(array_sort(_kept), s -> s.btext), ' ') end as new_text""".stripMargin)
  }

  /** The rolling L-token duplicated-window stream shared by [[dupSpans]]
    * and [[substringDedup]]: one row per (doc, start) whose L-token
    * window content also occurs elsewhere in the corpus (any other
    * (doc, start), including within the same document). Overlapping
    * starts make the detection ALIGNMENT-FREE — a duplicated passage is
    * caught wherever it begins, where the disjoint-block form
    * ([[blockDedupRewrite]]) only sees block-aligned reuse.
    *
    * Scale shape: the window hashes are flat codegen'd columns (hash
    * OUTSIDE any array lambda — the repetitionCounts lesson), the
    * occurrence count is a map-side-combined aggregate over 60-bit
    * hashes (a boilerplate passage duplicated across millions of docs
    * collapses to one row per task before its exchange), and the
    * join-back key is AQE-skew-splittable. Only (doc_id, start, hash)
    * triples ever shuffle — never window text.
    */
  private[graft] def dupWindows(documents: DataFrame, window: Int): DataFrame = {
    require(window >= 2, s"window must be >= 2 tokens, got $window")
    // ONE branch, ONE md5 evaluation per token position. The former
    // join-back shape (wins ⋈ groupBy(whash) on whash) re-hashed every
    // window on BOTH join sides, and the join's inferred
    // isnotnull(whash) filter — pushed below the projection — duplicated
    // the md5 expression AGAIN per branch: up to 4 md5 evaluations per
    // position for a pass the SubstrProbe phase audit attributes ~90% of
    // the family's cost to (BENCH_SF1.md). Collecting each hash's
    // occurrence list in the same aggregate that counts it and exploding
    // it back emits the identical (doc_id, start, whash, cnt, first)
    // rows — inner-join-on-whash row multiplicity included — from a
    // single pass. Shuffle bytes are unchanged (the old probe side
    // shuffled every position into the join; the list buffers the same
    // (doc_id, start) pairs, partial-merged map-side), and the per-hash
    // list is bounded by the window's duplication count — the same
    // cluster-skew bound the count aggregate already carries. whash is
    // never NULL here (md5 of a non-null string; null/short texts fail
    // the size filter), so dropping the join drops no null-key subtlety.
    val wins = documents
      .withColumn("toks", split(col("text"), " "))
      .where(size(col("toks")) >= window)
      .select(col("doc_id"), col("toks"),
        explode(expr(s"sequence(0, size(toks) - $window)")).as("start"))
      .selectExpr("doc_id", "cast(start as bigint) as start",
        s"${md5Long64(s"array_join(slice(toks, start + 1, $window), ' ')")} as whash")
    wins.groupBy(col("whash"))
      .agg(count(lit(1)).as("cnt"),
        min(struct(col("doc_id"), col("start"))).as("first"),
        collect_list(struct(col("doc_id"), col("start"))).as("_occ"))
      .where(col("cnt") > 1)
      .select(col("whash"), explode(col("_occ")).as("_o"), col("cnt"), col("first"))
      .select(col("_o.doc_id").as("doc_id"), col("_o.start").as("start"),
        col("whash"), col("cnt"), col("first"))
  }

  /** Duplicated-substring spans — the telemetry half of exact substring
    * dedup (Lee et al. 2021, "Deduplicating Training Data Makes Language
    * Models Better": the ExactSubstr criterion, here at token rather
    * than byte granularity): every maximal token span of a document
    * whose every L-token window occurs more than once in the corpus.
    * Overlapping duplicated windows merge into maximal spans (classic
    * gaps-and-islands: a new island starts when the next duplicated
    * start is more than L past the previous — beyond overlap-or-touch).
    *
    * Emits (doc_id, span_start, span_end, span_tokens, n_windows) per
    * maximal span, token positions 0-based inclusive. The per-doc island
    * window partitions by doc_id — bounded by document length, never by
    * corpus size (the duplicate CLUSTER skew lives in the hash-count
    * aggregate, which is map-side combined; see [[dupWindows]]).
    */
  def dupSpans(documents: DataFrame, window: Int = 8): DataFrame = {
    val wlag = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("start"))
    val wrun = wlag.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    dupWindows(documents, window)
      .select(col("doc_id"), col("start"))
      .withColumn("_new",
        when(col("start") - lag(col("start"), 1).over(wlag) <= window, 0L)
          .otherwise(1L))
      .withColumn("_island", sum(col("_new")).over(wrun))
      .groupBy(col("doc_id"), col("_island"))
      .agg(min(col("start")).as("span_start"),
        (max(col("start")) + window - 1).as("span_end"),
        count(lit(1)).as("n_windows"))
      .selectExpr("doc_id", "span_start", "span_end",
        "span_end - span_start + 1 as span_tokens", "n_windows")
  }

  /** Exact substring DEDUP with document reconstruction — the rewrite
    * half: every non-first occurrence of a duplicated L-token window is
    * removed (corpus-global keep-first on (doc_id, start) lexicographic,
    * so exactly one copy of each duplicated passage survives, in its
    * earliest document), and each document is rebuilt from its surviving
    * tokens in order. The alignment-free counterpart of
    * [[blockDedupRewrite]]: a passage repeated at ANY offset is caught,
    * not just block-aligned reuse.
    *
    * Output per document: n_tokens, n_kept, new_text (NULL iff zero
    * tokens survive — the [[blockDedupRewrite]] convention).
    *
    * Scale shape: covered positions are (doc_id, bigint) pairs — L rows
    * per duplicated window, deduplicated map-side; the anti-join and the
    * per-doc rebuild shuffle at most the surviving corpus itself (the
    * same bytes any rewrite must move). No per-token array scans — the
    * covered-position check is a hash anti-join, not an
    * `array_contains` lambda (which would be O(len²) per doc).
    */
  def substringDedup(documents: DataFrame, window: Int = 8): DataFrame = {
    val losers = dupWindows(documents, window)
      .where(!(col("doc_id") === col("first.doc_id") &&
        col("start") === col("first.start")))
    val covered = losers
      .select(col("doc_id"),
        explode(expr(s"sequence(start, start + ${window - 1})")).as("pos"))
      .distinct()
    val toks = documents
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
      .withColumn("pos", col("pos").cast("long"))
    val rebuilt = toks
      .join(covered, Seq("doc_id", "pos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        collect_list(struct(col("pos"), col("token"))).as("_kept"))
      .selectExpr("doc_id", "n_kept",
        "array_join(transform(array_sort(_kept), s -> s.token), ' ') as new_text")
    documents
      .selectExpr("doc_id", "cast(size(split(text, ' ')) as bigint) as n_tokens")
      .join(rebuilt, Seq("doc_id"), "left")
      .selectExpr("doc_id", "n_tokens",
        "coalesce(n_kept, cast(0 as bigint)) as n_kept", "new_text")
  }

  /** Exact corpus heavy hitters (tokens with frequency > N/k) via a
    * bounded-memory two-pass plan: pass 1 is one [[graft.functions.MisraGriesAggregator]]
    * scan yielding ≤ `capacity` candidates (a PROVEN superset of every
    * token above N/(capacity+1) ≥ N/k, so nothing is missed) plus the
    * exact total N; pass 2 re-counts ONLY the candidates — the corpus is
    * filtered through a broadcast hash join against the exploded candidate
    * set before the exchange, so the shuffle carries at most `capacity`
    * distinct keys instead of the full vocabulary. The result is bit-identical to the exact
    * `GROUP BY ... HAVING count(*)*k > N` (the oracle) at any data size,
    * but the plan never materializes a vocabulary-sized aggregate.
    */
  def heavyHitters(documents: DataFrame, k: Int = 40, capacity: Int = 256): DataFrame = {
    require(capacity + 1 >= k,
      s"capacity+1 (${capacity + 1}) must be >= k ($k) for the superset guarantee")
    val spark = documents.sparkSession
    import spark.implicits._
    val toks = documents.select(explode(split(col("text"), " ")).as("token"))
    val summary = toks
      .as[String]
      .select(graft.functions.MisraGriesAggregator(capacity).toColumn.name("s"))
      .select(col("candidates").as("cands"), col("n_total")) // typed select flattens Out
    // exploded candidates → broadcast HASH join: the probe is one hash
    // lookup per corpus token, where `array_contains(cands, token)` had no
    // equality term and planned as a nested-loop doing up to `capacity`
    // string compares per token (~256× the probe work at corpus scale)
    val cands = summary.select(explode(col("cands")).as("token"), col("n_total"))
    toks
      .join(broadcast(cands), Seq("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"), first(col("n_total")).as("n_total"))
      .where(col("cnt") * k > col("n_total"))
      .select(col("token"), col("cnt"))
      .orderBy(col("cnt").desc, col("token"))
  }

  /** Count-min sketch of the corpus token frequencies (Cormode &
    * Muthukrishnan 2005), verified against exact counts on a
    * deterministic probe slice of the vocabulary.
    *
    * The sketch IS a bounded `groupBy`: every token occurrence maps to
    * `depth` (row, bucket) cells via independent 60-bit md5 hashes, and
    * the cell counts aggregate with map-side combine — each partition
    * reduces to ≤ depth·width rows before the exchange, so the exchange
    * carries depth·width·numPartitions rows REGARDLESS of vocabulary
    * size (the same bounded-summary rationale as [[heavyHitters]], but
    * answering point-frequency queries for EVERY token instead of only
    * the dominant ones). Because cell counts are plain sums, the sketch
    * is mergeable by construction — union-then-sketch equals
    * sketch-then-add, pinned under repartitioning in ExtSpec.
    *
    * The query side estimates a token's count as min over its `depth`
    * cells; CMS guarantees est ≥ exact always (collisions only ADD), so
    * `over_ok` is a structural invariant the gate pins to 1, and `err`
    * (= est − exact ≥ 0) is the observed collision mass. The probe slice
    * (`hash(token) % probeMod == 0`) keeps the verification arm's exact
    * re-count at 1/probeMod of the vocabulary (the declared gate uses a
    * small probeMod sized to the test corpus's vocabulary; production
    * uses the 1/101 default); a production consumer keeps only the
    * depth·width-cell sketch.
    *
    * Everything is int64 md5-bucket arithmetic, so the whole sketch —
    * build, probe, estimate, invariant — sits under the DuckDB hash gate.
    */
  def cmsCounts(
      documents: DataFrame,
      depth: Int = 4,
      width: Int = 512,
      probeMod: Int = 101): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    require(probeMod >= 1, s"probeMod must be >= 1, got $probeMod")
    // ONE md5 per token occurrence; the depth row hashes and the probe
    // membership derive from it through the MinHash universal family
    // (u_r = (a_r·h + b_r) mod P over the md5's low 30 bits — the
    // bootstrapMeans precedent, measured 8× faster there than hashing
    // md5(r, token) per row; here the md5(r:token)-per-cell form cost
    // 5 md5 evaluations per occurrence)
    def rowBucket(r: Int): String =
      s"((${graft.ext.Dedup.minhashA(r)}L * (h % 1073741824L) + ${graft.ext.Dedup.minhashB(r)}L)" +
        s" % ${graft.ext.Dedup.MinhashP}L) % $width"
    val toks = documents
      .select(explode(split(col("text"), " ")).as("token"))
      .select(col("token"), expr(s"${md5Long64("token")}").as("h"))
    // sketch build: depth cells per occurrence, ≤ depth·width after combine
    val sketch = toks
      .select(explode(expr(
        s"array(${(0 until depth).map(r => s"named_struct('r', $r, 'bucket', ${rowBucket(r)})").mkString(", ")})"))
        .as("p"))
      .select(col("p.r").as("r"), col("p.bucket").as("bucket"))
      .groupBy(col("r"), col("bucket"))
      .agg(count(lit(1)).as("c"))
    // probe slice: exact counts for a deterministic 1/probeMod vocabulary
    // cut (its own affine map of the same h — index `depth`, so it is
    // independent of every row hash in use)
    val probeA = graft.ext.Dedup.minhashA(depth)
    val probeB = graft.ext.Dedup.minhashB(depth)
    val exact = toks
      .where(expr(s"(${probeA}L * (h % 1073741824L) + ${probeB}L) % ${graft.ext.Dedup.MinhashP}L % $probeMod = 0"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("exact_c"))
    // estimate: min over the token's depth cells; sketch is ≤ depth·width
    // rows — broadcast, so the probe side never shuffles
    val est = exact
      .select(col("token"), col("exact_c"),
        explode(expr(s"sequence(0, ${depth - 1})")).as("r"))
      .withColumn("h", expr(md5Long64("token")))
      // the SAME family by construction: minhashA(r) = 75437 + 2r,
      // minhashB(r) = 13007·(r+1) — r is a column here, so the constants
      // unroll arithmetically instead of per-index
      .withColumn("bucket", expr(
        s"(((75437L + 2L * r) * (h % 1073741824L) + 13007L * (r + 1)) % ${graft.ext.Dedup.MinhashP}L) % $width"))
      .join(broadcast(sketch), Seq("r", "bucket"))
      .groupBy(col("token"), col("exact_c"))
      .agg(min(col("c")).as("est_c"))
    est.select(
      col("token"), col("exact_c"), col("est_c"),
      (col("est_c") - col("exact_c")).as("err"),
      expr("cast(case when est_c >= exact_c then 1 else 0 end as int)").as("over_ok"))
  }

  /** Inverted index: token → sorted posting list of containing documents
    * (+ document frequency) — the search primitive over a corpus. One
    * explode and ONE shuffle of (token, doc_id) pairs; `collect_set`
    * deduplicates map-side partials, and the posting list is sorted so
    * the output is bit-stable under any partitioning. At 100 TB the
    * posting lists of stop-word-frequency tokens get large — real
    * deployments shard them (posting-list chunking is `doc_chunks` over
    * this output); the index build itself stays one exchange.
    */
  def invertedIndex(documents: DataFrame): DataFrame =
    documents
      .select(explode(split(col("text"), " ")).as("token"), col("doc_id"))
      .groupBy(col("token"))
      .agg(sort_array(collect_set(col("doc_id"))).as("postings"))
      .select(col("token"),
        size(col("postings")).cast("bigint").as("doc_freq"),
        col("postings"))
      .orderBy(col("token"))

  /** Pointwise mutual information of adjacent token pairs — the
    * co-occurrence statistic under embedding/phrase induction (PMI > 0 ⇒
    * the pair co-occurs more than independence predicts). One corpus
    * scan: bigrams explode to (a, b) pairs, unigram counts come from the
    * same tokens; both aggregates carry map-side partials and the join of
    * pair counts to the two unigram tables broadcasts the (vocabulary-
    * sized) unigram side only when it fits. The ratio
    * n·c(a,b)/(c(a)·c(b)) is computed in DOUBLE products (counts at
    * corpus scale overflow int64 products) with the identical
    * left-to-right expression in the oracle, then one log + round(6).
    */
  def tokenPmi(documents: DataFrame, minCount: Int = 5): DataFrame = {
    val toks = documents
      .withColumn("toks", split(col("text"), " "))
    val pairs = toks
      .select(explode(expr(
        """case when size(toks) >= 2
          | then transform(sequence(1, size(toks) - 1),
          |   i -> struct(element_at(toks, i) as a, element_at(toks, i + 1) as b))
          | else array() end""".stripMargin)).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("pair_n"))
      .filter(col("pair_n") >= minCount)
    val uni = toks
      .select(explode(col("toks")).as("t"))
      .groupBy(col("t"))
      .agg(count(lit(1)).as("t_n"))
    val total = toks.select(explode(col("toks")).as("t"))
      .agg(count(lit(1)).as("n_tok"))
    pairs
      .join(uni.select(col("t").as("a"), col("t_n").as("a_n")), Seq("a"))
      .join(uni.select(col("t").as("b"), col("t_n").as("b_n")), Seq("b"))
      .crossJoin(broadcast(total))
      .select(col("a"), col("b"), col("pair_n"),
        round(log(col("pair_n").cast("double") * col("n_tok")
          / (col("a_n").cast("double") * col("b_n"))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("a"), col("b"))
      .limit(100)
  }

  /** BM25 document ranking for a fixed term set — the standard retrieval
    * scorer (Robertson/Okapi) over the corpus, used to mine
    * domain-relevant training documents. Shape: per-document term
    * frequencies are array `filter` projections (the query terms are a
    * constant — no explode, no join against an index); the corpus
    * statistics (N, Σdl, per-term document frequencies) are ONE aggregate
    * row broadcast back; scoring is a pure projection and the top-N a
    * TakeOrdered. Zero wide shuffles at any corpus size.
    *
    * Cross-engine parity: per-term scores are summed in FIXED expression
    * order (s₀ + s₁ + …, not an aggregate whose order floats), every
    * intermediate is double with the identical left-to-right formula in
    * the oracle, rounded once at the end.
    */
  /** Reciprocal-rank fusion (Cormack et al. SIGIR 2009) of two retrieval
    * lists — the standard way to combine heterogeneous rankers (two
    * query formulations, BM25 + dense retrieval, …) without score
    * calibration: fused(d) = Σ_lists 1/(k + rank_list(d)), absent-from-
    * list contributes 0. Ranks are WITHIN the retrieved top-`listN`
    * lists (the serving shape — RRF fuses per-query candidate lists, not
    * corpus-wide rankings), so the rank windows run over listN-sized
    * frames: bounded by construction, never a corpus-wide global window.
    *
    * The fused score is two IEEE divisions on integer ranks summed in a
    * fixed order — bit-reproducible in the oracle with no rounding
    * escape hatch.
    */
  /** HYBRID retrieval — the modern search composition: a LEXICAL arm
    * ([[bm25Top]]) and a VECTOR arm
    * ([[graft.ext.Similarity.cosineTopK]] against a query embedding)
    * fused by reciprocal-rank fusion. RRF is the standard hybrid
    * combiner precisely because the two arms' scores are incomparable
    * (BM25 mass vs cosine) — only ranks fuse safely. Composition of
    * three already-gated operators; this query gates the composition
    * (the pipeline_curate4 doctrine).
    *
    * Scale shape: each arm is its own bounded top-k (BM25: one scan +
    * TakeOrdered; cosine: one scan against a broadcast query vector +
    * TakeOrdered); the fuse is a ≤ 2·listN-row full-outer join and the
    * rank windows run over listN rows — constant frames, never data.
    */
  def hybridSearch(
      documents: DataFrame,
      embeddings: DataFrame,
      terms: Seq[String],
      queryVecId: Long = 0L,
      rrfK: Int = 60,
      listN: Int = 20,
      topN: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(rrfK >= 1 && listN >= 1 && topN >= 1)
    val lex = bm25Top(documents, terms, topN = listN)
      .select(col("doc_id"), col("score"))
      .withColumn("rank_lex",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id"))))
      .drop("score")
    val vec = graft.ext.Similarity.cosineTopK(embeddings, queryVecId, k = listN)
      .select(col("vec_id").as("doc_id"), col("cosine_sim"))
      .withColumn("rank_vec",
        row_number().over(Window.orderBy(col("cosine_sim").desc, col("doc_id"))))
      .drop("cosine_sim")
    lex.join(vec, Seq("doc_id"), "full_outer")
      .withColumn("rrf_score",
        coalesce(lit(1.0) / (lit(rrfK) + col("rank_lex")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("rank_vec")), lit(0.0)))
      .orderBy(col("rrf_score").desc, col("doc_id"))
      .limit(topN)
  }

  def rrfFusion(
      documents: DataFrame,
      termsA: Seq[String],
      termsB: Seq[String],
      rrfK: Int = 60,
      listN: Int = 20,
      topN: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(rrfK >= 1 && listN >= 1 && topN >= 1)
    def ranked(terms: Seq[String], rankName: String) =
      bm25Top(documents, terms, topN = listN)
        .select(col("doc_id"), col("score"))
        .withColumn(rankName,
          row_number().over(Window.orderBy(col("score").desc, col("doc_id"))))
        .drop("score")
    ranked(termsA, "rank_a")
      .join(ranked(termsB, "rank_b"), Seq("doc_id"), "full_outer")
      .withColumn("rrf_score",
        coalesce(lit(1.0) / (lit(rrfK) + col("rank_a")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("rank_b")), lit(0.0)))
      .orderBy(col("rrf_score").desc, col("doc_id"))
      .limit(topN)
  }

  def bm25Top(
      documents: DataFrame,
      terms: Seq[String] = Seq("spark", "query", "join"),
      k1: Double = 1.2,
      b: Double = 0.75,
      topN: Int = 20): DataFrame = {
    require(terms.nonEmpty && terms.forall(t => t.matches("[A-Za-z0-9_]+")))
    val withTf = documents
      .withColumn("toks", split(col("text"), " "))
      .withColumn("dl", size(col("toks")).cast("bigint"))
      .select(Seq(col("doc_id"), col("dl")) ++ terms.zipWithIndex.map { case (t, i) =>
        expr(s"cast(size(filter(toks, x -> x = '$t')) as bigint)").as(s"tf$i")
      }: _*)
    val aggs = Seq(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl")) ++
      terms.indices.map(i => sum((col(s"tf$i") > 0).cast("bigint")).as(s"df$i"))
    val stats = withTf.agg(aggs.head, aggs.tail: _*)
    val perTerm = terms.indices.map { i =>
      s"""(ln((cast(n_docs as double) - df$i + 0.5) / (df$i + 0.5) + 1.0)
         | * (cast(tf$i as double) * ${k1 + 1.0})
         | / (cast(tf$i as double) + $k1 * (${1.0 - b} + $b * (cast(dl as double) / (cast(sum_dl as double) / n_docs)))))""".stripMargin
    }
    withTf
      .crossJoin(broadcast(stats))
      .withColumn("score", expr(s"round(${perTerm.mkString(" + ")}, 6)"))
      .filter(col("score") > 0)
      .select(Seq(col("doc_id"), col("dl"), col("score")) ++
        terms.indices.map(i => col(s"tf$i")): _*)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topN)
  }

  /** Deterministic sequence PACKING — the training-batch assembly step:
    * documents are laid out into fixed `budget`-token context windows, and
    * the operator reports each window's occupancy (the padding/waste
    * metric every training pipeline tracks). Docs are placed by contiguous
    * offset fill: within a group, each doc starts where the previous one
    * ended, and its bin is the window containing its start offset — a doc
    * straddling a boundary is accounted to its start bin (`fill_ratio`
    * can exceed 1 there; real packers split the straddler across windows,
    * which is the same token accounting).
    *
    * Scale shape: a greedy global packer is inherently sequential, so the
    * corpus is first split into `groups` deterministic hash buckets and
    * packed independently per bucket — `groups`-way parallel running-sum
    * windows (each a single partition of corpus/groups rows), the
    * standard shard-then-pack layout. Order within a group is (doc hash,
    * doc_id): fully deterministic under any partitioning, no RNG.
    */
  def packSequences(documents: DataFrame, budget: Int = 512, groups: Int = 32): DataFrame = {
    val sized = documents.selectExpr(
      "doc_id",
      "cast(size(split(text, ' ')) as bigint) as n_tokens",
      s"pmod(${md5Long64("cast(doc_id as string)")}, $groups) as grp",
      s"${md5Long64("cast(doc_id as string)")} as h")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("h"), col("doc_id"))
    sized
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .selectExpr("grp", "doc_id", "n_tokens",
        s"cast((cum - n_tokens) div $budget as bigint) as bin")
      .groupBy(col("grp"), col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("bin_tokens"))
      .selectExpr("grp", "bin", "n_docs", "bin_tokens",
        s"cast(bin_tokens as double) / $budget.0 as fill_ratio")
  }

  /** Per-group heavy hitters — frequent tokens per language/source/domain,
    * the realistic per-domain profile of a mixed corpus. One Misra–Gries
    * summary PER KEY (`groupByKey.agg`, each group's sketch bounded at
    * `capacity` entries, superset guarantee per group), then the exact
    * re-count joins the broadcast per-group candidate sets and keeps
    * tokens above that group's N/k. The summary side is |groups| rows at
    * any corpus size; the re-count exchange carries at most
    * |groups|·capacity keys.
    */
  /** Email / IPv4 / phone patterns for [[piiScrub]]. Restricted to regex
    * constructs whose semantics coincide between Java's backtracking
    * engine (Spark) and RE2-style leftmost-longest engines (DuckDB, and
    * most data-plane scrubbers): character classes, bounded/greedy
    * repetition, `\b`, no alternation inside a quantifier, no lookaround.
    * On these, greedy leftmost-first ≡ leftmost-longest, so the same
    * pattern string is portable across engines — which is what lets the
    * scrub sit under the cross-engine hash gate.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b"
  val PhoneRe = "\\+\\d{7,15}"

  /** PII scrubbing — the redaction pass every shared training corpus goes
    * through: count and replace emails, bare IPv4 addresses and
    * international-format phone numbers with typed placeholder tokens.
    * Pure projection (codegen'd regexp expressions, one text scan, no
    * shuffle); order is email → IP → phone so an address consumed by an
    * earlier rule can't partially re-match a later one. NULL text flows
    * through as NULL counts/text, matching SQL semantics.
    */
  def piiScrub(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"),
      regexp_count(col("text"), lit(EmailRe)).as("n_emails"),
      regexp_count(col("text"), lit(Ipv4Re)).as("n_ipv4"),
      regexp_count(col("text"), lit(PhoneRe)).as("n_phones"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), EmailRe, "<EMAIL>"),
          Ipv4Re, "<IP>"),
        PhoneRe, "<PHONE>").as("scrubbed"))

  /** One-row corpus report card — the numbers every curation run logs
    * before and after each stage: document/token/type counts, hapax count
    * (vocabulary items seen exactly once — the OOV-tail size), the
    * heaviest token frequency, and the derived type–token / hapax ratios.
    * Plan shape: one token exchange (map-side-combined groupBy on the
    * token) feeding a single-row aggregate, plus a 1-row broadcast of the
    * document count — two scans, one real shuffle, output size O(1) at
    * any corpus scale. Ratios are exact-int IEEE divisions on one row, so
    * the whole card is cross-engine exact.
    */
  def corpusStats(documents: DataFrame): DataFrame =
    statsCard(
      documents.selectExpr(
        "explode(filter(split(text, ' '), x -> x != '')) as token")
        .groupBy(col("token")).agg(count(lit(1)).as("c")),
      documents.agg(count(lit(1)).as("n_docs")))

  /** The per-SOURCE report card — [[corpusStats]] grouped by origin
    * domain, the table a curation dashboard actually shows (corpus-wide
    * numbers hide a single bad source behind the aggregate; mixture
    * decisions are made per source). Same counters, keyed: docs,
    * tokens, types, hapax count, heaviest token frequency, type–token
    * and hapax ratios. Types/hapax are per-source by definition (a
    * token common globally can be a hapax within one source).
    *
    * Scale shape: ONE (source, token)-keyed map-side-combined exchange
    * (the tf→df idiom) plus a per-source doc count — the source key
    * rides the token exchange, so the cost over [[corpusStats]] is the
    * key bytes, not a second corpus pass.
    */
  def sourceReport(documents: DataFrame): DataFrame = {
    val perTok = documents.selectExpr("source",
        "explode(filter(split(text, ' '), x -> x != '')) as token")
      .groupBy(col("source"), col("token")).agg(count(lit(1)).as("c"))
    val nDocs = documents.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    perTok.groupBy(col("source")).agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"),
        max(col("c")).as("max_token_freq"))
      .join(nDocs, Seq("source"), "right")
      .selectExpr("source", "n_docs",
        "coalesce(n_tokens, cast(0 as bigint)) as n_tokens",
        "coalesce(n_types, cast(0 as bigint)) as n_types",
        "coalesce(n_hapax, cast(0 as bigint)) as n_hapax",
        "max_token_freq",
        "cast(n_types as double) / cast(n_tokens as double) as type_token_ratio",
        "cast(n_hapax as double) / cast(n_types as double) as hapax_frac")
  }

  /** The report-card aggregate over a (token, c) histogram + 1-row doc
    * count — shared by the batch [[corpusStats]] and the accumulated
    * streaming card [[corpusStatsFrom]], so the two can only agree or
    * both be wrong.
    */
  private def statsCard(perTok: DataFrame, nDocs: DataFrame): DataFrame =
    perTok.agg(
      sum(col("c")).as("n_tokens"),
      count(lit(1)).as("n_types"),
      sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"),
      max(col("c")).as("max_token_freq"))
      .crossJoin(broadcast(nDocs))
      .selectExpr("n_docs", "n_tokens", "n_types", "n_hapax", "max_token_freq",
        "cast(n_types as double) / cast(n_tokens as double) as type_token_ratio",
        "cast(n_hapax as double) / cast(n_types as double) as hapax_frac")

  /** Streaming twin of [[corpusStats]] — the before/after card a
    * long-running curation stream logs. The stream itself keeps NO
    * unbounded state: each micro-batch writes its own map-side-combined
    * token histogram and doc count to `outDir/tok|docs/batch_<id>`
    * (partition-overwrite by batch id, so foreachBatch's re-delivered
    * last batch replays idempotently — the [[graft.io.Sinks]] contract),
    * and the card is computed ON DEMAND from the accumulated histograms
    * by [[corpusStatsFrom]]. Per-batch cost is O(batch vocabulary);
    * card cost is one merge-aggregate over per-batch vocabularies —
    * far smaller than the corpus, and a compaction pass
    * ([[graft.io.Maintenance.compactParquet]]) bounds the file count on
    * a stream with many batches.
    */
  def corpusStatsSink(
      documents: DataFrame,
      outDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    documents.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        corpusStatsBatch(batch.toDF(), outDir, batchId)
      }
      .start()

  /** One micro-batch's contribution to the accumulated card — factored
    * out so composite sinks (e.g. [[CurationStream.curateStream]]) can
    * fold the report card into their own foreachBatch alongside their
    * survivor writes, instead of running a second streaming query over
    * the same data.
    */
  def corpusStatsBatch(df: DataFrame, outDir: String, batchId: Long): Unit = {
    val b = df.persist()
    try {
      b.selectExpr(
        "explode(filter(split(text, ' '), x -> x != '')) as token")
        .groupBy(col("token")).agg(count(lit(1)).as("c"))
        .write.mode("overwrite").parquet(s"$outDir/tok/batch_$batchId")
      b.agg(count(lit(1)).as("n"))
        .write.mode("overwrite").parquet(s"$outDir/docs/batch_$batchId")
    } finally b.unpersist()
    ()
  }

  /** The COMMITTED `batch_N` subdirectories of a per-batch store, by the
    * marker discipline shared by every accumulating sink here: directory
    * existence alone is NOT commitment (a crash mid-overwrite on a
    * replay leaves a torn dir that still lists), so a dir counts only
    * with the `_SUCCESS` marker the parquet committer writes last —
    * self-calibrating to dir-existence when NO dir carries a marker
    * (marksuccessfuljobs=false is common object-store tuning, and
    * requiring markers there would silently read an empty store
    * forever; when at least one marker exists, the committer evidently
    * writes them and an unmarked dir IS a torn overwrite).
    */
  private[graft] def committedBatchDirs(
      spark: org.apache.spark.sql.SparkSession, dir: String): Set[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Set.empty
    else {
      val dirs = fs.listStatus(p).toSeq.map(_.getPath)
        .filter(_.getName.startsWith("batch_"))
      val marked = dirs
        .filter(d => fs.exists(new org.apache.hadoop.fs.Path(d, "_SUCCESS")))
      (if (marked.isEmpty) dirs else marked).map(_.getName).toSet
    }
  }

  /** The accumulated report card over everything [[corpusStatsSink]] has
    * seen so far: merge the per-batch token histograms (map-side-combined
    * groupBy-sum — a token counted in k batches folds to one row), sum
    * the per-batch doc counts, and run the SAME [[statsCard]] aggregate
    * as the batch path. Equal to `corpusStats(union of all batches)` by
    * construction.
    */
  def corpusStatsFrom(
      spark: org.apache.spark.sql.SparkSession,
      outDir: String): DataFrame = {
    // read only batches BOTH sides committed: corpusStatsBatch writes
    // tok then docs, so a crash between them leaves a tok/batch_N with
    // no docs twin — counting its tokens without its documents would
    // break the card's invariant (and the batch replays idempotently,
    // healing the gap). Directory existence alone is NOT commitment: a
    // crash mid-OVERWRITE on a replay leaves a torn tok/batch_N whose
    // dir still exists (and still intersects with the docs twin from the
    // earlier successful attempt), so each side also requires the
    // _SUCCESS marker the parquet committer writes last. Before the
    // first complete batch the card of zero batches is the card of zero
    // documents (n_docs = 0, NULL aggregates) — a dashboard polling a
    // just-started stream gets a row, not a path-not-found error (the
    // priorKeys empty-store contract).
    def batches(sub: String): Set[String] =
      committedBatchDirs(spark, s"$outDir/$sub")
    val complete = (batches("tok") intersect batches("docs")).toSeq.sorted
    if (complete.isEmpty)
      statsCard(
        spark.range(0).selectExpr(
          "cast(null as string) as token", "cast(null as bigint) as c"),
        spark.range(1).select(lit(0L).as("n_docs")))
    else
      statsCard(
        spark.read.parquet(complete.map(b => s"$outDir/tok/$b"): _*)
          .groupBy(col("token")).agg(sum(col("c")).as("c")),
        spark.read.parquet(complete.map(b => s"$outDir/docs/$b"): _*)
          .agg(sum(col("n")).as("n_docs")))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score each document by
    * how much its hashed-bigram distribution looks like a TARGET slice of
    * the corpus versus the corpus overall — the importance signal used to
    * resample a raw crawl toward a quality/domain target. Each bigram
    * hashes into `dim` buckets; a bucket's weight is the integer log₂
    * magnitude gap `mag(count_target) − mag(count_all)` (the exact
    * `length(bin(c)) − 1` idiom of [[freqScore]], so the whole score is
    * int64 under the cross-engine hash gate — a float log-likelihood
    * drops in by replacing the magnitude formula); a document's score
    * sums its bigram-OCCURRENCE weights. `mag(0) = mag(1) = 0` by the
    * bin() identity — absent-from-target buckets floor at the most
    * negative observable gap, they do not blow up to −∞.
    *
    * Plan shape — deliberately NOT a window over the bucket key: a
    * window partition is unsplittable, so each 1/`dim` bucket of the
    * full occurrence stream would buffer in one task at corpus scale.
    * Instead the bucket histogram is a map-side-combined aggregate whose
    * output is AT MOST `dim` rows BY CONSTRUCTION — always
    * broadcast-sized — so the join back is an explicit broadcast and the
    * occurrence stream itself never shuffles on the bucket key at all
    * (the only real exchanges carry ≤`dim`-row partials and the per-doc
    * aggregate). Docs with fewer than two tokens surface with NULL score
    * via the final left join; the target membership is any boolean
    * expression over the document row; both distributions come from the
    * same bigram stream. Empty tokens (consecutive/leading/trailing
    * spaces) are filtered before pairing, matching [[classifierScore]]'s
    * tokenizer exactly.
    */
  def dsirWeights(
      documents: DataFrame,
      targetExpr: String = "lang = 'en'",
      dim: Int = 4096): DataFrame = {
    // occurrence stream and histogram via the compiled kernel (only the
    // bigram bucket is needed — the kernel skips the context hash);
    // probe side is ONE compiled pass per document against the dense
    // count arrays, the lmScore discipline: no per-occurrence join, no
    // per-doc rollup exchange. Bit-identical to the explode+join SQL
    // formulation (LmHashSpec pins the signed un-floored gap too).
    val bg = documents
      .withColumn("is_tgt", expr(s"cast(($targetExpr) as boolean)"))
      .select(col("doc_id"), col("is_tgt"),
        explode(graft.functions.LmFunctions.lm_bigram_buckets(col("text"), dim)).as("p"))
      .select(col("doc_id"), col("is_tgt"), col("p.b").as("b"))
    val counts = bg.groupBy(col("b")).agg(
      count(lit(1)).as("c_all"),
      sum(when(col("is_tgt"), 1L).otherwise(0L)).as("c_tgt"))
    val model = counts.agg(
      map_from_entries(collect_list(struct(col("b"), col("c_tgt")))).as("tgt_map"),
      map_from_entries(collect_list(struct(col("b"), col("c_all")))).as("all_map"))
      .selectExpr(
        s"transform(sequence(0, ${dim - 1}), i -> coalesce(element_at(tgt_map, cast(i as bigint)), 0L)) as tgt_arr",
        s"transform(sequence(0, ${dim - 1}), i -> coalesce(element_at(all_map, cast(i as bigint)), 0L)) as all_arr")
    documents.select(col("doc_id"), col("lang"), col("text"))
      .crossJoin(broadcast(model))
      .select(col("doc_id"), col("lang"),
        when(col("doc_id").isNotNull, graft.functions.LmFunctions
          .lm_gap(col("text"), col("tgt_arr"), col("all_arr"), dim)).as("c"))
      .select(col("doc_id"), col("lang"),
        col("c.n_bigrams").as("n_bigrams"), col("c.nll_mag").as("dsir_score"))
  }

  /** The exploded (doc_id, context-bucket, bigram-bucket) occurrence
    * stream both [[lmScore]] and [[lmScoreBatch]] charge against.
    * Buckets come from the compiled [[graft.functions.LmHash]] kernel —
    * one pass per document instead of per-occurrence md5-hex/conv
    * evaluation; bit-identical to the SQL formulation (LmHashSpec).
    */
  private def lmBigrams(documents: DataFrame, dim: Int): DataFrame =
    documents
      .select(col("doc_id"),
        explode(graft.functions.LmFunctions.lm_bigram_buckets(col("text"), dim)).as("p"))
      .select(col("doc_id"), col("p.cb").as("cb"), col("p.b").as("b"))

  /** BOTH marginal bucket histograms of the occurrence stream in ONE
    * pass: each occurrence explodes into a (kind, bucket) row for its
    * context and its bigram, and a single map-side-combined aggregate
    * counts them. Output ≤2·dim rows. */
  private[graft] def lmHistograms(bg: DataFrame): DataFrame =
    bg.select(explode(array(
        struct(lit("cb").as("kind"), col("cb").as("bucket")),
        struct(lit("b").as("kind"), col("b").as("bucket")))).as("kb"))
      .groupBy(col("kb.kind").as("kind"), col("kb.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))

  /** Both count tables folded into ONE single-row frame of two DENSE
    * `bits`-sized count arrays — the [[Dedup.bloomScreenDedupSharded]]
    * idiom: the whole model reaches the probe as one broadcast row, so
    * the histogram pipeline executes ONCE however many lookups consume
    * it. The alternative — two filtered branches of the histogram
    * joined back — re-executes the scan→explode pipeline per branch
    * (the kind filter pushes below the aggregate, defeating exchange
    * reuse; measured 1.4× slower at 100×). Arrays, not maps, on the
    * probe side: Spark's `element_at` on a MapType is a LINEAR scan of
    * the entries (measured 15.2 s at 100× with dim=4096 maps), while an
    * array index is O(1); the dense conversion is one O(dim²) pass on a
    * single row. Absent buckets hold count 0 (mag 0). */
  private def lmModelRow(hist: DataFrame, dim: Int): DataFrame =
    hist.agg(
      map_from_entries(collect_list(
        when(col("kind") === "cb", struct(col("bucket"), col("c"))))).as("cb_map"),
      map_from_entries(collect_list(
        when(col("kind") === "b", struct(col("bucket"), col("c"))))).as("b_map"))
      .selectExpr(
        s"transform(sequence(0, ${dim - 1}), i -> coalesce(element_at(cb_map, cast(i as bigint)), 0L)) as cb_arr",
        s"transform(sequence(0, ${dim - 1}), i -> coalesce(element_at(b_map, cast(i as bigint)), 0L)) as b_arr")

  /** Charge `bg`'s occurrences against the broadcast model row and roll
    * up per document of `documents`. A bucket absent from the model (can
    * only happen when the model came from a DIFFERENT corpus than bg —
    * with self-corpus counts every bucket is present by construction)
    * holds count 0, whose magnitude is 0 — the occurrence charges 0. */
  private def lmCharge(
      documents: DataFrame,
      model: DataFrame,
      dim: Int,
      thresholdTenths: Long): DataFrame =
    // whole-document charge in ONE compiled pass against the broadcast
    // model row — no occurrence explode, no per-doc rollup exchange on
    // the probe side (the old shape shuffled every bigram occurrence
    // through a groupBy(doc_id)). The doc_id-null guard preserves the
    // old left-join semantics exactly: a NULL-keyed doc joined nothing,
    // so it surfaces with NULL stats, not a computed charge.
    documents.select(col("doc_id"), col("lang"), col("text"))
      .crossJoin(broadcast(model))
      .select(col("doc_id"), col("lang"),
        when(col("doc_id").isNotNull, graft.functions.LmFunctions
          .lm_charge(col("text"), col("cb_arr"), col("b_arr"), dim)).as("c"))
      .select(col("doc_id"), col("lang"),
        col("c.n_bigrams").as("n_bigrams"), col("c.nll_mag").as("nll_mag"))
      .withColumn("high_ppl",
        (col("nll_mag") * 10L > col("n_bigrams") * thresholdTenths).cast("int"))

  /** Hashed bigram-LM perplexity scoring — the CCNet/Wenzek et al. 2020
    * filter shape ([[dsirWeights]]' sibling with CONDITIONAL
    * normalization): each bigram occurrence is charged its negative
    * conditional log-probability under a corpus bigram model,
    * −log₂ P(w | ctx) = log₂ c(ctx ·) − log₂ c(ctx w), and a document's
    * `nll_mag` sums those charges — high sum/length ⇒ high perplexity ⇒
    * the improbable-word-sequence signal unigram rarity ([[freqScore]])
    * and target-likeness ([[dsirWeights]]) both miss. Integer log₂
    * magnitudes (`length(bin(c)) - 1`) keep the whole score int64-exact
    * under the cross-engine hash gate; a float KenLM drops in by
    * replacing the magnitude formula. Contexts and bigrams hash into
    * `dim` buckets each (the DSIR hashed-n-gram trick), so the whole
    * model is ≤2·`dim` counts BY CONSTRUCTION — broadcast at any corpus
    * size. Bucket collisions perturb counts (standard for the hashed
    * form); collisions can make a bigram bucket outcount its context
    * bucket, so per-occurrence charges floor at 0 rather than go
    * negative (a probability is never > 1).
    *
    * Plan shape: the occurrence stream never shuffles on bucket keys —
    * the corpus explodes exactly twice (one histogram pass folded into a
    * single broadcast model row of dense count arrays ([[lmModelRow]]),
    * one probe pass), and the only exchanges carry ≤2·`dim`-row count
    * partials and the per-doc rollup. `high_ppl` flags mean charge >
    * `thresholdTenths`/10 bits per bigram (default 4.4 ⇒ perplexity
    * > 2^4.4 ≈ 21) in exact integer arithmetic — cross-multiplied, never
    * divided, so the comparison is int64-exact; the default is set from
    * the measured corpus charge distribution (min 4.0, median 4.4, max
    * 4.8 bits/bigram at sf0.01) so BOTH branches fire non-vacuously.
    * Sub-2-token docs surface with NULLs via the final left join.
    */
  def lmScore(
      documents: DataFrame, dim: Int = 4096, thresholdTenths: Long = 44L): DataFrame =
    lmCharge(documents,
      lmModelRow(lmHistograms(lmBigrams(documents, dim)), dim), dim, thresholdTenths)

  /** STREAMING twin of [[lmScore]] — the incremental-crawl form: each
    * arriving micro-batch is scored under the bigram model of EVERYTHING
    * seen so far INCLUDING itself, i.e. batch N's scores equal
    * `lmScore(union of batches 0..N)` restricted to batch N's documents
    * (the [[Dedup.incrementalFuzzyDedup]]-style parity contract,
    * StreamingSpec-pinned). State is the per-batch bucket histogram
    * store — ≤2·dim rows per batch, kind ∈ {cb, b} — NOT the documents:
    * the model accumulates in O(dim · batches) however large the crawl.
    *
    * Replay contract: scores and histograms land in `batch_N` dirs via
    * idempotent overwrite; the prior-count read takes strictly
    * `batch id < N` committed dirs ([[committedBatchDirs]]' marker
    * discipline), so a re-delivered batch recomputes byte-identical
    * output and heals any torn write.
    */
  def lmScoreSink(
      documents: DataFrame,
      outDir: String,
      checkpointDir: String,
      dim: Int = 4096,
      thresholdTenths: Long = 44L): org.apache.spark.sql.streaming.StreamingQuery =
    documents.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        lmScoreBatch(batch.toDF(), outDir, batchId, dim, thresholdTenths)
      }
      .start()

  /** One micro-batch of [[lmScoreSink]] — factored out for composite
    * sinks. Writes `scores/batch_N` (the batch's scored rows + batch_id)
    * then `hist/batch_N` (the batch's own bucket histogram); a crash
    * between the two replays into a full recompute of both.
    */
  def lmScoreBatch(
      df: DataFrame,
      outDir: String,
      batchId: Long,
      dim: Int = 4096,
      thresholdTenths: Long = 44L): Unit = {
    val spark = df.sparkSession
    val batch = df.persist()
    try {
      val bg = lmBigrams(batch, dim)
      // the two MARGINAL histograms, not the joint (cb, b) table: the
      // joint has up to |distinct bigrams| rows, the marginals ≤2·dim
      val cur = lmHistograms(bg).persist()
      try {
        // strictly-prior committed batches only: the current batch's own
        // contribution comes from `cur`, so a replayed batch_N never
        // double-counts itself even when its hist dir already exists
        // non-numeric batch_* names (operator backups, tool droppings)
        // are ignored, not parsed — a stray hist/batch_3_bak must not
        // wedge every replay of the query with a NumberFormatException
        val prior = committedBatchDirs(spark, s"$outDir/hist")
          .filter { bn =>
            val id = bn.stripPrefix("batch_")
            // Try, not a bare toLong: an all-digit name LONGER than
            // Long.MaxValue's 19 digits would otherwise throw and wedge
            // every replay — the exact failure mode the digit filter
            // exists to prevent for non-numeric names
            id.nonEmpty && id.forall(_.isDigit) &&
              scala.util.Try(id.toLong).toOption.exists(_ < batchId)
          }.toSeq.sorted
        val hists =
          if (prior.isEmpty) cur
          else cur.unionByName(
            spark.read.parquet(prior.map(bn => s"$outDir/hist/$bn"): _*))
        val totals = hists.groupBy(col("kind"), col("bucket"))
          .agg(sum(col("c")).as("c"))
        lmCharge(batch, lmModelRow(totals, dim), dim, thresholdTenths)
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite").parquet(s"$outDir/scores/batch_$batchId")
        cur.write.mode("overwrite").parquet(s"$outDir/hist/batch_$batchId")
      } finally cur.unpersist()
    } finally batch.unpersist()
    ()
  }

  /** Structured-PII patterns for [[piiScrub2]], same portable-regex
    * discipline as [[EmailRe]] (no alternation under a quantifier, no
    * lookaround — Java-backtracking ≡ RE2 leftmost-longest on these).
    * Three card families, applied most-specific-first by [[piiScrub2]]:
    *
    *  - [[CardRe]]: the dominant 16-digit 4×4 grouping with optional
    *    single space/dash separators;
    *  - [[AmexRe]]: the 15-digit 4-6-5 Amex grouping, same separators;
    *  - [[PanRe]]: any bare 13–19-digit run — the full ISO/IEC 7812 PAN
    *    length range for numbers written without separators. The `\b` on
    *    both ends rejects longer runs entirely: a 20-digit run has no
    *    in-run word boundary to restart from, so neither engine matches
    *    any suffix of it (leftmost-first ≡ leftmost-longest here).
    *
    * The grouped patterns cannot cross-fire: `\d{6}` in AmexRe needs six
    * CONSECUTIVE digits, which a 4×4-separated number never supplies,
    * and the fixed-width 4×4 groups cannot backtrack into a 4-6-5
    * grouping — so staged application assigns every candidate to exactly
    * one family.
    */
  val CardRe = "\\b\\d{4}[- ]?\\d{4}[- ]?\\d{4}[- ]?\\d{4}\\b"
  val AmexRe = "\\b\\d{4}[- ]?\\d{6}[- ]?\\d{5}\\b"
  val PanRe = "\\b\\d{13,19}\\b"
  val SsnRe = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  /** Structured-PII scrubbing — credit-card and SSN-shaped redaction with
    * a LUHN validity count, the pass [[piiScrub]]'s pattern family does
    * not cover (composes with it: run both projections in either order).
    *
    * Card coverage is STAGED, most-specific grouping first — 16-digit
    * 4×4 ([[CardRe]]), then 15-digit Amex 4-6-5 ([[AmexRe]]), then any
    * bare 13–19-digit PAN run ([[PanRe]]) — with each stage's matches
    * redacted before the next stage counts, so every candidate is
    * counted by exactly one family (a plain 16-digit run is a card, not
    * a PAN; a plain 15-digit run is an Amex, not a PAN).
    * `n_card_candidates` is the TOTAL card-shaped matches across the
    * three families (`n_amex`/`n_pan` break out the non-16 families);
    * `n_cards_valid` counts the candidates passing the Luhn mod-10
    * check — computed entirely in int64 higher-order expressions
    * (separator strip → per-position doubled-digit sum over
    * `sequence(1, len)` → `% 10 = 0`), so the check is integer-exact and
    * sits under the cross-engine hash gate like `kmeans_assign`.
    * Redaction is CONSERVATIVE: every candidate is replaced with
    * `<CARD>` whether or not Luhn passes (a scrubber must not leak a
    * number because a check digit was mistyped); the valid count is the
    * signal a curation pipeline keys retention decisions on. All card
    * stages run before SSNs so an SSN-shaped infix of a separated card
    * number cannot double-fire. Pure projection: codegen'd regexp + HOF
    * expressions, one text scan, zero exchange — the staging is
    * expression nesting, not extra passes over the data.
    */
  def piiScrub2(documents: DataFrame): DataFrame = {
    // regexes travel through SQL string literals here (selectExpr), whose
    // default escape processing would eat single backslashes
    val cardRe = CardRe.replace("\\", "\\\\")
    val amexRe = AmexRe.replace("\\", "\\\\")
    val panRe = PanRe.replace("\\", "\\\\")
    val ssnRe = SsnRe.replace("\\", "\\\\")
    // Luhn sum of the cleaned digit string `c`: position i counted from
    // the RIGHT (1-based); even positions double, subtracting 9 above 9.
    val digit = s"cast(substring(c, length(c) - i + 1, 1) as bigint)"
    val luhnOk =
      s"""aggregate(sequence(1, length(c)), 0L, (a, i) -> a +
         |  CASE WHEN i % 2 = 0
         |       THEN CASE WHEN 2 * $digit > 9
         |                 THEN 2 * $digit - 9 ELSE 2 * $digit END
         |       ELSE $digit END) % 10 = 0""".stripMargin
    documents
      .selectExpr("doc_id",
        s"regexp_extract_all(text, '$cardRe', 0) as m16",
        s"regexp_replace(text, '$cardRe', '<CARD>') as t1")
      .selectExpr("doc_id", "m16",
        s"regexp_extract_all(t1, '$amexRe', 0) as m15",
        s"regexp_replace(t1, '$amexRe', '<CARD>') as t2")
      .selectExpr("doc_id", "m16", "m15",
        s"regexp_extract_all(t2, '$panRe', 0) as mpan",
        s"regexp_replace(t2, '$panRe', '<CARD>') as t3")
      .selectExpr("doc_id",
        "size(m16) + size(m15) + size(mpan) as n_card_candidates",
        s"""size(filter(
           |  transform(concat(m16, m15, mpan),
           |            s -> regexp_replace(s, '[- ]', '')),
           |  c -> $luhnOk)) as n_cards_valid""".stripMargin,
        "size(m15) as n_amex",
        "size(mpan) as n_pan",
        s"size(regexp_extract_all(t3, '$ssnRe', 0)) as n_ssn",
        s"regexp_replace(t3, '$ssnRe', '<SSN>') as scrubbed")
  }

  /** Quality-classifier filtering — the hashed bag-of-words linear model
    * shape modern corpus curation runs at scan speed (a fasttext-style
    * classifier scoring every document, keep/drop on the sign): each
    * token hashes to one of `dim` feature buckets, each bucket carries a
    * weight, the document score is the weight sum. Pure projection, one
    * text scan, no shuffle; a REAL trained model drops in by replacing
    * the weight formula with a broadcast weight array — the plan shape is
    * identical.
    *
    * Weights here are deterministic pseudo-weights derived from the
    * bucket index (Knuth multiplicative hash into [-1000, 1000]) and the
    * whole score stays in int64 — token hash (md5-prefix), bucket, weight
    * and sum are all integer-exact, so the operator sits under the
    * cross-engine hash gate like `kmeans_assign`. Empty token lists score
    * 0; NULL text scores NULL (and `keep` is NULL, not false — unscorable
    * is not the same as rejected).
    */
  /** The [[classifierScore]] hashed-bag-of-words score as a raw SQL
    * expression over a token-array expression — the reusable form for
    * pipelines that must keep their other columns (a streaming stage
    * can't join back against itself to recover them).
    */
  def classifierScoreSql(toksExpr: String, dim: Int = 1024): String = {
    // the per-token md5 runs in the compiled md5_long64_array loop
    // (bit-identical to the former in-lambda conv(substring(md5)) form,
    // HashExpressions' pinned contract); the interpreted aggregate()
    // fold keeps only the int64 bucket/weight mixing. NULL token array
    // (NULL text) propagates through md5_long64_array to a NULL score,
    // exactly as the former form's aggregate(NULL, ...) did.
    val w = s"((x % $dim) * 2654435761L) % 2001L - 1000L"
    s"aggregate(md5_long64_array($toksExpr), 0L, (a, x) -> a + ($w))"
  }

  def classifierScore(documents: DataFrame, dim: Int = 1024): DataFrame =
    documents
      .selectExpr("doc_id", "filter(split(text, ' '), x -> x != '') as toks")
      .selectExpr("doc_id", "size(toks) as n_tokens",
        s"${classifierScoreSql("toks", dim)} as score_milli")
      .selectExpr("doc_id", "n_tokens", "score_milli",
        "cast(score_milli >= 0 as int) as keep")

  /** Corpus-frequency quality scoring — the rarity signal LM-based
    * filters approximate: every token's corpus occurrence count is
    * reduced to its integer log₂ magnitude (`length(bin(c)) - 1`, exact
    * in any engine — `floor(log2(c))` in doubles flips at power-of-two
    * boundaries), and each document reports the sum and the minimum of
    * its token magnitudes. A low `rarest_mag` flags out-of-vocabulary /
    * gibberish tokens; a low magnitude sum per token marks documents of
    * rare material overall.
    *
    * Plan shape — deliberately NOT a `count() over (partition by token)`
    * window: a window partition cannot be split by AQE, so at corpus
    * scale the stopword token becomes one unsplittable buffered task.
    * Instead: (1) per-(doc, token) tf — near-unique keys, so the partial
    * aggregation is skew-immune by construction; (2) corpus counts
    * derived FROM the tf rows by a second map-side-combined aggregate
    * (partial sums collapse the stopword key inside every task before
    * the exchange); (3) a JOIN back — which AQE turns into a broadcast
    * when the vocabulary fits and skew-splits otherwise, both of which a
    * window forbids. Values are identical: Σ_occurrences mag ≡
    * Σ_(doc,token) tf·mag, and the join carries (doc, token) rows, never
    * the raw occurrence stream.
    */
  def freqScore(documents: DataFrame): DataFrame = {
    // the explicit isnotnull does two jobs: (1) the outer left join
    // infer-pushes it into the tf branch only — with it on BOTH branches
    // the two (doc, token) exchanges canonicalize identically and AQE
    // stage reuse executes the scan→explode→partial-agg pipeline ONCE;
    // (2) it is a SEMANTIC choice the oracle mirrors verbatim: corpus
    // frequencies are defined over identified documents, so a
    // null-doc_id row's tokens count in neither engine
    val tok = documents.where(col("doc_id").isNotNull).selectExpr("doc_id",
      "explode(filter(split(text, ' '), x -> x != '')) as token")
    val tf = tok.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val c = tf.groupBy(col("token")).agg(sum(col("tf")).as("c"))
    val per = tf.join(c, Seq("token"))
      .selectExpr("doc_id", "tf", "length(bin(c)) - 1 as mag")
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"),
        sum(col("tf") * col("mag")).as("logfreq_sum"),
        min(col("mag")).as("rarest_mag"))
    documents.select(col("doc_id")).join(per, Seq("doc_id"), "left")
  }

  /** Most-common-word dominance — the Gopher repetition rule
    * ([[repetitionStats]] and [[gopherQuality]] don't cover: Rae et al.
    * 2021 table A1 drops a document whose single most frequent word
    * covers too much of it). Per doc: token count, distinct-token count,
    * the max within-doc term frequency, `top_tok_frac` = max_tf /
    * n_tokens (exact-int64 IEEE division, hash-gate safe), and the
    * `dominated` flag at Gopher's 7.5 % threshold (strict >, so the
    * boundary value passes in both engines).
    *
    * Deliberately the AGGREGATE form, not a per-row
    * `array_max(transform(array_distinct(toks), …))` projection — that
    * lambda is O(len²) per document, quadratic in the one dimension
    * (document length) the corpus doesn't bound. Here: one exchange
    * keyed by (doc_id, token) — near-unique keys, so partial aggregation
    * is skew-immune by construction (no corpus-wide stopword key
    * exists) — then a per-doc rollup reusing the doc_id clustering. A
    * doc with no tokens surfaces with NULL stats via the final left
    * join.
    */
  def docRepetition(documents: DataFrame): DataFrame = {
    val tf = documents.where(col("doc_id").isNotNull)
      .selectExpr("doc_id",
        "explode(filter(split(text, ' '), x -> x != '')) as token")
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val per = tf.groupBy(col("doc_id")).agg(
      sum(col("tf")).as("n_tokens"),
      count(lit(1)).as("n_types"),
      max(col("tf")).as("max_tf"))
    documents.select(col("doc_id"))
      .join(per, Seq("doc_id"), "left")
      .selectExpr("doc_id", "n_tokens", "n_types", "max_tf",
        "cast(max_tf as double) / cast(n_tokens as double) as top_tok_frac",
        """cast(cast(max_tf as double) / cast(n_tokens as double) > 0.075
          | as int) as dominated""".stripMargin)
  }

  /** Duplicate/top n-gram CHARACTER fractions — the remaining Gopher
    * repetition rules (Rae et al. 2021, table A1) this library's bigram
    * stats ([[repetitionStats]]) and top-token dominance
    * ([[docRepetition]]) don't cover: per document and per n ∈ `ns`,
    *  - `dup_char_frac`: characters covered by all occurrences of
    *    word n-grams that appear more than once, as a fraction of the
    *    document's characters (the datatrove/NeMo formulation —
    *    occurrence-weighted, overlap not collapsed; exact-integer
    *    numerator so the gate is engine-stable);
    *  - `top_char_frac`: the character coverage `count × len(gram)` of
    *    the single most-COVERING n-gram (max coverage rather than max
    *    count: a deterministic scalar with no tie-break, where "most
    *    frequent" would need one).
    * Output is long-form — one row per (doc, n) with at least n tokens;
    * documents shorter than n have no defined n-gram statistic and emit
    * no row (the Gopher rules skip them too).
    *
    * Plan shape: one explode per n over the filtered token array,
    * unioned, then two skew-immune aggregates — (doc, n, gram) keys are
    * near-unique (bounded by document length, the [[docRepetition]]
    * argument), and the per-(doc, n) rollup is map-side combined. The
    * corpus never shuffles on a gram key alone, so a boilerplate gram
    * repeated across millions of documents cannot form a hot partition.
    */
  def ngramRepetition(documents: DataFrame, ns: Seq[Int] = Seq(2, 3, 4)): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1), s"ns must be >= 1, got $ns")
    val base = documents
      .where(col("doc_id").isNotNull)
      .selectExpr("doc_id", "length(text) as total_chars",
        "filter(split(text, ' '), x -> x != '') as toks")
    // the gram STRING is never built and never crosses the wire: explode
    // POSITIONS and hash the n token components as FLAT columns (the
    // repetitionCounts idiom — a concat inside a `transform` lambda is
    // interpreted per element, measured ~3× on the shingle pipelines;
    // flat element_at/xxhash64 stays in whole-stage codegen), and group
    // on the 64-bit hash: the exchange carries 4 longs per distinct
    // (doc, n, gram) instead of the gram bytes. The hash is internal
    // only (the output needs count and length, not the text); a
    // within-(doc, n) collision would merge two grams' counts
    // (~len²·2⁻⁶⁴ per doc) and is never compared against the oracle.
    val grams = ns.map { n =>
      val gh = (0 until n).map(j => s"element_at(toks, i + $j)").mkString(", ")
      val glen = (0 until n).map(j => s"length(element_at(toks, i + $j))")
        .mkString(" + ") + s" + ${n - 1}"
      base
        .select(col("doc_id"), col("total_chars"), col("toks"),
          explode(expr(s"""case when size(toks) >= $n
            | then sequence(1, size(toks) - $n + 1) else array() end""".stripMargin)).as("i"))
        .selectExpr("doc_id", "total_chars", s"$n as n",
          s"xxhash64($gh) as gh", s"cast($glen as int) as glen")
    }.reduce(_ unionAll _)
    grams
      .groupBy(col("doc_id"), col("n"), col("gh"))
      .agg(count(lit(1)).as("cnt"), max(col("glen")).as("glen"),
        max(col("total_chars")).as("total_chars"))
      .groupBy(col("doc_id"), col("n"))
      .agg(
        max(col("cnt") * col("glen")).as("top_chars"),
        sum(when(col("cnt") >= 2, col("cnt") * col("glen"))
          .otherwise(0L)).as("dup_chars"),
        max(col("total_chars")).as("total_chars"))
      .selectExpr("doc_id", "n",
        "cast(top_chars as double) / cast(total_chars as double) as top_char_frac",
        "cast(dup_chars as double) / cast(total_chars as double) as dup_char_frac")
  }

  case class CompressionStats(
      doc_id: Long,
      n_bytes: Option[Long],
      n_deflate: Option[Long],
      deflate_ratio: Option[Double],
      low_entropy: Option[Boolean])

  /** Compression-ratio quality signal — the "gzip filter" of the
    * C4/CCNet/Gopher curation family: text that DEFLATE shrinks too well
    * is repetitive boilerplate or degenerate generation (the same class
    * [[repetitionStats]] and [[docRepetition]] flag lexically, caught
    * here at the byte level where token tricks can't hide it), and text
    * that barely compresses at all is often binary junk mis-ingested as
    * text. Emits raw sizes, the ratio, and the low-entropy flag at
    * `threshold`.
    *
    * Shape: pure `mapPartitions` projection — one `Deflater` per
    * PARTITION, `reset()` per row (allocating the native zlib stream
    * per row is the classic 10× trap), payloads never shuffle, scan
    * speed at any corpus size. Oracle-gated via the sketch-gate idiom
    * (no portable SQL reproduces the zlib byte stream, but the gate
    * query emits the exact-computable `n_bytes` = UTF-8 octet length
    * with null propagation plus invariant booleans the oracle pins to
    * literal `true` — a broken Deflater path flips a hash mismatch);
    * byte-level determinism under repartitioning is additionally pinned
    * in ExtSpec. NULL text yields NULL everything (unscorable ≠
    * rejected, the [[classifierScore]] contract — and null ≠ empty:
    * an empty string has `n_bytes = 0` with a real deflate size).
    */
  def compressionRatio(
      documents: DataFrame,
      threshold: Double = 0.4): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents
      // null doc_id rows are unidentifiable, the docRepetition/freqScore
      // semantic choice — and the primitive-Long encoder below would
      // otherwise fail the whole job on the first one
      .where(col("doc_id").isNotNull)
      .selectExpr("doc_id", "text").as[(Long, String)]
      .mapPartitions { rows =>
        val deflater = new java.util.zip.Deflater(6)
        val buf = new Array[Byte](64 * 1024)
        val out = rows.map { case (id, text) =>
          if (text == null) CompressionStats(id, None, None, None, None)
          else {
            val bytes = text.getBytes("UTF-8")
            deflater.reset()
            deflater.setInput(bytes)
            deflater.finish()
            var n = 0L
            while (!deflater.finished()) n += deflater.deflate(buf)
            val ratio =
              if (bytes.length == 0) None
              else Some(n.toDouble / bytes.length)
            CompressionStats(id, Some(bytes.length.toLong), Some(n), ratio,
              ratio.map(_ < threshold))
          }
        }
        // release the native zlib stream deterministically at partition
        // end (the ++ tail runs after the last row is consumed); an
        // abandoned iterator falls back to GC finalization
        out ++ { deflater.end(); Iterator.empty }
      }
      .toDF()
  }

  def heavyHittersByGroup(
      documents: DataFrame,
      groupCol: String = "lang",
      k: Int = 40,
      capacity: Int = 256): DataFrame = {
    require(capacity + 1 >= k,
      s"capacity+1 (${capacity + 1}) must be >= k ($k) for the superset guarantee")
    val spark = documents.sparkSession
    import spark.implicits._
    val toks = documents.select(col(groupCol).as("grp"),
      explode(split(col("text"), " ")).as("token"))
    val summary = toks
      .as[(String, String)]
      .groupByKey(_._1)
      .agg(new graft.functions.MisraGriesAggregator[(String, String)](capacity, _._2)
        .toColumn.name("s"))
      .toDF("grp2", "s")
      .select(col("grp2"), col("s.candidates").as("cands"), col("s.n_total").as("n_total"))
    // exploded per-group candidates → broadcast hash join on BOTH keys
    // (the array_contains residual cost ~capacity compares per probe;
    // see heavyHitters)
    val cands = summary.select(col("grp2"),
      explode(col("cands")).as("cand_token"), col("n_total"))
    toks
      .join(broadcast(cands),
        col("grp") === col("grp2") && col("token") === col("cand_token"))
      .groupBy(col("grp"), col("token"))
      .agg(count(lit(1)).as("cnt"), first(col("n_total")).as("n_total"))
      .where(col("cnt") * k > col("n_total"))
      .select(col("grp").as(groupCol), col("token"), col("cnt"))
      .orderBy(col(groupCol), col("cnt").desc, col("token"))
  }

  /** Dictionary tagging — per-document occurrence counts of a fixed
    * pattern list via ONE Aho–Corasick pass over the text
    * ([[graft.functions.AcAutomaton]]): the blocklist / PII-keyword /
    * topic-gazetteer screen every ingest pipeline runs. Emits
    * (doc_id, pattern, n_hits) for patterns that hit; counts are ALL
    * occurrences, overlapping included, byte-level (the automaton's
    * pinned contract — equal to counting every start position i with
    * text[i, i+|p|) = p).
    *
    * Scale shape: a pure projection — the automaton is a plan-time
    * constant riding inside the serialized expression, the text is read
    * once per row whatever the dictionary size (the naive form is |P|
    * `contains` rescans; a regex alternation backtracks and cannot
    * count). The posexplode fans out to ≤ |P| rows per doc BEFORE the
    * hit filter; with blocklist-sized dictionaries the surviving rows
    * are match-telemetry-sized.
    */
  /** Deterministic HTML wrapper around each document — the fixture for
    * [[htmlExtract]] (the multimodal `synthesizeMedia` discipline: the
    * container is REAL, the payload derives from the row, so the gate
    * can recompute it byte-for-byte in SQL). Every boilerplate class the
    * extractor must handle is present: head/title (with an entity),
    * style and script blocks (the script BODY contains a bare `>` — tag
    * stripping before block removal would tear it), nav/footer chrome,
    * anchors, and the document text as the lone content paragraph.
    */
  def synthesizeHtml(documents: DataFrame): DataFrame =
    documents.where(col("text").isNotNull).selectExpr(
      "doc_id",
      """'<html><head><title>Doc ' || doc_id || ' &amp; friends</title>'
        | || '<style>body { color: #000; }</style>'
        | || '<script>var d = ' || doc_id || '; if (d > 0) { d = d - 1; }</script>'
        | || '</head><body><nav><a href="/">home</a> | <a href="/about">about</a></nav>'
        | || '<h1>Doc ' || doc_id || '</h1><p>' || text
        | || '</p><a href="/doc/' || doc_id || '">permalink</a>'
        | || '<footer>&copy; corpus</footer></body></html>' as html""".stripMargin)

  /** HTML boilerplate removal — the body-text extraction step in front
    * of every web-corpus pipeline (the concern trafilatura/jusText
    * exist for, reduced to a deterministic, cross-engine-exact core):
    * script/style blocks go first (their bodies may contain bare `<`/`>`
    * — stripping tags first would tear them), then tags, then a FIXED
    * entity-decode set (&amp; &copy; &nbsp;), then whitespace collapse.
    * Also emits the title (entity-decoded) and the anchor count — the
    * link-density numerator boilerplate classifiers use.
    *
    * The regex subset is deliberately RE2∩Java-safe ((?s), non-greedy
    * `.*?`, `[^>]` classes — no backreferences, no lookaround), so the
    * DuckDB oracle runs the IDENTICAL patterns: the gate cross-checks
    * two regex engines byte-for-byte. A pure projection — zero
    * exchanges, scan speed at any corpus size.
    */
  def htmlExtract(pages: DataFrame): DataFrame =
    pages.selectExpr(
      "doc_id",
      "replace(regexp_extract(html, '<title>(.*?)</title>', 1), '&amp;', '&') as title",
      "cast(size(regexp_extract_all(html, '<a ', 0)) as int) as n_links",
      """trim(regexp_replace(
        |  replace(replace(replace(
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(html, '(?s)<script[^>]*>.*?</script>', ' '),
        |        '(?s)<style[^>]*>.*?</style>', ' '),
        |      '<[^>]*>', ' '),
        |    '&amp;', '&'), '&copy;', '(c)'), '&nbsp;', ' '),
        |  '[ \\t\\r\\n]+', ' ')) as clean_text""".stripMargin)
      .withColumn("n_chars_clean", length(col("clean_text")).cast("bigint"))

  /** Streaming twin of [[keywordTag]] — blocklist-hit telemetry as an
    * accumulating store (the [[corpusStatsSink]] mergeable-partials
    * doctrine): each micro-batch reduces to ONE row per dictionary
    * pattern (total hits + docs hit — bounded by the dictionary
    * whatever the batch size) written to a `batch_N` dir with
    * whole-dir overwrite, so foreachBatch redelivery replays
    * idempotently and no raw text is ever retained. [[keywordTagFrom]]
    * folds the committed partials; per-pattern sums are associative,
    * so the store equals `keywordTag(union of all batches)` rolled up,
    * by construction.
    */
  def keywordTagSink(
      documents: DataFrame,
      patterns: Seq[String],
      outDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    documents.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        keywordTagBatch(batch.toDF(), patterns, outDir, batchId)
      }
      .start()

  /** One micro-batch's per-pattern partial — factored out for composite
    * sinks and for replay tests to drive directly. */
  def keywordTagBatch(
      df: DataFrame, patterns: Seq[String], outDir: String, batchId: Long): Unit = {
    keywordTag(df, patterns)
      .groupBy(col("pattern"))
      .agg(sum(col("n_hits")).as("hits"), count(lit(1)).as("n_docs"))
      .write.mode("overwrite").parquet(s"$outDir/hits/batch_$batchId")
    ()
  }

  /** The accumulated per-pattern hit telemetry over everything
    * [[keywordTagSink]] has committed — one fold over ≤ |dictionary|
    * rows per batch. Zero committed batches yield the empty report (the
    * empty-store contract). */
  def keywordTagFrom(
      spark: org.apache.spark.sql.SparkSession, outDir: String): DataFrame = {
    val committed = committedBatchDirs(spark, s"$outDir/hits")
    if (committed.isEmpty) {
      import spark.implicits._
      Seq.empty[(String, Long, Long)].toDF("pattern", "hits", "n_docs")
    } else {
      spark.read
        .parquet(committed.toSeq.sorted.map(b => s"$outDir/hits/$b"): _*)
        .groupBy(col("pattern"))
        .agg(sum(col("hits")).as("hits"), sum(col("n_docs")).as("n_docs"))
        .orderBy(col("pattern"))
    }
  }

  /** Link graph from markup — the companion consumer of
    * [[synthesizeHtml]] pages: every `<a href="...">` target extracted
    * (the same RE2∩Java-safe regex subset as [[htmlExtract]], so the
    * oracle runs the identical pattern), exploded to (doc_id, href)
    * edges and rolled up to per-target in-degree — the seed both
    * PageRank and crawl frontier prioritization start from. Pure
    * projection + one bounded-key aggregate (the href domain), scan
    * speed at any corpus size.
    */
  def linkGraph(pages: DataFrame): DataFrame =
    pages
      .select(explode(expr(
        """regexp_extract_all(html, '<a href="([^"]*)"', 1)""")).as("href"))
      .groupBy(col("href"))
      .agg(count(lit(1)).as("n_refs"))
      .orderBy(col("n_refs").desc, col("href"))

  /** Dictionary REDACTION — the action half of [[keywordTag]]: every
    * byte covered by any dictionary match is replaced by `*` (the union
    * of all match spans, so overlapping and nested matches merge into
    * one redacted run — exactly the semantics a blocklist scrub needs;
    * leftmost-longest would leave the tail of a nested hit exposed).
    * Emits (doc_id, redacted, n_masked); n_masked is computed from the
    * redacted string itself (`len − len(without '*')`) so the oracle
    * recomputes it with the identical formula. Same single-pass
    * compiled-kernel shape as [[keywordTag]] — a pure projection.
    */
  def keywordRedact(documents: DataFrame, patterns: Seq[String]): DataFrame = {
    import graft.functions.MultiMatchFunctions.multi_match_mask
    documents
      .where(col("text").isNotNull)
      .select(col("doc_id"),
        multi_match_mask(col("text"), patterns).as("redacted"))
      .withColumn("n_masked",
        (length(col("redacted")) -
          length(translate(col("redacted"), "*", ""))).cast("bigint"))
  }

  def keywordTag(documents: DataFrame, patterns: Seq[String]): DataFrame = {
    import graft.functions.MultiMatchFunctions.multi_match_counts
    documents
      .where(col("text").isNotNull)
      .select(col("doc_id"), multi_match_counts(col("text"), patterns).as("_cnts"))
      .select(col("doc_id"), posexplode(col("_cnts")).as(Seq("_p", "n_hits")))
      .where(col("n_hits") > 0)
      .select(col("doc_id"),
        element_at(array(patterns.map(lit): _*), col("_p").cast("int") + 1)
          .as("pattern"),
        col("n_hits"))
  }

  /** Class-distinctive terms — c-TF-IDF (the BERTopic topic-description
    * statistic, Grootendorst 2022): treat each class (language, source,
    * cluster) as ONE concatenated pseudo-document and score its terms by
    * tf_class × idf_global, surfacing what a class says that the corpus
    * at large does not. This is the corpus-exploration report a curation
    * run prints per source/cluster before deciding quotas.
    *
    * Exactness: the [[tfidfTop]] doctrine — rational idf
    * (total_tokens / tf_global, a monotone transform of the usual
    * log(1 + avg/tf)) keeps every score two IEEE ops from exact int64
    * counts, bit-identical cross-engine, and ranking is what top-k
    * consumes anyway. Ties break on the token string.
    *
    * Shape: one explode → (class, token) aggregate (map-side combined;
    * near-unique keys), global term counts re-aggregated from THAT
    * bounded frame (vocabulary-sized, never a second corpus pass),
    * total_tokens a 1-row broadcast, top-k per class over the
    * vocabulary-sized scored frame. Raw token streams shuffle once.
    */
  def ctfidfTerms(documents: DataFrame, classCol: String, k: Int = 5): DataFrame = {
    require(k >= 1 && k <= 100, s"k must be in [1,100], got $k")
    val tfc = documents
      .where(col("text").isNotNull && col(classCol).isNotNull)
      .select(col(classCol).as("cls"), explode(split(col("text"), " ")).as("token"))
      .where(col("token") =!= "")
      .groupBy(col("cls"), col("token"))
      .agg(count(lit(1)).as("tf_class"))
    // global stats from the (class, token) frame — vocabulary-sized input
    val tfg = tfc.where(col("tf_class") > 0) // consume tf_class: keep the
      // aggregate's exchange canonical-equal to the probe side (the
      // tfidfTop stage-reuse idiom) so the corpus explodes only once
      .groupBy(col("token")).agg(sum(col("tf_class")).as("tf_global"))
    val tot = tfg.agg(sum(col("tf_global")).as("total_tokens"))
    tfc.join(tfg, Seq("token"))
      .crossJoin(broadcast(tot))
      .selectExpr("cls", "token", "tf_class", "tf_global",
        "tf_class * (cast(total_tokens as double) / tf_global) as score")
      .selectExpr("cls", "token", "tf_class", "tf_global", "score",
        "row_number() over (partition by cls order by score desc, token) as rk")
      .where(col("rk") <= k)
      .selectExpr("cls", "token", "tf_class", "tf_global", "score",
        "cast(rk as bigint) as rank")
  }

  /** The RAKE stopword delimiters — shared literally with the oracle SQL
    * (function words the corpus actually contains plus the common set, so
    * the candidate segmentation provably fires). */
  val RakeStopwords: Seq[String] =
    Seq("a", "the", "and", "of", "to", "is", "in", "on", "for", "with")

  /** RAKE keyphrase extraction (Rose, Engel, Cramer, Cowley, "Automatic
    * Keyword Extraction from Individual Documents", 2010): candidate
    * phrases are the maximal runs of non-stopword tokens (stopwords and
    * text boundaries delimit), each word is scored deg(w)/freq(w) over
    * the candidate set — deg counts co-occurring phrase length, so words
    * that appear inside LONG multi-word phrases outrank equally-frequent
    * loners — and a phrase scores the sum of its words' scores. The one
    * deviation from the paper, for the hash gate: the word score is kept
    * as the INTEGER (deg·10⁶) div freq, so phrase scores are exact int64
    * sums — order-independent where an IEEE Σ(deg/freq) would depend on
    * reduction order (the double emitted at the end is derived from the
    * integer, not summed). Phrases longer than `maxLen` tokens are
    * dropped (the paper's own cap).
    *
    * Shapes at 100 TB: tokenization and the gaps-and-islands run
    * numbering are one doc-keyed window; word stats and phrase scores
    * are (token)- and (doc, run)-keyed aggregates — everything keys on
    * unbounded-cardinality columns, nothing collects. The final top-k is
    * a TakeOrdered k-row merge, never a global sort.
    */
  def rakeKeywords(
      documents: DataFrame,
      k: Int = 50,
      maxLen: Int = 4): DataFrame = {
    require(k >= 1 && k <= 1000, s"k must be in [1,1000], got $k")
    require(maxLen >= 1 && maxLen <= 8, s"maxLen must be in [1,8], got $maxLen")
    import org.apache.spark.sql.expressions.Window

    val toks = documents
      .where(col("text").isNotNull)
      .select(col("doc_id"),
        posexplode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
          .as(Seq("pos", "tok")))
      .where(!col("tok").isInCollection(RakeStopwords))
    // gaps-and-islands: consecutive positions share (pos − row_number)
    val runs = toks
      .withColumn("grp", col("pos") -
        row_number().over(Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
    val phrases = runs
      .groupBy(col("doc_id"), col("grp"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, tok))), s -> s.tok)")
        .as("words"))
      .where(size(col("words")) <= maxLen)
      .select(col("doc_id"), col("grp"), col("words"), size(col("words")).as("plen"))
    // Word stats are a separate AGGREGATE + join-back, deliberately NOT a
    // `count/sum over (partition by w)` window, even though the window
    // form computes the same corpus-global freq/deg in one tokenization
    // pass and measured ~20% faster at sf0.1 (re-examined and REVERTED
    // this round): a window partition cannot be split by AQE, so at
    // corpus scale the hottest non-stopword word becomes ONE unsplittable
    // buffered task — the exact trap [[freqScore]]'s doctrine names. The
    // aggregate's map-side partials collapse the hot key inside every
    // task before the exchange, and AQE can broadcast or skew-split the
    // join back. The price is that column pruning narrows this branch to
    // (words, plen), so it never canonicalizes equal to the probe side
    // and the tokenize→window→collect pipeline executes twice — the
    // measured cost of skew immunity at this geometry, not an oversight.
    val wordScores = phrases
      .select(explode(col("words")).as("w"), col("plen"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("freq"), sum(col("plen")).cast("long").as("deg"))
      .select(col("w"), expr("(deg * 1000000L) div freq").as("wscore"))
    phrases
      .select(col("doc_id"), col("grp"),
        array_join(col("words"), " ").as("phrase"), explode(col("words")).as("w"))
      .join(wordScores, "w")
      .groupBy(col("doc_id"), col("grp"), col("phrase"))
      .agg(sum(col("wscore")).as("inst_score"))
      // identical phrases score identically (corpus-global word scores),
      // so max == the common value; count = occurrences
      .groupBy(col("phrase"))
      .agg(count(lit(1)).as("n_occ"), max(col("inst_score")).as("score_scaled"))
      .orderBy(col("score_scaled").desc, col("phrase"))
      .limit(k)
      .selectExpr("phrase", "n_occ", "score_scaled",
        "cast(score_scaled as double) / 1000000.0d as score")
  }
}
