package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training (Sennrich et al. 2016) — the
  * missing piece between corpus curation and model training: learn the
  * merge table FROM the corpus, at corpus scale.
  *
  * Shape (the one that holds at 100 TB): the corpus is touched ONCE, to
  * build the word-frequency vocabulary (`groupBy(word).sum` — vocab ≪
  * corpus under Zipf, and the exchange is map-side combined). Every
  * Lloyd's-style training round after that runs on the VOCABULARY:
  *   - pair counts: each word contributes its adjacent symbol pairs
  *     weighted by its corpus frequency (all adjacencies, the classic
  *     BPE count — 'a a a' charges (a,a) twice), aggregated map-side;
  *   - best pair: a single-row `orderBy(count desc, pair asc).limit(1)`
  *     (deterministic tie-break), broadcast back as a one-row frame —
  *     the repo's scalar-join idiom, no driver collect;
  *   - merge: a zero-exchange projection rewriting each word's
  *     space-delimited symbol string.
  *
  * Merge semantics — deterministic and engine-portable by construction:
  * a word's symbol sequence is kept as `' sym1 sym2 … '` (space-anchored
  * atoms, so a symbol can never match inside a longer symbol), and a
  * merge of (a, b) applies `replace(s, ' a b ', ' ab ')` SIX times.
  * Literal `replace` is leftmost-nonoverlapping with scan-continue-after-
  * match in both Spark (`UTF8String.replace`) and DuckDB, so each pass
  * halves any same-pair chain and 6 passes reach the zero-occurrence
  * fixpoint for symbol chains up to 2⁶ — words are capped far below
  * that. The fixpoint has the same MERGE COUNT as classic greedy
  * left-to-right BPE; in chains of ≥3 repeats the merged POSITIONS can
  * differ (greedy pairs [1,2][3,4]…, the anchored replace may pair
  * [1,2][4,5] — the consumed trailing anchor skips one atom), which is
  * documented rather than hidden: the operator's semantics are the
  * 6-pass anchored replace, identical in both engines and pinned by the
  * DuckDB hash gate which unrolls the full training loop.
  *
  * ExtSpec additionally pins the raw `replace` chain semantics against
  * string literals so an engine upgrade that changes scan semantics
  * fails loudly, plus merge-table sanity on a hand-built corpus.
  */
object Bpe {

  /** Space-anchored initial segmentation of an ASCII word: 'low' →
    * ' l o w '. One capture-group regex, byte-safe because training is
    * restricted to `^[a-z]+$` tokens.
    */
  private val spacedInit = "concat(' ', regexp_replace(word, '(.)', '$1 '))"

  /** The 6-pass anchored merge rewrite of `col` for pattern columns
    * `ba`/`bb` (the chosen pair), as a SQL expression string.
    */
  private def merged(col: String): String =
    (1 to 6).foldLeft(col) { (acc, _) =>
      s"replace($acc, concat(' ', ba, ' ', bb, ' '), concat(' ', ba, bb, ' '))"
    }

  /** Adjacent-pair struct array of the pre-split symbol array `syms`
    * (overlapping adjacencies, the classic BPE count). The split runs
    * ONCE per row in the projection below — the former form inlined
    * `split(trim(sp), ' ')` inside the transform lambda, and HOF
    * lambdas evaluate INTERPRETED with no common-subexpression
    * elimination, so a w-symbol word re-split its string ~2w times:
    * O(w²) per word per training round (BpeAbProbe: 1.37 → 1.14 s on
    * bpe_segment at sf0.1).
    */
  private val pairsExpr =
    """case when size(syms) >= 2
      | then transform(sequence(1, size(syms) - 1),
      |   i -> struct(element_at(syms, i) as a,
      |               element_at(syms, i + 1) as b))
      | else array() end""".stripMargin

  /** Word-frequency vocabulary with the space-anchored initial
    * segmentation — the single corpus-scale pass.
    */
  def vocab(documents: DataFrame): DataFrame =
    documents
      .select(explode(split(col("text"), " ")).as("word"))
      .where(col("word").rlike("^[a-z]+$"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))
      .withColumn("sp", expr(spacedInit))

  /** One training round: (vocab with `sp`) → (best-pair one-row frame,
    * vocab with the merge applied).
    */
  private def round(v: DataFrame): (DataFrame, DataFrame) = {
    val best = v
      .select(split(trim(col("sp")), " ").as("syms"), col("freq"))
      .select(explode(expr(pairsExpr)).as("p"), col("freq"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("pair_count"))
      .orderBy(col("pair_count").desc, col("a"), col("b"))
      .limit(1)
    val next = v
      .crossJoin(broadcast(best.select(col("a").as("ba"), col("b").as("bb"))))
      .withColumn("sp", expr(merged("sp")))
      .select(col("word"), col("freq"), col("sp"))
    (best, next)
  }

  /** The learned merge table: one row per training round —
    * (iter, left_sym, right_sym, pair_count), iter 1-based.
    */
  def bpeMerges(documents: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 8,
      s"iters must be in [1,8] (lineage grows per round), got $iters")
    val (merges, _) = trainedState(documents, iters)
    merges
  }

  /** The trained segmentation of the vocabulary after `iters` rounds —
    * the encode side's reference output: (word, freq, segmented,
    * n_symbols). Applying the merge table to unseen text is the same
    * 6-pass anchored replace per merge, in merge order.
    */
  def bpeSegment(documents: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 8,
      s"iters must be in [1,8] (lineage grows per round), got $iters")
    val (_, v) = trainedState(documents, iters)
    v.select(
      col("word"), col("freq"),
      trim(col("sp")).as("segmented"),
      expr("cast(size(split(trim(sp), ' ')) as int)").as("n_symbols"))
  }

  /** Corpus encoding under the trained merges — the train-once /
    * encode-forever split (the pqCodebook/pqEncodeWith shape): the
    * trained segmentation is a vocabulary-sized map broadcast to a
    * zero-shuffle join against the token stream, so encoding runs at
    * scan speed over any corpus size. Emits per document the trainable
    * word count and the subword count it compresses to — the token
    * accounting every context-window packer consumes downstream.
    */
  def bpeEncodeDocs(documents: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 8,
      s"iters must be in [1,8] (lineage grows per round), got $iters")
    val (_, v) = trainedState(documents, iters)
    val seg = v.select(col("word"),
      expr("cast(size(split(trim(sp), ' ')) as bigint)").as("n_sym"))
    documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .join(broadcast(seg), Seq("word")) // inner join ≡ the ^[a-z]+$ training filter
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_sym")).as("n_subwords"))
      .orderBy(col("doc_id"))
  }

  /** Tokenizer fertility by language — subwords emitted per trainable
    * word under the trained merges, the tokenizer-QA number that says
    * which languages the vocabulary under-serves (fertility ≫ 1 means
    * the context window fills with fragments). Same broadcast-vocab
    * encode as [[bpeEncodeDocs]], aggregated per `lang` instead of per
    * doc; `fertility` is one IEEE division of exact int64 totals.
    */
  def bpeFertility(documents: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 8,
      s"iters must be in [1,8] (lineage grows per round), got $iters")
    val (_, v) = trainedState(documents, iters)
    val seg = v.select(col("word"),
      expr("cast(size(split(trim(sp), ' ')) as bigint)").as("n_sym"))
    documents
      .select(col("lang"), explode(split(col("text"), " ")).as("word"))
      .join(broadcast(seg), Seq("word"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_sym")).as("n_subwords"))
      .withColumn("fertility",
        col("n_subwords").cast("double") / col("n_words").cast("double"))
  }

  private def trainedState(documents: DataFrame, iters: Int): (DataFrame, DataFrame) = {
    val v0 = vocab(documents)
    val (mergesRev, vFinal) = (1 to iters).foldLeft((List.empty[DataFrame], v0)) {
      case ((acc, v), it) =>
        val (best, next) = round(v)
        val row = best.select(
          lit(it).as("iter"),
          col("a").as("left_sym"), col("b").as("right_sym"),
          col("pair_count"))
        (row :: acc, next)
    }
    (mergesRev.reverse.reduce(_ union _), vFinal)
  }
}
