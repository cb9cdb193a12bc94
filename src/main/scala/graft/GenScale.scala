package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: derive scaled-up `documents`/`embeddings` tables from an
  * existing SF directory, for measuring the pair/ANN operators' scaling
  * curve (the Σ(bucket²) arguments measured, not argued).
  *
  * Construction — deterministic, content-disjoint replicas:
  *  - documents: replica r > 0 suffixes every token with the replica id,
  *    so each replica reproduces the source corpus's JACCARD structure
  *    exactly (shingle sets are renamed bijectively: set sizes,
  *    intersections and document frequencies are invariant, so every true
  *    near-dup cluster replicates) while never colliding with another
  *    replica. LSH *candidate* sets vary slightly per replica — band
  *    hashes are not renaming-invariant — but stay bounded by the same
  *    Σ(bucket²) shape, so true-pair counts scale exactly linearly and a
  *    super-linear *time* curve can only come from the engine, not from a
  *    quadratic blow-up of the answer itself. (This mirrors how real
  *    corpora grow: vocabulary grows with size, so per-shingle document
  *    frequency — the bucket size the pair joins square over — stays
  *    bounded.)
  *  - embeddings: replica r applies a deterministic per-dimension ±1 sign
  *    mask (a diagonal orthogonal transform): within-replica cosines are
  *    preserved BIT-EXACTLY (|x_i| is unchanged per dimension, so dot
  *    products are). Cross-replica cosines are pseudo-random with
  *    std ≈ 1/√d (≈0.125 at d=64), so a ~7·10⁻⁴ tail sits above a 0.4
  *    near-dup threshold — scaled corpora therefore contain the random
  *    near-threshold cross-replica pairs a REAL larger corpus would, and
  *    only the replica-0 slice's dedup verdicts replicate exactly (the
  *    ExtSpec invariant; smaller replica-0 ids mean later replicas can
  *    never change them). Ids offset by max(id)+1 per replica; ids < 16
  *    exist only in replica 0, so the IVF codebook stays fixed — cell
  *    populations grow 10×, which is exactly the fixed-codebook
  *    Σ|cell|² ≈ n²/k regime semanticDedup documents (a production
  *    deployment scales k with n; the artifact reports both).
  *
  * Usage: tools/run.sh graft.GenScale [srcSfDir] [outBase] [reps,...]
  * writes `<outBase>/x<rep>/{documents,embeddings}.parquet`.
  */
object GenScale {

  /** `rep` content-disjoint replicas of a documents frame (see class doc).
    * `idOffset` must exceed every existing doc_id (max+1, NOT the row
    * count — sparse ids would collide); the suffix separator is \u0001, a
    * byte no space-split token can contain, so replica vocabularies are
    * disjoint STRUCTURALLY (a bare decimal suffix would let replica 1's
    * "foo"+"1" collide with a natural token "foo1").
    */
  def scaleDocuments(docs: DataFrame, rep: Int, idOffset: Long): DataFrame =
    (0 until rep).map { r =>
      if (r == 0) docs.select(col("doc_id"), col("text"), col("lang"), col("source"))
      else docs.select(
        (col("doc_id") + lit(r * idOffset)).as("doc_id"),
        // per-replica vocabulary: token w -> w·SEP·r, preserving the
        // replica's internal shingle/jaccard structure up to a bijective
        // renaming
        expr(s"array_join(transform(split(text, ' '), t -> concat(t, chr(1), '$r')), ' ')").as("text"),
        col("lang"), col("source"))
    }.reduce(_ unionByName _)
      .withColumn("n_chars", length(col("text")).cast("bigint"))

  /** `rep` sign-flipped replicas of an embeddings frame (see class doc).
    * `idOffset` must exceed every existing vec_id (max+1).
    */
  def scaleEmbeddings(emb: DataFrame, rep: Int, idOffset: Long): DataFrame =
    (0 until rep).map { r =>
      if (r == 0) emb.select(col("vec_id"), col("embedding"), col("label"))
      else emb.select(
        (col("vec_id") + lit(r * idOffset)).as("vec_id"),
        // deterministic diagonal ±1 orthogonal transform per replica:
        // murmur3 of (dimension index, replica) picks the sign
        expr(
          s"""transform(embedding, (x, i) ->
             |  case when pmod(hash(i, $r), 2) = 0 then x else -x end)""".stripMargin)
          .cast("array<float>").as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)

  /** `rep` key-offset replicas of the orders fact table: replica r shifts
    * o_orderkey by r·idOffset and keeps every other column — the order's
    * internal structure (status, dates, customer) is invariant, so every
    * order-scoped join/filter result replicates exactly. Dimension keys
    * are NOT remapped: dims stay fixed while facts grow, which is how a
    * real fact table scales over time (per-customer/supplier fanout grows
    * R×, per-orderkey join buckets stay bounded).
    */
  def scaleOrders(orders: DataFrame, rep: Int, idOffset: Long): DataFrame =
    (0 until rep).map { r =>
      if (r == 0) orders
      else orders.withColumn("o_orderkey", col("o_orderkey") + lit(r * idOffset))
    }.reduce(_ unionByName _)

  /** `rep` key-offset replicas of lineitem, sharing [[scaleOrders]]'
    * offset so replica r's lines attach to replica r's orders — orderkey-
    * scoped self-joins (q21's wait-chain, q7/q8/q9's order join) see
    * disjoint replicas and scale linearly by construction; any
    * super-linear TIME curve is therefore the engine's, not the data's.
    */
  def scaleLineitem(lineitem: DataFrame, rep: Int, idOffset: Long): DataFrame =
    (0 until rep).map { r =>
      if (r == 0) lineitem
      else lineitem.withColumn("l_orderkey", col("l_orderkey") + lit(r * idOffset))
    }.reduce(_ unionByName _)

  /** `rep` user-disjoint replicas of the events stream: replica r offsets
    * event_id AND user_id — the audience grows R× while the calendar
    * span stays fixed, which is how real traffic scales (more users per
    * day, not more days). Per-user structure (session gaps, click→
    * purchase bands, type mix) is invariant per replica, so sessionizer /
    * interval-join / per-user aggregates scale linearly by construction.
    */
  def scaleEvents(events: DataFrame, rep: Int, idOffset: Long): DataFrame =
    (0 until rep).map { r =>
      if (r == 0) events
      else events
        .withColumn("event_id", col("event_id") + lit(r * idOffset))
        .withColumn("user_id", col("user_id") + lit(r * idOffset))
    }.reduce(_ unionByName _)

  /** `rep` replicas of the part dimension with per-replica brand AND
    * name vocabularies (suffix ·r, the [[scaleDocuments]] trick):
    * blocking keys grow WITH the corpus, so blocked self-joins
    * (record_linkage) stay linear — the production growth mode where new
    * catalog segments arrive with new data. Keeping brands fixed instead
    * would square the per-block pair count; that regime is documented
    * analytically, not replicated.
    */
  def scalePart(part: DataFrame, rep: Int, idOffset: Long): DataFrame =
    (0 until rep).map { r =>
      if (r == 0) part
      else part
        .withColumn("p_partkey", col("p_partkey") + lit(r * idOffset))
        .withColumn("p_brand", concat(col("p_brand"), lit("" + r.toString)))
        .withColumn("p_name", concat(col("p_name"), lit("" + r.toString)))
    }.reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outBase = if (args.length > 1) args(1) else "/root/repo/testdata_scale"
    val reps = if (args.length > 2) args(2).split(",").map(_.trim.toInt).toSeq else Seq(3, 10)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val orders = spark.read.parquet(s"$src/orders.parquet")
    val lineitem = spark.read.parquet(s"$src/lineitem.parquet")
    // offsets from max(id)+1, not row counts: sparse ids must not collide
    val docOffset = docs.agg(max(col("doc_id"))).head().getLong(0) + 1
    val embOffset = emb.agg(max(col("vec_id"))).head().getLong(0) + 1
    val orderOffset = math.max(
      orders.agg(max(col("o_orderkey"))).head().getLong(0),
      lineitem.agg(max(col("l_orderkey"))).head().getLong(0)) + 1
    val events = spark.read.parquet(s"$src/events.parquet")
    val part = spark.read.parquet(s"$src/part.parquet")
    val eventOffset = math.max(
      events.agg(max(col("event_id"))).head().getLong(0),
      events.agg(max(col("user_id"))).head().getLong(0)) + 1
    val partOffset = part.agg(max(col("p_partkey"))).head().getLong(0) + 1

    reps.foreach { rep =>
      val out = s"$outBase/x$rep"
      scaleDocuments(docs, rep, docOffset)
        .repartition(16)
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
      scaleEmbeddings(emb, rep, embOffset)
        .repartition(16)
        .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
      scaleOrders(orders, rep, orderOffset)
        .repartition(16)
        .write.mode("overwrite").parquet(s"$out/orders.parquet")
      scaleLineitem(lineitem, rep, orderOffset)
        .repartition(16)
        .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
      scaleEvents(events, rep, eventOffset)
        .repartition(16)
        .write.mode("overwrite").parquet(s"$out/events.parquet")
      scalePart(part, rep, partOffset)
        .repartition(4)
        .write.mode("overwrite").parquet(s"$out/part.parquet")
      // dims ride along verbatim so Tables.* resolves against the scaled
      // dir (facts grow, dims don't — the realistic growth mode)
      Seq("region", "nation", "customer", "supplier").foreach { t =>
        spark.read.parquet(s"$src/$t.parquet")
          .write.mode("overwrite").parquet(s"$out/$t.parquet")
      }
      println(s"[genscale] wrote $out: ${docs.count() * rep} docs, ${emb.count() * rep} embeddings, " +
        s"${lineitem.count() * rep} lineitems")
    }
    spark.stop()
  }
}
