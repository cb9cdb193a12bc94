package graft

import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audits — the assertions that encode the scale contract:
  * predicates reach the parquet scan, projections prune the read schema,
  * keyed pipelines shuffle exactly once, aggregations keep map-side
  * partials. A plan regression here is a 100 TB incident that no
  * correctness test would catch.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def formatted(name: String): String =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q6: every predicate pushed to the scan, unused columns pruned") {
    val p = formatted("q6_forecast")
    assert(p.contains("GreaterThanOrEqual(l_discount,0.03)"))
    assert(p.contains("LessThanOrEqual(l_discount,0.05)"))
    assert(p.contains("LessThan(l_quantity,24.0)"))
    assert(p.contains("GreaterThanOrEqual(l_shipdate,"))
    // ReadSchema holds only the 4 referenced columns
    assert(p.contains(
      "ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_shipdate:timestamp_ntz>"))
  }

  test("pipeline_full: whole keyed pipeline is ONE shuffle") {
    val p = formatted("pipeline_full")
    assert("Exchange".r.findAllMatchIn(p).toSeq.nonEmpty)
    assert("\\(\\d+\\) Exchange".r.findAllMatchIn(p).size === 1)
  }

  test("q1: single exchange with map-side partial aggregation") {
    val p = formatted("q1_pricing")
    assert("\\(\\d+\\) Exchange".r.findAllMatchIn(p).size === 1)
    assert("HashAggregate".r.findAllMatchIn(p).size >= 2) // partial + final
  }

  test("q1: scan prunes to the referenced lineitem columns only") {
    val p = formatted("q1_pricing")
    assert(!p.contains("l_orderkey")) // key columns not read
    assert(p.contains("LessThanOrEqual(l_shipdate,"))
  }

  test("q5: customer and supplier are nation-restricted BELOW the fact joins") {
    val p = formatted("q5_local_supplier")
    // the ASIA restriction must hit customer via a broadcast semi-join and
    // supplier via a broadcast join BEFORE either meets lineitem/orders —
    // the restriction joins are broadcasts (no shuffle), so exactly the
    // fact-side exchanges remain
    assert(p.contains("LeftSemi"), s"customer not semi-joined to ASIA nations:\n$p")
    val bhj = "BroadcastHashJoin".r.findAllMatchIn(p).size
    assert(bhj >= 2, s"expected broadcast nation restrictions on both dims, got $bhj:\n$p")
    // region/nation never join the fact table directly
    assert(!p.contains("SortMergeJoin [n_nationkey"))
  }

  test("q8: ASIA restriction shrinks customer AND orders below the fact joins") {
    val p = formatted("q8_market_share")
    // customer semi-joins the broadcast ASIA nationkeys, orders semi-joins
    // the surviving custkeys — BOTH sides of the lineitem⋈orders shuffle
    // are ~1/5 pre-filtered before any fact-table work happens
    val semis = "LeftSemi".r.findAllMatchIn(p).size
    assert(semis >= 2, s"expected ASIA semi-join chain (customer + orders), got $semis:\n$p")
    // the nation/region dimension never meets the fact table directly
    assert(!p.contains("SortMergeJoin [n_nationkey"), p)
    // supplier-nation lookup rides a broadcast (it feeds the volume split)
    assert("BroadcastHashJoin".r.findAllMatchIn(p).size >= 2, p)
  }

  test("q7: two-nation restriction reaches both dimension scans below the fact joins") {
    val p = formatted("q7_nation_volume")
    // the 2-of-25-nation predicate is pushed into the nation parquet scans
    // feeding the supplier/customer restriction joins — it must not sit
    // only as the cross-pair disjunction above the fact joins
    assert("In\\(n_name, \\[NATION_1,NATION_2\\]\\)".r.findAllIn(p).size >= 2, p)
    // dimensions ride broadcasts; the fact table never shuffle-joins nation
    assert(!p.contains("SortMergeJoin [n_nationkey"), p)
  }

  test("q17: per-part aggregate only sees Brand#1 parts' lineitem rows") {
    val p = formatted("q17_small_qty")
    // both lineitem subtrees (threshold aggregate + probe side) carry the
    // broadcast Brand#1 semi-join below them — the pre-aggregate must not
    // scan the other ~24/25 of the fact table
    val semis = "LeftSemi".r.findAllMatchIn(p).size
    assert(semis >= 2, s"expected Brand#1 semi-join under both lineitem subtrees, got $semis:\n$p")
    // the brand predicate reaches the part scan
    assert(p.contains("EqualTo(p_brand,Brand#1)"), p)
  }

  test("BandedRangeJoinRule: naive non-equi range join becomes a hash join, result exact") {
    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    val xs = (1L to 500L).map(i => (i, i * 3 % 101))
    val los = (1L to 300L).map(i => (i, i * 7 % 97))
    val joined = xs.toDF("a_id", "x").join(los.toDF("b_id", "lo"),
      col("x") >= col("lo") && col("x") < col("lo") + lit(5L))
    val p = joined.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("NestedLoop"), s"rule did not fire:\n$p")
    assert(p.contains("Expand")) // build side replicated into band, band+1
    val got = joined.select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val expected = (for {
      (ai, x) <- xs; (bi, lo) <- los
      if x >= lo && x < lo + 5
    } yield (ai, bi)).toSet
    assert(got === expected)
  }

  test("BandedRangeJoinRule bands timestamp keys via epoch micros") {
    import org.apache.spark.sql.functions.{col, expr}
    val o = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_orderdate"))
    val l = Tables.lineitem(spark, sf).select(col("l_shipdate"))
    val j = l.join(o, col("l_shipdate") >= col("o_orderdate") &&
      col("l_shipdate") < col("o_orderdate") + expr("interval 7 days"))
    val p = j.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("NestedLoop"), s"timestamp range join not rewritten:\n$p")
    assert(p.contains("Expand"))
    // exact equality against the manual banded composition (RangeJoin)
    val viaRule = j.groupBy(col("o_orderkey")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val manual = graft.ops.RangeJoin.countWithinDays(
        Tables.orders(spark, sf), col("o_orderkey"), col("o_orderdate"),
        Tables.lineitem(spark, sf), col("l_shipdate"), 7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaRule === manual.filter(_._2 > 0)) // inner join drops zero-match orders
  }

  test("BandedRangeJoinRule handles symmetric proximity windows (x in lo±C)") {
    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    val xs = (1L to 400L).map(i => (i, i * 5 % 211))
    val los = (1L to 250L).map(i => (i, i * 11 % 199))
    val joined = xs.toDF("a_id", "x").join(los.toDF("b_id", "lo"),
      col("x") >= col("lo") - lit(4L) && col("x") <= col("lo") + lit(4L))
    val p = joined.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("NestedLoop"), s"symmetric window not rewritten:\n$p")
    val got = joined.select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val expected = (for {
      (ai, x) <- xs; (bi, lo) <- los
      if x >= lo - 4 && x <= lo + 4
    } yield (ai, bi)).toSet
    assert(got === expected)
  }

  test("BandedRangeJoinRule leaves joins WITH an equi term alone") {
    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    val a = (1L to 50L).map(i => (i, i % 7)).toDF("a_id", "k")
    val b = (1L to 50L).map(i => (i, i % 7)).toDF("b_id", "k2")
    val joined = a.join(b,
      col("k") === col("k2") && col("a_id") >= col("b_id") && col("a_id") < col("b_id") + lit(10L))
    val p = joined.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("_graft_pband")) // equi term exists -> no rewrite
  }

  test("q9: red-part restriction broadcasts below the lineitem-orders shuffle") {
    val p = formatted("q9_product_profit")
    // the ~1/8 p_name filter reaches the part scan and rides a broadcast
    // into lineitem BEFORE the only fact-fact join — lineitem-orders must
    // be the sole shuffle join in the plan
    assert(p.contains("StringStartsWith(p_name,red)"), p)
    assert("BroadcastHashJoin".r.findAllMatchIn(p).size >= 2, p)
    assert("SortMergeJoin".r.findAllMatchIn(p).size <= 1, p)
  }

  test("q11: EUROPE restriction semi-joins supplier and lineitem below the aggregate") {
    val p = formatted("q11_important_parts")
    // supplier shrinks to EUROPE nations, lineitem shrinks to those
    // suppliers — both BEFORE the per-part aggregate; the region predicate
    // reaches the region scan
    assert("LeftSemi".r.findAllMatchIn(p).size >= 2, p)
    assert(p.contains("EqualTo(r_name,EUROPE)"), p)
    // the scalar total rides a broadcast into the row side (no shuffle for
    // the 1-row comparison); AQE stitches the shared pv subtree's exchange
    // reuse at runtime, which a pre-execution plan string cannot show
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("contamination: benchmark shingle set broadcasts; corpus never shuffles on shingles") {
    val p = graft.ext.Dedup.contamination(Tables.documents(spark, sf))
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    // the eval-set side is tiny at any corpus scale: it must reach the
    // corpus as a broadcast, and the only Exchanges are the benchmark
    // side's aggregates + the final per-doc aggregate — never a corpus
    // shuffle keyed on shingle_hash
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin [shingle_hash"), p)
  }

  test("doc_chunks: chunking is a pure scan-speed pipeline — zero exchanges") {
    val p = formatted("doc_chunks")
    assert(!p.contains("Exchange"), p)
    assert(p.contains("Generate"), p)
  }

  test("codec queries: decode is scan-speed mapPartitions — zero exchanges, payloads never move") {
    // the whole point of the multimodal shape: a 100 TB media corpus
    // streams bytes through scan→decode→features exactly once per
    // executor. Any Exchange here means payload bytes crossed the wire.
    Seq("media_decode", "audio_decode", "video_frames").foreach { q =>
      val p = formatted(q)
      assert(!p.contains("Exchange"), s"$q shuffles payload bytes:\n$p")
    }
  }

  test("zorder_layout: the z computation is a pure projection — zero exchanges") {
    // min/max bucket widths are collected in a separate 2-row aggregate
    // at construction; the emitted layout-key frame itself must be
    // scan-speed (the clustering shuffle belongs to zOrderWrite, which
    // pays exactly ONE range exchange)
    val p = formatted("zorder_layout")
    assert(!p.contains("Exchange"), p)
  }

  test("text_normalize: pure projection — zero exchanges, codegen'd end to end") {
    val p = formatted("text_normalize")
    assert(!p.contains("Exchange"), p)
    // the compiled NfcNormalize must not knock the projection out of
    // whole-stage codegen (executedPlan's * markers are codegen spans)
    val e = SparkEntry.queries("text_normalize")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(e.contains("*(1) Project"), e)
  }

  test("skew_autosplit: hot keys ride a broadcast join — never a hash exchange") {
    val p = executedFinal("skew_autosplit")
    assert(p.contains("isFinalPlan=true"), p)
    // the hot branch: hot-restricted dim broadcasts into the join
    assert(p.contains("BroadcastHashJoin"), p)
    // the split itself: anti (cold) + semi (hot) against the hot-key list
    assert(p.contains("LeftAnti"), p)
    assert(p.contains("LeftSemi"), p)
  }

  test("PlanLint: flags cartesian/global-window/unlimited-sort/udf; top-k and keyed plans pass") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, expr, row_number, udf}
    import graft.plans.PlanLint
    val df = spark.range(10).toDF("id")
    val bad = df.crossJoin(spark.range(2).toDF("x"))
      .withColumn("rn", row_number().over(Window.orderBy(col("id"))))
      .orderBy(col("x"))
    val m = PlanLint.lint(bad).toMap
    assert(m("cartesian_join") === 1, m)
    assert(m("single_partition_window") === 1, m)
    assert(m("global_sort") === 1, m)
    assert(m("scala_udf") === 0, m)
    // ORDER BY under a LIMIT plans as top-k — not a finding
    assert(PlanLint.lint(df.orderBy(col("id").desc).limit(5)).toMap.apply("global_sort") === 0)
    // keyed join + keyed window: all clear
    val clean = df.alias("a").join(df.alias("b"), expr("a.id = b.id"))
      .withColumn("rn",
        row_number().over(Window.partitionBy(col("a.id")).orderBy(col("b.id"))))
    assert(PlanLint.lint(clean).toMap.values.sum === 0)
    // a Scala UDF black-box is flagged (the lint fixture lives here, not
    // in the library — the engine itself ships zero UDFs)
    val f = udf((x: Long) => x + 1)
    assert(PlanLint.lint(df.select(f(col("id")))).toMap.apply("scala_udf") === 1)
  }

  test("record_linkage: the compiled JaroWinkler scorer stays inside whole-stage codegen") {
    val e = executedFinal("record_linkage")
    // the blocked self-join may exchange on p_brand, but the scoring
    // filter+projection must sit in a codegen span — a UDF would appear
    // as BatchEvalPython/ScalaUDF and break the * marker
    assert(e.contains("isFinalPlan=true"), e)
    assert(e.contains("*("), e)
    assert(e.toLowerCase.contains("jarowinkler"), e)
    assert(!e.contains("ScalaUDF"), e)
  }

  test("keyword_tag: the Aho–Corasick scan stays inside whole-stage codegen") {
    val e = executedFinal("keyword_tag")
    // the dictionary scan is a pure projection: the automaton call must
    // sit inside a codegen span (a UDF would break the * marker), and
    // the only post-scan operators are the posexplode fan-out + filter
    assert(e.contains("*("), e)
    assert(e.toLowerCase.contains("multimatchcounts") ||
      e.toLowerCase.contains("multi_match_counts"), e)
    assert(!e.contains("ScalaUDF") && !e.contains("BatchEvalPython"), e)
  }

  test("cdc_apply: the snapshot streams through a broadcast anti-join — only the changelog exchanges") {
    // the MERGE contract at scale: the changelog is ≪ the snapshot, so
    // the anti-join must be a broadcast (no SortMergeJoin — that would
    // shuffle+sort the whole table to apply a day of changes); the only
    // hash exchanges allowed are the changelog's own aggregates
    val p = executedFinal("cdc_apply")
    assert(p.contains("isFinalPlan=true"), p)
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // the snapshot projection (c_custkey AS cust_id from the full
    // 4-column read) must appear directly under the anti-join, not
    // under any Exchange — grep the snapshot scan's read schema is
    // 4-column while changelog scans read 1-4 filtered columns
    assert(!"Exchange hashpartitioning[^\n]*\n[^\n]*c_mktsegment".r.findFirstIn(p).isDefined, p)
  }

  test("embedding_drift: vectors never shuffle — only O(cells) count rows cross the wire") {
    // both corpora assign against a broadcast centroid row and collapse
    // to per-cell counts map-side; any exchange carrying qvec means the
    // corpus' vectors moved for a 16-row telemetry card
    val p = formatted("embedding_drift")
    assert(!p.contains("Exchange hashpartitioning(vec_id"), p)
    assert(!"Exchange [^\n]*qvec".r.findFirstIn(p).isDefined, p)
  }

  test("tfidf_top: the df join-back reuses the tf exchange — corpus exploded once at runtime") {
    // the df side is a join-back (de-skewed form: a token window partition
    // is one unsplittable task on the stopword key), and the tautological
    // tf > 0 in TextOps keeps both (doc, token) exchanges canonically
    // equal so stage reuse executes the scan→explode→tf pipeline once
    val p = executedFinal("tfidf_top")
    assert(p.contains("isFinalPlan=true"), p)
    // exactly one MATERIALIZED (doc, token) exchange — the df branch reads
    // reused shuffle output (a second one = a full corpus re-explode).
    // LOAD-BEARING INVISIBLE FILTER: the tautological `tf > 0` in
    // TextOps.tfidfTop is what keeps the two exchanges canonically equal
    // (it consumes tf in the df branch so column pruning can't rewrite
    // that aggregate keys-only) — if this assert starts failing after a
    // "simplification", that filter was almost certainly removed
    assert("\\+\\- Exchange hashpartitioning\\(doc_id#\\d+L?, token".r.findAllMatchIn(p).size === 1,
      s"expected ONE materialized (doc_id, token) exchange — was the canonical-equality " +
        s"filter `tf > 0` in TextOps.tfidfTop removed?\n$p")
    assert("ReusedExchange".r.findAllMatchIn(p).size >= 1,
      s"expected the df branch to read a ReusedExchange — was the canonical-equality " +
        s"filter `tf > 0` in TextOps.tfidfTop removed?\n$p")
    // the N scalar reads zero columns (metadata count), never the text
    assert(p.contains("ReadSchema: struct<>"), p)
  }

  test("freq_score: the corpus-count join-back reuses the tf exchange at runtime") {
    // LOAD-BEARING INVISIBLE FILTER: the explicit isnotnull(doc_id) in
    // TextOps.freqScore mirrors the filter the outer left join
    // infer-pushes into the tf branch — with it on BOTH branches the two
    // (doc, token) exchanges canonicalize identically and AQE executes
    // the scan→explode→partial-agg pipeline once. It is also a semantic
    // choice the oracle mirrors (null-doc_id tokens count nowhere).
    val p = executedFinal("freq_score")
    assert(p.contains("isFinalPlan=true"), p)
    assert("\\+\\- Exchange hashpartitioning\\(doc_id#\\d+L?, token".r.findAllMatchIn(p).size === 1,
      s"expected ONE materialized (doc_id, token) exchange — was the explicit " +
        s"`isnotnull(doc_id)` mirror in TextOps.freqScore removed?\n$p")
    assert("ReusedExchange".r.findAllMatchIn(p).size >= 1,
      s"expected the corpus-count branch to read a ReusedExchange — was the explicit " +
        s"`isnotnull(doc_id)` mirror in TextOps.freqScore removed?\n$p")
  }

  test("tfidf_cosine_pairs: the df/norm branches reuse the tf exchange at runtime") {
    // same canonical-equality trick as tfidf_top (`tf > 0` tautology in
    // TextOps.tfidfCosinePairs) — the corpus must explode once even
    // though tf feeds the df count, the weights, and the norms
    val p = executedFinal("tfidf_cosine_pairs")
    assert(p.contains("isFinalPlan=true"), p)
    assert("\\+\\- Exchange hashpartitioning\\(doc_id#\\d+L?, token".r.findAllMatchIn(p).size === 1,
      s"expected ONE materialized (doc_id, token) exchange — was the canonical-equality " +
        s"filter `tf > 0` in TextOps.tfidfCosinePairs removed?\n$p")
    assert("ReusedExchange".r.findAllMatchIn(p).size >= 1,
      s"expected ReusedExchange in the df branch — was the canonical-equality " +
        s"filter `tf > 0` in TextOps.tfidfCosinePairs removed?\n$p")
  }

  test("block_dedup_rewrite: no window over the span hash — keep-first is a skew-immune aggregate") {
    val p = formatted("block_dedup_rewrite")
    // the boilerplate-block cluster is ONE bhash key: a window partition
    // on it is unsplittable, so keep-first must be groupBy + join-back
    // (AQE can split a skewed JOIN key; it cannot split a window)
    assert(!p.contains("Window"), p)
    assert(p.contains("hashpartitioning(bhash"), p)  // dedup decision keyed on 8-byte hashes
    assert(p.contains("hashpartitioning(doc_id"), p) // reconstruction regroup
    // the firsts aggregate keeps map-side partials (the cluster collapses
    // before its exchange), and reconstruction partially collects spans
    assert(p.contains("partial_min"), p)
    assert(p.contains("partial_collect_list"), p)
  }

  test("heavy_hitters: sketch summary broadcasts; the corpus never shuffle-joins") {
    val p = formatted("heavy_hitters")
    // candidate filter = broadcast HASH join against the exploded
    // candidate set (one hash probe per corpus token) — NOT a
    // nested-loop `array_contains` doing ≤ capacity compares per token
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // the re-count aggregate keeps its map-side partial, so the exchange
    // after it carries ≤ capacity keys per partition, not raw tokens
    assert(p.contains("partial_count"), p)
  }

  /** Final (post-AQE) executed plan. Under AQE the static `ReuseExchange`
    * rule defers to the runtime stage cache, so the formatted plan shows N
    * independent signature pipelines even when only one will run — reuse
    * is only observable after execution drives the plan to
    * `isFinalPlan=true`.
    */
  private def executedFinal(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("minhash_pairs: the four band-join sides share ONE signature exchange at runtime") {
    // the DECLARED query serves the IndexCache-materialized frame (a
    // checkpoint scan — no joins to audit); the plan contract under
    // audit is the builder's, so drive it directly
    val df = graft.ext.Dedup.minhashCandidatePairs(Tables.documents(spark, sf))
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("isFinalPlan=true"), p)
    // exactly one MATERIALIZED signature exchange: the corpus is scanned,
    // shingled and min-hashed once; every other side reads reused shuffle
    // output (a second materialized exchange = a full corpus re-hash)
    assert("\\+\\- Exchange hashpartitioning\\(doc_id".r.findAllMatchIn(p).size === 1, p)
    assert("ReusedExchange".r.findAllMatchIn(p).size >= 3, p)
  }

  test("simhash_pairs: the eight band-join sides share ONE signature exchange at runtime") {
    val p = executedFinal("simhash_pairs")
    assert(p.contains("isFinalPlan=true"), p)
    assert("\\+\\- Exchange hashpartitioning\\(doc_id".r.findAllMatchIn(p).size === 1, p)
    assert("ReusedExchange".r.findAllMatchIn(p).size >= 7, p)
  }

  test("ngram_jaccard_capped: both consumers reuse the single shingle-hash exchange") {
    val p = executedFinal("ngram_jaccard_capped")
    assert(p.contains("isFinalPlan=true"), p)
    // the doc-size aggregate and the bucket pair generation both sit above
    // shuffles; the corpus-side doc_id exchange materializes once
    assert("\\+\\- Exchange hashpartitioning\\(doc_id".r.findAllMatchIn(p).size === 1, p)
    assert("ReusedExchange".r.findAllMatchIn(p).size >= 1, p)
  }

  test("freq_itemsets: pairs generate per basket (explode), never a corpus self-join on basket") {
    // the DECLARED query serves the IndexCache-materialized basket model
    // (checkpoint scans — no pair generation to audit); the plan
    // contract under audit is the builder's, so drive it directly
    // (the minhash_pairs precedent)
    val baskets = Tables.lineitem(spark, sf)
      .select(org.apache.spark.sql.functions.col("l_orderkey"),
        org.apache.spark.sql.functions.col("l_partkey"))
      .join(Tables.part(spark, sf)
        .select(org.apache.spark.sql.functions.col("p_partkey"),
          org.apache.spark.sql.functions.col("p_brand")),
        org.apache.spark.sql.functions.col("l_partkey") ===
          org.apache.spark.sql.functions.col("p_partkey"))
    val df = graft.ops.Mining.freqItemsets(baskets, "l_orderkey", "p_brand", 0.02)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("isFinalPlan=true"), p)
    // the pair candidates come from exploding each basket's bounded sorted
    // item array — a Generate over the per-basket aggregate
    assert(p.contains("Generate explode"), p)
    // no JOIN keyed on the raw basket id anywhere — that would be the
    // O(Σ|basket|²) tx⋈tx self-join formulation the oracle uses (fine for
    // DuckDB at sf0.01, fatal on a 100 TB basket table); the b-keyed
    // exchanges that DO exist feed aggregates (collect_set, distinct)
    assert(!"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[b#".r.findFirstIn(p).isDefined, p)
    // the distinct-(b,it) exchange materializes once; the frequent-items
    // prune branch reads reused shuffle output
    assert("ReusedExchange".r.findAllMatchIn(p).size >= 2, p)
  }

  test("lsh_tuning: one signature pipeline feeds candidates, membership and truth — bounded scans", SlowTest) {
    val p = executedFinal("lsh_tuning")
    assert(p.contains("isFinalPlan=true"), p)
    // the nested-config rewrite: ONE exploded band self-join builds the
    // loosest candidate set; tighter configs are membership tests on the
    // min arrays, never their own join pipelines. documents scans stay
    // O(1) in the config count (4 total: signature + truth machinery),
    // and the shared subtrees reuse exchanges at runtime.
    assert("FileScan parquet".r.findAllMatchIn(p).size <= 5, p)
    assert("ReusedExchange".r.findAllMatchIn(p).size >= 10, p)
  }

  test("pagerank_top: iterations reuse the edge exchanges — lineitem scans stay O(1), not O(iters)", SlowTest) {
    val p = executedFinal("pagerank_top")
    assert(p.contains("isFinalPlan=true"), p)
    // the 8-iteration loop references the edge/node subtrees 20+ times;
    // runtime stage reuse must collapse them so the fact table is read a
    // constant number of times (one per distinct pruned schema), never
    // once per iteration
    val scans = "FileScan parquet".r.findAllMatchIn(p).size
    assert(scans <= 3, s"$scans lineitem scans in the final plan:\n$p")
    assert("ReusedExchange".r.findAllMatchIn(p).size >= 8, p)
  }

  test("ssjoin_pairs: candidates come from prefix-token equi-joins — no cartesian, no token-key window") {
    // pin the UNDERLYING operator's plan: the declared query reads the
    // once-per-corpus cached truth (IndexCache.prefixPairs), whose plan
    // is legitimately a local scan of collected rows
    val p = graft.ext.Dedup.prefixFilterPairs(graft.Tables.documents(spark, sf))
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the rank window partitions by doc_id (bounded by a doc's shingle
    // count) — a window over the raw shingle key would be the
    // unsplittable hot-token shape the skew audit banned
    assert(p.contains("windowspecdefinition(doc_id"), p)
    assert(!p.contains("windowspecdefinition(shingle_hash"), p)
  }

  test("sample_fixed_k: plans as TakeOrderedAndProject — per-partition top-k, never a global sort") {
    val p = formatted("sample_fixed_k")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!"Exchange rangepartitioning".r.findFirstIn(p).isDefined, p)
  }

  test("dense_ids: the data-side rank window is partitioned — only the offsets frame may single-partition") {
    val p = formatted("dense_ids")
    // the per-partition rank must window over _pid (parallel), and the
    // lone SinglePartition exchange allowed is the partitions-sized
    // offsets cumsum — a second one means the data path collapsed into
    // the global-window shape this operator exists to avoid
    assert(p.contains("windowspecdefinition(_pid"), p)
    assert("Exchange SinglePartition".r.findAllMatchIn(p).size <= 1, p)
  }

  test("weighted_sample: top-(k+1) is TakeOrdered, never a global sort; tau broadcasts") {
    val p = formatted("weighted_sample")
    // per-partition top-k + k-sized merge — the corpus is never fully
    // sorted or shuffled to find the priority threshold
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
    // the 1-row (tau, n_top) frame comes to the sample, broadcast
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("triangle_count: wedge join and closure are equi-joins — never a cartesian") {
    val p = formatted("triangle_count")
    // degree orientation exists precisely so the wedge enumeration stays
    // a hash equi-join on the low-rank corner; a NestedLoop/Cartesian
    // here means the orientation columns fell out of the join condition
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("NestedLoop"), p)
  }

  test("knn_join: one assignment exchange; the per-vector window adds NO shuffle") {
    val p = executedFinal("knn_join")
    assert(p.contains("isFinalPlan=true"), p)
    // both pair-join sides read the ONE materialized cell exchange
    assert("\\+\\- Exchange hashpartitioning\\(cell".r.findAllMatchIn(p).size === 1, p)
    assert("ReusedExchange".r.findAllMatchIn(p).size >= 1, p)
    // the top-k window is partitioned by (cell, vec_id), which the
    // cell-partitioned join output already satisfies — candidate pairs
    // must be ranked in place, never re-shuffled on vec_id
    assert(!p.contains("Exchange hashpartitioning(vec_id"), p)
  }

  test("semantic_dedup: centroids broadcast; cell pair-join is never a cartesian") {
    val p = formatted("semantic_dedup")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastExchange"), p) // 16-row centroid table
    // the pair search is an equi-join on cell — hash/sort-merge, bounded
    // per-cell, instead of an all-pairs comparison
    assert(p.contains("hashpartitioning(cell"), p)
  }

  test("pii_scrub / classifier_score: pure scan-speed projections — ZERO exchanges") {
    Seq("pii_scrub", "classifier_score").foreach { n =>
      val p = formatted(n)
      // regex scrubbing and classifier scoring must never shuffle: one
      // scan, one projection, nothing else (the HOF weight sum is an
      // expression, not an aggregate node)
      assert(!p.contains("Exchange"), s"$n shuffles:\n$p")
      assert(!p.contains("Sort "), s"$n sorts:\n$p")
    }
  }

  test("kmeans_assign: codebook rounds broadcast; update shuffles only; no vec_id re-shuffle", SlowTest) {
    val p = executedFinal("kmeans_assign")
    assert(p.contains("isFinalPlan=true"), p)
    // every centroid set reaches the corpus as a one-row broadcast — the
    // pair of training rounds plus the final assignment must never plan a
    // CartesianProduct or shuffle the corpus on a join key
    assert(!p.contains("CartesianProduct"), p)
    // the ONLY hash exchanges are the two centroid-update aggregations
    // (iters=2), whose partial (map-side) halves bound them at <=k rows
    // per partition; the when-guard null handling adds no join, so
    // nothing repartitions on vec_id
    assert("Exchange hashpartitioning\\(".r.findAllMatchIn(p).size === 2, p)
    assert(!p.contains("Exchange hashpartitioning(vec_id"), p)
  }

  test("date-partitioned layout: a date filter prunes partitions at plan time", SlowTest) {
    import org.apache.spark.sql.functions.{col, to_date}
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    Tables.events(spark, sf)
      .withColumn("event_date", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("event_date").parquet(dir)
    val q = spark.read.parquet(dir).filter(col("event_date") === "2024-01-05")
    val p = q.queryExecution.explainString(ExplainMode.fromString("formatted"))
    // the date predicate is a PartitionFilter (directory pruning),
    // NOT a row-level PushedFilter — files outside the day are never opened
    assert(p.contains("PartitionFilters: ["))
    assert(p.contains("event_date"))
    assert(!p.contains("PushedFilters: [IsNotNull(event_date)"))
    val days = q.select("event_date").distinct().count()
    assert(days === 1)
  }

  test("bloom_screen_dedup: corpus side never exchanges — bloom agg + broadcast-probe confirm only") {
    // STATIC plan, not post-AQE: the synthetic corpora carry zero
    // cross-boundary exact dups, so at runtime AQE's empty-relation
    // propagation elides the (correct) joins outright — the intended
    // shape is only visible before execution. Verdict semantics on
    // corpora WITH dups are ExtSpec's bloomScreenDedup test.
    val p = formatted("bloom_screen_dedup")
    // the bloom screen is in the plan (scalar-subquery membership filter)
    assert(p.contains("might_contain"), p)
    // the confirm join probes a BROADCAST of the screened batch — the
    // corpus is never the shuffled side of that join
    assert(p.contains("BroadcastHashJoin"), p)
    // nothing may hash-partition on the content hash h, the corpus-wide
    // key: the corpus appears only under the one-row bloom aggregate and
    // the broadcast probe. (The exchanges that do exist are the match
    // sliver's groupBy and the batch-sized final left join, keyed on
    // n_id/doc_id.)
    assert(!"hashpartitioning\\(h#".r.findAllMatchIn(p).hasNext, p)
  }

  test("bloom_screen_dedup_sharded: one subquery, k blobs; corpus still never hash-partitions on h") {
    // STATIC plan (same AQE empty-relation caveat as the unsharded test)
    val p = formatted("bloom_screen_dedup_sharded")
    // per-shard membership probes are in the plan...
    assert("might_contain".r.findAllMatchIn(p).size >= 4, p)
    // ...and every membership branch references the SAME k-blob struct
    // subquery (one canonical plan → ReuseSubquery executes the corpus
    // aggregate once; k distinct subqueries would re-scan k times)
    val subs = SparkEntry.queries("bloom_screen_dedup_sharded")(spark, sf)
      .queryExecution.optimizedPlan.subqueriesAll
    assert(subs.nonEmpty)
    assert(subs.map(_.canonicalized).distinct.size === 1, subs.mkString("\n---\n"))
    // sharding must not cost the zero-corpus-exchange property
    assert(!"hashpartitioning\\(h#".r.findAllMatchIn(p).hasNext, p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("dsir_weights: no window over the bucket key; histogram broadcasts back") {
    val p = formatted("dsir_weights")
    // a `count() over (partition by b)` window partition is unsplittable:
    // each 1/dim bucket of the full occurrence stream would buffer in ONE
    // task at corpus scale. The de-skewed shape has NO Window at all —
    // the ≤dim-row bucket histogram is a map-side-combined aggregate...
    assert(!p.contains("Window"), p)
    // ...folded into ONE dense-array model row that reaches the probe as
    // a broadcast cross join (the lm_score idiom — the compiled LmCharge
    // kernel replaced the per-occurrence broadcast-hash join-back AND the
    // per-doc rollup exchange), so the occurrence stream never
    // hash-partitions on the skewed bucket key: the only b-keyed exchange
    // is the histogram aggregate's own, carrying map-side-combined
    // partials (≤dim rows per task), never raw occurrences
    assert(p.contains("BroadcastNestedLoopJoin Cross"), p)
    assert("hashpartitioning\\(b#".r.findAllMatchIn(p).size === 1, p)
    // probe side is a pure projection: no doc_id-keyed exchange at all
    assert(!p.contains("hashpartitioning(doc_id"), p)
  }

  test("lm_score: one histogram pipeline, model broadcast as one row, no bucket-key shuffle") {
    val p = formatted("lm_score")
    // the bloom-shard idiom: BOTH marginal histograms fold into a single
    // model row of map columns, so the corpus explodes exactly twice at
    // runtime (histogram pass + probe pass) — a filtered-branch join-back
    // would push the kind filter below the aggregate and re-run the
    // pipeline per branch (measured 1.4× slower at 100×)
    assert(!p.contains("Window"), p)
    // the 1-row model reaches the probe as a broadcast cross join
    assert(p.contains("BroadcastNestedLoopJoin Cross"), p)
    // occurrence stream never hash-partitions on a bucket key: the only
    // exchanges are the histogram's ≤2·dim-row partials (kind, bucket)
    // and its 1-row model fold — the compiled LmCharge kernel removed
    // the per-doc rollup exchange entirely
    assert(!p.contains("hashpartitioning(cb#"), p)
    assert(!p.contains("hashpartitioning(b#"), p)
    assert(!p.contains("hashpartitioning(doc_id"), p)
    // detail-section node headers count each scan once: probe pass +
    // histogram pass (the old final-join documents-meta scan is gone —
    // the probe row carries doc_id/lang itself)
    assert("\\(\\d+\\) Scan parquet".r.findAllMatchIn(p).size === 2, p)
  }

  test("pq_codes / pq_topk: vectors never shuffle — codebooks always come to the data", SlowTest) {
    // the PQ contract at corpus scale: training rounds exchange only
    // per-(subspace, code) partials (m·k rows), every assignment is a
    // broadcast of the codebook row against a scan, and the ADC lookup
    // table broadcasts — the embedding stream itself is never
    // hash-partitioned or sort-merge-joined by vec_id
    val pc = formatted("pq_codes")
    assert(!pc.contains("hashpartitioning(vec_id"), s"pq_codes shuffles vectors:\n$pc")
    assert(!pc.contains("SortMergeJoin"), s"pq_codes sort-merge-joins:\n$pc")
    // pq_topk's ONE vec_id exchange is the ADC rollup — map-side-combined
    // (vec_id, qdot) long pairs, never embedding payloads; ivfpq_topk
    // keeps the same contract through the full coarse+residual stack
    Seq("pq_topk", "ivfpq_topk").foreach { q =>
      val pt = formatted(q)
      assert("hashpartitioning\\(vec_id".r.findAllMatchIn(pt).size === 1,
        s"$q:\n$pt")
      assert(!pt.contains("SortMergeJoin"), s"$q sort-merge-joins:\n$pt")
    }
  }

  test("freq_score: no window over the token key — the stopword task shape is gone") {
    val p = formatted("freq_score")
    // corpus counts were `count() over (partition by token)`: the stopword
    // partition is one unsplittable buffered task AQE cannot rescue. The
    // de-skewed form is groupBy + join-back (AQE broadcasts or skew-splits
    // it) — no Window node may reappear anywhere in this plan
    assert(!p.contains("Window"), p)
  }

  test("tfidf_top: df join-back replaces the token window; per-doc top-k window stays") {
    val p = formatted("tfidf_top")
    // the only Window is the per-document row_number (bounded by doc
    // length); the token-partitioned df window must not come back
    assert(!p.contains("windowspecdefinition(token"), p)
    assert(p.contains("windowspecdefinition(doc_id"), p)
  }

  test("sample_stratified: no stratum window; picks broadcast back, corpus never shuffles") {
    val p = formatted("sample_stratified")
    // the dominant stratum (lang='en' at crawl scale) was one
    // unsplittable window partition; the aggregator form's only exchange
    // carries <= k rows per (stratum, input partition), and the join
    // back is a broadcast — the corpus side has NO hash exchange at all
    assert(!p.contains("Window"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert("hashpartitioning\\(lang".r.findFirstIn(p).isEmpty, p)
  }

  test("bucketed q21 via Maintenance.bucketWrite: zero sorts, no fact-key exchange", SlowTest) {
    // the library form of the BENCH_SF1 q21 result: both facts written
    // through bucketWrite (one file per bucket + per-bucket sort), the
    // legacy outputOrdering flag on, and the fact join forced off the
    // broadcast path (threshold 4KB: the facts exceed it, the aggregated
    // blame counts and supplier still broadcast, as at 100× where AQE
    // demotes the fact joins itself)
    val prevOrd = spark.conf.getOption(
      "spark.sql.legacy.bucketedTableScan.outputOrdering").getOrElse("false")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "4096")
    try {
      val li = Tables.lineitem(spark, sf)
      val ord = Tables.orders(spark, sf)
      val sup = Tables.supplier(spark, sf)
      assert(graft.io.Maintenance.bucketWrite(li, "l_orderkey", 8, "q21_li_b") <= 8)
      assert(graft.io.Maintenance.bucketWrite(ord, "o_orderkey", 8, "q21_or_b") <= 8)
      val bucketed = graft.ops.Relational.waitingSupplierFrom(
        spark.table("q21_li_b"), spark.table("q21_or_b"), sup)
      bucketed.count() // executed plan shows AQE's final shape after a run
      val p = bucketed.queryExecution.executedPlan.toString
      // per-bucket sort metadata honored: the fact SMJ reads both sides
      // pre-sorted, so the executed plan carries ZERO Sort nodes (the
      // final top-20 is TakeOrderedAndProject, not a Sort)
      assert("Sort \\[".r.findAllIn(p).isEmpty, p)
      // and neither fact re-partitions on its own orderkey (the
      // countDistinct expand's compound (orderkey, suppkey, gid) exchange
      // is layout-independent and allowed)
      assert("hashpartitioning\\(l_orderkey#\\d+, \\d+\\)".r.findFirstIn(p).isEmpty, p)
      assert("hashpartitioning\\(o_orderkey#\\d+, \\d+\\)".r.findFirstIn(p).isEmpty, p)
      // same answer as the flat layout
      val flat = graft.ops.Relational.waitingSupplierFrom(li, ord, sup)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val b = bucketed.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(b === flat)
    } finally {
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", prevOrd)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.sql("DROP TABLE IF EXISTS q21_li_b")
      spark.sql("DROP TABLE IF EXISTS q21_or_b")
    }
  }

  test("dpp_prune: the partitioned fact scan carries a dynamicpruning subquery; pruned partition count matches the dim", SlowTest) {
    import org.apache.spark.sql.functions._
    // the dppRoundtrip entry runs eagerly (scratch deleted in its
    // finally), so re-stage its inner join here to pin the plan
    val tmp = java.nio.file.Files.createTempDirectory("dpp_plan").toString
    // AQE off for the staged copy only: query-stage wrappers hide the
    // FileSourceScanExec from the plan collect below; DPP itself is
    // independent of AQE
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val o = Tables.orders(spark, sf)
        .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
        .select(col("o_orderkey"), col("o_totalprice"), col("o_month"))
      o.write.mode("overwrite").partitionBy("o_month").parquet(tmp)
      val dim = o.groupBy(col("o_month")).agg(count(lit(1)).as("mcnt"))
        .where(col("mcnt") % 3 === 0).select(col("o_month"))
      val joined = spark.read.parquet(tmp)
        .join(broadcast(dim), Seq("o_month"))
        .groupBy(col("o_month")).agg(count(lit(1)).as("n_rows"))
      val plan = joined.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(plan.toLowerCase.contains("dynamicpruning"),
        s"no dynamicpruning subquery in:\n$plan")
      // and the pruning is REAL: the executed fact scan reads only the
      // dim's surviving partitions
      val survivors = dim.collect().map(_.getString(0)).toSet
      val out = joined.collect().map(_.getString(0)).toSet
      assert(out === survivors)
      val scans = joined.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
            if f.relation.location.rootPaths.exists(_.toString.contains("dpp_plan")) => f
      }
      assert(scans.nonEmpty)
      // selectedPartitions is the STATIC listing; runtime DPP shows up
      // in the scan's "number of partitions read" metric
      val readParts = scans.head.metrics("numPartitions").value
      assert(readParts === survivors.size.toLong,
        s"scan read $readParts partitions, dim selects ${survivors.size}")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("nullSafeLeftJoin: bit-identical to the plain left join; null stratum bypasses the exchange") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val left = Seq((1L, Option(10L)), (2L, Option(20L)), (3L, None),
      (4L, None), (5L, Option(99L))).toDF("id", "k")
      .select(col("id"), col("k").as("key"))
    val right = Seq((10L, "a"), (20L, "b"), (30L, "c")).toDF("key", "v")
    val safe = graft.ops.Skew.nullSafeLeftJoin(left, right, "key")
    val plain = left.join(right, Seq("key"), "left")
    val sortCols = Seq("id")
    assert(safe.orderBy(sortCols.map(col): _*).collect().toSeq ===
      plain.orderBy(sortCols.map(col): _*).collect().toSeq)
    // all-null and no-null edges
    val allNull = left.where(col("key").isNull)
    assert(graft.ops.Skew.nullSafeLeftJoin(allNull, right, "key").count() === 2L)
    val noNull = left.where(col("key").isNotNull)
    assert(graft.ops.Skew.nullSafeLeftJoin(noNull, right, "key")
      .orderBy(col("id")).collect().toSeq ===
      noNull.join(right, Seq("key"), "left").orderBy(col("id")).collect().toSeq)
    // the structural claim: the null stratum reaches the union WITHOUT
    // passing any exchange (its branch plan contains no shuffle)
    val planStr = safe.queryExecution.executedPlan.toString
    assert(planStr.contains("Union"))
  }
}
