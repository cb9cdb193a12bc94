package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Sampling
import graft.ops.Functions

/** Unit tests for the round-2 function-surface and sampling operators. */
class FunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("hashSample is deterministic and invariant under repartitioning") {
    val df = (1L to 2000L).toDF("k")
    val a = Sampling.hashSample(df, "k", 10).as[Long].collect().sorted
    val b = Sampling.hashSample(df.repartition(13), "k", 10).as[Long].collect().sorted
    assert(a.sameElements(b))
    // ~10% with md5 uniformity; generous tolerance for n=2000
    assert(a.length > 120 && a.length < 280)
  }

  test("stratifiedSample keeps exactly k rows per stratum, stable choice") {
    val df = (1L to 300L).map(i => (i, s"s${i % 3}")).toDF("k", "stratum")
    val out = Sampling.stratifiedSample(df, "stratum", "k", 5)
    val counts = out.groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(counts == Map("s0" -> 5L, "s1" -> 5L, "s2" -> 5L))
    val again = Sampling.stratifiedSample(df.repartition(7), "stratum", "k", 5)
    assert(out.select("k").as[Long].collect().sorted
      .sameElements(again.select("k").as[Long].collect().sorted))
  }

  test("stratifiedSample fails fast on a non-integral key (contract, not a runtime cast)") {
    val df = Seq(("a", "s0"), ("b", "s0")).toDF("k", "stratum")
    val e = intercept[IllegalArgumentException] {
      Sampling.stratifiedSample(df, "stratum", "k", 5)
    }
    assert(e.getMessage.contains("integral"))
  }

  test("unpivot triples row count and round-trips values") {
    val df = Seq((1L, 1, 2.0, 10.0, 0.05)).toDF(
      "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")
    val long = df.unpivot(
      Array(col("l_orderkey"), col("l_linenumber")),
      Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
      "metric", "value")
    assert(long.count() === 3)
    val m = long.select("metric", "value").as[(String, Double)].collect().toMap
    assert(m === Map("l_quantity" -> 2.0, "l_extendedprice" -> 10.0, "l_discount" -> 0.05))
  }

  test("mapOps counts per type and total distinct types") {
    val now = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val df = Seq(
      (1L, now, 7L, "purchase", 1.0, "{}"),
      (2L, now, 7L, "purchase", 1.0, "{}"),
      (3L, now, 7L, "view", 1.0, "{}"),
      (4L, now, 8L, "click", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = df.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg(map_from_entries(collect_list(struct(col("event_type"), col("n")))).as("m"))
      .select(col("user_id"),
        coalesce(element_at(col("m"), "purchase"), lit(0L)).as("n_purchase"),
        size(col("m")).as("n_types"))
      .as[(Long, Long, Int)].collect().map { case (k, v, t) => k -> ((v, t)) }.toMap
    assert(out(7L) === ((2L, 2)))
    assert(out(8L) === ((0L, 1)))
  }

  test("bracket join plans as a broadcast HASH join, not nested-loop") {
    val plan = graft.ops.Relational
      .bracketJoin(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("banded range join equals the brute-force nested-loop formulation") {
    val d = "/root/testdata/sf0.001"
    val banded = graft.ops.RangeJoin.countWithinDays(
      Tables.orders(spark, d), col("o_orderkey"), col("o_orderdate"),
      Tables.lineitem(spark, d), col("l_shipdate"), 7)
      .as[(Long, Long)].collect().toMap
    val brute = Tables.orders(spark, d).select(col("o_orderkey"), col("o_orderdate"))
      .join(Tables.lineitem(spark, d).select(col("l_shipdate")),
        col("l_shipdate") >= col("o_orderdate") &&
        col("l_shipdate") < col("o_orderdate") + expr("interval 7 days"),
        "left")
      .groupBy(col("o_orderkey"))
      .agg(count(col("l_shipdate")).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(banded === brute)
    // the day-grained fast form agrees on day-grained data (TPC-H dates
    // are midnight-aligned timestamps) — and its plan stays broadcast
    val dailyDf = graft.ops.RangeJoin.countWithinDaysDaily(
      Tables.orders(spark, d), col("o_orderkey"), col("o_orderdate"),
      Tables.lineitem(spark, d), col("l_shipdate"), 7)
    assert(dailyDf.as[(Long, Long)].collect().toMap === brute)
    val plan = dailyDf.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("countWithinDaysDaily: empty probe yields all-zero counts; window edges exact") {
    import spark.implicits._
    val build = Seq((1L, "2024-01-01"), (2L, "2024-01-05"), (3L, "2023-12-30"))
      .toDF("k", "d").select(col("k"), col("d").cast("date").as("d"))
    val probe = Seq("2024-01-01", "2024-01-01", "2024-01-03", "2024-01-07")
      .toDF("t").select(col("t").cast("date").as("t"))
    val got = graft.ops.RangeJoin.countWithinDaysDaily(
      build, col("k"), col("d"), probe, col("t"), 3)
      .as[(Long, Long)].collect().toMap
    // k=1: [01-01, 01-04) -> 3 rows; k=2: [01-05, 01-08) -> 1; k=3:
    // [12-30, 01-02) overlaps the grid extension below min -> 2
    assert(got === Map(1L -> 3L, 2L -> 1L, 3L -> 2L))
    val empty = graft.ops.RangeJoin.countWithinDaysDaily(
      build, col("k"), col("d"), probe.where(lit(false)), col("t"), 3)
      .as[(Long, Long)].collect().toMap
    assert(empty === Map(1L -> 0L, 2L -> 0L, 3L -> 0L))
  }

  test("ivf nprobe=4 results are at least as close as nprobe=1") {
    val d = "/root/testdata/sf0.001"
    val p1 = graft.ext.Similarity.ivfTopK(Tables.embeddings(spark, d))
      .select("cosine_sim").as[Double].collect().min
    val p4 = graft.ext.Similarity.ivfTopKProbe(Tables.embeddings(spark, d))
      .select("cosine_sim").as[Double].collect().min
    assert(p4 >= p1) // wider probe can only improve the k-th neighbor
  }

  test("jaro_winkler: pinned reference values (incl. floored transpositions), nulls, empties") {
    import graft.functions.StringSimilarityFunctions.jaro_winkler
    // every expected value checked against DuckDB's
    // jaro_winkler_similarity (the oracle's implementation)
    val cases = Seq(
      ("martha", "marhta", 0.9611111111111111),   // t=1, prefix 3
      ("DWAYNE", "DUANE", 0.8400000000000001),    // prefix 1
      ("DIXON", "DICKSONX", 0.8133333333333332),  // prefix 2
      ("abcdef", "abzzzz", 0.5555555555555555),   // jaro <= 0.7: no boost
      ("red gear", "large gear", 0.8107142857142856), // odd mismatches FLOOR
      ("aaaaaabc", "aaaaaacb", 0.975),            // prefix capped at 4
      ("ab", "ba", 0.0),                          // window 0: no matches
      ("abc", "abc", 1.0),
      ("a", "a", 1.0),                            // window clamps to >= 0
      ("a", "", 0.0), ("", "", 0.0),              // empty scores 0
      ("café", "cafe", 0.8483333333333334),  // non-ASCII fallback path
      ("naïve", "naive", 0.8577777777777779))
    val out = cases.toDF("a", "b", "want")
      .select(col("want"), jaro_winkler(col("a"), col("b")).as("got"))
      .as[(Double, Double)].collect()
    out.foreach { case (want, got) => assert(got === want) }
    val nulls = Seq((Option("x"), Option.empty[String]),
      (Option.empty[String], Option("y"))).toDF("a", "b")
      .select(jaro_winkler(col("a"), col("b"))).collect()
    assert(nulls.forall(_.isNullAt(0)))
  }

  test("hllOverlapFrom: exact pairwise intersections; zero-overlap pairs surface; I-E bound holds") {
    // A = 1..100, B = 51..150 (overlap 50), C = {500} (disjoint)
    val df = ((1L to 100L).map(("A", _)) ++ (51L to 150L).map(("B", _)) ++
      Seq(("C", 500L), ("C", 500L))) // duplicate membership collapses
      .toDF("seg", "member")
    val out = Functions.hllOverlapFrom(df, "seg", "member")
      .orderBy("etype_a", "etype_b")
      .as[(String, String, Long, Long, Long, Boolean)].collect().toSeq
    assert(out === Seq(
      ("A", "B", 100L, 100L, 50L, true),
      ("A", "C", 100L, 1L, 0L, true),
      ("B", "C", 100L, 1L, 0L, true)))
  }

  test("HLL sketch union: accuracy booleans hold and exact columns are truly exact") {
    val d = "/root/testdata/sf0.001"
    // (o_orderstatus, exact_customers, within_5pct) — the query gates its
    // own sketch accuracy; the test confirms the booleans AND that the
    // "exact" column really is the exact distinct count
    val out = Functions.hllSketches(spark, d)
      .as[(String, Long, Boolean)].collect()
    val exact = Tables.orders(spark, d)
      .select("o_custkey").distinct().count()
    val all = out.find(_._1 == "ALL").get
    assert(all._2 === exact)
    assert(out.forall(_._3), s"sketch accuracy flag false in: ${out.mkString(", ")}")
    // merging per-group sketches must cover every group's keys
    assert(out.filter(_._1 != "ALL").map(_._2).max <= exact)
  }

  test("approx quantiles: rank-error bounds hold and group counts are exact") {
    val d = "/root/testdata/sf0.001"
    // (o_orderstatus, n_rows, median_in_bounds, p90_in_bounds)
    val rows = Functions.approxQuantiles(spark, d)
      .as[(String, Long, Boolean, Boolean)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._3 && r._4), s"bounds flag false in: ${rows.mkString(", ")}")
    assert(rows.map(_._2).sum === Tables.orders(spark, d).count())
  }

  test("sketch error bounds hold at sf0.01 too: HLL distinct, merged sketches, KLL quantiles", SlowTest) {
    val d = "/root/testdata/sf0.01"
    // (l_returnflag, exact_orders, exact_parts, orders_within_5pct, parts_within_5pct)
    val ad = graft.ops.Functions.approxDistinct(spark, d)
      .as[(String, Long, Long, Boolean, Boolean)].collect()
    val adExact = Tables.lineitem(spark, d)
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_orderkey").as("n"))
      .as[(String, Long)].collect().toMap
    ad.foreach { r =>
      assert(r._2 === adExact(r._1), s"exact_orders drifted for ${r._1}")
      assert(r._4 && r._5, s"approx_distinct accuracy flag false for ${r._1}")
    }
    // mergeable HLL sketch union: flags green, exact column exact
    val hll = Functions.hllSketches(spark, d).as[(String, Long, Boolean)].collect()
    val hllExact = Tables.orders(spark, d).select("o_custkey").distinct().count()
    assert(hll.find(_._1 == "ALL").get._2 === hllExact)
    assert(hll.forall(_._3), s"hll accuracy flag false in: ${hll.mkString(", ")}")
    // approx quantiles: rank-error bounds green at this SF too
    val aq = Functions.approxQuantiles(spark, d)
      .as[(String, Long, Boolean, Boolean)].collect()
    assert(aq.forall(r => r._3 && r._4), s"quantile bounds false in: ${aq.mkString(", ")}")
  }

  test("histogram buckets cover 0..9 and sum to row count") {
    val out = Functions.histogramPrices(spark, "/root/testdata/sf0.001")
      .as[(Long, Long)].collect().toMap
    assert(out.keySet.subsetOf((0L to 9L).toSet))
    assert(out.contains(0L) && out.contains(9L)) // min and max rows land in end buckets
    val total = Tables.orders(spark, "/root/testdata/sf0.001").count()
    assert(out.values.sum === total)
  }

  test("graft_bloom_agg / graft_might_contain: the screen-then-verify pattern in plain SQL") {
    Seq(10L, 20L, 30L).toDF("x").createOrReplaceTempView("bloom_ref")
    Seq(10L, 11L, 20L, 999L).toDF("x").createOrReplaceTempView("bloom_batch")
    // members always hit (no false negatives); at 800 bits for 3 items
    // the non-members of this fixture must miss
    val kept = spark.sql(
      """SELECT x FROM bloom_batch
        |WHERE NOT graft_might_contain(
        |  (SELECT graft_bloom_agg(xxhash64(x), 100L, 800L) FROM bloom_ref),
        |  xxhash64(x))""".stripMargin)
      .as[Long].collect().sorted.toSeq
    assert(kept === Seq(11L, 999L))
    // 1-arg default-sized builder resolves too
    val hits = spark.sql(
      """SELECT x FROM bloom_batch
        |WHERE graft_might_contain(
        |  (SELECT graft_bloom_agg(xxhash64(x)) FROM bloom_ref), xxhash64(x))""".stripMargin)
      .as[Long].collect().sorted.toSeq
    assert(hits.contains(10L) && hits.contains(20L))
  }

  test("nfc_normalize expression: decomposed folds, NFC passes through, nulls propagate") {
    import spark.implicits._
    // "e" + U+0301 (2 codepoints) must fold to precomposed U+00E9 (1);
    // plain ASCII takes the allocation-free fast path unchanged; the
    // already-precomposed char is a fixed point
    val out = Seq(
      (1L, "caf" + "e\u0301"),
      (2L, "plain ascii"),
      (3L, "caf\u00e9"),
      (4L, null.asInstanceOf[String])
    ).toDF("id", "s")
      .select($"id", graft.functions.TextFunctions.nfc_normalize($"s").as("n"))
      .as[(Long, Option[String])].collect().toMap
    assert(out(1L) === Some("caf\u00e9"))
    assert(out(2L) === Some("plain ascii"))
    assert(out(3L) === Some("caf\u00e9"))
    assert(out(4L) === None)
  }

  test("textNormalize: control strip, NFC fold, whitespace collapse, trim, honest counters") {
    import spark.implicits._
    val docs = Seq(
      (1L, "  a\tb\r\nc  "), // whitespace zoo -> "a b c"
      (2L, "x\u0001y\u007fz"), // control bytes stripped
      (3L, "de" + "e\u0301" + "p"), // NFC: 4 codepoints -> 3
      (4L, "already clean") // unchanged branch
    ).toDF("doc_id", "text")
    val out = graft.ext.TextOps.textNormalize(docs)
      .as[(Long, String, Long, Long, Int)].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      (1L, "a b c", 10L, 5L, 1),
      (2L, "xyz", 5L, 3L, 1),
      (3L, "de\u00e9p", 5L, 4L, 1),
      (4L, "already clean", 13L, 13L, 0)))
  }

  // brute-force spec the automaton must equal: every start position i
  // with text[i, i+|p|) = p, overlapping included (byte-level)
  private def naiveCounts(text: String, pats: Seq[String]): Seq[Long] = {
    val tb = text.getBytes("UTF-8")
    pats.map { p =>
      val pb = p.getBytes("UTF-8")
      (0 to tb.length - pb.length).count { i =>
        var j = 0
        while (j < pb.length && tb(i + j) == pb(j)) j += 1
        j == pb.length
      }.toLong
    }
  }

  test("AcAutomaton: hand-built edge cases \u2014 overlap, prefix-of-another, fail-link chains") {
    import graft.functions.AcAutomaton
    def run(text: String, pats: Seq[String]): Seq[Long] = {
      val a = new AcAutomaton(pats.map(_.getBytes("UTF-8")).toArray)
      a.countAll(org.apache.spark.unsafe.types.UTF8String.fromString(text))
        .toLongArray().toSeq
    }
    // self-overlapping pattern: "aa" in "aaaa" = 3 (regex non-overlap says 2)
    assert(run("aaaa", Seq("aa")) === Seq(3L))
    // a pattern that is a proper prefix of another: both must fire at the
    // long match's end (output fail-closure)
    assert(run("agg row", Seq("agg", "agg row")) === Seq(1L, 1L))
    // classic fail-link chain: "bab" is found only via the fail
    // transition out of the "ab" spine
    assert(run("ababab", Seq("ab", "bab", "abab")) === Seq(3L, 2L, 2L))
    // multibyte UTF-8: no false hit from a suffix byte of another
    // code point's encoding
    assert(run("caf\u00e9 cafe", Seq("caf\u00e9", "cafe", "af")) === Seq(1L, 1L, 2L))
    // pattern longer than the text
    assert(run("ab", Seq("abc")) === Seq(0L))
  }

  test("multi_match_counts: randomized parity against the brute-force definition") {
    import graft.functions.MultiMatchFunctions.multi_match_counts
    val pats = Seq("ab", "ba", "aab", "bb", "aba a", "a a")
    val rnd = new scala.util.Random(4242)
    val texts = (0 until 200).map { i =>
      (i.toLong, (0 until rnd.nextInt(40)).map(_ =>
        "ab ".charAt(rnd.nextInt(3))).mkString)
    }
    val df = texts.toDF("id", "text")
      .select(col("id"), multi_match_counts(col("text"), pats).as("c"))
    val got = df.as[(Long, Seq[Long])].collect().toMap
    texts.foreach { case (id, t) =>
      assert(got(id) === naiveCounts(t, pats), s"text '$t'")
    }
    // null text -> null counts (nullSafeEval contract)
    val nullRow = Seq((9L, null: String)).toDF("id", "text")
      .select(multi_match_counts(col("text"), pats).as("c")).collect()
    assert(nullRow.head.isNullAt(0))
  }

  test("htmlExtract: block removal precedes tag stripping; fixed entity set; missing title") {
    val pages = Seq(
      // script body contains bare < and > — stripping tags first would
      // tear it and leak "c) { x(); }" into the clean text
      (1L, "<html><head><title>T &amp; U</title>" +
        "<script>if (a<b && b>c) { x(); }</script></head>" +
        "<body><p>keep me</p><a href=\"x\">l</a></body></html>"),
      (2L, "<p>no title &copy; here&nbsp;ok</p>"),
      (3L, "<style>a > b { }</style><p>styled</p>")
    ).toDF("doc_id", "html")
    val out = graft.ext.TextOps.htmlExtract(pages)
      .as[(Long, String, Int, String, Long)].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      (1L, "T & U", 1, "T & U keep me l", 15L),
      (2L, "", 0, "no title (c) here ok", 20L),
      (3L, "", 0, "styled", 6L)))
  }

  test("multi_match_mask: union-of-spans redaction — overlap merges, nesting masks fully") {
    import graft.functions.MultiMatchFunctions.multi_match_mask
    def mask(text: String, pats: Seq[String]): String =
      Seq(Tuple1(text)).toDF("t")
        .select(multi_match_mask(col("t"), pats)).as[String].head()
    // overlapping self-matches merge into one run
    assert(mask("aaaa", Seq("aa")) === "****")
    // nested: "agg" inside "agg row" — the union masks the whole long hit
    // (leftmost-longest would expose nothing here either, but the short
    // pattern alone must also mask inside an unrelated tail)
    assert(mask("agg rows", Seq("agg", "agg row")) === "*******s")
    // fail-link hit masks mid-spine: "bab" sits at offset 2 only
    assert(mask("xababy", Seq("bab")) === "xa***y")
    // two patterns whose hits abut: spans fuse seamlessly
    assert(mask("ababab", Seq("ab", "bab")) === "******")
    // no hits: the input comes back unchanged (same instance semantics)
    assert(mask("clean text", Seq("zz")) === "clean text")
    // redaction keeps byte length
    assert(mask("a a a", Seq("a a")) === "*****")
  }

  test("keywordRedact: n_masked counts masked chars; null text dropped") {
    val docs = Seq(
      (1L, "agg row and a table"),
      (2L, null: String)).toDF("doc_id", "text")
    val out = graft.ext.TextOps.keywordRedact(docs, Seq("agg row", "table"))
      .as[(Long, String, Long)].collect().toSeq
    assert(out === Seq((1L, "******* and a *****", 12L)))
  }

  test("keywordTag: only hit rows survive, pattern labels align with the dictionary") {
    val docs = Seq(
      (1L, "agg row agg"),
      (2L, "nothing here"),
      (3L, null: String)).toDF("doc_id", "text")
    val out = graft.ext.TextOps.keywordTag(docs, Seq("agg", "agg row", "zz"))
      .as[(Long, String, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out === Seq((1L, "agg", 2L), (1L, "agg row", 1L)))
  }
}
