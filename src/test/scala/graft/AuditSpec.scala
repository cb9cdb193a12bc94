package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Classify, WebOps}
import graft.ops.Audit

class AuditSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("mutualInfo: exact independence gives pmi 0 and chi 0 in every cell") {
    // 2×2 uniform: every cell count 3 ⇒ observed = expected everywhere
    val df = (for {
      x <- Seq("a", "b"); y <- Seq("c", "d"); _ <- 1 to 3
    } yield (x, y)).toDF("x", "y")
    val out = Audit.mutualInfo(df, "x", "y")
      .select("x", "y", "n_xy", "expected", "pmi", "chi_comp")
      .as[(String, String, Long, Double, Double, Double)].collect()
    assert(out.length === 4)
    out.foreach { case (_, _, nXy, e, pmi, chi) =>
      assert(nXy === 3L)
      assert(e === 3.0)
      assert(pmi === 0.0)
      assert(chi === 0.0)
    }
  }

  test("mutualInfo: perfectly dependent diagonal pins pmi=ln2 and the chi component") {
    // cells (a,c)=5, (b,d)=5: n=10, marginals 5 ⇒ expected 2.5,
    // pmi = ln(5·10 / 25) = ln 2, chi = (50−25)² / (10·25) = 2.5
    val df = (Seq.fill(5)(("a", "c")) ++ Seq.fill(5)(("b", "d"))).toDF("x", "y")
    val out = Audit.mutualInfo(df, "x", "y")
      .select("x", "y", "n_x", "n_y", "n", "expected", "pmi", "chi_comp")
      .as[(String, String, Long, Long, Long, Double, Double, Double)]
      .collect().sortBy(_._1)
    assert(out.length === 2)
    out.foreach { case (_, _, nX, nY, n, e, pmi, chi) =>
      assert((nX, nY, n) === ((5L, 5L, 10L)))
      assert(e === 2.5)
      assert(pmi === math.rint(math.log(2.0) * 1e6) / 1e6)
      assert(chi === 2.5)
    }
  }

  test("benfordAudit: first digits via floor+prefix; sub-1 values excluded; digit-1 expectation is log10(2)") {
    val df = Seq(1.5, 19.99, 25.0, 999.99, 0.5, 0.999).toDF("v")
    val out = Audit.benfordAudit(df, "v")
      .select("digit", "n", "total", "benford_freq")
      .as[(Int, Long, Long, Double)].collect().sortBy(_._1)
    // 0.5 / 0.999 dropped; digits: 1 (1.5), 1 (19.99), 2 (25.0), 9 (999.99)
    assert(out.map(r => (r._1, r._2)).toSeq === Seq((1, 2L), (2, 1L), (9, 1L)))
    assert(out.forall(_._3 === 4L))
    assert(out.head._4 === math.rint(math.log10(2.0) * 1e6) / 1e6)
  }

  test("bootstrapCi: constant column makes every replicate mean the constant; weights deterministic") {
    val df = (1L to 200L).map(k => (k, 10.0)).toDF("k", "v")
    val a = Audit.bootstrapCi(df, "k", "v", b = 8)
      .as[(Int, Long, Double)].collect()
    assert(a.length === 8)
    assert(a.map(_._1).toSeq === (0 until 8))
    a.foreach { case (_, nEff, mean) =>
      // Poisson(1) over 200 rows: effective size near 200, never 0
      assert(nEff > 100L && nEff < 300L)
      assert(mean === 10.0)
    }
    // determinism: a second run yields bit-identical replicate sizes
    val b = Audit.bootstrapCi(df, "k", "v", b = 8).as[(Int, Long, Double)].collect()
    assert(a.toSeq === b.toSeq)
  }

  test("charEntropy: integer-log2 magnitudes pinned on degenerate and uniform docs; empty doc dropped") {
    val docs = Seq(
      (1L, "aaaa", "en"),   // one symbol: ent_mag = 4·2 − 4·2 = 0 ⇒ low
      (2L, "abcd", "en"),   // uniform 4: ent_mag = 4·2 − 0 = 8 ⇒ 2 bits
      (3L, "", "en")
    ).toDF("doc_id", "text", "lang")
    val out = Classify.charEntropy(docs)
      .select("doc_id", "n", "distinct_chars", "ent_mag", "entropy_q", "low_entropy")
      .as[(Long, Long, Long, Long, Double, Int)].collect()
    assert(out.toSeq === Seq(
      (1L, 4L, 1L, 0L, 0.0, 1),
      (2L, 4L, 4L, 8L, 2.0, 0)))
  }

  test("charEntropy kernel: bit-identical to the SQL explode form on unicode and degenerate texts") {
    val docs = Seq(
      (1L, "aaaa"), (2L, "abcd"), (3L, "héllo wörld"), (4L, "中文中文中"),
      (5L, "a"), (6L, "  spaced   out  "), (7L, "ababab ababab"),
      (8L, "mixé 中 é")  // NFC é vs decomposed e+combining-acute: distinct code points
    ).toDF("doc_id", "text").withColumn("lang", lit("xx"))
    val kernel = graft.ext.Classify.charEntropy(docs)
      .select("doc_id", "n", "distinct_chars", "ent_mag", "entropy_q", "low_entropy")
      .as[(Long, Long, Long, Long, Double, Int)].collect().toSeq
    // the SQL explode form the kernel replaced (the DuckDB oracle's shape)
    val sql = docs
      .where(length(col("text")) > 0)
      .select(col("doc_id"), explode(expr("sequence(1, length(text))")).as("i"), col("text"))
      .select(col("doc_id"), expr("substring(text, i, 1)").as("ch"))
      .groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n"), count(lit(1)).as("distinct_chars"),
        sum(expr("c * (length(bin(c)) - 1)")).as("clog"))
      .selectExpr("doc_id", "n", "distinct_chars",
        "n * (length(bin(n)) - 1) - clog AS ent_mag",
        "round(CAST(n * (length(bin(n)) - 1) - clog AS DOUBLE) / CAST(n AS DOUBLE), 6) AS entropy_q",
        "CAST((n * (length(bin(n)) - 1) - clog) * 2 < n * 3 AS INT) AS low_entropy")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Double, Int)].collect().toSeq
    assert(kernel === sql)
    // empty doc dropped by both
    assert(graft.ext.Classify.charEntropy(
      Seq((9L, "", "xx")).toDF("doc_id", "text", "lang")).count() === 0L)
  }

  test("nbClassify: disjoint vocabularies classify the held-out docs; metrics are perfect") {
    // train ids (% 5 != 0) carry each class's vocabulary; ids 5 and 10
    // are held out, one per class
    val aa = "foo bar baz foo bar"
    val bb = "qux quux corge qux corge"
    val docs = Seq(
      (1L, aa, "aa"), (2L, aa, "aa"), (3L, aa, "aa"), (4L, aa, "aa"),
      (6L, bb, "bb"), (7L, bb, "bb"), (8L, bb, "bb"), (9L, bb, "bb"),
      (5L, "foo bar foo", "aa"), (10L, "qux quux qux", "bb")
    ).toDF("doc_id", "text", "lang")
    val out = Classify.nbClassify(docs)
      .select("doc_id", "lang", "pred", "correct")
      .as[(Long, String, String, Int)].collect().sortBy(_._1)
    assert(out.toSeq === Seq((5L, "aa", "aa", 1), (10L, "bb", "bb", 1)))
    val m = Classify.nbMetrics(docs)
      .select("lang", "n_true", "n_pred", "tp", "prec", "rec", "f1")
      .as[(String, Long, Long, Long, Option[Double], Option[Double], Option[Double])]
      .collect().sortBy(_._1)
    assert(m.toSeq === Seq(
      ("aa", 1L, 1L, 1L, Some(1.0), Some(1.0), Some(1.0)),
      ("bb", 1L, 1L, 1L, Some(1.0), Some(1.0), Some(1.0))))
  }

  test("nbMetrics: a trained class absent from held-out truth and predictions gets NULL ratios, not a crash") {
    // class "cc" trains (ids 1..4 ≡ train) but no held-out doc is cc and
    // its vocabulary never wins elsewhere
    val docs = Seq(
      (1L, "foo bar", "aa"), (2L, "foo baz", "aa"),
      (3L, "zzz yyy", "cc"), (4L, "zzz xxx", "cc"),
      (5L, "foo bar baz", "aa")
    ).toDF("doc_id", "text", "lang")
    val m = Classify.nbMetrics(docs)
      .select("lang", "n_true", "n_pred", "tp", "prec", "rec", "f1")
      .as[(String, Long, Long, Long, Option[Double], Option[Double], Option[Double])]
      .collect().sortBy(_._1).toSeq
    assert(m === Seq(
      ("aa", 1L, 1L, 1L, Some(1.0), Some(1.0), Some(1.0)),
      ("cc", 0L, 0L, 0L, None, None, None)))
  }

  test("changePoint: the exact-rational arg-max picks the step boundary; single-day types absent") {
    val ts = (d: Int, h: Int) => java.sql.Timestamp.valueOf(f"2024-02-${1 + d}%02d $h%02d:00:00")
    // type X: daily counts 1,1,9,9 — the true step is after day 2
    val x = for {
      (cnt, d) <- Seq(1, 1, 9, 9).zipWithIndex
      i <- 0 until cnt
    } yield (ts(d, 1 + i % 20), "X")
    val y = Seq((ts(0, 5), "Y"))  // single observed day: no interior split
    val ev = (x ++ y).zipWithIndex
      .map { case ((t, ty), i) => (i.toLong, t, ty) }
      .toDF("event_id", "ts", "event_type")
    val out = graft.ops.Audit.changePoint(ev, "event_type", "ts")
      .select("etype", "n1", "n2", "s1", "s2", "mean_gap")
      .as[(String, Long, Long, Long, Long, Double)].collect().toSeq
    assert(out === Seq(("X", 2L, 2L, 2L, 18L, -8.0)))
  }

  test("orderAudit: backward steps counted with the worst skew; in-order users read zero") {
    val t = (s: String) => java.sql.Timestamp.valueOf(s"2024-03-01 $s")
    val ev = Seq(
      (1L, t("10:00:00"), 7L), (2L, t("09:59:00"), 7L), (3L, t("10:05:00"), 7L),
      (4L, t("08:00:00"), 8L)
    ).toDF("event_id", "ts", "user_id")
    val out = graft.ops.Audit.orderAudit(ev, "user_id", "ts", "event_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq((7L, 3L, 1L, 60000000L), (8L, 1L, 0L, 0L)))
  }

  test("controlChart: integer breach flags and IEEE limits pinned on a 3-day series") {
    val ts = (d: Int, i: Int) =>
      java.sql.Timestamp.valueOf(f"2024-04-${1 + d}%02d ${1 + i % 22}%02d:${i % 60}%02d:00")
    // daily counts 100, 100, 196: mean 132, UCL = 132 + 3*sqrt(132) ≈ 166.47
    val ev = (for {
      (cnt, d) <- Seq(100, 100, 196).zipWithIndex
      i <- 0 until cnt
    } yield (ts(d, i), "Z")).zipWithIndex
      .map { case ((t, ty), i) => (i.toLong, t, ty) }
      .toDF("event_id", "ts", "event_type")
    val out = graft.ops.Audit.controlChart(ev, "event_type", "ts")
      .select("n", "ucl", "lcl", "breach_hi", "breach_lo")
      .as[(Long, Double, Double, Int, Int)].collect().toSeq
    val m = 396.0 / 3.0
    val ucl = math.rint((m + 3.0 * math.sqrt(m)) * 1e6) / 1e6
    val lcl = math.rint((m - 3.0 * math.sqrt(m)) * 1e6) / 1e6
    assert(out === Seq(
      (100L, ucl, lcl, 0, 0), (100L, ucl, lcl, 0, 0), (196L, ucl, lcl, 1, 0)))
  }

  test("urlCanonical: every rule pinned — case fold, default-port strip, fragment drop, utm strip, passthrough") {
    val urls = Seq(
      (1L, "HTTP://WWW.Ex.COM:80/A/b?utm_source=x&id=3#Frag"),
      (2L, "https://Host.org:8080/p?utm_a=1&utm_b=2"),
      (3L, "not a url"),
      (4L, "http://h/p"),
      (5L, "HTTPS://S.io:443/q?id=1&ref=z")
    ).toDF("doc_id", "url")
    val out = WebOps.urlCanonical(urls, "url", Seq("doc_id"))
      .select("doc_id", "canon_url", "dropped_utm", "had_fragment", "port_stripped", "unparsed")
      .as[(Long, String, Int, Int, Int, Int)].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      // case-folded scheme/host, :80 stripped for http, utm dropped,
      // survivor order preserved, fragment gone; PATH case preserved
      (1L, "http://www.ex.com/A/b?id=3", 1, 1, 1, 0),
      // all params were utm ⇒ the '?' goes too; non-default port kept
      (2L, "https://host.org:8080/p", 2, 0, 0, 0),
      (3L, "not a url", 0, 0, 0, 1),
      (4L, "http://h/p", 0, 0, 0, 0),
      (5L, "https://s.io/q?id=1&ref=z", 0, 0, 1, 0)))
  }

  test("jsonProfile: shape-based type counts over mixed-typed keys") {
    val rows = Seq(
      """{"a": 69, "b": "t3", "c": true, "d": null, "e": [1,2]}""",
      """{"a": 7.5, "b": "69"}"""
    ).toDF("j")
    val out = WebOps.jsonProfile(rows, "j")
      .select("k", "n_present", "n_null", "n_number", "n_bool", "n_nested", "n_string", "n_distinct")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      ("a", 2L, 0L, 2L, 0L, 0L, 0L, 2L),
      // "69" is a STRING that looks numeric: shape-based profiling counts
      // it as a number — the documented portable-subset trade
      ("b", 2L, 0L, 1L, 0L, 0L, 1L, 2L),
      ("c", 1L, 0L, 0L, 1L, 0L, 0L, 1L),
      ("d", 1L, 1L, 0L, 0L, 0L, 0L, 0L),
      ("e", 1L, 0L, 0L, 0L, 1L, 0L, 1L)))
  }

  test("hazardTable: censoring and the descending risk-set cumulative pinned on a hand-built stream") {
    val ts = (d: Int) => java.sql.Timestamp.valueOf(f"2024-01-${1 + d}%02d 00:00:00")
    val ev = Seq(
      (1L, ts(0), 100L), (2L, ts(1), 100L),            // user 100: repeat at day 1
      (3L, ts(0), 200L),                               // user 200: censored at day 3
      (4L, ts(0), 300L), (5L, ts(3), 300L)             // user 300: repeat at day 3 (sets obs_end)
    ).toDF("event_id", "ts", "user_id")
    val out = Audit.hazardTable(ev, "user_id", "ts", "event_id")
      .as[(Int, Long, Long, Long, Double)].collect().toSeq
    assert(out === Seq(
      // day 1: risk set {100,200,300} = 3, one event ⇒ hazard 1/3
      (1, 3L, 1L, 0L, 0.333333),
      // day 3: risk set {200,300}, one event (300), one censoring (200)
      (3, 2L, 1L, 1L, 0.5)))
  }
}
