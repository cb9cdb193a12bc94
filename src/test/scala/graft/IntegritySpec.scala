package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Dedup, TextOps}
import graft.ops.{Cdc, Integrity, Quality}

/** Round-13 additions: schema-wide FK audit, incremental view
  * maintenance, nDCG, rolling anomaly flags, windowed dedup, c-TF-IDF.
  */
class IntegritySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // ---- fkAudit -------------------------------------------------------

  test("fkAudit: orphans, null FKs, and the erasure dry-run are counted per edge") {
    // parent keys 1,2,7,17; child rows: 3×1, 1×2, 2×7, 1×99 (orphan),
    // 2×null. Erasure mod 10 rem 7 removes parents 7 and 17.
    val child = Seq[java.lang.Long](1L, 1L, 1L, 2L, 7L, 7L, 99L, null, null)
      .toDF("fk_col")
    val parent = Seq(1L, 2L, 7L, 17L).toDF("pk_col")
    val out = Integrity.fkAudit(
      Seq(Integrity.FkEdge("child->parent", child, "fk_col", parent, "pk_col")),
      erasedMod = 10L, erasedRem = 7L)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(out.length === 1)
    val (edge, fkRows, nullFk, distinctFk, orphanRows, orphanKeys, eRows, eKeys) = out.head
    assert(edge === "child->parent")
    assert(fkRows === 7L)       // non-null child rows
    assert(nullFk === 2L)
    assert(distinctFk === 4L)   // 1, 2, 7, 99
    assert(orphanRows === 1L)   // the 99 row
    assert(orphanKeys === 1L)
    assert(eRows === 3L)        // 99 + the two 7-rows
    assert(eKeys === 2L)        // {99, 7}
  }

  test("fkAudit: a clean edge reports zero orphans and unions across edges") {
    val child = Seq(1L, 2L, 2L).toDF("k")
    val parent = Seq(1L, 2L, 3L).toDF("k")
    val out = Integrity.fkAudit(Seq(
      Integrity.FkEdge("e1", child, "k", parent, "k"),
      Integrity.FkEdge("e2", parent, "k", child, "k")))
      .orderBy("edge")
      .select("edge", "orphan_rows").as[(String, Long)].collect()
    assert(out === Array(("e1", 0L), ("e2", 1L))) // parent's 3 has no child
  }

  // ---- fdAudit ---------------------------------------------------------

  test("fdAudit: violations counted per key, composite determinants, nulls reported not judged") {
    val df = Seq(
      (1L, "a", "x"), (1L, "a", "x"),       // key 1: one dependent → fine
      (2L, "a", "x"), (2L, "a", "y"),       // key 2: two → violation
      (3L, "b", null.asInstanceOf[String]), // key 3: null only → 0 distinct
      (3L, "b", "z"))                       // ... plus z → still 1 distinct
      .toDF("k", "k2", "dep")
    val out = graft.ops.Integrity.fdAudit(Seq(
      graft.ops.Integrity.FdCandidate("k -> dep", df, Seq("k"), "dep"),
      graft.ops.Integrity.FdCandidate("(k, k2) -> dep", df, Seq("k", "k2"), "dep")))
      .as[(String, Long, Long, Long, Long, Boolean)].collect().sortBy(_._1)
    // both candidate key sets coincide here (k determines k2): 3 keys,
    // key 2 violates, max distinct 2, key 3 carries a null dependent
    out.foreach { case (_, nKeys, nViol, maxD, nNull, holds) =>
      assert((nKeys, nViol, maxD, nNull, holds) === ((3L, 1L, 2L, 1L, false)))
    }
    // a held FD: the key column determines itself trivially
    val held = graft.ops.Integrity.fdAudit(Seq(
      graft.ops.Integrity.FdCandidate("k -> k2", df, Seq("k"), "k2")))
      .select("holds").as[Boolean].collect()
    assert(held === Array(true))
  }

  // ---- jsonIngest --------------------------------------------------------

  test("jsonIngest: malformed and NULL payloads route to corrupt with id witnesses") {
    val df = Seq(
      (1L, """{"k": 1}"""), (2L, """{"k": 2}"""),
      (3L, """{"k": 3"""),             // truncated → corrupt
      (4L, null.asInstanceOf[String])) // null → corrupt
      .toDF("event_id", "props")
    val out = graft.ext.WebOps.jsonIngest(df, "event_id", "props")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out === Array(
      ("clean", 2L, 2L, 1L, 2L),
      ("corrupt", 2L, 2L, 3L, 4L)))
  }

  // ---- maintainCountView ---------------------------------------------

  test("maintainCountView equals a full recompute over the merged table, at every op mix") {
    val snap = Seq(
      (1L, "g1"), (2L, "g1"), (3L, "g2"), (4L, "g2"), (5L, "g3"))
      .toDF("id", "grp")
    // 1: update g1→g2 (two versions, latest wins); 3: delete;
    // 5: delete then revive into g1; 9: brand-new insert into g2;
    // 4: update that keeps its group
    val chg = Seq(
      (1L, "g9", "U", 10L), (1L, "g2", "U", 11L),
      (3L, "g2", "D", 10L),
      (5L, "g3", "D", 10L), (5L, "g1", "U", 12L),
      (9L, "g2", "I", 1L),
      (4L, "g2", "U", 10L))
      .toDF("id", "grp", "op", "version")
    val maintained = Cdc.maintainCountView(snap, chg, "id", Seq("grp"))
      .as[(String, Long)].collect().sortBy(_._1)
    val recomputed = Cdc.applyChangelog(snap, chg, "id")
      .groupBy("grp").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().sortBy(_._1)
    assert(maintained === recomputed)
    // and the merged table here is: 1→g2, 2→g1, 4→g2, 5→g1, 9→g2
    assert(maintained === Array(("g1", 2L), ("g2", 3L)))
  }

  test("maintainCountView drops groups whose count reaches zero") {
    val snap = Seq((1L, "only")).toDF("id", "grp")
    val chg = Seq((1L, "only", "D", 1L)).toDF("id", "grp", "op", "version")
    assert(Cdc.maintainCountView(snap, chg, "id", Seq("grp")).count() === 0L)
  }

  test("maintainJoinView equals the full join recompute at every op mix, NULL fks included") {
    val snap = Seq((1L, "n1", java.lang.Long.valueOf(10L)),
      (2L, "n2", null: java.lang.Long), (3L, "n3", java.lang.Long.valueOf(10L)))
      .toDF("id", "name", "fk")
    val dim = Seq((10L, "D10"), (20L, "D20")).toDF("fk", "dim_name")
    // update 1's fk, delete 3, insert 4 with a NULL fk, update 2 into a
    // real fk — every delta class crosses the dim join
    val chg = Seq(
      (1L, "n1", java.lang.Long.valueOf(20L), "U", 1L),
      (3L, "n3", java.lang.Long.valueOf(10L), "D", 1L),
      (4L, "n4", null: java.lang.Long, "I", 1L),
      (2L, "n2b", java.lang.Long.valueOf(10L), "U", 2L))
      .toDF("id", "name", "fk", "op", "version")
    val maintained = Cdc.maintainJoinView(
      Cdc.joinView(snap, dim, "fk"), chg, dim, "id", "fk")
      .select("id", "name", "fk", "dim_name")
      .as[(Long, String, Option[Long], Option[String])].collect().sortBy(_._1)
    val recomputed = Cdc.joinView(Cdc.applyChangelog(snap, chg, "id"), dim, "fk")
      .select("id", "name", "fk", "dim_name")
      .as[(Long, String, Option[Long], Option[String])].collect().sortBy(_._1)
    assert(maintained === recomputed)
    assert(maintained === Array(
      (1L, "n1", Some(20L), Some("D20")),
      (2L, "n2b", Some(10L), Some("D10")),
      (4L, "n4", None, None)))
  }

  test("srmCheck: imbalanced split flags, balanced split is chi2 = 0; units count distinct") {
    // 30 vs 70 units: W = (2*30-100)^2 + (2*70-100)^2 = 3200,
    // chi2 = 3200/200 = 16 >> 3.84 -> flag
    val bad = ((1 to 30).map(i => ("A", i.toLong)) ++
      (31 to 100).map(i => ("B", i.toLong))).toDF("variant", "unit")
    val b = graft.ops.Audit.srmCheck(bad, "variant", "unit")
      .as[(Long, Long, Long, Long, Double, Boolean)].head()
    assert(b === ((2L, 100L, 3200L, 384L, 16.0, true)))
    // balanced, with unit 1 logged 5 times in A — distinct units keep it
    val good = ((1 to 50).map(i => ("A", i.toLong)) ++ Seq.fill(4)(("A", 1L)) ++
      (51 to 100).map(i => ("B", i.toLong))).toDF("variant", "unit")
    val g = graft.ops.Audit.srmCheck(good, "variant", "unit")
      .as[(Long, Long, Long, Long, Double, Boolean)].head()
    assert(g === ((2L, 100L, 0L, 384L, 0.0, false)))
  }

  test("srmCheck: critical value derives from k — a 3-arm equalish split " +
    "that a df=1 threshold would over-flag stays green at df=2") {
    // 325/300/275 over 900: W = (3n_i - 900)^2 summed = 75^2+0+75^2 =
    // 11250, chi2 = 11250/2700 = 4.1667 — flags at df=1 (3.84) but NOT
    // at the correct df=2 threshold (5.99)
    val arms = ((1 to 325).map(i => ("A", i.toLong)) ++
      (326 to 625).map(i => ("B", i.toLong)) ++
      (626 to 900).map(i => ("C", i.toLong))).toDF("variant", "unit")
    val chi2 = 11250.0 / 2700.0
    val r = graft.ops.Audit.srmCheck(arms, "variant", "unit")
      .as[(Long, Long, Long, Long, Double, Boolean)].head()
    assert(r === ((3L, 900L, 11250L, 599L, chi2, false)))
    // explicit override still wins: df=1 threshold flags the same split
    val o = graft.ops.Audit.srmCheck(arms, "variant", "unit", critCenti = 384L)
      .as[(Long, Long, Long, Long, Double, Boolean)].head()
    assert(o === ((3L, 900L, 11250L, 384L, chi2, true)))
    // beyond the df table (k = 12): FAIL FAST — a NULL flag would be
    // silently dropped by a downstream WHERE srm_flag (ADVICE r15)
    val many = (1 to 120).map(i => (s"V${i % 12}", i.toLong)).toDF("variant", "unit")
    val ex = intercept[Exception] {
      graft.ops.Audit.srmCheck(many, "variant", "unit").collect()
    }
    assert(ex.getMessage.contains("pass critCenti explicitly") ||
      Option(ex.getCause).exists(_.getMessage.contains("pass critCenti explicitly")))
    // ... and an explicit critCenti keeps k = 12 fully usable
    val m12 = graft.ops.Audit.srmCheck(many, "variant", "unit", critCenti = 1968L)
      .select("k", "crit_centi").as[(Long, Long)].head()
    assert(m12 === ((12L, 1968L)))
  }

  test("woeIv: exact ratios round-trip; zero-cell categories emit NULL instead of Inf") {
    val rows = Seq(("a", true), ("a", true), ("a", false),
      ("b", true), ("b", false), ("b", false),
      ("z", true)) // zero negatives -> degenerate cell
    val out = Quality.woeIv(rows.toDF("cat", "y"), "cat", "y")
      .as[(String, Long, Long, Option[Double], Option[Double])]
      .collect().sortBy(_._1)
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // P = 4, N = 3; woe_a = ln((2/4)/(1/3)) = ln(1.5)
    val woeA = r6(math.log(1.5))
    val ivA = r6((2.0 / 4.0 - 1.0 / 3.0) * math.log(2.0 * 3.0 / (1.0 * 4.0)))
    assert(out(0) === (("a", 2L, 1L, Some(woeA), Some(ivA))))
    // woe_b = ln((1/4)/(2/3)) = ln(3/8), symmetric-ish negative
    assert(out(1)._4.get === r6(math.log(1.0 * 3.0 / (2.0 * 4.0))))
    assert(out(2) === (("z", 1L, 0L, None, None)))
  }

  test("scalerFitApply: stats fit on train only; test outliers cannot shift the scaler; zero-variance guards") {
    // ids 1..100; the md5 split puts ~80 in train. A huge outlier is
    // planted on a TEST id: if it leaked into the fit, every train z
    // would shrink. We find a test id first, then assert the fit equals
    // the train-only hand computation.
    val base = (1L to 100L).map(i => (i, (i % 10).toDouble + 1.0))
    val probe = graft.ops.Features.scalerFitApply(base.toDF("id", "v"), "id", "v")
      .select("id", "is_train").as[(Long, Boolean)].collect().toMap
    val testId = probe.collect { case (id, false) => id }.min
    val spiked = base.map { case (i, v) => if (i == testId) (i, 1e9) else (i, v) }
    val out = graft.ops.Features.scalerFitApply(spiked.toDF("id", "v"), "id", "v")
      .select("id", "is_train", "n_train", "z")
      .as[(Long, Boolean, Long, Option[Double])].collect()
    val trainVals = spiked.filter(p => probe(p._1)).map(_._2)
    val n = trainVals.length.toLong
    assert(out.forall(_._3 === n)) // outlier row did NOT join the fit
    // hand z for one train row, in cents fixed-point
    val cents = trainVals.map(v => math.floor(v * 100.0 + 0.5).toLong)
    val sx = cents.sum; val sxx = cents.map(c => c * c).sum
    val mu = sx.toDouble / n
    val sd = math.sqrt((n.toDouble * sxx - sx.toDouble * sx) / (n.toDouble * n))
    val someTrain = out.find(_._2).get
    val vc = math.floor(spiked.find(_._1 == someTrain._1).get._2 * 100.0 + 0.5)
    val expected = BigDecimal((vc - mu) / sd)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(someTrain._4.get === expected)
    // constant train column -> integer zero-variance witness -> NULL z
    val flat = graft.ops.Features.scalerFitApply(
      (1L to 20L).map((_, 7.0)).toDF("id", "v"), "id", "v")
      .select("z").as[Option[Double]].collect()
    assert(flat.forall(_.isEmpty))
  }

  test("pseudonymize: same salt is referentially consistent across tables; new salt rotates; distincts preserved") {
    val evs = Seq((7L, "click"), (7L, "view"), (8L, "click")).toDF("uid", "et")
    val users = Seq((7L, "NA"), (8L, "EU"), (9L, "EU")).toDF("uid", "region")
    val pe = Quality.pseudonymize(evs, "uid", "s1")
    val pu = Quality.pseudonymize(users, "uid", "s1")
    // the pseudonymized join reproduces the raw join exactly
    val joined = pe.join(pu, Seq("uid_pseudo"))
      .select("et", "region").as[(String, String)].collect().sorted
    assert(joined.toSeq === Seq(("click", "EU"), ("click", "NA"), ("view", "NA")))
    // cardinality preserved; raw ids gone from the schema
    assert(pu.select("uid_pseudo").distinct().count() === 3L)
    assert(!pe.columns.contains("uid"))
    // rotation: a different salt shares no tokens with the first
    val rotated = Quality.pseudonymize(users, "uid", "s2")
      .select("uid_pseudo").as[String].collect().toSet
    assert(rotated.intersect(
      pu.select("uid_pseudo").as[String].collect().toSet).isEmpty)
    // NULL ids stay NULL, not md5-of-empty
    val withNull = Quality.pseudonymize(
      Seq((null: java.lang.Long, "x")).toDF("uid", "et"), "uid", "s1")
      .select("uid_pseudo").as[Option[String]].head()
    assert(withNull.isEmpty)
  }

  test("timeSplitEmbargo: the embargo band is excluded from both sides and the bounds straddle it") {
    val rows = Seq(
      ("2024-01-10 00:00:00", 1), ("2024-01-14 23:59:59", 2), // train
      ("2024-01-15 00:00:00", 3), ("2024-01-16 23:59:59", 4), // embargo
      ("2024-01-17 00:00:00", 5), ("2024-01-20 12:00:00", 6)) // test
      .map { case (t, i) => (i.toLong, ts(t)) }
    val out = graft.ext.Sampling.timeSplitEmbargo(
      rows.toDF("id", "ts"), "ts", "2024-01-15 00:00:00", embargoDays = 2)
      .as[(String, Long, String, String)].collect().sortBy(_._1)
    assert(out === Array(
      ("embargo", 2L, "2024-01-15", "2024-01-16"),
      ("test", 2L, "2024-01-17", "2024-01-20"),
      ("train", 2L, "2024-01-10", "2024-01-14")))
  }

  test("conformalInterval: brute-force parity on the exact integer pipeline; edge rows count as covered") {
    // 600 rows, 2 groups, values cycle 0..6 — recompute the whole split
    // conformal pipeline in plain Scala from the SAME md5 bands and
    // demand bit-equality
    val rows = (1L to 600L).map(i => (i, if (i % 2 == 0) "g" else "h", (i % 7).toDouble))
    val df = rows.toDF("id", "grp", "v")
    val bandOf = df.selectExpr("id",
      s"pmod(${graft.ext.TextOps.md5Long64("concat('conf:', cast(id as string))")}, 100) as band")
      .as[(Long, Long)].collect().toMap
    def expected(grp: String): Option[(Long, Long, Long, Long, Long)] = {
      val g = rows.filter(_._2 == grp).map { case (i, _, v) =>
        (i, math.floor(v * 100.0 + 0.5).toLong, bandOf(i)) }
      val train = g.filter(_._3 < 50)
      val (n, sx) = (train.length.toLong, train.map(_._2).sum)
      val cal = g.filter(r => r._3 >= 50 && r._3 < 75)
        .map(r => (math.abs(r._2 * n - sx), r._1)).sorted
      if (train.isEmpty || cal.isEmpty) None
      else {
        val k = math.min(cal.length, (90 * (cal.length + 1) + 99) / 100)
        val qhat = cal(k - 1)._1
        val test = g.filter(_._3 >= 75)
        val covered = test.count(r => math.abs(r._2 * n - sx) <= qhat)
        Some((n, cal.length.toLong, test.length.toLong, qhat, covered.toLong))
      }
    }
    val out = Quality.conformalInterval(df, "id", "grp", "v")
      .select("grp", "n_train", "n_cal", "n_test", "qhat_scaled", "n_covered")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    Seq("g", "h").foreach { grp =>
      assert(out.get(grp) === expected(grp), s"group $grp")
    }
    // the guarantee: realized coverage >= 1 - alpha - slack on this
    // well-behaved fixture
    out.values.foreach { case (_, _, nTest, _, nCov) =>
      assert(nCov.toDouble / nTest >= 0.8)
    }
  }

  test("calibrationCurve: equal-width buckets over the observed range; a perfectly separable score calibrates 0/1") {
    val rows = (0L until 100L).map(sc => (sc, sc >= 50L))
    val out = Quality.calibrationCurve(rows.toDF("sc", "y"), "sc", "y")
      .as[(Int, Long, Long, Double, Double, Double, Double)].collect().sortBy(_._1)
    assert(out.length === 10)
    out.zipWithIndex.foreach { case ((b, n, nPos, lo, hi, mean, rate), i) =>
      assert(b === i && n === 10L && lo === 10.0 * i && hi === 10.0 * i + 9)
      assert(mean === 10.0 * i + 4.5)
      assert(nPos === (if (i < 5) 0L else 10L) && rate === (if (i < 5) 0.0 else 1.0))
    }
  }

  test("calibrationCurve: fractional classifier probabilities in [0,1] spread " +
    "across all buckets — the integer-cast collapse regression") {
    // under the r14 cast-to-bigint defect every probability truncated to 0
    // and the diagram degenerated to ONE bucket; fixed-point must keep 10
    val rows = (0 until 100).map(i => (i / 100.0, i >= 50))
    val out = Quality.calibrationCurve(rows.toDF("p", "y"), "p", "y")
      .as[(Int, Long, Long, Double, Double, Double, Double)].collect().sortBy(_._1)
    assert(out.length === 10)
    out.zipWithIndex.foreach { case ((b, n, nPos, lo, hi, mean, rate), i) =>
      assert(b === i && n === 10L)
      assert(math.abs(lo - 0.1 * i) < 1e-9 && math.abs(hi - (10 * i + 9) / 100.0) < 1e-9)
      assert(math.abs(mean - (10 * i + 4.5) / 100.0) < 1e-9)
      assert(nPos === (if (i < 5) 0L else 10L) && rate === (if (i < 5) 0.0 else 1.0))
    }
    // negative fractional scores bucket by value order, never truncate
    // toward zero: -0.95..+0.95 must put the most-negative score in b0
    val neg = Seq((-0.95, false), (-0.5, false), (0.5, true), (0.95, true))
    val nOut = Quality.calibrationCurve(neg.toDF("p", "y"), "p", "y", buckets = 2)
      .as[(Int, Long, Long, Double, Double, Double, Double)].collect().sortBy(_._1)
    assert(nOut.map(r => (r._1, r._2, r._7)).toSeq === Seq((0, 2L, 0.0), (1, 2L, 1.0)))
  }

  test("maintainCountView: NULL group keys merge null-safely with their deltas") {
    // base: two NULL-group rows + one g1; delete one NULL-group row and
    // move the other into g1. Plain-equality join would leave the stale
    // NULL base count (2) on its own row; null-safe must net it to 0.
    val snap = Seq((1L, null: String), (2L, null: String), (3L, "g1"))
      .toDF("id", "grp")
    val chg = Seq((1L, null: String, "D", 1L), (2L, "g1", "U", 1L))
      .toDF("id", "grp", "op", "version")
    val maintained = Cdc.maintainCountView(snap, chg, "id", Seq("grp"))
      .as[(Option[String], Long)].collect().sortBy(_._1)
    val recomputed = Cdc.applyChangelog(snap, chg, "id")
      .groupBy("grp").agg(count(lit(1)).as("n"))
      .as[(Option[String], Long)].collect().sortBy(_._1)
    assert(maintained === recomputed)
    assert(maintained === Array((Some("g1"), 2L)))
    // and a delete INTO a surviving NULL group maintains its count too
    val chg2 = Seq((3L, "g1", "D", 1L)).toDF("id", "grp", "op", "version")
    assert(Cdc.maintainCountView(snap, chg2, "id", Seq("grp"))
      .as[(Option[String], Long)].collect().sortBy(_._1) ===
      Array((None, 2L)))
  }

  // ---- ndcgEval ------------------------------------------------------

  test("ndcgEval: fixed-point DCG against hand-computed discounts; zero-rel queries excluded") {
    // q1: rel at ranks 1 and 3 (scores 9 > 8 > 7); q2: no relevant rows
    val df = Seq(
      ("q1", true, 9.0, 1L), ("q1", false, 8.0, 2L), ("q1", true, 7.0, 3L),
      ("q2", false, 5.0, 1L))
      .toDF("q", "rel", "score", "tie")
    val out = Quality.ndcgEval(df, "q", col("rel"), "score", "tie", ks = Seq(5))
      .as[(Int, Long, Long, Long, Double)].collect()
    assert(out.length === 1)
    val (k, nq, dcg, idcg, ndcg) = out.head
    assert(k === 5 && nq === 1L)
    assert(dcg === 1000000000L + 500000000L)   // D1 + D3
    assert(idcg === 1000000000L + 630929754L)  // P(2): both hits ideal-first
    assert(ndcg === 1500000000.0 / 1630929754.0)
  }

  test("ndcgEval: hits beyond k gain nothing but still raise the ideal, capped at k") {
    // 12 rows, all relevant: dcg@10 = idcg@10 = P(10) → ndcg exactly 1;
    // dcg@5 = P(5) while idcg@5 is capped at P(5) → also 1
    val df = (1 to 12).map(i => ("q", true, 100.0 - i, i.toLong))
      .toDF("q", "rel", "score", "tie")
    val out = Quality.ndcgEval(df, "q", col("rel"), "score", "tie")
      .select("k", "ndcg_micro").as[(Int, Double)].collect().sortBy(_._1)
    assert(out === Array((5, 1.0), (10, 1.0)))
  }

  // ---- rollingAnomaly ------------------------------------------------

  test("rollingAnomaly: a spike after a varied week flags with the exact z") {
    // counts 1..7 then 20: window mean 4, population var 4 ⇒ z = 8
    val rows = (1 to 7).flatMap(d =>
      (1 to d).map(_ => ("t", ts(f"2024-01-0$d%01d 10:00:00")))) ++
      (1 to 20).map(_ => ("t", ts("2024-01-08 10:00:00")))
    val out = Quality.rollingAnomaly(rows.toDF("event_type", "ts"),
      "event_type", "ts", window = 7)
      .select("day", "y", "m_window", "spike_flag", "z")
      .as[(Timestamp, Long, Long, Boolean, Option[Double])]
      .collect().sortBy(_._1.getTime)
    assert(out.length === 8)
    // warm-up days (m < 7) never flag
    out.init.foreach { case (_, _, m, flag, _) =>
      assert(m < 7L && !flag)
    }
    val (_, y, m, flag, z) = out.last
    assert(y === 20L && m === 7L && flag)
    assert(z === Some(8.0))
  }

  test("rollingAnomaly: zero-variance window flags any deviation, with NULL z") {
    val rows = (1 to 7).map(d => ("t", ts(f"2024-01-0$d%01d 10:00:00"))) ++
      Seq.fill(5)(("t", ts("2024-01-08 10:00:00")))
    val out = Quality.rollingAnomaly(rows.toDF("event_type", "ts"),
      "event_type", "ts", window = 7)
      .where(col("m_window") === 7)
      .select("spike_flag", "z").as[(Boolean, Option[Double])].collect()
    assert(out === Array((true, None)))
  }

  // ---- windowDedup ---------------------------------------------------

  test("windowDedup keeps the first (ts, tie) per key per hour and counts the duplicates") {
    val events = Seq(
      ("u1", "click", ts("2024-01-01 10:05:00"), "e2"),
      ("u1", "click", ts("2024-01-01 10:05:00"), "e1"), // same ts: tie wins
      ("u1", "click", ts("2024-01-01 10:40:00"), "e3"),
      ("u1", "click", ts("2024-01-01 11:00:00"), "e4"), // next bucket
      ("u2", "click", ts("2024-01-01 10:59:59"), "e5"))
      .toDF("user_id", "event_type", "ts", "event_id")
    val out = Dedup.windowDedup(events, Seq("user_id", "event_type"),
      "ts", "event_id")
      .select("user_id", "win_start_sec", "tie", "n_dups")
      .as[(String, Long, String, Long)].collect().sortBy(r => (r._1, r._2))
    val h10 = ts("2024-01-01 10:00:00").getTime / 1000
    val h11 = h10 + 3600
    assert(out === Array(
      ("u1", h10, "e1", 2L), ("u1", h11, "e4", 0L), ("u2", h10, "e5", 0L)))
  }

  // ---- personalizedPageRank --------------------------------------------

  test("personalizedPageRank: teleport only to seeds; unreached nodes score exactly 0; isolated seeds hold (1-d)·t") {
    // chain 1→2→3 plus isolated seed 99; seeds {1, 99} split teleport .5/.5
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L)).toDF("src", "dst", "weight")
    val seeds = Seq(1L, 99L).toDF("id")
    val out = graft.ext.Graph.personalizedPageRank(edges, seeds, iters = 2)
      .as[(Long, Double)].collect().toMap
    // hand-rolled: r1 = [.075, .425, 0, .075]; r2 = [.075, .06375, .36125, .075]
    assert(out === Map(
      1L -> 0.075, 2L -> 0.06375, 3L -> 0.36125, 99L -> 0.075))
    // non-seed-reachable component scores exactly zero (no float fuzz)
    val twoComp = Seq((1L, 2L, 1L), (10L, 11L, 1L)).toDF("src", "dst", "weight")
    val out2 = graft.ext.Graph.personalizedPageRank(
      twoComp, Seq(1L).toDF("id"), iters = 3)
      .as[(Long, Double)].collect().toMap
    assert(out2(10L) === 0.0 && out2(11L) === 0.0)
    assert(out2(1L) > 0 && out2(2L) > 0)
  }

  // ---- versionDiff -------------------------------------------------------

  test("versionDiff: the diff between two as-of states classifies adds/changes/removes") {
    val snap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val chg = Seq(
      (2L, "b2", "U", 10L),  // inside [v1, v2]: changed
      (3L, "c", "D", 11L),   // inside: removed
      (9L, "i", "I", 12L),   // inside: added
      (1L, "a9", "U", 99L))  // beyond v2: invisible to the diff
      .toDF("id", "v", "op", "version")
    val out = Cdc.versionDiff(snap, chg, "id", v1 = 5L, v2 = 20L)
      .as[(Long, String)].collect().sortBy(_._1)
    assert(out === Array((2L, "changed"), (3L, "removed"), (9L, "added")))
    // equal versions → empty diff
    assert(Cdc.versionDiff(snap, chg, "id", 10L, 10L).count() === 0L)
    // twin-form equality pin: the delta-restricted single-aggregate form
    // equals snapshotDiff over two full applyChangelogAsOf states, on a
    // fixture exercising every merge case on BOTH sides of v1 — multiple
    // changes per key (latest-wins within each arm), delete-then-revive,
    // same-data update (classifies 'unchanged' and must NOT emit),
    // insert-then-delete inside the window (absent from both states)
    val chg2 = Seq(
      (1L, "a1", "U", 3L), (1L, "a2", "U", 8L),   // changes ≤ v1 only: states equal
      (2L, "b1", "U", 4L), (2L, "b2", "U", 12L),  // changed across the window
      (3L, "c", "U", 6L), (3L, "c", "U", 15L),    // same data both arms: unchanged
      (9L, "i1", "I", 2L), (9L, "i2", "U", 14L),  // pre-existing insert, changed
      (7L, "n", "I", 11L), (7L, "n", "D", 13L),   // insert+delete inside: nothing
      (8L, "z", "D", 9L), (8L, "z2", "U", 16L))   // deleted before v1, revived after
      .toDF("id", "v", "op", "version")
    val snap2 = Seq((1L, "a"), (2L, "b"), (3L, "c"), (8L, "z")).toDF("id", "v")
    for ((a, b) <- Seq((5L, 20L), (8L, 12L), (0L, 99L), (9L, 9L))) {
      val fast = Cdc.versionDiff(snap2, chg2, "id", a, b)
        .as[(Long, String)].collect().sortBy(_._1)
      val slow = Cdc.snapshotDiff(
        Cdc.applyChangelogAsOf(snap2, chg2, "id", a),
        Cdc.applyChangelogAsOf(snap2, chg2, "id", b), "id")
        .as[(Long, String)].collect().sortBy(_._1)
      assert(fast === slow, s"versionDiff($a, $b) diverged from the twin form")
    }
  }

  // ---- sampleAudit -------------------------------------------------------

  test("sampleAudit: exact z witnesses; over-sampled stratum flags, on-rate stratum is z = 0") {
    val full = (Seq.fill(10)("a") ++ Seq.fill(10)("b")).toDF("lang")
    val sampled = (Seq.fill(1)("a") ++ Seq.fill(8)("b")).toDF("lang")
    val out = graft.ops.Audit.sampleAudit(full, sampled, "lang", 10L, 100L)
      .as[(String, Long, Long, Double, Boolean, Double)].collect().sortBy(_._1)
    val (_, nfA, nsA, rateA, flagA, zA) = out(0)
    assert((nfA, nsA, rateA, flagA, zA) === ((10L, 1L, 0.1, false, 0.0)))
    val (_, nfB, nsB, _, flagB, zB) = out(1)
    assert((nfB, nsB, flagB) === ((10L, 8L, true)))
    assert(zB === 700.0 / math.sqrt(9000.0))
    // a stratum absent from the sample still reports (n_sample = 0)
    val none = graft.ops.Audit.sampleAudit(
      full, Seq.empty[String].toDF("lang"), "lang", 10L, 100L)
      .select("n_sample").as[Long].collect()
    assert(none === Array(0L, 0L))
  }

  test("sampleAudit: a NULL stratum joins null-safely — on-rate NULLs don't false-flag") {
    // 10 unlabeled rows sampled at exactly the nominal 1/10 rate: the
    // null-safe join must land the sampled NULL row on the full NULL
    // stratum (plain equality would report n_sample = 0, z = -3.33, flag)
    val full = (Seq.fill(10)(null: String) ++ Seq.fill(10)("b")).toDF("lang")
    val sampled = (Seq.fill(1)(null: String) ++ Seq.fill(1)("b")).toDF("lang")
    val out = graft.ops.Audit.sampleAudit(full, sampled, "lang", 10L, 100L)
      .select("stratum", "n_full", "n_sample", "dev_flag")
      .as[(Option[String], Long, Long, Boolean)].collect()
    val nullRow = out.find(_._1.isEmpty).get
    assert((nullRow._2, nullRow._3, nullRow._4) === ((10L, 1L, false)))
  }

  // ---- weightedMedian ----------------------------------------------------

  test("weightedMedian: first value where 2W >= total; heavy weights pull it; even split takes the lower") {
    val df = Seq(
      ("g", 1.0, 1L, 1L), ("g", 2.0, 1L, 2L), ("g", 3.0, 5L, 3L),
      ("h", 1.0, 1L, 4L), ("h", 2.0, 1L, 5L))
      .toDF("grp", "v", "w", "id")
    val out = graft.ops.Functions.weightedMedian(df, "grp", "v", "w", "id")
      .as[(String, Double, Long)].collect().sortBy(_._1)
    // g: weights 1,1,5 → total 7, cum 1,2,7 → median 3.0
    // h: even 1,1 → 2*1 >= 2 already at the first value → lower median
    assert(out === Array(("g", 3.0, 7L), ("h", 1.0, 2L)))
  }

  // ---- decayedValue ------------------------------------------------------

  test("decayedValue: exact half-life decay — today full, yesterday halved") {
    val events = Seq(
      (1L, ts("2024-01-02 10:00:00"), 2.0),   // today: 2.00
      (1L, ts("2024-01-01 10:00:00"), 1.0),   // yesterday: 0.50 after decay
      (2L, ts("2024-01-02 11:00:00"), 0.10))
      .toDF("user_id", "ts", "value")
    val out = graft.ops.Features.decayedValue(events, "user_id", "ts", "value")
      .select("user_id", "raw_cents", "n_days", "decayed_value")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out === Array((1L, 300L, 2L, 2.5), (2L, 10L, 1L, 0.1)))
  }

  // ---- clusterDiameter ---------------------------------------------------

  test("clusterDiameter: identical-doc clusters report jaccard 1 and never flag") {
    val t1 = (1 to 12).map(i => s"alpha$i").mkString(" ")
    val t2 = (1 to 12).map(i => s"beta$i").mkString(" ")
    val docs = Seq((1L, t1), (2L, t1), (3L, t1), (4L, t2), (5L, t2))
      .toDF("doc_id", "text")
    val out = Dedup.clusterDiameter(docs)
      .as[(Long, Long, Long, Long, Long, Option[Double], Boolean)]
      .collect().sortBy(_._2)
    // members 2, 3 (rep 1) and 5 (rep 4): full overlap, no chaining
    assert(out.map(r => (r._1, r._2)) === Array((1L, 2L), (1L, 3L), (4L, 5L)))
    out.foreach { case (_, _, szR, szM, shared, j, flag) =>
      assert(szR === 10L && szM === 10L && shared === 10L)
      assert(j === Some(1.0) && !flag)
    }
  }

  // ---- graphNegatives ----------------------------------------------------

  test("graphNegatives: no sampled negative is a real edge; at most k per node; deterministic") {
    // path graph over 6 nodes: plenty of non-edges
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("src", "dst")
    val out = graft.ext.Graph.graphNegatives(edges, k = 2)
      .as[(Long, Long, Long)].collect()
    assert(out.nonEmpty)
    val edgeSet = Set((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    out.foreach { case (node, rank, partner) =>
      val norm = (math.min(node, partner), math.max(node, partner))
      assert(!edgeSet.contains(norm), s"sampled a real edge $norm")
      assert(node !== partner)
      assert(rank >= 1L && rank <= 2L)
    }
    assert(out.groupBy(_._1).values.forall(_.length <= 2))
    // bit-reproducible: a second run yields the identical set
    val again = graft.ext.Graph.graphNegatives(edges, k = 2)
      .as[(Long, Long, Long)].collect()
    assert(out.sortBy(r => (r._1, r._2)) === again.sortBy(r => (r._1, r._2)))
  }

  // ---- clusterPurity ---------------------------------------------------

  test("clusterPurity: majority label per cluster, deterministic ties, null clusters excluded") {
    val assign = Seq(
      (1L, Some(0)), (2L, Some(0)), (3L, Some(0)),
      (4L, Some(1)), (5L, Some(1)),
      (6L, None)) // unassigned: excluded
      .toDF("vec_id", "cell")
    val labels = Seq(
      (1L, "x"), (2L, "x"), (3L, "y"),
      (4L, "z"), (5L, "y"),
      (6L, "x"))
      .toDF("vec_id", "label")
    val out = graft.ops.Audit.clusterPurity(
      assign, "vec_id", "cell", labels, "vec_id", "label")
      .as[(Int, Long, String, Long, Double)].collect().sortBy(_._1)
    // cluster 0: x dominates 2/3; cluster 1: y/z tie 1-1 → label asc wins
    assert(out === Array(
      (0, 3L, "x", 2L, 2.0 / 3.0),
      (1, 2L, "y", 1L, 0.5)))
  }

  // ---- disparateImpact --------------------------------------------------

  test("disparateImpact: integer 80%-rule flag — strictly below fires, exactly on the line does not") {
    // A: 6/10 positive, B: 4/10 → global 10/20 = 0.5; B's rate 0.4 is
    // EXACTLY 4/5 of global → must NOT flag (strict <)
    val onLine = (Seq.fill(6)(("A", true)) ++ Seq.fill(4)(("A", false)) ++
      Seq.fill(4)(("B", true)) ++ Seq.fill(6)(("B", false)))
      .toDF("g", "pos")
    val out = graft.ops.Audit.disparateImpact(onLine, "g", col("pos"))
      .select("grp", "rate", "impact_ratio", "below_four_fifths")
      .as[(String, Double, Double, Boolean)].collect().sortBy(_._1)
    assert(out === Array(("A", 0.6, 1.2, false), ("B", 0.4, 0.8, false)))
    // one positive fewer in B → strictly below, flag fires
    val below = (Seq.fill(6)(("A", true)) ++ Seq.fill(4)(("A", false)) ++
      Seq.fill(3)(("B", true)) ++ Seq.fill(7)(("B", false)))
      .toDF("g", "pos")
    val out2 = graft.ops.Audit.disparateImpact(below, "g", col("pos"))
      .select("grp", "below_four_fifths")
      .as[(String, Boolean)].collect().sortBy(_._1)
    assert(out2 === Array(("A", false), ("B", true)))
    // zero positives anywhere: ratios NULL, nothing flags (0 < 0 is false)
    val none = Seq(("A", false), ("B", false)).toDF("g", "pos")
    val out3 = graft.ops.Audit.disparateImpact(none, "g", col("pos"))
      .select("impact_ratio", "below_four_fifths")
      .as[(Option[Double], Boolean)].collect()
    assert(out3.forall(r => r._1.isEmpty && !r._2))
  }

  // ---- psiDrift --------------------------------------------------------

  test("psiDrift: identical distributions give all-zero terms; a shifted bin drives both affected terms positive") {
    val ref = Seq(10.0, 10.0, 60.0, 110.0).toDF("v")
    val same = graft.ops.Audit.psiDrift(ref, ref, "v", binWidth = 50.0, bins = 3)
      .select("psi_term").as[Double].collect()
    assert(same.forall(_ === 0.0))
    // current loses the bin-2 row to bin 0: PSI terms are a divergence —
    // (p−q) and ln(p/q) always share sign, so BOTH moved bins go positive
    val cur = Seq(10.0, 10.0, 60.0, 10.0).toDF("v")
    val out = graft.ops.Audit.psiDrift(ref, cur, "v", binWidth = 50.0, bins = 3)
      .select("bin", "n_ref", "n_cur", "psi_term")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out.map(r => (r._1, r._2, r._3)) ===
      Array((0L, 2L, 3L), (1L, 1L, 1L), (2L, 1L, 0L)))
    // smoothed p=(n+1)/(N+bins): bin0 3/7 vs 4/7, bin2 2/7 vs 1/7,
    // bin1 equal → 0
    assert(out(0)._4 > 0.0 && out(1)._4 === 0.0 && out(2)._4 > 0.0)
    val expected2 = math.rint((2.0 / 7 - 1.0 / 7) * math.log(2.0) * 1e6) / 1e6
    assert(out(2)._4 === expected2)
    // out-of-range values clamp into the edge bins rather than vanish
    val clamped = graft.ops.Audit.psiDrift(
      Seq(-5.0, 999.0).toDF("v"), Seq(-5.0, 999.0).toDF("v"), "v", 50.0, 3)
      .select("bin").as[Long].collect().sorted
    assert(clamped === Array(0L, 2L))
  }

  // ---- audioLoudness -----------------------------------------------------

  test("audioLoudness: window energies match the sample spec exactly; corrupt payloads emit no rows") {
    import graft.ext.Multimodal
    val good = Multimodal.AudioRecord(5L, Multimodal.encodeWav(5L, 20, 8000), 8000, 20)
    val bad = Multimodal.AudioRecord(6L, Array[Byte](1, 2, 3), 8000, 20)
    val out = Multimodal.audioLoudness(
      Seq(good, bad).toDS(), window = 16)
      .collect().sortBy(_.win)
    assert(out.length === 2 && out.forall(_.media_id === 5L))
    def smp(i: Int): Long = (5L * 31 + i * 17) % 65536 - 32768
    val w0 = (0 until 16).map(i => smp(i) * smp(i)).sum
    val w1 = (16 until 20).map(i => smp(i) * smp(i)).sum
    assert(out(0).n_in_win === 16L && out(0).sum_sq === w0)
    assert(out(1).n_in_win === 4L && out(1).sum_sq === w1)
    assert(out(0).rms === math.sqrt(w0.toDouble / 16))
    assert(out.forall(_.n_clipped === 0L))
  }

  // ---- ctfidfTerms ---------------------------------------------------

  test("ctfidfTerms: class-distinctive terms score tf_class * total/tf_global, ties on token") {
    val docs = Seq(
      (1L, "apple apple pear", "en"),
      (2L, "apple banane", "fr"),
      (3L, "", "en")) // empty text contributes no tokens
      .toDF("doc_id", "text", "lang")
    val out = TextOps.ctfidfTerms(docs, "lang", k = 2)
      .select("cls", "token", "tf_class", "tf_global", "score", "rank")
      .as[(String, String, Long, Long, Double, Long)]
      .collect().sortBy(r => (r._1, r._6))
    // totals: apple=3, pear=1, banane=1 → total_tokens=5
    val en = out.filter(_._1 == "en")
    assert(en.map(_._2).toSeq === Seq("pear", "apple"))
    assert(en.head._5 === 1 * (5.0 / 1)) // pear: tf 1, global 1 → 5.0
    assert(en.last._5 === 2 * (5.0 / 3)) // apple: tf 2, global 3
    val fr = out.filter(_._1 == "fr")
    // banane 1×(5/1)=5 beats apple 1×(5/3); tie impossible here but rank
    // order must be deterministic
    assert(fr.map(_._2).toSeq === Seq("banane", "apple"))
  }

  // ---- Geo.radiusJoinNearest ----------------------------------------

  test("radiusJoinNearest: grid join equals brute force incl. cell-boundary and diagonal pairs") {
    import graft.ext.Geo
    // R = 10; hand-placed adversarial cases:
    //  - probe (0,0) cell(0,0) vs build (9,9): diagonal within same cell, d2=162>100 → miss
    //  - probe (10,0) cell(1,0) vs build (9,0) cell(0,0): adjacent cells, d2=1 → hit
    //  - probe (25,25) vs build (31,33): same? cells (2,2)/(3,3) diagonal, d2=36+64=100 = R² → hit (≤)
    //  - probe (50,50) vs build (61,50): cells (5,5)/(6,5), d2=121>100 → miss
    //  - probe (5,5) vs builds (5,6) d2=1 and (6,5) d2=1: tie on d2 → nearest = smaller id
    val probe = Seq((1L, 0L, 0L), (2L, 10L, 0L), (3L, 25L, 25L),
      (4L, 50L, 50L), (5L, 5L, 5L)).toDF("id", "x", "y")
    val build = Seq((101L, 9L, 9L), (102L, 9L, 0L), (103L, 31L, 33L),
      (104L, 61L, 50L), (106L, 5L, 6L), (105L, 6L, 5L)).toDF("id", "x", "y")
    val out = Geo.radiusJoinNearest(probe, build, radius = 10L)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // brute force inline
    val pts = Seq((1L, 0L, 0L), (2L, 10L, 0L), (3L, 25L, 25L), (4L, 50L, 50L), (5L, 5L, 5L))
    val bds = Seq((101L, 9L, 9L), (102L, 9L, 0L), (103L, 31L, 33L), (104L, 61L, 50L), (106L, 5L, 6L), (105L, 6L, 5L))
    val brute = pts.flatMap { case (pid, px, py) =>
      val hits = bds.map { case (bid, bx, by) => (bid, (px - bx) * (px - bx) + (py - by) * (py - by)) }
        .filter(_._2 <= 100L)
      if (hits.isEmpty) None
      else Some((pid, hits.size.toLong,
        hits.minBy { case (bid, d2) => (d2, bid) }._1,
        hits.map(_._2).min))
    }
    assert(out === brute)
    // the specific adversarial verdicts hold
    val m = out.map(r => r._1 -> r).toMap
    // probe 1 (0,0): same-cell (9,9) d2=162 MISSES while farther-cell
    // (9,0)/(5,6)/(6,5) hit — membership is the predicate, not the cell
    assert(m(1L)._2 === 3L && m(1L)._4 === 61L)
    assert(m(2L)._3 === 102L && m(2L)._4 === 1L) // cross-cell-boundary hit
    assert(m(3L)._4 === 100L) // boundary d2 == R² kept (≤, not <)
    assert(!m.contains(4L)) // adjacent-cell candidate correctly rejected
    assert(m(5L)._3 === 105L && m(5L)._4 === 1L) // d2 tie → smaller build id
  }

  test("radiusJoinNearest: out-of-domain coordinate raises loudly") {
    import graft.ext.Geo
    val probe = Seq((1L, -5L, 0L)).toDF("id", "x", "y")
    val build = Seq((2L, 0L, 0L)).toDF("id", "x", "y")
    val e = intercept[Exception] {
      Geo.radiusJoinNearest(probe, build, radius = 10L).collect()
    }
    assert(e.getMessage.contains("out of [0, 2^31)"))
  }

  // ---- Sampling.rendezvousShards ------------------------------------

  test("rendezvousShards: partition of the corpus; per-key assignment independent of the rest") {
    import graft.ext.Sampling
    val keys = (0L until 600L).toDF("k")
    val out = Sampling.rendezvousShards(keys, "k", 8)
      .as[(Int, Long, Long, Long)].collect()
    assert(out.map(_._2).sum === 600L) // every key placed exactly once
    assert(out.forall(r => r._1 >= 0 && r._1 < 8))
    // growth 8→9 moves ≈ 1/9 of keys (loose 3× bound — deterministic,
    // not statistical: the md5 draw is fixed)
    val moving = out.map(_._3).sum
    assert(moving > 0 && moving < 3 * 600 / 9, s"moving=$moving")
    // fill ppm sums to ~#shards × 1e6 (integer-floor slack < #shards)
    val ppm = out.map(_._4).sum
    assert(ppm > 8000000L - 8 && ppm <= 8000000L)
    // stability: a key's shard never depends on which other keys exist
    val solo = Sampling.rendezvousShards(Seq(123L).toDF("k"), "k", 8)
      .as[(Int, Long, Long, Long)].collect().head._1
    val inCrowd = Sampling.rendezvousShards(keys, "k", 8) // recompute full
    val _ = inCrowd // assignment is inside the aggregate; check via the count path
    val crowdShard = Sampling.rendezvousShards(keys.where(col("k") === 123L), "k", 8)
      .as[(Int, Long, Long, Long)].collect().head._1
    assert(solo === crowdShard)
  }

  // ---- TextOps.rakeKeywords -----------------------------------------

  test("rakeKeywords: stopword segmentation, deg/freq scoring, and the maxLen cap") {
    // doc 1: "deep learning of deep neural networks" →
    //   phrases: [deep learning], [deep neural networks]
    // doc 2: "the deep learning is great" → [deep learning], [great]
    // deep: 3 occurrences, deg 2+3+2=7 → (7e6) div 3 = 2333333
    // learning: freq 2, deg 4 → 2000000; neural/networks: freq 1, deg 3 → 3000000
    // great: freq 1, deg 1 → 1000000
    // "deep neural networks" = 2333333+3000000+3000000 = 8333333
    // "deep learning" = 2333333+2000000 = 4333333 (×2 occurrences)
    val docs = Seq(
      (1L, "deep learning of deep neural networks"),
      (2L, "the deep learning is great"),
      (3L, "a b c d e f g h i j")) // 10-token run > maxLen → dropped entirely
      .toDF("doc_id", "text")
    val out = TextOps.rakeKeywords(docs, k = 10, maxLen = 4)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(out === Seq(
      ("deep neural networks", 1L, 8333333L, 8.333333),
      ("deep learning", 2L, 4333333L, 4.333333),
      ("great", 1L, 1000000L, 1.0)))
  }

  test("rakeKeywords: top-k cut is total-ordered (score desc, then phrase asc)") {
    // two phrases with identical score at the k boundary: alphabetic wins
    val docs = Seq((1L, "zz the aa the zz the aa")).toDF("doc_id", "text")
    // aa and zz each: freq 2, deg 2 → wscore 1000000; both phrases score 1000000
    val out = TextOps.rakeKeywords(docs, k = 1, maxLen = 4)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(out === Seq(("aa", 2L, 1000000L, 1.0)))
  }

  // ---- Relational.allenRelations ------------------------------------

  test("allenRelations: the 13-way cascade is exhaustive and boundary-exact") {
    // brute-force cross-check on a dense micro-space: all intervals with
    // 0 <= s <= e <= 5 paired both ways — every relation and boundary
    // (meets-vs-overlaps, starts-vs-equals, point intervals) occurs
    val iv = for { s <- 0 to 5; e <- s to 5 } yield (s, e)
    def rel(a: (Int, Int), b: (Int, Int)): String = {
      val (as_, ae) = a; val (bs, be) = b
      if (as_ == bs && ae == be) "equals"
      else if (ae < bs) "before"
      else if (be < as_) "after"
      else if (ae == bs) "meets"
      else if (be == as_) "met_by"
      else if (as_ == bs && ae < be) "starts"
      else if (as_ == bs && ae > be) "started_by"
      else if (ae == be && as_ > bs) "finishes"
      else if (ae == be && as_ < bs) "finished_by"
      else if (as_ > bs && ae < be) "during"
      else if (as_ < bs && ae > be) "contains"
      else if (as_ < bs && ae >= bs && ae < be) "overlaps"
      else if (bs < as_ && be >= as_ && be < ae) "overlapped_by"
      else sys.error(s"unclassified: $a $b")
    }
    val expected = (for {
      (a, i) <- iv.zipWithIndex; (b, j) <- iv.zipWithIndex if i < j
    } yield rel(a, b)).groupBy(identity).view.mapValues(_.size.toLong).toMap
    // run the SAME pair set through the operator's CASE expression by
    // shaping it as single-"order" lineitem-like input
    val base = java.sql.Date.valueOf("2024-01-01").toLocalDate
    val rows = iv.zipWithIndex.map { case ((s0, e0), i) =>
      // encode transit via (partkey + suppkey) % 30 + 1 = e0 - s0:
      // partkey = e0 - s0 - 1, exploiting Spark's dividend-signed `%`
      // (-1 % 30 = -1 → transit 0) to reach the point intervals the
      // gated fixture excludes — this test pins the degenerate
      // tie-break order the scaladoc documents
      (1L, (i + 1).toLong, java.sql.Timestamp.valueOf(base.plusDays(s0).atStartOfDay()),
        (e0 - s0 - 1).toLong, 0L)
    }
    val df = rows.toDF("l_orderkey", "l_linenumber", "l_shipdate", "l_partkey", "l_suppkey")
    val tmp = java.nio.file.Files.createTempDirectory("allen").toString
    df.write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val out = graft.ops.Relational.allenRelations(spark, tmp)
      .as[(String, Long)].collect().toMap
    assert(out === expected)
    val nPairs = iv.size.toLong * (iv.size - 1) / 2
    assert(out.values.sum === nPairs) // total classification: no pair dropped
  }

  // ---- Features.lagFeatures -----------------------------------------

  test("lagFeatures: day gaps break lag adjacency and stay out of roll7; last day carries no label") {
    // key 'a': days 10, 11, 13 (12 missing), counts 2, 3, 5
    def t(day: Int, i: Int) = ts(f"2024-01-$day%02d 0$i:00:00")
    val rows = Seq.fill(2)(("a", t(10, 1))) ++ Seq.fill(3)(("a", t(11, 1))) ++
      Seq.fill(5)(("a", t(13, 1)))
    val out = graft.ops.Features.lagFeatures(
      rows.zipWithIndex.map { case ((k, s), i) => (k, s, i.toLong) }
        .toDF("event_type", "ts", "event_id"), "event_type", "ts")
      .select("key", "day", "n", "lag1", "lag7", "roll7", "label")
      .as[(String, Long, Long, Option[Long], Option[Long], Option[Long], Long)]
      .collect().sortBy(_._2).toSeq
    // label exists only where day+1 is observed: day 10 (label=n(11)=3).
    // day 11's label day 12 is MISSING → dropped, NOT zero-filled;
    // day 13 is last → dropped. (days are epoch days)
    val d10 = java.time.LocalDate.of(2024, 1, 10).toEpochDay
    assert(out.map(_._2) === Seq(d10))
    val r10 = out.head
    assert(r10._3 === 2L && r10._7 === 3L)
    assert(r10._4.isEmpty && r10._5.isEmpty && r10._6.isEmpty) // no history before day 10
  }

  test("lagFeatures: roll7 sums exactly the 7 prior days by VALUE, not row position") {
    def t(day: Int) = ts(f"2024-01-$day%02d 01:00:00")
    // days 1..9, 1 event each → at day 9: roll7 = days 2..8 = 7;
    // at day 8: days 1..7 = 7; at day 5: days 1..4 (only 4 rows) = 4
    val rows = (1 to 9).map(d => ("a", t(d)))
    val out = graft.ops.Features.lagFeatures(
      rows.zipWithIndex.map { case ((k, s), i) => (k, s, i.toLong) }
        .toDF("event_type", "ts", "event_id"), "event_type", "ts")
      .select("day", "roll7", "lag7")
      .as[(Long, Option[Long], Option[Long])].collect().sortBy(_._1).toSeq
    val base = out.map(_._1).min
    val byDay = out.map(r => (r._1 - base + 1) -> ((r._2, r._3))).toMap
    assert(byDay(5L)._1 === Some(4L))
    assert(byDay(8L)._1 === Some(7L) && byDay(8L)._2 === Some(1L))
  }

  // ---- WebOps.pathRollup --------------------------------------------

  test("pathRollup: parents absorb descendants; exact hits split out; depth guard raises") {
    import graft.ext.WebOps
    val paths = Seq("/a/b/c", "/a/b", "/a/x", "/d").toDF("path")
    val out = WebOps.pathRollup(paths, "path")
      .as[(String, Int, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      ("/a", 1, 3L, 0L),       // 3 rows pass through /a, none ends there
      ("/a/b", 2, 2L, 1L),     // /a/b/c + /a/b; one exact
      ("/a/b/c", 3, 1L, 1L),
      ("/a/x", 2, 1L, 1L),
      ("/d", 1, 1L, 1L)))
    val deep = Seq("/" + (1 to 17).map(_.toString).mkString("/")).toDF("path")
    val e = intercept[Exception] { WebOps.pathRollup(deep, "path").collect() }
    assert(e.getMessage.contains("deeper than maxDepth"))
  }

  // ---- Features.forecastBacktest ------------------------------------

  test("forecastBacktest: weekly-periodic series → MASE 0; constant series → NULL (0/0 guarded)") {
    def series(counts: Seq[Int], key: String): Seq[(String, Timestamp)] =
      counts.zipWithIndex.flatMap { case (c, d) =>
        Seq.fill(c)((key, ts(f"2024-01-${d + 1}%02d 01:00:00")))
      }
    // 14 days, exact period 7 (counts repeat) → every lag7 pair exact;
    // naive errors nonzero → MASE 0
    val periodic = series(Seq(5, 2, 7, 3, 9, 4, 6, 5, 2, 7, 3, 9, 4, 6), "p")
    // constant → both arms zero error → NULL verdict, not a 0/0 crash
    val const = series(Seq.fill(10)(3), "c")
    val out = graft.ops.Features.forecastBacktest(
      (periodic ++ const).zipWithIndex
        .map { case ((k, t0), i) => (k, t0, i.toLong) }
        .toDF("event_type", "ts", "event_id"), "event_type", "ts")
      .select("key", "pairs_seasonal", "sae_seasonal", "sae_naive", "mase")
      .as[(String, Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(out("p")._2 === 7L && out("p")._3 === 0L && out("p")._5 === Some(0.0))
    assert(out("p")._4 > 0L)
    assert(out("c")._5 === None)
  }

  // ---- Audit.schemaDiff ---------------------------------------------

  test("schemaDiff: widenings pass, narrowings/removals break, nullability direction matters") {
    import org.apache.spark.sql.types._
    val v1 = StructType(Seq(
      StructField("a", IntegerType, nullable = true),
      StructField("b", LongType, nullable = true),
      StructField("c", StringType, nullable = true),
      StructField("d", StringType, nullable = false),
      StructField("same", DoubleType, nullable = true)))
    val v2 = StructType(Seq(
      StructField("a", LongType, nullable = true), // widened: safe
      StructField("b", IntegerType, nullable = true), // narrowed: breaking
      StructField("c", StringType, nullable = false), // tightened: safe
      StructField("d", StringType, nullable = true), // loosened: breaking
      StructField("same", DoubleType, nullable = true), // unchanged: silent
      StructField("e", StringType, nullable = true))) // added nullable: safe
    val out = graft.ops.Audit.schemaDiff(spark, v1, v2)
      .as[(String, String, String, String, Boolean)].collect()
      .map(r => (r._1, r._2) -> r._5).toMap
    assert(out === Map(
      ("a", "type_changed") -> false,
      ("b", "type_changed") -> true,
      ("c", "nullability_tightened") -> false,
      ("d", "nullability_loosened") -> true,
      ("e", "added") -> false))
  }

  // ---- WebOps.csvDeadLetter -----------------------------------------

  test("csvDeadLetter: type failures route to the dead letter; identity keys on the outer id") {
    import graft.ext.WebOps
    val lines = Seq(
      (1L, "1,10,5.5"), // clean
      (2L, "2,20,bad"), // unparseable double → corrupt
      (3L, "3,30,7.25"), // clean
      (4L, "4,,9.0")) // missing middle field parses as null — CLEAN (absence ≠ corruption)
      .toDF("id", "line")
    val out = WebOps.csvDeadLetter(lines, "id", "line",
      "k BIGINT, c BIGINT, price DOUBLE", "price")
      .as[(String, Long, Long, Long, Long, Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    val clean = out("clean")
    assert(clean._2 === 3L && clean._3 === 3L && clean._6 === Some(5.5 + 7.25 + 9.0))
    val bad = out("corrupt")
    assert(bad._2 === 1L && bad._3 === 1L && bad._4 === 2L && bad._5 === 2L)
    assert(bad._6.isEmpty) // no salvaged price folds into the corrupt sum
  }

  // ---- Quality.rocAuc -----------------------------------------------

  test("rocAuc: perfect separation → 1, reversal → 0, all-tied → 0.5, mixed ties exact") {
    def run(rows: Seq[(Long, Boolean)]): (Long, Long, Long, Double) =
      Quality.rocAuc(rows.toDF("sc", "y"), "sc", "y")
        .as[(Long, Long, Long, Double)].head()
    assert(run(Seq((1L, false), (2L, false), (3L, true), (4L, true))) ===
      ((2L, 2L, 8L, 1.0)))
    assert(run(Seq((4L, false), (5L, false), (1L, true), (2L, true))) ===
      ((2L, 2L, 0L, 0.0)))
    assert(run(Seq((7L, true), (7L, false), (7L, true), (7L, false))) ===
      ((2L, 2L, 4L, 0.5)))
    // hand case with a mixed tie: scores pos {2, 3}, neg {1, 3}.
    // pairs: (2>1)=1, (2vs3)=0, (3>1)=1, (3=3)=0.5 → AUC = 2.5/4
    assert(run(Seq((2L, true), (3L, true), (1L, false), (3L, false)))._4 === 0.625)
  }

  test("rocAuc: fractional scores rank on the raw value — no cast collapses them into ties") {
    // classifier probabilities in [0,1]: 0.9/0.8 positives above
    // 0.2/0.1 negatives = perfect separation (AUC 1). A long-cast would
    // collapse all four to 0 and report the 0.5 of an all-tied pool.
    val df = Seq((0.9, true), (0.8, true), (0.2, false), (0.1, false))
      .toDF("sc", "y")
    val (nPos, nNeg, _, auc) = Quality.rocAuc(df, "sc", "y")
      .as[(Long, Long, Long, Double)].head()
    assert((nPos, nNeg, auc) === ((2L, 2L, 1.0)))
    // fractional ties are still exact: pos {0.5}, neg {0.5, 0.1} →
    // pairs (0.5 vs 0.5) = 0.5, (0.5 > 0.1) = 1 → AUC = 1.5/2
    val tied = Seq((0.5, true), (0.5, false), (0.1, false)).toDF("sc", "y")
    assert(Quality.rocAuc(tied, "sc", "y")
      .as[(Long, Long, Long, Double)].head()._4 === 0.75)
  }

  test("rocAuc: randomized brute-force parity — auc_num2 equals 2*wins + ties over all pos/neg pairs", SlowTest) {
    // fixed-seed fuzz over tie-heavy fractional scores: the integer
    // witness 2*sum(R_pos) - P(P+1) must equal the pair-counting
    // definition exactly, case by case
    val rnd = new scala.util.Random(14)
    (1 to 12).foreach { case_ =>
      val n = 5 + rnd.nextInt(60)
      // small discrete score support forces ties; quarter steps force
      // fractional values through the raw-score path
      val rows = Seq.fill(n)((rnd.nextInt(8) * 0.25, rnd.nextBoolean()))
      val pos = rows.filter(_._2).map(_._1)
      val neg = rows.filterNot(_._2).map(_._1)
      if (pos.nonEmpty && neg.nonEmpty) {
        val expectedNum2 = (for (p <- pos; q <- neg) yield
          if (p > q) 2L else if (p == q) 1L else 0L).sum
        val (nP, nN, num2, auc) = Quality.rocAuc(rows.toDF("sc", "y"), "sc", "y")
          .as[(Long, Long, Long, Double)].head()
        assert((nP, nN, num2) === ((pos.size.toLong, neg.size.toLong, expectedNum2)),
          s"case $case_: $rows")
        assert(auc === expectedNum2.toDouble / (2.0 * pos.size * neg.size))
      }
    }
  }

  // ---- Quality.quantileInterp ---------------------------------------

  test("quantileInterp: exact-hit ranks skip the lerp; fractional ranks interpolate the neighbors") {
    // n=5, values 10..50: p500 → r=2.0 exact → 30; p900 → r=3.6 →
    // 40 + 0.6·10 = 46; p990 → r=3.96 → 40 + 0.96·10 = 49.6
    val df = Seq(10.0, 20.0, 30.0, 40.0, 50.0).map(("g", _)).toDF("k", "v")
    val out = Quality.quantileInterp(df, "k", "v")
      .select("q_permille", "value").as[(Int, Double)].collect().toMap
    assert(out(500) === 30.0)
    assert(out(900) === 40.0 + 0.6 * 10.0)
    assert(out(990) === 40.0 + 0.96 * 10.0)
    // numpy parity (default 'linear'): percentile([10..50], 99) = 49.6
    assert(math.abs(out(990) - 49.6) < 1e-12)
    // duplicate values: interpolation between equal elements is exact
    val dup = Seq(1.0, 1.0, 2.0).map(("g", _)).toDF("k", "v")
    val d = Quality.quantileInterp(dup, "k", "v", Seq(500))
      .select("value").as[Double].head()
    assert(d === 1.0) // r = 1.0 exact → middle element
    // the support-selection neighbor branches: with (1,1,1,5),
    // p500 → r=1.5, both neighbors INSIDE the 1-run → exactly 1.0;
    // p750 → r=2.25, lo is the run's LAST rank, hi crosses to the next
    // support value → 1 + 0.25·(5−1) = 2.0
    val runs = Seq(1.0, 1.0, 1.0, 5.0).map(("g", _)).toDF("k", "v")
    val r2 = Quality.quantileInterp(runs, "k", "v", Seq(500, 750))
      .select("q_permille", "value").as[(Int, Double)].collect().toMap
    assert(r2(500) === 1.0 && r2(750) === 2.0)
  }

  // ---- Quality.ksTest -----------------------------------------------

  test("ksTest: separation → D=1, identity → D=0, interleave → exact fraction") {
    def run(a: Seq[Double], b: Seq[Double]): (Long, Long, Long, Double) =
      Quality.ksTest(
        (a.map(("A", _)) ++ b.map(("B", _))).toDF("g", "v"),
        "g", "v", "A", "B")
        .as[(Long, Long, Long, Double)].head()
    assert(run(Seq(1, 2, 3), Seq(4, 5, 6)) === ((3L, 3L, 9L, 1.0)))
    assert(run(Seq(1, 2, 3), Seq(1, 2, 3)) === ((3L, 3L, 0L, 0.0)))
    // A={1,3}, B={2,4}: max gap is 1/2 at v=1 and v=3
    assert(run(Seq(1, 3), Seq(2, 4)) === ((2L, 2L, 2L, 0.5)))
    // duplicated values collapse to one support point with weight
    assert(run(Seq(1, 1, 1, 2), Seq(1, 2, 2, 2)) === ((4L, 4L, 8L, 0.5)))
  }

  // ---- Audit.tableProfile -------------------------------------------

  test("tableProfile: per-column nulls/distincts/typed min-max in one pass") {
    import graft.ops.Audit
    val df = Seq(
      (1L, Option("x"), Option(2.5), Option(ts("2024-03-01 10:00:00"))),
      (2L, Option("y"), None, Option(ts("2024-03-05 10:00:00"))),
      (2L, None, Option(7.5), None))
      .toDF("id", "s", "v", "t")
    val out = Audit.tableProfile(df)
      .collect().map(r => r.getString(0) -> r).toMap
    val id = out("id")
    assert(id.getString(1) === "numeric" && id.getLong(2) === 3L &&
      id.getLong(3) === 0L && id.getLong(4) === 2L && !id.getBoolean(5))
    // uniqueness is among non-nulls: s and t each have 2 non-null,
    // 2 distinct → unique despite the null
    assert(out("s").getBoolean(5) && out("t").getBoolean(5))
    assert(id.getDouble(6) === 1.0 && id.getDouble(7) === 2.0)
    val s = out("s")
    assert(s.getString(1) === "string" && s.getLong(3) === 1L &&
      s.getLong(4) === 2L && s.getString(8) === "x" && s.getString(9) === "y")
    val v = out("v")
    assert(v.getLong(3) === 1L && v.getDouble(6) === 2.5 && v.getDouble(7) === 7.5)
    val t = out("t")
    assert(t.getString(1) === "timestamp" && t.getString(8) === "2024-03-01" &&
      t.getString(9) === "2024-03-05")
    // the exact arm is the per-column histogram form (the profileDiff
    // shape): NO multi-distinct Expand anywhere — each column's metrics
    // fold from its own groupBy(col).count() value-histogram
    assert(!Audit.tableProfile(df).queryExecution.executedPlan.toString.contains("Expand"))
    // the production arm: approx distincts in ONE pass — no Expand and
    // no per-column Union loop — and still call the unique/non-unique
    // columns correctly here
    val approx = Audit.tableProfile(df, exactDistinct = false)
    assert(!approx.queryExecution.executedPlan.toString.contains("Expand"))
    assert(!approx.queryExecution.optimizedPlan.toString.contains("Union"))
    val av = approx.collect().map(r => r.getString(0) -> r.getBoolean(5)).toMap
    assert(!av("id") && av("t")) // t's 2 non-null values are distinct
  }

  // ---- Audit.lorenzGini ---------------------------------------------

  test("lorenzGini: uniform → 0, total concentration → (n−1)/n, envelope guard raises") {
    import graft.ops.Audit
    val uniform = (1L to 10L).map(k => ("g", k, 50L)).toDF("grp", "key", "v")
    val g0 = Audit.lorenzGini(uniform, "grp", "key", "v")
      .select("gini").as[Double].head()
    assert(g0 === 0.0)
    // one key holds everything: G = Σ(2i−n−1)c over n·total with only
    // i = n contributing → (n−1)/n
    val conc = (1L to 10L).map(k => ("g", k, if (k == 10L) 1000L else 0L))
      .toDF("grp", "key", "v")
    val g1 = Audit.lorenzGini(conc, "grp", "key", "v")
      .select("gini").as[Double].head()
    assert(g1 === 0.9)
    val huge = Seq(("g", 1L, 3000000000000000000L), ("g", 2L, 1L))
      .toDF("grp", "key", "v")
    val e = intercept[Exception] {
      Audit.lorenzGini(huge, "grp", "key", "v").collect()
    }
    assert(e.getMessage.contains("int64 envelope"))
  }

  // ---- VARIANT null-vs-missing pin ----------------------------------

  test("variant path: present-but-null and absent fields are distinguishable (the variant_extract contract)") {
    // `{"a": null}`: $.a is a VARIANT NULL (is_variant_null = true);
    // $.b is MISSING (variant_get returns SQL NULL, is_variant_null
    // false-or-null). The variant_extract gate counts on this split —
    // pin it so an engine upgrade that collapses the two fails here,
    // not in a hash mismatch downstream.
    val r = spark.sql(
      """SELECT is_variant_null(variant_get(parse_json('{"a": null}'), '$.a')) AS a_null,
        |       variant_get(parse_json('{"a": null}'), '$.b') IS NULL AS b_missing,
        |       coalesce(is_variant_null(variant_get(parse_json('{"a": null}'), '$.b')), false) AS b_not_vnull,
        |       variant_get(parse_json('{"a": 3}'), '$.a', 'bigint') AS a_typed
        |""".stripMargin).head()
    assert(r.getBoolean(0) === true)
    assert(r.getBoolean(1) === true)
    assert(r.getBoolean(2) === false)
    assert(r.getLong(3) === 3L)
  }

  // ---- Sampling.coverageSelect --------------------------------------

  test("coverageSelect: greedy prefers NEW coverage over raw size and stops when exhausted") {
    import graft.ext.Sampling
    // doc 1: 4 shingles; doc 2: 3 shingles, ALL inside doc 1's; doc 3:
    // 2 fresh shingles. Greedy must pick 1 then 3 (doc 2 gains nothing
    // despite being bigger than doc 3) and STOP — round 3 has no
    // uncovered shingle left, so k=3 yields only 2 rows.
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d e"),
      (3L, "x y z w")).toDF("doc_id", "text")
    val out = Sampling.coverageSelect(docs, k = 3)
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out === Seq((1, 1L, 4L, 4L), (2, 3L, 2L, 6L)))
  }

  test("coverageSelect: equal-gain tie goes to the smaller doc_id") {
    import graft.ext.Sampling
    val docs = Seq(
      (7L, "p q r s"), // 2 shingles
      (4L, "t u v w")) // 2 shingles, disjoint
      .toDF("doc_id", "text")
    val out = Sampling.coverageSelect(docs, k = 1)
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(out === Seq((1, 4L, 2L, 2L)))
  }

  // ---- Quality.cupedAdjust ------------------------------------------

  test("cupedAdjust: a perfectly predictive covariate removes ~all variance; theta recovers the slope") {
    // y = 3x exactly (post value = 3 × pre value per user) → theta = 3,
    // var(Y_adj) = 0, mean_y_adj = pooled-centered mean
    val pre = ts("2024-01-10 00:00:00")
    val post = ts("2024-01-20 00:00:00")
    val rows = (1L to 40L).flatMap { u =>
      val x = (u % 7 + 1).toDouble // varied pre-period value
      Seq((u, pre, x), (u, post, 3.0 * x))
    }
    val df = rows.toDF("user_id", "ts", "value")
      .withColumn("variant",
        when(col("user_id") % 2 === 0, lit("A")).otherwise(lit("B")))
    val out = Quality.cupedAdjust(df, "variant", "user_id", "value", "ts",
      "2024-01-15 00:00:00")
      .select("variant", "theta", "var_y", "var_y_adj", "var_reduction_pct")
      .as[(String, Double, Double, Double, Double)].collect().sortBy(_._1)
    assert(out.length === 2)
    out.foreach { case (_, theta, varY, varAdj, red) =>
      assert(math.abs(theta - 3.0) < 1e-12)
      assert(varY > 0.0)
      assert(math.abs(varAdj) < 1e-9 * varY)
      assert(red > 99.999)
    }
  }

  test("cupedAdjust: zero pooled var(X) → NULL theta, zero adjustment, no NaN contamination") {
    // every user has the SAME pre-period value (constant X): the theta
    // division is 0/0 — the integer witness guard must yield NULL theta
    // and pass mean/var through unadjusted instead of NaN everywhere
    val pre = ts("2024-01-10 00:00:00")
    val post = ts("2024-01-20 00:00:00")
    val rows = (1L to 20L).flatMap { u =>
      Seq((u, pre, 5.0), (u, post, (u % 4 + 1).toDouble))
    }
    val df = rows.toDF("user_id", "ts", "value")
      .withColumn("variant",
        when(col("user_id") % 2 === 0, lit("A")).otherwise(lit("B")))
    val out = Quality.cupedAdjust(df, "variant", "user_id", "value", "ts",
      "2024-01-15 00:00:00")
      .select("variant", "theta", "mean_y", "mean_y_adj", "var_y", "var_y_adj")
      .as[(String, Option[Double], Double, Double, Double, Double)]
      .collect().sortBy(_._1)
    assert(out.length === 2)
    out.foreach { case (_, theta, meanY, meanAdj, varY, varAdj) =>
      assert(theta.isEmpty)              // NULL, not NaN/Inf
      assert(meanAdj === meanY)          // zero adjustment
      assert(varAdj === varY)
      assert(!meanAdj.isNaN && !varAdj.isNaN)
    }
  }
}
