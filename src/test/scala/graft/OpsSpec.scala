package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Enrich
import graft.session.{Sessionize, StateOps}

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

class OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("classifyDevice covers all reference branches in order") {
    val cases = Seq(
      ("Mozilla/5.0 (Windows NT 10.0)", "Windows PC"),
      ("Mozilla/5.0 (Linux; android 13)", "Android"),
      ("Mozilla/5.0 (iPhone; CPU iPhone OS)", "iPhone"),
      ("Mozilla/5.0 (iPad; CPU OS)", "iPad"),
      ("Mozilla/5.0 (Macintosh; Intel Mac OS X)", "iMac"),
      ("curl/8.0", "Others"),
      // Windows wins over Mac when both appear (reference match order)
      ("Windows on Mac", "Windows PC"))
    val got = cases.toDF("ua", "expected")
      .withColumn("device", Enrich.classifyDevice(col("ua")))
      .collect()
    got.foreach(r => assert(r.getString(2) === r.getString(1), r.getString(0)))
  }

  test("normalizePlatform: only exact MOBILE stays MOBILE") {
    val got = Seq("MOBILE", "mobile", "WEB", "ANDROID", "")
      .toDF("p").withColumn("n", Enrich.normalizePlatform(col("p")))
      .as[(String, String)].collect().toMap
    assert(got("MOBILE") === "MOBILE")
    assert(got("mobile") === "WEB")
    assert(got("ANDROID") === "WEB")
  }

  test("session gap: exactly 30 min does NOT open a session; 30min+1s does") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 7L),
      (2L, ts("2024-01-01 00:30:00"), 7L), // exactly 30 min later
      (3L, ts("2024-01-01 01:00:01"), 7L)  // 30 min + 1 s later
    ).toDF("event_id", "ts", "user_id")
    val seqs = Sessionize.withSessionIds(df)
      .orderBy("event_id").select("session_seq").as[Long].collect()
    assert(seqs.toSeq === Seq(1L, 1L, 2L))
  }

  test("sessionStats rolls up counts, bounds and purchase revenue") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 7L, "purchase", 10.10),
      (2L, ts("2024-01-01 00:10:00"), 7L, "click", 99.0),
      (3L, ts("2024-01-01 02:00:00"), 7L, "purchase", 5.25)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val stats = Sessionize.sessionStats(Sessionize.withSessionIds(df))
      .orderBy("session_id").collect()
    assert(stats.length === 2)
    assert(stats(0).getAs[Long]("n_events") === 2)
    assert(stats(0).getAs[Double]("purchase_value") === 10.10)
    assert(stats(0).getAs[Long]("duration_us") === 600000000L)
  }

  test("changeDetect flags only real transitions, never the first row") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 7L, "view"),
      (2L, ts("2024-01-01 00:01:00"), 7L, "view"),
      (3L, ts("2024-01-01 00:02:00"), 7L, "click")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val flags = StateOps.changeDetect(df, "event_type")
      .orderBy("event_id").select("event_type_changed").as[Long].collect()
    assert(flags.toSeq === Seq(0L, 0L, 1L))
  }

  test("carryForward remembers last purchase value across later events") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 7L, "purchase", 10.0),
      (2L, ts("2024-01-01 00:01:00"), 7L, "click", 1.0),
      (3L, ts("2024-01-01 00:02:00"), 7L, "purchase", 20.0),
      (4L, ts("2024-01-01 00:03:00"), 7L, "view", 2.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = StateOps.carryForwardLastPurchase(df)
      .orderBy("event_id").select("last_purchase_value").as[Option[Double]].collect()
    assert(got.toSeq === Seq(Some(10.0), Some(10.0), Some(20.0), Some(20.0)))
  }

  test("newVsReturning: no prior state => is_new") {
    val incoming = Seq((10L, ts("2024-01-02 00:00:00"), 1L), (11L, ts("2024-01-02 00:00:00"), 2L))
      .toDF("event_id", "ts", "user_id")
    val state = Seq((1L, ts("2024-01-01 00:00:00"))).toDF("u_id", "state_ts")
    val got = StateOps.newVsReturning(incoming, state)
      .orderBy("event_id").select("is_new").as[Long].collect()
    assert(got.toSeq === Seq(0L, 1L))
  }

  test("asof join: latest prior right row, equality matches, no prior -> null") {
    val left = Seq(
      (1L, ts("2024-01-01 00:00:00"), 7L), // before any snapshot
      (2L, ts("2024-01-02 00:00:00"), 7L), // equality tie with snap A
      (3L, ts("2024-01-03 12:00:00"), 7L), // after snaps A and B -> B
      (4L, ts("2024-01-01 00:00:00"), 8L)  // other key, no snaps at all
    ).toDF("event_id", "ts", "user_id")
    val right = Seq(
      (7L, ts("2024-01-02 00:00:00"), 10.0), // A
      (7L, ts("2024-01-03 00:00:00"), 20.0)  // B
    ).toDF("user_id", "snap_ts", "snap_value")
    val got = graft.ops.AsOfJoin
      .asof(left, right, "user_id", "ts", "snap_ts", Seq("snap_value"))
      .orderBy("event_id")
      .select("asof_snap_value").collect()
      .map(r => Option(r.get(0)).map(_.asInstanceOf[Double]))
    assert(got.toSeq === Seq(None, Some(10.0), Some(20.0), None))
  }

  test("kAnonymize: surviving classes have >= k members; rare combos merge into '*'") {
    import graft.ops.Quality
    val df = (Seq.fill(10)(("US", "A")) ++ Seq.fill(9)(("US", "B")) ++
      Seq(("FR", "A"), ("FR", "B"), ("DE", "A")))
      .toDF("country", "seg")
    val r = Quality.kAnonymize(df, Seq("country", "seg"), k = 5).collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getLong(2)).toMap
    assert(r(("US", "A")) === 10L && r(("US", "B")) === 9L)
    assert(r(("*", "*")) === 3L) // the three rare combos pooled
    assert(r.size === 3)
    // non-suppressed classes all clear k
    r.foreach { case ((c, s), n) => if (c != "*") assert(n >= 5L) }
  }

  test("lDiversity: recursive (c,l) arithmetic pinned on a hand-built class mix") {
    import graft.ops.Quality
    val df = (
      // class X: counts 6/3/2/1 desc — r1=6, tail(l=3)=2+1=3 ⇒ 6 < 2·3
      // is FALSE (strict), distinct=4 ≥ 3 ⇒ distinct ok, recursive not
      Seq.fill(6)(("X", "a")) ++ Seq.fill(3)(("X", "b")) ++
        Seq.fill(2)(("X", "c")) ++ Seq(("X", "d")) ++
      // class Y: 2/2/2 — r1=2, tail=2, 2 < 4 ⇒ both ok
      Seq.fill(2)(("Y", "a")) ++ Seq.fill(2)(("Y", "b")) ++ Seq.fill(2)(("Y", "c")) ++
      // class Z: homogeneous — k-large yet zero diversity, both fail
      Seq.fill(8)(("Z", "a"))
    ).toDF("qi", "sens")
    val r = Quality.lDiversity(df, Seq("qi"), "sens", l = 3, c = 2).collect()
      .map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4),
          x.getInt(5), x.getInt(6))).toMap
    assert(r("X") === ((12L, 4L, 6L, 3L, 1, 0)))
    assert(r("Y") === ((6L, 3L, 2L, 2L, 1, 1)))
    assert(r("Z") === ((8L, 1L, 8L, 0L, 0, 0)))
  }

  test("tCloseness: exact total-variation numerators; mirror class scores 0") {
    import graft.ops.Quality
    // global: a=20, b=2, c=2, N=24 (classes contribute to it!).
    // R (10a,1b,1c, n=12) mirrors the global mix exactly -> num 0.
    // P (2a,1b,1c, n=4): |2·24−20·4|+|1·24−2·4|+|1·24−2·4| = 32+16+16
    //   = 64, EMD = 64/(2·4·24) = 1/3 > 1/4 -> fails at t = 1/4.
    // Q (8a, n=8): 32+16+16 = 64, EMD = 64/384 = 1/6 <= 1/4 -> passes.
    val df = (Seq.fill(2)(("P", "a")) ++ Seq(("P", "b"), ("P", "c")) ++
      Seq.fill(8)(("Q", "a")) ++
      Seq.fill(10)(("R", "a")) ++ Seq(("R", "b"), ("R", "c")))
      .toDF("qi", "sens")
    val r = Quality.tCloseness(df, Seq("qi"), "sens", tNum = 1, tDen = 4)
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getString(2), x.getInt(3))).toMap
    assert(r("P") === ((4L, "64", 0)))
    assert(r("Q") === ((8L, "64", 1)))
    assert(r("R") === ((12L, "0", 1)))
  }

  test("dqQuarantine: failing rows carry ALL their violated rules; clean rows never appear") {
    import graft.ops.Quality
    val dim = Seq(1L, 2L).toDF("k")
    val df = Seq(
      (10L, Some(1L), 5.0, "ok"),        // clean
      (11L, None, 5.0, "ok"),            // null fk
      (12L, Some(9L), -1.0, "bad row"),  // orphan fk + range + regex: 3 rules
      (13L, Some(2L), 5.0, "ok"),        // dup key with 14
      (13L, Some(2L), 5.0, "ok"))
      .toDF("id", "fk", "v", "s")
    val out = Quality.dqQuarantine(df, Seq(
      Quality.NotNull("fk"),
      Quality.InRange("v", 0, 10),
      Quality.Matches("s", "[a-z]+"),
      Quality.Unique(Seq("id")),
      Quality.RefIntegrity("fk", dim, "k")))
      .collect()
    val byId = out.groupBy(_.getLong(0))
    assert(!byId.contains(10L))
    assert(byId(11L).head.getSeq[String](4) === Seq("not_null:fk"))
    assert(byId(12L).head.getSeq[String](4).sorted ===
      Seq("in_range:v", "matches:s", "ref:fk"))
    assert(byId(13L).length === 2)
    byId(13L).foreach(r => assert(r.getSeq[String](4) === Seq("unique:id")))
  }

  test("asofForward: next right row, equality matches, tolerance nulls stale matches") {
    val left = Seq(
      (1L, ts("2024-01-01 00:00:00"), 7L), // next snap A is 1 day out -> in tol
      (2L, ts("2024-01-02 00:00:00"), 7L), // equality tie with snap A
      (3L, ts("2024-01-02 12:00:00"), 7L), // next is B, 12h out -> in tol
      (4L, ts("2024-01-03 00:00:01"), 7L), // nothing after -> null
      (5L, ts("2023-12-25 00:00:00"), 7L)  // next is A but 8 days out -> tol nulls it
    ).toDF("event_id", "ts", "user_id")
    val right = Seq(
      (7L, ts("2024-01-02 00:00:00"), 10.0), // A
      (7L, ts("2024-01-03 00:00:00"), 20.0)  // B
    ).toDF("user_id", "snap_ts", "snap_value")
    val got = graft.ops.AsOfJoin
      .asofForward(left, right, "user_id", "ts", "snap_ts", Seq("snap_value"),
        tolMicros = Some(86400000000L))
      .orderBy("event_id")
      .select("asof_snap_value").collect()
      .map(r => Option(r.get(0)).map(_.asInstanceOf[Double]))
    assert(got.toSeq === Seq(Some(10.0), Some(10.0), Some(20.0), None, None))
    // without tolerance, event 5 reaches 8 days forward to snap A
    val noTol = graft.ops.AsOfJoin
      .asofForward(left, right, "user_id", "ts", "snap_ts", Seq("snap_value"))
      .orderBy("event_id")
      .select("asof_snap_value").collect()
      .map(r => Option(r.get(0)).map(_.asInstanceOf[Double]))
    assert(noTol.toSeq === Seq(Some(10.0), Some(10.0), Some(20.0), None, Some(10.0)))
  }

  test("stateSnapshot keeps exactly the latest row per user") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 7L, "a"),
      (2L, ts("2024-01-01 00:05:00"), 7L, "b"),
      (3L, ts("2024-01-01 00:05:00"), 8L, "c")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = StateOps.stateSnapshot(df)
      .orderBy("user_id").select("event_type").as[String].collect()
    assert(got.toSeq === Seq("b", "c"))
  }

  test("sql_interface is self-sufficient in a fresh session (no conf order-dependence)") {
    // registering the raw events parquet reads a TIMESTAMP(NANOS) footer,
    // which throws unless the legacy nanos conf is set — before the fix
    // this query only worked if an earlier query had set it via
    // Tables.events. Simulate a fresh session by unsetting the conf.
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    val n = SparkEntry.queries("sql_interface")(spark, "/root/testdata/sf0.001").count()
    assert(n > 0)
  }

  test("madOutliers: MAD ignores a massive outlier the mean would chase") {
    val r = SparkEntry.queries("mad_outliers")(spark, "/root/testdata/sf0.001").collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      assert(x.getDouble(3) >= 0.0)              // mad >= 0
      assert(x.getLong(4) <= x.getLong(1) / 2)   // breakdown point: <50% flagged
    }
  }

  test("denseIds: contiguous 0..n-1 in key order, invariant to input partitioning") {
    import spark.implicits._
    val keys = scala.util.Random.shuffle((1L to 1000L).map(_ * 3).toList)
    val df = keys.toDF("k")
    val got = graft.ops.Functions.denseIds(df, "k", partitions = 7)
      .orderBy("k").select("k", "id").as[(Long, Long)].collect()
    assert(got.map(_._2).toSeq === (0L until 1000L))
    assert(got.map(_._1).toSeq === (1L to 1000L).map(_ * 3))
    // numbering is a pure function of the key order — physical layout
    // (partition count, row placement) must not leak into a single id
    val again = graft.ops.Functions.denseIds(df.repartition(13), "k", partitions = 3)
      .orderBy("k").select("k", "id").as[(Long, Long)].collect()
    assert(again.toSeq === got.toSeq)
  }

  test("winsorize: bounds ordered; clamped tails hold at most the 1% mass each") {
    val r = SparkEntry.queries("winsorize")(spark, "/root/testdata/sf0.001").collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      val (n, nFloor, nCeil) = (x.getLong(1), x.getLong(2), x.getLong(3))
      assert(x.getDouble(4) <= x.getDouble(5)) // q01 <= q99
      // strictly-outside counts are bounded by the tail mass (ceil of 1%)
      assert(nFloor <= n / 100 + 1, s"floor $nFloor of $n")
      assert(nCeil <= n / 100 + 1, s"ceil $nCeil of $n")
      // the winsorized sum is within the clamp bounds times n
      val ws = x.getDecimal(6).doubleValue()
      assert(ws >= x.getDouble(4) * n && ws <= x.getDouble(5) * n)
    }
  }

  test("funnelSteps: ordering and window constraints gate each stage") {
    val now = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 ${10 + m / 60}%02d:${m % 60}%02d:00")
    val df = Seq(
      // user 1: full ordered funnel inside the window
      (1L, now(0), 1L, "view", 1.0, "{}"),
      (2L, now(5), 1L, "click", 1.0, "{}"),
      (3L, now(9), 1L, "purchase", 5.0, "{}"),
      // user 2: click BEFORE the first view -> stage stops at 1
      (4L, now(5), 2L, "click", 1.0, "{}"),
      (5L, now(9), 2L, "view", 1.0, "{}"),
      // user 3: click arrives outside the conversion window -> stage 1
      (6L, now(0), 3L, "view", 1.0, "{}"),
      (7L, java.sql.Timestamp.valueOf("2024-01-03 10:00:00"), 3L, "click", 1.0, "{}"),
      // user 4: never viewed -> absent from the funnel entirely
      (8L, now(0), 4L, "purchase", 9.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = graft.session.StateOps.funnelSteps(df).collect()
      .map(x => x.getLong(0) -> x.getInt(4)).toMap
    assert(r === Map(1L -> 3, 2L -> 1, 3L -> 1))
  }

  test("attribution: first/last touch inside the lookback; unattributed purchases keep NULLs") {
    val at = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 ${10 + m / 60}%02d:${m % 60}%02d:00")
    val df = Seq(
      // user 1: click then view precede the purchase inside the hour
      (1L, at(0), 1L, "click", 1.0, "{}"),
      (2L, at(30), 1L, "view", 1.0, "{}"),
      (3L, at(45), 1L, "purchase", 5.0, "{}"),
      // user 1: second purchase 2h later — both touches outside the lookback
      (4L, at(165), 1L, "purchase", 5.0, "{}"),
      // user 2: the only touch comes AFTER the purchase -> unattributed
      (5L, at(0), 2L, "purchase", 5.0, "{}"),
      (6L, at(5), 2L, "click", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = graft.session.StateOps.attribution(df).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r.keySet === Set(3L, 4L, 5L))
    assert(r(3L).getLong(2) === 1L)   // first touch = the click
    assert(r(3L).getLong(3) === 2L)   // last touch = the view
    assert(r(3L).getString(4) === "view")
    assert(r(3L).getDouble(5) === 900.0) // 15 minutes
    assert(r(4L).isNullAt(2) && r(4L).isNullAt(3)) // lookback expired
    assert(r(5L).isNullAt(2) && r(5L).isNullAt(3)) // touch after purchase
  }

  test("rfmSegments: boundary bucketing puts best metrics in segment 1") {
    val t = (d: Int) => java.sql.Timestamp.valueOf(f"2024-01-${d}%02d 00:00:00")
    // 4 users with strictly increasing recency and decreasing value
    val df = (1 to 4).flatMap { u =>
      Seq.fill(5 - u)((u * 100L, t(u * 5), u.toLong, "purchase", (5 - u) * 10.0, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = graft.session.StateOps.rfmSegments(df).collect()
      .map(x => x.getLong(0) -> ((x.getInt(4), x.getInt(5), x.getInt(6)))).toMap
    // user 4 is most recent (r_seg 1) but lowest frequency/monetary (f/m 4);
    // user 1 the reverse
    assert(r(4L)._1 === 1 && r(1L)._1 === 4)
    assert(r(1L)._2 === 1 && r(4L)._2 === 4)
    assert(r(1L)._3 === 1 && r(4L)._3 === 4)
  }

  test("applyChangelog: latest-wins MERGE over every op mix") {
    import graft.ops.Cdc
    val snap = Seq(
      (1L, "alice", 10L), // untouched
      (2L, "bob", 20L), // single update
      (3L, "carol", 30L), // two updates — v2 wins
      (4L, "dave", 40L), // delete
      (5L, "erin", 50L) // delete then later update — survives updated
    ).toDF("id", "name", "score")
    val chg = Seq(
      (2L, "bob2", 21L, "U", 1L),
      (3L, "carol1", 31L, "U", 1L),
      (3L, "carol2", 32L, "U", 2L),
      (4L, "dave", 40L, "D", 1L),
      (5L, "erin", 50L, "D", 1L),
      (5L, "erin2", 52L, "U", 5L),
      (6L, "frank", 60L, "I", 1L)
    ).toDF("id", "name", "score", "op", "version")
    val out = Cdc.applyChangelog(snap, chg, "id")
      .orderBy("id").as[(Long, String, Long)].collect().toSeq
    assert(out === Seq(
      (1L, "alice", 10L),
      (2L, "bob2", 21L),
      (3L, "carol2", 32L),
      (5L, "erin2", 52L),
      (6L, "frank", 60L)))
    // contract guards: key must exist; op/version must not collide with data
    intercept[IllegalArgumentException] {
      Cdc.applyChangelog(snap, chg, "missing")
    }
    intercept[IllegalArgumentException] {
      Cdc.applyChangelog(snap.withColumn("op", lit("x")), chg, "id")
    }
  }

  test("skewReport: magnitude buckets partition keys and rows; NULL groups as a (hot) key") {
    import graft.ops.Skew
    val rows =
      Seq.fill(9)(Option(1L)) ++ // hot key: c=9 -> mag 3
        Seq.fill(8)(Option.empty[Long]) ++ // hot NULL: c=8 -> mag 3
        Seq.fill(2)(Option(2L)) ++ // c=2 -> mag 1
        Seq(Option(3L), Option(4L), Option(5L)) // three singletons -> mag 0
    val out = Skew.skewReport(rows.toDF("k"), "k")
      .orderBy("freq_mag").as[(Int, Long, Long)].collect().toSeq
    assert(out === Seq((0, 3L, 3L), (1, 1L, 2L), (3, 2L, 17L)))
    assert(out.map(_._3).sum === rows.size)
  }

  test("joinSizeEstimate: exact inner-product size, structural overestimate, nulls excluded") {
    import graft.ops.Skew
    val left = (Seq.fill(5)(Option("a")) ++ Seq.fill(3)(Option("b")) ++
      Seq(Option("c"), Option.empty[String])).toDF("k")
    val right = (Seq.fill(2)(Option("a")) ++ Seq.fill(4)(Option("d")) ++
      Seq(Option("b"), Option.empty[String])).toDF("k")
    val out = Skew.joinSizeEstimate(left, right, "k", "k")
      .as[(Long, Long, Long, Int)].head()
    // exact = 5*2 ('a') + 3*1 ('b') = 13; NULL keys never match an equi-join
    assert(out._1 === 13L)
    assert(out._4 === 1 && out._2 >= out._1 && out._3 === out._2 - out._1)
    // disjoint key sets: exact 0, estimate still a non-negative overestimate
    val disj = Skew.joinSizeEstimate(
      left, right.select(concat(col("k"), lit("_z")).as("k")), "k", "k")
      .as[(Long, Long, Long, Int)].head()
    assert(disj._1 === 0L && disj._4 === 1)
    intercept[IllegalArgumentException](
      Skew.joinSizeEstimate(left, right, "k", "k", depth = 0))
    intercept[IllegalArgumentException](
      Skew.joinSizeEstimate(left, right, "k", "k", width = 1))
  }

  test("compactPlan: big-first contiguous bins; oversize file isolated; per-partition windows") {
    import graft.io.Maintenance
    val files = Seq(
      ("p1", 1L, 60L), ("p1", 2L, 50L), ("p1", 3L, 40L), ("p1", 4L, 30L), ("p1", 5L, 250L),
      ("p2", 6L, 10L)).toDF("part", "file", "bytes")
    // order in p1: 250,60,50,40,30; pre: 0,250,310,360,400; target 100 ->
    // bins floor(pre/100): 0,2,3,3,4 — the 250 oversize occupies slots 0-1
    val out = Maintenance.compactPlan(files, "part", "file", "bytes", targetBytes = 100L)
      .orderBy("part", "file")
      .select("part", "file", "bin_id", "bin_bytes", "bin_files")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      ("p1", 1L, 2L, 60L, 1L),
      ("p1", 2L, 3L, 90L, 2L),
      ("p1", 3L, 3L, 90L, 2L),
      ("p1", 4L, 4L, 30L, 1L),
      ("p1", 5L, 0L, 250L, 1L),
      ("p2", 6L, 0L, 10L, 1L)))
    intercept[IllegalArgumentException](
      Maintenance.compactPlan(files, "part", "file", "bytes", targetBytes = 0L))
  }

  test("langIdCalibration: buckets floor the winning score; counts reconcile with lang_id") {
    import graft.ext.TextOps
    val docs = Seq(
      (1L, "the cat is on the mat", "en"), // en_score 5/6? high bucket, correct
      (2L, "la la la la la la la la la la", "fr"), // fr/es tie -> es picked, wrong
      (3L, "der und ist das die der und", "de")).toDF("doc_id", "text", "lang")
    val cal = TextOps.langIdCalibration(docs).as[(Int, Long, Long, Double)].collect().toSeq
    assert(cal.map(_._2).sum === 3L) // every doc lands in exactly one bucket
    val correct = TextOps.langId(docs).agg(sum(col("is_correct"))).head().getLong(0)
    assert(cal.map(_._3).sum === correct)
    cal.foreach(c => assert(c._4 === c._3.toDouble / c._2.toDouble && c._1 >= 0 && c._1 <= 10))
  }

  test("sampleFixedK: exactly k rows, retry-stable, disjoint seeds give different samples") {
    import graft.ext.Sampling
    val df = (1L to 500L).map(i => (i, s"v$i")).toDF("id", "v")
    val s1 = Sampling.sampleFixedK(df, "id", 20).select("id").as[Long].collect().toSeq.sorted
    val s2 = Sampling.sampleFixedK(df, "id", 20).select("id").as[Long].collect().toSeq.sorted
    assert(s1.length === 20 && s1 === s2) // deterministic under re-execution
    val other = Sampling.sampleFixedK(df, "id", 20, seed = "other")
      .select("id").as[Long].collect().toSeq.sorted
    assert(other.length === 20 && other != s1) // seed actually steers
    // k >= n returns everything
    assert(Sampling.sampleFixedK(df.limit(5), "id", 100).count() === 5L)
    intercept[IllegalArgumentException](Sampling.sampleFixedK(df, "id", 0))
  }

  test("sessionDepthHist: depth buckets reconcile with sessions and events") {
    import graft.session.Sessionize
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    val ev = Seq(
      (1L, 1L, t(0)), (1L, 2L, t(5)), (1L, 3L, t(50)), // depths 2, 1
      (2L, 4L, t(0))) // depth 1
      .toDF("user_id", "event_id", "ts")
    val out = Sessionize.sessionDepthHist(ev).orderBy("depth")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 2L, 2L), (2L, 1L, 2L)))
    assert(out.map(_._3).sum === 4L) // every event accounted for
  }

  test("weekdayProfile: ISO dow, independence expectation, uniform data ratios 1.0") {
    import graft.ops.Quality
    // 2024-01-01 is a Monday; two types, each once per day Mon-Sun
    val rows = for {
      d <- 1 to 7; ty <- Seq("a", "b")
    } yield (ty, f"2024-01-$d%02d 12:00:00")
    val df = rows.toDF("t", "s").withColumn("ts", col("s").cast("timestamp"))
    val out = Quality.weekdayProfile(df, "t", "ts")
      .as[(String, Int, Long, Long, Long, Double, Double)].collect().toSeq
    assert(out.length === 14 && out.map(_._2).toSet === (1 to 7).toSet)
    out.foreach { r =>
      assert(r._3 === 1L && r._4 === 7L && r._5 === 2L)
      assert(r._6 === 1.0 && r._7 === 1.0) // perfectly uniform -> ratio 1
    }
    // Jan 1 2024 (Monday) must land in dow 1
    val mon = Quality.weekdayProfile(
      Seq(("x", "2024-01-01 00:00:00")).toDF("t", "s")
        .withColumn("ts", col("s").cast("timestamp")), "t", "ts").head()
    assert(mon.getInt(1) === 1)
  }

  test("bounceRate: single-event sessions count against their entry type") {
    import graft.session.Sessionize
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    val ev = Seq(
      // u1 session 1: click -> view (no bounce); session 2 (gap > 30m): click only (bounce)
      (1L, 1L, "click", t(0)), (1L, 2L, "view", t(5)), (1L, 3L, "click", t(50)),
      // u2: one single-event session entered via view (bounce)
      (2L, 4L, "view", t(0)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val out = Sessionize.bounceRate(ev).orderBy("entry_type")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(out === Seq(("click", 2L, 1L, 0.5), ("view", 1L, 1L, 1.0)))
  }

  test("conversionLag: first-from to first-to lag; converters-only; exact quantile elements") {
    import graft.session.StateOps
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, "click", t("2024-01-01 10:00:00")), (1L, "purchase", t("2024-01-01 10:10:00")),
      (2L, "click", t("2024-01-01 10:00:00")), (2L, "purchase", t("2024-01-01 10:30:00")),
      (3L, "click", t("2024-01-01 10:00:00")), // never converts
      (4L, "purchase", t("2024-01-01 09:00:00")), (4L, "click", t("2024-01-01 10:00:00"))) // converted BEFORE clicking
      .toDF("user_id", "event_type", "ts")
    val out = StateOps.conversionLag(ev, "click", "purchase", qPermille = Seq(500, 1000))
      .orderBy("q_permille").as[(String, Int, Long, Long)].collect().toSeq
    // only u1 (600s) and u2 (1800s) qualify; lower median = 600s
    assert(out === Seq(
      ("click_to_purchase", 500, 2L, 600L * 1000000L),
      ("click_to_purchase", 1000, 2L, 1800L * 1000000L)))
  }

  test("vocabGrowth: tokens charge their first doc; saturated buckets emit zeros; cum monotone") {
    import graft.ext.TextOps
    val docs = (1L to 10L).map { i =>
      (i, if (i <= 2) s"common tok$i" else "common") // new tokens only in docs 1-2
    }.toDF("doc_id", "text")
    val out = TextOps.vocabGrowth(docs, buckets = 5).orderBy("bucket")
      .as[(Int, Long, Long)].collect().toSeq
    // doc1 -> bucket 0 introduces {common, tok1}; doc2 -> bucket 0 too
    // ((2-1)*5 div 10 = 0) introduces tok2; buckets 1-4 introduce nothing
    assert(out === Seq((0, 3L, 3L), (1, 0L, 3L), (2, 0L, 3L), (3, 0L, 3L), (4, 0L, 3L)))
  }

  test("quantileElements: exact elements at ceil(q*n/1000); one window serves all quantiles") {
    import graft.ops.Quality
    val df = (1 to 10).map(i => ("g", i.toDouble)).toDF("g", "v")
    val out = Quality.quantileElements(df, "g", "v", Seq(250, 500, 900, 1000))
      .orderBy("q_permille")
      .select("q_permille", "n", "v").as[(Int, Long, Double)].collect().toSeq
    // ceil(q*10/1000): 250->3, 500->5, 900->9, 1000->10 — actual elements
    assert(out === Seq((250, 10L, 3.0), (500, 10L, 5.0), (900, 10L, 9.0), (1000, 10L, 10.0)))
    intercept[IllegalArgumentException](Quality.quantileElements(df, "g", "v", Seq(0)))
    intercept[IllegalArgumentException](Quality.quantileElements(df, "g", "v", Nil))
  }

  test("abLift: exact counts, rates, lift and pooled z on a hand case; degenerate guards NULL") {
    import graft.ops.Quality
    // A: 4 users, 1 converts; B: 4 users, 3 convert (unit dedup: user 20
    // converts twice but counts once)
    val df = (Seq((1L, false), (2L, true), (3L, false), (4L, false)).map { case (u, c) => ("A", u, c) } ++
      Seq((10L, true), (20L, true), (20L, true), (30L, true), (40L, false)).map { case (u, c) => ("B", u, c) })
      .toDF("variant", "u", "conv")
    val r = Quality.abLift(df, "variant", "u", "conv").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) === ((4L, 1L, 4L, 3L)))
    assert(r.getDouble(4) === 0.25 && r.getDouble(5) === 0.75)
    assert(r.getDouble(6) === 0.5 && r.getDouble(7) === 2.0)
    val p = 4.0 / 8.0
    val z = (0.75 - 0.25) / math.sqrt(p * (1.0 - p) * (1.0 / 4.0 + 1.0 / 4.0))
    assert(r.getDouble(8) === z)
    // all-converted pool -> z undefined, stays NULL
    val degen = Quality.abLift(
      Seq(("A", 1L, true), ("B", 2L, true)).toDF("variant", "u", "conv"),
      "variant", "u", "conv").head()
    assert(degen.isNullAt(8))
  }

  test("clusterStats: size histogram with docs and removable counts") {
    import graft.ext.Dedup
    val cc = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (6L, 6L))
      .toDF("doc_id", "component")
    val out = Dedup.clusterStats(cc).orderBy("cluster_size")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 1L, 1L, 0L), (2L, 1L, 2L, 1L), (3L, 1L, 3L, 2L)))
  }

  test("imputeMedian: lower-median fill per group; all-NULL groups stay NULL; NULL group key merges") {
    import graft.ops.Quality
    val df = Seq(
      (1L, Option("a"), Option(1.0)), (2L, Option("a"), Option(5.0)),
      (3L, Option("a"), Option(9.0)), (4L, Option("a"), Option.empty[Double]),
      (5L, Option("b"), Option(2.0)), (6L, Option("b"), Option(4.0)),
      (7L, Option("b"), Option.empty[Double]), // even count -> LOWER median 2.0
      (8L, Option("c"), Option.empty[Double]), // group with no known value
      (9L, Option.empty[String], Option(7.0)), (10L, Option.empty[String], Option.empty[Double]))
      .toDF("id", "g", "v")
    val out = Quality.imputeMedian(df, "g", "v").orderBy("id")
      .select("id", "v_imputed", "was_imputed")
      .as[(Long, Option[Double], Boolean)].collect().toSeq
    assert(out === Seq(
      (1L, Some(1.0), false), (2L, Some(5.0), false), (3L, Some(9.0), false),
      (4L, Some(5.0), true), // median of {1,5,9}
      (5L, Some(2.0), false), (6L, Some(4.0), false),
      (7L, Some(2.0), true), // lower median of {2,4}
      (8L, None, true), // nothing to impute from
      (9L, Some(7.0), false), (10L, Some(7.0), true))) // NULL group joins null-safely
  }

  test("codeDetect: symbol-charged doc flags; prose and empty don't; exact counts") {
    import graft.ext.TextOps
    val docs = Seq(
      (1L, "for (i = 0; i < n; i++) { x[i] = y; }"),
      (2L, "the quiet afternoon passed without incident"),
      (3L, "")).toDF("doc_id", "text")
    val out = TextOps.codeDetect(docs).orderBy("doc_id")
      .select("doc_id", "n_chars", "n_symbols", "n_semicolons", "is_code")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    // doc 1: symbols ( ) ; < ; = [ ] = ; { [ ] = ; } = 15? count exactly:
    // "(", "=", ";", "<", ";", ")", "{", "[", "]", "=", ";", "}" plus "++" none,
    // verify via the engine's own exact count being >= 10 and flagging
    assert(out(0)._5 && out(0)._3 >= 10L && out(0)._4 === 3L)
    assert(!out(1)._5 && out(1)._3 === 0L)
    assert(!out(2)._5 && out(2)._2 === 0L) // empty doc: no division error
    intercept[IllegalArgumentException](TextOps.codeDetect(docs, symbolFracMilli = 0))
  }

  test("featureHash: exact sparse counts; signed sums bounded by counts; dims respected") {
    import graft.ext.TextOps
    val docs = Seq((1L, "w w w zz"), (2L, "zz zz"), (3L, "")).toDF("doc_id", "text")
    val out = TextOps.featureHash(docs, dim = 16)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // doc 3 has no tokens -> no rows; per-(doc, idx) |signed| <= cnt, same parity
    assert(!out.exists(_._1 == 3L))
    out.foreach { r =>
      assert(r._2 >= 0 && r._2 < 16)
      assert(math.abs(r._4) <= r._3 && (r._4 - r._3) % 2 === 0)
    }
    // 'w' x3 in doc 1 lands in ONE bucket with cnt 3 and |signed| = 3
    assert(out.exists(r => r._1 == 1L && r._3 == 3L && math.abs(r._4) == 3L))
    intercept[IllegalArgumentException](TextOps.featureHash(docs, dim = 1))
  }

  test("joinAdvisor: every strategy branch fires on its constructed input") {
    import graft.ops.Skew
    def keys(xs: Seq[String]) = xs.map(Tuple1(_)).toDF("k")
    val small = keys(Seq("a", "b"))
    val bigFlat = keys((1 to 40).map(i => s"k$i")) // 40 distinct singletons
    val bigHot = keys(Seq.fill(40)("hot") ++ Seq("x", "y")) // one key with 2^5 < c
    def advise(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame) =
      Skew.joinAdvisor(l, r, "k", "k", broadcastRowLimit = 10, hotMagLimit = 5)
        .select("n_left", "n_right", "strategy", "output_blowup", "can_broadcast_right")
        .as[(Long, Long, String, Boolean, Boolean)].head()
    // right fits the limit -> broadcast_right
    assert(advise(bigFlat, small) === ((40L, 2L, "broadcast_right", false, true)))
    // only left fits -> broadcast_left
    assert(advise(small, bigFlat)._3 === "broadcast_left")
    // neither fits, hot key of magnitude floor(log2 40)=5 -> salted_join
    assert(advise(bigFlat, bigHot)._3 === "salted_join")
    // neither fits, flat keys -> shuffle_join
    assert(advise(bigFlat, keys((1 to 11).map(i => s"z$i")))._3 === "shuffle_join")
    // self-join of the hot side: output ~ 40^2 >> 4*(42+42) -> blowup flag
    val blow = advise(bigHot, bigHot)
    assert(blow._4 && blow._3 === "salted_join")
    intercept[IllegalArgumentException](
      Skew.joinAdvisor(small, small, "k", "k", hotMagLimit = 0))
  }

  test("freqItemsets/assocRules: hand-computed supports, Apriori prune, relative threshold") {
    import graft.ops.Mining
    // baskets 1:{a,b,c} 2:{a,b} 3:{a,b} 4:{a,c} 5:{d}; duplicate (1,c) must
    // not double-count; ratio 0.4 of 5 baskets -> min_n = 2 prunes item d
    // and pair (b,c) (support 1)
    val df = Seq((1, "a"), (1, "b"), (1, "c"), (1, "c"), (2, "a"), (2, "b"),
      (3, "a"), (3, "b"), (4, "a"), (4, "c"), (5, "d")).toDF("b", "i")
    val fi = Mining.freqItemsets(df, "b", "i", 0.4).orderBy("item_a", "item_b")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(fi === Seq(("a", "b", 3L, 0.6), ("a", "c", 2L, 0.4)))
    val ar = Mining.assocRules(df, "b", "i", 0.4).orderBy("antecedent", "consequent")
      .select("antecedent", "consequent", "pair_n", "n_ant", "n_cons", "confidence", "lift")
      .as[(String, String, Long, Long, Long, Double, Double)].collect().toSeq
    // item supports: a=4 b=3 c=2 (the (1,c) duplicate counts once);
    // lift = pair_n*5/(n_ant*n_cons)
    assert(ar === Seq(
      ("a", "b", 3L, 4L, 3L, 0.75, 15.0 / 12.0),
      ("a", "c", 2L, 4L, 2L, 0.5, 10.0 / 8.0),
      ("b", "a", 3L, 3L, 4L, 1.0, 15.0 / 12.0),
      ("c", "a", 2L, 2L, 4L, 1.0, 10.0 / 8.0)))
    intercept[IllegalArgumentException](Mining.freqItemsets(df, "b", "i", 0.0))
    intercept[IllegalArgumentException](Mining.assocRules(df, "b", "i", 1.5))
  }

  test("markovTransitions: consecutive pairs per key in (ts, tie) order; NULL keys dropped") {
    import graft.ops.Mining
    val ev = Seq(
      (Option(1L), 1L, "a"), (Option(1L), 2L, "b"), (Option(1L), 3L, "a"),
      (Option(2L), 4L, "a"), (Option(2L), 5L, "a"),
      (Option(3L), 6L, "b"), // no successor -> no transition
      (Option.empty[Long], 7L, "z")) // NULL key dropped
      .toDF("u", "eid", "t")
      .withColumn("ts", lit("2024-01-01 00:00:00").cast("timestamp")) // ties -> eid breaks
    val out = Mining.markovTransitions(ev, "u", "t", "ts", "eid")
      .orderBy("from_type", "to_type")
      .as[(String, String, Long, Long, Double)].collect().toSeq
    assert(out === Seq(("a", "a", 1L, 2L, 0.5), ("a", "b", 1L, 2L, 0.5), ("b", "a", 1L, 1L, 1.0)))
  }

  test("paretoFront: strict-dominance skyline, both-dim ties all survive, bucketed = unbucketed") {
    import graft.ops.Mining
    val df = Seq((1, 5.0, 1.0), (2, 4.0, 4.0), (3, 5.0, 1.0), (4, 5.0, 0.5),
      (5, 3.0, 5.0), (6, 2.0, 2.0), (7, 4.0, 4.0)).toDF("id", "x", "y")
    // skyline points: (5,1) ids 1,3 (id 4 dominated at same x), (4,4) ids 2,7, (3,5) id 5
    val expected = Seq(1, 2, 3, 5, 7)
    for (b <- Seq(1, 2, 64)) {
      val ids = Mining.paretoFront(df, "x", "y", buckets = b)
        .select("id").as[Int].collect().toSeq.sorted
      assert(ids === expected, s"buckets=$b")
    }
    // all-equal x degenerate bucket range; NULL dims dropped
    val deg = Seq((1, 1.0, Option(2.0)), (2, 1.0, Option(3.0)), (3, 1.0, Option.empty[Double]))
      .toDF("id", "x", "y")
    assert(Mining.paretoFront(deg, "x", "y").select("id").as[Int].collect().toSeq === Seq(2))
  }

  test("incremental agg merge: equals full recompute incl. NULL key, one-side keys, all-NULL sums") {
    import graft.ops.Incremental
    val old = Seq((Option(1), Option(10.0)), (Option(1), Option(2.0)), (Option(2), Option.empty[Double]),
      (Option(3), Option(1.0)), (Option.empty[Int], Option(9.0))).toDF("k", "v")
    val nw = Seq((Option(1), Option(5.0)), (Option(2), Option.empty[Double]),
      (Option(4), Option(7.0)), (Option.empty[Int], Option(1.0))).toDF("k", "v")
    val merged = Incremental.mergeAggState(
      Incremental.aggState(old, "k", "v"), Incremental.aggState(nw, "k", "v"))
    val full = Incremental.aggState(old.unionAll(nw), "k", "v")
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("k"), col("n"), col("sum_v").cast("string"),
        col("min_v").cast("string"), col("max_v").cast("string"))
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(canon(merged) === canon(full))
    // key 2 (all NULL values on both sides) must keep a NULL sum, not 0
    val k2 = merged.filter(col("k") === 2).head()
    assert(k2.getAs[Any]("sum_v") == null && k2.getLong(1) === 2L)
  }

  test("dpCounts: exact two-sided-geometric noise from md5 leading zeros; clamped release") {
    import graft.ops.Quality
    val df = Seq(Option("x"), Option("x"), Option("x"), Option("y"), Option.empty[String]).toDF("k")
    val out = Quality.dpCounts(df, "k").orderBy("k")
      .as[(String, Long, Long)].collect().toSeq
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def geo(s: String): Long = md5hex(s).takeWhile(_ == '0').length.toLong
    def expect(k: String, n: Long): (String, Long, Long) = {
      val noisy = n + geo(s"dp:a:$k") - geo(s"dp:b:$k")
      (k, noisy, math.max(noisy, 0L))
    }
    assert(out === Seq(expect("<NULL>", 1L), expect("x", 3L), expect("y", 1L)).sortBy(_._1))
  }

  test("kCore: synchronous peeling cascades; median-k twin matches the absolute form", SlowTest) {
    import graft.ext.Graph
    // triangle {1,2,3} + tail 3-4-5: round 1 peels 5 (deg 1), round 2
    // peels 4 (deg fell to 1) -> the 2-core is exactly the triangle
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val core = Graph.kCore(edges, k = 2, iters = 4)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(core === Seq((1L, 2L), (2L, 2L), (3L, 2L)))
    // initial degrees (2,2,3,2,1): median 2 -> kCoreMedian == kCore(k=2)
    val med = Graph.kCoreMedian(edges, iters = 4)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(med === core)
    // one round is not enough to cascade: node 4 still present after r1
    val r1 = Graph.kCore(edges, k = 2, iters = 1)
      .select("node").as[Long].collect().toSeq.sorted
    assert(r1 === Seq(1L, 2L, 3L, 4L))
    intercept[IllegalArgumentException](Graph.kCore(edges, k = 0))
    intercept[IllegalArgumentException](Graph.kCore(edges, k = 2, iters = 9))
  }

  test("goldenRecord: per-field latest non-null survives; fresher nulls don't erase") {
    import graft.ops.Cdc
    val ts0 = ts("2024-01-01 00:00:00")
    val ts1 = ts("2024-01-02 00:00:00")
    val ts2 = ts("2024-01-03 00:00:00")
    val obs = Seq(
      (1L, ts0, 1L, Option("click"), Option(5.0)),
      (1L, ts1, 2L, Option.empty[String], Option(9.0)), // fresher but type unknown
      (1L, ts2, 3L, Option("buy"), Option.empty[Double]), // freshest, value unknown
      (2L, ts0, 4L, Option.empty[String], Option.empty[Double]))
      .toDF("u", "ts", "eid", "etype", "v")
    val out = Cdc.goldenRecord(obs, "u", Seq("ts", "eid"), Seq("etype", "v"))
      .orderBy("u")
      .select("u", "n_obs", "last_ts", "etype", "v")
      .as[(Long, Long, java.sql.Timestamp, Option[String], Option[Double])]
      .collect().toSeq
    assert(out === Seq(
      (1L, 3L, ts2, Some("buy"), Some(9.0)), // v from ts1, etype from ts2
      (2L, 1L, ts0, None, None))) // never-known fields stay NULL
    intercept[IllegalArgumentException](Cdc.goldenRecord(obs, "u", Nil, Seq("v")))
  }

  test("cusumDrift: integer-exact scaled CUSUM; last prefix is 0; flag fires on a shift") {
    import graft.ops.Quality
    // type 'a' counts by day: 1, 1, 10 -> D=3 total=12; scaled devs
    // -9,-9,+18; cusum -9,-18,0 -> |−18| > 12 flags day 2 only
    val rows =
      Seq.fill(1)(("a", "2024-01-01 01:00:00")) ++
        Seq.fill(1)(("a", "2024-01-02 01:00:00")) ++
        Seq.fill(10)(("a", "2024-01-03 01:00:00"))
    val df = rows.toDF("t", "s").withColumn("ts", col("s").cast("timestamp"))
    val out = Quality.cusumDrift(df, "t", "ts")
      .orderBy("day")
      .select("n", "n_days", "total", "cusum_scaled", "drift_flag")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(out === Seq(
      (1L, 3L, 12L, -9L, false),
      (1L, 3L, 12L, -18L, true),
      (10L, 3L, 12L, 0L, false)))
    intercept[IllegalArgumentException](Quality.cusumDrift(df, "t", "ts", threshMult = 0))
  }

  test("seriesCorrelation: hand-computed pair matrix; zero-fill makes a " +
    "partial series correlate by volume; constant series gives NULL r") {
    import graft.ops.Quality
    // daily counts over 3 days: a=(1,2,3) b=(2,4,6) c=(3,2,1)
    // d=(2,2,2) constant, e=(5,0,0) via zero-fill (day-1-only type)
    def mk(t: String, perDay: Seq[Int]) = perDay.zipWithIndex.flatMap {
      case (n, i) => Seq.fill(n)((t, f"2024-01-0${i + 1} 01:00:00"))
    }
    val df = (mk("a", Seq(1, 2, 3)) ++ mk("b", Seq(2, 4, 6)) ++
      mk("c", Seq(3, 2, 1)) ++ mk("d", Seq(2, 2, 2)) ++ mk("e", Seq(5)))
      .toDF("t", "s").withColumn("ts", col("s").cast("timestamp"))
    val out = Quality.seriesCorrelation(df, "t", "ts")
      .select("type_a", "type_b", "n_days", "corr_num", "var_a", "var_b", "pearson_r")
      .as[(String, String, Long, Long, Long, Long, Option[Double])]
      .collect().map(r => ((r._1, r._2), r)).toMap
    assert(out.size === 10) // C(5,2) pairs, all emitted
    // a vs b: perfectly proportional -> r = 1 exactly
    assert(out(("a", "b"))._7 === Some(1.0))
    // a vs c: mirrored -> r = -1
    assert(out(("a", "c"))._7 === Some(-1.0))
    // constant d: var_b = 0 -> NULL r, row still present
    assert(out(("a", "d"))._6 === 0L && out(("a", "d"))._7 === None)
    // e zero-fills to (5,0,0): num = 3*5-6*5 = -15, var_a = 6, var_e = 50,
    // r = -15/sqrt(300) = -0.866025 (6dp)
    assert(out(("a", "e")) === (("a", "e", 3L, -15L, 6L, 50L, Some(-0.866025))))
  }

  test("autocorrelation: integer-exact ACF witnesses; 1..5 gives r1=0.4, r2=-0.1") {
    import graft.ops.Quality
    // one event on day d repeated n(d) times: counts 1,2,3,4,5
    val rows = (1 to 5).flatMap(d =>
      Seq.fill(d)(("a", f"2024-01-0$d 01:00:00")))
    val df = rows.toDF("t", "s").withColumn("ts", col("s").cast("timestamp"))
    val out = Quality.autocorrelation(df, "t", "ts", maxLag = 3)
      .orderBy("lag")
      .select("lag", "n_days", "acf_num", "acf_den", "acf")
      .as[(Int, Long, Long, Long, Double)].collect().toSeq
    // n=5 S=15 Q=55: den = 5*(275-225) = 250
    // lag1: C=40 A=10 B=14 -> num = 1000-1800+900 = 100 -> 0.4
    // lag2: C=26 A=6  B=12 -> num = 650-1350+675 = -25 -> -0.1
    // lag3: C=1*4+2*5=14 A=3 B=9 -> num = 350-900+450 = -100 -> -0.4
    assert(out === Seq(
      (1, 5L, 100L, 250L, 0.4),
      (2, 5L, -25L, 250L, -0.1),
      (3, 5L, -100L, 250L, -0.4)))
    // constant series: den = 0 -> no rows
    val const = Seq.fill(3)("b").zipWithIndex
      .map { case (t, i) => (t, f"2024-01-0${i + 1} 01:00:00") }
      .toDF("t", "s").withColumn("ts", col("s").cast("timestamp"))
    assert(Quality.autocorrelation(const, "t", "ts").count() === 0)
    intercept[IllegalArgumentException](
      Quality.autocorrelation(df, "t", "ts", maxLag = 0))
  }

  test("seasonalDecompose: periodic series decomposes to zero residual") {
    import graft.ops.Quality
    // 14 days from Mon 2024-01-01: weekly pattern 10,10,10,10,10,20,30
    val pattern = Seq(10, 10, 10, 10, 10, 20, 30)
    val rows = (0 until 14).flatMap { i =>
      val day = java.time.LocalDate.of(2024, 1, 1).plusDays(i)
      Seq.fill(pattern(i % 7))(("a", s"$day 01:00:00"))
    }
    val df = rows.toDF("t", "s").withColumn("ts", col("s").cast("timestamp"))
    val out = Quality.seasonalDecompose(df, "t", "ts")
      .orderBy("day")
      .select("dow", "n", "trend_sum7", "seas_num", "seas_den", "seasonal", "residual")
      .as[(Int, Long, Long, Long, Long, Double, Double)].collect().toSeq
    // full ±3 windows exist for days 4..11 only (8 rows), every window
    // holds one full period -> trend_sum7 = 100 everywhere
    assert(out.size === 8)
    assert(out.forall(_._3 === 100L))
    // Sunday (dow 7, n=30): detrended 7*30-100 = 110, one observation
    val sun = out.find(_._1 === 7).get
    assert(sun._4 === 110L && sun._5 === 1L && sun._6 === 110.0 / 7.0)
    // a perfectly periodic series has zero residual everywhere
    assert(out.forall(r => math.abs(r._7) < 1e-12))
  }

  test("targetEncode: out-of-fold counts exclude own fold; empty OOF falls to prior") {
    import graft.ops.Features
    // cat A: fold0 = 2 rows (1 pos), fold1 = 1 row (1 pos); cat B: fold0 only
    val df = Seq(
      ("A", true, 0L), ("A", false, 0L), ("A", true, 1L), ("B", false, 0L))
      .toDF("cat", "y", "k")
    val out = Features.targetEncode(df, "cat", "y", "k", nFolds = 2, smoothing = 1)
      .orderBy("category", "fold")
      .select("category", "fold", "cnt_oof", "pos_oof", "te")
      .as[(String, Int, Long, Long, Double)].collect().toSeq
    // N=4 P=2 w=1: te = (pos_oof*4 + 2) / ((cnt_oof+1)*4)
    assert(out === Seq(
      ("A", 0, 1L, 1L, 0.75), // (1*4+2)/(2*4)
      ("A", 1, 2L, 1L, 0.5), // (1*4+2)/(3*4)
      ("B", 0, 0L, 0L, 0.5))) // empty OOF -> exactly the prior P/N
    intercept[IllegalArgumentException](
      Features.targetEncode(df, "cat", "y", "k", nFolds = 1))
  }

  test("quantileNormalize: maps within-group ranks onto exact pooled elements") {
    import graft.ops.Features
    val df = Seq(
      ("g1", 1.0, 1L), ("g1", 2.0, 2L), ("g1", 3.0, 3L), ("g1", 4.0, 4L),
      ("g2", 10.0, 5L), ("g2", 20.0, 6L)).toDF("g", "v", "id")
    val out = Features.quantileNormalize(df, "g", "v", "id", partitions = 2)
      .orderBy("grp", "rank_in_group")
      .select("grp", "rank_in_group", "global_rank", "normalized")
      .as[(String, Long, Long, Double)].collect().toSeq
    // pooled sorted: 1,2,3,4,10,20 (N=6); rank r of n maps to ceil(r*6/n)
    assert(out === Seq(
      ("g1", 1L, 2L, 2.0), ("g1", 2L, 3L, 3.0),
      ("g1", 3L, 5L, 10.0), ("g1", 4L, 6L, 20.0),
      ("g2", 1L, 3L, 3.0), ("g2", 2L, 6L, 20.0)))
    // the top of every group maps to the pooled maximum
    assert(out.filter(r => r._2 == (if (r._1 == "g1") 4L else 2L))
      .forall(_._4 === 20.0))
  }

  test("profileDiff: exact per-column metrics and integer-exact verdict flags") {
    import graft.ops.Quality
    val before = Seq((Option(1), Option("a")), (Option(2), Option("b")),
      (Option.empty[Int], Option("b"))).toDF("x", "y")
    val after = Seq((Option(1), Option("a")), (Option(3), Option.empty[String]),
      (Option.empty[Int], Option.empty[String])).toDF("x", "y")
    val out = Quality.profileDiff(before, after, Seq("x", "y"))
      .orderBy("col_name")
      .select("col_name", "null_n_before", "null_n_after",
        "distinct_n_before", "distinct_n_after",
        "min_before", "max_after",
        "distinct_changed", "range_changed", "null_rate_up")
      .as[(String, Long, Long, Long, Long, String, String, Boolean, Boolean, Boolean)]
      .collect().toSeq
    assert(out === Seq(
      ("x", 1L, 1L, 2L, 2L, "1", "3", false, true, false),
      ("y", 0L, 2L, 2L, 1L, "a", "a", true, true, true)))
    intercept[IllegalArgumentException](Quality.profileDiff(before, after, Nil))
  }

  test("bpeFertility: per-lang totals reconcile with the per-doc encode") {
    import graft.ext.Bpe
    val docs = Seq(
      (1L, "the cat sat on the mat", "en"),
      (2L, "a cat ran to the mat", "en"),
      (3L, "der hund lief", "de")).toDF("doc_id", "text", "lang")
    val fert = Bpe.bpeFertility(docs).orderBy("lang")
      .as[(String, Long, Long, Double)].collect().toSeq
    // reconciliation: fertility totals == per-doc encode totals per lang
    val enc = Bpe.bpeEncodeDocs(docs)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .groupBy(col("lang"))
      .agg(sum(col("n_words")).as("w"), sum(col("n_subwords")).as("s"))
      .orderBy("lang")
      .as[(String, Long, Long)].collect().toSeq
    assert(fert.map(f => (f._1, f._2, f._3)) === enc)
    fert.foreach { f =>
      assert(f._4 === f._3.toDouble / f._2.toDouble)
      assert(f._4 >= 1.0) // a word is at least one subword
    }
    intercept[IllegalArgumentException](Bpe.bpeFertility(docs, iters = 0))
  }

  test("itemCooccurrence: hand-computed cosine neighbors; deterministic top-k cut") {
    import graft.ops.Mining
    // baskets: {a,b} x3, {a,c} x1, {b,c} x1 -> counts a=4 b=4 c=2
    // cosines: (a,b)=3/4, (a,c)=1/sqrt(8), (b,c)=1/sqrt(8)
    val df = Seq((1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "b"),
      (4, "a"), (4, "c"), (5, "b"), (5, "c")).toDF("b", "i")
    val out = Mining.itemCooccurrence(df, "b", "i", minSupportRatio = 0.2, topK = 1)
      .orderBy("item")
      .select("item", "neighbor", "pair_n", "cosine", "rk")
      .as[(String, String, Long, Double, Int)].collect().toSeq
    assert(out === Seq(
      ("a", "b", 3L, 0.75, 1),
      ("b", "a", 3L, 0.75, 1),
      ("c", "a", 1L, 1.0 / math.sqrt(8.0), 1))) // tie (a vs b) broken by id
    intercept[IllegalArgumentException](Mining.itemCooccurrence(df, "b", "i", topK = 0))
  }

  test("eventTrigrams: second-order paths counted per key in order; top-k total order") {
    import graft.ops.Mining
    val ev = Seq(
      (1L, 1L, "x"), (1L, 2L, "y"), (1L, 3L, "z"), (1L, 4L, "x"), // xyz, yzx
      (2L, 5L, "x"), (2L, 6L, "y"), (2L, 7L, "z"), // xyz
      (3L, 8L, "q"), (3L, 9L, "q")) // too short -> nothing
      .toDF("u", "eid", "t")
      .withColumn("ts", lit("2024-01-01 00:00:00").cast("timestamp"))
    val out = Mining.eventTrigrams(ev, "u", "t", "ts", "eid", topK = 10)
      .select("t1", "t2", "t3", "n", "rk")
      .as[(String, String, String, Long, Int)].collect().toSeq
    assert(out === Seq(("x", "y", "z", 2L, 1), ("y", "z", "x", 1L, 2)))
  }

  test("trendSlope: Theil-Sen median slope is outlier-immune; exact rational witness") {
    import graft.ops.Quality
    // type 'a': counts 1,2,3,4 on days 1-4 (perfect slope 1) plus a wild
    // outlier day 5 with 100 events — OLS would explode, Theil-Sen holds
    def ev(t: String, day: Int, n: Int) =
      Seq.fill(n)((t, f"2024-01-$day%02d 01:00:00"))
    val rows = ev("a", 1, 1) ++ ev("a", 2, 2) ++ ev("a", 3, 3) ++
      ev("a", 4, 4) ++ ev("a", 5, 100)
    val df = rows.toDF("t", "s").withColumn("ts", col("s").cast("timestamp"))
    val r = Quality.trendSlope(df, "t", "ts").head()
    // 10 pairs; 6 outlier-free pairs all have slope 1 -> median stays 1
    assert(r.getLong(1) === 5L && r.getLong(2) === 10L)
    assert(r.getLong(3).toDouble / r.getLong(4).toDouble === 1.0)
    assert(r.getDouble(5) === 1.0)
    // a two-day series: single pair IS the median, exact rational 5/1
    val two = (ev("b", 1, 2) ++ ev("b", 2, 7))
      .toDF("t", "s").withColumn("ts", col("s").cast("timestamp"))
    val r2 = Quality.trendSlope(two, "t", "ts").head()
    assert((r2.getLong(3), r2.getLong(4), r2.getDouble(5)) === ((5L, 1L, 5.0)))
  }

  test("labelAgreement: hand-computed kappa; perfect = 1; degenerate denominator -> NULL") {
    import graft.ops.Quality
    val df = Seq((Option("a"), Option("a")), (Option("a"), Option("b")),
      (Option("b"), Option("b")), (Option("b"), Option("b")),
      (Option.empty[String], Option("a")), (Option("c"), Option.empty[String]))
      .toDF("g", "p")
    val r = Quality.labelAgreement(df, "g", "p").head()
    // n=4 agree=3; marginals g{a:2,b:2} p{a:1,b:3}; pe_num=2*1+2*3=8
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ===
      ((4L, 3L, 8L, 4L, 8L)))
    assert(r.getDouble(5) === 0.5)
    val perfect = Quality.labelAgreement(
      Seq(("a", "a"), ("b", "b")).toDF("g", "p"), "g", "p").head()
    assert(perfect.getDouble(5) === 1.0)
    val degen = Quality.labelAgreement(
      Seq(("a", "a"), ("a", "a")).toDF("g", "p"), "g", "p").head()
    assert(degen.isNullAt(5))
  }

  test("autoSkewJoin: equals the plain join at every threshold; degenerate splits included") {
    import graft.ops.Skew
    // user 1 is hot (50 rows), users 2..20 have 2 rows each
    val fact = ((1 to 50).map(i => (100L + i, 1L)) ++
      (2L to 20L).flatMap(u => Seq((1000 + u * 2, u), (1001 + u * 2, u))))
      .toDF("event_id", "user_id")
    val dim = fact.groupBy("user_id").count().withColumnRenamed("count", "user_total")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "user_id", "user_total")
        .as[(Long, Long, Long)].collect().toSet
    val plain = canon(fact.join(dim, "user_id"))
    // split threshold between the hot and cold populations
    assert(canon(Skew.autoSkewJoin(fact, dim, "user_id", hotThreshold = 10)) === plain)
    // everything cold (threshold above the hottest key)
    assert(canon(Skew.autoSkewJoin(fact, dim, "user_id", hotThreshold = 1000)) === plain)
    // everything hot (threshold at the minimum multiplicity)
    assert(canon(Skew.autoSkewJoin(fact, dim, "user_id", hotThreshold = 2)) === plain)
    intercept[IllegalArgumentException](Skew.autoSkewJoin(fact, dim, "user_id", 1))
  }

  test("replicaDiff: equals snapshotDiff; identical replicas diff empty; bucket count invariant") {
    import graft.ops.Cdc
    val a = (1L to 500L).map(k => (k, s"name$k", k * 1.5)).toDF("k", "name", "bal")
    // replica: drop 7, change 13's balance, add 999
    val b = a.where(col("k") =!= 7)
      .withColumn("bal", when(col("k") === 13, col("bal") + 1).otherwise(col("bal")))
      .unionByName(Seq((999L, "name999", 0.0)).toDF("k", "name", "bal"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, String)].collect().toSet
    val got = canon(Cdc.replicaDiff(a, b, "k", buckets = 32))
    assert(got === Set((7L, "removed"), (13L, "changed"), (999L, "added")))
    assert(got === canon(Cdc.snapshotDiff(a, b, "k")))
    // bucket granularity cannot change the answer
    assert(got === canon(Cdc.replicaDiff(a, b, "k", buckets = 1)))
    assert(canon(Cdc.replicaDiff(a, a, "k", buckets = 32)) === Set.empty)
  }

  test("sessionWindowDynamic: purchase extends the gap; boundary-equal events merge") {
    def r(id: Long, t: String, u: Long, typ: String) =
      (id, java.sql.Timestamp.valueOf(t), u, typ)
    val df = Seq(
      // user 7: purchase stretches the session to cover a 55-min lull
      r(1, "2024-01-01 10:00:00", 7, "view"),     // end 10:20
      r(2, "2024-01-01 10:15:00", 7, "view"),     // merge, end 10:35
      r(3, "2024-01-01 10:30:00", 7, "purchase"), // merge, end 11:30
      r(4, "2024-01-01 11:25:00", 7, "view"),     // merge, end 11:45
      r(5, "2024-01-01 12:30:00", 7, "view"),     // > 11:45 -> new session
      // user 8: an event AT the window end merges; one second past doesn't
      r(6, "2024-01-01 10:00:00", 8, "view"),     // end 10:20
      r(7, "2024-01-01 10:20:00", 8, "view"),     // boundary: merge, end 10:40
      r(8, "2024-01-01 10:40:01", 8, "view"))     // past the end -> new
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = graft.session.Sessionize.sessionWindowDynamic(df)
      .orderBy("user_id", "s_start")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)].collect().toSeq
    def t(x: String) = java.sql.Timestamp.valueOf(x)
    assert(out === Seq(
      (7L, t("2024-01-01 10:00:00"), t("2024-01-01 11:45:00"), 4L),
      (7L, t("2024-01-01 12:30:00"), t("2024-01-01 12:50:00"), 1L),
      (8L, t("2024-01-01 10:00:00"), t("2024-01-01 10:40:00"), 2L),
      (8L, t("2024-01-01 10:40:01"), t("2024-01-01 11:00:01"), 1L)))
  }

  test("olsTrend: perfect line gives slope 2 and r2 = 1; single-day group degenerates to NULL") {
    import graft.ops.Quality
    // type a: counts 1,3,5 on consecutive days (y = 2d + 1); type b: one day
    def ev(t: String, day: String, n: Int) = Seq.fill(n)((t, s"$day 01:00:00"))
    val df = (ev("a", "2024-01-01", 1) ++ ev("a", "2024-01-02", 3) ++
      ev("a", "2024-01-03", 5) ++ ev("b", "2024-01-01", 4))
      .toDF("t", "s").withColumn("ts", col("s").cast("timestamp"))
    val out = Quality.olsTrend(df, "t", "ts").orderBy("etype")
      .as[(String, Long, Long, Long, Option[Double], Option[Double])].collect().toSeq
    assert(out === Seq(
      ("a", 3L, 12L, 6L, Some(2.0), Some(1.0)),
      ("b", 1L, 0L, 0L, None, None)))
  }

  test("ewmaFromDaily: exact dyadic numerators and one-division smoothing; per-type isolation") {
    import graft.ops.Quality
    val daily = Seq(
      ("a", "2024-01-01", 3L), ("a", "2024-01-02", 5L), ("a", "2024-01-03", 2L),
      ("b", "2024-01-01", 7L))
      .toDF("etype", "d", "n")
      .withColumn("day", col("d").cast("timestamp")).drop("d")
    val out = Quality.ewmaFromDaily(daily)
      .select("etype", "n", "ewma_num", "den_log2", "ewma")
      .orderBy("etype", "day")
      .as[(String, Long, Long, Int, Double)].collect().toSeq
    // s1=3; s2=(5+3)/2=4; s3=(2+4)/2=3 — numerators 3, 8, 12 over 2^0,2^1,2^2
    assert(out === Seq(
      ("a", 3L, 3L, 0, 3.0), ("a", 5L, 8L, 1, 4.0), ("a", 2L, 12L, 2, 3.0),
      ("b", 7L, 7L, 0, 7.0)))
  }

  test("rankEval: hand-computed precision/recall@k and MRR; ties broken by tie column; k guard") {
    import graft.ops.Quality
    // q1: rel at ranks 1,3,5 (rank 1 decided by tie asc on equal scores);
    // q2: rel at rank 3; q3: no relevant rows
    val df = Seq(
      ("q1", 10.0, 1L, true), ("q1", 10.0, 2L, false), ("q1", 8.0, 3L, true),
      ("q1", 7.0, 4L, false), ("q1", 6.0, 5L, true),
      ("q2", 5.0, 1L, false), ("q2", 4.0, 2L, false), ("q2", 3.0, 3L, true),
      ("q3", 2.0, 1L, false), ("q3", 1.0, 2L, false))
      .toDF("q", "score", "tie", "rel")
    val out = Quality.rankEval(df, "q", col("rel"), "score", "tie")
      .orderBy("k")
      .as[(Int, Long, Long, Long, Long, Double, Double, Double)].collect().toSeq
    // totals: n=3 queries, 4 relevant; hits s1=1 s3=3 s5=4;
    // mrr_num = 2520/1 + 2520/3 + 0 = 3360 -> mrr = 3360/7560 = 4/9
    val mrr = 3360.0 / 7560.0
    assert(out === Seq(
      (1, 3L, 4L, 1L, 3360L, 1.0 / 3.0, 1.0 / 4.0, mrr),
      (3, 3L, 4L, 3L, 3360L, 3.0 / 9.0, 3.0 / 4.0, mrr),
      (5, 3L, 4L, 4L, 3360L, 4.0 / 15.0, 1.0, mrr)))
    intercept[IllegalArgumentException] {
      Quality.rankEval(df, "q", col("rel"), "score", "tie", ks = Seq(11))
    }
  }

  test("rollingDistinctFrom: calendar gaps narrow the window (range frame, not rows)") {
    import graft.ops.Functions
    // d1 {a,b}; d2 {b,c}; d5 {a} — with days=3 the d5 window covers
    // d3..d5 only; a rows frame would wrongly reach back to d2/d1
    val df = Seq(
      ("2024-01-01 10:00:00", "a"), ("2024-01-01 11:00:00", "b"),
      ("2024-01-01 12:00:00", "a"), // same-day duplicate collapses
      ("2024-01-02 10:00:00", "b"), ("2024-01-02 11:00:00", "c"),
      ("2024-01-05 10:00:00", "a"))
      .toDF("s", "u").withColumn("ts", col("s").cast("timestamp"))
    val out = Functions.rollingDistinctFrom(df, "u", "ts", days = 3)
      .orderBy("day")
      .as[(java.sql.Timestamp, Long, Long, Boolean)].collect().toSeq
    def t(d: String) = java.sql.Timestamp.valueOf(d + " 00:00:00")
    assert(out === Seq(
      (t("2024-01-01"), 2L, 2L, true),
      (t("2024-01-02"), 2L, 3L, true),
      (t("2024-01-05"), 1L, 1L, true)))
  }

  test("dqReport: exact violation counts per rule; nulls pass range/regex; duplicates count in excess") {
    import graft.ops.Quality
    val dim = Seq(1L, 2L, 3L).toDF("k")
    val df = Seq(
      (1L, Option(1L), Option(5.0), Option("1-HIGH")),
      (1L, Option(2L), Option(-1.0), Option("2-LOW")), // dup key, range viol
      (2L, Option.empty[Long], Option.empty[Double], Option.empty[String]), // null fk; null range/regex PASS
      (3L, Option(9L), Option(11.0), Option("bad")), // orphan fk, range viol, regex viol
      (3L, Option(3L), Option(0.0), Option("3-OK")), // dup key (3 seen twice)
      (3L, Option(3L), Option(10.0), Option("5-X")) // key 3 thrice -> 2 excess
    ).toDF("id", "fk", "v", "tag")
    val out = Quality.dqReport(df, Seq(
      Quality.NotNull("fk"),
      Quality.InRange("v", 0, 10),
      Quality.Matches("tag", "[1-5]-[A-Z]+"),
      Quality.Unique(Seq("id")),
      Quality.RefIntegrity("fk", dim, "k")))
      .as[(String, String, Long, Long, Int)].collect().toSeq
    val byRule = out.map(r => r._1 -> r).toMap
    assert(out.forall(_._3 === 6L)) // every rule reports the full row count
    assert(byRule("not_null") === (("not_null", "fk", 6L, 1L, 0)))
    assert(byRule("in_range") === (("in_range", "v", 6L, 2L, 0)))
    assert(byRule("matches") === (("matches", "tag", 6L, 1L, 0)))
    assert(byRule("unique") === (("unique", "id", 6L, 3L, 0))) // 1 excess for key 1, 2 for key 3
    assert(byRule("ref_integrity") === (("ref_integrity", "fk", 6L, 1L, 0))) // only fk 9 orphans; the null fk is not_null's concern
    intercept[IllegalArgumentException] { Quality.dqReport(df, Seq.empty) }
  }

  test("scdHistory: validity intervals close at the next version; deletes close but never appear") {
    import graft.ops.Cdc
    val chg = Seq(
      (1L, "v1", "U", 10L), // closed by v2
      (1L, "v2", "U", 20L), // current
      (2L, "w1", "U", 5L), // closed by the delete at 9
      (2L, "w1", "D", 9L), // closes — emits nothing; key 2 has no current row
      (3L, "x1", "I", 1L) // insert-only — current from birth
    ).toDF("id", "v", "op", "version")
    val out = Cdc.scdHistory(chg, "id")
      .orderBy("id", "valid_from")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSeq
    assert(out === Seq(
      (1L, "v1", 10L, Some(20L), false),
      (1L, "v2", 20L, None, true),
      (2L, "w1", 5L, Some(9L), false),
      (3L, "x1", 1L, None, true)))
    intercept[IllegalArgumentException] {
      Cdc.scdHistory(chg.drop("op"), "id")
    }
  }

  test("time travel: scdAsOf over the history + untouched snapshot rows equals applyChangelogAsOf, at every version") {
    import graft.ops.Cdc
    val snap = Seq(
      (1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e")
    ).toDF("id", "v")
    val chg = Seq(
      (2L, "b1", "U", 10L), (2L, "b2", "U", 20L), // two updates
      (3L, "c", "D", 12L), (3L, "c2", "U", 18L), // delete then revive
      (4L, "d", "D", 15L), // delete, never revived
      (6L, "f", "I", 11L) // insert
    ).toDF("id", "v", "op", "version")
    val hist = Cdc.scdHistory(chg, "id")
    // at every version boundary (incl. between delete and revive), the
    // two time-travel formulations agree exactly
    Seq(5L, 10L, 12L, 15L, 16L, 18L, 20L, 99L).foreach { t =>
      val direct = Cdc.applyChangelogAsOf(snap, chg, "id", t)
        .orderBy("id").as[(Long, String)].collect().toSeq
      val touched = chg.where(col("version") <= t).select("id").distinct()
      val viaHist = snap.join(touched, Seq("id"), "left_anti")
        .unionByName(Cdc.scdAsOf(hist, t))
        .orderBy("id").as[(Long, String)].collect().toSeq
      assert(viaHist === direct, s"asOf=$t")
    }
    // spot-pin the delete-window state: at t=16, key 3 is deleted (its
    // revive at 18 doesn't exist yet) and key 4 is gone
    val t16 = Cdc.applyChangelogAsOf(snap, chg, "id", 16L)
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(t16 === Seq((1L, "a"), (2L, "b1"), (5L, "e"), (6L, "f")))
  }

  test("snapshotDiff: classifies added/removed/changed, drops unchanged, null-safe") {
    import graft.ops.Cdc
    val before = Seq(
      (1L, Option("a")), (2L, Option("b")), (3L, Option.empty[String]),
      (4L, Option("gone"))
    ).toDF("id", "v")
    val after = Seq(
      (1L, Option("a")), // unchanged — must not appear
      (2L, Option("B")), // changed
      (3L, Option("now")), // changed (null -> value, null-safe compare)
      (5L, Option("new")) // added
    ).toDF("id", "v")
    val out = Cdc.snapshotDiff(before, after, "id")
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(out === Seq(
      (2L, "changed"), (3L, "changed"), (4L, "removed"), (5L, "added")))
    intercept[IllegalArgumentException] {
      Cdc.snapshotDiff(before, after.withColumnRenamed("v", "w"), "id")
    }
  }

  test("every declared query constructs with the nanos conf unset (whole-class audit)", SlowTest) {
    // construction reads parquet footers and runs analysis — exactly where
    // a raw TIMESTAMP(NANOS) events read blows up. Unsetting the conf
    // before EACH query proves none relies on state another query left
    // behind (the driver may run any subset in any order).
    val failures = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
      try {
        SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").queryExecution.analyzed
        None
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
