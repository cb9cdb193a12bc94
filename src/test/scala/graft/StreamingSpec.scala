package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Sources
import graft.model.Event
import graft.session.Sessionize
import graft.streaming.{SessionizedEvent, StreamingSessionizer}

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private var n = 0
  private def run(batches: Seq[Seq[Event]]): Seq[SessionizedEvent] = {
    implicit val sqlCtx = spark.sqlContext
    n += 1
    val name = s"stream_out_$n"
    val ms = MemoryStream[Event]
    val q = StreamingSessionizer.sessionize(ms.toDS())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name).as[SessionizedEvent].collect().sortBy(_.event_id).toSeq
  }

  private def ev(id: Long, t: String, user: Long, typ: String = "view", v: Double = 1.0) =
    Event(id, ts(t), user, typ, v, "{}")

  test("state carries across micro-batches: gap opens new session") {
    val out = run(Seq(
      Seq(ev(1, "2024-01-01 00:00:00", 7), ev(2, "2024-01-01 00:10:00", 7)),
      Seq(ev(3, "2024-01-01 00:20:00", 7)),             // same session, later batch
      Seq(ev(4, "2024-01-01 01:30:00", 7))              // >30 min gap -> new session
    ))
    assert(out.map(_.session_seq) === Seq(1L, 1L, 1L, 2L))
    assert(out.map(_.session_id) === Seq("7-1", "7-1", "7-1", "7-2"))
    assert(out.map(_.session_start) === Seq(true, false, false, true))
    assert(out.map(_.is_new_user) === Seq(true, false, false, false))
    assert(out.map(_.events_in_session) === Seq(1L, 2L, 3L, 1L))
  }

  test("purchase carry-forward and change detection survive batch boundaries") {
    val out = run(Seq(
      Seq(ev(1, "2024-01-01 00:00:00", 9, "purchase", 42.5)),
      Seq(ev(2, "2024-01-01 00:05:00", 9, "click", 1.0)),
      Seq(ev(3, "2024-01-01 00:06:00", 9, "click", 1.0))
    ))
    assert(out.map(_.last_purchase_value) === Seq(Some(42.5), Some(42.5), Some(42.5)))
    assert(out.map(_.event_type_changed) === Seq(false, true, false))
  }

  test("independent users keep independent state") {
    val out = run(Seq(
      Seq(ev(1, "2024-01-01 00:00:00", 1), ev(2, "2024-01-01 00:00:00", 2)),
      Seq(ev(3, "2024-01-01 02:00:00", 1))
    ))
    assert(out.filter(_.user_id == 1).map(_.session_seq) === Seq(1L, 2L))
    assert(out.filter(_.user_id == 2).map(_.session_seq) === Seq(1L))
  }

  test("event-time timeout evicts idle keys from the state store") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = StreamingSessionizer.sessionize(
        ms.toDS().withWatermark("ts", "30 minutes").as[Event],
        eventTimeTimeout = true)
      .writeStream.format("memory").queryName("evict_out").outputMode("append").start()
    try {
      // 5 users at t0
      ms.addData((1L to 5L).map(u => ev(u, "2024-01-01 00:00:00", u)))
      q.processAllAvailable()
      // one user 2h later: watermark jumps past everyone's timeout
      ms.addData(Seq(ev(10, "2024-01-01 02:00:00", 99)))
      q.processAllAvailable()
      // next batch triggers the timed-out key cleanup
      ms.addData(Seq(ev(11, "2024-01-01 04:00:00", 98)))
      q.processAllAvailable()
      val state = q.lastProgress.stateOperators
      assert(state.length === 1)
      // users 1-5 and 99 are behind the final watermark (03:30) and get
      // evicted (Spark runs an extra no-data batch when the watermark
      // advances, firing their timeouts); only 98 may remain
      assert(state(0).numRowsTotal <= 2)
      assert(state(0).numRowsTotal >= 1)
    } finally q.stop()
  }

  test("foreachBatch fan-out writes history partitions and a compacted state snapshot") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val ms = MemoryStream[Event]
    ms.addData(Seq(
      ev(1, "2024-01-01 00:00:00", 1, "purchase", 10.0),
      ev(2, "2024-01-02 00:00:00", 1, "view", 1.0),
      ev(3, "2024-01-01 00:00:00", 2, "click", 2.0)))
    val q = graft.io.Sinks.historyAndState(
      StreamingSessionizer.sessionize(ms.toDS()),
      s"$dir/out", s"$dir/ckpt")
    q.processAllAvailable(); q.stop()
    val hist = spark.read.parquet(s"$dir/out/history")
    assert(hist.count() === 3)
    assert(hist.columns.contains("event_date")) // partition pruning column
    val state = spark.read.parquet(s"$dir/out/state/batch_0")
    assert(state.count() === 2) // one row per user
    assert(state.filter($"user_id" === 1).select("event_id").as[Long].head() === 2L)
  }

  test("sink replay with the SAME batch id is idempotent (upsert-key contract)", SlowTest) {
    // the reference's Cassandra history sink upserts on (ts, user_id)
    // (reference README:51), so a re-delivered micro-batch converges
    // instead of duplicating. foreachBatch re-delivers the last batch id
    // after a crash-before-commit — run the SAME input through a fresh
    // query with a fresh checkpoint (same batch id 0) against the SAME
    // output dir and assert history did not grow.
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_replay").toString
    val events = Seq(
      ev(1, "2024-01-01 00:00:00", 1, "purchase", 10.0),
      ev(2, "2024-01-02 00:00:00", 1, "view", 1.0),
      ev(3, "2024-01-01 00:00:00", 2, "click", 2.0))
    def deliver(ckpt: String): Unit = {
      val ms = MemoryStream[Event]
      ms.addData(events)
      val q = graft.io.Sinks.historyAndState(
        StreamingSessionizer.sessionize(ms.toDS()),
        s"$dir/out", s"$dir/$ckpt")
      q.processAllAvailable(); q.stop()
    }
    deliver("ckpt1")
    val first = spark.read.parquet(s"$dir/out/history")
      .select("event_id", "user_id", "ts").collect().toSet
    deliver("ckpt2") // replay: same rows, same batch id 0
    val replayed = spark.read.parquet(s"$dir/out/history")
      .select("event_id", "user_id", "ts").collect().toSet
    val n = spark.read.parquet(s"$dir/out/history").count()
    assert(n === 3L, s"replay duplicated history: $n rows")
    assert(replayed === first)
    // state snapshot replay overwrites its batch dir likewise
    assert(spark.read.parquet(s"$dir/out/state/batch_0").count() === 2)
  }

  test("checkpoint recovery: restart resumes offsets AND state, no loss, no duplication", SlowTest) {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val b1 = Seq(ev(1, "2024-01-01 00:00:00", 5), ev(2, "2024-01-01 00:10:00", 5))
    val b2 = Seq(ev(3, "2024-01-01 00:20:00", 5))
    // user 5's >30-min gap must open session 2 — provable only if the
    // restarted query RESTORED session state from the checkpoint (the
    // pre-restart events are never re-read)
    val b3 = Seq(ev(4, "2024-01-01 01:30:00", 5), ev(5, "2024-01-01 01:31:00", 6))

    val ref = run(Seq(b1, b2, b3)) // uninterrupted reference

    val ms = MemoryStream[Event]
    def start() = StreamingSessionizer.sessionize(ms.toDS())
      .writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append").start()
    val q1 = start()
    ms.addData(b1); q1.processAllAvailable()
    ms.addData(b2); q1.processAllAvailable()
    q1.stop()
    // data arrives while the query is down; the restart must pick it up
    // from the committed offset without reprocessing batches 1-2
    ms.addData(b3)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val got = spark.read.parquet(s"$dir/out").as[SessionizedEvent]
      .collect().sortBy(_.event_id).toSeq
    assert(got === ref) // exactly-once: identical to the never-stopped run
    assert(got.map(_.session_id) === Seq("5-1", "5-1", "5-1", "5-2", "6-1"))
    assert(got.map(_.is_new_user) === Seq(true, false, false, false, true))
  }

  test("DSv2 replay source: real readStream path, batch-of-3 drain, checkpoint recovery", SlowTest) {
    // the wiring MemoryStream bypasses: format resolution from the class
    // name, option parsing at analysis, initialOffset/deserializeOffset,
    // per-trigger admission, planInputPartitions, commit — all through
    // Spark's actual MicroBatchExecution against the custom DSv2 source.
    // Recovery legs restart into a parquet sink: Spark's
    // ResolveWriteToStream categorically refuses checkpoint recovery
    // into memory/console sinks, so a file sink is the only way to
    // exercise the restart path.
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("graft_replay").toFile
    val f = new java.io.File(dir, "events.jsonl")
    def line(i: Int) =
      s"""{"event_id":$i,"ts":"2024-01-01 00:${"%02d".format(i)}:00","user_id":${i % 3},"event_type":"view","value":1.0,"props":"{}"}"""
    def writeLines(r: Range): Unit = {
      val payload = (r.map(line).mkString("\n") + "\n").getBytes("UTF-8")
      java.nio.file.Files.write(f.toPath, payload,
        java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
    }
    writeLines(1 to 3)
    val ckpt = new java.io.File(dir, "ckpt").getAbsolutePath
    val out = new java.io.File(dir, "out").getAbsolutePath

    def start() = Sources.replayEvents(spark, f.getAbsolutePath)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    def ids: Seq[Long] =
      spark.read.parquet(out).select("event_id").as[Long].collect().sorted.toSeq

    // leg 1: the initial 3 lines drain in one batch-of-3
    val q1 = start()
    q1.processAllAvailable()
    q1.stop()
    assert(ids === (1L to 3L))

    // 5 lines appended while the query is down; the restart must resume
    // at committed offset 3 (deserializeOffset + commit wiring), re-count
    // the file, and drain lines 4-8 in ceil(5/3) = 2 non-empty batches
    writeLines(4 to 8)
    val q2 = start()
    q2.processAllAvailable()
    val batches = q2.recentProgress.filter(_.numInputRows > 0).map(_.numInputRows)
    q2.stop()
    // 8 distinct rows total: leg-1 output intact, nothing reprocessed
    assert(ids === (1L to 8L))
    assert(batches.toSeq === Seq(3L, 2L), s"expected batch-of-3 drain, got ${batches.toSeq}")

    // a second append + restart replays exactly the appended tail
    writeLines(9 to 10)
    val q3 = start()
    q3.processAllAvailable()
    q3.stop()
    assert(ids === (1L to 10L))

    // Trigger.Once passes ReadLimit.allAvailable — the source must honor
    // the process-all contract and drain the whole file in ONE batch
    val q4 = Sources.replayEvents(spark, f.getAbsolutePath)
      .writeStream.format("parquet").option("path", s"$dir/out_once")
      .option("checkpointLocation", s"$dir/ckpt_once")
      .outputMode("append").trigger(Trigger.Once()).start()
    q4.awaitTermination()
    val onceBatches = q4.recentProgress.filter(_.numInputRows > 0).map(_.numInputRows)
    assert(onceBatches.toSeq === Seq(10L), s"allAvailable not honored: ${onceBatches.toSeq}")
    assert(spark.read.parquet(s"$dir/out_once").count() === 10L)

    // a missing path must fail synchronously at load(), not on the
    // stream thread after start()
    val err = intercept[Exception] {
      spark.readStream
        .format(classOf[graft.io.ReplaySourceProvider].getName)
        .load()
    }
    assert(err.getMessage.contains("path"))
  }

  test("Kafka envelope decode: value bytes -> typed events (batch form of S3 path)") {
    val json = """{"event_id":7,"ts":"2024-01-01 00:00:00","user_id":3,"event_type":"view","value":1.5,"props":"{}"}"""
    val kafkaShaped = Seq(json).toDF("str")
      .selectExpr("cast(str as binary) as value", "cast(null as binary) as key",
        "'topic' as topic", "0 as partition", "0L as offset")
    val ev = graft.io.Sources.decode(kafkaShaped).collect()
    assert(ev.length === 1)
    assert(ev.head === Event(7L, ts("2024-01-01 00:00:00"), 3L, "view", 1.5, "{}"))
  }

  test("streaming tumbling-window aggregation with watermark (append after close)", SlowTest) {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Event]
    val agg = ms.toDS().withWatermark("ts", "10 minutes")
      .groupBy(org.apache.spark.sql.functions.window($"ts", "1 hour"), $"event_type")
      .agg(org.apache.spark.sql.functions.count("*").as("n"))
    val q = agg.writeStream.format("memory").queryName("win_out").outputMode("append").start()
    try {
      ms.addData(Seq(ev(1, "2024-01-01 00:10:00", 1), ev(2, "2024-01-01 00:20:00", 2)))
      q.processAllAvailable()
      // watermark passes the first window's end -> it closes and appends
      ms.addData(Seq(ev(3, "2024-01-01 02:00:00", 1)))
      q.processAllAvailable()
      val closed = spark.table("win_out").select("n").as[Long].collect()
      assert(closed.toSeq === Seq(2L))
    } finally q.stop()
  }

  test("streaming session_window aggregation emits closed sessions (append mode)", SlowTest) {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Event]
    val agg = ms.toDS().withWatermark("ts", "30 minutes")
      .groupBy(
        org.apache.spark.sql.functions.session_window($"ts", "30 minutes"),
        $"user_id")
      .agg(org.apache.spark.sql.functions.count("*").as("n"))
    val q = agg.writeStream.format("memory").queryName("sw_out")
      .outputMode("append").start()
    try {
      ms.addData(Seq(ev(1, "2024-01-01 00:00:00", 1), ev(2, "2024-01-01 00:10:00", 1)))
      q.processAllAvailable()
      ms.addData(Seq(ev(3, "2024-01-01 03:00:00", 1))) // far ahead -> session closes
      q.processAllAvailable()
      val rows = spark.table("sw_out").select("user_id", "n").as[(Long, Long)].collect()
      assert(rows.toSeq === Seq((1L, 2L))) // the merged 2-event session was emitted
    } finally q.stop()
  }

  test("streaming exact dedup: dropDuplicatesWithinWatermark drops cross-batch repeats", SlowTest) {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Event]
    val deduped = ms.toDS()
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      ms.addData(Seq(ev(1, "2024-01-01 00:00:00", 1), ev(2, "2024-01-01 00:01:00", 2)))
      q.processAllAvailable()
      // same event_id re-delivered in a later batch, still inside watermark
      ms.addData(Seq(ev(1, "2024-01-01 00:00:00", 1), ev(3, "2024-01-01 00:02:00", 3)))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id").as[Long].collect().sorted
      assert(ids.toSeq === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("streaming sessionization equals the batch window formulation on real data", SlowTest) {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    // four micro-batches split on time order — same arrival order Kafka
    // replay would produce
    val batches = events.grouped(math.ceil(events.length / 4.0).toInt).map(_.toSeq).toSeq
    val streamed = run(batches)
      .map(e => e.event_id -> (e.session_seq, e.session_id)).toMap

    val batch = Sessionize.withSessionIds(Tables.events(spark, "/root/testdata/sf0.001"))
      .select("event_id", "session_seq", "session_id")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap

    assert(streamed.size === batch.size)
    val diffs = batch.collect { case (id, v) if streamed(id) != v => (id, v, streamed(id)) }
    assert(diffs.isEmpty, s"first diffs: ${diffs.take(5)}")
  }

  test("transformWithState (arbitrary-state v2, RocksDB) matches flatMapGroupsWithState", SlowTest) {
    implicit val sqlCtx = spark.sqlContext
    val batches = Seq(
      Seq(ev(1, "2024-01-01 00:00:00", 7, "purchase", 42.5), ev(2, "2024-01-01 00:10:00", 7)),
      Seq(ev(3, "2024-01-01 00:20:00", 7, "click"), ev(4, "2024-01-01 00:00:00", 8)),
      Seq(ev(5, "2024-01-01 01:30:00", 7)) // >30 min gap -> new session
    )
    val v1 = run(batches)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[Event]
      val q = StreamingSessionizer.sessionizeTws(ms.toDS())
        .writeStream.format("memory").queryName("tws_out").outputMode("append").start()
      try batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      finally q.stop()
      val v2 = spark.table("tws_out").as[SessionizedEvent]
        .collect().sortBy(_.event_id).toSeq
      assert(v2 === v1)
    } finally {
      prev match {
        case Some(p) => spark.conf.set(key, p)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming near-dup dedup: LSH band key within watermark") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp, String)]
    val deduped = graft.ext.Dedup.withMinhashBands(ms.toDS().toDF("doc_id", "ts", "text"))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("band0")
      .select("doc_id")
    val q = deduped.writeStream.format("memory").queryName("neardup_stream")
      .outputMode("append").start()
    try {
      val base = "the quick brown fox jumps over the lazy dog again and again"
      ms.addData(Seq((1L, ts("2024-01-01 00:00:00"), base)))
      q.processAllAvailable()
      // same shingle set arriving in a LATER batch -> same band -> dropped
      ms.addData(Seq(
        (2L, ts("2024-01-01 00:01:00"), base),
        (3L, ts("2024-01-01 00:02:00"), "completely different words entirely distinct tokens here now")))
      q.processAllAvailable()
      val ids = spark.table("neardup_stream").as[Long].collect().sorted
      assert(ids.toSeq === Seq(1L, 3L))
    } finally q.stop()
  }

  test("streaming decontamination: benchmark-overlapping docs dropped statelessly") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp, String)]
    val benchmark = Seq((0L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val clean = graft.ext.Dedup.decontaminateStream(
      ms.toDS().toDF("doc_id", "ts", "text"), benchmark)
      .select("doc_id")
    val q = clean.writeStream.format("memory").queryName("decontam_stream")
      .outputMode("append").start()
    try {
      ms.addData(Seq(
        // shares the "beta gamma delta" window with the benchmark -> dropped
        (1L, ts("2024-01-01 00:00:00"), "prefix beta gamma delta suffix words"),
        (2L, ts("2024-01-01 00:00:30"), "totally unrelated clean document text here")))
      q.processAllAvailable()
      // later batch: same stateless filter, no state dependency on batch 1
      ms.addData(Seq(
        (3L, ts("2024-01-01 00:01:00"), "alpha beta gamma repeated verbatim"),
        (4L, ts("2024-01-01 00:02:00"), "another clean one with fresh tokens")))
      q.processAllAvailable()
      val ids = spark.table("decontam_stream").as[Long].collect().sorted
      assert(ids.toSeq === Seq(2L, 4L))
    } finally q.stop()
  }

  test("streaming semantic dedup: broadcast-codebook cell + sign-sig within watermark", SlowTest) {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cb = graft.ext.Similarity.codebook(corpus, 16)
    // two REAL corpus vectors (replica-0 data), plus derived arrivals: an
    // exact copy and a positive-scaled copy of v0 — both MUST collide with
    // v0 on (cell, qsig): the cell argmax and the hyperplane sign bits are
    // scale-invariant, so the collision is deterministic, not
    // probabilistic.
    val vecs = corpus.select("vec_id", "embedding").orderBy("vec_id").limit(2)
      .collect().map(_.getSeq[Float](1))
    val v0 = vecs(0)
    val v1 = vecs(1)
    val scaled = v0.map(x => x * 2.0f)
    val arrivals = Seq(
      (10L, ts("2024-01-01 00:00:00"), v0),
      (11L, ts("2024-01-01 00:01:00"), v0), // exact copy   -> dropped
      (12L, ts("2024-01-01 00:02:00"), scaled), // scaled copy -> dropped
      (13L, ts("2024-01-01 00:03:00"), v1)) // distinct key  -> kept
    val ms = MemoryStream[(Long, Timestamp, Seq[Float])]
    val out = graft.ext.Similarity
      .semanticDedupStream(ms.toDS().toDF("vec_id", "ts", "embedding"), cb)
      .select("vec_id")
    val q = out.writeStream.format("memory").queryName("semdedup_stream")
      .outputMode("append").start()
    try {
      ms.addData(arrivals.take(1))
      q.processAllAvailable()
      ms.addData(arrivals.drop(1)) // copies arrive in a LATER batch
      q.processAllAvailable()
      val kept = spark.table("semdedup_stream").as[Long].collect().sorted.toSeq
      assert(kept.contains(10L) && !kept.contains(11L) && !kept.contains(12L))
      // parity leg: the streaming survivors are exactly the batch
      // first-arrival dedup on the SAME (cell, qsig) key — computed, not
      // hard-coded, so the expectation holds for any corpus content
      val batchKeys = graft.ext.Similarity
        .withSemanticKey(arrivals.toDF("vec_id", "ts", "embedding"), cb)
        .select("vec_id", "cell", "qsig")
        .collect()
        .map(r => (r.getLong(0), (if (r.isNullAt(1)) -1L else r.getLong(1), r.getLong(2))))
      val expected = batchKeys.groupBy(_._2).values.map(_.map(_._1).min).toSeq.sorted
      assert(kept === expected)
    } finally q.stop()
  }

  test("streaming semantic dedup survives a checkpoint restart: recovered state still drops the dup", SlowTest) {
    // end-to-end through the DSv2 replay source and a parquet sink: the
    // (cell, qsig) dedup state must come back from the checkpoint, so a
    // near-duplicate arriving AFTER the restart is dropped against a
    // key recorded BEFORE it. A state loss would re-emit it.
    val corpus = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cb = graft.ext.Similarity.codebook(corpus, 16)
    val vecs = corpus.select("vec_id", "embedding").orderBy("vec_id").limit(2)
      .collect().map(_.getSeq[Float](1))
    def line(id: Long, t: String, v: Seq[Float]) =
      s"""{"vec_id":$id,"ts":"$t","embedding":[${v.mkString(",")}]}"""
    val dir = java.nio.file.Files.createTempDirectory("graft_semrec").toFile
    val f = new java.io.File(dir, "vecs.jsonl")
    def append(ls: Seq[String]): Unit =
      java.nio.file.Files.write(f.toPath, (ls.mkString("\n") + "\n").getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
    val out = new java.io.File(dir, "out").getAbsolutePath
    val ckpt = new java.io.File(dir, "ckpt").getAbsolutePath
    def start() = {
      val decoded = spark.readStream
        .format(classOf[graft.io.ReplaySourceProvider].getName)
        .option("path", f.getAbsolutePath).load()
        .selectExpr(
          "from_json(value, 'vec_id BIGINT, ts TIMESTAMP, embedding ARRAY<FLOAT>') AS e")
        .selectExpr("e.vec_id AS vec_id", "e.ts AS ts", "e.embedding AS embedding")
      graft.ext.Similarity.semanticDedupStream(decoded, cb)
        .select("vec_id")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append").start()
    }
    append(Seq(line(10L, "2024-01-01 00:00:00", vecs(0))))
    val q1 = start()
    q1.processAllAvailable()
    q1.stop()
    // while the query is DOWN: an exact copy of vec 10's key and a novel
    // vector arrive
    append(Seq(
      line(11L, "2024-01-01 00:01:00", vecs(0)),
      line(13L, "2024-01-01 00:02:00", vecs(1))))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val ids = spark.read.parquet(out).select("vec_id").as[Long].collect().sorted.toSeq
    assert(ids === Seq(10L, 13L), s"recovered-state dedup verdicts: $ids")
  }

  test("bloomScreenStream: reference members never survive; clean and empty-reference arrivals pass") {
    implicit val sqlCtx = spark.sqlContext
    val reference = Seq((100L, "known bad document"), (101L, "already ingested text"))
      .toDF("doc_id", "text")
    val ms = MemoryStream[(Long, String)]
    val q = graft.ext.Dedup.bloomScreenStream(
        ms.toDS().toDF("doc_id", "text"), reference,
        expectedItems = 64L, numBits = 512L)
      .select("doc_id")
      .writeStream.format("memory").queryName("bloomscreen_stream")
      .outputMode("append").start()
    try {
      ms.addData(Seq(
        (1L, "known bad document"), // member -> dropped, guaranteed
        (2L, "fresh clean arrival")))
      q.processAllAvailable()
      ms.addData(Seq( // the screen is stateless: later batches same verdicts
        (3L, "already ingested text"),
        (4L, "another clean one")))
      q.processAllAvailable()
      val kept = spark.table("bloomscreen_stream").as[Long].collect().sorted.toSeq
      assert(kept === Seq(2L, 4L))
    } finally q.stop()
    // empty reference: NULL blob means no arrival can be a member — all kept
    val empty = reference.filter(org.apache.spark.sql.functions.lit(false))
    val ms2 = MemoryStream[(Long, String)]
    val q2 = graft.ext.Dedup.bloomScreenStream(
        ms2.toDS().toDF("doc_id", "text"), empty)
      .select("doc_id")
      .writeStream.format("memory").queryName("bloomscreen_stream2")
      .outputMode("append").start()
    try {
      ms2.addData(Seq((7L, "anything"), (8L, "at all")))
      q2.processAllAvailable()
      assert(spark.table("bloomscreen_stream2").as[Long].collect().sorted.toSeq === Seq(7L, 8L))
    } finally q2.stop()
  }

  test("corpusStatsSink: accumulated streaming report card equals the batch card", SlowTest) {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_cstats").toString
    // two micro-batches; 'shared' is a hapax in EACH batch but must fold
    // to c=2 in the merged card (the cross-batch case a naive per-batch
    // union of cards gets wrong); doc 3 has multi-space text so the
    // empty-token filter is exercised on the streaming side too
    val b1 = Seq((1L, "alpha beta shared"), (2L, "alpha gamma"))
    val b2 = Seq((3L, "shared  delta   beta"), (4L, "epsilon"))
    val ms = MemoryStream[(Long, String)]
    val q = graft.ext.TextOps.corpusStatsSink(
      ms.toDS().toDF("doc_id", "text"), s"$dir/out", s"$dir/cp")
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val streamed = graft.ext.TextOps.corpusStatsFrom(spark, s"$dir/out")
      .collect()(0)
    val batch = graft.ext.TextOps.corpusStats((b1 ++ b2).toDF("doc_id", "text"))
      .collect()(0)
    assert(streamed === batch)
    // spot-check the cross-batch fold: 9 tokens, 6 types, 3 hapax
    // (gamma, delta, epsilon), max freq 2 (alpha, beta, shared)
    assert(streamed.getLong(0) === 4L && streamed.getLong(1) === 9L)
    assert(streamed.getLong(2) === 6L && streamed.getLong(3) === 3L)
    assert(streamed.getLong(4) === 2L)
    // torn-overwrite replay crash: batch_2's tok dir exists WITH data
    // files but no _SUCCESS (the committer died mid-overwrite), and its
    // docs twin from the earlier successful attempt also exists — the
    // card must exclude the batch entirely (dir existence is not
    // commitment), leaving the two-batch card unchanged
    val tok2 = java.nio.file.Paths.get(s"$dir/out/tok/batch_2")
    val docs2 = java.nio.file.Paths.get(s"$dir/out/docs/batch_2")
    java.nio.file.Files.createDirectories(tok2)
    java.nio.file.Files.write(tok2.resolve("part-torn.parquet"), Array[Byte](1, 2, 3))
    java.nio.file.Files.createDirectories(docs2)
    java.nio.file.Files.write(docs2.resolve("part-torn.parquet"), Array[Byte](1, 2, 3))
    java.nio.file.Files.write(docs2.resolve("_SUCCESS"), Array.empty[Byte])
    val afterTear = graft.ext.TextOps.corpusStatsFrom(spark, s"$dir/out").collect()(0)
    assert(afterTear === streamed)
  }

  test("embeddingDriftSink: accumulated drift card equals the batch card; replay idempotent; empty store truthful", SlowTest) {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_drift").toString
    def v(axis: Int, wiggle: Int): Array[Float] = {
      val a = Array.fill(64)(0f)
      a(axis) = 1f
      a(20 + (wiggle % 8)) = 0.05f * ((wiggle % 3) + 1)
      a
    }
    val ref = (Seq((0L, v(0, 0)), (1L, v(1, 0))) ++
      (2L to 9L).map(i => (i, v(0, i.toInt))) ++
      (10L to 13L).map(i => (i, v(1, i.toInt)))).toDF("vec_id", "embedding")
    // batch 1 tracks the reference mix; batch 2 floods cluster 0 —
    // the accumulated card must see BOTH batches
    val b1 = Seq((100L, v(0, 1)), (101L, v(1, 2)))
    val b2 = (110L to 125L).map(i => (i, v(0, i.toInt))).toSeq
    val ms = MemoryStream[(Long, Array[Float])]
    val q = graft.ext.Similarity.embeddingDriftSink(
      ms.toDS().toDF("vec_id", "embedding"), ref, s"$dir/out", s"$dir/cp",
      cells = 2)
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
    } finally q.stop()
    def card(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("cell").as[(Long, Long, Long, Option[Long], Int)]
        .collect().toSeq
    val streamed = card(graft.ext.Similarity.embeddingDriftFrom(
      spark, ref, s"$dir/out", cells = 2))
    val batch = card(graft.ext.Similarity.embeddingDrift(
      ref, (b1 ++ b2).toDF("vec_id", "embedding"), cells = 2))
    assert(streamed === batch)
    // the flood registered: cluster 1's share collapsed vs cluster 0's
    assert(streamed.find(_._1 == 1L).get._5 === 1)
    // last-batch redelivery: same batch id, same rows — same card
    graft.ext.Similarity.embeddingDriftBatch(
      b2.toDF("vec_id", "embedding"),
      graft.ext.Similarity.localCents(ref, 2), s"$dir/out", 1L)
    assert(card(graft.ext.Similarity.embeddingDriftFrom(
      spark, ref, s"$dir/out", cells = 2)) === streamed)
    // empty store: every reference cell truthfully reads as vanished
    val empty = card(graft.ext.Similarity.embeddingDriftFrom(
      spark, ref, s"$dir/nothing", cells = 2))
    assert(empty.forall(r => r._3 === 0L && r._5 === 1))
    assert(empty.map(_._2).sum === 14L)
  }

  test("applyChangelogSink: merged table equals batch MERGE over the union; replay idempotent", SlowTest) {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc").toString
    val snap = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("id", "v")
    // cross-batch latest-wins: key 2 updated in BOTH batches (batch-2
    // version must win), key 3 deleted in batch 1 then revived by a
    // later-version update in batch 2, key 5 inserted in batch 2
    val b1 = Seq((2L, "b1", "U", 10L), (3L, "c", "D", 11L))
    val b2 = Seq((2L, "b2", "U", 20L), (3L, "c2", "U", 21L),
      (5L, "e", "I", 22L))
    val ms = MemoryStream[(Long, String, String, Long)]
    val q = graft.ops.Cdc.applyChangelogSink(
      ms.toDS().toDF("id", "v", "op", "version"), s"$dir/out", s"$dir/cp")
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val streamed = graft.ops.Cdc.cdcTableFrom(spark, snap, s"$dir/out", "id")
      .orderBy("id").as[(Long, String)].collect().toSeq
    val batch = graft.ops.Cdc.applyChangelog(
        snap, (b1 ++ b2).toDF("id", "v", "op", "version"), "id")
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(streamed === batch)
    assert(streamed === Seq(
      (1L, "a"), (2L, "b2"), (3L, "c2"), (4L, "d"), (5L, "e")))
    // last-batch redelivery (foreachBatch's contract: same batch id,
    // same rows): the whole-dir overwrite must converge to the same
    // store, not double-apply
    graft.ops.Cdc.applyChangelogBatch(
      b2.toDF("id", "v", "op", "version"), s"$dir/out", 1L)
    val replayed = graft.ops.Cdc.cdcTableFrom(spark, snap, s"$dir/out", "id")
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(replayed === streamed)
    // empty store: the merged table of zero batches is the snapshot
    val empty = graft.ops.Cdc.cdcTableFrom(
      spark, snap, s"$dir/nothing_here", "id")
    assert(empty.orderBy("id").as[(Long, String)].collect().toSeq ===
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
  }

  test("maintainCountViewFrom: streamed IVM view equals full recompute across batches") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{count, lit}
    val dir = java.nio.file.Files.createTempDirectory("graft_ivm").toString
    val snap = Seq((1L, "g1"), (2L, "g1"), (3L, "g2"), (4L, "g2"))
      .toDF("id", "grp")
    // key 2 moves g1->g2 in batch 1, then g2->g3 in batch 2: a per-batch
    // GROUP delta against the snapshot would subtract its g1 seat twice —
    // the store must hold raw changelog rows and let latest-wins resolve
    // across the union before any delta math (the maintainCountViewFrom
    // scaladoc contract)
    val b1 = Seq((2L, "g2", "U", 10L), (3L, "g2", "D", 11L))
    val b2 = Seq((2L, "g3", "U", 20L), (5L, "g1", "I", 21L))
    val ms = MemoryStream[(Long, String, String, Long)]
    val q = graft.ops.Cdc.applyChangelogSink(
      ms.toDS().toDF("id", "grp", "op", "version"), s"$dir/out", s"$dir/cp")
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val view = graft.ops.Cdc.maintainCountViewFrom(
      spark, snap, s"$dir/out", "id", Seq("grp"))
      .orderBy("grp").as[(String, Long)].collect().toSeq
    val recomputed = graft.ops.Cdc.cdcTableFrom(spark, snap, s"$dir/out", "id")
      .groupBy("grp").agg(count(lit(1)).as("n"))
      .orderBy("grp").as[(String, Long)].collect().toSeq
    assert(view === recomputed)
    // merged table: 1->g1, 2->g3, 4->g2, 5->g1 (3 deleted)
    assert(view === Seq(("g1", 2L), ("g2", 1L), ("g3", 1L)))
    // empty store: the base view, unchanged
    val emptyView = graft.ops.Cdc.maintainCountViewFrom(
      spark, snap, s"$dir/none", "id", Seq("grp"))
      .orderBy("grp").as[(String, Long)].collect().toSeq
    assert(emptyView === Seq(("g1", 2L), ("g2", 2L)))
  }

  test("maintainJoinViewFrom: streamed join-IVM equals full recompute; delta re-joins the dim") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_ivmj").toString
    val snap = Seq((1L, 10L), (2L, 10L), (3L, 20L)).toDF("id", "fk")
    val dim = Seq((10L, "D10"), (20L, "D20"), (30L, "D30")).toDF("fk", "dim_name")
    val base = graft.ops.Cdc.joinView(snap, dim, "fk")
    // key 2 moves fk 10 -> 20 in batch 1 then 20 -> 30 in batch 2 (only
    // latest-wins across ALL batches lands it on D30); 3 deletes
    val b1 = Seq((2L, 20L, "U", 10L), (3L, 20L, "D", 11L))
    val b2 = Seq((2L, 30L, "U", 20L), (4L, 10L, "I", 21L))
    val ms = MemoryStream[(Long, Long, String, Long)]
    val q = graft.ops.Cdc.applyChangelogSink(
      ms.toDS().toDF("id", "fk", "op", "version"), s"$dir/out", s"$dir/cp")
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val view = graft.ops.Cdc.maintainJoinViewFrom(
      spark, base, s"$dir/out", dim, "id", "fk")
      .select("id", "fk", "dim_name")
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    val recomputed = graft.ops.Cdc.joinView(
      graft.ops.Cdc.cdcTableFrom(spark, snap, s"$dir/out", "id"), dim, "fk")
      .select("id", "fk", "dim_name")
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(view === recomputed)
    assert(view === Seq((1L, 10L, "D10"), (2L, 30L, "D30"), (4L, 10L, "D10")))
    // empty store: the base view, byte for byte
    assert(graft.ops.Cdc.maintainJoinViewFrom(
      spark, base, s"$dir/none", dim, "id", "fk")
      .select("id", "fk", "dim_name")
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq ===
      base.select("id", "fk", "dim_name")
        .as[(Long, Long, String)].collect().sortBy(_._1).toSeq)
  }

  test("jsonIngestSink: dead-letter routing across batches equals the batch report; replay idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_jsoningest").toString
    val b1 = Seq((1L, """{"k": 1}"""), (2L, """{"k": 2""")) // 2 truncated
    val b2 = Seq((3L, """{"k": 3}"""), (4L, null.asInstanceOf[String]))
    val ms = MemoryStream[(Long, String)]
    val q = graft.ext.WebOps.jsonIngestSink(
      ms.toDS().toDF("event_id", "props"), "event_id", "props",
      s"$dir/out", s"$dir/cp")
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val streamed = graft.ext.WebOps.jsonIngestFrom(spark, s"$dir/out")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1)
    val batch = graft.ext.WebOps.jsonIngest(
      (b1 ++ b2).toDF("event_id", "props"), "event_id", "props")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(streamed === batch)
    assert(streamed === Array(
      ("clean", 2L, 2L, 1L, 3L), ("corrupt", 2L, 2L, 2L, 4L)))
    // replayed last batch (same id, same rows) converges, not doubles
    graft.ext.WebOps.jsonIngestBatch(
      b2.toDF("event_id", "props"), "event_id", "props", s"$dir/out", 1L)
    val replayed = graft.ext.WebOps.jsonIngestFrom(spark, s"$dir/out")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(replayed === streamed)
    // the dead-letter leg holds the RAW payloads for replay
    val dead = spark.read.parquet(s"$dir/out/dead/batch_0", s"$dir/out/dead/batch_1")
      .as[(Long, String)].collect().sortBy(_._1)
    assert(dead === Array((2L, """{"k": 2"""), (4L, null)))
    // empty store: truthful empty frame with the report schema
    assert(graft.ext.WebOps.jsonIngestFrom(spark, s"$dir/none").count() === 0L)
  }

  test("aggStateSink: merged state equals one-shot aggState over base+stream; replay idempotent") {
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.Incremental
    val dir = java.nio.file.Files.createTempDirectory("graft_aggstate").toString
    val baseRows = Seq((Option(1L), Option(10.0)), (Option(1L), Option(2.0)),
      (Option(2L), Option.empty[Double]), (Option.empty[Long], Option(9.0)))
    val base = Incremental.aggState(baseRows.toDF("k", "v"), "k", "v")
    // key 1 updated in both batches; key 3 appears only streamed; key 2
    // stays all-NULL-valued (sum must stay NULL through the merge)
    val b1 = Seq((Option(1L), Option(5.0)), (Option(2L), Option.empty[Double]))
    val b2 = Seq((Option(1L), Option(1.0)), (Option(3L), Option(7.0)),
      (Option.empty[Long], Option(1.0)))
    val ms = MemoryStream[(Option[Long], Option[Double])]
    val q = Incremental.aggStateSink(
      ms.toDS().toDF("k", "v"), "k", "v", s"$dir/out", s"$dir/cp")
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
    } finally q.stop()
    import org.apache.spark.sql.functions.col
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("k"), col("n"), col("sum_v").cast("string"),
        col("min_v").cast("string"), col("max_v").cast("string"))
      .collect().map(_.toSeq).sortBy(_.toString)
    val streamed = canon(Incremental.aggStateFrom(spark, base, s"$dir/out"))
    val oneShot = canon(Incremental.aggState(
      (baseRows ++ b1 ++ b2).toDF("k", "v"), "k", "v"))
    assert(streamed === oneShot)
    // last-batch redelivery: same batch id, same rows — same state
    Incremental.aggStateBatch(b2.toDF("k", "v"), "k", "v", s"$dir/out", 1L)
    assert(canon(Incremental.aggStateFrom(spark, base, s"$dir/out")) === streamed)
    // empty store: the merged state of zero batches is the base
    assert(canon(Incremental.aggStateFrom(spark, base, s"$dir/nothing")) === canon(base))
  }

  test("heavyHittersSink: merged MG summary honors mergeable-summaries bounds; replay idempotent", SlowTest) {
    implicit val sqlCtx = spark.sqlContext
    import graft.ext.TextOps
    val dir = java.nio.file.Files.createTempDirectory("graft_mg").toString
    val cap = 4
    // vocabulary of 8 tokens forces residual cuts at capacity 4; 'hot'
    // dominates across BOTH batches, 'warm' only in batch 2
    def doc(tokens: Seq[String]) = tokens.mkString(" ")
    val b1 = Seq((1L, doc(Seq.fill(30)("hot") ++ Seq("a", "b", "c", "d", "e", "f"))))
    val b2 = Seq((2L, doc(Seq.fill(25)("hot") ++ Seq.fill(12)("warm") ++ Seq("a", "b", "c"))))
    val ms = MemoryStream[(Long, String)]
    val q = TextOps.heavyHittersSink(
      ms.toDS().toDF("doc_id", "text"), s"$dir/out", s"$dir/cp", capacity = cap)
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
    } finally q.stop()
    def summary() = TextOps.heavyHittersFrom(spark, s"$dir/out", capacity = cap)
      .as[(String, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val got = summary()
    // exact truth over the union
    val exact = (b1 ++ b2).flatMap(_._2.split(" ")).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = exact.values.sum
    assert(got.forall(_._3 == n))
    val bound = n / (cap + 1)
    got.foreach { case (tok, est, _, mu) =>
      assert(mu === bound)
      val t = exact(tok)
      assert(est <= t && t <= est + mu, s"$tok est=$est true=$t bound=$mu")
    }
    // superset guarantee: every token with true freq > n/(cap+1) is present
    exact.filter(_._2 > bound).keys.foreach { tok =>
      assert(got.exists(_._1 == tok), s"missing guaranteed heavy hitter $tok")
    }
    assert(got.exists(_._1 == "hot") && got.exists(_._1 == "warm"))
    // replay of the last batch converges to the same store
    TextOps.heavyHittersBatch(b2.toDF("doc_id", "text"), s"$dir/out", 1L, capacity = cap)
    assert(summary() === got)
    // empty store: empty frame, not an error
    assert(TextOps.heavyHittersFrom(spark, s"$dir/none", cap).count() === 0L)
  }

  test("markovSink: cross-batch transitions stitched from bounds; equals the batch matrix; replay idempotent", SlowTest) {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    import graft.ops.Mining
    val dir = java.nio.file.Files.createTempDirectory("graft_markov").toString
    // u1 spans batches (b1 ends 'b', b2 starts 'a' -> stitched b->a);
    // u2 lives in one batch; u3 appears in b1 and b3-like replay only
    val b1 = Seq((1L, 1L, "a"), (1L, 2L, "b"), (2L, 3L, "a"))
    val b2 = Seq((1L, 4L, "a"), (1L, 5L, "c"), (2L, 6L, "a"))
    def frame(xs: Seq[(Long, Long, String)]) =
      xs.toDF("u", "eid", "t").withColumn("ts", col("eid").cast("timestamp"))
    val ms = MemoryStream[(Long, Long, String)]
    val q = Mining.markovSink(
      ms.toDS().toDF("u", "eid", "t").withColumn("ts", col("eid").cast("timestamp")),
      "u", "t", "ts", "eid", s"$dir/out", s"$dir/cp")
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
    } finally q.stop()
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("from_type", "to_type")
      .as[(String, String, Long, Long, Double)].collect().toSeq
    val streamed = canon(Mining.markovFrom(spark, s"$dir/out"))
    val oneShot = canon(Mining.markovTransitions(frame(b1 ++ b2), "u", "t", "ts", "eid"))
    assert(streamed === oneShot)
    // the b->a transition exists ONLY across the batch boundary
    assert(streamed.exists(x => x._1 == "b" && x._2 == "a" && x._3 == 1L))
    // replay of the last batch converges to the same store
    Mining.markovBatch(frame(b2), "u", "t", "ts", "eid", s"$dir/out", 1L)
    assert(canon(Mining.markovFrom(spark, s"$dir/out")) === streamed)
    // empty store: an empty matrix, not an error
    assert(Mining.markovFrom(spark, s"$dir/none").count() === 0L)
  }

  test("cusumDriftSink: CUSUM over base+stream equals the batch path; replay idempotent", SlowTest) {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    import graft.ops.Quality
    val dir = java.nio.file.Files.createTempDirectory("graft_cusum").toString
    def ev(t: String, day: String, n: Int) = Seq.fill(n)((t, s"$day 01:00:00"))
    val baseRows = ev("a", "2024-01-01", 1) ++ ev("a", "2024-01-02", 1)
    val base = baseRows.toDF("t", "s").withColumn("ts", col("s").cast("timestamp"))
    // the stream floods day 3 (same (type, day) also split ACROSS batches
    // so partial-merge is exercised) and adds a second type
    val b1 = ev("a", "2024-01-03", 4) ++ ev("b", "2024-01-01", 2)
    val b2 = ev("a", "2024-01-03", 6) ++ ev("b", "2024-01-02", 2)
    val ms = MemoryStream[(String, String)]
    val q = Quality.cusumDriftSink(
      ms.toDS().toDF("t", "s").withColumn("ts", col("s").cast("timestamp")),
      "t", "ts", s"$dir/out", s"$dir/cp")
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
    } finally q.stop()
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("etype", "day")
      .as[(String, java.sql.Timestamp, Long, Long, Long, Long, Boolean)]
      .collect().toSeq
    val streamed = canon(Quality.cusumDriftFrom(spark, base, "t", "ts", s"$dir/out"))
    val oneShot = canon(Quality.cusumDrift(
      (baseRows ++ b1 ++ b2).toDF("t", "s").withColumn("ts", col("s").cast("timestamp")),
      "t", "ts"))
    assert(streamed === oneShot)
    // type a days (1,1,10): scaled cusum -9,-18,0 -> the flood flags day 2
    val a2 = streamed.find(x => x._1 == "a" && x._2.toString.startsWith("2024-01-02")).get
    assert(a2._6 === -18L && a2._7)
    // last-batch redelivery converges; empty store = base-only CUSUM
    Quality.cusumDriftBatch(
      b2.toDF("t", "s").withColumn("ts", col("s").cast("timestamp")),
      "t", "ts", s"$dir/out", 1L)
    assert(canon(Quality.cusumDriftFrom(spark, base, "t", "ts", s"$dir/out")) === streamed)
    assert(canon(Quality.cusumDriftFrom(spark, base, "t", "ts", s"$dir/nothing")) ===
      canon(Quality.cusumDrift(base, "t", "ts")))
    // the SAME daily store serves the trend reader — one store, k views
    def canonT(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("etype").as[(String, Long, Long, Long, Long, Double)].collect().toSeq
    assert(canonT(Quality.trendSlopeFrom(spark, base, "t", "ts", s"$dir/out")) ===
      canonT(Quality.trendSlope(
        (baseRows ++ b1 ++ b2).toDF("t", "s").withColumn("ts", col("s").cast("timestamp")),
        "t", "ts")))
    // ... and the ACF reader — same store, same integer witnesses
    def canonA(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("etype", "lag")
      .as[(String, Int, Long, Long, Long, Double)].collect().toSeq
    val acfMerged = canonA(Quality.autocorrelationFrom(spark, base, "t", "ts", s"$dir/out"))
    assert(acfMerged === canonA(Quality.autocorrelation(
      (baseRows ++ b1 ++ b2).toDF("t", "s").withColumn("ts", col("s").cast("timestamp")),
      "t", "ts")))
    assert(acfMerged.nonEmpty)
    // ... and the OLS + EWMA readers — same store, same exact witnesses
    val allDf = (baseRows ++ b1 ++ b2).toDF("t", "s")
      .withColumn("ts", col("s").cast("timestamp"))
    def canonO(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("etype")
      .as[(String, Long, Long, Long, Option[Double], Option[Double])].collect().toSeq
    val olsMerged = canonO(Quality.olsTrendFrom(spark, base, "t", "ts", s"$dir/out"))
    assert(olsMerged === canonO(Quality.olsTrend(allDf, "t", "ts")))
    assert(olsMerged.nonEmpty)
    def canonE(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("etype", "day")
      .as[(String, java.sql.Timestamp, Long, Long, Int, Double)].collect().toSeq
    val ewmaMerged = canonE(Quality.ewmaSmoothFrom(spark, base, "t", "ts", s"$dir/out"))
    assert(ewmaMerged === canonE(Quality.ewmaSmooth(allDf, "t", "ts")))
    assert(ewmaMerged.nonEmpty)
  }

  test("pcaScatterSink: merged partials re-derive the batch-path model; replay idempotent", SlowTest) {
    implicit val sqlCtx = spark.sqlContext
    import graft.ext.Similarity
    val dir = java.nio.file.Files.createTempDirectory("graft_pca").toString
    val base = Seq((1L, Seq(3.0f, 4.0f)), (2L, Seq(-3.0f, -4.0f)))
      .toDF("vec_id", "embedding")
    val b1 = Seq((3L, Seq(6.0f, 8.0f)), (4L, Seq(1.0f, 0.0f)))
    val b2 = Seq((5L, Seq(0.0f, 1.0f)), (6L, Seq(-8.0f, 6.0f)))
    val ms = MemoryStream[(Long, Seq[Float])]
    val q = Similarity.pcaScatterSink(
      ms.toDS().toDF("vec_id", "embedding"), s"$dir/out", s"$dir/cp")
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
    } finally q.stop()
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("component", "n", "trace_scaled", "ortho_ok", "resid_ok", "order_ok")
      .orderBy("component")
      .as[(Int, Long, String, Boolean, Boolean, Boolean)].collect().toSeq
    val streamed = canon(Similarity.embedPcaFrom(spark, base, s"$dir/out", k = 2))
    val oneShot = canon(Similarity.embedPca(
      (Seq((1L, Seq(3.0f, 4.0f)), (2L, Seq(-3.0f, -4.0f))) ++ b1 ++ b2)
        .toDF("vec_id", "embedding"), k = 2))
    assert(streamed === oneShot)
    assert(streamed.forall(r => r._2 === 6L && r._4 && r._5 && r._6))
    // last-batch redelivery converges on the same partial
    Similarity.pcaScatterBatch(b2.toDF("vec_id", "embedding"), s"$dir/out", 1L)
    assert(canon(Similarity.embedPcaFrom(spark, base, s"$dir/out", k = 2)) === streamed)
    // an all-null batch writes an empty partial and changes nothing
    Similarity.pcaScatterBatch(
      Seq((7L, Option.empty[Seq[Float]])).toDF("vec_id", "embedding"),
      s"$dir/out", 2L)
    assert(canon(Similarity.embedPcaFrom(spark, base, s"$dir/out", k = 2)) === streamed)
    // empty store = base-only model
    assert(canon(Similarity.embedPcaFrom(spark, base, s"$dir/nothing", k = 2)) ===
      canon(Similarity.embedPca(base, k = 2)))
  }

  test("hllOverlapSink: merged audience sketches track exact overlaps; replay idempotent") {
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.Functions
    val dir = java.nio.file.Files.createTempDirectory("graft_hll").toString
    val base = (1L to 50L).map(("A", _)).toDF("seg", "member")
    val b1 = (40L to 80L).map(("A", _)) ++ (1L to 30L).map(("B", _))
    val b2 = (25L to 60L).map(("B", _)) :+ ("C", 99L)
    val ms = MemoryStream[(String, Long)]
    val q = Functions.hllOverlapSink(
      ms.toDS().toDF("seg", "member"), "seg", "member", s"$dir/out", s"$dir/cp")
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
    } finally q.stop()
    // full-data exact overlaps: A = 1..80, B = 1..60, C = {99}
    val exact = Map(("A", "B") -> (80L, 60L, 60L), ("A", "C") -> (80L, 1L, 0L),
      ("B", "C") -> (60L, 1L, 0L))
    def check(df: org.apache.spark.sql.DataFrame, keys: Set[(String, String)]): Unit = {
      val rows = df.as[(String, String, Double, Double, Double)].collect()
        .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
      assert(rows.keySet === keys)
      rows.foreach { case (k, (ea, eb, ei)) =>
        val (xa, xb, xi) = exact(k)
        assert(math.abs(ea - xa) <= 0.05 * xa, s"$k est_a $ea vs $xa")
        assert(math.abs(eb - xb) <= 0.05 * math.max(xb, 1L), s"$k est_b $eb vs $xb")
        assert(math.abs(ei - xi) <= 0.05 * (xa + xb), s"$k est_inter $ei vs $xi")
      }
    }
    val merged = Functions.hllOverlapEstFrom(spark, base, "seg", "member", s"$dir/out")
    check(merged, exact.keySet)
    val firstRun = merged.as[(String, String, Double, Double, Double)].collect().toSet
    // last-batch redelivery: HLL union is register-wise max — idempotent
    Functions.hllOverlapBatch(b2.toDF("seg", "member"), "seg", "member", s"$dir/out", 1L)
    assert(Functions.hllOverlapEstFrom(spark, base, "seg", "member", s"$dir/out")
      .as[(String, String, Double, Double, Double)].collect().toSet === firstRun)
    // empty store = base-only pairs (single segment -> no pairs)
    assert(Functions.hllOverlapEstFrom(spark, base, "seg", "member", s"$dir/nothing")
      .count() === 0L)
  }

  test("rollingDistinctEstFrom: day-keyed sketch store tracks exact rolling distinct; gaps honored") {
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.Functions
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_rolldau").toString
    def dayed(rows: Seq[(String, Long)]) =
      rows.toDF("d", "u").select(col("d").cast("date").as("day"), col("u"))
    // base: d1 users 1..40; batches add d2 and (gap) d5
    val base = dayed((1L to 40L).map(("2024-01-01", _)))
    val b1 = (30L to 70L).map(("2024-01-02", _))
    val b2 = (1L to 10L).map(("2024-01-05", _))
    val ms = MemoryStream[(String, Long)]
    val q = Functions.hllOverlapSink(
      ms.toDS().toDF("d", "u").select(col("d").cast("date").as("day"), col("u")),
      "day", "u", s"$dir/out", s"$dir/cp")
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val out = Functions.rollingDistinctEstFrom(spark, base, "day", "u", s"$dir/out", days = 3)
      .orderBy("day")
      .as[(java.sql.Timestamp, Double, Double)].collect().toSeq
    def t(d: String) = java.sql.Timestamp.valueOf(d + " 00:00:00")
    // exact: dau d1=40 d2=41 d5=10; rolling3 d1=40 d2=70 d5=10 (gap:
    // the d5 window covers d3..d5 only — a rows frame would reach d2)
    val exact = Map(t("2024-01-01") -> (40.0, 40.0),
      t("2024-01-02") -> (41.0, 70.0), t("2024-01-05") -> (10.0, 10.0))
    assert(out.map(_._1).toSet === exact.keySet)
    out.foreach { case (d, dau, roll) =>
      val (xd, xr) = exact(d)
      assert(math.abs(dau - xd) <= 0.05 * xd, s"$d dau $dau vs $xd")
      assert(math.abs(roll - xr) <= 0.05 * xr, s"$d rolling $roll vs $xr")
    }
    // replay of the last batch is a no-op (union is register-wise max)
    Functions.hllOverlapBatch(dayed(b2), "day", "u", s"$dir/out", 1L)
    val replayed = Functions.rollingDistinctEstFrom(spark, base, "day", "u", s"$dir/out", days = 3)
      .orderBy("day").as[(java.sql.Timestamp, Double, Double)].collect().toSeq
    assert(replayed === out)
  }

  test("lmScoreSink: per-batch scores equal lmScore over the accumulated corpus; replay idempotent", SlowTest) {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_lms").toString
    // batch 1 establishes a predictable background ('a b' alternations);
    // batch 2's probe doc reuses the now-common context 'a' with unseen
    // continuations — its charge depends on CROSS-BATCH accumulated
    // counts, which is exactly what the parity contract must pin
    val b1 = (1L to 10L).map(id => (id, Seq.fill(20)("a b").mkString(" "), "en"))
    val b2 = Seq(
      (90L, (1 to 10).map(i => s"a z$i").mkString(" "), "en"),
      (91L, Seq.fill(10)("a b").mkString(" "), "en"),
      (92L, "", "en"))
    val ms = MemoryStream[(Long, String, String)]
    // threshold 3.5 bits: the probe charges mag(c_ctx(a)=220)=7 on each
    // of its ten (a, zi) bigrams -> 70/19 = 3.68 bits/bigram; the
    // all-predictable background charges 0
    val q = graft.ext.TextOps.lmScoreSink(
      ms.toDS().toDF("doc_id", "text", "lang"), s"$dir/out", s"$dir/cp",
      thresholdTenths = 35L)
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
    } finally q.stop()
    def scores(df: org.apache.spark.sql.DataFrame): Seq[(Long, Any, Any, Any)] =
      df.selectExpr("doc_id", "n_bigrams", "nll_mag", "high_ppl")
        .collect().map(r => (r.getLong(0), r.get(1), r.get(2), r.get(3)))
        .sortBy(_._1).toSeq
    // batch N's streamed scores == lmScore(union of batches 0..N)
    // restricted to batch N's docs — the incremental-crawl contract
    val s1 = scores(spark.read.parquet(s"$dir/out/scores/batch_0"))
    val s2 = scores(spark.read.parquet(s"$dir/out/scores/batch_1"))
    val all = (b1 ++ b2).toDF("doc_id", "text", "lang")
    val e1 = scores(graft.ext.TextOps.lmScore(
      b1.toDF("doc_id", "text", "lang"), thresholdTenths = 35L))
    val e2 = scores(graft.ext.TextOps.lmScore(all, thresholdTenths = 35L)
      .where(org.apache.spark.sql.functions.col("doc_id") >= 90L))
    assert(s1 === e1)
    assert(s2 === e2)
    // the probe doc really was charged by the cross-batch model: its
    // flag fires, the same-shape background doc's does not
    val byId = s2.map(t => t._1 -> t).toMap
    assert(byId(90L)._4 === 1)
    assert(byId(91L)._4 === 0)
    assert(byId(92L)._2 === null && byId(92L)._4 === null) // empty doc: NULLs
    // replay idempotence: re-running the last batch must not
    // double-count its histogram into its own model
    val replayed = (b2, 1L)
    graft.ext.TextOps.lmScoreBatch(
      replayed._1.toDF("doc_id", "text", "lang"), s"$dir/out", replayed._2,
      thresholdTenths = 35L)
    assert(scores(spark.read.parquet(s"$dir/out/scores/batch_1")) === s2)
  }

  test("incrementalFuzzyDedupSink: per-batch verdicts equal the batch operator over prior survivors; reject branch fires; replay idempotent", SlowTest) {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_ifds").toString
    // the ExtSpec corpus: sliding half-overlapping token windows give
    // neighbor Jaccard ≈ 1/3 (single-component band hits at k=2), and
    // the +15 replicas are exact dups — so across sequential batches the
    // accept AND the verify-reject branches both fire
    val words = (0 until 70).map(i => s"w$i")
    def doc(i: Int): (Long, String) = {
      val start = (i % 15) * 4
      (i.toLong, words.slice(start, start + 12).mkString(" "))
    }
    // interleaved membership (i % 3): sliding-window neighbors i, i+1
    // always land in different batches, so cross-batch one-component
    // band hits (the reject case) are guaranteed to occur. Each batch
    // also carries a SHINGLE-LESS doc (< 3 tokens → all-null minhash):
    // they must verdict as never-duplicate and never enter the index
    // (the constant-band accumulation class), in exact parity with the
    // batch operator
    val batches = (0 until 3).map(b =>
      (0 until 30).filter(_ % 3 == b).map(doc) :+ (90L + b, s"tiny$b doc"))
    val ms = MemoryStream[(Long, String)]
    val sink = graft.ext.Dedup.incrementalFuzzyDedupSink(
      s"$dir/index", s"$dir/verdicts", k = 2, minMatch = 2, bandBuckets = 8)
    val q = ms.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch(sink)
      .option("checkpointLocation", s"$dir/cp").start()
    try {
      batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    } finally q.stop()
    // reference: iterate the BATCH operator with the existing side = the
    // accumulated SURVIVOR corpus (the sink's documented parity spec)
    var existing = Seq.empty[(Long, String)]
    val expected = scala.collection.mutable.Map.empty[Long, Option[Long]]
    var sawAccept = false; var sawBandReject = false
    batches.foreach { b =>
      val ref = graft.ext.Dedup.incrementalFuzzyDedup(
        (existing ++ b).toDF("doc_id", "text"),
        isNewExpr = s"doc_id in (${b.map(_._1).mkString(",")})",
        k = 2, minMatch = 2).collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      // reject-branch witness: band candidacy at bar 1 minus verdicts at
      // bar 2 (bar 1 ≡ candidacy itself for k=2)
      val atBar1 = graft.ext.Dedup.incrementalFuzzyDedup(
        (existing ++ b).toDF("doc_id", "text"),
        isNewExpr = s"doc_id in (${b.map(_._1).mkString(",")})",
        k = 2, minMatch = 1).collect()
        .map(r => r.getLong(0) -> !r.isNullAt(1)).toMap
      ref.foreach { case (id, v) =>
        expected(id) = v
        if (v.isDefined) sawAccept = true
        if (v.isEmpty && atBar1(id)) sawBandReject = true
      }
      val survivors = ref.filter(_._2.isEmpty).map(_._1).toSet
      existing = existing ++ b.filter(d => survivors(d._1))
    }
    assert(sawAccept, "corpus produced no accepted duplicate")
    assert(sawBandReject, "corpus produced no band candidate below the bar")
    def verdicts(): Map[Long, Option[Long]] =
      spark.read.parquet(s"$dir/verdicts").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          Option(r.getAs[Any]("dup_of")).map(_.asInstanceOf[Long]))
        .toMap
    assert(verdicts() === expected.toMap)
    // the shingle-less docs verdicted (never-duplicate) but were kept
    // OUT of the index — the constant-band class must not accumulate
    assert((90L to 92L).forall(id => verdicts()(id).isEmpty))
    assert(spark.read.parquet(s"$dir/index")
      .where(org.apache.spark.sql.functions.col("doc_id") >= 90L).count() === 0L)
    // replay of the last batch (the foreachBatch crash contract): the
    // probe reads strictly batch_id < 2, so the re-delivered batch must
    // not match its own crashed attempt's index rows — identical
    // verdicts, no duplicated index rows
    val idxRows = spark.read.parquet(s"$dir/index").count()
    sink(batches(2).toDF("doc_id", "text"), 2L)
    assert(verdicts() === expected.toMap)
    assert(spark.read.parquet(s"$dir/index").count() === idxRows)
  }

  test("incrementalFuzzyDedupSink: a small batch opens ONLY its bucket partitions of the index") {
    // black-box proof of the bucket partition pruning (the
    // refreshingDedupSink garbage-files idiom): after seeding the index,
    // every partition OUTSIDE the next batch's bucket set is overwritten
    // with garbage — if the screen opened any of them, the parquet read
    // would throw. A full-scan regression fails this test loudly.
    val dir = java.nio.file.Files.createTempDirectory("graft_ifdp").toString
    val words = (0 until 70).map(i => s"w$i")
    def doc(i: Int): (Long, String) = {
      val start = (i % 15) * 4
      (i.toLong, words.slice(start, start + 12).mkString(" "))
    }
    val sink = graft.ext.Dedup.incrementalFuzzyDedupSink(
      s"$dir/index", s"$dir/verdicts", k = 2, minMatch = 2, bandBuckets = 64)
    sink((0 until 30).map(doc).toDF("doc_id", "text"), 0L)
    // one-doc batch: touches at most 2 of the 64 buckets
    val nextDoc = Seq((100L, doc(3)._2)).toDF("doc_id", "text") // exact dup of doc 3
    val touched = graft.ext.Dedup.withMinhashBands(nextDoc, 2)
      .selectExpr("pmod(band0, 64) as b0", "pmod(band1, 64) as b1")
      .collect().flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    val parts = new java.io.File(s"$dir/index/batch_id=0").listFiles
      .filter(_.getName.startsWith("bucket="))
    val garbaged = parts.filter(d => !touched.contains(d.getName.drop(7).toLong))
    assert(garbaged.nonEmpty && garbaged.length < parts.length,
      s"test needs both pruned and probed partitions (touched=$touched)")
    garbaged.foreach(_.listFiles.filter(_.getName.endsWith(".parquet")).foreach { f =>
      java.nio.file.Files.write(f.toPath, Array[Byte](9, 9, 9))
    })
    sink(nextDoc, 1L) // would throw on any garbaged partition it opened
    val v = spark.read.parquet(s"$dir/verdicts")
      .where(org.apache.spark.sql.functions.col("batch_id") === 1L).collect()
    assert(v.length === 1 && v.head.getAs[Long]("dup_of") === 3L
      && v.head.getAs[Int]("is_known_dup") === 1)
  }

  test("codebook refresh: foreachBatch retrains + publishes; restart swaps it in with state intact", SlowTest) {
    // The refresh contract (Similarity.publishCodebook scaladoc): a running
    // query pins its codebook files, so the sink's retrained publish is
    // ADDITIVE (new v=N dir) and the swap lands at the next restart from
    // the same checkpoint. Post-swap verdicts must equal first-arrival
    // dedup where pre-swap state keys were recorded under the OLD codebook
    // and post-swap arrivals key under the NEW one — computed here from
    // batch runs of withSemanticKey under each codebook, not hard-coded.
    val corpus = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val vecs = corpus.select("vec_id", "embedding").orderBy("vec_id").limit(9)
      .collect().map(_.getSeq[Float](1))
    def line(id: Long, t: String, v: Seq[Float]) =
      s"""{"vec_id":$id,"ts":"$t","embedding":[${v.mkString(",")}]}"""
    val dir = java.nio.file.Files.createTempDirectory("graft_cbswap").toFile
    val f = new java.io.File(dir, "vecs.jsonl")
    def append(ls: Seq[String]): Unit =
      java.nio.file.Files.write(f.toPath, (ls.mkString("\n") + "\n").getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
    val out = new java.io.File(dir, "out").getAbsolutePath
    val ckpt = new java.io.File(dir, "ckpt").getAbsolutePath
    val cbDir = new java.io.File(dir, "cb").getAbsolutePath

    assert(graft.ext.Similarity.publishCodebook(
      graft.ext.Similarity.codebook(corpus, 4), cbDir) === 1)
    def start() = {
      val decoded = spark.readStream
        .format(classOf[graft.io.ReplaySourceProvider].getName)
        .option("path", f.getAbsolutePath).load()
        .selectExpr(
          "from_json(value, 'vec_id BIGINT, ts TIMESTAMP, embedding ARRAY<FLOAT>') AS e")
        .selectExpr("e.vec_id AS vec_id", "e.ts AS ts", "e.embedding AS embedding")
      graft.ext.Similarity
        .semanticDedupStream(decoded,
          graft.ext.Similarity.latestCodebook(spark, cbDir))
        .writeStream
        .foreachBatch(graft.ext.Similarity.refreshingDedupSink(
          out, cbDir, k = 4, iters = 1, refreshEvery = 1))
        .option("checkpointLocation", ckpt).outputMode("append").start()
    }
    // batch 1 under codebook v1: 8 distinct corpus vectors
    val pre = (0 until 8).map(i => (10L + i, vecs(i)))
    append(pre.zipWithIndex.map { case ((id, v), i) =>
      line(id, f"2024-01-01 00:$i%02d:00", v) })
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    // the sink retrained from the survivors and published v2 while q1 ran
    val versionsAfterQ1 = graft.ext.Similarity.codebookVersions(spark, cbDir)
    assert(versionsAfterQ1.contains(2), s"expected a published retrain, got $versionsAfterQ1")

    // batch 2 after restart, under the RETRAINED codebook: an exact copy
    // of vec 10's vector, a novel vector, and a re-ask of the copy
    val post = Seq((20L, vecs(0)), (21L, vecs(8)), (22L, vecs(0)))
    append(Seq(
      line(20L, "2024-01-01 01:00:00", vecs(0)),
      line(21L, "2024-01-01 01:01:00", vecs(8)),
      line(22L, "2024-01-01 01:02:00", vecs(0))))
    val q2 = start(); q2.processAllAvailable(); q2.stop()

    // expected verdicts: simulate the state machine with keys computed by
    // the SAME projection the stream ran — old codebook for batch 1, new
    // for batch 2
    import org.apache.spark.sql.functions.col
    def keys(rows: Seq[(Long, Seq[Float])], cb: org.apache.spark.sql.DataFrame) =
      graft.ext.Similarity.withSemanticKey(
        rows.toDF("vec_id", "embedding").withColumn("ts", org.apache.spark.sql.functions.lit(ts("2024-01-01 00:00:00"))),
        cb)
        .select("vec_id", "cell", "qsig").collect()
        .map(r => r.getLong(0) -> ((if (r.isNullAt(1)) -1L else r.getLong(1), r.getLong(2)))).toMap
    val cbOld = spark.read.parquet(s"$cbDir/v=1")
    val cbNew = spark.read.parquet(s"$cbDir/v=${versionsAfterQ1.last}")
    val preKeys = keys(pre, cbOld)
    val postKeys = keys(post, cbNew)
    val seen = scala.collection.mutable.Set.empty[(Long, Long)]
    val expectedKept = scala.collection.mutable.ArrayBuffer.empty[Long]
    pre.map(_._1).foreach { id => if (seen.add(preKeys(id))) expectedKept += id }
    post.map(_._1).foreach { id => if (seen.add(postKeys(id))) expectedKept += id }
    val kept = spark.read.parquet(out).select(col("vec_id"))
      .as[Long].collect().sorted.toSeq
    assert(kept === expectedKept.sorted.toSeq,
      s"post-swap verdicts must match batch semantics under the new codebook: got $kept")
    // the re-ask of an already-admitted post-swap key is always dropped:
    // post-swap dedup operates under the new codebook
    assert(!kept.contains(22L))
    // the novel vector always survives
    assert(kept.contains(21L))
  }

  test("curateStream: streaming decontaminate → quality → dedup equals the batch composition", SlowTest) {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_curate").toString
    // choose tokens by their ACTUAL classifier weights so every branch
    // provably fires: strictly-positive tokens build surviving texts, a
    // negative token builds the quality-dropped doc
    val cands = (0 until 60).map(i => s"tok$i")
    val wts = graft.ext.TextOps.classifierScore(
      cands.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"))
      .collect().map(r => cands(r.getLong(0).toInt) -> r.getLong(2)).toMap
    val pos = cands.filter(t => wts(t) > 0).take(3)
    val neg = cands.find(t => wts(t) < 0).get
    assert(pos.length == 3, "need 3 positive-weight tokens")
    val benchText = s"${pos(0)} benchmark page"
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val tSurvive1 = pos.mkString(" ")         // positive score, clean
    val tSurvive2 = pos.reverse.mkString(" ") // same tokens, different text
    def t(m: Int) = ts(f"2024-01-01 00:$m%02d:00")
    val b1 = Seq(
      (1L, t(0), benchText),   // contaminated -> dropped by the screen
      (2L, t(1), tSurvive1),   // survivor
      (3L, t(2), neg),         // negative score -> dropped by quality
      (4L, t(3), tSurvive1))   // in-batch exact dup of 2 -> dropped
    val b2 = Seq(
      (5L, t(10), tSurvive1),  // cross-batch dup -> dropped by state
      (6L, t(11), tSurvive2))  // survivor
    val ms = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = graft.ext.CurationStream.curateStream(
      ms.toDS().toDF("doc_id", "ts", "text"), bench, s"$dir/out", s"$dir/cp")
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
    } finally q.stop()

    val survivors = spark.read.parquet(s"$dir/out/docs")
    assert(survivors.select("doc_id").as[Long].collect().sorted.toSeq === Seq(2L, 6L))
    // equals the batch composition on the union (arrival order = id
    // order here, so keep-first-arrival = keepFirstByText)
    val union = (b1 ++ b2).toDF("doc_id", "ts", "text")
    val clean = union.join(bench.select("text"), Seq("text"), "left_semi")
      .select("doc_id").as[Long].collect().toSet // contaminated ids
    val qual = graft.ext.TextOps.classifierScore(union)
      .filter(org.apache.spark.sql.functions.col("keep") === 1)
      .select("doc_id").as[Long].collect().toSet
    val expected = graft.ext.Dedup.keepFirstByText(
      union.filter(!org.apache.spark.sql.functions.col("doc_id").isInCollection(clean))
        .filter(org.apache.spark.sql.functions.col("doc_id").isInCollection(qual)))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(expected === Seq(2L, 6L)) // the reference composition agrees
    // accumulated report card == batch card over the same survivors
    val streamedCard = graft.ext.TextOps.corpusStatsFrom(spark, s"$dir/out/stats")
      .collect()(0)
    val batchCard = graft.ext.TextOps.corpusStats(
      survivors.select("doc_id", "text")).collect()(0)
    assert(streamedCard === batchCard)
    assert(streamedCard.getLong(0) === 2L) // n_docs = the two survivors
  }

  test("hotSwapDedupSink: a publish takes effect at the NEXT micro-batch — no restart") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_hotswap").toFile
    val out = new java.io.File(dir, "out").getAbsolutePath
    val ckpt = new java.io.File(dir, "ckpt").getAbsolutePath
    val cbDir = new java.io.File(dir, "cb").getAbsolutePath
    // synthetic codebooks with the SAME two axis centroids but the
    // cent_id <-> centroid pairing FLIPPED between versions: every
    // vector's cell id changes across the swap (cell = cent_id), while
    // qsig is codebook-independent — so the verdict on a repeated vector
    // discriminates exactly which codebook keyed the batch
    def unit(a: Int) =
      s"transform(sequence(0, 63), i -> cast(case when i = $a then 1.0 else 0.0 end as double))"
    def axisCb(pairing: Seq[(Int, Int)]) = spark.sql(
      s"SELECT array(${pairing.map { case (id, a) =>
        s"struct(cast($id as bigint) as cent_id, ${unit(a)} as cent_unit)" }
        .mkString(", ")}) AS cents")
    def oneHot(a: Int): Seq[Float] = Seq.tabulate(64)(i => if (i == a) 1f else 0f)
    val u1 = oneHot(0); val u2 = oneHot(1)
    assert(graft.ext.Similarity.publishCodebook(
      axisCb(Seq(0 -> 0, 1 -> 1)), cbDir) === 1)

    val b1 = Seq((10L, u1), (11L, u2), (12L, u1)) // 12 = in-batch dup of 10
    val b2 = Seq((20L, u1), (21L, u2), (22L, u1)) // repeats of both survivors
    val ms = MemoryStream[(Long, Seq[Float])]
    val q = ms.toDS().toDF("vec_id", "embedding").writeStream
      .foreachBatch(graft.ext.Similarity.hotSwapDedupSink(cbDir, out))
      .option("checkpointLocation", ckpt).start()
    try {
      ms.addData(b1); q.processAllAvailable()
      // publish the flipped pairing while the query is RUNNING — no
      // stop, no restart
      assert(graft.ext.Similarity.publishCodebook(
        axisCb(Seq(0 -> 1, 1 -> 0)), cbDir) === 2)
      ms.addData(b2); q.processAllAvailable()
    } finally q.stop()

    // under v2, u1 keys as (cell 1, qsig(u1)) — batch 1 stored it as
    // (cell 0, qsig(u1)) — so 20 is RE-ADMITTED (the documented
    // cross-swap contract), whereas if the swap had NOT landed, 20 and
    // 21 would both be dups of batch 1's survivors and be dropped
    val kept = spark.read.parquet(s"$out/data").select("vec_id")
      .as[Long].collect().sorted.toSeq
    assert(kept === Seq(10L, 11L, 20L, 21L), s"got $kept")
    // and the batch-2 key store holds exactly the V2 keys, computed by
    // the same projection the sink ran
    def keys(rows: Seq[(Long, Seq[Float])], cb: org.apache.spark.sql.DataFrame) =
      graft.ext.Similarity.withSemanticKey(rows.toDF("vec_id", "embedding"), cb)
        .select("cell", "qsig").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val storedB2 = spark.read.parquet(s"$out/keys").where("batch_id = 1")
      .select("cell", "qsig").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(storedB2 === keys(Seq((20L, u1), (21L, u2)), spark.read.parquet(s"$cbDir/v=2")),
      s"batch 2 must be keyed under the v2 codebook: $storedB2")
    assert(storedB2 !== keys(Seq((20L, u1), (21L, u2)), spark.read.parquet(s"$cbDir/v=1")),
      "test must discriminate the two codebooks")
  }

  test("hotSwapDedupSink: prior-key read prunes to the trailing window and replay is idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_hotswap2").toFile
    val out = new java.io.File(dir, "out").getAbsolutePath
    val cbDir = new java.io.File(dir, "cb").getAbsolutePath
    val corpus = Tables.embeddings(spark, "/root/testdata/sf0.001")
    graft.ext.Similarity.publishCodebook(graft.ext.Similarity.codebook(corpus, 2), cbDir)
    val v = corpus.select("embedding").head().getSeq[Float](0)
    val sink = graft.ext.Similarity.hotSwapDedupSink(
      cbDir, out, dedupBatches = 2, pruneKeys = true)
    def batchDf(id: Long) = Seq((id, v)).toDF("vec_id", "embedding")
    sink(batchDf(0L), 0L) // survivor
    sink(batchDf(1L), 1L) // dup of 0 within window -> dropped
    // replay of batch 1 (the foreachBatch crash contract): same verdict,
    // no duplicate rows
    sink(batchDf(1L), 1L)
    sink(batchDf(2L), 2L) // window = {0,1}: 0's key still in -> dropped
    sink(batchDf(3L), 3L) // window = {1,2}, both empty -> re-admitted
    val kept = spark.read.parquet(s"$out/data").select("vec_id")
      .as[Long].collect().sorted.toSeq
    assert(kept === Seq(0L, 3L), s"got $kept")
    // retention: key partitions below batch 3's window floor (id < 2) are
    // gone (all-dropped batches never wrote one); every SURVIVOR data
    // partition is retained — the product is never pruned
    val keyParts = new java.io.File(s"$out/keys").listFiles
      .filter(_.getName.startsWith("batch_id=")).map(_.getName).sorted.toSeq
    assert(keyParts === Seq("batch_id=3"), s"got $keyParts")
    val dataParts = new java.io.File(s"$out/data").listFiles
      .filter(_.getName.startsWith("batch_id=")).map(_.getName).sorted.toSeq
    assert(dataParts === Seq("batch_id=0", "batch_id=3"), s"got $dataParts")
    // pruning: the prior read carries a batch_id partition filter
    val plan = graft.ext.Similarity.priorKeys(spark, s"$out/keys", 3L, 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("batch_id"), plan)
  }

  test("refreshingDedupSink: retrain reads ONLY the trailing window — cost independent of stream length") {
    // The bound is enforced by parquet partition pruning on batch_id. We
    // prove "files outside the window are never opened" black-box: after
    // writing batches 0..3, the out-of-window batches' data files are
    // OVERWRITTEN WITH GARBAGE — if the refresh (fired at batch 4, window
    // = trailing 2) ever opened them, the parquet read would throw.
    val dir = java.nio.file.Files.createTempDirectory("graft_trail").toFile
    val out = new java.io.File(dir, "out").getAbsolutePath
    val cbDir = new java.io.File(dir, "cb").getAbsolutePath
    val sink = graft.ext.Similarity.refreshingDedupSink(
      out, cbDir, k = 1, iters = 1, refreshEvery = 5, trailingBatches = 2)
    // batches 0..2 point along axis 0; batches 3..4 along axis 1 — with
    // k=1 the retrained centroid betrays exactly which rows trained it
    def batchDf(id: Long, v: Seq[Float]) = Seq((id, v)).toDF("vec_id", "embedding")
    (0L to 2L).foreach(i => sink(batchDf(i, Seq(1f, 0f)), i))
    sink(batchDf(3L, Seq(0f, 1f)), 3L)

    // sanity before corruption: the trailing view sees only batches 2..3
    val trail23 = graft.ext.Similarity.trailingSurvivors(spark, out, 3L, 2)
    assert(trail23.select("vec_id").as[Long].collect().sorted.toSeq === Seq(2L, 3L))
    val plan = trail23.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("batch_id"), plan)

    for (i <- 0L to 2L; f <- new java.io.File(out, s"batch_id=$i").listFiles
         if f.getName.endsWith(".parquet"))
      java.nio.file.Files.write(f.toPath, "not a parquet file".getBytes("UTF-8"))

    sink(batchDf(4L, Seq(0f, 1f)), 4L) // fires the retrain over batches 3..4
    val vs = graft.ext.Similarity.codebookVersions(spark, cbDir)
    assert(vs === Seq(1), s"expected exactly the one retrain publish, got $vs")
    // k=1 centroid = mean of the trailing units = (0, 1): out-of-window
    // axis-0 rows contributed nothing
    val cent = graft.ext.Similarity.latestCodebook(spark, cbDir)
      .selectExpr("cents[0].cent_unit").as[Seq[Double]].head()
    assert(math.abs(cent(0)) < 1e-9 && math.abs(cent(1) - 1.0) < 1e-9, cent)
  }

  test("streaming PQ encode: arriving vectors code against the trained codebook, equal to batch") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Tables.embeddings(spark, "/root/testdata/sf0.001")
    // train once on the static corpus; the stream only ever sees the
    // broadcastable codebook frame — no state, no shuffle, no retrain
    val cb = graft.ext.Similarity.pqCodebook(corpus)
    val arrivals = corpus.select("vec_id", "embedding").orderBy("vec_id")
      .limit(6).collect().map(r => (r.getLong(0) + 5000L, r.getSeq[Float](1)))
    val ms = MemoryStream[(Long, Seq[Float])]
    val streamed = graft.ext.Similarity.pqEncodeWith(
      ms.toDS().toDF("vec_id", "embedding"), cb)
    val q = streamed.writeStream.format("memory").queryName("pq_stream")
      .outputMode("append").start()
    try {
      ms.addData(arrivals.take(3).toSeq)
      q.processAllAvailable()
      ms.addData(arrivals.drop(3).toSeq)
      q.processAllAvailable()
      val stream = spark.table("pq_stream")
        .select("vec_id", "s", "code", "qobj")
        .as[(Long, Int, Long, Long)].collect().sorted.toSeq
      val batch = graft.ext.Similarity.pqEncodeWith(
        arrivals.toSeq.toDF("vec_id", "embedding"), cb)
        .as[(Long, Int, Long, Long)].collect().sorted.toSeq
      assert(stream === batch)
      assert(stream.size === 6 * 8) // every (vector, subspace) coded
    } finally q.stop()
  }

  test("streaming PQ kNN: arriving queries ADC-rank against the packed code store, equal to the batch twin", SlowTest) {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val corpus = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cb = graft.ext.Similarity.pqCodebook(corpus)
    val qs = corpus.select("vec_id", "embedding").orderBy("vec_id").limit(3)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val ms = MemoryStream[(Long, Timestamp, Seq[Float])]
    val out = graft.ext.Similarity.pqKnnStream(
      ms.toDS().toDF("vec_id", "ts", "embedding"), corpus, cb,
      kNbrs = 3, delay = "0 seconds", windowLen = "10 minutes")
    val q = out.writeStream.format("memory").queryName("pqknn_stream")
      .outputMode("append").start()
    try {
      ms.addData(Seq(
        (qs(0)._1, ts("2024-01-01 00:01:00"), qs(0)._2),
        (qs(1)._1, ts("2024-01-01 00:02:00"), qs(1)._2),
        // a re-arrival inside the watermark: same request, deduped
        (qs(0)._1, ts("2024-01-01 00:03:00"), qs(0)._2),
        (qs(2)._1, ts("2024-01-01 00:04:00"), qs(2)._2)))
      q.processAllAvailable()
      ms.addData(Seq((qs(0)._1, ts("2024-01-02 00:00:00"), qs(0)._2)))
      q.processAllAvailable()
      val rows = spark.table("pqknn_stream")
        .where(org.apache.spark.sql.functions.col("window_start") === ts("2024-01-01 00:00:00"))
        .select("query_id", "nbr_ids").as[(Long, Seq[Long])].collect().toMap
      assert(rows.keySet === qs.map(_._1).toSet)
      // parity: the emitted ids equal the batch twin's ranked ids for
      // the same query vectors (ADC scores < 2^53 rank exactly through
      // the Double-scored aggregator)
      val batch = graft.ext.Similarity.pqAdcTopKJoin(
          qs.map { case (id, v) => (id, v) }.toSeq.toDF("vec_id", "embedding"),
          corpus, cb, kNbrs = 3)
        .orderBy("query_id", "rank")
        .select("query_id", "nbr_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
      qs.foreach { case (id, _) =>
        assert(rows(id) === batch(id), s"query $id: stream ${rows(id)} vs batch ${batch(id)}")
      }
    } finally q.stop()
  }

  test("streaming PQ kNN against a prebuilt persisted index equals the on-the-fly form", SlowTest) {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val corpus = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cb = graft.ext.Similarity.pqCodebook(corpus)
    // the production shape: the index is data built once — persisted
    // here; parquet-backed in a real deployment — so micro-batches
    // never re-pay the O(n·cells·dim) store construction
    val idx0 = graft.ext.Similarity.pqServingIndex(corpus, cb)
    val idx = graft.ext.Similarity.PqIndex(
      idx0.cents.persist(), idx0.store.persist())
    val qs = corpus.select("vec_id", "embedding").orderBy("vec_id").limit(3)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val ms = MemoryStream[(Long, Timestamp, Seq[Float])]
    val out = graft.ext.Similarity.pqKnnStreamOn(
      ms.toDS().toDF("vec_id", "ts", "embedding"), idx, cb,
      kNbrs = 3, delay = "0 seconds", windowLen = "10 minutes")
    val q = out.writeStream.format("memory").queryName("pqknn_stream_on")
      .outputMode("append").start()
    try {
      ms.addData(qs.toSeq.map { case (id, v) =>
        (id, ts("2024-01-01 00:01:00"), v) })
      q.processAllAvailable()
      // a next-day arrival advances the watermark so the first window
      // finalizes (append mode emits closed windows only)
      ms.addData(Seq((qs(0)._1, ts("2024-01-02 00:00:00"), qs(0)._2)))
      q.processAllAvailable()
      val rows = spark.table("pqknn_stream_on")
        .where(org.apache.spark.sql.functions.col("window_start") === ts("2024-01-01 00:00:00"))
        .select("query_id", "nbr_ids").as[(Long, Seq[Long])].collect().toMap
      val batch = graft.ext.Similarity.pqAdcTopKJoinOn(
          qs.toSeq.toDF("vec_id", "embedding"), idx, cb, kNbrs = 3)
        .orderBy("query_id", "rank")
        .select("query_id", "nbr_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
      assert(rows.keySet === qs.map(_._1).toSet)
      qs.foreach { case (id, _) => assert(rows(id) === batch(id)) }
    } finally {
      q.stop()
      idx.cents.unpersist()
      idx.store.unpersist()
    }
  }

  test("streaming kNN: arriving query vectors get windowed top-k from the static IVF index") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Tables.embeddings(spark, "/root/testdata/sf0.001")
    // two corpus vectors replayed as queries: each one's nearest corpus
    // neighbor is its own twin (cosine 1.0), deterministically first
    val qs = corpus.select("vec_id", "embedding").orderBy("vec_id").limit(2)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val ms = MemoryStream[(Long, Timestamp, Seq[Float])]
    val out = graft.ext.Similarity.knnStream(
      ms.toDS().toDF("vec_id", "ts", "embedding"), corpus,
      kNbrs = 3, k = 16, delay = "0 seconds", windowLen = "10 minutes")
    val q = out.writeStream.format("memory").queryName("knn_stream")
      .outputMode("append").start()
    try {
      ms.addData(Seq(
        (qs(0)._1, ts("2024-01-01 00:01:00"), qs(0)._2),
        (qs(1)._1, ts("2024-01-01 00:02:00"), qs(1)._2)))
      q.processAllAvailable()
      // watermark must pass the window end before append emits: flush
      ms.addData(Seq((qs(0)._1, ts("2024-01-02 00:00:00"), qs(0)._2)))
      q.processAllAvailable()
      val rows = spark.table("knn_stream")
        .select("query_id", "nbr_ids").as[(Long, Seq[Long])].collect().toMap
      assert(rows.keySet === qs.map(_._1).toSet)
      qs.foreach { case (id, _) =>
        val nbrs = rows(id)
        assert(nbrs.nonEmpty && nbrs.head === id,
          s"query $id: expected itself first, got $nbrs")
        assert(nbrs.length <= 3 && nbrs.distinct.length === nbrs.length)
      }
      // parity: past the self-hit, the emitted neighbors equal the batch
      // ivfTopK answer (which EXCLUDES the query id) — same cell
      // restriction, same rounded sims, same (sim desc, id asc) tie-break
      qs.foreach { case (id, _) =>
        val batch = graft.ext.Similarity.ivfTopK(corpus, queryVecId = id, k = 2)
          .select("vec_id").collect().map(_.getLong(0)).toSeq
        assert(rows(id).tail === batch,
          s"query $id: stream ${rows(id)} vs batch self+$batch")
      }
    } finally q.stop()
  }

  test("streaming kNN survives a checkpoint restart: pre-restart window state still emits") {
    // windowed-agg recovery: a query arrives BEFORE the restart, its
    // window closes AFTER — the emitted row proves the agg + dedup state
    // came back from the checkpoint (lost state would drop the query).
    val corpus = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val qs = corpus.select("vec_id", "embedding").orderBy("vec_id").limit(2)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    def line(id: Long, t: String, v: Seq[Float]) =
      s"""{"vec_id":$id,"ts":"$t","embedding":[${v.mkString(",")}]}"""
    val dir = java.nio.file.Files.createTempDirectory("graft_knnrec").toFile
    val f = new java.io.File(dir, "queries.jsonl")
    def append(ls: Seq[String]): Unit =
      java.nio.file.Files.write(f.toPath, (ls.mkString("\n") + "\n").getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
    val out = new java.io.File(dir, "out").getAbsolutePath
    val ckpt = new java.io.File(dir, "ckpt").getAbsolutePath
    def start() = {
      val decoded = spark.readStream
        .format(classOf[graft.io.ReplaySourceProvider].getName)
        .option("path", f.getAbsolutePath).load()
        .selectExpr(
          "from_json(value, 'vec_id BIGINT, ts TIMESTAMP, embedding ARRAY<FLOAT>') AS e")
        .selectExpr("e.vec_id AS vec_id", "e.ts AS ts", "e.embedding AS embedding")
      graft.ext.Similarity.knnStream(decoded, corpus,
        kNbrs = 3, k = 16, delay = "0 seconds", windowLen = "10 minutes")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append").start()
    }
    append(Seq(line(qs(0)._1, "2024-01-01 00:01:00", qs(0)._2)))
    val q1 = start()
    q1.processAllAvailable()
    q1.stop()
    // restart: a second query in the SAME window, then a flush that
    // advances the watermark past the window end
    append(Seq(
      line(qs(1)._1, "2024-01-01 00:02:00", qs(1)._2),
      line(99999L, "2024-01-02 00:00:00", qs(0)._2)))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val rows = spark.read.parquet(out)
      .select("query_id", "nbr_ids").as[(Long, Seq[Long])].collect().toMap
    assert(rows.keySet === qs.map(_._1).toSet, s"recovered windows: ${rows.keySet}")
    qs.foreach { case (id, _) =>
      assert(rows(id).nonEmpty && rows(id).head === id && rows(id).distinct.length === rows(id).length)
    }
  }

  test("piiScrub / classifierScore run unchanged on a stream and match batch bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    // pure projections: the same library call compiles to the same
    // expressions on a streaming frame — the streaming-twin contract the
    // minhash/decontamination ops already follow
    val docs = Seq(
      (1L, "contact me at alice@example.com or 10.0.0.7 please"),
      (2L, "plain words only, nothing sensitive here at all"),
      (3L, "")) // empty text: 0 tokens, score 0
    val ms = MemoryStream[(Long, String)]
    val streamed = graft.ext.TextOps.classifierScore(
      graft.ext.TextOps.piiScrub(ms.toDS().toDF("doc_id", "text"))
        .selectExpr("doc_id", "scrubbed as text", "n_emails", "n_ipv4"))
    val q = streamed.writeStream.format("memory").queryName("proj_stream")
      .outputMode("append").start()
    try {
      ms.addData(docs)
      q.processAllAvailable()
      val stream = spark.table("proj_stream").collect()
        .map(r => (r.getLong(0), r.getLong(2))).toMap // doc_id -> score_milli
      val batch = graft.ext.TextOps.classifierScore(
        graft.ext.TextOps.piiScrub(docs.toDF("doc_id", "text"))
          .selectExpr("doc_id", "scrubbed as text"))
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      assert(stream === batch)
      // and the scrub itself fired: doc 1's email/IP were redacted before
      // scoring (the scrubbed tokens <EMAIL>/<IP> are what got scored)
      val scrubbed = graft.ext.TextOps.piiScrub(docs.toDF("doc_id", "text"))
        .filter("doc_id = 1").select("scrubbed").collect()(0).getString(0)
      assert(scrubbed.contains("<EMAIL>") && scrubbed.contains("<IP>"))
    } finally q.stop()
  }

  test("decode drops corrupt Kafka payloads instead of failing the stream") {
    val good = """{"event_id":7,"ts":"2024-01-01 00:00:00","user_id":3,"event_type":"view","value":1.5,"props":"{}"}"""
    val kafkaShaped = Seq(good, "{not json", "", """{"event_id":null}""")
      .toDF("str")
      .selectExpr("cast(str as binary) as value", "cast(null as binary) as key",
        "'topic' as topic", "0 as partition", "0L as offset")
    val out = graft.io.Sources.decode(kafkaShaped).collect()
    assert(out.map(_.event_id).toSeq === Seq(7L))
  }

  test("observe: per-batch pipeline metrics without a second scan (the Monitors feed)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{count => cnt, lit, sum}
    val ms = MemoryStream[Event]
    // the reference's architecture feeds "Monitors" from the pipeline;
    // observe() attaches metrics to the SAME pass — no extra read
    val observed = ms.toDS()
      .observe("pipe", cnt(lit(1)).as("n_events"), sum($"value").as("total_value"))
    val q = observed.writeStream.format("memory").queryName("obs_out")
      .outputMode("append").start()
    try {
      ms.addData(Seq(
        ev(1, "2024-01-01 00:00:00", 1, "view", 2.5),
        ev(2, "2024-01-01 00:01:00", 2, "purchase", 7.5)))
      q.processAllAvailable()
      val m = q.lastProgress.observedMetrics.get("pipe")
      assert(m.getAs[Long]("n_events") === 2L)
      assert(m.getAs[Double]("total_value") === 10.0)
    } finally q.stop()
  }

  test("chained stateful operators: dedup THEN windowed aggregation in one query") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{count => cnt, window}
    val ms = MemoryStream[Event]
    // two stateful operators back-to-back (Spark 4 multi-stateful support):
    // exact dedup within the watermark, then a closed-window count
    val agg = ms.toDS()
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(window($"ts", "1 hour"))
      .agg(cnt("*").as("n"))
    val q = agg.writeStream.format("memory").queryName("chain_out")
      .outputMode("append").start()
    try {
      ms.addData(Seq(
        ev(1, "2024-01-01 00:10:00", 1),
        ev(1, "2024-01-01 00:10:00", 1), // same-batch duplicate
        ev(2, "2024-01-01 00:20:00", 2)))
      q.processAllAvailable()
      ms.addData(Seq(ev(1, "2024-01-01 00:10:00", 1))) // cross-batch duplicate
      q.processAllAvailable()
      ms.addData(Seq(ev(9, "2024-01-01 03:00:00", 1))) // watermark closes hour 0
      q.processAllAvailable()
      val closed = spark.table("chain_out").select("n").as[Long].collect()
      assert(closed.toSeq === Seq(2L)) // duplicates counted once
    } finally q.stop()
  }

  test("stream-stream interval join: purchase attributed to preceding click") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.expr
    val clicks = MemoryStream[Event]
    val buys = MemoryStream[Event]
    // both sides watermarked; the time-range condition bounds the state
    // each side must retain (Spark evicts rows older than watermark-range)
    val c = clicks.toDS().withWatermark("ts", "1 hour")
      .select($"event_id".as("click_id"), $"user_id".as("c_user"), $"ts".as("click_ts"))
    val b = buys.toDS().withWatermark("ts", "1 hour")
      .select($"event_id".as("buy_id"), $"user_id".as("b_user"), $"ts".as("buy_ts"))
    val joined = c.join(b, expr(
      "c_user = b_user AND buy_ts >= click_ts AND buy_ts <= click_ts + interval 30 minutes"))
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    try {
      clicks.addData(Seq(
        ev(1, "2024-01-01 00:00:00", 7, "click"),
        ev(2, "2024-01-01 00:00:00", 8, "click")))
      q.processAllAvailable()
      buys.addData(Seq(
        ev(10, "2024-01-01 00:10:00", 7, "purchase", 99.0), // inside 30-min window
        ev(11, "2024-01-01 02:00:00", 8, "purchase", 5.0))) // outside -> no match
      q.processAllAvailable()
      val rows = spark.table("ssj_out")
        .select("click_id", "buy_id").as[(Long, Long)].collect()
      assert(rows.toSeq === Seq((1L, 10L)))
    } finally q.stop()
  }

  test("trending tokens: per-window Misra-Gries sketches track shifting hot terms") {
    // one bounded sketch per event-time hour (groupByKey on the window
    // start): the "what's trending now" query with state = windows x
    // capacity entries, never windows x vocabulary
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String)]
    val byHour = ms.toDS()
      .groupByKey { case (t, _) => t.getTime / 3600000L }
      .agg(new graft.functions.MisraGriesAggregator[(Timestamp, String)](4, _._2)
        .toColumn.name("s"))
    val q = byHour.writeStream.format("memory").queryName("trend_out")
      .outputMode("complete").start()
    try {
      // hour 0 trends 'alpha'; hour 1 trends 'beta' — each against tail noise
      ms.addData(Seq.tabulate(40)(i =>
        (ts("2024-01-01 00:05:00"), if (i % 4 < 3) "alpha" else s"n$i")))
      ms.addData(Seq.tabulate(40)(i =>
        (ts("2024-01-01 01:05:00"), if (i % 4 < 3) "beta" else s"m$i")))
      q.processAllAvailable()
      val byWin = spark.table("trend_out") // KV agg keeps Out as a struct column
        .selectExpr("key", "s.candidates", "s.n_total")
        .as[(Long, Seq[String], Long)].collect()
        .map { case (k, c, n) => k -> ((c, n)) }.toMap
      assert(byWin.size === 2)
      val hours = byWin.keys.toSeq.sorted
      assert(byWin(hours(0))._1.contains("alpha") && !byWin(hours(0))._1.contains("beta"))
      assert(byWin(hours(1))._1.contains("beta") && !byWin(hours(1))._1.contains("alpha"))
      assert(byWin.values.forall { case (c, n) => c.size <= 4 && n == 40L })
    } finally q.stop()
  }

  test("Misra-Gries summary aggregates incrementally over a token stream") {
    // The heavy-hitter sketch must work as a streaming aggregate — the
    // state is one bounded summary, merged per micro-batch (complete
    // mode), so trending-token detection never materializes a
    // vocabulary-sized state store.
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[String]
    val agg = graft.functions.MisraGriesAggregator(8)
    val q = ms.toDS()
      .select(agg.toColumn.name("s"))
      .writeStream.format("memory").queryName("mg_out").outputMode("complete").start()
    val b1 = Seq.fill(30)("hot") ++ (1 to 10).map(i => s"t$i")
    val b2 = Seq.fill(25)("hot2") ++ (11 to 20).map(i => s"t$i")
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
      val out = spark.table("mg_out") // typed select flattens Out
        .select("candidates", "n_total").as[(Seq[String], Long)].collect()
      assert(out.length === 1)
      val (cands, n) = out.head
      assert(n === (b1.size + b2.size).toLong)
      // both dominant tokens survive the bounded summary across batches
      assert(cands.contains("hot") && cands.contains("hot2"))
      assert(cands.size <= 8)
    } finally q.stop()
  }

  test("dqQuarantineSink: one query routes clean vs failing rows; replay idempotent") {
    import graft.ops.Quality
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_dlq").toString
    val rules = Seq(
      Quality.NotNull("event_type"),
      Quality.InRange("value", 0, 100))
    val rows = Seq(
      ev(1, "2024-01-01 00:00:00", 1, "view", 5.0),     // clean
      ev(2, "2024-01-01 00:01:00", 1, null, 5.0),       // null type
      ev(3, "2024-01-01 00:02:00", 2, "click", -3.0),   // range
      ev(4, "2024-01-01 00:03:00", 2, "click", 7.0))    // clean
    def deliver(ckpt: String): Unit = {
      val ms = MemoryStream[Event]
      ms.addData(rows)
      val q = graft.io.Sinks.dqQuarantineSink(
        ms.toDS().toDF(), rules, s"$dir/out", s"$dir/$ckpt")
      q.processAllAvailable(); q.stop()
    }
    deliver("ckpt1")
    val clean = spark.read.parquet(s"$dir/out/clean/batch_0")
    val bad = spark.read.parquet(s"$dir/out/quarantine/batch_0")
    assert(clean.select("event_id").as[Long].collect().sorted.toSeq === Seq(1L, 4L))
    val verdicts = bad.select("event_id", "failed_rules")
      .as[(Long, Seq[String])].collect().toMap
    assert(verdicts(2L) === Seq("not_null:event_type"))
    assert(verdicts(3L) === Seq("in_range:value"))
    // replay with a fresh checkpoint (same batch id 0): both legs converge
    deliver("ckpt2")
    assert(spark.read.parquet(s"$dir/out/clean/batch_0").count() === 2L)
    assert(spark.read.parquet(s"$dir/out/quarantine/batch_0").count() === 2L)
  }

  test("stream-stream interval join: batch parity; watermark evicts click state") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val mc = MemoryStream[Event]
    val mp = MemoryStream[Event]
    def side(ms: MemoryStream[Event]) = ms.toDS()
      .select(col("user_id"), col("event_id"), col("ts"))
      .withWatermark("ts", "10 minutes")
    val joined = graft.streaming.StreamJoins.clickToConversion(side(mc), side(mp), "30 minutes")
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    try {
      val clicks1 = Seq(ev(1, "2024-01-01 10:00:00", 7, "click"),
        ev(2, "2024-01-01 10:01:00", 8, "click"))
      val buys1 = Seq(ev(100, "2024-01-01 10:05:00", 7, "purchase"),
        ev(101, "2024-01-01 11:00:00", 7, "purchase"), // outside the 30-min band
        ev(102, "2024-01-01 10:20:00", 9, "purchase")) // no matching user
      mc.addData(clicks1); mp.addData(buys1); q.processAllAvailable()
      val got = spark.table("ssj_out")
        .select("click_id", "purchase_id", "gap_us")
        .as[(Long, Long, Long)].collect().toSet
      // parity with the SAME builder run on batch frames
      val want = graft.streaming.StreamJoins.clickToConversion(
          clicks1.toDF().select(col("user_id"), col("event_id"), col("ts")),
          buys1.toDF().select(col("user_id"), col("event_id"), col("ts")),
          "30 minutes")
        .select("click_id", "purchase_id", "gap_us")
        .as[(Long, Long, Long)].collect().toSet
      assert(got === want)
      assert(got === Set((1L, 100L, 300000000L)))
      // advance both watermarks past click-1's ts + band + lateness …
      mc.addData(ev(3, "2024-01-01 13:00:00", 50, "click"))
      mp.addData(ev(200, "2024-01-01 13:00:00", 51, "purchase"))
      q.processAllAvailable()
      // … then a purchase that WOULD pair with click 1 arrives too late:
      // the click's state row is evicted and the input row is late-dropped
      // — no pair may appear
      mp.addData(ev(300, "2024-01-01 10:10:00", 7, "purchase"))
      q.processAllAvailable()
      val pids = spark.table("ssj_out").select("purchase_id").as[Long].collect().toSet
      assert(!pids.contains(300L))
    } finally q.stop()
  }

  test("Monitors: per-batch progress persists to the store; health rollup; dedup on redelivery") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Monitors
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_mon").toString
    val listener = Monitors.attach(spark, s"$dir/store")
    val ms = MemoryStream[Event]
    val q = ms.toDS().groupBy("event_type").count()
      .writeStream.format("memory").queryName("mon_probe")
      .outputMode("complete").start()
    try {
      ms.addData(ev(1, "2024-01-01 10:00:00", 7), ev(2, "2024-01-01 10:01:00", 8))
      q.processAllAvailable()
      ms.addData(ev(3, "2024-01-01 10:02:00", 7))
      q.processAllAvailable()
      // listener delivery is async — poll until both batches landed
      def rows() =
        try Monitors.progress(spark, s"$dir/store")
          .where(col("query_name") === "mon_probe" && col("num_input_rows") > 0)
          .as[graft.streaming.BatchProgress].collect().toSeq
        catch { case _: Throwable => Seq.empty }
      var tries = 0
      while (rows().size < 2 && tries < 100) { Thread.sleep(100); tries += 1 }
      val got = rows()
      assert(got.size >= 2, s"expected >=2 data batches, got $got")
      assert(got.map(_.num_input_rows).sum === 3L)
      assert(got.forall(_.batch_duration_ms >= 0L))
      val h = Monitors.health(spark, s"$dir/store")
        .where(col("query_name") === "mon_probe")
        .select("total_rows").as[Long].head()
      // health counts every monitored row exactly once (idle batches add 0)
      assert(h === 3L)
      // redelivery of a progress row is deduped by (query, batch)
      val dup = got.head
      Seq(dup).toDS().write.mode("append").parquet(s"$dir/store")
      assert(Monitors.progress(spark, s"$dir/store")
        .where(col("query_name") === "mon_probe" && col("num_input_rows") > 0)
        .count() === got.size.toLong)
    } finally {
      q.stop()
      spark.streams.removeListener(listener)
    }
  }

  test("rateLimitStream: quota carries across micro-batches; equals the batch twin in-order") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.RateLimiter
    val ms = MemoryStream[Event]
    val out = RateLimiter.rateLimitStream(ms.toDS(), maxPer = 2)
    val q = out.writeStream.format("memory").queryName("rl_out")
      .outputMode("append").start()
    // user 7: 2 admitted in hour 10, the 3rd (arriving in batch 2, same
    // hour) throttled, hour 11 resets; user 8 under quota throughout
    val b1 = Seq(ev(1, "2024-01-01 10:00:00", 7), ev(2, "2024-01-01 10:10:00", 7),
      ev(3, "2024-01-01 10:05:00", 8))
    val b2 = Seq(ev(4, "2024-01-01 10:20:00", 7), ev(5, "2024-01-01 11:01:00", 7),
      ev(6, "2024-01-01 10:30:00", 8))
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("rl_out").select("event_id", "admitted")
      .as[(Long, Boolean)].collect().toMap
    assert(got === Map(1L -> true, 2L -> true, 3L -> true,
      4L -> false, 5L -> true, 6L -> true))
    // batch twin agrees row for row on the same (in-order) stream
    val batch = RateLimiter.rateLimit(
      (b1 ++ b2).toDF(), "user_id", "ts", "event_id", maxPer = 2)
      .select("event_id", "admitted")
      .as[(Long, Boolean)].collect().toMap
    assert(batch === got)
  }

  test("stream-stream LEFT OUTER interval join: unmatched click emits NULL row on watermark", SlowTest) {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val mc = MemoryStream[Event]
    val mp = MemoryStream[Event]
    def side(ms: MemoryStream[Event]) = ms.toDS()
      .select(col("user_id"), col("event_id"), col("ts"))
      .withWatermark("ts", "10 minutes")
    val joined = graft.streaming.StreamJoins.clickToConversionOuter(
      side(mc), side(mp), "30 minutes")
    val q = joined.writeStream.format("memory").queryName("ssj_outer")
      .outputMode("append").start()
    try {
      val clicks1 = Seq(ev(1, "2024-01-01 10:00:00", 7, "click"),
        ev(2, "2024-01-01 10:01:00", 8, "click")) // user 8 never converts
      val buys1 = Seq(ev(100, "2024-01-01 10:05:00", 7, "purchase"))
      mc.addData(clicks1); mp.addData(buys1); q.processAllAvailable()
      def got() = spark.table("ssj_outer")
        .select("click_id", "purchase_id", "gap_us")
        .as[(Long, Option[Long], Option[Long])].collect().toSet
      // matched pair emits immediately; the unmatched click must WAIT —
      // a match is still possible until the watermark passes ts + band
      assert(got() === Set((1L, Some(100L), Some(300000000L))))
      // advance both watermarks well past click-2's ts + band + lateness:
      // its NULL row is now provably unmatchable and must emit
      mc.addData(ev(3, "2024-01-01 13:00:00", 50, "click"))
      mp.addData(ev(200, "2024-01-01 13:00:00", 51, "purchase"))
      q.processAllAvailable()
      mc.addData(ev(4, "2024-01-01 14:00:00", 60, "click"))
      mp.addData(ev(201, "2024-01-01 14:00:00", 61, "purchase"))
      q.processAllAvailable()
      assert(got().contains((2L, None, None)))
      // batch parity: the same builder on batch frames left-joins everything
      val all = (clicks1 ++ Seq(ev(3, "2024-01-01 13:00:00", 50, "click"),
        ev(4, "2024-01-01 14:00:00", 60, "click")))
        .toDF().select(col("user_id"), col("event_id"), col("ts"))
      val buysAll = (buys1 ++ Seq(ev(200, "2024-01-01 13:00:00", 51, "purchase"),
        ev(201, "2024-01-01 14:00:00", 61, "purchase")))
        .toDF().select(col("user_id"), col("event_id"), col("ts"))
      val batch = graft.streaming.StreamJoins.clickToConversionOuter(all, buysAll, "30 minutes")
        .select("click_id", "purchase_id", "gap_us")
        .as[(Long, Option[Long], Option[Long])].collect().toSet
      // every streamed row is a batch row; batch additionally holds clicks
      // whose horizon the stream's watermark hasn't passed yet
      assert(got().subsetOf(batch))
      assert(batch.contains((2L, None, None)) && batch.contains((4L, None, None)))
    } finally q.stop()
  }

  test("keywordTagSink: cross-batch accumulation, replay idempotence, empty store, stream drive") {
    import graft.ext.TextOps
    val dir = java.nio.file.Files.createTempDirectory("graft_kwtag").toString
    val pats = Seq("agg", "agg row", "zz")
    val docsA = Seq((1L, "agg row agg"), (2L, "plain")).toDF("doc_id", "text")
    val docsB = Seq((3L, "agg")).toDF("doc_id", "text")
    // empty store: the report of zero batches is the empty report
    assert(TextOps.keywordTagFrom(spark, dir).collect().isEmpty)
    // manual ids far from 0: the stream-driven leg below starts its own
    // checkpoint at batch 0, and ids must not collide in the shared store
    TextOps.keywordTagBatch(docsA, pats, dir, 10L)
    TextOps.keywordTagBatch(docsB, pats, dir, 11L)
    def got() = TextOps.keywordTagFrom(spark, dir)
      .as[(String, Long, Long)].collect().toSet
    // doc1: "agg row agg" -> agg x2 (closure fires inside "agg row"),
    // agg row x1; doc3: agg x1
    assert(got() === Set(("agg", 3L, 2L), ("agg row", 1L, 1L)))
    // last-batch redelivery converges (whole-dir overwrite)
    TextOps.keywordTagBatch(docsB, pats, dir, 11L)
    assert(got() === Set(("agg", 3L, 2L), ("agg row", 1L, 1L)))
    // equals the batch twin rolled up over the union
    val twin = TextOps.keywordTag(docsA.unionAll(docsB), pats)
      .groupBy(org.apache.spark.sql.functions.col("pattern"))
      .agg(org.apache.spark.sql.functions.sum("n_hits").as("hits"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_docs"))
      .as[(String, Long, Long)].collect().toSet
    assert(got() === twin)
    // the real writeStream front: one more batch through the sink
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_kwtag_ckpt").toString
    val q = TextOps.keywordTagSink(
      ms.toDS().toDF("doc_id", "text"), pats, dir, ckpt)
    try {
      ms.addData(Seq((9L, "zz and agg")))
      q.processAllAvailable()
    } finally q.stop()
    assert(got() === Set(("agg", 4L, 3L), ("agg row", 1L, 1L), ("zz", 1L, 1L)))
  }

  test("observe on a stream: per-batch audit metrics surface in progress, exactly once per batch") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Event]
    val cols = graft.ops.Observe.auditMetrics("user_id", "value")
    val q = ms.toDS().toDF()
      .where(org.apache.spark.sql.functions.col("event_type").isNotNull)
      .observe("audit", cols.head, cols.tail: _*)
      .writeStream.format("memory").queryName("observe_out")
      .outputMode("append").start()
    try {
      ms.addData(Seq(ev(1, "2024-01-01 00:00:00", 7, v = 1.5),
        ev(2, "2024-01-01 00:01:00", 8, v = 2.25),
        Event(3, ts("2024-01-01 00:02:00"), 9, null, 4.0, "{}")))
      q.processAllAvailable()
      ms.addData(Seq(ev(4, "2024-01-01 00:03:00", 7, v = 10.0)))
      q.processAllAvailable()
      val audits = q.recentProgress.toSeq
        .filter(_.numInputRows > 0)
        .flatMap(p => Option(p.observedMetrics.get("audit")))
      assert(audits.size === 2, audits.mkString("; "))
      def triple(r: org.apache.spark.sql.Row) =
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_null_keys"),
          r.getAs[java.math.BigDecimal]("sum_measure").doubleValue())
      // batch 1: the null event_type row is filtered BEFORE the observe
      // node, so the audit sees exactly what the sink saw
      assert(triple(audits.head) === ((2L, 0L, 3.75)))
      assert(triple(audits(1)) === ((1L, 0L, 10.0)))
    } finally q.stop()
  }

  test("nbModelSink: streamed count partials fold to the batch model; cross-batch evidence; replay idempotent; empty store truthful", SlowTest) {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_nbmodel").toString
    // class vocabularies arrive SPLIT ACROSS BATCHES: 'aa' evidence for
    // token foo lands in batch 1 AND batch 2 — a reader that unions
    // per-batch verdicts instead of folding counts would halve foo's
    // weight; 'bb' trains only in batch 2
    val b1 = Seq((1L, "foo bar foo", "aa"), (2L, "foo baz", "aa"))
    val b2 = Seq((3L, "foo bar", "aa"), (6L, "qux quux qux", "bb"), (7L, "qux corge", "bb"))
    val evalDocs = Seq(
      (5L, "foo bar baz", "aa"), (10L, "qux quux", "bb")).toDF("doc_id", "text", "lang")
    val ms = MemoryStream[(Long, String, String)]
    val q = graft.ext.Classify.nbModelSink(
      ms.toDS().toDF("doc_id", "text", "lang"), s"$dir/out", s"$dir/cp")
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val streamed = graft.ext.Classify
      .nbClassifyFrom(spark, evalDocs, s"$dir/out")
      .as[(Long, String, String, Long, Int)].collect().sortBy(_._1).toSeq
    // the folded store scores the held-out docs correctly (both classes'
    // evidence assembled across batches)
    assert(streamed.map(r => (r._1, r._2, r._3, r._5)) === Seq(
      (5L, "aa", "aa", 1), (10L, "bb", "bb", 1)))
    // replay idempotence: re-running batch 1's contribution must not
    // double-count (overwrite, not append)
    graft.ext.Classify.nbModelBatch(b1.toDF("doc_id", "text", "lang"), s"$dir/out", 0L)
    val replayed = graft.ext.Classify
      .nbClassifyFrom(spark, evalDocs, s"$dir/out")
      .as[(Long, String, String, Long, Int)].collect().sortBy(_._1).toSeq
    assert(replayed === streamed)
    // cross-batch fold check: foo appears 4× in 'aa' across batches —
    // the folded (cls=aa, b=bucket(foo)) count must be 4, not max 3
    val fooB = spark.range(1).selectExpr(
      s"${graft.ext.TextOps.md5Long64("'foo'")} % 4096 AS b").as[Long].head()
    val fooCnt = spark.read.parquet(s"$dir/out/cnt/batch_0", s"$dir/out/cnt/batch_1")
      .where(s"cls = 'aa' AND b = $fooB")
      .selectExpr("CAST(SUM(c) AS BIGINT)").as[Long].head()
    assert(fooCnt === 4L)
    // empty store: classifies nothing, correct schema, no crash
    val empty = graft.ext.Classify
      .nbClassifyFrom(spark, evalDocs, s"$dir/empty_out")
    assert(empty.columns.toSeq === Seq("doc_id", "lang", "pred", "score", "correct"))
    assert(empty.count() === 0L)
  }

  test("state-store batch reader: a live aggregation's checkpoint state is inspectable as a DataFrame") {
    // the ops surface for "what is this pipeline holding right now":
    // Spark's `statestore` batch source reads a streaming checkpoint's
    // state directly — no sink, no code in the job itself. Run a keyed
    // count, then audit the checkpoint: per-key state must equal what
    // the stream has seen, and the reader must see it WITHOUT the query
    // being stopped first (it reads committed snapshots).
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, count, lit, sum}
    val ckpt = java.nio.file.Files.createTempDirectory("graft_statestore").toString
    val ms = MemoryStream[(String, Long)]
    val counts = ms.toDS().toDF("k", "v")
      .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    val q = counts.writeStream
      .format("noop")
      .option("checkpointLocation", ckpt)
      .outputMode("update")
      .start()
    try {
      ms.addData(Seq(("a", 1L), ("a", 2L), ("b", 10L)))
      q.processAllAvailable()
      ms.addData(Seq(("a", 4L), ("c", 7L)))
      q.processAllAvailable()
      val state = spark.read.format("statestore").load(ckpt)
      // schema: key struct, value struct (the AGG BUFFER fields — named
      // for the physical aggregates, not the output aliases), partition_id
      val rows = state
        .select(col("key.k").as("k"), col("value.count").as("n"), col("value.sum").as("sv"))
        .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
      assert(rows === Seq(("a", 3L, 7L), ("b", 1L, 10L), ("c", 1L, 7L)))
    } finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
    }
  }

  test("sessionizeTwsClosed: event-time timers close idle sessions and evict state; in-batch gaps close inline", SlowTest) {
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[Event]
      val q = StreamingSessionizer.sessionizeTwsClosed(ms.toDS())
        .writeStream.format("memory").queryName("tws_closed")
        .outputMode("append").start()
      def rows: Seq[(Long, Long, String, Long)] =
        spark.table("tws_closed")
          .select("user_id", "session_seq", "session_id", "n_events")
          .as[(Long, Long, String, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
      try {
        // user 7's IN-BATCH >30-min gap closes session 7-1 inline; the
        // batch also advances the watermark to 01:00 − 10 min = 00:50,
        // past user 5's 00:40 deadline — its timer fires in the no-data
        // follow-up batch processAllAvailable drains, so 5-1 closes too
        // (and 7-2's 01:30 deadline does not)
        ms.addData(Seq(
          ev(1, "2024-01-01 00:00:00", 5), ev(2, "2024-01-01 00:10:00", 5),
          ev(3, "2024-01-01 00:00:00", 7), ev(4, "2024-01-01 01:00:00", 7)))
        q.processAllAvailable()
        assert(rows === Seq((5L, 1L, "5-1", 2L), (7L, 1L, "7-1", 1L)))
        // a new user's event pushes the watermark (02:00 − 10 min =
        // 01:50) past user 5's 00:40 deadline AND user 7's 01:30 one:
        // both idle sessions close via the TIMER path and evict
        ms.addData(Seq(ev(5, "2024-01-01 02:00:00", 6)))
        q.processAllAvailable()
        assert(rows === Seq(
          (5L, 1L, "5-1", 2L), (7L, 1L, "7-1", 1L), (7L, 2L, "7-2", 1L)))
        // user 5 returns AFTER eviction: state is gone, numbering
        // restarts at session 1 by design (the closure record is the
        // durable artifact); this event also closes user 6's session
        // (watermark 03:20 − 10 min = 03:10 > 02:30)
        ms.addData(Seq(ev(6, "2024-01-01 03:20:00", 5)))
        q.processAllAvailable()
        assert(rows === Seq(
          (5L, 1L, "5-1", 2L), (6L, 1L, "6-1", 1L),
          (7L, 1L, "7-1", 1L), (7L, 2L, "7-2", 1L)))
      } finally q.stop()
    } finally {
      prev match {
        case Some(p) => spark.conf.set(key, p); case None => spark.conf.unset(key)
      }
    }
  }

  test("sessionizeTwsClosed equals the batch twin on (user, n_events, last_ts); seq diverges after eviction by design", SlowTest) {
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // user 5 reopens AFTER its first session is timer-evicted; the
      // final sentinel event closes everything still open
      val batches = Seq(
        Seq(ev(1, "2024-01-01 00:00:00", 5), ev(2, "2024-01-01 00:10:00", 5),
          ev(3, "2024-01-01 00:20:00", 8)),
        Seq(ev(4, "2024-01-01 02:00:00", 6)),
        Seq(ev(5, "2024-01-01 03:20:00", 5)),
        Seq(ev(6, "2024-01-01 10:00:00", 99)))
      val ms = MemoryStream[Event]
      val q = StreamingSessionizer.sessionizeTwsClosed(ms.toDS())
        .writeStream.format("memory").queryName("tws_closed_eq")
        .outputMode("append").start()
      try batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      finally q.stop()
      val streamed = spark.table("tws_closed_eq")
        .select("user_id", "n_events", "last_ts")
        .as[(Long, Long, Timestamp)].collect()
        .map(r => (r._1, r._2, r._3.getTime)).sorted.toSeq
      val batch = graft.session.Sessionize.closedSessions(
        batches.flatten.toDF())
        .select("user_id", "n_events", "last_ts")
        .as[(Long, Long, Timestamp)].collect()
        .map(r => (r._1, r._2, r._3.getTime)).sorted.toSeq
      assert(streamed === batch)
      // every session except the sentinel's own is closed
      assert(streamed.map(r => (r._1, r._2)) ===
        Seq((5L, 2L), (5L, 1L), (6L, 1L), (8L, 1L)).sorted)
      // the documented divergence: the stream restarts an evicted user at
      // seq 1 (two closures labeled 5-1); the batch twin numbers 5-2
      val streamedIds = spark.table("tws_closed_eq")
        .where(org.apache.spark.sql.functions.col("user_id") === 5L).select("session_id")
        .as[String].collect().sorted.toSeq
      assert(streamedIds === Seq("5-1", "5-1"))
      assert(graft.session.Sessionize.closedSessions(batches.flatten.toDF())
        .where(org.apache.spark.sql.functions.col("user_id") === 5L).select("session_id")
        .as[String].collect().sorted.toSeq === Seq("5-1", "5-2"))
    } finally {
      prev match {
        case Some(p) => spark.conf.set(key, p); case None => spark.conf.unset(key)
      }
    }
  }

  test("sessionizeTwsClosed: a registered event-time timer survives a checkpoint " +
    "restart and fires exactly once") {
    // the schema-evolution case proves STATE survives an upgrade; this
    // one proves TIMERS do — register an inactivity deadline, stop the
    // query BEFORE any watermark can reach it, resume from the
    // checkpoint, advance the watermark, and the restored timer must
    // close the session exactly once
    implicit val sqlCtx = spark.sqlContext
    import scala.jdk.CollectionConverters._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_tws_timer").toString
    // foreachBatch is at-least-once; keying by batchId makes the buffer
    // exactly-once under any replay (the standard idempotent-sink shape)
    val seen = new java.util.concurrent.ConcurrentHashMap[
      Long, Seq[(Long, Long, Long, Long)]]()
    val sink: (org.apache.spark.sql.Dataset[graft.streaming.ClosedSession], Long) => Unit =
      (b, id) => seen.put(id,
        b.collect().toSeq.map(c => (c.user_id, c.session_seq, c.n_events, c.last_ts.getTime)))
    def start(ms: MemoryStream[Event]) =
      StreamingSessionizer.sessionizeTwsClosed(ms.toDS())
        .writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .foreachBatch(sink)
        .start()
    try {
      val ms = MemoryStream[Event]
      val q1 = start(ms)
      try {
        // registers user 5's 00:40 inactivity deadline; the watermark
        // only reaches 00:10 − 10 min = 00:00, so it cannot fire yet
        ms.addData(Seq(
          ev(1, "2024-01-01 00:00:00", 5), ev(2, "2024-01-01 00:10:00", 5)))
        q1.processAllAvailable()
      } finally q1.stop()
      assert(seen.values.asScala.flatten.isEmpty, "nothing may close before the restart")
      // resume from the checkpoint: timer + state must both come back
      val q2 = start(ms)
      try {
        // watermark → 02:00 − 10 min = 01:50, past the restored 00:40
        // deadline; the timer fires in the no-data follow-up batch
        ms.addData(Seq(ev(3, "2024-01-01 02:00:00", 6)))
        q2.processAllAvailable()
      } finally q2.stop()
      assert(seen.values.asScala.flatten.toSeq ===
        Seq((5L, 1L, 2L, ts("2024-01-01 00:10:00").getTime)))
    } finally {
      prev match {
        case Some(p) => spark.conf.set(key, p); case None => spark.conf.unset(key)
      }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
    }
  }

  test("transformWithState schema evolution: V2 state with an added Option field resumes a V1 checkpoint") {
    // Upgrade day: the shipped SessionProcessor wrote SessionState rows
    // into a checkpoint; the next release adds an optional field to the
    // state class. The reference's Redis hash survived such pushes
    // trivially (external schemaless store); Spark-managed state must
    // prove it under transformWithState's Avro state encoding (the
    // unsaferow default has no evolution story). The resumed V2 query
    // must DECODE the V1 rows (user 5's >30-min gap in the post-restart
    // batch opens session 2 only if sessionSeq/lastTs were recovered)
    // and the merged output must equal the never-upgraded reference.
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_tws_evolve").toString
    val b1 = Seq(ev(1, "2024-01-01 00:00:00", 5, "purchase", 42.5),
      ev(2, "2024-01-01 00:10:00", 5))
    val b2 = Seq(ev(3, "2024-01-01 00:20:00", 5))
    val b3 = Seq(ev(4, "2024-01-01 01:30:00", 5), ev(5, "2024-01-01 01:31:00", 6))
    val ref = run(Seq(b1, b2, b3)) // uninterrupted v1 reference

    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val encKey = "spark.sql.streaming.stateStore.encodingFormat"
    val prevProv = spark.conf.getOption(provKey)
    val prevEnc = spark.conf.getOption(encKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(encKey, "avro")
    try {
      val ms = MemoryStream[Event]
      val outEnc = org.apache.spark.sql.Encoders.product[SessionizedEvent]
      def sink(df: org.apache.spark.sql.Dataset[SessionizedEvent]) = df
        .writeStream.format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt")
        .outputMode("append")
      // leg 1: the SHIPPED (V1) processor writes SessionState
      val q1 = sink(StreamingSessionizer.sessionizeTws(ms.toDS())).start()
      ms.addData(b1); q1.processAllAvailable()
      ms.addData(b2); q1.processAllAvailable()
      q1.stop()
      // data arrives during the deploy; the V2 processor resumes the
      // SAME checkpoint and state column family
      ms.addData(b3)
      val v2 = ms.toDS()
        .groupByKey(_.user_id)(org.apache.spark.sql.Encoders.scalaLong)
        .transformWithState(
          new SessionProcessorV2(30L),
          org.apache.spark.sql.streaming.TimeMode.None(),
          org.apache.spark.sql.streaming.OutputMode.Append())(outEnc)
      val q2 = sink(v2).start()
      try q2.processAllAvailable() finally q2.stop()

      val got = spark.read.parquet(s"$dir/out").as[SessionizedEvent]
        .collect().sortBy(_.event_id).toSeq
      assert(got === ref)
      assert(got.map(_.session_id) === Seq("5-1", "5-1", "5-1", "5-2", "6-1"))
      // carry-forward proves the Option field decode path too: batch-1's
      // purchase survives into the V2-resumed session
      assert(got.map(_.last_purchase_value) ===
        Seq(Some(42.5), Some(42.5), Some(42.5), Some(42.5), None))
    } finally {
      prevProv match {
        case Some(p) => spark.conf.set(provKey, p); case None => spark.conf.unset(provKey)
      }
      prevEnc match {
        case Some(p) => spark.conf.set(encKey, p); case None => spark.conf.unset(encKey)
      }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}

/** Upgrade-day twin of [[graft.model.SessionState]]: the same fields plus
  * an appended OPTIONAL rollup — the evolution shape transformWithState's
  * Avro encoding supports (new nullable field, defaulting NULL when a
  * pre-upgrade row is decoded).
  */
case class SessionStateV2(
    userId: Long,
    sessionSeq: Long,
    lastTs: Long,
    lastEventType: String,
    lastPurchaseValue: Option[Double],
    eventsInSession: Long,
    totalValue: Option[Double])

/** V2 of [[graft.streaming.SessionProcessor]]: reads whatever schema the
  * store holds into [[SessionStateV2]] (old rows surface totalValue =
  * None), runs the same shared transition, and writes V2 rows with the
  * new rollup populated — the exact code shape a production upgrade
  * ships.
  */
class SessionProcessorV2(gapMinutes: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, Event, SessionizedEvent] {

  @transient private var session: org.apache.spark.sql.streaming.ValueState[SessionStateV2] = _

  override def init(
      outputMode: org.apache.spark.sql.streaming.OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    session = getHandle.getValueState[SessionStateV2](
      "session", org.apache.spark.sql.Encoders.product[SessionStateV2],
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInputRows(
      userId: Long,
      rows: Iterator[Event],
      timers: org.apache.spark.sql.streaming.TimerValues): Iterator[SessionizedEvent] = {
    val initial =
      if (session.exists()) {
        val v2 = session.get()
        graft.model.SessionState(v2.userId, v2.sessionSeq, v2.lastTs,
          v2.lastEventType, v2.lastPurchaseValue, v2.eventsInSession)
      } else null
    val prevTotal =
      if (session.exists()) session.get().totalValue.getOrElse(0.0) else 0.0
    val rowSeq = rows.toSeq
    val (out, st) = StreamingSessionizer.transition(
      gapMinutes, userId, rowSeq.iterator, initial)
    if (st != null)
      session.update(SessionStateV2(st.userId, st.sessionSeq, st.lastTs,
        st.lastEventType, st.lastPurchaseValue, st.eventsInSession,
        Some(prevTotal + rowSeq.map(_.value).sum)))
    out.iterator
  }
}
