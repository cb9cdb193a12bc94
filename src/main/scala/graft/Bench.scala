package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line with per-query and total seconds.
  *
  * Each query is executed once untimed (JVM/codegen/parquet-footer warmup)
  * and then three timed runs, reporting the per-query MEDIAN plus a
  * dispersion figure (relative spread, (max−min)/median) — the round-5
  * verdict found box-load variance (43→58 s run-to-run) bigger than any
  * real regression, so a single-number bench made per-query comparisons
  * noise-dominated. The median resists one-off stalls; the dispersion
  * column says per query whether a round-over-round delta is signal
  * (spread ≪ delta) or noise; the recorded 1-minute load average guards
  * against comparing runs taken under different box load. All queries run
  * in a single session: `local[N]`, shuffle partitions = N, AQE on.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    // Wall-clock budget (round-16 verdict item 1: the driver's 32-core
    // bench timed out at rc=124 — the suite grew to 347 queries × [warmup
    // + 3 timed + plan probe + up to 4 forced runs] and no longer fits
    // the driver's kill timer on a loaded box). The clock starts at JVM
    // start so the load-gate wait counts against it, exactly like the
    // driver's external `timeout` would. Once over budget the bench
    // DEGRADES instead of dying: warmup + ONE timed run per remaining
    // query, forced re-times skipped — a complete rc=0 record whose
    // degraded entries are listed in "degraded" so round-over-round
    // comparison can exclude them. Under budget (every quiet run so far:
    // ~17 min wall) nothing changes, so r15 comparability holds.
    val benchStartNs = System.nanoTime()
    val budgetS = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_S", "1500").toDouble
    val timedRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    require(timedRuns >= 1, s"SPARK_GRAFT_BENCH_RUNS must be >= 1, got $timedRuns")
    def overBudget(): Boolean =
      (System.nanoTime() - benchStartNs) / 1e9 > budgetS
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // reliable-checkpoint dir (tmp, own the cleanup): the iterative
    // operators checkpoint against files — benching the same path a
    // cluster run would take, not the localCheckpoint fallback.
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_bench_ckpt")
    spark.sparkContext.setCheckpointDir(ckptDir.toString)
    // optional args: a subset of query names to bench (dev loop); the
    // driver invokes with no args → full suite. Unknown names are an
    // error, not an empty run: a misspelled arg must not produce an
    // empty-but-rc-0 results file.
    val unknown = args.filterNot(SparkEntry.queries.contains)
    if (unknown.nonEmpty) {
      System.err.println(
        s"unknown query name(s): ${unknown.mkString(", ")}; " +
          s"known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
      spark.stop()
      sys.exit(2)
    }
    val selected =
      if (args.nonEmpty) SparkEntry.queries.filter(kv => args.contains(kv._1))
      else SparkEntry.queries

    def jsonStr(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
        .replaceAll("[\\x00-\\x1f]", " ") + "\""

    // Between queries: drop every cached Dataset AND any RDD-level pin
    // (localCheckpoint blocks live below the CacheManager), so one query's
    // storage-hygiene bug cannot poison every number after it — the
    // round-3 recorded bench degraded 16× on late queries exactly this way.
    def resetStorage(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }

    // count() is the sink: cheap, and for aggregate/join queries (the
    // large majority) all the work sits below it. TWO pruning classes are
    // under-measured by it: (1) pure projections (the projection folds
    // away under a count); (2) terminal LEFT JOINs with unique right keys
    // (count = left count, the whole right branch is eliminated). The
    // count() numbers stay the headline total for r1-comparability, but
    // the same JSON line ALSO carries a "forced" map + "forced_total":
    // every query the plan-diff below flags is re-timed under a
    // xxhash64(struct(all cols)) → bit_xor sink (the ForceProbe
    // instrument) that computes every output expression without
    // collecting rows, so the artifact is interpretable on its own — no
    // side document needed for 10% of the rows.
    def timed(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    // Mechanical under-measurement flag (plan-only, nothing executes):
    // the query loses Joins under a count() sink (CountPruneAudit's
    // definitive class), or its optimized plan has no Join and no
    // Aggregate at all — a scan-speed projection/explode/window pipeline
    // whose output expressions a count prunes wholesale.
    def countPruned(df: org.apache.spark.sql.DataFrame): Boolean = {
      import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan}
      def joins(p: LogicalPlan): Int = p.collect { case j: Join => j }.size
      val full = df.queryExecution.optimizedPlan
      val under = df.groupBy().count().queryExecution.optimizedPlan
      val hasBarrier = full.collectFirst {
        case _: Join => (); case _: Aggregate => ()
      }.isDefined
      joins(under) < joins(full) || !hasBarrier
    }
    def timedForced(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      import org.apache.spark.sql.functions.{col, expr, struct, xxhash64}
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
        .agg(expr("bit_xor(h)")).collect()
      (System.nanoTime() - t0) / 1e9
    }
    // Each query: one untimed warmup, three timed runs, median reported
    // with its relative spread. A query that throws is recorded as an
    // ERROR — never as a wall time — and the process exits nonzero: a
    // broken query must be distinguishable from a slow one in
    // BENCH_*.json.
    // Load guard: round 6's recorded bench ran at 1-minute load 3.28 and
    // came out ~1.5× uniformly inflated (the judge's quiet-box rerun
    // erased every apparent regression). Wait — bounded — for the box to
    // quiet down before timing; if it never does, record anyway but set
    // "load_contaminated": true so the artifact is self-disqualifying
    // for round-over-round comparison.
    // The 1-min average alone admits a box whose 5-min residue is still
    // draining (round 10's record: 1-min 1.45 under threshold while 5-min
    // sat at 3.00, and a stage-scheduling-bound query recorded 16 s whose
    // same-run forced re-time was 2.75 s). Wait on — and gate
    // contamination by — max(1-min, 5-min). The 15-min average is
    // recorded for the reader but not gated: it drains too slowly for a
    // bounded wait and only matters through its 5-min shadow.
    def loadPair(): (Double, Double) =
      try {
        val parts = java.nio.file.Files.readString(
          java.nio.file.Paths.get("/proc/loadavg")).trim.split(" ")
        (parts(0).toDouble, parts(1).toDouble)
      } catch {
        case _: Throwable =>
          val l = java.lang.management.ManagementFactory
            .getOperatingSystemMXBean.getSystemLoadAverage
          (l, l)
      }
    def loadMax(): Double = { val (a, b) = loadPair(); math.max(a, b) }
    val loadThreshold = sys.env.getOrElse("SPARK_GRAFT_LOAD_MAX", "1.5").toDouble
    val waitDeadline = System.nanoTime() + 10L * 60 * 1000000000L
    while (loadMax() >= loadThreshold && System.nanoTime() < waitDeadline) {
      val (l1, l5) = loadPair()
      System.err.println(f"[bench] load_avg max(1m=$l1%.2f, 5m=$l5%.2f) >= $loadThreshold; waiting...")
      Thread.sleep(15000)
    }
    val (loadAvg, load5m) = loadPair()
    val contaminated = math.max(loadAvg, load5m) >= loadThreshold
    val loadTriple: String =
      try java.nio.file.Files.readString(
        java.nio.file.Paths.get("/proc/loadavg")).trim
        .split(" ").take(3).mkString(",")
      catch { case _: Throwable => f"$loadAvg%.2f" }
    // Attribution telemetry (round-11 verdict: three queries' recorded
    // numbers were full-suite measurement contamination — a quiet-box
    // standalone re-time erased all three — but nothing IN the artifact
    // said so). Two instruments make a contaminated number self-
    // attributing: (a) per-query JVM GC seconds summed across the 3
    // timed runs (and the 3 forced runs) — a number dominated by GC
    // pause is suite-state, not plan cost; (b) per-round connected-
    // components phase telemetry (round secs / checkpoint bytes / probe
    // secs) captured from Dedup.lastCcTelemetry for every query whose
    // execution ran the CC loop.
    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
    }
    def ccJson(t: graft.ext.Dedup.CcTelemetry): String =
      s"""{"rounds":${t.rounds},"round_secs":[${t.roundSecs.map(v => f"$v%.3f").mkString(",")}],""" +
        s""""checkpoint_bytes":[${t.checkpointBytes.mkString(",")}],""" +
        s""""probe_secs":[${t.probeSecs.map(v => f"$v%.3f").mkString(",")}]}"""
    val times = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val spreads = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val forced = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val gcSecs = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val forcedGcSecs = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val ccTel = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val forcedErrors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val degraded = scala.collection.mutable.ArrayBuffer.empty[String]
    selected.foreach { case (name, fn) =>
      try {
        val deg = overBudget()
        if (deg) degraded += name
        val nRuns = if (deg) 1 else timedRuns
        val ccBefore = graft.ext.Dedup.lastCcTelemetry
        timed(fn) // warmup (JVM/codegen/parquet footers)
        val gc0 = gcMillis()
        val runs = Seq.fill(nRuns)(timed(fn)).sorted
        gcSecs(name) = (gcMillis() - gc0) / 1e3
        graft.ext.Dedup.lastCcTelemetry.foreach { t =>
          if (!ccBefore.contains(t)) ccTel(name) = ccJson(t)
        }
        times(name) = runs(nRuns / 2)
        spreads(name) =
          if (nRuns >= 3 && runs(nRuns / 2) > 0) (runs.last - runs.head) / runs(nRuns / 2)
          else 0.0
        // The forced re-time is an INSTRUMENT on top of an already-valid
        // count() measurement: a throw in it (an unhashable output type,
        // OOM on the extra executions) must not turn the primary number
        // into an ERROR — record it separately and keep rc clean.
        try {
          if (!deg && countPruned(fn(spark, sfDir))) {
            timedForced(fn) // the forced sink JIT/codegens separately
            val fgc0 = gcMillis()
            forced(name) = Seq.fill(timedRuns)(timedForced(fn)).sorted.apply(timedRuns / 2)
            forcedGcSecs(name) = (gcMillis() - fgc0) / 1e3
            graft.ext.Dedup.lastCcTelemetry.foreach { t =>
              if (!ccBefore.contains(t)) ccTel.getOrElseUpdate(name + "__forced", ccJson(t))
            }
          }
        } catch {
          case e: Throwable =>
            forcedErrors(name) =
              Option(e.getMessage).getOrElse(e.getClass.getName).take(300)
        }
      } catch {
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(300)
      } finally resetStorage()
    }
    val qs = times.map { case (k, v) => jsonStr(k) + ":" + v }
      .mkString("{", ",", "}")
    val dj = spreads.map { case (k, v) => jsonStr(k) + ":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val fj = forced.map { case (k, v) => jsonStr(k) + ":" + v }
      .mkString("{", ",", "}")
    val gcJ = gcSecs.map { case (k, v) => jsonStr(k) + ":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val fGcJ = forcedGcSecs.map { case (k, v) => jsonStr(k) + ":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val ccJ = ccTel.map { case (k, v) => jsonStr(k) + ":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => jsonStr(k) + ":" + jsonStr(v) }
      .mkString("{", ",", "}")
    val fErrJson = forcedErrors.map { case (k, v) => jsonStr(k) + ":" + jsonStr(v) }
      .mkString("{", ",", "}")
    val total = if (times.nonEmpty) times.values.sum else 0.0
    // The honest suite total: forced time where the count() sink is
    // flagged as vacuous, the count() time everywhere else.
    val forcedTotal = times.map { case (k, v) => forced.getOrElse(k, v) }.sum
    val degJson = degraded.map(jsonStr).mkString("[", ",", "]")
    val wallS = (System.nanoTime() - benchStartNs) / 1e9
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"dispersion":$dj,"forced":$fj,"forced_total":$forcedTotal,"forced_errors":$fErrJson,"gc_secs":$gcJ,"forced_gc_secs":$fGcJ,"cc_telemetry":$ccJ,"load_avg_1m":$loadAvg,"load_avg_1_5_15":${jsonStr(loadTriple)},"load_contaminated":$contaminated,"errors":$errJson,"budget_s":$budgetS,"wall_s":${f"$wallS%.1f"},"degraded":$degJson,"sf":"$sfDir"}"""
    println(line)
    // also drop the line as a file: launcher prefixes (sbt's "[info] ")
    // can defeat stdout JSON parsing (observed in round 1's bench record)
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_LATEST.json"),
      (line + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    spark.stop()
    // reclaim the bench's checkpoint dir (operators delete their own
    // files; this removes the empty scaffolding + anything a crashed
    // query left behind)
    try {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(ckptDir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    } catch { case _: Throwable => () }
    if (errors.nonEmpty) sys.exit(1)
  }
}
