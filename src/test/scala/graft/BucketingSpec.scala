package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing = the pre-shuffled join. Writing both sides bucketed by the
  * join key means the join needs NO Exchange at read time — at 100 TB the
  * dominant cost of a fact-fact join disappears for every downstream
  * query that joins on the bucket key.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("join of co-bucketed tables plans without a shuffle exchange") {
    // tables land in ./spark-warehouse (gitignored); dropped in finally
    Tables.orders(spark, "/root/testdata/sf0.001")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_b")
    Tables.lineitem(spark, "/root/testdata/sf0.001")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_b")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // sort-merge join straight off the bucketed scans: the only allowed
      // exchange is the final tiny groupBy, never on the join inputs
      val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey"))
      assert(!joinSection.contains("Exchange hashpartitioning(o_orderkey"))
      assert(joined.collect().map(_.getLong(1)).sum === 6000L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("BloomIndex: point probes open a strict subset of files; results stay exact") {
    import graft.io.BloomIndex
    val dir = java.nio.file.Files.createTempDirectory("graft_bloomspec").toString
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
      .select("doc_id", "lang", "n_chars")
    // hash-scattered layout: every file's doc_id min/max spans the whole
    // domain, so min/max pruning is USELESS here by construction — only
    // the bloom can skip
    docs.repartition(16, col("doc_id")).write.mode("overwrite").parquet(dir)
    val indexed = BloomIndex.build(spark, dir, "doc_id")
    assert(indexed === BloomIndex.dataFiles(spark, dir))
    assert(indexed >= 8, s"expected a multi-file layout, got $indexed")

    // a single present key lives in exactly one file; fpp at this size is
    // ~0, so the probe must open far fewer files than exist
    val probe = Seq(42L)
    val (res, kept, total) = BloomIndex.prunedRead(spark, dir, "doc_id", probe)
    assert(total === indexed)
    assert(kept < total / 2, s"bloom kept $kept of $total files")
    val got = res.collect().map(_.getLong(0)).sorted
    val want = docs.filter(col("doc_id") === 42L).collect().map(_.getLong(0)).sorted
    assert(got.toSeq === want.toSeq)

    // executed-scan proof: the pruned plan materializes a fraction of the
    // rows the naive full-dir read does (the IN filter itself can't
    // row-group-prune a scattered key)
    val fullRows = ScanMetrics.scanOutputRows(
      spark.read.parquet(dir).filter(col("doc_id") === 42L).agg(count(lit(1))))
    val (pruned, _, _) = BloomIndex.prunedRead(spark, dir, "doc_id", probe)
    val prunedRows = ScanMetrics.scanOutputRows(pruned.agg(count(lit(1))))
    assert(prunedRows * 2 < fullRows,
      s"pruned read materialized $prunedRows rows vs full $fullRows — no skipping")

    // absent keys: every bloom says no, zero files open, empty result
    val (none, keptNone, _) = BloomIndex.prunedRead(spark, dir, "doc_id", Seq(999999999L))
    assert(keptNone === 0 && none.count() === 0L)
  }

  test("zOrderWrite clusters both dimensions; 2-D box queries prune more files than a 1-D sort", SlowTest) {
    import graft.io.Maintenance
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select("l_orderkey", "l_linenumber", "l_partkey")
    val files = 64
    val (written, _) =
      Maintenance.zOrderWrite(li, "l_orderkey", "l_partkey", s"$dir/z", files, bits = 10)
    assert(written === files)
    // the 1-D comparison layout: same file count, range-sorted by x only
    li.repartitionByRange(files, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(s"$dir/s")

    // per-file (min,max) of both key columns — what parquet footer
    // pruning would see
    def ranges(path: String): Array[(Long, Long, Long, Long)] =
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(min("l_orderkey"), max("l_orderkey"), min("l_partkey"), max("l_partkey"))
        .collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val zR = ranges(s"$dir/z")
    val sR = ranges(s"$dir/s")
    val Array(g) = li.agg(
      min("l_orderkey"), max("l_orderkey"), min("l_partkey"), max("l_partkey")).collect()
    val (xLo, xHi, yLo, yHi) = (g.getLong(0), g.getLong(1), g.getLong(2), g.getLong(3))
    def avgSpan(rs: Array[(Long, Long, Long, Long)], dim: Int): Double = {
      val spans = rs.map { case (a, b, c, d) =>
        if (dim == 0) (b - a).toDouble / math.max(1L, xHi - xLo)
        else (d - c).toDouble / math.max(1L, yHi - yLo)
      }
      spans.sum / spans.length
    }
    // 1-D sort: tight on the sort column, the full span on the other
    assert(avgSpan(sR, 0) < 0.10, s"sorted layout x-span ${avgSpan(sR, 0)}")
    assert(avgSpan(sR, 1) > 0.80, s"sorted layout y-span ${avgSpan(sR, 1)}")
    // z-order: BOTH dimensions tight per file — that is the whole point
    assert(avgSpan(zR, 0) < 0.40, s"zorder x-span ${avgSpan(zR, 0)}")
    assert(avgSpan(zR, 1) < 0.40, s"zorder y-span ${avgSpan(zR, 1)}")

    // predicate pruning: count the files whose footer range intersects —
    // the files a reader must open. Central-quarter windows per dimension.
    val (qxLo, qxHi) = (xLo + (xHi - xLo) * 3 / 8, xLo + (xHi - xLo) * 5 / 8)
    val (qyLo, qyHi) = (yLo + (yHi - yLo) * 3 / 8, yLo + (yHi - yLo) * 5 / 8)
    def hits(rs: Array[(Long, Long, Long, Long)],
        x: Option[(Long, Long)], y: Option[(Long, Long)]): Int =
      rs.count { case (a, b, c, d) =>
        x.forall { case (lo, hi) => b >= lo && a <= hi } &&
          y.forall { case (lo, hi) => d >= lo && c <= hi }
      }
    // the asymmetric win — a predicate on the NON-sort dimension: the 1-D
    // layout cannot prune it at all (every file spans all of y), z-order
    // prunes it like any other dimension
    val yOnlyZ = hits(zR, None, Some((qyLo, qyHi)))
    val yOnlyS = hits(sR, None, Some((qyLo, qyHi)))
    assert(yOnlyS > files * 9 / 10, s"1-D sort pruned y?! $yOnlyS of $files")
    assert(yOnlyZ * 2 < yOnlyS, s"y-only: zorder opened $yOnlyZ files, 1-D sort $yOnlyS")
    // the 2-D box: z-order must not LOSE to the 1-D sort (at modest file
    // counts the x-pruning term dominates both; the gap widens with files
    // — measured at scale in ZProbe/BENCH_SF1.md)
    val boxZ = hits(zR, Some((qxLo, qxHi)), Some((qyLo, qyHi)))
    val boxS = hits(sR, Some((qxLo, qxHi)), Some((qyLo, qyHi)))
    assert(boxZ <= boxS, s"box: zorder opened $boxZ files, 1-D sort $boxS")
    // and the layout is a REWRITE, not a filter: row set unchanged
    assert(spark.read.parquet(s"$dir/z").count() === li.count())

    // the footer geometry above says pruning COULD happen; this asserts
    // it DOES: an executed y-predicate scan over the z layout
    // materializes strictly fewer rows (row-group min/max pruning of the
    // pushed filter) than over the 1-D layout, which must read ~all rows
    val total = li.count()
    def readRows(path: String): Long = ScanMetrics.scanOutputRows(
      spark.read.parquet(path)
        .where(col("l_partkey").between(qyLo, qyHi))
        .agg(sum("l_linenumber")))
    val zRead = readRows(s"$dir/z")
    val sRead = readRows(s"$dir/s")
    assert(sRead > total * 9 / 10, s"1-D layout skipped y?! read $sRead of $total")
    assert(zRead * 2 < sRead,
      s"executed scan: z layout read $zRead rows, 1-D sort $sRead — no actual skipping")
  }

  test("AQE skew join: a hot key's sorted partition is split at runtime (isSkewJoin pinned)") {
    // the lever ops/Skew's scaladocs point non-null hot keys at: Spark's
    // own runtime skew-split. Build a join where ONE key holds ~90% of
    // the left side, force SMJ (no broadcast), set the skew thresholds
    // low enough for local data, and pin that the executed
    // SortMergeJoin actually ran in skew mode — the difference between
    // "AQE would handle it" and "AQE handled it".
    import org.apache.spark.sql.functions._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val left = spark.range(200000)
        .select(when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
          concat(lit("pad-"), col("id")).as("payload"))
      val right = spark.range(500).select(col("id").as("k"), (col("id") * 2).as("v"))
      // sum(length(payload)) keeps the payload ALIVE through the
      // exchange — column pruning would otherwise shrink the hot
      // partition's shuffle bytes under the skew threshold
      val joined = left.join(right, "k")
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
          sum(length(col("payload"))).as("sp"))
      val row = joined.collect().head
      // correctness first: 180k rows hit k=7 (v=14), plus ids 0,10,…,490
      // that fall in [0,500) ∧ %10==0 → 50 rows
      assert(row.getLong(0) === 180000L + 50L)
      val exec = joined.queryExecution.executedPlan
      val smjs = exec.toString
      assert(smjs.contains("isSkewJoin=true") || smjs.contains("skew=true"),
        s"no skew-mode SMJ in executed plan:\n${smjs.take(4000)}")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
