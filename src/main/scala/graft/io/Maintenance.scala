package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table-maintenance utilities. At 100 TB the classic operational failure
  * is the small-file problem: streaming sinks and over-parallel writers
  * leave thousands of KB-sized parquet files per partition, and every
  * downstream scan pays per-file open/footer costs until someone
  * compacts.
  */
object Maintenance {

  /** Rewrite a parquet directory into ~`targetRowsPerFile`-row files.
    * Write-to-side-dir + rename swap: readers racing the swap see either
    * the old or the new layout, never a half-written mix (a table format
    * — Delta/Iceberg — is the fully atomic production answer; this is the
    * raw-parquet form). Returns (rows, resulting file count).
    */
  def compactParquet(
      spark: SparkSession,
      dir: String,
      targetRowsPerFile: Long): (Long, Int) = {
    val df = spark.read.parquet(dir)
    val rows = df.count()
    val nFiles = math.max(1, math.ceil(rows.toDouble / targetRowsPerFile).toInt)
    val tmp = dir.stripSuffix("/") + "__compacting"
    df.repartition(nFiles).write.mode("overwrite").parquet(tmp)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dst = new Path(dir)
    val bak = new Path(dir.stripSuffix("/") + "__old")
    fs.rename(dst, bak)
    fs.rename(new Path(tmp), dst)
    fs.delete(bak, true)
    val out = fs.listStatus(dst).count(_.getPath.getName.endsWith(".parquet"))
    (rows, out)
  }

  /** Retention sweep for `batch_id=N`-partitioned stores (the
    * [[graft.ext.Similarity.hotSwapDedupSink]] key store, the
    * [[graft.ext.Similarity.refreshingDedupSink]] survivor log, the
    * `Sinks.historyAndState` history): delete partitions with
    * `batch_id < keepFrom`. The trailing-window readers already never
    * OPEN out-of-window files (partition pruning); this bounds the DISK
    * and the directory-listing metadata too — on an unbounded stream both
    * otherwise grow forever. Deleting strictly below the reader's window
    * floor can never race a correct reader; run it from the same
    * foreachBatch that advances the window. Returns the partitions
    * removed.
    */
  def pruneBatchPartitions(
      spark: SparkSession, dir: String, keepFrom: Long): Seq[Long] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.filter(_.isDirectory)
      .flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("batch_id=") && n.drop(9).forall(_.isDigit))
          Some((n.drop(9).toLong, st.getPath))
        else None
      }
      .filter(_._1 < keepFrom)
      .sortBy(_._1)
      .map { case (id, path) => fs.delete(path, true); id }
  }

  /** Write `df` as a saved table bucketed AND per-bucket-sorted by `key`,
    * with strictly ONE FILE PER BUCKET — the layout that makes every
    * downstream equi-join/aggregate on `key` both exchange-free and
    * sort-free. Two layout invariants do the work:
    *
    *  1. `repartition(buckets, key)` before `bucketBy(buckets, key)`:
    *     both use the same murmur3 `HashPartitioning`, so each write task
    *     holds exactly one bucket's rows and emits exactly one file.
    *     Without it, every write task emits a file per bucket it touches
    *     (task-count × buckets small files), and multi-file buckets void
    *     the sort metadata below.
    *  2. Readers must set
    *     `spark.sql.legacy.bucketedTableScan.outputOrdering=true`:
    *     Spark ≥3.0 ignores per-bucket sort order by default because
    *     multi-file buckets made it unsafe — single-file buckets are
    *     exactly the case the flag re-enables, and [[GuardSpec]] pins the
    *     flag's existence. Without the flag only the exchange
    *     elimination survives (still the dominant term on a fact join).
    *
    * Measured effect (BENCH_SF1.md, q21 at 100×): fact exchanges gone,
    * zero Sort nodes in the executed plan, 1.4–1.5× end-to-end against a
    * one-time layout cost of ~2.3 query executions.
    *
    * Returns the file count; fails fast if any bucket produced more than
    * one file (the silent way the sort contract breaks).
    */
  def bucketWrite(df: DataFrame, key: String, buckets: Int, table: String): Int = {
    df.repartition(buckets, df(key))
      .write.bucketBy(buckets, key).sortBy(key)
      .mode("overwrite").saveAsTable(table)
    val files = df.sparkSession.table(table).inputFiles
    // bucketed part files carry their bucket id as the _NNNNN suffix:
    // part-00000-<uuid>_00007.c000.snappy.parquet -> bucket 7
    val ids = files.flatMap { f =>
      "_(\\d{5})\\.".r.findFirstMatchIn(f.split('/').last).map(_.group(1).toInt)
    }
    require(ids.length == files.length && ids.distinct.length == ids.length,
      s"bucketWrite($table): expected one file per bucket, got " +
        s"${files.length} files over ${ids.distinct.length} buckets")
    files.length
  }

  /** Z-value (Morton code) of two `bits`-bit bucket ids: bit i of `x`
    * lands at position 2i, bit i of `y` at 2i+1. Sorting by the z-value
    * clusters rows that are close in BOTH dimensions — the multi-column
    * analogue of a sort key, and the standard layout trick
    * (Delta/Iceberg `OPTIMIZE ZORDER BY`) for making min/max file
    * pruning work on more than one predicate column at once.
    *
    * Built from codegen'd built-ins only (`shiftright`/`&`/`shiftleft`
    * fold), so the z computation rides inside WholeStageCodegen at scan
    * speed. Inputs must already be nonnegative ints below 2^bits —
    * bucketization (range/divisor/percentile) is the caller's choice and
    * must be value-MONOTONE per dimension for range pruning to mean
    * anything.
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      val xb = shiftleft(shiftright(x.cast("long"), i).bitwiseAND(1L), 2 * i)
      val yb = shiftleft(shiftright(y.cast("long"), i).bitwiseAND(1L), 2 * i + 1)
      xb + yb
    }.reduce(_ + _)
  }

  /** Z-order clustered parquet layout: bucketize the two cluster columns
    * monotonically (equal-width over the ACTUAL min/max — one cheap
    * 2-row aggregate), range-partition by the interleaved z-value into
    * `files` output files, sort within each, write. Result: every file
    * covers a tight rectangle in (x, y) space, so a reader with
    * predicates on EITHER or BOTH columns skips most files on parquet
    * footer min/max alone — where a 1-D sort gives tight ranges on the
    * sort column only and the full span on the other.
    *
    * `repartitionByRange` samples the z distribution, so file rectangles
    * track the DATA's density, not the key space's — skewed corpora
    * still get balanced files. Returns (files written, the bucket width
    * pair) for observability.
    */
  /** The equal-width monotone bucket expressions over the ACTUAL
    * min/max of two key columns — THE bucketization [[zOrderWrite]]
    * clusters by, shared with the `zorder_layout` hash gate so the
    * gated formula can never silently diverge from the shipped layout.
    * One cheap 2-row aggregate; integer `div`, not double `/` (exact at
    * any key magnitude); ceil-div widths so the top value still lands
    * in bucket 2^bits − 1. An empty (or all-null-key) frame yields
    * origin buckets of width 1 — layout maintenance on a
    * not-yet-populated table is a no-op, not a crash.
    */
  def zBucketExprs(
      df: DataFrame,
      xKey: String,
      yKey: String,
      bits: Int): (Column, Column, Long, Long) = {
    val Array(mmx) = df.agg(
      min(col(xKey).cast("long")), max(col(xKey).cast("long")),
      min(col(yKey).cast("long")), max(col(yKey).cast("long"))).collect()
    def lv(i: Int): Long = if (mmx.isNullAt(i)) 0L else mmx.getLong(i)
    val n = 1L << bits
    val xMin = lv(0)
    val yMin = lv(2)
    val xW = math.max(1L, (lv(1) - xMin + n) / n)
    val yW = math.max(1L, (lv(3) - yMin + n) / n)
    (expr(s"(cast($xKey as bigint) - ${xMin}L) div ${xW}L"),
      expr(s"(cast($yKey as bigint) - ${yMin}L) div ${yW}L"),
      xW, yW)
  }

  def zOrderWrite(
      df: DataFrame,
      xKey: String,
      yKey: String,
      dir: String,
      files: Int,
      bits: Int = 10): (Int, (Long, Long)) = {
    val (bx, by, xW, yW) = zBucketExprs(df, xKey, yKey, bits)
    val z = zValue(bx, by, bits)
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(dir)
    val written = new Path(dir)
      .getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
      .listStatus(new Path(dir)).count(_.getPath.getName.endsWith(".parquet"))
    (written, (xW, yW))
  }

  /** Dynamic-partition-pruning round trip: write the fact frame
    * HIVE-PARTITIONED on `partCol`, read it back, and join it to a
    * filtered small dimension on that column — the layout under which
    * Catalyst injects a `dynamicpruning` subquery into the fact scan, so
    * only the partitions the dim filter survives are ever LISTED, let
    * alone read. This is THE scan-elimination mechanism for a
    * date-partitioned 100 TB fact table ("join last week's dim slice"
    * reads 7 directories, not 3,000); zOrder/bloom skip within files,
    * DPP skips whole partitions before I/O starts. The partitioned copy
    * is scratch under the session checkpoint root (the formatRoundtrip
    * convention: shared-FS path, Hadoop FS API, deleted in the finally);
    * `PlanSpec` pins the `dynamicpruning` expression into the executed
    * plan, this entry gates the RESULT — write → partition discovery →
    * pruned scan → join, end to end.
    */
  def dppRoundtrip(
      fact: DataFrame,
      dim: DataFrame,
      partCol: String,
      aggExprs: Seq[Column]): DataFrame = {
    val spark = fact.sparkSession
    val tmp = spark.sparkContext.getCheckpointDir
      .map(c => s"$c/graft_dpp")
      .getOrElse(java.nio.file.Files.createTempDirectory("graft_dpp").toString)
    val hPath = new Path(tmp)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      // Cluster by the partition column before the hive-partitioned write
      // (guide §6): an unclustered write has every input task opening a
      // parquet writer for every partition value it touches — up to
      // tasks × values tiny files plus per-task dynamic-partition sorts.
      // One hash exchange on partCol makes each task hold whole partition
      // values: files drop from O(tasks × values) to O(values), and the
      // write is the measured bottleneck of this round trip (DppProbe:
      // write 3.83 s unclustered vs 2.69 s clustered of the 3.1 s query
      // at sf0.1/local[32]). Same rows, same read-back, same result.
      fact.repartition(col(partCol))
        .write.mode("overwrite").partitionBy(partCol).parquet(tmp)
      val out = spark.read.parquet(tmp)
        .join(broadcast(dim), Seq(partCol))
        .groupBy(col(partCol))
        .agg(aggExprs.head, aggExprs.tail: _*)
      // bounded driver action (one row per surviving partition) so the
      // finally can delete the scratch copy the plan reads from
      val rows = out.collect().toIndexedSeq
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), out.schema)
    } finally {
      fs.delete(hPath, true)
      ()
    }
  }

  /** Compaction PLANNER over a (partition, file, bytes) metadata frame —
    * which small files merge into which target-sized output, decided
    * from bounded listing metadata BEFORE any data moves (the expensive
    * part of compaction is the rewrite; the plan is a window pass).
    * Files pack contiguously in (bytes desc, file id) order —
    * big-first keeps bins near the target without first-fit's
    * quadratic scan, the id tie-break makes the plan total — and
    * bin k = ⌊preceding-bytes / target⌋, all int64 (a file larger than
    * `targetBytes` lands alone in its own bin slot).
    *
    * Scale shape: one window per PARTITION of the table (bounded by
    * that partition's file count, never corpus-wide); the metadata
    * frame is file-listing-sized. Output: every file's bin plus its
    * bin's total bytes and width, the rewrite work-list.
    */
  def compactPlan(
      files: DataFrame,
      partCol: String,
      fileCol: String,
      bytesCol: String,
      targetBytes: Long): DataFrame = {
    require(targetBytes >= 1, s"targetBytes must be >= 1, got $targetBytes")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(partCol))
      .orderBy(col(bytesCol).desc, col(fileCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wBin = Window.partitionBy(col(partCol), col("bin_id"))
    files
      .select(col(partCol), col(fileCol), col(bytesCol).cast("bigint").as("bytes"))
      .where(col("bytes").isNotNull && col("bytes") >= 0)
      .withColumn("_pre", coalesce(sum(col("bytes")).over(w), lit(0L)))
      .withColumn("bin_id", expr(s"_pre div ${targetBytes}").cast("bigint"))
      .withColumn("bin_bytes", sum(col("bytes")).over(wBin).cast("bigint"))
      .withColumn("bin_files", count(lit(1)).over(wBin).cast("bigint"))
      .drop("_pre")
  }
}
