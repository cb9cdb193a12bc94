package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev probe (results in BENCH_SF1.md): per-batch cost of
  * `Dedup.incrementalFuzzyDedupSink` as the INDEX ages. Two claims under
  * test:
  *
  *  - bulk arrivals (batch touches every bucket): per-batch cost grows
  *    with the index — the full screen genuinely is the work — but only
  *    at index-scan speed (signature rows, never documents);
  *  - trickle arrivals with a finer `bandBuckets`: the batch's bucket
  *    set prunes the index read to a fraction of its partitions, so
  *    per-batch cost stays near-flat as the corpus accumulates.
  *
  * Docs are deterministic token strings, near-dup-free, so the index
  * grows at full batch rate (worst case).
  *
  *   tools/run.sh graft.FuzzyIndexProbe [batches] [rowsPerBatch] [bandBuckets]
  */
object FuzzyIndexProbe {
  def main(args: Array[String]): Unit = {
    val batches = args.headOption.map(_.toInt).getOrElse(40)
    val rows = if (args.length > 1) args(1).toInt else 2000
    val bandBuckets = if (args.length > 2) args(2).toInt else 64
    require(batches >= 30, s"need batches >= 30 for the report bands, got $batches")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def batchDf(b: Long): DataFrame =
      spark.range(rows).selectExpr(
        s"id + ${b * rows}L as doc_id",
        s"""concat_ws(' ', transform(sequence(0, 11),
           |  j -> concat('t', pmod(hash((id + ${b * rows}L) * 13 + j * 7, j), 5000))))
           | as text""".stripMargin)

    val dir = java.nio.file.Files.createTempDirectory("graft_fip")
    val sink = graft.ext.Dedup.incrementalFuzzyDedupSink(
      s"$dir/index", s"$dir/verdicts", bandBuckets = bandBuckets)
    val ts = (0 until batches).map { b =>
      val t0 = System.nanoTime()
      sink(batchDf(b.toLong), b.toLong)
      b -> (System.nanoTime() - t0) / 1e9
    }
    def dirSize(p: java.io.File): Long =
      if (!p.exists()) 0L
      else if (p.isFile) p.length()
      else p.listFiles().map(dirSize).sum
    val idxMB = dirSize(new java.io.File(s"$dir/index")) / 1e6
    def band(lo: Int, hi: Int) = {
      val xs = ts.filter { case (b, _) => b >= lo && b < hi }.map(_._2)
      xs.sum / xs.length
    }
    println(f"[fuzzyindexprobe] rows=$rows buckets=$bandBuckets batches=$batches: " +
      f"early(5..15)=${band(5, 15)}%.3fs late(${batches - 10}..$batches)=${band(batches - 10, batches)}%.3fs " +
      f"late/early=${band(batches - 10, batches) / band(5, 15)}%.2f idxMB=$idxMB%.1f")
    try org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    catch { case _: Throwable => () }
    spark.stop()
  }
}
