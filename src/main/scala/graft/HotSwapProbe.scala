package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev probe (results in BENCH_SF1.md): per-batch cost of
  * `Similarity.hotSwapDedupSink` as the stream AGES — the claim under
  * test is the scaladoc's "prior side is bounded by dedupBatches × batch
  * size at ANY stream age". Two regimes over the same arrival sequence:
  *
  *  - windowed (dedupBatches = W): the trailing anti-join opens at most
  *    W key partitions per batch — per-batch time must go FLAT once the
  *    store is older than W batches;
  *  - effectively-unbounded (dedupBatches = total batches): every batch
  *    anti-joins the whole accumulated store — per-batch time grows with
  *    stream age, the shape the bound exists to prevent.
  *
  * Vectors are deterministic hash-derived 64-dim floats, all distinct
  * (worst case: every row survives, so the key store grows at full batch
  * rate).
  *
  *   tools/run.sh graft.HotSwapProbe [batches] [rowsPerBatch] [window]
  */
object HotSwapProbe {
  def main(args: Array[String]): Unit = {
    val batches = args.headOption.map(_.toInt).getOrElse(60)
    val rows = if (args.length > 1) args(1).toInt else 2000
    val window = if (args.length > 2) args(2).toInt else 10
    // the report averages the max(window,5)..+10, 25..35 and last-10
    // bands; fewer batches would divide by an empty band and print NaN
    // means (and the early band must clear the windowed ramp-up)
    require(batches >= math.max(45, math.max(window, 5) + 20),
      s"need batches >= max(45, window+20) for the three report bands, got $batches")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def batchDf(batchId: Long): DataFrame =
      spark.range(rows).selectExpr(
        s"id + ${batchId * rows}L as vec_id",
        s"""transform(sequence(0, 63),
           | j -> cast(pmod(hash(id + ${batchId * rows}L, j), 1000) as float) / 1000.0f)
           | as embedding""".stripMargin)

    def run(tag: String, dedupBatches: Int): Seq[(Int, Double)] = {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_hsp_$tag")
      val cbDir = s"$dir/cb"
      graft.ext.Similarity.publishCodebook(
        graft.ext.Similarity.codebook(batchDf(0L), 16), cbDir)
      val sink = graft.ext.Similarity.hotSwapDedupSink(
        cbDir, s"$dir/out", dedupBatches = dedupBatches, pruneKeys = false)
      val times = (0 until batches).map { b =>
        val t0 = System.nanoTime()
        sink(batchDf(b.toLong), b.toLong)
        b -> (System.nanoTime() - t0) / 1e9
      }
      try org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
      catch { case _: Throwable => () }
      times
    }

    def report(tag: String, ts: Seq[(Int, Double)]): Unit = {
      def win(lo: Int, hi: Int) = {
        val xs = ts.filter { case (b, _) => b >= lo && b < hi }.map(_._2)
        xs.sum / xs.length
      }
      // the early band starts at max(window, 5): the windowed regime is
      // only in steady state once the store is older than W (before
      // that the trailing anti-join sees fewer than W partitions), and a
      // band straddling the ramp-up would understate early cost and so
      // overstate the last/early growth ratio
      val e0 = math.max(window, 5); val e1 = e0 + 10
      println(f"[hotswapprobe] $tag: mean($e0..$e1)=${win(e0, e1)}%.3fs " +
        f"mean(25..35)=${win(25, 35)}%.3fs mean(${batches - 10}..$batches)=${win(batches - 10, batches)}%.3fs " +
        f"last/early=${win(batches - 10, batches) / win(e0, e1)}%.2f")
    }

    report(s"windowed(W=$window)", run("w", window))
    report(s"unbounded(W=$batches)", run("u", batches))
    spark.stop()
  }
}
