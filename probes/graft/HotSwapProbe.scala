package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev probe (results in BENCH_SF1.md): per-batch cost and state size of
  * `Similarity.hotSwapDedupSink` as the stream AGES, across a sweep of
  * `dedupBatches` windows — the measurements behind the knob's default.
  * The claim under test is the scaladoc's "prior side is bounded by
  * dedupBatches × batch size at ANY stream age":
  *
  *  - windowed (dedupBatches = W): the trailing anti-join opens at most
  *    W key partitions per batch — per-batch time must go FLAT once the
  *    store is older than W batches, at a level set by W × batch size;
  *  - `unbounded` (dedupBatches = total batches): every batch anti-joins
  *    the whole accumulated store — per-batch time grows with stream
  *    age, the shape the bound exists to prevent.
  *
  * Vectors are deterministic hash-derived 64-dim floats, all distinct
  * (worst case: every row survives, so the key store grows at full batch
  * rate). Each window runs `max(batches, W + 30)` batches so every
  * regime is measured in steady state (older than its own window), and
  * reports the trailing-window key-store size (rows and on-disk bytes)
  * alongside the timing bands.
  *
  *   tools/run.sh graft.HotSwapProbe [batches] [rowsPerBatch] [windowsCsv]
  *   e.g. tools/run.sh graft.HotSwapProbe 60 20000 5,25,100,unbounded
  */
object HotSwapProbe {
  def main(args: Array[String]): Unit = {
    val batches = args.headOption.map(_.toInt).getOrElse(60)
    val rows = if (args.length > 1) args(1).toInt else 2000
    val windows: Seq[Option[Int]] =
      (if (args.length > 2) args(2) else "10,unbounded").split(",").toSeq
        .map(_.trim).filter(_.nonEmpty)
        .map(w => if (w == "unbounded") None else Some(w.toInt))
    require(batches >= 45, s"need batches >= 45 for the report bands, got $batches")
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

    def dirSize(p: java.io.File): Long =
      if (!p.exists()) 0L
      else if (p.isFile) p.length()
      else p.listFiles().map(dirSize).sum

    windows.foreach { w =>
      val n = w.fold(batches)(ww => math.max(batches, ww + 30))
      val dedupBatches = w.getOrElse(n)
      val tag = w.fold(s"unbounded(W=$n)")(ww => s"W=$ww")
      val dir = java.nio.file.Files.createTempDirectory("graft_hsp")
      val cbDir = s"$dir/cb"
      graft.ext.Similarity.publishCodebook(
        graft.ext.Similarity.codebook(batchDf(0L), 16), cbDir)
      val sink = graft.ext.Similarity.hotSwapDedupSink(
        cbDir, s"$dir/out", dedupBatches = dedupBatches, pruneKeys = true)
      val ts = (0 until n).map { b =>
        val t0 = System.nanoTime()
        sink(batchDf(b.toLong), b.toLong)
        b -> (System.nanoTime() - t0) / 1e9
      }
      // the TRAILING key store a steady-state batch anti-joins (pruneKeys
      // retention leaves ≤ 1 partition of slack — measured as-is)
      val keyBytes = dirSize(new java.io.File(s"$dir/out/keys"))
      val keyParts = Option(new java.io.File(s"$dir/out/keys").listFiles())
        .map(_.count(_.getName.startsWith("batch_id="))).getOrElse(0)
      def band(lo: Int, hi: Int) = {
        val xs = ts.filter { case (b, _) => b >= lo && b < hi }.map(_._2)
        xs.sum / xs.length
      }
      // steady-state band starts past the window's own ramp-up (the
      // store must be older than W before the anti-join sees a full
      // window); the late band is the last 10 batches
      val s0 = math.min(math.max(w.getOrElse(0), 5), n - 20)
      val s1 = s0 + 10
      println(f"[hotswapprobe] $tag rows=$rows batches=$n: " +
        f"steady($s0..$s1)=${band(s0, s1)}%.3fs late(${n - 10}..$n)=${band(n - 10, n)}%.3fs " +
        f"late/steady=${band(n - 10, n) / band(s0, s1)}%.2f " +
        f"keyParts=$keyParts keyMB=${keyBytes / 1e6}%.1f")
      try org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
      catch { case _: Throwable => () }
    }
    spark.stop()
  }
}
