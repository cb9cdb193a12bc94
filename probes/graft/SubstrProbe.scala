package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.TextOps

/** Dev probe (results recorded in BENCH_SF1.md): the alignment-free
  * substring-dedup pair at scale — [[graft.ext.TextOps.dupSpans]] (span
  * telemetry) and [[graft.ext.TextOps.substringDedup]] (rewrite) over
  * the documents table at 1×/10×/100×, with shuffle-write bytes. The
  * scale claim: the rolling-window hash count is map-side combined (the
  * duplicate cluster collapses per task), so time should track the
  * corpus linearly and shuffle bytes should track ids+hashes for the
  * span half, plus the surviving corpus for the rewrite half.
  *
  * PHASE mode (`tools/run.sh graft.SubstrProbe <sfDir> phases` — the
  * PrProbe convention): splits the rewrite's forced plan at its seams to
  * attribute the honest cost (round 12 flagged forced = 17× timed):
  *
  *   covered        dup-window discovery + covered-position explode
  *   toks           the corpus posexplode alone (the rebuild's input bytes)
  *   anti           toks anti-joined against covered (adds the hash probe)
  *   rebuild_nosort groupBy + collect_list + array_join, NO array_sort
  *                  (same shuffled bytes, sort elided — wrong output
  *                  order, measurement only)
  *   rebuild_sort   the real rebuild (collect_list → array_sort → join)
  *   full           the declared query end-to-end, every column forced
  *
  * rebuild_sort − rebuild_nosort isolates the per-doc array_sort;
  * rebuild_nosort − anti isolates collect_list's bytes; covered alone is
  * the md5 window-hash discovery pass.
  */
object SubstrProbe {
  def main(args: Array[String]): Unit = {
    if (args.length >= 2 && args(1) == "phases") { phases(args(0)); return }
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "testdata_scale/x10", "testdata_scale/x100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(
          sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    dirs.foreach { d =>
      val docs = Tables.documents(spark, d)
      val n = docs.count()
      def timed(f: => Unit): (Double, Long) = {
        Thread.sleep(300)
        shuffleBytes.set(0L)
        val t0 = System.nanoTime()
        f
        val secs = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        (secs, shuffleBytes.get())
      }
      def med3(f: => Unit): (Double, Long) = {
        timed(f)
        val rs = Seq(timed(f), timed(f), timed(f)).sortBy(_._1)
        rs(1)
      }
      // force FULL materialization (the ForceProbe idiom): a bare
      // count() lets Catalyst eliminate the rewrite's left join (unique
      // right keys) and prune every computed column — 0.2 s / 0 MB at
      // x100, measuring nothing
      val (spanSecs, spanBytes) = med3 { force(TextOps.dupSpans(docs)) }
      val nSpans = TextOps.dupSpans(docs).count()
      val (rwSecs, rwBytes) = med3 { force(TextOps.substringDedup(docs)) }
      println(f"""{"dir":"$d","n_docs":$n,"n_spans":$nSpans,""" +
        f""""dup_spans_sec":$spanSecs%.3f,"dup_spans_shuffle_mb":${spanBytes / 1e6}%.1f,""" +
        f""""substring_dedup_sec":$rwSecs%.3f,"substring_dedup_shuffle_mb":${rwBytes / 1e6}%.1f}""")
    }
    spark.stop()
  }

  private def force(df: DataFrame): Unit = {
    df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
      .agg(expr("bit_xor(h)")).collect()
    ()
  }

  private def phases(sfDir: String): Unit = {
    val window = 8
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
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables.documents(spark, sfDir)
    def covered() = TextOps.dupWindows(docs, window)
      .where(!(col("doc_id") === col("first.doc_id") &&
        col("start") === col("first.start")))
      .select(col("doc_id"),
        explode(expr(s"sequence(start, start + ${window - 1})")).as("pos"))
      .distinct()
    def toks() = docs
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
      .withColumn("pos", col("pos").cast("long"))
    def anti() = toks().join(covered(), Seq("doc_id", "pos"), "left_anti")
    def rebuild(sorted: Boolean) = {
      val kept = if (sorted) "array_sort(_kept)" else "_kept"
      anti()
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_kept"),
          collect_list(struct(col("pos"), col("token"))).as("_kept"))
        .selectExpr("doc_id", "n_kept",
          s"array_join(transform($kept, s -> s.token), ' ') as new_text")
    }
    val steps: Seq[(String, () => DataFrame)] = Seq(
      "covered" -> (() => covered()),
      "toks" -> (() => toks()),
      "anti" -> (() => anti()),
      "rebuild_nosort" -> (() => rebuild(sorted = false)),
      "rebuild_sort" -> (() => rebuild(sorted = true)),
      "full" -> (() => SparkEntry.queries("substring_dedup")(spark, sfDir)))
    steps.foreach { case (name, mk) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        force(mk())
        (System.nanoTime() - t0) / 1e9
      }
      once() // warmup
      val ts = Seq.fill(3)(once()).sorted
      println(f"[substrprobe] $name sec=${ts(1)}%.3f (min=${ts.head}%.3f max=${ts.last}%.3f) dir=$sfDir")
    }
    spark.stop()
  }
}
