package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Whole-class robustness gate: EVERY declared query must survive an
  * adversarial corpus — empty/null/single-token texts, zero-norm/null
  * embeddings, null props — without throwing. This is the class of
  * failure the round-4 NaN crash belonged to (a zero-norm embedding
  * would have crashed four queries at runtime): correctness oracles
  * can't see it because the driver's SFs contain no such rows, so the
  * edge corpus manufactures them and sweeps all queries end-to-end.
  *
  * The gate is NO-CRASH, not value-equality — each query's semantics on
  * pathological rows are pinned by their own unit tests; here we assert
  * the whole surface stays total.
  */
class EdgeCorpusSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private lazy val edgeDir: String = {
    import spark.implicits._
    val src = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("graft_edge").toString
    // TPC-H tables: schema-correct slices of the real data
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
      .foreach { t =>
        Tables.load(spark, src, t).limit(40)
          .write.mode("overwrite").parquet(s"$dir/$t.parquet")
      }
    // events: real slice (micros ts round-trips; Tables.events falls
    // through for non-nanos files) + a null-props row
    val ev = Tables.events(spark, src).limit(40)
    val evEdge = ev.unionByName(
      ev.limit(1).select(col("event_id") + 1000000L, col("ts"), col("user_id"),
        col("event_type"), col("value"), lit(null).cast("string").as("props"))
        .toDF(ev.columns: _*))
    evEdge.write.mode("overwrite").parquet(s"$dir/events.parquet")
    // documents: real slice + the pathological rows
    val docs = Tables.documents(spark, src).limit(30)
    val edgeDocs = Seq(
      (900001L, "", "en", "edge", 0L),                         // empty text
      (900002L, "solo", "en", "edge", 4L),                     // single token
      (900003L, Seq.fill(50)("loop").mkString(" "), "de", "edge", 249L), // degenerate repetition
      (900004L, "中文 🙂 müller é ü tokens here and the of", "fr", "edge", 30L) // unicode
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val nullText = docs.limit(1).select(lit(900005L).as("doc_id"),
      lit(null).cast("string").as("text"), lit("en").as("lang"),
      lit("edge").as("source"), lit(0L).as("n_chars"))
    docs.unionByName(edgeDocs).unionByName(nullText)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // embeddings: real slice + zero-norm + null embedding
    val emb = Tables.embeddings(spark, src).limit(30)
    val zero = Seq((900001L, Array.fill(64)(0.0f), 0)).toDF("vec_id", "embedding", "label")
    val nul = emb.limit(1).select(lit(900002L).as("vec_id"),
      lit(null).cast("array<float>").as("embedding"), lit(1).as("label"))
    emb.unionByName(zero).unionByName(nul)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("every declared query survives the adversarial edge corpus (no-crash sweep)") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      // collect(), not count(): under a count aggregate Catalyst prunes every
      // deterministic projection, so per-row expressions would never run on
      // the edge rows and the sweep would be vacuous for exactly the crash
      // class it exists to catch. The edge corpus is tiny, so collect is cheap.
      try { fn(spark, edgeDir).collect(); None }
      catch { case e: Throwable =>
        Some(s"$name: ${Option(e.getMessage).getOrElse(e.getClass.getName).linesIterator.next()}")
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries crashed on the edge corpus:\n${failures.mkString("\n")}")
  }
}
