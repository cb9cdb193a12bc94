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

  test("every declared query survives the adversarial edge corpus (no-crash sweep)", SlowTest) {
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

  // ---- web/text intake under hostile input (r13 verdict task 7) -------
  // Value-PINNING, not just no-crash: each case fixes the documented
  // behavior of the regex-core extractors on adversarial markup/URLs, so
  // a regex "improvement" that silently changes the hostile-input
  // contract fails here first.

  test("urlCanonical hostile: malformed ports pass through; encoded/Unicode hosts lowercase; IPv6 literals refuse") {
    import spark.implicits._
    val urls = Seq(
      1L -> "http://h:80x/path",                          // malformed port
      2L -> "https://m%C3%BCller.example.com:443/x",      // pct-encoded host
      3L -> "Http://MÜLLER.example.com/x",           // raw Unicode host
      4L -> "https://[2001:db8::1]/x",                    // IPv6 literal
      5L -> "http://example.com?utm_source=a",            // query, no path
      6L -> "https://example.com#frag",                   // fragment, no path
      7L -> "http://h:80")                                // default port, no path
    val out = graft.ext.WebOps.urlCanonical(
      urls.toDF("doc_id", "url"), "url", Seq("doc_id"))
      .select("doc_id", "canon_url", "unparsed", "port_stripped", "had_fragment", "dropped_utm")
      .as[(Long, String, Int, Int, Int, Int)].collect().sortBy(_._1).toSeq
    assert(out(0) === ((1L, "http://h:80x/path", 1, 0, 0, 0))) // NEVER http://hx/path
    // percent-encoding hex lowercases with the host — safe (hex digits
    // are case-insensitive per RFC 3986 §2.1), pinned so it stays so
    assert(out(1) === ((2L, "https://m%c3%bcller.example.com/x", 0, 1, 0, 0)))
    assert(out(2) === ((3L, "http://müller.example.com/x", 0, 0, 0, 0)))
    // bracketed IPv6 hosts are outside the host class ([^/?#:] bars the
    // colons) — conservative passthrough, never a half-parsed merge
    assert(out(3) === ((4L, "https://[2001:db8::1]/x", 1, 0, 0, 0)))
    // all-utm query empties away WITH its '?'; path absence is legal
    assert(out(4) === ((5L, "http://example.com", 0, 0, 0, 1)))
    assert(out(5) === ((6L, "https://example.com", 0, 0, 1, 0)))
    assert(out(6) === ((7L, "http://h", 0, 1, 0, 0)))
  }

  test("htmlExtract hostile: unterminated blocks, fake closers, CDATA, newline titles") {
    import spark.implicits._
    def ext(html: String): (String, String) = {
      val r = graft.ext.TextOps.htmlExtract(
        Seq((1L, html)).toDF("doc_id", "html"))
        .select("title", "clean_text").head()
      (r.getString(0), r.getString(1))
    }
    // unterminated <script>: the block regex needs the closer, so the
    // body survives into tag-strip and leaks as text — pinned as the
    // documented failure shape (content leaks, nothing throws, no tear
    // of later rows)
    assert(ext("<html><title>T</title><script>var a = 1;") ===
      (("T", "T var a = 1;")))
    // a string literal containing the closer ends the block EARLY (the
    // non-greedy regex core cannot know it is quoted): the tail leaks
    // minus any tag-shaped fragments — pinned
    assert(ext("""<p><script>var s = "</script>";</script>Hello</p>""") ===
      (("", "\"; Hello")))
    // bare < > inside a TERMINATED script strips with the block even
    // when it looks tag-like
    assert(ext("<script>if (a<b) { x; }</script><p>Body</p>") ===
      (("", "Body")))
    // CDATA is not special to the regex core: '<![CDATA[ <p' reads as
    // one bracket-to-'>' "tag" and strips; the bare ']]>' has no '<' so
    // it survives as literal text; pinned
    assert(ext("<![CDATA[ <p>raw</p> ]]>after") === (("", "raw ]]>after")))
    // title regex is single-line by design (titles are): an embedded
    // newline refuses the match rather than spanning the document
    assert(ext("<title>Line1\nLine2</title><p>x</p>") === (("", "Line1 Line2 x")))
    // unterminated tag at EOF: no closing '>', so the fragment is NOT a
    // tag — it survives as text (never swallows the rest of the doc)
    assert(ext("<p>ok</p><p class=\"x") === (("", "ok <p class=\"x")))
  }

  test("keywordTag hostile: multibyte boundaries and megabyte-scale span arithmetic stay exact") {
    import spark.implicits._
    import graft.functions.MultiMatchFunctions.{multi_match_counts, multi_match_mask}
    // multibyte UTF-8: 'é' (0xC3 0xA9) vs a text salted with 0xC3-led
    // lookalikes — byte matching is safe because no UTF-8 encoding is a
    // suffix of another's (the pinned automaton contract)
    val pats = Seq("é", "café", "af")
    val text = "café É éclair cafés"
    val counts = Seq(text).toDF("t")
      .select(multi_match_counts(org.apache.spark.sql.functions.col("t"), pats).as("c"))
      .as[Seq[Long]].head()
    // é: café, éclair, cafés; caf é: twice; af: in both cafés
    assert(counts === Seq(3L, 2L, 2L))
    // megabyte-scale span arithmetic: hits at position 0, the exact
    // middle, and the last bytes of a ~4 MB text; counts exact, mask
    // length-preserving, masked byte count = covered-union size
    val block = "x" * (1 << 20)
    val big = "needle" + block + "needle" + block + "needle"
    val (cnt, masked) = Seq(big).toDF("t")
      .select(
        multi_match_counts(org.apache.spark.sql.functions.col("t"), Seq("needle")).as("c"),
        multi_match_mask(org.apache.spark.sql.functions.col("t"), Seq("needle")).as("m"))
      .as[(Seq[Long], String)].head()
    assert(cnt === Seq(3L))
    assert(masked.length === big.length)
    assert(masked.count(_ == '*') === 18) // 3 spans x 6 bytes, disjoint
    assert(masked.startsWith("******x") && masked.endsWith("x******"))
  }
}
