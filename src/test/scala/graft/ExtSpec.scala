package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Dedup, Graph, Similarity, TextOps}

class ExtSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("md5Long64 matches the DuckDB-computable value") {
    // DuckDB: CAST(('0x'||substr(md5('abc'),1,15)) AS BIGINT) = 648541476951500027
    val got = spark.range(1)
      .selectExpr(s"${TextOps.md5Long64("'abc'")} as h")
      .as[Long].head()
    assert(got === 648541476951500027L)
  }

  test("md5_long64_array is bit-identical to the interpreted transform form") {
    // the codegen'd expression must produce EXACTLY the hex-prefix value
    // the DuckDB oracle computes — including unicode, empty strings, and
    // null elements
    val df = Seq(Seq("abc", "", "héllo wörld", "a b c"), Seq[String]())
      .toDF("arr")
    val both = df.select(
      graft.functions.HashFunctions.md5_long64_array(col("arr")).as("fast"),
      expr(s"transform(arr, s -> ${TextOps.md5Long64("s")})").as("ref"))
      .as[(Seq[Long], Seq[Long])].collect()
    both.foreach { case (fast, ref) => assert(fast === ref) }
    val withNull = spark.sql(
      "select array('x', cast(null as string), 'y') as arr")
    val r = withNull.select(
      graft.functions.HashFunctions.md5_long64_array(col("arr")).as("fast"),
      expr(s"transform(arr, s -> ${TextOps.md5Long64("s")})").as("ref"))
      .as[(Seq[java.lang.Long], Seq[java.lang.Long])].head()
    assert(r._1 === r._2)
    assert(r._1(1) === null)
  }

  test("shingles3_hashed equals the interpreted shingle+md5 composition") {
    val docs = Seq(
      "a b c d e", "a b c a b c a b c", "x y", "", "one two three",
      "w1 w2 w3 w4 w5 w6 w7 w1 w2 w3")
      .toDF("text")
    val both = docs
      .withColumn("toks", split(col("text"), " "))
      .select(
        graft.functions.HashFunctions.shingles3_hashed(col("toks")).as("fast"),
        expr(s"transform(${TextOps.shingleExpr("toks")}, s -> ${TextOps.md5Long64("s")})").as("ref"))
      .as[(Seq[Long], Seq[Long])].collect()
    both.foreach { case (fast, ref) => assert(fast === ref) }
  }

  test("shingleExpr produces distinct word 3-grams, empty below 3 tokens") {
    val df = Seq("a b c d", "x y").toDF("text")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("sh", expr(TextOps.shingleExpr("toks")))
      .select("text", "sh").as[(String, Seq[String])].collect().toMap
    assert(df("a b c d") === Seq("a b c", "b c d"))
    assert(df("x y") === Seq())
  }

  test("pair operators leave no pinned storage behind (cache-hygiene contract)", SlowTest) {
    // Every persist()/localCheckpoint an operator takes internally must be
    // released before it returns: in a long-running service leaked blocks
    // accumulate until eviction/OOM, and in a multi-query session they
    // degrade every query scheduled later (the round-3 bench regressed 16×
    // on late queries from exactly this). Snapshot-diff so caches held
    // legitimately by OTHER tests in the shared session don't false-fail.
    val sc = spark.sparkContext
    def pinnedIds: Set[Int] =
      sc.getRDDStorageInfo.filter(_.numCachedPartitions > 0).map(_.id).toSet
    val before = pinnedIds
    val docs = Seq.tabulate(40)(i => (i.toLong, s"w${i % 7} common text body w$i w${i + 1} w${i + 2}"))
      .toDF("doc_id", "text")
    val embs = Seq.tabulate(20)(i =>
      (i.toLong, Array.tabulate(64)(d => ((i * 31 + d * 7) % 13 - 6).toFloat), i % 3))
      .toDF("vec_id", "embedding", "label")
    Dedup.minhashCandidatePairs(docs).count()
    Dedup.simhashPairs(docs).count()
    Dedup.ngramJaccardCapped(docs).count()
    Similarity.annPairsLsh(embs).count()
    assert((pinnedIds -- before).isEmpty,
      s"pair operators leaked pinned RDD blocks: ${pinnedIds -- before}")
    // connectedComponents is the one documented exception: its result is
    // irreproducible from lineage (driver-side iteration), so it returns a
    // result-sized materialized frame — and release() must reclaim it fully
    val cc = Dedup.connectedComponents(
      Dedup.minhashCandidatePairs(docs).select("a_id", "b_id"), maxIters = 12)
    assert(cc.count() >= 0)
    Dedup.release(cc)
    val leaked = pinnedIds -- before
    assert(leaked.isEmpty, s"operators leaked pinned RDD blocks: $leaked")
  }

  test("no library code pins storage outside the two audited sites (source audit)") {
    // The storage-hygiene contract, machine-enforced at the source level:
    // persist()/cache()/localCheckpoint() may appear ONLY in
    // connectedComponents (released in its finally + via release()),
    // pageRank's lineage truncation (superseded pins released as each
    // successor materializes; result releasable via Dedup.release), the
    // sinks' per-batch blocks (each released in its finally — Sinks
    // fan-out, Similarity.hotSwapDedupSink's two-target survivor write,
    // TextOps.corpusStatsSink's histogram+count pair). The allowed files
    // pin their EXACT call-site counts, so a new site even in an audited
    // file fails until it is re-audited here — the round-3 leak class
    // must fail the build, not wait for a degraded bench.
    val allowed = Map(
      // +3 in round 11: incrementalFuzzyDedupSink's per-batch sig /
      // probe / verdicts pins, each released in a nested finally
      "src/main/scala/graft/ext/Dedup.scala" -> 9,
      // +2 in round 12: bfsDistances' edge cache + per-round frontier
      // pins, every one released in its finally AFTER the result is
      // checkpoint-materialized (Dedup.truncated) — the result is
      // Dedup.release-able, the pageRank contract
      // +3 in round 13: ssspBounded's symmetrized-edge cache + per-round
      // improved/newDist pins, same finally-release + truncated-result
      // contract as bfsDistances
      // +1 later in round 13: personalizedPageRank's truncating-run edge
      // cache, unpersisted in its finally — the exact pageRank contract
      "src/main/scala/graft/ext/Graph.scala" -> 7,
      "src/main/scala/graft/ext/Similarity.scala" -> 1,
      // +2 in round 11: lmScoreBatch's batch + marginal-histogram pins,
      // each released in a nested finally
      "src/main/scala/graft/ext/TextOps.scala" -> 3,
      // benchmark pinned for the query lifetime (released by the
      // termination listener) + the per-batch span across both writes
      "src/main/scala/graft/ext/CurationStream.scala" -> 2,
      // +2 in round 12: dqQuarantineSink's per-batch input + quarantine
      // pins (the quarantine frame feeds both the dead-letter write and
      // the clean-side anti-join), each released in a nested finally
      "src/main/scala/graft/io/Sinks.scala" -> 3,
      // round 13: nbModelBatch's per-batch input pin (the batch feeds
      // both the cnt and prior partial writes), released in its finally
      "src/main/scala/graft/ext/Classify.scala" -> 1,
      // round 13: jsonIngestBatch's per-batch flagged pin (one parse
      // feeds both the clean and dead-letter writes), finally-released
      "src/main/scala/graft/ext/WebOps.scala" -> 1,
      // round 13 continuation: coverageSelect's shingle-frame pin (k
      // greedy rounds each re-aggregate it), unpersisted in its finally
      "src/main/scala/graft/ext/Sampling.scala" -> 1)
    // (probe instruments live in probes/, outside the audited product
    // tree — their pins are in-run measurement scaffolding, not plans)
    val toks = Seq(".persist(", ".cache(", ".localCheckpoint(", ".checkpoint(")
    val root = java.nio.file.Paths.get("src/main/scala")
    val bad = scala.collection.mutable.ListBuffer[String]()
    java.nio.file.Files.walk(root).forEach { p =>
      if (p.toString.endsWith(".scala")) {
        val src = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        // strip line comments so prose mentioning the APIs doesn't trip it
        val code = src.replaceAll("//.*", "")
        val n = toks.map(t => code.sliding(t.length).count(_ == t)).sum
        val cap = allowed.getOrElse(p.toString, 0)
        if (n > cap) bad += s"$p: $n pin sites (audited: $cap)"
      }
    }
    assert(bad.isEmpty, s"unaudited storage pinning:\n${bad.mkString("\n")}")
  }

  test("sourceOverlap: pair matrix over a hand-built CC assignment, diagonal " +
    "counts within-source pairs") {
    // cluster 1: docs 1,2 (web) + 3 (wiki)  -> web/web 1 pair, web/wiki 2 pairs
    // cluster 10: docs 10,11 (wiki)         -> wiki/wiki 1 pair
    // doc 99 (books) unclustered            -> books appears nowhere
    val cc = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("doc_id", "component")
    val docs = Seq((1L, "web"), (2L, "web"), (3L, "wiki"),
      (10L, "wiki"), (11L, "wiki"), (99L, "books"))
      .toDF("doc_id", "source")
    val out = Dedup.sourceOverlap(docs, cc)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(out === Seq(
      ("web", "web", 1L, 1L),     // cluster 1: C(2,2)=1 within-web pair
      ("web", "wiki", 1L, 2L),    // cluster 1: 2 web x 1 wiki
      ("wiki", "wiki", 2L, 1L)))  // clusters 1 (n=1, 0 pairs) and 10 (1 pair)
  }

  test("connectedComponents with a checkpoint dir leaves no files after release", SlowTest) {
    // the reliable-checkpoint branch: iteration checkpoints must be
    // deleted by the operator (Spark never reclaims checkpoint FILES on
    // its own), and release() must delete the result's files too
    val sc = spark.sparkContext
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val prev = sc.getCheckpointDir
    sc.setCheckpointDir(dir)
    try {
      // a 21-node chain converges in a handful of star-contraction
      // rounds, so at least one intermediate checkpoint (every 3rd
      // round) happens
      val chain = (0L until 20L).map(i => (i, i + 1)).toDF("a_id", "b_id")
      val cc = Dedup.connectedComponents(chain, maxIters = 20)
      val comps = cc.select("component").distinct().count()
      assert(comps === 1L) // one chain, one component
      Dedup.release(cc)
      def filesUnder(p: java.io.File): Seq[java.io.File] = {
        val kids = Option(p.listFiles()).map(_.toSeq).getOrElse(Seq())
        kids.filter(_.isFile) ++ kids.filter(_.isDirectory).flatMap(filesUnder)
      }
      val residue = filesUnder(new java.io.File(dir))
      assert(residue.isEmpty, s"checkpoint files leaked: ${residue.take(5)}")
    } finally {
      prev match {
        case Some(p) => sc.setCheckpointDir(p)
        case None =>
          // SparkContext has no public unset; point it at a throwaway dir
          sc.setCheckpointDir(java.nio.file.Files.createTempDirectory("graft_ckpt_unused").toString)
      }
    }
  }

  test("repetitionStats: duplicate-bigram fraction and edge cases") {
    val docs = Seq(
      (1L, "a b a b a b"),        // bigrams: ab ba ab ba ab -> 5 total, 2 distinct
      (2L, "w x y z"),            // all distinct -> frac 0
      (3L, "solo"),               // <2 tokens -> zero bigrams, frac 0, not flagged
      (4L, "t t t t t t t t t t") // 9 bigrams all identical -> frac 8/9
    ).toDF("doc_id", "text")
    val r = graft.ext.TextOps.repetitionStats(docs).collect()
      .map(x => x.getLong(0) -> ((x.getLong(2), x.getLong(3), x.getDouble(4), x.getInt(5)))).toMap
    assert(r(1L) === ((5L, 2L, 1.0 - 2.0 / 5.0, 1)))
    assert(r(2L) === ((3L, 3L, 0.0, 0)))
    assert(r(3L) === ((0L, 0L, 0.0, 0)))
    assert(r(4L)._3 > 0.8 && r(4L)._4 === 1)
  }

  test("chunkTokens: window/stride coverage, overlap, and tail chunk") {
    // 10 tokens, window 4, stride 3 -> starts 0,3,6,9; last chunk has 1 token
    val docs = Seq((1L, (0 until 10).map(i => s"t$i").mkString(" ")), (2L, "only"))
      .toDF("doc_id", "text")
    val r = TextOps.chunkTokens(docs, window = 4, stride = 3).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    assert(r === Map(
      (1L, 0L) -> 4L, (1L, 1L) -> 4L, (1L, 2L) -> 4L, (1L, 3L) -> 1L,
      (2L, 0L) -> 1L))
    // adjacent chunks share window - stride tokens: verify via reconstruction
    val hashes = TextOps.chunkTokens(docs, window = 4, stride = 3)
      .where("doc_id = 1").select("chunk_hash").as[Long].collect().toSet
    val manual = Seq("t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9", "t9")
      .toDF("c").selectExpr(s"${TextOps.md5Long64("c")} as h").as[Long].collect().toSet
    assert(hashes === manual)
  }

  test("chunkDedup finds a chunk shared by two documents and none within one") {
    val shared = (0 until 8).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, shared), (2L, shared),                        // same 8-token chunk in both
      (3L, (0 until 8).map(i => s"u$i").mkString(" "))   // unique chunk
    ).toDF("doc_id", "text")
    val r = TextOps.chunkDedup(docs, window = 8, stride = 8).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("n_occurrences") === 2L)
    assert(r.head.getAs[Long]("n_docs") === 2L)
    assert(r.head.getAs[Long]("first_doc") === 1L)
  }

  test("tfidfTop ranks rare-but-frequent-in-doc terms above corpus-wide ones") {
    val docs = Seq(
      (1L, "rare rare rare common"),
      (2L, "common other other"),
      (3L, "common plain text here")
    ).toDF("doc_id", "text")
    val r = TextOps.tfidfTop(docs, k = 1).collect()
      .map(x => x.getLong(0) -> ((x.getString(1), x.getLong(2), x.getLong(3)))).toMap
    // doc 1: tf(rare)=3, df(rare)=1 -> score 9.0 beats common (tf 1, df 3 -> 1.0)
    assert(r(1L) === (("rare", 3L, 1L)))
    assert(r(2L) === (("other", 2L, 1L)))
    // doc 3: all tf=1; df=1 terms (here/plain/text) tie at 3.0, token asc -> "here"
    assert(r(3L) === (("here", 1L, 1L)))
  }

  test("repetitionCounts agrees with repetitionStats on every document") {
    // two independent formulations (per-row array lambdas vs explode +
    // aggregate) must produce the same totals; docs with <2 tokens have
    // no counts row and zero bigrams in the stats form
    val docs = Seq(
      (1L, "a b a b a b"), (2L, "w x y z"), (3L, "solo"), (4L, ""),
      (5L, "t t t t t t"), (6L, "p q r p q r p q")
    ).toDF("doc_id", "text")
    val stats = graft.ext.TextOps.repetitionStats(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    val counts = graft.ext.TextOps.repetitionCounts(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    stats.foreach { case (id, (nb, nd)) =>
      if (nb == 0L) assert(!counts.contains(id))
      else assert(counts(id) === ((nb, nd)))
    }
  }

  test("contamination counts shared shingles against the benchmark subset only") {
    // doc 0 is the benchmark (0 % 50 == 0); doc 101 shares its full text
    // (all shingles), doc 1 shares nothing, doc 2 shares one 3-gram window
    val docs = Seq(
      (0L, "p q r s t"),
      (101L, "p q r s t"),
      (1L, "u v w x y"),
      (2L, "p q r different tail")
    ).toDF("doc_id", "text")
    val r = graft.ext.Dedup.contamination(docs, benchModulus = 50, flagAt = 3)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getInt(2)))).toMap
    assert(!r.contains(0L)) // benchmark rows are excluded from the report
    assert(r(101L) === ((3L, 1))) // 3 shingles of "p q r s t", all shared
    assert(r(1L) === ((0L, 0)))
    assert(r(2L) === ((1L, 0))) // only "p q r"
  }

  test("weightedBySource: kept counts are the per-source hash sample") {
    val docs = Seq.tabulate(200)(i => (i.toLong, s"text $i", "src2"))
      .toDF("doc_id", "text", "source")
    val out = graft.ext.Sampling.weightedBySource(docs).collect()
    assert(out.length === 1)
    val row = out.head
    assert(row.getInt(1) === 10 + ((2 * 7) % 80)) // rate for src2
    assert(row.getLong(2) === 200L)
    // must equal the independent hashSample count at the same rate
    val expect = graft.ext.Sampling.hashSample(docs, "doc_id", row.getInt(1)).count()
    assert(row.getLong(3) === expect)
  }

  test("exact dedup groups identical texts and keeps the min doc_id") {
    val docs = Seq((1L, "same text here"), (5L, "same text here"), (9L, "different"))
      .toDF("doc_id", "text")
    val got = Dedup.exact(docs).orderBy("keeper_doc_id")
      .select("keeper_doc_id", "n_copies").as[(Long, Long)].collect()
    assert(got.toSeq === Seq((1L, 2L), (9L, 1L)))
  }

  test("identical texts get identical minhash signatures and band hashes") {
    val docs = Seq((1L, "w1 w2 w3 w4 w5 w6"), (2L, "w1 w2 w3 w4 w5 w6"), (3L, "z1 z2 z3 z4 z5"))
      .toDF("doc_id", "text")
    val sig = Dedup.minhashSignatures(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(9), r.getLong(10))).toMap
    assert(sig(1L) === sig(2L))
    assert(sig(1L) !== sig(3L))
  }

  test("simhash: identical docs equal, disjoint docs differ") {
    val docs = Seq((1L, "aa bb cc dd"), (2L, "aa bb cc dd"), (3L, "qq rr ss tt uu vv"))
      .toDF("doc_id", "text")
    val h = Dedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) === h(2L))
    assert(h(1L) !== h(3L))
  }

  test("SimHashBits codegen expression equals the 16 HOF aggregate passes on real docs") {
    import org.apache.spark.sql.functions.{col, expr, split}
    val hofBitSums = (0 until 16).map { i =>
      s"aggregate(hs, 0L, (acc, x) -> acc + case when shiftright(x, $i) % 2 = 1 then 1 else -1 end) as b$i"
    }
    val hofPacked = (0 until 16)
      .map(i => s"case when b$i > 0 then cast(${1 << i} as bigint) else 0L end")
      .mkString(" + ")
    val withHashes = Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("hs", expr(s"transform(toks, t -> ${TextOps.md5Long64("t")})"))
    val hof = withHashes.selectExpr("doc_id" +: hofBitSums: _*)
      .selectExpr("doc_id", s"$hofPacked as simhash")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val native = withHashes
      .select(col("doc_id"),
        graft.functions.SimHashFunctions.simhash_bits(col("hs"), 16).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native === hof)
  }

  test("connectedComponents: transitive chains collapse to the min label") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("a_id", "b_id")
    val comp = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("connectedComponents: a deep chain converges in O(log n) star rounds", SlowTest) {
    // the scale property the star-contraction rewrite exists for: a
    // 257-node chain (diameter 256) would need 128 two-hop min-label
    // rounds; large-star/small-star contracts it in ~log n. The bound
    // below is deliberately loose (2·log₂ + slack) — the assertion is
    // "logarithmic, not linear", not an exact round count.
    val n = 256L
    val chain = (0L until n).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val cc = Dedup.connectedComponents(chain, maxIters = 30)
    val rows = cc.collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(rows.length === (n + 1))
    assert(rows.forall(_._2 == 0L), "every chain node must label to the min (0)")
    Dedup.release(cc)
    assert(Dedup.lastCcRounds <= 20,
      s"star contraction took ${Dedup.lastCcRounds} rounds on a 257-node chain — not logarithmic")
  }

  test("connectedComponents: cross-linked clusters and a cycle resolve transitively") {
    // shapes min-label propagation handled and star contraction must too:
    // a cycle, a star joined to a chain via one bridge, and duplicates in
    // both orientations
    val pairs = Seq(
      (10L, 11L), (11L, 12L), (12L, 10L),           // cycle
      (20L, 25L), (25L, 21L), (21L, 20L), (25L, 20L), // dup edges + both orientations
      (30L, 31L), (31L, 32L), (32L, 33L), (5L, 30L), (33L, 40L) // bridge chain
    ).toDF("a_id", "b_id")
    val comp = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp === Map(
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 25L -> 20L,
      5L -> 5L, 30L -> 5L, 31L -> 5L, 32L -> 5L, 33L -> 5L, 40L -> 5L))
  }

  test("simhashPairs: identical docs at hamming 0; banding finds them without n² scan") {
    val docs = Seq((1L, "aa bb cc dd"), (2L, "aa bb cc dd"), (3L, "qq rr ss tt uu vv"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(docs, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.contains((1L, 2L, 0)))
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L))
  }

  test("simhash at 60 bits populates the high bits and matches the HOF formulation") {
    import org.apache.spark.sql.functions.{col, expr, split}
    val docs = Seq((1L, "aa bb cc dd ee"), (2L, "qq rr ss tt uu vv ww"), (3L, "m1 m2 m3 m4"))
      .toDF("doc_id", "text")
    val withHashes = docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("hs", expr(s"transform(toks, t -> ${TextOps.md5Long64("t")})"))
    val hofBitSums = (0 until 60).map { i =>
      s"aggregate(hs, 0L, (acc, x) -> acc + case when shiftright(x, $i) % 2 = 1 then 1 else -1 end) as b$i"
    }
    val hofPacked = (0 until 60)
      .map(i => s"case when b$i > 0 then cast(${1L << i} as bigint) else 0L end")
      .mkString(" + ")
    val hof = withHashes.selectExpr("doc_id" +: hofBitSums: _*)
      .selectExpr("doc_id", s"$hofPacked as simhash")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val native = Dedup.simhash(docs, bits = 60)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native === hof)
    // 60-bit signatures actually use the high bits (the old 16-bit form
    // left everything above bit 15 zero → only 16 buckets per band)
    assert(native.values.exists(_ >= (1L << 16)))
  }

  test("ngramJaccardPairs ranks the duplicated pair first with jaccard 1.0") {
    val docs = Seq(
      (1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "a b c x y z w q")
    ).toDF("doc_id", "text")
    val top = Dedup.ngramJaccardPairs(docs, topK = 10).head()
    assert((top.getLong(0), top.getLong(1)) === (1L, 2L))
    assert(top.getDouble(3) === 1.0)
  }

  test("ngramJaccardCapped with a non-binding cap equals the uncapped baseline on real docs") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val capped = Dedup.ngramJaccardCapped(docs, maxDf = 1000000, topK = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val uncapped = Dedup.ngramJaccardPairs(docs, topK = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(capped === uncapped)
  }

  test("nearDupPairsBlocked equals the row-level brute force on real embeddings") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val blocked = Similarity.nearDupPairsBlocked(emb, threshold = 0.4, blockSize = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val brute = Similarity.nearDupPairs(emb, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(blocked.nonEmpty)
    assert(blocked === brute)
  }

  test("cosine: identical vectors 1.0, orthogonal 0.0") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 2.0f))
    ).toDF("a", "b")
    val got = df.selectExpr(s"round(${Similarity.cosineExpr("a", "b")}, 6) as c")
      .as[Double].collect()
    assert(got.toSeq === Seq(1.0, 0.0))
  }

  test("VecDot codegen expression agrees with the higher-order formulation on real vectors") {
    import graft.functions.VectorFunctions.vec_dot
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001").limit(50)
    val a = emb.selectExpr("vec_id as a_id", "embedding as a")
    val b = emb.selectExpr("vec_id as b_id", "embedding as b")
    val pairs = a.join(b, col("a_id") < col("b_id"))
    val viaExpr = pairs.select(
      (vec_dot(col("a"), col("b")) /
        (sqrt(vec_dot(col("a"), col("a"))) * sqrt(vec_dot(col("b"), col("b"))))).as("c1"),
      expr(Similarity.cosineExpr("a", "b")).as("c2"))
    val bad = viaExpr.filter(col("c1") =!= col("c2")).count()
    assert(bad === 0L) // bit-identical, not just approximately equal
  }

  test("vec_dot is callable from SQL text after registration") {
    graft.functions.VectorFunctions.register(spark)
    val got = spark.sql(
      "SELECT vec_dot(array(cast(1.0 as float), cast(2.0 as float)), array(cast(3.0 as float), cast(4.0 as float))) AS d")
      .as[Double].head()
    assert(got === 11.0)
  }

  test("cosineTopK returns k rows, best first, excludes the query vector") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (1L, Array(0.9f, 0.1f, 0.0f), 0),
      (2L, Array(0.0f, 1.0f, 0.0f), 1),
      (3L, Array(-1.0f, 0.0f, 0.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.cosineTopK(vecs, 0L, 2)
      .select("vec_id").as[Long].collect()
    assert(got.toSeq === Seq(1L, 2L))
  }

  test("IVF: every vector gets exactly one cell; cell search returns its own neighbors") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val assign = Similarity.ivfAssign(emb)
    assert(assign.count() === emb.count())
    assert(assign.select("vec_id").distinct().count() === emb.count())
    // centroids are their own nearest centroid
    val selfCells = assign.filter(col("vec_id") < 16)
      .filter(col("vec_id") === col("cell")).count()
    assert(selfCells === 16L)
    val topk = Similarity.ivfTopK(emb).collect()
    assert(topk.length === 5)
    // results all come from the query vector's cell
    val qCell = assign.filter(col("vec_id") === 0).select("cell").first().getLong(0)
    assert(topk.forall(_.getLong(1) == qCell))
  }

  test("knnJoin: per-vector top-k matches the brute-force within-cell ranking", SlowTest) {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val got = Similarity.knnJoin(emb, kNbrs = 3, k = 16)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3), r.getLong(4)))
    // reference: cell-restricted pairs ranked driver-side
    import graft.functions.VectorFunctions.vec_dot
    val assign = Similarity.ivfAssign(emb, 16)
      .join(emb, "vec_id")
    val n = assign
      .withColumn("_norm", sqrt(vec_dot(col("embedding"), col("embedding"))))
      .filter(col("_norm") > 0)
      .withColumn("unit", expr("transform(embedding, x -> cast(x as double) / _norm)"))
      .select(col("vec_id"), col("cell"), col("unit"))
    val ref = n.selectExpr("vec_id", "cell", "unit")
      .join(n.selectExpr("vec_id as nbr_id", "cell as nc", "unit as nu"),
        col("cell") === col("nc") && col("vec_id") =!= col("nbr_id"))
      .select(col("vec_id"), col("nbr_id"),
        round(vec_dot(col("unit"), col("nu")), 6).as("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).toSeq
      .flatMap { case (vid, rows) =>
        rows.sortBy(t => (-t._3, t._2)).take(3).zipWithIndex
          .map { case ((_, nbr, sim), i) => (vid, nbr, sim, (i + 1).toLong) }
      }.toSet
    assert(got.toSet === ref)
    // every vector that shares a cell with ≥1 other vector appears
    val vecsWithNbrs = n.groupBy("cell").agg(count(lit(1)).as("cn"))
      .filter(col("cn") > 1)
      .join(n, "cell").select("vec_id").as[Long].collect().toSet
    assert(got.map(_._1).toSet === vecsWithNbrs)
  }

  test("lshBuckets: same sign pattern lands in the same bucket") {
    val mk = (s: Float) => Array.tabulate(8)(i => if (i % 2 == 0) s else -s)
    val vecs = Seq((1L, mk(0.5f), 0), (2L, mk(2.0f), 0), (3L, mk(-1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val b = Similarity.lshBuckets(vecs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(b(1L) === b(2L))
    assert(b(1L) !== b(3L))
  }

  test("approx_count_distinct gate: exact column is exact, accuracy booleans green", SlowTest) {
    // (l_returnflag, exact_orders, exact_parts, orders_within_5pct, parts_within_5pct)
    val rows = graft.ops.Functions.approxDistinct(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Boolean, Boolean)].collect()
    val exact = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("n"))
      .as[(String, Long)].collect().toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r._2 === exact(r._1), s"exact_orders drifted for ${r._1}")
      assert(r._4 && r._5, s"sketch accuracy flag false for ${r._1}")
    }
  }

  test("langId predicts the profile language on marker-heavy text") {
    val docs = Seq((1L, "der hund und die katze und das haus", "de"))
      .toDF("doc_id", "text", "lang")
    val row = TextOps.langId(docs).head()
    assert(row.getAs[String]("predicted_lang") === "de")
    assert(row.getAs[Long]("is_correct") === 1L)
  }

  test("textStats: token counts and ratios on a known sentence") {
    val docs = Seq((1L, "the cat sat on a mat")).toDF("doc_id", "text")
    val r = TextOps.textStats(docs).head()
    assert(r.getAs[Long]("n_tokens") === 6L)
    assert(r.getAs[Long]("n_uniq_tokens") === 6L)
    assert(math.abs(r.getAs[Double]("stopword_ratio") - 2.0 / 6.0) < 1e-12)
  }

  test("blockDedupRewrite drops repeated spans corpus-wide, keeps first, rebuilds in order", SlowTest) {
    val span = (0 until 16).map(i => s"s$i").mkString(" ") // one full 16-token block
    val tailA = (0 until 16).map(i => s"a$i").mkString(" ")
    val tailB = (0 until 4).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, s"$span $tailA"), // first occurrence of span + own tail
      (2L, s"$span $tailB"), // span is a duplicate here; short tail survives
      (3L, span)             // everything duplicated -> empty rewrite
    ).toDF("doc_id", "text")
    val r = TextOps.blockDedupRewrite(docs).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getString(3)))).toMap
    assert(r(1L) === ((2L, 2L, s"$span $tailA")))
    assert(r(2L) === ((2L, 1L, tailB)))
    assert(r(3L)._1 === 1L && r(3L)._2 === 0L && r(3L)._3 == null)
  }

  test("blockDedupRewrite: a surviving empty-string span rebuilds as '', not NULL") {
    // r4 ADVICE edge: nullif on the JOINED string conflated "no surviving
    // spans" (NULL, string_agg-over-no-rows semantics) with a legitimately
    // surviving empty span (''). split('') -> [''] -> one block of btext ''
    val docs = Seq(
      (1L, ""), // corpus-first empty text: its '' span survives -> new_text ''
      (2L, "")  // duplicate empty span: nothing survives -> new_text NULL
    ).toDF("doc_id", "text")
    val r = TextOps.blockDedupRewrite(docs).collect()
      .map(x => x.getLong(0) -> ((x.getLong(2), x.getString(3)))).toMap
    assert(r(1L) === ((1L, "")))
    assert(r(2L)._1 === 0L && r(2L)._2 == null)
  }

  test("blockDedupRewrite is invariant under repartitioning", SlowTest) {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val a = TextOps.blockDedupRewrite(docs).orderBy("doc_id").collect().toSeq
    val b = TextOps.blockDedupRewrite(docs.repartition(13)).orderBy("doc_id").collect().toSeq
    assert(a === b)
    // dedup must actually fire on the real corpus for the gate to mean anything
    assert(a.exists(r => r.getLong(2) < r.getLong(1)))
  }

  test("dupSpans finds the maximal duplicated passage at ANY offset; block form is alignment-blind") {
    // a 10-token passage P shared by two docs at DIFFERENT offsets (3 vs
    // 0) — the alignment-free case the disjoint-block form cannot see
    val p = (0 until 10).map(i => s"p$i").mkString(" ")
    val fillA = (0 until 3).map(i => s"a$i").mkString(" ")
    val tailA = (0 until 5).map(i => s"x$i").mkString(" ")
    val tailB = (0 until 7).map(i => s"y$i").mkString(" ")
    val docs = Seq(
      (1L, s"$fillA $p $tailA"), // P at token positions [3, 12]
      (2L, s"$p $tailB")         // P at token positions [0, 9]
    ).toDF("doc_id", "text")
    val spans = TextOps.dupSpans(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // duplicated 8-windows: doc1 starts 3,4,5 ≡ doc2 starts 0,1,2 → one
    // maximal island per doc covering exactly P
    assert(spans.toSet === Set((1L, 3L, 12L, 10L, 3L), (2L, 0L, 9L, 10L, 3L)))
  }

  test("dupSpans merges overlapping windows within a doc and splits distant islands") {
    val p = (0 until 8).map(i => s"q$i").mkString(" ")
    val mid = (0 until 10).map(i => s"m$i").mkString(" ")
    // doc 1: P ... P (two islands, far apart); doc 2: P once
    val docs = Seq(
      (1L, s"$p $mid $p"),
      (2L, p)
    ).toDF("doc_id", "text")
    val spans = TextOps.dupSpans(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(spans.toSet === Set((1L, 0L, 7L), (1L, 18L, 25L), (2L, 0L, 7L)))
  }

  test("substringDedup keeps the corpus-first copy, removes the rest, rebuilds in order") {
    val p = (0 until 10).map(i => s"p$i").mkString(" ")
    val fillA = (0 until 3).map(i => s"a$i").mkString(" ")
    val tailB = (0 until 7).map(i => s"y$i").mkString(" ")
    val docs = Seq(
      (1L, s"$fillA $p"),  // first (smallest doc_id) occurrence: kept intact
      (2L, s"$p $tailB"),  // loser: P removed, own tail survives
      (3L, p)              // everything duplicated -> NULL rewrite
    ).toDF("doc_id", "text")
    val r = TextOps.substringDedup(docs).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getString(3)))).toMap
    assert(r(1L) === ((13L, 13L, s"$fillA $p")))
    assert(r(2L) === ((17L, 7L, tailB)))
    assert(r(3L)._1 === 10L && r(3L)._2 === 0L && r(3L)._3 == null)
  }

  test("substringDedup: no duplicates -> identity rewrite; invariant under repartitioning", SlowTest) {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val a = TextOps.substringDedup(docs).orderBy("doc_id").collect().toSeq
    val b = TextOps.substringDedup(docs.repartition(13)).orderBy("doc_id").collect().toSeq
    assert(a === b)
    // every doc accounted for, n_kept <= n_tokens, and identity where intact
    assert(a.size.toLong === docs.count())
    assert(a.forall(r => r.getLong(2) <= r.getLong(1)))
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    a.filter(r => r.getLong(2) === r.getLong(1)).take(20).foreach { r =>
      assert(r.getString(3) === texts(r.getLong(0)))
    }
  }

  test("heavyHitters equals the exact GROUP BY/HAVING form, any partitioning", SlowTest) {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    def exact(k: Int): Seq[(String, Long)] = {
      val toks = docs.select(explode(split(col("text"), " ")).as("token"))
      val n = toks.count()
      toks.groupBy("token").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * k > n)
        .orderBy(col("cnt").desc, col("token"))
        .as[(String, Long)].collect().toSeq
    }
    val want = exact(40)
    assert(want.nonEmpty) // non-vacuous: some tokens qualify...
    val got = TextOps.heavyHitters(docs, k = 40).as[(String, Long)].collect().toSeq
    assert(got === want)
    // ...and some don't (the distinct-token count exceeds the heavy set)
    val distinctToks = docs.select(explode(split(col("text"), " ")).as("t"))
      .distinct().count()
    assert(distinctToks > want.size)
    val gotRepart = TextOps.heavyHitters(docs.repartition(17), k = 40)
      .as[(String, Long)].collect().toSeq
    assert(gotRepart === want)
  }

  test("heavyHitters with a tight capacity still finds the dominant token exactly") {
    // skewed stream: 'hot' is 60% of tokens; capacity 4 forces constant
    // eviction in the sketch, but the superset guarantee + exact re-count
    // must still return precisely the > N/3 set
    val words = Seq.tabulate(500)(i => if (i % 5 < 3) "hot" else s"w${i % 97}")
    val docs = words.grouped(20).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val got = TextOps.heavyHitters(docs, k = 3, capacity = 4)
      .as[(String, Long)].collect().toSeq
    assert(got === Seq(("hot", 300L)))
  }

  test("text/embedding operators return empty results on an empty corpus, no crash") {
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val emb = Seq.empty[(Long, Array[Float], Int)].toDF("vec_id", "embedding", "label")
    assert(TextOps.heavyHitters(docs).count() === 0)
    assert(TextOps.blockDedupRewrite(docs).count() === 0)
    assert(TextOps.invertedIndex(docs).count() === 0)
    assert(TextOps.tokenPmi(docs).count() === 0)
    assert(TextOps.bm25Top(docs).count() === 0)
    assert(TextOps.gopherQuality(docs).count() === 0)
    assert(TextOps.shingleNovelty(docs).count() === 0)
    assert(TextOps.tfidfCosinePairs(docs).count() === 0)
    assert(TextOps.packSequences(docs).count() === 0)
    assert(Dedup.containmentPairs(docs).count() === 0)
    assert(Similarity.semanticDedup(emb).count() === 0)
    val noEdges = Seq.empty[(Long, Long, Long)].toDF("src", "dst", "weight")
    assert(Graph.pageRank(noEdges).count() === 0)
    val ev = Seq.empty[(Long, java.sql.Timestamp, Long, String, Double, String)]
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(graft.session.StateOps.funnelSteps(ev).count() === 0)
    assert(graft.session.StateOps.cohortRetention(ev).count() === 0)
    assert(graft.session.StateOps.rfmSegments(ev).count() === 0)
    assert(graft.session.StateOps.attribution(ev).count() === 0)
  }

  test("IVF null-cell contract: no usable centroids keeps all rows, NULL cell; sparse ids fill the codebook") {
    // all vectors zero-norm: the codebook is empty but the assignment must
    // not drop rows — each vector reports "no cell" and pairs with nothing
    val degenerate = Seq(
      (20L, Array(0.0f, 0.0f), 0),
      (21L, Array(0.0f, 0.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val assign = Similarity.ivfAssign(degenerate, k = 16)
    assert(assign.count() === 2)
    assert(assign.filter(col("cell").isNull && col("cent_sim").isNull).count() === 2)
    val sd = Similarity.semanticDedup(degenerate, k = 16)
    assert(sd.count() === 2)
    assert(sd.filter(col("is_dup") === 0).count() === 2) // NULL cells never pair

    // sparse/offset id space: the codebook takes the k SMALLEST ids with a
    // well-defined unit — ids >= k must still produce real centroids (the
    // old `vec_id < k` rule silently yielded an empty codebook here)
    val sparse = Seq(
      (20L, Array(1.0f, 0.0f), 0),
      (21L, Array(0.0f, 1.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val sparseAssign = Similarity.ivfAssign(sparse, k = 16).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sparseAssign === Map(20L -> 20L, 21L -> 21L)) // own nearest centroid
  }

  test("zero-norm embeddings: NULL unit, no NaN crash, and they pair with nothing") {
    // r4 ADVICE: an all-zero embedding used to normalize to an all-NaN
    // unit, which crashed the fused argmax's decimal rounding at runtime.
    // k=1: vec 0 (smallest non-null id) is the only centroid, so 20
    // shares its cell; 21 is zero-norm (excluded from the codebook AND
    // cell-less)
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (20L, Array(0.9f, 0.1f), 0),
      (21L, Array(0.0f, 0.0f), 1) // zero norm: cosine undefined
    ).toDF("vec_id", "embedding", "label")
    val assign = Similarity.ivfAssign(emb, k = 1).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(assign.size === 3) // no crash, no dropped rows
    assert(assign(21L).isNullAt(1) && assign(21L).isNullAt(2)) // NULL cell + sim
    assert(assign(0L).getLong(1) === 0L && assign(20L).getLong(1) === 0L)
    val sd = Similarity.semanticDedup(emb, threshold = 0.4, k = 1)
    assert(sd.count() === 3)
    // vec 20 dups vec 0 (cos ≈ 0.994); the zero-norm vector is never a dup
    assert(sd.filter(col("vec_id") === 20L && col("dup_of") === 0L).count() === 1)
    assert(sd.filter(col("vec_id") === 21L && col("is_dup") === 0).count() === 1)
  }

  test("round6/cmpSim are total on non-finite doubles (NaN/Inf pass through, NaN greatest)") {
    import graft.functions.VecArgmaxCell.{cmpSim, round6}
    assert(round6(Double.NaN).isNaN)
    assert(round6(Double.PositiveInfinity) === Double.PositiveInfinity)
    assert(round6(Double.NegativeInfinity) === Double.NegativeInfinity)
    assert(round6(1.2345675) === 1.234568) // HALF_UP still exact on finite
    assert(cmpSim(Double.NaN, Double.PositiveInfinity) > 0) // NaN sorts greatest
    assert(cmpSim(0.0, -0.0) === 0) // Spark ordering: -0.0 == 0.0
    assert(cmpSim(1.0, 2.0) < 0)
  }

  test("GenScale fact replicas: per-orderkey structure replicates bit-exactly; result sizes scale linearly") {
    // the TPC-H scaling-bench construction: orderkey-offset replicas mean
    // every order-scoped join (q21's wait chain, q7/8/9's order join)
    // sees disjoint replicas — a super-linear TIME curve can then only be
    // the engine's. Replica 1, shifted back, must equal the base facts
    // bit-for-bit.
    val dir = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
    val off = math.max(
      ord.agg(max(col("o_orderkey"))).head().getLong(0),
      li.agg(max(col("l_orderkey"))).head().getLong(0)) + 1
    val li2 = GenScale.scaleLineitem(li, 2, off)
    val ord2 = GenScale.scaleOrders(ord, 2, off)
    assert(li2.count() === 2 * li.count())
    assert(ord2.count() === 2 * ord.count())
    val liShift = li2.filter(col("l_orderkey") >= off)
      .withColumn("l_orderkey", col("l_orderkey") - off)
    assert(liShift.exceptAll(li).count() === 0L)
    assert(li.exceptAll(liShift).count() === 0L)
    val ordShift = ord2.filter(col("o_orderkey") >= off)
      .withColumn("o_orderkey", col("o_orderkey") - off)
    assert(ordShift.exceptAll(ord).count() === 0L)
    assert(ord.exceptAll(ordShift).count() === 0L)
  }

  test("GenScale replicas: replica 0 unchanged, replicas never pair, structure replicates", SlowTest) {
    // the scaling-bench construction must not change the ANSWER shape:
    // each replica reproduces the source's near-dup structure (up to LSH
    // banding noise) and replicas never pair with each other
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val nDocs = docs.count()
    // offsets are max(id)+1 (the generator's contract for sparse ids);
    // testdata ids are dense 0..n-1 so this equals the row count
    val docOffset = docs.agg(max(col("doc_id"))).head().getLong(0) + 1
    val x2 = GenScale.scaleDocuments(docs, 2, docOffset)
    assert(x2.count() === 2 * nDocs)
    val basePairs = Dedup.minhashCandidatePairs(docs)
    val base = basePairs.count()
    val scaled = Dedup.minhashCandidatePairs(x2)
    // replica 0 is byte-identical, so its candidate set is unchanged
    assert(scaled.filter(col("a_id") < nDocs && col("b_id") < nDocs).count() === base)
    // no pair crosses the replica boundary (content-disjoint vocabularies)
    assert(scaled.filter(col("a_id") < nDocs && col("b_id") >= nDocs).count() === 0)
    // the renamed replica reproduces the source's near-dup structure up to
    // LSH banding noise (band hashes are not renaming-invariant, so a
    // borderline candidate can appear/disappear) — its pair count must
    // stay in the same band as the source's, never collapse or blow up
    val rep1 = scaled.filter(col("a_id") >= nDocs).count()
    assert(rep1 >= base / 2 && rep1 <= base * 2, s"replica pairs $rep1 vs base $base")
    // embeddings: the sign-flip transform preserves within-replica cosines
    // bit-exactly, so semantic-dedup verdicts replicate 1:1
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val nEmb = emb.count()
    val embOffset = emb.agg(max(col("vec_id"))).head().getLong(0) + 1
    val e2 = GenScale.scaleEmbeddings(emb, 2, embOffset)
    assert(e2.count() === 2 * nEmb)
    // k pinned: the "same codebook" premise below needs both corpora on
    // the first-16-vectors codebook (the adaptive default would re-size)
    val baseDups = Similarity.semanticDedup(emb, k = 16).filter(col("is_dup") === 1)
      .select("vec_id").as[Long].collect().toSet
    val scaledDups = Similarity.semanticDedup(e2, k = 16).filter(col("is_dup") === 1)
      .filter(col("vec_id") < nEmb) // replica 0 slice: same codebook, same cells
      .select("vec_id").as[Long].collect().toSet
    assert(scaledDups === baseDups)
  }

  test("incrementalDedup: new-batch docs match only the existing corpus, never each other") {
    val textA = (0 until 20).map(i => s"a$i").mkString(" ")
    val textB = (100 until 120).map(i => s"b$i").mkString(" ")
    val textC = (200 until 220).map(i => s"c$i").mkString(" ")
    val docs = Seq(
      (0L, textA),  // existing
      (1L, textB),  // existing
      (4L, textA),  // new, exact dup of existing doc 0 -> flagged
      (9L, textC),  // new, novel -> clean
      (14L, textC)  // new, dup of ANOTHER NEW doc only -> must stay clean
    ).toDF("doc_id", "text")
    val r = Dedup.incrementalDedup(docs).collect()
      .map(x => x.getLong(0) -> ((if (x.isNullAt(1)) None else Some(x.getLong(1))), x.getInt(2)))
      .toMap
    assert(r.keySet === Set(4L, 9L, 14L)) // one row per NEW doc, always
    assert(r(4L) === ((Some(0L), 1)))
    assert(r(9L) === ((None, 0)))
    assert(r(14L) === ((None, 0))) // new x new pairs are never generated
  }

  test("containmentPairs flags a quoted subset that Jaccard would miss") {
    val long = (0 until 40).map(i => s"w$i").mkString(" ")
    val short = (0 until 10).map(i => s"w$i").mkString(" ") // fully quoted prefix
    val other = (100 until 140).map(i => s"x$i").mkString(" ")
    val docs = Seq((1L, long), (2L, short), (3L, other)).toDF("doc_id", "text")
    val r = Dedup.containmentPairs(docs).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getLong(0) === 1L && row.getLong(1) === 2L)
    assert(row.getDouble(5) === 1.0) // containment: short's 8 shingles all in long
    assert(row.getDouble(6) < 0.25)  // jaccard stays low — the missed case
  }

  test("gopherQuality: each rule fires independently and the pass flag conjoins them") {
    val good = ((0 until 60).map(i => s"word$i") ++ Seq("the", "of")).mkString(" ")
    val tooShort = "the of words here"
    val longWords = ((0 until 60).map(i => "a" * 15 + i) ++ Seq("the", "of")).mkString(" ")
    val nonAlpha = ((0 until 60).map(i => s"$i$i$i") ++ Seq("the", "of")).mkString(" ")
    val noStop = (0 until 60).map(i => s"word$i").mkString(" ")
    val docs = Seq((1L, good), (2L, tooShort), (3L, longWords), (4L, nonAlpha), (5L, noStop))
      .toDF("doc_id", "text")
    val r = TextOps.gopherQuality(docs).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getBoolean(9), r(1L).toString) // gopher_pass
    assert(!r(2L).getBoolean(5) && !r(2L).getBoolean(9)) // word count
    assert(!r(3L).getBoolean(6) && !r(3L).getBoolean(9)) // mean word length
    assert(!r(4L).getBoolean(7) && !r(4L).getBoolean(9)) // alpha fraction
    assert(!r(5L).getBoolean(8) && !r(5L).getBoolean(9)) // required stopwords
  }

  test("shingleNovelty: original text scores 1.0, a verbatim later copy scores 0.0") {
    val a = (0 until 20).map(i => s"w$i").mkString(" ")
    val b = (100 until 120).map(i => s"v$i").mkString(" ")
    val docs = Seq(
      (1L, a),            // all shingles first seen here
      (2L, b),            // all novel too
      (3L, a),            // verbatim copy of doc 1 -> nothing novel
      (4L, s"$a $b")      // concatenation: only the 2 seam shingles... plus none
    ).toDF("doc_id", "text")
    val r = TextOps.shingleNovelty(docs).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(3)))).toMap
    assert(r(1L)._2 === 1.0)
    assert(r(2L)._2 === 1.0)
    assert(r(3L)._2 === 0.0)
    // doc 4 recycles both texts; only the boundary-spanning shingles are new
    assert(r(4L)._2 > 0.0 && r(4L)._2 < 0.2, r(4L).toString)
  }

  test("pageRank: sink-heavy star concentrates rank on the hub; ranks sum to ~1", SlowTest) {
    // spokes 1..4 each point to hub 0; hub points back to node 1
    val edges = (Seq((0L, 1L)) ++ (1L to 4L).map(s => (s, 0L)))
      .map { case (s, d) => (s, d, 1L) }
      .toDF("src", "dst", "weight")
    val rdf = Graph.pageRank(edges, iters = 20)
    val r = rdf.collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r.size === 5)
    assert(r(0L) === r.values.max) // everything flows into the hub
    assert(r(1L) > r(2L))          // node 1 also receives the hub's mass
    assert(math.abs(r.values.sum - 1.0) < 1e-3) // no dangling nodes -> mass conserved
    assert(r(2L) === r(3L) && r(3L) === r(4L)) // symmetric spokes tie exactly
    // iters=20 crosses the checkpointEvery=10 default, so the result is
    // checkpoint-backed (truncated lineage) — and must be bit-identical
    // to the fully-unrolled plan
    val unrolled = Graph.pageRank(edges, iters = 20, checkpointEvery = Int.MaxValue)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(unrolled === r)
    Dedup.release(rdf)
  }

  test("matryoshkaProbe: k flags per list; full truncation (dims = d) makes the lists identical") {
    val r = SparkEntry.queries("embed_truncate")(spark, "/root/testdata/sf0.001").collect()
    assert(r.count(_.getBoolean(3)) === 10) // in_full
    assert(r.count(_.getBoolean(4)) === 10) // in_trunc
    assert(r.length >= 10 && r.length <= 20)
    r.foreach(x => assert(x.getBoolean(3) || x.getBoolean(4)))
    // degenerate check: truncating to the full dimension is a no-op, so
    // both lists coincide and every row carries both flags
    val same = graft.ext.Similarity.matryoshkaProbe(
      Tables.embeddings(spark, "/root/testdata/sf0.001"), dims = 64).collect()
    assert(same.length === 10)
    same.foreach { x =>
      assert(x.getBoolean(3) && x.getBoolean(4))
      assert(x.getDouble(1) === x.getDouble(2))
    }
  }

  test("rrfFusion: fused score is exactly the reciprocal-rank sum; ordering monotone") {
    val r = SparkEntry.queries("rank_fusion")(spark, "/root/testdata/sf0.001").collect()
    assert(r.nonEmpty && r.length <= 20)
    val scores = r.map(_.getDouble(3))
    assert(scores.sameElements(scores.sorted.reverse), "rrf_score not monotone")
    r.foreach { x =>
      val ra = if (x.isNullAt(1)) 0.0 else 1.0 / (60 + x.getInt(1))
      val rb = if (x.isNullAt(2)) 0.0 else 1.0 / (60 + x.getInt(2))
      assert(x.getDouble(3) === ra + rb)
    }
  }

  test("prefixFilterPairs: near-dup pair surfaces with exact overlap; unrelated doc never pairs") {
    // A and B share 7 of their shingles (one tail word differs); C is disjoint
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 zz"),
      (3L, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"))
      .toDF("doc_id", "text")
    val r = Dedup.prefixFilterPairs(docs, 3, 5).collect()
    assert(r.length === 1)
    val row = r.head
    assert((row.getLong(0), row.getLong(1)) === ((1L, 2L)))
    // 8 shingles each, the last trigram differs -> 7 common, union 9
    assert(row.getLong(4) === 7L)
    assert(math.abs(row.getDouble(5) - 7.0 / 9.0) < 1e-12)
    // below threshold: tighten to 9/10 and the 7/9 pair must vanish
    assert(Dedup.prefixFilterPairs(docs, 9, 10).count() === 0L)
  }

  test("IndexCache.prefixPairs: cached truth is bit-identical to fresh; corpus never rebuilt on hit") {
    import graft.ext.IndexCache
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 zz"),
      (3L, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"))
      .toDF("doc_id", "text")
    val key = s"prefixpairs-spec-${System.nanoTime()}"
    val fresh = Dedup.prefixFilterPairs(docs, 3, 5)
      .collect().map(_.toSeq).sortBy(_.toString)
    val cached = IndexCache.prefixPairs(spark, docs, key)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(cached === fresh)
    // a hit must not construct the corpus frame (by-name contract)
    var built = false
    val hit = IndexCache.prefixPairs(spark, { built = true; docs }, key)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(hit === fresh && !built)
  }

  test("IndexCache.ccClusters: cached CC is bit-identical to fresh; hit runs zero CC rounds", SlowTest) {
    import graft.ext.IndexCache
    // docs 1≈2 near-dup (one cluster), 3 disjoint; the verified variant
    // (minEst) must produce its own independent cache entry
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
      (3L, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"))
      .toDF("doc_id", "text")
    val key = s"ccclusters-spec-${System.nanoTime()}"
    val fresh = Dedup.connectedComponents(
      Dedup.minhashCandidatePairs(docs).select("a_id", "b_id"))
      .collect().map(_.toSeq).sortBy(_.toString)
    val cached = IndexCache.ccClusters(docs, key)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(cached === fresh)
    // a hit must not construct the corpus frame (by-name contract) and
    // must not re-enter the CC loop (telemetry untouched)
    val telBefore = Dedup.lastCcTelemetry
    var built = false
    val hit = IndexCache.ccClusters({ built = true; docs }, key)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(hit === fresh && !built)
    assert(Dedup.lastCcTelemetry === telBefore)
    // the verified-graph variant keys separately and filters before CC
    val verified = IndexCache.ccClusters(docs, key, minEst = Some(0.5))
      .collect().map(_.toSeq).sortBy(_.toString)
    val verifiedFresh = Dedup.connectedComponents(
      Dedup.minhashCandidatePairs(docs)
        .filter(col("est_jaccard") >= 0.5).select("a_id", "b_id"))
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(verified === verifiedFresh)
  }

  test("IndexCache.basketModel: cached triple bit-identical to fresh; corpus never rebuilt on hit") {
    import graft.ext.IndexCache
    val df = Seq((1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"), (3L, "x"))
      .toDF("basket", "item")
    val key = s"basket-spec-${System.nanoTime()}"
    val (fs, fi, fp) = graft.ops.Mining.basketModel(df, "basket", "item", 0.5)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toSeq).sortBy(_.toString).toSeq
    val (cs, ci, cp) = IndexCache.basketModel(df, key, "basket", "item", 0.5)
    assert(rows(cs) === rows(fs) && rows(ci) === rows(fi) && rows(cp) === rows(fp))
    var built = false
    val (hs, hi, hp) = IndexCache.basketModel(
      { built = true; df }, key, "basket", "item", 0.5)
    assert(!built)
    assert(rows(hs) === rows(fs) && rows(hi) === rows(fi) && rows(hp) === rows(fp))
    // a different ratio is a different model, not a stale hit
    val (s2, _, _) = IndexCache.basketModel(df, key, "basket", "item", 0.9)
    assert(rows(s2) !== rows(fs)) // min_n differs (2 -> 3)
  }

  test("lshTuning: exact duplicates are candidates AND truth in every config; counts reconcile") {
    // doc 1 == doc 2 (identical signatures -> same band hash in EVERY
    // config), doc 3 disjoint (deterministic md5 minhashes -> no shared
    // band, stable run to run)
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
      (3L, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"))
      .toDF("doc_id", "text")
    val r = Dedup.lshTuning(docs)
      .orderBy("bands")
      .as[(Int, Int, Long, Long, Long, Option[Double], Option[Double])]
      .collect().toSeq
    assert(r === Seq(
      (2, 8, 1L, 1L, 1L, Some(1.0), Some(1.0)),
      (4, 4, 1L, 1L, 1L, Some(1.0), Some(1.0)),
      (8, 2, 1L, 1L, 1L, Some(1.0), Some(1.0))))
    // empty-denominator contract: a corpus with no pairs at all
    val lone = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val e = Dedup.lshTuning(lone).as[(Int, Int, Long, Long, Long, Option[Double], Option[Double])]
      .collect().toSeq
    assert(e.forall(x => x._3 === 0L && x._4 === 0L && x._5 === 0L &&
      x._6.isEmpty && x._7.isEmpty))
    intercept[IllegalArgumentException](Dedup.lshTuning(docs, k = 8, configs = Seq((3, 3))))
    intercept[IllegalArgumentException](Dedup.lshTuning(docs, configs = Nil))
  }

  test("bfsDistances: min-hop distances, hop cap excludes far nodes, seeds dedup, undirected") {
    import graft.ext.Graph
    // path 1-2-3-4 plus disconnected 5-6; edge 3->2 is a back-edge
    // duplicate that must not change distances
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 2L), (3L, 4L), (5L, 6L))
      .toDF("src", "dst")
    val seeds = Seq(1L, 5L, 5L).toDF("node")
    val out = Graph.bfsDistances(edges, seeds, maxHops = 2)
      .as[(Long, Int)].collect().toMap
    assert(out === Map(1L -> 0, 5L -> 0, 2L -> 1, 6L -> 1, 3L -> 2))
    // node 4 is 3 hops away: present at maxHops = 3, not before
    val out3 = Graph.bfsDistances(edges, seeds, maxHops = 3)
      .as[(Long, Int)].collect().toMap
    assert(out3(4L) === 3)
    // seed-only graph edge case: a seed with no edges still reports dist 0
    val lone = Graph.bfsDistances(edges, Seq(99L).toDF("node"), maxHops = 2)
      .as[(Long, Int)].collect().toMap
    assert(lone === Map(99L -> 0))
    intercept[IllegalArgumentException](Graph.bfsDistances(edges, seeds, maxHops = 0))
  }

  test("ssspBounded: relaxation beats the direct edge; horizon bounds the answer; undirected min-weight", SlowTest) {
    import graft.ext.Graph
    // direct 1->4 costs 10; 1->2->3->4 costs 1+1+1 = 3 — only visible
    // after 3 relaxation rounds. Parallel edges 1->2 keep the MIN
    // weight; 9->1 back-edge makes weight asymmetric pre-symmetrize.
    val edges = Seq(
      (1L, 4L, 10L), (1L, 2L, 1L), (1L, 2L, 5L), (2L, 3L, 1L),
      (3L, 4L, 1L), (9L, 1L, 2L), (7L, 8L, 1L))
      .toDF("src", "dst", "w")
    val seeds = Seq(1L, 1L).toDF("node")
    def run(r: Int) = Graph.ssspBounded(edges, seeds, rounds = r)
      .as[(Long, Long)].collect().toMap
    // 1 round: only direct edges
    assert(run(1) === Map(1L -> 0L, 4L -> 10L, 2L -> 1L, 9L -> 2L))
    // 3 rounds: the 3-hop path undercuts the direct edge; 7/8 stay
    // unreachable from the seed component
    val r3 = run(3)
    assert(r3(4L) === 3L && r3(3L) === 2L && r3(2L) === 1L && r3(9L) === 2L)
    assert(!r3.contains(7L) && !r3.contains(8L))
    // converged: round 4 adds nothing on this graph
    assert(run(4) === r3)
    intercept[IllegalArgumentException](Graph.ssspBounded(edges, seeds, rounds = 0))
  }

  test("labelPropagation: two cliques joined by a bridge settle on per-clique labels") {
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = (clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(10L, 11L, 12L, 13L)) ++ Seq((4L, 10L)))
      .toDF("src", "dst")
    val r = Graph.labelPropagation(edges, iters = 3).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.size === 8)
    // each clique converges to its minimum id; the single bridge edge
    // never outvotes the three intra-clique neighbors
    Seq(1L, 2L, 3L, 4L).foreach(n => assert(r(n) === 1L, s"node $n -> ${r(n)}"))
    Seq(10L, 11L, 12L, 13L).foreach(n => assert(r(n) === 10L, s"node $n -> ${r(n)}"))
  }

  test("prioritySample: k rows, w_hat = max(w, tau); k >= n keeps all with w_hat = w") {
    import graft.ext.Sampling
    val docs = (1L to 500L).map(i => (i, 10L + (i % 97) * 3)).toDF("doc_id", "n_chars")
    val r = Sampling.prioritySample(docs, "doc_id", "n_chars", 50).collect()
    assert(r.length === 50)
    // estimator floor: every kept row's w_hat is >= its weight, and the
    // rows lifted to tau all share ONE threshold value
    val lifted = r.filter(x => x.getDouble(2) > x.getDouble(1)).map(_.getDouble(2)).distinct
    assert(r.forall(x => x.getDouble(2) >= x.getDouble(1)))
    assert(lifted.length <= 1)
    // deterministic: membership is pure hash, stable across re-runs and
    // repartitioning
    val again = Sampling.prioritySample(docs.repartition(7), "doc_id", "n_chars", 50).collect()
    assert(r.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
    // degenerate k >= n: keep everything, no row sacrificed to the threshold
    val all = Sampling.prioritySample(docs, "doc_id", "n_chars", 600).collect()
    assert(all.length === 500)
    assert(all.forall(x => x.getDouble(2) === x.getDouble(1)))
  }

  test("linkPredict: exact overlap scores on a double-star; hub cap prunes centers", SlowTest) {
    // stars: 10-{1,2,3} and 11-{2,3,4}; no candidate pair is an edge
    val edges = Seq((10L, 1L), (10L, 2L), (10L, 3L), (11L, 2L), (11L, 3L), (11L, 4L))
      .toDF("src", "dst")
    val out = Graph.linkPredict(edges, maxCenterDegree = 10, topK = 5)
      .select("node", "other", "cn", "jaccard", "pref_attach", "rk")
      .as[(Long, Long, Long, Double, Long, Int)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // (2,3): cn=2 deg=2,2 -> jaccard 1.0; (10,11): cn=2 deg=3,3 -> 0.5
    assert(out((2L, 3L))._3 === 2L && out((2L, 3L))._4 === 1.0 &&
      out((2L, 3L))._5 === 4L)
    assert(out((10L, 11L))._4 === 0.5 && out((10L, 11L))._5 === 9L)
    // node 2's ranking: 3 (j=1.0) then tie 1 vs 4 broken by id
    assert(out((2L, 3L))._6 === 1 && out((2L, 1L))._6 === 2 && out((2L, 4L))._6 === 3)
    // cap=2 removes the stars as wedge centers: only (10,11) survives,
    // witnessed through centers 2 and 3
    val capped = Graph.linkPredict(edges, maxCenterDegree = 2, topK = 5)
      .select("node", "other").as[(Long, Long)].collect().toSet
    assert(capped === Set((10L, 11L), (11L, 10L)))
    intercept[IllegalArgumentException](Graph.linkPredict(edges, maxCenterDegree = 0))
  }

  test("triangleCounts: 4-clique + pendant + isolated edge; duplicates/reversals collapse") {
    // clique {0,1,2,3} (one edge given BOTH directions and once duplicated),
    // pendant 4-0, disconnected edge 5-6
    val raw = Seq(
      (0L, 1L), (1L, 0L), (0L, 1L), (0L, 2L), (0L, 3L),
      (1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 0L), (5L, 6L))
      .toDF("src", "dst")
    val r = Graph.triangleCounts(raw).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r.size === 7)
    assert(r(0L) === ((4L, 3L, 500000L)))  // 2*3/(4*3) = 0.5
    Seq(1L, 2L, 3L).foreach(n => assert(r(n) === ((3L, 3L, 1000000L))))
    assert(r(4L) === ((1L, 0L, 0L)))
    assert(r(5L) === ((1L, 0L, 0L)) && r(6L) === ((1L, 0L, 0L)))
  }

  test("tfidfCosinePairs: rare-term overlap outranks common-term overlap", SlowTest) {
    // docs 1,2 share the RARE term; docs 3,4 share only terms that appear
    // everywhere (high df -> near-zero idf weight after the cap)
    val filler = (0 until 30).map(i => s"common$i").mkString(" ")
    val docs = Seq(
      (1L, s"rareterm alpha $filler"),
      (2L, s"rareterm beta $filler"),
      (3L, s"$filler gamma"),
      (4L, s"$filler delta")
    ).toDF("doc_id", "text")
    val r = TextOps.tfidfCosinePairs(docs, maxDf = 3, threshold = 0.0)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getDouble(2)).toMap
    // with maxDf=3 the 4-doc filler terms are dropped entirely: only the
    // rare-term pair survives with weight
    assert(r.contains((1L, 2L)), r.toString)
    // weights: rareterm df=2 -> w=2, alpha/beta df=1 -> w=4;
    // cos = 2·2 / (√20·√20) = 0.2 exactly
    assert(r((1L, 2L)) === 0.2, r.toString)
    assert(!r.contains((3L, 4L)), r.toString) // no surviving shared terms
    // identical docs -> cosine exactly 1.0
    val dup = Seq((1L, "x y z unique1"), (2L, "x y z unique1")).toDF("doc_id", "text")
    val one = TextOps.tfidfCosinePairs(dup, maxDf = 10, threshold = 0.0).head()
    assert(one.getDouble(2) === 1.0)
  }

  test("packSequences: contiguous fill bins by start offset; token mass conserved") {
    // 10 docs of exactly 100 tokens, one group, budget 250: start offsets
    // 0..900 -> bins 0:(0,100,200) 1:(300,400) 2:(500,600,700) 3:(800,900)
    // — equal sizes make the layout order-independent
    val docs = Seq.tabulate(10)(i => (i.toLong, Seq.fill(100)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val r = TextOps.packSequences(docs, budget = 250, groups = 1).collect()
      .map(x => x.getLong(1) -> ((x.getLong(2), x.getLong(3)))).toMap
    assert(r === Map(
      0L -> ((3L, 300L)), 1L -> ((2L, 200L)),
      2L -> ((3L, 300L)), 3L -> ((2L, 200L))))
    // real corpus: every token lands in exactly one bin
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
    val packed = TextOps.packSequences(corpus)
    val binTotal = packed.agg(sum(col("bin_tokens"))).as[Long].head()
    val docTotal = corpus.selectExpr("sum(size(split(text, ' ')))").as[Long].head()
    assert(binTotal === docTotal)
  }

  test("tokenPmi ranks a perfectly-bound pair above independent co-occurrence") {
    // 'aa bb' always adjacent (PMI high); 'xx' pairs with everything (PMI ~0)
    val docs = (1 to 30).map { i =>
      (i.toLong, s"aa bb xx w$i xx aa bb")
    }.toDF("doc_id", "text")
    val r = TextOps.tokenPmi(docs, minCount = 5)
      .as[(String, String, Long, Double)].collect()
    val byPair = r.map(x => (x._1, x._2) -> x._4).toMap
    assert(byPair(("aa", "bb")) > byPair(("bb", "xx")))
    assert(byPair(("aa", "bb")) > 0.0)
  }

  test("bm25Top prefers documents dense in rare query terms, zero-score docs dropped") {
    val docs = Seq(
      (1L, "spark spark spark join"),             // dense in two query terms
      (2L, "spark alpha beta gamma delta eps"),   // one hit, long doc
      (3L, "alpha beta gamma delta")              // no query terms -> dropped
    ).toDF("doc_id", "text")
    val r = TextOps.bm25Top(docs).select("doc_id").as[Long].collect().toSeq
    assert(r.head === 1L)
    assert(r.contains(2L) && !r.contains(3L))
  }

  test("invertedIndex postings are sorted, distinct, and complete") {
    val docs = Seq((3L, "z a a"), (1L, "a b"), (2L, "b a")).toDF("doc_id", "text")
    val r = TextOps.invertedIndex(docs).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getSeq[Long](2)))).toMap
    assert(r("a") === ((3L, Seq(1L, 2L, 3L))))
    assert(r("b") === ((2L, Seq(1L, 2L))))
    assert(r("z") === ((1L, Seq(3L))))
  }

  test("VecArgmaxCell equals the array_max(transform(...)) HOF form on real embeddings") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val n = emb
      .withColumn("_norm", expr(s"sqrt(${Similarity.cosineExpr("embedding", "embedding")})"))
      .withColumn("unit", expr("transform(embedding, x -> cast(x as double) / _norm)"))
      .select(col("vec_id"), col("unit"))
    val cents = n.filter(col("vec_id") < 16)
      .agg(collect_list(struct(col("vec_id").as("cent_id"), col("unit").as("cent_unit")))
        .as("cents"))
    graft.functions.VectorFunctions.register(spark)
    val both = n.crossJoin(broadcast(cents))
      .withColumn("fused",
        graft.functions.VecArgmaxCell.vec_argmax_cell(col("unit"), col("cents")))
      .withColumn("hof", expr(
        """array_max(transform(cents,
          |  c -> struct(round(vec_dot(unit, c.cent_unit), 6) as cent_sim,
          |              -c.cent_id as neg_cent_id)))""".stripMargin))
      .select(
        col("fused.cell"), col("fused.cent_sim"),
        (-col("hof.neg_cent_id")).as("hof_cell"), col("hof.cent_sim").as("hof_sim"))
    val bad = both.filter(
      col("cell") =!= col("hof_cell") || col("cent_sim") =!= col("hof_sim")).count()
    assert(bad === 0L) // bit-identical, including rounding and tie-breaks
    // empty centroid table -> null, like array_max over empty
    val empty = n.limit(1)
      .withColumn("cents", expr(
        "cast(array() as array<struct<cent_id:bigint,cent_unit:array<double>>>)"))
      .select(graft.functions.VecArgmaxCell.vec_argmax_cell(col("unit"), col("cents")).as("b"))
    assert(empty.filter(col("b").isNull).count() === 1L)
  }

  test("heavyHittersByGroup finds each group's own heavy set under tight capacity") {
    // two groups with DIFFERENT dominant tokens; capacity 4 forces
    // eviction inside each group's sketch independently
    val mk = (grp: String, hot: String) =>
      Seq.tabulate(200)(i => if (i % 5 < 3) hot else s"w${i % 83}")
        .grouped(20).zipWithIndex
        .map { case (ws, i) => (s"$grp-$i", grp, ws.mkString(" ")) }.toSeq
    val docs = (mk("en", "hotEN") ++ mk("de", "hotDE"))
      .toDF("doc_id", "lang", "text")
    val got = TextOps.heavyHittersByGroup(docs, "lang", k = 3, capacity = 4)
      .as[(String, String, Long)].collect().toSeq
    assert(got === Seq(("de", "hotDE", 120L), ("en", "hotEN", 120L)))
  }

  test("semanticDedup flags the higher id of a same-cell near-identical pair") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    // append an exact copy of vector 20 under a fresh high id: same cell,
    // cosine 1.0 -> must be flagged with dup_of pointing at a smaller id
    val clone = emb.filter(col("vec_id") === 20L)
      .select(lit(100000L).as("vec_id"), col("embedding"), col("label"))
    val r = Similarity.semanticDedup(emb.unionByName(clone))
    val byId = r.collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), if (x.isNullAt(2)) -1L else x.getLong(2), x.getInt(3))))
      .toMap
    val (cellClone, dupOf, isDup) = byId(100000L)
    assert(isDup === 1)
    assert(dupOf >= 0L && dupOf < 100000L)
    assert(cellClone === byId(20L)._1) // clone landed in vec 20's cell
    // every row is present exactly once and un-flagged rows carry no dup_of
    assert(byId.size === r.count().toInt)
    assert(byId.values.forall { case (_, d, f) => (f == 1) == (d >= 0L) })
  }

  test("embedPca: recovers a known principal axis; exact trace; verdicts hold") {
    // all mass along +/-(0.6, 0.8): rank-1 scatter, top axis known exactly
    val emb = Seq(
      (1L, Seq(3.0f, 4.0f)), (2L, Seq(-3.0f, -4.0f)),
      (3L, Seq(6.0f, 8.0f)), (4L, Seq(-6.0f, -8.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.embedPca(emb, k = 2)
      .orderBy("component")
      .select("component", "n", "trace_scaled", "var_ok", "ortho_ok", "resid_ok", "order_ok")
      .as[(Int, Long, String, Boolean, Boolean, Boolean, Boolean)].collect().toSeq
    assert(out.map(_._1) === Seq(0, 1))
    // qvec = +/-(600000, 800000); S = 0; trace = n * sum(q.q) = 4 * 4e12
    assert(out.forall(r => r._2 === 4L && r._3 === "16000000000000"))
    assert(out.forall(r => r._4 && r._5 && r._6 && r._7))
    // the projection itself: component 0 is +/-1e6 (the unit norm in
    // quantized scale), component 1 is ~0 (rank-1 data)
    val proj = Similarity.pcaProject(emb, k = 2).orderBy("vec_id")
      .as[(Long, Double, Double)].collect().toSeq
    assert(proj.map(_._2).forall(p => math.abs(math.abs(p) - 1e6) < 1.0))
    assert(proj.map(_._3).forall(p => math.abs(p) < 1.0))
    intercept[IllegalArgumentException](Similarity.embedPca(emb, k = 0))
  }

  test("silhouetteSimplified: points at their centroids score 1; k=1-effective rows are excluded") {
    // two tight clusters on orthogonal axes: duplicate points train
    // centroids exactly onto themselves -> a = 0, b = inter-centroid
    // distance > 0 -> s = 1 for every point
    def vec(axis: Int): Array[Float] = {
      val a = Array.fill(64)(0.0f); a(axis) = 1.0f; a
    }
    // ids interleave the clusters so the first-k seeds (smallest two
    // vec_ids) start one centroid in each cluster
    val emb = Seq(
      (1L, vec(0), 0), (2L, vec(1), 1),
      (3L, vec(0), 0), (4L, vec(1), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.silhouetteSimplified(emb, k = 2, iters = 2)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out.length === 2)
    out.foreach { case (_, n, sumMil, mean) =>
      assert(n === 2L && sumMil === 2000000L && mean === 1.0)
    }
    intercept[IllegalArgumentException](
      Similarity.silhouetteSimplified(emb, k = 1))
  }

  test("kmeansAssign: Lloyd's converges toward balance; exact copies co-assign; nulls surface") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val out = Similarity.kmeansAssign(emb, k = 8, iters = 2).collect()
    assert(out.length === emb.count().toInt) // every vector surfaces
    val cells = out.filterNot(_.isNullAt(1)).map(_.getLong(1))
    // cells are labeled by seed vec_id, and at most k survive
    assert(cells.distinct.length <= 8)
    // an exact copy of a vector MUST land in the same cell (same qvec ->
    // same integer dots -> same argmax)
    val clone = emb.filter(col("vec_id") === 20L)
      .select(lit(100000L).as("vec_id"), col("embedding"), col("label"))
    val withClone = Similarity.kmeansAssign(emb.unionByName(clone), k = 8, iters = 2)
      .filter(col("vec_id").isin(20L, 100000L))
      .select("cell").collect().map(_.getLong(0))
    assert(withClone.length === 2 && withClone.distinct.length === 1)
    // iters=0 degenerates to first-k assignment on quantized units:
    // the same cells as ivfAssign's k=8 codebook (argmax over the seeds)
    val i0 = Similarity.kmeansAssign(emb, k = 8, iters = 0)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val ivf = Similarity.ivfAssign(emb, k = 8)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val diff = i0.count { case (id, c) => ivf(id) != c }
    // quantization can flip near-exact argmax ties, nothing else
    assert(diff <= i0.size / 100, s"$diff of ${i0.size} assignments differ from ivfAssign")
    // training must not WORSEN imbalance: sum of squared cell sizes (the
    // pair-search cost driver) after 2 rounds <= the seed assignment's
    def ssq(m: Map[Long, Long]): Long = {
      val sizes = m.values.filter(_ >= 0).groupBy(identity).map(_._2.size.toLong)
      sizes.map(s => s * s).sum
    }
    val trained = Similarity.kmeansAssign(emb, k = 8, iters = 2)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(ssq(trained) <= ssq(i0),
      s"trained ssq ${ssq(trained)} > seed ssq ${ssq(i0)}")
  }

  test("pqEncode/pqTopK: codes are seed-labeled and total; ADC retrieves the query's cluster", SlowTest) {
    import spark.implicits._
    // a corpus PQ is actually good at: 10 well-separated clusters with
    // small within-cluster noise (real embedding corpora are clustered;
    // the uniform-random fixture corpus is the worst case for ANY
    // quantizer and is gate-checked for exactness, not recall)
    val rows = for (v <- 0 until 200) yield {
      val c = v % 10
      val vec = Array.tabulate(64) { j =>
        val center = ((c * 17 + j * 3) % 7 - 3).toFloat
        val noise = ((v * 31 + j * 13) % 5 - 2) * 0.05f
        center + noise
      }
      (v.toLong, vec.toSeq, c)
    }
    val emb = rows.toDF("vec_id", "embedding", "label")
    val codes = Similarity.pqEncode(emb).collect()
    // total: every (vector, subspace) surfaces with a code
    assert(codes.length === 200 * 8)
    assert(codes.forall(!_.isNullAt(2)))
    // codes are labeled by seed vec_id (the codebook convention): at most
    // k=8 distinct codes per subspace, all from the 8 smallest vec_ids
    codes.groupBy(_.getInt(1)).foreach { case (_, g) =>
      val cs = g.map(_.getLong(2)).distinct
      assert(cs.length <= 8 && cs.forall(c => c >= 0L && c < 8L))
    }
    // an exact duplicate encodes to identical codes in every subspace
    val clone = emb.filter(col("vec_id") === 33L)
      .select(lit(9999L).as("vec_id"), col("embedding"), col("label"))
    val withClone = Similarity.pqEncode(emb.unionByName(clone))
      .filter(col("vec_id").isin(33L, 9999L))
      .collect().groupBy(_.getLong(0)).view.mapValues(
        _.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq).toMap
    assert(withClone(33L) === withClone(9999L))
    // ADC retrieval: the query's top-5 by PQ codes alone must come from
    // the query's own cluster (label = 3 for vec 13)
    val top = Similarity.pqTopK(emb, queryVecId = 13L, kNbrs = 5).collect()
    assert(top.length === 5 && !top.map(_.getLong(0)).contains(13L))
    val sameCluster = top.map(_.getLong(0)).count(id => id % 10 == 3)
    assert(sameCluster >= 4, s"only $sameCluster of 5 ADC neighbors share the query's cluster")
    // ranked best-first, ties broken by vec_id
    val adcs = top.map(_.getLong(1))
    assert(adcs.zip(adcs.tail).forall { case (a, b) => a >= b })
    // IVF-PQ (coarse cells + residual codebooks + per-cell LUTs) must
    // ALSO retrieve the query's cluster — the composition's recall on
    // clustered data, with candidates restricted to the probed cells
    val ivfpq = Similarity.ivfPqTopK(emb, queryVecId = 13L, kNbrs = 5).collect()
    assert(ivfpq.length === 5 && !ivfpq.map(_.getLong(0)).contains(13L))
    val sameIvfpq = ivfpq.map(_.getLong(0)).count(id => id % 10 == 3)
    assert(sameIvfpq >= 4, s"only $sameIvfpq of 5 IVF-PQ neighbors share the query's cluster")
    // an exact duplicate of the query must score the MAXIMAL ADC (the
    // self-retrieval sanity of any ANN index). It need not rank first:
    // clustermates that quantize to the same codewords tie exactly with
    // it — PQ cannot distinguish inside a codeword by construction —
    // and ties break by vec_id
    val dup = emb.filter(col("vec_id") === 13L)
      .select(lit(8888L).as("vec_id"), col("embedding"), col("label"))
    val withDup = Similarity.ivfPqTopK(
      emb.unionByName(dup), queryVecId = 13L, kNbrs = 50).collect()
    val dupAdc = withDup.find(_.getLong(0) == 8888L)
      .getOrElse(fail("duplicate missing from IVF-PQ results")).getLong(1)
    assert(withDup.forall(_.getLong(1) <= dupAdc),
      s"some vector out-scored an exact duplicate of the query (dup adc $dupAdc)")
  }

  test("pqRerank: the exact re-rank stage recovers the recall raw ADC loses") {
    // the fixture embeddings are uniform-random — the WORST case for any
    // quantizer, where 3-bit-per-subspace ADC ranking is essentially
    // noise. The two-stage shape exists exactly for this: a 10% ADC
    // shortlist re-ranked by exact dot recovers the true neighbors.
    // Deterministic on the fixed corpus (measured: ADC-only overlaps
    // exact top-5 in 0 ids; re-rank in 4).
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val exact = Similarity.cosineTopK(emb, queryVecId = 0L, k = 5)
      .collect().map(_.getLong(0)).toSet
    val adcOnly = Similarity.pqTopK(emb, queryVecId = 0L, kNbrs = 5)
      .collect().map(_.getLong(0)).toSet
    val reranked = Similarity.pqRerank(emb, queryVecId = 0L, kNbrs = 5)
      .collect().map(_.getLong(0)).toSet
    assert((reranked intersect exact).size >= 4,
      s"re-rank recall ${(reranked intersect exact).size}/5 (exact $exact, reranked $reranked)")
    assert((reranked intersect exact).size > (adcOnly intersect exact).size,
      s"re-rank did not improve on raw ADC (adc $adcOnly)")
  }

  test("IndexCache: cached codebooks are bit-identical to fresh training; second call runs zero training jobs", SlowTest) {
    import graft.ext.IndexCache
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, dir)
    IndexCache.clear()
    def sortedRows(df: org.apache.spark.sql.DataFrame) =
      df.selectExpr("cast(s as long) as s", "cidx", "qcent").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toList))
        .sortBy(t => (t._1, t._2))
    // cache ≡ fresh, bit for bit — the contract that lets the bench
    // queries share one trainer while the DuckDB oracle retrains
    assert(sortedRows(IndexCache.pqCodebook(spark, emb, dir))
      === sortedRows(Similarity.pqCodebook(emb)))
    val (coarse, pqc) = IndexCache.ivfPqIndex(spark, emb, dir)
    val (fCoarse, fPqc) = Similarity.ivfPqIndex(emb)
    assert(sortedRows(pqc) === sortedRows(fPqc))
    def coarseRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getSeq[Long](1).toList)).sortBy(_._1)
    assert(coarseRows(coarse) === coarseRows(fCoarse))
    // a cache hit must not touch the corpus at all: the by-name frame
    // would throw if constructed
    val hit = IndexCache.pqCodebook(spark,
      throw new IllegalStateException("cache miss re-trained"), dir)
    assert(sortedRows(hit) === sortedRows(Similarity.pqCodebook(emb)))
    // and the serving-time *With paths reproduce the self-trained ones
    val topFresh = Similarity.pqTopK(emb, queryVecId = 0L, kNbrs = 5)
      .collect().map(_.getLong(0)).toList
    val topCached = Similarity.pqTopKWith(emb,
        IndexCache.pqCodebook(spark, emb, dir), queryVecId = 0L, kNbrs = 5)
      .collect().map(_.getLong(0)).toList
    assert(topCached === topFresh)
    IndexCache.clear()
  }

  test("pqKnnJoin: SDC shortlist + exact re-rank recovers cluster neighbors on codes alone") {
    import spark.implicits._
    // the clustered fixture (pqEncode's test corpus): 10 well-separated
    // clusters — neighbors found through 8-byte packed codes + exact
    // re-rank should overwhelmingly share the query's cluster
    val rows = for (v <- 0 until 200) yield {
      val c = v % 10
      val vec = Array.tabulate(64) { j =>
        val center = ((c * 17 + j * 3) % 7 - 3).toFloat
        val noise = ((v * 31 + j * 13) % 5 - 2) * 0.05f
        center + noise
      }
      (v.toLong, vec.toSeq, c)
    }
    val emb = rows.toDF("vec_id", "embedding", "label")
    val out = Similarity.pqKnnJoin(emb, kNbrs = 3, shortlist = 10, cells = 8)
      .collect()
    // contract: every emitted rank in 1..3, no self-pairs, exact_qdot is
    // the true integer dot of the pair (spot-check against brute force)
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(3) >= 1 && r.getLong(3) <= 3))
    assert(out.forall(r => r.getLong(0) != r.getLong(1)))
    val sameCluster = out.count(r => r.getLong(0) % 10 == r.getLong(1) % 10)
    assert(sameCluster >= out.length * 9 / 10,
      s"only $sameCluster/${out.length} neighbors share the query's cluster")
    // exact_qdot parity with an independently computed integer dot
    val q = emb.selectExpr("vec_id",
        "transform(embedding, x -> cast(x as double)) as dv")
      .selectExpr("vec_id",
        "aggregate(dv, 0D, (a, x) -> a + x * x) as ss", "dv")
      .selectExpr("vec_id",
        "transform(dv, x -> cast(floor(x / sqrt(ss) * 1000000.0 + 0.5) as bigint)) as qvec")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    out.take(20).foreach { r =>
      val a = q(r.getLong(0)); val b = q(r.getLong(1))
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      assert(r.getLong(2) === dot, s"exact_qdot mismatch for ${r.getLong(0)}->${r.getLong(1)}")
    }
  }

  test("pqAdcTopKJoin: per-query ADC ranking equals the independently recomputed codeword sums", SlowTest) {
    import spark.implicits._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cb = Similarity.pqCodebook(emb)
    val out = Similarity.pqAdcTopKJoin(emb, emb, cb, kNbrs = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    assert(out.forall(t => t._4 >= 1 && t._4 <= 3))
    // self-serving contract: a corpus query ranks itself first (max ADC
    // is its own codes' table entries — maximal by construction only
    // when unique; assert membership not strict rank-1 for ties)
    val byQuery = out.groupBy(_._1)
    assert(byQuery.forall { case (q, rows) => rows.map(_._2).contains(q) ||
      rows.forall(_._3 >= rows.filter(_._2 == q).map(_._3).headOption.getOrElse(Long.MinValue)) })
    // independent ADC recompute: codes via pqEncodeWith, codebook rows,
    // query subvectors — adc(query, nbr) must match exactly
    val codes = Similarity.pqEncodeWith(emb, cb).collect()
      .filter(!_.isNullAt(2))
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val cwRows = cb.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Long](2)).toMap
    val qsubs = emb.selectExpr("vec_id",
        "transform(embedding, x -> cast(x as double)) as dv")
      .selectExpr("vec_id", "aggregate(dv, 0D, (a, x) -> a + x * x) as ss", "dv")
      .where("ss > 0")
      .selectExpr("vec_id",
        "transform(dv, x -> cast(floor(x / sqrt(ss) * 1000000.0 + 0.5) as bigint)) as qvec")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    out.take(30).foreach { case (qid, nid, adc, _) =>
      val qv = qsubs(qid)
      val expected = (0 until 8).map { s =>
        val cw = cwRows((s, codes((nid, s))))
        (0 until 8).map(j => qv(s * 8 + j) * cw(j)).sum
      }.sum
      assert(adc === expected, s"adc mismatch for ($qid, $nid)")
    }
  }

  test("pqRecall: hits equal the locally recomputed exact∩ADC intersection", SlowTest) {
    import spark.implicits._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cb = Similarity.pqCodebook(emb)
    val rec = Similarity.pqRecall(emb, cb).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rec.nonEmpty)
    assert(rec.values.forall { case (ne, na, h) =>
      h <= math.min(ne, na) && ne <= 3 && na <= 3 })
    val qv = emb.selectExpr("vec_id",
        "transform(embedding, x -> cast(x as double)) as dv")
      .selectExpr("vec_id", "aggregate(dv, 0D, (a, x) -> a + x * x) as ss", "dv")
      .where("ss > 0")
      .selectExpr("vec_id",
        "transform(dv, x -> cast(floor(x / sqrt(ss) * 1000000.0 + 0.5) as bigint)) as qvec")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // the declared sample: 100 smallest md5(vec_id) among quantizable rows
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expQ = qv.keySet.toSeq
      .sortBy(v => (md5hex(v.toString), v)).take(100).toSet
    assert(rec.keySet === expQ)
    val adc = Similarity.pqAdcTopKJoin(
        emb.filter(org.apache.spark.sql.functions.col("vec_id")
          .isInCollection(expQ)), emb, cb)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    rec.foreach { case (qid, (ne, na, h)) =>
      val dots = qv.toSeq.map { case (vid, v) =>
        (vid, v.zip(qv(qid)).map { case (a, b) => a * b }.sum) }
      val exact = dots.sortBy { case (vid, d) => (-d, vid) }.take(3).map(_._1).toSet
      val served = adc.getOrElse(qid, Set.empty)
      assert(ne === exact.size.toLong)
      assert(na === served.size.toLong)
      assert(h === (exact intersect served).size.toLong, s"query $qid")
    }
  }

  test("kmeansAssign / capPerSource are bit-invariant under repartitioning and row order") {
    // the round-7 exactness claim: integer sums are associative, so the
    // trained assignment must not depend on HOW the data is distributed.
    // Same for the per-source cap (TopKAggregator merge order).
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    def kmSorted(df: org.apache.spark.sql.DataFrame) =
      Similarity.kmeansAssign(df, k = 8, iters = 2).collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1),
          if (r.isNullAt(2)) Long.MinValue else r.getLong(2)))
        .sortBy(_._1).toSeq
    val base = kmSorted(emb)
    val scrambled = kmSorted(
      emb.repartition(7, col("label")).sortWithinPartitions(col("vec_id").desc))
    assert(base === scrambled)
    def capSorted(df: org.apache.spark.sql.DataFrame) =
      graft.ext.Sampling.capPerSource(df, cap = 5).collect()
        .map(r => (r.getString(0), r.getLong(1))).sortBy(identity).toSeq
    val capBase = capSorted(docs)
    val capScrambled = capSorted(
      docs.repartition(11).sortWithinPartitions(col("doc_id").desc))
    assert(capBase === capScrambled)
  }

  test("trainedCodebook feeds withSemanticKey/ivf machinery; degenerate corpora stay sane", SlowTest) {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cb = Similarity.trainedCodebook(emb, k = 8, iters = 2)
    val keyed = Similarity.withSemanticKey(emb, cb, sigBits = 16)
    val rows = keyed.select("vec_id", "cell", "qsig").collect()
    assert(rows.length === emb.count().toInt)
    // trained centroids are unit-length, so cells are well-defined for
    // every non-degenerate vector
    assert(rows.count(_.isNullAt(1)) === 0)
    // empty corpus: codebook row exists with an empty cents array, and
    // assignment against it yields NULL cells rather than dropped rows
    val empty = emb.filter(col("vec_id") < 0)
    val cbEmpty = Similarity.trainedCodebook(empty, k = 8, iters = 2)
    assert(cbEmpty.count() === 1L)
    val keyedEmpty = Similarity.withSemanticKey(emb.limit(5), cbEmpty)
    assert(keyedEmpty.count() === 5L)
    assert(keyedEmpty.filter(col("cell").isNull).count() === 5L)
    // kmeansAssign on an empty corpus: no rows, no crash
    assert(Similarity.kmeansAssign(empty, k = 8, iters = 2).count() === 0L)
    // the full trained pipeline: semantic dedup against trained centroids
    // still flags an exact clone (cosine 1.0 shares any cell geometry)
    val clone = emb.filter(col("vec_id") === 20L)
      .select(lit(100000L).as("vec_id"), col("embedding"), col("label"))
    val flagged = Similarity
      .semanticDedupWith(emb.unionByName(clone), Similarity.trainedCodebook(emb, 8, 2))
      .filter(col("vec_id") === 100000L).select("is_dup")
      .collect().map(_.getInt(0)).toSeq
    assert(flagged === Seq(1))
    // trained bulk kNN: the clone's nearest neighbor is its original
    // (cosine 1.0, same cell under ANY codebook)
    val top = Similarity
      .knnJoinWith(emb.unionByName(clone), Similarity.trainedCodebook(emb, 8, 2))
      .filter(col("vec_id") === 100000L && col("rank") === 1L)
      .select("nbr_id").collect().map(_.getLong(0)).toSeq
    assert(top === Seq(20L))
  }

  test("bloomScreenDedup: exact verdicts through the probabilistic screen; batch-internal dups unflagged; empty corpus safe") {
    val docs = Seq(
      (0L, "alpha beta"), (1L, "gamma delta"), (2L, "epsilon zeta"),
      (3L, "unique three"),
      (4L, "gamma delta"), // fresh (4 % 5 == 4), dup of existing 1
      (9L, "nowhere else"), // fresh, no existing match
      (14L, "twin text"), (19L, "twin text") // fresh pair: batch-internal dup only
    ).toDF("doc_id", "text")
    val out = graft.ext.Dedup.bloomScreenDedup(docs,
        expectedItems = 64L, numBits = 512L)
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) -1L else r.getLong(1)), r.getInt(2))).toMap
    assert(out === Map(
      4L -> ((1L, 1)), // confirmed against the corpus
      9L -> ((-1L, 0)),
      14L -> ((-1L, 0)), 19L -> ((-1L, 0)))) // internal dups are not "known"
    // the screen is real: the analyzed plan carries the bloom membership
    // expression, not just the confirm join
    val plan = graft.ext.Dedup.bloomScreenDedup(docs)
      .queryExecution.analyzed.toString
    assert(plan.contains("might_contain"),
      s"expected a bloom screen in the plan:\n$plan")
    // empty existing corpus: the bloom aggregate is NULL, the screen drops
    // everything, and every fresh row still surfaces as not-known
    val allNew = Seq((4L, "a"), (9L, "a")).toDF("doc_id", "text")
    val empty = graft.ext.Dedup.bloomScreenDedup(allNew)
      .collect().map(r => (r.getLong(0), r.getInt(2))).toSeq.sorted
    assert(empty === Seq((4L, 0), (9L, 0)))
  }

  test("bloomScreenDedupSharded: identical verdicts to the unsharded screen at any sharding and any fpp") {
    val docs = Seq(
      (0L, "alpha beta"), (1L, "gamma delta"), (2L, "epsilon zeta"),
      (3L, "unique three"),
      (4L, "gamma delta"), // fresh, dup of existing 1
      (9L, "nowhere else"),
      (14L, "twin text"), (19L, "twin text") // batch-internal dup only
    ).toDF("doc_id", "text")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) -1L else r.getLong(1)), r.getInt(2))).toMap
    val reference = asMap(graft.ext.Dedup.bloomScreenDedup(docs,
      expectedItems = 64L, numBits = 512L))
    // shards=1 (degenerate), 4, and a saturated worst case (every probe
    // survives the screen; the confirm join must still be exact)
    for ((k, bits) <- Seq((1, 512L), (4, 512L), (4, 256L), (8, 64L))) {
      val out = asMap(graft.ext.Dedup.bloomScreenDedupSharded(docs,
        shards = k, expectedItems = 64L, numBits = bits))
      assert(out === reference, s"shards=$k numBits=$bits diverged")
    }
    // NULL text: hash is NULL, no shard branch fires, row surfaces
    // unflagged — same as the unsharded NULL path
    val withNull = Seq((1L, "gamma"), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val nullOut = asMap(graft.ext.Dedup.bloomScreenDedupSharded(withNull, shards = 4))
    assert(nullOut === Map(4L -> ((-1L, 0))))
    // empty existing corpus stays safe per shard
    val allNew = Seq((4L, "a"), (9L, "a")).toDF("doc_id", "text")
    val empty = graft.ext.Dedup.bloomScreenDedupSharded(allNew, shards = 4)
      .collect().map(r => (r.getLong(0), r.getInt(2))).toSeq.sorted
    assert(empty === Seq((4L, 0), (9L, 0)))
    // the sharded screen is real: per-shard membership probes a struct
    // FIELD of one scalar subquery (one corpus aggregate, k blobs)
    val plan = graft.ext.Dedup.bloomScreenDedupSharded(docs, shards = 4)
      .queryExecution.analyzed.toString
    assert(plan.contains("might_contain"), plan)
    assert("scalar-subquery".r.findAllMatchIn(plan).size >= 1, plan)
  }

  test("piiScrub2: Luhn separates valid from broken cards; dashed forms redact; SSN infix of a card does not double-fire") {
    val docs = Seq(
      // valid Visa test number, plain
      (1L, "pay 4111111111111111 now"),
      // same number with check digit broken (+5 mod 10) -> candidate, not valid
      (2L, "pay 4111111111111116 now"),
      // valid, dash-separated -> candidate + valid + redacted as one token
      (3L, "pay 4111-1111-1111-1111 now"),
      // 17-digit run: not a 4x4 card, but IS a bare PAN (13-19); this one
      // fails Luhn -> pan candidate, redacted, not valid
      (4L, "id 41111111111111119 is maybe a card"),
      // SSN only
      (5L, "ssn 123-45-6789 here"),
      // SSN-shaped infix of a dashed card must not fire after redaction
      (6L, "both 4111-1111-1111-1111 and 987-65-4321")
    ).toDF("doc_id", "text")
    val out = graft.ext.TextOps.piiScrub2(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(5), r.getString(6)))).toMap
    assert(out(1L) === ((1, 1, 0, "pay <CARD> now")))
    assert(out(2L) === ((1, 0, 0, "pay <CARD> now"))) // conservative redaction
    assert(out(3L) === ((1, 1, 0, "pay <CARD> now")))
    assert(out(4L) === ((1, 0, 0, "id <CARD> is maybe a card")))
    assert(out(5L) === ((0, 0, 1, "ssn <SSN> here")))
    assert(out(6L) === ((1, 1, 1, "both <CARD> and <SSN>")))
  }

  test("piiScrub2: Amex 4-6-5 and bare 13-19 PAN families; staged precedence assigns each candidate once") {
    val docs = Seq(
      // valid Amex test number, plain 15-digit run -> AMEX (not pan: precedence)
      (1L, "pay 371449635398431 now"),
      // valid Amex, 4-6-5 dashed grouping
      (2L, "pay 3782-822463-10005 now"),
      // Amex with broken check digit (+5 mod 10) -> candidate, not valid
      (3L, "pay 378282246310000 now"),
      // 13-digit valid Visa test PAN
      (4L, "pay 4222222222222 now"),
      // 19-digit valid PAN / broken twin
      (5L, "pay 4111111111111111110 now"),
      (6L, "pay 4111111111111111115 now"),
      // 20-digit run: no in-run word boundary to restart from -> NO match
      (7L, "id 12345678901234567890 stays"),
      // 12-digit run: below the PAN floor -> no match
      (8L, "id 123456789012 stays"),
      // plain 16-digit run: counted ONCE as a 4x4 card, never as Amex/PAN
      // (the Amex-infix-of-16 precedence case: its first 15 digits form a
      // 4-6-5 shape but the trailing \\b and staging both reject it)
      (9L, "pay 4111111111111111 now"),
      // a card AND an amex AND a pan in one doc: families count independently
      (10L, "c 4111-1111-1111-1111 a 371449635398431 p 4222222222222")
    ).toDF("doc_id", "text")
    val out = graft.ext.TextOps.piiScrub2(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getString(6)))).toMap
    assert(out(1L) === ((1, 1, 1, 0, "pay <CARD> now")))
    assert(out(2L) === ((1, 1, 1, 0, "pay <CARD> now")))
    assert(out(3L) === ((1, 0, 1, 0, "pay <CARD> now")))
    assert(out(4L) === ((1, 1, 0, 1, "pay <CARD> now")))
    assert(out(5L) === ((1, 1, 0, 1, "pay <CARD> now")))
    assert(out(6L) === ((1, 0, 0, 1, "pay <CARD> now")))
    assert(out(7L) === ((0, 0, 0, 0, "id 12345678901234567890 stays")))
    assert(out(8L) === ((0, 0, 0, 0, "id 123456789012 stays")))
    assert(out(9L) === ((1, 1, 0, 0, "pay <CARD> now")))
    assert(out(10L) === ((3, 3, 1, 1, "c <CARD> a <CARD> p <CARD>")))
  }

  test("incrementalFuzzyDedup: band candidates below the component bar are rejected") {
    import spark.implicits._
    // sliding half-overlapping token windows give neighbor Jaccard ≈ 1/3
    // (enough for single-component band hits at k=2) plus replica-15
    // exact dups (the accept branch); with k=2 / minMatch=2 a candidate
    // needs BOTH components, so one-component band hits must be rejected
    val words = (0 until 70).map(i => s"w$i")
    val docs = (0 until 30).map { i =>
      val start = (i % 15) * 4
      (i.toLong, words.slice(start, start + 12).mkString(" "))
    }.toDF("doc_id", "text")
    val sig = graft.ext.Dedup.minhashSignatures(docs, 2)
      .select("doc_id", "mh0", "mh1").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def isNew(id: Long) = id % 5 == 4
    def minMatchOf(id: Long, bar: Int): Option[Long] = {
      val (a0, a1) = sig(id)
      val hits = sig.keys.filter(e => !isNew(e) && {
        val (b0, b1) = sig(e)
        val n = (if (a0 == b0) 1 else 0) + (if (a1 == b1) 1 else 0)
        n >= 1 && n >= bar // candidate (any band) AND verified
      })
      if (hits.isEmpty) None else Some(hits.min)
    }
    val out = graft.ext.Dedup
      .incrementalFuzzyDedup(docs, k = 2, minMatch = 2)
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    val newIds = sig.keys.filter(isNew).toSeq.sorted
    assert(out.keySet === newIds.toSet)
    newIds.foreach { id =>
      assert(out(id) === minMatchOf(id, 2), s"doc $id verdict mismatch")
    }
    // test validity: the reject branch must actually fire — some new doc
    // is a one-component band candidate that verification turns away
    val rejected = newIds.filter(id =>
      minMatchOf(id, 1).isDefined && minMatchOf(id, 2).isEmpty)
    assert(rejected.nonEmpty,
      "corpus produced no band-candidate below the component bar")
    // and the accept branch too (the replica exact dups)
    assert(newIds.exists(id => out(id).isDefined))
  }

  test("ngramRepetition: Gopher dup/top n-gram char fractions, hand-computed") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b a b a b"), // 11 chars; bigrams: "a b"x3, "b a"x2
      (1L, "x y  z"),      // empty token filtered -> toks (x,y,z), 6 chars
      (2L, "solo"),        // 1 token: no n-gram row for any n
      (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = graft.ext.TextOps.ngramRepetition(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getDouble(2), r.getDouble(3))))
      .toMap
    // doc 0, n=2: top = "a b" coverage 3x3=9 of 11; dup = (9 + 2x3)=15 of 11
    // (occurrence-weighted, overlap not collapsed -> can exceed 1, the
    // documented datatrove formulation)
    assert(out((0L, 2)) === ((9.0 / 11, 15.0 / 11)))
    // doc 0, n=3: "a b a"x2 (10 chars), "b a b"x2 (10) -> top 10/11, dup 20/11
    assert(out((0L, 3)) === ((10.0 / 11, 20.0 / 11)))
    // doc 0, n=4: "a b a b"x2 (14) vs "b a b a"x1 -> top 14/11, dup 14/11
    assert(out((0L, 4)) === ((14.0 / 11, 14.0 / 11)))
    // doc 1: all grams distinct -> dup 0; n=2 top "x y" = 3/6
    assert(out((1L, 2)) === ((0.5, 0.0)))
    assert(out((1L, 3)) === ((5.0 / 6, 0.0)))
    // short/null docs emit no rows; doc 1 has no n=4 row (3 tokens)
    assert(!out.contains((1L, 4)) && !out.keys.exists(_._1 >= 2L))
  }

  test("compressionRatio: repetitive text compresses away; determinism under repartitioning") {
    import spark.implicits._
    val repetitive = ("spam " * 200).trim // one token, 200 times
    // seeded-random alphanumerics: near-incompressible, deterministic
    val rnd = new scala.util.Random(42)
    val natural = (1 to 120).map(_ =>
      rnd.alphanumeric.take(6).mkString).mkString(" ")
    val docs = Seq(
      (1L, repetitive),
      (2L, natural),
      (3L, ""),   // empty: sizes 0-ish, NULL ratio
      (4L, null.asInstanceOf[String])) // unscorable: NULL everything
      .toDF("doc_id", "text")
    val out = graft.ext.TextOps.compressionRatio(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    val rRep = out(1L).getDouble(3)
    val rNat = out(2L).getDouble(3)
    // the signal orders as the filter needs: boilerplate far below
    // natural text, and only boilerplate trips the low-entropy flag
    assert(rRep < 0.1, s"repetitive ratio $rRep")
    assert(rNat > 0.4, s"natural ratio $rNat")
    assert(out(1L).getBoolean(4) === true && out(2L).getBoolean(4) === false)
    // empty ≠ null: empty text has n_bytes 0 with a real deflate size,
    // null text propagates NULL through every column
    assert(out(3L).getLong(1) === 0L && out(3L).getLong(2) > 0L
      && out(3L).isNullAt(3) && out(3L).isNullAt(4))
    assert((1 to 4).forall(out(4L).isNullAt))
    // bit-stable under partitioning (per-partition Deflater reuse must
    // not leak state between rows)
    val again = graft.ext.TextOps.compressionRatio(docs.repartition(5)).collect()
      .map(r => (r.getLong(0), r.get(1), r.get(2))).sortBy(_._1).toSeq
    val first = out.values.map(r => (r.getLong(0), r.get(1), r.get(2)))
      .toSeq.sortBy(_._1)
    assert(again === first)
  }

  test("docRepetition: top-token dominance exact; empty docs surface with NULLs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a a b"),  // max_tf 4/5 = 0.8 -> dominated
      (2L, "w x y z"),    // 1/4 = 0.25 -> dominated (short docs dominate trivially)
      (3L, "solo"),       // 1 token: frac 1.0
      (4L, ""),           // empty: all stats NULL (incl. the flag)
      (5L, "t  t"),       // multi-space: empty token filtered, toks = (t,t)
      (6L, (1 to 40).map(i => s"w$i").mkString(" ")) // 1/40 = 0.025 -> clean
    ).toDF("doc_id", "text")
    val out = graft.ext.TextOps.docRepetition(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) === 5L && out(1L).getLong(2) === 2L
      && out(1L).getLong(3) === 4L && out(1L).getDouble(4) === 0.8
      && out(1L).getInt(5) === 1)
    assert(out(2L).getDouble(4) === 0.25 && out(2L).getInt(5) === 1)
    assert(out(3L).getLong(1) === 1L && out(3L).getDouble(4) === 1.0)
    assert(out(4L).isNullAt(1) && out(4L).isNullAt(4) && out(4L).isNullAt(5))
    assert(out(5L).getLong(1) === 2L && out(5L).getLong(3) === 2L
      && out(5L).getDouble(4) === 1.0)
    assert(out(6L).getDouble(4) === 0.025 && out(6L).getInt(5) === 0)
    // scale-shape pin: the aggregate form — no window, and no per-row
    // O(len^2) distinct-count lambda in the plan
    val p = graft.ext.TextOps.docRepetition(docs)
      .queryExecution.optimizedPlan.toString
    assert(!p.contains("Window"), p)
  }

  test("lmScore: predictable sequences charge 0 bits, rare continuations of a common context charge high") {
    import spark.implicits._
    // 20 background docs of a fully predictable alternation: every (a,b)
    // and (b,a) bigram's count equals its context's count -> charge 0.
    // One probe doc reuses the COMMON context 'a' with 10 never-seen
    // continuations z1..z10 -> each (a, zi) charges mag(c_ctx(a)) - 0.
    val bg = (1L to 20L).map(id => (id, Seq.fill(20)("a b").mkString(" "), "en"))
    val probe = (99L, (1 to 10).map(i => s"a z$i").mkString(" "), "en")
    val edge = Seq((100L, "", "en"), (101L, "solo", "en"))
    val docs = (bg :+ probe).++(edge).toDF("doc_id", "text", "lang")
    val out = graft.ext.TextOps.lmScore(docs, thresholdTenths = 40L)
      .collect().map(r => r.getLong(0) -> r).toMap
    // background: 39 bigrams/doc, all charges 0 -> low perplexity
    assert(out(1L).getLong(2) === 39L && out(1L).getLong(3) === 0L
      && out(1L).getInt(4) === 0)
    // probe: c_ctx(a) = 20*20 + 10 = 410 -> mag 8; the ten (a, zi)
    // bigrams are singletons (mag 0) -> charge 8 each; the nine (zi, a)
    // bigrams have singleton contexts -> charge 0. nll = 80 over 19
    // bigrams = 4.2 bits/bigram > 4.0 -> flagged
    assert(out(99L).getLong(2) === 19L && out(99L).getLong(3) === 80L
      && out(99L).getInt(4) === 1)
    // sub-2-token docs: NULL stats and NULL flag via the left join
    Seq(100L, 101L).foreach { id =>
      assert(out(id).isNullAt(2) && out(id).isNullAt(3) && out(id).isNullAt(4))
    }
  }

  test("cmsCounts: exact on the probe slice, one-sided estimates, merge-invariant under partitioning") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a b b c"),
      (2L, "a b c d e f g"),
      (3L, "a a h")
    ).toDF("doc_id", "text")
    // probeMod=1: every vocabulary token is probed
    val out = TextOps.cmsCounts(docs, probeMod = 1).collect()
      .map(r => r.getString(0) -> r).toMap
    val exact = Map("a" -> 6L, "b" -> 3L, "c" -> 2L, "d" -> 1L,
      "e" -> 1L, "f" -> 1L, "g" -> 1L, "h" -> 1L)
    assert(out.keySet === exact.keySet)
    exact.foreach { case (t, c) =>
      assert(out(t).getLong(1) === c, s"exact_c($t)")
      // CMS one-sided guarantee: estimate never undercounts
      assert(out(t).getLong(2) >= c && out(t).getInt(4) === 1, s"est_c($t)")
      assert(out(t).getLong(3) === out(t).getLong(2) - c, s"err($t)")
    }
    // cell counts are plain sums -> the sketch (and hence every estimate)
    // is invariant under any partitioning of the corpus
    val again = TextOps.cmsCounts(docs.repartition(7), probeMod = 1).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(again === out.values.map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSeq.sortBy(_._1))
  }

  test("publishPqIndex/latestPqIndex: parquet round-trip serves identically; torn versions invisible", SlowTest) {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pqpub").toString
    val corpus = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cb = graft.ext.Similarity.pqCodebook(corpus)
    val idx = graft.ext.Similarity.pqServingIndex(corpus, cb)
    assert(graft.ext.Similarity.publishPqIndex(idx, cb, dir) === 1)
    val (idx1, cb1) = graft.ext.Similarity.latestPqIndex(spark, dir)
    val queries = corpus.limit(5)
    def serve(i: graft.ext.Similarity.PqIndex, c: org.apache.spark.sql.DataFrame) =
      graft.ext.Similarity.pqAdcTopKJoinOn(queries, i, c, kNbrs = 3)
        .select("query_id", "nbr_id", "rank")
        .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(serve(idx1, cb1) === serve(idx, cb))
    // a torn publish (dirs without the marker) must stay invisible and
    // must not block the next publish's version counter
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/v=2/store"))
    assert(graft.ext.Similarity.pqIndexVersions(spark, dir) === Seq(1))
    assert(graft.ext.Similarity.latestPqIndex(spark, dir)._1 !== null)
    assert(graft.ext.Similarity.publishPqIndex(idx, cb, dir) === 3)
    assert(graft.ext.Similarity.pqIndexVersions(spark, dir) === Seq(1, 3))
  }

  test("sourceReport: per-source counters; a globally-common token is a within-source hapax") {
    import spark.implicits._
    val docs = Seq(
      (1L, "shared alpha alpha", "a"),
      (2L, "shared beta", "a"),
      (3L, "shared gamma gamma gamma", "b"),
      (4L, "  ", "b") // whitespace-only doc: zero tokens, still counted
    ).toDF("doc_id", "text", "source")
    val out = graft.ext.TextOps.sourceReport(docs)
      .as[(String, Long, Long, Long, Long, Long, Double, Double)]
      .collect().sortBy(_._1).toSeq
    // source a: 5 tokens {shared:2, alpha:2, beta:1} -> 3 types, 1 hapax
    // source b: 4 tokens {shared:1, gamma:3} -> 2 types; 'shared' is
    //   corpus-common (3 occurrences) but a HAPAX within b
    assert(out(0) === (("a", 2L, 5L, 3L, 1L, 2L, 3.0 / 5.0, 1.0 / 3.0)))
    assert(out(1) === (("b", 2L, 4L, 2L, 1L, 3L, 2.0 / 4.0, 1.0 / 2.0)))
    // the per-source cards tile the corpus card
    val global = graft.ext.TextOps.corpusStats(docs).collect()(0)
    assert(out.map(_._3).sum === global.getLong(1))
    assert(out.map(_._2).sum === global.getLong(0))
  }

  test("contrastiveTriplets: anchors need both sides; twins pair as positives with the close non-dup negative") {
    import spark.implicits._
    def v(parts: (Int, Float)*): Array[Float] = {
      val a = Array.fill(64)(0f); parts.foreach { case (i, x) => a(i) = x }; a
    }
    val embs = Seq(
      (1L, v(0 -> 1f)), // twin of 2
      (2L, v(0 -> 1f)),
      (3L, v(0 -> 1f, 1 -> 0.4f)), // close non-dup (~0.93 to the twins)
      (4L, v(1 -> 1f)) // distant; has no positive -> emits nothing
    ).toDF("vec_id", "embedding")
    val out = graft.ext.Similarity.contrastiveTriplets(embs, k = 1)
      .as[(Long, Long, Double, Long, Double)].collect().sortBy(_._1).toSeq
    // only the twins have a positive; their negative is the CLOSE
    // non-dup 3, not the distant 4 (hard negative = best sub-bar sim)
    assert(out.map(_._1) === Seq(1L, 2L))
    val byAnchor = out.map(t => t._1 -> t).toMap
    assert(byAnchor(1L)._2 === 2L && byAnchor(1L)._4 === 3L)
    assert(byAnchor(2L)._2 === 1L && byAnchor(2L)._4 === 3L)
    assert(byAnchor(1L)._3 === 1.0 && byAnchor(1L)._5 < 0.95)
  }

  test("fimSplit: parts reconstruct the document; PSM assembly; short docs never transform") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "x"), // 1 char: no interior cut exists
      (3L, ""), // empty
      (4L, "abcdefghij"),
      (5L, "some longer document body with enough characters to cut")
    ).toDF("doc_id", "text")
    val raw = docs.as[(Long, String)].collect().toMap
    val out = graft.ext.TextOps.fimSplit(docs, fimPct = 100)
      .as[(Long, Int, String, String, String, String)].collect().toSeq
    out.foreach { case (id, fim, pre, mid, suf, asm) =>
      if (raw(id).length >= 2) {
        assert(fim === 1, s"doc $id should transform at fimPct=100")
        // the three parts partition the original exactly
        assert(pre + mid + suf === raw(id), s"doc $id reconstruction")
        assert(suf.nonEmpty, s"doc $id: suffix is never empty by construction")
        assert(asm === s"<PRE>$pre<SUF>$suf<MID>$mid")
      } else {
        assert(fim === 0 && pre === raw(id) && mid === "" && suf === "")
        assert(asm === raw(id))
      }
    }
    // fimPct=0: pure pass-through
    val none = graft.ext.TextOps.fimSplit(docs, fimPct = 0)
      .as[(Long, Int, String, String, String, String)].collect().toSeq
    none.foreach { case (id, fim, pre, _, _, asm) =>
      assert(fim === 0 && pre === raw(id) && asm === raw(id))
    }
  }

  test("hardNegatives: near-duplicates never surface as negatives; close non-dups rank first") {
    import spark.implicits._
    // 1 and 2 are exact twins (cosine 1.0); 3 is close to both (~0.95-);
    // 4 is distant. All in one cell (k=1 -> single centroid).
    def v(parts: (Int, Float)*): Array[Float] = {
      val a = Array.fill(64)(0f); parts.foreach { case (i, x) => a(i) = x }; a
    }
    val embs = Seq(
      (1L, v(0 -> 1f)),
      (2L, v(0 -> 1f)),
      (3L, v(0 -> 1f, 1 -> 0.4f)),
      (4L, v(1 -> 1f))
    ).toDF("vec_id", "embedding")
    val out = graft.ext.Similarity.hardNegatives(embs, kNbrs = 2, k = 1)
      .select("vec_id", "nbr_id", "rank")
      .as[(Long, Long, Long)].collect().toSeq
    val by = out.groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2)).toMap
    // the twins exclude each other; the close non-dup is the TOP negative
    assert(by(1L) === Seq(3L, 4L))
    assert(by(2L) === Seq(3L, 4L))
    assert(!by(1L).contains(2L) && !by(2L).contains(1L))
    // 3's nearest negatives are the twins (cos ≈ 0.928 < 0.95), then 4
    assert(by(3L) === Seq(1L, 2L))
  }

  test("scriptMix: per-class counts partition the text; dominant arg-max ties break by fixed order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hello 42"), // latin + digits
      (2L, "\u043F\u0440\u0438\u0432\u0435\u0442 ok"), // cyrillic-dominant
      (3L, "\u4E2D\u6587\u3042"), // cjk incl. hiragana
      (4L, "\u0627\u0628"), // arabic
      (5L, "\u03B1\u03B2\u03B3\u03B4"), // greek
      (6L, "") // empty: all-zero counts -> latin by fixed tie order
    ).toDF("doc_id", "text")
    val out = graft.ext.TextOps.scriptMix(docs)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, String)]
      .collect().sortBy(_._1).toSeq
    assert(out === Seq(
      (1L, 5L, 0L, 0L, 0L, 0L, 2L, 1L, "latin"),
      (2L, 2L, 6L, 0L, 0L, 0L, 0L, 1L, "cyrillic"),
      (3L, 0L, 0L, 3L, 0L, 0L, 0L, 0L, "cjk"),
      (4L, 0L, 0L, 0L, 2L, 0L, 0L, 0L, "arabic"),
      (5L, 0L, 0L, 0L, 0L, 4L, 0L, 0L, "greek"),
      (6L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, "latin")))
  }

  test("embeddingDrift: proportion shifts flag, stable cells don't, vanished cells are NULL-mag drifted") {
    import spark.implicits._
    // three axis-clusters; members wiggle in dims 20..27 so they stay
    // distinct but assign to their axis centroid
    def v(axis: Int, wiggle: Int): Array[Float] = {
      val a = Array.fill(64)(0f)
      a(axis) = 1f
      a(20 + (wiggle % 8)) = 0.05f * ((wiggle % 3) + 1)
      a
    }
    val ref = (Seq((0L, v(0, 0)), (1L, v(1, 0)), (2L, v(2, 0))) ++
      (3L to 10L).map(i => (i, v(0, i.toInt))) ++
      (11L to 14L).map(i => (i, v(1, i.toInt)))).toDF("vec_id", "embedding")
    val cur = ((100L to 116L).map(i => (i, v(0, i.toInt))) :+ (200L, v(1, 5)))
      .toDF("vec_id", "embedding")
    val out = graft.ext.Similarity.embeddingDrift(ref, cur, cells = 3)
      .orderBy("cell").as[(Long, Long, Long, Option[Long], Int)].collect().toSeq
    // t_ref=15 (mag 3), t_cur=18 (mag 4) -> corpus-growth term = 1
    assert(out === Seq(
      (0L, 9L, 17L, Some(0L), 0), // stable share: (4-3)-1 = 0
      (1L, 5L, 1L, Some(-3L), 1), // collapsed share: (0-2)-1 = -3
      (2L, 1L, 0L, None, 1))) // vanished cell: undefined mag, drifted
  }

  test("leakageSafeSplit: near-dup clusters share one split; singletons match datasetSplit") {
    import spark.implicits._
    // docs 1..3 are exact duplicates (every minhash component equal →
    // band candidates → one component); 10 and 20 are unrelated
    // singletons with enough tokens to shingle
    val dup = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, dup), (2L, dup), (3L, dup),
      (10L, "one two three four five six seven eight"),
      (20L, "red green blue cyan magenta yellow black white")
    ).toDF("doc_id", "text")
    val out = graft.ext.Sampling.leakageSafeSplit(docs)
      .as[(Long, Long, String)].collect().toSeq.sortBy(_._1)
    val byId = out.map(t => t._1 -> t).toMap
    // the cluster: one rep (the min id), one split for all members
    assert(Seq(1L, 2L, 3L).map(byId(_)._2).distinct === Seq(1L))
    assert(Seq(1L, 2L, 3L).map(byId(_)._3).distinct.size === 1)
    // singletons: rep = self, split = the per-doc datasetSplit bucket
    val solo = graft.ext.Sampling.datasetSplit(docs.where($"doc_id" >= 10L))
      .as[(Long, String)].collect().toMap
    Seq(10L, 20L).foreach { id =>
      assert(byId(id)._2 === id)
      assert(byId(id)._3 === solo(id))
    }
  }

  test("mixtureSample: feasible budget, exact integer rates, independently recomputed selection") {
    import spark.implicits._
    val docs = Seq(
      (1L, "t1 t2 t3 t4", "a"), (2L, "t1 t2 t3 t4", "a"),
      (3L, "t1 t2", "b"), (4L, "t1 t2", "b"), (5L, "t1 t2", "b")
    ).toDF("doc_id", "text", "source")
    // weights a=3, b=1 (Σw=4); T_a=8, T_b=6
    // B = min(8*4//3, 6*4//1) = min(10, 24) = 10
    // ask_a = 3*10//4 = 7 -> rate 875000; ask_b = 10//4 = 2 -> rate 333333
    val out = graft.ext.Sampling.mixtureSample(docs,
        weightExpr = "case when source = 'a' then 3 else 1 end")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getLong(1) === 3L && out("a").getLong(2) === 8L
      && out("a").getLong(3) === 7L && out("a").getLong(4) === 875000L)
    assert(out("b").getLong(1) === 1L && out("b").getLong(2) === 6L
      && out("b").getLong(3) === 2L && out("b").getLong(4) === 333333L)
    // independent recomputation of the hash selection (JDK md5, not Spark)
    def h(docId: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"mix:$docId".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 1000000L
    }
    val toks = Map(1L -> 4L, 2L -> 4L, 3L -> 2L, 4L -> 2L, 5L -> 2L)
    val src = Map(1L -> "a", 2L -> "a", 3L -> "b", 4L -> "b", 5L -> "b")
    val rate = Map("a" -> 875000L, "b" -> 333333L)
    Seq("a", "b").foreach { s =>
      val kept = toks.keys.filter(id => src(id) == s && h(id) < rate(s)).toSeq
      assert(out(s).getLong(6) === kept.size.toLong, s"kept_docs($s)")
      assert(out(s).getLong(7) === kept.map(toks).sum, s"kept_toks($s)")
    }
  }

  test("bpe: anchored-replace chain semantics pinned; hand-computed merge table and segmentation") {
    import spark.implicits._
    // the portable-merge contract: leftmost-nonoverlapping scan that
    // continues AFTER each replacement — an engine upgrade that changes
    // this must fail here, not silently diverge from the DuckDB oracle
    val chain = spark.sql("SELECT replace(' a a a a a ', ' a a ', ' aa ')")
      .as[String].head()
    assert(chain === " aa a aa ") // DuckDB computes the same (verified)
    val docs = Seq(
      (1L, "abc abd abc X9"), // X9 is not ^[a-z]+$ -> excluded from training
      (2L, "abc abd")
    ).toDF("doc_id", "text")
    // freq: abc=3, abd=2. Round 1: (a,b)=5 beats (b,c)=3,(b,d)=2.
    // Round 2: (ab,c)=3 beats (ab,d)=2. Round 3: (ab,d)=2.
    val merges = graft.ext.Bpe.bpeMerges(docs).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(merges === Seq((1, "a", "b", 5L), (2, "ab", "c", 3L), (3, "ab", "d", 2L)))
    val seg = graft.ext.Bpe.bpeSegment(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(2), r.getInt(3))).toMap
    assert(seg === Map("abc" -> ((3L, "abc", 1)), "abd" -> ((2L, "abd", 1))))
    // encode under the trained merges: after 1 round (a,b)->ab every
    // word is 2 symbols; after 3 rounds every word is 1 symbol; the
    // non-trainable token X9 never counts
    val enc1 = graft.ext.Bpe.bpeEncodeDocs(docs, iters = 1).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(enc1 === Map(1L -> ((3L, 6L)), 2L -> ((2L, 4L))))
    val enc3 = graft.ext.Bpe.bpeEncodeDocs(docs, iters = 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(enc3 === Map(1L -> ((3L, 3L)), 2L -> ((2L, 2L))))
    // deterministic tie-break: equal counts resolve to the
    // lexicographically smallest (left, right) pair
    val tied = Seq((1L, "xy uv"), (2L, "xy uv")).toDF("doc_id", "text")
    val first = graft.ext.Bpe.bpeMerges(tied, iters = 1).collect().head
    assert(first.getString(1) === "u" && first.getString(2) === "v"
      && first.getLong(3) === 2L)
  }

  test("VecQuantizeUnit equals the normalized()+transform HOF chain on real embeddings") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val hof = emb
      .withColumn("_norm", expr(
        "sqrt(aggregate(embedding, 0D, (acc, x) -> acc + cast(x as double) * cast(x as double)))"))
      .withColumn("unit",
        when(col("_norm") > 0d, expr("transform(embedding, x -> cast(x as double) / _norm)")))
      .withColumn("hof_qvec",
        expr("transform(unit, x -> cast(floor(x * 1000000.0 + 0.5) as bigint))"))
      .select(col("vec_id"), col("hof_qvec"))
    val fused = emb.select(col("vec_id"),
      graft.functions.LongVecFunctions.vec_quantize_unit(col("embedding")).as("qvec"))
    val bad = fused.join(hof, Seq("vec_id"))
      .filter(not(col("qvec") <=> col("hof_qvec"))).count()
    assert(bad === 0L) // bit-identical per element
    // zero vector and NULL embedding -> NULL qvec (the when-guard's else)
    val edge = Seq(
      (1L, Some(Seq(0f, 0f, 0f))),
      (2L, None),
      (3L, Some(Seq(3f, 4f, 0f)))).toDF("vec_id", "embedding")
    val got = edge.select(col("vec_id"),
      graft.functions.LongVecFunctions.vec_quantize_unit(col("embedding")).as("q"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(1L).isEmpty && got(2L).isEmpty)
    assert(got(3L).map(_.asInstanceOf[scala.collection.Seq[Long]].toSeq)
      === Some(Seq(600000L, 800000L, 0L)))
  }

  test("VecDotLong equals the aggregate(zip_with(...)) HOF form, incl. null/length edges") {
    import graft.functions.LongVecFunctions.vec_dot_long
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.select(col("vec_id"),
      graft.functions.LongVecFunctions.vec_quantize_unit(col("embedding")).as("qvec"))
      .filter(col("qvec").isNotNull)
    val qs = q.limit(7).select(col("vec_id").as("qid"), col("qvec").as("q_qvec"))
    val both = q.crossJoin(broadcast(qs))
      .withColumn("fused", vec_dot_long(col("qvec"), col("q_qvec")))
      .withColumn("hof",
        expr("aggregate(zip_with(qvec, q_qvec, (x, y) -> x * y), 0L, (a, x) -> a + x)"))
    assert(both.filter(not(col("fused") <=> col("hof"))).count() === 0L)
    // length mismatch -> NULL (zip_with pads with NULL, poisons the agg);
    // NULL element -> NULL; NULL array -> NULL
    val edges = Seq(
      (Some(Seq[java.lang.Long](1L, 2L)), Some(Seq[java.lang.Long](3L))),
      (Some(Seq[java.lang.Long](1L, null)), Some(Seq[java.lang.Long](3L, 4L))),
      (None, Some(Seq[java.lang.Long](3L, 4L))),
      (Some(Seq[java.lang.Long](2L, 5L)), Some(Seq[java.lang.Long](3L, 4L))))
      .toDF("a", "b")
      .withColumn("fused", vec_dot_long(col("a"), col("b")))
      .withColumn("hof",
        expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, x) -> acc + x)"))
    assert(edges.filter(not(col("fused") <=> col("hof"))).count() === 0L)
    assert(edges.filter(col("a").isNotNull && col("b").isNotNull &&
      size(col("a")) === size(col("b")) &&
      !array_contains(transform(col("a"), x => x.isNull), true))
      .select("fused").collect().map(_.getLong(0)).toSeq === Seq(26L))
    // vec_dot on a bigint array widens long*double exactly like the HOF's
    // x * w Multiply over DOUBLE-typed weights (the embed_pca projection
    // path). NOTE: the weights must be a typed literal — a SQL-text
    // `array(0.333...)` parses fractional literals as DECIMAL and the
    // products round through decimal before the double sum, a ≤1-ulp
    // different intermediate (the pre-r16 embed_pca built its weight
    // array from SQL text and so carried exactly that decimal flavor;
    // the output booleans sit behind a 1e-6 relative tolerance and are
    // oracle-gated, so the intermediate change is invisible downstream).
    val wts = (1 to 64).map(i => 1.0 / i)
    val proj = q
      .withColumn("fused",
        graft.functions.VectorFunctions.vec_dot(col("qvec"), typedLit(wts)))
      .withColumn("hof",
        aggregate(
          zip_with(col("qvec"), typedLit(wts), (x, w) => x * w),
          lit(0.0), (acc, x) => acc + x))
    assert(proj.filter(not(col("fused") <=> col("hof"))).count() === 0L)
  }

  test("VecArgmaxQCell / PqArgmaxCode equal their HOF argmax forms on real quantized units") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.select(col("vec_id"),
      graft.functions.LongVecFunctions.vec_quantize_unit(col("embedding")).as("qvec"))
      .filter(col("qvec").isNotNull)
    val cents = q.filter(col("vec_id") < 16)
      .agg(collect_list(struct(col("vec_id").as("cidx"), col("qvec").as("qcent")))
        .as("cents"))
    val both = q.crossJoin(broadcast(cents))
      .withColumn("fused",
        graft.functions.LongVecFunctions.vec_argmax_qcell(col("qvec"), col("cents")))
      .withColumn("hof", expr(
        """array_max(transform(cents, c -> named_struct(
          |  'dot', aggregate(zip_with(qvec, c.qcent, (x, y) -> x * y), 0L, (a, x) -> a + x),
          |  'negidx', -c.cidx)))""".stripMargin))
      .select(col("fused.cell"), col("fused.qdot"),
        (-col("hof.negidx")).as("hof_cell"), col("hof.dot").as("hof_dot"))
    assert(both.filter(
      col("cell") =!= col("hof_cell") || col("qdot") =!= col("hof_dot")).count() === 0L)
    // empty centroid table -> NULL, like array_max over empty
    val empty = q.limit(1)
      .withColumn("cents",
        expr("cast(array() as array<struct<cidx:bigint,qcent:array<bigint>>>)"))
      .select(graft.functions.LongVecFunctions
        .vec_argmax_qcell(col("qvec"), col("cents")).as("b"))
    assert(empty.filter(col("b").isNotNull).count() === 0L)
    // PQ: subspace-filtered argmax over the L2 objective, ties to the
    // smallest cidx — vs the filter+transform+array_max HOF
    val m = 8; val sub = 8
    val subs = q.select(col("vec_id"), col("qvec"),
        explode(expr(s"sequence(0, ${m - 1})")).as("s"))
      .selectExpr("vec_id", "s", s"slice(qvec, s * $sub + 1, $sub) as qsub")
    val cb = subs.filter(col("vec_id") < 8)
      .agg(collect_list(struct(col("s"), col("vec_id").as("cidx"),
        col("qsub").as("qcent"))).as("cents"))
    val pq = subs.crossJoin(broadcast(cb))
      .withColumn("fused",
        graft.functions.LongVecFunctions.pq_argmax_code(col("qsub"), col("s"), col("cents")))
      .withColumn("hof", expr(
        """array_max(transform(filter(cents, c -> c.s = s), c -> named_struct(
          |  'obj', 2L * aggregate(zip_with(qsub, c.qcent, (x, y) -> x * y), 0L, (a, x) -> a + x)
          |         - aggregate(c.qcent, 0L, (a, x) -> a + x * x),
          |  'negidx', -c.cidx)))""".stripMargin))
      .select(col("fused.code"), col("fused.qobj"),
        (-col("hof.negidx")).as("hof_code"), col("hof.obj").as("hof_obj"))
    assert(pq.filter(
      col("code") =!= col("hof_code") || col("qobj") =!= col("hof_obj")).count() === 0L)
    // no codeword in the row's subspace -> NULL (array_max over the
    // empty filtered array)
    val none = subs.limit(1)
      .withColumn("cents", expr(
        "array(named_struct('s', 99, 'cidx', cast(1 as bigint), 'qcent', array(cast(1 as bigint))))"))
      .select(graft.functions.LongVecFunctions
        .pq_argmax_code(col("qsub"), col("s"), col("cents")).as("b"))
    assert(none.filter(col("b").isNotNull).count() === 0L)
  }

  test("VecCellL2 equals the transform+filter HOF silhouette distances") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.select(col("vec_id"),
      graft.functions.LongVecFunctions.vec_quantize_unit(col("embedding")).as("qvec"))
      .filter(col("qvec").isNotNull)
    val cents = q.filter(col("vec_id") < 8)
      .agg(collect_list(struct(col("vec_id").as("cidx"), col("qvec").as("qcent")))
        .as("cents"))
    // assign like silhouetteSimplified does, then compare both dist forms
    val assigned = q.crossJoin(broadcast(cents))
      .withColumn("cell",
        graft.functions.LongVecFunctions
          .vec_argmax_qcell(col("qvec"), col("cents")).getField("cell"))
    val both = assigned
      .withColumn("fused", graft.functions.LongVecFunctions
        .vec_cell_l2(col("qvec"), col("cell"), col("cents")))
      .withColumn("dists", expr(
        """transform(cents, c -> named_struct(
          |  'cell2', c.cidx,
          |  'd2', aggregate(zip_with(qvec, c.qcent, (x, y) -> (x - y) * (x - y)),
          |                  0L, (a, x) -> a + x)))""".stripMargin))
      .withColumn("hof_a2", expr("element_at(filter(dists, d -> d.cell2 = cell), 1).d2"))
      .withColumn("hof_b2", expr(
        "array_min(transform(filter(dists, d -> d.cell2 != cell), d -> d.d2))"))
    assert(both.filter(
      not(col("fused.a2") <=> col("hof_a2")) ||
        not(col("fused.b2") <=> col("hof_b2"))).count() === 0L)
    // single-cell table: b2 NULL (no other cell), a2 present
    val one = q.limit(3)
      .withColumn("cents", expr(
        "array(named_struct('cidx', cast(0 as bigint), 'qcent', qvec))"))
      .withColumn("d", graft.functions.LongVecFunctions
        .vec_cell_l2(col("qvec"), lit(0L), col("cents")))
    assert(one.filter(col("d.b2").isNotNull).count() === 0L)
    assert(one.filter(col("d.a2") =!= 0L).count() === 0L)
  }

  test("VecHammingBands equals the aggregate(zip_with(bit_count)) HOF form, incl. edges") {
    import graft.functions.LongVecFunctions.vec_hamming_bands
    // real banded dHashes from the image corpus, all pairs within a
    // small slice (the phashPairs verify-loop shape)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(40)
    val ph = graft.ext.Multimodal.imagePhash(
      graft.ext.Multimodal.synthesizeImagePairs(docs)).toDF()
      .where(col("decode_ok"))
      .select(col("media_id"),
        array(col("band0"), col("band1"), col("band2"), col("band3")).as("bands"))
    val both = ph.as("x").crossJoin(broadcast(ph.limit(10).as("y")))
      .select(
        vec_hamming_bands(col("x.bands"), col("y.bands")).as("fused"),
        expr("""aggregate(zip_with(x.bands, y.bands, (p, q) -> bit_count(p ^ q)),
               | 0, (acc, v) -> acc + v)""".stripMargin).as("hof"))
    assert(both.filter(not(col("fused") <=> col("hof"))).count() === 0L)
    assert(both.filter(col("fused").isNotNull).count() > 0L)
    // edges: length mismatch -> NULL, NULL element -> NULL, NULL array -> NULL
    val edges = Seq(
      (Some(Seq[java.lang.Long](1L, 2L)), Some(Seq[java.lang.Long](3L))),
      (Some(Seq[java.lang.Long](1L, null)), Some(Seq[java.lang.Long](3L, 4L))),
      (None, Some(Seq[java.lang.Long](3L, 4L))),
      (Some(Seq[java.lang.Long](5L, 12L)), Some(Seq[java.lang.Long](3L, 10L))))
      .toDF("a", "b")
      .withColumn("fused", vec_hamming_bands(col("a"), col("b")))
      .withColumn("hof",
        expr("aggregate(zip_with(a, b, (p, q) -> bit_count(p ^ q)), 0, (acc, v) -> acc + v)"))
    assert(edges.filter(not(col("fused") <=> col("hof"))).count() === 0L)
    // 5^3 = 6 (two bits), 12^10 = 6 (two bits) -> 4
    assert(edges.filter(col("fused").isNotNull)
      .select("fused").collect().map(_.getInt(0)).toSeq === Seq(4))
  }

  test("VecSubLong equals the zip_with(x - y) HOF form, incl. null/length edges") {
    import graft.functions.LongVecFunctions.vec_sub_long
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.select(col("vec_id"),
      graft.functions.LongVecFunctions.vec_quantize_unit(col("embedding")).as("qvec"))
      .filter(col("qvec").isNotNull)
    val cents = q.limit(5).select(col("vec_id").as("cid"), col("qvec").as("qcent"))
    val both = q.crossJoin(broadcast(cents))
      .withColumn("fused", vec_sub_long(col("qvec"), col("qcent")))
      .withColumn("hof", expr("zip_with(qvec, qcent, (x, y) -> x - y)"))
    assert(both.filter(not(col("fused") <=> col("hof"))).count() === 0L)
    // edges: zip_with pads the shorter side with NULL (output has the MAX
    // length, padded positions NULL); NULL element -> NULL element;
    // NULL array -> NULL
    val edges = Seq(
      (Some(Seq[java.lang.Long](10L, 2L, 7L)), Some(Seq[java.lang.Long](3L))),
      (Some(Seq[java.lang.Long](1L, null)), Some(Seq[java.lang.Long](3L, 4L))),
      (None, Some(Seq[java.lang.Long](3L, 4L))),
      (Some(Seq[java.lang.Long](2L, 5L)), Some(Seq[java.lang.Long](3L, 4L))))
      .toDF("a", "b")
      .withColumn("fused", vec_sub_long(col("a"), col("b")))
      .withColumn("hof", expr("zip_with(a, b, (x, y) -> x - y)"))
    assert(edges.filter(not(col("fused") <=> col("hof"))).count() === 0L)
    assert(edges.select("fused").collect().map(r =>
      Option(r.getSeq[java.lang.Long](0)).map(_.toList)).toSeq === Seq(
      Some(List(7L, null, null)),
      Some(List(-2L, null)),
      None,
      Some(List(-1L, 1L))))
  }
}
