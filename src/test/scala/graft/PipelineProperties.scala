package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.ext.{Dedup, Graph, TextOps}

/** Property-based invariants for the round-5 pipeline operators on
  * ARBITRARY corpora/graphs — the laws each operator must hold at any
  * data shape, not just the crafted unit fixtures:
  *  - packing conserves token mass and never over-fills beyond one
  *    straddling document;
  *  - novelty is a proper fraction and exactly one doc per distinct
  *    shingle-set-first claims each first occurrence;
  *  - containment is bounded by [minContainment, 1] and implies shared
  *    shingles;
  *  - PageRank mass is conserved minus the dangling leak (≤ 1, ≥ the
  *    teleport floor) and is invariant under input partitioning.
  */
object PipelineProperties extends Properties("pipelineops") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkTestSession.spark

  private val genToken: Gen[String] =
    Gen.choose(0, 14).map(i => s"w$i") // small vocab -> real collisions/dups

  private val genDoc: Gen[String] = for {
    n <- Gen.choose(0, 30)
    toks <- Gen.listOfN(n, genToken)
  } yield toks.mkString(" ")

  private val genDocs: Gen[List[String]] = for {
    n <- Gen.choose(1, 12)
    docs <- Gen.listOfN(n, genDoc)
  } yield docs

  property("packSequences conserves token mass; bins overflow by at most one straddler") =
    Prop.forAll(genDocs, Gen.choose(8, 64)) { (texts, budget) =>
      import spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val packed = TextOps.packSequences(docs, budget = budget, groups = 4).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val docTokens = texts.map(_.split(" ", -1).length.toLong).sum
      val massOk = packed.map(_._4).sum == docTokens
      // contiguous fill: a bin holds < budget committed tokens plus at most
      // ONE document that starts inside it — so bin_tokens < budget + the
      // longest doc
      val maxDoc = texts.map(_.split(" ", -1).length.toLong).max
      val boundOk = packed.forall(_._4 < budget + maxDoc)
      massOk && boundOk
    }

  property("shingleNovelty in (0,1]; each shingle's first occurrence claimed exactly once") =
    Prop.forAll(genDocs) { texts =>
      import spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val rows = TextOps.shingleNovelty(docs).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      val fracOk = rows.forall(r => r._4 >= 0.0 && r._4 <= 1.0 && r._3 <= r._2)
      // the lowest doc_id with shingles is all-first by construction
      val firstOk = rows.sortBy(_._1).headOption.forall(_._4 == 1.0)
      fracOk && firstOk
    }

  property("containmentPairs scores in [minC, 1] and only on shingle-sharing pairs") =
    Prop.forAll(genDocs) { texts =>
      import spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val rows = Dedup.containmentPairs(docs, minContainment = 0.5).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(4), r.getDouble(5), r.getDouble(6)))
      rows.forall { case (a, b, common, cont, jac) =>
        a < b && common >= 1 && cont >= 0.5 && cont <= 1.0 && jac <= cont
      }
    }

  private val genEdges: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(1, 25)
    edges <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 7L), Gen.choose(0L, 7L)))
  } yield edges.filter { case (s, d) => s != d }.distinct

  property("pageRank mass: teleport floor <= sum(rank) <= 1; partition-invariant") =
    Prop.forAll(genEdges.suchThat(_.nonEmpty)) { edgeList =>
      import spark.implicits._
      val edges = edgeList.map { case (s, d) => (s, d, 1L) }.toDF("src", "dst", "weight")
      val r = Graph.pageRank(edges, iters = 6).collect()
        .map(x => x.getLong(0) -> x.getDouble(1)).toMap
      val total = r.values.sum
      // dangling nodes leak their damped mass (documented contract), so the
      // total is at most 1 and at least the undamped teleport share; each
      // emitted rank is rounded to 6 decimals, so allow n·5e-7 of slack
      val slack = r.size * 5e-7
      val massOk = total <= 1.0 + slack && total >= 0.15 - slack
      val repart = Graph.pageRank(edges.repartition(7), iters = 6).collect()
        .map(x => x.getLong(0) -> x.getDouble(1)).toMap
      // partitioning only reorders double sums; after round(6) any residual
      // difference is a single ulp-at-the-boundary step
      val invariant = r.keySet == repart.keySet &&
        r.forall { case (k, v) => math.abs(repart(k) - v) <= 1e-6 }
      massOk && invariant
    }

  property("incrementalFuzzyDedup equals the signature-level reference at any verify bar") =
    Prop.forAll(genDocs.suchThat(_.length >= 5), Gen.choose(1, 2)) { (texts, mm) =>
      import spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      // reference from the SAME signature projection the operator shares
      // (mh nulls = shingle-less docs: never component-equal, can still
      // band-collide through the coalesced empty-band hash)
      val sig = Dedup.minhashSignatures(docs, 2)
        .select("doc_id", "mh0", "mh1", "band0", "band1").collect()
        .map { r =>
          val mh = Seq(1, 2).map(i => if (r.isNullAt(i)) None else Some(r.getLong(i)))
          r.getLong(0) -> ((mh, (r.getLong(3), r.getLong(4))))
        }.toMap
      def isNew(id: Long) = id % 5 == 4
      def expected(id: Long): Option[Long] = {
        val (mhN, (b0, b1)) = sig(id)
        val hits = sig.keys.filter { e =>
          !isNew(e) && {
            val (mhE, (c0, c1)) = sig(e)
            val band = b0 == c0 || b1 == c1
            val n = mhN.zip(mhE).count {
              case (Some(a), Some(b)) => a == b
              case _ => false
            }
            band && n >= mm
          }
        }
        if (hits.isEmpty) None else Some(hits.min)
      }
      val out = Dedup.incrementalFuzzyDedup(docs, k = 2, minMatch = mm).collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      val newIds = sig.keys.filter(isNew).toSet
      out.keySet == newIds && newIds.forall(id => out(id) == expected(id))
    }
}
