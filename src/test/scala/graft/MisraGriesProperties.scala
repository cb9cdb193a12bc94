package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.functions.MisraGriesAggregator

/** The Misra–Gries summary is only usable as a 100 TB candidate pruner if
  * its guarantees hold under EVERY partitioning and merge order Spark
  * might choose — partial aggregation splits the stream arbitrarily and
  * merges partials in arbitrary order. These properties drive the
  * aggregator's reduce/merge directly over random skewed streams and
  * random chunkings:
  *
  *  1. superset: every item with true frequency > N/(capacity+1) appears
  *     in the candidate set (the bound from the mergeable-summaries
  *     construction — this is what makes the exact re-count in
  *     `TextOps.heavyHitters` equal to the full GROUP BY/HAVING);
  *  2. undercount-only, bounded: tracked counts never exceed true
  *     frequency and never undercount by more than N/(capacity+1);
  *  3. n_total is exact regardless of chunking.
  */
object MisraGriesProperties extends Properties("misragries") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(60)

  private val genStream: Gen[List[String]] = for {
    n <- Gen.choose(0, 400)
    // skewed alphabet: few hot items + a long tail
    toks <- Gen.listOfN(n, Gen.frequency(
      5 -> Gen.const("hot1"),
      3 -> Gen.const("hot2"),
      2 -> Gen.choose(0, 4).map(i => s"mid$i"),
      4 -> Gen.choose(0, 200).map(i => s"tail$i")))
  } yield toks

  private val genCapacity: Gen[Int] = Gen.choose(1, 12)

  /** Split `xs` into non-empty chunks at random positions. */
  private def genChunks(xs: List[String]): Gen[List[List[String]]] =
    if (xs.isEmpty) Gen.const(Nil)
    else Gen.listOfN(xs.length, Gen.choose(0, 3)).map { marks =>
      val out = scala.collection.mutable.ListBuffer.empty[List[String]]
      var cur = scala.collection.mutable.ListBuffer.empty[String]
      xs.zip(marks).foreach { case (x, m) =>
        cur += x
        if (m == 0) { out += cur.toList; cur = scala.collection.mutable.ListBuffer.empty }
      }
      if (cur.nonEmpty) out += cur.toList
      out.toList
    }

  private case class Case(stream: List[String], chunks: List[List[String]], capacity: Int)

  private val genCase: Gen[Case] = for {
    s <- genStream
    cs <- genChunks(s)
    cap <- genCapacity
  } yield Case(s, cs, cap)

  private def run(c: Case): (Map[String, Long], Long) = {
    val agg = MisraGriesAggregator(c.capacity)
    val partials = c.chunks.map(_.foldLeft(agg.zero)(agg.reduce))
    // merge right-to-left (a deliberately non-trivial order)
    val merged = partials.foldRight(agg.zero)((a, b) => agg.merge(b, a))
    (merged._1.zip(merged._2).toMap, merged._3)
  }

  property("superset of all items above N/(capacity+1)") = Prop.forAll(genCase) { c =>
    val (summary, _) = run(c)
    val freq = c.stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = c.stream.size.toLong
    val heavy = freq.filter { case (_, f) => f * (c.capacity + 1) > n }.keySet
    heavy.subsetOf(summary.keySet)
  }

  property("counts undercount only, by at most N/(capacity+1)") = Prop.forAll(genCase) { c =>
    val (summary, _) = run(c)
    val freq = c.stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = c.stream.size.toLong
    summary.forall { case (k, cnt) =>
      val f = freq.getOrElse(k, 0L)
      cnt >= 1L && cnt <= f && (f - cnt) * (c.capacity + 1) <= n
    }
  }

  property("n_total is exact under any chunking") = Prop.forAll(genCase) { c =>
    run(c)._2 == c.stream.size.toLong
  }

  property("single-chunk equals Spark's no-partial path (reduce only)") =
    Prop.forAll(genStream, genCapacity) { (s, cap) =>
      val agg = MisraGriesAggregator(cap)
      val buf = s.foldLeft(agg.zero)(agg.reduce)
      val out = agg.finish(buf)
      out.n_total == s.size.toLong && out.candidates.sameElements(buf._1.sorted)
    }
}
