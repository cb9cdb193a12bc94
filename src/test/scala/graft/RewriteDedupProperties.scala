package graft

import org.apache.spark.sql.functions.{col, split}
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.ext.TextOps

/** Invariants of the span-rewrite dedup that the fixed oracle corpus
  * cannot fully exercise — on ARBITRARY corpora (repeated spans within a
  * document, across documents, unicode tokens, single-token docs):
  *
  *  1. conservation: Σ n_kept over all documents equals the number of
  *     DISTINCT span contents in the corpus (each distinct span survives
  *     exactly once, nothing is lost, nothing duplicated);
  *  2. subsequence: every document's rewritten text is a subsequence of
  *     its original spans in order (the rewrite only deletes, never
  *     reorders or invents);
  *  3. first-wins: the lexicographically-first (doc_id, position)
  *     occurrence of every span is the one that survives.
  */
object RewriteDedupProperties extends Properties("rewritededup") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  private lazy val spark = SparkTestSession.spark

  private val B = 4 // small block size so duplicates actually collide

  // small token alphabet -> spans repeat across random docs
  private val genToken: Gen[String] =
    Gen.oneOf("aa", "bb", "cc", "é", "中", "x")

  private val genDoc: Gen[String] = for {
    n <- Gen.choose(1, 20)
    toks <- Gen.listOfN(n, genToken)
  } yield toks.mkString(" ")

  private val genCorpus: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(1, 8)
    docs <- Gen.listOfN(n, genDoc)
  } yield docs.zipWithIndex.map { case (d, i) => ((i + 1).toLong, d) }

  /** Reference spans of a doc: disjoint B-token blocks, in order. */
  private def spans(text: String): Seq[String] =
    text.split(" ", -1).grouped(B).map(_.mkString(" ")).toSeq

  private def run(corpus: List[(Long, String)]): Map[Long, (Long, Long, String)] = {
    val spark0 = spark
    import spark0.implicits._
    TextOps.blockDedupRewrite(corpus.toDF("doc_id", "text"), block = B)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
  }

  property("conservation: sum(n_kept) == distinct span count") =
    Prop.forAll(genCorpus) { corpus =>
      val got = run(corpus)
      val distinctSpans = corpus.flatMap { case (_, t) => spans(t) }.toSet
      got.values.map(_._2).sum == distinctSpans.size.toLong
    }

  property("subsequence: rewrite deletes spans, never reorders or invents") =
    Prop.forAll(genCorpus) { corpus =>
      val got = run(corpus)
      corpus.forall { case (id, text) =>
        val orig = spans(text)
        val kept = Option(got(id)._3).map(spans).getOrElse(Seq.empty)
        // kept must be an ordered subsequence of orig
        val it = orig.iterator
        kept.forall(k => it.contains(k)) // iterator advances: order-preserving
      }
    }

  property("first-wins: survivors are exactly the minimal (doc_id, pos) occurrences") =
    Prop.forAll(genCorpus) { corpus =>
      val got = run(corpus)
      // reference: global first occurrence of each span content
      val firstOf = corpus
        .flatMap { case (id, t) => spans(t).zipWithIndex.map { case (sp, i) => (sp, id, i) } }
        .groupBy(_._1)
        .map { case (sp, occ) => sp -> occ.minBy(o => (o._2, o._3)) }
      corpus.forall { case (id, text) =>
        val expectKept = spans(text).zipWithIndex
          .filter { case (sp, i) => firstOf(sp) == ((sp, id, i)) }
          .map(_._1)
        val kept = Option(got(id)._3).map(spans).getOrElse(Seq.empty)
        kept == expectKept
      }
    }
}
