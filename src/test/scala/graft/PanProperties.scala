package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

/** Property suite for piiScrub2's staged PAN redaction (r10's Amex 4-6-5
  * and bare 13–19 extension): on ARBITRARY generated card numbers — any
  * covered length, any per-gap separator mix, valid or invalid check
  * digit — the scrubber must
  *  - redact EVERY card-shaped candidate (no digit of any generated
  *    number may survive into `scrubbed`, valid Luhn or not);
  *  - count each candidate in EXACTLY ONE family (16-digit shapes are
  *    cards, 15-digit shapes are Amex, bare 13/14/17/18/19 are PANs —
  *    the staged-redaction no-double-fire contract), even when
  *    candidates sit adjacent to one another or to SSNs;
  *  - count `n_cards_valid` as exactly the candidates whose digit
  *    string passes Luhn mod-10, per an independent Scala reference
  *    (redaction-fires-iff-shape, validity-iff-Luhn).
  */
object PanProperties extends Properties("piiScrub2.pan") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(25)

  private lazy val spark = SparkTestSession.spark

  /** Independent Luhn reference: double every second digit from the
    * right (check digit not doubled), subtract 9 above 9, sum % 10 == 0.
    */
  private def luhnRef(digits: String): Boolean = {
    val ds = digits.reverse.map(_ - '0')
    ds.zipWithIndex.map { case (d, i) =>
      if (i % 2 == 1) { val x = 2 * d; if (x > 9) x - 9 else x } else d
    }.sum % 10 == 0
  }

  private case class Pan(digits: String, rendered: String, family: String)

  private def genDigits(n: Int): Gen[String] =
    Gen.listOfN(n, Gen.choose(0, 9)).map(_.mkString)

  /** Force the last digit to make Luhn pass or fail: the Luhn check
    * digit is unique, so exactly 1 of the 10 completions is valid.
    */
  private def withValidity(n: Int, valid: Boolean): Gen[String] =
    for {
      body <- genDigits(n - 1)
      completions = (0 to 9).map(d => body + d)
      digits <-
        if (valid) Gen.const(completions.filter(luhnRef).head)
        else Gen.oneOf(completions.filterNot(luhnRef))
    } yield digits

  private val genSep: Gen[String] = Gen.oneOf("", "-", " ")

  private def grouped(digits: String, lens: Seq[Int], seps: Seq[String]): String = {
    val groups = lens
      .foldLeft((digits, Vector.empty[String])) { case ((rest, acc), n) =>
        (rest.drop(n), acc :+ rest.take(n))
      }._2
    groups.init.zip(seps).map { case (g, s) => g + s }.mkString + groups.last
  }

  private val genPan: Gen[Pan] = for {
    len <- Gen.oneOf(13, 14, 15, 16, 17, 18, 19)
    valid <- Gen.oneOf(true, false)
    digits <- withValidity(len, valid)
    seps <- Gen.listOfN(3, genSep)
    sep16 <- Gen.oneOf(true, false)
  } yield len match {
    // a bare 16 matches CardRe (all-empty separators) and a bare 15
    // matches AmexRe — family is decided by LENGTH, not by rendering
    case 16 =>
      Pan(digits, if (sep16) grouped(digits, Seq(4, 4, 4, 4), seps) else digits, "card16")
    case 15 =>
      Pan(digits, if (sep16) grouped(digits, Seq(4, 6, 5), seps.take(2)) else digits, "amex")
    case _ => Pan(digits, digits, "pan")
  }

  private val genSsn: Gen[String] = for {
    a <- genDigits(3); b <- genDigits(2); c <- genDigits(4)
  } yield s"$a-$b-$c"

  private val genWord: Gen[String] =
    Gen.listOfN(4, Gen.alphaLowerChar).map(_.mkString)

  property("redaction fires iff card-shaped; one family per candidate; valid-count is exactly Luhn") =
    Prop.forAll(
      Gen.choose(0, 5).flatMap(Gen.listOfN(_, genPan)),
      Gen.choose(0, 3).flatMap(Gen.listOfN(_, genSsn)),
      Gen.choose(1, 6).flatMap(Gen.listOfN(_, genWord)),
      Gen.listOfN(8, Gen.oneOf(true, false))) { (pans, ssns, words, mix) =>
      import spark.implicits._
      // adjacency stress: items joined by single spaces, with a word
      // interleaved only where `mix` says — PAN-next-to-PAN and
      // PAN-next-to-SSN neighborhoods occur routinely, which is where
      // a cross-family double-fire would happen if it could
      val items = pans.map(_.rendered) ++ ssns
      val interleaved = items.zipWithIndex.flatMap { case (it, i) =>
        if (mix(i % mix.length)) Seq(it, words(i % words.length)) else Seq(it)
      }
      val text = (words.take(1) ++ interleaved ++ words.takeRight(1)).mkString(" ")
      val row = graft.ext.TextOps.piiScrub2(Seq((1L, text)).toDF("doc_id", "text"))
        .collect().head
      val nCand = row.getAs[Int]("n_card_candidates")
      val nValid = row.getAs[Int]("n_cards_valid")
      val nAmex = row.getAs[Int]("n_amex")
      val nPan = row.getAs[Int]("n_pan")
      val nSsn = row.getAs[Int]("n_ssn")
      val scrubbed = row.getAs[String]("scrubbed")
      val expValid = pans.count(p => luhnRef(p.digits))
      (nCand == pans.size) :| s"candidates $nCand != ${pans.size} [$text]" &&
        (nAmex == pans.count(_.family == "amex")) :| s"amex $nAmex [$text]" &&
        (nPan == pans.count(_.family == "pan")) :| s"pan $nPan [$text]" &&
        (nValid == expValid) :| s"valid $nValid != $expValid [$text]" &&
        (nSsn == ssns.size) :| s"ssn $nSsn != ${ssns.size} [$text]" &&
        (!scrubbed.exists(_.isDigit)) :| s"digits leaked: [$scrubbed]"
    }

  property("Luhn expression agrees with the reference on pure digit strings of every covered length") =
    Prop.forAll(Gen.oneOf(13 to 19), Gen.oneOf(true, false)) { (len, valid) =>
      Prop.forAll(withValidity(len, valid)) { digits =>
        import spark.implicits._
        val row = graft.ext.TextOps.piiScrub2(Seq((1L, s"x $digits y")).toDF("doc_id", "text"))
          .collect().head
        (row.getAs[Int]("n_cards_valid") == (if (luhnRef(digits)) 1 else 0)) :|
          s"luhn mismatch for $digits (ref=${luhnRef(digits)})"
      }
    }
}
