package graft

import org.apache.spark.sql.functions.{col, expr, split}
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.ext.TextOps
import graft.functions.HashFunctions

/** Property-based parity for the codegen'd hash expressions: on ARBITRARY
  * token material (unicode, empty strings, repeats, whitespace-free
  * oddities) the compiled loops must be bit-identical to the interpreted
  * SQL compositions the DuckDB oracle mirrors. This is the contract that
  * keeps every signature-based oracle honest — a single divergent hash
  * would silently skew MinHash/SimHash/Jaccard results.
  */
object HashProperties extends Properties("hashexprs") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  private lazy val spark = SparkTestSession.spark

  private val genToken: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(8)),
    Gen.oneOf("é", "ü", "中文", "🙂", "", "a-b", "x_y", "0", "müller"),
    Gen.choose(0, 9).map(i => s"w$i"))

  private val genDoc: Gen[String] = for {
    n <- Gen.choose(0, 12)
    toks <- Gen.listOfN(n, genToken)
  } yield toks.mkString(" ")

  private val genDocs: Gen[List[String]] = for {
    n <- Gen.choose(1, 8)
    docs <- Gen.listOfN(n, genDoc)
  } yield docs

  property("md5_long64_array == transform(arr, md5Long64)") =
    Prop.forAll(genDocs) { texts =>
      import spark.implicits._
      val rows = texts.toDF("text")
        .withColumn("toks", split(col("text"), " "))
        .select(
          HashFunctions.md5_long64_array(col("toks")).as("fast"),
          expr(s"transform(toks, s -> ${TextOps.md5Long64("s")})").as("ref"))
        .as[(Seq[Long], Seq[Long])].collect()
      rows.forall { case (fast, ref) => fast == ref }
    }

  property("batch minhash signatures == per-row streaming form") =
    Prop.forAll(genDocs) { texts =>
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      // the aggregate (explode + groupBy-min) batch form and the per-row
      // array form streaming uses must agree doc by doc — the DuckDB
      // oracle mirrors the per-row formulation, so this equivalence is
      // what keeps the batch operators oracle-honest
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      def key(r: org.apache.spark.sql.Row) =
        r.getLong(0) -> (1 to 10).map(i => Option(r.get(i)).map(_.asInstanceOf[Long]))
      val batch = graft.ext.Dedup.minhashSignatures(docs).collect().map(key).toMap
      val perRow = graft.ext.Dedup.withMinhashBands(docs)
        .select(Seq(col("doc_id")) ++ (0 until 8).map(i => col(s"mh$i"))
          ++ Seq(col("band0"), col("band1")): _*)
        .collect().map(key).toMap
      batch == perRow
    }

  property("shingles3_hashed == transform(shingleExpr, md5Long64)") =
    Prop.forAll(genDocs) { texts =>
      import spark.implicits._
      val rows = texts.toDF("text")
        .withColumn("toks", split(col("text"), " "))
        .select(
          HashFunctions.shingles3_hashed(col("toks")).as("fast"),
          expr(s"transform(${TextOps.shingleExpr("toks")}, s -> ${TextOps.md5Long64("s")})").as("ref"))
        .as[(Seq[Long], Seq[Long])].collect()
      rows.forall { case (fast, ref) => fast == ref }
    }
}
