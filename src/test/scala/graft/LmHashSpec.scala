package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.TextOps

/** Pins the compiled [[graft.functions.LmHash]] kernels to the SQL
  * formulation they replaced (md5-hex + conv + explode + rollup): the
  * DuckDB oracle gates the corpus fixture; this spec gates the edge
  * shapes — multibyte UTF-8, repeated/leading/trailing spaces, empty,
  * single-token and null texts — term by term.
  */
class LmHashSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val texts = Seq(
    1L -> "a b",
    2L -> "a",
    3L -> "",
    4L -> " a  b c ",
    5L -> "héllo wörld ünïcode héllo wörld",
    6L -> "tab\tand\nnewline stay in tokens",
    7L -> null,
    8L -> Seq.tabulate(200)(i => s"tok${i % 23}").mkString(" "),
    9L -> "字 漢字 テスト 字 漢字")

  private def docs = {
    import spark.implicits._
    texts.toDF("doc_id", "text")
      .withColumn("lang", when(pmod(col("doc_id"), lit(2L)) === 0, "en").otherwise("de"))
  }

  /** The pre-kernel SQL occurrence stream, verbatim. */
  private def sqlBigrams(dim: Int) =
    docs
      .withColumn("toks", expr("filter(split(text, ' '), x -> x != '')"))
      .select(col("doc_id"), col("toks"),
        explode(expr(
          "case when size(toks) >= 2 then sequence(1, size(toks) - 1) else array() end")).as("i"))
      .selectExpr("doc_id", "i",
        s"pmod(${TextOps.md5Long64("element_at(toks, i)")}, $dim) as cb",
        s"pmod(${TextOps.md5Long64("concat(element_at(toks, i), ' ', element_at(toks, i + 1))")}, $dim) as b")

  test("lm_bigram_buckets matches the md5/conv SQL formulation per occurrence") {
    val dim = 4096
    val kernel = docs
      .select(col("doc_id"), posexplode(
        graft.functions.LmFunctions.lm_bigram_buckets(col("text"), dim)))
      .select(col("doc_id"), (col("pos") + 1).as("i"),
        col("col.cb").as("cb"), col("col.b").as("b"))
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    val sql = sqlBigrams(dim)
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(kernel.nonEmpty && kernel === sql)
    // and at a dim that actually forces collisions
    val k2 = docs.select(graft.functions.LmFunctions.lm_bigram_buckets(col("text"), 7).as("p"))
      .selectExpr("explode(p) as q").selectExpr("q.cb", "q.b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(k2.forall { case (cb, b) => cb >= 0 && cb < 7 && b >= 0 && b < 7 })
  }

  test("lmScore with the compiled charge matches the explode+rollup SQL replica") {
    val dim = 64 // small dim: bucket collisions exercise the 0-floor branch
    val sqlScore = {
      val bg = sqlBigrams(dim)
      val hist = bg.select(explode(array(
          struct(lit("cb").as("kind"), col("cb").as("bucket")),
          struct(lit("b").as("kind"), col("b").as("bucket")))).as("kb"))
        .groupBy(col("kb.kind").as("kind"), col("kb.bucket").as("bucket"))
        .agg(count(lit(1)).as("c"))
      val model = hist.agg(
        map_from_entries(collect_list(
          when(col("kind") === "cb", struct(col("bucket"), col("c"))))).as("cb_map"),
        map_from_entries(collect_list(
          when(col("kind") === "b", struct(col("bucket"), col("c"))))).as("b_map"))
        .selectExpr(
          s"transform(sequence(0, ${dim - 1}), i -> coalesce(element_at(cb_map, cast(i as bigint)), 0L)) as cb_arr",
          s"transform(sequence(0, ${dim - 1}), i -> coalesce(element_at(b_map, cast(i as bigint)), 0L)) as b_arr")
      val per = bg.crossJoin(broadcast(model))
        .selectExpr("doc_id",
          """greatest(0L, (length(bin(element_at(cb_arr, cast(cb + 1 as int)))) - 1)
            |            - (length(bin(element_at(b_arr, cast(b + 1 as int)))) - 1)) as chg""".stripMargin)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"), sum(col("chg")).as("nll_mag"))
      docs.select(col("doc_id"), col("lang"))
        .join(per, Seq("doc_id"), "left")
        .withColumn("high_ppl",
          (col("nll_mag") * 10L > col("n_bigrams") * 44L).cast("int"))
    }
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1 else r.getInt(4))
    }.sortBy(_._1)
    val got = rows(TextOps.lmScore(docs, dim = dim))
    assert(got === rows(sqlScore))
    // the collision floor must actually have fired at dim=64, or the
    // greatest(0, ...) branch was untested
    assert(got.exists(_._4 >= 0))
  }

  test("dsirWeights with the compiled gap kernel matches the explode+join SQL replica") {
    val dim = 64
    val sqlDsir = {
      val bg = docs
        .withColumn("toks", expr("filter(split(text, ' '), x -> x != '')"))
        .withColumn("is_tgt", expr("cast((lang = 'en') as boolean)"))
        .select(col("doc_id"), col("is_tgt"), col("toks"),
          explode(expr(
            "case when size(toks) >= 2 then sequence(1, size(toks) - 1) else array() end")).as("i"))
        .selectExpr("doc_id", "is_tgt",
          s"pmod(${TextOps.md5Long64("concat(element_at(toks, i), ' ', element_at(toks, i + 1))")}, $dim) as b")
      val counts = bg.groupBy(col("b")).agg(
        count(lit(1)).as("c_all"),
        sum(when(col("is_tgt"), 1L).otherwise(0L)).as("c_tgt"))
      val per = bg.join(broadcast(counts), Seq("b"))
        .selectExpr("doc_id",
          "(length(bin(c_tgt)) - 1) - (length(bin(c_all)) - 1) as wgt")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"), sum(col("wgt")).as("dsir_score"))
      docs.select(col("doc_id"), col("lang"))
        .join(per, Seq("doc_id"), "left")
    }
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) Long.MinValue else r.getLong(3))
    }.sortBy(_._1)
    val got = rows(TextOps.dsirWeights(docs, "lang = 'en'", dim))
    assert(got === rows(sqlDsir))
    // the signed gap must actually have gone negative somewhere (the
    // non-target docs), or the un-floored branch was untested
    assert(got.exists(t => t._4 != Long.MinValue && t._4 < 0L))
  }
}
