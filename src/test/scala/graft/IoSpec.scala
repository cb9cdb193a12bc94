package graft

import org.scalatest.funsuite.AnyFunSuite

/** Source/sink format coverage: the engine reads and writes every format
  * the built-in DataSource API ships (parquet is exercised everywhere
  * else; csv/json/orc round-trip here with explicit schemas — never
  * inference in the product path).
  */
class IoSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def roundTrip(fmt: String): Unit = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_io_$fmt").toString
    val src = Tables.orders(spark, "/root/testdata/sf0.001")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    src.write.mode("overwrite").format(fmt).save(dir)
    val back = spark.read.schema(src.schema).format(fmt).load(dir)
    assert(back.count() === src.count())
    val a = src.orderBy("o_orderkey").collect()
    val b = back.orderBy("o_orderkey").collect()
    assert(a.sameElements(b), s"$fmt round-trip altered rows")
  }

  test("csv round-trips with explicit schema")(roundTrip("csv"))
  test("json round-trips with explicit schema")(roundTrip("json"))
  test("orc round-trips with explicit schema")(roundTrip("orc"))

  test("compaction: 32 small files collapse to 1, rows and values intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/t"
    val src = Tables.events(spark, "/root/testdata/sf0.001")
    src.repartition(32).write.parquet(dir)
    val before = new java.io.File(dir).listFiles.count(_.getName.endsWith(".parquet"))
    assert(before > 16) // genuinely fragmented
    val (rows, files) = graft.io.Maintenance.compactParquet(spark, dir, 1000000L)
    assert(rows === src.count())
    assert(files === 1)
    assert(spark.read.parquet(dir).count() === rows)
  }

  test("parquet schema evolution: mergeSchema unions columns across batches") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    Seq((1L, "a")).toDF("id", "v1").write.parquet(s"$dir/b=0")
    Seq((2L, 3.5)).toDF("id", "v2").write.parquet(s"$dir/b=1")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq === Seq("b", "id", "v1", "v2"))
    val rows = merged.orderBy("id").collect()
    assert(rows(0).getAs[String]("v1") === "a" && rows(0).isNullAt(rows(0).fieldIndex("v2")))
    assert(rows(1).getAs[Double]("v2") === 3.5 && rows(1).isNullAt(rows(1).fieldIndex("v1")))
  }
}
