package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Upgrade tripwires for the two deliberately-pinned Catalyst-internal
  * seams. Both are documented contracts (DESIGN.md, COVERAGE.md): the
  * `graftshim` package-injection bridge into `private[sql]`
  * Column↔Expression converters and Spark's internal Bloom expressions,
  * and the `spark.sql.legacy.bucketedTableScan.outputOrdering` flag the
  * zero-sort bucketed-fact recipe depends on. Without these tests a
  * Spark minor bump would surface as an opaque analysis/linkage error
  * deep inside a query; with them it fails HERE, with a message naming
  * the seam and every call site that needs porting.
  */
class GuardSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("graftshim seam: the Column<->Expression bridge still round-trips") {
    val seam = "org.apache.spark.sql.graftshim.GraftShim -> " +
      "org.apache.spark.sql.classic.ExpressionUtils (private[sql]); " +
      "consumers: functions/*.scala, ext/Dedup.scala bloom screens"
    try {
      import org.apache.spark.sql.graftshim.GraftShim
      val e = GraftShim.expression(lit(7L) + lit(35L))
      val v = spark.range(1).select(GraftShim.column(e).as("v"))
        .head().getLong(0)
      assert(v == 42L, s"bridge mis-evaluated (seam: $seam)")
    } catch {
      case t: Throwable =>
        fail(s"Spark upgrade broke the graftshim seam [$seam]: $t", t)
    }
  }

  test("bloom internals: aggregate + might_contain + scalar subquery still wire up") {
    val seam = "catalyst BloomFilterAggregate / BloomFilterMightContain / " +
      "ScalarSubquery constructors (ext/Dedup.scala:243+ bloom screens, " +
      "io/Sinks streaming bloom reference screen)"
    try {
      import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
      import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery}
      import org.apache.spark.sql.graftshim.GraftShim
      val base = spark.range(100).select(col("id").as("h"))
      val bloom = base.agg(GraftShim.column(
        new BloomFilterAggregate(GraftShim.expression(col("h")),
          Literal(1000L), Literal(8192L)).toAggregateExpression()).as("bf"))
      val probed = spark.range(200).filter(GraftShim.column(
        BloomFilterMightContain(ScalarSubquery(bloom.queryExecution.analyzed),
          GraftShim.expression(col("id")))))
        .count()
      // no false negatives: all 100 build keys must pass the screen
      assert(probed >= 100L,
        s"bloom screen dropped build-side keys ($probed < 100) — seam: $seam")
    } catch {
      case t: Throwable =>
        fail(s"Spark upgrade broke the bloom-expression seam [$seam]: $t", t)
    }
  }

  test("legacy bucketedTableScan.outputOrdering conf is still defined") {
    val key = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    // legacy entries are internal() so getAllDefinedConfs hides them; a
    // REGISTERED key answers spark.conf.get with its default, an
    // unregistered one throws — which is exactly the removal signal
    // (setting a removed conf would otherwise be a silent no-op string)
    val defined =
      try { spark.conf.get(key); true }
      catch { case _: java.util.NoSuchElementException => false }
    assert(defined,
      s"Spark removed $key — the one-file-per-bucket zero-sort join recipe " +
        "(io/Maintenance.bucketWrite, Q21BucketProbe, BENCH_SF1.md q21 row) " +
        "silently loses its sort elimination without it; port the recipe " +
        "before deleting this pin")
  }
}
