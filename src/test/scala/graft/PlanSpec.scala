package graft

import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audits — the assertions that encode the scale contract:
  * predicates reach the parquet scan, projections prune the read schema,
  * keyed pipelines shuffle exactly once, aggregations keep map-side
  * partials. A plan regression here is a 100 TB incident that no
  * correctness test would catch.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def formatted(name: String): String =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q6: every predicate pushed to the scan, unused columns pruned") {
    val p = formatted("q6_forecast")
    assert(p.contains("GreaterThanOrEqual(l_discount,0.03)"))
    assert(p.contains("LessThanOrEqual(l_discount,0.05)"))
    assert(p.contains("LessThan(l_quantity,24.0)"))
    assert(p.contains("GreaterThanOrEqual(l_shipdate,"))
    // ReadSchema holds only the 4 referenced columns
    assert(p.contains(
      "ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_shipdate:timestamp_ntz>"))
  }

  test("pipeline_full: whole keyed pipeline is ONE shuffle") {
    val p = formatted("pipeline_full")
    assert("Exchange".r.findAllMatchIn(p).toSeq.nonEmpty)
    assert("\\(\\d+\\) Exchange".r.findAllMatchIn(p).size === 1)
  }

  test("q1: single exchange with map-side partial aggregation") {
    val p = formatted("q1_pricing")
    assert("\\(\\d+\\) Exchange".r.findAllMatchIn(p).size === 1)
    assert("HashAggregate".r.findAllMatchIn(p).size >= 2) // partial + final
  }

  test("q1: scan prunes to the referenced lineitem columns only") {
    val p = formatted("q1_pricing")
    assert(!p.contains("l_orderkey")) // key columns not read
    assert(p.contains("LessThanOrEqual(l_shipdate,"))
  }

  test("date-partitioned layout: a date filter prunes partitions at plan time") {
    import org.apache.spark.sql.functions.{col, to_date}
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    Tables.events(spark, sf)
      .withColumn("event_date", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("event_date").parquet(dir)
    val q = spark.read.parquet(dir).filter(col("event_date") === "2024-01-05")
    val p = q.queryExecution.explainString(ExplainMode.fromString("formatted"))
    // the date predicate is a PartitionFilter (directory pruning),
    // NOT a row-level PushedFilter — files outside the day are never opened
    assert(p.contains("PartitionFilters: ["))
    assert(p.contains("event_date"))
    assert(!p.contains("PushedFilters: [IsNotNull(event_date)"))
    val days = q.select("event_date").distinct().count()
    assert(days === 1)
  }
}
