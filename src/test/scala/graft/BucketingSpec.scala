package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing = the pre-shuffled join. Writing both sides bucketed by the
  * join key means the join needs NO Exchange at read time — at 100 TB the
  * dominant cost of a fact-fact join disappears for every downstream
  * query that joins on the bucket key.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("join of co-bucketed tables plans without a shuffle exchange") {
    // tables land in ./spark-warehouse (gitignored); dropped in finally
    Tables.orders(spark, "/root/testdata/sf0.001")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_b")
    Tables.lineitem(spark, "/root/testdata/sf0.001")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_b")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // sort-merge join straight off the bucketed scans: the only allowed
      // exchange is the final tiny groupBy, never on the join inputs
      val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey"))
      assert(!joinSection.contains("Exchange hashpartitioning(o_orderkey"))
      assert(joined.collect().map(_.getLong(1)).sum === 6000L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
