package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** In-session A/B probe for the fkAudit single-pass rewrite: times the
  * OLD per-edge-chain form (inlined here) against the shipped
  * explode-merged form in ONE JVM, alternating, noop-style sink
  * (count over the 7-row result forces everything). Both compute the
  * same 7-edge audit over the TPC-H FK graph.
  *
  *   tools/run.sh graft.FkProbe /root/testdata/sf0.1 [rounds]
  */
object FkProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import graft.ops.Integrity.FkEdge
    def edges(): Seq[FkEdge] = {
      val li = Tables.lineitem(spark, sfDir)
      val ord = Tables.orders(spark, sfDir)
      val cust = Tables.customer(spark, sfDir)
      val supp = Tables.supplier(spark, sfDir)
      val nat = Tables.nation(spark, sfDir)
      Seq(
        FkEdge("lineitem.l_orderkey->orders", li, "l_orderkey", ord, "o_orderkey"),
        FkEdge("lineitem.l_partkey->part", li, "l_partkey", Tables.part(spark, sfDir), "p_partkey"),
        FkEdge("lineitem.l_suppkey->supplier", li, "l_suppkey", supp, "s_suppkey"),
        FkEdge("orders.o_custkey->customer", ord, "o_custkey", cust, "c_custkey"),
        FkEdge("customer.c_nationkey->nation", cust, "c_nationkey", nat, "n_nationkey"),
        FkEdge("supplier.s_nationkey->nation", supp, "s_nationkey", nat, "n_nationkey"),
        FkEdge("nation.n_regionkey->region", nat, "n_regionkey", Tables.region(spark, sfDir), "r_regionkey"))
    }

    // the pre-r17 per-edge-chain form, verbatim
    def oldForm(): DataFrame = {
      val erasedMod = 1000L; val erasedRem = 7L
      edges().map { e =>
        val childKeys = e.child
          .select(col(e.fkCol).cast("bigint").as("fk"))
          .groupBy(col("fk"))
          .agg(count(lit(1)).as("cnt"))
        val parentKeys = e.parent
          .select(col(e.pkCol).cast("bigint").as("pk"))
          .distinct()
        childKeys
          .join(parentKeys, col("fk") === col("pk"), "left")
          .agg(
            coalesce(sum(when(col("fk").isNotNull, col("cnt"))), lit(0L)).as("fk_rows"),
            coalesce(sum(when(col("fk").isNull, col("cnt"))), lit(0L)).as("null_fk_rows"),
            count(when(col("fk").isNotNull, 1)).as("distinct_fk"),
            coalesce(sum(when(col("fk").isNotNull && col("pk").isNull, col("cnt"))), lit(0L)).as("orphan_rows"),
            count(when(col("fk").isNotNull && col("pk").isNull, 1)).as("orphan_keys"),
            coalesce(sum(when(col("fk").isNotNull &&
              (col("pk").isNull || pmod(col("pk"), lit(erasedMod)) === erasedRem),
              col("cnt"))), lit(0L)).as("erased_orphan_rows"),
            count(when(col("fk").isNotNull &&
              (col("pk").isNull || pmod(col("pk"), lit(erasedMod)) === erasedRem), 1))
              .as("erased_orphan_keys"))
          .select(lit(e.name).as("edge"), col("fk_rows"), col("null_fk_rows"),
            col("distinct_fk").cast("bigint").as("distinct_fk"),
            col("orphan_rows"), col("orphan_keys").cast("bigint").as("orphan_keys"),
            col("erased_orphan_rows"),
            col("erased_orphan_keys").cast("bigint").as("erased_orphan_keys"))
      }.reduce(_ unionByName _)
    }

    def newForm(): DataFrame = graft.ops.Integrity.fkAudit(edges())

    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().collect()
      (System.nanoTime() - t0) / 1e9
    }
    // warmup both
    time(oldForm _); time(newForm _)
    val olds = collection.mutable.ArrayBuffer.empty[Double]
    val news = collection.mutable.ArrayBuffer.empty[Double]
    (1 to rounds).foreach { _ =>
      olds += time(oldForm _)
      news += time(newForm _)
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"[fkprobe] old median=${med(olds.toSeq)}%.3f runs=${olds.map(x => f"$x%.3f").mkString(",")}")
    println(f"[fkprobe] new median=${med(news.toSeq)}%.3f runs=${news.map(x => f"$x%.3f").mkString(",")}")
    spark.stop()
  }
}
