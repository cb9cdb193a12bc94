package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge frames — the iterative-join family beyond
  * [[Dedup.connectedComponents]]' star-contraction.
  *
  * Scale shape: every iteration is (rank ⋈ edges on src → groupBy dst)
  * — a hash-partitioned equi-join plus an aggregate with map-side
  * partials. The rank table is node-sized (tiny next to the edges), the
  * edge frame is reused every iteration unchanged (at cluster scale it
  * would be pre-partitioned on src once and every iteration's join
  * co-locates), and nothing ever materializes driver-side: the node
  * count rides along as a broadcast 1-row frame.
  */
object Graph {

  /** Weighted PageRank with a FIXED iteration count — the deterministic,
    * oracle-checkable form (a convergence loop's iteration count depends
    * on float drift; a fixed count is bit-stable and is how production
    * systems bound latency anyway).
    *
    * r₀(v) = 1/N;  rₖ₊₁(v) = (1−d)/N + d·Σ_{(u,v,w)∈E} rₖ(u)·w/W(u)
    * where W(u) is u's total outgoing weight. Dangling mass is dropped
    * (not redistributed) — stated contract, mirrored in the oracle.
    *
    * Cross-engine parity: contributions sum in double (order-free up to
    * ~1e-14 relative over ≤10⁴-degree nodes) and a single `round(_, 6)`
    * at the end absorbs the drift. Note the oracle's `1.0 - 0.85` parses
    * as exact DECIMAL in DuckDB (0.15, one ulp off Spark's double
    * subtraction), so the teleport constant differs by ~1 ulp per
    * iteration — that drift is absorbed by the rounding, not absent.
    *
    * @param edges (src: bigint, dst: bigint, weight: bigint) — multi-edges
    *              pre-aggregated into weights
    */
  def pageRank(edges: DataFrame, iters: Int = 8, damping: Double = 0.85): DataFrame = {
    val nodes = edges.select(col("src").as("id"))
      .unionAll(edges.select(col("dst").as("id")))
      .distinct()
    val outW = edges.groupBy(col("src"))
      .agg(sum(col("weight")).as("out_w"))
    val e = edges.join(outW, "src")
      .select(col("src"), col("dst"), col("weight"), col("out_w"))
    val nRow = broadcast(nodes.agg(count(lit(1)).cast("double").as("n_nodes")))
    var r = nodes.crossJoin(nRow)
      .select(col("id"), (lit(1.0) / col("n_nodes")).as("r"))
    for (_ <- 1 to iters) {
      val contrib = r.join(e, col("id") === col("src"))
        .groupBy(col("dst"))
        .agg(sum(col("r") * col("weight") / col("out_w")).as("c"))
      r = nodes.crossJoin(nRow)
        .join(contrib, col("id") === col("dst"), "left")
        .select(col("id"),
          ((lit(1.0) - lit(damping)) / col("n_nodes")
            + lit(damping) * coalesce(col("c"), lit(0.0))).as("r"))
    }
    r.select(col("id"), round(col("r"), 6).as("rank"))
  }

  /** Deterministic traffic graph derived from lineitem: supplier-bucket →
    * part-bucket edges weighted by line count. Small id spaces keep the
    * rank distribution non-degenerate at every SF; the derivation is
    * SQL-identical in the oracle.
    */
  def lineitemGraph(lineitem: DataFrame, srcMod: Int = 100, dstMod: Int = 100): DataFrame =
    lineitem
      .selectExpr(s"l_suppkey % $srcMod as src", s"l_partkey % $dstMod as dst")
      .filter(col("src") =!= col("dst"))
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("weight"))
}
