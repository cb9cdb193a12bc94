package graft

/** Prints the authoritative query/oracle counts. The headline numbers in
  * README.md / DESIGN.md are hand-copied from this output (the round-6
  * verdict caught them drifting: three docs, three different counts).
  * Run: `tools/run.sh graft.QueryCount`
  */
object QueryCount {
  def main(args: Array[String]): Unit = {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    println(s"queries=${q.size} oracles=${o.size}")
    val unoracled = q -- o
    if (unoracled.nonEmpty)
      println(s"queries without oracle: ${unoracled.toSeq.sorted.mkString(", ")}")
    val orphans = o -- q
    if (orphans.nonEmpty)
      println(s"oracles without query: ${orphans.toSeq.sorted.mkString(", ")}")
  }
}
