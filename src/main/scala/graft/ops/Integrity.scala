package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Schema-wide referential-integrity audit — the whole-FK-graph
  * complement to [[Quality.RefIntegrity]]'s single-rule check: walk
  * every declared foreign-key edge and report, per edge, how many child
  * rows point at nothing. An ingest that drops a parent partition, a
  * GDPR erasure job that deletes customers but not their orders, or a
  * CDC stream that applies deletes out of order all surface here first.
  *
  * Each edge is also re-audited under a simulated ERASURE of a
  * deterministic parent slice (`pk % erasedMod == erasedRem`) — the
  * "what breaks if this retention job runs" dry-run. That second
  * scenario rides the SAME join (one presence flag per side), so the
  * audit costs one pass per edge, not two.
  *
  * Scale shape: the child side collapses to (fk_value, row_count) via a
  * map-side-combined aggregate BEFORE any join — the join then carries
  * distinct keys only (for lineitem→orders, ~n/4 keys instead of n
  * rows; for dimension edges, a handful). The parent side reduces to
  * DISTINCT keys, which AQE broadcasts for every dimension-sized
  * parent. Output is |edges| rows regardless of corpus size.
  */
object Integrity {

  /** One directed FK edge: `child.fkCol` must reference `parent.pkCol`. */
  final case class FkEdge(
      name: String,
      child: DataFrame,
      fkCol: String,
      parent: DataFrame,
      pkCol: String)

  def fkAudit(
      edges: Seq[FkEdge],
      erasedMod: Long = 1000L,
      erasedRem: Long = 7L): DataFrame = {
    require(edges.nonEmpty, "edges must be non-empty")
    require(erasedMod > 0, s"erasedMod must be positive, got $erasedMod")
    val audited = edges.map { e =>
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
          coalesce(sum(when(col("fk").isNotNull, col("cnt"))), lit(0L))
            .as("fk_rows"),
          coalesce(sum(when(col("fk").isNull, col("cnt"))), lit(0L))
            .as("null_fk_rows"),
          count(when(col("fk").isNotNull, 1)).as("distinct_fk"),
          coalesce(sum(when(col("fk").isNotNull && col("pk").isNull, col("cnt"))), lit(0L))
            .as("orphan_rows"),
          count(when(col("fk").isNotNull && col("pk").isNull, 1))
            .as("orphan_keys"),
          // erasure dry-run: parents in the erased slice stop existing
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
    }
    audited.reduce(_ unionByName _)
  }

  /** One functional-dependency candidate: do `detCols` determine
    * `depCol` in `df`? */
  final case class FdCandidate(
      name: String,
      df: DataFrame,
      detCols: Seq[String],
      depCol: String)

  /** Functional-dependency audit — the data-profiling classic (Metanome
    * / HoloClean territory): for each declared candidate "X → Y", count
    * the determinant keys that map to MORE than one dependent value.
    * Zero violations means the FD holds — the evidence a modeler needs
    * before normalizing a table, declaring a natural key, or trusting a
    * dimension join to be row-preserving; a violation count is the size
    * of the cleanup worklist.
    *
    * NULL discipline: distinct dependents are counted over NON-null
    * values (both engines' count(DISTINCT) semantics), and keys whose
    * dependents include a NULL are reported separately (`n_null_keys`)
    * — a NULL neither violates nor confirms an FD, and hiding it would
    * overstate the dependency's health.
    *
    * Shape per candidate: one (det, dep) map-side-combined aggregate,
    * then one det-keyed aggregate, then a 1-row rollup — the
    * determinant's cardinality bounds every exchange. Output is
    * |candidates| rows at any scale.
    */
  def fdAudit(candidates: Seq[FdCandidate]): DataFrame = {
    require(candidates.nonEmpty, "candidates must be non-empty")
    val audited = candidates.map { c =>
      require(c.detCols.nonEmpty, s"${c.name}: detCols must be non-empty")
      val perKey = c.df
        .groupBy(c.detCols.map(col): _*)
        .agg(countDistinct(col(c.depCol)).as("nd"),
          count(when(col(c.depCol).isNull, 1)).as("n_null_dep"))
      perKey.agg(
        count(lit(1)).as("n_keys"),
        count(when(col("nd") > 1, 1)).as("n_violating_keys"),
        coalesce(max(col("nd")), lit(0L)).as("max_distinct"),
        count(when(col("n_null_dep") > 0, 1)).as("n_null_keys"))
        .select(lit(c.name).as("fd"),
          col("n_keys").cast("bigint").as("n_keys"),
          col("n_violating_keys").cast("bigint").as("n_violating_keys"),
          col("max_distinct").cast("bigint").as("max_distinct"),
          col("n_null_keys").cast("bigint").as("n_null_keys"),
          (col("n_violating_keys") === 0).as("holds"))
    }
    audited.reduce(_ unionByName _)
  }
}
