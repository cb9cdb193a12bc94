package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-capture application and table diffing — the MERGE INTO /
  * snapshot-reconciliation pair every incrementally-maintained corpus
  * needs (upstream crawls emit inserts/updates/deletes; the training
  * table must apply them exactly once, and audits must diff two
  * snapshots cheaply).
  *
  * Scale shape: `applyChangelog` is ONE aggregate over the changelog
  * (latest-wins via `max_by`, map-side combined on the key) plus ONE
  * key-equi anti-join against the snapshot — the changelog is typically
  * ≪ the snapshot, so AQE broadcasts it; when it isn't, both sides
  * hash-partition on the key once, the minimal MERGE shape. No windows,
  * no global sorts. `snapshotDiff` is one full-outer key join with
  * column-wise null-safe compares — exactly the two-scan minimum.
  */
object Cdc {

  /** Apply a changelog to a snapshot with latest-wins MERGE semantics.
    *
    * `changes` carries the snapshot's columns plus `opCol` (values
    * 'I'/'U'/'D' — insert and update are both upserts; 'D' deletes) and
    * `versionCol` (a totally-ordered sequence number per key — ties
    * would make latest-wins nondeterministic, so versions must be
    * unique per key, as CDC log offsets are). For each changed key only
    * the highest-version row acts; unchanged snapshot rows pass
    * through untouched.
    */
  def applyChangelog(
      snapshot: DataFrame,
      changes: DataFrame,
      key: String,
      opCol: String = "op",
      versionCol: String = "version"): DataFrame = {
    val dataCols = snapshot.columns.toSeq
    require(dataCols.contains(key), s"key '$key' missing from snapshot")
    require(!dataCols.contains(opCol) && !dataCols.contains(versionCol),
      s"snapshot must not already carry '$opCol'/'$versionCol'")
    // latest change per key: one map-side-combined aggregate, never a
    // whole-changelog sort
    val latest = changes
      .groupBy(col(key))
      .agg(max_by(
        struct(changes.columns.filter(_ != key).map(col).toIndexedSeq: _*),
        col(versionCol)).as("c"))
      .select(col(key) +: changes.columns.filter(_ != key)
        .map(c => col(s"c.$c").as(c)).toIndexedSeq: _*)
    val survivors = snapshot.join(latest.select(col(key)), Seq(key), "left_anti")
    val upserts = latest
      .where(col(opCol) =!= lit("D"))
      .select(dataCols.map(col): _*)
    survivors.unionByName(upserts)
  }

  /** Diff two snapshots of a keyed table: one full-outer join on the
    * key, null-safe column compares for the change classification.
    * Emits only differing keys — (key, change_type ∈ added / removed /
    * changed); `unchanged` rows (the overwhelming majority of a real
    * diff) never leave the join.
    */
  def snapshotDiff(before: DataFrame, after: DataFrame, key: String): DataFrame = {
    require(before.columns.sameElements(after.columns),
      "snapshotDiff requires identical schemas")
    val dataCols = before.columns.filter(_ != key).toSeq
    val b = before.as("b")
    val a = after.as("a")
    val sameRow: Column = dataCols
      .map(c => col(s"b.$c") <=> col(s"a.$c"))
      .reduceOption(_ && _)
      .getOrElse(lit(true))
    b.join(a, col(s"b.$key") === col(s"a.$key"), "full_outer")
      .select(
        coalesce(col(s"b.$key"), col(s"a.$key")).as(key),
        when(col(s"b.$key").isNull, lit("added"))
          .when(col(s"a.$key").isNull, lit("removed"))
          .when(!sameRow, lit("changed"))
          .otherwise(lit("unchanged")).as("change_type"))
      .where(col("change_type") =!= lit("unchanged"))
  }
}
