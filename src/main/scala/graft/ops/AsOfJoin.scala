package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — attach to each left row the most recent right row with
  * `rightTs <= leftTs` for the same key. Spark has no native operator for
  * this (DuckDB/kdb/Flink do); the scalable formulation is composition,
  * not a custom physical node:
  *
  *   union(left, right) → window over (key, ts) → carry the latest right
  *   payload forward → keep left rows.
  *
  * Cost: ONE shuffle on the key and one partition-local sort — the same
  * shape as any windowed computation, with no range-explosion (a naive
  * `leftTs >= rightTs` theta-join is quadratic per key). At 100 TB this
  * is the difference between a working plan and an unplannable one.
  * Preference order per the porting guide: composition beat a custom
  * SparkPlan here, so no custom node is needed.
  *
  * Tie semantics match DuckDB's ASOF JOIN (equal timestamps DO match):
  * right rows sort before left rows at the same instant.
  */
object AsOfJoin {

  /** @param left     rows to enrich
    * @param right    reference table (key, ts, payload columns)
    * @param keyCol   equi-key present on both sides
    * @param leftTs   event-time column on `left`
    * @param rightTs  event-time column on `right`
    * @param payload  right-side columns carried to the output (each
    *                 becomes `asof_<name>`, null when no prior right row)
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_ats", col(leftTs))
      .withColumn("_src", lit(1)) // left sorts after right at equal ts
    val r0 = right.select(
      (col(keyCol) +: col(rightTs).as("_ats") +: payload.map(c => col(c).as(s"_p_$c"))): _*)
      .withColumn("_src", lit(0))
    val both = l.select(
      (Seq(col(keyCol), col("_ats"), col("_src")) ++
        leftCols.filterNot(_ == keyCol).map(col) ++
        payload.map(c => lit(null).cast(r0.schema(s"_p_$c").dataType).as(s"_p_$c"))): _*)
      .unionByName(
        r0.select(
          (Seq(col(keyCol), col("_ats"), col("_src")) ++
            leftCols.filterNot(_ == keyCol).map(c => lit(null).cast(l.schema(c).dataType).as(c)) ++
            payload.map(c => col(s"_p_$c"))): _*))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("_ats"), col("_src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(both) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"_p_$c"), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("_src") === 1)
      .select((leftCols.map(col) ++ payload.map(c => col(s"asof_$c"))): _*)
  }

  /** Forward as-of join — attach the NEXT right row (`rightTs >= leftTs`,
    * equality matches) per key, optionally only within `tolMicros` of the
    * left timestamp (the feature-store "join next reading, but not if
    * it's staler than T" contract; kdb's `aj` tolerance, pandas
    * `merge_asof(direction='forward', tolerance=...)`).
    *
    * Same one-shuffle windowed composition as [[asof]], mirrored: left
    * rows sort BEFORE right rows at an equal instant and the carry
    * window looks [currentRow, ∞) — `first(ignoreNulls)` pulls the next
    * right payload backward. The tolerance is applied AFTER the carry as
    * a null-out on the carried next-right timestamp: still zero extra
    * shuffles, and a naive `rightTs BETWEEN leftTs AND leftTs + tol`
    * theta-join (quadratic per key) never appears in the plan.
    */
  def asofForward(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      tolMicros: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_ats", col(leftTs))
      .withColumn("_src", lit(0)) // left sorts BEFORE right at equal ts
    val r0 = right.select(
      (col(keyCol) +: col(rightTs).as("_ats") +: payload.map(c => col(c).as(s"_p_$c"))): _*)
      .withColumn("_src", lit(1))
      .withColumn("_p__rts", col("_ats"))
    val both = l.select(
      (Seq(col(keyCol), col("_ats"), col("_src")) ++
        leftCols.filterNot(_ == keyCol).map(col) ++
        payload.map(c => lit(null).cast(r0.schema(s"_p_$c").dataType).as(s"_p_$c")) :+
        lit(null).cast(r0.schema("_p__rts").dataType).as("_p__rts")): _*)
      .unionByName(
        r0.select(
          (Seq(col(keyCol), col("_ats"), col("_src")) ++
            leftCols.filterNot(_ == keyCol).map(c => lit(null).cast(l.schema(c).dataType).as(c)) ++
            payload.map(c => col(s"_p_$c")) :+ col("_p__rts")): _*))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("_ats"), col("_src"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = (payload :+ "_rts").foldLeft(both) { (df, c) =>
      df.withColumn(s"asof_$c", first(col(s"_p_$c"), ignoreNulls = true).over(w))
    }
    val inTol = tolMicros match {
      case Some(t) =>
        unix_micros(col("asof__rts")) - unix_micros(col(leftTs)) <= t
      case None => lit(true)
    }
    carried
      .filter(col("_src") === 0)
      .select((leftCols.map(col) ++
        payload.map(c => when(inTol, col(s"asof_$c")).as(s"asof_$c"))): _*)
  }
}
