package graft.io

import java.io.ByteArrayInputStream

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Per-file Bloom-filter sidecar index — file skipping for POINT and
  * membership probes, the case parquet footer min/max (and the z-order
  * layout) cannot serve: on a hash-scattered or unclustered key every
  * file's min/max spans the whole domain, so a `key IN (…)` probe opens
  * every file. A per-file Bloom answers "might this file contain k?" in
  * O(1) per file, with no false negatives — the Delta/Iceberg
  * bloom-index feature re-expressed over raw parquet.
  *
  * Layout: blobs live in `dir/_bloom_index` — the underscore prefix is
  * Hadoop's convention for non-data files, so every normal
  * `spark.read.parquet(dir)` ignores the sidecar (same mechanism that
  * hides `_SUCCESS`).
  *
  * Scale shape: the build is ONE scan of the table; `input_file_name()`
  * keys the aggregate, and because a task reads splits of one file at a
  * time, the per-file blobs build map-side and the exchange carries
  * blobs (numBits/8 bytes each), never rows. The probe side reads ONLY
  * the sidecar — manifest-scale, one row per data file, the same class
  * of driver read as a table format's index/manifest file — and plans a
  * scan over the surviving files. False positives only ever ADMIT a
  * file; the exact row filter after the scan keeps the result precise,
  * which is what lets a probabilistic index sit under the DuckDB hash
  * gate.
  */
object BloomIndex {

  val SidecarDir = "_bloom_index"

  /** Build (or rebuild) the sidecar: one Bloom blob per data file over
    * `keyExpr` (must cast to BIGINT). Returns the number of indexed
    * files.
    */
  def build(
      spark: SparkSession,
      dir: String,
      keyExpr: String,
      expectedItems: Long = 1L << 20,
      numBits: Long = 1L << 20): Int = {
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.graftshim.GraftShim
    val keyed = spark.read.parquet(dir)
      .select(input_file_name().as("file"), expr(s"cast($keyExpr as bigint)").as("k"))
      .filter(col("k").isNotNull)
    val side = keyed.groupBy("file").agg(
      GraftShim.column(new BloomFilterAggregate(
        GraftShim.expression(col("k")),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression()).as("bf"))
    val out = s"${dir.stripSuffix("/")}/$SidecarDir"
    side.coalesce(1).write.mode("overwrite").parquet(out)
    side.count().toInt
  }

  /** Plan a read of `dir` restricted to files whose Bloom might contain
    * ANY of `keys`, then apply the exact `IN` filter. Returns
    * (result, filesKept, filesTotal) — the counts are the skip-ratio
    * observability a planner logs.
    *
    * The blob wire format is Spark's own `util.sketch.BloomFilter`
    * stream format — the same bytes `BloomFilterAggregate` serialized,
    * probed here with `mightContainLong` (identical hashing to the
    * aggregate's `putLong`), so a sidecar written by the build can never
    * disagree with the probe.
    */
  def prunedRead(
      spark: SparkSession,
      dir: String,
      keyExpr: String,
      keys: Seq[Long]): (DataFrame, Int, Int) = {
    require(keys.nonEmpty, "probe key set must be non-empty")
    val side = spark.read.parquet(s"${dir.stripSuffix("/")}/$SidecarDir")
      .select("file", "bf").collect()
    val kept = side.filter { r =>
      val bf = BloomFilter.readFrom(new ByteArrayInputStream(r.getAs[Array[Byte]](1)))
      keys.exists(bf.mightContainLong)
    }.map(_.getString(0))
    val schema = spark.read.parquet(dir).schema
    val base =
      if (kept.isEmpty) spark.read.schema(schema).parquet(dir).filter(lit(false))
      else spark.read.schema(schema).parquet(kept.toIndexedSeq: _*)
    val exact = base.filter(expr(s"cast($keyExpr as bigint)")
      .isin(keys.map(Long.box): _*))
    (exact, kept.length, side.length)
  }

  /** Data-file count in `dir` (sidecar and `_`-files excluded). */
  def dataFiles(spark: SparkSession, dir: String): Int = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
  }
}
