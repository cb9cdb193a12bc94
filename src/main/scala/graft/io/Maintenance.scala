package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Table-maintenance utilities. At 100 TB the classic operational failure
  * is the small-file problem: streaming sinks and over-parallel writers
  * leave thousands of KB-sized parquet files per partition, and every
  * downstream scan pays per-file open/footer costs until someone
  * compacts.
  */
object Maintenance {

  /** Rewrite a parquet directory into ~`targetRowsPerFile`-row files.
    * Write-to-side-dir + rename swap: readers racing the swap see either
    * the old or the new layout, never a half-written mix (a table format
    * — Delta/Iceberg — is the fully atomic production answer; this is the
    * raw-parquet form). Returns (rows, resulting file count).
    */
  def compactParquet(
      spark: SparkSession,
      dir: String,
      targetRowsPerFile: Long): (Long, Int) = {
    val df = spark.read.parquet(dir)
    val rows = df.count()
    val nFiles = math.max(1, math.ceil(rows.toDouble / targetRowsPerFile).toInt)
    val tmp = dir.stripSuffix("/") + "__compacting"
    df.repartition(nFiles).write.mode("overwrite").parquet(tmp)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dst = new Path(dir)
    val bak = new Path(dir.stripSuffix("/") + "__old")
    fs.rename(dst, bak)
    fs.rename(new Path(tmp), dst)
    fs.delete(bak, true)
    val out = fs.listStatus(dst).count(_.getPath.getName.endsWith(".parquet"))
    (rows, out)
  }
}
