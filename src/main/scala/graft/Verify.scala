package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // reliable-checkpoint dir: the iterative operators (connected
    // components) truncate lineage against FILES here — the path a
    // cluster run needs (localCheckpoint dies with a lost executor).
    // A temp dir OUTSIDE outDir (the Bench idiom): anything inside
    // outDir is read back by the driver as a query result, and round 6's
    // in-outDir `_checkpoints` produced a bogus not-parquet row in the
    // correctness artifact.
    val ckptDir = Files.createTempDirectory("graft_verify_ckpt")
    spark.sparkContext.setCheckpointDir(ckptDir.toString)
    new java.io.File(outDir).mkdirs()
    // Spark-side failures are recorded in a manifest, not just stderr: a
    // missing output directory must be attributable to THIS side, so an
    // oracle-harness crash downstream can never masquerade as (or hide) a
    // Spark failure across rounds.
    val sparkErrors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // dev-only subset filter (comma-separated names): lets tools/check.py
    // spot-check a changed query in seconds instead of re-dumping all
    // ~160. Applied to BOTH the query run and the oracle dump so the
    // checker never sees an oracle row with no output dir. The driver
    // does not set this — its runs stay full.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def selected(name: String): Boolean = only.forall(_.contains(name))
    SparkEntry.queries.filter(kv => selected(kv._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName).take(500)
        sparkErrors(name) = msg
        System.err.println(s"[verify] $name failed: $msg")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => selected(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = sparkErrors
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/spark_errors.json"), errJson)
    spark.stop()
    // reclaim the checkpoint scaffolding (operators delete their own
    // files; this removes the dir + anything a crashed query left)
    try {
      import scala.jdk.CollectionConverters._
      Files.walk(ckptDir).iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
    } catch { case _: Throwable => () }
  }
}
