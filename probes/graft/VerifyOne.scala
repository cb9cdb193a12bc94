package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.Files

/** Dev loop: [[Verify]] for a SUBSET of queries — dump the named queries'
  * results + their oracle SQL, then compare with tools/check.py, without
  * paying for the full 140-query sweep while iterating on one operator.
  *
  *   tools/run.sh graft.VerifyOne /root/testdata/sf0.01 /tmp/v1 kmeans_assign
  *   python3 tools/check.py /root/testdata/sf0.01 /tmp/v1
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: VerifyOne <sfDir> <outDir> <query>...")
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ckptDir = Files.createTempDirectory("graft_verifyone_ckpt")
    spark.sparkContext.setCheckpointDir(ckptDir.toString)
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      SparkEntry.queries(n)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$n")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => " "
      case c => c.toString
    } + "\""
    val json = names.filter(SparkEntry.oracleSql.contains)
      .map(n => s"${q(n)}: ${q(SparkEntry.oracleSql(n))}")
      .mkString("{", ", ", "}")
    Files.write(java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      json.getBytes("UTF-8"))
    spark.stop()
    org.apache.commons.io.FileUtils.deleteDirectory(ckptDir.toFile)
  }
}
