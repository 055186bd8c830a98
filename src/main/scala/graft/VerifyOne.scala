package graft
import org.apache.spark.sql.SparkSession
/** Single-query correctness dump: like `graft.Verify` but for one
  * registry query — pairs with
  * `tools/check.py <sf> <out> --skip-verify <name>` for a fast
  * cross-SF oracle check without rerunning the whole registry.
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.install(spark)
    new java.io.File(outDir).mkdirs()
    val q = graft.queries.Registry.byName(name)
    q.run(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    def esc(s: String) = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString } + "\""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      s"{${esc(name)}: ${esc(q.oracle.get)}}")
    spark.stop()
  }
}
