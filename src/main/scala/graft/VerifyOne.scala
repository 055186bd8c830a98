package graft
import org.apache.spark.sql.SparkSession
/** Subset correctness dump: like `graft.Verify` but for one or more
  * (comma-separated) registry queries — pairs with
  * `tools/check.py <sf> <out> --skip-verify <name...>` for a fast
  * cross-SF oracle check without rerunning the whole registry.
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val Array(names, sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.install(spark)
    new java.io.File(outDir).mkdirs()
    val entries = names.split(",").map(_.trim).filter(_.nonEmpty).map { name =>
      val q = graft.queries.Registry.byName(name)
      val sql = q.oracle.getOrElse(sys.error(
        s"$name has no oracle SQL — only spec coverage; nothing to dump"))
      q.run(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      s"${Verify.jsonQuote(name)}: ${Verify.jsonQuote(sql)}"
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      entries.mkString("{", ", ", "}"))
    spark.stop()
  }
}
