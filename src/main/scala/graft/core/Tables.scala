package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the synthetic parquet tables (TESTDATA.md). Plain
  * `spark.read.parquet` so Catalyst gets a `FileSourceScanExec` it can
  * push filters/projections into — every query in `graft.queries`
  * relies on that pushdown for the 100 TB path.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "supplier")
  def nation(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "region")
  def part(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "part")
  /** `events.ts` may be nanosecond-precision parquet, which Spark's
    * reader rejects ([PARQUET_TYPE_ILLEGAL]). Probe the footer with the
    * legacy flag OFF: if the read resolves, the column is an ordinary
    * timestamp and is returned untouched; only on the NANOS rejection
    * do we re-read as raw nanos (nanosAsLong) and convert to the
    * engine-wide microsecond TimestampType. A plain BIGINT ts column is
    * deliberately left as a long (ambiguous unit — callers must decide)
    * rather than silently divided by 1000.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val flag = "spark.sql.legacy.parquet.nanosAsLong"
    try {
      spark.conf.set(flag, "false")
      val df = apply(spark, sfDir, "events")
      df.schema // forces footer schema conversion; throws on NANOS
      df
    } catch {
      case e: Throwable if String.valueOf(e.getMessage).contains("PARQUET_TYPE_ILLEGAL") ||
          String.valueOf(e.getMessage).contains("TIMESTAMP(NANOS") =>
        spark.conf.set(flag, "true")
        apply(spark, sfDir, "events")
          .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "embeddings")
}
