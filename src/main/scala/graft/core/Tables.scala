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
  /** `events.ts` is nanosecond-precision parquet, which Spark's vectorized
    * reader rejects ([PARQUET_TYPE_ILLEGAL]). Read it as raw nanos
    * (legacy nanosAsLong) and convert to a microsecond TimestampType —
    * the engine-wide timestamp resolution.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = apply(spark, sfDir, "events")
    df.schema("ts").dataType match {
      // NANOS parquet read as raw long under nanosAsLong → µs timestamp
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _ => df // already a (µs) timestamp
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "embeddings")
}
