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

  // Parquet schema inference runs a 1-task Spark job per read; at bench
  // time every query re-reads its tables, so cache the inferred schema
  // per path and hand it back via read.schema(...) (skips the footer job).
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val schema = schemaCache.computeIfAbsent(path, _ => spark.read.parquet(path).schema)
    spark.read.schema(schema).parquet(path)
  }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "supplier")
  def nation(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "region")
  def part(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "part")
  /** `events.ts` is nanosecond-precision parquet (TESTDATA.md), which
    * Spark's reader rejects outright ([PARQUET_TYPE_ILLEGAL]) — and with
    * multiple footers the rejection surfaces as an aborted schema-merge
    * job, not a driver-side exception, so probing is both noisy and
    * fragile. Instead always read with nanosAsLong=true: a NANOS column
    * arrives as a raw LongType (which we convert to the engine-wide
    * microsecond TimestampType), while an ordinary MICROS/MILLIS column
    * still arrives as TimestampType (the flag only affects NANOS) and is
    * returned untouched.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = apply(spark, sfDir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _ => df
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "embeddings")
}
