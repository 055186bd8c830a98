package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Partitioned publish for the 100 TB layout: write fact data
  * `partitionBy` a low-cardinality derived key (date, type) so
  * downstream queries with a matching predicate read only the touched
  * directories (partition pruning) instead of the whole table.
  */
object PartitionedWrite {

  /** Publish events partitioned by event_date (derived) and
    * event_type — the canonical time+category layout.
    */
  def publishEvents(events: DataFrame, path: String): Unit =
    events
      .withColumn("event_date", to_date(col("ts")))
      .write
      .mode(SaveMode.Overwrite)
      .partitionBy("event_date", "event_type")
      .parquet(path)

  /** Read back with pruning-friendly layout. */
  def readEvents(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
