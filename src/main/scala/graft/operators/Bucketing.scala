package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Co-located joins via bucketing: write both join sides bucketed (and
  * sorted) on the join key, and the sort-merge join reads bucket i
  * against bucket i with NO shuffle exchange on either side — the
  * standard layout investment for repeated big-big joins at 100 TB
  * (pay one write-time shuffle, amortize over every subsequent join).
  */
object Bucketing {

  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key. With matching bucket
    * counts Spark plans SortMergeJoin over the bucketed scans directly
    * — callers can assert the absence of Exchange in the plan.
    */
  def bucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
